"""Model graph builders.

get_forward(cfg) dispatches to the right builder the way the reference's
llama_model::build_graph switches over arch (src/llama-model.cpp:12758):
one generic decoder covers the transformer families (flags in LlamaConfig),
mamba gets its own recurrent builder.
"""

from __future__ import annotations

from .llama import LlamaConfig, forward as decoder_forward


def get_forward(cfg: LlamaConfig):
    from .registry import arch_spec

    builder = arch_spec(cfg.arch).builder
    if builder == "mamba":
        from .mamba import forward as mamba_forward

        return mamba_forward
    if builder == "rwkv6":
        from .rwkv6 import forward as rwkv6_forward

        return rwkv6_forward
    if builder == "rwkv7":
        from .rwkv7 import forward as rwkv7_forward

        return rwkv7_forward
    if builder == "encoder":
        from .bert import bert_forward

        return bert_forward
    return decoder_forward


__all__ = ["LlamaConfig", "decoder_forward", "get_forward"]
