"""Quantized-KV-cache quality: KL(f32-KV ‖ quant-KV) + top-1 agreement.

Role of the reference's Δ-PPL-per-cache-type evidence (common/arg.cpp:699
cache-type matrix measured through examples/perplexity): with zero egress
there are no real weights or wikitext here, so the measurement is logit
KL divergence on a synthetic model — the same numeric-fidelity signal the
reference's Δ-PPL encodes, without the corpus. Decode reads the cache at
every step, so each generated position's logits feel the accumulated KV
rounding.

Run: python scripts/kv_quality.py [--layers 4] [--steps 48] [--embd 256]
Prints a markdown table for the README.
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def run(kv_dtype: str, model, n_ctx: int, stream):
    """Teacher-forced: every cache type consumes the SAME token stream
    (single-token steps so each position's logits read the accumulated
    quantized KV). Closed-loop greedy would diverge chaotically on a
    random-weight model and measure trajectory difference, not cache
    fidelity."""
    import numpy as np

    from llama_cpp_dsp_tpu.runtime.context import LlamaContext

    ctx = LlamaContext(model, n_ctx=n_ctx, kv_dtype=kv_dtype)
    out = []
    for tok in stream:
        logits = ctx.eval_tokens([int(tok)])
        out.append(np.asarray(logits, np.float64))
    return np.stack(out)


def kl_and_agree(base, test):
    import numpy as np

    def logsoftmax(x):
        m = x.max(-1, keepdims=True)
        e = x - m
        return e - np.log(np.exp(e).sum(-1, keepdims=True))

    b, t = logsoftmax(base), logsoftmax(test)
    kl = float((np.exp(b) * (b - t)).sum(-1).mean())
    agree = float((base.argmax(-1) == test.argmax(-1)).mean())
    return kl, agree


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--embd", type=int, default=256)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (excludes the axon plugin "
                         "cleanly — see CLAUDE.md JAX_PLATFORMS hang note)")
    args = ap.parse_args()



    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.models.registry import synth_config
    from llama_cpp_dsp_tpu.runtime.loader import LoadedModel
    from llama_cpp_dsp_tpu.tools.synth import synth_params
    from llama_cpp_dsp_tpu.utils.jax_setup import setup_jax

    setup_jax(platform="cpu" if args.cpu else None)
    cfg = synth_config(
        "llama", n_embd=args.embd, n_heads=args.embd // 64, n_kv_heads=2,
        head_dim=64, n_ff=args.embd * 3, n_vocab=512, n_layers=args.layers)
    params = synth_params(cfg, GGMLType.Q8_0, seed=args.seed, tie=False)
    model = LoadedModel(cfg, params, None, None, {})
    n_ctx = args.steps + 16
    import numpy as np

    stream = np.random.default_rng(args.seed).integers(3, cfg.n_vocab - 3,
                                                       args.steps)

    base = run("f32", model, n_ctx, stream)
    print(f"| KV type | mean KL vs f32 KV | top-1 agree |")
    print(f"|---|---|---|")
    for kv in ("bf16", "f16", "q8_0", "q4_0"):
        test = run(kv, model, n_ctx, stream)
        kl, agree = kl_and_agree(base, test)
        print(f"| {kv} | {kl:.3e} | {agree * 100:.1f}% |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
