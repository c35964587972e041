"""Model loader: GGUF file(s) → (config, params pytree, vocab).

Capability mirror of reference llama_model_loader + llama_model::load_tensors
(src/llama-model-loader.cpp:443, src/llama-model.cpp:1417): mmap the shards,
map tensor names into the model pytree, repack quant blocks into QTensor
device layouts. Device placement/sharding is applied by the caller
(parallel/ for multi-chip; plain device_put single-chip).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFModel
from ..models.llama import LlamaConfig
from ..ops.qtensor import PACKED_KINDS, TABLE_KINDS, QTensor, from_gguf_tensor
from ..tokenizer import Tokenizer, Vocab

log = logging.getLogger(__name__)

# per-layer tensor suffixes → param keys (reference llama-arch.cpp
# LLM_TENSOR_NAMES; the union across the registered archs)
_LAYER_TENSORS = {
    "attn_norm.weight": "attn_norm",
    "attn_norm.bias": "attn_norm_bias",
    "attn_norm_2.weight": "ffn_norm",  # falcon parallel-residual second norm
    "attn_norm_2.bias": "ffn_norm_bias",
    "attn_q.weight": "attn_q",
    "attn_k.weight": "attn_k",
    "attn_v.weight": "attn_v",
    "attn_output.weight": "attn_output",
    "attn_output.bias": "attn_output_bias",
    "attn_q.bias": "attn_q_bias",
    "attn_k.bias": "attn_k_bias",
    "attn_v.bias": "attn_v_bias",
    "attn_qkv.weight": "attn_qkv",
    "attn_qkv.bias": "attn_qkv_bias",
    "attn_q_norm.weight": "attn_q_norm",
    "attn_k_norm.weight": "attn_k_norm",
    "attn_q_norm.bias": "attn_q_norm_bias",  # chameleon per-head LN
    "attn_k_norm.bias": "attn_k_norm_bias",
    "attn_post_norm.weight": "attn_post_norm",
    "post_attention_norm.weight": "attn_post_norm",
    # bitnet sub-norms + per-tensor weight scales (llm_build_bitnet)
    "attn_sub_norm.weight": "attn_sub_norm",
    "ffn_sub_norm.weight": "ffn_sub_norm",
    "attn_q.scale": "attn_q_scale",
    "attn_k.scale": "attn_k_scale",
    "attn_v.scale": "attn_v_scale",
    "attn_output.scale": "attn_output_scale",
    "ffn_gate.scale": "ffn_gate_scale",
    "ffn_up.scale": "ffn_up_scale",
    "ffn_down.scale": "ffn_down_scale",
    "ffn_norm.weight": "ffn_norm",
    "ffn_norm.bias": "ffn_norm_bias",
    "ffn_post_norm.weight": "ffn_post_norm",
    "post_ffw_norm.weight": "ffn_post_norm",
    "ffn_gate.weight": "ffn_gate",
    "ffn_gate.bias": "ffn_gate_bias",
    "ffn_up.weight": "ffn_up",
    "ffn_up.bias": "ffn_up_bias",
    "ffn_down.weight": "ffn_down",
    "ffn_down.bias": "ffn_down_bias",
    "ffn_gate_inp.weight": "ffn_gate_inp",
    "ffn_gate_exps.weight": "ffn_gate_exps",
    "ffn_up_exps.weight": "ffn_up_exps",
    "ffn_down_exps.weight": "ffn_down_exps",
    "ffn_gate_inp_shexp.weight": "ffn_gate_inp_shexp",
    "ffn_gate_shexp.weight": "ffn_gate_shexp",
    "ffn_up_shexp.weight": "ffn_up_shexp",
    "ffn_down_shexp.weight": "ffn_down_shexp",
    "exp_probs_b.bias": "ffn_exp_probs_b",
    # arctic residual-MoE branch norm (reference LLM_TENSOR_FFN_NORM_EXP)
    "ffn_norm_exps.weight": "ffn_norm_exps",
    # deepseek2 MLA (reference LLM_ARCH_DEEPSEEK2 tensor table)
    "attn_q_a.weight": "attn_q_a",
    "attn_q_a_norm.weight": "attn_q_a_norm",
    "attn_q_b.weight": "attn_q_b",
    "attn_kv_a_mqa.weight": "attn_kv_a_mqa",
    "attn_kv_a_norm.weight": "attn_kv_a_norm",
    "attn_kv_b.weight": "attn_kv_b",
    # mamba SSM (reference LLM_ARCH_MAMBA tensor table)
    "ssm_in.weight": "ssm_in",
    "ssm_conv1d.weight": "ssm_conv1d",
    "ssm_conv1d.bias": "ssm_conv1d_bias",
    "ssm_x.weight": "ssm_x",
    "ssm_dt.weight": "ssm_dt",
    "ssm_dt.bias": "ssm_dt_bias",
    "ssm_a": "ssm_a",
    "ssm_d": "ssm_d",
    "ssm_out.weight": "ssm_out",
    # rwkv6 (reference LLM_ARCH_RWKV6 tensor table)
    "time_mix_w1.weight": "time_mix_w1",
    "time_mix_w2.weight": "time_mix_w2",
    "time_mix_lerp_x.weight": "time_mix_lerp_x",
    "time_mix_lerp_w.weight": "time_mix_lerp_w",
    "time_mix_lerp_k.weight": "time_mix_lerp_k",
    "time_mix_lerp_v.weight": "time_mix_lerp_v",
    "time_mix_lerp_r.weight": "time_mix_lerp_r",
    "time_mix_lerp_g.weight": "time_mix_lerp_g",
    "time_mix_first.weight": "time_mix_first",
    "time_mix_decay.weight": "time_mix_decay",
    "time_mix_decay_w1.weight": "time_mix_decay_w1",
    "time_mix_decay_w2.weight": "time_mix_decay_w2",
    "time_mix_key.weight": "time_mix_key",
    "time_mix_value.weight": "time_mix_value",
    "time_mix_receptance.weight": "time_mix_receptance",
    # rwkv6qwen2 carries qwen2-style projection biases
    "time_mix_key.bias": "time_mix_key_bias",
    "time_mix_value.bias": "time_mix_value_bias",
    "time_mix_receptance.bias": "time_mix_receptance_bias",
    "time_mix_gate.weight": "time_mix_gate",
    "time_mix_ln.weight": "time_mix_ln",
    "time_mix_ln.bias": "time_mix_ln_bias",
    "time_mix_output.weight": "time_mix_output",
    # rwkv7/arwkv7 (reference LLM_ARCH_RWKV7 tensor table,
    # src/llama-arch.cpp:1368-1405)
    "time_mix_w0.weight": "time_mix_w0",
    "time_mix_a0.weight": "time_mix_a0",
    "time_mix_a1.weight": "time_mix_a1",
    "time_mix_a2.weight": "time_mix_a2",
    "time_mix_v0.weight": "time_mix_v0",
    "time_mix_v1.weight": "time_mix_v1",
    "time_mix_v2.weight": "time_mix_v2",
    "time_mix_g1.weight": "time_mix_g1",
    "time_mix_g2.weight": "time_mix_g2",
    "time_mix_k_k.weight": "time_mix_k_k",
    "time_mix_k_a.weight": "time_mix_k_a",
    "time_mix_r_k.weight": "time_mix_r_k",
    "time_mix_lerp_fused.weight": "time_mix_lerp_fused",
    "channel_mix_lerp_k.weight": "channel_mix_lerp_k",
    "channel_mix_lerp_r.weight": "channel_mix_lerp_r",
    "channel_mix_key.weight": "channel_mix_key",
    "channel_mix_value.weight": "channel_mix_value",
    "channel_mix_receptance.weight": "channel_mix_receptance",
    # bert encoder (reference LLM_ARCH_BERT tensor table)
    "attn_output_norm.weight": "attn_output_norm",
    "attn_output_norm.bias": "attn_output_norm_bias",
    "layer_output_norm.weight": "layer_output_norm",
    "layer_output_norm.bias": "layer_output_norm_bias",
}

_GLOBAL_TENSORS = {
    "token_embd.weight": "token_embd",
    "token_embd_norm.weight": "token_embd_norm",
    "token_embd_norm.bias": "token_embd_norm_bias",
    "position_embd.weight": "pos_embd",
    "output_norm.weight": "output_norm",
    "output_norm.bias": "output_norm_bias",
    "output.weight": "output",
    "output.bias": "output_bias",
    "rope_freqs.weight": "rope_freqs",
    "rope_factors_long.weight": "rope_freqs",  # phi3 long factors
    "token_types.weight": "token_types",
    # rerank classification head (reference LLM_TENSOR_CLS/CLS_OUT,
    # pooling_type RANK)
    "cls.weight": "cls",
    "cls.bias": "cls_bias",
    "cls.output.weight": "cls_output",
    "cls.output.bias": "cls_output_bias",
}


def _convert(raw: np.ndarray, kind: GGMLType, np_shape: tuple[int, ...]):
    if len(np_shape) == 3 and (kind in PACKED_KINDS or kind in TABLE_KINDS):
        # expert-stacked weights [E, N, K]: repack as (E*N, K), then add the
        # expert axis back onto every field
        e, n, k = np_shape
        qt = from_gguf_tensor(raw, kind, (e * n, k))
        assert isinstance(qt, QTensor)
        arrays = {key: a.reshape(e, n, *a.shape[1:]) for key, a in qt.arrays.items()}
        return QTensor(kind, (n, k), arrays, n_expert=e)
    return from_gguf_tensor(raw, kind, np_shape)


@dataclass
class LoadedModel:
    cfg: LlamaConfig
    params: dict[str, Any]
    vocab: Vocab
    tokenizer: Tokenizer | None
    kv: dict[str, Any]

    @property
    def n_bytes(self) -> int:
        total = 0
        for leaf in _iter_leaves(self.params):
            total += leaf.nbytes
        return total

    @property
    def n_params(self) -> int:
        """Logical parameter count (QTensors count n*k elements, not their
        packed bytes) — the reference /v1/models meta.n_params semantics."""
        import numpy as np

        total = 0
        for leaf in _iter_params(self.params):
            if isinstance(leaf, QTensor):
                total += int(np.prod(leaf.shape)) * max(leaf.n_expert, 1)
            else:
                total += int(np.prod(getattr(leaf, "shape", ()) or (1,)))
        return total


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    elif isinstance(tree, list):
        for v in tree:
            yield from _iter_leaves(v)
    elif isinstance(tree, QTensor):
        yield from tree.arrays.values()
    elif tree is not None:
        yield tree


def _iter_params(tree):
    """Like _iter_leaves but yields whole QTensors (for logical counts)."""
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_params(v)
    elif isinstance(tree, list):
        for v in tree:
            yield from _iter_params(v)
    elif tree is not None:
        yield tree


def _row_slice(w, start: int, stop: int):
    """Rows [start:stop) of a weight — QTensor fields are row-major on axis 0."""
    if isinstance(w, QTensor):
        return QTensor(
            w.kind, (stop - start, w.shape[1]),
            {k: a[start:stop] for k, a in w.arrays.items()},
        )
    return w[start:stop]


def _split_fused(params: dict[str, Any], cfg: LlamaConfig, spec) -> None:
    """Split fused attn_qkv / gate-up ffn_up tensors into the canonical keys.

    The reference keeps fused tensors and takes views at graph-build time
    (e.g. llm_build_phi3 wqkv views, LLM_FFN_SWIGLU split); splitting once at
    load is the XLA-idiomatic equivalent (no runtime cost, static shapes).
    """
    for il, layer in enumerate(params["layers"]):
        h, hkv = cfg.layer_heads(il)  # openelm: per-layer counts
        qdim = h * cfg.head_dim
        kvdim = hkv * cfg.head_dim
        qkv = layer.pop("attn_qkv", None)
        if qkv is not None:
            layer["attn_q"] = _row_slice(qkv, 0, qdim)
            layer["attn_k"] = _row_slice(qkv, qdim, qdim + kvdim)
            layer["attn_v"] = _row_slice(qkv, qdim + kvdim, qdim + 2 * kvdim)
        qkv_b = layer.pop("attn_qkv_bias", None)
        if qkv_b is not None:
            layer["attn_q_bias"] = qkv_b[0:qdim]
            layer["attn_k_bias"] = qkv_b[qdim : qdim + kvdim]
            layer["attn_v_bias"] = qkv_b[qdim + kvdim : qdim + 2 * kvdim]
        if spec.fused_gate_up and "ffn_gate" not in layer and "ffn_up" in layer:
            up = layer.pop("ffn_up")
            n2 = up.shape[0] if not isinstance(up, QTensor) else up.shape[0]
            ff = n2 // 2
            layer["ffn_gate"] = _row_slice(up, 0, ff)
            layer["ffn_up"] = _row_slice(up, ff, 2 * ff)


# T5 per-layer suffixes (reference LLM_ARCH_T5 tensor table): names under
# "enc.blk.N." / "dec.blk.N." namespaces
_T5_LAYER = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "attn_q",
    "attn_k.weight": "attn_k",
    "attn_v.weight": "attn_v",
    "attn_o.weight": "attn_o",
    "cross_attn_norm.weight": "cross_attn_norm",
    "cross_attn_q.weight": "cross_attn_q",
    "cross_attn_k.weight": "cross_attn_k",
    "cross_attn_v.weight": "cross_attn_v",
    "cross_attn_o.weight": "cross_attn_o",
    "ffn_norm.weight": "ffn_norm",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
}


def load_t5(path: str, *, with_tokenizer: bool = True):
    """T5/T5ENCODER GGUF → (T5Config, params, vocab, tokenizer, kv)."""
    from ..models.t5 import T5Config

    gm = GGUFModel.load(path)
    kv = gm.kv
    arch = str(kv.get("general.architecture", "t5"))
    g = lambda key, d=None: kv.get(f"{arch}.{key}", d)
    n_layers = int(g("block_count"))
    cfg = T5Config(
        n_layers=n_layers,
        n_embd=int(g("embedding_length")),
        n_heads=int(g("attention.head_count")),
        head_dim=int(g("attention.key_length",
                       int(g("embedding_length")) // int(g("attention.head_count")))),
        n_ff=int(g("feed_forward_length")),
        n_vocab=int(g("vocab_size", 0)) or len(kv.get(Keys.Tokenizer.LIST, [])),
        rel_buckets=int(g("attention.relative_buckets_count", 32)),
        rel_max_distance=int(g("attention.relative_max_distance", 128)),
        eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
        act=str(g("feed_forward_act", "relu")),
        tie_embeddings=bool(g("tie_embeddings", True)),
    )
    params: dict[str, Any] = {
        "enc_layers": [{} for _ in range(n_layers)],
        "dec_layers": [{} for _ in range(n_layers)],
    }
    for name, info in gm.tensors.items():
        arr = _convert(info.data, info.ggml_type, info.np_shape)
        if name == "token_embd.weight":
            params["token_embd"] = arr
        elif name == "output.weight":
            params["output"] = arr
        elif name == "enc.output_norm.weight":
            params["enc_output_norm"] = arr
        elif name == "dec.output_norm.weight":
            params["dec_output_norm"] = arr
        elif name.startswith(("enc.blk.", "dec.blk.")):
            side, _, idx, rest = name.split(".", 3)
            key = _T5_LAYER.get(rest)
            if key is None and rest == "attn_rel_b.weight":
                params[f"{side}_rel_b"] = arr
                continue
            if key is None:
                log.warning("t5: unmapped tensor %s", name)
                continue
            params[f"{side}_layers"][int(idx)][key] = arr
        else:
            log.warning("t5: unmapped tensor %s", name)
    vocab = Vocab.from_gguf_kv(gm.kv)
    tokenizer = None
    if with_tokenizer:
        try:
            tokenizer = Tokenizer(vocab)
        except NotImplementedError:
            pass
    return cfg, params, vocab, tokenizer, gm.kv


def load_model(path: str, *, with_tokenizer: bool = True) -> LoadedModel:
    from ..models.registry import arch_spec

    gm = GGUFModel.load(path)
    cfg = LlamaConfig.from_gguf_kv(gm.kv)
    spec = arch_spec(cfg.arch)
    params: dict[str, Any] = {"layers": [{} for _ in range(cfg.n_layers)]}

    for name, info in gm.tensors.items():
        raw = info.data
        assert raw is not None, name
        if name in _GLOBAL_TENSORS:
            params[_GLOBAL_TENSORS[name]] = _convert(raw, info.ggml_type, info.np_shape)
            continue
        if name.startswith("blk."):
            _, idx, rest = name.split(".", 2)
            key = _LAYER_TENSORS.get(rest)
            if key is None:
                log.warning("unmapped tensor %s", name)
                continue
            params["layers"][int(idx)][key] = _convert(raw, info.ggml_type, info.np_shape)
            continue
        log.warning("unmapped tensor %s", name)

    _split_fused(params, cfg, spec)

    if spec.builder in ("rwkv6", "rwkv7"):
        # GGUF stores the token-shift LoRA mats in ggml mul_mat orientation
        # (reference Rwkv6Model/Rwkv7Model modify_tensors transpose them on
        # conversion); the jax scan kernels consume x @ W, so flip at load
        _rwkv_lora = ("time_mix_w1", "time_mix_w2", "time_mix_decay_w1",
                      "time_mix_decay_w2", "time_mix_a1", "time_mix_a2",
                      "time_mix_v1", "time_mix_v2", "time_mix_g1",
                      "time_mix_g2")
        for layer in params["layers"]:
            for k in _rwkv_lora:
                w = layer.get(k)
                if isinstance(w, np.ndarray) and w.ndim == 2:
                    layer[k] = np.ascontiguousarray(w.T)
                elif isinstance(w, np.ndarray) and w.ndim == 3:
                    # rwkv6 time_mix_w2 [5, C, r] → [5, r, C]
                    layer[k] = np.ascontiguousarray(w.swapaxes(1, 2))

    if spec.builder == "decoder":
        # grok stores its post-sandwich norms under bert's tensor names
        # (LLM_TENSOR_ATTN_OUT_NORM "attn_output_norm" / LLM_TENSOR_LAYER_OUT_NORM
        # "layer_output_norm", src/llama-arch.cpp:446-467); the decoder graph
        # consumes them as attn_post_norm / ffn_post_norm
        for layer in params["layers"]:
            if "attn_output_norm" in layer:
                layer["attn_post_norm"] = layer.pop("attn_output_norm")
            if "layer_output_norm" in layer:
                layer["ffn_post_norm"] = layer.pop("layer_output_norm")

    # share rope_freqs into each layer (same array, no copy)
    ff = params.pop("rope_freqs", None)
    if ff is not None:
        for layer in params["layers"]:
            layer["rope_freqs"] = ff

    vocab = Vocab.from_gguf_kv(gm.kv)
    tokenizer = None
    if with_tokenizer:
        try:
            tokenizer = Tokenizer(vocab)
        except NotImplementedError:
            log.warning("no tokenizer for vocab type %s", vocab.vocab_type)
    return LoadedModel(cfg, params, vocab, tokenizer, gm.kv)
