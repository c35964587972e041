"""Llama-family transformer (functional JAX).

Covers the graph built by reference llm_build_llama (src/llama-model.cpp:4408)
and its close relatives (qwen2 = neox rope + qkv bias; mistral = same graph):
rms_norm → q/k/v proj (+ optional bias) → RoPE → GQA attention over KV cache
→ out proj → rms_norm → SwiGLU FFN (or MoE) → residual; final norm → lm_head.

Weights are QTensors (packed GGUF quant blocks) or dense arrays; matmuls go
through ops.qmm which dispatches to the fused Pallas kernels on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from ..gguf.constants import Keys
from ..ops import Weight, qmm, rms_norm, silu, softmax_f32, take_rows
from ..ops.rope import RopeParams, apply_rope


@dataclass(frozen=True)
class LlamaConfig:
    arch: str
    n_layers: int
    n_embd: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    n_ff: int
    n_vocab: int
    n_ctx_train: int
    rms_eps: float = 1e-5
    rope: RopeParams = field(default_factory=lambda: RopeParams(n_dims=0))
    n_expert: int = 0
    n_expert_used: int = 0
    attn_bias: bool = False
    qk_norm: bool = False  # qwen3/olmo2-style q/k rms norm
    tie_embeddings: bool = False

    @property
    def n_embd_head(self) -> int:
        return self.head_dim

    @classmethod
    def from_gguf_kv(cls, kv: dict[str, Any]) -> "LlamaConfig":
        arch = str(kv[Keys.General.ARCHITECTURE])

        def key(template: str):
            return template.format(arch=arch)

        def get(template: str, default=None):
            return kv.get(key(template), default)

        n_embd = int(get(Keys.LLM.EMBEDDING_LENGTH))
        n_heads = int(get(Keys.LLM.ATTN_HEAD_COUNT))
        n_kv_heads = int(get(Keys.LLM.ATTN_HEAD_COUNT_KV, n_heads))
        head_dim = int(get(Keys.LLM.ATTN_KEY_LENGTH, n_embd // n_heads))
        n_vocab = int(get(Keys.LLM.VOCAB_SIZE, 0)) or len(kv.get(Keys.Tokenizer.LIST, []))
        rope_dims = int(get(Keys.LLM.ROPE_DIMENSION_COUNT, head_dim))
        rope_mode = "neox" if arch in _NEOX_ROPE_ARCHS else "norm"
        scaling_type = get(Keys.LLM.ROPE_SCALING_TYPE, "none")
        freq_scale = 1.0
        ext_factor = 0.0
        factor = float(get(Keys.LLM.ROPE_SCALING_FACTOR, 1.0) or 1.0)
        if scaling_type == "linear" and factor:
            freq_scale = 1.0 / factor
        elif scaling_type == "yarn" and factor:
            freq_scale = 1.0 / factor
            ext_factor = 1.0
        rope = RopeParams(
            n_dims=rope_dims,
            mode=rope_mode,
            freq_base=float(get(Keys.LLM.ROPE_FREQ_BASE, 10000.0)),
            freq_scale=freq_scale,
            ext_factor=ext_factor,
            n_ctx_orig=int(get(Keys.LLM.ROPE_SCALING_ORIG_CTX, 0) or 0),
        )
        return cls(
            arch=arch,
            n_layers=int(get(Keys.LLM.BLOCK_COUNT)),
            n_embd=n_embd,
            n_heads=n_heads,
            n_kv_heads=n_kv_heads,
            head_dim=head_dim,
            n_ff=int(get(Keys.LLM.FEED_FORWARD_LENGTH)),
            n_vocab=n_vocab,
            n_ctx_train=int(get(Keys.LLM.CONTEXT_LENGTH, 2048)),
            rms_eps=float(get(Keys.LLM.ATTN_LAYERNORM_RMS_EPS, 1e-5)),
            rope=rope,
            n_expert=int(get(Keys.LLM.EXPERT_COUNT, 0) or 0),
            n_expert_used=int(get(Keys.LLM.EXPERT_USED_COUNT, 0) or 0),
            attn_bias=arch in _ATTN_BIAS_ARCHS,
            qk_norm=arch in _QK_NORM_ARCHS,
        )


_NEOX_ROPE_ARCHS = {"qwen2", "qwen2moe", "qwen3", "qwen3moe", "stablelm", "phi2", "phi3",
                    "gptneox", "olmo", "olmo2", "gemma", "gemma2", "gemma3", "starcoder2"}
_ATTN_BIAS_ARCHS = {"qwen2", "qwen2moe", "qwen", "phi2", "starcoder2"}
_QK_NORM_ARCHS = {"qwen3", "qwen3moe", "olmo2"}

Params = dict[str, Any]


def _mask_value(dtype) -> float:
    return float(jnp.finfo(jnp.float32).min)


def attention(
    q: jax.Array,  # [B, T, H, D] (already roped)
    k: jax.Array,  # [B, S, Hkv, D]
    v: jax.Array,  # [B, S, Hkv, D]
    mask: jax.Array | None,  # [B, T, S] bool (True = attend) or additive f32
    scale: float,
) -> jax.Array:
    """Masked multi-head attention, f32 softmax/accumulation like the
    reference's non-flash path (llama-graph.cpp:1211-1230, KQ in f32)."""
    b, t, h, d = q.shape
    hkv = k.shape[2]
    rep = h // hkv
    qf = q.astype(jnp.float32).reshape(b, t, hkv, rep, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("bthrd,bshd->bhrts", qf, kf) * scale  # [B,Hkv,rep,T,S]
    if mask is not None:
        if mask.dtype == jnp.bool_:
            bias = jnp.where(mask, 0.0, _mask_value(jnp.float32))
        else:
            bias = mask.astype(jnp.float32)
        scores = scores + bias[:, None, None, :, :]
    probs = softmax_f32(scores, axis=-1)
    out = jnp.einsum("bhrts,bshd->bthrd", probs, vf)
    return out.reshape(b, t, h * d)


def ffn_swiglu(x: jax.Array, layer: Params, compute_dtype) -> jax.Array:
    gate = qmm(x, layer["ffn_gate"], compute_dtype=compute_dtype)
    up = qmm(x, layer["ffn_up"], compute_dtype=compute_dtype)
    h = (silu(gate) * up).astype(compute_dtype)
    return qmm(h, layer["ffn_down"], compute_dtype=compute_dtype)


def ffn_moe(x: jax.Array, layer: Params, cfg: LlamaConfig, compute_dtype) -> jax.Array:
    """MoE FFN — reference build_moe_ffn (src/llama-graph.cpp): softmax router,
    top-k experts, MUL_MAT_ID expert matmuls, weighted sum."""
    b, t, e = x.shape[0], x.shape[1], cfg.n_expert
    logits = qmm(x, layer["ffn_gate_inp"], compute_dtype=compute_dtype)  # [B,T,E]
    probs = softmax_f32(logits)
    weights, sel = jax.lax.top_k(probs, cfg.n_expert_used)  # [B,T,U]
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)  # norm like mixtral
    # dense-gather formulation: one-hot dispatch (fine for small E; the
    # sharded expert-parallel path lives in parallel/)
    gate_w, up_w, down_w = layer["ffn_gate_exps"], layer["ffn_up_exps"], layer["ffn_down_exps"]

    def expert_ffn(eid):
        g = qmm(x, _expert_slice(gate_w, eid), compute_dtype=compute_dtype)
        u = qmm(x, _expert_slice(up_w, eid), compute_dtype=compute_dtype)
        return qmm((silu(g) * u).astype(compute_dtype), _expert_slice(down_w, eid),
                   compute_dtype=compute_dtype)

    outs = jnp.stack([expert_ffn(eid) for eid in range(e)], axis=2)  # [B,T,E,D]
    onehot = jax.nn.one_hot(sel, e, dtype=jnp.float32) * weights[..., None]  # [B,T,U,E]
    mix = jnp.einsum("btue,bted->btd", onehot, outs.astype(jnp.float32))
    return mix.astype(x.dtype)


def _expert_slice(w, eid: int):
    from ..ops.qtensor import QTensor

    if isinstance(w, QTensor):
        # 3-D expert weights are stored as a leading expert axis on each field
        return QTensor(w.kind, w.shape, {k: a[eid] for k, a in w.arrays.items()})
    return w[eid]


def decode_layer(
    x: jax.Array,  # [B, T, C]
    layer: Params,
    cfg: LlamaConfig,
    positions: jax.Array,  # [B, T]
    cache,  # KVCache | None
    layer_idx: int,
    n_past,  # traced int scalar: write offset into the cache
    mask: jax.Array | None,
    compute_dtype,
    tap=None,  # optional callable(name, activation) — imatrix/eval-callback
):
    b, t, c = x.shape
    h, hkv, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    attn_in = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
    if tap is not None:
        tap(f"blk.{layer_idx}.attn_q.weight", attn_in)
        tap(f"blk.{layer_idx}.attn_k.weight", attn_in)
        tap(f"blk.{layer_idx}.attn_v.weight", attn_in)
    q = qmm(attn_in, layer["attn_q"], compute_dtype=compute_dtype)
    k = qmm(attn_in, layer["attn_k"], compute_dtype=compute_dtype)
    v = qmm(attn_in, layer["attn_v"], compute_dtype=compute_dtype)
    if cfg.attn_bias:
        q = q + layer["attn_q_bias"]
        k = k + layer["attn_k_bias"]
        v = v + layer["attn_v_bias"]
    q = q.reshape(b, t, h, d)
    k = k.reshape(b, t, hkv, d)
    v = v.reshape(b, t, hkv, d)
    if cfg.qk_norm:
        q = rms_norm(q, layer["attn_q_norm"], cfg.rms_eps)
        k = rms_norm(k, layer["attn_k_norm"], cfg.rms_eps)
    ff = layer.get("rope_freqs")
    q = apply_rope(q, positions, cfg.rope, ff)
    k = apply_rope(k, positions, cfg.rope, ff)

    if cache is not None:
        cache = cache.write(layer_idx, k, v, n_past)
        k_all, v_all = cache.layer(layer_idx)
    else:
        k_all, v_all = k.astype(compute_dtype), v.astype(compute_dtype)

    scale = 1.0 / (d**0.5)
    attn = attention(q, k_all, v_all, mask, scale).astype(compute_dtype)
    if tap is not None:
        tap(f"blk.{layer_idx}.attn_output.weight", attn)
    attn = qmm(attn, layer["attn_output"], compute_dtype=compute_dtype)
    x = x + attn

    ffn_in = rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
    if tap is not None:
        tap(f"blk.{layer_idx}.ffn_gate.weight", ffn_in)
        tap(f"blk.{layer_idx}.ffn_up.weight", ffn_in)
    if cfg.n_expert > 0:
        ffn = ffn_moe(ffn_in, layer, cfg, compute_dtype)
    else:
        if tap is not None:
            gate = qmm(ffn_in, layer["ffn_gate"], compute_dtype=compute_dtype)
            up = qmm(ffn_in, layer["ffn_up"], compute_dtype=compute_dtype)
            h_act = (silu(gate) * up).astype(compute_dtype)
            tap(f"blk.{layer_idx}.ffn_down.weight", h_act)
            ffn = qmm(h_act, layer["ffn_down"], compute_dtype=compute_dtype)
            x = x + ffn
            return x, cache
        ffn = ffn_swiglu(ffn_in, layer, compute_dtype)
    x = x + ffn
    return x, cache


def forward(
    params: Params,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache=None,  # KVCache | None
    n_past=0,  # traced int scalar: cache write offset
    mask: jax.Array | None = None,  # [B, T, S] bool
    *,
    compute_dtype=jnp.bfloat16,
    tap=None,
):
    """Returns (logits [B, T, n_vocab] f32, updated cache)."""
    x = take_rows(params["token_embd"], tokens, dtype=compute_dtype)
    for i, layer in enumerate(params["layers"]):
        x, cache = decode_layer(
            x, layer, cfg, positions, cache, i, n_past, mask, compute_dtype, tap
        )
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    if tap is not None:
        tap("output.weight", x)
    logits = qmm(x, out_w, compute_dtype=compute_dtype)
    return logits.astype(jnp.float32), cache
