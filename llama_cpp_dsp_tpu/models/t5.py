"""T5 encoder-decoder.

Capability mirror of reference llm_build_t5 / llm_build_t5_enc /
llm_build_t5_dec (src/llama-model.cpp, archs T5 / T5ENCODER): RMS-normed
pre-LN blocks, learned bucketed relative-position attention bias (shared
from the first layer), optional gated FFN, decoder cross-attention over the
encoder output, tied-embedding logit scaling.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import qmm, rms_norm


@dataclass(frozen=True)
class T5Config:
    n_layers: int
    n_embd: int
    n_heads: int
    head_dim: int
    n_ff: int
    n_vocab: int
    rel_buckets: int = 32
    rel_max_distance: int = 128
    eps: float = 1e-6
    act: str = "relu"  # "relu" | "gelu" (gated when ffn_gate present)
    tie_embeddings: bool = True


def _rel_bucket(rel: np.ndarray, bidirectional: bool, n_buckets: int,
                max_dist: int) -> np.ndarray:
    """T5 relative position bucketing (HF _relative_position_bucket /
    reference llm_graph_input_pos_bucket)."""
    ret = np.zeros_like(rel)
    n = n_buckets
    if bidirectional:
        n //= 2
        ret += (rel > 0).astype(rel.dtype) * n
        rel = np.abs(rel)
    else:
        rel = -np.minimum(rel, 0)
    max_exact = n // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_dist / max_exact) * (n - max_exact)
    ).astype(rel.dtype)
    large = np.minimum(large, n - 1)
    return ret + np.where(is_small, rel, large)


def rel_bias(rel_b: jax.Array, q_len: int, k_len: int, *, bidirectional: bool,
             n_buckets: int, max_dist: int, k_offset: int = 0) -> jax.Array:
    """rel_b [n_buckets, H] → additive bias [H, q_len, k_len]."""
    ctx_pos = np.arange(q_len)[:, None] + k_offset
    mem_pos = np.arange(k_len)[None, :]
    buckets = _rel_bucket(mem_pos - ctx_pos, bidirectional, n_buckets, max_dist)
    return jnp.asarray(rel_b)[jnp.asarray(buckets)].transpose(2, 0, 1)


def _attn(x, kv, layer, prefix, cfg: T5Config, bias, mask, compute_dtype):
    b, t, _ = x.shape
    s = kv.shape[1]
    h, d = cfg.n_heads, cfg.head_dim
    q = qmm(x, layer[f"{prefix}_q"], compute_dtype=compute_dtype).reshape(b, t, h, d)
    k = qmm(kv, layer[f"{prefix}_k"], compute_dtype=compute_dtype).reshape(b, s, h, d)
    v = qmm(kv, layer[f"{prefix}_v"], compute_dtype=compute_dtype).reshape(b, s, h, d)
    # T5 attention is unscaled (the rel bias absorbs the scale)
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    if bias is not None:
        scores = scores + bias[None].astype(jnp.float32)
    if mask is not None:
        scores = scores + jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs,
                     v.astype(jnp.float32)).reshape(b, t, h * d)
    return qmm(out.astype(compute_dtype), layer[f"{prefix}_o"],
               compute_dtype=compute_dtype)


def _ffn(x, layer, cfg: T5Config, compute_dtype):
    act = jax.nn.relu if cfg.act == "relu" else (
        lambda v: jax.nn.gelu(v, approximate=False))
    if "ffn_gate" in layer:
        g = act(qmm(x, layer["ffn_gate"], compute_dtype=compute_dtype)
                .astype(jnp.float32))
        u = qmm(x, layer["ffn_up"], compute_dtype=compute_dtype)
        h = (g * u.astype(jnp.float32)).astype(compute_dtype)
    else:
        h = act(qmm(x, layer["ffn_up"], compute_dtype=compute_dtype)
                .astype(jnp.float32)).astype(compute_dtype)
    return qmm(h, layer["ffn_down"], compute_dtype=compute_dtype)


def t5_encode(params: dict, cfg: T5Config, tokens: jax.Array, *,
              compute_dtype=jnp.float32) -> jax.Array:
    """Encoder: [B, T] → [B, T, C] (reference llm_build_t5_enc)."""
    from ..ops import take_rows

    b, t = tokens.shape
    x = take_rows(params["token_embd"], tokens, dtype=compute_dtype)
    bias = rel_bias(params["enc_rel_b"], t, t, bidirectional=True,
                    n_buckets=cfg.rel_buckets, max_dist=cfg.rel_max_distance)
    for layer in params["enc_layers"]:
        h = rms_norm(x, layer["attn_norm"], cfg.eps)
        x = x + _attn(h, h, layer, "attn", cfg, bias, None, compute_dtype)
        h = rms_norm(x, layer["ffn_norm"], cfg.eps)
        x = x + _ffn(h, layer, cfg, compute_dtype)
    return rms_norm(x, params["enc_output_norm"], cfg.eps)


def t5_decode(params: dict, cfg: T5Config, tokens: jax.Array,
              enc_out: jax.Array, *, compute_dtype=jnp.float32) -> jax.Array:
    """Decoder full-recompute: [B, T] + enc [B, S, C] → logits [B, T, V]
    (reference llm_build_t5_dec)."""
    from ..ops import take_rows

    b, t = tokens.shape
    x = take_rows(params["token_embd"], tokens, dtype=compute_dtype)
    bias = rel_bias(params["dec_rel_b"], t, t, bidirectional=False,
                    n_buckets=cfg.rel_buckets, max_dist=cfg.rel_max_distance)
    causal = jnp.tril(jnp.ones((1, 1, t, t), bool))
    for layer in params["dec_layers"]:
        h = rms_norm(x, layer["attn_norm"], cfg.eps)
        x = x + _attn(h, h, layer, "attn", cfg, bias, causal, compute_dtype)
        h = rms_norm(x, layer["cross_attn_norm"], cfg.eps)
        x = x + _attn(h, enc_out, layer, "cross_attn", cfg, None, None,
                      compute_dtype)
        h = rms_norm(x, layer["ffn_norm"], cfg.eps)
        x = x + _ffn(h, layer, cfg, compute_dtype)
    x = rms_norm(x, params["dec_output_norm"], cfg.eps)
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
        x = x * (cfg.n_embd ** -0.5)  # tied-embedding scale (HF/reference)
    return qmm(x, out_w, compute_dtype=compute_dtype).astype(jnp.float32)
