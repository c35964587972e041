"""BERT-family encoder (embedding/rerank models).

Capability mirror of reference llm_build_bert (src/llama-model.cpp): token +
position + token-type embeddings → embedding LayerNorm → post-LN transformer
blocks (LN applied AFTER each residual add, unlike the decoder's pre-LN) →
pooled output (cls / mean / none — reference llama_pooling_type).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import layer_norm, qmm, take_rows
from .llama import LlamaConfig, Params, _mm


def bert_forward(
    params: Params,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, T]
    attn_mask: jax.Array | None = None,  # [B, T] 1=real, 0=pad
    token_types: jax.Array | None = None,
    *,
    compute_dtype=jnp.float32,
    pooling: str = "mean",  # "none" | "mean" | "cls"
):
    b, t = tokens.shape
    h, d = cfg.n_heads, cfg.head_dim
    eps = cfg.rms_eps

    x = take_rows(params["token_embd"], tokens, dtype=compute_dtype)
    if "pos_embd" in params:
        pos = jnp.arange(t, dtype=jnp.int32)[None]
        x = x + take_rows(params["pos_embd"], pos, dtype=compute_dtype)
    if "token_types" in params:
        tt = token_types if token_types is not None else jnp.zeros_like(tokens)
        x = x + take_rows(params["token_types"], tt, dtype=compute_dtype)
    x = layer_norm(x, params["token_embd_norm"],
                   params.get("token_embd_norm_bias"), eps)

    if attn_mask is None:
        attn_mask = jnp.ones((b, t), bool)
    bias = jnp.where(attn_mask[:, None, None, :], 0.0,
                     jnp.finfo(jnp.float32).min)

    for layer in params["layers"]:
        q = _mm(x, layer, "attn_q", compute_dtype).reshape(b, t, h, d)
        k = _mm(x, layer, "attn_k", compute_dtype).reshape(b, t, h, d)
        v = _mm(x, layer, "attn_v", compute_dtype).reshape(b, t, h, d)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / (d ** 0.5)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs,
                          v.astype(jnp.float32)).reshape(b, t, h * d)
        attn = _mm(attn.astype(compute_dtype), layer, "attn_output", compute_dtype)
        # post-LN (reference build_norm after ggml_add, llm_build_bert)
        x = layer_norm(x + attn, layer["attn_output_norm"],
                       layer.get("attn_output_norm_bias"), eps)
        up = _mm(x, layer, "ffn_up", compute_dtype)
        act = jax.nn.gelu(up.astype(jnp.float32), approximate=False)
        down = _mm(act.astype(compute_dtype), layer, "ffn_down", compute_dtype)
        x = layer_norm(x + down, layer["layer_output_norm"],
                       layer.get("layer_output_norm_bias"), eps)

    xf = x.astype(jnp.float32)
    if pooling == "cls":
        return xf[:, 0]
    if pooling == "rank":
        # classification head on the CLS token (reference build_pooling
        # LLAMA_POOLING_TYPE_RANK, src/llama-graph.cpp): optional
        # cls dense+tanh, then optional cls.output projection — rerank
        # models carry either or both (bge-reranker: both; jina: cls only)
        h = xf[:, 0]
        if "cls" in params:
            h = _mm(h.astype(compute_dtype), params, "cls",
                    compute_dtype).astype(jnp.float32)
            h = jnp.tanh(h)
        if "cls_output" in params:
            h = _mm(h.astype(compute_dtype), params, "cls_output",
                    compute_dtype).astype(jnp.float32)
        return h  # [B, 1] (or [B, C] when only a cls dense exists)
    if pooling == "mean":
        m = attn_mask.astype(jnp.float32)[:, :, None]
        return (xf * m).sum(1) / jnp.maximum(m.sum(1), 1e-6)
    return xf
