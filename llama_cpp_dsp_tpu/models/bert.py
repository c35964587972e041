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
from .llama import LlamaConfig, Params, _mm, activate, alibi_slopes


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
    if cfg.pos_embd_type == "alibi":
        # jina-bert-v2: ALiBi positional bias, f_max_alibi_bias=8
        # (reference load_hparams LLM_ARCH_JINA_BERT_V2)
        slopes = alibi_slopes(h, cfg.max_alibi_bias)  # [H]
        dist = jnp.arange(t, dtype=jnp.float32)  # |i-j| symmetric for encoders
        rel = -jnp.abs(dist[None, :] - dist[:, None])  # [T, T]
        bias = bias + slopes[None, :, None, None] * rel[None, None]

    hkv = cfg.n_kv_heads or h
    for layer in params["layers"]:
        x_in = x  # layer input (inpL) — re-added around each sub-block
        if "attn_qkv" in layer:
            # nomic-bert fused wqkv (reference llm_build_bert NOMIC_BERT
            # branch: view splits at n_embd / n_embd_gqa offsets)
            qkv = _mm(x, layer, "attn_qkv", compute_dtype)
            q, k, v = jnp.split(qkv, [h * d, (h + hkv) * d], axis=-1)
        else:
            q = _mm(x, layer, "attn_q", compute_dtype)
            k = _mm(x, layer, "attn_k", compute_dtype)
            v = _mm(x, layer, "attn_v", compute_dtype)
        if "attn_q_norm" in layer:  # jina-v2-code per-layer q/k LayerNorms
            q = layer_norm(q, layer["attn_q_norm"],
                           layer.get("attn_q_norm_bias"), eps)
            k = layer_norm(k, layer["attn_k_norm"],
                           layer.get("attn_k_norm_bias"), eps)
        q = q.reshape(b, t, h, d)
        k = k.reshape(b, t, hkv, d)
        v = v.reshape(b, t, hkv, d)
        if cfg.pos_embd_type == "rope":
            # nomic-bert: NEOX rope instead of learned positions
            from ..ops.rope import apply_rope

            pos = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
            q = apply_rope(q, pos, cfg.rope)
            k = apply_rope(k, pos, cfg.rope)
        if hkv != h:
            k = jnp.repeat(k, h // hkv, axis=2)
            v = jnp.repeat(v, h // hkv, axis=2)
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / (d ** 0.5)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        attn = jnp.einsum("bhts,bshd->bthd", probs,
                          v.astype(jnp.float32)).reshape(b, t, h * d)
        attn = _mm(attn.astype(compute_dtype), layer, "attn_output", compute_dtype)
        # post-LN (reference build_norm after ggml_add, llm_build_bert)
        x = layer_norm(x + attn, layer["attn_output_norm"],
                       layer.get("attn_output_norm_bias"), eps)
        if "ffn_norm" in layer:
            # jina-v2-code attn_norm_2 (loader maps attn_norm_2 → ffn_norm):
            # re-add the LAYER INPUT and norm again (llm_build_bert)
            x = layer_norm(x + x_in, layer["ffn_norm"],
                           layer.get("ffn_norm_bias"), eps)
        up = _mm(x, layer, "ffn_up", compute_dtype)
        if cfg.gated_ffn and "ffn_gate" in layer:
            # nomic (SiLU) / jina-v2 (GELU) gated FFN, LLM_FFN_PAR
            gate = _mm(x, layer, "ffn_gate", compute_dtype)
            act = activate(gate, cfg.act) * up.astype(jnp.float32)
        else:
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
