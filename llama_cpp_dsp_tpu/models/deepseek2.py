"""DeepSeek-V2/V3 multi-head latent attention (MLA).

Capability mirror of reference llm_build_deepseek2 (src/llama-model.cpp),
re-designed TPU-first: instead of expanding the latent through wkv_b and
caching full per-head K/V like the reference does, we cache the compressed
latent itself — one "head" of dim (kv_lora_rank + qk_rope_dim) — and absorb
the key up-projection into the query (the matrix-absorption identity
q_nope^T (W_uk c) = (W_uk^T q_nope)^T c). This cuts KV-cache bytes by
~n_heads× and turns decode attention into a single skinny MXU matmul over
the latent, which is the speed-of-light formulation on TPU.

The surrounding layer (norms, MoE with shared experts + leading dense
layers) reuses the generic decoder pieces in models/llama.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import qmm, rms_norm, softmax_f32
from ..ops.rope import apply_rope
from .llama import LlamaConfig, Params, _mm, softmax_f32 as _sm  # noqa: F401


def _dense(w, dtype):
    """Dequantize a (possibly packed) weight to a dense array for reshaping."""
    from ..ops.qtensor import QTensor
    from ..quant.jax_dequant import dequant

    if isinstance(w, QTensor):
        return dequant(w, dtype)
    return jnp.asarray(w, dtype)


def mla_self_attention(
    x: jax.Array,  # normed input [B, T, C]
    layer: Params,
    cfg: LlamaConfig,
    positions: jax.Array,
    cache,  # KVCache with n_kv_heads=1, head_dim=kv_cache_dim (128-padded)
    layer_idx: int,
    n_past,
    mask: jax.Array | None,
    compute_dtype,
    tap=None,
    flash: bool = False,
):
    """Absorbed-MLA attention. Returns (out [B,T,C], cache)."""
    b, t, _ = x.shape
    h = cfg.n_heads
    r = cfg.kv_lora_rank
    dn, dr, dv = cfg.qk_nope_dim, cfg.qk_rope_dim, cfg.v_head_dim
    cpad = cfg.kv_cache_dim  # r + dr rounded up to 128 (zero pad lanes)

    # --- queries ---------------------------------------------------------
    if cfg.q_lora_rank and "attn_q_a" in layer:
        qa = qmm(x, layer["attn_q_a"], compute_dtype=compute_dtype)
        qa = rms_norm(qa, layer["attn_q_a_norm"], cfg.rms_eps)
        q = qmm(qa, layer["attn_q_b"], compute_dtype=compute_dtype)
    else:
        q = qmm(x, layer["attn_q"], compute_dtype=compute_dtype)
    q = q.reshape(b, t, h, dn + dr)
    q_nope, q_rope = q[..., :dn], q[..., dn:]
    q_rope = apply_rope(q_rope, positions, cfg.rope)

    # --- latent KV -------------------------------------------------------
    kv = qmm(x, layer["attn_kv_a_mqa"], compute_dtype=compute_dtype)  # [B,T,r+dr]
    latent, k_rope = kv[..., :r], kv[..., r:]
    latent = rms_norm(latent, layer["attn_kv_a_norm"], cfg.rms_eps)
    k_rope = apply_rope(k_rope[:, :, None, :], positions, cfg.rope)[:, :, 0, :]
    entry = jnp.concatenate([latent, k_rope], axis=-1)[:, :, None, :]  # [B,T,1,r+dr]
    if cpad > r + dr:
        entry = jnp.pad(entry, ((0, 0), (0, 0), (0, 0), (0, cpad - r - dr)))

    if cache is not None:
        cache = cache.write(layer_idx, entry, entry, n_past)
    # --- absorb W_uk into q ----------------------------------------------
    # wkv_b rows: per head [dn rows of W_uk; dv rows of W_uv] over latent r
    wkv_b = _dense(layer["attn_kv_b"], compute_dtype).reshape(h, dn + dv, r)
    w_uk, w_uv = wkv_b[:, :dn, :], wkv_b[:, dn:, :]  # [H,dn,r], [H,dv,r]
    q_lat = jnp.einsum("bthn,hnr->bthr", q_nope.astype(jnp.float32),
                       w_uk.astype(jnp.float32))  # [B,T,H,r]

    scale = 1.0 / ((dn + dr) ** 0.5) * cfg.rope.attn_factor**2

    if (flash and t == 1 and cache is not None and cpad % 128 == 0
            and r % 128 == 0 and cache.capacity % 128 == 0
            and hasattr(cache, "k")):
        # fused latent attention: ONE pass over the cached latents computes
        # scores and the weighted latent sum (the XLA path reads the cache
        # twice); concat q works because score = [q_lat; q_rope]·[lat; rope]
        from ..ops.pallas.attention import mla_flash_decode

        q_cat = jnp.concatenate(
            [q_lat[:, 0], q_rope[:, 0].astype(jnp.float32)], axis=-1)
        if cpad > r + dr:
            q_cat = jnp.pad(q_cat, ((0, 0), (0, 0), (0, cpad - r - dr)))
        lengths = positions[:, 0] + 1
        attn_lat = mla_flash_decode(
            q_cat, cache.k[layer_idx], lengths, scale=float(scale), r=r,
        )  # [B, H, r] f32
        out = jnp.einsum("bhr,hvr->bhv", attn_lat, w_uv.astype(jnp.float32))
        out = out.reshape(b, 1, h * dv).astype(compute_dtype)
        if tap is not None:
            tap(f"blk.{layer_idx}.attn_output.weight", out)
        return _mm(out, layer, "attn_output", compute_dtype), cache

    if cache is not None:
        kc, _ = cache.layer(layer_idx)  # [B,1,S,cpad]
        kc = kc[:, 0, :, :]
    else:
        kc = entry[:, :, 0, :].astype(compute_dtype)
    lat_c, rope_c = kc[..., :r], kc[..., r : r + dr]

    scores = (
        jnp.einsum("bthr,bsr->bhts", q_lat, lat_c.astype(jnp.float32))
        + jnp.einsum("bthd,bsd->bhts", q_rope.astype(jnp.float32),
                     rope_c.astype(jnp.float32))
    ) * scale
    if mask is not None:
        bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min) \
            if mask.dtype == jnp.bool_ else mask.astype(jnp.float32)
        scores = scores + bias[:, None, :, :]
    probs = softmax_f32(scores, axis=-1)

    attn_lat = jnp.einsum("bhts,bsr->bthr", probs, lat_c.astype(jnp.float32))
    out = jnp.einsum("bthr,hvr->bthv", attn_lat, w_uv.astype(jnp.float32))
    out = out.reshape(b, t, h * dv).astype(compute_dtype)
    if tap is not None:
        tap(f"blk.{layer_idx}.attn_output.weight", out)
    return _mm(out, layer, "attn_output", compute_dtype), cache
