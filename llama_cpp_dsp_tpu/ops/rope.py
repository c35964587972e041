"""Rotary position embeddings.

Faithful to reference ggml_rope_ext semantics (ggml/src/ggml-cpu/ops.cpp
rope forward): NORM mode rotates adjacent pairs (x[2i], x[2i+1]); NEOX mode
rotates split halves (x[i], x[i+n/2]). theta = pos * freq_base^(-2i/n_dims),
optionally divided by per-dim freq_factors (rope_freqs tensor) and scaled by
1/freq_scale (linear scaling). YaRN corrections follow ggml's
ggml_rope_yarn_corr_dims formulation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class RopeParams:
    n_dims: int  # rotated dims (n_rot)
    mode: str = "norm"  # "norm" | "neox"
    freq_base: float = 10000.0
    freq_scale: float = 1.0
    ext_factor: float = 0.0  # YaRN extrapolation mix
    attn_factor: float = 1.0
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    n_ctx_orig: int = 0  # original context for YaRN


def _yarn_corr_dim(n_dims: int, n_ctx_orig: int, n_rot: float, base: float) -> float:
    return n_dims * math.log(n_ctx_orig / (n_rot * 2 * math.pi)) / (2 * math.log(base))


def _rope_angles(pos: jax.Array, rp: RopeParams, freq_factors: jax.Array | None):
    """pos [...,] → (cos, sin) each [..., n_dims/2] in f32."""
    half = rp.n_dims // 2
    i = jnp.arange(half, dtype=jnp.float32)
    theta_scale = rp.freq_base ** (-2.0 / rp.n_dims)
    inv_freq = theta_scale**i  # base^(-2i/n_dims)
    if freq_factors is not None:
        inv_freq = inv_freq / freq_factors.astype(jnp.float32)[:half]

    theta_extrap = pos.astype(jnp.float32)[..., None] * inv_freq
    theta_interp = rp.freq_scale * theta_extrap
    mscale = rp.attn_factor
    if rp.ext_factor != 0.0:
        # YaRN ramp mix — ggml_rope_yarn (ggml/src/ggml-cpu/ops.cpp)
        n_ctx_orig = rp.n_ctx_orig or 1
        low = max(0.0, math.floor(_yarn_corr_dim(rp.n_dims, n_ctx_orig, rp.beta_fast, rp.freq_base)))
        high = min(
            rp.n_dims - 1.0,
            math.ceil(_yarn_corr_dim(rp.n_dims, n_ctx_orig, rp.beta_slow, rp.freq_base)),
        )
        span = max(0.001, high - low)
        ramp = 1.0 - jnp.clip((2.0 * i - low) / span, 0.0, 1.0)
        ramp_mix = ramp * rp.ext_factor
        theta = theta_interp * (1 - ramp_mix) + theta_extrap * ramp_mix
        mscale = mscale * (1.0 + 0.1 * math.log(1.0 / rp.freq_scale)) if rp.freq_scale < 1 else mscale
    else:
        theta = theta_interp
    return jnp.cos(theta) * mscale, jnp.sin(theta) * mscale


def apply_rope(
    x: jax.Array,  # [..., T, H, D]
    pos: jax.Array,  # [..., T]
    rp: RopeParams,
    freq_factors: jax.Array | None = None,
) -> jax.Array:
    """Rotate the first n_dims dims of each head; pass the rest through."""
    d = x.shape[-1]
    n = rp.n_dims
    cos, sin = _rope_angles(pos, rp, freq_factors)  # [..., T, n/2]
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]
    xf = x.astype(jnp.float32)
    rot, rest = xf[..., :n], xf[..., n:]
    if rp.mode == "norm":
        x0 = rot[..., 0::2]
        x1 = rot[..., 1::2]
        y0 = x0 * cos - x1 * sin
        y1 = x0 * sin + x1 * cos
        out = jnp.stack([y0, y1], axis=-1).reshape(rot.shape)
    elif rp.mode == "neox":
        half = n // 2
        x0 = rot[..., :half]
        x1 = rot[..., half:]
        y0 = x0 * cos - x1 * sin
        y1 = x0 * sin + x1 * cos
        out = jnp.concatenate([y0, y1], axis=-1)
    else:
        raise ValueError(rp.mode)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out.astype(x.dtype)


def apply_mrope(
    x: jax.Array,  # [B, T, H, D]
    pos: jax.Array,  # [B, T] (all streams equal — text) or [B, 4, T]
    rp: RopeParams,
    sections: tuple[int, ...],  # 4 section widths in rotary pairs
    freq_factors: jax.Array | None = None,
) -> jax.Array:
    """Multimodal rotary embedding (qwen2vl) — reference ggml_rope_multi /
    ggml_mrope_cache_init (ggml/src/ggml-cpu/ops.cpp:5030): the frequency for
    pair i is the usual base^(-2i/n_dims) (continuous across sections), but
    the *position stream* (t/h/w/e) driving pair i is chosen by
    (i mod sum(sections)) against the section boundaries. Pairing is
    neox-style (is_neox || is_mrope branch, ops.cpp:5192). With all four
    streams equal (text-only) this reduces exactly to neox rope."""
    import numpy as np

    if pos.ndim == 2:  # text-only: every stream carries the token index
        pos = jnp.broadcast_to(pos[:, None, :], (pos.shape[0], 4, pos.shape[1]))
    half = rp.n_dims // 2
    csum = np.cumsum(list(sections) + [0, 0, 0][: 4 - len(sections)])
    sector = np.arange(half) % max(int(csum[-1]), 1)
    stream = np.searchsorted(csum, sector, side="right")  # [half] in 0..3
    onehot = jnp.asarray(np.eye(4, dtype=np.float32)[stream])  # [half, 4]

    cos4, sin4 = [], []
    for k in range(4):
        c, s = _rope_angles(pos[:, k, :], rp, freq_factors)  # [B, T, half]
        cos4.append(c)
        sin4.append(s)
    cos = jnp.einsum("kbti,ik->bti", jnp.stack(cos4), onehot)
    sin = jnp.einsum("kbti,ik->bti", jnp.stack(sin4), onehot)
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]

    xf = x.astype(jnp.float32)
    n = rp.n_dims
    rot, rest = xf[..., :n], xf[..., n:]
    x0, x1 = rot[..., :half], rot[..., half:]
    out = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out.astype(x.dtype)
