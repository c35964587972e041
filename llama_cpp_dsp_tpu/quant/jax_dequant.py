"""JAX dequantization of QTensors (XLA compute path).

Numerically identical to quant/ref_numpy.py (same f32 operation order as the
reference dequantize_row_* functions); used by the XLA dequant→matmul path
and as the on-device oracle for the Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.constants import QK_K, GGMLType
from ..ops.qtensor import QTensor

F32 = jnp.float32


def _nibbles(qs: jax.Array, n: int, k: int, order: str) -> jax.Array:
    """Unpack nibble-packed bytes [N, K/2] → uint8 [N, K] in element order.

    order="legacy": block of 32: bytes j hold elements (j, j+16) (lo, hi)
    order="kquant": chunk of 64: bytes j hold elements (j, j+32) (lo, hi)
    """
    span = 16 if order == "legacy" else 32
    b = qs.reshape(n, k // (2 * span), span)
    lo = b & 0x0F
    hi = b >> 4
    return jnp.concatenate([lo, hi], axis=-1).reshape(n, k)


def dequant(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    n, k = qt.shape
    kind = qt.kind
    if kind == GGMLType.Q8_0:
        d = qt["d"].astype(F32)  # [N, K/g] (g=32; exact-IQ repacks use 16)
        g = k // d.shape[-1]
        q = qt["qs"].astype(F32).reshape(n, k // g, g)
        return (q * d[:, :, None]).reshape(n, k).astype(dtype)
    if kind in (GGMLType.Q4_0, GGMLType.Q4_1):
        q = _nibbles(qt["qs"], n, k, "legacy").astype(F32).reshape(n, k // 32, 32)
        d = qt["d"].astype(F32)[:, :, None]
        if kind == GGMLType.Q4_0:
            y = (q - 8.0) * d
        else:
            y = q * d + qt["m"].astype(F32)[:, :, None]
        return y.reshape(n, k).astype(dtype)
    if kind in (GGMLType.Q5_0, GGMLType.Q5_1):
        q = _nibbles(qt["qs"], n, k, "legacy").reshape(n, k // 32, 32)
        # qh: 4 bytes per 32-block, bit j → element j (j<16: bit j of the
        # little-endian u32; element j+16: bit j+16)
        qh = qt["qh"].reshape(n, k // 32, 4)
        shifts = jnp.arange(8, dtype=jnp.uint8)
        bits = ((qh[..., None] >> shifts) & 1).reshape(n, k // 32, 32)  # little-endian
        q = q + bits * 16
        d = qt["d"].astype(F32)[:, :, None]
        if kind == GGMLType.Q5_0:
            y = (q.astype(F32) - 16.0) * d
        else:
            y = q.astype(F32) * d + qt["m"].astype(F32)[:, :, None]
        return y.reshape(n, k).astype(dtype)
    if kind == GGMLType.Q4_K:
        s = k // QK_K
        q = _nibbles(qt["qs"], n, k, "kquant").astype(F32).reshape(n, s, 8, 32)
        dl = qt["d"].astype(F32)[:, :, None] * qt["sc"].astype(F32)  # [N,S,8]
        ml = qt["dmin"].astype(F32)[:, :, None] * qt["mn"].astype(F32)
        y = q * dl[..., None] - ml[..., None]
        return y.reshape(n, k).astype(dtype)
    if kind == GGMLType.Q5_K:
        s = k // QK_K
        q = _nibbles(qt["qs"], n, k, "kquant").reshape(n, s, 8, 32)
        qh = qt["qh"]  # [N, S, 32]; bit g of byte l → group g element l
        g = jnp.arange(8, dtype=jnp.uint8)
        hbit = (qh[:, :, None, :] >> g[None, None, :, None]) & 1  # [N,S,8,32]
        q = (q + hbit * 16).astype(F32)
        dl = qt["d"].astype(F32)[:, :, None] * qt["sc"].astype(F32)
        ml = qt["dmin"].astype(F32)[:, :, None] * qt["mn"].astype(F32)
        y = q * dl[..., None] - ml[..., None]
        return y.reshape(n, k).astype(dtype)
    if kind == GGMLType.Q6_K:
        s = k // QK_K
        ql = qt["ql"].reshape(n, s, 2, 64)  # per 128-half
        qh = qt["qh"].reshape(n, s, 2, 32)
        l = ql[..., :32]
        h = ql[..., 32:]
        q1 = (l & 0x0F) | (((qh >> 0) & 3) << 4)
        q2 = (h & 0x0F) | (((qh >> 2) & 3) << 4)
        q3 = (l >> 4) | (((qh >> 4) & 3) << 4)
        q4 = (h >> 4) | (((qh >> 6) & 3) << 4)
        q = jnp.concatenate([q1, q2, q3, q4], axis=-1).astype(jnp.int32) - 32  # [N,S,2,128]
        q = q.reshape(n, s, 16, 16)
        dl = qt["d"].astype(F32)[:, :, None] * qt["sc"].astype(F32)  # [N,S,16]
        y = q.astype(F32) * dl[..., None]
        return y.reshape(n, k).astype(dtype)
    if kind == GGMLType.Q2_K:
        s = k // QK_K
        qs = qt["qs"].reshape(n, s, 2, 32)  # two 128-halves, 32 bytes each
        shifts = jnp.arange(4, dtype=jnp.uint8) * 2
        q = (qs[:, :, :, None, :] >> shifts[None, None, None, :, None]) & 3
        q = q.reshape(n, s, 16, 16).astype(F32)
        dl = qt["d"].astype(F32)[:, :, None] * qt["sc"].astype(F32)
        ml = qt["dmin"].astype(F32)[:, :, None] * qt["mn"].astype(F32)
        y = q * dl[..., None] - ml[..., None]
        return y.reshape(n, k).astype(dtype)
    if kind == GGMLType.Q3_K:
        s = k // QK_K
        qs = qt["qs"].reshape(n, s, 2, 32)
        shifts = jnp.arange(4, dtype=jnp.uint8) * 2
        q = ((qs[:, :, :, None, :] >> shifts[None, None, None, :, None]) & 3)
        q = q.astype(jnp.int32)  # [n, s, half, plane, 32]
        hm = qt["hmask"]  # [n, s, 32]; element j of plane p half h ↔ bit 4h+p
        half = jnp.arange(2)[:, None]
        plane = jnp.arange(4)[None, :]
        bit = (4 * half + plane).astype(jnp.uint8)  # [2, 4]
        hbit = (hm[:, :, None, None, :] >> bit[None, None, :, :, None]) & 1
        q = q + 4 * hbit.astype(jnp.int32) - 4
        dl = qt["d"].astype(F32)[:, :, None] * qt["sc"].astype(F32)  # [n,s,16]
        # plane-row g=4h+p covers groups (2g, 2g+1), 16 elements each
        dlp = jnp.broadcast_to(
            dl.reshape(n, s, 8, 2, 1), (n, s, 8, 2, 16)).reshape(n, s, 8, 32)
        y = q.reshape(n, s, 8, 32).astype(F32) * dlp
        return y.reshape(n, k).astype(dtype)
    if kind in (GGMLType.IQ4_NL, GGMLType.IQ4_XS):
        from .ref_numpy import KVALUES_IQ4NL

        lut = jnp.asarray(KVALUES_IQ4NL, F32)
        q = lut[_nibbles(qt["qs"], n, k, "legacy").astype(jnp.int32)]
        y = q.reshape(n, k // 32, 32) * qt["d"].astype(F32)[:, :, None]
        return y.reshape(n, k).astype(dtype)
    from ..ops.qtensor import IQ_TABLES

    if kind in IQ_TABLES:
        # table carrier (IQ1/IQ2/IQ3/TQ): value = d_group · table[nibble];
        # the integer table + f32 group scales reproduce the reference
        # dequantize_row_* exactly (ops/qtensor.IQ_TABLES)
        lut = jnp.asarray(IQ_TABLES[kind], F32)
        g = k // qt["d"].shape[-1]
        q = lut[_nibbles(qt["qs"], n, k, "legacy").astype(jnp.int32)]
        y = q.reshape(n, k // g, g) * qt["d"].astype(F32)[:, :, None]
        return y.reshape(n, k).astype(dtype)
    raise NotImplementedError(f"jax dequant {kind.name}")
