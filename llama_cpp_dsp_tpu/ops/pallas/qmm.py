"""Fused dequant-matmul Pallas kernels (role of reference MMQ/MMVQ,
ggml/src/ggml-cuda/mmq.cuh + mmvq.cu).

y[B, N] = x[B, K] @ dequant(W)^T with W kept packed in HBM. One kernel
template serves decode (B≤8 GEMV-ish) and prefill (B up to the tile size):
grid (b, n, k); packed fields stream HBM→VMEM via the BlockSpec pipeline;
nibbles unpack on the VPU into plane-ordered elements (see layouts.py);
per-group f32 scales expand along lanes; the scaled bf16 tiles contract on
the MXU with f32 accumulation in a scratch tile; K-quant mins fold into a
separate small f32 GEMM against per-group activation sums.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...gguf.constants import GGMLType
from .layouts import KernelWeights, prepare_x

F32 = jnp.float32
BF16 = jnp.bfloat16


import os as _os

# Perf-ablation knob (diagnosis only — results are numerically WRONG):
#   const → per-group scales replaced by 1.0 after the DMA (isolates the
#           VPU lane-expand cost of misaligned-G repeats from the s DMA)
#   splat → one-lane broadcast instead of the mod-G repeat (keeps the
#           per-element multiply, drops the repeat)
_ABLATE_SCALE = _os.environ.get("LLAMA_TPU_ABLATE_SCALE", "")


def _expand_raw(s, factor: int):
    if _interpret_mode():
        return jnp.concatenate([s] * factor, axis=-1)
    return pltpu.repeat(s, factor, 1)


def _expand(s, factor: int):
    """[TN, G] → [TN, G*factor] via lane-tile repeat: position p → s[p mod G].

    The tile-transposed layouts (layouts.py) are arranged so this IS the
    correct per-group broadcast; Mosaic lowers `pltpu.repeat` natively
    (element-order repeats/reshapes are unsupported shape casts).

    (A one-hot-MXU-dot expansion of narrow misaligned tails was tried in
    round 4 and DELETED after a measured 7% regression on 13B tg128
    (74.84 → 69.5 on chip): the selection dot serializes against the
    dequant VPU work instead of hiding under it.)"""
    if _ABLATE_SCALE == "const":
        return jnp.float32(1.0)
    if _ABLATE_SCALE == "splat":
        return s[:, :1] + jnp.zeros((1, s.shape[-1] * factor), s.dtype)
    return _expand_raw(s, factor)


def _unpack_bits(packed):
    """[TN, P/8] → [TN, P] of 0/1 int32; bit r of byte b is position
    r*(P/8)+b (see layouts._pack_bits_transposed)."""
    rep = _expand_raw(packed, 8).astype(jnp.int32)
    pb = packed.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, rep.shape, rep.ndim - 1)
    return (rep >> (lane // pb)) & 1


import jax as _jax  # noqa: E402


def _interpret_mode() -> bool:
    return _jax.devices()[0].platform != "tpu"


def _u8f32(v):
    """uint8 → f32 via int32 (Mosaic lacks the direct cast)."""
    return v.astype(jnp.int32).astype(F32)


def _dot_xt_w(x, w):
    """x [TB, TK] · w [TN, TK] → [TB, TN] (contract K, f32 accum)."""
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=F32
    )


# -- kernel bodies (one per kind family) -------------------------------------


# Affine offsets (block mins / integer biases) are folded OUT of the
# per-element path into small GEMMs against per-group activation sums
# (role of the q8_1 `s` sums in the reference's MMQ vec_dot,
# ggml/src/ggml-cuda/vecdotq.cuh): Σ (q·s − m)·x = Σ q·s·x − Σ_g m_g·xsum_g.
# This removes 1-2 VPU ops and up to two lane-expands per element — the
# kernels are VPU-bound, not DMA-bound, so this is the hot-path win.


from .layouts import split_g as _split_g


def _pieces1(x, qs, s):
    """Split-G pieces of a single-plane field (q8_0): yields
    (x_piece, qs_piece, s_piece) — one triple when the layout is
    contiguous, two ([:G1] aligned + misaligned tail) under the split-G
    ordering (layouts.split_g). Slice offsets are all 128-lane multiples."""
    g = s.shape[-1]
    fac = qs.shape[-1] // g
    g1 = _split_g(g)
    if not g1:
        yield x, qs, s
        return
    off = soff = 0
    for gp in (g1, g - g1):
        w = fac * gp
        yield x[:, off:off + w], qs[:, off:off + w], s[:, soff:soff + gp]
        off += w
        soff += gp


def _pieces2(x2, qs, s, *extras):
    """Split-G pieces of the interleaved 2-plane nibble field: yields
    (x_lo, x_hi, qs_piece, s_piece, *extra_pieces). Piece layout per tile
    is [lo|hi of G1 groups | lo|hi of G2 groups] (layouts split ordering);
    `extras` are further per-group fields sliced like s (q4_1's m)."""
    g = s.shape[-1]
    g1 = _split_g(g)
    if not g1:
        tp = x2.shape[-1] // 2
        yield (x2[:, :tp], x2[:, tp:], qs, s,
               *extras)
        return
    xoff = qoff = soff = 0
    for gp in (g1, g - g1):
        w = 16 * gp
        yield (x2[:, xoff:xoff + w], x2[:, xoff + w:xoff + 2 * w],
               qs[:, qoff:qoff + w], s[:, soff:soff + gp],
               *(e[:, soff:soff + gp] for e in extras))
        xoff += 2 * w
        qoff += w
        soff += gp


def _xsum_groups(x_lo, x_hi, g: int):
    """Per-32-group activation sums [TB, G] computed IN-KERNEL from the
    tile-transposed bf16 planes (replaces the per-call XLA "xs" operand:
    its reduce+transpose+pad fusions and DMA were ~0.2-0.4 ms/step of pure
    glue at 129-161 qmm calls per decode step). Group g's members sit at
    lanes e·G+g — width-G slices at e·G offsets are lane-aligned when
    G % 128 == 0; the split-G tail (G < 128·2) uses a one-hot MXU dot
    instead (misaligned-offset lane slices would relayout per term)."""
    fac = x_lo.shape[-1] // g
    if g % 128 == 0:
        tot = None
        for e in range(fac):
            part = (x_lo[:, e * g:(e + 1) * g].astype(F32)
                    + x_hi[:, e * g:(e + 1) * g].astype(F32))
            tot = part if tot is None else tot + part
        return tot
    # one-hot gather matrix M[e·G+g, g'] = (g == g'): xs = (xlo+xhi) @ M
    rows = fac * g
    ri = jax.lax.broadcasted_iota(jnp.int32, (rows, g), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (rows, g), 1)
    m = (ri % g == ci).astype(F32)
    xb = x_lo.astype(F32) + x_hi.astype(F32)
    return jax.lax.dot_general(
        xb, m, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=F32)


def _body_q8_0(acc, x, qs, s):
    # group size derives from the field shapes (32, or 16 for exact-IQ
    # repacks whose native scales are per-16)
    fac = qs.shape[-1] // s.shape[-1]
    for xp, qp, sp in _pieces1(x, qs, s):
        w = (qp.astype(jnp.int32).astype(F32) * _expand(sp, fac)).astype(BF16)
        acc[...] += _dot_xt_w(xp, w)


def _nibbles_i32(qs):
    # u8 zero-extends into i32, so the high nibble needs no mask
    q = qs.astype(jnp.int32)
    return q & 0x0F, q >> 4


def _planes2(x2):
    """Split the interleaved 2-plane activation field back out (the slice
    boundary is tile_k/2, lane-aligned for every emitted tile_k)."""
    tp = x2.shape[-1] // 2
    return x2[:, :tp], x2[:, tp:]


def _q4_tile_dot(x2, qs, s, m=None):
    """One q4_0/q4_1 dequant-dot tile as a VALUE [TB, TN] f32 (shared by
    the grid-accumulating bodies and the fused-attention kernel's
    qkv phase, ops/pallas/attn_fused.py)."""
    out = None
    pieces = _pieces2(x2, qs, s) if m is None else _pieces2(x2, qs, s, m)
    for piece in pieces:
        if m is None:
            x_lo, x_hi, qp, sp = piece
        else:
            x_lo, x_hi, qp, sp, mp = piece
        sf = _expand(sp, qp.shape[-1] // sp.shape[-1])
        lo, hi = _nibbles_i32(qp)
        w_lo = (lo.astype(F32) * sf).astype(BF16)
        w_hi = (hi.astype(F32) * sf).astype(BF16)
        part = _dot_xt_w(x_lo, w_lo) + _dot_xt_w(x_hi, w_hi)
        xs = _xsum_groups(x_lo, x_hi, sp.shape[-1])
        if m is None:
            part -= 8.0 * _dot_xt_w(xs, sp)
        else:
            part += _dot_xt_w(xs, mp)
        out = part if out is None else out + part
    return out


def _body_q4_0(acc, x2, qs, s):
    acc[...] += _q4_tile_dot(x2, qs, s)


def _body_q4_1(acc, x2, qs, s, m):
    acc[...] += _q4_tile_dot(x2, qs, s, m)


def _body_q5_0(acc, x2, xs, qs, s, hlo, hhi):
    x_lo, x_hi = _planes2(x2)
    sf = _expand(s, 16)
    lo, hi = _nibbles_i32(qs)
    blo = _unpack_bits(hlo)
    bhi = _unpack_bits(hhi)
    w_lo = ((lo + blo * 16).astype(F32) * sf).astype(BF16)
    w_hi = ((hi + bhi * 16).astype(F32) * sf).astype(BF16)
    acc[...] += _dot_xt_w(x_lo, w_lo) + _dot_xt_w(x_hi, w_hi)
    acc[...] -= 16.0 * _dot_xt_w(xs, s)


def _body_q5_1(acc, x2, xs, qs, s, hlo, hhi, m):
    x_lo, x_hi = _planes2(x2)
    sf = _expand(s, 16)
    lo, hi = _nibbles_i32(qs)
    blo = _unpack_bits(hlo)
    bhi = _unpack_bits(hhi)
    w_lo = ((lo + blo * 16).astype(F32) * sf).astype(BF16)
    w_hi = ((hi + bhi * 16).astype(F32) * sf).astype(BF16)
    acc[...] += _dot_xt_w(x_lo, w_lo) + _dot_xt_w(x_hi, w_hi)
    acc[...] += _dot_xt_w(xs, m)


# kvalues_iq4nl (ggml/src/ggml-common.h): the 16-entry nonlinear codebook
# shared by IQ4_NL and IQ4_XS. Applied as a select chain — the kernels are
# DMA-latency-bound (see CLAUDE.md ablation), so the extra VPU compares are
# hidden behind the page DMAs.
_IQ4_VALUES = (-127.0, -104.0, -83.0, -65.0, -49.0, -35.0, -22.0, -10.0,
               1.0, 13.0, 25.0, 38.0, 53.0, 69.0, 89.0, 113.0)


def _table_map(q, table):
    """int32 indices → f32 values via a static select chain (the kernels are
    DMA-bound; ≤15 extra VPU compares hide behind the page DMAs)."""
    w = jnp.full(q.shape, table[0], F32)
    for j in range(1, len(table)):
        w = jnp.where(q == j, table[j], w)
    return w


def _iq4_map(q):
    return _table_map(q, _IQ4_VALUES)


def _body_iq4(acc, x2, qs, s):
    for x_lo, x_hi, qp, sp in _pieces2(x2, qs, s):
        sf = _expand(sp, qp.shape[-1] // sp.shape[-1])
        lo, hi = _nibbles_i32(qp)
        w_lo = (_iq4_map(lo) * sf).astype(BF16)
        w_hi = (_iq4_map(hi) * sf).astype(BF16)
        acc[...] += _dot_xt_w(x_lo, w_lo) + _dot_xt_w(x_hi, w_hi)


def _body_tab32(table, acc, x2, qs, s):
    """Table carrier, per-32 scales (IQ2_XXS/IQ3_XXS/IQ3_S/IQ1_S/TQ*):
    w = s_group · table[nibble]; same geometry as _body_iq4."""
    for x_lo, x_hi, qp, sp in _pieces2(x2, qs, s):
        sf = _expand(sp, qp.shape[-1] // sp.shape[-1])
        lo, hi = _nibbles_i32(qp)
        acc[...] += _dot_xt_w(x_lo, (_table_map(lo, table) * sf).astype(BF16))
        acc[...] += _dot_xt_w(x_hi, (_table_map(hi, table) * sf).astype(BF16))


def _body_tab16(table, acc, x2, qs, s2):
    """Table carrier, per-16 scales (IQ2_XS/IQ2_S/IQ1_M): s2 lanes are the
    [lo-half | hi-half] per-32-block scales (each expands ×16 over its
    plane, like _body_tab32's s)."""
    x_lo, x_hi = _planes2(x2)
    half = s2.shape[-1] // 2
    lo, hi = _nibbles_i32(qs)
    w_lo = (_table_map(lo, table) * _expand(s2[:, :half], 16)).astype(BF16)
    w_hi = (_table_map(hi, table) * _expand(s2[:, half:], 16)).astype(BF16)
    acc[...] += _dot_xt_w(x_lo, w_lo) + _dot_xt_w(x_hi, w_hi)


def _split4(sc4):
    gt = sc4.shape[-1] // 4
    return sc4[:, :gt], sc4[:, gt : 2 * gt], sc4[:, 2 * gt : 3 * gt], sc4[:, 3 * gt :]


def _body_q4_K(acc, x2, xs2, qs, sc4):
    x_lo, x_hi = _planes2(x2)
    slo, shi, _, _ = _split4(sc4)
    lo, hi = _nibbles_i32(qs)
    # bf16 contraction like q5_K: the 4-bit q × 6-bit scale product fits
    # bf16's mantissa budget at reference NMSE tolerance (backend-ops gate);
    # halves the VMEM dequant temporaries and runs the MXU at bf16 rate.
    # expand factor derives from the shapes (32, or 32/n_sub on the sub-K
    # chunked path that slices qs along plane positions)
    f = qs.shape[-1] // slo.shape[-1]
    w_lo = (lo.astype(F32) * _expand(slo, f)).astype(BF16)
    w_hi = (hi.astype(F32) * _expand(shi, f)).astype(BF16)
    acc[...] += _dot_xt_w(x_lo, w_lo) + _dot_xt_w(x_hi, w_hi)
    # xs2 lanes = [lo-group sums | hi-group sums] = sc4's [mlo|mhi] order:
    # both min folds collapse into ONE GEMM against the scale block's tail
    acc[...] -= _dot_xt_w(xs2, sc4[:, sc4.shape[-1] // 2:])


def _body_q5_K(acc, x2, xs2, qs, sc4, hlo, hhi):
    x_lo, x_hi = _planes2(x2)
    slo, shi, _, _ = _split4(sc4)
    blo = _unpack_bits(hlo)
    bhi = _unpack_bits(hhi)
    lo, hi = _nibbles_i32(qs)
    w_lo = ((lo + blo * 16).astype(F32) * _expand(slo, 32)).astype(BF16)
    w_hi = ((hi + bhi * 16).astype(F32) * _expand(shi, 32)).astype(BF16)
    acc[...] += _dot_xt_w(x_lo, w_lo) + _dot_xt_w(x_hi, w_hi)
    acc[...] -= _dot_xt_w(xs2, sc4[:, sc4.shape[-1] // 2:])


def _planes4(x4):
    tp = x4.shape[-1] // 4
    return tuple(x4[:, i * tp:(i + 1) * tp] for i in range(4))


def _body_q6_K(acc, x4c, xs4, a, b, h4, sc4):
    x1, x2, x3, x4 = _planes4(x4c)
    s1, s2, s3, s4 = _split4(sc4)
    f = a.shape[-1] // s1.shape[-1]
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    h = h4.astype(jnp.int32)
    q1 = (a & 0x0F) | ((h & 3) << 4)
    q2 = (b & 0x0F) | (((h >> 2) & 3) << 4)
    q3 = ((a >> 4) & 0x0F) | (((h >> 4) & 3) << 4)
    q4 = ((b >> 4) & 0x0F) | (((h >> 6) & 3) << 4)
    acc[...] += _dot_xt_w(x1, (q1.astype(F32) * _expand(s1, f)).astype(BF16))
    acc[...] += _dot_xt_w(x2, (q2.astype(F32) * _expand(s2, f)).astype(BF16))
    acc[...] += _dot_xt_w(x3, (q3.astype(F32) * _expand(s3, f)).astype(BF16))
    acc[...] += _dot_xt_w(x4, (q4.astype(F32) * _expand(s4, f)).astype(BF16))
    # xs4 lanes follow sc4's plane concat: one fused fold GEMM
    acc[...] -= 32.0 * _dot_xt_w(xs4, sc4)


def _body_q2_K(acc, x4c, xs4, qs, sc4, mn4):
    s1, s2, s3, s4 = _split4(sc4)
    f = qs.shape[-1] // s1.shape[-1]
    q = qs.astype(jnp.int32)
    for p, (x, s) in enumerate(zip(_planes4(x4c), (s1, s2, s3, s4))):
        qp = (q >> (2 * p)) & 3
        acc[...] += _dot_xt_w(x, (qp.astype(F32) * _expand(s, f)).astype(BF16))
    acc[...] -= _dot_xt_w(xs4, mn4)


def _body_q3_K(acc, x4c, xs4, qs, h1, h2, h3, h4, sc4):
    s1, s2, s3, s4 = _split4(sc4)
    q = qs.astype(jnp.int32)
    for p, (x, hp, s) in enumerate(
        zip(_planes4(x4c), (h1, h2, h3, h4), (s1, s2, s3, s4))
    ):
        qp = ((q >> (2 * p)) & 3) + 4 * _unpack_bits(hp)
        acc[...] += _dot_xt_w(x, (qp.astype(F32) * _expand(s, 16)).astype(BF16))
    acc[...] -= 4.0 * _dot_xt_w(xs4, sc4)


from ..qtensor import IQ_TABLES

# g=16 table-carrier kinds carry the "s2" split-scale field (per-16 native
# scales); the rest of IQ_TABLES are per-32 ("s")
from .layouts import TAB16_KINDS as _TAB16_KINDS  # noqa: E402

_BODIES = {
    **{kind: functools.partial(
        _body_tab16 if kind in _TAB16_KINDS else _body_tab32,
        tuple(float(v) for v in table))
       for kind, table in IQ_TABLES.items()},
    GGMLType.Q8_0: _body_q8_0,
    GGMLType.Q4_0: _body_q4_0,
    GGMLType.Q4_1: _body_q4_1,
    GGMLType.Q5_0: _body_q5_0,
    GGMLType.Q5_1: _body_q5_1,
    GGMLType.Q4_K: _body_q4_K,
    GGMLType.Q5_K: _body_q5_K,
    GGMLType.Q6_K: _body_q6_K,
    GGMLType.Q2_K: _body_q2_K,
    GGMLType.Q3_K: _body_q3_K,
    GGMLType.IQ4_NL: _body_iq4,
    GGMLType.IQ4_XS: _body_iq4,
}

# per-kind (x-input specs, weight-field order); "xs*" fields are per-group
# activation sums shipped as k-tiled 3-D arrays [nk, B, gt]; plane fields
# ("x2"/"x4") interleave all planes per k-tile into one full-K operand
_X_FIELDS = {
    **{kind: ("x2",) for kind in IQ_TABLES},
    GGMLType.Q8_0: ("x",),
    # q4_0/q4_1 compute their group sums IN-KERNEL (_xsum_groups); only
    # the bit-plane kinds still ship the "xs" operand
    GGMLType.Q4_0: ("x2",),
    GGMLType.Q4_1: ("x2",),
    GGMLType.Q5_0: ("x2", "xs"),
    GGMLType.Q5_1: ("x2", "xs"),
    GGMLType.Q4_K: ("x2", "xs2"),
    GGMLType.Q5_K: ("x2", "xs2"),
    GGMLType.Q6_K: ("x4", "xs4"),
    GGMLType.Q2_K: ("x4", "xs4"),
    GGMLType.Q3_K: ("x4", "xs4"),
    GGMLType.IQ4_NL: ("x2",),
    GGMLType.IQ4_XS: ("x2",),
}
_W_FIELDS = {
    **{kind: ("qs", "s2" if kind in _TAB16_KINDS else "s")
       for kind in IQ_TABLES},
    GGMLType.Q8_0: ("qs", "s"),
    GGMLType.Q4_0: ("qs", "s"),
    GGMLType.Q4_1: ("qs", "s", "m"),
    GGMLType.Q5_0: ("qs", "s", "hlo", "hhi"),
    GGMLType.Q5_1: ("qs", "s", "hlo", "hhi", "m"),
    GGMLType.Q4_K: ("qs", "sc4"),
    GGMLType.Q5_K: ("qs", "sc4", "hlo", "hhi"),
    GGMLType.Q6_K: ("qla", "qlb", "qh4", "sc4"),
    GGMLType.Q2_K: ("qs", "sc4", "mn4"),
    GGMLType.Q3_K: ("qs", "h1", "h2", "h3", "h4", "sc4"),
    GGMLType.IQ4_NL: ("qs", "s"),
    GGMLType.IQ4_XS: ("qs", "s"),
}
# divisor of K for each x field's last dim (interleaved plane fields span
# the full tile_k)
_X_DIV = {"x": 1, "x2": 1, "x4": 1}
_N_PLANES = {"x": 1, "x2": 2, "x4": 4}

# Sub-K chunking (n_sub>1): the kernel runs the dequant+dot body n_sub
# times over lane-slices of the positional fields, shrinking the bf16
# dequant temporaries by n_sub so wide tile_n fits whole-K tiles in VMEM.
# A slice [s*ps:(s+1)*ps) of a tile-transposed plane (positions e*G+g) is
# a complete set of groups iff ps % G == 0, so the per-group scale expand
# still holds with factor ps//G (the bodies derive it from shapes). The
# affine-offset folds are linear in the activation group sums, so scaling
# xs by 1/n_sub (exact for powers of two) and folding every sub-iteration
# keeps the bodies unchanged. Bit-plane kinds (q5_0/1, q5_K, q3_K) pack 8
# positions per byte in r*(P/8)+b order — lane slices of the packed field
# are not position slices — and tab16's split-scale field complicates the
# factor, so those kinds are excluded.
_SUBK_W = {
    GGMLType.Q8_0: ("qs",),
    GGMLType.Q4_0: ("qs",),
    GGMLType.Q4_1: ("qs",),
    GGMLType.IQ4_NL: ("qs",),
    GGMLType.IQ4_XS: ("qs",),
    GGMLType.Q4_K: ("qs",),
    GGMLType.Q6_K: ("qla", "qlb", "qh4"),
    GGMLType.Q2_K: ("qs",),
    **{kind: ("qs",) for kind in IQ_TABLES if kind not in _TAB16_KINDS},
}


def _kernel(kind, nk, n_sub, *refs):
    """Generic kernel: refs = (*x_refs, *w_refs, out_ref, acc_ref)."""
    out_ref = refs[-2]
    acc = refs[-1]
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    vals = [r[0] if r.ndim == 3 else r[...] for r in refs[:-2]]
    # weight-side scale fields ship bf16 (layouts._SCALE_DTYPE) to halve
    # their HBM bytes; upcast once here so the bodies stay dtype-agnostic
    # (x-side planes are bf16 on purpose — only w-fields are touched)
    nx = len(_X_FIELDS[kind])
    vals[nx:] = [v.astype(F32) if v.dtype == BF16 else v for v in vals[nx:]]
    body = _BODIES[kind]
    if n_sub == 1:
        body(acc, *vals)
        return _kernel_tail(out_ref, acc, k_idx, nk)
    x_names = _X_FIELDS[kind]
    w_names = _W_FIELDS[kind]
    sub_w = _SUBK_W[kind]
    xv = list(vals[:nx])
    for i, name in enumerate(x_names):
        if name.startswith("xs"):
            xv[i] = xv[i] * (1.0 / n_sub)
    for s in range(n_sub):
        sv = []
        for name, v in zip(x_names, xv):
            if name.startswith("xs"):
                sv.append(v)
                continue
            planes = _N_PLANES[name]
            pl_len = v.shape[-1] // planes
            ps = pl_len // n_sub
            parts = [v[:, p * pl_len + s * ps : p * pl_len + (s + 1) * ps]
                     for p in range(planes)]
            sv.append(parts[0] if planes == 1 else jnp.concatenate(parts, -1))
        for name, v in zip(w_names, vals[nx:]):
            if name in sub_w:
                ps = v.shape[-1] // n_sub
                sv.append(v[:, s * ps:(s + 1) * ps])
            else:
                sv.append(v)
        body(acc, *sv)
    return _kernel_tail(out_ref, acc, k_idx, nk)


def _kernel_tail(out_ref, acc, k_idx, nk):
    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[...] = acc[...]


@functools.partial(
    jax.jit,
    static_argnames=("kind", "n", "k", "tile_b", "tile_n", "tile_k", "n_sub"),
)
def _qmm_call(x_fields, w_fields, *, kind, n, k, tile_b, tile_n, tile_k,
              n_sub=1):
    b = x_fields[0].shape[0]
    nb, nn, nk = b // tile_b, n // tile_n, k // tile_k
    x_names = _X_FIELDS[kind]

    in_specs = []
    for name, arr in zip(x_names, x_fields):
        if name.startswith("xs"):  # [nk, B, gt] per-group sums
            in_specs.append(
                pl.BlockSpec(
                    (1, tile_b, arr.shape[2]),
                    lambda bi, ni, ki: (ki, bi, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            div = _X_DIV[name]
            in_specs.append(
                pl.BlockSpec(
                    (tile_b, tile_k // div),
                    lambda bi, ni, ki: (bi, ki),
                    memory_space=pltpu.VMEM,
                )
            )
    for name, arr in zip(_W_FIELDS[kind], w_fields):
        if arr.ndim == 3:  # [nk, N, gt] narrow field: full-width lane blocks
            in_specs.append(
                pl.BlockSpec(
                    (1, tile_n, arr.shape[2]),
                    lambda bi, ni, ki: (ki, ni, 0),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            in_specs.append(
                pl.BlockSpec(
                    (tile_n, arr.shape[1] // nk),
                    lambda bi, ni, ki: (ni, ki),
                    memory_space=pltpu.VMEM,
                )
            )

    out_spec = pl.BlockSpec(
        (tile_b, tile_n), lambda bi, ni, ki: (bi, ni), memory_space=pltpu.VMEM
    )
    flops = 2 * b * n * k
    bytes_accessed = sum(a.size * a.dtype.itemsize for a in w_fields) + x_fields[0].nbytes

    interpret = _interpret_mode()
    y = pl.pallas_call(
        functools.partial(_kernel, kind, nk, n_sub),
        grid=(nb, nn, nk),
        interpret=interpret,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n), F32),
        scratch_shapes=[pltpu.VMEM((tile_b, tile_n), F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=int(bytes_accessed), transcendentals=0
        ),
    )(*x_fields, *w_fields)
    return y


def qmm_fused(
    x: jax.Array,  # [..., K]
    kw: KernelWeights,
    *,
    tile_b: int = 0,
    tile_n: int = 0,
    tile_k: int = 0,
) -> jax.Array:
    """Fused y = x @ dequant(W)^T. Pads B to the tile, pads/validates N, K."""
    n, k = kw.shape
    # arrays may carry zero-padded rows (layouts._maybe_pad_rows) so big
    # ragged-N weights tile wide; tile over the padded count, slice after
    n_rows = max(a.shape[0] if a.ndim == 2 else a.shape[1]
                 for a in kw.arrays.values())
    lead = x.shape[:-1]
    b_real = 1
    for d in lead:
        b_real *= d
    x2 = x.reshape(b_real, x.shape[-1])
    if x.shape[-1] < k:  # layout zero-padded K (layouts._k_pad_target)
        x2 = jnp.pad(x2, ((0, 0), (0, k - x.shape[-1])))

    # K tiling is baked into the layout's position permutation
    tile_k = kw.tile_k
    if tile_b == 0:
        tile_b = 8 if b_real <= 8 else min(256, _round_up(b_real, 8))
        if b_real < 8:
            import os

            # A/B knob: tile_b = b_real skips the per-call pad + shrinks the
            # x relayout 8x for single-stream decode (Mosaic allows sublane
            # counts < 8 when the block equals the array dim)
            want_b = int(os.environ.get("LLAMA_TPU_TILE_B", 0))
            if want_b and want_b >= b_real:
                tile_b = want_b
    if tile_n == 0:
        # 512-row n-tiles keep the DMA pipeline at HBM speed-of-light on
        # v5e (679-712 GB/s measured vs ~490 at 256); whole-K tiles
        # (tile_k ≥ 8192) clamp to 256 for VMEM (tg64 95.9→100.0 net win)
        tile_n = 512 if n_rows % 512 == 0 else _largest_tile(n_rows, 256)
        import os

        if tile_k >= 8192:
            tile_n = min(tile_n,
                         int(os.environ.get("LLAMA_TPU_TILE_N_BIG", 256)))
        else:
            # 1024-row n-tiles shave another ~1% on decode for the
            # nibble-packed kinds (qs at K/2 keeps the VMEM budget; Q6_K's
            # four byte-planes and Q8_0's full-width qs would overflow)
            nibble = kw.kind in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                                 GGMLType.Q5_1, GGMLType.Q4_K, GGMLType.Q5_K,
                                 GGMLType.IQ4_NL, GGMLType.IQ4_XS,
                                 *IQ_TABLES)
            # ≤ 5120 covers the 13B K (chip A/B: tg128 74.7 → 76.2 with
            # 1024-row tiles on the K=5120 matrices); the piece-aware
            # VMEM estimate below lets them through the budget
            default_wide = 1024 if (nibble and tile_k <= 5120) else 0
            wide = int(os.environ.get("LLAMA_TPU_TILE_N_WIDE", default_wide))
            if wide and n_rows % wide == 0:
                tile_n = wide
    # VMEM fit: prefill-sized tile_b with big k-tiles blows the 16MB scoped
    # limit (x blocks + dequant temporaries scale with tile_b/tile_n)
    if tile_b > 8:
        tile_n = min(tile_n, 256)
        cap = 32 if tile_k >= 8192 else (64 if tile_k > 4096 else 128)
        while tile_b > cap:
            tile_b //= 2

    q8_group = 32
    if kw.kind == GGMLType.Q8_0:
        s_arr = kw.arrays["s"]  # [nk, N, K/g/nk]
        q8_group = k // (s_arr.shape[0] * s_arr.shape[2])
    # permute BEFORE b-padding: the plane relayout acts on the K axis and
    # row-zero-padding commutes with it exactly, so decode (b_real=1,
    # tile_b=8) relayouts 1/8 the bytes and the group sums reduce 1/8 the
    # rows; each field pads its own batch axis afterwards
    x_fields = prepare_x(x2, kw.kind, tile_k, q8_group)
    b_pad = _round_up(b_real, tile_b)
    if b_pad != b_real:
        x_fields = tuple(
            jnp.pad(a, ((0, 0), (0, b_pad - b_real), (0, 0))) if a.ndim == 3
            else jnp.pad(a, ((0, b_pad - b_real), (0, 0)))
            for a in x_fields)
    w_fields = tuple(kw.arrays[name] for name in _W_FIELDS[kw.kind])

    # VMEM-fit estimator (16MB scoped limit): double-buffered operand
    # blocks + the bf16 dequant intermediate [tile_n, tile_k]. The static
    # heuristics above miss rare shapes — e.g. Q6_K ffn_down at K=14336
    # (Q4_K_M-requantized models put Q6_K on down-proj) needs tile_n 256,
    # not 512 (observed 20.9MB scoped alloc on v5e). Anchors: Q4_K
    # K=14336 tn=256 fits (est 12.9M), tn=512 OOMs (est 24.8M).
    nk_est = max(k // tile_k, 1)

    def _scoped_bytes(tn: int, tb: int, ns: int = 1) -> int:
        wb = sum(
            tn * a.shape[2] * a.dtype.itemsize if a.ndim == 3
            else tn * (a.shape[1] // nk_est) * a.dtype.itemsize
            for a in w_fields)
        xb = sum(
            tb * a.shape[2] * a.dtype.itemsize if a.ndim == 3
            else tb * (a.shape[1] // nk_est) * a.dtype.itemsize
            for a in x_fields)
        # bf16 dequant intermediate (weight side); sub-K chunking divides
        # it. Split-G layouts dequant per PIECE, so the live temp peaks at
        # the largest piece, not the whole tile (the whole-tile estimate
        # blocked the measured-faster 1024-row tiles on 13B's K=5120).
        piece_k = tile_k
        if ns == 1:
            from .layouts import split_g

            g = tile_k // 32
            g1 = split_g(g)
            if g1:
                piece_k = g1 * 32
        temp = tn * piece_k * 2 // ns
        return 2 * (wb + xb) + temp + 2 * tn * tb * 4  # + out/acc f32

    import os as _osq

    # A/B knob: the estimator's bf16-temp term assumes one whole-tile
    # dequant intermediate; the split-G piecewise bodies may peak lower
    # (Mosaic liveness). Raising the modeled budget lets tile experiments
    # (e.g. LLAMA_TPU_TILE_N_WIDE=1024 at K=5120) reach the compiler,
    # which errors loudly on a real VMEM overflow.
    budget = int(float(_osq.environ.get("LLAMA_TPU_VMEM_BUDGET_MB", "15.5"))
                 * 2**20)

    # Sub-K chunking: whole-K big-K tiles are clamped to tile_n 256 by the
    # dequant temporary; slicing the body into n_sub k-chunks shrinks the
    # temp so 512-row tiles fit (fewer, larger grid-step DMAs — the K=14336
    # down-proj ran ~525 GB/s vs the 680-712 the other kernels hit).
    # LLAMA_TPU_SUBK=1 disables (A/B), =4 forces deeper chunking.
    n_sub = 1
    if tile_k >= 8192 and tile_b <= 8 and kw.kind in _SUBK_W:
        import os

        want_ns = int(os.environ.get("LLAMA_TPU_SUBK", 2))
        want_tn = 512 if n_rows % 512 == 0 else tile_n
        planes = _N_PLANES[_X_FIELDS[kw.kind][0]]
        ps = tile_k // planes // max(want_ns, 1)
        # 4096-multiple K only: the estimator under-models Mosaic's live
        # temporaries on the sub-K body for ragged big K — K=13824 (13B
        # ffn_down) allocated 21.5M scoped vs the ~15.5M estimate and OOMed
        # the 16MB limit, while the validated shapes (12288, 16384) fit.
        # Ragged K falls back to whole-K tile_n=256 (the 8B Q4_K config).
        if (want_ns > 1 and want_tn > tile_n and ps % 128 == 0
                and tile_k % 4096 == 0
                and (tile_k // planes) % want_ns == 0
                and _scoped_bytes(want_tn, tile_b, want_ns) <= budget):
            tile_n, n_sub = want_tn, want_ns

    while tile_n > 128 and _scoped_bytes(tile_n, tile_b, n_sub) > budget:
        tile_n //= 2
    while tile_b > 8 and _scoped_bytes(tile_n, tile_b, n_sub) > budget:
        tile_b //= 2  # b_pad stays valid: halving keeps it a multiple

    y = _qmm_call(
        x_fields, w_fields, kind=kw.kind, n=n_rows, k=k,
        tile_b=tile_b, tile_n=tile_n, tile_k=tile_k, n_sub=n_sub,
    )
    return y[:b_real, :n].reshape(*lead, n)


_KQ = {GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K}

SUPPORTED_KINDS = frozenset(_BODIES)


# -- MoE selected-expert GEMV (MUL_MAT_ID role, ggml_mul_mat_id) --------------
#
# Streams ONLY the selected experts' packed bytes: scalar-prefetched expert
# ids drive the weight BlockSpec index maps (same idiom as the paged-KV
# block tables, attention.flash_decode_paged), so slot s's grid steps DMA
# expert sel[s]'s tiles straight from HBM. The dense-all-experts XLA path
# (models/llama.ffn_moe) reads E/U× more weight bytes per decode step —
# for Mixtral (E=8, U=2) this kernel cuts MoE FFN traffic 4×.


def _kernel_experts(kind, nk, *refs):
    """refs = (sel_ref, *x_refs, *w_refs, out_ref, acc_ref); slot rows are
    tile_b=1 GEMVs; weight blocks carry a leading singleton expert axis."""
    out_ref = refs[-2]
    acc = refs[-1]
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    nx = len(_X_FIELDS[kind])
    vals = []
    for r in refs[1 : 1 + nx]:
        # x fields carry singleton row axes so Mosaic's (8,128) block-dim
        # rule only ever sees (1, lanes) == array dims:
        # x* [S,1,K'] block [1,1,K'] → [1,K']; xs [S,nk,1,gt] → [1,gt]
        vals.append(r[0, 0] if r.ndim == 4 else r[0])
    for r in refs[1 + nx : -2]:
        vals.append(r[0, 0] if r.ndim == 4 else r[0])  # drop expert axis
    vals[nx:] = [v.astype(F32) if v.dtype == BF16 else v for v in vals[nx:]]
    _BODIES[kind](acc, *vals)

    @pl.when(k_idx == nk - 1)
    def _():
        out_ref[0] = acc[...]


@functools.partial(
    jax.jit, static_argnames=("kind", "n", "k", "tile_n", "tile_k")
)
def _qmm_expert_call(sel, x_fields, w_fields, *, kind, n, k, tile_n, tile_k):
    s = x_fields[0].shape[0]
    nn, nk = n // tile_n, k // tile_k
    x_names = _X_FIELDS[kind]

    # single-row (tile_b=1) blocks of 2-D arrays violate Mosaic's block-dim
    # rule (last two dims must be (8,128)-divisible or equal to the array);
    # fold the row index into a LEADING axis with singleton block dims so
    # the trailing block dims always equal the array dims
    in_specs = []
    xf = []
    for name, arr in zip(x_names, x_fields):
        if name.startswith("xs"):  # [nk, S, gt] → [S, nk, 1, gt]
            xf.append(arr.transpose(1, 0, 2)[:, :, None, :])
            in_specs.append(pl.BlockSpec(
                (1, 1, 1, arr.shape[2]),
                lambda si, ni, ki, sel_ref: (si, ki, 0, 0),
                memory_space=pltpu.VMEM,
            ))
        else:  # [S, K'] → [S, 1, K']
            xf.append(arr[:, None, :])
            in_specs.append(pl.BlockSpec(
                (1, 1, tile_k // _X_DIV[name]),
                lambda si, ni, ki, sel_ref: (si, 0, ki),
                memory_space=pltpu.VMEM,
            ))
    x_fields = tuple(xf)
    for arr in w_fields:
        if arr.ndim == 4:  # [E, nk, N, gt]
            in_specs.append(pl.BlockSpec(
                (1, 1, tile_n, arr.shape[3]),
                lambda si, ni, ki, sel_ref: (sel_ref[si], ki, ni, 0),
                memory_space=pltpu.VMEM,
            ))
        else:  # [E, N, K']
            kdiv = arr.shape[2] // nk
            in_specs.append(pl.BlockSpec(
                (1, tile_n, kdiv),
                lambda si, ni, ki, sel_ref: (sel_ref[si], ni, ki),
                memory_space=pltpu.VMEM,
            ))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s, nn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, tile_n), lambda si, ni, ki, sel_ref: (si, 0, ni)
        ),
        scratch_shapes=[pltpu.VMEM((1, tile_n), F32)],
    )
    bytes_per = sum(a.size * a.dtype.itemsize // a.shape[0] for a in w_fields)
    y = pl.pallas_call(
        functools.partial(_kernel_experts, kind, nk),
        grid_spec=grid_spec,
        interpret=_interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((s, 1, n), F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * n * k, bytes_accessed=int(s * bytes_per),
            transcendentals=0,
        ),
    )(sel.astype(jnp.int32), *x_fields, *w_fields)
    return y.reshape(s, n)


def qmm_expert_rows(x: jax.Array, kw: KernelWeights, sel: jax.Array,
                    *, tile_n: int = 0) -> jax.Array:
    """Per-row expert GEMV: y[s] = x[s] @ dequant(W[sel[s]])^T.

    x [S, K], sel [S] int32 expert ids, kw from to_kernel_layout_experts.
    Returns [S, N] f32. The caller repeats token rows per used expert."""
    n, k = kw.shape
    assert kw.n_expert and x.ndim == 2 and sel.shape == (x.shape[0],)
    tile_k = kw.tile_k
    if tile_n == 0:
        tile_n = 512 if n % 512 == 0 else _largest_tile(n, 256)
        if tile_k >= 8192:
            tile_n = min(tile_n, 256)
    q8_group = 32
    if kw.kind == GGMLType.Q8_0:
        s_arr = kw.arrays["s"]  # [E, nk, N, K/g/nk]
        q8_group = k // (s_arr.shape[1] * s_arr.shape[3])
    x_fields = prepare_x(x, kw.kind, tile_k, q8_group)
    w_fields = tuple(kw.arrays[name] for name in _W_FIELDS[kw.kind])
    return _qmm_expert_call(sel, x_fields, w_fields, kind=kw.kind, n=n, k=k,
                            tile_n=tile_n, tile_k=tile_k)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _largest_tile(total: int, want: int, mult: int = 1) -> int:
    t = min(want, total)
    while t > mult and total % t:
        t -= mult
    return max(t, mult)
