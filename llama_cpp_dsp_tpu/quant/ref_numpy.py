"""Reference (de)quantizers — vectorized numpy, numerically faithful to ggml.

Semantics mirror the scalar reference implementations in
reference ggml/src/ggml-quants.c:
- dequantize_row_*  (q4_0:31, q4_1:68, q5_0/q5_1, q8_0, q2_K, q3_K,
  q4_K:1280, q5_K, q6_K:1690, q8_K, iq4_nl:2440, iq4_xs:2455)
- quantize_row_*_ref (q8_0:194, q4_0:31, q4_1:68, q5_0, q5_1, q8_1,
  q8_K, q4_K:1208, q5_K, q6_K)
- make_qx_quants (:379), make_qkx2_quants (:480), get_scale_min_k4 (:631)

All float math is done in float32 with the same operation order as the
reference, and `nearest_int` (round-half-to-even, :372) / `roundf`
(half-away-from-zero) are matched exactly. This module is the correctness
oracle for the Pallas kernels and the loader's repack path; it is not a hot
path.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, QK_K, GGMLType

F32 = np.float32

# kvalues_iq4nl — reference ggml/src/ggml-quants.c:2434
KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    dtype=np.int8,
)

GROUP_MAX_EPS = F32(1e-15)

# ---------------------------------------------------------------------------
# block dtypes (little-endian, packed — match ggml-common.h structs)
# ---------------------------------------------------------------------------

DT = {
    GGMLType.Q4_0: np.dtype([("d", "<f2"), ("qs", "u1", (16,))]),
    GGMLType.Q4_1: np.dtype([("d", "<f2"), ("m", "<f2"), ("qs", "u1", (16,))]),
    GGMLType.Q5_0: np.dtype([("d", "<f2"), ("qh", "<u4"), ("qs", "u1", (16,))]),
    GGMLType.Q5_1: np.dtype([("d", "<f2"), ("m", "<f2"), ("qh", "<u4"), ("qs", "u1", (16,))]),
    GGMLType.Q8_0: np.dtype([("d", "<f2"), ("qs", "i1", (32,))]),
    GGMLType.Q8_1: np.dtype([("d", "<f2"), ("s", "<f2"), ("qs", "i1", (32,))]),
    GGMLType.Q2_K: np.dtype(
        [("scales", "u1", (16,)), ("qs", "u1", (64,)), ("d", "<f2"), ("dmin", "<f2")]
    ),
    GGMLType.Q3_K: np.dtype(
        [("hmask", "u1", (32,)), ("qs", "u1", (64,)), ("scales", "u1", (12,)), ("d", "<f2")]
    ),
    GGMLType.Q4_K: np.dtype(
        [("d", "<f2"), ("dmin", "<f2"), ("scales", "u1", (12,)), ("qs", "u1", (128,))]
    ),
    GGMLType.Q5_K: np.dtype(
        [
            ("d", "<f2"),
            ("dmin", "<f2"),
            ("scales", "u1", (12,)),
            ("qh", "u1", (32,)),
            ("qs", "u1", (128,)),
        ]
    ),
    GGMLType.Q6_K: np.dtype(
        [("ql", "u1", (128,)), ("qh", "u1", (64,)), ("scales", "i1", (16,)), ("d", "<f2")]
    ),
    GGMLType.Q8_K: np.dtype([("d", "<f4"), ("qs", "i1", (256,)), ("bsums", "<i2", (16,))]),
    GGMLType.IQ4_NL: np.dtype([("d", "<f2"), ("qs", "u1", (16,))]),
    GGMLType.IQ4_XS: np.dtype(
        [
            ("d", "<f2"),
            ("scales_h", "<u2"),
            ("scales_l", "u1", (4,)),
            ("qs", "u1", (128,)),
        ]
    ),
    # i-quants / ternary (reference ggml/src/ggml-common.h:228-400 structs)
    GGMLType.IQ2_XXS: np.dtype([("d", "<f2"), ("qs", "<u2", (32,))]),
    GGMLType.IQ2_XS: np.dtype([("d", "<f2"), ("qs", "<u2", (32,)), ("scales", "u1", (8,))]),
    GGMLType.IQ2_S: np.dtype(
        [("d", "<f2"), ("qs", "u1", (64,)), ("qh", "u1", (8,)), ("scales", "u1", (8,))]
    ),
    GGMLType.IQ3_XXS: np.dtype([("d", "<f2"), ("qs", "u1", (96,))]),
    GGMLType.IQ3_S: np.dtype(
        [
            ("d", "<f2"),
            ("qs", "u1", (64,)),
            ("qh", "u1", (8,)),
            ("signs", "u1", (32,)),
            ("scales", "u1", (4,)),
        ]
    ),
    GGMLType.IQ1_S: np.dtype([("d", "<f2"), ("qs", "u1", (32,)), ("qh", "<u2", (8,))]),
    GGMLType.IQ1_M: np.dtype([("qs", "u1", (32,)), ("qh", "u1", (16,)), ("scales", "u1", (8,))]),
    GGMLType.TQ1_0: np.dtype([("qs", "u1", (48,)), ("qh", "u1", (4,)), ("d", "<f2")]),
    GGMLType.TQ2_0: np.dtype([("qs", "u1", (64,)), ("d", "<f2")]),
}


def _blocks(raw: np.ndarray, t: GGMLType) -> np.ndarray:
    """View raw uint8 data as an array of block records."""
    dt = DT[t]
    tr = GGML_TYPE_TRAITS[t]
    assert dt.itemsize == tr.type_size, (t, dt.itemsize, tr.type_size)
    raw = np.ascontiguousarray(raw).reshape(-1).view(np.uint8)
    assert raw.nbytes % dt.itemsize == 0
    return raw.view(dt)


def nearest_int(x: np.ndarray) -> np.ndarray:
    """ggml nearest_int — round half to even (ggml-quants.c:372)."""
    return np.rint(x).astype(np.int32)


def roundf(x: np.ndarray) -> np.ndarray:
    """C roundf — round half away from zero."""
    return np.trunc(x + np.copysign(F32(0.5), x)).astype(np.int32)


def _seqsum(t: np.ndarray) -> np.ndarray:
    """Strict left-to-right f32 accumulation along the LAST axis.

    The reference accumulates `sumlx += w*x[i]*l` sequentially in f32
    (ggml-quants.c make_qx_quants/make_qkx2_quants); numpy's pairwise-sum
    rounds differently in the last ulp, which flips the knife-edge
    `sumlx*sumlx > best*suml2` comparisons in the scale search and changes
    packed bytes. Emulate the C order exactly (vectorized across groups)."""
    t = np.asarray(t, dtype=np.float32)
    acc = t[..., 0].copy()
    for i in range(1, t.shape[-1]):
        acc += t[..., i]
    return acc


def _f32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


# ---------------------------------------------------------------------------
# dequantization
# ---------------------------------------------------------------------------


def dequant_q4_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_0)
    d = _f32(b["d"])[:, None]
    qs = b["qs"]
    q = np.concatenate([qs & 0x0F, qs >> 4], axis=1).astype(np.int32) - 8
    return (q.astype(F32) * d).reshape(-1)


def dequant_q4_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_1)
    d = _f32(b["d"])[:, None]
    m = _f32(b["m"])[:, None]
    qs = b["qs"]
    q = np.concatenate([qs & 0x0F, qs >> 4], axis=1).astype(F32)
    return (q * d + m).reshape(-1)


def _q5_high_bits(qh: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """qh: [nb] uint32 → (xh_0[nb,16], xh_1[nb,16]) each 0 or 16."""
    j = np.arange(16, dtype=np.uint32)
    qh = qh[:, None]
    xh_0 = ((qh >> j) << 4) & 0x10
    xh_1 = (qh >> (j + 12)) & 0x10
    return xh_0.astype(np.int32), xh_1.astype(np.int32)


def dequant_q5_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_0)
    d = _f32(b["d"])[:, None]
    xh_0, xh_1 = _q5_high_bits(b["qh"])
    qs = b["qs"].astype(np.int32)
    x0 = ((qs & 0x0F) | xh_0) - 16
    x1 = ((qs >> 4) | xh_1) - 16
    return (np.concatenate([x0, x1], axis=1).astype(F32) * d).reshape(-1)


def dequant_q5_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_1)
    d = _f32(b["d"])[:, None]
    m = _f32(b["m"])[:, None]
    xh_0, xh_1 = _q5_high_bits(b["qh"])
    qs = b["qs"].astype(np.int32)
    x0 = (qs & 0x0F) | xh_0
    x1 = (qs >> 4) | xh_1
    return (np.concatenate([x0, x1], axis=1).astype(F32) * d + m).reshape(-1)


def dequant_q8_0(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q8_0)
    return (b["qs"].astype(F32) * _f32(b["d"])[:, None]).reshape(-1)


def dequant_q8_1(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q8_1)
    return (b["qs"].astype(F32) * _f32(b["d"])[:, None]).reshape(-1)


def dequant_q8_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q8_K)
    return (b["qs"].astype(F32) * _f32(b["d"])[:, None]).reshape(-1)


def unpack_scale_min_k4(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Unpack 12-byte 6-bit scale/min pairs → (sc[nb,8], m[nb,8]) uint8.

    get_scale_min_k4, reference ggml-quants.c:631.
    """
    q = scales.astype(np.uint8)
    sc = np.empty(q.shape[:-1] + (8,), dtype=np.uint8)
    m = np.empty_like(sc)
    sc[..., :4] = q[..., 0:4] & 63
    m[..., :4] = q[..., 4:8] & 63
    sc[..., 4:] = (q[..., 8:12] & 0x0F) | ((q[..., 0:4] >> 6) << 4)
    m[..., 4:] = (q[..., 8:12] >> 4) | ((q[..., 4:8] >> 6) << 4)
    return sc, m


def dequant_q4_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_K)
    nb = len(b)
    d = _f32(b["d"])
    dmin = _f32(b["dmin"])
    sc, mi = unpack_scale_min_k4(b["scales"])  # [nb,8]
    dl = d[:, None] * sc.astype(F32)  # effective scale per 32-group
    ml = dmin[:, None] * mi.astype(F32)
    qs = b["qs"].reshape(nb, 4, 32)  # 4 chunks of 64 elements
    lo = (qs & 0x0F).astype(F32)  # group 2j
    hi = (qs >> 4).astype(F32)  # group 2j+1
    q = np.stack([lo, hi], axis=2).reshape(nb, 8, 32)
    y = q * dl[:, :, None] - ml[:, :, None]
    return y.reshape(-1)


def dequant_q5_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_K)
    nb = len(b)
    d = _f32(b["d"])
    dmin = _f32(b["dmin"])
    sc, mi = unpack_scale_min_k4(b["scales"])
    dl = d[:, None] * sc.astype(F32)
    ml = dmin[:, None] * mi.astype(F32)
    qs = b["qs"].reshape(nb, 4, 32)
    qh = b["qh"].reshape(nb, 1, 32)
    g = np.arange(8, dtype=np.uint8)  # group index: bit g of qh
    hbit = ((qh >> g[None, :, None]) & 1).astype(np.int32) * 16  # [nb,8,32]
    lo = (qs & 0x0F).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    q = np.stack([lo, hi], axis=2).reshape(nb, 8, 32) + hbit
    y = q.astype(F32) * dl[:, :, None] - ml[:, :, None]
    return y.reshape(-1)


def dequant_q6_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q6_K)
    nb = len(b)
    d = _f32(b["d"])[:, None, None, None]
    ql = b["ql"].reshape(nb, 2, 64)  # per 128-half: 64 low-nibble bytes
    qh = b["qh"].reshape(nb, 2, 32)
    sc = b["scales"].reshape(nb, 2, 8).astype(F32)  # 8 16-groups per half

    l = ql[:, :, :32].astype(np.int32)  # bytes l+0
    h = ql[:, :, 32:].astype(np.int32)  # bytes l+32
    hb = qh.astype(np.int32)
    q1 = ((l & 0x0F) | (((hb >> 0) & 3) << 4)) - 32  # elems 0..31 of half
    q2 = ((h & 0x0F) | (((hb >> 2) & 3) << 4)) - 32  # elems 32..63
    q3 = ((l >> 4) | (((hb >> 4) & 3) << 4)) - 32  # elems 64..95
    q4 = ((h >> 4) | (((hb >> 6) & 3) << 4)) - 32  # elems 96..127
    q = np.concatenate([q1, q2, q3, q4], axis=2).reshape(nb, 2, 8, 16)
    y = q.astype(F32) * sc[:, :, :, None] * d
    return y.reshape(-1)


def dequant_q2_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q2_K)
    nb = len(b)
    d = _f32(b["d"])
    dmin = _f32(b["dmin"])
    scales = b["scales"]  # [nb,16] — 16 groups of 16
    dl = d[:, None] * (scales & 0x0F).astype(F32)
    ml = dmin[:, None] * (scales >> 4).astype(F32)
    qs = b["qs"].reshape(nb, 2, 32)  # two 128-halves, 32 bytes each
    shifts = np.arange(4, dtype=np.uint8) * 2
    q = (qs[:, :, None, :] >> shifts[None, None, :, None]) & 3  # [nb,2,4,32]
    q = q.reshape(nb, 16, 16).astype(F32)  # group g covers elems 16g..16g+15
    y = q * dl[:, :, None] - ml[:, :, None]
    return y.reshape(-1)


def unpack_q3_K_scales(scales: np.ndarray) -> np.ndarray:
    """12 packed bytes → 16 signed 6-bit scales (biased by -32).

    Mirrors the kmask bit shuffle in dequantize_row_q3_K.
    """
    a = np.ascontiguousarray(scales).view("<u4").reshape(-1, 3)
    kmask1, kmask2 = np.uint32(0x03030303), np.uint32(0x0F0F0F0F)
    tmp = a[:, 2]
    out = np.empty((len(a), 4), dtype=np.uint32)
    out[:, 0] = (a[:, 0] & kmask2) | (((tmp >> 0) & kmask1) << 4)
    out[:, 1] = (a[:, 1] & kmask2) | (((tmp >> 2) & kmask1) << 4)
    out[:, 2] = ((a[:, 0] >> 4) & kmask2) | (((tmp >> 4) & kmask1) << 4)
    out[:, 3] = ((a[:, 1] >> 4) & kmask2) | (((tmp >> 6) & kmask1) << 4)
    return out.view(np.int8).astype(np.int32) - 32  # [nb,16]


def dequant_q3_K(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q3_K)
    nb = len(b)
    d = _f32(b["d"])
    sc = unpack_q3_K_scales(b["scales"]).astype(F32)  # [nb,16]
    dl = d[:, None] * sc
    qs = b["qs"].reshape(nb, 2, 32)
    shifts = np.arange(4, dtype=np.uint8) * 2
    q = ((qs[:, :, None, :] >> shifts[None, None, :, None]) & 3).astype(np.int32)
    q = q.reshape(nb, 16, 16)
    hm = b["hmask"]  # [nb,32]; bit m for group (half*4+j), byte l or l+16
    mbit = np.arange(8, dtype=np.uint8)  # m = 1<<(half*4 + j… ) — see below
    # hmask bit index: within the whole super-block, group pair (n,j) uses
    # bit (n*4+j) of hmask bytes [l] (first 16) and [l+16] (second 16).
    hmask_bits = ((hm[:, None, :] >> mbit[None, :, None]) & 1).astype(np.int32)  # [nb,8,32]
    # reorder to group layout: groups g=0..15; g = half*8 + pair*2 + sub
    # bit index b = half*4 + pair ; byte = sub*16 + l
    hmask_groups = np.empty((nb, 16, 16), dtype=np.int32)
    for half in range(2):
        for pair in range(4):
            bit = half * 4 + pair
            g = half * 8 + pair * 2
            hmask_groups[:, g, :] = hmask_bits[:, bit, :16]
            hmask_groups[:, g + 1, :] = hmask_bits[:, bit, 16:]
    q = q - np.where(hmask_groups != 0, 0, 4)
    return (q.astype(F32) * dl[:, :, None]).reshape(-1)


def dequant_iq4_nl(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.IQ4_NL)
    d = _f32(b["d"])[:, None]
    qs = b["qs"]
    q = np.concatenate(
        [KVALUES_IQ4NL[qs & 0x0F], KVALUES_IQ4NL[qs >> 4]], axis=1
    ).astype(F32)
    return (q * d).reshape(-1)


def dequant_iq4_xs(raw: np.ndarray) -> np.ndarray:
    b = _blocks(raw, GGMLType.IQ4_XS)
    nb = len(b)
    d = _f32(b["d"])
    ib = np.arange(8)
    ls_l = (b["scales_l"][:, ib // 2] >> (4 * (ib % 2))[None, :]) & 0x0F
    ls_h = (b["scales_h"][:, None] >> (2 * ib)[None, :]) & 3
    ls = (ls_l | (ls_h << 4)).astype(np.int32) - 32
    dl = d[:, None] * ls.astype(F32)  # [nb,8]
    qs = b["qs"].reshape(nb, 8, 16)
    q = np.concatenate(
        [KVALUES_IQ4NL[qs & 0x0F], KVALUES_IQ4NL[qs >> 4]], axis=2
    ).astype(F32)  # [nb,8,32]
    return (q * dl[:, :, None]).reshape(-1)


def _u8cols(u32: np.ndarray) -> np.ndarray:
    """uint32 [...,] → its 4 little-endian bytes [..., 4]."""
    return ((u32[..., None] >> (8 * np.arange(4, dtype=np.uint32))) & 0xFF).astype(np.uint16)


def dequant_iq2_xxs(raw: np.ndarray) -> np.ndarray:
    """2.0625 bpw codebook quant (dequantize_row_iq2_xxs, ggml-quants.c:2197)."""
    from .iq_grids import grids, sign_table

    b = _blocks(raw, GGMLType.IQ2_XXS)
    nb = len(b)
    d = _f32(b["d"])
    q32 = np.ascontiguousarray(b["qs"]).view("<u4").reshape(nb, 8, 2)
    a0, a1 = q32[..., 0], q32[..., 1]  # [nb, 8] per 32-elem group
    db = d[:, None] * (F32(0.5) + (a1 >> 28).astype(F32)) * F32(0.25)
    grid = grids()["iq2xxs_grid"][_u8cols(a0)].astype(F32)  # [nb,8,4,8]
    sidx = (a1[..., None] >> (7 * np.arange(4, dtype=np.uint32))) & 127
    signs = sign_table()[sidx]  # [nb,8,4,8]
    return (db[:, :, None, None] * grid * signs).reshape(-1)


def dequant_iq2_xs(raw: np.ndarray) -> np.ndarray:
    """2.3125 bpw (dequantize_row_iq2_xs, ggml-quants.c:2225)."""
    from .iq_grids import grids, sign_table

    b = _blocks(raw, GGMLType.IQ2_XS)
    nb = len(b)
    d = _f32(b["d"])
    q = b["qs"].reshape(nb, 8, 4)
    sc = b["scales"]
    nib = np.stack([sc & 0xF, sc >> 4], axis=-1)  # [nb,8,2]
    db = d[:, None, None] * (F32(0.5) + nib.astype(F32)) * F32(0.25)
    db4 = np.repeat(db, 2, axis=2)  # l//2 selects the nibble
    grid = grids()["iq2xs_grid"][q & 511].astype(F32)  # [nb,8,4,8]
    signs = sign_table()[q >> 9]
    return (db4[..., None] * grid * signs).reshape(-1)


def dequant_iq2_s(raw: np.ndarray) -> np.ndarray:
    """2.5625 bpw (dequantize_row_iq2_s, ggml-quants.c:2252)."""
    from .iq_grids import byte_sign_table, grids

    b = _blocks(raw, GGMLType.IQ2_S)
    nb = len(b)
    d = _f32(b["d"])
    ql = b["qs"][:, :32].reshape(nb, 8, 4).astype(np.uint16)
    sbytes = b["qs"][:, 32:].reshape(nb, 8, 4)
    qh = b["qh"].astype(np.uint16)
    high = (qh[:, :, None] >> (2 * np.arange(4))) & 3
    grid = grids()["iq2s_grid"][ql | (high << 8)].astype(F32)  # [nb,8,4,8]
    signs = byte_sign_table()[sbytes]
    sc = b["scales"]
    nib = np.stack([sc & 0xF, sc >> 4], axis=-1)
    db = d[:, None, None] * (F32(0.5) + nib.astype(F32)) * F32(0.25)
    db4 = np.repeat(db, 2, axis=2)
    return (db4[..., None] * grid * signs).reshape(-1)


def dequant_iq3_xxs(raw: np.ndarray) -> np.ndarray:
    """3.0625 bpw (dequantize_row_iq3_xxs, ggml-quants.c:2284)."""
    from .iq_grids import grids, sign_table

    b = _blocks(raw, GGMLType.IQ3_XXS)
    nb = len(b)
    d = _f32(b["d"])
    qs = b["qs"][:, :64].reshape(nb, 8, 8)  # 8 grid bytes per 32-elem group
    aux = np.ascontiguousarray(b["qs"][:, 64:]).view("<u4").reshape(nb, 8)
    db = d[:, None] * (F32(0.5) + (aux >> 28).astype(F32)) * F32(0.5)
    grid = grids()["iq3xxs_grid"][qs].astype(F32).reshape(nb, 8, 32)
    sidx = (aux[..., None] >> (7 * np.arange(4, dtype=np.uint32))) & 127
    signs = sign_table()[sidx].reshape(nb, 8, 32)
    return (db[:, :, None] * grid * signs).reshape(-1)


def dequant_iq3_s(raw: np.ndarray) -> np.ndarray:
    """3.4375 bpw (dequantize_row_iq3_s, ggml-quants.c:2316)."""
    from .iq_grids import byte_sign_table, grids

    b = _blocks(raw, GGMLType.IQ3_S)
    nb = len(b)
    d = _f32(b["d"])
    qs = b["qs"].reshape(nb, 8, 8).astype(np.uint16)
    qh = b["qh"].astype(np.uint16)
    # (qh << (8-2l)) & 256 for grid1 / (qh << (7-2l)) & 256 for grid2 is
    # exactly "bit p of qh" for byte position p = 2l (+1)
    high = ((qh[:, :, None] >> np.arange(8)) & 1) << 8
    grid = grids()["iq3s_grid"][qs | high].astype(F32).reshape(nb, 8, 32)
    signs = byte_sign_table()[b["signs"].reshape(nb, 8, 4)].reshape(nb, 8, 32)
    sc = b["scales"]
    nib = np.stack([sc & 0xF, sc >> 4], axis=-1).reshape(nb, 8)
    db = d[:, None] * (F32(1) + F32(2) * nib.astype(F32))
    return (db[:, :, None] * grid * signs).reshape(-1)


def dequant_iq1_s(raw: np.ndarray) -> np.ndarray:
    """1.5625 bpw (dequantize_row_iq1_s, ggml-quants.c:2359)."""
    from .iq_grids import IQ1S_DELTA, grids

    b = _blocks(raw, GGMLType.IQ1_S)
    nb = len(b)
    d = _f32(b["d"])
    qs = b["qs"].reshape(nb, 8, 4).astype(np.uint16)
    qh = b["qh"]  # [nb,8] uint16
    dl = d[:, None] * (2 * ((qh >> 12) & 7).astype(F32) + 1)
    delta = np.where((qh & 0x8000) != 0, -IQ1S_DELTA, IQ1S_DELTA)
    high = (qh[:, :, None].astype(np.uint32) >> (3 * np.arange(4))) & 7
    grid = grids()["iq1s_grid"][qs | (high << 8).astype(np.uint16)].astype(F32)
    return (dl[:, :, None, None] * (grid + delta[:, :, None, None])).reshape(-1)


def dequant_iq1_m(raw: np.ndarray) -> np.ndarray:
    """1.75 bpw (dequantize_row_iq1_m, ggml-quants.c:2384). The f16 super
    scale is scattered over the top nibbles of the 4 scale words."""
    from .iq_grids import IQ1M_DELTA, grids

    b = _blocks(raw, GGMLType.IQ1_M)
    nb = len(b)
    sc = np.ascontiguousarray(b["scales"]).view("<u2").reshape(nb, 4)
    d_bits = (
        (sc[:, 0] >> 12)
        | ((sc[:, 1] >> 8) & 0x00F0)
        | ((sc[:, 2] >> 4) & 0x0F00)
        | (sc[:, 3] & 0xF000)
    ).astype(np.uint16)
    d = d_bits.view("<f2").astype(F32)
    qs = b["qs"].reshape(nb, 8, 4).astype(np.uint16)
    qh = b["qh"].reshape(nb, 8, 2).astype(np.uint16)
    # idx high 3 bits: groups 0/2 from the low nibble, 1/3 from the high
    high = np.stack(
        [qh[..., 0] & 7, (qh[..., 0] >> 4) & 7, qh[..., 1] & 7, (qh[..., 1] >> 4) & 7],
        axis=-1,
    )
    grid = grids()["iq1s_grid"][qs | (high << 8)].astype(F32)  # [nb,8,4,8]
    hb = np.stack([qh[..., 0], qh[..., 0], qh[..., 1], qh[..., 1]], axis=-1)
    mask = np.where(np.arange(4)[None, None, :] % 2 == 0, 0x08, 0x80)
    delta = np.where((hb & mask) != 0, -IQ1M_DELTA, IQ1M_DELTA)  # [nb,8,4]
    ib = np.arange(8)
    shift = 6 * (ib % 2)
    sc_ib = sc[:, ib // 2]  # [nb,8]
    dl12 = np.stack(
        [(sc_ib >> shift) & 7, (sc_ib >> (shift + 3)) & 7], axis=-1
    )  # [nb,8,2] — groups 0,1 use dl1; 2,3 use dl2
    dl = d[:, None, None] * (2 * np.repeat(dl12, 2, axis=2).astype(F32) + 1)
    return (dl[..., None] * (grid + delta[..., None])).reshape(-1)


def dequant_tq1_0(raw: np.ndarray) -> np.ndarray:
    """1.6875 bpw ternary, 5 trits per byte base-243 (dequantize_row_tq1_0,
    ggml-quants.c:2137). Trit n of byte q is extracted as
    ((uint8)(q * 3^n) * 3) >> 8 − 1."""
    b = _blocks(raw, GGMLType.TQ1_0)
    nb = len(b)
    d = _f32(b["d"])
    pow3 = np.array([1, 3, 9, 27, 81], dtype=np.uint16)

    def trits(bytes_, npow):  # [nb, M], P → [nb, P, M] in (n, m) order
        q = (bytes_[:, None, :] * pow3[None, :npow, None]).astype(np.uint8)
        return ((q.astype(np.uint16) * 3) >> 8).astype(np.int32) - 1

    y1 = trits(b["qs"][:, :32], 5).reshape(nb, 160)
    y2 = trits(b["qs"][:, 32:48], 5).reshape(nb, 80)
    y3 = trits(b["qh"], 4).reshape(nb, 16)
    y = np.concatenate([y1, y2, y3], axis=1).astype(F32)
    return (y * d[:, None]).reshape(-1)


def dequant_tq2_0(raw: np.ndarray) -> np.ndarray:
    """2.0625 bpw ternary, 4 trits per byte (dequantize_row_tq2_0,
    ggml-quants.c:2176)."""
    b = _blocks(raw, GGMLType.TQ2_0)
    nb = len(b)
    d = _f32(b["d"])
    qs = b["qs"].reshape(nb, 2, 1, 32)
    shifts = (2 * np.arange(4)).reshape(1, 1, 4, 1)
    y = ((qs >> shifts) & 3).astype(np.int32) - 1  # [nb,2,4,32] (j, l, m) order
    return (y.astype(F32) * d[:, None, None, None]).reshape(-1)


def dequant_f16(raw: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(raw).view("<f2").astype(F32)


def dequant_bf16(raw: np.ndarray) -> np.ndarray:
    u16 = np.ascontiguousarray(raw).view("<u2").astype(np.uint32) << 16
    return u16.view(np.float32)


def dequant_f32(raw: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(raw).view("<f4")


_DEQUANT = {
    GGMLType.F32: dequant_f32,
    GGMLType.F16: dequant_f16,
    GGMLType.BF16: dequant_bf16,
    GGMLType.Q4_0: dequant_q4_0,
    GGMLType.Q4_1: dequant_q4_1,
    GGMLType.Q5_0: dequant_q5_0,
    GGMLType.Q5_1: dequant_q5_1,
    GGMLType.Q8_0: dequant_q8_0,
    GGMLType.Q8_1: dequant_q8_1,
    GGMLType.Q2_K: dequant_q2_K,
    GGMLType.Q3_K: dequant_q3_K,
    GGMLType.Q4_K: dequant_q4_K,
    GGMLType.Q5_K: dequant_q5_K,
    GGMLType.Q6_K: dequant_q6_K,
    GGMLType.Q8_K: dequant_q8_K,
    GGMLType.IQ4_NL: dequant_iq4_nl,
    GGMLType.IQ4_XS: dequant_iq4_xs,
    GGMLType.IQ2_XXS: dequant_iq2_xxs,
    GGMLType.IQ2_XS: dequant_iq2_xs,
    GGMLType.IQ2_S: dequant_iq2_s,
    GGMLType.IQ3_XXS: dequant_iq3_xxs,
    GGMLType.IQ3_S: dequant_iq3_s,
    GGMLType.IQ1_S: dequant_iq1_s,
    GGMLType.IQ1_M: dequant_iq1_m,
    GGMLType.TQ1_0: dequant_tq1_0,
    GGMLType.TQ2_0: dequant_tq2_0,
}


def dequantize(raw: np.ndarray, ggml_type: GGMLType, shape: tuple[int, ...] | None = None):
    """Dequantize packed bytes → float32. shape is the row-major numpy shape."""
    fn = _DEQUANT.get(ggml_type)
    if fn is None:
        raise NotImplementedError(f"dequantize {ggml_type.name}")
    y = fn(raw)
    return y.reshape(shape) if shape is not None else y


# ---------------------------------------------------------------------------
# quantization
# ---------------------------------------------------------------------------


def quant_q8_0(x: np.ndarray) -> np.ndarray:
    x = _f32(x).reshape(-1, 32)
    amax = np.max(np.abs(x), axis=1)
    d = (amax / F32(127)).astype(F32)
    id_ = np.where(d != 0, F32(1) / np.where(d != 0, d, F32(1)), F32(0)).astype(F32)
    out = np.zeros(len(x), dtype=DT[GGMLType.Q8_0])
    out["d"] = d.astype(np.float16)
    out["qs"] = roundf(x * id_[:, None]).astype(np.int8)
    return out.view(np.uint8).reshape(-1)


def quant_q8_1(x: np.ndarray) -> np.ndarray:
    x = _f32(x).reshape(-1, 32)
    amax = np.max(np.abs(x), axis=1)
    d = (amax / F32(127)).astype(F32)
    id_ = np.where(d != 0, F32(1) / np.where(d != 0, d, F32(1)), F32(0)).astype(F32)
    qs = roundf(x * id_[:, None]).astype(np.int8)
    out = np.zeros(len(x), dtype=DT[GGMLType.Q8_1])
    out["d"] = d.astype(np.float16)
    out["s"] = (d * qs.astype(F32).sum(axis=1)).astype(np.float16)
    out["qs"] = qs
    return out.view(np.uint8).reshape(-1)


def quant_q4_0(x: np.ndarray) -> np.ndarray:
    x = _f32(x).reshape(-1, 32)
    idx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(len(x)), idx]
    d = (maxv / F32(-8)).astype(F32)
    id_ = np.where(d != 0, F32(1) / np.where(d != 0, d, F32(1)), F32(0)).astype(F32)
    xi = np.minimum(15, np.trunc(x * id_[:, None] + F32(8.5)).astype(np.int32)).astype(np.uint8)
    out = np.zeros(len(x), dtype=DT[GGMLType.Q4_0])
    out["d"] = d.astype(np.float16)
    out["qs"] = xi[:, :16] | (xi[:, 16:] << 4)
    return out.view(np.uint8).reshape(-1)


def quant_q4_1(x: np.ndarray) -> np.ndarray:
    x = _f32(x).reshape(-1, 32)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = ((mx - mn) / F32(15)).astype(F32)
    id_ = np.where(d != 0, F32(1) / np.where(d != 0, d, F32(1)), F32(0)).astype(F32)
    xi = np.minimum(
        15, np.trunc((x - mn[:, None]) * id_[:, None] + F32(0.5)).astype(np.int32)
    ).astype(np.uint8)
    out = np.zeros(len(x), dtype=DT[GGMLType.Q4_1])
    out["d"] = d.astype(np.float16)
    out["m"] = mn.astype(np.float16)
    out["qs"] = xi[:, :16] | (xi[:, 16:] << 4)
    return out.view(np.uint8).reshape(-1)


def quant_q5_0(x: np.ndarray) -> np.ndarray:
    x = _f32(x).reshape(-1, 32)
    idx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(len(x)), idx]
    d = (maxv / F32(-16)).astype(F32)
    id_ = np.where(d != 0, F32(1) / np.where(d != 0, d, F32(1)), F32(0)).astype(F32)
    xi = np.minimum(31, np.trunc(x * id_[:, None] + F32(16.5)).astype(np.int32)).astype(np.uint32)
    x0, x1 = xi[:, :16], xi[:, 16:]
    j = np.arange(16, dtype=np.uint32)
    qh = (((x0 & 0x10) >> 4) << j).sum(axis=1, dtype=np.uint64) | (
        ((x1 & 0x10) >> 4) << (j + 16)
    ).sum(axis=1, dtype=np.uint64)
    out = np.zeros(len(x), dtype=DT[GGMLType.Q5_0])
    out["d"] = d.astype(np.float16)
    out["qh"] = qh.astype(np.uint32)
    out["qs"] = ((x0 & 0x0F) | ((x1 & 0x0F) << 4)).astype(np.uint8)
    return out.view(np.uint8).reshape(-1)


def quant_q5_1(x: np.ndarray) -> np.ndarray:
    x = _f32(x).reshape(-1, 32)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = ((mx - mn) / F32(31)).astype(F32)
    id_ = np.where(d != 0, F32(1) / np.where(d != 0, d, F32(1)), F32(0)).astype(F32)
    xi = np.minimum(
        31, np.trunc((x - mn[:, None]) * id_[:, None] + F32(0.5)).astype(np.int32)
    ).astype(np.uint32)
    x0, x1 = xi[:, :16], xi[:, 16:]
    j = np.arange(16, dtype=np.uint32)
    qh = (((x0 & 0x10) >> 4) << j).sum(axis=1, dtype=np.uint64) | (
        ((x1 & 0x10) >> 4) << (j + 16)
    ).sum(axis=1, dtype=np.uint64)
    out = np.zeros(len(x), dtype=DT[GGMLType.Q5_1])
    out["d"] = d.astype(np.float16)
    out["m"] = mn.astype(np.float16)
    out["qh"] = qh.astype(np.uint32)
    out["qs"] = ((x0 & 0x0F) | ((x1 & 0x0F) << 4)).astype(np.uint8)
    return out.view(np.uint8).reshape(-1)


def quant_q8_K(x: np.ndarray) -> np.ndarray:
    x = _f32(x).reshape(-1, QK_K)
    aidx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(len(x)), aidx]
    amax = np.abs(maxv)
    nonzero = amax != 0
    iscale = np.where(nonzero, F32(-127) / np.where(nonzero, maxv, F32(1)), F32(0)).astype(F32)
    qs = np.minimum(127, nearest_int(iscale[:, None] * x)).astype(np.int8)
    qs = np.where(nonzero[:, None], qs, np.int8(0))
    out = np.zeros(len(x), dtype=DT[GGMLType.Q8_K])
    out["d"] = np.where(nonzero, F32(1) / np.where(iscale == 0, F32(1), iscale), F32(0))
    out["qs"] = qs
    out["bsums"] = qs.reshape(-1, 16, 16).astype(np.int32).sum(axis=2).astype(np.int16)
    return out.view(np.uint8).reshape(-1)


# -- K-quant helper fits (scalar-per-group, vectorized over groups) ---------


def make_qx_quants(x: np.ndarray, nmax: int, rmse_type: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized make_qx_quants (ggml-quants.c:379), qw=None.

    x: [G, n] groups. Returns (L[G, n] uint8 biased by +nmax, scale[G]).
    """
    x = _f32(x)
    G, n = x.shape
    aidx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(G), aidx]
    amax = np.abs(maxv)
    dead = amax < GROUP_MAX_EPS
    safe_max = np.where(dead, F32(1), maxv)

    assert rmse_type == 1

    def fit(iscale):
        l = np.clip(nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
        w = x * x
        lf = l.astype(F32)
        sumlx = _seqsum((w * x) * lf)
        suml2 = _seqsum((w * lf) * lf)
        return l, sumlx, suml2

    iscale0 = (F32(-nmax) / safe_max).astype(F32)
    L, sumlx, suml2 = fit(iscale0)
    scale = np.where(suml2 != 0, sumlx / np.where(suml2 == 0, F32(1), suml2), F32(0)).astype(F32)
    best = scale * sumlx
    for is_ in range(-9, 10):
        if is_ == 0:
            continue
        iscale = (-(F32(nmax) + F32(0.1) * F32(is_)) / safe_max).astype(F32)
        l, sumlx_i, suml2_i = fit(iscale)
        better = (suml2_i > 0) & (sumlx_i * sumlx_i > best * suml2_i)
        L = np.where(better[:, None], l, L)
        new_scale = np.where(
            suml2_i == 0, F32(0), sumlx_i / np.where(suml2_i == 0, F32(1), suml2_i)
        )
        scale = np.where(better, new_scale, scale).astype(F32)
        best = np.where(better, new_scale * sumlx_i, best).astype(F32)
    L = (L + nmax).astype(np.uint8)
    L = np.where(dead[:, None], np.uint8(0), L)
    scale = np.where(dead, F32(0), scale)
    return L, scale


def make_qkx2_quants(
    x: np.ndarray,
    weights: np.ndarray,
    nmax: int,
    rmin: float,
    rdelta: float,
    nstep: int,
    use_mad: bool,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized make_qkx2_quants (ggml-quants.c:480).

    x, weights: [G, n]. Returns (L[G,n] uint8, scale[G], the_min[G]).
    """
    x = _f32(x)
    w = _f32(weights)
    G, n = x.shape
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    sum_w = _seqsum(w)
    sum_x = _seqsum(w * x)
    mn = np.minimum(mn, F32(0))
    flat = mx == mn  # all-equal (and min>0 clamped) → L=0, min=-mn, scale=0

    safe_range = np.where(flat, F32(1), mx - mn)
    iscale = (F32(nmax) / safe_range).astype(F32)
    scale = (F32(1) / iscale).astype(F32)

    L = np.clip(nearest_int(iscale[:, None] * (x - mn[:, None])), 0, nmax)
    diff = scale[:, None] * L.astype(F32) + mn[:, None] - x
    diff = np.abs(diff) if use_mad else diff * diff
    best_mad = _seqsum(w * diff)

    # NOTE: the reference updates `min` whenever a candidate improves, and the
    # NEXT candidate quantizes relative to the updated min — keep that
    # sequential dependence (vectorized only across groups).
    cur_min = mn.copy()
    for is_ in range(nstep + 1):
        rng = np.where(flat, F32(1), mx - cur_min)
        isc = ((F32(rmin) + F32(rdelta) * F32(is_) + F32(nmax)) / rng).astype(F32)
        laux = np.clip(nearest_int(isc[:, None] * (x - cur_min[:, None])), 0, nmax)
        lf = laux.astype(F32)
        sum_l = _seqsum(w * lf)
        sum_l2 = _seqsum((w * lf) * lf)
        sum_xl = _seqsum((w * lf) * x)
        D = sum_w * sum_l2 - sum_l * sum_l
        Dok = D > 0
        Dsafe = np.where(Dok, D, F32(1))
        this_scale = (sum_w * sum_xl - sum_x * sum_l) / Dsafe
        this_min = (sum_l2 * sum_x - sum_l * sum_xl) / Dsafe
        pos = this_min > 0
        sum_l2_safe = np.where(sum_l2 == 0, F32(1), sum_l2)
        this_scale = np.where(pos, sum_xl / sum_l2_safe, this_scale).astype(F32)
        this_min = np.where(pos, F32(0), this_min).astype(F32)
        diff = this_scale[:, None] * lf + this_min[:, None] - x
        diff = np.abs(diff) if use_mad else diff * diff
        mad = _seqsum(w * diff)
        better = Dok & (mad < best_mad)
        L = np.where(better[:, None], laux, L)
        best_mad = np.where(better, mad, best_mad).astype(F32)
        scale = np.where(better, this_scale, scale).astype(F32)
        cur_min = np.where(better, this_min, cur_min).astype(F32)

    L = np.where(flat[:, None], 0, L).astype(np.uint8)
    scale = np.where(flat, F32(0), scale)
    the_min = np.where(flat, -mn, -cur_min).astype(F32)
    return L, scale, the_min


def _pack_k4_scales(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """Pack 8 6-bit (scale, min) pairs into 12 bytes (inverse of get_scale_min_k4)."""
    nb = len(ls)
    out = np.zeros((nb, 12), dtype=np.uint8)
    out[:, 0:4] = ls[:, :4]
    out[:, 4:8] = lm[:, :4]
    out[:, 8:12] = (ls[:, 4:] & 0x0F) | ((lm[:, 4:] & 0x0F) << 4)
    out[:, 0:4] |= (ls[:, 4:] >> 4) << 6
    out[:, 4:8] |= (lm[:, 4:] >> 4) << 6
    return out


def _qkx_weights_32(x256: np.ndarray) -> np.ndarray:
    """Per-32-group weights av_x + |x| used by q4_K/q5_K ref quantizers."""
    g = x256.reshape(-1, 8, 32)
    sum_x2 = _seqsum(g * g)
    av_x = np.sqrt(sum_x2 / F32(32)).astype(F32)
    return (av_x[:, :, None] + np.abs(g)).reshape(-1, 32)


def quant_q4_K(x: np.ndarray) -> np.ndarray:
    """quantize_row_q4_K_ref (ggml-quants.c:1208)."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    groups = x.reshape(-1, 32)  # [nb*8, 32]
    weights = _qkx_weights_32(x)
    Lq, scales, mins = make_qkx2_quants(groups, weights, 15, -1.0, 0.1, 20, False)
    Lq = Lq.reshape(nb, 8, 32)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(
        max_scale > 0, F32(63) / np.where(max_scale > 0, max_scale, F32(1)), F32(0)
    ).astype(F32)
    inv_min = np.where(
        max_min > 0, F32(63) / np.where(max_min > 0, max_min, F32(1)), F32(0)
    ).astype(F32)
    ls = np.minimum(63, nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, nearest_int(inv_min[:, None] * mins)).astype(np.uint8)
    packed_scales = _pack_k4_scales(ls, lm)
    d = (max_scale / F32(63)).astype(np.float16)
    dmin = (max_min / F32(63)).astype(np.float16)
    # re-quantize with the rounded scales, same as the reference second pass
    sc, mi = unpack_scale_min_k4(packed_scales)
    dd = _f32(d)[:, None] * sc.astype(F32)  # [nb,8]
    dm = _f32(dmin)[:, None] * mi.astype(F32)
    xg = x.reshape(nb, 8, 32)
    dd_safe = np.where(dd == 0, F32(1), dd)
    L = np.clip(nearest_int((xg + dm[:, :, None]) / dd_safe[:, :, None]), 0, 15)
    # reference keeps the first-pass L for groups whose rounded scale is 0
    L = np.where((dd == 0)[:, :, None], Lq, L).astype(np.uint8)
    Lp = L.reshape(nb, 4, 2, 32)  # pairs of 32-groups → 32 bytes
    out = np.zeros(nb, dtype=DT[GGMLType.Q4_K])
    out["d"] = d
    out["dmin"] = dmin
    out["scales"] = packed_scales
    out["qs"] = (Lp[:, :, 0, :] | (Lp[:, :, 1, :] << 4)).reshape(nb, 128)
    return out.view(np.uint8).reshape(-1)


def quant_q5_K(x: np.ndarray) -> np.ndarray:
    """quantize_row_q5_K_ref."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    groups = x.reshape(-1, 32)
    weights = _qkx_weights_32(x)
    Lq, scales, mins = make_qkx2_quants(groups, weights, 31, -0.5, 0.1, 15, False)
    Lq = Lq.reshape(nb, 8, 32)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(
        max_scale > 0, F32(63) / np.where(max_scale > 0, max_scale, F32(1)), F32(0)
    ).astype(F32)
    inv_min = np.where(
        max_min > 0, F32(63) / np.where(max_min > 0, max_min, F32(1)), F32(0)
    ).astype(F32)
    ls = np.minimum(63, nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, nearest_int(inv_min[:, None] * mins)).astype(np.uint8)
    packed_scales = _pack_k4_scales(ls, lm)
    d = (max_scale / F32(63)).astype(np.float16)
    dmin = (max_min / F32(63)).astype(np.float16)
    sc, mi = unpack_scale_min_k4(packed_scales)
    dd = _f32(d)[:, None] * sc.astype(F32)
    dm = _f32(dmin)[:, None] * mi.astype(F32)
    xg = x.reshape(nb, 8, 32)
    dd_safe = np.where(dd == 0, F32(1), dd)
    L = np.clip(nearest_int((xg + dm[:, :, None]) / dd_safe[:, :, None]), 0, 31)
    L = np.where((dd == 0)[:, :, None], Lq, L).astype(np.uint8)
    # pack: per 64-chunk n, ql[j] = (L[n,j]&15) | ((L[n,j+32]&15)<<4);
    # qh bit (2n) for L[n,j]>15, bit (2n+1) for L[n,j+32]>15
    Lp = L.reshape(nb, 4, 2, 32)
    lo = Lp & 0x0F
    hi = (Lp >> 4) & 1  # >15 flag
    out = np.zeros(nb, dtype=DT[GGMLType.Q5_K])
    out["d"] = d
    out["dmin"] = dmin
    out["scales"] = packed_scales
    out["qs"] = (lo[:, :, 0, :] | (lo[:, :, 1, :] << 4)).reshape(nb, 128)
    qh = np.zeros((nb, 32), dtype=np.uint8)
    for n in range(4):
        qh |= (hi[:, n, 0, :] << (2 * n)) | (hi[:, n, 1, :] << (2 * n + 1))
    out["qh"] = qh
    return out.view(np.uint8).reshape(-1)


def quant_q6_K(x: np.ndarray) -> np.ndarray:
    """quantize_row_q6_K_ref."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    groups = x.reshape(-1, 16)  # [nb*16, 16]
    Lq, scales = make_qx_quants(groups, 32, rmse_type=1)
    Lq = Lq.reshape(nb, 16, 16)
    scales = scales.reshape(nb, 16)
    aidx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nb), aidx]
    max_abs = np.abs(max_scale)
    dead = max_abs < GROUP_MAX_EPS
    safe_max = np.where(dead, F32(1), max_scale)
    iscale = (F32(-128) / safe_max).astype(F32)
    d = (F32(1) / iscale).astype(np.float16)
    sc8 = np.minimum(127, nearest_int(iscale[:, None] * scales)).astype(np.int8)
    dd = _f32(d)[:, None] * sc8.astype(F32)  # [nb,16]
    xg = x.reshape(nb, 16, 16)
    dd_safe = np.where(dd == 0, F32(1), dd)
    L = np.clip(nearest_int(xg / dd_safe[:, :, None]), -32, 31) + 32
    # reference keeps make_qx_quants' L (already +32-biased) when scale is 0
    L = np.where((dd == 0)[:, :, None], Lq, L).astype(np.uint8)
    # ql/qh packing per 128-half
    Lh = L.reshape(nb, 2, 128)  # halves
    q1 = Lh[:, :, 0:32]
    q2 = Lh[:, :, 32:64]
    q3 = Lh[:, :, 64:96]
    q4 = Lh[:, :, 96:128]
    ql = np.concatenate([(q1 & 0x0F) | ((q3 & 0x0F) << 4), (q2 & 0x0F) | ((q4 & 0x0F) << 4)], axis=2)
    qh = (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)
    out = np.zeros(nb, dtype=DT[GGMLType.Q6_K])
    out["ql"] = ql.reshape(nb, 128)
    out["qh"] = qh.reshape(nb, 64)
    out["scales"] = sc8
    out["d"] = d
    # dead blocks are fully zeroed in the reference
    if dead.any():
        z = np.zeros((), dtype=DT[GGMLType.Q6_K])
        out[dead] = z
    return out.view(np.uint8).reshape(-1)


def quant_q2_K(x: np.ndarray) -> np.ndarray:
    """quantize_row_q2_K_ref (ggml-quants.c:642)."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    groups = x.reshape(-1, 16)  # [nb*16, 16]
    Lq, scales, mins = make_qkx2_quants(groups, np.abs(groups), 3, -0.5, 0.1, 15, True)
    Lq = Lq.reshape(nb, 16, 16)
    scales = scales.reshape(nb, 16)
    mins = mins.reshape(nb, 16)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    q4scale = F32(15)
    isc = np.where(max_scale > 0,
                   q4scale / np.where(max_scale > 0, max_scale, F32(1)),
                   F32(0)).astype(F32)
    imn = np.where(max_min > 0,
                   q4scale / np.where(max_min > 0, max_min, F32(1)),
                   F32(0)).astype(F32)
    ls = np.where(max_scale[:, None] > 0,
                  nearest_int(isc[:, None] * scales), 0).astype(np.uint8)
    lm = np.where(max_min[:, None] > 0,
                  nearest_int(imn[:, None] * mins), 0).astype(np.uint8)
    sc_packed = (ls | (lm << 4)).astype(np.uint8)
    d = np.where(max_scale > 0, max_scale / q4scale, F32(0)).astype(np.float16)
    dmin = np.where(max_min > 0, max_min / q4scale, F32(0)).astype(np.float16)
    dd = _f32(d)[:, None] * (sc_packed & 0x0F).astype(F32)  # [nb,16]
    dm = _f32(dmin)[:, None] * (sc_packed >> 4).astype(F32)
    xg = x.reshape(nb, 16, 16)
    dd_safe = np.where(dd == 0, F32(1), dd)
    L = np.clip(nearest_int((xg + dm[:, :, None]) / dd_safe[:, :, None]), 0, 3)
    L = np.where((dd == 0)[:, :, None], Lq, L).astype(np.uint8)
    Lp = L.reshape(nb, 2, 4, 32)  # [nb, half, shift-plane, 32]
    qs = (Lp[:, :, 0] | (Lp[:, :, 1] << 2) | (Lp[:, :, 2] << 4)
          | (Lp[:, :, 3] << 6))
    out = np.zeros(nb, dtype=DT[GGMLType.Q2_K])
    out["scales"] = sc_packed
    out["qs"] = qs.reshape(nb, 64)
    out["d"] = d
    out["dmin"] = dmin
    return out.view(np.uint8).reshape(-1)


def make_q3_quants_rmse(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized make_q3_quants(n=16, nmax=4, do_rmse=True)
    (ggml-quants.c:448). x: [G, 16]. Returns (L[G,16] int32 0..7 biased,
    scale[G])."""
    g, n = x.shape
    nmax = 4
    amax = np.abs(x).max(axis=1)
    aidx = np.argmax(np.abs(x), axis=1)
    mx = x[np.arange(g), aidx]
    dead = amax < GROUP_MAX_EPS
    iscale = (F32(-nmax) / np.where(dead, F32(1), mx)).astype(F32)
    L = np.clip(nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
    # all intermediate products must round in f32 like the C (int32 L would
    # promote numpy products to f64 and flip knife-edge accept comparisons)
    lf = L.astype(F32)
    w = x * x
    sumlx = _seqsum((w * x) * lf)
    suml2 = _seqsum((w * lf) * lf)
    # 5 greedy coordinate-descent sweeps; converged groups are fixpoints so
    # running all sweeps unconditionally matches the reference's early break
    for _ in range(5):
        for i in range(n):
            wi = w[:, i]
            xi = x[:, i]
            li = lf[:, i]
            slx = sumlx - (wi * xi) * li
            ok = slx > 0
            sl2 = suml2 - (wi * li) * li
            slx_safe = np.where(ok, slx, F32(1))
            new_l = np.clip(nearest_int(xi * sl2 / slx_safe), -nmax, nmax - 1)
            new_lf = new_l.astype(F32)
            changed = ok & (new_lf != li)
            slx2 = slx + (wi * xi) * new_lf
            sl22 = sl2 + (wi * new_lf) * new_lf
            accept = changed & (sl22 > 0) & (
                (slx2 * slx2) * suml2 > (sumlx * sumlx) * sl22)
            L[:, i] = np.where(accept, new_l, L[:, i])
            lf[:, i] = np.where(accept, new_lf, li)
            sumlx = np.where(accept, slx2, sumlx).astype(F32)
            suml2 = np.where(accept, sl22, suml2).astype(F32)
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(dead, F32(0), sumlx / suml2).astype(F32)
    L = np.where(dead[:, None], 0, L + nmax)
    return L.astype(np.int32), scale


def quant_q3_K(x: np.ndarray) -> np.ndarray:
    """quantize_row_q3_K_ref (ggml-quants.c:980)."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    Lq, scales = make_q3_quants_rmse(x.reshape(-1, 16))
    Lq = Lq.reshape(nb, 16, 16)
    scales = scales.reshape(nb, 16)
    aidx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nb), aidx]
    live = max_scale != 0
    iscale = (F32(-32) / np.where(live, max_scale, F32(1))).astype(F32)
    l6 = np.clip(nearest_int(iscale[:, None] * scales), -32, 31) + 32
    l6 = np.where(live[:, None], l6, 0).astype(np.uint8)  # dead → memset(0)
    # pack 16 6-bit scales into 12 bytes (inverse of unpack_q3_K_scales)
    packed = np.zeros((nb, 12), dtype=np.uint8)
    packed[:, :8] = (l6[:, :8] & 0x0F) | ((l6[:, 8:] & 0x0F) << 4)
    hi = l6 >> 4  # [nb, 16] 2-bit
    for j in range(16):
        packed[:, 8 + j % 4] |= hi[:, j] << (2 * (j // 4))
    d = np.where(live, (F32(1) / iscale), F32(0)).astype(np.float16)
    sc = unpack_q3_K_scales(packed).reshape(nb, 16)  # [nb,16] signed
    dd = _f32(d)[:, None] * sc.astype(F32)
    xg = x.reshape(nb, 16, 16)
    dd_safe = np.where(dd == 0, F32(1), dd)
    L = np.clip(nearest_int(xg / dd_safe[:, :, None]), -4, 3) + 4
    L = np.where((dd == 0)[:, :, None], Lq, L).astype(np.int32)  # [nb,16,16]
    # hmask: element j (0..255) → byte j%32, bit j//32
    Lf = L.reshape(nb, QK_K)
    high = (Lf > 3).astype(np.uint8).reshape(nb, 8, 32)
    hmask = np.zeros((nb, 32), dtype=np.uint8)
    for b in range(8):
        hmask |= high[:, b, :] << b
    Lf = np.where(Lf > 3, Lf - 4, Lf).astype(np.uint8)
    Lp = Lf.reshape(nb, 2, 4, 32)
    qs = (Lp[:, :, 0] | (Lp[:, :, 1] << 2) | (Lp[:, :, 2] << 4)
          | (Lp[:, :, 3] << 6))
    out = np.zeros(nb, dtype=DT[GGMLType.Q3_K])
    out["hmask"] = hmask
    out["qs"] = qs.reshape(nb, 64)
    out["scales"] = packed
    out["d"] = d
    return out.view(np.uint8).reshape(-1)


def iq_int_decompose(raw: np.ndarray, t: GGMLType):
    """Grid-codebook IQ blocks → (q int8 [n], s f32 [n/g], g): the exact
    integer payload and per-group f32 scale such that s.repeat(g) * q
    reproduces dequantize() bit-for-bit (signs commute exactly; IQ1's
    ±0.125 delta folds into payload 8*grid±1 with a power-of-2 scale).
    Lets IQ1/IQ2/IQ3 stream through the q8 Pallas kernel losslessly."""
    from .iq_grids import grids, sign_table, byte_sign_table

    b = _blocks(raw, t)
    nb = len(b)
    d = _f32(b["d"]) if "d" in (b.dtype.names or ()) else None
    if t == GGMLType.IQ2_XXS:
        q32 = np.ascontiguousarray(b["qs"]).view("<u4").reshape(nb, 8, 2)
        a0, a1 = q32[..., 0], q32[..., 1]
        s = (d[:, None] * (F32(0.5) + (a1 >> 28).astype(F32)) * F32(0.25))
        grid = grids()["iq2xxs_grid"][_u8cols(a0)].astype(np.int32)
        sidx = (a1[..., None] >> (7 * np.arange(4, dtype=np.uint32))) & 127
        signs = sign_table()[sidx].astype(np.int32)
        return ((grid * signs).reshape(nb * 256).astype(np.int8),
                s.reshape(-1), 32)
    if t == GGMLType.IQ2_XS:
        q = b["qs"].reshape(nb, 8, 4)
        sc = b["scales"]
        nib = np.stack([sc & 0xF, sc >> 4], axis=-1)  # [nb,8,2] per 16
        s = d[:, None, None] * (F32(0.5) + nib.astype(F32)) * F32(0.25)
        grid = grids()["iq2xs_grid"][q & 511].astype(np.int32)
        signs = sign_table()[q >> 9].astype(np.int32)
        return ((grid * signs).reshape(nb * 256).astype(np.int8),
                s.reshape(-1), 16)
    if t == GGMLType.IQ2_S:
        ql = b["qs"][:, :32].reshape(nb, 8, 4).astype(np.uint16)
        sbytes = b["qs"][:, 32:].reshape(nb, 8, 4)
        qh = b["qh"].astype(np.uint16)
        high = (qh[:, :, None] >> (2 * np.arange(4))) & 3
        grid = grids()["iq2s_grid"][ql | (high << 8)].astype(np.int32)
        signs = byte_sign_table()[sbytes].astype(np.int32)
        sc = b["scales"]
        nib = np.stack([sc & 0xF, sc >> 4], axis=-1)
        s = d[:, None, None] * (F32(0.5) + nib.astype(F32)) * F32(0.25)
        return ((grid * signs).reshape(nb * 256).astype(np.int8),
                s.reshape(-1), 16)
    if t == GGMLType.IQ3_XXS:
        qs = b["qs"][:, :64].reshape(nb, 8, 8)
        aux = np.ascontiguousarray(b["qs"][:, 64:]).view("<u4").reshape(nb, 8)
        s = d[:, None] * (F32(0.5) + (aux >> 28).astype(F32)) * F32(0.5)
        grid = grids()["iq3xxs_grid"][qs].astype(np.int32).reshape(nb, 8, 32)
        sidx = (aux[..., None] >> (7 * np.arange(4, dtype=np.uint32))) & 127
        signs = sign_table()[sidx].reshape(nb, 8, 32).astype(np.int32)
        return ((grid * signs).reshape(nb * 256).astype(np.int8),
                s.reshape(-1), 32)
    if t == GGMLType.IQ3_S:
        qs = b["qs"].reshape(nb, 8, 8).astype(np.uint16)
        qh = b["qh"].astype(np.uint16)
        high = ((qh[:, :, None] >> np.arange(8)) & 1) << 8
        grid = grids()["iq3s_grid"][qs | high].astype(np.int32).reshape(nb, 8, 32)
        signs = byte_sign_table()[b["signs"].reshape(nb, 8, 4)].reshape(
            nb, 8, 32).astype(np.int32)
        sc = b["scales"]
        nib = np.stack([sc & 0xF, sc >> 4], axis=-1).reshape(nb, 8)
        s = d[:, None] * (F32(1) + F32(2) * nib.astype(F32))
        return ((grid * signs).reshape(nb * 256).astype(np.int8),
                s.reshape(-1), 32)
    if t == GGMLType.IQ1_S:
        from .iq_grids import IQ1S_DELTA  # noqa: F401 — 0.125 = 2^-3

        qs = b["qs"].reshape(nb, 8, 4).astype(np.uint16)
        qh = b["qh"]
        dl = d[:, None] * (2 * ((qh >> 12) & 7).astype(F32) + 1)
        dsign = np.where((qh & 0x8000) != 0, -1, 1).astype(np.int32)
        high = (qh[:, :, None].astype(np.uint32) >> (3 * np.arange(4))) & 7
        grid = grids()["iq1s_grid"][qs | (high << 8).astype(np.uint16)]
        q = 8 * grid.astype(np.int32) + dsign[:, :, None, None]
        return (q.reshape(nb * 256).astype(np.int8),
                (dl * F32(0.125)).reshape(-1), 32)
    if t == GGMLType.IQ1_M:
        sc = np.ascontiguousarray(b["scales"]).view("<u2").reshape(nb, 4)
        d_bits = ((sc[:, 0] >> 12) | ((sc[:, 1] >> 8) & 0x00F0)
                  | ((sc[:, 2] >> 4) & 0x0F00) | (sc[:, 3] & 0xF000)
                  ).astype(np.uint16)
        dm = d_bits.view("<f2").astype(F32)
        qs = b["qs"].reshape(nb, 8, 4).astype(np.uint16)
        qh = b["qh"].reshape(nb, 8, 2).astype(np.uint16)
        high = np.stack([qh[..., 0] & 7, (qh[..., 0] >> 4) & 7,
                         qh[..., 1] & 7, (qh[..., 1] >> 4) & 7], axis=-1)
        grid = grids()["iq1s_grid"][qs | (high << 8)]
        hb = np.stack([qh[..., 0], qh[..., 0], qh[..., 1], qh[..., 1]], axis=-1)
        mask = np.where(np.arange(4)[None, None, :] % 2 == 0, 0x08, 0x80)
        dsign = np.where((hb & mask) != 0, -1, 1).astype(np.int32)
        q = 8 * grid.astype(np.int32) + dsign[..., None]
        ib = np.arange(8)
        shift = 6 * (ib % 2)
        sc_ib = sc[:, ib // 2]
        dl12 = np.stack([(sc_ib >> shift) & 7, (sc_ib >> (shift + 3)) & 7],
                        axis=-1)  # [nb,8,2] — per 16 elements
        s = dm[:, None, None] * (2 * dl12.astype(F32) + 1) * F32(0.125)
        return (q.reshape(nb * 256).astype(np.int8), s.reshape(-1), 16)
    if t == GGMLType.TQ1_0:
        pow3 = np.array([1, 3, 9, 27, 81], dtype=np.uint16)

        def trits(bytes_, npow):
            q = (bytes_[:, None, :] * pow3[None, :npow, None]).astype(np.uint8)
            return ((q.astype(np.uint16) * 3) >> 8).astype(np.int32) - 1

        y1 = trits(b["qs"][:, :32], 5).reshape(nb, 160)
        y2 = trits(b["qs"][:, 32:48], 5).reshape(nb, 80)
        y3 = trits(b["qh"], 4).reshape(nb, 16)
        q = np.concatenate([y1, y2, y3], axis=1)  # [nb, 256] in {-1,0,1}
        s = np.repeat(d[:, None], 8, axis=1)  # per-block scale at g=32
        return q.reshape(nb * 256).astype(np.int8), s.reshape(-1), 32
    if t == GGMLType.TQ2_0:
        qs = b["qs"].reshape(nb, 2, 1, 32)
        shifts = (2 * np.arange(4)).reshape(1, 1, 4, 1)
        q = ((qs >> shifts) & 3).astype(np.int32) - 1
        s = np.repeat(d[:, None], 8, axis=1)
        return q.reshape(nb * 256).astype(np.int8), s.reshape(-1), 32
    raise NotImplementedError(f"iq_int_decompose {t.name}")


def quant_f16(x: np.ndarray) -> np.ndarray:
    return _f32(x).astype(np.float16).view(np.uint8).reshape(-1)


def quant_bf16(x: np.ndarray) -> np.ndarray:
    # round-to-nearest-even f32 → bf16, matching ggml_compute_fp32_to_bf16
    u = _f32(x).view(np.uint32)
    nan = (u & 0x7FFFFFFF) > 0x7F800000
    rounded = (u + (0x7FFF + ((u >> 16) & 1))) >> 16
    out = np.where(nan, (u >> 16) | 64, rounded).astype(np.uint16)
    return out.view(np.uint8).reshape(-1)


def quant_f32(x: np.ndarray) -> np.ndarray:
    return _f32(x).view(np.uint8).reshape(-1)


def _best_index_iq4nl(al: np.ndarray) -> np.ndarray:
    """Nearest index in the IQ4NL codebook — ggml best_index_int8
    (ggml-quants.c): ties resolve to the upper index."""
    v = KVALUES_IQ4NL.astype(np.float32)
    hi = np.clip(np.searchsorted(v, al, side="left"), 1, 15)
    lo = hi - 1
    pick_lo = (al - v[lo]) < (v[hi] - al)
    return np.where(al <= v[0], 0,
                    np.where(al >= v[15], 15, np.where(pick_lo, lo, hi)))


def _iq4_fit(xb: np.ndarray, weight: np.ndarray, ntry: int = 7) -> np.ndarray:
    """Per-32-block scale fit for IQ4 (quantize_row_iq4_nl_impl,
    ggml-quants.c:4573): weighted least-squares over the codebook with a
    ±ntry scale-candidate sweep. xb/weight [nb, 32] → d [nb] f32."""
    v0 = float(KVALUES_IQ4NL[0])
    amax = np.abs(xb).max(axis=1)
    maxv = xb[np.arange(len(xb)), np.abs(xb).argmax(axis=1)]
    ok = amax >= GROUP_MAX_EPS
    safe_max = np.where(ok, maxv, F32(1))

    def fit(id_):
        lidx = _best_index_iq4nl(id_[:, None] * xb)
        q = KVALUES_IQ4NL.astype(np.float32)[lidx]
        sumqx = (weight * q * xb).sum(axis=1)
        sumq2 = (weight * q * q).sum(axis=1)
        return sumqx, sumq2

    d0 = -safe_max / v0 if ntry > 0 else safe_max / v0
    sumqx, sumq2 = fit(np.where(d0 != 0, 1.0 / np.where(d0 != 0, d0, 1), 0).astype(F32))
    d = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), d0)
    best = d * sumqx
    for itry in range(-ntry, ntry + 1):
        id_ = ((itry + v0) / safe_max).astype(F32)
        sumqx, sumq2 = fit(id_)
        better = (sumq2 > 0) & (sumqx * sumqx > best * sumq2)
        d_new = sumqx / np.where(sumq2 > 0, sumq2, 1)
        d = np.where(better, d_new, d)
        best = np.where(better, d_new * sumqx, best)
    return np.where(ok, d, F32(0)).astype(F32)


def _iq4_weights(xb: np.ndarray, qw: np.ndarray | None, sigma2=None) -> np.ndarray:
    if qw is None:
        return xb * xb
    return qw * np.sqrt(sigma2[:, None] + xb * xb).astype(F32)


def _pack_nibble_groups(lidx: np.ndarray) -> np.ndarray:
    """[nb, n32, 32] indices → [nb, n32*16] packed (q4[16i+j] = L[32i+j] |
    L[32i+16+j]<<4)."""
    lo = lidx[..., :16]
    hi = lidx[..., 16:]
    return (lo | (hi << 4)).astype(np.uint8).reshape(len(lidx), -1)


def quant_iq4_nl(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """IQ4_NL quantizer (quantize_iq4_nl, ggml-quants.c:4688, ntry=7)."""
    x = _f32(x).reshape(-1, 32)
    nb = len(x)
    if qw is not None:
        sigma2 = F32(2) * (x * x).sum(axis=1) / F32(32)
        weight = _iq4_weights(x, qw.reshape(-1, 32)[:nb] if qw.ndim else qw, sigma2)
    else:
        weight = _iq4_weights(x, None)
    d = _iq4_fit(x, weight, ntry=7)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0).astype(F32)
    lidx = _best_index_iq4nl(id_[:, None] * x)  # final recompute (ntry>0)
    out = np.zeros(nb, dtype=DT[GGMLType.IQ4_NL])
    out["d"] = d.astype(np.float16)
    out["qs"] = _pack_nibble_groups(lidx[:, None, :])
    return out.view(np.uint8).reshape(-1)


def quant_iq4_xs(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """IQ4_XS quantizer (quantize_iq4_xs, ggml-quants.c:4722, ntry=7):
    6-bit sub-block scales against a shared f16 super-scale."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    xg = x.reshape(nb, 8, 32)
    if qw is not None:
        sigma2 = F32(2) * (x * x).sum(axis=1) / F32(QK_K)
        w = _iq4_weights(xg.reshape(-1, 32), np.broadcast_to(
            qw.reshape(-1, 32), (nb * 8, 32)) if qw.size == QK_K else
            qw.reshape(-1, 32), np.repeat(sigma2, 8))
    else:
        w = _iq4_weights(xg.reshape(-1, 32), None)
    scales = _iq4_fit(xg.reshape(-1, 32), w, ntry=7).reshape(nb, 8)

    amax_s = np.abs(scales).max(axis=1)
    max_s = scales[np.arange(nb), np.abs(scales).argmax(axis=1)]
    d = np.where(amax_s > 0, -max_s / F32(32), F32(0)).astype(F32)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0).astype(F32)
    ls = np.clip(nearest_int(id_[:, None] * scales), -32, 31)  # [nb, 8]
    dl = d[:, None] * ls.astype(F32)
    idl = np.where(dl != 0, 1.0 / np.where(dl != 0, dl, 1), 0).astype(F32)
    lidx = _best_index_iq4nl(idl[:, :, None] * xg)  # [nb, 8, 32]

    lsu = (ls + 32).astype(np.uint16)
    out = np.zeros(nb, dtype=DT[GGMLType.IQ4_XS])
    out["d"] = d.astype(np.float16)
    out["scales_l"] = ((lsu[:, 0::2] & 0xF) | ((lsu[:, 1::2] & 0xF) << 4)).astype(np.uint8)
    sh = np.zeros(nb, np.uint16)
    for ib in range(8):
        sh |= ((lsu[:, ib] >> 4) & 3).astype(np.uint16) << (2 * ib)
    out["scales_h"] = sh
    out["qs"] = _pack_nibble_groups(lidx)
    return out.view(np.uint8).reshape(-1)


# ---------------------------------------------------------------------------
# IQ2/IQ3 codebook encoders.
#
# The reference's quantize_row_iq2_xxs_impl (ggml-quants.c:2955) rounds to
# the nearest lattice point and repairs off-grid patterns with precomputed
# neighbour tables (ggml_quantize_init). Here we search the WHOLE codebook
# per 8-(or 4-)element group with a weighted least-squares criterion —
# simpler, vectorized, and never worse than the pruned neighbour search.
# Decoding is format-exact; encoded bits are valid but not bit-identical to
# the reference encoder (encoders differ across llama.cpp versions too).
# ---------------------------------------------------------------------------


def _iq2xxs_codebook() -> np.ndarray:
    """[256, 8] codeword values in scale units. Decode is
    d·(2ls+1)/8·byte with scale ≈ d·(2ls+1), so q = byte/8 exactly
    (bytes {8,25,43} → {1, 3.125, 5.375})."""
    from .iq_grids import grids

    return grids()["iq2xxs_grid"].astype(np.float32) / 8.0


def _iq3xxs_codebook() -> np.ndarray:
    """[256, 4] codeword values in scale units: decode d·(2ls+1)/4·byte ⇒
    q = byte/4 ({1, 3, 5, 7, 9, 11, 13, 15.5})."""
    from .iq_grids import grids

    return grids()["iq3xxs_grid"].astype(np.float32) / 4.0


def _iq_group_prep(x32: np.ndarray, weight: np.ndarray, span: int):
    """Signs with odd-parity repair per `span`-element group (the stored
    sign field is 7 bits + parity). Returns (xval |x|-with-flip, sign_bits)."""
    g = x32.reshape(-1, span)
    w = weight.reshape(-1, span)
    neg = g < 0
    nflip = neg.sum(axis=1)
    imp = w * g * g
    imin = imp.argmin(axis=1)
    odd = (nflip % 2).astype(bool)
    flip = np.zeros_like(neg)
    flip[np.arange(len(g)), imin] = odd
    eff_neg = neg ^ flip
    # xval = |x| everywhere except the parity-repair element, which is
    # decoded with the WRONG sign and must be fit as negative
    xval = np.where(flip, -np.abs(g), np.abs(g)).astype(np.float32)
    sign_bits = (eff_neg.astype(np.uint32)
                 << np.arange(span, dtype=np.uint32)).sum(axis=1)
    return xval, sign_bits


def _codebook_fit(xval: np.ndarray, w: np.ndarray, code: np.ndarray,
                  scale0: np.ndarray, n_try: int = 13):
    """Per group (row), search scale candidates × full codebook.
    xval/w [G, span] (xval may carry the parity flip's negative element);
    code [C, span]. Returns (idx [G], scale_groups — per-row best LS scale
    is NOT returned; selection happens per 32-block outside)."""
    # distance terms: for candidate scale s, codeword c:
    #   err = Σ w (s·q - xv)² = s²·Σwq² − 2s·Σwqxv + const
    wq2 = np.einsum("gs,cs->gc", w, code * code)  # [G, C]
    wqx = np.einsum("gs,cs->gc", w * xval, code)  # [G, C]
    best_err = np.full(len(xval), np.inf, np.float32)
    best_idx = np.zeros(len(xval), np.int64)
    for it in range(n_try):
        s = scale0 * (1.0 + 0.05 * (it - n_try // 2))
        err = (s[:, None] ** 2) * wq2 - 2.0 * s[:, None] * wqx
        idx = err.argmin(axis=1)
        e = err[np.arange(len(idx)), idx]
        better = e < best_err
        best_err = np.where(better, e, best_err)
        best_idx = np.where(better, idx, best_idx)
    return best_idx


def quant_iq2_xxs(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """IQ2_XXS encoder: per-8 codebook search + signs, 4-bit group scales
    against d = max_scale/31 (packing per ggml-quants.c:3093-3124)."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    code = _iq2xxs_codebook()  # [256, 8] values {1,3,5}
    sigma2 = (x * x).sum(axis=1) / F32(QK_K)
    if qw is None:
        weight = x * x + 1e-8
    else:
        weight = (np.broadcast_to(qw.reshape(-1)[:QK_K], x.shape)
                  * np.sqrt(sigma2[:, None] + x * x)).astype(F32)

    xg = x.reshape(nb * 8, 32)  # per 32-block
    wg = weight.reshape(nb * 8, 32)
    xval, signs = _iq_group_prep(xg, wg, 8)  # [nb*32, 8], [nb*32]
    w8 = wg.reshape(-1, 8)
    amax = np.abs(xval).max(axis=1).reshape(-1, 4).max(axis=1)  # per 32-block
    scale0 = np.repeat(np.where(amax > 0, amax, 1) / 5.0, 4).astype(F32)
    idx = _codebook_fit(xval, w8, code, scale0)

    q = code[idx]  # [nb*32, 8]
    # per-32-block LS scale over its 4 groups
    q32 = q.reshape(-1, 32)
    x32 = xval.reshape(-1, 32)
    w32 = wg
    sumqx = (w32 * x32 * q32).sum(axis=1)
    sumq2 = (w32 * q32 * q32).sum(axis=1)
    scales = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0)
    scales = np.maximum(scales, 0).astype(F32).reshape(nb, 8)

    max_scale = scales.max(axis=1)
    d = np.where(max_scale > 0, max_scale / 31.0, 0).astype(F32)
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0)
    ls = np.clip(nearest_int(0.5 * (id_[:, None] * scales - 1)), 0, 15)

    idx4 = idx.reshape(nb, 8, 4).astype(np.uint32)
    s4 = signs.reshape(nb, 8, 4).astype(np.uint32) & 127
    a0 = (idx4 << (8 * np.arange(4, dtype=np.uint32))).sum(axis=2).astype(np.uint32)
    a1 = (s4 << (7 * np.arange(4, dtype=np.uint32))).sum(axis=2).astype(np.uint32)
    a1 |= ls.astype(np.uint32) << 28

    out = np.zeros(nb, dtype=DT[GGMLType.IQ2_XXS])
    out["d"] = d.astype(np.float16)
    q2 = np.stack([a0, a1], axis=2).reshape(nb, 16)  # interleave a0,a1 per ib
    out["qs"] = q2.view("<u2").reshape(nb, 32)
    return out.view(np.uint8).reshape(-1)


def quant_iq3_xxs(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """IQ3_XXS encoder: per-4 codebook search + per-8 signs, 4-bit group
    scales against d = max_scale/31 (quantize_row_iq3_xxs_impl packing)."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    code = _iq3xxs_codebook()  # [256, 4]
    sigma2 = (x * x).sum(axis=1) / F32(QK_K)
    if qw is None:
        weight = x * x + 1e-8
    else:
        weight = (np.broadcast_to(qw.reshape(-1)[:QK_K], x.shape)
                  * np.sqrt(sigma2[:, None] + x * x)).astype(F32)

    xg = x.reshape(nb * 8, 32)
    wg = weight.reshape(nb * 8, 32)
    # signs are per-8 (ksigns) but grids are per-4: prep on 8, search on 4
    xval8, signs = _iq_group_prep(xg, wg, 8)
    xval4 = xval8.reshape(-1, 4)
    w4 = wg.reshape(-1, 4)
    amax = np.abs(xval4).max(axis=1).reshape(-1, 8).max(axis=1)
    scale0 = np.repeat(np.where(amax > 0, amax, 1) / 15.0, 8).astype(F32)
    idx = _codebook_fit(xval4, w4, code, scale0)

    q = code[idx]
    q32 = q.reshape(-1, 32)
    x32 = xval4.reshape(-1, 32)
    sumqx = (wg * x32 * q32).sum(axis=1)
    sumq2 = (wg * q32 * q32).sum(axis=1)
    scales = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0)
    scales = np.maximum(scales, 0).astype(F32).reshape(nb, 8)

    max_scale = scales.max(axis=1)
    # stored db = d·(0.5+s)·0.5 (vs 0.25 for iq2): d = max/(31·0.5/0.25)…
    # the reference uses the same max/31 convention with its 0.5 factor
    d = np.where(max_scale > 0, max_scale / 31.0, 0).astype(F32)
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0)
    ls = np.clip(nearest_int(0.5 * (id_[:, None] * scales - 1)), 0, 15)

    out = np.zeros(nb, dtype=DT[GGMLType.IQ3_XXS])
    out["d"] = d.astype(np.float16)
    qs = idx.reshape(nb, 64).astype(np.uint8)
    s4 = signs.reshape(nb, 8, 4).astype(np.uint32) & 127
    aux = (s4 << (7 * np.arange(4, dtype=np.uint32))).sum(axis=2).astype(np.uint32)
    aux |= ls.astype(np.uint32) << 28
    out["qs"][:, :64] = qs
    out["qs"][:, 64:] = aux.astype("<u4").view(np.uint8).reshape(nb, 32)
    return out.view(np.uint8).reshape(-1)


def _iq_weights(x: np.ndarray, qw: np.ndarray | None) -> np.ndarray:
    """Per-element fit weights: x² or imatrix·sqrt(σ²+x²) (reference
    quantize_row_iq*_impl weight setup)."""
    if qw is None:
        return x * x + 1e-8
    sigma2 = (x * x).sum(axis=1) / F32(x.shape[1])
    return (np.broadcast_to(qw.reshape(-1)[: x.shape[1]], x.shape)
            * np.sqrt(sigma2[:, None] + x * x)).astype(F32)


def quant_iq3_s(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """IQ3_S encoder: per-4 search over the 512-entry grid (qh carries the
    9th index bit), explicit per-element sign bytes, 4-bit scales with
    db = d·(1+2·ls) (dequantize_row_iq3_s packing)."""
    from .iq_grids import grids

    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    code = grids()["iq3s_grid"].astype(np.float32)  # [512, 4] odd ints
    weight = _iq_weights(x, qw)

    xg = x.reshape(nb * 8, 32)
    wg = weight.reshape(nb * 8, 32)
    xval4 = np.abs(xg).reshape(-1, 4)  # signs stored explicitly
    w4 = wg.reshape(-1, 4)
    amax = np.abs(xg).max(axis=1)
    scale0 = np.repeat(np.where(amax > 0, amax, 1) / 15.0, 8).astype(F32)
    idx = _codebook_fit(xval4, w4, code, scale0)

    q32 = code[idx].reshape(-1, 32)
    x32 = np.abs(xg)
    sumqx = (wg * x32 * q32).sum(axis=1)
    sumq2 = (wg * q32 * q32).sum(axis=1)
    scales = np.maximum(
        np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0), 0
    ).astype(F32).reshape(nb, 8)

    max_scale = scales.max(axis=1)
    d = np.where(max_scale > 0, max_scale / 31.0, 0).astype(F32)
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0)
    ls = np.clip(nearest_int(0.5 * (id_[:, None] * scales - 1)), 0, 15)

    out = np.zeros(nb, dtype=DT[GGMLType.IQ3_S])
    out["d"] = d.astype(np.float16)
    idx8 = idx.reshape(nb, 8, 8).astype(np.uint32)  # 8 grids per ib32
    out["qs"] = (idx8 & 0xFF).astype(np.uint8).reshape(nb, 64)
    # qh bit p of ib32's byte = index high bit of grid position p
    hb = (idx8 >> 8) & 1
    out["qh"] = (hb << np.arange(8, dtype=np.uint32)).sum(axis=2).astype(np.uint8)
    sbits = (xg < 0).reshape(nb, 8, 4, 8).astype(np.uint32)
    out["signs"] = (
        (sbits << np.arange(8, dtype=np.uint32)).sum(axis=3)
        .astype(np.uint8).reshape(nb, 32)
    )
    out["scales"] = ((ls[:, 0::2] & 0xF) | ((ls[:, 1::2] & 0xF) << 4)).astype(np.uint8)
    return out.view(np.uint8).reshape(-1)


def quant_iq2_s(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """IQ2_S encoder: per-8 search over the 1024-entry grid (qh carries the
    two high index bits), explicit sign bytes, two 4-bit half-block scales
    with db = d·(0.5+ls)·0.25 (dequantize_row_iq2_s packing)."""
    from .iq_grids import grids

    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    code = grids()["iq2s_grid"].astype(np.float32) / 8.0  # byte/8 scale units
    weight = _iq_weights(x, qw)

    xg = x.reshape(nb * 8, 32)
    wg = weight.reshape(nb * 8, 32)
    xval8 = np.abs(xg).reshape(-1, 8)
    w8 = wg.reshape(-1, 8)
    amax16 = np.abs(xg.reshape(-1, 16)).max(axis=1)  # per half-block
    scale0 = np.repeat(np.where(amax16 > 0, amax16, 1) / 5.0, 2).astype(F32)
    idx = _codebook_fit(xval8, w8, code, scale0)

    q16 = code[idx].reshape(-1, 16)  # per half-block
    x16 = np.abs(xg).reshape(-1, 16)
    w16 = wg.reshape(-1, 16)
    sumqx = (w16 * x16 * q16).sum(axis=1)
    sumq2 = (w16 * q16 * q16).sum(axis=1)
    scales = np.maximum(
        np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0), 0
    ).astype(F32).reshape(nb, 16)  # two per ib32

    max_scale = scales.max(axis=1)
    d = np.where(max_scale > 0, max_scale / 31.0, 0).astype(F32)
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0)
    ls = np.clip(nearest_int(0.5 * (id_[:, None] * scales - 1)), 0, 15)

    out = np.zeros(nb, dtype=DT[GGMLType.IQ2_S])
    out["d"] = d.astype(np.float16)
    idx4 = idx.reshape(nb, 8, 4).astype(np.uint32)
    qs = np.zeros((nb, 64), np.uint8)
    qs[:, :32] = (idx4 & 0xFF).astype(np.uint8).reshape(nb, 32)
    sbits = (xg < 0).reshape(nb, 8, 4, 8).astype(np.uint32)
    qs[:, 32:] = ((sbits << np.arange(8, dtype=np.uint32)).sum(axis=3)
                  .astype(np.uint8).reshape(nb, 32))
    out["qs"] = qs
    high = (idx4 >> 8) & 3  # [nb, 8, 4]
    out["qh"] = ((high << (2 * np.arange(4, dtype=np.uint32))).sum(axis=2)
                 .astype(np.uint8))
    out["scales"] = ((ls[:, 0::2] & 0xF) | ((ls[:, 1::2] & 0xF) << 4)).astype(np.uint8)
    return out.view(np.uint8).reshape(-1)


def quant_iq2_xs(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """IQ2_XS encoder: per-8 search over the 512-entry grid, 7-bit parity
    signs packed into the qs words (idx | sign<<9), two 4-bit half-block
    scales (dequantize_row_iq2_xs packing)."""
    from .iq_grids import grids

    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    code = grids()["iq2xs_grid"].astype(np.float32) / 8.0
    weight = _iq_weights(x, qw)

    xg = x.reshape(nb * 8, 32)
    wg = weight.reshape(nb * 8, 32)
    xval, signs = _iq_group_prep(xg, wg, 8)
    w8 = wg.reshape(-1, 8)
    amax16 = np.abs(xg.reshape(-1, 16)).max(axis=1)
    scale0 = np.repeat(np.where(amax16 > 0, amax16, 1) / 5.0, 2).astype(F32)
    idx = _codebook_fit(xval, w8, code, scale0)

    q16 = code[idx].reshape(-1, 16)
    x16 = xval.reshape(-1, 16)
    w16 = wg.reshape(-1, 16)
    sumqx = (w16 * x16 * q16).sum(axis=1)
    sumq2 = (w16 * q16 * q16).sum(axis=1)
    scales = np.maximum(
        np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0), 0
    ).astype(F32).reshape(nb, 16)

    max_scale = scales.max(axis=1)
    d = np.where(max_scale > 0, max_scale / 31.0, 0).astype(F32)
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0)
    ls = np.clip(nearest_int(0.5 * (id_[:, None] * scales - 1)), 0, 15)

    out = np.zeros(nb, dtype=DT[GGMLType.IQ2_XS])
    out["d"] = d.astype(np.float16)
    words = (idx.astype(np.uint32) & 511) | ((signs & 127) << 9)
    out["qs"] = words.astype("<u2").reshape(nb, 32)
    out["scales"] = ((ls[:, 0::2] & 0xF) | ((ls[:, 1::2] & 0xF) << 4)).astype(np.uint8)
    return out.view(np.uint8).reshape(-1)


def quant_iq1_m(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """IQ1_M encoder: per-8 codebook search with PER-GROUP delta signs
    (qh nibble bits 0x08/0x80), per-16 3-bit scales, and the f16 super
    scale scattered over the scale words' top nibbles
    (dequantize_row_iq1_m packing)."""
    from .iq_grids import IQ1M_DELTA, grids

    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    code = grids()["iq1s_grid"].astype(np.float32)
    weight = _iq_weights(x, qw)

    xg = x.reshape(nb * 8, 32)
    wg = weight.reshape(nb * 8, 32)
    x8 = xg.reshape(-1, 8)
    w8 = wg.reshape(-1, 8)
    amax16 = np.abs(xg.reshape(-1, 16)).max(axis=1)
    scale0 = np.repeat(np.where(amax16 > 0, amax16, 1), 2).astype(F32)

    best_err = np.full(len(x8), np.inf, np.float32)
    best_idx = np.zeros(len(x8), np.int64)
    best_neg = np.zeros(len(x8), bool)
    for f in (0.7, 0.85, 1.0, 1.15, 1.3):
        s = scale0 * f
        for dsign in (1.0, -1.0):
            c = code + dsign * IQ1M_DELTA
            wq2 = np.einsum("gs,cs->gc", w8, c * c)
            wqx = np.einsum("gs,cs->gc", w8 * x8, c)
            err = (s[:, None] ** 2) * wq2 - 2.0 * s[:, None] * wqx
            idx = err.argmin(axis=1)
            e = err[np.arange(len(idx)), idx]
            better = e < best_err
            best_err = np.where(better, e, best_err)
            best_idx = np.where(better, idx, best_idx)
            best_neg = np.where(better, dsign < 0, best_neg)

    delta = np.where(best_neg, -IQ1M_DELTA, IQ1M_DELTA).astype(np.float32)
    q16 = (code[best_idx] + delta[:, None]).reshape(-1, 16)
    x16 = xg.reshape(-1, 16)
    w16 = wg.reshape(-1, 16)
    sumqx = (w16 * x16 * q16).sum(axis=1)
    sumq2 = (w16 * q16 * q16).sum(axis=1)
    scales = np.maximum(
        np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0), 0
    ).astype(F32).reshape(nb, 16)

    max_scale = scales.max(axis=1)
    d = np.where(max_scale > 0, max_scale / 15.0, 0).astype(F32)
    d16 = d.astype(np.float16)
    dval = d16.astype(F32)
    id_ = np.where(dval > 0, 1.0 / np.where(dval > 0, dval, 1), 0)
    ls = np.clip(nearest_int(0.5 * (id_[:, None] * scales - 1)), 0, 7)  # [nb,16]

    out = np.zeros(nb, dtype=DT[GGMLType.IQ1_M])
    idx4 = best_idx.reshape(nb, 8, 4).astype(np.uint32)
    out["qs"] = (idx4 & 0xFF).astype(np.uint8).reshape(nb, 32)
    hi = (idx4 >> 8) & 7  # [nb, 8, 4]
    neg4 = best_neg.reshape(nb, 8, 4)
    qh = np.zeros((nb, 8, 2), np.uint32)
    qh[..., 0] = hi[..., 0] | (hi[..., 1] << 4)
    qh[..., 1] = hi[..., 2] | (hi[..., 3] << 4)
    n4 = neg4.astype(np.uint32)
    qh[..., 0] |= (n4[..., 0] << 3) | (n4[..., 1] << 7)
    qh[..., 1] |= (n4[..., 2] << 3) | (n4[..., 3] << 7)
    out["qh"] = qh.astype(np.uint8).reshape(nb, 16)
    # scale words: sc[i] holds 4 × 3-bit sub-scales + the i-th nibble of
    # the f16 super scale in bits 12-15
    dbits = d16.view(np.uint16).astype(np.uint32)
    sc = np.zeros((nb, 4), np.uint32)
    l16 = ls.astype(np.uint32).reshape(nb, 4, 4)  # [nb, word, 4 scales]
    sc |= l16[:, :, 0] | (l16[:, :, 1] << 3) | (l16[:, :, 2] << 6) | (l16[:, :, 3] << 9)
    sc[:, 0] |= ((dbits >> 0) & 0xF) << 12
    sc[:, 1] |= ((dbits >> 4) & 0xF) << 12
    sc[:, 2] |= ((dbits >> 8) & 0xF) << 12
    sc[:, 3] |= ((dbits >> 12) & 0xF) << 12
    out["scales"] = sc.astype("<u2").view(np.uint8).reshape(nb, 8)
    return out.view(np.uint8).reshape(-1)


def quant_iq1_s(x: np.ndarray, qw: np.ndarray | None = None) -> np.ndarray:
    """IQ1_S encoder (1.5625 bpw): per-8 full-codebook search over the 2048
    signed ternary codewords, per-32 3-bit scale + block delta sign
    (decode: dl·(g ± 0.125), dequantize_row_iq1_s). Same design note as the
    IQ2/IQ3 encoders: whole-codebook weighted LS instead of the reference's
    neighbour-table repair (quantize_iq1_s, ggml-quants.c:4274)."""
    from .iq_grids import IQ1S_DELTA, grids

    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    code = grids()["iq1s_grid"].astype(np.float32)  # [2048, 8] ∈ {-1,0,1}
    sigma2 = (x * x).sum(axis=1) / F32(QK_K)
    if qw is None:
        weight = x * x + 1e-8
    else:
        weight = (np.broadcast_to(qw.reshape(-1)[:QK_K], x.shape)
                  * np.sqrt(sigma2[:, None] + x * x)).astype(F32)

    xg = x.reshape(nb * 8, 32)  # 32-blocks
    wg = weight.reshape(nb * 8, 32)
    x8 = xg.reshape(-1, 8)
    w8 = wg.reshape(-1, 8)
    amax = np.abs(xg).max(axis=1)
    scale0 = np.repeat(np.where(amax > 0, amax, 1), 4).astype(F32)

    best_err = np.full(len(x8), np.inf, np.float32)
    best_idx = np.zeros(len(x8), np.int64)
    best_dsign = np.zeros(len(xg), np.int8)  # per 32-block delta sign
    # candidates over (scale, delta sign); the block-level choices must be
    # consistent, so evaluate per (scale, sign) and reduce per 32-block
    cand_s = [0.7, 0.85, 1.0, 1.15, 1.3]
    cand = [(f, dsign) for f in cand_s for dsign in (1.0, -1.0)]
    best_block_err = np.full(len(xg), np.inf, np.float32)
    for f, dsign in cand:
        s = scale0 * f
        cvals = code[None] + dsign * IQ1S_DELTA  # [1, 2048, 8]
        # err per 8-group for this (s, dsign)
        wq2 = np.einsum("gs,cs->gc", w8, (code + dsign * IQ1S_DELTA) ** 2)
        wqx = np.einsum("gs,cs->gc", w8 * x8, code + dsign * IQ1S_DELTA)
        err = (s[:, None] ** 2) * wq2 - 2.0 * s[:, None] * wqx
        idx = err.argmin(axis=1)
        e8 = err[np.arange(len(idx)), idx]
        eb = e8.reshape(-1, 4).sum(axis=1)  # per 32-block
        better = eb < best_block_err
        best_block_err = np.where(better, eb, best_block_err)
        best_dsign = np.where(better, np.int8(1 if dsign > 0 else -1),
                              best_dsign)
        b4 = np.repeat(better, 4)
        best_idx = np.where(b4, idx, best_idx)

    q = code[best_idx] + np.repeat(best_dsign, 4).astype(np.float32)[:, None] \
        * IQ1S_DELTA  # [nb*32, 8]
    q32 = q.reshape(-1, 32)
    x32 = xg
    sumqx = (wg * x32 * q32).sum(axis=1)
    sumq2 = (wg * q32 * q32).sum(axis=1)
    scales = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0)
    scales = np.maximum(scales, 0).astype(F32).reshape(nb, 8)

    max_scale = scales.max(axis=1)
    d = np.where(max_scale > 0, max_scale / 15.0, 0).astype(F32)
    id_ = np.where(d > 0, 1.0 / np.where(d > 0, d, 1), 0)
    ls = np.clip(nearest_int(0.5 * (id_[:, None] * scales - 1)), 0, 7)

    idx4 = best_idx.reshape(nb, 8, 4).astype(np.uint32)
    out = np.zeros(nb, dtype=DT[GGMLType.IQ1_S])
    out["d"] = d.astype(np.float16)
    out["qs"] = (idx4 & 0xFF).astype(np.uint8).reshape(nb, 32)
    high = ((idx4 >> 8) & 7)  # [nb, 8, 4] 3-bit highs
    qh = (high << (3 * np.arange(4, dtype=np.uint32))).sum(axis=2).astype(np.uint32)
    qh |= ls.astype(np.uint32) << 12
    qh |= (best_dsign.reshape(nb, 8) < 0).astype(np.uint32) << 15
    out["qh"] = qh.astype("<u2")
    return out.view(np.uint8).reshape(-1)


def quant_tq1_0(x: np.ndarray) -> np.ndarray:
    """Ternary 1.6875 bpw (quantize_row_tq1_0_ref, ggml-quants.c:2043):
    d = amax, values rounded to {-1,0,1}, 5 trits per byte base-243
    (most-significant trit first), packed as ceil(q*256/243)."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    amax = np.abs(x).max(axis=1)
    d = amax.astype(np.float16).astype(F32)  # stored f16; id uses f32 amax
    id_ = np.where(amax != 0, F32(1) / np.where(amax != 0, amax, F32(1)), F32(0))
    xi = (roundf(x * id_[:, None]) + 1).astype(np.uint16)  # 0..2
    out = np.zeros(nb, dtype=DT[GGMLType.TQ1_0])
    out["d"] = amax.astype(np.float16)

    def pack5(t):  # [nb, 5, M] n-major trits → [nb, M] bytes
        q = np.zeros(t.shape[::2], np.uint16)
        for n in range(t.shape[1]):
            q = q * 3 + t[:, n, :]
        return ((q * 256 + 242) // 243).astype(np.uint8)

    out["qs"][:, :32] = pack5(xi[:, :160].reshape(nb, 5, 32))
    out["qs"][:, 32:] = pack5(xi[:, 160:240].reshape(nb, 5, 16))
    qh = xi[:, 240:].reshape(nb, 4, 4)  # [m, j] order; 4 trits + pad trit
    q = np.zeros((nb, 4), np.uint16)
    for m in range(4):
        q = q * 3 + qh[:, m, :]
    out["qh"] = ((q * 3 * 256 + 242) // 243).astype(np.uint8)
    return out.view(np.uint8).reshape(-1)


def quant_tq2_0(x: np.ndarray) -> np.ndarray:
    """Ternary 2.0625 bpw (quantize_row_tq2_0_ref, ggml-quants.c:2077)."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    amax = np.abs(x).max(axis=1)
    id_ = np.where(amax != 0, F32(1) / np.where(amax != 0, amax, F32(1)), F32(0))
    xi = ((roundf(x * id_[:, None]) + 1) & 3).astype(np.uint8)
    out = np.zeros(nb, dtype=DT[GGMLType.TQ2_0])
    out["d"] = amax.astype(np.float16)
    t = xi.reshape(nb, 2, 4, 32)  # (j-chunk, n, m)
    out["qs"] = (
        (t << (2 * np.arange(4, dtype=np.uint8))[None, None, :, None])
        .sum(axis=2, dtype=np.uint8)
        .reshape(nb, 64)
    )
    return out.view(np.uint8).reshape(-1)


_QUANT = {
    GGMLType.F32: quant_f32,
    GGMLType.F16: quant_f16,
    GGMLType.BF16: quant_bf16,
    GGMLType.Q4_0: quant_q4_0,
    GGMLType.Q4_1: quant_q4_1,
    GGMLType.Q5_0: quant_q5_0,
    GGMLType.Q5_1: quant_q5_1,
    GGMLType.Q8_0: quant_q8_0,
    GGMLType.Q8_1: quant_q8_1,
    GGMLType.Q8_K: quant_q8_K,
    GGMLType.Q2_K: quant_q2_K,
    GGMLType.Q3_K: quant_q3_K,
    GGMLType.Q4_K: quant_q4_K,
    GGMLType.Q5_K: quant_q5_K,
    GGMLType.Q6_K: quant_q6_K,
    GGMLType.TQ1_0: quant_tq1_0,
    GGMLType.TQ2_0: quant_tq2_0,
    GGMLType.IQ4_NL: quant_iq4_nl,
    GGMLType.IQ4_XS: quant_iq4_xs,
    GGMLType.IQ2_XXS: quant_iq2_xxs,
    GGMLType.IQ3_XXS: quant_iq3_xxs,
    GGMLType.IQ1_S: quant_iq1_s,
    GGMLType.IQ1_M: quant_iq1_m,
    GGMLType.IQ2_XS: quant_iq2_xs,
    GGMLType.IQ2_S: quant_iq2_s,
    GGMLType.IQ3_S: quant_iq3_s,
}


def quantize(x: np.ndarray, ggml_type: GGMLType) -> np.ndarray:
    """Quantize float32 → packed bytes (reference quantize_row_*_ref semantics).

    The k-quant scale searches run through the native C++ encoders when
    available (native/kquants.cpp — byte-exact twin, ~40× the numpy
    oracle's throughput; a 7B Q4_K requantize drops from ~2 h to minutes
    on this host). LLAMA_TPU_NO_NATIVE_QUANT=1 forces the oracle."""
    if ggml_type in (GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
                     GGMLType.Q5_K, GGMLType.Q6_K):
        try:
            from ..native.kquants_bind import quantize_native

            out = quantize_native(x, ggml_type)
            if out is not None:
                return out
        except Exception:  # noqa: BLE001 — oracle fallback below
            pass
    fn = _QUANT.get(ggml_type)
    if fn is None:
        raise NotImplementedError(f"quantize {ggml_type.name}")
    return fn(np.ascontiguousarray(x, dtype=np.float32))


# ---------------------------------------------------------------------------
# imatrix-weighted quantization (reference quantize_row_*_impl with
# quant_weights; weights w_j = qw_j * sqrt(sigma2 + x_j^2))
# ---------------------------------------------------------------------------


def _weighted_weights(x_rows: np.ndarray, qw: np.ndarray, sigma2: np.ndarray) -> np.ndarray:
    return qw * np.sqrt(sigma2[:, None] + x_rows * x_rows).astype(F32)


def make_qx_quants_weighted(x: np.ndarray, w: np.ndarray, nmax: int):
    """make_qx_quants with explicit weights (qw branch)."""
    x = _f32(x)
    G, n = x.shape
    aidx = np.argmax(np.abs(x), axis=1)
    maxv = x[np.arange(G), aidx]
    amax = np.abs(maxv)
    dead = amax < GROUP_MAX_EPS
    safe_max = np.where(dead, F32(1), maxv)

    def fit(iscale):
        l = np.clip(nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
        lf = l.astype(F32)
        sumlx = _seqsum((w * x) * lf)
        suml2 = _seqsum((w * lf) * lf)
        return l, sumlx, suml2

    iscale0 = (F32(-nmax) / safe_max).astype(F32)
    L, sumlx, suml2 = fit(iscale0)
    scale = np.where(suml2 != 0, sumlx / np.where(suml2 == 0, F32(1), suml2), F32(0)).astype(F32)
    best = scale * sumlx
    for is_ in range(-9, 10):
        if is_ == 0:
            continue
        iscale = (-(F32(nmax) + F32(0.1) * F32(is_)) / safe_max).astype(F32)
        l, sumlx_i, suml2_i = fit(iscale)
        better = (suml2_i > 0) & (sumlx_i * sumlx_i > best * suml2_i)
        L = np.where(better[:, None], l, L)
        new_scale = np.where(
            suml2_i == 0, F32(0), sumlx_i / np.where(suml2_i == 0, F32(1), suml2_i)
        )
        scale = np.where(better, new_scale, scale).astype(F32)
        best = np.where(better, new_scale * sumlx_i, best).astype(F32)
    L = (L + nmax).astype(np.uint8)
    L = np.where(dead[:, None], np.uint8(nmax), L)
    scale = np.where(dead, F32(0), scale)
    return L, scale


def quant_q4_0_weighted(x: np.ndarray, qw: np.ndarray, n_per_row: int) -> np.ndarray:
    """quantize_row_q4_0_impl with quant_weights (ggml-quants.c)."""
    x = _f32(x).reshape(-1, n_per_row)
    rows, _ = x.shape
    sigma2 = _seqsum(x * x) / F32(n_per_row)
    xg = x.reshape(-1, 32)
    qwg = np.broadcast_to(qw.reshape(1, -1), x.shape).reshape(-1, 32)
    sig = np.repeat(sigma2, n_per_row // 32)
    w = qwg * np.sqrt(sig[:, None] + xg * xg).astype(F32)
    L, d = make_qx_quants_weighted(xg, w, 8)
    out = np.zeros(len(xg), dtype=DT[GGMLType.Q4_0])
    out["d"] = d.astype(np.float16)
    out["qs"] = L[:, :16] | (L[:, 16:] << 4)
    return out.view(np.uint8).reshape(-1)


def quant_q6_K_weighted(x: np.ndarray, qw: np.ndarray, n_per_row: int) -> np.ndarray:
    """quantize_row_q6_K_impl with quant_weights: make_qx_quants(…, qw)."""
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    groups = x.reshape(-1, 16)
    qwg = np.broadcast_to(qw.reshape(1, -1), (nb * QK_K // n_per_row * n_per_row // QK_K, QK_K)) \
        if False else np.tile(qw.reshape(-1, QK_K), (nb * QK_K // qw.size, 1))
    wg = qwg.reshape(-1, 16).astype(F32)
    Lq, scales = make_qx_quants_weighted(groups, wg, 32)
    scales = scales.reshape(nb, 16)
    aidx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nb), aidx]
    max_abs = np.abs(max_scale)
    dead = max_abs < GROUP_MAX_EPS
    safe_max = np.where(dead, F32(1), max_scale)
    iscale = (F32(-128) / safe_max).astype(F32)
    d = (F32(1) / iscale).astype(np.float16)
    sc8 = np.minimum(127, nearest_int(iscale[:, None] * scales)).astype(np.int8)
    dd = _f32(d)[:, None] * sc8.astype(F32)
    xg = x.reshape(nb, 16, 16)
    dd_safe = np.where(dd == 0, F32(1), dd)
    L = np.clip(nearest_int(xg / dd_safe[:, :, None]), -32, 31) + 32
    L = np.where((dd == 0)[:, :, None], Lq.reshape(nb, 16, 16), L).astype(np.uint8)
    Lh = L.reshape(nb, 2, 128)
    q1, q2, q3, q4 = Lh[:, :, 0:32], Lh[:, :, 32:64], Lh[:, :, 64:96], Lh[:, :, 96:128]
    ql = np.concatenate(
        [(q1 & 0x0F) | ((q3 & 0x0F) << 4), (q2 & 0x0F) | ((q4 & 0x0F) << 4)], axis=2
    )
    qh = (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)
    out = np.zeros(nb, dtype=DT[GGMLType.Q6_K])
    out["ql"] = ql.reshape(nb, 128)
    out["qh"] = qh.reshape(nb, 64)
    out["scales"] = sc8
    out["d"] = d
    if dead.any():
        out[dead] = np.zeros((), dtype=DT[GGMLType.Q6_K])
    return out.view(np.uint8).reshape(-1)


def quantize_weighted(
    x: np.ndarray, ggml_type: GGMLType, qw: np.ndarray | None, n_per_row: int
) -> np.ndarray:
    """Quantize with optional imatrix importance weights (per-row-position).

    Weighted paths implemented for Q4_0 and Q6_K faithfully; Q4_K/Q5_K use
    the unweighted reference fit with imatrix-derived weights substituted in
    make_qkx2 (the reference uses make_qkx3/make_qp_quants — a close but not
    bit-identical fit). Other types fall back to the unweighted reference.
    """
    x = np.ascontiguousarray(x, dtype=np.float32)
    if qw is None:
        return quantize(x, ggml_type)
    qw = np.ascontiguousarray(qw, dtype=np.float32)
    if ggml_type in (GGMLType.Q4_0, GGMLType.Q4_K, GGMLType.Q5_K,
                     GGMLType.Q6_K):
        try:
            from ..native.kquants_bind import quantize_weighted_native

            out = quantize_weighted_native(x, qw, ggml_type, n_per_row)
            if out is not None:
                return out
        except Exception:  # noqa: BLE001 — oracle fallback below
            pass
    if ggml_type == GGMLType.Q4_0:
        return quant_q4_0_weighted(x, qw, n_per_row)
    if ggml_type == GGMLType.Q6_K:
        return quant_q6_K_weighted(x, qw, n_per_row)
    if ggml_type in (GGMLType.Q4_K, GGMLType.Q5_K):
        nmax = 15 if ggml_type == GGMLType.Q4_K else 31
        rows = x.reshape(-1, n_per_row)
        sigma2 = F32(2) * _seqsum(rows * rows) / F32(QK_K)
        xg = x.reshape(-1, 32)
        qwg = np.tile(qw.reshape(-1), rows.shape[0])[: xg.size].reshape(-1, 32)
        sig = np.repeat(sigma2, n_per_row // 32)
        weights = qwg * np.sqrt(sig[:, None] + xg * xg).astype(F32)
        # reuse the reference packing path with substituted weights
        return _quant_k4_with_weights(x, weights, ggml_type, nmax)
    return quantize(x, ggml_type)


def _quant_k4_with_weights(x, weights, ggml_type, nmax):
    x = _f32(x).reshape(-1, QK_K)
    nb = len(x)
    groups = x.reshape(-1, 32)
    if ggml_type == GGMLType.Q4_K:
        Lq, scales, mins = make_qkx2_quants(groups, weights, 15, -0.9, 0.05, 36, False)
    else:
        Lq, scales, mins = make_qkx2_quants(groups, weights, 31, -0.9, 0.05, 36, False)
    Lq = Lq.reshape(nb, 8, 32)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)
    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(
        max_scale > 0, F32(63) / np.where(max_scale > 0, max_scale, F32(1)), F32(0)
    ).astype(F32)
    inv_min = np.where(
        max_min > 0, F32(63) / np.where(max_min > 0, max_min, F32(1)), F32(0)
    ).astype(F32)
    ls = np.minimum(63, nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, nearest_int(inv_min[:, None] * mins)).astype(np.uint8)
    packed_scales = _pack_k4_scales(ls, lm)
    d = (max_scale / F32(63)).astype(np.float16)
    dmin = (max_min / F32(63)).astype(np.float16)
    sc, mi = unpack_scale_min_k4(packed_scales)
    dd = _f32(d)[:, None] * sc.astype(F32)
    dm = _f32(dmin)[:, None] * mi.astype(F32)
    xg = x.reshape(nb, 8, 32)
    dd_safe = np.where(dd == 0, F32(1), dd)
    L = np.clip(nearest_int((xg + dm[:, :, None]) / dd_safe[:, :, None]), 0, nmax)
    L = np.where((dd == 0)[:, :, None], Lq, L).astype(np.uint8)
    if ggml_type == GGMLType.Q4_K:
        Lp = L.reshape(nb, 4, 2, 32)
        out = np.zeros(nb, dtype=DT[GGMLType.Q4_K])
        out["d"] = d
        out["dmin"] = dmin
        out["scales"] = packed_scales
        out["qs"] = (Lp[:, :, 0, :] | (Lp[:, :, 1, :] << 4)).reshape(nb, 128)
        return out.view(np.uint8).reshape(-1)
    Lp = L.reshape(nb, 4, 2, 32)
    lo = Lp & 0x0F
    hi = (Lp >> 4) & 1
    out = np.zeros(nb, dtype=DT[GGMLType.Q5_K])
    out["d"] = d
    out["dmin"] = dmin
    out["scales"] = packed_scales
    out["qs"] = (lo[:, :, 0, :] | (lo[:, :, 1, :] << 4)).reshape(nb, 128)
    qh = np.zeros((nb, 32), dtype=np.uint8)
    for c in range(4):
        qh |= (hi[:, c, 0, :] << (2 * c)) | (hi[:, c, 1, :] << (2 * c + 1))
    out["qh"] = qh
    return out.view(np.uint8).reshape(-1)
