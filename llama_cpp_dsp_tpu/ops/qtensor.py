"""QTensor — TPU-device representation of GGUF block-quant weights.

Design: instead of translating the reference's per-type kernel zoo
(ggml/src/ggml-cuda/mmq.cuh, mmvq.cu), GGUF blocks are repacked at load time
into a small family of structure-of-arrays layouts that
(a) preserve the packed bit budget (decode is HBM-bandwidth-bound), and
(b) dequantize bit-identically to ggml's dequantize_row_* semantics
    (scales kept in their original f16/6-bit forms; effective scales are
    computed in f32 inside the kernel exactly like the reference).

Layouts (per 2-D weight [N, K], rows contiguous like ggml):
- kind=q8_0 : qs int8 [N, K],   d  f16 [N, K/32]
- kind=q4_0 : qs u8 [N, K/2],   d  f16 [N, K/32]                (x = d*(q-8))
- kind=q4_1 : qs u8 [N, K/2],   d,m f16 [N, K/32]               (x = d*q+m)
- kind=q5_0 : + qh u8 [N, K/8] high bits                        (x = d*(q-16))
- kind=q5_1 : + qh                                              (x = d*q+m)
- kind=q4_K : qs u8 [N, K/2], sc,mn u8 [N, S, 8], d,dmin f32 [N, S]
              (S = K/256; x = (d*sc)*q - (dmin*mn), 32-elem groups)
- kind=q5_K : + qh u8 [N, S, 32]  (bit g of byte l → element 32g+l)
- kind=q6_K : ql u8 [N, K/2], qh u8 [N, K/4], sc i8 [N, S, 16], d f32 [N, S]
              (x = d*sc*(q-32), 16-elem groups)
- kind=f32/f16/bf16: dense array.

Nibble packing is kept exactly as in the GGUF blocks; unpack rules live in
`dequant_*` (quant/jax_dequant.py) and in the Pallas kernels.

- kind=iq4_nl/iq4_xs: qs u8 [N, K/2], d f32/f16 [N, K/32] per-32 effective
              scales (x = d*kvalues_iq4nl[q]; IQ4_XS's 6-bit sub-scales are
              folded into d at load)

The grid-codebook / ternary kinds (IQ1-IQ3, TQ1/TQ2) repack at load into a
**table carrier**: every per-element value of these formats is
scale × v with v drawn from a per-kind set of ≤16 integers (the grid byte
magnitudes × sign; IQ1's ±0.125 delta folds in as 8·grid±1 — see
quant/ref_numpy.iq_int_decompose). The carrier stores the 4-bit index into
that table (IQ4_NL-shaped nibble field) plus per-group f32 scales, so these
kinds stream through the fused Pallas kernels at ~4.5-6 bpw instead of the
8.25 bpw q8 fallback, still decoding bit-identically to the reference
dequantize_row_* (ggml/src/ggml-quants.c).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, QK_K, GGMLType
from ..quant import ref_numpy as refq

# GGUF types that have a first-class packed device layout
PACKED_KINDS = {
    GGMLType.Q8_0,
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
}

# Integer value tables of the table-carrier kinds: the exact signed values
# iq_int_decompose emits (grid magnitudes {8,25,43} / {4..62} / {1..15 odd}
# × sign; IQ1: 8·grid±1; TQ: trits). Sorted; ≤16 entries ⇒ a nibble indexes
# them. The kernels re-materialize values with a static select chain
# (ops/pallas/qmm._table_map) — same pattern as IQ4_NL's codebook.
_T_IQ2 = (-43, -25, -8, 8, 25, 43)
_T_IQ3_XXS = (-62, -52, -44, -36, -28, -20, -12, -4, 4, 12, 20, 28, 36, 44, 52, 62)
_T_IQ3_S = (-15, -13, -11, -9, -7, -5, -3, -1, 1, 3, 5, 7, 9, 11, 13, 15)
_T_IQ1 = (-9, -7, -1, 1, 7, 9)
_T_TERNARY = (-1, 0, 1)
IQ_TABLES: dict[GGMLType, tuple[int, ...]] = {
    GGMLType.IQ2_XXS: _T_IQ2,
    GGMLType.IQ2_XS: _T_IQ2,
    GGMLType.IQ2_S: _T_IQ2,
    GGMLType.IQ3_XXS: _T_IQ3_XXS,
    GGMLType.IQ3_S: _T_IQ3_S,
    GGMLType.IQ1_S: _T_IQ1,
    GGMLType.IQ1_M: _T_IQ1,
    GGMLType.TQ1_0: _T_TERNARY,
    # TQ2_0's raw 2-bit field decodes (q&3)−1 ∈ {−1,0,1,2}: the encoder
    # never emits 3, but arbitrary packed bits are decodable (reference
    # dequantize_row_tq2_0) — keep the 2 so decode stays total
    GGMLType.TQ2_0: (-1, 0, 1, 2),
}
TABLE_KINDS = frozenset(IQ_TABLES)


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """Packed quantized 2-D tensor [N, K] (N = rows / output features)."""

    kind: GGMLType
    shape: tuple[int, int]
    arrays: dict[str, Any] = field(default_factory=dict)
    n_expert: int = 0  # >0: every field has a leading expert axis

    def tree_flatten(self):
        keys = tuple(sorted(self.arrays))
        return tuple(self.arrays[k] for k in keys), (self.kind, self.shape, keys, self.n_expert)

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, shape, keys, n_expert = aux
        return cls(kind, shape, dict(zip(keys, children)), n_expert)

    def __getitem__(self, k: str):
        return self.arrays[k]

    @property
    def nbytes(self) -> int:
        return sum(np.prod(a.shape) * a.dtype.itemsize for a in self.arrays.values())


# ---------------------------------------------------------------------------
# host-side repack: GGUF raw block bytes [N rows] → QTensor field arrays
# ---------------------------------------------------------------------------


def repack(raw: np.ndarray, kind: GGMLType, shape: tuple[int, ...]) -> QTensor:
    """raw: uint8 packed GGUF data for a row-major [N, K] tensor."""
    if len(shape) == 1:
        shape = (1, shape[0])
    assert len(shape) == 2, shape
    n, k = shape
    if kind == GGMLType.Q8_0:
        b = refq._blocks(raw, kind)
        return QTensor(kind, (n, k), {
            "qs": b["qs"].reshape(n, k),
            "d": b["d"].reshape(n, k // 32),
        })
    if kind in (GGMLType.Q4_0, GGMLType.Q4_1):
        b = refq._blocks(raw, kind)
        out = {"qs": b["qs"].reshape(n, k // 2), "d": b["d"].reshape(n, k // 32)}
        if kind == GGMLType.Q4_1:
            out["m"] = b["m"].reshape(n, k // 32)
        return QTensor(kind, (n, k), out)
    if kind in (GGMLType.Q5_0, GGMLType.Q5_1):
        b = refq._blocks(raw, kind)
        out = {
            "qs": b["qs"].reshape(n, k // 2),
            "qh": b["qh"].copy().view(np.uint8).reshape(n, k // 8),
            "d": b["d"].reshape(n, k // 32),
        }
        if kind == GGMLType.Q5_1:
            out["m"] = b["m"].reshape(n, k // 32)
        return QTensor(kind, (n, k), out)
    if kind in (GGMLType.Q4_K, GGMLType.Q5_K):
        b = refq._blocks(raw, kind)
        s = k // QK_K
        sc, mn = refq.unpack_scale_min_k4(b["scales"])  # [nb, 8] uint8
        out = {
            "qs": b["qs"].reshape(n, k // 2),
            "sc": sc.reshape(n, s, 8),
            "mn": mn.reshape(n, s, 8),
            "d": refq._f32(b["d"]).reshape(n, s),
            "dmin": refq._f32(b["dmin"]).reshape(n, s),
        }
        if kind == GGMLType.Q5_K:
            out["qh"] = b["qh"].reshape(n, s, 32)
        return QTensor(kind, (n, k), out)
    if kind == GGMLType.Q6_K:
        b = refq._blocks(raw, kind)
        s = k // QK_K
        return QTensor(kind, (n, k), {
            "ql": b["ql"].reshape(n, k // 2),
            "qh": b["qh"].reshape(n, k // 4),
            "sc": b["scales"].reshape(n, s, 16),
            "d": refq._f32(b["d"]).reshape(n, s),
        })
    if kind == GGMLType.Q2_K:
        b = refq._blocks(raw, kind)
        s = k // QK_K
        return QTensor(kind, (n, k), {
            "qs": b["qs"].reshape(n, k // 4),
            "sc": (b["scales"] & 0x0F).reshape(n, s, 16),
            "mn": (b["scales"] >> 4).reshape(n, s, 16),
            "d": refq._f32(b["d"]).reshape(n, s),
            "dmin": refq._f32(b["dmin"]).reshape(n, s),
        })
    if kind == GGMLType.Q3_K:
        b = refq._blocks(raw, kind)
        s = k // QK_K
        sc = refq.unpack_q3_K_scales(b["scales"])  # [nb,16] int32, -32 applied
        return QTensor(kind, (n, k), {
            "qs": b["qs"].reshape(n, k // 4),
            "hmask": b["hmask"].reshape(n, s, 32),
            "sc": sc.astype(np.int8).reshape(n, s, 16),
            "d": refq._f32(b["d"]).reshape(n, s),
        })
    if kind == GGMLType.IQ4_NL:
        b = refq._blocks(raw, kind)
        return QTensor(kind, (n, k), {
            "qs": b["qs"].reshape(n, k // 2),
            "d": b["d"].reshape(n, k // 32),
        })
    if kind == GGMLType.IQ4_XS:
        # per-32-group effective scales d·(ls−32) precomputed to f32 — after
        # that the layout is identical to IQ4_NL (the 16-byte/group qs order
        # matches, dequantize_row_iq4_xs ggml-quants.c)
        b = refq._blocks(raw, kind)
        nb = len(b)
        d = refq._f32(b["d"])
        ib = np.arange(8)
        ls_l = (b["scales_l"][:, ib // 2] >> (4 * (ib % 2))[None, :]) & 0x0F
        ls_h = (b["scales_h"][:, None] >> (2 * ib)[None, :]) & 3
        ls = (ls_l | (ls_h << 4)).astype(np.int32) - 32
        dl = d[:, None] * ls.astype(np.float32)  # [nb, 8]
        return QTensor(kind, (n, k), {
            "qs": b["qs"].reshape(n, k // 2),
            "d": dl.reshape(n, k // 32),
        })
    raise NotImplementedError(f"repack {kind.name}")


def from_gguf_tensor(
    raw: np.ndarray,
    kind: GGMLType,
    np_shape: tuple[int, ...],
    *,
    dense_dtype=np.float32,
) -> QTensor | np.ndarray:
    """Convert one GGUF tensor to a QTensor (packed kinds) or dense array.

    np_shape is the row-major numpy shape (reversed ggml ne).
    """
    if kind == GGMLType.F32:
        return refq.dequant_f32(raw).reshape(np_shape)
    if kind == GGMLType.F16:
        return np.ascontiguousarray(raw).view("<f2").reshape(np_shape)
    if kind == GGMLType.BF16:
        import ml_dtypes

        return np.ascontiguousarray(raw).view(ml_dtypes.bfloat16).reshape(np_shape)
    if kind in PACKED_KINDS and len(np_shape) in (1, 2):
        return repack(raw, kind, np_shape)
    # grid-codebook / ternary kinds: EXACT repack into the table carrier —
    # the integer payload (grid*sign; IQ1: 8*grid±1) indexes the ≤16-entry
    # IQ_TABLES set, stored as IQ4_NL-shaped nibbles + per-group f32 scales;
    # decode reproduces dequantize_row_* bit-for-bit
    # (quant/ref_numpy.iq_int_decompose)
    if kind in TABLE_KINDS and len(np_shape) == 2 and np_shape[-1] % 256 == 0:
        n, k = np_shape
        q, s, g = refq.iq_int_decompose(raw, kind)
        table = np.asarray(IQ_TABLES[kind], np.int8)
        u = np.searchsorted(table, q).astype(np.uint8)
        # exactness guard: every payload value must be a table entry
        assert (table[u] == q).all(), f"{kind.name}: payload outside table"
        ub = u.reshape(n, k // 32, 32)
        qs = ub[..., :16] | (ub[..., 16:] << 4)  # legacy nibble order
        return QTensor(kind, (n, k), {
            "qs": np.ascontiguousarray(qs.reshape(n, k // 2)),
            "d": s.reshape(n, k // g),
        })
    # kinds without a fused kernel (TQ*): requantize matrices to Q8_0 at
    # load so they still stream packed through the Pallas kernel (8.25 bpw
    # instead of 16 for the dense fallback); non-matrix tensors stay dense
    tr = GGML_TYPE_TRAITS.get(kind)
    if (tr is not None and len(np_shape) == 2 and np_shape[-1] % 32 == 0
            and kind not in (GGMLType.Q8_K,)):
        y = refq.dequantize(raw, kind).reshape(np_shape)
        return repack(refq.quantize(y.astype(np.float32), GGMLType.Q8_0),
                      GGMLType.Q8_0, np_shape)
    # fallback: dequantize to dense
    return refq.dequantize(raw, kind).reshape(np_shape).astype(dense_dtype)
