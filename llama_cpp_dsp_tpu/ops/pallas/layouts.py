"""Kernel-side layouts for packed quant tensors.

Two transforms make the Pallas kernels layout-clean on TPU:

1. **Plane split** — nibble/bit unpacking yields lane-contiguous elements:
   activations are split into matching planes (cheap reshapes of x) and the
   dot is computed per plane (Σ_k w_k·x_k is permutation-invariant when w
   and x are permuted together).

2. **Tile-transpose** — per K-tile, plane positions are reordered from
   [G, group] to [group, G] so that the per-32(16)-element scales broadcast
   with a lane-tile repeat (`pltpu.repeat`), the only repeat Mosaic lowers
   natively; element-order repeats/reshapes are unsupported shape casts.
   With the transposed order, position p uses scale s[p mod G] — exactly
   `pltpu.repeat(s, group)`.

The K-tile width is fixed at layout time (KernelWeights.tile_k) and the
runtime x preparation applies the identical permutation.

Field summary (W [N, K] row-major; P = K/2 plane positions for 4/5-bit):
- q8_0: qs i8 [N, K] (tile-transposed, group 32), s f32 [N, K/32]
- q4_0/q4_1: qs u8 [N, P] (planes split at 16, transposed, group 16),
  s (and m for q4_1) f32 [N, K/32]
- q4_K/q5_K: qs u8 [N, P] (planes split at 32, transposed, group 32),
  slo/shi/mlo/mhi f32 [N, K/64]; q5_K adds hlo/hhi bit-planes packed so
  bit r of byte b is position r·(P_tile/8)+b (unpack = repeat + lane-shift)
- q6_K: qla/qlb u8 [N, K/4] (quarter planes, transposed, group 16),
  qh u8 [N, K/4] (same order), s1..s4 f32 [N, K/64]
"""

from __future__ import annotations

import os

import jax
import ml_dtypes
import numpy as np

from ...gguf.constants import GGMLType
from ..qtensor import TABLE_KINDS, QTensor

# Per-group scale fields ship as bf16 by default: the kernels round the
# dequantized weights to bf16 before the MXU contraction anyway, so f32
# scales pay 2x the HBM bytes for precision the dot immediately discards
# (decode is HBM-bound; for Q4_K this is 1/3 of all weight-side bytes).
# Products are computed in f32 and rounded once. Q8_0 keeps f32 scales —
# it is the carrier layout for the bit-exact IQ/TQ repacks (qtensor.py).
# LLAMA_TPU_SCALE_F32=1 restores f32 everywhere (A/B and exactness runs).
_SCALE_DTYPE = (np.float32 if os.environ.get("LLAMA_TPU_SCALE_F32") == "1"
                else np.dtype(ml_dtypes.bfloat16))


def _scale(a: np.ndarray) -> np.ndarray:
    return a.astype(_SCALE_DTYPE)


@jax.tree_util.register_pytree_node_class
class KernelWeights:
    """Plane-split, tile-transposed arrays consumed by the Pallas kernels.

    `sections`: row counts of logically separate weights fused into one
    kernel call (QKV / gate+up fusion amortizes per-launch overhead)."""

    def __init__(self, kind: GGMLType, shape: tuple[int, int], arrays: dict,
                 tile_k: int, sections: tuple[int, ...] | None = None,
                 n_expert: int = 0):
        self.kind = kind
        self.shape = shape
        self.arrays = arrays
        self.tile_k = tile_k
        self.sections = sections
        self.n_expert = n_expert  # >0: every field has a leading expert axis

    def tree_flatten(self):
        keys = tuple(sorted(self.arrays))
        return tuple(self.arrays[k] for k in keys), (
            self.kind, self.shape, keys, self.tile_k, self.sections,
            self.n_expert,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, shape, keys, tile_k, sections, n_expert = aux
        return cls(kind, shape, dict(zip(keys, children)), tile_k, sections,
                   n_expert=n_expert)

    def expert(self, eid: int) -> "KernelWeights":
        """Static-index expert slice (dense-all prefill path)."""
        assert self.n_expert
        return KernelWeights(self.kind, self.shape,
                             {k: a[eid] for k, a in self.arrays.items()},
                             self.tile_k)

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in self.arrays.values())


def concat_qtensors(qts: list[QTensor]) -> QTensor | None:
    """Row-concat QTensors of identical kind/K (for QKV / gate-up fusion).
    Returns None when fusion isn't applicable."""
    kinds = {q.kind for q in qts}
    ks = {q.shape[1] for q in qts}
    if len(kinds) != 1 or len(ks) != 1 or any(q.n_expert for q in qts):
        return None
    keys = set(qts[0].arrays)
    if any(set(q.arrays) != keys for q in qts):
        return None
    n = sum(q.shape[0] for q in qts)
    arrays = {
        key: np.concatenate([np.asarray(q.arrays[key]) for q in qts], axis=0)
        for key in keys
    }
    return QTensor(qts[0].kind, (n, qts[0].shape[1]), arrays)


def default_tile_k(k: int, kind: GGMLType, want: int = 0) -> int:
    # bigger k-tiles = fewer, larger DMAs: 2048→4096(+37%) →7168 on ffn
    # K=14336 (+43%), and whole-K (nk=1, tile_n clamped to 256 in qmm)
    # another +4% on decode (tg64 95.9→100.0) — the pipeline is
    # DMA-latency-bound at small tiles. Whole-K is skipped for Q6_K whose
    # 4 byte-planes + f32 temporaries overflow 16MB VMEM at K=14336.
    # LLAMA_TPU_TILE_K_BIG overrides `want` for K ≥ 8192 only (e2e tiling
    # experiments without disturbing the tuned small-K kernels).
    import os

    if want == 0:
        want = 8192 if kind == GGMLType.Q6_K else 16384
    env = os.environ.get("LLAMA_TPU_TILE_K_BIG")
    if env and k >= 8192:
        want = int(env)
    mult = 256 if kind in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K,
                           GGMLType.Q2_K, GGMLType.Q3_K) else 32
    t = min(want, k)
    t = t // mult * mult
    while t > mult and k % t:
        t -= mult
    return max(t, mult)


def split_g(g: int) -> int:
    """Aligned prefix of a per-tile group count: G1 = ⌊G/128⌋·128.

    When G (scale lanes per k-tile) is not a 128 multiple, the in-kernel
    `pltpu.repeat` broadcast runs on a misaligned-width vector — measured
    on 13B Q4_0 (K=5120/13824 → G=160/432) at −13% decode throughput
    (LLAMA_TPU_ABLATE_SCALE=const ablation, round 4). The split-G layouts
    order each tile's plane positions [e·G1+g | e·G2+g'] so the expansion
    becomes one ALIGNED repeat over G1 (≥80% of lanes) plus a small
    misaligned tail, with per-piece dots (no lane concat). Returns 0 when
    no split applies (aligned already, G < 256, or G not sublane-clean)."""
    g1 = g // 128 * 128
    if g % 128 == 0 or g1 == 0 or g % 8:
        return 0
    return g1


def _tile_transpose_np(a: np.ndarray, tile_p: int, group: int,
                       split: bool = False) -> np.ndarray:
    """[N, P_total] → per tile_p chunk, reorder [G, group] → [group, G];
    with split=True and split_g(G) active, [group, G1] ++ [group, G2]."""
    n, p_total = a.shape
    g = tile_p // group
    t = a.reshape(n, p_total // tile_p, g, group)
    g1 = split_g(g) if split else 0
    if g1:
        parts = [t[:, :, :g1, :].transpose(0, 1, 3, 2),
                 t[:, :, g1:, :].transpose(0, 1, 3, 2)]
        return np.concatenate(
            [p.reshape(n, p_total // tile_p, -1) for p in parts], axis=2
        ).reshape(n, p_total).copy()
    return t.transpose(0, 1, 3, 2).reshape(n, p_total).copy()


def tile_transpose_x(x, tile_p: int, group: int, split: bool = False):
    """Runtime (jax) version of the same permutation for activations."""
    import jax.numpy as jnp

    shp = x.shape[:-1]
    p_total = x.shape[-1]
    g = tile_p // group
    t = x.reshape(*shp, p_total // tile_p, g, group)
    g1 = split_g(g) if split else 0
    if g1:
        parts = [t[..., :g1, :].swapaxes(-1, -2),
                 t[..., g1:, :].swapaxes(-1, -2)]
        return jnp.concatenate(
            [p.reshape(*shp, p_total // tile_p, -1) for p in parts], axis=-1
        ).reshape(*shp, p_total)
    return t.swapaxes(-1, -2).reshape(*shp, p_total)


def _pack_bits_transposed(bits: np.ndarray, tile_p: int) -> np.ndarray:
    """bits [N, P_total] (already in transposed position order) → packed
    [N, P_total/8]: within each tile, bit r of byte b = position r*(P/8)+b."""
    n, p_total = bits.shape
    pb = tile_p // 8
    b = bits.reshape(n, p_total // tile_p, 8, pb).astype(np.uint8)
    out = np.zeros((n, p_total // tile_p, pb), dtype=np.uint8)
    for r in range(8):
        out |= b[:, :, r, :] << r
    return out.reshape(n, p_total // 8)



def _as_tiles(a: np.ndarray, nk: int) -> np.ndarray:
    """[N, G_total] → [nk, N, G_total/nk] — narrow fields are blocked with a
    leading k-tile axis so every Pallas block keeps its full (lane) width."""
    n, g_total = a.shape
    gt = g_total // nk
    return np.ascontiguousarray(a.reshape(n, nk, gt).transpose(1, 0, 2))


_WIDE_KINDS = (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
               GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.IQ4_NL, GGMLType.IQ4_XS,
               *TABLE_KINDS)

# table-carrier kinds with per-16 native scales (the "s2" split-scale field)
TAB16_KINDS = (GGMLType.IQ2_XS, GGMLType.IQ2_S, GGMLType.IQ1_M)

# max padded-rows overhead (percent) _maybe_pad_rows will accept
PAD_ROWS_MAX_PCT = 1.0


def _maybe_pad_rows(qt: QTensor, tile_k: int) -> QTensor:
    """Zero-pad N to a wide-tile multiple when the overhead is <1%.

    The llama3 vocab head (N=128256) is not divisible by 512, which used to
    force 256-row tiles → 501 tiny grid cells at ~440 GB/s (DMA-latency
    bound, profiled). +0.6% padded rows buys 1024-row tiles at full stream
    rate. Every QTensor field carries N on axis 0, so padding is generic."""
    n = qt.shape[0]
    mults = ((1024, 512) if qt.kind in _WIDE_KINDS and tile_k <= 4096
             else (512,))
    for mult in mults:
        if n % mult == 0:
            return qt  # already wide-tileable at this multiple
        n_pad = -(-n // mult) * mult
        if n > mult and (n_pad - n) * 100 <= n * PAD_ROWS_MAX_PCT:
            arrays = {
                key: np.concatenate(
                    [np.asarray(a),
                     np.zeros((n_pad - n,) + a.shape[1:], a.dtype)], axis=0)
                for key, a in qt.arrays.items()
            }
            return QTensor(qt.kind, (n_pad, qt.shape[1]), arrays)
    return qt


def to_kernel_layout_experts(qt: QTensor, tile_k: int | None = None) -> KernelWeights:
    """Expert QTensor ([E, ...]-leading fields) → KernelWeights whose fields
    stack the per-expert kernel layouts on a leading E axis. The MoE kernels
    (qmm.qmm_expert_rows) index that axis with scalar-prefetched expert ids
    (the MUL_MAT_ID role, ggml/src/ggml.c ggml_mul_mat_id). No row padding:
    expert matrices keep their native N so all experts share one geometry."""
    assert qt.n_expert > 0
    per = []
    for e in range(qt.n_expert):
        sub = QTensor(qt.kind, qt.shape,
                      {k: np.asarray(a[e]) for k, a in qt.arrays.items()})
        per.append(_to_kernel_layout_padded(
            sub, tile_k or default_tile_k(qt.shape[1], qt.kind)))
    arrays = {
        key: np.stack([kw.arrays[key] for kw in per], axis=0)
        for key in per[0].arrays
    }
    return KernelWeights(qt.kind, qt.shape, arrays, per[0].tile_k,
                         n_expert=qt.n_expert)


def _k_pad_target(k: int, kind: GGMLType) -> int:
    """Zero-pad K to a multiple of 4096 when the per-tile scale-field lane
    count (K/32) would otherwise misalign from 128 lanes.

    Profiled on v5e (BENCH_FULL_r02 decode_device_breakdown): projections
    whose scale lanes are 128-aligned stream 652-674 GB/s; llama2-7b's
    ffn_down (K=11008 → 344 lanes) ran 438 GB/s and llama3-8b's (K=14336 →
    448) 515-530. Padding K=11008→12288 measured 629 GB/s — +11.6% bytes
    at +44% rate (7B tg128 140.2→144.7 t/s). K=14336→16384 (+14.3%)
    measured a net LOSS on 8B Q4_K (tg64 113.8→109.1): the bigger whole-K
    temp also degrades the VMEM-fit tiles. Gate: pad only when the byte
    overhead is ≤12.5%."""
    import os

    # LLAMA_TPU_KPAD_PCT widens the byte-overhead gate for A/B experiments
    # (default 12.5%: K=11008→12288 measured +44% rate at +11.6% bytes;
    # K=14336→16384 at +14.3% measured a net LOSS on 8B Q4_K tg64)
    max_pct = float(os.environ.get("LLAMA_TPU_KPAD_PCT", 12.5))
    if k >= 8192 and k % 4096:
        pad = -(-k // 4096) * 4096
        if (pad - k) * 100 <= k * max_pct:
            return pad
    return k


def _pad_cols(qt: QTensor, k_pad: int) -> QTensor:
    """Zero-pad every field's K-scaled axis (zero blocks dequantize to 0:
    all scale/min fields are zero, so nibble garbage can't leak)."""
    k = qt.shape[1]
    if k_pad == k:
        return qt
    lead = 1 if qt.n_expert else 0
    arrays = {}
    for key, a in qt.arrays.items():
        a = np.asarray(a)
        eff = a.ndim - lead
        axis = a.ndim - 1 if eff == 2 else a.ndim - 2  # [.,N,Kc] | [.,N,S,c]
        new = a.shape[axis] * k_pad // k
        assert a.shape[axis] * k_pad % k == 0, (key, a.shape, k, k_pad)
        pad_widths = [(0, 0)] * a.ndim
        pad_widths[axis] = (0, new - a.shape[axis])
        arrays[key] = np.pad(a, pad_widths)
    return QTensor(qt.kind, (qt.shape[0], k_pad), arrays, qt.n_expert)


def permute_rows(qt: QTensor, perm: np.ndarray) -> QTensor:
    """Row-reorder a QTensor (every field carries N on axis 0). Rows are
    independent blocks in all GGUF layouts, so this is exact."""
    arrays = {key: np.ascontiguousarray(np.asarray(a)[perm])
              for key, a in qt.arrays.items()}
    return QTensor(qt.kind, (len(perm), qt.shape[1]), arrays)


def pad_rows_to(qt: QTensor, n_pad: int) -> QTensor:
    """Zero-pad a QTensor to n_pad rows (zero blocks dequantize to 0)."""
    n = qt.shape[0]
    if n_pad == n:
        return qt
    arrays = {
        key: np.concatenate(
            [np.asarray(a), np.zeros((n_pad - n,) + a.shape[1:], a.dtype)],
            axis=0)
        for key, a in qt.arrays.items()
    }
    return QTensor(qt.kind, (n_pad, qt.shape[1]), arrays)


def to_kernel_layout(qt: QTensor, tile_k: int | None = None) -> KernelWeights:
    n_logical, _ = qt.shape
    qt = _pad_cols(qt, _k_pad_target(qt.shape[1], qt.kind))
    tile_k_pick = tile_k or default_tile_k(qt.shape[1], qt.kind)
    qt = _maybe_pad_rows(qt, tile_k_pick)
    kw = _to_kernel_layout_padded(qt, tile_k_pick)
    kw.shape = (n_logical, kw.shape[1])  # logical rows; arrays may be padded
    return kw


def _to_kernel_layout_padded(qt: QTensor, tile_k: int | None = None) -> KernelWeights:
    n, k = qt.shape
    kind = qt.kind
    tile_k = tile_k or default_tile_k(k, kind)

    nk = k // tile_k
    if kind == GGMLType.Q8_0:
        g = k // qt["d"].shape[-1]  # 32, or 16 for exact-IQ repacks
        qs = _tile_transpose_np(np.ascontiguousarray(qt["qs"]), tile_k, g,
                                split=True)
        s = _as_tiles(qt["d"].astype(np.float32), nk)
        return KernelWeights(kind, (n, k), {"qs": qs, "s": s}, tile_k)

    if kind in TABLE_KINDS:
        # table carrier (IQ1/IQ2/IQ3/TQ): IQ4_NL's plane-16 nibble geometry;
        # scales are per-32 ("s", expand ×16 in the body) or per-16 ("s2":
        # [lo-half | hi-half] per-32-block scales lane-concatenated per
        # k-tile, sliced back out in the body like Q4_K's sc4 halves)
        tile_p = tile_k // 2
        d = qt["d"].astype(np.float32)
        g = k // d.shape[-1]
        # split-G only for the per-32 ("s") carriers — tab16's split-scale
        # field has its own half-ordering the split would scramble
        qs = _tile_transpose_np(np.ascontiguousarray(qt["qs"]), tile_p, 16,
                                split=(g == 32))
        out = {"qs": qs}
        if g == 32:
            out["s"] = _as_tiles(_scale(d), nk)
        else:  # g == 16
            out["s2"] = _scale(np.concatenate(
                [_as_tiles(np.ascontiguousarray(d[:, 0::2]), nk),
                 _as_tiles(np.ascontiguousarray(d[:, 1::2]), nk)], axis=2))
        return KernelWeights(kind, (n, k), out, tile_k)

    if kind in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.IQ4_NL,
                GGMLType.IQ4_XS):
        # IQ4 kinds share q4_0's plane-16 layout; scales are already the
        # per-32 effective values (see qtensor.repack) and the nonlinear
        # codebook is applied inside the kernel body
        tile_p = tile_k // 2
        qs = _tile_transpose_np(np.ascontiguousarray(qt["qs"]), tile_p, 16,
                                split=True)
        out = {"qs": qs, "s": _as_tiles(_scale(qt["d"].astype(np.float32)), nk)}
        if kind == GGMLType.Q4_1:
            out["m"] = _as_tiles(_scale(qt["m"].astype(np.float32)), nk)
        return KernelWeights(kind, (n, k), out, tile_k)

    if kind in (GGMLType.Q5_0, GGMLType.Q5_1):
        # q4_0's plane-16 layout + two bit-planes for the 5th bit: the qh
        # u32's bits 0..15 gate the lo plane, 16..31 the hi plane
        # (dequantize_row_q5_0, ggml-quants.c)
        tile_p = tile_k // 2
        qs = _tile_transpose_np(np.ascontiguousarray(qt["qs"]), tile_p, 16)
        qh = qt["qh"].reshape(n, k // 32, 4)
        sh = np.arange(8, dtype=np.uint8)
        bits = ((qh[..., None] >> sh) & 1).reshape(n, k // 32, 32)
        lo_bits = np.ascontiguousarray(bits[:, :, :16].reshape(n, k // 2))
        hi_bits = np.ascontiguousarray(bits[:, :, 16:].reshape(n, k // 2))
        lo_t = _tile_transpose_np(lo_bits.astype(np.uint8), tile_p, 16)
        hi_t = _tile_transpose_np(hi_bits.astype(np.uint8), tile_p, 16)
        out = {
            "qs": qs,
            "s": _as_tiles(_scale(qt["d"].astype(np.float32)), nk),
            "hlo": _as_tiles(_pack_bits_transposed(lo_t, tile_p), nk),
            "hhi": _as_tiles(_pack_bits_transposed(hi_t, tile_p), nk),
        }
        if kind == GGMLType.Q5_1:
            out["m"] = _as_tiles(_scale(qt["m"].astype(np.float32)), nk)
        return KernelWeights(kind, (n, k), out, tile_k)

    if kind in (GGMLType.Q4_K, GGMLType.Q5_K):
        tile_p = tile_k // 2
        s_groups = qt["d"][:, :, None] * qt["sc"].astype(np.float32)  # [N,S,8]
        m_groups = qt["dmin"][:, :, None] * qt["mn"].astype(np.float32)
        # the four per-group scale planes pack along lanes into one field so
        # the minor dim is 128 (4×tile_k/64) — narrow f32 minors make XLA
        # choose a transposed layout and insert a conversion copy per call,
        # which costs more HBM traffic than the weights themselves
        sc4 = _scale(np.concatenate([
            _as_tiles(np.ascontiguousarray(s_groups[:, :, 0::2].reshape(n, -1)), nk),
            _as_tiles(np.ascontiguousarray(s_groups[:, :, 1::2].reshape(n, -1)), nk),
            _as_tiles(np.ascontiguousarray(m_groups[:, :, 0::2].reshape(n, -1)), nk),
            _as_tiles(np.ascontiguousarray(m_groups[:, :, 1::2].reshape(n, -1)), nk),
        ], axis=2))
        out = {
            "qs": _tile_transpose_np(np.ascontiguousarray(qt["qs"]), tile_p, 32),
            "sc4": sc4,
        }
        if kind == GGMLType.Q5_K:
            qh = qt["qh"]  # [N, S, 32]; bit g of byte l → element 32g+l
            g8 = np.arange(8)
            bits = (qh[:, :, None, :] >> g8[None, None, :, None]) & 1  # [N,S,8,32]
            lo_bits = bits[:, :, 0::2, :].reshape(n, -1)  # plane order [N, K/2]
            hi_bits = bits[:, :, 1::2, :].reshape(n, -1)
            lo_t = _tile_transpose_np(lo_bits.astype(np.uint8), tile_p, 32)
            hi_t = _tile_transpose_np(hi_bits.astype(np.uint8), tile_p, 32)
            out["hlo"] = _as_tiles(_pack_bits_transposed(lo_t, tile_p), nk)
            out["hhi"] = _as_tiles(_pack_bits_transposed(hi_t, tile_p), nk)
        return KernelWeights(kind, (n, k), out, tile_k)

    if kind in (GGMLType.Q2_K, GGMLType.Q3_K):
        # Q6_K's quarter-plane geometry, but ONE byte field serves all four
        # shift-planes ((qs >> 2p) & 3); 16-elem group scales pack as four
        # per-plane lane-concatenated planes like Q6_K's sc4
        # (dequantize_row_q2_K/q3_K, ggml-quants.c)
        tile_p = tile_k // 4
        qs = _tile_transpose_np(np.ascontiguousarray(qt["qs"]), tile_p, 16)
        s_groups = qt["d"][:, :, None] * qt["sc"].astype(np.float32)
        sh = s_groups.reshape(n, k // 128, 8)
        plane_pairs = [(0, 1), (2, 3), (4, 5), (6, 7)]
        sc4 = _scale(np.concatenate([
            _as_tiles(np.ascontiguousarray(sh[:, :, list(p)].reshape(n, -1)), nk)
            for p in plane_pairs
        ], axis=2))
        out = {"qs": qs, "sc4": sc4}
        if kind == GGMLType.Q2_K:
            m_groups = qt["dmin"][:, :, None] * qt["mn"].astype(np.float32)
            mh = m_groups.reshape(n, k // 128, 8)
            out["mn4"] = _scale(np.concatenate([
                _as_tiles(np.ascontiguousarray(mh[:, :, list(p)].reshape(n, -1)), nk)
                for p in plane_pairs
            ], axis=2))
        else:
            # hmask bit-planes: element j of plane p of half h ↔ byte j,
            # bit 4h+p (quantize_row_q3_K_ref hm layout)
            hm = qt["hmask"]  # [N, S, 32]
            for p in range(4):
                bits = np.stack(
                    [(hm >> (4 * h + p)) & 1 for h in range(2)], axis=2
                )  # [N, S, 2, 32]
                bits = bits.reshape(n, k // 4).astype(np.uint8)
                bt = _tile_transpose_np(bits, tile_p, 16)
                out[f"h{p + 1}"] = _as_tiles(_pack_bits_transposed(bt, tile_p), nk)
        return KernelWeights(kind, (n, k), out, tile_k)

    if kind == GGMLType.Q6_K:
        tile_p = tile_k // 4
        ql = qt["ql"].reshape(n, -1, 2, 32)  # [N, K/128, {a,b}, 32]
        qla = np.ascontiguousarray(ql[:, :, 0, :].reshape(n, k // 4))
        qlb = np.ascontiguousarray(ql[:, :, 1, :].reshape(n, k // 4))
        s_groups = qt["d"][:, :, None] * qt["sc"].astype(np.float32)  # [N,S,16]
        sh = s_groups.reshape(n, k // 128, 8)
        out = {
            "qla": _tile_transpose_np(qla, tile_p, 16),
            "qlb": _tile_transpose_np(qlb, tile_p, 16),
            # qh bytes follow the qla/qlb byte positions (one byte per 4 elems,
            # aligned with the 32-byte plane chunks) but gate 16-groups: the
            # shifts differ per half-chunk, so split qh into per-plane 2-bit
            # fields at load instead:
        }
        qh = qt["qh"]  # [N, K/4]
        h1 = (qh & 3).astype(np.uint8)
        h2 = ((qh >> 2) & 3).astype(np.uint8)
        h3 = ((qh >> 4) & 3).astype(np.uint8)
        h4 = ((qh >> 6) & 3).astype(np.uint8)
        # all four 2-bit plane-high fields share one position ordering, so
        # they pack fully into ONE byte field (native density, one DMA)
        qh4 = np.ascontiguousarray(h1 | (h2 << 2) | (h3 << 4) | (h4 << 6))
        out["qh4"] = _tile_transpose_np(qh4, tile_p, 16)
        out["sc4"] = _scale(np.concatenate([
            _as_tiles(
                np.ascontiguousarray(sh[:, :, list(idx)].reshape(n, -1)), nk
            )
            for idx in [(0, 1), (2, 3), (4, 5), (6, 7)]
        ], axis=2))
        return KernelWeights(kind, (n, k), out, tile_k)

    raise NotImplementedError(f"kernel layout for {kind.name}")


# -- activation plane splits + tile transpose (jax) ---------------------------


def prepare_x(x, kind: GGMLType, tile_k: int, q8_group: int = 32):
    """Split x into format planes (tile-transposed, bf16, interleaved into
    one field per k-tile) plus per-group f32 sums ("xs") that the kernels
    dot against the folded-out offsets. The sum planes concatenate along
    lanes in the SAME order as the packed scale fields (sc4/mn4), so each
    offset fold is a single GEMM against a slice of the scale block.
    q8_group: scale group of a q8_0 layout (16 for exact-IQ repacks).

    Each field is produced by ONE reshape→transpose→reshape (the composed
    plane-split + tile-transpose + per-tile interleave permutation): the
    earlier slice/transpose/concat chain cost ~11 XLA ops per kernel call,
    ~0.6 ms/step of pure dispatch overhead on the decode profile."""
    import jax.numpy as jnp

    xb = x.astype(jnp.bfloat16)
    xf = x.astype(jnp.float32)
    shp = x.shape[:-1]
    L = len(shp)
    b = 1
    for d in shp:
        b *= d
    k = x.shape[-1]
    nk = k // tile_k
    if kind == GGMLType.Q8_0:
        return (tile_transpose_x(xb, tile_k, q8_group, split=True),)

    def _xs(block: int, planes_shape, perm, out_lanes):
        # [b, nk, ...] group sums → [nk, b, lanes] matching the scale field
        s = xf.reshape(b, nk, *planes_shape, block).sum(-1)
        return s.transpose(1, 0, *perm).reshape(nk, b, out_lanes)

    if kind in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
                GGMLType.IQ4_NL, GGMLType.IQ4_XS) or kind in TABLE_KINDS:
        # 32-blocks split lo/hi at 16; plane group 16, G = tile_k/32.
        # tile layout: [lo | hi], plane position e*G + g (g = 32-block idx).
        # The whole permutation is ONE last-two-dims swap: flattening
        # (t, h·16+e, g) gives h·TP + e·G + g, exactly the interleaved
        # plane layout. (A combined 5-D transpose spelling lowered to the
        # same op count but +50% device time — keep the minor-2 swap form,
        # which XLA:TPU lowers as a single clean relayout.)
        g = tile_k // 32
        # split-G position ordering for the kinds whose kernel bodies run
        # the per-piece aligned expand (q5's bit-planes and tab16's split
        # scales keep the contiguous order)
        do_split = kind not in (GGMLType.Q5_0, GGMLType.Q5_1, *TAB16_KINDS)
        x2 = tile_transpose_x(xb, tile_k, 32, split=do_split)
        if kind not in (GGMLType.Q5_0, GGMLType.Q5_1):
            # q4_0/q4_1 fold offsets against IN-KERNEL group sums
            # (qmm._xsum_groups); tables have no affine offset at all
            return (x2,)
        xs = _xs(32, (g,), (2,), g)
        return (x2, xs)
    if kind in (GGMLType.Q4_K, GGMLType.Q5_K):
        # 64-blocks split lo/hi at 32; plane group 32, G = tile_k/64:
        # (t, h·32+e, g) flattens to h·TP + e·G + g — one minor-2 swap
        g = tile_k // 64
        x2 = xb.reshape(*shp, nk, g, 64).swapaxes(-1, -2).reshape(*shp, k)
        # xs2 lanes = [lo sums | hi sums], g-sequential per half (sc4 order)
        xs2 = _xs(32, (g, 2), (3, 2), 2 * g)
        return (x2, xs2)
    if kind in (GGMLType.Q6_K, GGMLType.Q2_K, GGMLType.Q3_K):
        # 128-blocks split into 4 quarter-planes of 32; plane group 16,
        # G = tile_k/64 groups per plane tile; group idx = (c128, e_hi).
        # Two minor-2 swaps: (t,c128,[q,ehi,elo]) → (t,[q,ehi,elo],c128)
        # → regroup (t,q,ehi,[elo·G2+c128]) → (t,q,[elo·G2+c128],ehi),
        # flattening to q·TP4 + elo·G + c128·2 + ehi — the quarter-plane
        # interleave with group order (c128, ehi)
        g2 = tile_k // 128  # 128-blocks per tile
        x4 = (xb.reshape(*shp, nk, g2, 128).swapaxes(-1, -2)
              .reshape(*shp, nk, 4, 2, 16 * g2).swapaxes(-1, -2)
              .reshape(*shp, k))
        # xs4 lanes = 4 plane-sum planes, (c128, e_hi)-sequential (sc4 order)
        xs4 = _xs(16, (g2, 4, 2), (3, 2, 4), 4 * (tile_k // 64))
        return (x4, xs4)
    raise NotImplementedError(kind)
