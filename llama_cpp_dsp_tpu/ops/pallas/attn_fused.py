"""Fused decode attention step: qkv-projection + rope + KV-cache write +
flash attention in ONE pallas_call.

The unfused decode layer issues (per layer, per token) a qkv qmm kernel, an
XLA rope fusion, two cache dynamic-update-slices, and a flash-decode kernel
— every boundary drains the weight-streaming DMA pipeline and pays an XLA
fusion-launch. This kernel chains them on a single 1-D grid
(phase-chained grid): phase A streams the fused-qkv weight n-tiles
(BlockSpec pipeline, same `_q4_tile_dot` body as qmm); phase B (one program
per batch row) ropes q/k from VMEM scratch, DMAs the new k/v row into the
cache (input_output_aliased operands — the caller's `cache.write` is
subsumed), and runs the all-heads chunked online-softmax stream over the
cached rows (the `_decode_kernel_allh` body), with the NEW row's
contribution computed from the still-in-VMEM roped values so the stream
never has to read back the row it just wrote.

Role of the reference's fattn decode path + ggml_rope + cache k/v cpy
fusion opportunity (ggml/src/ggml-cuda/fattn.cu keeps them separate ops;
on TPU the dispatch/pipeline-drain overhead is the scarce resource, not
occupancy, so the fusion boundary sits differently).

Scope (the tg headline shapes): T=1 decode, head_dim == 128, NORM-mode
full-dim rope, Q4_0 fused-qkv whole-K kernel layout, contiguous bf16
per-layer KV cache, B ≤ 8. Anything else falls back to the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...gguf.constants import GGMLType
from .layouts import KernelWeights, prepare_x
from .qmm import _interpret_mode, _largest_tile, _q4_tile_dot

F32 = jnp.float32
BF16 = jnp.bfloat16
NEG_INF = float("-inf")


def _roll_lanes(x, shift: int):
    if _interpret_mode():
        return jnp.roll(x, shift, axis=-1)
    # pltpu.roll rejects negative shifts; roll(-s) == roll(d - s)
    return pltpu.roll(x, shift % x.shape[-1], axis=x.ndim - 1)


def _rope_norm(x, cs, sn):
    """NORM-mode rope on lane-interleaved pairs: lane 2i pairs with 2i+1.
    cs/sn are per-lane (caller duplicates each pair angle to both lanes).
    partner(2i) = x[2i+1], partner(2i+1) = x[2i]; sign -1 on even lanes."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    even = (lane % 2) == 0
    partner = jnp.where(even, _roll_lanes(x, -1), _roll_lanes(x, 1))
    return x * cs + jnp.where(even, -partner, partner) * sn


def _attn_kernel(
    start_ref,  # SMEM [B]
    len_ref,  # SMEM [B] (INCLUDING the new row)
    wp_ref,  # SMEM [B] cache row to write (== length-1 for active slots;
    # >= S for idle engine slots, whose write must drop — engine offs)
    x2_ref,  # VMEM [TB, 2K] interleaved activation planes (prepare_x)
    qs_ref,  # VMEM [TN, K/2] qkv weight nibble tile
    s_ref,  # VMEM [1, TN, G] qkv weight scales
    cs_ref,  # VMEM [1, 1, D] per-lane rope cos (blocked per phase-B row)
    sn_ref,  # VMEM [1, 1, D] per-lane rope sin
    k_in,  # ANY [B, Hkv, S, D] bf16 (aliased with k_out)
    v_in,  # ANY
    o_ref,  # VMEM [1, Hkv, rep, D] f32 out block (phase-B rows)
    k_out,  # ANY (same buffer as k_in)
    v_out,  # ANY
    qkv_rows,  # VMEM scratch [TB, R, D] f32 (R = (H+2Hkv) rows of D
    # lanes; TB leading so the phase-B per-b read indexes a LEADING dim —
    # dynamic sublane indices are not statically 8-aligned for Mosaic).
    # Measured on chip vs the [R, TB, D] + one-hot-select alternative:
    # this layout is +5 t/s on 7B tg128 (151.4 vs 146.0) — the sublane
    # stores it implies lower better than the select read costs.
    kn_scr,  # VMEM scratch [Hkv, 8, D] bf16 — aligned write slab (Mosaic
    # DMA slices must be 8-row aligned in the sublane dim, so the single
    # new row rides a read-splice-write of its covering 8-row slab)
    vn_scr,  # VMEM scratch [Hkv, 8, D] bf16
    k_buf,  # VMEM scratch [NB, Hkv, CHUNK, D] bf16 (NB=1 when the whole
    # capacity is one chunk — double-buffering buys nothing and the 2.6MB
    # freed keeps the phase-A weight pipeline fully double-buffered)
    v_buf,  # VMEM scratch [NB, Hkv, CHUNK, D] bf16
    sem,  # DMA sems [2, 2]
    wsem,  # DMA sems [2] (row writes)
    *,
    nn: int,
    tn: int,
    chunk: int,
    hq: int,
    hkv: int,
    bsz: int,
    scale: float,
    softcap: float,
    s_total: int,
):
    i = pl.program_id(0)
    d = qkv_rows.shape[-1]
    rpt = tn // d

    @pl.when(i < nn)
    def _():  # phase A: one qkv n-tile → scratch rows
        s = s_ref[0].astype(F32) if s_ref.dtype == BF16 else s_ref[0]
        tile = _q4_tile_dot(x2_ref[...], qs_ref[...], s)  # [TB, tn]
        for j in range(rpt):
            qkv_rows[:, i * rpt + j, :] = tile[:, j * d:(j + 1) * d]

    @pl.when(i >= nn)
    def _():  # phase B: rope + cache write + flash stream for batch row b
        b = i - nn
        length = len_ref[b]
        start = start_ref[b]
        pos = length - 1  # cache row of the token decoded this step
        wp = wp_ref[b]  # row the engine wants written (capacity = drop)
        rep = hq // hkv

        valid = (wp >= 0) & (wp < s_total)  # idle slots must not write
        safe_wp = jnp.where(valid, wp, 0)
        slab0 = pl.multiple_of((safe_wp // 8) * 8, 8)
        r_in = safe_wp - slab0  # new row's index within the 8-row slab

        @pl.when(valid)
        def _():  # prefetch the covering slab; latency hides under rope
            pltpu.make_async_copy(
                k_in.at[b, :, pl.ds(slab0, 8), :], kn_scr, wsem.at[0]
            ).start()
            pltpu.make_async_copy(
                v_in.at[b, :, pl.ds(slab0, 8), :], vn_scr, wsem.at[1]
            ).start()

        rows = qkv_rows[b]  # [R, D] f32 (dynamic LEADING index)
        cs = cs_ref[0].astype(F32)  # [1, D] — block already selects b
        sn = sn_ref[0].astype(F32)
        q = _rope_norm(rows[:hq], cs, sn)
        k = _rope_norm(rows[hq:hq + hkv], cs, sn)
        v = rows[hq + hkv:]
        # round through bf16 so the in-VMEM new-row contribution matches
        # what future steps will read back from the bf16 cache
        kq = k.astype(BF16)
        vq = v.astype(BF16)

        @pl.when(valid)
        def _():  # splice the new row into the slab, write the slab back.
            # Rows != r_in are written back byte-identical, so the chunk
            # stream racing over the same region still reads valid data.
            pltpu.make_async_copy(
                k_in.at[b, :, pl.ds(slab0, 8), :], kn_scr, wsem.at[0]
            ).wait()
            pltpu.make_async_copy(
                v_in.at[b, :, pl.ds(slab0, 8), :], vn_scr, wsem.at[1]
            ).wait()
            # splice via select — a dynamic sublane store is not
            # statically alignment-provable for Mosaic
            rowsel = jax.lax.broadcasted_iota(
                jnp.int32, (hkv, 8, d), 1) == r_in
            kn_scr[...] = jnp.where(rowsel, kq[:, None, :], kn_scr[...])
            vn_scr[...] = jnp.where(rowsel, vq[:, None, :], vn_scr[...])
            pltpu.make_async_copy(
                kn_scr, k_out.at[b, :, pl.ds(slab0, 8), :], wsem.at[0]
            ).start()
            pltpu.make_async_copy(
                vn_scr, v_out.at[b, :, pl.ds(slab0, 8), :], wsem.at[1]
            ).start()

        qs = (q.astype(BF16).astype(F32) * scale).reshape(hkv, rep, d)
        # online-softmax init = the NEW row's contribution (still in VMEM)
        s_new = jnp.sum(qs * kq.astype(F32)[:, None, :], axis=-1)  # [Hkv,rep]
        if softcap:
            s_new = jnp.tanh(s_new / softcap) * softcap
        hr = hkv * rep
        m0 = s_new.reshape(hr, 1)
        l0 = jnp.ones((hr, 1), F32)
        acc0 = jnp.broadcast_to(
            vq.astype(F32)[:, None, :], (hkv, rep, d)).reshape(hr, d)

        q2 = qs.reshape(hr, d)
        n_bufs = k_buf.shape[0]
        n_chunks = pl.cdiv(pos, chunk)  # stream rows [start, pos) only
        first = start // chunk

        def k_dma(slot, ci):
            return pltpu.make_async_copy(
                k_in.at[b, :, pl.ds(ci * chunk, chunk), :],
                k_buf.at[slot], sem.at[slot, 0])

        def v_dma(slot, ci):
            return pltpu.make_async_copy(
                v_in.at[b, :, pl.ds(ci * chunk, chunk), :],
                v_buf.at[slot], sem.at[slot, 1])

        @pl.when(first < n_chunks)
        def _():
            k_dma(first % n_bufs, first).start()
            v_dma(first % n_bufs, first).start()

        def body(ci, carry):
            m, l, acc = carry
            slot = ci % n_bufs

            if n_bufs > 1:  # static: double-buffered prefetch
                @pl.when(ci + 1 < n_chunks)
                def _():
                    k_dma((ci + 1) % n_bufs, ci + 1).start()
                    v_dma((ci + 1) % n_bufs, ci + 1).start()
            else:  # static: NB==1 implies n_chunks <= 1, but stay correct
                # if a later change lets multiple chunks through: serialize
                @pl.when(ci != first)
                def _():
                    k_dma(0, ci).start()
                    v_dma(0, ci).start()

            k_dma(slot, ci).wait()
            v_dma(slot, ci).wait()

            sc = jnp.concatenate([
                jax.lax.dot_general(
                    q2[h * rep:(h + 1) * rep],
                    k_buf[slot, h].astype(F32),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=F32,
                    precision=jax.lax.Precision.HIGHEST,
                ) for h in range(hkv)
            ], axis=0)  # [HR, CHUNK]
            if softcap:
                sc = jnp.tanh(sc / softcap) * softcap
            col = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1)
            sc = jnp.where((col < pos) & (col >= start), sc, NEG_INF)

            m_new = jnp.maximum(m, jnp.max(sc, axis=1, keepdims=True))
            p = jnp.exp(sc - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            pv = jnp.concatenate([
                jax.lax.dot_general(
                    p[h * rep:(h + 1) * rep], v_buf[slot, h].astype(F32),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=F32,
                    precision=jax.lax.Precision.HIGHEST,
                ) for h in range(hkv)
            ], axis=0)
            acc = acc * alpha + pv
            return m_new, l, acc

        m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).reshape(hkv, rep, d)

        @pl.when(valid)
        def _():
            pltpu.make_async_copy(
                kn_scr, k_out.at[b, :, pl.ds(slab0, 8), :], wsem.at[0]
            ).wait()
            pltpu.make_async_copy(
                vn_scr, v_out.at[b, :, pl.ds(slab0, 8), :], wsem.at[1]
            ).wait()


@functools.partial(
    jax.jit,
    static_argnames=("hq", "hkv", "scale", "softcap", "tn", "chunk",
                     "interpret"),
)
def _attn_fused_call(starts, lengths, write_pos, x2, qs, s, cs, sn,
                     k_cache, v_cache,
                     *, hq, hkv, scale, softcap, tn, chunk, interpret):
    bsz, hkv_c, s_total, d = k_cache.shape
    tb = x2.shape[0]
    n_rows = qs.shape[0]
    nn = n_rows // tn
    rep = hq // hkv

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nn + bsz,),
        in_specs=[
            pl.BlockSpec((tb, x2.shape[1]), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, qs.shape[1]),
                         lambda i, *_: (jnp.minimum(i, nn - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, s.shape[2]),
                         lambda i, *_: (0, jnp.minimum(i, nn - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d),
                         lambda i, *_: (jnp.maximum(i - nn, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d),
                         lambda i, *_: (jnp.maximum(i - nn, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, hkv, rep, d),
                         lambda i, *_: (jnp.maximum(i - nn, 0), 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, n_rows // d, d), F32),  # qkv rows
            pltpu.VMEM((hkv, 8, d), k_cache.dtype),
            pltpu.VMEM((hkv, 8, d), v_cache.dtype),
            pltpu.VMEM((1 if chunk >= s_total else 2, hkv, chunk, d),
                       k_cache.dtype),
            pltpu.VMEM((1 if chunk >= s_total else 2, hkv, chunk, d),
                       v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _attn_kernel, nn=nn, tn=tn, chunk=chunk, hq=hq, hkv=hkv, bsz=bsz,
        scale=scale, softcap=softcap, s_total=s_total)
    out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hkv, rep, d), F32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={8: 1, 9: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(starts.astype(jnp.int32), lengths.astype(jnp.int32),
      write_pos.astype(jnp.int32), x2, qs, s,
      cs.reshape(bsz, 1, -1), sn.reshape(bsz, 1, -1), k_cache, v_cache)
    return out.reshape(bsz, hq, d), k_new, v_new


# all-heads chunk sizing: same VMEM budget reasoning as attention._allh_chunk
_BUF_BYTES = 6 * 2**20


def _pick_chunk(s: int, hkv: int, d: int, itemsize: int) -> int:
    cap = _BUF_BYTES // (4 * hkv * d * itemsize)
    chunk = min(512, s, cap)
    # round down to a power of two first: a non-pow2 cap (e.g. 192 at
    # Hkv=32) would otherwise halve past the 128 that divides s exactly
    chunk = 1 << (chunk.bit_length() - 1) if chunk > 0 else 0
    while chunk >= 128 and s % chunk:
        chunk //= 2
    return chunk if chunk >= 128 else 0


def attn_decode_fused(
    x: jax.Array,  # [B, 1, C] or [B, C] post-norm activations
    kw_qkv: KernelWeights,  # fused qkv, Q4_0, whole-K tile
    k_cache: jax.Array,  # [B, Hkv, S, D] bf16 (this layer's buffer)
    v_cache: jax.Array,
    cos_lane: jax.Array,  # [B, D] per-lane rope cos (pair-duplicated)
    sin_lane: jax.Array,  # [B, D]
    lengths: jax.Array,  # [B] int32 — rows INCLUDING the one written now
    starts: jax.Array | None,
    write_pos: jax.Array | None = None,  # [B] cache row to write (engine
    # offs — capacity means drop); defaults to lengths-1
    *,
    n_heads: int,
    n_kv_heads: int,
    scale: float,
    softcap: float = 0.0,
):
    """Returns (attn_out [B, H·D] f32, k_cache', v_cache') or None when the
    shapes don't qualify (caller falls back to the unfused path)."""
    bsz, hkv_c, s_total, d = k_cache.shape
    xb = x.reshape(bsz, x.shape[-1])
    k_dim = kw_qkv.shape[1]
    n_rows = kw_qkv.arrays["qs"].shape[0]
    want_rows = (n_heads + 2 * n_kv_heads) * d
    if (d != 128 or kw_qkv.kind != GGMLType.Q4_0 or kw_qkv.tile_k != k_dim
            or n_rows != want_rows or bsz > 8 or s_total % 128
            or n_heads % n_kv_heads or n_kv_heads != hkv_c
            or k_cache.dtype != BF16):
        return None
    chunk = _pick_chunk(s_total, hkv_c, d, 2)
    if not chunk:
        return None
    tn = 512 if n_rows % 512 == 0 else _largest_tile(n_rows, 256, 128)
    import os as _os

    tn_env = int(_os.environ.get("LLAMA_TPU_ATTN_TN", 0))  # A/B knob
    if tn_env and n_rows % tn_env == 0:
        tn = tn_env
    if n_rows % tn or tn % d:
        return None
    if starts is None:
        starts = jnp.zeros_like(lengths)
    if write_pos is None:
        write_pos = lengths - 1
    x2 = prepare_x(xb, kw_qkv.kind, k_dim)[0]
    if bsz < 8:
        x2 = jnp.pad(x2, ((0, 8 - bsz), (0, 0)))
    return _attn_fused_call(
        starts, lengths, write_pos, x2,
        kw_qkv.arrays["qs"], kw_qkv.arrays["s"],
        cos_lane, sin_lane, k_cache, v_cache,
        hq=n_heads, hkv=n_kv_heads, scale=float(scale),
        softcap=float(softcap), tn=tn, chunk=chunk,
        interpret=_interpret_mode())
