"""Fused flash-attention decode kernel.

Capability mirror of the reference's FlashAttention decode kernels
(ggml/src/ggml-cuda/fattn-vec-f16.cuh and dispatch fattn.cu:12-51),
designed TPU-first:

- grid (B, Hkv): each program owns one (slot, kv-head) pair and its `rep`
  grouped query heads (GQA packs the group into one [rep, D] MXU operand).
- K/V stay in HBM; the kernel DMAs CHUNK×D tiles into a double buffer and
  runs the online-softmax update per tile — HBM traffic is proportional to
  the sequence's *actual* length (the jnp fallback reads the whole capacity).
- f32 max/sum accumulators like the reference (llama-graph.cpp:1230 keeps
  KQ softmax in f32); sliding-window start offset supported for SWA layers.

Decode only (T=1). Prefill stays on the XLA einsum path where the MXU is
already saturated by the [T,S] matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _resolve_interpret(interpret):
    """None → interpret on non-TPU platforms (CPU tests drive the same
    model-integrated kernel path the TPU runs compiled)."""
    if interpret is None:
        return jax.devices()[0].platform != "tpu"
    return interpret


def _decode_kernel(
    start_ref,  # SMEM [B] int32: first valid kv index (SWA start)
    len_ref,  # SMEM [B] int32: one past last valid kv index
    q_ref,  # VMEM [1, 1, rep, D]
    k_hbm,  # ANY  [B, Hkv, S, D] (or [L, B, Hkv, S, D] with layer set)
    v_hbm,  # ANY  same
    o_ref,  # VMEM [1, 1, rep, D] f32
    k_buf,  # VMEM [2, CHUNK, D]
    v_buf,  # VMEM [2, CHUNK, D]
    sem,  # DMA sems [2, 2]
    *,
    scale: float,
    chunk: int,
    softcap: float,
    layer: int | None,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    length = len_ref[b]
    start = start_ref[b]
    first = start // chunk  # chunks fully below `start` are skipped
    n_chunks = pl.cdiv(length, chunk)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # [rep, D]
    rep, d = q.shape
    # whole-cache operand + static layer index: the model passes the stacked
    # [L, ...] cache array untouched, so XLA never materializes per-layer
    # slice copies as kernel operands (64 slice copies/step on llama3-8b)
    pre = () if layer is None else (layer,)

    def k_dma(slot, ci):
        return pltpu.make_async_copy(
            k_hbm.at[(*pre, b, h, pl.ds(ci * chunk, chunk), slice(None))],
            k_buf.at[slot], sem.at[slot, 0]
        )

    def v_dma(slot, ci):
        return pltpu.make_async_copy(
            v_hbm.at[(*pre, b, h, pl.ds(ci * chunk, chunk), slice(None))],
            v_buf.at[slot], sem.at[slot, 1]
        )

    @pl.when(first < n_chunks)
    def _():
        k_dma(first % 2, first).start()
        v_dma(first % 2, first).start()

    def body(ci, carry):
        m, l, acc = carry  # [rep,1], [rep,1], [rep,D] all f32
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            k_dma((ci + 1) % 2, ci + 1).start()
            v_dma((ci + 1) % 2, ci + 1).start()

        k_dma(slot, ci).wait()
        v_dma(slot, ci).wait()

        kc = k_buf[slot].astype(jnp.float32)  # [CHUNK, D]
        vc = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [rep, CHUNK]
        if softcap:
            s = jnp.tanh(s / softcap) * softcap
        col = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((col < length) & (col >= start), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # [rep, CHUNK]
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l, acc

    m0 = jnp.full((rep, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rep, 1), jnp.float32)
    acc0 = jnp.zeros((rep, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
    o_ref[0, 0] = acc / jnp.maximum(l, 1e-30)


def _decode_kernel_allh(
    start_ref,  # SMEM [B] int32
    len_ref,  # SMEM [B] int32
    q_ref,  # VMEM [1, Hkv, rep, D]
    k_hbm,  # ANY  [B, Hkv, S, D] (or [L, B, Hkv, S, D] with layer set)
    v_hbm,  # ANY  same
    o_ref,  # VMEM [1, Hkv, rep, D] f32
    k_buf,  # VMEM [2, Hkv, CHUNK, D]
    v_buf,  # VMEM [2, Hkv, CHUNK, D]
    sem,  # DMA sems [2, 2]
    *,
    scale: float,
    chunk: int,
    softcap: float,
    layer: int | None,
    hkv: int,
):
    """All-kv-heads-per-program decode body: ONE (strided) DMA per S-chunk
    covers every head, and the chunk double-buffer actually pipelines —
    the per-(b,h) grid issues 2·Hkv serialized copies per step with no
    overlap, which is DMA-latency-bound for MHA models (Hkv=32)."""
    b = pl.program_id(0)
    length = len_ref[b]
    start = start_ref[b]
    first = start // chunk
    n_chunks = pl.cdiv(length, chunk)
    pre = () if layer is None else (layer,)

    q = q_ref[0].astype(jnp.float32) * scale  # [Hkv, rep, D]
    _, rep, d = q.shape
    hr = hkv * rep
    q2 = q.reshape(hr, d)

    def k_dma(slot, ci):
        return pltpu.make_async_copy(
            k_hbm.at[(*pre, b, slice(None), pl.ds(ci * chunk, chunk), slice(None))],
            k_buf.at[slot], sem.at[slot, 0]
        )

    def v_dma(slot, ci):
        return pltpu.make_async_copy(
            v_hbm.at[(*pre, b, slice(None), pl.ds(ci * chunk, chunk), slice(None))],
            v_buf.at[slot], sem.at[slot, 1]
        )

    @pl.when(first < n_chunks)
    def _():
        k_dma(first % 2, first).start()
        v_dma(first % 2, first).start()

    def body(ci, carry):
        m, l, acc = carry  # [HR,1], [HR,1], [HR,D] f32
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            k_dma((ci + 1) % 2, ci + 1).start()
            v_dma((ci + 1) % 2, ci + 1).start()

        k_dma(slot, ci).wait()
        v_dma(slot, ci).wait()

        # per-head scores on the MXU (static unroll over kv heads)
        s = jnp.concatenate([
            jax.lax.dot_general(
                q2[h * rep:(h + 1) * rep], k_buf[slot, h].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) for h in range(hkv)
        ], axis=0)  # [HR, CHUNK]
        if softcap:
            s = jnp.tanh(s / softcap) * softcap
        col = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((col < length) & (col >= start), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)  # [HR, CHUNK]
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                p[h * rep:(h + 1) * rep], v_buf[slot, h].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) for h in range(hkv)
        ], axis=0)  # [HR, D]
        acc = acc * alpha + pv
        return m_new, l, acc

    m0 = jnp.full((hr, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hr, 1), jnp.float32)
    acc0 = jnp.zeros((hr, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).reshape(hkv, rep, d)


# VMEM budget for the all-heads K/V double buffers (2 tensors x 2 slots);
# leaves room for q/o blocks and accumulators inside the 16MB scoped limit
_ALLH_BUF_BYTES = 8 * 2**20


def _allh_chunk(s: int, hkv: int, d: int, itemsize: int) -> int:
    """Largest S-chunk whose all-heads double buffer fits the budget and
    divides the capacity; 0 if even 128 doesn't fit (fall back to per-head)."""
    cap = _ALLH_BUF_BYTES // (4 * hkv * d * itemsize)
    chunk = min(512, s, cap)
    while chunk >= 128 and s % chunk:
        chunk //= 2
    return chunk if chunk >= 128 else 0


@functools.partial(
    jax.jit, static_argnames=("scale", "chunk", "softcap", "interpret", "layer")
)
def flash_decode(
    q: jax.Array,  # [B, H, D] single-step queries (roped)
    k: jax.Array,  # [B, Hkv, S, D] — or [L, B, Hkv, S, D] with layer given
    v: jax.Array,  # same
    lengths: jax.Array,  # [B] int32 — valid kv cells per slot
    starts: jax.Array | None = None,  # [B] int32 — SWA window start (default 0)
    *,
    scale: float,
    chunk: int = 512,
    softcap: float = 0.0,
    interpret: bool | None = None,
    layer: int | None = None,  # static index into a stacked [L, ...] cache
) -> jax.Array:
    """Returns [B, H, D] f32 attention output."""
    import os

    bsz, hq, d = q.shape
    hkv, s = (k.shape[1], k.shape[2]) if layer is None else (k.shape[2], k.shape[3])
    rep = hq // hkv
    if starts is None:
        starts = jnp.zeros_like(lengths)

    allh = _allh_chunk(s, hkv, d, jnp.dtype(k.dtype).itemsize)
    if hkv > 1 and allh and not os.environ.get("LLAMA_TPU_NO_ATTN_ALLH"):
        qg = q.reshape(bsz, hkv, rep, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((1, hkv, rep, d), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, hkv, rep, d), lambda b, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, hkv, allh, d), k.dtype),
                pltpu.VMEM((2, hkv, allh, d), v.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_decode_kernel_allh, scale=scale, chunk=allh,
                              softcap=softcap, layer=layer, hkv=hkv),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, hkv, rep, d), jnp.float32),
            interpret=_resolve_interpret(interpret),
        )(starts.astype(jnp.int32), lengths.astype(jnp.int32), qg, k, v)
        return out.reshape(bsz, hq, d)

    chunk = min(chunk, s)
    while s % chunk:  # largest power-of-two-ish divisor of the capacity
        chunk //= 2
    assert chunk >= 8, (s, chunk)

    qg = q.reshape(bsz, hkv, rep, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # starts, lengths
        grid=(bsz, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda b, h, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d), k.dtype),
            pltpu.VMEM((2, chunk, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, chunk=chunk,
                          softcap=softcap, layer=layer),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, rep, d), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(starts.astype(jnp.int32), lengths.astype(jnp.int32), qg, k, v)
    return out.reshape(bsz, hq, d)


# ---------------------------------------------------------------------------
# Q8-quantized KV variant — the fattn vec kernels' quantized-KV capability
# (ggml/src/ggml-cuda/fattn-vec-f16.cuh dequantizes inside the attention
# loop). TPU relayout: one scale per cached row, stored lane-oriented
# [B, Hkv, 1, S], so the kernel never materializes dequantized K/V — scores
# are scaled by kd and probs by vd, both [1, CHUNK] lane vectors.
# ---------------------------------------------------------------------------


def _decode_kernel_q8(
    start_ref, len_ref, q_ref,
    kq_hbm, kd_hbm, vq_hbm, vd_hbm,
    o_ref,
    kq_buf, kd_buf, vq_buf, vd_buf, sem,
    *, scale: float, chunk: int, softcap: float, layer: int | None,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    length = len_ref[b]
    start = start_ref[b]
    first = start // chunk
    n_chunks = pl.cdiv(length, chunk)

    q = q_ref[0, 0].astype(jnp.float32) * scale
    rep, d = q.shape
    pre = () if layer is None else (layer,)

    def dmas(slot, ci):
        return [
            pltpu.make_async_copy(
                kq_hbm.at[(*pre, b, h, pl.ds(ci * chunk, chunk), slice(None))],
                kq_buf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                kd_hbm.at[(*pre, b, h, slice(None), pl.ds(ci * chunk, chunk))],
                kd_buf.at[slot], sem.at[slot, 1],
            ),
            pltpu.make_async_copy(
                vq_hbm.at[(*pre, b, h, pl.ds(ci * chunk, chunk), slice(None))],
                vq_buf.at[slot], sem.at[slot, 2],
            ),
            pltpu.make_async_copy(
                vd_hbm.at[(*pre, b, h, slice(None), pl.ds(ci * chunk, chunk))],
                vd_buf.at[slot], sem.at[slot, 3],
            ),
        ]

    @pl.when(first < n_chunks)
    def _():
        for dma in dmas(first % 2, first):
            dma.start()

    def body(ci, carry):
        m, l, acc = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for dma in dmas((ci + 1) % 2, ci + 1):
                dma.start()

        for dma in dmas(slot, ci):
            dma.wait()

        kq = kq_buf[slot].astype(jnp.float32)  # [CHUNK, D]
        kd = kd_buf[slot]  # [1, CHUNK]
        s = jax.lax.dot_general(
            q, kq, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * kd  # per-row dequant folded into the score scale
        if softcap:
            s = jnp.tanh(s / softcap) * softcap
        col = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((col < length) & (col >= start), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = p * vd_buf[slot]  # fold V dequant into the probs
        acc = acc * alpha + jax.lax.dot_general(
            pv, vq_buf[slot].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l, acc

    m0 = jnp.full((rep, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rep, 1), jnp.float32)
    acc0 = jnp.zeros((rep, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
    o_ref[0, 0] = acc / jnp.maximum(l, 1e-30)


def _decode_kernel_q8_allh(
    start_ref, len_ref, q_ref,
    kq_hbm,  # ANY [B, Hkv, S, D] int8 (or [L, B, ...] with layer set)
    kd_hbm,  # ANY [B, Hkv, 1, S] f32
    vq_hbm, vd_hbm,
    o_ref,
    kq_buf,  # VMEM [2, Hkv, CHUNK, D] int8
    kd_buf,  # VMEM [2, Hkv, 1, CHUNK] f32
    vq_buf, vd_buf, sem,
    *, scale: float, chunk: int, softcap: float, layer: int | None, hkv: int,
):
    """All-kv-heads q8 decode body (the bf16 `_decode_kernel_allh` structure
    applied to the int8 cache): ONE strided async copy per S-chunk covers
    every head for each of the 4 planes, double-buffered — the per-(b,h)
    grid issued 4·Hkv serialized chunk DMAs per step with no overlap, which
    cost q8 KV 13% vs bf16 KV at B=4 (BENCH_FULL_r03 q8_kv_decode)."""
    b = pl.program_id(0)
    length = len_ref[b]
    start = start_ref[b]
    first = start // chunk
    n_chunks = pl.cdiv(length, chunk)
    pre = () if layer is None else (layer,)

    q = q_ref[0].astype(jnp.float32) * scale  # [Hkv, rep, D]
    _, rep, d = q.shape
    hr = hkv * rep
    q2 = q.reshape(hr, d)

    def dmas(slot, ci):
        sl = pl.ds(ci * chunk, chunk)
        return [
            pltpu.make_async_copy(
                kq_hbm.at[(*pre, b, slice(None), sl, slice(None))],
                kq_buf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(
                kd_hbm.at[(*pre, b, slice(None), slice(None), sl)],
                kd_buf.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(
                vq_hbm.at[(*pre, b, slice(None), sl, slice(None))],
                vq_buf.at[slot], sem.at[slot, 2]),
            pltpu.make_async_copy(
                vd_hbm.at[(*pre, b, slice(None), slice(None), sl)],
                vd_buf.at[slot], sem.at[slot, 3]),
        ]

    @pl.when(first < n_chunks)
    def _():
        for dma in dmas(first % 2, first):
            dma.start()

    def body(ci, carry):
        m, l, acc = carry  # [HR,1], [HR,1], [HR,D] f32
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for dma in dmas((ci + 1) % 2, ci + 1):
                dma.start()

        for dma in dmas(slot, ci):
            dma.wait()

        s = jnp.concatenate([
            jax.lax.dot_general(
                q2[h * rep:(h + 1) * rep],
                kq_buf[slot, h].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) * kd_buf[slot, h] for h in range(hkv)
        ], axis=0)  # [HR, CHUNK] — per-row K dequant folds into the score
        if softcap:
            s = jnp.tanh(s / softcap) * softcap
        col = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((col < length) & (col >= start), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                p[h * rep:(h + 1) * rep] * vd_buf[slot, h],
                vq_buf[slot, h].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) for h in range(hkv)
        ], axis=0)  # [HR, D] — V dequant folds into the probs
        acc = acc * alpha + pv
        return m_new, l, acc

    m0 = jnp.full((hr, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hr, 1), jnp.float32)
    acc0 = jnp.zeros((hr, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).reshape(hkv, rep, d)


@functools.partial(
    jax.jit, static_argnames=("scale", "chunk", "softcap", "interpret", "layer")
)
def flash_decode_q8(
    q: jax.Array,  # [B, H, D]
    k_qs: jax.Array,  # [B, Hkv, S, D] int8 (or [L, B, ...] with layer given)
    k_d: jax.Array,  # [B, Hkv, 1, S] f32 per-row scales (same)
    v_qs: jax.Array,
    v_d: jax.Array,
    lengths: jax.Array,
    starts: jax.Array | None = None,
    *,
    scale: float,
    chunk: int = 512,
    softcap: float = 0.0,
    interpret: bool | None = None,
    layer: int | None = None,
) -> jax.Array:
    import os

    bsz, hq, d = q.shape
    hkv, s = ((k_qs.shape[1], k_qs.shape[2]) if layer is None
              else (k_qs.shape[2], k_qs.shape[3]))
    rep = hq // hkv
    chunk = min(chunk, s)
    while s % chunk:
        chunk //= 2
    # scale DMAs slice the lane dim — needs 128 alignment
    assert chunk >= 128, (s, chunk)
    if starts is None:
        starts = jnp.zeros_like(lengths)

    allh = _allh_chunk(s, hkv, d, 1)  # int8 planes; f32 scales add ~d/32
    if hkv > 1 and allh and not os.environ.get("LLAMA_TPU_NO_ATTN_ALLH"):
        qg = q.reshape(bsz, hkv, rep, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((1, hkv, rep, d), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, hkv, rep, d), lambda b, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, hkv, allh, d), jnp.int8),
                pltpu.VMEM((2, hkv, 1, allh), jnp.float32),
                pltpu.VMEM((2, hkv, allh, d), jnp.int8),
                pltpu.VMEM((2, hkv, 1, allh), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_decode_kernel_q8_allh, scale=scale, chunk=allh,
                              softcap=softcap, layer=layer, hkv=hkv),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, hkv, rep, d), jnp.float32),
            interpret=_resolve_interpret(interpret),
        )(starts.astype(jnp.int32), lengths.astype(jnp.int32), qg, k_qs, k_d,
          v_qs, v_d)
        return out.reshape(bsz, hq, d)

    qg = q.reshape(bsz, hkv, rep, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda b, h, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d), jnp.int8),
            pltpu.VMEM((2, 1, chunk), jnp.float32),
            pltpu.VMEM((2, chunk, d), jnp.int8),
            pltpu.VMEM((2, 1, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel_q8, scale=scale, chunk=chunk,
                          softcap=softcap, layer=layer),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, rep, d), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(starts.astype(jnp.int32), lengths.astype(jnp.int32), qg, k_qs, k_d, v_qs, v_d)
    return out.reshape(bsz, hq, d)


# ---------------------------------------------------------------------------
# MLA latent-attention decode (DeepSeek-V2/V3, models/deepseek2.py). The
# cache holds ONE latent "head" [B, 1, S, C] (C = kv_lora_rank + rope_dim,
# zero-padded to a 128 multiple). score = [q_lat; q_rope]·row and the
# attention output is Σ p·row[:r] — so ONE pass over the cached latents
# yields both the scores and the weighted latent sum; the XLA einsum path
# reads the cache twice. Grid (B,): all H query heads share the row stream.
# ---------------------------------------------------------------------------


def _mla_decode_kernel(
    len_ref,  # SMEM [B] int32
    q_ref,  # VMEM [1, H, C] (q_lat ⊕ q_rope ⊕ 0-pad)
    c_hbm,  # ANY [B, 1, S, C]
    o_ref,  # VMEM [1, H, R] f32
    c_buf,  # VMEM [2, CHUNK, C]
    sem,  # DMA sems [2]
    *, scale: float, chunk: int, r: int,
):
    b = pl.program_id(0)
    length = len_ref[b]
    n_chunks = pl.cdiv(length, chunk)

    q = q_ref[0].astype(jnp.float32) * scale  # [H, C]
    h = q.shape[0]

    def dma(slot, ci):
        return pltpu.make_async_copy(
            c_hbm.at[b, 0, pl.ds(ci * chunk, chunk), slice(None)],
            c_buf.at[slot], sem.at[slot],
        )

    dma(0, 0).start()

    def body(ci, carry):
        m, l, acc = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma((ci + 1) % 2, ci + 1).start()

        dma(slot, ci).wait()
        rows = c_buf[slot].astype(jnp.float32)  # [CHUNK, C]
        s = jax.lax.dot_general(
            q, rows, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [H, CHUNK]
        col = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < length, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, rows[:, :r], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l, acc

    m0 = jnp.full((h, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, 1), jnp.float32)
    acc0 = jnp.zeros((h, r), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))
    o_ref[0] = acc / jnp.maximum(l, 1e-30)


@functools.partial(
    jax.jit, static_argnames=("scale", "chunk", "r", "interpret")
)
def mla_flash_decode(
    q: jax.Array,  # [B, H, C] — concat(q_lat, q_rope, 0-pad) f32
    c: jax.Array,  # [B, 1, S, C] cached latents (bf16/f32)
    lengths: jax.Array,  # [B] int32
    *,
    scale: float,
    r: int,  # latent rank (the output keeps rows[:, :r])
    chunk: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    bsz, h, cdim = q.shape
    s = c.shape[2]
    chunk = min(chunk, s)
    while s % chunk:
        chunk //= 2
    assert chunk >= 128 and cdim % 128 == 0 and r % 128 == 0, (chunk, cdim, r)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, cdim), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, h, r), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, cdim), c.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_mla_decode_kernel, scale=scale, chunk=chunk, r=r),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, h, r), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(lengths.astype(jnp.int32), q.astype(jnp.float32), c)


# ---------------------------------------------------------------------------
# Q4-quantized KV variant (reference --cache-type-k q4_0). Row-PAIR packing
# (runtime/kv_cache.Q4KVCache): the byte plane is [B, Hkv, S/2, D] (row 2j
# low nibble, 2j+1 high) so chunk DMAs keep the 128-lane D axis; scales are
# parity-planar [B, Hkv, 2, S/2]. Scores for the even/odd halves are
# computed separately and concatenated along the key axis — the online
# softmax is order-invariant, so no column interleave is ever materialized
# (element-order reshapes are unsupported Mosaic shape casts).
# ---------------------------------------------------------------------------


def _decode_kernel_q4(
    start_ref, len_ref, q_ref,
    kq_hbm, kd_hbm, vq_hbm, vd_hbm,
    o_ref,
    kq_buf, kd_buf, vq_buf, vd_buf, sem,
    *, scale: float, chunk: int, softcap: float, layer: int | None,
    groups: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    length = len_ref[b]
    start = start_ref[b]
    first = start // chunk
    n_chunks = pl.cdiv(length, chunk)
    ch2 = chunk // 2

    q = q_ref[0, 0].astype(jnp.float32) * scale
    rep, d = q.shape
    pre = () if layer is None else (layer,)
    # lane masks select one 32-wide scale group per matmul (static lane
    # slicing at 32-offsets would force Mosaic relayouts; a masked full-D
    # dot keeps layouts untouched — the extra MXU passes are free, decode
    # is DMA-bound)
    gw = d // groups
    lane_d = jax.lax.broadcasted_iota(jnp.int32, (1, d), 1)
    gmasks = [((lane_d >= g * gw) & (lane_d < (g + 1) * gw))
              .astype(jnp.float32) for g in range(groups)]

    def dmas(slot, ci):
        return [
            pltpu.make_async_copy(
                kq_hbm.at[(*pre, b, h, pl.ds(ci * ch2, ch2), slice(None))],
                kq_buf.at[slot], sem.at[slot, 0],
            ),
            pltpu.make_async_copy(
                kd_hbm.at[(*pre, b, h, slice(None), pl.ds(ci * ch2, ch2))],
                kd_buf.at[slot], sem.at[slot, 1],
            ),
            pltpu.make_async_copy(
                vq_hbm.at[(*pre, b, h, pl.ds(ci * ch2, ch2), slice(None))],
                vq_buf.at[slot], sem.at[slot, 2],
            ),
            pltpu.make_async_copy(
                vd_hbm.at[(*pre, b, h, slice(None), pl.ds(ci * ch2, ch2))],
                vd_buf.at[slot], sem.at[slot, 3],
            ),
        ]

    @pl.when(first < n_chunks)
    def _():
        for dma in dmas(first % 2, first):
            dma.start()

    def body(ci, carry):
        m, l, acc = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for dma in dmas((ci + 1) % 2, ci + 1):
                dma.start()

        for dma in dmas(slot, ci):
            dma.wait()

        kq = kq_buf[slot].astype(jnp.int32)  # [CH2, D] packed bytes
        klo = ((kq & 15) - 8).astype(jnp.float32)  # rows 2j
        khi = ((kq >> 4) - 8).astype(jnp.float32)  # rows 2j+1
        kd = kd_buf[slot]  # [2G, CH2] parity-major group scales

        def qk(qm, km):
            return jax.lax.dot_general(
                qm, km, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        # even/odd halves stay SEPARATE [rep, CH2] matrices end-to-end —
        # the online softmax is order-invariant, and Mosaic cannot
        # concatenate vectors whose sublane offsets differ (the kd[1:2]
        # row-slice carries offset 1: "result/input offset mismatch").
        # Per-group partial dots fold each 32-group's scale into the score.
        s_lo = sum(qk(q * gmasks[g], klo) * kd[g:g + 1]
                   for g in range(groups))  # keys 2j
        s_hi = sum(qk(q * gmasks[g], khi) * kd[groups + g:groups + g + 1]
                   for g in range(groups))  # keys 2j+1
        if softcap:
            s_lo = jnp.tanh(s_lo / softcap) * softcap
            s_hi = jnp.tanh(s_hi / softcap) * softcap
        lane = jax.lax.broadcasted_iota(jnp.int32, s_lo.shape, 1)
        col_lo = ci * chunk + 2 * lane
        col_hi = col_lo + 1
        s_lo = jnp.where((col_lo < length) & (col_lo >= start), s_lo, NEG_INF)
        s_hi = jnp.where((col_hi < length) & (col_hi >= start), s_hi, NEG_INF)

        m_new = jnp.maximum(
            m, jnp.maximum(jnp.max(s_lo, axis=1, keepdims=True),
                           jnp.max(s_hi, axis=1, keepdims=True)))
        p_lo = jnp.exp(s_lo - m_new)
        p_hi = jnp.exp(s_hi - m_new)
        alpha = jnp.exp(m - m_new)
        l = (l * alpha + jnp.sum(p_lo, axis=1, keepdims=True)
             + jnp.sum(p_hi, axis=1, keepdims=True))
        vd = vd_buf[slot]  # [2G, CH2]
        vq = vq_buf[slot].astype(jnp.int32)
        vlo = ((vq & 15) - 8).astype(jnp.float32)
        vhi = ((vq >> 4) - 8).astype(jnp.float32)

        def pvdot(pm, vm):
            return jax.lax.dot_general(
                pm, vm, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        # per-group prob scaling: only group-g output lanes keep each dot
        pv = sum(gmasks[g] * (pvdot(p_lo * vd[g:g + 1], vlo)
                              + pvdot(p_hi * vd[groups + g:groups + g + 1],
                                      vhi))
                 for g in range(groups))
        acc = acc * alpha + pv
        return m_new, l, acc

    m0 = jnp.full((rep, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rep, 1), jnp.float32)
    acc0 = jnp.zeros((rep, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
    o_ref[0, 0] = acc / jnp.maximum(l, 1e-30)


@functools.partial(
    jax.jit, static_argnames=("scale", "chunk", "softcap", "interpret", "layer")
)
def flash_decode_q4(
    q: jax.Array,  # [B, H, D]
    k_qs: jax.Array,  # [B, Hkv, S/2, D] u8 row-pair packed
    k_d: jax.Array,  # [B, Hkv, 2*G, S/2] f32 parity-major group scales
    v_qs: jax.Array,
    v_d: jax.Array,
    lengths: jax.Array,
    starts: jax.Array | None = None,
    *,
    scale: float,
    chunk: int = 512,
    softcap: float = 0.0,
    interpret: bool | None = None,
    layer: int | None = None,
) -> jax.Array:
    bsz, hq, d = q.shape
    hkv, s2 = ((k_qs.shape[1], k_qs.shape[2]) if layer is None
               else (k_qs.shape[2], k_qs.shape[3]))
    s = 2 * s2
    rep = hq // hkv
    groups = k_d.shape[-2] // 2  # parity-major planes: 2*G
    # scale DMAs slice the S/2 lane dim — chunk/2 needs 128 alignment, so
    # chunk must be a 256-multiple divisor of s (dispatch gates capacity)
    chunk = min(chunk, s)
    while chunk >= 256 and (s % chunk or chunk % 256):
        chunk -= 256
    assert chunk >= 256 and s % chunk == 0, (s, chunk)
    if starts is None:
        starts = jnp.zeros_like(lengths)

    qg = q.reshape(bsz, hkv, rep, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda b, h, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk // 2, d), jnp.uint8),
            pltpu.VMEM((2, 2 * groups, chunk // 2), jnp.float32),
            pltpu.VMEM((2, chunk // 2, d), jnp.uint8),
            pltpu.VMEM((2, 2 * groups, chunk // 2), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel_q4, scale=scale, chunk=chunk,
                          softcap=softcap, layer=layer, groups=groups),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, rep, d), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(starts.astype(jnp.int32), lengths.astype(jnp.int32), qg, k_qs, k_d,
      v_qs, v_d)
    return out.reshape(bsz, hq, d)


# ---------------------------------------------------------------------------
# Paged-KV variant: K/V live in page pools [P, Hkv, ps, D]; each sequence's
# block table rides the scalar prefetch and indexes the page DMAs directly —
# the TPU-native form of the reference's paged/unified cell cache, with no
# dense gather (HBM traffic stays proportional to actual length).
# ---------------------------------------------------------------------------


def _decode_kernel_paged(
    tables_ref,  # SMEM [B, max_blocks] int32 page ids
    len_ref,  # SMEM [B] int32
    start_ref,  # SMEM [B] int32 (SWA window start)
    q_ref,  # VMEM [1, 1, rep, D]
    k_hbm,  # ANY [P, Hkv, ps, D]
    v_hbm,  # ANY [P, Hkv, ps, D]
    o_ref,  # VMEM [1, 1, rep, D] f32
    k_buf,  # VMEM [2, ps, D]
    v_buf,
    sem,
    *,
    scale: float,
    page: int,
    softcap: float,
    layer: int | None,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    length = len_ref[b]
    start = start_ref[b]
    first = start // page
    n_chunks = pl.cdiv(length, page)

    q = q_ref[0, 0].astype(jnp.float32) * scale
    rep, d = q.shape
    pre = () if layer is None else (layer,)

    def k_dma(slot, ci):
        return pltpu.make_async_copy(
            k_hbm.at[(*pre, tables_ref[b, ci], h)], k_buf.at[slot], sem.at[slot, 0]
        )

    def v_dma(slot, ci):
        return pltpu.make_async_copy(
            v_hbm.at[(*pre, tables_ref[b, ci], h)], v_buf.at[slot], sem.at[slot, 1]
        )

    @pl.when(first < n_chunks)
    def _():
        k_dma(first % 2, first).start()
        v_dma(first % 2, first).start()

    def body(ci, carry):
        m, l, acc = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            k_dma((ci + 1) % 2, ci + 1).start()
            v_dma((ci + 1) % 2, ci + 1).start()

        k_dma(slot, ci).wait()
        v_dma(slot, ci).wait()

        kc = k_buf[slot].astype(jnp.float32)
        vc = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        if softcap:
            s = jnp.tanh(s / softcap) * softcap
        col = ci * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((col < length) & (col >= start), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l, acc

    m0 = jnp.full((rep, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rep, 1), jnp.float32)
    acc0 = jnp.zeros((rep, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
    o_ref[0, 0] = acc / jnp.maximum(l, 1e-30)


def _decode_kernel_paged_allh(
    tables_ref,  # SMEM [B, max_blocks] int32 page ids
    len_ref, start_ref, q_ref,
    k_hbm,  # ANY [P, Hkv, ps, D]
    v_hbm,
    o_ref,  # VMEM [1, Hkv, rep, D] f32
    k_buf,  # VMEM [2, Hkv, ps, D]
    v_buf, sem,
    *, scale: float, page: int, softcap: float, layer: int | None, hkv: int,
):
    """All-kv-heads paged decode body: ONE strided page copy per chunk
    covers every head (the per-(b,h) grid issued 2·Hkv serialized page
    DMAs per chunk — measured as most of the paged-vs-contiguous decode
    tax, BENCH_FULL_r03 ratio 0.916)."""
    b = pl.program_id(0)
    length = len_ref[b]
    start = start_ref[b]
    first = start // page
    n_chunks = pl.cdiv(length, page)
    pre = () if layer is None else (layer,)

    q = q_ref[0].astype(jnp.float32) * scale  # [Hkv, rep, D]
    _, rep, d = q.shape
    hr = hkv * rep
    q2 = q.reshape(hr, d)

    def k_dma(slot, ci):
        return pltpu.make_async_copy(
            k_hbm.at[(*pre, tables_ref[b, ci])], k_buf.at[slot],
            sem.at[slot, 0])

    def v_dma(slot, ci):
        return pltpu.make_async_copy(
            v_hbm.at[(*pre, tables_ref[b, ci])], v_buf.at[slot],
            sem.at[slot, 1])

    @pl.when(first < n_chunks)
    def _():
        k_dma(first % 2, first).start()
        v_dma(first % 2, first).start()

    def body(ci, carry):
        m, l, acc = carry  # [HR,1], [HR,1], [HR,D] f32
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            k_dma((ci + 1) % 2, ci + 1).start()
            v_dma((ci + 1) % 2, ci + 1).start()

        k_dma(slot, ci).wait()
        v_dma(slot, ci).wait()

        s = jnp.concatenate([
            jax.lax.dot_general(
                q2[h * rep:(h + 1) * rep], k_buf[slot, h].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) for h in range(hkv)
        ], axis=0)  # [HR, ps]
        if softcap:
            s = jnp.tanh(s / softcap) * softcap
        col = ci * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((col < length) & (col >= start), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                p[h * rep:(h + 1) * rep], v_buf[slot, h].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) for h in range(hkv)
        ], axis=0)
        acc = acc * alpha + pv
        return m_new, l, acc

    m0 = jnp.full((hr, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hr, 1), jnp.float32)
    acc0 = jnp.zeros((hr, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).reshape(hkv, rep, d)


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "interpret", "layer")
)
def flash_decode_paged(
    q: jax.Array,  # [B, H, D]
    k_pages: jax.Array,  # [P, Hkv, ps, D] — or [L, P, ...] with layer given
    v_pages: jax.Array,
    tables: jax.Array,  # [B, max_blocks] int32
    lengths: jax.Array,  # [B]
    starts: jax.Array | None = None,
    *,
    scale: float,
    softcap: float = 0.0,
    interpret: bool | None = None,
    layer: int | None = None,
) -> jax.Array:
    """Returns [B, H, D] f32 attention over paged KV."""
    import os

    bsz, hq, d = q.shape
    n_pages, hkv, ps = (k_pages.shape[:3] if layer is None
                        else k_pages.shape[1:4])
    rep = hq // hkv
    if starts is None:
        starts = jnp.zeros_like(lengths)
    # sentinel table entries (== n_pages) are never dereferenced for
    # ci < cdiv(length, ps), but clamp defensively for the DMA engine
    tables = jnp.minimum(tables, n_pages - 1)

    itemsize = jnp.dtype(k_pages.dtype).itemsize
    if (hkv > 1 and 4 * hkv * ps * d * itemsize <= _ALLH_BUF_BYTES
            and not os.environ.get("LLAMA_TPU_NO_ATTN_ALLH")):
        qg = q.reshape(bsz, hkv, rep, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # tables, lengths, starts
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((1, hkv, rep, d), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, hkv, rep, d), lambda b, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, hkv, ps, d), k_pages.dtype),
                pltpu.VMEM((2, hkv, ps, d), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_decode_kernel_paged_allh, scale=scale, page=ps,
                              softcap=softcap, layer=layer, hkv=hkv),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, hkv, rep, d), jnp.float32),
            interpret=_resolve_interpret(interpret),
        )(tables.astype(jnp.int32), lengths.astype(jnp.int32),
          starts.astype(jnp.int32), qg, k_pages, v_pages)
        return out.reshape(bsz, hq, d)

    qg = q.reshape(bsz, hkv, rep, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # tables, lengths, starts
        grid=(bsz, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda b, h, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ps, d), k_pages.dtype),
            pltpu.VMEM((2, ps, d), v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel_paged, scale=scale, page=ps,
                          softcap=softcap, layer=layer),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, rep, d), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(tables.astype(jnp.int32), lengths.astype(jnp.int32),
      starts.astype(jnp.int32), qg, k_pages, v_pages)
    return out.reshape(bsz, hq, d)


def _decode_kernel_paged_q8(
    tables_ref, len_ref, start_ref, q_ref,
    kq_hbm,  # ANY [P, Hkv, ps, D] int8
    kd_hbm,  # ANY [P, Hkv, 1, ps] f32
    vq_hbm, vd_hbm,
    o_ref,
    kq_buf, kd_buf, vq_buf, vd_buf, sem,
    *, scale: float, page: int, softcap: float, layer: int | None,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    length = len_ref[b]
    start = start_ref[b]
    first = start // page
    n_chunks = pl.cdiv(length, page)

    q = q_ref[0, 0].astype(jnp.float32) * scale
    rep, d = q.shape
    pre = () if layer is None else (layer,)

    def dmas(slot, ci):
        pg = tables_ref[b, ci]
        return [
            pltpu.make_async_copy(kq_hbm.at[(*pre, pg, h)], kq_buf.at[slot],
                                  sem.at[slot, 0]),
            pltpu.make_async_copy(kd_hbm.at[(*pre, pg, h)], kd_buf.at[slot],
                                  sem.at[slot, 1]),
            pltpu.make_async_copy(vq_hbm.at[(*pre, pg, h)], vq_buf.at[slot],
                                  sem.at[slot, 2]),
            pltpu.make_async_copy(vd_hbm.at[(*pre, pg, h)], vd_buf.at[slot],
                                  sem.at[slot, 3]),
        ]

    @pl.when(first < n_chunks)
    def _():
        for dma in dmas(first % 2, first):
            dma.start()

    def body(ci, carry):
        m, l, acc = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for dma in dmas((ci + 1) % 2, ci + 1):
                dma.start()

        for dma in dmas(slot, ci):
            dma.wait()

        kq = kq_buf[slot].astype(jnp.float32)
        kd = kd_buf[slot]  # [1, ps]
        s = jax.lax.dot_general(
            q, kq, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * kd
        if softcap:
            s = jnp.tanh(s / softcap) * softcap
        col = ci * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((col < length) & (col >= start), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = p * vd_buf[slot]
        acc = acc * alpha + jax.lax.dot_general(
            pv, vq_buf[slot].astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l, acc

    m0 = jnp.full((rep, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rep, 1), jnp.float32)
    acc0 = jnp.zeros((rep, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
    o_ref[0, 0] = acc / jnp.maximum(l, 1e-30)


def _decode_kernel_paged_q8_allh(
    tables_ref, len_ref, start_ref, q_ref,
    kq_hbm,  # ANY [P, Hkv, ps, D] int8
    kd_hbm,  # ANY [P, Hkv, 1, ps] f32
    vq_hbm, vd_hbm,
    o_ref,
    kq_buf,  # VMEM [2, Hkv, ps, D] int8
    kd_buf,  # VMEM [2, Hkv, 1, ps] f32
    vq_buf, vd_buf, sem,
    *, scale: float, page: int, softcap: float, layer: int | None, hkv: int,
):
    """All-heads q8 paged decode (one strided page copy per plane per
    chunk; see _decode_kernel_paged_allh / _decode_kernel_q8_allh)."""
    b = pl.program_id(0)
    length = len_ref[b]
    start = start_ref[b]
    first = start // page
    n_chunks = pl.cdiv(length, page)
    pre = () if layer is None else (layer,)

    q = q_ref[0].astype(jnp.float32) * scale
    _, rep, d = q.shape
    hr = hkv * rep
    q2 = q.reshape(hr, d)

    def dmas(slot, ci):
        pg = tables_ref[b, ci]
        return [
            pltpu.make_async_copy(kq_hbm.at[(*pre, pg)], kq_buf.at[slot],
                                  sem.at[slot, 0]),
            pltpu.make_async_copy(kd_hbm.at[(*pre, pg)], kd_buf.at[slot],
                                  sem.at[slot, 1]),
            pltpu.make_async_copy(vq_hbm.at[(*pre, pg)], vq_buf.at[slot],
                                  sem.at[slot, 2]),
            pltpu.make_async_copy(vd_hbm.at[(*pre, pg)], vd_buf.at[slot],
                                  sem.at[slot, 3]),
        ]

    @pl.when(first < n_chunks)
    def _():
        for dma in dmas(first % 2, first):
            dma.start()

    def body(ci, carry):
        m, l, acc = carry
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            for dma in dmas((ci + 1) % 2, ci + 1):
                dma.start()

        for dma in dmas(slot, ci):
            dma.wait()

        s = jnp.concatenate([
            jax.lax.dot_general(
                q2[h * rep:(h + 1) * rep],
                kq_buf[slot, h].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) * kd_buf[slot, h] for h in range(hkv)
        ], axis=0)
        if softcap:
            s = jnp.tanh(s / softcap) * softcap
        col = ci * page + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((col < length) & (col >= start), s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        pv = jnp.concatenate([
            jax.lax.dot_general(
                p[h * rep:(h + 1) * rep] * vd_buf[slot, h],
                vq_buf[slot, h].astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ) for h in range(hkv)
        ], axis=0)
        acc = acc * alpha + pv
        return m_new, l, acc

    m0 = jnp.full((hr, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((hr, 1), jnp.float32)
    acc0 = jnp.zeros((hr, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).reshape(hkv, rep, d)


@functools.partial(
    jax.jit, static_argnames=("scale", "softcap", "interpret", "layer")
)
def flash_decode_paged_q8(
    q: jax.Array,  # [B, H, D]
    k_qs: jax.Array,  # [P, Hkv, ps, D] int8 — or [L, P, ...] with layer given
    k_d: jax.Array,  # [P, Hkv, 1, ps] f32 (same)
    v_qs: jax.Array,
    v_d: jax.Array,
    tables: jax.Array,
    lengths: jax.Array,
    starts: jax.Array | None = None,
    *,
    scale: float,
    softcap: float = 0.0,
    interpret: bool | None = None,
    layer: int | None = None,
) -> jax.Array:
    """Paged + Q8-quantized decode attention: page pools stay int8 in HBM,
    per-row scales fold into score/prob scaling, block tables ride the
    scalar prefetch."""
    import os

    bsz, hq, d = q.shape
    n_pages, hkv, ps = (k_qs.shape[:3] if layer is None
                        else k_qs.shape[1:4])
    rep = hq // hkv
    if starts is None:
        starts = jnp.zeros_like(lengths)
    tables = jnp.minimum(tables, n_pages - 1)

    if (hkv > 1 and 4 * hkv * ps * d <= _ALLH_BUF_BYTES
            and not os.environ.get("LLAMA_TPU_NO_ATTN_ALLH")):
        qg = q.reshape(bsz, hkv, rep, d)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bsz,),
            in_specs=[
                pl.BlockSpec((1, hkv, rep, d), lambda b, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, hkv, rep, d), lambda b, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, hkv, ps, d), jnp.int8),
                pltpu.VMEM((2, hkv, 1, ps), jnp.float32),
                pltpu.VMEM((2, hkv, ps, d), jnp.int8),
                pltpu.VMEM((2, hkv, 1, ps), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 4)),
            ],
        )
        out = pl.pallas_call(
            functools.partial(_decode_kernel_paged_q8_allh, scale=scale,
                              page=ps, softcap=softcap, layer=layer, hkv=hkv),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((bsz, hkv, rep, d), jnp.float32),
            interpret=_resolve_interpret(interpret),
        )(tables.astype(jnp.int32), lengths.astype(jnp.int32),
          starts.astype(jnp.int32), qg, k_qs, k_d, v_qs, v_d)
        return out.reshape(bsz, hq, d)

    qg = q.reshape(bsz, hkv, rep, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bsz, hkv),
        in_specs=[
            pl.BlockSpec((1, 1, rep, d), lambda b, h, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, rep, d), lambda b, h, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, ps, d), jnp.int8),
            pltpu.VMEM((2, 1, ps), jnp.float32),
            pltpu.VMEM((2, ps, d), jnp.int8),
            pltpu.VMEM((2, 1, ps), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel_paged_q8, scale=scale, page=ps,
                          softcap=softcap, layer=layer),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, rep, d), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(tables.astype(jnp.int32), lengths.astype(jnp.int32),
      starts.astype(jnp.int32), qg, k_qs, k_d, v_qs, v_d)
    return out.reshape(bsz, hq, d)


# ---------------------------------------------------------------------------
# Prefill (T > 1) flash attention — the reference's full FlashAttention
# prefill path (ggml-cuda/fattn-mma-f16.cuh tile kernels). TPU-native form:
# grid (B, Hkv, q-tiles); each program owns one (slot, kv-head, TQ-row query
# tile) and its GQA group packed as a [TQ*rep, D] MXU operand. K/V chunks
# stream HBM→VMEM double-buffered; HBM traffic stops at the tile's causal
# limit, so chunked long-context prefill reads each written row once instead
# of the cache capacity (the jnp fallback computes the full [T, S] mask).
# ---------------------------------------------------------------------------


def _prefill_kernel(
    start_ref,  # SMEM [B] int32: query-0 absolute position (= n_past)
    q_ref,  # VMEM [1, 1, TQ, rep, D]
    k_hbm,  # ANY [B, Hkv, S, D]
    v_hbm,  # ANY
    o_ref,  # VMEM [1, 1, TQ, rep, D] f32
    k_buf,  # VMEM [2, CHUNK, D]
    v_buf,
    sem,
    *,
    scale: float,
    chunk: int,
    tq: int,
    softcap: float,
    swa_window: int,
    attn_chunk: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    ti = pl.program_id(2)
    n_past = start_ref[b]
    q0 = n_past + ti * tq  # absolute position of the tile's first query row

    q = q_ref[0, 0].astype(jnp.float32) * scale  # [TQ, rep, D]
    tq_, rep, d = q.shape
    qf = q.reshape(tq_ * rep, d)  # row r ↔ query i = r // rep
    # rows beyond the last valid query are padding; their outputs are
    # discarded by the caller (they still attend [0, length) — no NaNs)
    row_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (tq_ * rep, 1), 0) // rep

    limit = q0 + tq_  # causal bound for the whole tile (last row's pos + 1)
    first = jnp.int32(0)
    if swa_window:
        first = jnp.maximum(q0 - swa_window + 1, 0) // chunk
    elif attn_chunk:
        first = (q0 // attn_chunk) * attn_chunk // chunk
    n_chunks = pl.cdiv(limit, chunk)

    def k_dma(slot, ci):
        return pltpu.make_async_copy(
            k_hbm.at[b, h, pl.ds(ci * chunk, chunk), :],
            k_buf.at[slot], sem.at[slot, 0])

    def v_dma(slot, ci):
        return pltpu.make_async_copy(
            v_hbm.at[b, h, pl.ds(ci * chunk, chunk), :],
            v_buf.at[slot], sem.at[slot, 1])

    @pl.when(first < n_chunks)
    def _():
        k_dma(first % 2, first).start()
        v_dma(first % 2, first).start()

    def body(ci, carry):
        m, l, acc = carry  # [R,1], [R,1], [R,D] f32 (R = TQ*rep)
        slot = ci % 2

        @pl.when(ci + 1 < n_chunks)
        def _():
            k_dma((ci + 1) % 2, ci + 1).start()
            v_dma((ci + 1) % 2, ci + 1).start()

        k_dma(slot, ci).wait()
        v_dma(slot, ci).wait()

        kc = k_buf[slot].astype(jnp.float32)
        vc = v_buf[slot].astype(jnp.float32)
        s = jax.lax.dot_general(
            qf, kc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [R, CHUNK]
        if softcap:
            s = jnp.tanh(s / softcap) * softcap
        col = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        ok = col <= row_pos  # causal (cache rows beyond n_past+T unwritten)
        if swa_window:
            ok &= col > row_pos - swa_window
        elif attn_chunk:
            ok &= col >= (row_pos // attn_chunk) * attn_chunk
        s = jnp.where(ok, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vc, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l, acc

    r = tq_ * rep
    m0 = jnp.full((r, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((r, 1), jnp.float32)
    acc0 = jnp.zeros((r, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).reshape(tq_, rep, d)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "chunk", "tile_q", "softcap", "swa_window",
                     "attn_chunk", "interpret"),
)
def flash_prefill(
    q: jax.Array,  # [B, T, H, D] roped queries
    k: jax.Array,  # [B, Hkv, S, D] cache (rows [0, n_past+T) written)
    v: jax.Array,
    n_past: jax.Array,  # [B] int32 — first query's absolute position
    *,
    scale: float,
    chunk: int = 512,
    tile_q: int = 0,
    softcap: float = 0.0,
    swa_window: int = 0,
    attn_chunk: int = 0,
    interpret: bool | None = None,
) -> jax.Array:
    """Returns [B, T, H, D] f32. Queries at absolute positions
    n_past[b] + t attend causally to cache rows [start, pos]."""
    bsz, t, hq, d = q.shape
    hkv, s = k.shape[1], k.shape[2]
    rep = hq // hkv
    chunk = min(chunk, s)
    while s % chunk:
        chunk //= 2
    assert chunk >= 8, (s, chunk)
    if tile_q == 0:  # auto: ~1024 packed rows per tile keeps VMEM ≤ ~8 MB
        tile_q = max(8, 1024 // rep)
    tq = min(tile_q, t)
    while t % tq:
        tq -= 1  # largest divisor ≤ tile_q (T is bucket-padded upstream)

    # [B, Hkv, T, rep, D]: tile queries along T with the GQA group adjacent
    qg = q.reshape(bsz, t, hkv, rep, d).transpose(0, 2, 1, 3, 4)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz, hkv, t // tq),
        in_specs=[
            pl.BlockSpec((1, 1, tq, rep, d), lambda b, h, i, *_: (b, h, i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tq, rep, d), lambda b, h, i, *_: (b, h, i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, d), k.dtype),
            pltpu.VMEM((2, chunk, d), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _prefill_kernel, scale=scale, chunk=chunk, tq=tq,
            softcap=softcap, swa_window=swa_window, attn_chunk=attn_chunk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, t, rep, d), jnp.float32),
        interpret=_resolve_interpret(interpret),
    )(n_past.astype(jnp.int32), qg, k, v)
    return out.transpose(0, 2, 1, 3, 4).reshape(bsz, t, hq, d)
