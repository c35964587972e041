"""One-shot real-TPU validation of kernels added while the tunnel was down.

Run: python scripts/tpu_validate.py [--skip-bench]
Checks, in order (each prints PASS/FAIL and continues):
  1. qmm_expert_rows (MoE selected-expert GEMV) compiles + matches XLA
  2. flash_decode_q4 (q4 KV) compiles + matches dequant reference
  3. mla_flash_decode compiles + matches the XLA MLA path
  4. flash_prefill vs XLA prefill (the LLAMA_TPU_FLASH_PREFILL gate)
  5. bench.py default decode + --pp 512 prefill numbers
"""

from __future__ import annotations

import contextlib
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

from llama_cpp_dsp_tpu.utils.jax_setup import setup_jax

setup_jax()
import jax
import jax.numpy as jnp
import numpy as np

print(f"devices: {jax.devices()}", flush=True)
assert jax.devices()[0].platform == "tpu", "not on TPU"


@contextlib.contextmanager
def _env(key, value):
    """Set an env var for the block, restoring the caller's prior value."""
    prev = os.environ.get(key)
    os.environ[key] = value
    try:
        yield
    finally:
        if prev is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = prev


results = {}


def check(name):
    def deco(fn):
        t0 = time.time()
        try:
            fn()
            results[name] = f"PASS ({time.time()-t0:.0f}s)"
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {type(e).__name__}: {e}"
        print(f"{name}: {results[name]}", flush=True)
    return deco


def nmse(a, b):
    d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
    return float((d * d).mean() / ((np.asarray(b, np.float64) ** 2).mean() + 1e-12))


@check("expert_gemv")
def _():
    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.ops.qtensor import QTensor, from_gguf_tensor
    from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout_experts
    from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_expert_rows
    from llama_cpp_dsp_tpu.quant import quantize
    from llama_cpp_dsp_tpu.quant.jax_dequant import dequant

    rng = np.random.default_rng(0)
    e, n, k, s = 4, 512, 1024, 8
    subs, dense = [], []
    for _ in range(e):
        w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
        qt = from_gguf_tensor(quantize(w, GGMLType.Q4_K), GGMLType.Q4_K, (n, k))
        subs.append(qt)
        dense.append(np.asarray(dequant(qt, jnp.float32)))
    arrays = {key: np.stack([np.asarray(q.arrays[key]) for q in subs])
              for key in subs[0].arrays}
    kw = to_kernel_layout_experts(
        QTensor(GGMLType.Q4_K, (n, k), arrays, n_expert=e))
    x = rng.standard_normal((s, k)).astype(np.float32)
    sel = np.asarray(rng.integers(0, e, s), np.int32)
    got = np.asarray(qmm_expert_rows(jnp.asarray(x), kw, jnp.asarray(sel)))
    want = np.stack([x[i] @ dense[sel[i]].T for i in range(s)])
    err = nmse(got, want)
    assert err < 5e-4, err


@check("flash_decode_q4")
def _():
    from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode_q4
    from llama_cpp_dsp_tpu.runtime.kv_cache import Q4KVCache

    rng = np.random.default_rng(1)
    b, hq, hkv, d, s = 2, 8, 4, 128, 1024
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    cache = Q4KVCache.create(1, b, s, hkv, d)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v), 0)
    lengths = np.array([900, 33], np.int32)
    out = np.asarray(flash_decode_q4(
        jnp.asarray(q), *cache.packed_layer(0), jnp.asarray(lengths),
        scale=d ** -0.5, interpret=False))
    kd, vd = cache.layer(0)
    kd, vd = np.asarray(kd, np.float32), np.asarray(vd, np.float32)
    ref = []
    for bi in range(b):
        hs = []
        for h in range(hq):
            kk = kd[bi, h * hkv // hq]
            vv = vd[bi, h * hkv // hq]
            sc = (q[bi, h] @ kk.T) * d ** -0.5
            sc[lengths[bi]:] = -1e30
            p = np.exp(sc - sc.max())
            p /= p.sum()
            hs.append(p @ vv)
        ref.append(np.stack(hs))
    err = nmse(out, np.stack(ref))
    assert err < 1e-4, err


@check("qmm_split_g")
def _():
    # round-4 split-G layout (layouts.split_g): 13B-shape K values whose
    # per-tile group count is not a 128 multiple; exactness vs XLA dequant
    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.ops.qtensor import from_gguf_tensor
    from llama_cpp_dsp_tpu.ops.pallas.layouts import split_g, to_kernel_layout
    from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_fused
    from llama_cpp_dsp_tpu.quant import quantize
    from llama_cpp_dsp_tpu.quant.jax_dequant import dequant

    rng = np.random.default_rng(9)
    for kind, k in ((GGMLType.Q4_0, 5120), (GGMLType.Q4_0, 13824),
                    (GGMLType.Q8_0, 5120)):
        assert split_g(k // 32) > 0
        n = 512
        w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
        qt = from_gguf_tensor(quantize(w, kind), kind, (n, k))
        kw = to_kernel_layout(qt, tile_k=k)
        x = rng.standard_normal((2, k)).astype(np.float32)
        want = x @ np.asarray(dequant(qt, jnp.float32)).T
        got = np.asarray(qmm_fused(jnp.asarray(x), kw))
        err = nmse(got, want)
        assert err < 5e-4, (kind.name, k, err)


@check("flash_decode_q8_allh")
def _():
    # round-4 all-heads q8 decode body (one strided DMA per chunk covers
    # every kv head); validate vs the dequantized-cache softmax reference
    from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode_q8
    from llama_cpp_dsp_tpu.runtime.kv_cache import QuantKVCache

    rng = np.random.default_rng(7)
    b, hq, hkv, d, s = 2, 8, 4, 128, 1024
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    cache = QuantKVCache.create(1, b, s, hkv, d)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v), 0)
    lengths = np.array([900, 33], np.int32)
    out = np.asarray(flash_decode_q8(
        jnp.asarray(q), *cache.packed_layer(0), jnp.asarray(lengths),
        scale=d ** -0.5, interpret=False))
    kd, vd = cache.layer(0)
    kd, vd = np.asarray(kd, np.float32), np.asarray(vd, np.float32)
    ref = []
    for bi in range(b):
        hs = []
        for h in range(hq):
            kk = kd[bi, h * hkv // hq]
            vv = vd[bi, h * hkv // hq]
            sc = (q[bi, h] @ kk.T) * d ** -0.5
            sc[lengths[bi]:] = -1e30
            p = np.exp(sc - sc.max())
            p /= p.sum()
            hs.append(p @ vv)
        ref.append(np.stack(hs))
    err = nmse(out, np.stack(ref))
    assert err < 1e-4, err


@check("mla_flash_decode")
def _():
    from llama_cpp_dsp_tpu.ops.pallas.attention import mla_flash_decode

    rng = np.random.default_rng(2)
    b, h, cdim, r, s = 2, 16, 640, 512, 1024
    q = rng.standard_normal((b, h, cdim)).astype(np.float32) * 0.1
    c = rng.standard_normal((b, 1, s, cdim)).astype(np.float32) * 0.1
    lengths = np.array([800, 60], np.int32)
    out = np.asarray(mla_flash_decode(
        jnp.asarray(q), jnp.asarray(c, jnp.bfloat16), jnp.asarray(lengths),
        scale=0.1, r=r, interpret=False))
    cf = np.asarray(jnp.asarray(c, jnp.bfloat16), np.float32)
    ref = []
    for bi in range(b):
        sc = (q[bi] @ cf[bi, 0].T) * 0.1
        sc[:, lengths[bi]:] = -1e30
        p = np.exp(sc - sc.max(axis=1, keepdims=True))
        p /= p.sum(axis=1, keepdims=True)
        ref.append(p @ cf[bi, 0, :, :r])
    err = nmse(out, np.stack(ref))
    assert err < 1e-4, err


@check("flash_prefill_gate")
def _():
    import os

    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.models.llama import forward
    from llama_cpp_dsp_tpu.models.registry import synth_config
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
    from llama_cpp_dsp_tpu.tools.synth import synth_params

    cfg = synth_config("llama", n_embd=256, n_heads=2, n_kv_heads=2,
                       head_dim=128, n_ff=512, n_vocab=256)
    params = synth_params(cfg, GGMLType.Q8_0, seed=0, tie=False)
    t, n_ctx = 128, 256
    toks = jnp.zeros((1, t), jnp.int32)
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    outs = {}
    for flag in ("0", "1"):
        os.environ["LLAMA_TPU_FLASH_PREFILL"] = flag
        cache = KVCache.create(cfg.n_layers, 1, n_ctx, cfg.n_kv_heads,
                               cfg.head_dim)
        mask = causal_mask(pos, n_ctx, 0)
        logits, _ = forward(params, cfg, toks, pos, cache, 0, mask,
                            flash=(flag == "1"))
        outs[flag] = np.asarray(logits)
    os.environ.pop("LLAMA_TPU_FLASH_PREFILL", None)
    err = nmse(outs["1"], outs["0"])
    assert err < 1e-4, err


@check("chunked_decode_scan")
def _():
    """_step_sample_chunk (lax.scan decode+sample) compiles under the
    Mosaic kernels and matches single-step greedy on the same state."""
    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.models.registry import synth_config
    from llama_cpp_dsp_tpu.runtime.context import LlamaContext
    from llama_cpp_dsp_tpu.runtime.loader import LoadedModel
    from llama_cpp_dsp_tpu.runtime.sampling import make_chain
    from llama_cpp_dsp_tpu.tools.synth import synth_params

    import os

    cfg = synth_config("llama", n_embd=256, n_heads=2, n_kv_heads=2,
                       head_dim=128, n_ff=512, n_vocab=256)
    params = synth_params(cfg, GGMLType.Q4_K, seed=3, tie=False)
    model = LoadedModel(cfg=cfg, params=params, vocab=None, tokenizer=None,
                        kv={})
    outs = {}
    for chunk in (1, 8):
        os.environ["LLAMA_TPU_DECODE_CHUNK"] = str(chunk)
        ctx = LlamaContext(model, n_ctx=256)
        outs[chunk] = list(ctx.generate([1, 2, 3], max_new_tokens=17,
                                        sampler=make_chain(temp=0.0),
                                        stop_on_eog=False))
    os.environ.pop("LLAMA_TPU_DECODE_CHUNK", None)
    assert outs[1] == outs[8], (outs[1], outs[8])


@check("flash_decode_paged")
def _():
    """Paged flash decode (+q8 pool variant): block tables on scalar
    prefetch; compares against the contiguous dequant reference."""
    from llama_cpp_dsp_tpu.ops.pallas.attention import (
        flash_decode_paged, flash_decode_paged_q8,
    )

    rng = np.random.default_rng(3)
    b, hq, hkv, d, ps, n_pages, tpp = 2, 8, 4, 128, 128, 20, 8
    q = rng.standard_normal((b, hq, d)).astype(np.float32) * 0.3
    pool_k = (rng.standard_normal((n_pages, hkv, ps, d)) * 0.3).astype(np.float32)
    pool_v = (rng.standard_normal((n_pages, hkv, ps, d)) * 0.3).astype(np.float32)
    tables = np.asarray(
        rng.permutation(n_pages)[: b * tpp].reshape(b, tpp), np.int32)
    lengths = np.array([900, 200], np.int32)

    def ref(kpool, vpool):
        outs = []
        for bi in range(b):
            kk = np.concatenate([kpool[p] for p in tables[bi]], axis=1)
            vv = np.concatenate([vpool[p] for p in tables[bi]], axis=1)
            hs = []
            for h in range(hq):
                sc = (q[bi, h] @ kk[h * hkv // hq].T) * d ** -0.5
                sc[lengths[bi]:] = -1e30
                p = np.exp(sc - sc.max()); p /= p.sum()
                hs.append(p @ vv[h * hkv // hq])
            outs.append(np.stack(hs))
        return np.stack(outs)

    out = np.asarray(flash_decode_paged(
        jnp.asarray(q), jnp.asarray(pool_k, jnp.bfloat16),
        jnp.asarray(pool_v, jnp.bfloat16), jnp.asarray(tables),
        jnp.asarray(lengths), scale=d ** -0.5, interpret=False))
    kb = np.asarray(jnp.asarray(pool_k, jnp.bfloat16), np.float32)
    vb = np.asarray(jnp.asarray(pool_v, jnp.bfloat16), np.float32)
    err = nmse(out, ref(kb, vb))
    assert err < 1e-4, f"paged: {err}"

    # q8 pool variant
    from llama_cpp_dsp_tpu.runtime.kv_cache import _q8_dequant, _q8_quant

    kq, kd = _q8_quant(jnp.asarray(pool_k))  # d: [P, Hkv, ps]
    vq, vd = _q8_quant(jnp.asarray(pool_v))
    out8 = np.asarray(flash_decode_paged_q8(
        jnp.asarray(q), kq, kd[:, :, None, :], vq, vd[:, :, None, :],
        jnp.asarray(tables), jnp.asarray(lengths), scale=d ** -0.5,
        interpret=False))
    kdq = np.asarray(_q8_dequant(kq, kd, jnp.float32))
    vdq = np.asarray(_q8_dequant(vq, vd, jnp.float32))
    err8 = nmse(out8, ref(kdq, vdq))
    assert err8 < 1e-4, f"paged_q8: {err8}"


@check("qmm_whole_k")
def _():
    """Whole-K down-proj tiling (tile_k=K, nk=1 — the default for
    K=14336) matches the XLA dequant matmul."""
    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout
    from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_fused
    from llama_cpp_dsp_tpu.ops.qtensor import from_gguf_tensor
    from llama_cpp_dsp_tpu.quant import quantize
    from llama_cpp_dsp_tpu.quant.jax_dequant import dequant

    rng = np.random.default_rng(4)
    # the two big-K cases that occur in-model: Q4_K down-proj (whole-K
    # 14336) and Q6_K lm_head-shaped (K=4096; K=14336 Q6_K would need
    # tile_k 7168 × tile_n 512 ≈ 21MB scoped VMEM and never occurs)
    for kind, k in ((GGMLType.Q4_K, 14336), (GGMLType.Q6_K, 4096)):
        n = 512
        w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
        qt = from_gguf_tensor(quantize(w, kind), kind, (n, k))
        kw = to_kernel_layout(qt)
        x = rng.standard_normal((1, k)).astype(np.float32)
        got = np.asarray(qmm_fused(jnp.asarray(x), kw))
        want = x @ np.asarray(dequant(qt, jnp.float32)).T
        err = nmse(got, want)
        assert err < 5e-4, f"{kind.name}: {err}"


@check("tp_kernels_shard_map")
def _():
    """make_tp_decode_step (shard_map + fused kernels over a 1-chip
    'tp' mesh) compiles and matches the single-device path. One real
    chip → tp=1 mesh; the multi-device variant runs in dryrun_multichip."""
    from jax.sharding import Mesh

    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.models.registry import synth_config
    from llama_cpp_dsp_tpu.parallel.tp_kernels import (
        make_tp_decode_step, shard_llama_kernel_params,
    )
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache
    from llama_cpp_dsp_tpu.tools.synth import synth_params

    cfg = synth_config("llama", n_embd=256, n_heads=2, n_kv_heads=2,
                       head_dim=128, n_ff=512, n_vocab=256)
    params = synth_params(cfg, GGMLType.Q4_K, seed=5, tie=False)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("tp",))
    sharded, specs = shard_llama_kernel_params(params, cfg, tp=1)
    step = make_tp_decode_step(cfg, mesh)(specs)
    cache = KVCache.create(cfg.n_layers, 1, 128, cfg.n_kv_heads, cfg.head_dim)
    toks = jnp.zeros((1, 1), jnp.int32)
    pos = jnp.zeros((1, 1), jnp.int32)
    logits, _ = step(sharded, cache, toks, pos, jnp.int32(0))
    assert np.isfinite(np.asarray(logits)).all()


@check("qmm_kpad")
def _():
    """K-padded layouts (layouts._k_pad_target zero-pads misaligned big-K
    weights to 4096 multiples) — exact vs XLA dequant on the chip."""
    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.ops.qtensor import from_gguf_tensor
    from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout
    from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_fused
    from llama_cpp_dsp_tpu.quant import quantize
    from llama_cpp_dsp_tpu.quant.jax_dequant import dequant

    rng = np.random.default_rng(7)
    for kind, k, padded in ((GGMLType.Q4_0, 11008, True),
                            (GGMLType.Q4_K, 14336, False),  # >12.5% — skip
                            (GGMLType.Q4_K, 11008, True)):
        n = 256
        w = (rng.standard_normal((n, k)) * 0.05).astype(np.float32)
        qt = from_gguf_tensor(quantize(w, kind), kind, (n, k))
        kw = to_kernel_layout(qt)
        assert (kw.shape[1] > k) == padded, (kind, kw.shape)
        x = (rng.standard_normal((2, k)) * 0.3).astype(np.float32)
        got = np.asarray(qmm_fused(jnp.asarray(x), kw))
        want = x @ np.asarray(dequant(qt, jnp.float32)).T
        err = nmse(got, want)
        assert err < 5e-4, (kind, err)


@check("flash_decode_allh")
def _():
    """All-heads decode kernel (one strided DMA per S-chunk; MHA +
    GQA shapes, bf16 KV, multi-chunk + SWA starts) vs the per-head
    kernel forced with LLAMA_TPU_NO_ATTN_ALLH."""
    import os

    from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode

    rng = np.random.default_rng(11)
    for hq, hkv, d, s in ((32, 32, 128, 256), (32, 8, 128, 1024)):
        b = 2
        q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, hkv, s, d)), jnp.bfloat16)
        lengths = jnp.asarray([s // 3 + 1, s], jnp.int32)
        starts = jnp.asarray([0, s // 4], jnp.int32)
        got = np.asarray(flash_decode(q, k, v, lengths, starts,
                                      scale=0.088388))
        flash_decode.clear_cache()
        try:
            with _env("LLAMA_TPU_NO_ATTN_ALLH", "1"):
                want = np.asarray(flash_decode(q, k, v, lengths, starts,
                                               scale=0.088388))
        finally:
            flash_decode.clear_cache()
        err = nmse(got, want)
        assert err < 1e-9, (hq, hkv, d, s, err)


@check("attn_decode_fused")
def _():
    # round-5 fused qkv+rope+KV-write+flash decode kernel vs the unfused
    # composition on the production kernel layout (MHA + GQA shapes)
    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.ops.pallas.attn_fused import attn_decode_fused
    from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode
    from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout
    from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_fused
    from llama_cpp_dsp_tpu.ops.qtensor import from_gguf_tensor
    from llama_cpp_dsp_tpu.ops.rope import RopeParams, _rope_angles, apply_rope
    from llama_cpp_dsp_tpu.quant import quantize

    rng = np.random.default_rng(17)
    for b, hq, hkv, k_dim, s_total, n_past in (
            (1, 8, 8, 1024, 256, 37),     # MHA (7B/13B class)
            (2, 8, 2, 512, 256, 129)):    # GQA, >1 chunk
        d = 128
        n_rows = (hq + 2 * hkv) * d
        w = (rng.standard_normal((n_rows, k_dim)) * 0.05).astype(np.float32)
        qt = from_gguf_tensor(quantize(w, GGMLType.Q4_0), GGMLType.Q4_0,
                              (n_rows, k_dim))
        kw = to_kernel_layout(qt, tile_k=k_dim)
        x = (rng.standard_normal((b, k_dim)) * 0.3).astype(np.float32)
        kc = (rng.standard_normal((b, hkv, s_total, d)) * 0.2)
        vc = (rng.standard_normal((b, hkv, s_total, d)) * 0.2)
        kc[:, :, n_past:] = 0
        vc[:, :, n_past:] = 0
        kcj = jnp.asarray(kc, jnp.bfloat16)
        vcj = jnp.asarray(vc, jnp.bfloat16)
        rp = RopeParams(n_dims=d, mode="norm")
        pos = jnp.full((b,), n_past, jnp.int32)
        cos, sin = _rope_angles(pos, rp, None)
        cs = jnp.repeat(cos, 2, -1).astype(jnp.float32)
        sn = jnp.repeat(sin, 2, -1).astype(jnp.float32)
        scale = 1.0 / d**0.5
        res = attn_decode_fused(jnp.asarray(x), kw, kcj, vcj, cs, sn,
                                pos + 1, None, n_heads=hq, n_kv_heads=hkv,
                                scale=scale)
        assert res is not None
        out_f, kc_f, vc_f = res
        qkv = qmm_fused(jnp.asarray(x), kw, tile_b=8, tile_n=256)
        q = qkv[:, :hq * d].reshape(b, 1, hq, d)
        kn = qkv[:, hq * d:(hq + hkv) * d].reshape(b, 1, hkv, d)
        vn = qkv[:, (hq + hkv) * d:].reshape(b, 1, hkv, d)
        q = apply_rope(q, pos[:, None], rp).astype(jnp.bfloat16)
        kn = apply_rope(kn, pos[:, None], rp).astype(jnp.bfloat16)
        bi = jnp.arange(b)
        kc_u = kcj.at[bi, :, pos].set(kn[:, 0], mode="drop")
        vc_u = vcj.at[bi, :, pos].set(vn[:, 0].astype(jnp.bfloat16),
                                      mode="drop")
        out_u = flash_decode(q[:, 0].astype(jnp.float32), kc_u, vc_u,
                             pos + 1, None, scale=scale)
        np.testing.assert_array_equal(np.asarray(kc_f, np.float32),
                                      np.asarray(kc_u, np.float32))
        np.testing.assert_array_equal(np.asarray(vc_f, np.float32),
                                      np.asarray(vc_u, np.float32))
        err = np.abs(np.asarray(out_f, np.float32).reshape(b, hq, d)
                     - np.asarray(out_u, np.float32)).max()
        assert err < 2e-2, (b, hq, hkv, err)


if "--skip-bench" not in sys.argv:
    for args in (["--steps", "32"], ["--pp", "512"], ["--batch", "4", "--steps", "32"]):
        print(f"bench {args}:", flush=True)
        subprocess.run([sys.executable, "bench.py", *args], check=False)

print("\n== summary ==")
for k, v in results.items():
    print(f"  {k}: {v}")
sys.exit(1 if any(v.startswith("FAIL") for v in results.values()) else 0)
