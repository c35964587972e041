"""Paged KV cache: write/gather equivalence vs the contiguous cache, paged
flash-decode kernel parity (interpret mode), shared-prefix page aliasing
with copy-on-write, and forward_packed integration."""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward_packed
from llama_cpp_dsp_tpu.models.registry import synth_config
from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode, flash_decode_paged
from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache
from llama_cpp_dsp_tpu.runtime.paged_kv import (
    PageAllocator, PagedKVCache, PagedSeq,
)
from llama_cpp_dsp_tpu.tools.synth import synth_params

L, HKV, PS, D = 2, 2, 8, 32
N_PAGES, N_SEQS, MAX_BLOCKS = 16, 3, 4


def _fill(rng, seqs_tokens):
    """Write per-seq random K/V rows into both cache kinds."""
    alloc = PageAllocator(N_PAGES)
    seqs = [PagedSeq(alloc, MAX_BLOCKS) for _ in range(N_SEQS)]
    paged = PagedKVCache.create(L, N_PAGES, N_SEQS, MAX_BLOCKS, HKV, D,
                                page_size=PS, dtype=jnp.float32)
    dense = KVCache.create(L, N_SEQS, MAX_BLOCKS * PS, HKV, D, jnp.float32)
    store = {}
    for s, n in enumerate(seqs_tokens):
        if seqs[s].ensure(n, PS):
            paged = paged.set_table_row(s, seqs[s].table_row(N_PAGES))
        k = rng.standard_normal((L, n, HKV, D)).astype(np.float32)
        v = rng.standard_normal((L, n, HKV, D)).astype(np.float32)
        store[s] = (k, v)
        rows = jnp.asarray(np.arange(n, dtype=np.int32))
        sid = jnp.full(n, s, jnp.int32)
        for layer in range(L):
            paged = paged.write_packed(layer, jnp.asarray(k[layer]),
                                       jnp.asarray(v[layer]), sid, rows)
            sub = dense.slot_view(jnp.int32(s))
            sub = sub.write(layer, jnp.asarray(k[layer])[None],
                            jnp.asarray(v[layer])[None], 0)
            dense = dense.merge_slot(sub, jnp.int32(s))
    return alloc, seqs, paged, dense, store


def test_write_and_gather_matches_dense():
    rng = np.random.default_rng(0)
    lens = [5, 13, 20]
    _, _, paged, dense, _ = _fill(rng, lens)
    for layer in range(L):
        kp, vp = paged.layer(layer)
        kd, vd = dense.layer(layer)
        for s, n in enumerate(lens):
            np.testing.assert_allclose(np.asarray(kp[s, :, :n]),
                                       np.asarray(kd[s, :, :n]), atol=0)
            np.testing.assert_allclose(np.asarray(vp[s, :, :n]),
                                       np.asarray(vd[s, :, :n]), atol=0)


def test_paged_flash_matches_dense_flash():
    rng = np.random.default_rng(1)
    lens = [7, 17, 29]
    _, _, paged, dense, _ = _fill(rng, lens)
    q = jnp.asarray(rng.standard_normal((N_SEQS, HKV * 2, D)).astype(np.float32))
    lengths = jnp.asarray(np.asarray(lens, np.int32))
    ref = flash_decode(q, *dense.layer(0), lengths, scale=0.2, interpret=True)
    got = flash_decode_paged(q, paged.k[0], paged.v[0], paged.tables,
                             lengths, scale=0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_shared_prefix_alias_and_cow():
    rng = np.random.default_rng(2)
    lens = [20, 0, 0]
    alloc, seqs, paged, _, store = _fill(rng, lens)

    # seq 1 aliases seq 0's full pages covering 20 tokens (2 full pages)
    shared = seqs[1].share_prefix_from(seqs[0], 20, PS)
    assert shared == 16  # floor to page boundary
    assert seqs[1].pages[:2] == seqs[0].pages[:2]
    assert alloc.refs[seqs[0].pages[0]] == 2
    paged = paged.set_table_row(1, seqs[1].table_row(N_PAGES))

    # gather view of seq 1 equals seq 0 over the shared range — no copies
    k1, _ = paged.layer(0)
    np.testing.assert_allclose(np.asarray(k1[1, :, :16]),
                               np.asarray(k1[0, :, :16]), atol=0)

    # writing into the shared range must COW first
    seqs[1].ensure(17, PS)  # needs block 2... shared covers 16 tokens
    paged = paged.set_table_row(1, seqs[1].table_row(N_PAGES))
    # write at pos 16 → block 2 is exclusive, no COW needed; write at pos 8
    # (block 1, shared) requires make_writable
    paged, copied = seqs[1].make_writable(1, paged)
    assert copied
    assert seqs[1].pages[1] != seqs[0].pages[1]
    assert alloc.refs[seqs[0].pages[1]] == 1
    paged = paged.set_table_row(1, seqs[1].table_row(N_PAGES))
    newk = jnp.asarray(rng.standard_normal((1, HKV, D)).astype(np.float32))
    paged = paged.write_packed(0, newk, newk, jnp.asarray([1], jnp.int32),
                               jnp.asarray([8], jnp.int32))
    k, _ = paged.layer(0)
    np.testing.assert_allclose(np.asarray(k[1, :, 8]), np.asarray(newk[0]))
    # donor unchanged
    np.testing.assert_allclose(np.asarray(k[0, :, 8]),
                               store[0][0][0, 8], rtol=1e-6)

    # release seq1 → refcounts drop, pages recycle
    free_before = alloc.n_free
    seqs[1].release()
    assert alloc.n_free > free_before


def test_forward_packed_with_paged_cache():
    cfg = synth_config("llama")
    params = synth_params(cfg, GGMLType.Q8_0, seed=3, tie=False)
    rng = np.random.default_rng(4)
    prompt = list(rng.integers(1, cfg.n_vocab, 9))

    n_ctx = MAX_BLOCKS * PS
    dense = KVCache.create(cfg.n_layers, 2, n_ctx, cfg.kv_cache_heads,
                           cfg.kv_cache_dim, jnp.float32)
    alloc = PageAllocator(N_PAGES)
    seq = PagedSeq(alloc, MAX_BLOCKS)
    paged = PagedKVCache.create(cfg.n_layers, N_PAGES, 2, MAX_BLOCKS,
                                cfg.kv_cache_heads, cfg.kv_cache_dim,
                                page_size=PS, dtype=jnp.float32)
    seq.ensure(len(prompt), PS)
    paged = paged.set_table_row(0, seq.table_row(N_PAGES))

    p = 16
    tokens = np.zeros(p, np.int32)
    slot_ids = np.zeros(p, np.int32)
    rows = np.full(p, n_ctx, np.int32)
    tokens[: len(prompt)] = prompt
    rows[: len(prompt)] = np.arange(len(prompt))
    out_idx = np.array([len(prompt) - 1, 0], np.int32)

    args = (jnp.asarray(tokens), jnp.asarray(slot_ids), jnp.asarray(rows))
    ref, _ = forward_packed(params, cfg, *args, dense, jnp.asarray(out_idx),
                            compute_dtype=jnp.float32)
    got, _ = forward_packed(params, cfg, *args, paged, jnp.asarray(out_idx),
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(ref)[0],
                               rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Q8-quantized paged cache


def _fill_q8(rng, seqs_tokens, ps=PS, max_blocks=MAX_BLOCKS,
             n_pages=N_PAGES):
    """Write per-seq random K/V rows into paged-q8 and dense-q8 caches."""
    from llama_cpp_dsp_tpu.runtime.kv_cache import QuantKVCache
    from llama_cpp_dsp_tpu.runtime.paged_kv import PagedQuantKVCache

    alloc = PageAllocator(n_pages)
    seqs = [PagedSeq(alloc, max_blocks) for _ in range(N_SEQS)]
    paged = PagedQuantKVCache.create(L, n_pages, N_SEQS, max_blocks, HKV, D,
                                     page_size=ps)
    dense = QuantKVCache.create(L, N_SEQS, max_blocks * ps, HKV, D)
    for s, n in enumerate(seqs_tokens):
        if seqs[s].ensure(n, ps):
            paged = paged.set_table_row(s, seqs[s].table_row(n_pages))
        k = rng.standard_normal((L, n, HKV, D)).astype(np.float32)
        v = rng.standard_normal((L, n, HKV, D)).astype(np.float32)
        rows = jnp.asarray(np.arange(n, dtype=np.int32))
        sid = jnp.full(n, s, jnp.int32)
        for layer in range(L):
            paged = paged.write_packed(layer, jnp.asarray(k[layer]),
                                       jnp.asarray(v[layer]), sid, rows)
            dense = dense.write_packed(layer, jnp.asarray(k[layer]),
                                       jnp.asarray(v[layer]), sid, rows)
    return alloc, seqs, paged, dense


def test_paged_q8_write_matches_dense_q8():
    rng = np.random.default_rng(5)
    lens = [5, 13, 20]
    _, _, paged, dense, = _fill_q8(rng, lens)
    for layer in range(L):
        kp, vp = paged.layer(layer)
        kd, vd = dense.layer(layer)
        for s, n in enumerate(lens):
            np.testing.assert_allclose(np.asarray(kp[s, :, :n]),
                                       np.asarray(kd[s, :, :n]), atol=0)
            np.testing.assert_allclose(np.asarray(vp[s, :, :n]),
                                       np.asarray(vd[s, :, :n]), atol=0)


def test_paged_q8_flash_matches_dense_q8_flash():
    from llama_cpp_dsp_tpu.ops.pallas.attention import (
        flash_decode_paged_q8, flash_decode_q8,
    )

    rng = np.random.default_rng(6)
    lens = [70, 150, 250]  # dense q8 kernel needs 128-aligned chunks
    _, _, paged, dense = _fill_q8(rng, lens, ps=128, max_blocks=2, n_pages=8)
    q = jnp.asarray(rng.standard_normal((N_SEQS, HKV * 2, D)).astype(np.float32))
    lengths = jnp.asarray(np.asarray(lens, np.int32))
    ref = flash_decode_q8(q, *dense.packed_layer(0), lengths,
                          scale=0.2, interpret=True)
    got = flash_decode_paged_q8(q, *paged.packed_pages(0), paged.tables,
                                lengths, scale=0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_paged_q8_gather_scatter_roundtrip():
    rng = np.random.default_rng(7)
    _, _, paged, _ = _fill_q8(rng, [PS * 2, 0, 0])
    k, v = paged.gather_seq(0)
    paged2 = paged.scatter_seq(0, k, v)
    k2, v2 = paged2.gather_seq(0)
    # requantizing already-quantized rows is idempotent up to f32 rounding
    np.testing.assert_allclose(np.asarray(k2, np.float32),
                               np.asarray(k, np.float32), rtol=1e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(v2, np.float32),
                               np.asarray(v, np.float32), rtol=1e-2, atol=2e-2)


def test_forward_packed_with_paged_q8_cache():
    from llama_cpp_dsp_tpu.runtime.kv_cache import QuantKVCache
    from llama_cpp_dsp_tpu.runtime.paged_kv import PagedQuantKVCache

    cfg = synth_config("llama")
    params = synth_params(cfg, GGMLType.Q8_0, seed=8, tie=False)
    rng = np.random.default_rng(9)
    prompt = list(rng.integers(1, cfg.n_vocab, 9))

    n_ctx = MAX_BLOCKS * PS
    dense = QuantKVCache.create(cfg.n_layers, 2, n_ctx, cfg.kv_cache_heads,
                                cfg.kv_cache_dim)
    alloc = PageAllocator(N_PAGES)
    seq = PagedSeq(alloc, MAX_BLOCKS)
    paged = PagedQuantKVCache.create(cfg.n_layers, N_PAGES, 2, MAX_BLOCKS,
                                     cfg.kv_cache_heads, cfg.kv_cache_dim,
                                     page_size=PS)
    seq.ensure(len(prompt), PS)
    paged = paged.set_table_row(0, seq.table_row(N_PAGES))

    p = 16
    tokens = np.zeros(p, np.int32)
    slot_ids = np.zeros(p, np.int32)
    rows = np.full(p, n_ctx, np.int32)
    tokens[: len(prompt)] = prompt
    rows[: len(prompt)] = np.arange(len(prompt))
    out_idx = np.array([len(prompt) - 1, 0], np.int32)

    args = (jnp.asarray(tokens), jnp.asarray(slot_ids), jnp.asarray(rows))
    ref, _ = forward_packed(params, cfg, *args, dense, jnp.asarray(out_idx),
                            compute_dtype=jnp.float32)
    got, _ = forward_packed(params, cfg, *args, paged, jnp.asarray(out_idx),
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got)[0], np.asarray(ref)[0],
                               rtol=2e-4, atol=2e-4)


# -- PagedQ4KVCache (row-pair packed pages) -----------------------------------


def test_paged_q4_write_read_roundtrip():
    from llama_cpp_dsp_tpu.runtime.paged_kv import PagedQ4KVCache

    rng = np.random.default_rng(0)
    cache = PagedQ4KVCache.create(1, n_pages=4, n_seqs=2, max_blocks=2,
                                  n_kv_heads=1, head_dim=32, page_size=4)
    cache = cache.set_table_row(0, np.array([0, 1]))
    cache = cache.set_table_row(1, np.array([2, 3]))
    k = rng.standard_normal((2, 6, 1, 32)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(k), 0)
    kd, vd = cache.layer(0)
    got = np.asarray(kd, np.float32)
    ref = k.transpose(0, 2, 1, 3)
    amax = np.abs(ref).max(axis=-1, keepdims=True)
    assert (np.abs(got[:, :, :6] - ref) <= amax * (1 / 14 + 0.01) + 1e-5).all()
    assert got[:, :, 6:].sum() == 0


def test_paged_q4_packed_siblings_and_gather():
    from llama_cpp_dsp_tpu.runtime.paged_kv import PagedQ4KVCache

    rng = np.random.default_rng(1)
    cache = PagedQ4KVCache.create(2, n_pages=4, n_seqs=2, max_blocks=2,
                                  n_kv_heads=1, head_dim=32, page_size=4)
    cache = cache.set_table_row(0, np.array([0, 1]))
    cache = cache.set_table_row(1, np.array([2, 3]))
    kn = rng.standard_normal((4, 1, 32)).astype(np.float32)
    slot_ids = jnp.asarray([0, 0, 1, 1], jnp.int32)
    rows = jnp.asarray([2, 3, 5, 8], jnp.int32)  # byte pair; lone; padding
    for layer in range(2):
        cache = cache.write_packed(layer, jnp.asarray(kn), jnp.asarray(kn),
                                   slot_ids, rows)
    kd, _ = cache.layer(0)
    got = np.asarray(kd, np.float32)
    for i, (s, r) in enumerate(((0, 2), (0, 3), (1, 5))):
        w = kn[i, 0]
        assert np.abs(got[s, 0, r] - w).max() <= np.abs(w).max() * (1/14 + 0.01) + 1e-5, i
    # gather/scatter round-trip preserves rows (requant of dequant = fixpoint)
    k_seq, v_seq = cache.gather_seq(0)
    cache2 = cache.scatter_seq(0, k_seq, v_seq)
    kd2, _ = cache2.layer(0)
    np.testing.assert_allclose(np.asarray(kd2, np.float32)[0],
                               got[0], atol=2e-2)


def test_engine_paged_q4_generation(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from model_builder import build_tiny_llama
    from llama_cpp_dsp_tpu.runtime.engine import Engine, Request
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.runtime.sampling import make_chain
    from llama_cpp_dsp_tpu.runtime.paged_kv import PagedQ4KVCache

    path = str(tmp_path / "tiny.gguf")
    build_tiny_llama(path, qtype=0)
    model = load_model(path)
    engine = Engine(model, n_slots=2, n_ctx_per_slot=64, kv_layout="paged",
                    kv_dtype="q4_0", page_size=16)
    assert isinstance(engine.cache, PagedQ4KVCache)
    reqs = [Request(rid=i, prompt_tokens=[3 + i, 5, 9], max_new_tokens=5,
                    sampler=make_chain(temp=0.0)) for i in range(2)]
    for r in reqs:
        engine.submit(r)
    while any(not r.done.is_set() for r in reqs):
        engine.step()
    for r in reqs:
        assert len(r.result_tokens) >= 1 and r.error is None
