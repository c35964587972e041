"""Quantized (Q8) KV cache: round-trip accuracy, kernel parity, and
model-level decode quality — mirrors the reference's --cache-type-k q8_0
capability (src/llama-kv-cache.h:188-189, common/arg.cpp:699). The TPU
relayout uses one int8 scale per cached row (head_dim block) instead of
32-element blocks; quality is checked at the model level below.
"""

import numpy as np
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.models.registry import synth_config
from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode_q8
from llama_cpp_dsp_tpu.runtime.kv_cache import (
    QuantKVCache, causal_mask, make_kv_cache, _q8_dequant, _q8_quant,
)
from llama_cpp_dsp_tpu.tools.synth import synth_params

from tests_flash_ref import ref_attention


def test_q8_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((4, 3, 7, 64)) * 3).astype(np.float32)
    qs, d = _q8_quant(jnp.asarray(x))
    y = np.asarray(_q8_dequant(qs, d, jnp.float32))
    err = np.abs(x - y)
    bound = np.asarray(d)[..., None] * 0.5 + 1e-6
    assert (err <= bound).all()
    qs0, d0 = _q8_quant(jnp.zeros((1, 32)))
    assert np.asarray(d0).item() == 0.0
    assert np.asarray(qs0).sum() == 0


def test_quant_cache_write_layer():
    cache = make_kv_cache(2, 1, 16, 2, 32, "q8_0")
    assert isinstance(cache, QuantKVCache)
    rng = np.random.default_rng(1)
    k = rng.standard_normal((1, 4, 2, 32)).astype(np.float32)
    v = rng.standard_normal((1, 4, 2, 32)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v), 0)
    kq, _ = cache.layer(0)
    ref_k = k.transpose(0, 2, 1, 3)  # [B,H,T,D]
    got = np.asarray(kq, np.float32)[:, :, :4]
    assert np.abs(got - ref_k).max() < 0.05


def test_flash_decode_q8_matches_dequant():
    rng = np.random.default_rng(2)
    b, hq, hkv, d, s = 2, 4, 2, 64, 512
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    kqs, kd = _q8_quant(jnp.asarray(k))
    vqs, vd = _q8_quant(jnp.asarray(v))
    kd4 = kd[:, :, None, :]  # [B,Hkv,1,S]
    vd4 = vd[:, :, None, :]
    lengths = np.array([400, 33], np.int32)
    scale = 1.0 / np.sqrt(d)

    out = flash_decode_q8(
        jnp.asarray(q), kqs, kd4, vqs, vd4, jnp.asarray(lengths),
        scale=scale, chunk=128, interpret=True,
    )
    ref = ref_attention(q, np.asarray(_q8_dequant(kqs, kd, jnp.float32)),
                        np.asarray(_q8_dequant(vqs, vd, jnp.float32)),
                        lengths, scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_model_decode_with_q8_cache():
    """Cached decode with q8 KV stays close to f32-cache decode."""
    cfg = synth_config("llama", n_embd=128, n_heads=4, n_kv_heads=2, head_dim=32)
    params = synth_params(cfg, GGMLType.Q8_0, seed=3, tie=False)
    n, n_ctx = 6, 16
    tokens = (np.arange(n, dtype=np.int32) * 7 + 2).reshape(1, n) % cfg.n_vocab
    positions = np.arange(n, dtype=np.int32).reshape(1, n)

    outs = {}
    for kv_type in ("f32", "q8_0"):
        cache = make_kv_cache(cfg.n_layers, 1, n_ctx, cfg.n_kv_heads,
                              cfg.head_dim, kv_type)
        mask = causal_mask(jnp.asarray(positions), n_ctx, 0)
        logits, _ = forward(params, cfg, jnp.asarray(tokens),
                            jnp.asarray(positions), cache, 0, mask,
                            compute_dtype=jnp.float32)
        outs[kv_type] = np.asarray(logits)[0, -1]
    denom = np.abs(outs["f32"]).max() + 1e-6
    assert np.abs(outs["q8_0"] - outs["f32"]).max() / denom < 0.02


# -- Q4_0 KV (row-pair packed — see kv_cache.Q4KVCache) -----------------------


def test_q4_roundtrip_write_layer():
    from llama_cpp_dsp_tpu.runtime.kv_cache import Q4KVCache

    cache = make_kv_cache(1, 2, 16, 2, 32, "q4_0")
    assert isinstance(cache, Q4KVCache)
    rng = np.random.default_rng(0)
    k = rng.standard_normal((2, 6, 2, 32)).astype(np.float32)
    v = rng.standard_normal((2, 6, 2, 32)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v), 0)
    kd, vd = cache.layer(0)
    ref_k = k.transpose(0, 2, 1, 3)
    # 4-bit asymmetric (reference q4_0 16-level, d = signed_max/-8):
    # round err ≤ |d|/2 = amax/16, but the opposite-sign extreme clips
    # at code 15 → worst case ≈ |d| = amax/8
    amax = np.abs(ref_k).max(axis=-1, keepdims=True)
    assert (np.abs(np.asarray(kd, np.float32)[:, :, :6] - ref_k)
            <= amax / 8 + amax * 0.01 + 1e-5).all()
    # rows beyond the write are untouched zeros
    assert np.asarray(kd)[:, :, 6:].sum() == 0


def test_q4_write_odd_offsets():
    """Scalar-offset writes at odd offsets and odd lengths must preserve
    sibling nibbles (the packed byte merge path)."""
    rng = np.random.default_rng(1)
    cache = make_kv_cache(1, 1, 16, 1, 32, "q4_0")
    rows = rng.standard_normal((1, 16, 1, 32)).astype(np.float32)
    # write rows one at a time at every offset (alternating parity)
    for t in range(7):
        cache = cache.write(0, jnp.asarray(rows[:, t:t+1]),
                            jnp.asarray(rows[:, t:t+1]), t)
    # then a 3-row chunk at odd offset 7
    cache = cache.write(0, jnp.asarray(rows[:, 7:10]),
                        jnp.asarray(rows[:, 7:10]), 7)
    kd, _ = cache.layer(0)
    got = np.asarray(kd, np.float32)[0, 0, :10]
    want = rows[0, :10, 0]
    amax = np.abs(want).max(axis=-1, keepdims=True)
    assert (np.abs(got - want) <= amax / 8 + amax * 0.01 + 1e-5).all()


def test_q4_write_vector_offsets_and_idle_drop():
    rng = np.random.default_rng(2)
    cache = make_kv_cache(1, 3, 8, 1, 32, "q4_0")
    seed_rows = rng.standard_normal((3, 2, 1, 32)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(seed_rows), jnp.asarray(seed_rows), 0)
    newr = rng.standard_normal((3, 1, 1, 32)).astype(np.float32)
    # slot0 writes row 2 (even), slot1 row 3 (odd), slot2 idle (off=capacity)
    off = jnp.asarray([2, 3, 8], jnp.int32)
    cache = cache.write(0, jnp.asarray(newr), jnp.asarray(newr), off)
    kd, _ = cache.layer(0)
    got = np.asarray(kd, np.float32)
    for b, row in ((0, 2), (1, 3)):
        w = newr[b, 0, 0]
        assert np.abs(got[b, 0, row] - w).max() <= np.abs(w).max() * (1/8 + 0.01) + 1e-5
    # idle slot untouched beyond its seed rows
    assert got[2, 0, 2:].sum() == 0
    # slot1's seed rows survived the odd write into their byte plane
    w = seed_rows[1, 1, 0]
    assert np.abs(got[1, 0, 1] - w).max() <= np.abs(w).max() * (1/8 + 0.01) + 1e-5


def test_q4_write_packed_siblings():
    """Two packed tokens landing in one byte (rows 2s, 2s+1 of a slot) must
    both survive — the in-batch sibling merge."""
    rng = np.random.default_rng(3)
    cache = make_kv_cache(1, 2, 8, 1, 32, "q4_0")
    p = 4
    kn = rng.standard_normal((p, 1, 32)).astype(np.float32)
    slot_ids = jnp.asarray([0, 0, 1, 1], jnp.int32)
    rows = jnp.asarray([2, 3, 5, 8], jnp.int32)  # pair; lone odd; padding
    cache = cache.write_packed(0, jnp.asarray(kn), jnp.asarray(kn),
                               slot_ids, rows)
    kd, _ = cache.layer(0)
    got = np.asarray(kd, np.float32)
    for i, (s, r) in enumerate(((0, 2), (0, 3), (1, 5))):
        w = kn[i, 0]
        assert np.abs(got[s, 0, r] - w).max() <= np.abs(w).max() * (1/8 + 0.01) + 1e-5, i


def test_flash_decode_q4_matches_dequant():
    from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode_q4
    from llama_cpp_dsp_tpu.runtime.kv_cache import Q4KVCache

    rng = np.random.default_rng(4)
    b, hq, hkv, d, s = 2, 4, 2, 64, 512
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    cache = Q4KVCache.create(1, b, s, hkv, d)
    cache = cache.write(0, jnp.asarray(k.transpose(0, 2, 1, 3)),
                        jnp.asarray(v.transpose(0, 2, 1, 3)), 0)
    lengths = np.array([400, 33], np.int32)
    scale = 1.0 / np.sqrt(d)
    out = flash_decode_q4(
        jnp.asarray(q), *cache.packed_layer(0), jnp.asarray(lengths),
        scale=scale, chunk=256, interpret=True,
    )

    def deq_f32(qs, dd):  # the kernel's own f32 dequant (layer() adds a
        # bf16 round the kernel never performs); parity-major group scales
        from llama_cpp_dsp_tpu.runtime.kv_cache import _q4_unpack_rows

        rows = np.asarray(_q4_unpack_rows(qs), np.float32)
        ddn = np.asarray(dd)  # [B,H,2G,S/2]
        g = ddn.shape[2] // 2
        dr = (ddn.reshape(b, hkv, 2, g, s // 2).transpose(0, 1, 4, 2, 3)
              .reshape(b, hkv, s, g))
        return (rows.reshape(b, hkv, s, g, d // g)
                * dr[..., None]).reshape(b, hkv, s, d)

    ref = ref_attention(q, deq_f32(cache.k_qs[0], cache.k_d[0]),
                        deq_f32(cache.v_qs[0], cache.v_d[0]), lengths, scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_model_decode_with_q4_cache():
    """The q4 cache introduces ONLY quantization error: a decode step whose
    dense cache holds the q4-dequantized rows must produce (near-)identical
    logits to the q4-cache decode. (An absolute quality bound is meaningless
    on a random synth model — per-row q4 error is amax/14 by construction,
    verified in test_q4_roundtrip_write_layer.)"""
    cfg = synth_config("llama", n_embd=128, n_heads=4, n_kv_heads=2, head_dim=32)
    params = synth_params(cfg, GGMLType.Q8_0, seed=3, tie=False)
    n, n_ctx = 6, 16
    tokens = (np.arange(n, dtype=np.int32) * 7 + 2).reshape(1, n) % cfg.n_vocab
    positions = np.arange(n, dtype=np.int32).reshape(1, n)
    mask = causal_mask(jnp.asarray(positions), n_ctx, 0)

    q4 = make_kv_cache(cfg.n_layers, 1, n_ctx, cfg.n_kv_heads,
                       cfg.head_dim, "q4_0")
    logits_prefill, q4 = forward(params, cfg, jnp.asarray(tokens),
                                 jnp.asarray(positions), q4, 0, mask,
                                 compute_dtype=jnp.float32)

    # one decode step on the q4 cache vs a dense cache seeded with the
    # dequantized q4 rows — attention inputs are then identical
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache

    dense = KVCache(
        tuple(q4.layer(i)[0].astype(jnp.float32) for i in range(cfg.n_layers)),
        tuple(q4.layer(i)[1].astype(jnp.float32) for i in range(cfg.n_layers)),
    )
    tok = np.array([[5]], np.int32)
    pos = np.array([[n]], np.int32)
    mask1 = causal_mask(jnp.asarray(pos), n_ctx, n)
    out_q4, q4b = forward(params, cfg, jnp.asarray(tok), jnp.asarray(pos),
                          q4, n, mask1, compute_dtype=jnp.float32)
    out_dense, dense2 = forward(params, cfg, jnp.asarray(tok), jnp.asarray(pos),
                                dense, n, mask1, compute_dtype=jnp.float32)
    # hard guarantee: every PRE-EXISTING row is bit-identical through the
    # q4 pipeline (the only divergence is the new token's own row, dense
    # in the seeded cache but quantized in q4)
    for i in range(cfg.n_layers):
        kq, vq = q4b.layer(i)
        kdn, vdn = dense2.layer(i)
        np.testing.assert_array_equal(
            np.asarray(kq, np.float32)[:, :, :n],
            np.asarray(kdn, np.float32)[:, :, :n])
        np.testing.assert_array_equal(
            np.asarray(vq, np.float32)[:, :, :n],
            np.asarray(vdn, np.float32)[:, :, :n])
    a, bb = np.asarray(out_q4)[0, -1], np.asarray(out_dense)[0, -1]
    # loose sanity: residual = one row's quant error through self-attention
    assert np.abs(a - bb).max() / (np.abs(bb).max() + 1e-6) < 0.2


def test_q4_context_shift_and_state_io(tmp_path):
    """Q4 cache through the full single-stream surface: generate with
    context-shift plus session save/load (the quantized re-read path)."""
    import sys
    sys.path.insert(0, "tests")
    from model_builder import build_tiny_llama
    from llama_cpp_dsp_tpu.runtime.context import LlamaContext
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.runtime.state_io import load_state, save_state

    path = str(tmp_path / "tiny.gguf")
    build_tiny_llama(path, qtype=0)
    model = load_model(path)
    ctx = LlamaContext(model, n_ctx=16, kv_dtype="q4_0", prefill_buckets=(8,))
    toks = list(ctx.generate([3, 5, 7], max_new_tokens=16))  # forces a shift
    assert len(toks) >= 1
    sp = str(tmp_path / "sess.bin")
    save_state(ctx, sp, [3, 5, 7] + toks)
    ctx2 = LlamaContext(model, n_ctx=16, kv_dtype="q4_0", prefill_buckets=(8,))
    hist = load_state(ctx2, sp)
    assert hist[:3] == [3, 5, 7]
    assert ctx2.n_past == ctx.n_past


def test_engine_q4_cache_generation(tmp_path):
    """Continuous-batching engine on a q4_0 cache: two slots, mixed prefill
    + batched decode + write_packed paths all through the packed planes."""
    import sys
    sys.path.insert(0, "tests")
    from model_builder import build_tiny_llama
    from llama_cpp_dsp_tpu.runtime.engine import Engine, Request
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.runtime.sampling import make_chain

    path = str(tmp_path / "tiny.gguf")
    build_tiny_llama(path, qtype=0)
    model = load_model(path)
    engine = Engine(model, n_slots=2, n_ctx_per_slot=64, kv_dtype="q4_0")
    reqs = [Request(rid=i, prompt_tokens=[3 + i, 5, 9], max_new_tokens=6,
                    sampler=make_chain(temp=0.0)) for i in range(2)]
    for r in reqs:
        engine.submit(r)
    while any(not r.done.is_set() for r in reqs):
        engine.step()
    for r in reqs:
        assert len(r.result_tokens) >= 1 and r.error is None


def test_q4_group_scales_roundtrip():
    """head_dim 64 → G=2 scale groups (reference block_q4_0 32-element
    groups): per-GROUP error bound is tighter than any per-row scheme when
    one group carries a large outlier."""
    from llama_cpp_dsp_tpu.runtime.kv_cache import Q4KVCache

    rng = np.random.default_rng(7)
    k = rng.standard_normal((1, 4, 1, 64)).astype(np.float32)
    k[..., 40] = 25.0  # outlier in group 1 must not wipe group 0
    cache = Q4KVCache.create(1, 1, 8, 1, 64)
    assert cache.k_d[0].shape == (1, 1, 4, 4)  # [B,H,2G,S/2], G=2
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(k), 0)
    kd, _ = cache.layer(0)
    got = np.asarray(kd, np.float32)[0, 0, :4]
    want = k[0, :, 0]
    gw = want.reshape(4, 2, 32)
    gg = got.reshape(4, 2, 32)
    gamax = np.abs(gw).max(-1, keepdims=True)
    assert (np.abs(gg - gw) <= gamax / 8 + gamax * 0.01 + 1e-5).all()
    # group 0 precision unaffected by the group-1 outlier
    assert np.abs(gg[:, 0] - gw[:, 0]).max() < 0.5
