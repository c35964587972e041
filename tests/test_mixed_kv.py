"""Split -ctk/-ctv (MixedKVCache): independent K/V cache formats
(reference common/arg.cpp:699 — separate --cache-type-k/--cache-type-v)
plus the q4_1 plane format."""

import numpy as np
import jax.numpy as jnp
import pytest

from llama_cpp_dsp_tpu.runtime.kv_cache import (
    KVCache, MixedKVCache, Q4KVCache, QuantKVCache, _packed_deq_plane,
    _q4_1_quant, make_kv_cache,
)


def test_make_kv_cache_routing():
    args = (2, 1, 64, 2, 64)
    assert isinstance(make_kv_cache(*args, "q8_0"), QuantKVCache)
    assert isinstance(make_kv_cache(*args, "q4_0"), Q4KVCache)
    assert isinstance(make_kv_cache(*args, "bf16"), KVCache)
    m = make_kv_cache(*args, "q8_0", v_type="q4_0")
    assert isinstance(m, MixedKVCache)
    assert (m.k_fmt, m.v_fmt) == ("q8_0", "q4_0")
    assert isinstance(make_kv_cache(*args, "q4_1"), MixedKVCache)
    assert m.capacity == 64 and m.n_layers == 2


@pytest.mark.parametrize("k_fmt,v_fmt", [
    ("q8_0", "q4_0"), ("bf16", "q4_1"), ("q4_1", "q4_1"), ("f32", "q8_0"),
    ("q5_0", "q5_0"), ("q5_1", "q5_1"), ("iq4_nl", "iq4_nl"),
    ("q5_0", "iq4_nl"), ("q8_0", "q5_1"),
])
def test_mixed_write_layer_roundtrip(k_fmt, v_fmt):
    rng = np.random.default_rng(3)
    b, h, s, d, t = 2, 2, 32, 64, 8
    cache = MixedKVCache.create(1, b, s, h, d, k_fmt, v_fmt)
    k = rng.standard_normal((b, t, h, d)).astype(np.float32)
    v = rng.standard_normal((b, t, h, d)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v), 4)
    kd, vd = cache.layer(0)
    kd = np.asarray(kd, np.float32)[:, :, 4:4 + t]
    vd = np.asarray(vd, np.float32)[:, :, 4:4 + t]
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    for got, want, fmt in ((kd, kt, k_fmt), (vd, vt, v_fmt)):
        tol = {"f32": 1e-6, "bf16": 0.01, "f16": 1e-3,
               "q8_0": 0.02, "q4_0": 0.2, "q4_1": 0.2,
               "q5_0": 0.1, "q5_1": 0.1, "iq4_nl": 0.2}[fmt]
        assert np.abs(got - want).max() < tol * np.abs(want).max() * 3, fmt
    # rows outside the write must stay zero
    assert np.asarray(cache.layer(0)[0], np.float32)[:, :, :4].max() == 0


def test_mixed_vector_offset_write_drops_idle():
    """Batched decode path: per-slot offsets; idle slots (off == capacity)
    must not be clobbered (the round-1 idle-slot KV poison bug)."""
    rng = np.random.default_rng(4)
    b, h, s, d = 2, 2, 16, 64
    cache = MixedKVCache.create(1, b, s, h, d, "q8_0", "q4_0")
    base_k = rng.standard_normal((b, 4, h, d)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(base_k), jnp.asarray(base_k), 0)
    before = np.asarray(cache.layer(0)[0], np.float32)
    one = rng.standard_normal((b, 1, h, d)).astype(np.float32)
    offs = jnp.asarray([4, s], jnp.int32)  # slot 1 idle
    cache = cache.write(0, jnp.asarray(one), jnp.asarray(one), offs)
    after = np.asarray(cache.layer(0)[0], np.float32)
    np.testing.assert_array_equal(after[1], before[1])  # idle slot untouched
    assert np.abs(after[0, :, 4] - one[0, 0]).max() < 0.1


def test_mixed_write_packed_sibling_rows():
    """Packed scatter with both rows of a q4 byte in one ubatch."""
    rng = np.random.default_rng(5)
    b, h, s, d = 2, 2, 16, 64
    cache = MixedKVCache.create(1, b, s, h, d, "bf16", "q4_0")
    p = 4
    rows_new = rng.standard_normal((p, h, d)).astype(np.float32)
    slot_ids = jnp.asarray([0, 0, 1, 1], jnp.int32)
    rows = jnp.asarray([2, 3, 5, 16], jnp.int32)  # sibling pair + OOB drop
    cache = cache.write_packed(0, jnp.asarray(rows_new), jnp.asarray(rows_new),
                               slot_ids, rows)
    vd = np.asarray(cache.layer(0)[1], np.float32)
    assert np.abs(vd[0, :, 2] - rows_new[0]).max() < 0.25
    assert np.abs(vd[0, :, 3] - rows_new[1]).max() < 0.25
    assert np.abs(vd[1, :, 5] - rows_new[2]).max() < 0.25
    assert vd[1, :, 15].max() == 0  # OOB row dropped


def test_q5_bit_plane_write_paths():
    """q5_0/q5_1's 5th-bit plane (qh) through all three write paths:
    scalar-offset prefill, per-slot vector offsets (idle slot dropped),
    and the packed sibling-row scatter."""
    rng = np.random.default_rng(7)
    b, h, s, d, t = 2, 2, 16, 64, 4
    for fmt in ("q5_0", "q5_1"):
        cache = MixedKVCache.create(1, b, s, h, d, fmt, fmt)
        k = rng.standard_normal((b, t, h, d)).astype(np.float32)
        cache = cache.write(0, jnp.asarray(k), jnp.asarray(k), 2)
        kd = np.asarray(cache.layer(0)[0], np.float32)
        kt = k.transpose(0, 2, 1, 3)
        assert np.abs(kd[:, :, 2:2 + t] - kt).max() < 0.15, fmt
        # vector offsets: slot 1 idle (off == capacity) must be untouched
        before = kd.copy()
        one = rng.standard_normal((b, 1, h, d)).astype(np.float32)
        cache = cache.write(0, jnp.asarray(one), jnp.asarray(one),
                            jnp.asarray([6, s], jnp.int32))
        after = np.asarray(cache.layer(0)[0], np.float32)
        np.testing.assert_array_equal(after[1], before[1])
        assert np.abs(after[0, :, 6] - one[0, 0]).max() < 0.15, fmt
        # packed scatter incl. a sibling byte pair
        rows_new = rng.standard_normal((3, h, d)).astype(np.float32)
        cache = cache.write_packed(
            0, jnp.asarray(rows_new), jnp.asarray(rows_new),
            jnp.asarray([1, 1, 0], jnp.int32),
            jnp.asarray([8, 9, 12], jnp.int32))
        vd = np.asarray(cache.layer(0)[1], np.float32)
        assert np.abs(vd[1, :, 8] - rows_new[0]).max() < 0.15, fmt
        assert np.abs(vd[1, :, 9] - rows_new[1]).max() < 0.15, fmt
        assert np.abs(vd[0, :, 12] - rows_new[2]).max() < 0.15, fmt


def test_q5_halves_q4_error():
    """One extra bit should roughly halve the max quantization error;
    iq4_nl's nonlinear codebook must beat q4_0 on gaussian data."""
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 8, 2, 64)).astype(np.float32)  # [B,T,H,D]

    def err(fmt):
        c = MixedKVCache.create(1, 2, 8, 2, 64, fmt, fmt)
        c = c.write(0, jnp.asarray(x), jnp.asarray(x), 0)
        return np.abs(np.asarray(c.layer(0)[0], np.float32)
                      - x.transpose(0, 2, 1, 3)).mean()

    e4, e5, enl = err("q4_0"), err("q5_0"), err("iq4_nl")
    assert e5 < e4 * 0.62, (e5, e4)
    assert enl < e4, (enl, e4)


def test_q4_1_beats_q4_0_on_biased_data():
    """q4_1's per-group min makes one-sided data (e.g. post-ReLU V rows)
    quantize better than q4_0's symmetric code — the reason -ctv q4_1
    exists (reference type matrix, common/arg.cpp:699)."""
    rng = np.random.default_rng(6)
    x = (rng.random((2, 2, 8, 64)).astype(np.float32) + 1.0)  # all-positive
    q, dsc, m = _q4_1_quant(jnp.asarray(x))
    from llama_cpp_dsp_tpu.runtime.kv_cache import (
        _q4_deq_plane, _q4_pack_rows, _q4_quant,
    )

    def parity_major(d):
        b, h, s, g = d.shape
        return (d.reshape(b, h, s // 2, 2, g).transpose(0, 1, 3, 4, 2)
                .reshape(b, h, 2 * g, s // 2))

    deq1 = np.asarray(_packed_deq_plane("q4_1", {
        "qs": (_q4_pack_rows(q),),
        "d": (jnp.asarray(parity_major(np.asarray(dsc))),),
        "m": (jnp.asarray(parity_major(np.asarray(m))),)}, 0), np.float32)
    q0, d0 = _q4_quant(jnp.asarray(x))
    deq0 = np.asarray(_q4_deq_plane(_q4_pack_rows(q0), parity_major(
        np.asarray(d0))), np.float32)
    e1 = np.abs(deq1 - x).mean()
    e0 = np.abs(deq0 - x).mean()
    assert e1 < e0 * 0.6, (e1, e0)


def test_mixed_engine_e2e_and_seq_edit():
    """Engine decode with -ctk q8_0 -ctv q4_0 (greedy) matches the bf16
    engine on a chain-synth model (layer outputs are zero, so attention
    values never reach the logits — the mixed cache machinery itself must
    not corrupt anything), and context-shift surgery runs."""
    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.runtime.engine import Engine, Request
    from llama_cpp_dsp_tpu.runtime.loader import LoadedModel
    from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain
    from llama_cpp_dsp_tpu.tools.synth import (
        chain_map, synth_params_chain, tiny_config,
    )

    cfg = tiny_config(n_layers=2, n_vocab=128)
    nm = chain_map(128)
    model = LoadedModel(cfg, synth_params_chain(cfg, GGMLType.Q4_0, seed=0,
                                                next_map=nm), None, None, {})

    def run(**kw):
        eng = Engine(model, n_slots=1, n_ctx_per_slot=64, prefill_buckets=(8,),
                     use_pallas=False, **kw)
        r = eng.submit(Request(0, [5, 9], max_new_tokens=12,
                               sampler=SamplerChain([Greedy()])))
        while not r.done.is_set():
            eng.step()
        return r.result_tokens

    assert run(kv_dtype="q8_0", kv_v_dtype="q4_0") == run()

    # seq-edit surgery on a mixed cache (context-shift plan)
    from llama_cpp_dsp_tpu.ops.rope import RopeParams
    from llama_cpp_dsp_tpu.runtime.cache_ops import (
        apply_seq_edit, context_shift_indices,
    )

    cache = MixedKVCache.create(2, 1, 32, 2, 64, "q8_0", "q4_1")
    rng = np.random.default_rng(8)
    rows = rng.standard_normal((1, 16, 2, 64)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(rows), jnp.asarray(rows), 0)
    src, deltas = context_shift_indices(32, 2, 4)  # already [1, S]
    out = apply_seq_edit(cache, src, deltas,
                         RopeParams(n_dims=64, mode="norm", freq_base=1e4))
    assert isinstance(out, MixedKVCache)
    kd, vd = out.layer(0)
    assert np.isfinite(np.asarray(kd, np.float32)).all()


def test_mixed_state_io_roundtrip(tmp_path):
    """Session save/load through a MixedKVCache (dequantized export →
    re-quantized import through the write path, state_io's layout-agnostic
    protocol)."""
    import jax.numpy as jnp

    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.runtime.context import LlamaContext
    from llama_cpp_dsp_tpu.runtime.loader import LoadedModel
    from llama_cpp_dsp_tpu.runtime.state_io import load_state, save_state
    from llama_cpp_dsp_tpu.tools.synth import (
        chain_map, synth_params_chain, tiny_config,
    )

    cfg = tiny_config(n_layers=2, n_vocab=64)
    nm = chain_map(64)
    model = LoadedModel(cfg, synth_params_chain(cfg, GGMLType.Q4_0, seed=0,
                                                next_map=nm), None, None, {})
    ctx = LlamaContext(model, n_ctx=32, kv_dtype="q8_0", kv_v_dtype="q4_1",
                       use_pallas=False, prefill_buckets=(8,))
    toks = [3, 7, 11, 13]
    ctx.eval_tokens(toks)
    p = str(tmp_path / "mixed.state")
    save_state(ctx, p, toks)

    ctx2 = LlamaContext(model, n_ctx=32, kv_dtype="q8_0", kv_v_dtype="q4_1",
                        use_pallas=False, prefill_buckets=(8,))
    back = load_state(ctx2, p)
    assert back == toks and ctx2.n_past == ctx.n_past
    # continuation agrees with the original context (chain model: greedy
    # next token is position-deterministic)
    l1 = np.asarray(ctx.eval_tokens([int(nm[13])]))
    l2 = np.asarray(ctx2.eval_tokens([int(nm[13])]))
    assert int(l1.argmax()) == int(l2.argmax())
