"""Continuous-batching engine tests on the tiny model."""

import numpy as np
import pytest

from llama_cpp_dsp_tpu.runtime.engine import Engine, Request
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.gguf"
    build_tiny_llama(str(path), qtype=8)  # Q8_0
    model = load_model(str(path))
    return Engine(model, n_slots=2, n_ctx_per_slot=64, prefill_buckets=(16,),
                  use_pallas=False)


def greedy():
    return SamplerChain([Greedy()])


def test_single_request(engine):
    req = engine.generate_sync([3, 5, 7], max_new_tokens=6, sampler=greedy())
    assert req.done.is_set()
    assert 1 <= len(req.result_tokens) <= 6
    assert req.stop_reason in ("stop", "length")


def test_matches_context_decode(engine, tmp_path):
    """Engine output must equal the single-sequence LlamaContext output."""
    from llama_cpp_dsp_tpu.runtime.context import LlamaContext

    prompt = [2, 4, 6, 8, 10]
    req = engine.generate_sync(prompt, max_new_tokens=8, sampler=greedy())

    ctx = LlamaContext(engine.model, n_ctx=64, prefill_buckets=(16,), use_pallas=False)
    want = list(ctx.generate(prompt, max_new_tokens=8))
    assert req.result_tokens == want


def test_concurrent_requests_isolated(engine):
    """Two interleaved sequences must produce the same tokens as when run
    alone (slot isolation through the batched cache)."""
    p1 = [1, 2, 3]
    p2 = [9, 8, 7, 6]
    solo1 = engine.generate_sync(p1, max_new_tokens=5, sampler=greedy()).result_tokens
    solo2 = engine.generate_sync(p2, max_new_tokens=5, sampler=greedy()).result_tokens

    r1 = Request(0, p1, max_new_tokens=5, sampler=greedy())
    r2 = Request(0, p2, max_new_tokens=5, sampler=greedy())
    engine.submit(r1)
    engine.submit(r2)
    while not (r1.done.is_set() and r2.done.is_set()):
        engine.step()
    assert r1.result_tokens == solo1
    assert r2.result_tokens == solo2


def test_stream_callback(engine):
    events = []
    req = Request(
        0, [5, 5, 5], max_new_tokens=4, sampler=greedy(),
        stream_cb=lambda rid, ev: events.append(ev),
    )
    engine.submit(req)
    while not req.done.is_set():
        engine.step()
    assert events
    assert events[-1]["finished"] in ("stop", "length")


def test_prompt_too_long(engine):
    req = Request(0, list(range(100)), max_new_tokens=4, sampler=greedy())
    engine.submit(req)
    for _ in range(4):
        engine.step()
    assert req.done.is_set()
    assert req.error is not None


def test_slot_reuse_no_leakage(engine):
    """A short sequence after a long one must not see stale KV rows."""
    long_req = engine.generate_sync(list(range(1, 30)), max_new_tokens=4,
                                    sampler=greedy())
    short_solo = engine.generate_sync([4, 2], max_new_tokens=5, sampler=greedy())
    short_again = engine.generate_sync([4, 2], max_new_tokens=5, sampler=greedy())
    assert short_solo.result_tokens == short_again.result_tokens


def test_slot_context_shift(engine):
    """A slot that fills its context keeps generating via per-slot shift
    (reference server.cpp context-shift)."""
    from llama_cpp_dsp_tpu.runtime.engine import Engine, Request
    from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain

    eng = Engine(engine.model, n_slots=2, n_ctx_per_slot=32,
                 prefill_buckets=(16,), use_pallas=False)
    req = Request(0, [3, 5, 7, 9], max_new_tokens=60,
                  sampler=SamplerChain([Greedy()]))
    eng.submit(req)
    while not req.done.is_set():
        eng.step()
    assert req.error is None
    # generated more than the context could hold without shifting
    assert len(req.result_tokens) == 60
    assert req.stop_reason in ("length", "stop")


def test_request_cancellation(engine):
    """Abort-callback role (reference include/llama.h:964 + model-load-cancel
    test): a cancelled request frees its slot mid-generation."""
    from llama_cpp_dsp_tpu.runtime.engine import Request
    from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain

    req = Request(0, [3, 5, 7], max_new_tokens=40,
                  sampler=SamplerChain([Greedy()]))
    engine.submit(req)
    # run a few steps, then cancel
    for _ in range(4):
        engine.step()
    assert engine.cancel(req.rid)
    for _ in range(4):
        engine.step()
        if req.done.is_set():
            break
    assert req.done.is_set()
    assert req.stop_reason == "cancelled" or req.error == "cancelled"
    assert engine.n_busy_slots == 0


def test_mixed_prompt_decode_step(engine):
    """The packed mixed step (decode tokens + prompt chunk in one program)
    must produce the same greedy streams as isolated runs — reference
    update_slots invariant."""
    assert engine._mixed_ok
    p1, p2 = [3, 5, 7, 9, 11, 13, 2, 4], [6, 10, 14, 8]
    solo1 = engine.generate_sync(list(p1), max_new_tokens=6, sampler=greedy())
    solo2 = engine.generate_sync(list(p2), max_new_tokens=6, sampler=greedy())

    # drive manually: get req1 generating, then submit req2 so its prompt
    # chunks co-schedule with req1's decode via _mixed_step
    r1 = Request(0, list(p1), max_new_tokens=6, sampler=greedy())
    engine.submit(r1)
    while not r1.result_tokens:  # prefill r1 until its first token
        engine.step()
    r2 = Request(0, list(p2), max_new_tokens=6, sampler=greedy())
    engine.submit(r2)
    mixed_before = getattr(engine, "_mixed_steps", 0)
    orig = engine._mixed_fn

    calls = []

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    engine._mixed_fn = counting
    try:
        while not (r1.done.is_set() and r2.done.is_set()):
            engine.step()
    finally:
        engine._mixed_fn = orig
    assert calls, "mixed path was never taken"
    assert r1.result_tokens == solo1.result_tokens
    assert r2.result_tokens == solo2.result_tokens


def test_prompt_cache_prefix_reuse(engine):
    """A finished slot's KV is reused for a prompt sharing its prefix
    (reference server prompt caching): fewer prompt tokens processed,
    identical greedy output."""
    base = [3, 5, 7, 9, 11, 13, 15, 17]
    r1 = engine.generate_sync(list(base), max_new_tokens=4, sampler=greedy())
    ref = engine.generate_sync(list(base) + [19, 21], max_new_tokens=4,
                               sampler=greedy())
    # fresh submission sharing the 8-token prefix: must reuse cached rows
    before = engine.metrics["prompt_tokens_total"]
    r2 = engine.generate_sync(list(base) + [19, 21], max_new_tokens=4,
                              sampler=greedy())
    processed = engine.metrics["prompt_tokens_total"] - before
    assert r2.result_tokens == ref.result_tokens
    assert engine.metrics.get("prompt_tokens_cached", 0) > 0
    assert processed < len(base) + 2, processed


def test_prompt_cache_cross_slot_copy(engine):
    """A long prefix cached by a BUSY slot is seq_cp'd into the newly
    assigned slot (llama_kv_self_seq_cp role)."""
    long_prompt = list(range(2, 42))  # 40 tokens
    ref = engine.generate_sync(list(long_prompt), max_new_tokens=3,
                               sampler=greedy())
    # a long-running request holding the prefix in its (busy) slot
    blocker = Request(0, list(long_prompt), max_new_tokens=64,
                      sampler=greedy())
    engine.submit(blocker)
    while not blocker.result_tokens:
        engine.step()
    # poison the remaining free slot's cache so only the BUSY slot still
    # holds the prefix — forcing the cross-slot copy path
    engine.generate_sync([77, 76, 75], max_new_tokens=2, sampler=greedy())
    r2 = Request(0, list(long_prompt), max_new_tokens=3, sampler=greedy())
    engine.submit(r2)
    cached_before = engine.metrics.get("prompt_tokens_cached", 0)
    while not r2.done.is_set():
        engine.step()
    blocker.cancelled = True
    while not blocker.done.is_set():
        engine.step()
    assert r2.result_tokens == ref.result_tokens
    assert engine.metrics.get("prompt_tokens_cached", 0) - cached_before >= 30


@pytest.fixture(scope="module")
def paged_engine(engine):
    return Engine(engine.model, n_slots=2, n_ctx_per_slot=64,
                  prefill_buckets=(16,), use_pallas=False,
                  kv_layout="paged", page_size=8)


def test_paged_engine_matches_slots(engine, paged_engine):
    """kv_layout='paged' must produce identical greedy streams to the
    contiguous-slot engine. Prompts are unique to this test: the module
    engine's prompt cache would otherwise reuse earlier tests' prefixes and
    change the bf16 rounding path."""
    for prompt in ([23, 29, 31], [37, 41, 43, 47, 53, 59, 61, 67, 71, 73]):
        a = engine.generate_sync(list(prompt), max_new_tokens=6,
                                 sampler=greedy())
        b = paged_engine.generate_sync(list(prompt), max_new_tokens=6,
                                       sampler=greedy())
        assert a.result_tokens == b.result_tokens, prompt


def test_paged_engine_shared_prefix(paged_engine):
    """Shared prompt prefixes alias pages with zero copies: page usage for
    the second identical prompt only adds the divergent tail."""
    eng = paged_engine
    prompt = list(range(2, 34))  # 32 tokens = 4 pages of 8
    r1 = eng.generate_sync(list(prompt), max_new_tokens=3, sampler=greedy())
    # busy donor: long-running request holding the prefix
    blocker = Request(0, list(prompt), max_new_tokens=40, sampler=greedy())
    eng.submit(blocker)
    while not blocker.result_tokens:
        eng.step()
    free_before = eng._page_alloc.n_free
    r2 = Request(0, list(prompt) + [40, 42], max_new_tokens=3,
                 sampler=greedy())
    eng.submit(r2)
    while not r2.done.is_set():
        eng.step()
    blocker.cancelled = True
    while not blocker.done.is_set():
        eng.step()
    assert r2.result_tokens
    assert eng.metrics.get("prompt_tokens_cached", 0) >= 24
    # concurrent run consumed only the non-shared tail pages
    assert free_before - eng._page_alloc.n_free <= 3


def test_paged_engine_mixed_concurrent(paged_engine):
    """Prompt chunks + decode co-scheduled through the packed program on
    the paged cache; streams match solo runs."""
    eng = paged_engine
    p1, p2 = [3, 5, 7, 9, 11, 13, 2, 4], [6, 10, 14, 8]
    solo1 = eng.generate_sync(list(p1), max_new_tokens=6, sampler=greedy())
    solo2 = eng.generate_sync(list(p2), max_new_tokens=6, sampler=greedy())
    r1 = Request(0, list(p1), max_new_tokens=6, sampler=greedy())
    eng.submit(r1)
    while not r1.result_tokens:
        eng.step()
    r2 = Request(0, list(p2), max_new_tokens=6, sampler=greedy())
    eng.submit(r2)
    while not (r1.done.is_set() and r2.done.is_set()):
        eng.step()
    assert r1.result_tokens == solo1.result_tokens
    assert r2.result_tokens == solo2.result_tokens


def test_paged_q8_engine_matches_dense_q8(engine):
    """kv_layout='paged' + kv_dtype='q8_0' (PagedQuantKVCache) matches the
    contiguous QuantKVCache engine's greedy streams — quantization happens
    per cached row in both, so numerics are identical."""
    dense = Engine(engine.model, n_slots=2, n_ctx_per_slot=64,
                   prefill_buckets=(16,), use_pallas=False, kv_dtype="q8_0")
    paged = Engine(engine.model, n_slots=2, n_ctx_per_slot=64,
                   prefill_buckets=(16,), use_pallas=False,
                   kv_layout="paged", page_size=8, kv_dtype="q8_0")
    for prompt in ([83, 89, 97], [2, 3, 5, 7, 11, 13, 17, 19, 23, 29]):
        a = dense.generate_sync(list(prompt), max_new_tokens=6,
                                sampler=greedy())
        b = paged.generate_sync(list(prompt), max_new_tokens=6,
                                sampler=greedy())
        assert a.result_tokens == b.result_tokens, prompt


def test_mixed_multi_prompt_chunks(engine):
    """Several prompt slots' chunks pack into ONE program alongside decode
    (full update_slots packing): identical streams to solo runs. f32 and
    cleared prompt caches keep solo/packed numerics path-identical."""
    import jax.numpy as jnp

    eng = Engine(engine.model, n_slots=3, n_ctx_per_slot=64,
                 prefill_buckets=(16,), use_pallas=False,
                 compute_dtype=jnp.float32)
    prompts = [[101, 103, 105, 107], [109, 111, 113], [115, 117, 119, 121, 123]]
    solos = [eng.generate_sync(list(p), max_new_tokens=5, sampler=greedy())
             .result_tokens for p in prompts]
    for s in eng.slots:
        s.cache_tokens = []  # force full prefill in the packed path
    reqs = [Request(0, list(p), max_new_tokens=5, sampler=greedy())
            for p in prompts]
    # get the first generating, then submit two more so BOTH their prompts
    # co-schedule in one packed step
    eng.submit(reqs[0])
    while not reqs[0].result_tokens:
        eng.step()
    eng.submit(reqs[1])
    eng.submit(reqs[2])
    while not all(r.done.is_set() for r in reqs):
        eng.step()
    for r, solo in zip(reqs, solos):
        assert r.result_tokens == solo


def test_paged_context_shift(engine):
    """Paged mode: a full slot keeps generating via page-level gather →
    rope-rebased edit → scatter (reference context-shift semantics)."""
    eng = Engine(engine.model, n_slots=2, n_ctx_per_slot=32,
                 prefill_buckets=(16,), use_pallas=False,
                 kv_layout="paged", page_size=8)
    req = Request(0, [3, 5, 7, 9], max_new_tokens=60, sampler=greedy())
    eng.submit(req)
    while not req.done.is_set():
        eng.step()
    assert req.error is None
    assert len(req.result_tokens) == 60


def test_idle_slot_rows_survive_decode(tmp_path):
    """Batched decode must not write into idle slots' caches: row 0 of a
    FREE slot holds prompt-cache KV that reuse trusts (regression: inactive
    slots wrote token-0 KV at offset 0 every round)."""
    import sys

    sys.path.insert(0, "tests")
    from model_builder import build_tiny_llama

    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain

    path = str(tmp_path / "m.gguf")
    build_tiny_llama(path, qtype=8)
    model = load_model(path)
    eng = Engine(model, n_slots=2, n_ctx_per_slot=64, prefill_buckets=(16,),
                 use_pallas=False)
    eng.generate_sync([3, 5, 7, 9, 11], max_new_tokens=3,
                      sampler=SamplerChain([Greedy()]))
    s0 = next(s for s in eng.slots if s.cache_tokens)
    k_before = np.asarray(eng.cache.k[0][s0.idx, :, 0]).copy()
    eng.generate_sync([4, 6, 8], max_new_tokens=4,
                      sampler=SamplerChain([Greedy()]))
    np.testing.assert_array_equal(
        k_before, np.asarray(eng.cache.k[0][s0.idx, :, 0]))


def test_decode_chunk_matches_single_step(tmp_path):
    """decode_chunk>1 (lax.scan multi-token dispatch) must emit the same
    greedy streams as per-step dispatch, including a max_new_tokens that is
    not a chunk multiple and two slots finishing at different times."""
    path = str(tmp_path / "tiny.gguf")
    build_tiny_llama(path, qtype=0)
    model = load_model(path)
    outs = {}
    for chunk in (1, 4):
        eng = Engine(model, n_slots=2, n_ctx_per_slot=64,
                     prefill_buckets=(16,), use_pallas=False,
                     decode_chunk=chunk)
        r1 = Request(1, [3, 5, 7], max_new_tokens=9, sampler=greedy())
        r2 = Request(2, [9, 8, 7, 6, 5], max_new_tokens=6, sampler=greedy())
        eng.submit(r1)
        eng.submit(r2)
        while not (r1.done.is_set() and r2.done.is_set()):
            eng.step()
        outs[chunk] = (list(r1.result_tokens), list(r2.result_tokens),
                       [s.n_past for s in eng.slots])
    assert outs[1][0] == outs[4][0]
    assert outs[1][1] == outs[4][1]


def test_decode_chunk_slot_join_mid_generation(tmp_path):
    """A request arriving while chunked decode runs must still be served:
    the chunk gate defers to single steps whenever prompt work is queued."""
    path = str(tmp_path / "tiny.gguf")
    build_tiny_llama(path, qtype=0)
    model = load_model(path)
    eng = Engine(model, n_slots=2, n_ctx_per_slot=64, prefill_buckets=(16,),
                 use_pallas=False, decode_chunk=4)
    r1 = Request(1, [3, 5, 7], max_new_tokens=20, sampler=greedy())
    eng.submit(r1)
    for _ in range(3):
        eng.step()
    r2 = Request(2, [2, 4], max_new_tokens=5, sampler=greedy())
    eng.submit(r2)
    while not (r1.done.is_set() and r2.done.is_set()):
        eng.step()
    solo2 = eng.generate_sync([2, 4], max_new_tokens=5,
                              sampler=greedy()).result_tokens
    assert r2.result_tokens == solo2
    assert len(r1.result_tokens) == 20


@pytest.mark.parametrize("kv_kwargs", [
    {"kv_layout": "paged", "page_size": 16},
    {"kv_dtype": "q8_0"},
    {"kv_layout": "paged", "kv_dtype": "q8_0", "page_size": 16},
])
def test_decode_chunk_quant_and_paged(tmp_path, kv_kwargs):
    """Chunked decode must compose with paged tables and quantized KV
    writes inside the scan (donation + scatter carries)."""
    path = str(tmp_path / "tiny.gguf")
    build_tiny_llama(path, qtype=0)
    model = load_model(path)
    outs = {}
    for chunk in (1, 4):
        eng = Engine(model, n_slots=2, n_ctx_per_slot=64,
                     prefill_buckets=(16,), use_pallas=False,
                     decode_chunk=chunk, **kv_kwargs)
        r1 = Request(1, [3, 5, 7], max_new_tokens=7, sampler=greedy())
        r2 = Request(2, [9, 8, 7, 6, 5], max_new_tokens=7, sampler=greedy())
        eng.submit(r1)
        eng.submit(r2)
        while not (r1.done.is_set() and r2.done.is_set()):
            eng.step()
        outs[chunk] = (list(r1.result_tokens), list(r2.result_tokens))
    assert outs[1] == outs[4]
