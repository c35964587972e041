"""Engine failure containment: a mid-step exception must fail ONLY the
affected request, restore the KV cache transactionally, and keep the
engine serving (reference server.cpp slot-error handling + the
llama_kv_cache restore-on-throw guard, src/llama-kv-cache.h:31-44)."""

import threading

import pytest

from llama_cpp_dsp_tpu.runtime.engine import Engine, Request
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny.gguf"
    build_tiny_llama(str(path), qtype=8)
    return load_model(str(path))


def greedy():
    return SamplerChain([Greedy()])


def test_prefill_fault_contained(model):
    """A raise during one slot's prefill fails that request with a 500
    error; a later request on the same engine completes normally."""
    eng = Engine(model, n_slots=2, n_ctx_per_slot=64, prefill_buckets=(16,),
                 use_pallas=False)
    good = eng.generate_sync([3, 5, 7], max_new_tokens=4, sampler=greedy())
    assert good.error is None

    cache_before = eng.cache
    orig = eng._prefill_slot
    boom = {"armed": True}

    def exploding(slot, chunk):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected prefill fault")
        return orig(slot, chunk)

    eng._prefill_slot = exploding
    bad = eng.generate_sync([1, 2, 3, 4], max_new_tokens=4, sampler=greedy())
    assert bad.error is not None and "injected prefill fault" in bad.error
    assert bad.error_status == 500
    assert bad.done.is_set()
    # transactional KV: the cache handle rolled back to the pre-step tree
    assert eng.cache is cache_before
    # every slot is free again and the engine still serves
    assert all(s.state.value == "free" for s in eng.slots)
    after = eng.generate_sync([3, 5, 7], max_new_tokens=4, sampler=greedy())
    assert after.error is None
    assert after.result_tokens == good.result_tokens
    assert eng.metrics["n_errors"] >= 1


def test_decode_fault_fails_batch_not_engine(model):
    """A raise during batched decode fails the in-flight generating
    request(s) but the engine keeps accepting new work."""
    eng = Engine(model, n_slots=2, n_ctx_per_slot=64, prefill_buckets=(16,),
                 use_pallas=False)
    r1 = Request(1, [1, 2, 3], max_new_tokens=8, sampler=greedy())
    eng.submit(r1)
    # advance until r1 is generating, then arm the fault in the decode fn
    while not any(s.state.value == "generating" for s in eng.slots):
        eng.step()

    def boom(*a, **kw):
        raise RuntimeError("injected decode fault")

    orig = eng._decode_argmax_fn
    eng._decode_argmax_fn = boom
    eng.step()
    eng._decode_argmax_fn = orig
    assert r1.done.is_set()
    assert r1.error is not None and r1.error_status == 500

    r2 = Request(2, [4, 5, 6], max_new_tokens=4, sampler=greedy())
    eng.submit(r2)
    while not r2.done.is_set():
        eng.step()
    assert r2.error is None
    assert len(r2.result_tokens) >= 1


def test_loop_thread_survives_fault(model):
    """The worker thread must not die on an injected fault: queued
    requests after the fault still complete (no hung done events)."""
    eng = Engine(model, n_slots=2, n_ctx_per_slot=64, prefill_buckets=(16,),
                 use_pallas=False)
    orig = eng._prefill_slot
    boom = {"armed": True}

    def exploding(slot, chunk):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("thread fault")
        return orig(slot, chunk)

    eng._prefill_slot = exploding
    eng.start()
    try:
        bad = Request(1, [1, 2, 3], max_new_tokens=4, sampler=greedy())
        eng.submit(bad)
        assert bad.done.wait(timeout=30)
        assert bad.error is not None
        ok = Request(2, [7, 8, 9], max_new_tokens=4, sampler=greedy())
        eng.submit(ok)
        assert ok.done.wait(timeout=30)
        assert ok.error is None
    finally:
        eng.stop()
    assert eng._thread is not None and not eng._thread.is_alive()


def test_paged_fault_resyncs_tables(model):
    """Paged mode: after a contained fault the failed slot's pages return
    to the free list and new requests still decode correctly."""
    eng = Engine(model, n_slots=2, n_ctx_per_slot=64, prefill_buckets=(16,),
                 use_pallas=False, kv_layout="paged", page_size=16)
    want = eng.generate_sync([3, 5, 7], max_new_tokens=4,
                             sampler=greedy()).result_tokens

    free_before = len(eng.cache.alloc._free) if hasattr(eng.cache, "alloc") \
        else len(eng._seqs[0].alloc._free)
    orig = eng._prefill_slot if hasattr(eng, "_prefill_slot") else None
    # paged prompt work routes through _mixed_step; fault its forward fn
    boom = {"armed": True}
    orig_mixed = eng._mixed_step

    def exploding(gen):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("paged fault")
        return orig_mixed(gen)

    eng._mixed_step = exploding
    bad = eng.generate_sync([9, 9, 9, 9], max_new_tokens=4, sampler=greedy())
    assert bad.error is not None
    # pages released back (allowing the prior request's cached pages)
    free_after = len(eng._seqs[0].alloc._free)
    assert free_after >= free_before - 4  # no unbounded leak
    good = eng.generate_sync([3, 5, 7], max_new_tokens=4, sampler=greedy())
    assert good.error is None
    assert good.result_tokens == want
