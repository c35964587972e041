"""In-engine speculative decoding (reference server.cpp:1249 per-slot spec
inside update_slots, batched): greedy output must be byte-identical to the
plain engine — speculation only changes speed, never results."""

import numpy as np
import pytest

from llama_cpp_dsp_tpu.runtime.engine import Engine, Request
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec")
    tp = str(d / "target.gguf")
    dp = str(d / "draft.gguf")
    build_tiny_llama(tp, qtype=8, seed=0)
    build_tiny_llama(dp, qtype=8, seed=3)  # different weights, same vocab
    return load_model(tp), load_model(dp)


def _greedy():
    return SamplerChain([Greedy()])


def _run(engine, prompts, n=12):
    reqs = [engine.submit(Request(0, list(p), max_new_tokens=n,
                                  sampler=_greedy()))
            for p in prompts]
    while not all(r.done.is_set() for r in reqs):
        engine.step()
    return [r.result_tokens for r in reqs]


PROMPTS = [[3, 5, 7, 9, 11, 13], [4, 6, 8], [2, 10, 12, 14]]


@pytest.mark.parametrize("kv_layout", ["slots", "paged"])
def test_spec_greedy_invariance(models, kv_layout):
    target, draft = models
    plain = Engine(target, n_slots=2, n_ctx_per_slot=64,
                   prefill_buckets=(16,), use_pallas=False,
                   kv_layout=kv_layout)
    want = _run(plain, PROMPTS)

    spec = Engine(target, n_slots=2, n_ctx_per_slot=64,
                  prefill_buckets=(16,), use_pallas=False,
                  kv_layout=kv_layout, draft_model=draft, n_draft=4,
                  p_min=0.0)
    got = _run(spec, PROMPTS)
    assert got == want
    assert spec.metrics["draft_proposed_total"] > 0


def test_spec_self_draft_accepts(models):
    """Draft == target: greedy drafting is never REJECTED — the only
    unconsumed proposals are the final round's, stranded when the request
    finishes (max_new_tokens/EOS) mid-acceptance."""
    target, _ = models
    eng = Engine(target, n_slots=2, n_ctx_per_slot=64, prefill_buckets=(16,),
                 use_pallas=False, draft_model=target, n_draft=4, p_min=0.0)
    _run(eng, [PROMPTS[0]])
    m = eng.metrics
    assert m["draft_proposed_total"] > 0
    assert m["draft_accepted_total"] >= m["draft_proposed_total"] - eng.n_draft


def test_spec_slot_reuse_catchup(models):
    """Prompt-cache slot reuse must heal the draft cache via catch-up."""
    target, draft = models
    eng = Engine(target, n_slots=1, n_ctx_per_slot=64, prefill_buckets=(16,),
                 use_pallas=False, draft_model=draft, n_draft=3, p_min=0.0)
    a = _run(eng, [[3, 5, 7, 9]])[0]
    b = _run(eng, [[3, 5, 7, 9]])[0]  # same prompt again, reused prefix
    assert a == b

    plain = Engine(target, n_slots=1, n_ctx_per_slot=64,
                   prefill_buckets=(16,), use_pallas=False)
    assert _run(plain, [[3, 5, 7, 9]])[0] == a
