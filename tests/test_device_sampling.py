"""On-device sampling (ops/device_sampling): pipeline semantics vs the host
sampler chain, device_spec detection, and the fused decode+sample paths in
LlamaContext.generate and Engine.step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    build_tiny_llama(str(path), qtype=0)
    return str(path)


def _sample(logits, key, temp=1.0, top_k=40, top_p=1.0, min_p=0.0):
    from llama_cpp_dsp_tpu.ops.device_sampling import sample_logits

    return np.asarray(sample_logits(
        jnp.asarray(logits, jnp.float32), key, jnp.float32(temp),
        top_k=top_k, top_p=jnp.float32(top_p), min_p=jnp.float32(min_p)))


def test_sample_logits_argmax_limits(rng):
    logits = rng.standard_normal((3, 97)).astype(np.float32)
    am = logits.argmax(axis=-1)
    key = jax.random.PRNGKey(0)
    # each limiting filter reduces the pipeline to argmax
    assert (_sample(logits, key, top_k=1) == am).all()
    assert (_sample(logits, key, top_p=1e-9) == am).all()
    assert (_sample(logits, key, min_p=1.0) == am).all()
    assert (_sample(logits, key, temp=1e-6) == am).all()


def test_sample_logits_topk_support(rng):
    """Samples never fall outside the top-k set; top-p keeps the nucleus."""
    logits = rng.standard_normal((1, 64)).astype(np.float32) * 3
    order = np.argsort(-logits[0])
    top8 = set(order[:8].tolist())
    for i in range(20):
        t = _sample(logits, jax.random.PRNGKey(i), top_k=8, temp=1.5)[0]
        assert int(t) in top8
    # top_p=0.5: allowed set = smallest prefix of sorted probs covering 0.5
    probs = np.exp(logits[0] - logits[0].max())
    probs /= probs.sum()
    cum = np.cumsum(probs[order])
    nucleus = set(order[: int(np.searchsorted(cum, 0.5)) + 1].tolist())
    for i in range(20):
        t = _sample(logits, jax.random.PRNGKey(100 + i), top_k=64,
                    top_p=0.5)[0]
        assert int(t) in nucleus


def test_device_spec_detection():
    from llama_cpp_dsp_tpu.runtime.sampling import make_chain

    spec = make_chain(temp=0.8, top_k=40, top_p=0.95, min_p=0.05).device_spec
    assert spec == {"top_k": 40, "top_p": 0.95, "min_p": 0.05, "temp": 0.8}
    # greedy == top_k=1 on device (single candidate → argmax tie-break)
    assert make_chain(temp=0.0).device_spec["top_k"] == 1
    assert make_chain(mirostat=2).device_spec is None
    assert make_chain(penalty_repeat=1.3).device_spec is None
    assert make_chain(dry_multiplier=0.5).device_spec is None
    assert make_chain(typical_p=0.5).device_spec is None
    assert make_chain(top_k=100000).device_spec is None  # beyond device cap
    assert make_chain(grammar=object()).device_spec is None


def test_generate_device_path_topk1_matches_greedy(tiny):
    """top_k=1 stochastic chain routes through the fused device sampler and
    must reproduce the greedy stream exactly."""
    from llama_cpp_dsp_tpu.runtime.context import LlamaContext
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.runtime.sampling import make_chain

    model = load_model(tiny)
    ctx = LlamaContext(model, n_ctx=64, prefill_buckets=(8,))
    greedy = list(ctx.generate([1, 5, 9], max_new_tokens=6,
                               sampler=make_chain(temp=0.0)))
    ctx.reset()
    chain = make_chain(temp=0.7, top_k=1)
    assert chain.device_spec is not None
    dev = list(ctx.generate([1, 5, 9], max_new_tokens=6, sampler=chain))
    assert dev == greedy
    assert ctx.perf.n_decode > 0  # fused steps counted as decode


def test_engine_device_sampling_topk1(tiny):
    from llama_cpp_dsp_tpu.runtime.engine import Engine, Request
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.runtime.sampling import make_chain

    model = load_model(tiny)
    engine = Engine(model, n_slots=2, n_ctx_per_slot=64)
    r1 = engine.generate_sync([1, 5, 9], max_new_tokens=5,
                              sampler=make_chain(temp=0.0))
    engine2 = Engine(model, n_slots=2, n_ctx_per_slot=64)
    reqs = [Request(rid=i, prompt_tokens=[1, 5, 9], max_new_tokens=5,
                    sampler=make_chain(temp=0.9, top_k=1, seed=i))
            for i in range(2)]
    for r in reqs:
        engine2.submit(r)
    while any(not r.done.is_set() for r in reqs):
        engine2.step()
    for r in reqs:
        assert r.result_tokens == r1.result_tokens
