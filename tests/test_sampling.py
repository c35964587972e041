"""Sampler chain tests — distribution/transform properties in the style of
reference tests/test-sampling.cpp."""

import numpy as np

from llama_cpp_dsp_tpu.runtime.sampling import (
    Candidates,
    Dist,
    Greedy,
    MinP,
    MirostatV2,
    Penalties,
    SamplerChain,
    Temp,
    TopK,
    TopP,
    Typical,
    make_chain,
)


def probs_to_logits(p):
    return np.log(np.asarray(p, dtype=np.float32))


def apply_and_get_probs(samplers, probs):
    cand = Candidates.from_logits(probs_to_logits(probs))
    rng = np.random.default_rng(0)
    for s in samplers:
        s.apply(cand, rng)
    cand.softmax()
    return {int(i): float(p) for i, p in zip(cand.ids, cand.probs)}


def test_top_k():
    out = apply_and_get_probs([TopK(2)], [0.1, 0.2, 0.3, 0.4])
    assert set(out) == {2, 3}
    assert abs(out[3] - 0.4 / 0.7) < 1e-5


def test_top_p():
    out = apply_and_get_probs([TopP(0.7)], [0.1, 0.2, 0.3, 0.4])
    assert set(out) == {2, 3}
    out = apply_and_get_probs([TopP(1.0)], [0.1, 0.2, 0.3, 0.4])
    assert len(out) == 4


def test_min_p():
    # min_p 0.5: keep tokens with p >= 0.5 * p_max
    out = apply_and_get_probs([MinP(0.5)], [0.1, 0.2, 0.3, 0.4])
    assert set(out) == {2, 3}


def test_typical():
    out = apply_and_get_probs([Typical(0.5)], [0.97, 0.01, 0.01, 0.01])
    assert set(out) == {0}


def test_greedy_and_temp_zero():
    chain = SamplerChain([Greedy()])
    assert chain.sample(probs_to_logits([0.1, 0.6, 0.3])) == 1
    chain = make_chain(temp=0.0)
    assert chain.sample(probs_to_logits([0.1, 0.6, 0.3])) == 1


def test_dist_statistics():
    chain = SamplerChain([Dist()], np.random.default_rng(42))
    counts = np.zeros(3)
    for _ in range(3000):
        counts[chain.sample(probs_to_logits([0.2, 0.3, 0.5]))] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.2, 0.3, 0.5], atol=0.04)


def test_penalties_repeat():
    pen = Penalties(penalty_last_n=64, penalty_repeat=2.0)
    for t in [0, 0, 0]:
        pen.accept(t)
    cand = Candidates.from_logits(np.array([2.0, 1.0], np.float32))
    pen.apply(cand, np.random.default_rng(0))
    # positive logit divided by penalty
    assert cand.logits[0] == 1.0
    assert cand.logits[1] == 1.0


def test_mirostat_runs():
    chain = SamplerChain([Temp(1.0), MirostatV2()], np.random.default_rng(0))
    for _ in range(10):
        t = chain.sample(probs_to_logits([0.25, 0.25, 0.25, 0.25]))
        assert 0 <= t < 4


def test_chain_determinism():
    c1 = make_chain(seed=7, temp=0.8, top_k=40, top_p=0.9)
    c2 = make_chain(seed=7, temp=0.8, top_k=40, top_p=0.9)
    rng = np.random.default_rng(1)
    logits = rng.standard_normal(100).astype(np.float32)
    s1 = [c1.sample(logits) for _ in range(20)]
    s2 = [c2.sample(logits) for _ in range(20)]
    assert s1 == s2


def test_env_arg_fallback(monkeypatch):
    """LLAMA_ARG_* env fallback — reference common/arg.cpp:72-81."""
    import argparse
    from llama_cpp_dsp_tpu.utils.args import parse_with_env

    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx-size", type=int, default=2048)
    ap.add_argument("--flag", action="store_true")
    monkeypatch.setenv("LLAMA_ARG_CTX_SIZE", "4096")
    monkeypatch.setenv("LLAMA_ARG_FLAG", "true")
    args = parse_with_env(ap, [])
    assert args.ctx_size == 4096 and args.flag is True
    # CLI wins over env
    args = parse_with_env(ap, ["--ctx-size", "128"])
    assert args.ctx_size == 128


def test_mirostat_v1():
    """Mirostat v1 (reference llama-sampling.cpp:1229): k from the Zipf
    s-hat estimate; mu converges toward the target surprise tau."""
    from llama_cpp_dsp_tpu.runtime.sampling import MirostatV1, make_chain

    rng = np.random.default_rng(0)
    # Zipfian logits: surprise of the argmax is low → mu should fall from
    # 2*tau toward tau over repeated applications
    logits = -np.log(np.arange(1, 501, dtype=np.float32))
    s = MirostatV1(tau=5.0, eta=0.1)
    from llama_cpp_dsp_tpu.runtime.sampling import Candidates

    surprises = []
    for _ in range(200):
        mu_before = s.mu
        tok = s.apply(Candidates.from_logits(logits), rng)
        assert 0 <= tok < 500
        # recover observed surprise from the mu update: mu -= eta*(obs-tau)
        if mu_before is not None:
            surprises.append((mu_before - s.mu) / 0.1 + 5.0)
    # the control loop drives mean observed surprise to tau
    assert abs(np.mean(surprises[50:]) - 5.0) < 1.0

    chain = make_chain(temp=1.0, mirostat=1, seed=7)
    toks = [chain.sample(logits) for _ in range(20)]
    assert all(0 <= t < 500 for t in toks)
    assert chain.device_spec is None  # stateful → host path
