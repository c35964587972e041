"""Speculative decoding tests.

With draft == target, every draft must be accepted and the output must be
IDENTICAL to plain greedy decoding (the strongest correctness check for the
verify/rollback machinery)."""

import numpy as np
import pytest

from llama_cpp_dsp_tpu.runtime.context import LlamaContext
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain
from llama_cpp_dsp_tpu.runtime.speculative import SpecParams, SpeculativeDecoder

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_spec.gguf"
    build_tiny_llama(str(path), qtype=8)
    return load_model(str(path))


def _ctx(model):
    return LlamaContext(model, n_ctx=128, prefill_buckets=(16,), use_pallas=False)


def test_speculative_matches_greedy(model):
    prompt = [3, 1, 4, 1, 5]
    plain = _ctx(model)
    want = list(plain.generate(prompt, max_new_tokens=16))

    tgt = _ctx(model)
    drf = _ctx(model)
    spec = SpeculativeDecoder(tgt, drf, SpecParams(n_draft=4, p_min=0.0))
    got = list(spec.generate(prompt, max_new_tokens=16,
                             sampler=SamplerChain([Greedy()])))
    assert got == want
    # identical models: every drafted token must be accepted
    assert spec.stats.n_draft_proposed > 0
    assert spec.stats.acceptance_rate == 1.0


def test_speculative_rollback_correctness(model, tmp_path):
    """Different draft model (different seed) → rejections happen, but the
    output must STILL equal plain greedy decoding of the target."""
    path = tmp_path / "tiny_draft.gguf"
    build_tiny_llama(str(path), qtype=8, seed=42)
    draft_model = load_model(str(path))

    prompt = [7, 7, 7]
    plain = _ctx(model)
    want = list(plain.generate(prompt, max_new_tokens=12))

    spec = SpeculativeDecoder(_ctx(model), _ctx(draft_model),
                              SpecParams(n_draft=3, p_min=0.0))
    got = list(spec.generate(prompt, max_new_tokens=12,
                             sampler=SamplerChain([Greedy()])))
    assert got == want
    assert spec.stats.acceptance_rate < 1.0  # seeds differ → some rejections
