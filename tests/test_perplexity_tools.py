"""KL-divergence + multiple-choice scoring — reference perplexity.cpp
(:1685 KL, :780 hellaswag) capability checks on the tiny model.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.tools.perplexity import (
    kl_divergence, multiple_choice_score, save_logits,
)

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "t.gguf"
    build_tiny_llama(str(path), qtype=GGMLType.F32)
    return load_model(str(path))


def test_kl_divergence_self_is_zero(tiny, tmp_path):
    toks = [int(t) for t in np.random.default_rng(0).integers(3, 250, 64)]
    base = str(tmp_path / "base.npz")
    save_logits(tiny, toks, base, n_ctx=32, compute_dtype=jnp.float32)
    kl, top1 = kl_divergence(tiny, base, compute_dtype=jnp.float32,
                             progress=False)
    # identical model: KL limited only by the f16 storage of the base
    assert kl < 1e-3
    assert top1 > 0.99


def test_multiple_choice_scorer(tiny):
    # construct tasks whose "correct" answer is the model's own greedy
    # continuation — the scorer must pick it
    from llama_cpp_dsp_tpu.tools.perplexity import _eval_logprobs

    rng = np.random.default_rng(1)
    tasks = []
    for _ in range(4):
        ctx = [int(t) for t in rng.integers(3, 250, 8)]
        lp = _eval_logprobs(tiny, ctx, jnp.float32)
        greedy = int(lp[-1].argmax())
        wrong = int(lp[-1].argmin())
        label = int(rng.integers(0, 2))
        endings = [[wrong]] * 2
        endings[label] = [greedy]
        tasks.append({"context": ctx, "endings": endings, "label": label})
    acc = multiple_choice_score(tiny, tasks, compute_dtype=jnp.float32,
                                progress=False)
    assert acc == 1.0
