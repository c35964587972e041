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


def test_quantization_ppl_ladder(tmp_path):
    """Quality gate at test scale (reference ci/run.sh PPL sanity + the
    Δ-ppl table in examples/perplexity/README.md): PPL(q8_0) must sit within
    a hair of PPL(f32), and q4_0 within a modest delta."""
    import numpy as np
    from llama_cpp_dsp_tpu.tools.perplexity import compute_perplexity
    from llama_cpp_dsp_tpu.tools.quantize import FTYPE_NAMES, quantize_model

    src = str(tmp_path / "f32.gguf")
    build_tiny_llama(src, qtype=GGMLType.F32, n_embd=256, n_ff=256, seed=3)
    toks = [int(t) for t in np.random.default_rng(2).integers(3, 250, 256)]

    ppls = {}
    for name, ftype in (("f32", None), ("q8_0", "Q8_0"), ("q4_0", "Q4_0")):
        path = src
        if ftype is not None:
            path = str(tmp_path / f"{name}.gguf")
            quantize_model(src, path, FTYPE_NAMES[ftype])
        m = load_model(path)
        ppl, _, _ = compute_perplexity(m, toks, n_ctx=64, progress=False,
                                       compute_dtype=jnp.float32)
        ppls[name] = ppl
        assert np.isfinite(ppl)

    # Δ-ppl ordering and bounds (relative: random tiny model, high base PPL)
    assert abs(ppls["q8_0"] - ppls["f32"]) / ppls["f32"] < 0.02, ppls
    assert abs(ppls["q4_0"] - ppls["f32"]) / ppls["f32"] < 0.25, ppls
