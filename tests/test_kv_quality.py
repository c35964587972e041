"""Quantized-KV quality budgets: decode logits with q8_0/q4_0 KV caches
must stay close to the f32-KV stream (role of the reference's Δ-PPL
evidence for -ctk/-ctv types, common/arg.cpp:699 matrix). The engine-side
exactness tests cover the kernels; this pins the END-TO-END drift budget
so a cache-format regression (scale layout, nibble packing, row pairing)
shows up as a KL blowup, not a silent quality loss."""

import numpy as np
import pytest

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.registry import synth_config
from llama_cpp_dsp_tpu.runtime.context import LlamaContext
from llama_cpp_dsp_tpu.runtime.loader import LoadedModel
from llama_cpp_dsp_tpu.tools.synth import synth_params


@pytest.fixture(scope="module")
def model():
    cfg = synth_config("llama", n_embd=128, n_heads=2, n_kv_heads=2,
                       head_dim=64, n_ff=256, n_vocab=128, n_layers=2)
    params = synth_params(cfg, GGMLType.Q8_0, seed=11, tie=False)
    return LoadedModel(cfg, params, None, None, {})


def _decode_logits(model, kv_dtype, steps=12):
    """Teacher-forced single-token decode: every cache type consumes the
    SAME stream so the comparison isolates cache fidelity (closed-loop
    greedy diverges chaotically on random weights)."""
    ctx = LlamaContext(model, n_ctx=64, kv_dtype=kv_dtype, use_pallas=False)
    stream = np.random.default_rng(3).integers(3, 120, steps + 6)
    out = []
    for tok in stream:
        logits = ctx.eval_tokens([int(tok)])
        out.append(np.asarray(logits, np.float64))
    return np.stack(out)


def _kl(base, test):
    def ls(x):
        m = x.max(-1, keepdims=True)
        e = x - m
        return e - np.log(np.exp(e).sum(-1, keepdims=True))

    b, t = ls(base), ls(test)
    return float((np.exp(b) * (b - t)).sum(-1).mean())


def test_quant_kv_quality_budgets(model):
    base = _decode_logits(model, "f32")
    q8 = _decode_logits(model, "q8_0")
    q4 = _decode_logits(model, "q4_0")
    kl8, kl4 = _kl(base, q8), _kl(base, q4)
    # Budgets calibrated on this synthetic model. Random-weight logits are
    # knife-edge, so absolute KL here reads far worse than real fidelity —
    # the REFERENCE-ANCHORED measurement (scripts/kv_quality.py: same tiny
    # GGUF, scored against the reference binary's own --kl-divergence-base)
    # shows q8_0 at the f32-rerun floor (5.6e-5) and q4_0 within 1.15x of
    # the reference's own -ctk q4_0 (6.9e-3 vs 6.1e-3, equal top-1). This
    # test only pins regressions: a cache-format bug (scale layout, nibble
    # packing, row pairing) blows these up by orders of magnitude.
    # (measured: q8 0.054, q4 1.82 — group scales landed q4 9.5 → 1.8)
    assert kl8 < 0.2, kl8
    assert kl4 < 5.0, kl4
    assert kl8 < kl4  # monotone in cache precision
    agree8 = float((base.argmax(-1) == q8.argmax(-1)).mean())
    assert agree8 >= 0.9, agree8
