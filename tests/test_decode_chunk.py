"""Chunked on-device decode (LlamaContext._step_sample_chunk): multi-token
dispatch must be byte-identical to single-step greedy decode, and breaking
out mid-chunk must leave n_past exactly where single-stepping would.

Reference behavior being amortized: per-token llama_decode + host sampler
(examples/main/main.cpp inner loop)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from model_builder import build_tiny_llama

    from llama_cpp_dsp_tpu.runtime.loader import load_model

    path = str(tmp_path_factory.mktemp("m") / "tiny.gguf")
    build_tiny_llama(path, qtype=0)
    return load_model(path)


def _ctx(tiny_model, n_ctx=96):
    from llama_cpp_dsp_tpu.runtime.context import LlamaContext

    return LlamaContext(tiny_model, n_ctx=n_ctx)


def _greedy():
    from llama_cpp_dsp_tpu.runtime.sampling import make_chain

    return make_chain(temp=0.0)


def test_greedy_chain_gets_device_spec():
    spec = _greedy().device_spec
    assert spec is not None and spec["top_k"] == 1


def test_chunked_greedy_matches_single_step(tiny_model, monkeypatch):
    prompt = [3, 5, 9, 2]
    streams = {}
    for chunk in (1, 4):
        monkeypatch.setenv("LLAMA_TPU_DECODE_CHUNK", str(chunk))
        ctx = _ctx(tiny_model)
        streams[chunk] = list(ctx.generate(prompt, max_new_tokens=13,
                                           sampler=_greedy(),
                                           stop_on_eog=False))
        streams[f"n_past{chunk}"] = ctx.n_past
    assert streams[1] == streams[4]
    assert streams["n_past1"] == streams["n_past4"]


def test_chunked_matches_host_sampler_greedy(tiny_model, monkeypatch):
    """Device top_k=1 == host np.argmax over f32 logits."""
    from llama_cpp_dsp_tpu.runtime.sampling import Greedy, SamplerChain

    prompt = [7, 1, 4]
    monkeypatch.setenv("LLAMA_TPU_DECODE_CHUNK", "4")
    dev = list(_ctx(tiny_model).generate(prompt, max_new_tokens=10,
                                         sampler=_greedy(),
                                         stop_on_eog=False))
    host_chain = SamplerChain([Greedy()])
    host_chain.device_spec_disabled = True
    ctx = _ctx(tiny_model)
    # force the host path: drive eval_tokens + argmax manually
    logits = ctx.eval_tokens(prompt)
    host = [int(np.argmax(logits))]
    for _ in range(9):
        logits = ctx.eval_tokens([host[-1]])
        host.append(int(np.argmax(logits)))
    assert dev == host


def test_early_break_leaves_consistent_n_past(tiny_model, monkeypatch):
    """Close the generator mid-chunk: n_past must equal the single-step
    value, and subsequent eval_tokens must produce identical logits (the
    overshoot rows beyond n_past are unattendable)."""
    prompt = [3, 5, 9]
    outs = {}
    for chunk in (1, 4):
        monkeypatch.setenv("LLAMA_TPU_DECODE_CHUNK", str(chunk))
        ctx = _ctx(tiny_model)
        gen = ctx.generate(prompt, max_new_tokens=50, sampler=_greedy(),
                           stop_on_eog=False)
        got = [next(gen) for _ in range(3)]
        gen.close()
        lg = ctx.eval_tokens([got[-1]])
        outs[chunk] = (got, ctx.n_past, lg)
    assert outs[1][0] == outs[4][0]
    assert outs[1][1] == outs[4][1]
    np.testing.assert_allclose(outs[1][2], outs[4][2], rtol=1e-5, atol=1e-5)


def test_chunked_with_context_shift(tiny_model, monkeypatch):
    """Generation crossing n_ctx: the chunk gate falls back to single steps
    near the boundary so the shift still fires at exactly n_past == n_ctx.
    Streams are compared only up to the shift: XLA fuses the scan body
    slightly differently per static chunk length (~1 bf16 ulp on KV rows),
    and this tiny random model has sub-ulp logit ties post-shift, so exact
    equality beyond the shift is not guaranteed (see _step_sample_chunk
    docstring). n_past bookkeeping must stay in lock-step throughout."""
    prompt = list(range(1, 9))
    streams, n_pasts = {}, {}
    for chunk in (1, 4):
        monkeypatch.setenv("LLAMA_TPU_DECODE_CHUNK", str(chunk))
        ctx = _ctx(tiny_model, n_ctx=24)
        streams[chunk] = list(ctx.generate(prompt, max_new_tokens=30,
                                           sampler=_greedy(),
                                           stop_on_eog=False, n_keep=2))
        n_pasts[chunk] = ctx.n_past
    assert len(streams[4]) == 30
    # 8 prompt + 16 feeds reaches n_ctx=24 → tokens 0..16 precede the shift
    assert streams[1][:17] == streams[4][:17]
    assert n_pasts[1] == n_pasts[4]
