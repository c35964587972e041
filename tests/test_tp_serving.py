"""User-facing tensor-parallel serving (-tp): LlamaContext/Engine shard
weights + KV over a ("dp","tp") mesh and must reproduce the single-device
greedy stream exactly (GSPMD collectives are numerically exact here)."""

import numpy as np
import pytest

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    build_tiny_llama(str(path), qtype=0)
    return str(path)


def test_context_tp_matches_single(tiny):
    import jax

    from llama_cpp_dsp_tpu.runtime.context import LlamaContext
    from llama_cpp_dsp_tpu.runtime.loader import load_model

    assert len(jax.devices()) >= 2
    model = load_model(tiny)
    single = LlamaContext(model, n_ctx=64, prefill_buckets=(8,))
    ref = list(single.generate([3, 5, 9], max_new_tokens=6))

    ctx = LlamaContext(model, n_ctx=64, prefill_buckets=(8,), tp=2)
    assert ctx._mesh is not None
    # q/k/v weights actually sharded on tp (tiny: n_embd 64, heads 4)
    w = ctx.params["layers"][0]["attn_q"]
    assert len(w.sharding.device_set) == 2
    got = list(ctx.generate([3, 5, 9], max_new_tokens=6))
    assert got == ref


def test_engine_tp_matches_single(tiny):
    from llama_cpp_dsp_tpu.runtime.engine import Engine
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.runtime.sampling import make_chain

    model = load_model(tiny)
    ref = Engine(model, n_slots=2, n_ctx_per_slot=64).generate_sync(
        [3, 5, 9], max_new_tokens=5, sampler=make_chain(temp=0.0))
    eng = Engine(model, n_slots=2, n_ctx_per_slot=64, tp=2)
    got = eng.generate_sync([3, 5, 9], max_new_tokens=5,
                            sampler=make_chain(temp=0.0))
    assert got.result_tokens == ref.result_tokens


def test_cli_tp_flag(tiny, capsysbinary):
    # capsysbinary: the CLI streams raw piece bytes (reference main.cpp
    # behavior) which need not be valid UTF-8 on a random tiny model
    from llama_cpp_dsp_tpu.tools.cli import main

    base = ["-m", tiny, "-p", "hi", "-n", "4", "--temp", "0", "-c", "64",
            "--no-display-prompt"]
    assert main(base) == 0
    ref = capsysbinary.readouterr().out
    assert main(base + ["-tp", "2"]) == 0
    assert capsysbinary.readouterr().out == ref


def test_engine_tp_speculative(tiny):
    """BASELINE config-5 shape: tensor-sharded target + sharded draft;
    greedy output must byte-match the unsharded spec engine."""
    from llama_cpp_dsp_tpu.runtime.engine import Engine
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.runtime.sampling import make_chain

    model = load_model(tiny)
    ref = Engine(model, n_slots=2, n_ctx_per_slot=64, draft_model=model,
                 n_draft=4).generate_sync(
        [3, 5, 9], max_new_tokens=6, sampler=make_chain(temp=0.0))
    eng = Engine(model, n_slots=2, n_ctx_per_slot=64, draft_model=model,
                 n_draft=4, tp=2)
    got = eng.generate_sync([3, 5, 9], max_new_tokens=6,
                            sampler=make_chain(temp=0.0))
    assert got.result_tokens == ref.result_tokens
