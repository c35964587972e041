"""Small-tool parity: tokenize CLI, gguf-hash, export-lora merge,
cvector-generator, retrieval chunking (reference examples/{tokenize,
gguf-hash,export-lora,cvector-generator,retrieval})."""

import numpy as np
import jax.numpy as jnp
import pytest

from llama_cpp_dsp_tpu.gguf.writer import GGUFWriter
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.runtime.loader import load_model

from model_builder import build_tiny_llama
from test_adapter import _write_lora


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny.gguf"
    build_tiny_llama(str(path), qtype=0)  # f32
    return str(path)


def _logits(model, params, toks):
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    mask = np.tril(np.ones((1, n, n), bool))
    out, _ = forward(params, model.cfg, jnp.asarray(toks), jnp.asarray(pos),
                     mask=mask, compute_dtype=jnp.float32)
    return np.asarray(out)[0, -1]


def test_tokenize_cli(tiny, capsys):
    from llama_cpp_dsp_tpu.tools.tokenize import main

    assert main(["-m", tiny, "-p", "hello", "--ids", "--show-count"]) == 0
    out = capsys.readouterr().out
    assert out.strip().startswith("[") and out.strip().endswith("]")


def test_gguf_hash(tiny, capsys):
    from llama_cpp_dsp_tpu.tools.gguf_hash import fnv1a64, main

    assert fnv1a64(b"hello world") == 0x779A65E7023CD2E7  # known FNV-1a vector
    assert main([tiny]) == 0
    out1 = capsys.readouterr().out
    assert main([tiny]) == 0
    out2 = capsys.readouterr().out
    assert out1 == out2  # deterministic
    assert "sha256" in out1
    assert main([tiny, "--uuid"]) == 0  # UUIDv5 mode


def test_export_lora_merge(tiny, tmp_path):
    """Merged-weight model logits must equal base + runtime LoRA logits."""
    from llama_cpp_dsp_tpu.runtime.adapter import apply_lora, load_lora
    from llama_cpp_dsp_tpu.tools.export_lora import merge

    model = load_model(tiny)
    hp = {"n_layers": model.cfg.n_layers, "n_embd": model.cfg.n_embd,
          "n_ff": model.cfg.n_ff}
    rng = np.random.default_rng(0)
    lora_path = tmp_path / "adapter.gguf"
    _write_lora(str(lora_path), hp, rng)

    merged_path = tmp_path / "merged.gguf"
    merge(tiny, [(str(lora_path), 1.0)], str(merged_path), outtype="f32")
    merged = load_model(str(merged_path))

    toks = np.array([[3, 7, 11, 5]], np.int32)
    runtime = apply_lora(model.params, load_lora(str(lora_path)), 1.0)
    want = _logits(model, runtime, toks)
    got = _logits(merged, merged.params, toks)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cvector_generator_and_loader(tiny, tmp_path):
    from llama_cpp_dsp_tpu.runtime.adapter import load_control_vector
    from llama_cpp_dsp_tpu.tools.cvector_generator import (
        collect_layer_states, directions_from_pairs,
    )

    model = load_model(tiny)
    pos = collect_layer_states(model, ["hello there", "good day"])
    neg = collect_layer_states(model, ["bye now", "farewell"])
    assert len(pos) == model.cfg.n_layers
    assert pos[0].shape == (2, model.cfg.n_embd)
    for method in ("mean", "pca"):
        dirs = directions_from_pairs(pos, neg, method)
        assert len(dirs) == model.cfg.n_layers
        assert all(np.isfinite(d).all() for d in dirs)

    out = tmp_path / "cv.gguf"
    w = GGUFWriter(str(out), "controlvector")
    w.add_string("general.type", "controlvector")
    for il, v in enumerate(dirs):
        w.add_tensor(f"direction.{il + 1}", v)
    w.write()
    loaded = load_control_vector(str(out), model.cfg.n_layers)
    np.testing.assert_allclose(loaded, np.stack(dirs), rtol=1e-6)


def test_retrieval_chunking():
    from llama_cpp_dsp_tpu.tools.retrieval import chunk_file

    text = "aaa\nbbb\nccc\nddd\neee"
    chunks = chunk_file(text, 8, "\n")
    assert all(chunks)
    assert "".join(c.replace("\n", "") for c in chunks) == text.replace("\n", "")


def test_gen_docs_markdown(tmp_path):
    """gen-docs parity: every front-end flag appears in the generated
    markdown (reference examples/gen-docs)."""
    from llama_cpp_dsp_tpu.tools.gen_docs import main as gen_docs_main

    gen_docs_main(["-o", str(tmp_path)])
    cli_md = (tmp_path / "cli.md").read_text()
    srv_md = (tmp_path / "server.md").read_text()
    for flag in ("--model", "--ctx-size", "--cache-type-k", "--grammar"):
        assert flag in cli_md
    for flag in ("--parallel", "--kv-layout", "--api-key"):
        assert flag in srv_md
    assert "LLAMA_ARG_MODEL" in cli_md


def test_compare_bench(tmp_path, capsys):
    import json
    import sys

    sys.path.insert(0, "scripts")
    try:
        from compare_bench import main as cmp_main
    finally:
        sys.path.pop(0)
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(json.dumps({"metric": "decode_tps", "value": 90.0,
                             "unit": "t/s", "vs_baseline": 0.68}))
    b.write_text(json.dumps({"metric": "decode_tps", "value": 99.0,
                             "unit": "t/s", "vs_baseline": 0.75}))
    assert cmp_main([str(a), str(b)]) == 0
    out = capsys.readouterr().out
    assert "+10.0%" in out and "faster" in out


def test_gbnf_validator(tmp_path, capsys):
    from llama_cpp_dsp_tpu.tools.gbnf_validator import main as gv

    g = tmp_path / "g.gbnf"
    g.write_text('root ::= "ab" num\nnum ::= [0-9]+\n')
    ok = tmp_path / "ok.txt"
    ok.write_text("ab123")
    bad = tmp_path / "bad.txt"
    bad.write_text("ax1")
    inc = tmp_path / "inc.txt"
    inc.write_text("ab")
    assert gv([str(g), str(ok)]) == 0
    assert gv([str(g), str(bad)]) == 1
    assert "codepoint 1" in capsys.readouterr().out
    assert gv([str(g), str(inc)]) == 1
    assert "incomplete" in capsys.readouterr().out


def test_quantize_stats(tiny, capsys):
    from llama_cpp_dsp_tpu.tools.quantize_stats import main as qsm

    assert qsm(["-m", tiny, "-t", "q4_0", "-t", "q8_0"]) == 0
    out = capsys.readouterr().out
    assert "Q4_0" in out and "Q8_0" in out and "rmse" in out
    # f32 source quantized to q8_0 must show a small nonzero rmse
    q8_line = [ln for ln in out.splitlines() if "Q8_0" in ln][-1]
    rmse = float(q8_line.split("rmse")[1].split()[0])
    assert 0 < rmse < 0.01


def test_embedding_tool(tiny, capsys):
    from llama_cpp_dsp_tpu.tools.embedding import main, normalize

    v = np.array([3.0, 4.0])
    assert np.allclose(normalize(v, 2), v / 5.0)
    assert np.allclose(normalize(v, -1), v)
    assert np.allclose(normalize(v, 0), v / 4.0)
    assert main(["-m", tiny, "-p", "hello\nworld", "-c", "64",
                 "--embd-output-format", "json+"]) == 0
    import json as _json

    out = _json.loads(capsys.readouterr().out)
    assert len(out["data"]) == 2
    sims = np.array(out["cosine_similarity"])
    assert np.allclose(np.diag(sims), 1.0, atol=1e-4)


def test_parallel_sim(tiny, capsys):
    from llama_cpp_dsp_tpu.tools.parallel_sim import main

    assert main(["-m", tiny, "-np", "2", "-ns", "3", "-n", "4",
                 "-c", "128"]) == 0
    out = capsys.readouterr().out
    assert out.count("client") == 3


def test_gritlm_encode(tiny):
    """Instruction-span exclusion: the pooled vector must ignore the
    instruction prefix tokens (reference gritlm.cpp:20-60)."""
    from llama_cpp_dsp_tpu.runtime.engine import Engine
    from llama_cpp_dsp_tpu.tools.gritlm import encode, gritlm_instruction

    model = load_model(tiny)
    engine = Engine(model, n_slots=1, n_ctx_per_slot=64)
    vs = encode(engine, model.tokenizer, ["hello world"], "an instruction")
    assert vs.shape[0] == 1
    assert np.isclose(np.linalg.norm(vs[0]), 1.0, atol=1e-4)
    assert gritlm_instruction("") == "<|embed|>\n"


def test_compare_bench(tmp_path, capsys):
    """compare-llama-bench role: per-test t/s delta between two runs."""
    import json

    from llama_cpp_dsp_tpu.tools.compare_bench import compare, main

    base = [{"model": "m", "test": "tg128", "t/s": 100.0, "stddev": 0, "n": 3},
            {"model": "m", "test": "pp512", "t/s": 2000.0, "stddev": 0, "n": 3}]
    new = [{"model": "m", "test": "tg128", "t/s": 110.0, "stddev": 0, "n": 3},
           {"model": "m", "test": "tg512", "t/s": 90.0, "stddev": 0, "n": 3}]
    rows = compare(base, new)
    by_test = {r["test"]: r for r in rows}
    assert by_test["tg128"]["delta %"] == 10.0
    assert by_test["pp512"]["new t/s"] == ""   # removed test still listed
    assert by_test["tg512"]["base t/s"] == ""  # new test listed

    a, b = tmp_path / "a.json", tmp_path / "b.json"
    a.write_text(json.dumps(base))
    b.write_text(json.dumps(new))
    assert main([str(a), str(b)]) == 0
    out = capsys.readouterr().out
    assert "tg128" in out and "10.0" in out


def test_cli_process_escapes():
    from llama_cpp_dsp_tpu.tools.cli import _process_escapes

    assert _process_escapes(r"a\nb\tc\x41") == "a\nb\tcA"
    assert _process_escapes("плыть\\nднём") == "плыть\nднём"  # non-latin1
    assert _process_escapes(r"keep \q unknown") == r"keep \q unknown"
    assert _process_escapes("no escapes") == "no escapes"


def test_cli_reverse_prompt_stops_generation(tmp_path, capsysbinary):
    """-r stops at the reverse prompt and does not print it (reference
    antiprompt, examples/main/main.cpp). capsysbinary: the CLI streams raw
    piece bytes, so the stop string is picked from a valid-UTF-8 slice."""
    import sys as _sys

    _sys.path.insert(0, "tests")
    from model_builder import build_tiny_llama

    from llama_cpp_dsp_tpu.tools.cli import main

    path = str(tmp_path / "t.gguf")
    build_tiny_llama(path, qtype=0)
    # first run unconstrained to learn the greedy output
    assert main(["-m", path, "-p", "hi", "-n", "6", "--temp", "0",
                 "-c", "64", "--no-display-prompt"]) == 0
    full = capsysbinary.readouterr().out.rstrip(b"\n")
    stop = None
    for i in range(len(full) // 2, max(len(full) - 2, 0)):
        try:
            stop = full[i:i + 3].decode("utf-8")
            break
        except UnicodeDecodeError:
            continue
    if len(full) < 2 or not stop:
        import pytest

        pytest.skip("degenerate tiny output")
    assert main(["-m", path, "-p", "hi", "-n", "6", "--temp", "0",
                 "-c", "64", "--no-display-prompt", "-r", stop]) == 0
    out = capsysbinary.readouterr().out.rstrip(b"\n")
    assert stop.encode() not in out and full.startswith(out)
