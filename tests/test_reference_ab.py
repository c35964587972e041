"""A/B tests against a CPU build of the actual reference binaries.

The strongest whole-stack semantic oracle available: tokenizer + graph +
dequant + sampler compared against the thing being re-implemented.

- Greedy stream identity (F32): SURVEY §7 stage-3 gate — byte-identical
  output from `llama-cli --temp 0` (reference examples/main/main.cpp) and
  our CLI on the same GGUF. F32 only: for quantized weights the reference
  CPU backend quantizes the *activations* to Q8_0 inside every matmul
  (ggml-cpu vec_dot), so its logits carry ~0.5% noise our exact-dequant
  path doesn't — random tiny-model logits are knife-edge and argmax flips.
- Logit parity: our forward vs the reference's --kl-divergence-base logit
  dump — mean KL ~1e-7-class on F32 (u16 codec floor), small on quantized.
- Perplexity parity: `llama-perplexity` final PPL (perplexity.cpp:441).
- Quantizer A/B: `llama-quantize` (src/llama-quant.cpp:220-310) vs
  tools/quantize.py — identical per-tensor type choices AND identical
  packed bytes, both --pure and with the k-quant mixture schedule.
- Tokenizer ids: `llama-tokenize --ids` vs ours on the same GGUF.

Build the binaries first: scripts/build_reference.sh (-> /tmp/refbuild, or
point LLAMA_REF_BIN at an existing build's bin/). Skipped when absent.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from model_builder import build_tiny_llama  # noqa: E402

from llama_cpp_dsp_tpu.gguf.constants import GGMLType  # noqa: E402
from llama_cpp_dsp_tpu.gguf.reader import GGUFModel  # noqa: E402

def _ref_bin_dir() -> str:
    """LLAMA_REF_BIN, else the persistent in-repo build (.refbuild/bin —
    survives /tmp wipes between sessions), else the legacy /tmp path."""
    env = os.environ.get("LLAMA_REF_BIN")
    if env:
        return env
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (os.path.join(repo, ".refbuild", "bin"), "/tmp/refbuild/bin"):
        if os.path.exists(os.path.join(cand, "llama-cli")):
            return cand
    return os.path.join(repo, ".refbuild", "bin")


REF_BIN = _ref_bin_dir()

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_BIN, "llama-cli")),
    reason="reference binaries not built (run scripts/build_reference.sh)",
)

PPL_TEXT_WORDS = ["the", "fox", "jumps", "over", "lazy", "dog", "a", "quick",
                  "brown", "and", "runs", "far", "then", "stops", "to",
                  "rest", "near", "river", "bank", "at", "dawn"]


def _ref(tool: str, *args: str) -> subprocess.CompletedProcess:
    p = subprocess.run([os.path.join(REF_BIN, tool), *args],
                       capture_output=True, timeout=600)
    assert p.returncode == 0, p.stderr[-800:].decode(errors="replace")
    return p


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    """Tiny GGUFs per quant type (256-wide so K-quant rows are legal)."""
    d = tmp_path_factory.mktemp("ab")
    out = {}
    for qt in (GGMLType.F32, GGMLType.Q4_0, GGMLType.Q8_0, GGMLType.Q4_K,
               GGMLType.Q6_K):
        path = str(d / f"tiny_{qt.name}.gguf")
        build_tiny_llama(path, qtype=qt, n_embd=256, n_ff=512)
        out[qt] = path
    return out


@pytest.fixture(scope="module")
def ppl_text(tmp_path_factory):
    import random

    rng = random.Random(0)
    path = str(tmp_path_factory.mktemp("ppl") / "corpus.txt")
    with open(path, "w") as f:
        f.write(" ".join(rng.choice(PPL_TEXT_WORDS) for _ in range(220)))
    return path


def _our_cli_bytes(capsysbinary, *argv: str) -> bytes:
    from llama_cpp_dsp_tpu.tools import cli

    assert cli.main(list(argv)) in (0, None)
    return capsysbinary.readouterr().out


@pytest.mark.parametrize("prompt", ["hello", "The quick brown fox",
                                    "a b c d"])
def test_greedy_stream_identity_f32(models, capsysbinary, prompt):
    n = 24
    ref = _ref("llama-cli", "-m", models[GGMLType.F32], "-p", prompt,
               "-n", str(n), "--temp", "0", "-c", "128", "--seed", "0",
               "-no-cnv", "--no-display-prompt").stdout
    ours = _our_cli_bytes(
        capsysbinary, "-m", models[GGMLType.F32], "-p", prompt, "-n", str(n),
        "--temp", "0", "-c", "128", "--no-display-prompt",
        "--compute-dtype", "float32")
    assert ours.strip(b"\n") == ref.strip(b"\n"), (
        f"greedy stream diverged on prompt {prompt!r}:\n"
        f"  ref : {ref!r}\n  ours: {ours!r}")


def test_greedy_stream_identity_sampler_chain(models, capsysbinary):
    """Non-trivial sampler settings at temp 0 still reduce to greedy on
    both sides (chain wiring parity)."""
    args = ["--temp", "0", "--top-k", "5", "--repeat-penalty", "1.1",
            "--repeat-last-n", "16"]
    ref = _ref("llama-cli", "-m", models[GGMLType.F32], "-p", "hi there",
               "-n", "16", "-c", "128", "--seed", "0", "-no-cnv",
               "--no-display-prompt", *args).stdout
    ours = _our_cli_bytes(
        capsysbinary, "-m", models[GGMLType.F32], "-p", "hi there",
        "-n", "16", "-c", "128", "--no-display-prompt",
        "--compute-dtype", "float32", *args)
    assert ours.strip(b"\n") == ref.strip(b"\n"), (ref, ours)


@pytest.mark.parametrize("qt,kl_budget", [
    (GGMLType.F32, 5e-5),   # u16 codec floor of the base file itself
    (GGMLType.Q8_0, 2e-3),  # reference Q8_0-activation noise
    (GGMLType.Q4_K, 2e-3),
])
def test_logit_parity_vs_reference_dump(models, ppl_text, tmp_path, qt,
                                        kl_budget):
    """Mean KL between the reference's own logits and ours on the same GGUF
    — the tightest whole-graph check (dequant, rope, norm, attention all
    inside)."""
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.tools.perplexity import kl_divergence

    base = str(tmp_path / f"{qt.name}.logits")
    _ref("llama-perplexity", "-m", models[qt], "-f", ppl_text, "-c", "64",
         "--kl-divergence-base", base)
    import jax.numpy as jnp

    model = load_model(models[qt])
    kl, top1 = kl_divergence(model, base, compute_dtype=jnp.float32,
                             progress=False)
    assert kl < kl_budget, (kl, kl_budget)
    assert top1 > (0.999 if qt == GGMLType.F32 else 0.9), top1


@pytest.mark.parametrize("qt,rtol", [
    (GGMLType.F32, 2e-3),
    (GGMLType.Q8_0, 2e-2),
    (GGMLType.Q6_K, 2e-2),
])
def test_perplexity_parity(models, ppl_text, capsys, qt, rtol):
    import re

    p = _ref("llama-perplexity", "-m", models[qt], "-f", ppl_text, "-c", "64")
    m = re.search(rb"Final estimate: PPL = ([0-9.]+)", p.stdout + p.stderr)
    ref_ppl = float(m.group(1))

    from llama_cpp_dsp_tpu.tools import perplexity

    assert perplexity.main(["-m", models[qt], "-f", ppl_text, "-c", "64",
                            "--compute-dtype", "float32"]) == 0
    out = capsys.readouterr().out
    m = re.search(r"PPL = ([0-9.]+)", out)
    ours = float(m.group(1))
    assert abs(ours - ref_ppl) / ref_ppl < rtol, (ref_ppl, ours)


def test_q4_0_closer_to_f32_truth(models, ppl_text, tmp_path):
    """Q4_0 is excluded from strict parity: the reference CPU backend
    re-quantizes *activations* to Q8_0 inside every quantized vec_dot
    (ggml-cpu quantize_row_q8_0), so its Q4_0 logits drift measurably from
    the F32 truth on knife-edge random tiny weights (measured KL≈0.43),
    while our exact-dequant bf16/f32 GEMM stays ~9× closer (KL≈0.05).
    Triangulate instead: both sides' Q4_0 KL vs the SAME reference-dumped
    F32 base — ours must be at least as close to the truth."""
    import re

    import jax.numpy as jnp

    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.tools.perplexity import kl_divergence

    base = str(tmp_path / "f32.logits")
    _ref("llama-perplexity", "-m", models[GGMLType.F32], "-f", ppl_text,
         "-c", "64", "--kl-divergence-base", base)
    p = _ref("llama-perplexity", "-m", models[GGMLType.Q4_0], "-f", ppl_text,
             "-c", "64", "--kl-divergence-base", base, "--kl-divergence")
    m = re.search(rb"Mean\s+KLD:\s+([0-9.]+)", p.stdout + p.stderr)
    ref_kl = float(m.group(1))

    model = load_model(models[GGMLType.Q4_0])
    our_kl, _ = kl_divergence(model, base, compute_dtype=jnp.float32,
                              progress=False)
    assert our_kl <= max(ref_kl, 1e-3), (our_kl, ref_kl)


def _compare_quantized(path_ref: str, path_ours: str):
    gr, go = GGUFModel.load(path_ref), GGUFModel.load(path_ours)
    try:
        assert set(gr.tensors) == set(go.tensors)
        mism = {n: (gr.tensors[n].ggml_type.name, go.tensors[n].ggml_type.name)
                for n in gr.tensors
                if gr.tensors[n].ggml_type != go.tensors[n].ggml_type}
        assert not mism, f"type choices diverged: {mism}"
        diff = []
        for name, ti in gr.tensors.items():
            a = np.asarray(ti.data)
            b = np.asarray(go.tensors[name].data)
            if not (a.shape == b.shape and np.array_equal(a, b)):
                diff.append(name)
        assert not diff, f"byte mismatch: {diff}"
    finally:
        gr.close()
        go.close()


@pytest.mark.parametrize("ftype", ["Q4_0", "Q5_0", "Q5_1", "Q8_0", "Q4_K_S",
                                   "Q6_K"])
def test_quantize_pure_bytes_identical(models, tmp_path, ftype):
    from llama_cpp_dsp_tpu.tools import quantize as q

    src = models[GGMLType.F32]
    ref_out = str(tmp_path / f"ref_{ftype}.gguf")
    our_out = str(tmp_path / f"our_{ftype}.gguf")
    _ref("llama-quantize", "--pure", src, ref_out, ftype)
    assert q.main([src, our_out, ftype, "--pure"]) == 0
    _compare_quantized(ref_out, our_out)


@pytest.mark.parametrize("ftype", ["Q4_K_M", "Q5_K_M", "Q3_K_M", "Q2_K"])
def test_quantize_mixture_schedule_identical(models, tmp_path, ftype):
    """The k-quant mixture heuristics (llama_tensor_get_type) must pick the
    same per-tensor types and produce the same bytes."""
    from llama_cpp_dsp_tpu.tools import quantize as q

    src = models[GGMLType.F32]
    ref_out = str(tmp_path / f"ref_{ftype}.gguf")
    our_out = str(tmp_path / f"our_{ftype}.gguf")
    _ref("llama-quantize", src, ref_out, ftype)
    assert q.main([src, our_out, ftype]) == 0
    _compare_quantized(ref_out, our_out)


def test_tokenizer_ids_identical(models):
    """llama-tokenize ids == our tokenizer ids on the same GGUF."""
    from llama_cpp_dsp_tpu.runtime.loader import load_model

    text = "hello world éè 123"
    p = _ref("llama-tokenize", "-m", models[GGMLType.Q4_0], "-p", text,
             "--ids")
    ref_ids = [int(x) for x in
               p.stdout.decode().strip().strip("[]").replace(",", " ").split()]
    model = load_model(models[GGMLType.Q4_0])
    ours = model.tokenizer.encode(text, add_special=True)
    assert list(ours) == ref_ids, (ref_ids, list(ours))
