"""Tokenizer parity against the reference's OWN test vectors.

The reference repo ships vocab-only GGUFs plus `.inp`/`.out` expected
tokenizations (the fixtures its test-tokenizer-0 consumes,
tests/CMakeLists.txt:75-87). We load each real vocab with our loader and
must reproduce the expected token streams exactly. Read-only fixture use —
no reference code is executed.
"""

import pathlib

import pytest

from llama_cpp_dsp_tpu.gguf.reader import GGUFModel
from llama_cpp_dsp_tpu.tokenizer import Tokenizer, Vocab

MODELS_DIR = pathlib.Path("/root/reference/models")

# vocabs whose tokenizer family + pretokenizer preset we implement
CASES = [
    "llama-spm", "gpt-2", "llama-bpe", "falcon", "starcoder", "mpt",
    "gpt-neox", "refact", "deepseek-coder", "deepseek-llm", "bert-bge",
    "phi-3", "baichuan", "qwen2", "command-r", "chameleon", "gpt-4o",
    "llama4", "deepseek-r1-qwen", "roberta-bpe",
]


def _load_cases():
    out = []
    for name in CASES:
        g = MODELS_DIR / f"ggml-vocab-{name}.gguf"
        if g.exists() and g.with_suffix(".gguf.inp").exists():
            out.append(name)
    return out


def _read_fixture(name):
    inp = (MODELS_DIR / f"ggml-vocab-{name}.gguf.inp").read_text(encoding="utf-8")
    outp = (MODELS_DIR / f"ggml-vocab-{name}.gguf.out").read_text(encoding="utf-8")
    texts = inp.split("\n__ggml_vocab_test__\n")
    expected = [
        [int(t) for t in line.split()] for line in outp.split("\n")
    ]
    return texts, expected


@pytest.mark.parametrize("name", _load_cases())
def test_reference_tokenizer_vectors(name):
    gm = GGUFModel.load(str(MODELS_DIR / f"ggml-vocab-{name}.gguf"))
    vocab = Vocab.from_gguf_kv(gm.kv)
    try:
        tok = Tokenizer(vocab)
    except NotImplementedError:
        pytest.skip(f"tokenizer type {vocab.vocab_type} not implemented")

    texts, expected = _read_fixture(name)
    n_pass = 0
    failures = []
    for text, want in zip(texts, expected):
        got = tok.encode(text, add_special=False, parse_special=False)
        if got == want:
            n_pass += 1
        else:
            failures.append((text[:40], got[:12], want[:12]))
    total = len(texts)
    # require exact parity on every vector
    assert not failures, (
        f"{name}: {n_pass}/{total} passed; first failures: {failures[:3]}"
    )
