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


@pytest.mark.parametrize("name", ["llama-spm", "gpt-2"])
def test_detokenize_round_trip_real_vocab(name):
    """test-tokenizer-1 style: decode(token) re-encodes to the same id (or
    an equal-piece sequence) for a sample of the real vocab."""
    g = MODELS_DIR / f"ggml-vocab-{name}.gguf"
    if not g.exists():
        pytest.skip("fixture missing")
    gm = GGUFModel.load(str(g))
    vocab = Vocab.from_gguf_kv(gm.kv)
    tok = Tokenizer(vocab)
    import random

    rng = random.Random(0)
    ids = rng.sample(range(vocab.n_tokens), min(1500, vocab.n_tokens))
    checked = 0
    for tid in ids:
        piece = tok.token_to_piece(tid, special=False)
        if not piece:
            continue  # control/special tokens render empty
        text = piece.decode("utf-8", errors="ignore")
        if not text:
            continue
        back = tok.decode(tok.encode(text, add_special=False,
                                     parse_special=False))
        if back != text and vocab.clean_spaces and back == text.lstrip(" "):
            # gpt2-style decoders strip the leading space (clean_spaces),
            # a by-design round-trip asymmetry in the reference too
            checked += 1
            continue
        assert back == text, (tid, text, back)
        checked += 1
    assert checked > 500
