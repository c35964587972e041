"""Native C++ BPE merge core vs the Python twin (semantics oracle), on real
reference vocabularies and fuzzed input — the dual-implementation pattern
the reference uses for its backends (test-backend-ops)."""

from pathlib import Path

import numpy as np
import pytest

from llama_cpp_dsp_tpu.gguf.reader import GGUFModel
from llama_cpp_dsp_tpu.native.bpe_bind import get_lib
from llama_cpp_dsp_tpu.tokenizer import Vocab
from llama_cpp_dsp_tpu.tokenizer.bpe import BpeTokenizer

MODELS_DIR = Path("/root/reference/models")

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


def _vocabs():
    out = []
    for name in ("gpt-2", "llama-bpe", "qwen2", "falcon"):
        p = MODELS_DIR / f"ggml-vocab-{name}.gguf"
        if p.exists():
            out.append(name)
    return out or ["<none>"]


TEXTS = [
    "",
    "hello world",
    "Hello, World! éèê",
    "  leading and  double  spaces ",
    "123 4567 89",
    "你好世界 \U0001f600 mixed பா",
    "def f(x):\n    return x*2  # comment\n\ttabbed",
    "'''''s 't 're I'll they'd",
    "\r\n\r\nwindows\r\nnewlines",
]


@pytest.mark.parametrize("name", _vocabs())
def test_native_matches_python(name):
    p = MODELS_DIR / f"ggml-vocab-{name}.gguf"
    if not p.exists():
        pytest.skip("no reference vocabs")
    vocab = Vocab.from_gguf_kv(GGUFModel.load(str(p)).kv)
    py = BpeTokenizer(vocab, use_native=False)
    nat = BpeTokenizer(vocab, use_native=True)
    assert nat._native is not None

    rng = np.random.default_rng(0)
    fuzz = []
    for _ in range(40):
        n = int(rng.integers(1, 40))
        cps = rng.integers(1, 0x2FFF, size=n)
        fuzz.append("".join(chr(int(c)) for c in cps if not (0xD800 <= c < 0xE000)))

    for text in TEXTS + fuzz:
        a: list[int] = []
        b: list[int] = []
        py.tokenize(text, a)
        nat.tokenize(text, b)
        assert a == b, (name, text[:40], a[:12], b[:12])
