"""Tokenizer tests against the reference's shipped vocab GGUFs + expected
token streams (models/ggml-vocab-*.gguf{,.inp,.out}), the same fixtures the
reference's test-tokenizer-0 uses (add_special=false, parse_special=false)."""

from pathlib import Path

import pytest

from llama_cpp_dsp_tpu.gguf import read_gguf
from llama_cpp_dsp_tpu.tokenizer import Tokenizer, Vocab

REFERENCE_MODELS = Path("/root/reference/models")
SEP = "\n__ggml_vocab_test__\n"

# vocabs with both the .gguf and .inp/.out fixtures present
FIXTURES = [
    "llama-spm",
    "llama-bpe",
    "gpt-2",
    "falcon",
    "deepseek-coder",
    "deepseek-llm",
    "starcoder",
    "mpt",
    "refact",
    "command-r",
    "qwen2",
    "phi-3",
    "bert-bge",
]


def _load_cases(name: str):
    inp = (REFERENCE_MODELS / f"ggml-vocab-{name}.gguf.inp").read_text(encoding="utf-8")
    out = (REFERENCE_MODELS / f"ggml-vocab-{name}.gguf.out").read_text(encoding="utf-8")
    texts = inp.split(SEP)
    expected = [[int(t) for t in line.split()] for line in out.splitlines()]
    if len(texts) == len(expected) + 1 and texts[-1] == "":
        texts = texts[:-1]  # trailing separator
    assert len(texts) == len(expected), (len(texts), len(expected))
    return list(zip(texts, expected))


def _make_tokenizer(name: str) -> Tokenizer:
    f = read_gguf(REFERENCE_MODELS / f"ggml-vocab-{name}.gguf")
    vocab = Vocab.from_gguf_kv(f.kv)
    return Tokenizer(vocab)


def _available(name: str) -> bool:
    base = REFERENCE_MODELS / f"ggml-vocab-{name}.gguf"
    return base.exists() and base.with_suffix(".gguf.inp").exists()


@pytest.mark.parametrize("name", FIXTURES)
def test_tokenizer_fixtures(name):
    if not _available(name):
        pytest.skip(f"fixture {name} unavailable")
    tok = _make_tokenizer(name)
    failures = []
    for text, want in _load_cases(name):
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != want:
            failures.append((text, want, got))
    assert not failures, "\n".join(
        f"text={t!r}\n want={w}\n  got={g}" for t, w, g in failures[:5]
    ) + f"\n({len(failures)} failures total)"


def test_spm_decode_round_trip():
    if not _available("llama-spm"):
        pytest.skip("fixture unavailable")
    tok = _make_tokenizer("llama-spm")
    for text in ["Hello world", "  leading spaces", "tab\tseparated"]:
        ids = tok.encode(text, add_special=False)
        assert tok.decode(ids) == text.replace("\t", "\t")


def test_special_token_parsing():
    if not _available("llama-bpe"):
        pytest.skip("fixture unavailable")
    tok = _make_tokenizer("llama-bpe")
    v = tok.vocab
    bot = "<|begin_of_text|>"
    assert v.text_to_token(bot) != -1
    with_special = tok.encode(f"{bot}hi", add_special=False, parse_special=True)
    assert with_special[0] == v.text_to_token(bot)
    without = tok.encode(f"{bot}hi", add_special=False, parse_special=False)
    assert without[0] != v.text_to_token(bot)


# -- UGM (unigram) and RWKV tokenizers ---------------------------------------

def _ugm_vocab():
    from llama_cpp_dsp_tpu.tokenizer.vocab import TokenAttr, Vocab, VocabType

    tokens = ["<unk>", "▁", "▁hello", "▁world", "hello", "wor", "ld", "o",
              "h", "e", "l", "w", "r", "d", "▁he", "llo"]
    scores = [0.0, -2.0, -3.0, -5.0, -3.5, -4.0, -2.0, -1.0,
              -1.0, -1.0, -1.0, -1.0, -1.0, -1.0, -3.0, -2.5]
    attrs = [TokenAttr.UNKNOWN] + [TokenAttr.NORMAL] * (len(tokens) - 1)
    return Vocab(VocabType.UGM, tokens, scores, attrs, unk_id=0,
                 add_space_prefix=True, remove_extra_whitespaces=True)


def test_ugm_viterbi_segmentation():
    from llama_cpp_dsp_tpu.tokenizer import Tokenizer

    v = _ugm_vocab()
    tok = Tokenizer(v)
    ids = tok.encode("hello world", add_special=False)
    # viterbi must pick the highest-scoring segmentation:
    # "▁hello" (-3) + "▁world" (-5) = -8 beats piecewise alternatives
    assert ids == [v.token_to_id["▁hello"], v.token_to_id["▁world"]]
    # unknown characters map to UNK (merged)
    ids = tok.encode("héllo", add_special=False)
    assert v.unk_id in ids


def test_rwkv_greedy_longest_match():
    from llama_cpp_dsp_tpu.tokenizer import Tokenizer
    from llama_cpp_dsp_tpu.tokenizer.vocab import TokenAttr, Vocab, VocabType

    tokens = ["a", "b", "ab", "abc", "c", " ", "\\x68i"]  # \x68 = 'h'
    attrs = [TokenAttr.NORMAL] * len(tokens)
    v = Vocab(VocabType.RWKV, tokens, [0.0] * len(tokens), attrs)
    tok = Tokenizer(v)
    assert tok.encode("abc", add_special=False) == [3]       # longest match
    assert tok.encode("ab c", add_special=False) == [2, 5, 4]
    assert tok.encode("hi", add_special=False) == [6]        # escaped bytes
