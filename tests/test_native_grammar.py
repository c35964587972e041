"""Native (C++) grammar engine vs the Python oracle — same PDA, bit-equal
accept/reject behavior across grammars and candidate sets.
"""

import numpy as np
import pytest

from llama_cpp_dsp_tpu.grammar.gbnf import parse_gbnf

native = pytest.importorskip("llama_cpp_dsp_tpu.native.grammar_bind")

GRAMMARS = {
    "digits": 'root ::= [0-9]+',
    "json-ish": r'''
root ::= obj
obj ::= "{" ws ( pair ("," ws pair)* )? "}" ws
pair ::= "\"" [a-z]+ "\"" ws ":" ws val
val ::= [0-9]+ | obj | "\"" [a-z ]* "\""
ws ::= [ \t\n]*
''',
    "utf8": 'root ::= ("é" | "漢字" | "abc")+',
}


def _mk(gtext):
    g = parse_gbnf(gtext)
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ compiler available")
    ng = native.NativeGrammar(g.rules, g.root)
    return g, ng


PIECES = [b"0", b"12", b"{", b"}", b'"', b"a", b"abc", b":", b" ", b",",
          b"\xc3", b"\xa9", "é".encode(), "漢".encode(), "字".encode(),
          b"hello", b"9}", b'{"a"', b"\xe6\xbc", b"\xa2", b""]


@pytest.mark.parametrize("name", list(GRAMMARS))
def test_reject_matches_python(name):
    g, ng = _mk(GRAMMARS[name])
    cand = [(i, p) for i, p in enumerate(PIECES)]
    assert ng.reject_candidates(cand) == g.reject_candidates(cand)


@pytest.mark.parametrize("name", list(GRAMMARS))
def test_accept_then_reject_matches(name):
    g, ng = _mk(GRAMMARS[name])
    cand = [(i, p) for i, p in enumerate(PIECES)]
    # walk a few accepted pieces, comparing state after each step
    for step in range(6):
        allowed = [p for i, p in cand if p and i not in g.reject_candidates(cand)]
        if not allowed:
            break
        piece = allowed[step % len(allowed)]
        g.accept_piece(piece)
        ng.accept_piece(piece)
        assert ng.reject_candidates(cand) == g.reject_candidates(cand), (name, step, piece)


def test_full_vocab_mask_speed_parity():
    """Realistic full-vocab filtering: random byte pieces, equal output."""
    rng = np.random.default_rng(0)
    g, ng = _mk(GRAMMARS["json-ish"])
    vocab = []
    alphabet = b'abcdefgh{}":, 0123456789'
    for i in range(2000):
        ln = int(rng.integers(1, 6))
        piece = bytes(alphabet[b % len(alphabet)] for b in rng.integers(0, 255, ln))
        vocab.append((i, piece))
    assert ng.reject_candidates(vocab) == g.reject_candidates(vocab)
