"""GBNF grammar validator — parity with reference examples/gbnf-validator:
parse a .gbnf file, feed an input string through the pushdown automaton,
report accept / first-failing byte offset with context.

Usage: python -m llama_cpp_dsp_tpu.tools.gbnf_validator grammar.gbnf input.txt
"""

from __future__ import annotations

import argparse
import sys

from ..grammar.gbnf import GrammarError, decode_utf8, parse_gbnf


def validate(grammar_text: str, data: bytes) -> tuple[bool, int]:
    """Returns (ok, error_codepoint_offset). Offset is len(cps) on success
    mid-string rejection; -1 when the input ends in an incomplete parse
    (reference gbnf-validator.cpp llama_grammar_validate)."""
    g = parse_gbnf(grammar_text)
    cps, partial = decode_utf8(data, (0, 0))
    if partial[1] != 0:
        return False, len(cps)  # truncated/invalid utf-8 tail
    for i, cp in enumerate(cps):
        g.accept_char(cp)
        if not g.stacks:
            return False, i
    if any(len(s) == 0 for s in g.stacks):
        return True, len(cps)
    return False, -1  # consumed everything but the parse is incomplete


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-gbnf-validator", description=__doc__)
    ap.add_argument("grammar", help="path to .gbnf grammar file")
    ap.add_argument("input", help="path to input text file")
    args = ap.parse_args(argv)

    grammar_text = open(args.grammar, encoding="utf-8").read()
    data = open(args.input, "rb").read()
    try:
        ok, at = validate(grammar_text, data)
    except GrammarError as e:
        print(f"grammar parse failed: {e}", file=sys.stderr)
        return 2
    if ok:
        print("Input string is valid according to the grammar.")
        return 0
    if at < 0:
        print("Input string is incomplete according to the grammar.")
        return 1
    # show context around the failing codepoint (reference prints the
    # error position with surrounding text)
    text = data.decode("utf-8", errors="replace")
    lo, hi = max(0, at - 40), min(len(text), at + 40)
    print(f"Input string is invalid according to the grammar at codepoint {at}:")
    print(f"  ...{text[lo:at]}<<<HERE>>>{text[at:hi]}...")
    return 1


if __name__ == "__main__":
    sys.exit(main())
