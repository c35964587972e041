"""Regex → GBNF grammar (reference examples/regex_to_grammar.py: wraps the
JSON-schema converter with a string `pattern` schema and --raw-pattern).

Usage: python -m llama_cpp_dsp_tpu.tools.regex_to_grammar '^[a-z]+$'
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pattern", help="anchored regex (^...$)")
    args = ap.parse_args(argv)
    from ..grammar.json_schema import json_schema_to_gbnf

    print(json_schema_to_gbnf({"type": "string", "pattern": args.pattern},
                              raw_pattern=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
