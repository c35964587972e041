"""CLI wrapper: JSON schema -> GBNF grammar.

Capability parity with the reference's examples/json_schema_to_grammar.py:
reads a schema from a file or stdin ("-") and prints the compiled grammar.
"""

from __future__ import annotations

import argparse
import json
import sys

from ..grammar.json_schema import json_schema_to_gbnf


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="Convert a JSON schema to a GBNF grammar")
    ap.add_argument("schema",
                    help='file containing the JSON schema ("-" for stdin)')
    ap.add_argument("--raw-pattern", action="store_true",
                    help="treat string patterns as raw (no quotes/anchors "
                         "added)")
    args = ap.parse_args(argv)

    if args.schema == "-":
        text = sys.stdin.read()
    else:
        with open(args.schema, encoding="utf-8") as f:
            text = f.read()
    schema = json.loads(text)
    print(json_schema_to_gbnf(schema, raw_pattern=args.raw_pattern))
    return 0


if __name__ == "__main__":
    sys.exit(main())
