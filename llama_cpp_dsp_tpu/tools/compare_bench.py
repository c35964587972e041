"""Diff two bench_grid JSON outputs — the reference's
scripts/compare-llama-bench.py role (which diffs llama-bench -o sql runs);
ours consumes `llama-bench -o json` files and prints a per-test delta table.

Usage: python -m llama_cpp_dsp_tpu.tools.compare_bench baseline.json new.json
"""

from __future__ import annotations

import argparse
import json
import sys


def compare(base_rows: list[dict], new_rows: list[dict]) -> list[dict]:
    """Match rows on (model, test); returns rows with old/new t/s + delta %.
    Tests present in only one input are listed with the other side blank."""
    key = lambda r: (r.get("model", ""), r.get("test", ""))  # noqa: E731
    base = {key(r): r for r in base_rows}
    new = {key(r): r for r in new_rows}
    out = []
    for k in list(base) + [k for k in new if k not in base]:
        b, n = base.get(k), new.get(k)
        row = {"model": k[0], "test": k[1],
               "base t/s": b["t/s"] if b else "",
               "new t/s": n["t/s"] if n else ""}
        if b and n and b["t/s"]:
            row["delta %"] = round((n["t/s"] - b["t/s"]) * 100 / b["t/s"], 2)
        else:
            row["delta %"] = ""
        out.append(row)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("baseline", help="bench_grid -o json output (before)")
    ap.add_argument("new", help="bench_grid -o json output (after)")
    ap.add_argument("-o", "--output", default="md", choices=["md", "json"])
    args = ap.parse_args(argv)
    with open(args.baseline) as f:
        base_rows = json.load(f)
    with open(args.new) as f:
        new_rows = json.load(f)
    rows = compare(base_rows, new_rows)
    if args.output == "json":
        print(json.dumps(rows, indent=2))
    else:
        from .bench_grid import _markdown

        print(_markdown(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
