"""Diff two bench.py JSON outputs (role of scripts/compare-llama-bench.py).

The reference compares llama-bench SQL dumps between two commits; here each
round's driver writes BENCH_r{N}.json, so comparison is over those files or
any saved one-line bench outputs.

Usage:
  python scripts/compare_bench.py OLD.json NEW.json
  python scripts/compare_bench.py BENCH_r1.json BENCH_r2.json
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        text = f.read().strip()
    # tolerate trailing log lines: take the last JSON object line
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise ValueError(f"no JSON object found in {path}")


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    old, new = (_load(p) for p in argv)
    m_old, m_new = old.get("metric", "?"), new.get("metric", "?")
    if m_old != m_new:
        print(f"warning: comparing different metrics ({m_old} vs {m_new})",
              file=sys.stderr)
    v_old, v_new = float(old["value"]), float(new["value"])
    unit = new.get("unit", old.get("unit", ""))
    delta = v_new - v_old
    pct = 100.0 * delta / v_old if v_old else float("inf")
    arrow = "faster" if delta > 0 else "slower" if delta < 0 else "unchanged"
    print(f"{m_new}: {v_old:.2f} -> {v_new:.2f} {unit} "
          f"({delta:+.2f}, {pct:+.1f}% {arrow})")
    for k in ("vs_baseline",):
        if k in old and k in new:
            print(f"  {k}: {float(old[k]):.3f} -> {float(new[k]):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
