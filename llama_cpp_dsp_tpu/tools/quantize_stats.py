"""Per-tensor quantization error statistics — parity with reference
examples/quantize-stats: for every quantizable tensor, quantize -> dequantize
with each requested type and report RMSE, max |err|, and the fraction of
elements whose error exceeds a threshold, plus totals per type.

Usage:
  python -m llama_cpp_dsp_tpu.tools.quantize_stats -m model.gguf [-t q4_K ...]
          [--include-layer RE] [--exclude-layer RE] [--per-layer]
"""

from __future__ import annotations

import argparse
import re
import sys

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFModel
from ..quant import ref_numpy as refq
from .quantize import should_quantize

DEFAULT_TYPES = ("q4_0", "q4_1", "q5_0", "q5_1", "q8_0", "q2_K", "q3_K",
                 "q4_K", "q5_K", "q6_K")
ERR_THRESHOLD = 0.5  # reference quantize-stats HISTOGRAM_RANGE-ish tail gauge


class _Stats:
    def __init__(self) -> None:
        self.n = 0
        self.sse = 0.0
        self.max = 0.0
        self.over = 0

    def add(self, ref: np.ndarray, out: np.ndarray) -> None:
        err = (out.astype(np.float64) - ref.astype(np.float64))
        self.n += err.size
        self.sse += float(np.dot(err, err))
        self.max = max(self.max, float(np.max(np.abs(err))))
        self.over += int(np.sum(np.abs(err) > ERR_THRESHOLD))

    def row(self) -> str:
        rmse = (self.sse / max(self.n, 1)) ** 0.5
        return (f"rmse {rmse:.8f}  max {self.max:.8f}  "
                f"err>{ERR_THRESHOLD} {self.over / max(self.n, 1):.2e}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-quantize-stats", description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-t", "--type", action="append", default=None,
                    help="quant type to test (repeatable; default: common set)")
    ap.add_argument("-L", "--include-layer", action="append", default=[],
                    help="only tensors matching this regex")
    ap.add_argument("-X", "--exclude-layer", action="append", default=[],
                    help="skip tensors matching this regex")
    ap.add_argument("--per-layer", action="store_true",
                    help="print one line per tensor, not just totals")
    args = ap.parse_args(argv)

    types = []
    for t in (args.type or DEFAULT_TYPES):
        try:
            types.append(GGMLType[t] if t in GGMLType.__members__
                         else GGMLType[t.upper()])
        except KeyError:
            print(f"unknown type {t}", file=sys.stderr)
            return 2

    gm = GGUFModel.load(args.model)
    totals = {t: _Stats() for t in types}
    n_tested = 0
    for name, info in gm.tensors.items():
        if not should_quantize(name, info.np_shape):
            continue
        if args.include_layer and not any(
                re.search(p, name) for p in args.include_layer):
            continue
        if any(re.search(p, name) for p in args.exclude_layer):
            continue
        ne0 = info.shape[0]  # ggml row length (quant block axis)
        f32 = refq.dequantize(np.asarray(info.data), info.ggml_type).reshape(-1)
        n_tested += 1
        for t in types:
            block = 32 if t in (GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                                GGMLType.Q5_1, GGMLType.Q8_0) else 256
            if ne0 % block:
                continue
            raw = refq.quantize_weighted(f32, t, None, ne0)
            out = refq.dequantize(raw, t).reshape(-1)
            st = _Stats()
            st.add(f32, out)
            totals[t].add(f32, out)
            if args.per_layer:
                print(f"{t.name:>7} {name:<48} {st.row()}")
    gm.close()

    print(f"\n== totals over {n_tested} tensors ==")
    for t in types:
        if totals[t].n:
            print(f"{t.name:>7} {totals[t].row()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
