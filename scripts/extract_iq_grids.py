#!/usr/bin/env python3
"""Extract the IQ-quant codebook grids from the reference ggml header.

The IQ1/IQ2/IQ3 formats index into fixed learned codebooks ("grids") that are
part of the GGUF *format definition* (reference ggml/src/ggml-common.h:518+:
iq2xxs_grid, iq2xs_grid, iq2s_grid, iq3xxs_grid, iq3s_grid, iq1s_grid). They
are data constants, not code — any decoder of these formats must embed the
identical tables. This script parses them out of the C header and stores them
as a compressed .npz consumed by llama_cpp_dsp_tpu.quant.iq_grids.

Usage:  python scripts/extract_iq_grids.py [header] [out.npz]
"""

import re
import sys

import numpy as np

HEADER = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/ggml/src/ggml-common.h"
OUT = sys.argv[2] if len(sys.argv) > 2 else "llama_cpp_dsp_tpu/quant/iq_grids.npz"

GRIDS = {
    # name           ctype     count  bytes-per-entry  signed
    "iq2xxs_grid": ("uint64_t", 256, 8, False),
    "iq2xs_grid": ("uint64_t", 512, 8, False),
    "iq2s_grid": ("uint64_t", 1024, 8, False),
    "iq3xxs_grid": ("uint32_t", 256, 4, False),
    "iq3s_grid": ("uint32_t", 512, 4, False),
    "iq1s_grid": ("uint64_t", 2048, 8, True),
}

text = open(HEADER).read()
out = {}
for name, (ctype, count, nbytes, signed) in GRIDS.items():
    m = re.search(
        rf"GGML_TABLE_BEGIN\({ctype}, {name}, (\w+)\)(.*?)GGML_TABLE_END\(\)",
        text,
        re.S,
    )
    assert m, name
    vals = [int(v, 16) for v in re.findall(r"0x([0-9a-fA-F]+)", m.group(2))]
    assert len(vals) == count, (name, len(vals))
    words = np.array(vals, dtype=np.uint64)
    # unpack little-endian into per-element bytes: entry e, byte j = value j
    b = words.view(np.uint8).reshape(count, 8)[:, :nbytes]
    out[name] = b.view(np.int8) if signed else b.copy()

np.savez_compressed(OUT, **out)
print(f"wrote {OUT}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))
