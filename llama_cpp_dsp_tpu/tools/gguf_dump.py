"""Dump GGUF metadata and tensor tables.

Capability parity with the reference's gguf-py script
(gguf-py/gguf/scripts/gguf_dump.py): human-readable dump by default, plus
--json and --markdown modes and --no-tensors, built on this repo's zero-copy
reader instead of gguf-py.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from ..gguf.constants import GGUFValueType
from ..gguf.reader import GGUFFile, read_gguf

_MAX_INLINE = 8  # array elements shown inline in text/markdown modes


def _fmt_value(v, etype: GGUFValueType | None) -> str:
    if isinstance(v, str):
        s = v if len(v) <= 60 else v[:57] + "..."
        return json.dumps(s)
    if isinstance(v, (list, np.ndarray)):
        n = len(v)
        head = [_fmt_value(x, None) for x in list(v[:_MAX_INLINE])]
        ename = etype.name if etype is not None else "?"
        ell = ", ..." if n > _MAX_INLINE else ""
        return f"[{ename}; {n}] = [{', '.join(head)}{ell}]"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    return str(v)


def _json_value(v, full_arrays: bool):
    if isinstance(v, np.ndarray):
        if full_arrays:
            return v.tolist()
        return {"len": int(v.size), "head": v[:_MAX_INLINE].tolist()}
    if isinstance(v, list):
        if full_arrays:
            return v
        return {"len": len(v), "head": v[:_MAX_INLINE]}
    if isinstance(v, (np.integer, np.floating, np.bool_)):
        return v.item()
    return v


def dump_text(gf: GGUFFile) -> None:
    print(f"* file: {gf.path}")
    print(
        f"* GGUF version {gf.version} | alignment {gf.alignment} | "
        f"data offset {gf.data_offset}"
    )
    print(f"* {len(gf.kv)} key/value pairs, {len(gf.tensors)} tensors\n")
    print("KV metadata:")
    for i, (key, v) in enumerate(gf.kv.items(), 1):
        vtype, etype = gf.kv_types.get(key, (None, None))
        tname = vtype.name if vtype is not None else "?"
        print(f"  {i:4d}: {tname:>8} | {key} = {_fmt_value(v, etype)}")
    if gf.tensors:
        print("\nTensors:")
        print(f"  {'#':>4}  {'name':<48} {'type':>8} {'shape (ne)':>24} "
              f"{'offset':>12} {'bytes':>12}")
        for i, t in enumerate(gf.tensors.values(), 1):
            shape = "x".join(str(d) for d in t.shape)
            print(f"  {i:4d}  {t.name:<48} {t.ggml_type.name:>8} {shape:>24} "
                  f"{t.offset:>12} {t.nbytes:>12}")


def dump_json(gf: GGUFFile, full_arrays: bool, with_tensors: bool) -> None:
    out = {
        "filename": gf.path,
        "version": gf.version,
        "alignment": gf.alignment,
        "data_offset": gf.data_offset,
        "metadata": {
            key: {
                "type": gf.kv_types[key][0].name,
                **(
                    {"elem_type": gf.kv_types[key][1].name}
                    if gf.kv_types[key][1] is not None
                    else {}
                ),
                "value": _json_value(v, full_arrays),
            }
            for key, v in gf.kv.items()
        },
    }
    if with_tensors:
        out["tensors"] = {
            t.name: {
                "shape": list(t.shape),
                "type": t.ggml_type.name,
                "offset": t.offset,
                "nbytes": t.nbytes,
            }
            for t in gf.tensors.values()
        }
    json.dump(out, sys.stdout, indent=2)
    print()


def dump_markdown(gf: GGUFFile, with_tensors: bool) -> None:
    print(f"# {gf.path}\n")
    print("## Key/value pairs\n")
    print("| # | Key | Type | Value |")
    print("|--:|-----|------|-------|")
    for i, (key, v) in enumerate(gf.kv.items(), 1):
        vtype, etype = gf.kv_types.get(key, (None, None))
        val = _fmt_value(v, etype).replace("|", "\\|")
        print(f"| {i} | `{key}` | {vtype.name if vtype else '?'} | {val} |")
    if with_tensors and gf.tensors:
        print("\n## Tensors\n")
        print("| # | Name | Type | Shape (ne) | Offset | Bytes |")
        print("|--:|------|------|-----------|-------:|------:|")
        for i, t in enumerate(gf.tensors.values(), 1):
            shape = " x ".join(str(d) for d in t.shape)
            print(f"| {i} | `{t.name}` | {t.ggml_type.name} | {shape} | "
                  f"{t.offset} | {t.nbytes} |")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Dump GGUF file metadata")
    ap.add_argument("model", help="GGUF file to dump")
    ap.add_argument("--no-tensors", action="store_true",
                    help="don't dump tensor metadata")
    ap.add_argument("--json", action="store_true", help="JSON output")
    ap.add_argument("--json-array", action="store_true",
                    help="include full array values in JSON output")
    ap.add_argument("--markdown", action="store_true", help="markdown output")
    ap.add_argument("--data-offset", action="store_true",
                    help="print only the data-section start offset")
    ap.add_argument("--data-alignment", action="store_true",
                    help="print only the data alignment")
    args = ap.parse_args(argv)

    gf = read_gguf(args.model, load_data=False)
    try:
        if args.data_offset:
            print(gf.data_offset)
        elif args.data_alignment:
            print(gf.alignment)
        elif args.json:
            dump_json(gf, args.json_array, not args.no_tensors)
        elif args.markdown:
            dump_markdown(gf, not args.no_tensors)
        else:
            if args.no_tensors:
                gf.tensors.clear()
            dump_text(gf)
    finally:
        gf.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
