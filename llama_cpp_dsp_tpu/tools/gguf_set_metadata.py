"""Patch one scalar metadata value in a GGUF file, in place.

Capability parity with the reference's gguf-py script
(gguf-py/gguf/scripts/gguf_set_metadata.py): only fixed-width scalar values
can be patched since the edit must not move any bytes; strings/arrays need
tools/gguf_new_metadata.py (full rewrite).
"""

from __future__ import annotations

import argparse
import mmap
import struct
import sys

from ..gguf.constants import GGUF_MAGIC, GGUF_SCALAR_FMT, GGUFValueType
from ..gguf.reader import GGUFFormatError, _Parser


def find_scalar_kv(buf) -> dict[str, tuple[GGUFValueType, int]]:
    """Walk the KV section, returning key -> (vtype, value byte offset).

    Reuses the reader's low-level parser; mirrors the header walk of
    reference ggml/src/gguf.cpp:319 but records value positions instead of
    materializing values.
    """
    p = _Parser(buf)
    if p.read(4) != GGUF_MAGIC:
        raise GGUFFormatError("not a GGUF file")
    version = p.u32()
    if version == 1 or version > 3:
        raise GGUFFormatError(f"unsupported GGUF version {version}")
    p.u64()  # n_tensors
    n_kv = p.u64()
    out: dict[str, tuple[GGUFValueType, int]] = {}
    for _ in range(n_kv):
        key = p.string()
        vtype = GGUFValueType(p.u32())
        out[key] = (vtype, p.pos)
        p.value(vtype)  # advance past the value
    return out


def parse_value(vtype: GGUFValueType, text: str):
    if vtype == GGUFValueType.BOOL:
        if text.lower() in ("true", "1"):
            return True
        if text.lower() in ("false", "0"):
            return False
        raise ValueError(f"not a bool: {text!r}")
    if vtype in (GGUFValueType.FLOAT32, GGUFValueType.FLOAT64):
        return float(text)
    return int(text, 0)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="Set a scalar GGUF metadata value in place")
    ap.add_argument("model", help="GGUF file to patch")
    ap.add_argument("key", help="metadata key")
    ap.add_argument("value", help="new value")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--force", action="store_true",
                    help="apply without confirmation")
    args = ap.parse_args(argv)

    with open(args.model, "r+b") as f:
        mm = mmap.mmap(f.fileno(), 0)
        try:
            kvs = find_scalar_kv(memoryview(mm))
            if args.key not in kvs:
                print(f"error: key {args.key!r} not found", file=sys.stderr)
                return 1
            vtype, off = kvs[args.key]
            if vtype in (GGUFValueType.STRING, GGUFValueType.ARRAY):
                print(
                    f"error: {args.key} is {vtype.name}; only fixed-width "
                    "scalars can be patched in place (use gguf_new_metadata)",
                    file=sys.stderr)
                return 1
            fmt, size = GGUF_SCALAR_FMT[vtype]
            (old,) = struct.unpack_from(fmt, mm, off)
            new = parse_value(vtype, args.value)
            print(f"{args.key}: {old!r} -> {new!r} ({vtype.name} @ {off})")
            if args.dry_run:
                return 0
            if not args.force:
                resp = input("apply? [y/N] ")
                if resp.strip().lower() not in ("y", "yes"):
                    print("aborted")
                    return 1
            struct.pack_into(fmt, mm, off, new)
            mm.flush()
        finally:
            mm.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
