"""Per-tensor + whole-model content hashes for a GGUF file (reference
examples/gguf-hash: xxh64/sha1/sha256 over tensor data; UUIDv5 of the
overall sha256). stdlib hashes: sha256 (default), sha1, fnv1a-64.

Usage: python -m llama_cpp_dsp_tpu.tools.gguf_hash model.gguf [--sha1|--fnv]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import uuid


def fnv1a64(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


# UUID namespace from the reference (examples/gguf-hash/gguf-hash.cpp
# UUID_NAMESPACE_LLAMA_CPP)
_UUID_NS = uuid.UUID("ef001206-dadc-5f6d-a15f-3359e577d4e5")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model")
    ap.add_argument("--sha1", action="store_true")
    ap.add_argument("--fnv", action="store_true")
    ap.add_argument("--uuid", action="store_true",
                    help="print the UUIDv5 of the overall sha256 only")
    args = ap.parse_args(argv)

    from ..gguf.reader import GGUFModel

    gm = GGUFModel.load(args.model)
    total_sha = hashlib.sha256()
    total_sha1 = hashlib.sha1()
    for name, info in gm.tensors.items():
        data = info.data.tobytes()
        total_sha.update(data)
        total_sha1.update(data)
        if args.uuid:
            continue
        if args.fnv:
            print(f"fnv1a64  {fnv1a64(data):016x}  {args.model}:{name}")
        elif args.sha1:
            print(f"sha1     {hashlib.sha1(data).hexdigest()}  {args.model}:{name}")
        else:
            print(f"sha256   {hashlib.sha256(data).hexdigest()}  {args.model}:{name}")
    if args.uuid:
        print(uuid.uuid5(_UUID_NS, total_sha.hexdigest()))
    elif args.sha1:
        print(f"sha1     {total_sha1.hexdigest()}  {args.model}")
    else:
        print(f"sha256   {total_sha.hexdigest()}  {args.model}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
