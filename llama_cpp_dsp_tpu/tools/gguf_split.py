"""Split / merge GGUF files — reference examples/gguf-split (583 LoC).

Split writes `-%05d-of-%05d.gguf` shards with the reference's split.* keys
(split.no / split.count / split.tensors.count); the first shard carries the
full metadata. Merge reassembles one file. The loader already reads split
models directly (gguf/reader.py split_paths), matching llama.cpp behavior.

Usage:
  python -m llama_cpp_dsp_tpu.tools.gguf_split --split --split-max-tensors 128 in.gguf out
  python -m llama_cpp_dsp_tpu.tools.gguf_split --merge in-00001-of-00003.gguf out.gguf
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..gguf.constants import Keys
from ..gguf.reader import GGUFModel
from ..gguf.writer import GGUFWriter


def split(src: str, dst_prefix: str, *, max_tensors: int = 128) -> list[str]:
    gm = GGUFModel.load(src)
    names = list(gm.tensors)
    shards = [names[i : i + max_tensors] for i in range(0, len(names), max_tensors)]
    n = len(shards)
    paths = []
    for i, shard in enumerate(shards):
        path = f"{dst_prefix}-{i + 1:05d}-of-{n:05d}.gguf"
        arch = str(gm.kv.get(Keys.General.ARCHITECTURE, "llama"))
        w = GGUFWriter(path, arch)
        if i == 0:  # full metadata rides the first shard (gguf-split.cpp)
            for k, v in gm.kv.items():
                if k == Keys.General.ARCHITECTURE or k.startswith("split."):
                    continue
                w.add_kv(k, v)
        w.add_kv(Keys.Split.NO, np.uint16(i))
        w.add_kv(Keys.Split.COUNT, np.uint16(n))
        w.add_kv(Keys.Split.TENSORS_COUNT, len(names))
        for name in shard:
            info = gm.tensors[name]
            w.add_tensor(name, np.asarray(info.data), ggml_type=info.ggml_type,
                         ne_shape=info.shape)
        w.write()
        paths.append(path)
    gm.close()
    return paths


def merge(src_first_shard: str, dst: str) -> None:
    gm = GGUFModel.load(src_first_shard)  # reader follows -of- siblings
    arch = str(gm.kv.get(Keys.General.ARCHITECTURE, "llama"))
    w = GGUFWriter(dst, arch)
    for k, v in gm.kv.items():
        if k == Keys.General.ARCHITECTURE or k.startswith("split."):
            continue
        w.add_kv(k, v)
    for name, info in gm.tensors.items():
        w.add_tensor(name, np.asarray(info.data), ggml_type=info.ggml_type,
                     ne_shape=info.shape)
    w.write()
    gm.close()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--split", action="store_true")
    g.add_argument("--merge", action="store_true")
    ap.add_argument("--split-max-tensors", type=int, default=128)
    ap.add_argument("src")
    ap.add_argument("dst")
    args = ap.parse_args(argv)
    if args.split:
        paths = split(args.src, args.dst, max_tensors=args.split_max_tensors)
        print("\n".join(paths))
    else:
        merge(args.src, args.dst)
        print(args.dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
