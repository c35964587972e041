"""Embedding retrieval over text files (reference examples/retrieval):
chunk the corpus on a separator, embed every chunk with the model, then
rank chunks by cosine similarity against interactive queries.

Usage: python -m llama_cpp_dsp_tpu.tools.retrieval -m embd-model.gguf
           --context-file a.txt [--context-file b.txt]
           [--chunk-size 64] [--chunk-separator "\\n"] [--top-k 3]
           [--query "..."]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def chunk_file(text: str, chunk_size: int, separator: str) -> list[str]:
    """Greedy chunking: append separator-delimited pieces until the chunk
    reaches chunk_size characters (reference retrieval.cpp chunking)."""
    chunks, cur = [], ""
    for part in text.split(separator):
        cur = cur + part + separator if cur else part + separator
        if len(cur) >= chunk_size:
            chunks.append(cur.strip())
            cur = ""
    if cur.strip():
        chunks.append(cur.strip())
    return chunks


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--context-file", action="append", required=True)
    ap.add_argument("--chunk-size", type=int, default=64)
    ap.add_argument("--chunk-separator", default="\n")
    ap.add_argument("--top-k", type=int, default=3)
    ap.add_argument("--query", default=None,
                    help="one-shot query (default: interactive loop)")
    ap.add_argument("--pooling", default="mean", choices=("mean", "last", "cls"))
    args = ap.parse_args(argv)

    from ..runtime.engine import Engine
    from ..runtime.loader import load_model
    from ..utils.jax_setup import setup_jax

    setup_jax()
    model = load_model(args.model)
    engine = Engine(model, n_slots=1, n_ctx_per_slot=512)

    chunks: list[tuple[str, str]] = []  # (filename, text)
    for path in args.context_file:
        for c in chunk_file(open(path).read(), args.chunk_size,
                            args.chunk_separator):
            chunks.append((path, c))
    print(f"embedding {len(chunks)} chunks...", file=sys.stderr)

    def embed(text: str) -> np.ndarray:
        ids = model.tokenizer.encode(text)
        v = engine.embed(ids, pooling=args.pooling)
        return v / (np.linalg.norm(v) + 1e-12)

    mat = np.stack([embed(c) for _, c in chunks])  # [N, C]

    def answer(query: str) -> None:
        qv = embed(query)
        sims = mat @ qv
        order = np.argsort(-sims)[: args.top_k]
        for rank, i in enumerate(order):
            path, text = chunks[i]
            print(f"#{rank + 1} [{sims[i]:.4f}] ({path})\n{text}\n")

    if args.query is not None:
        answer(args.query)
        return 0
    try:
        while True:
            q = input("query> ").strip()
            if not q:
                break
            answer(q)
    except (EOFError, KeyboardInterrupt):
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
