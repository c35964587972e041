"""Standalone embedding CLI (reference examples/embedding/embedding.cpp):
embed one or more prompts (newline-separated) and print the vectors plus a
cosine-similarity matrix.

Usage: python -m llama_cpp_dsp_tpu.tools.embedding -m model.gguf
           -p "first prompt\nsecond prompt" [--pooling mean]
           [--embd-normalize 2] [--embd-output-format json|array|""]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def normalize(v: np.ndarray, norm: int) -> np.ndarray:
    """reference common_embd_normalize (common/common.cpp): -1 none,
    0 max-abs, 1 L1 (taxicab), 2 L2 (default), >2 p-norm."""
    if norm < 0:
        return v
    if norm == 0:
        d = np.max(np.abs(v))
    elif norm == 1:
        d = np.sum(np.abs(v))
    elif norm == 2:
        d = np.linalg.norm(v)
    else:
        d = np.sum(np.abs(v) ** norm) ** (1.0 / norm)
    return v / (d + 1e-12)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="Hello world",
                    help="prompts, newline-separated (reference --prompt)")
    ap.add_argument("--pooling", default=None,
                    choices=(None, "none", "mean", "last", "cls"),
                    help="default: the GGUF pooling_type, else mean")
    ap.add_argument("--embd-normalize", type=int, default=2)
    ap.add_argument("--embd-output-format", default="",
                    choices=("", "json", "json+", "array"))
    ap.add_argument("--embd-separator", default="\n")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    args = ap.parse_args(argv)

    from ..runtime.engine import Engine
    from ..runtime.loader import load_model
    from ..utils.jax_setup import setup_jax

    setup_jax()
    model = load_model(args.model)
    engine = Engine(model, n_slots=1, n_ctx_per_slot=args.ctx_size)

    prompts = [p for p in args.prompt.split(args.embd_separator) if p]
    vecs = []
    for p in prompts:
        ids = model.tokenizer.encode(p)
        v = engine.embed(ids, pooling=args.pooling)
        if v.ndim > 1:  # pooling none → per-token rows; match reference print
            v = v.reshape(v.shape[0], -1)
            vecs.append(np.stack([normalize(r, args.embd_normalize) for r in v]))
        else:
            vecs.append(normalize(v, args.embd_normalize))

    pooled = [v if v.ndim == 1 else v.mean(axis=0) for v in vecs]
    mat = np.stack(pooled)
    sims = mat @ mat.T

    if args.embd_output_format == "array":
        print("[")
        for v in pooled:
            print("  [" + ", ".join(f"{x:.6f}" for x in v) + "],")
        print("]")
    elif args.embd_output_format.startswith("json"):
        data = [{"index": i, "object": "embedding",
                 "embedding": [float(x) for x in v]}
                for i, v in enumerate(pooled)]
        out = {"object": "list", "data": data, "model": args.model}
        if args.embd_output_format == "json+":
            out["cosine_similarity"] = [[float(x) for x in row] for row in sims]
        print(json.dumps(out, indent=2))
    else:
        for i, (p, v) in enumerate(zip(prompts, pooled)):
            head = " ".join(f"{x: .6f}" for x in v[:8])
            print(f"embedding {i} ({len(v)} dims): {head} ...")
        if len(prompts) > 1:
            print("\ncosine similarity matrix:", file=sys.stderr)
            for row in sims:
                print(" ".join(f"{x:6.2f}" for x in row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
