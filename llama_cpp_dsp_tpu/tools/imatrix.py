"""imatrix — importance-matrix collector (capability mirror of reference
examples/imatrix/imatrix.cpp).

Collects per-input-channel second moments (Σ x²) of every matmul's
activations over calibration text via forward() taps (the XLA-side
equivalent of the reference's cb_eval hook), and reads/writes the upstream
binary imatrix format:

    int32 n_entries
    per entry: int32 name_len, name, int32 ncall, int32 nval, f32[nval]
    int32 last_call, int32 input_len, input_filename

Usage: python -m llama_cpp_dsp_tpu.tools.imatrix -m model.gguf -f calib.txt -o out.imatrix
"""

from __future__ import annotations

import argparse
import struct
import sys

import numpy as np


class IMatrixCollector:
    def __init__(self) -> None:
        self.sums: dict[str, np.ndarray] = {}
        self.ncall: dict[str, int] = {}

    def tap(self, name: str, x) -> None:
        arr = np.asarray(x, dtype=np.float32).reshape(-1, x.shape[-1])
        sq = (arr * arr).sum(axis=0)
        if name in self.sums:
            self.sums[name] += sq
        else:
            self.sums[name] = sq
        self.ncall[name] = self.ncall.get(name, 0) + 1

    def to_weights(self) -> dict[str, np.ndarray]:
        """name → per-channel importance (mean squared activation)."""
        return {
            name: (self.sums[name] / max(self.ncall[name], 1)).astype(np.float32)
            for name in self.sums
        }


def save_imatrix(path: str, collector: IMatrixCollector, input_name: str = "") -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<i", len(collector.sums)))
        for name, vals in collector.sums.items():
            nb = name.encode()
            f.write(struct.pack("<i", len(nb)))
            f.write(nb)
            f.write(struct.pack("<ii", collector.ncall[name], len(vals)))
            f.write(vals.astype("<f4").tobytes())
        f.write(struct.pack("<i", max(collector.ncall.values(), default=0)))
        ib = input_name.encode()
        f.write(struct.pack("<i", len(ib)))
        f.write(ib)


def load_imatrix(path: str) -> dict[str, np.ndarray]:
    """→ name → importance weights (sums/ncall), upstream semantics
    (reference src/llama-quant.cpp:39 load path in examples/quantize)."""
    out: dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        (n_entries,) = struct.unpack("<i", f.read(4))
        for _ in range(n_entries):
            (ln,) = struct.unpack("<i", f.read(4))
            name = f.read(ln).decode()
            ncall, nval = struct.unpack("<ii", f.read(8))
            vals = np.frombuffer(f.read(4 * nval), dtype="<f4").copy()
            if ncall > 0:
                vals /= ncall
            out[name] = vals
    return out


def collect(model, token_chunks, *, compute_dtype=None) -> IMatrixCollector:
    """Run forward over calibration chunks with taps enabled."""
    import jax.numpy as jnp

    from ..models.llama import forward
    from ..runtime.kv_cache import causal_mask

    compute_dtype = compute_dtype or jnp.float32
    coll = IMatrixCollector()
    for chunk in token_chunks:
        toks = jnp.asarray(np.asarray(chunk, dtype=np.int32)[None])
        pos = jnp.arange(toks.shape[1], dtype=jnp.int32)[None]
        mask = causal_mask(pos, toks.shape[1], 0)
        forward(
            model.params, model.cfg, toks, pos, None, 0, mask,
            compute_dtype=compute_dtype, tap=coll.tap,
        )
    return coll


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-imatrix", description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="calibration text")
    ap.add_argument("-o", "--output", default="imatrix.dat")
    ap.add_argument("--chunk-size", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=0)
    args = ap.parse_args(argv)

    from ..utils.jax_setup import setup_jax

    setup_jax()
    from ..runtime.loader import load_model

    model = load_model(args.model)
    text = open(args.file, encoding="utf-8").read()
    ids = model.tokenizer.encode(text, add_special=True)
    chunks = [
        ids[i : i + args.chunk_size]
        for i in range(0, len(ids) - args.chunk_size + 1, args.chunk_size)
    ]
    if args.max_chunks:
        chunks = chunks[: args.max_chunks]
    print(f"collecting over {len(chunks)} chunks of {args.chunk_size}", file=sys.stderr)
    coll = collect(model, chunks)
    save_imatrix(args.output, coll, args.file)
    print(f"saved {len(coll.sums)} entries to {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
