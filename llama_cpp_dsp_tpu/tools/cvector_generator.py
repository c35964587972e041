"""Control-vector generator (reference examples/cvector-generator):
run positive/negative prompt pairs through the model, collect per-layer
residual-stream states (the l_out tap), and extract a steering direction
per layer via mean-difference or PCA of the paired differences. Output is
the reference's control-vector GGUF: tensors "direction.<layer>" (1-based).

Usage: python -m llama_cpp_dsp_tpu.tools.cvector_generator -m model.gguf
           [--positive-file positive.txt] [--negative-file negative.txt]
           [-o control_vector.gguf] [--method pca|mean]
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np

log = logging.getLogger(__name__)


def collect_layer_states(model, prompts: list[str]) -> list[np.ndarray]:
    """Per prompt, the residual state after every layer at the LAST token:
    returns a list over layers of [n_prompts, n_embd]."""
    import jax.numpy as jnp

    from ..models.llama import forward

    cfg = model.cfg
    params = model.params
    outs: list[list[np.ndarray]] = [[] for _ in range(cfg.n_layers)]
    for text in prompts:
        ids = model.tokenizer.encode(text)
        toks = np.asarray(ids, np.int32)[None, :]
        pos = np.arange(len(ids), dtype=np.int32)[None, :]
        grabbed: dict[int, np.ndarray] = {}

        def tap(name, act, _g=grabbed):
            if name.startswith("l_out-"):
                _g[int(name.split("-")[1])] = np.asarray(act)[0, -1]

        mask = np.tril(np.ones((1, len(ids), len(ids)), bool))
        forward(params, cfg, jnp.asarray(toks), jnp.asarray(pos), mask=mask,
                compute_dtype=jnp.float32, tap=tap)
        for il in range(cfg.n_layers):
            outs[il].append(grabbed[il])
    return [np.stack(v) for v in outs]


def directions_from_pairs(pos_states, neg_states, method: str = "pca"):
    """Per layer: direction from paired (positive − negative) differences."""
    dirs = []
    for p, n in zip(pos_states, neg_states):
        diff = p - n  # [n_pairs, C]
        mean = diff.mean(axis=0)
        if method == "mean" or diff.shape[0] < 2:
            v = mean
        else:
            # top principal component of the centered diffs, sign-aligned
            # with the mean difference (reference power-iteration PCA)
            c = diff - diff.mean(axis=0, keepdims=True)
            cov = c.T @ c
            v = np.ones(cov.shape[0], np.float32)
            for _ in range(64):
                v = cov @ v
                v /= np.linalg.norm(v) + 1e-12
            if np.dot(v, mean) < 0:
                v = -v
            v = v * np.linalg.norm(mean)
        dirs.append(v.astype(np.float32))
    return dirs


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--positive-file", default="positive.txt")
    ap.add_argument("--negative-file", default="negative.txt")
    ap.add_argument("-o", "--outfile", default="control_vector.gguf")
    ap.add_argument("--method", default="pca", choices=("pca", "mean"))
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    from ..gguf.writer import GGUFWriter
    from ..runtime.loader import load_model
    from ..utils.jax_setup import setup_jax

    setup_jax()
    model = load_model(args.model)
    pos = [ln for ln in open(args.positive_file).read().splitlines() if ln]
    neg = [ln for ln in open(args.negative_file).read().splitlines() if ln]
    if len(pos) != len(neg):
        ap.error("positive/negative files must pair up line by line")

    pos_states = collect_layer_states(model, pos)
    neg_states = collect_layer_states(model, neg)
    dirs = directions_from_pairs(pos_states, neg_states, args.method)

    w = GGUFWriter(args.outfile, "controlvector")
    w.add_string("general.type", "controlvector")
    w.add_uint32("controlvector.layer_count", len(dirs))
    for il, v in enumerate(dirs):
        # reference cvector files are 1-based ("direction.1" = after layer 1)
        w.add_tensor(f"direction.{il + 1}", v)
    w.write()
    log.info("wrote %d directions to %s", len(dirs), args.outfile)
    return 0


if __name__ == "__main__":
    sys.exit(main())
