"""Per-tensor activation dump — reference examples/eval-callback.

Runs one forward pass with the graph tap installed (the same hook imatrix
uses — reference cb_eval / ggml-backend sched eval-callback) and prints
each tapped tensor's name, shape, and summary statistics.

Usage: python -m llama_cpp_dsp_tpu.tools.eval_callback -m model.gguf -p "hi"
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="hello")
    ap.add_argument("--full", action="store_true", help="print full tensors")
    args = ap.parse_args(argv)

    from ..utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models.llama import forward
    from ..runtime.loader import load_model
    from ..runtime.kv_cache import causal_mask

    model = load_model(args.model)
    ids = model.tokenizer.encode(args.prompt, add_special=True)
    toks = jnp.asarray(np.asarray(ids, np.int32)[None])
    pos = jnp.arange(len(ids), dtype=jnp.int32)[None]
    mask = causal_mask(pos, len(ids), 0)

    taps: list[tuple[str, object]] = []

    def tap(name, act):
        taps.append((name, act))

    params = jax.tree.map(jnp.asarray, model.params)
    logits, _ = forward(params, model.cfg, toks, pos, None, 0, mask,
                        compute_dtype=jnp.float32, tap=tap)
    for name, act in taps:
        a = np.asarray(act)
        print(f"{name:40s} {str(a.shape):18s} "
              f"mean={a.mean():+.4f} std={a.std():.4f} "
              f"min={a.min():+.4f} max={a.max():+.4f}")
        if args.full:
            print(a)
    a = np.asarray(logits)
    print(f"{'logits':40s} {str(a.shape):18s} "
          f"mean={a.mean():+.4f} std={a.std():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
