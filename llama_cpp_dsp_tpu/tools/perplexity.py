"""Perplexity over a text corpus — capability mirror of
examples/perplexity/perplexity.cpp (:441 sliding-window loop).

Tokenizes the whole corpus, splits into n_ctx-sized windows, evaluates each
window in n_batch chunks, accumulates NLL over the second half of each
window (like the reference, the first half is context burn-in), prints
running PPL per chunk and the final PPL ± stderr.

Usage: python -m llama_cpp_dsp_tpu.tools.perplexity -m model.gguf -f wiki.test.raw
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np


def softmax_logprob(logits: np.ndarray, token: int) -> float:
    m = logits.max()
    lse = m + math.log(np.exp(logits - m).sum())
    return float(logits[token] - lse)


def compute_perplexity(model, text_tokens: list[int], *, n_ctx: int = 512,
                       n_batch: int = 512, compute_dtype=None, progress=True):
    import jax.numpy as jnp

    from ..models.llama import forward
    from ..runtime.kv_cache import KVCache, causal_mask

    compute_dtype = compute_dtype or jnp.bfloat16
    cfg = model.cfg
    n_chunks = len(text_tokens) // n_ctx
    if n_chunks == 0:
        raise ValueError(f"corpus too small: {len(text_tokens)} tokens < n_ctx {n_ctx}")

    import jax

    params = jax.tree.map(jnp.asarray, model.params)

    @jax.jit
    def eval_window(params, toks, positions):
        mask = causal_mask(positions, toks.shape[1], 0)
        logits, _ = forward(params, cfg, toks, positions, None, 0, mask,
                            compute_dtype=compute_dtype)
        return jax.nn.log_softmax(logits, axis=-1)

    nll = 0.0
    nll2 = 0.0
    count = 0
    first = n_ctx // 2  # reference: first half is burn-in (perplexity.cpp:560)
    bos = model.vocab.bos_id if model.vocab.add_bos else None
    for chunk in range(n_chunks):
        window = list(text_tokens[chunk * n_ctx : (chunk + 1) * n_ctx])
        toks = list(window)
        if bos is not None:
            toks[0] = bos  # reference replaces the first token with BOS (:560)
        arr = jnp.asarray(np.asarray(toks, np.int32)[None])
        pos = jnp.arange(n_ctx, dtype=jnp.int32)[None]
        logprobs = np.asarray(eval_window(params, arr, pos))[0]  # [T, V]
        for i in range(first, n_ctx - 1):
            lp = float(logprobs[i, window[i + 1]])
            nll += -lp
            nll2 += lp * lp
            count += 1
        if progress:
            print(f"[{chunk + 1}] {math.exp(nll / count):.4f}", file=sys.stderr, flush=True)
    ppl = math.exp(nll / count)
    mean = nll / count
    var = nll2 / count - mean * mean
    stderr = math.sqrt(var / count) * ppl
    return ppl, stderr, count


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="llama-perplexity", description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True)
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=0)
    ap.add_argument("--compute-dtype", default="bfloat16", choices=["bfloat16", "float32"])
    args = ap.parse_args(argv)

    from ..utils.jax_setup import setup_jax

    setup_jax()
    import jax.numpy as jnp

    from ..runtime.loader import load_model

    model = load_model(args.model)
    text = open(args.file, encoding="utf-8").read()
    ids = model.tokenizer.encode(text, add_special=False)
    if args.max_chunks:
        ids = ids[: args.max_chunks * args.ctx_size]
    print(f"tokenized {len(ids)} tokens; {len(ids)//args.ctx_size} chunks", file=sys.stderr)
    ppl, err, n = compute_perplexity(
        model, ids, n_ctx=args.ctx_size,
        compute_dtype=jnp.float32 if args.compute_dtype == "float32" else jnp.bfloat16,
    )
    print(f"Final estimate: PPL = {ppl:.4f} +/- {err:.5f} over {n} tokens")
    return 0


if __name__ == "__main__":
    sys.exit(main())
