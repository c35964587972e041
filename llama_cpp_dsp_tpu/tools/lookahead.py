"""Lookup / lookahead decoding demos (reference examples/lookup/lookup.cpp
and examples/lookahead/lookahead.cpp): model-free speculation that is
byte-identical to plain greedy decode, with acceptance statistics.

Usage:
  python -m llama_cpp_dsp_tpu.tools.lookahead -m model.gguf -p "..." \
      [--algo 2d|jacobi|lookup] [-W 15] [-N 5] [-G 15] [--draft 8] \
      [--lookup-cache-static ngrams.jsonl] [--lookup-cache-dynamic out.jsonl]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--algo", choices=("2d", "jacobi", "lookup"),
                    default="2d",
                    help="2d = reference lookahead W×N window (default); "
                         "jacobi = flattened sequential rounds; "
                         "lookup = n-gram cache drafts (examples/lookup)")
    ap.add_argument("-W", "--window", type=int, default=15,
                    help="lookahead window width (lookahead.cpp W)")
    ap.add_argument("-N", "--ngram", type=int, default=5,
                    help="lookahead ngram size (lookahead.cpp N)")
    ap.add_argument("-G", "--max-verify", type=int, default=15,
                    help="max verification ngrams (lookahead.cpp G)")
    ap.add_argument("--draft", type=int, default=8,
                    help="draft length for jacobi/lookup modes")
    ap.add_argument("--lookup-cache-static", default=None,
                    help="pre-built n-gram cache to merge (lookup mode)")
    ap.add_argument("--lookup-cache-dynamic", default=None,
                    help="save the run's n-gram cache here (lookup mode)")
    args = ap.parse_args(argv)

    from ..runtime.context import LlamaContext
    from ..runtime.loader import load_model
    from ..runtime.lookup import (
        Lookahead2D, LookaheadDecoder, LookupDecoder, NgramCache,
    )
    from ..runtime.sampling import make_chain
    from ..utils.jax_setup import setup_jax

    setup_jax()
    model = load_model(args.model)
    ctx = LlamaContext(model, n_ctx=args.ctx_size)
    ids = model.tokenizer.encode(args.prompt) if args.prompt else [
        model.vocab.bos_id if model.vocab is not None else 1]
    sampler = make_chain(temp=args.temp, seed=args.seed)

    if args.algo == "2d":
        dec = Lookahead2D(ctx, w=args.window, n=args.ngram,
                          g=args.max_verify)
    elif args.algo == "jacobi":
        dec = LookaheadDecoder(ctx, n_draft=args.draft)
    else:
        static = (NgramCache.load(args.lookup_cache_static)
                  if args.lookup_cache_static else None)
        dec = LookupDecoder(ctx, n_draft=args.draft, static_cache=static)

    t0 = time.perf_counter()
    n = 0
    for tok in dec.generate(ids, max_new_tokens=args.n_predict,
                            sampler=sampler):
        sys.stdout.write(model.tokenizer.decode([tok]))
        sys.stdout.flush()
        n += 1
    dt = time.perf_counter() - t0
    print(file=sys.stderr)
    st = dec.stats
    print(f"decoded {n} tokens in {dt:.3f}s ({n / max(dt, 1e-9):.2f} t/s) | "
          f"drafted {st.n_drafted} accepted {st.n_accepted} "
          f"({100.0 * st.acceptance_rate:.1f}%)", file=sys.stderr)
    if args.algo == "lookup" and args.lookup_cache_dynamic:
        dec.cache.save(args.lookup_cache_dynamic)
    return 0


if __name__ == "__main__":
    sys.exit(main())
