"""Fill-in-middle CLI (reference examples/infill/infill.cpp): builds the
FIM token sequence <PRE> prefix <SUF> suffix <MID> from the model's own
special tokens and generates the middle span.

Usage: python -m llama_cpp_dsp_tpu.tools.infill -m codemodel.gguf
           --in-prefix "def add(a, b):\n    " --in-suffix "\n    return c\n"
"""

from __future__ import annotations

import argparse
import sys


def build_fim_tokens(vocab, tokenizer, prefix: str, suffix: str,
                     spm: bool = False) -> list[int]:
    """<PRE>+prefix+<SUF>+suffix+<MID>; spm=True swaps prefix/suffix order
    (reference --spm-infill for SPM-trained FIM models)."""
    pre_id, suf_id, mid_id = vocab.fim_pre_id, vocab.fim_suf_id, vocab.fim_mid_id
    if min(pre_id, suf_id, mid_id) < 0:
        raise ValueError("model lacks FIM special tokens "
                         "(fim_pre/fim_suf/fim_mid)")
    pre = tokenizer.encode(prefix, add_special=False)
    suf = tokenizer.encode(suffix, add_special=False)
    if spm:
        ids = [suf_id] + suf + [pre_id] + pre + [mid_id]
    else:
        ids = [pre_id] + pre + [suf_id] + suf + [mid_id]
    if vocab.bos_id >= 0 and getattr(vocab, "add_bos", False):
        ids = [vocab.bos_id] + ids
    return ids


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--in-prefix", default="", help="code before the hole")
    ap.add_argument("--in-suffix", default="", help="code after the hole")
    ap.add_argument("--spm-infill", action="store_true",
                    help="suffix-prefix-middle token order (reference flag)")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--temp", type=float, default=0.0)
    ap.add_argument("-s", "--seed", type=int, default=0)
    ap.add_argument("-i", "--interactive", action="store_true",
                    help="prompt for new prefix/suffix pairs in a loop")
    ap.add_argument("--infill-sampler", action="store_true",
                    help="add the FIM infill sampler to the chain (EOG "
                         "suppression + common-prefix token merging; "
                         "reference COMMON_SAMPLER_TYPE_INFILL)")
    args = ap.parse_args(argv)

    from ..runtime.context import LlamaContext
    from ..runtime.loader import load_model
    from ..runtime.sampling import make_chain
    from ..utils.jax_setup import setup_jax

    setup_jax()
    model = load_model(args.model)
    ctx = LlamaContext(model, n_ctx=args.ctx_size)
    vocab, tok = model.vocab, model.tokenizer
    eot = getattr(vocab, "eot_id", -1)

    def run(prefix: str, suffix: str) -> None:
        try:
            ids = build_fim_tokens(vocab, tok, prefix, suffix,
                                   spm=args.spm_infill)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            raise SystemExit(1)
        ctx.reset()
        sampler = make_chain(temp=args.temp, seed=args.seed,
                             infill_tokenizer=tok if args.infill_sampler
                             else None)
        sys.stdout.write(prefix)
        sys.stdout.flush()
        for t in ctx.generate(ids, max_new_tokens=args.n_predict,
                              sampler=sampler):
            if t == eot:
                break
            sys.stdout.write(tok.token_to_piece(t, special=False)
                             .decode("utf-8", errors="replace"))
            sys.stdout.flush()
        sys.stdout.write(suffix + "\n")
        print(ctx.perf.report(), file=sys.stderr)

    if args.interactive:
        while True:
            try:
                prefix = input("prefix> ")
                suffix = input("suffix> ")
            except EOFError:
                break
            if not prefix and not suffix:
                break
            run(prefix, suffix)
    else:
        run(args.in_prefix, args.in_suffix)
    return 0


if __name__ == "__main__":
    sys.exit(main())
