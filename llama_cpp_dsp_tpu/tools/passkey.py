"""Passkey retrieval test (reference examples/passkey): hide a number in
filler text, generate, and check the model retrieves it — validates
long-context mechanics (self-extend group attention / context shift).

Usage: python -m llama_cpp_dsp_tpu.tools.passkey -m model.gguf
           [--junk 250] [--pos 100] [-gan 8 -gaw 512]
"""

from __future__ import annotations

import argparse
import random
import sys


def build_prompt(n_junk: int, i_pos: int, passkey: int) -> str:
    """The reference's prompt construction (passkey.cpp:49-60)."""
    prefix = ("There is an important info hidden inside a lot of irrelevant "
              "text. Find it and memorize them. I will quiz you about the "
              "important information there.\n")
    junk = ("The grass is green. The sky is blue. The sun is yellow. Here "
            "we go. There and back again.\n")
    key = (f"The pass key is {passkey}. Remember it. "
           f"{passkey} is the pass key.\n")
    parts = [prefix]
    for i in range(n_junk):
        if i == i_pos:
            parts.append(key)
        parts.append(junk)
    parts.append("What is the pass key? The pass key is")
    return "".join(parts)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--junk", type=int, default=250)
    ap.add_argument("--pos", type=int, default=-1,
                    help="junk index to hide the key at (-1 = random)")
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-gan", "--grp-attn-n", type=int, default=1)
    ap.add_argument("-gaw", "--grp-attn-w", type=int, default=512)
    ap.add_argument("-n", "--n-predict", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ..runtime.context import LlamaContext
    from ..runtime.loader import load_model
    from ..runtime.sampling import make_chain
    from ..utils.jax_setup import setup_jax

    setup_jax()
    rng = random.Random(args.seed)
    passkey = rng.randint(1, 50000)
    i_pos = args.pos if args.pos >= 0 else rng.randint(0, args.junk)
    prompt = build_prompt(args.junk, i_pos, passkey)

    model = load_model(args.model)
    ctx = LlamaContext(model, n_ctx=args.ctx_size)
    ids = model.tokenizer.encode(prompt)
    print(f"passkey={passkey} at junk#{i_pos}; prompt {len(ids)} tokens, "
          f"n_ctx {args.ctx_size}, ga_n {args.grp_attn_n}", file=sys.stderr)
    out = []
    for tok in ctx.generate(ids, max_new_tokens=args.n_predict,
                            sampler=make_chain(temp=0.0),
                            ga_n=args.grp_attn_n, ga_w=args.grp_attn_w):
        out.append(tok)
    text = model.tokenizer.decode(out)
    print(text)
    ok = str(passkey) in text
    print(f"{'OK' if ok else 'FAIL'}: expected {passkey}", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
