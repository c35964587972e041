"""Full-parameter fine-tuning CLI (reference ggml-opt fit driver role,
ggml/src/ggml-opt.cpp:785-854): load a GGUF, train EVERY weight with AdamW
on next-token cross-entropy over a text file, write the fine-tuned model
back as GGUF (requantized to the source types by default).

For adapter-style (LoRA) training use tools/finetune.py instead.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="llama-train", description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="training text file")
    ap.add_argument("-o", "--out", required=True, help="output model GGUF")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=0.0)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--out-type", default=None,
                    help="override tensor type for all >=2-D weights "
                         "(f32/f16/bf16/q8_0/...; default: source types)")
    ap.add_argument("-s", "--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ..gguf.constants import GGMLType
    from ..runtime.loader import load_model
    from ..training.full import save_full, train_full
    from ..utils.jax_setup import setup_jax

    setup_jax()
    model = load_model(args.model)
    ids = model.tokenizer.encode(open(args.file, encoding="utf-8").read())
    sl = args.seq_len
    seqs = [ids[i: i + sl] for i in range(0, len(ids) - sl + 1, sl)]
    if not seqs:
        print(f"error: need at least {sl} tokens, got {len(ids)}",
              file=sys.stderr)
        return 1
    print(f"full-parameter training on {len(seqs)} x {sl}-token sequences "
          f"for {args.steps} steps", file=sys.stderr)
    trained, losses = train_full(model, seqs, steps=args.steps, lr=args.lr,
                                 wd=args.wd, seed=args.seed)
    print(f"loss: {losses[0]:.4f} -> {losses[-1]:.4f}", file=sys.stderr)
    out_type = GGMLType[args.out_type.upper()] if args.out_type else None
    n = save_full(args.out, args.model, model, trained, out_type=out_type)
    print(f"wrote {args.out} ({n} tensors updated)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
