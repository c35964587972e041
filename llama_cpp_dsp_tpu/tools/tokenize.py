"""Tokenize text with a GGUF model's tokenizer (reference examples/tokenize).

Usage: python -m llama_cpp_dsp_tpu.tools.tokenize -m model.gguf -p "text"
           [--ids] [--no-bos] [--show-count]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt")
    ap.add_argument("-f", "--file", help="read text from a file")
    ap.add_argument("--ids", action="store_true", help="print bare ids only")
    ap.add_argument("--no-bos", action="store_true")
    ap.add_argument("--no-parse-special", action="store_true")
    ap.add_argument("--show-count", action="store_true")
    args = ap.parse_args(argv)

    from ..gguf.reader import GGUFModel
    from ..tokenizer import Tokenizer, Vocab

    gm = GGUFModel.load(args.model, metadata_only=True) \
        if hasattr(GGUFModel, "load_metadata") else GGUFModel.load(args.model)
    vocab = Vocab.from_gguf_kv(gm.kv)
    tok = Tokenizer(vocab)
    text = args.prompt if args.prompt is not None else open(args.file).read()
    ids = tok.encode(text, add_special=not args.no_bos,
                     parse_special=not args.no_parse_special)
    if args.ids:
        print(ids)
    else:
        for tid in ids:
            piece = tok.decode([tid])
            print(f"{tid:>8} -> {piece!r}")
    if args.show_count:
        print(f"Total number of tokens: {len(ids)}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
