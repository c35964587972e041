"""Copy a GGUF file with edited metadata.

Capability parity with the reference's gguf-py script
(gguf-py/gguf/scripts/gguf_new_metadata.py): rewrite general.name /
general.description / chat template / pre-tokenizer, remove keys, and set
special-token ids by token text or id. Tensor data is passed through
byte-identical; KV value types (incl. array element widths) are preserved
via the reader's kv_types table.
"""

from __future__ import annotations

import argparse
import json
import sys

from ..gguf.constants import GGUFValueType, Keys
from ..gguf.reader import read_gguf
from ..gguf.writer import GGUFWriter

# CLI token name -> GGUF key (mirrors the reference script's token_names map)
TOKEN_NAMES = {
    "bos": Keys.Tokenizer.BOS_ID,
    "eos": Keys.Tokenizer.EOS_ID,
    "eot": Keys.Tokenizer.EOT_ID,
    "eom": Keys.Tokenizer.EOM_ID,
    "unk": Keys.Tokenizer.UNK_ID,
    "sep": Keys.Tokenizer.SEP_ID,
    "pad": Keys.Tokenizer.PAD_ID,
    "prefix": "tokenizer.ggml.prefix_token_id",
    "suffix": "tokenizer.ggml.suffix_token_id",
    "middle": "tokenizer.ggml.middle_token_id",
}


def _chat_template_from_config(path: str) -> str | None:
    with open(path, encoding="utf-8") as f:
        config = json.load(f)
    return config.get("chat_template")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="Copy a GGUF file with new metadata")
    ap.add_argument("input", help="input GGUF file")
    ap.add_argument("output", help="output GGUF file")
    ap.add_argument("--general-name", metavar='"name"')
    ap.add_argument("--general-description", metavar='"description"')
    ap.add_argument("--chat-template", metavar='"{% ... %}"')
    ap.add_argument("--chat-template-config", metavar="tokenizer_config.json")
    ap.add_argument("--pre-tokenizer", metavar='"pre tokenizer"')
    ap.add_argument("--remove-metadata", action="append", default=[],
                    metavar="key", help="remove a metadata key")
    ap.add_argument("--special-token", action="append", default=[], nargs=2,
                    metavar=("|".join(TOKEN_NAMES), '"<token>"'),
                    help="set a special token by its text")
    ap.add_argument("--special-token-by-id", action="append", default=[],
                    nargs=2, metavar=("|".join(TOKEN_NAMES), "id"),
                    help="set a special token by id")
    ap.add_argument("--force", action="store_true",
                    help="overwrite keys without warnings")
    args = ap.parse_args(argv)

    new_kv: dict[str, object] = {}
    if args.general_name is not None:
        new_kv[Keys.General.NAME] = args.general_name
    if args.general_description is not None:
        new_kv["general.description"] = args.general_description
    if args.chat_template is not None:
        new_kv[Keys.Tokenizer.CHAT_TEMPLATE] = args.chat_template
    if args.chat_template_config is not None:
        tmpl = _chat_template_from_config(args.chat_template_config)
        if tmpl:
            new_kv[Keys.Tokenizer.CHAT_TEMPLATE] = tmpl
    if args.pre_tokenizer is not None:
        new_kv[Keys.Tokenizer.PRE] = args.pre_tokenizer

    remove = set(args.remove_metadata)

    gf = read_gguf(args.input, load_data=True)
    try:
        tokens = list(gf.kv.get(Keys.Tokenizer.LIST, []))
        for name, text in args.special_token:
            if name not in TOKEN_NAMES:
                ap.error(f"unknown special token name {name!r}")
            try:
                tid = tokens.index(text)
            except ValueError:
                print(f"warning: token {text!r} not in vocab, skipping",
                      file=sys.stderr)
                continue
            new_kv[TOKEN_NAMES[name]] = (tid, GGUFValueType.UINT32)
        for name, tid_s in args.special_token_by_id:
            if name not in TOKEN_NAMES:
                ap.error(f"unknown special token name {name!r}")
            tid = int(tid_s)
            if not 0 <= tid < max(len(tokens), tid + 1):
                continue
            new_kv[TOKEN_NAMES[name]] = (tid, GGUFValueType.UINT32)

        if not new_kv and not remove:
            print("warning: no metadata changes requested; copying as-is",
                  file=sys.stderr)

        w = GGUFWriter(args.output, None, alignment=gf.alignment)
        seen: set[str] = set()
        for key, val in gf.kv.items():
            if key in remove:
                print(f"removing {key}", file=sys.stderr)
                continue
            vtype, etype = gf.kv_types[key]
            if key in new_kv:
                nv = new_kv[key]
                if isinstance(nv, tuple):
                    nv, vtype = nv
                    etype = None
                if not args.force:
                    print(f"overriding {key}", file=sys.stderr)
                val = nv
            seen.add(key)
            w.add_kv(key, val, vtype, etype)
        for key, nv in new_kv.items():
            if key in seen:
                continue
            if isinstance(nv, tuple):
                nv, vtype = nv
                w.add_kv(key, nv, vtype)
            else:
                w.add_kv(key, nv)
        for t in gf.tensors.values():
            w.add_tensor(t.name, t.data, ggml_type=t.ggml_type, ne_shape=t.shape)
        w.write()
    finally:
        gf.close()
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
