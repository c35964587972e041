"""Legacy GGML/GGMF/GGJT → GGUF converter (role of the reference
convert_llama_ggml_to_gguf.py:1-450): pre-GGUF llama.cpp archives
(magic 'lmgg'/'fmgg'/'tjgg') re-emitted as GGUF with the modern tensor
names, packed quant bytes passed through untouched.

Format (reference Tensor.load / Hyperparameters.load / Vocab.load):
  header   magic[4] (+ version u32 for GGMF/GGJT)
  hparams  7×u32: n_vocab n_embd n_mult n_head n_layer n_rot ftype
  vocab    n_vocab × { len u32, bytes[len], score f32 (not in GGML) }
  tensors  { n_dims u32, name_len u32, dtype u32, dims[n_dims] u32,
             name[name_len], pad→32B (GGJT only), data }

Quantization formats changed in GGJTv2 and again v3, so only GGJTv3
quantized files (or any-version unquantized) are convertible — the same
eligibility rule as the reference (validate_conversion).
"""

from __future__ import annotations

import argparse
import logging
import struct
import sys

import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, GGMLType
from ..gguf.writer import GGUFWriter

log = logging.getLogger(__name__)

_MAGIC = {b"lmgg": "GGML", b"fmgg": "GGMF", b"tjgg": "GGJT"}

# legacy pth-style tensor names → GGUF names (gguf-py tensor_mapping for
# MODEL_ARCH.LLAMA, the only arch these archives ever held)
_GLOBAL = {
    "tok_embeddings": "token_embd",
    "norm": "output_norm",
    "output": "output",
}
_LAYER = {
    "attention.wq": "attn_q",
    "attention.wk": "attn_k",
    "attention.wv": "attn_v",
    "attention.wo": "attn_output",
    "attention_norm": "attn_norm",
    "feed_forward.w1": "ffn_gate",
    "feed_forward.w2": "ffn_down",
    "feed_forward.w3": "ffn_up",
    "ffn_norm": "ffn_norm",
}


class LegacyModel:
    def __init__(self):
        self.file_format = "GGML"
        self.version = 1
        self.tensors = []  # (name, dtype, dims_ne, raw_bytes)
        self.vocab = []  # (bytes, score)

    def load(self, data: bytes) -> "LegacyModel":
        off = 0
        magic = data[:4]
        if magic == b"GGUF":
            raise ValueError("already a GGUF file")
        fmt = _MAGIC.get(magic)
        if fmt is None:
            raise ValueError(f"unexpected magic {magic!r} — not a legacy "
                             "GGML/GGMF/GGJT file")
        self.file_format = fmt
        off = 4
        if fmt != "GGML":
            (self.version,) = struct.unpack_from("<I", data, off)
            off += 4
            ok = {"GGMF": (1,), "GGJT": (1, 2, 3)}[fmt]
            if self.version not in ok:
                raise ValueError(f"cannot handle {fmt} version {self.version}")
        (n_vocab, n_embd, n_mult, n_head, n_layer, n_rot, ftype) = \
            struct.unpack_from("<7I", data, off)
        off += 28
        self.hp = dict(n_vocab=n_vocab, n_embd=n_embd, n_mult=n_mult,
                       n_head=n_head, n_layer=n_layer, n_rot=n_rot,
                       ftype=ftype)
        log.info("%sv%d ftype=%d n_vocab=%d n_embd=%d n_layer=%d",
                 fmt, self.version, ftype, n_vocab, n_embd, n_layer)
        # eligibility (reference validate_conversion): quant block layouts
        # changed at GGJTv2 and v3
        if fmt != "GGJT" or self.version < 2:
            if ftype not in (0, 1):  # ALL_F32 / MOSTLY_F16
                raise ValueError(
                    "quantizations changed in GGJTv2 — only unquantized "
                    f"files older than GGJTv2 convert (ftype={ftype})")
        elif self.version == 2 and ftype in (2, 3, 7, 8, 9):
            raise ValueError("Q4/Q8 layouts changed in GGJTv3 — this "
                             f"GGJTv2 file of ftype {ftype} cannot convert")
        for _ in range(n_vocab):
            (ln,) = struct.unpack_from("<I", data, off)
            off += 4
            tok = bytes(data[off:off + ln])
            off += ln
            score = 0.0
            if fmt != "GGML":
                (score,) = struct.unpack_from("<f", data, off)
                off += 4
            self.vocab.append((tok, score))
        while off < len(data):
            n_dims, name_len, dtype = struct.unpack_from("<3I", data, off)
            off += 12
            dims = struct.unpack_from(f"<{n_dims}I", data, off)
            off += 4 * n_dims
            name = bytes(data[off:off + name_len]).decode("utf-8")
            off += name_len
            if fmt == "GGJT":
                off = (off + 31) & ~31
            kind = GGMLType(dtype)
            tr = GGML_TYPE_TRAITS[kind]
            n_elems = int(np.prod(dims))
            nbytes = n_elems // tr.block_size * tr.type_size
            self.tensors.append((name, kind, dims, data[off:off + nbytes]))
            off += nbytes
        return self


def _map_name(name: str) -> str | None:
    for suffix in (".weight", ".bias"):
        if not name.endswith(suffix):
            continue
        base = name[: -len(suffix)]
        if base in _GLOBAL:
            return _GLOBAL[base] + suffix
        if base.startswith("layers."):
            _, idx, rest = base.split(".", 2)
            mapped = _LAYER.get(rest)
            if mapped is not None:
                return f"blk.{idx}.{mapped}{suffix}"
    return None


def convert(in_path: str, out_path: str, *, context_length: int = 2048,
            eps: float = 5e-6, gqa: int = 1, name: str | None = None) -> None:
    data = open(in_path, "rb").read()
    model = LegacyModel().load(data)
    hp = model.hp
    n_head = hp["n_head"]
    if gqa == 1:
        n_kv = n_head
    else:
        n_kv = next((x for x in range(1, 256) if n_head / x == float(gqa)),
                    None)
        if n_kv is None:
            raise ValueError(f"cannot derive n_kv_head from GQA {gqa}")
    # n_ff from the actual w1 tensor (reference Hyperparameters.set_n_ff)
    n_ff = next((dims[1] for nm, _, dims, _ in model.tensors
                 if nm == "layers.0.feed_forward.w1.weight"), 4 * hp["n_embd"])

    w = GGUFWriter(out_path, "llama")
    w.add_string("general.name", name or in_path)
    w.add_string("general.description",
                 f"converted from legacy {model.file_format}v{model.version}")
    w.add_uint32("general.file_type", hp["ftype"])
    w.add_uint32("llama.context_length", context_length)
    w.add_uint32("llama.embedding_length", hp["n_embd"])
    w.add_uint32("llama.block_count", hp["n_layer"])
    w.add_uint32("llama.feed_forward_length", int(n_ff))
    w.add_uint32("llama.rope.dimension_count", hp["n_embd"] // n_head)
    w.add_uint32("llama.attention.head_count", n_head)
    w.add_uint32("llama.attention.head_count_kv", n_kv)
    w.add_float32("llama.attention.layer_norm_rms_epsilon", float(eps))

    # vocab → modern SPM convention (reference add_vocab byte/special rules)
    tokens, scores, toktypes = [], [], []
    for tid, (tok, score) in enumerate(model.vocab):
        tt = 1
        if tid == 0:
            tok, tt = b"<unk>", 2
        elif tid == 1:
            tok, tt = b"<s>", 3
        elif tid == 2:
            tok, tt = b"</s>", 3
        elif not tok:
            tt = 3
        elif 3 <= tid <= 258 and len(tok) == 1:
            tok, tt = f"<0x{tok[0]:02X}>".encode(), 6
        else:
            tok = tok.replace(b" ", b"\xe2\x96\x81")
        tokens.append(tok.decode("utf-8", errors="replace"))
        scores.append(float(score))
        toktypes.append(tt)
    w.add_string("tokenizer.ggml.model", "llama")
    w.add_string("tokenizer.ggml.pre", "default")
    w.add_kv("tokenizer.ggml.tokens", tokens)
    w.add_kv("tokenizer.ggml.scores", [float(s) for s in scores])
    w.add_kv("tokenizer.ggml.token_type", np.asarray(toktypes, np.int32))
    w.add_uint32("tokenizer.ggml.unknown_token_id", 0)
    w.add_uint32("tokenizer.ggml.bos_token_id", 1)
    w.add_uint32("tokenizer.ggml.eos_token_id", 2)

    n_written = 0
    for nm, kind, dims, raw in model.tensors:
        mapped = _map_name(nm)
        if mapped is None:
            log.warning("skipping unmapped legacy tensor %s", nm)
            continue
        # legacy dims are GGUF ne order already (ne[0] = row length)
        w.add_tensor(mapped, np.frombuffer(raw, np.uint8),
                     ggml_type=kind, ne_shape=tuple(int(d) for d in dims))
        n_written += 1
    w.write()
    log.info("wrote %d tensors to %s", n_written, out_path)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input")
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--context-length", "-c", type=int, default=2048)
    ap.add_argument("--eps", type=float, default=5e-6)
    ap.add_argument("--gqa", type=int, default=1)
    ap.add_argument("--name", default=None)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    convert(args.input, args.outfile, context_length=args.context_length,
            eps=args.eps, gqa=args.gqa, name=args.name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
