"""Convert Karpathy llama2.c checkpoints to GGUF
(reference examples/convert-llama2c-to-ggml).

llama2.c model.bin layout (run.c Config + memory_map_weights order):
  int32[7] header: dim, hidden_dim, n_layers, n_heads, n_kv_heads,
                   vocab_size (NEGATIVE → separate classifier), seq_len
  f32 blobs, in order: token_embedding [V,C]; rms_att [L,C]; wq [L,C,C];
  wk [L,KV,C]; wv [L,KV,C]; wo [L,C,C]; rms_ffn [L,C]; w1/gate [L,FF,C];
  w2/down [L,C,FF]; w3/up [L,FF,C]; rms_final [C];
  legacy freq_cis_real+imag [seq*hd/2 each, skipped]; wcls [V,C] if separate.

Meta-style checkpoints are already rope-interleaved, which is the GGUF llama
q/k layout — no permutation needed (unlike HF imports, convert_hf._permute_qk).

tokenizer.bin: int32 max_token_length, then per token: f32 score,
int32 len, bytes.

Usage: python -m llama_cpp_dsp_tpu.tools.convert_llama2c
           --copy-vocab-from-model tokenizer.bin model.bin out.gguf
"""

from __future__ import annotations

import argparse
import struct
import sys

import numpy as np


def read_llama2c(path: str) -> tuple[dict, dict]:
    """→ (hparams, tensors) with GGUF-convention [out, in] row-major arrays."""
    with open(path, "rb") as f:
        dim, hidden, n_layers, n_heads, n_kv, vocab, seq_len = struct.unpack(
            "<7i", f.read(28))
        shared = vocab > 0
        vocab = abs(vocab)
        hd = dim // n_heads
        kv_dim = n_kv * hd

        def block(*shape):
            n = int(np.prod(shape))
            a = np.frombuffer(f.read(4 * n), dtype="<f4").reshape(shape)
            return np.ascontiguousarray(a)

        t = {"token_embd.weight": block(vocab, dim)}
        rms_att = block(n_layers, dim)
        wq = block(n_layers, dim, dim)
        wk = block(n_layers, kv_dim, dim)
        wv = block(n_layers, kv_dim, dim)
        wo = block(n_layers, dim, dim)
        rms_ffn = block(n_layers, dim)
        w1 = block(n_layers, hidden, dim)
        w2 = block(n_layers, dim, hidden)
        w3 = block(n_layers, hidden, dim)
        t["output_norm.weight"] = block(dim)
        f.seek(seq_len * hd * 4, 1)  # legacy freq_cis_real + imag
        t["output.weight"] = (t["token_embd.weight"] if shared
                              else block(vocab, dim))
        for i in range(n_layers):
            t[f"blk.{i}.attn_norm.weight"] = rms_att[i]
            t[f"blk.{i}.attn_q.weight"] = wq[i]
            t[f"blk.{i}.attn_k.weight"] = wk[i]
            t[f"blk.{i}.attn_v.weight"] = wv[i]
            t[f"blk.{i}.attn_output.weight"] = wo[i]
            t[f"blk.{i}.ffn_norm.weight"] = rms_ffn[i]
            t[f"blk.{i}.ffn_gate.weight"] = w1[i]
            t[f"blk.{i}.ffn_down.weight"] = w2[i]
            t[f"blk.{i}.ffn_up.weight"] = w3[i]
    hp = dict(n_embd=dim, n_ff=hidden, n_layers=n_layers, n_heads=n_heads,
              n_kv_heads=n_kv, n_vocab=vocab, n_ctx=seq_len, shared=shared)
    return hp, t


def read_llama2c_tokenizer(path: str, vocab_size: int):
    """→ (tokens bytes list, scores). llama2.c tokenizer.bin format."""
    tokens, scores = [], []
    with open(path, "rb") as f:
        f.read(4)  # max_token_length
        for _ in range(vocab_size):
            (score,) = struct.unpack("<f", f.read(4))
            (n,) = struct.unpack("<i", f.read(4))
            tokens.append(f.read(n))
            scores.append(score)
    return tokens, scores


def _token_type(i: int, text: bytes) -> int:
    # gguf token_type enum: UNKNOWN=2 CONTROL=3 BYTE=6 NORMAL=1
    if i == 0:
        return 2
    if i in (1, 2):
        return 3
    if len(text) == 6 and text.startswith(b"<0x") and text.endswith(b">"):
        return 6
    return 1


def convert(model_bin: str, out_path: str, tokenizer_bin: str | None = None,
            qtype: int | None = None) -> None:
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter
    from ..quant.ref_numpy import quantize

    hp, tensors = read_llama2c(model_bin)
    w = GGUFWriter(out_path, "llama")
    w.add_uint32("llama.block_count", hp["n_layers"])
    w.add_uint32("llama.context_length", hp["n_ctx"])
    w.add_uint32("llama.embedding_length", hp["n_embd"])
    w.add_uint32("llama.feed_forward_length", hp["n_ff"])
    w.add_uint32("llama.attention.head_count", hp["n_heads"])
    w.add_uint32("llama.attention.head_count_kv", hp["n_kv_heads"])
    w.add_uint32("llama.vocab_size", hp["n_vocab"])
    w.add_uint32("llama.rope.dimension_count",
                 hp["n_embd"] // hp["n_heads"])
    w.add_float32("llama.rope.freq_base", 10000.0)
    w.add_float32("llama.attention.layer_norm_rms_epsilon", 1e-5)

    if tokenizer_bin:
        toks, scores = read_llama2c_tokenizer(tokenizer_bin, hp["n_vocab"])
        texts = [t.decode("utf-8", errors="replace") for t in toks]
    else:  # byte-fallback stand-in vocab (reference does the same without -v)
        texts = ["<unk>", "<s>", "</s>"] + [
            f"<0x{i:02X}>" for i in range(hp["n_vocab"] - 3)]
        scores = [0.0] * hp["n_vocab"]
        toks = [t.encode() for t in texts]
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", texts)
    w.add_kv("tokenizer.ggml.scores", [float(s) for s in scores])
    w.add_kv("tokenizer.ggml.token_type",
             [_token_type(i, t) for i, t in enumerate(toks)])
    w.add_kv("tokenizer.ggml.bos_token_id", 1)
    w.add_kv("tokenizer.ggml.eos_token_id", 2)
    w.add_kv("tokenizer.ggml.unknown_token_id", 0)

    if hp["shared"]:
        del tensors["output.weight"]  # loader ties output to token_embd
    for name, arr in tensors.items():
        if qtype is not None and arr.ndim == 2 and arr.shape[1] % 256 == 0:
            ne = tuple(reversed(arr.shape))
            w.add_tensor(name, quantize(arr, GGMLType(qtype)),
                         ggml_type=GGMLType(qtype), ne_shape=ne)
        else:
            w.add_tensor(name, arr)
    w.write()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--copy-vocab-from-model", metavar="TOKENIZER_BIN",
                    default=None, help="llama2.c tokenizer.bin "
                    "(reference flag name)")
    ap.add_argument("--llama2c-model", metavar="MODEL_BIN", required=True)
    ap.add_argument("--llama2c-output-model", metavar="OUT_GGUF",
                    required=True)
    ap.add_argument("--qtype", type=int, default=None,
                    help="GGML type id to quantize 2-D weights to (e.g. 8 "
                         "= Q8_0); default f32")
    args = ap.parse_args(argv)
    convert(args.llama2c_model, args.llama2c_output_model,
            tokenizer_bin=args.copy_vocab_from_model, qtype=args.qtype)
    print(f"wrote {args.llama2c_output_model}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
