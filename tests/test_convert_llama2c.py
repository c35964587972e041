"""llama2.c checkpoint converter (reference examples/convert-llama2c-to-ggml):
a synthetic llama2.c .bin round-trips to GGUF with logits identical to the
same weights written directly as GGUF."""

import struct

import numpy as np
import pytest


def _write_llama2c(path, tok_path, rng, *, dim=64, hidden=128, n_layers=2,
                   n_heads=4, n_kv=2, vocab=64, seq_len=64, shared=True):
    hd = dim // n_heads
    kv_dim = n_kv * hd

    def r(*shape):
        return (rng.standard_normal(shape) * 0.05).astype("<f4")

    t = {
        "embd": r(vocab, dim),
        "rms_att": r(n_layers, dim) + 1.0,
        "wq": r(n_layers, dim, dim),
        "wk": r(n_layers, kv_dim, dim),
        "wv": r(n_layers, kv_dim, dim),
        "wo": r(n_layers, dim, dim),
        "rms_ffn": r(n_layers, dim) + 1.0,
        "w1": r(n_layers, hidden, dim),
        "w2": r(n_layers, dim, hidden),
        "w3": r(n_layers, hidden, dim),
        "rms_final": r(dim) + 1.0,
    }
    if not shared:
        t["wcls"] = r(vocab, dim)
    with open(path, "wb") as f:
        f.write(struct.pack("<7i", dim, hidden, n_layers, n_heads, n_kv,
                            vocab if shared else -vocab, seq_len))
        order = ["embd", "rms_att", "wq", "wk", "wv", "wo", "rms_ffn",
                 "w1", "w2", "w3", "rms_final"]
        for k in order:
            f.write(t[k].tobytes())
        f.write(np.zeros(seq_len * hd, "<f4").tobytes())  # legacy freq_cis
        if not shared:
            f.write(t["wcls"].tobytes())
    # tokenizer.bin: max_len, then (score, len, bytes) per token
    with open(tok_path, "wb") as f:
        f.write(struct.pack("<i", 8))
        texts = [b"<unk>", b"<s>", b"</s>"] + [
            f"<0x{i:02X}>".encode() for i in range(vocab - 3)]
        for i, txt in enumerate(texts):
            f.write(struct.pack("<f", -float(i)))
            f.write(struct.pack("<i", len(txt)))
            f.write(txt)
    return t


def _gguf_from_arrays(path, t, *, dim, hidden, n_layers, n_heads, n_kv,
                      vocab, seq_len, shared):
    from llama_cpp_dsp_tpu.gguf.writer import GGUFWriter

    w = GGUFWriter(path, "llama")
    w.add_uint32("llama.block_count", n_layers)
    w.add_uint32("llama.context_length", seq_len)
    w.add_uint32("llama.embedding_length", dim)
    w.add_uint32("llama.feed_forward_length", hidden)
    w.add_uint32("llama.attention.head_count", n_heads)
    w.add_uint32("llama.attention.head_count_kv", n_kv)
    w.add_float32("llama.rope.freq_base", 10000.0)
    w.add_float32("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_uint32("llama.vocab_size", vocab)
    texts = ["<unk>", "<s>", "</s>"] + [f"<0x{i:02X}>" for i in range(vocab - 3)]
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", texts)
    w.add_kv("tokenizer.ggml.scores", [0.0] * vocab)
    w.add_kv("tokenizer.ggml.token_type", [2, 3, 3] + [6] * (vocab - 3))
    w.add_tensor("token_embd.weight", t["embd"])
    w.add_tensor("output_norm.weight", t["rms_final"])
    if not shared:
        w.add_tensor("output.weight", t["wcls"])
    for i in range(t["rms_att"].shape[0]):
        w.add_tensor(f"blk.{i}.attn_norm.weight", t["rms_att"][i])
        w.add_tensor(f"blk.{i}.attn_q.weight", t["wq"][i])
        w.add_tensor(f"blk.{i}.attn_k.weight", t["wk"][i])
        w.add_tensor(f"blk.{i}.attn_v.weight", t["wv"][i])
        w.add_tensor(f"blk.{i}.attn_output.weight", t["wo"][i])
        w.add_tensor(f"blk.{i}.ffn_norm.weight", t["rms_ffn"][i])
        w.add_tensor(f"blk.{i}.ffn_gate.weight", t["w1"][i])
        w.add_tensor(f"blk.{i}.ffn_down.weight", t["w2"][i])
        w.add_tensor(f"blk.{i}.ffn_up.weight", t["w3"][i])
    w.write()


@pytest.mark.parametrize("shared", [True, False])
def test_llama2c_roundtrip_logits(tmp_path, shared):
    from llama_cpp_dsp_tpu.runtime.context import LlamaContext
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    from llama_cpp_dsp_tpu.tools.convert_llama2c import main

    rng = np.random.default_rng(0)
    kw = dict(dim=64, hidden=128, n_layers=2, n_heads=4, n_kv=2, vocab=64,
              seq_len=64, shared=shared)
    bin_path = str(tmp_path / "model.bin")
    tok_path = str(tmp_path / "tok.bin")
    t = _write_llama2c(bin_path, tok_path, rng, **kw)

    out = str(tmp_path / "out.gguf")
    assert main(["--llama2c-model", bin_path, "--llama2c-output-model", out,
                 "--copy-vocab-from-model", tok_path]) == 0

    ref = str(tmp_path / "ref.gguf")
    _gguf_from_arrays(ref, t, **kw)

    toks = [1, 5, 9, 20]
    import jax.numpy as jnp

    l1 = LlamaContext(load_model(out), n_ctx=64, prefill_buckets=(8,),
                      compute_dtype=jnp.float32).eval_tokens(toks)
    l2 = LlamaContext(load_model(ref), n_ctx=64, prefill_buckets=(8,),
                      compute_dtype=jnp.float32).eval_tokens(toks)
    np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-5)
    m = load_model(out)
    assert m.vocab.bos_id == 1 and m.vocab.eos_id == 2
