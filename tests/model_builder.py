"""Build tiny random Llama GGUFs for tests (using our own writer/quantizers)."""

from __future__ import annotations

import numpy as np

from llama_cpp_dsp_tpu.gguf import GGMLType, GGUFWriter
from llama_cpp_dsp_tpu.quant import quantize

TINY = dict(
    n_layers=2,
    n_embd=64,
    n_heads=4,
    n_kv_heads=2,
    n_ff=128,
    n_vocab=256,
    n_ctx=128,
    rope_base=10000.0,
    rms_eps=1e-5,
)


def build_tiny_llama(
    path: str,
    *,
    qtype: GGMLType = GGMLType.Q8_0,
    seed: int = 0,
    arch: str = "llama",
    tie_embeddings: bool = False,
    n_expert: int = 0,
    n_expert_used: int = 0,
    **overrides,
) -> dict:
    hp = dict(TINY)
    hp.update(overrides)
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, arch)
    w.add_uint32(f"{arch}.block_count", hp["n_layers"])
    w.add_uint32(f"{arch}.context_length", hp["n_ctx"])
    w.add_uint32(f"{arch}.embedding_length", hp["n_embd"])
    w.add_uint32(f"{arch}.feed_forward_length", hp["n_ff"])
    w.add_uint32(f"{arch}.attention.head_count", hp["n_heads"])
    w.add_uint32(f"{arch}.attention.head_count_kv", hp["n_kv_heads"])
    w.add_float32(f"{arch}.rope.freq_base", hp["rope_base"])
    w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", hp["rms_eps"])
    w.add_uint32(f"{arch}.vocab_size", hp["n_vocab"])
    if n_expert:
        w.add_uint32(f"{arch}.expert_count", n_expert)
        w.add_uint32(f"{arch}.expert_used_count", n_expert_used)
    # minimal spm-ish vocab so Vocab.from_gguf_kv works
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{i:02X}>" for i in range(253)]
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens[: hp["n_vocab"]])
    w.add_kv("tokenizer.ggml.scores", [0.0] * hp["n_vocab"])
    w.add_kv("tokenizer.ggml.token_type", [2] + [3] * 2 + [6] * (hp["n_vocab"] - 3))

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    def add_q(name: str, data: np.ndarray, t: GGMLType = qtype):
        ne = tuple(reversed(data.shape))
        if t in (GGMLType.F32,):
            w.add_tensor(name, data)
        else:
            w.add_tensor(name, quantize(data, t), ggml_type=t, ne_shape=ne)

    c, ff, v = hp["n_embd"], hp["n_ff"], hp["n_vocab"]
    hd = c // hp["n_heads"]
    kvdim = hp["n_kv_heads"] * hd
    add_q("token_embd.weight", rand(v, c))
    for i in range(hp["n_layers"]):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(c, np.float32))
        add_q(p + "attn_q.weight", rand(c, c))
        add_q(p + "attn_k.weight", rand(kvdim, c))
        add_q(p + "attn_v.weight", rand(kvdim, c))
        add_q(p + "attn_output.weight", rand(c, c))
        w.add_tensor(p + "ffn_norm.weight", np.ones(c, np.float32))
        if n_expert:
            add_q(p + "ffn_gate_inp.weight", rand(n_expert, c), GGMLType.F32)
            add_q(p + "ffn_gate_exps.weight", rand(n_expert, ff, c))
            add_q(p + "ffn_up_exps.weight", rand(n_expert, ff, c))
            add_q(p + "ffn_down_exps.weight", rand(n_expert, c, ff))
        else:
            add_q(p + "ffn_gate.weight", rand(ff, c))
            add_q(p + "ffn_up.weight", rand(ff, c))
            add_q(p + "ffn_down.weight", rand(c, ff))
    w.add_tensor("output_norm.weight", np.ones(c, np.float32))
    if not tie_embeddings:
        add_q("output.weight", rand(v, c))
    w.write()
    return hp


def build_tiny_bert(
    path: str,
    *,
    seed: int = 0,
    with_cls: bool = True,
    pooling_type: int = 4,  # LLAMA_POOLING_TYPE_RANK
) -> dict:
    """Tiny random BERT GGUF (reference LLM_ARCH_BERT tensor names) with an
    optional rerank classification head (cls / cls.output)."""
    hp = dict(n_layers=2, n_embd=64, n_heads=4, n_ff=128, n_vocab=256,
              n_ctx=64, eps=1e-12)
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, "bert")
    w.add_uint32("bert.block_count", hp["n_layers"])
    w.add_uint32("bert.context_length", hp["n_ctx"])
    w.add_uint32("bert.embedding_length", hp["n_embd"])
    w.add_uint32("bert.feed_forward_length", hp["n_ff"])
    w.add_uint32("bert.attention.head_count", hp["n_heads"])
    w.add_float32("bert.attention.layer_norm_epsilon", hp["eps"])
    w.add_uint32("bert.vocab_size", hp["n_vocab"])
    w.add_uint32("bert.pooling_type", pooling_type)
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{i:02X}>" for i in range(253)]
    w.add_kv("tokenizer.ggml.model", "llama")
    w.add_kv("tokenizer.ggml.tokens", tokens[: hp["n_vocab"]])
    w.add_kv("tokenizer.ggml.scores", [0.0] * hp["n_vocab"])
    w.add_kv("tokenizer.ggml.token_type", [2] + [3] * 2 + [6] * (hp["n_vocab"] - 3))

    def rand(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    c, ff, v = hp["n_embd"], hp["n_ff"], hp["n_vocab"]
    w.add_tensor("token_embd.weight", rand(v, c))
    w.add_tensor("token_types.weight", rand(2, c))
    w.add_tensor("position_embd.weight", rand(hp["n_ctx"], c))
    w.add_tensor("token_embd_norm.weight", np.ones(c, np.float32))
    w.add_tensor("token_embd_norm.bias", rand(c))
    for i in range(hp["n_layers"]):
        p = f"blk.{i}."
        for nm, shape in (
            ("attn_q", (c, c)), ("attn_k", (c, c)), ("attn_v", (c, c)),
            ("attn_output", (c, c)), ("ffn_up", (ff, c)), ("ffn_down", (c, ff)),
        ):
            w.add_tensor(p + nm + ".weight", rand(*shape))
            w.add_tensor(p + nm + ".bias", rand(shape[0]))
        for nm in ("attn_output_norm", "layer_output_norm"):
            w.add_tensor(p + nm + ".weight", np.ones(c, np.float32))
            w.add_tensor(p + nm + ".bias", rand(c))
    if with_cls:
        w.add_tensor("cls.weight", rand(c, c))
        w.add_tensor("cls.bias", rand(c))
        w.add_tensor("cls.output.weight", rand(1, c))
        w.add_tensor("cls.output.bias", rand(1))
    w.write()
    return hp
