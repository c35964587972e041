"""Arch-zoo tests: every registered decoder architecture must (a) run a
forward pass with finite logits and (b) produce identical logits from
KV-cached incremental decode vs full recompute — the invariant the reference
enforces implicitly via its per-arch llm_build_* graphs + unified KV cache.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.models.registry import ARCHS, synth_config
from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
from llama_cpp_dsp_tpu.tools.synth import synth_params

DECODER_ARCHS = sorted(n for n, s in ARCHS.items() if s.builder == "decoder")

# archs whose flags exercise a distinct graph shape (one per equivalence class)
DISTINCT = [
    "llama", "qwen2", "qwen2moe", "qwen3", "gemma", "gemma2", "gemma3",
    "phi2", "gpt2", "gptneox", "starcoder", "starcoder2", "stablelm",
    "olmo", "olmo2", "olmoe", "command-r", "cohere2", "bloom", "mpt",
    "falcon", "nemotron", "granite", "minicpm", "deepseek", "mixtral",
    "grok", "qwen2vl", "minicpm3", "bitnet", "chameleon", "plm", "bailingmoe",
    "openelm", "deci", "llama4",
]


def _make(arch, seed=0):
    moe = arch in ("qwen2moe", "olmoe", "deepseek", "mixtral", "granitemoe",
                   "grok", "bailingmoe", "llama4")
    dims = {}
    if moe:
        dims = dict(n_expert=4, n_expert_used=2)
    if arch in ("qwen2", "qwen2moe", "qwen", "phi2", "starcoder2", "stablelm"):
        dims["attn_bias"] = True
    if arch in ("gpt2", "starcoder", "bloom", "mpt"):
        dims["n_kv_heads"] = 4  # MHA-style
    if arch == "openelm":  # per-layer ragged head counts
        dims.update(n_heads=8, n_kv_heads=4,
                    n_heads_l=(4, 8), n_kv_heads_l=(2, 4))
    if arch == "deci":  # nemotron-51B: normal / attn-free / linear-attn
        dims.update(n_layers=3, n_heads=4, n_kv_heads=2,
                    n_heads_l=(4, 0, 4), n_kv_heads_l=(2, 0, 0))
    cfg = synth_config(arch, **dims)
    params = synth_params(cfg, GGMLType.Q8_0, seed=seed, tie=False)
    params = {k: v for k, v in params.items()}
    return cfg, params


@pytest.mark.parametrize("arch", DISTINCT)
def test_forward_finite(arch):
    cfg, params = _make(arch)
    tokens = np.arange(6, dtype=np.int32).reshape(1, 6) % cfg.n_vocab
    positions = np.arange(6, dtype=np.int32).reshape(1, 6)
    logits, _ = forward(params, cfg, jnp.asarray(tokens), jnp.asarray(positions))
    logits = np.asarray(logits)
    assert logits.shape == (1, 6, cfg.n_vocab)
    assert np.isfinite(logits).all(), arch


@pytest.mark.parametrize("arch", DISTINCT)
def test_cached_decode_matches_full(arch):
    cfg, params = _make(arch)
    n, n_ctx = 7, 16
    tokens = (np.arange(n, dtype=np.int32) * 13 + 1).reshape(1, n) % cfg.n_vocab
    positions = np.arange(n, dtype=np.int32).reshape(1, n)

    # full recompute (no cache)
    full_logits, _ = forward(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions),
        mask=np.tril(np.ones((1, n, n), bool)), compute_dtype=jnp.float32,
    )
    full_last = np.asarray(full_logits)[0, -1]

    # incremental: prefill n-1 then decode 1 with cache
    cache = KVCache.create(
        cfg.n_layers, 1, n_ctx, cfg.kv_cache_heads, cfg.kv_cache_dim, jnp.float32
    )
    mask = causal_mask(jnp.asarray(positions[:, : n - 1]), n_ctx, 0)
    _, cache = forward(
        params, cfg, jnp.asarray(tokens[:, : n - 1]),
        jnp.asarray(positions[:, : n - 1]), cache, 0, mask,
        compute_dtype=jnp.float32,
    )
    mask1 = causal_mask(jnp.asarray(positions[:, n - 1 :]), n_ctx, n - 1)
    step_logits, _ = forward(
        params, cfg, jnp.asarray(tokens[:, n - 1 :]),
        jnp.asarray(positions[:, n - 1 :]), cache, n - 1, mask1,
        compute_dtype=jnp.float32,
    )
    step_last = np.asarray(step_logits)[0, -1]
    np.testing.assert_allclose(step_last, full_last, rtol=1e-4, atol=1e-4)


def test_registry_covers_reference_families():
    """Spot-check the §2 arch inventory families are registered."""
    for arch in ["llama", "qwen2", "qwen3moe", "gemma3", "phi3", "gpt2",
                 "gptneox", "command-r", "bloom", "mpt", "falcon", "dbrx",
                 "deepseek2", "mamba", "bert"]:
        assert arch in ARCHS, arch


def test_fused_qkv_split(tmp_path):
    """GGUF with fused attn_qkv loads into split q/k/v (gpt2-style)."""
    from llama_cpp_dsp_tpu.models.registry import arch_spec

    assert arch_spec("gpt2").fused_qkv
    assert arch_spec("phi3").fused_gate_up


def test_fused_gguf_load_forward(tmp_path):
    """GGUF with fused attn_qkv + fused gate-up ffn_up (phi3/chatglm style)
    loads via the split path and runs."""
    import numpy as np
    from llama_cpp_dsp_tpu.gguf.writer import GGUFWriter
    from llama_cpp_dsp_tpu.runtime.loader import load_model

    c, heads, kv_heads, hd, ff, v = 64, 4, 2, 16, 96, 128
    qdim, kvdim = heads * hd, kv_heads * hd
    rng = np.random.default_rng(0)
    w = GGUFWriter(str(tmp_path / "fused.gguf"), "phi3")
    w.add_uint32("phi3.block_count", 2)
    w.add_uint32("phi3.context_length", 128)
    w.add_uint32("phi3.embedding_length", c)
    w.add_uint32("phi3.feed_forward_length", ff)
    w.add_uint32("phi3.attention.head_count", heads)
    w.add_uint32("phi3.attention.head_count_kv", kv_heads)
    w.add_uint32("phi3.vocab_size", v)
    w.add_float32("phi3.attention.layer_norm_rms_epsilon", 1e-5)

    def t(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    w.add_tensor("token_embd.weight", t(v, c))
    w.add_tensor("output_norm.weight", np.ones(c, np.float32))
    w.add_tensor("output.weight", t(v, c))
    for il in range(2):
        p = f"blk.{il}."
        w.add_tensor(p + "attn_norm.weight", np.ones(c, np.float32))
        w.add_tensor(p + "attn_qkv.weight", t(qdim + 2 * kvdim, c))
        w.add_tensor(p + "attn_output.weight", t(c, qdim))
        w.add_tensor(p + "ffn_norm.weight", np.ones(c, np.float32))
        w.add_tensor(p + "ffn_up.weight", t(2 * ff, c))  # fused gate|up
        w.add_tensor(p + "ffn_down.weight", t(c, ff))
    w.write()

    model = load_model(str(tmp_path / "fused.gguf"))
    layer = model.params["layers"][0]
    assert layer["attn_q"].shape[0] == qdim
    assert layer["attn_k"].shape[0] == kvdim
    assert layer["ffn_gate"].shape[0] == ff
    assert layer["ffn_up"].shape[0] == ff

    from llama_cpp_dsp_tpu.models.llama import forward

    toks = np.array([[3, 9, 27]], np.int32)
    pos = np.arange(3, dtype=np.int32).reshape(1, 3)
    logits, _ = forward(model.params, model.cfg, jnp.asarray(toks),
                        jnp.asarray(pos), mask=np.tril(np.ones((1, 3, 3), bool)),
                        compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
