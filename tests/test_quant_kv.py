"""Quantized (Q8) KV cache: round-trip accuracy, kernel parity, and
model-level decode quality — mirrors the reference's --cache-type-k q8_0
capability (src/llama-kv-cache.h:188-189, common/arg.cpp:699). The TPU
relayout uses one int8 scale per cached row (head_dim block) instead of
32-element blocks; quality is checked at the model level below.
"""

import numpy as np
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.models.registry import synth_config
from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode_q8
from llama_cpp_dsp_tpu.runtime.kv_cache import (
    QuantKVCache, causal_mask, make_kv_cache, _q8_dequant, _q8_quant,
)
from llama_cpp_dsp_tpu.tools.synth import synth_params

from tests_flash_ref import ref_attention


def test_q8_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((4, 3, 7, 64)) * 3).astype(np.float32)
    qs, d = _q8_quant(jnp.asarray(x))
    y = np.asarray(_q8_dequant(qs, d, jnp.float32))
    err = np.abs(x - y)
    bound = np.asarray(d)[..., None] * 0.5 + 1e-6
    assert (err <= bound).all()
    qs0, d0 = _q8_quant(jnp.zeros((1, 32)))
    assert np.asarray(d0).item() == 0.0
    assert np.asarray(qs0).sum() == 0


def test_quant_cache_write_layer():
    cache = make_kv_cache(2, 1, 16, 2, 32, "q8_0")
    assert isinstance(cache, QuantKVCache)
    rng = np.random.default_rng(1)
    k = rng.standard_normal((1, 4, 2, 32)).astype(np.float32)
    v = rng.standard_normal((1, 4, 2, 32)).astype(np.float32)
    cache = cache.write(0, jnp.asarray(k), jnp.asarray(v), 0)
    kq, _ = cache.layer(0)
    ref_k = k.transpose(0, 2, 1, 3)  # [B,H,T,D]
    got = np.asarray(kq, np.float32)[:, :, :4]
    assert np.abs(got - ref_k).max() < 0.05


def test_flash_decode_q8_matches_dequant():
    rng = np.random.default_rng(2)
    b, hq, hkv, d, s = 2, 4, 2, 64, 512
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    kqs, kd = _q8_quant(jnp.asarray(k))
    vqs, vd = _q8_quant(jnp.asarray(v))
    kd4 = kd[:, :, None, :]  # [B,Hkv,1,S]
    vd4 = vd[:, :, None, :]
    lengths = np.array([400, 33], np.int32)
    scale = 1.0 / np.sqrt(d)

    out = flash_decode_q8(
        jnp.asarray(q), kqs, kd4, vqs, vd4, jnp.asarray(lengths),
        scale=scale, chunk=128, interpret=True,
    )
    ref = ref_attention(q, np.asarray(_q8_dequant(kqs, kd, jnp.float32)),
                        np.asarray(_q8_dequant(vqs, vd, jnp.float32)),
                        lengths, scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_model_decode_with_q8_cache():
    """Cached decode with q8 KV stays close to f32-cache decode."""
    cfg = synth_config("llama", n_embd=128, n_heads=4, n_kv_heads=2, head_dim=32)
    params = synth_params(cfg, GGMLType.Q8_0, seed=3, tie=False)
    n, n_ctx = 6, 16
    tokens = (np.arange(n, dtype=np.int32) * 7 + 2).reshape(1, n) % cfg.n_vocab
    positions = np.arange(n, dtype=np.int32).reshape(1, n)

    outs = {}
    for kv_type in ("f32", "q8_0"):
        cache = make_kv_cache(cfg.n_layers, 1, n_ctx, cfg.n_kv_heads,
                              cfg.head_dim, kv_type)
        mask = causal_mask(jnp.asarray(positions), n_ctx, 0)
        logits, _ = forward(params, cfg, jnp.asarray(tokens),
                            jnp.asarray(positions), cache, 0, mask,
                            compute_dtype=jnp.float32)
        outs[kv_type] = np.asarray(logits)[0, -1]
    denom = np.abs(outs["f32"]).max() + 1e-6
    assert np.abs(outs["q8_0"] - outs["f32"]).max() / denom < 0.02
