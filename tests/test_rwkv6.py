"""RWKV6: WKV recurrence vs an independent direct numpy implementation,
plus incremental-vs-full decode consistency (no HF v6 oracle exists here —
the dual implementation is the oracle, like ggml-matmulref in the reference).
"""

import numpy as np
import jax.numpy as jnp

from llama_cpp_dsp_tpu.models.llama import LlamaConfig
from llama_cpp_dsp_tpu.models.rwkv6 import (
    RwkvState, _wkv6_scan, forward, wkv6_reference_numpy,
)


def test_wkv6_scan_matches_direct():
    rng = np.random.default_rng(0)
    b, t, h, hs = 2, 7, 3, 8
    r = rng.standard_normal((b, t, h, hs)).astype(np.float32)
    k = rng.standard_normal((b, t, h, hs)).astype(np.float32) * 0.5
    v = rng.standard_normal((b, t, h, hs)).astype(np.float32)
    w = rng.uniform(0.2, 0.99, (b, t, h, hs)).astype(np.float32)
    u = rng.standard_normal((h, hs)).astype(np.float32)
    s0 = rng.standard_normal((b, h, hs, hs)).astype(np.float32) * 0.1

    y, sT = _wkv6_scan(jnp.asarray(r), jnp.asarray(k), jnp.asarray(v),
                       jnp.asarray(w), jnp.asarray(u), jnp.asarray(s0))
    y_ref, s_ref = wkv6_reference_numpy(r, k, v, w, u, s0)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sT), s_ref, rtol=1e-5, atol=1e-5)


def _rwkv_cfg():
    return LlamaConfig(
        arch="rwkv6", n_layers=2, n_embd=64, n_heads=0, n_kv_heads=0,
        head_dim=16, n_ff=128, n_vocab=96, n_ctx_train=128, rms_eps=1e-5,
        norm_type="ln",
    )


def _rwkv_params(cfg, seed=0):
    rng = np.random.default_rng(seed)
    c, hs = cfg.n_embd, cfg.head_dim
    h = c // hs
    r5, r2 = 8, 8

    def m(*shape, s=0.1):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    layers = []
    for _ in range(cfg.n_layers):
        layers.append({
            "attn_norm": np.ones(c, np.float32), "attn_norm_bias": m(c),
            "ffn_norm": np.ones(c, np.float32), "ffn_norm_bias": m(c),
            "time_mix_lerp_x": m(c, s=0.3), "time_mix_lerp_w": m(c, s=0.3),
            "time_mix_lerp_k": m(c, s=0.3), "time_mix_lerp_v": m(c, s=0.3),
            "time_mix_lerp_r": m(c, s=0.3), "time_mix_lerp_g": m(c, s=0.3),
            "time_mix_w1": m(c, 5 * r5), "time_mix_w2": m(5, r5, c),
            "time_mix_decay": m(c, s=0.5) - 4.0,
            "time_mix_decay_w1": m(c, r2), "time_mix_decay_w2": m(r2, c),
            "time_mix_first": m(h * hs, s=0.3),
            "time_mix_key": m(c, c), "time_mix_value": m(c, c),
            "time_mix_receptance": m(c, c), "time_mix_gate": m(c, c),
            "time_mix_ln": np.ones(c, np.float32), "time_mix_ln_bias": m(c),
            "time_mix_output": m(c, c),
            "channel_mix_lerp_k": m(c, s=0.3), "channel_mix_lerp_r": m(c, s=0.3),
            "channel_mix_key": m(cfg.n_ff, c), "channel_mix_value": m(c, cfg.n_ff),
            "channel_mix_receptance": m(c, c),
        })
    return {
        "token_embd": m(cfg.n_vocab, c, s=0.5),
        "token_embd_norm": np.ones(c, np.float32),
        "token_embd_norm_bias": m(c),
        "layers": layers,
        "output_norm": np.ones(c, np.float32), "output_norm_bias": m(c),
        "output": m(cfg.n_vocab, c, s=0.5),
    }


def test_rwkv6_incremental_matches_full():
    cfg = _rwkv_cfg()
    params = _rwkv_params(cfg)
    toks = np.array([[4, 17, 9, 33, 2, 50]], np.int32)
    full, _ = forward(params, cfg, jnp.asarray(toks))
    assert np.isfinite(np.asarray(full)).all()

    state = RwkvState.create(cfg, 1)
    outs = []
    for i in range(toks.shape[1]):
        lg, state = forward(params, cfg, jnp.asarray(toks[:, i : i + 1]),
                            state=state)
        outs.append(np.asarray(lg)[0, 0])
    np.testing.assert_allclose(np.stack(outs), np.asarray(full)[0],
                               rtol=2e-4, atol=2e-4)
