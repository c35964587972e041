"""RWKV6Qwen2 (qrwkv): gated-linear-attention scan vs a direct numpy
recurrence (mirrors ggml_gated_linear_attn semantics — ops.cpp gla_f32),
plus incremental-vs-full decode consistency for the full layer stack."""

import numpy as np
import jax.numpy as jnp

from llama_cpp_dsp_tpu.models.llama import LlamaConfig
from llama_cpp_dsp_tpu.models.rwkv6 import RwkvState, _gla_scan, forward

rng = np.random.default_rng(3)


def _gla_reference_numpy(r, k, v, w, s0, scale):
    b, t, h, hs = r.shape
    s = s0.copy()
    ys = np.zeros_like(r)
    for ti in range(t):
        for bi in range(b):
            for hi in range(h):
                a = np.outer(k[bi, ti, hi], v[bi, ti, hi])
                s[bi, hi] = w[bi, ti, hi][:, None] * s[bi, hi] + a
                ys[bi, ti, hi] = scale * (r[bi, ti, hi] @ s[bi, hi])
    return ys, s


def test_gla_scan_matches_direct():
    b, t, h, hs = 2, 6, 3, 8
    r = rng.standard_normal((b, t, h, hs)).astype(np.float32)
    k = rng.standard_normal((b, t, h, hs)).astype(np.float32) * 0.5
    v = rng.standard_normal((b, t, h, hs)).astype(np.float32)
    w = rng.uniform(0.2, 0.99, (b, t, h, hs)).astype(np.float32)
    s0 = rng.standard_normal((b, h, hs, hs)).astype(np.float32) * 0.1
    scale = hs ** -0.5

    y, sT = _gla_scan(jnp.asarray(r), jnp.asarray(k), jnp.asarray(v),
                      jnp.asarray(w), jnp.asarray(s0), scale)
    y_ref, s_ref = _gla_reference_numpy(r, k, v, w, s0, scale)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sT), s_ref, rtol=1e-5, atol=1e-5)


def _qrwkv_cfg():
    return LlamaConfig(
        arch="rwkv6qwen2", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=96, n_ctx_train=128, rms_eps=1e-6,
    )


def _qrwkv_params(cfg, seed=0):
    g = np.random.default_rng(seed)
    c, hs = cfg.n_embd, cfg.head_dim
    kvdim = cfg.n_kv_heads * hs
    r5, r2 = 8, 8

    def m(*shape, s=0.1):
        return (g.standard_normal(shape) * s).astype(np.float32)

    layers = []
    for _ in range(cfg.n_layers):
        layers.append({
            "attn_norm": np.ones(c, np.float32),
            "ffn_norm": np.ones(c, np.float32),
            "time_mix_lerp_x": m(c, s=0.3),
            "time_mix_lerp_fused": m(5, 1, 1, c, s=0.3),
            "time_mix_w1": m(c, 5 * r5), "time_mix_w2": m(5, r5, c),
            "time_mix_decay": m(c, s=0.5) - 4.0,
            "time_mix_decay_w1": m(c, r2), "time_mix_decay_w2": m(r2, c),
            "time_mix_key": m(kvdim, c), "time_mix_key_bias": m(kvdim),
            "time_mix_value": m(kvdim, c), "time_mix_value_bias": m(kvdim),
            "time_mix_receptance": m(c, c),
            "time_mix_receptance_bias": m(c),
            "time_mix_gate": m(c, c),
            "time_mix_output": m(c, c),
            "ffn_gate": m(cfg.n_ff, c), "ffn_up": m(cfg.n_ff, c),
            "ffn_down": m(c, cfg.n_ff),
        })
    return {
        "token_embd": m(cfg.n_vocab, c, s=0.5),
        "layers": layers,
        "output_norm": np.ones(c, np.float32),
        "output": m(cfg.n_vocab, c, s=0.5),
    }


def test_qrwkv_incremental_matches_full():
    cfg = _qrwkv_cfg()
    params = _qrwkv_params(cfg)
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
