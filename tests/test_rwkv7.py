"""RWKV7/ARWKV7: delta-rule WKV recurrence vs an independent direct numpy
implementation, plus incremental-vs-full decode consistency (no HF RWKV7
port exists here — the dual implementation is the oracle, like
ggml-matmulref in the reference).
"""

import jax.numpy as jnp
import numpy as np

from llama_cpp_dsp_tpu.models.llama import LlamaConfig
from llama_cpp_dsp_tpu.models.rwkv6 import RwkvState
from llama_cpp_dsp_tpu.models.rwkv7 import (
    _wkv7_scan, forward, wkv7_reference_numpy,
)


def test_wkv7_scan_matches_direct():
    rng = np.random.default_rng(0)
    b, t, h, hs = 2, 7, 3, 8
    r = rng.standard_normal((b, t, h, hs)).astype(np.float32)
    w = rng.uniform(0.2, 0.99, (b, t, h, hs)).astype(np.float32)
    k = rng.standard_normal((b, t, h, hs)).astype(np.float32) * 0.5
    v = rng.standard_normal((b, t, h, hs)).astype(np.float32)
    kk = rng.standard_normal((b, t, h, hs)).astype(np.float32)
    kk /= np.maximum(np.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
    gate = 1 / (1 + np.exp(-rng.standard_normal((b, t, h, hs)))).astype(np.float32)
    a, bb = -kk, kk * gate
    s0 = rng.standard_normal((b, h, hs, hs)).astype(np.float32) * 0.1

    y, sT = _wkv7_scan(*(jnp.asarray(x) for x in (r, w, k, v, a, bb)),
                       jnp.asarray(s0))
    y_ref, s_ref = wkv7_reference_numpy(r, w, k, v, a, bb, s0)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sT), s_ref, rtol=1e-5, atol=1e-5)


def _cfg(arch):
    return LlamaConfig(
        arch=arch, n_layers=2, n_embd=64, n_heads=0, n_kv_heads=0,
        head_dim=16, n_ff=128, n_vocab=96, n_ctx_train=128, rms_eps=1e-5,
        norm_type="ln" if arch == "rwkv7" else "rms",
    )


def _params(cfg, seed=0, gated=True):
    rng = np.random.default_rng(seed)
    c, hs = cfg.n_embd, cfg.head_dim
    h = c // hs
    r = 8
    pure = cfg.arch == "rwkv7"

    def m(*shape, s=0.1):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    layers = []
    for il in range(cfg.n_layers):
        layer = {
            "attn_norm": np.ones(c, np.float32),
            "time_mix_lerp_fused": m(6 if gated else 5, 1, 1, c, s=0.3),
            "time_mix_w0": m(c) - 1.0,
            "time_mix_w1": m(c, r), "time_mix_w2": m(r, c),
            "time_mix_a0": m(c), "time_mix_a1": m(c, r), "time_mix_a2": m(r, c),
            "time_mix_k_k": m(c, s=0.5) + 1.0,
            "time_mix_k_a": m(c, s=0.5),
            "time_mix_r_k": m(h, hs, s=0.3),
            "time_mix_key": m(c, c), "time_mix_value": m(c, c),
            "time_mix_receptance": m(c, c), "time_mix_output": m(c, c),
            "time_mix_ln": np.ones(c, np.float32), "time_mix_ln_bias": m(c),
        }
        if gated:
            layer["time_mix_g1"] = m(c, r)
            layer["time_mix_g2"] = m(r, c)
        if il > 0:  # first-layer value residual LoRA
            layer["time_mix_v0"] = m(c)
            layer["time_mix_v1"] = m(c, r)
            layer["time_mix_v2"] = m(r, c)
        if pure:
            layer["attn_norm_bias"] = m(c)
            layer["ffn_norm"] = np.ones(c, np.float32)
            layer["ffn_norm_bias"] = m(c)
            layer["channel_mix_lerp_k"] = m(c, s=0.3)
            layer["channel_mix_key"] = m(cfg.n_ff, c)
            layer["channel_mix_value"] = m(c, cfg.n_ff)
        else:
            layer["ffn_norm"] = np.ones(c, np.float32)
            layer["ffn_gate"] = m(cfg.n_ff, c)
            layer["ffn_up"] = m(cfg.n_ff, c)
            layer["ffn_down"] = m(c, cfg.n_ff)
        layers.append(layer)
    params = {
        "token_embd": m(cfg.n_vocab, c, s=0.5),
        "layers": layers,
        "output_norm": np.ones(c, np.float32),
        "output": m(cfg.n_vocab, c, s=0.5),
    }
    if pure:
        params["token_embd_norm"] = np.ones(c, np.float32)
        params["token_embd_norm_bias"] = m(c)
        params["output_norm_bias"] = m(c)
    return params


def _check_incremental(arch, gated=True):
    cfg = _cfg(arch)
    params = _params(cfg, gated=gated)
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


def test_rwkv7_incremental_matches_full():
    _check_incremental("rwkv7")


def test_rwkv7_ungated_incremental_matches_full():
    _check_incremental("rwkv7", gated=False)


def test_arwkv7_incremental_matches_full():
    _check_incremental("arwkv7")
