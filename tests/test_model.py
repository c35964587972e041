"""End-to-end model tests on a tiny random llama GGUF.

Gate for SURVEY.md §7 stage 3: the JAX forward must match an independent
numpy f32 reference implementation of the same graph; KV-cached decode must
match full recompute exactly.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.quant.ref_numpy import dequantize
from llama_cpp_dsp_tpu.quant.jax_dequant import dequant as jdequant
from llama_cpp_dsp_tpu.ops.qtensor import QTensor
from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
from llama_cpp_dsp_tpu.runtime.loader import load_model

from model_builder import build_tiny_llama


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("models") / "tiny_q8.gguf"
    hp = build_tiny_llama(str(path), qtype=GGMLType.Q8_0)
    return load_model(str(path)), hp


def _np_weight(w):
    if isinstance(w, QTensor):
        return np.asarray(jdequant(w, jnp.float32))
    return np.asarray(w, dtype=np.float32)


def numpy_forward(params, cfg, tokens: np.ndarray) -> np.ndarray:
    """Independent f32 numpy implementation of the llama graph."""
    b, t = tokens.shape
    h, hkv, d = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    emb = _np_weight(params["token_embd"])
    x = emb[tokens]  # [B,T,C]

    def rms(x, w):
        var = np.mean(x * x, axis=-1, keepdims=True)
        return x / np.sqrt(var + cfg.rms_eps) * w

    def rope(v, pos):  # v [B,T,H,D], norm style
        half = cfg.rope.n_dims // 2
        inv = cfg.rope.freq_base ** (-np.arange(half) * 2.0 / cfg.rope.n_dims)
        theta = pos[:, :, None] * inv  # [B,T,half]
        cos, sin = np.cos(theta)[:, :, None, :], np.sin(theta)[:, :, None, :]
        x0, x1 = v[..., 0::2], v[..., 1::2]
        out = np.empty_like(v)
        out[..., 0::2] = x0 * cos - x1 * sin
        out[..., 1::2] = x0 * sin + x1 * cos
        return out

    pos = np.broadcast_to(np.arange(t), (b, t)).astype(np.float64)
    for layer in params["layers"]:
        xin = rms(x, _np_weight(layer["attn_norm"]))
        q = (xin @ _np_weight(layer["attn_q"]).T).reshape(b, t, h, d)
        k = (xin @ _np_weight(layer["attn_k"]).T).reshape(b, t, hkv, d)
        v = (xin @ _np_weight(layer["attn_v"]).T).reshape(b, t, hkv, d)
        q, k = rope(q, pos), rope(k, pos)
        rep = h // hkv
        qs = q.reshape(b, t, hkv, rep, d)
        scores = np.einsum("bthrd,bshd->bhrts", qs, k) / np.sqrt(d)
        mask = np.tril(np.ones((t, t), bool))
        scores = np.where(mask[None, None, None], scores, -np.inf)
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        att = np.einsum("bhrts,bshd->bthrd", probs, v).reshape(b, t, h * d)
        x = x + att @ _np_weight(layer["attn_output"]).T
        xin = rms(x, _np_weight(layer["ffn_norm"]))
        g = xin @ _np_weight(layer["ffn_gate"]).T
        u = xin @ _np_weight(layer["ffn_up"]).T
        act = g / (1 + np.exp(-g)) * u
        x = x + act @ _np_weight(layer["ffn_down"]).T
    x = rms(x, _np_weight(params["output_norm"]))
    out = params.get("output")
    w_out = _np_weight(out if out is not None else params["token_embd"])
    return x @ w_out.T


def test_forward_matches_numpy(tiny_model):
    lm, hp = tiny_model
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, hp["n_vocab"], size=(2, 9))
    want = numpy_forward(lm.params, lm.cfg, tokens)
    pos = np.broadcast_to(np.arange(9), (2, 9)).copy()
    mask = causal_mask(jnp.asarray(pos), 9, 0)
    got, _ = forward(
        lm.params, lm.cfg, jnp.asarray(tokens), jnp.asarray(pos), None, 0, mask,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_kv_cache_decode_matches_full(tiny_model):
    lm, hp = tiny_model
    cfg = lm.cfg
    rng = np.random.default_rng(4)
    n = 12
    tokens = rng.integers(0, hp["n_vocab"], size=(1, n))
    pos = np.arange(n)[None]

    # full forward (no cache)
    mask_full = causal_mask(jnp.asarray(pos), n, 0)
    full_logits, _ = forward(
        lm.params, cfg, jnp.asarray(tokens), jnp.asarray(pos), None, 0, mask_full,
        compute_dtype=jnp.float32,
    )

    # incremental: prefill 5, then decode one at a time
    S = 16
    cache = KVCache.create(cfg.n_layers, 1, S, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
    t0 = 5
    mask = causal_mask(jnp.asarray(pos[:, :t0]), S, 0)
    logits, cache = forward(
        lm.params, cfg, jnp.asarray(tokens[:, :t0]), jnp.asarray(pos[:, :t0]),
        cache, 0, mask, compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits)[:, :t0], rtol=2e-5, atol=2e-5
    )
    for i in range(t0, n):
        mask = causal_mask(jnp.asarray(pos[:, i : i + 1]), S, i)
        step_logits, cache = forward(
            lm.params, cfg, jnp.asarray(tokens[:, i : i + 1]), jnp.asarray(pos[:, i : i + 1]),
            cache, i, mask, compute_dtype=jnp.float32,
        )
        np.testing.assert_allclose(
            np.asarray(step_logits)[:, 0],
            np.asarray(full_logits)[:, i],
            rtol=2e-5,
            atol=2e-5,
            err_msg=f"step {i}",
        )


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q4_0, GGMLType.Q6_K])
def test_forward_other_quants(tmp_path, qtype):
    path = tmp_path / f"tiny_{qtype.name}.gguf"
    # K-quants need 256-element superblocks per row
    hp = build_tiny_llama(str(path), qtype=qtype, n_embd=256, n_ff=256, n_layers=1)
    lm = load_model(str(path))
    tokens = np.arange(8)[None] % hp["n_vocab"]
    want = numpy_forward(lm.params, lm.cfg, tokens)
    pos = np.arange(8)[None]
    mask = causal_mask(jnp.asarray(pos), 8, 0)
    got, _ = forward(
        lm.params, lm.cfg, jnp.asarray(tokens), jnp.asarray(pos), None, 0, mask,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_moe_forward(tmp_path):
    path = tmp_path / "tiny_moe.gguf"
    hp = build_tiny_llama(str(path), qtype=GGMLType.Q8_0, n_expert=4, n_expert_used=2)
    lm = load_model(str(path))
    assert lm.cfg.n_expert == 4
    tokens = np.arange(6)[None]
    pos = np.arange(6)[None]
    mask = causal_mask(jnp.asarray(pos), 6, 0)
    logits, _ = forward(
        lm.params, lm.cfg, jnp.asarray(tokens), jnp.asarray(pos), None, 0, mask,
        compute_dtype=jnp.float32,
    )
    assert np.isfinite(np.asarray(logits)).all()
