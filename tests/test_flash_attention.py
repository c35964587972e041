"""flash_decode kernel vs the jnp reference attention (interpret mode on CPU).

Mirrors the reference's test-backend-ops FLASH_ATTN_EXT cases: per-shape
comparison against the unfused path at tight tolerance.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_cpp_dsp_tpu.models.llama import attention
from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode


def _ref(q, k, v, lengths, scale, starts=None, softcap=0.0):
    """Reference via models.llama.attention (q [B,H,D] → [B,1,H,D])."""
    b, h, d = q.shape
    s = k.shape[2]
    j = np.arange(s)
    mask = j[None, None, :] < lengths[:, None, None]  # [B,1,S]
    if starts is not None:
        mask &= j[None, None, :] >= starts[:, None, None]
    out = attention(
        jnp.asarray(q[:, None]), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(mask), scale, logit_softcap=softcap,
    )
    return np.asarray(out).reshape(b, h, d)


@pytest.mark.parametrize("hq,hkv,d,s", [(8, 2, 64, 256), (4, 4, 128, 512), (8, 1, 32, 128)])
def test_flash_decode_matches_ref(hq, hkv, d, s):
    rng = np.random.default_rng(0)
    b = 3
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    lengths = np.array([1, s // 2 + 3, s], np.int32)[:b]
    scale = 1.0 / np.sqrt(d)

    out = flash_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        scale=scale, chunk=128, interpret=True,
    )
    ref = _ref(q, k, v, lengths, scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_flash_decode_swa_and_softcap():
    rng = np.random.default_rng(1)
    b, hq, hkv, d, s = 2, 4, 2, 64, 256
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    lengths = np.array([200, 77], np.int32)
    starts = np.maximum(lengths - 64, 0).astype(np.int32)  # window 64
    scale = 0.125

    out = flash_decode(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths),
        jnp.asarray(starts), scale=scale, chunk=64, softcap=50.0, interpret=True,
    )
    ref = _ref(q, k, v, lengths, scale, starts, softcap=50.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_flash_decode_bf16_kv():
    rng = np.random.default_rng(2)
    b, hq, hkv, d, s = 2, 8, 2, 128, 1024
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    kb = jnp.asarray(k, jnp.bfloat16)
    vb = jnp.asarray(v, jnp.bfloat16)
    lengths = np.array([1000, 3], np.int32)
    scale = 1.0 / np.sqrt(d)
    out = flash_decode(
        jnp.asarray(q), kb, vb, jnp.asarray(lengths), scale=scale,
        chunk=256, interpret=True,
    )
    ref = _ref(q, np.asarray(kb, np.float32), np.asarray(vb, np.float32),
               lengths, scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_flash_decode_stacked_layer_index():
    """layer= static index into a stacked [L, B, Hkv, S, D] cache must match
    slicing the layer out first (the model passes the whole cache array so
    XLA never materializes per-layer slice copies)."""
    rng = np.random.default_rng(7)
    L, b, hq, hkv, d, s = 3, 2, 4, 2, 64, 256
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((L, b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((L, b, hkv, s, d)).astype(np.float32)
    lengths = np.array([s // 2, s], np.int32)
    scale = 1.0 / np.sqrt(d)
    for layer in (0, 2):
        out = flash_decode(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(lengths), scale=scale, chunk=128, interpret=True,
            layer=layer,
        )
        ref = flash_decode(
            jnp.asarray(q), jnp.asarray(k[layer]), jnp.asarray(v[layer]),
            jnp.asarray(lengths), scale=scale, chunk=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)
