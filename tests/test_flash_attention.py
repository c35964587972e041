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
    _flash_decode_case(hq, hkv, d, s)


def test_flash_decode_mha_allheads_bf16():
    """MHA shape (llama2-7b: rep=1, 32 kv heads) rides the all-heads kernel;
    bf16 KV like the serving cache."""
    _flash_decode_case(32, 32, 128, 256, kv_dtype=jnp.bfloat16, tol=8e-3)


def test_flash_decode_allheads_matches_per_head(monkeypatch):
    """LLAMA_TPU_NO_ATTN_ALLH forces the per-(b,h) kernel; both paths must
    agree (same online-softmax arithmetic, different DMA batching)."""
    rng = np.random.default_rng(5)
    b, hq, hkv, d, s = 2, 8, 4, 64, 512
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    lengths = np.array([s // 3, s], np.int32)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(lengths))
    allh = flash_decode(*args, scale=0.125, interpret=True)
    monkeypatch.setenv("LLAMA_TPU_NO_ATTN_ALLH", "1")
    flash_decode.clear_cache()
    per_head = flash_decode(*args, scale=0.125, interpret=True)
    flash_decode.clear_cache()
    np.testing.assert_allclose(np.asarray(allh), np.asarray(per_head),
                               rtol=1e-6, atol=1e-6)


def _flash_decode_case(hq, hkv, d, s, kv_dtype=None, tol=2e-5):
    rng = np.random.default_rng(0)
    b = 3
    q = rng.standard_normal((b, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    lengths = np.array([1, s // 2 + 3, s], np.int32)[:b]
    scale = 1.0 / np.sqrt(d)

    kj = jnp.asarray(k) if kv_dtype is None else jnp.asarray(k, kv_dtype)
    vj = jnp.asarray(v) if kv_dtype is None else jnp.asarray(v, kv_dtype)
    out = flash_decode(
        jnp.asarray(q), kj, vj, jnp.asarray(lengths),
        scale=scale, chunk=128, interpret=True,
    )
    ref = _ref(q, np.asarray(kj, np.float32), np.asarray(vj, np.float32),
               lengths, scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=tol, atol=tol)


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


# ---------------------------------------------------------------------------
# flash_prefill (T > 1 tiles) vs the jnp reference
# ---------------------------------------------------------------------------

from llama_cpp_dsp_tpu.ops.pallas.attention import flash_prefill


def _ref_prefill(q, k, v, n_past, scale, softcap=0.0, swa=0, attn_chunk=0):
    """q [B,T,H,D]; queries at abs pos n_past+t attend rows [start, pos]."""
    b, t, hq, d = q.shape
    s = k.shape[2]
    j = np.arange(s)
    pos = n_past[:, None] + np.arange(t)[None, :]  # [B,T]
    mask = j[None, None, :] <= pos[:, :, None]
    if swa:
        mask &= j[None, None, :] > pos[:, :, None] - swa
    if attn_chunk:
        mask &= j[None, None, :] >= (pos[:, :, None] // attn_chunk) * attn_chunk
    out = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                    jnp.asarray(mask), scale, logit_softcap=softcap)
    return np.asarray(out).reshape(b, t, hq, d)


@pytest.mark.parametrize("hq,hkv,d,t,s,np0", [
    (8, 2, 64, 16, 256, 0),     # GQA, fresh prefill
    (4, 4, 128, 24, 512, 100),  # MHA, chunked continuation (n_past > 0)
    (8, 1, 32, 8, 128, 64),     # MQA
])
def test_flash_prefill_matches_ref(hq, hkv, d, t, s, np0):
    rng = np.random.default_rng(3)
    b = 2
    q = rng.standard_normal((b, t, hq, d)).astype(np.float32)
    k = np.zeros((b, hkv, s, d), np.float32)
    v = np.zeros((b, hkv, s, d), np.float32)
    # rows [0, n_past + t) are written; beyond is stale garbage the causal
    # mask must never read
    k[:, :, : np0 + t] = rng.standard_normal((b, hkv, np0 + t, d))
    v[:, :, : np0 + t] = rng.standard_normal((b, hkv, np0 + t, d))
    k[:, :, np0 + t:] = 1e30
    v[:, :, np0 + t:] = 1e30
    n_past = np.full(b, np0, np.int32)
    scale = 1.0 / np.sqrt(d)
    out = flash_prefill(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(n_past),
        scale=scale, chunk=64, tile_q=8, interpret=True,
    )
    ref = _ref_prefill(q, np.where(np.abs(k) > 1e29, 0, k),
                       np.where(np.abs(v) > 1e29, 0, v), n_past, scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_flash_prefill_swa_softcap_chunked():
    rng = np.random.default_rng(4)
    b, hq, hkv, d, t, s = 1, 4, 2, 64, 32, 256
    np0 = 40
    q = rng.standard_normal((b, t, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
    n_past = np.full(b, np0, np.int32)
    # sliding window
    out = flash_prefill(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(n_past), scale=0.125, chunk=32, tile_q=16,
                        softcap=30.0, swa_window=24, interpret=True)
    ref = _ref_prefill(q, k, v, n_past, 0.125, softcap=30.0, swa=24)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)
    # llama4-style chunked attention
    out = flash_prefill(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                        jnp.asarray(n_past), scale=0.125, chunk=32, tile_q=16,
                        attn_chunk=64, interpret=True)
    ref = _ref_prefill(q, k, v, n_past, 0.125, attn_chunk=64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=3e-5, atol=3e-5)


def test_flash_prefill_model_integration():
    """forward(flash=True) prefill == forward(flash=False) on CPU (the
    kernels auto-interpret off-TPU) — exercises the t>1 dispatch branch."""
    import jax

    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.models.llama import forward
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
    from llama_cpp_dsp_tpu.tools.synth import synth_params, tiny_config

    cfg = tiny_config(n_heads=4, n_kv_heads=2, head_dim=128, n_embd=256,
                      n_ff=256, n_vocab=256)  # gate: d % 128 == 0
    params = jax.tree.map(jnp.asarray,
                          synth_params(cfg, GGMLType.Q8_0, seed=5))

    t, n_ctx = 8, 128
    toks = jnp.asarray(np.arange(1, t + 1)[None], jnp.int32)
    pos = jnp.asarray(np.arange(t)[None], jnp.int32)
    mask = causal_mask(pos, n_ctx, 0)
    import os

    outs = {}
    os.environ["LLAMA_TPU_FLASH_PREFILL"] = "1"
    try:
        for fl in (False, True):
            cache = KVCache.create(cfg.n_layers, 1, n_ctx, cfg.n_kv_heads,
                                   cfg.head_dim)
            logits, _ = forward(params, cfg, toks, pos, cache, 0, mask,
                                flash=fl)
            outs[fl] = np.asarray(logits)
    finally:
        del os.environ["LLAMA_TPU_FLASH_PREFILL"]
    # bf16 layers amplify the f32 softmax-reassociation difference between
    # the chunked online softmax and the one-shot einsum; the greedy token
    # stream (user-visible contract) and scale-relative logits must agree
    np.testing.assert_array_equal(outs[True].argmax(-1), outs[False].argmax(-1))
    np.testing.assert_allclose(outs[True], outs[False], rtol=5e-2, atol=0.25)


def test_mla_flash_decode_matches_xla():
    """Fused MLA latent attention (mla_flash_decode) vs the XLA einsum path
    on a DeepSeek-style config with r=128 (kernel-eligible)."""
    import numpy as np
    import jax.numpy as jnp

    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.models.llama import forward
    from llama_cpp_dsp_tpu.models.registry import synth_config
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
    from llama_cpp_dsp_tpu.tools.synth import synth_params

    cfg = synth_config(
        "deepseek2", n_embd=128, n_heads=4, n_kv_heads=4, head_dim=32,
        n_ff=256, n_vocab=128, kv_lora_rank=128, q_lora_rank=64,
        qk_nope_dim=32, qk_rope_dim=64, v_head_dim=32,
    )
    assert cfg.kv_cache_dim == 256  # 128 + 64 → padded to 256
    params = synth_params(cfg, GGMLType.Q8_0, seed=5, tie=False)
    n, n_ctx = 5, 128
    toks = np.asarray([[3, 9, 2, 7, 1]], np.int32)
    pos = np.arange(n, dtype=np.int32)[None]
    outs = {}
    caches = {}
    for flash in (False, True):
        cache = KVCache.create(cfg.n_layers, 1, n_ctx, cfg.kv_cache_heads,
                               cfg.kv_cache_dim)
        mask = causal_mask(jnp.asarray(pos), n_ctx, 0)
        _, cache = forward(params, cfg, jnp.asarray(toks), jnp.asarray(pos),
                           cache, 0, mask, compute_dtype=jnp.float32,
                           flash=flash)
        t1 = np.asarray([[5]], np.int32)
        p1 = np.asarray([[n]], np.int32)
        m1 = causal_mask(jnp.asarray(p1), n_ctx, n)
        logits, cache = forward(params, cfg, jnp.asarray(t1), jnp.asarray(p1),
                                cache, n, m1, compute_dtype=jnp.float32,
                                flash=flash)
        outs[flash] = np.asarray(logits)[0, -1]
        caches[flash] = cache
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-4, atol=2e-4)
