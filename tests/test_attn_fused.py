"""Fused decode attention step (ops/pallas/attn_fused): qkv + rope +
KV-write + flash in one kernel must match the unfused composition
(qmm → apply_rope → cache.write → flash_decode) on the same inputs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.ops.pallas.attn_fused import attn_decode_fused
from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout
from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_fused
from llama_cpp_dsp_tpu.ops.qtensor import from_gguf_tensor
from llama_cpp_dsp_tpu.ops.rope import RopeParams, _rope_angles, apply_rope
from llama_cpp_dsp_tpu.quant import quantize
from llama_cpp_dsp_tpu.quant.jax_dequant import dequant


def _setup(rng, b, hq, hkv, d, k_dim, s_total, n_past):
    n_rows = (hq + 2 * hkv) * d
    w = (rng.standard_normal((n_rows, k_dim)) * 0.05).astype(np.float32)
    qt = from_gguf_tensor(quantize(w, GGMLType.Q4_0), GGMLType.Q4_0,
                          (n_rows, k_dim))
    kw = to_kernel_layout(qt, tile_k=k_dim)
    x = (rng.standard_normal((b, k_dim)) * 0.3).astype(np.float32)
    kc = (rng.standard_normal((b, hkv, s_total, d)) * 0.2).astype(np.float32)
    vc = (rng.standard_normal((b, hkv, s_total, d)) * 0.2).astype(np.float32)
    # zero rows at and beyond each slot's write position (unwritten cells)
    for bi, np_ in enumerate(np.atleast_1d(n_past)):
        kc[bi, :, np_:] = 0
        vc[bi, :, np_:] = 0
    return kw, qt, x, jnp.asarray(kc, jnp.bfloat16), jnp.asarray(
        vc, jnp.bfloat16)


def _unfused(qt, x, kc, vc, rp, positions, hq, hkv, d, scale,
             _unfused_qkv=None):
    """Reference composition: the production unfused path (qmm kernel →
    apply_rope → cache write → flash_decode) on the same kernel layout,
    so the qkv values are computed by the same bf16-MXU dequant body."""
    from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode

    b = x.shape[0]
    qkv = _unfused_qkv(jnp.asarray(x))
    nq, nk = hq * d, hkv * d
    q = qkv[:, :nq].reshape(b, 1, hq, d)
    k = qkv[:, nq:nq + nk].reshape(b, 1, hkv, d)
    v = qkv[:, nq + nk:].reshape(b, 1, hkv, d)
    pos2 = positions[:, None]
    q = apply_rope(q, pos2, rp).astype(jnp.bfloat16)
    k = apply_rope(k, pos2, rp).astype(jnp.bfloat16)
    bi = jnp.arange(b)
    kc = kc.at[bi, :, positions].set(k[:, 0], mode="drop")
    vc = vc.at[bi, :, positions].set(v[:, 0].astype(jnp.bfloat16),
                                     mode="drop")
    lengths = positions + 1
    out = flash_decode(q[:, 0].astype(jnp.float32), kc, vc, lengths, None,
                       scale=scale)
    return out, kc, vc


def _lane_angles(positions, rp, d):
    cos, sin = _rope_angles(positions, rp, None)  # [B, d/2]
    return (jnp.repeat(cos, 2, axis=-1).astype(jnp.float32),
            jnp.repeat(sin, 2, axis=-1).astype(jnp.float32))


@pytest.mark.parametrize("b,hq,hkv,n_past", [
    (1, 4, 4, 37),    # MHA (the 7B/13B shape class)
    (2, 8, 2, (5, 90)),  # GQA, ragged lengths
    (1, 2, 2, 0),     # first decoded token (no streamed chunks)
])
def test_attn_fused_matches_unfused(b, hq, hkv, n_past):
    rng = np.random.default_rng(42)
    d, k_dim, s_total = 128, 256, 128
    scale = 1.0 / d**0.5
    n_past = np.asarray(n_past if isinstance(n_past, tuple) else (n_past,) * b,
                        np.int32)
    kw, qt, x, kc, vc = _setup(rng, b, hq, hkv, d, k_dim, s_total, n_past)
    rp = RopeParams(n_dims=d, mode="norm")
    positions = jnp.asarray(n_past, jnp.int32)
    cs, sn = _lane_angles(positions, rp, d)
    res = attn_decode_fused(
        jnp.asarray(x), kw, kc, vc, cs, sn, positions + 1, None,
        n_heads=hq, n_kv_heads=hkv, scale=scale)
    assert res is not None
    out_f, kc_f, vc_f = res
    out_u, kc_u, vc_u = _unfused(
        qt, x, kc, vc, rp, positions, hq, hkv, d, scale,
        _unfused_qkv=lambda xx: qmm_fused(xx, kw, tile_b=8, tile_n=64))

    # cache contents: the written row must match the unfused write exactly
    np.testing.assert_array_equal(np.asarray(kc_f, np.float32),
                                  np.asarray(kc_u, np.float32))
    np.testing.assert_array_equal(np.asarray(vc_f, np.float32),
                                  np.asarray(vc_u, np.float32))
    got = np.asarray(out_f, np.float32).reshape(b, hq, d)
    want = np.asarray(out_u, np.float32)
    err = np.abs(got - want).max()
    assert err < 2e-2, err


def test_attn_fused_idle_slot_drops_write():
    """A slot whose position == capacity (idle in a batched engine step)
    must not have its cache touched."""
    rng = np.random.default_rng(7)
    b, hq, hkv, d, k_dim, s_total = 2, 4, 4, 128, 256, 128
    n_past = np.asarray([10, s_total], np.int32)
    kw, qt, x, kc, vc = _setup(rng, b, hq, hkv, d, k_dim, s_total,
                               np.minimum(n_past, s_total))
    rp = RopeParams(n_dims=d, mode="norm")
    positions = jnp.asarray(n_past, jnp.int32)
    cs, sn = _lane_angles(positions, rp, d)
    before_k = np.asarray(kc, np.float32).copy()
    res = attn_decode_fused(
        jnp.asarray(x), kw, kc, vc, cs, sn, positions + 1, None,
        n_heads=hq, n_kv_heads=hkv, scale=1.0 / d**0.5)
    assert res is not None
    _, kc_f, _ = res
    after_k = np.asarray(kc_f, np.float32)
    np.testing.assert_array_equal(after_k[1], before_k[1])  # idle untouched
    assert np.abs(after_k[0, :, 10]).max() > 0  # active slot written


def test_attn_fused_forward_e2e(monkeypatch):
    """LLAMA_TPU_FUSED_ATTN=1 decode through models/llama.forward must match
    the unfused default path on a kernel-converted synth model."""
    from llama_cpp_dsp_tpu.models.llama import forward
    from llama_cpp_dsp_tpu.models.registry import synth_config
    from llama_cpp_dsp_tpu.runtime.context import convert_params_to_kernel
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
    from llama_cpp_dsp_tpu.tools.synth import synth_params

    cfg = synth_config("llama", n_embd=256, n_heads=2, n_kv_heads=2,
                       head_dim=128, n_ff=512, n_vocab=128)
    params = convert_params_to_kernel(
        synth_params(cfg, GGMLType.Q4_0, seed=5, tie=False))
    rng = np.random.default_rng(1)
    toks = jnp.asarray(rng.integers(0, 128, (1, 1)), jnp.int32)

    def run():
        cache = KVCache.create(cfg.n_layers, 1, 128, cfg.n_kv_heads,
                               cfg.head_dim)
        n_past = 0
        outs = []
        t = toks
        for _ in range(4):
            pos = jnp.full((1, 1), n_past, jnp.int32)
            mask = causal_mask(pos, 128, n_past)
            logits, cache = forward(params, cfg, t, pos, cache, n_past, mask,
                                    flash=True)
            t = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            outs.append(np.asarray(logits))
            n_past += 1
        return np.concatenate(outs, 1)

    base = run()
    monkeypatch.setenv("LLAMA_TPU_FUSED_ATTN", "1")
    fused = run()
    err = np.abs(fused - base).max() / max(np.abs(base).max(), 1e-6)
    assert err < 2e-2, err


def test_attn_fused_gates():
    """Disqualifying shapes return None (caller falls back)."""
    rng = np.random.default_rng(3)
    b, hq, hkv, d, k_dim, s_total = 1, 4, 4, 128, 256, 128
    kw, qt, x, kc, vc = _setup(rng, b, hq, hkv, d, k_dim, s_total,
                               np.asarray([4], np.int32))
    rp = RopeParams(n_dims=d, mode="norm")
    positions = jnp.asarray([4], jnp.int32)
    cs, sn = _lane_angles(positions, rp, d)
    # f32 cache disqualifies
    assert attn_decode_fused(
        jnp.asarray(x), kw, kc.astype(jnp.float32), vc.astype(jnp.float32),
        cs, sn, positions + 1, None,
        n_heads=hq, n_kv_heads=hkv, scale=0.1) is None
