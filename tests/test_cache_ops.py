"""KV-cache sequence surgery: cell moves + rope position rebasing.

Note: like the reference's context-shift (seq_rm + seq_add + K-shift),
surgery edits the CACHE, not history — retained cells keep hidden states
computed in the original context. Tests therefore verify the cache edit
itself exactly (gather + rope re-rotation), not logits equivalence against
a recomputed reduced sequence.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.registry import synth_config
from llama_cpp_dsp_tpu.ops.rope import RopeParams, apply_rope
from llama_cpp_dsp_tpu.runtime.cache_ops import (
    apply_seq_edit, context_shift_indices, copy_slot, self_extend_indices,
)
from llama_cpp_dsp_tpu.runtime.context import LlamaContext
from llama_cpp_dsp_tpu.runtime.kv_cache import make_kv_cache
from llama_cpp_dsp_tpu.runtime.loader import LoadedModel
from llama_cpp_dsp_tpu.tools.synth import synth_params


def _filled_cache(rope, n=10, capacity=16, kv="f32"):
    """Cache whose K rows are rope(p)·x_p and V rows are raw x_p."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, n, 2, 32)).astype(np.float32)
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    k = apply_rope(jnp.asarray(x), jnp.asarray(pos), rope)
    cache = make_kv_cache(1, 1, capacity, 2, 32, kv)
    cache = cache.write(0, k, jnp.asarray(x), 0)
    return cache, x


@pytest.mark.parametrize("mode,kv", [("norm", "f32"), ("neox", "f32"),
                                     ("norm", "q8_0")])
def test_context_shift_cache_edit(mode, kv):
    rope = RopeParams(n_dims=32, mode=mode, freq_base=10000.0)
    n, keep, disc, cap = 10, 2, 3, 16
    cache, x = _filled_cache(rope, n, cap, kv)
    src, deltas = context_shift_indices(cap, keep, disc)
    cache = apply_seq_edit(cache, src, deltas, rope)

    kq, vq = cache.layer(0)  # [B,H,S,D]
    tol = 0.03 if kv == "q8_0" else 1e-5
    # expected: new row j holds token j(+disc for j>=keep) roped to pos j
    for j in range(n - disc):
        tok = j if j < keep else j + disc
        want_k = np.asarray(apply_rope(
            jnp.asarray(x[:, tok : tok + 1]),
            jnp.asarray(np.array([[j]], np.int32)), rope))[0, 0]  # [H,D]
        got_k = np.asarray(kq, np.float32)[0, :, j]
        assert np.abs(got_k - want_k).max() < tol, (j, kv)
        got_v = np.asarray(vq, np.float32)[0, :, j]
        assert np.abs(got_v - x[0, tok].transpose(0, 1)).max() < tol


def test_self_extend_cache_edit():
    rope = RopeParams(n_dims=32, mode="norm", freq_base=10000.0)
    n, cap, ga_n, ga_w = 8, 16, 2, 8
    cache, x = _filled_cache(rope, n, cap)
    src, deltas = self_extend_indices(cap, n, 0, ga_n, ga_w)
    cache = apply_seq_edit(cache, src, deltas, rope)
    kq, _ = cache.layer(0)
    for j in range(n):
        want = np.asarray(apply_rope(
            jnp.asarray(x[:, j : j + 1]),
            jnp.asarray(np.array([[j // ga_n]], np.int32)), rope))[0, 0]
        got = np.asarray(kq, np.float32)[0, :, j]
        assert np.abs(got - want).max() < 1e-5, j


TOKENS = [3, 17, 42, 99, 7, 55, 21, 8, 64, 30]


def test_context_shift_generation_continues():
    """Behavioral: shift frees rows, decode keeps producing finite logits and
    the counters track the reference semantics (n_past -= n_discard)."""
    cfg = synth_config("llama", n_embd=128, n_heads=4, n_kv_heads=2, head_dim=32)
    params = synth_params(cfg, GGMLType.Q8_0, seed=0, tie=False)
    model = LoadedModel(cfg, params, None, None, {})
    ctx = LlamaContext(model, n_ctx=16, compute_dtype=jnp.float32,
                       use_pallas=False)
    ctx.eval_tokens(TOKENS)
    assert ctx.n_past == 10
    ctx.context_shift(2, 4)
    assert ctx.n_past == 6
    out = ctx.eval_tokens([11])
    assert np.isfinite(out).all()
    # keeps room: can continue up to capacity again
    for t in range(5):
        out = ctx.eval_tokens([12 + t])
        assert np.isfinite(out).all()


def test_self_extend_pos_delta_tracking():
    cfg = synth_config("llama", n_embd=128, n_heads=4, n_kv_heads=2, head_dim=32)
    params = synth_params(cfg, GGMLType.Q8_0, seed=0, tie=False)
    model = LoadedModel(cfg, params, None, None, {})
    ctx = LlamaContext(model, n_ctx=32, compute_dtype=jnp.float32,
                       use_pallas=False)
    ctx.eval_tokens(TOKENS[:8])
    ctx.self_extend(0, 2, 8)
    assert ctx.n_past == 8  # rows unchanged
    assert ctx.pos_delta == -4  # positions compressed by ga_w - ga_w/ga_n
    out = ctx.eval_tokens([11])
    assert np.isfinite(out).all()


def test_copy_slot():
    cache = make_kv_cache(2, 3, 8, 2, 32, "bf16")
    k = jnp.ones((3, 2, 2, 32)) * jnp.arange(1, 4).reshape(3, 1, 1, 1)
    cache = cache.write(0, k, k, 0)
    cache = copy_slot(cache, 0, 2)
    for kl in cache.k:
        np.testing.assert_array_equal(np.asarray(kl[2]), np.asarray(kl[0]))
    assert np.asarray(cache.k[0][1, 0, 0, 0]) == 2.0
