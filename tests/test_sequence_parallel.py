"""Sequence parallelism (ring attention over an "sp" mesh axis).

The online-softmax ring rewrite is exact, so sharded prefill logits must
match the single-device forward to f32 tolerance. Beyond-reference
capability (SURVEY §2.7: upstream has no context parallelism).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.parallel.sequence import sequence_parallel_prefill
from llama_cpp_dsp_tpu.runtime.kv_cache import causal_mask
from llama_cpp_dsp_tpu.tools.synth import synth_params, tiny_config


def _mesh(sp: int) -> Mesh:
    devs = jax.devices()
    if len(devs) < sp:
        pytest.skip(f"needs {sp} devices")
    return Mesh(np.array(devs[:sp]), ("sp",))


@pytest.mark.parametrize("sp", [2, 4])
def test_ring_prefill_matches_single_device(sp):
    cfg = tiny_config(n_layers=2, n_heads=4, n_kv_heads=2, head_dim=16,
                      n_embd=64, n_ff=128, n_vocab=96)
    params = jax.tree.map(jnp.asarray, synth_params(cfg, GGMLType.Q8_0, seed=7))
    rng = np.random.default_rng(0)
    b, t = 2, 32
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (b, t)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))

    ref, _ = forward(params, cfg, tokens, positions, None, 0,
                     causal_mask(positions, t, 0), compute_dtype=jnp.float32)

    mesh = _mesh(sp)
    got = sequence_parallel_prefill(params, cfg, tokens, mesh,
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_sp_prefill_then_sharded_decode():
    """Full long-context pipeline: sp prefill fills a sequence-sharded KV
    cache, sp_decode_step continues greedily; logits must match the
    single-device forward+KVCache path step by step."""
    from llama_cpp_dsp_tpu.parallel.sequence import (
        make_sp_cache, sp_decode_step, sp_fill_cache,
    )
    from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache

    cfg = tiny_config(n_layers=2, n_heads=4, n_kv_heads=2, head_dim=16,
                      n_embd=64, n_ff=128, n_vocab=96)
    params = jax.tree.map(jnp.asarray, synth_params(cfg, GGMLType.Q8_0, seed=9))
    rng = np.random.default_rng(2)
    b, t, cap, steps = 1, 24, 32, 5
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (b, t)), jnp.int32)
    mesh = _mesh(4)

    # --- reference: dense cache path -------------------------------------
    ref_cache = KVCache.create(cfg.n_layers, b, cap, cfg.n_kv_heads,
                               cfg.head_dim, dtype=jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    ref_logits, ref_cache = forward(
        params, cfg, tokens, positions, ref_cache, 0,
        causal_mask(positions, cap, 0), compute_dtype=jnp.float32)

    # --- sp path ----------------------------------------------------------
    logits, kv = sequence_parallel_prefill(
        params, cfg, tokens, mesh, compute_dtype=jnp.float32, return_kv=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    cache = sp_fill_cache(make_sp_cache(cfg, b, cap, mesh), kv, mesh)

    ref_np, sp_np = t, t
    tok_ref = jnp.argmax(ref_logits[:, -1:], axis=-1).astype(jnp.int32)
    tok_sp = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    assert int(tok_ref[0, 0]) == int(tok_sp[0, 0])
    for _ in range(steps):
        pos = jnp.full((b, 1), ref_np, jnp.int32)
        ref_logits1, ref_cache = forward(
            params, cfg, tok_ref, pos, ref_cache, ref_np,
            causal_mask(pos, cap, ref_np), compute_dtype=jnp.float32)
        sp_logits1, cache = sp_decode_step(
            params, cfg, cache, tok_sp, sp_np, mesh,
            compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(sp_logits1),
                                   np.asarray(ref_logits1),
                                   rtol=2e-4, atol=2e-4)
        ref_np += 1
        sp_np += 1
        tok_ref = jnp.argmax(ref_logits1, axis=-1).astype(jnp.int32)
        tok_sp = jnp.argmax(sp_logits1, axis=-1).astype(jnp.int32)
        assert int(tok_ref[0, 0]) == int(tok_sp[0, 0])


def test_ring_prefill_gqa_uneven_content(

):
    # heavier content: more heads, longer T per shard, check max-abs error
    cfg = tiny_config(n_layers=1, n_heads=8, n_kv_heads=4, head_dim=8,
                      n_embd=64, n_ff=96, n_vocab=64)
    params = jax.tree.map(jnp.asarray, synth_params(cfg, GGMLType.Q8_0, seed=3))
    rng = np.random.default_rng(1)
    b, t = 1, 64
    tokens = jnp.asarray(rng.integers(0, cfg.n_vocab, (b, t)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    ref, _ = forward(params, cfg, tokens, positions, None, 0,
                     causal_mask(positions, t, 0), compute_dtype=jnp.float32)
    got = sequence_parallel_prefill(params, cfg, tokens, _mesh(8),
                                    compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
