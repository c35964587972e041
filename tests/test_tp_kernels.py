"""shard_map tensor parallelism WITH the fused kernels
(parallel/tp_kernels): per-shard kernel layouts + psum after col-parallel
projections must reproduce the single-device packed forward exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.models.registry import synth_config
from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask
from llama_cpp_dsp_tpu.tools.synth import synth_params


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_kernel_decode_matches_single(tp):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from llama_cpp_dsp_tpu.parallel.tp_kernels import (
        make_tp_decode_step, shard_llama_kernel_params,
    )
    from llama_cpp_dsp_tpu.runtime.context import convert_params_to_kernel

    assert len(jax.devices()) >= tp
    cfg = synth_config("llama", n_embd=256, n_heads=4, n_kv_heads=4,
                       head_dim=64, n_ff=512, n_vocab=128)
    params = synth_params(cfg, GGMLType.Q8_0, seed=0, tie=False)
    n, n_ctx = 4, 32
    toks = np.array([[3, 9, 2, 7]], np.int32)
    pos = np.arange(n, dtype=np.int32)[None]

    # single-device packed-kernel reference
    kparams = convert_params_to_kernel(params)
    cache1 = KVCache.create(cfg.n_layers, 1, n_ctx, cfg.n_kv_heads,
                            cfg.head_dim)
    mask = causal_mask(jnp.asarray(pos), n_ctx, 0)
    ref, cache1 = forward(kparams, cfg, jnp.asarray(toks), jnp.asarray(pos),
                          cache1, 0, mask, compute_dtype=jnp.float32)

    # sharded kernel decode
    mesh = Mesh(np.array(jax.devices()[:tp]), ("tp",))
    stacked, specs = shard_llama_kernel_params(params, cfg, tp)
    w0 = stacked["layers"][0]["attn_q"]
    assert w0.sections == ("__tp__",)  # actually sharded
    with mesh:
        stacked = jax.tree.map(
            lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
            stacked, specs)
        cache = jax.tree.map(
            lambda a: jax.device_put(a, NamedSharding(
                mesh, P(None, "tp", None, None))),
            KVCache.create(cfg.n_layers, 1, n_ctx, cfg.n_kv_heads,
                           cfg.head_dim))
        step = make_tp_decode_step(cfg, mesh,
                                   compute_dtype=jnp.float32)(specs)
        logits, cache = step(stacked, cache, jnp.asarray(toks),
                             jnp.asarray(pos), jnp.int32(0))
    got = np.asarray(logits)
    np.testing.assert_allclose(got, np.asarray(ref), rtol=2e-4, atol=2e-4)

    # decode step at n_past=n, compare caches too
    k1, v1 = cache1.layer(0)
    k2 = cache.k[0]
    np.testing.assert_allclose(np.asarray(k2, np.float32)[:, :, :n],
                               np.asarray(k1, np.float32)[:, :, :n],
                               rtol=2e-4, atol=2e-4)
