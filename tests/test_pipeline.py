"""Pipeline parallelism (GPipe over a 'pp' mesh axis): logits must match
the single-device forward exactly — the reference guarantees the same by
construction (sched pipeline copies are pure data movement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.models.registry import synth_config
from llama_cpp_dsp_tpu.parallel.pipeline import (
    pipeline_forward, shard_stage_params, stack_stages,
)
from llama_cpp_dsp_tpu.tools.synth import synth_params


def _dense(tree):
    from llama_cpp_dsp_tpu.ops.qtensor import QTensor
    from llama_cpp_dsp_tpu.quant.jax_dequant import dequant

    if isinstance(tree, dict):
        return {k: _dense(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_dense(v) for v in tree]
    if isinstance(tree, QTensor):
        return np.asarray(dequant(tree, jnp.float32))
    return tree


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_pipeline_matches_single_device():
    cfg = synth_config("llama", n_layers=4)
    params = _dense(synth_params(cfg, GGMLType.Q8_0, seed=0, tie=False))

    pp = 4
    mesh = Mesh(np.array(jax.devices()[:pp]), ("pp",))
    stacked = stack_stages(params["layers"], pp)
    stage_params = shard_stage_params(stacked, mesh)

    nm, mb, t = 3, 2, 5
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, cfg.n_vocab, (nm, mb, t)).astype(np.int32)

    logits = np.asarray(pipeline_forward(
        stage_params, jnp.asarray(params["token_embd"], jnp.float32),
        jnp.asarray(params["output_norm"], jnp.float32),
        jnp.asarray(params["output"], jnp.float32),
        cfg, jnp.asarray(tokens), mesh, nm,
    ))

    for m in range(nm):
        toks = tokens[m]
        pos = np.broadcast_to(np.arange(t, dtype=np.int32), (mb, t))
        mask = np.tril(np.ones((mb, t, t), bool))
        ref, _ = forward(params, cfg, jnp.asarray(toks), jnp.asarray(pos),
                         mask=mask, compute_dtype=jnp.float32)
        np.testing.assert_allclose(logits[m], np.asarray(ref),
                                   rtol=2e-4, atol=2e-4, err_msg=f"mb {m}")
