"""Pipeline parallelism over a "pp" mesh axis (GPipe schedule).

Capability mirror of the reference scheduler's pipeline parallelism
(ggml-backend.cpp:620-666: layer-split across devices with up to 4 in-flight
micro-batch copies and events), designed TPU-first: layers are partitioned
into contiguous stages sharded over a `pp` mesh axis; micro-batches flow
through the stages with `jax.lax.ppermute` ring transfers riding ICI, all
under one `shard_map` — XLA overlaps each stage's compute with its
neighbour transfers exactly like the reference's event-synced split copies.

Scope: prefill / scoring (the compute-bound phase where pipelining pays);
layers must be homogeneous (one lax.scan body per stage). Decode stays on
the tensor-parallel path (latency-bound, no micro-batch to overlap).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import LlamaConfig, decode_layer, norm
from ..ops import take_rows


def stack_stages(layers: list[dict], pp: int) -> dict:
    """Per-layer param dicts → one pytree with leading [pp, L/pp] axes.
    Requires homogeneous layers (same keys/shapes — plain llama stacks)."""
    n = len(layers)
    assert n % pp == 0, (n, pp)
    keys = set(layers[0].keys())
    for la in layers[1:]:
        assert set(la.keys()) == keys, "pipeline stages need homogeneous layers"
    per = n // pp

    def stack(key):
        a = np.stack([np.asarray(la[key]) for la in layers])  # [n, ...]
        return a.reshape(pp, per, *a.shape[1:])

    return {k: stack(k) for k in sorted(keys)}


def shard_stage_params(stacked: dict, mesh: Mesh) -> dict:
    sh = NamedSharding(mesh, P("pp"))
    return {k: jax.device_put(jnp.asarray(v), sh) for k, v in stacked.items()}


@partial(jax.jit, static_argnames=("cfg", "n_micro", "mesh"))
def pipeline_forward(
    stage_params: dict,  # leaves [pp, L/pp, ...] sharded over "pp"
    token_embd,  # replicated [V, C]
    output_norm,  # replicated [C]
    output_w,  # replicated [V, C]
    cfg: LlamaConfig,
    tokens: jax.Array,  # [n_micro, mb, T]
    mesh: Mesh,
    n_micro: int,
):
    """GPipe prefill: returns logits [n_micro, mb, T, V] f32."""
    pp = mesh.shape["pp"]
    nm, mb, t = tokens.shape

    def run_stage(params_stage, x):
        """x [mb, T, C] through this stage's L/pp layers via lax.scan."""
        positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (mb, t))
        mask = jnp.tril(jnp.ones((mb, t, t), bool))

        def body(x, layer):
            x, _ = decode_layer(
                x, layer, cfg, positions, None, 0, 0, mask, x.dtype,
            )
            return x, None

        x, _ = jax.lax.scan(body, x, params_stage)
        return x

    def stage_fn(params_stage, tokens_):
        params_stage = jax.tree.map(lambda a: a[0], params_stage)  # [L/pp,...]
        sid = jax.lax.axis_index("pp")
        buf = jnp.zeros((mb, t, cfg.n_embd), jnp.float32)
        out = jnp.zeros((nm, mb, t, token_embd.shape[0]), jnp.float32)

        def step(carry, i):
            buf, out = carry
            m = i - sid  # microbatch this stage works on at tick i
            active = (m >= 0) & (m < nm)
            # stage 0 embeds its microbatch; others use the received buffer
            midx = jnp.clip(m, 0, nm - 1)
            embd = take_rows(token_embd, tokens_[midx], dtype=jnp.float32)
            if cfg.embd_scale != 1.0:
                embd = embd * cfg.embd_scale
            x_in = jnp.where(sid == 0, embd, buf)
            y = run_stage(params_stage, x_in)
            y = jnp.where(active, y, buf)
            # last stage: record logits for its finished microbatch
            is_last = sid == pp - 1
            h = norm(y, {"output_norm": output_norm}, "output_norm", cfg)
            logits = (h @ output_w.T.astype(jnp.float32))
            out = jax.lax.cond(
                active & is_last,
                lambda o: o.at[midx].set(logits),
                lambda o: o,
                out,
            )
            # ring transfer: stage s → s+1 (last stage's send is discarded)
            buf = jax.lax.ppermute(
                y, "pp", [(s, (s + 1) % pp) for s in range(pp)]
            )
            return (buf, out), None

        (buf, out), _ = jax.lax.scan(
            step, (buf, out), jnp.arange(nm + pp - 1))
        # only the last stage holds real logits; psum broadcasts them
        out = jnp.where(sid == pp - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "pp")

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("pp"), stage_params), P()),
        out_specs=P(),
        check_rep=False,
    )
    return fn(stage_params, tokens)
