"""On-device token sampling (top-k → top-p → min-p → temp → categorical).

The reference samples host-side on full logits (src/llama-sampling.cpp);
through a remote-relay PJRT backend that costs a [V]-float device→host copy
per token (~512 KB at llama3 vocab). For the common stateless chain the
whole pipeline runs on-chip and only the sampled token id leaves the device.
Semantics mirror the host chain exactly (llama_sampler_top_k/top_p/min_p/
temp/dist order, common/sampling.cpp default chain); the only divergence is
the RNG (jax.random vs numpy Generator), which changes draws but not the
distribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# top-k sizes above this fall back to the host path (a full-vocab sort per
# token would erase the transfer win)
MAX_DEVICE_TOP_K = 512


@functools.partial(jax.jit, static_argnames=("top_k",))
def sample_logits(
    logits: jax.Array,  # [B, V] f32
    key: jax.Array,
    temp: jax.Array,  # [B] or scalar f32 (>0)
    *,
    top_k: int,
    top_p: jax.Array,  # scalar f32
    min_p: jax.Array,  # scalar f32
) -> jax.Array:
    """→ sampled token ids [B] int32. top-p/min-p thresholds are computed on
    UNtempered logits (the reference chain applies temp after the filters:
    common_sampler_init order, common/sampling.cpp)."""
    vals, idx = jax.lax.top_k(logits, top_k)  # sorted desc [B, K]
    probs0 = jax.nn.softmax(vals, axis=-1)
    cum_before = jnp.cumsum(probs0, axis=-1) - probs0
    keep = cum_before < top_p  # keep through the first cum >= p crossing
    # min-p: threshold on the max probability (llama_sampler_min_p unsorted
    # path: logit >= max_logit + log(p))
    keep &= vals >= vals[:, :1] + jnp.log(jnp.maximum(min_p, 1e-30))
    keep = keep.at[:, 0].set(True)  # min_keep=1
    t = jnp.maximum(jnp.asarray(temp, jnp.float32), 1e-6)
    t = jnp.broadcast_to(t, (vals.shape[0],))[:, None]
    masked = jnp.where(keep, vals / t, -jnp.inf)
    choice = jax.random.categorical(key, masked, axis=-1)  # [B]
    return jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0].astype(
        jnp.int32)
