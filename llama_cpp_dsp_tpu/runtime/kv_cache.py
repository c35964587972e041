"""KV cache (functional, fixed-capacity).

Capability mirror of the reference's llama_kv_cache_unified
(src/llama-kv-cache.h:70-199) redesigned for XLA: a fixed-shape ring of
cells per layer that is functionally updated under jit (XLA turns the
donated updates in-place). Cell metadata (positions, seq membership) lives
in device arrays so masks are computed on device; the host-side engine
(runtime/context.py) performs slot allocation and sequence surgery
(seq_rm/cp/add/div) by rewriting the metadata arrays — the K/V payload never
round-trips to host.

Layout: [L, B, Hkv, S, D] — the sequence axis is innermost-but-one so each
(slot, head) streams contiguously from HBM into the flash-attention kernel.
The paged multi-sequence unified cache (seq_id sets per cell) arrives with
the batch engine.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: jax.Array  # [L, B, Hkv, S, D]
    v: jax.Array  # [L, B, Hkv, S, D]

    def tree_flatten(self):
        return (self.k, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layers, n_batch, n_ctx, n_kv_heads, head_dim, dtype=jnp.bfloat16):
        shape = (n_layers, n_batch, n_kv_heads, n_ctx, head_dim)
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    def write(self, layer: int, k_new: jax.Array, v_new: jax.Array, offset) -> "KVCache":
        """Insert [B, T, Hkv, D] at sequence offset.

        `offset` may be a scalar (same offset for the whole batch — prefill /
        single-sequence decode) or an int32 [B] vector (per-slot offsets for
        batched continuous decode, T must be 1)."""
        off = jnp.asarray(offset, jnp.int32)
        kn = k_new.transpose(0, 2, 1, 3).astype(self.k.dtype)  # [B,Hkv,T,D]
        vn = v_new.transpose(0, 2, 1, 3).astype(self.v.dtype)
        if off.ndim == 1:
            bi = jnp.arange(k_new.shape[0])
            k = self.k.at[layer, bi, :, off].set(kn[:, :, 0])
            v = self.v.at[layer, bi, :, off].set(vn[:, :, 0])
            return KVCache(k, v)
        zero = jnp.zeros((), jnp.int32)
        start = (zero + layer, zero, zero, off, zero)
        k = jax.lax.dynamic_update_slice(self.k, kn[None], start)
        v = jax.lax.dynamic_update_slice(self.v, vn[None], start)
        return KVCache(k, v)

    def layer(self, i: int) -> tuple[jax.Array, jax.Array]:
        """Returns (k, v) as [B, Hkv, S, D]."""
        return self.k[i], self.v[i]


def causal_mask(positions: jax.Array, n_kv: int, n_past) -> jax.Array:
    """[B, T] query positions → [B, T, n_kv] bool mask.

    Key cell j is attendable iff j < n_past + T (written) and j <= query pos.
    Matches the reference's kq_mask for the unified cache with contiguous
    slots (llm_graph_input_attn_kv_unified::set_input).
    """
    b, t = positions.shape
    j = jnp.arange(n_kv)
    written = j[None, None, :] < (jnp.asarray(n_past, jnp.int32) + t)
    causal = j[None, None, :] <= positions[:, :, None]
    return written & causal
