"""KV-cache sequence surgery.

Capability mirror of the reference's llama_kv_self_seq_rm/cp/add/div +
K-shift machinery (src/llama-kv-cache.cpp seq_* and the has_shift rope-shift
graph in src/llama-context.cpp:737-791), redesigned functionally for XLA:

- cells move via a single gather along the sequence axis (the reference's
  defrag/move-plan becomes one take_along_axis),
- position rebasing re-rotates cached K in place using the additive-angle
  property of RoPE (rope(p)·rope(Δ) = rope(p+Δ)) — same trick as the
  reference's K-shift graph, as one jitted op over all layers,
- no host round-trips: the K/V payload stays on device.

Used by: CLI/server context-shift (evict oldest, keep prefix), self-extend
grouped attention (seq_div, examples/main/main.cpp:481-520), slot-to-slot
copy (seq_cp) for prompt-cache reuse.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.rope import RopeParams, _rope_angles
from .kv_cache import KVCache, QuantKVCache, _q8_dequant, _q8_quant


def _rotate_cached_k(
    k: jax.Array, deltas: jax.Array, rope: RopeParams, freq_factors=None
) -> jax.Array:
    """k [B, H, S, D], deltas [B, S] int32 → K rotated by rope(delta).

    Mirrors ggml_rope_ext applied to the cache in the reference's K-shift
    graph (build_rope_shift): only the first rope.n_dims dims rotate. The
    attention mscale must not reapply (it would rescale K), so attn_factor
    is forced to 1."""
    import dataclasses

    n = rope.n_dims
    if n == 0:
        return k
    rope = dataclasses.replace(rope, attn_factor=1.0)
    cos, sin = _rope_angles(deltas.astype(jnp.float32), rope, freq_factors)
    cos = cos[:, None, :, :]  # [B,1,S,n/2]
    sin = sin[:, None, :, :]
    kf = k.astype(jnp.float32)
    rot, rest = kf[..., :n], kf[..., n:]
    if rope.mode == "norm":
        x0, x1 = rot[..., 0::2], rot[..., 1::2]
        y0 = x0 * cos - x1 * sin
        y1 = x0 * sin + x1 * cos
        out = jnp.stack([y0, y1], axis=-1).reshape(rot.shape)
    else:  # neox
        half = n // 2
        x0, x1 = rot[..., :half], rot[..., half:]
        out = jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
    if rest.shape[-1]:
        out = jnp.concatenate([out, rest], axis=-1)
    return out.astype(k.dtype)


def _gather_seq(a: jax.Array, idx: jax.Array) -> jax.Array:
    """a [B, H, S, ...], idx [B, S] → rows reordered along S per batch."""
    return jax.vmap(  # over B
        lambda ab, ib: jnp.take(ab, ib, axis=1), in_axes=(0, 0)
    )(a, idx)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("rope",))
def _shift_kv(cache: KVCache, src_idx, deltas, rope: RopeParams, freq_factors=None):
    k = tuple(
        _rotate_cached_k(_gather_seq(kl, src_idx), deltas, rope, freq_factors)
        for kl in cache.k
    )
    v = tuple(_gather_seq(vl, src_idx) for vl in cache.v)
    return KVCache(k, v)


@partial(jax.jit, donate_argnums=(0,), static_argnames=("rope",))
def _shift_qkv(cache: QuantKVCache, src_idx, deltas, rope: RopeParams, freq_factors=None):
    k_qs, k_d, v_qs, v_d = [], [], [], []
    for kql, kdl, vql, vdl in zip(cache.k_qs, cache.k_d, cache.v_qs, cache.v_d):
        kq = _gather_seq(kql, src_idx)
        kd = _gather_seq(kdl.swapaxes(2, 3), src_idx).swapaxes(2, 3)
        # rotate: dequant → rope(Δ) → requant (scales refresh)
        kf = _q8_dequant(kq, kd[:, :, 0, :], jnp.float32)
        kf = _rotate_cached_k(kf, deltas, rope, freq_factors)
        kq, kd2 = _q8_quant(kf)
        k_qs.append(kq)
        k_d.append(kd2[:, :, None, :])
        v_qs.append(_gather_seq(vql, src_idx))
        v_d.append(_gather_seq(vdl.swapaxes(2, 3), src_idx).swapaxes(2, 3))
    return QuantKVCache(tuple(k_qs), tuple(k_d), tuple(v_qs), tuple(v_d))


@partial(jax.jit, donate_argnums=(0,), static_argnames=("rope",))
def _shift_q4(cache, src_idx, deltas, rope: RopeParams, freq_factors=None):
    """Q4 cache surgery: dequant → gather/rotate → requant+repack. The
    whole-cache round-trip is fine here — seq edits are rare control-path
    events (context-shift/self-extend), not per-token."""
    from .kv_cache import Q4KVCache, _q4_pack_rows, _q4_quant

    k_qs, k_d, v_qs, v_d = [], [], [], []
    for i in range(cache.n_layers):
        kf, vf = cache.layer(i)  # [B,H,S,D] bf16
        kf = _rotate_cached_k(_gather_seq(kf.astype(jnp.float32), src_idx),
                              deltas, rope, freq_factors)
        vf = _gather_seq(vf, src_idx)
        for dst_q, dst_d, rows in ((k_qs, k_d, kf), (v_qs, v_d, vf)):
            q, d = _q4_quant(rows)  # [B,H,S,D] nibbles, [B,H,S,G]
            dst_q.append(_q4_pack_rows(q))
            b, h, s, g = d.shape
            # rows-major [S, G] → parity-major planes [2G, S/2]
            dst_d.append(d.reshape(b, h, s // 2, 2, g)
                         .transpose(0, 1, 3, 4, 2).reshape(b, h, 2 * g, s // 2))
    return Q4KVCache(tuple(k_qs), tuple(k_d), tuple(v_qs), tuple(v_d))


def _shift_mixed(cache, src_idx, deltas, rope: RopeParams, freq_factors=None):
    """Mixed K/V-type cache surgery: dequant → gather/rotate → re-encode
    each plane in its own format (control-path event, whole-cache
    round-trip is fine)."""
    from .kv_cache import MixedKVCache, _plane_encode_full

    k_layers, v_layers = [], []
    for i in range(cache.n_layers):
        kf, vf = cache.layer(i)
        kf = _rotate_cached_k(_gather_seq(kf.astype(jnp.float32), src_idx),
                              deltas, rope, freq_factors)
        vf = _gather_seq(vf, src_idx)
        k_layers.append(_plane_encode_full(cache.k_fmt, kf))
        v_layers.append(_plane_encode_full(cache.v_fmt, vf))
    k_arrs = {key: tuple(d[key] for d in k_layers) for key in k_layers[0]}
    v_arrs = {key: tuple(d[key] for d in v_layers) for key in v_layers[0]}
    return MixedKVCache(cache.k_fmt, cache.v_fmt, k_arrs, v_arrs)


def apply_seq_edit(cache, src_idx, deltas, rope: RopeParams, freq_factors=None):
    """Reorder cells (src_idx [B,S]: new row j takes old row src_idx[b,j])
    and rebase positions (deltas [B,S]: rope angle shift per NEW row)."""
    from .kv_cache import MixedKVCache, Q4KVCache

    if isinstance(cache, MixedKVCache):
        fn = _shift_mixed
    elif isinstance(cache, Q4KVCache):
        fn = _shift_q4
    else:
        fn = _shift_qkv if isinstance(cache, QuantKVCache) else _shift_kv
    return fn(cache, jnp.asarray(src_idx, jnp.int32),
              jnp.asarray(deltas, jnp.int32), rope, freq_factors)


def context_shift_indices(capacity: int, n_keep: int, n_discard: int):
    """Index/delta plan for evicting n_discard cells after the first n_keep —
    the reference's context-shift (seq_rm + seq_add,
    examples/main/main.cpp:619, server.cpp:2879-2911)."""
    import numpy as np

    j = np.arange(capacity)
    src = np.where(j < n_keep, j, np.minimum(j + n_discard, capacity - 1))
    deltas = np.where(j >= n_keep, -n_discard, 0)
    return src[None, :], deltas[None, :]


def self_extend_indices(capacity: int, n_past: int, ga_i: int, ga_n: int, ga_w: int):
    """Grouped self-extend position plan (seq_add/seq_div dance of
    examples/main/main.cpp:481-520): positions in [ga_i, n_past) are divided
    by ga_n within a window of ga_w. Returns (src_idx, deltas) with rows in
    place (src = identity) and deltas = new_pos - old_pos."""
    import numpy as np

    j = np.arange(capacity)
    ib = ga_i // ga_n
    new_pos = np.where(
        j < ga_i, j,
        np.where(j < ga_i + ga_w, ib + (j - ga_i) // ga_n, j - (ga_w - ga_w // ga_n)),
    )
    deltas = np.where((j >= ga_i) & (j < n_past), new_pos - j, 0)
    return j[None, :], deltas[None, :]


@partial(jax.jit, donate_argnums=(0,))
def _copy_slot_jit(cache, src_slot, dst_slot):
    def cp(a):
        row = jax.lax.dynamic_slice_in_dim(a, src_slot, 1, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(a, row, dst_slot, axis=0)

    return jax.tree.map(cp, cache)


def copy_slot(cache, src_slot: int, dst_slot: int):
    """seq_cp: duplicate one slot's cells into another slot (prompt-cache
    reuse across slots, reference llama_kv_self_seq_cp). One jitted dispatch
    over all per-layer buffers (host-side callers pay one launch, not 2L)."""
    return _copy_slot_jit(cache, jnp.int32(src_slot), jnp.int32(dst_slot))
