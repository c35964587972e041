"""KV cache (functional, fixed-capacity).

Capability mirror of the reference's llama_kv_cache_unified
(src/llama-kv-cache.h:70-199) redesigned for XLA: a fixed-shape ring of
cells per layer that is functionally updated under jit (XLA turns the
donated updates in-place). Cell metadata (positions, seq membership) lives
in device arrays so masks are computed on device; the host-side engine
(runtime/context.py) performs slot allocation and sequence surgery
(seq_rm/cp/add/div) by rewriting the metadata arrays — the K/V payload never
round-trips to host.

Layout: per-layer tuples of [B, Hkv, S, D] (the reference's per-layer
`k_l/v_l` tensors, src/llama-kv-cache.h:184-185). Each layer is its own
buffer so (a) the flash-decode kernel's operand IS the layer array — a
stacked [L, ...] cache forced either a 2 MB slice copy per layer per step
or whole-cache copy-insertion against the in-place update (both measured
regressions), and (b) donation aliases layer-by-layer. The sequence axis
is innermost-but-one so each (slot, head) streams contiguously from HBM
into the flash-attention kernel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class KVCache:
    k: tuple  # L × [B, Hkv, S, D]
    v: tuple  # L × [B, Hkv, S, D]

    def tree_flatten(self):
        return (tuple(self.k), tuple(self.v)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layers, n_batch, n_ctx, n_kv_heads, head_dim, dtype=jnp.bfloat16):
        shape = (n_batch, n_kv_heads, n_ctx, head_dim)
        return cls(
            tuple(jnp.zeros(shape, dtype) for _ in range(n_layers)),
            tuple(jnp.zeros(shape, dtype) for _ in range(n_layers)),
        )

    @property
    def n_layers(self) -> int:
        return len(self.k)

    @property
    def dtype(self):
        return self.k[0].dtype

    @property
    def capacity(self) -> int:
        return self.k[0].shape[2]

    def _replace_layer(self, layer: int, k_l, v_l) -> "KVCache":
        k = list(self.k)
        v = list(self.v)
        k[layer] = k_l
        v[layer] = v_l
        return KVCache(tuple(k), tuple(v))

    def write(self, layer: int, k_new: jax.Array, v_new: jax.Array, offset) -> "KVCache":
        """Insert [B, T, Hkv, D] at sequence offset.

        `offset` may be a scalar (same offset for the whole batch — prefill /
        single-sequence decode) or an int32 [B] vector (per-slot offsets for
        batched continuous decode, T must be 1)."""
        off = jnp.asarray(offset, jnp.int32)
        kl, vl = self.k[layer], self.v[layer]
        kn = k_new.transpose(0, 2, 1, 3).astype(kl.dtype)  # [B,Hkv,T,D]
        vn = v_new.transpose(0, 2, 1, 3).astype(vl.dtype)
        if off.ndim == 1:
            # mode="drop": inactive slots write at offset == capacity so
            # their rows are untouched (the engine's batched decode carries
            # every slot; a 0 offset would clobber row 0 of idle slots'
            # prompt caches)
            bi = jnp.arange(k_new.shape[0])
            return self._replace_layer(
                layer,
                kl.at[bi, :, off].set(kn[:, :, 0], mode="drop"),
                vl.at[bi, :, off].set(vn[:, :, 0], mode="drop"),
            )
        zero = jnp.zeros((), jnp.int32)
        start = (zero, zero, off, zero)
        return self._replace_layer(
            layer,
            jax.lax.dynamic_update_slice(kl, kn, start),
            jax.lax.dynamic_update_slice(vl, vn, start),
        )

    def write_packed(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     slot_ids: jax.Array, rows: jax.Array) -> "KVCache":
        """Scatter [P, Hkv, D] new rows at (slot_ids[p], rows[p]) — the mixed
        prompt+decode ubatch (reference update_slots packs generating slots'
        tokens and prompt chunks into one llama_decode). Padding tokens carry
        rows == capacity and are dropped by the OOB scatter mode."""
        kl, vl = self.k[layer], self.v[layer]
        return self._replace_layer(
            layer,
            kl.at[slot_ids, :, rows].set(k_new.astype(kl.dtype), mode="drop"),
            vl.at[slot_ids, :, rows].set(v_new.astype(vl.dtype), mode="drop"),
        )

    def layer(self, i: int) -> tuple[jax.Array, jax.Array]:
        """Returns (k, v) as [B, Hkv, S, D] — the layer's own buffer, no
        slice copy."""
        return self.k[i], self.v[i]

    def slot_view(self, slot) -> "KVCache":
        """Single-slot [1, ...] per-layer views for per-slot prefill."""
        sl = jnp.asarray(slot, jnp.int32)
        return KVCache(
            tuple(jax.lax.dynamic_slice_in_dim(a, sl, 1, axis=0) for a in self.k),
            tuple(jax.lax.dynamic_slice_in_dim(a, sl, 1, axis=0) for a in self.v),
        )

    def merge_slot(self, sub: "KVCache", slot) -> "KVCache":
        sl = jnp.asarray(slot, jnp.int32)
        return KVCache(
            tuple(jax.lax.dynamic_update_slice_in_dim(a, s, sl, axis=0)
                  for a, s in zip(self.k, sub.k)),
            tuple(jax.lax.dynamic_update_slice_in_dim(a, s, sl, axis=0)
                  for a, s in zip(self.v, sub.v)),
        )

    # -- host-side (de)serialization helpers (state_io) ----------------------
    def stacked(self) -> tuple[jax.Array, jax.Array]:
        """([L,B,Hkv,S,D] k, v) — for host-side state export only."""
        return jnp.stack(self.k), jnp.stack(self.v)


def _q8_quant(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., D] f32/bf16 → (qs int8 [..., D], d f32 [...]).

    Same scheme as reference quantize_row_q8_0 (ggml/src/ggml-quants.c:194)
    with the block spanning the whole head dim (the TPU-native relayout: one
    scale per cached row keeps the flash kernel free of in-loop dequant —
    scores/probs are scaled by a lane-aligned [1, CHUNK] vector instead)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    d = amax / 127.0
    inv = jnp.where(d > 0, 1.0 / jnp.maximum(d, 1e-30), 0.0)
    qs = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]), -127, 127)
    return qs.astype(jnp.int8), d


def _q8_dequant(qs: jax.Array, d: jax.Array, dtype) -> jax.Array:
    return (qs.astype(jnp.float32) * d[..., None]).astype(dtype)


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantKVCache:
    """Q8_0-quantized KV cache — the reference's type_k/type_v=q8_0 option
    (src/llama-kv-cache.h:188-189, common/arg.cpp:699). Same interface as
    KVCache; payload is int8 + per-row scales (half the HBM traffic of
    bf16 at ~0.1% attention error). Per-layer tuples like KVCache."""

    k_qs: tuple  # L × [B, Hkv, S, D] int8
    k_d: tuple  # L × [B, Hkv, 1, S] f32 — lane-oriented for the kernel
    v_qs: tuple
    v_d: tuple

    def tree_flatten(self):
        return (tuple(self.k_qs), tuple(self.k_d),
                tuple(self.v_qs), tuple(self.v_d)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layers, n_batch, n_ctx, n_kv_heads, head_dim, dtype=None):
        shape = (n_batch, n_kv_heads, n_ctx, head_dim)
        dshape = (n_batch, n_kv_heads, 1, n_ctx)
        return cls(
            tuple(jnp.zeros(shape, jnp.int8) for _ in range(n_layers)),
            tuple(jnp.zeros(dshape, jnp.float32) for _ in range(n_layers)),
            tuple(jnp.zeros(shape, jnp.int8) for _ in range(n_layers)),
            tuple(jnp.zeros(dshape, jnp.float32) for _ in range(n_layers)),
        )

    @property
    def n_layers(self) -> int:
        return len(self.k_qs)

    @property
    def capacity(self) -> int:
        return self.k_qs[0].shape[2]

    def _replace_layer(self, layer: int, kq, kd, vq, vd) -> "QuantKVCache":
        arrays = [list(self.k_qs), list(self.k_d), list(self.v_qs), list(self.v_d)]
        for lst, a in zip(arrays, (kq, kd, vq, vd)):
            lst[layer] = a
        return QuantKVCache(*(tuple(lst) for lst in arrays))

    def write(self, layer: int, k_new: jax.Array, v_new: jax.Array, offset) -> "QuantKVCache":
        off = jnp.asarray(offset, jnp.int32)
        kq, kd = _q8_quant(k_new.transpose(0, 2, 1, 3))  # [B,Hkv,T,D], [B,Hkv,T]
        vq, vd = _q8_quant(v_new.transpose(0, 2, 1, 3))
        kql, kdl, vql, vdl = (self.k_qs[layer], self.k_d[layer],
                              self.v_qs[layer], self.v_d[layer])
        if off.ndim == 1:
            # mode="drop": see KVCache.write — offset == capacity rows are
            # idle slots and must not be scattered (clamping hits row S-1)
            bi = jnp.arange(k_new.shape[0])
            return self._replace_layer(
                layer,
                kql.at[bi, :, off].set(kq[:, :, 0], mode="drop"),
                kdl.at[bi, :, 0, off].set(kd[:, :, 0], mode="drop"),
                vql.at[bi, :, off].set(vq[:, :, 0], mode="drop"),
                vdl.at[bi, :, 0, off].set(vd[:, :, 0], mode="drop"),
            )
        zero = jnp.zeros((), jnp.int32)
        start = (zero, zero, off, zero)
        dstart = (zero, zero, zero, off)
        return self._replace_layer(
            layer,
            jax.lax.dynamic_update_slice(kql, kq, start),
            jax.lax.dynamic_update_slice(kdl, kd[:, :, None], dstart),
            jax.lax.dynamic_update_slice(vql, vq, start),
            jax.lax.dynamic_update_slice(vdl, vd[:, :, None], dstart),
        )

    def write_packed(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     slot_ids: jax.Array, rows: jax.Array) -> "QuantKVCache":
        """Packed-ubatch scatter (see KVCache.write_packed), quantizing rows."""
        kq, kd = _q8_quant(k_new)  # [P, Hkv, D], [P, Hkv]
        vq, vd = _q8_quant(v_new)
        return self._replace_layer(
            layer,
            self.k_qs[layer].at[slot_ids, :, rows].set(kq, mode="drop"),
            self.k_d[layer].at[slot_ids, :, 0, rows].set(kd, mode="drop"),
            self.v_qs[layer].at[slot_ids, :, rows].set(vq, mode="drop"),
            self.v_d[layer].at[slot_ids, :, 0, rows].set(vd, mode="drop"),
        )

    def layer(self, i: int) -> tuple[jax.Array, jax.Array]:
        """Dequantized (k, v) [B, Hkv, S, D] for the XLA attention path."""
        kd = self.k_d[i][:, :, 0, :]  # [B,Hkv,S]
        vd = self.v_d[i][:, :, 0, :]
        return (
            _q8_dequant(self.k_qs[i], kd, jnp.bfloat16),
            _q8_dequant(self.v_qs[i], vd, jnp.bfloat16),
        )

    def packed_layer(self, i: int):
        """(k_qs, k_d, v_qs, v_d) for the fused flash kernel."""
        return self.k_qs[i], self.k_d[i], self.v_qs[i], self.v_d[i]

    def slot_view(self, slot) -> "QuantKVCache":
        sl = jnp.asarray(slot, jnp.int32)
        return QuantKVCache(
            *(tuple(jax.lax.dynamic_slice_in_dim(a, sl, 1, axis=0) for a in field)
              for field in (self.k_qs, self.k_d, self.v_qs, self.v_d))
        )

    def merge_slot(self, sub: "QuantKVCache", slot) -> "QuantKVCache":
        sl = jnp.asarray(slot, jnp.int32)
        return QuantKVCache(
            *(tuple(jax.lax.dynamic_update_slice_in_dim(a, s, sl, axis=0)
                    for a, s in zip(field, sfield))
              for field, sfield in zip(
                  (self.k_qs, self.k_d, self.v_qs, self.v_d),
                  (sub.k_qs, sub.k_d, sub.v_qs, sub.v_d)))
        )


def _q4_groups(head_dim: int) -> int:
    """32-element scale groups along the head dim (reference block_q4_0,
    ggml-common.h); rows whose D isn't 32-divisible fall back to one group."""
    return head_dim // 32 if head_dim % 32 == 0 else 1


def _q4_quant(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., D] → (nibbles u8 [..., D] ∈ [0,15], d f32 [..., G]).

    Reference quantize_row_q4_0 semantics per 32-element GROUP
    (ggml-quants.c:52, ggml-common.h:150): d = signed_max / −8 so the full
    16-level code range is used; q = round(x/d)+8 ∈ [0,15]; unpack is
    (q&15)−8. Group-wise scales match the fidelity of the reference's
    type_k/type_v=q4_0 (per-row scales measurably lag it: KL 8.6e-3 vs
    6.7e-3 on the reference-anchored harness, scripts/kv_quality.py)."""
    xf = x.astype(jnp.float32)
    g = _q4_groups(x.shape[-1])
    xg = xf.reshape(*x.shape[:-1], g, x.shape[-1] // g)
    i = jnp.argmax(jnp.abs(xg), axis=-1, keepdims=True)
    mx = jnp.take_along_axis(xg, i, -1)  # signed max per group
    d = (mx / -8.0)[..., 0]
    inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
    # reference rounding is (int8_t)(x/d + 8.5f) — floor, i.e. round half
    # UP (ggml-quants.c quantize_row_q4_0_ref), not jnp.round's half-even
    q = jnp.clip(jnp.floor(xg * inv[..., None] + 8.5), 0, 15)
    return q.reshape(x.shape).astype(jnp.uint8), d


def _q4_pack_rows(q: jax.Array) -> jax.Array:
    """[..., 2*T2, D] nibbles → [..., T2, D] bytes: byte(s2,d) = row 2*s2
    (low nibble) | row 2*s2+1 << 4 (row-pair packing keeps the byte plane's
    lane dim = D, so flash DMAs stay 128-lane aligned)."""
    shp = q.shape
    pairs = q.reshape(*shp[:-2], shp[-2] // 2, 2, shp[-1])
    return (pairs[..., 0, :] | (pairs[..., 1, :] << 4)).astype(jnp.uint8)


def _q4_unpack_rows(b: jax.Array) -> jax.Array:
    """[..., S2, D] bytes → [..., 2*S2, D] signed int32 rows (−8..7)."""
    lo = (b.astype(jnp.int32) & 15) - 8
    hi = (b.astype(jnp.int32) >> 4) - 8
    shp = b.shape
    inter = jnp.stack([lo, hi], axis=-2)  # [..., S2, 2, D]
    return inter.reshape(*shp[:-2], shp[-2] * 2, shp[-1])


def _parity_to_rows(d: jax.Array) -> jax.Array:
    """Parity-major group scales [..., 2G, S/2] → row-major [..., S, G]
    (plane p·G+g at lane s2 holds the group-g scale of row 2·s2+p)."""
    *lead, twog, s2 = d.shape
    g = twog // 2
    dr = jnp.moveaxis(d.reshape(*lead, 2, g, s2), -1, -3)
    return dr.reshape(*lead, 2 * s2, g)


def _rows_to_parity(d: jax.Array) -> jax.Array:
    """Inverse of _parity_to_rows: [..., S, G] → [..., 2G, S/2]."""
    *lead, s, g = d.shape
    dr = d.reshape(*lead, s // 2, 2, g)
    return jnp.moveaxis(dr, -3, -1).reshape(*lead, 2 * g, s // 2)


def _q4_deq_plane(qs: jax.Array, d: jax.Array) -> jax.Array:
    """(byte plane [..., S/2, D], parity-major scales [..., 2G, S/2]) →
    dequantized rows [..., S, D] bf16."""
    rows = _q4_unpack_rows(qs).astype(jnp.float32)  # [..., S, D]
    dr = _parity_to_rows(d)
    g = dr.shape[-1]
    out = rows.reshape(*rows.shape[:-1], g, rows.shape[-1] // g) * dr[..., None]
    return out.reshape(rows.shape).astype(jnp.bfloat16)


def _q4_merge_scales(d, new_d, start2, row_off, nb):
    """Splice T new per-row group scales into a parity-major plane
    [B,H,2G,S/2] at byte-row start2 (+ in-slab row offset row_off)."""
    bsz, hkv, twog, _ = d.shape
    g = twog // 2
    dslab = jax.lax.dynamic_slice(d, (0, 0, 0, start2), (bsz, hkv, 2 * g, nb))
    # plane p*G+g at lane s2 ↔ row-major [2nb, G]: [B,H,2,G,nb]→[B,H,nb,2,G]
    drows = (dslab.reshape(bsz, hkv, 2, g, nb).transpose(0, 1, 4, 2, 3)
             .reshape(bsz, hkv, 2 * nb, g))
    drows = jax.lax.dynamic_update_slice(drows, new_d, (0, 0, row_off, 0))
    dslab = (drows.reshape(bsz, hkv, nb, 2, g).transpose(0, 1, 3, 4, 2)
             .reshape(bsz, hkv, 2 * g, nb))
    return jax.lax.dynamic_update_slice(d, dslab, (0, 0, 0, start2))


@jax.tree_util.register_pytree_node_class
@dataclass
class Q4KVCache:
    """Q4_0-quantized KV cache (reference --cache-type-k q4_0) — quarter the
    bf16 bytes. Payload packs ROW PAIRS: byte plane [B, Hkv, S/2, D] (row
    2s2 in the low nibble, 2s2+1 high) so DMA slices keep the 128-lane D
    axis; scales ride parity-major planes [B, Hkv, 2*G, S/2] f32 where
    G = D/32 (plane p*G+g holds the group-g scale of rows with parity p —
    reference block_q4_0's 32-element groups, ggml-common.h:150). The flash
    q4 kernel consumes both directly; layer() unpacks for the XLA path."""

    k_qs: tuple  # L × [B, Hkv, S/2, D] u8
    k_d: tuple  # L × [B, Hkv, 2*G, S/2] f32
    v_qs: tuple
    v_d: tuple

    def tree_flatten(self):
        return (tuple(self.k_qs), tuple(self.k_d),
                tuple(self.v_qs), tuple(self.v_d)), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layers, n_batch, n_ctx, n_kv_heads, head_dim, dtype=None):
        assert n_ctx % 2 == 0, n_ctx
        shape = (n_batch, n_kv_heads, n_ctx // 2, head_dim)
        dshape = (n_batch, n_kv_heads, 2 * _q4_groups(head_dim), n_ctx // 2)
        return cls(
            tuple(jnp.zeros(shape, jnp.uint8) for _ in range(n_layers)),
            tuple(jnp.zeros(dshape, jnp.float32) for _ in range(n_layers)),
            tuple(jnp.zeros(shape, jnp.uint8) for _ in range(n_layers)),
            tuple(jnp.zeros(dshape, jnp.float32) for _ in range(n_layers)),
        )

    @property
    def n_layers(self) -> int:
        return len(self.k_qs)

    @property
    def capacity(self) -> int:
        return self.k_qs[0].shape[2] * 2

    def _replace_layer(self, layer: int, kq, kd, vq, vd) -> "Q4KVCache":
        arrays = [list(self.k_qs), list(self.k_d), list(self.v_qs), list(self.v_d)]
        for lst, a in zip(arrays, (kq, kd, vq, vd)):
            lst[layer] = a
        return Q4KVCache(*(tuple(lst) for lst in arrays))

    @staticmethod
    def _merge_row(qs, d, new_q, new_d, off):
        """Merge T new nibble rows into the packed plane at scalar offset
        `off` (traced): read the covering byte slab, unpack, splice, repack.
        new_q [B,H,T,D] u8 nibbles, new_d [B,H,T,G]."""
        bsz, hkv, t, dd = new_q.shape
        s2 = qs.shape[2]
        nb = min(t // 2 + 1, s2)  # byte rows covering T rows at either parity
        # clamp so the slab never runs past the plane (dynamic_slice would
        # silently shift it and misalign every row by 2)
        start2 = jnp.clip(off // 2, 0, s2 - nb)
        row_off = off - 2 * start2  # in-slab row index of the first new row
        slab = jax.lax.dynamic_slice(qs, (0, 0, start2, 0), (bsz, hkv, nb, dd))
        rows = _q4_unpack_rows(slab) + 8  # [B,H,2nb,D] back to nibble codes
        rows = jax.lax.dynamic_update_slice(
            rows, new_q.astype(jnp.int32), (0, 0, row_off, 0))
        qs = jax.lax.dynamic_update_slice(
            qs, _q4_pack_rows(rows.astype(jnp.uint8)), (0, 0, start2, 0))
        d = _q4_merge_scales(d, new_d, start2, row_off, nb)
        return qs, d

    def write(self, layer: int, k_new: jax.Array, v_new: jax.Array, offset) -> "Q4KVCache":
        off = jnp.asarray(offset, jnp.int32)
        kq, kd = _q4_quant(k_new.transpose(0, 2, 1, 3))  # [B,H,T,D],[B,H,T]
        vq, vd = _q4_quant(v_new.transpose(0, 2, 1, 3))
        kql, kdl, vql, vdl = (self.k_qs[layer], self.k_d[layer],
                              self.v_qs[layer], self.v_d[layer])
        s2 = kql.shape[2]
        if off.ndim == 1:
            # batched decode: per-slot single rows; idle slots carry
            # off == capacity → r2 == S/2 → dropped by the OOB scatter
            bi = jnp.arange(k_new.shape[0])
            r2 = off // 2
            par = (off % 2)[:, None, None]  # [B,1,1]
            safe = jnp.clip(r2, 0, s2 - 1)

            def merge(plane, q1):
                old = plane[bi, :, safe]  # [B,H,D]
                q1 = q1[:, :, 0].astype(jnp.uint8)
                byte = jnp.where(par == 0,
                                 (old & 0xF0) | q1,
                                 (old & 0x0F) | (q1 << 4))
                return plane.at[bi, :, r2].set(byte, mode="drop")

            ng = kd.shape[-1]
            planes = (off % 2)[:, None] * ng + jnp.arange(ng)[None, :]  # [B,G]
            return self._replace_layer(
                layer,
                merge(kql, kq),
                kdl.at[bi[:, None], :, planes, r2[:, None]].set(
                    kd[:, :, 0].transpose(0, 2, 1), mode="drop"),
                merge(vql, vq),
                vdl.at[bi[:, None], :, planes, r2[:, None]].set(
                    vd[:, :, 0].transpose(0, 2, 1), mode="drop"),
            )
        kql, kdl = self._merge_row(kql, kdl, kq, kd, off)
        vql, vdl = self._merge_row(vql, vdl, vq, vd, off)
        return self._replace_layer(layer, kql, kdl, vql, vdl)

    def write_packed(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     slot_ids: jax.Array, rows: jax.Array) -> "Q4KVCache":
        """Packed-ubatch scatter with in-batch sibling resolution: when both
        rows of a byte land in one ubatch, each token takes its sibling's
        nibble from the BATCH (a plain read-modify-write would race)."""
        kq, kd = _q4_quant(k_new)  # [P,H,D] nibbles, [P,H]
        vq, vd = _q4_quant(v_new)
        kql, kdl, vql, vdl = (self.k_qs[layer], self.k_d[layer],
                              self.v_qs[layer], self.v_d[layer])
        s2 = kql.shape[2]
        p = rows.shape[0]
        r2 = rows // 2
        par = (rows % 2)[:, None, None]
        safe = jnp.clip(r2, 0, s2 - 1)
        sib = ((slot_ids[:, None] == slot_ids[None, :])
               & ((rows[:, None] ^ 1) == rows[None, :])
               & (rows[:, None] < self.capacity))  # [P,P]
        sibf = sib.astype(jnp.int32)
        has_sib = sib.any(axis=1)[:, None, None]

        def merge(plane, q):
            q = q.astype(jnp.int32)
            old = plane[slot_ids, :, safe].astype(jnp.int32)  # [P,H,D]
            sib_q = jnp.einsum("ij,jhd->ihd", sibf, q)
            other = jnp.where(has_sib, sib_q,
                              jnp.where(par == 0, old >> 4, old & 0x0F))
            byte = jnp.where(par == 0, q | (other << 4), other | (q << 4))
            return plane.at[slot_ids, :, r2].set(byte.astype(jnp.uint8),
                                                 mode="drop")

        ng = kd.shape[-1]
        planes = (rows % 2)[:, None] * ng + jnp.arange(ng)[None, :]  # [P,G]
        return self._replace_layer(
            layer,
            merge(kql, kq),
            kdl.at[slot_ids[:, None], :, planes, r2[:, None]].set(
                kd.transpose(0, 2, 1), mode="drop"),
            merge(vql, vq),
            vdl.at[slot_ids[:, None], :, planes, r2[:, None]].set(
                vd.transpose(0, 2, 1), mode="drop"),
        )

    def layer(self, i: int) -> tuple[jax.Array, jax.Array]:
        """Dequantized (k, v) [B, Hkv, S, D] bf16 for the XLA path."""
        return (_q4_deq_plane(self.k_qs[i], self.k_d[i]),
                _q4_deq_plane(self.v_qs[i], self.v_d[i]))

    def packed_layer(self, i: int):
        """(k_qs, k_d, v_qs, v_d) for the fused q4 flash kernel."""
        return self.k_qs[i], self.k_d[i], self.v_qs[i], self.v_d[i]

    def slot_view(self, slot) -> "Q4KVCache":
        sl = jnp.asarray(slot, jnp.int32)
        return Q4KVCache(
            *(tuple(jax.lax.dynamic_slice_in_dim(a, sl, 1, axis=0) for a in field)
              for field in (self.k_qs, self.k_d, self.v_qs, self.v_d))
        )

    def merge_slot(self, sub: "Q4KVCache", slot) -> "Q4KVCache":
        sl = jnp.asarray(slot, jnp.int32)
        return Q4KVCache(
            *(tuple(jax.lax.dynamic_update_slice_in_dim(a, s, sl, axis=0)
                    for a, s in zip(field, sfield))
              for field, sfield in zip(
                  (self.k_qs, self.k_d, self.v_qs, self.v_d),
                  (sub.k_qs, sub.k_d, sub.v_qs, sub.v_d)))
        )


# -- independent K/V cache types (reference -ctk/-ctv, common/arg.cpp:699) ----
#
# One PLANE (K or V) of a MixedKVCache: format-tagged field dict whose
# write/dequant paths reuse the same quant helpers as the homogeneous cache
# classes above. Mixed combinations (e.g. q8_0 K + q4_0 V — more bits where
# quantization hurts more) run attention on the XLA dequant path; the
# homogeneous fast paths keep their dedicated fused kernels.


def _q4_1_quant(x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """[..., D] → (codes u8 ∈[0,15], d f32 [..., G], m f32 [..., G]):
    reference quantize_row_q4_1 per 32-group (ggml-quants.c:82): d =
    (max−min)/15, m = min, q = round((x−m)/d)."""
    xf = x.astype(jnp.float32)
    g = _q4_groups(x.shape[-1])
    xg = xf.reshape(*x.shape[:-1], g, x.shape[-1] // g)
    mn = jnp.min(xg, axis=-1)
    mx = jnp.max(xg, axis=-1)
    d = (mx - mn) / 15.0
    inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
    q = jnp.clip(jnp.floor((xg - mn[..., None]) * inv[..., None] + 0.5), 0, 15)
    return q.reshape(x.shape).astype(jnp.uint8), d, mn


def _q5_0_quant(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., D] → (codes u8 ∈[0,31], d f32 [..., G]): reference
    quantize_row_q5_0_ref per 32-group (ggml-quants.c): d = signed_max/−16,
    q = floor(x/d + 16.5) ∈ [0,31]; value = (q−16)·d."""
    xf = x.astype(jnp.float32)
    g = _q4_groups(x.shape[-1])
    xg = xf.reshape(*x.shape[:-1], g, x.shape[-1] // g)
    i = jnp.argmax(jnp.abs(xg), axis=-1, keepdims=True)
    mx = jnp.take_along_axis(xg, i, -1)
    d = (mx / -16.0)[..., 0]
    inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
    q = jnp.clip(jnp.floor(xg * inv[..., None] + 16.5), 0, 31)
    return q.reshape(x.shape).astype(jnp.uint8), d


def _q5_1_quant(x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """[..., D] → (codes u8 ∈[0,31], d, m): reference quantize_row_q5_1_ref
    per 32-group: d = (max−min)/31, m = min, q = floor((x−m)/d + 0.5);
    value = q·d + m."""
    xf = x.astype(jnp.float32)
    g = _q4_groups(x.shape[-1])
    xg = xf.reshape(*x.shape[:-1], g, x.shape[-1] // g)
    mn = jnp.min(xg, axis=-1)
    mx = jnp.max(xg, axis=-1)
    d = (mx - mn) / 31.0
    inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
    q = jnp.clip(jnp.floor((xg - mn[..., None]) * inv[..., None] + 0.5), 0, 31)
    return q.reshape(x.shape).astype(jnp.uint8), d, mn


def _iq4nl_quant(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[..., D] → (codes u8 ∈[0,15], d f32 [..., G]): iq4_nl nonlinear
    codebook per 32-group (ggml-quants.c kvalues_iq4nl). Fast path for KV
    writes: d = signed_max/−127 (kvalues[0]) + nearest-codebook assignment;
    the reference's offline ±ntry scale refine is skipped (the refine is a
    weight-quantization nicety; KV rows are quantized once per token)."""
    from ..quant.ref_numpy import KVALUES_IQ4NL

    xf = x.astype(jnp.float32)
    g = _q4_groups(x.shape[-1])
    xg = xf.reshape(*x.shape[:-1], g, x.shape[-1] // g)
    i = jnp.argmax(jnp.abs(xg), axis=-1, keepdims=True)
    mx = jnp.take_along_axis(xg, i, -1)
    d = (mx / -127.0)[..., 0]
    inv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
    scaled = xg * inv[..., None]
    lut = jnp.asarray(KVALUES_IQ4NL, jnp.float32)
    codes = jnp.argmin(jnp.abs(scaled[..., None] - lut), axis=-1)
    return codes.reshape(x.shape).astype(jnp.uint8), d


def _pack_bit_plane(bits: jax.Array) -> jax.Array:
    """[..., D] 0/1 → [..., D/8] u8 (bit e%8 of byte e//8 holds elem e)."""
    shp = bits.shape
    b8 = bits.astype(jnp.int32).reshape(*shp[:-1], shp[-1] // 8, 8)
    w = (1 << jnp.arange(8, dtype=jnp.int32))
    return jnp.sum(b8 * w, axis=-1).astype(jnp.uint8)


def _unpack_bit_plane(qh: jax.Array) -> jax.Array:
    """[..., D/8] u8 → [..., D] int32 0/1 (inverse of _pack_bit_plane)."""
    bits = (qh[..., None].astype(jnp.int32) >> jnp.arange(8)) & 1
    return bits.reshape(*qh.shape[:-1], qh.shape[-1] * 8)


_DENSE_DTYPES = {"f32": jnp.float32, "f16": jnp.float16, "bf16": jnp.bfloat16}
# nibble-plane formats: row-pair packed low 4 bits + parity-major scales
# (+ optional 5th-bit plane 'qh' and per-group min 'm')
_PACKED_KV_FORMATS = ("q4_0", "q4_1", "q5_0", "q5_1", "iq4_nl")
KV_PLANE_FORMATS = ("f32", "f16", "bf16", "q8_0") + _PACKED_KV_FORMATS


def _plane_rowquant(fmt: str, x: jax.Array) -> dict:
    """[..., D] dense rows → per-row plane fields for the packed formats:
    'q' low-nibble codes u8 [..., D], 'd' scales [..., G], optional 'm'
    mins [..., G], optional 'qh' 5th-bit plane u8 [..., D/8]."""
    if fmt == "q4_0":
        q, d = _q4_quant(x)
        return {"q": q, "d": d}
    if fmt == "q4_1":
        q, d, m = _q4_1_quant(x)
        return {"q": q, "d": d, "m": m}
    if fmt == "iq4_nl":
        q, d = _iq4nl_quant(x)
        return {"q": q, "d": d}
    if fmt == "q5_0":
        q, d = _q5_0_quant(x)
        return {"q": (q & 15).astype(jnp.uint8),
                "qh": _pack_bit_plane(q >> 4), "d": d}
    q, d, m = _q5_1_quant(x)
    return {"q": (q & 15).astype(jnp.uint8),
            "qh": _pack_bit_plane(q >> 4), "d": d, "m": m}


def _packed_deq_plane(fmt: str, arrs: dict, i: int) -> jax.Array:
    """One layer of a packed nibble plane → dequantized [B, Hkv, S, D]
    bf16 (XLA attention path)."""
    from ..quant.ref_numpy import KVALUES_IQ4NL

    codes = _q4_unpack_rows(arrs["qs"][i]) + 8  # [..., S, D] raw 0..15
    if "qh" in arrs:
        qh_rows = _unpack_bit_plane(arrs["qh"][i])
        codes = codes + (qh_rows << 4)  # 0..31
    dr = _parity_to_rows(arrs["d"][i])
    g = dr.shape[-1]
    if fmt == "iq4_nl":
        vals = jnp.asarray(KVALUES_IQ4NL, jnp.float32)[codes]
    elif fmt in ("q4_1", "q5_1"):
        vals = codes.astype(jnp.float32)
    else:
        vals = (codes - (8 if fmt == "q4_0" else 16)).astype(jnp.float32)
    vg = vals.reshape(*vals.shape[:-1], g, vals.shape[-1] // g)
    out = vg * dr[..., None]
    if "m" in arrs:
        out = out + _parity_to_rows(arrs["m"][i])[..., None]
    return out.reshape(vals.shape).astype(jnp.bfloat16)


def _plane_create(fmt, n_layers, n_batch, n_ctx, n_kv_heads, head_dim):
    if fmt in _DENSE_DTYPES:
        shape = (n_batch, n_kv_heads, n_ctx, head_dim)
        return {"x": tuple(jnp.zeros(shape, _DENSE_DTYPES[fmt])
                           for _ in range(n_layers))}
    if fmt == "q8_0":
        shape = (n_batch, n_kv_heads, n_ctx, head_dim)
        dshape = (n_batch, n_kv_heads, 1, n_ctx)
        return {"qs": tuple(jnp.zeros(shape, jnp.int8) for _ in range(n_layers)),
                "d": tuple(jnp.zeros(dshape, jnp.float32) for _ in range(n_layers))}
    if fmt in _PACKED_KV_FORMATS:
        assert n_ctx % 2 == 0, n_ctx
        shape = (n_batch, n_kv_heads, n_ctx // 2, head_dim)
        dshape = (n_batch, n_kv_heads, 2 * _q4_groups(head_dim), n_ctx // 2)
        out = {"qs": tuple(jnp.zeros(shape, jnp.uint8) for _ in range(n_layers)),
               "d": tuple(jnp.zeros(dshape, jnp.float32) for _ in range(n_layers))}
        if fmt in ("q4_1", "q5_1"):
            out["m"] = tuple(jnp.zeros(dshape, jnp.float32)
                             for _ in range(n_layers))
        if fmt in ("q5_0", "q5_1"):
            assert head_dim % 8 == 0, head_dim
            hshape = (n_batch, n_kv_heads, n_ctx, head_dim // 8)
            out["qh"] = tuple(jnp.zeros(hshape, jnp.uint8)
                              for _ in range(n_layers))
        return out
    raise ValueError(f"unknown KV plane format {fmt!r}")


def _plane_capacity(fmt, arrs) -> int:
    if fmt in _PACKED_KV_FORMATS:
        return arrs["qs"][0].shape[2] * 2
    return arrs["x" if fmt in _DENSE_DTYPES else "qs"][0].shape[2]


def _set_layer(arrs, layer, **news):
    out = {}
    for key, tup in arrs.items():
        lst = list(tup)
        if key in news:
            lst[layer] = news[key]
        out[key] = tuple(lst)
    return out


def _plane_write(fmt, arrs, layer, new, offset):
    """new [B, H, T, D] (already head-major); offset scalar or [B] rows."""
    off = jnp.asarray(offset, jnp.int32)
    if fmt in _DENSE_DTYPES:
        pl_ = arrs["x"][layer]
        nn = new.astype(pl_.dtype)
        if off.ndim == 1:
            bi = jnp.arange(new.shape[0])
            return _set_layer(arrs, layer,
                              x=pl_.at[bi, :, off].set(nn[:, :, 0], mode="drop"))
        zero = jnp.zeros((), jnp.int32)
        return _set_layer(arrs, layer, x=jax.lax.dynamic_update_slice(
            pl_, nn, (zero, zero, off, zero)))
    if fmt == "q8_0":
        qs, d = _q8_quant(new)
        ql, dl = arrs["qs"][layer], arrs["d"][layer]
        if off.ndim == 1:
            bi = jnp.arange(new.shape[0])
            return _set_layer(
                arrs, layer,
                qs=ql.at[bi, :, off].set(qs[:, :, 0], mode="drop"),
                d=dl.at[bi, :, 0, off].set(d[:, :, 0], mode="drop"))
        zero = jnp.zeros((), jnp.int32)
        return _set_layer(
            arrs, layer,
            qs=jax.lax.dynamic_update_slice(ql, qs, (zero, zero, off, zero)),
            d=jax.lax.dynamic_update_slice(dl, d[:, :, None],
                                           (zero, zero, zero, off)))
    # row-pair packed nibble planes (q4_0/q4_1/q5_0/q5_1/iq4_nl)
    f = _plane_rowquant(fmt, new)
    q, d = f["q"], f["d"]
    ql, dl = arrs["qs"][layer], arrs["d"][layer]
    s2 = ql.shape[2]
    if off.ndim == 1:
        bi = jnp.arange(new.shape[0])
        r2 = off // 2
        par = (off % 2)[:, None, None]
        safe = jnp.clip(r2, 0, s2 - 1)
        old = ql[bi, :, safe]
        q1 = q[:, :, 0].astype(jnp.uint8)
        byte = jnp.where(par == 0, (old & 0xF0) | q1, (old & 0x0F) | (q1 << 4))
        ng = d.shape[-1]
        planes = (off % 2)[:, None] * ng + jnp.arange(ng)[None, :]
        news = {"qs": ql.at[bi, :, r2].set(byte, mode="drop"),
                "d": dl.at[bi[:, None], :, planes, r2[:, None]].set(
                    d[:, :, 0].transpose(0, 2, 1), mode="drop")}
        if "m" in f:
            news["m"] = arrs["m"][layer].at[
                bi[:, None], :, planes, r2[:, None]].set(
                f["m"][:, :, 0].transpose(0, 2, 1), mode="drop")
        if "qh" in f:
            news["qh"] = arrs["qh"][layer].at[bi, :, off].set(
                f["qh"][:, :, 0], mode="drop")
        return _set_layer(arrs, layer, **news)
    qs_new, d_new = Q4KVCache._merge_row(ql, dl, q, d, off)
    news = {"qs": qs_new, "d": d_new}
    if "m" in f:
        t = q.shape[2]
        nb = min(t // 2 + 1, s2)
        start2 = jnp.clip(off // 2, 0, s2 - nb)
        news["m"] = _q4_merge_scales(arrs["m"][layer], f["m"], start2,
                                     off - 2 * start2, nb)
    if "qh" in f:
        news["qh"] = jax.lax.dynamic_update_slice(
            arrs["qh"][layer], f["qh"], (jnp.zeros((), jnp.int32),
                                         jnp.zeros((), jnp.int32), off,
                                         jnp.zeros((), jnp.int32)))
    return _set_layer(arrs, layer, **news)


def _plane_write_packed(fmt, arrs, layer, new, slot_ids, rows, capacity):
    """Packed-ubatch scatter: new [P, H, D] at (slot_ids[p], rows[p])."""
    if fmt in _DENSE_DTYPES:
        pl_ = arrs["x"][layer]
        return _set_layer(arrs, layer, x=pl_.at[slot_ids, :, rows].set(
            new.astype(pl_.dtype), mode="drop"))
    if fmt == "q8_0":
        qs, d = _q8_quant(new)
        return _set_layer(
            arrs, layer,
            qs=arrs["qs"][layer].at[slot_ids, :, rows].set(qs, mode="drop"),
            d=arrs["d"][layer].at[slot_ids, :, 0, rows].set(d, mode="drop"))
    f = _plane_rowquant(fmt, new)
    q, d = f["q"], f["d"]
    ql = arrs["qs"][layer]
    s2 = ql.shape[2]
    r2 = rows // 2
    par = (rows % 2)[:, None, None]
    safe = jnp.clip(r2, 0, s2 - 1)
    sib = ((slot_ids[:, None] == slot_ids[None, :])
           & ((rows[:, None] ^ 1) == rows[None, :])
           & (rows[:, None] < capacity))
    sibf = sib.astype(jnp.int32)
    has_sib = sib.any(axis=1)[:, None, None]
    qi = q.astype(jnp.int32)
    old = ql[slot_ids, :, safe].astype(jnp.int32)
    sib_q = jnp.einsum("ij,jhd->ihd", sibf, qi)
    other = jnp.where(has_sib, sib_q,
                      jnp.where(par == 0, old >> 4, old & 0x0F))
    byte = jnp.where(par == 0, qi | (other << 4), other | (qi << 4))
    ng = d.shape[-1]
    planes = (rows % 2)[:, None] * ng + jnp.arange(ng)[None, :]
    news = {"qs": ql.at[slot_ids, :, r2].set(byte.astype(jnp.uint8),
                                             mode="drop"),
            "d": arrs["d"][layer].at[slot_ids[:, None], :, planes,
                                     r2[:, None]].set(
                d.transpose(0, 2, 1), mode="drop")}
    if "m" in f:
        news["m"] = arrs["m"][layer].at[slot_ids[:, None], :, planes,
                                        r2[:, None]].set(
            f["m"].transpose(0, 2, 1), mode="drop")
    if "qh" in f:
        news["qh"] = arrs["qh"][layer].at[slot_ids, :, rows].set(
            f["qh"], mode="drop")
    return _set_layer(arrs, layer, **news)


def _plane_layer(fmt, arrs, i):
    """Dequantized [B, Hkv, S, D] for the XLA attention path."""
    if fmt in _DENSE_DTYPES:
        return arrs["x"][i]
    if fmt == "q8_0":
        return _q8_dequant(arrs["qs"][i], arrs["d"][i][:, :, 0, :],
                           jnp.bfloat16)
    return _packed_deq_plane(fmt, arrs, i)


@jax.tree_util.register_pytree_node_class
class MixedKVCache:
    """KV cache with INDEPENDENT K and V formats (reference -ctk/-ctv,
    common/arg.cpp:699: the K and V cache types are separate options).
    Any pair from KV_PLANE_FORMATS; attention runs on the XLA dequant path
    (cache.layer() materializes bf16 views per layer), so this class trades
    peak decode speed for the memory/quality operating points the
    homogeneous fused caches don't cover (e.g. q8_0 K + q4_0 V, or q4_1)."""

    def __init__(self, k_fmt: str, v_fmt: str, k_arrs: dict, v_arrs: dict):
        self.k_fmt = k_fmt
        self.v_fmt = v_fmt
        self.k_arrs = k_arrs
        self.v_arrs = v_arrs

    def tree_flatten(self):
        kk = tuple(sorted(self.k_arrs))
        vk = tuple(sorted(self.v_arrs))
        children = tuple(self.k_arrs[k] for k in kk) + tuple(
            self.v_arrs[k] for k in vk)
        return children, (self.k_fmt, self.v_fmt, kk, vk)

    @classmethod
    def tree_unflatten(cls, aux, children):
        k_fmt, v_fmt, kk, vk = aux
        return cls(k_fmt, v_fmt,
                   dict(zip(kk, children[:len(kk)])),
                   dict(zip(vk, children[len(kk):])))

    @classmethod
    def create(cls, n_layers, n_batch, n_ctx, n_kv_heads, head_dim,
               k_fmt="q8_0", v_fmt="q4_0"):
        return cls(k_fmt, v_fmt,
                   _plane_create(k_fmt, n_layers, n_batch, n_ctx,
                                 n_kv_heads, head_dim),
                   _plane_create(v_fmt, n_layers, n_batch, n_ctx,
                                 n_kv_heads, head_dim))

    @property
    def n_layers(self) -> int:
        return len(next(iter(self.k_arrs.values())))

    @property
    def capacity(self) -> int:
        return _plane_capacity(self.k_fmt, self.k_arrs)

    def write(self, layer, k_new, v_new, offset) -> "MixedKVCache":
        kn = k_new.transpose(0, 2, 1, 3)  # [B,T,H,D] → [B,H,T,D]
        vn = v_new.transpose(0, 2, 1, 3)
        return MixedKVCache(
            self.k_fmt, self.v_fmt,
            _plane_write(self.k_fmt, self.k_arrs, layer, kn, offset),
            _plane_write(self.v_fmt, self.v_arrs, layer, vn, offset))

    def write_packed(self, layer, k_new, v_new, slot_ids, rows) -> "MixedKVCache":
        cap = self.capacity
        return MixedKVCache(
            self.k_fmt, self.v_fmt,
            _plane_write_packed(self.k_fmt, self.k_arrs, layer, k_new,
                                slot_ids, rows, cap),
            _plane_write_packed(self.v_fmt, self.v_arrs, layer, v_new,
                                slot_ids, rows, cap))

    def layer(self, i: int):
        return (_plane_layer(self.k_fmt, self.k_arrs, i),
                _plane_layer(self.v_fmt, self.v_arrs, i))

    def _map(self, fn) -> "MixedKVCache":
        return MixedKVCache(
            self.k_fmt, self.v_fmt,
            {k: tuple(fn(a) for a in tup) for k, tup in self.k_arrs.items()},
            {k: tuple(fn(a) for a in tup) for k, tup in self.v_arrs.items()})

    def slot_view(self, slot) -> "MixedKVCache":
        sl = jnp.asarray(slot, jnp.int32)
        return self._map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, sl, 1, axis=0))

    def merge_slot(self, sub: "MixedKVCache", slot) -> "MixedKVCache":
        sl = jnp.asarray(slot, jnp.int32)
        out_k = {k: tuple(jax.lax.dynamic_update_slice_in_dim(a, s, sl, axis=0)
                          for a, s in zip(tup, sub.k_arrs[k]))
                 for k, tup in self.k_arrs.items()}
        out_v = {k: tuple(jax.lax.dynamic_update_slice_in_dim(a, s, sl, axis=0)
                          for a, s in zip(tup, sub.v_arrs[k]))
                 for k, tup in self.v_arrs.items()}
        return MixedKVCache(self.k_fmt, self.v_fmt, out_k, out_v)


def _plane_encode_full(fmt, rows: jax.Array) -> dict:
    """[B, Hkv, S, D] dense rows → one layer's plane arrays (cache-surgery
    re-encode path, runtime/cache_ops.apply_seq_edit)."""
    if fmt in _DENSE_DTYPES:
        return {"x": rows.astype(_DENSE_DTYPES[fmt])}
    if fmt == "q8_0":
        qs, d = _q8_quant(rows)
        return {"qs": qs, "d": d[:, :, None, :]}
    f = _plane_rowquant(fmt, rows)
    out = {"qs": _q4_pack_rows(f["q"]), "d": _rows_to_parity(f["d"])}
    if "m" in f:
        out["m"] = _rows_to_parity(f["m"])
    if "qh" in f:
        out["qh"] = f["qh"]
    return out


def _norm_kv_type(t: str) -> str:
    return {"q8": "q8_0", "q4": "q4_0"}.get(t, t)


def make_kv_cache(n_layers, n_batch, n_ctx, n_kv_heads, head_dim,
                  kv_type="bf16", v_type=None):
    """kv_type/-ctk: any of KV_PLANE_FORMATS — the full reference type set
    (common/arg.cpp:699-708: f32/f16/bf16/q8_0/q4_0/q4_1/q5_0/q5_1/iq4_nl);
    v_type/-ctv defaults to kv_type. Homogeneous f/q8/q4_0 pairs get the
    dedicated fused-kernel cache classes; any other combination (split
    K/V types, or q4_1/q5_0/q5_1/iq4_nl) gets a MixedKVCache on the XLA
    attention path."""
    kv_type = _norm_kv_type(kv_type)
    v_type = _norm_kv_type(v_type or kv_type)
    if v_type != kv_type or kv_type in ("q4_1", "q5_0", "q5_1", "iq4_nl"):
        return MixedKVCache.create(n_layers, n_batch, n_ctx, n_kv_heads,
                                   head_dim, kv_type, v_type)
    if kv_type == "q8_0":
        return QuantKVCache.create(n_layers, n_batch, n_ctx, n_kv_heads, head_dim)
    if kv_type == "q4_0":
        return Q4KVCache.create(n_layers, n_batch, n_ctx, n_kv_heads, head_dim)
    dt = _DENSE_DTYPES[kv_type]
    return KVCache.create(n_layers, n_batch, n_ctx, n_kv_heads, head_dim, dt)


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
