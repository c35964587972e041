"""Paged KV cache with shared-prefix page aliasing.

The BASELINE north-star's "llama_kv_cache paged KV-cache" TPU-natively:
K/V live in fixed per-layer page pools `[P, Hkv, page_size, D]` (a tuple of
L buffers — like runtime/kv_cache.py, each layer owns its buffer so the
paged flash kernel's pool operand needs no per-layer slice copy and the
per-step scatter updates alias in place under donation); each sequence owns
a block table of page ids. Shared prompt prefixes alias the same pages
(reference llama_kv_self_seq_cp's cell sharing, src/llama-kv-cache.h:46-65
seq_id sets) with host-side refcounts and copy-on-write for the first
partially-filled page. Token writes route through the device-resident block
tables, so cache payloads never round-trip to host.

Decode attention reads pages directly via the paged flash kernel
(ops/pallas/attention.flash_decode_paged — block tables ride the scalar
prefetch); the XLA fallback gathers pages into a dense view.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, donate_argnums=(0,))
def _copy_page_jit(cache, src, dst):
    """One dispatch copying page src → dst in every per-layer pool buffer
    (COW is on the serving hot path; 2L host launches would swamp it)."""

    def cp(a):
        row = jax.lax.dynamic_slice_in_dim(a, src, 1, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(a, row, dst, axis=0)

    pools, tables = cache
    return jax.tree.map(cp, pools), tables


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVCache:
    k: tuple  # L × [P, Hkv, ps, D] — page pools ("P" includes no sentinel)
    v: tuple
    tables: jax.Array  # [B, max_blocks] int32 page ids (P = unmapped)

    def tree_flatten(self):
        return (tuple(self.k), tuple(self.v), self.tables), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layers, n_pages, n_seqs, max_blocks, n_kv_heads,
               head_dim, page_size=128, dtype=jnp.bfloat16):
        shape = (n_pages, n_kv_heads, page_size, head_dim)
        return cls(
            tuple(jnp.zeros(shape, dtype) for _ in range(n_layers)),
            tuple(jnp.zeros(shape, dtype) for _ in range(n_layers)),
            jnp.full((n_seqs, max_blocks), n_pages, jnp.int32),
        )

    @property
    def page_size(self) -> int:
        return self.k[0].shape[2]

    @property
    def n_pages(self) -> int:
        return self.k[0].shape[0]

    @property
    def n_layers(self) -> int:
        return len(self.k)

    @property
    def capacity(self) -> int:
        """Max per-sequence length (max_blocks × page_size)."""
        return self.tables.shape[1] * self.page_size

    def _replace_layer(self, layer: int, k_l, v_l) -> "PagedKVCache":
        k = list(self.k)
        v = list(self.v)
        k[layer] = k_l
        v[layer] = v_l
        return PagedKVCache(tuple(k), tuple(v), self.tables)

    def write_packed(self, layer: int, k_new: jax.Array, v_new: jax.Array,
                     slot_ids: jax.Array, rows: jax.Array) -> "PagedKVCache":
        """Scatter [Ptok, Hkv, D] rows at (slot, pos) through the block
        tables. rows >= capacity ⇒ padding (maps to sentinel page = n_pages,
        dropped by the OOB scatter)."""
        ps = self.page_size
        blk = jnp.minimum(rows // ps, self.tables.shape[1] - 1)
        pages = self.tables[slot_ids, blk]  # [Ptok]
        pages = jnp.where(rows < self.capacity, pages, self.n_pages)
        rin = rows % ps
        kl, vl = self.k[layer], self.v[layer]
        return self._replace_layer(
            layer,
            kl.at[pages, :, rin].set(k_new.astype(kl.dtype), mode="drop"),
            vl.at[pages, :, rin].set(v_new.astype(vl.dtype), mode="drop"),
        )

    def write(self, layer: int, k_new: jax.Array, v_new: jax.Array,
              offset) -> "PagedKVCache":
        """[B, T, Hkv, D] per-slot write at `offset` ([B] vector or scalar);
        engine decode path compatibility."""
        b, t = k_new.shape[:2]
        off = jnp.asarray(offset, jnp.int32)
        if off.ndim == 0:
            off = jnp.full((b,), off, jnp.int32)
        rows = off[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]  # [B,T]
        slot_ids = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None],
                                    (b, t))
        return self.write_packed(
            layer, k_new.reshape(b * t, *k_new.shape[2:]),
            v_new.reshape(b * t, *v_new.shape[2:]),
            slot_ids.reshape(-1), rows.reshape(-1),
        )

    def layer(self, i: int) -> tuple[jax.Array, jax.Array]:
        """Dense per-sequence gather view [B, Hkv, S, D] (XLA fallback path;
        the paged flash kernel reads pages in place instead)."""
        safe = jnp.minimum(self.tables, self.n_pages - 1)  # unmapped → pad
        kg = self.k[i][safe]  # [B, blocks, Hkv, ps, D]
        vg = self.v[i][safe]
        b, nb, hkv, ps, d = kg.shape
        k = kg.transpose(0, 2, 1, 3, 4).reshape(b, hkv, nb * ps, d)
        v = vg.transpose(0, 2, 1, 3, 4).reshape(b, hkv, nb * ps, d)
        return k, v

    def gather_seq(self, seq: int) -> tuple[jax.Array, jax.Array]:
        """One sequence's dense KV [L, 1, Hkv, S, D] (for sequence surgery —
        context shift gathers, edits, then scatter_seq writes back)."""
        safe = jnp.minimum(self.tables[seq], self.n_pages - 1)

        def one(pool):
            g = pool[safe]  # [blocks, Hkv, ps, D]
            nb, hkv, ps, d = g.shape
            return g.transpose(1, 0, 2, 3).reshape(1, hkv, nb * ps, d)

        return (jnp.stack([one(kl) for kl in self.k]),
                jnp.stack([one(vl) for vl in self.v]))

    def scatter_seq(self, seq: int, k: jax.Array, v: jax.Array) -> "PagedKVCache":
        """Write a dense [L, 1, Hkv, S, D] view back into the sequence's
        pages (pages must be exclusively owned — COW first)."""
        l, _, hkv, s, d = k.shape
        ps = self.page_size
        nb = s // ps
        pages = jnp.minimum(self.tables[seq, :nb], self.n_pages - 1)
        ks, vs = [], []
        for i in range(l):
            kp = k[i, 0].reshape(hkv, nb, ps, d).transpose(1, 0, 2, 3)
            vp = v[i, 0].reshape(hkv, nb, ps, d).transpose(1, 0, 2, 3)
            ks.append(self.k[i].at[pages].set(kp.astype(self.k[i].dtype)))
            vs.append(self.v[i].at[pages].set(vp.astype(self.v[i].dtype)))
        return PagedKVCache(tuple(ks), tuple(vs), self.tables)

    def copy_page(self, src: int, dst: int) -> "PagedKVCache":
        """Copy-on-write support: duplicate one page's payload."""
        (k, v), tables = _copy_page_jit(
            ((self.k, self.v), self.tables), jnp.int32(src), jnp.int32(dst))
        return PagedKVCache(k, v, tables)

    def set_table_row(self, seq: int, row: np.ndarray) -> "PagedKVCache":
        return PagedKVCache(
            self.k, self.v,
            self.tables.at[seq].set(jnp.asarray(row, jnp.int32)),
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedQuantKVCache:
    """Q8_0-quantized paged cache — pages of int8 rows with per-row scales
    (same relayout as QuantKVCache: scales lane-oriented [..., 1, ps] so the
    paged q8 flash kernel folds dequant into score/prob scaling). Per-layer
    pool tuples like PagedKVCache."""

    k_qs: tuple  # L × [P, Hkv, ps, D] int8
    k_d: tuple  # L × [P, Hkv, 1, ps] f32
    v_qs: tuple
    v_d: tuple
    tables: jax.Array  # [B, max_blocks] int32

    def tree_flatten(self):
        return (tuple(self.k_qs), tuple(self.k_d),
                tuple(self.v_qs), tuple(self.v_d), self.tables), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layers, n_pages, n_seqs, max_blocks, n_kv_heads,
               head_dim, page_size=128, dtype=None):
        shape = (n_pages, n_kv_heads, page_size, head_dim)
        dshape = (n_pages, n_kv_heads, 1, page_size)
        return cls(
            tuple(jnp.zeros(shape, jnp.int8) for _ in range(n_layers)),
            tuple(jnp.zeros(dshape, jnp.float32) for _ in range(n_layers)),
            tuple(jnp.zeros(shape, jnp.int8) for _ in range(n_layers)),
            tuple(jnp.zeros(dshape, jnp.float32) for _ in range(n_layers)),
            jnp.full((n_seqs, max_blocks), n_pages, jnp.int32),
        )

    @property
    def page_size(self) -> int:
        return self.k_qs[0].shape[2]

    @property
    def n_pages(self) -> int:
        return self.k_qs[0].shape[0]

    @property
    def n_layers(self) -> int:
        return len(self.k_qs)

    @property
    def capacity(self) -> int:
        return self.tables.shape[1] * self.page_size

    def _replace_layer(self, layer: int, kq, kd, vq, vd) -> "PagedQuantKVCache":
        arrays = [list(self.k_qs), list(self.k_d), list(self.v_qs), list(self.v_d)]
        for lst, a in zip(arrays, (kq, kd, vq, vd)):
            lst[layer] = a
        return PagedQuantKVCache(*(tuple(lst) for lst in arrays), self.tables)

    def write_packed(self, layer: int, k_new, v_new, slot_ids, rows):
        from .kv_cache import _q8_quant

        ps = self.page_size
        blk = jnp.minimum(rows // ps, self.tables.shape[1] - 1)
        pages = self.tables[slot_ids, blk]
        pages = jnp.where(rows < self.capacity, pages, self.n_pages)
        rin = rows % ps
        kq, kd = _q8_quant(k_new)  # [Ptok, Hkv, D], [Ptok, Hkv]
        vq, vd = _q8_quant(v_new)
        return self._replace_layer(
            layer,
            self.k_qs[layer].at[pages, :, rin].set(kq, mode="drop"),
            self.k_d[layer].at[pages, :, 0, rin].set(kd, mode="drop"),
            self.v_qs[layer].at[pages, :, rin].set(vq, mode="drop"),
            self.v_d[layer].at[pages, :, 0, rin].set(vd, mode="drop"),
        )

    def write(self, layer: int, k_new, v_new, offset):
        b, t = k_new.shape[:2]
        off = jnp.asarray(offset, jnp.int32)
        if off.ndim == 0:
            off = jnp.full((b,), off, jnp.int32)
        rows = off[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        slot_ids = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], (b, t))
        return self.write_packed(
            layer, k_new.reshape(b * t, *k_new.shape[2:]),
            v_new.reshape(b * t, *v_new.shape[2:]),
            slot_ids.reshape(-1), rows.reshape(-1),
        )

    def layer(self, i: int):
        """Dequantized dense gather view [B, Hkv, S, D] (XLA fallback)."""
        from .kv_cache import _q8_dequant

        safe = jnp.minimum(self.tables, self.n_pages - 1)
        kq = self.k_qs[i][safe]  # [B, blocks, Hkv, ps, D]
        kd = self.k_d[i][safe][:, :, :, 0, :]  # [B, blocks, Hkv, ps]
        vq = self.v_qs[i][safe]
        vd = self.v_d[i][safe][:, :, :, 0, :]
        b, nb, hkv, ps, d = kq.shape
        k = _q8_dequant(kq, kd, jnp.bfloat16).transpose(0, 2, 1, 3, 4)
        v = _q8_dequant(vq, vd, jnp.bfloat16).transpose(0, 2, 1, 3, 4)
        return k.reshape(b, hkv, nb * ps, d), v.reshape(b, hkv, nb * ps, d)

    def packed_pages(self, i: int):
        """(k_qs, k_d, v_qs, v_d) page pools for the paged q8 flash kernel."""
        return self.k_qs[i], self.k_d[i], self.v_qs[i], self.v_d[i]

    def gather_seq(self, seq: int):
        """Dense bf16 KV [L, 1, Hkv, S, D] for sequence surgery."""
        from .kv_cache import _q8_dequant

        safe = jnp.minimum(self.tables[seq], self.n_pages - 1)

        def one(qpool, dpool):
            q = qpool[safe]  # [blocks, Hkv, ps, D]
            d_ = dpool[safe][:, :, 0, :]  # [blocks, Hkv, ps]
            nb, hkv, ps, d = q.shape
            out = _q8_dequant(q, d_, jnp.bfloat16).transpose(1, 0, 2, 3)
            return out.reshape(1, hkv, nb * ps, d)

        return (jnp.stack([one(q, s) for q, s in zip(self.k_qs, self.k_d)]),
                jnp.stack([one(q, s) for q, s in zip(self.v_qs, self.v_d)]))

    def scatter_seq(self, seq: int, k, v):
        from .kv_cache import _q8_quant

        l, _, hkv, s, d = k.shape
        ps = self.page_size
        nb = s // ps
        pages = jnp.minimum(self.tables[seq, :nb], self.n_pages - 1)
        kqs, kds, vqs, vds = (list(self.k_qs), list(self.k_d),
                              list(self.v_qs), list(self.v_d))
        for i in range(l):
            kq, kd = _q8_quant(k[i, 0])  # [Hkv, S, D] → int8 + [Hkv, S]
            vq, vd = _q8_quant(v[i, 0])
            kqp = kq.reshape(hkv, nb, ps, d).transpose(1, 0, 2, 3)
            kdp = kd.reshape(hkv, nb, ps).transpose(1, 0, 2)[:, :, None, :]
            vqp = vq.reshape(hkv, nb, ps, d).transpose(1, 0, 2, 3)
            vdp = vd.reshape(hkv, nb, ps).transpose(1, 0, 2)[:, :, None, :]
            kqs[i] = kqs[i].at[pages].set(kqp)
            kds[i] = kds[i].at[pages].set(kdp)
            vqs[i] = vqs[i].at[pages].set(vqp)
            vds[i] = vds[i].at[pages].set(vdp)
        return PagedQuantKVCache(tuple(kqs), tuple(kds), tuple(vqs),
                                 tuple(vds), self.tables)

    def copy_page(self, src: int, dst: int):
        pools = (self.k_qs, self.k_d, self.v_qs, self.v_d)
        pools, tables = _copy_page_jit(
            (pools, self.tables), jnp.int32(src), jnp.int32(dst))
        return PagedQuantKVCache(*pools, tables)

    def set_table_row(self, seq: int, row: np.ndarray):
        return PagedQuantKVCache(
            self.k_qs, self.k_d, self.v_qs, self.v_d,
            self.tables.at[seq].set(jnp.asarray(row, jnp.int32)),
        )


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedQ4KVCache:
    """Q4_0-quantized paged cache: pages pack ROW PAIRS like the contiguous
    Q4KVCache (byte plane [P, Hkv, ps/2, D], parity-major group scales
    [P, Hkv, 2*G, ps/2], G = D/32) — quarter the bf16 page bytes, lane dims
    128-aligned. Interface mirrors PagedQuantKVCache."""

    k_qs: tuple  # L × [P, Hkv, ps/2, D] u8
    k_d: tuple  # L × [P, Hkv, 2*G, ps/2] f32
    v_qs: tuple
    v_d: tuple
    tables: jax.Array  # [B, max_blocks] int32

    def tree_flatten(self):
        return (tuple(self.k_qs), tuple(self.k_d),
                tuple(self.v_qs), tuple(self.v_d), self.tables), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layers, n_pages, n_seqs, max_blocks, n_kv_heads,
               head_dim, page_size=128, dtype=None):
        from .kv_cache import _q4_groups

        assert page_size % 2 == 0, page_size
        shape = (n_pages, n_kv_heads, page_size // 2, head_dim)
        dshape = (n_pages, n_kv_heads, 2 * _q4_groups(head_dim),
                  page_size // 2)
        return cls(
            tuple(jnp.zeros(shape, jnp.uint8) for _ in range(n_layers)),
            tuple(jnp.zeros(dshape, jnp.float32) for _ in range(n_layers)),
            tuple(jnp.zeros(shape, jnp.uint8) for _ in range(n_layers)),
            tuple(jnp.zeros(dshape, jnp.float32) for _ in range(n_layers)),
            jnp.full((n_seqs, max_blocks), n_pages, jnp.int32),
        )

    @property
    def page_size(self) -> int:
        return self.k_qs[0].shape[2] * 2

    @property
    def n_pages(self) -> int:
        return self.k_qs[0].shape[0]

    @property
    def n_layers(self) -> int:
        return len(self.k_qs)

    @property
    def capacity(self) -> int:
        return self.tables.shape[1] * self.page_size

    def _replace_layer(self, layer: int, kq, kd, vq, vd) -> "PagedQ4KVCache":
        arrays = [list(self.k_qs), list(self.k_d), list(self.v_qs), list(self.v_d)]
        for lst, a in zip(arrays, (kq, kd, vq, vd)):
            lst[layer] = a
        return PagedQ4KVCache(*(tuple(lst) for lst in arrays), self.tables)

    def write_packed(self, layer: int, k_new, v_new, slot_ids, rows):
        """Per-token scatter with the Q4KVCache sibling-merge: when both
        rows of a byte land in one ubatch, each token takes its sibling's
        nibble from the batch instead of the stale pool byte."""
        from .kv_cache import _q4_quant

        ps = self.page_size
        ps2 = ps // 2
        blk = jnp.minimum(rows // ps, self.tables.shape[1] - 1)
        pages = self.tables[slot_ids, blk]
        pages = jnp.where(rows < self.capacity, pages, self.n_pages)
        rin = rows % ps
        r2 = rin // 2
        par = (rin % 2)[:, None, None]
        kq, kd = _q4_quant(k_new)  # [Ptok, Hkv, D] nibbles, [Ptok, Hkv, G]
        vq, vd = _q4_quant(v_new)
        # in-batch sibling: same PAGE and sibling in-page row
        sib = ((pages[:, None] == pages[None, :])
               & ((rin[:, None] ^ 1) == rin[None, :])
               & (pages[:, None] < self.n_pages))
        sibf = sib.astype(jnp.int32)
        has_sib = sib.any(axis=1)[:, None, None]
        safe_pages = jnp.minimum(pages, self.n_pages - 1)
        safe_r2 = jnp.minimum(r2, ps2 - 1)

        def merge(pool, q):
            q = q.astype(jnp.int32)
            old = pool[safe_pages, :, safe_r2].astype(jnp.int32)
            sib_q = jnp.einsum("ij,jhd->ihd", sibf, q)
            other = jnp.where(has_sib, sib_q,
                              jnp.where(par == 0, old >> 4, old & 0x0F))
            byte = jnp.where(par == 0, q | (other << 4), other | (q << 4))
            return pool.at[pages, :, r2].set(byte.astype(jnp.uint8),
                                             mode="drop")

        ng = kd.shape[-1]
        planes = (rin % 2)[:, None] * ng + jnp.arange(ng)[None, :]  # [Ptok,G]
        return self._replace_layer(
            layer,
            merge(self.k_qs[layer], kq),
            self.k_d[layer].at[pages[:, None], :, planes, r2[:, None]].set(
                kd.transpose(0, 2, 1), mode="drop"),
            merge(self.v_qs[layer], vq),
            self.v_d[layer].at[pages[:, None], :, planes, r2[:, None]].set(
                vd.transpose(0, 2, 1), mode="drop"),
        )

    def write(self, layer: int, k_new, v_new, offset):
        b, t = k_new.shape[:2]
        off = jnp.asarray(offset, jnp.int32)
        if off.ndim == 0:
            off = jnp.full((b,), off, jnp.int32)
        rows = off[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        slot_ids = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], (b, t))
        return self.write_packed(
            layer, k_new.reshape(b * t, *k_new.shape[2:]),
            v_new.reshape(b * t, *v_new.shape[2:]),
            slot_ids.reshape(-1), rows.reshape(-1),
        )

    @staticmethod
    def _deq_pages(qpool, dpool, tables):
        """Gathered pages → dense bf16 rows [B, Hkv, S, D]."""
        from .kv_cache import _q4_deq_plane

        q = qpool[tables]  # [B, blocks, Hkv, ps/2, D]
        d_ = dpool[tables]  # [B, blocks, Hkv, 2G, ps/2]
        b, nb, hkv, ps2, dd = q.shape
        out = _q4_deq_plane(q, d_)  # [B,nb,Hkv,ps,D] bf16
        out = out.transpose(0, 2, 1, 3, 4)
        return out.reshape(b, hkv, nb * 2 * ps2, dd)

    def layer(self, i: int):
        safe = jnp.minimum(self.tables, self.n_pages - 1)
        return (self._deq_pages(self.k_qs[i], self.k_d[i], safe),
                self._deq_pages(self.v_qs[i], self.v_d[i], safe))

    def packed_pages(self, i: int):
        return self.k_qs[i], self.k_d[i], self.v_qs[i], self.v_d[i]

    def gather_seq(self, seq: int):
        safe = jnp.minimum(self.tables[seq], self.n_pages - 1)[None]
        ks, vs = [], []
        for i in range(self.n_layers):
            ks.append(self._deq_pages(self.k_qs[i], self.k_d[i], safe))
            vs.append(self._deq_pages(self.v_qs[i], self.v_d[i], safe))
        return jnp.stack(ks), jnp.stack(vs)

    def scatter_seq(self, seq: int, k, v):
        from .kv_cache import _q4_pack_rows, _q4_quant

        l, _, hkv, s, d = k.shape
        ps = self.page_size
        nb = s // ps
        pages = jnp.minimum(self.tables[seq, :nb], self.n_pages - 1)
        kqs, kds, vqs, vds = (list(self.k_qs), list(self.k_d),
                              list(self.v_qs), list(self.v_d))
        for i in range(l):
            for pools, dense in (((kqs, kds), k[i, 0]), ((vqs, vds), v[i, 0])):
                q, dd = _q4_quant(dense)  # [Hkv, S, D] nibbles, [Hkv, S, G]
                g = dd.shape[-1]
                qp = (_q4_pack_rows(q)  # [Hkv, S/2, D]
                      .reshape(hkv, nb, ps // 2, d).transpose(1, 0, 2, 3))
                dp = (dd.reshape(hkv, nb, ps // 2, 2, g)
                      .transpose(1, 0, 3, 4, 2)
                      .reshape(nb, hkv, 2 * g, ps // 2))  # [nb,Hkv,2G,ps/2]
                qpool, dpool = pools
                qpool[i] = qpool[i].at[pages].set(qp)
                dpool[i] = dpool[i].at[pages].set(dp)
        return PagedQ4KVCache(tuple(kqs), tuple(kds), tuple(vqs),
                              tuple(vds), self.tables)

    def copy_page(self, src: int, dst: int):
        pools = (self.k_qs, self.k_d, self.v_qs, self.v_d)
        pools, tables = _copy_page_jit(
            (pools, self.tables), jnp.int32(src), jnp.int32(dst))
        return PagedQ4KVCache(*pools, tables)

    def set_table_row(self, seq: int, row: np.ndarray):
        return PagedQ4KVCache(
            self.k_qs, self.k_d, self.v_qs, self.v_d,
            self.tables.at[seq].set(jnp.asarray(row, jnp.int32)),
        )


class PageAllocator:
    """Host-side page bookkeeping: free list + refcounts (shared-prefix
    pages are referenced by several sequences; freed when the last drops)."""

    def __init__(self, n_pages: int):
        self.n_pages = n_pages
        self.refs = np.zeros(n_pages, np.int32)
        self._free: list[int] = list(range(n_pages - 1, -1, -1))

    @property
    def n_free(self) -> int:
        return len(self._free)

    def alloc(self) -> int:
        if not self._free:
            raise MemoryError("paged KV: out of pages")
        pid = self._free.pop()
        self.refs[pid] = 1
        return pid

    def ref(self, pid: int) -> None:
        assert self.refs[pid] > 0
        self.refs[pid] += 1

    def unref(self, pid: int) -> None:
        assert self.refs[pid] > 0
        self.refs[pid] -= 1
        if self.refs[pid] == 0:
            self._free.append(pid)

    def is_shared(self, pid: int) -> bool:
        return self.refs[pid] > 1


class PagedSeq:
    """Host view of one sequence's block table."""

    def __init__(self, alloc: PageAllocator, max_blocks: int):
        self.alloc = alloc
        self.max_blocks = max_blocks
        self.pages: list[int] = []

    def table_row(self, n_pages_sentinel: int) -> np.ndarray:
        row = np.full(self.max_blocks, n_pages_sentinel, np.int32)
        row[: len(self.pages)] = self.pages
        return row

    def ensure(self, n_tokens: int, page_size: int) -> bool:
        """Allocate pages to cover n_tokens. Returns True if changed."""
        need = (n_tokens + page_size - 1) // page_size
        if need > self.max_blocks:
            raise MemoryError("paged KV: sequence exceeds max_blocks")
        changed = False
        while len(self.pages) < need:
            self.pages.append(self.alloc.alloc())
            changed = True
        return changed

    def share_prefix_from(self, donor: "PagedSeq", n_tokens: int,
                          page_size: int) -> int:
        """Alias the donor's full pages covering n_tokens (refcounted).
        Returns tokens actually shared (floor to page boundary — the
        donor's partial page stays exclusive; COW covers the rest)."""
        self.release()
        n_full = min(n_tokens // page_size, len(donor.pages))
        for pid in donor.pages[:n_full]:
            self.alloc.ref(pid)
            self.pages.append(pid)
        return n_full * page_size

    def make_writable(self, block: int, cache: PagedKVCache) -> tuple[PagedKVCache, bool]:
        """COW: if pages[block] is shared, copy it to a fresh page."""
        pid = self.pages[block]
        if not self.alloc.is_shared(pid):
            return cache, False
        new = self.alloc.alloc()
        cache = cache.copy_page(pid, new)
        self.alloc.unref(pid)
        self.pages[block] = new
        return cache, True

    def truncate(self, n_tokens: int, page_size: int) -> None:
        keep = (n_tokens + page_size - 1) // page_size
        while len(self.pages) > keep:
            self.alloc.unref(self.pages.pop())

    def release(self) -> None:
        for pid in self.pages:
            self.alloc.unref(pid)
        self.pages = []
