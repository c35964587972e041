"""Paged KV cache with shared-prefix page aliasing.

The BASELINE north-star's "llama_kv_cache paged KV-cache" TPU-natively:
K/V live in fixed page pools `[L, P, Hkv, page_size, D]`; each sequence owns
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

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
@dataclass
class PagedKVCache:
    k: jax.Array  # [L, P, Hkv, ps, D] — page pool ("P" includes no sentinel)
    v: jax.Array
    tables: jax.Array  # [B, max_blocks] int32 page ids (P = unmapped)

    def tree_flatten(self):
        return (self.k, self.v, self.tables), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layers, n_pages, n_seqs, max_blocks, n_kv_heads,
               head_dim, page_size=128, dtype=jnp.bfloat16):
        shape = (n_layers, n_pages, n_kv_heads, page_size, head_dim)
        return cls(
            jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
            jnp.full((n_seqs, max_blocks), n_pages, jnp.int32),
        )

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def n_pages(self) -> int:
        return self.k.shape[1]

    @property
    def capacity(self) -> int:
        """Max per-sequence length (max_blocks × page_size)."""
        return self.tables.shape[1] * self.page_size

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
        k = self.k.at[layer, pages, :, rin].set(
            k_new.astype(self.k.dtype), mode="drop")
        v = self.v.at[layer, pages, :, rin].set(
            v_new.astype(self.v.dtype), mode="drop")
        return PagedKVCache(k, v, self.tables)

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
        kg = self.k[:, safe]  # [L, blocks, Hkv, ps, D]
        vg = self.v[:, safe]
        l, nb, hkv, ps, d = kg.shape
        return (kg.transpose(0, 2, 1, 3, 4).reshape(l, 1, hkv, nb * ps, d),
                vg.transpose(0, 2, 1, 3, 4).reshape(l, 1, hkv, nb * ps, d))

    def scatter_seq(self, seq: int, k: jax.Array, v: jax.Array) -> "PagedKVCache":
        """Write a dense [L, 1, Hkv, S, D] view back into the sequence's
        pages (pages must be exclusively owned — COW first)."""
        l, _, hkv, s, d = k.shape
        ps = self.page_size
        nb = s // ps
        pages = jnp.minimum(self.tables[seq, :nb], self.n_pages - 1)
        kp = k.reshape(l, hkv, nb, ps, d).transpose(0, 2, 1, 3, 4)
        vp = v.reshape(l, hkv, nb, ps, d).transpose(0, 2, 1, 3, 4)
        return PagedKVCache(
            self.k.at[:, pages].set(kp.astype(self.k.dtype)),
            self.v.at[:, pages].set(vp.astype(self.v.dtype)),
            self.tables,
        )

    def copy_page(self, src: int, dst: int) -> "PagedKVCache":
        """Copy-on-write support: duplicate one page's payload."""
        return PagedKVCache(
            self.k.at[:, dst].set(self.k[:, src]),
            self.v.at[:, dst].set(self.v[:, src]),
            self.tables,
        )

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
    paged q8 flash kernel folds dequant into score/prob scaling)."""

    k_qs: jax.Array  # [L, P, Hkv, ps, D] int8
    k_d: jax.Array  # [L, P, Hkv, 1, ps] f32
    v_qs: jax.Array
    v_d: jax.Array
    tables: jax.Array  # [B, max_blocks] int32

    def tree_flatten(self):
        return (self.k_qs, self.k_d, self.v_qs, self.v_d, self.tables), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, n_layers, n_pages, n_seqs, max_blocks, n_kv_heads,
               head_dim, page_size=128, dtype=None):
        shape = (n_layers, n_pages, n_kv_heads, page_size, head_dim)
        dshape = (n_layers, n_pages, n_kv_heads, 1, page_size)
        return cls(
            jnp.zeros(shape, jnp.int8), jnp.zeros(dshape, jnp.float32),
            jnp.zeros(shape, jnp.int8), jnp.zeros(dshape, jnp.float32),
            jnp.full((n_seqs, max_blocks), n_pages, jnp.int32),
        )

    @property
    def page_size(self) -> int:
        return self.k_qs.shape[3]

    @property
    def n_pages(self) -> int:
        return self.k_qs.shape[1]

    @property
    def capacity(self) -> int:
        return self.tables.shape[1] * self.page_size

    def write_packed(self, layer: int, k_new, v_new, slot_ids, rows):
        from .kv_cache import _q8_quant

        ps = self.page_size
        blk = jnp.minimum(rows // ps, self.tables.shape[1] - 1)
        pages = self.tables[slot_ids, blk]
        pages = jnp.where(rows < self.capacity, pages, self.n_pages)
        rin = rows % ps
        kq, kd = _q8_quant(k_new)  # [Ptok, Hkv, D], [Ptok, Hkv]
        vq, vd = _q8_quant(v_new)
        return PagedQuantKVCache(
            self.k_qs.at[layer, pages, :, rin].set(kq, mode="drop"),
            self.k_d.at[layer, pages, :, 0, rin].set(kd, mode="drop"),
            self.v_qs.at[layer, pages, :, rin].set(vq, mode="drop"),
            self.v_d.at[layer, pages, :, 0, rin].set(vd, mode="drop"),
            self.tables,
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
        kq = self.k_qs[:, safe]
        kd = self.k_d[:, safe][:, :, :, 0, :]
        vq = self.v_qs[:, safe]
        vd = self.v_d[:, safe][:, :, :, 0, :]
        l, nb, hkv, ps, d = kq.shape
        k = _q8_dequant(kq, kd, jnp.bfloat16).transpose(0, 2, 1, 3, 4)
        v = _q8_dequant(vq, vd, jnp.bfloat16).transpose(0, 2, 1, 3, 4)
        return (k.reshape(l, 1, hkv, nb * ps, d),
                v.reshape(l, 1, hkv, nb * ps, d))

    def scatter_seq(self, seq: int, k, v):
        from .kv_cache import _q8_quant

        l, _, hkv, s, d = k.shape
        ps = self.page_size
        nb = s // ps
        pages = jnp.minimum(self.tables[seq, :nb], self.n_pages - 1)
        kq, kd = _q8_quant(k[:, 0])  # [L, Hkv, S, D] → int8 + [L, Hkv, S]
        vq, vd = _q8_quant(v[:, 0])
        kqp = kq.reshape(l, hkv, nb, ps, d).transpose(0, 2, 1, 3, 4)
        kdp = kd.reshape(l, hkv, nb, ps).transpose(0, 2, 1, 3)[:, :, :, None, :]
        vqp = vq.reshape(l, hkv, nb, ps, d).transpose(0, 2, 1, 3, 4)
        vdp = vd.reshape(l, hkv, nb, ps).transpose(0, 2, 1, 3)[:, :, :, None, :]
        return PagedQuantKVCache(
            self.k_qs.at[:, pages].set(kqp),
            self.k_d.at[:, pages].set(kdp),
            self.v_qs.at[:, pages].set(vqp),
            self.v_d.at[:, pages].set(vdp),
            self.tables,
        )

    def copy_page(self, src: int, dst: int):
        return PagedQuantKVCache(
            self.k_qs.at[:, dst].set(self.k_qs[:, src]),
            self.k_d.at[:, dst].set(self.k_d[:, src]),
            self.v_qs.at[:, dst].set(self.v_qs[:, src]),
            self.v_d.at[:, dst].set(self.v_d[:, src]),
            self.tables,
        )

    def set_table_row(self, seq: int, row: np.ndarray):
        return PagedQuantKVCache(
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
