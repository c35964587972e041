"""Session/state save-load.

Capability mirror of reference llama_state_save_file/load_file and the
per-sequence llama_state_seq_* API (include/llama.h:798-894, used by
llama-cli --prompt-cache and the server's slot save/restore endpoints):
serializes the token history plus the populated KV region; restore
validates shapes and repopulates a context/slot without recompute.

Format: npz with meta (json) + per-layer K/V arrays trimmed to n_past.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

MAGIC = "llama_cpp_dsp_tpu-state-v1"


def _meta(cfg, n_past: int, tokens: list[int], dtype: str) -> str:
    return json.dumps({
        "magic": MAGIC,
        "arch": cfg.arch,
        "n_layers": cfg.n_layers,
        "n_kv_heads": cfg.n_kv_heads,
        "head_dim": cfg.head_dim,
        "n_past": n_past,
        "dtype": dtype,
        "tokens": list(map(int, tokens)),
    })


def _to_storable(a: np.ndarray) -> np.ndarray:
    """npz can't store bf16 — stash exotic dtypes as raw uint16/uint8 views."""
    if a.dtype.itemsize == 2 and a.dtype.kind not in "iuf":
        return a.view(np.uint16)
    try:
        np.dtype(a.dtype.name)
        return a
    except TypeError:
        return a.view(np.uint8)


def _from_storable(a: np.ndarray, dtype_name: str):
    import ml_dtypes

    try:
        dt = np.dtype(dtype_name)
    except TypeError:
        dt = np.dtype(getattr(ml_dtypes, dtype_name))
    if a.dtype != dt:
        return a.view(dt)
    return a


def save_state(ctx, path: str, tokens: list[int]) -> None:
    """Save a LlamaContext's session (tokens + populated KV rows). Quantized
    caches export dequantized rows (the reference's cross-type state re-read
    paths, src/llama-kv-cache.cpp:154-198)."""
    n = ctx.n_past
    if hasattr(ctx.cache, "k"):
        kls, vls = ctx.cache.k, ctx.cache.v
        dtype = ctx.cache.dtype.name
    else:  # quantized: dequantized layer views
        pairs = [ctx.cache.layer(i) for i in range(ctx.cache.n_layers)]
        kls = [p[0] for p in pairs]
        vls = [p[1] for p in pairs]
        dtype = kls[0].dtype.name
    k = _to_storable(np.stack([np.asarray(kl[:, :, :n]) for kl in kls]))
    v = _to_storable(np.stack([np.asarray(vl[:, :, :n]) for vl in vls]))
    np.savez_compressed(
        open(path, "wb"), meta=_meta(ctx.cfg, n, tokens, dtype), k=k, v=v
    )


def load_state(ctx, path: str) -> list[int]:
    """Restore into a fresh context; returns the saved token history."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta.get("magic") != MAGIC:
        raise ValueError(f"not a state file: {path}")
    for key in ("n_layers", "n_kv_heads", "head_dim"):
        want = getattr(ctx.cfg, key)
        if meta[key] != want:
            raise ValueError(f"state mismatch: {key}={meta[key]}, model has {want}")
    n = int(meta["n_past"])
    if n > ctx.n_ctx:
        raise ValueError(f"state has {n} cells, context only {ctx.n_ctx}")
    k = jnp.asarray(_from_storable(data["k"], meta["dtype"]))
    v = jnp.asarray(_from_storable(data["v"], meta["dtype"]))
    if hasattr(ctx.cache, "k"):
        ctx.cache = type(ctx.cache)(
            tuple(kl.at[:, :, :n].set(k[i]) for i, kl in enumerate(ctx.cache.k)),
            tuple(vl.at[:, :, :n].set(v[i]) for i, vl in enumerate(ctx.cache.v)),
        )
    elif n:  # quantized: re-quantize rows through the write path
        cache = ctx.cache
        for i in range(cache.n_layers):
            cache = cache.write(i, k[i].transpose(0, 2, 1, 3),
                                v[i].transpose(0, 2, 1, 3), 0)
        ctx.cache = cache
    ctx.n_past = n
    return [int(t) for t in meta["tokens"]]


def _slot_kv_dense(engine, slot_idx: int, n: int):
    """Dense [L, 1, Hkv, n, D] view of one slot's cached K/V, regardless of
    the engine's cache layout (contiguous / quantized / paged) — the role of
    the reference's cross-type state_seq re-read paths
    (src/llama-kv-cache.cpp:154-198)."""
    cache = engine.cache
    if hasattr(cache, "gather_seq"):  # paged layouts
        engine._ensure_pages([(slot_idx, max(n, 1))])
        k, v = cache.gather_seq(slot_idx)
        return k[:, :, :, :n], v[:, :, :, :n]
    if hasattr(cache, "k"):  # contiguous dense
        return (
            jnp.stack([kl[slot_idx: slot_idx + 1, :, :n] for kl in cache.k]),
            jnp.stack([vl[slot_idx: slot_idx + 1, :, :n] for vl in cache.v]),
        )
    # quantized contiguous: dequantize layer views
    n_layers = engine.cfg.n_layers
    ks, vs = [], []
    for i in range(n_layers):
        kl, vl = cache.layer(i)
        ks.append(kl[slot_idx: slot_idx + 1, :, :n])
        vs.append(vl[slot_idx: slot_idx + 1, :, :n])
    return jnp.stack(ks), jnp.stack(vs)


def save_slot(engine, slot_idx: int, path: str, tokens: list[int]) -> None:
    """Per-slot (per-sequence) state export — server slot save equivalent."""
    slot = engine.slots[slot_idx]
    n = slot.n_past
    k, v = _slot_kv_dense(engine, slot_idx, n)
    k = _to_storable(np.asarray(k))
    v = _to_storable(np.asarray(v))
    dtype = (_from_storable(k, "bfloat16").dtype.name
             if k.dtype == np.uint16 else k.dtype.name)
    np.savez_compressed(
        open(path, "wb"), meta=_meta(engine.cfg, n, tokens, dtype), k=k, v=v
    )


def load_slot(engine, slot_idx: int, path: str) -> list[int]:
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    if meta.get("magic") != MAGIC:
        raise ValueError(f"not a state file: {path}")
    n = int(meta["n_past"])
    if n > engine.n_ctx:
        raise ValueError(f"state has {n} cells, slot context is {engine.n_ctx}")
    k = jnp.asarray(_from_storable(data["k"], meta["dtype"]))
    v = jnp.asarray(_from_storable(data["v"], meta["dtype"]))
    cache = engine.cache
    if hasattr(cache, "scatter_seq"):  # paged: COW then page-scatter
        engine._ensure_pages([(slot_idx, engine.n_ctx)])
        engine._cow_from(slot_idx, 0)
        cap = engine.n_ctx
        pad = cap - n
        if pad:
            padding = [(0, 0), (0, 0), (0, 0), (0, pad), (0, 0)]
            k = jnp.pad(k, padding)
            v = jnp.pad(v, padding)
        engine.cache = cache.scatter_seq(slot_idx, k, v)
    elif hasattr(cache, "k"):
        dt = cache.dtype
        engine.cache = type(cache)(
            tuple(kl.at[slot_idx: slot_idx + 1, :, :n].set(k[i].astype(dt))
                  for i, kl in enumerate(cache.k)),
            tuple(vl.at[slot_idx: slot_idx + 1, :, :n].set(v[i].astype(dt))
                  for i, vl in enumerate(cache.v)),
        )
    else:  # quantized contiguous: re-quantize rows through the write path
        sub = cache.slot_view(jnp.int32(slot_idx))
        for layer in range(engine.cfg.n_layers):
            sub = sub.write(layer,
                            k[layer].transpose(0, 2, 1, 3),  # → [1,n,Hkv,D]
                            v[layer].transpose(0, 2, 1, 3), 0)
        engine.cache = cache.merge_slot(sub, jnp.int32(slot_idx))
    engine.slots[slot_idx].n_past = n
    return [int(t) for t in meta["tokens"]]
