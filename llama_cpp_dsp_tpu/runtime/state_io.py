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
    """Save a LlamaContext's session (tokens + populated KV rows)."""
    n = ctx.n_past
    k = _to_storable(np.asarray(ctx.cache.k[:, :, :, :n]))
    v = _to_storable(np.asarray(ctx.cache.v[:, :, :, :n]))
    np.savez_compressed(
        open(path, "wb"), meta=_meta(ctx.cfg, n, tokens, ctx.cache.k.dtype.name), k=k, v=v
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
    ctx.cache = type(ctx.cache)(
        ctx.cache.k.at[:, :, :, :n].set(k), ctx.cache.v.at[:, :, :, :n].set(v)
    )
    ctx.n_past = n
    return [int(t) for t in meta["tokens"]]


def save_slot(engine, slot_idx: int, path: str, tokens: list[int]) -> None:
    """Per-slot (per-sequence) state export — server slot save equivalent."""
    slot = engine.slots[slot_idx]
    n = slot.n_past
    k = _to_storable(np.asarray(engine.cache.k[:, slot_idx : slot_idx + 1, :, :n]))
    v = _to_storable(np.asarray(engine.cache.v[:, slot_idx : slot_idx + 1, :, :n]))
    np.savez_compressed(
        open(path, "wb"), meta=_meta(engine.cfg, n, tokens, engine.cache.k.dtype.name), k=k, v=v
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
    engine.cache = type(engine.cache)(
        engine.cache.k.at[:, slot_idx : slot_idx + 1, :, :n].set(k),
        engine.cache.v.at[:, slot_idx : slot_idx + 1, :, :n].set(v),
    )
    engine.slots[slot_idx].n_past = n
    return [int(t) for t in meta["tokens"]]
