"""Sequence (context) parallelism: ring-attention prefill over an "sp" axis.

Beyond-reference capability (SURVEY §2.7 lists it as NOT present upstream —
attention there is always single-device): long prompts are sharded along the
sequence dimension across the mesh, every device computes attention for its
own query chunk while K/V blocks rotate around the ring with
`jax.lax.ppermute` (one hop per step, riding ICI), and softmax is
accumulated online (flash-attention style running max/denominator) so no
device ever materializes the full [T, T] score matrix or the full K/V.

This is the TPU-native answer to "context longer than one chip's HBM":
weights stay replicated (or tensor-parallel on an orthogonal axis), KV
memory and the O(T²) score work both scale 1/sp per device.

Scope: dense-attention prefill/scoring (rope or NoPE; the online-softmax
rewrite is exact, so logits match the single-device path bit-for-bit up to
f32 addition order). Decode keeps the tensor-parallel path — a 1-token query
has nothing to shard along T.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.llama import (
    LlamaConfig,
    _mm,
    _project_qkv,
    decode_layer,
    norm,
    softcap,
)
from ..ops import qmm, take_rows

_NEG = -1e30  # finite mask value: keeps the running-max update NaN-free


def ring_attention(
    q: jax.Array,  # [B, Tq, H, D] local query chunk (roped, global positions)
    k: jax.Array,  # [B, Tk, Hkv, D] local key chunk
    v: jax.Array,  # [B, Tk, Hkv, D] local value chunk
    q_pos: jax.Array,  # [B, Tq] GLOBAL positions of the query chunk
    kv_pos: jax.Array,  # [B, Tk] GLOBAL positions of the local K/V chunk
    scale: float,
    n_shards: int,
    *,
    axis: str = "sp",
    logit_softcap: float = 0.0,
) -> jax.Array:
    """Exact causal attention with K/V blocks rotating around the ring.

    Step 0 uses the device's own block, so every query sees at least its own
    position first and the running max is finite from the start. Masking is
    by global position, so correctness is independent of rotation order.
    Returns [B, Tq, H*D] f32.
    """
    b, tq, h, d = q.shape
    hkv = k.shape[2]
    rep = h // hkv
    qf = q.astype(jnp.float32).reshape(b, tq, hkv, rep, d)

    def body(_, carry):
        k_c, v_c, pos_c, m, l, o = carry
        s = jnp.einsum("bqhrd,bkhd->bhrqk", qf, k_c.astype(jnp.float32)) * scale
        if logit_softcap:
            s = softcap(s, logit_softcap)
        vis = q_pos[:, :, None] >= pos_c[:, None, :]  # [B, Tq, Tk] causal
        s = jnp.where(vis[:, None, None], s, _NEG)
        m_new = jnp.maximum(m, s.max(axis=-1))
        corr = jnp.exp(m - m_new)  # 0 on the first visible block (m = _NEG)
        p = jnp.exp(s - m_new[..., None])  # masked entries underflow to 0
        l = l * corr + p.sum(axis=-1)
        o = o * corr[..., None] + jnp.einsum(
            "bhrqk,bkhd->bhrqd", p, v_c.astype(jnp.float32)
        )
        perm = [(j, (j + 1) % n_shards) for j in range(n_shards)]
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        pos_c = jax.lax.ppermute(pos_c, axis, perm)
        return k_c, v_c, pos_c, m_new, l, o

    m0 = jnp.full((b, hkv, rep, tq), _NEG, jnp.float32)
    l0 = jnp.zeros((b, hkv, rep, tq), jnp.float32)
    o0 = jnp.zeros((b, hkv, rep, tq, d), jnp.float32)
    *_, m, l, o = jax.lax.fori_loop(0, n_shards, body, (k, v, kv_pos, m0, l0, o0))
    out = o / l[..., None]  # l >= 1: step 0 always contains the diagonal
    return out.transpose(0, 3, 1, 2, 4).reshape(b, tq, h * d)


def sp_self_attention(
    x: jax.Array,  # normed input [B, Tc, C] — this shard's sequence chunk
    layer: dict,
    cfg: LlamaConfig,
    positions: jax.Array,  # [B, Tc] GLOBAL positions
    cache,
    layer_idx: int,
    compute_dtype,
    tap=None,
    *,
    n_shards: int,
    axis: str = "sp",
    kv_out: list | None = None,  # collects per-layer (k, v) [B,Hkv,Tc,D]
):
    """decode_layer attn_impl: rope by global position, ring attention,
    output projection. Cache is unused (prefill scoring path)."""
    q, k, v = _project_qkv(
        x, layer, cfg, positions, None, layer_idx, compute_dtype, tap
    )
    if kv_out is not None:
        kv_out.append((k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)))
    (h, _hkv), d = cfg.layer_heads(layer_idx), cfg.head_dim
    scale = cfg.attn_scale if cfg.attn_scale else 1.0 / (d**0.5)
    attn = ring_attention(
        q, k, v, positions, positions, scale, n_shards, axis=axis,
        logit_softcap=cfg.attn_logit_softcap,
    ).astype(compute_dtype)
    if cfg.sub_norms:
        attn = norm(attn, layer, "attn_sub_norm", cfg)
    if tap is not None:
        tap(f"blk.{layer_idx}.attn_output.weight", attn)
    return _mm(attn, layer, "attn_output", compute_dtype), cache


def sequence_parallel_prefill(
    params: dict,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, T]; T divisible by mesh.shape[axis]
    mesh: Mesh,
    *,
    axis: str = "sp",
    compute_dtype=jnp.float32,
    return_kv: bool = False,
):
    """Full-model prefill with activations sharded along T over `axis`.

    Weights are replicated across the axis (compose with tensor parallelism
    by sharding them over an orthogonal "tp" axis instead). Returns logits
    [B, T, V] f32 with the T dim sharded over `axis`; with return_kv also a
    per-layer list of (k, v) [B, Hkv, T, D] sharded along T — feed these to
    `sp_fill_cache` to continue with `sp_decode_step`.
    """
    sp = mesh.shape[axis]
    b, t = tokens.shape
    assert t % sp == 0, (t, sp)
    tc = t // sp
    n_layers = len(params["layers"])

    def shard_fn(p, toks):
        sid = jax.lax.axis_index(axis)
        positions = jnp.broadcast_to(
            sid * tc + jnp.arange(tc, dtype=jnp.int32), (b, tc)
        )
        x = take_rows(p["token_embd"], toks, dtype=compute_dtype)
        if cfg.embd_scale != 1.0:
            x = x * jnp.asarray(cfg.embd_scale, compute_dtype)
        if cfg.embd_norm:
            x = norm(x, p, "token_embd_norm", cfg)
        kv: list = []
        impl = partial(sp_self_attention, n_shards=sp, axis=axis,
                       kv_out=kv if return_kv else None)
        for i, layer in enumerate(p["layers"]):
            x, _ = decode_layer(
                x, layer, cfg, positions, None, i, 0, None, compute_dtype,
                attn_impl=impl,
            )
        x = norm(x, p, "output_norm", cfg)
        out_w = p.get("output")
        if out_w is None:
            out_w = p["token_embd"]
        logits = qmm(x, out_w, compute_dtype=compute_dtype).astype(jnp.float32)
        if "output_bias" in p:
            logits = logits + p["output_bias"]
        if cfg.logit_scale != 1.0:
            logits = logits * cfg.logit_scale
        if cfg.final_logit_softcap:
            logits = softcap(logits, cfg.final_logit_softcap)
        if return_kv:
            return logits, kv
        return logits

    kv_spec = [(P(None, None, axis, None),) * 2 for _ in range(n_layers)]
    specs = dict(
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), P(None, axis)),
        out_specs=(P(None, axis, None), kv_spec) if return_kv
        else P(None, axis, None),
    )
    fn = _shard_map(shard_fn, specs)
    return fn(params, tokens)


def _shard_map(fn, specs: dict):
    if hasattr(jax, "shard_map"):  # jax >= 0.8
        return jax.shard_map(fn, check_vma=False, **specs)
    from jax.experimental.shard_map import shard_map

    return shard_map(fn, check_rep=False, **specs)


# -- sequence-sharded KV decode ---------------------------------------------
#
# After an sp prefill the KV prefix lives sharded along the sequence dim:
# shard s owns cache rows [s*capc, (s+1)*capc). Decode then runs one token
# on EVERY shard (weights replicated, FLOPs duplicated — decode is
# HBM-bound, so what matters is that each chip streams only 1/sp of the KV
# bytes); each shard computes partial attention over its own rows and the
# shards merge with a log-sum-exp reduction (pmax + two psums) per layer.
# This is how a context larger than one chip's HBM is served.


def make_sp_cache(cfg: LlamaConfig, b: int, capacity: int, mesh: Mesh,
                  *, axis: str = "sp", dtype=jnp.float32) -> dict:
    """Allocate {"k": [L x [B,Hkv,cap,D]], "v": ...} sharded along rows."""
    from jax.sharding import NamedSharding

    sp = mesh.shape[axis]
    assert capacity % sp == 0, (capacity, sp)
    sh = NamedSharding(mesh, P(None, None, axis, None))
    shape = (b, cfg.kv_cache_heads, capacity, cfg.head_dim)
    zeros = partial(jnp.zeros, shape, dtype, device=sh)
    return {"k": [zeros() for _ in range(cfg.n_layers)],
            "v": [zeros() for _ in range(cfg.n_layers)]}


def sp_fill_cache(cache: dict, kv: list, mesh: Mesh, *, axis: str = "sp"):
    """Write prefill K/V (length-T prefix) into the sharded cache. GSPMD
    inserts the one-off redistribution collectives (prefill chunking is
    T/sp, cache ownership is capacity/sp)."""
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P(None, None, axis, None))

    @partial(jax.jit, out_shardings={"k": [sh] * len(kv), "v": [sh] * len(kv)})
    def fill(cache, kv):
        return {
            "k": [c.at[:, :, : k.shape[2]].set(k.astype(c.dtype))
                  for c, (k, _) in zip(cache["k"], kv)],
            "v": [c.at[:, :, : v.shape[2]].set(v.astype(c.dtype))
                  for c, (_, v) in zip(cache["v"], kv)],
        }

    return fill(cache, kv)


def _sp_cached_attention(
    x, layer, cfg, positions, cache, layer_idx, compute_dtype, tap=None,
    *, axis: str = "sp",
):
    """decode_layer attn_impl for the sequence-sharded cache: the owning
    shard writes the new row, every shard scores its local rows, partials
    merge via pmax/psum log-sum-exp."""
    q, k, v = _project_qkv(
        x, layer, cfg, positions, None, layer_idx, compute_dtype, tap
    )
    b, t = x.shape[:2]
    assert t == 1, "sp decode is one token at a time"
    (h, hkv), d = cfg.layer_heads(layer_idx), cfg.head_dim
    rep = h // hkv
    sid = jax.lax.axis_index(axis)
    k_l, v_l = cache["k"][layer_idx], cache["v"][layer_idx]
    capc = k_l.shape[2]
    row = positions[0, 0]  # == n_past (all batch rows advance together)
    owner = row // capc == sid
    local = row % capc
    k_new = jnp.where(
        owner,
        jax.lax.dynamic_update_slice_in_dim(
            k_l, k.transpose(0, 2, 1, 3).astype(k_l.dtype), local, axis=2),
        k_l,
    )
    v_new = jnp.where(
        owner,
        jax.lax.dynamic_update_slice_in_dim(
            v_l, v.transpose(0, 2, 1, 3).astype(v_l.dtype), local, axis=2),
        v_l,
    )
    cache["k"][layer_idx] = k_new
    cache["v"][layer_idx] = v_new

    scale = cfg.attn_scale if cfg.attn_scale else 1.0 / (d**0.5)
    qf = q.astype(jnp.float32).reshape(b, hkv, rep, d)  # t == 1
    s = jnp.einsum("bhrd,bhkd->bhrk", qf, k_new.astype(jnp.float32)) * scale
    if cfg.attn_logit_softcap:
        s = softcap(s, cfg.attn_logit_softcap)
    grow = sid * capc + jnp.arange(capc)  # global row of each local slot
    s = jnp.where((grow <= row)[None, None, None], s, _NEG)
    m = jax.lax.pmax(s.max(axis=-1), axis)  # global running max [B,Hkv,rep]
    e = jnp.exp(s - m[..., None])
    l = jax.lax.psum(e.sum(axis=-1), axis)
    o = jax.lax.psum(
        jnp.einsum("bhrk,bhkd->bhrd", e, v_new.astype(jnp.float32)), axis)
    attn = (o / l[..., None]).reshape(b, 1, h * d).astype(compute_dtype)
    if cfg.sub_norms:
        attn = norm(attn, layer, "attn_sub_norm", cfg)
    if tap is not None:
        tap(f"blk.{layer_idx}.attn_output.weight", attn)
    return _mm(attn, layer, "attn_output", compute_dtype), cache


def sp_decode_step(
    params: dict,
    cfg: LlamaConfig,
    cache: dict,  # from make_sp_cache / sp_fill_cache
    tokens: jax.Array,  # [B, 1]
    n_past,  # int scalar: number of rows already in the cache
    mesh: Mesh,
    *,
    axis: str = "sp",
    compute_dtype=jnp.float32,
):
    """One decode step over the sequence-sharded cache.

    Returns (logits [B, 1, V] f32, updated cache). Each chip streams only
    its 1/sp of the KV bytes; the per-layer merge is one pmax + two psums
    over [B, H(, D)] — tiny next to the KV traffic it saves.
    """
    b = tokens.shape[0]

    def shard_fn(p, cache, toks, n_past):
        positions = jnp.full((b, 1), n_past, jnp.int32)
        x = take_rows(p["token_embd"], toks, dtype=compute_dtype)
        if cfg.embd_scale != 1.0:
            x = x * jnp.asarray(cfg.embd_scale, compute_dtype)
        if cfg.embd_norm:
            x = norm(x, p, "token_embd_norm", cfg)
        impl = partial(_sp_cached_attention, axis=axis)
        for i, layer in enumerate(p["layers"]):
            x, cache = decode_layer(
                x, layer, cfg, positions, cache, i, n_past, None,
                compute_dtype, attn_impl=impl,
            )
        x = norm(x, p, "output_norm", cfg)
        out_w = p.get("output")
        if out_w is None:
            out_w = p["token_embd"]
        logits = qmm(x, out_w, compute_dtype=compute_dtype).astype(jnp.float32)
        if "output_bias" in p:
            logits = logits + p["output_bias"]
        if cfg.logit_scale != 1.0:
            logits = logits * cfg.logit_scale
        if cfg.final_logit_softcap:
            logits = softcap(logits, cfg.final_logit_softcap)
        return logits, cache

    cache_spec = jax.tree.map(lambda _: P(None, None, axis, None), cache)
    specs = dict(
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), cache_spec, P(), P()),
        out_specs=(P(), cache_spec),
    )
    fn = _shard_map(shard_fn, specs)
    return fn(params, cache, tokens, n_past)
