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
):
    """decode_layer attn_impl: rope by global position, ring attention,
    output projection. Cache is unused (prefill scoring path)."""
    q, k, v = _project_qkv(
        x, layer, cfg, positions, None, layer_idx, compute_dtype, tap
    )
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
):
    """Full-model prefill with activations sharded along T over `axis`.

    Weights are replicated across the axis (compose with tensor parallelism
    by sharding them over an orthogonal "tp" axis instead). Returns logits
    [B, T, V] f32 with the T dim sharded over `axis`.
    """
    sp = mesh.shape[axis]
    b, t = tokens.shape
    assert t % sp == 0, (t, sp)
    tc = t // sp

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
        impl = partial(sp_self_attention, n_shards=sp, axis=axis)
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
        return logits

    specs = dict(
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params), P(None, axis)),
        out_specs=P(None, axis, None),
    )
    if hasattr(jax, "shard_map"):  # jax >= 0.8
        fn = jax.shard_map(shard_fn, check_vma=False, **specs)
    else:
        from jax.experimental.shard_map import shard_map

        fn = shard_map(shard_fn, check_rep=False, **specs)
    return fn(params, tokens)
