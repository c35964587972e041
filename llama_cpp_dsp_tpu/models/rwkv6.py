"""RWKV6 (Finch) recurrent model.

Capability mirror of reference llm_build_rwkv6 + ggml_rwkv_wkv6
(src/llama-model.cpp, ggml/src/ggml-cpu/ops.cpp rwkv_wkv6): data-dependent
token-shift interpolation (ddlerp with the 5-way LoRA), per-channel decayed
WKV recurrence with per-head [hs, hs] state, grouped LayerNorm on the wkv
output, squared-ReLU channel mix.

TPU-native: the WKV recurrence runs as jax.lax.scan over time with heads
and channels vectorized; layer state = (shift_att [B,C], shift_ffn [B,C],
wkv [B,H,hs,hs]).

No external oracle exists in this environment (HF ships only RWKV v4), so
tests cross-check the scan against an independent direct numpy recurrence
and incremental-vs-full decoding.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import layer_norm, qmm
from .llama import LlamaConfig, Params


@jax.tree_util.register_pytree_node_class
@dataclass
class RwkvState:
    shift_att: jax.Array  # [L, B, C] last token's hidden at time-mix input
    shift_ffn: jax.Array  # [L, B, C]
    wkv: jax.Array  # [L, B, H, hs, hs]

    def tree_flatten(self):
        return (self.shift_att, self.shift_ffn, self.wkv), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, cfg: LlamaConfig, n_batch: int, dtype=jnp.float32):
        hs = cfg.head_dim
        h = cfg.n_embd // hs
        return cls(
            jnp.zeros((cfg.n_layers, n_batch, cfg.n_embd), dtype),
            jnp.zeros((cfg.n_layers, n_batch, cfg.n_embd), dtype),
            jnp.zeros((cfg.n_layers, n_batch, h, hs, hs), dtype),
        )


def _shifted(x: jax.Array, prev: jax.Array) -> jax.Array:
    """Token shift: position t sees x_{t-1} (first sees the carried state)."""
    return jnp.concatenate([prev[:, None, :], x[:, :-1, :]], axis=1)


def _ddlerp(x, sx, layer):
    """5-way data-dependent lerp mix (llm_build_rwkv6 time_mix_lerp +
    time_mix_w1/w2 LoRA). Returns xw, xk, xv, xr, xg each [B,T,C]."""
    xxx = x + sx * layer["time_mix_lerp_x"]
    b, t, c = x.shape
    w1 = layer["time_mix_w1"]  # [C, 5*r]
    w2 = layer["time_mix_w2"]  # [5, r, C]
    r5 = w1.shape[1] // 5
    z = jnp.tanh(xxx.astype(jnp.float32) @ w1.astype(jnp.float32))
    z = z.reshape(b, t, 5, r5)
    m = jnp.einsum("btfr,frc->btfc", z, w2.astype(jnp.float32))  # [B,T,5,C]
    outs = []
    for i, name in enumerate(("w", "k", "v", "r", "g")):
        mi = m[:, :, i, :] + layer[f"time_mix_lerp_{name}"]
        outs.append(x + sx * mi)
    return outs


def _wkv6_scan(r, k, v, w, u, s0):
    """WKV6 recurrence (ggml_rwkv_wkv6):
      y_t[j]  = Σ_i r_t[i]·(u[i]·k_t[i]·v_t[j] + S[i,j])
      S'[i,j] = w_t[i]·S[i,j] + k_t[i]·v_t[j]
    r,k,v,w: [B,T,H,hs] f32; u: [H,hs]; s0: [B,H,hs,hs]. → (y [B,T,H,hs], sT)
    """
    def step(s, inp):
        rt, kt, vt, wt = inp  # [B,H,hs]
        a = kt[..., :, None] * vt[..., None, :]  # [B,H,hs,hs]
        y = jnp.einsum("bhi,bhij->bhj", rt, u[None, :, :, None] * a + s)
        s = wt[..., :, None] * s + a
        return s, y

    xs = (r.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
          v.transpose(1, 0, 2, 3), w.transpose(1, 0, 2, 3))
    sT, ys = jax.lax.scan(step, s0, xs)
    return ys.transpose(1, 0, 2, 3), sT


def rwkv6_layer(x, layer: Params, cfg: LlamaConfig, state: RwkvState,
                il: int, compute_dtype):
    hs = cfg.head_dim
    h = cfg.n_embd // hs
    b, t, c = x.shape
    eps = cfg.rms_eps

    # --- time mix ----------------------------------------------------------
    xin = layer_norm(x, layer["attn_norm"], layer.get("attn_norm_bias"), eps)
    prev = state.shift_att[il].astype(xin.dtype)
    sx = _shifted(xin, prev) - xin
    xw, xk, xv, xr, xg = _ddlerp(xin.astype(jnp.float32), sx.astype(jnp.float32), layer)

    r = qmm(xr.astype(compute_dtype), layer["time_mix_receptance"],
            compute_dtype=compute_dtype).reshape(b, t, h, hs).astype(jnp.float32)
    k = qmm(xk.astype(compute_dtype), layer["time_mix_key"],
            compute_dtype=compute_dtype).reshape(b, t, h, hs).astype(jnp.float32)
    v = qmm(xv.astype(compute_dtype), layer["time_mix_value"],
            compute_dtype=compute_dtype).reshape(b, t, h, hs).astype(jnp.float32)
    g = qmm(xg.astype(compute_dtype), layer["time_mix_gate"],
            compute_dtype=compute_dtype).astype(jnp.float32)
    g = g * jax.nn.sigmoid(g)  # silu

    # decay w_t = exp(-exp(decay + tanh(xw @ dw1) @ dw2))
    dd = jnp.tanh(xw @ layer["time_mix_decay_w1"].astype(jnp.float32))
    dd = dd @ layer["time_mix_decay_w2"].astype(jnp.float32)
    w = jnp.exp(-jnp.exp(
        (layer["time_mix_decay"].astype(jnp.float32) + dd)
    )).reshape(b, t, h, hs)

    u = layer["time_mix_first"].astype(jnp.float32).reshape(h, hs)
    y, s_new = _wkv6_scan(r, k, v, w, u, state.wkv[il].astype(jnp.float32))
    y = y.reshape(b * t, h, hs)
    # grouped LayerNorm per head (ggml_norm over each head, ln_x weights)
    mu = y.mean(-1, keepdims=True)
    var = y.var(-1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + 64e-5)
    y = y.reshape(b, t, c) * layer["time_mix_ln"].astype(jnp.float32)
    y = y + layer["time_mix_ln_bias"].astype(jnp.float32)
    y = y * g
    att = qmm(y.astype(compute_dtype), layer["time_mix_output"],
              compute_dtype=compute_dtype)
    x = x + att.astype(x.dtype)
    state = RwkvState(
        state.shift_att.at[il].set(xin[:, -1, :].astype(state.shift_att.dtype)),
        state.shift_ffn,
        state.wkv.at[il].set(s_new.astype(state.wkv.dtype)),
    )

    # --- channel mix ---------------------------------------------------------
    xin2 = layer_norm(x, layer["ffn_norm"], layer.get("ffn_norm_bias"), eps)
    prev2 = state.shift_ffn[il].astype(xin2.dtype)
    sx2 = (_shifted(xin2, prev2) - xin2).astype(jnp.float32)
    x2 = xin2.astype(jnp.float32)
    xk2 = x2 + sx2 * layer["channel_mix_lerp_k"]
    xr2 = x2 + sx2 * layer["channel_mix_lerp_r"]
    rr = jax.nn.sigmoid(qmm(xr2.astype(compute_dtype),
                            layer["channel_mix_receptance"],
                            compute_dtype=compute_dtype).astype(jnp.float32))
    kk = qmm(xk2.astype(compute_dtype), layer["channel_mix_key"],
             compute_dtype=compute_dtype).astype(jnp.float32)
    kk = jnp.square(jnp.maximum(kk, 0.0))
    vv = qmm(kk.astype(compute_dtype), layer["channel_mix_value"],
             compute_dtype=compute_dtype).astype(jnp.float32)
    x = x + (rr * vv).astype(x.dtype)
    state = RwkvState(
        state.shift_att,
        state.shift_ffn.at[il].set(xin2[:, -1, :].astype(state.shift_ffn.dtype)),
        state.wkv,
    )
    return x, state


def forward(params: Params, cfg: LlamaConfig, tokens: jax.Array,
            positions=None, state: RwkvState | None = None, n_past=0,
            mask=None, *, compute_dtype=jnp.float32, tap=None):
    """Returns (logits [B,T,V] f32, new state). Strictly left-to-right."""
    from ..ops import take_rows

    if state is None:
        state = RwkvState.create(cfg, tokens.shape[0])
    x = take_rows(params["token_embd"], tokens, dtype=compute_dtype)
    if "token_embd_norm" in params:  # ln0
        x = layer_norm(x, params["token_embd_norm"],
                       params.get("token_embd_norm_bias"), cfg.rms_eps)
    for il, layer in enumerate(params["layers"]):
        x, state = rwkv6_layer(x, layer, cfg, state, il, compute_dtype)
    x = layer_norm(x, params["output_norm"], params.get("output_norm_bias"),
                   cfg.rms_eps)
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    logits = qmm(x, out_w, compute_dtype=compute_dtype)
    return logits.astype(jnp.float32), state


def wkv6_reference_numpy(r, k, v, w, u, s0):
    """Independent direct recurrence (the test oracle for _wkv6_scan)."""
    b, t, h, hs = r.shape
    s = s0.copy()
    ys = np.zeros_like(r)
    for ti in range(t):
        for bi in range(b):
            for hi in range(h):
                a = np.outer(k[bi, ti, hi], v[bi, ti, hi])  # [hs, hs]
                ys[bi, ti, hi] = r[bi, ti, hi] @ (u[hi][:, None] * a + s[bi, hi])
                s[bi, hi] = w[bi, ti, hi][:, None] * s[bi, hi] + a
    return ys, s
