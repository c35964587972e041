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
    time_mix_w1/w2 LoRA). Returns xw, xk, xv, xr, xg each [B,T,C].
    Accepts either the five separate time_mix_lerp_* tensors or the
    converter-fused time_mix_lerp_fused (reference Rwkv6Model stacks
    w,k,v,r,g — both layouts appear in ecosystem GGUFs)."""
    xxx = x + sx * layer["time_mix_lerp_x"]
    b, t, c = x.shape
    w1 = layer["time_mix_w1"]  # [C, 5*r]
    w2 = layer["time_mix_w2"]  # [5, r, C]
    r5 = w1.shape[1] // 5
    z = jnp.tanh(xxx.astype(jnp.float32) @ w1.astype(jnp.float32))
    z = z.reshape(b, t, 5, r5)
    m = jnp.einsum("btfr,frc->btfc", z, w2.astype(jnp.float32))  # [B,T,5,C]
    fused = layer.get("time_mix_lerp_fused")
    if fused is not None:
        lerps = fused.astype(jnp.float32).reshape(5, c)
    else:
        lerps = [layer[f"time_mix_lerp_{n}"] for n in ("w", "k", "v", "r", "g")]
    outs = []
    for i in range(5):
        mi = m[:, :, i, :] + lerps[i]
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


def _gla_scan(r, k, v, w, s0, scale):
    """Gated linear attention (ggml_gated_linear_attn, the rwkv6qwen2 /
    is_qrwkv recurrence — ggml/src/ggml-cpu/ops.cpp gla_f32):
      S'[i,j] = w_t[i]·S[i,j] + k_t[i]·v_t[j]
      y_t[j]  = Σ_i scale·r_t[i]·S'[i,j]   (note: uses the NEW state)
    """
    def step(s, inp):
        rt, kt, vt, wt = inp  # [B,H,hs]
        a = kt[..., :, None] * vt[..., None, :]
        s = wt[..., :, None] * s + a
        y = scale * jnp.einsum("bhi,bhij->bhj", rt, s)
        return s, y

    xs = (r.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3),
          v.transpose(1, 0, 2, 3), w.transpose(1, 0, 2, 3))
    sT, ys = jax.lax.scan(step, s0, xs)
    return ys.transpose(1, 0, 2, 3), sT


def _norm(x, tree, name, cfg):
    from .llama import rms_norm

    if cfg.norm_type == "ln":
        return layer_norm(x, tree[name], tree.get(name + "_bias"), cfg.rms_eps)
    return rms_norm(x, tree[name], cfg.rms_eps)


def rwkv6_layer(x, layer: Params, cfg: LlamaConfig, state: RwkvState,
                il: int, compute_dtype):
    hs = cfg.head_dim
    h = cfg.n_embd // hs
    b, t, c = x.shape
    # rwkv6qwen2 has no bonus (time_mix_first) term — build_rwkv6_time_mix
    # is_qrwkv: sigmoid gate, GQA k/v repeat, k·(1−w), gated-linear-attn
    is_qrwkv = "time_mix_first" not in layer

    # --- time mix ----------------------------------------------------------
    xin = _norm(x, layer, "attn_norm", cfg)
    prev = state.shift_att[il].astype(xin.dtype)
    sx = _shifted(xin, prev) - xin
    xw, xk, xv, xr, xg = _ddlerp(xin.astype(jnp.float32), sx.astype(jnp.float32), layer)

    def _proj(xi, name):
        y = qmm(xi.astype(compute_dtype), layer[name],
                compute_dtype=compute_dtype).astype(jnp.float32)
        bias = layer.get(name + "_bias")
        return y if bias is None else y + bias.astype(jnp.float32)

    r = _proj(xr, "time_mix_receptance").reshape(b, t, h, hs)
    k = _proj(xk, "time_mix_key")
    v = _proj(xv, "time_mix_value")
    if k.shape[-1] != c:  # GQA grouping (rwkv6qwen2): repeat kv heads
        rep = c // k.shape[-1]
        k = jnp.repeat(k.reshape(b, t, -1, hs), rep, axis=2)
        v = jnp.repeat(v.reshape(b, t, -1, hs), rep, axis=2)
    k = k.reshape(b, t, h, hs)
    v = v.reshape(b, t, h, hs)
    g = _proj(xg, "time_mix_gate")
    if is_qrwkv:
        g = jax.nn.sigmoid(g)
    else:
        g = g * jax.nn.sigmoid(g)  # silu

    # decay w_t = exp(-exp(decay + tanh(xw @ dw1) @ dw2))
    dd = jnp.tanh(xw @ layer["time_mix_decay_w1"].astype(jnp.float32))
    dd = dd @ layer["time_mix_decay_w2"].astype(jnp.float32)
    w = jnp.exp(-jnp.exp(
        (layer["time_mix_decay"].astype(jnp.float32) + dd)
    )).reshape(b, t, h, hs)

    if is_qrwkv:
        k = k * (1.0 - w)
        y, s_new = _gla_scan(r, k, v, w, state.wkv[il].astype(jnp.float32),
                             float(hs) ** -0.5)
        y = y.reshape(b, t, c)
    else:
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

    # --- channel mix / FFN --------------------------------------------------
    if is_qrwkv:
        # qwen2-style gated-SiLU dense FFN, no token shift
        # (llm_build_rwkv6qwen2 build_ffn LLM_FFN_SILU/PAR)
        xin2 = _norm(x, layer, "ffn_norm", cfg)
        gt = qmm(xin2, layer["ffn_gate"], compute_dtype=compute_dtype)
        up = qmm(xin2, layer["ffn_up"], compute_dtype=compute_dtype)
        act = (jax.nn.silu(gt.astype(jnp.float32))
               * up.astype(jnp.float32)).astype(compute_dtype)
        down = qmm(act, layer["ffn_down"], compute_dtype=compute_dtype)
        return x + down.astype(x.dtype), state

    eps = cfg.rms_eps
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
    x = _norm(x, params, "output_norm", cfg)
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
