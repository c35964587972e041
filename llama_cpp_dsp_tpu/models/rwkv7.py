"""RWKV7 (Goose) and ARWKV7 recurrent models — the delta-rule generation.

Capability mirror of reference llm_build_rwkv7 / llm_build_arwkv7 +
ggml_rwkv_wkv7 (src/llama-model.cpp:11719-12076, ggml/src/ggml-cpu/ops.cpp
rwkv_wkv7): 6-stream fused token-shift lerp, data-dependent decay
w = exp(-e^{-0.5}·sigmoid(·)), first-layer value residual, in-context
learning-rate gate `a`, L2-normalized removal key, and the delta-rule state
update
    sa_i   = Σ_j a_j · S[i,j]            (a = -kk)
    S[i,j] = v_i·k_j + S[i,j]·w_j + sa_i·b_j   (b = kk·a_gate)
    y_i    = Σ_j S[i,j] · r_j
RWKV7 uses LayerNorms + squared-ReLU channel mix; ARWKV7 (RWKV-in-qwen)
uses RMS norms and a llama-style gated SiLU FFN with no FFN token shift.

TPU-native: lax.scan over time, heads/channels vectorized; state reuses
RwkvState (shift_att, shift_ffn, wkv [B,H,hs,hs]). No HF RWKV7 port exists
in this environment, so tests cross-check against an independent direct
numpy recurrence (dual-implementation oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import layer_norm, qmm, rms_norm
from .llama import LlamaConfig, Params
from .rwkv6 import RwkvState, _shifted


def _wkv7_scan(r, w, k, v, a, b, s0):
    """Delta-rule WKV7 recurrence (ggml_compute_forward_rwkv_wkv7_f32):
    r,w,k,v,a,b: [B,T,H,hs] f32; s0: [B,H,hs,hs] (i = value dim, j = key
    dim). Returns (y [B,T,H,hs], sT). y reads the *updated* state."""

    def step(s, inp):
        rt, wt, kt, vt, at, bt = inp  # each [B,H,hs]
        sa = jnp.einsum("bhj,bhij->bhi", at, s)
        s = (
            vt[..., :, None] * kt[..., None, :]
            + s * wt[..., None, :]
            + sa[..., :, None] * bt[..., None, :]
        )
        y = jnp.einsum("bhij,bhj->bhi", s, rt)
        return s, y

    xs = tuple(t.transpose(1, 0, 2, 3) for t in (r, w, k, v, a, b))
    sT, ys = jax.lax.scan(step, s0, xs)
    return ys.transpose(1, 0, 2, 3), sT


def _lowrank(x, layer, name, act=None):
    """x @ <name>1 (→ optional act) @ <name>2 (+ <name>0 if present)."""
    z = x @ layer[f"time_mix_{name}1"].astype(jnp.float32)
    if act is not None:
        z = act(z)
    z = z @ layer[f"time_mix_{name}2"].astype(jnp.float32)
    z0 = layer.get(f"time_mix_{name}0")
    if z0 is not None:
        z = z + z0.astype(jnp.float32)
    return z


def time_mix7(x, x_prev, v_first, layer: Params, cfg: LlamaConfig,
              wkv_state, compute_dtype):
    """One RWKV7 time-mix block. Returns (out, v_first, new_wkv_state)."""
    hs = cfg.head_dim
    b, t, c = x.shape
    h = c // hs
    xf = x.astype(jnp.float32)
    sx = (x_prev - x).astype(jnp.float32)

    fused = layer["time_mix_lerp_fused"].astype(jnp.float32).reshape(-1, c)
    n_stream = fused.shape[0]  # 6 with gating, 5 without
    streams = [xf + sx * fused[i] for i in range(n_stream)]
    xr, xw, xk, xv = streams[0], streams[1], streams[2], streams[3]
    xa = streams[4]
    xg = streams[5] if n_stream > 5 else None

    r = qmm(xr.astype(compute_dtype), layer["time_mix_receptance"],
            compute_dtype=compute_dtype).astype(jnp.float32)
    # w = exp(-e^{-0.5} · sigmoid(w0 + tanh(xw·w1)·w2))  (llm_build_rwkv7_base)
    wln = _lowrank(xw, layer, "w", act=jnp.tanh)
    w = jnp.exp(jax.nn.sigmoid(wln) * -0.606531)
    k = qmm(xk.astype(compute_dtype), layer["time_mix_key"],
            compute_dtype=compute_dtype).astype(jnp.float32)
    v = qmm(xv.astype(compute_dtype), layer["time_mix_value"],
            compute_dtype=compute_dtype).astype(jnp.float32)
    if v_first is None:
        v_first = v
    else:
        v = v + (v_first - v) * jax.nn.sigmoid(_lowrank(xv, layer, "v"))

    a = jax.nn.sigmoid(_lowrank(xa, layer, "a"))
    g = None
    if xg is not None and "time_mix_g1" in layer:
        g = _lowrank(xg, layer, "g", act=jax.nn.sigmoid)

    kk = (k * layer["time_mix_k_k"].astype(jnp.float32)).reshape(b, t, h, hs)
    # ggml_l2_norm: x / max(‖x‖, eps) (ggml-cpu/ops.cpp l2_norm, eps 1e-12)
    kk = kk / jnp.maximum(
        jnp.sqrt(jnp.sum(kk * kk, axis=-1, keepdims=True)), 1e-12)
    ka = k * layer["time_mix_k_a"].astype(jnp.float32)
    k = k + a * ka - ka

    rr = r.reshape(b, t, h, hs)
    ww = w.reshape(b, t, h, hs)
    kr = k.reshape(b, t, h, hs)
    vr = v.reshape(b, t, h, hs)
    ar = a.reshape(b, t, h, hs)
    y, s_new = _wkv7_scan(rr, ww, kr, vr, -kk, kk * ar, wkv_state)

    y2 = y.reshape(b * t, h, hs)
    if "time_mix_ln" in layer:
        # per-head group norm, eps 64e-5 (ggml_norm over each head)
        mu = y2.mean(-1, keepdims=True)
        var = y2.var(-1, keepdims=True)
        y2 = (y2 - mu) * jax.lax.rsqrt(var + 64e-5)
        y2 = y2.reshape(b, t, c) * layer["time_mix_ln"].astype(jnp.float32)
        y2 = y2 + layer["time_mix_ln_bias"].astype(jnp.float32)
    else:
        y2 = y2.reshape(b, t, c)
    # bonus term: y += v · Σ_head(k·r·r_k)
    r_k = layer["time_mix_r_k"].astype(jnp.float32).reshape(h, hs)
    rk = jnp.sum(kr * rr * r_k, axis=-1, keepdims=True)  # [B,T,H,1]
    y2 = y2 + (vr * rk).reshape(b, t, c)
    if g is not None:
        y2 = y2 * g
    out = qmm(y2.astype(compute_dtype), layer["time_mix_output"],
              compute_dtype=compute_dtype)
    return out, v_first, s_new


def channel_mix7(x, x_prev, layer: Params, compute_dtype):
    """RWKV7 channel mix (build_rwkv7_channel_mix): k-lerp shift, squared
    ReLU, no receptance gate."""
    sx = (x_prev - x).astype(jnp.float32)
    xk = x.astype(jnp.float32) + sx * layer["channel_mix_lerp_k"].astype(jnp.float32)
    kk = qmm(xk.astype(compute_dtype), layer["channel_mix_key"],
             compute_dtype=compute_dtype).astype(jnp.float32)
    kk = jnp.square(jnp.maximum(kk, 0.0))
    return qmm(kk.astype(compute_dtype), layer["channel_mix_value"],
               compute_dtype=compute_dtype)


def forward(params: Params, cfg: LlamaConfig, tokens: jax.Array,
            positions=None, state: RwkvState | None = None, n_past=0,
            mask=None, *, compute_dtype=jnp.float32, tap=None):
    """Returns (logits [B,T,V] f32, new state). Strictly left-to-right.

    arch == "rwkv7": LN everywhere + rwkv channel mix (llm_build_rwkv7).
    arch == "arwkv7": RMS norms + gated SiLU FFN, att shift only
    (llm_build_arwkv7)."""
    from ..ops import silu, take_rows

    pure = cfg.arch != "arwkv7"
    if state is None:
        state = RwkvState.create(cfg, tokens.shape[0])
    x = take_rows(params["token_embd"], tokens, dtype=compute_dtype)
    if pure and "token_embd_norm" in params:  # ln0
        x = layer_norm(x, params["token_embd_norm"],
                       params.get("token_embd_norm_bias"), cfg.rms_eps)
    v_first = None
    for il, layer in enumerate(params["layers"]):
        if pure:
            xin = layer_norm(x, layer["attn_norm"],
                             layer.get("attn_norm_bias"), cfg.rms_eps)
        else:
            xin = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        prev = state.shift_att[il].astype(xin.dtype)
        x_prev = _shifted(xin, prev)
        att, v_first, s_new = time_mix7(
            xin, x_prev, v_first, layer, cfg,
            state.wkv[il].astype(jnp.float32), compute_dtype,
        )
        state = RwkvState(
            state.shift_att.at[il].set(xin[:, -1, :].astype(state.shift_att.dtype)),
            state.shift_ffn,
            state.wkv.at[il].set(s_new.astype(state.wkv.dtype)),
        )
        x = x + att.astype(x.dtype)

        if pure:
            xin2 = layer_norm(x, layer["ffn_norm"],
                              layer.get("ffn_norm_bias"), cfg.rms_eps)
            prev2 = state.shift_ffn[il].astype(xin2.dtype)
            x_prev2 = _shifted(xin2, prev2)
            ffn = channel_mix7(xin2, x_prev2, layer, compute_dtype)
            state = RwkvState(
                state.shift_att,
                state.shift_ffn.at[il].set(
                    xin2[:, -1, :].astype(state.shift_ffn.dtype)),
                state.wkv,
            )
        else:
            xin2 = rms_norm(x, layer["ffn_norm"], cfg.rms_eps)
            gate = qmm(xin2, layer["ffn_gate"], compute_dtype=compute_dtype)
            up = qmm(xin2, layer["ffn_up"], compute_dtype=compute_dtype)
            ffn = qmm((silu(gate) * up).astype(compute_dtype),
                      layer["ffn_down"], compute_dtype=compute_dtype)
        x = x + ffn.astype(x.dtype)

    if pure:
        x = layer_norm(x, params["output_norm"],
                       params.get("output_norm_bias"), cfg.rms_eps)
    else:
        x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    logits = qmm(x, out_w, compute_dtype=compute_dtype)
    return logits.astype(jnp.float32), state


def wkv7_reference_numpy(r, w, k, v, a, b, s0):
    """Independent direct recurrence (test oracle for _wkv7_scan), written
    to the scalar semantics of ggml_compute_forward_rwkv_wkv7_f32."""
    bs, t, h, hs = r.shape
    s = s0.copy()
    ys = np.zeros_like(r)
    for ti in range(t):
        for bi in range(bs):
            for hi in range(h):
                sh = s[bi, hi]  # [i, j]
                sa = sh @ a[bi, ti, hi]  # [i]
                sh = (
                    np.outer(v[bi, ti, hi], k[bi, ti, hi])
                    + sh * w[bi, ti, hi][None, :]
                    + np.outer(sa, b[bi, ti, hi])
                )
                ys[bi, ti, hi] = sh @ r[bi, ti, hi]
                s[bi, hi] = sh
    return ys, s
