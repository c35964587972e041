"""Mamba selective-state-space model.

Capability mirror of reference llm_build_mamba + ggml SSM_CONV/SSM_SCAN ops
(src/llama-model.cpp, ggml/src/ggml-cpu/ops.cpp ggml_compute_forward_ssm_scan),
designed TPU-first: the recurrence runs as a jax.lax.scan over time with the
channel dimension vectorized on the VPU, and the layer state (conv window +
SSM state) is an explicit functional cache like KVCache.

State layout:
  conv [L, B, d_conv-1, d_inner] — trailing conv inputs
  ssm  [L, B, d_inner, d_state]  — recurrent state h
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops import qmm, rms_norm, silu, take_rows
from .llama import LlamaConfig, Params


@jax.tree_util.register_pytree_node_class
@dataclass
class MambaState:
    conv: jax.Array  # [L, B, d_conv-1, d_inner]
    ssm: jax.Array  # [L, B, d_inner, d_state]

    def tree_flatten(self):
        return (self.conv, self.ssm), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, cfg: LlamaConfig, n_batch: int, dtype=jnp.float32) -> "MambaState":
        return cls(
            jnp.zeros((cfg.n_layers, n_batch, cfg.ssm_d_conv - 1, cfg.ssm_d_inner), dtype),
            jnp.zeros((cfg.n_layers, n_batch, cfg.ssm_d_inner, cfg.ssm_d_state), dtype),
        )


def _causal_conv(x: jax.Array, prev: jax.Array, weight: jax.Array, bias):
    """Depthwise causal conv over time.

    x [B,T,Ci], prev [B,d_conv-1,Ci], weight [Ci,d_conv] → (y [B,T,Ci], new_prev).
    Matches reference ggml_ssm_conv (ggml/src/ggml-cpu/ops.cpp)."""
    dconv = weight.shape[1]
    full = jnp.concatenate([prev, x], axis=1)  # [B, T+dconv-1, Ci]
    # gather the dconv-wide window ending at each t: stack shifted views
    windows = jnp.stack(
        [full[:, i : i + x.shape[1], :] for i in range(dconv)], axis=-1
    )  # [B,T,Ci,dconv]
    y = jnp.einsum("btcd,cd->btc", windows.astype(jnp.float32), weight.astype(jnp.float32))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    new_prev = full[:, full.shape[1] - (dconv - 1) :, :]
    return y, new_prev


def _ssm_scan(x, dt, a, b_t, c_t, h0):
    """Selective scan — reference ggml_ssm_scan semantics.

    x,dt [B,T,Ci]; a [Ci,S]; b_t,c_t [B,T,S]; h0 [B,Ci,S].
    h_t = exp(dt⊙A)·h_{t-1} + (dt⊙x)·B_tᵀ ;  y_t = C_t·h_t
    Returns (y [B,T,Ci], hT)."""
    da = jnp.exp(dt[..., None] * a[None, None, :, :])  # [B,T,Ci,S]
    dx = (dt * x)[..., None] * b_t[:, :, None, :]  # [B,T,Ci,S]

    def step(h, inp):
        da_t, dx_t, ct = inp
        h = da_t * h + dx_t
        y = jnp.einsum("bcs,bs->bc", h, ct)
        return h, y

    hT, ys = jax.lax.scan(
        step,
        h0,
        (da.transpose(1, 0, 2, 3), dx.transpose(1, 0, 2, 3), c_t.transpose(1, 0, 2)),
    )
    return ys.transpose(1, 0, 2), hT  # [B,T,Ci]


def mamba_layer(
    x: jax.Array,  # [B,T,C]
    layer: Params,
    cfg: LlamaConfig,
    state: MambaState,
    layer_idx: int,
    compute_dtype,
):
    ci, s, r = cfg.ssm_d_inner, cfg.ssm_d_state, cfg.ssm_dt_rank

    xin = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
    xz = qmm(xin, layer["ssm_in"], compute_dtype=compute_dtype)  # [B,T,2*Ci]
    xp = xz[..., :ci].astype(jnp.float32)
    z = xz[..., ci:].astype(jnp.float32)

    conv_prev = state.conv[layer_idx]
    xc, conv_new = _causal_conv(xp, conv_prev, jnp.asarray(layer["ssm_conv1d"]),
                                layer.get("ssm_conv1d_bias"))
    xc = xc * jax.nn.sigmoid(xc)  # SiLU

    xdb = qmm(xc.astype(compute_dtype), layer["ssm_x"], compute_dtype=compute_dtype)
    dt, b_t, c_t = (xdb[..., :r].astype(jnp.float32),
                    xdb[..., r : r + s].astype(jnp.float32),
                    xdb[..., r + s :].astype(jnp.float32))
    if cfg.ssm_dt_b_c_rms:
        # falcon-mamba: weightless rms on each split (reference
        # llm_build_mamba, src/llama-model.cpp:8735-8740)
        dt = rms_norm(dt, None, cfg.rms_eps)
        b_t = rms_norm(b_t, None, cfg.rms_eps)
        c_t = rms_norm(c_t, None, cfg.rms_eps)
    dt = qmm(dt.astype(compute_dtype), layer["ssm_dt"], compute_dtype=compute_dtype)
    dt = jax.nn.softplus(dt.astype(jnp.float32) + layer["ssm_dt_bias"].astype(jnp.float32))
    a = -jnp.exp(jnp.asarray(layer["ssm_a"], jnp.float32))  # [Ci,S]

    y, hT = _ssm_scan(xc, dt, a, b_t, c_t, state.ssm[layer_idx].astype(jnp.float32))
    y = y + xc * jnp.asarray(layer["ssm_d"], jnp.float32)
    y = y * (z * jax.nn.sigmoid(z))  # gate with SiLU(z)

    out = qmm(y.astype(compute_dtype), layer["ssm_out"], compute_dtype=compute_dtype)
    state = MambaState(
        state.conv.at[layer_idx].set(conv_new.astype(state.conv.dtype)),
        state.ssm.at[layer_idx].set(hT.astype(state.ssm.dtype)),
    )
    return x + out.astype(x.dtype), state


def forward(
    params: Params,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B,T]
    positions=None,  # unused (recurrent)
    state: MambaState | None = None,
    n_past=0,  # unused
    mask=None,  # unused
    *,
    compute_dtype=jnp.float32,
    tap=None,
):
    """Returns (logits [B,T,V] f32, new state). Tokens are consumed strictly
    left-to-right; incremental decode passes the running state back in."""
    if state is None:
        state = MambaState.create(cfg, tokens.shape[0])
    x = take_rows(params["token_embd"], tokens, dtype=compute_dtype)
    for i, layer in enumerate(params["layers"]):
        x, state = mamba_layer(x, layer, cfg, state, i, compute_dtype)
    x = rms_norm(x, params["output_norm"], cfg.rms_eps)
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    logits = qmm(x, out_w, compute_dtype=compute_dtype)
    return logits.astype(jnp.float32), state
