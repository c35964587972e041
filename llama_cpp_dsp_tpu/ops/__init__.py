"""Core compute ops.

The reference's ggml op set (ggml/include/ggml.h:430-520) dissolves into XLA:
only the ops that carry framework semantics live here — quantized matmul
(MUL_MAT over packed weights), quantized row gather (GET_ROWS), RoPE, norms,
activations, attention. Everything else is plain jnp and fuses in XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..gguf.constants import GGMLType
from ..quant.jax_dequant import dequant
from .qtensor import QTensor

Weight = QTensor | jax.Array


def qmm(x: jax.Array, w: Weight, *, compute_dtype=jnp.bfloat16) -> jax.Array:
    """y = x @ W^T — ggml_mul_mat semantics (W is [N, K] row-major).

    KernelWeights → fused Pallas dequant-matmul (packed weights streamed
    from HBM); QTensor → XLA dequantize-then-contract; dense → plain MXU.
    (fused-FFN path; see qmm_fused).
    """
    from .pallas.layouts import KernelWeights
    from .pallas.qmm import qmm_fused

    if isinstance(w, KernelWeights):
        return qmm_fused(x, w)
    if isinstance(w, QTensor):
        wmat = dequant(w, compute_dtype)
    else:
        wmat = w.astype(compute_dtype)
    y = jax.lax.dot_general(
        x.astype(compute_dtype),
        wmat,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y


def take_rows(w: Weight, ids: jax.Array, *, dtype=jnp.float32) -> jax.Array:
    """Dequantized row gather — ggml GET_ROWS over packed weights.

    Gathers the packed per-row fields first, then dequantizes only the
    gathered rows (keeps big embedding tables packed in HBM).
    """
    if isinstance(w, QTensor):
        flat_ids = ids.reshape(-1)
        sub = QTensor(
            w.kind,
            (flat_ids.shape[0], w.shape[1]),
            {k: jnp.take(a, flat_ids, axis=0) for k, a in w.arrays.items()},
        )
        rows = dequant(sub, dtype)
        return rows.reshape(*ids.shape, w.shape[1])
    return jnp.take(w, ids, axis=0).astype(dtype)


def rms_norm(x: jax.Array, weight: jax.Array | None, eps: float) -> jax.Array:
    """ggml_rms_norm + mul: f32 statistics like the reference CPU/CUDA kernels.
    weight=None → non-parametric (reference build_norm with NULL weight)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array | None, bias: jax.Array | None, eps: float
) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def silu(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(x.dtype)


def softmax_f32(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis)


__all__ = [
    "GGMLType",
    "QTensor",
    "Weight",
    "dequant",
    "gelu",
    "layer_norm",
    "qmm",
    "rms_norm",
    "silu",
    "softmax_f32",
    "take_rows",
]
