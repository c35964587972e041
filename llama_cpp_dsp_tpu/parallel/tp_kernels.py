"""Tensor-parallel decode WITH the fused Pallas kernels (shard_map).

GSPMD cannot partition a pallas_call, so the `-tp` serving path falls back
to XLA dequant (runtime/context.py). This module provides the pod-ready
alternative: weights are SLICED host-side (Megatron row/col split on the
packed QTensors), each shard gets its OWN kernel layout, and the decode
step runs under jax.shard_map — every device drives the same fused kernels
on its local shard, with `lax.psum` restoring activations after the
col-parallel projections (models/llama._psum_tp; cfg.tp_axis set here).

Scope: dense llama-family archs (no MoE / MLA / per-layer head counts),
no QKV fusion (row-splitting a fused block would interleave sections).

Role of the reference's LLAMA_SPLIT_MODE_ROW + CUDA split-buffer GEMV
(ggml/src/ggml-cuda/ggml-cuda.cu:761-900), redesigned for ICI collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.llama import LlamaConfig, forward
from ..ops.qtensor import QTensor
from ..runtime.kv_cache import causal_mask

# per-layer weight → shard dim (0 = rows/N, 1 = cols/K, None = replicate)
_RULES: dict[str, int | None] = {
    "attn_q": 0, "attn_k": 0, "attn_v": 0,
    "attn_output": 1,
    "ffn_gate": 0, "ffn_up": 0,
    "ffn_down": 1,
}


def _slice_qt(qt: QTensor, dim: int, tp: int, i: int) -> QTensor:
    """Shard i of a packed QTensor along logical dim (every field leads with
    N; all K-derived structure lives on field axis 1)."""
    n, k = qt.shape
    if dim == 0:
        step = n // tp
        arrays = {key: np.asarray(a)[i * step:(i + 1) * step]
                  for key, a in qt.arrays.items()}
        return QTensor(qt.kind, (step, k), arrays)
    arrays = {}
    for key, a in qt.arrays.items():
        a = np.asarray(a)
        step = a.shape[1] // tp
        arrays[key] = np.ascontiguousarray(a[:, i * step:(i + 1) * step])
    return QTensor(qt.kind, (n, k // tp), arrays)


def shard_llama_kernel_params(params: dict, cfg: LlamaConfig, tp: int):
    """params (QTensors, NOT kernel-converted) → (stacked_params, specs).

    Sharded weights become KernelWeights whose field arrays carry a LEADING
    shard axis (PartitionSpec("tp")); replicated leaves keep P(). The
    shard_map body drops the leading axis (arrays arrive [1, ...])."""
    from ..ops.pallas.layouts import KernelWeights, to_kernel_layout
    from ..ops.pallas.qmm import SUPPORTED_KINDS

    def conv_sharded(qt: QTensor, dim: int) -> KernelWeights:
        shards = [to_kernel_layout(_slice_qt(qt, dim, tp, i))
                  for i in range(tp)]
        arrays = {key: np.stack([s.arrays[key] for s in shards])
                  for key in shards[0].arrays}
        # sections marker tags the stacked leading shard axis so the
        # shard_map body knows to drop it (fusion is disabled on this path,
        # so sections is otherwise unused)
        return KernelWeights(qt.kind, shards[0].shape, arrays,
                             shards[0].tile_k, sections=("__tp__",))

    def replicated(leaf):
        if isinstance(leaf, QTensor) and leaf.kind in SUPPORTED_KINDS \
                and not leaf.n_expert:
            return to_kernel_layout(leaf)
        return leaf

    out: dict = {}
    spec: dict = {}
    for key, val in params.items():
        if key != "layers":
            # token_embd stays a QTensor (feeds the packed row gather —
            # convert_params_to_kernel does the same)
            out[key] = replicated(val) if key == "output" else val
            spec[key] = jax.tree.map(lambda _: P(), out[key])
            continue
        out_layers, spec_layers = [], []
        for layer in val:
            ol, sl = {}, {}
            for name, w in layer.items():
                dim = _RULES.get(name)
                granule = (32 if (isinstance(w, QTensor) and w.kind.name in
                                  ("Q8_0", "Q4_0", "Q4_1", "Q5_0", "Q5_1",
                                   "IQ4_NL"))
                           else 256)  # K-quants/IQ super-blocks span 256
                ok = (dim is not None and isinstance(w, QTensor)
                      and w.kind in SUPPORTED_KINDS and not w.n_expert
                      and w.shape[dim] % (tp * (granule if dim == 1 else 1))
                      == 0)
                if ok:
                    ol[name] = conv_sharded(w, dim)
                    sl[name] = jax.tree.map(lambda _: P("tp"), ol[name])
                else:
                    ol[name] = replicated(w)
                    sl[name] = jax.tree.map(lambda _: P(), ol[name])
            out_layers.append(ol)
            spec_layers.append(sl)
        out["layers"] = out_layers
        spec["layers"] = spec_layers
    return out, spec


def _drop_shard_axis(params):
    """Inside shard_map: sharded KernelWeights fields arrive [1, ...]."""
    from ..ops.pallas.layouts import KernelWeights

    def fix(node):
        if isinstance(node, KernelWeights) and node.sections == ("__tp__",):
            arrays = {k: a[0] for k, a in node.arrays.items()}
            return KernelWeights(node.kind, node.shape, arrays, node.tile_k)
        return node

    return jax.tree.map(fix, params,
                        is_leaf=lambda x: type(x).__name__ == "KernelWeights")


def make_tp_decode_step(cfg: LlamaConfig, mesh: Mesh, *,
                        compute_dtype=jnp.bfloat16, flash: bool = True):
    """Jitted shard_map decode step: (params_stacked, specs from
    shard_llama_kernel_params; cache sharded on KV heads)."""
    tp = mesh.shape["tp"]
    assert cfg.n_heads % tp == 0 and cfg.n_kv_heads % tp == 0, (cfg, tp)
    assert not cfg.n_expert and not cfg.kv_lora_rank and not cfg.n_heads_l
    cfg_local = dataclasses.replace(
        cfg, n_heads=cfg.n_heads // tp, n_kv_heads=cfg.n_kv_heads // tp,
        tp_axis="tp")

    cache_spec = P(None, "tp", None, None)

    def build(param_specs):
        import functools
        import warnings

        try:
            from jax import shard_map as _sm

            # new API: replication checking is `check_vma`
            shard_map = functools.partial(_sm, check_vma=False)
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map as _sme

            shard_map = functools.partial(_sme, check_rep=False)

        def local(params, cache, tokens, positions, n_past):
            params = _drop_shard_axis(params)
            mask = causal_mask(positions, cache.capacity, n_past)
            logits, cache = forward(
                params, cfg_local, tokens, positions, cache, n_past, mask,
                compute_dtype=compute_dtype, flash=flash,
            )
            return logits, cache

        def cache_specs(cache):
            return jax.tree.map(lambda _: cache_spec, cache)

        @partial(jax.jit, donate_argnums=(1,))
        def step(params, cache, tokens, positions, n_past):
            fn = shard_map(
                local, mesh=mesh,
                in_specs=(param_specs, cache_specs(cache), P(), P(), P()),
                out_specs=(P(), cache_specs(cache)),
            )
            return fn(params, cache, tokens, positions, n_past)

        return step

    return build
