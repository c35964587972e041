"""Multi-chip sharding (SPMD over a jax Mesh).

TPU-native replacement for the reference's LLAMA_SPLIT_MODE_{LAYER,ROW}
weight placement (src/llama-model.cpp:247-347), the scheduler's pipeline
parallelism (ggml-backend.cpp:620-666), and the ggml-rpc distributed backend
(ggml-rpc.cpp): weights are annotated with NamedShardings over a
("dp", "tp") mesh; GSPMD inserts the all-reduces/all-gathers over ICI.

Megatron-style layout:
- attn q/k/v: row-parallel (shard output heads on "tp")
- attn output: col-parallel (shard input on "tp") → psum after
- ffn gate/up: row-parallel; ffn down: col-parallel → psum after
- token_embd / output: vocab-sharded on "tp" (logits all-gathered)
- MoE expert weights: experts sharded on "tp" (expert parallelism)
- KV cache: heads sharded on "tp", batch on "dp"
- activations: batch on "dp", replicated on "tp"
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import LlamaConfig
from ..ops.qtensor import QTensor


@dataclass(frozen=True)
class ShardingConfig:
    tp: int = 1
    dp: int = 1

    @property
    def n_devices(self) -> int:
        return self.tp * self.dp


def make_mesh(sc: ShardingConfig, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= sc.n_devices, (len(devices), sc.n_devices)
    arr = np.asarray(devices[: sc.n_devices]).reshape(sc.dp, sc.tp)
    return Mesh(arr, ("dp", "tp"))


def _divisible(n: int, parts: int) -> bool:
    return parts > 0 and n % parts == 0


def _weight_spec(shard_dim: int | None, ndim: int) -> P:
    """PartitionSpec sharding dimension `shard_dim` of an ndim-array on tp."""
    if shard_dim is None:
        return P(*([None] * ndim))
    spec = [None] * ndim
    spec[shard_dim] = "tp"
    return P(*spec)


def _qtensor_spec(qt: QTensor, logical_dim: int | None, tp: int):
    """Per-field PartitionSpecs for a QTensor sharded on logical dim.

    logical_dim 0 = rows (N), 1 = cols (K); every field's leading dims mirror
    [N] or [N, K-derived...]: row fields shard dim 0 (after any expert axis);
    col sharding shards the K-derived dim 1 where divisible.
    """
    n, k = qt.shape
    specs = {}
    for name, arr in qt.arrays.items():
        ndim = arr.ndim
        if qt.n_expert:
            # expert-parallel: shard the leading expert axis
            ok = tp > 1 and _divisible(qt.n_expert, tp)
            specs[name] = _weight_spec(0 if ok else None, ndim)
            continue
        if logical_dim == 0:
            ok = _divisible(arr.shape[0], tp)
            specs[name] = _weight_spec(0 if ok else None, ndim)
        elif logical_dim == 1 and ndim >= 2:
            ok = _divisible(arr.shape[1], tp)
            specs[name] = _weight_spec(1 if ok else None, ndim)
        else:
            specs[name] = _weight_spec(None, ndim)
    return specs


# logical shard dim per layer weight (0=rows/outputs, 1=cols/inputs, None=replicate)
_LAYER_RULES: dict[str, int | None] = {
    "attn_q": 0,
    "attn_k": 0,
    "attn_v": 0,
    "attn_q_bias": 0,
    "attn_k_bias": 0,
    "attn_v_bias": 0,
    "attn_output": 1,
    "ffn_gate": 0,
    "ffn_up": 0,
    "ffn_down": 1,
    "ffn_gate_inp": None,
    "ffn_gate_exps": 0,  # expert axis handled in _qtensor_spec
    "ffn_up_exps": 0,
    "ffn_down_exps": 1,
    "attn_norm": None,
    "ffn_norm": None,
    "attn_q_norm": None,
    "attn_k_norm": None,
    "rope_freqs": None,
}

_GLOBAL_RULES: dict[str, int | None] = {
    "token_embd": 0,  # vocab-sharded
    "output": 0,  # vocab-sharded (logits all-gathered by out sharding)
    "output_norm": None,
}


def _apply(leaf, rule: int | None, mesh: Mesh, tp: int):
    if leaf is None:
        return None
    if isinstance(leaf, QTensor):
        specs = _qtensor_spec(leaf, rule, tp)
        arrays = {
            k: jax.device_put(a, NamedSharding(mesh, specs[k])) for k, a in leaf.arrays.items()
        }
        return QTensor(leaf.kind, leaf.shape, arrays, leaf.n_expert)
    arr = np.asarray(leaf)
    if rule is not None and arr.ndim >= 1 and _divisible(arr.shape[rule if rule < arr.ndim else 0], tp):
        dim = rule if rule < arr.ndim else 0
        return jax.device_put(arr, NamedSharding(mesh, _weight_spec(dim, arr.ndim)))
    return jax.device_put(arr, NamedSharding(mesh, _weight_spec(None, arr.ndim)))


def shard_params(params: dict, cfg: LlamaConfig, mesh: Mesh) -> dict:
    """device_put every weight with its tensor-parallel NamedSharding."""
    tp = mesh.shape["tp"]
    out: dict = {}
    for key, val in params.items():
        if key == "layers":
            out["layers"] = [
                {k: _apply(v, _LAYER_RULES.get(k), mesh, tp) for k, v in layer.items()}
                for layer in val
            ]
        else:
            out[key] = _apply(val, _GLOBAL_RULES.get(key), mesh, tp)
    return out


def cache_sharding(mesh: Mesh) -> NamedSharding:
    """KV cache layers [B, Hkv, S, D]: batch on dp, kv heads on tp (applied
    to every per-layer leaf of the cache pytree)."""
    return NamedSharding(mesh, P("dp", "tp", None, None))


def activation_sharding(mesh: Mesh) -> NamedSharding:
    """tokens/positions [B, T]: batch on dp."""
    return NamedSharding(mesh, P("dp", None))
