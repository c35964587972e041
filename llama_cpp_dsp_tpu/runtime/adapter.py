"""LoRA adapters + control vectors.

Capability mirror of reference llama-adapter.{h,cpp} (llama_adapter_lora
ab_map, src/llama-adapter.h:46-66; llama_adapter_cvec) and the graph-time
application in build_lora_mm (src/llama-graph.cpp): the base weight stays
packed/quantized and the rank-r delta W + scale·B·A is applied as two skinny
matmuls per call — LoRA never merges, so hot-swap is free.

GGUF adapter files follow the reference convention: general.type="adapter",
adapter.type="lora", adapter.lora.alpha; tensors "<base>.weight.lora_a"
[r, K] and "<base>.weight.lora_b" [N, r].
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..gguf.reader import GGUFModel

log = logging.getLogger(__name__)

ALPHA_KEY = "adapter.lora.alpha"
TYPE_KEY = "adapter.type"


@dataclass
class LoraAdapter:
    """ab_map: param-key path → (a [r, K], b [N, r]) f32 pairs."""

    alpha: float
    ab: dict[str, tuple[np.ndarray, np.ndarray]] = field(default_factory=dict)

    @property
    def rank(self) -> int:
        for a, _ in self.ab.values():
            return a.shape[0]
        return 0

    def scale(self, adapter_scale: float = 1.0) -> float:
        """alpha/r · user scale — reference llama_adapter_lora_weight.get_scale."""
        r = self.rank or 1
        return self.alpha / r * adapter_scale


def load_lora(path: str) -> LoraAdapter:
    gm = GGUFModel.load(path)
    if str(gm.kv.get(TYPE_KEY, "lora")) != "lora":
        raise ValueError(f"not a lora adapter: {gm.kv.get(TYPE_KEY)}")
    alpha = float(gm.kv.get(ALPHA_KEY, 16.0))
    from ..quant.ref_numpy import dequantize

    pairs: dict[str, dict[str, np.ndarray]] = {}
    for name, info in gm.tensors.items():
        for suffix, key in ((".weight.lora_a", "a"), (".weight.lora_b", "b")):
            if name.endswith(suffix):
                base = name[: -len(suffix)]
                pairs.setdefault(base, {})[key] = dequantize(
                    np.asarray(info.data), info.ggml_type, info.np_shape
                ).astype(np.float32)
    ab = {}
    for base, p in pairs.items():
        if "a" in p and "b" in p:
            ab[base] = (p["a"], p["b"])
        else:
            log.warning("lora tensor pair incomplete for %s", base)
    return LoraAdapter(alpha, ab)


# GGUF tensor base names → (layer key) — reuses the loader's mapping
_NAME_TO_KEY = {
    "attn_q": "attn_q",
    "attn_k": "attn_k",
    "attn_v": "attn_v",
    "attn_output": "attn_output",
    "ffn_gate": "ffn_gate",
    "ffn_up": "ffn_up",
    "ffn_down": "ffn_down",
}


def apply_lora(params: dict[str, Any], adapter: LoraAdapter,
               adapter_scale: float = 1.0) -> dict[str, Any]:
    """Inject `<key>_lora_a` / `<key>_lora_b` entries next to the base
    weights (b is pre-multiplied by the net scale). Returns new params
    sharing the base weight arrays."""
    s = adapter.scale(adapter_scale)
    params = dict(params)
    params["layers"] = [dict(layer) for layer in params["layers"]]
    n_applied = 0
    for base, (a, b) in adapter.ab.items():
        if base.startswith("blk."):
            _, idx, rest = base.split(".", 2)
            key = _NAME_TO_KEY.get(rest)
            if key is None:
                log.warning("lora: unmapped tensor %s", base)
                continue
            layer = params["layers"][int(idx)]
            layer[key + "_lora_a"] = a
            layer[key + "_lora_b"] = (b * s).astype(np.float32)
            n_applied += 1
        elif base == "output":
            params["output_lora_a"] = a
            params["output_lora_b"] = (b * s).astype(np.float32)
            n_applied += 1
    log.info("lora: applied %d tensor pairs (scale %.4f)", n_applied, s)
    return params


def strip_lora(params: dict[str, Any]) -> dict[str, Any]:
    """Remove all LoRA entries (hot-swap off)."""
    def clean(d):
        return {k: v for k, v in d.items() if "_lora_" not in k}

    params = clean(params)
    params["layers"] = [clean(layer) for layer in params["layers"]]
    return params


def load_control_vector(path: str, n_layers: int) -> np.ndarray:
    """Control-vector GGUF → [n_layers, n_embd] directions. Reference
    format: tensors "direction.<layer>", 1-based (common_control_vector_load,
    common/common.cpp:1450-1490); missing layers stay zero."""
    from ..quant.ref_numpy import dequantize

    gm = GGUFModel.load(path)
    dirs: dict[int, np.ndarray] = {}
    for name, info in gm.tensors.items():
        if not name.startswith("direction."):
            continue
        il = int(name.split(".", 1)[1])
        dirs[il] = np.asarray(
            dequantize(np.asarray(info.data), info.ggml_type, info.np_shape),
            np.float32,
        ).reshape(-1)
    if not dirs:
        raise ValueError(f"no direction tensors in {path}")
    n_embd = next(iter(dirs.values())).shape[0]
    out = np.zeros((n_layers, n_embd), np.float32)
    for il, v in dirs.items():
        if 1 <= il <= n_layers:
            out[il - 1] = v
    return out


def apply_control_vector(params: dict[str, Any], directions: np.ndarray,
                         scale: float = 1.0, layer_start: int = 0,
                         layer_end: int | None = None) -> dict[str, Any]:
    """Per-layer bias added to the hidden state after each block —
    reference llama_adapter_cvec (src/llama-adapter.cpp control vectors).
    directions: [n_layers, n_embd] (or [n_embd] broadcast)."""
    params = dict(params)
    layers = [dict(layer) for layer in params["layers"]]
    if directions.ndim == 1:
        directions = np.broadcast_to(directions, (len(layers), directions.shape[0]))
    end = layer_end if layer_end is not None else len(layers)
    for i, layer in enumerate(layers):
        if layer_start <= i < end and i < directions.shape[0]:
            layer["cvec"] = (directions[i] * scale).astype(np.float32)
    params["layers"] = layers
    return params


