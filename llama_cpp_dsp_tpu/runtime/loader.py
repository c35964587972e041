"""Model loader: GGUF file(s) → (config, params pytree, vocab).

Capability mirror of reference llama_model_loader + llama_model::load_tensors
(src/llama-model-loader.cpp:443, src/llama-model.cpp:1417): mmap the shards,
map tensor names into the model pytree, repack quant blocks into QTensor
device layouts. Device placement/sharding is applied by the caller
(parallel/ for multi-chip; plain device_put single-chip).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Any

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFModel
from ..models.llama import LlamaConfig
from ..ops.qtensor import PACKED_KINDS, QTensor, from_gguf_tensor
from ..tokenizer import Tokenizer, Vocab

log = logging.getLogger(__name__)

# per-layer tensor suffixes → param keys (subset of reference llama-arch.cpp
# LLM_TENSOR_NAMES relevant to the llama family)
_LAYER_TENSORS = {
    "attn_norm.weight": "attn_norm",
    "attn_q.weight": "attn_q",
    "attn_k.weight": "attn_k",
    "attn_v.weight": "attn_v",
    "attn_output.weight": "attn_output",
    "attn_q.bias": "attn_q_bias",
    "attn_k.bias": "attn_k_bias",
    "attn_v.bias": "attn_v_bias",
    "attn_q_norm.weight": "attn_q_norm",
    "attn_k_norm.weight": "attn_k_norm",
    "ffn_norm.weight": "ffn_norm",
    "ffn_gate.weight": "ffn_gate",
    "ffn_up.weight": "ffn_up",
    "ffn_down.weight": "ffn_down",
    "ffn_gate_inp.weight": "ffn_gate_inp",
    "ffn_gate_exps.weight": "ffn_gate_exps",
    "ffn_up_exps.weight": "ffn_up_exps",
    "ffn_down_exps.weight": "ffn_down_exps",
}

_GLOBAL_TENSORS = {
    "token_embd.weight": "token_embd",
    "output_norm.weight": "output_norm",
    "output.weight": "output",
    "rope_freqs.weight": "rope_freqs",
}


def _convert(raw: np.ndarray, kind: GGMLType, np_shape: tuple[int, ...]):
    if len(np_shape) == 3 and kind in PACKED_KINDS:
        # expert-stacked weights [E, N, K]: repack as (E*N, K), then add the
        # expert axis back onto every field
        e, n, k = np_shape
        qt = from_gguf_tensor(raw, kind, (e * n, k))
        assert isinstance(qt, QTensor)
        arrays = {key: a.reshape(e, n, *a.shape[1:]) for key, a in qt.arrays.items()}
        return QTensor(kind, (n, k), arrays, n_expert=e)
    return from_gguf_tensor(raw, kind, np_shape)


@dataclass
class LoadedModel:
    cfg: LlamaConfig
    params: dict[str, Any]
    vocab: Vocab
    tokenizer: Tokenizer | None
    kv: dict[str, Any]

    @property
    def n_bytes(self) -> int:
        total = 0
        for leaf in _iter_leaves(self.params):
            total += leaf.nbytes
        return total


def _iter_leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _iter_leaves(v)
    elif isinstance(tree, list):
        for v in tree:
            yield from _iter_leaves(v)
    elif isinstance(tree, QTensor):
        yield from tree.arrays.values()
    elif tree is not None:
        yield tree


def load_model(path: str, *, with_tokenizer: bool = True) -> LoadedModel:
    gm = GGUFModel.load(path)
    cfg = LlamaConfig.from_gguf_kv(gm.kv)
    params: dict[str, Any] = {"layers": [{} for _ in range(cfg.n_layers)]}

    for name, info in gm.tensors.items():
        raw = info.data
        assert raw is not None, name
        if name in _GLOBAL_TENSORS:
            params[_GLOBAL_TENSORS[name]] = _convert(raw, info.ggml_type, info.np_shape)
            continue
        if name.startswith("blk."):
            _, idx, rest = name.split(".", 2)
            key = _LAYER_TENSORS.get(rest)
            if key is None:
                log.warning("unmapped tensor %s", name)
                continue
            params["layers"][int(idx)][key] = _convert(raw, info.ggml_type, info.np_shape)
            continue
        log.warning("unmapped tensor %s", name)

    # share rope_freqs into each layer (same array, no copy)
    ff = params.pop("rope_freqs", None)
    if ff is not None:
        for layer in params["layers"]:
            layer["rope_freqs"] = ff

    vocab = Vocab.from_gguf_kv(gm.kv)
    tokenizer = None
    if with_tokenizer:
        try:
            tokenizer = Tokenizer(vocab)
        except NotImplementedError:
            log.warning("no tokenizer for vocab type %s", vocab.vocab_type)
    return LoadedModel(cfg, params, vocab, tokenizer, gm.kv)
