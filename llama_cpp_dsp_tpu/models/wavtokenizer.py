"""WavTokenizer decoder (audio codec vocoder head).

Capability mirror of reference llm_build_wavtokenizer_dec
(src/llama-model.cpp:12254-12404): codebook-token embedding → 7-wide conv →
PosNet (resnet ×2, single-head conv attention, resnet ×2, group norm) →
token LayerNorm → ConvNeXt blocks (depthwise conv, LN, GELU pointwise MLP,
learnable gamma) → output projection. The result is the spectrogram-feature
"embd" tensor consumed by the TTS example's vocoder tail
(examples/tts/tts.cpp embd_to_audio).

TPU-native: convs via lax.conv_general_dilated in NCW layout with SAME
padding; everything runs dense in f32 (these nets are tiny relative to the
LM — the reference also keeps them f32).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class WavTokenizerConfig:
    n_vocab: int
    n_embd_features: int  # codebook dim (features_length)
    posnet_embd: int
    posnet_layers: int
    convnext_embd: int
    convnext_layers: int
    n_out: int  # output projection width (spectrogram features)
    norm_eps: float = 1e-5
    group_eps: float = 1e-6
    n_groups: int = 32

    @classmethod
    def from_gguf_kv(cls, kv: dict[str, Any]) -> "WavTokenizerConfig":
        arch = str(kv.get("general.architecture", "wavtokenizer-dec"))
        g = lambda key, d=None: kv.get(f"{arch}.{key}", d)
        return cls(
            n_vocab=int(g("vocab_size", 4096) or 4096),
            n_embd_features=int(g("features_length", 512) or 512),
            posnet_embd=int(g("posnet.embedding_length", 768) or 768),
            posnet_layers=int(g("posnet.block_count", 6) or 6),
            convnext_embd=int(g("convnext.embedding_length", 768) or 768),
            convnext_layers=int(g("convnext.block_count", 12) or 12),
            n_out=int(g("output_size", 1282) or 1282),
            norm_eps=float(g("attention.layer_norm_epsilon", 1e-5) or 1e-5),
            group_eps=float(g("attention.group_norm_epsilon", 1e-6) or 1e-6),
            n_groups=int(g("attention.group_norm_groups", 32) or 32),
        )


def _conv1d_same(x, w, b, groups: int = 1):
    """x [B, C, T], w [Cout, Cin/groups, K] → [B, Cout, T] with SAME padding
    (ggml_conv_1d_ph: pad = K//2)."""
    k = w.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(k // 2, (k - 1) // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups,
    )
    if b is not None:
        y = y + b.reshape(1, -1, 1)
    return y


def _group_norm(x, w, b, n_groups: int, eps: float):
    """x [B, C, T] — normalize per (group, batch) over (C/G, T) like
    ggml_group_norm (LLM_NORM_GROUP); affine is per-channel."""
    bdim, c, t = x.shape
    g = x.reshape(bdim, n_groups, c // n_groups, t)
    mu = g.mean(axis=(2, 3), keepdims=True)
    var = g.var(axis=(2, 3), keepdims=True)
    y = ((g - mu) * jax.lax.rsqrt(var + eps)).reshape(bdim, c, t)
    return y * w.reshape(1, -1, 1) + b.reshape(1, -1, 1)


def _layer_norm_t(x, w, b, eps):
    """LN over the channel axis of [B, T, C]."""
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * w + b


def forward(params: dict, cfg: WavTokenizerConfig, tokens: jax.Array):
    """tokens [B, T] codebook ids → features [B, T, n_out] f32."""
    emb = params["token_embd"]  # [V, feat]
    x = jnp.take(emb, tokens, axis=0).astype(jnp.float32)  # [B, T, feat]
    x = x.transpose(0, 2, 1)  # [B, feat, T]
    x = _conv1d_same(x, params["conv1d"], params.get("conv1d_bias"))

    # posnet: resnet, resnet, attn, resnet, resnet, norm
    for il, layer in enumerate(params["posnet"]):
        res = x
        if "conv1" in layer:  # resnet block
            h = _group_norm(x, layer["norm1"], layer["norm1_bias"],
                            cfg.n_groups, cfg.group_eps)
            h = h * jax.nn.sigmoid(h)
            h = _conv1d_same(h, layer["conv1"], layer.get("conv1_bias"))
            h = _group_norm(h, layer["norm2"], layer["norm2_bias"],
                            cfg.n_groups, cfg.group_eps)
            h = h * jax.nn.sigmoid(h)
            h = _conv1d_same(h, layer["conv2"], layer.get("conv2_bias"))
            x = h + res
        elif "attn_q" in layer:  # single-head conv attention
            h = _group_norm(x, layer["attn_norm"], layer["attn_norm_bias"],
                            cfg.n_groups, cfg.group_eps)
            q = _conv1d_same(h, layer["attn_q"], layer.get("attn_q_bias"))
            k = _conv1d_same(h, layer["attn_k"], layer.get("attn_k_bias"))
            v = _conv1d_same(h, layer["attn_v"], layer.get("attn_v_bias"))
            scores = jnp.einsum("bct,bcs->bts", q, k) / np.sqrt(cfg.posnet_embd)
            probs = jax.nn.softmax(scores, axis=-1)
            h = jnp.einsum("bts,bcs->bct", probs, v)
            h = _conv1d_same(h, layer["attn_output"],
                             layer.get("attn_output_bias"))
            x = h + res
        else:  # final group norm
            x = _group_norm(x, layer["norm"], layer["norm_bias"],
                            cfg.n_groups, cfg.group_eps)

    x = x.transpose(0, 2, 1)  # [B, T, C]
    x = _layer_norm_t(x, params["token_embd_norm"],
                      params["token_embd_norm_bias"], cfg.norm_eps)
    x = x.transpose(0, 2, 1)

    # convnext blocks
    for layer in params["convnext"]:
        res = x
        h = _conv1d_same(x, layer["dw"], layer.get("dw_bias"),
                         groups=x.shape[1])
        h = h.transpose(0, 2, 1)
        h = _layer_norm_t(h, layer["norm"], layer["norm_bias"], cfg.norm_eps)
        h = h @ layer["pw1"].T + layer["pw1_bias"]
        h = jax.nn.gelu(h, approximate=False)
        h = h @ layer["pw2"].T + layer["pw2_bias"]
        h = h * layer["gamma"]
        x = h.transpose(0, 2, 1) + res

    x = x.transpose(0, 2, 1)
    x = _layer_norm_t(x, params["output_norm"], params["output_norm_bias"],
                      cfg.norm_eps)
    out = x @ params["output"].T
    if "output_bias" in params:
        out = out + params["output_bias"]
    return out.astype(jnp.float32)


# per-layer GGUF suffix → param key (reference LLM_ARCH_WAVTOKENIZER_DEC
# tensor table, src/llama-arch.cpp)
_POSNET = {
    "norm1": "norm1", "conv1": "conv1", "norm2": "norm2", "conv2": "conv2",
    "attn_norm": "attn_norm", "attn_q": "attn_q", "attn_k": "attn_k",
    "attn_v": "attn_v", "attn_output": "attn_output", "norm": "norm",
}
_CONVNEXT = {"dw": "dw", "norm": "norm", "pw1": "pw1", "pw2": "pw2",
             "gamma": "gamma"}


def load_wavtokenizer(path: str):
    """WavTokenizer GGUF → (cfg, params). Conv weights keep ggml's
    [Cout, Cin, K] layout (np_shape reversal of ne {K, Cin, Cout})."""
    from ..gguf.reader import GGUFModel
    from ..quant.ref_numpy import dequantize

    gm = GGUFModel.load(path)
    cfg = WavTokenizerConfig.from_gguf_kv(gm.kv)
    params: dict[str, Any] = {
        "posnet": [{} for _ in range(cfg.posnet_layers)],
        "convnext": [{} for _ in range(cfg.convnext_layers)],
    }

    def dense(info):
        a = np.asarray(dequantize(info.data, info.ggml_type, info.np_shape))
        if a.ndim == 2 and a.shape[-1] == 1:  # ne {1, C} bias/norm → [C]
            a = a[:, 0]
        return jnp.asarray(a, jnp.float32)

    for name, info in gm.tensors.items():
        base = name
        suffix = ""
        if name.endswith(".weight"):
            base = name[: -len(".weight")]
        elif name.endswith(".bias"):
            base = name[: -len(".bias")]
            suffix = "_bias"
        arr = dense(info)
        if base.startswith("posnet."):
            _, idx, rest = base.split(".", 2)
            params["posnet"][int(idx)][_POSNET[rest] + suffix] = arr
        elif base.startswith("convnext."):
            _, idx, rest = base.split(".", 2)
            params["convnext"][int(idx)][_CONVNEXT[rest] + suffix] = arr
        else:
            params[base.replace(".", "_") + suffix] = arr
    cfg_out = params["output"].shape[0]
    if cfg_out != cfg.n_out:
        import dataclasses

        cfg = dataclasses.replace(cfg, n_out=cfg_out)
    return cfg, params
