"""CLIP ViT vision encoder + LLaVA multimodal projector.

Capability mirror of reference examples/llava/clip.cpp (2882 LoC): loads a
GGUF mmproj file ("v.*" vision tower + "mm.*" projector tensors), runs the
ViT on preprocessed pixels, selects the penultimate layer's patch features,
and projects them into the LLM's embedding space for injection into the
decode stream (llava_eval_image_embed).

JAX-native: the whole tower is one jitted function; the patch conv is a
single reshaped matmul on the MXU (XLA lowers conv of non-overlapping
patches to exactly that).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ClipConfig:
    image_size: int = 224
    patch_size: int = 14
    n_embd: int = 1024
    n_ff: int = 4096
    n_layers: int = 24
    n_heads: int = 16
    eps: float = 1e-5
    proj_dim: int = 4096  # LLM embedding size
    select_layer: int = -2  # llava default: penultimate layer
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def from_gguf_kv(cls, kv: dict[str, Any]) -> "ClipConfig":
        g = lambda k, d=None: kv.get(f"clip.vision.{k}", d)
        return cls(
            image_size=int(g("image_size", 224)),
            patch_size=int(g("patch_size", 14)),
            n_embd=int(g("embedding_length", 1024)),
            n_ff=int(g("feed_forward_length", 4096)),
            n_layers=int(g("block_count", 24)),
            n_heads=int(g("attention.head_count", 16)),
            eps=float(g("attention.layer_norm_epsilon", 1e-5)),
            proj_dim=int(kv.get("clip.vision.projection_dim", 4096)),
            image_mean=tuple(kv.get("clip.vision.image_mean",
                                    cls.image_mean)),
            image_std=tuple(kv.get("clip.vision.image_std", cls.image_std)),
        )


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _attn(x, layer, cfg: ClipConfig):
    b, t, c = x.shape
    h = cfg.n_heads
    d = c // h
    q = (x @ layer["attn_q"].T + layer["attn_q_b"]).reshape(b, t, h, d)
    k = (x @ layer["attn_k"].T + layer["attn_k_b"]).reshape(b, t, h, d)
    v = (x @ layer["attn_v"].T + layer["attn_v_b"]).reshape(b, t, h, d)
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(float(d))
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(b, t, c)
    return out @ layer["attn_out"].T + layer["attn_out_b"]


def clip_forward(params: dict, cfg: ClipConfig, pixels: jax.Array) -> jax.Array:
    """pixels [B, 3, H, W] (already normalized) → selected hidden states
    [B, 1 + n_patches, n_embd] (CLS first, like clip.cpp)."""
    b = pixels.shape[0]
    p = cfg.patch_size
    g = cfg.image_size // p
    # non-overlapping patch conv = reshape + matmul (MXU)
    patches = pixels.reshape(b, 3, g, p, g, p).transpose(0, 2, 4, 1, 3, 5)
    patches = patches.reshape(b, g * g, 3 * p * p)
    w = params["patch_embd"].reshape(cfg.n_embd, 3 * p * p)
    x = patches @ w.T  # [B, P, C]
    cls = jnp.broadcast_to(params["class_embd"][None, None, :], (b, 1, cfg.n_embd))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embd"][None, : x.shape[1]]
    if "pre_ln" in params:
        x = _ln(x, params["pre_ln"], params["pre_ln_b"], cfg.eps)

    n_run = cfg.n_layers + cfg.select_layer + 1 if cfg.select_layer < 0 \
        else cfg.select_layer
    for layer in params["layers"][:n_run]:
        h = _ln(x, layer["ln1"], layer["ln1_b"], cfg.eps)
        x = x + _attn(h, layer, cfg)
        h = _ln(x, layer["ln2"], layer["ln2_b"], cfg.eps)
        h = h @ layer["ffn_up"].T + layer["ffn_up_b"]
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
        h = h @ layer["ffn_down"].T + layer["ffn_down_b"]
        x = x + h
    return x


def llava_project(params: dict, hidden: jax.Array) -> jax.Array:
    """mm projector (llava MLP: mm.0 → GELU → mm.2); drops CLS —
    vision_feature_select_strategy 'default' (clip.cpp llava path)."""
    x = hidden[:, 1:, :]  # drop CLS
    x = x @ params["mm_0"].T + params["mm_0_b"]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x @ params["mm_2"].T + params["mm_2_b"]


def embed_image(params: dict, cfg: ClipConfig, image: np.ndarray) -> np.ndarray:
    """image uint8 [H, W, 3] → projected embeddings [n_patches, proj_dim].
    Preprocessing mirrors clip.cpp clip_image_preprocess: resize to square
    (bicubic approximated by jax.image resize), scale, normalize."""
    img = jnp.asarray(image, jnp.float32) / 255.0
    img = jax.image.resize(img, (cfg.image_size, cfg.image_size, 3), "bilinear")
    mean = jnp.asarray(cfg.image_mean)
    std = jnp.asarray(cfg.image_std)
    img = (img - mean) / std
    pixels = img.transpose(2, 0, 1)[None]  # [1, 3, H, W]
    hidden = clip_forward(params, cfg, pixels)
    return np.asarray(llava_project(params, hidden)[0])


# -- GGUF mmproj loading -----------------------------------------------------

_CLIP_GLOBAL = {
    "v.patch_embd.weight": "patch_embd",
    "v.class_embd": "class_embd",
    "v.position_embd.weight": "pos_embd",
    "v.pre_ln.weight": "pre_ln",
    "v.pre_ln.bias": "pre_ln_b",
    "v.post_ln.weight": "post_ln",
    "v.post_ln.bias": "post_ln_b",
    "mm.0.weight": "mm_0",
    "mm.0.bias": "mm_0_b",
    "mm.2.weight": "mm_2",
    "mm.2.bias": "mm_2_b",
}

_CLIP_LAYER = {
    "attn_q.weight": "attn_q", "attn_q.bias": "attn_q_b",
    "attn_k.weight": "attn_k", "attn_k.bias": "attn_k_b",
    "attn_v.weight": "attn_v", "attn_v.bias": "attn_v_b",
    "attn_out.weight": "attn_out", "attn_out.bias": "attn_out_b",
    "ln1.weight": "ln1", "ln1.bias": "ln1_b",
    "ln2.weight": "ln2", "ln2.bias": "ln2_b",
    "ffn_up.weight": "ffn_up", "ffn_up.bias": "ffn_up_b",
    "ffn_down.weight": "ffn_down", "ffn_down.bias": "ffn_down_b",
}


def load_mmproj(path: str) -> tuple[ClipConfig, dict]:
    """Load a llava mmproj GGUF (clip.cpp clip_model_load)."""
    from ..gguf.reader import GGUFModel
    from ..quant.ref_numpy import dequantize

    gm = GGUFModel.load(path)
    cfg = ClipConfig.from_gguf_kv(gm.kv)
    params: dict[str, Any] = {"layers": [{} for _ in range(cfg.n_layers)]}
    for name, info in gm.tensors.items():
        arr = dequantize(np.asarray(info.data), info.ggml_type, info.np_shape)
        if name in _CLIP_GLOBAL:
            params[_CLIP_GLOBAL[name]] = arr
        elif name.startswith("v.blk."):
            _, _, idx, rest = name.split(".", 3)
            key = _CLIP_LAYER.get(rest)
            if key is not None:
                params["layers"][int(idx)][key] = arr
    return cfg, params
