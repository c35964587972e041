"""Qwen2-VL vision tower (ViT with 2-D vision rotary + patch merger).

Capability mirror of the reference's qwen2vl support in the clip/mtmd stack
(examples/llava/clip.cpp qwen2vl branch, M-RoPE vision sections): Conv3D
patch embedding (as a linear over flattened [3·tp·ps·ps] patches), pre-LN
blocks with fused-qkv full attention under 2-D rotary (h-freqs ‖ w-freqs,
merger-order position ids), quick-GELU MLP, and the 2×2 spatial merger MLP
projecting into the text model's embedding space. Output embeddings are
injected into the decoder via forward(input_embd=...) exactly like llava.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int
    embed_dim: int
    num_heads: int
    out_hidden: int  # text model n_embd
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    mlp_ratio: float = 4.0
    eps: float = 1e-6
    theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def rot_pos_ids(grid_thw: tuple[int, int, int], ms: int) -> np.ndarray:
    """[S, 2] (h, w) position ids in merger order (HF rot_pos_emb)."""
    t, h, w = grid_thw
    hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wp = np.broadcast_to(np.arange(w)[None, :], (h, w))

    def perm(a):
        return a.reshape(h // ms, ms, w // ms, ms).transpose(0, 2, 1, 3).reshape(-1)

    ids = np.stack([perm(hp), perm(wp)], axis=-1)
    return np.tile(ids, (t, 1))


def _vision_rotary(cfg: Qwen2VLVisionConfig, grid_thw):
    """cos/sin [S, head_dim] — h-freqs ‖ w-freqs, then duplicated."""
    d4 = cfg.head_dim // 4
    inv = 1.0 / (cfg.theta ** (np.arange(0, d4 * 2, 2, dtype=np.float64) / (d4 * 2)))
    ids = rot_pos_ids(grid_thw, cfg.spatial_merge_size)  # [S, 2]
    ang_h = ids[:, 0:1] * inv[None, :]
    ang_w = ids[:, 1:2] * inv[None, :]
    ang = np.concatenate([ang_h, ang_w], axis=1)  # [S, head_dim/2]
    ang = np.concatenate([ang, ang], axis=1)  # [S, head_dim]
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def vision_forward(params: dict, cfg: Qwen2VLVisionConfig,
                   patches: jax.Array, grid_thw: tuple[int, int, int]):
    """patches [S, 3·tp·ps·ps] (processor order = merger order) →
    embeddings [S/ms², out_hidden] f32."""
    x = (patches.astype(jnp.float32) @ params["patch_embd"].T)
    cos, sin = _vision_rotary(cfg, grid_thw)
    s = x.shape[0]
    h, d = cfg.num_heads, cfg.head_dim

    for layer in params["blocks"]:
        res = x
        y = _ln(x, layer["norm1"], layer["norm1_bias"], cfg.eps)
        qkv = y @ layer["qkv"].T + layer["qkv_bias"]
        q, k, v = jnp.split(qkv.reshape(s, 3, h, d), 3, axis=1)
        q, k, v = q[:, 0], k[:, 0], v[:, 0]  # [S, H, D]
        q = q * cos[:, None, :] + _rotate_half(q) * sin[:, None, :]
        k = k * cos[:, None, :] + _rotate_half(k) * sin[:, None, :]
        scores = jnp.einsum("shd,thd->hst", q, k) / np.sqrt(d)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hst,thd->shd", probs, v).reshape(s, h * d)
        x = res + attn @ layer["proj"].T + layer["proj_bias"]
        y = _ln(x, layer["norm2"], layer["norm2_bias"], cfg.eps)
        y = _quick_gelu(y @ layer["fc1"].T + layer["fc1_bias"])
        x = x + y @ layer["fc2"].T + layer["fc2_bias"]

    # merger: ln_q → group ms² patches → MLP to the text width
    y = _ln(x, params["merger_ln"], params["merger_ln_bias"], cfg.eps)
    ms2 = cfg.spatial_merge_size ** 2
    y = y.reshape(-1, ms2 * cfg.embed_dim)
    y = jax.nn.gelu(y @ params["merger_fc1"].T + params["merger_fc1_bias"],
                    approximate=False)
    return y @ params["merger_fc2"].T + params["merger_fc2_bias"]


IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)  # CLIP stats (processor)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def smart_resize(h: int, w: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> tuple[int, int]:
    """Qwen2VL processor's resolution pick: round to `factor` multiples
    keeping the pixel count within [min_pixels, max_pixels]."""
    import math

    hb = round(h / factor) * factor
    wb = round(w / factor) * factor
    if hb * wb > max_pixels:
        beta = math.sqrt((h * w) / max_pixels)
        hb = math.floor(h / beta / factor) * factor
        wb = math.floor(w / beta / factor) * factor
    elif hb * wb < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        hb = math.ceil(h * beta / factor) * factor
        wb = math.ceil(w * beta / factor) * factor
    return max(hb, factor), max(wb, factor)


def preprocess_image(image: np.ndarray, cfg: Qwen2VLVisionConfig):
    """uint8 [H, W, 3] → (patches [S, 3·tp·ps·ps] in merger order,
    grid (t, h, w)) — the Qwen2VL image processor's patchification."""
    ps, tp, ms = cfg.patch_size, cfg.temporal_patch_size, cfg.spatial_merge_size
    hh, ww = smart_resize(image.shape[0], image.shape[1], factor=ps * ms)
    img = jnp.asarray(image, jnp.float32) / 255.0
    img = jax.image.resize(img, (hh, ww, 3), "bilinear")
    img = (img - jnp.asarray(IMAGE_MEAN)) / jnp.asarray(IMAGE_STD)
    img = np.asarray(img).transpose(2, 0, 1)  # [3, H, W]
    img = np.repeat(img[None], tp, axis=0)  # temporal tile [tp, 3, H, W]
    gh, gw = hh // ps, ww // ps
    # merger-order patchify: (gh/ms, gw/ms, ms, ms) outer order
    p = img.reshape(tp, 3, gh // ms, ms, ps, gw // ms, ms, ps)
    p = p.transpose(2, 5, 3, 6, 1, 0, 4, 7)  # [gh/ms, gw/ms, ms, ms, 3, tp, ps, ps]
    patches = p.reshape(gh * gw, 3 * tp * ps * ps)
    return patches.astype(np.float32), (1, gh, gw)


def embed_image(params: dict, cfg: Qwen2VLVisionConfig,
                image: np.ndarray) -> np.ndarray:
    """uint8 [H, W, 3] → text-space embeddings [(gh·gw)/ms², out_hidden]
    for forward(input_embd=...) injection (llava_eval_image_embed role)."""
    patches, grid = preprocess_image(image, cfg)
    return np.asarray(vision_forward(params, cfg, jnp.asarray(patches), grid))


def params_from_hf(visual) -> tuple[Qwen2VLVisionConfig, dict]:
    """Map an HF Qwen2VisionTransformerPretrainedModel to our params."""
    import torch

    def t2n(t):
        return jnp.asarray(t.detach().cpu().numpy().astype(np.float32))

    c = visual.config
    cfg = Qwen2VLVisionConfig(
        depth=c.depth, embed_dim=c.embed_dim, num_heads=c.num_heads,
        out_hidden=c.hidden_size, patch_size=c.patch_size,
        temporal_patch_size=c.temporal_patch_size,
        spatial_merge_size=c.spatial_merge_size, mlp_ratio=c.mlp_ratio,
    )
    pe = visual.patch_embed.proj.weight  # [E, 3, tp, ps, ps]
    params = {
        "patch_embd": t2n(pe.reshape(pe.shape[0], -1)),
        "blocks": [],
        "merger_ln": t2n(visual.merger.ln_q.weight),
        "merger_ln_bias": t2n(visual.merger.ln_q.bias),
        "merger_fc1": t2n(visual.merger.mlp[0].weight),
        "merger_fc1_bias": t2n(visual.merger.mlp[0].bias),
        "merger_fc2": t2n(visual.merger.mlp[2].weight),
        "merger_fc2_bias": t2n(visual.merger.mlp[2].bias),
    }
    for b in visual.blocks:
        params["blocks"].append({
            "norm1": t2n(b.norm1.weight), "norm1_bias": t2n(b.norm1.bias),
            "norm2": t2n(b.norm2.weight), "norm2_bias": t2n(b.norm2.bias),
            "qkv": t2n(b.attn.qkv.weight), "qkv_bias": t2n(b.attn.qkv.bias),
            "proj": t2n(b.attn.proj.weight), "proj_bias": t2n(b.attn.proj.bias),
            "fc1": t2n(b.mlp.fc1.weight), "fc1_bias": t2n(b.mlp.fc1.bias),
            "fc2": t2n(b.mlp.fc2.weight), "fc2_bias": t2n(b.mlp.fc2.bias),
        })
    return cfg, params
