"""CLIP vision tower vs HF CLIPVisionModel + mmproj GGUF round-trip +
image-embedding injection into the LLM decode (llava capability).
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llama_cpp_dsp_tpu.models.clip import (
    ClipConfig, clip_forward, embed_image, llava_project, load_mmproj,
)


def _t2n(t):
    return t.detach().cpu().numpy().astype(np.float32)


@pytest.fixture(scope="module")
def clip_pair():
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="gelu", layer_norm_eps=1e-5,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()

    cfg = ClipConfig(image_size=28, patch_size=14, n_embd=64, n_ff=128,
                     n_layers=3, n_heads=4, eps=1e-5, proj_dim=32,
                     select_layer=-2)
    vm = hf.vision_model
    layers = []
    for hl in vm.encoder.layers:
        layers.append({
            "ln1": _t2n(hl.layer_norm1.weight), "ln1_b": _t2n(hl.layer_norm1.bias),
            "ln2": _t2n(hl.layer_norm2.weight), "ln2_b": _t2n(hl.layer_norm2.bias),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_q_b": _t2n(hl.self_attn.q_proj.bias),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_k_b": _t2n(hl.self_attn.k_proj.bias),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_v_b": _t2n(hl.self_attn.v_proj.bias),
            "attn_out": _t2n(hl.self_attn.out_proj.weight),
            "attn_out_b": _t2n(hl.self_attn.out_proj.bias),
            "ffn_up": _t2n(hl.mlp.fc1.weight), "ffn_up_b": _t2n(hl.mlp.fc1.bias),
            "ffn_down": _t2n(hl.mlp.fc2.weight), "ffn_down_b": _t2n(hl.mlp.fc2.bias),
        })
    params = {
        "patch_embd": _t2n(vm.embeddings.patch_embedding.weight),
        "class_embd": _t2n(vm.embeddings.class_embedding),
        "pos_embd": _t2n(vm.embeddings.position_embedding.weight),
        "pre_ln": _t2n(vm.pre_layrnorm.weight),
        "pre_ln_b": _t2n(vm.pre_layrnorm.bias),
        "layers": layers,
    }
    rng = np.random.default_rng(0)
    params["mm_0"] = (rng.standard_normal((32, 64)) * 0.05).astype(np.float32)
    params["mm_0_b"] = np.zeros(32, np.float32)
    params["mm_2"] = (rng.standard_normal((32, 32)) * 0.05).astype(np.float32)
    params["mm_2_b"] = np.zeros(32, np.float32)
    return cfg, params, hf


def test_clip_hidden_parity(clip_pair):
    cfg, params, hf = clip_pair
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    ours = np.asarray(clip_forward(params, cfg, jnp.asarray(pixels)))
    with torch.no_grad():
        out = hf(torch.tensor(pixels), output_hidden_states=True)
    want = _t2n(out.hidden_states[cfg.select_layer])  # llava select -2
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_mmproj_gguf_roundtrip(clip_pair, tmp_path):
    from llama_cpp_dsp_tpu.gguf.writer import GGUFWriter
    from llama_cpp_dsp_tpu.models.clip import _CLIP_GLOBAL, _CLIP_LAYER

    cfg, params, _ = clip_pair
    path = str(tmp_path / "mmproj.gguf")
    w = GGUFWriter(path, "clip")
    w.add_uint32("clip.vision.image_size", cfg.image_size)
    w.add_uint32("clip.vision.patch_size", cfg.patch_size)
    w.add_uint32("clip.vision.embedding_length", cfg.n_embd)
    w.add_uint32("clip.vision.feed_forward_length", cfg.n_ff)
    w.add_uint32("clip.vision.block_count", cfg.n_layers)
    w.add_uint32("clip.vision.attention.head_count", cfg.n_heads)
    w.add_uint32("clip.vision.projection_dim", cfg.proj_dim)
    inv_global = {v: k for k, v in _CLIP_GLOBAL.items()}
    inv_layer = {v: k for k, v in _CLIP_LAYER.items()}
    for key, arr in params.items():
        if key == "layers":
            continue
        w.add_tensor(inv_global[key], np.ascontiguousarray(arr))
    for i, layer in enumerate(params["layers"]):
        for key, arr in layer.items():
            w.add_tensor(f"v.blk.{i}.{inv_layer[key]}", np.ascontiguousarray(arr))
    w.write()

    cfg2, params2 = load_mmproj(path)
    assert cfg2.n_layers == cfg.n_layers and cfg2.patch_size == cfg.patch_size
    img = (np.random.default_rng(2).integers(0, 255, (40, 30, 3))
           .astype(np.uint8))
    e1 = embed_image(params, cfg, img)
    e2 = embed_image(params2, cfg2, img)
    assert e1.shape == (cfg.n_patches, cfg.proj_dim)
    np.testing.assert_allclose(e1, e2, rtol=1e-5, atol=1e-5)


def test_image_embed_injection(clip_pair):
    """Projected image embeddings splice into the LLM forward as input_embd
    (reference llava_eval_image_embed)."""
    from llama_cpp_dsp_tpu.gguf.constants import GGMLType
    from llama_cpp_dsp_tpu.models.llama import forward
    from llama_cpp_dsp_tpu.models.registry import synth_config
    from llama_cpp_dsp_tpu.ops import take_rows
    from llama_cpp_dsp_tpu.tools.synth import synth_params

    cfg, params, _ = clip_pair
    lcfg = synth_config("llama", n_embd=32, n_heads=4, n_kv_heads=2,
                        head_dim=8, n_vocab=64)
    lparams = synth_params(lcfg, GGMLType.Q8_0, seed=3, tie=False)

    img = np.random.default_rng(4).integers(0, 255, (28, 28, 3)).astype(np.uint8)
    img_embd = embed_image(params, cfg, img)  # [4 patches, 32]

    toks = np.array([[1, 2]], np.int32)
    tok_embd = np.asarray(take_rows(
        jnp.asarray(np.asarray(lparams["token_embd"].arrays["qs"], np.float32))
        if False else lparams["token_embd"], jnp.asarray(toks), dtype=jnp.float32))
    seq = np.concatenate([tok_embd[0], img_embd], axis=0)[None]  # [1, 6, 32]
    pos = np.arange(seq.shape[1], dtype=np.int32)[None]
    mask = np.tril(np.ones((1, seq.shape[1], seq.shape[1]), bool))
    logits, _ = forward(lparams, lcfg, None, jnp.asarray(pos), mask=mask,
                        compute_dtype=jnp.float32,
                        input_embd=jnp.asarray(seq, jnp.float32))
    out = np.asarray(logits)
    assert out.shape == (1, 6, 64)
    assert np.isfinite(out).all()
