"""Qwen2-VL vision tower parity vs HF (2-D rotary, fused-qkv attention,
quick-GELU MLP, 2×2 patch merger)."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llama_cpp_dsp_tpu.models.qwen2vl_vision import (
    params_from_hf, rot_pos_ids, vision_forward,
)


def test_vision_tower_parity():
    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        vision_config=dict(depth=2, embed_dim=32, hidden_size=48,
                           num_heads=4, in_chans=3, patch_size=14,
                           spatial_merge_size=2, temporal_patch_size=2,
                           mlp_ratio=2),
    )
    torch.manual_seed(21)
    model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval()
    visual = model.model.visual

    t, h, w = 1, 4, 6  # 24 patches → 6 merged embeddings
    s = t * h * w
    rng = np.random.default_rng(0)
    patches = rng.standard_normal((s, 3 * 2 * 14 * 14)).astype(np.float32)

    with torch.no_grad():
        theirs = visual(
            torch.tensor(patches),
            grid_thw=torch.tensor([[t, h, w]], dtype=torch.long),
        ).numpy()

    cfg, params = params_from_hf(visual)
    ours = np.asarray(vision_forward(params, cfg, jnp.asarray(patches),
                                     (t, h, w)))
    assert ours.shape == theirs.shape == (s // 4, 48)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_rot_pos_ids_merger_order():
    ids = rot_pos_ids((1, 4, 4), 2)
    # first merger group = the 2×2 patch block at (0..1, 0..1)
    assert ids[:4].tolist() == [[0, 0], [0, 1], [1, 0], [1, 1]]
    assert ids.shape == (16, 2)


def test_preprocess_and_embed():
    """End-to-end image → embeddings: smart resize to 28-multiples,
    merger-order patchify, tower forward."""
    from llama_cpp_dsp_tpu.models.qwen2vl_vision import (
        embed_image, preprocess_image, smart_resize,
    )

    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
        rope_scaling={"type": "mrope", "mrope_section": [2, 2, 2]},
        vision_config=dict(depth=2, embed_dim=32, hidden_size=48,
                           num_heads=4, in_chans=3, patch_size=14,
                           spatial_merge_size=2, temporal_patch_size=2,
                           mlp_ratio=2),
    )
    torch.manual_seed(22)
    model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval()
    from llama_cpp_dsp_tpu.models.qwen2vl_vision import params_from_hf

    cfg, params = params_from_hf(model.model.visual)
    assert smart_resize(100, 200, 28) == (112, 196)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (60, 90, 3), dtype=np.uint8)
    patches, grid = preprocess_image(img, cfg)
    t, gh, gw = grid
    assert patches.shape == (gh * gw, 3 * 2 * 14 * 14)
    emb = embed_image(params, cfg, img)
    assert emb.shape == (gh * gw // 4, 48)
    assert np.isfinite(emb).all()
