"""LoRA adapter + control vector tests — reference llama-adapter semantics:
graph-time rank-r delta (never merged), alpha/r scaling, hot-swap strip.
"""

import numpy as np
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.constants import GGMLType, GGUFValueType
from llama_cpp_dsp_tpu.gguf.writer import GGUFWriter
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.runtime.adapter import (
    apply_control_vector, apply_lora, load_lora, strip_lora,
)
from llama_cpp_dsp_tpu.runtime.loader import load_model

from model_builder import build_tiny_llama


def _write_lora(path, hp, rng, alpha=16.0, rank=4):
    w = GGUFWriter(path, "llama")
    w.add_string("general.type", "adapter")
    w.add_string("adapter.type", "lora")
    w.add_float32("adapter.lora.alpha", alpha)
    tensors = {}
    for il in range(hp["n_layers"]):
        for nm, nout in (("attn_q", hp["n_embd"]),
                         ("ffn_down", hp["n_embd"])):
            k_in = hp["n_embd"] if nm == "attn_q" else hp["n_ff"]
            a = (rng.standard_normal((rank, k_in)) * 0.05).astype(np.float32)
            b = (rng.standard_normal((nout, rank)) * 0.05).astype(np.float32)
            w.add_tensor(f"blk.{il}.{nm}.weight.lora_a", a)
            w.add_tensor(f"blk.{il}.{nm}.weight.lora_b", b)
            tensors[(il, nm)] = (a, b)
    w.write()
    return tensors


def _logits(params, cfg, toks):
    n = toks.shape[1]
    pos = np.arange(n, dtype=np.int32).reshape(1, n)
    mask = np.tril(np.ones((1, n, n), bool))
    out, _ = forward(params, cfg, jnp.asarray(toks), jnp.asarray(pos),
                     mask=mask, compute_dtype=jnp.float32)
    return np.asarray(out)[0, -1]


def test_lora_roundtrip_and_apply(tmp_path):
    model_path = tmp_path / "base.gguf"
    hp = build_tiny_llama(str(model_path), qtype=GGMLType.F32)
    model = load_model(str(model_path))
    rng = np.random.default_rng(0)
    lora_path = tmp_path / "adapter.gguf"
    tensors = _write_lora(str(lora_path), hp, rng, alpha=8.0, rank=4)

    adapter = load_lora(str(lora_path))
    assert adapter.alpha == 8.0
    assert adapter.rank == 4
    assert len(adapter.ab) == 2 * hp["n_layers"]

    toks = np.array([[3, 14, 9, 27]], np.int32)
    base_out = _logits(model.params, model.cfg, toks)

    params2 = apply_lora(model.params, adapter, adapter_scale=1.0)
    lora_out = _logits(params2, model.cfg, toks)
    assert np.abs(lora_out - base_out).max() > 1e-3  # it did something

    # expected: manual dense merge W' = W + s·B·A
    import copy
    s = 8.0 / 4
    merged = {k: v for k, v in model.params.items()}
    merged["layers"] = [dict(l) for l in model.params["layers"]]
    for (il, nm), (a, b) in tensors.items():
        w0 = np.asarray(merged["layers"][il][nm], np.float32)
        merged["layers"][il][nm] = w0 + s * (b @ a)
    want = _logits(merged, model.cfg, toks)
    np.testing.assert_allclose(lora_out, want, rtol=1e-4, atol=1e-4)

    # strip (hot-swap off) restores base
    stripped = strip_lora(params2)
    np.testing.assert_allclose(_logits(stripped, model.cfg, toks), base_out,
                               rtol=1e-6, atol=1e-6)


def test_control_vector(tmp_path):
    model_path = tmp_path / "base.gguf"
    hp = build_tiny_llama(str(model_path), qtype=GGMLType.F32)
    model = load_model(str(model_path))
    rng = np.random.default_rng(1)
    dirs = rng.standard_normal((hp["n_layers"], hp["n_embd"])).astype(np.float32)

    toks = np.array([[5, 8, 2]], np.int32)
    base = _logits(model.params, model.cfg, toks)
    p2 = apply_control_vector(model.params, dirs, scale=0.5)
    out = _logits(p2, model.cfg, toks)
    assert np.abs(out - base).max() > 1e-3
    p0 = apply_control_vector(model.params, dirs, scale=0.0)
    np.testing.assert_allclose(_logits(p0, model.cfg, toks), base, atol=1e-5)
