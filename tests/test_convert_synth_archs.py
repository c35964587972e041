"""HF→GGUF conversion for archs whose HF classes aren't in this image's
transformers (openelm, minicpm3, chatglm, grok, bitnet): synthetic HF-style
checkpoints (names per the reference's tensor_mapping.py) are written with
safetensors, converted, and the result must contain exactly the expected
GGUF tensor set, load, and produce finite logits."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

safetensors = pytest.importorskip("safetensors.numpy")

from llama_cpp_dsp_tpu.gguf.reader import read_gguf
from llama_cpp_dsp_tpu.models.llama import forward
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.tools.convert_hf import convert

from test_convert_hf import _byte_level_tokenizer  # noqa: E402

rng = np.random.default_rng(0)


def _r(*shape):
    return (rng.normal(size=shape) * 0.05).astype(np.float32)


def _write_hf(tmp_path, name, config, tensors):
    d = tmp_path / name
    d.mkdir()
    nv = _byte_level_tokenizer(d / "tokenizer.json")
    (d / "tokenizer_config.json").write_text(json.dumps({
        "bos_token": "<s>", "eos_token": "</s>"}))
    config = {**config, "vocab_size": nv}
    (d / "config.json").write_text(json.dumps(config))
    # materialize tensors that depend on the tokenizer's vocab size
    tensors = {k: (v(nv) if callable(v) else v) for k, v in tensors.items()}
    safetensors.save_file(tensors, str(d / "model.safetensors"))
    return d, nv


def _check(gguf_path, expected_names, *, smoke=True):
    gf = read_gguf(gguf_path, load_data=False)
    got = set(gf.tensors)
    gf.close()
    missing = set(expected_names) - got
    extra = got - set(expected_names)
    assert not missing and not extra, (sorted(missing), sorted(extra))
    model = load_model(gguf_path)
    if smoke:
        toks = jnp.asarray([[3, 5, 9, 2]], jnp.int32)
        pos = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
        mask = np.tril(np.ones((1, 4, 4), bool))
        logits, _ = forward(model.params, model.cfg, toks, pos, mask=mask,
                            compute_dtype=jnp.float32)
        assert np.isfinite(np.asarray(logits)).all()
    return model


def _std_layer_names(i, extra=()):
    base = [f"blk.{i}.attn_norm.weight", f"blk.{i}.ffn_norm.weight"]
    return base + [f"blk.{i}.{n}" for n in extra]


def test_convert_openelm(tmp_path):
    c, d, (h, kv) = 64, 16, (4, 2)
    ff = [64, 128]  # _make_divisible(1.0*64, 32), (2.0*64, 32)
    config = dict(
        model_type="openelm", architectures=["OpenELMForCausalLM"],
        model_dim=c, num_transformer_layers=2, head_dim=d,
        num_query_heads=[h, h], num_kv_heads=[kv, kv],
        ffn_multipliers=[1.0, 2.0], ffn_dim_divisor=32,
        max_context_length=64, rope_freq_constant=10000)
    tensors = {"transformer.token_embeddings.weight": lambda nv: _r(nv, c),
               "transformer.norm.weight": _r(c)}
    for i in range(2):
        p = f"transformer.layers.{i}"
        tensors.update({
            f"{p}.attn_norm.weight": _r(c),
            f"{p}.attn.qkv_proj.weight": _r((h + 2 * kv) * d, c),
            f"{p}.attn.out_proj.weight": _r(c, h * d),
            f"{p}.attn.q_norm.weight": _r(d),
            f"{p}.attn.k_norm.weight": _r(d),
            f"{p}.ffn_norm.weight": _r(c),
            f"{p}.ffn.proj_1.weight": _r(2 * ff[i], c),
            f"{p}.ffn.proj_2.weight": _r(c, ff[i]),
        })
    hf_dir, _ = _write_hf(tmp_path, "openelm", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    expected = ["token_embd.weight", "output_norm.weight"]
    for i in range(2):
        expected += _std_layer_names(i, (
            "attn_qkv.weight", "attn_output.weight", "attn_q_norm.weight",
            "attn_k_norm.weight", "ffn_gate.weight", "ffn_up.weight",
            "ffn_down.weight"))
    model = _check(out, expected)
    assert model.cfg.arch == "openelm"
    assert model.cfg.n_heads_l == (4, 4) and model.cfg.n_kv_heads_l == (2, 2)


def test_convert_chatglm(tmp_path):
    c, d, h, kv, ff = 64, 16, 4, 2, 96
    config = dict(
        model_type="chatglm", architectures=["ChatGLMModel"],
        hidden_size=c, num_layers=2, num_attention_heads=h,
        multi_query_group_num=kv, ffn_hidden_size=ff, seq_length=64,
        layernorm_epsilon=1e-5, rope_ratio=1.0)
    tensors = {
        "transformer.embedding.word_embeddings.weight": lambda nv: _r(nv, c),
        "transformer.encoder.final_layernorm.weight": _r(c),
        "transformer.output_layer.weight": lambda nv: _r(nv, c),
        "transformer.rotary_pos_emb.inv_freq": _r(d // 4),
    }
    for i in range(2):
        p = f"transformer.encoder.layers.{i}"
        tensors.update({
            f"{p}.input_layernorm.weight": _r(c),
            f"{p}.self_attention.query_key_value.weight": _r((h + 2 * kv) * d, c),
            f"{p}.self_attention.query_key_value.bias": _r((h + 2 * kv) * d),
            f"{p}.self_attention.dense.weight": _r(c, h * d),
            f"{p}.post_attention_layernorm.weight": _r(c),
            f"{p}.mlp.dense_h_to_4h.weight": _r(2 * ff, c),
            f"{p}.mlp.dense_4h_to_h.weight": _r(c, ff),
        })
    hf_dir, _ = _write_hf(tmp_path, "chatglm", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    expected = ["token_embd.weight", "output_norm.weight", "output.weight"]
    for i in range(2):
        expected += _std_layer_names(i, (
            "attn_qkv.weight", "attn_qkv.bias", "attn_output.weight",
            "ffn_up.weight", "ffn_down.weight"))
    model = _check(out, expected)
    assert model.cfg.arch == "chatglm"


def test_convert_grok(tmp_path):
    c, h, e, ff = 64, 4, 4, 96
    d = c // h
    config = dict(
        model_type="grok-1", architectures=["GrokForCausalLM"],
        hidden_size=c, num_hidden_layers=1, num_attention_heads=h,
        num_key_value_heads=h, intermediate_size=ff, num_local_experts=e,
        num_experts_per_tok=2, max_position_embeddings=64,
        rms_norm_eps=1e-5)
    p = "transformer.decoder_layer.0"
    tensors = {
        "transformer.in_out_embed.weight": lambda nv: _r(nv, c),
        "transformer.rms_norm.weight": _r(c),
        f"{p}.rms_norm.weight": _r(c),
        f"{p}.multi_head_attention.query.weight": _r(h * d, c),
        f"{p}.multi_head_attention.key.weight": _r(h * d, c),
        f"{p}.multi_head_attention.value.weight": _r(h * d, c),
        f"{p}.multi_head_attention.linear.weight": _r(c, h * d),
        f"{p}.rms_norm_1.weight": _r(c),
        f"{p}.rms_norm_2.weight": _r(c),
        f"{p}.rms_norm_3.weight": _r(c),
        f"{p}.router.weight": _r(e, c),
    }
    for x in range(e):
        tensors[f"{p}.moe.{x}.linear.weight"] = _r(ff, c)
        tensors[f"{p}.moe.{x}.linear_v.weight"] = _r(ff, c)
        tensors[f"{p}.moe.{x}.linear_1.weight"] = _r(c, ff)
    hf_dir, _ = _write_hf(tmp_path, "grok", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    expected = ["token_embd.weight", "output_norm.weight",
                "blk.0.attn_norm.weight", "blk.0.attn_q.weight",
                "blk.0.attn_k.weight", "blk.0.attn_v.weight",
                "blk.0.attn_output.weight", "blk.0.attn_output_norm.weight",
                "blk.0.ffn_norm.weight", "blk.0.layer_output_norm.weight",
                "blk.0.ffn_gate_inp.weight", "blk.0.ffn_gate_exps.weight",
                "blk.0.ffn_up_exps.weight", "blk.0.ffn_down_exps.weight"]
    model = _check(out, expected)
    assert model.cfg.arch == "grok" and model.cfg.post_norms


def test_convert_bitnet(tmp_path):
    c, h, kv, ff = 64, 4, 2, 96
    d = c // h
    config = dict(
        model_type="llama", architectures=["BitnetForCausalLM"],
        hidden_size=c, num_hidden_layers=1, num_attention_heads=h,
        num_key_value_heads=kv, intermediate_size=ff,
        max_position_embeddings=64, rms_norm_eps=1e-5)
    p = "model.layers.0"
    tensors = {
        "model.embed_tokens.weight": lambda nv: _r(nv, c),
        "model.norm.weight": _r(c),
        f"{p}.input_layernorm.weight": _r(c),
        f"{p}.self_attn.q_proj.weight": _r(h * d, c),
        f"{p}.self_attn.k_proj.weight": _r(kv * d, c),
        f"{p}.self_attn.v_proj.weight": _r(kv * d, c),
        f"{p}.self_attn.o_proj.weight": _r(c, h * d),
        f"{p}.self_attn.inner_attn_ln.weight": _r(c),
        f"{p}.post_attention_layernorm.weight": _r(c),
        f"{p}.mlp.gate_proj.weight": _r(ff, c),
        f"{p}.mlp.up_proj.weight": _r(ff, c),
        f"{p}.mlp.down_proj.weight": _r(c, ff),
        f"{p}.mlp.ffn_layernorm.weight": _r(ff),
    }
    hf_dir, _ = _write_hf(tmp_path, "bitnet", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    expected = ["token_embd.weight", "output_norm.weight",
                "blk.0.attn_norm.weight", "blk.0.attn_q.weight",
                "blk.0.attn_k.weight", "blk.0.attn_v.weight",
                "blk.0.attn_output.weight", "blk.0.attn_sub_norm.weight",
                "blk.0.ffn_norm.weight", "blk.0.ffn_gate.weight",
                "blk.0.ffn_up.weight", "blk.0.ffn_down.weight",
                "blk.0.ffn_sub_norm.weight"]
    model = _check(out, expected)
    assert model.cfg.arch == "bitnet" and model.cfg.sub_norms
    # weights really are ternary * scale
    gf = read_gguf(out)
    q = gf.tensors["blk.0.attn_q.weight"]
    vals = np.frombuffer(bytes(q.data), np.float32)
    uniq = np.unique(np.round(vals / np.abs(vals[vals != 0]).min()))
    assert len(uniq) <= 3
    gf.close()


def test_convert_minicpm3(tmp_path):
    c, h = 64, 4
    q_lora, kv_lora, nope, rope_d, v_d, ff = 24, 16, 8, 8, 8, 96
    config = dict(
        model_type="minicpm3", architectures=["MiniCPM3ForCausalLM"],
        hidden_size=c, num_hidden_layers=1, num_attention_heads=h,
        num_key_value_heads=h, intermediate_size=ff, q_lora_rank=q_lora,
        kv_lora_rank=kv_lora, qk_nope_head_dim=nope, qk_rope_head_dim=rope_d,
        v_head_dim=v_d, max_position_embeddings=64, rms_norm_eps=1e-5,
        rope_scaling={"long_factor": [1.0] * (rope_d // 2),
                      "short_factor": [1.0] * (rope_d // 2)})
    p = "model.layers.0"
    tensors = {
        "model.embed_tokens.weight": lambda nv: _r(nv, c),
        "model.norm.weight": _r(c),
        "lm_head.weight": lambda nv: _r(nv, c),
        f"{p}.input_layernorm.weight": _r(c),
        f"{p}.self_attn.q_a_proj.weight": _r(q_lora, c),
        f"{p}.self_attn.q_a_layernorm.weight": _r(q_lora),
        f"{p}.self_attn.q_b_proj.weight": _r(h * (nope + rope_d), q_lora),
        f"{p}.self_attn.kv_a_proj_with_mqa.weight": _r(kv_lora + rope_d, c),
        f"{p}.self_attn.kv_a_layernorm.weight": _r(kv_lora),
        f"{p}.self_attn.kv_b_proj.weight": _r(h * (nope + v_d), kv_lora),
        f"{p}.self_attn.o_proj.weight": _r(c, h * v_d),
        f"{p}.post_attention_layernorm.weight": _r(c),
        f"{p}.mlp.gate_proj.weight": _r(ff, c),
        f"{p}.mlp.up_proj.weight": _r(ff, c),
        f"{p}.mlp.down_proj.weight": _r(c, ff),
    }
    hf_dir, _ = _write_hf(tmp_path, "minicpm3", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    expected = ["token_embd.weight", "output_norm.weight", "output.weight",
                "rope_factors_long.weight", "rope_factors_short.weight",
                "blk.0.attn_norm.weight", "blk.0.attn_q_a.weight",
                "blk.0.attn_q_a_norm.weight", "blk.0.attn_q_b.weight",
                "blk.0.attn_kv_a_mqa.weight", "blk.0.attn_kv_a_norm.weight",
                "blk.0.attn_kv_b.weight", "blk.0.attn_output.weight",
                "blk.0.ffn_norm.weight", "blk.0.ffn_gate.weight",
                "blk.0.ffn_up.weight", "blk.0.ffn_down.weight"]
    model = _check(out, expected)
    assert model.cfg.arch == "minicpm3"
    assert model.cfg.kv_lora_rank == kv_lora and model.cfg.q_lora_rank == q_lora
