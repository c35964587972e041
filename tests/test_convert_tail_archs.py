"""HF→GGUF conversion for the tail of the arch zoo (refact, plamo, arctic,
deci/nemotron-nas, nomic-bert, jina-bert-v2, rwkv6, rwkv7): synthetic
HF-style checkpoints (names per the reference's tensor_mapping.py) are
converted and must contain exactly the expected GGUF tensor set, load, and
produce finite logits through the matching builder."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

safetensors = pytest.importorskip("safetensors.numpy")

from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.tools.convert_hf import convert

from test_convert_hf import _byte_level_tokenizer  # noqa: E402
from test_convert_synth_archs import _check, _std_layer_names, _write_hf  # noqa: E402

rng = np.random.default_rng(7)


def _r(*shape, s=0.05):
    return (rng.normal(size=shape) * s).astype(np.float32)


def test_convert_refact(tmp_path):
    c, h = 64, 4
    d = c // h
    ff = 256 * ((int(2 * (4 * c) / 3) + 255) // 256)  # reference RefactModel
    config = dict(
        model_type="gpt_refact", architectures=["GPTRefactForCausalLM"],
        n_embd=c, n_layer=2, n_head=h, n_positions=64,
        layer_norm_epsilon=1e-6)
    tensors = {"transformer.wte.weight": lambda nv: _r(nv, c),
               "ln_f.weight": _r(c),
               "lm_head.weight": lambda nv: _r(nv, c)}
    for i in range(2):
        p = f"transformer.h.{i}"
        tensors.update({
            f"{p}.ln_1.weight": _r(c),
            f"{p}.attn.q.weight": _r(c, c),
            f"{p}.attn.kv.weight": _r(2 * d, c),  # MQA fused k|v
            f"{p}.attn.c_proj.weight": _r(c, c),
            f"{p}.ln_2.weight": _r(c),
            f"{p}.mlp.gate_up_proj.weight": _r(2 * ff, c),
            f"{p}.mlp.c_proj.weight": _r(c, ff),
        })
    hf_dir, _ = _write_hf(tmp_path, "refact", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    expected = ["token_embd.weight", "output_norm.weight", "output.weight"]
    for i in range(2):
        expected += _std_layer_names(i, (
            "attn_q.weight", "attn_k.weight", "attn_v.weight",
            "attn_output.weight", "ffn_gate.weight", "ffn_up.weight",
            "ffn_down.weight"))
    model = _check(out, expected)
    assert model.cfg.arch == "refact"
    assert model.cfg.n_kv_heads == 1
    assert model.cfg.pos_embd_type == "alibi"


def test_convert_plamo(tmp_path):
    c, h, kv, ff = 64, 4, 2, 96
    d = c // h
    config = dict(
        model_type="plamo", architectures=["PlamoForCausalLM"],
        hidden_size=c, num_hidden_layers=2, num_attention_heads=h,
        num_key_value_heads=kv, intermediate_size=ff, rms_norm_eps=1e-5)
    tensors = {"model.embed_tokens.weight": lambda nv: _r(nv, c),
               "model.norm.weight": _r(c),
               "lm_head.weight": lambda nv: _r(nv, c)}
    for i in range(2):
        p = f"model.layers.layers.{i}"
        tensors.update({
            f"{p}.norm.weight": _r(c),
            f"{p}.self_attn.q_proj.weight": _r(c, c),
            f"{p}.self_attn.k_proj.weight": _r(kv * d, c),
            f"{p}.self_attn.v_proj.weight": _r(kv * d, c),
            f"{p}.self_attn.o_proj.weight": _r(c, c),
            f"{p}.mlp.gate_proj.weight": _r(ff, c),
            f"{p}.mlp.up_proj.weight": _r(ff, c),
            f"{p}.mlp.down_proj.weight": _r(c, ff),
        })
    hf_dir, _ = _write_hf(tmp_path, "plamo", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    expected = ["token_embd.weight", "output_norm.weight", "output.weight"]
    for i in range(2):
        expected += [f"blk.{i}.{n}" for n in (
            "attn_norm.weight", "attn_q.weight", "attn_k.weight",
            "attn_v.weight", "attn_output.weight", "ffn_gate.weight",
            "ffn_up.weight", "ffn_down.weight")]
    model = _check(out, expected)
    assert model.cfg.arch == "plamo" and model.cfg.parallel_residual


def test_convert_arctic(tmp_path):
    c, h, kv, ff, e = 64, 4, 2, 96, 4
    d = c // h
    config = dict(
        model_type="arctic", architectures=["ArcticForCausalLM"],
        hidden_size=c, num_hidden_layers=1, num_attention_heads=h,
        num_key_value_heads=kv, intermediate_size=ff, num_local_experts=e,
        num_experts_per_tok=2, max_position_embeddings=64, rms_norm_eps=1e-5)
    p = "model.layers.0"
    tensors = {
        "model.embed_tokens.weight": lambda nv: _r(nv, c),
        "model.norm.weight": _r(c),
        "lm_head.weight": lambda nv: _r(nv, c),
        f"{p}.input_layernorm.weight": _r(c),
        f"{p}.self_attn.q_proj.weight": _r(c, c),
        f"{p}.self_attn.k_proj.weight": _r(kv * d, c),
        f"{p}.self_attn.v_proj.weight": _r(kv * d, c),
        f"{p}.self_attn.o_proj.weight": _r(c, c),
        f"{p}.residual_layernorm.weight": _r(c),
        f"{p}.residual_mlp.w1.weight": _r(ff, c),
        f"{p}.residual_mlp.w3.weight": _r(ff, c),
        f"{p}.residual_mlp.w2.weight": _r(c, ff),
        f"{p}.post_attention_layernorm.weight": _r(c),
        f"{p}.block_sparse_moe.gate.weight": _r(e, c),
    }
    for x in range(e):
        tensors[f"{p}.block_sparse_moe.experts.{x}.w1.weight"] = _r(ff, c)
        tensors[f"{p}.block_sparse_moe.experts.{x}.w3.weight"] = _r(ff, c)
        tensors[f"{p}.block_sparse_moe.experts.{x}.w2.weight"] = _r(c, ff)
    hf_dir, _ = _write_hf(tmp_path, "arctic", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    expected = ["token_embd.weight", "output_norm.weight", "output.weight",
                "blk.0.attn_norm.weight", "blk.0.attn_q.weight",
                "blk.0.attn_k.weight", "blk.0.attn_v.weight",
                "blk.0.attn_output.weight", "blk.0.ffn_norm.weight",
                "blk.0.ffn_gate.weight", "blk.0.ffn_up.weight",
                "blk.0.ffn_down.weight", "blk.0.ffn_norm_exps.weight",
                "blk.0.ffn_gate_inp.weight", "blk.0.ffn_gate_exps.weight",
                "blk.0.ffn_up_exps.weight", "blk.0.ffn_down_exps.weight"]
    model = _check(out, expected)
    assert model.cfg.arch == "arctic" and model.cfg.n_expert == e
    # residual-MoE branch marker survived the load
    assert "ffn_norm_exps" in model.params["layers"][0]


def test_convert_deci_block_configs(tmp_path):
    c, h = 64, 4
    d = c // h
    ff = 256  # _ffn_mult_to_intermediate_size rounds small dims up to 256
    bc_attn = {"attention": {"n_heads_in_group": 2,
                             "replace_with_linear": False},
               "ffn": {"ffn_mult": 1.0}}
    bc_free = {"attention": {"n_heads_in_group": None,
                             "replace_with_linear": False},
               "ffn": {"ffn_mult": 1.0}}
    bc_linear = {"attention": {"n_heads_in_group": None,
                               "replace_with_linear": True},
                 "ffn": {"ffn_mult": 1.0}}
    config = dict(
        model_type="nemotron-nas", architectures=["DeciLMForCausalLM"],
        hidden_size=c, num_hidden_layers=3, num_attention_heads=h,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        block_configs=[bc_attn, bc_free, bc_linear])
    tensors = {"model.embed_tokens.weight": lambda nv: _r(nv, c),
               "model.norm.weight": _r(c),
               "lm_head.weight": lambda nv: _r(nv, c)}
    # layer 0: normal GQA attention (kv = 4 // 2 = 2)
    p = "model.layers.0"
    tensors.update({
        f"{p}.input_layernorm.weight": _r(c),
        f"{p}.self_attn.q_proj.weight": _r(c, c),
        f"{p}.self_attn.k_proj.weight": _r(2 * d, c),
        f"{p}.self_attn.v_proj.weight": _r(2 * d, c),
        f"{p}.self_attn.o_proj.weight": _r(c, c),
        f"{p}.post_attention_layernorm.weight": _r(c),
        f"{p}.mlp.gate_proj.weight": _r(ff, c),
        f"{p}.mlp.up_proj.weight": _r(ff, c),
        f"{p}.mlp.down_proj.weight": _r(c, ff),
    })
    # layer 1: attention-free (FFN only)
    p = "model.layers.1"
    tensors.update({
        f"{p}.post_attention_layernorm.weight": _r(c),
        f"{p}.mlp.gate_proj.weight": _r(ff, c),
        f"{p}.mlp.up_proj.weight": _r(ff, c),
        f"{p}.mlp.down_proj.weight": _r(c, ff),
    })
    # layer 2: linear attention (o_proj only)
    p = "model.layers.2"
    tensors.update({
        f"{p}.input_layernorm.weight": _r(c),
        f"{p}.self_attn.o_proj.weight": _r(c, c),
        f"{p}.post_attention_layernorm.weight": _r(c),
        f"{p}.mlp.gate_proj.weight": _r(ff, c),
        f"{p}.mlp.up_proj.weight": _r(ff, c),
        f"{p}.mlp.down_proj.weight": _r(c, ff),
    })
    hf_dir, _ = _write_hf(tmp_path, "deci", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    ffn = ("ffn_norm.weight", "ffn_gate.weight", "ffn_up.weight",
           "ffn_down.weight")
    expected = ["token_embd.weight", "output_norm.weight", "output.weight"]
    expected += [f"blk.0.{n}" for n in (
        "attn_norm.weight", "attn_q.weight", "attn_k.weight",
        "attn_v.weight", "attn_output.weight") + ffn]
    expected += [f"blk.1.{n}" for n in ffn]
    expected += [f"blk.2.{n}" for n in ("attn_norm.weight",
                                        "attn_output.weight") + ffn]
    model = _check(out, expected)
    assert model.cfg.arch == "deci"
    assert model.cfg.n_heads_l == (4, 0, 4)
    assert model.cfg.n_kv_heads_l == (2, 0, 0)


def test_convert_nomic_bert(tmp_path):
    c, h, ff = 64, 4, 128
    config = dict(
        model_type="nomic_bert", architectures=["NomicBertModel"],
        n_embd=c, n_layer=2, n_head=h, n_inner=ff,
        rotary_emb_base=1000.0, layer_norm_epsilon=1e-12,
        activation_function="swiglu")
    tensors = {
        "embeddings.word_embeddings.weight": lambda nv: _r(nv, c),
        "embeddings.token_type_embeddings.weight": _r(2, c),
        "emb_ln.weight": _r(c), "emb_ln.bias": _r(c),
    }
    for i in range(2):
        p = f"encoder.layers.{i}"
        tensors.update({
            f"{p}.attn.Wqkv.weight": _r(3 * c, c),
            f"{p}.attn.out_proj.weight": _r(c, c),
            f"{p}.norm1.weight": _r(c), f"{p}.norm1.bias": _r(c),
            f"{p}.norm2.weight": _r(c), f"{p}.norm2.bias": _r(c),
            f"{p}.mlp.fc11.weight": _r(ff, c),
            f"{p}.mlp.fc12.weight": _r(ff, c),
            f"{p}.mlp.fc2.weight": _r(c, ff),
        })
    hf_dir, _ = _write_hf(tmp_path, "nomic", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    expected = ["token_embd.weight", "token_types.weight",
                "token_embd_norm.weight", "token_embd_norm.bias"]
    for i in range(2):
        expected += [f"blk.{i}.{n}" for n in (
            "attn_qkv.weight", "attn_output.weight",
            "attn_output_norm.weight", "attn_output_norm.bias",
            "layer_output_norm.weight", "layer_output_norm.bias",
            "ffn_up.weight", "ffn_gate.weight", "ffn_down.weight")]
    model = _check(out, expected, smoke=False)
    assert model.cfg.arch == "nomic-bert"
    assert model.cfg.pos_embd_type == "rope" and model.cfg.act == "silu"
    assert model.cfg.rope.freq_base == 1000.0

    from llama_cpp_dsp_tpu.models.bert import bert_forward

    emb = bert_forward(model.params, model.cfg,
                       jnp.asarray([[2, 5, 9]], jnp.int32),
                       compute_dtype=jnp.float32, pooling="mean")
    assert np.isfinite(np.asarray(emb)).all()


def test_convert_jina_bert_v2(tmp_path):
    c, h, ff = 64, 4, 128
    config = dict(
        model_type="bert", architectures=["JinaBertForMaskedLM"],
        hidden_size=c, num_hidden_layers=2, num_attention_heads=h,
        intermediate_size=ff, layer_norm_eps=1e-12,
        feed_forward_type="geglu")
    tensors = {
        "embeddings.word_embeddings.weight": lambda nv: _r(nv, c),
        "embeddings.token_type_embeddings.weight": _r(2, c),
        "embeddings.LayerNorm.weight": _r(c),
        "embeddings.LayerNorm.bias": _r(c),
    }
    for i in range(2):
        p = f"encoder.layer.{i}"
        tensors.update({
            f"{p}.attention.self.query.weight": _r(c, c),
            f"{p}.attention.self.query.bias": _r(c),
            f"{p}.attention.self.key.weight": _r(c, c),
            f"{p}.attention.self.key.bias": _r(c),
            f"{p}.attention.self.value.weight": _r(c, c),
            f"{p}.attention.self.value.bias": _r(c),
            f"{p}.attention.output.dense.weight": _r(c, c),
            f"{p}.attention.output.dense.bias": _r(c),
            f"{p}.attention.output.LayerNorm.weight": _r(c),
            f"{p}.attention.output.LayerNorm.bias": _r(c),
            f"{p}.mlp.gated_layers.weight": _r(2 * ff, c),
            f"{p}.mlp.wo.weight": _r(c, ff),
            f"{p}.mlp.wo.bias": _r(c),
            f"{p}.mlp.layernorm.weight": _r(c),
            f"{p}.mlp.layernorm.bias": _r(c),
        })
    hf_dir, _ = _write_hf(tmp_path, "jina", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    expected = ["token_embd.weight", "token_types.weight",
                "token_embd_norm.weight", "token_embd_norm.bias"]
    for i in range(2):
        expected += [f"blk.{i}.{n}" for n in (
            "attn_q.weight", "attn_q.bias", "attn_k.weight", "attn_k.bias",
            "attn_v.weight", "attn_v.bias", "attn_output.weight",
            "attn_output.bias", "attn_output_norm.weight",
            "attn_output_norm.bias", "ffn_gate.weight", "ffn_up.weight",
            "ffn_down.weight", "ffn_down.bias", "layer_output_norm.weight",
            "layer_output_norm.bias")]
    model = _check(out, expected, smoke=False)
    assert model.cfg.arch == "jina-bert-v2"
    assert model.cfg.pos_embd_type == "alibi" and model.cfg.act == "gelu"

    from llama_cpp_dsp_tpu.models.bert import bert_forward

    emb = bert_forward(model.params, model.cfg,
                       jnp.asarray([[2, 5, 9]], jnp.int32),
                       compute_dtype=jnp.float32, pooling="mean")
    assert np.isfinite(np.asarray(emb)).all()


def _write_world_vocab(d, n=60):
    # `<id> <repr> <len>` lines (reference _set_vocab_rwkv_world)
    lines = []
    for i in range(1, n + 1):
        tok = f"t{i}"
        lines.append(f"{i} {tok!r} {len(tok)}")
    (d / "rwkv_vocab_v20230424.txt").write_text("\n".join(lines))


def test_convert_rwkv6(tmp_path):
    c, hs, ff, r5, r2, v = 64, 16, 128, 8, 8, 80
    h = c // hs
    d = tmp_path / "rwkv6"
    d.mkdir()
    _write_world_vocab(d)
    config = dict(
        model_type="rwkv6", architectures=["Rwkv6ForCausalLM"],
        hidden_size=c, num_hidden_layers=2, attention_hidden_size=c,
        head_size=hs, intermediate_size=ff, layer_norm_epsilon=1e-5,
        rescale_every=2, vocab_size=v,
        lora_rank_tokenshift=r5, lora_rank_decay=r2)
    (d / "config.json").write_text(json.dumps(config))
    tensors = {
        "rwkv.embeddings.weight": _r(v, c),
        "rwkv.ln_out.weight": _r(c), "rwkv.ln_out.bias": _r(c),
        "head.weight": _r(v, c),
        "rwkv.blocks.0.pre_ln.weight": _r(c),
        "rwkv.blocks.0.pre_ln.bias": _r(c),
    }
    for i in range(2):
        p = f"rwkv.blocks.{i}"
        tensors.update({
            f"{p}.ln1.weight": _r(c), f"{p}.ln1.bias": _r(c),
            f"{p}.ln2.weight": _r(c), f"{p}.ln2.bias": _r(c),
            f"{p}.attention.time_maa_x": _r(1, 1, c),
            f"{p}.attention.time_maa_w": _r(1, 1, c),
            f"{p}.attention.time_maa_k": _r(1, 1, c),
            f"{p}.attention.time_maa_v": _r(1, 1, c),
            f"{p}.attention.time_maa_r": _r(1, 1, c),
            f"{p}.attention.time_maa_g": _r(1, 1, c),
            f"{p}.attention.time_maa_w1": _r(c, 5 * r5),
            f"{p}.attention.time_maa_w2": _r(5, r5, c),
            f"{p}.attention.time_decay": _r(1, 1, c) - 4.0,
            f"{p}.attention.time_decay_w1": _r(c, r2),
            f"{p}.attention.time_decay_w2": _r(r2, c),
            f"{p}.attention.time_faaaa": _r(h, hs),
            f"{p}.attention.key.weight": _r(c, c),
            f"{p}.attention.value.weight": _r(c, c),
            f"{p}.attention.receptance.weight": _r(c, c),
            f"{p}.attention.gate.weight": _r(c, c),
            f"{p}.attention.ln_x.weight": _r(c),
            f"{p}.attention.ln_x.bias": _r(c),
            f"{p}.attention.output.weight": _r(c, c),
            f"{p}.feed_forward.time_maa_k": _r(1, 1, c),
            f"{p}.feed_forward.time_maa_r": _r(1, 1, c),
            f"{p}.feed_forward.key.weight": _r(ff, c),
            f"{p}.feed_forward.receptance.weight": _r(c, c),
            f"{p}.feed_forward.value.weight": _r(c, ff),
        })
    safetensors.save_file(tensors, str(d / "model.safetensors"))
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")

    model = load_model(out)
    assert model.cfg.arch == "rwkv6" and model.cfg.head_dim == hs
    l0 = model.params["layers"][0]
    # loader undoes the reference mul_mat-orientation transposes
    assert l0["time_mix_w1"].shape == (c, 5 * r5)
    assert l0["time_mix_w2"].shape == (5, r5, c)
    assert l0["time_mix_decay_w1"].shape == (c, r2)
    assert l0["time_mix_decay_w2"].shape == (r2, c)
    assert l0["time_mix_lerp_x"].shape == (c,)
    assert "ffn_norm" in l0  # ln2 (GGUF attn_norm_2)
    assert "token_embd_norm" in model.params  # pre_ln

    from llama_cpp_dsp_tpu.models.rwkv6 import forward

    logits, _ = forward(model.params, model.cfg,
                        jnp.asarray([[3, 5, 9, 2]], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()
    # rwkv world tokenizer round-trips
    assert model.tokenizer is not None


def test_convert_rwkv7(tmp_path):
    c, hs, ff, r, v = 64, 16, 128, 8, 80
    h = c // hs
    d = tmp_path / "rwkv7"
    d.mkdir()
    _write_world_vocab(d)
    config = dict(
        model_type="rwkv7", architectures=["Rwkv7ForCausalLM"],
        hidden_size=c, num_hidden_layers=2, head_size=hs,
        intermediate_size=ff, layer_norm_epsilon=1e-5, vocab_size=v,
        wkv_has_gate=True, lora_rank_decay=r, lora_rank_iclr=r,
        lora_rank_value_residual_mix=r, lora_rank_gate=r)
    (d / "config.json").write_text(json.dumps(config))
    tensors = {
        "model.embeddings.weight": _r(v, c),
        "model.pre_ln.weight": _r(c), "model.pre_ln.bias": _r(c),
        "model.ln_out.weight": _r(c), "model.ln_out.bias": _r(c),
        "head.weight": _r(v, c),
    }
    for i in range(2):
        p = f"model.layers.{i}"
        tensors.update({
            f"{p}.ln1.weight": _r(c), f"{p}.ln1.bias": _r(c),
            f"{p}.ln2.weight": _r(c), f"{p}.ln2.bias": _r(c),
            f"{p}.attention.x_r": _r(1, 1, c),
            f"{p}.attention.x_w": _r(1, 1, c),
            f"{p}.attention.x_k": _r(1, 1, c),
            f"{p}.attention.x_v": _r(1, 1, c),
            f"{p}.attention.x_a": _r(1, 1, c),
            f"{p}.attention.x_g": _r(1, 1, c),
            f"{p}.attention.w0": _r(1, 1, c) - 1.0,
            f"{p}.attention.w1": _r(c, r),
            f"{p}.attention.w2": _r(r, c),
            f"{p}.attention.a0": _r(1, 1, c),
            f"{p}.attention.a1": _r(c, r),
            f"{p}.attention.a2": _r(r, c),
            f"{p}.attention.g1": _r(c, r),
            f"{p}.attention.g2": _r(r, c),
            f"{p}.attention.k_k": _r(1, 1, c),
            f"{p}.attention.k_a": _r(1, 1, c),
            f"{p}.attention.r_k": _r(h, hs),
            f"{p}.attention.key.weight": _r(c, c),
            f"{p}.attention.value.weight": _r(c, c),
            f"{p}.attention.receptance.weight": _r(c, c),
            f"{p}.attention.output.weight": _r(c, c),
            f"{p}.attention.ln_x.weight": _r(c),
            f"{p}.attention.ln_x.bias": _r(c),
            f"{p}.feed_forward.x_k": _r(1, 1, c),
            f"{p}.feed_forward.key.weight": _r(ff, c),
            f"{p}.feed_forward.value.weight": _r(c, ff),
        })
        if i > 0:  # v-residual LoRA exists on layers > 0 (layer 0 dummies)
            tensors.update({
                f"{p}.attention.v0": _r(1, 1, c),
                f"{p}.attention.v1": _r(c, r),
                f"{p}.attention.v2": _r(r, c),
            })
    safetensors.save_file(tensors, str(d / "model.safetensors"))
    out = str(d / "m.gguf")
    convert(str(d), out, "f32")

    model = load_model(out)
    assert model.cfg.arch == "rwkv7" and model.cfg.head_dim == hs
    for i in range(2):
        li = model.params["layers"][i]
        assert li["time_mix_lerp_fused"].shape == (6, 1, 1, c)
        # loader flips the reference's LoRA transposes back
        assert li["time_mix_w1"].shape == (c, r)
        assert li["time_mix_w2"].shape == (r, c)
        # layer-0 dummy v0/v1/v2 mirror a0/a1/a2 (reference Rwkv7Model)
        assert "time_mix_v1" in li
    l0 = model.params["layers"][0]
    np.testing.assert_array_equal(np.asarray(l0["time_mix_v1"]),
                                  np.asarray(l0["time_mix_a1"]))

    from llama_cpp_dsp_tpu.models.rwkv7 import forward

    logits, _ = forward(model.params, model.cfg,
                        jnp.asarray([[3, 5, 9, 2]], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_rwkv6qwen2(tmp_path):
    c, hs, ff, r5, r2, kv = 64, 16, 128, 8, 8, 2
    h = c // hs
    kvdim = kv * hs
    config = dict(
        model_type="rwkv6qwen2", architectures=["RWKV6Qwen2ForCausalLM"],
        hidden_size=c, num_hidden_layers=1, num_attention_heads=h,
        num_key_value_heads=kv, intermediate_size=ff, rms_norm_eps=1e-6,
        lora_rank_tokenshift=r5, lora_rank_decay=r2)
    tensors = {"model.embed_tokens.weight": lambda nv: _r(nv, c),
               "model.norm.weight": _r(c),
               "lm_head.weight": lambda nv: _r(nv, c)}
    p = "model.layers.0"
    tensors.update({
        f"{p}.input_layernorm.weight": _r(c),
        f"{p}.post_attention_layernorm.weight": _r(c),
        f"{p}.self_attn.time_maa_x": _r(1, 1, c),
        f"{p}.self_attn.time_maa_w": _r(1, 1, c),
        f"{p}.self_attn.time_maa_k": _r(1, 1, c),
        f"{p}.self_attn.time_maa_v": _r(1, 1, c),
        f"{p}.self_attn.time_maa_r": _r(1, 1, c),
        f"{p}.self_attn.time_maa_g": _r(1, 1, c),
        f"{p}.self_attn.time_maa_w1": _r(c, 5 * r5),
        f"{p}.self_attn.time_maa_w2": _r(5, r5, c),
        f"{p}.self_attn.time_decay": _r(1, 1, c) - 4.0,
        f"{p}.self_attn.time_decay_w1": _r(c, r2),
        f"{p}.self_attn.time_decay_w2": _r(r2, c),
        f"{p}.self_attn.k_proj.weight": _r(kvdim, c),
        f"{p}.self_attn.k_proj.bias": _r(kvdim),
        f"{p}.self_attn.v_proj.weight": _r(kvdim, c),
        f"{p}.self_attn.v_proj.bias": _r(kvdim),
        f"{p}.self_attn.q_proj.weight": _r(c, c),
        f"{p}.self_attn.q_proj.bias": _r(c),
        f"{p}.self_attn.gate.weight": _r(c, c),
        f"{p}.self_attn.o_proj.weight": _r(c, c),
        f"{p}.mlp.gate_proj.weight": _r(ff, c),
        f"{p}.mlp.up_proj.weight": _r(ff, c),
        f"{p}.mlp.down_proj.weight": _r(c, ff),
    })
    hf_dir, _ = _write_hf(tmp_path, "rwkv6qwen2", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    model = load_model(out)
    assert model.cfg.arch == "rwkv6qwen2" and model.cfg.head_dim == hs
    l0 = model.params["layers"][0]
    assert "time_mix_first" not in l0  # qrwkv marker
    assert l0["time_mix_w1"].shape == (c, 5 * r5)
    assert l0["time_mix_key"].shape == (kvdim, c)
    assert "time_mix_key_bias" in l0 and "ffn_gate" in l0

    from llama_cpp_dsp_tpu.models.rwkv6 import forward

    logits, _ = forward(model.params, model.cfg,
                        jnp.asarray([[3, 5, 9, 2]], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_arwkv7(tmp_path):
    c, hs, ff, r = 64, 16, 128, 8
    h = c // hs
    config = dict(
        model_type="rwkv_hybrid", architectures=["RwkvHybridForCausalLM"],
        hidden_size=c, num_hidden_layers=1, head_size=hs,
        intermediate_size=ff, rms_norm_eps=1e-6, wkv_has_gate=True,
        wkv_version=7)
    tensors = {"model.embed_tokens.weight": lambda nv: _r(nv, c),
               "model.norm.weight": _r(c),
               "lm_head.weight": lambda nv: _r(nv, c)}
    p = "model.layers.0"
    tensors.update({
        f"{p}.input_layernorm.weight": _r(c),
        f"{p}.post_attention_layernorm.weight": _r(c),
        f"{p}.self_attn.time_mixer.x_x": _r(6, c),
        f"{p}.self_attn.time_mixer.w0": _r(1, 1, c) - 1.0,
        f"{p}.self_attn.time_mixer.w1": _r(c, r),
        f"{p}.self_attn.time_mixer.w2": _r(r, c),
        f"{p}.self_attn.time_mixer.a0": _r(1, 1, c),
        f"{p}.self_attn.time_mixer.a1": _r(c, r),
        f"{p}.self_attn.time_mixer.a2": _r(r, c),
        f"{p}.self_attn.time_mixer.g1": _r(c, r),
        f"{p}.self_attn.time_mixer.g2": _r(r, c),
        f"{p}.self_attn.time_mixer.k_k": _r(1, 1, c),
        f"{p}.self_attn.time_mixer.k_a": _r(1, 1, c),
        f"{p}.self_attn.time_mixer.r_k": _r(h, hs),
        f"{p}.self_attn.time_mixer.key.weight": _r(c, c),
        f"{p}.self_attn.time_mixer.value.weight": _r(c, c),
        f"{p}.self_attn.time_mixer.receptance.weight": _r(c, c),
        f"{p}.self_attn.time_mixer.output.weight": _r(c, c),
        f"{p}.self_attn.time_mixer.g_norm.weight": _r(c),
        f"{p}.self_attn.time_mixer.g_norm.bias": _r(c),
        f"{p}.mlp.gate_proj.weight": _r(ff, c),
        f"{p}.mlp.up_proj.weight": _r(ff, c),
        f"{p}.mlp.down_proj.weight": _r(c, ff),
    })
    hf_dir, _ = _write_hf(tmp_path, "arwkv7", config, tensors)
    out = str(hf_dir / "m.gguf")
    convert(str(hf_dir), out, "f32")
    model = load_model(out)
    assert model.cfg.arch == "arwkv7" and model.cfg.head_dim == hs
    l0 = model.params["layers"][0]
    assert l0["time_mix_lerp_fused"].shape == (6, 1, 1, c)
    assert "ffn_gate" in l0

    from llama_cpp_dsp_tpu.models.rwkv7 import forward

    logits, _ = forward(model.params, model.cfg,
                        jnp.asarray([[3, 5, 9, 2]], jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()
