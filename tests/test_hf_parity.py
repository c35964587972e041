"""Logit parity vs HuggingFace transformers on tiny random models.

This is the semantic oracle for the arch zoo: the reference validates its
graphs against upstream implementations via perplexity/CI on real models
(ci/run.sh); here we check exact graph semantics directly — our f32 forward
must match the HF reference implementation of each family to ~1e-3.
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llama_cpp_dsp_tpu.models.llama import LlamaConfig, forward
from llama_cpp_dsp_tpu.ops.rope import RopeParams


def _t2n(t):
    return t.detach().cpu().numpy().astype(np.float32)


def _run_ours(cfg, params, tokens):
    n = tokens.shape[1]
    positions = np.arange(n, dtype=np.int32).reshape(1, n)
    mask = np.tril(np.ones((1, n, n), bool))
    logits, _ = forward(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions),
        mask=mask, compute_dtype=jnp.float32,
    )
    return np.asarray(logits)[0]


def _run_hf(model, tokens):
    with torch.no_grad():
        out = model(torch.tensor(tokens, dtype=torch.long))
    return _t2n(out.logits[0])


def _layer_common(hfl, prefix=""):
    return {}


def test_llama_parity():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="llama", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-6,
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
    )
    layers = []
    for hl in model.model.layers:
        layers.append({
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "ffn_norm": _t2n(hl.post_attention_layernorm.weight),
            "ffn_gate": _t2n(hl.mlp.gate_proj.weight),
            "ffn_up": _t2n(hl.mlp.up_proj.weight),
            "ffn_down": _t2n(hl.mlp.down_proj.weight),
        })
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(model.model.norm.weight),
        "output": _t2n(model.lm_head.weight),
    }
    tokens = np.array([[1, 5, 9, 20, 33, 47, 2, 17]], np.int32)
    ours = _run_ours(cfg, params, tokens)
    theirs = _run_hf(model, tokens)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_gpt2_parity():
    hf_cfg = transformers.GPT2Config(
        vocab_size=128, n_positions=64, n_embd=64, n_layer=2, n_head=4,
        activation_function="gelu_new",
    )
    torch.manual_seed(1)
    model = transformers.GPT2LMHeadModel(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="gpt2", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=4,
        head_dim=16, n_ff=256, n_vocab=128, n_ctx_train=64, rms_eps=1e-5,
        norm_type="ln", pos_embd_type="learned", act="gelu", gated_ffn=False,
        tie_embeddings=True,
    )
    layers = []
    for hl in model.transformer.h:
        w_qkv = _t2n(hl.attn.c_attn.weight).T  # Conv1D stores [in, out]
        b_qkv = _t2n(hl.attn.c_attn.bias)
        layers.append({
            "attn_norm": _t2n(hl.ln_1.weight),
            "attn_norm_bias": _t2n(hl.ln_1.bias),
            "attn_q": w_qkv[0:64], "attn_q_bias": b_qkv[0:64],
            "attn_k": w_qkv[64:128], "attn_k_bias": b_qkv[64:128],
            "attn_v": w_qkv[128:192], "attn_v_bias": b_qkv[128:192],
            "attn_output": _t2n(hl.attn.c_proj.weight).T,
            "attn_output_bias": _t2n(hl.attn.c_proj.bias),
            "ffn_norm": _t2n(hl.ln_2.weight),
            "ffn_norm_bias": _t2n(hl.ln_2.bias),
            "ffn_up": _t2n(hl.mlp.c_fc.weight).T,
            "ffn_up_bias": _t2n(hl.mlp.c_fc.bias),
            "ffn_down": _t2n(hl.mlp.c_proj.weight).T,
            "ffn_down_bias": _t2n(hl.mlp.c_proj.bias),
        })
    params = {
        "token_embd": _t2n(model.transformer.wte.weight),
        "pos_embd": _t2n(model.transformer.wpe.weight),
        "layers": layers,
        "output_norm": _t2n(model.transformer.ln_f.weight),
        "output_norm_bias": _t2n(model.transformer.ln_f.bias),
    }
    tokens = np.array([[3, 14, 15, 92, 65, 35]], np.int32)
    ours = _run_ours(cfg, params, tokens)
    theirs = _run_hf(model, tokens)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_qwen2_parity():
    hf_cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="qwen2", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-6,
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
        attn_bias=True,
    )
    layers = []
    for hl in model.model.layers:
        layers.append({
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_q_bias": _t2n(hl.self_attn.q_proj.bias),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_k_bias": _t2n(hl.self_attn.k_proj.bias),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_v_bias": _t2n(hl.self_attn.v_proj.bias),
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "ffn_norm": _t2n(hl.post_attention_layernorm.weight),
            "ffn_gate": _t2n(hl.mlp.gate_proj.weight),
            "ffn_up": _t2n(hl.mlp.up_proj.weight),
            "ffn_down": _t2n(hl.mlp.down_proj.weight),
        })
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(model.model.norm.weight),
        "output": _t2n(model.lm_head.weight),
    }
    tokens = np.array([[7, 42, 11, 99, 3]], np.int32)
    ours = _run_ours(cfg, params, tokens)
    theirs = _run_hf(model, tokens)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_gemma2_parity():
    hf_cfg = transformers.Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=10000.0, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, query_pre_attn_scalar=16,
        sliding_window=4096, attention_bias=False,
    )
    torch.manual_seed(3)
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="gemma2", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-6,
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
        act="gelu", post_norms=True, attn_logit_softcap=50.0,
        final_logit_softcap=30.0, embd_scale=float(np.sqrt(64.0)),
        tie_embeddings=True, swa_window=4096, swa_pattern=2,
    )

    def gw(t):  # gemma stores w, applies (1 + w) — bake the +1 like the converter
        return _t2n(t) + 1.0

    layers = []
    for hl in model.model.layers:
        layers.append({
            "attn_norm": gw(hl.input_layernorm.weight),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "attn_post_norm": gw(hl.post_attention_layernorm.weight),
            "ffn_norm": gw(hl.pre_feedforward_layernorm.weight),
            "ffn_post_norm": gw(hl.post_feedforward_layernorm.weight),
            "ffn_gate": _t2n(hl.mlp.gate_proj.weight),
            "ffn_up": _t2n(hl.mlp.up_proj.weight),
            "ffn_down": _t2n(hl.mlp.down_proj.weight),
        })
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": gw(model.model.norm.weight),
    }
    tokens = np.array([[2, 9, 77, 31, 8, 55]], np.int32)
    ours = _run_ours(cfg, params, tokens)
    theirs = _run_hf(model, tokens)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=3e-3)


def test_mixtral_parity():
    hf_cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        num_local_experts=4, num_experts_per_tok=2, tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    model = transformers.MixtralForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="mixtral", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-6,
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
        n_expert=4, n_expert_used=2,
    )
    layers = []
    for hl in model.model.layers:
        moe = hl.block_sparse_moe
        layers.append({
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "ffn_norm": _t2n(hl.post_attention_layernorm.weight),
            "ffn_gate_inp": _t2n(moe.gate.weight),
            "ffn_gate_exps": np.stack([_t2n(e.w1.weight) for e in moe.experts]),
            "ffn_down_exps": np.stack([_t2n(e.w2.weight) for e in moe.experts]),
            "ffn_up_exps": np.stack([_t2n(e.w3.weight) for e in moe.experts]),
        })
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(model.model.norm.weight),
        "output": _t2n(model.lm_head.weight),
    }
    tokens = np.array([[4, 19, 90, 3, 27, 66, 8]], np.int32)
    ours = _run_ours(cfg, params, tokens)
    theirs = _run_hf(model, tokens)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=3e-3)


def test_qwen2vl_mrope_parity():
    """qwen2vl text path: M-RoPE section rotation must match HF's
    apply_multimodal_rotary_pos_emb (and reference ggml_rope_multi)."""
    hf_cfg = transformers.Qwen2VLConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
    )
    torch.manual_seed(5)
    model = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval()
    lm = model.model.language_model

    cfg = LlamaConfig(
        arch="qwen2vl", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-6,
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
        attn_bias=True, mrope_sections=(2, 3, 3, 0),
    )
    layers = []
    for hl in lm.layers:
        layers.append({
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_q_bias": _t2n(hl.self_attn.q_proj.bias),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_k_bias": _t2n(hl.self_attn.k_proj.bias),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_v_bias": _t2n(hl.self_attn.v_proj.bias),
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "ffn_norm": _t2n(hl.post_attention_layernorm.weight),
            "ffn_gate": _t2n(hl.mlp.gate_proj.weight),
            "ffn_up": _t2n(hl.mlp.up_proj.weight),
            "ffn_down": _t2n(hl.mlp.down_proj.weight),
        })
    params = {
        "token_embd": _t2n(lm.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(lm.norm.weight),
        "output": _t2n(model.lm_head.weight),
    }
    tokens = np.array([[7, 42, 11, 99, 3, 64]], np.int32)
    ours = _run_ours(cfg, params, tokens)
    theirs = _run_hf(model, tokens)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


@pytest.mark.parametrize("swin", [False, True])
def test_chameleon_parity(swin):
    """chameleon: per-head q/k LayerNorm (+bias) and swin (post) norm
    placement vs HF ChameleonForConditionalGeneration."""
    hf_cfg = transformers.ChameleonConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, swin_norm=swin, vocabulary_map={"a": 1},
    )
    torch.manual_seed(6)
    model = transformers.ChameleonForConditionalGeneration(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="chameleon", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-5,
        # neox mode: HF weights are unpermuted (GGUF conversion permutes q/k
        # to llama.cpp's NORM layout; raw HF uses rotate-half)
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
        qk_norm=True, qk_norm_ln=True, norm_after=swin,
    )
    layers = []
    for hl in model.model.layers:
        layers.append({
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "attn_q_norm": _t2n(hl.self_attn.q_norm.weight),
            "attn_q_norm_bias": _t2n(hl.self_attn.q_norm.bias),
            "attn_k_norm": _t2n(hl.self_attn.k_norm.weight),
            "attn_k_norm_bias": _t2n(hl.self_attn.k_norm.bias),
            "ffn_norm": _t2n(hl.post_attention_layernorm.weight),
            "ffn_gate": _t2n(hl.mlp.gate_proj.weight),
            "ffn_up": _t2n(hl.mlp.up_proj.weight),
            "ffn_down": _t2n(hl.mlp.down_proj.weight),
        })
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(model.model.norm.weight),
        "output": _t2n(model.lm_head.weight),
    }
    tokens = np.array([[7, 42, 11, 99, 3]], np.int32)
    ours = _run_ours(cfg, params, tokens)
    theirs = _run_hf(model, tokens)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-3)


def test_mrope_text_only_equals_neox():
    """With all four position streams equal, M-RoPE must reduce exactly to
    neox rope (reference ggml_mrope_cache_init with equal theta bases)."""
    from llama_cpp_dsp_tpu.ops.rope import apply_mrope, apply_rope

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 4, 32)).astype(np.float32))
    pos = jnp.asarray(np.arange(5, dtype=np.int32)[None, :].repeat(2, 0))
    rp = RopeParams(n_dims=32, mode="neox", freq_base=10000.0)
    a = apply_rope(x, pos, rp)
    b = apply_mrope(x, pos, rp, (4, 6, 6, 0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("variant", ["features", "qk_norm"])
def test_llama4_parity(variant):
    """llama4 vs HF. 'features': NoPE + temperature tuning + chunked
    attention + sigmoid weight-before-FFN MoE + shared expert (qk norm off —
    HF applies it on NoPE layers too, diverging from Meta/llama.cpp which
    norm only roped layers). 'qk_norm': all layers roped so the weightless
    L2 norm (eps 1e-6) is comparable. Note llama4's rope is interleaved
    (complex pairs) — our 'norm' mode, no weight permute."""
    qk = variant == "qk_norm"
    hf_cfg = transformers.Llama4TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        intermediate_size_mlp=80, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, num_local_experts=4,
        num_experts_per_tok=2, interleave_moe_layer_step=2,
        attention_chunk_size=4, floor_scale=2, attn_scale=0.1,
        use_qk_norm=qk, attn_temperature_tuning=not qk, rope_theta=10000.0,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        **({"no_rope_layers": [1, 1, 1, 1]} if qk else {}),
    )
    torch.manual_seed(7)
    model = transformers.Llama4ForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="llama4", n_layers=4, n_embd=32, n_heads=4, n_kv_heads=2,
        head_dim=8, n_ff=80, n_vocab=64, n_ctx_train=64, rms_eps=1e-6,
        rope=RopeParams(n_dims=8, mode="norm", freq_base=10000.0),
        n_expert=4, n_expert_used=2,
        moe_shared_expert=True, moe_norm_weights=False,
        expert_gating="sigmoid", moe_weight_before=True,
        nope_step=0 if qk else 4,
        attn_temp_scale=0.0 if qk else 0.1, attn_temp_floor=2,
        qk_norm_weightless=qk, attn_chunk=4, swa_window=4,
        # HF ties chunking to use_rope: all-roped ⇒ all layers chunked
        swa_pattern=5 if qk else 4,
    )
    ff_exp = 64
    layers = []
    for hl in model.model.layers:
        layer = {
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "ffn_norm": _t2n(hl.post_attention_layernorm.weight),
        }
        ffm = hl.feed_forward
        if hasattr(ffm, "experts"):  # MoE layer
            gu = _t2n(ffm.experts.gate_up_proj)  # [E, C, 2*ff]
            layer["ffn_gate_exps"] = gu[:, :, :ff_exp].transpose(0, 2, 1)
            layer["ffn_up_exps"] = gu[:, :, ff_exp:].transpose(0, 2, 1)
            layer["ffn_down_exps"] = _t2n(ffm.experts.down_proj).transpose(0, 2, 1)
            layer["ffn_gate_inp"] = _t2n(ffm.router.weight)
            layer["ffn_gate_shexp"] = _t2n(ffm.shared_expert.gate_proj.weight)
            layer["ffn_up_shexp"] = _t2n(ffm.shared_expert.up_proj.weight)
            layer["ffn_down_shexp"] = _t2n(ffm.shared_expert.down_proj.weight)
        else:
            layer["ffn_gate"] = _t2n(ffm.gate_proj.weight)
            layer["ffn_up"] = _t2n(ffm.up_proj.weight)
            layer["ffn_down"] = _t2n(ffm.down_proj.weight)
        layers.append(layer)
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(model.model.norm.weight),
        "output": _t2n(model.lm_head.weight),
    }
    tokens = np.array([[7, 42, 11, 59, 3, 33, 21]], np.int32)
    ours = _run_ours(cfg, params, tokens)
    theirs = _run_hf(model, tokens)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def _std_params(model, qkv_fused=False, n_embd=64, kv_dim=32):
    """Map a standard HF llama-family module tree to our param dict."""
    layers = []
    for hl in model.model.layers:
        layer = {}
        sa = hl.self_attn
        if qkv_fused:
            w = _t2n(sa.qkv_proj.weight)
            layer["attn_q"] = w[:n_embd]
            layer["attn_k"] = w[n_embd : n_embd + kv_dim]
            layer["attn_v"] = w[n_embd + kv_dim :]
        else:
            layer["attn_q"] = _t2n(sa.q_proj.weight)
            layer["attn_k"] = _t2n(sa.k_proj.weight)
            layer["attn_v"] = _t2n(sa.v_proj.weight)
        layer["attn_output"] = _t2n(sa.o_proj.weight)
        layers.append(layer)
    return layers


def test_phi3_parity():
    """phi3: fused qkv + fused gate_up (split at load in the real loader)."""
    hf_cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False, pad_token_id=0,
    )
    torch.manual_seed(11)
    model = transformers.Phi3ForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        arch="phi3", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-6,
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
    )
    layers = []
    for hl in model.model.layers:
        w = _t2n(hl.self_attn.qkv_proj.weight)
        gu = _t2n(hl.mlp.gate_up_proj.weight)
        layers.append({
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_q": w[:64], "attn_k": w[64:96], "attn_v": w[96:],
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "ffn_norm": _t2n(hl.post_attention_layernorm.weight),
            "ffn_gate": gu[:128], "ffn_up": gu[128:],
            "ffn_down": _t2n(hl.mlp.down_proj.weight),
        })
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(model.model.norm.weight),
        "output": _t2n(model.lm_head.weight),
    }
    tokens = np.array([[9, 4, 88, 12, 63]], np.int32)
    np.testing.assert_allclose(_run_ours(cfg, params, tokens),
                               _run_hf(model, tokens), rtol=1e-3, atol=2e-3)


def test_gptneox_parity():
    """gptneox: LN + parallel residual + fused qkv with per-head layout +
    partial learned... (use_parallel_residual=True)."""
    hf_cfg = transformers.GPTNeoXConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, rotary_pct=1.0, rotary_emb_base=10000,
        use_parallel_residual=True, layer_norm_eps=1e-5,
    )
    torch.manual_seed(12)
    model = transformers.GPTNeoXForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        arch="gptneox", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=4,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-5,
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
        norm_type="ln", act="gelu", gated_ffn=False, parallel_residual=True,
        attn_bias=True,
    )
    layers = []
    for hl in model.gpt_neox.layers:
        # HF qkv is interleaved per head [h, 3, d]; split to q/k/v
        w = _t2n(hl.attention.query_key_value.weight).reshape(4, 3, 16, 64)
        b = _t2n(hl.attention.query_key_value.bias).reshape(4, 3, 16)
        layers.append({
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_norm_bias": _t2n(hl.input_layernorm.bias),
            "attn_q": w[:, 0].reshape(64, 64),
            "attn_q_bias": b[:, 0].reshape(64),
            "attn_k": w[:, 1].reshape(64, 64),
            "attn_k_bias": b[:, 1].reshape(64),
            "attn_v": w[:, 2].reshape(64, 64),
            "attn_v_bias": b[:, 2].reshape(64),
            "attn_output": _t2n(hl.attention.dense.weight),
            "attn_output_bias": _t2n(hl.attention.dense.bias),
            "ffn_norm": _t2n(hl.post_attention_layernorm.weight),
            "ffn_norm_bias": _t2n(hl.post_attention_layernorm.bias),
            "ffn_up": _t2n(hl.mlp.dense_h_to_4h.weight),
            "ffn_up_bias": _t2n(hl.mlp.dense_h_to_4h.bias),
            "ffn_down": _t2n(hl.mlp.dense_4h_to_h.weight),
            "ffn_down_bias": _t2n(hl.mlp.dense_4h_to_h.bias),
        })
    params = {
        "token_embd": _t2n(model.gpt_neox.embed_in.weight),
        "layers": layers,
        "output_norm": _t2n(model.gpt_neox.final_layer_norm.weight),
        "output_norm_bias": _t2n(model.gpt_neox.final_layer_norm.bias),
        "output": _t2n(model.embed_out.weight),
    }
    tokens = np.array([[9, 4, 88, 12, 63, 2]], np.int32)
    np.testing.assert_allclose(_run_ours(cfg, params, tokens),
                               _run_hf(model, tokens), rtol=1e-3, atol=3e-3)


def test_olmo2_parity():
    """olmo2: norm applied to sublayer outputs (norm_after) + qk rms norm."""
    hf_cfg = transformers.Olmo2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(13)
    model = transformers.Olmo2ForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        arch="olmo2", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-6,
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
        norm_after=True, qk_norm=True, qk_norm_flat=True,
    )
    layers = []
    for hl in model.model.layers:
        # HF olmo2 q/k norms are over the PROJECTION dim (n_embd for q,
        # kv_dim for k), applied pre-reshape — per-head broadcast still
        # matches because rms over head_dim… no: olmo2 norm is over full dim.
        layers.append({
            "attn_norm": _t2n(hl.post_attention_layernorm.weight),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "attn_q_norm": _t2n(hl.self_attn.q_norm.weight),
            "attn_k_norm": _t2n(hl.self_attn.k_norm.weight),
            "ffn_norm": _t2n(hl.post_feedforward_layernorm.weight),
            "ffn_gate": _t2n(hl.mlp.gate_proj.weight),
            "ffn_up": _t2n(hl.mlp.up_proj.weight),
            "ffn_down": _t2n(hl.mlp.down_proj.weight),
        })
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(model.model.norm.weight),
        "output": _t2n(model.lm_head.weight),
    }
    tokens = np.array([[9, 4, 88, 12, 63]], np.int32)
    np.testing.assert_allclose(_run_ours(cfg, params, tokens),
                               _run_hf(model, tokens), rtol=1e-3, atol=2e-3)


def test_qwen3_parity():
    """qwen3: per-head q/k rms norm, no attn bias."""
    hf_cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=10000.0, tie_word_embeddings=False,
    )
    torch.manual_seed(14)
    model = transformers.Qwen3ForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        arch="qwen3", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-6,
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
        qk_norm=True,
    )
    layers = []
    for hl in model.model.layers:
        layers.append({
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "attn_q_norm": _t2n(hl.self_attn.q_norm.weight),
            "attn_k_norm": _t2n(hl.self_attn.k_norm.weight),
            "ffn_norm": _t2n(hl.post_attention_layernorm.weight),
            "ffn_gate": _t2n(hl.mlp.gate_proj.weight),
            "ffn_up": _t2n(hl.mlp.up_proj.weight),
            "ffn_down": _t2n(hl.mlp.down_proj.weight),
        })
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(model.model.norm.weight),
        "output": _t2n(model.lm_head.weight),
    }
    tokens = np.array([[9, 4, 88, 12, 63, 7]], np.int32)
    np.testing.assert_allclose(_run_ours(cfg, params, tokens),
                               _run_hf(model, tokens), rtol=1e-3, atol=2e-3)


def test_command_r_parity():
    """command-r: LN + parallel residual (attn/ffn share the input norm) +
    logit scale."""
    hf_cfg = transformers.CohereConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, layer_norm_eps=1e-5, rope_theta=10000.0,
        logit_scale=0.25, use_qk_norm=False, tie_word_embeddings=True,
    )
    torch.manual_seed(15)
    model = transformers.CohereForCausalLM(hf_cfg).eval()
    cfg = LlamaConfig(
        arch="command-r", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-5,
        rope=RopeParams(n_dims=16, mode="norm", freq_base=10000.0),
        norm_type="ln", parallel_residual=True, logit_scale=0.25,
        tie_embeddings=True,
    )
    layers = []
    for hl in model.model.layers:
        # cohere rope is interleaved (rotate every-two) → norm mode unpermuted
        layers.append({
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_q": _t2n(hl.self_attn.q_proj.weight),
            "attn_k": _t2n(hl.self_attn.k_proj.weight),
            "attn_v": _t2n(hl.self_attn.v_proj.weight),
            "attn_output": _t2n(hl.self_attn.o_proj.weight),
            "ffn_gate": _t2n(hl.mlp.gate_proj.weight),
            "ffn_up": _t2n(hl.mlp.up_proj.weight),
            "ffn_down": _t2n(hl.mlp.down_proj.weight),
        })
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(model.model.norm.weight),
    }
    tokens = np.array([[9, 4, 88, 12, 63]], np.int32)
    np.testing.assert_allclose(_run_ours(cfg, params, tokens),
                               _run_hf(model, tokens), rtol=1e-3, atol=2e-3)


def test_falcon_parity():
    """falcon (new decoder arch): grouped fused qkv, dual-LN parallel
    residual, GQA, gelu MLP."""
    hf_cfg = transformers.FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=True, num_kv_heads=2,
        parallel_attn=True, bias=False, rope_theta=10000.0,
        layer_norm_epsilon=1e-5, tie_word_embeddings=False,
    )
    torch.manual_seed(16)
    model = transformers.FalconForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="falcon", n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
        head_dim=16, n_ff=256, n_vocab=128, n_ctx_train=64, rms_eps=1e-5,
        rope=RopeParams(n_dims=16, mode="neox", freq_base=10000.0),
        norm_type="ln", parallel_residual=True, act="gelu", gated_ffn=False,
    )
    h, kv, d, qper = 4, 2, 16, 2
    layers = []
    for hl in model.transformer.h:
        w = _t2n(hl.self_attention.query_key_value.weight)
        g = w.reshape(kv, qper + 2, d, 64)  # grouped per kv head
        q_w = g[:, :qper].reshape(h * d, 64)
        k_w = g[:, qper].reshape(kv * d, 64)
        v_w = g[:, qper + 1].reshape(kv * d, 64)
        layers.append({
            "attn_norm": _t2n(hl.ln_attn.weight),
            "attn_norm_bias": _t2n(hl.ln_attn.bias),
            "ffn_norm": _t2n(hl.ln_mlp.weight),
            "ffn_norm_bias": _t2n(hl.ln_mlp.bias),
            "attn_q": q_w, "attn_k": k_w, "attn_v": v_w,
            "attn_output": _t2n(hl.self_attention.dense.weight),
            "ffn_up": _t2n(hl.mlp.dense_h_to_4h.weight),
            "ffn_down": _t2n(hl.mlp.dense_4h_to_h.weight),
        })
    params = {
        "token_embd": _t2n(model.transformer.word_embeddings.weight),
        "layers": layers,
        "output_norm": _t2n(model.transformer.ln_f.weight),
        "output_norm_bias": _t2n(model.transformer.ln_f.bias),
        "output": _t2n(model.lm_head.weight),
    }
    tokens = np.array([[9, 4, 88, 12, 63]], np.int32)
    np.testing.assert_allclose(_run_ours(cfg, params, tokens),
                               _run_hf(model, tokens), rtol=1e-3, atol=3e-3)
