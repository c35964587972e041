"""HF parity + state-consistency for the non-vanilla builders:
Mamba (SSM scan) and DeepSeek-V2 (absorbed MLA + MoE with shared experts).
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from llama_cpp_dsp_tpu.models.llama import LlamaConfig, forward as dec_forward
from llama_cpp_dsp_tpu.models.mamba import MambaState, forward as mamba_forward
from llama_cpp_dsp_tpu.ops.rope import RopeParams
from llama_cpp_dsp_tpu.runtime.kv_cache import KVCache, causal_mask


def _t2n(t):
    return t.detach().cpu().numpy().astype(np.float32)


@pytest.fixture(scope="module")
def mamba_pair():
    hf_cfg = transformers.MambaConfig(
        vocab_size=128, hidden_size=64, state_size=8, num_hidden_layers=2,
        conv_kernel=4, expand=2, time_step_rank=4, use_conv_bias=True,
        use_bias=False,
    )
    torch.manual_seed(0)
    model = transformers.MambaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="mamba", n_layers=2, n_embd=64, n_heads=0, n_kv_heads=0,
        head_dim=0, n_ff=0, n_vocab=128, n_ctx_train=64, rms_eps=1e-5,
        ssm_d_inner=128, ssm_d_state=8, ssm_d_conv=4, ssm_dt_rank=4,
    )
    layers = []
    for hl in model.backbone.layers:
        m = hl.mixer
        layers.append({
            "attn_norm": _t2n(hl.norm.weight),
            "ssm_in": _t2n(m.in_proj.weight),
            "ssm_conv1d": _t2n(m.conv1d.weight)[:, 0, :],  # [Ci,1,dconv]→[Ci,dconv]
            "ssm_conv1d_bias": _t2n(m.conv1d.bias),
            "ssm_x": _t2n(m.x_proj.weight),
            "ssm_dt": _t2n(m.dt_proj.weight),
            "ssm_dt_bias": _t2n(m.dt_proj.bias),
            "ssm_a": _t2n(m.A_log),
            "ssm_d": _t2n(m.D),
            "ssm_out": _t2n(m.out_proj.weight),
        })
    params = {
        "token_embd": _t2n(model.backbone.embeddings.weight),
        "layers": layers,
        "output_norm": _t2n(model.backbone.norm_f.weight),
    }
    return cfg, params, model


def test_mamba_hf_parity(mamba_pair):
    cfg, params, model = mamba_pair
    tokens = np.array([[3, 19, 44, 7, 102, 55, 21, 8]], np.int32)
    ours, _ = mamba_forward(params, cfg, jnp.asarray(tokens))
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours)[0], _t2n(theirs[0]),
                               rtol=2e-3, atol=2e-3)


def test_mamba_incremental_matches_full(mamba_pair):
    cfg, params, _ = mamba_pair
    tokens = np.array([[5, 9, 31, 77, 2, 60]], np.int32)
    full, _ = mamba_forward(params, cfg, jnp.asarray(tokens))
    state = MambaState.create(cfg, 1)
    outs = []
    for t in range(tokens.shape[1]):
        lg, state = mamba_forward(params, cfg, jnp.asarray(tokens[:, t : t + 1]),
                                  state=state)
        outs.append(np.asarray(lg)[0, 0])
    np.testing.assert_allclose(np.stack(outs), np.asarray(full)[0],
                               rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def dsv2_pair():
    hf_cfg = transformers.DeepseekV2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=32, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=16, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        moe_layer_freq=1, routed_scaling_factor=1.0, norm_topk_prob=False,
        rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=64,
        tie_word_embeddings=False, attention_bias=False,
    )
    torch.manual_seed(1)
    model = transformers.DeepseekV2ForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(
        arch="deepseek2", n_layers=3, n_embd=64, n_heads=4, n_kv_heads=4,
        head_dim=24, n_ff=128, n_vocab=128, n_ctx_train=64, rms_eps=1e-6,
        rope=RopeParams(n_dims=8, mode="norm", freq_base=10000.0),
        n_expert=4, n_expert_used=2, moe_norm_weights=False,
        moe_shared_expert=True, moe_scale=1.0, n_dense_layers=1,
        q_lora_rank=32, kv_lora_rank=32, qk_nope_dim=16, qk_rope_dim=8,
        v_head_dim=16,
    )
    layers = []
    for i, hl in enumerate(model.model.layers):
        a = hl.self_attn
        layer = {
            "attn_norm": _t2n(hl.input_layernorm.weight),
            "attn_q_a": _t2n(a.q_a_proj.weight),
            "attn_q_a_norm": _t2n(a.q_a_layernorm.weight),
            "attn_q_b": _t2n(a.q_b_proj.weight),
            "attn_kv_a_mqa": _t2n(a.kv_a_proj_with_mqa.weight),
            "attn_kv_a_norm": _t2n(a.kv_a_layernorm.weight),
            "attn_kv_b": _t2n(a.kv_b_proj.weight),
            "attn_output": _t2n(a.o_proj.weight),
            "ffn_norm": _t2n(hl.post_attention_layernorm.weight),
        }
        if i < 1:
            layer.update({
                "ffn_gate": _t2n(hl.mlp.gate_proj.weight),
                "ffn_up": _t2n(hl.mlp.up_proj.weight),
                "ffn_down": _t2n(hl.mlp.down_proj.weight),
            })
        else:
            moe = hl.mlp
            layer.update({
                "ffn_gate_inp": _t2n(moe.gate.weight),
                "ffn_gate_exps": np.stack([_t2n(e.gate_proj.weight) for e in moe.experts]),
                "ffn_up_exps": np.stack([_t2n(e.up_proj.weight) for e in moe.experts]),
                "ffn_down_exps": np.stack([_t2n(e.down_proj.weight) for e in moe.experts]),
                "ffn_gate_shexp": _t2n(moe.shared_experts.gate_proj.weight),
                "ffn_up_shexp": _t2n(moe.shared_experts.up_proj.weight),
                "ffn_down_shexp": _t2n(moe.shared_experts.down_proj.weight),
            })
        layers.append(layer)
    params = {
        "token_embd": _t2n(model.model.embed_tokens.weight),
        "layers": layers,
        "output_norm": _t2n(model.model.norm.weight),
        "output": _t2n(model.lm_head.weight),
    }
    return cfg, params, model


def test_deepseek2_hf_parity(dsv2_pair):
    cfg, params, model = dsv2_pair
    tokens = np.array([[2, 17, 88, 4, 33, 120]], np.int32)
    n = tokens.shape[1]
    positions = np.arange(n, dtype=np.int32).reshape(1, n)
    ours, _ = dec_forward(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions),
        mask=np.tril(np.ones((1, n, n), bool)), compute_dtype=jnp.float32,
    )
    with torch.no_grad():
        theirs = model(torch.tensor(tokens, dtype=torch.long)).logits
    np.testing.assert_allclose(np.asarray(ours)[0], _t2n(theirs[0]),
                               rtol=2e-3, atol=3e-4)


def test_deepseek2_cached_decode(dsv2_pair):
    cfg, params, _ = dsv2_pair
    n, n_ctx = 6, 16
    tokens = np.array([[2, 17, 88, 4, 33, 120]], np.int32)
    positions = np.arange(n, dtype=np.int32).reshape(1, n)
    full, _ = dec_forward(
        params, cfg, jnp.asarray(tokens), jnp.asarray(positions),
        mask=np.tril(np.ones((1, n, n), bool)), compute_dtype=jnp.float32,
    )
    cache = KVCache.create(cfg.n_layers, 1, n_ctx, cfg.kv_cache_heads,
                           cfg.kv_cache_dim, jnp.float32)
    mask = causal_mask(jnp.asarray(positions[:, : n - 1]), n_ctx, 0)
    _, cache = dec_forward(
        params, cfg, jnp.asarray(tokens[:, : n - 1]),
        jnp.asarray(positions[:, : n - 1]), cache, 0, mask,
        compute_dtype=jnp.float32,
    )
    mask1 = causal_mask(jnp.asarray(positions[:, n - 1 :]), n_ctx, n - 1)
    step, _ = dec_forward(
        params, cfg, jnp.asarray(tokens[:, n - 1 :]),
        jnp.asarray(positions[:, n - 1 :]), cache, n - 1, mask1,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(step)[0, -1], np.asarray(full)[0, -1],
                               rtol=1e-4, atol=1e-4)
