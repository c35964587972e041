"""HF checkpoint → GGUF converter.

Capability mirror of the reference's convert_hf_to_gguf.py (5637 LoC, 73
Model subclasses) scoped to the registered arch zoo: reads config.json +
safetensors (or torch .bin), maps tensor names, applies the per-arch weight
transforms (llama q/k rotate-half→interleaved permutation, gemma norm +1),
extracts the tokenizer from tokenizer.json (BPE), and writes GGUF v3 with
optional on-the-fly quantization.

Usage: python -m llama_cpp_dsp_tpu.tools.convert_hf <hf_dir> -o out.gguf
           [--outtype f32|f16|q8_0|q4_0|q4_k|q6_k]
"""

from __future__ import annotations

import argparse
import json
import logging
import re
import sys
from pathlib import Path

import numpy as np

from ..gguf.constants import GGMLType, GGUFValueType, Keys
from ..gguf.writer import GGUFWriter

log = logging.getLogger("convert_hf")

# HF model_type → GGUF arch
_MODEL_TYPE_TO_ARCH = {
    "llama": "llama",
    "mistral": "llama",
    "mixtral": "llama",
    "qwen2": "qwen2",
    "qwen2_moe": "qwen2moe",
    "qwen3": "qwen3",
    "gemma": "gemma",
    "gemma2": "gemma2",
    "gemma3_text": "gemma3",
    "phi": "phi2",
    "phi3": "phi3",
    "gpt2": "gpt2",
    "gpt_neox": "gptneox",
    "starcoder2": "starcoder2",
    "stablelm": "stablelm",
    "olmo": "olmo",
    "olmo2": "olmo2",
    "bloom": "bloom",
    "mpt": "mpt",
    "falcon": "falcon",
    "cohere": "command-r",
    "deepseek_v2": "deepseek2",
    "granite": "granite",
    "mamba": "mamba",
    "internlm2": "internlm2",
    "exaone": "exaone",
    "nemotron": "nemotron",
    "dbrx": "dbrx",
    "orion": "orion",
    "qwen2_vl": "qwen2vl",
    "chameleon": "chameleon",
    "baichuan": "baichuan",
    "xverse": "xverse",
    "minicpm": "minicpm",
    "gptj": "gptj",
    "cohere2": "cohere2",
    "granitemoe": "granitemoe",
    "olmoe": "olmoe",
    "qwen3_moe": "qwen3moe",
    "phimoe": "phimoe",
    "gpt_bigcode": "starcoder",
    "bert": "bert",
    "t5": "t5",
    "nemotron": "nemotron",
    "glm": "glm4",
    "glm4": "glm4",
    "deepseek_v3": "deepseek2",
    "llama4": "llama4",
    "llama4_text": "llama4",
    "mistral3": "llama",  # Mistral3ForConditionalGeneration (text side)
    "roberta": "bert",
    "xlm-roberta": "bert",
    "camembert": "bert",
    "mt5": "t5",
    "umt5": "t5",
    "falcon_mamba": "mamba",
    "qwen2_5_vl": "qwen2vl",
    "openelm": "openelm",
    "minicpm3": "minicpm3",
    "chatglm": "chatglm",
    "grok-1": "grok",
    "grok": "grok",
    "bitnet": "bitnet",
    "plm": "plm",
    "deci": "deci",
    "nemotron-nas": "deci",  # Llama-3_1-Nemotron-51B (block_configs)
    "plamo": "plamo",
    "arctic": "arctic",
    "gpt_refact": "refact",
    "nomic_bert": "nomic-bert",
    "jina_bert_v2": "jina-bert-v2",
    "rwkv6": "rwkv6",
    "rwkv6qwen2": "rwkv6qwen2",
    "rwkv7": "rwkv7",
    "rwkv_hybrid": "arwkv7",
}

# HF architectures[0] overrides for repos whose model_type is generic
# (e.g. 1bitLLM publishes BitnetForCausalLM under model_type "llama")
_ARCH_CLS_TO_MODEL_TYPE = {
    "BitnetForCausalLM": "bitnet",
    "GrokForCausalLM": "grok",
    "OpenELMForCausalLM": "openelm",
    "MiniCPM3ForCausalLM": "minicpm3",
    "ChatGLMModel": "chatglm",
    "ChatGLMForConditionalGeneration": "chatglm",
    "PLMForCausalLM": "plm",
    "DeciLMForCausalLM": "deci",
    "PlamoForCausalLM": "plamo",
    "ArcticForCausalLM": "arctic",
    "GPTRefactForCausalLM": "gpt_refact",
    "NomicBertModel": "nomic_bert",
    "JinaBertModel": "jina_bert_v2",
    "JinaBertForMaskedLM": "jina_bert_v2",
    "Rwkv6ForCausalLM": "rwkv6",
    "RWKV6Qwen2ForCausalLM": "rwkv6qwen2",
    "Rwkv7ForCausalLM": "rwkv7",
    "RWKV7ForCausalLM": "rwkv7",
    "RwkvHybridForCausalLM": "rwkv_hybrid",
}

# model_types whose BERT-style position embeddings start at pad_token_id+1
# (reference convert_hf_to_gguf.py RobertaModel._position_offset)
_ROBERTA_LIKE = {"roberta", "xlm-roberta", "camembert"}


def _map_t5_name(name: str) -> str | None:
    """HF T5 → reference enc./dec. GGUF names (LLM_ARCH_T5 tables)."""
    glob = {
        "shared.weight": "token_embd.weight",
        "lm_head.weight": "output.weight",
        "encoder.final_layer_norm.weight": "enc.output_norm.weight",
        "decoder.final_layer_norm.weight": "dec.output_norm.weight",
    }
    if name in glob:
        return glob[name]
    for hf_side, side in (("encoder.block.", "enc"), ("decoder.block.", "dec")):
        if not name.startswith(hf_side):
            continue
        rest = name[len(hf_side):]
        idx, _, sub = rest.partition(".")
        # sub = "layer.L.<module>.<param>"
        parts = sub.split(".")
        lidx = int(parts[1])
        tail = ".".join(parts[2:])
        self_attn = {"SelfAttention.q.weight": "attn_q.weight",
                     "SelfAttention.k.weight": "attn_k.weight",
                     "SelfAttention.v.weight": "attn_v.weight",
                     "SelfAttention.o.weight": "attn_o.weight",
                     "SelfAttention.relative_attention_bias.weight":
                         "attn_rel_b.weight",
                     "layer_norm.weight": "attn_norm.weight"}
        cross = {"EncDecAttention.q.weight": "cross_attn_q.weight",
                 "EncDecAttention.k.weight": "cross_attn_k.weight",
                 "EncDecAttention.v.weight": "cross_attn_v.weight",
                 "EncDecAttention.o.weight": "cross_attn_o.weight",
                 "layer_norm.weight": "cross_attn_norm.weight"}
        ffn = {"DenseReluDense.wi.weight": "ffn_up.weight",
               "DenseReluDense.wi_0.weight": "ffn_gate.weight",
               "DenseReluDense.wi_1.weight": "ffn_up.weight",
               "DenseReluDense.wo.weight": "ffn_down.weight",
               "layer_norm.weight": "ffn_norm.weight"}
        if side == "enc":
            table = self_attn if lidx == 0 else ffn
        else:
            table = (self_attn, cross, ffn)[lidx]
        mapped = table.get(tail)
        return f"{side}.blk.{idx}.{mapped}" if mapped else None
    return None

# BERT (encoder) tensor names — reference LLM_ARCH_BERT tables
_BERT_GLOBAL = {
    "embeddings.word_embeddings.weight": "token_embd.weight",
    "embeddings.position_embeddings.weight": "position_embd.weight",
    "embeddings.token_type_embeddings.weight": "token_types.weight",
    "embeddings.LayerNorm.weight": "token_embd_norm.weight",
    "embeddings.LayerNorm.bias": "token_embd_norm.bias",
    "pooler.dense.weight": "cls.weight",
    "pooler.dense.bias": "cls.bias",
    "classifier.weight": "cls.output.weight",
    "classifier.bias": "cls.output.bias",
}
_BERT_LAYER = {
    "attention.self.query.weight": "attn_q.weight",
    "attention.self.query.bias": "attn_q.bias",
    "attention.self.key.weight": "attn_k.weight",
    "attention.self.key.bias": "attn_k.bias",
    "attention.self.value.weight": "attn_v.weight",
    "attention.self.value.bias": "attn_v.bias",
    "attention.output.dense.weight": "attn_output.weight",
    "attention.output.dense.bias": "attn_output.bias",
    "attention.output.LayerNorm.weight": "attn_output_norm.weight",
    "attention.output.LayerNorm.bias": "attn_output_norm.bias",
    "intermediate.dense.weight": "ffn_up.weight",
    "intermediate.dense.bias": "ffn_up.bias",
    "output.dense.weight": "ffn_down.weight",
    "output.dense.bias": "ffn_down.bias",
    "output.LayerNorm.weight": "layer_output_norm.weight",
    "output.LayerNorm.bias": "layer_output_norm.bias",
}


def _map_bert_name(name: str, extra: dict | None = None) -> str | None:
    name = name.removeprefix("bert.")  # BertForSequenceClassification root
    if name in _BERT_GLOBAL:
        return _BERT_GLOBAL[name]
    if name.startswith("encoder.layer."):
        rest = name[len("encoder.layer."):]
        idx, _, suffix = rest.partition(".")
        mapped = _BERT_LAYER.get(suffix)
        if mapped is None and extra is not None:
            mapped = extra.get(suffix)
        return f"blk.{idx}.{mapped}" if mapped else None
    return None

# HF tensor suffix → GGUF suffix (per-layer); {} is the layer index
_LAYER_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.o_proj.bias": "attn_output.bias",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    "self_attn.q_norm.bias": "attn_q_norm.bias",
    "self_attn.k_norm.bias": "attn_k_norm.bias",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.bias": "ffn_norm.bias",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",  # gemma2 (pre-ffn)
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
    "mlp.c_fc.weight": "ffn_up.weight",
    "mlp.c_fc.bias": "ffn_up.bias",
    "mlp.c_proj.weight": "ffn_down.weight",
    "mlp.c_proj.bias": "ffn_down.bias",
    "mlp.fc1.weight": "ffn_up.weight",
    "mlp.fc1.bias": "ffn_up.bias",
    "mlp.fc2.weight": "ffn_down.weight",
    "mlp.fc2.bias": "ffn_down.bias",
    "block_sparse_moe.gate.weight": "ffn_gate_inp.weight",
    "mlp.gate.weight": "ffn_gate_inp.weight",
    "mlp.shared_experts.gate_proj.weight": "ffn_gate_shexp.weight",
    "mlp.shared_experts.up_proj.weight": "ffn_up_shexp.weight",
    "mlp.shared_experts.down_proj.weight": "ffn_down_shexp.weight",
    # qwen2moe singular spelling + sigmoid shared-expert gate
    "mlp.shared_expert.gate_proj.weight": "ffn_gate_shexp.weight",
    "mlp.shared_expert.up_proj.weight": "ffn_up_shexp.weight",
    "mlp.shared_expert.down_proj.weight": "ffn_down_shexp.weight",
    "mlp.shared_expert_gate.weight": "ffn_gate_inp_shexp.weight",
    # phi2 output projection spelling
    "self_attn.dense.weight": "attn_output.weight",
    "self_attn.dense.bias": "attn_output.bias",
    # bloom (transformer.h.N.*, fused per-head qkv reordered in convert())
    "self_attention.query_key_value.weight": "attn_qkv.weight",
    "self_attention.query_key_value.bias": "attn_qkv.bias",
    "self_attention.dense.weight": "attn_output.weight",
    "self_attention.dense.bias": "attn_output.bias",
    "mlp.dense_h_to_4h.weight": "ffn_up.weight",
    "mlp.dense_h_to_4h.bias": "ffn_up.bias",
    "mlp.dense_4h_to_h.weight": "ffn_down.weight",
    "mlp.dense_4h_to_h.bias": "ffn_down.bias",
    # mpt (transformer.blocks.N.*)
    "attn.Wqkv.weight": "attn_qkv.weight",
    "attn.Wqkv.bias": "attn_qkv.bias",
    "norm_1.weight": "attn_norm.weight",
    "norm_1.bias": "attn_norm.bias",
    "norm_2.weight": "ffn_norm.weight",
    "norm_2.bias": "ffn_norm.bias",
    "ffn.up_proj.weight": "ffn_up.weight",
    "ffn.up_proj.bias": "ffn_up.bias",
    "ffn.down_proj.weight": "ffn_down.weight",
    "ffn.down_proj.bias": "ffn_down.bias",
    # gpt2-style fused blocks
    "attn.c_attn.weight": "attn_qkv.weight",
    "attn.c_attn.bias": "attn_qkv.bias",
    "attn.c_proj.weight": "attn_output.weight",
    "attn.c_proj.bias": "attn_output.bias",
    # gptj (transformer.h.N.attn.{q,k,v,out}_proj, mlp.fc_{in,out})
    "attn.q_proj.weight": "attn_q.weight",
    "attn.k_proj.weight": "attn_k.weight",
    "attn.v_proj.weight": "attn_v.weight",
    "attn.out_proj.weight": "attn_output.weight",
    "mlp.fc_in.weight": "ffn_up.weight",
    "mlp.fc_in.bias": "ffn_up.bias",
    "mlp.fc_out.weight": "ffn_down.weight",
    "mlp.fc_out.bias": "ffn_down.bias",
    # granitemoe router (input/output_linear are split in convert())
    "block_sparse_moe.router.layer.weight": "ffn_gate_inp.weight",
    # deepseek2/minicpm3 MLA projections (reference DeepseekV2Model)
    "self_attn.q_a_proj.weight": "attn_q_a.weight",
    "self_attn.q_a_layernorm.weight": "attn_q_a_norm.weight",
    "self_attn.q_b_proj.weight": "attn_q_b.weight",
    "self_attn.kv_a_proj_with_mqa.weight": "attn_kv_a_mqa.weight",
    "self_attn.kv_a_layernorm.weight": "attn_kv_a_norm.weight",
    "self_attn.kv_b_proj.weight": "attn_kv_b.weight",
    # deepseek-v3 sigmoid-router bias (e_score_correction_bias)
    "mlp.gate.e_score_correction_bias": "exp_probs_b.bias",
    # bitnet sub-norms before wo / ffn_down
    "self_attn.inner_attn_ln.weight": "attn_sub_norm.weight",
    "mlp.ffn_layernorm.weight": "ffn_sub_norm.weight",
    # llama4 per-layer dense FFN / router / always-on shared expert
    "feed_forward.gate_proj.weight": "ffn_gate.weight",
    "feed_forward.up_proj.weight": "ffn_up.weight",
    "feed_forward.down_proj.weight": "ffn_down.weight",
    "feed_forward.router.weight": "ffn_gate_inp.weight",
    "feed_forward.shared_expert.gate_proj.weight": "ffn_gate_shexp.weight",
    "feed_forward.shared_expert.up_proj.weight": "ffn_up_shexp.weight",
    "feed_forward.shared_expert.down_proj.weight": "ffn_down_shexp.weight",
    # glm4 fused gate|up projection (registry fused_gate_up splits at load)
    "mlp.gate_up_proj.weight": "ffn_up.weight",
    # glm4 post-norms
    "post_self_attn_layernorm.weight": "attn_post_norm.weight",
    "post_mlp_layernorm.weight": "post_ffw_norm.weight",
    # refact (transformer.h.N.): plain q; kv/gate_up split in convert()
    "attn.q.weight": "attn_q.weight",
    "ln_1.weight": "attn_norm.weight",
    "ln_1.bias": "attn_norm.bias",
    "ln_2.weight": "ffn_norm.weight",
    "ln_2.bias": "ffn_norm.bias",
    # gemma2 post attn norm (HF post_attention_layernorm is the POST norm)
}

_GEMMA2_LAYER_MAP = {
    **_LAYER_MAP,
    "post_attention_layernorm.weight": "attn_post_norm.weight",
}

_GROK_LAYER_MAP = {
    # hpcai/keyfan grok-1 HF port names (reference tensor_mapping.py rows)
    "rms_norm.weight": "attn_norm.weight",
    "multi_head_attention.query.weight": "attn_q.weight",
    "multi_head_attention.key.weight": "attn_k.weight",
    "multi_head_attention.value.weight": "attn_v.weight",
    "multi_head_attention.linear.weight": "attn_output.weight",
    "rms_norm_1.weight": "attn_output_norm.weight",
    "rms_norm_2.weight": "ffn_norm.weight",
    "rms_norm_3.weight": "layer_output_norm.weight",
    "router.weight": "ffn_gate_inp.weight",
}

_OPENELM_LAYER_MAP = {
    "attn_norm.weight": "attn_norm.weight",
    "attn.qkv_proj.weight": "attn_qkv.weight",
    "attn.out_proj.weight": "attn_output.weight",
    "attn.q_norm.weight": "attn_q_norm.weight",
    "attn.k_norm.weight": "attn_k_norm.weight",
    "ffn_norm.weight": "ffn_norm.weight",
    "ffn.proj_2.weight": "ffn_down.weight",
}

_ARCTIC_LAYER_MAP = {
    **_LAYER_MAP,
    # reference arch_block_mappings_cfg MODEL_ARCH.ARCTIC: the dense
    # (residual) FFN norm is residual_layernorm → FFN_NORM, and
    # post_attention_layernorm is the MoE branch norm → FFN_NORM_EXP
    "residual_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm_exps.weight",
    "residual_mlp.w1.weight": "ffn_gate.weight",
    "residual_mlp.w3.weight": "ffn_up.weight",
    "residual_mlp.w2.weight": "ffn_down.weight",
}

_NOMIC_LAYER_MAP = {
    # encoder.layers.{bid}.* (reference tensor_mapping.py nomic-bert rows)
    "attn.Wqkv.weight": "attn_qkv.weight",
    "attn.Wqkv.bias": "attn_qkv.bias",
    "attn.out_proj.weight": "attn_output.weight",
    "attn.out_proj.bias": "attn_output.bias",
    "norm1.weight": "attn_output_norm.weight",
    "norm1.bias": "attn_output_norm.bias",
    "norm2.weight": "layer_output_norm.weight",
    "norm2.bias": "layer_output_norm.bias",
    "mlp.fc11.weight": "ffn_up.weight",
    "mlp.fc12.weight": "ffn_gate.weight",
    "mlp.fc2.weight": "ffn_down.weight",
}

# jina-bert-v2 additions to the BERT per-layer table (post-split names)
_JINA_LAYER_EXTRA = {
    "mlp.gated_layers_w.weight": "ffn_gate.weight",
    "mlp.gated_layers_v.weight": "ffn_up.weight",
    "mlp.wo.weight": "ffn_down.weight",
    "mlp.wo.bias": "ffn_down.bias",
    "mlp.down_layer.weight": "ffn_down.weight",
    "mlp.layernorm.weight": "layer_output_norm.weight",
    "mlp.layernorm.bias": "layer_output_norm.bias",
    "attention.self.layer_norm_q.weight": "attn_q_norm.weight",
    "attention.self.layer_norm_q.bias": "attn_q_norm.bias",
    "attention.self.layer_norm_k.weight": "attn_k_norm.weight",
    "attention.self.layer_norm_k.bias": "attn_k_norm.bias",
    # jina-v2-code extra norms
    "layer_norm_1.weight": "attn_norm_2.weight",
    "layer_norm_1.bias": "attn_norm_2.bias",
    "layer_norm_2.weight": "layer_output_norm.weight",
    "layer_norm_2.bias": "layer_output_norm.bias",
}

# rwkv6 per-block attention/feed_forward sub-maps (reference
# tensor_mapping.py rwkv6 rows; GGUF names per LLM_ARCH_RWKV6)
_RWKV6_ATT = {
    "time_maa_x": "time_mix_lerp_x", "time_maa_w": "time_mix_lerp_w",
    "time_maa_k": "time_mix_lerp_k", "time_maa_v": "time_mix_lerp_v",
    "time_maa_r": "time_mix_lerp_r", "time_maa_g": "time_mix_lerp_g",
    "time_maa_w1": "time_mix_w1", "time_maa_w2": "time_mix_w2",
    "time_faaaa": "time_mix_first", "time_decay": "time_mix_decay",
    "time_decay_w1": "time_mix_decay_w1",
    "time_decay_w2": "time_mix_decay_w2",
    "key": "time_mix_key", "value": "time_mix_value",
    "receptance": "time_mix_receptance", "gate": "time_mix_gate",
    "ln_x": "time_mix_ln", "output": "time_mix_output",
    # rwkv6qwen2 projection spellings
    "k_proj": "time_mix_key", "v_proj": "time_mix_value",
    "q_proj": "time_mix_receptance", "o_proj": "time_mix_output",
}
_RWKV6_FFN = {
    "time_maa_k": "channel_mix_lerp_k", "time_maa_r": "channel_mix_lerp_r",
    "key": "channel_mix_key", "receptance": "channel_mix_receptance",
    "value": "channel_mix_value",
}
_RWKV7_ATT = {
    "w0": "time_mix_w0", "w1": "time_mix_w1", "w2": "time_mix_w2",
    "a0": "time_mix_a0", "a1": "time_mix_a1", "a2": "time_mix_a2",
    "v0": "time_mix_v0", "v1": "time_mix_v1", "v2": "time_mix_v2",
    "g1": "time_mix_g1", "g2": "time_mix_g2",
    "k_k": "time_mix_k_k", "k_a": "time_mix_k_a", "r_k": "time_mix_r_k",
    "key": "time_mix_key", "k_proj": "time_mix_key",
    "value": "time_mix_value", "v_proj": "time_mix_value",
    "receptance": "time_mix_receptance", "r_proj": "time_mix_receptance",
    "output": "time_mix_output", "o_proj": "time_mix_output",
    "ln_x": "time_mix_ln", "g_norm": "time_mix_ln",
}
_RWKV7_FFN = {
    "x_k": "channel_mix_lerp_k",
    "key": "channel_mix_key", "value": "channel_mix_value",
}

_CHATGLM_LAYER_MAP = {
    "input_layernorm.weight": "attn_norm.weight",
    "self_attention.query_key_value.weight": "attn_qkv.weight",
    "self_attention.query_key_value.bias": "attn_qkv.bias",
    "self_attention.dense.weight": "attn_output.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.dense_h_to_4h.weight": "ffn_up.weight",  # fused gate|up (swiglu)
    "mlp.dense_4h_to_h.weight": "ffn_down.weight",
}

_GLOBAL_MAP = {
    "model.embed_tokens.weight": "token_embd.weight",
    "model.norm.weight": "output_norm.weight",
    "model.norm.bias": "output_norm.bias",
    "lm_head.weight": "output.weight",
    "lm_head.bias": "output.bias",
    "transformer.wte.weight": "token_embd.weight",
    "transformer.wpe.weight": "position_embd.weight",
    "transformer.ln_f.weight": "output_norm.weight",
    "transformer.ln_f.bias": "output_norm.bias",
    "backbone.embeddings.weight": "token_embd.weight",
    "backbone.norm_f.weight": "output_norm.weight",
    # grok
    "transformer.in_out_embed.weight": "token_embd.weight",
    "transformer.rms_norm.weight": "output_norm.weight",
    # chatglm ("transformer." already stripped)
    "embedding.word_embeddings.weight": "token_embd.weight",
    "output_layer.weight": "output.weight",
    "encoder.final_layernorm.weight": "output_norm.weight",
    # openelm
    "transformer.token_embeddings.weight": "token_embd.weight",
    "transformer.norm.weight": "output_norm.weight",
    # refact/bloom root-level final norm
    "ln_f.weight": "output_norm.weight",
    "ln_f.bias": "output_norm.bias",
    # nomic-bert
    "embeddings.word_embeddings.weight": "token_embd.weight",
    "embeddings.token_type_embeddings.weight": "token_types.weight",
    "emb_ln.weight": "token_embd_norm.weight",
    "emb_ln.bias": "token_embd_norm.bias",
    # dbrx / mpt
    "transformer.norm_f.weight": "output_norm.weight",
    # bloom
    "transformer.word_embeddings.weight": "token_embd.weight",
    "transformer.word_embeddings_layernorm.weight": "token_embd_norm.weight",
    "transformer.word_embeddings_layernorm.bias": "token_embd_norm.bias",
    # phi2
    "model.final_layernorm.weight": "output_norm.weight",
    "model.final_layernorm.bias": "output_norm.bias",
}

# dbrx per-block names (reference convert_hf_to_gguf.py DbrxModel +
# gguf-py tensor_mapping.py dbrx rows); expert tensors are handled
# separately — they arrive pre-stacked [E*ff, d] without .weight suffixes
_DBRX_LAYER_MAP = {
    "norm_attn_norm.norm_1.weight": "attn_norm.weight",
    "norm_attn_norm.attn.Wqkv.weight": "attn_qkv.weight",
    "norm_attn_norm.attn.out_proj.weight": "attn_output.weight",
    "norm_attn_norm.norm_2.weight": "ffn_norm.weight",
    "ffn.router.layer.weight": "ffn_gate_inp.weight",
}

_QUANT_TYPES = {
    "f32": GGMLType.F32,
    "f16": GGMLType.F16,
    "bf16": GGMLType.BF16,
    "q8_0": GGMLType.Q8_0,
    "q4_0": GGMLType.Q4_0,
    "q4_k": GGMLType.Q4_K,
    "q5_k": GGMLType.Q5_K,
    "q6_k": GGMLType.Q6_K,
}


def _permute_qk(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF rotate-half layout → GGUF interleaved-pairs layout for llama-family
    'norm'-mode rope (reference convert_hf_to_gguf.py LlamaModel.permute)."""
    out = w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
    return out.swapaxes(1, 2).reshape(w.shape)


def _iter_hf_tensors(hf_dir: Path):
    st_files = sorted(hf_dir.glob("*.safetensors"))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(str(f), framework="np") as sf:
                for name in sf.keys():
                    yield name, sf.get_tensor(name)
        return
    bins = sorted(hf_dir.glob("pytorch_model*.bin"))
    if not bins:
        raise FileNotFoundError(f"no safetensors or .bin weights in {hf_dir}")
    import torch

    for f in bins:
        sd = torch.load(str(f), map_location="cpu", weights_only=True)
        for name, t in sd.items():
            yield name, t.float().numpy()


def _map_name(name: str, layer_map: dict) -> str | None:
    if name in _GLOBAL_MAP:
        return _GLOBAL_MAP[name]
    for prefix in ("model.layers.layers.",  # plamo (nested list)
                   "model.layers.", "transformer.h.", "backbone.layers.",
                   "transformer.layers.", "transformer.decoder_layer.",
                   "transformer.blocks.", "encoder.layers."):
        if name.startswith(prefix):
            rest = name[len(prefix):]
            idx, _, suffix = rest.partition(".")
            # MoE experts: model.layers.N.block_sparse_moe.experts.E.w1.weight
            for moe_pat, ggml in (
                (".w1.weight", "ffn_gate_exps"), (".w2.weight", "ffn_down_exps"),
                (".w3.weight", "ffn_up_exps"),
                (".gate_proj.weight", "ffn_gate_exps"),
                (".down_proj.weight", "ffn_down_exps"),
                (".up_proj.weight", "ffn_up_exps"),
            ):
                if ".experts." in suffix and suffix.endswith(moe_pat):
                    return f"blk.{idx}.__moe__.{ggml}.{suffix.split('.experts.')[1].split('.')[0]}"
            # grok per-expert: moe.E.linear{,_1,_v}.weight
            for moe_pat, ggml in (
                (".linear.weight", "ffn_gate_exps"),
                (".linear_1.weight", "ffn_down_exps"),
                (".linear_v.weight", "ffn_up_exps"),
            ):
                if suffix.startswith("moe.") and suffix.endswith(moe_pat):
                    return f"blk.{idx}.__moe__.{ggml}.{suffix.split('.')[1]}"
            mapped = layer_map.get(suffix)
            if mapped is not None:
                return f"blk.{idx}.{mapped}"
            # mamba mixer tensors
            for hfn, ggn in (("mixer.in_proj.weight", "ssm_in.weight"),
                             ("mixer.conv1d.weight", "ssm_conv1d.weight"),
                             ("mixer.conv1d.bias", "ssm_conv1d.bias"),
                             ("mixer.x_proj.weight", "ssm_x.weight"),
                             ("mixer.dt_proj.weight", "ssm_dt.weight"),
                             ("mixer.dt_proj.bias", "ssm_dt.bias"),
                             ("mixer.A_log", "ssm_a"),
                             ("mixer.D", "ssm_d"),
                             ("mixer.out_proj.weight", "ssm_out.weight"),
                             ("norm.weight", "attn_norm.weight")):
                if suffix == hfn:
                    return f"blk.{idx}.{ggn}"
            return None
    return None


def _deci_block_configs(cfg: dict):
    """Nemotron-51B block_configs → per-layer (heads, kv_heads, ffn) arrays
    (reference DeciModel.__init__: n_heads_in_group None + replace_with_linear
    → linear-attention layer (kv=0, h=nh); both None/False → attention-free
    (h=kv=0); else kv = nh // n_heads_in_group)."""
    nh = cfg["num_attention_heads"]
    c = cfg["hidden_size"]
    heads, kv_heads, ffs = [], [], []
    for bc in cfg["block_configs"]:
        grp = bc["attention"].get("n_heads_in_group")
        if grp is None:
            kv_heads.append(0)
            heads.append(nh if bc["attention"].get("replace_with_linear")
                         else 0)
        else:
            kv_heads.append(nh // grp)
            heads.append(nh)
        ff = int(2 * bc["ffn"]["ffn_mult"] * c / 3)
        ffs.append(ff if ff % 256 == 0 else ff + 256 - ff % 256)
    return heads, kv_heads, ffs


def _write_hparams(w: GGUFWriter, arch: str, cfg: dict) -> None:
    if arch == "llama4":
        # HF renames the dense-FFN width to intermediate_size_mlp and uses
        # intermediate_size for the experts (reference Llama4Model.__init__)
        cfg = {**cfg,
               "intermediate_size": cfg.get("intermediate_size_mlp",
                                            cfg.get("intermediate_size")),
               "moe_intermediate_size": cfg.get("intermediate_size")}
    g = lambda *keys, default=None: next(
        (cfg[k] for k in keys if k in cfg), default)
    if arch == "t5":
        w.add_uint32("t5.block_count", g("num_layers"))
        w.add_uint32("t5.embedding_length", g("d_model"))
        w.add_uint32("t5.attention.head_count", g("num_heads"))
        w.add_uint32("t5.attention.key_length", g("d_kv"))
        w.add_uint32("t5.feed_forward_length", g("d_ff"))
        w.add_uint32("t5.vocab_size", g("vocab_size"))
        w.add_uint32("t5.attention.relative_buckets_count",
                     g("relative_attention_num_buckets", default=32))
        w.add_uint32("t5.attention.relative_max_distance",
                     g("relative_attention_max_distance", default=128))
        w.add_float32("t5.attention.layer_norm_rms_epsilon",
                      g("layer_norm_epsilon", default=1e-6))
        proj = g("feed_forward_proj", default="relu")
        w.add_string("t5.feed_forward_act",
                     "gelu" if "gelu" in proj else "relu")
        w.add_bool("t5.tie_embeddings",
                   bool(g("tie_word_embeddings", default=True)))
        w.add_uint32("t5.context_length", g("n_positions", default=512))
        w.add_uint32("t5.decoder_start_token_id",
                     g("decoder_start_token_id", default=0))
        return
    if arch == "openelm":
        # per-layer head counts and FFN widths (reference OpenELMModel:
        # ffn dims from ffn_multipliers via _make_divisible)
        def _mdiv(v, divisor):
            new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
            return new_v + divisor if new_v < 0.9 * v else new_v

        n_embd = g("model_dim")
        ffn_dims = [_mdiv(m * n_embd, g("ffn_dim_divisor", default=256))
                    for m in g("ffn_multipliers")]
        w.add_uint32(f"{arch}.block_count", g("num_transformer_layers"))
        w.add_uint32(f"{arch}.context_length",
                     g("max_context_length", default=2048))
        w.add_uint32(f"{arch}.embedding_length", n_embd)
        w.add_kv(f"{arch}.feed_forward_length", ffn_dims, None,
                 GGUFValueType.UINT32)
        w.add_kv(f"{arch}.attention.head_count", g("num_query_heads"), None,
                 GGUFValueType.UINT32)
        w.add_kv(f"{arch}.attention.head_count_kv", g("num_kv_heads"), None,
                 GGUFValueType.UINT32)
        w.add_float32(f"{arch}.rope.freq_base",
                      g("rope_freq_constant", default=10000))
        w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
        w.add_uint32(f"{arch}.rope.dimension_count", g("head_dim"))
        w.add_uint32(f"{arch}.attention.key_length", g("head_dim"))
        w.add_uint32(f"{arch}.attention.value_length", g("head_dim"))
        w.add_uint32(f"{arch}.vocab_size", g("vocab_size", default=0))
        return
    if arch == "dbrx":
        # nested attn_config/ffn_config (reference DbrxModel
        # set_gguf_parameters, convert_hf_to_gguf.py:2121-2142)
        attn = cfg.get("attn_config") or {}
        ffn = cfg.get("ffn_config") or {}
        w.add_uint32(f"{arch}.block_count", g("n_layers"))
        w.add_uint32(f"{arch}.context_length", g("max_seq_len", default=2048))
        w.add_uint32(f"{arch}.embedding_length", g("d_model"))
        w.add_uint32(f"{arch}.feed_forward_length", ffn["ffn_hidden_size"])
        w.add_uint32(f"{arch}.attention.head_count", g("n_heads"))
        w.add_uint32(f"{arch}.attention.head_count_kv", attn["kv_n_heads"])
        w.add_float32(f"{arch}.rope.freq_base",
                      attn.get("rope_theta", 10000.0))
        if attn.get("clip_qkv"):
            w.add_float32(f"{arch}.attention.clamp_kqv", attn["clip_qkv"])
        w.add_uint32(f"{arch}.expert_count", ffn["moe_num_experts"])
        w.add_uint32(f"{arch}.expert_used_count", ffn["moe_top_k"])
        w.add_float32(f"{arch}.attention.layer_norm_epsilon", 1e-5)
        w.add_uint32(f"{arch}.vocab_size", g("vocab_size", default=0))
        return
    if arch == "mpt":
        # reference MPTModel.set_gguf_parameters (convert_hf_to_gguf.py:1156);
        # ff from expansion_ratio (HF MptMLP) rather than the reference's
        # hard-coded 4*d
        attn = cfg.get("attn_config") or {}
        c = g("d_model")
        w.add_uint32(f"{arch}.block_count", g("n_layers"))
        w.add_uint32(f"{arch}.context_length", g("max_seq_len", default=2048))
        w.add_uint32(f"{arch}.embedding_length", c)
        w.add_uint32(f"{arch}.feed_forward_length",
                     int(g("expansion_ratio", default=4) * c))
        w.add_uint32(f"{arch}.attention.head_count", g("n_heads"))
        w.add_uint32(f"{arch}.attention.head_count_kv",
                     attn.get("kv_n_heads") or g("n_heads"))
        w.add_float32(f"{arch}.attention.layer_norm_epsilon", 1e-5)
        if attn.get("clip_qkv"):
            w.add_float32(f"{arch}.attention.clamp_kqv", attn["clip_qkv"])
        w.add_float32(f"{arch}.attention.max_alibi_bias",
                      attn.get("alibi_bias_max", 8.0)
                      if attn.get("alibi", True) else 0.0)
        w.add_uint32(f"{arch}.vocab_size", g("vocab_size", default=0))
        return
    if arch == "chatglm":
        n_embd = g("hidden_size", "n_embed")
        n_head = g("n_head", "num_attention_heads")
        w.add_uint32(f"{arch}.block_count",
                     g("num_layers", "num_hidden_layers"))
        w.add_uint32(f"{arch}.context_length", g("seq_length", default=n_embd))
        w.add_uint32(f"{arch}.embedding_length", n_embd)
        w.add_uint32(f"{arch}.feed_forward_length",
                     g("ffn_hidden_size", "intermediate_size",
                       default=4 * n_embd))
        w.add_uint32(f"{arch}.attention.head_count", n_head)
        w.add_uint32(f"{arch}.attention.head_count_kv",
                     g("multi_query_group_num", "num_key_value_heads",
                       default=n_head))
        w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon",
                      g("layernorm_epsilon", default=1e-5))
        rope_dim = g("attention_dim", default=n_embd // n_head)
        w.add_uint32(f"{arch}.rope.dimension_count",
                     int(rope_dim * g("partial_rotary_factor", default=0.5)))
        w.add_float32(f"{arch}.rope.freq_base",
                      10000.0 * g("rope_ratio", default=1.0))
        w.add_uint32(f"{arch}.vocab_size",
                     g("padded_vocab_size", "vocab_size", default=0))
        return
    if arch == "refact":
        # reference RefactModel.set_gguf_parameters: ff dim recomputed from
        # n_embd (2/3·4·C rounded up to 256), MQA (kv=1), ALiBi positions
        c = g("n_embd")
        ff = 256 * ((int(2 * (4 * c) / 3) + 255) // 256)
        w.add_uint32(f"{arch}.block_count", g("n_layer"))
        w.add_uint32(f"{arch}.context_length", g("n_positions", default=4096))
        w.add_uint32(f"{arch}.embedding_length", c)
        w.add_uint32(f"{arch}.feed_forward_length", ff)
        w.add_uint32(f"{arch}.attention.head_count", g("n_head"))
        w.add_uint32(f"{arch}.attention.head_count_kv", 1)
        w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon",
                      g("layer_norm_epsilon", default=1e-6))
        w.add_uint32(f"{arch}.vocab_size", g("vocab_size", default=0))
        return
    if arch == "nomic-bert":
        # GPT2-style config keys; RoPE (rotary_emb_base) instead of learned
        # positions; HF claims n_ctx=8192 via scaling — reference pins 2048
        c = g("n_embd", "hidden_size")
        h = g("n_head", "num_attention_heads")
        w.add_uint32(f"{arch}.block_count", g("n_layer", "num_hidden_layers"))
        w.add_uint32(f"{arch}.context_length", 2048)
        w.add_uint32(f"{arch}.embedding_length", c)
        w.add_uint32(f"{arch}.feed_forward_length",
                     g("n_inner", "intermediate_size", default=4 * c))
        w.add_uint32(f"{arch}.attention.head_count", h)
        w.add_uint32(f"{arch}.attention.head_count_kv", h)
        w.add_float32(f"{arch}.attention.layer_norm_epsilon",
                      g("layer_norm_epsilon", default=1e-12))
        w.add_float32(f"{arch}.rope.freq_base",
                      g("rotary_emb_base", default=1000.0))
        w.add_uint32(f"{arch}.vocab_size", g("vocab_size", default=0))
        return
    if arch in ("rwkv6", "rwkv6qwen2"):
        c = g("hidden_size")
        n_head = g("num_attention_heads", default=0)
        head_size = g("head_size", default=c // n_head if n_head else 64)
        ff = g("intermediate_size") or int((c * 3.5) // 32 * 32)
        w.add_uint32(f"{arch}.block_count", g("num_hidden_layers"))
        w.add_uint32(f"{arch}.context_length", 1048576)  # not ctx limited
        w.add_uint32(f"{arch}.embedding_length", c)
        w.add_uint32(f"{arch}.feed_forward_length", ff)
        w.add_uint32(f"{arch}.wkv.head_size", head_size)
        w.add_uint32(f"{arch}.time_mix_extra_dim",
                     g("lora_rank_tokenshift",
                       default=64 if c >= 4096 else 32))
        w.add_uint32(f"{arch}.time_decay_extra_dim",
                     g("lora_rank_decay", default=128 if c >= 4096 else 64))
        w.add_uint32(f"{arch}.attention.head_count", 0)
        if arch == "rwkv6":
            w.add_float32(f"{arch}.attention.layer_norm_epsilon",
                          g("layer_norm_epsilon", default=1e-5))
            w.add_uint32(f"{arch}.rescale_every_n_layers",
                         g("rescale_every", default=0))
        else:  # rwkv6qwen2: GQA-style kv grouping + RMS norms
            w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon",
                          g("rms_norm_eps", default=1e-6))
            w.add_uint32(f"{arch}.token_shift_count", 1)
            w.add_uint32(f"{arch}.attention.head_count_kv",
                         g("num_key_value_heads", default=0))
        w.add_uint32(f"{arch}.vocab_size", g("vocab_size", default=0))
        return
    if arch in ("rwkv7", "arwkv7"):
        c = g("hidden_size")
        head_size = g("head_size", "head_dim", default=64)

        def _lora(exp, mult):
            return max(1, round(c ** exp * mult / 32)) * 32

        w.add_uint32(f"{arch}.block_count", g("num_hidden_layers"))
        w.add_uint32(f"{arch}.context_length", 1048576)
        w.add_uint32(f"{arch}.embedding_length", c)
        w.add_uint32(f"{arch}.feed_forward_length",
                     g("intermediate_size") or 4 * c)
        w.add_uint32(f"{arch}.wkv.head_size", head_size)
        if arch == "rwkv7":
            w.add_float32(f"{arch}.attention.layer_norm_epsilon",
                          g("layer_norm_epsilon", "norm_eps", default=1e-5))
            w.add_uint32(f"{arch}.attention.decay_lora_rank",
                         g("lora_rank_decay", "decay_low_rank_dim")
                         or _lora(0.5, 1.8))
            w.add_uint32(f"{arch}.attention.iclr_lora_rank",
                         g("lora_rank_iclr", "a_low_rank_dim")
                         or _lora(0.5, 1.8))
            w.add_uint32(f"{arch}.attention.value_residual_mix_lora_rank",
                         g("lora_rank_value_residual_mix", "v_low_rank_dim")
                         or _lora(0.5, 1.3))
            w.add_uint32(f"{arch}.attention.gate_lora_rank",
                         g("lora_rank_gate", "gate_low_rank_dim")
                         or _lora(0.8, 0.6))
        else:  # arwkv7: qwen-like wrapper (reference ARwkv7Model)
            gate = bool(g("wkv_has_gate", default=True))
            w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon",
                          g("rms_norm_eps", default=1e-6))
            w.add_uint32(f"{arch}.attention.decay_lora_rank", 64)
            w.add_uint32(f"{arch}.attention.iclr_lora_rank", 64)
            w.add_uint32(f"{arch}.attention.value_residual_mix_lora_rank", 32)
            w.add_uint32(f"{arch}.attention.gate_lora_rank",
                         128 if gate else 0)
            w.add_uint32(f"{arch}.token_shift_count", 1)
        w.add_uint32(f"{arch}.attention.head_count", 0)
        w.add_uint32(f"{arch}.vocab_size", g("vocab_size", default=0))
        return
    if arch == "deci" and (g("block_configs") is not None
                           or g("num_key_value_heads_per_layer") is not None):
        # Nemotron-51B block_configs / DeciLM-7B per-layer kv heads
        # (reference DeciModel.__init__/set_gguf_parameters)
        c = g("hidden_size")
        nh = g("num_attention_heads")
        w.add_uint32(f"{arch}.block_count", g("num_hidden_layers"))
        w.add_uint32(f"{arch}.context_length",
                     g("max_position_embeddings", default=2048))
        w.add_uint32(f"{arch}.embedding_length", c)
        if g("block_configs") is not None:
            heads, kv_heads, ffs = _deci_block_configs(cfg)
            w.add_kv(f"{arch}.attention.head_count", heads, None,
                     GGUFValueType.UINT32)
            w.add_kv(f"{arch}.attention.head_count_kv", kv_heads, None,
                     GGUFValueType.UINT32)
            w.add_kv(f"{arch}.feed_forward_length", ffs, None,
                     GGUFValueType.UINT32)
        else:
            w.add_uint32(f"{arch}.attention.head_count", nh)
            w.add_kv(f"{arch}.attention.head_count_kv",
                     [int(x) for x in g("num_key_value_heads_per_layer")],
                     None, GGUFValueType.UINT32)
            w.add_uint32(f"{arch}.feed_forward_length", g("intermediate_size"))
        w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon",
                      g("rms_norm_eps", default=1e-5))
        w.add_uint32(f"{arch}.attention.key_length", c // nh)
        w.add_uint32(f"{arch}.attention.value_length", c // nh)
        w.add_uint32(f"{arch}.rope.dimension_count",
                     g("head_dim", default=c // nh))
        if g("rope_theta") is not None:
            w.add_float32(f"{arch}.rope.freq_base", g("rope_theta"))
        w.add_uint32(f"{arch}.vocab_size", g("vocab_size", default=0))
        return
    if arch == "plamo":
        # config's num_key_value_heads is wrong for plamo-13b — the
        # reference pins kv=5 (PlamoModel.set_gguf_parameters)
        cfg = {**cfg, "num_key_value_heads": 5 if g("hidden_size") == 5120
               else g("num_key_value_heads", default=g("num_attention_heads")),
               "max_position_embeddings": g("max_position_embeddings",
                                            default=4096)}
        g = lambda *keys, default=None: next(  # noqa: E731
            (cfg[k] for k in keys if k in cfg), default)
    w.add_uint32(f"{arch}.block_count", g("num_hidden_layers", "n_layer"))
    w.add_uint32(f"{arch}.context_length",
                 g("max_position_embeddings", "n_positions", default=2048))
    w.add_uint32(f"{arch}.embedding_length", g("hidden_size", "n_embd"))
    n_ff = g("intermediate_size", "n_inner")
    if n_ff is None:
        n_ff = 4 * g("hidden_size", "n_embd")
    w.add_uint32(f"{arch}.feed_forward_length", n_ff)
    n_head = g("num_attention_heads", "n_head", default=0)  # 0: mamba/ssm
    w.add_uint32(f"{arch}.attention.head_count", n_head)
    w.add_uint32(f"{arch}.attention.head_count_kv",
                 g("num_key_value_heads", default=n_head))
    if g("head_dim") is not None and arch != "deepseek2":
        w.add_uint32(f"{arch}.attention.key_length", g("head_dim"))
    if g("rms_norm_eps") is not None:
        w.add_float32(f"{arch}.attention.layer_norm_rms_epsilon", g("rms_norm_eps"))
    if g("layer_norm_epsilon", "layer_norm_eps") is not None:
        w.add_float32(f"{arch}.attention.layer_norm_epsilon",
                      g("layer_norm_epsilon", "layer_norm_eps"))
    if g("rope_theta") is not None:
        w.add_float32(f"{arch}.rope.freq_base", g("rope_theta"))
    if g("partial_rotary_factor") is not None:
        hd = g("head_dim") or g("hidden_size") // n_head
        w.add_uint32(f"{arch}.rope.dimension_count",
                     int(hd * g("partial_rotary_factor")))
    elif g("rotary_dim") is not None:  # gptj: absolute rotary dim count
        w.add_uint32(f"{arch}.rope.dimension_count", g("rotary_dim"))
    if g("clip_qkv") is not None:  # olmo (top-level) / mpt (attn_config)
        w.add_float32(f"{arch}.attention.clamp_kqv", g("clip_qkv"))
    elif isinstance(g("attn_config"), dict) and \
            g("attn_config").get("clip_qkv") is not None:
        w.add_float32(f"{arch}.attention.clamp_kqv",
                      g("attn_config")["clip_qkv"])
    w.add_uint32(f"{arch}.vocab_size", g("vocab_size", default=0))
    if g("num_local_experts", "num_experts", "n_routed_experts") is not None:
        w.add_uint32(f"{arch}.expert_count",
                     g("num_local_experts", "num_experts", "n_routed_experts"))
        w.add_uint32(f"{arch}.expert_used_count",
                     g("num_experts_per_tok", default=2))
    if g("sliding_window") is not None:
        w.add_uint32(f"{arch}.attention.sliding_window", g("sliding_window"))
    if g("norm_topk_prob") is not None:
        w.add_bool(f"{arch}.expert_weights_norm", bool(g("norm_topk_prob")))
    if g("attn_logit_softcapping") is not None:
        w.add_float32(f"{arch}.attn_logit_softcapping", g("attn_logit_softcapping"))
    if g("final_logit_softcapping") is not None:
        w.add_float32(f"{arch}.final_logit_softcapping", g("final_logit_softcapping"))
    if arch == "qwen2vl":
        sect = (cfg.get("rope_scaling") or {}).get("mrope_section") or [16, 24, 24]
        sect = (list(sect) + [0, 0, 0, 0])[:4]
        w.add_kv(f"{arch}.rope.dimension_sections", [int(s) for s in sect])
    if arch == "chameleon":
        w.add_bool(f"{arch}.swin_norm", bool(cfg.get("swin_norm", False)))
    if arch in ("granite", "granitemoe"):
        # llm_build_granite's 4 scalar scales (HF *_multiplier names)
        if g("embedding_multiplier") is not None:
            w.add_float32(f"{arch}.embedding_scale", g("embedding_multiplier"))
        if g("residual_multiplier") is not None:
            w.add_float32(f"{arch}.residual_scale", g("residual_multiplier"))
        if g("logits_scaling") is not None:
            w.add_float32(f"{arch}.logit_scale", g("logits_scaling"))
        if g("attention_multiplier") is not None:
            w.add_float32(f"{arch}.attention.scale", g("attention_multiplier"))
    if arch == "minicpm":
        # scale_emb / scale_depth/√L residual / hidden/dim_model_base logits
        n_layer = g("num_hidden_layers", "n_layer")
        w.add_float32(f"{arch}.embedding_scale", g("scale_emb", default=12.0))
        w.add_float32(f"{arch}.residual_scale",
                      g("scale_depth", default=1.4) / (n_layer ** 0.5))
        w.add_float32(f"{arch}.logit_scale",
                      g("hidden_size") / g("dim_model_base",
                                           default=g("hidden_size")))
    if arch in ("cohere2", "command-r") and g("logit_scale") is not None:
        w.add_float32(f"{arch}.logit_scale", g("logit_scale"))
    if arch == "mamba":
        w.add_uint32(f"{arch}.ssm.conv_kernel", g("conv_kernel", default=4))
        w.add_uint32(f"{arch}.ssm.inner_size",
                     g("intermediate_size", default=2 * g("hidden_size")))
        w.add_uint32(f"{arch}.ssm.state_size", g("state_size", default=16))
        w.add_uint32(f"{arch}.ssm.time_step_rank", g("time_step_rank", default=0))
        # (attention.head_count 0 already written by the generic section)
        # falcon-mamba rms-norms the dt/B/C splits (reference MambaModel
        # add_ssm_dt_b_c_rms on model_type falcon_mamba)
        if cfg.get("model_type") == "falcon_mamba":
            w.add_bool(f"{arch}.ssm.dt_b_c_rms", True)
    if arch in ("deepseek2", "minicpm3", "plm"):
        # MLA + grouped-MoE hparams (reference DeepseekV2Model /
        # MiniCPM3Model / PLMModel set_gguf_parameters)
        if arch == "deepseek2":
            w.add_uint32(f"{arch}.leading_dense_block_count",
                         g("first_k_dense_replace", default=0))
        if g("q_lora_rank") is not None:
            w.add_uint32(f"{arch}.attention.q_lora_rank", g("q_lora_rank"))
        w.add_uint32(f"{arch}.attention.kv_lora_rank",
                     g("kv_lora_rank", default=512))
        w.add_uint32(f"{arch}.attention.key_length",
                     g("qk_nope_head_dim", default=128)
                     + g("qk_rope_head_dim", default=64))
        w.add_uint32(f"{arch}.attention.value_length",
                     g("v_head_dim", default=128))
        w.add_uint32(f"{arch}.rope.dimension_count",
                     g("qk_rope_head_dim", default=64))
        if g("moe_intermediate_size") is not None:
            w.add_uint32(f"{arch}.expert_feed_forward_length",
                         g("moe_intermediate_size"))
        if g("n_shared_experts") is not None:
            w.add_uint32(f"{arch}.expert_shared_count", g("n_shared_experts"))
        if g("routed_scaling_factor") is not None:
            w.add_float32(f"{arch}.expert_weights_scale",
                          g("routed_scaling_factor"))
        if arch == "deepseek2":
            w.add_uint32(f"{arch}.expert_gating_func",
                         2 if g("scoring_func", default="softmax") == "sigmoid"
                         else 1)
    if arch == "llama4":
        if g("moe_intermediate_size") is not None:
            w.add_uint32(f"{arch}.expert_feed_forward_length",
                         g("moe_intermediate_size"))
        w.add_uint32(f"{arch}.interleave_moe_layer_step",
                     g("interleave_moe_layer_step", default=1))


def _rwkv6_tensors(name: str, arr: np.ndarray, cfg: dict):
    """HF rwkv6 (rwkv.blocks.N.*) / rwkv6qwen2 (model.layers.N.self_attn.*)
    → GGUF tensors with the reference's transforms (Rwkv6Model
    modify_tensors): LoRA mats transposed to mul_mat orientation, lerps and
    decay squeezed, output/value rescaled by 2^(bid//rescale_every)."""
    glob = {"rwkv.embeddings.weight": "token_embd.weight",
            "model.embed_tokens.weight": "token_embd.weight",
            "rwkv.blocks.0.pre_ln.weight": "token_embd_norm.weight",
            "rwkv.blocks.0.pre_ln.bias": "token_embd_norm.bias",
            "rwkv.ln_out.weight": "output_norm.weight",
            "rwkv.ln_out.bias": "output_norm.bias",
            "model.norm.weight": "output_norm.weight",
            "head.weight": "output.weight",
            "lm_head.weight": "output.weight"}
    if name in glob:
        return [(glob[name], arr)]
    m = re.match(r"(?:rwkv\.blocks|model\.layers)\.(\d+)\.(.*)", name)
    if not m:
        return []
    bid, rest = int(m.group(1)), m.group(2)
    out = None
    for hf, gg in (("ln1", "attn_norm"), ("ln2", "attn_norm_2"),
                   ("input_layernorm", "attn_norm"),
                   ("post_attention_layernorm", "ffn_norm")):
        for p in (".weight", ".bias"):
            if rest == hf + p:
                out = gg + p
    if out is None and rest.startswith(("attention.", "self_attn.")):
        sub, _, suffix = rest.partition(".")[2].rpartition(".")
        if not sub:  # bare param (e.g. attention.time_maa_w1)
            sub, suffix = suffix, "weight"
        mapped = _RWKV6_ATT.get(sub)
        if mapped is None:
            return []
        if cfg.get("model_type") == "rwkv6qwen2" and mapped in (
                "time_mix_w1", "time_mix_w2"):
            # rwkv6qwen2 checkpoints order the 5 lerp groups r,k,v,w,g;
            # GGUF expects w,k,v,r,g (reference RWKV6Qwen2Model permute)
            order = [3, 1, 2, 0, 4]
            if mapped == "time_mix_w1":  # [C, 5r]
                arr = arr.reshape(arr.shape[0], 5, -1)[:, order, :].reshape(
                    arr.shape[0], -1)
            else:  # [5, r, C]
                arr = arr[order]
        if mapped in ("time_mix_w1", "time_mix_decay_w1",
                      "time_mix_decay_w2") and arr.ndim == 2:
            arr = arr.T
        elif mapped == "time_mix_w2" and arr.ndim == 3:
            arr = arr.transpose(0, 2, 1)
        elif mapped.startswith("time_mix_lerp_") or mapped == "time_mix_decay":
            arr = arr.squeeze()
        rescale = cfg.get("rescale_every", 0)
        if rescale and mapped == "time_mix_output":
            arr = arr / (2 ** (bid // rescale))
        out = mapped + ("." + suffix if suffix == "bias" else ".weight")
    elif out is None and rest.startswith("feed_forward."):
        sub, _, suffix = rest.partition(".")[2].rpartition(".")
        if not sub:  # bare param (e.g. feed_forward.time_maa_k)
            sub, suffix = suffix, "weight"
        mapped = _RWKV6_FFN.get(sub)
        if mapped is None:
            # rwkv6qwen2 qwen-style mlp.* rides the shared decoder map
            mapped = {"gate_proj": "ffn_gate", "up_proj": "ffn_up",
                      "down_proj": "ffn_down"}.get(sub)
            if mapped is None:
                return []
        if mapped.startswith("channel_mix_lerp_"):
            arr = arr.squeeze()
        rescale = cfg.get("rescale_every", 0)
        if rescale and mapped == "channel_mix_value":
            arr = arr / (2 ** (bid // rescale))
        out = mapped + ".weight"
    elif out is None and rest.startswith("mlp."):
        sub = rest.partition(".")[2].rpartition(".")[0]
        mapped = {"gate_proj": "ffn_gate", "up_proj": "ffn_up",
                  "down_proj": "ffn_down"}.get(sub)
        if mapped is None:
            return []
        out = mapped + ".weight"
    if out is None:
        return []
    return [(f"blk.{bid}.{out}", arr)]


def _rwkv7_tensors(name: str, arr: np.ndarray, cfg: dict, lerp_stash: dict):
    """HF rwkv7 / arwkv7 → GGUF (reference Rwkv7Model modify_tensors): name
    unification (blocks→layers, attn/self_attn→attention, time_mixer
    stripped, fla-hub lora renames), LoRA transposes, x_* lerps fused into
    time_mix_lerp_fused [n,1,1,C], layer-0 dummy v0/v1/v2 from a0/a1/a2."""
    name = (name.replace("blocks", "layers").replace("ffn", "feed_forward")
            .replace("self_attn", "attention").replace("attn", "attention")
            .replace("time_mixer.", ""))
    lora_pre_t = "_lora.lora" in name  # fla-hub stores pre-transposed
    name = (name.replace("_lora.lora.0.weight", "1.weight")
            .replace("_lora.lora.2.weight", "2.weight")
            .replace("_lora.lora.2.bias", "0.weight")
            .replace("feed_forward_norm", "ln2").replace("g_norm", "ln_x"))
    glob = {"model.embeddings.weight": "token_embd.weight",
            "model.embed_tokens.weight": "token_embd.weight",
            "model.pre_ln.weight": "token_embd_norm.weight",
            "model.pre_ln.bias": "token_embd_norm.bias",
            "model.ln_out.weight": "output_norm.weight",
            "model.ln_out.bias": "output_norm.bias",
            "model.norm.weight": "output_norm.weight",
            "head.weight": "output.weight",
            "lm_head.weight": "output.weight"}
    if name in glob:
        return [(glob[name], arr)]
    if name in ("model.layers.0.pre_norm.weight",
                "model.layers.0.pre_norm.bias"):
        return [("token_embd_norm." + name.rsplit(".", 1)[1], arr)]
    m = re.match(r"model\.layers\.(\d+)\.(.*)", name)
    if not m:
        return []
    bid, rest = int(m.group(1)), m.group(2)
    gate = bool(cfg.get("wkv_has_gate", True))
    lerp_list = ["r", "w", "k", "v", "a", "g"] if gate else ["r", "w", "k", "v", "a"]
    if rest.startswith("attention.x_"):
        sub = rest[len("attention.x_"):].removesuffix(".weight")
        if sub == "x":  # already fused
            return [(f"blk.{bid}.time_mix_lerp_fused.weight",
                     arr.reshape(len(lerp_list), 1, 1, -1))]
        lerp_stash.setdefault(bid, {})[sub] = arr
        if all(i in lerp_stash[bid] for i in lerp_list):
            fused = np.stack([lerp_stash[bid][i].reshape(1, 1, -1)
                              for i in lerp_list])
            return [(f"blk.{bid}.time_mix_lerp_fused.weight", fused)]
        return []
    out = None
    for hf, gg in (("ln1", "attn_norm"), ("ln2", "attn_norm_2"),
                   ("input_layernorm", "attn_norm"),
                   ("post_attention_layernorm", "ffn_norm")):
        for p in (".weight", ".bias"):
            if rest == hf + p:
                out = gg + p
    results = []
    if out is None and rest.startswith("attention."):
        sub, _, suffix = rest.partition(".")[2].rpartition(".")
        if not sub:  # bare param like attention.r_k
            sub, suffix = suffix, "weight"
        mapped = _RWKV7_ATT.get(sub)
        if mapped is None:
            return []
        arr = arr.squeeze()
        if (not lora_pre_t and arr.ndim == 2 and mapped in (
                "time_mix_w1", "time_mix_w2", "time_mix_a1", "time_mix_a2",
                "time_mix_v1", "time_mix_v2", "time_mix_g1", "time_mix_g2")):
            arr = arr.T
        if mapped == "time_mix_r_k":
            arr = arr.reshape(-1)
        if bid == 0 and mapped in ("time_mix_a0", "time_mix_a1",
                                   "time_mix_a2"):
            # dummy v0/v1/v2 on the first layer (reference Rwkv7Model)
            results.append((f"blk.{bid}.{mapped.replace('_a', '_v')}.weight",
                            arr))
        if bid == 0 and mapped in ("time_mix_v0", "time_mix_v1",
                                   "time_mix_v2"):
            return []  # drop real (unused) first-layer v-residual tensors
        out = mapped + ("." + suffix if suffix == "bias" else ".weight")
    elif out is None and rest.startswith(("feed_forward.", "mlp.")):
        sub, _, suffix = rest.partition(".")[2].rpartition(".")
        if not sub:  # bare param (feed_forward.x_k)
            sub, suffix = suffix, "weight"
        mapped = _RWKV7_FFN.get(sub) or {
            "gate_proj": "ffn_gate", "up_proj": "ffn_up",
            "down_proj": "ffn_down"}.get(sub)
        if mapped is None:
            return []
        if mapped == "channel_mix_lerp_k":
            arr = arr.squeeze()
        out = mapped + ".weight"
    if out is None:
        return []
    results.append((f"blk.{bid}.{out}", arr))
    return results


def _write_wordpiece(w: GGUFWriter, tj: dict, model: dict) -> None:
    """BERT WordPiece → tokenizer.ggml.model 'bert' (WPM — reference
    llama_vocab WPM path)."""
    vocab = model["vocab"]
    id_to_tok = [None] * len(vocab)
    for t, i in vocab.items():
        id_to_tok[i] = t
    types = []
    special = {"[CLS]", "[SEP]", "[PAD]", "[UNK]", "[MASK]"}
    for i, t in enumerate(id_to_tok):
        if t is None:
            id_to_tok[i] = f"[PAD{i}]"
            types.append(5)
        else:
            types.append(3 if t in special else 1)
    w.add_string(Keys.Tokenizer.MODEL, "bert")
    w.add_kv(Keys.Tokenizer.LIST, id_to_tok)
    w.add_kv(Keys.Tokenizer.TOKEN_TYPE, types)
    w.add_kv(Keys.Tokenizer.SCORES, [0.0] * len(id_to_tok))
    t2i = {t: i for i, t in enumerate(id_to_tok)}
    for name, key in (("[CLS]", Keys.Tokenizer.BOS_ID),
                      ("[SEP]", Keys.Tokenizer.EOS_ID),
                      ("[SEP]", Keys.Tokenizer.SEP_ID),
                      ("[UNK]", Keys.Tokenizer.UNK_ID),
                      ("[PAD]", Keys.Tokenizer.PAD_ID)):
        if name in t2i:
            w.add_uint32(key, t2i[name])


def _write_unigram(w: GGUFWriter, tj: dict, model: dict) -> None:
    """SentencePiece Unigram → tokenizer.ggml.model 't5' (UGM path)."""
    pieces = model["vocab"]  # [[piece, logprob], ...]
    toks = [p[0] for p in pieces]
    scores = [float(p[1]) for p in pieces]
    types = []
    for i, t in enumerate(toks):
        if t in ("<pad>", "</s>", "<s>"):
            types.append(3)
        elif t == "<unk>":
            types.append(2)
        else:
            types.append(1)
    w.add_string(Keys.Tokenizer.MODEL, "t5")
    w.add_kv(Keys.Tokenizer.LIST, toks)
    w.add_kv(Keys.Tokenizer.SCORES, scores)
    w.add_kv(Keys.Tokenizer.TOKEN_TYPE, types)
    t2i = {t: i for i, t in enumerate(toks)}
    for name, key in (("</s>", Keys.Tokenizer.EOS_ID),
                      ("<unk>", Keys.Tokenizer.UNK_ID),
                      ("<pad>", Keys.Tokenizer.PAD_ID)):
        if name in t2i:
            w.add_uint32(key, t2i[name])


def _write_rwkv_world(w: GGUFWriter, path: Path, vocab_size: int) -> None:
    """rwkv_vocab_v20230424.txt → tokenizer.ggml.model 'rwkv' (reference
    _set_vocab_rwkv_world): line format `<id> <repr> <len>`; token 0 is
    <s>, tail padded to vocab_size."""
    import ast

    tokens = ["<s>"]
    types = [3]  # CONTROL
    for line in path.read_text(encoding="utf-8").splitlines():
        parts = line.split(" ")
        tok = ast.literal_eval(" ".join(parts[1:-1]))
        tok = tok.encode("utf-8") if isinstance(tok, str) else bytes(tok)
        tokens.append(repr(tok)[2:-1])  # b'\xff' → \xff (byte-escape text)
        types.append(1)
    for i in range(len(tokens), vocab_size):
        tokens.append(f"[PAD{i}]")
        types.append(5)
    w.add_string(Keys.Tokenizer.MODEL, "rwkv")
    w.add_kv(Keys.Tokenizer.LIST, tokens)
    w.add_kv(Keys.Tokenizer.TOKEN_TYPE, types)
    w.add_uint32(Keys.Tokenizer.BOS_ID, 0)
    w.add_uint32(Keys.Tokenizer.EOS_ID, 0)


def _write_tokenizer(w: GGUFWriter, hf_dir: Path) -> None:
    tok_json = hf_dir / "tokenizer.json"
    world = hf_dir / "rwkv_vocab_v20230424.txt"
    if world.exists():
        cfg_p = hf_dir / "config.json"
        vs = json.loads(cfg_p.read_text()).get("vocab_size", 65536)
        _write_rwkv_world(w, world, vs)
        return
    if not tok_json.exists():
        log.warning("no tokenizer.json — writing GGUF without tokenizer")
        return
    tj = json.loads(tok_json.read_text())
    model = tj.get("model", {})
    if model.get("type") == "WordPiece":
        _write_wordpiece(w, tj, model)
        return
    if model.get("type") == "Unigram":
        _write_unigram(w, tj, model)
        return
    if model.get("type") != "BPE":
        log.warning("tokenizer type %s unsupported; skipping", model.get("type"))
        return
    vocab = model["vocab"]  # token → id
    merges = model.get("merges", [])
    id_to_tok = [None] * len(vocab)
    for t, i in vocab.items():
        id_to_tok[i] = t
    added = {a["id"]: a for a in tj.get("added_tokens", [])}
    for i, a in added.items():
        if i >= len(id_to_tok):
            id_to_tok.extend([None] * (i + 1 - len(id_to_tok)))
        id_to_tok[i] = a["content"]
    types = []
    for i, t in enumerate(id_to_tok):
        if t is None:
            id_to_tok[i] = f"[PAD{i}]"
            types.append(5)  # UNUSED
        elif i in added and added[i].get("special"):
            types.append(3)  # CONTROL
        elif i in added:
            types.append(4)  # USER_DEFINED
        else:
            types.append(1)  # NORMAL
    w.add_string(Keys.Tokenizer.MODEL, "gpt2")
    w.add_string(Keys.Tokenizer.PRE, "default")
    w.add_kv(Keys.Tokenizer.LIST, id_to_tok)
    w.add_kv(Keys.Tokenizer.TOKEN_TYPE, types)
    w.add_kv(Keys.Tokenizer.MERGES,
             [m if isinstance(m, str) else " ".join(m) for m in merges])

    # special ids from config files
    cfg_path = hf_dir / "tokenizer_config.json"
    tok_cfg = json.loads(cfg_path.read_text()) if cfg_path.exists() else {}
    gen_path = hf_dir / "generation_config.json"
    gen_cfg = json.loads(gen_path.read_text()) if gen_path.exists() else {}
    t2i = {t: i for i, t in enumerate(id_to_tok)}

    def tid(value):
        if value is None:
            return None
        if isinstance(value, dict):
            value = value.get("content")
        if isinstance(value, str):
            return t2i.get(value)
        return int(value)

    bos = tid(tok_cfg.get("bos_token"))
    eos = tid(tok_cfg.get("eos_token"))
    if eos is None:
        e = gen_cfg.get("eos_token_id")
        eos = e[0] if isinstance(e, list) else e
    if bos is not None:
        w.add_uint32(Keys.Tokenizer.BOS_ID, bos)
    if eos is not None:
        w.add_uint32(Keys.Tokenizer.EOS_ID, eos)
    if tok_cfg.get("chat_template"):
        w.add_string(Keys.Tokenizer.CHAT_TEMPLATE, tok_cfg["chat_template"])
    w.add_bool(Keys.Tokenizer.ADD_BOS, bool(tok_cfg.get("add_bos_token", False)))


def convert(hf_dir: str, out_path: str, outtype: str = "f16") -> None:
    hf_dir = Path(hf_dir)
    cfg = json.loads((hf_dir / "config.json").read_text())
    model_type = cfg.get("model_type", "llama")
    arch_cls = (cfg.get("architectures") or [""])[0]
    if arch_cls in _ARCH_CLS_TO_MODEL_TYPE:
        # some repos publish a specialized class under a generic model_type
        model_type = _ARCH_CLS_TO_MODEL_TYPE[arch_cls]
    if "text_config" in cfg:
        # multimodal wrappers (llama4, mistral3, qwen2.5-vl): the language
        # model's hparams live in text_config (reference Llama4Model.__init__)
        cfg = {**cfg, **cfg["text_config"], "model_type": model_type}
    arch = _MODEL_TYPE_TO_ARCH.get(model_type)
    if arch is None:
        raise ValueError(f"unsupported HF model_type {model_type!r}")
    # roberta-family position embeddings start at pad_token_id + 1
    pos_offset = 0
    if model_type in _ROBERTA_LIKE and cfg.get("pad_token_id") is not None:
        pos_offset = 1 + cfg["pad_token_id"]
        if "max_position_embeddings" in cfg:
            cfg = {**cfg, "max_position_embeddings":
                   cfg["max_position_embeddings"] - pos_offset}
    qtype = _QUANT_TYPES[outtype]

    w = GGUFWriter(out_path, arch)
    w.add_string("general.name", cfg.get("_name_or_path", hf_dir.name))
    _write_hparams(w, arch, cfg)
    _write_tokenizer(w, hf_dir)

    n_head = cfg.get("num_attention_heads", cfg.get("n_head", 1))
    n_kv = cfg.get("num_key_value_heads", n_head)
    # archs whose GGUF q/k layout is the llama interleaved-pairs permutation
    # (reference classes calling LlamaModel.permute; exaone is NEOX → no
    # permute, olmo/arctic/deci DO permute: OlmoModel/ArcticModel/DeciModel)
    permute = arch in ("llama", "internlm2", "granite", "chameleon",
                       "baichuan", "xverse", "minicpm", "granitemoe",
                       "olmo", "arctic", "deci")
    # gemma/nemotron store (1 + w) norm weights (HF keeps the zero-centered
    # form; reference GemmaModel/NemotronModel modify_tensors add 1)
    gemma_norm = arch.startswith("gemma") or arch == "nemotron"
    layer_map = {"gemma2": _GEMMA2_LAYER_MAP, "gemma3": _GEMMA2_LAYER_MAP,
                 "grok": _GROK_LAYER_MAP, "openelm": _OPENELM_LAYER_MAP,
                 "chatglm": _CHATGLM_LAYER_MAP, "arctic": _ARCTIC_LAYER_MAP,
                 "nomic-bert": _NOMIC_LAYER_MAP,
                 "dbrx": _DBRX_LAYER_MAP}.get(arch, _LAYER_MAP)
    # deci per-layer kv-head counts drive the per-layer k permutation
    kv_per_layer = None
    if arch == "deci":
        if cfg.get("block_configs") is not None:
            _h, _kv, _ = _deci_block_configs(cfg)
            kv_per_layer = _kv
        elif cfg.get("num_key_value_heads_per_layer") is not None:
            kv_per_layer = [int(x) for x in cfg["num_key_value_heads_per_layer"]]
    if arch == "plamo" and cfg.get("hidden_size") == 5120:
        n_kv = 5  # reference PlamoModel: config's kv count is wrong
    rwkv_lerp_stash: dict[int, dict[str, np.ndarray]] = {}

    n_layers = cfg.get("num_hidden_layers",
                       cfg.get("n_layer",
                               cfg.get("num_layers",
                                       cfg.get("num_transformer_layers",
                                               1 << 30))))
    moe_stash: dict[str, dict[int, np.ndarray]] = {}
    n_written = 0
    if arch == "minicpm3" and isinstance(cfg.get("rope_scaling"), dict):
        # long-rope factor tables become tensors (reference MiniCPM3Model
        # generate_extra_tensors)
        rs = cfg["rope_scaling"]
        for key, tname in (("long_factor", "rope_factors_long.weight"),
                           ("short_factor", "rope_factors_short.weight")):
            if rs.get(key):
                _emit(w, tname, np.asarray(rs[key], np.float32), qtype)
                n_written += 1
    for hf_name, arr in _iter_hf_tensors(hf_dir):
        if hf_name.startswith(("model.vqmodel", "visual.", "model.visual",
                               "vision_model.", "model.vision_model.",
                               "multi_modal_projector.")):
            continue  # chameleon/qwen-vl/llama4 vision towers + projectors
        hf_name = hf_name.replace("language_model.", "")  # qwen2vl nesting
        if model_type in _ROBERTA_LIKE:
            hf_name = hf_name.removeprefix("roberta.")
        if arch == "chatglm":
            hf_name = hf_name.removeprefix("transformer.")
            if hf_name.endswith("rotary_pos_emb.inv_freq"):
                continue  # recomputed; reference ChatGLMModel drops it
        arr = np.asarray(arr)
        if arr.dtype != np.float32:
            arr = arr.astype(np.float32)
        if arch in ("rwkv6", "rwkv6qwen2"):
            for nm, a in _rwkv6_tensors(hf_name, arr, cfg):
                _emit(w, nm, a, qtype)
                n_written += 1
            continue
        if arch in ("rwkv7", "arwkv7"):
            for nm, a in _rwkv7_tensors(hf_name, arr, cfg, rwkv_lerp_stash):
                _emit(w, nm, a, qtype)
                n_written += 1
            continue
        if arch == "refact" and hf_name.endswith(".attn.kv.weight"):
            # MQA fused kv [2*hd, C] → k|v (reference RefactModel
            # modify_tensors; n_head_kv = 1)
            il = hf_name.split("transformer.h.")[1].split(".")[0]
            hd = arr.shape[0] // 2
            _emit(w, f"blk.{il}.attn_k.weight", arr[:hd], qtype)
            _emit(w, f"blk.{il}.attn_v.weight", arr[hd:], qtype)
            n_written += 2
            continue
        if arch == "refact" and hf_name.endswith(".mlp.gate_up_proj.weight"):
            il = hf_name.split("transformer.h.")[1].split(".")[0]
            c = cfg["n_embd"]
            ff = 256 * ((int(2 * (4 * c) / 3) + 255) // 256)
            _emit(w, f"blk.{il}.ffn_gate.weight", arr[:ff], qtype)
            _emit(w, f"blk.{il}.ffn_up.weight", arr[ff:], qtype)
            n_written += 2
            continue
        if arch == "plamo" and hf_name.endswith((".self_attn.q_proj.weight",
                                                 ".self_attn.o_proj.weight")):
            # plamo GQA head shuffle (reference PlamoModel
            # shuffle_attn_q_weight/shuffle_attn_output_weight, generalized
            # from the 13B's (8,5,128) grouping to rep × kv × head_dim)
            c = arr.shape[0]
            hd = cfg["hidden_size"] // n_head
            rep = n_head // n_kv
            if hf_name.endswith("q_proj.weight"):
                arr = (arr.reshape(rep, n_kv, hd, -1).transpose(1, 0, 2, 3)
                       .reshape(c, -1))
            else:
                arr = (arr.reshape(c, rep, n_kv, hd).transpose(0, 2, 1, 3)
                       .reshape(c, -1))
        if arch == "jina-bert-v2" and "gated_layer" in hf_name:
            # fused gate|up rows (reference JinaBertV2Model.get_tensors:
            # gated_layers → w|v halves; up_gated_layer is v|w)
            hf_name = hf_name.removeprefix("bert.")
            ff = cfg["intermediate_size"]
            if "up_gated_layer" in hf_name:
                v, g = arr[:ff], arr[ff:]
            else:
                g, v = arr[:ff], arr[ff:]
            il = hf_name.split("encoder.layer.")[1].split(".")[0]
            _emit(w, f"blk.{il}.ffn_gate.weight", g, qtype)
            _emit(w, f"blk.{il}.ffn_up.weight", v, qtype)
            n_written += 2
            continue
        m = re.match(r"model\.layers\.(\d+)\.", hf_name)
        if m and int(m.group(1)) >= n_layers:
            continue  # deepseek-v3 multi-token-prediction layers
        if pos_offset and hf_name == "embeddings.position_embeddings.weight":
            arr = arr[pos_offset:]  # chop the pad-offset rows (roberta)
        if ".feed_forward.experts.gate_up_proj" in hf_name:
            # llama4 fused per-expert [E, C, 2*ff] (transposed storage):
            # transpose, split into gate|up stacks (reference Llama4Model
            # modify_tensors)
            il = hf_name.split("model.layers.")[1].split(".")[0]
            ff = arr.shape[-1] // 2
            t = arr.transpose(0, 2, 1)  # [E, 2*ff, C]
            _emit(w, f"blk.{il}.ffn_gate_exps.weight", t[:, :ff, :], qtype)
            _emit(w, f"blk.{il}.ffn_up_exps.weight", t[:, ff:, :], qtype)
            n_written += 2
            continue
        if ".feed_forward.experts.down_proj" in hf_name:
            il = hf_name.split("model.layers.")[1].split(".")[0]
            _emit(w, f"blk.{il}.ffn_down_exps.weight",
                  arr.transpose(0, 2, 1), qtype)
            n_written += 1
            continue
        if hf_name.endswith("self_attn.W_pack.weight"):
            # baichuan fused QKV [3C, C]: split + permute q/k (the shared
            # within-head row permutation leaves q·k invariant, so this is
            # also safe for the 13B ALiBi variant)
            il = hf_name.split("model.layers.")[1].split(".")[0]
            c = arr.shape[0] // 3
            _emit(w, f"blk.{il}.attn_q.weight",
                  _permute_qk(arr[:c], n_head), qtype)
            _emit(w, f"blk.{il}.attn_k.weight",
                  _permute_qk(arr[c: 2 * c], n_kv), qtype)
            _emit(w, f"blk.{il}.attn_v.weight", arr[2 * c:], qtype)
            n_written += 3
            continue
        if ".block_sparse_moe.input_linear.weight" in hf_name:
            # granitemoe fused per-expert [E, 2*ff, C] → gate|up stacks
            il = hf_name.split("model.layers.")[1].split(".")[0]
            ff = arr.shape[1] // 2
            _emit(w, f"blk.{il}.ffn_gate_exps.weight", arr[:, :ff, :], qtype)
            _emit(w, f"blk.{il}.ffn_up_exps.weight", arr[:, ff:, :], qtype)
            n_written += 2
            continue
        if ".block_sparse_moe.output_linear.weight" in hf_name:
            il = hf_name.split("model.layers.")[1].split(".")[0]
            _emit(w, f"blk.{il}.ffn_down_exps.weight", arr, qtype)
            n_written += 1
            continue
        if arch == "bloom" and ".self_attention.query_key_value." in hf_name:
            # per-head [q|k|v] interleave → q-then-k-then-v rows (reference
            # BloomModel.modify_tensors, convert_hf_to_gguf.py:1110-1125)
            il = hf_name.split("transformer.h.")[1].split(".")[0]
            hd = arr.shape[0] // (3 * n_head)
            suffix = hf_name.rsplit(".", 1)[1]  # weight | bias
            qkv = arr.reshape(n_head, 3, hd, *arr.shape[1:])
            out = np.concatenate([qkv[:, i].reshape(-1, *arr.shape[1:])
                                  for i in range(3)], axis=0)
            _emit(w, f"blk.{il}.attn_qkv.{suffix}",
                  out.reshape(arr.shape), qtype)
            n_written += 1
            continue
        if arch == "dbrx" and ".ffn.experts.mlp." in hf_name:
            # pre-stacked flat [E*ff, d] without .weight suffix (reference
            # DbrxModel.modify_tensors: view 3-D; w2 additionally permutes
            # (0,2,1) so down rows are d-major like every other arch)
            il = hf_name.split("transformer.blocks.")[1].split(".")[0]
            e = cfg["ffn_config"]["moe_num_experts"]
            ff = cfg["ffn_config"]["ffn_hidden_size"]
            t = arr.reshape(e, ff, -1)
            which = hf_name.rsplit(".", 1)[1]
            if which == "w2":
                _emit(w, f"blk.{il}.ffn_down_exps.weight",
                      np.ascontiguousarray(t.transpose(0, 2, 1)), qtype)
            else:
                ggml = "ffn_gate_exps" if which == "w1" else "ffn_up_exps"
                _emit(w, f"blk.{il}.{ggml}.weight", t, qtype)
            n_written += 1
            continue
        if arch == "openelm" and hf_name.endswith(".ffn.proj_1.weight"):
            # fused [2*ff_l, C] gate|up split (reference OpenELMModel
            # modify_tensors; per-layer ff dims, equal halves)
            il = hf_name.split("transformer.layers.")[1].split(".")[0]
            half = arr.shape[0] // 2
            _emit(w, f"blk.{il}.ffn_gate.weight", arr[:half], qtype)
            _emit(w, f"blk.{il}.ffn_up.weight", arr[half:], qtype)
            n_written += 2
            continue
        if arch == "bert":
            name = _map_bert_name(hf_name)
        elif arch == "jina-bert-v2":
            name = _map_bert_name(hf_name, _JINA_LAYER_EXTRA)
        elif arch == "t5":
            name = _map_t5_name(hf_name)
        else:
            name = _map_name(hf_name, layer_map)
        if name is None:
            log.warning("skipping unmapped tensor %s", hf_name)
            continue
        if "__moe__" in name:  # stash experts, emit stacked later
            base, eid = name.rsplit(".", 1)
            base = base.replace("__moe__.", "") + ".weight"
            moe_stash.setdefault(base, {})[int(eid)] = arr
            continue
        if permute and name.endswith("attn_q.weight"):
            arr = _permute_qk(arr, n_head)
        elif permute and name.endswith("attn_k.weight"):
            kvh = n_kv
            if kv_per_layer is not None:  # deci per-layer kv heads
                kvh = kv_per_layer[int(name.split(".")[1])]
            if kvh:
                arr = _permute_qk(arr, kvh)
        elif arch == "chameleon" and ("attn_q_norm" in name or "attn_k_norm" in name):
            # per-head LN weights follow the q/k permute (reference
            # convert_hf_to_gguf.py ChameleonModel._reverse_hf_permute:
            # half-split [2, D/2] → interleaved, broadcast over heads)
            heads = n_head if "q_norm" in name else n_kv
            d = arr.shape[-1] if arr.ndim == 2 else arr.shape[0] // heads
            row = arr.reshape(heads, d)[0]
            arr = np.tile(row.reshape(2, d // 2).T.reshape(-1), (heads, 1))
        if gemma_norm and "norm" in name and name.endswith(".weight"):
            arr = arr + 1.0  # HF gemma/nemotron apply (1 + w); biases stay
        if arch == "bitnet" and any(name.endswith(k + ".weight") for k in (
                "attn_q", "attn_k", "attn_v", "attn_output",
                "ffn_up", "ffn_down", "ffn_gate")):
            # ternarize to {-1,0,1}*scale (reference BitnetModel.weight_quant)
            scale = max(float(np.abs(arr).mean()), 1e-5)
            arr = np.clip(np.round(arr / scale), -1, 1) * scale
        if name.endswith("ssm_conv1d.weight"):
            arr = arr[:, 0, :]  # [Ci,1,K] → [Ci,K]
        _emit(w, name, arr, qtype)
        n_written += 1

    for name, experts in sorted(moe_stash.items()):
        stacked = np.stack([experts[e] for e in sorted(experts)])
        _emit(w, name, stacked, qtype)
        n_written += 1

    w.write()
    log.info("wrote %d tensors to %s", n_written, out_path)


def _emit(w: GGUFWriter, name: str, arr: np.ndarray, qtype: GGMLType) -> None:
    from ..quant.ref_numpy import quantize

    is_matrix = arr.ndim >= 2 and "norm" not in name and not name.endswith(".bias")
    if not is_matrix or qtype == GGMLType.F32:
        w.add_tensor(name, arr.astype(np.float32))
        return
    if qtype == GGMLType.F16:
        w.add_tensor(name, arr.astype(np.float16))
        return
    if qtype == GGMLType.BF16:
        import jax.numpy as jnp

        w.add_tensor(name, np.asarray(jnp.asarray(arr, jnp.bfloat16)),
                     ggml_type=GGMLType.BF16,
                     ne_shape=tuple(reversed(arr.shape)))
        return
    k = arr.shape[-1]
    block = 256 if qtype in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K) else 32
    if k % block:
        w.add_tensor(name, arr.astype(np.float16))
        return
    raw = quantize(arr.reshape(-1, k), qtype)
    w.add_tensor(name, raw, ggml_type=qtype, ne_shape=tuple(reversed(arr.shape)))


def convert_lora(lora_dir: str, out_path: str, base_dir: str | None = None,
                 outtype: str = "f16") -> None:
    """HF-PEFT LoRA adapter → GGUF adapter (role of the reference
    convert_lora_to_gguf.py:1-461): reads adapter_config.json +
    adapter_model.safetensors, maps module names through the same HF→GGUF
    tensor tables as `convert`, and emits `<base>.weight.lora_a` [r, K] /
    `.lora_b` [N, r] pairs with general.type=adapter / adapter.type=lora /
    adapter.lora.alpha — the convention `runtime/adapter.load_lora`
    consumes. `base_dir` (or a config.json inside the adapter dir) supplies
    the base model's arch/head counts for the q/k permutation: GGUF llama
    q/k rows are interleaved-pairs-permuted, and ΔW = B·A permutes as
    (P·B)·A, so lora_b follows `_permute_qk` while lora_a is untouched."""
    lora_dir = Path(lora_dir)
    acfg = json.loads((lora_dir / "adapter_config.json").read_text())
    alpha = float(acfg.get("lora_alpha", acfg.get("alpha", 16.0)))
    cfg_path = None
    for d in (Path(base_dir) if base_dir else None, lora_dir):
        if d is not None and (d / "config.json").exists():
            cfg_path = d / "config.json"
            break
    if cfg_path is None:
        raise FileNotFoundError(
            "base model config.json required (pass --base DIR; the adapter "
            f"dir {lora_dir} has none; base_model_name_or_path="
            f"{acfg.get('base_model_name_or_path')!r} is not fetchable in "
            "this environment)")
    cfg = json.loads(cfg_path.read_text())
    model_type = cfg.get("model_type", "llama")
    arch_cls = (cfg.get("architectures") or [""])[0]
    if arch_cls in _ARCH_CLS_TO_MODEL_TYPE:
        model_type = _ARCH_CLS_TO_MODEL_TYPE[arch_cls]
    arch = _MODEL_TYPE_TO_ARCH.get(model_type)
    if arch is None:
        raise ValueError(f"unsupported HF model_type {model_type!r}")
    n_head = cfg.get("num_attention_heads", cfg.get("n_head", 1))
    n_kv = cfg.get("num_key_value_heads", n_head)
    permute = arch in ("llama", "internlm2", "granite", "chameleon",
                       "baichuan", "xverse", "minicpm", "granitemoe",
                       "olmo", "arctic", "deci")
    layer_map = {"gemma2": _GEMMA2_LAYER_MAP, "gemma3": _GEMMA2_LAYER_MAP,
                 "grok": _GROK_LAYER_MAP, "openelm": _OPENELM_LAYER_MAP,
                 "chatglm": _CHATGLM_LAYER_MAP, "arctic": _ARCTIC_LAYER_MAP,
                 "nomic-bert": _NOMIC_LAYER_MAP,
                 "dbrx": _DBRX_LAYER_MAP}.get(arch, _LAYER_MAP)

    # collect (A, B) pairs keyed by the module's HF name
    pairs: dict[str, dict[str, np.ndarray]] = {}
    for name, arr in _iter_hf_tensors(lora_dir):
        if ".base_layer.weight" in name:
            continue  # frozen base copies some PEFT configs include
        orig = name
        for prefix in ("base_model.model.", "base_model."):
            if name.startswith(prefix):
                name = name[len(prefix):]
                break
        part = None
        for suffix, key in ((".lora_A.weight", "a"), (".lora_B.weight", "b"),
                            (".lora_embedding_A", "a"),
                            (".lora_embedding_B", "b")):
            if name.endswith(suffix):
                part = key
                name = name[: -len(suffix)]
                break
        if part is None:
            # DoRA magnitudes / modules_to_save are not LoRA (A, B) pairs —
            # refuse loudly like the reference does rather than mis-convert
            raise ValueError(f"unsupported non-LoRA tensor {orig!r} "
                             "(DoRA/modules_to_save are not supported)")
        pairs.setdefault(name, {})[part] = np.asarray(arr, np.float32)

    w = GGUFWriter(out_path, arch)
    w.add_string("general.type", "adapter")
    w.add_string("adapter.type", "lora")
    w.add_float32("adapter.lora.alpha", alpha)
    qtype = _QUANT_TYPES[outtype]
    if qtype not in (GGMLType.F32, GGMLType.F16, GGMLType.BF16):
        qtype = GGMLType.F16  # adapters are skinny; block quants don't apply
    n_written = 0
    for hf_name, p in sorted(pairs.items()):
        if set(p) != {"a", "b"}:
            log.warning("lora: incomplete pair for %s — skipped", hf_name)
            continue
        mapped = _map_name(hf_name + ".weight", layer_map)
        if mapped is None:
            log.warning("lora: unmapped module %s — skipped", hf_name)
            continue
        base = mapped[: -len(".weight")] if mapped.endswith(".weight") else mapped
        a, b = p["a"], p["b"]
        if base == "token_embd":
            # lora_embedding_A is [r, V]: ΔE = (B·A)ᵀ = Aᵀ·Bᵀ, so the roles
            # swap and both transpose (reference convert_lora_to_gguf.py:437
            # transposes token_embd.lora_a for llm_build_inp_embd)
            a, b = b.T, a.T
        if permute and base.endswith("attn_q"):
            b = _permute_qk(b, n_head)
        elif permute and base.endswith("attn_k"):
            b = _permute_qk(b, n_kv)
        dt = np.float32 if qtype == GGMLType.F32 else np.float16
        w.add_tensor(f"{base}.weight.lora_a", a.astype(dt))
        w.add_tensor(f"{base}.weight.lora_b", b.astype(dt))
        n_written += 1
    w.write()
    log.info("wrote %d LoRA pairs (alpha=%g) to %s", n_written, alpha,
             out_path)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("hf_dir", help="HF model dir (or PEFT adapter dir "
                                   "with --lora)")
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--outtype", default="f16", choices=sorted(_QUANT_TYPES))
    ap.add_argument("--lora", action="store_true",
                    help="convert a PEFT LoRA adapter dir "
                         "(adapter_config.json + adapter_model.safetensors) "
                         "to a GGUF adapter")
    ap.add_argument("--base", default=None,
                    help="base model dir for --lora (supplies config.json)")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.lora:
        convert_lora(args.hf_dir, args.outfile, args.base, args.outtype)
    else:
        convert(args.hf_dir, args.outfile, args.outtype)
    return 0


if __name__ == "__main__":
    sys.exit(main())
