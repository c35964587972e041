"""Architecture registry.

Capability mirror of the reference arch registry + per-arch graph builders
(src/llama-arch.cpp LLM_ARCH_NAMES / src/llama-model.cpp llm_build_*): each
entry maps GGUF metadata onto the generic decoder's feature flags
(models/llama.py LlamaConfig) instead of hand-writing 68 separate graph
functions — the TPU-native design expresses arch differences as data, and
XLA specializes the single traced graph per config.

Arch-specific notes cite the reference builder they reproduce.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable

from ..gguf.constants import Keys
from ..ops.rope import RopeParams
from .llama import LlamaConfig


@dataclass(frozen=True)
class ArchSpec:
    name: str
    # overrides(get) -> dict of LlamaConfig field overrides; `get` reads
    # "{arch}.*"-templated GGUF keys with a default.
    overrides: Callable[[Callable], dict] | None = None
    fused_qkv: bool = False  # GGUF may carry blk.N.attn_qkv.weight
    fused_gate_up: bool = False  # blk.N.ffn_up.weight holds [2*n_ff, C]
    builder: str = "decoder"  # "decoder" | "mamba" | "deepseek2" | "encoder"


ARCHS: dict[str, ArchSpec] = {}


def register(spec: ArchSpec) -> ArchSpec:
    ARCHS[spec.name] = spec
    return spec


def _llama(get):
    return {}


# GGUF llama_pooling_type enum (reference llama.h LLAMA_POOLING_TYPE_*)
_POOLING_NAMES = {0: "none", 1: "mean", 2: "cls", 3: "last", 4: "rank"}


def _bert(get):
    over = {
        "norm_type": "ln",
        "pos_embd_type": "learned",
        "act": "gelu",
        "gated_ffn": False,
    }
    pt = get("{arch}.pooling_type")
    if pt is not None:
        over["pooling"] = _POOLING_NAMES.get(int(pt), "mean")
    return over


def _granite(get):
    # reference llm_build_granite: 4 scalar scales from GGUF
    return {
        "embd_scale": float(get("{arch}.embedding_scale", 1.0)),
        "residual_scale": float(get("{arch}.residual_scale", 1.0)),
        "logit_scale_div": float(get("{arch}.logit_scale", 0.0)),
        "attn_scale": float(get("{arch}.attention.scale", 0.0)),
    }


def _minicpm(get):
    return {
        "embd_scale": float(get("{arch}.embedding_scale", 12.0)),
        "residual_scale": float(get("{arch}.residual_scale", 1.0)),
        "logit_scale_div": float(get("{arch}.logit_scale", 0.0)),
    }


def _qwen2moe(get):
    # llm_build_qwen2moe: top-k softmax router WITHOUT renorm, plus a
    # sigmoid-gated always-on shared expert
    return {
        "moe_norm_weights": False,
        "moe_shared_expert": True,
        "moe_gate_shexp": True,
    }


def _gemma(get):
    return {
        "act": "gelu",
        "tie_embeddings": True,
        "embd_scale_sqrt_embd": True,
    }


def _gemma2(get):
    return {
        **_gemma(get),
        "post_norms": True,
        "attn_logit_softcap": float(get("{arch}.attn_logit_softcapping", 50.0)),
        "final_logit_softcap": float(get("{arch}.final_logit_softcapping", 30.0)),
        "swa_window": int(get(Keys.LLM.SLIDING_WINDOW, 4096) or 0),
        "swa_pattern": 2,
    }


def _gemma3(get):
    return {
        **_gemma(get),
        "post_norms": True,
        "qk_norm": True,
        "swa_window": int(get(Keys.LLM.SLIDING_WINDOW, 1024) or 0),
        "swa_pattern": 6,
        "rope_local_base": 10000.0,
    }


def _phi2(get):
    return {
        "norm_type": "ln",
        "parallel_residual": True,
        "act": "gelu",
        "gated_ffn": False,
        "tie_embeddings": False,
    }


def _gpt2(get):
    return {
        "norm_type": "ln",
        "pos_embd_type": "learned",
        "act": "gelu",
        "gated_ffn": False,
        "tie_embeddings": True,
    }


def _gptneox(get):
    return {
        "norm_type": "ln",
        "act": "gelu",
        "gated_ffn": False,
        "parallel_residual": bool(get("{arch}.use_parallel_residual", True)),
    }


def _starcoder(get):
    return {
        "norm_type": "ln",
        "pos_embd_type": "learned",
        "act": "gelu",
        "gated_ffn": False,
    }


def _starcoder2(get):
    return {"norm_type": "ln", "act": "gelu", "gated_ffn": False}


def _stablelm(get):
    return {"norm_type": "ln"}


def _olmo(get):
    # llm_build_olmo: non-parametric layer norm (NULL weight/bias),
    # optional qkv clipping (clip_qkv → f_clamp_kqv)
    return {
        "norm_type": "ln",
        "clamp_kqv": float(get("{arch}.attention.clamp_kqv", 0.0) or 0.0),
    }


def _olmo2(get):
    # llm_build_olmo2: post-sublayer norms; q/k rms over the FLAT projection
    return {"norm_after": True, "qk_norm": True, "qk_norm_flat": True}


def _olmoe(get):
    # HF OlmoeAttention RMS-norms the FLAT q/k projections (num_heads*head_dim)
    # before the head reshape — same as olmo2 (llm_build_olmoe build_norm on
    # Qcur/Kcur at full width). Router: softmax top-k WITHOUT renorm
    # (norm_topk_prob=False default).
    return {"qk_norm": True, "qk_norm_flat": True,
            "moe_norm_weights": bool(get("{arch}.expert_weights_norm", False))}


def _command_r(get):
    return {
        "norm_type": "ln",
        "parallel_residual": True,
        "logit_scale": float(get("{arch}.logit_scale", 1.0)),
    }


def _cohere2(get):
    return {
        **_command_r(get),
        "swa_window": int(get(Keys.LLM.SLIDING_WINDOW, 4096) or 0),
        "swa_pattern": 4,
        "rope_on_full_layers": False,
    }


def _bloom(get):
    return {
        "norm_type": "ln",
        "pos_embd_type": "alibi",
        "act": "gelu",
        "gated_ffn": False,
        "embd_norm": True,
        "tie_embeddings": True,
    }


def _mpt(get):
    return {
        "norm_type": "ln",
        "pos_embd_type": "alibi",
        "act": "gelu",
        "gated_ffn": False,
        "max_alibi_bias": float(get("{arch}.attention.max_alibi_bias", 8.0)),
        "clamp_kqv": float(get("{arch}.attention.clamp_kqv", 0.0) or 0.0),
        "tie_embeddings": True,
    }


def _falcon(get):
    return {
        "norm_type": "ln",
        "parallel_residual": True,
        "act": "gelu",
        "gated_ffn": False,
        "tie_embeddings": True,
    }


def _nemotron(get):
    return {"norm_type": "ln", "act": "relu2", "gated_ffn": False}


def _dbrx(get):
    # llm_build_dbrx: LayerNorm (no bias), fused wqkv clamped to
    # ±f_clamp_kqv (llama-model.cpp:5353), SILU MoE with norm_w=true
    return {
        "norm_type": "ln",
        "clamp_kqv": float(get("{arch}.attention.clamp_kqv", 0.0) or 0.0),
    }


def _chatglm(get):
    return {}


def _orion(get):
    return {"norm_type": "ln"}


def _deepseek(get):
    # llm_build_deepseek: leading dense layers, routed scale, shared experts
    return {
        "moe_shared_expert": True,
        "moe_norm_weights": False,
        "moe_scale": float(get("{arch}.expert_weights_scale", 1.0)),
        "n_dense_layers": int(get("{arch}.leading_dense_block_count", 1) or 1),
    }


def _deepseek2(get):
    # llm_build_deepseek2: MLA + grouped MoE; v3 uses sigmoid gating
    rope_dim = int(get(Keys.LLM.ROPE_DIMENSION_COUNT, 64) or 64)
    key_len = int(get(Keys.LLM.ATTN_KEY_LENGTH, 192) or 192)
    gating = int(get("{arch}.expert_gating_func", 1) or 1)
    return {
        **_deepseek(get),
        "q_lora_rank": int(get("{arch}.attention.q_lora_rank", 0) or 0),
        "kv_lora_rank": int(get("{arch}.attention.kv_lora_rank", 512) or 512),
        "qk_rope_dim": rope_dim,
        "qk_nope_dim": key_len - rope_dim,
        "v_head_dim": int(get(Keys.LLM.ATTN_VALUE_LENGTH, 128) or 128),
        "moe_norm_weights": bool(get("{arch}.expert_weights_norm", False)),
        "expert_gating": "sigmoid" if gating == 2 else "softmax",
    }


def _llama4(get):
    # llm_build_llama LLAMA4 branch (src/llama-model.cpp:4425-4500):
    # NoPE every 4th layer with q temperature tuning, weightless qk L2 norm
    # on roped layers (off for the 128E Maverick), 8192-token chunked
    # attention on 3-of-4 layers, sigmoid router scaling expert inputs,
    # always-on shared expert
    n_expert = int(get(Keys.LLM.EXPERT_COUNT, 0) or 0)
    return {
        "moe_shared_expert": True,
        "moe_norm_weights": False,
        "expert_gating": "sigmoid",
        "moe_weight_before": True,
        "nope_step": 4,
        "attn_temp_scale": 0.1,
        "attn_temp_floor": 8192,
        "qk_norm_weightless": n_expert != 128,
        "attn_chunk": 8192,
        "swa_window": 8192,
        "swa_pattern": 4,
    }


def _grok(get):
    # llm_build_grok (src/llama-model.cpp:5155): embeddings ×78.38…, logits
    # ×0.5773…, unscaled KQ (build_attn kq_scale=1.0), GELU MoE, post
    # sandwich norms (attn_out_norm / layer_out_norm → our post_norms keys)
    return {
        "post_norms": True,
        "act": "gelu",
        "embd_scale": 78.38367176906169,
        "logit_scale": 0.5773502691896257,
        "attn_scale": 1.0,
    }


def _qwen2vl(get):
    # llm_build_qwen2vl (src/llama-model.cpp:6451): qwen2 graph + M-RoPE
    # (GGML_ROPE_TYPE_MROPE section table)
    sections = get("{arch}.rope.dimension_sections")
    if sections is None or len(sections) == 0:
        sections = (16, 24, 24, 0)
    return {
        "attn_bias": True,
        "mrope_sections": tuple(int(s) for s in sections),
    }


def _minicpm3(get):
    # llm_build_minicpm3 (src/llama-model.cpp:7856): MLA attention with
    # minicpm scaling — embd ×12, residual ×1.4/sqrt(L), lm head ×256/n_embd
    n_layer = int(get(Keys.LLM.BLOCK_COUNT, 2) or 2)
    n_embd = int(get(Keys.LLM.EMBEDDING_LENGTH, 128) or 128)
    rope_dim = int(get(Keys.LLM.ROPE_DIMENSION_COUNT, 16) or 16)
    key_len = int(get(Keys.LLM.ATTN_KEY_LENGTH, 48) or 48)
    return {
        "q_lora_rank": int(get("{arch}.attention.q_lora_rank", 0) or 0),
        "kv_lora_rank": int(get("{arch}.attention.kv_lora_rank", 32) or 32),
        "qk_rope_dim": rope_dim,
        "qk_nope_dim": key_len - rope_dim,
        "v_head_dim": int(get(Keys.LLM.ATTN_VALUE_LENGTH, 32) or 32),
        "embd_scale": 12.0,
        "residual_scale": 1.4 / math.sqrt(n_layer),
        "logit_scale": 256.0 / n_embd,
    }


def _bitnet(get):
    # llm_build_bitnet (src/llama-model.cpp:10252): ternary linears carry a
    # per-tensor scale (applied in models.llama._mm via `*_scale` keys) and
    # sub-norms before wo / ffn_down; lm head tied to token_embd
    return {"sub_norms": True, "tie_embeddings": True}


def _chameleon(get):
    # llm_build_chameleon (src/llama-model.cpp:12077): per-head q/k LayerNorm
    # with bias, swin_norm = post-norm placement, image-token logits −inf
    # (tokens 4..8196, src/llama-model.cpp:12236-12246)
    return {
        "qk_norm": True,
        "qk_norm_ln": True,
        "norm_after": bool(get("{arch}.swin_norm", False)),
        "suppress_tokens": (4, 8196),
    }


def _plm(get):
    # llm_build_plm (src/llama-model.cpp:12406): MLA (direct wq) + relu²
    # sequential FFN, kq_scale = 1/sqrt(n_embd_head_k)
    rope_dim = int(get(Keys.LLM.ROPE_DIMENSION_COUNT, 16) or 16)
    key_len = int(get(Keys.LLM.ATTN_KEY_LENGTH, 48) or 48)
    return {
        "kv_lora_rank": int(get("{arch}.attention.kv_lora_rank", 32) or 32),
        "qk_rope_dim": rope_dim,
        "qk_nope_dim": key_len - rope_dim,
        "v_head_dim": int(get(Keys.LLM.ATTN_VALUE_LENGTH, 32) or 32),
        "act": "relu2",
        "gated_ffn": False,
    }


def _bailingmoe(get):
    # llm_build_bailingmoe (src/llama-model.cpp:12578): q/k/v reshaped to
    # n_rot (head_dim = rope dims), shared-expert MoE with optional weight
    # renorm and routed scale
    d = {
        "moe_shared_expert": True,
        "moe_norm_weights": bool(get("{arch}.expert_weights_norm", False)),
        "moe_scale": float(get("{arch}.expert_weights_scale", 1.0) or 1.0),
        "n_dense_layers": int(get("{arch}.leading_dense_block_count", 0) or 0),
    }
    rd = get(Keys.LLM.ROPE_DIMENSION_COUNT)
    if rd:
        d["head_dim"] = int(rd)
    return d


# name → spec; coverage of the reference arch table (src/llama-arch.h:11-80).
# Families sharing a graph are registered with the same overrides.
for _spec in [
    ArchSpec("llama", _llama),
    ArchSpec("llama4", _llama4),
    ArchSpec("mistral", _llama),
    ArchSpec("mixtral", _llama),
    ArchSpec("deci", _llama),
    ArchSpec("baichuan", _llama),
    ArchSpec("xverse", _llama),
    ArchSpec("yi", _llama),
    ArchSpec("internlm2", _llama),
    ArchSpec("exaone", _llama),
    # llm_build_refact: RMS norms, ALiBi positions (f_max_alibi_bias = 8,
    # reference src/llama-model.cpp:651-660), MQA (head_count_kv = 1)
    ArchSpec("refact", lambda get: {
        "pos_embd_type": "alibi", "max_alibi_bias": 8.0,
    }),
    ArchSpec("granite", _granite),
    ArchSpec("granitemoe", _granite),
    ArchSpec("minicpm", _minicpm),
    ArchSpec("qwen", _llama, fused_qkv=True),
    ArchSpec("qwen2", _llama),
    ArchSpec("qwen2moe", _qwen2moe),
    ArchSpec("qwen3", lambda get: {"qk_norm": True}),
    ArchSpec("qwen3moe", lambda get: {
        "qk_norm": True,
        # shipped qwen3moe models renorm top-k router weights; the GGUF key
        # records the HF norm_topk_prob flag
        "moe_norm_weights": bool(get("{arch}.expert_weights_norm", True)),
    }),
    ArchSpec("gemma", _gemma),
    ArchSpec("gemma2", _gemma2),
    ArchSpec("gemma3", _gemma3),
    ArchSpec("phi2", _phi2, fused_qkv=True),
    ArchSpec("phi3", _llama, fused_qkv=True, fused_gate_up=True),
    ArchSpec("phimoe", _llama, fused_qkv=True),
    ArchSpec("gpt2", _gpt2, fused_qkv=True),
    ArchSpec("gptneox", _gptneox, fused_qkv=True),
    ArchSpec("gptj", _phi2),
    ArchSpec("starcoder", _starcoder, fused_qkv=True),
    ArchSpec("starcoder2", _starcoder2),
    ArchSpec("stablelm", _stablelm),
    ArchSpec("olmo", _olmo),
    ArchSpec("olmo2", _olmo2),
    ArchSpec("olmoe", _olmoe),
    ArchSpec("command-r", _command_r),
    ArchSpec("cohere2", _cohere2),
    ArchSpec("bloom", _bloom, fused_qkv=True),
    ArchSpec("mpt", _mpt, fused_qkv=True),
    ArchSpec("falcon", _falcon, fused_qkv=True),
    ArchSpec("nemotron", _nemotron),
    ArchSpec("dbrx", _dbrx, fused_qkv=True),
    ArchSpec("chatglm", _chatglm, fused_qkv=True, fused_gate_up=True),
    ArchSpec("glm4", _chatglm, fused_gate_up=True),
    ArchSpec("orion", _orion),
    # llm_build_plamo: attn + ffn both branch off the SAME attn_norm output
    # (no ffn_norm tensor), summed with the residual
    ArchSpec("plamo", lambda get: {"parallel_residual": True}),
    # llm_build_codeshell: starcoder block but NEOX rope, no learned wpe
    ArchSpec("codeshell", _starcoder2, fused_qkv=True),
    # llm_build_jais: LN, fused qkv, ALiBi positions, gated SiLU FFN
    ArchSpec("jais", lambda get: {
        "norm_type": "ln",
        "pos_embd_type": "alibi",
        "max_alibi_bias": float(get("{arch}.attention.max_alibi_bias", 8.0) or 8.0),
        "tie_embeddings": True,
    }, fused_qkv=True),
    ArchSpec("arctic", _llama),
    ArchSpec("deepseek", _deepseek),
    ArchSpec("deepseek2", _deepseek2),
    ArchSpec("grok", _grok),
    ArchSpec("qwen2vl", _qwen2vl),
    ArchSpec("minicpm3", _minicpm3),
    ArchSpec("bitnet", _bitnet),
    ArchSpec("chameleon", _chameleon),
    ArchSpec("plm", _plm),
    ArchSpec("bailingmoe", _bailingmoe),
    # llm_build_openelm (src/llama-model.cpp:9445): per-layer head counts
    # (handled via n_heads_l/n_kv_heads_l), fused qkv, q/k rms norm
    ArchSpec("openelm", lambda get: {"qk_norm": True}, fused_qkv=True),
    ArchSpec("mamba", lambda get: {
        "ssm_d_conv": int(get(Keys.LLM.SSM_CONV_KERNEL, 4) or 4),
        "ssm_d_inner": int(get(Keys.LLM.SSM_INNER_SIZE, 0) or 0),
        "ssm_d_state": int(get(Keys.LLM.SSM_STATE_SIZE, 16) or 16),
        "ssm_dt_rank": int(get(Keys.LLM.SSM_TIME_STEP_RANK, 0) or 0),
        # falcon-mamba applies rms norm on the dt/B/C splits
        "ssm_dt_b_c_rms": bool(get("{arch}.ssm.dt_b_c_rms", False)),
    }, builder="mamba"),
    ArchSpec("rwkv6", lambda get: {
        "norm_type": "ln",
        "head_dim": int(get("{arch}.wkv.head_size", 64) or 64),
    }, builder="rwkv6"),
    # llm_build_rwkv6qwen2: rwkv6 time-mix with is_qrwkv (no bonus term,
    # sigmoid gate, GQA kv, gated-linear-attn) + qwen2 dense FFN, RMS norms
    ArchSpec("rwkv6qwen2", lambda get: {
        "head_dim": int(get("{arch}.wkv.head_size", 64) or 64),
    }, builder="rwkv6"),
    ArchSpec("rwkv7", lambda get: {
        "norm_type": "ln",
        "head_dim": int(get("{arch}.wkv.head_size", 64) or 64),
    }, builder="rwkv7"),
    ArchSpec("arwkv7", lambda get: {
        "head_dim": int(get("{arch}.wkv.head_size", 64) or 64),
    }, builder="rwkv7"),
    # audio codec decoder — own config/loader (models/wavtokenizer.py), like
    # t5; registered so the arch table is complete
    ArchSpec("wavtokenizer-dec", None, builder="wavtokenizer"),
    ArchSpec("t5", _llama, builder="t5"),
    ArchSpec("t5encoder", _llama, builder="t5"),
    ArchSpec("bert", _bert, builder="encoder"),
    # llm_build_bert NOMIC_BERT branch: fused wqkv, NEOX rope (no learned
    # positions), SiLU-gated FFN
    ArchSpec("nomic-bert", lambda get: {**_bert(get), "pos_embd_type": "rope",
                                        "act": "silu", "gated_ffn": True},
             builder="encoder"),
    # llm_build_bert JINA_BERT_V2 branch: ALiBi positions, GELU-gated FFN,
    # optional per-layer q/k LayerNorms (jina-v2-code)
    ArchSpec("jina-bert-v2", lambda get: {**_bert(get),
                                          "pos_embd_type": "alibi",
                                          "act": "gelu", "gated_ffn": True},
             builder="encoder"),
]:
    register(_spec)

# llama_model_rope_type NEOX list (reference src/llama-model.cpp:13153-80).
# Everything else with rope is NORM (interleaved pairs) — NB olmo/arctic/
# deci/llama-family GGUFs hold converter-PERMUTED q/k, while chatglm/glm4/
# deepseek2/plamo/command-r are stored HF-native because those HF models
# rotate interleaved pairs natively (empirically checked: the wrong mode
# costs ~1e-3 logit drift on tiny models — below loose test tolerances, so
# pin with tight ones).
_NEOX_ROPE_ARCHS = {
    "qwen", "qwen2", "qwen2moe", "qwen2vl", "qwen3", "qwen3moe", "stablelm",
    "phi2", "phi3", "phimoe", "gptneox", "olmo2", "olmoe",
    "gemma", "gemma2", "gemma3", "starcoder2", "falcon", "dbrx", "nemotron",
    "exaone", "codeshell",
    "grok", "bitnet", "minicpm3", "openelm", "nomic-bert",
}


def arch_spec(arch: str) -> ArchSpec:
    return ARCHS.get(arch, ArchSpec(arch, _llama))


def synth_config(arch: str, **dims) -> LlamaConfig:
    """Tiny config for `arch` with the registry's flags applied — for tests
    and benches that don't have a GGUF file."""
    spec = arch_spec(arch)

    def get(template: str, default=None):
        return default

    over = dict(spec.overrides(get)) if spec.overrides else {}
    base = dict(
        arch=arch, n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2, head_dim=32,
        n_ff=256, n_vocab=256, n_ctx_train=512, rms_eps=1e-5,
    )
    if over.pop("embd_scale_sqrt_embd", False):
        over["embd_scale"] = math.sqrt(dims.get("n_embd", base["n_embd"]))
    logit_div = over.pop("logit_scale_div", 0.0)
    if logit_div:
        over["logit_scale"] = 1.0 / logit_div
    base.update(over)
    base.update(dims)
    if arch in _NEOX_ROPE_ARCHS:
        mode = "neox"
    else:
        mode = "norm"
    rope_dims = base["qk_rope_dim"] if base.get("kv_lora_rank") else base["head_dim"]
    base.setdefault(
        "rope", RopeParams(n_dims=rope_dims, mode=mode, freq_base=10000.0)
    )
    # keep SWA windows tiny-model friendly
    if base.get("swa_window"):
        base["swa_window"] = min(base["swa_window"], 8)
    return LlamaConfig(**base)


def config_from_gguf(kv: dict[str, Any]) -> LlamaConfig:
    """GGUF metadata → LlamaConfig. Common hparams mirror the reference's
    llama_model::load_hparams (src/llama-model.cpp:395+); per-arch flag
    overrides come from the registry."""
    arch = str(kv[Keys.General.ARCHITECTURE])
    spec = arch_spec(arch)

    def get(template: str, default=None):
        return kv.get(template.format(arch=arch), default)

    n_embd = int(get(Keys.LLM.EMBEDDING_LENGTH))
    # openelm stores per-layer head counts as arrays (hparams.n_head(il));
    # normalize: scalars = max, per-layer tuples go in n_heads_l
    import numpy as _np

    def _seq(v):  # GGUF reader returns numeric arrays as np.ndarray
        return isinstance(v, (list, tuple, _np.ndarray))

    hv = get(Keys.LLM.ATTN_HEAD_COUNT, 0)
    if hv is None:
        hv = 0
    kvv = get(Keys.LLM.ATTN_HEAD_COUNT_KV, hv)
    if kvv is None:
        kvv = hv
    n_heads_l = tuple(int(x) for x in hv) if _seq(hv) else ()
    n_kv_heads_l = tuple(int(x) for x in kvv) if _seq(kvv) else ()
    n_heads = max(n_heads_l) if n_heads_l else int(hv)
    n_kv_heads = (max(n_kv_heads_l) if n_kv_heads_l
                  else int(kvv) if kvv else n_heads)
    head_dim = int(get(Keys.LLM.ATTN_KEY_LENGTH,
                       n_embd // n_heads if n_heads else 0))
    n_vocab = int(get(Keys.LLM.VOCAB_SIZE, 0)) or len(kv.get(Keys.Tokenizer.LIST, []))

    over = dict(spec.overrides(get)) if spec.overrides else {}

    rope_dims = int(get(Keys.LLM.ROPE_DIMENSION_COUNT, head_dim))
    rope_mode = "neox" if arch in _NEOX_ROPE_ARCHS else "norm"
    scaling_type = get(Keys.LLM.ROPE_SCALING_TYPE, "none")
    freq_scale = 1.0
    ext_factor = 0.0
    factor = float(get(Keys.LLM.ROPE_SCALING_FACTOR, 1.0) or 1.0)
    if scaling_type == "linear" and factor:
        freq_scale = 1.0 / factor
    elif scaling_type == "yarn" and factor:
        freq_scale = 1.0 / factor
        ext_factor = 1.0
    rope = RopeParams(
        n_dims=rope_dims,
        mode=rope_mode,
        freq_base=float(get(Keys.LLM.ROPE_FREQ_BASE, 10000.0)),
        freq_scale=freq_scale,
        ext_factor=ext_factor,
        n_ctx_orig=int(get(Keys.LLM.ROPE_SCALING_ORIG_CTX, 0) or 0),
    )

    # post-process registry pseudo-fields
    if over.pop("embd_scale_sqrt_embd", False):
        over["embd_scale"] = math.sqrt(n_embd)
    logit_div = over.pop("logit_scale_div", 0.0)
    if logit_div:
        over["logit_scale"] = 1.0 / logit_div

    eps = get(Keys.LLM.ATTN_LAYERNORM_RMS_EPS)
    if eps is None:
        eps = get(Keys.LLM.ATTN_LAYERNORM_EPS, 1e-5)

    ffv = get(Keys.LLM.FEED_FORWARD_LENGTH, 0)
    if ffv is None:
        ffv = 0
    n_ff = max(int(x) for x in ffv) if _seq(ffv) else int(ffv)
    if n_heads_l:
        over.setdefault("n_heads_l", n_heads_l)
        over.setdefault("n_kv_heads_l", n_kv_heads_l or n_heads_l)
    kwargs = dict(
        arch=arch,
        n_layers=int(get(Keys.LLM.BLOCK_COUNT)),
        n_embd=n_embd,
        n_heads=n_heads,
        n_kv_heads=n_kv_heads,
        head_dim=head_dim,
        n_ff=n_ff,
        n_vocab=n_vocab,
        n_ctx_train=int(get(Keys.LLM.CONTEXT_LENGTH, 2048)),
        rms_eps=float(eps),
        rope=rope,
        n_expert=int(get(Keys.LLM.EXPERT_COUNT, 0) or 0),
        n_expert_used=int(get(Keys.LLM.EXPERT_USED_COUNT, 0) or 0),
    )
    kwargs.update(over)  # per-arch overrides win (e.g. rwkv wkv head_size)
    return LlamaConfig(**kwargs)
