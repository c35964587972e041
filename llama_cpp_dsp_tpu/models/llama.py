"""Llama-family transformer (functional JAX).

Covers the graph built by reference llm_build_llama (src/llama-model.cpp:4408)
and its close relatives (qwen2 = neox rope + qkv bias; mistral = same graph):
rms_norm → q/k/v proj (+ optional bias) → RoPE → GQA attention over KV cache
→ out proj → rms_norm → SwiGLU FFN (or MoE) → residual; final norm → lm_head.

Weights are QTensors (packed GGUF quant blocks) or dense arrays; matmuls go
through ops.qmm which dispatches to the fused Pallas kernels on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..gguf.constants import Keys
from ..ops import Weight, qmm, rms_norm, silu, softmax_f32, take_rows
from ..ops.rope import RopeParams, apply_rope


@dataclass(frozen=True)
class LlamaConfig:
    """Generic decoder config — the union of the per-arch hparams consumed by
    the reference's 68 llm_build_* graph builders (src/llama-model.cpp).
    Defaults reproduce the plain llama graph; registry.py sets the flags
    per architecture."""

    arch: str
    n_layers: int
    n_embd: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    n_ff: int
    n_vocab: int
    n_ctx_train: int
    rms_eps: float = 1e-5
    rope: RopeParams = field(default_factory=lambda: RopeParams(n_dims=0))
    n_expert: int = 0
    n_expert_used: int = 0
    attn_bias: bool = False
    qk_norm: bool = False  # qwen3/olmo2-style q/k rms norm
    tie_embeddings: bool = False
    # --- arch-zoo flags (defaults = plain llama) ---
    norm_type: str = "rms"  # "rms" | "ln"
    pooling: str = ""  # GGUF pooling_type: "" | "none" | "mean" | "cls" | "last" | "rank"
    parallel_residual: bool = False  # gptneox/phi2/gptj: attn+ffn from same input
    pos_embd_type: str = "rope"  # "rope" | "learned" | "alibi" | "none"
    act: str = "silu"  # "silu" | "gelu" | "relu2"
    gated_ffn: bool = True  # False: up → act → down (gpt2-style)
    embd_scale: float = 1.0  # gemma: sqrt(n_embd); minicpm: scale_emb
    residual_scale: float = 1.0  # granite/minicpm depth scale
    logit_scale: float = 1.0  # command-r / granite
    attn_scale: float = 0.0  # 0 → 1/sqrt(head_dim)
    attn_logit_softcap: float = 0.0  # gemma2: 50.0
    final_logit_softcap: float = 0.0  # gemma2: 30.0
    post_norms: bool = False  # gemma2/3 sandwich attn_post_norm/ffn_post_norm
    norm_after: bool = False  # olmo2: norm applied to sublayer OUTPUT only
    swa_window: int = 0  # sliding-window size (0 = full attention)
    swa_pattern: int = 1  # every Nth layer is full attention (gemma3: 6)
    rope_local_base: float = 0.0  # gemma3: separate freq base for SWA layers
    max_alibi_bias: float = 8.0
    moe_norm_weights: bool = True  # renormalize top-k router weights (mixtral)
    moe_shared_expert: bool = False  # qwen2moe/deepseek-style always-on expert
    moe_gate_shexp: bool = False  # qwen2moe: sigmoid-gated shared expert
    expert_gating: str = "softmax"  # "softmax" | "sigmoid"
    moe_scale: float = 1.0  # granitemoe/deepseek routed scale
    embd_norm: bool = False  # bloom token_embd_norm after embedding
    rope_on_full_layers: bool = True  # cohere2: full-attn layers skip rope
    sub_norms: bool = False  # bitnet attn_sub_norm / ffn_sub_norm
    qk_norm_ln: bool = False  # chameleon: per-head q/k norm is LN (not rms)
    qk_norm_flat: bool = False  # olmo2: rms over the FLAT projection (pre-split)
    # --- llama4 (llm_build_llama LLAMA4 branch) ---
    nope_step: int = 0  # every Nth layer skips rope (NoPE)
    attn_temp_scale: float = 0.0  # NoPE-layer q temperature tuning
    attn_temp_floor: int = 8192
    qk_norm_weightless: bool = False  # non-parametric q/k rms on roped layers
    clamp_kqv: float = 0.0  # mpt/olmo f_clamp_kqv: clip qkv to ±value
    attn_chunk: int = 0  # chunked attention width (SWA-slot layers)
    moe_weight_before: bool = False  # router weights scale expert INPUTS
    # openelm: per-layer head counts (llm_build_openelm hparams.n_head(il));
    # empty = uniform. KV cache is sized for the max and padded per layer.
    n_heads_l: tuple = ()
    n_kv_heads_l: tuple = ()
    mrope_sections: tuple = ()  # qwen2vl M-RoPE section widths (pairs)
    suppress_tokens: tuple = ()  # chameleon: (start, end) logit range → -inf
    # --- deepseek2 MLA (reference llm_build_deepseek2) ---
    q_lora_rank: int = 0  # 0 = direct q projection (deepseek2-lite)
    kv_lora_rank: int = 0  # >0 enables MLA
    qk_nope_dim: int = 0
    qk_rope_dim: int = 0
    v_head_dim: int = 0
    n_dense_layers: int = 0  # leading dense (non-MoE) layers
    # --- mamba SSM (reference llm_build_mamba) ---
    ssm_d_inner: int = 0
    ssm_d_state: int = 0
    ssm_d_conv: int = 0
    ssm_dt_rank: int = 0
    # falcon-mamba: weightless rms over dt/B/C splits (reference
    # llm_build_mamba ssm_dt_b_c_rms, src/llama-model.cpp:8735)
    ssm_dt_b_c_rms: bool = False
    # set only inside a shard_map tensor-parallel program
    # (parallel/tp_kernels.py): head/ffn dims above are the LOCAL shard's;
    # col-parallel projections (attn_output, ffn_down) psum over this axis
    tp_axis: str | None = None

    @property
    def kv_cache_heads(self) -> int:
        """KV-cache head count: MLA caches one latent 'head'."""
        if self.kv_lora_rank:
            return 1
        if self.n_kv_heads_l:
            return max(self.n_kv_heads_l)
        return self.n_kv_heads

    def layer_heads(self, il: int) -> tuple[int, int]:
        """(n_heads, n_kv_heads) for layer il (openelm varies per layer)."""
        h = self.n_heads_l[il] if self.n_heads_l else self.n_heads
        hkv = self.n_kv_heads_l[il] if self.n_kv_heads_l else self.n_kv_heads
        return h, hkv

    @property
    def kv_cache_dim(self) -> int:
        """KV-cache per-head dim: MLA caches [latent; roped-k; 0-pad].

        The MLA entry is padded up to a 128 multiple so the flash-MLA
        decode kernel's chunk DMAs stay lane-aligned (Mosaic constraint);
        the pad lanes are zero and drop out of every dot product."""
        if self.kv_lora_rank:
            w = self.kv_lora_rank + self.qk_rope_dim
            return -(-w // 128) * 128
        return self.head_dim

    @property
    def n_embd_head(self) -> int:
        return self.head_dim

    def is_swa_layer(self, il: int) -> bool:
        """Layer uses sliding-window attention (gemma2 alternates, gemma3 5:1,
        reference hparams.is_swa src/llama-hparams.cpp)."""
        return self.swa_window > 0 and (il + 1) % max(self.swa_pattern, 1) != 0

    @classmethod
    def from_gguf_kv(cls, kv: dict[str, Any]) -> "LlamaConfig":
        from .registry import config_from_gguf

        return config_from_gguf(kv)


Params = dict[str, Any]


def norm(x: jax.Array, tree: Params, name: str, cfg: LlamaConfig) -> jax.Array:
    """Dispatch rms_norm / layer_norm by config; picks up `<name>_bias`.
    A missing weight means non-parametric norm (reference llm_build_olmo
    passes NULL weight to build_norm)."""
    from ..ops import layer_norm

    w = tree.get(name)
    if cfg.norm_type == "ln":
        return layer_norm(x, w, tree.get(name + "_bias"), cfg.rms_eps)
    return rms_norm(x, w, cfg.rms_eps)


def activate(x: jax.Array, act: str) -> jax.Array:
    from ..ops import gelu

    if act == "silu":
        return silu(x)
    if act == "gelu":
        return gelu(x)
    if act == "relu2":
        xf = jnp.maximum(x.astype(jnp.float32), 0.0)
        return (xf * xf).astype(x.dtype)
    raise ValueError(act)


def softcap(x: jax.Array, cap: float) -> jax.Array:
    """gemma2 logit soft-capping: cap * tanh(x / cap)."""
    return jnp.tanh(x / cap) * cap


def alibi_slopes(n_heads: int, max_bias: float) -> jax.Array:
    """Per-head ALiBi slopes — reference ggml_soft_max_ext slope computation
    (ggml/src/ggml-cpu/ops.cpp soft_max: m0^(h+1) / m1^(2(h-n0)+1))."""
    import math

    n0 = 2 ** math.floor(math.log2(n_heads))
    m0 = 2.0 ** (-(max_bias) / n0)
    m1 = 2.0 ** (-(max_bias / 2.0) / n0)
    slopes = [m0 ** (h + 1) if h < n0 else m1 ** (2 * (h - n0) + 1) for h in range(n_heads)]
    return jnp.asarray(slopes, jnp.float32)


def _mask_value(dtype) -> float:
    return float(jnp.finfo(jnp.float32).min)


def attention(
    q: jax.Array,  # [B, T, H, D] (already roped)
    k: jax.Array,  # [B, Hkv, S, D]
    v: jax.Array,  # [B, Hkv, S, D]
    mask: jax.Array | None,  # [B, T, S] bool (True = attend) or additive f32
    scale: float,
    *,
    logit_softcap: float = 0.0,
    head_bias: jax.Array | None = None,  # [B, H, T, S] additive f32 (ALiBi)
) -> jax.Array:
    """Masked multi-head attention, f32 softmax/accumulation like the
    reference's non-flash path (llama-graph.cpp:1211-1230, KQ in f32)."""
    b, t, h, d = q.shape
    hkv = k.shape[1]
    rep = h // hkv
    qf = q.astype(jnp.float32).reshape(b, t, hkv, rep, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum("bthrd,bhsd->bhrts", qf, kf) * scale  # [B,Hkv,rep,T,S]
    if logit_softcap:
        scores = softcap(scores, logit_softcap)
    if head_bias is not None:
        scores = scores + head_bias.reshape(b, hkv, rep, t, head_bias.shape[-1])
    if mask is not None:
        if mask.dtype == jnp.bool_:
            bias = jnp.where(mask, 0.0, _mask_value(jnp.float32))
        else:
            bias = mask.astype(jnp.float32)
        scores = scores + bias[:, None, None, :, :]
    probs = softmax_f32(scores, axis=-1)
    out = jnp.einsum("bhrts,bhsd->bthrd", probs, vf)
    return out.reshape(b, t, h * d)


def _psum_tp(x, cfg):
    """All-reduce a col-parallel projection's partial sums over the tp axis
    (Megatron row-split; no-op outside shard_map)."""
    if cfg.tp_axis:
        return jax.lax.psum(x, cfg.tp_axis)
    return x


def _mm(x, tree: Params, name: str, compute_dtype):
    """qmm + optional `<name>_bias` + optional LoRA rank-r delta.

    LoRA applies at graph time like reference build_lora_mm
    (src/llama-graph.cpp): y = W·x + B(A·x), B pre-scaled by alpha/r."""
    y = qmm(x, tree[name], compute_dtype=compute_dtype)
    s = tree.get(name + "_scale")
    if s is not None:  # bitnet per-tensor weight scale (llm_build_bitnet)
        y = y * s.astype(y.dtype)
    b = tree.get(name + "_bias")
    if b is not None:
        y = y + b
    la = tree.get(name + "_lora_a")
    if la is not None:
        t = qmm(x, la, compute_dtype=compute_dtype)
        y = y + qmm(t, tree[name + "_lora_b"], compute_dtype=compute_dtype)
    return y


def ffn_dense(x: jax.Array, layer: Params, cfg: LlamaConfig, compute_dtype,
              tap=None, suffix: str = "", layer_idx: int = 0) -> jax.Array:
    """Dense FFN — reference build_ffn (src/llama-graph.cpp): gated
    (SwiGLU/GeGLU) or plain up→act→down, with optional biases."""
    gate_key, up_key, down_key = (f"ffn_gate{suffix}", f"ffn_up{suffix}", f"ffn_down{suffix}")
    if not suffix and "ffn_gateup_fused" in layer:
        fused = layer["ffn_gateup_fused"]
        ng = fused.sections[0]
        if tap is not None:
            tap(f"blk.{layer_idx}.{gate_key}.weight", x)
            tap(f"blk.{layer_idx}.{up_key}.weight", x)
        gu = qmm(x, fused, compute_dtype=compute_dtype)
        gate_part, up_part = gu[..., :ng], gu[..., ng:]
        for pn, cur in (("ffn_gate", 0), ("ffn_up", 1)):
            la = layer.get(pn + "_lora_a")
            if la is not None:
                delta = qmm(qmm(x, la, compute_dtype=compute_dtype),
                            layer[pn + "_lora_b"], compute_dtype=compute_dtype)
                if cur == 0:
                    gate_part = gate_part + delta
                else:
                    up_part = up_part + delta
        h = (activate(gate_part, cfg.act) * up_part).astype(compute_dtype)
        if tap is not None:
            tap(f"blk.{layer_idx}.{down_key}.weight", h)
        return _psum_tp(_mm(h, layer, down_key, compute_dtype), cfg)
    if cfg.gated_ffn and gate_key in layer:
        if tap is not None:
            tap(f"blk.{layer_idx}.{gate_key}.weight", x)
            tap(f"blk.{layer_idx}.{up_key}.weight", x)
        gate = _mm(x, layer, gate_key, compute_dtype)
        up = _mm(x, layer, up_key, compute_dtype)
        h = (activate(gate, cfg.act) * up).astype(compute_dtype)
        if cfg.sub_norms and not suffix:  # bitnet ffn_sub_norm before down
            h = norm(h, layer, "ffn_sub_norm", cfg)
    else:
        if tap is not None:
            tap(f"blk.{layer_idx}.{up_key}.weight", x)
        up = _mm(x, layer, up_key, compute_dtype)
        h = activate(up, cfg.act).astype(compute_dtype)
    if tap is not None:
        tap(f"blk.{layer_idx}.{down_key}.weight", h)
    return _psum_tp(_mm(h, layer, down_key, compute_dtype), cfg)


def ffn_moe(x: jax.Array, layer: Params, cfg: LlamaConfig, compute_dtype,
            tap=None, layer_idx: int = 0) -> jax.Array:
    """MoE FFN — reference build_moe_ffn (src/llama-graph.cpp): router
    (softmax or sigmoid), top-k experts, MUL_MAT_ID expert matmuls, weighted
    sum, optional always-on shared expert (qwen2moe/deepseek2)."""
    e = cfg.n_expert
    if tap is not None:
        tap(f"blk.{layer_idx}.ffn_gate_inp.weight", x)
    logits = qmm(x, layer["ffn_gate_inp"], compute_dtype=compute_dtype)  # [B,T,E]
    if cfg.expert_gating == "sigmoid":
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    else:
        probs = softmax_f32(logits)
    probs_b = layer.get("ffn_exp_probs_b")
    if probs_b is not None:
        # deepseek-v3 e_score_correction_bias: the bias steers expert
        # SELECTION only; mixing weights stay the unbiased probs
        # (reference build_moe_ffn selection_probs, llama-graph.cpp)
        _, sel = jax.lax.top_k(probs + probs_b.astype(jnp.float32),
                               cfg.n_expert_used)
        weights = jnp.take_along_axis(probs, sel, axis=-1)
    else:
        weights, sel = jax.lax.top_k(probs, cfg.n_expert_used)  # [B,T,U]
    if cfg.moe_norm_weights:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    weights = weights * cfg.moe_scale
    gate_w, up_w, down_w = layer["ffn_gate_exps"], layer["ffn_up_exps"], layer["ffn_down_exps"]
    from ..ops.pallas.layouts import KernelWeights

    b, t = x.shape[0], x.shape[1]
    u = cfg.n_expert_used
    kernelized = all(isinstance(w, KernelWeights)
                     for w in (gate_w, up_w, down_w))
    # the GEMV kernel streams ONE full expert matrix per row, dense-all
    # streams each expert once — so per-row selection only wins while
    # rows < n_expert (decode/small batches; big-E MoEs win up to 32 rows)
    if kernelized and b * t * u <= min(32, e):
        # decode: selected-expert GEMV kernel streams only the chosen
        # experts' packed bytes (MUL_MAT_ID role; E/U× less HBM traffic
        # than dense-all). Rows repeat per used expert.
        from ..ops.pallas.qmm import qmm_expert_rows

        xf = x.reshape(b * t, -1)
        sel_flat = sel.reshape(-1)  # [M*U]
        w_flat = weights.reshape(b * t * u).astype(jnp.float32)
        xr = jnp.repeat(xf, u, axis=0)  # [M*U, K]
        if cfg.moe_weight_before:
            xr = (xr.astype(jnp.float32) * w_flat[:, None]).astype(
                compute_dtype)
        g = qmm_expert_rows(xr.astype(compute_dtype), gate_w, sel_flat)
        uu = qmm_expert_rows(xr.astype(compute_dtype), up_w, sel_flat)
        h = (activate(g, cfg.act) * uu).astype(compute_dtype)
        d = qmm_expert_rows(h, down_w, sel_flat)  # [M*U, D] f32
        if not cfg.moe_weight_before:
            d = d * w_flat[:, None]
        mix = d.reshape(b, t, u, -1).sum(axis=2)
    else:
        # dense-gather formulation: one-hot dispatch over ALL experts (right
        # for prefill, where every expert is live across the batch and the
        # weights stream once; the sharded expert-parallel path shards the
        # expert axis in parallel/)
        def expert_ffn(xin, eid):
            g = qmm(xin, _expert_slice(gate_w, eid), compute_dtype=compute_dtype)
            uu = qmm(xin, _expert_slice(up_w, eid), compute_dtype=compute_dtype)
            return qmm((activate(g, cfg.act) * uu).astype(compute_dtype),
                       _expert_slice(down_w, eid), compute_dtype=compute_dtype)

        onehot = jax.nn.one_hot(sel, e, dtype=jnp.float32) * weights[..., None]  # [B,T,U,E]
        if cfg.moe_weight_before:
            # llama4: router weights scale the expert INPUTS; outputs sum
            # unweighted (build_moe_ffn weight_before_ffn, llama-graph.cpp:841)
            w_full = onehot.sum(axis=2)  # [B,T,E]
            presence = (w_full != 0).astype(jnp.float32)
            outs = jnp.stack(
                [expert_ffn((x.astype(jnp.float32)
                             * w_full[..., eid, None]).astype(compute_dtype), eid)
                 for eid in range(e)], axis=2)  # [B,T,E,D]
            mix = jnp.einsum("bte,bted->btd", presence, outs.astype(jnp.float32))
        else:
            outs = jnp.stack([expert_ffn(x, eid) for eid in range(e)], axis=2)
            mix = jnp.einsum("btue,bted->btd", onehot, outs.astype(jnp.float32))
    if cfg.moe_shared_expert:
        sh = ffn_dense(x, layer, cfg, compute_dtype, tap, "_shexp", layer_idx)
        if cfg.moe_gate_shexp:
            g = qmm(x, layer["ffn_gate_inp_shexp"], compute_dtype=compute_dtype)
            sh = sh * jax.nn.sigmoid(g.astype(jnp.float32)).astype(sh.dtype)
        mix = mix + sh.astype(jnp.float32)
    return mix.astype(x.dtype)


def _expert_slice(w, eid: int):
    from ..ops.pallas.layouts import KernelWeights
    from ..ops.qtensor import QTensor

    if isinstance(w, KernelWeights):
        return w.expert(eid)
    if isinstance(w, QTensor):
        # 3-D expert weights are stored as a leading expert axis on each field
        return QTensor(w.kind, w.shape, {k: a[eid] for k, a in w.arrays.items()})
    return w[eid]


def _layer_rope(cfg: LlamaConfig, layer_idx: int) -> RopeParams:
    """gemma3-style per-layer rope: SWA layers use the local freq base with
    no long-context scaling (reference llm_build_gemma3 rope_freq switch)."""
    if cfg.rope_local_base and cfg.is_swa_layer(layer_idx):
        import dataclasses

        return dataclasses.replace(
            cfg.rope, freq_base=cfg.rope_local_base, freq_scale=1.0, ext_factor=0.0
        )
    return cfg.rope


def self_attention(
    x: jax.Array,  # normed input [B, T, C]
    layer: Params,
    cfg: LlamaConfig,
    positions: jax.Array,
    cache,
    layer_idx: int,
    n_past,
    mask: jax.Array | None,
    compute_dtype,
    tap=None,
    flash: bool = False,
    rope_positions: jax.Array | None = None,  # actual positions when they
    # diverge from cache rows (self-extend seq_div); `positions` stays the
    # row index used for masking/flash lengths
):
    """QKV → rope → cached attention → output proj. Returns (out, cache)."""
    b, t = x.shape[:2]
    (h, hkv), d = cfg.layer_heads(layer_idx), cfg.head_dim
    if flash and t == 1 and tap is None:
        res = _try_attn_fused(x, layer, cfg, positions, cache, layer_idx,
                              n_past, rope_positions, h, hkv, d)
        if res is not None:
            attn, cache = res
            attn = attn.reshape(b, 1, h * d).astype(compute_dtype)
            if cfg.sub_norms:
                attn = norm(attn, layer, "attn_sub_norm", cfg)
            return (_psum_tp(_mm(attn, layer, "attn_output", compute_dtype),
                             cfg), cache)
    q, k, v = _project_qkv(
        x, layer, cfg, positions, rope_positions, layer_idx, compute_dtype, tap
    )
    return _cached_attention(
        q, k, v, layer, cfg, positions, cache, layer_idx, n_past, mask,
        compute_dtype, tap, flash,
    )


def _try_attn_fused(x, layer, cfg, positions, cache, layer_idx, n_past,
                    rope_positions, h, hkv, d):
    """Single-kernel decode attention (ops/pallas/attn_fused: qkv + rope +
    KV-write + flash in one pallas_call) for the plain-llama decode shape.
    Returns (attn [B, H, D] f32, cache') or None to fall back.

    DEFAULT ON for scale-aligned qkv weights (K % 4096 == 0): chip A/B
    7B Q4_0 tg128 151.3-151.5 fused vs 142.3-142.7 unfused (+6.3%,
    three same-window pairs). Misaligned-G shapes (13B K=5120) measured
    −2% across three kernel variants — auto-off there.
    LLAMA_TPU_FUSED_ATTN=1 forces on, =0 (or LLAMA_TPU_NO_FUSED_ATTN)
    forces off."""
    import os

    env = os.environ.get("LLAMA_TPU_FUSED_ATTN", "")
    if env == "0" or os.environ.get("LLAMA_TPU_NO_FUSED_ATTN"):
        return None
    from ..ops.pallas.layouts import KernelWeights
    from ..runtime.kv_cache import KVCache

    fused = layer.get("attn_qkv_fused")
    if not isinstance(fused, KernelWeights):
        return None
    if env != "1" and fused.shape[1] % 4096:
        return None  # misaligned scale lanes: measured −2% (13B) — opt-in
    if "attn_q_bias" in layer or any(
            layer.get(p + "_lora_a") is not None
            for p in ("attn_q", "attn_k", "attn_v")):
        return None
    if (cfg.clamp_kqv or cfg.qk_norm or cfg.qk_norm_weightless
            or cfg.attn_temp_scale or cfg.mrope_sections or cfg.n_kv_heads_l
            or cfg.pos_embd_type != "rope"):
        return None
    if cfg.nope_step and (layer_idx + 1) % cfg.nope_step == 0:
        return None
    if not (cfg.rope_on_full_layers or cfg.is_swa_layer(layer_idx)):
        return None
    rp = _layer_rope(cfg, layer_idx)
    if rp.mode != "norm" or rp.n_dims != d or d != 128:
        return None
    if not isinstance(cache, KVCache) or cache.dtype != jnp.bfloat16:
        return None
    if hkv != cfg.kv_cache_heads or h % hkv or cache.capacity % 128:
        return None
    from ..ops.pallas.attn_fused import attn_decode_fused
    from ..ops.rope import _rope_angles

    bsz = x.shape[0]
    rpos = positions if rope_positions is None else rope_positions
    cos, sin = _rope_angles(rpos[:, 0], rp, layer.get("rope_freqs"))
    cs = jnp.repeat(cos, 2, axis=-1).astype(jnp.float32)
    sn = jnp.repeat(sin, 2, axis=-1).astype(jnp.float32)
    lengths = positions[:, 0] + 1
    starts = None
    if cfg.is_swa_layer(layer_idx):
        if cfg.attn_chunk:
            starts = (positions[:, 0] // cfg.attn_chunk) * cfg.attn_chunk
        else:
            starts = jnp.maximum(lengths - cfg.swa_window, 0)
    write_pos = jnp.broadcast_to(jnp.asarray(n_past, jnp.int32).reshape(-1),
                                 (bsz,))
    scale0 = cfg.attn_scale if cfg.attn_scale else 1.0 / (d**0.5)
    res = attn_decode_fused(
        x[:, 0], fused, cache.k[layer_idx], cache.v[layer_idx], cs, sn,
        lengths, starts, write_pos=write_pos,
        n_heads=h, n_kv_heads=hkv, scale=float(scale0),
        softcap=float(cfg.attn_logit_softcap))
    if res is None:
        return None
    attn, k_new, v_new = res
    return attn, cache._replace_layer(layer_idx, k_new, v_new)


def _project_qkv(
    x: jax.Array,  # normed input [B, T, C]
    layer: Params,
    cfg: LlamaConfig,
    positions: jax.Array,
    rope_positions: jax.Array | None,
    layer_idx: int,
    compute_dtype,
    tap=None,
):
    """QKV projections (+bias/LoRA/fused split), q/k norm, rope.
    Returns (q [B,T,H,D], k [B,T,Hkv,D], v [B,T,Hkv,D])."""
    b, t, _ = x.shape
    (h, hkv), d = cfg.layer_heads(layer_idx), cfg.head_dim

    if tap is not None:
        tap(f"blk.{layer_idx}.attn_q.weight", x)
        tap(f"blk.{layer_idx}.attn_k.weight", x)
        tap(f"blk.{layer_idx}.attn_v.weight", x)
    if "attn_qkv_fused" in layer:
        fused = layer["attn_qkv_fused"]
        nq, nk, _ = fused.sections
        qkv = qmm(x, fused, compute_dtype=compute_dtype)
        q, k, v = qkv[..., :nq], qkv[..., nq : nq + nk], qkv[..., nq + nk :]
        if "attn_q_bias" in layer:
            q = q + layer["attn_q_bias"]
            k = k + layer["attn_k_bias"]
            v = v + layer["attn_v_bias"]
        # hot-swapped LoRA deltas still apply on top of the fused base
        for part_name in ("attn_q", "attn_k", "attn_v"):
            la = layer.get(part_name + "_lora_a")
            if la is not None:
                delta = qmm(qmm(x, la, compute_dtype=compute_dtype),
                            layer[part_name + "_lora_b"],
                            compute_dtype=compute_dtype)
                if part_name == "attn_q":
                    q = q + delta
                elif part_name == "attn_k":
                    k = k + delta
                else:
                    v = v + delta
    else:
        q = _mm(x, layer, "attn_q", compute_dtype)
        k = _mm(x, layer, "attn_k", compute_dtype)
        v = _mm(x, layer, "attn_v", compute_dtype)
    if cfg.clamp_kqv:
        # mpt/olmo f_clamp_kqv: elementwise clip of the qkv projections
        # (reference llm_build_mpt / llm_build_olmo ggml_clamp)
        q = jnp.clip(q, -cfg.clamp_kqv, cfg.clamp_kqv)
        k = jnp.clip(k, -cfg.clamp_kqv, cfg.clamp_kqv)
        v = jnp.clip(v, -cfg.clamp_kqv, cfg.clamp_kqv)
    if cfg.qk_norm and cfg.qk_norm_flat:
        # olmo2: rms over the whole projection BEFORE the head split
        # (llm_build_olmo2 norms the 2-D Qcur/Kcur)
        q = rms_norm(q, layer["attn_q_norm"], cfg.rms_eps)
        k = rms_norm(k, layer["attn_k_norm"], cfg.rms_eps)
    q = q.reshape(b, t, h, d)
    k = k.reshape(b, t, hkv, d)
    v = v.reshape(b, t, hkv, d)
    if cfg.qk_norm and not cfg.qk_norm_flat:
        if cfg.qk_norm_ln:  # chameleon per-head LN with bias (LLM_NORM)
            from ..ops import layer_norm

            q = layer_norm(q, layer.get("attn_q_norm"),
                           layer.get("attn_q_norm_bias"), cfg.rms_eps)
            k = layer_norm(k, layer.get("attn_k_norm"),
                           layer.get("attn_k_norm_bias"), cfg.rms_eps)
        else:
            q = rms_norm(q, layer["attn_q_norm"], cfg.rms_eps)
            k = rms_norm(k, layer["attn_k_norm"], cfg.rms_eps)
    use_rope = cfg.pos_embd_type == "rope" and (
        cfg.rope_on_full_layers or cfg.is_swa_layer(layer_idx)
    )
    if cfg.nope_step and (layer_idx + 1) % cfg.nope_step == 0:
        use_rope = False  # llama4 NoPE layer
    rpos = positions if rope_positions is None else rope_positions
    if use_rope:
        rp = _layer_rope(cfg, layer_idx)
        ff = layer.get("rope_freqs")
        if cfg.mrope_sections:
            from ..ops.rope import apply_mrope

            q = apply_mrope(q, rpos, rp, cfg.mrope_sections, ff)
            k = apply_mrope(k, rpos, rp, cfg.mrope_sections, ff)
        else:
            q = apply_rope(q, rpos, rp, ff)
            k = apply_rope(k, rpos, rp, ff)
        if cfg.qk_norm_weightless:
            # llama4 L2-norm on roped layers only (use_kq_norm branch)
            q = rms_norm(q, None, cfg.rms_eps)
            k = rms_norm(k, None, cfg.rms_eps)
    elif cfg.attn_temp_scale:
        # llama4 NoPE temperature tuning (llm_graph_input_attn_temp):
        # q *= log(floor((pos+1)/floor_scale)+1)·scale + 1
        t = jnp.log(jnp.floor(
            (rpos.astype(jnp.float32) + 1.0) / cfg.attn_temp_floor) + 1.0
        ) * cfg.attn_temp_scale + 1.0
        q = (q.astype(jnp.float32) * t[..., None, None]).astype(q.dtype)
    return q, k, v


def _cached_attention(
    q, k, v, layer, cfg, positions, cache, layer_idx, n_past, mask,
    compute_dtype, tap=None, flash=False,
):
    b, t = q.shape[:2]
    (h, hkv), d = cfg.layer_heads(layer_idx), cfg.head_dim
    cache_heads = cfg.kv_cache_heads
    if cache is not None:
        if hkv < cache_heads:  # openelm: pad ragged layers to the cache size
            pad = [(0, 0), (0, 0), (0, cache_heads - hkv), (0, 0)]
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        cache = cache.write(layer_idx, k, v, n_past)

    scale0 = cfg.attn_scale if cfg.attn_scale else 1.0 / (d**0.5)
    if (
        flash
        and t == 1
        and not cfg.n_kv_heads_l
        and cache is not None
        and cfg.pos_embd_type != "alibi"
        and h % hkv == 0
        and d % 128 == 0  # Mosaic DMA lane alignment
        and cache.capacity % 128 == 0
    ):
        from ..ops.pallas.attention import (
            flash_decode, flash_decode_paged, flash_decode_paged_q8,
            flash_decode_q4, flash_decode_q8,
        )
        from ..runtime.kv_cache import Q4KVCache, QuantKVCache
        from ..runtime.paged_kv import PagedKVCache, PagedQuantKVCache

        lengths = positions[:, 0] + 1
        starts = None
        if cfg.is_swa_layer(layer_idx):
            if cfg.attn_chunk:
                starts = (positions[:, 0] // cfg.attn_chunk) * cfg.attn_chunk
            else:
                starts = jnp.maximum(lengths - cfg.swa_window, 0)
        # paged-q8 scale DMAs slice the lane dim by page → ps must be
        # 128-aligned; otherwise fall through to the dense-gather path
        # NOTE: the contiguous caches hold per-layer buffers, so
        # cache.layer(i) IS the kernel operand — no slice copy. (A stacked
        # [L, ...] cache either forced a 2 MB slice copy per layer per step
        # or, with the kernels' static layer= index, whole-cache
        # copy-insertion against the in-place update: −5% e2e.)
        if (isinstance(cache, PagedQuantKVCache)
                and cache.page_size % 128 == 0):
            attn = flash_decode_paged_q8(
                q[:, 0], *cache.packed_pages(layer_idx),
                cache.tables, lengths, starts,
                scale=float(scale0), softcap=float(cfg.attn_logit_softcap),
            )
        elif isinstance(cache, PagedKVCache):
            attn = flash_decode_paged(
                q[:, 0], cache.k[layer_idx], cache.v[layer_idx],
                cache.tables, lengths, starts,
                scale=float(scale0), softcap=float(cfg.attn_logit_softcap),
            )
        elif isinstance(cache, Q4KVCache) and cache.capacity % 256 == 0:
            attn = flash_decode_q4(
                q[:, 0], *cache.packed_layer(layer_idx), lengths, starts,
                scale=float(scale0), softcap=float(cfg.attn_logit_softcap),
            )
        elif isinstance(cache, QuantKVCache) and cache.capacity % 128 == 0:
            attn = flash_decode_q8(
                q[:, 0], *cache.packed_layer(layer_idx), lengths, starts,
                scale=float(scale0), softcap=float(cfg.attn_logit_softcap),
            )
        elif isinstance(cache, (QuantKVCache, Q4KVCache)):
            k_all, v_all = cache.layer(layer_idx)
            attn = flash_decode(
                q[:, 0], k_all, v_all, lengths, starts,
                scale=float(scale0), softcap=float(cfg.attn_logit_softcap),
            )
        else:
            k_all, v_all = cache.layer(layer_idx)
            attn = flash_decode(
                q[:, 0], k_all, v_all, lengths, starts,
                scale=float(scale0), softcap=float(cfg.attn_logit_softcap),
            )
        attn = attn.reshape(b, 1, h * d).astype(compute_dtype)
        if cfg.sub_norms:  # bitnet attn_sub_norm before the output proj
            attn = norm(attn, layer, "attn_sub_norm", cfg)
        if tap is not None:
            tap(f"blk.{layer_idx}.attn_output.weight", attn)
        return _psum_tp(_mm(attn, layer, "attn_output", compute_dtype), cfg), cache

    if (
        flash
        and t > 1
        and not cfg.n_kv_heads_l
        and cache is not None
        and cfg.pos_embd_type != "alibi"
        and h % hkv == 0
        and d % 128 == 0
        and cache.capacity % 128 == 0
        and jnp.asarray(n_past).ndim == 0  # prefill is single-offset
    ):
        from ..runtime.kv_cache import KVCache as _DenseKV

        import os as _os

        # opt-in until validated on the real chip (LLAMA_TPU_FLASH_PREFILL=1;
        # interpret-mode parity is covered by tests/test_flash_attention.py)
        if (isinstance(cache, _DenseKV)
                and _os.environ.get("LLAMA_TPU_FLASH_PREFILL") == "1"):
            from ..ops.pallas.attention import flash_prefill

            # prefill rows are contiguous from n_past (context.eval_tokens*
            # pads the tail; padded queries attend ≤ their row and are
            # discarded by the caller) — reference fattn prefill tile path
            swa_w = attn_ck = 0
            if cfg.is_swa_layer(layer_idx):
                if cfg.attn_chunk:
                    attn_ck = cfg.attn_chunk
                else:
                    swa_w = cfg.swa_window
            np_vec = jnp.full((b,), jnp.asarray(n_past, jnp.int32))
            attn = flash_prefill(
                q, *cache.layer(layer_idx), np_vec,
                scale=float(scale0), softcap=float(cfg.attn_logit_softcap),
                swa_window=int(swa_w), attn_chunk=int(attn_ck),
            )
            attn = attn.reshape(b, t, h * d).astype(compute_dtype)
            if cfg.sub_norms:
                attn = norm(attn, layer, "attn_sub_norm", cfg)
            if tap is not None:
                tap(f"blk.{layer_idx}.attn_output.weight", attn)
            return _psum_tp(_mm(attn, layer, "attn_output", compute_dtype), cfg), cache

    if cache is not None:
        k_all, v_all = cache.layer(layer_idx)  # [B,Hkv,S,D]
        if hkv < cache_heads:
            k_all = k_all[:, :hkv]
            v_all = v_all[:, :hkv]
    else:
        k_all = k.transpose(0, 2, 1, 3).astype(compute_dtype)
        v_all = v.transpose(0, 2, 1, 3).astype(compute_dtype)

    s = k_all.shape[2]
    if cfg.is_swa_layer(layer_idx) and mask is not None and mask.dtype == jnp.bool_:
        j = jnp.arange(s)
        if cfg.attn_chunk:
            # llama4 chunked attention: keys within the query's own chunk
            # (hparams.n_attn_chunk; stored via the SWA slot upstream)
            start = (positions // cfg.attn_chunk) * cfg.attn_chunk
            mask = mask & (j[None, None, :] >= start[:, :, None])
        else:
            # sliding window: keys within swa_window of the query
            # (reference llama_kv_cache SWA masking, src/llama-graph.h:262-265)
            mask = mask & (j[None, None, :] > positions[:, :, None] - cfg.swa_window)

    head_bias = None
    if cfg.pos_embd_type == "alibi":
        slopes = alibi_slopes(h, cfg.max_alibi_bias)  # [H]
        j = jnp.arange(s, dtype=jnp.float32)
        dist = positions.astype(jnp.float32)[:, :, None] - j[None, None, :]  # [B,T,S]
        head_bias = -slopes[None, :, None, None] * dist[:, None, :, :]

    attn = attention(
        q, k_all, v_all, mask, scale0,
        logit_softcap=cfg.attn_logit_softcap, head_bias=head_bias,
    ).astype(compute_dtype)
    if cfg.sub_norms:  # bitnet attn_sub_norm before the output proj
        attn = norm(attn, layer, "attn_sub_norm", cfg)
    if tap is not None:
        tap(f"blk.{layer_idx}.attn_output.weight", attn)
    return _psum_tp(_mm(attn, layer, "attn_output", compute_dtype), cfg), cache


def packed_self_attention(
    x: jax.Array,  # normed input [1, P, C] — the packed mixed ubatch
    layer: Params,
    cfg: LlamaConfig,
    positions: jax.Array,  # [1, P] cache rows (row == capacity ⇒ padding)
    cache,
    layer_idx: int,
    compute_dtype,
    tap=None,
    *,
    slot_ids: jax.Array,  # [P] owning slot per token
):
    """Attention for a packed prompt+decode ubatch: every token attends only
    to its own slot's cache rows (reference unified-KV kq_mask semantics,
    llm_graph_input_attn_kv_unified::set_input). K/V are scattered at
    (slot, row) before attention; padding rows (== capacity) are dropped by
    the OOB scatter and their outputs are never selected."""
    q, k, v = _project_qkv(
        x, layer, cfg, positions, None, layer_idx, compute_dtype, tap
    )
    p = q.shape[1]
    (h, hkv), d = cfg.layer_heads(layer_idx), cfg.head_dim
    rows = positions[0]
    cache = cache.write_packed(layer_idx, k[0], v[0], slot_ids, rows)
    k_all, v_all = cache.layer(layer_idx)  # [B, Hkv, S, D]
    nb, _, s, _ = k_all.shape

    rep = h // hkv
    scale0 = cfg.attn_scale if cfg.attn_scale else 1.0 / (d**0.5)
    qf = q[0].astype(jnp.float32).reshape(p, hkv, rep, d)
    scores = jnp.einsum(
        "phrd,bhsd->bhrps", qf, k_all.astype(jnp.float32)
    ) * scale0  # [B,Hkv,rep,P,S]
    if cfg.attn_logit_softcap:
        scores = softcap(scores, cfg.attn_logit_softcap)
    j = jnp.arange(s)
    causal = j[None, :] <= rows[:, None]  # [P, S]
    if cfg.is_swa_layer(layer_idx):
        if cfg.attn_chunk:
            causal = causal & (
                j[None, :] >= (rows[:, None] // cfg.attn_chunk) * cfg.attn_chunk)
        else:
            causal = causal & (j[None, :] > rows[:, None] - cfg.swa_window)
    own = slot_ids[None, :] == jnp.arange(nb)[:, None]  # [B, P]
    attend = own[:, :, None] & causal[None]  # [B, P, S]
    bias = jnp.where(attend, 0.0, _mask_value(jnp.float32))
    scores = scores + bias[:, None, None, :, :]
    probs = softmax_f32(scores, axis=-1)
    out = jnp.einsum("bhrps,bhsd->bhrpd", probs, v_all.astype(jnp.float32))
    # gather each token's own slot (rows of foreign slots are softmax(-inf)
    # garbage — a pure gather never mixes them in)
    out = out.transpose(0, 3, 1, 2, 4)  # [B,P,Hkv,rep,D]
    sel = jnp.take_along_axis(
        out, slot_ids[None, :, None, None, None], axis=0
    )[0]  # [P,Hkv,rep,D]
    attn = sel.reshape(1, p, h * d).astype(compute_dtype)
    if cfg.sub_norms:
        attn = norm(attn, layer, "attn_sub_norm", cfg)
    if tap is not None:
        tap(f"blk.{layer_idx}.attn_output.weight", attn)
    return _psum_tp(_mm(attn, layer, "attn_output", compute_dtype), cfg), cache


def decode_layer(
    x: jax.Array,  # [B, T, C]
    layer: Params,
    cfg: LlamaConfig,
    positions: jax.Array,  # [B, T]
    cache,  # KVCache | None
    layer_idx: int,
    n_past,  # traced int scalar: write offset into the cache
    mask: jax.Array | None,
    compute_dtype,
    tap=None,  # optional callable(name, activation) — imatrix/eval-callback
    flash: bool = False,
    rope_positions: jax.Array | None = None,
    attn_impl=None,  # override (packed mixed ubatch); default per-arch
):
    h_l, hkv_l = cfg.layer_heads(layer_idx)
    attn_in = x if cfg.norm_after else norm(x, layer, "attn_norm", cfg)
    if attn_impl is None and not cfg.kv_lora_rank and h_l == 0:
        # deci/nemotron-51B attention-free layer (llm_build_deci n_head==0):
        # no attention, no attention residual — FFN applies to the raw input
        def ffn_only(ffn_in):
            if cfg.n_expert > 0 and "ffn_gate_exps" in layer:
                return ffn_moe(ffn_in, layer, cfg, compute_dtype, tap, layer_idx)
            return ffn_dense(ffn_in, layer, cfg, compute_dtype, tap, "", layer_idx)

        ffn_in = x if cfg.norm_after else norm(x, layer, "ffn_norm", cfg)
        x = x + ffn_only(ffn_in) * cfg.residual_scale
        return x, cache
    if attn_impl is None and not cfg.kv_lora_rank and hkv_l == 0:
        # deci "linear attention" (n_head>0, n_head_kv==0): wo projection only
        attn = _mm(attn_in, layer, "attn_output", compute_dtype)
    elif attn_impl is not None:
        attn, cache = attn_impl(
            attn_in, layer, cfg, positions, cache, layer_idx, compute_dtype, tap,
        )
    elif cfg.kv_lora_rank:
        from .deepseek2 import mla_self_attention as mla_impl

        attn, cache = mla_impl(
            attn_in, layer, cfg, positions, cache, layer_idx, n_past, mask,
            compute_dtype, tap, flash=flash,
        )
    else:
        attn, cache = self_attention(
            attn_in, layer, cfg, positions, cache, layer_idx, n_past, mask,
            compute_dtype, tap, flash, rope_positions,
        )
    if cfg.post_norms:
        attn = norm(attn, layer, "attn_post_norm", cfg)
    if cfg.norm_after:
        attn = norm(attn, layer, "attn_norm", cfg)

    if "ffn_norm_exps" in layer:
        # arctic residual-MoE layer (reference llm_build_arctic,
        # src/llama-model.cpp:9722): dense FFN over the post-attention
        # stream, PLUS a parallel MoE branch over the normed LAYER INPUT
        # (inpSA); out = (ffn_inp + dense) + moe
        ffn_inp = x + attn * cfg.residual_scale
        dense = ffn_dense(norm(ffn_inp, layer, "ffn_norm", cfg), layer, cfg,
                          compute_dtype, tap, "", layer_idx)
        moe = ffn_moe(norm(x, layer, "ffn_norm_exps", cfg), layer, cfg,
                      compute_dtype, tap, layer_idx)
        x = ffn_inp + dense + moe.astype(ffn_inp.dtype)
        if "cvec" in layer:
            x = x + layer["cvec"].astype(x.dtype)
        if tap is not None:
            tap(f"l_out-{layer_idx}", x)
        return x, cache

    def ffn_fn(ffn_in):
        # per-layer MoE decision: deepseek keeps the first n_dense_layers
        # dense (reference llm_build_deepseek2 il < n_layer_dense_lead)
        if cfg.n_expert > 0 and "ffn_gate_exps" in layer:
            return ffn_moe(ffn_in, layer, cfg, compute_dtype, tap, layer_idx)
        return ffn_dense(ffn_in, layer, cfg, compute_dtype, tap, "", layer_idx)

    if cfg.parallel_residual:
        # gptneox/phi2/command-r: attn and ffn both branch off the same input
        # (reference llm_build_gptneox par_res path / llm_build_command_r)
        ffn_in = norm(x, layer, "ffn_norm", cfg) if "ffn_norm" in layer else attn_in
        ffn = ffn_fn(ffn_in)
        x = x + (attn + ffn) * cfg.residual_scale
        if "cvec" in layer:
            x = x + layer["cvec"].astype(x.dtype)
        return x, cache

    x = x + attn * cfg.residual_scale
    ffn_in = x if cfg.norm_after else norm(x, layer, "ffn_norm", cfg)
    ffn = ffn_fn(ffn_in)
    if cfg.post_norms:
        ffn = norm(ffn, layer, "ffn_post_norm", cfg)
    if cfg.norm_after:
        ffn = norm(ffn, layer, "ffn_norm", cfg)
    x = x + ffn * cfg.residual_scale
    if "cvec" in layer:  # control vector (reference llama_adapter_cvec)
        x = x + layer["cvec"].astype(x.dtype)
    if tap is not None:  # residual-stream tap (cvector-generator's l_out)
        tap(f"l_out-{layer_idx}", x)
    return x, cache


def forward(
    params: Params,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [B, T]
    positions: jax.Array,  # [B, T]
    cache=None,  # KVCache | None
    n_past=0,  # traced int scalar: cache write offset
    mask: jax.Array | None = None,  # [B, T, S] bool
    *,
    compute_dtype=jnp.bfloat16,
    tap=None,
    flash: bool = False,  # fused decode attention kernel (TPU, T=1)
    rope_positions: jax.Array | None = None,  # positions for rope when they
    # differ from cache-row indices (post-seq_div self-extend)
    return_hidden: bool = False,  # final-norm hidden states (embeddings path)
    input_embd: jax.Array | None = None,  # [B, T, C] — llava image embeds
    # bypass the token embedding (reference llava_eval_image_embed path)
):
    """Returns (logits [B, T, n_vocab] f32, updated cache)."""
    if input_embd is not None:
        x = input_embd.astype(compute_dtype)
    else:
        x = take_rows(params["token_embd"], tokens, dtype=compute_dtype)
    if cfg.embd_scale != 1.0:
        x = x * jnp.asarray(cfg.embd_scale, compute_dtype)
    if cfg.pos_embd_type == "learned":
        rpos = positions if rope_positions is None else rope_positions
        x = x + take_rows(params["pos_embd"], rpos, dtype=compute_dtype)
    if cfg.embd_norm:
        x = norm(x, params, "token_embd_norm", cfg)
    for i, layer in enumerate(params["layers"]):
        x, cache = decode_layer(
            x, layer, cfg, positions, cache, i, n_past, mask, compute_dtype,
            tap, flash, rope_positions,
        )
    x = norm(x, params, "output_norm", cfg)
    if return_hidden:
        return x.astype(jnp.float32), cache
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    if tap is not None:
        tap("output.weight", x)
    logits = qmm(x, out_w, compute_dtype=compute_dtype)
    if "output_bias" in params:
        logits = logits + params["output_bias"]
    logits = logits.astype(jnp.float32)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap:
        logits = softcap(logits, cfg.final_logit_softcap)
    if cfg.suppress_tokens:
        # chameleon text-only image-token suppression
        # (llm_build_chameleon img_logits, src/llama-model.cpp:12236-12246)
        a, bnd = cfg.suppress_tokens
        vid = jnp.arange(logits.shape[-1])
        kill = (vid >= a) & (vid < bnd)
        logits = jnp.where(kill, jnp.finfo(jnp.float32).min, logits)
    return logits, cache


def forward_packed(
    params: Params,
    cfg: LlamaConfig,
    tokens: jax.Array,  # [P] packed mixed ubatch (decode tokens + one
    # prompt chunk; padding tokens carry row == cache capacity)
    slot_ids: jax.Array,  # [P]
    rows: jax.Array,  # [P] cache row per token (== its position)
    cache,
    out_idx: jax.Array,  # [n_slots] packed index whose logits each slot needs
    *,
    compute_dtype=jnp.bfloat16,
):
    """Mixed prompt+decode step over ONE packed token list — the TPU-native
    equivalent of the reference server's update_slots batch (server.cpp:2847:
    generating slots' last tokens + prompt chunks in a single llama_decode).
    One pass over the weights serves every slot; only `out_idx`'s hidden rows
    reach the lm_head (inp_out_ids role, llama-graph.h build_inp_out_ids).
    Returns (logits [n_slots, V] f32, cache)."""
    x = take_rows(params["token_embd"], tokens[None, :], dtype=compute_dtype)
    if cfg.embd_scale != 1.0:
        x = x * jnp.asarray(cfg.embd_scale, compute_dtype)
    if cfg.pos_embd_type == "learned":
        x = x + take_rows(params["pos_embd"],
                          jnp.minimum(rows, params["pos_embd"].shape[0] - 1)[None],
                          dtype=compute_dtype)
    if cfg.embd_norm:
        x = norm(x, params, "token_embd_norm", cfg)
    positions = rows[None, :]
    for i, layer in enumerate(params["layers"]):
        attn_impl = partial(packed_self_attention, slot_ids=slot_ids)
        x, cache = decode_layer(
            x, layer, cfg, positions, cache, i, 0, None, compute_dtype,
            attn_impl=attn_impl,
        )
    x = norm(x, params, "output_norm", cfg)
    sel = jnp.take_along_axis(x[0], out_idx[:, None], axis=0)  # [n_slots, C]
    out_w = params.get("output")
    if out_w is None:
        out_w = params["token_embd"]
    logits = qmm(sel, out_w, compute_dtype=compute_dtype).astype(jnp.float32)
    if "output_bias" in params:
        logits = logits + params["output_bias"]
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap:
        logits = softcap(logits, cfg.final_logit_softcap)
    if cfg.suppress_tokens:
        a, bnd = cfg.suppress_tokens
        vid = jnp.arange(logits.shape[-1])
        logits = jnp.where((vid >= a) & (vid < bnd),
                           jnp.finfo(jnp.float32).min, logits)
    return logits, cache
