"""Synthetic models: random packed QTensors with realistic shapes.

Used by bench.py and __graft_entry__.py — performance and compile checks
don't depend on weight values, and generating random packed bits is orders
of magnitude faster than running the real quantizer fits over billions of
parameters.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGML_TYPE_TRAITS, GGMLType
from ..models.llama import LlamaConfig
from ..ops.qtensor import QTensor, repack
from ..ops.rope import RopeParams

# flagship configs (shapes from the reference's target model zoo)
LLAMA3_8B = LlamaConfig(
    arch="llama", n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8, head_dim=128,
    n_ff=14336, n_vocab=128256, n_ctx_train=8192, rms_eps=1e-5,
    rope=RopeParams(n_dims=128, mode="norm", freq_base=500000.0),
)
TINYLLAMA_1B = LlamaConfig(
    arch="llama", n_layers=22, n_embd=2048, n_heads=32, n_kv_heads=4, head_dim=64,
    n_ff=5632, n_vocab=32000, n_ctx_train=2048, rms_eps=1e-5,
    rope=RopeParams(n_dims=64, mode="norm", freq_base=10000.0),
)
LLAMA2_7B = LlamaConfig(
    arch="llama", n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=32, head_dim=128,
    n_ff=11008, n_vocab=32000, n_ctx_train=4096, rms_eps=1e-5,
    rope=RopeParams(n_dims=128, mode="norm", freq_base=10000.0),
)
MIXTRAL_8X7B = LlamaConfig(
    arch="llama", n_layers=32, n_embd=4096, n_heads=32, n_kv_heads=8, head_dim=128,
    n_ff=14336, n_vocab=32000, n_ctx_train=32768, rms_eps=1e-5,
    rope=RopeParams(n_dims=128, mode="norm", freq_base=1000000.0),
    n_expert=8, n_expert_used=2,
)
LLAMA2_13B = LlamaConfig(
    arch="llama", n_layers=40, n_embd=5120, n_heads=40, n_kv_heads=40, head_dim=128,
    n_ff=13824, n_vocab=32000, n_ctx_train=4096, rms_eps=1e-5,
    rope=RopeParams(n_dims=128, mode="norm", freq_base=10000.0),
)
LLAMA3_70B = LlamaConfig(
    arch="llama", n_layers=80, n_embd=8192, n_heads=64, n_kv_heads=8, head_dim=128,
    n_ff=28672, n_vocab=128256, n_ctx_train=8192, rms_eps=1e-5,
    rope=RopeParams(n_dims=128, mode="norm", freq_base=500000.0),
)

# mixtral-shaped MoE that fits one 16GB v5e chip at Q4_K (~4.4 GB weights;
# the real 8x7B is ~29 GB — a single-chip MoE bench needs this scale)
MOE_8X2B = LlamaConfig(
    arch="llama", n_layers=24, n_embd=2048, n_heads=16, n_kv_heads=8,
    head_dim=128, n_ff=5632, n_vocab=32000, n_ctx_train=32768, rms_eps=1e-5,
    rope=RopeParams(n_dims=128, mode="norm", freq_base=1000000.0),
    n_expert=8, n_expert_used=2,
)

CONFIGS = {
    "llama3-8b": LLAMA3_8B,
    "tinyllama-1.1b": TINYLLAMA_1B,
    "llama2-7b": LLAMA2_7B,
    "llama2-13b": LLAMA2_13B,
    "mixtral-8x7b": MIXTRAL_8X7B,
    "mixtral-8x2b": MOE_8X2B,
    "llama3-70b": LLAMA3_70B,
}


def tiny_config(**overrides) -> LlamaConfig:
    base = dict(
        arch="llama", n_layers=2, n_embd=256, n_heads=8, n_kv_heads=8, head_dim=32,
        n_ff=512, n_vocab=512, n_ctx_train=512, rms_eps=1e-5,
    )
    base.update(overrides)
    base.setdefault(
        "rope", RopeParams(n_dims=base["head_dim"], mode="norm", freq_base=10000.0)
    )
    return LlamaConfig(**base)


def synth_qtensor(
    rng: np.random.Generator, kind: GGMLType, shape: tuple[int, ...]
) -> QTensor:
    """Random packed blocks with small finite scales (half-sane dequant)."""
    n = int(np.prod(shape))
    tr = GGML_TYPE_TRAITS[kind]
    raw = rng.integers(0, 256, size=n // tr.block_size * tr.type_size, dtype=np.uint8)
    from ..ops.qtensor import TABLE_KINDS, from_gguf_tensor

    def _pack(raw, kind, shape2):
        if kind in TABLE_KINDS:  # table carrier builds via the decompose
            qt = from_gguf_tensor(raw, kind, shape2)
            # random f16 block scales may be inf/nan — replaced below
            qt.arrays["d"] = np.nan_to_num(qt.arrays["d"], nan=0.0,
                                           posinf=0.0, neginf=0.0)
            return qt
        return repack(raw, kind, shape2)

    if len(shape) == 3:
        e, rows, k = shape
        qt = _pack(raw, kind, (e * rows, k))
        arrays = {key: a.reshape(e, rows, *a.shape[1:]) for key, a in qt.arrays.items()}
        qt = QTensor(kind, (rows, k), arrays, n_expert=e)
    else:
        qt = _pack(raw, kind, shape)
    # overwrite scale fields with small positive halves so activations stay finite
    for name in ("d", "dmin", "m"):
        if name in qt.arrays:
            a = qt.arrays[name]
            vals = (rng.random(a.shape, dtype=np.float32) * 0.02).astype(a.dtype)
            qt.arrays[name] = vals
    return qt


def synth_params(cfg: LlamaConfig, kind: GGMLType, *, seed: int = 0, tie: bool = True):
    """Random parameters honoring every arch flag in `cfg` (biases, post
    norms, shared experts, learned positions, …) so any registered arch can
    be synthesized for tests and benches."""
    rng = np.random.default_rng(seed)
    c, ff, v = cfg.n_embd, cfg.n_ff, cfg.n_vocab
    ln = cfg.norm_type == "ln"

    def q(*shape):
        return synth_qtensor(rng, kind, shape)

    def norm(dim):
        return np.ones(dim, np.float32)

    def bias(dim):
        return (rng.standard_normal(dim) * 0.01).astype(np.float32)

    layers = []
    for il in range(cfg.n_layers):
        h, hkv = cfg.layer_heads(il)
        qdim = h * cfg.head_dim
        kvdim = hkv * cfg.head_dim
        if cfg.kv_lora_rank:
            r, dn, dr, dv = (cfg.kv_lora_rank, cfg.qk_nope_dim,
                             cfg.qk_rope_dim, cfg.v_head_dim)
            layer = {
                "attn_norm": norm(c),
                "attn_kv_a_mqa": q(r + dr, c),
                "attn_kv_a_norm": norm(r),
                "attn_kv_b": (rng.standard_normal(
                    (cfg.n_heads * (dn + dv), r)) * 0.02).astype(np.float32),
                "attn_output": q(c, cfg.n_heads * dv),
            }
            if cfg.q_lora_rank:
                layer["attn_q_a"] = q(cfg.q_lora_rank, c)
                layer["attn_q_a_norm"] = norm(cfg.q_lora_rank)
                layer["attn_q_b"] = q(cfg.n_heads * (dn + dr), cfg.q_lora_rank)
            else:
                layer["attn_q"] = q(cfg.n_heads * (dn + dr), c)
        elif h == 0:  # deci attention-free layer
            layer = {}
        elif hkv == 0:  # deci linear attention: wo only
            layer = {"attn_norm": norm(c), "attn_output": q(c, c)}
        else:
            layer = {
                "attn_norm": norm(c),
                "attn_q": q(qdim, c),
                "attn_k": q(kvdim, c),
                "attn_v": q(kvdim, c),
                "attn_output": q(c, qdim),
            }
        if ln:
            layer["attn_norm_bias"] = bias(c)
        if cfg.attn_bias:
            layer["attn_q_bias"] = bias(qdim)
            layer["attn_k_bias"] = bias(kvdim)
            layer["attn_v_bias"] = bias(kvdim)
        if cfg.qk_norm and cfg.qk_norm_flat:
            layer["attn_q_norm"] = norm(qdim)
            layer["attn_k_norm"] = norm(kvdim)
        elif cfg.qk_norm and cfg.qk_norm_ln:
            # chameleon: per-head LN weights [H, D] (reference
            # src/llama-model.cpp:3872 {n_embd_head_k, n_head})
            layer["attn_q_norm"] = norm((cfg.n_heads, cfg.head_dim))
            layer["attn_k_norm"] = norm((cfg.n_kv_heads, cfg.head_dim))
            layer["attn_q_norm_bias"] = bias((cfg.n_heads, cfg.head_dim))
            layer["attn_k_norm_bias"] = bias((cfg.n_kv_heads, cfg.head_dim))
        elif cfg.qk_norm:
            layer["attn_q_norm"] = norm(cfg.head_dim)
            layer["attn_k_norm"] = norm(cfg.head_dim)
        if cfg.sub_norms:
            layer["attn_sub_norm"] = norm(qdim)
            layer["ffn_sub_norm"] = norm(ff)
            for wname in ("attn_q", "attn_k", "attn_v", "attn_output",
                          "ffn_gate", "ffn_up", "ffn_down"):
                layer[wname + "_scale"] = np.full(1, 1.0 + il * 0.01, np.float32)
        if cfg.post_norms:
            layer["attn_post_norm"] = norm(c)
            layer["ffn_post_norm"] = norm(c)
        if not (cfg.parallel_residual and cfg.arch in ("phi2", "command-r", "cohere2")):
            layer["ffn_norm"] = norm(c)
            if ln:
                layer["ffn_norm_bias"] = bias(c)
        if cfg.n_expert and il >= cfg.n_dense_layers:
            layer["ffn_gate_inp"] = (rng.standard_normal((cfg.n_expert, c)) * 0.02).astype(
                np.float32
            )
            layer["ffn_gate_exps"] = q(cfg.n_expert, ff, c)
            layer["ffn_up_exps"] = q(cfg.n_expert, ff, c)
            layer["ffn_down_exps"] = q(cfg.n_expert, c, ff)
            if cfg.moe_shared_expert:
                layer["ffn_gate_shexp"] = q(ff, c)
                layer["ffn_up_shexp"] = q(ff, c)
                layer["ffn_down_shexp"] = q(c, ff)
                if cfg.moe_gate_shexp:
                    layer["ffn_gate_inp_shexp"] = (
                        rng.standard_normal((1, c)) * 0.02
                    ).astype(np.float32)
        else:
            if cfg.gated_ffn:
                layer["ffn_gate"] = q(ff, c)
            layer["ffn_up"] = q(ff, c)
            layer["ffn_down"] = q(c, ff)
            if ln:
                layer["ffn_up_bias"] = bias(ff)
                layer["ffn_down_bias"] = bias(c)
        layers.append(layer)
    params = {
        "token_embd": q(v, c),
        "layers": layers,
        "output_norm": norm(c),
    }
    if ln:
        params["output_norm_bias"] = bias(c)
    if cfg.pos_embd_type == "learned":
        params["pos_embd"] = (rng.standard_normal((cfg.n_ctx_train, c)) * 0.02).astype(
            np.float32
        )
    if cfg.embd_norm:
        params["token_embd_norm"] = norm(c)
        if ln:
            params["token_embd_norm_bias"] = bias(c)
    if not (tie or cfg.tie_embeddings):
        params["output"] = q(v, c)
    return params


def chain_map(n_vocab: int, *, map_seed: int = 7, rho: float = 0.0,
              rho_seed: int = 11) -> np.ndarray:
    """Deterministic next-token map m: greedy(token t) == m[t].

    rho=0 is a random permutation of the vocab; rho>0 remaps a ρ-fraction
    of entries to OTHER random targets — a draft built with the perturbed
    map disagrees with the target on ≈ρ of chain positions, which makes
    speculative-decoding acceptance a *known* quantity measurable through
    the real verify machinery (random synth weights give acceptance ≈ 0
    for any draft ≠ target; see BENCH notes)."""
    rng = np.random.default_rng(map_seed)
    m = rng.permutation(n_vocab).astype(np.int64)
    if rho > 0:
        prng = np.random.default_rng(rho_seed)
        hit = prng.random(n_vocab) < rho
        m = m.copy()
        m[hit] = prng.integers(0, n_vocab, int(hit.sum()))
    return m


def synth_params_chain(cfg: LlamaConfig, kind: GGMLType, *, seed: int = 0,
                       next_map: np.ndarray | None = None):
    """Synthetic weights whose GREEDY DECODE follows a known token chain.

    Perf-representative speculative-decoding benches need a (target, draft)
    pair with controllable agreement. Construction: every layer's residual
    contribution is zeroed (attn_output / ffn_down scale fields = 0, so the
    packed blocks dequantize to exactly 0 — the full weight bytes still
    stream through the kernels, keeping per-step cost identical to
    `synth_params`), hence the pre-head residual is exactly the token
    embedding; the lm_head is built so emb[t] · head[v] peaks at
    v == next_map[t] (head[v] = Σ_{t: m[t]=v} emb_dequant[t], diag margin
    ‖emb‖² ≈ C·σ² vs off-diag ≈ σ²·√C). Mirrors the role of the reference
    speculative example's model pairing (common/speculative.cpp:24-278)
    without real weights (zero-egress environment)."""
    from ..ops.qtensor import from_gguf_tensor
    from ..quant import dequantize, quantize

    params = synth_params(cfg, kind, seed=seed, tie=False)
    for layer in params["layers"]:
        for name in ("attn_output", "ffn_down", "ffn_down_exps",
                     "ffn_down_shexp"):
            qt = layer.get(name)
            if qt is None:
                continue
            for f in ("d", "dmin", "m"):
                if f in qt.arrays:
                    qt.arrays[f] = np.zeros_like(qt.arrays[f])
    v, c = cfg.n_vocab, cfg.n_embd
    rng = np.random.default_rng(seed + 101)
    emb_f = (rng.standard_normal((v, c)) * 0.05).astype(np.float32)
    emb_raw = quantize(emb_f, kind)
    params["token_embd"] = from_gguf_tensor(emb_raw, kind, (v, c))
    emb_q = np.asarray(dequantize(emb_raw, kind, (v, c)), np.float32)
    if next_map is None:
        next_map = chain_map(v)
    head = np.zeros((v, c), np.float32)
    np.add.at(head, np.asarray(next_map, np.int64), emb_q)
    params["output"] = from_gguf_tensor(quantize(head, kind), kind, (v, c))
    return params
