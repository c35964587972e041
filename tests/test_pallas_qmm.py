"""Fused Pallas dequant-matmul vs the XLA dequant path (test-backend-ops
style: per-op NMSE tolerance against the reference device)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf import GGMLType
from llama_cpp_dsp_tpu.ops.qtensor import from_gguf_tensor
from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout
from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_fused
from llama_cpp_dsp_tpu.quant import quantize
from llama_cpp_dsp_tpu.quant.jax_dequant import dequant

KINDS = [
    GGMLType.Q8_0,
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
    # table-carrier kinds (exact nibble-index decompose, ops/qtensor.py)
    GGMLType.IQ2_XXS,
    GGMLType.IQ2_XS,
    GGMLType.IQ2_S,
    GGMLType.IQ3_XXS,
    GGMLType.IQ3_S,
    GGMLType.IQ1_S,
    GGMLType.IQ1_M,
    GGMLType.TQ1_0,
    GGMLType.TQ2_0,
]


def nmse(got, want):
    d = got.astype(np.float64) - want.astype(np.float64)
    denom = (want.astype(np.float64) ** 2).mean() + 1e-12
    return float((d * d).mean() / denom)


@pytest.mark.parametrize("kind", KINDS)
@pytest.mark.parametrize("b", [1, 5])
def test_qmm_fused_matches_xla(kind, b, rng):
    n, k = 256, 512
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    raw = quantize(w, kind)
    qt = from_gguf_tensor(raw, kind, (n, k))
    kw = to_kernel_layout(qt)
    x = rng.standard_normal((b, k)).astype(np.float32)

    # exact f32 reference; 5e-4 NMSE matches reference test-backend-ops
    # MUL_MAT tolerance (tests/test-backend-ops.cpp:333)
    wd = np.asarray(dequant(qt, jnp.float32))
    want = x @ wd.T
    got = np.asarray(qmm_fused(jnp.asarray(x), kw, tile_b=8, tile_n=128, tile_k=256))
    assert got.shape == (b, n)
    err = nmse(got, want)
    assert err < 5e-4, f"{kind.name}: NMSE {err}"
    # and the fused path must be no worse than the XLA bf16 dequant path
    xla = np.asarray(
        jnp.einsum(
            "bk,nk->bn",
            jnp.asarray(x, jnp.bfloat16),
            jnp.asarray(dequant(qt, jnp.bfloat16)),
            preferred_element_type=jnp.float32,
        )
    )
    # offset folding changes the bf16 rounding profile slightly vs the
    # dequantize-then-matmul XLA path; the binding gate is the reference
    # MUL_MAT tolerance above (5e-4), this is a sanity ratio
    assert err < 64 * max(nmse(xla, want), 1e-7), \
        f"{kind.name}: fused {err} vs xla {nmse(xla, want)}"


def test_qmm_3d_input(rng):
    n, k = 128, 256
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    qt = from_gguf_tensor(quantize(w, GGMLType.Q8_0), GGMLType.Q8_0, (n, k))
    kw = to_kernel_layout(qt)
    x = rng.standard_normal((2, 3, k)).astype(np.float32)
    y = np.asarray(qmm_fused(jnp.asarray(x), kw, tile_b=8, tile_n=128, tile_k=256))
    assert y.shape == (2, 3, n)
    want = x.reshape(6, k) @ np.asarray(dequant(qt, jnp.float32)).T
    assert nmse(y, want.reshape(2, 3, n)) < 1e-4


def test_ragged_n_row_padding(rng, monkeypatch):
    """N not divisible by 512 (the llama3 vocab head case) pads rows at
    layout time so wide tiles apply; output is sliced back to logical N."""
    from llama_cpp_dsp_tpu.ops.pallas import layouts

    monkeypatch.setattr(layouts, "PAD_ROWS_MAX_PCT", 10.0)
    n, k = 1408, 512  # 1408 % 512 = 384 → pads to 1536 under the 10% cap
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    qt = from_gguf_tensor(quantize(w, GGMLType.Q4_K), GGMLType.Q4_K, (n, k))
    kw = to_kernel_layout(qt)
    assert kw.shape == (n, k)
    assert kw.arrays["qs"].shape[0] == 1536  # padded rows
    x = rng.standard_normal((3, k)).astype(np.float32)
    got = np.asarray(qmm_fused(jnp.asarray(x), kw))
    assert got.shape == (3, n)
    want = x @ np.asarray(dequant(qt, jnp.float32)).T
    assert nmse(got, want) < 5e-4


def _expert_qtensor(rng, e, n, k, kind):
    """Stacked per-expert QTensor (leading expert axis on every field)."""
    from llama_cpp_dsp_tpu.ops.qtensor import QTensor

    subs, dense = [], []
    for _ in range(e):
        w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
        qt = from_gguf_tensor(quantize(w, kind), kind, (n, k))
        subs.append(qt)
        dense.append(np.asarray(dequant(qt, jnp.float32)))
    arrays = {key: np.stack([np.asarray(s.arrays[key]) for s in subs])
              for key in subs[0].arrays}
    return QTensor(kind, (n, k), arrays, n_expert=e), np.stack(dense)


@pytest.mark.parametrize("kind", [GGMLType.Q8_0, GGMLType.Q4_0,
                                  GGMLType.Q4_K, GGMLType.Q6_K])
def test_qmm_expert_rows(rng, kind):
    """Selected-expert GEMV (MUL_MAT_ID role): per-row expert id indexes the
    stacked kernel layout via scalar prefetch."""
    from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout_experts
    from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_expert_rows

    e, n, k, s = 4, 256, 512, 6
    qt, dense = _expert_qtensor(rng, e, n, k, kind)
    kw = to_kernel_layout_experts(qt, tile_k=256)
    assert kw.n_expert == e
    x = rng.standard_normal((s, k)).astype(np.float32)
    sel = np.array([0, 3, 1, 1, 2, 0], np.int32)
    got = np.asarray(qmm_expert_rows(jnp.asarray(x), kw, jnp.asarray(sel),
                                     tile_n=128))
    want = np.stack([x[i] @ dense[sel[i]].T for i in range(s)])
    assert got.shape == (s, n)
    assert nmse(got, want) < 5e-4


def test_kernel_expert_static_slice(rng):
    """kw.expert(eid) (dense-all prefill path) matches qmm_fused on the
    per-expert layout."""
    from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout_experts
    from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_fused

    e, n, k = 3, 128, 512
    qt, dense = _expert_qtensor(rng, e, n, k, GGMLType.Q4_K)
    kw = to_kernel_layout_experts(qt, tile_k=256)
    x = rng.standard_normal((2, k)).astype(np.float32)
    for eid in range(e):
        got = np.asarray(qmm_fused(jnp.asarray(x), kw.expert(eid),
                                   tile_b=8, tile_n=128, tile_k=256))
        assert nmse(got, x @ dense[eid].T) < 5e-4


@pytest.mark.parametrize("t", [1, 48])  # 1 → selected-expert kernel; 48 → dense-all
def test_moe_forward_kernel_parity(rng, t):
    """ffn_moe through expert KernelWeights (both decode GEMV and dense-all
    prefill branches) matches the XLA QTensor path."""
    from llama_cpp_dsp_tpu.models.llama import forward
    from llama_cpp_dsp_tpu.models.registry import synth_config
    from llama_cpp_dsp_tpu.runtime.context import convert_params_to_kernel
    from llama_cpp_dsp_tpu.tools.synth import synth_params

    cfg = synth_config("llama", n_embd=256, n_heads=4, n_kv_heads=2,
                       head_dim=64, n_ff=512, n_vocab=128, n_expert=4,
                       n_expert_used=2)
    params = synth_params(cfg, GGMLType.Q4_K, seed=0, tie=False)
    kparams = convert_params_to_kernel(params)
    from llama_cpp_dsp_tpu.ops.pallas.layouts import KernelWeights

    assert isinstance(kparams["layers"][0]["ffn_gate_exps"], KernelWeights)

    toks = np.asarray(rng.integers(0, 128, (1, t)), np.int32)
    pos = np.arange(t, dtype=np.int32)[None]
    mask = np.tril(np.ones((1, t, t), bool))
    l1, _ = forward(params, cfg, jnp.asarray(toks), jnp.asarray(pos),
                    mask=jnp.asarray(mask), compute_dtype=jnp.float32)
    l2, _ = forward(kparams, cfg, jnp.asarray(toks), jnp.asarray(pos),
                    mask=jnp.asarray(mask), compute_dtype=jnp.float32)
    assert nmse(np.asarray(l2), np.asarray(l1)) < 2e-4


@pytest.mark.parametrize("kind", [GGMLType.Q4_K, GGMLType.Q6_K,
                                  GGMLType.Q4_0, GGMLType.Q8_0,
                                  GGMLType.Q2_K])
def test_subk_chunked_body_matches(rng, kind):
    """n_sub>1 (sub-K chunked dequant, VMEM-saving path for whole-K wide
    tiles) matches the single-pass kernel to accumulation-order noise."""
    from llama_cpp_dsp_tpu.ops.pallas.layouts import prepare_x, to_kernel_layout
    from llama_cpp_dsp_tpu.ops.pallas.qmm import _W_FIELDS, _qmm_call
    from llama_cpp_dsp_tpu.tools.synth import synth_qtensor

    n, k = 512, 8192
    qt = synth_qtensor(np.random.default_rng(1), kind, (n, k))
    kw = to_kernel_layout(qt, tile_k=k)
    x = jnp.asarray(rng.standard_normal((8, k)), jnp.float32)
    xf = prepare_x(x, kind, k)
    wf = tuple(kw.arrays[name] for name in _W_FIELDS[kind])
    y1 = np.asarray(_qmm_call(xf, wf, kind=kind, n=n, k=k, tile_b=8,
                              tile_n=256, tile_k=k, n_sub=1))
    for ns in (2, 4):
        y = np.asarray(_qmm_call(xf, wf, kind=kind, n=n, k=k, tile_b=8,
                                 tile_n=512, tile_k=k, n_sub=ns))
        assert nmse(y, y1) < 1e-10, (kind, ns)


@pytest.mark.parametrize("kind,k", [
    (GGMLType.Q4_0, 5120),   # 13B qkv/o/gate_up K: G=160 → G1=128 + 32
    (GGMLType.Q8_0, 5120),
    (GGMLType.IQ4_NL, 5120),
    (GGMLType.Q4_1, 6912),   # half the 13B ffn K: G=216 → G1=128 + 88
])
def test_qmm_split_g_layout(kind, k, rng):
    """Split-G position ordering (layouts.split_g): K values whose per-tile
    group count is not a 128 multiple (13B's K=5120/13824) reorder each
    tile [e·G1+g | e·G2+g'] so the kernel's scale expand runs aligned.
    Must be numerically identical to the contiguous layout's results."""
    from llama_cpp_dsp_tpu.ops.pallas.layouts import split_g

    assert split_g(k // 32) > 0  # the shapes here must actually split
    n = 64
    w = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    qt = from_gguf_tensor(quantize(w, kind), kind, (n, k))
    kw = to_kernel_layout(qt, tile_k=k)  # whole-K tile like the 13B config
    x = rng.standard_normal((2, k)).astype(np.float32)
    wd = np.asarray(dequant(qt, jnp.float32))
    want = x @ wd.T
    got = np.asarray(qmm_fused(jnp.asarray(x), kw, tile_b=8, tile_n=64))
    assert nmse(got, want) < 5e-4, f"{kind.name}: {nmse(got, want)}"
