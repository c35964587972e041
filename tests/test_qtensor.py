"""QTensor repack + JAX dequant must match the numpy reference bit-for-bit."""

import numpy as np
import pytest

from llama_cpp_dsp_tpu.gguf import GGML_TYPE_TRAITS, GGMLType
from llama_cpp_dsp_tpu.ops.qtensor import PACKED_KINDS, QTensor, from_gguf_tensor
from llama_cpp_dsp_tpu.quant import dequantize, quantize
from llama_cpp_dsp_tpu.quant.jax_dequant import dequant as jdequant

KINDS = sorted(PACKED_KINDS, key=int)


@pytest.mark.parametrize("kind", KINDS)
def test_jax_dequant_bit_exact(kind, rng):
    n, k = 4, 512
    x = (rng.standard_normal((n, k)) * 3).astype(np.float32)
    raw = quantize(x, kind)
    want = dequantize(raw, kind, (n, k))
    qt = from_gguf_tensor(raw, kind, (n, k))
    got = np.asarray(jdequant(qt))
    np.testing.assert_array_equal(got, want, err_msg=kind.name)


@pytest.mark.parametrize("kind", [GGMLType.Q2_K, GGMLType.Q3_K,
                                  GGMLType.Q4_K, GGMLType.Q5_K,
                                  GGMLType.Q6_K])
def test_jax_dequant_random_bits(kind, rng):
    """Arbitrary packed bits (not from our quantizer) must decode identically."""
    n, k = 2, 1024
    tr = GGML_TYPE_TRAITS[kind]
    raw = rng.integers(0, 256, size=n * k // tr.block_size * tr.type_size, dtype=np.uint8)
    # zero out f16 super-scales' exponents to keep them finite? instead just
    # compare with equal_nan semantics on the finite mask
    want = dequantize(raw, kind, (n, k))
    qt = from_gguf_tensor(raw, kind, (n, k))
    got = np.asarray(jdequant(qt))
    ok = np.isfinite(want)
    np.testing.assert_array_equal(got[ok], want[ok], err_msg=kind.name)


def test_kernel_less_kinds_requantize_to_q8(rng):
    """Ternary kinds load as the table carrier (exact); 1-D stays dense."""
    import llama_cpp_dsp_tpu.quant.ref_numpy as refq

    tr = GGML_TYPE_TRAITS[GGMLType.TQ1_0]
    raw2 = rng.integers(0, 256, size=2 * 256 // tr.block_size * tr.type_size,
                        dtype=np.uint8)
    qt = from_gguf_tensor(raw2, GGMLType.TQ1_0, (2, 256))
    assert isinstance(qt, QTensor) and qt.kind == GGMLType.TQ1_0
    import jax.numpy as jnp

    from llama_cpp_dsp_tpu.quant.jax_dequant import dequant

    want = refq.dequantize(raw2, GGMLType.TQ1_0).reshape(2, 256)
    got = np.asarray(dequant(qt, jnp.float32))
    ok = np.isfinite(want)
    np.testing.assert_array_equal(got[ok], want[ok])

    # 1-D tensors stay dense
    arr = from_gguf_tensor(raw2, GGMLType.TQ1_0, (512,))
    assert isinstance(arr, np.ndarray)


IQ_EXACT_KINDS = [GGMLType.IQ2_XXS, GGMLType.IQ2_XS, GGMLType.IQ2_S,
                  GGMLType.IQ3_XXS, GGMLType.IQ3_S, GGMLType.IQ1_S,
                  GGMLType.IQ1_M, GGMLType.TQ1_0, GGMLType.TQ2_0]


@pytest.mark.parametrize("kind", IQ_EXACT_KINDS)
def test_iq_exact_table_repack(kind, rng):
    """Grid-codebook / ternary matrices repack EXACTLY into the table
    carrier (4-bit table index × per-group f32 scale) — decode is
    bit-identical to the reference dequantize_row_*."""
    import llama_cpp_dsp_tpu.quant.ref_numpy as refq
    from llama_cpp_dsp_tpu.quant.jax_dequant import dequant as jdequant

    n, k = 4, 512
    tr = GGML_TYPE_TRAITS[kind]
    try:
        raw = quantize((rng.standard_normal((n, k)) * 2).astype(np.float32),
                       kind)
    except NotImplementedError:
        raw = rng.integers(0, 256, size=n * k // tr.block_size * tr.type_size,
                           dtype=np.uint8)
    qt = from_gguf_tensor(raw, kind, (n, k))
    assert isinstance(qt, QTensor) and qt.kind == kind
    assert qt["qs"].shape == (n, k // 2)  # nibble density, not q8 bytes
    want = refq.dequantize(raw, kind).reshape(n, k)
    got = np.asarray(jdequant(qt))
    ok = np.isfinite(want)
    np.testing.assert_array_equal(got[ok], want[ok], err_msg=kind.name)


def test_iq_exact_repack_kernel_matmul(rng):
    """The g=16 exact-IQ q8 layout runs through the fused kernel."""
    import jax.numpy as jnp

    from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout
    from llama_cpp_dsp_tpu.ops.pallas.qmm import qmm_fused
    from llama_cpp_dsp_tpu.quant.jax_dequant import dequant as jdequant

    n, k = 128, 512
    raw = quantize((rng.standard_normal((n, k)) * 2).astype(np.float32),
                   GGMLType.IQ2_XS)  # per-16 scales
    qt = from_gguf_tensor(raw, GGMLType.IQ2_XS, (n, k))
    kw = to_kernel_layout(qt)
    x = rng.standard_normal((2, k)).astype(np.float32)
    got = np.asarray(qmm_fused(jnp.asarray(x), kw, tile_b=8, tile_n=128,
                               tile_k=256))
    want = x @ np.asarray(jdequant(qt, jnp.float32)).T
    d = got - want
    assert float((d * d).mean() / ((want * want).mean() + 1e-12)) < 5e-4
