"""QTensor repack + JAX dequant must match the numpy reference bit-for-bit."""

import numpy as np
import pytest

from llama_cpp_dsp_tpu.gguf import GGML_TYPE_TRAITS, GGMLType
from llama_cpp_dsp_tpu.ops.qtensor import PACKED_KINDS, from_gguf_tensor
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


@pytest.mark.parametrize("kind", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K])
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


def test_dense_fallback(rng):
    x = rng.standard_normal((4, 256)).astype(np.float32)
    raw = quantize(x, GGMLType.Q4_K)
    # Q2_K has no packed layout → falls back to dense
    import llama_cpp_dsp_tpu.quant.ref_numpy as refq

    raw2 = rng.integers(0, 256, size=2 * 256 // 256 * 84, dtype=np.uint8)
    arr = from_gguf_tensor(raw2, GGMLType.Q2_K, (2, 256))
    assert isinstance(arr, np.ndarray)
    assert arr.shape == (2, 256)
