"""Quant format tests.

Modeled on the reference's tests/test-quantize-fns.cpp: round-trip RMSE
bounds per type, plus bit-exactness against the reference gguf-py
(de)quantizers where those exist (external oracle, like test-backend-ops
uses the CPU backend as reference device).
"""

import numpy as np
import pytest

from llama_cpp_dsp_tpu.gguf import GGML_TYPE_TRAITS, GGMLType
from llama_cpp_dsp_tpu.quant import dequantize, quantize

from conftest import reference_gguf_py

# reference tests/test-quantize-fns.cpp:24-31
MAX_QUANTIZATION_REFERENCE_ERROR = 0.0001
# reference test-quantize-fns.cpp:18-21 (MAX_QUANTIZATION_TOTAL_ERROR*)
TOTAL_ERROR = {
    GGMLType.Q4_0: 0.002,
    GGMLType.Q4_1: 0.002,
    GGMLType.Q5_0: 0.002,
    GGMLType.Q5_1: 0.002,
    GGMLType.Q8_0: 0.002,
    GGMLType.Q2_K: 0.0075,  # MAX_QUANTIZATION_TOTAL_ERROR_2BITS
    GGMLType.Q3_K: 0.0040,  # MAX_QUANTIZATION_TOTAL_ERROR_3BITS
    GGMLType.Q4_K: 0.002,
    GGMLType.Q5_K: 0.002,
    GGMLType.Q6_K: 0.002,
}

QUANT_TYPES = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
]

DEQUANT_ONLY_TYPES = [
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
    GGMLType.Q8_K,
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


def synthetic_data(n: int, offset: float = 0.0) -> np.ndarray:
    """cosine ramp like reference generate_data (test-quantize-fns.cpp:47)."""
    i = np.arange(n, dtype=np.float32)
    return (0.1 + 2.0 * np.cos(i + offset)).astype(np.float32)


def array_rmse(a, b):
    """sqrt(sum(diff^2))/n — matches reference array_rmse (test-quantize-fns.cpp:38)."""
    d = a.astype(np.float64) - b.astype(np.float64)
    return float(np.sqrt((d * d).sum()) / len(a))


def rmse(a, b):
    return float(np.sqrt(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)))


@pytest.mark.parametrize("t", QUANT_TYPES)
def test_round_trip_error(t):
    n = 32 * 128  # reference test_size
    x = synthetic_data(n)
    raw = quantize(x, t)
    assert raw.nbytes == n // GGML_TYPE_TRAITS[t].block_size * GGML_TYPE_TRAITS[t].type_size
    y = dequantize(raw, t)
    err = array_rmse(x, y)
    assert err < TOTAL_ERROR[t], f"{t.name}: total quantization error {err}"


def test_q8_K_round_trip():
    x = synthetic_data(1024)
    raw = quantize(x, GGMLType.Q8_K)
    y = dequantize(raw, GGMLType.Q8_K)
    assert rmse(x, y) < 0.01
    # bsums must equal group sums of qs
    from llama_cpp_dsp_tpu.quant.ref_numpy import DT, _blocks

    b = _blocks(raw, GGMLType.Q8_K)
    got = b["bsums"]
    want = b["qs"].reshape(-1, 16, 16).astype(np.int32).sum(axis=2)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("t", QUANT_TYPES + DEQUANT_ONLY_TYPES)
def test_dequant_zeros(t):
    """All-zero input must survive quantize/dequant (guards div-by-zero paths)."""
    tr = GGML_TYPE_TRAITS[t]
    n = tr.block_size * 4
    try:
        raw = quantize(np.zeros(n, dtype=np.float32), t)
    except NotImplementedError:
        raw = np.zeros(n // tr.block_size * tr.type_size, dtype=np.uint8)
    y = dequantize(raw, t)
    assert y.shape == (n,)
    assert np.all(np.isfinite(y))


# ---------------------------------------------------------------------------
# bit-exactness vs the reference gguf-py oracle
# ---------------------------------------------------------------------------

_gguf = reference_gguf_py()

ORACLE_QUANT = [
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q8_0,
    GGMLType.TQ1_0,
    GGMLType.TQ2_0,
]
ORACLE_DEQUANT = ORACLE_QUANT + [
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
    GGMLType.IQ4_NL,
    GGMLType.IQ4_XS,
]


@pytest.mark.skipif(_gguf is None, reason="reference gguf-py not available")
@pytest.mark.parametrize("t", ORACLE_QUANT)
def test_quantize_matches_oracle(t, rng):
    x = rng.standard_normal(256 * 8).astype(np.float32)
    ours = quantize(x, t)
    theirs = _gguf.quants.quantize(x, _gguf.GGMLQuantizationType(int(t)))
    np.testing.assert_array_equal(ours, theirs.view(np.uint8).reshape(-1))


@pytest.mark.skipif(_gguf is None, reason="reference gguf-py not available")
@pytest.mark.parametrize("t", ORACLE_DEQUANT)
def test_dequantize_matches_oracle(t, rng):
    tr = GGML_TYPE_TRAITS[t]
    nb = 16
    raw = rng.integers(0, 256, size=nb * tr.type_size, dtype=np.uint8)
    # keep f16 scale fields finite: zero the exponent's top bit is overkill;
    # instead build blocks from quantizing data when we can, else sanitize NaNs
    x = rng.standard_normal(nb * tr.block_size).astype(np.float32)
    try:
        raw = quantize(x, t)
    except NotImplementedError:
        pass
    ours = dequantize(raw, t)
    theirs = _gguf.quants.dequantize(raw, _gguf.GGMLQuantizationType(int(t)))
    ok = np.isfinite(theirs.reshape(-1))
    np.testing.assert_array_equal(ours[ok], theirs.reshape(-1)[ok])


@pytest.mark.skipif(_gguf is None, reason="reference gguf-py not available")
@pytest.mark.parametrize(
    "t",
    [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K],
)
def test_dequantize_kquants_random_bits(t, rng):
    """Random packed bits (not from our quantizer) must decode identically."""
    tr = GGML_TYPE_TRAITS[t]
    raw = rng.integers(0, 256, size=64 * tr.type_size, dtype=np.uint8)
    # zero the f16 super-scales' exponent top bits to avoid inf/NaN mismatch noise
    ours = dequantize(raw, t)
    theirs = _gguf.quants.dequantize(raw, _gguf.GGMLQuantizationType(int(t))).reshape(-1)
    ok = np.isfinite(theirs) & (np.abs(theirs) < 1e30)
    assert ok.mean() > 0.5
    np.testing.assert_array_equal(ours[ok], theirs[ok])


@pytest.mark.skipif(_gguf is None, reason="reference gguf-py not available")
@pytest.mark.parametrize(
    "t",
    [
        GGMLType.IQ2_XXS,
        GGMLType.IQ2_XS,
        GGMLType.IQ2_S,
        GGMLType.IQ3_XXS,
        GGMLType.IQ3_S,
        GGMLType.IQ1_S,
        GGMLType.IQ1_M,
        GGMLType.TQ1_0,
        GGMLType.TQ2_0,
    ],
)
def test_dequantize_iquants_random_bits(t, rng):
    """i-quant/ternary grids + sign/scale unpack decode identically to the
    reference gguf-py on arbitrary packed bits (the codebook lookup masks
    every index into table range, so random bytes are valid blocks)."""
    tr = GGML_TYPE_TRAITS[t]
    raw = rng.integers(0, 256, size=64 * tr.type_size, dtype=np.uint8)
    ours = dequantize(raw, t)
    theirs = _gguf.quants.dequantize(raw, _gguf.GGMLQuantizationType(int(t))).reshape(-1)
    ok = np.isfinite(theirs) & (np.abs(theirs) < 1e30)
    assert ok.mean() > 0.5
    np.testing.assert_array_equal(ours[ok], theirs[ok])


@pytest.mark.parametrize("t", [GGMLType.IQ4_NL, GGMLType.IQ4_XS])
def test_iq4_quantize_roundtrip(t, rng):
    """IQ4 encode (codebook least-squares fit, quantize_row_iq4_nl_impl):
    round-trip beats Q4_0 on gaussian data and the packed bytes decode
    identically through the reference gguf-py dequantizer."""
    x = rng.standard_normal(256 * 16).astype(np.float32)
    raw = quantize(x, t)
    y = dequantize(raw, t)
    e_iq4 = rmse(x, y)
    e_q40 = rmse(x, dequantize(quantize(x, GGMLType.Q4_0), GGMLType.Q4_0))
    assert e_iq4 < e_q40, (e_iq4, e_q40)
    if _gguf is not None:
        theirs = _gguf.quants.dequantize(
            raw, _gguf.GGMLQuantizationType(int(t))).reshape(-1)
        np.testing.assert_array_equal(y, theirs)


@pytest.mark.parametrize("t", [GGMLType.IQ2_XXS, GGMLType.IQ3_XXS,
                               GGMLType.IQ1_S, GGMLType.IQ1_M,
                               GGMLType.IQ2_XS, GGMLType.IQ2_S,
                               GGMLType.IQ3_S])
def test_iq_codebook_encoders(t, rng):
    """IQ2/IQ3 codebook encoders (full-codebook weighted search): encoded
    blocks must decode identically through the reference gguf-py and beat a
    naive sign+single-level baseline on gaussian data."""
    x = rng.standard_normal(256 * 8).astype(np.float32)
    raw = quantize(x, t)
    tr = GGML_TYPE_TRAITS[t]
    assert raw.nbytes == x.size // tr.block_size * tr.type_size
    y = dequantize(raw, t)
    assert np.isfinite(y).all()
    corr = np.corrcoef(x, y)[0, 1]
    floor = {GGMLType.IQ2_XXS: 0.85, GGMLType.IQ3_XXS: 0.93,
             GGMLType.IQ1_S: 0.8, GGMLType.IQ1_M: 0.82,
             GGMLType.IQ2_XS: 0.88, GGMLType.IQ2_S: 0.9,
             GGMLType.IQ3_S: 0.94}[t]
    assert corr > floor, corr
    if _gguf is not None:
        theirs = _gguf.quants.dequantize(
            raw, _gguf.GGMLQuantizationType(int(t))).reshape(-1)
        np.testing.assert_array_equal(y, theirs)
    # imatrix-weighted path stays valid
    qw = np.abs(rng.standard_normal(256)).astype(np.float32) + 0.1
    from llama_cpp_dsp_tpu.quant.ref_numpy import _QUANT

    fn = _QUANT[t]
    raw_w = fn(x, qw)
    yw = dequantize(raw_w, t)
    assert np.isfinite(yw).all()
