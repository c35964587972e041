"""Native C++ k-quant encoders (native/kquants.cpp) must be BYTE-IDENTICAL
to the numpy oracle (quant/ref_numpy.py) — which is itself byte-identical
to the reference `llama-quantize` (tests/test_reference_ab.py). The scale
searches sit on knife-edge f32 comparisons, so this is the real gate."""

import numpy as np
import pytest

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.native.kquants_bind import quantize_native
from llama_cpp_dsp_tpu.quant import ref_numpy

KINDS = [GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
         GGMLType.Q5_K, GGMLType.Q6_K]


def _oracle(x, kind):
    return ref_numpy._QUANT[kind](np.ascontiguousarray(x, np.float32))


@pytest.fixture(scope="module")
def native_ok():
    out = quantize_native(np.zeros(256, np.float32), GGMLType.Q4_K)
    if out is None:
        pytest.skip("no C++ toolchain for native kquants")
    return True


@pytest.mark.parametrize("kind", KINDS)
def test_native_matches_oracle_random(native_ok, kind):
    rng = np.random.default_rng(0)
    for scale in (0.1, 3.0, 1e-3):
        x = (rng.standard_normal((64, 256)) * scale).astype(np.float32)
        got = quantize_native(x, kind)
        want = np.asarray(_oracle(x, kind)).view(np.uint8).reshape(-1)
        np.testing.assert_array_equal(got, want, err_msg=f"{kind.name} {scale}")


@pytest.mark.parametrize("kind", KINDS)
def test_native_matches_oracle_edges(native_ok, kind):
    rng = np.random.default_rng(1)
    rows = [
        np.zeros(256, np.float32),                     # dead block
        np.full(256, 0.37, np.float32),                # flat positive
        np.full(256, -1.25, np.float32),               # flat negative
        np.concatenate([np.zeros(128), np.ones(128)]).astype(np.float32),
        (rng.standard_normal(256) * 1e-14).astype(np.float32),  # near eps
        np.where(rng.random(256) < 0.5, 1.0, -1.0).astype(np.float32),
    ]
    x = np.stack(rows)
    got = quantize_native(x, kind)
    want = np.asarray(_oracle(x, kind)).view(np.uint8).reshape(-1)
    np.testing.assert_array_equal(got, want, err_msg=kind.name)


def test_quantize_dispatch_uses_native(native_ok, monkeypatch):
    """quant.quantize routes k-quants through the native path; env opts out."""
    from llama_cpp_dsp_tpu.quant import quantize

    rng = np.random.default_rng(2)
    x = (rng.standard_normal((8, 256)) * 0.2).astype(np.float32)
    a = np.asarray(quantize(x, GGMLType.Q4_K)).view(np.uint8).reshape(-1)
    b = np.asarray(_oracle(x, GGMLType.Q4_K)).view(np.uint8).reshape(-1)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("kind", [GGMLType.Q4_0, GGMLType.Q4_K,
                                  GGMLType.Q5_K, GGMLType.Q6_K])
def test_weighted_native_matches_oracle(native_ok, kind, monkeypatch):
    """imatrix-weighted encoders byte-identical to the numpy weighted
    oracle (reference quantize_row_*_impl with quant_weights)."""
    from llama_cpp_dsp_tpu.native.kquants_bind import quantize_weighted_native

    rng = np.random.default_rng(3)
    n_per_row = 512
    x = (rng.standard_normal((6, n_per_row)) * 0.3).astype(np.float32)
    qw = (rng.random(n_per_row) + 0.01).astype(np.float32)
    got = quantize_weighted_native(x, qw, kind, n_per_row)
    assert got is not None
    monkeypatch.setenv("LLAMA_TPU_NO_NATIVE_QUANT", "1")
    import importlib

    from llama_cpp_dsp_tpu.quant import ref_numpy as rn
    if kind == GGMLType.Q4_0:
        want = rn.quant_q4_0_weighted(x, qw, n_per_row)
    elif kind == GGMLType.Q6_K:
        want = rn.quant_q6_K_weighted(x, qw, n_per_row)
    else:
        nmax = 15 if kind == GGMLType.Q4_K else 31
        rows = x.reshape(-1, n_per_row)
        sigma2 = np.float32(2) * rn._seqsum(rows * rows) / np.float32(256)
        xg = x.reshape(-1, 32)
        qwg = np.tile(qw.reshape(-1), rows.shape[0])[: xg.size].reshape(-1, 32)
        sig = np.repeat(sigma2, n_per_row // 32)
        weights = qwg * np.sqrt(sig[:, None] + xg * xg).astype(np.float32)
        want = rn._quant_k4_with_weights(x, weights, kind, nmax)
    np.testing.assert_array_equal(
        np.asarray(got).view(np.uint8).reshape(-1),
        np.asarray(want).view(np.uint8).reshape(-1), err_msg=kind.name)
