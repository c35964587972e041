"""Systematic op sweep — role of the reference's test-backend-ops oracle
(tests/test-backend-ops.cpp): every fused kernel × quant type × shape ×
batch compared against the XLA dequantize-then-compute reference at the
MUL_MAT NMSE tolerance (5e-4, test-backend-ops.cpp:333).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.ops.pallas.layouts import to_kernel_layout
from llama_cpp_dsp_tpu.ops.pallas.qmm import SUPPORTED_KINDS, qmm_fused
from llama_cpp_dsp_tpu.quant.jax_dequant import dequant
from llama_cpp_dsp_tpu.tools.synth import synth_qtensor


def nmse(got, want):
    err = np.sum((got - want) ** 2)
    ref = np.sum(want.astype(np.float64) ** 2)
    return float(err / max(ref, 1e-12))


SHAPES = [(256, 512), (384, 1024), (512, 2048)]
BATCHES = [1, 3, 8, 17]


@pytest.mark.parametrize("kind", sorted(SUPPORTED_KINDS, key=int))
@pytest.mark.parametrize("n,k", SHAPES)
def test_qmm_sweep(kind, n, k):
    rng = np.random.default_rng(int(kind) * 1000 + n)
    qt = synth_qtensor(rng, kind, (n, k))
    kw = to_kernel_layout(qt, 256)
    wd = np.asarray(dequant(qt, jnp.float32))
    for b in BATCHES:
        x = rng.standard_normal((b, k)).astype(np.float32)
        want = x @ wd.T
        got = np.asarray(qmm_fused(jnp.asarray(x), kw, tile_b=8, tile_n=128,
                                   tile_k=256))
        assert got.shape == (b, n)
        e = nmse(got, want)
        assert e < 5e-4, f"{kind.name} b={b} {n}x{k}: NMSE {e}"


def test_flash_decode_sweep():
    from llama_cpp_dsp_tpu.ops.pallas.attention import flash_decode
    from tests_flash_ref import ref_attention

    rng = np.random.default_rng(0)
    for hq, hkv, d, s in [(4, 1, 128, 128), (8, 2, 128, 256), (16, 8, 128, 512)]:
        b = 2
        q = rng.standard_normal((b, hq, d)).astype(np.float32)
        k = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
        v = rng.standard_normal((b, hkv, s, d)).astype(np.float32)
        lengths = np.array([s, max(1, s // 3)], np.int32)
        out = flash_decode(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(lengths), scale=d ** -0.5,
                           chunk=128, interpret=True)
        want = ref_attention(q, k, v, lengths, d ** -0.5)
        assert nmse(np.asarray(out), want) < 1e-8, (hq, hkv, d, s)
