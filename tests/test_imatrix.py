"""imatrix collection → save/load → imatrix-weighted requantization E2E
(reference examples/imatrix + llama-quant.cpp imatrix path).
"""

import numpy as np
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.tools.imatrix import (
    collect, load_imatrix, save_imatrix,
)
from llama_cpp_dsp_tpu.tools.quantize import quantize_model

from model_builder import build_tiny_llama


def test_imatrix_collect_save_quantize(tmp_path):
    src = str(tmp_path / "f32.gguf")
    build_tiny_llama(src, qtype=GGMLType.F32, n_embd=256, n_ff=256)
    model = load_model(src)

    rng = np.random.default_rng(0)
    chunks = [[int(t) for t in rng.integers(3, 250, 16)] for _ in range(3)]
    col = collect(model, chunks, compute_dtype=jnp.float32)
    weights = col.to_weights()
    assert any(k.startswith("blk.0.") for k in weights)
    for v in weights.values():
        assert np.isfinite(v).all() and (v >= 0).all()

    imat_path = str(tmp_path / "imatrix.dat")
    save_imatrix(imat_path, col)
    loaded = load_imatrix(imat_path)
    assert set(loaded) == set(weights)

    # quantize with and without the imatrix; both must load and run
    dst_plain = str(tmp_path / "q4.gguf")
    dst_imat = str(tmp_path / "q4_im.gguf")
    from llama_cpp_dsp_tpu.tools.quantize import FTYPE_NAMES
    quantize_model(src, dst_plain, FTYPE_NAMES["Q4_K_M"])
    quantize_model(src, dst_imat, FTYPE_NAMES["Q4_K_M"], imatrix=loaded)

    toks = np.array([[5, 9, 31]], np.int32)
    outs = {}
    for name, path in (("plain", dst_plain), ("imat", dst_imat)):
        m = load_model(path)
        from llama_cpp_dsp_tpu.models.llama import forward

        pos = np.arange(3, dtype=np.int32).reshape(1, 3)
        logits, _ = forward(m.params, m.cfg, jnp.asarray(toks), jnp.asarray(pos),
                            mask=np.tril(np.ones((1, 3, 3), bool)),
                            compute_dtype=jnp.float32)
        outs[name] = np.asarray(logits)
        assert np.isfinite(outs[name]).all()
    # imatrix weighting changes the packed bits (different rounding)
    assert np.abs(outs["imat"] - outs["plain"]).max() > 0
