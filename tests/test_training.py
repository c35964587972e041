"""ggml-opt mirror tests (role of reference tests/test-opt.cpp: AdamW fit on
toy problems, loss/accuracy result accounting, dataset split) + full-parameter
fine-tuning through the serving forward() with GGUF save/reload round-trip.
"""

import numpy as np
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.training.opt import AdamWParams, Dataset, LossType, fit
from llama_cpp_dsp_tpu.training.full import save_full, train_full

from model_builder import build_tiny_llama


def test_fit_mse_linear_regression():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((4, 3)).astype(np.float32)
    x = rng.standard_normal((256, 3)).astype(np.float32)
    y = x @ A.T + 0.5

    params = {"w": jnp.zeros((4, 3)), "b": jnp.zeros((4,))}

    def apply_fn(p, inputs):
        return inputs @ p["w"].T + p["b"]

    params, hist = fit(apply_fn, params, Dataset(x, y),
                       loss_type=LossType.MEAN_SQUARED_ERROR,
                       nepoch=40, nbatch=64,
                       get_opt_pars=AdamWParams(alpha=5e-2), silent=True)
    first, _ = hist[0][0].loss()
    last, _ = hist[-1][0].loss()
    assert last < first * 0.05, (first, last)
    np.testing.assert_allclose(np.asarray(params["w"]), A, atol=0.05)


def test_fit_cross_entropy_accuracy_and_val_split():
    rng = np.random.default_rng(1)
    # linearly separable 3-class problem
    centers = np.eye(3, 4, dtype=np.float32) * 4.0
    labels = rng.integers(0, 3, 300)
    x = centers[labels] + rng.standard_normal((300, 4)).astype(np.float32) * 0.3

    params = {"w": jnp.zeros((3, 4))}

    def apply_fn(p, inputs):
        return inputs @ p["w"].T

    params, hist = fit(apply_fn, params, Dataset(x, labels.astype(np.int32)),
                       loss_type=LossType.CROSS_ENTROPY,
                       nepoch=15, nbatch=50, val_split=1.0 / 6.0,
                       get_opt_pars=lambda ep: AdamWParams(alpha=1e-1),
                       silent=True)
    rt, re = hist[-1]
    acc, unc = rt.accuracy()
    assert acc > 0.95, acc
    assert np.isfinite(unc)
    # validation tail was evaluated, not trained
    val_loss, _ = re.loss()
    assert re.ndata == 50 and np.isfinite(val_loss)
    # one-hot label rows hit the distribution branch and agree
    onehot = np.eye(3, dtype=np.float32)[labels]
    params2 = {"w": jnp.zeros((3, 4))}
    params2, hist2 = fit(apply_fn, params2, Dataset(x, onehot),
                         loss_type=LossType.CROSS_ENTROPY,
                         nepoch=5, nbatch=50, silent=True)
    acc2, _ = hist2[-1][0].accuracy()
    assert acc2 > 0.8, acc2


def test_train_full_converges_and_roundtrips(tmp_path):
    src = str(tmp_path / "base.gguf")
    build_tiny_llama(src, qtype=GGMLType.F32)
    model = load_model(src)

    seqs = [[3, 17, 42, 9, 3, 17, 42, 9], [5, 5, 8, 20, 5, 5, 8, 20]]
    trained, losses = train_full(model, seqs, steps=40, lr=5e-3,
                                 progress=False)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    dst = str(tmp_path / "tuned.gguf")
    n = save_full(dst, src, model, trained)
    assert n > 0

    # reload through the normal loader: logits must match the trained tree
    # exactly (f32 source types -> f32 round trip)
    from llama_cpp_dsp_tpu.models.llama import forward

    tuned = load_model(dst)
    toks = jnp.asarray([[3, 17, 42, 9]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None]
    mask = jnp.tril(jnp.ones((1, 4, 4), bool))
    want, _ = forward(trained, model.cfg, toks, pos, mask=mask,
                      compute_dtype=jnp.float32)
    got, _ = forward(tuned.params, tuned.cfg, toks, pos, mask=mask,
                     compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_save_full_requantizes_to_source_types(tmp_path):
    src = str(tmp_path / "base_q8.gguf")
    build_tiny_llama(src, qtype=GGMLType.Q8_0)
    model = load_model(src)
    from llama_cpp_dsp_tpu.training.full import dequantize_tree

    trained = dequantize_tree(model.params)  # "trained" = identity pass

    dst = str(tmp_path / "tuned_q8.gguf")
    save_full(dst, src, model, trained)
    from llama_cpp_dsp_tpu.gguf.reader import GGUFModel

    gm_src = GGUFModel.load(src)
    gm_dst = GGUFModel.load(dst)
    assert set(gm_dst.tensors) == set(gm_src.tensors)
    for name, info in gm_dst.tensors.items():
        assert info.ggml_type == gm_src.tensors[name].ggml_type, name
    # KV metadata must keep its recorded types (llama.cpp readers
    # type-check: UINT32 context_length re-inferred as INT32 won't load)
    src_types, dst_types = gm_src.kv_types, gm_dst.kv_types
    for key, vt in src_types.items():
        assert dst_types[key] == vt, (key, vt, dst_types[key])
    gm_src.close()
    gm_dst.close()
    # and the requantized model still loads + runs
    tuned = load_model(dst)
    from llama_cpp_dsp_tpu.models.llama import forward

    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)[None]
    mask = jnp.tril(jnp.ones((1, 3, 3), bool))
    logits, _ = forward(tuned.params, tuned.cfg, toks, pos, mask=mask,
                        compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()
