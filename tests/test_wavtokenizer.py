"""WavTokenizer decoder: GGUF round-trip load + forward shape/finiteness,
plus group-norm semantics vs a direct numpy computation (ggml_group_norm)."""

import numpy as np
import jax.numpy as jnp

from llama_cpp_dsp_tpu.gguf.writer import GGUFWriter
from llama_cpp_dsp_tpu.models.wavtokenizer import (
    WavTokenizerConfig, _group_norm, forward, load_wavtokenizer,
)

V, FEAT, POS, CNX, OUT = 64, 16, 32, 24, 40
N_GROUPS = 4


def _w(path):
    rng = np.random.default_rng(0)

    def m(*shape, s=0.1):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    w = GGUFWriter(str(path), "wavtokenizer-dec")
    w.add_uint32("wavtokenizer-dec.vocab_size", V)
    w.add_uint32("wavtokenizer-dec.features_length", FEAT)
    w.add_uint32("wavtokenizer-dec.posnet.embedding_length", POS)
    w.add_uint32("wavtokenizer-dec.posnet.block_count", 6)
    w.add_uint32("wavtokenizer-dec.convnext.embedding_length", CNX)
    w.add_uint32("wavtokenizer-dec.convnext.block_count", 2)
    w.add_uint32("wavtokenizer-dec.attention.group_norm_groups", N_GROUPS)
    w.add_float32("wavtokenizer-dec.attention.group_norm_epsilon", 1e-6)
    w.add_float32("wavtokenizer-dec.attention.layer_norm_epsilon", 1e-5)

    # ggml ne is the reverse of the numpy shape we pass to add_tensor
    w.add_tensor("token_embd.weight", m(V, FEAT))
    w.add_tensor("conv1d.weight", m(POS, FEAT, 7))
    w.add_tensor("conv1d.bias", m(POS, 1))
    for i in range(6):
        p = f"posnet.{i}."
        if i in (0, 1, 3, 4):
            w.add_tensor(p + "norm1.weight", m(POS, 1) + 1)
            w.add_tensor(p + "norm1.bias", m(POS, 1))
            w.add_tensor(p + "conv1.weight", m(POS, POS, 3))
            w.add_tensor(p + "conv1.bias", m(POS, 1))
            w.add_tensor(p + "norm2.weight", m(POS, 1) + 1)
            w.add_tensor(p + "norm2.bias", m(POS, 1))
            w.add_tensor(p + "conv2.weight", m(POS, POS, 3))
            w.add_tensor(p + "conv2.bias", m(POS, 1))
        elif i == 2:
            w.add_tensor(p + "attn_norm.weight", m(POS, 1) + 1)
            w.add_tensor(p + "attn_norm.bias", m(POS, 1))
            for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
                w.add_tensor(p + nm + ".weight", m(POS, POS, 1))
                w.add_tensor(p + nm + ".bias", m(POS, 1))
        else:
            w.add_tensor(p + "norm.weight", m(POS, 1) + 1)
            w.add_tensor(p + "norm.bias", m(POS, 1))
    # posnet C and convnext C differ here; the tok norm + implicit projection
    # in real checkpoints have POS == CNX — keep them equal in the bridge
    w.add_tensor("token_embd_norm.weight", m(POS) + 1)
    w.add_tensor("token_embd_norm.bias", m(POS))
    for i in range(2):
        p = f"convnext.{i}."
        w.add_tensor(p + "dw.weight", m(POS, 1, 7))
        w.add_tensor(p + "dw.bias", m(POS, 1))
        w.add_tensor(p + "norm.weight", m(POS) + 1)
        w.add_tensor(p + "norm.bias", m(POS))
        w.add_tensor(p + "pw1.weight", m(CNX * 2, POS))
        w.add_tensor(p + "pw1.bias", m(CNX * 2))
        w.add_tensor(p + "pw2.weight", m(POS, CNX * 2))
        w.add_tensor(p + "pw2.bias", m(POS))
        w.add_tensor(p + "gamma.weight", m(POS) + 1)
    w.add_tensor("output_norm.weight", m(POS) + 1)
    w.add_tensor("output_norm.bias", m(POS))
    w.add_tensor("output.weight", m(OUT, POS))
    w.add_tensor("output.bias", m(OUT))
    w.write()
    return path


def test_group_norm_matches_direct():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 5)).astype(np.float32)
    w = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    got = np.asarray(_group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 4, 1e-6))
    want = np.empty_like(x)
    for bi in range(2):
        for g in range(4):
            sl = x[bi, g * 2 : (g + 1) * 2, :]
            mu, var = sl.mean(), sl.var()
            want[bi, g * 2 : (g + 1) * 2, :] = (sl - mu) / np.sqrt(var + 1e-6)
    want = want * w[None, :, None] + b[None, :, None]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_wavtokenizer_load_and_forward(tmp_path):
    path = _w(tmp_path / "wavtok.gguf")
    cfg, params = load_wavtokenizer(str(path))
    assert cfg.posnet_embd == POS and cfg.n_groups == N_GROUPS
    assert cfg.n_out == OUT
    toks = np.array([[1, 5, 9, 13, 2, 7, 11, 3]], np.int32)
    out = np.asarray(forward(params, cfg, jnp.asarray(toks)))
    assert out.shape == (1, toks.shape[1], OUT)
    assert np.isfinite(out).all()
    # convs are SAME-padded: time length must be preserved end to end
    out2 = np.asarray(forward(params, cfg, jnp.asarray(toks[:, :5])))
    assert out2.shape == (1, 5, OUT)
    # prefix invariance does NOT hold (convs are non-causal) but the net
    # must be deterministic
    out3 = np.asarray(forward(params, cfg, jnp.asarray(toks)))
    np.testing.assert_array_equal(out, out3)
