"""Legacy GGML/GGJT → GGUF converter (reference
convert_llama_ggml_to_gguf.py role): synthesize a GGJTv3 archive, convert,
load with our loader — packed quant bytes must pass through untouched and
the model must run."""

import struct

import numpy as np
import jax.numpy as jnp
import pytest

from llama_cpp_dsp_tpu.gguf.constants import GGMLType
from llama_cpp_dsp_tpu.quant import dequantize, quantize
from llama_cpp_dsp_tpu.runtime.loader import load_model
from llama_cpp_dsp_tpu.tools.convert_llama_ggml import LegacyModel, convert

V, C, H, L, FF = 300, 64, 4, 2, 128


def _legacy_tensor(buf, name, arr, kind):
    """Append one GGJT tensor record (dims are ne-order = reversed numpy)."""
    dims = tuple(reversed(arr.shape))
    nb = name.encode()
    buf += struct.pack("<3I", len(dims), len(nb), int(kind))
    buf += struct.pack(f"<{len(dims)}I", *dims)
    buf += nb
    buf += b"\0" * (((len(buf) + 31) & ~31) - len(buf))  # GGJT 32B align
    if kind == GGMLType.F32:
        buf += np.ascontiguousarray(arr, np.float32).tobytes()
    else:
        buf += quantize(arr.reshape(-1, arr.shape[-1]), kind).tobytes()
    return buf


@pytest.fixture(scope="module")
def legacy_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    buf = bytearray()
    buf += b"tjgg" + struct.pack("<I", 3)  # GGJTv3
    buf += struct.pack("<7I", V, C, 256, H, L, C // H, 7)  # ftype Q8_0
    # vocab: ids 0-2 special, 3..258 raw bytes, rest text-ish
    for tid in range(V):
        if tid < 3:
            tok = b"?"
        elif tid <= 258:
            tok = bytes([tid - 3])
        else:
            tok = f"tok {tid}".encode()
        buf += struct.pack("<I", len(tok)) + tok + struct.pack("<f", -float(tid))
    arrays = {}

    def t(name, shape, kind=GGMLType.Q8_0):
        arr = (rng.standard_normal(shape) * 0.05).astype(np.float32)
        arrays[name] = (arr, kind)
        return arr

    buf2 = bytes(buf)
    order = [("tok_embeddings.weight", (V, C), GGMLType.Q8_0),
             ("norm.weight", (C,), GGMLType.F32),
             ("output.weight", (V, C), GGMLType.Q8_0)]
    for il in range(L):
        order += [
            (f"layers.{il}.attention.wq.weight", (C, C), GGMLType.Q8_0),
            (f"layers.{il}.attention.wk.weight", (C, C), GGMLType.Q8_0),
            (f"layers.{il}.attention.wv.weight", (C, C), GGMLType.Q8_0),
            (f"layers.{il}.attention.wo.weight", (C, C), GGMLType.Q8_0),
            (f"layers.{il}.attention_norm.weight", (C,), GGMLType.F32),
            (f"layers.{il}.feed_forward.w1.weight", (FF, C), GGMLType.Q8_0),
            (f"layers.{il}.feed_forward.w2.weight", (C, FF), GGMLType.Q8_0),
            (f"layers.{il}.feed_forward.w3.weight", (FF, C), GGMLType.Q8_0),
            (f"layers.{il}.ffn_norm.weight", (C,), GGMLType.F32),
        ]
    blob = bytearray(buf2)
    for name, shape, kind in order:
        blob = _legacy_tensor(blob, name, t(name, shape, kind), kind)
    d = tmp_path_factory.mktemp("legacy")
    path = d / "old.ggjt"
    path.write_bytes(bytes(blob))
    return str(path), str(d / "out.gguf"), arrays


def test_legacy_parse(legacy_file):
    path, _, arrays = legacy_file
    m = LegacyModel().load(open(path, "rb").read())
    assert m.file_format == "GGJT" and m.version == 3
    assert m.hp["n_vocab"] == V and m.hp["n_layer"] == L
    assert len(m.vocab) == V
    assert len(m.tensors) == len(arrays)


def test_legacy_convert_and_load(legacy_file):
    path, out, arrays = legacy_file
    convert(path, out, context_length=128)
    model = load_model(out)
    assert model.cfg.arch == "llama"
    assert model.cfg.n_layers == L and model.cfg.n_ff == FF
    assert model.cfg.n_heads == H

    # packed bytes pass through: dequant of the loaded embd == dequant of
    # the original quantized array (bit-exact — same raw blocks)
    from llama_cpp_dsp_tpu.quant.jax_dequant import dequant

    emb_ref = dequantize(
        quantize(arrays["tok_embeddings.weight"][0], GGMLType.Q8_0),
        GGMLType.Q8_0, (V, C))
    emb_got = np.asarray(dequant(model.params["token_embd"], jnp.float32))
    np.testing.assert_array_equal(emb_got, np.asarray(emb_ref))

    # forward runs and produces finite logits
    from llama_cpp_dsp_tpu.models.llama import forward

    toks = np.array([[5, 9, 31]], np.int32)
    pos = np.arange(3, dtype=np.int32).reshape(1, 3)
    logits, _ = forward(model.params, model.cfg, jnp.asarray(toks),
                        jnp.asarray(pos),
                        mask=np.tril(np.ones((1, 3, 3), bool)),
                        compute_dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits)).all()

    # byte tokens mapped to <0xNN> spm convention
    assert model.vocab.tokens[3] == "<0x00>"
    assert model.vocab.tokens[1] == "<s>"


def test_legacy_rejects_old_quant(legacy_file, tmp_path):
    """GGJTv2 quantized files must be refused (layouts changed in v3)."""
    path, _, _ = legacy_file
    data = bytearray(open(path, "rb").read())
    struct.pack_into("<I", data, 4, 2)  # version 3 → 2, ftype stays Q8_0
    bad = tmp_path / "v2.ggjt"
    bad.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="GGJTv3"):
        convert(str(bad), str(tmp_path / "x.gguf"))
