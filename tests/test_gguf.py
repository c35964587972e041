"""GGUF container tests.

Modeled on reference tests/test-gguf.cpp: write→read round trip, malformed
files must fail cleanly; plus parsing the reference's shipped vocab GGUFs
(external fixtures) when present.
"""

import struct
from pathlib import Path

import numpy as np
import pytest

from llama_cpp_dsp_tpu.gguf import (
    GGMLType,
    GGUFFormatError,
    GGUFWriter,
    Keys,
    read_gguf,
)
from llama_cpp_dsp_tpu.quant import quantize

REFERENCE_MODELS = Path("/root/reference/models")


def build_file(tmp_path, alignment=32):
    p = tmp_path / "t.gguf"
    w = GGUFWriter(str(p), "llama", alignment=alignment)
    w.add_uint32("llama.block_count", 2)
    w.add_float32("llama.rope.freq_base", 10000.0)
    w.add_string("general.name", "unit-test")
    w.add_bool("tokenizer.ggml.add_bos_token", True)
    w.add_kv("tokenizer.ggml.tokens", ["<s>", "</s>", "hello"])
    w.add_kv("tokenizer.ggml.scores", [0.0, -1.0, -2.0])
    rng = np.random.default_rng(7)
    a = rng.standard_normal((8, 64)).astype(np.float32)
    w.add_tensor("tensor_f32", a)
    b = rng.standard_normal((4, 256)).astype(np.float32)
    raw = quantize(b, GGMLType.Q4_K)
    w.add_tensor("tensor_q4k", raw, ggml_type=GGMLType.Q4_K, ne_shape=(256, 4))
    w.write()
    return p, a, raw


def test_round_trip(tmp_path):
    p, a, raw = build_file(tmp_path)
    f = read_gguf(p)
    assert f.version == 3
    assert f.kv[Keys.General.ARCHITECTURE] == "llama"
    assert f.kv["llama.block_count"] == 2
    assert f.kv["general.name"] == "unit-test"
    assert f.kv["tokenizer.ggml.add_bos_token"] is True
    assert f.kv["tokenizer.ggml.tokens"] == ["<s>", "</s>", "hello"]
    np.testing.assert_allclose(f.kv["tokenizer.ggml.scores"], [0.0, -1.0, -2.0])

    t = f.tensors["tensor_f32"]
    assert t.ggml_type == GGMLType.F32
    assert t.shape == (64, 8)  # ne order
    assert t.np_shape == (8, 64)
    np.testing.assert_array_equal(t.data.view(np.float32).reshape(t.np_shape), a)

    q = f.tensors["tensor_q4k"]
    assert q.ggml_type == GGMLType.Q4_K
    np.testing.assert_array_equal(q.data, raw)
    f.close()


def test_alignment(tmp_path):
    p, _, _ = build_file(tmp_path, alignment=64)
    f = read_gguf(p)
    assert f.alignment == 64
    assert f.data_offset % 64 == 0
    f.close()


@pytest.mark.parametrize(
    "corrupt",
    [
        ("magic", b"GGML"),
        ("version", struct.pack("<I", 1)),
        ("version", struct.pack("<I", 99)),
        ("n_tensors", struct.pack("<Q", 1 << 60)),
        ("truncate", None),
    ],
)
def test_malformed_files_fail_cleanly(tmp_path, corrupt):
    p, _, _ = build_file(tmp_path)
    data = bytearray(p.read_bytes())
    kind, payload = corrupt
    if kind == "magic":
        data[0:4] = payload
    elif kind == "version":
        data[4:8] = payload
    elif kind == "n_tensors":
        data[8:16] = payload
    elif kind == "truncate":
        data = data[: len(data) // 3]
    bad = tmp_path / "bad.gguf"
    bad.write_bytes(bytes(data))
    with pytest.raises(GGUFFormatError):
        read_gguf(bad)


def test_empty_file_fails(tmp_path):
    bad = tmp_path / "empty.gguf"
    bad.write_bytes(b"")
    with pytest.raises(GGUFFormatError):
        read_gguf(bad)


@pytest.mark.skipif(not REFERENCE_MODELS.is_dir(), reason="reference fixtures unavailable")
def test_parse_reference_vocab_files():
    """Our reader must parse every vocab GGUF shipped with the reference."""
    files = sorted(REFERENCE_MODELS.glob("ggml-vocab-*.gguf"))
    assert files, "no vocab fixtures found"
    for path in files:
        f = read_gguf(path)
        assert Keys.Tokenizer.LIST in f.kv, path.name
        toks = f.kv[Keys.Tokenizer.LIST]
        assert len(toks) > 100, path.name
        assert f.kv[Keys.Tokenizer.MODEL] in {"llama", "gpt2", "bert", "t5", "rwkv"}, path.name
        f.close()


def test_gguf_split_merge_roundtrip(tmp_path):
    """Split a model into shards, load the shards, merge back — all three
    views must agree (reference examples/gguf-split)."""
    import sys
    sys.path.insert(0, "tests")
    import numpy as np
    from model_builder import build_tiny_llama
    from llama_cpp_dsp_tpu.gguf.reader import GGUFModel
    from llama_cpp_dsp_tpu.tools.gguf_split import merge, split

    src = str(tmp_path / "m.gguf")
    build_tiny_llama(src, qtype=8)
    orig = GGUFModel.load(src)

    paths = split(src, str(tmp_path / "m-split"), max_tensors=5)
    assert len(paths) > 1
    shard = GGUFModel.load(paths[0])  # loads all siblings
    assert set(shard.tensors) == set(orig.tensors)
    for name, info in orig.tensors.items():
        np.testing.assert_array_equal(np.asarray(shard.tensors[name].data),
                                      np.asarray(info.data))

    merged = str(tmp_path / "merged.gguf")
    merge(paths[0], merged)
    back = GGUFModel.load(merged)
    assert set(back.tensors) == set(orig.tensors)
    assert back.kv.get("llama.block_count") == orig.kv.get("llama.block_count")

    # and the merged file loads as a model
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    m = load_model(merged)
    assert m.cfg.n_layers == 2
