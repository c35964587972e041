"""GGUF maintenance tools: dump / new-metadata rewrite / in-place set.

Mirrors the roles of the reference's gguf-py scripts
(gguf-py/gguf/scripts/gguf_dump.py, gguf_new_metadata.py,
gguf_set_metadata.py).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from model_builder import build_tiny_llama  # noqa: E402

from llama_cpp_dsp_tpu.gguf.reader import read_gguf  # noqa: E402
from llama_cpp_dsp_tpu.tools import gguf_dump, gguf_new_metadata, gguf_set_metadata  # noqa: E402


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    path = tmp_path_factory.mktemp("gguf_tools") / "tiny.gguf"
    build_tiny_llama(str(path))
    return str(path)


def test_dump_text_and_flags(tiny, capsys):
    assert gguf_dump.main([tiny]) == 0
    out = capsys.readouterr().out
    assert "general.architecture" in out and "token_embd.weight" in out
    assert gguf_dump.main([tiny, "--data-offset"]) == 0
    off = int(capsys.readouterr().out.strip())
    gf = read_gguf(tiny, load_data=False)
    assert off == gf.data_offset
    gf.close()


def test_dump_json(tiny, capsys):
    assert gguf_dump.main([tiny, "--json"]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["metadata"]["general.architecture"]["value"] == "llama"
    assert doc["metadata"]["llama.block_count"]["type"] == "UINT32"
    # arrays are summarized unless --json-array
    toks = doc["metadata"]["tokenizer.ggml.tokens"]["value"]
    assert set(toks) == {"len", "head"}
    assert any(t["type"] == "Q8_0" for t in doc["tensors"].values())


def test_dump_markdown(tiny, capsys):
    assert gguf_dump.main([tiny, "--markdown"]) == 0
    out = capsys.readouterr().out
    assert "| `general.architecture` |" in out and "## Tensors" in out


def test_new_metadata_passthrough_is_faithful(tiny, tmp_path):
    out = str(tmp_path / "copy.gguf")
    assert gguf_new_metadata.main([tiny, out]) == 0
    a, b = read_gguf(tiny), read_gguf(out)
    assert a.kv_types == b.kv_types
    for k, v in a.kv.items():
        bv = b.kv[k]
        if isinstance(v, np.ndarray):
            assert v.dtype == bv.dtype and (v == bv).all(), k
        else:
            assert v == bv, k
    assert list(a.tensors) == list(b.tensors)
    for name, t in a.tensors.items():
        bt = b.tensors[name]
        assert (t.ggml_type, t.shape) == (bt.ggml_type, bt.shape)
        assert bytes(t.data) == bytes(bt.data), name
    a.close(), b.close()


def test_new_metadata_edits(tiny, tmp_path):
    out = str(tmp_path / "edit.gguf")
    assert gguf_new_metadata.main([
        tiny, out,
        "--general-name", "renamed-model",
        "--chat-template", "{{ messages }}",
        "--remove-metadata", "llama.vocab_size",
        "--special-token", "eos", "</s>",
        "--special-token-by-id", "bos", "1",
    ]) == 0
    gf = read_gguf(out, load_data=False)
    assert gf.kv["general.name"] == "renamed-model"
    assert gf.kv["tokenizer.chat_template"] == "{{ messages }}"
    assert "llama.vocab_size" not in gf.kv
    assert gf.kv["tokenizer.ggml.eos_token_id"] == 2  # index of </s>
    assert gf.kv["tokenizer.ggml.bos_token_id"] == 1
    gf.close()
    # edited file still loads as a model
    from llama_cpp_dsp_tpu.runtime.loader import load_model
    m = load_model(out)
    assert m.cfg.n_layers > 0


def test_set_metadata_in_place(tiny, tmp_path):
    import shutil
    target = str(tmp_path / "patch.gguf")
    shutil.copy(tiny, target)
    before = read_gguf(target, load_data=False)
    old_ctx = before.kv["llama.context_length"]
    before.close()
    assert gguf_set_metadata.main(
        [target, "llama.context_length", str(old_ctx * 2), "--force"]) == 0
    after = read_gguf(target)
    assert after.kv["llama.context_length"] == old_ctx * 2
    # neighbours untouched
    assert after.kv["llama.block_count"] == before.kv["llama.block_count"]
    after.close()


def test_set_metadata_rejects_strings(tiny, tmp_path):
    import shutil
    target = str(tmp_path / "patch2.gguf")
    shutil.copy(tiny, target)
    rc = gguf_set_metadata.main(
        [target, "general.architecture", "qwen2", "--force"])
    assert rc == 1
