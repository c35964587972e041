"""llama-run model-URI resolution + json-schema CLI wrapper."""

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent))
from model_builder import build_tiny_llama  # noqa: E402

from llama_cpp_dsp_tpu.tools import json_schema_to_grammar, run  # noqa: E402


def test_resolve_file_uri(tmp_path):
    p = tmp_path / "m.gguf"
    p.write_bytes(b"x")
    assert run.resolve_model(f"file://{p}") == str(p)
    assert run.resolve_model(str(p)) == str(p)


def test_resolve_missing_and_ollama():
    with pytest.raises(SystemExit):
        run.resolve_model("/nonexistent/model.gguf")
    with pytest.raises(SystemExit):
        run.resolve_model("ollama://smollm:135m")


def test_run_one_shot(tmp_path, capsysbinary):
    # capsysbinary: llama-run streams raw piece bytes (may be invalid UTF-8
    # on a random tiny model)
    path = tmp_path / "tiny.gguf"
    build_tiny_llama(str(path), qtype=0)
    rc = run.main([str(path), "hello", "world", "--temp", "0", "-c", "64"])
    assert rc == 0
    assert capsysbinary.readouterr().out  # generated something


def test_json_schema_cli(tmp_path, capsys):
    schema = {"type": "object", "properties": {"a": {"type": "integer"}},
              "required": ["a"]}
    f = tmp_path / "s.json"
    f.write_text(json.dumps(schema))
    assert json_schema_to_grammar.main([str(f)]) == 0
    out = capsys.readouterr().out
    assert "root" in out and "integer" in out

    # the produced grammar actually parses and accepts a matching document
    from llama_cpp_dsp_tpu.tools.gbnf_validator import validate

    assert validate(out, b'{"a": 42}')[0]
    assert not validate(out, b'{"a": "nope"}')[0]
