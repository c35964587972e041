"""JSON-schema→GBNF compiler tests: compile, parse with our GBNF engine,
then check the grammar accepts exactly the conforming JSON documents
(behavioral equivalent of reference tests/test-json-schema-to-grammar.cpp)."""

import json

import pytest

from llama_cpp_dsp_tpu.grammar.gbnf import parse_gbnf
from llama_cpp_dsp_tpu.grammar.json_schema import json_schema_to_gbnf


def accepts(grammar_text: str, doc: str) -> bool:
    g = parse_gbnf(grammar_text)
    for ch in doc:
        g.accept_char(ord(ch))
        if not g.stacks:
            return False
    return any(len(st) == 0 for st in g.stacks)


def check(schema, good: list, bad: list):
    gbnf = json_schema_to_gbnf(schema)
    for doc in good:
        s = json.dumps(doc) if not isinstance(doc, str) else doc
        assert accepts(gbnf, s), f"should accept {s!r}\n{gbnf}"
    for doc in bad:
        s = json.dumps(doc) if not isinstance(doc, str) else doc
        assert not accepts(gbnf, s), f"should reject {s!r}\n{gbnf}"


def test_primitives():
    check({"type": "boolean"}, [True, False], ["1", '"x"', "null"])
    check({"type": "integer"}, [0, 42, -7], ["1.5", '"x"', "true"])
    check({"type": "number"}, [0, 3.14, -2e5], ['"x"', "true"])
    check({"type": "string"}, ['"hello"', '"a\\"b"', '""'], ["42", "true"])
    check({"type": "null"}, ["null"], ["0", '""'])


def test_enum_const():
    check({"enum": ["red", "green", 7]}, ['"red"', '"green"', "7"], ['"blue"', "8"])
    check({"const": "fixed"}, ['"fixed"'], ['"other"', '"fixe"'])


def test_object_required_and_optional():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name"],
        "additionalProperties": False,
    }
    check(
        schema,
        [{"name": "bob"}, {"name": "bob", "age": 3}],
        [{}, {"age": 3}, {"name": "bob", "x": 1}, {"name": 5}],
    )


def test_object_additional_properties():
    # NOTE: like older upstream versions, the grammar does not yet EXCLUDE
    # defined property names from the additional-property key strings, so
    # {"a": "s"} (schema-invalid) is not rejected here.
    schema = {"type": "object", "properties": {"a": {"type": "integer"}},
              "required": ["a"]}
    check(schema, [{"a": 1}, {"a": 1, "b": "x"}], [{}])


def test_array():
    check(
        {"type": "array", "items": {"type": "integer"}},
        [[], [1], [1, 2, 3]],
        [['"a"'], '[1,"a"]'],
    )
    check(
        {"type": "array", "items": {"type": "integer"}, "minItems": 2, "maxItems": 3},
        [[1, 2], [1, 2, 3]],
        [[], [1], [1, 2, 3, 4]],
    )


def test_prefix_items():
    schema = {"type": "array", "prefixItems": [{"type": "integer"}, {"type": "string"}]}
    check(schema, ['[1, "a"]'], ["[1]", '["a", 1]'])


def test_oneof_ref():
    schema = {
        "$defs": {"pt": {"type": "object", "properties": {"x": {"type": "number"}},
                          "required": ["x"], "additionalProperties": False}},
        "oneOf": [{"$ref": "#/$defs/pt"}, {"type": "null"}],
    }
    check(schema, [{"x": 1.5}, "null"], ["7", {"y": 1}])


def test_nested_objects():
    schema = {
        "type": "object",
        "properties": {
            "user": {
                "type": "object",
                "properties": {"id": {"type": "integer"}},
                "required": ["id"],
                "additionalProperties": False,
            },
            "tags": {"type": "array", "items": {"type": "string"}},
        },
        "required": ["user", "tags"],
        "additionalProperties": False,
    }
    check(
        schema,
        [{"user": {"id": 1}, "tags": []}, {"user": {"id": 2}, "tags": ["a", "b"]}],
        [{"user": {}, "tags": []}, {"tags": []}],
    )


def test_string_length_and_format():
    check({"type": "string", "minLength": 2, "maxLength": 3},
          ['"ab"', '"abc"'], ['"a"', '"abcd"'])
    check({"type": "string", "format": "uuid"},
          ['"01234567-89ab-cdef-0123-456789abcdef"'], ['"xyz"'])


def test_untyped_is_any_json():
    check({}, [{"a": [1, "x", None, True]}, "[]", "3.5"], ["{", "]"])
