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


# -- `pattern` keyword (regex → grammar; reference _visit_pattern) -----------


def test_pattern_strings():
    schema = {"type": "string", "pattern": "^[a-f]{2}[0-9]+$"}
    check(schema, ['"ab123"', '"ff0"'], ['"a1"', '"abc"', '"AB12"', '"ab"'])


def test_pattern_alternation_and_groups():
    schema = {"type": "string", "pattern": "^(foo|ba(r|z))-[0-9]{2,3}x?$"}
    check(schema, ['"foo-12"', '"bar-123x"', '"baz-99"'],
          ['"foo-1"', '"qux-12"', '"foo-1234"', '"bar-12xx"'])


def test_pattern_escapes_and_classes():
    schema = {"type": "string", "pattern": "^\\d+\\.\\d{2}( USD)?$"}
    check(schema, ['"3.14"', '"100.00 USD"'], ['"3.1"', '".14"', '"3,14"'])


def test_pattern_agrees_with_re_fullmatch():
    """Oracle check: the compiled grammar and Python re must accept exactly
    the same strings over the supported regex subset."""
    import re

    cases = {
        "^[a-z]+@[a-z]+\\.(com|org)$":
            ["a@b.com", "xy@zz.org", "a@b.net", "@b.com", "a@.com"],
        "^-?\\d+(\\.\\d+)?([eE][-+]?\\d+)?$":
            ["1", "-2.5", "3e10", "1.5E-3", "1.", "e5", "--1"],
        "^(ab)*c{1,2}$": ["c", "ababcc", "abc", "ab", "ccc", ""],
        "^[^0-9]{3}$": ["abc", "a1c", "ab", "abcd", "x yz"[:3]],
        "^a.c$": ["abc", "a c", "ac", "abbc", "a\nc"],
    }
    for pattern, strings in cases.items():
        gbnf = json_schema_to_gbnf({"type": "string", "pattern": pattern},
                                   raw_pattern=True)
        for s in strings:
            want = re.fullmatch(pattern[1:-1], s) is not None
            if "\n" in s:  # grammar's `.` excludes newlines like JSON text
                want = False
            got = accepts(gbnf, s)
            assert got == want, (pattern, s, want, gbnf)


def test_pattern_unsupported_falls_back():
    """Lookahead is outside the subset → generic string rule, not a crash."""
    gbnf = json_schema_to_gbnf(
        {"type": "string", "pattern": "^(?=x)xy$"})
    assert accepts(gbnf, '"anything"')


def test_regex_to_grammar_tool(capsys):
    from llama_cpp_dsp_tpu.tools.regex_to_grammar import main

    assert main(["^[0-9]{4}$"]) == 0
    out = capsys.readouterr().out
    assert accepts(out, "1234") and not accepts(out, "123")


def test_pydantic_models_to_grammar():
    from pydantic import BaseModel

    from llama_cpp_dsp_tpu.grammar.pydantic_models import (
        pydantic_models_to_grammar,
    )

    class Point(BaseModel):
        x: int
        y: int

    class Tag(BaseModel):
        name: str

    gbnf = pydantic_models_to_grammar(Point)
    assert accepts(gbnf, '{"x": 1, "y": -2}')
    assert not accepts(gbnf, '{"x": "a", "y": 2}')
    both = pydantic_models_to_grammar(Point, Tag)
    assert accepts(both, '{"x": 1, "y": 2}')
    assert accepts(both, '{"name": "hi"}')
