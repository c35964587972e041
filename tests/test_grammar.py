"""GBNF grammar engine tests — accept/reject vectors in the style of
reference tests/test-grammar-integration.cpp and test-grammar-parser.cpp."""

import pytest

from llama_cpp_dsp_tpu.grammar.gbnf import GrammarError, decode_utf8, parse_gbnf


def matches(grammar_text: str, s: str) -> bool:
    g = parse_gbnf(grammar_text)
    for cp in s:
        before = list(g.stacks)
        g.accept_char(ord(cp))
        if not g.stacks:
            return False
    return any(len(st) == 0 for st in g.stacks)


SIMPLE = 'root ::= "ab"'
QUANTIFIERS = 'root ::= "a"* "b"+ "c"?'
ALTS = 'root ::= ("a" | "b") ("x" | "y")*'
RANGES = "root ::= [a-z]+ [0-9]{2,3}"
NESTED = """
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+ | "(" expr ")"
"""
ANYCHAR = 'root ::= "<" .* ">"'
NOT_RANGE = "root ::= [^ab]+"


@pytest.mark.parametrize(
    "grammar,accept,reject",
    [
        (SIMPLE, ["ab"], ["a", "abc", "ba", ""]),
        (QUANTIFIERS, ["b", "ab", "aab", "abbc", "bc"], ["", "a", "ac", "cb"]),
        (ALTS, ["a", "b", "ax", "byxy"], ["", "c", "xy", "aa"]),
        (RANGES, ["abc12", "z123", "q99"], ["abc", "12", "abc1", "abc1234", "ABC12"]),
        (NESTED, ["1", "12+3", "(1+2)+3", "((7))"], ["", "+", "1+", "(1", "1)"]),
        (ANYCHAR, ["<>", "<abc>", "<a<b>"], ["<", "abc"]),
        (NOT_RANGE, ["xyz", "c"], ["", "abc", "xay"]),
    ],
)
def test_grammar_vectors(grammar, accept, reject):
    for s in accept:
        assert matches(grammar, s), f"should accept {s!r}"
    for s in reject:
        assert not matches(grammar, s), f"should reject {s!r}"


def test_json_like_grammar():
    g = """
root ::= object
object ::= "{" ws ( string ":" ws value ("," ws string ":" ws value)* )? "}" ws
value ::= object | array | string | number | ("true" | "false" | "null") ws
array ::= "[" ws ( value ("," ws value)* )? "]" ws
string ::= "\\"" ( [^"\\\\\\x7F\\x00-\\x1F] )* "\\"" ws
number ::= ("-"? ([0-9] | [1-9] [0-9]*)) ("." [0-9]+)? ([eE] [-+]? [0-9]+)? ws
ws ::= [ \\t\\n]*
"""
    assert matches(g, "{}")
    assert matches(g, '{"a": 1}')
    assert matches(g, '{"a": [1, 2, "x"], "b": {"c": true}}')
    assert not matches(g, "[1]")
    assert not matches(g, '{"a": }')
    assert not matches(g, '{a: 1}')


def test_left_recursion_rejected():
    with pytest.raises(GrammarError):
        parse_gbnf('root ::= root "a" | "b"')


def test_undefined_rule_rejected():
    with pytest.raises(GrammarError):
        parse_gbnf("root ::= missing")


def test_missing_root_rejected():
    with pytest.raises(GrammarError):
        parse_gbnf('start ::= "a"')


def test_repetition_bounds():
    g = 'root ::= "a"{2,4}'
    assert not matches(g, "a")
    assert matches(g, "aa")
    assert matches(g, "aaa")
    assert matches(g, "aaaa")
    assert not matches(g, "aaaaa")
    g2 = 'root ::= "a"{3}'
    assert matches(g2, "aaa")
    assert not matches(g2, "aa")
    assert not matches(g2, "aaaa")


def test_utf8_chars():
    g = 'root ::= "日本" [ぁ-ん]+'
    assert matches(g, "日本ごは")
    assert not matches(g, "日本XY")


def test_decode_utf8_partial():
    # "é" = 0xC3 0xA9 split across two pieces
    cps, partial = decode_utf8(b"\xc3", (0, 0))
    assert cps == [] and partial[1] == 1
    cps, partial = decode_utf8(b"\xa9", partial)
    assert cps == [0xE9] and partial == (0, 0)


def test_token_rejection():
    """reject_candidates masks pieces that can't continue the grammar."""
    g = parse_gbnf('root ::= "hello" | "help"')
    pieces = [(0, b"hel"), (1, b"xyz"), (2, b"hello"), (3, b"helps")]
    rejected = g.reject_candidates(pieces)
    assert 1 in rejected
    assert 3 in rejected  # 'helps' overruns the grammar
    assert 0 not in rejected
    assert 2 not in rejected


def test_parse_tool_calls_formats():
    from llama_cpp_dsp_tpu.serve.chat import parse_tool_calls

    # hermes style
    text = 'Sure. <tool_call>{"name": "get_weather", "arguments": {"city": "SF"}}</tool_call>'
    content, calls = parse_tool_calls(text)
    assert content == "Sure."
    assert calls[0]["function"]["name"] == "get_weather"
    import json as _json
    assert _json.loads(calls[0]["function"]["arguments"]) == {"city": "SF"}

    # mistral style
    content, calls = parse_tool_calls('[TOOL_CALLS][{"name": "f", "arguments": {}}]')
    assert calls and calls[0]["function"]["name"] == "f"

    # bare llama3 json
    content, calls = parse_tool_calls('{"name": "g", "parameters": {"x": 1}}')
    assert content == "" and calls[0]["function"]["name"] == "g"

    # plain text untouched
    content, calls = parse_tool_calls("just words { not a call")
    assert calls == [] and "just words" in content


def test_parse_tool_calls_command_r7b():
    """command-r7b format (reference tests/test-chat.cpp:593-620)."""
    import json as _json

    from llama_cpp_dsp_tpu.serve.chat import extract_reasoning, parse_tool_calls

    # action block with tool_call_id preserved
    text = ('<|START_ACTION|>[\n'
            '    {"tool_call_id": "0", "tool_name": "special_function", '
            '"parameters": {"arg1": 1}}\n]<|END_ACTION|>')
    content, calls = parse_tool_calls(text)
    assert content == ""
    assert calls[0]["id"] == "0"
    assert calls[0]["function"]["name"] == "special_function"
    assert _json.loads(calls[0]["function"]["arguments"]) == {"arg1": 1}

    # response wrapper unwrapped
    content, calls = parse_tool_calls(
        "<|START_RESPONSE|>Hello, world!\nWhat's up?<|END_RESPONSE|>")
    assert calls == [] and content == "Hello, world!\nWhat's up?"

    # bare ...<|END_RESPONSE|> (reference test-chat.cpp:600-604)
    content, calls = parse_tool_calls("Hello, world!\nWhat's up?<|END_RESPONSE|>")
    assert calls == [] and content == "Hello, world!\nWhat's up?"

    # empty thinking pair dropped (test-chat.cpp:613-616)
    content, calls = parse_tool_calls(
        '<|START_THINKING|><|END_THINKING|><|START_ACTION|>[{"tool_call_id":'
        ' "0", "tool_name": "f", "parameters": {}}]<|END_ACTION|>')
    assert content == "" and calls[0]["function"]["name"] == "f"

    # reasoning extraction
    reasoning, rest = extract_reasoning(
        "<|START_THINKING|>I'm thinking<|END_THINKING|>"
        "<|START_RESPONSE|>Hello, world!\nWhat's up?<|END_RESPONSE|>")
    assert reasoning == "I'm thinking"
    content, calls = parse_tool_calls(rest)
    assert content == "Hello, world!\nWhat's up?"


def test_parse_tool_calls_llama3_python_tag():
    """llama-3.x builtin tools (reference tests/test-chat.cpp:810-812)."""
    import json as _json

    from llama_cpp_dsp_tpu.serve.chat import parse_tool_calls

    for name in ("code_interpreter", "python"):
        content, calls = parse_tool_calls(
            f"<|python_tag|>{name}.call(code=\"print('hey')\")")
        assert content == ""
        assert calls[0]["function"]["name"] == name
        assert _json.loads(calls[0]["function"]["arguments"]) == {
            "code": "print('hey')"}

    # not a builtin call → untouched
    content, calls = parse_tool_calls("<|python_tag|>print('hey')")
    assert calls == []
