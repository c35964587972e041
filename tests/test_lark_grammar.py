"""llguidance Lark-dialect grammar support (grammar/lark.py).

Test vectors mirror the reference's tests/test-grammar-llguidance.cpp
(quantifiers, special chars, medium-complexity grammar, regex repetition
ranges, %json directive) — the same strings must pass/fail through our
GBNF PDA after translation."""

import json

import pytest

from llama_cpp_dsp_tpu.grammar.gbnf import parse_gbnf
from llama_cpp_dsp_tpu.grammar.lark import (
    LarkUnsupported, is_llguidance, lark_to_gbnf,
)


def accepts(grammar_text: str, s: str) -> bool:
    g = parse_gbnf(grammar_text)
    for cp in s:
        g.accept_char(ord(cp))
        if not g.stacks:
            return False
    return any(len(st) == 0 for st in g.stacks)


def check(grammar: str, passing, failing):
    for s in passing:
        assert accepts(grammar, s), (grammar, s, "should pass")
    for s in failing:
        assert not accepts(grammar, s), (grammar, s, "should fail")


def test_is_llguidance():
    assert is_llguidance("%llguidance {}\nstart: \"a\"")
    assert not is_llguidance('root ::= "a"')


def test_quantifiers():
    # reference test-grammar-llguidance.cpp test_quantifiers
    check('%llguidance {}\nstart: "a"*', ["", "a", "aaaaa"],
          ["b", "ab", "aab", "ba"])
    check('%llguidance {}\nstart: "a"+', ["a", "aaaaa"], ["", "b", "ab"])
    check('%llguidance {}\nstart: "a"?', ["", "a"], ["b", "aa", "ab"])
    check("""%llguidance {}
start: cons+ vowel* cons? (vowel cons)*
vowel: /[aeiouy]/
cons: /[bcdfghjklmnpqrstvwxyz]/
""",
          ["yes", "no", "noyes", "crwth", "four", "bryyyy"],
          ["yess", "yesno", "forty", "catyyy"])


def test_special_chars():
    check('%llguidance {}\nstart: /.../ "abc" /.../',
          ["abcabcabc", "aaaabcccc", "🔵🟠✅abc❌🟠🔵"],
          ["aaabcccc", "aaaaabcccc", "aaaabccc", "aaaabccccc",
           "🔵🟠✅❌abc❌✅🟠🔵", "🔵🟠abc🟠🔵"])


def test_regex_repetition_ranges():
    check('%llguidance {}\nstart: /[ab]{4}/',
          ["aaaa", "bbbb", "abab"], ["a", "b", "aaa", "aaaaa", "aaab"[:3]])
    check('%llguidance {}\nstart: /[ab]{4,}/',
          ["aaaa", "aaaaab", "bbbbbb"], ["aaa", "bb"])
    check('%llguidance {}\nstart: /[ab]{0,4}/',
          ["", "a", "ab", "abab"], ["ababa", "aaaaa"])


def test_tilde_repetition():
    check('%llguidance {}\nstart: "ab" ~ 2..3',
          ["abab", "ababab"], ["ab", "abababab", ""])
    check('%llguidance {}\nstart: "x" ~ 3', ["xxx"], ["xx", "xxxx"])


def test_medium_complexity_grammar():
    g = """%llguidance {}
start: expression
expression: term ws (("+"|"-") ws term)*
term: factor ws (("*"|"/") ws factor)*
factor: number | variable | "(" expression ")" | function-call
number: /[0-9]+/
variable: /[a-zA-Z_][a-zA-Z0-9_]*/
function-call: variable ws "(" (expression ("," ws expression)*)? ")"
ws: /[ \\t\\n\\r]?/
"""
    check(g, ["42", "1*2*3*4*5", "x", "x+10", "x1+y2", "(a+b)*(c-d)",
              "func()", "func(x,y+2)"],
          ["+", "/ 3", "x + + y", "a * / b", "func(,)", "func(x,)",
           "(a+b"])


def test_char_range_and_optional_brackets():
    check('%llguidance {}\nstart: ("a".."f")+ ["!"]',
          ["abc", "def!", "f"], ["g", "abg", "!", ""])


def test_start_rule_required_and_errors():
    with pytest.raises(LarkUnsupported):
        lark_to_gbnf('%llguidance {}\nfoo: "a"')
    with pytest.raises(LarkUnsupported):
        lark_to_gbnf('%llguidance {}\nstart: "a"\n%ignore /\\s+/')
    with pytest.raises(LarkUnsupported):
        lark_to_gbnf('%llguidance {}\nstart: "a"i')


def test_json_directive():
    schema = {"type": "object",
              "properties": {"n": {"type": "integer"}},
              "required": ["n"],
              "additionalProperties": False}
    g = "%llguidance {}\nstart: %json " + json.dumps(schema)
    check(g, ['{"n": 1}', '{"n": -5}'],
          ['{"n": "x"}', '{}', '{"m": 1}'])


def test_sampler_integration():
    """parse_gbnf dispatches on the %llguidance prefix end-to-end (the
    reference's common_sampler surface, common/sampling.cpp:156)."""
    g = parse_gbnf('%llguidance {}\nstart: "yes" | "no"')
    for cp in "yes":
        g.accept_char(ord(cp))
        assert g.stacks
    assert any(len(st) == 0 for st in g.stacks)


def test_comment_and_slash_literals():
    g = lark_to_gbnf('%llguidance {}\n'
                     'start: "http://x" // trailing comment\n')
    assert "http://x" in g
    assert "comment" not in g
