"""Regex → GBNF expression compiler — the `pattern` keyword of the JSON
schema converter (reference common/json-schema-to-grammar.cpp _visit_pattern
and examples/regex_to_grammar.py).

Supported subset: literals, `.`, escapes (\\d \\w \\s and negations, \\n
\\r \\t, escaped metachars), character classes, groups `(...)`/`(?:...)`,
alternation, quantifiers `? * + {m} {m,} {m,n}` (lazy variants fold into
greedy — a grammar only decides ACCEPTANCE, where lazy == greedy).
Patterns must be anchored (`^...$`), like the reference converter.
Unsupported constructs (lookaround, backrefs, \\b anchors, inline flags)
raise ValueError — callers fall back to a generic string rule.
"""

from __future__ import annotations

__all__ = ["regex_to_gbnf_expr", "RegexUnsupported"]


class RegexUnsupported(ValueError):
    pass


_CLASS_SHORTHAND = {
    "d": "0-9",
    "w": "a-zA-Z0-9_",
    "s": " \\t\\n\\r",
}
_NEG_SHORTHAND = {"D": "0-9", "W": "a-zA-Z0-9_", "S": " \\t\\n\\r"}
_CTRL = {"n": "\\n", "r": "\\r", "t": "\\t"}


def _q(ch: str) -> str:
    """One literal char as a GBNF quoted string."""
    if ch == '"':
        return '"\\""'
    if ch == "\\":
        return '"\\\\"'
    return f'"{ch}"'


def _class_escape(ch: str) -> str:
    if ch in ("]", "\\"):
        return "\\" + ch
    return ch


class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.pos = 0

    def peek(self) -> str | None:
        return self.src[self.pos] if self.pos < len(self.src) else None

    def next(self) -> str:
        ch = self.src[self.pos]
        self.pos += 1
        return ch

    # alt := concat ('|' concat)*
    def parse_alt(self) -> str:
        parts = [self.parse_concat()]
        while self.peek() == "|":
            self.next()
            parts.append(self.parse_concat())
        return " | ".join(parts) if len(parts) > 1 else parts[0]

    # concat := rep*; adjacent unquantified literal chars merge into one
    # quoted run to keep the emitted grammar compact
    def parse_concat(self) -> str:
        out: list[str] = []
        lit: list[str] = []

        def flush():
            if lit:
                out.append('"' + "".join(lit) + '"')
                lit.clear()

        while self.peek() not in (None, "|", ")"):
            atom, quant, raw = self.parse_rep()
            if quant is None and raw is not None:
                lit.append(raw)
            else:
                flush()
                out.append(atom + (quant or ""))
        flush()
        if not out:
            return '""'
        return " ".join(out)

    # rep := atom quantifier?; returns (gbnf_atom, quantifier|None,
    # raw_literal_char|None — set when the atom is a plain literal char)
    def parse_rep(self) -> tuple[str, str | None, str | None]:
        atom, raw = self.parse_atom()
        quant = None
        c = self.peek()
        if c in ("?", "*", "+"):
            quant = self.next()
        elif c == "{":
            start = self.pos
            self.next()
            body = ""
            while self.peek() not in (None, "}"):
                body += self.next()
            if self.peek() != "}" or not _valid_bound(body):
                # not a quantifier (e.g. literal '{') — rewind
                self.pos = start
            else:
                self.next()
                quant = "{" + body + "}"
        if quant is not None and self.peek() == "?":
            self.next()  # lazy → greedy (acceptance-equivalent)
        return atom, quant, (raw if quant is None else None)

    def parse_atom(self) -> tuple[str, str | None]:
        c = self.next()
        if c == "(":
            if self.peek() == "?":
                self.next()
                k = self.peek()
                if k == ":":
                    self.next()
                else:
                    raise RegexUnsupported(f"(?{k}...) group")
            inner = self.parse_alt()
            if self.peek() != ")":
                raise RegexUnsupported("unbalanced group")
            self.next()
            return f"({inner})", None
        if c == "[":
            return self.parse_class(), None
        if c == ".":
            return "[^\\n\\r]", None
        if c == "\\":
            return self.parse_escape()
        if c in ("*", "+", "?", ")", "]", "{", "}"):
            if c in ("{", "}"):  # lone braces are literals
                return _q(c), c
            raise RegexUnsupported(f"dangling {c!r}")
        if c in ("^", "$"):
            raise RegexUnsupported(f"mid-pattern anchor {c!r}")
        esc = {'"': '\\"', "\\": "\\\\"}.get(c, c)
        return _q(c), esc

    def parse_escape(self) -> tuple[str, str | None]:
        if self.peek() is None:
            raise RegexUnsupported("trailing backslash")
        e = self.next()
        if e in _CLASS_SHORTHAND:
            return f"[{_CLASS_SHORTHAND[e]}]", None
        if e in _NEG_SHORTHAND:
            return f"[^{_NEG_SHORTHAND[e]}]", None
        if e in _CTRL:
            return f'"{_CTRL[e]}"', _CTRL[e]
        if e in ("b", "B", "A", "Z", "z") or e.isdigit():
            raise RegexUnsupported(f"\\{e}")
        esc = {'"': '\\"', "\\": "\\\\"}.get(e, e)
        return _q(e), esc

    def parse_class(self) -> str:
        out = []
        if self.peek() == "^":
            out.append(self.next())
        first = True
        while True:
            c = self.peek()
            if c is None:
                raise RegexUnsupported("unterminated class")
            if c == "]" and not first:
                self.next()
                break
            first = False
            c = self.next()
            if c == "\\":
                e = self.next() if self.peek() is not None else ""
                if e in _CLASS_SHORTHAND:
                    out.append(_CLASS_SHORTHAND[e])
                elif e in _CTRL:
                    out.append(_CTRL[e])
                elif e in _NEG_SHORTHAND:
                    raise RegexUnsupported(f"\\{e} inside class")
                else:
                    out.append(_class_escape(e))
            else:
                out.append(_class_escape(c))
        return "[" + "".join(out) + "]"


def _valid_bound(body: str) -> bool:
    parts = body.split(",")
    if len(parts) == 1:
        return parts[0].isdigit()
    if len(parts) == 2:
        return parts[0].isdigit() and (parts[1] == "" or parts[1].isdigit())
    return False


def regex_to_gbnf_expr(pattern: str) -> str:
    """Anchored regex → one GBNF expression matching the same language
    (the characters between ^ and $; no surrounding JSON quotes)."""
    if not (pattern.startswith("^") and pattern.endswith("$")):
        raise RegexUnsupported("pattern must be anchored (^...$)")
    p = _Parser(pattern[1:-1])
    expr = p.parse_alt()
    if p.pos != len(p.src):
        raise RegexUnsupported(f"trailing {p.src[p.pos:]!r}")
    return expr
