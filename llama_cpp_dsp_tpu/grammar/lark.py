"""llguidance-style Lark grammars → GBNF.

The reference optionally links the llguidance Rust library: grammar strings
beginning with ``%llguidance`` switch the sampler to its Lark-dialect CFGs
(common/sampling.cpp:156, common/llguidance.cpp, docs/llguidance.md). This
environment has no Rust toolchain, so instead of binding the library we
translate the Lark dialect into GBNF and run it on the existing PDA engine
(grammar/gbnf.py + the native C++ twin) — same user surface, same
constrained output language for the supported subset.

Supported (mirrors the reference's tests/test-grammar-llguidance.cpp):
  - rules ``name: expansion`` (lowercase CFG rules and UPPERCASE lexemes
    are treated alike — our engine is scannerless); ``?name``/``!name``
    tree-shaping prefixes are ignored
  - string literals ``"..."`` (Lark escapes), regex terminals ``/.../``
    (translated via grammar/regex.py), character ranges ``"a".."z"``
  - alternation ``|``, groups ``(...)``, optional ``[...]``,
    quantifiers ``* + ?`` and ``~ n`` / ``~ n..m``
  - ``%json {schema}`` (llguidance's JSON Schema directive) via
    grammar/json_schema.py
  - ``start`` is the root rule (GBNF ``root``)

Unsupported constructs raise ``LarkUnsupported`` with the offending text —
matching llguidance's own error-not-silence policy for unknown schema
keywords (docs/llguidance.md "Error Handling").
"""

from __future__ import annotations

import json
import re

__all__ = ["LarkUnsupported", "is_llguidance", "lark_to_gbnf"]


class LarkUnsupported(ValueError):
    pass


def is_llguidance(text: str) -> bool:
    """The reference's dispatch rule (common/sampling.cpp:156)."""
    return text.lstrip().startswith("%llguidance")


_RULE_RE = re.compile(r"^\s*[?!]?([a-zA-Z_][\w\-]*)\s*:(?!:)\s*(.*)$")


def _strip_comment(line: str) -> str:
    """Cut a ``//`` comment, ignoring slashes inside "..." or /.../."""
    quote = None
    i = 0
    while i < len(line):
        ch = line[i]
        if quote:
            if ch == "\\":
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in ('"', "/"):
            if ch == "/" and line[i:i + 2] == "//":
                return line[:i]
            quote = ch
        i += 1
    return line


def _split_rules(src: str) -> list[tuple[str, str]]:
    rules: list[tuple[str, str]] = []
    for raw in src.splitlines():
        line = _strip_comment(raw).rstrip()
        if not line.strip():
            continue
        if line.lstrip().startswith("%llguidance"):
            continue  # header attribute line
        if line.lstrip().startswith("%ignore"):
            raise LarkUnsupported(
                "%ignore is not supported by the GBNF translation (make "
                "whitespace explicit in the rules)")
        m = _RULE_RE.match(line)
        if m and not line.lstrip().startswith("%"):
            rules.append((m.group(1), m.group(2)))
        elif rules:
            rules[-1] = (rules[-1][0], rules[-1][1] + " " + line.strip())
        else:
            raise LarkUnsupported(f"expected `rule: ...`, got {line!r}")
    if not rules:
        raise LarkUnsupported("no rules found")
    return rules


def _gbnf_literal(s: str) -> str:
    out = []
    for ch in s:
        if ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return '"' + "".join(out) + '"'


_ESCAPES = {"n": "\n", "r": "\r", "t": "\t", "\\": "\\", '"': '"',
            "'": "'", "/": "/", "0": "\0", "f": "\f", "b": "\b"}


class _Expansion:
    """Recursive-descent parser over one rule expansion."""

    def __init__(self, src: str, aux: list[tuple[str, str]], rule: str):
        self.src = src
        self.pos = 0
        self.aux = aux  # extra generated rules (regex/json expansions)
        self.rule = rule
        self.n_aux = 0

    # -- lexing helpers ------------------------------------------------------
    def _ws(self):
        while self.pos < len(self.src) and self.src[self.pos] in " \t":
            self.pos += 1

    def _peek(self) -> str:
        self._ws()
        return self.src[self.pos] if self.pos < len(self.src) else ""

    def _string(self) -> str:
        assert self.src[self.pos] == '"'
        self.pos += 1
        out = []
        while True:
            if self.pos >= len(self.src):
                raise LarkUnsupported(f"unterminated string in {self.src!r}")
            ch = self.src[self.pos]
            self.pos += 1
            if ch == '"':
                break
            if ch == "\\":
                e = self.src[self.pos]
                self.pos += 1
                if e in _ESCAPES:
                    out.append(_ESCAPES[e])
                elif e == "x":
                    out.append(chr(int(self.src[self.pos:self.pos + 2], 16)))
                    self.pos += 2
                elif e == "u":
                    out.append(chr(int(self.src[self.pos:self.pos + 4], 16)))
                    self.pos += 4
                else:
                    raise LarkUnsupported(f"escape \\{e}")
            else:
                out.append(ch)
        if self.pos < len(self.src) and self.src[self.pos] == "i":
            raise LarkUnsupported("case-insensitive literals (\"...\"i)")
        return "".join(out)

    def _regex(self) -> str:
        assert self.src[self.pos] == "/"
        self.pos += 1
        out = []
        while True:
            if self.pos >= len(self.src):
                raise LarkUnsupported(f"unterminated regex in {self.src!r}")
            ch = self.src[self.pos]
            self.pos += 1
            if ch == "/":
                break
            if ch == "\\":
                nxt = self.src[self.pos]
                self.pos += 1
                if nxt == "/":
                    out.append("/")
                else:
                    out.append("\\" + nxt)
            else:
                out.append(ch)
        while self.pos < len(self.src) and self.src[self.pos] in "imslux":
            raise LarkUnsupported("regex flags")
        return "".join(out)

    # -- grammar -------------------------------------------------------------
    def parse_alt(self) -> str:
        parts = [self.parse_seq()]
        while self._peek() == "|":
            self.pos += 1
            parts.append(self.parse_seq())
        return " | ".join(p if p else '""' for p in parts)

    def parse_seq(self) -> str:
        items = []
        while True:
            c = self._peek()
            if c in ("", "|", ")", "]"):
                break
            items.append(self.parse_item())
        return " ".join(items)

    def parse_item(self) -> str:
        atom = self.parse_atom()
        # postfix quantifiers
        while True:
            c = self._peek()
            if c and c in "*+?":
                self.pos += 1
                atom = f"{atom}{c}"
            elif c == "~":
                self.pos += 1
                self._ws()
                m = re.match(r"(\d+)(?:\s*\.\.\s*(\d+))?",
                             self.src[self.pos:])
                if not m:
                    raise LarkUnsupported(
                        f"bad ~ repetition at {self.src[self.pos:]!r}")
                self.pos += m.end()
                lo, hi = m.group(1), m.group(2)
                atom = (f"{atom}{{{lo},{hi}}}" if hi is not None
                        else f"{atom}{{{lo}}}")
            else:
                break
        return atom

    def parse_atom(self) -> str:
        c = self._peek()
        if c == "(":
            self.pos += 1
            inner = self.parse_alt()
            if self._peek() != ")":
                raise LarkUnsupported(f"missing ) in {self.src!r}")
            self.pos += 1
            return f"({inner})"
        if c == "[":
            self.pos += 1
            inner = self.parse_alt()
            if self._peek() != "]":
                raise LarkUnsupported(f"missing ] in {self.src!r}")
            self.pos += 1
            return f"({inner})?"
        if c == '"':
            s = self._string()
            self._ws()
            if self.src[self.pos:self.pos + 2] == "..":
                # character range "a".."z"
                self.pos += 2
                self._ws()
                if self._peek() != '"':
                    raise LarkUnsupported(f"bad range in {self.src!r}")
                hi = self._string()
                if len(s) != 1 or len(hi) != 1:
                    raise LarkUnsupported("range endpoints must be single "
                                          "characters")

                def esc(ch: str) -> str:  # GBNF char-class escaping
                    return "\\" + ch if ch in "]\\^-" else ch

                return f"[{esc(s)}-{esc(hi)}]"
            return _gbnf_literal(s)
        if c == "/":
            pat = self._regex()
            from .regex import regex_to_gbnf_expr

            expr = regex_to_gbnf_expr(f"^{pat}$")
            return f"({expr})"
        if c == "%":
            m = re.match(r"%json\b", self.src[self.pos:])
            if m:
                self.pos += m.end()
                self._ws()
                dec = json.JSONDecoder()
                schema, end = dec.raw_decode(self.src[self.pos:])
                self.pos += end
                from .json_schema import json_schema_to_gbnf

                sub = json_schema_to_gbnf(schema)
                prefix = f"{self.rule}-json{self.n_aux}"
                self.n_aux += 1
                root = _inline_grammar(sub, prefix, self.aux)
                return root
            raise LarkUnsupported(
                f"directive at {self.src[self.pos:self.pos + 20]!r}")
        m = re.match(r"[?!]?([a-zA-Z_][\w\-]*)", self.src[self.pos:])
        if m:
            self.pos += m.end()
            name = m.group(1)
            return "root" if name == "start" else name.lower()
        raise LarkUnsupported(f"unexpected {self.src[self.pos:][:20]!r}")


def _inline_grammar(gbnf: str, prefix: str, aux: list[tuple[str, str]]) -> str:
    """Inline a standalone GBNF grammar under prefixed rule names; returns
    the prefixed root name."""
    from .gbnf import parse_gbnf  # validates the sub-grammar early

    parse_gbnf(gbnf)
    names = set(re.findall(r"(?m)^([a-zA-Z_][\w\-]*)\s*::=", gbnf))

    def _rename(segment: str) -> str:
        for n in names:
            segment = re.sub(rf"(?<![\w\-]){re.escape(n)}(?![\w\-])",
                             f"{prefix}-{n}", segment)
        return segment

    # rename rule references only OUTSIDE string literals (a schema key
    # like "root" must not be rewritten inside a quoted literal)
    parts = re.split(r'("(?:\\.|[^"\\])*")', gbnf)
    text = "".join(p if i % 2 else _rename(p) for i, p in enumerate(parts))
    for line in text.splitlines():
        mm = re.match(r"^([a-zA-Z_][\w\-]*)\s*::=\s*(.*)$", line)
        if mm:
            aux.append((mm.group(1), mm.group(2)))
        elif line.strip():
            aux[-1] = (aux[-1][0], aux[-1][1] + " " + line.strip())
    return f"{prefix}-root"


def lark_to_gbnf(src: str) -> str:
    """Translate an llguidance Lark-dialect grammar into GBNF text."""
    body = src.lstrip()
    if body.startswith("%llguidance"):
        # header: `%llguidance {...attributes...}` — attributes unused here
        nl = body.find("\n")
        body = body[nl + 1:] if nl >= 0 else ""
    rules = _split_rules(body)
    out: list[tuple[str, str]] = []
    aux: list[tuple[str, str]] = []
    seen = set()
    for name, expansion in rules:
        gname = "root" if name == "start" else name.lower()
        p = _Expansion(expansion, aux, gname)
        expr = p.parse_alt()
        p._ws()
        if p.pos < len(p.src):
            raise LarkUnsupported(f"trailing {p.src[p.pos:]!r} in {name}")
        if gname in seen:
            raise LarkUnsupported(f"duplicate rule {name}")
        seen.add(gname)
        out.append((gname, expr if expr else '""'))
    if "root" not in seen:
        raise LarkUnsupported("no `start` rule")
    lines = [f"{n} ::= {e}" for n, e in out + aux]
    return "\n".join(lines) + "\n"
