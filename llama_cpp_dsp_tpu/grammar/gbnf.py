"""GBNF grammar engine.

Faithful port of the reference's semantics (src/llama-grammar.cpp):
- GBNF text parser → rule table of (type, value) elements
  (llama_grammar_parser::parse, :48-350; repetitions expand into
  synthesized rules)
- pushdown-automaton stacks over rule elements
  (llama_grammar_advance_stack :688, llama_grammar_accept :826)
- candidate rejection with partial-UTF-8 handling
  (llama_grammar_reject_candidates_for_stack :851,
   llama_grammar_match_partial_char :637)
- left-recursion detection at init (:765)
- lazy grammars with trigger tokens/patterns for tool-call (:1041+)

Stacks are tuples of (rule_id, element_index) — hashable positions instead
of raw pointers.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# element types (llama_gretype, src/llama-grammar.h:13-39)
END = 0
ALT = 1
RULE_REF = 2
CHAR = 3
CHAR_NOT = 4
CHAR_RNG_UPPER = 5
CHAR_ALT = 6
CHAR_ANY = 7

Element = tuple[int, int]  # (type, value)
Rule = list[Element]
Pos = tuple[int, int]  # (rule_id, element_index)
Stack = tuple[Pos, ...]


class GrammarError(ValueError):
    pass


# ---------------------------------------------------------------------------
# GBNF text parser
# ---------------------------------------------------------------------------


class GbnfParser:
    def __init__(self) -> None:
        self.symbol_ids: dict[str, int] = {}
        self.rules: dict[int, Rule] = {}

    # -- low-level lexing ----------------------------------------------------
    def _get_symbol_id(self, name: str) -> int:
        if name not in self.symbol_ids:
            self.symbol_ids[name] = len(self.symbol_ids)
        return self.symbol_ids[name]

    def _generate_symbol_id(self, base: str) -> int:
        next_id = len(self.symbol_ids)
        self.symbol_ids[f"{base}_{next_id}"] = next_id
        return next_id

    def parse(self, text: str) -> "Grammar":
        src = text
        pos = 0
        n = len(src)

        def skip_ws():
            nonlocal pos
            while pos < n:
                c = src[pos]
                if c in " \t\r\n":
                    pos += 1
                elif c == "#":
                    while pos < n and src[pos] not in "\r\n":
                        pos += 1
                else:
                    break

        def skip_ws_inline():
            """whitespace within a rule body: newline ends the rule unless
            followed by indentation or mid-expression continuation."""
            nonlocal pos
            while pos < n:
                c = src[pos]
                if c == "#":
                    while pos < n and src[pos] not in "\r\n":
                        pos += 1
                elif c in " \t":
                    pos += 1
                elif c in "\r\n":
                    # lookahead: newline + ws + non-rule-start continues only
                    # if next non-ws char is not an identifier followed by ::=
                    save = pos
                    while pos < n and src[pos] in " \t\r\n":
                        pos += 1
                    rest = src[pos:]
                    if rest and not re.match(r"[a-zA-Z0-9\-_]+\s*::=", rest) and rest[0] in "|)":
                        continue
                    pos = save
                    break
                else:
                    break

        def parse_name() -> str:
            nonlocal pos
            m = re.match(r"[a-zA-Z0-9\-_]+", src[pos:])
            if not m:
                raise GrammarError(f"expecting name at {src[pos:pos+20]!r}")
            pos += m.end()
            return m.group(0)

        def parse_char() -> int:
            nonlocal pos
            c = src[pos]
            if c == "\\":
                pos += 1
                e = src[pos]
                pos += 1
                if e == "x":
                    v = int(src[pos : pos + 2], 16)
                    pos += 2
                    return v
                if e == "u":
                    v = int(src[pos : pos + 4], 16)
                    pos += 4
                    return v
                if e == "U":
                    v = int(src[pos : pos + 8], 16)
                    pos += 8
                    return v
                return {"t": 9, "r": 13, "n": 10, '"': 34, "[": 91, "]": 93, "\\": 92}.get(
                    e, ord(e)
                )
            pos += 1
            return ord(c)

        def parse_sequence(rule_name: str, out: Rule) -> None:
            nonlocal pos
            last_sym_start = len(out)
            while pos < n:
                skip_ws_inline()
                if pos >= n:
                    break
                c = src[pos]
                if c == '"':
                    pos += 1
                    last_sym_start = len(out)
                    while src[pos] != '"':
                        out.append((CHAR, parse_char()))
                    pos += 1
                elif c == "[":
                    pos += 1
                    start_type = CHAR
                    if src[pos] == "^":
                        pos += 1
                        start_type = CHAR_NOT
                    last_sym_start = len(out)
                    first = True
                    while src[pos] != "]":
                        if src[pos] == "." and start_type == CHAR and first and src[pos + 1] == "]":
                            pass  # '.' literal inside class
                        ch = parse_char()
                        etype = start_type if first else CHAR_ALT
                        out.append((etype, ch))
                        if src[pos] == "-" and src[pos + 1] != "]":
                            pos += 1
                            out.append((CHAR_RNG_UPPER, parse_char()))
                        first = False
                    pos += 1
                elif re.match(r"[a-zA-Z0-9\-_]", c):
                    name = parse_name()
                    ref_id = self._get_symbol_id(name)
                    last_sym_start = len(out)
                    out.append((RULE_REF, ref_id))
                elif c == "(":
                    pos += 1
                    skip_ws()
                    sub_id = self._generate_symbol_id(rule_name)
                    parse_alternates(rule_name, sub_id)
                    if src[pos] != ")":
                        raise GrammarError(f"expecting ')' at {src[pos:pos+20]!r}")
                    pos += 1
                    last_sym_start = len(out)
                    out.append((RULE_REF, sub_id))
                elif c == ".":
                    pos += 1
                    last_sym_start = len(out)
                    out.append((CHAR_ANY, 0))
                elif c in "*+?{":
                    if last_sym_start == len(out):
                        raise GrammarError(f"expecting content before {c!r}")
                    min_times, max_times = 0, -1
                    if c == "*":
                        pos += 1
                    elif c == "+":
                        pos += 1
                        min_times = 1
                    elif c == "?":
                        pos += 1
                        max_times = 1
                    else:
                        pos += 1
                        m = re.match(r"\s*(\d+)?\s*(,\s*(\d+)?\s*)?\}", src[pos:])
                        if not m:
                            raise GrammarError(f"bad repetition at {src[pos:pos+20]!r}")
                        if m.group(1) is not None:
                            min_times = int(m.group(1))
                            max_times = min_times if m.group(2) is None else -1
                        if m.group(3) is not None:
                            max_times = int(m.group(3))
                        pos += m.end()
                    # rewrite: S{m,n} → expansion via synthesized rule
                    previous = out[last_sym_start:]
                    del out[last_sym_start:]

                    def make_repetitions(mn: int, mx: int) -> list[Element]:
                        """port of the reference's rewrite:
                        S* → S' ::= S S' |; S+ → S' ::= S S' | S; etc."""
                        if mx == 0:
                            return []
                        sub_id = self._generate_symbol_id(rule_name)
                        sub: Rule = []
                        if mx < 0:
                            # (min_times, inf)
                            sub.extend(previous)
                            sub.append((RULE_REF, sub_id))
                            if mn == 0:
                                sub.append((ALT, 0))
                            else:
                                sub.append((ALT, 0))
                                sub.extend(previous)
                            sub.append((END, 0))
                            self.rules[sub_id] = sub
                            seq: list[Element] = []
                            for _ in range(max(mn - 1, 0)):
                                seq.extend(previous)
                            seq.append((RULE_REF, sub_id))
                            return seq
                        # bounded {mn, mx}
                        seq = []
                        for _ in range(mn):
                            seq.extend(previous)
                        opt_count = mx - mn
                        if opt_count > 0:
                            # nested optional rules
                            prev_opt: int | None = None
                            for _ in range(opt_count):
                                oid = self._generate_symbol_id(rule_name)
                                body: Rule = list(previous)
                                if prev_opt is not None:
                                    body.append((RULE_REF, prev_opt))
                                body.append((ALT, 0))
                                body.append((END, 0))
                                self.rules[oid] = body
                                prev_opt = oid
                            seq.append((RULE_REF, prev_opt))
                        return seq

                    out.extend(make_repetitions(min_times, max_times))
                    last_sym_start = len(out)
                else:
                    break

        def parse_alternates(rule_name: str, rule_id: int) -> None:
            nonlocal pos
            rule: Rule = []
            parse_sequence(rule_name, rule)
            skip_ws_inline()
            while pos < n and src[pos] == "|":
                pos += 1
                rule.append((ALT, 0))
                skip_ws()
                parse_sequence(rule_name, rule)
                skip_ws_inline()
            rule.append((END, 0))
            self.rules[rule_id] = rule

        skip_ws()
        while pos < n:
            name = parse_name()
            skip_ws()
            if src[pos : pos + 3] != "::=":
                raise GrammarError(f"expecting ::= at {src[pos:pos+20]!r}")
            pos += 3
            skip_ws()
            rule_id = self._get_symbol_id(name)
            parse_alternates(name, rule_id)
            skip_ws()

        if "root" not in self.symbol_ids:
            raise GrammarError("grammar does not contain a 'root' symbol")
        n_rules = len(self.symbol_ids)
        rules = [self.rules.get(i, [(END, 0)]) for i in range(n_rules)]
        # verify all referenced rules are defined
        for rid, rule in enumerate(rules):
            for t, v in rule:
                if t == RULE_REF and (v >= n_rules or v not in self.rules):
                    name = next(k for k, vv in self.symbol_ids.items() if vv == v)
                    raise GrammarError(f"undefined rule referenced: {name!r}")
        return Grammar(rules, self.symbol_ids["root"])


# ---------------------------------------------------------------------------
# pushdown automaton
# ---------------------------------------------------------------------------


def _is_end(el: Element) -> bool:
    return el[0] in (END, ALT)


@dataclass
class Grammar:
    rules: list[Rule]
    root: int
    stacks: list[Stack] = field(default_factory=list)
    # partial UTF-8 carry (value, n_remain)
    partial_utf8: tuple[int, int] = (0, 0)
    lazy: bool = False
    awaiting_trigger: bool = False
    trigger_tokens: set[int] = field(default_factory=set)
    trigger_patterns: list[str] = field(default_factory=list)
    trigger_buffer: str = ""

    def __post_init__(self) -> None:
        self._check_left_recursion()
        if not self.stacks:
            self.stacks = self._init_stacks()
        self.awaiting_trigger = self.lazy

    # -- init ---------------------------------------------------------------
    def _el(self, p: Pos) -> Element:
        return self.rules[p[0]][p[1]]

    def _init_stacks(self) -> list[Stack]:
        stacks: list[Stack] = []
        rule = self.rules[self.root]
        i = 0
        while True:
            stack: list[Pos] = []
            if not _is_end(rule[i]):
                stack.append((self.root, i))
            self._advance_stack(tuple(stack), stacks)
            while not _is_end(rule[i]):
                i += 1
            if rule[i][0] == ALT:
                i += 1
            else:
                break
        return stacks

    def _check_left_recursion(self) -> None:
        n = len(self.rules)
        visited = [False] * n
        in_progress = [False] * n
        may_be_empty = [False] * n

        def detect(ri: int) -> bool:
            if in_progress[ri]:
                return True
            in_progress[ri] = True
            rule = self.rules[ri]
            at_start = True
            for el in rule:
                if _is_end(el):
                    if at_start:
                        may_be_empty[ri] = True
                        break
                    at_start = True
                else:
                    at_start = False
            recurse = True
            for el in rule:
                if el[0] == RULE_REF and recurse:
                    if detect(el[1]):
                        return True
                    if not may_be_empty[el[1]]:
                        recurse = False
                elif _is_end(el):
                    recurse = True
                else:
                    recurse = False
            in_progress[ri] = False
            visited[ri] = True
            return False

        for i in range(n):
            if not visited[i] and detect(i):
                raise GrammarError(f"left recursion detected at rule {i}")

    # -- core automaton -------------------------------------------------------
    def _advance_stack(self, stack: Stack, out: list[Stack]) -> None:
        if not stack:
            if stack not in out:
                out.append(stack)
            return
        pos = stack[-1]
        t, v = self._el(pos)
        if t == RULE_REF:
            rule = self.rules[v]
            i = 0
            while True:
                new_stack = list(stack[:-1])
                nxt = (pos[0], pos[1] + 1)
                if not _is_end(self._el(nxt)):
                    new_stack.append(nxt)
                if not _is_end(rule[i]):
                    new_stack.append((v, i))
                self._advance_stack(tuple(new_stack), out)
                while not _is_end(rule[i]):
                    i += 1
                if rule[i][0] == ALT:
                    i += 1
                else:
                    break
        elif t in (CHAR, CHAR_NOT, CHAR_ANY):
            if stack not in out:
                out.append(stack)
        else:
            raise AssertionError(f"stack top must be char or ref, got {t}")

    def _match_char(self, pos: Pos, chr_: int) -> tuple[bool, Pos]:
        rid, i = pos
        rule = self.rules[rid]
        t = rule[i][0]
        is_positive = t in (CHAR, CHAR_ANY)
        found = False
        while True:
            el = rule[i]
            if i + 1 < len(rule) and rule[i + 1][0] == CHAR_RNG_UPPER:
                if el[1] <= chr_ <= rule[i + 1][1]:
                    found = True
                i += 2
            elif el[0] == CHAR_ANY:
                found = True
                i += 1
            else:
                if el[1] == chr_:
                    found = True
                i += 1
            if rule[i][0] != CHAR_ALT:
                break
        return found == is_positive, (rid, i)

    def _match_partial_char(self, pos: Pos, partial: tuple[int, int]) -> bool:
        rid, i = pos
        rule = self.rules[rid]
        t = rule[i][0]
        is_positive = t in (CHAR, CHAR_ANY)
        value, n_remain = partial
        if n_remain < 0 or (n_remain == 1 and value < 2):
            return False
        low = value << (n_remain * 6)
        high = low | ((1 << (n_remain * 6)) - 1)
        if low == 0:
            if n_remain == 2:
                low = 1 << 11
            elif n_remain == 3:
                low = 1 << 16
        while True:
            el = rule[i]
            if i + 1 < len(rule) and rule[i + 1][0] == CHAR_RNG_UPPER:
                if el[1] <= high and low <= rule[i + 1][1]:
                    return is_positive
                i += 2
            elif el[0] == CHAR_ANY:
                return True
            else:
                if low <= el[1] <= high:
                    return is_positive
                i += 1
            if rule[i][0] != CHAR_ALT:
                return not is_positive

    def accept_char(self, chr_: int) -> None:
        """llama_grammar_accept (:826)."""
        new_stacks: list[Stack] = []
        for stack in self.stacks:
            if not stack:
                continue
            ok, after = self._match_char(stack[-1], chr_)
            if ok:
                new_stack = list(stack[:-1])
                if not _is_end(self._el(after)):
                    new_stack.append(after)
                self._advance_stack(tuple(new_stack), new_stacks)
        self.stacks = new_stacks

    # -- candidate rejection --------------------------------------------------
    def _reject_for_stack(self, stack: Stack, candidates: list) -> list:
        """candidates: list of (index, cp_offset, code_points, partial)."""
        rejects = []
        if not stack:
            for tok in candidates:
                idx, off, cps, partial = tok
                if off < len(cps) or partial[1] != 0:
                    rejects.append(tok)
            return rejects
        stack_pos = stack[-1]
        next_candidates = []
        for tok in candidates:
            idx, off, cps, partial = tok
            if off >= len(cps):
                if partial[1] != 0 and not self._match_partial_char(stack_pos, partial):
                    rejects.append(tok)
            elif self._match_char(stack_pos, cps[off])[0]:
                next_candidates.append((idx, off + 1, cps, partial))
            else:
                rejects.append(tok)
        _, stack_pos_after = self._match_char(stack_pos, 0)
        stack_after = list(stack[:-1])
        if not _is_end(self._el(stack_pos_after)):
            stack_after.append(stack_pos_after)
        next_stacks: list[Stack] = []
        self._advance_stack(tuple(stack_after), next_stacks)
        for idx, off, cps, partial in self._reject(next_stacks, next_candidates):
            rejects.append((idx, off - 1, cps, partial))
        return rejects

    def _reject(self, stacks: list[Stack], candidates: list) -> list:
        if not candidates:
            return []
        assert stacks, "no stacks"
        rejects = self._reject_for_stack(stacks[0], candidates)
        for st in stacks[1:]:
            rejects = self._reject_for_stack(st, rejects)
        return rejects

    def reject_candidates(self, pieces: list[tuple[int, bytes]]) -> set[int]:
        """Which candidate tokens (index, utf8-piece) can NOT continue the
        grammar from the current state? (llama_grammar_apply_impl)"""
        if not self.stacks:
            return {i for i, _ in pieces}
        candidates = []
        for idx, piece in pieces:
            if not piece:
                continue
            cps, partial = decode_utf8(piece, self.partial_utf8)
            candidates.append((idx, 0, tuple(cps), partial))
        return {idx for idx, _, _, _ in self._reject(self.stacks, candidates)}

    def accept_piece(self, piece: bytes) -> None:
        """llama_grammar_accept_impl for one token's bytes."""
        cps, self.partial_utf8 = decode_utf8(piece, self.partial_utf8)
        for cp in cps:
            self.accept_char(cp)


def decode_utf8(piece: bytes, partial: tuple[int, int]) -> tuple[list[int], tuple[int, int]]:
    """Incremental UTF-8 decode with cross-token partial carry
    (reference decode_utf8, llama-grammar.cpp:16-45)."""
    lookup = (1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 3, 4)
    value, n_remain = partial
    cps: list[int] = []
    i = 0
    n = len(piece)
    if n_remain > 0:
        while n_remain > 0 and i < n:
            b = piece[i]
            if (b & 0xC0) != 0x80:
                return cps, (0, -1)  # invalid
            value = (value << 6) | (b & 0x3F)
            i += 1
            n_remain -= 1
        if n_remain == 0:
            cps.append(value)
            value = 0
    while i < n:
        b = piece[i]
        ln = lookup[b >> 4]
        if ln == 1 and b >= 0x80:
            return cps, (0, -1)
        mask = (1 << (8 - ln - 1)) - 1 if ln > 1 else 0x7F
        value = b & mask
        i += 1
        n_remain = ln - 1
        while n_remain > 0 and i < n:
            nb = piece[i]
            if (nb & 0xC0) != 0x80:
                return cps, (0, -1)
            value = (value << 6) | (nb & 0x3F)
            i += 1
            n_remain -= 1
        if n_remain == 0:
            cps.append(value)
            value = 0
    return cps, (value, n_remain)


def parse_gbnf(text: str) -> Grammar:
    # the reference's llguidance dispatch (common/sampling.cpp:156): grammar
    # strings beginning with %llguidance are Lark-dialect CFGs — translated
    # to GBNF (grammar/lark.py) instead of binding the Rust library
    from .lark import is_llguidance

    if is_llguidance(text):
        from .lark import lark_to_gbnf

        text = lark_to_gbnf(text)
    return GbnfParser().parse(text)


# ---------------------------------------------------------------------------
# sampler integration
# ---------------------------------------------------------------------------


class GrammarSampler:
    """Sampler-chain element: masks tokens the grammar rejects, accepts the
    sampled token (llama_sampler_grammar, llama-sampling.cpp:1433+)."""

    def __init__(self, grammar: Grammar, tokenizer, use_native: bool | None = None) -> None:
        self.grammar = grammar
        self.tokenizer = tokenizer
        self._piece_cache: dict[int, bytes] = {}
        # C++ PDA for the vocab-wide filter (native/grammar.cpp); the Python
        # Grammar stays authoritative for lazy-trigger state + EOG checks
        self._native = None
        if use_native is not False:
            try:
                from ..native.grammar_bind import NativeGrammar, get_lib

                if get_lib() is not None:
                    self._NativeGrammar = NativeGrammar
                    self._native = NativeGrammar(grammar.rules, grammar.root)
            except Exception:  # no compiler — Python fallback
                self._native = None

    def _native_sync_reset(self):
        if self._native is not None:
            self._native = self._NativeGrammar(self.grammar.rules, self.grammar.root)

    def _piece(self, tid: int) -> bytes:
        p = self._piece_cache.get(tid)
        if p is None:
            p = self.tokenizer.token_to_piece(tid, special=True)
            self._piece_cache[tid] = p
        return p

    def token_allowed(self, token: int) -> bool:
        """Cheap single-token check for the two-phase sampler (reference
        common_sampler_sample: apply grammar to the one sampled candidate)."""
        g = self.grammar
        if g.awaiting_trigger:
            return True
        if self.tokenizer.vocab.is_eog(token):
            return any(len(s) == 0 for s in g.stacks)
        piece = self._piece(token)
        eng = self._native if (self._native is not None and not g.lazy) else g
        return len(eng.reject_candidates([(0, piece)])) == 0

    def reset(self) -> None:
        g = self.grammar
        self.grammar = Grammar(
            g.rules, g.root, lazy=g.lazy,
            trigger_tokens=set(g.trigger_tokens),
            trigger_patterns=list(g.trigger_patterns),
        )
        self._native_sync_reset()

    def apply(self, cand, rng):
        import numpy as np

        g = self.grammar
        if g.awaiting_trigger:
            return None
        vocab = self.tokenizer.vocab
        pieces = []
        for i, tid in enumerate(cand.ids):
            tid = int(tid)
            if vocab.is_eog(tid):
                continue  # EOG allowed iff a stack is empty — handled below
            pieces.append((i, self._piece(tid)))
        if self._native is not None and not g.lazy:
            rejected = self._native.reject_candidates(pieces)
        else:
            rejected = g.reject_candidates(pieces)
        allow_eog = any(len(s) == 0 for s in g.stacks)
        neg = np.float32(-np.inf)
        for i, tid in enumerate(cand.ids):
            tid = int(tid)
            if vocab.is_eog(tid):
                if not allow_eog:
                    cand.logits[i] = neg
            elif i in rejected:
                cand.logits[i] = neg
        cand.probs = None
        cand.sorted = False
        return None

    def accept(self, token: int) -> None:
        g = self.grammar
        if g.awaiting_trigger:
            if token in g.trigger_tokens:
                g.awaiting_trigger = False
                g.trigger_buffer = ""
                g.accept_piece(self._piece(token))
                return
            piece = self._piece(token).decode("utf-8", errors="replace")
            g.trigger_buffer += piece
            for pat in g.trigger_patterns:
                m = re.search(pat, g.trigger_buffer)
                if m:
                    g.awaiting_trigger = False
                    start = m.start(1) if m.groups() else m.start()
                    for ch in g.trigger_buffer[start:]:
                        g.accept_char(ord(ch))
                    g.trigger_buffer = ""
                    return
            return
        if self.tokenizer.vocab.is_eog(token):
            return
        piece = self._piece(token)
        g.accept_piece(piece)
        if self._native is not None and not g.lazy:
            self._native.accept_piece(piece)
