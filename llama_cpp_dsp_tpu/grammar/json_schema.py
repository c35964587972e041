"""JSON schema → GBNF grammar compiler.

Capability mirror of reference common/json-schema-to-grammar.cpp: turns a
(draft-7-ish) JSON schema into a GBNF grammar whose language is exactly the
JSON documents admitted by the schema. Supports: type (object/array/string/
number/integer/boolean/null), properties/required/additionalProperties,
items/prefixItems/minItems/maxItems, enum/const, oneOf/anyOf/allOf, $ref
(local), $defs/definitions, string min/maxLength and common formats
(date/time/date-time/uuid).
"""

from __future__ import annotations

import json
import re
from typing import Any

SPACE_RULE = '| " " | "\\n"{1,2} [ \\t]{0,20}'

PRIMITIVE_RULES: dict[str, str] = {
    "space": '"" ' + SPACE_RULE,
    "boolean": '("true" | "false") space',
    "null": '"null" space',
    "string": r'"\"" char* "\"" space',
    "char": r'[^"\\\x7F\x00-\x1F] | [\\] (["\\bfnrt] | "u" [0-9a-fA-F]{4})',
    "number": '("-"? ([0-9] | [1-9] [0-9]{0,15})) ("." [0-9]{1,16})? ([eE] [-+]? [0-9] [1-9]{0,15})? space',
    "integer": '("-"? ([0-9] | [1-9] [0-9]{0,15})) space',
    "value": "object | array | string | number | boolean | null",
    "object": '"{" space ( string ":" space value ("," space string ":" space value)* )? "}" space',
    "array": '"[" space ( value ("," space value)* )? "]" space',
    "uuid": r'"\"" [0-9a-fA-F]{8} "-" [0-9a-fA-F]{4} "-" [0-9a-fA-F]{4} "-" [0-9a-fA-F]{4} "-" [0-9a-fA-F]{12} "\"" space',
    "date": '[0-9]{4} "-" ("0" [1-9] | "1" [0-2]) "-" ("0" [1-9] | [1-2] [0-9] | "3" [0-1])',
    "time": '([01] [0-9] | "2" [0-3]) ":" [0-5] [0-9] ":" [0-5] [0-9] ("." [0-9]{3})? ("Z" | ("+" | "-") ("0" [0-9] | "1" [0-3]) ":" [0-5] [0-9])',
    "date-time": 'date "T" time',
    "date-string": '"\\"" date "\\"" space',
    "time-string": '"\\"" time "\\"" space',
    "date-time-string": '"\\"" date-time "\\"" space',
}

_PRIM_DEPS = {
    "value": ["object", "array", "string", "number", "boolean", "null"],
    "object": ["string", "value"],
    "array": ["value"],
    "string": ["char"],
    "date-time": ["date", "time"],
    "date-string": ["date"],
    "time-string": ["time"],
    "date-time-string": ["date-time"],
}

_INVALID_RULE_CHARS = re.compile(r"[^a-zA-Z0-9-]+")


def _escape_literal(s: str) -> str:
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
        elif ord(ch) < 0x20:
            out.append(f"\\x{ord(ch):02x}")
        else:
            out.append(ch)
    return "".join(out)


def _json_literal(value: Any) -> str:
    return '"' + _escape_literal(json.dumps(value, ensure_ascii=False)) + '" space'


class SchemaConverter:
    def __init__(self, schema: Any, raw_pattern: bool = False):
        self.schema = schema
        self.rules: dict[str, str] = {}
        self.refs: dict[str, Any] = {}
        # raw_pattern: `pattern` strings match the bare text instead of a
        # JSON-quoted string (reference --raw-pattern)
        self.raw_pattern = raw_pattern

    # -- rule management ----------------------------------------------------
    def _add_rule(self, name: str, rule: str) -> str:
        esc = _INVALID_RULE_CHARS.sub("-", name) or "rule"
        if esc in self.rules:
            if self.rules[esc] == rule:
                return esc
            i = 0
            while f"{esc}{i}" in self.rules and self.rules[f"{esc}{i}"] != rule:
                i += 1
            esc = f"{esc}{i}"
        self.rules[esc] = rule
        return esc

    def _add_primitive(self, name: str) -> str:
        if name in self.rules:
            return name
        self._add_rule(name, PRIMITIVE_RULES[name])
        for dep in _PRIM_DEPS.get(name, []):
            self._add_primitive(dep)
        return name

    # -- $ref resolution ------------------------------------------------------
    def _resolve_ref(self, ref: str) -> Any:
        if not ref.startswith("#/"):
            raise ValueError(f"only local refs supported: {ref}")
        node = self.schema
        for part in ref[2:].split("/"):
            part = part.replace("~1", "/").replace("~0", "~")
            node = node[part]
        return node

    # -- visitors --------------------------------------------------------------
    def visit(self, schema: Any, name: str) -> str:
        rule_name = name or "root"
        if schema is True or schema == {}:
            self._add_primitive("value")
            self._add_primitive("space")
            return self._add_rule(rule_name, "value")
        if schema is False:
            raise ValueError("unsatisfiable schema: false")

        if "$ref" in schema:
            target = self._resolve_ref(schema["$ref"])
            ref_name = schema["$ref"].split("/")[-1]
            if ref_name not in self.rules:
                self.rules[ref_name] = "placeholder"  # break cycles
                self.rules[ref_name] = self.rules.pop(self.visit(target, ref_name + "-tmp"))
                # simpler: visit under its own name
            return self._add_rule(rule_name, ref_name) if rule_name != ref_name else ref_name

        if "oneOf" in schema or "anyOf" in schema:
            alts = schema.get("oneOf") or schema.get("anyOf")
            rules = [self.visit(alt, f"{rule_name}-{i}") for i, alt in enumerate(alts)]
            return self._add_rule(rule_name, " | ".join(rules))

        if "allOf" in schema:
            merged: dict[str, Any] = {}
            for part in schema["allOf"]:
                if "$ref" in part:
                    part = self._resolve_ref(part["$ref"])
                for k, v in part.items():
                    if k == "properties":
                        merged.setdefault("properties", {}).update(v)
                    elif k == "required":
                        merged.setdefault("required", [])
                        merged["required"] = list(dict.fromkeys(merged["required"] + v))
                    else:
                        merged.setdefault(k, v)
            return self.visit(merged, rule_name)

        if "const" in schema:
            self._add_primitive("space")
            return self._add_rule(rule_name, _json_literal(schema["const"]))

        if "enum" in schema:
            self._add_primitive("space")
            alts = " | ".join(f'"{_escape_literal(json.dumps(v, ensure_ascii=False))}"'
                              for v in schema["enum"])
            return self._add_rule(rule_name, f"({alts}) space")

        stype = schema.get("type")
        if isinstance(stype, list):
            rules = [
                self.visit({**schema, "type": t}, f"{rule_name}-{t}") for t in stype
            ]
            return self._add_rule(rule_name, " | ".join(rules))

        if stype == "object" or (stype is None and "properties" in schema):
            return self._visit_object(schema, rule_name)
        if stype == "array" or (stype is None and ("items" in schema or "prefixItems" in schema)):
            return self._visit_array(schema, rule_name)
        if stype == "string":
            return self._visit_string(schema, rule_name)
        if stype in ("number", "integer"):
            self._add_primitive("space")
            self._add_primitive(stype)
            return self._add_rule(rule_name, stype)
        if stype == "boolean":
            self._add_primitive("space")
            self._add_primitive("boolean")
            return self._add_rule(rule_name, "boolean")
        if stype == "null":
            self._add_primitive("space")
            self._add_primitive("null")
            return self._add_rule(rule_name, "null")
        # untyped
        self._add_primitive("space")
        self._add_primitive("value")
        return self._add_rule(rule_name, "value")

    def _visit_object(self, schema: dict, rule_name: str) -> str:
        self._add_primitive("space")
        props = schema.get("properties", {})
        required = set(schema.get("required", []))
        additional = schema.get("additionalProperties", True)

        prop_rules: list[tuple[str, str, bool]] = []
        for key, sub in props.items():
            sub_rule = self.visit(sub, f"{rule_name}-{key}")
            kv_rule = self._add_rule(
                f"{rule_name}-{key}-kv",
                f'"\\"{_escape_literal(key)}\\"" space ":" space {sub_rule}',
            )
            prop_rules.append((key, kv_rule, key in required))

        parts: list[str] = ['"{" space']
        req = [r for _, r, is_req in prop_rules if is_req]
        opt = [r for _, r, is_req in prop_rules if not is_req]

        if req or opt or (additional is not False):
            body_alts = []
            if req:
                seq = (' "," space '.join(req))
                tail = ""
                for orule in opt:
                    tail += f' ("," space {orule})?'
                body_alts.append(seq + tail)
            elif opt:
                # any non-empty subset in order
                for i, orule in enumerate(opt):
                    rest = ""
                    for o2 in opt[i + 1 :]:
                        rest += f' ("," space {o2})?'
                    body_alts.append(orule + rest)
            if additional is not False:
                self._add_primitive("string")
                self._add_primitive("value")
                if isinstance(additional, dict):
                    ad_rule = self.visit(additional, f"{rule_name}-additional")
                else:
                    ad_rule = "value"
                ad_kv = self._add_rule(
                    f"{rule_name}-ad-kv", f'string ":" space {ad_rule}'
                )
                if body_alts:
                    body_alts = [f'{alt} ("," space {ad_kv})*' for alt in body_alts]
                    # additional-only form is legal only when nothing is
                    # required (required keys must appear in every object)
                    if not req:
                        body_alts.append(f'{ad_kv} ("," space {ad_kv})*')
                else:
                    body_alts.append(f'{ad_kv} ("," space {ad_kv})*')
            if body_alts:
                joined = " | ".join(body_alts)
                parts.append(f"( {joined} )?" if not req else f"( {joined} )")
        parts.append('"}" space')
        return self._add_rule(rule_name, " ".join(parts))

    def _visit_array(self, schema: dict, rule_name: str) -> str:
        self._add_primitive("space")
        if "prefixItems" in schema:
            item_rules = [
                self.visit(sub, f"{rule_name}-{i}")
                for i, sub in enumerate(schema["prefixItems"])
            ]
            seq = ' "," space '.join(item_rules)
            return self._add_rule(rule_name, f'"[" space {seq} "]" space')
        items = schema.get("items", True)
        item_rule = self.visit(items if isinstance(items, dict) else {}, f"{rule_name}-item")
        min_items = int(schema.get("minItems", 0))
        max_items = schema.get("maxItems")
        if min_items == 0 and max_items is None:
            body = f'( {item_rule} ("," space {item_rule})* )?'
        else:
            lo = max(min_items - 1, 0)
            hi = "" if max_items is None else str(int(max_items) - 1)
            rep = f'{{{lo},{hi}}}' if (lo, hi) != (0, "") else "*"
            head = item_rule if min_items >= 1 else f"( {item_rule}"
            body = f'{item_rule} ("," space {item_rule}){rep}'
            if min_items == 0:
                body = f"( {body} )?"
        return self._add_rule(rule_name, f'"[" space {body} "]" space')

    def _visit_string(self, schema: dict, rule_name: str) -> str:
        self._add_primitive("space")
        pattern = schema.get("pattern")
        if pattern is not None:
            from .regex import RegexUnsupported, regex_to_gbnf_expr

            try:
                expr = f"({regex_to_gbnf_expr(pattern)})"
                if self.raw_pattern:
                    return self._add_rule(rule_name, expr)
                return self._add_rule(
                    rule_name, f'"\\"" {expr} "\\"" space')
            except RegexUnsupported:
                pass  # outside the supported subset → generic string
        fmt = schema.get("format")
        if fmt in ("date", "time", "date-time", "uuid"):
            prim = "uuid" if fmt == "uuid" else f"{fmt}-string"
            self._add_primitive(prim)
            return self._add_rule(rule_name, prim)
        min_len = schema.get("minLength")
        max_len = schema.get("maxLength")
        if min_len is not None or max_len is not None:
            self._add_primitive("char")
            lo = int(min_len or 0)
            hi = "" if max_len is None else str(int(max_len))
            return self._add_rule(
                rule_name, f'"\\"" char{{{lo},{hi}}} "\\"" space'
            )
        self._add_primitive("string")
        return self._add_rule(rule_name, "string")


def json_schema_to_gbnf(schema: Any, raw_pattern: bool = False) -> str:
    """Compile a JSON schema (dict or JSON text) to GBNF text."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    conv = SchemaConverter(schema, raw_pattern=raw_pattern)
    root = conv.visit(schema, "root")
    if root != "root":
        conv.rules["root"] = root
    lines = [f"{name} ::= {rule}" for name, rule in conv.rules.items()]
    return "\n".join(lines) + "\n"
