"""Chat template rendering.

Equivalent of the reference's bundled minja Jinja engine (common/minja/
minja.hpp) + llama_chat_apply_template fallback matcher (src/llama-chat.cpp):
renders the GGUF-embedded `tokenizer.chat_template` with a
HuggingFace-compatible environment; falls back to ChatML when the model
ships no template.
"""

from __future__ import annotations

import datetime
import json
from typing import Any

CHATML_TEMPLATE = (
    "{% for message in messages %}"
    "{{'<|im_start|>' + message['role'] + '\n' + message['content'] + '<|im_end|>' + '\n'}}"
    "{% endfor %}"
    "{% if add_generation_prompt %}{{'<|im_start|>assistant\n'}}{% endif %}"
)


def _raise_exception(msg: str):
    raise ValueError(msg)


def _strftime_now(fmt: str) -> str:
    return datetime.datetime.now().strftime(fmt)


def apply_chat_template(
    template: str | None,
    messages: list[dict[str, Any]],
    *,
    add_generation_prompt: bool = True,
    bos_token: str = "",
    eos_token: str = "",
    tools: list | None = None,
    extra_context: dict | None = None,
) -> str:
    """Render a chat template → prompt text. `template` may be a builtin
    NAME (reference --chat-template, src/llama-chat.cpp names), a HF-style
    jinja template, or None (chatml)."""
    import jinja2

    from .chat_builtin import BUILTIN_TEMPLATES, apply_builtin, detect_builtin

    if template in BUILTIN_TEMPLATES:
        return apply_builtin(template, messages, add_generation_prompt)
    template = template or CHATML_TEMPLATE
    env = jinja2.Environment(
        trim_blocks=True,
        lstrip_blocks=True,
        extensions=["jinja2.ext.loopcontrols"],
    )
    env.filters["tojson"] = lambda v, **kw: json.dumps(v, ensure_ascii=False, **kw)
    env.globals["raise_exception"] = _raise_exception
    env.globals["strftime_now"] = _strftime_now
    ctx = {
        "messages": messages,
        "add_generation_prompt": add_generation_prompt,
        "bos_token": bos_token,
        "eos_token": eos_token,
    }
    if tools is not None:
        ctx["tools"] = tools
    if extra_context:
        ctx.update(extra_context)
    try:
        return env.from_string(template).render(**ctx)
    except Exception:
        # unrenderable jinja: detect the family from its marker strings and
        # use the builtin renderer (reference non-jinja path,
        # llm_chat_detect_template); otherwise fall back to chatml
        name = detect_builtin(template)
        return apply_builtin(name or "chatml", messages,
                             add_generation_prompt)


# ---------------------------------------------------------------------------
# tool-call parsing — reference common/chat.cpp (format detection per model
# family + extraction of structured calls from generated text)
# ---------------------------------------------------------------------------

import re as _re
import uuid as _uuid


def extract_reasoning(text: str) -> tuple[str | None, str]:
    """DeepSeek-R1-style reasoning extraction (reference common/chat.cpp
    reasoning-format=deepseek): returns (reasoning_content, content).
    Handles <think>...</think> and the bare leading ...</think> form (some
    templates pre-open the tag inside the prompt)."""
    # command-r7b (reference common_chat_parse_command_r7b,
    # common/chat.cpp:881-886): <|START_THINKING|>...<|END_THINKING|> prefix
    m = _re.match(r"\s*<\|START_THINKING\|>(.*?)<\|END_THINKING\|>(.*)",
                  text, _re.DOTALL)
    if m:
        return m.group(1).strip() or None, m.group(2)
    if "</think>" not in text:
        return None, text
    m = _re.match(r"\s*<think>(.*?)</think>\s*(.*)", text, _re.DOTALL)
    if m:
        return m.group(1).strip(), m.group(2)
    m = _re.match(r"\s*(.*?)</think>\s*(.*)", text, _re.DOTALL)
    if m and "<think>" not in m.group(1):
        return m.group(1).strip(), m.group(2)
    return None, text


def parse_tool_calls(text: str) -> tuple[str, list[dict]]:
    """Extract tool calls from model output. Handles the common formats:
    - Hermes/Qwen: <tool_call>{"name": ..., "arguments": {...}}</tool_call>
    - Mistral: [TOOL_CALLS][{...}]
    - Llama-3.x / bare JSON: {"name": ..., "parameters"|"arguments": {...}}
    Returns (content_without_calls, openai_style_tool_calls)."""
    calls: list[dict] = []

    def add(obj) -> bool:
        if not isinstance(obj, dict) or "name" not in obj:
            return False
        args = obj.get("arguments", obj.get("parameters", {}))
        calls.append({
            "id": f"call_{_uuid.uuid4().hex[:12]}",
            "type": "function",
            "function": {
                "name": str(obj["name"]),
                "arguments": json.dumps(args, ensure_ascii=False)
                if not isinstance(args, str) else args,
            },
        })
        return True

    content = text

    # hermes-style tags
    def _tag_sub(m):
        try:
            ok = add(json.loads(m.group(1)))
        except json.JSONDecodeError:
            ok = False
        return "" if ok else m.group(0)

    content = _re.sub(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", _tag_sub,
                      content, flags=_re.DOTALL)

    # mistral [TOOL_CALLS][...]
    m = _re.search(r"\[TOOL_CALLS\]\s*(\[.*\])", content, flags=_re.DOTALL)
    if m:
        try:
            arr = json.loads(m.group(1))
            if isinstance(arr, list) and all(add(o) for o in arr):
                content = content[: m.start()] + content[m.end():]
        except json.JSONDecodeError:
            pass

    # firefunction-v2: " functools[{...}, ...]" (chat.cpp:1193)
    m = _re.search(r" ?functools(\[.*\])", content, flags=_re.DOTALL)
    if m:
        try:
            arr = json.loads(m.group(1))
            if isinstance(arr, list) and all(add(o) for o in arr):
                content = content[: m.start()] + content[m.end():]
        except json.JSONDecodeError:
            pass

    # functionary-v3.1: <function=name>{args}</function> (chat.cpp:1320)
    def _fn_sub(m):
        try:
            args = json.loads(m.group(2))
        except json.JSONDecodeError:
            return m.group(0)
        return "" if add({"name": m.group(1), "arguments": args}) else m.group(0)

    content = _re.sub(r"<function=(\w+)>(\{.*?\})</function>", _fn_sub,
                      content, flags=_re.DOTALL)

    # functionary-v3.2: >>>fn_name\n{args} (repeatable; >>>all\n = prose —
    # chat.cpp:1197-1250)
    if _re.search(r"(?:^|>>>)\w+\n", content) and ">>>" in content:
        segs = _re.split(r">>>(\w+)\n", content)
        # segs = [pre, name1, body1, name2, body2, ...]
        kept = [segs[0]]
        for name, body in zip(segs[1::2], segs[2::2]):
            if name == "all":
                kept.append(body)
                continue
            try:
                ok = add({"name": name, "arguments": json.loads(body.strip())})
            except json.JSONDecodeError:
                ok = False
            if not ok:
                kept.append(f">>>{name}\n{body}")
        content = "".join(kept)

    # deepseek-r1: <｜tool▁call▁begin｜>function<｜tool▁sep｜>NAME\n```json
    # {args}```<｜tool▁call▁end｜> inside a calls-begin/end block
    def _r1_sub(m):
        try:
            args = json.loads(m.group(2))
        except json.JSONDecodeError:
            return m.group(0)
        return "" if add({"name": m.group(1), "arguments": args}) else m.group(0)

    if "tool▁call" in content or "tool_call" in content:
        content = _re.sub(
            r"<｜tool.calls.begin｜>(.*?)<｜tool.calls.end｜>",
            lambda m: _re.sub(
                r"<｜tool.call.begin｜>function<｜tool.sep｜>(\w+)\n"
                r"```(?:json)?\n?(\{.*?\})\n?```<｜tool.call.end｜>",
                _r1_sub, m.group(1), flags=_re.DOTALL),
            content, flags=_re.DOTALL)

    # command-r7b: an EMPTY thinking pair is dropped from content (the
    # reference keeps unparsed thinking tags only "if their insides aren't
    # empty", common/chat.cpp:897-900)
    content = _re.sub(r"<\|START_THINKING\|>\s*<\|END_THINKING\|>", "",
                      content)
    # command-r7b (common/chat.cpp:850-883): optional thinking prefix, then
    # <|START_ACTION|>[{"tool_call_id","tool_name","parameters"},…]
    # <|END_ACTION|>, or a <|START_RESPONSE|>…<|END_RESPONSE|> prose wrapper
    m = _re.search(r"<\|START_ACTION\|>(.*?)<\|END_ACTION\|>", content,
                   _re.DOTALL)
    if m:
        try:
            arr = json.loads(m.group(1))
        except json.JSONDecodeError:
            arr = None
        if (isinstance(arr, list)
                and all(isinstance(o, dict) and "tool_name" in o
                        and "parameters" in o for o in arr)):
            for o in arr:
                calls.append({
                    "id": str(o.get("tool_call_id",
                                    f"call_{_uuid.uuid4().hex[:12]}")),
                    "type": "function",
                    "function": {
                        "name": str(o["tool_name"]),
                        "arguments": json.dumps(o["parameters"],
                                                ensure_ascii=False),
                    },
                })
            content = content[: m.start()] + content[m.end():]
    # fullmatch like the reference's std::regex_match (common/chat.cpp:885
    # response_regex): nothing may follow the closing marker — an embedded
    # <|END_RESPONSE|> in arbitrary prose must not truncate the content
    m = _re.fullmatch(
        r"\s*(?:<\|START_RESPONSE\|>)?(.*?)<\|END_RESPONSE\|>\s*",
        content, _re.DOTALL)
    if m:
        content = m.group(1)

    # llama-3.x builtin tools (common/chat.cpp:940,1021-1046):
    # <|python_tag|>NAME.call(arg=VALUE) — single positional kwarg whose
    # value is a JSON literal
    m = _re.match(r"\s*<\|python_tag\|>\s*([^.(]+)\s*\.\s*call\s*"
                  r"\(\s*(\w+)\s*=\s*(.*)\)\s*$", content, _re.DOTALL)
    if m:
        try:
            val = json.loads(m.group(3))
        except json.JSONDecodeError:
            val = None
        if val is not None and add({"name": m.group(1).strip(),
                                    "arguments": {m.group(2): val}}):
            content = ""

    # bare JSON object that IS a call (llama3 style) — only if whole output
    stripped = content.strip()
    if stripped.startswith("{") and stripped.endswith("}"):
        try:
            obj = json.loads(stripped)
            if add(obj):
                content = ""
        except json.JSONDecodeError:
            pass

    return content.strip(), calls
