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
    """Render a HF-style chat template (jinja2) → prompt text."""
    import jinja2

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
        # defensive fallback, like the reference falling back to chatml
        return (
            "".join(
                f"<|im_start|>{m.get('role', 'user')}\n{m.get('content', '')}<|im_end|>\n"
                for m in messages
            )
            + ("<|im_start|>assistant\n" if add_generation_prompt else "")
        )
