"""Built-in named chat templates vs the reference's canonical outputs
(tests/test-chat-template.cpp expected_output vectors for the standard
6-message conversation), plus template detection from jinja marker text
(src/llama-chat.cpp llm_chat_detect_template)."""

from llama_cpp_dsp_tpu.serve.chat_builtin import (
    BUILTIN_TEMPLATES, apply_builtin, detect_builtin,
)

MESSAGES = [
    {"role": "system", "content": "You are a helpful assistant"},
    {"role": "user", "content": "Hello"},
    {"role": "assistant", "content": "Hi there"},
    {"role": "user", "content": "Who are you"},
    {"role": "assistant", "content": "   I am an assistant   "},
    {"role": "user", "content": "Another question"},
]

# (name, expected) — reference tests/test-chat-template.cpp
EXPECTED = {
    "chatml":
        "<|im_start|>system\nYou are a helpful assistant<|im_end|>\n"
        "<|im_start|>user\nHello<|im_end|>\n"
        "<|im_start|>assistant\nHi there<|im_end|>\n"
        "<|im_start|>user\nWho are you<|im_end|>\n"
        "<|im_start|>assistant\n   I am an assistant   <|im_end|>\n"
        "<|im_start|>user\nAnother question<|im_end|>\n"
        "<|im_start|>assistant\n",
    "llama2-sys-bos":
        "[INST] <<SYS>>\nYou are a helpful assistant\n<</SYS>>\n\n"
        "Hello [/INST]Hi there</s><s>[INST] Who are you [/INST]"
        "   I am an assistant   </s><s>[INST] Another question [/INST]",
    "llama2-sys-strip":
        "[INST] <<SYS>>\nYou are a helpful assistant\n<</SYS>>\n\n"
        "Hello [/INST]Hi there</s>[INST] Who are you [/INST]"
        "I am an assistant</s>[INST] Another question [/INST]",
    "monarch":
        "system\nYou are a helpful assistant</s>\n<s>user\nHello</s>\n"
        "<s>assistant\nHi there</s>\n<s>user\nWho are you</s>\n"
        "<s>assistant\n   I am an assistant   </s>\n"
        "<s>user\nAnother question</s>\n<s>assistant\n",
    "gemma":
        "<start_of_turn>user\nYou are a helpful assistant\n\n"
        "Hello<end_of_turn>\n<start_of_turn>model\nHi there<end_of_turn>\n"
        "<start_of_turn>user\nWho are you<end_of_turn>\n"
        "<start_of_turn>model\nI am an assistant<end_of_turn>\n"
        "<start_of_turn>user\nAnother question<end_of_turn>\n"
        "<start_of_turn>model\n",
    "orion":
        "Human: You are a helpful assistant\n\nHello\n\nAssistant: </s>"
        "Hi there</s>Human: Who are you\n\nAssistant: </s>"
        "   I am an assistant   </s>Human: Another question\n\nAssistant: </s>",
    "openchat":
        "You are a helpful assistant<|end_of_turn|>"
        "GPT4 Correct User: Hello<|end_of_turn|>"
        "GPT4 Correct Assistant: Hi there<|end_of_turn|>"
        "GPT4 Correct User: Who are you<|end_of_turn|>"
        "GPT4 Correct Assistant:    I am an assistant   <|end_of_turn|>"
        "GPT4 Correct User: Another question<|end_of_turn|>"
        "GPT4 Correct Assistant:",
    "deepseek":
        "You are a helpful assistant### Instruction:\nHello\n"
        "### Response:\nHi there\n<|EOT|>\n### Instruction:\nWho are you\n"
        "### Response:\n   I am an assistant   \n<|EOT|>\n"
        "### Instruction:\nAnother question\n### Response:\n",
    "vicuna":
        "You are a helpful assistant\n\nUSER: Hello\nASSISTANT: Hi there</s>\n"
        "USER: Who are you\nASSISTANT:    I am an assistant   </s>\n"
        "USER: Another question\nASSISTANT:",
    "vicuna-orca":
        "SYSTEM: You are a helpful assistant\nUSER: Hello\n"
        "ASSISTANT: Hi there</s>\nUSER: Who are you\n"
        "ASSISTANT:    I am an assistant   </s>\n"
        "USER: Another question\nASSISTANT:",
    "command-r":
        "<|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>You are a helpful assistant"
        "<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|><|USER_TOKEN|>Hello"
        "<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>"
        "Hi there<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|><|USER_TOKEN|>"
        "Who are you<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|>"
        "<|CHATBOT_TOKEN|>I am an assistant<|END_OF_TURN_TOKEN|>"
        "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>Another question"
        "<|END_OF_TURN_TOKEN|><|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>",
    "llama3":
        "<|start_header_id|>system<|end_header_id|>\n\n"
        "You are a helpful assistant<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nHello<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nHi there<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nWho are you<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
        "I am an assistant<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\n"
        "Another question<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n",
    "phi3":
        "<|system|>\nYou are a helpful assistant<|end|>\n"
        "<|user|>\nHello<|end|>\n<|assistant|>\nHi there<|end|>\n"
        "<|user|>\nWho are you<|end|>\n"
        "<|assistant|>\n   I am an assistant   <|end|>\n"
        "<|user|>\nAnother question<|end|>\n<|assistant|>\n",
    "phi4":
        "<|im_start|>system<|im_sep|>You are a helpful assistant<|im_end|>"
        "<|im_start|>user<|im_sep|>Hello<|im_end|>"
        "<|im_start|>assistant<|im_sep|>Hi there<|im_end|>"
        "<|im_start|>user<|im_sep|>Who are you<|im_end|>"
        "<|im_start|>assistant<|im_sep|>   I am an assistant   <|im_end|>"
        "<|im_start|>user<|im_sep|>Another question<|im_end|>"
        "<|im_start|>assistant<|im_sep|>",
    "chatglm3":
        "[gMASK]sop<|system|>\n You are a helpful assistant<|user|>\n Hello"
        "<|assistant|>\n Hi there<|user|>\n Who are you"
        "<|assistant|>\n    I am an assistant   <|user|>\n Another question"
        "<|assistant|>",
    "chatglm4":
        "[gMASK]<sop><|system|>\nYou are a helpful assistant<|user|>\nHello"
        "<|assistant|>\nHi there<|user|>\nWho are you"
        "<|assistant|>\n   I am an assistant   <|user|>\nAnother question"
        "<|assistant|>",
    "glmedge":
        "<|system|>\nYou are a helpful assistant<|user|>\nHello"
        "<|assistant|>\nHi there<|user|>\nWho are you"
        "<|assistant|>\n   I am an assistant   <|user|>\nAnother question"
        "<|assistant|>",
    "minicpm":
        "You are a helpful assistant<用户>Hello<AI>Hi there<用户>Who are you"
        "<AI>I am an assistant<用户>Another question<AI>",
    "deepseek2":
        "You are a helpful assistant\n\nUser: Hello\n\nAssistant: Hi there"
        "<｜end▁of▁sentence｜>User: Who are you\n\n"
        "Assistant:    I am an assistant   <｜end▁of▁sentence｜>"
        "User: Another question\n\nAssistant:",
    "granite":
        "<|start_of_role|>system<|end_of_role|>You are a helpful assistant"
        "<|end_of_text|>\n<|start_of_role|>user<|end_of_role|>Hello"
        "<|end_of_text|>\n<|start_of_role|>assistant<|end_of_role|>Hi there"
        "<|end_of_text|>\n<|start_of_role|>user<|end_of_role|>Who are you"
        "<|end_of_text|>\n<|start_of_role|>assistant<|end_of_role|>"
        "   I am an assistant   <|end_of_text|>\n"
        "<|start_of_role|>user<|end_of_role|>Another question"
        "<|end_of_text|>\n<|start_of_role|>assistant<|end_of_role|>\n",
    "mistral-v1":
        " [INST] You are a helpful assistant\n\nHello [/INST] Hi there</s>"
        " [INST] Who are you [/INST]    I am an assistant   </s>"
        " [INST] Another question [/INST]",
    "mistral-v3":
        "[INST] You are a helpful assistant\n\nHello[/INST] Hi there</s>"
        "[INST] Who are you[/INST] I am an assistant</s>"
        "[INST] Another question[/INST]",
    "mistral-v3-tekken":
        "[INST]You are a helpful assistant\n\nHello[/INST]Hi there</s>"
        "[INST]Who are you[/INST]   I am an assistant   </s>"
        "[INST]Another question[/INST]",
    "mistral-v7":
        "[SYSTEM_PROMPT] You are a helpful assistant[/SYSTEM_PROMPT]"
        "[INST] Hello[/INST] Hi there</s>[INST] Who are you[/INST]"
        "    I am an assistant   </s>[INST] Another question[/INST]",
    "gigachat":
        "<s>You are a helpful assistant<|message_sep|>user<|role_sep|>Hello"
        "<|message_sep|>available functions<|role_sep|>[]<|message_sep|>"
        "assistant<|role_sep|>Hi there<|message_sep|>user<|role_sep|>"
        "Who are you<|message_sep|>available functions<|role_sep|>[]"
        "<|message_sep|>assistant<|role_sep|>   I am an assistant   "
        "<|message_sep|>user<|role_sep|>Another question<|message_sep|>"
        "available functions<|role_sep|>[]<|message_sep|>"
        "assistant<|role_sep|>",
    "megrez":
        "<|role_start|>system<|role_end|>You are a helpful assistant"
        "<|turn_end|><|role_start|>user<|role_end|>Hello<|turn_end|>"
        "<|role_start|>assistant<|role_end|>Hi there<|turn_end|>"
        "<|role_start|>user<|role_end|>Who are you<|turn_end|>"
        "<|role_start|>assistant<|role_end|>   I am an assistant   "
        "<|turn_end|><|role_start|>user<|role_end|>Another question"
        "<|turn_end|><|role_start|>assistant<|role_end|>",
    "yandex":
        "<s> Пользователь: Hello\n\n Ассистент: Hi there\n\n"
        " Пользователь: Who are you\n\n Ассистент:    I am an assistant   "
        "\n\n Пользователь: Another question\n\n Ассистент:[SEP]",
    "bailing":
        "<role>SYSTEM</role>You are a helpful assistant<role>HUMAN</role>"
        "Hello<role>ASSISTANT</role>Hi there<role>HUMAN</role>Who are you"
        "<role>ASSISTANT</role>   I am an assistant   <role>HUMAN</role>"
        "Another question<role>ASSISTANT</role>",
}


def test_builtin_outputs_match_reference_vectors():
    for name, want in EXPECTED.items():
        got = apply_builtin(name, MESSAGES, True)
        assert got == want, f"{name}\n got={got!r}\nwant={want!r}"


def test_all_names_render_without_error():
    for name in BUILTIN_TEMPLATES:
        out = apply_builtin(name, MESSAGES, True)
        assert isinstance(out, str) and out


def test_detection_from_jinja_markers():
    cases = {
        "{% for m in messages %}<|im_start|>{{m.role}}...": "chatml",
        "...<|im_start|>x<|im_sep|>...": "phi4",
        "...<|start_header_id|>{{ role }}<|end_header_id|>...": "llama3",
        "...<|header_start|>r<|header_end|>...": "llama4",
        "...<start_of_turn>...": "gemma",
        "...USER: x ASSISTANT: y SYSTEM: z...": "vicuna-orca",
        "...<|START_OF_TURN_TOKEN|><|USER_TOKEN|>...": "command-r",
        "[gMASK]sop{% for ... %}": "chatglm3",
        "[gMASK]<sop>{% for ... %}": "chatglm4",
        "...<|start_of_role|>...": "granite",
        "...[INST] {{x}} [/INST]...<<SYS>>...": "llama2-sys",
        "...[SYSTEM_PROMPT]...[INST]...": "mistral-v7",
        "llama3": "llama3",  # exact names pass through
    }
    for tmpl, want in cases.items():
        assert detect_builtin(tmpl) == want, tmpl
    assert detect_builtin("{{ totally unknown }}") is None


def test_apply_chat_template_accepts_builtin_names():
    from llama_cpp_dsp_tpu.serve.chat import apply_chat_template

    got = apply_chat_template("llama3", MESSAGES[:2])
    assert got.startswith("<|start_header_id|>system")
    # unrenderable jinja with llama3 markers → detected builtin, not chatml
    broken = "{% bogus %}<|start_header_id|>{{ x }}<|end_header_id|>"
    got = apply_chat_template(broken, MESSAGES[:2])
    assert got.startswith("<|start_header_id|>system")
