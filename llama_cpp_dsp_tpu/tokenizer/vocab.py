"""Vocabulary loaded from GGUF metadata.

Mirrors reference src/llama-vocab.cpp: token list/scores/types, per-type
defaults (add_bos/add_eos/add_space_prefix, :1630-1665), BPE merge ranks
(:1425-1440), special-token cache sorted by text length (:1985-2013), and
byte↔token mapping (:2827-2850).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Any

from ..gguf.constants import Keys, TokenType

TOKEN_NULL = -1


class VocabType(enum.Enum):
    NONE = "none"
    SPM = "spm"  # sentencepiece-style byte-fallback BPE (tokenizer.ggml.model = "llama")
    BPE = "bpe"  # gpt2 byte-level BPE
    WPM = "wpm"  # bert wordpiece
    UGM = "ugm"  # t5 unigram
    RWKV = "rwkv"


_MODEL_TO_TYPE = {
    "no_vocab": VocabType.NONE,
    "none": VocabType.NONE,
    "llama": VocabType.SPM,
    "gpt2": VocabType.BPE,
    "bert": VocabType.WPM,
    "t5": VocabType.UGM,
    "rwkv": VocabType.RWKV,
}


class TokenAttr(enum.IntFlag):
    """reference include/llama.h llama_token_attr."""

    UNDEFINED = 0
    UNKNOWN = 1 << 0
    UNUSED = 1 << 1
    NORMAL = 1 << 2
    CONTROL = 1 << 3
    USER_DEFINED = 1 << 4
    BYTE = 1 << 5
    NORMALIZED = 1 << 6
    LSTRIP = 1 << 7
    RSTRIP = 1 << 8
    SINGLE_WORD = 1 << 9


_TYPE_TO_ATTR = {
    int(TokenType.UNDEFINED): TokenAttr.UNDEFINED,
    int(TokenType.NORMAL): TokenAttr.NORMAL,
    int(TokenType.UNKNOWN): TokenAttr.UNKNOWN,
    int(TokenType.CONTROL): TokenAttr.CONTROL,
    int(TokenType.USER_DEFINED): TokenAttr.USER_DEFINED,
    int(TokenType.UNUSED): TokenAttr.UNUSED,
    int(TokenType.BYTE): TokenAttr.BYTE,
}


@lru_cache(maxsize=1)
def byte_to_unicode_map() -> dict[int, str]:
    """gpt2 bytes_to_unicode (reference src/unicode.cpp:154 unicode_byte_to_utf8_map)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


@lru_cache(maxsize=1)
def unicode_to_byte_map() -> dict[str, int]:
    return {c: b for b, c in byte_to_unicode_map().items()}


def bpe_byte_encode(word: str) -> str:
    """UTF-8 bytes → gpt2 byte-alphabet string (unicode_byte_encoding_process)."""
    m = byte_to_unicode_map()
    return "".join(m[b] for b in word.encode("utf-8"))


def bpe_byte_decode(piece: str) -> bytes:
    m = unicode_to_byte_map()
    return bytes(m.get(ch, 0) for ch in piece)


@dataclass
class Vocab:
    vocab_type: VocabType
    tokens: list[str]
    scores: list[float]
    attrs: list[TokenAttr]
    pre: str = "default"

    add_bos: bool = False
    add_eos: bool = False
    add_space_prefix: bool = False
    ignore_merges: bool = False
    clean_spaces: bool = False
    remove_extra_whitespaces: bool = False

    bos_id: int = TOKEN_NULL
    eos_id: int = TOKEN_NULL
    eot_id: int = TOKEN_NULL
    eom_id: int = TOKEN_NULL
    unk_id: int = TOKEN_NULL
    sep_id: int = TOKEN_NULL
    pad_id: int = TOKEN_NULL
    # fill-in-middle tokens (reference llama_vocab fim_* ids)
    fim_pre_id: int = TOKEN_NULL
    fim_suf_id: int = TOKEN_NULL
    fim_mid_id: int = TOKEN_NULL
    fim_rep_id: int = TOKEN_NULL
    fim_sep_id: int = TOKEN_NULL

    bpe_ranks: dict[tuple[str, str], int] = field(default_factory=dict)
    chat_template: str | None = None

    token_to_id: dict[str, int] = field(default_factory=dict, repr=False)
    special_tokens: list[int] = field(default_factory=list, repr=False)
    eog_ids: set[int] = field(default_factory=set, repr=False)

    def __post_init__(self) -> None:
        if not self.token_to_id:
            # last occurrence wins (reference llama-vocab.cpp:1696 assigns in a loop)
            for i, t in enumerate(self.tokens):
                self.token_to_id[t] = i
        if not self.special_tokens:
            special = [
                i
                for i, a in enumerate(self.attrs)
                if a & (TokenAttr.CONTROL | TokenAttr.USER_DEFINED | TokenAttr.UNKNOWN)
            ]
            # sorted by token text length, longest first (llama-vocab.cpp:2009)
            special.sort(key=lambda i: -len(self.tokens[i]))
            self.special_tokens = special
        if not self.eog_ids:
            for tid in (self.eos_id, self.eot_id, self.eom_id):
                if tid != TOKEN_NULL:
                    self.eog_ids.add(tid)
            for i, t in enumerate(self.tokens):
                if t in ("<|eot_id|>", "<|im_end|>", "<|end|>", "<end_of_turn>", "<|endoftext|>",
                         "<EOT>", "_<EOT>", "<｜end▁of▁sentence｜>") and (
                    self.attrs[i] & TokenAttr.CONTROL
                ):
                    self.eog_ids.add(i)
        # auto-detect FIM tokens by text — reference llama-vocab.cpp special
        # token scan (fim_pre/suf/mid aliases across model families)
        _FIM_ALIASES = {
            "fim_pre_id": ("<|fim_prefix|>", "<fim-prefix>", "<fim_prefix>",
                           "<PRE>", "<｜fim▁begin｜>", "<|fim_begin|>"),
            "fim_suf_id": ("<|fim_suffix|>", "<fim-suffix>", "<fim_suffix>",
                           "<SUF>", "<｜fim▁hole｜>", "<|fim_hole|>"),
            "fim_mid_id": ("<|fim_middle|>", "<fim-middle>", "<fim_middle>",
                           "<MID>", "<｜fim▁end｜>", "<|fim_end|>"),
            "fim_rep_id": ("<|fim_repo|>", "<|repo_name|>"),
            "fim_sep_id": ("<|file_sep|>", "<|file_separator|>"),
        }
        for attr_name, aliases in _FIM_ALIASES.items():
            if getattr(self, attr_name) == TOKEN_NULL:
                for alias in aliases:
                    tid = self.token_to_id.get(alias)
                    if tid is not None:
                        object.__setattr__(self, attr_name, tid)
                        break

    # -- lookups -----------------------------------------------------------
    @property
    def n_tokens(self) -> int:
        return len(self.tokens)

    def text_to_token(self, text: str) -> int:
        return self.token_to_id.get(text, TOKEN_NULL)

    def byte_to_token(self, byte: int) -> int:
        if self.vocab_type in (VocabType.SPM, VocabType.UGM):
            tok = self.token_to_id.get(f"<0x{byte:02X}>")
            if tok is not None:
                return tok
            return self.token_to_id[chr(byte)]
        if self.vocab_type in (VocabType.BPE, VocabType.WPM):
            return self.token_to_id[byte_to_unicode_map()[byte]]
        raise ValueError(f"byte_to_token unsupported for {self.vocab_type}")

    def find_bpe_rank(self, left: str, right: str) -> int:
        return self.bpe_ranks.get((left, right), -1)

    def is_eog(self, tid: int) -> bool:
        return tid in self.eog_ids

    def is_control(self, tid: int) -> bool:
        return bool(self.attrs[tid] & TokenAttr.CONTROL)

    def is_byte(self, tid: int) -> bool:
        return bool(self.attrs[tid] & TokenAttr.BYTE)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_gguf_kv(cls, kv: dict[str, Any]) -> "Vocab":
        model = str(kv.get(Keys.Tokenizer.MODEL, "llama"))
        vtype = _MODEL_TO_TYPE.get(model)
        if vtype is None:
            raise ValueError(f"unknown tokenizer model {model!r}")
        tokens = list(kv.get(Keys.Tokenizer.LIST, []))
        n = len(tokens)
        scores_raw = kv.get(Keys.Tokenizer.SCORES)
        scores = [float(s) for s in scores_raw] if scores_raw is not None else [0.0] * n
        types_raw = kv.get(Keys.Tokenizer.TOKEN_TYPE)
        if types_raw is not None:
            attrs = [_TYPE_TO_ATTR.get(int(t), TokenAttr.UNDEFINED) for t in types_raw]
        else:
            attrs = [TokenAttr.NORMAL] * n

        # per-type defaults — reference llama-vocab.cpp:1630-1665
        v = cls(vtype, tokens, scores, attrs)
        if vtype == VocabType.SPM:
            v.add_space_prefix = True
            v.add_bos, v.add_eos = True, False
            v.bos_id, v.eos_id, v.unk_id = 1, 2, 0
        elif vtype == VocabType.BPE:
            v.clean_spaces = True
            v.bos_id = v.eos_id = 11
            v.pre = str(kv.get(Keys.Tokenizer.PRE, "default"))
            v.add_bos = v.pre in _PRE_ADD_BOS
            v.ignore_merges = v.pre in _PRE_IGNORE_MERGES
            if v.pre in _PRE_NO_CLEAN_SPACES:
                v.clean_spaces = False
            merges = kv.get(Keys.Tokenizer.MERGES, [])
            for rank, m in enumerate(merges):
                pos = m.find(" ", 1)
                if pos > 0:
                    v.bpe_ranks[(m[:pos], m[pos + 1 :])] = rank
        elif vtype == VocabType.WPM:
            v.clean_spaces = True
            v.add_bos, v.add_eos = True, False
            v.bos_id = TOKEN_NULL
            v.sep_id = 102
        elif vtype == VocabType.UGM:
            v.add_bos, v.add_eos = False, True

        # explicit overrides from GGUF
        for key, attr in [
            (Keys.Tokenizer.BOS_ID, "bos_id"),
            (Keys.Tokenizer.EOS_ID, "eos_id"),
            (Keys.Tokenizer.EOT_ID, "eot_id"),
            (Keys.Tokenizer.EOM_ID, "eom_id"),
            (Keys.Tokenizer.UNK_ID, "unk_id"),
            (Keys.Tokenizer.SEP_ID, "sep_id"),
            (Keys.Tokenizer.PAD_ID, "pad_id"),
        ]:
            if key in kv:
                setattr(v, attr, int(kv[key]))
        for key, attr in [
            (Keys.Tokenizer.ADD_BOS, "add_bos"),
            (Keys.Tokenizer.ADD_EOS, "add_eos"),
            (Keys.Tokenizer.ADD_SPACE_PREFIX, "add_space_prefix"),
            (Keys.Tokenizer.REMOVE_EXTRA_WS, "remove_extra_whitespaces"),
        ]:
            if key in kv:
                setattr(v, attr, bool(kv[key]))
        if Keys.Tokenizer.CHAT_TEMPLATE in kv:
            v.chat_template = str(kv[Keys.Tokenizer.CHAT_TEMPLATE])
        v.__post_init__()  # rebuild caches after overrides
        return v


# pre-tokenizer presets that flip vocab flags (llama-vocab.cpp:1505-1620)
_PRE_IGNORE_MERGES = {"llama3", "llama-v3", "llama-bpe", "falcon3", "pixtral", "tekken"}
_PRE_ADD_BOS = {"llama3", "llama-v3", "llama-bpe", "falcon3", "pixtral", "tekken", "jais"}
_PRE_NO_CLEAN_SPACES = {
    "deepseek-llm",
    "deepseek-coder",
    "deepseek-v3",
    "command-r",
    "qwen2",
    "deepseek-r1-qwen",
    "olmo",
    "dbrx",
    "smaug-bpe",
    "jina-v1-en",
    "jina-v2-es",
    "jina-v2-de",
    "jina-v2-code",
    "poro-chat",
    "bloom",
    "gpt3-finnish",
    "chatglm-bpe",
    "viking",
    "tekken",
    "smollm",
    "codeshell",
    "bailingmoe",
    "exaone",
    "minerva-7b",
    "gpt-4o",
    "superbpe",
    "trillion",
}
