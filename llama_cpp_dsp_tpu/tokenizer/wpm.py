"""WPM (BERT WordPiece) tokenizer.

Faithful to reference src/llama-vocab.cpp llm_tokenizer_wpm_session:
NFD-normalize, drop control chars, lowercase, split on whitespace with
punctuation/symbol/CJK chars as single-char words, then greedy
longest-match with a phantom "▁" prefix per word; unknown words → UNK.
"""

from __future__ import annotations

import unicodedata

from .vocab import TOKEN_NULL, Vocab


def _is_chinese_char(cpt: int) -> bool:
    return (
        0x4E00 <= cpt <= 0x9FFF
        or 0x3400 <= cpt <= 0x4DBF
        or 0x20000 <= cpt <= 0x2A6DF
        or 0x2A700 <= cpt <= 0x2B73F
        or 0x2B740 <= cpt <= 0x2B81F
        or 0x2B920 <= cpt <= 0x2CEAF  # matches the reference's (hf-copied) off-by-0x100
        or 0xF900 <= cpt <= 0xFAFF
        or 0x2F800 <= cpt <= 0x2FA1F
    )


class WpmTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.max_token_len = max((len(t) for t in vocab.tokens), default=0)

    def _preprocess(self, text: str) -> list[str]:
        # the reference's unicode_cpts_normalize_nfd maps each codepoint to a
        # SINGLE base codepoint (unicode_ranges_nfd), dropping combining marks
        normalized = "".join(unicodedata.normalize("NFD", ch)[0] for ch in text)
        words: list[str] = [""]
        for ch in normalized:
            cpt = ord(ch)
            cat = unicodedata.category(ch)
            if ch.isspace() or cat == "Zs":
                if words[-1]:
                    words.append("")
                continue
            if cpt == 0 or cpt == 0xFFFD or cat in ("Cc", "Cf"):
                continue
            s = ch.lower()
            if cat.startswith("P") or (cpt < 0x7F and cat.startswith("S")) or _is_chinese_char(cpt):
                if words[-1]:
                    words.append("")
                words[-1] = s
                words.append("")
            else:
                words[-1] += s
        if words and not words[-1]:
            words.pop()
        return words

    def tokenize(self, text: str, output: list[int]) -> None:
        vocab = self.vocab
        for word in self._preprocess(text):
            if not word:
                continue
            word1 = "▁" + word
            n = len(word1)
            start_len = len(output)
            i = 0
            while i < n:
                match = False
                for j in range(min(n, i + self.max_token_len + 1), i, -1):
                    tid = vocab.text_to_token(word1[i:j])
                    if tid != TOKEN_NULL:
                        output.append(tid)
                        i = j
                        match = True
                        break
                if not match:  # discard the whole word
                    del output[start_len:]
                    break
            if len(output) == start_len:
                output.append(vocab.unk_id)
