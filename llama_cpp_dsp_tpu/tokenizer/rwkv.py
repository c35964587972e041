"""RWKV world tokenizer — greedy longest-match over raw bytes.

Faithful to reference src/llama-vocab.cpp llm_tokenizer_rwkv_session
(:1220-1260): token texts are C-escaped byte strings in the GGUF; matching
is greedy longest-prefix over the raw utf-8 input.
"""

from __future__ import annotations

from .vocab import Vocab


def _unescape(token_text: str) -> bytes:
    """RWKV vocab entries use C-style escapes (\\xNN, \\n, \\t, ...)."""
    out = bytearray()
    i = 0
    s = token_text
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            e = s[i + 1]
            if e == "x" and i + 3 < len(s):
                out.append(int(s[i + 2 : i + 4], 16))
                i += 4
                continue
            mapped = {"n": 10, "t": 9, "r": 13, "\\": 92, "'": 39, '"': 34}.get(e)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
        out.extend(c.encode("utf-8"))
        i += 1
    return bytes(out)


class RwkvTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.trie: dict = {}
        for tid, text in enumerate(vocab.tokens):
            b = _unescape(text)
            if not b:
                continue
            node = self.trie
            for byte in b:
                node = node.setdefault(byte, {})
            node["\0id"] = tid

    def tokenize(self, text: str, output: list[int]) -> None:
        data = text.encode("utf-8")
        i = 0
        n = len(data)
        while i < n:
            node = self.trie
            best = None
            best_len = 0
            j = i
            while j < n:
                node = node.get(data[j])
                if node is None:
                    break
                j += 1
                tid = node.get("\0id")
                if tid is not None:
                    best = tid
                    best_len = j - i
            if best is None:
                i += 1  # unmatchable byte: skip (reference treats as error)
                continue
            output.append(best)
            i += best_len
