"""UGM (unigram / T5 sentencepiece) tokenizer.

Viterbi segmentation over token scores, faithful to reference
src/llama-vocab.cpp llm_tokenizer_ugm_session (:842-1100):
- normalization: optional whitespace collapsing + U+2581 space escaping
  with prefix space (xcda-trie normalization approximated by NFKC-less
  direct mapping — GGUF UGM vocabs carry pre-normalized pieces)
- Viterbi over normalized utf-8: tokens_header trie match per position,
  unknown bytes bridged with unknown_token_score_penalty
- unknown spans merge into one UNK token (:1030)
"""

from __future__ import annotations

from .vocab import TOKEN_NULL, TokenAttr, Vocab

# reference llm_tokenizer_ugm: score penalty applied to unknown bytes
UNKNOWN_TOKEN_SCORE_PENALTY = 10.0


class UgmTokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        # prefix trie over token bytes (user_defined/normal with scores)
        self.trie: dict = {}
        self.min_score = 0.0
        self.max_score = -1e30
        for tid, text in enumerate(vocab.tokens):
            attr = vocab.attrs[tid]
            if attr & (TokenAttr.UNUSED | TokenAttr.BYTE):
                continue
            b = text.encode("utf-8")
            if not b:
                continue
            node = self.trie
            for byte in b:
                node = node.setdefault(byte, {})
            score = vocab.scores[tid] if vocab.scores else 0.0
            node["\0id"] = tid
            node["\0score"] = score
            self.min_score = min(self.min_score, score)
            self.max_score = max(self.max_score, score)
        self.unknown_penalty = (
            self.min_score - UNKNOWN_TOKEN_SCORE_PENALTY
        )

    def _normalize(self, text: str) -> bytes:
        v = self.vocab
        if v.remove_extra_whitespaces:
            while "  " in text:
                text = text.replace("  ", " ")
            text = text.strip()
        if v.add_space_prefix and text and not text.startswith(" "):
            text = " " + text
        return text.replace(" ", "▁").encode("utf-8")

    def tokenize(self, text: str, output: list[int]) -> None:
        data = self._normalize(text)
        n = len(data)
        if n == 0:
            return
        NEG = float("-inf")
        best_score = [NEG] * (n + 1)
        best_prev = [-1] * (n + 1)
        best_tok = [TOKEN_NULL] * (n + 1)
        best_score[0] = 0.0
        unk_id = self.vocab.unk_id

        for i in range(n):
            if best_score[i] == NEG:
                continue
            # trie walk from i
            node = self.trie
            j = i
            while j < n:
                node = node.get(data[j])
                if node is None:
                    break
                j += 1
                tid = node.get("\0id")
                if tid is not None:
                    s = best_score[i] + node["\0score"]
                    if s > best_score[j]:
                        best_score[j] = s
                        best_prev[j] = i
                        best_tok[j] = tid
            # unknown single byte bridge (merged later)
            s = best_score[i] + self.unknown_penalty
            if s > best_score[i + 1]:
                best_score[i + 1] = s
                best_prev[i + 1] = i
                best_tok[i + 1] = unk_id

        # backtrack
        toks: list[int] = []
        pos = n
        while pos > 0:
            toks.append(best_tok[pos])
            pos = best_prev[pos]
        toks.reverse()
        # merge consecutive UNK (reference :1030)
        merged: list[int] = []
        for t in toks:
            if merged and t == unk_id and merged[-1] == unk_id:
                continue
            merged.append(t)
        output.extend(merged)
