"""Tokenizer facade: special-token partitioning + per-type sessions.

Mirrors reference src/llama-vocab.cpp llama_vocab::tokenize (:2360-2520) and
tokenizer_st_partition (:1311+): raw text is partitioned around special
tokens (longest-first, with LSTRIP/RSTRIP trimming), then each raw fragment
is tokenized by the vocab-type engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from .bpe import BpeTokenizer
from .spm import SpmTokenizer, escape_whitespace, unescape_whitespace
from .vocab import TOKEN_NULL, TokenAttr, Vocab, VocabType, bpe_byte_decode

__all__ = ["Tokenizer", "Vocab", "VocabType", "TokenAttr"]


@dataclass
class _Fragment:
    token: int = TOKEN_NULL  # set → special-token fragment
    text: str = ""  # set → raw-text fragment

    @property
    def is_token(self) -> bool:
        return self.token != TOKEN_NULL


def _isspace_c(ch: str) -> bool:
    """C isspace() over the byte — reference uses it on raw utf-8 bytes."""
    return ch in " \t\n\r\x0b\x0c"


class Tokenizer:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        if vocab.vocab_type == VocabType.SPM:
            self._spm = SpmTokenizer(vocab)
        elif vocab.vocab_type == VocabType.BPE:
            self._bpe = BpeTokenizer(vocab)
        elif vocab.vocab_type == VocabType.WPM:
            from .wpm import WpmTokenizer

            self._wpm = WpmTokenizer(vocab)
        elif vocab.vocab_type == VocabType.UGM:
            from .ugm import UgmTokenizer

            self._ugm = UgmTokenizer(vocab)
        elif vocab.vocab_type == VocabType.RWKV:
            from .rwkv import RwkvTokenizer

            self._rwkv = RwkvTokenizer(vocab)
        else:
            raise NotImplementedError(f"tokenizer type {vocab.vocab_type}")

    # -- special-token partition -------------------------------------------
    def _partition(self, text: str, parse_special: bool) -> list[_Fragment]:
        fragments = [_Fragment(text=text)]
        vocab = self.vocab
        for special_id in vocab.special_tokens:
            attr = vocab.attrs[special_id]
            if not parse_special and attr & (TokenAttr.CONTROL | TokenAttr.UNKNOWN):
                continue
            st = vocab.tokens[special_id]
            if not st:
                continue
            out: list[_Fragment] = []
            for frag in fragments:
                if frag.is_token or not frag.text:
                    out.append(frag)
                    continue
                rest = frag.text
                while rest:
                    pos = rest.find(st)
                    if pos < 0:
                        out.append(_Fragment(text=rest))
                        break
                    left = rest[:pos]
                    if attr & TokenAttr.LSTRIP:
                        while left and _isspace_c(left[-1]):
                            left = left[:-1]
                    if left:
                        out.append(_Fragment(text=left))
                    out.append(_Fragment(token=special_id))
                    rest = rest[pos + len(st) :]
                    if attr & TokenAttr.RSTRIP:
                        while rest and _isspace_c(rest[0]):
                            rest = rest[1:]
            fragments = out
        return fragments

    # -- encode --------------------------------------------------------------
    def encode(
        self, text: str, *, add_special: bool = True, parse_special: bool = False
    ) -> list[int]:
        vocab = self.vocab
        output: list[int] = []
        fragments = self._partition(text, parse_special) if text else []

        if vocab.vocab_type == VocabType.SPM:
            is_prev_special = True  # prefix first raw fragment with a space
            if add_special and vocab.add_bos:
                output.append(vocab.bos_id)
                is_prev_special = True
            for frag in fragments:
                if frag.is_token:
                    output.append(frag.token)
                    is_prev_special = True
                else:
                    t = frag.text
                    if vocab.add_space_prefix and is_prev_special:
                        t = " " + t
                    self._spm.tokenize(escape_whitespace(t), output)
                    is_prev_special = False
            if add_special and vocab.add_eos:
                output.append(vocab.eos_id)
        elif vocab.vocab_type == VocabType.BPE:
            if add_special and vocab.add_bos:
                output.append(vocab.bos_id)
            for frag in fragments:
                if frag.is_token:
                    output.append(frag.token)
                else:
                    self._bpe.tokenize(frag.text, output)
            if add_special and vocab.add_eos:
                output.append(vocab.eos_id)
        elif vocab.vocab_type == VocabType.WPM:
            if add_special and vocab.bos_id != TOKEN_NULL:
                output.append(vocab.bos_id)
            for frag in fragments:
                if frag.is_token:
                    output.append(frag.token)
                else:
                    self._wpm.tokenize(frag.text, output)
            if add_special and vocab.sep_id != TOKEN_NULL:
                output.append(vocab.sep_id)
        elif vocab.vocab_type == VocabType.UGM:
            if add_special and vocab.add_bos and vocab.bos_id != TOKEN_NULL:
                output.append(vocab.bos_id)
            for frag in fragments:
                if frag.is_token:
                    output.append(frag.token)
                else:
                    self._ugm.tokenize(frag.text, output)
            if add_special and vocab.add_eos and vocab.eos_id != TOKEN_NULL:
                output.append(vocab.eos_id)
        elif vocab.vocab_type == VocabType.RWKV:
            for frag in fragments:
                if frag.is_token:
                    output.append(frag.token)
                else:
                    self._rwkv.tokenize(frag.text, output)
        else:
            raise NotImplementedError
        return output

    # -- decode --------------------------------------------------------------
    def token_to_piece(self, tid: int, *, special: bool = True) -> bytes:
        """reference llama_vocab::token_to_piece (llama-vocab.cpp:2861+)."""
        vocab = self.vocab
        attr = vocab.attrs[tid]
        text = vocab.tokens[tid]
        if attr & (TokenAttr.CONTROL | TokenAttr.UNKNOWN):
            return text.encode("utf-8") if special else b""
        if attr & TokenAttr.BYTE:
            if vocab.vocab_type in (VocabType.SPM, VocabType.UGM):
                return bytes([int(text[3:5], 16)]) if text.startswith("<0x") else text.encode()
            return bpe_byte_decode(text)
        if vocab.vocab_type in (VocabType.SPM, VocabType.UGM):
            return unescape_whitespace(text).encode("utf-8")
        if vocab.vocab_type == VocabType.BPE:
            return bpe_byte_decode(text)
        return text.encode("utf-8")

    def decode(
        self,
        tokens: list[int],
        *,
        remove_special: bool = False,
        unparse_special: bool = False,
    ) -> str:
        """reference llama_vocab::detokenize (llama-vocab.cpp:3000+)."""
        vocab = self.vocab
        toks = list(tokens)
        if remove_special and vocab.add_bos and toks and toks[0] == vocab.bos_id:
            toks = toks[1:]
        if remove_special and vocab.add_eos and toks and toks[-1] == vocab.eos_id:
            toks = toks[:-1]
        pieces = [self.token_to_piece(t, special=unparse_special) for t in toks]
        raw = b"".join(pieces)
        text = raw.decode("utf-8", errors="replace")
        if vocab.vocab_type in (VocabType.SPM, VocabType.UGM) and text.startswith(" "):
            # spm adds a leading space on encode; strip it back off
            if toks and not (toks and vocab.is_control(toks[0]) and unparse_special):
                text = text[1:]
        if vocab.clean_spaces:
            # minimal clean_spaces: collapse the artifacts the reference cleans
            for a, b in ((" .", "."), (" ,", ","), (" !", "!"), (" ?", "?"), (" '", "'"),
                         (" n't", "n't")):
                text = text.replace(a, b)
        return text
