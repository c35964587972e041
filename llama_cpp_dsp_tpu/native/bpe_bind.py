"""ctypes binding for the native BPE merge core (bpe.cpp).

Builds a per-Vocab native handle (token table + merge ranks serialized into
offset blobs) and exposes encode_word(); tokenizer/bpe.py uses it for the
per-word merge loop when available, with the Python twin as semantics
oracle and fallback.
"""

from __future__ import annotations

import ctypes

import numpy as np

from . import load_native


def _setup(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.bpe_create.restype = ctypes.c_void_p
    lib.bpe_create.argtypes = [u8p, i64p, ctypes.c_int32,
                               u8p, i64p, ctypes.c_int32]
    lib.bpe_free.argtypes = [ctypes.c_void_p]
    lib.bpe_encode_word.restype = ctypes.c_int32
    lib.bpe_encode_word.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int32,
                                    i32p, ctypes.c_int32]
    lib.bpe_encode_words.restype = ctypes.c_int32
    lib.bpe_encode_words.argtypes = [ctypes.c_void_p, u8p, i64p,
                                     ctypes.c_int32, i32p, ctypes.c_int32]
    return lib


def get_lib() -> ctypes.CDLL | None:
    lib = load_native("bpe")
    if lib is not None and not getattr(lib, "_bpe_setup", False):
        _setup(lib)
        lib._bpe_setup = True
    return lib


def _blob(strings: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    offs = np.zeros(len(strings) + 1, np.int64)
    for i, s in enumerate(strings):
        offs[i + 1] = offs[i] + len(s)
    blob = np.frombuffer(b"".join(strings), np.uint8).copy() if strings else \
        np.zeros(1, np.uint8)
    return blob, offs


class NativeBpe:
    """Native merge-loop handle for one Vocab."""

    def __init__(self, tokens: list[str], ranks: dict[tuple[str, str], int]):
        self._lib = get_lib()
        if self._lib is None:
            raise RuntimeError("native bpe unavailable")
        tok_blob, tok_offs = _blob([t.encode("utf-8") for t in tokens])
        pairs = sorted(ranks.items(), key=lambda kv: kv[1])
        flat: list[bytes] = []
        for (left, right), _rank in pairs:
            flat.append(left.encode("utf-8"))
            flat.append(right.encode("utf-8"))
        mg_blob, mg_offs = _blob(flat)
        self._keep = (tok_blob, tok_offs, mg_blob, mg_offs)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        self._h = self._lib.bpe_create(
            tok_blob.ctypes.data_as(u8p), tok_offs.ctypes.data_as(i64p),
            len(tokens),
            mg_blob.ctypes.data_as(u8p), mg_offs.ctypes.data_as(i64p),
            len(pairs),
        )
        self._out = np.zeros(4096, np.int32)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.bpe_free(h)
            self._h = None

    def encode_word(self, word: str) -> list[int]:
        return self.encode_words([word])

    def encode_words(self, words: list[str]) -> list[int]:
        """One ctypes crossing for a whole pre-tokenized word list."""
        data = [w.encode("utf-8") for w in words]
        blob, offs = _blob(data)
        total = offs[-1]
        if total * 2 + 8 > len(self._out):
            self._out = np.zeros(int(total) * 2 + 8, np.int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        n = self._lib.bpe_encode_words(
            self._h, blob.ctypes.data_as(u8p), offs.ctypes.data_as(i64p),
            len(words), self._out.ctypes.data_as(i32p), len(self._out),
        )
        return self._out[:n].tolist()
