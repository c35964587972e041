"""ctypes binding for the native grammar engine (grammar.cpp)."""

from __future__ import annotations

import ctypes

import numpy as np

from . import load_native


def _setup(lib: ctypes.CDLL) -> ctypes.CDLL:
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.gm_create.restype = ctypes.c_void_p
    lib.gm_create.argtypes = [i32p, i32p, ctypes.c_int32, ctypes.c_int32]
    lib.gm_free.argtypes = [ctypes.c_void_p]
    lib.gm_clone.restype = ctypes.c_void_p
    lib.gm_clone.argtypes = [ctypes.c_void_p]
    lib.gm_n_stacks.restype = ctypes.c_int32
    lib.gm_n_stacks.argtypes = [ctypes.c_void_p]
    lib.gm_accept_piece.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int32]
    lib.gm_reject_candidates.argtypes = [
        ctypes.c_void_p, u8p, i32p, ctypes.c_int32, u8p,
    ]
    return lib


def get_lib() -> ctypes.CDLL | None:
    lib = load_native("grammar")
    if lib is not None and not getattr(lib, "_gm_setup", False):
        _setup(lib)
        lib._gm_setup = True
    return lib


class NativeGrammar:
    """Native twin of grammar.gbnf.Grammar's PDA state (accept/reject only;
    parsing, lazy triggers, and left-recursion checks stay in Python)."""

    def __init__(self, rules: list[list[tuple[int, int]]], root: int, lib=None):
        self._lib = lib or get_lib()
        if self._lib is None:
            raise RuntimeError("native grammar unavailable")
        flat = []
        offsets = [0]
        for rule in rules:
            for t, v in rule:
                flat.append(t)
                flat.append(v)
            offsets.append(offsets[-1] + len(rule))
        self._flat = np.asarray(flat, np.int32)
        self._offsets = np.asarray(offsets, np.int32)
        self._h = self._lib.gm_create(
            self._flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self._offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(rules), root,
        )

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.gm_free(self._h)
            self._h = None

    @property
    def n_stacks(self) -> int:
        return self._lib.gm_n_stacks(self._h)

    def accept_piece(self, piece: bytes) -> None:
        buf = np.frombuffer(piece, np.uint8)
        p = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) if len(buf) else \
            ctypes.cast(0, ctypes.POINTER(ctypes.c_uint8))
        self._lib.gm_accept_piece(self._h, p, len(buf))

    def reject_candidates(self, pieces: list[tuple[int, bytes]]) -> set[int]:
        """Same contract as Grammar.reject_candidates: indices whose utf8
        pieces cannot continue the grammar."""
        n = len(pieces)
        if n == 0:
            return set()
        offsets = np.zeros(n + 1, np.int32)
        blobs = []
        for i, (_, piece) in enumerate(pieces):
            blobs.append(piece)
            offsets[i + 1] = offsets[i] + len(piece)
        concat = np.frombuffer(b"".join(blobs) or b"\0", np.uint8)
        out = np.zeros(n, np.uint8)
        self._lib.gm_reject_candidates(
            self._h,
            concat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return {pieces[i][0] for i in np.nonzero(out)[0]}
