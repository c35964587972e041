"""ctypes binding for native/kquants.cpp — byte-exact k-quant encoders.

`quantize_native(x, kind)` returns packed bytes or None (no compiler /
unsupported kind). The numpy oracle (quant/ref_numpy.py) remains the
semantics reference; tests/test_native_kquants.py pins byte identity."""

from __future__ import annotations

import ctypes
import os

import numpy as np

_FNS = {
    "Q2_K": ("quant_q2_K", 84),
    "Q3_K": ("quant_q3_K", 110),
    "Q4_K": ("quant_q4_K", 144),
    "Q5_K": ("quant_q5_K", 176),
    "Q6_K": ("quant_q6_K", 210),
}

_WFNS = {
    "Q4_0": ("quant_q4_0_w", 18, 32),
    "Q4_K": ("quant_q4_K_w", 144, 256),
    "Q5_K": ("quant_q5_K_w", 176, 256),
    "Q6_K": ("quant_q6_K_w", 210, 256),
}

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("LLAMA_TPU_NO_NATIVE_QUANT"):
        return None
    from . import load_native

    lib = load_native("kquants")
    if lib is not None:
        for fname, _ in _FNS.values():
            fn = getattr(lib, fname)
            fn.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                           ctypes.POINTER(ctypes.c_uint8)]
            fn.restype = None
        for fname, _, _ in _WFNS.values():
            fn = getattr(lib, fname)
            fn.argtypes = [ctypes.POINTER(ctypes.c_float),
                           ctypes.POINTER(ctypes.c_float),
                           ctypes.c_int64, ctypes.c_int64,
                           ctypes.POINTER(ctypes.c_uint8)]
            fn.restype = None
    _lib = lib
    return lib


def quantize_native(x: np.ndarray, kind) -> np.ndarray | None:
    """x: f32 array, total size divisible by 256. Returns packed uint8
    bytes (reference block layout) or None when unavailable."""
    name = getattr(kind, "name", str(kind))
    if name not in _FNS:
        return None
    lib = _load()
    if lib is None:
        return None
    fname, bs = _FNS[name]
    xf = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    nb = xf.size // 256
    if nb * 256 != xf.size:
        return None
    out = np.empty(nb * bs, dtype=np.uint8)
    getattr(lib, fname)(
        xf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(nb),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def quantize_weighted_native(x: np.ndarray, qw: np.ndarray, kind,
                             n_per_row: int) -> np.ndarray | None:
    """imatrix-weighted encode (reference quantize_row_*_impl with
    quant_weights). Returns packed bytes or None when unavailable."""
    name = getattr(kind, "name", str(kind))
    if name not in _WFNS:
        return None
    lib = _load()
    if lib is None:
        return None
    fname, bs, block = _WFNS[name]
    xf = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    if (xf.size % n_per_row or n_per_row % block
            or qw.size != n_per_row):
        return None
    n_rows = xf.size // n_per_row
    qwf = np.ascontiguousarray(qw, dtype=np.float32).reshape(-1)
    out = np.empty(xf.size // block * bs, dtype=np.uint8)
    getattr(lib, fname)(
        xf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        qwf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(n_rows), ctypes.c_int64(n_per_row),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
