"""Native (C++) runtime components.

The reference implements its host-side hot loops in C++ (grammar PDA,
tokenizers, loaders); this package holds the TPU build's native equivalents,
compiled on first use with the system toolchain and loaded via ctypes. Every
native component has a pure-Python twin that serves as the semantics oracle
and the fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import sysconfig
import tempfile
from pathlib import Path

log = logging.getLogger(__name__)

_SRC_DIR = Path(__file__).parent
_lib_cache: dict[str, ctypes.CDLL | None] = {}


def _build_dir() -> Path:
    d = os.environ.get("LLAMA_TPU_NATIVE_DIR")
    if d:
        return Path(d)
    return Path(tempfile.gettempdir()) / "llama_cpp_dsp_tpu_native"


def load_native(name: str) -> ctypes.CDLL | None:
    """Compile (once) and load native/<name>.cpp; None if unavailable."""
    if name in _lib_cache:
        return _lib_cache[name]
    src = _SRC_DIR / f"{name}.cpp"
    if not src.exists():
        _lib_cache[name] = None
        return None
    code = src.read_bytes()
    tag = hashlib.sha256(code).hexdigest()[:16]
    out_dir = _build_dir()
    out_dir.mkdir(parents=True, exist_ok=True)
    so = out_dir / f"{name}-{tag}.so"
    if not so.exists():
        cxx = os.environ.get("CXX", "g++")
        # -ffp-contract=off: the k-quant encoders must round every f32
        # product/sum exactly like the numpy oracle (GCC's default
        # contraction fuses a*b+c and flips knife-edge scale-search ties)
        cmd = [cxx, "-O2", "-shared", "-fPIC", "-std=c++17",
               "-ffp-contract=off", "-pthread",
               str(src), "-o", str(so) + ".tmp"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(str(so) + ".tmp", so)
        except Exception as e:  # no compiler / failed build → fallback
            log.warning("native build of %s failed (%s); using Python fallback",
                        name, e)
            _lib_cache[name] = None
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError as e:
        log.warning("native load of %s failed: %s", name, e)
        lib = None
    _lib_cache[name] = lib
    return lib
