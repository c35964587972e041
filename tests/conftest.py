"""Test configuration.

All tests run on CPU with 8 virtual devices so that multi-chip sharding
(mesh/pjit paths) is exercised without TPU hardware. Must be set before JAX
initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# jax may already be imported by sitecustomize (TPU plugin registration), in
# which case the env vars above were read too early — force via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compilation cache — first run on this 1-core box is slow,
# subsequent test runs reuse compiled executables
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE = Path("/root/reference")


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)


def reference_gguf_py():
    """Import the reference's gguf-py package as a numerical oracle.

    Used only as an external test oracle (like the reference uses its CPU
    backend in test-backend-ops); returns None when unavailable so tests
    degrade to self-consistency checks.
    """
    path = REFERENCE / "gguf-py"
    if not path.is_dir():
        return None
    # gguf-py's vocab module imports sentencepiece, which this image lacks;
    # we only use gguf.quants/constants, so satisfy the import with a stub.
    if "sentencepiece" not in sys.modules:
        import types

        stub = types.ModuleType("sentencepiece")
        stub.SentencePieceProcessor = object
        sys.modules["sentencepiece"] = stub
    sys.path.insert(0, str(path))
    try:
        import gguf  # noqa: F401

        return gguf
    except Exception:
        return None
    finally:
        sys.path.remove(str(path))
