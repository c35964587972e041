"""Process-wide JAX configuration for the framework's entry points."""

from __future__ import annotations

import os

_DONE = False


def setup_jax(*, platform: str | None = None, cache_dir: str | None = None) -> None:
    """Idempotent JAX config: persistent compilation cache + optional platform.

    Called by the CLI/server/bench entry points. The persistent cache makes
    repeat invocations skip XLA compilation entirely.
    """
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "LLAMA_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/jax")
    )
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if platform:
        jax.config.update("jax_platforms", platform)
    _DONE = True
