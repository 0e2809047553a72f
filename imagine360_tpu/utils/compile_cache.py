"""Persistent XLA compilation cache.

Full-step compiles of the production dual model run 200-730 s per process
on the remote TPU service (round-1 known-issue 1); the reference has no
analogue (torch eager). Enabling JAX's persistent cache makes every process
after the first compile in seconds — call `enable_compile_cache()` before
the first jit in any entry point (cli, bench, driver entry, tests).

The cache key includes the backend, so CPU test runs and TPU bench runs
coexist in one directory.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled: str | None = None


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotent; returns the cache directory ACTUALLY in use (the first
    call wins — jax reads the config at compile time, so a second call
    with a different path cannot retarget it)."""
    global _enabled
    import jax

    path = path or os.environ.get("IMAGINE360_COMPILE_CACHE", _DEFAULT_DIR)
    if _enabled is not None:
        return _enabled
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every compile that costs >=1s; tiny executables aren't worth I/O
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    try:
        # log WHY a lookup missed (key mismatch vs absent entry) — the big
        # denoise executable has been observed to recompile despite a
        # written entry; this makes the cause visible in bench/driver logs
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass
    _enabled = path
    return path
