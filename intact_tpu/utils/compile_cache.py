"""Persistent XLA compilation cache.

A Pi0-3B serving graph compiles in ~15-300 s (tunnel-dependent); the cache
makes every later process start in seconds. Call `enable()` before the
first jit compile (idempotent; respects an existing
JAX_COMPILATION_CACHE_DIR / explicit jax config). Opt out with
INTACT_TPU_NO_COMPILE_CACHE=1.

KNOWN FAILURE MODE: a process killed (SIGTERM/timeout) mid-compile can
leave a half-written cache entry; a LATER process deserializing it dies
with `Fatal Python error: Aborted` inside pjit — far from the cause. If
that signature appears after killed runs, `rm -rf` the cache dir and
re-warm. The test suite always runs with the cache disabled
(tests/conftest.py) for exactly this reason.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = "~/.cache/intact_tpu/xla_cache"


def enable(path: str | None = None) -> str | None:
    if os.environ.get("INTACT_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    cache_dir = str(Path(
        path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    ).expanduser())
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes meaningful time; tiny programs skip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
