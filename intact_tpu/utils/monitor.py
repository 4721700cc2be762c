"""Logging, wall-clock timers, profiling hooks, device-memory telemetry.

Reference parity (`src/utils/monitor.py:11-110`): `setup_logger`, `Timer`,
`@log_execution_time`, device memory logging, non-main-rank stdout silencing.
TPU replacements: `log_allocated_gpu_memory` -> `log_device_memory` (HBM via
jax device memory stats) and a `jax.profiler` trace context for per-step
chrome traces (the reference had no profiler at all, SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import functools
import logging
import os
import sys
import time


def block_print() -> None:
    """Silence stdout on non-main processes (reference trainer.py:77-78)."""
    sys.stdout = open(os.devnull, "w")


def enable_print() -> None:
    sys.stdout = sys.__stdout__


def setup_logger(
    main_rank: bool,
    filename: str | None = None,
    name: str = "intact_tpu",
    level: int = logging.INFO,
    force: bool = False,
) -> logging.Logger:
    """Per-name logger; non-main ranks get a silent logger.

    force=True replaces existing handlers — required when the same logger
    name must switch output files (e.g. one evaluator process sweeping
    checkpoints writes a fresh eval.log per step)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not main_rank:
        logger.addHandler(logging.NullHandler())
        logger.propagate = False
        return logger
    if logger.handlers:
        if not force:
            return logger
        for h in list(logger.handlers):
            logger.removeHandler(h)
            h.close()
    handler = (
        logging.FileHandler(filename) if filename else logging.StreamHandler(sys.stdout)
    )
    handler.setFormatter(
        logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s",
            datefmt="%Y-%m-%d %H:%M:%S",
        )
    )
    logger.addHandler(handler)
    logger.propagate = False
    return logger


class Timer:
    """Wall-clock delta timer for the train log line (monitor.py:101-110)."""

    def __init__(self) -> None:
        self._start = time.time()

    def __call__(self, reset: bool = True) -> float:
        now = time.time()
        diff = now - self._start
        if reset:
            self._start = now
        return diff


def log_execution_time(logger: logging.Logger | None = None):
    """Decorator logging how long a call took (applied to dataset build,
    checkpoint save/load in the reference)."""

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            start = time.time()
            result = func(*args, **kwargs)
            elapsed = time.time() - start
            (logger or logging.getLogger("intact_tpu")).info(
                "%s took %.2f s", func.__name__, elapsed
            )
            return result

        return wrapper

    return decorator


def log_device_memory(tag: str = "", logger: logging.Logger | None = None) -> dict:
    """Log per-device HBM usage (TPU equivalent of max_memory_reserved)."""
    import jax

    log = logger or logging.getLogger("intact_tpu")
    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:  # CPU backend has no memory_stats
            s = None
        if s:
            used = s.get("bytes_in_use", 0) / 2**30
            limit = s.get("bytes_limit", 0) / 2**30
            stats[str(d)] = {"gib_in_use": used, "gib_limit": limit}
            log.info("%s %s: %.2f / %.2f GiB HBM", tag, d, used, limit)
    return stats


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Chrome-trace a region with jax.profiler when log_dir is set."""
    import jax

    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def save_bad_data(data, path: str = "bad_data.npz") -> None:
    """Debug helper: dump a numpy pytree that broke the pipeline."""
    import numpy as np

    flat = {}

    def _walk(prefix, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                _walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(obj)

    _walk("", data)
    np.savez(path, **flat)
