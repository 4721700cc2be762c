"""Multi-host (TPU pod) setup + cross-process utilities.

Replaces the reference's import-time NCCL process-group init
(`configuration_pipeline.py:160-172`) with an explicit, idempotent
`initialize()` built on jax.distributed: on Cloud TPU pods coordinator
discovery is automatic; elsewhere it reads COORDINATOR_ADDRESS /
PROCESS_ID / NUM_PROCESSES. Single-process runs are a no-op.

Gradient/metric collectives happen INSIDE jit via shardings (no explicit
calls); the helpers here cover host-side needs: aggregating python metrics
across processes and broadcasting host data.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

log = logging.getLogger("intact_tpu.distributed")
_initialized = [False]


def initialize() -> None:
    """Idempotent jax.distributed.initialize with env-var fallback.

    Ordering matters: jax.distributed.initialize() must run BEFORE any call
    that touches the local XLA backend (jax.devices / jax.process_count /
    first trace), so the guard here is purely the module flag — we never
    query jax before the init attempt.
    """
    if _initialized[0]:
        return
    coord = os.environ.get("COORDINATOR_ADDRESS")
    if coord:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["NUM_PROCESSES"]),
                process_id=int(os.environ["PROCESS_ID"]),
            )
        except RuntimeError as e:  # already initialized elsewhere
            log.warning("jax.distributed.initialize: %r (continuing)", e)
        log.info("jax.distributed: process %d/%d", jax.process_index(), jax.process_count())
    elif os.environ.get("MEGASCALE_COORDINATOR_ADDRESS") or (
        # Multi-worker TPU pod: auto-discovery. A single-host entry
        # ("localhost") is the tunnel shim, not a pod — skip it so we don't
        # spin waiting for a coordinator that doesn't exist.
        (h := os.environ.get("TPU_WORKER_HOSTNAMES", ""))
        and h not in ("localhost", "127.0.0.1")
    ):
        try:
            jax.distributed.initialize()
            log.info("jax.distributed auto-init: process %d/%d",
                     jax.process_index(), jax.process_count())
        except Exception as e:  # single-host tunnel setups
            log.debug("jax.distributed auto-init skipped: %r", e)
    _initialized[0] = True


def process_mean(values: dict[str, float]) -> dict[str, float]:
    """Mean of host-side python metrics across processes (one tiny
    all-gather through the devices; no-op single-process)."""
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    keys = sorted(values)
    arr = np.asarray([values[k] for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(arr)
    mean = np.asarray(gathered).reshape(jax.process_count(), -1).mean(0)
    return {k: float(v) for k, v in zip(keys, mean)}


def broadcast_from_host0(value: np.ndarray) -> np.ndarray:
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.broadcast_one_to_all(np.asarray(value))
    )
