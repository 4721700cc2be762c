"""Action-prediction validation metrics (reference `src/utils/metric.py:6-21`).

Written in jax.numpy so they run inside the jitted validation step; pass
numpy arrays for host-side use (jnp ops accept them).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def get_action_accuracy(
    gt,  # [batch, horizon, action_dim]
    pred,
    thresholds: Sequence[float] = (0.1, 0.2),
):
    """Fraction of (batch, horizon) frames where EVERY action dim is within
    each threshold of ground truth. Returns [len(thresholds)]."""
    diff = jnp.abs(gt - pred).reshape(-1, gt.shape[-1])
    accs = [
        jnp.mean((jnp.mean((diff < t).astype(jnp.float32), axis=1) >= 1.0).astype(jnp.float32))
        for t in thresholds
    ]
    return jnp.stack(accs)


def l1_error(gt, pred):
    return jnp.mean(jnp.abs(gt - pred))
