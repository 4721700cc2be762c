"""Token -> continuous action decoding for autoregressive VLA baselines.

The reference drives Magma/SpatialVLA through HF `generate` and then
de-discretizes action tokens (`policy_wrapper.py:236-269`): each action dim
is one token drawn from the LAST `n_bins` vocabulary entries; bin centers
tile [min, max] uniformly. These helpers implement that scheme standalone
(numpy) so any AR policy — including future native JAX ports — shares one
tested decode path.
"""

from __future__ import annotations

import numpy as np


def make_action_bins(n_bins: int = 256, low: float = -1.0, high: float = 1.0) -> np.ndarray:
    """Bin CENTERS: midpoints of a uniform [low, high] discretization."""
    edges = np.linspace(low, high, n_bins + 1)
    return (edges[:-1] + edges[1:]) / 2.0


def tokens_to_actions(
    token_ids: np.ndarray,  # [..., action_dim] vocab ids
    vocab_size: int,
    n_bins: int = 256,
    low: float = -1.0,
    high: float = 1.0,
) -> np.ndarray:
    """Vocab-offset scheme: id -> bin = vocab_size - id - 1 (action tokens
    occupy the tail of the vocabulary, newest = smallest bin index).
    Out-of-range ids clip to valid bins."""
    bins = make_action_bins(n_bins, low, high)
    idx = vocab_size - np.asarray(token_ids, np.int64) - 1
    idx = np.clip(idx, 0, n_bins - 1)
    return bins[idx]


def actions_to_tokens(
    actions: np.ndarray,
    vocab_size: int,
    n_bins: int = 256,
    low: float = -1.0,
    high: float = 1.0,
) -> np.ndarray:
    """Inverse mapping (used by AR training targets and round-trip tests)."""
    a = np.clip(np.asarray(actions, np.float64), low, high)
    idx = np.floor((a - low) / (high - low) * n_bins).astype(np.int64)
    idx = np.clip(idx, 0, n_bins - 1)
    return vocab_size - idx - 1


def denormalize_with_quantiles(actions, q01, q99, mask=None):
    """Magma-style unnormalization: [-1,1] -> [q01, q99] on masked dims
    (reference policy_wrapper.py:236-269 + env adapter magma path)."""
    actions = np.asarray(actions, np.float64)
    q01, q99 = np.asarray(q01), np.asarray(q99)
    out = 0.5 * (actions + 1.0) * (q99 - q01) + q01
    if mask is not None:
        out = np.where(mask, out, actions)
    return out
