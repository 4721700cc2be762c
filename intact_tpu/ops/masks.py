"""Attention-mask construction (big_vision / Pi0 convention).

`att_masks` ("mask_ar") is an int[B, N] where 1 marks the START of a new
attention block and 0 continues the previous block; tokens may attend to any
valid token whose cumulative block index is <= their own. This single
primitive expresses causal, prefix-LM, and the Pi0 block layout
(image+language full attention | state | action chunk).

Reference semantics: `modeling_mvla.py:101-137` (itself copied from
big_vision). Implemented with cumsum + broadcast compare — fuses into the
attention kernel under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_att_2d_masks(pad_masks: jnp.ndarray, att_masks: jnp.ndarray) -> jnp.ndarray:
    """[B, N] pad + block-start masks -> bool[B, N, N] attention mask.

    out[b, i, j] = pad[b, j] and (cumsum(att)[b, j] <= cumsum(att)[b, i])
    """
    if att_masks.ndim != 2 or pad_masks.ndim != 2:
        raise ValueError(
            f"expected 2D masks, got att {att_masks.ndim}D / pad {pad_masks.ndim}D"
        )
    cum = jnp.cumsum(att_masks.astype(jnp.int32), axis=1)
    att_2d = cum[:, None, :] <= cum[:, :, None]
    return jnp.logical_and(att_2d, pad_masks[:, None, :].astype(bool))


def pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int, value=0):
    """Pad `axis` up to a multiple (static shapes for the MXU/Pallas tiling).

    Returns (padded, original_size)."""
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x, size
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=value), size
