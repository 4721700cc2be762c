"""Rotary position embedding, Gemma/PaliGemma convention.

Half-split layout (first half = "real", second half = "imag" lanes), default
base 10_000, angles computed in fp32 regardless of activation dtype
(reference mllm.py:30-52 does the same upcast).
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_rope(
    x: jnp.ndarray,  # [B, T, H, D]
    positions: jnp.ndarray,  # [B, T]
    base: float = 10_000.0,
) -> jnp.ndarray:
    d_half = x.shape[-1] // 2
    freq_exponents = (2.0 / x.shape[-1]) * jnp.arange(d_half, dtype=jnp.float32)
    inv_freq = base**-freq_exponents  # [D/2]
    angle = positions[..., None].astype(jnp.float32) * inv_freq[None, None, :]
    angle = angle[:, :, None, :]  # [B, T, 1, D/2]
    sin, cos = jnp.sin(angle), jnp.cos(angle)

    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :d_half], x32[..., d_half:]
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)
