"""Attention dispatch: XLA einsum path + Pallas flash path.

Shapes follow the TPU-friendly [B, T, H, D] layout (batch, seq, heads, head
dim) with grouped-query support (KV heads broadcast over query groups —
PaliGemma/Gemma use 8 query heads over 1 KV head). Softmax runs in fp32; the
logits never materialize in bf16.

impl="xla":   einsum + masked softmax. XLA fuses this well for the short
              sequences in VLA workloads (prefix ~ K*256+72 tokens, suffix 51).
impl="pallas": tiled flash kernel (ops/pallas_attention.py) for the prefix
              self-attention; falls back to XLA off-TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG_NEG = -2.3819763e38  # most negative fp32 that keeps bf16 finite after cast


def _broadcast_kv(k: jnp.ndarray, num_q_heads: int) -> jnp.ndarray:
    """[B, S, KVH, D] -> [B, S, H, D] by repeating each KV head over its
    query group."""
    b, s, kvh, d = k.shape
    if kvh == num_q_heads:
        return k
    group = num_q_heads // kvh
    return jnp.repeat(k, group, axis=2)


def xla_attention(
    q: jnp.ndarray,  # [B, T, H, D]
    k: jnp.ndarray,  # [B, S, KVH, D]
    v: jnp.ndarray,  # [B, S, KVH, D]
    mask: jnp.ndarray | None,  # bool[B, T, S] (True = attend)
    scale: float | None = None,
) -> jnp.ndarray:
    h, d = q.shape[-2], q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    k = _broadcast_kv(k, h)
    v = _broadcast_kv(v, h)

    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k, preferred_element_type=jnp.float32)
    if mask is not None:
        logits = jnp.where(mask[:, None, :, :], logits, BIG_NEG)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v)
    return out


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    impl: str = "xla",
    scale: float | None = None,
) -> jnp.ndarray:
    if impl == "pallas":
        try:
            from intact_tpu.ops.pallas_attention import flash_attention

            return flash_attention(q, k, v, mask=mask, scale=scale)
        except Exception:
            # off-TPU (tests) or unsupported shape: correctness first
            return xla_attention(q, k, v, mask, scale)
    if impl != "xla":
        raise ValueError(f"unknown attention impl: {impl!r}")
    return xla_attention(q, k, v, mask, scale)
