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


def xla_attention(
    q: jnp.ndarray,  # [B, T, H, D]
    k: jnp.ndarray,  # [B, S, KVH, D]
    v: jnp.ndarray,  # [B, S, KVH, D]
    mask: jnp.ndarray | None,  # bool[B, T, S] (True = attend)
    scale: float | None = None,
) -> jnp.ndarray:
    b, t, h, d = q.shape
    kvh = k.shape[2]
    scale = d**-0.5 if scale is None else scale

    if kvh == h:
        logits = jnp.einsum("bthd,bshd->bhts", q * scale, k,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = jnp.where(mask[:, None, :, :], logits, BIG_NEG)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhts,bshd->bthd", probs.astype(v.dtype), v)

    # GQA: contract per KV head with the query groups as a free dimension —
    # NEVER materialize repeated K/V. The old jnp.repeat path copied the
    # whole KV set x(H/KVH) through HBM on every call; in the Pi0 denoise
    # loop (10 Euler steps x 18 layers against a 333-token cache, 8 q-heads
    # over 1 KV head) that was ~31 GB of pure broadcast traffic per
    # inference — measured 55.6 ms -> ~21 ms for the denoise phase on one
    # v5e (scripts/profile_pi0_phases.py). Head-group mapping matches
    # jnp.repeat semantics: head i uses kv head i // group.
    g = h // kvh
    qg = q.reshape(b, t, kvh, g, d)
    logits = jnp.einsum("btkgd,bskd->bkgts", qg * scale, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :, :], logits, BIG_NEG)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bkgts,bskd->btkgd", probs.astype(v.dtype), v)
    return out.reshape(b, t, h, d)


def xla_attention_cached(
    q: jnp.ndarray,  # [B, T, H, D]
    k_cache: jnp.ndarray,  # [B, S1, KVH, D] constant across decode steps
    v_cache: jnp.ndarray,  # [B, S1, KVH, D]
    k_new: jnp.ndarray,  # [B, S2, KVH, D] fresh keys this step
    v_new: jnp.ndarray,  # [B, S2, KVH, D]
    mask_cache: jnp.ndarray,  # bool[B, T, S1]
    mask_new: jnp.ndarray,  # bool[B, T, S2]
    scale: float | None = None,
) -> jnp.ndarray:
    """Attention over [cache; new] K/V WITHOUT concatenating them.

    Mathematically identical to
    `xla_attention(q, concat(k_cache, k_new), ..., concat(masks))`: logits
    are computed against each part, the softmax runs over the union, and the
    output is the sum of the two probability-weighted values. The point is
    bandwidth — `jnp.concatenate([cache, fresh])` inside a decode loop
    re-copies the large constant cache through HBM on every step (Pi0's
    10-step Euler loop: ~10 GB of pure copy traffic per inference at
    batch 64); computing against the cache in place skips all of it.
    GQA contracts per KV head, grouped-einsum style (see xla_attention).
    """
    b, t, h, d = q.shape
    kvh = k_cache.shape[2]
    g = h // kvh
    scale = d**-0.5 if scale is None else scale
    qg = (q * scale).reshape(b, t, kvh, g, d)
    lc = jnp.einsum("btkgd,bskd->bkgts", qg, k_cache,
                    preferred_element_type=jnp.float32)
    ln = jnp.einsum("btkgd,bskd->bkgts", qg, k_new,
                    preferred_element_type=jnp.float32)
    lc = jnp.where(mask_cache[:, None, None, :, :], lc, BIG_NEG)
    ln = jnp.where(mask_new[:, None, None, :, :], ln, BIG_NEG)
    probs = jax.nn.softmax(
        jnp.concatenate([lc, ln], axis=-1).astype(jnp.float32), axis=-1
    )
    s1 = k_cache.shape[1]
    pc, pn = probs[..., :s1], probs[..., s1:]
    out = (
        jnp.einsum("bkgts,bskd->btkgd", pc.astype(v_cache.dtype), v_cache)
        + jnp.einsum("bkgts,bskd->btkgd", pn.astype(v_new.dtype), v_new)
    )
    return out.reshape(b, t, h, d)


import functools

import numpy as np


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def pallas_attention_diff(q, k, v, mask, scale, interpret=False):
    """Flash forward + XLA-math backward: the Pallas kernel has no native
    VJP, so training paths differentiate through the (mathematically
    identical) einsum attention while inference keeps the fused kernel."""
    from intact_tpu.ops.pallas_attention import flash_attention

    return flash_attention(q, k, v, mask=mask, scale=scale, interpret=interpret)


def _pallas_fwd(q, k, v, mask, scale, interpret):
    out = pallas_attention_diff(q, k, v, mask, scale, interpret)
    return out, (q, k, v, mask)


def _pallas_bwd(scale, interpret, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: xla_attention(q_, k_, v_, mask, scale), q, k, v)
    dq, dk, dv = vjp(g)
    dmask = (
        None if mask is None else np.zeros(mask.shape, dtype=jax.dtypes.float0)
    )
    return dq, dk, dv, dmask


pallas_attention_diff.defvjp(_pallas_fwd, _pallas_bwd)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    impl: str = "xla",
    scale: float | None = None,
) -> jnp.ndarray:
    if impl == "pallas":
        if jax.default_backend() != "tpu":
            # off-TPU (CPU tests, virtual meshes): XLA path, same numerics
            return xla_attention(q, k, v, mask, scale)
        scale = q.shape[-1] ** -0.5 if scale is None else scale
        return pallas_attention_diff(q, k, v, mask, scale, False)
    if impl != "xla":
        raise ValueError(f"unknown attention impl: {impl!r}")
    return xla_attention(q, k, v, mask, scale)
