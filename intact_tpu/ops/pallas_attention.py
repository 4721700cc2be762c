"""Pallas TPU fused attention for VLA-scale sequences.

Replaces the reference's flash-attn / torch flex_attention usage
(`src/model/mvla/flex_attention.py:31-141`, SURVEY.md §2.9) with a
TPU-native kernel tuned for Pi0 shapes: prefix length ~330 (K*256 image +
<=72 language tokens), head_dim 256, GQA 8 query heads over 1 KV head,
arbitrary bool mask (padding + big_vision block structure).

Design: sequences are SHORT, so instead of an online-softmax flash loop the
kernel computes each (batch, q-head, q-block) tile in one shot — Q-block
[Bq, D] x full K^T [S, D] on the MXU in fp32, masked softmax entirely in
VMEM, then P x V. For S <= ~2k this is faster than flash tiling (no
rescaling passes) and the whole working set (<1 MB) sits in VMEM. Fully
masked rows (query padding) return 0 instead of NaN.

The public `flash_attention` matches `ops.attention.xla_attention`'s
signature so the dispatcher can swap impls; inputs are padded to lane/
sublane multiples internally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intact_tpu.ops.attention import BIG_NEG

DEFAULT_Q_BLOCK = 128


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale: float):
    # blocks: q [1,1,Bq,D], k/v [1,1,S,D], mask [1,Bq,S] (int8; 1 = attend)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    mask = mask_ref[0] != 0
    logits = jnp.where(mask, logits, BIG_NEG)

    # safe masked softmax: fully-masked rows -> 0 output, not NaN
    row_max = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - row_max) * mask.astype(jnp.float32)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / jnp.maximum(denom, 1e-30)

    out_ref[0, 0] = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _pad_axis(x, axis, multiple, value=0):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(jax.jit, static_argnames=("scale", "q_block", "interpret"))
def flash_attention(
    q: jnp.ndarray,  # [B, T, H, D]
    k: jnp.ndarray,  # [B, S, KVH, D]
    v: jnp.ndarray,  # [B, S, KVH, D]
    mask: jnp.ndarray | None = None,  # bool [B, T, S]
    scale: float | None = None,
    q_block: int = DEFAULT_Q_BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    b, t, h, d = q.shape
    s, kvh = k.shape[1], k.shape[2]
    scale = d**-0.5 if scale is None else scale
    group = h // kvh

    if mask is None:
        mask = jnp.ones((b, t, s), bool)
    mask8 = mask.astype(jnp.int8)

    # pad sequence dims to tile multiples; padded KV columns are masked out,
    # padded Q rows produce zeros and are sliced away
    qp = _pad_axis(q, 1, q_block)
    kp = _pad_axis(k, 1, 128)
    vp = _pad_axis(v, 1, 128)
    mp = _pad_axis(_pad_axis(mask8, 2, 128), 1, q_block)
    tp, sp = qp.shape[1], kp.shape[1]

    # layouts: q [B, H, Tp, D]; kv [B, KVH, Sp, D]; mask [B, Tp, Sp]
    qp = qp.transpose(0, 2, 1, 3)
    kp = kp.transpose(0, 2, 1, 3)
    vp = vp.transpose(0, 2, 1, 3)

    grid = (b, h, tp // q_block)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, d), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, q_block, d),
                    lambda ib, ih, iq: (ib, ih, iq, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, sp, d),
                    lambda ib, ih, iq, g=group: (ib, ih // g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, sp, d),
                    lambda ib, ih, iq, g=group: (ib, ih // g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, q_block, sp),
                    lambda ib, ih, iq: (ib, iq, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, q_block, d),
                lambda ib, ih, iq: (ib, ih, iq, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * tp * sp * d,
            bytes_accessed=(qp.size + kp.size * group + vp.size * group) * qp.dtype.itemsize,
            transcendentals=b * h * tp * sp,
        ),
    )(
        qp.reshape(b, h, tp, d),
        kp.reshape(b, kvh, sp, d),
        vp.reshape(b, kvh, sp, d),
        mp,
    )
    return out.transpose(0, 2, 1, 3)[:, :t]
