"""Pallas fused W8A8 matmul: per-token activation quantization + int8 MXU
dot + rescale in one kernel.

STATUS (round-3 profiling, scripts/profile_int8_shapes.py on v5e): the XLA
int8 lowering (models/common._dense_int8) WINS or ties at every pi0-3B
serving shape — this kernel stays opt-in (INTACT_TPU_PALLAS_INT8=1).
Measured pallas/xla time ratios with loop-chained timing (an earlier
"1.26x pallas win" microbenchmark was an artifact: the un-chained loop let
XLA hoist the loop-invariant matmul):

    M=320    decode shapes              ~1.0-1.1x (launch-overhead bound)
    M=16384  K=1152 N=1152 (siglip qkv) ~1.05-1.25x
    M=16384  K=4304 (siglip mlp down)   ~1.5-1.9x  <- worst
    M=20992  K=2048 N=16384 (gemma up)  ~1.1-1.3x (tuned 512/512+)

Why XLA wins: it quantizes x ONCE per row over the full K (one int8
HBM round-trip) and then runs a plain int8 matmul with its own K-tiling;
this kernel re-quantizes each (row, bk) slab and re-fetches x once per
N-block — at N=16384 that re-read is pure HBM overhead, and at K=4304+
the per-slab abs-max/round VPU work repeats n_blocks times. Beating that
would require persisting x blocks across grid steps, which the (m, n, k)
revisit pattern cannot express.

Quantization granularity: per (row, K-chunk) — finer than the XLA path's
per-row scale (strictly more accurate); weights keep per-output-channel
scales (models/common.quantize_dense).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_M = 256
BLOCK_N = 512
BLOCK_K = 2048


def _kernel(x_ref, wq_ref, ws_ref, o_ref, *, n_k: int):
    # grid (m, n, k); k innermost so the fp32 accumulator lives in o_ref
    ik = pl.program_id(2)

    x = x_ref[...].astype(jnp.float32)  # [bm, bk]
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.round(x / xs).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    update = acc.astype(jnp.float32) * xs  # [bm, bn] * [bm, 1]

    @pl.when(ik == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += update

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[...] *= ws_ref[...].astype(jnp.float32)  # [1, bn]


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("interpret", "block_m", "block_n",
                                              "block_k"))
def w8a8_matmul(
    x: jnp.ndarray,  # [M, K] float (bf16/f32)
    wq: jnp.ndarray,  # [K, N] int8
    wscale: jnp.ndarray,  # [N] fp32 per-output-channel scales
    interpret: bool = False,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
) -> jnp.ndarray:
    """-> [M, N] in x.dtype. Pads M/N/K to block multiples internally."""
    m, k = x.shape
    n = wq.shape[1]
    bm = min(block_m or BLOCK_M, -(-m // 8) * 8)
    bn = min(block_n or BLOCK_N, -(-n // 128) * 128)
    bk = min(block_k or BLOCK_K, -(-k // 128) * 128)

    xp = _pad_to(_pad_to(x, 0, bm), 1, bk)
    wqp = _pad_to(_pad_to(wq, 0, bk), 1, bn)
    wsp = _pad_to(wscale.reshape(1, -1), 1, bn)
    mp, kp = xp.shape
    np_ = wqp.shape[1]
    n_k = kp // bk

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(mp // bm, np_ // bn, n_k),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            # m/n blocks are independent; only k revisits an output block
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=xp.size * xp.dtype.itemsize + wqp.size + wsp.size * 4,
            transcendentals=0,
        ),
    )(xp, wqp, wsp)
    return out[:m, :n].astype(x.dtype)
