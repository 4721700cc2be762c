"""Fused 8-bit-state AdamW row update as a single Pallas TPU kernel.

WHY. The fused joint step (train/fused_joint.py) applies the AdamW update
per trunk layer inside its reverse backward scan. The round-4 XLA
formulation (TrunkPack.pack -> chunked lax.map decode/adam/encode ->
unpack -> .at[layer].set) moved every parameter byte ~3x more than the
information flow requires: measured 342.6 ms of a 1192.9 ms step @ batch
24 against a ~60 ms HBM-traffic floor (VERDICT r4 profile,
scripts/profile_joint_phases.py).

THE KERNEL reads each byte exactly once and writes each byte exactly
once, all in place:

  in : p[L, r, B] (bf16)   g[r, B]   qm/qn[L, NB, B] (fp8/f32 moments)
       sm/sn[L, NB] (f32 block scales; 2-D — a trailing length-1 dim
       tile-pads 128x in f32 T(8,128) layouts)
  out: p' (aliased), qm'/sm'/qn'/sn' (aliased), ss (sum of squared raw
       gradients, for the exact global-norm metric)

The grid tiles the leaf's rows; the dynamic `layer` index and the PRNG
seed arrive via scalar prefetch so the BlockSpec index maps can address
row `off + i` of layer `layer` of the shared per-tree moment arrays —
each trunk leaf owns a static row range [off, off + r) of the packed
[L, NB, B] moment matrices (TrunkPack layout). input_output_aliases
makes the update genuinely in place: rows of other layers are never
touched or copied.

Per-leaf eligibility: the leaf's flat size must be a multiple of
`block_size` and its row count a multiple of the row tile (128) — true
for every Gemma/expert trunk matrix at bridge scale. Ineligible leaves
(norm scales, ragged SigLIP matrices) keep the XLA fallback path.

No reference counterpart: the reference delegates this to bitsandbytes'
CUDA kernels (`/root/reference/src/agent/trainer.py:204-210`); this is
the TPU-native equivalent, specialized to the packed-row moment layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fp8 finite maxima for the per-block scale normalization
_FP8_MAX = {
    jnp.dtype(jnp.float8_e4m3fn): 448.0,
    jnp.dtype(jnp.float8_e5m2): 57344.0,
}

ROW_TILE = 128


def eligible(n_elems: int, block_size: int) -> bool:
    """True if a leaf of n_elems can take the Pallas row-update path."""
    if n_elems % block_size:
        return False
    rows = n_elems // block_size
    return rows % ROW_TILE == 0


def _kernel(ls_ref, hyp_ref, p_ref, g_ref, qm_ref, sm_ref, qn_ref, sn_ref,
            p_out, qm_out, sm_out, qn_out, sn_out, ss_out,
            *, b1, b2, eps, wd, fp8, stochastic, out_dtype):
    i = pl.program_id(0)
    c1 = hyp_ref[0, 0]
    c2 = hyp_ref[0, 1]
    lr = hyp_ref[0, 2]
    clip = hyp_ref[0, 3]

    g32 = g_ref[...].astype(jnp.float32)

    # exact global-norm contribution from the RAW gradient (pre-clip);
    # grid steps are sequential on TPU so += into the revisited block is
    # the standard accumulation pattern
    @pl.when(i == 0)
    def _():
        ss_out[0, 0] = 0.0

    ss_out[0, 0] += jnp.sum(g32 * g32)

    g32 = g32 * clip
    layer = ls_ref[0]
    if fp8:
        # scales are stored [L, NB] (a trailing length-1 dim would tile-pad
        # 128x in f32 T(8,128) layouts — measured 504 MB per array of pure
        # padding). The block carries ALL L rows (TPU blocks need sublane
        # % 8 == 0 or == the full dim; L is the full dim) — ~9 KB — and
        # the kernel selects/rewrites row `layer` in place.
        mu = qm_ref[0].astype(jnp.float32) \
            * sm_ref[pl.ds(layer, 1), :].reshape(-1, 1)
        nu = qn_ref[0].astype(jnp.float32) \
            * sn_ref[pl.ds(layer, 1), :].reshape(-1, 1)
    else:
        mu = qm_ref[0]
        nu = qn_ref[0]

    # same association as fused_joint._adam_math for float parity
    mu = b1 * mu + (1.0 - b1) * g32
    nu = b2 * nu + (1.0 - b2) * jnp.square(g32)
    direction = (mu / c1) / (jnp.sqrt(nu / c2) + eps)

    p32 = p_ref[0].astype(jnp.float32)
    exact = p32 + (-lr) * (direction + wd * p32)
    if stochastic and out_dtype == jnp.bfloat16:
        # same bit math as fused_joint._sr_add: add 16 random mantissa bits,
        # truncate to the bf16 prefix
        pltpu.prng_seed(ls_ref[1] + i)
        noise = pltpu.bitcast(pltpu.prng_random_bits(exact.shape),
                              jnp.uint32) & jnp.uint32(0xFFFF)
        fbits = pltpu.bitcast(exact, jnp.uint32)
        rounded = (fbits + noise) & jnp.uint32(0xFFFF0000)
        p_out[0] = pltpu.bitcast(rounded, jnp.float32).astype(jnp.bfloat16)
    else:
        p_out[0] = exact.astype(out_dtype)

    if fp8:
        def enc(x, dtype, s_in, s_out):
            scale = jnp.max(jnp.abs(x), axis=1, keepdims=True) \
                / _FP8_MAX[jnp.dtype(dtype)]
            scale = jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
            # rewrite only row `layer` of the (L, R) scale block
            all_rows = s_in[...]
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, all_rows.shape, 0)
            s_out[...] = jnp.where(row_ids == layer,
                                   scale.reshape(1, -1), all_rows)
            return (x / scale).astype(dtype)

        qm_out[0] = enc(mu, qm_out.dtype, sm_ref, sm_out)
        qn_out[0] = enc(nu, qn_out.dtype, sn_ref, sn_out)
    else:
        qm_out[0] = mu
        sm_out[...] = sm_ref[...]
        qn_out[0] = nu
        sn_out[...] = sn_ref[...]


def fused_adam_rows(p_stack, g_rows, qm, sm, qn, sn, *, layer, seed,
                    c1, c2, lr, clip_factor, hp, row_offset: int,
                    stochastic: bool, interpret: bool = False):
    """One leaf's in-place row update.

    p_stack: [L, r, B] params; g_rows: [r, B] this layer's gradient;
    qm/qn: the FULL per-tree packed moment arrays [L, NB, B]; sm/sn their
    per-row scales [L, NB] — the leaf owns rows [row_offset, row_offset
    + r) of layer `layer`. Returns (p_stack', qm', sm', qn', sn', ss)
    with the five arrays updated in place (pass them donated).
    """
    L, r, B = p_stack.shape
    assert g_rows.shape == (r, B), (g_rows.shape, (r, B))
    assert r % ROW_TILE == 0, r
    fp8 = qm.dtype != jnp.float32
    if fp8 and (qm.dtype, qn.dtype) != (jnp.float8_e4m3fn, jnp.float8_e5m2):
        raise ValueError(f"unsupported moment dtypes {qm.dtype}/{qn.dtype}")

    grid = (r // ROW_TILE,)
    assert row_offset % ROW_TILE == 0, row_offset

    # layer AND the row offset are scalar-prefetch-dynamic: kernels then
    # specialize only on (shapes, dtypes, flags) — each distinct Mosaic
    # compile costs minutes through the tunnel, so leaves sharing a shape
    # share one kernel
    def p_map(i, ls):
        return (ls[0], i, 0)

    def m_map(i, ls):
        return (ls[0], ls[2] + i, 0)

    def s_map(i, ls):  # scale arrays are 2-D [L, NB]; block takes all L rows
        return (0, ls[2] + i)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4), lambda i, ls: (0, 0),
                         memory_space=pltpu.SMEM),            # hyp
            pl.BlockSpec((1, ROW_TILE, B), p_map),            # p
            pl.BlockSpec((ROW_TILE, B), lambda i, ls: (i, 0)),  # g
            pl.BlockSpec((1, ROW_TILE, B), m_map),            # qm
            pl.BlockSpec((L, ROW_TILE), s_map),               # sm [L, NB]
            pl.BlockSpec((1, ROW_TILE, B), m_map),            # qn
            pl.BlockSpec((L, ROW_TILE), s_map),               # sn [L, NB]
        ],
        out_specs=[
            pl.BlockSpec((1, ROW_TILE, B), p_map),
            pl.BlockSpec((1, ROW_TILE, B), m_map),
            pl.BlockSpec((L, ROW_TILE), s_map),
            pl.BlockSpec((1, ROW_TILE, B), m_map),
            pl.BlockSpec((L, ROW_TILE), s_map),
            pl.BlockSpec((1, 1), lambda i, ls: (0, 0),
                         memory_space=pltpu.SMEM),            # ss
        ],
    )
    kernel = functools.partial(
        _kernel, b1=float(hp.betas[0]), b2=float(hp.betas[1]),
        eps=float(hp.eps), wd=float(hp.weight_decay), fp8=fp8,
        stochastic=stochastic, out_dtype=p_stack.dtype)

    ls = jnp.stack([jnp.asarray(layer, jnp.int32),
                    jnp.asarray(seed, jnp.int32),
                    jnp.asarray(row_offset // ROW_TILE, jnp.int32)])
    hyp = jnp.stack([c1, c2, lr, clip_factor]).astype(jnp.float32)[None, :]

    p2, qm2, sm2, qn2, sn2, ss = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(p_stack.shape, p_stack.dtype),
            jax.ShapeDtypeStruct(qm.shape, qm.dtype),
            jax.ShapeDtypeStruct(sm.shape, sm.dtype),
            jax.ShapeDtypeStruct(qn.shape, qn.dtype),
            jax.ShapeDtypeStruct(sn.shape, sn.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        # operand indices include the scalar-prefetch arg (0) and hyp (1):
        # p=2, g=3, qm=4, sm=5, qn=6, sn=7
        input_output_aliases={2: 0, 4: 1, 5: 2, 6: 3, 7: 4},
        # the TPU-flavored interpreter lowers prng_* on CPU
        interpret=pltpu.InterpretParams() if interpret else False,
    )(ls, hyp, p_stack, g_rows, qm, sm, qn, sn)
    return p2, qm2, sm2, qn2, sn2, ss[0, 0]
