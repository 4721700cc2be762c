"""Blockwise 8-bit AdamW state: the TPU equivalent of bitsandbytes AdamW8bit.

The reference trains its primary recipe with `bnb.optim.AdamW8bit`
(`src/agent/trainer.py:204-210`): Adam first/second moments stored as 8-bit
codes with per-block absmax scales, dequantized to fp32 for the update and
requantized after. This module reimplements that capability as a pure optax
`GradientTransformation` so the moments pytree is int8 on device:

  * dynamic (log-banded) 256-entry codebooks, signed for mu / unsigned for
    nu — 7 decades of dynamic range, fine resolution near the block absmax
    (same design space as bitsandbytes' dynamic tree quantization; exact
    bit-parity with bnb's codebook is NOT a goal, equivalent capability is);
  * per-block absmax scaling (block_size contiguous elements of the
    flattened leaf), stored fp32;
  * small leaves (norms, biases, scalar projections) keep fp32 moments —
    quantization overhead would exceed the savings;
  * the whole decode -> adam update -> encode chain is elementwise, so XLA
    fuses it into the update kernel; fp32 moments never persist in HBM.

Memory: 2 bytes/param of moment state (vs 8 fp32) + 2*4/block_size bytes of
scales, i.e. ~4.2 GB less per billion trainable params.

Quantization noise is bounded by the codebook resolution near the block
absmax and the banded code below it; `tests/test_optim8bit.py` pins
round-trip error and multi-step update parity against exact optax.adamw.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax


# ---------------------------------------------------------------------------
# dynamic codebooks
# ---------------------------------------------------------------------------

def make_dynamic_codebook(signed: bool, decades: int = 7) -> np.ndarray:
    """256-entry code over [-1, 1] (signed) or [0, 1] (unsigned).

    Log bands 10^-decades .. 1, each band linearly subdivided with
    geometrically more points in the high-magnitude bands (dynamic tree
    spirit: ~1% resolution near the absmax, coarser for tiny values).
    Returned sorted ascending; code[i] is the dequantized value of index i.
    """
    per_sign = 127 if signed else 254
    # allocate points per band ~ 2^band, normalized to per_sign total
    weights = np.array([2.0**e for e in range(decades)])
    counts = np.maximum(1, np.round(weights / weights.sum() * per_sign)).astype(int)
    # fix rounding drift on the top (finest) band
    counts[-1] += per_sign - counts.sum()
    vals = []
    for e, n in enumerate(counts):
        lo = 10.0 ** (e - decades)
        hi = 10.0 ** (e - decades + 1)
        # include the band's top endpoint only for the last band (hi == 1.0)
        pts = np.linspace(lo, hi, n, endpoint=(e == decades - 1))
        vals.append(pts)
    pos = np.concatenate(vals)
    pos[-1] = 1.0  # exact top
    if signed:
        code = np.concatenate([-pos[::-1], [0.0], pos])  # 255 entries
        code = np.concatenate([code, [1.0]])  # pad to 256 (duplicate top)
    else:
        code = np.concatenate([[0.0], pos, [1.0]])  # 256 entries
    code = np.sort(code.astype(np.float32))
    assert code.shape == (256,), code.shape
    return code


_CODE_SIGNED = make_dynamic_codebook(signed=True)
_CODE_UNSIGNED = make_dynamic_codebook(signed=False)
# quantization boundaries = midpoints between adjacent code values
_BOUND_SIGNED = ((_CODE_SIGNED[1:] + _CODE_SIGNED[:-1]) / 2).astype(np.float32)
_BOUND_UNSIGNED = ((_CODE_UNSIGNED[1:] + _CODE_UNSIGNED[:-1]) / 2).astype(np.float32)


# ---------------------------------------------------------------------------
# blockwise encode / decode
# ---------------------------------------------------------------------------

def _encode(x: jnp.ndarray, signed: bool, block_size: int) -> dict:
    """fp32 leaf -> {"q": int8 [nb, block], "scale": f32 [nb, 1]}."""
    code = jnp.asarray(_CODE_SIGNED if signed else _CODE_UNSIGNED)
    bounds = jnp.asarray(_BOUND_SIGNED if signed else _BOUND_UNSIGNED)
    del code  # encoding only needs the boundaries
    flat = x.astype(jnp.float32).reshape(-1)
    n = flat.size
    nb = -(-n // block_size)
    flat = jnp.pad(flat, (0, nb * block_size - n))
    blocks = flat.reshape(nb, block_size)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    u = blocks / jnp.maximum(scale, jnp.finfo(jnp.float32).tiny)
    idx = jnp.searchsorted(bounds, u)  # [0, 255]
    return {
        "q": (idx.astype(jnp.int32) - 128).astype(jnp.int8),
        "scale": scale,
    }


def _decode(qs: dict, signed: bool, shape, size: int) -> jnp.ndarray:
    code = jnp.asarray(_CODE_SIGNED if signed else _CODE_UNSIGNED)
    vals = code[qs["q"].astype(jnp.int32) + 128] * qs["scale"]
    return vals.reshape(-1)[:size].reshape(shape)


def zero_index(signed: bool) -> int:
    """The stored int8 code index that dequantizes to exactly 0."""
    bounds = _BOUND_SIGNED if signed else _BOUND_UNSIGNED
    return int(np.searchsorted(bounds, 0.0)) - 128


def quantized_moment_bytes(n_params: int, block_size: int = 2048) -> int:
    """Bytes of HBM for ONE moment of n_params (q + scales)."""
    nb = -(-n_params // block_size)
    return nb * block_size + nb * 4


# ---------------------------------------------------------------------------
# the transform
# ---------------------------------------------------------------------------

class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray  # int32 scalar
    mu: Any  # pytree: {"q","scale"} dicts for quantized leaves, fp32 arrays else
    nu: Any


def scale_by_adam8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    block_size: int = 2048,
    min_quant_elems: int = 65536,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with int8 blockwise-quantized mu/nu.

    Leaves with fewer than `min_quant_elems` elements keep exact fp32
    moments (quantizing a 2k-element norm saves nothing and costs noise).
    """

    def should_quantize(leaf) -> bool:
        return leaf.size >= min_quant_elems

    # the int8 code index that dequantizes to exactly 0 (scale=0 makes any
    # index exact, but stay canonical): precomputed so init() emits pure
    # zero-fill constants — no fp32 zero tensors, no encode compute
    _zero_idx_signed = zero_index(signed=True)
    _zero_idx_unsigned = zero_index(signed=False)

    def init(params):
        def init_moment(p, zero_idx):
            if should_quantize(p):
                nb = -(-p.size // block_size)
                return {
                    "q": jnp.full((nb, block_size), zero_idx, jnp.int8),
                    "scale": jnp.zeros((nb, 1), jnp.float32),
                }
            return jnp.zeros(p.shape, jnp.float32)

        return ScaleByAdam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(lambda p: init_moment(p, _zero_idx_signed), params),
            nu=jax.tree.map(lambda p: init_moment(p, _zero_idx_unsigned), params),
        )

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, mu_s, nu_s):
            g = g.astype(jnp.float32)
            quant = isinstance(mu_s, dict)
            mu = _decode(mu_s, True, g.shape, g.size) if quant else mu_s
            nu = _decode(nu_s, False, g.shape, g.size) if quant else nu_s
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * jnp.square(g)
            out = (mu / c1) / (jnp.sqrt(nu / c2) + eps)
            if quant:
                mu_s = _encode(mu, True, block_size)
                nu_s = _encode(nu, False, block_size)
            else:
                mu_s, nu_s = mu, nu
            return out, mu_s, nu_s

        flat, treedef = jax.tree_util.tree_flatten(grads)
        mu_flat = treedef.flatten_up_to(state.mu)
        nu_flat = treedef.flatten_up_to(state.nu)
        outs, mus, nus = [], [], []
        for g, m, n in zip(flat, mu_flat, nu_flat):
            o, m2, n2 = upd(g, m, n)
            outs.append(o)
            mus.append(m2)
            nus.append(n2)
        return (
            jax.tree_util.tree_unflatten(treedef, outs),
            ScaleByAdam8bitState(
                count=count,
                mu=jax.tree_util.tree_unflatten(treedef, mus),
                nu=jax.tree_util.tree_unflatten(treedef, nus),
            ),
        )

    return optax.GradientTransformation(init, update)


def adamw8bit(
    learning_rate: Union[float, Callable],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-5,
    block_size: int = 2048,
    min_quant_elems: int = 65536,
    mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """Drop-in for optax.adamw with 8-bit moment state (bnb AdamW8bit
    equivalent, reference `src/agent/trainer.py:204-210`)."""
    return optax.chain(
        scale_by_adam8bit(
            b1=b1, b2=b2, eps=eps,
            block_size=block_size, min_quant_elems=min_quant_elems,
        ),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )


# ---------------------------------------------------------------------------
# stochastic rounding for bf16 master params
# ---------------------------------------------------------------------------

def apply_updates_stochastic(params, updates, key) -> Any:
    """params + updates with STOCHASTIC rounding into each param's dtype.

    With bf16 master params (the reference casts the whole model to bf16
    before AdamW8bit — `trainer.py:133-140,204` — so its updates round-to-
    nearest into bf16), an update smaller than the bf16 ulp (~4e-3 relative)
    is lost entirely. Stochastic rounding keeps the EXPECTED parameter equal
    to the exact fp32 sum, so tiny updates accumulate correctly — the
    TPU-idiomatic fix for pure-bf16 training, and strictly better numerics
    than the reference's round-to-nearest.

    fp32 leaves are updated exactly (no randomness needed).
    """
    leaves = jax.tree_util.tree_leaves(params)
    keys = jax.random.split(key, len(leaves))
    keys = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), list(keys)
    )

    def apply(p, u, k):
        if u is None:
            return p
        exact = p.astype(jnp.float32) + u.astype(jnp.float32)
        if p.dtype != jnp.bfloat16:
            return exact.astype(p.dtype)
        bits = jax.lax.bitcast_convert_type(exact, jnp.uint32)
        noise = jax.random.randint(
            k, exact.shape, 0, 1 << 16, dtype=jnp.uint32
        )
        rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
        return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(
            jnp.bfloat16
        )

    return jax.tree.map(apply, params, updates, keys)
