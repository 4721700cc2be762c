"""DiT action head: transformer denoiser with adaLN-Zero modulation.

Compact equivalent of the reference's DiT action model
(`src/model/mvla/action_model/models.py:157`, `action_model.py:23`): noisy
action tokens are denoised by transformer blocks whose layernorm scale/shift
/gate come from an MLP over (timestep embedding + condition embedding) —
an alternative action decoder for MVLA-family models, driven through
models.diffusion.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from intact_tpu.models import common as cm
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.models.diffusion import timestep_embedding
from intact_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    width: int = 384  # DiT-S
    depth: int = 6
    num_heads: int = 6
    mlp_ratio: int = 4
    action_dim: int = 7
    horizon: int = 4
    cond_dim: int = 384


def dit_s(action_dim: int, horizon: int, cond_dim: int) -> DiTConfig:
    return DiTConfig(width=384, depth=6, num_heads=6,
                     action_dim=action_dim, horizon=horizon, cond_dim=cond_dim)


def tiny_test_config() -> DiTConfig:
    return DiTConfig(width=32, depth=2, num_heads=2, action_dim=3, horizon=4, cond_dim=16)


def _block_init(key, cfg: DiTConfig) -> cm.Params:
    ks = jax.random.split(key, 7)
    d, m = cfg.width, cfg.width * cfg.mlp_ratio
    return {
        "attn": {
            "q": cm.dense_init(ks[0], d, d),
            "k": cm.dense_init(ks[1], d, d),
            "v": cm.dense_init(ks[2], d, d),
            "o": cm.dense_init(ks[3], d, d),
        },
        "mlp": {"fc1": cm.dense_init(ks[4], d, m), "fc2": cm.dense_init(ks[5], m, d)},
        # adaLN-Zero: 6 modulation vectors, zero-init so blocks start as identity
        "ada": {"kernel": jnp.zeros((d, 6 * d)), "bias": jnp.zeros((6 * d,))},
    }


def init(key, cfg: DiTConfig) -> cm.Params:
    ks = jax.random.split(key, 6)
    d = cfg.width
    return {
        "x_proj": cm.dense_init(ks[0], cfg.action_dim, d),
        "pos_embed": jax.random.normal(ks[1], (1, cfg.horizon, d)) * 0.02,
        "t_mlp": {
            "fc1": cm.dense_init(ks[2], d, d),
            "fc2": cm.dense_init(ks[3], d, d),
        },
        "cond_proj": cm.dense_init(ks[4], cfg.cond_dim, d),
        "blocks": cm.stack_layer_init(ks[5], cfg.depth, lambda k: _block_init(k, cfg)),
        "final": {
            "ada": {"kernel": jnp.zeros((d, 2 * d)), "bias": jnp.zeros((2 * d,))},
            "proj": {"kernel": jnp.zeros((d, cfg.action_dim)),
                     "bias": jnp.zeros((cfg.action_dim,))},
        },
    }


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


def _ln(x):
    # parameter-free layernorm (adaLN supplies scale/shift)
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)


def apply(params: cm.Params, x_t: jnp.ndarray, t_int: jnp.ndarray,
          cond: jnp.ndarray, cfg: DiTConfig,
          policy: DtypePolicy = DEFAULT_POLICY) -> jnp.ndarray:
    """Denoise: x_t [B, horizon, action_dim], t_int [B], cond [B, cond_dim]
    -> eps [B, horizon, action_dim]."""
    b = x_t.shape[0]
    d, h = cfg.width, cfg.num_heads
    hd = d // h

    x = cm.dense(params["x_proj"], policy.cast(x_t), policy) + policy.cast(params["pos_embed"])

    t_emb = timestep_embedding(t_int, d)
    t_emb = cm.dense(params["t_mlp"]["fc2"],
                     jax.nn.silu(cm.dense(params["t_mlp"]["fc1"], policy.cast(t_emb), policy)),
                     policy)
    c = t_emb + cm.dense(params["cond_proj"], policy.cast(cond), policy)
    c = jax.nn.silu(c)

    def body(x, bp):
        mods = cm.dense(bp["ada"], c, policy)
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mods, 6, axis=-1)
        n = x.shape[1]
        y = _modulate(_ln(x), sh1, sc1)
        q = cm.dense(bp["attn"]["q"], y, policy).reshape(b, n, h, hd)
        k = cm.dense(bp["attn"]["k"], y, policy).reshape(b, n, h, hd)
        v = cm.dense(bp["attn"]["v"], y, policy).reshape(b, n, h, hd)
        att = multi_head_attention(q, k, v, mask=None)
        x = x + g1[:, None, :] * cm.dense(bp["attn"]["o"], att.reshape(b, n, d), policy)
        y = _modulate(_ln(x), sh2, sc2)
        x = x + g2[:, None, :] * cm.gelu_mlp(bp["mlp"], y, policy)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    sh, sc = jnp.split(cm.dense(params["final"]["ada"], c, policy), 2, axis=-1)
    x = _modulate(_ln(x), sh, sc)
    return cm.dense(params["final"]["proj"], x.astype(jnp.float32),
                    DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32))
