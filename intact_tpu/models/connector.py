"""Bidirectional transformer connector (Qwen2-encoder-style).

Role parity with `src/model/mvla/transformer_encoder.py:25-178`: a non-causal
encoder with RMSNorm, per-head QK RMSNorm, gated MLP, and optional RoPE,
used to transform the VLM's metaquery outputs into the action expert's
prompt space. Functional JAX with stacked-layer scan like the Gemma blocks.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from intact_tpu.models import common as cm
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.ops.attention import multi_head_attention
from intact_tpu.ops.rope import apply_rope


@dataclasses.dataclass(frozen=True)
class ConnectorConfig:
    width: int = 1024
    depth: int = 12
    mlp_dim: int = 4096
    num_heads: int = 8
    head_dim: int = 128
    use_rope: bool = False
    qk_norm: bool = True
    norm_eps: float = 1e-6


def tiny_test_config() -> ConnectorConfig:
    return ConnectorConfig(width=16, depth=2, mlp_dim=32, num_heads=2, head_dim=8)


def _block_init(key, cfg: ConnectorConfig) -> cm.Params:
    ks = jax.random.split(key, 7)
    d, m, hd = cfg.width, cfg.mlp_dim, cfg.head_dim
    qdim = cfg.num_heads * hd
    p = {
        "ln1": cm.rmsnorm_init(d),
        "attn": {
            "q": cm.dense_init(ks[0], d, qdim, use_bias=False),
            "k": cm.dense_init(ks[1], d, qdim, use_bias=False),
            "v": cm.dense_init(ks[2], d, qdim, use_bias=False),
            "o": cm.dense_init(ks[3], qdim, d, use_bias=False),
        },
        "ln2": cm.rmsnorm_init(d),
        "mlp": {
            "gate": cm.dense_init(ks[4], d, m, use_bias=False),
            "up": cm.dense_init(ks[5], d, m, use_bias=False),
            "down": cm.dense_init(ks[6], m, d, use_bias=False),
        },
    }
    if cfg.qk_norm:
        p["attn"]["q_norm"] = cm.rmsnorm_init(hd)
        p["attn"]["k_norm"] = cm.rmsnorm_init(hd)
    return p


def init(key, cfg: ConnectorConfig, in_dim: int, out_dim: int) -> cm.Params:
    k_in, k_blocks, k_out = jax.random.split(key, 3)
    return {
        "in_proj": cm.dense_init(k_in, in_dim, cfg.width),
        "blocks": cm.stack_layer_init(k_blocks, cfg.depth, lambda k: _block_init(k, cfg)),
        "final_norm": cm.rmsnorm_init(cfg.width),
        "out_proj": cm.dense_init(k_out, cfg.width, out_dim),
    }


def apply(params: cm.Params, x: jnp.ndarray, cfg: ConnectorConfig,
          policy: DtypePolicy = DEFAULT_POLICY) -> jnp.ndarray:
    """[B, N, in_dim] -> [B, N, out_dim], full bidirectional attention."""
    x = cm.dense(params["in_proj"], x, policy)
    b, n, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    positions = jnp.broadcast_to(jnp.arange(n)[None], (b, n))

    def body(xc, bp):
        y = cm.rms_norm(bp["ln1"], xc, cfg.norm_eps)
        q = cm.dense(bp["attn"]["q"], y, policy).reshape(b, n, h, hd)
        k = cm.dense(bp["attn"]["k"], y, policy).reshape(b, n, h, hd)
        v = cm.dense(bp["attn"]["v"], y, policy).reshape(b, n, h, hd)
        if cfg.qk_norm:
            q = cm.rms_norm(bp["attn"]["q_norm"], q, cfg.norm_eps)
            k = cm.rms_norm(bp["attn"]["k_norm"], k, cfg.norm_eps)
        if cfg.use_rope:
            q = apply_rope(q, positions)
            k = apply_rope(k, positions)
        att = multi_head_attention(q, k, v, mask=None)
        xc = xc + cm.dense(bp["attn"]["o"], att.reshape(b, n, h * hd), policy)
        y = cm.rms_norm(bp["ln2"], xc, cfg.norm_eps)
        return xc + cm.gemma_mlp(bp["mlp"], y, policy), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = cm.rms_norm(params["final_norm"], x, cfg.norm_eps)
    return cm.dense(params["out_proj"], x, policy)
