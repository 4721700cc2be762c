"""SigLIP vision tower (So400m/14-224 by default) — PaliGemma's image encoder.

Functional JAX: `init(key, cfg)` builds a stacked-block param pytree,
`encode(params, images, cfg)` maps [-1,1] images [B, H, W, 3] -> patch tokens
[B, N, width]. Blocks run under lax.scan (stacked leading layer axis).

Role parity: the reference consumes SigLIP via HF PaliGemma
(`src/model/mvla/mllm.py:170-247`, `embed_image`); here it is a first-class
TPU module. The classification/MAP head is omitted — PaliGemma consumes the
post-norm patch embeddings directly.

Layout notes: channels-last images feed a lax.conv patch embed (maps to MXU
as a [P*P*3, width] matmul); head_dim 72 stays on the XLA attention path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from intact_tpu.models import common as cm
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1152
    depth: int = 27
    mlp_dim: int = 4304
    num_heads: int = 16
    layernorm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads


def so400m_14_224() -> SigLIPConfig:
    return SigLIPConfig()


def tiny_test_config() -> SigLIPConfig:
    """Small config for CPU unit tests."""
    return SigLIPConfig(image_size=28, patch_size=14, width=32, depth=2, mlp_dim=64, num_heads=4)


def _block_init(key, cfg: SigLIPConfig) -> cm.Params:
    ks = jax.random.split(key, 6)
    d, m = cfg.width, cfg.mlp_dim
    return {
        "ln1": cm.layernorm_init(d),
        "attn": {
            "q": cm.dense_init(ks[0], d, d),
            "k": cm.dense_init(ks[1], d, d),
            "v": cm.dense_init(ks[2], d, d),
            "o": cm.dense_init(ks[3], d, d),
        },
        "ln2": cm.layernorm_init(d),
        "mlp": {
            "fc1": cm.dense_init(ks[4], d, m),
            "fc2": cm.dense_init(ks[5], m, d),
        },
    }


def init(key, cfg: SigLIPConfig) -> cm.Params:
    k_patch, k_pos, k_blocks = jax.random.split(key, 3)
    p, d = cfg.patch_size, cfg.width
    return {
        "patch_embed": {
            "kernel": cm.lecun_normal(k_patch, (p, p, 3, d), in_axis_size=p * p * 3),
            "bias": jnp.zeros((d,), jnp.float32),
        },
        "pos_embed": jax.random.normal(k_pos, (1, cfg.num_patches, d), jnp.float32) * 0.02,
        "blocks": cm.stack_layer_init(k_blocks, cfg.depth, lambda k: _block_init(k, cfg)),
        "ln_post": cm.layernorm_init(d),
    }


def _block_apply(cfg: SigLIPConfig, policy: DtypePolicy, x: jnp.ndarray, bp: cm.Params) -> jnp.ndarray:
    b, n, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim

    y = cm.layer_norm(bp["ln1"], x, cfg.layernorm_eps)
    q = cm.dense(bp["attn"]["q"], y, policy).reshape(b, n, h, hd)
    k = cm.dense(bp["attn"]["k"], y, policy).reshape(b, n, h, hd)
    v = cm.dense(bp["attn"]["v"], y, policy).reshape(b, n, h, hd)
    att = multi_head_attention(q, k, v, mask=None)  # full bidirectional
    x = x + cm.dense(bp["attn"]["o"], att.reshape(b, n, d), policy)

    y = cm.layer_norm(bp["ln2"], x, cfg.layernorm_eps)
    x = x + cm.gelu_mlp(bp["mlp"], y, policy)
    return x


def encode(
    params: cm.Params,
    images: jnp.ndarray,  # [B, H, W, 3] in [-1, 1]
    cfg: SigLIPConfig,
    policy: DtypePolicy = DEFAULT_POLICY,
) -> jnp.ndarray:
    """-> [B, num_patches, width] patch embeddings (compute dtype)."""
    # Patchify as reshape + one big matmul (equivalent to a stride-P VALID
    # conv, but it is a single [B*N, P*P*3] x [P*P*3, D] MXU contraction and
    # stays transparent to sharded kernels).
    b, g, p = images.shape[0], cfg.grid, cfg.patch_size
    w = images.shape[2]
    # split one axis per reshape: sharded-batch arrays only support
    # single-axis splits under jax's sharding-in-types rules
    x = policy.cast(images)
    x = x.reshape(b, g, p, w, 3)
    x = x.reshape(b, g, p, g, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    # ... and one axis-pair merge per reshape on the way back down
    x = x.reshape(b, cfg.num_patches, p, p, 3)
    x = x.reshape(b, cfg.num_patches, p, p * 3)
    x = x.reshape(b, cfg.num_patches, p * p * 3)
    kernel = policy.cast(params["patch_embed"]["kernel"]).reshape(p * p * 3, cfg.width)
    x = jnp.dot(x, kernel) + policy.cast(params["patch_embed"]["bias"])
    x = x + policy.cast(params["pos_embed"])

    @jax.checkpoint  # per-layer remat
    def body(carry, bp):
        return _block_apply(cfg, policy, carry, bp), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return cm.layer_norm(params["ln_post"], x, cfg.layernorm_eps)
