"""DreamVLA (experimental): world-model VLA scaffold.

The reference ships this as a NON-functional scaffold (missing `models.*`
imports, never wired into run.py — SURVEY.md §2.4): MAE-ViT encoder +
Perceiver resampler + GPT-2-style causal backbone with dynamic-region /
depth / semantic prediction heads. This is a compact FUNCTIONAL equivalent
built from the framework's own pieces:

  frame -> ViT patch encoder -> Perceiver resampler (learned latents
  cross-attend patches) -> causal transformer over per-timestep
  [obs latents | readout] blocks -> heads: action chunk + next-frame latent
  prediction (the world-model auxiliary loss) + the reference's three
  auxiliary "dream" heads (dynamic region / depth / semantic), each gated
  on its target being present in the batch (the reference precomputes
  optical-flow masks, depth maps, and DINO/SAM features offline —
  dreamvla_model.py heads; here they are per-patch predictions off the
  readout token).

Experimental: registered for research use, not part of the serving matrix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models import siglip
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.models.octo.model import _block_init as _octo_block_init
from intact_tpu.models.siglip import SigLIPConfig
from intact_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class DreamVLAConfig:
    vision: SigLIPConfig = dataclasses.field(
        default_factory=lambda: SigLIPConfig(image_size=224, patch_size=14,
                                             width=384, depth=6, mlp_dim=1536,
                                             num_heads=6)
    )
    num_latents: int = 16      # perceiver resampler output tokens per frame
    width: int = 384
    depth: int = 8
    num_heads: int = 6
    mlp_dim: int = 1536
    history: int = 2
    action_dim: int = 7
    horizon: int = 4
    world_loss_weight: float = 0.5
    norm_eps: float = 1e-6
    # auxiliary "dream" prediction heads (reference dreamvla_model.py):
    # losses fire only when the batch carries the matching target
    dynamic_loss_weight: float = 0.1   # target "dynamic_mask" [B,T,G,G]
    depth_loss_weight: float = 0.1     # target "depth" [B,T,G,G]
    semantic_dim: int = 32             # target "semantic" [B,T,L,semantic_dim]
    semantic_loss_weight: float = 0.1

    @staticmethod
    def tiny() -> "DreamVLAConfig":
        return DreamVLAConfig(
            vision=SigLIPConfig(image_size=28, patch_size=14, width=32,
                                depth=2, mlp_dim=64, num_heads=2),
            num_latents=4, width=32, depth=2, num_heads=2, mlp_dim=64,
        )


def init(key, cfg: DreamVLAConfig) -> cm.Params:
    ks = jax.random.split(key, 10)
    d = cfg.width

    # mirror octo's transformer block layout for the causal backbone
    class _B:  # minimal cfg shim for _octo_block_init
        width = d
        mlp_dim = cfg.mlp_dim

    return {
        "vit": siglip.init(ks[0], cfg.vision),
        "vit_proj": cm.dense_init(ks[1], cfg.vision.width, d),
        "latents": jax.random.normal(ks[2], (1, cfg.num_latents, d)) * 0.02,
        "resampler": {
            "q": cm.dense_init(ks[3], d, d),
            "k": cm.dense_init(ks[4], d, d),
            "v": cm.dense_init(ks[5], d, d),
            "o": cm.dense_init(ks[6], d, d),
        },
        "readout": jax.random.normal(ks[7], (1, 1, d)) * 0.02,
        "blocks": cm.stack_layer_init(ks[8], cfg.depth, lambda k: _octo_block_init(k, _B)),
        "final_ln": cm.layernorm_init(d),
        "heads": {
            "action": cm.dense_init(ks[9], d, cfg.horizon * cfg.action_dim),
            "world": cm.dense_init(jax.random.fold_in(ks[9], 1), d,
                                   cfg.num_latents * d),
            # per-patch auxiliary predictions (G = vision.grid)
            "dynamic": cm.dense_init(jax.random.fold_in(ks[9], 2), d,
                                     cfg.vision.grid ** 2),
            "depth": cm.dense_init(jax.random.fold_in(ks[9], 3), d,
                                   cfg.vision.grid ** 2),
            "semantic": cm.dense_init(jax.random.fold_in(ks[9], 4), d,
                                      cfg.num_latents * cfg.semantic_dim),
        },
    }


def _resample(params, patches, cfg: DreamVLAConfig, policy: DtypePolicy):
    """Perceiver: learned latents cross-attend the patch tokens."""
    b = patches.shape[0]
    d, h = cfg.width, cfg.num_heads
    hd = d // h
    lat = jnp.broadcast_to(policy.cast(params["latents"]), (b, cfg.num_latents, d))
    q = cm.dense(params["resampler"]["q"], lat, policy).reshape(b, cfg.num_latents, h, hd)
    k = cm.dense(params["resampler"]["k"], patches, policy).reshape(b, -1, h, hd)
    v = cm.dense(params["resampler"]["v"], patches, policy).reshape(b, -1, h, hd)
    att = multi_head_attention(q, k, v, mask=None)
    return lat + cm.dense(params["resampler"]["o"], att.reshape(b, cfg.num_latents, d), policy)


def _frame_latents(params, images, cfg: DreamVLAConfig, policy: DtypePolicy):
    """[B, T, H, W, 3] -> [B, T, num_latents, width]."""
    b, t = images.shape[:2]
    flat = images.reshape(b * t, *images.shape[2:])
    patches = siglip.encode(params["vit"], flat, cfg.vision, policy)
    patches = cm.dense(params["vit_proj"], patches, policy)
    lat = _resample(params, patches, cfg, policy)
    return lat.reshape(b, t, cfg.num_latents, cfg.width)


def _block_causal_mask(t: int, per_frame: int) -> np.ndarray:
    """Frame-level causal: tokens of frame i attend frames <= i."""
    n = t * per_frame
    frame_of = np.arange(n) // per_frame
    return frame_of[None, :] <= frame_of[:, None]


def forward(params, images, cfg: DreamVLAConfig,
            policy: DtypePolicy = DEFAULT_POLICY):
    """-> (action chunk [B, horizon, action_dim],
           per-frame latents [B, T, L, D],
           predicted next-frame latents [B, T, L, D])."""
    b, t = images.shape[:2]
    d = cfg.width
    lat = _frame_latents(params, images, cfg, policy)  # [B, T, L, D]

    readout = jnp.broadcast_to(policy.cast(params["readout"]), (b, t, 1, d))
    per_frame = cfg.num_latents + 1
    tokens = jnp.concatenate([lat, readout], axis=2).reshape(b, t * per_frame, d)

    mask = jnp.asarray(_block_causal_mask(t, per_frame))[None]
    h, hd = cfg.num_heads, d // cfg.num_heads
    n = tokens.shape[1]

    def body(x, bp):
        y = cm.layer_norm(bp["ln1"], x, cfg.norm_eps)
        q = cm.dense(bp["attn"]["q"], y, policy).reshape(b, n, h, hd)
        k = cm.dense(bp["attn"]["k"], y, policy).reshape(b, n, h, hd)
        v = cm.dense(bp["attn"]["v"], y, policy).reshape(b, n, h, hd)
        att = multi_head_attention(q, k, v, mask=mask)
        x = x + cm.dense(bp["attn"]["o"], att.reshape(b, n, d), policy)
        y = cm.layer_norm(bp["ln2"], x, cfg.norm_eps)
        return x + cm.gelu_mlp(bp["mlp"], y, policy), None

    tokens, _ = jax.lax.scan(body, tokens, params["blocks"])
    tokens = cm.layer_norm(params["final_ln"], tokens, cfg.norm_eps)
    tokens = tokens.reshape(b, t, per_frame, d)

    readout_out = tokens[:, :, -1]  # [B, T, D]
    fp32 = DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    ro32 = readout_out.astype(jnp.float32)
    actions = cm.dense(params["heads"]["action"], ro32[:, -1], fp32)
    actions = actions.reshape(b, cfg.horizon, cfg.action_dim)
    pred_next = cm.dense(params["heads"]["world"], ro32, fp32)
    pred_next = pred_next.reshape(b, t, cfg.num_latents, d)
    g = cfg.vision.grid
    aux = {
        "dynamic": cm.dense(params["heads"]["dynamic"], ro32, fp32).reshape(b, t, g, g),
        "depth": cm.dense(params["heads"]["depth"], ro32, fp32).reshape(b, t, g, g),
        "semantic": cm.dense(params["heads"]["semantic"], ro32, fp32).reshape(
            b, t, cfg.num_latents, cfg.semantic_dim),
    }
    return actions, lat, pred_next, aux


def compute_loss(params, key, batch: dict, cfg: DreamVLAConfig,
                 policy: DtypePolicy = DEFAULT_POLICY, train: bool = True):
    """Action MSE + world-model loss (predict frame t+1 latents from <=t)
    + the gated auxiliary dream losses (dynamic-region BCE, depth MSE,
    semantic-feature MSE) when their targets ride in the batch."""
    del key
    actions_pred, lat, pred_next, aux_pred = forward(
        params, batch["images"], cfg, policy
    )
    gt = batch["actions"][:, : cfg.horizon, : cfg.action_dim].astype(jnp.float32)
    action_loss = jnp.mean(jnp.square(actions_pred - gt))

    # world loss: prediction at frame t targets the (stop-grad) latents of
    # t+1. T is static, so a single-frame batch (nothing to predict) drops
    # the term in Python — jnp.mean over the empty [B, 0, ...] slice would
    # be NaN and poison every gradient
    if lat.shape[1] > 1:
        target = jax.lax.stop_gradient(lat[:, 1:].astype(jnp.float32))
        world_loss = jnp.mean(
            jnp.square(pred_next[:, :-1].astype(jnp.float32) - target)
        )
    else:
        world_loss = jnp.zeros((), jnp.float32)

    loss = action_loss + cfg.world_loss_weight * world_loss
    metrics = {"action_loss": action_loss, "world_loss": world_loss}

    if "dynamic_mask" in batch:  # [B, T, G, G] in {0, 1} (from optical flow)
        tgt = batch["dynamic_mask"].astype(jnp.float32)
        logits = aux_pred["dynamic"]
        bce = jnp.mean(
            jnp.maximum(logits, 0) - logits * tgt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        loss = loss + cfg.dynamic_loss_weight * bce
        metrics["dynamic_loss"] = bce
    if "depth" in batch:  # [B, T, G, G] metric depth at patch resolution
        dl = jnp.mean(jnp.square(aux_pred["depth"] - batch["depth"].astype(jnp.float32)))
        loss = loss + cfg.depth_loss_weight * dl
        metrics["depth_loss"] = dl
    if "semantic" in batch:  # [B, T, L, semantic_dim] (DINO/SAM features)
        sl = jnp.mean(jnp.square(
            aux_pred["semantic"] - batch["semantic"].astype(jnp.float32)))
        loss = loss + cfg.semantic_loss_weight * sl
        metrics["semantic_loss"] = sl

    return loss, {"l2_loss": loss, **metrics}
