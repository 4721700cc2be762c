"""Native SpatialVLA: SigLIP + Ego3D position encoding + Gemma2 decode.

Reference behavior (``src/experiments/policies/policy_wrapper.py:194-223``):
HF processor -> ``model.predict_action`` -> ``processor.decode_actions``.
Here the whole inference is ONE XLA program: SigLIP encode, Ego3D position
encoding of back-projected patch centers, projector, Gemma2 prefill with the
PaliGemma2 full-attention prefix, and KV-cached greedy decode of
``3 * n_action_steps`` spatial-grid tokens (models/gemma2.greedy_decode).
Token -> continuous decoding lives in serve/decoding.SpatialActionTokenizer.

Depth input: the upstream model estimates depth with ZoeDepth before the
Ego3D encoding. That estimator is an external asset, not reimplemented here
— ``depth`` is an explicit input (client-provided or a flat-plane prior via
``flat_depth``); with zero depth the Ego3D features reduce to the ray
directions, which still encode the 2D layout.

Weight import consumes the HF SpatialVLA/PaliGemma2 layout (``vision_tower``
SiglipVisionModel naming, ``multi_modal_projector``, ``language_model``
Gemma2 naming, ``position_embedding_3d`` MLP), shape-checked against
``jax.eval_shape`` of our init.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models import gemma2, siglip
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.models.spatialvla.config import SpatialVLAConfig


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(key, cfg: SpatialVLAConfig) -> cm.Params:
    ks = jax.random.split(key, 5)
    feat_dim = 6 * cfg.ego3d_n_freqs  # sin+cos per (x, y, z) frequency
    return {
        "siglip": siglip.init(ks[0], cfg.vision),
        "ego3d": {
            "linear_1": cm.dense_init(ks[1], feat_dim, cfg.ego3d_hidden),
            "linear_2": cm.dense_init(ks[2], cfg.ego3d_hidden, cfg.vision.width),
        },
        "img_proj": cm.dense_init(ks[3], cfg.vision.width, cfg.lm.width),
        "lm": gemma2.init(ks[4], cfg.lm),
    }


# ---------------------------------------------------------------------------
# Ego3D position encoding
# ---------------------------------------------------------------------------

def flat_depth(batch: int, cfg: SpatialVLAConfig, z: float = 1.0) -> np.ndarray:
    """Flat-plane depth prior at the patch resolution [B, g, g]."""
    g = cfg.vision.grid
    return np.full((batch, g, g), z, np.float32)


def ego3d_position_encoding(params, depth, cfg: SpatialVLAConfig,
                            policy: DtypePolicy = DEFAULT_POLICY):
    """depth [B, g, g] (meters at patch resolution) -> [B, n_patch, width].

    Back-projects patch centers through normalized pinhole intrinsics to
    egocentric 3D points, encodes each coordinate with ``ego3d_n_freqs``
    sinusoidal frequencies, and maps through a 2-layer MLP."""
    b = depth.shape[0]
    g = cfg.vision.grid
    u = (jnp.arange(g) + 0.5) / g  # normalized pixel coords of patch centers
    v = (jnp.arange(g) + 0.5) / g
    uu, vv = jnp.meshgrid(u, v, indexing="xy")  # [g, g] (row = v, col = u)
    z = depth.reshape(b, g, g)
    x = (uu[None] - cfg.cx) / cfg.fx * z
    y = (vv[None] - cfg.cy) / cfg.fy * z
    pts = jnp.stack([x, y, z], axis=-1).reshape(b, g * g, 3)

    freqs = 2.0 ** jnp.arange(cfg.ego3d_n_freqs)  # [F]
    ang = pts[..., None] * freqs  # [B, N, 3, F]
    feat = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    feat = feat.reshape(b, g * g, 6 * cfg.ego3d_n_freqs)
    h = cm.dense(params["ego3d"]["linear_1"], policy.cast(feat), policy)
    return cm.dense(params["ego3d"]["linear_2"], jax.nn.gelu(h, approximate=False), policy)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def normalize_images(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [B, H, W, 3] -> [-1, 1] float32, ON DEVICE (serving ships
    uint8 over the host->device transfer — 4x fewer bytes; same convention
    as the SigLIP [-1, 1] input the adapter otherwise produces)."""
    return images_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0


def embed_prefix(params, images, depth, lang_tokens, lang_masks,
                 cfg: SpatialVLAConfig, policy: DtypePolicy = DEFAULT_POLICY):
    """-> (embeds [B, N+L, D], mask [B, N+L]).

    Image embeddings are the raw projector output (the PaliGemma projector
    1/sqrt(h) and the model's sqrt(d) cancel — same convention as
    models/pi0/model.py:embed_prefix); language embeds carry the Gemma
    sqrt(width) scale."""
    patches = siglip.encode(params["siglip"], images, cfg.vision, policy)
    patches = patches + ego3d_position_encoding(params, depth, cfg, policy)
    img_emb = cm.dense(params["img_proj"], patches, policy)

    lang_emb = cm.embed_lookup(params["lm"]["embed"], lang_tokens, policy)
    lang_emb = lang_emb * jnp.asarray(cfg.lm.width**0.5, lang_emb.dtype)

    embeds = jnp.concatenate([img_emb, lang_emb], axis=1)
    b, n = img_emb.shape[:2]
    mask = jnp.concatenate(
        [jnp.ones((b, n), bool), lang_masks.astype(bool)], axis=1
    )
    return embeds, mask


def predict_action_tokens(params, images, depth, lang_tokens, lang_masks,
                          cfg: SpatialVLAConfig,
                          policy: DtypePolicy = DEFAULT_POLICY) -> jnp.ndarray:
    """-> [B, 3 * n_action_steps] spatial token ids (greedy, in-graph)."""
    embeds, mask = embed_prefix(params, images, depth, lang_tokens, lang_masks,
                                cfg, policy)
    return gemma2.greedy_decode(
        params["lm"], embeds, mask, cfg.tokens_per_action * cfg.n_action_steps,
        cfg.lm, policy, prefix_full_attention=True,
    )


def make_action_tokenizer(cfg: SpatialVLAConfig):
    from intact_tpu.serve.decoding import SpatialActionTokenizer

    return SpatialActionTokenizer(
        spatial_offset=cfg.spatial_offset,
        n_theta=cfg.n_theta, n_phi=cfg.n_phi, n_r=cfg.n_r,
        n_roll=cfg.n_roll, n_pitch=cfg.n_pitch, n_yaw=cfg.n_yaw,
        r_sigma=cfg.r_sigma, rot_sigma=cfg.rot_sigma,
    )


# ---------------------------------------------------------------------------
# HF checkpoint -> params
# ---------------------------------------------------------------------------

def from_hf_state_dict(
    sd: dict,
    cfg: SpatialVLAConfig,
    vision_prefix: str = "vision_tower.vision_model",
    projector_prefix: str = "multi_modal_projector.linear",
    lm_prefix: str = "language_model.model",
    ego3d_prefix: str = "position_embedding_3d",
) -> cm.Params:
    """HF SpatialVLA/PaliGemma2 layout -> param tree, leaf shapes checked
    via jax.eval_shape. A ``model.``-nested checkpoint layout (detected off
    the vision tower) nests ALL component prefixes consistently."""
    from intact_tpu.models.hf_import import check_shapes, mlp2_from_sd
    from intact_tpu.models.pi0.convert import _siglip_from_sd

    for nest in ("", "model."):
        cand = nest + vision_prefix
        if any(k.startswith(cand + ".embeddings") for k in sd):
            vision_prefix = cand
            projector_prefix = nest + projector_prefix
            lm_prefix = nest + lm_prefix
            ego3d_prefix = nest + ego3d_prefix
            break
    # transformers >= 4.49 dropped the LM's inner ".model" nesting
    # (language_model.model.layers -> language_model.layers); probe both
    if lm_prefix + ".embed_tokens.weight" not in sd:
        alt = lm_prefix.removesuffix(".model")
        if alt + ".embed_tokens.weight" in sd:
            lm_prefix = alt
    # ego3d may live beside the backbone rather than under model.
    if not any(k.startswith(ego3d_prefix + ".") for k in sd):
        alt = ego3d_prefix.removeprefix("model.")
        if any(k.startswith(alt + ".") for k in sd):
            ego3d_prefix = alt
    params: cm.Params = {
        "siglip": _siglip_from_sd(sd, cfg.vision, prefix=vision_prefix),
        "img_proj": {
            "kernel": np.asarray(sd[projector_prefix + ".weight"]).T.copy(),
            "bias": np.asarray(sd[projector_prefix + ".bias"]),
        },
        "ego3d": mlp2_from_sd(sd, ego3d_prefix, "Ego3D MLP"),
        "lm": gemma2.from_hf_state_dict(sd, cfg.lm, prefix=lm_prefix),
    }
    return check_shapes(params, lambda: init(jax.random.key(0), cfg))


def load_spatialvla_checkpoint(path: str, cfg: SpatialVLAConfig) -> cm.Params:
    """Load an HF snapshot directory (sharded ``*.safetensors``), torch-free."""
    from intact_tpu.models.hf_import import load_safetensors_dir

    return from_hf_state_dict(load_safetensors_dir(path), cfg)
