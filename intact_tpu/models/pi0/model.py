"""Pi0 flow-matching core: embed, training loss, jitted Euler sampler.

Math parity with the reference implementation family (openpi / LeRobot PI0,
in-repo research copy `src/model/mvla/modeling_mvla.py:567-830`):

  t ~ Beta(1.5, 1) * 0.999 + 0.001           (sample_time)
  x_t = t * noise + (1 - t) * actions        (noisy action interpolation)
  u_t = noise - actions                      (flow target)
  loss = mse(u_t, v_t)                       (masked by action padding)
  inference: x' = x + dt * v_t, dt = -1/num_steps, t: 1 -> 0  (Euler)

TPU-first structure: the denoise loop is a `lax.scan` over Euler steps with
the prefix K/V cache computed once by `gemma.prefill` and donated across
steps; the whole `sample_actions` is one XLA program (no host round trips
between steps, unlike the reference's Python while loop).

Input convention (all jnp, batch-leading):
  images      [B, K, H, W, 3] float in [-1, 1]  (K = num_cameras)
  img_masks   [B, K] bool
  lang_tokens [B, L] int32, lang_masks [B, L] bool
  state       [B, max_state_dim] float
  actions     [B, chunk_size, max_action_dim] float (training only)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intact_tpu.models import common as cm
from intact_tpu.models import gemma, siglip
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.models.pi0.config import Pi0Config
from intact_tpu.ops.masks import make_att_2d_masks


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init(key, cfg: Pi0Config) -> cm.Params:
    ks = jax.random.split(key, 10)
    pw = cfg.proj_width
    return {
        "siglip": siglip.init(ks[0], cfg.vision),
        "img_proj": cm.dense_init(ks[1], cfg.vision.width, cfg.vlm.width),
        "vlm_embed": gemma.init_embed(ks[2], cfg.vlm),
        "vlm": gemma.init_blocks(ks[3], cfg.vlm),
        "expert": gemma.init_blocks(ks[4], cfg.expert),
        "state_proj": cm.dense_init(ks[5], cfg.max_state_dim, pw),
        "action_in_proj": cm.dense_init(ks[6], cfg.max_action_dim, pw),
        "time_mlp_in": cm.dense_init(ks[7], 2 * pw, pw),
        "time_mlp_out": cm.dense_init(ks[8], pw, pw),
        "action_out_proj": cm.dense_init(ks[9], pw, cfg.max_action_dim),
    }


# ---------------------------------------------------------------------------
# embedding
# ---------------------------------------------------------------------------

def embed_prefix(params, images, img_masks, lang_tokens, lang_masks, cfg: Pi0Config,
                 policy: DtypePolicy = DEFAULT_POLICY):
    """-> (embs [B, P, D_vlm], pad [B, P] bool, att [B, P] int).

    Language embeddings are scaled by sqrt(width) (Gemma embedding
    convention). Image embeddings are NOT scaled: the reference multiplies
    by sqrt(d) (modeling_mvla.py:598-602) but its embed_image is HF
    PaliGemma's get_image_features, which divides the projector output by
    sqrt(hidden_size) — the two cancel, so the net prefix image embedding
    is the raw projector output. Scaling here would break converted-weight
    parity by a factor of sqrt(width) (~45x for 2048).
    The whole prefix is one full-attention block (att = 0 everywhere).
    """
    b, k = images.shape[:2]
    n_patch = cfg.vision.num_patches

    patches = siglip.encode(
        params["siglip"], images.reshape(b * k, *images.shape[2:]), cfg.vision, policy
    )
    img_emb = cm.dense(params["img_proj"], patches, policy)
    img_emb = img_emb.reshape(b, k * n_patch, cfg.vlm.width)
    img_pad = jnp.repeat(img_masks.astype(bool), n_patch, axis=1)

    lang_emb = cm.embed_lookup(params["vlm_embed"], lang_tokens, policy)
    lang_emb = lang_emb * jnp.asarray(cfg.vlm.width**0.5, lang_emb.dtype)

    embs = jnp.concatenate([img_emb, lang_emb], axis=1)
    pad = jnp.concatenate([img_pad, lang_masks.astype(bool)], axis=1)
    att = jnp.zeros(embs.shape[:2], jnp.int32)
    return embs, pad, att


def embed_suffix(params, state, noisy_actions, timestep, cfg: Pi0Config,
                 policy: DtypePolicy = DEFAULT_POLICY):
    """-> (embs [B, 1+chunk, D_exp], pad, att).

    Token 0 is the projected state (starts a new attention block: the prefix
    must not attend to it); tokens 1..chunk are action+time fusion via the
    swish MLP; the action chunk is a single attention block.
    """
    b = state.shape[0]
    state_emb = cm.dense(params["state_proj"], policy.cast(state), policy)[:, None, :]

    time_emb = cm.sinusoidal_embedding(
        timestep, cfg.proj_width, cfg.time_min_period, cfg.time_max_period
    ).astype(state_emb.dtype)

    action_emb = cm.dense(params["action_in_proj"], policy.cast(noisy_actions), policy)
    time_tiled = jnp.broadcast_to(time_emb[:, None, :], action_emb.shape)
    fused = jnp.concatenate([action_emb, time_tiled], axis=-1)
    fused = cm.dense(params["time_mlp_in"], fused, policy)
    fused = jax.nn.silu(fused)
    fused = cm.dense(params["time_mlp_out"], fused, policy)

    embs = jnp.concatenate([state_emb, fused], axis=1)
    pad = jnp.ones((b, 1 + cfg.chunk_size), bool)
    att = jnp.concatenate(
        [
            jnp.ones((b, 1), jnp.int32),  # state starts a new block
            jnp.ones((b, 1), jnp.int32),  # actions start a new block
            jnp.zeros((b, cfg.chunk_size - 1), jnp.int32),
        ],
        axis=1,
    )
    return embs, pad, att


# ---------------------------------------------------------------------------
# flow-matching noise / time sampling
# ---------------------------------------------------------------------------

def sample_noise(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


def sample_time(key, bsize, cfg: Pi0Config):
    t = jax.random.beta(key, cfg.time_beta_alpha, cfg.time_beta_beta, (bsize,))
    return (t * cfg.time_scale + cfg.time_offset).astype(jnp.float32)


# ---------------------------------------------------------------------------
# training forward
# ---------------------------------------------------------------------------

def compute_loss(params, key, batch: dict, cfg: Pi0Config,
                 policy: DtypePolicy = DEFAULT_POLICY, train: bool = True):
    """-> (per-element losses [B, chunk, action_dim], aux dict).

    batch keys: images, img_masks, lang_tokens, lang_masks, state, actions,
    and optionally action_is_pad [B, chunk] bool.
    """
    actions = batch["actions"].astype(jnp.float32)
    k_noise, k_time = jax.random.split(key)
    noise = sample_noise(k_noise, actions.shape)
    time = sample_time(k_time, actions.shape[0], cfg)

    t = time[:, None, None]
    x_t = t * noise + (1 - t) * actions
    u_t = noise - actions

    predict = (
        predict_velocity_frozen_prefix
        if (train and cfg.train_expert_only)
        else predict_velocity
    )
    v_t = predict(
        params, batch["images"], batch["img_masks"], batch["lang_tokens"],
        batch["lang_masks"], batch["state"], x_t, time, cfg, policy,
    )

    losses = jnp.square(u_t - v_t)
    if "action_is_pad" in batch:
        keep = ~batch["action_is_pad"]  # [B, chunk]
        losses = losses * keep[:, :, None].astype(losses.dtype)
        denom = jnp.maximum(keep.sum() * cfg.max_action_dim, 1)
        mean_loss = losses.sum() / denom
    else:
        mean_loss = losses.mean()
    return mean_loss, {"l2_loss": mean_loss, "losses": losses}


def predict_velocity(params, images, img_masks, lang_tokens, lang_masks, state,
                     x_t, time, cfg: Pi0Config, policy: DtypePolicy = DEFAULT_POLICY):
    """Single joint prefix+suffix pass -> v_t [B, chunk, action_dim] (fp32)."""
    pre_embs, pre_pad, pre_att = embed_prefix(
        params, images, img_masks, lang_tokens, lang_masks, cfg, policy
    )
    suf_embs, suf_pad, suf_att = embed_suffix(params, state, x_t, time, cfg, policy)

    pad = jnp.concatenate([pre_pad, suf_pad], axis=1)
    att = jnp.concatenate([pre_att, suf_att], axis=1)
    mask_2d = make_att_2d_masks(pad, att)
    positions = jnp.cumsum(pad.astype(jnp.int32), axis=1) - 1

    _, suffix_out = gemma.forward_joint(
        params["vlm"], params["expert"], pre_embs, suf_embs, mask_2d, positions,
        cfg.vlm, cfg.expert, policy, cfg.attention_impl,
        suffix_only=True,  # skip the last layer's dead prefix tail (~5% FLOPs)
    )
    suffix_out = suffix_out[:, -cfg.chunk_size:].astype(jnp.float32)
    return cm.dense(params["action_out_proj"], suffix_out, DtypePolicy(
        param_dtype=jnp.float32, compute_dtype=jnp.float32))


def predict_velocity_frozen_prefix(params, images, img_masks, lang_tokens,
                                   lang_masks, state, x_t, time, cfg: Pi0Config,
                                   policy: DtypePolicy = DEFAULT_POLICY):
    """Expert-only fine-tune fast path: the prefix tower (SigLIP + 3B VLM)
    is frozen, so run it forward-only (gemma.prefill) and stop_gradient the
    K/V cache — XLA then compiles NO backward through the VLM at all
    (the joint path spends ~3/4 of its backward FLOPs recomputing+
    backpropping the frozen tower only for the optimizer to mask the grads
    to zero). Expert/head gradients are mathematically identical: the only
    gradient paths through prefix K/V lead to frozen parameters
    (tests/test_model_pi0.py pins grad equality vs the joint path)."""
    stop = jax.lax.stop_gradient
    b = state.shape[0]

    pre_embs, pre_pad, pre_att = embed_prefix(
        params, images, img_masks, lang_tokens, lang_masks, cfg, policy
    )
    pre_mask = make_att_2d_masks(pre_pad, pre_att)
    pre_pos = jnp.cumsum(pre_pad.astype(jnp.int32), axis=1) - 1
    _, kv_cache = gemma.prefill(
        params["vlm"], stop(pre_embs), pre_mask, pre_pos, cfg.vlm, policy,
        cfg.attention_impl, kv_only=True,
    )
    kv_cache = stop(kv_cache)

    suf_embs, suf_pad, suf_att = embed_suffix(params, state, x_t, time, cfg, policy)
    suf_self = make_att_2d_masks(suf_pad, suf_att)
    suf_to_pre = jnp.broadcast_to(
        pre_pad[:, None, :], (b, suf_pad.shape[1], pre_pad.shape[1])
    )
    dec_mask = jnp.concatenate([suf_to_pre, suf_self], axis=2)  # [B, S, P+S]
    prefix_count = pre_pad.sum(axis=1, keepdims=True).astype(jnp.int32)
    suf_pos = prefix_count + jnp.cumsum(suf_pad.astype(jnp.int32), axis=1) - 1

    suffix_out = gemma.decode(
        params["expert"], kv_cache, suf_embs, dec_mask, suf_pos,
        cfg.expert, policy, cfg.attention_impl,
    )
    suffix_out = suffix_out[:, -cfg.chunk_size:].astype(jnp.float32)
    return cm.dense(params["action_out_proj"], suffix_out, DtypePolicy(
        param_dtype=jnp.float32, compute_dtype=jnp.float32))


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------

def sample_actions(params, key, images, img_masks, lang_tokens, lang_masks, state,
                   cfg: Pi0Config, policy: DtypePolicy = DEFAULT_POLICY,
                   noise: jnp.ndarray | None = None):
    """Jitted action sampling: one prefill + num_steps Euler scan.

    Returns [B, chunk_size, max_action_dim] float32.
    """
    b = state.shape[0]
    if noise is None:
        noise = sample_noise(key, (b, cfg.chunk_size, cfg.max_action_dim))

    pre_embs, pre_pad, pre_att = embed_prefix(
        params, images, img_masks, lang_tokens, lang_masks, cfg, policy
    )
    pre_mask = make_att_2d_masks(pre_pad, pre_att)
    pre_pos = jnp.cumsum(pre_pad.astype(jnp.int32), axis=1) - 1

    _, kv_cache = gemma.prefill(
        params["vlm"], pre_embs, pre_mask, pre_pos, cfg.vlm, policy,
        cfg.attention_impl, kv_only=True,
    )

    prefix_count = pre_pad.sum(axis=1, keepdims=True).astype(jnp.int32)  # [B, 1]

    # suffix attention layout is timestep-independent: build it once
    _, suf_pad, suf_att = embed_suffix(
        params, state, noise, jnp.ones((b,), jnp.float32), cfg, policy
    )
    suf_self = make_att_2d_masks(suf_pad, suf_att)  # [B, S, S]
    suf_to_pre = jnp.broadcast_to(
        pre_pad[:, None, :], (b, suf_pad.shape[1], pre_pad.shape[1])
    )
    dec_mask = jnp.concatenate([suf_to_pre, suf_self], axis=2)  # [B, S, P+S]
    suf_pos = prefix_count + jnp.cumsum(suf_pad.astype(jnp.int32), axis=1) - 1

    dt = -1.0 / cfg.num_steps

    def euler_step(x_t, t_scalar):
        time = jnp.full((b,), t_scalar, jnp.float32)
        suf_embs, _, _ = embed_suffix(params, state, x_t, time, cfg, policy)
        suffix_out = gemma.decode(
            params["expert"], kv_cache, suf_embs, dec_mask, suf_pos,
            cfg.expert, policy, cfg.attention_impl,
        )
        suffix_out = suffix_out[:, -cfg.chunk_size:].astype(jnp.float32)
        v_t = cm.dense(params["action_out_proj"], suffix_out, DtypePolicy(
            param_dtype=jnp.float32, compute_dtype=jnp.float32))
        return x_t + dt * v_t, None

    # t goes 1.0, 1-1/N, ..., 1/N  (num_steps steps down to 0)
    ts = 1.0 + dt * jnp.arange(cfg.num_steps, dtype=jnp.float32)
    x_0, _ = jax.lax.scan(euler_step, noise, ts)
    return x_0
