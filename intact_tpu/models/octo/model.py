"""Octo transformer + diffusion action head.

Token layout per batch row (history T frames):

  [ task language (Lt) | obs_1 (P) | readout_1 | ... | obs_T (P) | readout_T ]

Attention rules (octo block structure):
  * task tokens attend task tokens;
  * obs_t tokens attend task + obs_{<=t} (never readouts);
  * readout_t attends task + obs_{<=t} + itself.
Padding: missing history frames (timestep_pad_mask) mask out whole frame
blocks. The mask is built once per config as a static [N, N] template and
combined with per-batch padding at runtime.

Action head: FiLM-MLP epsilon-denoiser over the flattened action chunk,
conditioned on the LAST readout embedding; trained/sampled through
models.diffusion (DDPM schedule, strided DDIM option).

Interface matches pi0/mvla model modules (init / compute_loss /
sample_actions) so the generic trainer and serving wrappers apply.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models import diffusion as diff
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.models.octo.config import OctoConfig
from intact_tpu.ops.attention import multi_head_attention


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _block_init(key, cfg: OctoConfig) -> cm.Params:
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
        "mlp": {"fc1": cm.dense_init(ks[4], d, m), "fc2": cm.dense_init(ks[5], m, d)},
    }


def init(key, cfg: OctoConfig) -> cm.Params:
    ks = jax.random.split(key, 10)
    d = cfg.width
    p_in = cfg.patch_size * cfg.patch_size * 3
    n_patch = (cfg.image_size // cfg.patch_size) ** 2
    params = {
        "patch_embed": cm.dense_init(ks[0], p_in, d),
        "obs_pos_embed": jax.random.normal(ks[1], (1, cfg.history, n_patch, d)) * 0.02,
        "lang_embed": cm.embed_init(ks[2], cfg.vocab_size, d),
        "readout_embed": jax.random.normal(ks[3], (1, cfg.history, d)) * 0.02,
        "blocks": cm.stack_layer_init(ks[4], cfg.depth, lambda k: _block_init(k, cfg)),
        "final_ln": cm.layernorm_init(d),
        "head": _head_init(ks[5], cfg),
    }
    if cfg.use_proprio:
        params["proprio_proj"] = cm.dense_init(ks[6], cfg.proprio_dim, d)
    return params


def _head_init(key, cfg: OctoConfig) -> cm.Params:
    ks = jax.random.split(key, 4)
    d = cfg.width
    adim = cfg.action_dim * cfg.horizon
    return {
        "cond_proj": cm.dense_init(ks[0], d, d),
        "fc1": cm.dense_init(ks[1], adim + d, 2 * d),
        "fc2": cm.dense_init(ks[2], 2 * d, 2 * d),
        "out": cm.dense_init(ks[3], 2 * d, adim),
    }


# ---------------------------------------------------------------------------
# mask template
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _mask_template(lt: int, per_frame: int, history: int) -> np.ndarray:
    """Static [N, N] bool attention template (see module docstring)."""
    n = lt + history * (per_frame + 1)
    m = np.zeros((n, n), bool)
    m[:lt, :lt] = True  # task <-> task

    def obs_slice(t):
        start = lt + t * (per_frame + 1)
        return slice(start, start + per_frame)

    def readout_idx(t):
        return lt + t * (per_frame + 1) + per_frame

    for t in range(history):
        rows = obs_slice(t)
        m[rows, :lt] = True
        for t2 in range(t + 1):
            m[rows, obs_slice(t2)] = True
        r = readout_idx(t)
        m[r, :lt] = True
        for t2 in range(t + 1):
            m[r, obs_slice(t2)] = True
        m[r, r] = True
    return m


# ---------------------------------------------------------------------------
# transformer forward
# ---------------------------------------------------------------------------

def encode(params, images, img_masks, lang_tokens, lang_masks, cfg: OctoConfig,
           policy: DtypePolicy = DEFAULT_POLICY, proprio=None) -> jnp.ndarray:
    """-> readout embeddings [B, history, width] (final-normed).

    images [B, T, H, W, 3] in [-1,1]; img_masks [B, T] marks real frames.
    """
    b, t = images.shape[:2]
    g, p = cfg.image_size // cfg.patch_size, cfg.patch_size
    n_patch = g * g

    x = policy.cast(images)
    x = x.reshape(b, t, g, p, cfg.image_size, 3)
    x = x.reshape(b, t, g, p, g, p, 3)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    x = x.reshape(b, t, n_patch, p, p, 3)
    x = x.reshape(b, t, n_patch, p, p * 3)
    x = x.reshape(b, t, n_patch, p * p * 3)
    obs = cm.dense(params["patch_embed"], x, policy)
    obs = obs + policy.cast(params["obs_pos_embed"])

    lang = cm.embed_lookup(params["lang_embed"], lang_tokens, policy)
    lt = lang.shape[1]

    readout = jnp.broadcast_to(
        policy.cast(params["readout_embed"]), (b, cfg.history, cfg.width)
    )

    # per-frame token group: [obs patches (, proprio), readout]
    per_frame = n_patch
    groups = [obs]
    if cfg.use_proprio:
        if proprio is None:
            raise ValueError("use_proprio=True but encode() got proprio=None")
        pp = policy.cast(jnp.asarray(proprio))
        if pp.ndim == 2:  # current state only -> replicate across history
            pp = jnp.broadcast_to(pp[:, None, :], (b, t, pp.shape[-1]))
        groups.append(cm.dense(params["proprio_proj"], pp, policy)[:, :, None, :])
        per_frame += 1
    groups.append(readout[:, :, None, :])
    frames = jnp.concatenate(groups, axis=2)  # [B, T, per_frame+1, D]
    tokens = jnp.concatenate(
        [lang, frames.reshape(b, t * (per_frame + 1), cfg.width)], axis=1
    )

    template = jnp.asarray(_mask_template(lt, per_frame, cfg.history))
    # padding: lang mask + per-frame obs mask (readout of padded frames
    # still computes but attends only task+itself padding-wise; it is
    # excluded by pad keys below)
    frame_pad = jnp.repeat(img_masks.astype(bool), per_frame + 1, axis=1)
    pad = jnp.concatenate([lang_masks.astype(bool), frame_pad], axis=1)  # [B, N]
    mask = template[None] & pad[:, None, :]

    d, h = cfg.width, cfg.num_heads
    hd = d // h
    n = tokens.shape[1]

    def body(xc, bp):
        y = cm.layer_norm(bp["ln1"], xc, cfg.norm_eps)
        q = cm.dense(bp["attn"]["q"], y, policy).reshape(b, n, h, hd)
        k = cm.dense(bp["attn"]["k"], y, policy).reshape(b, n, h, hd)
        v = cm.dense(bp["attn"]["v"], y, policy).reshape(b, n, h, hd)
        att = multi_head_attention(q, k, v, mask=mask)
        xc = xc + cm.dense(bp["attn"]["o"], att.reshape(b, n, d), policy)
        y = cm.layer_norm(bp["ln2"], xc, cfg.norm_eps)
        return xc + cm.gelu_mlp(bp["mlp"], y, policy), None

    tokens, _ = jax.lax.scan(body, tokens, params["blocks"])
    tokens = cm.layer_norm(params["final_ln"], tokens, cfg.norm_eps)

    readout_idx = lt + jnp.arange(cfg.history) * (per_frame + 1) + per_frame
    return tokens[:, readout_idx]  # [B, history, D]


# ---------------------------------------------------------------------------
# diffusion action head
# ---------------------------------------------------------------------------

def _eps_fn(params, cfg: OctoConfig, policy: DtypePolicy, x_t, t_int, cond):
    """FiLM-MLP denoiser: x_t [B, horizon*action_dim] flattened."""
    fp32 = DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    t_emb = diff.timestep_embedding(t_int, cfg.width)
    c = jax.nn.silu(cm.dense(params["head"]["cond_proj"], cond.astype(jnp.float32), fp32) + t_emb)
    h = jnp.concatenate([x_t.reshape(x_t.shape[0], -1), c], axis=-1)
    h = jax.nn.silu(cm.dense(params["head"]["fc1"], h, fp32))
    h = jax.nn.silu(cm.dense(params["head"]["fc2"], h, fp32))
    out = cm.dense(params["head"]["out"], h, fp32)
    return out.reshape(x_t.shape)


# ---------------------------------------------------------------------------
# trainer/serving interface
# ---------------------------------------------------------------------------

def compute_loss(params, key, batch: dict, cfg: OctoConfig,
                 policy: DtypePolicy = DEFAULT_POLICY, train: bool = True):
    readouts = encode(
        params, batch["images"], batch["img_masks"], batch["lang_tokens"],
        batch["lang_masks"], cfg, policy,
        proprio=batch.get("state") if cfg.use_proprio else None,
    )
    cond = readouts[:, -1]
    schedule = diff.make_schedule(cfg.diffusion_steps)
    actions = batch["actions"].astype(jnp.float32)
    loss, aux = diff.training_loss(
        schedule,
        lambda x, t, c: _eps_fn(params, cfg, policy, x, t, c),
        key, actions, cond,
    )
    return loss, {"l2_loss": loss, "losses": aux["losses"]}


def sample_actions(params, key, images, img_masks, lang_tokens, lang_masks, state,
                   cfg: OctoConfig, policy: DtypePolicy = DEFAULT_POLICY,
                   noise=None):
    readouts = encode(
        params, images, img_masks, lang_tokens, lang_masks, cfg, policy,
        proprio=state if cfg.use_proprio else None,
    )
    cond = readouts[:, -1]
    schedule = diff.make_schedule(cfg.diffusion_steps)
    shape = (images.shape[0], cfg.horizon, cfg.action_dim)
    if cfg.sample_steps >= cfg.diffusion_steps:
        return diff.ddpm_sample(
            schedule, lambda x, t, c: _eps_fn(params, cfg, policy, x, t, c),
            key, shape, cond, init_noise=noise,
        )
    return diff.ddim_sample(
        schedule, lambda x, t, c: _eps_fn(params, cfg, policy, x, t, c),
        key, shape, cond, num_steps=cfg.sample_steps, init_noise=noise,
    )
