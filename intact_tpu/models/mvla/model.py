"""MVLA flow-matching core.

Pipeline parity with `src/model/mvla/modeling_mvla.py:490-830`:

  SigLIP + language + 108 learned METAQUERY tokens -> PaliGemma prefix
  (metaqueries start a new attention block) -> take the metaquery outputs ->
  bidirectional connector + projection -> PROMPT for the action expert ->
  alternating self/cross expert over [state, action+time] suffix ->
  action_out_proj -> flow-matching velocity.

Flow math (x_t, u_t, Beta time sampling, Euler loop) is identical to Pi0 and
reused from models.pi0.model; sampling computes the prefix + connector +
prompt K/V once and scans the Euler steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intact_tpu.models import common as cm
from intact_tpu.models import connector as connector_lib
from intact_tpu.models import gemma, siglip
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.models.mvla import expert as expert_lib
from intact_tpu.models.mvla.config import MVLAConfig
from intact_tpu.models.pi0 import model as pi0
from intact_tpu.ops.masks import make_att_2d_masks


def _dit_config(cfg: MVLAConfig):
    from intact_tpu.models.dit import DiTConfig

    return DiTConfig(
        width=cfg.dit_width, depth=cfg.dit_depth, num_heads=cfg.dit_heads,
        action_dim=cfg.max_action_dim, horizon=cfg.chunk_size,
        cond_dim=cfg.proj_width,
    )


def init(key, cfg: MVLAConfig) -> cm.Params:
    ks = jax.random.split(key, 12)
    pw = cfg.proj_width
    params = {
        "siglip": siglip.init(ks[0], cfg.vision),
        "img_proj": cm.dense_init(ks[1], cfg.vision.width, cfg.vlm.width),
        "vlm_embed": gemma.init_embed(ks[2], cfg.vlm),
        "vlm": gemma.init_blocks(ks[3], cfg.vlm),
        "metaquery": jax.random.normal(
            ks[4], (1, cfg.num_metaqueries, cfg.vlm.width), jnp.float32
        ) * 0.02,
        "connector": connector_lib.init(ks[5], cfg.connector, cfg.vlm.width, pw),
    }
    if cfg.action_head == "dit":
        # DiT diffusion decoder replaces the Gemma expert + flow head
        from intact_tpu.models import dit as dit_lib

        params["dit"] = dit_lib.init(ks[6], _dit_config(cfg))
        return params
    params.update({
        "expert": (
            expert_lib.init_joint(ks[6], cfg.expert)
            if cfg.alternate_pattern == "joint"
            else expert_lib.init(ks[6], cfg.expert, prompt_dim=pw)
        ),
        "state_proj": cm.dense_init(ks[7], cfg.max_state_dim, pw),
        "action_in_proj": cm.dense_init(ks[8], cfg.max_action_dim, pw),
        "time_mlp_in": cm.dense_init(ks[9], 2 * pw, pw),
        "time_mlp_out": cm.dense_init(ks[10], pw, pw),
        "action_out_proj": cm.dense_init(ks[11], pw, cfg.max_action_dim),
    })
    return params


def embed_prefix(params, images, img_masks, lang_tokens, lang_masks, cfg: MVLAConfig,
                 policy: DtypePolicy = DEFAULT_POLICY):
    """Image+language+metaquery prefix. Metaqueries form their own attention
    block (can see everything; nothing before sees them —
    reference modeling_mvla.py:626-641)."""
    embs, pad, att = pi0.embed_prefix(
        params, images, img_masks, lang_tokens, lang_masks, cfg, policy
    )
    b = embs.shape[0]
    mq = jnp.broadcast_to(
        policy.cast(params["metaquery"]), (b, cfg.num_metaqueries, cfg.vlm.width)
    )
    embs = jnp.concatenate([embs, mq], axis=1)
    pad = jnp.concatenate([pad, jnp.ones((b, cfg.num_metaqueries), bool)], axis=1)
    mq_att = jnp.concatenate(
        [jnp.ones((b, 1), jnp.int32), jnp.zeros((b, cfg.num_metaqueries - 1), jnp.int32)],
        axis=1,
    )
    att = jnp.concatenate([att, mq_att], axis=1)
    return embs, pad, att


def compute_prompt(params, images, img_masks, lang_tokens, lang_masks, cfg: MVLAConfig,
                   policy: DtypePolicy = DEFAULT_POLICY,
                   stop_vlm_gradient: bool = False) -> jnp.ndarray:
    """Full prefix pass -> connector prompt [B, num_metaqueries, proj_width].

    ``stop_vlm_gradient`` cuts backprop at the VLM/connector boundary.
    NOTE: unlike Pi0's train_expert_only (where nothing trainable sits
    upstream of the cut, models/pi0/model.py:predict_velocity_frozen_prefix),
    MVLA's METAQUERIES stay trainable under train_expert_only (reference
    modeling_mvla.py:490 — a separate nn.Parameter outside the frozen
    paligemma) and their gradient flows through the VLM activations, so this
    cut is NOT applied automatically; it is an explicit opt-in for runs that
    also freeze the metaqueries."""
    embs, pad, att = embed_prefix(params, images, img_masks, lang_tokens, lang_masks, cfg, policy)
    mask = make_att_2d_masks(pad, att)
    positions = jnp.cumsum(pad.astype(jnp.int32), axis=1) - 1
    if stop_vlm_gradient:
        embs = jax.lax.stop_gradient(embs)
    prefix_out, _ = gemma.prefill(
        params["vlm"], embs, mask, positions, cfg.vlm, policy, cfg.attention_impl
    )
    mq_out = prefix_out[:, -cfg.num_metaqueries:]
    if stop_vlm_gradient:
        mq_out = jax.lax.stop_gradient(mq_out)
    return connector_lib.apply(params["connector"], mq_out, cfg.connector, policy)


def _suffix_masks(suf_pad, suf_att):
    mask = make_att_2d_masks(suf_pad, suf_att)
    positions = jnp.cumsum(suf_pad.astype(jnp.int32), axis=1) - 1
    return mask, positions


def predict_velocity(params, prompt, state, x_t, time, cfg: MVLAConfig,
                     policy: DtypePolicy = DEFAULT_POLICY,
                     prompt_kv=None) -> jnp.ndarray:
    suf_embs, suf_pad, suf_att = pi0.embed_suffix(params, state, x_t, time, cfg, policy)
    if cfg.alternate_pattern == "joint":
        # MMMVLA variant: one stream over [prompt | suffix]; with prompt_kv
        # (sampling) only the suffix runs through the blocks
        out = expert_lib.forward_joint(
            params["expert"], suf_embs, prompt, suf_att, cfg.expert,
            policy=policy, attention_impl=cfg.attention_impl,
            prompt_kv=prompt_kv,
        )
    else:
        mask, positions = _suffix_masks(suf_pad, suf_att)
        out = expert_lib.forward(
            params["expert"], suf_embs, mask, positions, cfg.expert,
            prompt=prompt, prompt_kv=prompt_kv, policy=policy,
            attention_impl=cfg.attention_impl,
        )
    out = out[:, -cfg.chunk_size:].astype(jnp.float32)
    fp32 = DtypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
    return cm.dense(params["action_out_proj"], out, fp32)


def _dit_eps_fn(params, cfg: MVLAConfig, policy: DtypePolicy):
    from intact_tpu.models import dit as dit_lib

    dcfg = _dit_config(cfg)

    def eps(x_t, t_int, cond):
        return dit_lib.apply(params["dit"], x_t, t_int, cond, dcfg, policy)

    return eps


def compute_loss(params, key, batch: dict, cfg: MVLAConfig,
                 policy: DtypePolicy = DEFAULT_POLICY, train: bool = True):
    # metaqueries train THROUGH the frozen VLM (see compute_prompt note), so
    # train_expert_only must keep the VLM backward; only an explicit
    # freeze_metaqueries config cuts it
    stop_vlm = train and cfg.train_expert_only and cfg.freeze_metaqueries
    if cfg.action_head == "dit":
        from intact_tpu.models import diffusion as diff

        prompt = compute_prompt(
            params, batch["images"], batch["img_masks"], batch["lang_tokens"],
            batch["lang_masks"], cfg, policy, stop_vlm_gradient=stop_vlm,
        )
        cond = prompt.mean(axis=1).astype(jnp.float32)  # pooled metaqueries
        schedule = diff.make_schedule(cfg.diffusion_steps)
        loss, aux = diff.training_loss(
            schedule, _dit_eps_fn(params, cfg, policy), key,
            batch["actions"].astype(jnp.float32), cond,
        )
        return loss, {"l2_loss": loss, "losses": aux["losses"]}

    actions = batch["actions"].astype(jnp.float32)
    k_noise, k_time = jax.random.split(key)
    noise = pi0.sample_noise(k_noise, actions.shape)
    time = pi0.sample_time(k_time, actions.shape[0], cfg)

    t = time[:, None, None]
    x_t = t * noise + (1 - t) * actions
    u_t = noise - actions

    prompt = compute_prompt(
        params, batch["images"], batch["img_masks"], batch["lang_tokens"],
        batch["lang_masks"], cfg, policy, stop_vlm_gradient=stop_vlm,
    )
    v_t = predict_velocity(params, prompt, batch["state"], x_t, time, cfg, policy)

    losses = jnp.square(u_t - v_t)
    if "action_is_pad" in batch:
        keep = ~batch["action_is_pad"]
        losses = losses * keep[:, :, None].astype(losses.dtype)
        denom = jnp.maximum(keep.sum() * cfg.max_action_dim, 1)
        mean_loss = losses.sum() / denom
    else:
        mean_loss = losses.mean()
    return mean_loss, {"l2_loss": mean_loss, "losses": losses}


def sample_actions(params, key, images, img_masks, lang_tokens, lang_masks, state,
                   cfg: MVLAConfig, policy: DtypePolicy = DEFAULT_POLICY,
                   noise: jnp.ndarray | None = None):
    b = state.shape[0]
    if noise is None:
        noise = pi0.sample_noise(key, (b, cfg.chunk_size, cfg.max_action_dim))

    prompt = compute_prompt(params, images, img_masks, lang_tokens, lang_masks, cfg, policy)

    if cfg.action_head == "dit":
        from intact_tpu.models import diffusion as diff

        cond = prompt.mean(axis=1).astype(jnp.float32)
        schedule = diff.make_schedule(cfg.diffusion_steps)
        return diff.ddim_sample(
            schedule, _dit_eps_fn(params, cfg, policy), key,
            (b, cfg.chunk_size, cfg.max_action_dim), cond,
            num_steps=cfg.num_steps,
        )
    # both patterns cache the prompt's K/V once: the prompt block never
    # attends the suffix, so its K/V are identical across all Euler steps
    if cfg.alternate_pattern == "joint":
        prompt_kv = expert_lib.prefill_joint_prompt_kv(
            params["expert"], prompt, cfg.expert, policy, cfg.attention_impl
        )
    else:
        prompt_kv = expert_lib.prefill_prompt_kv(
            params["expert"], prompt, cfg.expert, policy
        )

    dt = -1.0 / cfg.num_steps

    def euler_step(x_t, t_scalar):
        time = jnp.full((b,), t_scalar, jnp.float32)
        v_t = predict_velocity(
            params, prompt, state, x_t, time, cfg, policy, prompt_kv=prompt_kv
        )
        return x_t + dt * v_t, None

    ts = 1.0 + dt * jnp.arange(cfg.num_steps, dtype=jnp.float32)
    x_0, _ = jax.lax.scan(euler_step, noise, ts)
    return x_0
