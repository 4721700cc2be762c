"""Pi0FAST: teacher-forced AR training + KV-cached greedy decode.

Layout: [image patches | language | state token] form a full-attention
prefix block; the action-token suffix is causal (each token starts a new
big_vision block). The output head is tied to the input embedding
(logits = h @ E^T, Gemma convention). Decoding is constrained to the
action-bin tail of the vocabulary and runs as a lax.scan over
`n_action_tokens` single-token steps against a preallocated K/V cache —
the whole generate is one XLA program (vs the reference's HF `generate`
loop, policy_wrapper.py:253).

Interface matches the other model modules (init / compute_loss /
sample_actions) so the trainer, Pi0Policy, and serving stack apply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models import gemma, siglip
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.models.pi0 import model as pi0
from intact_tpu.models.pi0fast.config import Pi0FASTConfig
from intact_tpu.ops.attention import multi_head_attention
from intact_tpu.ops.masks import make_att_2d_masks


def init(key, cfg: Pi0FASTConfig) -> cm.Params:
    ks = jax.random.split(key, 7)
    return {
        "siglip": siglip.init(ks[0], cfg.vision),
        "img_proj": cm.dense_init(ks[1], cfg.vision.width, cfg.vlm.width),
        "vlm_embed": gemma.init_embed(ks[2], cfg.vlm),
        "vlm": gemma.init_blocks(ks[3], cfg.vlm),
        "state_proj": cm.dense_init(ks[4], cfg.max_state_dim, cfg.vlm.width),
        "action_start": jax.random.normal(ks[5], (1, 1, cfg.vlm.width), jnp.float32) * 0.02,
    }


# ---------------------------------------------------------------------------
# action <-> token
# ---------------------------------------------------------------------------

def tokenize_actions(actions: jnp.ndarray, cfg: Pi0FASTConfig) -> jnp.ndarray:
    """[B, chunk, dim] normalized actions -> [B, chunk*dim] vocab ids
    (tail-of-vocab binning, matching serve.decoding's numpy scheme)."""
    a = jnp.clip(actions[..., : cfg.max_action_dim], cfg.action_low, cfg.action_high)
    idx = jnp.floor(
        (a - cfg.action_low) / (cfg.action_high - cfg.action_low) * cfg.n_action_bins
    ).astype(jnp.int32)
    idx = jnp.clip(idx, 0, cfg.n_action_bins - 1)
    ids = cfg.vlm.vocab_size - idx - 1
    return ids.reshape(ids.shape[0], -1)


def detokenize_actions(ids: jnp.ndarray, cfg: Pi0FASTConfig) -> jnp.ndarray:
    """[B, chunk*dim] vocab ids -> [B, chunk, dim] bin-center actions."""
    idx = jnp.clip(cfg.vlm.vocab_size - ids - 1, 0, cfg.n_action_bins - 1)
    step = (cfg.action_high - cfg.action_low) / cfg.n_action_bins
    a = cfg.action_low + (idx.astype(jnp.float32) + 0.5) * step
    return a.reshape(ids.shape[0], cfg.chunk_size, cfg.max_action_dim)


# ---------------------------------------------------------------------------
# prefix embedding (images + language + state token)
# ---------------------------------------------------------------------------

def embed_prefix(params, images, img_masks, lang_tokens, lang_masks, state,
                 cfg: Pi0FASTConfig, policy: DtypePolicy = DEFAULT_POLICY):
    embs, pad, att = pi0.embed_prefix(
        params, images, img_masks, lang_tokens, lang_masks, cfg, policy
    )
    b = embs.shape[0]
    state_tok = cm.dense(params["state_proj"], policy.cast(state), policy)[:, None, :]
    embs = jnp.concatenate([embs, state_tok], axis=1)
    pad = jnp.concatenate([pad, jnp.ones((b, 1), bool)], axis=1)
    att = jnp.concatenate([att, jnp.zeros((b, 1), jnp.int32)], axis=1)
    return embs, pad, att


def _logits(params, h, policy):
    emb = params["vlm_embed"]["embedding"].astype(policy.compute_dtype)
    return jnp.dot(h, emb.T).astype(jnp.float32)


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def compute_loss(params, key, batch: dict, cfg: Pi0FASTConfig,
                 policy: DtypePolicy = DEFAULT_POLICY, train: bool = True):
    # Targets: in-graph uniform binning by default; FAST DCT+BPE tokens when
    # the host pipeline precomputed them (pi0fast/fast_tokenizer.encode_batch
    # -> batch["action_tokens"] int32 [B, T] + "action_token_mask" bool).
    if "action_tokens" in batch:
        targets = batch["action_tokens"].astype(jnp.int32)
        token_keep = batch.get(
            "action_token_mask", jnp.ones(targets.shape, bool)
        ).astype(bool)
    else:
        targets = tokenize_actions(batch["actions"], cfg)  # [B, T]
        token_keep = None
    b, t = targets.shape
    # cast to the compute dtype: a float32 scalar would promote the bf16
    # embeddings (and the whole concatenated sequence) to f32
    scale = jnp.asarray(cfg.vlm.width**0.5, policy.compute_dtype)

    pre_embs, pre_pad, pre_att = embed_prefix(
        params, batch["images"], batch["img_masks"], batch["lang_tokens"],
        batch["lang_masks"], batch["state"], cfg, policy,
    )

    # teacher forcing: suffix inputs = [start, a_0 .. a_{T-2}]
    tok_emb = cm.embed_lookup(params["vlm_embed"], targets[:, :-1], policy) * scale
    start = jnp.broadcast_to(
        policy.cast(params["action_start"]), (b, 1, cfg.vlm.width)
    )
    suf_embs = jnp.concatenate([start, tok_emb], axis=1)
    suf_pad = jnp.ones((b, t), bool)
    suf_att = jnp.ones((b, t), jnp.int32)  # causal chain

    embs = jnp.concatenate([pre_embs, suf_embs], axis=1)
    pad = jnp.concatenate([pre_pad, suf_pad], axis=1)
    att = jnp.concatenate([pre_att, suf_att], axis=1)
    mask = make_att_2d_masks(pad, att)
    positions = jnp.cumsum(pad.astype(jnp.int32), axis=1) - 1

    out, _ = gemma.prefill(
        params["vlm"], embs, mask, positions, cfg.vlm, policy, cfg.attention_impl
    )
    logits = _logits(params, out[:, -t:], policy)  # [B, T, V]

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, :, None], axis=-1)[..., 0]

    if token_keep is not None:
        keep = token_keep
    elif "action_is_pad" in batch:
        keep = jnp.repeat(~batch["action_is_pad"], cfg.max_action_dim, axis=1)
    else:
        keep = jnp.ones(targets.shape, bool)
    keep_f = keep.astype(nll.dtype)
    n_keep = jnp.maximum(keep_f.sum(), 1)
    loss = (nll * keep_f).sum() / n_keep
    # accuracy over the SAME mask as the loss — padded positions hold
    # target 0 the model is never trained on, so counting them deflates
    # accuracy roughly by the padding fraction
    match = (jnp.argmax(logits, -1) == targets).astype(jnp.float32)
    acc = (match * keep_f).sum() / n_keep
    return loss, {"l2_loss": loss, "ce_loss": loss, "token_accuracy": acc,
                  "losses": nll * keep_f}


# ---------------------------------------------------------------------------
# sampling (greedy, KV-cached)
# ---------------------------------------------------------------------------

def sample_actions(params, key, images, img_masks, lang_tokens, lang_masks, state,
                   cfg: Pi0FASTConfig, policy: DtypePolicy = DEFAULT_POLICY,
                   noise=None, return_tokens: bool = False):
    """Greedy KV-cached decode -> actions (in-graph bin detokenize), or the
    raw generated token ids when return_tokens=True — the FAST DCT+BPE
    path decodes those host-side (pi0fast/fast_tokenizer.decode_batch)."""
    del key, noise  # greedy decode is deterministic
    pre_embs, pre_pad, pre_att = embed_prefix(
        params, images, img_masks, lang_tokens, lang_masks, state, cfg, policy
    )
    b, p_len = pre_pad.shape
    t = cfg.n_action_tokens
    total = p_len + t
    # cast to the compute dtype: a float32 scalar would promote the bf16
    # embeddings (and the whole concatenated sequence) to f32
    scale = jnp.asarray(cfg.vlm.width**0.5, policy.compute_dtype)

    pre_mask = make_att_2d_masks(pre_pad, pre_att)
    pre_pos = jnp.cumsum(pre_pad.astype(jnp.int32), axis=1) - 1
    _, (ck, cv) = gemma.prefill(
        params["vlm"], pre_embs, pre_mask, pre_pos, cfg.vlm, policy,
        cfg.attention_impl, kv_only=True,
    )
    # preallocate the suffix region of the cache
    pad_spec = [(0, 0), (0, 0), (0, t), (0, 0), (0, 0)]
    ck = jnp.pad(ck, pad_spec)
    cv = jnp.pad(cv, pad_spec)

    prefix_count = pre_pad.sum(axis=1).astype(jnp.int32)  # [B]
    key_valid0 = jnp.concatenate([pre_pad, jnp.zeros((b, t), bool)], axis=1)
    kv_scale = cfg.vlm.head_dim**-0.5

    def decode_one(x_emb, caches, key_valid, position):
        """One token through all layers, appending K/V at slot p_len+step."""
        ck, cv, step = caches

        def layer(x, inputs):
            bp, k_layer, v_layer = inputs
            y = cm.rms_norm(bp["ln1"], x, cfg.vlm.norm_eps)
            q, k_new, v_new = gemma._qkv(bp, y, position, cfg.vlm, policy)
            k_layer = jax.lax.dynamic_update_slice(
                k_layer, k_new.astype(k_layer.dtype), (0, p_len + step, 0, 0)
            )
            v_layer = jax.lax.dynamic_update_slice(
                v_layer, v_new.astype(v_layer.dtype), (0, p_len + step, 0, 0)
            )
            att = multi_head_attention(
                q, k_layer.astype(q.dtype), v_layer.astype(q.dtype),
                mask=key_valid[:, None, :], scale=kv_scale,
            )
            x = gemma._post_attention(bp, x, att, cfg.vlm, policy)
            return x, (k_layer, v_layer)

        x, (ck, cv) = jax.lax.scan(
            lambda x, inp: layer(x, inp), x_emb, (params["vlm"]["blocks"], ck, cv)
        )
        x = cm.rms_norm(params["vlm"]["final_norm"], x, cfg.vlm.norm_eps)
        return x, (ck, cv)

    def step_fn(carry, step):
        tok, ck, cv, key_valid = carry
        is_first = step == 0
        start = jnp.broadcast_to(policy.cast(params["action_start"]), (b, 1, cfg.vlm.width))
        tok_emb = cm.embed_lookup(params["vlm_embed"], tok[:, None], policy) * scale
        x = jnp.where(is_first, start, tok_emb)

        position = (prefix_count + step)[:, None]  # [B, 1]
        key_valid = key_valid.at[:, p_len + step].set(True)
        out, (ck, cv) = decode_one(x, (ck, cv, step), key_valid, position)

        logits = _logits(params, out[:, 0], policy)  # [B, V]
        # constrain decoding to the action-token vocabulary window: the
        # last n_action_bins ids for uniform binning, or the FAST
        # tokenizer's full max_token tail when action_vocab_size is set
        # (FAST BPE merge tokens live beyond the 256 base bins)
        win = cfg.action_vocab_size or cfg.n_action_bins
        tail = logits[:, cfg.vlm.vocab_size - win:]
        j = jnp.argmax(tail, axis=-1)
        next_tok = (cfg.vlm.vocab_size - win + j).astype(jnp.int32)
        return (next_tok, ck, cv, key_valid), next_tok

    init_tok = jnp.zeros((b,), jnp.int32)
    (_, _, _, _), tokens = jax.lax.scan(
        step_fn, (init_tok, ck, cv, key_valid0), jnp.arange(t)
    )
    tokens = tokens.T  # [B, T]
    if return_tokens:
        return tokens
    actions = detokenize_actions(tokens, cfg)
    # pad to a common [B, chunk, max(7, dim)] float32 like the other models
    return actions.astype(jnp.float32)
