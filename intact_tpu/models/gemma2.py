"""Gemma2 decoder in functional JAX (PaliGemma2 / SpatialVLA-4B trunk).

SpatialVLA-4B is PaliGemma2-based; the reference serves it through HF
`AutoModel(trust_remote_code=True)` (`policy_wrapper.py:218-223`). This
module provides the Gemma2 language trunk natively so converted weights run
the spatial-action-token decode on TPU. (The full SpatialVLA model also
needs its Ego3D/ZoeDepth position encoder, which requires the upstream
assets — the LM trunk, where the FLOPs are, runs here.)

Gemma2 conventions pinned against transformers Gemma2Model
(tests/test_hf_parity_gemma2.py):
  * FOUR RMSNorms per layer: pre/post attention and pre/post feed-forward
    (post-norms normalize the residual BRANCH output before the add);
  * attention logit softcapping: cap * tanh(logits / cap), cap=50, applied
    before masking; final lm-head logits capped at 30;
  * query scale 1/sqrt(query_pre_attn_scalar) (NOT head_dim in general);
  * alternating sliding-window (even layers) / global (odd) attention;
  * RMSNorm (1+w) and sqrt(width) embed scaling as in Gemma1.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.ops.attention import BIG_NEG
from intact_tpu.ops.rope import apply_rope


@dataclasses.dataclass(frozen=True)
class Gemma2Config:
    width: int
    depth: int
    mlp_dim: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    vocab_size: int
    query_pre_attn_scalar: float = 256.0
    attn_logit_softcap: float = 50.0
    final_logit_softcap: float = 30.0
    sliding_window: int = 4096
    rope_base: float = 10_000.0
    norm_eps: float = 1e-6


def gemma2_2b() -> Gemma2Config:
    """PaliGemma2-3B's text trunk (SpatialVLA-4B operating point)."""
    return Gemma2Config(width=2304, depth=26, mlp_dim=9216, num_heads=8,
                        num_kv_heads=4, head_dim=256, vocab_size=257_152)


def tiny_test_config() -> Gemma2Config:
    return Gemma2Config(width=32, depth=2, mlp_dim=64, num_heads=4,
                        num_kv_heads=2, head_dim=8, vocab_size=99,
                        query_pre_attn_scalar=8.0, sliding_window=3)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _block_init(key, cfg: Gemma2Config) -> cm.Params:
    ks = jax.random.split(key, 7)
    d, m = cfg.width, cfg.mlp_dim
    qdim = cfg.num_heads * cfg.head_dim
    kvdim = cfg.num_kv_heads * cfg.head_dim
    return {
        "ln1": cm.rmsnorm_init(d),
        "attn": {
            "q": cm.dense_init(ks[0], d, qdim, use_bias=False),
            "k": cm.dense_init(ks[1], d, kvdim, use_bias=False),
            "v": cm.dense_init(ks[2], d, kvdim, use_bias=False),
            "o": cm.dense_init(ks[3], qdim, d, use_bias=False),
        },
        "post_attn_norm": cm.rmsnorm_init(d),
        "pre_ffw_norm": cm.rmsnorm_init(d),
        "mlp": {
            "gate": cm.dense_init(ks[4], d, m, use_bias=False),
            "up": cm.dense_init(ks[5], d, m, use_bias=False),
            "down": cm.dense_init(ks[6], m, d, use_bias=False),
        },
        "post_ffw_norm": cm.rmsnorm_init(d),
    }


def init(key, cfg: Gemma2Config) -> cm.Params:
    ks = jax.random.split(key, 2)
    return {
        "embed": cm.embed_init(ks[0], cfg.vocab_size, cfg.width),
        "blocks": cm.stack_layer_init(ks[1], cfg.depth, lambda k: _block_init(k, cfg)),
        "final_norm": cm.rmsnorm_init(cfg.width),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _softcap_attention(q, k, v, mask, scale, cap):
    """Eager attention with logit softcapping (caps preclude the Pallas
    kernel; sequences here are short so the einsum path is roofline-bound
    anyway). GQA contracts per KV head with the query group as a free
    einsum dimension — repeated K/V are never materialized (the repeat
    copied the whole KV set x group through HBM on every decode step;
    see ops/attention.xla_attention)."""
    b, t, h, d = q.shape
    kvh = k.shape[2]
    g = h // kvh
    qg = q.reshape(b, t, kvh, g, d)
    logits = jnp.einsum("btkgd,bskd->bkgts", qg * scale, k,
                        preferred_element_type=jnp.float32)
    logits = cap * jnp.tanh(logits / cap)
    logits = jnp.where(mask[:, None, None, :, :], logits, BIG_NEG)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bkgts,bskd->btkgd", probs.astype(v.dtype), v)
    return out.reshape(b, t, h, d)


def _sliding_mask(positions_q, positions_k, window: int):
    """bool [B, T, S]: |q - k| < window. Symmetric on purpose — causality
    (k <= q) comes from the caller's mask, so a full bidirectional prefix
    mask (PaliGemma2 prefix-LM) keeps sliding layers bidirectional too."""
    delta = positions_q[:, :, None] - positions_k[:, None, :]
    return jnp.abs(delta) < window


def forward(
    params: cm.Params,
    embeds: jnp.ndarray,  # [B, T, D] (already sqrt(width)-scaled if text)
    mask: jnp.ndarray,  # bool [B, T, T] (causal/pad/prefix structure)
    positions: jnp.ndarray,  # int [B, T]
    cfg: Gemma2Config,
    policy: DtypePolicy = DEFAULT_POLICY,
    use_sliding: bool = True,
):
    """-> (final-normed hidden [B, T, D], kv cache [L, B, T, KVH, hd] x2).

    Layer parity (even = sliding window, odd = global) is scanned with a
    per-layer flag so the whole depth stays one scan body.

    ``use_sliding=False`` disables the window on every layer — the
    PaliGemma2 prefix-LM convention: HF applies NO sliding restriction
    inside the bidirectional image+prompt prefix (pinned token-for-token in
    tests/test_hf_parity_paligemma2.py); generated tokens still get the
    causal window (greedy_decode's step path).
    """
    scale = cfg.query_pre_attn_scalar**-0.5
    sliding = _sliding_mask(positions, positions, cfg.sliding_window)
    is_sliding = (jnp.arange(cfg.depth) % 2 == 0) & use_sliding  # HF: layer 0 slides

    def body(x, inputs):
        bp, use_sliding = inputs
        y = cm.rms_norm(bp["ln1"], x, cfg.norm_eps)
        b, t, _ = y.shape
        q = cm.dense(bp["attn"]["q"], y, policy).reshape(b, t, cfg.num_heads, cfg.head_dim)
        k = cm.dense(bp["attn"]["k"], y, policy).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        v = cm.dense(bp["attn"]["v"], y, policy).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, positions, cfg.rope_base)
        k = apply_rope(k, positions, cfg.rope_base)
        m = jnp.where(use_sliding, mask & sliding, mask)
        att = _softcap_attention(q, k, v, m, scale, cfg.attn_logit_softcap)
        att = cm.dense(bp["attn"]["o"], att.reshape(b, t, -1), policy)
        x = x + cm.rms_norm(bp["post_attn_norm"], att, cfg.norm_eps)

        y = cm.rms_norm(bp["pre_ffw_norm"], x, cfg.norm_eps)
        ffw = cm.gemma_mlp(bp["mlp"], y, policy)
        return x + cm.rms_norm(bp["post_ffw_norm"], ffw, cfg.norm_eps), (k, v)

    x, kv = jax.lax.scan(body, embeds, (params["blocks"], is_sliding))
    return cm.rms_norm(params["final_norm"], x, cfg.norm_eps), kv


def logits(params, hidden, cfg: Gemma2Config, policy=DEFAULT_POLICY):
    """Tied-embedding head with final softcapping. Quantized tables
    (cm.quantize_embed serving form) stream int8 through the unembed
    matmul — one greedy-decode step otherwise re-reads the whole 1.18 GB
    bf16 table."""
    out = cm.unembed_logits(params["embed"], hidden, policy)
    cap = cfg.final_logit_softcap
    return cap * jnp.tanh(out / cap)


def encode_text(params, tokens, mask2d, positions, cfg: Gemma2Config,
                policy: DtypePolicy = DEFAULT_POLICY):
    """Token ids -> hidden (embed with sqrt(width) Gemma scaling)."""
    x = cm.embed_lookup(params["embed"], tokens, policy)
    x = x * jnp.asarray(cfg.width**0.5, x.dtype)
    return forward(params, x, mask2d, positions, cfg, policy)[0]


def greedy_decode(
    params: cm.Params,
    prompt_embeds: jnp.ndarray,  # [B, P, D] (multimodal embeds, pre-scaled)
    prompt_mask: jnp.ndarray,  # bool [B, P]
    max_new_tokens: int,
    cfg: Gemma2Config,
    policy: DtypePolicy = DEFAULT_POLICY,
    prefix_full_attention: bool = False,
) -> jnp.ndarray:
    """In-graph KV-cached greedy decode -> [B, max_new_tokens] token ids.

    Same shape as llama.greedy_decode (prefill once, one lax.scan over
    decode steps, no host round trips) with the Gemma2 particulars: four
    norms, attention/final softcaps, sqrt(width)-scaled token embeds, and
    the even-sliding/odd-global layer alternation (the sliding mask is
    applied against cached KEY positions).

    ``prefix_full_attention=True`` makes the prompt bidirectional (the
    PaliGemma/PaliGemma2 prefix-LM convention: image+instruction tokens all
    attend to each other; only generated tokens are causal)."""
    b, p_len, _ = prompt_embeds.shape
    scale = cfg.query_pre_attn_scalar**-0.5
    embed_scale = jnp.asarray(cfg.width**0.5, policy.compute_dtype)
    is_sliding = jnp.arange(cfg.depth) % 2 == 0

    positions = jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1
    if prefix_full_attention:
        causal = jnp.ones((1, p_len, p_len), bool)
    else:
        causal = jnp.tril(jnp.ones((p_len, p_len), bool))[None]
    mask = causal & prompt_mask[:, None, :]
    hidden, kv = forward(params, prompt_embeds, mask, positions, cfg, policy,
                         use_sliding=not prefix_full_attention)

    def pad_cache(c):  # [L, B, P, KVH, hd] -> [L, B, total, KVH, hd]
        return jnp.pad(c, ((0, 0), (0, 0), (0, max_new_tokens), (0, 0), (0, 0)))

    cache_k, cache_v = pad_cache(kv[0]), pad_cache(kv[1])
    key_valid0 = jnp.pad(prompt_mask, ((0, 0), (0, max_new_tokens)))
    key_pos0 = jnp.pad(positions, ((0, 0), (0, max_new_tokens)))

    last_idx = jnp.sum(prompt_mask.astype(jnp.int32), axis=1) - 1
    last_hidden = hidden[jnp.arange(b), last_idx]
    first_token = jnp.argmax(logits(params, last_hidden, cfg, policy), axis=-1)
    next_pos = positions[jnp.arange(b), last_idx] + 1

    def step(carry, i):
        token, pos, ck, cv, key_valid, key_pos = carry
        x = cm.embed_lookup(params["embed"], token[:, None], policy) * embed_scale
        pos_ids = pos[:, None]
        key_valid = key_valid.at[:, p_len + i].set(True)
        key_pos = key_pos.at[:, p_len + i].set(pos)

        delta = pos[:, None] - key_pos  # [B, total]
        in_window = key_valid & (delta >= 0) & (delta < cfg.sliding_window)
        global_m = key_valid & (delta >= 0)

        def body(x, layer):
            bp, use_sliding, ck_l, cv_l = layer
            y = cm.rms_norm(bp["ln1"], x, cfg.norm_eps)
            q = cm.dense(bp["attn"]["q"], y, policy).reshape(b, 1, cfg.num_heads, cfg.head_dim)
            k = cm.dense(bp["attn"]["k"], y, policy).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
            v = cm.dense(bp["attn"]["v"], y, policy).reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
            q = apply_rope(q, pos_ids, cfg.rope_base)
            k = apply_rope(k, pos_ids, cfg.rope_base)
            ck_l = jax.lax.dynamic_update_slice_in_dim(ck_l, k.astype(ck_l.dtype), p_len + i, axis=1)
            cv_l = jax.lax.dynamic_update_slice_in_dim(cv_l, v.astype(cv_l.dtype), p_len + i, axis=1)
            m = jnp.where(use_sliding, in_window, global_m)[:, None, :]
            att = _softcap_attention(q, ck_l, cv_l, m, scale, cfg.attn_logit_softcap)
            x = x + cm.rms_norm(
                bp["post_attn_norm"],
                cm.dense(bp["attn"]["o"], att.reshape(b, 1, -1), policy),
                cfg.norm_eps,
            )
            y = cm.rms_norm(bp["pre_ffw_norm"], x, cfg.norm_eps)
            ffw = cm.gemma_mlp(bp["mlp"], y, policy)
            return x + cm.rms_norm(bp["post_ffw_norm"], ffw, cfg.norm_eps), (ck_l, cv_l)

        x, (ck, cv) = jax.lax.scan(body, x, (params["blocks"], is_sliding, ck, cv))
        x = cm.rms_norm(params["final_norm"], x, cfg.norm_eps)
        nxt = jnp.argmax(logits(params, x[:, 0], cfg, policy), axis=-1)
        return (nxt, pos + 1, ck, cv, key_valid, key_pos), token

    (_, _, _, _, _, _), tokens = jax.lax.scan(
        step,
        (first_token, next_pos, cache_k, cache_v, key_valid0, key_pos0),
        jnp.arange(max_new_tokens),
    )
    return tokens.T  # [B, max_new_tokens]


# ---------------------------------------------------------------------------
# HF torch checkpoint -> params
# ---------------------------------------------------------------------------

def from_hf_state_dict(sd: dict, cfg: Gemma2Config, prefix: str = "model") -> cm.Params:
    def t(name):
        return np.asarray(sd[name]).T.copy()

    def stack(fmt, transform):
        return np.stack([transform(fmt.format(i=i)) for i in range(cfg.depth)])

    prefix = prefix + "." if prefix else ""
    f = prefix + "layers.{i}."
    return {
        "embed": {"embedding": np.asarray(sd[prefix + "embed_tokens.weight"])},
        "blocks": {
            "ln1": {"scale": stack(f + "input_layernorm.weight",
                                   lambda n: np.asarray(sd[n]))},
            "attn": {
                "q": {"kernel": stack(f + "self_attn.q_proj.weight", t)},
                "k": {"kernel": stack(f + "self_attn.k_proj.weight", t)},
                "v": {"kernel": stack(f + "self_attn.v_proj.weight", t)},
                "o": {"kernel": stack(f + "self_attn.o_proj.weight", t)},
            },
            "post_attn_norm": {"scale": stack(
                f + "post_attention_layernorm.weight", lambda n: np.asarray(sd[n]))},
            "pre_ffw_norm": {"scale": stack(
                f + "pre_feedforward_layernorm.weight", lambda n: np.asarray(sd[n]))},
            "mlp": {
                "gate": {"kernel": stack(f + "mlp.gate_proj.weight", t)},
                "up": {"kernel": stack(f + "mlp.up_proj.weight", t)},
                "down": {"kernel": stack(f + "mlp.down_proj.weight", t)},
            },
            "post_ffw_norm": {"scale": stack(
                f + "post_feedforward_layernorm.weight", lambda n: np.asarray(sd[n]))},
        },
        "final_norm": {"scale": np.asarray(sd[prefix + "norm.weight"])},
    }
