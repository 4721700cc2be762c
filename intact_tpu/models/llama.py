"""LLaMA-3-family decoder in functional JAX (Magma-8B's language trunk).

The reference serves Magma-8B through HF `AutoModelForCausalLM` with
flash-attention (`policy_wrapper.py:282-293`); its language model is a
LLaMA-3-8B. This module provides that decoder natively — prefill + KV-cached
greedy decode entirely in-graph (lax.scan) — so converted Magma/LLaMA
weights run the autoregressive action-token decode on TPU without torch.

Conventions pinned against transformers LlamaModel (tests/test_hf_parity_llama.py):
  * RMSNorm: x * rsqrt(mean(x^2)+eps) * w (plain w, unlike Gemma's 1+w);
  * rotary embedding, half-split rotation, default theta 500000 (llama3);
  * GQA (e.g. 32 query heads over 8 KV heads at 8B);
  * SiLU-gated MLP (gate/up/down), attention scale 1/sqrt(head_dim);
  * NO embedding scaling (unlike Gemma's sqrt(width)).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.ops.attention import multi_head_attention
from intact_tpu.ops.rope import apply_rope


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    width: int
    depth: int
    mlp_dim: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    vocab_size: int
    rope_base: float = 500_000.0
    norm_eps: float = 1e-5
    tie_embeddings: bool = False


def llama3_8b() -> LlamaConfig:
    return LlamaConfig(width=4096, depth=32, mlp_dim=14_336, num_heads=32,
                       num_kv_heads=8, head_dim=128, vocab_size=128_256)


def tiny_test_config() -> LlamaConfig:
    return LlamaConfig(width=32, depth=2, mlp_dim=64, num_heads=4,
                       num_kv_heads=2, head_dim=8, vocab_size=99,
                       rope_base=10_000.0)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _block_init(key, cfg: LlamaConfig) -> cm.Params:
    ks = jax.random.split(key, 7)
    d, m = cfg.width, cfg.mlp_dim
    qdim = cfg.num_heads * cfg.head_dim
    kvdim = cfg.num_kv_heads * cfg.head_dim
    return {
        "ln1": {"scale": jnp.ones((d,), jnp.float32)},
        "attn": {
            "q": cm.dense_init(ks[0], d, qdim, use_bias=False),
            "k": cm.dense_init(ks[1], d, kvdim, use_bias=False),
            "v": cm.dense_init(ks[2], d, kvdim, use_bias=False),
            "o": cm.dense_init(ks[3], qdim, d, use_bias=False),
        },
        "ln2": {"scale": jnp.ones((d,), jnp.float32)},
        "mlp": {
            "gate": cm.dense_init(ks[4], d, m, use_bias=False),
            "up": cm.dense_init(ks[5], d, m, use_bias=False),
            "down": cm.dense_init(ks[6], m, d, use_bias=False),
        },
    }


def init(key, cfg: LlamaConfig) -> cm.Params:
    ks = jax.random.split(key, 3)
    params = {
        "embed": cm.embed_init(ks[0], cfg.vocab_size, cfg.width),
        "blocks": cm.stack_layer_init(ks[1], cfg.depth, lambda k: _block_init(k, cfg)),
        "final_norm": {"scale": jnp.ones((cfg.width,), jnp.float32)},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = cm.dense_init(ks[2], cfg.width, cfg.vocab_size,
                                          use_bias=False)
    return params


def llama_rms_norm(p, x, eps):
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)).astype(dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _qkv(bp, x, positions, cfg: LlamaConfig, policy):
    b, t, _ = x.shape
    q = cm.dense(bp["attn"]["q"], x, policy).reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = cm.dense(bp["attn"]["k"], x, policy).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    v = cm.dense(bp["attn"]["v"], x, policy).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    q = apply_rope(q, positions, cfg.rope_base)
    k = apply_rope(k, positions, cfg.rope_base)
    return q, k, v


def _silu_mlp(bp, x, policy):
    gate = jax.nn.silu(cm.dense(bp["mlp"]["gate"], x, policy))
    return cm.dense(bp["mlp"]["down"], gate * cm.dense(bp["mlp"]["up"], x, policy), policy)


def forward(
    params: cm.Params,
    embeds: jnp.ndarray,  # [B, T, D] (inputs_embeds; multimodal glue concat)
    mask: jnp.ndarray,  # bool [B, T, T]
    positions: jnp.ndarray,  # int [B, T]
    cfg: LlamaConfig,
    policy: DtypePolicy = DEFAULT_POLICY,
):
    """-> (hidden final-normed [B, T, D], kv_cache [L, B, T, KVH, hd] x2)."""
    scale = cfg.head_dim**-0.5

    def body(x, bp):
        y = llama_rms_norm(bp["ln1"], x, cfg.norm_eps)
        q, k, v = _qkv(bp, y, positions, cfg, policy)
        att = multi_head_attention(q, k, v, mask=mask, scale=scale)
        b, t = att.shape[:2]
        x = x + cm.dense(bp["attn"]["o"], att.reshape(b, t, -1), policy)
        y = llama_rms_norm(bp["ln2"], x, cfg.norm_eps)
        return x + _silu_mlp(bp, y, policy), (k, v)

    x, kv = jax.lax.scan(body, embeds, params["blocks"])
    return llama_rms_norm(params["final_norm"], x, cfg.norm_eps), kv


def logits(params, hidden, cfg: LlamaConfig, policy=DEFAULT_POLICY):
    if cfg.tie_embeddings or "lm_head" not in params:
        return cm.unembed_logits(params["embed"], hidden, policy)
    # untied head: cm.dense dispatches to the W8A8 path when the serving
    # tree carries int8 lm_head weights (QUANTIZE_DEFAULT_PATTERN)
    return cm.dense(params["lm_head"], hidden, policy).astype(jnp.float32)


def greedy_decode(
    params: cm.Params,
    prompt_embeds: jnp.ndarray,  # [B, P, D]
    prompt_mask: jnp.ndarray,  # bool [B, P]
    max_new_tokens: int,
    cfg: LlamaConfig,
    policy: DtypePolicy = DEFAULT_POLICY,
) -> jnp.ndarray:
    """In-graph KV-cached greedy decode -> [B, max_new_tokens] token ids.

    Prefill caches the prompt K/V (RoPE pre-applied); each decode step runs
    one token through all layers against the growing cache inside one
    lax.scan — no host round trips (the reference's HF generate loop is a
    Python loop with use_cache=False, policy_wrapper.py:253).
    """
    b, p_len, d = prompt_embeds.shape
    total = p_len + max_new_tokens
    scale = cfg.head_dim**-0.5

    positions = jnp.cumsum(prompt_mask.astype(jnp.int32), axis=1) - 1
    causal = jnp.tril(jnp.ones((p_len, p_len), bool))[None]
    mask = causal & prompt_mask[:, None, :]
    hidden, kv = forward(params, prompt_embeds, mask, positions, cfg, policy)

    # pad caches to the full decode length
    def pad_cache(c):  # [L, B, P, KVH, hd] -> [L, B, total, KVH, hd]
        return jnp.pad(c, ((0, 0), (0, 0), (0, max_new_tokens), (0, 0), (0, 0)))

    cache_k, cache_v = pad_cache(kv[0]), pad_cache(kv[1])
    key_valid0 = jnp.pad(prompt_mask, ((0, 0), (0, max_new_tokens)))

    # last VALID prompt token per row (prompts may be right-padded)
    last_idx = jnp.sum(prompt_mask.astype(jnp.int32), axis=1) - 1
    last_hidden = hidden[jnp.arange(b), last_idx]
    first_token = jnp.argmax(logits(params, last_hidden, cfg, policy), axis=-1)
    next_pos = positions[jnp.arange(b), last_idx] + 1

    def step(carry, i):
        token, pos, ck, cv, key_valid = carry
        x = cm.embed_lookup(params["embed"], token[:, None], policy)  # [B,1,D]
        pos_ids = pos[:, None]
        key_valid = key_valid.at[:, p_len + i].set(True)

        def body(x, layer):
            bp, ck_l, cv_l = layer
            y = llama_rms_norm(bp["ln1"], x, cfg.norm_eps)
            q, k, v = _qkv(bp, y, pos_ids, cfg, policy)
            ck_l = jax.lax.dynamic_update_slice_in_dim(ck_l, k.astype(ck_l.dtype), p_len + i, axis=1)
            cv_l = jax.lax.dynamic_update_slice_in_dim(cv_l, v.astype(cv_l.dtype), p_len + i, axis=1)
            att = multi_head_attention(
                q, ck_l, cv_l, mask=key_valid[:, None, :], scale=scale
            )
            x = x + cm.dense(bp["attn"]["o"], att.reshape(x.shape[0], 1, -1), policy)
            y = llama_rms_norm(bp["ln2"], x, cfg.norm_eps)
            return x + _silu_mlp(bp, y, policy), (ck_l, cv_l)

        x, (ck, cv) = jax.lax.scan(body, x, (params["blocks"], ck, cv))
        x = llama_rms_norm(params["final_norm"], x, cfg.norm_eps)
        nxt = jnp.argmax(logits(params, x[:, 0], cfg, policy), axis=-1)
        return (nxt, pos + 1, ck, cv, key_valid), token

    (_, _, _, _, _), tokens = jax.lax.scan(
        step,
        (first_token, next_pos, cache_k, cache_v, key_valid0),
        jnp.arange(max_new_tokens),
    )
    return tokens.T  # [B, max_new_tokens]


# ---------------------------------------------------------------------------
# HF torch checkpoint -> params
# ---------------------------------------------------------------------------

def from_hf_state_dict(sd: dict, cfg: LlamaConfig, prefix: str = "model",
                       head_key: str = "lm_head.weight") -> cm.Params:
    """Flat torch state dict (LlamaForCausalLM / Magma language_model naming)
    -> param tree. Linear weights [out, in] -> kernels [in, out].
    ``head_key`` locates the unembedding when the LM is nested inside a
    multimodal checkpoint (e.g. ``language_model.lm_head.weight``)."""

    def t(name):
        return np.asarray(sd[name]).T.copy()

    def stack(fmt, transform):
        return np.stack([transform(fmt.format(i=i)) for i in range(cfg.depth)])

    f = prefix + ".layers.{i}."
    params = {
        "embed": {"embedding": np.asarray(sd[prefix + ".embed_tokens.weight"])},
        "blocks": {
            "ln1": {"scale": stack(f + "input_layernorm.weight",
                                   lambda n: np.asarray(sd[n]))},
            "attn": {
                "q": {"kernel": stack(f + "self_attn.q_proj.weight", t)},
                "k": {"kernel": stack(f + "self_attn.k_proj.weight", t)},
                "v": {"kernel": stack(f + "self_attn.v_proj.weight", t)},
                "o": {"kernel": stack(f + "self_attn.o_proj.weight", t)},
            },
            "ln2": {"scale": stack(f + "post_attention_layernorm.weight",
                                   lambda n: np.asarray(sd[n]))},
            "mlp": {
                "gate": {"kernel": stack(f + "mlp.gate_proj.weight", t)},
                "up": {"kernel": stack(f + "mlp.up_proj.weight", t)},
                "down": {"kernel": stack(f + "mlp.down_proj.weight", t)},
            },
        },
        "final_norm": {"scale": np.asarray(sd[prefix + ".norm.weight"])},
    }
    if head_key in sd:
        params["lm_head"] = {"kernel": t(head_key)}
    return params
