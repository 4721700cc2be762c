"""Gemma decoder blocks with multi-stream ("mixture of experts") attention —
the Pi0 trunk: a PaliGemma VLM stream and a smaller action-expert stream that
share one attention operation per layer.

Why this shape: in Pi0 the suffix tokens (robot state + noisy action chunk)
are processed by a separate ~300M Gemma whose queries attend over the
concatenation of VLM prefix K/V and expert suffix K/V. The reference reaches
this layout through HF module surgery (`src/model/mmmvla/expert.py:202-282`,
joint prefix+suffix attention); here both streams are stacked-parameter scans
advanced in lockstep, which XLA compiles to one fused layer body.

Three entry points:
  forward_joint   training: prefix+suffix in one pass (no cache)
  prefill         inference step 1: prefix through the VLM, emit K/V cache
  decode          inference denoise steps: suffix through the expert against
                  the cached prefix K/V (runs inside lax.scan over Euler steps)

Grouped-query attention: 8 query heads / 1 KV head / head_dim 256 for both
streams (widths differ: 2048 VLM vs 1024 expert).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from intact_tpu.models import common as cm
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.ops.attention import multi_head_attention, xla_attention_cached
from intact_tpu.ops.rope import apply_rope


@dataclasses.dataclass(frozen=True)
class GemmaConfig:
    width: int
    depth: int
    mlp_dim: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    vocab_size: int = 257_152  # PaliGemma vocab
    rope_base: float = 10_000.0
    norm_eps: float = 1e-6


def gemma_2b() -> GemmaConfig:
    """PaliGemma-3B's language trunk."""
    return GemmaConfig(width=2048, depth=18, mlp_dim=16_384, num_heads=8, num_kv_heads=1, head_dim=256)


def gemma_300m_expert() -> GemmaConfig:
    """Pi0 action expert: same depth/heads as the VLM trunk, narrower width."""
    return GemmaConfig(width=1024, depth=18, mlp_dim=4096, num_heads=8, num_kv_heads=1, head_dim=256)


def tiny_test_config(width: int = 32, depth: int = 2) -> GemmaConfig:
    return GemmaConfig(
        width=width, depth=depth, mlp_dim=64, num_heads=2, num_kv_heads=1,
        head_dim=16, vocab_size=256,
    )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _block_init(key, cfg: GemmaConfig) -> cm.Params:
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
        "ln2": cm.rmsnorm_init(d),
        "mlp": {
            "gate": cm.dense_init(ks[4], d, m, use_bias=False),
            "up": cm.dense_init(ks[5], d, m, use_bias=False),
            "down": cm.dense_init(ks[6], m, d, use_bias=False),
        },
    }


def init_blocks(key, cfg: GemmaConfig) -> cm.Params:
    k_blocks, _ = jax.random.split(key)
    return {
        "blocks": cm.stack_layer_init(k_blocks, cfg.depth, lambda k: _block_init(k, cfg)),
        "final_norm": cm.rmsnorm_init(cfg.width),
    }


def init_embed(key, cfg: GemmaConfig) -> cm.Params:
    return cm.embed_init(key, cfg.vocab_size, cfg.width)


# ---------------------------------------------------------------------------
# layer pieces
# ---------------------------------------------------------------------------

def _kv(bp, x, positions, cfg: GemmaConfig, policy: DtypePolicy):
    b, t, _ = x.shape
    k = cm.dense(bp["attn"]["k"], x, policy).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    v = cm.dense(bp["attn"]["v"], x, policy).reshape(b, t, cfg.num_kv_heads, cfg.head_dim)
    k = apply_rope(k, positions, cfg.rope_base)
    return k, v


def _qkv(bp, x, positions, cfg: GemmaConfig, policy: DtypePolicy):
    b, t, _ = x.shape
    q = cm.dense(bp["attn"]["q"], x, policy).reshape(b, t, cfg.num_heads, cfg.head_dim)
    q = apply_rope(q, positions, cfg.rope_base)
    k, v = _kv(bp, x, positions, cfg, policy)
    return q, k, v


def _post_attention(bp, x, att_out, cfg: GemmaConfig, policy: DtypePolicy):
    b, t = att_out.shape[:2]
    x = x + cm.dense(bp["attn"]["o"], att_out.reshape(b, t, -1), policy)
    y = cm.rms_norm(bp["ln2"], x, cfg.norm_eps)
    return x + cm.gemma_mlp(bp["mlp"], y, policy)


# ---------------------------------------------------------------------------
# forward modes
# ---------------------------------------------------------------------------

def forward_joint(
    vlm_params: cm.Params,
    expert_params: cm.Params,
    x_pre: jnp.ndarray,  # [B, P, D_vlm] embedded prefix
    x_suf: jnp.ndarray,  # [B, S, D_exp] embedded suffix
    mask: jnp.ndarray,  # bool[B, P+S, P+S] over the concatenated sequence
    positions: jnp.ndarray,  # int[B, P+S]
    vlm_cfg: GemmaConfig,
    expert_cfg: GemmaConfig,
    policy: DtypePolicy = DEFAULT_POLICY,
    attention_impl: str = "xla",
    suffix_only: bool = False,
):
    """Training pass. Returns (prefix_out, suffix_out), both final-normed.

    suffix_only=True is for callers that discard prefix_out (Pi0's training
    loss reads only the action-chunk suffix). Like prefill's kv_only: the
    LAST layer's prefix attention output, o-projection, and 16k-wide MLP
    feed only prefix_out — dead fwd AND bwd compute (~1 prefix layer of 18,
    ~5% of the joint step's FLOPs) that XLA cannot eliminate because every
    scan iteration shares one body. The last layer pair then runs: prefix
    -> bare ln1+KV projection; suffix -> full attention over [prefix K/V;
    suffix K/V] + MLP. Gradients are bit-identical: the only paths from the
    discarded prefix tail to the loss are the ones removed. Returns
    (None, suffix_out).
    """
    p_len = x_pre.shape[1]
    pos_pre, pos_suf = positions[:, :p_len], positions[:, p_len:]

    body = _joint_body(mask, pos_pre, pos_suf, vlm_cfg, expert_cfg, policy,
                       attention_impl)

    blocks = (vlm_params["blocks"], expert_params["blocks"])
    if not suffix_only:
        (x_pre, x_suf), _ = jax.lax.scan(body, (x_pre, x_suf), blocks)
        x_pre = cm.rms_norm(vlm_params["final_norm"], x_pre, vlm_cfg.norm_eps)
        x_suf = cm.rms_norm(expert_params["final_norm"], x_suf, expert_cfg.norm_eps)
        return x_pre, x_suf

    head = jax.tree_util.tree_map(lambda a: a[:-1], blocks)
    last_v, last_e = jax.tree_util.tree_map(lambda a: a[-1], blocks)
    (x_pre, x_suf), _ = jax.lax.scan(body, (x_pre, x_suf), head)
    x_suf = joint_last_pair(
        last_v, last_e, x_pre, x_suf, mask[:, p_len:, :], pos_pre, pos_suf,
        vlm_cfg, expert_cfg, policy,
    )
    x_suf = cm.rms_norm(expert_params["final_norm"], x_suf, expert_cfg.norm_eps)
    return None, x_suf


def _joint_body(mask, pos_pre, pos_suf, vlm_cfg: GemmaConfig,
                expert_cfg: GemmaConfig, policy: DtypePolicy,
                attention_impl: str):
    """One joint prefix+suffix layer pair as a checkpointed scan body
    (shared by forward_joint and the fused-backward segments)."""
    p_len = pos_pre.shape[1]
    scale = vlm_cfg.head_dim**-0.5

    @jax.checkpoint  # per-layer remat: backward recomputes one layer at a time
    def body(carry, bps):
        xp, xs = carry
        bp_v, bp_e = bps
        yp = cm.rms_norm(bp_v["ln1"], xp, vlm_cfg.norm_eps)
        ys = cm.rms_norm(bp_e["ln1"], xs, expert_cfg.norm_eps)
        qp, kp, vp = _qkv(bp_v, yp, pos_pre, vlm_cfg, policy)
        qs, ks, vs = _qkv(bp_e, ys, pos_suf, expert_cfg, policy)
        q = jnp.concatenate([qp, qs], axis=1)
        k = jnp.concatenate([kp, ks], axis=1)
        v = jnp.concatenate([vp, vs], axis=1)
        att = multi_head_attention(q, k, v, mask=mask, impl=attention_impl, scale=scale)
        xp = _post_attention(bp_v, xp, att[:, :p_len], vlm_cfg, policy)
        xs = _post_attention(bp_e, xs, att[:, p_len:], expert_cfg, policy)
        return (xp, xs), None

    return body


def joint_segment(vlm_blocks, expert_blocks, x_pre, x_suf, mask, positions,
                  vlm_cfg: GemmaConfig, expert_cfg: GemmaConfig,
                  policy: DtypePolicy = DEFAULT_POLICY,
                  attention_impl: str = "xla"):
    """Scan a SLICE of layer pairs (the fused-backward segment unit,
    train/fused_joint.py). Same body as forward_joint."""
    p_len = x_pre.shape[1]
    pos_pre, pos_suf = positions[:, :p_len], positions[:, p_len:]
    body = _joint_body(mask, pos_pre, pos_suf, vlm_cfg, expert_cfg, policy,
                       attention_impl)
    (x_pre, x_suf), _ = jax.lax.scan(
        body, (x_pre, x_suf), (vlm_blocks, expert_blocks)
    )
    return x_pre, x_suf


def joint_last_pair(last_v, last_e, x_pre, x_suf, suffix_mask, pos_pre,
                    pos_suf, vlm_cfg: GemmaConfig, expert_cfg: GemmaConfig,
                    policy: DtypePolicy = DEFAULT_POLICY):
    """The suffix_only last layer: prefix side contributes only ln1 + K/V
    (its attention output / o-proj / MLP are dead when prefix_out is
    discarded); suffix side runs the full layer against [prefix K/V;
    suffix K/V]. suffix_mask is mask[:, p_len:, :]."""
    scale = vlm_cfg.head_dim**-0.5

    @jax.checkpoint
    def last_pair(xp, xs):
        yp = cm.rms_norm(last_v["ln1"], xp, vlm_cfg.norm_eps)
        kp, vp = _kv(last_v, yp, pos_pre, vlm_cfg, policy)
        ys = cm.rms_norm(last_e["ln1"], xs, expert_cfg.norm_eps)
        qs, ks, vs = _qkv(last_e, ys, pos_suf, expert_cfg, policy)
        k = jnp.concatenate([kp, ks], axis=1)
        v = jnp.concatenate([vp, vs], axis=1)
        # xla impl: a handful of suffix query rows (S = 1+chunk) — below the
        # pallas kernel's tile size; same choice as decode's cached attention
        att = multi_head_attention(
            qs, k, v, mask=suffix_mask, impl="xla", scale=scale
        )
        return _post_attention(last_e, xs, att, expert_cfg, policy)

    return last_pair(x_pre, x_suf)


def prefill(
    vlm_params: cm.Params,
    x_pre: jnp.ndarray,  # [B, P, D_vlm]
    mask: jnp.ndarray,  # bool[B, P, P]
    positions: jnp.ndarray,  # int[B, P]
    cfg: GemmaConfig,
    policy: DtypePolicy = DEFAULT_POLICY,
    attention_impl: str = "xla",
    kv_only: bool = False,
):
    """Prefix-only pass; returns (prefix_out, kv_cache).

    kv_cache = (k, v) each [L, B, P, KVH, head_dim] — K is cached WITH RoPE
    applied, so decode never re-rotates prefix keys.

    kv_only=True is for callers that discard prefix_out and consume only the
    cache (Pi0 sample_actions / frozen-prefix training, pi0fast greedy
    decode, the MVLA prompt-KV expert). The LAST layer's attention output,
    out-projection, 16k-wide MLP, and the final norm feed only prefix_out —
    dead compute that XLA cannot eliminate because every scan iteration
    shares one body. Running the scan over depth-1 layers and finishing with
    a bare ln1+KV projection skips ~1 layer of the 18 (~5% of prefill FLOPs)
    for the same cache (bit-identical on TPU; the last layer's KV projection
    compiles outside the scan body, so CPU may reassociate within float eps);
    returns (None, kv_cache).
    """
    scale = cfg.head_dim**-0.5

    @jax.checkpoint  # per-layer remat (free in forward-only inference)
    def body(x, bp):
        y = cm.rms_norm(bp["ln1"], x, cfg.norm_eps)
        q, k, v = _qkv(bp, y, positions, cfg, policy)
        att = multi_head_attention(q, k, v, mask=mask, impl=attention_impl, scale=scale)
        x = _post_attention(bp, x, att, cfg, policy)
        return x, (k, v)

    if not kv_only:
        x_pre, kv_cache = jax.lax.scan(body, x_pre, vlm_params["blocks"])
        x_pre = cm.rms_norm(vlm_params["final_norm"], x_pre, cfg.norm_eps)
        return x_pre, kv_cache

    blocks = vlm_params["blocks"]
    head = jax.tree_util.tree_map(lambda a: a[:-1], blocks)
    last = jax.tree_util.tree_map(lambda a: a[-1], blocks)
    x_pre, (k_head, v_head) = jax.lax.scan(body, x_pre, head)
    y = cm.rms_norm(last["ln1"], x_pre, cfg.norm_eps)
    k_last, v_last = _kv(last, y, positions, cfg, policy)
    kv_cache = (
        jnp.concatenate([k_head, k_last[None]], axis=0),
        jnp.concatenate([v_head, v_last[None]], axis=0),
    )
    return None, kv_cache


def decode(
    expert_params: cm.Params,
    kv_cache,  # (k, v) from prefill: [L, B, P, KVH, head_dim]
    x_suf: jnp.ndarray,  # [B, S, D_exp]
    mask: jnp.ndarray,  # bool[B, S, P+S]
    positions: jnp.ndarray,  # int[B, S] (continuing after the prefix)
    cfg: GemmaConfig,
    policy: DtypePolicy = DEFAULT_POLICY,
    attention_impl: str = "xla",
) -> jnp.ndarray:
    """Suffix pass against a frozen prefix cache. Returns final-normed suffix.

    Note the attention scale uses the EXPERT head_dim (same value as the VLM's
    by construction: both use head_dim 256).
    """
    cache_k, cache_v = kv_cache
    scale = cfg.head_dim**-0.5

    p_len = cache_k.shape[2]  # [L, B, P, KVH, D]

    def body(x, inputs):
        bp, ck, cv = inputs
        y = cm.rms_norm(bp["ln1"], x, cfg.norm_eps)
        q, k, v = _qkv(bp, y, positions, cfg, policy)
        # split-cache attention: the prefix K/V stay where prefill wrote
        # them — concatenating [cache; fresh] here re-copied the whole
        # prefix cache through HBM on every layer of every Euler step
        # (ops/attention.xla_attention_cached)
        att = xla_attention_cached(
            q, ck.astype(k.dtype), cv.astype(v.dtype), k, v,
            mask[:, :, :p_len], mask[:, :, p_len:], scale=scale,
        )
        x = _post_attention(bp, x, att, cfg, policy)
        return x, None

    x_suf, _ = jax.lax.scan(body, x_suf, (expert_params["blocks"], cache_k, cache_v))
    return cm.rms_norm(expert_params["final_norm"], x_suf, cfg.norm_eps)
