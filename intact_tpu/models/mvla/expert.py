"""MVLA action expert: alternating self-/cross-attention Gemma layers.

Behavior parity with `src/model/mvla/expert.py:128-410` /
`src/model/mmmvla/expert.py:202-282`: even layers self-attend over the
suffix (state + noisy action tokens, big_vision block mask, RoPE); odd
layers cross-attend with Q from the suffix and K/V from the connector's
prompt embeddings (no RoPE — prompt tokens carry no shared position frame).
The prompt K/V is computed once per sampling call and cached across Euler
steps (the reference's dict KV cache becomes stacked arrays threaded
through lax.scan).

Parameters are stacked per self/cross PAIR so the whole expert is one scan;
`cfg.depth` must be even under the "self_cross" pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intact_tpu.models import common as cm
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy
from intact_tpu.models.gemma import GemmaConfig, _post_attention, _qkv
from intact_tpu.ops.attention import multi_head_attention


def _cross_block_init(key, cfg: GemmaConfig, prompt_dim: int) -> cm.Params:
    ks = jax.random.split(key, 7)
    d, m = cfg.width, cfg.mlp_dim
    qdim = cfg.num_heads * cfg.head_dim
    kvdim = cfg.num_kv_heads * cfg.head_dim
    return {
        "ln1": cm.rmsnorm_init(d),
        "attn": {
            "q": cm.dense_init(ks[0], d, qdim, use_bias=False),
            "k": cm.dense_init(ks[1], prompt_dim, kvdim, use_bias=False),
            "v": cm.dense_init(ks[2], prompt_dim, kvdim, use_bias=False),
            "o": cm.dense_init(ks[3], qdim, d, use_bias=False),
        },
        "ln2": cm.rmsnorm_init(d),
        "mlp": {
            "gate": cm.dense_init(ks[4], d, m, use_bias=False),
            "up": cm.dense_init(ks[5], d, m, use_bias=False),
            "down": cm.dense_init(ks[6], m, d, use_bias=False),
        },
    }


def init_joint(key, cfg: GemmaConfig) -> cm.Params:
    """Expert for the MMMVLA 'joint' pattern: plain Gemma blocks running over
    the concatenated [prompt, suffix] stream (reference
    `src/model/mmmvla/expert.py:202-282` forward_attn_layer_with_prompt)."""
    from intact_tpu.models import gemma as gemma_lib

    return gemma_lib.init_blocks(key, cfg)


def prefill_joint_prompt_kv(
    params: cm.Params,
    prompt: jnp.ndarray,  # [B, P, D]
    cfg: GemmaConfig,
    policy: DtypePolicy = DEFAULT_POLICY,
    attention_impl: str = "xla",
):
    """Prompt-block K/V for the joint pattern, computed ONCE per inference.

    The prompt tokens form attention block 0 (they never attend the suffix),
    so their K/V are suffix-independent — recomputing them inside every
    Euler step (the old forward_joint-only path) burned ~P/(P+S) of the
    expert FLOPs per denoise step for identical results."""
    from intact_tpu.models import gemma as gemma_lib
    from intact_tpu.ops.masks import make_att_2d_masks

    b, p_len, _ = prompt.shape
    pad = jnp.ones((b, p_len), bool)
    mask = make_att_2d_masks(pad, jnp.zeros((b, p_len), jnp.int32))
    pos = jnp.broadcast_to(jnp.arange(p_len)[None], (b, p_len))
    _, kv = gemma_lib.prefill(
        params, policy.cast(prompt), mask, pos, cfg, policy, attention_impl,
        kv_only=True,
    )
    return kv


def forward_joint(
    params: cm.Params,
    suffix: jnp.ndarray,  # [B, S, D]
    prompt: jnp.ndarray,  # [B, P, D] (same width as the expert)
    suffix_att: jnp.ndarray,  # int [B, S] big_vision block starts
    cfg: GemmaConfig,
    policy: DtypePolicy = DEFAULT_POLICY,
    attention_impl: str = "xla",
    prompt_kv=None,
) -> jnp.ndarray:
    """Joint pattern: prompt tokens form a full-attention block the suffix
    attends into (Pi0-style). With prompt_kv (from
    prefill_joint_prompt_kv) only the suffix runs through the blocks —
    numerically identical to the one-pass [prompt | suffix] prefill, since
    the cache stores RoPE'd keys at the same positions and the
    concatenation order (prompt keys first) matches."""
    from intact_tpu.models import gemma as gemma_lib
    from intact_tpu.ops.masks import make_att_2d_masks

    b, p_len, _ = prompt.shape
    s_len = suffix.shape[1]

    if prompt_kv is not None:
        suf_self = make_att_2d_masks(jnp.ones((b, s_len), bool), suffix_att)
        mask = jnp.concatenate(
            [jnp.ones((b, s_len, p_len), bool), suf_self], axis=2
        )  # [B, S, P+S]
        pos = jnp.broadcast_to(
            p_len + jnp.arange(s_len)[None], (b, s_len)
        )
        return gemma_lib.decode(
            params, prompt_kv, suffix, mask, pos, cfg, policy, attention_impl
        )

    x = jnp.concatenate([policy.cast(prompt), suffix], axis=1)

    pad = jnp.ones((b, p_len + s_len), bool)
    att = jnp.concatenate([jnp.zeros((b, p_len), jnp.int32), suffix_att], axis=1)
    mask = make_att_2d_masks(pad, att)
    pos = jnp.broadcast_to(jnp.arange(p_len + s_len)[None], (b, p_len + s_len))

    out, _ = gemma_lib.prefill(params, x, mask, pos, cfg, policy, attention_impl)
    return out[:, p_len:]


def init(key, cfg: GemmaConfig, prompt_dim: int) -> cm.Params:
    from intact_tpu.models.gemma import _block_init

    if cfg.depth % 2:
        raise ValueError("self_cross expert needs an even layer count")
    n_pairs = cfg.depth // 2
    k_self, k_cross = jax.random.split(key)
    return {
        "pairs": {
            "self": cm.stack_layer_init(k_self, n_pairs, lambda k: _block_init(k, cfg)),
            "cross": cm.stack_layer_init(
                k_cross, n_pairs, lambda k: _cross_block_init(k, cfg, prompt_dim)
            ),
        },
        "final_norm": cm.rmsnorm_init(cfg.width),
    }


def prefill_prompt_kv(params: cm.Params, prompt: jnp.ndarray, cfg: GemmaConfig,
                      policy: DtypePolicy = DEFAULT_POLICY):
    """Prompt embeddings -> per-cross-layer K/V: ([Lp, B, P, KVH, hd], ...)."""
    b, p_len, _ = prompt.shape

    def per_layer(bp):
        k = cm.dense(bp["attn"]["k"], policy.cast(prompt), policy)
        v = cm.dense(bp["attn"]["v"], policy.cast(prompt), policy)
        shape = (b, p_len, cfg.num_kv_heads, cfg.head_dim)
        return k.reshape(shape), v.reshape(shape)

    return jax.vmap(per_layer)(params["pairs"]["cross"])


def forward(
    params: cm.Params,
    suffix: jnp.ndarray,  # [B, S, D]
    suffix_mask: jnp.ndarray,  # bool [B, S, S]
    positions: jnp.ndarray,  # int [B, S]
    cfg: GemmaConfig,
    prompt: jnp.ndarray | None = None,  # [B, P, prompt_dim]
    prompt_kv=None,  # cached (k, v) from prefill_prompt_kv
    policy: DtypePolicy = DEFAULT_POLICY,
    attention_impl: str = "xla",
) -> jnp.ndarray:
    """Run the alternating expert; exactly one of prompt / prompt_kv given."""
    if prompt_kv is None:
        prompt_kv = prefill_prompt_kv(params, prompt, cfg, policy)
    ck, cv = prompt_kv
    b, s, _ = suffix.shape
    scale = cfg.head_dim**-0.5

    def body(x, inputs):
        bp_self, bp_cross, k_cached, v_cached = inputs

        # self attention over the suffix (block mask + rope)
        y = cm.rms_norm(bp_self["ln1"], x, cfg.norm_eps)
        q, k, v = _qkv(bp_self, y, positions, cfg, policy)
        att = multi_head_attention(q, k, v, mask=suffix_mask, impl=attention_impl, scale=scale)
        x = _post_attention(bp_self, x, att, cfg, policy)

        # cross attention into the prompt (no rope, full attention)
        y = cm.rms_norm(bp_cross["ln1"], x, cfg.norm_eps)
        q = cm.dense(bp_cross["attn"]["q"], y, policy).reshape(
            b, s, cfg.num_heads, cfg.head_dim
        )
        att = multi_head_attention(
            q, k_cached.astype(q.dtype), v_cached.astype(q.dtype),
            mask=None, scale=scale,
        )
        x = _post_attention(bp_cross, x, att, cfg, policy)
        return x, None

    x, _ = jax.lax.scan(
        body, suffix, (params["pairs"]["self"], params["pairs"]["cross"], ck, cv)
    )
    return cm.rms_norm(params["final_norm"], x, cfg.norm_eps)
