"""T5 encoder (v1.0, t5-base family) in functional JAX.

Octo's released checkpoints condition on a frozen HF `t5-base` encoder
(reference serving path `src/experiments/policies/policy_wrapper.py:356-371`
loads `hf://rail-berkeley/octo-small` whose task tokenizer wraps t5-base).
This module reimplements that encoder TPU-side so converted Octo weights
get the exact language embedding they were trained with.

T5 conventions this pins (each verified against transformers
T5EncoderModel in tests/test_hf_parity_t5.py):
  * T5LayerNorm: x * rsqrt(mean(x^2) + eps) * w — no mean subtraction, no
    (1 + w) shift, fp32 statistics;
  * attention WITHOUT 1/sqrt(d) scaling (folded into init at training);
  * learned relative position bias, bucketed (bidirectional, 32 buckets,
    max distance 128), shared from layer 0 across all layers;
  * pre-norm residual blocks, ReLU feed-forward (v1.0 DenseReluDense).

`init` builds a random tree with the same pytree layout that
`from_hf_state_dict` fills from a torch T5 checkpoint.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32_128
    d_model: int = 768
    d_kv: int = 64
    d_ff: int = 3072
    num_heads: int = 12
    num_layers: int = 12
    rel_buckets: int = 32
    rel_max_distance: int = 128
    norm_eps: float = 1e-6


def t5_base() -> T5Config:
    return T5Config()


def tiny_test_config() -> T5Config:
    return T5Config(vocab_size=99, d_model=32, d_kv=8, d_ff=64,
                    num_heads=4, num_layers=2)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _block_init(key, cfg: T5Config) -> cm.Params:
    ks = jax.random.split(key, 6)
    d, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
    return {
        "ln1": {"scale": jnp.ones((d,), jnp.float32)},
        "attn": {
            "q": cm.dense_init(ks[0], d, inner, use_bias=False),
            "k": cm.dense_init(ks[1], d, inner, use_bias=False),
            "v": cm.dense_init(ks[2], d, inner, use_bias=False),
            "o": cm.dense_init(ks[3], inner, d, use_bias=False),
        },
        "ln2": {"scale": jnp.ones((d,), jnp.float32)},
        "mlp": {
            "wi": cm.dense_init(ks[4], d, cfg.d_ff, use_bias=False),
            "wo": cm.dense_init(ks[5], cfg.d_ff, d, use_bias=False),
        },
    }


def init(key, cfg: T5Config) -> cm.Params:
    ks = jax.random.split(key, 3)
    return {
        "embed": cm.embed_init(ks[0], cfg.vocab_size, cfg.d_model),
        "rel_bias": jax.random.normal(
            ks[1], (cfg.rel_buckets, cfg.num_heads), jnp.float32
        ) * 0.02,
        "blocks": cm.stack_layer_init(ks[2], cfg.num_layers,
                                      lambda k: _block_init(k, cfg)),
        "final_norm": {"scale": jnp.ones((cfg.d_model,), jnp.float32)},
    }


# ---------------------------------------------------------------------------
# pieces
# ---------------------------------------------------------------------------

def t5_layer_norm(p: cm.Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)).astype(dtype)


def relative_position_bucket(relative_position: jnp.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jnp.ndarray:
    """Bidirectional bucketing (HF T5Attention._relative_position_bucket)."""
    num_buckets //= 2
    buckets = (relative_position > 0).astype(jnp.int32) * num_buckets
    rp = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    large = max_exact + (
        jnp.log(rp.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, num_buckets - 1)
    return buckets + jnp.where(is_small, rp, large)


def _position_bias(params, q_len: int, k_len: int, cfg: T5Config) -> jnp.ndarray:
    """-> [1, heads, q_len, k_len] learned relative-position bias."""
    ctx = jnp.arange(q_len)[:, None]
    mem = jnp.arange(k_len)[None, :]
    buckets = relative_position_bucket(
        mem - ctx, cfg.rel_buckets, cfg.rel_max_distance
    )
    bias = jnp.take(params["rel_bias"], buckets, axis=0)  # [q, k, heads]
    return bias.transpose(2, 0, 1)[None]


def encode(
    params: cm.Params,
    tokens: jnp.ndarray,  # int32 [B, L]
    mask: jnp.ndarray,  # bool [B, L]
    cfg: T5Config,
    policy: DtypePolicy = DEFAULT_POLICY,
) -> jnp.ndarray:
    """-> [B, L, d_model] final-normed encoder states (compute dtype)."""
    b, n = tokens.shape
    h, dk = cfg.num_heads, cfg.d_kv
    x = cm.embed_lookup(params["embed"], tokens, policy)  # NO sqrt(d) scaling

    pos_bias = _position_bias(params, n, n, cfg).astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    key_mask = jnp.where(mask[:, None, None, :], 0.0, neg)  # [B,1,1,L]
    bias = pos_bias + key_mask  # [B, H, L, L]

    def body(xc, bp):
        y = t5_layer_norm(bp["ln1"], xc, cfg.norm_eps)
        q = cm.dense(bp["attn"]["q"], y, policy).reshape(b, n, h, dk)
        k = cm.dense(bp["attn"]["k"], y, policy).reshape(b, n, h, dk)
        v = cm.dense(bp["attn"]["v"], y, policy).reshape(b, n, h, dk)
        # T5: unscaled dot product + additive bias, softmax in fp32
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) + bias
        att = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, n, h * dk)
        xc = xc + cm.dense(bp["attn"]["o"], out, policy)

        y = t5_layer_norm(bp["ln2"], xc, cfg.norm_eps)
        ff = cm.dense(bp["mlp"]["wi"], y, policy)
        ff = jax.nn.relu(ff)
        xc = xc + cm.dense(bp["mlp"]["wo"], ff, policy)
        return xc, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return t5_layer_norm(params["final_norm"], x, cfg.norm_eps)


# ---------------------------------------------------------------------------
# HF torch checkpoint -> params
# ---------------------------------------------------------------------------

def _embed_weight(sd: dict, prefix: str):
    """Shared-or-scoped embedding weight; raises naming BOTH candidate keys
    (sd.get chaining would hand np.asarray(None) to the caller and fail
    later as an opaque dtype error)."""
    for key in ("shared.weight", prefix + ".embed_tokens.weight"):
        if key in sd:
            return sd[key]
    raise KeyError(
        f"T5 state dict has neither 'shared.weight' nor "
        f"'{prefix}.embed_tokens.weight'"
    )


def from_hf_state_dict(sd: dict, cfg: T5Config, prefix: str = "encoder") -> cm.Params:
    """Flat torch state dict (T5EncoderModel naming) -> param tree.
    Linear weights [out, in] transpose to kernels [in, out]."""

    def t(name):
        return np.asarray(sd[name]).T.copy()

    def stack(fmt, transform=np.asarray):
        return np.stack([transform(fmt.format(i=i)) for i in range(cfg.num_layers)])

    f = prefix + ".block.{i}.layer."
    return {
        "embed": {"embedding": np.asarray(_embed_weight(sd, prefix))},
        "rel_bias": np.asarray(
            sd[prefix + ".block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        ),
        "blocks": {
            "ln1": {"scale": stack(f + "0.layer_norm.weight",
                                   lambda n: np.asarray(sd[n]))},
            "attn": {
                "q": {"kernel": stack(f + "0.SelfAttention.q.weight", t)},
                "k": {"kernel": stack(f + "0.SelfAttention.k.weight", t)},
                "v": {"kernel": stack(f + "0.SelfAttention.v.weight", t)},
                "o": {"kernel": stack(f + "0.SelfAttention.o.weight", t)},
            },
            "ln2": {"scale": stack(f + "1.layer_norm.weight",
                                   lambda n: np.asarray(sd[n]))},
            "mlp": {
                "wi": {"kernel": stack(f + "1.DenseReluDense.wi.weight", t)},
                "wo": {"kernel": stack(f + "1.DenseReluDense.wo.weight", t)},
            },
        },
        "final_norm": {"scale": np.asarray(sd[prefix + ".final_layer_norm.weight"])},
    }
