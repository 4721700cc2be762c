"""Functional layer library: dense / norm / embed / MLP + init helpers.

Everything here is dtype-policy aware: parameters live in fp32 (optimizer
master copy), compute happens in the policy's `compute_dtype` (bf16 on TPU so
matmuls hit the MXU at full rate), and norm statistics are taken in fp32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp

Params = dict  # nested dict pytree of jnp arrays


@dataclasses.dataclass(frozen=True)
class DtypePolicy:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16

    def cast(self, x):
        return x.astype(self.compute_dtype)


DEFAULT_POLICY = DtypePolicy()
SERVING_POLICY = DtypePolicy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def lecun_normal(key, shape, in_axis_size=None, dtype=jnp.float32):
    fan_in = in_axis_size if in_axis_size is not None else shape[0]
    return jax.random.normal(key, shape, dtype) * math.sqrt(1.0 / fan_in)


def dense_init(key, in_dim: int, out_dim: int, use_bias: bool = True, dtype=jnp.float32) -> Params:
    p = {"kernel": lecun_normal(key, (in_dim, out_dim), in_dim, dtype)}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def embed_init(key, vocab: int, dim: int, dtype=jnp.float32) -> Params:
    return {"embedding": jax.random.normal(key, (vocab, dim), dtype) * 0.02}


def rmsnorm_init(dim: int, dtype=jnp.float32) -> Params:
    # Gemma convention: weight stored as (scale), applied as x * (1 + scale)
    return {"scale": jnp.zeros((dim,), dtype)}


def layernorm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# ---------------------------------------------------------------------------
# apply functions
# ---------------------------------------------------------------------------

def dense(p: Params, x: jnp.ndarray, policy: DtypePolicy = DEFAULT_POLICY) -> jnp.ndarray:
    if "kernel_q" in p:
        return _dense_int8(p, x, policy)
    kernel = p["kernel"].astype(policy.compute_dtype)
    y = jnp.dot(x.astype(policy.compute_dtype), kernel)
    if "bias" in p:
        y = y + p["bias"].astype(policy.compute_dtype)
    return y


def _dense_int8(p: Params, x: jnp.ndarray, policy: DtypePolicy) -> jnp.ndarray:
    """W8A8 dynamic-quant matmul: int8 weights (per-output-channel scales)
    x int8 activations (per-token scales) on the int8 MXU (~2x bf16 on v5e),
    rescaled to compute dtype. Serving-only path (see quantize_dense).

    INTACT_TPU_PALLAS_INT8=1 opts into the fused Pallas kernel
    (ops/pallas_int8.w8a8_matmul: quantize + dot + rescale in one VMEM
    pipeline). Round-3 per-shape profiling (scripts/profile_int8_shapes.py)
    settled why it loses end to end (280 vs 510 policy steps/s): XLA
    quantizes x once over full K then K-tiles a plain int8 matmul, while
    the fused kernel re-fetches/re-quantizes x per N-block — HBM-bound at
    the gemma mlp (N=16384) and siglip-down (K=4304) shapes. XLA is the
    default; see the pallas_int8 module docstring for the measured table."""
    import os

    if (
        os.environ.get("INTACT_TPU_PALLAS_INT8")
        and jax.default_backend() == "tpu"
        and p["kernel_q"].ndim == 2
    ):
        from intact_tpu.ops.pallas_int8 import w8a8_matmul

        lead = x.shape[:-1]
        y = w8a8_matmul(
            x.reshape(-1, x.shape[-1]).astype(policy.compute_dtype),
            p["kernel_q"], p["kernel_scale"],
        ).reshape(*lead, -1)
        if "bias" in p:
            y = y + p["bias"].astype(policy.compute_dtype)
        return y

    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.round(x.astype(jnp.float32) / x_scale).astype(jnp.int8)
    yq = jax.lax.dot_general(
        xq, p["kernel_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = yq.astype(jnp.float32) * x_scale * p["kernel_scale"].astype(jnp.float32)
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(policy.compute_dtype)


def quantize_dense(p: Params) -> Params:
    """fp kernel [..., in, out] -> int8 kernel + per-output-channel scale
    (leading stacked-layer axes keep per-(layer, out) scales)."""
    kernel = jnp.asarray(p["kernel"], jnp.float32)
    scale = jnp.max(jnp.abs(kernel), axis=-2, keepdims=True) / 127.0  # [..., 1, out]
    scale = jnp.maximum(scale, 1e-12)
    kq = jnp.round(kernel / scale).astype(jnp.int8)
    out = {"kernel_q": kq, "kernel_scale": jnp.squeeze(scale, axis=-2)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


# the default int8 coverage: every kernel under a "blocks" subtree plus the
# multimodal projector AND the AR unembedding (`lm_head`) — norms stay fp.
# Shared with the bench's streamed init so benched int8 matches production
# int8. transformer-block matmuls: scanned `blocks/` stacks AND the mvla
# expert's scanned self/cross pair stacks (`expert/pairs/{self,cross}/...`)
# — the Euler-loop hot path; excluding pairs would silently serve the
# expert fp. lm_head/tied-embed coverage: one greedy-decode step streams
# the whole unembedding (Magma lm_head 1.05 GB bf16, Gemma2 tied table
# 1.18 GB) — at decode batch sizes that is the single largest per-token
# HBM read after the trunk.
QUANTIZE_DEFAULT_PATTERN = (
    r".*((blocks|pairs/(self|cross))/(attn|mlp)/[a-z0-9_]+|img_proj|lm_head)$"
)

# AR-family tied embeddings ("lm/embed"): quantized to int8 rows so the
# tied unembed logits matmul streams 1 byte/weight. Scoped to LM trunks
# that greedy-decode (spatialvla/magma serve path); pi0's vlm_embed is a
# training-path table and stays fp.
UNEMBED_QUANT_PATTERN = r".*lm/embed$"


def quantize_embed(p: Params) -> Params:
    """Embedding table [V, D] -> int8 rows + per-row scale.

    Serves both directions: `embed_lookup` gathers+rescales B rows (cheap,
    exact per-row relative error <= 1/254), and `unembed_logits` runs the
    tied unembedding as a W8A8 int8 matmul streaming 1 byte/weight."""
    emb = jnp.asarray(p["embedding"], jnp.float32)
    scale = jnp.max(jnp.abs(emb), axis=-1, keepdims=True) / 127.0  # [V, 1]
    scale = jnp.maximum(scale, 1e-12)
    return {
        "embedding_q": jnp.round(emb / scale).astype(jnp.int8),
        "embed_scale": jnp.squeeze(scale, axis=-1),  # [V]
    }


def unembed_logits(p: Params, hidden: jnp.ndarray,
                   policy: "DtypePolicy" = None) -> jnp.ndarray:
    """Tied unembedding: hidden [..., D] x embed [V, D]^T -> f32 [..., V].

    Quantized tables take the W8A8 path (per-token activation scales x
    per-vocab-row weight scales on the int8 MXU)."""
    policy = policy or DEFAULT_POLICY
    if "embedding_q" not in p:
        emb = p["embedding"].astype(policy.compute_dtype)
        return jnp.dot(hidden.astype(policy.compute_dtype),
                       emb.T).astype(jnp.float32)
    amax = jnp.max(jnp.abs(hidden.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    x_scale = jnp.maximum(amax, 1e-6) / 127.0
    xq = jnp.round(hidden.astype(jnp.float32) / x_scale).astype(jnp.int8)
    yq = jax.lax.dot_general(
        xq, p["embedding_q"],
        dimension_numbers=(((hidden.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (yq.astype(jnp.float32) * x_scale
            * p["embed_scale"].astype(jnp.float32))


def quantize_params(params: Params, path_filter=None) -> Params:
    """Quantize the FLOP-heavy kernels (transformer block matmuls) to int8.

    path_filter(path_str) -> bool selects which dense params quantize;
    default: QUANTIZE_DEFAULT_PATTERN.
    """
    import re

    default = re.compile(QUANTIZE_DEFAULT_PATTERN)
    embed_re = re.compile(UNEMBED_QUANT_PATTERN)

    def walk(node, path=""):
        if isinstance(node, dict):
            if "kernel" in node and (
                path_filter(path) if path_filter else default.match(path)
            ):
                return quantize_dense(node)
            if "embedding" in node and path_filter is None \
                    and embed_re.match(path):
                return quantize_embed(node)
            return {k: walk(v, f"{path}/{k}" if path else k) for k, v in node.items()}
        return node

    return walk(params)


def quantize_frozen(params: Params, trainable_mask) -> Params:
    """Quantize the FLOP-heavy kernels of FROZEN dense nodes to int8.

    trainable_mask: bool pytree like params (True = trainable). A dense
    node quantizes only if it matches QUANTIZE_DEFAULT_PATTERN AND every
    leaf under it is frozen — trainable kernels always stay float. Used by
    the trainer's quantize_frozen_int8 expert-only fine-tune mode: the
    frozen tower's forward (prefill) rides the int8 MXU while the
    trainable expert keeps fp32 masters.
    """
    import re

    default = re.compile(QUANTIZE_DEFAULT_PATTERN)

    def walk(node, mask_node, path=""):
        if isinstance(node, dict):
            if "kernel" in node and default.match(path):
                if not any(jax.tree.leaves(mask_node)):  # fully frozen
                    return quantize_dense(node)
                return node
            return {
                k: walk(v, mask_node[k], f"{path}/{k}" if path else k)
                for k, v in node.items()
            }
        return node

    return walk(params, trainable_mask)


def streamed_quantized_init(
    init_fn: Callable[[Any], Params],
    key,
    policy: DtypePolicy = SERVING_POLICY,
    path_filter=None,
    shardings=None,
    template=None,
) -> Params:
    """Random-init a model's params directly in serving-int8 form, one leaf
    at a time on the device. Quantizable kernels (the quantize_params
    default filter) become {kernel_q, kernel_scale}; everything else is
    param-dtype.

    template: optional precomputed ``jax.eval_shape(init_fn, key)`` — callers
    that already traced the init for shardings pass it in so the full model
    isn't abstractly traced twice (seconds of host time on an 8B graph).

    Why streamed: quantizing inside one jit peaks at fp + int8 of the whole
    model simultaneously (26 GB for Magma-8B -> ResourceExhausted on a
    16 GB v5e). Leaf-at-a-time, the fp intermediate only ever exists for
    one stacked kernel beside the accumulating int8 tree.

    shardings: optional matching tree (over the QUANTIZED structure) of
    NamedSharding — each finished leaf is placed on its sharding, so a
    sharded int8 tree never materializes replicated first.
    """
    import functools

    if template is None:
        template = jax.eval_shape(init_fn, key)
    counter = [0]

    # single jitted helpers with static shape args: leaves sharing a shape
    # reuse ONE compiled program (per-leaf lambdas would recompile every
    # leaf — ~60 cold remote compiles over the tunnel)
    @functools.partial(jax.jit, static_argnums=(1, 2))
    def _rand_leaf(k, shape, dtype):
        return (jax.random.normal(k, shape, jnp.bfloat16) * 0.02).astype(dtype)

    @functools.partial(jax.jit, static_argnums=(1,))
    def _rand_quant(k, shape):
        return quantize_dense(
            {"kernel": jax.random.normal(k, shape, jnp.bfloat16) * 0.02}
        )

    @functools.partial(jax.jit, static_argnums=(1,))
    def _rand_embed(k, shape):
        return quantize_embed(
            {"embedding": jax.random.normal(k, shape, jnp.bfloat16) * 0.02}
        )

    def _next_key():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def make_dense(node):
        out = dict(_rand_quant(_next_key(), tuple(node["kernel"].shape)))
        if "bias" in node:
            out["bias"] = jnp.zeros(node["bias"].shape, policy.param_dtype)
        return out

    def make_embed(node):
        return dict(_rand_embed(_next_key(), tuple(node["embedding"].shape)))

    def make_leaf(node):
        return _rand_leaf(
            _next_key(), tuple(node.shape), jnp.dtype(policy.param_dtype)
        )

    return _streamed_tree(template, make_dense, make_leaf, path_filter,
                          shardings, make_embed=make_embed)


def quantize_host_tree(
    raw: Params,
    policy: DtypePolicy = SERVING_POLICY,
    path_filter=None,
    shardings=None,
) -> Params:
    """Host (numpy) param tree -> device tree in serving-int8 form, one leaf
    at a time: peak device memory = the final int8 tree + ONE fp kernel.

    This is the checkpoint-load path for models whose fp weights exceed the
    device HBM (Magma-8B: 17.8 GB bf16 on a 16 GB v5e) — restoring the
    whole fp tree on device and then quantizing (pi0/policy.load) would OOM
    before the int8 copy exists. shardings: optional matching tree over the
    QUANTIZED structure.
    """
    quant = jax.jit(lambda k: quantize_dense({"kernel": k}))
    quant_emb = jax.jit(lambda e: quantize_embed({"embedding": e}))

    def make_dense(node):
        out = dict(quant(jnp.asarray(node["kernel"], policy.compute_dtype)))
        if "bias" in node:
            out["bias"] = jnp.asarray(node["bias"], policy.param_dtype)
        return out

    def make_embed(node):
        return dict(quant_emb(
            jnp.asarray(node["embedding"], policy.compute_dtype)))

    def make_leaf(node):
        # stays a HOST array: _place device_puts it straight onto its
        # sharding, so each device receives only its slice — jnp.asarray
        # here would first materialize the whole leaf on device 0 (e.g.
        # Magma's ~1 GB vocab embedding), spiking the HBM this streamed
        # path exists to protect
        import numpy as np

        return np.asarray(node).astype(policy.param_dtype, copy=False)

    return _streamed_tree(raw, make_dense, make_leaf, path_filter, shardings,
                          make_embed=make_embed)


def _streamed_tree(tree, make_dense, make_leaf, path_filter, shardings,
                   make_embed=None):
    """Shared walker behind streamed_quantized_init / quantize_host_tree.

    Walks `tree` leaf by leaf: dense nodes matching the quantize filter are
    replaced wholesale by make_dense(node) (-> {kernel_q, kernel_scale[,
    bias]}), AR tied-embed nodes (UNEMBED_QUANT_PATTERN) by
    make_embed(node) (-> {embedding_q, embed_scale}), every other leaf by
    make_leaf(leaf); each produced array is placed on its sharding (a tree
    over the QUANTIZED structure) immediately, so at most one unplaced
    leaf exists at a time.
    """
    import re

    default = re.compile(QUANTIZE_DEFAULT_PATTERN)
    embed_re = re.compile(UNEMBED_QUANT_PATTERN)
    match = path_filter or default.match

    def _place(leaf, shard):
        # no sharding -> default-device placement (keeps unsharded loads
        # producing device arrays even when make_leaf hands back host numpy)
        return jax.device_put(leaf, shard) if shard is not None else jnp.asarray(leaf)

    def walk(node, shard_node, path=""):
        if isinstance(node, dict):
            if "kernel" in node and match(path):
                return {
                    name: _place(leaf, shard_node[name] if shard_node else None)
                    for name, leaf in make_dense(node).items()
                }
            if "embedding" in node and path_filter is None \
                    and make_embed is not None and embed_re.match(path):
                return {
                    name: _place(leaf, shard_node[name] if shard_node else None)
                    for name, leaf in make_embed(node).items()
                }
            return {
                k: walk(v, shard_node[k] if shard_node else None,
                        f"{path}/{k}" if path else k)
                for k, v in node.items()
            }
        return _place(make_leaf(node), shard_node)

    return walk(tree, shardings)


def embed_lookup(p: Params, ids: jnp.ndarray, policy: DtypePolicy = DEFAULT_POLICY) -> jnp.ndarray:
    # mode="clip": jnp.take's default out-of-bounds fill is NaN, which turns a
    # tokenizer/vocab mismatch into silent NaN loss — clip instead
    if "embedding_q" in p:  # int8 rows + per-row scale (quantize_embed)
        rows = jnp.take(p["embedding_q"], ids, axis=0, mode="clip")
        scale = jnp.take(p["embed_scale"], ids, axis=0, mode="clip")
        return (rows.astype(jnp.float32)
                * scale[..., None]).astype(policy.compute_dtype)
    return jnp.take(p["embedding"], ids, axis=0, mode="clip").astype(policy.compute_dtype)


def rms_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Gemma RMSNorm: fp32 statistics, (1 + scale) gain, cast back."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    y = y * (1.0 + p["scale"].astype(jnp.float32))
    return y.astype(dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def gelu_mlp(p: Params, x: jnp.ndarray, policy: DtypePolicy = DEFAULT_POLICY) -> jnp.ndarray:
    """ViT MLP: dense -> gelu(tanh) -> dense."""
    h = dense(p["fc1"], x, policy)
    h = jax.nn.gelu(h, approximate=True)
    return dense(p["fc2"], h, policy)


def gemma_mlp(p: Params, x: jnp.ndarray, policy: DtypePolicy = DEFAULT_POLICY) -> jnp.ndarray:
    """Gemma gated MLP: gelu(gate(x)) * up(x) -> down."""
    gate = jax.nn.gelu(dense(p["gate"], x, policy), approximate=True)
    up = dense(p["up"], x, policy)
    return dense(p["down"], gate * up, policy)


def sinusoidal_embedding(
    time: jnp.ndarray, dim: int, min_period: float, max_period: float
) -> jnp.ndarray:
    """Scalar positions [B] -> [B, dim] sine-cosine features.

    Matches the Pi0 time embedding (reference modeling_mvla.py:71-90):
    geometric period spacing from min_period to max_period, computed in fp32.
    """
    if dim % 2 != 0:
        raise ValueError(f"dimension ({dim}) must be divisible by 2")
    fraction = jnp.linspace(0.0, 1.0, dim // 2, dtype=jnp.float32)
    period = min_period * (max_period / min_period) ** fraction
    angle = (2 * jnp.pi / period)[None, :] * time.astype(jnp.float32)[:, None]
    return jnp.concatenate([jnp.sin(angle), jnp.cos(angle)], axis=-1)


# ---------------------------------------------------------------------------
# stacked-layer helpers
# ---------------------------------------------------------------------------

def stack_layer_init(key, num_layers: int, init_one: Callable[[Any], Params]) -> Params:
    """Initialize `num_layers` identical blocks with stacked leaves
    (leading layer axis) — the layout `jax.lax.scan` consumes."""
    keys = jax.random.split(key, num_layers)
    return jax.vmap(init_one)(keys)


def tree_size(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


def tree_bytes(params: Params) -> int:
    return sum(int(p.size * p.dtype.itemsize) for p in jax.tree.leaves(params))
