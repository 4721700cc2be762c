"""ConvNeXt vision tower in functional JAX (Magma-8B's image encoder family).

Magma-8B pairs a CLIP-ConvNeXt vision backbone with a LLaMA-3 language
model; the reference serves the whole thing through HF trust_remote_code
(`policy_wrapper.py:282-293`). With models/llama.py covering the LM, this
module covers the vision side natively so converted Magma weights run both
towers on TPU (the remaining prompt/token glue is upstream-specific).

Layout: channels-last NHWC throughout (TPU conv-friendly); blocks run under
lax.scan per stage (stacked leaves). Conventions pinned against
transformers ConvNextModel (tests/test_hf_parity_convnext.py):
  * stem: 4x4/4 conv + channels-last LayerNorm;
  * block: 7x7 depthwise conv -> LN -> 4x pointwise -> GELU -> pointwise
    -> layer-scale gamma -> residual;
  * stage transitions: LN + 2x2/2 conv downsample;
  * pooled output: LN(global mean).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from intact_tpu.models import common as cm
from intact_tpu.models.common import DEFAULT_POLICY, DtypePolicy


@dataclasses.dataclass(frozen=True)
class ConvNeXtConfig:
    depths: tuple = (3, 3, 9, 3)
    dims: tuple = (96, 192, 384, 768)
    patch_size: int = 4
    kernel: int = 7
    norm_eps: float = 1e-6
    layer_scale_init: float = 1e-6


def convnext_tiny() -> ConvNeXtConfig:
    return ConvNeXtConfig()


def convnext_xxlarge() -> ConvNeXtConfig:
    """CLIP-ConvNeXt-XXLarge (Magma-8B operating point)."""
    return ConvNeXtConfig(depths=(3, 4, 30, 3), dims=(384, 768, 1536, 3072))


def tiny_test_config() -> ConvNeXtConfig:
    return ConvNeXtConfig(depths=(2, 2), dims=(8, 16))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _block_init(key, dim: int, cfg: ConvNeXtConfig) -> cm.Params:
    ks = jax.random.split(key, 3)
    k = cfg.kernel
    return {
        "dwconv": {
            "kernel": cm.lecun_normal(ks[0], (k, k, 1, dim), in_axis_size=k * k),
            "bias": jnp.zeros((dim,), jnp.float32),
        },
        "ln": cm.layernorm_init(dim),
        "pw1": cm.dense_init(ks[1], dim, 4 * dim),
        "pw2": cm.dense_init(ks[2], 4 * dim, dim),
        "gamma": jnp.full((dim,), cfg.layer_scale_init, jnp.float32),
    }


def init(key, cfg: ConvNeXtConfig, in_channels: int = 3) -> cm.Params:
    n_stage = len(cfg.depths)
    ks = jax.random.split(key, 2 * n_stage + 2)
    p = cfg.patch_size
    params: cm.Params = {
        "stem": {
            "kernel": cm.lecun_normal(
                ks[0], (p, p, in_channels, cfg.dims[0]),
                in_axis_size=p * p * in_channels,
            ),
            "bias": jnp.zeros((cfg.dims[0],), jnp.float32),
        },
        "stem_ln": cm.layernorm_init(cfg.dims[0]),
        "final_ln": cm.layernorm_init(cfg.dims[-1]),
    }
    for i, (depth, dim) in enumerate(zip(cfg.depths, cfg.dims)):
        params[f"stage_{i}"] = cm.stack_layer_init(
            ks[1 + i], depth, lambda k, d=dim: _block_init(k, d, cfg)
        )
        if i > 0:
            params[f"down_{i}"] = {
                "ln": cm.layernorm_init(cfg.dims[i - 1]),
                "conv": {
                    "kernel": cm.lecun_normal(
                        ks[n_stage + i], (2, 2, cfg.dims[i - 1], dim),
                        in_axis_size=4 * cfg.dims[i - 1],
                    ),
                    "bias": jnp.zeros((dim,), jnp.float32),
                },
            }
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _conv(p, x, stride: int, policy, groups: int = 1, padding="VALID"):
    return jax.lax.conv_general_dilated(
        x, policy.cast(p["kernel"]),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ) + policy.cast(p["bias"])


def _block_apply(cfg: ConvNeXtConfig, policy: DtypePolicy, x, bp):
    dim = x.shape[-1]
    pad = cfg.kernel // 2
    h = _conv(bp["dwconv"], x, 1, policy, groups=dim,
              padding=[(pad, pad), (pad, pad)])
    h = cm.layer_norm(bp["ln"], h, cfg.norm_eps)
    h = cm.dense(bp["pw1"], h, policy)
    h = jax.nn.gelu(h, approximate=False)  # HF ConvNeXt uses exact gelu
    h = cm.dense(bp["pw2"], h, policy)
    return x + policy.cast(bp["gamma"]) * h


def encode(params: cm.Params, images: jnp.ndarray, cfg: ConvNeXtConfig,
           policy: DtypePolicy = DEFAULT_POLICY):
    """images [B, H, W, 3] (preprocessed floats) ->
    (features [B, H', W', dims[-1]], pooled [B, dims[-1]])."""
    x = policy.cast(images)
    x = _conv(params["stem"], x, cfg.patch_size, policy)
    x = cm.layer_norm(params["stem_ln"], x, cfg.norm_eps)

    for i in range(len(cfg.depths)):
        if i > 0:
            d = params[f"down_{i}"]
            x = cm.layer_norm(d["ln"], x, cfg.norm_eps)
            x = _conv(d["conv"], x, 2, policy)

        def body(carry, bp):
            return _block_apply(cfg, policy, carry, bp), None

        x, _ = jax.lax.scan(body, x, params[f"stage_{i}"])

    pooled = cm.layer_norm(params["final_ln"], x.mean(axis=(1, 2)), cfg.norm_eps)
    return x, pooled


# ---------------------------------------------------------------------------
# HF torch checkpoint -> params
# ---------------------------------------------------------------------------

def from_hf_state_dict(sd: dict, cfg: ConvNeXtConfig,
                       prefix: str = "convnext") -> cm.Params:
    """transformers ConvNextModel naming -> param tree.
    conv kernels [out, in, kh, kw] -> [kh, kw, in, out]; depthwise
    [dim, 1, k, k] -> [k, k, 1, dim]."""
    prefix = prefix + "." if prefix else ""

    def conv(name):
        return np.asarray(sd[name]).transpose(2, 3, 1, 0).copy()

    def stack(stage, field, transform):
        return np.stack([
            transform(f"{prefix}encoder.stages.{stage}.layers.{{i}}.{field}".format(i=i))
            for i in range(cfg.depths[stage])
        ])

    params: cm.Params = {
        "stem": {
            "kernel": conv(prefix + "embeddings.patch_embeddings.weight"),
            "bias": np.asarray(sd[prefix + "embeddings.patch_embeddings.bias"]),
        },
        "stem_ln": {
            "scale": np.asarray(sd[prefix + "embeddings.layernorm.weight"]),
            "bias": np.asarray(sd[prefix + "embeddings.layernorm.bias"]),
        },
        "final_ln": {
            "scale": np.asarray(sd[prefix + "layernorm.weight"]),
            "bias": np.asarray(sd[prefix + "layernorm.bias"]),
        },
    }
    for i in range(len(cfg.depths)):
        params[f"stage_{i}"] = {
            "dwconv": {
                "kernel": stack(i, "dwconv.weight", conv),
                "bias": stack(i, "dwconv.bias", lambda n: np.asarray(sd[n])),
            },
            "ln": {"scale": stack(i, "layernorm.weight", lambda n: np.asarray(sd[n])),
                   "bias": stack(i, "layernorm.bias", lambda n: np.asarray(sd[n]))},
            "pw1": {"kernel": stack(i, "pwconv1.weight", lambda n: np.asarray(sd[n]).T.copy()),
                    "bias": stack(i, "pwconv1.bias", lambda n: np.asarray(sd[n]))},
            "pw2": {"kernel": stack(i, "pwconv2.weight", lambda n: np.asarray(sd[n]).T.copy()),
                    "bias": stack(i, "pwconv2.bias", lambda n: np.asarray(sd[n]))},
            "gamma": stack(i, "layer_scale_parameter", lambda n: np.asarray(sd[n])),
        }
        if i > 0:
            base = f"{prefix}encoder.stages.{i}.downsampling_layer"
            params[f"down_{i}"] = {
                "ln": {"scale": np.asarray(sd[base + ".0.weight"]),
                       "bias": np.asarray(sd[base + ".0.bias"])},
                "conv": {"kernel": conv(base + ".1.weight"),
                         "bias": np.asarray(sd[base + ".1.bias"])},
            }
    return params
