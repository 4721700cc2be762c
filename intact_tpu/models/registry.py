"""Model registry: type string -> (config factory, module).

Mirrors the reference CLI factory maps (`src/agent/run.py:24-56`
model_map/trainer_map/policy_wrapper_map) as a single registry keyed by the
model `type` field in config JSONs.
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, dict] = {}


def register(name: str, **entries) -> None:
    _REGISTRY[name] = entries


def get(name: str) -> dict:
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown model type {name!r}; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name]


def available() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtin() -> None:
    from intact_tpu.models.mvla.config import MVLAConfig
    from intact_tpu.models.octo.config import OctoConfig
    from intact_tpu.models.pi0.config import Pi0Config

    from intact_tpu.models.pi0fast.config import Pi0FASTConfig

    register(
        "pi0fast",
        config_cls=Pi0FASTConfig,
        default_config=Pi0FASTConfig.bridge,
        module="intact_tpu.models.pi0fast.model",
        policy="intact_tpu.models.pi0.policy.Pi0Policy",
    )
    register(
        "pi0fast_tiny",
        config_cls=Pi0FASTConfig,
        default_config=Pi0FASTConfig.tiny,
        module="intact_tpu.models.pi0fast.model",
        policy="intact_tpu.models.pi0.policy.Pi0Policy",
    )
    register(
        "octo",
        config_cls=OctoConfig,
        default_config=OctoConfig.small,
        module="intact_tpu.models.octo.model",
        policy="intact_tpu.serve.policy_wrapper.OctoPolicyWrapper",
    )
    register(
        "octo_tiny",
        config_cls=OctoConfig,
        default_config=OctoConfig.tiny,
        module="intact_tpu.models.octo.model",
        policy="intact_tpu.serve.policy_wrapper.OctoPolicyWrapper",
    )
    # released-checkpoint serving path (rail-berkeley/octo-{small,base}):
    # upstream architecture + weight import, models/octo/upstream.py
    from intact_tpu.models.octo.upstream import (
        OctoUpstreamConfig,
        octo_base,
        octo_small,
    )

    register(
        "octo_small_upstream",
        config_cls=OctoUpstreamConfig,
        default_config=octo_small,
        module="intact_tpu.models.octo.upstream",
        policy="intact_tpu.serve.policy_wrapper.OctoPolicyWrapper",
    )
    register(
        "octo_base_upstream",
        config_cls=OctoUpstreamConfig,
        default_config=octo_base,
        module="intact_tpu.models.octo.upstream",
        policy="intact_tpu.serve.policy_wrapper.OctoPolicyWrapper",
    )

    register(
        "mvla",
        config_cls=MVLAConfig,
        default_config=MVLAConfig,
        module="intact_tpu.models.mvla.model",
        policy="intact_tpu.models.pi0.policy.Pi0Policy",
    )
    import dataclasses as _dc

    register(
        "mmmvla",
        config_cls=MVLAConfig,
        default_config=lambda: _dc.replace(MVLAConfig(), alternate_pattern="joint"),
        module="intact_tpu.models.mvla.model",
        policy="intact_tpu.models.pi0.policy.Pi0Policy",
    )
    register(
        "mmmvla_tiny",
        config_cls=MVLAConfig,
        default_config=lambda: _dc.replace(MVLAConfig.tiny(), alternate_pattern="joint"),
        module="intact_tpu.models.mvla.model",
        policy="intact_tpu.models.pi0.policy.Pi0Policy",
    )
    register(
        "mvla_tiny",
        config_cls=MVLAConfig,
        default_config=MVLAConfig.tiny,
        module="intact_tpu.models.mvla.model",
        policy="intact_tpu.models.pi0.policy.Pi0Policy",
    )

    # native SpatialVLA-4B (SigLIP + Ego3D PE + Gemma2, HF-checkpoint import)
    from intact_tpu.models.spatialvla import SpatialVLAConfig

    register(
        "spatialvla_native",
        config_cls=SpatialVLAConfig,
        default_config=SpatialVLAConfig.spatialvla_4b,
        module="intact_tpu.models.spatialvla.model",
        policy="intact_tpu.serve.policy_wrapper.SpatialVLANativePolicyWrapper",
    )
    register(
        "spatialvla_native_tiny",
        config_cls=SpatialVLAConfig,
        default_config=SpatialVLAConfig.tiny,
        module="intact_tpu.models.spatialvla.model",
        policy="intact_tpu.serve.policy_wrapper.SpatialVLANativePolicyWrapper",
    )

    # native Magma-8B (ConvNeXt-XXLarge + LLaMA-3-8B, HF-checkpoint import)
    from intact_tpu.models.magma import MagmaConfig

    register(
        "magma_native",
        config_cls=MagmaConfig,
        default_config=MagmaConfig.magma_8b,
        module="intact_tpu.models.magma.model",
        policy="intact_tpu.serve.policy_wrapper.MagmaNativePolicyWrapper",
    )
    register(
        "magma_native_tiny",
        config_cls=MagmaConfig,
        default_config=MagmaConfig.tiny,
        module="intact_tpu.models.magma.model",
        policy="intact_tpu.serve.policy_wrapper.MagmaNativePolicyWrapper",
    )

    register(
        "pi0",
        config_cls=Pi0Config,
        default_config=Pi0Config.bridge,
        module="intact_tpu.models.pi0.model",
        policy="intact_tpu.models.pi0.policy.Pi0Policy",
    )
    # smoke-test operating point (tiny widths, CPU-friendly)
    register(
        "pi0_tiny",
        config_cls=Pi0Config,
        default_config=Pi0Config.tiny,
        module="intact_tpu.models.pi0.model",
        policy="intact_tpu.models.pi0.policy.Pi0Policy",
    )


_register_builtin()
