"""Octo: transformer policy with diffusion action head (native JAX/TPU)."""

from intact_tpu.models.octo.config import OctoConfig
from intact_tpu.models.octo import model

__all__ = ["OctoConfig", "model"]
