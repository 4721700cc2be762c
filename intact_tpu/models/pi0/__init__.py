"""Pi0: flow-matching VLA (PaliGemma-3B VLM + Gemma action expert)."""

from intact_tpu.models.pi0.config import Pi0Config
from intact_tpu.models.pi0 import model

__all__ = ["Pi0Config", "model"]
