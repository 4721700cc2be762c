"""MVLA: metaquery-based Pi0 research fork (PaliGemma + metaqueries ->
connector -> self/cross action expert)."""

from intact_tpu.models.mvla.config import MVLAConfig
from intact_tpu.models.mvla import model

__all__ = ["MVLAConfig", "model"]
