"""Pi0FAST: autoregressive action-token Pi0 (PaliGemma decodes discretized
action tokens instead of running a flow-matching expert)."""

from intact_tpu.models.pi0fast.config import Pi0FASTConfig
from intact_tpu.models.pi0fast import model

__all__ = ["Pi0FASTConfig", "model"]
