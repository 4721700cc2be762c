"""TPU compute ops: attention (XLA + Pallas flash), RoPE, block masks."""

from intact_tpu.ops.masks import make_att_2d_masks
from intact_tpu.ops.rope import apply_rope
from intact_tpu.ops.attention import multi_head_attention

__all__ = ["make_att_2d_masks", "apply_rope", "multi_head_attention"]
