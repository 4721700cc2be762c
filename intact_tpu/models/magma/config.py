"""Magma-8B native config.

The reference serves Magma-8B through HF ``AutoModelForCausalLM`` with
``trust_remote_code`` (reference ``policy_wrapper.py:282-293``); the
architecture is a CLIP-ConvNeXt-XXLarge vision tower + a multimodal
projector + a LLaMA-3-8B language model, with actions read off the last 7
generated tokens via the 256-bin vocab-offset scheme
(``policy_wrapper.py:236-269``). This config assembles the same stack from
the native trunks (models/convnext.py, models/llama.py).
"""

from __future__ import annotations

import dataclasses

from intact_tpu.models.convnext import ConvNeXtConfig, convnext_xxlarge
from intact_tpu.models.llama import LlamaConfig, llama3_8b
from intact_tpu.models.llama import tiny_test_config as llama_tiny


@dataclasses.dataclass(frozen=True)
class MagmaConfig:
    vision: ConvNeXtConfig
    lm: LlamaConfig
    image_size: int = 512          # ConvNeXt input; /32 -> 16x16 = 256 tokens
    projector_layers: int = 2      # LLaVA-style linear-GELU-linear
    # Placeholder id spliced with vision features. MUST lie inside
    # lm.vocab_size and match the id the checkpoint's tokenizer assigns to
    # its <image> token (LLaMA-3 ships reserved special ids 128000-128255
    # for exactly this, so the default uses the last reserved slot); set it
    # from the real tokenizer when serving a released checkpoint.
    image_token_id: int = 128_255
    use_chat_template: bool = True  # LLaMA-3 instruct framing (ref prompt)
    n_action_tokens: int = 7       # xyz + rpy + gripper, one token each
    n_action_bins: int = 256       # tail-of-vocab uniform bins
    max_prompt_tokens: int = 64    # text budget after the image block

    # LeRobot-config-style fields the pipeline reads off every model config
    type: str = "magma_native"
    chunk_size: int = 1
    n_action_steps: int = 1
    n_obs_steps: int = 1
    num_cameras: int = 1
    tokenizer_max_length: int = 64
    max_state_dim: int = 7
    max_action_dim: int = 7

    @property
    def n_image_tokens(self) -> int:
        patch = self.vision.patch_size * 2 ** (len(self.vision.depths) - 1)
        return (self.image_size // patch) ** 2

    @classmethod
    def magma_8b(cls) -> "MagmaConfig":
        return cls(vision=convnext_xxlarge(), lm=llama3_8b())

    @classmethod
    def tiny(cls) -> "MagmaConfig":
        """CPU-testable operating point (vision 2 stages -> /8 downsample)."""
        from intact_tpu.models.convnext import tiny_test_config as cn_tiny

        lm = dataclasses.replace(llama_tiny(), vocab_size=512)
        return cls(
            vision=cn_tiny(), lm=lm, image_size=32,
            image_token_id=lm.vocab_size - 300, max_prompt_tokens=12,
            tokenizer_max_length=12, use_chat_template=False,
        )
