"""Octo configuration.

The reference serves upstream JAX Octo checkpoints through a wrapper
(`policy_wrapper.py:305-371`, 2-frame image history, task text, diffusion
action head sampling). This is a from-scratch TPU implementation of that
architecture family: block-attention transformer over [task, obs_1,
readout_1, ..., obs_T, readout_T] tokens and a FiLM-MLP diffusion head.
Known delta vs upstream Octo: language is embedded with the framework
tokenizer + learned table rather than a frozen T5 encoder.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class OctoConfig:
    # transformer (octo-small operating point)
    width: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_dim: int = 1536

    # observations
    image_size: int = 256
    patch_size: int = 16
    history: int = 2  # n_obs_steps
    use_proprio: bool = False
    proprio_dim: int = 7

    # language
    vocab_size: int = 32_000
    max_lang_tokens: int = 16

    # diffusion action head
    action_dim: int = 7
    horizon: int = 4
    diffusion_steps: int = 20
    sample_steps: int = 20  # DDPM full by default

    norm_eps: float = 1e-6

    @property
    def tokens_per_frame(self) -> int:
        n = (self.image_size // self.patch_size) ** 2
        return n + (1 if self.use_proprio else 0)

    # interface parity with pi0/mvla configs (trainer/policy plumbing)
    @property
    def tokenizer_max_length(self) -> int:
        return self.max_lang_tokens

    @property
    def max_state_dim(self) -> int:
        return self.proprio_dim

    @property
    def max_action_dim(self) -> int:
        return self.action_dim

    @property
    def chunk_size(self) -> int:
        return self.horizon

    @property
    def n_action_steps(self) -> int:
        return self.horizon

    @property
    def num_cameras(self) -> int:
        return self.history

    @staticmethod
    def small() -> "OctoConfig":
        return OctoConfig()

    @staticmethod
    def base() -> "OctoConfig":
        return OctoConfig(width=768, depth=12, num_heads=12, mlp_dim=3072)

    @staticmethod
    def tiny() -> "OctoConfig":
        return OctoConfig(
            width=32, depth=2, num_heads=2, mlp_dim=64,
            image_size=32, patch_size=16, history=2,
            vocab_size=256, max_lang_tokens=8,
            diffusion_steps=8, sample_steps=8,
        )
