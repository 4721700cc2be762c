"""Pi0FAST configuration.

The reference trains PI0FAST through LeRobot (`run.py` trainer_map,
`config/models/pi0fast_*.json`): the VLM autoregressively emits action
tokens. Upstream FAST compresses chunks with a DCT+BPE tokenizer; this
implementation uses per-dimension uniform binning into the tail of the
vocabulary (the same scheme the Magma/OpenVLA baselines use and that
`intact_tpu.serve.decoding` implements) — horizon x action_dim tokens per
chunk. Documented delta: no DCT compression, so sequences are longer but the
architecture/serving path is identical.
"""

from __future__ import annotations

import dataclasses

from intact_tpu.models.gemma import GemmaConfig, gemma_2b, tiny_test_config as gemma_tiny
from intact_tpu.models.siglip import SigLIPConfig, so400m_14_224, tiny_test_config as siglip_tiny


@dataclasses.dataclass(frozen=True)
class Pi0FASTConfig:
    vision: SigLIPConfig = dataclasses.field(default_factory=so400m_14_224)
    vlm: GemmaConfig = dataclasses.field(default_factory=gemma_2b)

    num_cameras: int = 1
    tokenizer_max_length: int = 72

    max_state_dim: int = 32
    max_action_dim: int = 7
    chunk_size: int = 4
    n_action_steps: int = 4

    n_action_bins: int = 256
    action_low: float = -3.0   # normalized-action clip range for binning
    action_high: float = 3.0

    # Width of the vocabulary tail that holds action tokens at DECODE time.
    # None -> n_action_bins (the in-graph uniform binning scheme). When
    # training on FAST DCT+BPE targets (pi0fast/fast_tokenizer, tokens
    # mapped to the last max_token ids), set this to the tokenizer's
    # max_token so greedy decoding can emit BPE merge tokens too.
    action_vocab_size: int | None = None

    attention_impl: str = "pallas"
    freeze_vision_encoder: bool = False
    train_expert_only: bool = False

    @property
    def n_action_tokens(self) -> int:
        return self.chunk_size * self.max_action_dim

    @staticmethod
    def bridge() -> "Pi0FASTConfig":
        return Pi0FASTConfig()

    @staticmethod
    def tiny() -> "Pi0FASTConfig":
        return Pi0FASTConfig(
            vision=siglip_tiny(),
            vlm=gemma_tiny(width=32, depth=2),
            tokenizer_max_length=8,
            max_state_dim=8,
            max_action_dim=3,
            chunk_size=2,
            n_action_bins=32,
        )
