"""MVLA configuration (reference `src/model/mvla/configuration_mvla.py:25-120`):
108 metaquery tokens, 50-step action chunks on 7-dof arms, a 12-layer
bidirectional connector, and an expert that alternates self- and
cross-attention layers."""

from __future__ import annotations

import dataclasses

from intact_tpu.models.connector import ConnectorConfig, tiny_test_config as connector_tiny
from intact_tpu.models.gemma import GemmaConfig, gemma_2b, gemma_300m_expert, tiny_test_config as gemma_tiny
from intact_tpu.models.siglip import SigLIPConfig, so400m_14_224, tiny_test_config as siglip_tiny


@dataclasses.dataclass(frozen=True)
class MVLAConfig:
    vision: SigLIPConfig = dataclasses.field(default_factory=so400m_14_224)
    vlm: GemmaConfig = dataclasses.field(default_factory=gemma_2b)
    expert: GemmaConfig = dataclasses.field(default_factory=gemma_300m_expert)
    connector: ConnectorConfig = dataclasses.field(default_factory=ConnectorConfig)

    num_metaqueries: int = 108
    num_cameras: int = 1
    tokenizer_max_length: int = 72

    max_state_dim: int = 7
    max_action_dim: int = 7
    chunk_size: int = 50
    n_action_steps: int = 50
    num_steps: int = 10

    # expert layer pattern: "self_cross" alternates starting with self
    alternate_pattern: str = "self_cross"

    # action decoder: "flow" = Gemma expert + flow matching (the trained
    # reference path); "dit" = DiT diffusion head over the connector prompt
    # (the reference's ActionModel alternative, configuration_mvla.py DiT
    # settings — present but commented out of its model)
    action_head: str = "flow"
    dit_width: int = 384
    dit_depth: int = 12
    dit_heads: int = 6
    diffusion_steps: int = 100  # DDPM train steps; sampling uses num_steps (DDIM)

    time_min_period: float = 4e-3
    time_max_period: float = 4.0
    time_beta_alpha: float = 1.5
    time_beta_beta: float = 1.0
    time_scale: float = 0.999
    time_offset: float = 0.001

    attention_impl: str = "pallas"
    freeze_vision_encoder: bool = False
    train_expert_only: bool = False
    # opt-in: ALSO freeze the metaqueries under train_expert_only, letting
    # the trainer cut backprop at the VLM boundary entirely (the reference
    # keeps metaqueries trainable through the frozen VLM,
    # modeling_mvla.py:490 — so this is off by default)
    freeze_metaqueries: bool = False

    @property
    def proj_width(self) -> int:
        return self.expert.width

    @staticmethod
    def tiny() -> "MVLAConfig":
        return MVLAConfig(
            vision=siglip_tiny(),
            vlm=gemma_tiny(width=32, depth=2),
            expert=gemma_tiny(width=16, depth=2),
            connector=connector_tiny(),
            num_metaqueries=6,
            tokenizer_max_length=8,
            chunk_size=4,
            n_action_steps=4,
            num_steps=2,
        )
