"""Policy wrappers: glue between the wire protocol, env adapters, and models.

Role parity with `src/experiments/policies/policy_wrapper.py:26-371`:
`select_action(obs) -> np.ndarray [action_step, dim]`, `reset()`,
`switch_model(path)` (hot checkpoint swap for sweeps). The TPU differences:
params reload is an Orbax restore into fresh device buffers (no gc/empty-
cache dance), and wrappers expose `select_action_batch` so the batching
server can fuse concurrent client requests into one device call.
"""

from __future__ import annotations

import numpy as np

from intact_tpu.utils.monitor import setup_logger
from intact_tpu.utils.pipeline import get_class_from_path, set_seed_everywhere


class BasePolicyWrapper:
    def __init__(self, config):
        self.config = config
        self.logger = setup_logger(True, name="policy_wrapper")
        set_seed_everywhere(config.seed, train=False)
        self.env_adapter = get_class_from_path(config.eval_cfg.env_adapter_path)(config)
        self.action_step = config.eval_cfg.action_step

    def reset(self) -> None:
        self.env_adapter.reset()

    def switch_model(self, new_model_path: str) -> None:
        raise NotImplementedError

    def select_action(self, obs: dict) -> np.ndarray:
        raise NotImplementedError


class Pi0PolicyWrapper(BasePolicyWrapper):
    """Serves intact_tpu Pi0 checkpoints (LeRobotPolicyWrapper-equivalent,
    reference policy_wrapper.py:106-157)."""

    def __init__(self, config, model_cfg=None):
        super().__init__(config)
        from intact_tpu.models.pi0.policy import Pi0Policy

        self.model_cfg = model_cfg or config.make_model_config()
        self.policy = Pi0Policy(self.model_cfg, seed=config.seed, use_bf16=config.use_bf16)
        path = config.eval_cfg.pretrained_model_path
        if path:
            self.policy.load(path)
            self.logger.info("loaded checkpoint %s", path)

    def reset(self) -> None:
        super().reset()
        self.policy.reset()

    def switch_model(self, new_model_path: str) -> None:
        self.policy.load(new_model_path)
        self.env_adapter.reset()

    def select_action(self, obs: dict) -> np.ndarray:
        """One client obs -> [action_step, action_dim] env actions."""
        inputs = self.env_adapter.preprocess(obs)
        chunk = self.policy.sample_action_chunk(inputs)  # [1, chunk, 32]
        env_dim = len(self.env_adapter.dataset_statistics["action"]["mean"])
        chunk = chunk[0, : self.action_step, :env_dim]
        return self.env_adapter.postprocess(chunk)

    def select_action_batch(self, obs_list: list[dict]) -> list[np.ndarray]:
        """Fused inference for the batching server: N client obs -> N action
        chunks in ONE device call. Adapters with episode state (sticky
        gripper) are per-connection, so postprocess stays per-item."""
        inputs = [self.env_adapter.preprocess(o) for o in obs_list]
        batch = {
            "image": np.concatenate([i["image"] for i in inputs]),
            "state": np.concatenate([i["state"] for i in inputs]),
            "task": [i["task"][0] for i in inputs],
        }
        chunks = self.policy.sample_action_chunk(batch)  # [N, chunk, 32]
        env_dim = len(self.env_adapter.dataset_statistics["action"]["mean"])
        return [
            self.env_adapter.postprocess(chunks[i, : self.action_step, :env_dim])
            for i in range(len(obs_list))
        ]


def make_policy_wrapper(config):
    """Model type -> wrapper (reference run.py:24-56 policy_wrapper_map)."""
    mtype = config.model_cfg.get("type", "pi0")
    if mtype in ("pi0", "pi0_tiny"):
        return Pi0PolicyWrapper(config)
    raise ValueError(
        f"No policy wrapper for model type {mtype!r} yet "
        f"(available: pi0, pi0_tiny)"
    )
