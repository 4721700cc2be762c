"""CLI entry: config parse + role dispatch (train | server | client).

Reference parity: `src/agent/run.py:20-69` — draccus CLI with a model
factory and three roles. Usage:

  python -m intact_tpu.run --config_path config/train/pi0_finetune_bridge.yaml
  python -m intact_tpu.run --config_path config/experiment/simpler/pi0_finetune_bridge_ev.yaml \
      --eval_cfg.role server --eval_cfg.port 8001
  python -m intact_tpu.run --config_path ... --eval_cfg.role client

Any config field is overridable with --dotted.path value.
"""

from __future__ import annotations

import sys

from intact_tpu.config import (
    TrainPipelineConfig,
    apply_overrides,
    from_dict,
    load_yaml,
    parse_cli,
)
from intact_tpu.utils.monitor import setup_logger
from intact_tpu.utils.pipeline import get_class_from_path


def build_config(argv: list[str]) -> TrainPipelineConfig:
    config_path, overrides = parse_cli(argv)
    data = load_yaml(config_path) if config_path else {}
    if overrides:
        data = apply_overrides(data, overrides)
    return from_dict(TrainPipelineConfig, data)


def main(argv: list[str] | None = None) -> int:
    cfg = build_config(argv if argv is not None else sys.argv[1:])
    logger = setup_logger(True, name="run")

    from intact_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    if cfg.eval_cfg is None:
        from intact_tpu.train.trainer import Pi0Trainer

        trainer = Pi0Trainer(cfg)
        trainer.train()
        return 0

    if cfg.eval_cfg.role == "server":
        from intact_tpu.serve.policy_wrapper import make_policy_wrapper
        from intact_tpu.serve.server import serve

        policy = make_policy_wrapper(cfg)
        logger.info("serving %s on %s:%d", cfg.model_cfg.get("type"),
                    cfg.eval_cfg.host, cfg.eval_cfg.port)
        serve(policy, cfg)
        return 0

    if cfg.eval_cfg.role == "client":
        evaluator_cls = get_class_from_path(cfg.eval_cfg.simulator_path)
        evaluator = evaluator_cls(cfg)
        evaluator.evaluate()
        return 0

    raise ValueError(f"unknown role {cfg.eval_cfg.role!r}")


if __name__ == "__main__":
    sys.exit(main())
