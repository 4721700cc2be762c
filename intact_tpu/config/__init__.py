"""Config system: dataclass tree + YAML !include + CLI dot-overrides.

Draccus-equivalent behavior (reference `src/agent/run.py:20`,
`configuration_pipeline.py`) without the library dependency and — by design —
without the reference's import-time NCCL side effect
(`configuration_pipeline.py:160-172`): JAX device/mesh setup is explicit and
happens in the trainer, never at config-parse time.
"""

from intact_tpu.config.core import (
    apply_overrides,
    from_dict,
    load_yaml,
    parse_cli,
    to_dict,
)
from intact_tpu.config.pipeline import (
    DataConfig,
    EnvConfig,
    EvalConfig,
    MeshSection,
    TrainDataConfig,
    TrainPipelineConfig,
    ValDataConfig,
    WandBConfig,
)

__all__ = [
    "apply_overrides",
    "from_dict",
    "load_yaml",
    "parse_cli",
    "to_dict",
    "DataConfig",
    "EnvConfig",
    "EvalConfig",
    "MeshSection",
    "TrainDataConfig",
    "TrainPipelineConfig",
    "ValDataConfig",
    "WandBConfig",
]
