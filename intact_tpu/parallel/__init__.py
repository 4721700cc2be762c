"""Multi-chip parallelism: device mesh + sharding rules + collectives.

Replaces the reference's NCCL DDP/FSDP (`src/agent/trainer.py:144-163`,
`configuration_pipeline.py:159-172`) with the idiomatic TPU stack: one
`jax.sharding.Mesh` over ICI with axes (data, fsdp, tensor); parameter and
batch shardings are declared as PartitionSpec rules and XLA inserts the
collectives (all-gather / reduce-scatter / all-reduce) during pjit
compilation. No explicit communication calls appear in model code.
"""

from intact_tpu.parallel.mesh import MeshConfig, make_mesh
from intact_tpu.parallel.sharding import (
    batch_sharding,
    local_rows,
    param_shardings,
    put_global_batch,
    replicated,
)

__all__ = [
    "MeshConfig",
    "make_mesh",
    "param_shardings",
    "batch_sharding",
    "put_global_batch",
    "local_rows",
    "replicated",
]
