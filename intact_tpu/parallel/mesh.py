"""Device mesh construction.

Axes convention (scaling-book style):
  data    pure data parallelism (gradients all-reduced)
  fsdp    data parallelism + parameter/optimizer sharding (ZeRO-3): params
          are all-gathered per layer, gradients reduce-scattered
  tensor  tensor parallelism within attention heads / MLP hidden dim

On a single TPU slice all three axes ride ICI. Multi-slice (DCN) is out of
scope for now — add a leading "replica" axis when it lands.
"""

from __future__ import annotations

import dataclasses
import math

import jax
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: absorb remaining devices
    fsdp: int = 1
    tensor: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int, int]:
        fixed = self.fsdp * self.tensor
        data = self.data
        if data == -1:
            if n_devices % fixed:
                raise ValueError(
                    f"{n_devices} devices not divisible by fsdp*tensor={fixed}"
                )
            data = n_devices // fixed
        if data * fixed != n_devices:
            raise ValueError(
                f"mesh {data}x{self.fsdp}x{self.tensor} != {n_devices} devices"
            )
        return data, self.fsdp, self.tensor


AXIS_NAMES = ("data", "fsdp", "tensor")


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    cfg = cfg or MeshConfig()
    shape = cfg.resolve(len(devices))
    # jax.make_mesh picks an ICI-friendly device order for the logical shape.
    # Auto axis types: we annotate params/batch and let GSPMD propagate
    # intermediate shardings (Explicit mode would demand out_sharding on
    # every reshape/contraction in model code).
    return jax.make_mesh(
        shape,
        AXIS_NAMES,
        axis_types=(jax.sharding.AxisType.Auto,) * len(AXIS_NAMES),
        devices=devices,
    )


def default_mesh_for(n_devices: int) -> MeshConfig:
    """Heuristic: fsdp-major (best for 3B-scale training on v5e-8 class
    slices), tensor=1 unless the model demands it."""
    if n_devices <= 1:
        return MeshConfig(data=1, fsdp=1, tensor=1)
    # favor fsdp for memory headroom; keep data for large slices
    fsdp = min(n_devices, 8)
    while n_devices % fsdp:
        fsdp //= 2
    return MeshConfig(data=n_devices // fsdp, fsdp=fsdp, tensor=1)


def ici_size(mesh: Mesh) -> int:
    return math.prod(mesh.devices.shape)
