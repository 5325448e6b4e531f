"""Device mesh management.

Replaces the reference's NCCL/DeepSpeed distributed runtime
(`/root/reference/internvl/dist_utils.py:32-104`, torchrun DDP + ZeRO-1) with a
single `jax.sharding.Mesh` over up to three axes:

- ``data``: pure data parallelism (DDP equivalent).
- ``fsdp``: parameter/optimizer-state sharding (ZeRO / FSDP equivalent —
  GSPMD inserts the all-gather / reduce-scatter collectives over ICI).
- ``tensor``: tensor parallelism for attention heads / FFN shards (the
  reference has none — SURVEY.md §2b — but it is nearly free with pjit).

All collectives are implicit: parameters and activations carry
`NamedSharding`s and XLA lowers the communication onto ICI/DCN.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
MESH_AXES = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS)


@dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = 1
    tensor: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.fsdp * self.tensor

    @classmethod
    def auto(cls, n_devices: Optional[int] = None, fsdp: bool = False) -> "MeshConfig":
        """Default layout: all devices on `data`, or all on `fsdp` when
        parameter sharding is requested (stage-2 LoRA on v5p-32 per
        BASELINE.md config #5)."""
        n = n_devices if n_devices is not None else jax.device_count()
        return cls(data=1, fsdp=n) if fsdp else cls(data=n, fsdp=1)


def make_mesh(
    config: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    config = config or MeshConfig.auto()
    devices = list(devices) if devices is not None else jax.devices()
    n = config.num_devices
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices ({config}), only {len(devices)} available"
        )
    dev_array = np.asarray(devices[:n]).reshape(config.data, config.fsdp, config.tensor)
    return Mesh(dev_array, MESH_AXES)


def batch_spec() -> PartitionSpec:
    """Batch-dim sharding over both data and fsdp axes (per-device batch)."""
    return PartitionSpec((DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def local_mesh_for_testing(n: int = 8) -> Mesh:
    """An n-device mesh for CPU tests (requires
    XLA_FLAGS=--xla_force_host_platform_device_count=n)."""
    return make_mesh(MeshConfig(data=1, fsdp=n))
