"""Device mesh + sharding setup.

The reference's only parallelism is PyTorch-Lightning DDP over NCCL
(/root/reference/main.py:511,521). The TPU-native equivalent is one
jax.sharding.Mesh with a `data` axis (DP) and an optional `model` axis (TP
for the UNet attention heads / conv channels), with XLA inserting all
collectives (psum for grad all-reduce rides ICI automatically under jit).

Everything here is ordinary jax.sharding — no manual collective calls —
so the same code runs on 1 chip, a v5e slice, or a CPU-simulated mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_params",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis (pure DP — the reference's
    strategy). Axis sizes must multiply to the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of (B, ...) arrays batch-sharded on the mesh."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def shard_params(params, mesh: Mesh):
    """Replicate parameters across the mesh (DP). TP layouts come later."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), params)
