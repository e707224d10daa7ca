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
    "init_distributed",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "shard_params",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> tuple[int, int]:
    """Multi-process / multi-host initialization (the reference's multi-node
    DDP role, main.py:23,511,521; SURVEY §2.7 names jax.distributed + DCN
    as the TPU equivalent).

    On TPU pods all arguments auto-detect from the environment; on
    CPU/other, pass coordinator ("host:port"), num_processes, process_id.
    After this, jax.devices() is the GLOBAL device list, create_mesh builds
    a global mesh, and shard_batch assembles per-process local shards into
    global arrays. Returns (process_index, process_count). Idempotent.
    """
    # NOTE: no backend-touching jax calls (jax.devices/process_count/...)
    # may happen before jax.distributed.initialize
    from jax._src import distributed as _dist

    already = getattr(_dist.global_state, "client", None) is not None
    if already or (num_processes in (None, 0, 1) and coordinator is None):
        return jax.process_index(), jax.process_count()
    platforms = str(jax.config.jax_platforms or "")
    if "cpu" in platforms:
        # multi-process CPU collectives need gloo (2-proc mesh tests)
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    kwargs = {}
    if coordinator is not None:
        kwargs.update(coordinator_address=coordinator)
    if num_processes is not None:
        kwargs.update(num_processes=num_processes)
    if process_id is not None:
        kwargs.update(process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=list(local_device_ids))
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


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
    """Place a pytree of (B, ...) arrays batch-sharded on the mesh.

    Single-process: a plain sharded device_put. Multi-process (after
    init_distributed): each process passes its LOCAL shard of the global
    batch (B_local = B_global / process_count, the loader's per-process
    slice) and the shards assemble into one global array — the
    DistributedSampler + DDP input path, done the jax way.
    """
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def shard_params(params, mesh: Mesh):
    """Replicate parameters across the mesh (DP). TP layouts come later."""
    s = replicated(mesh)
    if jax.process_count() > 1:
        # every process holds identical values (same seed init / same
        # checkpoint); form global replicated arrays from the local copies
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                s, np.asarray(x)
            ),
            params,
        )
    return jax.tree.map(lambda x: jax.device_put(x, s), params)
