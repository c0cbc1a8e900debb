"""Device-mesh construction and sharding helpers.

The reference is single-device (SURVEY §2: no strategy configured anywhere);
scaling here is first-class instead: a 1-D ``jax.sharding.Mesh`` over all
chips with a ``data`` axis. Batches shard over ``data``, parameters
replicate, and XLA inserts the gradient ``psum`` over ICI automatically from
the sharding annotations — the pjit/GSPMD equivalent of DDP.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "replicate_state",
    "data_parallel_sharding",
]


def make_mesh(
    n_devices: int | None = None, axis_name: str = "data", devices: Any = None
) -> Mesh:
    """1-D mesh over (the first) ``n_devices`` devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=(axis_name,))


def data_parallel_sharding(mesh: Mesh) -> tuple[NamedSharding, NamedSharding]:
    """(batch_sharding, replicated_sharding) for the mesh's first axis."""
    axis = mesh.axis_names[0]
    return NamedSharding(mesh, P(axis)), NamedSharding(mesh, P())


def shard_batch(batch: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a batch sharded along its leading axis over the mesh.

    The batch size must divide by the mesh size (pad upstream otherwise).
    """
    batch_sharding, _ = data_parallel_sharding(mesh)
    n = mesh.devices.size
    if batch.shape[0] % n != 0:
        raise ValueError(
            f"Batch size {batch.shape[0]} not divisible by mesh size {n}"
        )
    return jax.device_put(batch, batch_sharding)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree across the mesh."""
    _, replicated = data_parallel_sharding(mesh)
    return jax.device_put(tree, replicated)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate a TrainState across the mesh (params + optimizer moments)."""
    return replicate(state, mesh)
