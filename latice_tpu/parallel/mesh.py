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
    "dp_dispatch_plan",
]


def dp_dispatch_plan(
    n_items: int, batch_size: int, n_devices: int
) -> dict[str, int]:
    """Static per-device dispatch math for a data-parallel pass.

    This is the arithmetic every DP path in the package follows (Trainer
    epochs, `DiffractionPatternIndexer` mesh builds, `IndexPipeline`
    chunking): items are cut into ``ceil(n/b)`` fixed-shape batches, the
    tail batch is padded up to the static compile shape (never recompiled),
    and each batch splits evenly over the mesh. Asserted by the dryrun and
    tests at n_devices in {2, 8} so the ROADMAP scaling model has code
    anchors (VERDICT r2 #8).

    Returns a dict with:
        n_batches: dispatches per pass.
        rows_per_device: rows each device computes per dispatch.
        tail_pad: zero rows appended to the last batch.
        padded_items: total rows actually computed (n_items + tail_pad).
        parallel_efficiency_ppm: useful/computed rows, in parts-per-million
            (1e6 = no padding waste).
    """
    if batch_size % n_devices:
        raise ValueError(
            f"batch_size {batch_size} must divide by mesh size {n_devices}"
        )
    if n_items <= 0:
        raise ValueError("n_items must be positive")
    n_batches = -(-n_items // batch_size)
    padded = n_batches * batch_size
    return {
        "n_batches": n_batches,
        "rows_per_device": batch_size // n_devices,
        "tail_pad": padded - n_items,
        "padded_items": padded,
        "parallel_efficiency_ppm": int(round(1e6 * n_items / padded)),
    }


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
