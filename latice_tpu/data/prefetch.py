"""Device prefetch: overlap host->device transfers with compute.

The reference relied on DataLoader workers + pinned memory for transfer
overlap (data_module.py:225-231). The JAX equivalent is simpler: device
transfers are asynchronous, so keeping a small queue of batches already
in flight hides H2D latency behind the current step's compute.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator

import jax
import jax.numpy as jnp

__all__ = ["prefetch_to_device"]


def prefetch_to_device(
    iterator: Iterable[Any], size: int = 2, sharding: Any | None = None
) -> Iterator[Any]:
    """Yield device-resident batches, keeping ``size`` transfers in flight.

    Args:
        iterator: Yields host batches (arrays or tuples/pytrees of arrays).
        size: Queue depth; 2 double-buffers (one computing, one transferring).
        sharding: Optional jax.sharding.Sharding applied to every leaf (e.g.
            batch sharding over a mesh); default places on the default device.

    Yields:
        The same pytrees with every array leaf transferred to device.
    """
    queue: collections.deque = collections.deque()

    def transfer(batch: Any) -> Any:
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda a: jax.device_put(a, sharding), batch
            )
        return jax.tree_util.tree_map(jnp.asarray, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(transfer(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(transfer(next(it)))
        except StopIteration:
            pass
        yield out
