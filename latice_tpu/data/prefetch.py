"""Device prefetch: overlap host->device transfers with compute.

The reference relied on DataLoader workers + pinned memory for transfer
overlap (data_module.py:225-231). The JAX equivalent is simpler: device
transfers are asynchronous, so keeping a small queue of batches already
in flight hides H2D latency behind the current step's compute.
"""

from __future__ import annotations

import collections
import queue as queue_mod
import threading
from typing import Any, Iterable, Iterator

import jax
import jax.numpy as jnp

__all__ = ["prefetch_host", "prefetch_to_device"]


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


def prefetch_host(iterable: Iterable[Any], size: int = 2) -> Iterator[Any]:
    """Run ``iterable`` in a background thread, keeping up to ``size`` items
    ready ahead of the consumer.

    The host-side twin of `prefetch_to_device`: where that hides the H2D
    transfer, this hides the *producer* — disk reads and host decode of the
    next scan slab overlap with the device compute the consumer is blocked
    on (numpy/HDF5 IO releases the GIL). Used by the streaming query paths
    (``index.py query`` over HDF5/UP scans), where each slab otherwise
    serializes read → device → read.

    Order is preserved; producer exceptions re-raise at the consumption
    point; abandoning the iterator (break / GC / ``close()``) stops the
    thread promptly instead of leaving it blocked on a full queue. Closing
    the generator also *joins* the worker, so once ``close()`` returns no
    thread is still touching the underlying iterable — callers that close
    a resource the producer reads from (an HDF5 dataset, a memmap) must
    close this generator first (h5py is not safe against closing a file
    out from under a reader in another thread).
    """
    if size < 1:
        raise ValueError(f"prefetch size must be >= 1, got {size}")
    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    stop = threading.Event()
    _END = object()

    def _put(item: Any) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def _worker() -> None:
        try:
            for item in iterable:
                if not _put(("item", item)):
                    return
        except BaseException as e:  # re-raised on the consumer side
            _put(("error", e))
            return
        _put((_END, None))

    thread = threading.Thread(
        target=_worker, name="latice-prefetch-host", daemon=True
    )
    thread.start()
    try:
        while True:
            kind, payload = q.get()
            if kind is _END:
                return
            if kind == "error":
                raise payload
            yield payload
    finally:
        stop.set()
        # Unblock a worker mid-put, then wait for it to leave the iterable
        # (it may be inside one disk read; those terminate). The timeout is
        # a deadlock backstop only — an unresponsive producer is already a
        # bug, and proceeding then is no worse than the pre-join behavior.
        while True:
            try:
                q.get_nowait()
            except queue_mod.Empty:
                break
        thread.join(timeout=30.0)
