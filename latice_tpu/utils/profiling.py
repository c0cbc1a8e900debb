"""Profiling and tracing hooks.

The reference had no tracing at all (SURVEY §5: ad-hoc ``time.time()`` in
notebooks only). Here profiling is first-class: ``jax.profiler`` trace
capture around any phase, and a lightweight phase timer whose reports feed
the metrics loggers.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from pathlib import Path

import jax

logger = logging.getLogger(__name__)

__all__ = ["trace", "PhaseTimer", "device_sync"]


def device_sync() -> None:
    """Block until all dispatched device work completes.

    On tunneled backends ``block_until_ready`` can return optimistically, so
    a tiny host read-back is used as the authoritative barrier.
    """
    x = jax.numpy.zeros(())
    float(x)  # device round-trip


@contextlib.contextmanager
def trace(log_dir: str | Path, name: str | None = None):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto).

    Example::

        with trace("/tmp/traces", "index_batch"):
            pipeline(patterns)
    """
    log_dir = str(log_dir)
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # profiling unsupported on some backends
        logger.warning(f"jax.profiler unavailable ({e}); phase runs untraced")
        started = False
    try:
        yield
    finally:
        if started:
            device_sync()
            jax.profiler.stop_trace()
            logger.info(f"Trace '{name or 'phase'}' written to {log_dir}")


class PhaseTimer:
    """Accumulating wall-clock timer for named pipeline phases.

    Forces device completion at phase exit so timings are honest on
    asynchronous backends. ``report()`` returns mean/total/count per phase,
    ready for ``logger.log_metrics``.
    """

    def __init__(self, sync: bool = True) -> None:
        self.sync = sync
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                device_sync()
            self._totals[name] += time.perf_counter() - start
            self._counts[name] += 1

    def report(self) -> dict[str, float]:
        out: dict[str, float] = {}
        for name, total in self._totals.items():
            count = self._counts[name]
            out[f"{name}/total_s"] = total
            out[f"{name}/mean_s"] = total / count
            out[f"{name}/count"] = float(count)
        return out

    def reset(self) -> None:
        self._totals.clear()
        self._counts.clear()

    def __repr__(self) -> str:
        parts = [
            f"{k}={self._totals[k]:.3f}s/{self._counts[k]}x"
            for k in sorted(self._totals)
        ]
        return f"PhaseTimer({', '.join(parts)})"
