"""Device selection helper — the JAX analogue of utils.py:59-74 `get_device`."""

from __future__ import annotations

import jax

__all__ = ["get_device", "get_platform"]


def get_platform() -> str:
    """Best available platform name: 'tpu' > 'gpu' > 'cpu' (axon counts as tpu)."""
    platforms = {d.platform for d in jax.devices()}
    for want in ("tpu", "gpu", "cpu"):
        if want in platforms:
            return want
    return jax.devices()[0].platform


def get_device(preferred: str | None = None) -> jax.Device:
    """Return a device, preferring ``preferred`` platform with fallback.

    Mirrors the reference's cuda→mps→cpu cascade (utils.py:59-74) with the
    TPU-first ordering that makes sense here.
    """
    devices = jax.devices()
    if preferred:
        matches = [d for d in devices if d.platform == preferred]
        if matches:
            return matches[0]
    order = {"tpu": 0, "gpu": 1, "cpu": 2}
    return sorted(devices, key=lambda d: order.get(d.platform, 3))[0]
