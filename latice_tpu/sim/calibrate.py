"""Detector geometry calibration by autodiff: fit the pattern center.

The pattern center (pcx, pcy, dd) is the dominant systematic error source
in EBSD geometry — misplacing it by 1% of the detector width bends every
band position and biases every indexed orientation. Classical calibration
needs dedicated procedures (moving-screen shots, known single crystals);
here the renderer's differentiability does it from ordinary indexed
patterns: jointly optimize the shared geometry parameters and the
per-pattern orientation corrections to maximize the summed normalized
cross-correlation against a handful of calibration patterns.

The joint fit matters: pattern-center error and orientation error are
locally nearly degenerate (a small PC shift looks almost like a small
common rotation; only the gnomonic distortion separates them), so the fit
removes ~90% of a typical PC error quickly and then creeps along the
degenerate direction — tested: 12 patterns recover a (0.02, -0.03, -0.02)
PC offset to a few 1e-3 of detector width at NCC ~0.999, with the residual
absorbed into sub-degree orientation corrections. For metrological PC
accuracy, calibrate against a known single crystal (pass the true
orientations as ``init_quats`` with ``lr_orientation=0`` to pin them).

Everything is one jitted Adam loop: the geometry enters through a jnp
re-expression of `geometry.pixel_directions` so gradients flow into
(pcx, pcy, dd) exactly as they flow into orientations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.sim.geometry import DetectorGeometry
from latice_tpu.sim.kinematical import Reflectors, cubic_reflectors
from latice_tpu.sim.refine import _apply_tangent, _simulate_flat

__all__ = ["calibrate_geometry"]


def _pixel_directions_jax(shape, pcx, pcy, dd, tilt_rad):
    """`geometry.pixel_directions` re-expressed in jnp so (pcx, pcy, dd)
    are differentiable; conventions identical (pinned by test)."""
    h, w = shape
    col = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    dist_bottom = (h - (jnp.arange(h, dtype=jnp.float32) + 0.5)) / w
    x = jnp.broadcast_to(col[None, :] - pcx, (h, w))
    y = jnp.broadcast_to(dist_bottom[:, None] - pcy, (h, w))
    z = jnp.full((h, w), 1.0) * dd
    d = jnp.stack([x, y, z], axis=-1)
    # Tilt about x composed explicitly (differentiable too, though the
    # calibration below holds it fixed).
    ct, st = jnp.cos(tilt_rad), jnp.sin(tilt_rad)
    d = jnp.stack(
        [
            d[..., 0],
            ct * d[..., 1] - st * d[..., 2],
            st * d[..., 1] + ct * d[..., 2],
        ],
        axis=-1,
    )
    return (d / jnp.linalg.norm(d, axis=-1, keepdims=True)).reshape(-1, 3)


@functools.partial(jax.jit, static_argnames=("shape", "steps", "edge_frac"))
def _calibrate(patterns, q0, pc0, tilt_rad, normals, sin_theta, intensity,
               lr_pc, lr_v, *, shape, steps, edge_frac):
    p = patterns - jnp.mean(patterns, axis=1, keepdims=True)
    p = p / (jnp.linalg.norm(p, axis=1, keepdims=True) + 1e-12)

    def loss(params):
        pc, v = params
        # Same differentiable render as sim.refine, with the pixel
        # directions themselves now a function of the geometry parameters.
        dirs = _pixel_directions_jax(shape, pc[0], pc[1], pc[2], tilt_rad)
        x = _simulate_flat(
            _apply_tangent(v, q0), dirs, normals, sin_theta, intensity,
            edge_frac,
        )
        return -jnp.sum(x * p)

    grad_fn = jax.grad(loss)
    b1, b2, eps = 0.9, 0.999, 1e-8
    decay = (1.0 / 30.0) ** (1.0 / max(steps - 1, 1))
    lr = (lr_pc, lr_v)

    def body(carry, i):
        params, m, s = carry
        g = grad_fn(params)
        new_p, new_m, new_s = [], [], []
        for pj, gj, mj, sj, lrj in zip(params, g, m, s, lr):
            mj = b1 * mj + (1 - b1) * gj
            sj = b2 * sj + (1 - b2) * gj * gj
            mh = mj / (1 - b1 ** (i + 1.0))
            sh = sj / (1 - b2 ** (i + 1.0))
            new_p.append(pj - lrj * (decay ** i) * mh / (jnp.sqrt(sh) + eps))
            new_m.append(mj)
            new_s.append(sj)
        return (tuple(new_p), tuple(new_m), tuple(new_s)), None

    v0 = jnp.zeros(q0.shape[:-1] + (3,), jnp.float32)
    params = (pc0, v0)
    zeros = (jnp.zeros_like(pc0), jnp.zeros_like(v0))
    (params, _, _), _ = jax.lax.scan(
        body, (params, zeros, zeros), jnp.arange(steps, dtype=jnp.float32)
    )
    pc, v = params
    return pc, _apply_tangent(v, q0), -loss(params)


def calibrate_geometry(
    patterns: np.ndarray,
    init_quats: np.ndarray,
    geometry: DetectorGeometry | None = None,
    reflectors: Reflectors | None = None,
    steps: int = 80,
    lr_pc: float = 2e-3,
    lr_orientation: float = 2e-3,
    edge_frac: float = 0.25,
) -> tuple[DetectorGeometry, np.ndarray, float]:
    """Fit (pcx, pcy, dd) jointly with per-pattern orientation corrections.

    Args:
        patterns: ``(B, H, W)`` calibration patterns — a dozen scan points
            at diverse orientations breaks the PC/rotation degeneracy.
        init_quats: ``(B, 4)`` dictionary-indexed orientations (within a
            few degrees).
        geometry: the nominal geometry (the optimization starting point;
            ``tilt`` is held fixed).
        reflectors / steps / edge_frac: as in `sim.refine`.
        lr_pc: Adam scale for the pattern-center parameters, in detector-
            width units per step.
        lr_orientation: tangent scale for the orientation corrections, rad.

    Returns:
        ``(calibrated DetectorGeometry, refined quats (B, 4), mean NCC)``.
    """
    geometry = geometry or DetectorGeometry()
    reflectors = reflectors or cubic_reflectors()
    x = np.asarray(patterns, np.float32)
    q0 = np.asarray(init_quats, np.float32)
    if x.ndim != 3 or x.shape[1:] != geometry.shape:
        raise ValueError(
            f"expected (B, {geometry.shape[0]}, {geometry.shape[1]}) "
            f"patterns, got {x.shape}"
        )
    if q0.shape != (len(x), 4):
        raise ValueError(f"init_quats must be ({len(x)}, 4), got {q0.shape}")
    q0 = q0 / np.linalg.norm(q0, axis=1, keepdims=True)

    pc, quats, total = _calibrate(
        jnp.asarray(x.reshape(len(x), -1)),
        jnp.asarray(q0),
        jnp.asarray([geometry.pcx, geometry.pcy, geometry.dd], jnp.float32),
        jnp.float32(np.radians(geometry.tilt)),
        jnp.asarray(reflectors.normals),
        jnp.asarray(reflectors.sin_theta),
        jnp.asarray(reflectors.intensity),
        jnp.float32(lr_pc),
        jnp.float32(lr_orientation),
        shape=geometry.shape,
        steps=steps,
        edge_frac=edge_frac,
    )
    pc = np.asarray(pc, np.float64)
    fitted = DetectorGeometry(
        shape=geometry.shape, pcx=float(pc[0]), pcy=float(pc[1]),
        dd=float(pc[2]), tilt=geometry.tilt,
    )
    return fitted, np.asarray(quats), float(total) / len(x)
