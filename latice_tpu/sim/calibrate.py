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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.sim.geometry import DetectorGeometry
from latice_tpu.sim.kinematical import Reflectors, cubic_reflectors, _quat_rotate
from latice_tpu.sim.refine import _apply_tangent, _simulate_flat

__all__ = ["ScanCalibration", "calibrate_geometry", "calibrate_scan_geometry"]


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


def _simulate_flat_per_pattern(quats, dirs, normals, sin_theta, intensity,
                               edge_frac):
    """`refine._simulate_flat` with PER-PATTERN pixel directions (B, P, 3)
    — each pattern renders through its own scan-position-dependent
    geometry. Same band model, same standardization."""
    n_det = _quat_rotate(quats, normals)
    sines = jnp.einsum(
        "bpc,bkc->bpk", dirs, n_det, precision=jax.lax.Precision.HIGHEST
    )
    half = sin_theta[None, None, :]
    soft = jnp.maximum(half * edge_frac, 1e-6)
    profile = jax.nn.sigmoid((half - jnp.abs(sines)) / soft)
    x = jnp.einsum(
        "bpk,k->bp", profile, intensity,
        precision=jax.lax.Precision.HIGHEST,
    )
    x = x - jnp.mean(x, axis=1, keepdims=True)
    return x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)


@functools.partial(jax.jit, static_argnames=("shape", "steps", "edge_frac"))
def _calibrate_scan(patterns, q0, s_xy, pc0, g0, tilt_rad, normals,
                    sin_theta, intensity, lr_pc, lr_g, lr_v, *, shape,
                    steps, edge_frac):
    """Joint Adam fit of (PC₀, G, per-pattern orientation tangents) where
    pattern ``i`` renders through ``PC₀ + G @ s_xy[i]``."""
    p = patterns - jnp.mean(patterns, axis=1, keepdims=True)
    p = p / (jnp.linalg.norm(p, axis=1, keepdims=True) + 1e-12)
    dirs_fn = jax.vmap(
        lambda pc: _pixel_directions_jax(shape, pc[0], pc[1], pc[2], tilt_rad)
    )

    def loss(params):
        pc0_, g_, v = params
        pc = pc0_[None, :] + s_xy @ g_.T  # (B, 3)
        x = _simulate_flat_per_pattern(
            _apply_tangent(v, q0), dirs_fn(pc), normals, sin_theta,
            intensity, edge_frac,
        )
        return -jnp.sum(x * p)

    grad_fn = jax.grad(loss)
    b1, b2, eps = 0.9, 0.999, 1e-8
    # Decay deeper than the shared-PC fit (1/30): the affine fit is run
    # longer (hundreds of steps) and the final factor sets the resolution
    # floor of the recovered gradient.
    decay = (1.0 / 100.0) ** (1.0 / max(steps - 1, 1))
    lr = (lr_pc, lr_g, lr_v)

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
    params = (pc0, g0, v0)
    zeros = (jnp.zeros_like(pc0), jnp.zeros_like(g0), jnp.zeros_like(v0))
    (params, _, _), _ = jax.lax.scan(
        body, (params, zeros, zeros), jnp.arange(steps, dtype=jnp.float32)
    )
    pc0_, g_, v = params
    return pc0_, g_, _apply_tangent(v, q0), -loss(params)


class ScanCalibration(NamedTuple):
    """Affine scan-varying pattern-center model ``PC(xy) = pc0 + G @ xy``.

    ``xy`` is in the SAME units `calibrate_scan_geometry` received
    (``pc0`` sits at the caller's scan origin). `pc_at`/`geometry_at`
    evaluate the model at arbitrary scan positions.
    """

    pc0: np.ndarray  # (3,) [pcx, pcy, dd] at scan origin
    gradient: np.ndarray  # (3, 2) d[pcx, pcy, dd] / d[scan_x, scan_y]
    shape: tuple
    tilt: float

    def pc_at(self, xy) -> np.ndarray:
        """``(..., 2)`` scan positions → ``(..., 3)`` pattern centers."""
        xy = np.asarray(xy, np.float64)
        return self.pc0 + xy @ self.gradient.T

    def geometry_at(self, xy) -> DetectorGeometry:
        """The `DetectorGeometry` at one scan position."""
        pc = self.pc_at(np.asarray(xy, np.float64).reshape(2))
        return DetectorGeometry(
            shape=self.shape, pcx=float(pc[0]), pcy=float(pc[1]),
            dd=float(pc[2]), tilt=self.tilt,
        )


def calibrate_scan_geometry(
    patterns: np.ndarray,
    init_quats: np.ndarray,
    scan_xy: np.ndarray,
    geometry: DetectorGeometry | None = None,
    reflectors: Reflectors | None = None,
    steps: int = 300,
    lr_pc: float = 2e-3,
    lr_gradient: float | None = None,
    lr_orientation: float = 2e-3,
    edge_frac: float = 0.25,
) -> tuple[ScanCalibration, np.ndarray, float]:
    """Fit an affine scan-varying pattern center ``PC(xy) = PC₀ + G·xy``.

    The production model: as the beam rasters the sample, the source point
    moves under a fixed detector, so the projection center shifts linearly
    with scan position (EMsoft/kikuchipy expose the same affine PC model).
    Fitting the *gradient* G jointly with PC₀ and per-pattern orientation
    corrections is what a shared-PC fit cannot do — `calibrate_geometry`'s
    docstring documents the PC↔rotation near-degeneracy that caps it at
    ~90% error removal; the scan-to-scan PC *differences* constrain G
    through the same patterns, and the affine constraint (9 shared
    parameters across the whole scan) is strongly overdetermined.

    Args:
        patterns: ``(B, H, W)`` calibration patterns across the scan —
            spread them over the full scan extent (corners + center beat
            a tight cluster: G is constrained by the spanned area).
        init_quats: ``(B, 4)`` indexed orientations (within a few degrees);
            pass known orientations with ``lr_orientation=0`` to pin them
            (the metrological mode, same as `calibrate_geometry`).
        scan_xy: ``(B, 2)`` scan positions, any units (µm, steps, fractions)
            — the returned gradient is per THIS unit. Positions are
            centered/rescaled internally for conditioning only.
        geometry: nominal starting geometry (``tilt`` held fixed).
        reflectors / steps / edge_frac: as in `calibrate_geometry`.
        lr_pc: Adam scale of PC₀, detector widths per step.
        lr_gradient: Adam scale of G in NORMALIZED scan units (±1 spans the
            scan); default ``lr_pc`` — a full-scan PC swing is the same
            order as a PC offset.
        lr_orientation: tangent scale of the orientation corrections, rad.

    Returns:
        ``(ScanCalibration, refined quats (B, 4), mean NCC)``.
    """
    geometry = geometry or DetectorGeometry()
    reflectors = reflectors or cubic_reflectors()
    x = np.asarray(patterns, np.float32)
    q0 = np.asarray(init_quats, np.float32)
    s = np.asarray(scan_xy, np.float64)
    if x.ndim != 3 or x.shape[1:] != geometry.shape:
        raise ValueError(
            f"expected (B, {geometry.shape[0]}, {geometry.shape[1]}) "
            f"patterns, got {x.shape}"
        )
    if q0.shape != (len(x), 4):
        raise ValueError(f"init_quats must be ({len(x)}, 4), got {q0.shape}")
    if s.shape != (len(x), 2):
        raise ValueError(f"scan_xy must be ({len(x)}, 2), got {s.shape}")
    q0 = q0 / np.linalg.norm(q0, axis=1, keepdims=True)

    # Condition the scan coordinates: center on the centroid, scale each
    # axis to ±1. The fit runs in normalized units; the returned model is
    # converted back to the caller's units (identical model, different
    # parameterization).
    centroid = s.mean(axis=0)
    span = np.abs(s - centroid).max(axis=0)
    span = np.where(span > 0, span, 1.0)  # a constant axis fits G column 0
    s_hat = (s - centroid) / span

    if lr_gradient is None:
        lr_gradient = lr_pc
    pc0_hat, g_hat, quats, total = _calibrate_scan(
        jnp.asarray(x.reshape(len(x), -1)),
        jnp.asarray(q0),
        jnp.asarray(s_hat, jnp.float32),
        jnp.asarray([geometry.pcx, geometry.pcy, geometry.dd], jnp.float32),
        jnp.zeros((3, 2), jnp.float32),
        jnp.float32(np.radians(geometry.tilt)),
        jnp.asarray(reflectors.normals),
        jnp.asarray(reflectors.sin_theta),
        jnp.asarray(reflectors.intensity),
        jnp.float32(lr_pc),
        jnp.float32(lr_gradient),
        jnp.float32(lr_orientation),
        shape=geometry.shape,
        steps=steps,
        edge_frac=edge_frac,
    )
    pc0_hat = np.asarray(pc0_hat, np.float64)
    g_hat = np.asarray(g_hat, np.float64)
    g_user = g_hat / span[None, :]  # undo the axis scaling
    pc0_user = pc0_hat - g_user @ centroid  # move origin back
    fit = ScanCalibration(
        pc0=pc0_user, gradient=g_user, shape=geometry.shape,
        tilt=geometry.tilt,
    )
    return fit, np.asarray(quats), float(total) / len(x)


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
