"""Geometrically necessary dislocation (GND) density from orientation maps.

The measurable part of Nye's dislocation density tensor follows from the
lattice-curvature field of a 2-D EBSD map (Pantleon, Scripta Mater. 58
(2008) 994): with the curvature ``κ_ij = ∂ω_i/∂x_j`` (ω the lattice
rotation vector in sample coordinates) and only in-plane gradients
observable (``∂/∂x_3`` unknown), five Nye entries are fully determined:

    α_12 = κ_21    α_13 = κ_31    α_21 = κ_12    α_23 = κ_32
    α_33 = −κ_11 − κ_22

The scalar density reported here is the entrywise norm of those five over
the Burgers vector length — a *lower bound* on the total GND density (the
four unmeasured entries can only add). This is the standard
map-level estimate (MTEX ``calcGND``'s curvature input; HR-EBSD pipelines
refine it with elastic strains, out of scope for Hough-class data).

Conventions: ``x_1`` = map columns (east+), ``x_2`` = map rows (south+),
``x_3`` = out of plane; orientations are the repo's sample→crystal ``g``
(utils/polefigure.py), so the relative lattice rotation from pixel a to
its neighbor b in sample coordinates is ``g_b⁻¹ ⊗ s ⊗ g_a`` minimized
over the crystal symmetry ``s``. Everything is one jitted program per map;
forward differences across grain boundaries (disorientation above the
threshold) and the last row/column are masked out.

The reference has no plasticity analysis at all; this extends the grain
plane (crystal/maps.py) the way its users would reach for MTEX.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.crystal.quaternion import from_euler_zxz_deg, quat_mul
from latice_tpu.crystal.symmetry import symmetry_quats

__all__ = ["GndResult", "gnd_density", "lattice_curvature"]


class GndResult(NamedTuple):
    """Result of `gnd_density` (host arrays, pixel-indexed)."""

    #: GND density lower bound (1/m²); NaN where not measurable (boundary
    #: or map-edge pixels whose forward differences are unavailable).
    density: np.ndarray
    #: The five measurable Nye entries ``(H, W, 5)`` in 1/m, ordered
    #: [α_12, α_13, α_21, α_23, α_33]; NaN where not measurable.
    alpha: np.ndarray
    #: True where both forward differences were within-grain and in-bounds.
    valid: np.ndarray


def _rotation_vector(q: jax.Array) -> jax.Array:
    """Rotation vector (axis·angle, radians) of unit quaternions (..., 4).

    Small-angle safe: ω = v · θ/sin(θ/2) with θ = 2·atan2(‖v‖, |w|); the
    factor → 2 as ‖v‖ → 0 (the curvature regime, fractions of a degree).
    """
    w = jnp.abs(q[..., 0])
    v = jnp.where(q[..., :1] < 0, -q[..., 1:], q[..., 1:])
    norm = jnp.linalg.norm(v, axis=-1)
    theta = 2.0 * jnp.arctan2(norm, w)
    factor = jnp.where(norm > 1e-12, theta / jnp.maximum(norm, 1e-12), 2.0)
    return v * factor[..., None]


@jax.jit
def _curvature_fields(
    euler_deg: jax.Array, sym: jax.Array, cos_half_threshold: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(H, W, 3) Euler grid -> east/south lattice-rotation vectors + validity.

    Returns (omega_east (H, W, 3) rad, omega_south, valid_east, valid_south);
    the rotation vectors are the symmetry-reduced relative rotations
    ``g_b⁻¹ ⊗ s* ⊗ g_a`` in sample coordinates, zero-padded on the last
    column/row (marked invalid).
    """
    q = from_euler_zxz_deg(euler_deg)  # (H, W, 4)
    conj = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)

    def reduced(qa_conjless, qb_conj):
        # relative rotation qb⁻¹ ⊗ s ⊗ qa, s chosen to minimize the angle.
        imgs = quat_mul(sym, qa_conjless[..., None, :])  # (..., S, 4)
        rel = quat_mul(qb_conj[..., None, :], imgs)  # (..., S, 4)
        best = jnp.argmax(jnp.abs(rel[..., 0]), axis=-1)
        pick = jax.nn.one_hot(best, rel.shape[-2], dtype=rel.dtype)
        rel = (rel * pick[..., None]).sum(axis=-2)
        return _rotation_vector(rel), jnp.abs(rel[..., 0])

    omega_e, cos_e = reduced(q[:, :-1], conj[:, 1:])  # (H, W-1, ...)
    omega_s, cos_s = reduced(q[:-1, :], conj[1:, :])  # (H-1, W, ...)
    valid_e = jnp.pad(cos_e >= cos_half_threshold, ((0, 0), (0, 1)))
    valid_s = jnp.pad(cos_s >= cos_half_threshold, ((0, 1), (0, 0)))
    omega_e = jnp.pad(omega_e, ((0, 0), (0, 1), (0, 0)))
    omega_s = jnp.pad(omega_s, ((0, 1), (0, 0), (0, 0)))
    return omega_e, omega_s, valid_e, valid_s


def lattice_curvature(
    euler_deg: np.ndarray,
    step_um: float = 1.0,
    group: str = "432",
    threshold_deg: float = 5.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """In-plane lattice curvature columns of an orientation map.

    Args:
        euler_deg: ``(H, W, 3)`` zxz Euler degrees (`IndexPipeline` grid).
        step_um: scan step in micrometres (square grid assumed).
        group: proper rotation point group of the phase.
        threshold_deg: neighbor disorientations above this are grain
            boundaries — their differences are masked, not differentiated.

    Returns:
        ``(kappa_1, kappa_2, valid)``: two ``(H, W, 3)`` float64 arrays with
        ``κ_i1 = ∂ω_i/∂x_1`` (east forward difference) and ``κ_i2`` (south),
        in rad/m, NaN where masked; and the ``(H, W)`` bool mask where both
        are measurable.
    """
    euler = np.asarray(euler_deg, np.float32)
    if euler.ndim != 3 or euler.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) Euler grid, got {euler.shape}")
    if euler.shape[0] < 2 or euler.shape[1] < 2:
        raise ValueError("orientation map must be at least 2x2")
    if step_um <= 0:
        raise ValueError(f"step_um must be positive, got {step_um}")
    sym = symmetry_quats(group)
    cos_half = jnp.float32(np.cos(np.radians(threshold_deg) / 2.0))
    omega_e, omega_s, valid_e, valid_s = _curvature_fields(
        jnp.asarray(euler), sym, cos_half
    )
    step_m = float(step_um) * 1e-6
    kappa_1 = np.asarray(omega_e, np.float64) / step_m
    kappa_2 = np.asarray(omega_s, np.float64) / step_m
    valid_e = np.asarray(valid_e)
    valid_s = np.asarray(valid_s)
    kappa_1[~valid_e] = np.nan
    kappa_2[~valid_s] = np.nan
    return kappa_1, kappa_2, valid_e & valid_s


def gnd_density(
    euler_deg: np.ndarray,
    step_um: float = 1.0,
    burgers_nm: float = 0.25,
    group: str = "432",
    threshold_deg: float = 5.0,
) -> GndResult:
    """Measurable-Nye GND density lower bound of an orientation map.

    Args:
        euler_deg: ``(H, W, 3)`` zxz Euler degrees.
        step_um: scan step (µm).
        burgers_nm: Burgers vector length (nm) — e.g. fcc Ni 0.249,
            α-Fe 0.248, Al 0.286.
        group: proper rotation point group.
        threshold_deg: grain-boundary disorientation threshold; boundary
            differences are masked (boundaries are not GND content).

    Returns:
        GndResult with the 1/m² density map, the five Nye entries, and the
        validity mask.
    """
    if burgers_nm <= 0:
        raise ValueError(f"burgers_nm must be positive, got {burgers_nm}")
    kappa_1, kappa_2, valid = lattice_curvature(
        euler_deg, step_um, group, threshold_deg
    )
    # [α_12, α_13, α_21, α_23, α_33] per Pantleon's measurable set.
    alpha = np.stack(
        [
            kappa_1[..., 1],
            kappa_1[..., 2],
            kappa_2[..., 0],
            kappa_2[..., 2],
            -(kappa_1[..., 0] + kappa_2[..., 1]),
        ],
        axis=-1,
    )
    b_m = float(burgers_nm) * 1e-9
    density = np.sqrt(np.sum(alpha**2, axis=-1)) / b_m
    density[~valid] = np.nan
    return GndResult(density=density, alpha=alpha, valid=valid)
