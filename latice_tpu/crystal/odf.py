"""Orientation distribution functions: kernel density on SO(3), texture index.

The ODF ``f(g)`` — the probability density of crystal orientations in
multiples of the uniform (random) texture — is the quantitative texture
description behind pole figures (utils/polefigure.py renders projections of
it). The reference has no texture quantification at all; MTEX users expect
``calcDensity``/``textureindex``/φ2 sections, which this module provides.

Estimator: kernel density with the de la Vallée Poussin kernel

    K_κ(ω) = C(κ) · cos^{2κ}(ω/2),   C(κ) = √π · Γ(κ+2) / Γ(κ+1/2)

(the standard texture kernel — finite bandwidth, no Gibbs ringing), where ω
is the misorientation angle and C normalizes ∫ K dg = 1 over normalized
Haar measure, so a uniform orientation set evaluates to f ≡ 1. Crystal
symmetry enters exactly: f(g) = mean over samples i and operators s of
K(ω(g, s·g_i)), with the hemisphere identification q ≅ -q via |dot|.

TPU design. cos(ω/2) = |⟨q_g, q_sample⟩|, so evaluation is ONE matmul:
expand the (few) evaluation points by the symmetry group — moving the
operators onto the query side, ⟨g, s ⊗ g_i⟩ = ⟨s⁻¹ ⊗ g, g_i⟩, keeps the
(large) sample set unexpanded — then ``(P·S, 4) @ (4, N)`` on the MXU, an
elementwise power, and a mean. No per-sample loops, no gathers; the whole
map's ODF evaluation is one jitted program.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.crystal.quaternion import from_euler_zxz_deg, quat_inv, quat_mul
from latice_tpu.crystal.symmetry import symmetry_quats

__all__ = [
    "ODF",
    "evaluate_odf",
    "halfwidth_to_kappa",
    "make_odf",
    "odf_sections",
    "texture_index",
]


def halfwidth_to_kappa(halfwidth_deg: float) -> float:
    """Kernel shape κ from the half-width at half-maximum (degrees).

    Solves ``cos^{2κ}(ω_h/2) = 1/2``: κ = ln2 / (-2·ln cos(ω_h/2)).
    MTEX's default 10° half-width gives κ ≈ 91.
    """
    if not 0 < halfwidth_deg <= 180:
        raise ValueError(f"halfwidth must be in (0, 180] deg, got {halfwidth_deg}")
    c = math.cos(math.radians(halfwidth_deg) / 2.0)
    return math.log(2.0) / (-2.0 * math.log(c))


def _kernel_norm(kappa: float) -> float:
    """C(κ) with ∫ C·cos^{2κ}(ω/2) dg = 1 over normalized Haar measure.

    The Haar density of the rotation angle is (2/π)·sin²(ω/2); the Beta
    integral gives C = √π·Γ(κ+2)/Γ(κ+1/2) (C(0) = 1: the flat kernel).
    """
    from scipy.special import gammaln

    return float(np.exp(0.5 * np.log(np.pi) + gammaln(kappa + 2.0) - gammaln(kappa + 0.5)))


class ODF(NamedTuple):
    """A kernel-density ODF model (host-resident; evaluation is jitted)."""

    #: (N, 4) unit sample quaternions, scalar-first, float32.
    samples: np.ndarray
    #: (N,) normalized weights (sum 1), e.g. grain areas; uniform if None.
    weights: np.ndarray | None
    #: de la Vallée Poussin kernel shape.
    kappa: float
    #: Proper rotation point group name.
    group: str


def make_odf(
    euler_deg: np.ndarray,
    group: str = "432",
    halfwidth_deg: float = 10.0,
    weights: np.ndarray | None = None,
) -> ODF:
    """Build a kernel-density ODF from measured orientations.

    Args:
        euler_deg: ``(N, 3)`` (or any leading shape) zxz extrinsic Euler
            degrees — per-pixel map output or per-grain mean orientations.
        group: Proper rotation point group (`crystal.ROTATION_GROUPS`).
        halfwidth_deg: Kernel half-width at half-maximum. Smaller = sharper
            texture resolution but needs more samples.
        weights: Optional per-orientation weights (e.g. grain areas);
            normalized internally.
    """
    euler = np.asarray(euler_deg, np.float32).reshape(-1, 3)
    if len(euler) == 0:
        raise ValueError("no orientations given")
    q = np.asarray(from_euler_zxz_deg(jnp.asarray(euler)), np.float32)
    w = None
    if weights is not None:
        w = np.asarray(weights, np.float64).reshape(-1)
        if len(w) != len(euler):
            raise ValueError(
                f"{len(w)} weights for {len(euler)} orientations"
            )
        if (w < 0).any() or w.sum() <= 0:
            raise ValueError("weights must be non-negative with positive sum")
        w = (w / w.sum()).astype(np.float32)
    # Validate the group name eagerly (symmetry_quats raises on typos).
    symmetry_quats(group)
    return ODF(
        samples=q,
        weights=w,
        kappa=halfwidth_to_kappa(halfwidth_deg),
        group=group,
    )


@jax.jit
def _odf_values(
    points: jax.Array,  # (P, 4)
    samples: jax.Array,  # (N, 4)
    weights: jax.Array,  # (N,)
    sym: jax.Array,  # (S, 4)
    kappa: jax.Array,  # scalar
    norm: jax.Array,  # scalar C(κ)
) -> jax.Array:
    # ⟨g, s ⊗ q_i⟩ = ⟨s⁻¹ ⊗ g, q_i⟩: expand the points, not the samples.
    expanded = quat_mul(quat_inv(sym)[None, :, :], points[:, None, :])  # (P, S, 4)
    p, s, _ = expanded.shape
    # HIGHEST precision: the dot feeds cos^{2κ} with κ ~ 10²; a bf16-level
    # error δ near dot=1 multiplies the kernel by e^{2κδ} — order-unity.
    dots = jnp.abs(
        jnp.matmul(
            expanded.reshape(p * s, 4),
            samples.T,
            precision=jax.lax.Precision.HIGHEST,
        )
    )  # (P·S, N)
    # cos^{2κ} via exp(2κ·log): stable for κ up to thousands; dots==0 -> 0.
    k = jnp.power(jnp.maximum(dots, 1e-30), 2.0 * kappa)
    k = k.reshape(p, s, -1).mean(axis=1)  # (P, N) symmetry-averaged
    return norm * (k @ weights)


def evaluate_odf(odf: ODF, euler_deg: np.ndarray) -> np.ndarray:
    """ODF values (multiples of uniform) at zxz Euler points ``(..., 3)``."""
    euler = np.asarray(euler_deg, np.float32)
    lead = euler.shape[:-1]
    q = from_euler_zxz_deg(jnp.asarray(euler.reshape(-1, 3)))
    n = len(odf.samples)
    w = odf.weights if odf.weights is not None else np.full(n, 1.0 / n, np.float32)
    vals = _odf_values(
        q,
        jnp.asarray(odf.samples),
        jnp.asarray(w),
        symmetry_quats(odf.group),
        jnp.float32(odf.kappa),
        jnp.float32(_kernel_norm(odf.kappa)),
    )
    return np.asarray(vals).reshape(lead)


def texture_index(odf: ODF, n: int = 16384, seed: int = 0) -> float:
    """Texture index J = ∫ f(g)² dg (1 = random, → ∞ for single crystal).

    Monte-Carlo over Haar-uniform orientations (Shoemake map). This is the
    index of the *kernel-smoothed* ODF — like MTEX's ``textureindex``, it
    carries the kernel's own sharpening bias of order C(κ)/N_samples, so
    compare values only at matching half-widths.
    """
    rng = np.random.default_rng(seed)
    u = rng.uniform(size=(n, 3))
    # Shoemake: uniform unit quaternions from three uniforms.
    q = np.stack(
        [
            np.sqrt(1 - u[:, 0]) * np.sin(2 * np.pi * u[:, 1]),
            np.sqrt(1 - u[:, 0]) * np.cos(2 * np.pi * u[:, 1]),
            np.sqrt(u[:, 0]) * np.sin(2 * np.pi * u[:, 2]),
            np.sqrt(u[:, 0]) * np.cos(2 * np.pi * u[:, 2]),
        ],
        axis=-1,
    ).astype(np.float32)
    nsamp = len(odf.samples)
    w = odf.weights if odf.weights is not None else np.full(nsamp, 1.0 / nsamp, np.float32)
    vals = _odf_values(
        jnp.asarray(q),
        jnp.asarray(odf.samples),
        jnp.asarray(w),
        symmetry_quats(odf.group),
        jnp.float32(odf.kappa),
        jnp.float32(_kernel_norm(odf.kappa)),
    )
    return float(np.mean(np.square(np.asarray(vals))))


def odf_sections(
    odf: ODF,
    phi2_deg: Sequence[float] = (0.0, 45.0, 65.0),
    phi1_max_deg: float = 90.0,
    phi_max_deg: float = 90.0,
    resolution_deg: float = 2.5,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Constant-φ2 ODF sections — the standard texture figure.

    Returns ``(sections, phi1_axis, phi_axis)`` where ``sections`` has shape
    ``(len(phi2_deg), len(phi_axis), len(phi1_axis))`` (Φ down the rows, φ1
    across the columns, as conventionally plotted). Default ranges are the
    cubic/orthotropic 90°×90° convention with MTEX's φ2 ∈ {0°, 45°, 65°}.
    """
    phi1 = np.arange(0.0, phi1_max_deg + 1e-6, resolution_deg, dtype=np.float32)
    phi = np.arange(0.0, phi_max_deg + 1e-6, resolution_deg, dtype=np.float32)
    p1, p = np.meshgrid(phi1, phi)  # (nPhi, nphi1)
    out = np.empty((len(phi2_deg), *p1.shape), np.float32)
    for i, phi2 in enumerate(phi2_deg):
        pts = np.stack([p1, p, np.full_like(p1, phi2)], axis=-1)
        out[i] = evaluate_odf(odf, pts)
    return out, phi1, phi
