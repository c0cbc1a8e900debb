"""Kinematical Kikuchi-band renderer: reflector tables + batched XLA sim.

Physics model (self-contained; the reference has no simulation stage):

* Electron wavelength from the accelerating voltage with the relativistic
  correction: ``λ[Å] = 12.2643 / sqrt(V · (1 + 0.97845e-6 · V))``.
* Reflector list from the cubic structure: allowed ``{hkl}`` families by
  the lattice centering's extinction rules (fcc: h,k,l all even or all
  odd; bcc: h+k+l even; sc: all), expanded to every symmetry-equivalent
  individual reflector so rendered patterns are exactly invariant under the
  crystal's point group. Per-plane Bragg angle ``θ = asin(λ / 2d)`` with
  ``d = a / |hkl|`` — band *positions and widths* are exact.
* Band *intensities* are kinematically weighted with a single-element
  Debye-Waller-style falloff ``I ∝ exp(-(s/s0)²)``, ``s = 1/(2d)`` — a
  documented approximation standing in for atomic form factors (relative
  band geometry, which drives dictionary indexing, does not depend on it).
* A pixel with unit direction ``d`` sits inside the ``hkl`` band when its
  angle from the plane is below the Bragg angle: ``|d · n| < sin θ``. The
  band profile is a smooth top-hat between the two Kossel-cone traces with
  a soft edge (fraction of the band half-width), the first-order shape of
  an excess Kikuchi band.

TPU design: for a batch of orientations the hot op is one MXU contraction
``(P, 3) directions × (3, B·K) rotated normals`` followed by elementwise
profiles and a weighted reduction over K — no gathers, no texture lookups
(the master-pattern interpolation approach would be one big gather, the
TPU landmine). Memory is bounded by chunking the orientation batch so the
``(chunk, P, K)`` profile tensor stays ~100 MB.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.sim.geometry import DetectorGeometry, pixel_directions

__all__ = [
    "Reflectors",
    "cubic_reflectors",
    "electron_wavelength",
    "hexagonal_reflectors",
    "reflectors_from_cell",
    "simulate_patterns",
]


def electron_wavelength(kv: float) -> float:
    """Relativistic electron wavelength in Angstrom for ``kv`` kilovolts."""
    if kv <= 0:
        raise ValueError("accelerating voltage must be positive")
    v = kv * 1e3
    return 12.2643 / math.sqrt(v * (1.0 + 0.97845e-6 * v))


@dataclasses.dataclass(frozen=True)
class Reflectors:
    """Individual reflectors: unit plane normals (crystal frame), Bragg
    sines, and kinematical weights. ``normals[k]`` and ``-normals[k]`` give
    the same band, so only one hemisphere representative is kept."""

    normals: np.ndarray  # (K, 3) float32, unit
    sin_theta: np.ndarray  # (K,) float32
    intensity: np.ndarray  # (K,) float32, max-normalized

    def __len__(self) -> int:
        return len(self.normals)


# Conventional atomic bases per cubic centering; their structure factors
# reproduce the classical extinction rules exactly (fcc: all-even/all-odd;
# bcc: h+k+l even), pinned by the test-side rule oracle.
_BASES = {
    "fcc": (
        (0.0, 0.0, 0.0), (0.0, 0.5, 0.5), (0.5, 0.0, 0.5), (0.5, 0.5, 0.0),
    ),
    "bcc": ((0.0, 0.0, 0.0), (0.5, 0.5, 0.5)),
    "sc": ((0.0, 0.0, 0.0),),
}


def _direct_basis(a, b, c, alpha, beta, gamma):
    """Cartesian direct-lattice vectors (rows), standard crystallographic
    setting: a1 along x, a2 in the x-y plane."""
    al, be, ga = np.radians([alpha, beta, gamma])
    cx = c * math.cos(be)
    cy = c * (math.cos(al) - math.cos(be) * math.cos(ga)) / math.sin(ga)
    cz2 = c * c - cx * cx - cy * cy
    if cz2 <= 0:
        raise ValueError(
            f"degenerate cell: ({a}, {b}, {c}, {alpha}, {beta}, {gamma})"
        )
    return np.array(
        [
            [a, 0.0, 0.0],
            [b * math.cos(ga), b * math.sin(ga), 0.0],
            [cx, cy, math.sqrt(cz2)],
        ]
    )


def reflectors_from_cell(
    a: float,
    b: float | None = None,
    c: float | None = None,
    alpha: float = 90.0,
    beta: float = 90.0,
    gamma: float = 90.0,
    basis=((0.0, 0.0, 0.0),),
    kv: float = 20.0,
    max_hkl: int = 3,
    min_d: float = 0.8,
    s0: float = 0.6,
    min_rel_intensity: float = 1e-4,
    hkl_filter=None,
) -> Reflectors:
    """Reflector table for an arbitrary cell with structure-factor
    extinctions — the general engine behind `cubic_reflectors` /
    `hexagonal_reflectors`.

    Plane normals are the Cartesian reciprocal-lattice vectors (so non-cubic
    normals are NOT parallel to the direct [hkl] — the metric is handled
    exactly), d-spacings come from ``1/|g|``, and each reflector is weighted
    by ``|F_hkl|² · exp(-(s/s0)²)`` with the geometric structure factor
    ``F = Σ_j exp(2πi hkl·r_j)`` over the fractional ``basis`` positions
    (equal scattering power per site — single-species kinematical
    approximation; Friedel pairs are equal, so one hemisphere representative
    suffices). Reflections with relative ``|F|²`` below
    ``min_rel_intensity`` are extinct.

    Args:
        a / b / c: cell lengths, Angstrom (b, c default to a).
        alpha / beta / gamma: cell angles, degrees.
        basis: fractional atomic positions.
        hkl_filter: optional ``(h, k, l) -> bool mask`` restricting the
            swept index box — used to keep the table closed under the point
            group when the cubic box is not (hexagonal: ``|h+k|`` can
            exceed ``max_hkl`` under index permutations).
        kv / max_hkl / min_d / s0: as in `cubic_reflectors`.
    """
    b = a if b is None else b
    c = a if c is None else c
    lam = electron_wavelength(kv)
    direct = _direct_basis(a, b, c, alpha, beta, gamma)
    recip = np.linalg.inv(direct).T  # rows: b1, b2, b3 (Cartesian, 1/A)

    rng_idx = np.arange(-max_hkl, max_hkl + 1)
    h, k, l = np.meshgrid(rng_idx, rng_idx, rng_idx, indexing="ij")
    hkl = np.stack([h.ravel(), k.ravel(), l.ravel()], axis=1)
    hkl = hkl[np.any(hkl != 0, axis=1)]
    if hkl_filter is not None:
        hkl = hkl[hkl_filter(hkl[:, 0], hkl[:, 1], hkl[:, 2])]
    # One hemisphere representative per Friedel pair.
    keep = (
        (hkl[:, 0] > 0)
        | ((hkl[:, 0] == 0) & (hkl[:, 1] > 0))
        | ((hkl[:, 0] == 0) & (hkl[:, 1] == 0) & (hkl[:, 2] > 0))
    )
    hkl = hkl[keep]

    g = hkl @ recip  # (N, 3) Cartesian reciprocal vectors
    gnorm = np.linalg.norm(g, axis=1)
    d = 1.0 / gnorm
    ok = d >= min_d
    hkl, g, gnorm, d = hkl[ok], g[ok], gnorm[ok], d[ok]

    pos = np.asarray(basis, np.float64)
    phase = 2.0 * np.pi * (hkl @ pos.T)  # (N, M)
    f2 = np.cos(phase).sum(axis=1) ** 2 + np.sin(phase).sum(axis=1) ** 2
    # Normalize by the ABSOLUTE maximum |F|^2 = M^2 (all atoms in phase),
    # not by the surviving set's max: relative normalization would rescale
    # an all-extinct selection's numerical noise to 1.0 and let forbidden
    # reflections through (caught when min_d left only the {100} family).
    f2 = f2 / float(len(pos)) ** 2
    allowed = f2 > min_rel_intensity
    hkl, g, gnorm, d, f2 = (
        hkl[allowed], g[allowed], gnorm[allowed], d[allowed], f2[allowed]
    )
    if len(hkl) == 0:
        raise ValueError(
            f"no reflectors survive min_d={min_d} at max_hkl={max_hkl} for "
            "this cell/basis — lower min_d or raise max_hkl"
        )
    sin_theta = lam / (2.0 * d)
    if np.any(sin_theta >= 1.0):
        raise ValueError("Bragg condition unsatisfiable: raise min_d or kv")
    s = 1.0 / (2.0 * d)
    intensity = f2 * np.exp(-((s / s0) ** 2))
    intensity = intensity / intensity.max()
    return Reflectors(
        normals=(g / gnorm[:, None]).astype(np.float32),
        sin_theta=sin_theta.astype(np.float32),
        intensity=intensity.astype(np.float32),
    )


def hexagonal_reflectors(
    a: float = 2.95,
    c: float = 4.68,
    kv: float = 20.0,
    max_hkl: int = 3,
    min_d: float = 0.8,
    s0: float = 0.6,
) -> Reflectors:
    """hcp reflector table (default: alpha-titanium). The swept index box is
    restricted to ``|h + k| <= max_hkl`` so the table stays exactly closed
    under the 622 point group (index permutations map (h, k) → (k, -h-k)).
    Pairs with the "622" symmetry group in multi-phase dictionaries."""
    return reflectors_from_cell(
        a, a, c, 90.0, 90.0, 120.0,
        basis=((0.0, 0.0, 0.0), (1.0 / 3.0, 2.0 / 3.0, 0.5)),
        kv=kv, max_hkl=max_hkl, min_d=min_d, s0=s0,
        hkl_filter=lambda h, k, l: np.abs(h + k) <= max_hkl,
    )


def cubic_reflectors(
    structure: str = "fcc",
    a: float = 3.52,
    kv: float = 20.0,
    max_hkl: int = 3,
    min_d: float = 0.8,
    s0: float = 0.6,
) -> Reflectors:
    """Reflector table for a cubic structure.

    Args:
        structure: "fcc" | "bcc" | "sc" lattice centering.
        a: lattice parameter, Angstrom (default: nickel).
        kv: accelerating voltage, kilovolts.
        max_hkl: largest Miller index scanned.
        min_d: drop reflectors with d-spacing below this (Angstrom) —
            high-order bands too faint/thin to matter.
        s0: kinematical falloff scale in 1/Angstrom (see module docstring).

    Returns:
        `Reflectors` with one hemisphere representative per band, every
        point-group image of each allowed family included.

    One engine, two formulations: the centering's conventional atomic basis
    drives `reflectors_from_cell`, whose structure factor reproduces the
    classical extinction rules exactly (all-even/all-odd for fcc, h+k+l
    even for bcc) — the rule formulation lives on as the independent test
    oracle (tests/sim/test_kinematical.py) rather than as a second
    production code path.
    """
    if structure not in _BASES:
        raise ValueError(
            f"unknown structure {structure!r}; choose from {sorted(_BASES)}"
        )
    try:
        return reflectors_from_cell(
            a, kv=kv, max_hkl=max_hkl, min_d=min_d, s0=s0,
            basis=_BASES[structure],
        )
    except ValueError as e:
        if "no reflectors survive" in str(e):
            raise ValueError(
                f"no {structure} reflectors survive min_d={min_d} at "
                f"max_hkl={max_hkl} — lower min_d or raise max_hkl"
            ) from None
        raise


def _quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors ``v (K, 3)`` by quaternions ``q (B, 4)`` (scalar-first,
    crystal→detector): returns ``(B, K, 3)``."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # Rotation matrix rows from the quaternion (standard expansion).
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    # HIGHEST: a default-precision (bf16-MXU) 3x3 contraction moves the
    # rotated normals by ~1e-3, which bends band positions enough to floor
    # the autodiff refine/calibrate fits on TPU; the op is tiny.
    return jnp.einsum(
        "bij,kj->bki", r, v, precision=jax.lax.Precision.HIGHEST
    )


@functools.partial(jax.jit, static_argnames=("edge_frac", "out_uint8"))
def _render_chunk(quats, dirs, normals, sin_theta, intensity, edge_frac,
                  out_uint8):
    """Render one orientation chunk: (B, 4) → (B, P) minmax-normalized."""
    n_det = _quat_rotate(quats, normals)  # (B, K, 3)
    # The MXU contraction: every pixel direction against every rotated
    # plane normal. HIGHEST precision: band edges move visibly at bf16.
    sines = jnp.einsum(
        "pc,bkc->bpk", dirs, n_det, precision=jax.lax.Precision.HIGHEST
    )
    # Smooth top-hat between the Kossel cones: bright while |sin α| < sin θ,
    # with a soft edge a fixed fraction of the band half-width.
    half = sin_theta[None, None, :]
    soft = jnp.maximum(half * edge_frac, 1e-6)
    profile = jax.nn.sigmoid((half - jnp.abs(sines)) / soft)
    x = jnp.einsum("bpk,k->bp", profile, intensity)
    lo = jnp.min(x, axis=1, keepdims=True)
    hi = jnp.max(x, axis=1, keepdims=True)
    x = (x - lo) / jnp.maximum(hi - lo, 1e-8)
    if out_uint8:
        # Detector-native 8-bit: 4x less device->host traffic (the wall on
        # tunneled rigs) and the build/index planes' uint8 fast-path format.
        x = jnp.round(x * 255.0).astype(jnp.uint8)
    return x


def simulate_patterns(
    orientations: np.ndarray,
    geometry: DetectorGeometry | None = None,
    reflectors: Reflectors | None = None,
    edge_frac: float = 0.25,
    chunk: int = 64,
    angles_in_degrees: bool = False,
    dtype: type = np.float32,
) -> np.ndarray:
    """Render kinematical Kikuchi patterns for a batch of orientations.

    Args:
        orientations: ``(B, 4)`` scalar-first quaternions (crystal→detector),
            or ``(B, 3)`` zxz Euler *degrees* with ``angles_in_degrees=True``
            (the anglefile convention).
        geometry: detector description (default `DetectorGeometry()`).
        reflectors: reflector table (default `cubic_reflectors()` — fcc Ni
            at 20 kV).
        edge_frac: band-edge softness as a fraction of the band half-width.
        chunk: orientations per device dispatch (bounds the (chunk, P, K)
            profile tensor).
        angles_in_degrees: interpret ``orientations`` as zxz Euler degrees.
        dtype: ``np.float32`` (default; [0, 1] minmax per pattern, the VAE
            input contract) or ``np.uint8`` (detector-native 8-bit — 4x
            less device→host traffic and the index planes' fast-path
            format).

    Returns:
        ``(B, H, W)`` patterns, min-max normalized per pattern.
    """
    if dtype not in (np.float32, np.uint8):
        raise ValueError("dtype must be np.float32 or np.uint8")
    geometry = geometry or DetectorGeometry()
    reflectors = reflectors or cubic_reflectors()
    o = np.asarray(orientations, np.float32)
    if angles_in_degrees or (o.ndim == 2 and o.shape[1] == 3):
        from scipy.spatial.transform import Rotation as R

        quats = np.roll(
            R.from_euler("zxz", o, degrees=True).as_quat(), 1, axis=1
        ).astype(np.float32)
    elif o.ndim == 2 and o.shape[1] == 4:
        quats = o / np.linalg.norm(o, axis=1, keepdims=True)
    else:
        raise ValueError(f"expected (B, 4) quats or (B, 3) Euler deg, got {o.shape}")

    h, w = geometry.shape
    dirs = jnp.asarray(pixel_directions(geometry).reshape(-1, 3))
    normals = jnp.asarray(reflectors.normals)
    sin_t = jnp.asarray(reflectors.sin_theta)
    inten = jnp.asarray(reflectors.intensity)

    b = len(quats)
    out = np.empty((b, h * w), dtype)
    # Two-phase dispatch with a bounded in-flight window: a few queued
    # chunks overlap transfers with compute, while materializing the oldest
    # keeps device residency at O(window · chunk · P) — an unbounded queue
    # would hold the ENTIRE stack in HBM (a 1°-resolution cubic dictionary
    # is ~10 GB of patterns).
    window = 4
    pending: list[tuple[int, int, jax.Array]] = []

    def _drain_one():
        start, n, dev = pending.pop(0)
        out[start : start + n] = np.asarray(dev)[:n]

    for start in range(0, b, chunk):
        qc = quats[start : start + chunk]
        n = len(qc)
        if n < chunk:  # pad to the static compile shape
            qc = np.concatenate([qc, np.tile(qc[-1:], (chunk - n, 1))])
        pending.append(
            (start, n,
             _render_chunk(jnp.asarray(qc), dirs, normals, sin_t, inten,
                           edge_frac, dtype == np.uint8))
        )
        if len(pending) > window:
            _drain_one()
    while pending:
        _drain_one()
    return out.reshape(b, h, w)
