"""Master-pattern rendering: dictionary patterns by texture lookup.

The kinematical renderer (`sim.kinematical`) computes band geometry exactly
but approximates intensities; full dynamical simulations (Bloch-wave codes
like EMsoft) instead produce a *master pattern* — the diffraction intensity
for every scattering direction, simulated once per phase/voltage — from
which any detector pattern is a projection. This module renders dictionary
patterns from such a master: rotate each pixel's scattering direction into
the crystal frame and interpolate the master image there.

Convention (self-contained, documented here): the master is a square image
sampling the **north hemisphere** (z >= 0 in the crystal frame) through the
azimuthal equal-area (Lambert) map

    X = x * sqrt(2 / (1 + z)),   Y = y * sqrt(2 / (1 + z))

scaled so the image's inscribed circle (radius ``(N-1)/2`` px) is the
equator (|XY| = sqrt(2)); row index grows with -Y (image convention),
column with +X. Southern directions use the antipode — correct whenever
the phase's point group contains inversion or the master was made with
Friedel symmetry (every Laue group; true for kinematical and standard
dynamical masters). Masters stored in the *square* Lambert layout
(EMsoft-style) are imported with `resample_square_lambert` (CLI:
``simulate --master-layout square``) — a one-time offline resample.

Host-side on purpose: per-pixel texture interpolation is one giant gather
— the slowest memory pattern on TPU (see the perf-ledger landmines) — and
dictionary rendering is an offline, once-per-phase step. numpy + a
vectorized bilinear lookup renders ~10^3 patterns/s/core; the TPU stays
busy with the encode/index planes.

`make_kinematical_master` builds a master from this package's own band
model, giving a closed consistency loop: rendering through the master must
reproduce the direct renderer (pinned by test) — so the lookup geometry is
verified before a user trusts it with an external dynamical master.
"""

from __future__ import annotations

import numpy as np

from latice_tpu.sim.geometry import DetectorGeometry, pixel_directions
from latice_tpu.sim.kinematical import Reflectors, cubic_reflectors

__all__ = [
    "directions_to_lambert",
    "master_from_patterns",
    "lambert_to_directions",
    "make_kinematical_master",
    "render_from_master",
    "resample_square_lambert",
    "square_lambert_to_directions",
]


def directions_to_lambert(d: np.ndarray) -> np.ndarray:
    """Unit directions (..., 3) → equal-area coordinates (..., 2), using the
    NORTH-hemisphere image of each direction (antipode for z < 0)."""
    d = np.asarray(d, np.float64)
    d = np.where(d[..., 2:3] < 0, -d, d)
    a = np.sqrt(2.0 / np.clip(1.0 + d[..., 2], 1e-12, None))
    return np.stack([d[..., 0] * a, d[..., 1] * a], axis=-1)


def lambert_to_directions(xy: np.ndarray) -> np.ndarray:
    """Equal-area coordinates (..., 2) → north-hemisphere unit directions."""
    xy = np.asarray(xy, np.float64)
    r2 = np.sum(xy * xy, axis=-1)
    # |XY|^2 = 2(1-z) <= 2 on the hemisphere; clip for edge pixels.
    z = 1.0 - 0.5 * np.clip(r2, 0.0, 2.0)
    f = np.sqrt(np.clip(1.0 - r2 / 4.0, 0.0, None))
    return np.stack(
        [xy[..., 0] * f, xy[..., 1] * f, z], axis=-1
    )


def square_lambert_to_directions(ab: np.ndarray) -> np.ndarray:
    """Square-Lambert coordinates (..., 2) in [-1, 1]² → north-hemisphere
    unit directions.

    The *square* equal-area layout (Roşca's map, the layout dynamical
    codes like EMsoft store masters in) is the concentric square↔disc map
    (Shirley–Chiu) composed with the azimuthal equal-area projection this
    module uses: the square's center is the pole, its boundary the
    equator, and equal image areas subtend equal solid angles. Axis
    convention matches the circular layout: +a along +X, +b along +Y.
    """
    ab = np.asarray(ab, np.float64)
    a, b = ab[..., 0], ab[..., 1]
    # Concentric square -> disc: radius |max(|a|,|b|)|, angle interpolated
    # along the square's perimeter.
    with np.errstate(divide="ignore", invalid="ignore"):
        a_dom = np.abs(a) > np.abs(b)
        r = np.where(a_dom, a, b)
        phi = np.where(
            a_dom,
            (np.pi / 4.0) * np.where(a != 0, b / np.where(a == 0, 1, a), 0.0),
            np.pi / 2.0
            - (np.pi / 4.0)
            * np.where(b != 0, a / np.where(b == 0, 1, b), 0.0),
        )
    u = r * np.cos(phi)
    v = r * np.sin(phi)
    return lambert_to_directions(np.stack([u, v], axis=-1) * np.sqrt(2.0))


def _directions_to_square_lambert(d: np.ndarray) -> np.ndarray:
    """Inverse of `square_lambert_to_directions` (north image of each
    direction), used by the resampler."""
    xy = directions_to_lambert(d) / np.sqrt(2.0)  # disc of radius 1
    u, v = xy[..., 0], xy[..., 1]
    r = np.hypot(u, v)
    phi = np.arctan2(v, u)
    phi = np.where(phi < -np.pi / 4.0, phi + 2.0 * np.pi, phi)
    four_over_pi = 4.0 / np.pi
    a = np.select(
        [phi < np.pi / 4.0, phi < 3.0 * np.pi / 4.0, phi < 5.0 * np.pi / 4.0],
        [r, r * four_over_pi * (np.pi / 2.0 - phi), -r],
        default=r * four_over_pi * (phi - 3.0 * np.pi / 2.0),
    )
    b = np.select(
        [phi < np.pi / 4.0, phi < 3.0 * np.pi / 4.0, phi < 5.0 * np.pi / 4.0],
        [r * four_over_pi * phi, r, -r * four_over_pi * (phi - np.pi)],
        default=-r,
    )
    return np.stack([a, b], axis=-1)


def resample_square_lambert(square: np.ndarray, size: int | None = None) -> np.ndarray:
    """Convert a square-Lambert master image to this module's circular
    equal-area convention (the layout `render_from_master` consumes).

    The one-time import step for externally-computed dynamical masters
    stored in the square layout (EMsoft-style): resampling is a bilinear
    lookup per target pixel, exact at the pole and smooth through the
    equator. Source convention: square spans the north hemisphere, center
    = pole, boundary = equator, row grows with -b, column with +a (flip
    the source image first if its axes differ).

    Args:
        square: ``(N, N)`` square-Lambert master.
        size: output edge (default: same as input).

    Returns:
        ``(size, size)`` master in the circular convention.
    """
    m = np.asarray(square, np.float64)
    if m.ndim != 2 or m.shape[0] != m.shape[1] or m.shape[0] < 3:
        raise ValueError(
            f"square master must be (N, N) with N >= 3; got {m.shape}"
        )
    n_src = m.shape[0]
    size = size or n_src
    half = (size - 1) / 2.0
    ij = (np.arange(size, dtype=np.float64) - half) / half
    x, y = np.meshgrid(ij, -ij, indexing="xy")  # row grows with -Y
    d = lambert_to_directions(np.stack([x, y], axis=-1) * np.sqrt(2.0))
    ab = _directions_to_square_lambert(d)
    half_src = (n_src - 1) / 2.0
    col = np.clip(ab[..., 0] * half_src + half_src, 0.0, n_src - 1.0)
    row = np.clip(-ab[..., 1] * half_src + half_src, 0.0, n_src - 1.0)
    r0 = np.floor(row).astype(np.int64)
    c0 = np.floor(col).astype(np.int64)
    r1 = np.minimum(r0 + 1, n_src - 1)
    c1 = np.minimum(c0 + 1, n_src - 1)
    fr = row - r0
    fc = col - c0
    out = (
        m[r0, c0] * (1 - fr) * (1 - fc)
        + m[r0, c1] * (1 - fr) * fc
        + m[r1, c0] * fr * (1 - fc)
        + m[r1, c1] * fr * fc
    )
    return out.astype(np.float32)


def make_kinematical_master(
    size: int = 513, reflectors: Reflectors | None = None,
    edge_frac: float = 0.25,
) -> np.ndarray:
    """Render this package's band model onto the master grid — the
    consistency anchor for `render_from_master` (and a usable master when
    no dynamical simulation is available)."""
    reflectors = reflectors or cubic_reflectors()
    half = (size - 1) / 2.0
    ij = (np.arange(size, dtype=np.float64) - half) / half  # [-1, 1]
    X, Y = np.meshgrid(ij, -ij, indexing="xy")  # row grows with -Y
    xy = np.stack([X, Y], axis=-1) * np.sqrt(2.0)
    d = lambert_to_directions(xy)
    sines = d @ reflectors.normals.astype(np.float64).T  # (N, N, K)
    halfw = reflectors.sin_theta.astype(np.float64)
    soft = np.maximum(halfw * edge_frac, 1e-6)
    profile = 1.0 / (1.0 + np.exp(-(halfw - np.abs(sines)) / soft))
    img = profile @ reflectors.intensity.astype(np.float64)
    return img.astype(np.float32)


def render_from_master(
    master: np.ndarray,
    orientations: np.ndarray,
    geometry: DetectorGeometry | None = None,
    normalize: bool = True,
    chunk: int = 256,
) -> np.ndarray:
    """Render detector patterns by bilinear lookup into a master pattern.

    Args:
        master: ``(N, N)`` north-hemisphere master image in the module's
            equal-area convention (see module docstring).
        orientations: ``(B, 4)`` scalar-first quaternions (crystal→detector)
            or ``(B, 3)`` zxz Euler degrees — the same input contract as
            `simulate_patterns`.
        geometry: detector description.
        normalize: min-max normalize each pattern to [0, 1] (the VAE input
            contract).
        chunk: orientations per host pass — bounds the ``(chunk, P)``
            float32 intermediates (a 30k-orientation dictionary would
            otherwise materialize tens of GB at once).

    Returns:
        ``(B, H, W)`` float32 patterns.
    """
    from scipy.spatial.transform import Rotation as R

    m = np.asarray(master, np.float32)
    if m.ndim != 2 or m.shape[0] != m.shape[1] or m.shape[0] < 3:
        raise ValueError(f"master must be square (N, N), N >= 3; got {m.shape}")
    o = np.asarray(orientations, np.float64)
    if o.ndim == 2 and o.shape[1] == 3:
        rots = R.from_euler("zxz", o, degrees=True)
    elif o.ndim == 2 and o.shape[1] == 4:
        # scalar-first -> scipy's xyzw (normalizes internally)
        rots = R.from_quat(np.roll(o, -1, axis=1))
    else:
        raise ValueError(
            f"expected (B, 4) quaternions or (B, 3) Euler deg, got {o.shape}"
        )
    geometry = geometry or DetectorGeometry()
    h, w = geometry.shape
    dirs = pixel_directions(geometry).reshape(-1, 3).astype(np.float32)
    rot = rots.as_matrix().astype(np.float32)  # (B, 3, 3)

    n = m.shape[0]
    half = (n - 1) / 2.0
    b = len(rot)
    out = np.empty((b, h * w), np.float32)
    for start in range(0, b, chunk):
        rc = rot[start : start + chunk]
        # Detector directions -> crystal frame: d_c = R(q)^T d (the band
        # renderer rotates crystal normals INTO the detector frame).
        d_c = np.einsum("bji,pj->bpi", rc, dirs)
        xy = directions_to_lambert(d_c).astype(np.float32)
        col = np.clip(xy[..., 0] / np.sqrt(2.0) * half + half, 0.0, n - 1.0)
        row = np.clip(-xy[..., 1] / np.sqrt(2.0) * half + half, 0.0, n - 1.0)
        r0 = np.floor(row).astype(np.int32)
        c0 = np.floor(col).astype(np.int32)
        r1 = np.minimum(r0 + 1, n - 1)
        c1 = np.minimum(c0 + 1, n - 1)
        fr = (row - r0).astype(np.float32)
        fc = (col - c0).astype(np.float32)
        out[start : start + len(rc)] = (
            m[r0, c0] * (1 - fr) * (1 - fc)
            + m[r0, c1] * (1 - fr) * fc
            + m[r1, c0] * fr * (1 - fc)
            + m[r1, c1] * fr * fc
        )
    out = out.reshape(b, h, w)
    if normalize:
        lo = out.min(axis=(1, 2), keepdims=True)
        hi = out.max(axis=(1, 2), keepdims=True)
        out = (out - lo) / np.maximum(hi - lo, 1e-8)
    return out


def master_from_patterns(
    patterns: np.ndarray,
    orientations: np.ndarray,
    geometry: DetectorGeometry | None = None,
    size: int = 257,
    group: str | None = None,
    chunk: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Learn a master pattern FROM indexed experimental patterns.

    The inverse of `render_from_master`: every detector pixel of every
    pattern is a sample of the master at crystal direction ``Rᵀ d``
    (the rendering contract above), so an indexed scan — orientations
    from ANY plane: Hough, DI, spherical, the trained pipeline —
    back-projects into a master estimate by bilinear deposit on the
    equal-area grid. The standard use is phases without trustworthy
    simulations (or unknown detector physics): learn the master from a
    well-indexed region, then feed it to `render_from_master` /
    `SphericalIndexer` like any simulated one. (The
    kikuchipy/EMSphInx-style "experimental master" workflow; the
    reference has no simulation plane at all.)

    Args:
        patterns: ``(B, H, W)`` detector patterns (any intensity scale —
            each is min-max normalized before deposit, matching
            `render_from_master`'s ``normalize=True`` contract; the
            master is defined up to an affine transform anyway, and
            every consumer — NCC, harmonic correlation — normalizes).
        orientations: ``(B, 4)`` scalar-first quaternions or ``(B, 3)``
            zxz Euler degrees (crystal→detector, the module contract).
        geometry: detector description the patterns were captured with.
        size: output master edge (``(size, size)``).
        group: optional proper point group (`crystal.ROTATION_GROUPS`)
            — the estimate is symmetrized over the group orbit (a real
            master IS group-symmetric; symmetrizing also fills
            directions the scan's texture never sampled directly).
            Applied by orbit-averaging the ACCUMULATED value/weight
            grids (24 grid lookups for cubic), not by 24x deposits.
        chunk: patterns per accumulation pass (bounds host temporaries).

    Returns:
        ``(master (size, size) float32 in [0, 1], weights (size, size)
        float64)`` — ``weights`` is the bilinear hit mass per bin
        (AFTER symmetrization); bins with zero weight carry the covered
        mean (neutral under the normalized correlations consumers use).
        Host-side like the renderer (module docstring).
    """
    from scipy.spatial.transform import Rotation as R

    x = np.asarray(patterns)
    if x.ndim != 3:
        raise ValueError(f"expected (B, H, W) patterns, got {x.shape}")
    o = np.asarray(orientations, np.float64)
    if o.ndim == 2 and o.shape[1] == 3:
        rots = R.from_euler("zxz", o, degrees=True)
    elif o.ndim == 2 and o.shape[1] == 4:
        rots = R.from_quat(np.roll(o, -1, axis=1))
    else:
        raise ValueError(
            f"expected (B, 4) quaternions or (B, 3) Euler deg, got {o.shape}"
        )
    if len(o) != len(x):
        raise ValueError(f"{len(x)} patterns but {len(o)} orientations")
    if size < 3:
        raise ValueError(f"size must be >= 3, got {size}")
    geometry = geometry or DetectorGeometry()
    h, w = geometry.shape
    if x.shape[1:] != (h, w):
        raise ValueError(
            f"patterns are {x.shape[1]}x{x.shape[2]} but the geometry "
            f"is {h}x{w}"
        )
    dirs = pixel_directions(geometry).reshape(-1, 3).astype(np.float64)
    rot = rots.as_matrix()

    half = (size - 1) / 2.0
    acc = np.zeros((size, size), np.float64)
    wacc = np.zeros((size, size), np.float64)
    flat = x.reshape(len(x), -1).astype(np.float64)
    lo = flat.min(axis=1, keepdims=True)
    hi = flat.max(axis=1, keepdims=True)
    flat = (flat - lo) / np.maximum(hi - lo, 1e-12)
    for start in range(0, len(flat), chunk):
        rc = rot[start : start + chunk]
        vc = flat[start : start + chunk].reshape(-1)
        # Detector → crystal frame (inverse of render_from_master's
        # lookup direction).
        d_c = np.einsum("bji,pj->bpi", rc, dirs).reshape(-1, 3)
        xy = directions_to_lambert(d_c)
        col = np.clip(xy[..., 0] / np.sqrt(2.0) * half + half, 0.0, size - 1.0)
        row = np.clip(-xy[..., 1] / np.sqrt(2.0) * half + half, 0.0, size - 1.0)
        r0 = np.floor(row).astype(np.int64)
        c0 = np.floor(col).astype(np.int64)
        r1 = np.minimum(r0 + 1, size - 1)
        c1 = np.minimum(c0 + 1, size - 1)
        fr = row - r0
        fc = col - c0
        for rr, cc, ww in (
            (r0, c0, (1 - fr) * (1 - fc)),
            (r0, c1, (1 - fr) * fc),
            (r1, c0, fr * (1 - fc)),
            (r1, c1, fr * fc),
        ):
            np.add.at(acc, (rr, cc), vc * ww)
            np.add.at(wacc, (rr, cc), ww)

    if group is not None:
        from latice_tpu.crystal.symmetry import ROTATION_GROUPS

        if group not in ROTATION_GROUPS:
            raise ValueError(
                f"unknown point group {group!r}; choose from "
                f"{sorted(ROTATION_GROUPS)}"
            )
        # Orbit-average the accumulated grids: for each output bin's
        # direction d, sum the (value·weight, weight) samples at every
        # s·d — equivalent to depositing each pattern |G| times, at |G|x
        # less host work.
        jj, ii = np.meshgrid(np.arange(size), np.arange(size))
        gx = (jj - half) / half * np.sqrt(2.0)
        gy = -(ii - half) / half * np.sqrt(2.0)
        # Corner pixels beyond the inscribed equator circle are not
        # directions (|XY| > sqrt(2)); sampling would alias equator
        # values into them and mark them covered — keep them out.
        valid = gx * gx + gy * gy <= 2.0
        grid_d = lambert_to_directions(np.stack([gx, gy], axis=-1))
        sym = R.from_quat(
            np.roll(np.asarray(ROTATION_GROUPS[group]), -1, axis=1)
        )
        acc_s = np.zeros_like(acc)
        wacc_s = np.zeros_like(wacc)
        for s in sym:
            d_s = grid_d @ s.as_matrix().T
            xy = directions_to_lambert(d_s)
            col = np.clip(
                xy[..., 0] / np.sqrt(2.0) * half + half, 0.0, size - 1.0
            )
            row = np.clip(
                -xy[..., 1] / np.sqrt(2.0) * half + half, 0.0, size - 1.0
            )
            r0 = np.floor(row).astype(np.int64)
            c0 = np.floor(col).astype(np.int64)
            r1 = np.minimum(r0 + 1, size - 1)
            c1 = np.minimum(c0 + 1, size - 1)
            fr = row - r0
            fc = col - c0
            for arr, out_s in ((acc, acc_s), (wacc, wacc_s)):
                out_s += (
                    arr[r0, c0] * (1 - fr) * (1 - fc)
                    + arr[r0, c1] * (1 - fr) * fc
                    + arr[r1, c0] * fr * (1 - fc)
                    + arr[r1, c1] * fr * fc
                )
        acc, wacc = acc_s * valid, wacc_s * valid

    covered = wacc > 1e-9
    if not covered.any():
        raise ValueError("no master bins received any deposit")
    master = np.zeros((size, size), np.float64)
    master[covered] = acc[covered] / wacc[covered]
    master[~covered] = master[covered].mean()
    lo, hi = master.min(), master.max()
    master = (master - lo) / max(hi - lo, 1e-12)
    return master.astype(np.float32), wacc
