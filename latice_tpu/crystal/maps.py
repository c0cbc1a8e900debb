"""Orientation-map analysis: misorientation fields, KAM, grain labeling.

Post-indexing analyses every EBSD workflow runs on the Euler-angle grid that
`IndexPipeline` / `index.py query` produces. The reference stops at per-pixel
orientations (its notebooks hand results to external tools); these are the
standard next steps, built on the same pure-JAX quaternion algebra as the
consensus engine (crystal/quaternion.py, crystal/symmetry.py).

Design: the per-pixel disorientation field is one jitted XLA program over the
whole (H, W) grid — quaternion conversion, symmetry reduction over all S
operators, and both neighbor directions fused into a single dispatch (eager
op-by-op math is pathologically slow on tunneled TPU backends). Grain
labeling is host-side connected components over the thresholded edge graph
(scipy csgraph): data-dependent, pointer-chasing work a systolic array cannot
help with, and milliseconds-cheap in compiled form even at 1M-pixel maps.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.crystal.quaternion import (
    from_euler_zxz_deg,
    misorientation_angle,
    quat_mul,
    to_euler_zxz_deg,
)
from latice_tpu.crystal.symmetry import nearest_symmetry_equivalent, symmetry_quats

__all__ = [
    "GrainStatistics",
    "MisorientationMaps",
    "boundary_disorientation_angles",
    "clean_orientation_map",
    "misorientation_maps",
    "misorientation_maps_multiphase",
    "kernel_average_misorientation",
    "grain_boundary_mask",
    "grain_statistics",
    "label_grains",
    "random_disorientation_angles",
]

#: Sentinel disorientation (degrees) assigned to edges joining pixels of
#: different phases: far above any physical disorientation (max possible is
#: 180), so every phase boundary reads as a grain boundary at any threshold.
PHASE_BOUNDARY_DEG = 999.0


class MisorientationMaps(NamedTuple):
    """Neighbor disorientation fields over an (H, W) orientation grid.

    ``east[i, j]`` is the symmetry-reduced misorientation (degrees) between
    pixel (i, j) and (i, j+1); ``south[i, j]`` between (i, j) and (i+1, j).
    The last column of ``east`` and last row of ``south`` are 0 (no neighbor).
    """

    east: np.ndarray
    south: np.ndarray


@partial(jax.jit, static_argnums=())
def _disorientation_fields(euler_deg: jax.Array, sym: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(H, W, 3) Euler degrees -> (east, south) disorientation fields in degrees.

    One compiled program: grid -> quaternions, then for each of the two
    neighbor directions the minimum misorientation over all symmetry images
    ``min_s angle(q_a, s * q_b)`` (crystal/symmetry.py:212 semantics),
    vectorized over every pixel and operator at once.
    """
    q = from_euler_zxz_deg(euler_deg)  # (H, W, 4)

    def reduced(qa, qb):
        # (..., 4) x (..., 4) -> (...,) degrees, min over the S operators.
        imgs = quat_mul(sym, qb[..., None, :])  # (..., S, 4)
        ang = misorientation_angle(qa[..., None, :], imgs)  # (..., S)
        return jnp.rad2deg(jnp.min(ang, axis=-1))

    east = reduced(q[:, :-1], q[:, 1:])  # (H, W-1)
    south = reduced(q[:-1, :], q[1:, :])  # (H-1, W)
    east = jnp.pad(east, ((0, 0), (0, 1)))
    south = jnp.pad(south, ((0, 1), (0, 0)))
    return east, south


def misorientation_maps(
    euler_deg: np.ndarray, group: str = "432"
) -> MisorientationMaps:
    """Symmetry-reduced neighbor misorientation fields of an orientation map.

    Args:
        euler_deg: ``(H, W, 3)`` zxz extrinsic Euler angles in degrees (the
            grid form of `IndexPipeline` output).
        group: Proper rotation point group (`crystal.ROTATION_GROUPS` key).

    Returns:
        MisorientationMaps with float32 ``(H, W)`` east/south fields (host).
    """
    euler = np.asarray(euler_deg, dtype=np.float32)
    if euler.ndim != 3 or euler.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) Euler grid, got {euler.shape}")
    if euler.shape[0] < 2 or euler.shape[1] < 2:
        raise ValueError("orientation map must be at least 2x2")
    sym = symmetry_quats(group)
    east, south = _disorientation_fields(jnp.asarray(euler), sym)
    return MisorientationMaps(np.asarray(east), np.asarray(south))


def misorientation_maps_multiphase(
    euler_deg: np.ndarray,
    phases: np.ndarray,
    groups: list[str],
) -> MisorientationMaps:
    """Disorientation fields of a multi-phase orientation map.

    Same-phase neighbor edges are symmetry-reduced with *that phase's* point
    group; cross-phase edges get `PHASE_BOUNDARY_DEG` so phase boundaries
    always segment as grain boundaries (the output of a multi-phase
    `IndexPipeline` query: per-pixel Euler angles + phase ids).

    Args:
        euler_deg: ``(H, W, 3)`` zxz Euler degrees.
        phases: ``(H, W)`` integer phase ids. Negative ids mark unindexed
            pixels (the vendor ``-1`` convention): every edge touching one is
            a boundary, so unindexed regions never fuse into pseudo-grains.
        groups: Point-group name per phase id (`crystal.ROTATION_GROUPS`).
    """
    ph = np.asarray(phases)
    euler = np.asarray(euler_deg)
    if ph.shape != euler.shape[:2]:
        raise ValueError(
            f"phases {ph.shape} does not match map {euler.shape[:2]}"
        )
    n_phases = int(ph.max()) + 1 if ph.size else 1
    if n_phases < 1:
        n_phases = 1  # all pixels unindexed: every edge becomes a boundary
    if len(groups) < n_phases:
        raise ValueError(f"{n_phases} phase ids but only {len(groups)} groups")

    east = np.full(ph.shape, 0.0, dtype=np.float32)
    south = np.full(ph.shape, 0.0, dtype=np.float32)
    # One compiled field per distinct group (not per phase: phases sharing a
    # group share the device computation).
    by_group: dict[str, MisorientationMaps] = {}
    for g in set(groups[:n_phases]):
        by_group[g] = misorientation_maps(euler, group=g)
    for p in range(n_phases):
        m = by_group[groups[p]]
        sel_e = (ph[:, :-1] == p) & (ph[:, 1:] == p)
        sel_s = (ph[:-1, :] == p) & (ph[1:, :] == p)
        east[:, :-1][sel_e] = m.east[:, :-1][sel_e]
        south[:-1, :][sel_s] = m.south[:-1, :][sel_s]
    # Cross-phase edges, plus any edge touching an unindexed (negative-id)
    # pixel, are boundaries.
    bad = ph < 0
    cross_e = (ph[:, :-1] != ph[:, 1:]) | bad[:, :-1] | bad[:, 1:]
    cross_s = (ph[:-1, :] != ph[1:, :]) | bad[:-1, :] | bad[1:, :]
    east[:, :-1][cross_e] = PHASE_BOUNDARY_DEG
    south[:-1, :][cross_s] = PHASE_BOUNDARY_DEG
    return MisorientationMaps(east, south)


def kernel_average_misorientation(
    maps: MisorientationMaps, threshold_deg: float = 5.0
) -> np.ndarray:
    """Kernel average misorientation (KAM), first-neighbor, with grain filter.

    Per pixel: the mean disorientation to its in-grid 4-neighbors, counting
    only neighbors below ``threshold_deg`` (the standard convention — edges
    crossing a grain boundary are excluded). Pixels with no sub-threshold
    neighbor get 0.
    """
    east, south = maps
    h, w = east.shape
    deg = np.zeros((h, w), dtype=np.float32)
    cnt = np.zeros((h, w), dtype=np.int32)
    for field, (dst_a, src_a) in (
        (east[:, :-1], (np.s_[:, :-1], np.s_[:, 1:])),
        (south[:-1, :], (np.s_[:-1, :], np.s_[1:, :])),
    ):
        ok = field < threshold_deg
        for sl in (dst_a, src_a):
            deg[sl] += np.where(ok, field, 0.0)
            cnt[sl] += ok
    return np.divide(deg, cnt, out=np.zeros_like(deg), where=cnt > 0)


def grain_boundary_mask(
    maps: MisorientationMaps, threshold_deg: float = 5.0
) -> np.ndarray:
    """Boolean ``(H, W)`` mask of pixels adjacent to a grain boundary.

    A pixel is marked when any of its 4-neighbor edges carries a
    disorientation of at least ``threshold_deg``.
    """
    east, south = maps
    mask = np.zeros(east.shape, dtype=bool)
    e = east[:, :-1] >= threshold_deg
    s = south[:-1, :] >= threshold_deg
    mask[:, :-1] |= e
    mask[:, 1:] |= e
    mask[:-1, :] |= s
    mask[1:, :] |= s
    return mask


def boundary_disorientation_angles(
    maps: MisorientationMaps, threshold_deg: float = 5.0
) -> np.ndarray:
    """Flat array of boundary-edge disorientation angles (degrees).

    The raw material of the misorientation-angle distribution ("Mackenzie
    plot"): every 4-neighbor edge at or above ``threshold_deg``, excluding
    phase-boundary sentinels (`PHASE_BOUNDARY_DEG`).
    """
    east, south = maps
    vals = np.concatenate([east[:, :-1].ravel(), south[:-1, :].ravel()])
    return vals[(vals >= threshold_deg) & (vals < PHASE_BOUNDARY_DEG)]


def random_disorientation_angles(
    group: str = "432", n: int = 100_000, seed: int = 0
) -> np.ndarray:
    """Disorientation angles (degrees) of random orientation pairs.

    The Mackenzie (1958) distribution for the given point group, by Monte
    Carlo: Haar-uniform rotations (Shoemake map) symmetry-reduced against
    the identity — the comparison baseline for measured boundary
    distributions (a Δg between two independent uniform orientations is
    itself uniform, so reducing single samples suffices). One jitted
    device pass; for cubic the max is the Mackenzie cutoff 62.8°.
    """
    rng = np.random.default_rng(seed)
    u = rng.uniform(size=(n, 3))
    q = np.stack(
        [
            np.sqrt(1 - u[:, 0]) * np.sin(2 * np.pi * u[:, 1]),
            np.sqrt(1 - u[:, 0]) * np.cos(2 * np.pi * u[:, 1]),
            np.sqrt(u[:, 0]) * np.sin(2 * np.pi * u[:, 2]),
            np.sqrt(u[:, 0]) * np.cos(2 * np.pi * u[:, 2]),
        ],
        axis=-1,
    ).astype(np.float32)
    sym = symmetry_quats(group)
    from latice_tpu.crystal.symmetry import symmetry_reduced_misorientation

    identity = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
    ang = symmetry_reduced_misorientation(identity, jnp.asarray(q), sym)
    return np.degrees(np.asarray(ang))


class GrainStatistics(NamedTuple):
    """Per-grain statistics of a segmented orientation map.

    All arrays are length ``n_grains``, indexed by `label_grains` label.
    """

    #: Pixel count per grain.
    sizes_px: np.ndarray
    #: Equivalent circle diameter ``2·sqrt(area/π)`` in pixels.
    equivalent_diameter_px: np.ndarray
    #: Symmetry-aware mean orientation per grain, zxz Euler degrees ``(G, 3)``.
    mean_orientation: np.ndarray
    #: Grain orientation spread: mean angle (degrees) of the grain's pixels
    #: to its mean orientation.
    gos_deg: np.ndarray


def grain_statistics(
    euler_deg: np.ndarray,
    labels: np.ndarray,
    group: str = "432",
) -> GrainStatistics:
    """Size, mean orientation and orientation spread of every grain.

    The standard per-grain summary (OIM's grain file / MTEX ``grains``):
    area, equivalent circle diameter, the symmetry-aware mean orientation,
    and GOS (grain orientation spread — the recrystallization-fraction
    metric). The reference has no grain analysis at all.

    Orientation averaging handles symmetry by snapping every pixel to the
    symmetry image nearest its grain's seed pixel (one vectorized device
    pass over the whole map — within-grain spreads are far below the
    symmetry zone spacing, so the snap is exact for real grains), then
    taking the chordal-L2 quaternion mean per grain (the scipy
    ``Rotation.mean`` eigenvector, batched over grains).

    Args:
        euler_deg: ``(H, W, 3)`` or ``(N, 3)`` zxz Euler degrees.
        labels: Matching ``(H, W)`` or ``(N,)`` grain labels from
            `label_grains` (0..G-1).
        group: Proper rotation point group of the phase.

    Returns:
        GrainStatistics of host numpy arrays.
    """
    euler = np.asarray(euler_deg, dtype=np.float32).reshape(-1, 3)
    lab = np.asarray(labels).reshape(-1)
    if len(lab) != len(euler):
        raise ValueError(
            f"labels ({lab.shape}) do not match orientations ({euler.shape})"
        )
    n_grains = int(lab.max()) + 1 if lab.size else 0
    sizes = np.bincount(lab, minlength=n_grains).astype(np.int64)
    ecd = 2.0 * np.sqrt(sizes / np.pi)

    sym = symmetry_quats(group)
    q = from_euler_zxz_deg(jnp.asarray(euler))  # (N, 4) device
    # Seed = first pixel of each grain (row-major; label_grains guarantees
    # labels appear in first-visit order, so unique() indices are the seeds).
    _, seed_idx = np.unique(lab, return_index=True)
    q_host = np.asarray(q, np.float64)
    q_seed = q_host[seed_idx][lab]  # (N, 4)
    aligned = np.asarray(
        # compose="crystal": physical equivalence (q ⊗ sym). The default
        # premultiplied images contain NO near-seed image when a pixel's
        # FZ representative differs from its seed's, which blew GOS from
        # ~0.7° to ~20° on boundary-straddling grains (test-pinned).
        nearest_symmetry_equivalent(
            jnp.asarray(q_seed, jnp.float32), q, sym, compose="crystal"
        ),
        np.float64,
    )
    # Hemisphere-align (q ≅ -q) so the linear accumulation is coherent.
    flip = np.sum(aligned * q_seed, axis=-1) < 0
    aligned[flip] *= -1.0

    # Chordal-L2 mean per grain: leading eigenvector of M_g = Σ q qᵀ.
    m = np.zeros((n_grains, 4, 4), np.float64)
    np.add.at(m, lab, aligned[:, :, None] * aligned[:, None, :])
    _, vecs = np.linalg.eigh(m)  # ascending: the mean is the last column
    mean_q = vecs[..., -1]
    mean_euler = np.asarray(to_euler_zxz_deg(jnp.asarray(mean_q, jnp.float32)))

    # GOS: mean angle of the (already symmetry-snapped) pixels to the mean.
    dots = np.abs(np.sum(aligned * mean_q[lab], axis=-1))
    ang = 2.0 * np.degrees(np.arccos(np.clip(dots, -1.0, 1.0)))
    gos = np.bincount(lab, weights=ang, minlength=n_grains) / np.maximum(sizes, 1)
    return GrainStatistics(
        sizes_px=sizes,
        equivalent_diameter_px=ecd.astype(np.float32),
        mean_orientation=mean_euler.astype(np.float32),
        gos_deg=gos.astype(np.float32),
    )


def clean_orientation_map(
    euler_deg: np.ndarray,
    bad: np.ndarray | None = None,
    min_grain_px: int = 0,
    group: str = "432",
    threshold_deg: float = 5.0,
    phases: np.ndarray | None = None,
    groups: list[str] | None = None,
    max_iterations: int | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Grain-dilation cleanup of an orientation map (OIM-style).

    Two classes of pixels are replaced: explicitly ``bad`` ones (e.g.
    ``~success`` from the index plane, or the vendor unindexed mask) and
    members of grains smaller than ``min_grain_px`` (speckle from
    misindexed single pixels / pseudo-symmetric flips). Each round, every
    such pixel adopts the orientation (and phase) of its 4-neighbor whose
    grain is largest among the good neighbors — the standard grain
    dilation iteration — until all are filled or nothing changes (an
    all-bad map comes back unchanged).

    Args:
        euler_deg: ``(H, W, 3)`` zxz Euler degrees.
        bad: optional ``(H, W)`` bool mask of pixels to replace.
        min_grain_px: also replace grains with fewer pixels than this.
        group: point group for the segmentation (single-phase).
        threshold_deg: grain-boundary threshold for the segmentation.
        phases: optional ``(H, W)`` phase ids (multi-phase maps; negative =
            unindexed, implicitly bad). Filled alongside orientations.
        groups: per-phase point groups (required with ``phases``).
        max_iterations: dilation-round cap (default: H + W).

    Returns:
        ``(cleaned_euler, filled_mask, cleaned_phases)`` — ``filled_mask``
        marks pixels that were replaced; ``cleaned_phases`` is None when
        ``phases`` is None.
    """
    euler = np.array(euler_deg, dtype=np.float64, copy=True)
    h, w = euler.shape[:2]
    ph = None if phases is None else np.array(phases, np.int64, copy=True)
    bad_mask = (
        np.zeros((h, w), bool) if bad is None else np.array(bad, bool)
    )
    if ph is not None:
        if groups is None:
            raise ValueError("phases given without per-phase groups")
        bad_mask = bad_mask | (ph < 0)

    def _segment(e, p):
        if p is not None:
            return misorientation_maps_multiphase(e, p, groups)
        return misorientation_maps(e, group=group)

    labels, n_grains = label_grains(
        _segment(euler, ph), threshold_deg=threshold_deg
    )
    if min_grain_px > 1:
        sizes = np.bincount(labels.ravel(), minlength=n_grains)
        bad_mask = bad_mask | (sizes[labels] < min_grain_px)
    # Bad pixels must not lend their (junk) orientations: track goodness
    # and grain size, both updated as fills land.
    good = ~bad_mask
    sizes_map = np.where(
        good, np.bincount(labels.ravel(), minlength=n_grains)[labels], 0
    )
    filled = np.zeros((h, w), bool)
    limit = max_iterations if max_iterations is not None else h + w

    for _ in range(limit):
        todo = ~good
        if not todo.any():
            break
        # For every pixel, the neighbor grain sizes (0 where the neighbor
        # is bad or off-map) in N/S/W/E order.
        n_sz = np.zeros((4, h, w), np.int64)
        n_sz[0, 1:, :] = sizes_map[:-1, :]
        n_sz[1, :-1, :] = sizes_map[1:, :]
        n_sz[2, :, 1:] = sizes_map[:, :-1]
        n_sz[3, :, :-1] = sizes_map[:, 1:]
        best = np.argmax(n_sz, axis=0)
        best_sz = np.take_along_axis(n_sz, best[None], axis=0)[0]
        fill = todo & (best_sz > 0)
        if not fill.any():
            break  # isolated bad region with no good contact anywhere
        ii, jj = np.nonzero(fill)
        off = np.asarray([[-1, 0], [1, 0], [0, -1], [0, 1]])[best[ii, jj]]
        si, sj = ii + off[:, 0], jj + off[:, 1]
        euler[ii, jj] = euler[si, sj]
        if ph is not None:
            ph[ii, jj] = ph[si, sj]
        # Freshly-filled pixels inherit their source grain's size and
        # become donors in the next round.
        sizes_map[ii, jj] = sizes_map[si, sj]
        good[ii, jj] = True
        filled[ii, jj] = True
    return euler, filled, ph


def label_grains(
    maps: MisorientationMaps, threshold_deg: float = 5.0
) -> tuple[np.ndarray, int]:
    """Segment the map into grains: connected components of low-misorientation
    edges (4-connectivity, edge kept when disorientation < ``threshold_deg``).

    Returns ``(labels, n_grains)`` with labels in ``0..n_grains-1``, row-major
    first-visit order. Fully vectorized: scipy's compiled connected-components
    over the sparse edge graph (milliseconds at 1M pixels — a Python
    union-find loop takes minutes there).
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    east, south = maps
    h, w = east.shape
    n = h * w
    idx = np.arange(n).reshape(h, w)
    e_ok = east[:, :-1] < threshold_deg
    s_ok = south[:-1, :] < threshold_deg
    a = np.concatenate([idx[:, :-1][e_ok], idx[:-1, :][s_ok]])
    b = np.concatenate([idx[:, 1:][e_ok], idx[1:, :][s_ok]])
    adj = coo_matrix((np.ones(len(a), np.int8), (a, b)), shape=(n, n))
    n_grains, labels = connected_components(adj, directed=False)
    # Relabel to row-major first-visit order (deterministic, independent of
    # scipy's internal component ordering).
    _, first = np.unique(labels, return_index=True)
    order = np.argsort(np.argsort(first))
    return order[labels].reshape(h, w).astype(np.int32), int(n_grains)
