"""CSL grain-boundary classification: Σ3 twins and friends, Brandon criterion.

Coincidence-site-lattice (CSL) analysis labels each grain-boundary segment
by the special misorientation it realizes — Σ3 annealing twins, Σ9/Σ27 twin
intersections, etc. — the standard characterization step after grain
segmentation (crystal/maps.py). The reference has no boundary analysis at
all (its notebooks stop at per-pixel orientations); MTEX/OIM users expect
this, so it closes the grain-boundary half of the post-indexing workflow.

Math. A cubic CSL misorientation has an exact integer quaternion: Σ equals
the odd part of ``w² + x² + y² + z²`` (Grimmer's classification of cubic
coincidence rotations). `CSL_CUBIC` stores those integer quaternions — the
table is therefore self-checking (`sigma_value` recomputes Σ from the norm,
and the tests pin the published angle/axis pairs, e.g. Σ3 = 60° ⟨111⟩,
Σ5 = 36.87° ⟨100⟩). A boundary with misorientation Δq (crystal frame,
``qa⁻¹ ⊗ qb`` — the faiss_db.py:374-393 composition) belongs to Σ when the
deviation

    dev(Δq, Σ) = min over s1, s2, inversion of angle(s1 ⊗ qΣ ⊗ s2, Δq)

is within the Brandon criterion ``15°/√Σ`` (Brandon 1966). Lower Σ wins
when several match (Σ3 beats Σ27 on near-twin boundaries).

TPU design. The two-sided symmetry orbit of each qΣ is precomputed and
deduplicated on host (≤ 1152 images collapse to a few dozen); the per-edge
deviation is then ``2·arccos(max |Δq · orbitᵀ|)`` — one (edges, 4) ×
(4, Σ·K) MXU matmul over the whole map in a single jitted program, no
per-edge loops. The identity's orbit (the point group itself) rides along
as "Σ1", so the same matmul yields the plain disorientation field used for
the boundary mask — one device pass classifies everything.
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
    "CSL_CUBIC",
    "CslBoundaryMaps",
    "brandon_tolerance_deg",
    "classify_csl_boundaries",
    "csl_axis_angle",
    "csl_fractions",
    "csl_orbit",
    "csl_rotation",
    "sigma_value",
]

#: Label codes in `CslBoundaryMaps`: edges below the boundary threshold.
NOT_BOUNDARY = -2
#: Boundary edges matching no requested Σ ("random" boundaries).
RANDOM_BOUNDARY = -1

# Exact integer quaternions (w, x, y, z) of the cubic CSL misorientations,
# Σ3–Σ29. Σ = odd part of the squared norm; angle = 2·arccos(w/‖q‖);
# axis = (x, y, z). The a/b variants are the standard inequivalent rotations
# sharing one Σ (e.g. Σ13a = 22.6° ⟨100⟩, Σ13b = 27.8° ⟨111⟩).
CSL_CUBIC: dict[str, tuple[int, int, int, int]] = {
    "3": (3, 1, 1, 1),      # 60.00° ⟨111⟩ — annealing twin
    "5": (3, 1, 0, 0),      # 36.87° ⟨100⟩
    "7": (5, 1, 1, 1),      # 38.21° ⟨111⟩
    "9": (4, 1, 1, 0),      # 38.94° ⟨110⟩
    "11": (3, 1, 1, 0),     # 50.48° ⟨110⟩
    "13a": (5, 1, 0, 0),    # 22.62° ⟨100⟩
    "13b": (7, 1, 1, 1),    # 27.80° ⟨111⟩
    "15": (5, 2, 1, 0),     # 48.19° ⟨210⟩
    "17a": (4, 1, 0, 0),    # 28.07° ⟨100⟩
    "17b": (5, 2, 2, 1),    # 61.93° ⟨221⟩
    "19a": (6, 1, 1, 0),    # 26.53° ⟨110⟩
    "19b": (4, 1, 1, 1),    # 46.83° ⟨111⟩
    "21a": (9, 1, 1, 1),    # 21.79° ⟨111⟩
    "21b": (6, 2, 1, 1),    # 44.42° ⟨211⟩
    "23": (9, 3, 1, 1),     # 40.46° ⟨311⟩
    "25a": (7, 1, 0, 0),    # 16.26° ⟨100⟩
    "25b": (9, 3, 3, 1),    # 51.68° ⟨331⟩
    "27a": (5, 1, 1, 0),    # 31.59° ⟨110⟩
    "27b": (7, 2, 1, 0),    # 35.43° ⟨210⟩
    "29a": (5, 2, 0, 0),    # 43.60° ⟨100⟩
    "29b": (7, 2, 2, 1),    # 46.40° ⟨221⟩
}


def sigma_value(sigma: str) -> int:
    """Σ of a table entry, recomputed from the integer quaternion.

    For cubic coincidence rotations Σ is the odd part of the squared
    quaternion norm — so the table cannot drift from its keys undetected
    (the tests assert key == value for every entry).
    """
    q = CSL_CUBIC[str(sigma)]
    n = sum(c * c for c in q)
    while n % 2 == 0:
        n //= 2
    return n


def csl_rotation(sigma: str) -> np.ndarray:
    """Unit quaternion (w, x, y, z) of a CSL misorientation, float64."""
    q = np.asarray(CSL_CUBIC[str(sigma)], dtype=np.float64)
    return q / np.linalg.norm(q)


def csl_axis_angle(sigma: str) -> tuple[np.ndarray, float]:
    """(integer axis, angle in degrees) of a CSL entry — the published form."""
    w, x, y, z = CSL_CUBIC[str(sigma)]
    norm = math.sqrt(w * w + x * x + y * y + z * z)
    axis = np.asarray((x, y, z), dtype=np.int64)
    g = math.gcd(math.gcd(abs(x), abs(y)), abs(z)) or 1
    return axis // g, math.degrees(2.0 * math.acos(w / norm))


def brandon_tolerance_deg(sigma: str, base_deg: float = 15.0) -> float:
    """Brandon criterion: a boundary is Σ when within ``base/√Σ`` degrees."""
    return base_deg / math.sqrt(sigma_value(sigma))


def _qmul_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hamilton product, numpy, broadcasting over leading axes."""
    w1, x1, y1, z1 = np.moveaxis(a, -1, 0)
    w2, x2, y2, z2 = np.moveaxis(b, -1, 0)
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def csl_orbit(q: np.ndarray, group: str = "432") -> np.ndarray:
    """Deduplicated two-sided symmetry orbit of a misorientation.

    ``{s1 ⊗ q ⊗ s2}`` for all point-group operators, plus the same for
    ``q⁻¹`` (grain-exchange symmetry: an edge sees Δq or Δq⁻¹ depending on
    scan direction). Deviation from the whole equivalence class is then a
    single ``max |dot|`` against this table. Identity's orbit is the group
    itself (closure), which is how the Σ1/disorientation row works.
    """
    sym = np.asarray(symmetry_quats(group), dtype=np.float64)  # (S, 4)
    qs = np.stack([q, q * np.asarray([1.0, -1.0, -1.0, -1.0])])  # q, q⁻¹
    # (2, S, S, 4): s1 ⊗ q' ⊗ s2
    right = _qmul_np(qs[:, None, :], sym[None, :, :])  # (2, S, 4)
    orbit = _qmul_np(sym[None, :, None, :], right[:, None, :, :])
    orbit = orbit.reshape(-1, 4)
    # Canonical sign (q ≅ -q), then dedupe on rounded rows.
    flip = orbit[:, :1] < 0
    orbit = np.where(flip, -orbit, orbit)
    orbit = np.unique(np.round(orbit, 9), axis=0)
    return orbit / np.linalg.norm(orbit, axis=-1, keepdims=True)


class CslBoundaryMaps(NamedTuple):
    """Per-edge CSL labels over an (H, W) orientation grid.

    ``east[i, j]`` labels the edge between pixels (i, j) and (i, j+1);
    ``south`` the edge to (i+1, j). Codes: index into ``sigmas`` for a CSL
    boundary, ``RANDOM_BOUNDARY`` (-1) for a boundary matching no Σ,
    ``NOT_BOUNDARY`` (-2) below the threshold (last column of ``east`` /
    last row of ``south`` are NOT_BOUNDARY — no neighbor).
    """

    east: np.ndarray
    south: np.ndarray
    sigmas: tuple[str, ...]


@jax.jit
def _deviation_fields(
    euler_deg: jax.Array, orbits: jax.Array, valid: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(H, W, 3) Euler grid -> per-edge deviation (degrees) from each orbit.

    ``orbits``: (nS, K, 4) zero-padded orbit tables; ``valid``: (nS, K) mask.
    Returns east (H, W-1, nS) and south (H-1, W, nS). The hot op is one
    (edges, 4) x (4, nS*K) matmul per direction — MXU-shaped, no gathers.
    """
    q = from_euler_zxz_deg(euler_deg)  # (H, W, 4)
    ns, k, _ = orbits.shape
    table = orbits.reshape(ns * k, 4).T  # (4, nS*K)
    mask = valid.reshape(ns * k)

    def dev(qa, qb):
        d = quat_mul(quat_inv(qa), qb)  # (..., 4) crystal-frame misorientation
        # HIGHEST: the TPU default matmul precision loses bits exactly where
        # arccos is steepest (dot→1); tight Brandon tolerances (Σ27: 2.9°)
        # deserve full f32. Negligible cost at (·, 4) width.
        dots = jnp.abs(
            jnp.matmul(d, table, precision=jax.lax.Precision.HIGHEST)
        )  # (..., nS*K)
        dots = jnp.where(mask, dots, 0.0)
        m = jnp.max(dots.reshape(*d.shape[:-1], ns, k), axis=-1)
        return 2.0 * jnp.rad2deg(jnp.arccos(jnp.clip(m, 0.0, 1.0)))

    return dev(q[:, :-1], q[:, 1:]), dev(q[:-1, :], q[1:, :])


def classify_csl_boundaries(
    euler_deg: np.ndarray,
    group: str = "432",
    sigmas: Sequence[str] | None = None,
    boundary_threshold_deg: float = 5.0,
    brandon_base_deg: float = 15.0,
) -> CslBoundaryMaps:
    """Label every boundary edge of an orientation map with its CSL type.

    Args:
        euler_deg: ``(H, W, 3)`` zxz extrinsic Euler degrees (the grid form
            of `IndexPipeline` output, as in `crystal.misorientation_maps`).
        group: Proper rotation point group. The built-in Σ table is cubic
            coincidence theory, so only ``"432"`` is accepted.
        sigmas: Which Σ values to test (`CSL_CUBIC` keys). Default: the whole
            table. Ties resolve to the lowest Σ (then 'a' before 'b').
        boundary_threshold_deg: Edges below this disorientation are grain
            interior (`NOT_BOUNDARY`), matching `grain_boundary_mask`.
        brandon_base_deg: The Brandon constant; tolerance per Σ is
            ``base/√Σ``.

    Returns:
        CslBoundaryMaps of int16 labels (host arrays).
    """
    if group != "432":
        raise ValueError(
            "the built-in CSL table is cubic (Grimmer Σ3–Σ29); "
            f"group {group!r} has no standard Σ classification here"
        )
    euler = np.asarray(euler_deg, dtype=np.float32)
    if euler.ndim != 3 or euler.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) Euler grid, got {euler.shape}")
    if euler.shape[0] < 2 or euler.shape[1] < 2:
        raise ValueError("orientation map must be at least 2x2")
    names = list(sigmas) if sigmas is not None else list(CSL_CUBIC)
    for n in names:
        if str(n) not in CSL_CUBIC:
            raise ValueError(
                f"unknown Σ {n!r}; known: {', '.join(CSL_CUBIC)}"
            )
    # Ascending Σ (then variant letter): first match below wins.
    names = sorted((str(n) for n in names), key=lambda s: (sigma_value(s), s))

    # Row 0 is Σ1 (identity orbit = the point group): its deviation is the
    # plain disorientation, giving the boundary mask from the same matmul.
    orbit_list = [csl_orbit(np.asarray([1.0, 0.0, 0.0, 0.0]), group)]
    orbit_list += [csl_orbit(csl_rotation(n), group) for n in names]
    kmax = max(len(o) for o in orbit_list)
    orbits = np.zeros((len(orbit_list), kmax, 4), np.float32)
    valid = np.zeros((len(orbit_list), kmax), bool)
    for i, o in enumerate(orbit_list):
        orbits[i, : len(o)] = o
        valid[i, : len(o)] = True

    east_dev, south_dev = _deviation_fields(
        jnp.asarray(euler), jnp.asarray(orbits), jnp.asarray(valid)
    )
    tol = np.asarray(
        [brandon_tolerance_deg(n, brandon_base_deg) for n in names],
        np.float32,
    )

    def label(dev):
        dev = np.asarray(dev)
        disorient = dev[..., 0]
        within = dev[..., 1:] <= tol  # (..., nS)
        first = np.argmax(within, axis=-1)
        out = np.where(within.any(axis=-1), first, RANDOM_BOUNDARY)
        out = np.where(
            disorient >= boundary_threshold_deg, out, NOT_BOUNDARY
        )
        return out.astype(np.int16)

    east = np.full(euler.shape[:2], NOT_BOUNDARY, np.int16)
    south = np.full(euler.shape[:2], NOT_BOUNDARY, np.int16)
    east[:, :-1] = label(east_dev)
    south[:-1, :] = label(south_dev)
    return CslBoundaryMaps(east, south, tuple(names))


def csl_fractions(maps: CslBoundaryMaps) -> dict[str, float]:
    """Fraction of boundary edges per Σ (plus ``"random"``), by edge count.

    Number fractions over all boundary edges — the square-grid proxy for
    boundary-length fractions (each edge is one unit of boundary length).
    """
    labels = np.concatenate([maps.east.ravel(), maps.south.ravel()])
    boundary = labels[labels != NOT_BOUNDARY]
    total = len(boundary)
    if total == 0:
        return {"random": 0.0, **{n: 0.0 for n in maps.sigmas}}
    out = {"random": float((boundary == RANDOM_BOUNDARY).sum() / total)}
    for i, n in enumerate(maps.sigmas):
        out[n] = float((boundary == i).sum() / total)
    return out
