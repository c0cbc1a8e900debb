"""Texture components: volume fractions of the named ideal orientations.

Rolling/recrystallization textures are conventionally reported as volume
fractions of named components — Cube, Goss, Brass, Copper, S — counting the
map pixels within a misorientation tolerance (typically 15°) of each ideal
orientation. This is the discrete complement of the kernel-density ODF
(crystal/odf.py): MTEX's ``volume(odf, component, radius)``.

Components are ideal *orientations* (not misorientations like
crystal/csl.py), so the equivalence class is ``s_c ⊗ g ⊗ s_s`` with the
crystal point group on the left and the (optional) sample/specimen symmetry
on the right — rolled-sheet components assume the orthorhombic sample frame
(RD/TD/ND 180° flips), which is why e.g. Brass (35°, 45°, 0°) and its mirror
(-35°, 45°, 0°) are one component. The deviation from a component is then
``2·arccos(max |⟨g, o⟩|)`` over the deduplicated two-sided orbit — the same
single-MXU-matmul evaluation as the CSL classifier.

Bunge zxz Euler angles of the classic cubic rolling components (degrees;
35.264° = atan 1/√2, the exact ⟨211⟩/⟨111⟩ geometry):
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.crystal.csl import _qmul_np
from latice_tpu.crystal.quaternion import from_euler_zxz_deg
from latice_tpu.crystal.symmetry import symmetry_quats

__all__ = [
    "SAMPLE_SYMMETRIES",
    "TEXTURE_COMPONENTS",
    "TextureComponentResult",
    "component_orbit",
    "texture_component_fractions",
]

_A = math.degrees(math.atan(1.0 / math.sqrt(2.0)))  # 35.2644°

#: Named ideal orientations, Bunge zxz degrees: {hkl}<uvw> rolling-plane /
#: rolling-direction pairs standard for fcc/bcc sheet (Cube {001}<100>,
#: Goss {011}<100>, Brass {011}<211>, Copper {112}<111>, S {123}<634>,
#: rotated cube {001}<110>, and the bcc rolling fibers' anchor {111}<110>).
TEXTURE_COMPONENTS: dict[str, tuple[float, float, float]] = {
    "cube": (0.0, 0.0, 0.0),
    "rotated_cube": (45.0, 0.0, 0.0),
    "goss": (0.0, 45.0, 0.0),
    "brass": (_A, 45.0, 0.0),
    "copper": (90.0, _A, 45.0),
    "s": (58.98, 36.70, 63.43),
    "e": (0.0, 54.74, 45.0),   # {111}<110> (γ-fiber anchor, bcc)
    "f": (30.0, 54.74, 45.0),  # {111}<112> (γ-fiber, bcc)
}

#: Sample (specimen) symmetry groups, named as in texture practice:
#: ``triclinic`` = none; ``orthorhombic`` = the RD/TD/ND 180° flips of a
#: rolled sheet (point group 222); ``monoclinic`` = ND flip only.
SAMPLE_SYMMETRIES = ("triclinic", "monoclinic", "orthorhombic")


def _sample_symmetry_quats(name: str) -> np.ndarray:
    if name == "triclinic":
        return np.asarray([[1.0, 0.0, 0.0, 0.0]])
    if name == "monoclinic":
        return np.asarray([[1.0, 0, 0, 0], [0.0, 0, 0, 1.0]])  # 180° about ND
    if name == "orthorhombic":
        return np.asarray(symmetry_quats("222"), np.float64)
    raise ValueError(
        f"unknown sample symmetry {name!r}; known: {SAMPLE_SYMMETRIES}"
    )


def component_orbit(
    euler_deg: Sequence[float],
    group: str = "432",
    sample_symmetry: str = "orthorhombic",
) -> np.ndarray:
    """Deduplicated orbit ``s_crystal ⊗ g ⊗ s_sample`` of an ideal orientation."""
    q = np.asarray(
        from_euler_zxz_deg(jnp.asarray(np.asarray(euler_deg, np.float64))),
        np.float64,
    )
    left = np.asarray(symmetry_quats(group), np.float64)  # (S, 4)
    right = _sample_symmetry_quats(sample_symmetry)  # (T, 4)
    orbit = _qmul_np(
        left[:, None, :], _qmul_np(q[None, :], right)[None, :, :]
    ).reshape(-1, 4)
    flip = orbit[:, :1] < 0
    orbit = np.where(flip, -orbit, orbit)
    orbit = np.unique(np.round(orbit, 9), axis=0)
    return orbit / np.linalg.norm(orbit, axis=-1, keepdims=True)


@jax.jit
def _component_deviations(
    euler_deg: jax.Array, orbits: jax.Array, valid: jax.Array
) -> jax.Array:
    """(N, 3) Euler -> (N, nC) deviation (degrees) from each component.

    One (N, 4) x (4, nC·K) MXU matmul over the zero-padded orbit tables,
    a per-component max, and an arccos — the whole map in one program.
    """
    q = from_euler_zxz_deg(euler_deg)  # (N, 4)
    ns, k, _ = orbits.shape
    # HIGHEST: the TPU default matmul precision loses bits where arccos is
    # steepest (dot→1); deviations deserve full f32 at this tiny width.
    dots = jnp.abs(
        jnp.matmul(
            q,
            orbits.reshape(ns * k, 4).T,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    dots = jnp.where(valid.reshape(ns * k), dots, 0.0)
    best = dots.reshape(-1, ns, k).max(axis=-1)
    return 2.0 * jnp.rad2deg(jnp.arccos(jnp.clip(best, 0.0, 1.0)))


class TextureComponentResult(NamedTuple):
    """Per-pixel component assignment and summary fractions."""

    #: Component names, in the order label indices refer to.
    names: tuple[str, ...]
    #: Per-pixel label: index into ``names``, or -1 (no component within
    #: tolerance). Shape = input leading shape.
    labels: np.ndarray
    #: Per-pixel deviation (degrees) from the assigned component (or the
    #: nearest one when unassigned).
    deviation_deg: np.ndarray
    #: name -> fraction of pixels (plus ``"other"``).
    fractions: dict[str, float]


def texture_component_fractions(
    euler_deg: np.ndarray,
    components: Sequence[str] | dict[str, Sequence[float]] | None = None,
    group: str = "432",
    sample_symmetry: str = "orthorhombic",
    tolerance_deg: float = 15.0,
) -> TextureComponentResult:
    """Assign each orientation to the nearest named texture component.

    Args:
        euler_deg: ``(..., 3)`` zxz extrinsic Euler degrees (map or list).
        components: Component names from `TEXTURE_COMPONENTS`, or a
            ``{name: (φ1, Φ, φ2)}`` dict of custom ideal orientations.
            Default: the full built-in table.
        group: Crystal point group of the phase.
        sample_symmetry: ``"orthorhombic"`` (rolled sheet, default),
            ``"monoclinic"`` or ``"triclinic"``.
        tolerance_deg: Assignment radius (the conventional 15°). A pixel
            within tolerance of several components gets the *closest* one.

    Returns:
        TextureComponentResult (host arrays).
    """
    euler = np.asarray(euler_deg, np.float32)
    lead = euler.shape[:-1]
    if euler.ndim < 1 or euler.shape[-1] != 3:
        raise ValueError(f"expected (..., 3) Euler angles, got {euler.shape}")
    if components is None:
        table = dict(TEXTURE_COMPONENTS)
    elif isinstance(components, dict):
        table = {k: tuple(v) for k, v in components.items()}
    else:
        unknown = [c for c in components if c not in TEXTURE_COMPONENTS]
        if unknown:
            raise ValueError(
                f"unknown components {unknown}; known: "
                f"{', '.join(TEXTURE_COMPONENTS)} (or pass a dict)"
            )
        table = {c: TEXTURE_COMPONENTS[c] for c in components}
    if not table:
        raise ValueError("no components given")
    names = tuple(table)

    orbits = [component_orbit(table[n], group, sample_symmetry) for n in names]
    kmax = max(len(o) for o in orbits)
    packed = np.zeros((len(orbits), kmax, 4), np.float32)
    valid = np.zeros((len(orbits), kmax), bool)
    for i, o in enumerate(orbits):
        packed[i, : len(o)] = o
        valid[i, : len(o)] = True

    dev = np.asarray(
        _component_deviations(
            jnp.asarray(euler.reshape(-1, 3)),
            jnp.asarray(packed),
            jnp.asarray(valid),
        )
    )  # (N, nC) degrees
    nearest = np.argmin(dev, axis=-1)
    nearest_dev = np.take_along_axis(dev, nearest[:, None], axis=-1)[:, 0]
    labels = np.where(nearest_dev <= tolerance_deg, nearest, -1).astype(np.int16)

    n = len(labels)
    fractions = {
        name: float((labels == i).sum() / n) for i, name in enumerate(names)
    }
    fractions["other"] = float((labels < 0).sum() / n)
    return TextureComponentResult(
        names=names,
        labels=labels.reshape(lead),
        deviation_deg=nearest_dev.astype(np.float32).reshape(lead),
        fractions=fractions,
    )
