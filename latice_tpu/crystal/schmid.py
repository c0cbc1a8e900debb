"""Schmid factor maps: resolved shear stress geometry per pixel.

The Schmid factor m = |cos φ · cos λ| (φ: slip-plane normal vs load, λ:
slip direction vs load) ranks how favorably each grain is oriented for slip
under a uniaxial load — the standard plasticity overlay on an indexed map
(MTEX ``SchmidFactor``, OIM's Schmid factor map). The reference stops at
orientations; this closes the micromechanics step.

Slip-system families are generated from integer crystallography (all
symmetric {hkl}<uvw> pairs with n ⊥ d), so the tables are exact:

* ``fcc``  — {111}<110>, 12 systems (octahedral glide);
* ``bcc``  — {110}<111>, 12 systems;
* ``bcc112`` — {112}<111>, 12 systems (the second bcc family);
* custom — any (normals, directions) pair via `slip_systems`' return shape.

Frame convention matches utils/polefigure.py: Bunge-style ``g`` maps sample
→ crystal frames, so the crystal-frame load is ``R(q) @ load_sample``. The
whole map is one jitted program: quaternion → matrix, one small matmul
against the (S, 3) tables, max over systems.
"""

from __future__ import annotations

from itertools import permutations, product
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.crystal.quaternion import from_euler_zxz_deg, quat_to_matrix

__all__ = [
    "SLIP_FAMILIES",
    "SchmidResult",
    "schmid_factors",
    "slip_systems",
]

SLIP_FAMILIES = ("fcc", "bcc", "bcc112")


def _unique_updirs(vecs) -> list[tuple[int, ...]]:
    """Integer direction set deduplicated up to sign (keep one hemisphere)."""
    seen = set()
    out = []
    for v in vecs:
        v = tuple(int(x) for x in v)
        if v == (0, 0, 0):
            continue
        key = tuple(-x for x in v) if (np.sign(v)[np.nonzero(v)[0][0]] < 0) else v
        if key not in seen:
            seen.add(key)
            out.append(key)
    return out


def _family(hkl: tuple[int, int, int]) -> list[tuple[int, ...]]:
    """All signed permutations of ±h±k±l, deduplicated up to sign."""
    perms = set(permutations(hkl))
    signed = {
        tuple(s * v for s, v in zip(signs, p))
        for p in perms
        for signs in product((1, -1), repeat=3)
    }
    return _unique_updirs(sorted(signed))


def slip_systems(
    family: str = "fcc", dtype=np.float32
) -> tuple[np.ndarray, np.ndarray]:
    """Unit (normals, directions) arrays ``(S, 3)`` of a slip family.

    ``dtype``: f32 default feeds the jitted Schmid kernel; pass np.float64
    for exact host geometry (e.g. yield-vertex enumeration, crystal/taylor.py).
    """
    if family == "fcc":
        planes, dirs = _family((1, 1, 1)), _family((1, 1, 0))
    elif family == "bcc":
        planes, dirs = _family((1, 1, 0)), _family((1, 1, 1))
    elif family == "bcc112":
        planes, dirs = _family((1, 1, 2)), _family((1, 1, 1))
    else:
        raise ValueError(
            f"unknown slip family {family!r}; known: {SLIP_FAMILIES}"
        )
    n_out, d_out = [], []
    for n in planes:
        for d in dirs:
            if sum(a * b for a, b in zip(n, d)) == 0:
                n_out.append(n)
                d_out.append(d)
    normals = np.asarray(n_out, np.float64)
    directions = np.asarray(d_out, np.float64)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    directions /= np.linalg.norm(directions, axis=-1, keepdims=True)
    return normals.astype(dtype), directions.astype(dtype)


class SchmidResult(NamedTuple):
    """Per-pixel Schmid analysis (host arrays, input leading shape)."""

    #: Maximum |m| over the family's systems (0..0.5).
    max_factor: np.ndarray
    #: Index of the maximizing system into the family's (normals, dirs).
    system: np.ndarray


@jax.jit
def _schmid(
    euler_deg: jax.Array,
    load: jax.Array,  # (3,) unit, sample frame
    normals: jax.Array,  # (S, 3)
    directions: jax.Array,  # (S, 3)
) -> tuple[jax.Array, jax.Array]:
    # precision=HIGHEST: the TPU default matmul precision costs ~5e-4 on
    # the factors (measured on-chip) — meaningless for perf at this size,
    # visible in reported values (repo convention: analysis matmuls full f32).
    hi = jax.lax.Precision.HIGHEST
    q = from_euler_zxz_deg(euler_deg)  # (N, 4)
    rot = quat_to_matrix(q)  # (N, 3, 3): sample -> crystal
    l_c = jnp.matmul(rot, load, precision=hi)  # (N, 3) crystal-frame load
    m = jnp.abs(
        jnp.matmul(l_c, normals.T, precision=hi)
        * jnp.matmul(l_c, directions.T, precision=hi)
    )  # (N, S)
    return jnp.max(m, axis=-1), jnp.argmax(m, axis=-1)


def schmid_factors(
    euler_deg: np.ndarray,
    load_direction=(0.0, 0.0, 1.0),
    family: str = "fcc",
) -> SchmidResult:
    """Maximum Schmid factor (and active system) per orientation.

    Args:
        euler_deg: ``(..., 3)`` zxz extrinsic Euler degrees.
        load_direction: Uniaxial load axis in the sample frame (normalized
            internally); default ND.
        family: ``"fcc"``, ``"bcc"`` or ``"bcc112"``.

    Returns:
        SchmidResult with ``max_factor`` (float32, ≤ 0.5) and ``system``
        (int32) shaped like the input's leading dimensions.
    """
    euler = np.asarray(euler_deg, np.float32)
    if euler.ndim < 1 or euler.shape[-1] != 3:
        raise ValueError(f"expected (..., 3) Euler angles, got {euler.shape}")
    lead = euler.shape[:-1]
    load = np.asarray(load_direction, np.float64)
    nrm = np.linalg.norm(load)
    if not nrm > 0:
        raise ValueError("load_direction must be nonzero")
    normals, directions = slip_systems(family)
    m, idx = _schmid(
        jnp.asarray(euler.reshape(-1, 3)),
        jnp.asarray(load / nrm, jnp.float32),
        jnp.asarray(normals),
        jnp.asarray(directions),
    )
    return SchmidResult(
        max_factor=np.asarray(m, np.float32).reshape(lead),
        system=np.asarray(idx, np.int32).reshape(lead),
    )
