"""Cubic crystal symmetry operators and symmetry-aware orientation ops.

TPU-native replacement for the reference's symmetry machinery
(latice/utils/constants.py:13-39, duplicated at latice/utils/utils.py:24-50,
and the nearest-symmetry-equivalent search at latice/index/faiss_db.py:374-393
/ latice/index/chroma_db.py:344-375).
"""

from __future__ import annotations

from math import pi, sqrt

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.crystal.quaternion import misorientation_angle, quat_mul

__all__ = [
    "CUBIC_SYMMETRY",
    "QUAT_SYM_WXYZ",
    "ROTATION_GROUPS",
    "cubic_symmetry_quats",
    "symmetry_quats",
    "stack_symmetry_tables",
    "nearest_symmetry_equivalent",
    "symmetry_reduced_misorientation",
    "PI_OVER_180",
    "K_180_OVER_PI",
    "SQRT2_INV",
    "SQRT3_INV",
    "USE_INVERSION",
]

PI_OVER_180 = pi / 180
K_180_OVER_PI = 180 / pi
SQRT2_INV = 1 / sqrt(2)
SQRT3_INV = 1 / sqrt(3)
USE_INVERSION = True

# The 24 rotational symmetry operators of the cubic crystal system, in the
# reference's on-disk layout, which is scipy scalar-LAST (x, y, z, w) because
# the reference feeds these rows to `scipy.Rotation.from_quat`
# (latice/utils/constants.py:13-39, utils.py:50).
CUBIC_SYMMETRY: list[list[float]] = [
    [1, 0, 0, 0],
    [0, 1, 0, 0],
    [0, 0, 1, 0],
    [0, 0, 0, 1],
    [0.5, 0.5, 0.5, 0.5],
    [0.5, -0.5, -0.5, -0.5],
    [0.5, 0.5, -0.5, 0.5],
    [0.5, -0.5, 0.5, -0.5],
    [0.5, -0.5, 0.5, 0.5],
    [0.5, 0.5, -0.5, -0.5],
    [0.5, -0.5, -0.5, 0.5],
    [0.5, 0.5, 0.5, -0.5],
    [SQRT2_INV, SQRT2_INV, 0, 0],
    [SQRT2_INV, 0, SQRT2_INV, 0],
    [SQRT2_INV, 0, 0, SQRT2_INV],
    [SQRT2_INV, -SQRT2_INV, 0, 0],
    [SQRT2_INV, 0, -SQRT2_INV, 0],
    [SQRT2_INV, 0, 0, -SQRT2_INV],
    [0, SQRT2_INV, SQRT2_INV, 0],
    [0, -SQRT2_INV, SQRT2_INV, 0],
    [0, 0, SQRT2_INV, SQRT2_INV],
    [0, 0, -SQRT2_INV, SQRT2_INV],
    [0, SQRT2_INV, 0, SQRT2_INV],
    [0, -SQRT2_INV, 0, SQRT2_INV],
]

# Scalar-first (w, x, y, z) layout used throughout latice_tpu.
_SYM_XYZW = np.asarray(CUBIC_SYMMETRY, dtype=np.float64)
QUAT_SYM_WXYZ: np.ndarray = np.concatenate(
    [_SYM_XYZW[:, 3:4], _SYM_XYZW[:, 0:3]], axis=1
)


def cubic_symmetry_quats(dtype=jnp.float32) -> jax.Array:
    """The 24 cubic symmetry operators as scalar-first unit quaternions."""
    return jnp.asarray(QUAT_SYM_WXYZ, dtype=dtype)


def _aa(axis, angle: float) -> np.ndarray:
    """Scalar-first quaternion about ``axis`` by ``angle`` rad (host numpy)."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2.0)], np.sin(angle / 2.0) * axis])


def _cyclic(n: int) -> np.ndarray:
    """Cn: n rotations about z."""
    return np.stack([_aa([0, 0, 1], 2 * pi * k / n) for k in range(n)])


def _dihedral(n: int) -> np.ndarray:
    """Dn: Cn about z plus n two-fold axes in the basal plane."""
    twofolds = [
        _aa([np.cos(pi * k / n), np.sin(pi * k / n), 0], pi) for k in range(n)
    ]
    return np.concatenate([_cyclic(n), np.stack(twofolds)])


def _tetrahedral() -> np.ndarray:
    """T (point group 23): 12 proper rotations of the tetrahedron."""
    diag = [
        _aa([sx, sy, sz], s * 2 * pi / 3)
        for sx in (1, -1)
        for sy in (1, -1)
        for sz in (1, -1)
        for s in (1,)
    ]
    # The 8 ±120° rotations are the 8 sign combinations of the (1,1,1) family
    # with a fixed +120° angle; together with identity and the three face
    # two-folds they close into the order-12 group (pinned by the closure test).
    return np.concatenate(
        [
            _cyclic(1),  # identity
            np.stack([_aa(a, pi) for a in ([1, 0, 0], [0, 1, 0], [0, 0, 1])]),
            np.stack(diag),
        ]
    )


# Proper-rotation point groups for the 7 crystal systems (Hermann-Mauguin
# names, Laue-class proper subgroups) — the symmetry vocabulary for
# multi-phase dictionaries. The reference is single-phase cubic only
# (latice/utils/constants.py:13-39); these extend the same scalar-first
# quaternion representation to every EBSD-relevant system.
ROTATION_GROUPS: dict[str, np.ndarray] = {
    "1": _cyclic(1),  # triclinic
    "2": _cyclic(2),  # monoclinic
    "222": _dihedral(2),  # orthorhombic
    "3": _cyclic(3),  # trigonal (rhombohedral)
    "32": _dihedral(3),
    "4": _cyclic(4),  # tetragonal
    "422": _dihedral(4),
    "6": _cyclic(6),  # hexagonal
    "622": _dihedral(6),
    "23": _tetrahedral(),  # cubic T
    "432": QUAT_SYM_WXYZ,  # cubic O (the reference's 24-op table)
}


def symmetry_quats(group: str = "432", dtype=jnp.float32) -> jax.Array:
    """Rotation operators of a proper point group, scalar-first ``(S, 4)``."""
    try:
        table = ROTATION_GROUPS[group]
    except KeyError:
        raise ValueError(
            f"unknown point group {group!r}; choose from {sorted(ROTATION_GROUPS)}"
        ) from None
    return jnp.asarray(table, dtype=dtype)


def stack_symmetry_tables(groups, dtype=jnp.float32) -> jax.Array:
    """Stack per-phase symmetry tables into one ``(P, S_max, 4)`` array.

    Shorter groups are padded by repeating their first row — a duplicate
    operator is harmless under the min/argmin reductions every consumer
    (`nearest_symmetry_equivalent`, `symmetry_reduced_misorientation`) applies,
    and keeps the stacked table static-shaped for XLA.
    """
    tables = [np.asarray(ROTATION_GROUPS[g] if isinstance(g, str) else g) for g in groups]
    s_max = max(len(t) for t in tables)
    out = np.stack(
        [
            np.concatenate([t, np.tile(t[:1], (s_max - len(t), 1))])
            if len(t) < s_max
            else t
            for t in tables
        ]
    )
    return jnp.asarray(out, dtype=dtype)


def nearest_symmetry_equivalent(
    ref: jax.Array,
    cand: jax.Array,
    sym: jax.Array | None = None,
    compose: str = "sample",
) -> jax.Array:
    """Symmetry-equivalent of ``cand`` closest to ``ref``, fully vectorized.

    Two composition sides, selected by ``compose``:

    * ``"sample"`` (default): equivalents are ``sym_k ⊗ cand`` — the
      reference's FAISS semantics (faiss_db.py:388-392, scipy
      ``QUAT_SYM * candidate``), kept as the consensus plane's parity
      surface. The chroma variant (chroma_db.py:364-372) composes as
      ``(cand⁻¹ ⊗ sym_k)⁻¹ = sym_k⁻¹ ⊗ cand``, which enumerates the same
      set, so one implementation serves both.
    * ``"crystal"``: equivalents are ``cand ⊗ sym_k`` — the physically
      equivalent orientations under this repo's crystal→detector active
      convention (crystal symmetry re-labels crystal axes, i.e. acts
      BEFORE the orientation; same side `reduce_to_fundamental_zone`
      canonicalizes with). Use this for analysis math (grain averaging,
      disorientation): the premultiplied set generally contains NO image
      near ``ref`` when ``cand`` is a different fundamental-zone
      representative of the same physical orientation (the conjugated
      operator ``cand⁻¹·sym·cand`` is not in the group), which measurably
      corrupts grain statistics at FZ boundaries (GOS 0.7°→20°,
      tests/crystal/test_maps.py).

    Args:
        ref: Reference quaternions, shape ``(..., 4)``.
        cand: Candidate quaternions, shape ``(..., 4)`` (broadcasts with ref).
        sym: Optional symmetry table ``(S, 4)``; defaults to the cubic table.
            Also accepts per-batch tables of any shape broadcasting against
            ``cand[..., None, :]`` (e.g. ``(B, 1, S, 4)`` for per-query phase
            groups in multi-phase consensus).
        compose: ``"sample"`` (premultiply, reference parity) or
            ``"crystal"`` (postmultiply, physical equivalence).

    Returns:
        Quaternions of shape ``broadcast(ref, cand).shape`` equivalent to
        ``cand`` and closest to ``ref``.
    """
    if sym is None:
        sym = cubic_symmetry_quats(dtype=cand.dtype)
    # (..., S, 4): all symmetry images of the candidate.
    all_sym = _symmetry_images(cand, sym, compose)
    delta = misorientation_angle(ref[..., None, :], all_sym)
    idx = jnp.argmin(delta, axis=-1)
    # One-hot contraction instead of take_along_axis: batched gathers over a
    # small axis lower poorly on TPU; a (S,)-one-hot einsum stays on the VPU.
    onehot = jax.nn.one_hot(idx, all_sym.shape[-2], dtype=all_sym.dtype)
    return jnp.einsum("...s,...sq->...q", onehot, all_sym)


def _symmetry_images(q: jax.Array, sym: jax.Array, compose: str) -> jax.Array:
    """All symmetry images of ``q`` → ``(..., S, 4)`` on the chosen side."""
    if compose == "sample":
        return quat_mul(sym, q[..., None, :])
    if compose == "crystal":
        return quat_mul(q[..., None, :], sym)
    raise ValueError(f"compose must be 'sample' or 'crystal', got {compose!r}")


def symmetry_reduced_misorientation(
    q1: jax.Array,
    q2: jax.Array,
    sym: jax.Array | None = None,
    compose: str = "crystal",
) -> jax.Array:
    """Minimum misorientation angle (radians) over all symmetry images of q2.

    The proper crystallographic disorientation angle: minimized over the
    CRYSTAL-side images ``q2 ⊗ sym_k`` by default (this repo's
    crystal→detector convention — the same side `reduce_to_fundamental_zone`
    uses), so two fundamental-zone representatives of the same physical
    orientation measure ≈ 0. Not used by the reference's consensus loop
    (which thresholds raw misorientation, faiss_db.py:306-313); exposed for
    analysis APIs. ``compose="sample"`` premultiplies instead (the
    reference's composition side — only equivalent when ``q1`` is the
    identity, where ``w(s⊗q) = w(q⊗s)`` makes the two sides agree).
    """
    if sym is None:
        sym = cubic_symmetry_quats(dtype=q2.dtype)
    all_sym = _symmetry_images(q2, sym, compose)
    delta = misorientation_angle(q1[..., None, :], all_sym)
    return jnp.min(delta, axis=-1)


def apply_symmetry_to_axes(axes: np.ndarray, group: str = "432") -> np.ndarray:
    """Expand direction vectors by a point group's operators (numpy, host-side).

    Used by the IPF color key (reference: latice/utils/colorkey.py:76-84, which
    is cubic-only; ``group`` extends the same expansion to every system).

    Args:
        axes: Array of shape ``(3,)`` or ``(N, 3)``.
        group: `ROTATION_GROUPS` key; default cubic.

    Returns:
        Array of shape ``(S, 3)`` or ``(N, S, 3)`` for a group of order S.
    """
    from scipy.spatial.transform import Rotation as R  # host-side only

    if group == "432":
        # The reference's table verbatim (already scalar-last): preserves its
        # exact iteration order, which the color key's first-match rule pins.
        quats_xyzw = np.asarray(CUBIC_SYMMETRY)
    else:
        wxyz = np.asarray(ROTATION_GROUPS[group])
        quats_xyzw = np.concatenate([wxyz[:, 1:4], wxyz[:, 0:1]], axis=1)
    mats = R.from_quat(quats_xyzw).as_matrix()  # (S, 3, 3)
    return np.einsum("sij,...j->...si", mats, np.asarray(axes, dtype=np.float64))
