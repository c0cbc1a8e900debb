"""Pure-JAX quaternion / rotation algebra for crystallographic orientations.

This module is the TPU-native replacement for every `scipy.spatial.transform.Rotation`
call on the reference's query hot path (reference: latice/index/chroma_db.py:296-375,
latice/index/faiss_db.py:294-393). All functions are shape-polymorphic over leading
batch dimensions, jit/vmap-friendly, and free of data-dependent Python control flow,
so the whole orientation-consensus pipeline can be compiled into a single XLA program.

Conventions
-----------
* Quaternions are stored **scalar-first** ``(w, x, y, z)`` in arrays of shape
  ``(..., 4)``. (scipy stores scalar-last; converters are provided.)
* Composition follows the Hamilton product, matching scipy semantics:
  ``quat_mul(q1, q2)`` represents the rotation ``R1 @ R2`` — i.e. apply ``R2``
  first — exactly like scipy's ``R1 * R2``.
* Euler angles use the **extrinsic "zxz"** convention in degrees, matching every
  ``R.from_euler("zxz", ..., degrees=True)`` call in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "quat_normalize",
    "quat_mul",
    "quat_inv",
    "quat_angle",
    "quat_canonical",
    "from_axis_angle",
    "from_euler_zxz_deg",
    "to_euler_zxz_deg",
    "quat_to_matrix",
    "matrix_to_euler_zxz_deg",
    "misorientation_angle",
    "misorientation_deg",
    "quat_mean",
    "quat_from_scipy",
    "quat_to_scipy",
]


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternions to unit length along the last axis."""
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(norm, eps)


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product ``q1 ⊗ q2`` (≡ scipy's ``R1 * R2``; applies R2 first).

    Broadcasts over leading dimensions.
    """
    w1, x1, y1, z1 = jnp.split(q1, 4, axis=-1)
    w2, x2, y2, z2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_inv(q: jax.Array) -> jax.Array:
    """Inverse of a unit quaternion (conjugate)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_angle(q: jax.Array) -> jax.Array:
    """Rotation angle in radians, in ``[0, pi]``.

    Matches ``scipy.Rotation.magnitude()`` (reference misorientation measure,
    latice/index/faiss_db.py:307).
    """
    vec_norm = jnp.linalg.norm(q[..., 1:], axis=-1)
    return 2.0 * jnp.arctan2(vec_norm, jnp.abs(q[..., 0]))


def quat_canonical(q: jax.Array) -> jax.Array:
    """Return the representative with non-negative scalar part (q ≅ -q)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def from_axis_angle(axis: jax.Array, angle_rad: jax.Array) -> jax.Array:
    """Quaternion for a rotation of ``angle_rad`` about unit vector ``axis``."""
    half = angle_rad[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def _axis_quat(angle_rad: jax.Array, axis_index: int) -> jax.Array:
    """Quaternion for rotation about a coordinate axis (0=x, 1=y, 2=z)."""
    half = angle_rad / 2.0
    zeros = jnp.zeros_like(half)
    parts = [jnp.cos(half), zeros, zeros, zeros]
    parts[1 + axis_index] = jnp.sin(half)
    return jnp.stack(parts, axis=-1)


def from_euler_zxz_deg(angles_deg: jax.Array) -> jax.Array:
    """Quaternion from extrinsic-zxz Euler angles in degrees, shape ``(..., 3)``.

    Matches ``scipy.Rotation.from_euler("zxz", angles, degrees=True)``
    (reference: latice/index/faiss_db.py:294). Extrinsic rotations apply in the
    order given about fixed axes, so ``R = Rz(a3) @ Rx(a2) @ Rz(a1)``.
    """
    a = jnp.deg2rad(angles_deg)
    q1 = _axis_quat(a[..., 0], 2)  # first: about z
    q2 = _axis_quat(a[..., 1], 0)  # second: about x (fixed frame)
    q3 = _axis_quat(a[..., 2], 2)  # third: about z (fixed frame)
    return quat_mul(q3, quat_mul(q2, q1))


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Rotation matrix of shape ``(..., 3, 3)`` from unit quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_euler_zxz_deg(mat: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Extrinsic-zxz Euler angles (degrees) from rotation matrices ``(..., 3, 3)``.

    Extrinsic zxz with angles ``(a1, a2, a3)`` equals intrinsic ZXZ with angles
    ``(a3, a2, a1)``; we extract the intrinsic angles from
    ``R = Rz(p1) @ Rx(P) @ Rz(p2)`` and swap. Gimbal-locked inputs
    (``sin(P) ≈ 0``) put the full z-rotation into the *first* extrinsic angle
    and zero the last — scipy's convention for extrinsic sequences (pinned at
    both poles by tests/crystal/test_quaternion.py).
    """
    r02, r12, r22 = mat[..., 0, 2], mat[..., 1, 2], mat[..., 2, 2]
    r20, r21 = mat[..., 2, 0], mat[..., 2, 1]
    r00, r10 = mat[..., 0, 0], mat[..., 1, 0]

    # atan2(sin, cos) rather than arccos(r22): near the poles cos(P) rounds
    # to ±1 in f32 for P under ~0.04 deg, which would misroute small-but-real
    # x-tilts into the lock branch; sqrt(r20^2+r21^2) = |sin(P)| stays
    # first-order accurate there.
    sin_phi = jnp.sqrt(r20 * r20 + r21 * r21)
    big_phi = jnp.arctan2(sin_phi, r22)
    degenerate = sin_phi < eps

    phi1 = jnp.arctan2(r02, -r12)  # intrinsic first angle
    phi2 = jnp.arctan2(r20, r21)  # intrinsic last angle

    # Gimbal lock: the rotation degenerates to Rz(p1+p2) (Phi=0, r22>0) or
    # Rz(p1-p2)·Rx(pi) (Phi=pi, r22<0); in both cases r00=cos(f), r10=sin(f)
    # for the folded z-angle f. scipy zeroes the *last* extrinsic angle, i.e.
    # the intrinsic first angle p1, and carries the fold in the extrinsic
    # first slot a1 = p2: at Phi=0, Rz(a1)=Rz(f) needs a1=f; at Phi=pi,
    # Rx(pi)Rz(a1) has fold -a1, so a1=-f.
    phi1_lock = jnp.zeros_like(r00)
    phi2_lock = jnp.arctan2(jnp.where(r22 > 0, r10, -r10), r00)

    phi1 = jnp.where(degenerate, phi1_lock, phi1)
    phi2 = jnp.where(degenerate, phi2_lock, phi2)

    # extrinsic (a1, a2, a3) = intrinsic (p2, P, p1)
    out = jnp.stack([phi2, big_phi, phi1], axis=-1)
    return jnp.rad2deg(out)


def to_euler_zxz_deg(q: jax.Array) -> jax.Array:
    """Extrinsic-zxz Euler angles in degrees from quaternions ``(..., 4)``.

    Matches ``scipy.Rotation.as_euler("zxz", degrees=True)``
    (reference: latice/index/faiss_db.py:330,393).
    """
    return matrix_to_euler_zxz_deg(quat_to_matrix(quat_normalize(q)))


def misorientation_angle(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Misorientation angle in radians between rotations, broadcasted.

    Equals ``(R1.inv() * R2).magnitude()`` — and, because conjugate rotations
    share their angle, also ``(R1 * R2.inv()).magnitude()``: the reference's
    two backends (chroma_db.py:307 vs faiss_db.py:306-307) compute the same
    quantity despite differing composition order.
    """
    return quat_angle(quat_mul(quat_inv(q1), q2))


def misorientation_deg(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Misorientation angle in degrees (faiss_db.py:308 semantics)."""
    return jnp.rad2deg(misorientation_angle(q1, q2))


def quat_mean(
    quats: jax.Array,
    weights: jax.Array | None = None,
    method: str = "power",
    iterations: int = 30,
) -> jax.Array:
    """Weighted chordal-L2 mean rotation, matching ``scipy.Rotation.mean()``.

    The mean is the leading eigenvector of ``M = Σ_i w_i q_i q_iᵀ`` over the
    second-to-last axis: ``quats`` has shape ``(..., N, 4)``, the result
    ``(..., 4)``. With all-zero weights the result is arbitrary but finite
    (callers mask `success` separately, mirroring faiss_db.py:331-334).

    Args:
        method: ``"power"`` (default) uses power iteration on the 4x4
            accumulator — pure VPU matvecs that fuse cleanly into larger XLA
            programs (``eigh`` inside a fused TPU program is ~30x slower).
            For rotation clusters the spectral gap is large, so 30 iterations
            reach float32 machine precision. ``"eigh"`` uses the direct
            eigendecomposition.
    """
    if weights is not None:
        q = quats * weights[..., None]
    else:
        q = quats
    m = jnp.einsum("...ni,...nj->...ij", q, quats)

    if method == "eigh":
        # eigh returns ascending eigenvalues; the mean is the last eigenvector.
        _, vecs = jnp.linalg.eigh(m)
        return quat_canonical(quat_normalize(vecs[..., :, -1]))

    # Power iteration, initialized at the sign-aligned weighted sum — already
    # close to the dominant eigenvector for any coherent cluster.
    v0 = quat_canonical(quats)
    if weights is not None:
        v0 = v0 * weights[..., None]
    v0 = v0.sum(axis=-2)
    # Degenerate (all-masked) fallback: identity quaternion.
    degenerate = jnp.linalg.norm(v0, axis=-1, keepdims=True) < 1e-6
    identity = jnp.zeros_like(v0).at[..., 0].set(1.0)
    v0 = quat_normalize(jnp.where(degenerate, identity, v0))

    # Unrolled on purpose: a lax loop of tiny (…,4,4)x(…,4) matvecs becomes a
    # sequence of padded micro-kernels on TPU (~ms each); unrolled, XLA fuses
    # the whole chain into one kernel.
    v = v0
    for _ in range(iterations):
        v = quat_normalize(jnp.einsum("...ij,...j->...i", m, v))
    return quat_canonical(v)


def quat_from_scipy(q_xyzw: jax.Array) -> jax.Array:
    """Convert scalar-last (scipy) quaternion layout to scalar-first."""
    return jnp.concatenate([q_xyzw[..., 3:4], q_xyzw[..., 0:3]], axis=-1)


def quat_to_scipy(q_wxyz: jax.Array) -> jax.Array:
    """Convert scalar-first quaternion layout to scalar-last (scipy)."""
    return jnp.concatenate([q_wxyz[..., 1:4], q_wxyz[..., 0:1]], axis=-1)
