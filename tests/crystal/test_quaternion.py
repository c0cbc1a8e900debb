"""Parity tests: latice_tpu.crystal vs scipy.spatial.transform.Rotation.

scipy is the numerical ground truth of the reference implementation
(latice/index/faiss_db.py:25, chroma_db.py:22), so every op here is checked
against it directly.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.crystal import (
    CUBIC_SYMMETRY,
    cubic_symmetry_quats,
    from_euler_zxz_deg,
    misorientation_deg,
    nearest_symmetry_equivalent,
    quat_angle,
    quat_from_scipy,
    quat_inv,
    quat_mean,
    quat_mul,
    quat_to_matrix,
    quat_to_scipy,
    to_euler_zxz_deg,
)

RNG = np.random.default_rng(42)


def random_rotations(n: int) -> R:
    return R.random(n, rng=np.random.default_rng(7))


def to_wxyz(rot: R) -> jnp.ndarray:
    return jnp.asarray(quat_from_scipy(jnp.asarray(rot.as_quat(), dtype=jnp.float32)))


def assert_rot_close(q_wxyz, rot: R, atol=1e-4):
    """Compare rotations up to sign (q ≅ -q) via rotation matrices."""
    got = np.asarray(quat_to_matrix(q_wxyz))
    want = rot.as_matrix()
    np.testing.assert_allclose(got, want, atol=atol)


class TestQuatAlgebra:
    def test_mul_matches_scipy_compose(self):
        r1, r2 = random_rotations(50), R.random(50, rng=np.random.default_rng(8))
        got = quat_mul(to_wxyz(r1), to_wxyz(r2))
        assert_rot_close(got, r1 * r2)

    def test_inv_matches_scipy(self):
        r = random_rotations(50)
        assert_rot_close(quat_inv(to_wxyz(r)), r.inv())

    def test_angle_matches_magnitude(self):
        r = random_rotations(200)
        got = np.asarray(quat_angle(to_wxyz(r)))
        np.testing.assert_allclose(got, r.magnitude(), atol=1e-5)

    def test_layout_roundtrip(self):
        q = jnp.asarray(RNG.normal(size=(10, 4)), dtype=jnp.float32)
        np.testing.assert_allclose(quat_from_scipy(quat_to_scipy(q)), q)


class TestEulerZXZ:
    def test_from_euler_matches_scipy(self):
        angles = RNG.uniform([-180, 0, -180], [180, 180, 180], size=(200, 3))
        got = from_euler_zxz_deg(jnp.asarray(angles, dtype=jnp.float32))
        assert_rot_close(got, R.from_euler("zxz", angles, degrees=True))

    def test_to_euler_roundtrip_rotation(self):
        r = random_rotations(200)
        euler = to_euler_zxz_deg(to_wxyz(r))
        back = R.from_euler("zxz", np.asarray(euler), degrees=True)
        np.testing.assert_allclose(back.as_matrix(), r.as_matrix(), atol=1e-4)

    def test_to_euler_matches_scipy_values(self):
        r = random_rotations(200)
        got = np.asarray(to_euler_zxz_deg(to_wxyz(r)))
        want = r.as_euler("zxz", degrees=True)
        np.testing.assert_allclose(got, want, atol=1e-2)

    def test_gimbal_lock_is_finite_and_correct(self):
        # Pure z-rotations hit sin(Phi)=0.
        angles = np.stack(
            [np.linspace(-170, 170, 9), np.zeros(9), np.zeros(9)], axis=-1
        )
        r = R.from_euler("zxz", angles, degrees=True)
        euler = np.asarray(to_euler_zxz_deg(to_wxyz(r)))
        assert np.all(np.isfinite(euler))
        back = R.from_euler("zxz", euler, degrees=True)
        np.testing.assert_allclose(back.as_matrix(), r.as_matrix(), atol=1e-4)

    def test_gimbal_lock_scipy_parity_at_poles(self):
        """Angle-for-angle scipy parity AT the degenerate poles Phi=0 and
        Phi=180 (VERDICT r2 #5). Phi=0 rows exist in every z1/x/z2 dictionary
        grid (data/anglefile_sample.txt), so the lock branch runs on real
        inputs; parity target is scipy's extrinsic lock convention — fold
        angle in the first slot, last angle zeroed (R.as_euler("zxz") as
        used at reference faiss_db.py:330).
        """
        import warnings

        phi1 = np.array([0.0, 2.0, 30.0, 88.0, 120.0, 179.0, 181.0, 359.0])
        phi2 = np.array([0.0, 4.0, 150.0, 90.0, 10.0, 44.0, 300.0, 2.0])
        for big_phi in (0.0, 180.0):
            angles = np.stack(
                [phi1, np.full_like(phi1, big_phi), phi2], axis=-1
            )
            r = R.from_euler("zxz", angles, degrees=True)
            got = np.asarray(to_euler_zxz_deg(to_wxyz(r)))
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", UserWarning)  # scipy lock warn
                want = r.as_euler("zxz", degrees=True)
            np.testing.assert_allclose(got, want, atol=1e-4)
            # And the zeroed-last-angle convention itself:
            np.testing.assert_allclose(got[:, 2], 0.0, atol=1e-4)

    def test_near_gimbal_lock_reconstructs_rotation(self):
        """Just off the poles the individual angles are ill-conditioned, but
        the returned triple must still reproduce the rotation."""
        rng = np.random.default_rng(11)
        rows = []
        for big_phi in (1e-4, 1e-2, 0.5, 179.5, 179.99, 179.9999):
            p1 = rng.uniform(0, 360, size=4)
            p2 = rng.uniform(0, 360, size=4)
            rows.append(np.stack([p1, np.full_like(p1, big_phi), p2], axis=-1))
        angles = np.concatenate(rows)
        r = R.from_euler("zxz", angles, degrees=True)
        euler = np.asarray(to_euler_zxz_deg(to_wxyz(r)))
        assert np.all(np.isfinite(euler))
        back = R.from_euler("zxz", euler, degrees=True)
        err = (back * r.inv()).magnitude()
        assert np.degrees(err).max() < 1e-3


class TestMisorientation:
    def test_matches_faiss_semantics(self):
        """faiss_db.py:306-308: degrees((ref.inv() * rots).magnitude())."""
        r = random_rotations(20)
        ref = r[0]
        want = np.degrees((ref.inv() * r).magnitude())
        got = np.asarray(misorientation_deg(to_wxyz(ref), to_wxyz(r)))
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_chroma_order_equals_faiss_order(self):
        """chroma_db.py:307 composes (ref * rots.inv()) — same angles."""
        r = random_rotations(20)
        ref = r[0]
        chroma = (ref * r.inv()).magnitude()
        faiss = (ref.inv() * r).magnitude()
        np.testing.assert_allclose(chroma, faiss, atol=1e-12)


class TestSymmetry:
    def test_table_is_the_cubic_group(self):
        quats = np.asarray(cubic_symmetry_quats(), dtype=np.float64)
        assert quats.shape == (24, 4)
        # Closed under composition and inverse (up to sign).
        prod = np.asarray(
            quat_mul(jnp.asarray(quats)[:, None, :], jnp.asarray(quats)[None, :, :])
        ).reshape(-1, 4)
        for p in prod:
            dist = np.minimum(
                np.linalg.norm(quats - p, axis=-1),
                np.linalg.norm(quats + p, axis=-1),
            )
            assert np.min(dist) < 1e-6

    def test_nearest_equivalent_matches_reference_faiss(self):
        """faiss_db.py:374-393 against scipy, elementwise."""
        sym = R.from_quat(np.asarray(CUBIC_SYMMETRY))
        rots = random_rotations(30)
        ref = rots[0]

        def reference_impl(cand: R) -> np.ndarray:
            all_sym = sym * cand
            delta = ref.inv() * all_sym
            return all_sym[delta.magnitude().argmin()].as_euler("zxz", degrees=True)

        want = np.stack([reference_impl(rots[i]) for i in range(len(rots))])
        got = np.asarray(
            to_euler_zxz_deg(nearest_symmetry_equivalent(to_wxyz(ref), to_wxyz(rots)))
        )
        got_m = R.from_euler("zxz", got, degrees=True).as_matrix()
        want_m = R.from_euler("zxz", want, degrees=True).as_matrix()
        np.testing.assert_allclose(got_m, want_m, atol=1e-4)

    def test_chroma_composition_selects_same_rotation(self):
        """chroma_db.py:344-375 is mathematically identical to the faiss path."""
        sym = R.from_quat(np.asarray(CUBIC_SYMMETRY))
        rots = random_rotations(30)
        ref = rots[1]

        def chroma_impl(cand: R) -> np.ndarray:
            all_sym = cand.inv() * sym
            idx = (ref * all_sym).magnitude().argmin()
            return all_sym[idx].inv().as_matrix()

        def faiss_impl(cand: R) -> np.ndarray:
            all_sym = sym * cand
            idx = (ref.inv() * all_sym).magnitude().argmin()
            return all_sym[idx].as_matrix()

        for i in range(len(rots)):
            np.testing.assert_allclose(
                chroma_impl(rots[i]), faiss_impl(rots[i]), atol=1e-10
            )


class TestQuatMean:
    @staticmethod
    def clustered_rotations(n: int, spread_deg: float = 4.0) -> R:
        """Rotations scattered around a base orientation — the consensus regime.

        (The chordal mean of *uniformly random* rotations is ill-conditioned:
        near-degenerate eigenvalues make it meaningless for any implementation.)
        """
        rng = np.random.default_rng(11)
        base = R.from_euler("zxz", [40.0, 70.0, 20.0], degrees=True)
        axes = rng.normal(size=(n, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        angles = np.radians(rng.uniform(0, spread_deg, size=(n, 1)))
        return R.from_rotvec(axes * angles) * base

    def test_matches_scipy_mean(self):
        r = self.clustered_rotations(25)
        got = quat_mean(to_wxyz(r)[None])  # batched call
        assert_rot_close(got[0], r.mean(), atol=1e-3)

    def test_weighted_mask_matches_subset_mean(self):
        r = self.clustered_rotations(10)
        mask = np.zeros(10, dtype=np.float32)
        mask[[0, 2, 5, 7]] = 1.0
        got = quat_mean(to_wxyz(r), jnp.asarray(mask))
        assert_rot_close(got, r[[0, 2, 5, 7]].mean(), atol=1e-3)

    def test_clustered_orientations(self):
        """The golden-test cluster (test_chroma_db.py:317-327) means to ~[30,45,60]."""
        cluster = np.array(
            [
                [30.0, 45.0, 60.0],
                [32.0, 44.0, 61.0],
                [31.0, 46.0, 59.0],
                [29.0, 45.0, 58.0],
                [28.0, 43.0, 62.0],
            ]
        )
        r = R.from_euler("zxz", cluster, degrees=True)
        got = np.asarray(
            to_euler_zxz_deg(quat_mean(to_wxyz(r)))
        )
        want = r.mean().as_euler("zxz", degrees=True)
        np.testing.assert_allclose(got, want, atol=1e-2)
        assert 25 < got[0] < 35 and 40 < got[1] < 50 and 55 < got[2] < 65


@pytest.mark.parametrize("batch_shape", [(), (4,), (2, 3)])
def test_shape_polymorphism(batch_shape):
    angles = jnp.asarray(
        RNG.uniform([-180, 0, -180], [180, 180, 180], size=batch_shape + (3,)),
        dtype=jnp.float32,
    )
    q = from_euler_zxz_deg(angles)
    assert q.shape == batch_shape + (4,)
    assert to_euler_zxz_deg(q).shape == batch_shape + (3,)
    assert quat_to_matrix(q).shape == batch_shape + (3, 3)
