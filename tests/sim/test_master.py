"""Master-pattern rendering: Lambert-map round trips + the closed
consistency loop against the direct kinematical renderer."""

import numpy as np
import pytest

from latice_tpu.sim import (
    DetectorGeometry,
    cubic_reflectors,
    directions_to_lambert,
    lambert_to_directions,
    make_kinematical_master,
    render_from_master,
    simulate_patterns,
)


class TestLambertMap:
    def test_round_trip_north(self):
        rng = np.random.default_rng(0)
        d = rng.normal(size=(500, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d[:, 2] = np.abs(d[:, 2])  # north hemisphere
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        back = lambert_to_directions(directions_to_lambert(d))
        np.testing.assert_allclose(back, d, atol=1e-12)

    def test_south_maps_to_antipode(self):
        d = np.asarray([[0.3, -0.2, -0.933]])
        d /= np.linalg.norm(d)
        xy = directions_to_lambert(d)
        np.testing.assert_allclose(
            lambert_to_directions(xy), -d, atol=1e-12
        )

    def test_equal_area_property(self):
        # The Jacobian of an equal-area map is constant: uniform directions
        # land uniformly in the disk of radius sqrt(2).
        rng = np.random.default_rng(1)
        d = rng.normal(size=(20000, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        xy = directions_to_lambert(d)
        r2 = (xy * xy).sum(axis=1)
        # For an equal-area disk map, r^2 is uniform on [0, 2].
        hist, _ = np.histogram(r2, bins=8, range=(0, 2))
        assert hist.min() > 0.8 * hist.mean()

    def test_pole_and_equator(self):
        np.testing.assert_allclose(
            directions_to_lambert(np.asarray([0.0, 0.0, 1.0])), [0, 0],
            atol=1e-12,
        )
        eq = directions_to_lambert(np.asarray([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.linalg.norm(eq), np.sqrt(2), atol=1e-12)


class TestMasterRendering:
    def test_matches_direct_renderer(self):
        """The closed loop: band model -> master image -> lookup rendering
        must reproduce the direct renderer (verifies every piece of the
        lookup geometry before a user trusts an external master)."""
        refl = cubic_reflectors("fcc", max_hkl=2, min_d=1.0)
        geom = DetectorGeometry(shape=(64, 64))
        master = make_kinematical_master(size=1025, reflectors=refl)
        rng = np.random.default_rng(2)
        q = rng.normal(size=(4, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        via_master = render_from_master(master, q, geom)
        direct = simulate_patterns(q, geom, refl)
        # Bilinear interpolation on a 1025px master vs the analytic bands:
        # agreement to ~1% of full scale everywhere.
        assert np.abs(via_master - direct).max() < 0.04
        assert np.abs(via_master - direct).mean() < 0.004

    def test_rotation_moves_pattern(self):
        master = make_kinematical_master(size=257)
        a = render_from_master(master, np.asarray([[1.0, 0, 0, 0]]))
        b = render_from_master(
            master, np.asarray([[0.9659258, 0.0, 0.0, 0.2588190]])  # 30 deg z
        )
        assert not np.allclose(a, b, atol=0.05)

    def test_euler_input_matches_quats(self):
        from scipy.spatial.transform import Rotation as R

        master = make_kinematical_master(size=257)
        eulers = np.asarray([[15.0, 50.0, 30.0], [120.0, 80.0, 10.0]])
        quats = np.roll(
            R.from_euler("zxz", eulers, degrees=True).as_quat(), 1, axis=1
        )
        np.testing.assert_allclose(
            render_from_master(master, eulers),
            render_from_master(master, quats),
            atol=1e-5,
        )

    def test_chunking_matches_oneshot(self):
        master = make_kinematical_master(size=129)
        rng = np.random.default_rng(3)
        q = rng.normal(size=(5, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        geom = DetectorGeometry(shape=(32, 32))
        np.testing.assert_allclose(
            render_from_master(master, q, geom, chunk=2),
            render_from_master(master, q, geom, chunk=16),
            atol=1e-7,
        )

    def test_validation(self):
        master = make_kinematical_master(size=65)
        with pytest.raises(ValueError, match="square"):
            render_from_master(master[:32], np.eye(4)[:1])
        with pytest.raises(ValueError, match="quaternions"):
            render_from_master(master, np.zeros((2, 5)))


class TestSquareLambert:
    def test_round_trip_square_to_dirs(self):
        from latice_tpu.sim import square_lambert_to_directions
        from latice_tpu.sim.master import _directions_to_square_lambert

        rng = np.random.default_rng(2)
        ab = rng.uniform(-0.999, 0.999, size=(2000, 2))
        d = square_lambert_to_directions(ab)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-12)
        assert np.all(d[:, 2] >= -1e-12)
        back = _directions_to_square_lambert(d)
        np.testing.assert_allclose(back, ab, atol=1e-9)

    def test_equal_area_property(self):
        # Uniform points in the square -> uniform hemisphere directions:
        # E[z] = 1/2 and each z-band holds its share.
        from latice_tpu.sim import square_lambert_to_directions

        rng = np.random.default_rng(3)
        ab = rng.uniform(-1, 1, size=(200_000, 2))
        z = square_lambert_to_directions(ab)[:, 2]
        assert abs(z.mean() - 0.5) < 5e-3
        hist, _ = np.histogram(z, bins=10, range=(0, 1))
        assert hist.min() > 0.9 * len(z) / 10

    def test_center_is_pole_boundary_is_equator(self):
        from latice_tpu.sim import square_lambert_to_directions

        np.testing.assert_allclose(
            square_lambert_to_directions(np.zeros(2)), [0, 0, 1], atol=1e-12
        )
        for edge in ([1.0, 0.0], [0.0, -1.0], [1.0, 1.0], [-1.0, 0.3]):
            d = square_lambert_to_directions(np.asarray(edge))
            assert abs(d[2]) < 1e-9, (edge, d)

    def test_resample_reproduces_direct_master(self):
        # Build the kinematical band model natively in the SQUARE layout,
        # resample to the circular convention, and compare against the
        # directly-rendered circular master away from the equator rim
        # (bilinear + rim distortion is worst there).
        from latice_tpu.sim import resample_square_lambert, square_lambert_to_directions

        refl = cubic_reflectors()
        n = 257
        half = (n - 1) / 2.0
        ij = (np.arange(n) - half) / half
        a, b = np.meshgrid(ij, -ij, indexing="xy")
        d = square_lambert_to_directions(np.stack([a, b], axis=-1))
        sines = d @ refl.normals.astype(np.float64).T
        halfw = refl.sin_theta.astype(np.float64)
        soft = np.maximum(halfw * 0.25, 1e-6)
        profile = 1.0 / (1.0 + np.exp(-(halfw - np.abs(sines)) / soft))
        square = (profile @ refl.intensity.astype(np.float64)).astype(np.float32)

        got = resample_square_lambert(square, size=n)
        want = make_kinematical_master(size=n, reflectors=refl)
        x, y = np.meshgrid(ij, ij, indexing="xy")
        interior = x * x + y * y < 0.85**2
        err = np.abs(got - want)[interior]
        scale = want.max() - want.min()
        assert np.median(err) < 0.01 * scale
        assert np.percentile(err, 99) < 0.05 * scale

    def test_resampled_master_renders_like_direct(self):
        from latice_tpu.sim import (
            render_from_master,
            resample_square_lambert,
            square_lambert_to_directions,
        )

        refl = cubic_reflectors()
        n = 257
        half = (n - 1) / 2.0
        ij = (np.arange(n) - half) / half
        a, b = np.meshgrid(ij, -ij, indexing="xy")
        d = square_lambert_to_directions(np.stack([a, b], axis=-1))
        sines = d @ refl.normals.astype(np.float64).T
        halfw = refl.sin_theta.astype(np.float64)
        soft = np.maximum(halfw * 0.25, 1e-6)
        square = (
            (1.0 / (1.0 + np.exp(-(halfw - np.abs(sines)) / soft)))
            @ refl.intensity.astype(np.float64)
        ).astype(np.float32)
        circ = resample_square_lambert(square)
        quats = np.asarray([[1.0, 0, 0, 0], [0.9, 0.3, 0.2, 0.1]])
        geom = DetectorGeometry(shape=(64, 64))
        got = render_from_master(circ, quats, geom)
        want = render_from_master(
            make_kinematical_master(size=257, reflectors=refl), quats, geom
        )
        assert np.median(np.abs(got - want)) < 0.02

    def test_bad_shape_rejected(self):
        from latice_tpu.sim import resample_square_lambert

        with pytest.raises(ValueError, match="square master"):
            resample_square_lambert(np.zeros((5, 7)))


class TestMasterFromPatterns:
    """`master_from_patterns` — the inverse of `render_from_master`:
    learn a master from indexed experimental patterns (the
    kikuchipy/EMSphInx "experimental master" workflow)."""

    @pytest.fixture(scope="class")
    def learned(self):
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.sim import master_from_patterns

        refl = cubic_reflectors("fcc", a=3.52, kv=20.0)
        true = make_kinematical_master(size=129, reflectors=refl)
        geom = DetectorGeometry(shape=(64, 64))
        rots = R.random(160, random_state=3)
        quats = np.roll(rots.as_quat(), 1, axis=1)
        pats = render_from_master(true, quats, geom)
        learned, weights = master_from_patterns(
            pats, quats, geom, size=129, group="432"
        )
        return true, geom, quats, pats, learned, weights

    def test_recovers_the_true_master(self, learned):
        true, _, _, _, est, weights = learned
        covered = weights > 1e-9
        # The valid disc is pi/4 of the square; the cubic orbit fills it.
        assert covered.mean() > 0.75
        a = est[covered] - est[covered].mean()
        b = true[covered] - true[covered].mean()
        ncc = float(
            (a * b).sum()
            / np.sqrt((a * a).sum() * (b * b).sum() + 1e-30)
        )
        assert ncc > 0.9, ncc

    def test_rerender_matches_true_master_renders(self, learned):
        from scipy.spatial.transform import Rotation as R

        true, geom, _, _, est, _ = learned
        held = np.roll(R.random(12, random_state=7).as_quat(), 1, axis=1)
        a = render_from_master(true, held, geom).reshape(12, -1)
        b = render_from_master(est, held, geom).reshape(12, -1)
        a = a - a.mean(axis=1, keepdims=True)
        b = b - b.mean(axis=1, keepdims=True)
        ncc = (a * b).sum(axis=1) / np.sqrt(
            (a * a).sum(axis=1) * (b * b).sum(axis=1) + 1e-30
        )
        assert np.median(ncc) > 0.9, ncc

    def test_euler_input_matches_quats(self, learned):
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.sim import master_from_patterns

        _, geom, quats, pats, est, _ = learned
        eulers = R.from_quat(np.roll(quats, -1, axis=1)).as_euler(
            "zxz", degrees=True
        )
        est2, _ = master_from_patterns(
            pats, eulers, geom, size=129, group="432"
        )
        np.testing.assert_allclose(est2, est, atol=1e-5)

    def test_validation(self, learned):
        from latice_tpu.sim import master_from_patterns

        _, geom, quats, pats, _, _ = learned
        with pytest.raises(ValueError, match="orientations"):
            master_from_patterns(pats, quats[: len(pats) - 1], geom)
        with pytest.raises(ValueError, match="point group"):
            master_from_patterns(pats, quats, geom, group="nope")
        with pytest.raises(ValueError, match="patterns"):
            master_from_patterns(pats[0], quats, geom)
