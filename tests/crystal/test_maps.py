"""Orientation-map analysis: misorientation fields, KAM, grain labeling."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.crystal import (
    CUBIC_SYMMETRY,
    grain_boundary_mask,
    kernel_average_misorientation,
    label_grains,
    misorientation_maps,
)


def _two_grain_map(h=6, w=8, split=4, seed=0):
    """Left block ~[10,20,30], right block ~[80,60,40], ~0.3 deg in-grain noise."""
    rng = np.random.default_rng(seed)
    euler = np.empty((h, w, 3))
    euler[:, :split] = [10.0, 20.0, 30.0]
    euler[:, split:] = [80.0, 60.0, 40.0]
    euler += rng.normal(scale=0.1, size=euler.shape)
    return euler


class TestMisorientationMaps:
    def test_fields_match_scipy(self):
        euler = _two_grain_map()
        maps = misorientation_maps(euler, group="432")
        # Cross-check one in-grain and one boundary east edge against scipy.
        sym = R.from_quat(np.asarray(CUBIC_SYMMETRY)[:, [1, 2, 3, 0]])
        for (i, j) in [(2, 1), (3, 3)]:
            qa = R.from_euler("zxz", euler[i, j], degrees=True)
            qb = R.from_euler("zxz", euler[i, j + 1], degrees=True)
            expected = min(
                (qa.inv() * (s * qb)).magnitude() for s in sym
            ) * 180.0 / np.pi
            assert maps.east[i, j] == pytest.approx(expected, abs=1e-3)

    def test_edges_are_zero(self):
        maps = misorientation_maps(_two_grain_map(), group="432")
        np.testing.assert_array_equal(maps.east[:, -1], 0.0)
        np.testing.assert_array_equal(maps.south[-1, :], 0.0)

    def test_symmetry_equivalents_are_zero_misorientation(self):
        # A 90-deg z-rotation is in 432: disorientation across the "boundary"
        # must vanish, and the whole map must segment as ONE grain.
        euler = np.zeros((4, 4, 3))
        euler[:, 2:] = [90.0, 0.0, 0.0]
        maps = misorientation_maps(euler, group="432")
        assert float(maps.east.max()) < 1e-3
        _, n = label_grains(maps, threshold_deg=5.0)
        assert n == 1

    def test_triclinic_group_sees_the_boundary(self):
        euler = np.zeros((4, 4, 3))
        euler[:, 2:] = [90.0, 0.0, 0.0]
        maps = misorientation_maps(euler, group="1")
        assert maps.east[0, 1] == pytest.approx(90.0, abs=1e-3)

    def test_input_validation(self):
        with pytest.raises(ValueError, match="Euler grid"):
            misorientation_maps(np.zeros((5, 3)))
        with pytest.raises(ValueError, match="at least 2x2"):
            misorientation_maps(np.zeros((1, 5, 3)))


class TestGrainAnalysis:
    def test_two_grains_segmented(self):
        maps = misorientation_maps(_two_grain_map(), group="432")
        labels, n = label_grains(maps, threshold_deg=5.0)
        assert n == 2
        assert (labels[:, :4] == 0).all()
        assert (labels[:, 4:] == 1).all()

    def test_boundary_mask_hugs_the_split(self):
        maps = misorientation_maps(_two_grain_map(), group="432")
        mask = grain_boundary_mask(maps, threshold_deg=5.0)
        assert mask[:, 3].all() and mask[:, 4].all()
        assert not mask[:, :3].any() and not mask[:, 5:].any()

    def test_kam_excludes_boundary_edges(self):
        maps = misorientation_maps(_two_grain_map(), group="432")
        kam = kernel_average_misorientation(maps, threshold_deg=5.0)
        # In-grain noise ~0.1 deg -> KAM well under 1 deg everywhere,
        # including at the boundary (the crossing edge is filtered out).
        assert float(kam.max()) < 1.0
        assert float(kam[2:4, 1:3].mean()) > 0.0

    def test_four_quadrant_grains(self):
        euler = np.zeros((6, 6, 3))
        euler[:3, :3] = [10, 20, 30]
        euler[:3, 3:] = [40, 50, 60]
        euler[3:, :3] = [70, 30, 10]
        euler[3:, 3:] = [100, 70, 5]
        maps = misorientation_maps(euler, group="432")
        labels, n = label_grains(maps, threshold_deg=5.0)
        assert n == 4
        # Row-major first-visit order: NW=0, NE=1, SW=2, SE=3.
        assert labels[0, 0] == 0 and labels[0, 5] == 1
        assert labels[5, 0] == 2 and labels[5, 5] == 3

    def test_single_pixel_grain(self):
        euler = np.zeros((3, 3, 3))
        euler[1, 1] = [45.0, 60.0, 15.0]
        maps = misorientation_maps(euler, group="432")
        labels, n = label_grains(maps, threshold_deg=5.0)
        assert n == 2
        assert labels[1, 1] != labels[0, 0]
        assert (labels == labels[0, 0]).sum() == 8


class TestMultiphaseMaps:
    def test_phase_boundary_always_segments(self):
        """Two phases, identical orientation everywhere: the phase boundary
        alone must split the map into two grains."""
        from latice_tpu.crystal import misorientation_maps_multiphase

        euler = np.tile([10.0, 30.0, 50.0], (4, 6, 1))
        phases = np.zeros((4, 6), np.int32)
        phases[:, 3:] = 1
        maps = misorientation_maps_multiphase(euler, phases, ["432", "622"])
        labels, n = label_grains(maps, threshold_deg=5.0)
        assert n == 2
        assert (labels[:, :3] == 0).all() and (labels[:, 3:] == 1).all()
        assert float(maps.east[0, 2]) > 180.0  # phase-boundary sentinel

    def test_per_phase_symmetry_applied(self):
        """A 90-deg z rotation is cubic-equivalent (zero disorientation) but
        NOT hexagonal-equivalent: the same split map must read as one grain
        inside the cubic phase and two inside the hexagonal phase."""
        from latice_tpu.crystal import misorientation_maps_multiphase

        euler = np.zeros((4, 8, 3))
        euler[:, 2:4] = [90.0, 0.0, 0.0]  # inside cubic half
        euler[:, 6:] = [90.0, 0.0, 0.0]   # inside hexagonal half
        phases = np.zeros((4, 8), np.int32)
        phases[:, 4:] = 1
        maps = misorientation_maps_multiphase(euler, phases, ["432", "622"])
        labels, n = label_grains(maps, threshold_deg=5.0)
        # cubic half: one grain (90-deg z in 432); hex half: two grains.
        assert n == 3
        assert labels[0, 0] == labels[0, 3]
        assert labels[0, 4] != labels[0, 7]

    def test_validation(self):
        from latice_tpu.crystal import misorientation_maps_multiphase

        with pytest.raises(ValueError, match="does not match"):
            misorientation_maps_multiphase(
                np.zeros((4, 4, 3)), np.zeros((2, 2), np.int32), ["432"]
            )
        with pytest.raises(ValueError, match="only 1 groups"):
            misorientation_maps_multiphase(
                np.zeros((2, 2, 3)),
                np.array([[0, 1], [0, 1]], np.int32),
                ["432"],
            )

    def test_negative_phase_ids_are_unindexed_boundaries(self):
        """-1 (vendor 'unindexed') pixels never fuse into pseudo-grains:
        every edge touching one is a boundary."""
        from latice_tpu.crystal import misorientation_maps_multiphase

        euler = np.tile([10.0, 30.0, 50.0], (3, 4, 1))
        phases = np.zeros((3, 4), np.int32)
        phases[:, 2:] = -1
        maps = misorientation_maps_multiphase(euler, phases, ["432"])
        labels, n = label_grains(maps, threshold_deg=5.0)
        # One indexed grain (left 3x2) + 6 single-pixel unindexed grains.
        assert n == 7
        assert (labels[:, :2] == 0).all()
        assert len(np.unique(labels[:, 2:])) == 6


class TestGrainStatistics:
    def test_two_grain_sizes_means_gos(self):
        from latice_tpu.crystal import grain_statistics, misorientation_maps

        euler = _two_grain_map()  # 6x8, split at column 4, ~0.1 deg noise
        maps = misorientation_maps(euler, group="432")
        labels, n = label_grains(maps, threshold_deg=5.0)
        assert n == 2
        stats = grain_statistics(euler, labels, group="432")
        np.testing.assert_array_equal(stats.sizes_px, [24, 24])
        np.testing.assert_allclose(
            stats.equivalent_diameter_px, 2 * np.sqrt(24 / np.pi), rtol=1e-6
        )
        # Mean orientations recover the block centers within the noise.
        np.testing.assert_allclose(
            stats.mean_orientation[0], [10.0, 20.0, 30.0], atol=0.2
        )
        np.testing.assert_allclose(
            stats.mean_orientation[1], [80.0, 60.0, 40.0], atol=0.2
        )
        # GOS is the scale of the injected ~0.1 deg jitter: small but nonzero.
        assert 0.01 < stats.gos_deg[0] < 1.0
        assert 0.01 < stats.gos_deg[1] < 1.0

    def test_mean_matches_scipy_within_grain(self):
        """Against scipy: mean of a noise-free two-orientation grain."""
        from latice_tpu.crystal import grain_statistics

        rots = R.from_euler("zxz", [[20, 30, 40], [22, 30, 40]], degrees=True)
        euler = np.asarray(rots.as_euler("zxz", degrees=True), np.float32)
        labels = np.zeros(2, np.int32)
        stats = grain_statistics(euler, labels)
        expect = rots.mean().as_euler("zxz", degrees=True)
        np.testing.assert_allclose(stats.mean_orientation[0], expect, atol=1e-3)

    def test_symmetry_equivalent_representations_average_cleanly(self):
        """Pixels stored as different CRYSTAL symmetry images of ONE
        orientation (base ∘ sym — the physically equivalent set under the
        crystal→detector convention): the snap-to-seed makes the mean
        exact and GOS zero."""
        from latice_tpu.crystal import grain_statistics

        base = R.from_euler("zxz", [10, 20, 30], degrees=True)
        eulers = []
        for k in (0, 5, 11, 17):
            sym = R.from_quat(np.roll(CUBIC_SYMMETRY[k], -1))  # wxyz->xyzw
            eulers.append((base * sym).as_euler("zxz", degrees=True))
        euler = np.asarray(eulers, np.float32)
        stats = grain_statistics(euler, np.zeros(4, np.int32))
        # ~0.015 deg of float32 Euler-conversion roundoff is the floor here.
        assert stats.gos_deg[0] == pytest.approx(0.0, abs=0.05)
        got = R.from_euler("zxz", stats.mean_orientation[0], degrees=True)
        mis = (got.inv() * base * R.from_quat(np.roll(CUBIC_SYMMETRY, -1, axis=1))).magnitude()
        assert np.degrees(mis.min()) == pytest.approx(0.0, abs=0.05)

    def test_shape_validation(self):
        from latice_tpu.crystal import grain_statistics

        with pytest.raises(ValueError, match="labels"):
            grain_statistics(np.zeros((4, 3)), np.zeros(5, np.int32))


class TestDisorientationDistribution:
    def test_boundary_angles_pick_only_boundaries(self):
        from latice_tpu.crystal import boundary_disorientation_angles, misorientation_maps

        euler = _two_grain_map()  # one vertical boundary, 6 rows
        maps = misorientation_maps(euler)
        angles = boundary_disorientation_angles(maps, threshold_deg=5.0)
        assert len(angles) == 6  # the boundary column's east edges
        assert (angles > 5.0).all() and (angles < 63.0).all()

    def test_phase_sentinels_excluded(self):
        from latice_tpu.crystal import (
            boundary_disorientation_angles,
            misorientation_maps_multiphase,
        )

        euler = np.tile([10.0, 30.0, 50.0], (3, 4, 1))
        phases = np.zeros((3, 4), np.int32)
        phases[:, 2:] = 1
        maps = misorientation_maps_multiphase(euler, phases, ["432", "432"])
        angles = boundary_disorientation_angles(maps)
        assert len(angles) == 0  # only sentinel (999) edges exist

    def test_mackenzie_distribution_cubic(self):
        """Random cubic disorientations: the Mackenzie shape — cutoff at
        62.8°, mean ~40.7°, mode ~45°."""
        from latice_tpu.crystal import random_disorientation_angles

        ang = random_disorientation_angles("432", n=40000, seed=0)
        assert ang.max() <= 62.81
        assert ang.max() > 62.0
        assert abs(ang.mean() - 40.73) < 0.3
        hist, edges = np.histogram(ang, bins=31, range=(0, 62))
        mode = 0.5 * (edges[np.argmax(hist)] + edges[np.argmax(hist) + 1])
        assert 42.0 < mode < 48.0

    def test_triclinic_reaches_180(self):
        from latice_tpu.crystal import random_disorientation_angles

        ang = random_disorientation_angles("1", n=20000, seed=1)
        assert ang.max() > 175.0
        # Haar mean rotation angle: 90° + 2/π·180/π ... ~126.47°.
        assert abs(ang.mean() - 126.47) < 1.0


class TestCleanOrientationMap:
    def _two_grain(self, h=8, w=10, seed=0):
        rng = np.random.default_rng(seed)
        euler = np.empty((h, w, 3))
        euler[:, : w // 2] = [10.0, 20.0, 30.0]
        euler[:, w // 2 :] = [80.0, 60.0, 40.0]
        euler += rng.normal(scale=0.05, size=euler.shape)
        return euler

    def test_fills_bad_pixels_from_their_grain(self):
        from latice_tpu.crystal import clean_orientation_map

        euler = self._two_grain()
        bad = np.zeros((8, 10), bool)
        bad[2, 2] = bad[5, 7] = True
        junk = euler.copy()
        junk[bad] = [200.0, 100.0, 200.0]
        cleaned, filled, _ = clean_orientation_map(junk, bad=bad)
        assert filled[2, 2] and filled[5, 7] and filled.sum() == 2
        # Each fill came from a 4-neighbor inside the same grain.
        np.testing.assert_allclose(cleaned[2, 2], euler[2, 2], atol=0.5)
        np.testing.assert_allclose(cleaned[5, 7], euler[5, 7], atol=0.5)

    def test_speckle_grain_removed(self):
        from latice_tpu.crystal import (
            clean_orientation_map,
            label_grains,
            misorientation_maps,
        )

        euler = self._two_grain()
        euler[3, 3] = [150.0, 90.0, 10.0]  # 1-px misindexed speckle
        cleaned, filled, _ = clean_orientation_map(euler, min_grain_px=2)
        assert filled[3, 3] and filled.sum() == 1
        labels, n = label_grains(misorientation_maps(cleaned))
        assert n == 2

    def test_bad_region_floods_inward(self):
        from latice_tpu.crystal import clean_orientation_map

        euler = self._two_grain(h=10, w=12)
        bad = np.zeros((10, 12), bool)
        bad[3:7, 1:4] = True  # 4x3 hole inside the left grain
        junk = euler.copy()
        junk[bad] = 0.0
        cleaned, filled, _ = clean_orientation_map(junk, bad=bad)
        assert filled.sum() == bad.sum()
        np.testing.assert_allclose(
            cleaned[3:7, 1:4], euler[3:7, 1:4], atol=0.5
        )

    def test_all_bad_map_returned_unchanged(self):
        from latice_tpu.crystal import clean_orientation_map

        euler = self._two_grain()
        bad = np.ones((8, 10), bool)
        cleaned, filled, _ = clean_orientation_map(euler, bad=bad)
        assert not filled.any()
        np.testing.assert_array_equal(cleaned, euler)

    def test_multiphase_fill_carries_phase(self):
        from latice_tpu.crystal import clean_orientation_map

        euler = self._two_grain()
        phases = np.zeros((8, 10), np.int64)
        phases[:, 5:] = 1
        phases[4, 2] = -1  # unindexed pixel (vendor convention)
        cleaned, filled, ph = clean_orientation_map(
            euler, phases=phases, groups=["432", "622"]
        )
        assert filled[4, 2] and ph[4, 2] == 0
        assert (ph >= 0).all()
        np.testing.assert_allclose(cleaned[4, 2], euler[4, 2], atol=0.5)

    def test_phases_require_groups(self):
        from latice_tpu.crystal import clean_orientation_map

        with pytest.raises(ValueError, match="groups"):
            clean_orientation_map(
                self._two_grain(), phases=np.zeros((8, 10), np.int64)
            )


class TestFZBoundaryGrain:
    """Grains whose pixels straddle a fundamental-zone boundary: the seed
    snap must use CRYSTAL-side symmetry images (q ⊗ sym). With the
    premultiplied (sample/reference-parity) images there is generally NO
    image near the seed for pixels whose FZ representative differs — GOS
    measured 11-23 deg on a ~0.7 deg grain before the compose='crystal'
    fix."""

    def _boundary_grain(self, seed=61, n=120, noise_deg=0.4):
        from latice_tpu.crystal import reduce_to_fundamental_zone

        rng = np.random.default_rng(1)
        q0 = R.random(1, random_state=seed)
        noise = R.from_rotvec(np.radians(noise_deg) * rng.normal(size=(n, 3)))
        quats = np.roll((noise * q0).as_quat(), 1, axis=1)
        fz = reduce_to_fundamental_zone(quats, "432")
        # The scenario only bites if representatives actually split.
        assert (np.abs(fz @ fz[0]) < 0.995).sum() > 20
        return R.from_quat(np.roll(fz, -1, axis=1)).as_euler(
            "zxz", degrees=True
        )

    def test_gos_reflects_true_spread(self):
        from latice_tpu.crystal import grain_statistics

        eulers = self._boundary_grain()
        stats = grain_statistics(
            eulers, np.zeros(len(eulers), np.int64), group="432"
        )
        # True spread is ~0.5-0.8 deg (0.4 deg rotvec noise); anything in
        # the degrees regime means the snap failed across the boundary.
        assert stats.gos_deg[0] < 1.0, stats.gos_deg

    def test_crystal_disorientation_of_fz_images_is_zero(self):
        """Two FZ representatives of the SAME orientation measure ~0 under
        the default (crystal) composition; the sample side does not —
        pinning why the default changed."""
        import jax.numpy as jnp

        from latice_tpu.crystal import (
            reduce_to_fundamental_zone,
            symmetry_reduced_misorientation,
        )
        from latice_tpu.crystal.symmetry import symmetry_quats

        q0 = np.roll(R.random(1, random_state=61).as_quat(), 1, axis=1)[0]
        sym = np.asarray(symmetry_quats("432"), np.float64)
        # Pick a crystal image whose FZ representative differs from q0's.
        images = np.array(
            [np.asarray(
                reduce_to_fundamental_zone(
                    _quat_mul_host(q0, s)[None], "432"
                )[0]
            ) for s in sym]
        )
        rep0 = np.asarray(reduce_to_fundamental_zone(q0[None], "432"))[0]
        # All crystal images share ONE physical orientation, so every
        # representative must measure ~0 against rep0 under the crystal
        # composition.
        d = np.asarray(symmetry_reduced_misorientation(
            jnp.asarray(np.tile(rep0, (len(images), 1)), jnp.float32),
            jnp.asarray(images, jnp.float32),
        ))
        assert np.degrees(d).max() < 0.01, np.degrees(d)

    def test_sample_compose_is_reference_side(self):
        """compose='sample' premultiplies — equal to the crystal side for
        identity references (w-symmetry), different in general."""
        import jax.numpy as jnp

        from latice_tpu.crystal import symmetry_reduced_misorientation

        ident = jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)
        q = jnp.asarray(
            np.roll(R.random(5, random_state=3).as_quat(), 1, axis=1),
            jnp.float32,
        )
        a = symmetry_reduced_misorientation(ident, q, compose="crystal")
        b = symmetry_reduced_misorientation(ident, q, compose="sample")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        with pytest.raises(ValueError, match="compose"):
            symmetry_reduced_misorientation(ident, q, compose="left")


def _quat_mul_host(a, b):
    """Scalar-first quaternion product on host numpy."""
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])
