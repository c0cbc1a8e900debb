"""Fundamental-zone sampling: uniformity, coverage, FZ membership, format.

Ground truth: scipy Rotation for misorientation math and the documented
Haar-volume arithmetic (`so3_ball_fraction`).
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.crystal import ROTATION_GROUPS
from latice_tpu.crystal.sampling import (
    euler_grid,
    halton_sequence,
    reduce_to_fundamental_zone,
    sample_fundamental_zone,
    sample_so3_halton,
    so3_ball_fraction,
    write_anglefile,
)


def misorientation_matrix_deg(quats, group):
    """(N, N) symmetry-reduced misorientation via scipy (wxyz -> xyzw)."""
    sym = R.from_quat(np.roll(ROTATION_GROUPS[group], -1, axis=1))
    rots = R.from_quat(np.roll(quats, -1, axis=1))
    n = len(quats)
    out = np.full((n, n), np.inf)
    for i in range(n):
        rel = rots[i].inv() * rots
        best = np.full(n, np.inf)
        for s in sym:
            best = np.minimum(best, (rel * s).magnitude())
        out[i] = np.degrees(best)
    np.fill_diagonal(out, np.inf)
    return out


class TestHalton:
    def test_low_discrepancy_uniform(self):
        u = halton_sequence(2000, 3)
        assert u.shape == (2000, 3)
        assert (u >= 0).all() and (u < 1).all()
        # Each coordinate's mean sits near 1/2 far tighter than random.
        np.testing.assert_allclose(u.mean(axis=0), 0.5, atol=0.01)

    def test_so3_haar_uniform(self):
        q = sample_so3_halton(4000)
        np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-12)
        # Haar-uniform => each quaternion component has mean 0, var 1/4.
        np.testing.assert_allclose(np.mean(q * q, axis=0), 0.25, atol=0.01)
        # Volume check against the exact ball fraction at 30 deg.
        ref = q[0]
        dots = np.abs(q[1:] @ ref)
        ang = 2 * np.arccos(np.clip(dots, -1, 1))
        frac = np.mean(ang < np.radians(30.0))
        assert frac == pytest.approx(so3_ball_fraction(np.radians(30.0)), rel=0.15)


class TestFundamentalZone:
    def test_reduction_is_idempotent_and_symmetric(self):
        q = sample_so3_halton(200)
        red = reduce_to_fundamental_zone(q, "432")
        np.testing.assert_allclose(
            reduce_to_fundamental_zone(red, "432"), red, atol=1e-12
        )
        # A crystal-symmetry image of q (q ∘ s: symmetry composed on the
        # crystal side) reduces to the same representative.
        sym = ROTATION_GROUPS["432"][7]
        sq = R.from_quat(np.roll(q, -1, axis=1)) * R.from_quat(
            np.roll(sym[None], -1, axis=1)
        )
        moved = np.roll(sq.as_quat(), 1, axis=1)
        np.testing.assert_allclose(
            reduce_to_fundamental_zone(moved, "432"), red, atol=1e-9
        )

    def test_reduction_preserves_physical_orientation(self):
        """The representative must be crystal-equivalent to the input —
        zero symmetry-reduced misorientation (the Hough/consensus planes
        canonicalize SOLVED orientations; a representative from the wrong
        coset would be a different physical orientation)."""
        q = sample_so3_halton(100)
        red = reduce_to_fundamental_zone(q, "432")
        sym = R.from_quat(np.roll(ROTATION_GROUPS["432"], -1, axis=1))
        r_in = R.from_quat(np.roll(q, -1, axis=1))
        r_out = R.from_quat(np.roll(red, -1, axis=1))
        for a, b in zip(r_in, r_out):
            mis = min(((a * s).inv() * b).magnitude() for s in sym)
            assert mis < 1e-9

    def test_unknown_group(self):
        with pytest.raises(ValueError, match="unknown point group"):
            reduce_to_fundamental_zone(np.eye(4)[:1], "532")
        with pytest.raises(ValueError, match="unknown point group"):
            sample_fundamental_zone("532")

    @pytest.mark.parametrize("group", ["432", "622", "222"])
    def test_mean_spacing_matches_resolution(self, group):
        res = 8.0
        q = sample_fundamental_zone(group, resolution_deg=res)
        d = misorientation_matrix_deg(q, group)
        nn = d.min(axis=1)
        # Mean NN misorientation within 40% of the request (the sizing is
        # Poisson-calibrated; low-discrepancy sets run a bit wide).
        assert nn.mean() == pytest.approx(res, rel=0.4)

    def test_coverage_of_random_orientations(self):
        res = 10.0
        q = sample_fundamental_zone("432", resolution_deg=res)
        rng = np.random.default_rng(0)
        probes = R.random(64, random_state=rng)
        probe_q = np.roll(probes.as_quat(), 1, axis=1)
        sym = R.from_quat(np.roll(ROTATION_GROUPS["432"], -1, axis=1))
        samples = R.from_quat(np.roll(q, -1, axis=1))
        worst = 0.0
        for p in probes:
            rel = p.inv() * samples
            best = np.inf
            for s in sym:
                best = min(best, (rel * s).magnitude().min())
            worst = max(worst, np.degrees(best))
        # Covering radius stays within ~2.5x the mean-spacing request.
        assert worst < 2.5 * res

    def test_resolution_validation(self):
        with pytest.raises(ValueError, match="positive"):
            sample_fundamental_zone("432", resolution_deg=0)
        with pytest.raises(ValueError, match="max_samples"):
            sample_fundamental_zone("1", resolution_deg=0.1, max_samples=100)


class TestEulerGridAndAnglefile:
    def test_reference_sample_grid_shape(self):
        # The reference's 625-row grid: 1 deg steps over 25x25 (z1, x).
        g = euler_grid(1.0, (0, 25), (0, 25), (0, 1))
        assert g.shape == (625, 3)
        assert g[0].tolist() == [0, 0, 0]
        assert g[-1].tolist() == [24, 24, 0]

    def test_grid_validation(self):
        with pytest.raises(ValueError, match="positive"):
            euler_grid(0.0)

    def test_anglefile_roundtrip(self, tmp_path):
        from latice_tpu.data import parse_angle_file

        g = euler_grid(30.0)
        path = tmp_path / "grid.txt"
        write_anglefile(path, g)
        back = parse_angle_file(path)
        np.testing.assert_allclose(back, g, atol=1e-6)
        head = path.read_text().splitlines()[:2]
        assert head == ["eu", str(len(g))]

    def test_anglefile_shape_validation(self, tmp_path):
        with pytest.raises(ValueError, match="Euler degrees"):
            write_anglefile(tmp_path / "x.txt", np.zeros((3, 4)))

    def test_fz_samples_to_anglefile_to_dictionary(self, tmp_path):
        """The full loop a user runs: sample -> anglefile -> parse."""
        from latice_tpu.crystal import to_euler_zxz_deg
        from latice_tpu.data import parse_angle_file

        q = sample_fundamental_zone("432", resolution_deg=12.0)
        eulers = np.asarray(to_euler_zxz_deg(q.astype(np.float32)))
        path = tmp_path / "fz.txt"
        write_anglefile(path, eulers)
        back = parse_angle_file(path)
        assert back.shape == eulers.shape
        np.testing.assert_allclose(back, eulers, atol=1e-5)
