"""Pole-figure projection: geometry and symmetry behavior."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.utils import compute_pole_figure, plot_pole_figure


def _unique(pts, tol=1e-6):
    out = []
    for p in pts:
        if not any(np.linalg.norm(p - q) < tol for q in out):
            out.append(p)
    return np.asarray(out)


class TestComputePoleFigure:
    def test_identity_z_pole_projects_to_origin(self):
        pts = compute_pole_figure([[0.0, 0.0, 0.0]], pole=(0, 0, 1), group="1")
        np.testing.assert_allclose(pts, [[0.0, 0.0]], atol=1e-12)

    def test_identity_x_pole_on_rim(self):
        pts = compute_pole_figure([[0.0, 0.0, 0.0]], pole=(1, 0, 0), group="1")
        np.testing.assert_allclose(pts, [[1.0, 0.0]], atol=1e-12)

    def test_cubic_100_gives_five_unique_points(self):
        # {100} of a cube: +-x, +-y on the rim, +-z folded to the origin.
        pts = compute_pole_figure([[0.0, 0.0, 0.0]], pole=(1, 0, 0), group="432")
        uniq = _unique(pts)
        assert len(uniq) == 5
        expected = {(1, 0), (-1, 0), (0, 1), (0, -1), (0, 0)}
        got = {tuple(np.round(p, 6)) for p in uniq}
        assert got == expected

    def test_cubic_111_gives_four_unique_points(self):
        pts = compute_pole_figure([[0.0, 0.0, 0.0]], pole=(1, 1, 1), group="432")
        assert len(_unique(pts)) == 4
        # All at the stereographic radius of the 54.7-deg cone or its fold.
        radii = np.linalg.norm(_unique(pts), axis=1)
        r111 = np.tan(np.arccos(1 / np.sqrt(3)) / 2)
        np.testing.assert_allclose(sorted(set(np.round(radii, 6))), [r111], atol=1e-6)

    def test_rotation_about_z_rotates_the_figure(self):
        base = compute_pole_figure([[0.0, 0.0, 0.0]], pole=(1, 0, 0), group="1")
        rot = compute_pole_figure([[0.0, 0.0, 30.0]], pole=(1, 0, 0), group="1")
        # Extrinsic zxz with a3=30: sample sees the pole rotated by -30 deg
        # about z (g^T = Rz(-30) for this orientation).
        ang = np.deg2rad(-30.0)
        expect = base @ np.array(
            [[np.cos(ang), np.sin(ang)], [-np.sin(ang), np.cos(ang)]]
        )
        np.testing.assert_allclose(rot, expect, atol=1e-12)

    def test_matches_scipy_composition(self):
        euler = np.array([[40.0, 65.0, 110.0]])
        pole = np.array([1.0, 1.0, 0.0]) / np.sqrt(2)
        pts = compute_pole_figure(euler, pole=(1, 1, 0), group="1")
        g = R.from_euler("zxz", euler[0], degrees=True).as_matrix()
        d = g.T @ pole
        if d[2] < 0:
            d = -d
        np.testing.assert_allclose(pts[0], d[:2] / (1 + d[2]), atol=1e-10)

    def test_all_points_inside_disk(self):
        rng = np.random.default_rng(0)
        euler = rng.uniform([0, 0, 0], [360, 180, 360], size=(50, 3))
        pts = compute_pole_figure(euler, pole=(1, 1, 1), group="432")
        assert pts.shape == (50 * 24, 2)
        assert (np.linalg.norm(pts, axis=1) <= 1.0 + 1e-9).all()

    def test_validation(self):
        with pytest.raises(ValueError, match="Euler"):
            compute_pole_figure(np.zeros((3, 4)))
        with pytest.raises(ValueError, match="point group"):
            compute_pole_figure(np.zeros((2, 3)), group="999")


class TestPlotPoleFigure:
    def test_returns_figure(self):
        fig = plot_pole_figure(
            np.array([[10.0, 30.0, 50.0]]), pole=(1, 0, 0), group="432"
        )
        assert fig is not None
        import matplotlib.pyplot as plt

        plt.close(fig)
