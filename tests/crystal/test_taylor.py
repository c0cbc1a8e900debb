"""Taylor factors: Bishop-Hill vertex enumeration, classic anchors."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.crystal import (
    TaylorResult,
    bishop_hill_vertices,
    taylor_factors,
)
from latice_tpu.crystal.schmid import slip_systems


class TestBishopHillVertices:
    def test_fcc_reproduces_the_28_stress_states(self):
        """The enumeration finds exactly the 56 = ±28 Bishop-Hill vertices."""
        v = bishop_hill_vertices("fcc")
        assert v.shape == (56, 3, 3)
        # closed under negation
        key = {tuple(np.round(x.ravel(), 8)) for x in v}
        assert {tuple(np.round(-x.ravel(), 8)) for x in v} == key

    def test_vertices_on_the_yield_surface(self):
        """Every vertex activates >= 5 systems at |sigma:P| = tau and
        violates none."""
        n, d = slip_systems("fcc", dtype=np.float64)
        p = 0.5 * (d[:, :, None] * n[:, None, :] + n[:, :, None] * d[:, None, :])
        rss = np.abs(np.einsum("vij,sij->vs", bishop_hill_vertices("fcc"), p))
        assert rss.max() <= 1.0 + 1e-8
        assert ((rss > 1.0 - 1e-8).sum(axis=1) >= 5).all()

    def test_bcc_duality(self):
        """bcc {110}<111> has the same polytope as fcc (sym(b x n) symmetry)."""
        vf = {tuple(np.round(x.ravel(), 8)) for x in bishop_hill_vertices("fcc")}
        vb = {tuple(np.round(x.ravel(), 8)) for x in bishop_hill_vertices("bcc")}
        assert vf == vb

    def test_traceless_symmetric(self):
        v = bishop_hill_vertices("bcc112")
        np.testing.assert_allclose(np.trace(v, axis1=1, axis2=2), 0, atol=1e-12)
        np.testing.assert_allclose(v, np.swapaxes(v, 1, 2), atol=1e-12)

    def test_unknown_family(self):
        with pytest.raises(ValueError, match="unknown slip family"):
            bishop_hill_vertices("hexagonal-basal")


class TestTaylorFactors:
    def test_cube_orientation_anchor(self):
        """M = sqrt(6) = 2.449 for <100> uniaxial tension (classic value)."""
        res = taylor_factors(np.zeros((1, 3)))
        assert res.factor[0] == pytest.approx(np.sqrt(6.0), rel=1e-6)

    def test_111_fiber_anchor(self):
        """M = 1.5*sqrt(6) = 3.674 for <111> tension (the hard fiber)."""
        g = R.align_vectors([[1, 1, 1] / np.sqrt(3.0)], [[0, 0, 1]])[0]
        e = np.asarray([g.as_euler("zxz", degrees=True)])
        assert taylor_factors(e).factor[0] == pytest.approx(
            1.5 * np.sqrt(6.0), rel=1e-5
        )

    def test_random_texture_mean_taylor_3_07(self):
        """Random fcc polycrystal: mean M = 3.067 (Taylor 1938)."""
        rng = np.random.default_rng(0)
        euler = R.random(3000, random_state=rng).as_euler("zxz", degrees=True)
        m = taylor_factors(euler).factor
        assert m.mean() == pytest.approx(3.067, rel=0.01)
        # <111> tension is the global max; the min dips to ~2.23 between
        # the <100> and <110> fibers (standard FC Taylor IPF map).
        assert m.min() > 2.2 and m.max() < 1.5 * np.sqrt(6.0) + 1e-6

    def test_load_direction_equivalence(self):
        """Tension along <100> sample axes is orientation-symmetric at cube."""
        e = np.zeros((1, 3))
        mx = taylor_factors(e, (1, 0, 0)).factor[0]
        mz = taylor_factors(e, (0, 0, 1)).factor[0]
        assert mx == pytest.approx(mz, rel=1e-9)

    def test_sample_rotation_invariance(self):
        rng = np.random.default_rng(1)
        g = R.random(8, random_state=rng)
        rot = R.random(random_state=rng)
        d = np.asarray([0.2, 0.5, -0.8])
        m0 = taylor_factors(g.as_euler("zxz", degrees=True), d).factor
        m1 = taylor_factors(
            (g * rot.inv()).as_euler("zxz", degrees=True), rot.apply(d)
        ).factor
        np.testing.assert_allclose(m1, m0, rtol=1e-4)

    def test_grid_shape_and_result_type(self):
        res = taylor_factors(np.zeros((4, 5, 3)))
        assert isinstance(res, TaylorResult)
        assert res.factor.shape == (4, 5) and res.vertex.shape == (4, 5)

    def test_errors(self):
        with pytest.raises(ValueError, match="Euler"):
            taylor_factors(np.zeros((5, 2)))
        with pytest.raises(ValueError, match="nonzero"):
            taylor_factors(np.zeros((1, 3)), load_direction=(0, 0, 0))
