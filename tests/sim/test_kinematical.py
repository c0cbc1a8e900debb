"""Kinematical simulator: wavelength/extinction physics pins, geometric
invariances, and renderer behavior. Ground truth is the documented physics
(the reference has no simulation stage to compare against)."""

import numpy as np
import pytest

from latice_tpu.crystal import ROTATION_GROUPS
from latice_tpu.sim import (
    DetectorGeometry,
    cubic_reflectors,
    electron_wavelength,
    pixel_directions,
    simulate_patterns,
)


class TestPhysics:
    def test_wavelength_20kv(self):
        # Relativistic formula: 0.02508 A at 200 kV, 0.0859 A at 20 kV.
        assert electron_wavelength(20.0) == pytest.approx(0.08589, rel=1e-3)
        assert electron_wavelength(200.0) == pytest.approx(0.02508, rel=1e-3)
        with pytest.raises(ValueError):
            electron_wavelength(0)

    @staticmethod
    def _norms(refl, a, kv):
        """Recover |hkl| per reflector from its Bragg sine."""
        return refl.sin_theta * 2 * a / electron_wavelength(kv)

    def test_fcc_extinction(self):
        a, kv = 3.52, 20.0
        refl = cubic_reflectors("fcc", a=a, kv=kv, max_hkl=2, min_d=0.8)
        norms = self._norms(refl, a, kv)
        has = lambda n: np.isclose(norms, n, rtol=1e-4).any()  # noqa: E731
        assert has(np.sqrt(3))       # {111} allowed
        assert has(2.0)              # {200} allowed
        assert not has(1.0)          # {100} forbidden
        assert not has(np.sqrt(2))   # {110} forbidden

    def test_bcc_extinction(self):
        a, kv = 2.87, 20.0
        refl = cubic_reflectors("bcc", a=a, kv=kv, max_hkl=2, min_d=0.8)
        norms = self._norms(refl, a, kv)
        has = lambda n: np.isclose(norms, n, rtol=1e-4).any()  # noqa: E731
        assert has(np.sqrt(2))       # {110} allowed
        assert not has(np.sqrt(3))   # {111} forbidden

    def test_antipodal_reduction_and_weights(self):
        refl = cubic_reflectors("fcc", max_hkl=2)
        # No normal appears together with its negation.
        n = np.round(refl.normals, 5)
        as_set = {tuple(row) for row in n}
        assert not any(tuple(-row) in as_set for row in n)
        assert refl.intensity.max() == pytest.approx(1.0)
        assert (refl.intensity > 0).all()

    def test_unknown_structure(self):
        with pytest.raises(ValueError, match="unknown structure"):
            cubic_reflectors("hcp")

    def test_empty_table_is_actionable(self):
        # fcc Ni: the largest allowed d-spacing is d(111) ~ 2.03 A.
        with pytest.raises(ValueError, match="min_d"):
            cubic_reflectors("fcc", a=3.52, min_d=2.1)


def _rule_oracle(structure, a, kv, max_hkl, min_d, s0=0.6):
    """Independent extinction-RULE formulation of the cubic table — the
    production path derives extinctions from structure factors over the
    conventional basis; this literal rule sweep is the test oracle."""
    rules = {
        "fcc": lambda h, k, l: (h % 2 == k % 2) & (k % 2 == l % 2),
        "bcc": lambda h, k, l: (h + k + l) % 2 == 0,
        "sc": lambda h, k, l: np.ones_like(h, bool),
    }
    lam = electron_wavelength(kv)
    r = np.arange(-max_hkl, max_hkl + 1)
    h, k, l = np.meshgrid(r, r, r, indexing="ij")
    hkl = np.stack([h.ravel(), k.ravel(), l.ravel()], 1)
    hkl = hkl[np.any(hkl != 0, axis=1)]
    hkl = hkl[rules[structure](hkl[:, 0], hkl[:, 1], hkl[:, 2])]
    keep = (
        (hkl[:, 0] > 0)
        | ((hkl[:, 0] == 0) & (hkl[:, 1] > 0))
        | ((hkl[:, 0] == 0) & (hkl[:, 1] == 0) & (hkl[:, 2] > 0))
    )
    hkl = hkl[keep]
    norm = np.linalg.norm(hkl, axis=1)
    d = a / norm
    hkl, d, norm = hkl[d >= min_d], d[d >= min_d], norm[d >= min_d]
    s = 1.0 / (2.0 * d)
    inten = np.exp(-((s / s0) ** 2))
    return (
        hkl / norm[:, None],
        lam / (2.0 * d),
        inten / inten.max(),
    )


class TestGeneralCell:
    @pytest.mark.parametrize("structure", ["fcc", "bcc", "sc"])
    def test_engine_matches_rule_oracle(self, structure):
        """The structure-factor engine reproduces the classical extinction
        rules exactly: same normals, Bragg sines and normalized weights as
        the literal rule sweep."""
        a, kv = 3.52, 20.0
        eng = cubic_reflectors(structure, a=a, kv=kv, max_hkl=3, min_d=0.8)
        normals, sines, inten = _rule_oracle(structure, a, kv, 3, 0.8)
        assert len(eng) == len(normals)
        oe = np.lexsort(np.round(eng.normals, 5).T)
        oo = np.lexsort(np.round(normals, 5).T)
        np.testing.assert_allclose(eng.normals[oe], normals[oo], atol=1e-6)
        np.testing.assert_allclose(eng.sin_theta[oe], sines[oo], atol=1e-6)
        np.testing.assert_allclose(eng.intensity[oe], inten[oo], atol=1e-5)

    def test_hcp_extinctions_and_metric(self):
        from latice_tpu.sim import hexagonal_reflectors

        a, c, kv = 2.95, 4.68, 20.0
        refl = hexagonal_reflectors(a=a, c=c, kv=kv, max_hkl=2, min_d=0.8)
        lam = electron_wavelength(kv)
        # (0002) allowed at d = c/2; (0001) forbidden (basis at z=1/2).
        sines = refl.sin_theta
        assert np.isclose(sines, lam / (2 * (c / 2)), rtol=1e-4).any()
        assert not np.isclose(sines, lam / (2 * c), rtol=1e-4).any()
        # Non-cubic metric: the (10-10) prism normal is perpendicular to c
        # and its d-spacing is a*sqrt(3)/2, NOT a.
        d_prism = a * np.sqrt(3) / 2
        i = np.argmin(np.abs(sines - lam / (2 * d_prism)))
        assert np.isclose(sines[i], lam / (2 * d_prism), rtol=1e-4)
        assert abs(refl.normals[i, 2]) < 1e-6

    def test_hcp_pattern_622_invariance(self):
        """Rendered hcp patterns are invariant under the 622 point group —
        pins both the reflector-table closure (the |h+k| box filter) and
        the renderer."""
        from latice_tpu.crystal import quat_mul
        from latice_tpu.sim import hexagonal_reflectors
        import jax.numpy as jnp

        refl = hexagonal_reflectors(max_hkl=2, min_d=1.0)
        geom = DetectorGeometry(shape=(64, 64))
        rng = np.random.default_rng(2)
        q = rng.normal(size=(1, 4)).astype(np.float32)
        q /= np.linalg.norm(q)
        base = simulate_patterns(q, geom, refl)
        for g in np.asarray(ROTATION_GROUPS["622"], np.float32)[[1, 5, 8]]:
            qg = np.asarray(quat_mul(jnp.asarray(q), jnp.asarray(g[None])))
            out = simulate_patterns(qg, geom, refl)
            np.testing.assert_allclose(out, base, atol=2e-4)

    def test_degenerate_cell_rejected(self):
        from latice_tpu.sim import reflectors_from_cell

        with pytest.raises(ValueError, match="degenerate cell"):
            reflectors_from_cell(3.0, alpha=10.0, beta=170.0)


class TestGeometry:
    def test_pattern_center_points_forward(self):
        g = DetectorGeometry(shape=(128, 128), pcx=0.5, pcy=0.5, dd=0.7)
        d = pixel_directions(g)
        assert d.shape == (128, 128, 3)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
        # The pixel at the pattern center looks straight at the sample.
        np.testing.assert_allclose(d[63:65, 63:65] @ [0, 0, 1], 1.0, atol=1e-4)
        # y grows upward: top rows have positive y.
        assert d[0, 64, 1] > 0 > d[-1, 64, 1]

    def test_validation(self):
        with pytest.raises(ValueError, match="dd"):
            DetectorGeometry(dd=0)

    def test_tilt_equals_inverse_orientation_rotation(self):
        """Tilting the detector by t about x is exactly pre-rotating the
        orientation by R_x(-t): sin α = (R_x(t) d)·(R(q) n) = d·(R_x(-t)R(q) n)."""
        from latice_tpu.crystal import from_axis_angle, quat_mul
        import jax.numpy as jnp

        refl = cubic_reflectors("fcc", max_hkl=2, min_d=1.0)
        rng = np.random.default_rng(4)
        q = rng.normal(size=(1, 4)).astype(np.float32)
        q /= np.linalg.norm(q)
        tilt = 10.0
        tilted = simulate_patterns(
            q, DetectorGeometry(shape=(64, 64), tilt=tilt), refl
        )
        qx = np.asarray(
            from_axis_angle(jnp.asarray([1.0, 0.0, 0.0]),
                            jnp.asarray(np.radians(-tilt)))
        ).astype(np.float32)
        q_eq = np.asarray(quat_mul(jnp.asarray(qx[None]), jnp.asarray(q)))
        flat = simulate_patterns(q_eq, DetectorGeometry(shape=(64, 64)), refl)
        np.testing.assert_allclose(tilted, flat, atol=2e-4)


class TestRenderer:
    @pytest.fixture(scope="class")
    def refl(self):
        return cubic_reflectors("fcc", max_hkl=2, min_d=1.0)

    @pytest.fixture(scope="class")
    def geom(self):
        return DetectorGeometry(shape=(64, 64))

    def test_cubic_symmetry_invariance(self, refl, geom):
        """Rotating the crystal by a point-group operator leaves the
        pattern unchanged — the reflector table is group-closed."""
        from latice_tpu.crystal import quat_mul
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        q = rng.normal(size=(1, 4)).astype(np.float32)
        q /= np.linalg.norm(q)
        base = simulate_patterns(q, geom, refl)
        for g in np.asarray(ROTATION_GROUPS["432"], np.float32)[[3, 9, 17]]:
            qg = np.asarray(quat_mul(jnp.asarray(q), jnp.asarray(g[None])))
            out = simulate_patterns(qg, geom, refl)
            np.testing.assert_allclose(out, base, atol=2e-4)

    def test_orientation_sensitivity_is_monotone(self, refl, geom):
        from scipy.spatial.transform import Rotation as R

        base = R.identity()
        quats = []
        for deg in (0.0, 1.0, 10.0):
            r = base * R.from_rotvec(np.radians([deg, 0, 0]))
            quats.append(np.roll(r.as_quat(), 1))
        pats = simulate_patterns(np.asarray(quats, np.float32), geom, refl)
        d1 = np.mean((pats[1] - pats[0]) ** 2)
        d10 = np.mean((pats[2] - pats[0]) ** 2)
        assert 0 < d1 < d10

    def test_chunking_matches_oneshot(self, refl, geom):
        # 13 orientations at chunk=2 exceeds the bounded in-flight window,
        # exercising the drain-while-enqueueing path.
        rng = np.random.default_rng(1)
        q = rng.normal(size=(13, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        a = simulate_patterns(q, geom, refl, chunk=2)
        b = simulate_patterns(q, geom, refl, chunk=16)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_euler_input_matches_quats(self, refl, geom):
        from scipy.spatial.transform import Rotation as R

        eulers = np.asarray([[10.0, 40.0, 20.0], [100.0, 80.0, 5.0]])
        quats = np.roll(R.from_euler("zxz", eulers, degrees=True).as_quat(), 1, axis=1)
        a = simulate_patterns(eulers, geom, refl)
        b = simulate_patterns(quats.astype(np.float32), geom, refl)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_output_contract(self, refl, geom):
        pats = simulate_patterns(np.asarray([[1.0, 0, 0, 0]]), geom, refl)
        assert pats.shape == (1, 64, 64) and pats.dtype == np.float32
        assert pats.min() == pytest.approx(0.0, abs=1e-6)
        assert pats.max() == pytest.approx(1.0, abs=1e-5)
        # Bands exist: a meaningful fraction of pixels is bright.
        assert 0.02 < (pats > 0.5).mean() < 0.98

    def test_uint8_output_quantizes_float_path(self, refl, geom):
        q = np.asarray([[1.0, 0, 0, 0], [0.5, 0.5, 0.5, 0.5]], np.float32)
        f = simulate_patterns(q, geom, refl)
        u = simulate_patterns(q, geom, refl, dtype=np.uint8)
        assert u.dtype == np.uint8
        np.testing.assert_allclose(u / 255.0, f, atol=1.0 / 255.0)
        with pytest.raises(ValueError, match="dtype"):
            simulate_patterns(q, geom, refl, dtype=np.float64)

    def test_bad_orientations(self, refl, geom):
        with pytest.raises(ValueError, match="expected"):
            simulate_patterns(np.zeros((2, 5)), geom, refl)
