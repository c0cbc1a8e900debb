"""ODF kernel density: normalization, symmetry, sections, texture index."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.crystal import (
    evaluate_odf,
    halfwidth_to_kappa,
    make_odf,
    odf_sections,
    texture_index,
)
from latice_tpu.crystal.odf import _kernel_norm


def _uniform_eulers(n, seed=0):
    return R.random(n, random_state=seed).as_euler("zxz", degrees=True)


class TestKernel:
    def test_halfwidth_to_kappa(self):
        # At the half-width, cos^{2κ}(ω/2) = 1/2 by construction.
        for hw in (5.0, 10.0, 25.0):
            kappa = halfwidth_to_kappa(hw)
            val = np.cos(np.radians(hw) / 2) ** (2 * kappa)
            assert val == pytest.approx(0.5, rel=1e-12)
        # MTEX's default 10 deg half-width is kappa ~ 90.6.
        assert halfwidth_to_kappa(10.0) == pytest.approx(90.99, abs=0.5)
        with pytest.raises(ValueError, match="halfwidth"):
            halfwidth_to_kappa(0.0)

    def test_normalization_constant(self):
        # C(0) = 1 (flat kernel); numerically verify ∫ K dg = 1 for κ=50:
        # Haar angle density (2/π) sin²(ω/2) on [0, π].
        assert _kernel_norm(0.0) == pytest.approx(1.0)
        kappa = 50.0
        w = np.linspace(0, np.pi, 200001)
        k = np.cos(w / 2) ** (2 * kappa) * (2 / np.pi) * np.sin(w / 2) ** 2
        integral = _kernel_norm(kappa) * np.trapezoid(k, w)
        assert integral == pytest.approx(1.0, rel=1e-6)


class TestOdf:
    def test_uniform_texture_is_one(self):
        odf = make_odf(_uniform_eulers(5000), halfwidth_deg=20.0)
        pts = _uniform_eulers(64, seed=1)
        vals = evaluate_odf(odf, pts)
        assert vals.shape == (64,)
        assert vals.mean() == pytest.approx(1.0, abs=0.1)
        assert vals.std() < 0.25

    def test_single_crystal_peaks_at_the_orientation(self):
        center = np.asarray([30.0, 40.0, 20.0])
        odf = make_odf(np.tile(center, (32, 1)), halfwidth_deg=10.0)
        at_peak = evaluate_odf(odf, center)
        far = evaluate_odf(odf, np.asarray([75.0, 80.0, 5.0]))
        assert at_peak > 20.0  # C(κ)/24 ~ 65 for κ~91
        assert at_peak > 100 * max(far, 1e-6)

    def test_symmetry_images_evaluate_equal(self):
        """f at an orientation equals f at its symmetry equivalents."""
        from latice_tpu.crystal import CUBIC_SYMMETRY

        rng_eulers = _uniform_eulers(300, seed=2)
        odf = make_odf(rng_eulers, halfwidth_deg=15.0)
        g = R.from_euler("zxz", [25.0, 35.0, 45.0], degrees=True)
        base = evaluate_odf(odf, np.asarray(g.as_euler("zxz", degrees=True)))
        for k in (3, 9, 21):
            sym = R.from_quat(np.roll(CUBIC_SYMMETRY[k], -1))
            img = (sym * g).as_euler("zxz", degrees=True)
            assert evaluate_odf(odf, np.asarray(img)) == pytest.approx(
                float(base), rel=1e-3
            )

    def test_weights_shift_the_density(self):
        a = np.asarray([10.0, 20.0, 30.0])
        b = np.asarray([80.0, 70.0, 60.0])
        euler = np.stack([a, b])
        odf_even = make_odf(euler, halfwidth_deg=15.0)
        odf_a = make_odf(euler, halfwidth_deg=15.0, weights=[0.9, 0.1])
        assert evaluate_odf(odf_a, a) > evaluate_odf(odf_even, a)
        assert evaluate_odf(odf_a, b) < evaluate_odf(odf_even, b)

    def test_texture_index_orders_textures(self):
        uniform = make_odf(_uniform_eulers(2000), halfwidth_deg=20.0)
        single = make_odf(np.tile([30.0, 40.0, 20.0], (64, 1)), halfwidth_deg=20.0)
        j_uniform = texture_index(uniform, n=4096)
        j_single = texture_index(single, n=4096)
        assert j_uniform == pytest.approx(1.0, abs=0.2)
        # Analytic J for a symmetrized single crystal: C(κ)²/(24·C(2κ)) ≈ 3.2
        # at 20° half-width.
        assert j_single == pytest.approx(3.2, abs=0.7)
        assert j_single > 2 * j_uniform

    def test_sections_shape_and_peak_location(self):
        """A crystal at φ2=45° shows up in the 45° section, not the 0° one."""
        center = np.asarray([20.0, 30.0, 45.0])
        odf = make_odf(np.tile(center, (16, 1)), halfwidth_deg=10.0)
        sections, phi1, phi = odf_sections(
            odf, phi2_deg=(0.0, 45.0), resolution_deg=5.0
        )
        assert sections.shape == (2, len(phi), len(phi1))
        assert sections[1].max() > 10 * sections[0].max()
        # Peak lands at (phi1=20, Phi=30) in the 45° section.
        iy, ix = np.unravel_index(np.argmax(sections[1]), sections[1].shape)
        assert phi1[ix] == pytest.approx(20.0, abs=5.0)
        assert phi[iy] == pytest.approx(30.0, abs=5.0)

    def test_validation(self):
        with pytest.raises(ValueError, match="no orientations"):
            make_odf(np.zeros((0, 3)))
        with pytest.raises(ValueError, match="weights"):
            make_odf(np.zeros((3, 3)), weights=[1.0])
        with pytest.raises(ValueError, match="weights"):
            make_odf(np.zeros((2, 3)), weights=[-1.0, 2.0])
