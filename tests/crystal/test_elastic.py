"""Elastic anisotropy: cubic closed form, invariances, VRH averages."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.crystal import (
    CUBIC_STIFFNESS,
    cubic_stiffness,
    directional_youngs_modulus,
    polycrystal_moduli,
)


def _cubic_closed_form(c11, c12, c44, d):
    """1/E(d) = S11 - 2(S11 - S12 - S44/2)(d1²d2² + d2²d3² + d3²d1²)."""
    s = np.linalg.inv(cubic_stiffness(c11, c12, c44))
    d = np.asarray(d, float)
    d = d / np.linalg.norm(d)
    j = d[0] ** 2 * d[1] ** 2 + d[1] ** 2 * d[2] ** 2 + d[2] ** 2 * d[0] ** 2
    return 1.0 / (s[0, 0] - 2.0 * (s[0, 0] - s[0, 1] - s[3, 3] / 2.0) * j)


class TestDirectionalYoungs:
    def test_cubic_closed_form_cu(self):
        """At identity orientation the tensor contraction reproduces the
        textbook cubic formula for every load direction."""
        c = CUBIC_STIFFNESS["cu"]
        euler = np.zeros((1, 3))
        for d in [(1, 0, 0), (1, 1, 1), (1, 1, 0), (1, 2, 3)]:
            got = directional_youngs_modulus(euler, d, "cu")[0]
            assert got == pytest.approx(_cubic_closed_form(*c, d), rel=1e-6)

    def test_literature_anchors_cu(self):
        """Cu: E<100> ≈ 66.7, E<111> ≈ 191 GPa (classic anisotropy pair)."""
        euler = np.zeros((1, 3))
        e100 = directional_youngs_modulus(euler, (1, 0, 0), "cu")[0]
        e111 = directional_youngs_modulus(euler, (1, 1, 1), "cu")[0]
        assert e100 == pytest.approx(66.7, rel=0.02)
        assert e111 == pytest.approx(191.0, rel=0.02)
        assert e111 > e100  # positive Zener anisotropy

    def test_tungsten_isotropic(self):
        """W (Zener A ≈ 1.01): the modulus barely depends on orientation."""
        rng = np.random.default_rng(0)
        euler = R.random(64, random_state=rng).as_euler("zxz", degrees=True)
        e = directional_youngs_modulus(euler, (0, 0, 1), "w")
        assert np.ptp(e) < 0.02 * e.mean()

    def test_sample_rotation_invariance(self):
        """Rotating the sample frame (orientations g -> g R⁻¹, load d -> R d)
        leaves the modulus unchanged — pins the g: sample->crystal frame."""
        rng = np.random.default_rng(1)
        g = R.random(16, random_state=rng)
        rot = R.random(random_state=rng)
        d = np.asarray([0.3, -0.5, 0.8])
        e0 = directional_youngs_modulus(
            g.as_euler("zxz", degrees=True), d, "ni"
        )
        e1 = directional_youngs_modulus(
            (g * rot.inv()).as_euler("zxz", degrees=True), rot.apply(d), "ni"
        )
        np.testing.assert_allclose(e1, e0, rtol=1e-4)

    def test_bounded_by_extremes(self):
        rng = np.random.default_rng(2)
        euler = R.random(200, random_state=rng).as_euler("zxz", degrees=True)
        e = directional_youngs_modulus(euler, (0, 0, 1), "cu")
        assert e.min() > 66.0 and e.max() < 192.0

    def test_grid_shape_passthrough(self):
        euler = np.zeros((4, 5, 3))
        e = directional_youngs_modulus(euler, (0, 0, 1), (100.0, 50.0, 30.0))
        assert e.shape == (4, 5)
        assert np.allclose(e, e[0, 0])

    def test_errors(self):
        with pytest.raises(ValueError, match="unknown material"):
            directional_youngs_modulus(np.zeros((1, 3)), stiffness="kryptonite")
        with pytest.raises(ValueError, match="Voigt"):
            directional_youngs_modulus(np.zeros((1, 3)), stiffness=np.zeros((4, 4)))
        with pytest.raises(ValueError, match="nonzero"):
            directional_youngs_modulus(np.zeros((1, 3)), load_direction=(0, 0, 0))
        with pytest.raises(ValueError, match="symmetric"):
            m = cubic_stiffness(*CUBIC_STIFFNESS["cu"])
            m[0, 1] += 1.0
            directional_youngs_modulus(np.zeros((1, 3)), stiffness=m)


class TestPolycrystalModuli:
    def test_cubic_bulk_bounds_coincide(self):
        """For cubic crystals K_V = K_R = (C11 + 2 C12)/3 exactly."""
        pm = polycrystal_moduli("cu")
        c11, c12, _ = CUBIC_STIFFNESS["cu"]
        k = (c11 + 2 * c12) / 3.0
        assert pm.bulk_voigt == pytest.approx(k, rel=1e-9)
        assert pm.bulk_reuss == pytest.approx(k, rel=1e-6)

    def test_shear_bound_ordering(self):
        for name in CUBIC_STIFFNESS:
            pm = polycrystal_moduli(name)
            assert pm.shear_voigt >= pm.shear_reuss - 1e-9, name

    def test_cu_hill_young_literature(self):
        """Polycrystal Cu Young's modulus (Hill) ≈ 127 GPa."""
        pm = polycrystal_moduli("cu")
        assert pm.youngs_hill == pytest.approx(127.0, rel=0.03)
        assert 0.3 < pm.poisson_hill < 0.36

    def test_random_texture_average_near_hill(self):
        """The mean directional modulus over random orientations lands
        between the Reuss and Voigt Young's bounds (and near Hill)."""
        rng = np.random.default_rng(3)
        euler = R.random(2000, random_state=rng).as_euler("zxz", degrees=True)
        e = directional_youngs_modulus(euler, (0, 0, 1), "fe-alpha").mean()
        pm = polycrystal_moduli("fe-alpha")
        assert abs(e - pm.youngs_hill) / pm.youngs_hill < 0.06
