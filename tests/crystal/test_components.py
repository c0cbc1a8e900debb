"""Texture components: orbit symmetry, assignment, fractions."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.crystal import (
    TEXTURE_COMPONENTS,
    component_orbit,
    texture_component_fractions,
)


class TestOrbit:
    def test_orthorhombic_orbit_contains_sample_flips(self):
        """Brass and its RD-mirror are one component under orthorhombic
        sample symmetry: the mirrored Euler triple deviates by 0."""
        orbit = component_orbit(TEXTURE_COMPONENTS["brass"])
        mirrored = R.from_euler("zxz", [-35.2644, 45.0, 0.0], degrees=True)
        qm = np.roll(mirrored.as_quat(), 1)  # xyzw -> wxyz
        dev = 2 * np.degrees(np.arccos(np.abs(orbit @ qm).max()))
        assert dev == pytest.approx(0.0, abs=1e-4)

    def test_triclinic_orbit_does_not(self):
        orbit = component_orbit(
            TEXTURE_COMPONENTS["brass"], sample_symmetry="triclinic"
        )
        mirrored = R.from_euler("zxz", [-35.2644, 45.0, 0.0], degrees=True)
        qm = np.roll(mirrored.as_quat(), 1)
        dev = 2 * np.degrees(np.arccos(np.abs(orbit @ qm).max().clip(max=1)))
        assert dev > 5.0

    def test_unknown_sample_symmetry(self):
        with pytest.raises(ValueError, match="sample symmetry"):
            component_orbit((0, 0, 0), sample_symmetry="hexagonal")


class TestFractions:
    def test_pure_components_assign_exactly(self):
        """Each ideal orientation lands on its own component at ~0 deviation."""
        names = ("cube", "goss", "brass", "copper", "s")
        euler = np.asarray([TEXTURE_COMPONENTS[n] for n in names], np.float32)
        res = texture_component_fractions(euler, components=names)
        assert res.names == names
        np.testing.assert_array_equal(res.labels, np.arange(5))
        assert res.deviation_deg.max() < 0.1  # f32 arccos precision near dot=1
        for n in names:
            assert res.fractions[n] == pytest.approx(0.2)
        assert res.fractions["other"] == 0.0

    def test_noise_and_tolerance(self):
        """5° off cube is cube at 15° tolerance, 'other' at 3° tolerance."""
        q = R.from_euler("zxz", [0, 0, 0], degrees=True) * R.from_rotvec(
            np.deg2rad(5.0) * np.asarray([0, 1, 0])
        )
        euler = np.asarray(q.as_euler("zxz", degrees=True), np.float32)[None]
        res15 = texture_component_fractions(euler, components=("cube",))
        assert res15.labels[0] == 0
        assert res15.deviation_deg[0] == pytest.approx(5.0, abs=0.05)
        res3 = texture_component_fractions(
            euler, components=("cube",), tolerance_deg=3.0
        )
        assert res3.labels[0] == -1
        assert res3.fractions["other"] == 1.0

    def test_closest_wins_not_first(self):
        """An orientation near Goss but inside two tolerances gets Goss even
        when Cube is listed first."""
        near_goss = np.asarray([[0.0, 41.0, 0.0]], np.float32)  # 4° from Goss
        res = texture_component_fractions(
            near_goss, components=("cube", "goss"), tolerance_deg=60.0
        )
        assert res.names[res.labels[0]] == "goss"

    def test_map_shape_and_custom_components(self):
        rng = np.random.default_rng(0)
        euler = np.tile([10.0, 20.0, 30.0], (4, 5, 1)).astype(np.float32)
        euler += rng.normal(scale=0.5, size=euler.shape).astype(np.float32)
        res = texture_component_fractions(
            euler, components={"mine": (10.0, 20.0, 30.0)}
        )
        assert res.labels.shape == (4, 5)
        assert res.fractions["mine"] == 1.0

    def test_validation(self):
        with pytest.raises(ValueError, match="unknown components"):
            texture_component_fractions(np.zeros((1, 3)), components=("nope",))
        with pytest.raises(ValueError, match="no components"):
            texture_component_fractions(np.zeros((1, 3)), components={})
        with pytest.raises(ValueError, match="Euler"):
            texture_component_fractions(np.zeros((3, 4)))

    def test_symmetry_images_assign_to_same_component(self):
        """Crystal-symmetry images of Copper all classify as Copper."""
        from latice_tpu.crystal import CUBIC_SYMMETRY

        base = R.from_euler(
            "zxz", TEXTURE_COMPONENTS["copper"], degrees=True
        )
        sym = R.from_quat(np.roll(np.asarray(CUBIC_SYMMETRY), -1, axis=1))
        euler = (sym * base).as_euler("zxz", degrees=True).astype(np.float32)
        res = texture_component_fractions(euler, components=("cube", "copper"))
        assert (res.labels == 1).all()
        assert res.deviation_deg.max() < 0.1  # f32 arccos precision near dot=1
