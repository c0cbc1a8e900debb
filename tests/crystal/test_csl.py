"""CSL boundary classification: table exactness, Brandon zones, map labels."""

import numpy as np
import pytest

from latice_tpu.crystal import (
    CSL_CUBIC,
    brandon_tolerance_deg,
    classify_csl_boundaries,
    csl_axis_angle,
    csl_fractions,
    csl_orbit,
    csl_rotation,
    from_axis_angle,
    quat_mul,
    sigma_value,
    to_euler_zxz_deg,
)
from latice_tpu.crystal.csl import NOT_BOUNDARY, RANDOM_BOUNDARY


class TestTable:
    def test_sigma_values_match_keys(self):
        """Σ = odd part of the integer quaternion norm — for every entry."""
        for name in CSL_CUBIC:
            expected = int(name.rstrip("ab"))
            assert sigma_value(name) == expected, name

    @pytest.mark.parametrize(
        "name,axis,angle",
        [
            ("3", (1, 1, 1), 60.0),
            ("5", (1, 0, 0), 36.86989765),
            ("7", (1, 1, 1), 38.21321070),
            ("9", (1, 1, 0), 38.94244127),
            ("11", (1, 1, 0), 50.47880364),
            ("13a", (1, 0, 0), 22.61986495),
            ("15", (2, 1, 0), 48.18968510),
            ("17b", (2, 2, 1), 61.92751306),
            ("25a", (1, 0, 0), 16.26020471),
            ("29b", (2, 2, 1), 46.39718103),
        ],
    )
    def test_published_axis_angle(self, name, axis, angle):
        """The integer quaternions reproduce the published Σ (axis, angle)."""
        got_axis, got_angle = csl_axis_angle(name)
        assert tuple(got_axis) == axis
        assert got_angle == pytest.approx(angle, abs=1e-6)

    def test_rotations_unit_norm(self):
        for name in CSL_CUBIC:
            assert np.linalg.norm(csl_rotation(name)) == pytest.approx(1.0)

    def test_brandon_tolerance(self):
        assert brandon_tolerance_deg("3") == pytest.approx(15 / np.sqrt(3))
        assert brandon_tolerance_deg("27a") == pytest.approx(15 / np.sqrt(27))


class TestOrbit:
    def test_identity_orbit_is_the_group(self):
        orbit = csl_orbit(np.array([1.0, 0, 0, 0]))
        # Two-sided orbit of identity = the 24 cubic rotations (closure);
        # sign-ambiguous 180° entries may keep both representatives.
        assert 24 <= len(orbit) <= 48
        np.testing.assert_allclose(np.linalg.norm(orbit, axis=-1), 1.0, atol=1e-12)

    def test_exact_csl_has_zero_deviation(self):
        q3 = csl_rotation("3")
        orbit = csl_orbit(q3)
        dot = np.abs(orbit @ q3).max()
        assert 2 * np.degrees(np.arccos(min(dot, 1.0))) == pytest.approx(0.0, abs=1e-5)


def _bicrystal(delta_q, h=6, w=8):
    """(h, w, 3) Euler map: left half A, right half A ⊗ delta (crystal frame)."""
    qa = from_axis_angle(
        np.asarray([0.26726124, 0.53452248, 0.80178373]), np.deg2rad(17.0)
    )
    qb = quat_mul(qa, delta_q)
    ea = np.asarray(to_euler_zxz_deg(qa))
    eb = np.asarray(to_euler_zxz_deg(qb))
    grid = np.empty((h, w, 3), np.float32)
    grid[:, : w // 2] = ea
    grid[:, w // 2 :] = eb
    return grid


class TestClassify:
    def test_sigma3_bicrystal(self):
        grid = _bicrystal(csl_rotation("3"))
        maps = classify_csl_boundaries(grid)
        i3 = maps.sigmas.index("3")
        # The vertical boundary column is Σ3 on every row.
        assert (maps.east[:, 3] == i3).all()
        # Grain interiors are not boundaries.
        assert (maps.east[:, :3] == NOT_BOUNDARY).all()
        assert (maps.east[:, 4:] == NOT_BOUNDARY).all()
        assert (maps.south == NOT_BOUNDARY).all()
        fr = csl_fractions(maps)
        assert fr["3"] == pytest.approx(1.0)
        assert fr["random"] == 0.0

    def test_brandon_zone_edges(self):
        """6° off Σ3 is still Σ3 (tol 8.66°); 10° off is random."""
        tilt_axis = np.asarray([1.0, 0.0, 0.0])
        for off, expect_sigma3 in ((6.0, True), (10.0, False)):
            delta = quat_mul(
                csl_rotation("3"),
                from_axis_angle(tilt_axis, np.deg2rad(off)),
            )
            grid = _bicrystal(np.asarray(delta))
            maps = classify_csl_boundaries(grid, sigmas=("3",))
            col = maps.east[:, 3]
            if expect_sigma3:
                assert (col == maps.sigmas.index("3")).all()
            else:
                assert (col == RANDOM_BOUNDARY).all()

    def test_lowest_sigma_wins(self):
        grid = _bicrystal(csl_rotation("3"))
        maps = classify_csl_boundaries(grid, sigmas=("27a", "3"))
        # sigmas are re-sorted ascending; Σ3 must win on an exact Σ3 boundary.
        assert maps.sigmas == ("3", "27a")
        assert (maps.east[:, 3] == 0).all()

    def test_low_angle_edges_are_interior(self):
        delta = from_axis_angle(np.asarray([0.0, 0.0, 1.0]), np.deg2rad(2.0))
        grid = _bicrystal(np.asarray(delta))
        maps = classify_csl_boundaries(grid)
        assert (maps.east == NOT_BOUNDARY).all()

    def test_symmetry_image_of_csl_still_matches(self):
        """Δ composed with symmetry operators on both sides is the same
        boundary — the orbit handles it."""
        from latice_tpu.crystal import symmetry_quats

        sym = np.asarray(symmetry_quats("432"), np.float64)
        delta = quat_mul(np.asarray(sym[7]), quat_mul(csl_rotation("3"), np.asarray(sym[13])))
        grid = _bicrystal(np.asarray(delta))
        maps = classify_csl_boundaries(grid, sigmas=("3",))
        assert (maps.east[:, 3] == 0).all()

    def test_errors(self):
        grid = np.zeros((4, 4, 3), np.float32)
        with pytest.raises(ValueError, match="cubic"):
            classify_csl_boundaries(grid, group="622")
        with pytest.raises(ValueError, match="unknown"):
            classify_csl_boundaries(grid, sigmas=("42",))
        with pytest.raises(ValueError, match="2x2"):
            classify_csl_boundaries(np.zeros((1, 4, 3), np.float32))
        with pytest.raises(ValueError, match="Euler grid"):
            classify_csl_boundaries(np.zeros((4, 4), np.float32))

    def test_fractions_mixed_map(self):
        """Two boundary columns: one Σ3, one generic high-angle — fractions
        split accordingly and sum to 1 with 'random'."""
        qa = from_axis_angle(np.asarray([0.0, 0.0, 1.0]), np.float64(0.3))
        qb = quat_mul(qa, csl_rotation("3"))
        # 47.5° about a deliberately unspecial axis: not near any Σ≤29 zone.
        generic = from_axis_angle(
            np.asarray([0.90453403, 0.30151134, 0.30151134]), np.deg2rad(47.5)
        )
        qc = quat_mul(qb, generic)
        grid = np.empty((4, 6, 3), np.float32)
        grid[:, :2] = np.asarray(to_euler_zxz_deg(qa))
        grid[:, 2:4] = np.asarray(to_euler_zxz_deg(qb))
        grid[:, 4:] = np.asarray(to_euler_zxz_deg(qc))
        maps = classify_csl_boundaries(grid, sigmas=("3", "9"))
        fr = csl_fractions(maps)
        assert fr["3"] == pytest.approx(0.5)
        assert fr["9"] == 0.0
        assert fr["random"] == pytest.approx(0.5)
        assert sum(fr.values()) == pytest.approx(1.0)
