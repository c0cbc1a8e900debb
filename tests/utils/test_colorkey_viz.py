"""Color key parity against the reference algorithm, and viz smoke tests."""

from math import acos, atan2, sqrt

import numpy as np
import pytest

from latice_tpu.utils import ColorKeyGenerator, figure_to_array, get_color_key, plot_detection
from latice_tpu.crystal.symmetry import PI_OVER_180, K_180_OVER_PI, SQRT3_INV

RNG = np.random.default_rng(0)


def reference_ipf_color(zone_axis, sym_matrices):
    """The reference's scalar algorithm (latice/utils/colorkey.py:64-130),
    re-expressed here as the ground truth for the vectorized rebuild."""
    zone_axis = np.asarray(zone_axis) / np.linalg.norm(zone_axis)
    eq = np.matmul(sym_matrices, np.tile(zone_axis, [24, 1])[:, :, np.newaxis]).squeeze()
    eq = np.concatenate([eq, -eq], axis=0)
    chi = eta = 0.0
    for za in eq:
        if za[2] < 0:
            za = -za
        chi = acos(np.clip(za[2], -1, 1))
        eta = atan2(za[1], za[0])
        if 0 <= eta <= 45 * PI_OVER_180 and 0 <= chi <= acos(SQRT3_INV):
            break
    chi_max = acos(SQRT3_INV) * K_180_OVER_PI
    eta_deg, chi_deg = eta * K_180_OVER_PI, chi * K_180_OVER_PI
    rgb = [1 - chi_deg / chi_max, 0, abs(eta_deg) / 45]
    rgb[1] = (1 - rgb[2]) * (chi_deg / chi_max)
    rgb[2] *= chi_deg / chi_max
    rgb = [sqrt(v) for v in rgb]
    m = max(rgb)
    return [int(round(255 * v / m)) for v in rgb]


class TestColorKeyParity:
    def test_matches_reference_scalar_algorithm(self):
        from scipy.spatial.transform import Rotation as R
        from latice_tpu.crystal import CUBIC_SYMMETRY

        sym_matrices = R.from_quat(np.asarray(CUBIC_SYMMETRY)).as_matrix()
        gen = ColorKeyGenerator()
        axes = RNG.normal(size=(50, 3))
        for axis in axes:
            want = reference_ipf_color(axis, sym_matrices)
            got = gen.generate_ipf_color(axis)
            assert got == want, (axis, got, want)

    def test_known_directions(self):
        gen = ColorKeyGenerator()
        # [001] pole: chi=0 -> pure red after normalization.
        assert gen.generate_ipf_color([0.0, 0.0, 1.0]) == [255, 0, 0]
        # [101] and [111] produce green-ish / blue-ish corners.
        c101 = gen.generate_ipf_color([1.0, 0.0, 1.0])
        c111 = gen.generate_ipf_color([1.0, 1.0, 1.0])
        assert c101[1] == 255  # green corner
        assert c111[2] == 255  # blue corner

    def test_drgb_packing(self):
        assert ColorKeyGenerator.drgb(255, 255, 0, 0) == 0xFFFF0000
        assert ColorKeyGenerator.drgb(0, [1, 2, 3]) == 0x00010203

    def test_in_unit_triangle(self):
        assert ColorKeyGenerator.in_unit_triangle(0.1, 0.5)
        assert not ColorKeyGenerator.in_unit_triangle(-0.1, 0.5)
        assert not ColorKeyGenerator.in_unit_triangle(0.1, 1.2)


class TestGetColorKey:
    def test_shapes_and_hex(self):
        angles = RNG.uniform(0, 360, size=(7, 3))
        rgb = get_color_key(angles, mode="ipf_z")
        assert rgb.shape == (7, 3)
        assert rgb.min() >= 0 and rgb.max() <= 255
        hexes = get_color_key(angles, mode="ipf_x", hex_string=True)
        assert len(hexes) == 7 and all(h.startswith("#") for h in hexes)

    def test_single_angle(self):
        rgb = get_color_key(np.array([30.0, 45.0, 60.0]))
        assert rgb.shape == (1, 3)


class TestVizSmoke:
    def test_plot_detection_and_rasterize(self):
        imgs = RNG.uniform(size=(6, 32, 32, 1)).astype(np.float32)
        recon = RNG.normal(size=(6, 32, 32, 1)).astype(np.float32)
        fig = plot_detection(imgs, recon, num_samples=4)
        arr = figure_to_array(fig)
        assert arr.ndim == 3 and arr.shape[-1] == 4  # RGBA


class TestPlotLatent:
    def test_matplotlib_fallback(self, tmp_path):
        """plot_latent renders via matplotlib when altair is absent."""
        from latice_tpu.utils import plot_latent

        class FakeDataset:
            rot_angles = RNG.uniform(0, 360, size=(20, 3))

        latent = RNG.normal(size=(20, 2))
        chart = plot_latent(FakeDataset(), latent, color="ipf_z")
        assert chart is not None
        # matplotlib Figure or altair Chart both acceptable
        kind = type(chart).__module__
        assert kind.startswith("matplotlib") or kind.startswith("altair")


class TestGeneralizedIPF:
    """Non-cubic IPF sectors (multi-phase maps; beyond the cubic-only
    reference)."""

    def test_z_pole_red_for_every_group(self):
        from latice_tpu.utils.colorkey import IPF_SECTORS, ColorKeyGenerator

        for group in IPF_SECTORS:
            rgb = ColorKeyGenerator(group).generate_ipf_color([0.0, 0.0, 1.0])
            assert rgb == [255, 0, 0], group

    def test_hexagonal_invariance_cubic_sensitivity(self):
        """A pole and its 60-deg-about-z image share a color under '622' but
        not under '432' (60 deg about z is not a cubic operator)."""
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.utils.colorkey import ColorKeyGenerator

        pole = np.array([0.3, 0.1, 0.95])
        pole /= np.linalg.norm(pole)
        rot60 = R.from_euler("z", 60, degrees=True).as_matrix() @ pole

        hexkey = ColorKeyGenerator("622")
        np.testing.assert_array_equal(
            hexkey.generate_ipf_color(pole), hexkey.generate_ipf_color(rot60)
        )
        cubkey = ColorKeyGenerator("432")
        assert cubkey.generate_ipf_color(pole) != cubkey.generate_ipf_color(rot60)

    def test_group_invariance_all_ops(self):
        """Colors are invariant under every operator of the chosen group."""
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.crystal import ROTATION_GROUPS
        from latice_tpu.utils.colorkey import ColorKeyGenerator

        poles = RNG.normal(size=(5, 3))
        poles /= np.linalg.norm(poles, axis=1, keepdims=True)
        for group in ("222", "32", "422", "622", "23"):
            key = ColorKeyGenerator(group)
            base = key.generate_ipf_colors(poles)
            wxyz = np.asarray(ROTATION_GROUPS[group])
            mats = R.from_quat(
                np.concatenate([wxyz[:, 1:], wxyz[:, :1]], axis=1)
            ).as_matrix()
            for m in mats:
                np.testing.assert_array_equal(
                    key.generate_ipf_colors(poles @ m.T), base, err_msg=group
                )

    def test_m3_sector_image_is_unique(self):
        """The '23' (m-3) sector must tile the sphere exactly: every orbit
        has exactly one in-sector image, so colors cannot depend on symmetry
        iteration order (ADVICE r2: the plain eta/chi box over-covered)."""
        from latice_tpu.crystal.symmetry import apply_symmetry_to_axes
        from latice_tpu.utils.colorkey import ColorKeyGenerator

        key = ColorKeyGenerator("23")
        poles = RNG.normal(size=(500, 3))
        poles /= np.linalg.norm(poles, axis=1, keepdims=True)
        sym = apply_symmetry_to_axes(poles, "23")
        cands = np.concatenate([sym, -sym], axis=1)
        x, y, z = cands[..., 0], cands[..., 1], cands[..., 2]
        tol = 1e-9
        inside = (
            (z >= np.maximum(np.abs(x), np.abs(y)) - tol)
            & (x >= -tol)
            & (y >= -tol)
        )
        counts = inside.sum(axis=1)
        # 2 on sector boundaries (measure zero for random poles), else 1.
        assert counts.min() >= 1
        assert (counts == 1).mean() > 0.99

    def test_inversion_invariance(self):
        from latice_tpu.utils.colorkey import ColorKeyGenerator

        poles = RNG.normal(size=(4, 3))
        key = ColorKeyGenerator("1")  # triclinic: only inversion available
        np.testing.assert_array_equal(
            key.generate_ipf_colors(poles), key.generate_ipf_colors(-poles)
        )

    def test_unknown_group_raises(self):
        from latice_tpu.utils.colorkey import ColorKeyGenerator

        with pytest.raises(ValueError, match="unknown point group"):
            ColorKeyGenerator("5-fold")

    def test_get_color_key_group_passthrough(self):
        from latice_tpu.utils import get_color_key

        angles = RNG.uniform(0, 360, size=(6, 3))
        cubic = get_color_key(angles, "ipf_z")
        hexa = get_color_key(angles, "ipf_z", group="622")
        assert cubic.shape == hexa.shape == (6, 3)
        assert not np.array_equal(cubic, hexa)
