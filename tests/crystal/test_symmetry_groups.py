"""Rotation point groups for multi-phase dictionaries (BASELINE config 5).

The reference ships cubic only (latice/utils/constants.py:13-39); these pin
the analytically-constructed tables for the other crystal systems: correct
group order, uniqueness up to quaternion sign, and closure under the
Hamilton product.
"""

import numpy as np
import pytest

from latice_tpu.crystal import (
    ROTATION_GROUPS,
    nearest_symmetry_equivalent,
    stack_symmetry_tables,
    symmetry_quats,
    symmetry_reduced_misorientation,
)
from latice_tpu.crystal.quaternion import from_euler_zxz_deg, quat_mul

EXPECTED_ORDERS = {
    "1": 1, "2": 2, "222": 4, "3": 3, "32": 6,
    "4": 4, "422": 8, "6": 6, "622": 12, "23": 12, "432": 24,
}


def _canon(q):
    q = np.asarray(q, np.float64)
    return np.where(q[..., :1] < 0, -q, q)


def _qmul_np(a, b):
    w1, x1, y1, z1 = np.moveaxis(a, -1, 0)
    w2, x2, y2, z2 = np.moveaxis(b, -1, 0)
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


class TestGroupTables:
    @pytest.mark.parametrize("name", sorted(ROTATION_GROUPS))
    def test_order_unit_unique_closed(self, name):
        g = np.asarray(ROTATION_GROUPS[name], np.float64)
        assert len(g) == EXPECTED_ORDERS[name]
        np.testing.assert_allclose(np.linalg.norm(g, axis=1), 1.0, atol=1e-12)

        canon = _canon(g)
        assert len({tuple(np.round(r, 8)) for r in canon}) == len(g)

        # Closure: every pairwise product lands back in the table. Compare
        # against both signs — w==0 elements have no canonical sign.
        prod = _qmul_np(g[:, None, :], g[None, :, :]).reshape(-1, 4)
        dist = np.minimum(
            np.abs(prod[:, None, :] - canon[None, :, :]).sum(-1),
            np.abs(prod[:, None, :] + canon[None, :, :]).sum(-1),
        ).min(axis=1)
        assert dist.max() < 1e-9

    def test_identity_present(self):
        """Every group contains identity; the analytic tables lead with it
        (the reference's 432 table orders it fourth — preserved verbatim)."""
        for name, g in ROTATION_GROUPS.items():
            g = np.asarray(g)
            d = np.abs(g - np.array([1.0, 0, 0, 0])).sum(axis=1).min()
            assert d < 1e-12, name
            if name != "432":
                np.testing.assert_allclose(g[0], [1, 0, 0, 0], atol=1e-12)

    def test_symmetry_quats_lookup(self):
        assert symmetry_quats("622").shape == (12, 4)
        with pytest.raises(ValueError, match="unknown point group"):
            symmetry_quats("5")


class TestStackedTables:
    def test_padding_repeats_identity(self):
        stacked = np.asarray(stack_symmetry_tables(["432", "622", "1"]))
        assert stacked.shape == (3, 24, 4)
        # Hexagonal rows 12..23 are identity padding.
        np.testing.assert_allclose(
            stacked[1, 12:], np.tile([[1, 0, 0, 0]], (12, 1)), atol=1e-7
        )
        # Padding must not change symmetry-reduced results: a crystal-frame
        # 60-deg-about-c displacement is 0 under hexagonal symmetry, padded
        # or not (q ⊗ sym — the crystal composition side the default
        # measures).
        q1 = from_euler_zxz_deg(np.array([10.0, 30.0, 20.0]))
        q2 = quat_mul(q1, symmetry_quats("622")[1].astype(q1.dtype))
        d_padded = symmetry_reduced_misorientation(q1, q2, stacked[1])
        assert float(d_padded) < 1e-5

    def test_accepts_raw_tables(self):
        raw = np.asarray(ROTATION_GROUPS["32"])
        stacked = np.asarray(stack_symmetry_tables([raw, "2"]))
        assert stacked.shape == (2, 6, 4)


class TestHexagonalSnap:
    def test_nearest_equivalent_recovers_hex_image(self):
        """A candidate displaced by a hexagonal operator snaps back onto the
        reference under the '622' table (and does NOT under triclinic '1')."""
        from latice_tpu.crystal import misorientation_angle

        ref = from_euler_zxz_deg(np.array([40.0, 50.0, 60.0]))
        op = symmetry_quats("622")[2].astype(ref.dtype)  # 120 deg about z
        cand = quat_mul(op, ref)  # snap composes sym_k (x) cand

        hex_snap = nearest_symmetry_equivalent(ref, cand, symmetry_quats("622"))
        assert float(misorientation_angle(ref, hex_snap)) < 1e-5

        tri_snap = nearest_symmetry_equivalent(ref, cand, symmetry_quats("1"))
        assert float(misorientation_angle(ref, tri_snap)) > 0.5
