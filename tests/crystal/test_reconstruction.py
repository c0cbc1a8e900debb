"""Parent-grain reconstruction: OR tables, candidates, voting recovery."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.crystal import (
    grain_adjacency,
    or_rotation,
    parent_candidates,
    reconstruct_parents,
)
from latice_tpu.crystal.csl import _qmul_np
from latice_tpu.crystal.symmetry import symmetry_quats


def _angle_deg(q):
    return 2 * np.degrees(np.arccos(np.clip(abs(q[0]), 0, 1)))


class TestOrRotation:
    def test_published_misorientation_angles(self):
        """The parallelism-built rotations hit the textbook OR angles."""
        assert _angle_deg(or_rotation("ks")) == pytest.approx(42.85, abs=0.05)
        assert _angle_deg(or_rotation("nw")) == pytest.approx(45.99, abs=0.05)
        assert _angle_deg(or_rotation("bain")) == pytest.approx(45.0, abs=1e-6)

    def test_bain_axis_is_100(self):
        q = or_rotation("bain")
        axis = q[1:] / np.linalg.norm(q[1:])
        assert abs(axis).max() == pytest.approx(1.0, abs=1e-9)

    def test_parallelism_is_enforced(self):
        """The built rotation actually maps plane->plane and dir->dir."""
        from latice_tpu.crystal import ORIENTATION_RELATIONSHIPS

        for name, ((np_, nc), (dp, dc)) in ORIENTATION_RELATIONSHIPS.items():
            q = or_rotation(name)
            rot = R.from_quat(np.roll(q, -1))  # wxyz -> xyzw
            for a, b in ((np_, nc), (dp, dc)):
                a = np.asarray(a, float) / np.linalg.norm(a)
                b = np.asarray(b, float) / np.linalg.norm(b)
                np.testing.assert_allclose(rot.apply(a), b, atol=1e-9, err_msg=name)

    def test_custom_and_errors(self):
        q = or_rotation((((0, 0, 1), (0, 0, 1)), ((1, 0, 0), (1, 0, 0))))
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-12)
        with pytest.raises(ValueError, match="unknown OR"):
            or_rotation("gt")  # Greninger-Troiano not shipped
        with pytest.raises(ValueError, match="lie in plane"):
            or_rotation((((0, 0, 1), (0, 0, 1)), ((0, 0, 1), (1, 0, 0))))


class TestParentCandidates:
    @pytest.mark.parametrize("name,count", [("ks", 24), ("nw", 12), ("bain", 3)])
    def test_variant_counts(self, name, count):
        cands = parent_candidates(np.asarray([[10.0, 20.0, 30.0]]), name)
        assert cands.shape == (1, count, 4)

    def test_candidates_contain_the_true_parent(self):
        """Forward-transform a parent through every child symmetry; the
        inversion recovers it (modulo parent symmetry) in every case."""
        t = or_rotation("ks")
        sym = np.asarray(symmetry_quats("432"), np.float64)
        gp = np.roll(R.from_euler("zxz", [25, 40, 10], degrees=True).as_quat(), 1)
        for k in range(0, 24, 5):
            gc = _qmul_np(sym[k], _qmul_np(t, gp))
            euler_c = R.from_quat(np.roll(gc, -1)).as_euler("zxz", degrees=True)
            cands = parent_candidates(np.asarray([euler_c]), "ks")[0]
            # Some candidate matches gp modulo parent symmetry.
            imgs = _qmul_np(sym[:, None, :], cands[None, :, :]).reshape(-1, 4)
            best = np.abs(imgs @ gp).max()
            # ~0.03° floor: candidates are float32, arccos is steep at dot=1.
            assert 2 * np.degrees(np.arccos(min(best, 1.0))) < 0.1


def _forward_map(seed=0, relationship="ks"):
    """Synthetic child map: 3 parent grains x 4 child regions each, distinct
    variants, on a 12-grain chain -> returns (child mean eulers, adjacency,
    truth parent ids, truth parent eulers).

    Variants come from PARENT-side symmetry (gc = s_c . T . s_p . gp): the
    s_p choice selects the physical variant, while a random s_c only changes
    the measured representative (modulo child symmetry it is the same
    orientation). Distinct s_p per child makes every parent identifiable —
    a single-variant parent is intrinsically ambiguous (see module doc)."""
    rng = np.random.default_rng(seed)
    t = or_rotation(relationship)
    sym = np.asarray(symmetry_quats("432"), np.float64)
    parent_eulers = np.asarray(
        [[15.0, 30.0, 45.0], [70.0, 55.0, 10.0], [40.0, 80.0, 60.0]]
    )
    child_eulers, parent_of = [], []
    for p, pe in enumerate(parent_eulers):
        gp = np.roll(R.from_euler("zxz", pe, degrees=True).as_quat(), 1)
        for k in rng.choice(24, size=4, replace=False):
            sp, sc = sym[k], sym[rng.integers(0, 24)]
            gc = _qmul_np(sc, _qmul_np(t, _qmul_np(sp, gp)))
            # ~0.1 deg measurement noise on the child orientation.
            pert = R.from_rotvec(rng.normal(scale=np.radians(0.1), size=3))
            gc_r = R.from_quat(np.roll(gc, -1)) * pert
            child_eulers.append(gc_r.as_euler("zxz", degrees=True))
            parent_of.append(p)
    child_eulers = np.asarray(child_eulers)
    parent_of = np.asarray(parent_of)
    # Chain adjacency inside each parent + cross-parent edges.
    edges = []
    for p in range(3):
        ids = np.where(parent_of == p)[0]
        edges += [(ids[i], ids[i + 1]) for i in range(len(ids) - 1)]
    edges += [(3, 4), (7, 8)]  # cross-parent boundaries
    return child_eulers, np.asarray(edges), parent_of, parent_eulers


class TestReconstruction:
    def test_recovers_parents_from_forward_simulation(self):
        child, edges, truth_ids, truth_eulers = _forward_map()
        rec = reconstruct_parents(child, edges, "ks", tolerance_deg=2.5)
        assert rec.n_parents == 3
        # Same-parent children share a label; cross-parent children do not.
        for p in range(3):
            ids = np.where(truth_ids == p)[0]
            assert len(set(rec.parent_labels[ids])) == 1
        assert len(set(rec.parent_labels[[0, 4, 8]])) == 3
        # Parent orientations match truth modulo parent symmetry.
        sym = np.asarray(symmetry_quats("432"), np.float64)
        for p in range(3):
            got = rec.parent_orientation[rec.parent_labels[4 * p]]
            qg = np.roll(R.from_euler("zxz", got, degrees=True).as_quat(), 1)
            qt = np.roll(
                R.from_euler("zxz", truth_eulers[p], degrees=True).as_quat(), 1
            )
            best = np.abs(_qmul_np(sym, qg[None, :]) @ qt).max()
            assert 2 * np.degrees(np.arccos(min(best, 1.0))) < 0.5
        assert rec.fit_deg.max() < 1.0

    def test_variant_ids_partition_by_physical_variant(self):
        """`variant` is the physical variant id: within one parent, children
        that transformed through the same s_p share an id, distinct s_p get
        distinct ids — regardless of the measured representative (random
        child-side s_c)."""
        rng = np.random.default_rng(5)
        t = or_rotation("ks")
        sym = np.asarray(symmetry_quats("432"), np.float64)
        gp = np.roll(R.from_euler("zxz", [33, 48, 12], degrees=True).as_quat(), 1)
        sp_choice = [2, 2, 7, 7, 11, 19]  # pairs share a variant; 4 distinct
        child = []
        for k in sp_choice:
            gc = _qmul_np(
                sym[rng.integers(0, 24)], _qmul_np(t, _qmul_np(sym[k], gp))
            )
            pert = R.from_rotvec(rng.normal(scale=np.radians(0.1), size=3))
            child.append(
                (R.from_quat(np.roll(gc, -1)) * pert).as_euler("zxz", degrees=True)
            )
        edges = np.asarray([(i, i + 1) for i in range(5)])
        rec = reconstruct_parents(np.asarray(child), edges, "ks", tolerance_deg=2.5)
        assert rec.n_parents == 1
        v = rec.variant
        assert v[0] == v[1] and v[2] == v[3]  # same s_p -> same id
        assert len({int(v[0]), int(v[2]), int(v[4]), int(v[5])}) == 4

    def test_or_variant_table_counts(self):
        from latice_tpu.crystal import or_variant_table

        assert or_variant_table("ks").shape == (24, 4)
        assert or_variant_table("nw").shape == (12, 4)
        assert or_variant_table("bain").shape == (3, 4)

    def test_edge_blocking_matches_single_block(self, monkeypatch):
        """Padded fixed-size edge blocks give the same answer as one block."""
        from latice_tpu.crystal import reconstruction as mod

        child, edges, _, _ = _forward_map(seed=4)
        whole = reconstruct_parents(child, edges, "ks", tolerance_deg=2.5)
        monkeypatch.setattr(mod, "_EDGE_BLOCK", 4)
        blocked = reconstruct_parents(child, edges, "ks", tolerance_deg=2.5)
        np.testing.assert_array_equal(whole.parent_labels, blocked.parent_labels)
        np.testing.assert_array_equal(whole.variant, blocked.variant)
        np.testing.assert_allclose(
            whole.parent_orientation, blocked.parent_orientation, atol=1e-4
        )

    def test_accidental_merge_is_peeled_apart(self):
        """Seed 4 draws parents whose KS fans coincide under tolerance on a
        cross-parent edge; outlier peeling must split the merged component
        (without peeling this reconstructs 2 parents with ~20-deg fits)."""
        child, edges, truth_ids, _ = _forward_map(seed=4)
        rec = reconstruct_parents(child, edges, "ks", tolerance_deg=2.5)
        assert rec.n_parents == 3
        for p in range(3):
            ids = np.where(truth_ids == p)[0]
            assert len(set(rec.parent_labels[ids])) == 1
        assert rec.fit_deg.max() < 1.0

    def test_unrelated_children_stay_separate(self):
        """Children NOT generated through the OR reconstruct as singletons."""
        rng = np.random.default_rng(1)
        child = R.random(6, random_state=rng).as_euler("zxz", degrees=True)
        edges = np.asarray([(i, i + 1) for i in range(5)])
        rec = reconstruct_parents(child, edges, "ks", tolerance_deg=2.0)
        assert rec.n_parents == 6

    def test_nw_relationship_roundtrip(self):
        child, edges, truth_ids, _ = _forward_map(seed=2, relationship="nw")
        rec = reconstruct_parents(child, edges, "nw", tolerance_deg=2.5)
        assert rec.n_parents == 3

    def test_adjacency_validation_and_empty(self):
        with pytest.raises(ValueError, match="adjacency"):
            reconstruct_parents(
                np.zeros((2, 3)), np.asarray([[0, 5]]), "ks"
            )
        rec = reconstruct_parents(np.zeros((3, 3)), np.zeros((0, 2)), "ks")
        assert rec.n_parents == 3  # no edges: every child its own parent


class TestGrainAdjacency:
    def test_pairs_from_label_map(self):
        labels = np.asarray([[0, 0, 1], [2, 2, 1]])
        pairs = grain_adjacency(labels)
        assert {tuple(p) for p in pairs} == {(0, 1), (0, 2), (1, 2)}
