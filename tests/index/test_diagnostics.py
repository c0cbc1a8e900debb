"""Pseudo-symmetry / ambiguity diagnostics (index.diagnostics)."""

import numpy as np
import pytest

from latice_tpu.index import DenseIndexResult, candidate_ambiguity


def _result(indices, scores):
    indices = np.asarray(indices)
    scores = np.asarray(scores, np.float32)
    b = len(indices)
    return DenseIndexResult(
        mean_orientation=np.zeros((b, 3)),
        best_orientation=np.zeros((b, 3)),
        success=np.ones(b, bool),
        n_similar=np.full(b, indices.shape[1], np.int64),
        indices=indices,
        scores=scores,
        phase=None,
    )


class TestCandidateAmbiguity:
    def test_grid_neighbors_are_not_rivals(self):
        # All candidates within 3 deg of the top-1: the same solution.
        angles = np.asarray(
            [[30.0, 45.0, 60.0], [31.0, 45.5, 60.0], [29.5, 44.0, 61.0]]
        )
        res = _result([[0, 1, 2]], [[0.99, 0.98, 0.97]])
        amb = candidate_ambiguity(res, angles, chunk=4)
        assert not amb.has_rival[0]
        assert np.isnan(amb.angle_deg[0]) and np.isnan(amb.score_gap[0])
        assert not amb.ambiguous()[0]

    def test_distinct_orientation_flags(self):
        angles = np.asarray(
            [[30.0, 45.0, 60.0], [31.0, 45.0, 60.0], [80.0, 100.0, 10.0]]
        )
        res = _result([[0, 1, 2]], [[0.99, 0.985, 0.982]])
        amb = candidate_ambiguity(res, angles, chunk=4)
        assert amb.has_rival[0]
        assert amb.angle_deg[0] > 3.0
        assert amb.score_gap[0] == pytest.approx(0.99 - 0.982, abs=1e-6)
        assert amb.ambiguous(max_gap=0.02)[0]
        assert not amb.ambiguous(max_gap=0.001)[0]

    def test_symmetry_equivalent_candidate_is_same_solution(self):
        # A CRYSTAL-side cubic image of the top-1 (q ⊗ s — the equivalence
        # side of this repo's crystal→detector convention, the same side
        # `reduce_to_fundamental_zone` canonicalizes with) is the SAME
        # physical orientation: it must not count as a rival (the
        # pseudo-symmetry-aware part of the diagnostic).
        from scipy.spatial.transform import Rotation as R

        base = R.from_euler("zxz", [30.0, 45.0, 60.0], degrees=True)
        sym_img = base * R.from_euler("z", 90, degrees=True)
        angles = np.stack(
            [
                [30.0, 45.0, 60.0],
                sym_img.as_euler("zxz", degrees=True),
                [29.0, 45.0, 60.0],
            ]
        )
        res = _result([[0, 1, 2]], [[0.99, 0.98, 0.97]])
        amb = candidate_ambiguity(res, angles, group="432", chunk=4)
        assert not amb.has_rival[0]
        # With NO symmetry (triclinic), the rotated image IS a rival.
        amb1 = candidate_ambiguity(res, angles, group="1", chunk=4)
        assert amb1.has_rival[0]
        assert amb1.angle_deg[0] == pytest.approx(90.0, abs=0.5)

    def test_lab_frame_image_is_a_rival(self):
        # A LAB-frame (premultiplied, s ⊗ q) 90° image is a genuinely
        # different physical orientation — a 90° rotation about an
        # arbitrary crystal direction is not a cubic operator — so the
        # diagnostic must flag it. (Until r4 the reduction premultiplied,
        # silently suppressing exactly this class of rival; the crystal-
        # side default of `symmetry_reduced_misorientation` fixed it.)
        from scipy.spatial.transform import Rotation as R

        base = R.from_euler("zxz", [30.0, 45.0, 60.0], degrees=True)
        lab_img = R.from_euler("z", 90, degrees=True) * base
        angles = np.stack(
            [
                [30.0, 45.0, 60.0],
                lab_img.as_euler("zxz", degrees=True),
            ]
        )
        res = _result([[0, 1]], [[0.99, 0.98]])
        amb = candidate_ambiguity(res, angles, group="432", chunk=4)
        assert amb.has_rival[0]
        assert amb.angle_deg[0] > 3.0

    def test_rival_is_highest_scored_not_largest_angle(self):
        angles = np.asarray(
            [
                [30.0, 45.0, 60.0],
                [80.0, 100.0, 10.0],   # rival A (score .95)
                [150.0, 70.0, 110.0],  # rival B (score .90)
            ]
        )
        res = _result([[0, 1, 2]], [[0.99, 0.95, 0.90]])
        amb = candidate_ambiguity(res, angles, chunk=4)
        assert amb.score_gap[0] == pytest.approx(0.04, abs=1e-6)

    def test_cross_phase_candidate_is_rival(self):
        # Identical angles but a different phase: a rival regardless of
        # misorientation (phase ambiguity).
        angles = np.asarray([[30.0, 45.0, 60.0], [30.0, 45.0, 60.0]])
        phases = np.asarray([0, 1])
        res = _result([[0, 1]], [[0.99, 0.985]])
        amb = candidate_ambiguity(
            res, angles, phase_groups=["432", "622"],
            dictionary_phases=phases, chunk=4,
        )
        assert amb.has_rival[0]
        assert amb.score_gap[0] == pytest.approx(0.005, abs=1e-6)

    def test_chunking_matches_single_dispatch(self):
        rng = np.random.default_rng(0)
        n_dict = 200
        angles = rng.uniform([0, 10, 0], [350, 170, 350], size=(n_dict, 3))
        b, k = 37, 6
        idx = rng.integers(0, n_dict, size=(b, k))
        sc = np.sort(rng.uniform(0.5, 1.0, size=(b, k)))[:, ::-1]
        res = _result(idx, sc)
        a1 = candidate_ambiguity(res, angles, chunk=8)
        a2 = candidate_ambiguity(res, angles, chunk=64)
        np.testing.assert_array_equal(a1.has_rival, a2.has_rival)
        np.testing.assert_allclose(a1.angle_deg, a2.angle_deg, rtol=1e-5)

    def test_needs_two_candidates(self):
        res = _result([[0]], [[0.9]])
        with pytest.raises(ValueError, match="top_n"):
            candidate_ambiguity(res, np.zeros((1, 3)))
