"""Autodiff orientation refinement: convergence below the dictionary grid.

Ground truth is synthetic by construction: patterns rendered at known
orientations, initializations perturbed by a known misorientation.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.sim import (
    DetectorGeometry,
    cubic_reflectors,
    refine_orientations,
    simulate_patterns,
)


def _misorientation_deg(qa, qb):
    ra = R.from_quat(np.roll(qa, -1, axis=-1))
    rb = R.from_quat(np.roll(qb, -1, axis=-1))
    return np.degrees((ra.inv() * rb).magnitude())


def _perturb(quats, deg, rng):
    axes = rng.normal(size=(len(quats), 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    dr = R.from_rotvec(np.radians(deg) * axes)
    q = R.from_quat(np.roll(quats, -1, axis=-1))
    return np.roll((dr * q).as_quat(), 1, axis=-1).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    geom = DetectorGeometry(shape=(64, 64))
    refl = cubic_reflectors("fcc", max_hkl=2, min_d=1.0)
    truth = rng.normal(size=(6, 4)).astype(np.float32)
    truth /= np.linalg.norm(truth, axis=1, keepdims=True)
    patterns = simulate_patterns(truth, geom, refl)
    return rng, geom, refl, truth, patterns


class TestRefine:
    def test_converges_below_grid_resolution(self, setup):
        rng, geom, refl, truth, patterns = setup
        init = _perturb(truth, 1.5, rng)  # a 2-3 deg dictionary's error
        err0 = _misorientation_deg(init, truth)
        refined, ncc = refine_orientations(
            patterns, init, geom, refl, steps=40
        )
        err1 = _misorientation_deg(refined, truth)
        assert err0.min() > 1.4  # the perturbation really was applied
        assert np.median(err1) < 0.15
        assert (err1 < err0 / 3).all()
        assert (ncc > 0.95).all()

    def test_noisy_patterns_still_converge(self, setup):
        rng, geom, refl, truth, patterns = setup
        noisy = patterns + rng.normal(size=patterns.shape).astype(np.float32) * 0.1
        init = _perturb(truth, 1.0, rng)
        refined, ncc = refine_orientations(noisy, init, geom, refl, steps=40)
        err1 = _misorientation_deg(refined, truth)
        assert np.median(err1) < 0.3
        # NCC reports the (noise-bounded) fit honestly, not a fake 1.0.
        assert (ncc > 0.5).all() and (ncc < 0.999).all()

    def test_exact_init_stays_put(self, setup):
        rng, geom, refl, truth, patterns = setup
        refined, ncc = refine_orientations(
            patterns, truth, geom, refl, steps=15
        )
        err = _misorientation_deg(refined, truth)
        assert np.max(err) < 0.05
        assert (ncc > 0.99).all()

    def test_chunking_matches_oneshot(self, setup):
        rng, geom, refl, truth, patterns = setup
        init = _perturb(truth, 1.0, np.random.default_rng(3))
        a, _ = refine_orientations(patterns, init, geom, refl, steps=10, chunk=2)
        b, _ = refine_orientations(patterns, init, geom, refl, steps=10, chunk=8)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_candidate_reranking_overrules_wrong_top1(self, setup):
        """refine_candidates: when the encoder's top-1 is a different
        orientation but the truth sits at k=1, the NCC re-rank recovers it."""
        from latice_tpu.sim import refine_candidates

        rng, geom, refl, truth, patterns = setup
        wrong = np.roll(truth, 2, axis=0)  # a distinctly different orientation
        init_true = _perturb(truth, 1.0, rng)
        cand = np.stack([wrong, init_true], axis=1)  # (B, 2, 4): top-1 wrong
        best_q, ncc, best_k = refine_candidates(
            patterns, cand, geom, refl, steps=25
        )
        assert (best_k == 1).all()
        err = _misorientation_deg(best_q, truth)
        assert np.median(err) < 0.2
        assert (ncc > 0.95).all()

    def test_candidate_shapes_validated(self, setup):
        from latice_tpu.sim import refine_candidates

        _, geom, refl, truth, patterns = setup
        with pytest.raises(ValueError, match="B, K, 4"):
            refine_candidates(patterns, truth, geom, refl)
        with pytest.raises(ValueError, match="K >= 1"):
            refine_candidates(patterns, np.zeros((len(truth), 0, 4)), geom, refl)

    def test_validation(self, setup):
        _, geom, refl, truth, patterns = setup
        with pytest.raises(ValueError, match="B, H, W"):
            refine_orientations(patterns[0], truth[:1], geom, refl)
        with pytest.raises(ValueError, match="init_quats"):
            refine_orientations(patterns, truth[:2], geom, refl)
        with pytest.raises(ValueError, match="geometry"):
            refine_orientations(
                patterns, truth, DetectorGeometry(shape=(32, 32)), refl
            )