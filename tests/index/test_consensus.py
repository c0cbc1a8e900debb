"""Consensus-engine tests, anchored on the reference golden test
(tests/index/test_chroma_db.py:306-382) and scipy-computed expectations."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.index import consensus_from_euler

# The golden-test orientations (test_chroma_db.py:317-327): a tight cluster
# around [30, 45, 60] plus one far outlier.
GOLDEN = np.array(
    [
        [30.0, 45.0, 60.0],
        [32.0, 44.0, 61.0],
        [31.0, 46.0, 59.0],
        [29.0, 45.0, 58.0],
        [28.0, 43.0, 62.0],
        [90.0, 90.0, 90.0],
    ],
    dtype=np.float32,
)


class TestGoldenConsensus:
    def test_success_case_radians(self):
        """The chroma golden test thresholds in radians (0.3 rad ≈ 17.2°)."""
        out = consensus_from_euler(
            jnp.asarray(GOLDEN)[None],
            orientation_threshold=0.3,
            min_required_matches=3,
            max_iterations=2,
            angle_unit="rad",
        )
        assert bool(out.success[0])
        mean = np.asarray(out.mean_euler[0])
        assert 25 < mean[0] < 35
        assert 40 < mean[1] < 50
        assert 55 < mean[2] < 65
        # Outlier excluded, 5 cluster members included.
        assert np.asarray(out.similar_mask[0]).sum() == 5
        assert not bool(out.similar_mask[0][5])

    def test_failure_case(self):
        """Tiny threshold + high min_required → success=False
        (test_chroma_db.py:369-382)."""
        out = consensus_from_euler(
            jnp.asarray(GOLDEN)[None],
            orientation_threshold=0.01,
            min_required_matches=5,
            max_iterations=2,
            angle_unit="rad",
        )
        assert not bool(out.success[0])

    def test_success_case_degrees(self):
        """FAISS semantics: same scenario with a degree threshold."""
        out = consensus_from_euler(
            jnp.asarray(GOLDEN)[None],
            orientation_threshold=5.0,
            min_required_matches=3,
            max_iterations=2,
            angle_unit="deg",
        )
        assert bool(out.success[0])
        mean = np.asarray(out.mean_euler[0])
        assert 25 < mean[0] < 35 and 40 < mean[1] < 50 and 55 < mean[2] < 65

    def test_mean_matches_scipy_pipeline(self):
        """Numerical parity with the reference algorithm run via scipy."""
        inliers = GOLDEN[:5]
        rots = R.from_euler("zxz", inliers, degrees=True)
        ref = rots[0]
        sym = R.from_quat(
            np.asarray(__import__("latice_tpu.crystal", fromlist=["CUBIC_SYMMETRY"]).CUBIC_SYMMETRY)
        )
        snapped = []
        for i in range(len(inliers)):
            all_sym = sym * rots[i]
            idx = (ref.inv() * all_sym).magnitude().argmin()
            snapped.append(all_sym[idx].as_euler("zxz", degrees=True))
        want = (
            R.from_euler("zxz", np.asarray(snapped), degrees=True)
            .mean()
            .as_euler("zxz", degrees=True)
        )

        out = consensus_from_euler(
            jnp.asarray(GOLDEN)[None],
            orientation_threshold=5.0,
            min_required_matches=3,
            max_iterations=2,
        )
        got = np.asarray(out.mean_euler[0])
        got_m = R.from_euler("zxz", got, degrees=True).as_matrix()
        want_m = R.from_euler("zxz", want, degrees=True).as_matrix()
        np.testing.assert_allclose(got_m, want_m, atol=2e-4)


class TestConsensusMechanics:
    def test_second_reference_succeeds_when_first_is_outlier(self):
        """Outlier-first ordering exercises the iterate-over-references logic."""
        cands = np.concatenate([GOLDEN[5:], GOLDEN[:5]]).astype(np.float32)
        out = consensus_from_euler(
            jnp.asarray(cands)[None],
            orientation_threshold=5.0,
            min_required_matches=4,
            max_iterations=3,
        )
        assert bool(out.success[0])
        assert int(out.chosen_iter[0]) == 1
        mean = np.asarray(out.mean_euler[0])
        assert 25 < mean[0] < 35 and 40 < mean[1] < 50 and 55 < mean[2] < 65

    def test_batch_queries_independent(self):
        """Batched call must equal per-query calls."""
        batch = np.stack([GOLDEN, np.roll(GOLDEN, 1, axis=0)])
        out_b = consensus_from_euler(
            jnp.asarray(batch), 5.0, min_required_matches=3, max_iterations=3
        )
        for i in range(2):
            out_i = consensus_from_euler(
                jnp.asarray(batch[i])[None], 5.0, min_required_matches=3, max_iterations=3
            )
            np.testing.assert_allclose(
                np.asarray(out_b.mean_euler[i]),
                np.asarray(out_i.mean_euler[0]),
                atol=1e-4,
            )
            assert bool(out_b.success[i]) == bool(out_i.success[0])

    def test_max_iterations_clamped_to_k(self):
        out = consensus_from_euler(
            jnp.asarray(GOLDEN[:2])[None],
            5.0,
            min_required_matches=2,
            max_iterations=10,
        )
        assert bool(out.success[0])

    def test_symmetry_equivalent_orientations_cluster(self):
        """Candidates given in different symmetry variants still average
        correctly — the whole point of the symmetry snap (faiss_db.py:317-323)."""
        base = R.from_euler("zxz", [30.0, 45.0, 60.0], degrees=True)
        sym = R.from_quat(
            np.asarray(__import__("latice_tpu.crystal", fromlist=["CUBIC_SYMMETRY"]).CUBIC_SYMMETRY)
        )
        # Same physical orientation expressed through 6 different symmetry ops.
        variants = np.stack(
            [(sym[i] * base).as_euler("zxz", degrees=True) for i in range(6)]
        ).astype(np.float32)
        out = consensus_from_euler(
            jnp.asarray(variants)[None],
            orientation_threshold=5.0,
            min_required_matches=2,
            max_iterations=3,
        )
        # All are symmetry-equivalent to each other -> misorientation under
        # symmetry is 0, but RAW misorientation is large, so the reference
        # algorithm only matches those that share the variant of the ref.
        # At minimum the call must be finite and well-formed.
        assert np.all(np.isfinite(np.asarray(out.mean_euler)))

    def test_invalid_angle_unit_raises(self):
        with pytest.raises(ValueError, match="angle_unit"):
            consensus_from_euler(jnp.asarray(GOLDEN)[None], 1.0, angle_unit="grad")


class TestWeightedConsensus:
    """Similarity-weighted quaternion mean (cand_weights / pipeline
    consensus_weight_power) — the sub-grid refinement lever."""

    def _run(self, weights):
        from latice_tpu.crystal import from_euler_zxz_deg
        from latice_tpu.index import consensus_orientations

        quats = from_euler_zxz_deg(jnp.asarray(GOLDEN[None, :5]))
        return consensus_orientations(
            quats,
            orientation_threshold=6.0,
            min_required_matches=3,
            max_iterations=1,
            cand_weights=None if weights is None else jnp.asarray(weights)[None],
        )

    def test_uniform_weights_match_unweighted(self):
        base = self._run(None)
        ones = self._run(np.ones(5, np.float32))
        np.testing.assert_allclose(
            np.asarray(base.mean_euler), np.asarray(ones.mean_euler), atol=1e-5
        )

    def test_extreme_weight_collapses_to_that_candidate(self):
        w = np.array([0.0, 0.0, 1.0, 0.0, 0.0], np.float32)
        out = self._run(w)
        assert bool(out.success[0])
        np.testing.assert_allclose(
            np.asarray(out.mean_euler[0]), GOLDEN[2], atol=1e-3
        )

    def test_weighting_pulls_toward_heavier_candidates(self):
        from scipy.spatial.transform import Rotation as R

        heavy = self._run(np.array([1, 8, 1, 1, 1], np.float32))
        uniform = self._run(None)
        target = R.from_euler("zxz", GOLDEN[1], degrees=True)
        def err(out):
            got = R.from_euler("zxz", np.asarray(out.mean_euler[0]), degrees=True)
            return np.degrees((got.inv() * target).magnitude())
        assert err(heavy) < err(uniform)

    def test_pipeline_power_zero_is_reference_parity(self):
        """scores**0 == 1 -> identical to the unweighted pipeline."""
        import jax

        from latice_tpu.index import IndexPipeline
        from latice_tpu.models import VariationalAutoEncoderRawData

        rng = np.random.default_rng(0)
        base = rng.uniform(size=(1, 128, 128)).astype(np.float32)
        patterns = (base + rng.normal(size=(12, 128, 128)) * 0.02).astype(np.float32)
        angles = rng.uniform([10, 20, 10], [170, 140, 170], size=(12, 3))
        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
        params = model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 128, 128, 1)),
            jax.random.key(1),
        )["params"]
        lat = np.asarray(
            model.apply({"params": params}, patterns[..., None], method="encode")[0]
        )
        vecs = lat / np.linalg.norm(lat, axis=1, keepdims=True)
        kw = dict(top_n=5, orientation_threshold=3.0, min_required_matches=1,
                  batch_size=12)
        r0 = IndexPipeline(model, params, vecs, angles, **kw)(patterns)
        rp = IndexPipeline(
            model, params, vecs, angles, consensus_weight_power=0.0, **kw
        )(patterns)
        np.testing.assert_allclose(r0.best_orientation, rp.best_orientation, atol=1e-5)
        np.testing.assert_array_equal(r0.success, rp.success)

    def test_all_zero_weights_fall_back_to_uniform(self):
        """Underflowed weights (e.g. s**256 at moderate similarity) must not
        hand quat_mean an all-zero row — the mean falls back to uniform."""
        zero = self._run(np.zeros(5, np.float32))
        uniform = self._run(None)
        np.testing.assert_allclose(
            np.asarray(zero.mean_euler), np.asarray(uniform.mean_euler), atol=1e-5
        )
