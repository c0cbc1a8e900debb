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
