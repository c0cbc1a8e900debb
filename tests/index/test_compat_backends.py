"""Compatibility-backend tests, mirroring the reference suites
(tests/index/test_chroma_db.py) against the real TPU-engine implementations."""

import numpy as np
import pytest

from latice_tpu.index.chroma_db import (
    ChromaLatentVectorDatabase,
    LatentVectorDatabaseConfig,
    OrientationResult,
)
from latice_tpu.index.faiss_db import (
    FaissLatentVectorDatabase,
    FaissLatentVectorDatabaseConfig,
)

RNG = np.random.default_rng(0)

# The reference golden-test orientations (test_chroma_db.py:317-327).
GOLDEN = np.array(
    [
        [30.0, 45.0, 60.0],
        [32.0, 44.0, 61.0],
        [31.0, 46.0, 59.0],
        [29.0, 45.0, 58.0],
        [28.0, 43.0, 62.0],
        [90.0, 90.0, 90.0],
    ]
)


def golden_db(cls=ChromaLatentVectorDatabase, config=None):
    """DB whose 6 entries rank exactly in GOLDEN order for a ones query."""
    db = cls(config)
    base = np.ones(16)
    # decreasing similarity with rank
    vecs = np.stack([base + i * 0.05 * np.arange(16) for i in range(6)])
    db.add_vectors(vecs, GOLDEN)
    return db, base


class TestChromaCompat:
    def test_query_similar_chroma_dict_shape(self):
        db, q = golden_db()
        results = db.query_similar(q, n_results=4)
        assert set(results) == {"ids", "distances", "metadatas"}
        assert len(results["metadatas"][0]) == 4
        meta = results["metadatas"][0][0]
        assert {"orientation_str", "phi1", "Phi", "phi2"} <= set(meta)
        # cosine distances ascending (best first)
        d = results["distances"][0]
        assert d == sorted(d) and d[0] >= 0

    def test_query_wrong_dimension(self):
        db, _ = golden_db()
        with pytest.raises(ValueError, match="Expected query vector of dimension"):
            db.query_similar(np.ones(8))

    def test_golden_find_best_orientation(self):
        """The reference golden test (test_chroma_db.py:306-382): radians
        threshold, success + mean near [30,45,60], then the failure mode."""
        db, q = golden_db()
        result = db.find_best_orientation(
            q, top_n=6, orientation_threshold=0.3, min_required_matches=3,
            max_iterations=2,
        )
        assert isinstance(result, OrientationResult)
        assert result.success is True
        assert result.candidate_orientations.shape == (6, 3)
        mean = result.mean_orientation
        assert 25 < mean[0] < 35
        assert 40 < mean[1] < 50
        assert 55 < mean[2] < 65
        # chroma keeps best_orientation = closest match even on success
        np.testing.assert_array_equal(
            result.best_orientation, result.candidate_orientations[0]
        )

        failure = db.find_best_orientation(
            q, top_n=6, orientation_threshold=0.01, min_required_matches=5,
            max_iterations=2,
        )
        assert failure.success is False
        assert failure.candidate_orientations.shape == (6, 3)
        assert failure.mean_orientation is None

    def test_persistent_directory(self, tmp_path):
        cfg = LatentVectorDatabaseConfig(persist_directory=str(tmp_path / "store"))
        db, q = golden_db(config=cfg)
        assert (tmp_path / "store" / "latent_vectors.npz").exists()
        db2 = ChromaLatentVectorDatabase(cfg)
        assert db2.get_count() == 6

    def test_delete_collection(self, tmp_path):
        cfg = LatentVectorDatabaseConfig(persist_directory=str(tmp_path / "s"))
        db, _ = golden_db(config=cfg)
        db.delete_collection()
        assert db.get_count() == 0
        assert not (tmp_path / "s" / "latent_vectors.npz").exists()


class TestFaissCompat:
    def test_query_similar_tuple_layout(self, tmp_path):
        db, q = golden_db(
            FaissLatentVectorDatabase,
            FaissLatentVectorDatabaseConfig(npz_path=str(tmp_path / "f.npz")),
        )
        sims, idx = db.query_similar(q, n_results=3)
        assert sims.shape == (3,) and idx.shape == (3,)
        assert idx[0] == 0  # the exact query vector direction
        assert sims[0] == max(sims)

    def test_degree_threshold_semantics(self, tmp_path):
        db, q = golden_db(
            FaissLatentVectorDatabase,
            FaissLatentVectorDatabaseConfig(npz_path=str(tmp_path / "f.npz")),
        )
        # 5-degree threshold: cluster matches, success, best == mean
        result = db.find_best_orientation(
            q, top_n=6, orientation_threshold=5.0, min_required_matches=3,
            max_iterations=2,
        )
        assert result.success
        np.testing.assert_array_equal(result.best_orientation, result.mean_orientation)
        # 0.3 *degrees* (not radians) excludes everything but the ref itself
        tight = db.find_best_orientation(
            q, top_n=6, orientation_threshold=0.3, min_required_matches=3,
            max_iterations=2,
        )
        assert not tight.success

    def test_npz_roundtrip(self, tmp_path):
        path = tmp_path / "rt.npz"
        db, q = golden_db(
            FaissLatentVectorDatabase, FaissLatentVectorDatabaseConfig(str(path))
        )
        db.save()
        db2 = FaissLatentVectorDatabase(FaissLatentVectorDatabaseConfig(str(path)))
        assert db2.get_count() == 6
        s1, i1 = db.query_similar(q, 3)
        s2, i2 = db2.query_similar(q, 3)
        np.testing.assert_array_equal(i1, i2)


class TestChromaBatchSemantics:
    def test_batch_matches_single_query_quirks(self):
        """The batch path must apply the same chroma post-processing
        (closest-match best, cosine distances) as find_best_orientation."""
        db, q = golden_db()
        queries = np.stack([q, q * 1.01])
        batch = db.find_best_orientations_batch(
            queries, top_n=6, orientation_threshold=0.3,
            min_required_matches=3, max_iterations=2,
        )
        singles = [
            db.find_best_orientation(
                v, top_n=6, orientation_threshold=0.3,
                min_required_matches=3, max_iterations=2,
            )
            for v in queries
        ]
        for b, s in zip(batch, singles):
            np.testing.assert_array_equal(b.best_orientation, s.best_orientation)
            np.testing.assert_allclose(b.distances, s.distances, atol=1e-6)
            assert b.success == s.success
            # chroma semantics: best stays the closest match even on success
            np.testing.assert_array_equal(
                b.best_orientation, b.candidate_orientations[0]
            )
            assert np.all(np.asarray(b.distances) >= 0)  # distances, not sims
