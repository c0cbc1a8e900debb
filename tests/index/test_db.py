"""Vector DB tests: validation, querying, persistence, end-to-end consensus."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.index import (
    LatentVectorDatabaseConfig,
    OrientationResult,
    TpuLatentVectorDatabase,
)

RNG = np.random.default_rng(0)


@pytest.fixture
def test_vectors():
    latent_vectors = RNG.random((5, 16)).astype(np.float64)
    orientations = RNG.random((5, 3)).astype(np.float64) * 360
    return latent_vectors, orientations


@pytest.fixture
def db(tmp_path):
    return TpuLatentVectorDatabase(
        LatentVectorDatabaseConfig(npz_path=str(tmp_path / "index.npz"))
    )


class TestValidation:
    def test_mismatched_count(self, db, test_vectors):
        latents, orients = test_vectors
        with pytest.raises(ValueError, match="must match"):
            db.add_vectors(latents, orients[:-1])

    def test_wrong_dimension(self, db, test_vectors):
        _, orients = test_vectors
        with pytest.raises(ValueError, match="Expected latent vectors of dimension"):
            db.add_vectors(RNG.random((5, 8)), orients)

    def test_wrong_orientation_shape(self, db, test_vectors):
        latents, _ = test_vectors
        with pytest.raises(ValueError, match="shape"):
            db.add_vectors(latents, RNG.random((5, 4)))

    def test_query_wrong_dimension(self, db, test_vectors):
        db.add_vectors(*test_vectors)
        with pytest.raises(ValueError, match="Expected query vector of dimension"):
            db.query_similar(RNG.random(8))


class TestQueries:
    def test_add_and_count(self, db, test_vectors):
        assert db.get_count() == 0
        db.add_vectors(*test_vectors)
        assert db.get_count() == 5
        db.add_vectors(*test_vectors)
        assert db.get_count() == 10

    def test_query_similar_returns_self(self, db, test_vectors):
        latents, _ = test_vectors
        db.add_vectors(*test_vectors)
        scores, idx = db.query_similar(latents[2], n_results=3)
        assert idx[0] == 2
        assert scores[0] > 0.999

    def test_query_empty_index(self, db):
        scores, idx = db.query_similar(RNG.random(16))
        assert len(scores) == 0 and len(idx) == 0

    def test_query_clamps_n_results(self, db, test_vectors):
        db.add_vectors(*test_vectors)
        scores, idx = db.query_similar(test_vectors[0][0], n_results=20)
        assert len(scores) == 5

    def test_find_best_orientation_empty_index(self, db):
        result = db.find_best_orientation(RNG.random(16))
        assert isinstance(result, OrientationResult)
        assert result.success is False
        assert np.all(np.isnan(result.best_orientation))


class TestConsensusEndToEnd:
    def _clustered_db(self, tmp_path, n_cluster=19, n_noise=30):
        """Dictionary whose first n_cluster latents are near-identical with
        orientations near [30,45,60]; the rest are random noise."""
        rng = np.random.default_rng(7)
        base_vec = rng.normal(size=16)
        cluster_vecs = base_vec + rng.normal(size=(n_cluster, 16)) * 0.01
        cluster_orients = np.array([30.0, 45.0, 60.0]) + rng.uniform(
            -1, 1, size=(n_cluster, 3)
        )
        noise_vecs = -base_vec + rng.normal(size=(n_noise, 16)) * 0.3
        noise_orients = rng.uniform(0, 360, size=(n_noise, 3))

        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path=str(tmp_path / "c.npz"))
        )
        db.add_vectors(
            np.concatenate([cluster_vecs, noise_vecs]),
            np.concatenate([cluster_orients, noise_orients]),
        )
        return db, base_vec

    def test_successful_consensus(self, tmp_path):
        db, query = self._clustered_db(tmp_path)
        result = db.find_best_orientation(
            query, top_n=19, orientation_threshold=5.0, min_required_matches=15
        )
        assert result.success
        assert result.mean_orientation is not None
        # best == mean on success (faiss_db.py:336-343)
        np.testing.assert_array_equal(result.best_orientation, result.mean_orientation)
        got = R.from_euler("zxz", result.mean_orientation, degrees=True)
        want = R.from_euler("zxz", [30.0, 45.0, 60.0], degrees=True)
        assert np.degrees((got.inv() * want).magnitude()) < 2.0
        assert result.candidate_orientations.shape == (19, 3)
        assert len(result.similar_indices) >= 15

    def test_failed_consensus_keeps_closest(self, tmp_path):
        db, query = self._clustered_db(tmp_path)
        result = db.find_best_orientation(
            query, top_n=19, orientation_threshold=0.001, min_required_matches=15
        )
        assert not result.success
        assert result.mean_orientation is None
        np.testing.assert_array_equal(
            result.best_orientation, result.candidate_orientations[0]
        )

    def test_batch_matches_single(self, tmp_path):
        db, query = self._clustered_db(tmp_path)
        queries = np.stack([query, query + 0.005])
        batch = db.find_best_orientations_batch(
            queries, top_n=19, orientation_threshold=5.0, min_required_matches=15
        )
        single = [
            db.find_best_orientation(
                q, top_n=19, orientation_threshold=5.0, min_required_matches=15
            )
            for q in queries
        ]
        assert len(batch) == 2
        for b, s in zip(batch, single):
            assert b.success == s.success
            np.testing.assert_allclose(
                b.mean_orientation, s.mean_orientation, atol=1e-4
            )
            np.testing.assert_array_equal(b.similar_indices, s.similar_indices)

    def test_radians_compat_mode(self, tmp_path):
        """angle_unit='rad' reproduces the chroma radians quirk."""
        db_rad = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(
                npz_path=str(tmp_path / "r.npz"), angle_unit="rad"
            )
        )
        rng = np.random.default_rng(3)
        base_vec = rng.normal(size=16)
        vecs = base_vec + rng.normal(size=(6, 16)) * 0.01
        orients = np.array(
            [
                [30.0, 45.0, 60.0],
                [32.0, 44.0, 61.0],
                [31.0, 46.0, 59.0],
                [29.0, 45.0, 58.0],
                [28.0, 43.0, 62.0],
                [90.0, 90.0, 90.0],
            ]
        )
        db_rad.add_vectors(vecs, orients)
        # 0.3 rad threshold (~17°) excludes the outlier, catches the cluster.
        result = db_rad.find_best_orientation(
            base_vec, top_n=6, orientation_threshold=0.3, min_required_matches=3,
            max_iterations=2,
        )
        assert result.success
        m = result.mean_orientation
        assert 25 < m[0] < 35 and 40 < m[1] < 50 and 55 < m[2] < 65


class TestPersistence:
    def test_save_load_roundtrip(self, tmp_path, test_vectors):
        path = tmp_path / "roundtrip.npz"
        db = TpuLatentVectorDatabase(LatentVectorDatabaseConfig(npz_path=str(path)))
        db.add_vectors(*test_vectors)
        db.save()

        db2 = TpuLatentVectorDatabase(LatentVectorDatabaseConfig(npz_path=str(path)))
        assert db2.get_count() == 5
        s1, i1 = db.query_similar(test_vectors[0][1], n_results=3)
        s2, i2 = db2.query_similar(test_vectors[0][1], n_results=3)
        np.testing.assert_allclose(s1, s2, atol=1e-6)
        np.testing.assert_array_equal(i1, i2)

    def test_create_from_files(self, tmp_path, test_vectors):
        latents, orients = test_vectors
        lp, ap = tmp_path / "latent.npy", tmp_path / "angles.npy"
        np.save(lp, latents)
        np.save(ap, orients)
        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path=str(tmp_path / "files.npz"))
        )
        db.create_from_files(lp, ap)
        assert db.get_count() == 5
        assert (tmp_path / "files.npz").exists()

    def test_delete_persistence(self, tmp_path, test_vectors):
        path = tmp_path / "del.npz"
        db = TpuLatentVectorDatabase(LatentVectorDatabaseConfig(npz_path=str(path)))
        db.add_vectors(*test_vectors)
        db.save()
        db.delete_persistence()
        assert not path.exists()
        assert db.get_count() == 0


class TestEngineMatrix:
    """add/save/load/query across every top-k engine — pins the stale-cache
    class of bug (device + int8 caches must invalidate on load/delete)."""

    ENGINES = ["device", "fused", "approx", "int8", "native"]

    def _make_db(self, tmp_path, engine, name):
        if engine == "native":
            from latice_tpu import native

            if not native.available():
                pytest.skip("native engine unavailable")
        return TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(
                npz_path=str(tmp_path / f"{name}.npz"), engine=engine
            )
        )

    @pytest.mark.parametrize("engine", ENGINES)
    def test_add_save_load_query_cycle(self, tmp_path, engine):
        rng = np.random.default_rng(11)
        vecs_a = rng.normal(size=(64, 16))
        vecs_b = rng.normal(size=(64, 16))
        orients = rng.uniform(0, 360, (64, 3))

        db_a = self._make_db(tmp_path, engine, "a")
        db_a.add_vectors(vecs_a, orients)
        db_a.save()
        db_b = self._make_db(tmp_path, engine, "b")
        db_b.add_vectors(vecs_b, orients)
        db_b.save()

        # Query against A, then point the same instance at B's file: results
        # must reflect B (a stale device/int8 cache would keep serving A).
        _, idx = db_a.query_similar(vecs_a[5], n_results=1)
        assert idx[0] == 5
        db_a.npz_path = db_b.npz_path
        db_a.load()
        scores_b, idx_b = db_a.query_similar(vecs_b[9], n_results=1)
        assert idx_b[0] == 9
        assert scores_b[0] > 0.98

        # delete_persistence resets every cache: re-adding A must serve A.
        db_a.delete_persistence()
        assert db_a.get_count() == 0
        db_a.add_vectors(vecs_a, orients)
        _, idx_a = db_a.query_similar(vecs_a[21], n_results=1)
        assert idx_a[0] == 21


class TestOrientationResult:
    def test_get_top_n_orientations(self):
        result = OrientationResult(
            query_vector=RNG.random(16),
            best_orientation=np.array([30.0, 45.0, 60.0]),
            mean_orientation=np.array([32.0, 46.0, 61.0]),
            candidate_orientations=RNG.random((5, 3)) * 360,
            distances=np.array([0.1, 0.2, 0.3, 0.4, 0.5]),
            success=True,
            similar_indices=np.array([0, 1, 2]),
        )
        top3 = result.get_top_n_orientations(3)
        assert top3.shape == (3, 3)
        sorted_idx = np.argsort(result.distances)[:3]
        np.testing.assert_array_equal(
            top3, result.candidate_orientations[sorted_idx]
        )
        assert result.get_top_n_orientations(10).shape == (5, 3)

    def test_no_distances(self):
        result = OrientationResult(
            query_vector=RNG.random(16),
            best_orientation=np.array([30.0, 45.0, 60.0]),
            candidate_orientations=RNG.random((5, 3)) * 360,
            distances=None,
        )
        np.testing.assert_array_equal(
            result.get_top_n_orientations(2), result.candidate_orientations[:2]
        )


class TestEdgeCases:
    def test_single_entry_dictionary(self, db):
        """K=1 candidate: consensus degenerates gracefully."""
        db.add_vectors(RNG.random((1, 16)), RNG.random((1, 3)) * 360)
        result = db.find_best_orientation(
            RNG.random(16), top_n=5, orientation_threshold=5.0,
            min_required_matches=1, max_iterations=3,
        )
        assert result.candidate_orientations.shape == (1, 3)
        assert result.success  # the lone candidate matches itself

    def test_batch_progress_smoke(self, db, test_vectors):
        db.add_vectors(*test_vectors)
        results = db.find_best_orientations_batch(
            test_vectors[0], batch_size=2, top_n=3, min_required_matches=1,
            progress=True,
        )
        assert len(results) == 5
