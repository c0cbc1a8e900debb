"""Exact k-NN correctness vs numpy brute force (the FAISS-parity check)."""

import jax.numpy as jnp
import numpy as np

from latice_tpu.index import cosine_topk, cosine_topk_blocked, l2_normalize

RNG = np.random.default_rng(0)


def brute_force_cosine_topk(queries, dictionary, k):
    q = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    d = dictionary / np.linalg.norm(dictionary, axis=1, keepdims=True)
    scores = q @ d.T
    idx = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


class TestCosineTopK:
    def test_matches_brute_force(self):
        d = RNG.normal(size=(500, 16)).astype(np.float32)
        q = RNG.normal(size=(7, 16)).astype(np.float32)
        dn = np.asarray(l2_normalize(jnp.asarray(d)))
        scores, idx = cosine_topk(jnp.asarray(q), jnp.asarray(dn), 20)
        want_scores, want_idx = brute_force_cosine_topk(q, d, 20)
        np.testing.assert_allclose(np.asarray(scores), want_scores, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)

    def test_self_query_is_top1(self):
        d = RNG.normal(size=(100, 16)).astype(np.float32)
        dn = np.asarray(l2_normalize(jnp.asarray(d)))
        scores, idx = cosine_topk(jnp.asarray(d[42:43]), jnp.asarray(dn), 5)
        assert int(idx[0, 0]) == 42
        assert float(scores[0, 0]) > 0.999

    def test_zero_norm_guard(self):
        v = np.zeros((2, 16), np.float32)
        out = np.asarray(l2_normalize(jnp.asarray(v)))
        assert np.all(np.isfinite(out))

    def test_blocked_matches_unblocked(self):
        d = RNG.normal(size=(1000, 16)).astype(np.float32)
        q = RNG.normal(size=(5, 16)).astype(np.float32)
        dn = jnp.asarray(np.asarray(l2_normalize(jnp.asarray(d))))
        s1, i1 = cosine_topk(jnp.asarray(q), dn, 10)
        s2, i2 = cosine_topk_blocked(jnp.asarray(q), dn, 10, block_size=256)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_blocked_nondivisible_block(self):
        d = RNG.normal(size=(333, 16)).astype(np.float32)
        q = RNG.normal(size=(3, 16)).astype(np.float32)
        dn = jnp.asarray(np.asarray(l2_normalize(jnp.asarray(d))))
        s1, i1 = cosine_topk(jnp.asarray(q), dn, 7)
        s2, i2 = cosine_topk_blocked(jnp.asarray(q), dn, 7, block_size=128)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_blocked_negative_similarity_dictionary(self):
        """Padded rows must never outrank genuine negative-score matches.

        Every dictionary row is anti-correlated with the query (all real
        cosine scores < 0) and N is non-divisible by the block size, so a
        zero-row pad (score 0) would incorrectly win the top-k."""
        base = RNG.normal(size=16).astype(np.float32)
        q = base + RNG.normal(size=(4, 16)).astype(np.float32) * 0.05
        d = -base + RNG.normal(size=(333, 16)).astype(np.float32) * 0.05
        dn = jnp.asarray(np.asarray(l2_normalize(jnp.asarray(d))))
        s1, i1 = cosine_topk(jnp.asarray(q), dn, 7)
        s2, i2 = cosine_topk_blocked(jnp.asarray(q), dn, 7, block_size=128)
        assert np.all(np.asarray(s1) < 0)  # the scenario is real
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


class TestInt8Engine:
    def test_recall_vs_exact(self):
        from latice_tpu.index import cosine_topk_int8, quantize_dictionary_int8

        d = RNG.normal(size=(2000, 16)).astype(np.float32)
        dn = np.asarray(l2_normalize(jnp.asarray(d)))
        q = dn[:32] + RNG.normal(size=(32, 16)).astype(np.float32) * 0.05

        s_exact, i_exact = cosine_topk(jnp.asarray(q), jnp.asarray(dn), 10)
        dq, _ = quantize_dictionary_int8(dn)
        s_q, i_q = cosine_topk_int8(jnp.asarray(q), dq, 10)

        # top-1 must be identical for near-duplicate queries
        np.testing.assert_array_equal(np.asarray(i_q[:, 0]), np.asarray(i_exact[:, 0]))
        # recall@10 against exact top-10
        recall = np.mean([
            len(set(np.asarray(i_q[b])) & set(np.asarray(i_exact[b]))) / 10
            for b in range(32)
        ])
        assert recall > 0.85, recall
        # scores within quantization tolerance
        np.testing.assert_allclose(np.asarray(s_q), np.asarray(s_exact), atol=0.02)

    def test_db_int8_engine(self, tmp_path=None):
        import tempfile
        from latice_tpu.index import LatentVectorDatabaseConfig, TpuLatentVectorDatabase

        with tempfile.TemporaryDirectory() as td:
            db = TpuLatentVectorDatabase(
                LatentVectorDatabaseConfig(npz_path=f"{td}/q.npz", engine="int8")
            )
            vecs = RNG.normal(size=(100, 16))
            db.add_vectors(vecs, RNG.uniform(0, 360, (100, 3)))
            scores, idx = db.query_similar(vecs[7], n_results=5)
            assert idx[0] == 7
            assert scores[0] > 0.99


class TestApproxEngine:
    def test_recall_and_db_engine(self):
        import tempfile
        from latice_tpu.index import (
            LatentVectorDatabaseConfig,
            TpuLatentVectorDatabase,
            cosine_topk_approx,
        )

        d = RNG.normal(size=(4096, 16)).astype(np.float32)
        dn = np.asarray(l2_normalize(jnp.asarray(d)))
        q = dn[:16]
        s_ref, i_ref = cosine_topk(jnp.asarray(q), jnp.asarray(dn), 10)
        s_a, i_a = cosine_topk_approx(jnp.asarray(q), jnp.asarray(dn), 10)
        recall = np.mean([
            len(set(np.asarray(i_a[b])) & set(np.asarray(i_ref[b]))) / 10
            for b in range(16)
        ])
        assert recall > 0.9, recall

        with tempfile.TemporaryDirectory() as td:
            db = TpuLatentVectorDatabase(
                LatentVectorDatabaseConfig(npz_path=f"{td}/a.npz", engine="approx")
            )
            vecs = RNG.normal(size=(200, 16))
            db.add_vectors(vecs, RNG.uniform(0, 360, (200, 3)))
            scores, idx = db.query_similar(vecs[3], n_results=5)
            assert idx[0] == 3
