"""Fused matmul+top-k kernel: exact parity with the XLA engine.

The kernel must be a drop-in for `knn.cosine_topk` (faiss IndexFlat
semantics, faiss_db.py:135-139/251): identical scores AND identical
indices, including `lax.top_k`'s stable lowest-index-first tie order.
Runs in Pallas interpreter mode on the CPU test mesh.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.index.knn import cosine_topk, l2_normalize
from latice_tpu.ops.topk_fused import cosine_topk_fused

RNG = np.random.default_rng(42)


def _random_case(b, n, d=16):
    q = RNG.normal(size=(b, d)).astype(np.float32)
    dic = np.asarray(l2_normalize(RNG.normal(size=(n, d)).astype(np.float32)))
    return jnp.asarray(q), jnp.asarray(dic)


class TestFusedTopK:
    @pytest.mark.parametrize(
        "b,n,tile_b,tile_n,d",
        [
            (8, 256, 8, 128, 16),     # exact tiling
            (12, 300, 8, 128, 16),    # B and N both ragged
            (16, 100, 8, 256, 16),    # single ragged N tile
            (8, 129, 8, 128, 16),     # N pad with one leftover column
            (8, 256, 8, 128, 64),     # scaled-flagship latent width
        ],
    )
    def test_matches_xla_exact(self, b, n, tile_b, tile_n, d):
        q, dic = _random_case(b, n, d=d)
        want_s, want_i = cosine_topk(q, dic, k=10)
        got_s, got_i = cosine_topk_fused(
            q, dic, k=10, tile_b=tile_b, tile_n=tile_n, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(want_s), rtol=1e-6, atol=1e-6
        )

    def test_tie_breaking_lowest_index_first(self):
        # Duplicate dictionary rows => exactly tied scores; lax.top_k's
        # stable order returns the lower index first and so must we.
        base = np.asarray(
            l2_normalize(RNG.normal(size=(7, 16)).astype(np.float32))
        )
        dic = np.concatenate([base, base, base], axis=0)  # every row x3
        q = base[:3] + 0.0
        want_s, want_i = cosine_topk(jnp.asarray(q), jnp.asarray(dic), k=6)
        got_s, got_i = cosine_topk_fused(
            jnp.asarray(q), jnp.asarray(dic), k=6,
            tile_b=8, tile_n=128, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(want_s), rtol=1e-6
        )

    def test_negative_similarities_beat_padding(self):
        # All-negative scores: zero-padded dictionary rows (score 0) must
        # not leak into the results (knn.py:133-135 guard, same here).
        q = jnp.asarray(np.ones((8, 16), np.float32))
        dic = np.asarray(
            l2_normalize(-np.abs(RNG.normal(size=(130, 16))) - 0.1)
        ).astype(np.float32)
        got_s, got_i = cosine_topk_fused(
            q, jnp.asarray(dic), k=5, tile_b=8, tile_n=128, interpret=True
        )
        assert np.all(np.asarray(got_s) < 0)
        assert np.all(np.asarray(got_i) < 130)

    def test_k_larger_than_dictionary_raises(self):
        q, dic = _random_case(4, 8)
        with pytest.raises(ValueError, match="exceeds dictionary"):
            cosine_topk_fused(q, dic, k=16, interpret=True)

    def test_oversized_k_raises_with_guidance(self):
        q, dic = _random_case(4, 200)
        with pytest.raises(ValueError, match="k <= ~32"):
            cosine_topk_fused(q, dic, k=100, interpret=True)

    def test_early_exit_variants_identical(self):
        q, dic = _random_case(16, 700)
        a = cosine_topk_fused(
            q, dic, k=10, tile_b=8, tile_n=256, interpret=True,
            early_exit=True,
        )
        b = cosine_topk_fused(
            q, dic, k=10, tile_b=8, tile_n=256, interpret=True,
            early_exit=False,
        )
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_n_valid_masks_trailing_padding(self):
        # The sharded path's shards carry zero-padded trailing rows
        # (parallel.shard_dictionary); n_valid must exclude them even when
        # every genuine score is negative (a zero row scores 0.0).
        q = jnp.asarray(np.ones((8, 16), np.float32))
        real = np.asarray(
            l2_normalize(-np.abs(RNG.normal(size=(90, 16))) - 0.1)
        ).astype(np.float32)
        dic = np.concatenate([real, np.zeros((38, 16), np.float32)])
        got_s, got_i = cosine_topk_fused(
            q, jnp.asarray(dic), k=5, tile_b=8, tile_n=128,
            interpret=True, n_valid=90,
        )
        ref_s, ref_i = cosine_topk(q, jnp.asarray(real), k=5)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(ref_s), rtol=1e-6, atol=1e-6
        )
