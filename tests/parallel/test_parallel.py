"""Multi-device tests on the 8-device virtual CPU mesh (see conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.index import cosine_topk, l2_normalize
from latice_tpu.models import VariationalAutoEncoderRawData
from latice_tpu.parallel import (
    make_mesh,
    replicate_state,
    shard_batch,
    shard_dictionary,
    sharded_cosine_topk,
)
from latice_tpu.train import VAELoss, create_train_state, make_train_step

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


class TestMesh:
    def test_make_mesh_size(self, mesh):
        assert mesh.devices.size == 8
        assert mesh.axis_names == ("data",)

    def test_make_mesh_too_many(self):
        with pytest.raises(ValueError, match="devices"):
            make_mesh(10_000)

    def test_shard_batch_divisibility(self, mesh):
        with pytest.raises(ValueError, match="divisible"):
            shard_batch(jnp.zeros((7, 4)), mesh)

    def test_shard_batch_placement(self, mesh):
        x = shard_batch(jnp.arange(16.0).reshape(16, 1), mesh)
        assert len(x.sharding.device_set) == 8
        np.testing.assert_array_equal(
            np.asarray(x), np.arange(16.0).reshape(16, 1)
        )


class TestShardedKNN:
    def test_matches_single_device(self, mesh):
        d = RNG.normal(size=(1024, 16)).astype(np.float32)
        q = RNG.normal(size=(5, 16)).astype(np.float32)
        dn = np.asarray(l2_normalize(jnp.asarray(d)))

        s_ref, i_ref = cosine_topk(jnp.asarray(q), jnp.asarray(dn), 10)
        d_sharded = shard_dictionary(jnp.asarray(dn), mesh)
        s_got, i_got = sharded_cosine_topk(jnp.asarray(q), d_sharded, 10, mesh)

        np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), atol=1e-6)

    def test_nondivisible_dictionary_padded(self, mesh):
        d = RNG.normal(size=(1000, 16)).astype(np.float32)  # not /8
        q = RNG.normal(size=(3, 16)).astype(np.float32)
        dn = np.asarray(l2_normalize(jnp.asarray(d)))
        s_ref, i_ref = cosine_topk(jnp.asarray(q), jnp.asarray(dn), 7)
        d_sharded = shard_dictionary(jnp.asarray(dn), mesh)
        s_got, i_got = sharded_cosine_topk(
            jnp.asarray(q), d_sharded, 7, mesh, n_valid=1000
        )
        np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))

    def test_negative_similarity_padded_dictionary(self, mesh):
        """Pad rows must lose to genuine negative-score matches (all real
        cosine scores < 0 here, so a zero pad row scoring 0 would win)."""
        base = RNG.normal(size=16).astype(np.float32)
        q = base + RNG.normal(size=(3, 16)).astype(np.float32) * 0.05
        d = -base + RNG.normal(size=(1001, 16)).astype(np.float32) * 0.05
        dn = np.asarray(l2_normalize(jnp.asarray(d)))
        s_ref, i_ref = cosine_topk(jnp.asarray(q), jnp.asarray(dn), 7)
        assert np.all(np.asarray(s_ref) < 0)
        d_sharded = shard_dictionary(jnp.asarray(dn), mesh)
        s_got, i_got = sharded_cosine_topk(
            jnp.asarray(q), d_sharded, 7, mesh, n_valid=1001
        )
        np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))
        np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref), atol=1e-6)


class TestDataParallelTraining:
    def test_dp_step_matches_single_device(self, mesh):
        """One DP step over 8 devices must equal the single-device step."""
        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
        x = jnp.asarray(RNG.uniform(size=(8, 128, 128, 1)), jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x[:1], jax.random.key(1))[
            "params"
        ]
        loss_fn = VAELoss(kl_lambda=5e-6)
        rng = jax.random.key(7)

        # Single-device reference.
        state1 = create_train_state(model, params, learning_rate=1e-3)
        step = make_train_step(loss_fn, donate=False)
        state1, m1 = step(state1, x, rng)

        # Data-parallel: shard batch, replicate state; same compiled step.
        state8 = replicate_state(
            create_train_state(model, params, learning_rate=1e-3), mesh
        )
        x8 = shard_batch(x, mesh)
        state8, m8 = step(state8, x8, rng)

        np.testing.assert_allclose(
            float(m8["loss"]), float(m1["loss"]), rtol=1e-5
        )
        # Updated parameters agree across the replicated/single paths.
        p1 = jax.tree_util.tree_leaves(state1.params)[0]
        p8 = jax.tree_util.tree_leaves(state8.params)[0]
        np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=1e-5)

    def test_multi_step_stability(self, mesh):
        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
        x = jnp.asarray(RNG.uniform(size=(16, 128, 128, 1)), jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x[:1], jax.random.key(1))[
            "params"
        ]
        state = replicate_state(
            create_train_state(model, params, learning_rate=1e-3), mesh
        )
        step = make_train_step(VAELoss(kl_lambda=5e-6), donate=False)
        xs = shard_batch(x, mesh)
        first = None
        for i in range(5):
            state, m = step(state, xs, jax.random.key(0))
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out[0].shape[0] == 8

    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestShardedPipeline:
    def test_mesh_pipeline_matches_single_device(self, mesh):
        """IndexPipeline(mesh=...) must reproduce the unsharded pipeline."""
        import jax.numpy as jnp
        from latice_tpu.index import IndexPipeline

        rng = np.random.default_rng(3)
        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=16)
        params = model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 128, 128, 1)),
            jax.random.key(1),
        )["params"]
        N = 256
        dv = rng.normal(size=(N, 16)).astype(np.float32)
        dv /= np.linalg.norm(dv, axis=1, keepdims=True)
        do = rng.uniform([0, 20, 0], [340, 140, 340], size=(N, 3))
        patterns = rng.uniform(size=(8, 128, 128)).astype(np.float32)

        kw = dict(top_n=10, orientation_threshold=3.0, min_required_matches=2,
                  batch_size=8)
        single = IndexPipeline(model, params, dv, do, **kw)(patterns)
        sharded = IndexPipeline(model, params, dv, do, mesh=mesh, **kw)(patterns)

        np.testing.assert_array_equal(sharded.indices, single.indices)
        np.testing.assert_allclose(sharded.scores, single.scores, atol=1e-5)
        np.testing.assert_array_equal(sharded.success, single.success)
        np.testing.assert_allclose(
            sharded.best_orientation, single.best_orientation, atol=1e-3
        )
