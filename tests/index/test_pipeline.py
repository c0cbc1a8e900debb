"""Fused IndexPipeline tests: equivalence with the list-based DB path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.index import (
    IndexPipeline,
    LatentVectorDatabaseConfig,
    TpuLatentVectorDatabase,
)
from latice_tpu.models import VariationalAutoEncoderRawData


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(1)
    model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=16)
    params = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 128, 128, 1)), jax.random.key(1)
    )["params"]
    # Clustered patterns so consensus genuinely succeeds.
    patterns, angles = [], []
    for g in range(10):
        base = rng.uniform(size=(128, 128))
        base_angle = rng.uniform([0, 20, 0], [340, 140, 340])
        for _ in range(5):
            patterns.append(base + rng.normal(size=(128, 128)) * 0.01)
            angles.append(base_angle + rng.uniform(-0.3, 0.3, 3))
    return model, params, np.asarray(patterns, np.float32), np.asarray(angles)


def encode_all(model, params, patterns):
    enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode")[0])
    return np.asarray(enc(params, jnp.asarray(patterns[..., None])))


class TestPipelineEquivalence:
    def test_matches_db_dense_path(self, setup, tmp_path):
        model, params, patterns, angles = setup
        latents = encode_all(model, params, patterns)
        vecs = latents / np.linalg.norm(latents, axis=1, keepdims=True)

        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path=str(tmp_path / "d.npz"))
        )
        db.add_vectors(latents, angles)
        dense = db.find_best_orientations_dense(
            latents, top_n=5, orientation_threshold=3.0, min_required_matches=4
        )

        pipe = IndexPipeline(
            model, params, vecs, angles,
            top_n=5, orientation_threshold=3.0, min_required_matches=4,
            batch_size=25,
        )
        out = pipe(patterns)

        np.testing.assert_array_equal(out.indices, dense["indices"])
        np.testing.assert_array_equal(out.success, dense["success"])
        np.testing.assert_allclose(out.scores, dense["scores"], atol=1e-4)
        ok = out.success
        np.testing.assert_allclose(
            out.mean_orientation[ok], dense["mean_orientation"][ok], atol=1e-2
        )

    def test_padding_chunking_consistent(self, setup):
        """batch_size smaller than input: padded chunks must equal one shot."""
        model, params, patterns, angles = setup
        latents = encode_all(model, params, patterns)
        vecs = latents / np.linalg.norm(latents, axis=1, keepdims=True)
        kw = dict(top_n=5, orientation_threshold=3.0, min_required_matches=4)
        small = IndexPipeline(model, params, vecs, angles, batch_size=8, **kw)
        large = IndexPipeline(model, params, vecs, angles, batch_size=50, **kw)
        a, b = small(patterns), large(patterns)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_array_equal(a.success, b.success)

    def test_failure_rows_nan_mean_top1_best(self, setup):
        model, params, patterns, angles = setup
        latents = encode_all(model, params, patterns)
        vecs = latents / np.linalg.norm(latents, axis=1, keepdims=True)
        # impossible threshold -> all failures
        pipe = IndexPipeline(
            model, params, vecs, angles,
            top_n=5, orientation_threshold=1e-6, min_required_matches=5,
            batch_size=25,
        )
        out = pipe(patterns[:5])
        assert not out.success.any()
        assert np.isnan(out.mean_orientation).all()
        assert np.isfinite(out.best_orientation).all()

    def test_n_similar_counts(self, setup):
        model, params, patterns, angles = setup
        latents = encode_all(model, params, patterns)
        vecs = latents / np.linalg.norm(latents, axis=1, keepdims=True)
        pipe = IndexPipeline(
            model, params, vecs, angles,
            top_n=5, orientation_threshold=3.0, min_required_matches=4,
            batch_size=50,
        )
        out = pipe(patterns)
        assert (out.n_similar[out.success] >= 4).all()


class TestNonFiniteGuard:
    def test_skip_nonfinite_updates(self):
        from latice_tpu.train import VAELoss, create_train_state, make_train_step

        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
        x = jnp.zeros((2, 128, 128, 1), jnp.float32)
        params = model.init({"params": jax.random.key(0)}, x, jax.random.key(1))[
            "params"
        ]
        state = create_train_state(model, params, learning_rate=1e-3)
        step = make_train_step(
            VAELoss(), donate=False, skip_nonfinite_updates=True
        )
        bad = jnp.full((2, 128, 128, 1), jnp.nan)
        new_state, metrics = step(state, bad, jax.random.key(0))
        assert float(metrics["skipped"]) == 1.0
        # parameters untouched
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        p1 = jax.tree_util.tree_leaves(new_state.params)[0]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        # a good batch still updates
        good = jnp.zeros((2, 128, 128, 1), jnp.float32) + 0.5
        new_state2, metrics2 = step(state, good, jax.random.key(0))
        assert float(metrics2["skipped"]) == 0.0
        p2 = jax.tree_util.tree_leaves(new_state2.params)[0]
        assert not np.array_equal(np.asarray(p0), np.asarray(p2))


class TestUint8InputPath:
    def test_uint8_matches_f32(self, setup):
        """uint8 patterns (native detector format, 4x less host-link traffic)
        normalize on device with /255 ToTensor semantics: results must equal
        feeding the same values as f32."""
        model, params, patterns, angles = setup
        latents = encode_all(model, params, patterns)
        vecs = latents / np.linalg.norm(latents, axis=1, keepdims=True)
        pipe = IndexPipeline(
            model, params, vecs, angles,
            top_n=5, orientation_threshold=3.0, min_required_matches=4,
            batch_size=25,
        )
        pu8 = np.clip(np.round(patterns * 255), 0, 255).astype(np.uint8)
        pf32 = pu8.astype(np.float32) / 255.0

        a, b = pipe(pu8), pipe(pf32)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_array_equal(a.success, b.success)
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-6)
        ok = a.success
        np.testing.assert_allclose(
            a.mean_orientation[ok], b.mean_orientation[ok], atol=1e-5
        )


class TestEmptyInput:
    def test_empty_stack_returns_empty_result(self):
        import jax

        from latice_tpu.models import VariationalAutoEncoderRawData

        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
        params = model.init(
            {"params": jax.random.key(0)},
            np.zeros((1, 128, 128, 1), np.float32),
            jax.random.key(1),
        )["params"]
        vecs = np.eye(6, 8, dtype=np.float32)
        angles = np.tile([10.0, 30.0, 50.0], (6, 1))
        pipe = IndexPipeline(model, params, vecs, angles, top_n=4, batch_size=4)
        res = pipe(np.zeros((0, 128, 128), np.float32))
        assert len(res.success) == 0
        assert res.indices.shape == (0, 4)
        assert res.phase is None
