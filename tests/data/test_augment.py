"""Training augmentation: op semantics + fused train-step behavior.

The reference trains unaugmented (deterministic transform only,
reference data_module.py:17-33); this subsystem is beyond-reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.data.augment import AugmentConfig, make_augment_fn


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0.2, 0.8, size=(8, 16, 16, 1)).astype(np.float32))


class TestOps:
    def test_noise_std(self, batch):
        fn = jax.jit(make_augment_fn(AugmentConfig(noise_std=0.1)))
        out = np.asarray(fn(jax.random.key(0), batch))
        resid = out - np.asarray(batch)
        assert resid.std() == pytest.approx(0.1, rel=0.1)
        assert abs(resid.mean()) < 0.01

    def test_intensity_scale_per_sample(self, batch):
        fn = jax.jit(make_augment_fn(AugmentConfig(intensity_range=(0.5, 2.0))))
        out = np.asarray(fn(jax.random.key(1), batch))
        scales = out / np.asarray(batch)
        per = scales.reshape(8, -1)
        # One scale per sample, constant within the pattern.
        assert np.allclose(per.std(axis=1), 0, atol=1e-5)
        assert per[:, 0].std() > 0.1  # and it varies across samples

    def test_gamma_preserves_range(self, batch):
        fn = jax.jit(make_augment_fn(AugmentConfig(gamma_range=(0.7, 1.4))))
        out = np.asarray(fn(jax.random.key(2), batch))
        assert out.min() >= 0 and out.max() <= 1.0
        assert not np.allclose(out, np.asarray(batch))

    def test_shift_moves_content(self, batch):
        fn = jax.jit(make_augment_fn(AugmentConfig(shift_px=3)))
        out = np.asarray(fn(jax.random.key(3), batch))
        assert out.shape == batch.shape
        # Some sample is shifted (content differs), but values come from the
        # original pattern's (edge-padded) pixel set.
        assert not np.allclose(out, np.asarray(batch))
        assert out.min() >= np.asarray(batch).min() - 1e-6
        assert out.max() <= np.asarray(batch).max() + 1e-6

    def test_deterministic_per_key(self, batch):
        fn = jax.jit(make_augment_fn(AugmentConfig(noise_std=0.05, shift_px=2)))
        a = np.asarray(fn(jax.random.key(7), batch))
        b = np.asarray(fn(jax.random.key(7), batch))
        c = np.asarray(fn(jax.random.key(8), batch))
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)

    def test_validation(self):
        with pytest.raises(ValueError, match="intensity_range"):
            make_augment_fn(AugmentConfig(intensity_range=(2.0, 1.0)))
        with pytest.raises(ValueError, match="shift_px"):
            make_augment_fn(AugmentConfig(shift_px=-1))
        # gamma <= 0 degenerates (0**0 == 1; negative gammas inf at zeros).
        with pytest.raises(ValueError, match="gamma_range must be positive"):
            make_augment_fn(AugmentConfig(gamma_range=(0.0, 1.4)))


class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        from latice_tpu.models import VariationalAutoEncoderRawData
        from latice_tpu.train import VAELoss, create_train_state

        rng = np.random.default_rng(1)
        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=4)
        x = jnp.asarray(rng.uniform(size=(4, 128, 128, 1)).astype(np.float32))
        params = model.init(
            {"params": jax.random.key(0)}, x[:1], jax.random.key(1)
        )["params"]
        state = create_train_state(model, params, learning_rate=1e-4)
        return VAELoss(kl_lambda=5e-6), state, x

    def test_augmented_step_differs_and_updates(self, setup):
        from latice_tpu.train import make_train_step

        loss_fn, state, x = setup
        plain = make_train_step(loss_fn, donate=False)
        aug = make_train_step(
            loss_fn,
            donate=False,
            augment=make_augment_fn(AugmentConfig(noise_std=0.2)),
        )
        key = jax.random.key(2)
        _, m_plain = plain(state, x, key)
        _, m_aug = aug(state, x, key)
        assert float(m_plain["loss"]) != float(m_aug["loss"])
        assert np.isfinite(float(m_aug["loss"]))

    def test_denoising_targets_clean_batch(self, setup):
        """Denoising mode reconstructs the ORIGINAL batch: with a huge
        perturbation the two objectives must diverge."""
        from latice_tpu.train import make_train_step

        loss_fn, state, x = setup
        fn = make_augment_fn(AugmentConfig(offset_range=(5.0, 5.0)))
        plain = make_train_step(loss_fn, donate=False, augment=fn)
        deno = make_train_step(loss_fn, donate=False, augment=fn, denoising=True)
        key = jax.random.key(3)
        _, m_plain = plain(state, x, key)
        _, m_deno = deno(state, x, key)
        assert float(m_plain["recon_loss"]) != float(m_deno["recon_loss"])

    def test_trainer_accepts_config(self, setup, tmp_path):
        from latice_tpu.train.trainer import Trainer

        t = Trainer(max_epochs=1, augment=AugmentConfig(noise_std=0.1),
                    enable_progress_bar=False, recon_figure=False)
        assert callable(t.augment)
        with pytest.raises(TypeError, match="AugmentConfig"):
            Trainer(augment="noise")

    def test_trainer_augment_from_config_tree(self):
        """The hydra-style engine instantiates AugmentConfig recursively, so
        augmentation is reachable from conf yaml without code changes."""
        from latice_tpu.config.engine import instantiate

        t = instantiate(
            {
                "_target_": "latice_tpu.train.trainer.Trainer",
                "max_epochs": 1,
                "enable_progress_bar": False,
                "recon_figure": False,
                "denoising": True,
                "augment": {
                    "_target_": "latice_tpu.data.AugmentConfig",
                    "noise_std": 0.05,
                    "shift_px": 2,
                },
            }
        )
        assert callable(t.augment) and t.denoising

    def test_augmented_step_on_mesh_matches_replicated_math(self, setup):
        """The augment ops are per-sample, so a batch-sharded step must give
        the same loss as the unsharded step (same keys, same math)."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        from latice_tpu.train import make_train_step

        loss_fn, state, x = setup
        if jax.device_count() < 2:
            pytest.skip("needs the multi-device CPU mesh")
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        fn = make_augment_fn(AugmentConfig(noise_std=0.1, shift_px=1))
        step = make_train_step(loss_fn, donate=False, augment=fn)
        key = jax.random.key(5)
        _, m_single = step(state, x, key)
        xs = jax.device_put(x, NamedSharding(mesh, PartitionSpec("data")))
        _, m_mesh = step(state, xs, key)
        assert float(m_single["loss"]) == pytest.approx(
            float(m_mesh["loss"]), rel=1e-5
        )
