"""Trainer integration: 2-epoch fit on synthetic data, checkpoints, logging."""

import numpy as np
import pytest

from latice_tpu.data import DPDataModule
from latice_tpu.models import VariationalAutoEncoderRawData
from latice_tpu.train.checkpoint import CheckpointManager, load_params, save_params
from latice_tpu.train.module import VAEModule
from latice_tpu.train.trainer import Trainer
from latice_tpu.utils.loggers import CSVLogger


@pytest.fixture
def synthetic_data(tmp_path):
    rng = np.random.default_rng(0)
    n = 24
    patterns = rng.uniform(size=(n, 128, 128)).astype(np.float64)
    angles = rng.uniform(0, 360, size=(n, 3))
    ppath = tmp_path / "p.npy"
    np.save(ppath, patterns)
    apath = tmp_path / "a.txt"
    apath.write_text(
        "eu\n%d\n" % n + "".join(f"{a[0]} {a[1]} {a[2]}\n" for a in angles)
    )
    return ppath, apath


class TestTrainerFit:
    def test_two_epoch_fit(self, synthetic_data, tmp_path):
        ppath, apath = synthetic_data
        dm = DPDataModule(ppath, apath, batch_size=8, val_data_ratio=0.25)
        module = VAEModule(
            VariationalAutoEncoderRawData(inplanes=2, latent_dim=8),
            kl_lambda=5e-6,
        )
        trainer = Trainer(
            max_epochs=2,
            precision="32",
            logger=CSVLogger(tmp_path / "logs"),
            checkpoint_dir=tmp_path / "ckpts",
            log_every_n_steps=1,
            recon_figure=True,
        )
        state = trainer.fit(module, dm)

        assert int(state.step) == 2 * 3  # 18 train samples / batch 8 -> 3 steps
        assert len(trainer.history) == 2
        for key in ("Epoch_train_loss", "Epoch_val_loss", "Epoch_val_recon_loss"):
            assert key in trainer.history[0], trainer.history[0]
        # second epoch should not be worse by much (sanity, not strict)
        assert np.isfinite(trainer.history[1]["Epoch_train_loss"])

        # CSV log written with the reference metric names
        csv_text = (tmp_path / "logs" / "metrics.csv").read_text()
        assert "Epoch_val_loss" in csv_text
        assert "elbo" in csv_text

        # checkpoints: epoch dirs + last + manifest
        assert (tmp_path / "ckpts" / "last").exists()
        assert (tmp_path / "ckpts" / "manifest.json").exists()

        # reconstruction figure was logged
        images = list((tmp_path / "logs" / "images").glob("*.png"))
        assert images, "expected reconstruction figure png"

    def test_bf16_epoch(self, synthetic_data, tmp_path):
        ppath, apath = synthetic_data
        dm = DPDataModule(ppath, apath, batch_size=8, val_data_ratio=0.25)
        module = VAEModule(
            VariationalAutoEncoderRawData(inplanes=2, latent_dim=8), kl_lambda=5e-6
        )
        trainer = Trainer(
            max_epochs=1, precision="16-mixed", logger=None, recon_figure=False
        )
        state = trainer.fit(module, dm)
        assert np.isfinite(trainer.history[0]["Epoch_train_loss"])


class TestTrainerTestPlane:
    def test_collects_mu_embeddings(self, synthetic_data, tmp_path):
        """Trainer.test mirrors the reference test plane: encoder means over
        the full dataset, concatenated into trainer.latent
        (lightning_module.py:348-357)."""
        import jax
        import jax.numpy as jnp

        ppath, apath = synthetic_data
        dm = DPDataModule(ppath, apath, batch_size=10, val_data_ratio=0.25)
        module = VAEModule(
            VariationalAutoEncoderRawData(inplanes=2, latent_dim=8), kl_lambda=5e-6
        )
        trainer = Trainer(max_epochs=1, precision="32", logger=None,
                          recon_figure=False, enable_progress_bar=False)
        state = trainer.fit(module, dm)

        latents = trainer.test(module, dm)
        assert latents.shape == (24, 8)  # full dataset (setup("test") alias)
        assert latents is trainer.latent

        # Parity with a direct whole-stack encode (padded batches must not
        # leak pad rows into the output).
        dm.setup("test")
        x = jnp.asarray(dm.dataset_test.patterns, jnp.float32)
        mu, _ = module.model.apply(
            {"params": state.params}, x, method="encode"
        )
        np.testing.assert_allclose(latents, np.asarray(mu), atol=1e-5)

    def test_requires_state(self, synthetic_data):
        ppath, apath = synthetic_data
        dm = DPDataModule(ppath, apath, batch_size=10)
        module = VAEModule(
            VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
        )
        t = Trainer(max_epochs=1, precision="32")
        with pytest.raises(RuntimeError, match="fit"):
            t.test(module, dm)


class TestCheckpointManager:
    def test_topk_pruning(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "ck", save_top_k=2, monitor="m")
        params = {"w": np.arange(4.0)}
        for epoch, metric in enumerate([5.0, 3.0, 4.0, 1.0]):
            mgr.save(epoch, params, {"m": metric})
        kept = {p.name for p in (tmp_path / "ck").glob("epoch_*")}
        assert kept == {"epoch_1", "epoch_3"}  # best two metrics: 3.0, 1.0
        assert mgr.best_epoch() == 3

    def test_roundtrip(self, tmp_path):
        params = {"w": np.arange(4.0), "b": np.ones((2, 2))}
        save_params(tmp_path / "p", params)
        restored = load_params(tmp_path / "p", params)
        np.testing.assert_array_equal(restored["w"], params["w"])
        np.testing.assert_array_equal(restored["b"], params["b"])

    def test_load_best_and_last(self, tmp_path):
        mgr = CheckpointManager(tmp_path / "ck", save_top_k=2, monitor="m")
        for epoch, metric in enumerate([2.0, 1.0, 3.0]):
            mgr.save(epoch, {"w": np.full(3, float(epoch))}, {"m": metric})
        best = mgr.load_best({"w": np.zeros(3)})
        np.testing.assert_array_equal(best["w"], np.full(3, 1.0))
        last = mgr.load_last({"w": np.zeros(3)})
        np.testing.assert_array_equal(last["w"], np.full(3, 2.0))


class TestResume:
    def test_resume_continues_with_optimizer_state(self, synthetic_data, tmp_path):
        """Two 1-epoch runs with resume must reach epoch 2 state (full
        optimizer moments restored), matching Lightning's ckpt_path='last'."""
        ppath, apath = synthetic_data

        def make():
            dm = DPDataModule(ppath, apath, batch_size=8, val_data_ratio=0.25)
            module = VAEModule(
                VariationalAutoEncoderRawData(inplanes=2, latent_dim=8),
                kl_lambda=5e-6,
            )
            return dm, module

        dm, module = make()
        t1 = Trainer(max_epochs=1, precision="32", checkpoint_dir=tmp_path / "ck",
                     logger=None, recon_figure=False)
        state1 = t1.fit(module, dm)
        assert int(state1.step) == 3

        dm, module = make()
        t2 = Trainer(max_epochs=2, precision="32", checkpoint_dir=tmp_path / "ck",
                     logger=None, recon_figure=False)
        state2 = t2.fit(module, dm, resume=True)
        assert t2.start_epoch == 1
        assert int(state2.step) == 6  # continued, not restarted

    def test_resume_without_checkpoint_starts_fresh(self, synthetic_data, tmp_path):
        ppath, apath = synthetic_data
        dm = DPDataModule(ppath, apath, batch_size=8, val_data_ratio=0.25)
        module = VAEModule(
            VariationalAutoEncoderRawData(inplanes=2, latent_dim=8), kl_lambda=5e-6
        )
        t = Trainer(max_epochs=1, precision="32", checkpoint_dir=tmp_path / "empty",
                    logger=None, recon_figure=False)
        state = t.fit(module, dm, resume=True)
        assert t.start_epoch == 0
        assert int(state.step) == 3
