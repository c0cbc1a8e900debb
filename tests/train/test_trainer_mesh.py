"""Trainer.fit over a device mesh with non-divisible dataset sizes.

The gap this pins (round-1 verdict): DP was proven at step level only, while
real datasets produce partial tail batches that must neither crash the
mesh sharding nor trigger extra XLA compiles. 143 samples at batch 16 over
8 devices gives a 15-row train tail and a 14-row val set — both padded to
the static shape with masked rows.
"""

import jax
import numpy as np
import pytest

from latice_tpu.data import DPDataModule
from latice_tpu.models import VariationalAutoEncoderRawData
from latice_tpu.parallel import make_mesh
from latice_tpu.train.module import VAEModule
from latice_tpu.train.trainer import Trainer

N_SAMPLES = 143  # deliberately not divisible by batch 16 (or by 16*8)
BATCH = 16


@pytest.fixture(scope="module")
def synthetic_files(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("meshdata")
    rng = np.random.default_rng(5)
    patterns = rng.uniform(size=(N_SAMPLES, 128, 128)).astype(np.float64)
    angles = rng.uniform(0, 360, size=(N_SAMPLES, 3))
    ppath = tmp_path / "p.npy"
    np.save(ppath, patterns)
    apath = tmp_path / "a.txt"
    apath.write_text(
        "eu\n%d\n" % N_SAMPLES + "".join(f"{a[0]} {a[1]} {a[2]}\n" for a in angles)
    )
    return ppath, apath


def _make(ppath, apath, **trainer_kw):
    dm = DPDataModule(ppath, apath, batch_size=BATCH, val_data_ratio=0.1)
    module = VAEModule(
        VariationalAutoEncoderRawData(inplanes=2, latent_dim=8), kl_lambda=5e-6
    )
    trainer = Trainer(precision="32", recon_figure=False,
                      enable_progress_bar=False, **trainer_kw)
    return dm, module, trainer


class TestMeshFit:
    def test_two_epochs_nondivisible_with_resume(self, synthetic_files, tmp_path):
        """Full fit loop on the 8-device mesh: padded tails, single compile
        per step fn, checkpoint + resume under the mesh."""
        ppath, apath = synthetic_files
        mesh = make_mesh(8)

        dm, module, trainer = _make(
            ppath, apath, max_epochs=2, mesh=mesh, checkpoint_dir=tmp_path / "ck"
        )
        state = trainer.fit(module, dm)

        # 129 train samples -> 9 batches/epoch (last = 1 row, padded to 16).
        assert dm.train_size == 129 and dm.val_size == 14
        assert int(state.step) == 2 * 9
        assert len(trainer.history) == 2
        assert np.isfinite(trainer.history[-1]["Epoch_val_loss"])

        # Pad-never-recompile: one trace per step function despite the tails.
        assert trainer._train_step._cache_size() == 1
        assert trainer._eval_step._cache_size() == 1

        # Resume from `last` under the mesh, one more epoch.
        dm2, module2, t2 = _make(
            ppath, apath, max_epochs=3, mesh=mesh, checkpoint_dir=tmp_path / "ck"
        )
        state2 = t2.fit(module2, dm2, resume=True)
        assert t2.start_epoch == 2
        assert int(state2.step) == 3 * 9

    def test_batch_size_must_divide_mesh(self, synthetic_files):
        ppath, apath = synthetic_files
        mesh = make_mesh(8)
        dm = DPDataModule(ppath, apath, batch_size=12, val_data_ratio=0.1)
        module = VAEModule(
            VariationalAutoEncoderRawData(inplanes=2, latent_dim=8), kl_lambda=5e-6
        )
        t = Trainer(max_epochs=1, precision="32", mesh=mesh,
                    enable_progress_bar=False, recon_figure=False)
        with pytest.raises(ValueError, match="divide"):
            t.fit(module, dm)


class TestReproducibility:
    def test_same_seed_same_metrics(self, synthetic_files):
        """Fresh fits with one seed agree exactly; epoch-seeded shuffle +
        step-folded train keys + (epoch, batch)-folded val keys are all
        deterministic (reference intent: seeded runs, train.py:46-56)."""
        ppath, apath = synthetic_files
        histories = []
        for _ in range(2):
            dm, module, t = _make(ppath, apath, max_epochs=2, seed=7)
            t.fit(module, dm)
            histories.append(t.history)
        for h1, h2 in zip(*histories):
            for key in h1:
                if key == "epoch_time_s":
                    continue
                assert h1[key] == h2[key], key

    def test_resume_reproduces_uninterrupted_run(self, synthetic_files, tmp_path):
        """1 epoch + resume for a 2nd must equal an uninterrupted 2-epoch fit
        (same shuffle order, same keys, same optimizer state)."""
        ppath, apath = synthetic_files

        dm, module, t_full = _make(
            ppath, apath, max_epochs=2, seed=3, checkpoint_dir=tmp_path / "full"
        )
        state_full = t_full.fit(module, dm)

        dm1, module1, t1 = _make(
            ppath, apath, max_epochs=1, seed=3, checkpoint_dir=tmp_path / "part"
        )
        t1.fit(module1, dm1)
        dm2, module2, t2 = _make(
            ppath, apath, max_epochs=2, seed=3, checkpoint_dir=tmp_path / "part"
        )
        state_resumed = t2.fit(module2, dm2, resume=True)

        assert t_full.history[1]["Epoch_train_loss"] == pytest.approx(
            t2.history[0]["Epoch_train_loss"], rel=1e-6
        )
        p_full = jax.tree_util.tree_leaves(state_full.params)[0]
        p_res = jax.tree_util.tree_leaves(state_resumed.params)[0]
        np.testing.assert_allclose(np.asarray(p_res), np.asarray(p_full), atol=1e-6)

    def test_val_rng_varies_across_epochs(self, synthetic_files):
        """Val keys fold (epoch, batch): per-epoch val losses must not be
        bitwise-identical on frozen params (constant-key regression)."""
        ppath, apath = synthetic_files
        from latice_tpu.train.state import make_optimizer

        dm, module, t = _make(ppath, apath, max_epochs=2, seed=1)
        # Freeze learning so val differences can only come from the RNG.
        module.tx = make_optimizer(learning_rate=0.0)
        t.fit(module, dm)
        assert (
            t.history[0]["Epoch_val_loss"] != t.history[1]["Epoch_val_loss"]
        )
