"""Logger tests: CSV schema widening, multi-logger fan-out, manifest reload."""

import csv

import numpy as np
import pytest

from latice_tpu.utils.loggers import CSVLogger, MultiLogger, make_default_logger


class TestCSVLogger:
    def test_header_widening_preserves_rows(self, tmp_path):
        """Adding new metric names mid-run rewrites the header, keeps old rows."""
        lg = CSVLogger(tmp_path)
        lg.log_metrics({"loss": 1.0}, step=0)
        lg.log_metrics({"loss": 0.5, "val_loss": 0.7}, step=1)
        with open(tmp_path / "metrics.csv") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        assert rows[0]["loss"] == "1.0"
        assert rows[0].get("val_loss") in ("", None)
        assert rows[1]["val_loss"] == "0.7"

    def test_log_image_writes_png(self, tmp_path):
        lg = CSVLogger(tmp_path)
        img = (np.random.default_rng(0).uniform(size=(8, 8, 4)) * 255).astype(
            np.uint8
        )
        lg.log_image("recon/check", img, step=3)
        assert (tmp_path / "images" / "recon_check_3.png").exists()


class TestMultiLogger:
    def test_fan_out(self, tmp_path):
        a, b = CSVLogger(tmp_path / "a"), CSVLogger(tmp_path / "b")
        multi = MultiLogger([a, b])
        multi.log_metrics({"x": 1.0}, 0)
        multi.finalize()
        assert (tmp_path / "a" / "metrics.csv").exists()
        assert (tmp_path / "b" / "metrics.csv").exists()

    def test_default_logger_builds(self, tmp_path):
        lg = make_default_logger(tmp_path, tensorboard=False)
        lg.log_metrics({"m": 2.0}, 1)
        assert (tmp_path / "metrics.csv").exists()


class TestWandbLogger:
    def _mock_wandb(self, monkeypatch, calls):
        """Install a minimal fake wandb module."""
        import sys
        import types

        fake = types.ModuleType("wandb")

        class Run:
            def finish(self):
                calls.append(("finish",))

        def init(**kw):
            calls.append(("init", kw))
            return Run()

        fake.init = init
        fake.log = lambda data, step=None: calls.append(("log", data, step))
        fake.Image = lambda arr: ("image", arr.shape)
        monkeypatch.setitem(sys.modules, "wandb", fake)

    def test_config_selectable_wandb(self, tmp_path, monkeypatch):
        """wandb=true + project in the trainer config reaches WandbLogger with
        the reference's project name (reference conf/trainer/default.yaml:17-20)."""
        calls = []
        self._mock_wandb(monkeypatch, calls)
        lg = make_default_logger(
            tmp_path, tensorboard=False, wandb=True, project="VAE_Training"
        )
        assert calls[0][0] == "init"
        assert calls[0][1]["project"] == "VAE_Training"
        lg.log_metrics({"elbo": 1.5}, 7)
        assert ("log", {"elbo": 1.5}, 7) in calls
        lg.finalize()
        assert ("finish",) in calls

    def test_missing_wandb_degrades(self, tmp_path, monkeypatch):
        import builtins
        import sys

        monkeypatch.delitem(sys.modules, "wandb", raising=False)
        real_import = builtins.__import__

        def no_wandb(name, *a, **kw):
            if name == "wandb":
                raise ImportError("no wandb")
            return real_import(name, *a, **kw)

        monkeypatch.setattr(builtins, "__import__", no_wandb)
        lg = make_default_logger(tmp_path, tensorboard=False, wandb=True)
        lg.log_metrics({"m": 1.0}, 0)  # CSV still works
        assert (tmp_path / "metrics.csv").exists()


class TestProgressBar:
    def test_plain_fallback_renders(self):
        import io

        from latice_tpu.utils.progress import EpochProgressBar

        stream = io.StringIO()
        bar = EpochProgressBar(epoch=1, total=3, stream=stream)
        bar._rich = None  # force the plain \r path
        bar.step({"elbo": 0.75})
        bar.set_phase("val", total=2)
        bar.step({"val_loss": 0.5})
        bar.close()
        out = stream.getvalue()
        assert "epoch 1" in out and "elbo=0.75" in out and "val" in out

    def test_disabled_is_noop(self):
        from latice_tpu.utils.progress import make_progress_bar

        bar = make_progress_bar(False, 0)
        bar.step({"loss": 1.0})
        bar.set_phase("val")
        bar.close()


class TestCheckpointManifestReload:
    def test_manifest_survives_new_manager(self, tmp_path):
        from latice_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(tmp_path, save_top_k=2, monitor="m")
        for epoch, metric in enumerate([3.0, 1.0]):
            mgr.save(epoch, {"w": np.full(2, float(epoch))}, {"m": metric})

        mgr2 = CheckpointManager(tmp_path, save_top_k=2, monitor="m")
        assert mgr2.best_epoch() == 1
        # continuing to save prunes against the reloaded manifest
        mgr2.save(2, {"w": np.full(2, 2.0)}, {"m": 0.5})
        kept = {p.name for p in tmp_path.glob("epoch_*")}
        assert kept == {"epoch_1", "epoch_2"}


class TestConfigGuards:
    def test_interpolation_loop_detected(self, tmp_path):
        from latice_tpu.config import load_config

        (tmp_path / "c.yaml").write_text("a: ${b}\nb: ${a}\n")
        with pytest.raises((ValueError, RecursionError), match="loop|resolv"):
            load_config(tmp_path, "c.yaml")

    def test_override_missing_equals(self):
        from latice_tpu.config import apply_overrides

        with pytest.raises(ValueError, match="key=value"):
            apply_overrides({}, ["justakey"])
