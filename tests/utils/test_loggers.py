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
