"""Profiling utils and device helper tests."""

import time

import numpy as np

from latice_tpu.utils.device import get_device, get_platform
from latice_tpu.utils.profiling import PhaseTimer


class TestPhaseTimer:
    def test_accumulates_phases(self):
        timer = PhaseTimer(sync=False)
        for _ in range(3):
            with timer.phase("encode"):
                time.sleep(0.01)
        with timer.phase("knn"):
            time.sleep(0.01)
        report = timer.report()
        assert report["encode/count"] == 3
        assert report["knn/count"] == 1
        assert report["encode/total_s"] >= 0.03
        assert abs(report["encode/mean_s"] - report["encode/total_s"] / 3) < 1e-9

    def test_reset(self):
        timer = PhaseTimer(sync=False)
        with timer.phase("x"):
            pass
        timer.reset()
        assert timer.report() == {}

    def test_sync_mode_runs(self):
        timer = PhaseTimer(sync=True)
        with timer.phase("device"):
            import jax.numpy as jnp

            _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        assert timer.report()["device/count"] == 1


class TestDeviceHelper:
    def test_get_platform_cpu_under_tests(self):
        assert get_platform() == "cpu"

    def test_get_device_prefers_available(self):
        d = get_device("cpu")
        assert d.platform == "cpu"

    def test_get_device_fallback(self):
        d = get_device("tpu")  # not available under tests -> falls back
        assert d.platform == "cpu"


class TestLatentExport:
    def test_export_latents(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from latice_tpu.index import DiffractionPatternIndexer, IndexerConfig
        from latice_tpu.models import VariationalAutoEncoderRawData

        rng = np.random.default_rng(0)
        n = 10
        np.save(tmp_path / "p.npy", rng.uniform(size=(n, 128, 128)))
        (tmp_path / "a.txt").write_text(
            "eu\n%d\n" % n
            + "".join(f"{a[0]} {a[1]} {a[2]}\n" for a in rng.uniform(0, 360, (n, 3)))
        )
        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
        params = model.init(
            {"params": jax.random.key(0)},
            jnp.zeros((1, 128, 128, 1)),
            jax.random.key(1),
        )["params"]
        indexer = DiffractionPatternIndexer(
            model,
            params,
            config=IndexerConfig(
                pattern_path=tmp_path / "p.npy",
                angles_path=tmp_path / "a.txt",
                batch_size=4,
                latent_dim=8,
            ),
        )
        latents, orients = indexer.export_latents(
            tmp_path / "lat.npy", tmp_path / "ori.npy", progress=False
        )
        assert latents.shape == (10, 8)
        assert orients.shape == (10, 3)
        np.testing.assert_array_equal(np.load(tmp_path / "lat.npy"), latents)
        # Deterministic: export encodes mu, so a second run is identical.
        latents2, _ = indexer.export_latents(progress=False)
        np.testing.assert_array_equal(latents, latents2)
