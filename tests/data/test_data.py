"""Data pipeline tests: angle parsing, transforms vs torchvision, splits."""

import numpy as np
import pytest

from latice_tpu.data import (
    DPDataModule,
    DPdataset,
    batch_iterator,
    center_crop,
    default_transform,
    parse_angle_file,
)

RNG = np.random.default_rng(0)


@pytest.fixture
def sample_files(tmp_path):
    """Tiny .npy stack + reference-format angle file."""
    n, h, w = 10, 140, 150
    patterns = RNG.uniform(size=(n, h, w)).astype(np.float64)
    angles = RNG.uniform(0, 360, size=(n, 3))
    ppath = tmp_path / "patterns.npy"
    np.save(ppath, patterns)
    apath = tmp_path / "angles.txt"
    lines = ["eu\n", f"{n}\n"] + [
        f"   {a[0]:.4f}    {a[1]:.4f}    {a[2]:.4f}\n" for a in angles
    ]
    apath.write_text("".join(lines))
    return ppath, apath, patterns, angles


class TestParseAngleFile:
    def test_reference_format(self, sample_files):
        _, apath, _, angles = sample_files
        got = parse_angle_file(apath)
        np.testing.assert_allclose(got, angles, atol=1e-4)

    def test_sample_anglefile_from_reference_format(self, tmp_path):
        """Format of data/anglefile_sample.txt: 'eu' header + count line."""
        p = tmp_path / "a.txt"
        p.write_text("eu\n2\n0.0 0.0 0.0\n1.5 2.5 3.5\n")
        got = parse_angle_file(p)
        np.testing.assert_allclose(got, [[0, 0, 0], [1.5, 2.5, 3.5]])

    def test_missing_file(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            parse_angle_file(tmp_path / "nope.txt")

    def test_malformed(self, tmp_path):
        p = tmp_path / "bad.txt"
        p.write_text("eu\n1\n1.0 2.0\n")
        with pytest.raises(ValueError):
            parse_angle_file(p)


class TestTransforms:
    def test_center_crop_matches_torchvision(self):
        tv = pytest.importorskip("torchvision.transforms")
        torch = pytest.importorskip("torch")
        for h, w in [(140, 150), (128, 128), (129, 131)]:
            x = RNG.uniform(size=(h, w)).astype(np.float32)
            want = tv.CenterCrop((128, 128))(torch.from_numpy(x)[None]).numpy()[0]
            got = center_crop(x, (128, 128))
            np.testing.assert_array_equal(got, want)

    def test_crop_pads_when_small(self):
        x = np.ones((100, 100), np.float32)
        out = center_crop(x, (128, 128))
        assert out.shape == (128, 128)

    def test_default_transform_float_passthrough(self):
        """Float inputs are not rescaled (ToTensor mode-F behavior)."""
        x = RNG.uniform(size=(2, 130, 130)).astype(np.float64) * 3
        out = default_transform(x, (128, 128))
        assert out.shape == (2, 128, 128, 1)
        assert out.dtype == np.float32
        assert out.max() > 1.5  # unscaled

    def test_default_transform_uint8_scaled(self):
        x = (RNG.uniform(size=(130, 130)) * 255).astype(np.uint8)
        out = default_transform(x, (128, 128))
        assert out.max() <= 1.0

    def test_rgb_grayscale(self):
        x = RNG.uniform(size=(130, 130, 3)).astype(np.float32)
        out = default_transform(np.moveaxis(np.stack([x]), 0, 0), (128, 128))
        assert out.shape[-1] == 1


class TestDPdataset:
    def test_loads_and_transforms(self, sample_files):
        ppath, apath, patterns, angles = sample_files
        ds = DPdataset(ppath, apath, image_size=(128, 128))
        assert len(ds) == 10
        p, a = ds[3]
        assert p.shape == (128, 128, 1)
        np.testing.assert_allclose(a, angles[3], atol=1e-4)

    def test_rejects_2d_stack(self, sample_files, tmp_path):
        _, apath, _, _ = sample_files
        bad = tmp_path / "bad.npy"
        np.save(bad, np.zeros((10, 10)))
        with pytest.raises(ValueError, match="3D"):
            DPdataset(bad, apath)

    def test_count_mismatch(self, sample_files, tmp_path):
        ppath, _, _, _ = sample_files
        bad = tmp_path / "short.txt"
        bad.write_text("eu\n1\n1 2 3\n")
        with pytest.raises(ValueError, match="angle count"):
            DPdataset(ppath, bad)


class TestDPDataModule:
    def test_split_sizes(self, sample_files):
        ppath, apath, _, _ = sample_files
        dm = DPDataModule(ppath, apath, val_data_ratio=0.2, batch_size=4)
        dm.setup("fit")
        assert dm.train_size == 8
        assert dm.val_size == 2

    def test_split_deterministic(self, sample_files):
        ppath, apath, _, _ = sample_files
        dm1 = DPDataModule(ppath, apath, seed=42)
        dm2 = DPDataModule(ppath, apath, seed=42)
        dm1.setup("fit"); dm2.setup("fit")
        np.testing.assert_array_equal(dm1._train_idx, dm2._train_idx)

    def test_train_val_disjoint_and_complete(self, sample_files):
        ppath, apath, _, _ = sample_files
        dm = DPDataModule(ppath, apath, val_data_ratio=0.3)
        dm.setup("fit")
        union = np.union1d(dm._train_idx, dm._val_idx)
        np.testing.assert_array_equal(union, np.arange(10))

    def test_test_batches_cover_everything_in_order(self, sample_files):
        ppath, apath, patterns, angles = sample_files
        dm = DPDataModule(ppath, apath, batch_size=3)
        dm.setup("test")
        batches = list(dm.test_batches())
        assert len(batches) == 4  # 3+3+3+1
        all_angles = np.concatenate([b[1] for b in batches])
        np.testing.assert_allclose(all_angles, angles, atol=1e-4)

    def test_zero_val_ratio_trains_on_everything(self, sample_files):
        ppath, apath, _, _ = sample_files
        dm = DPDataModule(ppath, apath, val_data_ratio=0.0, batch_size=4)
        dm.setup("fit")
        n = sum(len(b[0]) for b in dm.train_batches())
        assert n == 10


class TestBatchIterator:
    def test_partial_final_batch(self):
        x = np.arange(10)
        batches = list(batch_iterator((x,), 4))
        assert [len(b[0]) for b in batches] == [4, 4, 2]

    def test_drop_last(self):
        x = np.arange(10)
        batches = list(batch_iterator((x,), 4, drop_last=True))
        assert [len(b[0]) for b in batches] == [4, 4]

    def test_shuffle_covers_all(self):
        x = np.arange(100)
        out = np.concatenate(
            [b[0] for b in batch_iterator((x,), 7, shuffle=True,
                                          rng=np.random.default_rng(0))]
        )
        np.testing.assert_array_equal(np.sort(out), x)


class TestPrefetch:
    def test_prefetch_preserves_order_and_values(self):
        from latice_tpu.data import prefetch_to_device

        batches = [np.full((4, 2), float(i)) for i in range(7)]
        out = list(prefetch_to_device(iter(batches), size=3))
        assert len(out) == 7
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b), batches[i])

    def test_prefetch_tuple_batches(self):
        from latice_tpu.data import prefetch_to_device

        batches = [(np.ones((2,)) * i, np.zeros((2,)) + i) for i in range(3)]
        out = list(prefetch_to_device(iter(batches)))
        assert len(out) == 3
        np.testing.assert_array_equal(np.asarray(out[2][0]), [2.0, 2.0])

    def test_prefetch_empty(self):
        from latice_tpu.data import prefetch_to_device

        assert list(prefetch_to_device(iter([]))) == []

    def test_prefetch_with_sharding(self):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from latice_tpu.data import prefetch_to_device
        from latice_tpu.parallel import make_mesh

        mesh = make_mesh(8)
        sharding = NamedSharding(mesh, P("data"))
        batches = [np.arange(16.0).reshape(16, 1)]
        (out,) = prefetch_to_device(iter(batches), sharding=sharding)
        assert len(out.sharding.device_set) == 8


class TestPrefetchHost:
    def test_order_and_values(self):
        from latice_tpu.data import prefetch_host

        batches = [np.full((3,), float(i)) for i in range(11)]
        out = list(prefetch_host(iter(batches), size=2))
        assert len(out) == 11
        for i, b in enumerate(out):
            np.testing.assert_array_equal(b, batches[i])

    def test_empty(self):
        from latice_tpu.data import prefetch_host

        assert list(prefetch_host(iter([]))) == []

    def test_producer_exception_propagates(self):
        from latice_tpu.data import prefetch_host

        def gen():
            yield 1
            yield 2
            raise RuntimeError("disk went away")

        it = prefetch_host(gen(), size=1)
        assert next(it) == 1
        assert next(it) == 2
        with pytest.raises(RuntimeError, match="disk went away"):
            next(it)

    def test_abandoned_consumer_stops_thread(self):
        import threading
        import time

        from latice_tpu.data import prefetch_host

        started = threading.active_count()
        produced = []

        def gen():
            for i in range(1000):
                produced.append(i)
                yield i

        it = prefetch_host(gen(), size=1)
        assert next(it) == 0
        it.close()  # GeneratorExit -> stop event
        deadline = time.time() + 5.0
        while threading.active_count() > started and time.time() < deadline:
            time.sleep(0.02)
        assert threading.active_count() <= started
        # The producer stopped early: bounded queue + stop event, so nowhere
        # near all 1000 items were pulled.
        assert len(produced) < 10

    def test_actually_overlaps(self):
        # Producer sleep hides behind consumer sleep: with overlap the wall
        # time is ~max(producer, consumer) per item, not the sum. Generous
        # margin for the 1-core CI box.
        import time

        from latice_tpu.data import prefetch_host

        def gen():
            for i in range(5):
                time.sleep(0.05)
                yield i

        t0 = time.time()
        for _ in prefetch_host(gen(), size=2):
            time.sleep(0.05)
        overlapped = time.time() - t0
        assert overlapped < 0.45  # serial would be >= 0.5

    def test_close_joins_worker_thread(self):
        """close() must not return while the producer thread can still
        touch the underlying iterable — callers close files (h5py) right
        after, and a reader mid-access would segfault."""
        import threading
        import time

        from latice_tpu.data import prefetch_host

        workers = []

        def gen():
            workers.append(threading.current_thread())
            yield 1
            time.sleep(0.3)  # "mid disk read" when the consumer bails
            yield 2

        it = prefetch_host(gen(), size=1)
        assert next(it) == 1
        it.close()
        assert workers and not workers[0].is_alive()
