"""HDF5 scan input: dataset auto-detection, streaming, CLI query path."""

import importlib
import json
import sys
from pathlib import Path

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from latice_tpu.data import (
    find_pattern_dataset,
    iter_pattern_batches,
    load_patterns,
    prepare_patterns,
)

REPO = Path(__file__).resolve().parents[2]


def _write_h5(path, patterns, dataset="Scan 1/EBSD/Data/Pattern", extra=True):
    with h5py.File(path, "w") as f:
        f.create_dataset(dataset, data=patterns)
        if extra:
            # Vendor files carry plenty of other data; none of it should win
            # auto-detection over the (bigger) pattern stack.
            f.create_dataset("Scan 1/EBSD/Data/phi1", data=np.zeros(len(patterns)))
            f.create_dataset("Scan 1/EBSD/Header/small3d", data=np.zeros((2, 20, 20)))
    return path


class TestH5IO:
    def test_autodetect_largest_3d(self, tmp_path):
        pats = np.random.default_rng(0).uniform(size=(12, 64, 64)).astype(np.float32)
        path = _write_h5(tmp_path / "scan.h5", pats)
        f, dset = find_pattern_dataset(str(path))
        try:
            assert dset.shape == (12, 64, 64)
        finally:
            f.close()
        np.testing.assert_array_equal(load_patterns(str(path)), pats)

    def test_explicit_dataset_and_missing(self, tmp_path):
        pats = np.zeros((4, 32, 32), np.uint8)
        path = _write_h5(tmp_path / "s.h5", pats, dataset="mystack")
        assert load_patterns(str(path), "mystack").shape == (4, 32, 32)
        with pytest.raises(KeyError, match="mystack_nope"):
            load_patterns(str(path), "mystack_nope")

    def test_no_3d_dataset_raises(self, tmp_path):
        path = tmp_path / "flat.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("x", data=np.zeros((5, 5)))
        with pytest.raises(ValueError, match="no .* pattern dataset"):
            load_patterns(str(path))

    def test_vendor_schema_beats_larger_montage(self, tmp_path):
        """EDAX layout: the EBSD/Data/Pattern stack wins even when a bigger
        3-D dataset (e.g. a montage) exists (VERDICT r2 #7)."""
        pats = np.random.default_rng(1).integers(0, 255, (6, 32, 32), np.uint8)
        montage = np.zeros((4, 512, 512), np.uint8)  # 16x the bytes
        path = tmp_path / "edax.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("Scan 1/EBSD/Data/Pattern", data=pats)
            f.create_dataset("Scan 1/Montage/Map", data=montage)
        np.testing.assert_array_equal(load_patterns(str(path)), pats)

    def test_oxford_h5oina_layout(self, tmp_path):
        """Oxford .h5oina: '.../EBSD/Data/Processed Patterns' found by its
        vendor suffix; an EDS cube in the same file does not win."""
        pats = np.random.default_rng(2).integers(0, 255, (5, 48, 48), np.uint8)
        eds = np.zeros((5, 256, 256), np.uint16)
        path = tmp_path / "map.h5oina"
        with h5py.File(path, "w") as f:
            f.create_dataset("1/EBSD/Data/Processed Patterns", data=pats)
            f.create_dataset("1/EDS/Data/Spectrum Cube", data=eds)
        np.testing.assert_array_equal(load_patterns(str(path)), pats)

    def test_explicit_override_beats_vendor_schema(self, tmp_path):
        """dataset= always wins, even with a vendor-layout stack present."""
        pats = np.zeros((3, 32, 32), np.uint8)
        other = np.ones((3, 32, 32), np.uint8)
        path = tmp_path / "both.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("Scan 1/EBSD/Data/Pattern", data=pats)
            f.create_dataset("custom/stack", data=other)
        np.testing.assert_array_equal(
            load_patterns(str(path), "custom/stack"), other
        )

    def test_ambiguous_heuristic_warns(self, tmp_path, caplog):
        """No vendor layout + several plausible stacks -> warning names them."""
        import logging

        path = tmp_path / "amb.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("a/stack", data=np.zeros((4, 32, 32), np.uint8))
            f.create_dataset("b/stack", data=np.zeros((8, 32, 32), np.uint8))
        with caplog.at_level(logging.WARNING, logger="latice_tpu.data.h5io"):
            arr = load_patterns(str(path))
        assert arr.shape == (8, 32, 32)  # largest still picked
        assert any("override" in r.message for r in caplog.records)

    def test_streaming_preserves_dtype_and_order(self, tmp_path):
        pats = np.arange(10 * 32 * 32, dtype=np.uint8).reshape(10, 32, 32)
        path = _write_h5(tmp_path / "u8.h5", pats, extra=False)
        f, dset = find_pattern_dataset(str(path))
        try:
            slabs = list(iter_pattern_batches(dset, batch_size=4))
        finally:
            f.close()
        assert [len(s) for s in slabs] == [4, 4, 2]
        assert all(s.dtype == np.uint8 for s in slabs)
        np.testing.assert_array_equal(np.concatenate(slabs), pats)


class TestPreparePatterns:
    def test_uint8_stays_uint8_through_crop(self):
        x = np.full((3, 140, 140), 200, np.uint8)
        out = prepare_patterns(x, (128, 128))
        assert out.dtype == np.uint8 and out.shape == (3, 128, 128)

    def test_float_goes_through_default_transform(self):
        x = np.ones((2, 140, 140), np.float32)
        out = prepare_patterns(x, (128, 128))
        assert out.dtype == np.float32 and out.shape == (2, 128, 128)

    def test_shapes(self):
        assert prepare_patterns(np.zeros((128, 128)), (128, 128)).shape == (1, 128, 128)
        assert prepare_patterns(np.zeros((2, 128, 128, 1)), (128, 128)).shape == (2, 128, 128)
        with pytest.raises(ValueError, match="patterns"):
            prepare_patterns(np.zeros((2, 2, 2, 2, 2)))


class TestCLIH5Query:
    def test_query_h5_scan(self, tmp_path, monkeypatch, capsys):
        sys.path.insert(0, str(REPO))
        index_cli = importlib.import_module("index")

        rng = np.random.default_rng(0)
        base = rng.uniform(size=(1, 128, 128))
        patterns = (base + rng.normal(size=(24, 128, 128)) * 0.02).astype(np.float32)
        angles = rng.uniform([10, 20, 10], [170, 140, 170], size=(24, 3))
        ppath = tmp_path / "dict.npy"
        apath = tmp_path / "dict.txt"
        np.save(ppath, patterns)
        apath.write_text(
            "eu\n24\n" + "".join(f"{a[0]} {a[1]} {a[2]}\n" for a in angles)
        )
        db = str(tmp_path / "idx.npz")
        small = ["--inplanes", "2", "--latent-dim", "8", "--batch-size", "16"]

        def run(argv):
            monkeypatch.setattr(sys, "argv", ["index.py"] + argv)
            index_cli.main()
            return capsys.readouterr().out

        run(["build", "--patterns", str(ppath), "--angles", str(apath), "--db", db] + small)

        scan_h5 = tmp_path / "scan.h5"
        with h5py.File(scan_h5, "w") as f:
            f.create_dataset("Scan 1/EBSD/Data/Pattern", data=patterns[:10])
        out = str(tmp_path / "o.npy")
        stdout = run(
            ["query", "--patterns", str(scan_h5), "--db", db, "--out", out,
             "--top-n", "5", "--min-matches", "1", "--h5-chunk", "7"] + small
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["n_patterns"] == 10
        assert summary["success_rate"] == 1.0
        got = np.load(out)
        np.testing.assert_allclose(got, angles[:10], atol=1e-3)


class TestPreparePatternsDtypes:
    """Input-scaling fixes: every integer dtype must land in [0, 1]."""

    def test_uint16_correct_size_is_scaled(self):
        x = np.full((2, 128, 128), 65535, np.uint16)
        out = prepare_patterns(x, (128, 128))
        assert out.dtype == np.float32
        np.testing.assert_allclose(out, 1.0)

    def test_uint16_cropped_is_scaled_once(self):
        x = np.full((2, 140, 140), 32767, np.uint16)
        out = prepare_patterns(x, (128, 128))
        np.testing.assert_allclose(out, 32767 / 65535, rtol=1e-5)

    def test_rgb_uint8_stack_accepted_and_scaled(self):
        x = np.full((2, 128, 128, 3), 255, np.uint8)
        out = prepare_patterns(x, (128, 128))
        assert out.shape == (2, 128, 128)
        np.testing.assert_allclose(out, 1.0, rtol=1e-5)

    def test_default_transform_uint8_rgb_scaled(self):
        from latice_tpu.data import default_transform

        x = np.full((2, 130, 130, 3), 255, np.uint8)
        out = default_transform(x, (128, 128))
        np.testing.assert_allclose(out, 1.0, rtol=1e-5)

    def test_int64_byte_range_keeps_legacy_255_scale(self):
        # np.save of a Python int list -> int64; 8-bit-range data must not
        # be near-zeroed by a 1/2^63 scale.
        x = np.full((2, 128, 128), 255, np.int64)
        out = prepare_patterns(x, (128, 128))
        np.testing.assert_allclose(out, 1.0, rtol=1e-6)
