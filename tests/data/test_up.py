"""EDAX UP1/UP2 raw pattern input: header parsing, streaming, CLI query."""

import importlib
import json
import struct
import sys
from pathlib import Path

import numpy as np
import pytest

from latice_tpu.data import (
    UP_EXTENSIONS,
    iter_up_batches,
    load_up_patterns,
    open_up_patterns,
    read_up_header,
)

REPO = Path(__file__).resolve().parents[2]


def _write_up(
    path,
    patterns,
    version=3,
    n_cols=0,
    n_rows=0,
    hexagonal=False,
    extra=False,
    x_step=0.5,
    y_step=0.5,
    offset=None,
):
    """Write a synthetic UP file (the documented little-endian layout)."""
    path = str(path)
    dtype = np.dtype("<u1") if path.endswith(".up1") else np.dtype("<u2")
    pats = np.ascontiguousarray(patterns, dtype=dtype)
    n, h, w = pats.shape
    with open(path, "wb") as f:
        if version == 1:
            off = 16 if offset is None else offset
            f.write(struct.pack("<4I", 1, w, h, off))
            f.write(b"\0" * (off - 16))
        else:
            off = 42 if offset is None else offset
            f.write(struct.pack("<4I", version, w, h, off))
            f.write(struct.pack("<BI", int(extra), n_cols))
            f.write(struct.pack("<IB", n_rows, int(hexagonal)))
            f.write(struct.pack("<2d", x_step, y_step))
            f.write(b"\0" * (off - 42))
        f.write(pats.tobytes())
    return path


class TestUpHeader:
    def test_v1_up1_roundtrip(self, tmp_path):
        pats = np.arange(6 * 32 * 32, dtype=np.uint8).reshape(6, 32, 32)
        path = _write_up(tmp_path / "scan.up1", pats, version=1)
        h = read_up_header(path)
        assert (h.version, h.pattern_width, h.pattern_height) == (1, 32, 32)
        assert h.data_offset == 16 and h.n_patterns == 6
        assert h.dtype == np.uint8
        assert h.n_columns is None and h.scan_grid is None
        np.testing.assert_array_equal(load_up_patterns(path), pats)

    def test_v3_up2_geometry_and_values(self, tmp_path):
        rng = np.random.default_rng(0)
        pats = rng.integers(0, 65535, (12, 24, 16), np.uint16)
        path = _write_up(
            tmp_path / "scan.up2", pats, version=3, n_cols=4, n_rows=3
        )
        h = read_up_header(path)
        assert h.version == 3 and h.dtype == np.dtype("<u2")
        assert (h.pattern_width, h.pattern_height) == (16, 24)
        assert (h.n_columns, h.n_rows, h.hexagonal) == (4, 3, False)
        assert h.x_step == pytest.approx(0.5)
        assert h.scan_grid == (3, 4)
        np.testing.assert_array_equal(load_up_patterns(path), pats)

    def test_hex_grid_has_no_square_scan_grid(self, tmp_path):
        pats = np.zeros((12, 16, 16), np.uint8)
        path = _write_up(
            tmp_path / "hex.up1", pats, n_cols=4, n_rows=3, hexagonal=True
        )
        assert read_up_header(path).scan_grid is None

    def test_grid_mismatch_has_no_scan_grid(self, tmp_path):
        # Header says 5x5 but only 12 frames fit: geometry is untrustworthy.
        pats = np.zeros((12, 16, 16), np.uint8)
        path = _write_up(tmp_path / "m.up1", pats, n_cols=5, n_rows=5)
        h = read_up_header(path)
        assert h.n_patterns == 12 and h.scan_grid is None

    def test_trailing_bytes_warn(self, tmp_path, caplog):
        import logging

        pats = np.zeros((3, 16, 16), np.uint8)
        path = _write_up(tmp_path / "t.up1", pats, version=1)
        with open(path, "ab") as f:
            f.write(b"\0" * 10)  # partial fourth frame
        with caplog.at_level(logging.WARNING, logger="latice_tpu.data.up"):
            h = read_up_header(path)
        assert h.n_patterns == 3
        assert any("truncated" in r.message for r in caplog.records)

    def test_unknown_version_trusts_offset(self, tmp_path, caplog):
        import logging

        pats = np.arange(2 * 16 * 16, dtype=np.uint8).reshape(2, 16, 16)
        # Version 2 is not a known layout; the data_offset field still rules.
        path = _write_up(tmp_path / "v2.up1", pats, version=2, offset=64)
        with caplog.at_level(logging.WARNING, logger="latice_tpu.data.up"):
            np.testing.assert_array_equal(load_up_patterns(path), pats)
        assert any("unknown UP version" in r.message for r in caplog.records)

    def test_bad_inputs(self, tmp_path):
        with pytest.raises(ValueError, match="EDAX UP"):
            read_up_header(str(tmp_path / "x.npy"))
        short = tmp_path / "short.up1"
        short.write_bytes(b"\1\0\0\0")
        with pytest.raises(ValueError, match="truncated"):
            read_up_header(str(short))
        bad_off = tmp_path / "off.up1"
        bad_off.write_bytes(struct.pack("<4I", 1, 16, 16, 10_000))
        with pytest.raises(ValueError, match="offset"):
            read_up_header(str(bad_off))
        empty = tmp_path / "empty.up1"
        empty.write_bytes(struct.pack("<4I", 1, 16, 16, 16))
        with pytest.raises(ValueError, match="no complete patterns"):
            read_up_header(str(empty))

    def test_streaming_preserves_dtype_and_order(self, tmp_path):
        pats = np.arange(10 * 16 * 16, dtype="<u2").reshape(10, 16, 16)
        path = _write_up(tmp_path / "s.up2", pats)
        _, mm = open_up_patterns(path)
        slabs = list(iter_up_batches(mm, batch_size=4))
        assert [len(s) for s in slabs] == [4, 4, 2]
        assert all(s.dtype == np.uint16 for s in slabs)
        # Slabs are real arrays (safe after the memmap goes away), not views.
        assert all(not isinstance(s, np.memmap) for s in slabs)
        np.testing.assert_array_equal(np.concatenate(slabs), pats)


class TestCLIUpQuery:
    def test_query_up2_scan_with_header_grid(self, tmp_path, monkeypatch, capsys):
        """End-to-end: build from .npy, query an .up2 scan; the scan grid
        from the UP header feeds the .ang export without --scan-grid."""
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

        # The same patterns as the dictionary saw, quantized to uint16.
        scan = np.clip(patterns[:12], 0, 1)
        scan_u16 = np.round(scan * 65535).astype(np.uint16)
        up_path = _write_up(
            tmp_path / "scan.up2", scan_u16, version=3, n_cols=4, n_rows=3
        )
        out = str(tmp_path / "o.npy")
        ang = str(tmp_path / "o.ang")
        stdout = run(
            ["query", "--patterns", up_path, "--db", db, "--out", out,
             "--ang", ang, "--top-n", "5", "--min-matches", "1",
             "--h5-chunk", "7"] + small
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["n_patterns"] == 12
        assert summary["success_rate"] == 1.0
        got = np.load(out)
        np.testing.assert_allclose(got, angles[:12], atol=1e-2)
        # 3x4 grid came from the UP header: 12 data rows in the .ang body.
        body = [
            ln for ln in Path(ang).read_text().splitlines()
            if ln and not ln.startswith("#")
        ]
        assert len(body) == 12


def test_extensions_exported():
    assert UP_EXTENSIONS == (".up1", ".up2")
