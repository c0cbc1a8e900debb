"""Vendor-format result export: .ang and .ctf writers."""

import numpy as np
import pytest

from latice_tpu.data import write_ang, write_ctf
from latice_tpu.index import DenseIndexResult


def _result(n=6, phases=None, fail=()):
    rng = np.random.default_rng(0)
    success = np.ones(n, bool)
    for i in fail:
        success[i] = False
    best = rng.uniform([10, 20, 10], [170, 140, 170], size=(n, 3))
    return DenseIndexResult(
        mean_orientation=np.where(success[:, None], best, np.nan),
        best_orientation=best,
        success=success,
        n_similar=np.where(success, 12, 0).astype(np.int64),
        indices=np.tile(np.arange(5), (n, 1)),
        scores=np.full((n, 5), 0.9),
        phase=phases,
    )


class TestWriteAng:
    def test_roundtrip_columns(self, tmp_path):
        res = _result(6, fail=(2,))
        path = tmp_path / "out.ang"
        write_ang(str(path), res, grid=(2, 3), step=0.5)
        rows = np.loadtxt(path, comments="#")
        assert rows.shape == (6, 10)
        np.testing.assert_allclose(
            rows[:, :3], np.deg2rad(res.best_orientation), atol=1e-5
        )
        # Row-major grid coordinates at 0.5 um.
        np.testing.assert_allclose(rows[:, 3], [0, 0.5, 1.0, 0, 0.5, 1.0])
        np.testing.assert_allclose(rows[:, 4], [0, 0, 0, 0.5, 0.5, 0.5])
        # CI: mean similarity for indexed, -1 for the failed point.
        assert rows[0, 6] == pytest.approx(0.9, abs=1e-3)
        assert rows[2, 6] == -1.0

    def test_multiphase_and_header(self, tmp_path):
        res = _result(4, phases=np.array([0, 0, 1, 1]))
        path = tmp_path / "mp.ang"
        write_ang(str(path), res, phase_names=["Ni", "Ti"])
        text = path.read_text()
        assert "MaterialName  \tNi" in text and "MaterialName  \tTi" in text
        rows = np.loadtxt(path, comments="#")
        np.testing.assert_array_equal(rows[:, 7], [1, 1, 2, 2])

    def test_grid_mismatch_raises(self, tmp_path):
        with pytest.raises(ValueError, match="does not hold"):
            write_ang(str(tmp_path / "x.ang"), _result(6), grid=(2, 2))


class TestWriteCtf:
    def test_roundtrip_columns(self, tmp_path):
        res = _result(6, fail=(4,))
        path = tmp_path / "out.ctf"
        write_ctf(str(path), res, grid=(3, 2), step=2.0)
        lines = path.read_text().splitlines()
        assert lines[0] == "Channel Text File"
        hdr = lines.index(
            "Phase\tX\tY\tBands\tError\tEuler1\tEuler2\tEuler3\tMAD\tBC\tBS"
        )
        rows = np.loadtxt(path, skiprows=hdr + 1)
        assert rows.shape == (6, 11)
        # Indexed rows carry degrees + phase 1; failed row is phase 0, err 3,
        # zeroed angles.
        np.testing.assert_allclose(rows[0, 5:8], res.best_orientation[0], atol=1e-3)
        assert rows[4, 0] == 0 and rows[4, 4] == 3
        np.testing.assert_array_equal(rows[4, 5:8], 0.0)
        assert ("XCells\t2" in lines) and ("YCells\t3" in lines)

    def test_phase_count_in_header(self, tmp_path):
        res = _result(4, phases=np.array([0, 1, 1, 0]))
        path = tmp_path / "mp.ctf"
        write_ctf(str(path), res, phase_names=["Fe-BCC", "Fe-FCC"])
        text = path.read_text()
        assert "Phases\t2" in text and "Fe-FCC" in text
        rows = np.loadtxt(path, skiprows=text.splitlines().index(
            "Phase\tX\tY\tBands\tError\tEuler1\tEuler2\tEuler3\tMAD\tBC\tBS") + 1)
        np.testing.assert_array_equal(rows[:, 0], [1, 2, 2, 1])


class TestAngRoundTrip:
    def test_written_ang_parses_as_angle_file(self, tmp_path):
        """write_ang output feeds straight back in as a dictionary angle
        source (EMsoft-style .ang dictionaries)."""
        from latice_tpu.data import parse_angle_file

        res = _result(6)
        path = tmp_path / "dict.ang"
        write_ang(str(path), res, grid=(2, 3))
        angles = parse_angle_file(str(path))
        np.testing.assert_allclose(angles, res.best_orientation, atol=1e-2)

    def test_ang_too_few_columns_raises(self, tmp_path):
        p = tmp_path / "bad.ang"
        p.write_text("# header\n0.1 0.2\n")
        with pytest.raises(ValueError, match="columns"):
            from latice_tpu.data import parse_angle_file

            parse_angle_file(str(p))


class TestSymmetryMetadata:
    def test_ang_header_carries_phase_groups(self, tmp_path):
        res = _result(4, phases=np.array([0, 0, 1, 1]))
        path = tmp_path / "hex.ang"
        write_ang(str(path), res, phase_names=["Ni", "Ti"],
                  phase_groups=["432", "622"])
        text = path.read_text()
        assert "# Symmetry              43" in text
        assert "# Symmetry              62" in text

    def test_ctf_header_hexagonal_laue_and_gamma(self, tmp_path):
        res = _result(4, phases=np.array([0, 1, 1, 0]))
        path = tmp_path / "hex.ctf"
        write_ctf(str(path), res, phase_names=["Cu", "Mg"],
                  phase_groups=["432", "622"])
        lines = path.read_text().splitlines()
        cu = next(l for l in lines if "Cu" in l)
        mg = next(l for l in lines if "Mg" in l)
        assert "\t11\t" in cu and "90.000;90.000;90.000" in cu
        assert "\t9\t" in mg and "90.000;90.000;120.000" in mg

    def test_lattice_constants_propagate(self, tmp_path):
        """Per-phase (a, b, c) reach both headers; defaults stay 3.6 (a
        documented placeholder — ADVICE r2)."""
        res = _result(4, phases=np.array([0, 1, 1, 0]))
        ctf = tmp_path / "lat.ctf"
        write_ctf(str(ctf), res, phase_names=["Cu", "Mg"],
                  phase_groups=["432", "622"],
                  phase_lattices=[(3.615, 3.615, 3.615), (3.209, 3.209, 5.211)])
        lines = ctf.read_text().splitlines()
        assert any(l.startswith("3.615;3.615;3.615") and "Cu" in l for l in lines)
        assert any(l.startswith("3.209;3.209;5.211") and "Mg" in l for l in lines)

        ang = tmp_path / "lat.ang"
        write_ang(str(ang), res, phase_names=["Cu", "Mg"],
                  phase_groups=["432", "622"],
                  phase_lattices=[(3.615, 3.615, 3.615), (3.209, 3.209, 5.211)])
        text = ang.read_text()
        assert "# LatticeConstants      3.615 3.615 3.615  90.000  90.000  90.000" in text
        assert "# LatticeConstants      3.209 3.209 5.211  90.000  90.000  120.000" in text

    def test_lattice_defaults_are_placeholder(self, tmp_path):
        res = _result(2)
        ctf = tmp_path / "d.ctf"
        write_ctf(str(ctf), res)
        assert "3.600;3.600;3.600" in ctf.read_text()
        ang = tmp_path / "d.ang"
        write_ang(str(ang), res)
        assert "# LatticeConstants      3.600 3.600 3.600" in ang.read_text()


class TestNativeFormatters:
    """The C++ snprintf row formatters must be byte-identical to the
    Python f-string fallback (data/export.py _ang_rows/_ctf_rows)."""

    def _files_with_and_without_native(self, tmp_path, writer, res, name):
        from latice_tpu import native

        if not native.available():
            pytest.skip("no native toolchain")
        p_native = tmp_path / f"native_{name}"
        writer(str(p_native), res, grid=(2, 4), step=0.25)
        import latice_tpu.native as native_mod

        def _raise(*a, **k):
            raise ImportError("forced fallback")

        orig_ang = native_mod.format_ang_rows_native
        orig_ctf = native_mod.format_ctf_rows_native
        native_mod.format_ang_rows_native = _raise
        native_mod.format_ctf_rows_native = _raise
        try:
            p_py = tmp_path / f"python_{name}"
            writer(str(p_py), res, grid=(2, 4), step=0.25)
        finally:
            native_mod.format_ang_rows_native = orig_ang
            native_mod.format_ctf_rows_native = orig_ctf
        return p_native.read_bytes(), p_py.read_bytes()

    def test_ang_byte_parity(self, tmp_path):
        res = _result(8, fail=(1, 5), phases=np.array([0, 0, 1, 1, 0, 1, 0, 1]))
        a, b = self._files_with_and_without_native(
            tmp_path, write_ang, res, "a.ang"
        )
        assert a == b

    def test_ctf_byte_parity(self, tmp_path):
        res = _result(8, fail=(0, 7), phases=np.array([0, 1, 1, 0, 0, 1, 0, 1]))
        a, b = self._files_with_and_without_native(
            tmp_path, write_ctf, res, "c.ctf"
        )
        assert a == b

    def test_rounding_edge_values(self, tmp_path):
        # Values near decimal rounding boundaries and negative zero must
        # format identically through snprintf and Python's formatter.
        n = 8
        res = DenseIndexResult(
            mean_orientation=np.zeros((n, 3)),
            best_orientation=np.array(
                [
                    [0.123455, 0.000005, -0.0],
                    [359.99995, 1e-9, 123.456785],
                    [-0.123455, 0.5, 0.05],
                    [2.675, 2.665, 2.655],
                    [180.0, 90.0, 45.0],
                    [0.0, 0.0, 0.0],
                    [1.000005, 2.000015, 3.000025],
                    [-359.99995, -1e-9, -0.000005],
                ]
            ),
            success=np.ones(n, bool),
            n_similar=np.arange(n, dtype=np.int64),
            indices=np.tile(np.arange(5), (n, 1)),
            scores=np.linspace(0, 1, 5 * n).reshape(n, 5),
            phase=None,
        )
        a, b = self._files_with_and_without_native(
            tmp_path, write_ang, res, "edge.ang"
        )
        assert a == b
        a, b = self._files_with_and_without_native(
            tmp_path, write_ctf, res, "edge.ctf"
        )
        assert a == b


class TestVendorReaders:
    """read_ang / read_ctf invert the writers (round-trip pinned)."""

    def test_ang_round_trip(self, tmp_path):
        from latice_tpu.data import read_ang

        res = _result(8, fail=(3,), phases=np.array([0, 0, 1, 1, 0, 1, 0, 1]))
        path = str(tmp_path / "rt.ang")
        write_ang(path, res, grid=(2, 4), step=0.5)
        vmap = read_ang(path)
        assert vmap.grid == (2, 4)
        assert vmap.step == pytest.approx(0.5)
        # .ang rows carry radians at 5 decimals: ~0.0006 deg quantization.
        np.testing.assert_allclose(
            vmap.eulers, res.best_orientation, atol=2e-3
        )
        np.testing.assert_array_equal(vmap.success, res.success)
        want_phase = np.where(res.success, res.phase, -1)
        np.testing.assert_array_equal(vmap.phase, want_phase)

    def test_ctf_round_trip(self, tmp_path):
        from latice_tpu.data import read_ctf

        res = _result(8, fail=(0, 6), phases=np.array([1, 0, 1, 0, 0, 1, 0, 1]))
        path = str(tmp_path / "rt.ctf")
        write_ctf(path, res, grid=(4, 2), step=0.25)
        vmap = read_ctf(path)
        assert vmap.grid == (4, 2)
        assert vmap.step == pytest.approx(0.25)
        ok = res.success
        # .ctf stores degrees at 4 decimals; failures are zeroed by the
        # writer (CTF convention), so compare indexed rows only.
        np.testing.assert_allclose(
            vmap.eulers[ok], res.best_orientation[ok], atol=1e-3
        )
        np.testing.assert_array_equal(vmap.success, ok)
        np.testing.assert_array_equal(
            vmap.phase, np.where(ok, res.phase, -1)
        )

    def test_ang_single_phase_defaults(self, tmp_path):
        from latice_tpu.data import read_ang

        res = _result(6)
        path = str(tmp_path / "sp.ang")
        write_ang(path, res, grid=(2, 3))
        vmap = read_ang(path)
        assert vmap.phase.max() == 0 and vmap.success.all()

    def test_extra_trailing_columns_ignored(self, tmp_path):
        from latice_tpu.data import read_ang

        res = _result(4)
        path = tmp_path / "extra.ang"
        write_ang(str(path), res, grid=(2, 2))
        # Simulate a vendor writing extra columns after the standard ten.
        lines = path.read_text().splitlines()
        out = [
            l if l.startswith("#") else l + "  7.123  0.001"
            for l in lines
        ]
        path.write_text("\n".join(out) + "\n")
        vmap = read_ang(str(path))
        assert len(vmap.eulers) == 4

    def test_malformed_rows_rejected(self, tmp_path):
        from latice_tpu.data import read_ang, read_ctf

        p = tmp_path / "bad.ang"
        p.write_text("# NROWS: 1\n1.0 2.0 3.0\n")
        with pytest.raises(ValueError, match="malformed"):
            read_ang(str(p))
        p2 = tmp_path / "empty.ctf"
        p2.write_text("Channel Text File\nXCells\t3\n")
        with pytest.raises(ValueError, match="no data rows"):
            read_ctf(str(p2))


class TestFormatterOverflowFallback:
    """A native-formatter buffer overflow (ValueError) must fall back to
    the unlimited Python path, not crash the export."""

    def test_ang_overflow_falls_back(self, tmp_path, monkeypatch):
        import latice_tpu.native as native_mod

        def _overflow(*a, **k):
            raise ValueError("native .ang formatting overflowed its buffer")

        monkeypatch.setattr(
            native_mod, "format_ang_rows_native", _overflow, raising=False
        )
        res = _result(8, fail=(1,), phases=np.array([0, 0, 1, 1, 0, 1, 0, 1]))
        p = tmp_path / "o.ang"
        write_ang(str(p), res, grid=(2, 4), step=0.25)
        data = [l for l in p.read_text().splitlines() if not l.startswith("#")]
        assert len(data) == 8

    def test_ctf_overflow_falls_back(self, tmp_path, monkeypatch):
        import latice_tpu.native as native_mod

        def _overflow(*a, **k):
            raise ValueError("native .ctf formatting overflowed its buffer")

        monkeypatch.setattr(
            native_mod, "format_ctf_rows_native", _overflow, raising=False
        )
        res = _result(8, fail=(0,), phases=np.array([0, 1, 1, 0, 0, 1, 0, 1]))
        p = tmp_path / "o.ctf"
        write_ctf(str(p), res, grid=(2, 4), step=0.25)
        text = p.read_text().splitlines()
        first = next(i for i, l in enumerate(text) if l.startswith("Phase\t"))
        assert len(text) - first - 1 == 8
