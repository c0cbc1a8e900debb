"""index.py CLI: build / query flows, single- and multi-phase."""

import importlib
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
index_cli = importlib.import_module("index")


def _write_phase(tmp_path, name, n, seed):
    rng = np.random.default_rng(seed)
    base = rng.uniform(size=(1, 128, 128))
    patterns = base + rng.normal(size=(n, 128, 128)) * 0.02
    angles = rng.uniform([0, 20, 0], [340, 140, 340], size=(n, 3))
    ppath = tmp_path / f"{name}.npy"
    apath = tmp_path / f"{name}.txt"
    np.save(ppath, patterns)
    apath.write_text(
        "eu\n%d\n" % n + "".join(f"{a[0]} {a[1]} {a[2]}\n" for a in angles)
    )
    return ppath, apath, patterns.astype(np.float32)


def _run(argv, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", ["index.py"] + argv)
    index_cli.main()
    return capsys.readouterr().out


SMALL = ["--inplanes", "2", "--latent-dim", "8", "--batch-size", "16"]


class TestCLI:
    def test_build_query_single_phase(self, tmp_path, monkeypatch, capsys):
        ppath, apath, patterns = _write_phase(tmp_path, "dict", 24, seed=0)
        db = str(tmp_path / "idx.npz")
        _run(
            ["build", "--patterns", str(ppath), "--angles", str(apath), "--db", db]
            + SMALL,
            monkeypatch, capsys,
        )
        assert Path(db).exists()

        out = str(tmp_path / "orients.npy")
        stdout = _run(
            ["query", "--patterns", str(ppath), "--db", db, "--out", out,
             "--top-n", "5", "--min-matches", "1"] + SMALL,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["n_patterns"] == 24
        assert "phase_out" not in summary
        assert np.load(out).shape == (24, 3)

    def test_query_ambiguity_diagnostic(self, tmp_path, monkeypatch, capsys):
        ppath, apath, _ = _write_phase(tmp_path, "dict", 24, seed=0)
        db = str(tmp_path / "idx.npz")
        _run(["build", "--patterns", str(ppath), "--angles", str(apath),
              "--db", db] + SMALL, monkeypatch, capsys)
        out = str(tmp_path / "o.npy")
        amb_out = str(tmp_path / "amb.npz")
        stdout = _run(
            ["query", "--patterns", str(ppath), "--db", db, "--out", out,
             "--top-n", "5", "--min-matches", "1",
             "--ambiguity", amb_out, "--ambiguity-gap", "0.5"] + SMALL,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert 0.0 <= summary["ambiguous_frac"] <= 1.0
        data = np.load(amb_out)
        assert set(data.files) == {"angle_deg", "score_gap", "has_rival"}
        assert data["angle_deg"].shape == (24,)
        # Random 3-degree-spread dictionary angles: rivals exist, and at a
        # 0.5 score window effectively every pixel with a rival flags.
        assert data["has_rival"].any()

    def test_build_and_query_over_mesh_match_single_device(
        self, tmp_path, monkeypatch, capsys
    ):
        """--devices 8 on build and query: same dictionary, same
        orientations as the single-device flow (engine matrix included)."""
        ppath, apath, patterns = _write_phase(tmp_path, "dict", 24, seed=3)
        db1 = str(tmp_path / "one.npz")
        db8 = str(tmp_path / "mesh.npz")
        _run(["build", "--patterns", str(ppath), "--angles", str(apath),
              "--db", db1] + SMALL, monkeypatch, capsys)
        _run(["build", "--patterns", str(ppath), "--angles", str(apath),
              "--db", db8, "--devices", "8"] + SMALL, monkeypatch, capsys)
        lat1 = np.load(db1)["vectors"]
        lat8 = np.load(db8)["vectors"]
        np.testing.assert_allclose(lat1, lat8, atol=1e-5)

        out1 = str(tmp_path / "o1.npy")
        out8 = str(tmp_path / "o8.npy")
        base = ["query", "--patterns", str(ppath), "--db", db1,
                "--top-n", "5", "--min-matches", "1"] + SMALL
        _run(base + ["--out", out1], monkeypatch, capsys)
        stdout = _run(
            base + ["--out", out8, "--devices", "8", "--engine", "int8"],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["success_rate"] == 1.0
        # int8 quantization cannot disturb self-match consensus here.
        np.testing.assert_allclose(np.load(out1), np.load(out8), atol=1e-3)

    def test_query_preprocess_and_nlpar(self, tmp_path, monkeypatch, capsys):
        """--preprocess and --nlpar run end to end and keep self-queries
        indexable (the corrections are shared by dictionary and queries
        only in spirit here — min-matches 1 tolerates the perturbation)."""
        ppath, apath, _ = _write_phase(tmp_path, "dict", 24, seed=5)
        db = str(tmp_path / "idx.npz")
        _run(
            ["build", "--patterns", str(ppath), "--angles", str(apath), "--db", db]
            + SMALL,
            monkeypatch, capsys,
        )
        out = str(tmp_path / "o.npy")
        stdout = _run(
            ["query", "--patterns", str(ppath), "--db", db, "--out", out,
             "--top-n", "5", "--min-matches", "1",
             "--preprocess", "normalize=minmax",
             "--nlpar", "2.0", "--scan-grid", "4", "6"] + SMALL,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["n_patterns"] == 24
        assert np.load(out).shape == (24, 3)

    def test_query_static_auto_background(self, tmp_path, monkeypatch, capsys):
        """static=auto estimates the detector frame from the scan mean."""
        ppath, apath, _ = _write_phase(tmp_path, "dict", 16, seed=8)
        db = str(tmp_path / "idx.npz")
        _run(
            ["build", "--patterns", str(ppath), "--angles", str(apath), "--db", db]
            + SMALL,
            monkeypatch, capsys,
        )
        out = str(tmp_path / "o.npy")
        stdout = _run(
            ["query", "--patterns", str(ppath), "--db", db, "--out", out,
             "--top-n", "5", "--min-matches", "1",
             "--preprocess", "static=auto"] + SMALL,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["n_patterns"] == 16

    def test_query_nlpar_uint8_matches_float(self, tmp_path, monkeypatch, capsys):
        """uint8 scans through --nlpar must land in model units (/255): the
        orientations must match the same scan queried as float [0, 1]."""
        ppath, apath, patterns = _write_phase(tmp_path, "dict", 24, seed=7)
        db = str(tmp_path / "idx.npz")
        _run(
            ["build", "--patterns", str(ppath), "--angles", str(apath), "--db", db]
            + SMALL,
            monkeypatch, capsys,
        )
        u8 = (np.clip(patterns, 0, 1) * 255).astype(np.uint8)
        u8path = tmp_path / "scan_u8.npy"
        fpath = tmp_path / "scan_f32.npy"
        np.save(u8path, u8)
        np.save(fpath, u8.astype(np.float32) / 255.0)
        outs = {}
        for tag, p in (("u8", u8path), ("f32", fpath)):
            out = str(tmp_path / f"o_{tag}.npy")
            _run(
                ["query", "--patterns", str(p), "--db", db, "--out", out,
                 "--top-n", "5", "--min-matches", "1",
                 "--nlpar", "2.0", "--scan-grid", "4", "6"] + SMALL,
                monkeypatch, capsys,
            )
            outs[tag] = np.load(out)
        np.testing.assert_allclose(outs["u8"], outs["f32"], atol=1e-3)

    def test_query_nlpar_needs_scan_grid(self, tmp_path, monkeypatch, capsys):
        ppath, apath, _ = _write_phase(tmp_path, "dict", 8, seed=6)
        db = str(tmp_path / "idx.npz")
        _run(
            ["build", "--patterns", str(ppath), "--angles", str(apath), "--db", db]
            + SMALL,
            monkeypatch, capsys,
        )
        with pytest.raises(SystemExit, match="scan-grid"):
            _run(
                ["query", "--patterns", str(ppath), "--db", db,
                 "--nlpar", "1.0"] + SMALL,
                monkeypatch, capsys,
            )

    def test_sample_to_build(self, tmp_path, monkeypatch, capsys):
        """sample -> anglefile -> build consumes it (the generator loop)."""
        angles = str(tmp_path / "fz.txt")
        stdout = _run(
            ["sample", "--group", "432", "--resolution", "14", "--out", angles],
            monkeypatch, capsys,
        )
        info = json.loads(stdout.strip().splitlines()[-1])
        n = info["n_orientations"]
        assert n > 10
        rng = np.random.default_rng(9)
        ppath = tmp_path / "dict.npy"
        np.save(ppath, rng.uniform(size=(n, 128, 128)).astype(np.float32))
        db = str(tmp_path / "fz.npz")
        _run(
            ["build", "--patterns", str(ppath), "--angles", angles, "--db", db]
            + SMALL,
            monkeypatch, capsys,
        )
        assert np.load(db)["vectors"].shape[0] == n

    def test_sample_simulate_build_query_loop(self, tmp_path, monkeypatch, capsys):
        """The fully-native dictionary loop: sample orientations, simulate
        kinematical patterns, build the DB, index the simulated patterns
        back — self-queries must recover their own stored orientations."""
        angles = str(tmp_path / "fz.txt")
        _run(["sample", "--group", "432", "--resolution", "16", "--out", angles],
             monkeypatch, capsys)
        pats = str(tmp_path / "sim.npy")
        stdout = _run(
            ["simulate", "--angles", angles, "--out", pats,
             "--max-hkl", "2", "--min-d", "1.0"],
            monkeypatch, capsys,
        )
        info = json.loads(stdout.strip().splitlines()[-1])
        n = info["n_patterns"]
        assert info["shape"] == [128, 128] and info["n_reflectors"] > 5
        db = str(tmp_path / "sim.npz")
        small = ["--inplanes", "2", "--latent-dim", "8", "--batch-size", "16"]
        _run(["build", "--patterns", pats, "--angles", angles, "--db", db]
             + small, monkeypatch, capsys)
        out = str(tmp_path / "o.npy")
        stdout = _run(
            ["query", "--patterns", pats, "--db", db, "--out", out,
             "--top-n", "3", "--min-matches", "1"] + small,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["n_patterns"] == n
        got = np.load(out)
        from latice_tpu.data import parse_angle_file

        want = parse_angle_file(angles)
        # Self-queries: top-1 is the pattern itself, so the fallback/consensus
        # orientation equals the stored angles (canonicalized ranges).
        ok = np.isclose(np.abs(got), np.abs(want), atol=1e-2).all(axis=1)
        assert ok.mean() > 0.9

    def test_query_refine_plumbing(self, tmp_path, monkeypatch, capsys):
        """--refine rebuilds the dictionary's forward model from the npz
        provenance and refines against it. Self-queries pin the plumbing:
        the init is exact, so the refined orientations stay on the stored
        angles with near-perfect NCC. (Sub-grid convergence from perturbed
        inits is pinned at the library level, tests/sim/test_refine.py —
        this random-weights CLI encoder can't index off-grid patterns.)"""
        small = ["--inplanes", "2", "--latent-dim", "8", "--batch-size", "16"]
        ang = str(tmp_path / "fz.txt")
        _run(["sample", "--group", "432", "--resolution", "16", "--out", ang],
             monkeypatch, capsys)
        pats = str(tmp_path / "dict.npy")
        _run(["simulate", "--angles", ang, "--out", pats,
              "--max-hkl", "2", "--min-d", "1.0"], monkeypatch, capsys)
        db = str(tmp_path / "sim.npz")
        _run(["build", "--patterns", pats, "--angles", ang, "--db", db]
             + small, monkeypatch, capsys)

        out = str(tmp_path / "refined.npy")
        stdout = _run(
            ["query", "--patterns", pats, "--db", db, "--out", out,
             "--top-n", "3", "--min-matches", "1", "--refine", "20"] + small,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["refine_steps"] == 20
        assert summary["refine_ncc_median"] > 0.95

        # Candidate re-ranking path: exact self-queries keep k=0 winning,
        # so re-ranked output must agree and report the rerank fraction.
        stdout = _run(
            ["query", "--patterns", pats, "--db", db, "--out", out,
             "--top-n", "3", "--min-matches", "1", "--refine", "20",
             "--refine-candidates", "3"] + small,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["refine_ncc_median"] > 0.95
        assert summary["refine_reranked_frac"] < 0.2

        from latice_tpu.crystal import (
            from_euler_zxz_deg,
            symmetry_reduced_misorientation,
        )
        from latice_tpu.data import parse_angle_file
        import jax.numpy as jnp

        got = np.load(out)
        truth = parse_angle_file(ang)
        err = np.degrees(np.asarray(symmetry_reduced_misorientation(
            from_euler_zxz_deg(jnp.asarray(got, jnp.float32)),
            from_euler_zxz_deg(jnp.asarray(truth, jnp.float32)),
        )))
        assert np.median(err) < 0.2

    def test_simulate_from_master(self, tmp_path, monkeypatch, capsys):
        """--master renders by lookup; the stack builds and self-queries.
        With no mastermeta sidecar and no --fit-bands, no provenance is
        written (a silently-wrong default-phase band fit would be worse),
        so --refine still rejects this dictionary."""
        from latice_tpu.sim import make_kinematical_master

        ang = str(tmp_path / "fz.txt")
        _run(["sample", "--group", "432", "--resolution", "20", "--out", ang],
             monkeypatch, capsys)
        mpath = tmp_path / "master.npy"
        np.save(mpath, make_kinematical_master(size=257))
        pats = str(tmp_path / "m.npy")
        stdout = _run(
            ["simulate", "--angles", ang, "--master", str(mpath),
             "--out", pats, "--uint8"],
            monkeypatch, capsys,
        )
        info = json.loads(stdout.strip().splitlines()[-1])
        assert info["master"] == str(mpath)
        stack = np.load(pats)
        assert stack.dtype == np.uint8 and stack.shape[1:] == (128, 128)
        assert not Path(pats + ".simmeta.json").exists()
        db = str(tmp_path / "m.npz")
        _run(["build", "--patterns", pats, "--angles", ang, "--db", db]
             + SMALL, monkeypatch, capsys)
        with pytest.raises(SystemExit, match="provenance"):
            _run(["query", "--patterns", pats, "--db", db,
                  "--refine", "10"] + SMALL, monkeypatch, capsys)

    def test_dynamical_master_command(self, tmp_path, monkeypatch, capsys):
        """`master` computes a Bloch-wave master natively that `simulate
        --master` consumes directly — the all-native dynamical loop."""
        mpath = str(tmp_path / "dyn_master.npy")
        stdout = _run(
            ["master", "--out", mpath, "--structure", "fcc", "--element",
             "ni", "--size", "33", "--beams", "15", "--max-hkl", "2"],
            monkeypatch, capsys,
        )
        info = json.loads(stdout.strip().splitlines()[-1])
        assert info["n_beams"] <= 15 and info["n_beams"] > 1
        assert info["mean_inner_potential"] > 0
        img = np.load(mpath)
        assert img.shape == (33, 33) and np.all(np.isfinite(img))
        meta = json.loads(Path(mpath + ".mastermeta.json").read_text())
        assert meta["kind"] == "dynamical_master"

        ang = str(tmp_path / "fz.txt")
        _run(["sample", "--group", "432", "--resolution", "25", "--out", ang],
             monkeypatch, capsys)
        pats = str(tmp_path / "dyn.npy")
        stdout = _run(
            ["simulate", "--angles", ang, "--master", mpath, "--out", pats],
            monkeypatch, capsys,
        )
        stack = np.load(pats)
        assert stack.shape[1:] == (128, 128) and np.all(np.isfinite(stack))

    def test_zincblende_master_command(self, tmp_path, monkeypatch, capsys):
        """Non-centrosymmetric phases (GaAs) go through the complex-
        Hermitian Bloch path — `--element cation,anion`."""
        mpath = str(tmp_path / "gaas_master.npy")
        stdout = _run(
            ["master", "--out", mpath, "--structure", "zincblende",
             "--element", "ga,as", "--lattice", "5.653", "--size", "21",
             "--beams", "15", "--max-hkl", "2"],
            monkeypatch, capsys,
        )
        info = json.loads(stdout.strip().splitlines()[-1])
        assert info["n_beams"] > 1
        img = np.load(mpath)
        assert img.shape == (21, 21) and np.all(np.isfinite(img))
        meta = json.loads(Path(mpath + ".mastermeta.json").read_text())
        assert meta["centrosymmetric"] is False

    def test_master_mc_command(self, tmp_path, monkeypatch, capsys):
        """`master --mc` runs the first-party Monte-Carlo backscatter
        stage (sim.montecarlo, the EMMCOpenCL role) and records the
        BSE yield + energy binning in the sidecar metadata."""
        mpath = str(tmp_path / "mc_master.npy")
        stdout = _run(
            ["master", "--out", mpath, "--structure", "fcc", "--element",
             "ni", "--size", "21", "--beams", "15", "--max-hkl", "2",
             "--mc", "--mc-electrons", "20000", "--mc-energy-bins", "4"],
            monkeypatch, capsys,
        )
        info = json.loads(stdout.strip().splitlines()[-1])
        assert 0.4 < info["mc_bse_yield"] < 0.8  # Ni at the 70 deg tilt
        img = np.load(mpath)
        assert img.shape == (21, 21) and np.all(np.isfinite(img))
        meta = json.loads(Path(mpath + ".mastermeta.json").read_text())
        assert meta["mc"] is True
        assert len(meta["mc_energy_weights"]) == 4
        assert len(meta["mc_energy_edges_kev"]) == 5
        np.testing.assert_allclose(
            sum(meta["mc_energy_weights"]), 1.0, atol=2e-3
        )

    def test_master_two_species_element_validation(
        self, tmp_path, monkeypatch, capsys
    ):
        with pytest.raises(SystemExit, match="CATION,ANION"):
            _run(["master", "--out", str(tmp_path / "m.npy"),
                  "--structure", "wurtzite", "--element", "ga"],
                 monkeypatch, capsys)
        with pytest.raises(SystemExit, match="single"):
            _run(["master", "--out", str(tmp_path / "m.npy"),
                  "--structure", "fcc", "--element", "ga,as"],
                 monkeypatch, capsys)

    def test_master_dictionary_refine_composes(
        self, tmp_path, monkeypatch, capsys
    ):
        """Round-3 verdict item 2: `master` → `simulate --master` → `build`
        → `query --refine` must compose — the mastermeta sidecar names the
        phase, bands are fitted automatically and persisted as refinement
        provenance."""
        mpath = str(tmp_path / "dyn_master.npy")
        _run(["master", "--out", mpath, "--structure", "fcc", "--element",
              "ni", "--size", "61", "--beams", "27", "--max-hkl", "3"],
             monkeypatch, capsys)
        ang = str(tmp_path / "fz.txt")
        _run(["sample", "--group", "432", "--resolution", "16", "--out", ang],
             monkeypatch, capsys)
        pats = str(tmp_path / "dyn.npy")
        stdout = _run(
            ["simulate", "--angles", ang, "--master", mpath, "--out", pats],
            monkeypatch, capsys,
        )
        info = json.loads(stdout.strip().splitlines()[-1])
        assert info["refine_provenance"] is True
        assert info["n_fitted_bands"] > 4
        meta = json.loads(Path(pats + ".simmeta.json").read_text())
        assert meta["kind"] == "master_fit"
        assert meta["fit_source"] == "mastermeta"
        assert set(meta["fitted_bands"]) == {
            "normals", "sin_theta", "intensity"
        }

        db = str(tmp_path / "m.npz")
        _run(["build", "--patterns", pats, "--angles", ang, "--db", db]
             + SMALL, monkeypatch, capsys)
        out = str(tmp_path / "refined.npy")
        stdout = _run(
            ["query", "--patterns", pats, "--db", db, "--out", out,
             "--refine", "10", "--top-n", "5", "--min-matches", "1"]
            + SMALL,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["refine_steps"] == 10
        assert -1.0 <= summary["refine_ncc_median"] <= 1.0
        got = np.load(out)
        assert got.shape[1] == 3 and np.isfinite(got).all()

    def test_fit_bands_flag_for_external_masters(
        self, tmp_path, monkeypatch, capsys
    ):
        """An imported master with no mastermeta gets provenance only
        under explicit --fit-bands (structure args supply the phase)."""
        from latice_tpu.sim import make_kinematical_master

        mpath = str(tmp_path / "ext_master.npy")
        np.save(mpath, make_kinematical_master(size=129))
        ang = str(tmp_path / "fz.txt")
        _run(["sample", "--group", "432", "--resolution", "20", "--out", ang],
             monkeypatch, capsys)
        pats = str(tmp_path / "ext.npy")
        stdout = _run(
            ["simulate", "--angles", ang, "--master", mpath, "--out", pats,
             "--fit-bands", "--structure", "fcc", "--lattice", "3.52"],
            monkeypatch, capsys,
        )
        info = json.loads(stdout.strip().splitlines()[-1])
        assert info["refine_provenance"] is True
        meta = json.loads(Path(pats + ".simmeta.json").read_text())
        assert meta["fit_source"] == "cli_args"
        # A kinematical master fit back with its own geometry: near-1 NCC.
        assert meta["fit_ncc"] > 0.98

    def test_refine_without_provenance_rejected(self, tmp_path, monkeypatch, capsys):
        ppath, apath, _ = _write_phase(tmp_path, "dict", 8, seed=10)
        db = str(tmp_path / "plain.npz")
        _run(["build", "--patterns", str(ppath), "--angles", str(apath),
              "--db", db] + SMALL, monkeypatch, capsys)
        with pytest.raises(SystemExit, match="provenance"):
            _run(["query", "--patterns", str(ppath), "--db", db,
                  "--refine", "10"] + SMALL, monkeypatch, capsys)

    def test_native_two_phase_loop(self, tmp_path, monkeypatch, capsys):
        """Fully-native TWO-PHASE loop: sample per-group orientations,
        simulate fcc and hcp dictionaries, build with phase groups 432/622,
        query — per-pixel phases must come back right."""
        small = ["--inplanes", "2", "--latent-dim", "8", "--batch-size", "16"]
        paths = {}
        for phase, (group, structure) in enumerate(
            [("432", "fcc"), ("622", "hcp")]
        ):
            ang = str(tmp_path / f"{structure}.txt")
            _run(["sample", "--group", group, "--resolution", "20",
                  "--out", ang], monkeypatch, capsys)
            pat = str(tmp_path / f"{structure}.npy")
            _run(["simulate", "--angles", ang, "--out", pat,
                  "--structure", structure, "--max-hkl", "2",
                  "--min-d", "1.0", "--uint8"], monkeypatch, capsys)
            paths[structure] = (pat, ang)
        db = str(tmp_path / "mp.npz")
        _run(
            ["build",
             "--patterns", paths["fcc"][0], "--angles", paths["fcc"][1],
             "--patterns", paths["hcp"][0], "--angles", paths["hcp"][1],
             "--phase-groups", "432,622", "--db", db] + small,
            monkeypatch, capsys,
        )
        out = str(tmp_path / "o.npy")
        stdout = _run(
            ["query", "--patterns", paths["hcp"][0], "--db", db, "--out", out,
             "--top-n", "3", "--min-matches", "1"] + small,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        phases = np.load(out.replace(".npy", "") + "_phase.npy")
        # hcp self-queries report phase 1 (band geometry separates phases).
        assert (phases == 1).mean() > 0.9
        assert summary["n_patterns"] == len(phases)

    def test_build_query_multiphase(self, tmp_path, monkeypatch, capsys):
        p0, a0, pat0 = _write_phase(tmp_path, "fcc", 16, seed=1)
        p1, a1, pat1 = _write_phase(tmp_path, "hcp", 16, seed=2)
        db = str(tmp_path / "mp.npz")
        _run(
            ["build", "--patterns", str(p0), "--angles", str(a0),
             "--patterns", str(p1), "--angles", str(a1),
             "--phase-groups", "432,622", "--db", db] + SMALL,
            monkeypatch, capsys,
        )
        data = np.load(db)
        assert list(data["phase_groups"]) == ["432", "622"]
        np.testing.assert_array_equal(
            data["phases"], np.repeat([0, 1], 16).astype(np.int32)
        )

        scan = tmp_path / "scan.npy"
        np.save(scan, np.concatenate([pat1[:4], pat0[:4]]))
        out = str(tmp_path / "o.npy")
        stdout = _run(
            ["query", "--patterns", str(scan), "--db", db, "--out", out,
             "--top-n", "5", "--min-matches", "1"] + SMALL,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        phases = np.load(summary["phase_out"])
        np.testing.assert_array_equal(phases, [1, 1, 1, 1, 0, 0, 0, 0])
        assert summary["phase_counts"] == [4, 4]

    def test_mismatched_pairs_rejected(self, tmp_path, monkeypatch, capsys):
        p0, a0, _ = _write_phase(tmp_path, "x", 8, seed=3)
        with pytest.raises(SystemExit, match="same number"):
            _run(
                ["build", "--patterns", str(p0), "--patterns", str(p0),
                 "--angles", str(a0), "--db", str(tmp_path / "z.npz")] + SMALL,
                monkeypatch, capsys,
            )


class TestAnalyzeCLI:
    def test_analyze_two_grain_map(self, tmp_path, monkeypatch, capsys):
        rng = np.random.default_rng(0)
        euler = np.empty((6, 8, 3))
        euler[:, :4] = [10.0, 20.0, 30.0]
        euler[:, 4:] = [80.0, 60.0, 40.0]
        euler += rng.normal(scale=0.1, size=euler.shape)
        opath = tmp_path / "orients.npy"
        np.save(opath, euler.reshape(-1, 3))
        prefix = str(tmp_path / "an")
        png = str(tmp_path / "pf.png")
        ipf = str(tmp_path / "ipf.png")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "6", "8",
             "--out-prefix", prefix, "--pole-figure", png,
             "--pole", "1", "1", "1", "--ipf-map", ipf],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert summary["n_grains"] == 2
        labels = np.load(prefix + "_grains.npy")
        assert labels.shape == (6, 8)
        assert (labels[:, :4] == 0).all() and (labels[:, 4:] == 1).all()
        assert np.load(prefix + "_kam.npy").max() < 1.0
        assert Path(png).exists()
        # IPF map: a (6, 8) image whose two grains carry distinct colors
        # and whose boundary column is blacked out.
        import matplotlib.image as mpimg

        img = mpimg.imread(ipf)
        assert img.shape[:2] == (6, 8)
        assert not np.allclose(img[0, 0, :3], img[0, 6, :3], atol=0.05)
        boundaries = np.load(prefix + "_boundaries.npy")
        assert (img[boundaries][:, :3] == 0).all()
        # --ipf-map honors the point group: a 622 map colors differently.
        ipf622 = str(tmp_path / "ipf622.png")
        _run(
            ["analyze", "--orientations", str(opath), "--grid", "6", "8",
             "--out-prefix", prefix, "--group", "622", "--ipf-map", ipf622],
            monkeypatch, capsys,
        )
        img622 = mpimg.imread(ipf622)
        assert not np.allclose(img622[0, 0, :3], img[0, 0, :3], atol=0.02)

    def test_analyze_vendor_ang_input(self, tmp_path, monkeypatch, capsys):
        """analyze ingests a TSL .ang directly: grid and phases come from
        the file header — the practitioner's existing OIM/Channel maps need
        no npy conversion."""
        from latice_tpu.data import write_ang
        from latice_tpu.index import DenseIndexResult

        rng = np.random.default_rng(5)
        euler = np.empty((6, 8, 3))
        euler[:, :4] = [10.0, 20.0, 30.0]
        euler[:, 4:] = [80.0, 60.0, 40.0]
        euler += rng.normal(scale=0.1, size=euler.shape)
        n = 48
        phases = np.repeat([0, 1], 24)
        res = DenseIndexResult(
            mean_orientation=euler.reshape(-1, 3),
            best_orientation=euler.reshape(-1, 3),
            success=np.ones(n, bool),
            n_similar=np.full(n, 12, np.int64),
            indices=np.tile(np.arange(5), (n, 1)),
            scores=np.full((n, 5), 0.9),
            phase=phases,
        )
        apath = str(tmp_path / "vendor.ang")
        write_ang(apath, res, grid=(6, 8), step=0.5,
                  phase_groups=["432", "622"])
        prefix = str(tmp_path / "va")
        out = _run(
            ["analyze", "--orientations", apath, "--out-prefix", prefix,
             "--phase-groups", "432,622"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        labels = np.load(prefix + "_grains.npy")
        assert labels.shape == (6, 8)  # grid came from the header
        # 2 orientation domains (cols 0-3 vs 4-7) x 2 phase domains (rows
        # 0-2 vs 3-5, from the file's embedded phase column) = 4 grains.
        assert summary["n_grains"] == 4
        # .npy maps still demand an explicit grid.
        opath = tmp_path / "o.npy"
        np.save(opath, euler.reshape(-1, 3))
        with pytest.raises(SystemExit, match="--grid"):
            _run(["analyze", "--orientations", str(opath),
                  "--out-prefix", prefix], monkeypatch, capsys)

    def test_analyze_clean(self, tmp_path, monkeypatch, capsys):
        """--clean fills unindexed pixels (vendor success mask) and
        dissolves speckle grains before analysis."""
        from latice_tpu.data import write_ang
        from latice_tpu.index import DenseIndexResult

        rng = np.random.default_rng(8)
        euler = np.empty((6, 8, 3))
        euler[:, :4] = [10.0, 20.0, 30.0]
        euler[:, 4:] = [80.0, 60.0, 40.0]
        euler += rng.normal(scale=0.05, size=euler.shape)
        euler[1, 6] = [150.0, 90.0, 10.0]  # 1-px misindexed speckle
        n = 48
        success = np.ones(n, bool)
        success[10] = False  # one unindexed pixel
        res = DenseIndexResult(
            mean_orientation=euler.reshape(-1, 3),
            best_orientation=euler.reshape(-1, 3),
            success=success,
            n_similar=np.where(success, 12, 0).astype(np.int64),
            indices=np.tile(np.arange(5), (n, 1)),
            scores=np.full((n, 5), 0.9),
            phase=None,
        )
        apath = str(tmp_path / "dirty.ang")
        write_ang(apath, res, grid=(6, 8))
        prefix = str(tmp_path / "cl")
        out = _run(
            ["analyze", "--orientations", apath, "--out-prefix", prefix,
             "--clean", "2"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        # The speckle + the unindexed pixel were replaced; the cleaned map
        # segments into exactly the two real grains.
        assert summary["cleaned_px"] == 2
        assert summary["n_grains"] == 2
        cleaned = np.load(prefix + "_cleaned.npy").reshape(6, 8, 3)
        assert abs(cleaned[1, 6, 0] - 80.0) < 1.0

    def test_analyze_grain_stats(self, tmp_path, monkeypatch, capsys):
        rng = np.random.default_rng(1)
        euler = np.empty((6, 8, 3))
        euler[:, :4] = [10.0, 20.0, 30.0]
        euler[:, 4:] = [80.0, 60.0, 40.0]
        euler += rng.normal(scale=0.1, size=euler.shape)
        opath = tmp_path / "o.npy"
        np.save(opath, euler.reshape(-1, 3))
        prefix = str(tmp_path / "gs")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "6", "8",
             "--out-prefix", prefix, "--grain-stats"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert summary["mean_ecd_px"] == pytest.approx(2 * np.sqrt(24 / np.pi), rel=1e-5)
        assert 0 < summary["mean_gos_deg"] < 1.0
        data = np.load(summary["grain_stats"])
        np.testing.assert_array_equal(data["sizes_px"], [24, 24])
        np.testing.assert_allclose(
            data["mean_orientation"][0], [10, 20, 30], atol=0.2
        )
        assert "phase" not in data

    def test_analyze_grain_stats_multiphase(self, tmp_path, monkeypatch, capsys):
        """Per-grain stats on a two-phase map: each grain's mean uses its
        own phase's point group, and the npz carries per-grain phase ids."""
        euler = np.tile([10.0, 30.0, 50.0], (4, 6, 1))
        phases = np.zeros((4, 6), np.int64)
        phases[:, 3:] = 1
        opath = tmp_path / "o.npy"
        fpath = tmp_path / "p.npy"
        np.save(opath, euler.reshape(-1, 3))
        np.save(fpath, phases.ravel())
        prefix = str(tmp_path / "mp")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "4", "6",
             "--phases", str(fpath), "--phase-groups", "432,622",
             "--out-prefix", prefix, "--grain-stats"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        data = np.load(summary["grain_stats"])
        np.testing.assert_array_equal(data["phase"], [0, 1])
        np.testing.assert_array_equal(data["sizes_px"], [12, 12])
        assert data["gos_deg"].max() < 0.1

    def test_analyze_mdf(self, tmp_path, monkeypatch, capsys):
        rng = np.random.default_rng(2)
        euler = np.empty((6, 8, 3))
        euler[:, :4] = [10.0, 20.0, 30.0]
        euler[:, 4:] = [80.0, 60.0, 40.0]
        euler += rng.normal(scale=0.1, size=euler.shape)
        opath = tmp_path / "o.npy"
        np.save(opath, euler.reshape(-1, 3))
        png = str(tmp_path / "mdf.png")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "6", "8",
             "--out-prefix", str(tmp_path / "m"), "--mdf", png],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert Path(png).exists()
        assert 5.0 < summary["mean_boundary_disorientation_deg"] < 63.0

    def test_analyze_mdf_no_boundaries(self, tmp_path, monkeypatch, capsys):
        opath = tmp_path / "flat.npy"
        np.save(opath, np.zeros((12, 3)))
        with pytest.raises(SystemExit, match="no grain-boundary edges"):
            _run(
                ["analyze", "--orientations", str(opath), "--grid", "3", "4",
                 "--out-prefix", str(tmp_path / "n"), "--mdf",
                 str(tmp_path / "n.png")],
                monkeypatch, capsys,
            )

    def test_analyze_schmid_and_components(self, tmp_path, monkeypatch, capsys):
        """--schmid writes factor/system maps; --components reports fractions."""
        euler = np.zeros((4, 6, 3))  # cube texture
        opath = tmp_path / "cube.npy"
        np.save(opath, euler.reshape(-1, 3))
        prefix = str(tmp_path / "sc")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "4", "6",
             "--out-prefix", prefix, "--schmid", "0", "0", "1",
             "--components", "cube,goss"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        # Cube under [001]: the textbook 0.4082 everywhere.
        assert summary["mean_schmid"] == pytest.approx(0.4082, abs=1e-3)
        m = np.load(prefix + "_schmid.npy")
        assert m.shape == (4, 6)
        assert summary["component_fractions"]["cube"] == 1.0
        assert summary["component_fractions"]["goss"] == 0.0
        labels = np.load(prefix + "_components.npy")
        assert (labels == 0).all()

    def test_analyze_odf_sections(self, tmp_path, monkeypatch, capsys):
        """--odf-sections renders the φ2-section figure and reports J."""
        rng = np.random.default_rng(3)
        euler = np.tile([20.0, 30.0, 45.0], (5, 8, 1))
        euler += rng.normal(scale=1.0, size=euler.shape)
        opath = tmp_path / "o.npy"
        np.save(opath, euler.reshape(-1, 3))
        png = str(tmp_path / "odf.png")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "5", "8",
             "--out-prefix", str(tmp_path / "t"), "--odf-sections", png,
             "--odf-phi2", "0,45"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert Path(png).exists()
        # Strong single-component texture: J well above random, sharp max.
        assert summary["texture_index"] > 2.0
        assert summary["odf_max"] > 5.0

    def test_analyze_texture_index_only(self, tmp_path, monkeypatch, capsys):
        rng = np.random.default_rng(4)
        from scipy.spatial.transform import Rotation as R

        euler = R.random(48, random_state=rng).as_euler("zxz", degrees=True)
        opath = tmp_path / "u.npy"
        np.save(opath, euler)
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "6", "8",
             "--out-prefix", str(tmp_path / "u"), "--texture-index",
             "--odf-halfwidth", "25"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert "odf_sections" not in summary
        # 48 random orientations at a wide kernel: approximately random.
        assert summary["texture_index"] < 2.5

    def test_analyze_csl_twin_boundary(self, tmp_path, monkeypatch, capsys):
        """--csl labels a Σ3 bicrystal boundary and reports fractions."""
        import jax.numpy as jnp

        from latice_tpu.crystal import (
            csl_rotation,
            from_euler_zxz_deg,
            quat_mul,
            to_euler_zxz_deg,
        )

        ea = np.asarray([10.0, 20.0, 30.0])
        qa = from_euler_zxz_deg(jnp.asarray(ea))
        eb = np.asarray(to_euler_zxz_deg(quat_mul(qa, csl_rotation("3"))))
        euler = np.empty((4, 6, 3), np.float32)
        euler[:, :3] = ea
        euler[:, 3:] = eb
        opath = tmp_path / "twin.npy"
        np.save(opath, euler.reshape(-1, 3))
        prefix = str(tmp_path / "csl")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "4", "6",
             "--out-prefix", prefix, "--csl", "--csl-sigmas", "3,9"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert summary["csl_sigmas"] == ["3", "9"]
        assert summary["csl_fractions"]["3"] == 1.0
        assert "random" not in summary["csl_fractions"]  # zero fractions dropped
        east = np.load(prefix + "_csl_east.npy")
        assert (east[:, 2] == 0).all()  # the Σ3 column, label index 0

    def test_analyze_csl_rejects_multiphase(self, tmp_path, monkeypatch, capsys):
        opath = tmp_path / "o.npy"
        fpath = tmp_path / "p.npy"
        np.save(opath, np.zeros((12, 3)))
        np.save(fpath, np.zeros(12, np.int64))
        with pytest.raises(SystemExit, match="single-phase"):
            _run(
                ["analyze", "--orientations", str(opath), "--grid", "3", "4",
                 "--phases", str(fpath), "--csl",
                 "--out-prefix", str(tmp_path / "rej")],
                monkeypatch, capsys,
            )

    def test_analyze_parent_reconstruction(self, tmp_path, monkeypatch, capsys):
        """--parent ks rebuilds two austenite grains from a martensite map
        of six child strips (three KS variants per parent)."""
        from latice_tpu.crystal import or_rotation
        from latice_tpu.crystal.csl import _qmul_np
        from latice_tpu.crystal.symmetry import symmetry_quats
        from scipy.spatial.transform import Rotation as R

        rng = np.random.default_rng(0)
        t = or_rotation("ks")
        sym = np.asarray(symmetry_quats("432"), np.float64)
        euler = np.empty((4, 12, 3))
        for p, pe in enumerate([[15.0, 30.0, 45.0], [70.0, 55.0, 10.0]]):
            gp = np.roll(R.from_euler("zxz", pe, degrees=True).as_quat(), 1)
            for j, k in enumerate(rng.choice(24, size=3, replace=False)):
                gc = _qmul_np(sym[k], gp)  # parent-side variant choice
                gc = _qmul_np(t, gc)
                strip = (R.from_quat(np.roll(gc, -1)) * R.from_rotvec(
                    rng.normal(scale=np.radians(0.05), size=(4 * 2, 3))
                )).as_euler("zxz", degrees=True)
                euler[:, (3 * p + j) * 2 : (3 * p + j) * 2 + 2] = strip.reshape(
                    4, 2, 3
                )
        opath = tmp_path / "o.npy"
        np.save(opath, euler.reshape(-1, 3))
        prefix = str(tmp_path / "par")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "4", "12",
             "--out-prefix", prefix, "--parent", "ks"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert summary["n_grains"] == 6
        assert summary["n_parents"] == 2
        assert summary["mean_parent_fit_deg"] < 1.0
        pg = np.load(prefix + "_parent_grains.npy")
        assert pg.shape == (4, 12)
        assert len(set(pg[:, :6].ravel())) == 1
        assert len(set(pg[:, 6:].ravel())) == 1
        assert pg[0, 0] != pg[0, 6]
        po = np.load(prefix + "_parent_orientations.npy")
        assert po.shape == (4, 12, 3)  # feeds back into analyze directly
        var = np.load(prefix + "_variants.npy")
        assert var.shape == (4, 12)
        assert len(set(var[0, :6].tolist())) == 3  # three distinct variants

    def test_analyze_parent_rejects_multiphase(self, tmp_path, monkeypatch, capsys):
        opath = tmp_path / "o.npy"
        fpath = tmp_path / "p.npy"
        np.save(opath, np.zeros((12, 3)))
        np.save(fpath, np.zeros(12, np.int64))
        with pytest.raises(SystemExit, match="single-phase"):
            _run(
                ["analyze", "--orientations", str(opath), "--grid", "3", "4",
                 "--phases", str(fpath), "--parent", "ks",
                 "--out-prefix", str(tmp_path / "rej")],
                monkeypatch, capsys,
            )

    def test_analyze_gnd(self, tmp_path, monkeypatch, capsys):
        """--gnd on a constant-tilt field reports the 1-D textbook bound
        rho = |dtheta/dx| / b."""
        from scipy.spatial.transform import Rotation as R

        c, step, b = 0.05, 2.0, 0.25  # deg/px, um, nm
        g0 = R.from_euler("zxz", [20, 40, 10], degrees=True)
        euler = np.empty((6, 8, 3))
        for j in range(8):
            g = g0 * R.from_rotvec([0, 0, -np.radians(c) * j])
            euler[:, j] = g.as_euler("zxz", degrees=True)
        opath = tmp_path / "o.npy"
        np.save(opath, euler.reshape(-1, 3))
        prefix = str(tmp_path / "g")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "6", "8",
             "--out-prefix", prefix, "--gnd", str(b), "--step-um", str(step)],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        expect = np.radians(c) / (step * 1e-6) / (b * 1e-9)
        assert summary["mean_gnd_per_m2"] == pytest.approx(expect, rel=0.05)
        dens = np.load(prefix + "_gnd.npy")
        assert dens.shape == (6, 8) and np.isnan(dens[-1, 0])
        assert np.load(prefix + "_nye.npy").shape == (6, 8, 5)

    def test_analyze_youngs(self, tmp_path, monkeypatch, capsys):
        """--youngs cu at identity orientation under [001] load = E<100>."""
        opath = tmp_path / "o.npy"
        np.save(opath, np.zeros((12, 3)))
        prefix = str(tmp_path / "y")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "3", "4",
             "--out-prefix", prefix, "--youngs", "cu"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert summary["mean_youngs_gpa"] == pytest.approx(66.7, rel=0.02)
        assert summary["youngs_hill_gpa"] == pytest.approx(127.0, rel=0.03)
        assert np.load(prefix + "_youngs.npy").shape == (3, 4)
        # explicit constants accepted too
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "3", "4",
             "--out-prefix", prefix, "--youngs", "168.4,121.4,75.4",
             "--load", "1", "1", "1"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert summary["mean_youngs_gpa"] == pytest.approx(191.0, rel=0.02)
        with pytest.raises(SystemExit, match="unknown material"):
            _run(
                ["analyze", "--orientations", str(opath), "--grid", "3", "4",
                 "--out-prefix", prefix, "--youngs", "unobtanium"],
                monkeypatch, capsys,
            )

    def test_analyze_taylor(self, tmp_path, monkeypatch, capsys):
        """--taylor at the cube orientation = sqrt(6) under [001] tension."""
        opath = tmp_path / "o.npy"
        np.save(opath, np.zeros((12, 3)))
        prefix = str(tmp_path / "t")
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "3", "4",
             "--out-prefix", prefix, "--taylor"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert summary["mean_taylor"] == pytest.approx(np.sqrt(6.0), rel=1e-4)
        assert np.load(prefix + "_taylor.npy").shape == (3, 4)

    def test_analyze_grid_mismatch(self, tmp_path, monkeypatch, capsys):
        opath = tmp_path / "o.npy"
        np.save(opath, np.zeros((10, 3)))
        with pytest.raises(SystemExit, match="does not hold"):
            _run(
                ["analyze", "--orientations", str(opath), "--grid", "3", "3"],
                monkeypatch, capsys,
            )


class TestSinglePhaseGroup:
    def test_explicit_group_persists_for_one_phase(self, tmp_path, monkeypatch, capsys):
        """--phase-groups 622 with ONE pattern/angle pair must not silently
        fall back to cubic: the group persists and reloads."""
        p0, a0, pats = _write_phase(tmp_path, "hcp", 16, seed=5)
        db = str(tmp_path / "hex.npz")
        _run(
            ["build", "--patterns", str(p0), "--angles", str(a0),
             "--phase-groups", "622", "--db", db] + SMALL,
            monkeypatch, capsys,
        )
        data = np.load(db)
        assert list(data["phase_groups"]) == ["622"]
        np.testing.assert_array_equal(data["phases"], np.zeros(16, np.int32))

        from latice_tpu.index import LatentVectorDatabaseConfig, TpuLatentVectorDatabase

        loaded = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path=db, dimension=8)
        )
        assert loaded.config.phase_symmetries == ["622"]

    def test_analyze_multiphase_map(self, tmp_path, monkeypatch, capsys):
        euler = np.tile([10.0, 30.0, 50.0], (4, 6, 1))
        phases = np.zeros((4, 6), np.int64)
        phases[:, 3:] = 1
        opath = tmp_path / "o.npy"
        fpath = tmp_path / "p.npy"
        np.save(opath, euler.reshape(-1, 3))
        np.save(fpath, phases.ravel())
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "4", "6",
             "--phases", str(fpath), "--phase-groups", "432,622",
             "--out-prefix", str(tmp_path / "mp")],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        assert summary["n_grains"] == 2  # identical orientations; phase split


class TestReviewFixesR3c:
    """Regressions pinned from the round-3 review of the analysis plane."""

    @staticmethod
    def _vendor_ang_with_blob(tmp_path, multiphase: bool):
        """A 6x8 vendor .ang whose rows 2-3 x cols 2-4 are unindexed.

        write_ang emits constant (0,0,0) Eulers + CI=-1 for failed pixels —
        the exact pattern that fused into a pseudo-grain when phase ids were
        clamped to 0 before segmentation.
        """
        from latice_tpu.data import write_ang
        from latice_tpu.index import DenseIndexResult

        rng = np.random.default_rng(11)
        euler = np.empty((6, 8, 3))
        euler[:, :4] = [10.0, 20.0, 30.0]
        euler[:, 4:] = [80.0, 60.0, 40.0]
        euler += rng.normal(scale=0.05, size=euler.shape)
        success = np.ones((6, 8), bool)
        success[2:4, 2:5] = False  # 6-px contiguous unindexed blob
        euler[~success] = np.nan  # write_ang nan_to_num's these to 0,0,0
        phase = np.repeat([0, 1], 24) if multiphase else None
        res = DenseIndexResult(
            mean_orientation=euler.reshape(-1, 3),
            best_orientation=euler.reshape(-1, 3),
            success=success.reshape(-1),
            n_similar=np.where(success.reshape(-1), 12, 0).astype(np.int64),
            indices=np.tile(np.arange(5), (48, 1)),
            scores=np.full((48, 5), 0.9),
            phase=phase,
        )
        apath = str(tmp_path / "blob.ang")
        kw = {"phase_groups": ["432", "622"]} if multiphase else {}
        write_ang(apath, res, grid=(6, 8), step=0.5, **kw)
        return apath

    def test_unindexed_blob_never_fuses_multiphase(
        self, tmp_path, monkeypatch, capsys
    ):
        """Vendor -1 phase ids reach the segmentation intact: the 6-px
        unindexed blob segments as 6 isolated pixels, not one pseudo-grain
        counted alongside the real grains."""
        apath = self._vendor_ang_with_blob(tmp_path, multiphase=True)
        prefix = str(tmp_path / "mp")
        out = _run(
            ["analyze", "--orientations", apath, "--out-prefix", prefix,
             "--phase-groups", "432,622"],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        labels = np.load(prefix + "_grains.npy")
        blob = labels[2:4, 2:5]
        # Every blob pixel is its own boundary-ringed grain.
        assert len(np.unique(blob)) == blob.size
        # 2 orientation domains x 2 phase rows... the blob straddles the
        # phase split, so real grains = 4ish; the key claim is the blob
        # contributes 6 singletons rather than 1 fused grain.
        assert summary["n_grains"] >= 4 + blob.size

    def test_unindexed_blob_never_fuses_single_phase(
        self, tmp_path, monkeypatch, capsys
    ):
        """Single-phase vendor files take the same isolation path via the
        success mask (no phase column needed)."""
        apath = self._vendor_ang_with_blob(tmp_path, multiphase=False)
        prefix = str(tmp_path / "sp")
        out = _run(
            ["analyze", "--orientations", apath, "--out-prefix", prefix],
            monkeypatch, capsys,
        )
        json.loads(out.strip().splitlines()[-1])
        labels = np.load(prefix + "_grains.npy")
        blob = labels[2:4, 2:5]
        assert len(np.unique(blob)) == blob.size

    @pytest.mark.parametrize("flag", [
        ["--schmid", "0", "0", "1"],
        ["--taylor"],
        ["--components", "all"],
    ])
    def test_single_phase_analyses_refuse_multiphase_maps(
        self, tmp_path, monkeypatch, capsys, flag
    ):
        """--schmid/--taylor/--components are single-group math; on a
        multi-phase map they must refuse instead of silently mixing
        phases (consistent with --csl/--gnd/--youngs)."""
        euler = np.tile([10.0, 30.0, 50.0], (4, 6, 1))
        phases = np.zeros((4, 6), np.int64)
        phases[:, 3:] = 1
        opath = tmp_path / "o.npy"
        fpath = tmp_path / "p.npy"
        np.save(opath, euler.reshape(-1, 3))
        np.save(fpath, phases.ravel())
        with pytest.raises(SystemExit, match="single-phase"):
            _run(
                ["analyze", "--orientations", str(opath), "--grid", "4", "6",
                 "--phases", str(fpath), "--phase-groups", "432,622",
                 "--out-prefix", str(tmp_path / "x")] + flag,
                monkeypatch, capsys,
            )

    def test_gnd_all_masked_reports_null_not_nan(
        self, tmp_path, monkeypatch, capsys
    ):
        """A map where every forward difference crosses a boundary yields an
        all-NaN GND field; the JSON summary must say null, not bare NaN."""
        euler = np.zeros((4, 4, 3))
        # Checkerboard of two far-apart orientations: every edge is a
        # boundary, so no pixel has a valid curvature stencil.
        ii, jj = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
        euler[(ii + jj) % 2 == 1] = [60.0, 40.0, 20.0]
        opath = tmp_path / "o.npy"
        np.save(opath, euler.reshape(-1, 3))
        out = _run(
            ["analyze", "--orientations", str(opath), "--grid", "4", "4",
             "--out-prefix", str(tmp_path / "g"), "--gnd", "0.25"],
            monkeypatch, capsys,
        )
        line = out.strip().splitlines()[-1]
        summary = json.loads(line, parse_constant=lambda s: pytest.fail(
            f"non-strict JSON constant {s!r} in the analyze summary"
        ))
        assert summary["mean_gnd_per_m2"] is None
        assert summary["gnd_valid_fraction"] == 0.0


class TestPatternDICli:
    """index.py di — the zero-training native loop (sample -> simulate -> di)."""

    def test_native_di_loop(self, tmp_path, monkeypatch, capsys):
        ang = str(tmp_path / "fcc.txt")
        _run(["sample", "--group", "432", "--resolution", "20",
              "--out", ang], monkeypatch, capsys)
        pat = str(tmp_path / "fcc.npy")
        _run(["simulate", "--angles", ang, "--out", pat,
              "--structure", "fcc", "--max-hkl", "2", "--min-d", "1.0",
              "--uint8"], monkeypatch, capsys)
        out = str(tmp_path / "di.npy")
        angf = str(tmp_path / "di.ang")
        stdout = _run(
            ["di", "--dict-patterns", pat, "--dict-angles", ang,
             "--patterns", pat, "--out", out, "--top-n", "3",
             "--min-matches", "1", "--batch-size", "16", "--ang", angf],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["success_rate"] == 1.0
        # Self-queries: the top NCC is the pattern itself.
        assert summary["mean_top_ncc"] > 0.999
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.data import parse_angle_file, read_ang

        truth = parse_angle_file(ang)
        got = np.load(out)
        err = np.degrees(
            (
                R.from_euler("zxz", got, degrees=True).inv()
                * R.from_euler("zxz", truth, degrees=True)
            ).magnitude()
        )
        # Self-queries on a 20-deg grid: no other candidate sits within the
        # 3-deg consensus threshold, so the mean IS the truth row.
        assert np.median(err) < 0.1
        vmap = read_ang(angf)
        assert vmap.success.all()

    def test_di_bin_and_int8(self, tmp_path, monkeypatch, capsys):
        ang = str(tmp_path / "fcc.txt")
        _run(["sample", "--group", "432", "--resolution", "25",
              "--out", ang], monkeypatch, capsys)
        pat = str(tmp_path / "fcc.npy")
        _run(["simulate", "--angles", ang, "--out", pat,
              "--structure", "fcc", "--max-hkl", "2", "--min-d", "1.0",
              "--uint8"], monkeypatch, capsys)
        out = str(tmp_path / "di.npy")
        stdout = _run(
            ["di", "--dict-patterns", pat, "--dict-angles", ang,
             "--patterns", pat, "--out", out, "--bin", "2",
             "--engine", "int8", "--top-n", "3", "--min-matches", "1",
             "--batch-size", "16"],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["mean_top_ncc"] > 0.99

    def test_di_multiphase(self, tmp_path, monkeypatch, capsys):
        paths = {}
        for structure, group in [("fcc", "432"), ("hcp", "622")]:
            ang = str(tmp_path / f"{structure}.txt")
            _run(["sample", "--group", group, "--resolution", "25",
                  "--out", ang], monkeypatch, capsys)
            pat = str(tmp_path / f"{structure}.npy")
            _run(["simulate", "--angles", ang, "--out", pat,
                  "--structure", structure, "--max-hkl", "2",
                  "--min-d", "1.0", "--uint8"], monkeypatch, capsys)
            paths[structure] = (pat, ang)
        out = str(tmp_path / "mp.npy")
        stdout = _run(
            ["di",
             "--dict-patterns", paths["fcc"][0], "--dict-angles", paths["fcc"][1],
             "--dict-patterns", paths["hcp"][0], "--dict-angles", paths["hcp"][1],
             "--phase-groups", "432,622",
             "--patterns", paths["hcp"][0], "--out", out,
             "--top-n", "3", "--min-matches", "1", "--batch-size", "16"],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        phases = np.load(out.replace(".npy", "") + "_phase.npy")
        # Pattern-space NCC separates the phases at least as well as the
        # latent engine: hcp self-queries come back phase 1.
        assert (phases == 1).mean() > 0.9
        assert "phase_counts" in summary

    def test_di_streamed_multiphase_with_ambiguity(
        self, tmp_path, monkeypatch, capsys
    ):
        """--streamed two-phase DI matches the resident run (verdict r3
        item 4) and --ambiguity writes the diagnostic npz on BOTH paths."""
        paths = {}
        for structure, group in [("fcc", "432"), ("hcp", "622")]:
            ang = str(tmp_path / f"{structure}.txt")
            _run(["sample", "--group", group, "--resolution", "25",
                  "--out", ang], monkeypatch, capsys)
            pat = str(tmp_path / f"{structure}.npy")
            _run(["simulate", "--angles", ang, "--out", pat,
                  "--structure", structure, "--max-hkl", "2",
                  "--min-d", "1.0", "--uint8"], monkeypatch, capsys)
            paths[structure] = (pat, ang)
        base = [
            "di",
            "--dict-patterns", paths["fcc"][0],
            "--dict-angles", paths["fcc"][1],
            "--dict-patterns", paths["hcp"][0],
            "--dict-angles", paths["hcp"][1],
            "--phase-groups", "432,622",
            "--patterns", paths["hcp"][0],
            "--search-dtype", "float32",
            "--top-n", "3", "--min-matches", "1", "--batch-size", "16",
        ]
        out_r = str(tmp_path / "res.npy")
        amb_r = str(tmp_path / "res_amb.npz")
        s1 = json.loads(_run(
            base + ["--out", out_r, "--ambiguity", amb_r],
            monkeypatch, capsys,
        ).strip().splitlines()[-1])
        out_s = str(tmp_path / "str.npy")
        amb_s = str(tmp_path / "str_amb.npz")
        s2 = json.loads(_run(
            base + ["--out", out_s, "--streamed", "--ambiguity", amb_s],
            monkeypatch, capsys,
        ).strip().splitlines()[-1])
        np.testing.assert_array_equal(
            np.load(out_r.replace(".npy", "") + "_phase.npy"),
            np.load(out_s.replace(".npy", "") + "_phase.npy"),
        )
        np.testing.assert_allclose(np.load(out_r), np.load(out_s), atol=1e-3)
        assert s1["phase_counts"] == s2["phase_counts"]
        for amb in (amb_r, amb_s):
            z = np.load(amb)
            assert set(z.files) == {"angle_deg", "score_gap", "has_rival"}
        assert "ambiguous_frac" in s2

    def test_di_pair_mismatch_rejected(self, tmp_path, monkeypatch, capsys):
        with pytest.raises(SystemExit, match="same number"):
            _run(["di", "--dict-patterns", "a.npy",
                  "--dict-patterns", "b.npy", "--dict-angles", "a.txt",
                  "--patterns", "q.npy"], monkeypatch, capsys)


class TestQualityCli:
    """index.py quality — Hough band detection + IQ maps."""

    def test_quality_on_simulated_patterns(self, tmp_path, monkeypatch, capsys):
        """Kinematical renders have real Kikuchi bands: the detector must
        find several per pattern, and IQ must drop when noise is added."""
        ang = str(tmp_path / "a.txt")
        _run(["sample", "--group", "432", "--resolution", "30",
              "--out", ang], monkeypatch, capsys)
        pat = str(tmp_path / "p.npy")
        _run(["simulate", "--angles", ang, "--out", pat,
              "--structure", "fcc", "--max-hkl", "2", "--min-d", "1.0"],
             monkeypatch, capsys)
        clean = np.load(pat)
        rng = np.random.default_rng(4)
        noisy = clean + rng.normal(scale=0.5, size=clean.shape).astype(
            clean.dtype
        )
        np.save(tmp_path / "noisy.npy", noisy)
        out_clean = _run(
            ["quality", "--patterns", pat,
             "--out-prefix", str(tmp_path / "qc"), "--batch-size", "8"],
            monkeypatch, capsys,
        )
        out_noisy = _run(
            ["quality", "--patterns", str(tmp_path / "noisy.npy"),
             "--out-prefix", str(tmp_path / "qn"), "--batch-size", "8"],
            monkeypatch, capsys,
        )
        sc = json.loads(out_clean.strip().splitlines()[-1])
        sn = json.loads(out_noisy.strip().splitlines()[-1])
        assert sc["mean_band_count"] >= 2.0
        assert sc["mean_iq"] > sn["mean_iq"]
        bands = np.load(str(tmp_path / "qc") + "_bands.npz")
        assert bands["theta_deg"].shape[1] == 10

    def test_quality_grid_and_map(self, tmp_path, monkeypatch, capsys):
        rng = np.random.default_rng(0)
        pats = rng.uniform(size=(6, 96, 96)).astype(np.float32)
        p = tmp_path / "p.npy"
        np.save(p, pats)
        png = str(tmp_path / "iq.png")
        out = _run(
            ["quality", "--patterns", str(p), "--scan-grid", "2", "3",
             "--out-prefix", str(tmp_path / "q"), "--batch-size", "4",
             "--iq-map", png],
            monkeypatch, capsys,
        )
        summary = json.loads(out.strip().splitlines()[-1])
        iq = np.load(str(tmp_path / "q") + "_iq.npy")
        assert iq.shape == (2, 3)
        assert summary["iq_map"] == png
        import os

        assert os.path.exists(png)


class TestHoughCli:
    """index.py hough — band-based orientation indexing from the CLI."""

    def test_hough_roundtrip_with_ang(self, tmp_path, monkeypatch, capsys):
        """sample → simulate → hough must recover the sampled orientations
        (cubic-symmetry-aware) and export a parseable .ang file."""
        import math

        from scipy.spatial.transform import Rotation as R

        from latice_tpu.crystal import ROTATION_GROUPS
        from latice_tpu.data import parse_angle_file

        ang = str(tmp_path / "a.txt")
        _run(["sample", "--group", "432", "--resolution", "30",
              "--out", ang], monkeypatch, capsys)
        pat = str(tmp_path / "p.npy")
        _run(["simulate", "--angles", ang, "--out", pat,
              "--structure", "fcc", "--max-hkl", "2", "--min-d", "1.0"],
             monkeypatch, capsys)
        out = str(tmp_path / "h.npy")
        angf = str(tmp_path / "h.ang")
        stdout = _run(
            ["hough", "--patterns", pat, "--out", out,
             "--structure", "fcc", "--max-hkl", "2", "--min-d", "1.0",
             "--grid-resolution", "5", "--tolerance", "4",
             "--batch-size", "8", "--ang", angf],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["success_rate"] == 1.0
        eulers = np.load(out)
        truth = parse_angle_file(ang)
        assert eulers.shape == truth.shape
        sym = R.from_quat(np.roll(ROTATION_GROUPS["432"], -1, axis=1))
        errs = []
        for est, tru in zip(
            R.from_euler("zxz", eulers, degrees=True),
            R.from_euler("zxz", truth, degrees=True),
        ):
            errs.append(
                math.degrees(
                    min(((est * s).inv() * tru).magnitude() for s in sym)
                )
            )
        assert np.median(errs) < 2.0
        detail = np.load(str(tmp_path / "h_detail.npz"))
        assert detail["n_matched"].min() >= 4
        from latice_tpu.data import read_ang

        vm = read_ang(angf)
        assert len(vm.eulers) == len(truth)
        np.testing.assert_allclose(np.mod(vm.eulers, 360.0), eulers, atol=0.5)

    def test_hough_refine_beats_raw(self, tmp_path, monkeypatch, capsys):
        """`hough --refine` (autodiff through the renderer, seeded by the
        band solution) must land well below the raw Hough accuracy — the
        Radon bins cap the raw solve at ~1 deg, inside the NCC basin."""
        import math

        from scipy.spatial.transform import Rotation as R

        from latice_tpu.crystal import ROTATION_GROUPS
        from latice_tpu.data import parse_angle_file

        ang = str(tmp_path / "a.txt")
        _run(["sample", "--group", "432", "--resolution", "40",
              "--out", ang], monkeypatch, capsys)
        pat = str(tmp_path / "p.npy")
        _run(["simulate", "--angles", ang, "--out", pat,
              "--structure", "fcc", "--max-hkl", "2", "--min-d", "1.0"],
             monkeypatch, capsys)
        truth = parse_angle_file(ang)
        sym = R.from_quat(np.roll(ROTATION_GROUPS["432"], -1, axis=1))

        def run_errs(extra):
            out = str(tmp_path / f"h{len(extra)}.npy")
            stdout = _run(
                ["hough", "--patterns", pat, "--out", out,
                 "--structure", "fcc", "--max-hkl", "2", "--min-d", "1.0",
                 "--grid-resolution", "5", "--tolerance", "4",
                 "--batch-size", "8"] + extra,
                monkeypatch, capsys,
            )
            summary = json.loads(stdout.strip().splitlines()[-1])
            eulers = np.load(out)
            errs = [
                math.degrees(
                    min(((est * s).inv() * tru).magnitude() for s in sym)
                )
                for est, tru in zip(
                    R.from_euler("zxz", eulers, degrees=True),
                    R.from_euler("zxz", truth, degrees=True),
                )
            ]
            return np.asarray(errs), summary

        raw, _ = run_errs([])
        refined, summary = run_errs(["--refine", "30"])
        assert summary["refine_steps"] == 30
        assert summary["refine_ncc_median"] > 0.8  # same renderer: near 1
        assert np.median(refined) < 0.6 * np.median(raw), (
            raw.tolist(), refined.tolist(),
        )


class TestSphereCli:
    """index.py sphere — dictionary-free spherical-harmonic indexing."""

    def test_sphere_recovers_orientations_with_ang(
        self, tmp_path, monkeypatch, capsys
    ):
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.crystal.symmetry import (
            ROTATION_GROUPS,
            symmetry_reduced_misorientation,
        )
        from latice_tpu.sim import (
            DetectorGeometry,
            make_kinematical_master,
            render_from_master,
        )

        rng = np.random.default_rng(0)
        master = make_kinematical_master(size=257)
        mpath = str(tmp_path / "m.npy")
        np.save(mpath, master)
        q_true = np.roll(R.random(6, rng).as_quat(), 1, axis=1)
        pats = render_from_master(
            master, q_true, DetectorGeometry(shape=(128, 128))
        )
        ppath = str(tmp_path / "p.npy")
        np.save(ppath, pats.astype(np.float32))
        out = str(tmp_path / "s.npy")
        angf = str(tmp_path / "s.ang")
        ambf = str(tmp_path / "amb.npz")
        stdout = _run(
            ["sphere", "--patterns", ppath, "--master", mpath,
             "--out", out, "--bandwidth", "24", "--batch-size", "6",
             "--ang", angf, "--scan-grid", "2", "3",
             "--ambiguity", ambf],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["n_patterns"] == 6
        # Secondary-peak pseudo-symmetry diagnostic: same npz contract
        # as `query --ambiguity` (angle/gap/has_rival per pixel).
        assert summary["ambiguity_out"] == ambf
        assert 0.0 <= summary["ambiguous_frac"] <= 1.0
        amb = np.load(ambf)
        assert amb["angle_deg"].shape == (6,)
        # At L=24 the own-basin radius is 15 deg — a rival beyond it may
        # or may not appear in the default cell budget per pattern.
        has = amb["has_rival"]
        assert (amb["score_gap"][has] >= 0).all()
        assert (amb["angle_deg"][has] > 15.0).all()
        assert np.isnan(amb["score_gap"][~has]).all()
        # Single-phase keeps the scalar JSON contract (r4 advisor).
        assert summary["kept_degrees"] <= 12  # Friedel: even l only
        eulers = np.load(out)
        assert eulers.shape == (6, 3)
        detail = np.load(str(tmp_path / "s_detail.npz"))
        import jax.numpy as jnp

        sym = jnp.asarray(np.asarray(ROTATION_GROUPS["432"], np.float32))
        err = np.degrees(np.asarray(symmetry_reduced_misorientation(
            jnp.asarray(q_true, jnp.float32),
            jnp.asarray(detail["quaternions"], jnp.float32),
            sym,
        )))
        assert np.median(err) < 2.0, err  # 7.5 deg grid at L=24
        from latice_tpu.data import read_ang

        vm = read_ang(angf)
        assert len(vm.eulers) == 6 and vm.grid == (2, 3)

    def test_sphere_multiphase_cli(self, tmp_path, monkeypatch, capsys):
        # Repeated --master flags = dictionary-free phase discrimination:
        # per-pattern winner by normalized correlation peak, phase map in
        # the detail npz, per-phase .ang header blocks.
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.sim import (
            DetectorGeometry,
            hexagonal_reflectors,
            make_kinematical_master,
            render_from_master,
        )

        rng = np.random.default_rng(5)
        m_fcc = make_kinematical_master(size=257)
        m_hcp = make_kinematical_master(
            size=257, reflectors=hexagonal_reflectors()
        )
        mf = str(tmp_path / "fcc.npy")
        mh = str(tmp_path / "hcp.npy")
        np.save(mf, m_fcc)
        np.save(mh, m_hcp)
        geom = DetectorGeometry(shape=(128, 128))
        q_f = np.roll(R.random(3, rng).as_quat(), 1, axis=1)
        q_h = np.roll(R.random(3, rng).as_quat(), 1, axis=1)
        pats = np.concatenate(
            [
                render_from_master(m_fcc, q_f, geom),
                render_from_master(m_hcp, q_h, geom),
            ]
        ).astype(np.float32)
        ppath = str(tmp_path / "p.npy")
        np.save(ppath, pats)
        out = str(tmp_path / "s.npy")
        angf = str(tmp_path / "s.ang")
        stdout = _run(
            ["sphere", "--patterns", ppath,
             "--master", mf, "--master", mh,
             "--group", "432", "--group", "622",
             "--phase-name", "nickel", "--phase-name", "titanium",
             "--lattice", "3.52", "--lattice", "2.95",
             "--lattice-c", "3.52", "--lattice-c", "4.68",
             "--out", out, "--bandwidth", "24", "--batch-size", "3",
             "--ang", angf, "--scan-grid", "2", "3"],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["n_phases"] == 2
        assert summary["phase_counts"] == [3, 3]
        detail = np.load(str(tmp_path / "s_detail.npz"))
        np.testing.assert_array_equal(detail["phase"], [0, 0, 0, 1, 1, 1])
        assert detail["phase_scores"].shape == (6, 2)
        from latice_tpu.data import read_ang

        vm = read_ang(angf)
        np.testing.assert_array_equal(vm.phase, [0, 0, 0, 1, 1, 1])
        header = open(angf).read()
        assert "nickel" in header and "titanium" in header

    def test_sphere_per_phase_flag_count_mismatch(
        self, tmp_path, monkeypatch, capsys
    ):
        from latice_tpu.sim import make_kinematical_master

        mf = str(tmp_path / "m.npy")
        np.save(mf, make_kinematical_master(size=65))
        ppath = str(tmp_path / "p.npy")
        np.save(ppath, np.zeros((1, 128, 128), np.float32))
        with pytest.raises(SystemExit, match="--group"):
            _run(
                ["sphere", "--patterns", ppath, "--master", mf,
                 "--group", "432", "--group", "622",
                 "--bandwidth", "8"],
                monkeypatch, capsys,
            )


class TestHoughCliMultiPhase:
    """index.py hough --phase ... --phase ...: vendor multi-phase band
    indexing (verdict item 3) — per-pixel phase discrimination, phase map
    output, multi-phase .ang headers, arbitrary cells via JSON specs."""

    def _render_two_phases(self, tmp_path, monkeypatch, capsys):
        ang_f = str(tmp_path / "f.txt")
        _run(["sample", "--group", "432", "--resolution", "30",
              "--out", ang_f], monkeypatch, capsys)
        pat_f = str(tmp_path / "pf.npy")
        _run(["simulate", "--angles", ang_f, "--out", pat_f,
              "--structure", "fcc", "--max-hkl", "2", "--min-d", "1.0"],
             monkeypatch, capsys)
        ang_h = str(tmp_path / "h.txt")
        _run(["sample", "--group", "622", "--resolution", "30",
              "--out", ang_h], monkeypatch, capsys)
        pat_h = str(tmp_path / "ph.npy")
        _run(["simulate", "--angles", ang_h, "--out", pat_h,
              "--structure", "hcp", "--lattice", "2.95",
              "--lattice-c", "4.68", "--max-hkl", "3", "--min-d", "1.0"],
             monkeypatch, capsys)
        f, h = np.load(pat_f), np.load(pat_h)
        mixed = str(tmp_path / "mixed.npy")
        np.save(mixed, np.concatenate([f, h]))
        return mixed, len(f), len(h)

    def test_two_phase_discrimination(self, tmp_path, monkeypatch, capsys):
        mixed, n_f, n_h = self._render_two_phases(
            tmp_path, monkeypatch, capsys
        )
        out = str(tmp_path / "mp.npy")
        angf = str(tmp_path / "mp.ang")
        stdout = _run(
            ["hough", "--patterns", mixed, "--out", out,
             "--phase", "ni=fcc:3.52", "--phase", "ti=hcp:2.95:4.68",
             "--max-hkl", "3", "--min-d", "1.0",
             "--grid-resolution", "5", "--tolerance", "4",
             "--bands", "10", "--batch-size", "8", "--ang", angf],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["phase_names"] == ["ni", "ti"]
        assert summary["phase_counts"] == [n_f, n_h]
        phase = np.load(summary["phase_out"])
        assert (phase[:n_f] == 0).all() and (phase[n_f:] == 1).all()
        detail = np.load(str(tmp_path / "mp_detail.npz"))
        assert (detail["phase"] == phase).all()
        assert detail["band_score"].min() > 0
        from latice_tpu.data import read_ang

        vm = read_ang(angf)
        # The phase column mirrors the phase map (read_ang normalizes the
        # 1-based .ang column to 0-based ids); both header blocks carry
        # their own group + true cell.
        np.testing.assert_array_equal(vm.phase, phase)
        txt = Path(angf).read_text()
        assert "ni" in txt and "ti" in txt
        assert "4.680" in txt  # hcp c constant, not the placeholder

    def test_cell_json_spec(self, tmp_path, monkeypatch, capsys):
        """An arbitrary-cell JSON spec (bcc via explicit basis) indexes
        bcc renders — the reflectors_from_cell path end to end."""
        ang = str(tmp_path / "b.txt")
        _run(["sample", "--group", "432", "--resolution", "35",
              "--out", ang], monkeypatch, capsys)
        pat = str(tmp_path / "pb.npy")
        _run(["simulate", "--angles", ang, "--out", pat,
              "--structure", "bcc", "--lattice", "2.87",
              "--max-hkl", "2", "--min-d", "1.0"],
             monkeypatch, capsys)
        cell = tmp_path / "ferrite.json"
        cell.write_text(json.dumps({
            "name": "ferrite", "group": "432", "a": 2.87,
            "basis": [[0, 0, 0], [0.5, 0.5, 0.5]],
            "max_hkl": 2, "min_d": 1.0,
        }))
        out = str(tmp_path / "bo.npy")
        stdout = _run(
            ["hough", "--patterns", pat, "--out", out,
             "--phase", str(cell), "--phase", "fcc:3.52",
             "--min-d", "1.0", "--grid-resolution", "5",
             "--tolerance", "4", "--batch-size", "8"],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["phase_names"] == ["ferrite", "fcc"]
        # Every bcc render must pick the ferrite JSON phase.
        phase = np.load(summary["phase_out"])
        assert (phase == 0).all()

    def test_bad_phase_specs_rejected(self, tmp_path, monkeypatch, capsys):
        with pytest.raises(SystemExit, match="structure"):
            _run(["hough", "--patterns", "x.npy", "--out", "o.npy",
                  "--phase", "diamond:3.57"], monkeypatch, capsys)
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"a": 3.0}))
        with pytest.raises(SystemExit, match="group"):
            _run(["hough", "--patterns", "x.npy", "--out", "o.npy",
                  "--phase", str(bad)], monkeypatch, capsys)


class TestHoughIqInQuery:
    """query --hough-iq: detector-side IQ rides the indexing stream and
    lands in the .ang IQ / .ctf Bands columns."""

    def test_materialized_scan(self, tmp_path, monkeypatch, capsys):
        ppath, apath, patterns = _write_phase(tmp_path, "dict", 24, seed=0)
        db = str(tmp_path / "idx.npz")
        _run(["build", "--patterns", str(ppath), "--angles", str(apath),
              "--db", db] + SMALL, monkeypatch, capsys)
        out = str(tmp_path / "o.npy")
        angf = str(tmp_path / "o.ang")
        ctff = str(tmp_path / "o.ctf")
        stdout = _run(
            ["query", "--patterns", str(ppath), "--db", db, "--out", out,
             "--top-n", "5", "--min-matches", "1", "--hough-iq",
             "--ang", angf, "--ctf", ctff, "--scan-grid", "4", "6"] + SMALL,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        hiq = np.load(summary["hough_iq_out"])
        assert hiq.shape == (24,)
        assert np.isfinite(hiq).all()
        # The .ang IQ column carries the Hough values (column 6).
        rows = [l.split() for l in open(angf) if not l.startswith("#")]
        ang_iq = np.array([float(r[5]) for r in rows])
        np.testing.assert_allclose(ang_iq, hiq, atol=5e-4)

    def test_streamed_h5_scan(self, tmp_path, monkeypatch, capsys):
        h5py = pytest.importorskip("h5py")
        ppath, apath, patterns = _write_phase(tmp_path, "dict", 24, seed=1)
        db = str(tmp_path / "idx.npz")
        _run(["build", "--patterns", str(ppath), "--angles", str(apath),
              "--db", db] + SMALL, monkeypatch, capsys)
        h5path = str(tmp_path / "scan.h5")
        with h5py.File(h5path, "w") as f:
            f.create_dataset("Scan 1/EBSD/Data/Pattern", data=patterns)
        out = str(tmp_path / "o.npy")
        stdout = _run(
            ["query", "--patterns", h5path, "--db", db, "--out", out,
             "--top-n", "5", "--min-matches", "1", "--hough-iq",
             "--h5-chunk", "10"] + SMALL,
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        hiq = np.load(summary["hough_iq_out"])
        # Streamed slab-by-slab (10+10+4) yet one IQ row per pattern.
        assert hiq.shape == (24,)
        assert summary["n_patterns"] == 24


class TestCalibrateCli:
    """index.py calibrate — autodiff PC calibration from the CLI."""

    @pytest.fixture(scope="class")
    def scan(self, tmp_path_factory):
        """A 3x4 synthetic scan whose PC drifts affinely with position."""
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.sim import (
            DetectorGeometry, cubic_reflectors, simulate_patterns,
        )

        td = tmp_path_factory.mktemp("calscan")
        rng = np.random.default_rng(7)
        refl = cubic_reflectors("fcc", max_hkl=2, min_d=1.0)
        pc0 = np.array([0.52, 0.47, 0.68])
        g = np.array([[-0.03 / 3.0, 0.0], [0.0, 0.02 / 2.0],
                      [0.0, 0.01 / 2.0]])  # per scan STEP (step=1)
        rr, cc = np.divmod(np.arange(12), 4)
        scan_xy = np.stack([cc.astype(float), rr.astype(float)], axis=1)
        truth = R.random(12, random_state=rng)
        tq = np.roll(truth.as_quat(), 1, axis=1).astype(np.float32)
        pats = []
        for i, xy in enumerate(scan_xy):
            pc = pc0 + g @ xy
            geom = DetectorGeometry(shape=(64, 64), pcx=pc[0], pcy=pc[1],
                                    dd=pc[2])
            pats.append(simulate_patterns(tq[i:i + 1], geom, refl)[0])
        ppath = td / "p.npy"
        np.save(ppath, np.stack(pats))
        qpath = td / "q.npy"
        np.save(qpath, tq)
        return td, ppath, qpath, pc0, g

    def test_shared_pc_fit(self, scan, monkeypatch, capsys):
        td, ppath, qpath, pc0, g = scan
        out = str(td / "shared.npz")
        stdout = _run(
            ["calibrate", "--patterns", str(ppath),
             "--orientations", str(qpath), "--out", out,
             "--max-hkl", "2", "--min-d", "1.0", "--pin",
             "--steps", "150"],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["model"] == "shared"
        assert summary["pinned"] is True
        assert summary["mean_ncc"] > 0.8
        saved = np.load(out)
        # The shared fit lands near the scan-mean PC (the affine drift is
        # unmodelled here; the affine test below recovers it exactly).
        assert np.allclose(saved["pc"], summary["pc"])
        assert saved["refined_quats"].shape == (12, 4)

    def test_affine_scan_fit_recovers_model(self, scan, monkeypatch, capsys):
        td, ppath, qpath, pc0, g = scan
        out = str(td / "affine.npz")
        stdout = _run(
            ["calibrate", "--patterns", str(ppath),
             "--orientations", str(qpath), "--out", out,
             "--scan-grid", "3", "4", "--step", "1.0",
             "--max-hkl", "2", "--min-d", "1.0", "--pin",
             "--steps", "300"],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["model"] == "affine"
        saved = np.load(out)
        np.testing.assert_allclose(saved["pc0"], pc0, atol=1e-4)
        np.testing.assert_allclose(saved["gradient"], g, atol=1e-4)
        assert summary["mean_ncc"] > 0.999

    def test_euler_npy_and_ang_orientations(self, scan, monkeypatch, capsys):
        """Euler .npy input parses; grid mismatch is rejected."""
        import jax.numpy as jnp

        from latice_tpu.crystal import to_euler_zxz_deg

        td, ppath, qpath, pc0, g = scan
        tq = np.load(qpath)
        epath = td / "e.npy"
        np.save(epath, np.asarray(to_euler_zxz_deg(jnp.asarray(tq))))
        out = str(td / "fromeuler.npz")
        stdout = _run(
            ["calibrate", "--patterns", str(ppath),
             "--orientations", str(epath), "--out", out,
             "--max-hkl", "2", "--min-d", "1.0", "--pin",
             "--steps", "30"],
            monkeypatch, capsys,
        )
        assert json.loads(stdout.strip().splitlines()[-1])["n_used"] == 12
        with pytest.raises(SystemExit, match="does not hold"):
            _run(
                ["calibrate", "--patterns", str(ppath),
                 "--orientations", str(qpath), "--out", out,
                 "--scan-grid", "5", "5", "--steps", "10",
                 "--max-hkl", "2", "--min-d", "1.0"],
                monkeypatch, capsys,
            )


class TestStrainCli:
    """index.py strain — HR-EBSD cross-correlation strain mapping."""

    @staticmethod
    def _deformed_stack(tmp_path):
        from tests.test_hrebsd import GEOM, _band_function, _make_a, _render

        f = _band_function(31)
        ref = _render(f, GEOM)
        a1 = _make_a(3e-3, -2e-3, 1e-3, (1e-3, 0.0, -1e-3))
        a2 = _make_a(0.0, 0.0, 0.0, (0.0, 2e-3, 0.0))
        pats = np.stack([ref, _render(f, GEOM, a1), _render(f, GEOM, a2)])
        p = tmp_path / "grain.npy"
        np.save(p, pats.astype(np.float32))
        return p, a1, a2

    def test_strain_map_with_stiffness(self, tmp_path, monkeypatch, capsys):
        p, a1, a2 = self._deformed_stack(tmp_path)
        out = str(tmp_path / "strain.npz")
        png = str(tmp_path / "vm.png")
        stdout = _run(
            ["strain", "--patterns", str(p), "--ref", "0", "--out", out,
             "--upsample", "50", "--stiffness", "ni",
             "--scan-grid", "1", "3", "--map", png, "--batch-size", "4"],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["n_patterns"] == 3
        assert summary["first_order_valid"] is True
        assert summary["map"] == png
        assert Path(png).exists()
        data = np.load(out)
        assert data["stress"].shape == (3, 3, 3)
        # Row 0 is the reference itself: zero deformation to the floor.
        assert np.abs(data["a"][0]).max() < 1e-4
        # Rotation parts are gauge-free: recovered exactly.
        rot = data["rotation"]
        assert np.allclose(rot[1], [1e-3, 0.0, -1e-3], atol=1e-4)
        assert np.allclose(rot[2], [0.0, 2e-3, 0.0], atol=1e-4)
        # Traction-free closure: sigma_33 ~ 0 on every pixel.
        assert np.abs(data["stress"][:, 2, 2]).max() < 1e-3 * max(
            np.abs(data["stress"]).max(), 1e-9
        )
        # Deviatoric strain of row 1 matches the injected tensor.
        eps1 = 0.5 * (a1 + a1.T)
        dev = lambda e: e - np.trace(e) / 3 * np.eye(3)
        assert np.abs(dev(data["strain"][1]) - dev(eps1)).max() < 3e-4

    def test_strain_errors(self, tmp_path, monkeypatch, capsys):
        p, _, _ = self._deformed_stack(tmp_path)
        with pytest.raises(SystemExit, match="out of range"):
            _run(["strain", "--patterns", str(p), "--ref", "9"],
                 monkeypatch, capsys)
        with pytest.raises(SystemExit, match="--stiffness"):
            _run(["strain", "--patterns", str(p), "--stiffness", "zz"],
                 monkeypatch, capsys)
        with pytest.raises(SystemExit, match="needs --scan-grid"):
            _run(["strain", "--patterns", str(p),
                  "--map", str(tmp_path / "m.png")],
                 monkeypatch, capsys)


class TestLearnMasterCli:
    """index.py learn-master — master estimation from indexed patterns
    (sim.master_from_patterns), closing the loop simulate → learn-master
    → re-render."""

    def test_learned_master_rerenders_the_inputs(
        self, tmp_path, monkeypatch, capsys
    ):
        from latice_tpu.data import parse_angle_file
        from latice_tpu.sim import DetectorGeometry, render_from_master

        ang = str(tmp_path / "a.txt")
        _run(["sample", "--group", "432", "--resolution", "24",
              "--out", ang], monkeypatch, capsys)
        pat = str(tmp_path / "p.npy")
        _run(["simulate", "--angles", ang, "--out", pat,
              "--structure", "fcc", "--max-hkl", "2", "--min-d", "1.0",
              "--size", "64"],
             monkeypatch, capsys)
        out = str(tmp_path / "m.npy")
        stdout = _run(
            ["learn-master", "--patterns", pat, "--angles", ang,
             "--out", out, "--size", "129", "--group", "432"],
            monkeypatch, capsys,
        )
        summary = json.loads(stdout.strip().splitlines()[-1])
        assert summary["coverage"] > 0.7
        master = np.load(out)
        assert master.shape == (129, 129)
        # Round trip: rendering the learned master at the sampled
        # orientations must correlate strongly with the input patterns.
        eulers = parse_angle_file(ang)
        pats = np.load(pat).astype(np.float32)
        geom = DetectorGeometry(shape=(64, 64))
        rr = render_from_master(master, eulers, geom).reshape(len(pats), -1)
        xx = pats.reshape(len(pats), -1)
        rr = rr - rr.mean(axis=1, keepdims=True)
        xx = xx - xx.mean(axis=1, keepdims=True)
        ncc = (rr * xx).sum(axis=1) / np.sqrt(
            (rr * rr).sum(axis=1) * (xx * xx).sum(axis=1) + 1e-30
        )
        assert np.median(ncc) > 0.85, np.median(ncc)
