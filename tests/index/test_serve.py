"""HTTP serving plane: warmed pipeline behind stdlib endpoints."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.index import LatentVectorDatabaseConfig, TpuLatentVectorDatabase
from latice_tpu.models import VariationalAutoEncoderRawData
from latice_tpu.serve import IndexService, make_server


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _post(url: str, body: bytes):
    return json.load(urllib.request.urlopen(url, data=body, timeout=30))


def _post_error(url: str, body: bytes):
    """POST expecting an HTTP error; returns (status, parsed body)."""
    try:
        _post(url, body)
    except urllib.error.HTTPError as e:
        return e.code, json.load(e)
    raise AssertionError("expected an HTTP error")


@pytest.fixture(scope="module")
def served():
    """A live server over a 24-entry dictionary encoded by a tiny VAE."""
    rng = np.random.default_rng(0)
    base = rng.uniform(size=(1, 128, 128)).astype(np.float32)
    patterns = (base + rng.normal(size=(24, 128, 128)) * 0.02).astype(np.float32)
    # Canonical scipy zxz ranges so the consensus mean reproduces the stored
    # angles verbatim when only the self-candidate survives the threshold.
    orientations = rng.uniform([10, 20, 10], [170, 140, 170], size=(24, 3))

    model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
    params = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 128, 128, 1)), jax.random.key(1)
    )["params"]
    enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode")[0])
    latents = np.asarray(enc(params, patterns[..., None]))

    db = TpuLatentVectorDatabase(
        LatentVectorDatabaseConfig(npz_path="/tmp/serve_test.npz", dimension=8)
    )
    db.add_vectors(latents, orientations, phases=np.repeat([0, 1], 12))
    service = IndexService(
        model, params, db, top_n=5, orientation_threshold=3.0,
        min_required_matches=1, batch_size=16,
    )
    service.warmup()
    server = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, patterns, orientations, params, model, service
    server.shutdown()
    db.delete_persistence()


class TestServe:
    def test_healthz(self, served):
        url, *_ = served
        h = json.load(urllib.request.urlopen(f"{url}/healthz", timeout=30))
        assert h["status"] == "ok"
        assert h["count"] == 24
        assert h["multiphase"] is True
        assert h["batch_size"] == 16

    def test_index_roundtrip(self, served):
        url, patterns, orientations, *_ = served
        out = _post(f"{url}/index", _npy_bytes(patterns[:6]))
        assert out["n"] == 6
        assert len(out["orientations"]) == 6
        assert all(out["success"])
        assert out["phase"] == [0] * 6
        # Top candidate of a dictionary pattern is itself.
        np.testing.assert_allclose(
            np.asarray(out["orientations"])[0], orientations[0], atol=1e-3
        )

    def test_index_uint8_path(self, served):
        url, patterns, *_ = served
        q = (np.clip(patterns[:3], 0, 1) * 255).astype(np.uint8)
        out = _post(f"{url}/index", _npy_bytes(q))
        assert out["n"] == 3 and all(out["success"])

    def test_index_larger_than_batch(self, served):
        url, patterns, *_ = served
        out = _post(f"{url}/index", _npy_bytes(patterns))  # 24 > batch 16
        assert out["n"] == 24 and len(out["success"]) == 24

    def test_encode_matches_model(self, served):
        url, patterns, _, params, model, _ = served
        out = _post(f"{url}/encode", _npy_bytes(patterns[:4]))
        lat = np.asarray(out["latents"], dtype=np.float32)
        expected = np.asarray(
            model.apply({"params": params}, patterns[:4, ..., None], method="encode")[0]
        )
        np.testing.assert_allclose(lat, expected, atol=2e-5)

    def test_encode_uint8_matches_scaled_float(self, served):
        """uint8 stacks go to the device as uint8; /255 happens on-chip."""
        url, patterns, _, params, model, _ = served
        q = (np.clip(patterns[:3], 0, 1) * 255).astype(np.uint8)
        out = _post(f"{url}/encode", _npy_bytes(q))
        lat = np.asarray(out["latents"], dtype=np.float32)
        expected = np.asarray(
            model.apply(
                {"params": params},
                q[..., None].astype(np.float32) / 255.0,
                method="encode",
            )[0]
        )
        np.testing.assert_allclose(lat, expected, atol=2e-5)

    def test_index_failure_rows_are_strict_json(self, served):
        """Consensus failures must serialize as null, never bare NaN tokens
        (RFC 8259 — reference faiss_db.py:345-351 returns NaN means)."""
        url, patterns, orientations, params, model, service = served
        from latice_tpu.serve import IndexService, make_server

        # min_required_matches > top_n guarantees every pattern fails.
        failing = IndexService(
            model, params, service._db, top_n=3, orientation_threshold=3.0,
            min_required_matches=5, batch_size=8,
        )
        server = make_server(failing, "127.0.0.1", 0)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        furl = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            raw = urllib.request.urlopen(
                f"{furl}/index", data=_npy_bytes(patterns[:4]), timeout=120
            ).read()

            def reject(token):  # NaN/Infinity tokens in the body fail here
                raise AssertionError(f"non-strict JSON token {token!r}")

            out = json.loads(raw, parse_constant=reject)
            assert out["success"] == [False] * 4
            assert out["mean_orientations"] == [[None] * 3] * 4
        finally:
            server.shutdown()

    def test_oversized_body_is_413(self, served):
        url, patterns, *_ = served
        service = served[5]
        limit, service.max_body_bytes = service.max_body_bytes, 1024
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(f"{url}/index", _npy_bytes(patterns[:1]))  # ~64KB
            assert e.value.code == 413
            assert "413" in str(e.value.code) or "exceeds" in e.value.read().decode()
        finally:
            service.max_body_bytes = limit
        # Back under the limit, requests flow again.
        out = _post(f"{url}/index", _npy_bytes(patterns[:1]))
        assert out["n"] == 1

    def test_bad_body_is_400(self, served):
        url, *_ = served
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{url}/index", b"this is not an npy file")
        assert e.value.code == 400

    def test_bad_shape_is_400(self, served):
        url, *_ = served
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{url}/index", _npy_bytes(np.zeros((2, 2, 2, 2, 2), np.float32)))
        assert e.value.code == 400

    def test_unknown_path_is_404(self, served):
        url, *_ = served
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{url}/nope", _npy_bytes(np.zeros((1, 128, 128), np.float32)))
        assert e.value.code == 404

    def test_health_counters_advance(self, served):
        url, patterns, *_ = served
        before = json.load(urllib.request.urlopen(f"{url}/healthz", timeout=30))
        _post(f"{url}/index", _npy_bytes(patterns[:2]))
        after = json.load(urllib.request.urlopen(f"{url}/healthz", timeout=30))
        assert after["requests"] == before["requests"] + 1
        assert after["patterns_indexed"] == before["patterns_indexed"] + 2


class TestFusedEngineServe:
    def test_fused_engine_service_matches_exact(self, served):
        """engine="fused" (Pallas matmul+top-k) behind the HTTP plane gives
        identical indexing results to the exact service — it is exact."""
        url, patterns, orientations, params, model, _ = served

        enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode")[0])
        latents = np.asarray(enc(params, patterns[..., None]))
        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path="/tmp/serve_fused.npz", dimension=8)
        )
        db.add_vectors(latents, orientations, phases=np.repeat([0, 1], 12))
        service = IndexService(
            model, params, db, top_n=5, orientation_threshold=3.0,
            min_required_matches=1, batch_size=16, engine="fused",
        )
        server = make_server(service, "127.0.0.1", 0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        furl = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            fused = _post(f"{furl}/index", _npy_bytes(patterns[:8]))
            plain = _post(f"{url}/index", _npy_bytes(patterns[:8]))
            np.testing.assert_allclose(
                fused["orientations"], plain["orientations"], atol=1e-4
            )
            assert fused["success"] == plain["success"]
            assert fused["phase"] == plain["phase"]
        finally:
            server.shutdown()
            db.delete_persistence()


class TestPreprocessServe:
    def test_preprocess_applies_to_index_and_encode(self, served):
        """A service with preprocess= corrects both planes consistently:
        /encode latents equal the model applied to manually-preprocessed
        patterns, and /index still self-matches the dictionary (which was
        encoded from preprocessed patterns)."""
        url, patterns, orientations, params, model, _ = served
        from latice_tpu.data import PreprocessConfig, make_preprocess_fn

        cfg = PreprocessConfig(normalize="minmax")
        fn = jax.jit(make_preprocess_fn(cfg))
        pre = np.asarray(fn(jnp.asarray(patterns[..., None])))

        enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode")[0])
        latents = np.asarray(enc(params, pre))
        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path="/tmp/serve_pre.npz", dimension=8)
        )
        db.add_vectors(latents, orientations)
        service = IndexService(
            model, params, db, top_n=5, orientation_threshold=3.0,
            min_required_matches=1, batch_size=16, preprocess=cfg,
        )
        server = make_server(service, "127.0.0.1", 0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        purl = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            out = _post(f"{purl}/encode", _npy_bytes(patterns[:4]))
            np.testing.assert_allclose(
                np.asarray(out["latents"], np.float32), latents[:4], atol=2e-5
            )
            idx = _post(f"{purl}/index", _npy_bytes(patterns[:6]))
            assert all(idx["success"])
            np.testing.assert_allclose(
                np.asarray(idx["orientations"])[0], orientations[0], atol=1e-3
            )
        finally:
            server.shutdown()
            db.delete_persistence()


class TestNlparServe:
    def test_4d_scan_body_is_denoised_then_indexed(self, served):
        """--nlpar service: a (R, C, H, W) body indexes like manually
        NLPAR-denoised patterns through the plain service; 3-D bodies are
        untouched."""
        url, patterns, orientations, params, model, service = served
        from latice_tpu.data import nlpar_denoise

        db = service._db
        nl = IndexService(
            model, params, db, top_n=5, orientation_threshold=3.0,
            min_required_matches=1, batch_size=16, nlpar_h=2.0,
        )
        server = make_server(nl, "127.0.0.1", 0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        nurl = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            scan = patterns[:6].reshape(2, 3, 128, 128)
            out = _post(f"{nurl}/index", _npy_bytes(scan))
            assert out["n"] == 6
            assert out["scan_grid"] == [2, 3]
            manual = nlpar_denoise(scan, h=2.0).reshape(6, 128, 128)
            ref = _post(f"{url}/index", _npy_bytes(manual))
            np.testing.assert_allclose(
                out["orientations"], ref["orientations"], atol=1e-4
            )
            flat = _post(f"{nurl}/index", _npy_bytes(patterns[:3]))
            plain = _post(f"{url}/index", _npy_bytes(patterns[:3]))
            assert "scan_grid" not in flat
            np.testing.assert_allclose(
                flat["orientations"], plain["orientations"], atol=1e-4
            )
            # uint8 scans must land in model units (/255): same result as
            # the float [0, 1] scan body.
            u8 = (np.clip(scan, 0, 1) * 255).astype(np.uint8)
            a = _post(f"{nurl}/index", _npy_bytes(u8))
            b = _post(f"{nurl}/index", _npy_bytes(u8.astype(np.float32) / 255.0))
            np.testing.assert_allclose(
                a["orientations"], b["orientations"], atol=1e-3
            )
            # Size mismatches and nlpar-less servers diagnose explicitly.
            bad = np.zeros((2, 2, 64, 64), np.float32)
            err = _post_error(f"{nurl}/index", _npy_bytes(bad))
            assert err[0] == 400 and "64x64" in err[1]["error"]
            err = _post_error(f"{url}/index", _npy_bytes(scan))
            assert err[0] == 400 and "--nlpar" in err[1]["error"]
        finally:
            server.shutdown()


class TestShardedServe:
    def test_mesh_sharded_service_matches_unsharded(self, served):
        """Same dictionary behind an 8-device sharded pipeline returns the
        same results as the single-device service."""
        url, patterns, orientations, params, model, _ = served
        import jax

        from latice_tpu.index import (
            LatentVectorDatabaseConfig,
            TpuLatentVectorDatabase,
        )
        from latice_tpu.parallel import make_mesh

        enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode")[0])
        latents = np.asarray(enc(params, patterns[..., None]))
        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path="/tmp/serve_mesh.npz", dimension=8)
        )
        db.add_vectors(latents, orientations, phases=np.repeat([0, 1], 12))
        service = IndexService(
            model, params, db, top_n=5, orientation_threshold=3.0,
            min_required_matches=1, batch_size=16, mesh=make_mesh(8),
        )
        server = make_server(service, "127.0.0.1", 0)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        murl = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            h = json.load(urllib.request.urlopen(f"{murl}/healthz", timeout=30))
            assert h["mesh_devices"] == 8
            sharded = _post(f"{murl}/index", _npy_bytes(patterns[:8]))
            plain = _post(f"{url}/index", _npy_bytes(patterns[:8]))
            np.testing.assert_allclose(
                sharded["orientations"], plain["orientations"], atol=1e-4
            )
            assert sharded["success"] == plain["success"]
            assert sharded["phase"] == plain["phase"]
            # /encode also runs batch-sharded on the mesh; latents match
            # the unsharded service to float roundoff.
            enc_s = _post(f"{murl}/encode", _npy_bytes(patterns[:8]))
            enc_p = _post(f"{url}/encode", _npy_bytes(patterns[:8]))
            np.testing.assert_allclose(
                enc_s["latents"], enc_p["latents"], atol=1e-5
            )
        finally:
            server.shutdown()
            db.delete_persistence()


class TestServeCLI:
    def test_cli_builds_service_and_reports(self, tmp_path, monkeypatch, capsys):
        """serve.py main(): arg parsing -> db load -> warmup -> ready line."""
        import sys
        from http.server import ThreadingHTTPServer
        from pathlib import Path

        rng = np.random.default_rng(4)
        latents = rng.normal(size=(10, 8)).astype(np.float32)
        orients = rng.uniform([10, 20, 10], [170, 140, 170], size=(10, 3))
        db_path = tmp_path / "cli_db.npz"
        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path=str(db_path), dimension=8)
        )
        db.add_vectors(latents, orients)
        db.save()

        repo = Path(__file__).resolve().parents[2]
        sys.path.insert(0, str(repo))
        import importlib

        serve_cli = importlib.import_module("serve")
        monkeypatch.setattr(
            ThreadingHTTPServer, "serve_forever", lambda self, *a, **k: None
        )
        monkeypatch.setattr(
            sys, "argv",
            ["serve.py", "--db", str(db_path), "--inplanes", "2",
             "--latent-dim", "8", "--batch-size", "8", "--port", "0"],
        )
        serve_cli.main()
        ready = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert ready["status"] == "serving" and ready["count"] == 10
        assert ready["warmup_s"] >= 0

    def test_cli_rejects_empty_db(self, tmp_path, monkeypatch):
        import sys
        from pathlib import Path

        db_path = tmp_path / "empty.npz"
        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path=str(db_path), dimension=8)
        )
        db.save()
        repo = Path(__file__).resolve().parents[2]
        sys.path.insert(0, str(repo))
        import importlib

        serve_cli = importlib.import_module("serve")
        monkeypatch.setattr(
            sys, "argv", ["serve.py", "--db", str(db_path), "--latent-dim", "8"]
        )
        with pytest.raises(SystemExit, match="empty"):
            serve_cli.main()


class TestConcurrency:
    def test_parallel_requests_all_succeed(self, served):
        """8 threads hammering /index and /encode: every reply correct."""
        url, patterns, *_ = served
        errors = []

        def hit(i):
            try:
                if i % 2:
                    out = _post(f"{url}/index", _npy_bytes(patterns[i : i + 3]))
                    assert out["n"] == 3 and all(out["success"])
                else:
                    out = _post(f"{url}/encode", _npy_bytes(patterns[i : i + 2]))
                    assert len(out["latents"]) == 2
            except Exception as e:  # surface in main thread
                errors.append(e)

        threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors


class TestHotReload:
    def test_reload_swaps_model(self, tmp_path):
        """POST /reload: new params serve subsequent requests; version bumps."""
        rng = np.random.default_rng(7)
        patterns = rng.uniform(size=(8, 128, 128)).astype(np.float32)
        orientations = rng.uniform([10, 20, 10], [170, 140, 170], size=(8, 3))
        model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)

        def loader(seed_str):
            return model.init(
                {"params": jax.random.key(int(seed_str))},
                jnp.zeros((1, 128, 128, 1)),
                jax.random.key(99),
            )["params"]

        params = loader("0")
        enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode")[0])
        latents = np.asarray(enc(params, patterns[..., None]))
        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path=str(tmp_path / "r.npz"), dimension=8)
        )
        db.add_vectors(latents, orientations)
        service = IndexService(
            model, params, db, top_n=4, orientation_threshold=3.0,
            min_required_matches=1, batch_size=8, param_loader=loader,
        )
        server = make_server(service, "127.0.0.1", 0)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            before = _post(f"{url}/encode", _npy_bytes(patterns[:2]))
            req = json.dumps({"checkpoint": "5"}).encode()
            out = json.load(
                urllib.request.urlopen(f"{url}/reload", data=req, timeout=120)
            )
            assert out["status"] == "reloaded" and out["model_version"] == 1
            h = json.load(urllib.request.urlopen(f"{url}/healthz", timeout=30))
            assert h["model_version"] == 1
            after = _post(f"{url}/encode", _npy_bytes(patterns[:2]))
            # Different weights -> different latents.
            assert not np.allclose(before["latents"], after["latents"])
            # Index plane still serves (now through the new pipeline).
            idx = _post(f"{url}/index", _npy_bytes(patterns[:2]))
            assert idx["n"] == 2
        finally:
            server.shutdown()

    def test_reload_outside_checkpoint_root_is_400(self, served, tmp_path):
        """With checkpoint_root set, /reload refuses paths escaping it and
        resolves relative names under it."""
        url, patterns, orientations, params, model, service = served
        from latice_tpu.serve import IndexService, make_server

        seen = []

        def loader(path):
            seen.append(path)
            return params

        root = tmp_path / "ckpts"
        (root / "best").mkdir(parents=True)
        restricted = IndexService(
            model, params, service._db, top_n=3, min_required_matches=1,
            batch_size=8, param_loader=loader, checkpoint_root=str(root),
        )
        server = make_server(restricted, "127.0.0.1", 0)
        threading.Thread(target=server.serve_forever, daemon=True).start()
        rurl = f"http://127.0.0.1:{server.server_address[1]}"
        try:
            for bad in ("../escape", "/etc/passwd", "a/../../b"):
                req = json.dumps({"checkpoint": bad}).encode()
                with pytest.raises(urllib.error.HTTPError) as e:
                    urllib.request.urlopen(f"{rurl}/reload", data=req, timeout=30)
                assert e.value.code == 400
                assert "outside" in e.value.read().decode()
            assert seen == []  # loader never ran for refused paths
            req = json.dumps({"checkpoint": "best"}).encode()
            out = json.load(
                urllib.request.urlopen(f"{rurl}/reload", data=req, timeout=300)
            )
            assert out["status"] == "reloaded"
            assert seen == [str(root / "best")]
        finally:
            server.shutdown()

    def test_reload_without_loader_is_400(self, served):
        url, *_ = served
        req = json.dumps({"checkpoint": "x"}).encode()
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{url}/reload", data=req, timeout=30)
        assert e.value.code == 400

    def test_reload_bad_body_is_400(self, served):
        url, *_ = served
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{url}/reload", data=b"{}", timeout=30)
        assert e.value.code == 400


@pytest.fixture(scope="module")
def served_di():
    """A live pattern-DI server (no encoder, no db) over 24 patterns."""
    rng = np.random.default_rng(5)
    base = rng.uniform(size=(1, 64, 64)).astype(np.float32)
    patterns = (base + rng.normal(size=(24, 64, 64)) * 0.02).astype(np.float32)
    orientations = rng.uniform([10, 20, 10], [170, 140, 170], size=(24, 3))
    service = IndexService(
        None, None, None,
        di_dictionary=(patterns, orientations),
        top_n=5, orientation_threshold=3.0, min_required_matches=1,
        batch_size=16, image_size=(64, 64),
    )
    service.warmup()
    server = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, patterns, orientations
    server.shutdown()


class TestPatternDIServe:
    def test_health_reports_di_mode(self, served_di):
        url, *_ = served_di
        h = json.load(urllib.request.urlopen(f"{url}/healthz", timeout=30))
        assert h["mode"] == "pattern-di"
        assert h["count"] == 24
        assert h["dimension"] == 64 * 64

    def test_index_works_without_encoder(self, served_di):
        url, patterns, orientations = served_di
        out = _post(f"{url}/index", _npy_bytes(patterns[:6]))
        assert out["n"] == 6 and all(out["success"])
        np.testing.assert_allclose(
            np.asarray(out["orientations"])[0], orientations[0], atol=1e-3
        )

    def test_encode_is_400(self, served_di):
        url, patterns, _ = served_di
        code, body = _post_error(f"{url}/encode", _npy_bytes(patterns[:2]))
        assert code == 400
        assert "pattern-DI" in body["error"]

    def test_reload_is_400(self, served_di):
        url, *_ = served_di
        code, _ = _post_error(
            f"{url}/reload", json.dumps({"checkpoint": "x"}).encode()
        )
        assert code == 400

    def test_quality_endpoint(self, served_di):
        url, patterns, _ = served_di
        out = _post(f"{url}/quality", _npy_bytes(patterns[:4]))
        assert out["n"] == 4
        assert len(out["iq"]) == 4 and len(out["band_count"]) == 4
        assert all(np.isfinite(out["iq"]))


class TestQualityOnLatentServe:
    def test_quality_endpoint_latent_mode(self, served):
        url, patterns, *_ = served
        out = _post(f"{url}/quality", _npy_bytes(patterns[:3]))
        assert out["n"] == 3 and len(out["iq"]) == 3


@pytest.fixture(scope="module")
def served_zero_training():
    """A live server running ONLY the zero-training planes — no
    checkpoint, no dictionary (VERDICT r4 #6: the planes a service can
    expose most cheaply). Hough + sphere + strain on a 64² geometry."""
    from latice_tpu.hrebsd import default_roi_centers
    from latice_tpu.index import HoughIndexer, SphericalIndexer, SphericalIndexerConfig
    from latice_tpu.sim import (
        DetectorGeometry,
        cubic_reflectors,
        make_kinematical_master,
        simulate_patterns,
    )

    from latice_tpu.data import BandDetector

    rng = np.random.default_rng(7)
    geom = DetectorGeometry(shape=(64, 64))
    eulers = rng.uniform([15, 30, 15], [165, 130, 165], size=(6, 3))
    reflectors = cubic_reflectors("fcc", a=3.52, kv=20.0)
    master = make_kinematical_master(size=257, reflectors=reflectors)
    # Direct kinematical renders: sharp bands for Hough, and the master is
    # built from the same band model so /sphere correlates them too.
    patterns = simulate_patterns(
        eulers, geom, reflectors, chunk=8, angles_in_degrees=True
    ).astype(np.float32)

    strain_ref = rng.uniform(size=(64, 64)).astype(np.float32)
    service = IndexService(
        None, None, None,
        image_size=(64, 64),
        hough_indexer=HoughIndexer(
            reflectors, geom, batch_size=8,
            grid_resolution_deg=4.0, tolerance_deg=4.0,
            detector=BandDetector(
                height=64, width=64, n_theta=90, n_rho=64, k=8,
                band_width_px=5.0, batch_size=8,
            ),
        ),
        sphere_indexer=SphericalIndexer(
            master, geom, SphericalIndexerConfig(bandwidth=16, chunk=8),
        ),
        strain_config=dict(
            reference=strain_ref,
            geometry=geom,
            centers=default_roi_centers(geom, roi_size=32),
            roi_size=32,
            upsample=10,
            chunk=8,
        ),
    )
    service.warmup()
    server = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url, patterns, eulers, strain_ref
    server.shutdown()


class TestZeroTrainingServe:
    def test_health_reports_planes(self, served_zero_training):
        url, *_ = served_zero_training
        h = json.load(urllib.request.urlopen(f"{url}/healthz", timeout=30))
        assert h["mode"] == "zero-training"
        assert h["count"] == 0
        assert set(h["planes"]) == {"hough", "sphere", "strain"}

    def test_index_and_encode_are_400(self, served_zero_training):
        url, patterns, *_ = served_zero_training
        code, body = _post_error(f"{url}/index", _npy_bytes(patterns[:2]))
        assert code == 400 and "zero-training" in body["error"]
        code, _ = _post_error(f"{url}/encode", _npy_bytes(patterns[:2]))
        assert code == 400

    def test_hough_endpoint_recovers_orientations(self, served_zero_training):
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.crystal.symmetry import (
            ROTATION_GROUPS,
            symmetry_reduced_misorientation,
        )

        url, patterns, eulers, _ = served_zero_training
        out = _post(f"{url}/hough", _npy_bytes(patterns))
        assert out["n"] == len(patterns)
        assert len(out["orientations"]) == len(patterns)
        assert len(out["iq"]) == len(patterns)
        got = np.asarray(out["orientations"])[np.asarray(out["success"])]
        want = eulers[np.asarray(out["success"])]
        assert len(got) >= 4  # clean rendered patterns: most must index
        sym = jnp.asarray(np.asarray(ROTATION_GROUPS["432"], np.float32))
        err = np.degrees(np.asarray(symmetry_reduced_misorientation(
            jnp.asarray(np.roll(
                R.from_euler("zxz", want, degrees=True).as_quat(), 1, axis=1
            ), jnp.float32),
            jnp.asarray(np.roll(
                R.from_euler("zxz", got, degrees=True).as_quat(), 1, axis=1
            ), jnp.float32),
            sym,
        )))
        assert np.median(err) < 2.0, err

    def test_sphere_endpoint_recovers_orientations(self, served_zero_training):
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.crystal.symmetry import (
            ROTATION_GROUPS,
            symmetry_reduced_misorientation,
        )

        url, patterns, eulers, _ = served_zero_training
        out = _post(f"{url}/sphere", _npy_bytes(patterns))
        assert out["n"] == len(patterns)
        assert all(np.isfinite(out["scores"]))
        sym = jnp.asarray(np.asarray(ROTATION_GROUPS["432"], np.float32))
        err = np.degrees(np.asarray(symmetry_reduced_misorientation(
            jnp.asarray(np.roll(
                R.from_euler("zxz", eulers, degrees=True).as_quat(), 1, axis=1
            ), jnp.float32),
            jnp.asarray(np.roll(
                R.from_euler(
                    "zxz", np.asarray(out["orientations"]), degrees=True
                ).as_quat(), 1, axis=1
            ), jnp.float32),
            sym,
        )))
        # L=16 grid is ~11°; Newton refinement must land well below it.
        assert np.median(err) < 4.0, err

    def test_sphere_ambiguity_query_param(self, served_zero_training):
        """`POST /sphere?ambiguity=1` adds the secondary-peak diagnostic
        fields (strict JSON: NaNs serialize as null)."""
        url, patterns, _, _ = served_zero_training
        out = _post(f"{url}/sphere?ambiguity=1", _npy_bytes(patterns))
        assert out["n"] == len(patterns)
        for key in (
            "ambiguity_angle_deg", "ambiguity_gap", "ambiguity_has_rival"
        ):
            assert len(out[key]) == len(patterns)
        for has, ang, gap in zip(
            out["ambiguity_has_rival"],
            out["ambiguity_angle_deg"],
            out["ambiguity_gap"],
        ):
            if has:
                assert ang is not None and gap is not None and gap >= 0
            else:
                assert ang is None and gap is None
        # Without the flag the fields stay absent (contract unchanged).
        plain = _post(f"{url}/sphere", _npy_bytes(patterns))
        assert "ambiguity_gap" not in plain

    def test_query_strings_tolerated_on_every_endpoint(
        self, served_zero_training
    ):
        """The r5 route parser splits query strings for every path —
        unknown params must be ignored, not 404/500."""
        url, patterns, _, _ = served_zero_training
        out = _post(f"{url}/hough?unknown=1&x=y", _npy_bytes(patterns))
        assert out["n"] == len(patterns)
        out = _post(f"{url}/sphere?ambiguity=0", _npy_bytes(patterns))
        assert "ambiguity_gap" not in out

    def test_strain_endpoint(self, served_zero_training):
        url, _, _, strain_ref = served_zero_training
        # Identical patterns → ~zero strain; a strict-JSON sanity check.
        body = np.stack([strain_ref, strain_ref])
        out = _post(f"{url}/strain", _npy_bytes(body))
        assert out["n"] == 2
        a = np.asarray(out["strain"])
        assert a.shape == (2, 3, 3)
        assert np.abs(a).max() < 1e-4
        assert np.asarray(out["von_mises"]).shape == (2,)
        assert all(np.isfinite(out["residual_px"]))

    def test_strain_shape_mismatch_is_400(self, served_zero_training):
        url, *_ = served_zero_training
        code, body = _post_error(
            f"{url}/strain",
            _npy_bytes(np.zeros((1, 32, 32), np.float32)),
        )
        assert code == 400
