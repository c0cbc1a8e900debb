"""First-party native runtime: build, k-NN parity, parser parity."""

import numpy as np
import pytest

from latice_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native runtime"
)

RNG = np.random.default_rng(0)


class TestNativeKNN:
    def test_matches_numpy_brute_force(self):
        d = RNG.normal(size=(1000, 16)).astype(np.float32)
        q = RNG.normal(size=(7, 16)).astype(np.float32)
        scores, idx = native.cosine_topk_native(q, d, 20)

        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        dn = d / np.linalg.norm(d, axis=1, keepdims=True)
        full = qn @ dn.T
        want_idx = np.argsort(-full, axis=1)[:, :20]
        np.testing.assert_array_equal(idx, want_idx)
        np.testing.assert_allclose(
            scores, np.take_along_axis(full, want_idx, 1), atol=1e-5
        )

    def test_matches_device_engine(self):
        """engine='native' DB gives the same answers as engine='device'."""
        from latice_tpu.index import (
            LatentVectorDatabaseConfig,
            TpuLatentVectorDatabase,
        )

        vecs = RNG.normal(size=(200, 16))
        orients = RNG.uniform(0, 360, (200, 3))
        q = vecs[17] + RNG.normal(size=16) * 0.01

        results = {}
        for engine in ("device", "native"):
            db = TpuLatentVectorDatabase(
                LatentVectorDatabaseConfig(
                    npz_path=f"/tmp/nonexistent_{engine}.npz", engine=engine
                )
            )
            db.add_vectors(vecs, orients)
            results[engine] = db.query_similar(q, n_results=10)
        np.testing.assert_array_equal(results["device"][1], results["native"][1])
        np.testing.assert_allclose(
            results["device"][0], results["native"][0], atol=1e-5
        )

    def test_k_larger_than_dict(self):
        d = RNG.normal(size=(5, 16)).astype(np.float32)
        scores, idx = native.cosine_topk_native(d[:2], d, 20)
        assert scores.shape == (2, 5)

    def test_multithreaded_consistent(self):
        d = RNG.normal(size=(500, 16)).astype(np.float32)
        q = RNG.normal(size=(64, 16)).astype(np.float32)
        s1, i1 = native.cosine_topk_native(q, d, 10, n_threads=1)
        s4, i4 = native.cosine_topk_native(q, d, 10, n_threads=4)
        np.testing.assert_array_equal(i1, i4)


class TestNativeParser:
    def test_matches_python_parser(self, tmp_path):
        n = 500
        angles = RNG.uniform(0, 360, (n, 3))
        p = tmp_path / "a.txt"
        p.write_text(
            "eu\n%d\n" % n
            + "".join(f"  {a[0]:.6f}   {a[1]:.6f} {a[2]:.6f} \n" for a in angles)
        )
        got = native.parse_angle_file_native(p)
        np.testing.assert_allclose(got, angles, atol=1e-6)

    def test_missing_file(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            native.parse_angle_file_native(tmp_path / "nope.txt")

    def test_malformed(self, tmp_path):
        p = tmp_path / "bad.txt"
        p.write_text("eu\n1\n1.0 2.0\n")
        with pytest.raises(ValueError):
            native.parse_angle_file_native(p)

    def test_dataset_path_uses_native(self, tmp_path):
        """parse_angle_file integrates the native parser transparently."""
        from latice_tpu.data import parse_angle_file

        p = tmp_path / "a.txt"
        p.write_text("eu\n2\n1 2 3\n4 5 6\n")
        np.testing.assert_allclose(parse_angle_file(p), [[1, 2, 3], [4, 5, 6]])
