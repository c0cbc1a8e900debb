"""Reference-format npz migration: parsing serialized FAISS IndexFlat blobs.

The reference FAISS backend persists `np.savez(faiss_index=serialize_index(...),
orientations=...)` (reference faiss_db.py:440-458). These tests synthesize
byte streams in faiss's on-disk IndexFlat layout (impl/index_write.cpp) and
pin that `parse_faiss_flat_blob` + `TpuLatentVectorDatabase.load` recover the
vectors without faiss installed.
"""

import struct

import numpy as np
import pytest

from latice_tpu.index import (
    LatentVectorDatabaseConfig,
    TpuLatentVectorDatabase,
    parse_faiss_flat_blob,
)
from latice_tpu.index.faiss_db import (
    FaissLatentVectorDatabase,
    FaissLatentVectorDatabaseConfig,
)


def make_flat_blob(
    vectors: np.ndarray,
    fourcc: bytes = b"IxFI",
    metric_type: int = 0,
    prefix_in_bytes: bool = False,
) -> np.ndarray:
    """Serialize (ntotal, d) float32 vectors the way faiss write_index does.

    fourcc, then d(i32) ntotal(i64) dummy(i64) dummy(i64) is_trained(u8)
    metric_type(i32) [metric_arg(f32) iff metric_type > 1], then the data
    vector: u64 count + raw float32s. ``prefix_in_bytes`` covers the
    byte-count convention some writers use.
    """
    ntotal, d = vectors.shape
    out = bytearray()
    out += fourcc
    out += struct.pack("<i", d)
    out += struct.pack("<q", ntotal)
    out += struct.pack("<q", 1 << 20)
    out += struct.pack("<q", 1 << 20)
    out += struct.pack("<B", 1)  # is_trained
    out += struct.pack("<i", metric_type)
    if metric_type > 1:
        out += struct.pack("<f", 2.5)  # metric_arg
    count = ntotal * d
    out += struct.pack("<Q", count * 4 if prefix_in_bytes else count)
    out += vectors.astype("<f4").tobytes()
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _unit_rows(n, d, seed=0):
    v = np.random.default_rng(seed).normal(size=(n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


class TestParseFaissFlatBlob:
    def test_roundtrip_inner_product(self):
        v = _unit_rows(37, 16)
        np.testing.assert_array_equal(parse_faiss_flat_blob(make_flat_blob(v)), v)

    def test_roundtrip_l2_fourcc(self):
        v = _unit_rows(5, 8)
        blob = make_flat_blob(v, fourcc=b"IxF2", metric_type=1)
        np.testing.assert_array_equal(parse_faiss_flat_blob(blob), v)

    def test_metric_arg_header_variant(self):
        # metric_type > 1 adds a float to the header; the tail-anchored read
        # must be immune to the extra 4 bytes.
        v = _unit_rows(11, 16)
        blob = make_flat_blob(v, fourcc=b"IxFl", metric_type=23)
        np.testing.assert_array_equal(parse_faiss_flat_blob(blob), v)

    def test_byte_count_prefix_variant(self):
        v = _unit_rows(9, 16)
        blob = make_flat_blob(v, prefix_in_bytes=True)
        np.testing.assert_array_equal(parse_faiss_flat_blob(blob), v)

    def test_rejects_non_flat_index(self):
        v = _unit_rows(4, 16)
        blob = np.array(
            list(b"IxIV" + bytes(make_flat_blob(v))[4:]), dtype=np.uint8
        )
        with pytest.raises(ValueError, match="only flat indexes"):
            parse_faiss_flat_blob(blob)

    def test_rejects_truncated_stream(self):
        blob = make_flat_blob(_unit_rows(8, 16))[:-40]
        with pytest.raises(ValueError, match="truncated|prefix"):
            parse_faiss_flat_blob(blob)

    def test_rejects_corrupt_length_prefix(self):
        blob = bytearray(bytes(make_flat_blob(_unit_rows(8, 16))))
        struct.pack_into("<Q", blob, len(blob) - 8 - 8 * 16 * 4, 999)
        with pytest.raises(ValueError, match="prefix"):
            parse_faiss_flat_blob(np.frombuffer(bytes(blob), dtype=np.uint8))


class TestReferenceNpzMigration:
    def _write_reference_npz(self, path, n=24, d=16, seed=3):
        vectors = _unit_rows(n, d, seed)
        orientations = np.random.default_rng(seed + 1).uniform(
            [0, 20, 0], [340, 140, 340], size=(n, 3)
        )
        np.savez_compressed(
            str(path), faiss_index=make_flat_blob(vectors), orientations=orientations
        )
        return vectors, orientations

    def test_core_db_loads_reference_npz(self, tmp_path):
        path = tmp_path / "ref_index.npz"
        vectors, orientations = self._write_reference_npz(path)
        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path=str(path), dimension=16)
        )
        assert db.get_count() == 24
        np.testing.assert_allclose(db._vectors, vectors, rtol=1e-6)
        np.testing.assert_array_equal(db._orientations, orientations)

        sims, idx = db.query_similar(vectors[7], n_results=3)
        assert idx[0] == 7
        assert sims[0] == pytest.approx(1.0, abs=1e-5)

    def test_faiss_compat_class_autoloads_reference_npz(self, tmp_path):
        path = tmp_path / "faiss_index.npz"
        vectors, _ = self._write_reference_npz(path, n=10, d=16, seed=9)
        db = FaissLatentVectorDatabase(
            FaissLatentVectorDatabaseConfig(npz_path=str(path))
        )
        assert db.get_count() == 10
        # Saving back produces this framework's format, which reloads too.
        db.save()
        db2 = FaissLatentVectorDatabase(
            FaissLatentVectorDatabaseConfig(npz_path=str(path))
        )
        np.testing.assert_allclose(db2._vectors, vectors, rtol=1e-6)

    def test_load_rejects_unknown_npz(self, tmp_path):
        path = tmp_path / "junk.npz"
        np.savez(str(path), something=np.zeros(3))
        with pytest.raises(KeyError, match="neither"):
            TpuLatentVectorDatabase(
                LatentVectorDatabaseConfig(npz_path=str(path), dimension=16)
            )


class TestBytesInput:
    def test_raw_bytes_blob_parses(self):
        """The natural migration call: parse the raw write_index file bytes."""
        v = _unit_rows(6, 16)
        blob_bytes = bytes(make_flat_blob(v))
        np.testing.assert_array_equal(parse_faiss_flat_blob(blob_bytes), v)
