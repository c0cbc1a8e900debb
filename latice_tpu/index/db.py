"""Latent-vector database with on-TPU exact search and orientation consensus.

Replaces both reference backends — FAISS `IndexFlat` cosine search
(latice/index/faiss_db.py) and the ChromaDB/hnswlib HNSW index
(latice/index/chroma_db.py) — with one engine: exact cosine k-NN as a single
device matmul + top-k, and the consensus loop vectorized over whole query
batches (see latice_tpu.index.consensus). At 16-d latents, exact search is
cheaper on TPU than any approximate structure, so there is deliberately no
HNSW equivalent.

Also restores the abstract base class the reference *imports but does not
ship* (`latice/index/latent_vector_db_base.py` is absent from the tree —
SURVEY "known defects"); the contract is inferred from the two concrete
backends.

Persistence follows the FAISS backend's single-npz design
(faiss_db.py:440-476): one compressed file holding vectors + orientations.
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray

import jax

from latice_tpu.crystal import from_euler_zxz_deg
from latice_tpu.index.consensus import consensus_orientations
from latice_tpu.index.knn import (
    cosine_topk,
    cosine_topk_approx,
    cosine_topk_int8,
    quantize_dictionary_int8,
)
from latice_tpu.index.result import OrientationResult

logger = logging.getLogger(__name__)

# One compiled program for the Euler->quaternion dictionary conversion;
# eager op-by-op dispatch is pathologically slow on tunneled TPU backends.
_euler_to_quat = jax.jit(from_euler_zxz_deg)


def _l2_normalize_np(vectors: np.ndarray) -> np.ndarray:
    """Host-side row normalization with the zero-norm guard
    (faiss_db.py:109-113). Numpy on purpose: add-time work stays off-device."""
    norms = np.linalg.norm(vectors, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return vectors / norms

def parse_faiss_flat_blob(blob: bytes | np.ndarray) -> np.ndarray:
    """Decode a serialized FAISS ``IndexFlat`` into its ``(ntotal, d)`` vectors.

    Pure-Python reader for the byte stream ``faiss.serialize_index`` emits for
    flat indexes, so `.npz` files persisted by the reference FAISS backend
    (faiss_db.py:440-458: ``faiss_index=serialize_index(...)``) load into this
    framework without installing faiss. Stream layout (faiss
    impl/index_write.cpp, stable across 1.x):

    * fourcc: ``IxFI`` (inner product), ``IxF2`` (L2) or ``IxFl`` (other);
    * header: ``d`` int32, ``ntotal`` int64, two deprecated int64 fields,
      ``is_trained`` byte, ``metric_type`` int32 (+ ``metric_arg`` float when
      metric_type > 1);
    * the stored vectors as a legacy float vector: uint64 element count
      (= ntotal*d) followed by the raw float32 data.

    The data is located from the stream *tail* rather than a running offset,
    so header-size drift between faiss versions cannot misalign the read; the
    element-count prefix is then verified (accepting both the float-count and
    byte-count conventions).
    """
    if isinstance(blob, (bytes, bytearray, memoryview)):
        raw = bytes(blob)
    else:
        raw = np.asarray(blob).astype(np.uint8, copy=False).tobytes()
    if len(raw) < 45:
        raise ValueError("serialized FAISS index too short to be an IndexFlat")
    fourcc = raw[:4]
    if fourcc not in (b"IxFI", b"IxF2", b"IxFl"):
        raise ValueError(
            f"unsupported FAISS index type {fourcc!r}: only flat indexes "
            "(IndexFlat / IndexFlatIP / IndexFlatL2) can be parsed"
        )
    d = int(np.frombuffer(raw, dtype="<i4", count=1, offset=4)[0])
    ntotal = int(np.frombuffer(raw, dtype="<i8", count=1, offset=8)[0])
    if d <= 0 or ntotal < 0:
        raise ValueError(f"implausible FAISS header: d={d}, ntotal={ntotal}")
    nbytes = ntotal * d * 4
    if len(raw) < nbytes + 8:
        raise ValueError("serialized FAISS index truncated")
    prefix = int(np.frombuffer(raw, dtype="<u8", count=1, offset=len(raw) - nbytes - 8)[0])
    if prefix not in (ntotal * d, nbytes):
        raise ValueError(
            f"FAISS data-vector length prefix {prefix} does not match "
            f"ntotal*d={ntotal * d}"
        )
    vectors = np.frombuffer(raw, dtype="<f4", count=ntotal * d, offset=len(raw) - nbytes)
    return vectors.reshape(ntotal, d).copy()


def _maybe_progress(enabled: bool):
    """Rich progress bar when requested and importable; silent no-op otherwise."""
    if enabled:
        try:
            from rich.progress import (
                BarColumn,
                Progress,
                TaskProgressColumn,
                TextColumn,
                TimeRemainingColumn,
            )

            return Progress(
                TextColumn("[bold blue]{task.description}"),
                BarColumn(),
                TaskProgressColumn(),
                TimeRemainingColumn(),
            )
        except ImportError:
            pass

    class _Null:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def add_task(self, *a, **kw):
            return 0

        def update(self, *a, **kw):
            pass

    return _Null()


__all__ = [
    "LatentVectorDatabaseBase",
    "LatentVectorDatabaseConfig",
    "TpuLatentVectorDatabase",
    "OrientationResult",
    "parse_faiss_flat_blob",
]


class LatentVectorDatabaseBase(ABC):
    """Abstract latent-vector DB contract (SURVEY §2 #9, inferred from
    chroma_db.py:87 / faiss_db.py:92)."""

    @abstractmethod
    def add_vectors(self, latent_vectors, orientations) -> None: ...

    @abstractmethod
    def create_from_files(self, latent_file_path, angles_file_path) -> None: ...

    @abstractmethod
    def query_similar(self, query_vector, n_results: int = 20): ...

    @abstractmethod
    def find_best_orientation(
        self,
        query_vector,
        top_n: int = 20,
        orientation_threshold: float = 1.0,
        min_required_matches: int = 18,
        max_iterations: int = 3,
    ) -> OrientationResult: ...

    @abstractmethod
    def find_best_orientations_batch(
        self, query_vectors, batch_size: int = 32, **kwargs
    ) -> list[OrientationResult]: ...

    @abstractmethod
    def get_count(self) -> int: ...


@dataclass
class LatentVectorDatabaseConfig:
    """Configuration for TpuLatentVectorDatabase.

    Attributes:
        npz_path: Single-file persistence target (faiss_db.py:44 pattern).
        dimension: Latent dimensionality (16 everywhere in the reference).
        angle_unit: "deg" thresholds misorientation in degrees (FAISS
            semantics, faiss_db.py:308) — the canonical choice; "rad"
            reproduces the chroma backend's radians quirk (chroma_db.py:307,
            codified by tests/index/test_chroma_db.py:352).
        device_batch_size: Max queries evaluated per device dispatch in the
            batch APIs.
        engine: "device" runs the k-NN matmul on the JAX backend (default);
            "fused" runs the Pallas matmul+top-k (exact lax.top_k parity
            with the score matrix held in VMEM — ~1.5x at 100k and 2x at
            1M entries, ops/topk_fused.py);
            "approx" selects with lax.approx_max_k (~4x faster top-k at
            1M+ entries, ~0.98 recall@10);
            "int8" quantizes the dictionary to int8 on device (4x smaller
            residency, 2x MXU rate, ~0.5% score error — for >10M-entry
            dictionaries); "native" uses the first-party C++ host engine
            (native/latice_native.cpp) — the FAISS-replacement for
            accelerator-free deployments. Consensus always runs through the
            compiled JAX path.
        phase_symmetries: Optional list of point-group names (one per phase
            id, `crystal.ROTATION_GROUPS` keys) for multi-phase dictionaries
            (BASELINE config 5); defaults to cubic "432" for every phase.
    """

    npz_path: str = "latent_index.npz"
    dimension: int = 16
    angle_unit: str = "deg"
    device_batch_size: int = 4096
    engine: str = "device"
    phase_symmetries: Any = None


class TpuLatentVectorDatabase(LatentVectorDatabaseBase):
    """Exact-search latent DB; dictionary lives on device, metadata on host.

    Host state: float32 L2-normalized vectors ``(N, D)`` and float64
    orientations ``(N, 3)`` (zxz Euler degrees). Device state (lazily built,
    invalidated on mutation): the normalized dictionary and the precomputed
    orientation quaternions — so queries skip Euler conversion entirely.
    """

    def __init__(self, config: LatentVectorDatabaseConfig | None = None) -> None:
        self.config = config if config is not None else LatentVectorDatabaseConfig()
        self.dimension = self.config.dimension
        self.npz_path = Path(self.config.npz_path)
        self._vectors = np.zeros((0, self.dimension), dtype=np.float32)
        self._orientations = np.zeros((0, 3), dtype=np.float64)
        self._phases = np.zeros((0,), dtype=np.int32)
        self._has_phases = False
        self.sim_meta: dict | None = None
        self._dev_cache: tuple[jnp.ndarray, jnp.ndarray] | None = None
        self._int8_cache: jnp.ndarray | None = None
        self._sym_tables_cache: jnp.ndarray | None = None

        if self.npz_path.with_suffix(".npz").exists():
            self.load()
        else:
            logger.info(
                f"No existing index found at {self.npz_path}. Creating a new one."
            )

    # -- mutation ----------------------------------------------------------

    def _validate_vectors(
        self, latent_vectors: np.ndarray, orientations: np.ndarray
    ) -> None:
        """Input validation matching faiss_db.py:141-159."""
        if len(latent_vectors) != len(orientations):
            raise ValueError("Number of latent vectors and orientations must match")
        if latent_vectors.shape[1] != self.dimension:
            raise ValueError(
                f"Expected latent vectors of dimension {self.dimension}, "
                f"got {latent_vectors.shape[1]}"
            )
        if orientations.shape[1] != 3:
            raise ValueError(
                f"Expected orientations of shape (n, 3), got {orientations.shape}"
            )

    def add_vectors(
        self,
        latent_vectors: NDArray[np.float64] | NDArray[np.float32],
        orientations: NDArray[np.float64],
        phases: NDArray[np.integer] | None = None,
    ) -> None:
        """Add L2-normalized vectors + orientations (faiss_db.py:161-193).

        ``phases`` optionally labels each entry with a crystal-phase id
        (multi-phase dictionaries); entries added without labels default to
        phase 0.
        """
        vecs = np.asarray(latent_vectors, dtype=np.float32)
        orients = np.asarray(orientations, dtype=np.float64)
        self._validate_vectors(vecs, orients)
        if phases is not None:
            ph = np.asarray(phases, dtype=np.int32).reshape(-1)
            if len(ph) != len(vecs):
                raise ValueError("Number of phases and latent vectors must match")
            self._has_phases = True
        else:
            ph = np.zeros(len(vecs), dtype=np.int32)
        vecs = _l2_normalize_np(vecs)
        self._vectors = np.concatenate([self._vectors, vecs], axis=0)
        self._orientations = np.concatenate([self._orientations, orients], axis=0)
        self._phases = np.concatenate([self._phases, ph], axis=0)
        self._dev_cache = None
        self._int8_cache = None
        self._sym_tables_cache = None
        logger.info(
            f"Added {len(vecs)} vectors. Index total: {self.get_count()}"
        )

    def create_from_files(
        self, latent_file_path: Path | str, angles_file_path: Path | str
    ) -> None:
        """Build from .npy latent/angle files and persist (faiss_db.py:195-214)."""
        latent_vectors = np.load(Path(latent_file_path)).astype(np.float32)
        orientations = np.load(Path(angles_file_path))
        self.add_vectors(latent_vectors, orientations)
        self.save()

    # -- device cache ------------------------------------------------------

    def _phase_args(
        self, indices_np: np.ndarray
    ) -> tuple[jnp.ndarray | None, jnp.ndarray | None]:
        """(cand_phases, sym_tables) consensus inputs for multi-phase DBs.

        The per-candidate phase gather runs host-side (indices are already on
        host) — a (B, K) gather from an (N,) device table is the slow-gather
        landmine.
        """
        if not self._has_phases:
            return None, None
        if self._sym_tables_cache is None:
            from latice_tpu.crystal import stack_symmetry_tables

            n_phases = int(self._phases.max()) + 1 if len(self._phases) else 1
            groups = self.config.phase_symmetries
            if groups is None:
                groups = ["432"] * n_phases
            if len(groups) < n_phases:
                raise ValueError(
                    f"{n_phases} phase ids but only {len(groups)} "
                    "phase_symmetries entries in the config"
                )
            self._sym_tables_cache = stack_symmetry_tables(groups)
        cand_phases = jnp.asarray(self._phases[indices_np], jnp.int32)
        return cand_phases, self._sym_tables_cache

    def _device_arrays(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        if self._dev_cache is None:
            vectors = jnp.asarray(self._vectors)
            quats = _euler_to_quat(jnp.asarray(self._orientations, dtype=jnp.float32))
            self._dev_cache = (vectors, quats)
        return self._dev_cache

    # -- queries -----------------------------------------------------------

    def query_similar(
        self,
        query_vector: NDArray[np.float64] | NDArray[np.float32],
        n_results: int = 20,
    ) -> tuple[NDArray[np.float64], NDArray[np.int64]]:
        """Top-k cosine search for one query; (similarities, indices) layout
        of faiss_db.py:216-256, including the empty/undersized-index guards."""
        scores, indices = self.query_similar_batch(
            np.atleast_2d(np.asarray(query_vector)), n_results
        )
        if scores.size == 0:
            return np.array([]), np.array([])
        return scores[0], indices[0]

    def query_similar_batch(
        self, query_vectors: np.ndarray, n_results: int = 20
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batched top-k cosine search: ``(B, k)`` scores + indices."""
        count = self.get_count()
        if count == 0:
            logger.warning("Querying an empty index.")
            return np.zeros((0, 0)), np.zeros((0, 0), dtype=np.int64)
        if count < n_results:
            logger.warning(
                f"Requested {n_results} results, but index only contains "
                f"{count} vectors. Returning all."
            )
            n_results = count

        queries = np.asarray(query_vectors, dtype=np.float32)
        if queries.shape[1] != self.dimension:
            raise ValueError(
                f"Expected query vector of dimension {self.dimension}, "
                f"got {queries.shape[1]}"
            )
        return self._topk(queries, n_results)

    def _topk(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Dispatch top-k to the configured engine."""
        if self.config.engine == "native":
            from latice_tpu.native import cosine_topk_native

            return cosine_topk_native(queries, self._vectors, k)
        if self.config.engine == "approx":
            vectors, _ = self._device_arrays()
            scores, indices = cosine_topk_approx(jnp.asarray(queries), vectors, k)
            return np.asarray(scores, dtype=np.float64), np.asarray(
                indices, dtype=np.int64
            )
        if self.config.engine == "fused":
            from latice_tpu.ops.topk_fused import cosine_topk_fused

            vectors, _ = self._device_arrays()
            scores, indices = cosine_topk_fused(jnp.asarray(queries), vectors, k)
            return np.asarray(scores, dtype=np.float64), np.asarray(
                indices, dtype=np.int64
            )
        if self.config.engine == "int8":
            if self._int8_cache is None:
                dict_q, _ = quantize_dictionary_int8(self._vectors)
                self._int8_cache = dict_q
            scores, indices = cosine_topk_int8(
                jnp.asarray(queries), self._int8_cache, k
            )
        else:
            vectors, _ = self._device_arrays()
            scores, indices = cosine_topk(jnp.asarray(queries), vectors, k)
        return np.asarray(scores, dtype=np.float64), np.asarray(
            indices, dtype=np.int64
        )

    def find_best_orientation(
        self,
        query_vector: NDArray[np.float64] | NDArray[np.float32],
        top_n: int = 20,
        orientation_threshold: float = 1.0,
        min_required_matches: int = 18,
        max_iterations: int = 3,
    ) -> OrientationResult:
        """Single-query consensus (faiss_db.py:258-372 semantics)."""
        results = self.find_best_orientations_batch(
            np.atleast_2d(np.asarray(query_vector)),
            top_n=top_n,
            orientation_threshold=orientation_threshold,
            min_required_matches=min_required_matches,
            max_iterations=max_iterations,
        )
        return results[0]

    def find_best_orientations_batch(
        self,
        query_vectors: NDArray[np.float64] | NDArray[np.float32],
        batch_size: int | None = None,
        top_n: int = 20,
        orientation_threshold: float = 1.0,
        min_required_matches: int = 18,
        max_iterations: int = 3,
        progress: bool = False,
    ) -> list[OrientationResult]:
        """Vectorized batch consensus — one fused device program per chunk.

        Replaces the reference's sequential per-vector Python loop
        (faiss_db.py:395-434); `batch_size` only caps per-dispatch memory.
        ``progress=True`` shows a rich progress bar over chunks, mirroring
        the reference's bar (chroma_db.py:393-399) at chunk granularity.
        """
        queries = np.asarray(query_vectors, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        n_queries = len(queries)

        if self.get_count() == 0:
            logger.warning("No similar vectors found for query.")
            return [self._empty_result(q) for q in queries]

        chunk = batch_size or self.config.device_batch_size
        chunk = max(chunk, 1)
        starts = range(0, n_queries, chunk)
        bar = _maybe_progress(progress)
        results: list[OrientationResult] = []
        with bar:
            task = bar.add_task("Finding orientations...", total=len(starts))
            for start in starts:
                batch = queries[start : start + chunk]
                results.extend(
                    self._consensus_chunk(
                        batch,
                        top_n,
                        orientation_threshold,
                        min_required_matches,
                        max_iterations,
                    )
                )
                bar.update(task, advance=1)
        return results

    def find_best_orientations_dense(
        self,
        query_vectors: NDArray[np.float64] | NDArray[np.float32],
        top_n: int = 20,
        orientation_threshold: float = 1.0,
        min_required_matches: int = 18,
        max_iterations: int = 3,
        batch_size: int | None = None,
    ) -> dict[str, np.ndarray]:
        """Bulk consensus returning structured arrays instead of result objects.

        The production path for map-scale indexing (SURVEY BASELINE config
        "256x256 scan (~65k patterns)"): all device work is identical to
        `find_best_orientations_batch` but the per-query Python object
        construction — the measured host bottleneck — is skipped.

        Returns:
            dict with ``mean_orientation (B,3)``, ``best_orientation (B,3)``,
            ``success (B,)``, ``n_similar (B,)``, ``indices (B,K)``,
            ``scores (B,K)``. ``mean_orientation`` rows are NaN where
            ``success`` is False.
        """
        queries = np.atleast_2d(np.asarray(query_vectors, dtype=np.float32))
        if self.get_count() == 0:
            nan3 = np.full((len(queries), 3), np.nan)
            return {
                "mean_orientation": nan3,
                "best_orientation": nan3.copy(),
                "success": np.zeros(len(queries), bool),
                "n_similar": np.zeros(len(queries), np.int64),
                "indices": np.zeros((len(queries), 0), np.int64),
                "scores": np.zeros((len(queries), 0)),
            }

        _, quats = self._device_arrays()
        k = min(top_n, self.get_count())
        chunk = max(batch_size or self.config.device_batch_size, 1)
        outs = []
        for start in range(0, len(queries), chunk):
            scores, indices = self._topk(queries[start : start + chunk], k)
            indices_np = np.asarray(indices)
            cand_phases, sym_tables = self._phase_args(indices_np)
            cand_quats = jnp.take(quats, jnp.asarray(indices), axis=0)
            cons = consensus_orientations(
                cand_quats,
                orientation_threshold,
                min_required_matches=min_required_matches,
                max_iterations=min(max_iterations, k),
                angle_unit=self.config.angle_unit,
                cand_phases=cand_phases,
                sym_tables=sym_tables,
            )
            outs.append(
                (
                    np.asarray(scores, np.float64),
                    indices_np.astype(np.int64),
                    np.asarray(cons.mean_euler, np.float64),
                    np.asarray(cons.success),
                    np.asarray(cons.similar_mask),
                    None if cons.phase is None else np.asarray(cons.phase),
                )
            )
        scores = np.concatenate([o[0] for o in outs])
        indices = np.concatenate([o[1] for o in outs])
        mean = np.concatenate([o[2] for o in outs])
        success = np.concatenate([o[3] for o in outs])
        mask = np.concatenate([o[4] for o in outs])

        top1 = self._orientations[indices[:, 0]]
        best = np.where(success[:, None], mean, top1)
        mean_out = np.where(success[:, None], mean, np.nan)
        result = {
            "mean_orientation": mean_out,
            "best_orientation": best,
            "success": success,
            "n_similar": mask.sum(axis=1).astype(np.int64),
            "indices": indices,
            "scores": scores,
        }
        if self._has_phases:
            phase = np.concatenate([o[5] for o in outs]).astype(np.int64)
            # Failure fallback mirrors `best`: the top-1 candidate's phase.
            result["phase"] = np.where(
                success, phase, self._phases[indices[:, 0]]
            ).astype(np.int64)
        return result

    def _consensus_chunk(
        self,
        queries: np.ndarray,
        top_n: int,
        orientation_threshold: float,
        min_required_matches: int,
        max_iterations: int,
    ) -> list[OrientationResult]:
        _, quats = self._device_arrays()
        k = min(top_n, self.get_count())
        scores, indices = self._topk(queries, k)
        indices_np = np.asarray(indices)
        cand_phases, sym_tables = self._phase_args(indices_np)
        cand_quats = jnp.take(quats, jnp.asarray(indices), axis=0)  # (B, K, 4)
        out = consensus_orientations(
            cand_quats,
            orientation_threshold,
            min_required_matches=min_required_matches,
            max_iterations=min(max_iterations, k),
            angle_unit=self.config.angle_unit,
            cand_phases=cand_phases,
            sym_tables=sym_tables,
        )

        scores_np = np.asarray(scores, dtype=np.float64)
        mean_np = np.asarray(out.mean_euler, dtype=np.float64)
        success_np = np.asarray(out.success)
        mask_np = np.asarray(out.similar_mask)
        phase_np = None if out.phase is None else np.asarray(out.phase)

        results = []
        for b in range(len(queries)):
            cand_orients = self._orientations[indices_np[b]]
            success = bool(success_np[b])
            mean = mean_np[b] if success else None
            # FAISS semantics: best = consensus mean on success, else the
            # closest match (faiss_db.py:336-343).
            best = mean if success else cand_orients[0]
            phase = None
            if phase_np is not None:
                # Failure fallback mirrors `best`: the top-1's phase.
                phase = int(
                    phase_np[b] if success else self._phases[indices_np[b, 0]]
                )
            results.append(
                OrientationResult(
                    query_vector=queries[b].astype(np.float64),
                    best_orientation=np.asarray(best, dtype=np.float64),
                    mean_orientation=mean,
                    candidate_orientations=cand_orients,
                    distances=scores_np[b],
                    success=success,
                    similar_indices=np.where(mask_np[b])[0],
                    phase=phase,
                )
            )
        return results

    def _empty_result(self, query: np.ndarray) -> OrientationResult:
        """Failed result for an empty index (faiss_db.py:280-291)."""
        return OrientationResult(
            query_vector=np.asarray(query).squeeze().astype(np.float64),
            best_orientation=np.array([np.nan, np.nan, np.nan]),
            candidate_orientations=np.array([]),
            distances=np.array([]),
            mean_orientation=None,
            success=False,
            similar_indices=None,
        )

    # -- bookkeeping -------------------------------------------------------

    def get_count(self) -> int:
        return len(self._vectors)

    def save(self) -> None:
        """Persist vectors + orientations to one .npz (faiss_db.py:440-458).

        Multi-phase DBs additionally persist the per-entry phase ids (a
        superset of the reference format; reference files load unchanged).
        """
        path = self.npz_path.with_suffix(".npz")
        extra = {}
        if self._has_phases:
            extra["phases"] = self._phases
            if self.config.phase_symmetries is not None:
                extra["phase_groups"] = np.asarray(
                    list(self.config.phase_symmetries), dtype=np.str_
                )
        if self.sim_meta is not None:
            # Simulation provenance (geometry + reflector args from
            # `index.py simulate`) rides inside the npz so `query --refine`
            # can rebuild the exact forward model the dictionary came from.
            import json as _json

            extra["sim_meta"] = np.asarray(_json.dumps(self.sim_meta))
        np.savez_compressed(
            str(path),
            vectors=self._vectors,
            orientations=self._orientations,
            **extra,
        )
        logger.info(f"Saved index and metadata to {path}")

    def load(self) -> None:
        """Load vectors + orientations from the .npz (faiss_db.py:460-476).

        Accepts both this framework's format (``vectors`` key) and `.npz`
        files written by the reference FAISS backend, whose vectors live
        inside a serialized ``IndexFlat`` blob (``faiss_index`` key) — decoded
        here without faiss via :func:`parse_faiss_flat_blob`.
        """
        path = self.npz_path.with_suffix(".npz")
        if not path.exists():
            logger.error(f"Cannot load. NPZ file {path} not found.")
            raise FileNotFoundError("NPZ file missing.")
        data = np.load(str(path))
        if "vectors" in data:
            self._vectors = data["vectors"].astype(np.float32)
        elif "faiss_index" in data:
            self._vectors = parse_faiss_flat_blob(data["faiss_index"]).astype(
                np.float32
            )
            logger.info("Decoded reference-format serialized FAISS index")
        else:
            raise KeyError(
                f"{path} holds neither 'vectors' nor 'faiss_index' — not a "
                "latent-index file"
            )
        self._orientations = data["orientations"].astype(np.float64)
        self._has_phases = "phases" in data
        self._phases = (
            data["phases"].astype(np.int32)
            if self._has_phases
            else np.zeros(len(self._vectors), dtype=np.int32)
        )
        if "phase_groups" in data and self.config.phase_symmetries is None:
            self.config.phase_symmetries = [str(g) for g in data["phase_groups"]]
        if "sim_meta" in data:
            import json as _json

            self.sim_meta = _json.loads(str(data["sim_meta"]))
        self.dimension = self._vectors.shape[1]
        self._dev_cache = None
        self._int8_cache = None
        self._sym_tables_cache = None
        logger.info(f"Loaded index and metadata from {path}")

    def delete_persistence(self) -> None:
        """Delete the persisted file and reset state (faiss_db.py:478-496)."""
        try:
            path = self.npz_path.with_suffix(".npz")
            if path.exists():
                path.unlink()
                logger.info(f"Deleted index file: {path}")
                self._vectors = np.zeros((0, self.dimension), dtype=np.float32)
                self._orientations = np.zeros((0, 3), dtype=np.float64)
                self._phases = np.zeros((0,), dtype=np.int32)
                self._has_phases = False
                self._dev_cache = None
                self._int8_cache = None
                self._sym_tables_cache = None
        except OSError as e:
            logger.error(f"Error deleting index file {self.npz_path}: {e}")
