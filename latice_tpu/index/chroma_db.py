"""ChromaDB-backend compatibility surface.

Drop-in module for users migrating from the reference's
``latice.index.chroma_db`` (reference: latice/index/chroma_db.py): the same
class/config names and the chroma-specific behaviors —

* ``query_similar`` returns a chroma-style results dict with per-candidate
  orientation metadata and **cosine distances** (1 - similarity, the metric
  of a ``{"hnsw:space": "cosine"}`` collection, chroma_db.py:129,231-259);
* ``find_best_orientation`` thresholds misorientation **in radians**
  (the chroma_db.py:307-310 quirk, codified by the reference golden test's
  ``orientation_threshold=0.3  # Radians``) and keeps ``best_orientation`` as
  the closest match even on success (chroma_db.py:299,334-342 never
  reassigns it);
* persistence under a ``persist_directory`` keyed by ``collection_name``,
  with ``delete_collection()`` (chroma_db.py:420-423).

Backed by the exact on-TPU engine — at 16-d latents exact search dominates
HNSW on both speed and recall, so there is intentionally no approximate
index.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Any

import numpy as np
from numpy.typing import NDArray

from latice_tpu.index.db import (
    LatentVectorDatabaseConfig as _TpuConfig,
    TpuLatentVectorDatabase,
)
from latice_tpu.index.result import OrientationResult

logger = logging.getLogger(__name__)

__all__ = [
    "LatentVectorDatabaseConfig",
    "ChromaLatentVectorDatabase",
    "OrientationResult",
]


@dataclass
class LatentVectorDatabaseConfig:
    """Configuration matching chroma_db.py:25-39."""

    collection_name: str = "latent_vectors"
    dimension: int = 16
    persist_directory: str | None = None


class ChromaLatentVectorDatabase(TpuLatentVectorDatabase):
    """Reference-named chroma-semantics DB (chroma_db.py:87) on the TPU engine."""

    def __init__(self, config: LatentVectorDatabaseConfig | None = None) -> None:
        self.chroma_config = (
            config if config is not None else LatentVectorDatabaseConfig()
        )
        self.collection_name = self.chroma_config.collection_name
        self.persist_directory = self.chroma_config.persist_directory
        if self.persist_directory:
            persist_path = Path(self.persist_directory)
            persist_path.mkdir(exist_ok=True, parents=True)
            npz_path = str(persist_path / f"{self.collection_name}.npz")
            logger.info(f"Created persistent store at {self.persist_directory}")
        else:
            # In-memory: a path that never exists on disk unless saved to.
            npz_path = f"{self.collection_name}.npz"
            logger.info("Created in-memory latent vector store")
        super().__init__(
            _TpuConfig(
                npz_path=npz_path,
                dimension=self.chroma_config.dimension,
                angle_unit="rad",
            )
        )
        if self.persist_directory and self.get_count():
            logger.info(
                f"Retrieved existing collection '{self.collection_name}'"
            )

    def add_vectors(
        self,
        latent_vectors: NDArray[np.float64],
        orientations: NDArray[np.float64],
        batch_size: int = 1000,
    ) -> None:
        """Add vectors (``batch_size`` accepted for API parity; the engine
        ingests the whole block at once). Persists when a persist_directory
        was configured, mirroring chroma's durable collections."""
        super().add_vectors(latent_vectors, orientations)
        if self.persist_directory:
            self.save()

    def query_similar(
        self,
        query_vector: NDArray[np.float64],
        n_results: int = 20,
        include_metadata: bool = True,
    ) -> dict[str, Any]:
        """Chroma-style results dict (chroma_db.py:231-259).

        Returns ``ids`` / ``distances`` (cosine distance = 1 - similarity) /
        ``metadatas`` with per-candidate ``phi1``/``Phi``/``phi2`` fields.
        """
        query_vector = np.asarray(query_vector)
        if query_vector.ndim > 1:
            query_vector = query_vector.squeeze()
        if query_vector.shape[0] != self.dimension:
            raise ValueError(
                f"Expected query vector of dimension {self.dimension}, "
                f"got {query_vector.shape[0]}"
            )
        sims, indices = TpuLatentVectorDatabase.query_similar(
            self, query_vector, n_results
        )
        results: dict[str, Any] = {
            "ids": [[f"vec_{i}" for i in indices]],
            "distances": [list(1.0 - sims)],
        }
        if include_metadata:
            results["metadatas"] = [
                [
                    {
                        "orientation_str": ",".join(
                            map(str, self._orientations[i])
                        ),
                        "phi1": float(self._orientations[i][0]),
                        "Phi": float(self._orientations[i][1]),
                        "phi2": float(self._orientations[i][2]),
                    }
                    for i in indices
                ]
            ]
        return results

    # find_best_orientation needs no override: the base single-query method
    # routes through find_best_orientations_batch below, which applies the
    # chroma semantics — radians thresholds come from angle_unit="rad", the
    # closest-match best_orientation pin (chroma_db.py:299) and cosine
    # distances from the batch post-processing.
    def find_best_orientations_batch(
        self,
        query_vectors: NDArray[np.float64],
        batch_size: int | None = None,
        **kwargs: Any,
    ) -> list[OrientationResult]:
        """Batch consensus with the same chroma post-processing as the
        single-query path (closest-match best_orientation, cosine distances)."""
        results = TpuLatentVectorDatabase.find_best_orientations_batch(
            self, query_vectors, batch_size=batch_size, **kwargs
        )
        for result in results:
            if len(result.candidate_orientations):
                result.best_orientation = result.candidate_orientations[0]
            if result.distances is not None and len(result.distances):
                result.distances = 1.0 - result.distances
        return results

    def delete_collection(self) -> None:
        """Drop the collection and its persistence (chroma_db.py:420-423)."""
        self.delete_persistence()
        logger.info(f"Deleted collection '{self.collection_name}'")
