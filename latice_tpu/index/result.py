"""Orientation query result container.

API-parity port of `OrientationResult` (reference: latice/index/faiss_db.py:48-89,
duplicated at chroma_db.py:41-84 — unified here as SURVEY §2 #9 requires).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from numpy.typing import NDArray

__all__ = ["OrientationResult"]


@dataclass
class OrientationResult:
    """Results from an orientation matching query.

    Attributes:
        query_vector: Original latent vector used for the query.
        best_orientation: Best matched orientation in ZXZ Euler angles (degrees).
        candidate_orientations: All top candidate orientations from similarity
            search.
        distances: Similarity metric for each candidate orientation.
        mean_orientation: Consensus mean orientation (None when no consensus).
        success: Whether a valid orientation match was found.
        similar_indices: Indices (within the candidate list) of orientations
            inside the misorientation threshold.
        phase: Crystal phase id of the matched orientation (multi-phase
            dictionaries only; None for single-phase — the reference's only
            mode).
    """

    query_vector: NDArray[np.float64]
    best_orientation: NDArray[np.float64]
    candidate_orientations: NDArray[np.float64]
    distances: NDArray[np.float64] | None
    mean_orientation: NDArray[np.float64] | None = None
    success: bool = True
    similar_indices: NDArray[np.int64] | None = None
    phase: int | None = None

    def get_top_n_orientations(self, n: int = 5) -> NDArray[np.float64]:
        """Top-N orientations sorted by distance (faiss_db.py:71-89 semantics).

        Note: preserves the reference behavior of sorting distances
        *ascending* even though the stored metric is a cosine similarity.
        """
        if self.distances is None or len(self.distances) == 0:
            return self.candidate_orientations[
                : min(n, len(self.candidate_orientations))
            ]
        sorted_indices = np.argsort(self.distances)
        return self.candidate_orientations[
            sorted_indices[: min(n, len(sorted_indices))]
        ]
