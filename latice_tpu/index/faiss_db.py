"""FAISS-backend compatibility surface.

Drop-in module for users migrating from the reference's
``latice.index.faiss_db`` (reference: latice/index/faiss_db.py): the same
class/config names and semantics — exact cosine search, degree-unit
misorientation thresholds, single-.npz persistence — backed by the on-TPU
engine instead of the FAISS C++ library.
"""

from __future__ import annotations

from dataclasses import dataclass

from latice_tpu.index.db import (
    LatentVectorDatabaseConfig as _TpuConfig,
    TpuLatentVectorDatabase,
    parse_faiss_flat_blob,
)
from latice_tpu.index.result import OrientationResult

__all__ = [
    "FaissLatentVectorDatabaseConfig",
    "FaissLatentVectorDatabase",
    "OrientationResult",
    "parse_faiss_flat_blob",
]


@dataclass
class FaissLatentVectorDatabaseConfig:
    """Configuration matching faiss_db.py:34-46: npz path + dimension.

    Only flat (exact, brute-force) cosine similarity search is supported —
    which is also all the reference supported.
    """

    npz_path: str = "faiss_index.npz"
    dimension: int = 16


class FaissLatentVectorDatabase(TpuLatentVectorDatabase):
    """Reference-named exact-cosine DB (faiss_db.py:92) on the TPU engine.

    Inherits the full contract: add_vectors (L2-normalizing), query_similar
    returning ``(similarities, indices)``, find_best_orientation with
    degree-unit thresholds, npz save/load/delete_persistence.
    """

    def __init__(self, config: FaissLatentVectorDatabaseConfig | None = None) -> None:
        cfg = config if config is not None else FaissLatentVectorDatabaseConfig()
        super().__init__(
            _TpuConfig(
                npz_path=cfg.npz_path, dimension=cfg.dimension, angle_unit="deg"
            )
        )
