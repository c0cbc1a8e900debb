"""Indexing layer: on-TPU k-NN, orientation consensus, vector DB, indexer API."""

from latice_tpu.index.consensus import (
    ConsensusOutput,
    consensus_from_euler,
    consensus_orientations,
)
from latice_tpu.index.db import (
    LatentVectorDatabaseBase,
    LatentVectorDatabaseConfig,
    TpuLatentVectorDatabase,
    parse_faiss_flat_blob,
)
from latice_tpu.index.indexer import DiffractionPatternIndexer, IndexerConfig
from latice_tpu.index.diagnostics import AmbiguityResult, candidate_ambiguity
from latice_tpu.index.hough_indexing import (
    HoughIndexer,
    HoughIndexResult,
    MultiPhaseHoughIndexer,
    MultiPhaseHoughResult,
    band_plane_normals,
    solve_wahba,
)
from latice_tpu.index.pipeline import DenseIndexResult, IndexPipeline
from latice_tpu.index.pattern_di import (
    PatternDictionaryIndexer,
    StreamedPatternDI,
    build_pattern_dictionary,
    ncc_feature_fn,
)
from latice_tpu.index.knn import (
    cosine_topk,
    cosine_topk_approx,
    cosine_topk_blocked,
    cosine_topk_int8,
    cosine_topk_streamed,
    l2_normalize,
    quantize_dictionary_int8,
)
from latice_tpu.index.result import OrientationResult
from latice_tpu.index.spherical import (
    SphericalIndexer,
    SphericalIndexerConfig,
    SphericalResult,
)

__all__ = [
    "ConsensusOutput",
    "AmbiguityResult",
    "DenseIndexResult",
    "candidate_ambiguity",
    "IndexPipeline",
    "HoughIndexer",
    "HoughIndexResult",
    "MultiPhaseHoughIndexer",
    "MultiPhaseHoughResult",
    "band_plane_normals",
    "solve_wahba",
    "PatternDictionaryIndexer",
    "SphericalIndexer",
    "SphericalIndexerConfig",
    "SphericalResult",
    "StreamedPatternDI",
    "build_pattern_dictionary",
    "ncc_feature_fn",
    "DiffractionPatternIndexer",
    "IndexerConfig",
    "LatentVectorDatabaseBase",
    "LatentVectorDatabaseConfig",
    "OrientationResult",
    "TpuLatentVectorDatabase",
    "parse_faiss_flat_blob",
    "consensus_from_euler",
    "consensus_orientations",
    "cosine_topk",
    "cosine_topk_approx",
    "cosine_topk_blocked",
    "cosine_topk_int8",
    "cosine_topk_streamed",
    "quantize_dictionary_int8",
    "l2_normalize",
]
