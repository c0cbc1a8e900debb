"""Parallelism: device meshes, data-parallel sharding, sharded k-NN."""

from latice_tpu.parallel.mesh import (
    data_parallel_sharding,
    dp_dispatch_plan,
    make_mesh,
    replicate,
    replicate_state,
    shard_batch,
)
from latice_tpu.parallel.sharded_knn import (
    shard_dictionary,
    sharded_cosine_topk,
    sharded_cosine_topk_inner,
)

__all__ = [
    "data_parallel_sharding",
    "dp_dispatch_plan",
    "make_mesh",
    "replicate",
    "replicate_state",
    "shard_batch",
    "shard_dictionary",
    "sharded_cosine_topk",
    "sharded_cosine_topk_inner",
]
