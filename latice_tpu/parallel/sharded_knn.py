"""Dictionary-sharded exact k-NN over a device mesh.

For dictionaries beyond one chip's HBM (SURVEY §2 native-accounting table:
"shard dictionary over mesh for >HBM sizes"): the dictionary rows are
partitioned over the mesh's data axis, every device computes top-k against its
shard (a local MXU matmul — zero communication), and the per-shard candidates
are merged with a single small ``all_gather`` of k rows per device. The merge
re-bases local indices to global dictionary positions.

Communication cost: O(devices * B * k) scalars over ICI — independent of
dictionary size N.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from latice_tpu.index.knn import l2_normalize

__all__ = ["shard_dictionary", "sharded_cosine_topk", "sharded_cosine_topk_inner"]


def shard_dictionary(
    dictionary: jax.Array | np.ndarray, mesh: Mesh
) -> jax.Array:
    """Place an (N, D) dictionary row-sharded over the mesh.

    Non-divisible N is padded with zero rows; the search functions mask the
    padded positions to -inf via ``n_valid`` (cosine scores can be negative,
    so a zero row's score of 0 could otherwise outrank real matches).
    Any dtype shards — pass an int8-quantized dictionary
    (`index.knn.quantize_dictionary_int8`) to compose the quantized engine
    with mesh sharding (4x smaller per-device residency on top of the 1/n
    row split).
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    if dictionary.shape[0] % n != 0:
        pad = n - dictionary.shape[0] % n
        if isinstance(dictionary, np.ndarray):
            # Host tables pad on host: device_put below then places each
            # shard straight on its own device, so a >HBM table never
            # commits to a single chip.
            dictionary = np.concatenate(
                [
                    dictionary,
                    np.zeros((pad, dictionary.shape[1]), dictionary.dtype),
                ]
            )
        else:
            dictionary = jnp.pad(dictionary, ((0, pad), (0, 0)))
    return jax.device_put(dictionary, NamedSharding(mesh, P(axis)))


def sharded_cosine_topk(
    queries: jax.Array,
    dictionary_sharded: jax.Array,
    k: int,
    mesh: Mesh,
    n_valid: int | None = None,
    engine: str = "exact",
    recall_target: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """Top-k over a row-sharded dictionary; replicated (B, k) results.

    Args:
        queries: (B, D), replicated (placed on mesh by this call).
        dictionary_sharded: (N, D) row-sharded; L2-normalized float for
            "exact"/"approx", int8-quantized (`quantize_dictionary_int8`)
            for "int8".
        k: neighbours (static).
        mesh: the device mesh.
        n_valid: number of genuine dictionary rows; rows at index >= n_valid
            are padding from `shard_dictionary` and are masked to -inf.
            Defaults to all rows.
        engine: per-shard selection engine — "exact" (lax.top_k), "approx"
            (lax.approx_max_k, ~4x faster selection at 1M+ rows/shard),
            "int8" (int8 MXU matmul against a quantized shard), or "fused"
            (Pallas matmul+top-k, exact, scores stay in VMEM — ~2x exact
            selection at 1M rows/shard, ops/topk_fused.py). Composes the
            scale engines with mesh sharding, so >HBM *and* >10M-entry
            dictionaries can use both (VERDICT r2 #4). The k-row all_gather
            merge is identical for every engine.
        recall_target: approx_max_k knob (engine="approx" only).

    Returns:
        (scores, indices) with **global** dictionary indices, best-first —
        identical to latice_tpu.index.knn.cosine_topk on the unsharded data
        (to the chosen engine's accuracy).
    """
    queries = jax.device_put(
        jnp.asarray(queries, jnp.float32), NamedSharding(mesh, P())
    )
    return sharded_cosine_topk_inner(
        queries, dictionary_sharded, k, mesh, n_valid,
        engine=engine, recall_target=recall_target,
    )


def sharded_cosine_topk_inner(
    queries: jax.Array,
    dictionary_sharded: jax.Array,
    k: int,
    mesh: Mesh,
    n_valid: int | None = None,
    engine: str = "exact",
    recall_target: float = 0.95,
) -> tuple[jax.Array, jax.Array]:
    """Jit-nestable core of `sharded_cosine_topk` (no host-side placement).

    ``queries`` must already be replicated over the mesh (or inside a jit
    where sharding propagation replicates them).
    """
    if engine not in ("exact", "approx", "int8", "fused"):
        raise ValueError(f"unknown sharded engine {engine!r}")
    axis = mesh.axis_names[0]
    n_total = dictionary_sharded.shape[0]
    n_dev = mesh.devices.size
    shard_rows = n_total // n_dev
    k_local = min(k, shard_rows)
    if n_valid is None:
        n_valid = n_total

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _local_then_merge(q, dict_shard):
        q = l2_normalize(q)
        shard_id = jax.lax.axis_index(axis)
        if engine == "fused":
            # Pallas matmul+top-k: the (B, shard_rows) score block never
            # leaves VMEM (ops/topk_fused.py — exact, ~1.4-2x the XLA
            # matmul+top_k at 100k-1M rows). Padded rows mask via the
            # kernel's n_valid bias; this shard holds rows
            # [shard_id*shard_rows, (shard_id+1)*shard_rows).
            from latice_tpu.ops.topk_fused import cosine_topk_fused

            nv_local = jnp.clip(
                n_valid - shard_id * shard_rows, 0, shard_rows
            )
            local_s, local_i = cosine_topk_fused(
                q, dict_shard, k_local, n_valid=nv_local
            )
            local_i = local_i + shard_id * shard_rows
            all_s = jax.lax.all_gather(local_s, axis)
            all_i = jax.lax.all_gather(local_i, axis)
            b = q.shape[0]
            merged_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_dev * k_local)
            merged_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_dev * k_local)
            best_s, sel = jax.lax.top_k(merged_s, k)
            best_i = jnp.take_along_axis(merged_i, sel, axis=1)
            return best_s, best_i
        if engine == "int8":
            # Same math as knn.cosine_topk_int8, against the local shard:
            # int8 x int8 -> int32 on the MXU's double-rate path.
            qi = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                qi, dict_shard,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            scores = acc.astype(jnp.float32) / (127.0 * 127.0)
        else:
            scores = jnp.einsum(
                "bd,nd->bn", q, dict_shard,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        global_col = shard_id * shard_rows + jnp.arange(shard_rows)
        # Mask padded rows (index >= n_valid) before selection: their zero
        # rows would score 0 and outrank genuine negative-similarity matches.
        scores = jnp.where(global_col[None, :] < n_valid, scores, -jnp.inf)
        if engine == "approx":
            local_s, local_i = jax.lax.approx_max_k(
                scores, k_local, recall_target=recall_target
            )
        else:
            local_s, local_i = jax.lax.top_k(scores, k_local)  # (B, k_local)
        local_i = local_i + shard_id * shard_rows
        # Gather every shard's candidates: (n_dev, B, k_local) -> concat.
        all_s = jax.lax.all_gather(local_s, axis)
        all_i = jax.lax.all_gather(local_i, axis)
        b = q.shape[0]
        merged_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_dev * k_local)
        merged_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_dev * k_local)
        best_s, sel = jax.lax.top_k(merged_s, k)
        best_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return best_s, best_i

    return _local_then_merge(queries, dictionary_sharded)
