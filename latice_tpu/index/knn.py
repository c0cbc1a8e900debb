"""Exact cosine k-NN on TPU — the FAISS `IndexFlat`/hnswlib replacement.

The reference delegates nearest-neighbour search to third-party C++ engines
(faiss_db.py:135-139 `IndexFlat` + inner product over L2-normalized rows;
chroma_db.py:122-131 HNSW cosine). On TPU the exact search is a single
MXU-friendly matmul: normalize, ``scores = Q @ Dᵀ``, ``lax.top_k`` — at a
16-d latent width even million-entry dictionaries are compute-trivial, so the
TPU-native design is *exact* search everywhere (no approximate index needed).

For dictionaries sharded across a mesh see latice_tpu.parallel.sharded_knn;
for the Pallas fused matmul+top-k (exact, scores never materialized in HBM —
the fastest exact engine at 100k+ rows) see latice_tpu.ops.topk_fused.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "l2_normalize",
    "cosine_topk",
    "cosine_topk_approx",
    "cosine_topk_blocked",
    "cosine_topk_int8",
    "cosine_topk_streamed",
    "quantize_dictionary_int8",
]


def l2_normalize(vectors: jax.Array | np.ndarray, axis: int = -1) -> jax.Array:
    """Row-wise L2 normalization with the reference's zero-norm guard
    (faiss_db.py:109-113: zero rows stay zero instead of NaN)."""
    v = jnp.asarray(vectors)
    norms = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.where(norms == 0, 1.0, norms)


@partial(jax.jit, static_argnames=("k",))
def cosine_topk(
    queries: jax.Array, dictionary: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k cosine similarity search.

    Args:
        queries: ``(B, D)`` query vectors (any scale; normalized internally).
        dictionary: ``(N, D)`` dictionary, assumed **already L2-normalized**
            (done once at add time, mirroring faiss_db.py:178).
        k: Number of neighbours (static).

    Returns:
        ``(scores, indices)`` of shapes ``(B, k)``, ordered best-first —
        the layout of ``faiss.IndexFlat.search`` (faiss_db.py:251).
    """
    q = l2_normalize(queries.astype(jnp.float32))
    scores = jnp.einsum(
        "bd,nd->bn", q, dictionary, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "recall_target"))
def cosine_topk_approx(
    queries: jax.Array, dictionary: jax.Array, k: int, recall_target: float = 0.95
) -> tuple[jax.Array, jax.Array]:
    """Approximate top-k via the TPU-optimized ``lax.approx_max_k``.

    The scores matmul is identical to `cosine_topk`; only the selection is
    approximate. At 1M dictionary entries this runs ~4x faster than exact
    ``top_k`` (12ms vs 50ms for 1024 queries on v5e) with ~0.98 recall@10 —
    the engine of choice for very large dictionaries where exact ordering of
    near-ties doesn't change the consensus outcome.
    """
    q = l2_normalize(queries.astype(jnp.float32))
    scores = jnp.einsum(
        "bd,nd->bn", q, dictionary, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.lax.approx_max_k(scores, k, recall_target=recall_target)


def quantize_dictionary_int8(
    dictionary: np.ndarray | jax.Array,
) -> tuple[np.ndarray | jax.Array, float]:
    """Symmetric int8 quantization of an L2-normalized dictionary.

    Normalized rows lie in [-1, 1], so a single global scale of 127 applies.
    Returns the int8 matrix and the dequantization scale (1/127). Host
    numpy stays host (so a >HBM table can quantize before mesh placement);
    device arrays quantize on device.
    """
    if isinstance(dictionary, np.ndarray):
        d = dictionary.astype(np.float32, copy=False)
        q = np.clip(np.round(d * 127.0), -127, 127).astype(np.int8)
        return q, 1.0 / 127.0
    d = jnp.asarray(dictionary, jnp.float32)
    q = jnp.clip(jnp.round(d * 127.0), -127, 127).astype(jnp.int8)
    return q, 1.0 / 127.0


@partial(jax.jit, static_argnames=("k",))
def cosine_topk_int8(
    queries: jax.Array, dictionary_int8: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Approximate top-k cosine search against an int8 dictionary.

    Both operands quantize to int8 so the score matmul runs on the MXU's
    int8 path (2x bf16 rate, 4x smaller dictionary residency) — the lever for
    >10M-entry dictionaries. Scores carry ~0.5% quantization error; ordering
    of near-ties can differ from the exact engine (use exact search when
    bit-parity matters).
    """
    q = l2_normalize(queries.astype(jnp.float32))
    qi = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        qi,
        dictionary_int8,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc.astype(jnp.float32) / (127.0 * 127.0)
    return jax.lax.top_k(scores, k)


@partial(jax.jit, static_argnames=("k", "block_size"))
def cosine_topk_blocked(
    queries: jax.Array, dictionary: jax.Array, k: int, block_size: int = 131072
) -> tuple[jax.Array, jax.Array]:
    """Top-k search over a dictionary too large for one (B, N) score matrix.

    Streams dictionary blocks through a running top-k merge via ``lax.scan`` —
    HBM-bounded instead of O(B*N) memory. Use when ``B * N`` floats would not
    fit alongside the model (e.g. full-map indexing against >1e6 entries).
    The Pallas `ops.topk_fused.cosine_topk_fused` solves the same problem
    faster (its score tiles never leave VMEM, 2x at 1M rows); this XLA-only
    variant remains as the kernel-free fallback.
    """
    n = dictionary.shape[0]
    num_blocks = -(-n // block_size)
    pad = num_blocks * block_size - n
    # Padded rows are masked to -inf scores in-block below: a zero row scores
    # 0, which would outrank genuine negative-similarity matches.
    d_padded = jnp.pad(dictionary, ((0, pad), (0, 0)))
    blocks = d_padded.reshape(num_blocks, block_size, -1)

    q = l2_normalize(queries.astype(jnp.float32))
    b = q.shape[0]
    init = (
        jnp.full((b, k), -jnp.inf, dtype=jnp.float32),
        jnp.zeros((b, k), dtype=jnp.int32),
    )

    def body(carry, inp):
        best_s, best_i = carry
        block, block_idx = inp
        scores = jnp.einsum(
            "bd,nd->bn", q, block, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        global_col = block_idx * block_size + jnp.arange(block_size)
        scores = jnp.where(global_col[None, :] < n, scores, -jnp.inf)
        local_s, local_i = jax.lax.top_k(scores, min(k, block_size))
        local_i = local_i + block_idx * block_size
        merged_s = jnp.concatenate([best_s, local_s], axis=1)
        merged_i = jnp.concatenate([best_i, local_i], axis=1)
        new_s, sel = jax.lax.top_k(merged_s, k)
        new_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return (new_s, new_i), None

    (scores, indices), _ = jax.lax.scan(
        body, init, (blocks, jnp.arange(num_blocks))
    )
    # Mask any padded-row hits (only possible when k > n).
    valid = indices < n
    return jnp.where(valid, scores, -jnp.inf), jnp.where(valid, indices, 0)


def cosine_topk_streamed(
    queries: jax.Array | np.ndarray,
    dictionary: np.ndarray,
    k: int,
    chunk_rows: int = 131072,
    prefetch: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Exact cosine top-k over a HOST-resident dictionary streamed in chunks.

    For feature tables beyond device memory — pattern-DI at 1M+ entries
    (1M x 16384 bf16 = 33 GB) or >HBM latent tables: the dictionary stays
    in host RAM (or an ``np.memmap`` straight off disk), rows stream
    through the device ``chunk_rows`` at a time with a running (B, k)
    merge, and the next chunk's transfer overlaps the current matmul
    (double-buffered `data.prefetch_to_device`). Device residency is
    O(chunk_rows x D + B x k), independent of N.

    Args:
        queries: ``(B, D)`` — L2-normalized here (f32 math).
        dictionary: ``(N, D)`` numpy array or memmap, rows already
            L2-normalized; any float dtype (bf16 halves host RAM and
            link traffic; f32 chunks use ``precision=HIGHEST`` for
            `cosine_topk` parity).
        k: neighbours.
        chunk_rows: rows per device transfer (the residency knob).
        prefetch: chunks in flight.

    Returns:
        ``(scores, indices)`` device arrays — identical to `cosine_topk`
        over the whole matrix (exact; pinned by test).
    """
    from latice_tpu.data.prefetch import prefetch_to_device

    n, d = dictionary.shape
    if n == 0:
        raise ValueError("empty dictionary")
    chunk_rows = min(chunk_rows, n)
    k = min(k, n)
    q = _normalize_jit(jnp.asarray(queries, jnp.float32))
    b = q.shape[0]
    k_local = min(k, chunk_rows)

    def chunks():
        for start in range(0, n, chunk_rows):
            c = dictionary[start : start + chunk_rows]
            nv = len(c)
            if nv < chunk_rows:
                pad = np.zeros((chunk_rows - nv, d), dtype=c.dtype)
                c = np.concatenate([np.asarray(c), pad])
            yield np.asarray(c), np.int32(start), np.int32(nv)

    run_s = jnp.full((b, k), -jnp.inf, jnp.float32)
    run_i = jnp.zeros((b, k), jnp.int32)
    for c_dev, base, nv in prefetch_to_device(chunks(), size=prefetch):
        # Module-level jitted step: same (shape, dtype, k) -> one compile
        # for the whole stream AND across calls (StreamedPatternDI calls
        # this once per query batch; a per-call closure would recompile a
        # minutes-long program every batch on remote backends).
        run_s, run_i = _streamed_topk_step(
            q, c_dev, base, nv, run_s, run_i, k=k, k_local=k_local
        )
    return run_s, run_i


_normalize_jit = jax.jit(l2_normalize)


@partial(jax.jit, static_argnames=("k", "k_local"))
def _streamed_topk_step(qq, chunk, base, n_valid, run_s, run_i, *, k, k_local):
    """One fold of `cosine_topk_streamed`: score a chunk, merge top-k."""
    if chunk.dtype == jnp.float32:
        scores = jnp.einsum(
            "bd,nd->bn", qq, chunk,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        scores = jnp.einsum(
            "bd,nd->bn", qq.astype(chunk.dtype), chunk,
            preferred_element_type=jnp.float32,
        )
    col = jnp.arange(chunk.shape[0])
    scores = jnp.where(col[None, :] < n_valid, scores, -jnp.inf)
    s, i = jax.lax.top_k(scores, k_local)
    i = i.astype(jnp.int32) + base
    ms, sel = jax.lax.top_k(jnp.concatenate([run_s, s], axis=1), k)
    mi = jnp.take_along_axis(jnp.concatenate([run_i, i], axis=1), sel, axis=1)
    return ms, mi
