"""Pallas TPU kernel: fused cosine-score matmul + exact streaming top-k.

Motivation (b1024 x 100k-dict pipeline trace, ROADMAP "Selection"): the
(B, N) score matrix costs 0.86 ms to produce but `lax.top_k` over it costs
4.0 ms — XLA's selection reads the 410 MB matrix at ~100 GB/s, 8x under
roofline, and every XLA-level alternative measured worse (blocked merges,
two-phase gathers, approx_max_k at this width). The structural fix is to
never materialize the scores in HBM at all: fuse the matmul with the
selection so each (TB, TN) score tile lives only in VMEM and is reduced to
k running candidates on the spot.

Per tile the selection is a k-round iterative extraction (max -> lowest
tied column -> mask), which is O(k * TB * TN) VPU work; across all tiles
that is ~5 * k * B * N elementwise ops (~5e9 at the pipeline shape) with
*zero* extra HBM traffic — the dictionary's 6.4 MB is the only input read
beyond the queries. Tie-breaking selects the lowest global index on equal
scores, bit-matching `lax.top_k`'s stable descending order, so the kernel
is a drop-in exact engine, not an approximation.

Replaces the selection behind the same contract as `knn.cosine_topk`
(reference semantics: faiss_db.py:135-139 IndexFlat inner-product search
over L2-normalized rows, best-first (B, k) output, faiss_db.py:251).

Measured on v5e (1024 queries, k=10, same-process A/B): 100k dict 5.2 ms
vs 7.8 ms XLA matmul+top_k; 1M dict 25.8 ms vs 50.4 ms — ~1.5x/2x with
bit-identical indices, and the O(B*N) score matrix (4 GB at 1M) never
exists in HBM. In the b1024 bench pipeline: 24.1 -> 21.8 ms/batch (+10%).
See ROADMAP.md "Selection" for the full sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cosine_topk_fused"]

_NEG_INF = float("-inf")
_INT_MAX = jnp.iinfo(jnp.int32).max


def _extract_topk_tile(scores, gidx, k):
    """k-round extraction of the best (value, global index) pairs.

    Args:
        scores: ``(TB, TN)`` f32 tile (already masked for padding).
        gidx: ``(TB, TN)`` int32 global column ids (unique per column).
        k: static number of rounds.

    Returns:
        ``(vals, idx)`` of shape ``(TB, k)``, best-first; ties broken toward
        the lowest global index (the `lax.top_k` stable order).
    """
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(scores, axis=1, keepdims=True)
        is_m = scores == m
        sel = jnp.min(jnp.where(is_m, gidx, _INT_MAX), axis=1, keepdims=True)
        vals.append(m)
        idxs.append(sel)
        scores = jnp.where(gidx == sel, _NEG_INF, scores)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


def _topk_kernel(q_ref, dt_ref, bias_ref, out_v_ref, out_i_ref, sc, new_v,
                 new_i, run_v, run_i, cont, *, k, tile_n, precision,
                 early_exit):
    j = pl.program_id(1)
    nn = pl.num_programs(1)

    scores = jax.lax.dot_general(
        q_ref[:], dt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    tb, tn = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, tn), 1)
    gidx = col + j * tile_n
    # The bias row is 0 on valid columns and -inf on padding: zero-padded
    # dictionary rows score 0.0, which would outrank genuine negative-
    # similarity matches (knn.py:133-135) — the add masks them to -inf.
    sc[:] = scores + bias_ref[:]
    new_v[:] = jnp.full((tb, k), _NEG_INF, jnp.float32)
    new_i[:] = jnp.full((tb, k), _INT_MAX, jnp.int32)
    cont[0] = 1

    def _round(r):
        s = sc[:]
        m = jnp.max(s, axis=1, keepdims=True)
        is_m = s == m
        sel = jnp.min(
            jnp.where(is_m, gidx, _INT_MAX), axis=1, keepdims=True
        )
        new_v[:, r : r + 1] = m
        new_i[:, r : r + 1] = sel
        sc[:] = jnp.where(gidx == sel, _NEG_INF, s)
        return m

    if early_exit:
        # Candidates at or below the running k-th value can never enter the
        # merge: tiles arrive in ascending global-index order, so an exact
        # tie always loses to the already-kept lower index (the `lax.top_k`
        # stable order). Once a round's per-row maxima all fall to that
        # bar, the remaining rounds of this tile are provably dead — skip
        # them. (Measured SLOWER than just running all k rounds — see the
        # early_exit docstring — kept as the A/B arm.)
        t_bar = jnp.where(j > 0, run_v[:, k - 1 : k], _NEG_INF)
        for r in range(k):
            @pl.when(cont[0] == 1)
            def _(r=r):
                m = _round(r)
                cont[0] = jnp.any(m > t_bar).astype(jnp.int32)
    else:
        for r in range(k):
            _round(r)

    @pl.when(j == 0)
    def _():
        run_v[:], run_i[:] = new_v[:], new_i[:]

    @pl.when(j > 0)
    def _():
        comb_v = jnp.concatenate([run_v[:], new_v[:]], axis=1)
        comb_i = jnp.concatenate([run_i[:], new_i[:]], axis=1)
        run_v[:], run_i[:] = _extract_topk_tile(comb_v, comb_i, k)

    @pl.when(j == nn - 1)
    def _():
        out_v_ref[:] = run_v[:]
        out_i_ref[:] = run_i[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile_b", "tile_n", "interpret", "early_exit"),
)
def cosine_topk_fused(
    queries: jax.Array,
    dictionary: jax.Array,
    k: int,
    tile_b: int = 128,
    tile_n: int = 8192,
    interpret: bool | None = None,
    n_valid: jax.Array | int | None = None,
    early_exit: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k cosine search with the scores never leaving VMEM.

    Same contract as `knn.cosine_topk`: queries are normalized internally,
    the dictionary is assumed L2-normalized (done once at add time,
    faiss_db.py:178), output is best-first ``(B, k)`` scores + indices.

    Args:
        queries: ``(B, D)`` query vectors.
        dictionary: ``(N, D)`` L2-normalized dictionary, ``N >= k``.
        k: neighbours (static). Extraction cost is linear in k (k unrolled
            rounds per tile) — the kernel targets the product's k <= ~32
            candidate counts; prefer `knn.cosine_topk` for large k.
        tile_b / tile_n: VMEM tile sizes; the (tile_b, tile_n) f32 score
            tile plus double-buffered dictionary tiles must fit in ~16 MB.
            Defaults are the measured v5e optimum (ROADMAP "Selection").
        interpret: run in Pallas interpreter mode; None (default)
            auto-selects interpreter mode off-TPU (CPU tests).
        n_valid: number of genuine dictionary rows (may be traced). Rows at
            index >= n_valid are zero padding (e.g. from
            `parallel.shard_dictionary`) and are masked to -inf. Defaults
            to all of ``N``.
        early_exit: skip provably-dead extraction rounds per tile (exact
            either way). Measured SLOWER on v5e (6.5 vs 5.2 ms at
            1024x100k: the per-round SMEM flag + cross-row `any` reduce
            serialize the VPU pipeline harder than the skipped rounds
            cost) — default off; kept as a measured negative result.

    Returns:
        ``(scores, indices)`` of shape ``(B, k)``.
    """
    from latice_tpu.index.knn import l2_normalize

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, d = queries.shape
    n = dictionary.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds dictionary size {n}")
    if k > 64:
        raise ValueError(
            f"k={k}: the fused kernel unrolls k extraction rounds per tile "
            "and is built for the product's k <= ~32 candidate counts; use "
            "knn.cosine_topk (exact) or cosine_topk_approx for large k"
        )

    q = l2_normalize(queries.astype(jnp.float32))
    dt = dictionary.astype(jnp.float32).T  # (D, N): lanes along N

    tile_b = min(tile_b, max(8, b))
    tile_n = min(tile_n, max(128, -(-n // 128) * 128))
    pad_b = -b % tile_b
    pad_n = -n % tile_n
    if pad_b:
        q = jnp.pad(q, ((0, pad_b), (0, 0)))
    if pad_n:
        dt = jnp.pad(dt, ((0, 0), (0, pad_n)))

    if n_valid is None:
        n_valid = n
    col_ids = jnp.arange(n + pad_n, dtype=jnp.int32)
    bias = jnp.where(col_ids < n_valid, 0.0, _NEG_INF).astype(jnp.float32)
    bias = bias[None, :]  # (1, N_padded)

    grid = ((b + pad_b) // tile_b, (n + pad_n) // tile_n)
    kernel = functools.partial(
        _topk_kernel, k=k, tile_n=tile_n,
        precision=jax.lax.Precision.HIGHEST, early_exit=early_exit,
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, d), lambda i, j: (i, 0)),
            pl.BlockSpec((d, tile_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_b, k), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b + pad_b, k), jnp.float32),
            jax.ShapeDtypeStruct((b + pad_b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_b, tile_n), jnp.float32),  # mutable score tile
            pltpu.VMEM((tile_b, k), jnp.float32),       # this tile's top-k
            pltpu.VMEM((tile_b, k), jnp.int32),
            pltpu.VMEM((tile_b, k), jnp.float32),       # running top-k
            pltpu.VMEM((tile_b, k), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),                # round live-flag
        ],
        interpret=interpret,
    )(q, dt, bias)
    return out_v[:b], out_i[:b]
