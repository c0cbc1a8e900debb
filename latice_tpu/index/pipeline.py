"""Fused encode+index pipeline: one XLA program from raw patterns to
orientations.

The reference's query path crosses four runtime boundaries per batch
(SURVEY §3.3: host->device, torch encode, device->host, C++ FAISS/hnswlib,
then a Python consensus loop). Here the entire product hot path — VAE
encoder, L2 normalize, dictionary matmul, top-k, symmetry-aware consensus —
compiles into a single jitted program: patterns in, Euler angles out, with
exactly one host->device and one device->host transfer per batch. This is
the benchmark surface for the ">=500k patterns/min/chip" north star
(BASELINE.md).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.index.consensus import consensus_orientations
from latice_tpu.index.knn import l2_normalize

__all__ = ["IndexPipeline", "DenseIndexResult", "concat_dense_results"]


def concat_dense_results(results) -> "DenseIndexResult":
    """Concatenate per-slab `DenseIndexResult`s (the streaming-input case:
    HDF5 scans indexed slab by slab without materializing the whole map)."""
    results = list(results)
    if not results:
        raise ValueError("no results to concatenate")
    if len(results) == 1:
        return results[0]
    phase = (
        None
        if results[0].phase is None
        else np.concatenate([r.phase for r in results])
    )
    cat = lambda f: np.concatenate([getattr(r, f) for r in results])  # noqa: E731
    return DenseIndexResult(
        mean_orientation=cat("mean_orientation"),
        best_orientation=cat("best_orientation"),
        success=cat("success"),
        n_similar=cat("n_similar"),
        indices=cat("indices"),
        scores=cat("scores"),
        phase=phase,
    )


class DenseIndexResult(NamedTuple):
    """Structured bulk-indexing output (host numpy arrays)."""

    mean_orientation: np.ndarray  # (B, 3) zxz deg; NaN rows where not success
    best_orientation: np.ndarray  # (B, 3) mean, or top-1 candidate on failure
    success: np.ndarray  # (B,) bool
    n_similar: np.ndarray  # (B,) int
    indices: np.ndarray  # (B, K) dictionary rows of the candidates
    scores: np.ndarray  # (B, K) cosine similarities
    phase: np.ndarray | None = None  # (B,) int phase id (multi-phase dicts)


class IndexPipeline:
    """Compiled end-to-end indexer over a fixed dictionary.

    Args:
        model: Flax VAE with an ``encode`` method.
        params: Trained parameters.
        dictionary_vectors: ``(N, D)`` L2-normalized latents (host or device).
        dictionary_orientations: ``(N, 3)`` zxz Euler degrees.
        top_n / orientation_threshold / min_required_matches / max_iterations /
        angle_unit: consensus knobs (reference defaults:
            dp_indexer.py:47-48, faiss_db.py:262-264).
        batch_size: static compile batch; inputs are padded up to it.
        consensus_weight_power: optional p — weight in-threshold candidates
            by cosine-similarity**p in the consensus quaternion mean
            (sub-grid refinement; measured -1.8% median off-grid error at
            p=256, see ROADMAP). None (default) keeps the reference's
            uniform mean (faiss_db.py:326-330).
        mesh: optional jax.sharding.Mesh — full data-parallel execution:
            the pattern batch shards over the mesh's first axis for the
            encode (params replicated; compute 1/n per chip), the resulting
            latents all_gather (B x D x 4 bytes — tiny) and the dictionary
            rows shard for the k-NN (per-shard top-k + a k-row all_gather
            merge over ICI), serving dictionaries beyond one chip's HBM.
            ``batch_size`` must divide by the mesh size.
        engine: candidate-search engine — "exact" (default; lax.top_k over
            the full score matrix), "fused" (Pallas matmul+top-k with the
            score matrix held in VMEM: exact lax.top_k parity, ~1.4x at
            100k and ~2x at 1M dictionary rows, and no O(B*N) HBM buffer),
            "approx" (lax.approx_max_k selection, ~4x faster at 1M+
            entries, ~0.98 recall@10), or "int8" (quantized dictionary:
            4x smaller residency, 2x MXU rate, ~0.94 recall@10). Composes
            with ``mesh``: a sharded dictionary uses the chosen engine per
            shard (VERDICT r2 #4).
        recall_target: lax.approx_max_k knob (engine="approx" only).
        preprocess: optional on-device pattern correction applied between
            the input normalization and the encode — either a jittable
            ``(B, H, W, C) -> (B, H', W', C)`` pure function or a
            `data.PreprocessConfig` (compiled via `data.make_preprocess_fn`:
            hot-pixel repair, static/dynamic background correction,
            histogram equalization, binning). Fuses into the pipeline's
            single XLA program, so raw detector stacks index directly and
            uint8 inputs keep the 4x host-link win. The reference has no
            preprocessing stage (its transform is resize/scale only,
            reference data_module.py:17-33).
        dictionary_phases: optional ``(N,)`` int phase id per dictionary entry
            (multi-phase dictionaries, BASELINE config 5). Consensus then
            only counts same-phase candidates as matches and the result
            carries the indexed phase per query.
        phase_symmetries: optional list of point-group names (one per phase
            id, `crystal.ROTATION_GROUPS` keys) selecting each phase's
            symmetry operators; defaults to cubic "432" for every phase.
        feature_fn: optional jittable ``(B, H, W, C) -> (B, D)`` map used
            INSTEAD of the VAE encode (pass ``model=None, params=None``).
            This is the hook behind pattern-space dictionary indexing
            (`index.pattern_di`), where the features are the zero-mean
            L2-normalized pixels themselves; any differentiable/jittable
            embedding works. Runs after the uint8 ``/255`` and
            ``preprocess`` stages, inside the pipeline's single program.
        search_dtype: storage/matmul dtype for the exact and approx engines
            — "float32" (default; reference-parity `precision=HIGHEST`
            scores) or "bfloat16" (half the dictionary HBM residency and
            ~2x MXU rate; scores accumulate in f32 but carry bf16 input
            rounding, so near-tied candidates may swap order). The int8
            engine has its own quantization and the fused kernel manages
            its own tiles; both ignore this knob.
    """

    def __init__(
        self,
        model: Any,
        params: Any,
        dictionary_vectors: np.ndarray,
        dictionary_orientations: np.ndarray,
        top_n: int = 20,
        orientation_threshold: float = 3.0,
        min_required_matches: int = 18,
        max_iterations: int = 3,
        angle_unit: str = "deg",
        batch_size: int = 256,
        mesh: Any = None,
        dictionary_phases: np.ndarray | None = None,
        phase_symmetries: Any = None,
        consensus_weight_power: float | None = None,
        engine: str = "exact",
        recall_target: float = 0.95,
        preprocess: Any = None,
        feature_fn: Any = None,
        search_dtype: str = "float32",
    ) -> None:
        from latice_tpu.crystal import from_euler_zxz_deg, stack_symmetry_tables

        if engine not in ("exact", "approx", "int8", "fused"):
            raise ValueError(f"unknown engine {engine!r}")
        if search_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"unknown search_dtype {search_dtype!r}")
        if feature_fn is None and model is None:
            raise ValueError("pass a model or a feature_fn")
        if feature_fn is not None and model is not None:
            raise ValueError("model and feature_fn are mutually exclusive")
        self.batch_size = batch_size
        self._n = len(dictionary_vectors)
        self.mesh = mesh
        self.engine = engine
        if preprocess is not None and not callable(preprocess):
            from latice_tpu.data.preprocess import (
                PreprocessConfig,
                make_preprocess_fn,
            )

            if not isinstance(preprocess, PreprocessConfig):
                raise TypeError(
                    "preprocess must be a callable or a data.PreprocessConfig,"
                    f" got {type(preprocess).__name__}"
                )
            preprocess = make_preprocess_fn(preprocess)
        self.preprocess = preprocess
        k = min(top_n, self._n)
        self._k = k

        sym_tables = None
        if dictionary_phases is not None:
            phases_np = np.asarray(dictionary_phases, np.int32)
            if phases_np.shape != (self._n,):
                raise ValueError(
                    f"dictionary_phases must be ({self._n},), got {phases_np.shape}"
                )
            n_phases = int(phases_np.max()) + 1 if self._n else 1
            if phase_symmetries is None:
                phase_symmetries = ["432"] * n_phases  # reference default: cubic
            if len(phase_symmetries) < n_phases:
                raise ValueError(
                    f"{n_phases} phase ids but only "
                    f"{len(phase_symmetries)} phase_symmetries entries"
                )
            sym_tables = stack_symmetry_tables(phase_symmetries)
        self.n_phases = None if dictionary_phases is None else n_phases

        if isinstance(dictionary_vectors, jax.Array):
            # Already device-resident (e.g. a pattern-DI feature build):
            # never round-trip it through host numpy — at DI sizes that is
            # gigabytes over the host link — and cast straight to the
            # engine dtype (a bf16 build must not balloon through f32).
            dict_host = dictionary_vectors
        else:
            # Host tables STAY host until placement: under a mesh every
            # shard then device_puts straight onto its own device (a
            # single-device commit first would OOM chip 0 at exactly the
            # >HBM sizes the mesh exists for); single-device commits once
            # below. bf16 host tables keep their dtype (no f32 balloon).
            dict_host = np.asarray(dictionary_vectors)
            if dict_host.dtype not in (np.float32, jnp.bfloat16):
                dict_host = dict_host.astype(np.float32)
        if engine == "int8":
            from latice_tpu.index.knn import quantize_dictionary_int8

            dict_host, _ = quantize_dictionary_int8(dict_host)
        elif search_dtype == "bfloat16" and engine in ("exact", "approx"):
            dict_host = dict_host.astype(jnp.bfloat16)
        elif dict_host.dtype != jnp.float32:
            dict_host = dict_host.astype(jnp.float32)
        if mesh is not None:
            from latice_tpu.parallel import replicate, shard_dictionary

            if batch_size % mesh.devices.size:
                raise ValueError(
                    f"batch_size {batch_size} must divide by mesh size "
                    f"{mesh.devices.size}"
                )
            dict_dev = shard_dictionary(dict_host, mesh)
            if params is not None:
                params = replicate(params, mesh)
        else:
            dict_dev = jnp.asarray(dict_host)
        orient_dev = jnp.asarray(
            np.asarray(dictionary_orientations, np.float32)
        )

        @jax.jit
        def _prep(orients):
            return from_euler_zxz_deg(orients)

        quats_dev = _prep(orient_dev)
        if dictionary_phases is not None:
            # Pack phase ids as a 5th column of the quaternion table so the
            # candidate gather stays a single wide row gather (a second (B, K)
            # gather from an (N,) table is the slow-gather landmine).
            quats_dev = jnp.concatenate(
                [
                    quats_dev,
                    jnp.asarray(phases_np, jnp.float32)[:, None],
                ],
                axis=1,
            )

        # The dictionary is a runtime ARGUMENT, not a closure capture: a
        # closed-over array is baked into the lowered program as a constant
        # (at pattern-DI sizes that is gigabytes of lowering/compile bloat
        # and a re-lower per recompile); as an argument it is donated-free,
        # device-resident once, and shared across recompiles.
        def _run(p, dict_arg, patterns):
            if jnp.issubdtype(patterns.dtype, jnp.integer):
                # uint8 input path: patterns ship over the host link in their
                # native byte form (4x less transfer than f32 — the tunnel,
                # not the chip, bounds full-map scans) and normalize on
                # device with torchvision-ToTensor semantics (/255, matching
                # data/transforms.py and reference data_module.py:91).
                patterns = patterns.astype(jnp.float32) / 255.0
            if preprocess is not None:
                patterns = preprocess(patterns)
            if feature_fn is not None:
                mu = feature_fn(patterns)
            else:
                mu, _ = model.apply({"params": p}, patterns, method="encode")
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                from latice_tpu.parallel.sharded_knn import (
                    sharded_cosine_topk_inner,
                )

                # The batch arrives sharded (in_shardings below), so the
                # encode ran data-parallel; replicate the tiny (B, D)
                # latents (GSPMD inserts one all_gather over ICI) before
                # the dictionary-sharded search, which wants every query
                # on every shard.
                mu = jax.lax.with_sharding_constraint(
                    mu, NamedSharding(mesh, PartitionSpec())
                )
                scores, indices = sharded_cosine_topk_inner(
                    mu, dict_arg, k, mesh, n_valid=self._n,
                    engine=engine, recall_target=recall_target,
                )
            elif engine == "fused":
                # Pallas matmul+top-k (ops/topk_fused.py): exact lax.top_k
                # parity with the (B, N) score matrix never leaving VMEM —
                # measured 1.4x at 100k and 2x at 1M dictionary rows over
                # the XLA matmul+top_k pair (ROADMAP "Selection").
                from latice_tpu.ops.topk_fused import cosine_topk_fused

                scores, indices = cosine_topk_fused(mu, dict_arg, k)
            else:
                q = l2_normalize(mu)
                if engine == "int8":
                    qi = jnp.clip(
                        jnp.round(q * 127.0), -127, 127
                    ).astype(jnp.int8)
                    acc = jax.lax.dot_general(
                        qi, dict_arg,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    scores = acc.astype(jnp.float32) / (127.0 * 127.0)
                elif search_dtype == "bfloat16":
                    # Half the dictionary residency + full MXU rate; the
                    # accumulator stays f32 so only the inputs round.
                    scores = jnp.einsum(
                        "bd,nd->bn",
                        q.astype(jnp.bfloat16),
                        dict_arg,
                        preferred_element_type=jnp.float32,
                    )
                else:
                    scores = jnp.einsum(
                        "bd,nd->bn",
                        q,
                        dict_arg,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                if engine == "approx":
                    scores, indices = jax.lax.approx_max_k(
                        scores, k, recall_target=recall_target
                    )
                else:
                    scores, indices = jax.lax.top_k(scores, k)
            cand_rows = jnp.take(quats_dev, indices, axis=0)
            cand_quats = cand_rows[..., :4]
            cand_phases = (
                cand_rows[..., 4].astype(jnp.int32)
                if dictionary_phases is not None
                else None
            )
            cand_weights = None
            if consensus_weight_power is not None:
                # Sub-grid refinement: weight in-threshold candidates by
                # similarity^p in the quaternion mean. scores near 1 make
                # s^p ~ exp(-p (1 - s)), so p sets the sharpness; uniform
                # (reference faiss_db.py:326-330 parity) when disabled.
                # Normalize by the per-row max BEFORE powering: raw s**p
                # flushes to zero in f32 for p=256 at s <~ 0.71, which would
                # hand quat_mean all-zero weights (arbitrary result) while
                # success stayed True. (s / s_max)**p keeps the top weight
                # at exactly 1 and preserves the ranking.
                pos = jnp.maximum(scores, 0.0)
                top = jnp.maximum(
                    jnp.max(pos, axis=-1, keepdims=True), jnp.float32(1e-30)
                )
                cand_weights = (pos / top) ** consensus_weight_power
            cons = consensus_orientations(
                cand_quats,
                orientation_threshold,
                min_required_matches=min_required_matches,
                max_iterations=min(max_iterations, k),
                angle_unit=angle_unit,
                cand_phases=cand_phases,
                sym_tables=sym_tables,
                cand_weights=cand_weights,
            )
            # Failure fallback = top-1 candidate, derived from its already-
            # gathered quaternion: a second row gather from the (N, 3) Euler
            # table lowers to an ~80ms scalar gather on TPU. The quat->euler
            # round trip canonicalizes angles to scipy ranges ([-180, 180],
            # [0, 180]) — same rotation as the stored row.
            from latice_tpu.crystal import to_euler_zxz_deg

            top1_euler = to_euler_zxz_deg(cand_quats[:, 0])
            best = jnp.where(
                cons.success[:, None], cons.mean_euler, top1_euler
            )
            n_similar = cons.similar_mask.sum(axis=1)
            out = (
                cons.mean_euler,
                best,
                cons.success,
                n_similar,
                indices,
                scores,
            )
            if cand_phases is not None:
                # Failure fallback mirrors `best`: report the top-1's phase.
                out = out + (
                    jnp.where(cons.success, cons.phase, cand_phases[:, 0]),
                )
            return out

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            axis = mesh.axis_names[0]
            self._run = jax.jit(
                _run,
                in_shardings=(
                    NamedSharding(mesh, PartitionSpec()),          # params
                    NamedSharding(mesh, PartitionSpec(axis, None)),  # dict rows
                    NamedSharding(mesh, PartitionSpec(axis)),      # batch
                ),
            )
        else:
            self._run = jax.jit(_run)
        self._params = params
        self._dict_dev = dict_dev

    def __call__(self, patterns: np.ndarray) -> DenseIndexResult:
        """Index a stack of NHWC patterns; handles padding + chunking.

        Dispatch is two-phase: all chunks are enqueued first (device transfers
        and compute overlap via async dispatch), then results materialize —
        a device-to-host sync per chunk would serialize the stream.
        """
        x = np.asarray(patterns)
        # uint8 stays uint8 (device-side /255 in _run); everything else takes
        # the reference f32 path unchanged.
        if x.dtype != np.uint8:
            x = x.astype(np.float32, copy=False)
        if x.ndim == 3:
            x = x[..., None]
        if len(x) == 0:
            k = self._k
            return DenseIndexResult(
                mean_orientation=np.zeros((0, 3), np.float64),
                best_orientation=np.zeros((0, 3), np.float64),
                success=np.zeros((0,), bool),
                n_similar=np.zeros((0,), np.int64),
                indices=np.zeros((0, k), np.int64),
                scores=np.zeros((0, k), np.float64),
                phase=None if self.n_phases is None else np.zeros((0,), np.int64),
            )
        from latice_tpu.data.datamodule import padded_batches

        pending = [
            (n, self._run(self._params, self._dict_dev, jnp.asarray(chunk)))
            for n, chunk in padded_batches(x, self.batch_size)
        ]
        outs = [tuple(np.asarray(r[:n]) for r in res) for n, res in pending]

        n_fields = len(outs[0])
        mean, best, success, n_sim, indices, scores, *extra = (
            np.concatenate([o[i] for o in outs]) for i in range(n_fields)
        )
        mean = np.where(success[:, None], mean, np.nan).astype(np.float64)
        return DenseIndexResult(
            mean_orientation=mean,
            best_orientation=best.astype(np.float64),
            success=success.astype(bool),
            n_similar=n_sim.astype(np.int64),
            indices=indices.astype(np.int64),
            scores=scores.astype(np.float64),
            phase=extra[0].astype(np.int64) if extra else None,
        )
