"""Pattern-space dictionary indexing (DI): NCC against raw patterns.

The classic dictionary-indexing baseline (the role of EMsoft's EMDI):
index an experimental pattern by normalized cross-correlation (NCC)
directly against every simulated dictionary pattern — no trained encoder
in the loop. The reference framework has no such engine; its retrieval is
latent-space only (reference faiss_db.py:135-139, chroma_db.py:116-131).
Here DI completes the native dictionary loop (``index.py sample`` →
``simulate`` → ``di``) and doubles as the accuracy yardstick the VAE
pipeline is judged against: same dictionary, same consensus, features
swapped from 16-d latents to the pixels themselves.

TPU mapping: zero-mean + L2-normalize each pattern and NCC *is* cosine
similarity, so the whole search plane is the latent k-NN machinery with
``D = H*W / bin²`` features — one MXU matmul per batch against a
dictionary matrix held in bf16 (half residency, full MXU rate; NCC
rankings tolerate bf16 input rounding, pinned by test). Compute per query
is ~D/16 times the latent engine's, which is exactly the trade DI buys:
no training, physics-faithful scores, at brute-force cost. The
`IndexPipeline` does the heavy lifting via its ``feature_fn`` hook, so
batching/padding, the two-phase dispatch, multi-phase dictionaries, the
``preprocess=`` stage, mesh sharding, and the exact/approx/int8 engines
all compose with DI unchanged. (The "fused" Pallas engine is excluded:
its VMEM score tiles assume a narrow feature axis; at D ≥ 4096 the
(tile_n, D) dictionary slab alone overflows VMEM.)

NCC is invariant to any per-pattern affine intensity transform (the zero
mean removes offset, the norm removes gain), so uint8 detector frames
need no /255 and no background gain correction changes the ranking —
only *structured* corrections (hot pixels, static background shape) do,
and those run through ``preprocess=`` before the features.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.index.pipeline import DenseIndexResult, IndexPipeline

__all__ = [
    "ncc_feature_fn",
    "build_pattern_dictionary",
    "PatternDictionaryIndexer",
    "StreamedPatternDI",
]


def ncc_feature_fn(bin_factor: int = 1) -> Callable[[jax.Array], jax.Array]:
    """A jittable ``(B, H, W, C) -> (B, D)`` NCC feature map.

    Mean-pools by ``bin_factor`` (the standard DI speed knob — EMsoft bins
    detector frames before correlating), then flattens, removes each
    pattern's mean and L2-normalizes, so a dot product of two feature rows
    is exactly their NCC.
    """
    if bin_factor < 1:
        raise ValueError(f"bin_factor must be >= 1, got {bin_factor}")

    def fn(x: jax.Array) -> jax.Array:
        x = x.astype(jnp.float32)
        if bin_factor > 1:
            b, h, w, c = x.shape
            if h % bin_factor or w % bin_factor:
                raise ValueError(
                    f"bin_factor {bin_factor} does not divide {h}x{w}"
                )
            x = x.reshape(
                b, h // bin_factor, bin_factor, w // bin_factor, bin_factor, c
            ).mean(axis=(2, 4))
        v = x.reshape(x.shape[0], -1)
        v = v - v.mean(axis=1, keepdims=True)
        norm = jnp.linalg.norm(v, axis=1, keepdims=True)
        return v / jnp.maximum(norm, 1e-12)

    return fn


def build_pattern_dictionary(
    patterns: np.ndarray | jax.Array,
    bin_factor: int = 1,
    batch_size: int = 512,
    preprocess: Any = None,
    as_numpy: bool = True,
    dtype: Any = jnp.float32,
) -> np.ndarray | jax.Array:
    """NCC feature rows for a dictionary pattern stack, computed on device.

    Args:
        patterns: ``(N, H, W)`` or ``(N, H, W, 1)`` stack, any real dtype
            (uint8 simulate output included — NCC is gain/offset invariant,
            so no /255 is needed). A device-resident jax.Array is chunked
            in place without a host copy.
        bin_factor: mean-pool factor applied before flattening.
        batch_size: patterns per device dispatch.
        preprocess: optional jittable ``(B, H, W, C) -> (B, H', W', C)``
            correction applied before the features (must match the
            ``preprocess=`` given to the indexer, or the dictionary and
            the queries live in different feature spaces).
        as_numpy: return host numpy (persistable / streamable) — pass
            False to keep the rows on device, which skips a
            gigabytes-scale host round trip at unbinned DI sizes
            (100k x 16384 f32 = 6.5 GB).
        dtype: feature dtype — f32 default; bf16 halves residency (and
            host RAM for `StreamedPatternDI` tables; numpy carries it as
            ml_dtypes.bfloat16).

    Returns:
        ``(N, D)`` feature rows (unit-norm, zero-mean), numpy or device
        array per ``as_numpy``. Feed to `PatternDictionaryIndexer` or
        `StreamedPatternDI`.
    """
    from latice_tpu.data.datamodule import padded_batches

    x = patterns if isinstance(patterns, jax.Array) else np.asarray(patterns)
    if x.ndim == 3:
        x = x[..., None]
    preprocess = _as_preprocess_fn(preprocess)
    feat = ncc_feature_fn(bin_factor)

    def staged(p):
        # Mirror IndexPipeline._run's input semantics EXACTLY (uint8 /255
        # before the correction): a background estimated in /255 units
        # must see /255 data on the dictionary side too, or dictionary
        # and queries land in different feature spaces.
        if jnp.issubdtype(p.dtype, jnp.integer):
            p = p.astype(jnp.float32) / 255.0
        if preprocess is not None:
            p = preprocess(p.astype(jnp.float32))
        return feat(p).astype(dtype)

    run = jax.jit(staged)
    out = [
        (n, run(jnp.asarray(chunk)))
        for n, chunk in padded_batches(x, batch_size)
    ]
    if as_numpy:
        return np.concatenate([np.asarray(r[:n]) for n, r in out])
    return jnp.concatenate([r[:n] for n, r in out])


def _as_preprocess_fn(preprocess: Any) -> Any:
    """Accept a callable or a `data.PreprocessConfig` (pipeline parity)."""
    if preprocess is None or callable(preprocess):
        return preprocess
    from latice_tpu.data.preprocess import PreprocessConfig, make_preprocess_fn

    if not isinstance(preprocess, PreprocessConfig):
        raise TypeError(
            "preprocess must be a callable or a data.PreprocessConfig, "
            f"got {type(preprocess).__name__}"
        )
    return make_preprocess_fn(preprocess)


class PatternDictionaryIndexer:
    """Brute-force NCC dictionary indexer over raw patterns.

    A thin assembly over `IndexPipeline(feature_fn=...)`: call it with a
    pattern stack exactly like a pipeline and get a `DenseIndexResult`
    whose ``scores`` are NCC values.

    Args:
        dictionary_patterns: ``(N, H, W[, 1])`` simulated dictionary stack
            (``index.py simulate`` output), OR precomputed ``(N, D)``
            feature rows from `build_pattern_dictionary` (pass
            ``bin_factor`` consistently in that case).
        dictionary_orientations: ``(N, 3)`` zxz Euler degrees.
        bin_factor: mean-pool factor for both dictionary and queries.
        engine: "exact" (default), "approx", or "int8" — see
            `IndexPipeline`; "fused" is rejected (VMEM tiles assume a
            narrow feature axis).
        search_dtype: "bfloat16" (default — DI is residency/MXU bound and
            NCC ranking tolerates input rounding) or "float32".
        preprocess: optional on-device correction for the *queries only*
            — detector corrections (hot pixels, backgrounds) map raw
            experimental frames toward the ideal space a simulated
            dictionary already lives in, so the dictionary stays clean by
            default. Pass ``dict_preprocess`` when the dictionary stack
            is itself raw detector data and needs the same correction.
            Corrections must preserve the frame shape queries and
            dictionary share (bin via ``bin_factor``, which applies to
            both sides inside the features, not via a recipe ``bin=``).
        dict_preprocess: optional correction for the dictionary stack
            (see above; ignored when precomputed feature rows are given).
        Everything else (top_n, orientation_threshold,
        min_required_matches, batch_size, mesh, dictionary_phases,
        phase_symmetries, consensus_weight_power, ...) forwards to
        `IndexPipeline` unchanged.
    """

    def __init__(
        self,
        dictionary_patterns: np.ndarray,
        dictionary_orientations: np.ndarray,
        bin_factor: int = 1,
        engine: str = "exact",
        search_dtype: str = "bfloat16",
        preprocess: Any = None,
        dict_preprocess: Any = None,
        dict_batch_size: int = 512,
        **pipeline_kw: Any,
    ) -> None:
        if engine == "fused":
            raise ValueError(
                "pattern DI cannot use the fused engine: its VMEM score "
                "tiles assume a narrow feature axis (use exact/approx/int8)"
            )
        pats = (
            dictionary_patterns
            if isinstance(dictionary_patterns, jax.Array)
            else np.asarray(dictionary_patterns)
        )
        if pats.ndim == 2:
            vectors = pats  # precomputed rows (host or device)
        else:
            # Build in the engine dtype directly — an f32 intermediate at
            # unbinned sizes (100k x 16384 = 6.5 GB, doubled by the
            # concatenate) would exhaust a 16 GB chip. Single device:
            # device-resident rows go straight into the pipeline (no host
            # round trip). Mesh: build to HOST and let shard_dictionary
            # place each shard on its own device — a device-side build
            # would commit the full table to chip 0, OOMing at exactly
            # the >HBM sizes the mesh targets.
            feature_dtype = (
                jnp.bfloat16
                if search_dtype == "bfloat16" and engine != "int8"
                else jnp.float32
            )
            vectors = build_pattern_dictionary(
                pats,
                bin_factor=bin_factor,
                batch_size=dict_batch_size,
                preprocess=dict_preprocess,
                as_numpy=pipeline_kw.get("mesh") is not None,
                dtype=feature_dtype,
            )
        self.bin_factor = bin_factor
        self.pipeline = IndexPipeline(
            model=None,
            params=None,
            dictionary_vectors=vectors,
            dictionary_orientations=dictionary_orientations,
            engine=engine,
            search_dtype=search_dtype,
            preprocess=preprocess,
            feature_fn=ncc_feature_fn(bin_factor),
            **pipeline_kw,
        )

    def __call__(self, patterns: np.ndarray) -> DenseIndexResult:
        return self.pipeline(patterns)

    @property
    def batch_size(self) -> int:
        return self.pipeline.batch_size


class StreamedPatternDI:
    """Pattern DI over dictionaries beyond device memory.

    The NCC feature rows live in HOST RAM or an ``np.memmap`` on disk and
    stream through the device in fixed chunks with a running top-k merge
    (`index.knn.cosine_topk_streamed`) — device residency is
    O(chunk x D), independent of N, so a single chip serves dictionaries
    the resident engine cannot hold (1M x 128² bf16 = 33 GB vs 16 GB
    HBM). Each query batch makes one full pass over the rows, so use a
    LARGE ``batch_size`` (1024+) to amortize the stream; below-HBM
    dictionaries should prefer `PatternDictionaryIndexer` (no
    re-transfer per batch). Multi-phase composes exactly like the resident
    engine (``dictionary_phases`` + ``phase_symmetries`` drive the same
    `consensus_orientations`, results bit-match it) — the beyond-HBM
    dictionaries this class exists for are the MOST likely to be
    multi-phase. Mesh sharding still composes at the resident engine
    instead (rows/n per chip).

    Args:
        dictionary_rows: ``(N, D)`` host feature rows from
            `build_pattern_dictionary(..., as_numpy=True)` (bf16 dtype
            halves RAM and link traffic), or any L2-normalized table.
        dictionary_orientations: ``(N, 3)`` zxz Euler degrees (host).
        bin_factor: must match the build's.
        chunk_rows: dictionary rows per device transfer.
        top_n / orientation_threshold / min_required_matches /
        max_iterations: consensus knobs (reference defaults).
        batch_size: static query compile batch.
        preprocess: optional jittable query correction (see
            `PatternDictionaryIndexer`).
        dictionary_phases: optional ``(N,)`` int phase id per row — the
            resident engine's multi-phase semantics (consensus counts only
            same-phase candidates; the result carries per-query phase).
        phase_symmetries: optional point-group name per phase id
            (defaults to cubic "432" each, like the resident engine).
        consensus_weight_power: optional similarity-power weighting of the
            consensus mean (resident-engine parity; see `IndexPipeline`).
    """

    def __init__(
        self,
        dictionary_rows: np.ndarray,
        dictionary_orientations: np.ndarray,
        bin_factor: int = 1,
        chunk_rows: int = 131072,
        top_n: int = 20,
        orientation_threshold: float = 3.0,
        min_required_matches: int = 18,
        max_iterations: int = 3,
        batch_size: int = 1024,
        preprocess: Any = None,
        dictionary_phases: np.ndarray | None = None,
        phase_symmetries: Any = None,
        consensus_weight_power: float | None = None,
    ) -> None:
        if dictionary_rows.ndim != 2:
            raise ValueError(
                "StreamedPatternDI takes precomputed (N, D) feature rows "
                "(build_pattern_dictionary(..., as_numpy=True)); got "
                f"shape {dictionary_rows.shape}"
            )
        self.rows = dictionary_rows
        self.orientations = np.asarray(dictionary_orientations, np.float32)
        if len(self.orientations) != len(self.rows):
            raise ValueError(
                f"{len(self.rows)} rows vs {len(self.orientations)} angles"
            )
        self.chunk_rows = chunk_rows
        self.batch_size = batch_size
        self.k = min(top_n, len(self.rows))
        sym_tables = None
        self.phases = None
        if dictionary_phases is not None:
            from latice_tpu.crystal import stack_symmetry_tables

            self.phases = np.asarray(dictionary_phases, np.int32)
            if self.phases.shape != (len(self.rows),):
                raise ValueError(
                    f"dictionary_phases must be ({len(self.rows)},), got "
                    f"{self.phases.shape}"
                )
            n_phases = int(self.phases.max()) + 1 if len(self.rows) else 1
            if phase_symmetries is None:
                phase_symmetries = ["432"] * n_phases
            if len(phase_symmetries) < n_phases:
                raise ValueError(
                    f"{n_phases} phase ids but only "
                    f"{len(phase_symmetries)} phase_symmetries entries"
                )
            sym_tables = stack_symmetry_tables(phase_symmetries)
        preprocess = _as_preprocess_fn(preprocess)
        feat = ncc_feature_fn(bin_factor)

        def _features(x):
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = x.astype(jnp.float32) / 255.0
            if preprocess is not None:
                x = preprocess(x)
            return feat(x)

        self._features = jax.jit(_features)

        from latice_tpu.crystal import from_euler_zxz_deg, to_euler_zxz_deg
        from latice_tpu.index.consensus import consensus_orientations

        multiphase = self.phases is not None

        def _consensus(cand_euler, cand_phases, scores):
            # Same quaternion conversion + consensus call the resident
            # engine makes (pipeline.py), so streamed results bit-match it.
            cand_quats = from_euler_zxz_deg(cand_euler)
            cand_weights = None
            if consensus_weight_power is not None:
                # (s / s_max)**p — the pipeline's underflow-safe powering.
                pos = jnp.maximum(scores.astype(jnp.float32), 0.0)
                topw = jnp.maximum(
                    jnp.max(pos, axis=-1, keepdims=True), jnp.float32(1e-30)
                )
                cand_weights = (pos / topw) ** consensus_weight_power
            cons = consensus_orientations(
                cand_quats,
                orientation_threshold,
                min_required_matches=min_required_matches,
                max_iterations=min(max_iterations, self.k),
                cand_phases=cand_phases if multiphase else None,
                sym_tables=sym_tables,
                cand_weights=cand_weights,
            )
            top1 = to_euler_zxz_deg(cand_quats[:, 0])
            best = jnp.where(cons.success[:, None], cons.mean_euler, top1)
            out = (
                cons.mean_euler,
                best,
                cons.success,
                cons.similar_mask.sum(axis=1),
            )
            if multiphase:
                # Failure fallback mirrors `best`: the top-1's phase.
                out = out + (
                    jnp.where(cons.success, cons.phase, cand_phases[:, 0]),
                )
            return out

        self._consensus = jax.jit(_consensus)

    def __call__(self, patterns: np.ndarray) -> DenseIndexResult:
        from latice_tpu.data.datamodule import padded_batches
        from latice_tpu.index.knn import cosine_topk_streamed

        x = np.asarray(patterns)
        if x.ndim == 3:
            x = x[..., None]
        multiphase = self.phases is not None
        if len(x) == 0:
            k = self.k
            return DenseIndexResult(
                mean_orientation=np.zeros((0, 3), np.float64),
                best_orientation=np.zeros((0, 3), np.float64),
                success=np.zeros((0,), bool),
                n_similar=np.zeros((0,), np.int64),
                indices=np.zeros((0, k), np.int64),
                scores=np.zeros((0, k), np.float64),
                phase=np.zeros((0,), np.int64) if multiphase else None,
            )
        parts = []
        for n, chunk in padded_batches(x, self.batch_size):
            feats = self._features(jnp.asarray(chunk))
            scores, indices = cosine_topk_streamed(
                feats, self.rows, self.k, chunk_rows=self.chunk_rows
            )
            idx_host = np.asarray(indices)
            # Candidate angles/phases gather on HOST (a (B, K) gather from
            # the (N, 3) table is the TPU slow-gather landmine; the table
            # may not even fit on device at streamed sizes).
            cand = self.orientations[idx_host.reshape(-1)].reshape(
                idx_host.shape + (3,)
            )
            cand_ph = (
                self.phases[idx_host]
                if multiphase
                else np.zeros(idx_host.shape, np.int32)
            )
            out = self._consensus(
                jnp.asarray(cand), jnp.asarray(cand_ph), scores
            )
            mean, best, success, n_sim = out[:4]
            phase_b = (
                np.asarray(out[4])[:n]
                if multiphase
                else np.zeros((n,), np.int64)
            )
            parts.append(
                (
                    n,
                    np.asarray(mean)[:n],
                    np.asarray(best)[:n],
                    np.asarray(success)[:n],
                    np.asarray(n_sim)[:n],
                    idx_host[:n],
                    np.asarray(scores)[:n],
                    phase_b,
                )
            )
        _, mean, best, success, n_sim, indices, scores, phase = (
            np.concatenate([p[i] for p in parts]) if i else None
            for i in range(8)
        )
        mean = np.where(success[:, None], mean, np.nan).astype(np.float64)
        return DenseIndexResult(
            mean_orientation=mean,
            best_orientation=best.astype(np.float64),
            success=success.astype(bool),
            n_similar=n_sim.astype(np.int64),
            indices=indices.astype(np.int64),
            scores=scores.astype(np.float64),
            phase=phase.astype(np.int64) if multiphase else None,
        )
