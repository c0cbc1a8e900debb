"""Pattern-space dictionary indexing (index.pattern_di): NCC features,
engine/mesh composition, and the IndexPipeline feature_fn hook."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.index import (
    IndexPipeline,
    PatternDictionaryIndexer,
    build_pattern_dictionary,
    ncc_feature_fn,
)

H = W = 32


@pytest.fixture(scope="module")
def setup():
    """10 clusters x 5 near-duplicate patterns with clustered angles, so NCC
    retrieval + consensus genuinely succeeds (same shape as the pipeline
    equivalence fixtures)."""
    rng = np.random.default_rng(7)
    patterns, angles = [], []
    for _ in range(10):
        base = rng.uniform(size=(H, W))
        base_angle = rng.uniform([0, 20, 0], [340, 140, 340])
        for _ in range(5):
            patterns.append(base + rng.normal(size=(H, W)) * 0.01)
            angles.append(base_angle + rng.uniform(-0.3, 0.3, 3))
    return np.asarray(patterns, np.float32), np.asarray(angles)


class TestNccFeatures:
    def test_rows_are_zero_mean_unit_norm(self, setup):
        patterns, _ = setup
        feats = np.asarray(ncc_feature_fn()(jnp.asarray(patterns[..., None])))
        assert feats.shape == (50, H * W)
        np.testing.assert_allclose(feats.mean(axis=1), 0.0, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(feats, axis=1), 1.0, atol=1e-5
        )

    def test_affine_intensity_invariance(self, setup):
        """NCC features must not change under per-pattern gain/offset — the
        property that lets uint8 frames skip /255 entirely."""
        patterns, _ = setup
        fn = ncc_feature_fn()
        a = np.asarray(fn(jnp.asarray(patterns[..., None])))
        scaled = patterns * 37.5 + 11.0
        b = np.asarray(fn(jnp.asarray(scaled[..., None])))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_binning_shape_and_divisibility(self, setup):
        patterns, _ = setup
        feats = ncc_feature_fn(2)(jnp.asarray(patterns[..., None]))
        assert feats.shape == (50, H * W // 4)
        with pytest.raises(ValueError, match="does not divide"):
            ncc_feature_fn(5)(jnp.asarray(patterns[..., None]))

    def test_build_matches_direct(self, setup):
        patterns, _ = setup
        rows = build_pattern_dictionary(patterns, batch_size=16)
        direct = np.asarray(ncc_feature_fn()(jnp.asarray(patterns[..., None])))
        np.testing.assert_allclose(rows, direct, atol=1e-6)


class TestPatternDI:
    def test_self_query_succeeds(self, setup):
        patterns, angles = setup
        di = PatternDictionaryIndexer(
            patterns, angles,
            top_n=5, min_required_matches=4, batch_size=25,
        )
        out = di(patterns)
        assert out.success.all()
        # Top-1 NCC of a dictionary member is itself.
        np.testing.assert_array_equal(out.indices[:, 0], np.arange(50))
        # mean_orientation is canonicalized to scipy ranges; compare with
        # 360-wrap on the z axes.
        d = (out.mean_orientation - angles + 180.0) % 360.0 - 180.0
        assert np.abs(d).max() < 1.0  # cluster spread is +-0.3 deg
        assert out.scores.max() <= 1.0 + 1e-3

    def test_uint8_equals_float(self, setup):
        """uint8 frames ride the device /255 path; NCC's affine invariance
        makes the scores identical to the f32 stack's."""
        patterns, angles = setup
        u8 = (patterns * 255).astype(np.uint8)
        f32 = u8.astype(np.float32) / 255.0
        di = PatternDictionaryIndexer(
            f32, angles, top_n=5, min_required_matches=4, batch_size=25,
            search_dtype="float32",
        )
        a, b = di(u8), di(f32)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-6)

    def test_precomputed_rows_equal_raw_stack(self, setup):
        patterns, angles = setup
        rows = build_pattern_dictionary(patterns)
        kw = dict(top_n=5, min_required_matches=4, batch_size=25)
        a = PatternDictionaryIndexer(patterns, angles, **kw)(patterns)
        b = PatternDictionaryIndexer(rows, angles, **kw)(patterns)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_allclose(a.scores, b.scores, atol=1e-5)

    def test_binned_di_still_indexes(self, setup):
        patterns, angles = setup
        di = PatternDictionaryIndexer(
            patterns, angles, bin_factor=2,
            top_n=5, min_required_matches=4, batch_size=25,
        )
        out = di(patterns)
        assert out.success.all()
        np.testing.assert_array_equal(out.indices[:, 0], np.arange(50))

    def test_int8_engine_recall(self, setup):
        patterns, angles = setup
        kw = dict(top_n=5, min_required_matches=4, batch_size=25)
        exact = PatternDictionaryIndexer(
            patterns, angles, search_dtype="float32", **kw
        )(patterns)
        q = PatternDictionaryIndexer(patterns, angles, engine="int8", **kw)(
            patterns
        )
        hits = np.mean([
            len(set(q.indices[i]) & set(exact.indices[i])) / 5.0
            for i in range(len(patterns))
        ])
        assert hits >= 0.9

    def test_bf16_vs_f32_top1_agrees(self, setup):
        patterns, angles = setup
        kw = dict(top_n=5, min_required_matches=4, batch_size=25)
        a = PatternDictionaryIndexer(
            patterns, angles, search_dtype="bfloat16", **kw
        )(patterns)
        b = PatternDictionaryIndexer(
            patterns, angles, search_dtype="float32", **kw
        )(patterns)
        # Self-match at NCC=1 is far above bf16 rounding.
        np.testing.assert_array_equal(a.indices[:, 0], b.indices[:, 0])

    def test_fused_engine_rejected(self, setup):
        patterns, angles = setup
        with pytest.raises(ValueError, match="fused"):
            PatternDictionaryIndexer(patterns, angles, engine="fused")

    def test_mesh_composition_matches_single_device(self, setup):
        from jax.sharding import Mesh

        patterns, angles = setup
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        kw = dict(
            top_n=5, min_required_matches=4, batch_size=24,
            search_dtype="float32",
        )
        single = PatternDictionaryIndexer(patterns, angles, **kw)(patterns)
        sharded = PatternDictionaryIndexer(patterns, angles, mesh=mesh, **kw)(
            patterns
        )
        np.testing.assert_array_equal(single.indices, sharded.indices)
        np.testing.assert_allclose(
            single.mean_orientation, sharded.mean_orientation, atol=1e-4
        )

    def test_preprocess_applies_to_queries_only(self, setup):
        """The standard DI setup: clean simulated dictionary, raw detector
        queries — `preprocess` corrects the queries toward the dictionary's
        ideal space and must NOT touch the dictionary."""
        patterns, angles = setup
        hot = patterns.copy()
        hot[:, 0, 0] = 1000.0  # hot pixel on every experimental frame

        def zap(x):
            return x.at[:, 0, 0, :].set(x[:, 1, 1, :])

        di = PatternDictionaryIndexer(
            patterns, angles, preprocess=zap,
            top_n=5, min_required_matches=4, batch_size=25,
        )
        out = di(hot)
        assert out.success.all()
        # With the hot pixel zapped, the query's nearest dictionary pattern
        # is its own clean original.
        np.testing.assert_array_equal(out.indices[:, 0], np.arange(50))

    def test_dict_preprocess_corrects_raw_dictionaries(self, setup):
        """dict_preprocess applies the same correction when the dictionary
        stack is itself raw detector data."""
        patterns, angles = setup
        hot = patterns.copy()
        hot[:, 0, 0] = 1000.0

        def zap(x):
            return x.at[:, 0, 0, :].set(x[:, 1, 1, :])

        di = PatternDictionaryIndexer(
            hot, angles, preprocess=zap, dict_preprocess=zap,
            top_n=5, min_required_matches=4, batch_size=25,
        )
        out = di(hot)
        assert out.success.all()
        np.testing.assert_array_equal(out.indices[:, 0], np.arange(50))


class TestFeatureFnHook:
    def test_model_and_feature_fn_mutually_exclusive(self, setup):
        patterns, angles = setup
        rows = build_pattern_dictionary(patterns)
        with pytest.raises(ValueError, match="mutually exclusive"):
            IndexPipeline(
                object(), None, rows, angles, feature_fn=ncc_feature_fn()
            )
        with pytest.raises(ValueError, match="model or a feature_fn"):
            IndexPipeline(None, None, rows, angles)

    def test_bad_search_dtype(self, setup):
        patterns, angles = setup
        rows = build_pattern_dictionary(patterns)
        with pytest.raises(ValueError, match="search_dtype"):
            IndexPipeline(
                None, None, rows, angles,
                feature_fn=ncc_feature_fn(), search_dtype="float16",
            )


class TestStreamedDI:
    """>HBM path: host-resident dictionary rows streamed in chunks with a
    running top-k merge must be EXACT."""

    def test_streamed_topk_matches_resident(self, setup):
        from latice_tpu.index import cosine_topk, cosine_topk_streamed

        patterns, _ = setup
        rows = build_pattern_dictionary(patterns)  # (50, D) f32 host
        q = rows[::7]
        s_ref, i_ref = cosine_topk(jnp.asarray(q), jnp.asarray(rows), 5)
        # Chunk size that does NOT divide N: the padded tail must mask.
        s_st, i_st = cosine_topk_streamed(q, rows, 5, chunk_rows=13)
        np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_st))
        np.testing.assert_allclose(
            np.asarray(s_ref), np.asarray(s_st), atol=1e-6
        )

    def test_streamed_topk_bf16_rows(self, setup):
        from latice_tpu.index import cosine_topk_streamed

        patterns, _ = setup
        rows16 = build_pattern_dictionary(patterns, dtype=jnp.bfloat16)
        assert rows16.dtype == jnp.bfloat16  # ml_dtypes on host
        s, i = cosine_topk_streamed(
            np.asarray(rows16[:8], np.float32), rows16, 3, chunk_rows=16
        )
        # Self-match survives bf16 rounding by a wide margin.
        np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(8))

    def test_streamed_memmap_dictionary(self, setup, tmp_path):
        """np.memmap rows: the dictionary never fully materializes in RAM."""
        from latice_tpu.index import cosine_topk_streamed

        patterns, _ = setup
        rows = build_pattern_dictionary(patterns)
        path = tmp_path / "rows.dat"
        mm = np.memmap(path, np.float32, "w+", shape=rows.shape)
        mm[:] = rows
        mm.flush()
        ro = np.memmap(path, np.float32, "r", shape=rows.shape)
        s, i = cosine_topk_streamed(rows[:4], ro, 3, chunk_rows=17)
        np.testing.assert_array_equal(np.asarray(i)[:, 0], np.arange(4))

    def test_streamed_di_matches_resident_indexer(self, setup):
        from latice_tpu.index import StreamedPatternDI

        patterns, angles = setup
        rows = build_pattern_dictionary(patterns)
        resident = PatternDictionaryIndexer(
            patterns, angles, search_dtype="float32",
            top_n=5, min_required_matches=4, batch_size=25,
        )(patterns)
        streamed = StreamedPatternDI(
            rows, angles, chunk_rows=13,
            top_n=5, min_required_matches=4, batch_size=25,
        )(patterns)
        np.testing.assert_array_equal(resident.indices, streamed.indices)
        np.testing.assert_array_equal(resident.success, streamed.success)
        np.testing.assert_allclose(
            resident.mean_orientation, streamed.mean_orientation, atol=1e-3
        )
        np.testing.assert_allclose(
            resident.scores, streamed.scores, atol=1e-5
        )

    def test_streamed_di_rejects_raw_stacks(self, setup):
        from latice_tpu.index import StreamedPatternDI

        patterns, angles = setup
        with pytest.raises(ValueError, match="feature rows"):
            StreamedPatternDI(patterns, angles)


class TestReviewFixesR3d:
    """Regressions from the round-3 session review of the DI/streamed work."""

    def test_streamed_step_compiles_once_across_calls(self, setup):
        """The merge step is module-level jitted: repeated streamed searches
        (one per query batch) must reuse ONE compiled program."""
        from latice_tpu.index import cosine_topk_streamed
        from latice_tpu.index.knn import _streamed_topk_step

        patterns, _ = setup
        rows = build_pattern_dictionary(patterns)
        before = _streamed_topk_step._cache_size()
        cosine_topk_streamed(rows[:4], rows, 3, chunk_rows=16)
        after_first = _streamed_topk_step._cache_size()
        cosine_topk_streamed(rows[4:8], rows, 3, chunk_rows=16)
        cosine_topk_streamed(rows[8:12], rows, 3, chunk_rows=16)
        assert _streamed_topk_step._cache_size() == after_first
        assert after_first - before <= 1

    def test_uint8_dict_preprocess_in_model_units(self):
        """The dictionary build must apply /255 BEFORE the correction, like
        the query side does — a scale-sensitive correction (clip at 0.5)
        would otherwise see 0-255 data and flatten everything."""
        rng = np.random.default_rng(3)
        u8 = rng.integers(0, 255, size=(6, 16, 16), dtype=np.uint8)

        def clip_half(x):
            return jnp.minimum(x, 0.5)

        rows = build_pattern_dictionary(u8, preprocess=clip_half)
        expect = np.asarray(
            ncc_feature_fn()(
                clip_half(jnp.asarray(u8[..., None], jnp.float32) / 255.0)
            )
        )
        np.testing.assert_allclose(rows, expect, atol=1e-6)

    def test_preprocess_config_accepted(self, setup):
        from latice_tpu.data import PreprocessConfig

        patterns, angles = setup
        cfg = PreprocessConfig(clip_sigma=4.0)
        rows = build_pattern_dictionary(patterns, preprocess=cfg)
        assert rows.shape == (50, H * W)
        di = PatternDictionaryIndexer(
            patterns, angles, preprocess=cfg, dict_preprocess=cfg,
            top_n=5, min_required_matches=4, batch_size=25,
        )
        out = di(patterns)
        np.testing.assert_array_equal(out.indices[:, 0], np.arange(50))

    def test_mesh_di_places_from_host(self, setup):
        """Under a mesh the feature table must shard from HOST — no
        single-device commit of the full table (the >HBM case)."""
        from jax.sharding import Mesh

        patterns, angles = setup
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        di = PatternDictionaryIndexer(
            patterns, angles, mesh=mesh, batch_size=24,
            top_n=5, min_required_matches=4,
        )
        dd = di.pipeline._dict_dev
        assert len(dd.sharding.device_set) == 8
        out = di(patterns)
        np.testing.assert_array_equal(out.indices[:, 0], np.arange(50))

    def test_mesh_int8_host_table(self, setup):
        """Host np tables quantize on host and shard per-device (int8 x
        mesh composition for >HBM tables)."""
        from jax.sharding import Mesh

        from latice_tpu.index.knn import quantize_dictionary_int8

        patterns, angles = setup
        rows = build_pattern_dictionary(patterns)
        q, scale = quantize_dictionary_int8(rows)
        assert isinstance(q, np.ndarray) and q.dtype == np.int8
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
        di = PatternDictionaryIndexer(
            rows, angles, engine="int8", mesh=mesh, batch_size=24,
            top_n=5, min_required_matches=4,
        )
        assert di.pipeline._dict_dev.dtype == jnp.int8
        out = di(patterns)
        # int8 rounding can tie near-duplicate cluster members, so pin the
        # CLUSTER (5 members each), not the exact row.
        np.testing.assert_array_equal(
            out.indices[:, 0] // 5, np.arange(50) // 5
        )

    def test_streamed_di_empty_input(self, setup):
        from latice_tpu.index import StreamedPatternDI

        patterns, angles = setup
        rows = build_pattern_dictionary(patterns)
        di = StreamedPatternDI(rows, angles, top_n=5, batch_size=8)
        out = di(np.zeros((0, H, W), np.float32))
        assert out.indices.shape == (0, 5)
        assert out.success.shape == (0,)


class TestStreamedMultiPhase:
    """Verdict r3 item 4: multi-phase + diagnostics on the streamed path —
    results must bit-match the resident engine on a two-phase dictionary,
    and `candidate_ambiguity` must consume the streamed result."""

    @pytest.fixture(scope="class")
    def two_phase(self, setup):
        patterns, angles = setup
        phases = (np.arange(len(patterns)) // 25).astype(np.int32)  # 0/1
        kw = dict(
            top_n=5, min_required_matches=4, batch_size=25,
            dictionary_phases=phases, phase_symmetries=["432", "622"],
        )
        resident = PatternDictionaryIndexer(
            patterns, angles, search_dtype="float32", **kw
        )(patterns)
        from latice_tpu.index import StreamedPatternDI

        rows = build_pattern_dictionary(patterns)
        streamed = StreamedPatternDI(
            rows, angles, chunk_rows=13, **kw
        )(patterns)
        return patterns, angles, phases, resident, streamed

    def test_streamed_bit_matches_resident(self, two_phase):
        _, _, phases, resident, streamed = two_phase
        np.testing.assert_array_equal(resident.indices, streamed.indices)
        np.testing.assert_array_equal(resident.success, streamed.success)
        np.testing.assert_array_equal(resident.phase, streamed.phase)
        np.testing.assert_allclose(
            resident.mean_orientation, streamed.mean_orientation, atol=1e-3
        )
        # Self-queries land in their own phase.
        np.testing.assert_array_equal(streamed.phase, phases)

    def test_streamed_weight_power_matches_resident(self, setup):
        from latice_tpu.index import StreamedPatternDI

        patterns, angles = setup
        kw = dict(
            top_n=5, min_required_matches=4, batch_size=25,
            consensus_weight_power=4.0,
        )
        resident = PatternDictionaryIndexer(
            patterns, angles, search_dtype="float32", **kw
        )(patterns)
        streamed = StreamedPatternDI(
            rows := build_pattern_dictionary(patterns), angles,
            chunk_rows=17, **kw,
        )(patterns)
        np.testing.assert_allclose(
            resident.mean_orientation, streamed.mean_orientation, atol=1e-3
        )

    def test_ambiguity_on_streamed_result(self, two_phase):
        from latice_tpu.index import candidate_ambiguity

        _, angles, phases, _, streamed = two_phase
        amb = candidate_ambiguity(
            streamed, angles,
            phase_groups=["432", "622"], dictionary_phases=phases,
        )
        assert amb.angle_deg.shape == (50,)
        assert amb.has_rival.dtype == bool
        assert np.isfinite(amb.score_gap[amb.has_rival]).all()

    def test_phase_validation(self, setup):
        from latice_tpu.index import StreamedPatternDI

        patterns, angles = setup
        rows = build_pattern_dictionary(patterns)
        with pytest.raises(ValueError, match="dictionary_phases"):
            StreamedPatternDI(
                rows, angles, dictionary_phases=np.zeros(3, np.int32)
            )
        with pytest.raises(ValueError, match="phase_symmetries"):
            StreamedPatternDI(
                rows, angles,
                dictionary_phases=(np.arange(len(rows)) % 3).astype(np.int32),
                phase_symmetries=["432"],
            )
