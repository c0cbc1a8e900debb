"""Multi-phase dictionary indexing (BASELINE config 5).

The reference is single-phase cubic; these pin the multi-phase extension:
candidates of a different phase never count toward consensus, the result
reports the chosen phase, and the symmetry snap uses the chosen phase's
point group.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.crystal import (
    from_euler_zxz_deg,
    quat_mul,
    stack_symmetry_tables,
    symmetry_quats,
)
from latice_tpu.index import IndexPipeline
from latice_tpu.index.consensus import consensus_orientations
from latice_tpu.models import VariationalAutoEncoderRawData


def _cluster_quats(base_euler, n, spread=0.1, seed=0):
    rng = np.random.default_rng(seed)
    eulers = np.asarray(base_euler) + rng.uniform(-spread, spread, size=(n, 3))
    return from_euler_zxz_deg(jnp.asarray(eulers, jnp.float32))


class TestMultiphaseConsensus:
    def test_cross_phase_candidates_excluded(self):
        """8 same-orientation candidates, 4 per phase: single-phase consensus
        sees 8 matches; phase-aware consensus sees only the reference's 4."""
        quats = _cluster_quats([40.0, 60.0, 20.0], 8)[None]  # (1, 8, 4)
        phases = jnp.asarray([[0, 1, 0, 1, 0, 1, 0, 1]], jnp.int32)

        plain = consensus_orientations(quats, 3.0, min_required_matches=5)
        assert bool(plain.success[0])

        masked = consensus_orientations(
            quats, 3.0, min_required_matches=5, cand_phases=phases
        )
        assert not bool(masked.success[0])

        ok = consensus_orientations(
            quats, 3.0, min_required_matches=4, cand_phases=phases
        )
        assert bool(ok.success[0])
        assert int(ok.phase[0]) == 0  # top-1 candidate's phase
        np.testing.assert_array_equal(
            np.asarray(ok.similar_mask[0]), [1, 0, 1, 0, 1, 0, 1, 0]
        )

    def test_second_iteration_switches_phase(self):
        """If the top-1's phase musters too few matches, the reference walk
        moves to candidate 2 — and the reported phase follows it."""
        a = _cluster_quats([40.0, 60.0, 20.0], 2, seed=1)
        b = _cluster_quats([200.0, 80.0, 110.0], 6, seed=2)
        quats = jnp.concatenate([a[:1], b[:1], a[1:], b[1:]], axis=0)[None]
        phases = jnp.asarray([[0, 1, 0, 1, 1, 1, 1, 1]], jnp.int32)

        out = consensus_orientations(
            quats, 3.0, min_required_matches=5, max_iterations=3,
            cand_phases=phases,
        )
        assert bool(out.success[0])
        assert int(out.chosen_iter[0]) == 1
        assert int(out.phase[0]) == 1

    def test_snap_uses_chosen_phase_group(self):
        """A hexagonal-phase consensus must average a 60-deg-about-c displaced
        candidate back onto the cluster; a cubic table cannot (60 deg about z
        is not a cubic operator)."""
        base = [40.0, 60.0, 20.0]
        cluster = _cluster_quats(base, 4, spread=0.01, seed=3)  # (4, 4)
        hex_op = symmetry_quats("6")[1].astype(cluster.dtype)  # 60 deg about z
        displaced = quat_mul(hex_op, cluster[3])
        quats = jnp.concatenate([cluster[:3], displaced[None]], axis=0)[None]
        phases = jnp.zeros((1, 4), jnp.int32)

        # The displaced candidate is ~60 deg away raw, so it fails the
        # threshold gate either way; widen the threshold so it participates.
        tables_hex = stack_symmetry_tables(["622"])
        out_hex = consensus_orientations(
            quats, 70.0, min_required_matches=4,
            cand_phases=phases, sym_tables=tables_hex,
        )
        assert bool(out_hex.success[0])
        mean_q = from_euler_zxz_deg(out_hex.mean_euler[0])
        ref_q = from_euler_zxz_deg(jnp.asarray(base, jnp.float32))
        from latice_tpu.crystal import misorientation_deg

        assert float(misorientation_deg(mean_q, ref_q)) < 0.2

        tables_cubic = stack_symmetry_tables(["432"])
        out_cubic = consensus_orientations(
            quats, 70.0, min_required_matches=4,
            cand_phases=phases, sym_tables=tables_cubic,
        )
        mean_cubic = from_euler_zxz_deg(out_cubic.mean_euler[0])
        # Cubic snapping cannot absorb the 60-deg hexagonal image: the mean
        # is dragged well off the cluster center.
        assert float(misorientation_deg(mean_cubic, ref_q)) > 5.0


@pytest.fixture(scope="module")
def two_phase_setup():
    """Tiny model + two-phase dictionary of clustered patterns."""
    rng = np.random.default_rng(7)
    model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=16)
    params = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 128, 128, 1)), jax.random.key(1)
    )["params"]
    patterns, angles, phases = [], [], []
    for g in range(8):
        base = rng.uniform(size=(128, 128))
        base_angle = rng.uniform([0, 20, 0], [340, 140, 340])
        for _ in range(5):
            patterns.append(base + rng.normal(size=(128, 128)) * 0.01)
            angles.append(base_angle + rng.uniform(-0.2, 0.2, 3))
            phases.append(g % 2)
    enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode")[0])
    patterns = np.asarray(patterns, np.float32)
    latents = np.asarray(enc(params, jnp.asarray(patterns[..., None])))
    vecs = latents / np.linalg.norm(latents, axis=1, keepdims=True)
    return model, params, patterns, np.asarray(angles), np.asarray(phases), vecs


class TestMultiphasePipeline:
    def test_phase_reported_per_query(self, two_phase_setup):
        model, params, patterns, angles, phases, vecs = two_phase_setup
        pipe = IndexPipeline(
            model, params, vecs, angles,
            top_n=5, orientation_threshold=3.0, min_required_matches=3,
            batch_size=16, dictionary_phases=phases,
            phase_symmetries=["432", "622"],
        )
        out = pipe(patterns)
        assert out.phase is not None and out.phase.shape == (len(patterns),)
        assert out.success.all()
        # Self-queries resolve to their own cluster's phase.
        np.testing.assert_array_equal(out.phase, phases)

    def test_mesh_sharded_pipeline_reports_phases(self, two_phase_setup):
        """Phases survive the mesh path: the dictionary shards over devices,
        the (replicated) phase-packed quaternion table is gathered with the
        merged global indices."""
        from latice_tpu.parallel import make_mesh

        model, params, patterns, angles, phases, vecs = two_phase_setup
        mesh = make_mesh(8)
        pipe = IndexPipeline(
            model, params, vecs, angles,
            top_n=5, orientation_threshold=3.0, min_required_matches=3,
            batch_size=16, mesh=mesh,
            dictionary_phases=phases, phase_symmetries=["432", "622"],
        )
        out = pipe(patterns)
        assert out.success.all()
        np.testing.assert_array_equal(out.phase, phases)

    def test_single_phase_result_has_no_phase(self, two_phase_setup):
        model, params, patterns, angles, phases, vecs = two_phase_setup
        pipe = IndexPipeline(
            model, params, vecs, angles,
            top_n=5, orientation_threshold=3.0, min_required_matches=3,
            batch_size=16,
        )
        out = pipe(patterns[:8])
        assert out.phase is None

    def test_matches_single_phase_when_all_same(self, two_phase_setup):
        """An all-zeros phase vector must reproduce the single-phase result."""
        model, params, patterns, angles, phases, vecs = two_phase_setup
        kw = dict(top_n=5, orientation_threshold=3.0, min_required_matches=3,
                  batch_size=16)
        plain = IndexPipeline(model, params, vecs, angles, **kw)
        zeroph = IndexPipeline(
            model, params, vecs, angles,
            dictionary_phases=np.zeros(len(vecs), np.int32), **kw
        )
        a, b = plain(patterns), zeroph(patterns)
        np.testing.assert_array_equal(a.success, b.success)
        np.testing.assert_array_equal(a.indices, b.indices)
        ok = a.success
        np.testing.assert_allclose(
            a.mean_orientation[ok], b.mean_orientation[ok], atol=1e-4
        )
        assert (b.phase == 0).all()

    def test_phase_validation(self, two_phase_setup):
        model, params, patterns, angles, phases, vecs = two_phase_setup
        with pytest.raises(ValueError, match="dictionary_phases"):
            IndexPipeline(model, params, vecs, angles,
                          dictionary_phases=phases[:3])
        with pytest.raises(ValueError, match="phase_symmetries"):
            IndexPipeline(model, params, vecs, angles,
                          dictionary_phases=phases, phase_symmetries=["432"])


class TestMultiphaseDatabase:
    def _db(self, tmp_path, **cfg):
        from latice_tpu.index import LatentVectorDatabaseConfig, TpuLatentVectorDatabase

        return TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path=str(tmp_path / "mp.npz"), **cfg)
        )

    def test_add_query_save_load_roundtrip(self, two_phase_setup, tmp_path):
        _, _, _, angles, phases, vecs = two_phase_setup
        db = self._db(tmp_path, phase_symmetries=["432", "622"])
        db.add_vectors(vecs, angles, phases=phases)

        res = db.find_best_orientation(
            vecs[0], top_n=5, orientation_threshold=3.0, min_required_matches=3
        )
        assert res.success and res.phase == int(phases[0])

        dense = db.find_best_orientations_dense(
            vecs[:10], top_n=5, orientation_threshold=3.0, min_required_matches=3
        )
        assert "phase" in dense
        np.testing.assert_array_equal(dense["phase"], phases[:10])

        db.save()
        db2 = self._db(tmp_path, phase_symmetries=["432", "622"])
        np.testing.assert_array_equal(db2._phases, phases)
        res2 = db2.find_best_orientation(
            vecs[7], top_n=5, orientation_threshold=3.0, min_required_matches=3
        )
        assert res2.phase == int(phases[7])

        db2.delete_persistence()
        assert db2.get_count() == 0 and not db2._has_phases

    def test_single_phase_results_keep_none(self, two_phase_setup, tmp_path):
        """A DB never given phases reports phase=None and omits the dense key
        — the reference-compatible surface is unchanged."""
        _, _, _, angles, phases, vecs = two_phase_setup
        db = self._db(tmp_path)
        db.add_vectors(vecs, angles)
        res = db.find_best_orientation(
            vecs[0], top_n=5, orientation_threshold=3.0, min_required_matches=3
        )
        assert res.phase is None
        dense = db.find_best_orientations_dense(
            vecs[:4], top_n=5, orientation_threshold=3.0, min_required_matches=3
        )
        assert "phase" not in dense

    def test_phase_length_mismatch_raises(self, two_phase_setup, tmp_path):
        _, _, _, angles, phases, vecs = two_phase_setup
        db = self._db(tmp_path)
        with pytest.raises(ValueError, match="phases"):
            db.add_vectors(vecs, angles, phases=phases[:5])

    def test_missing_symmetry_entry_raises(self, two_phase_setup, tmp_path):
        _, _, _, angles, phases, vecs = two_phase_setup
        db = self._db(tmp_path, phase_symmetries=["432"])  # 2 phases present
        db.add_vectors(vecs, angles, phases=phases)
        with pytest.raises(ValueError, match="phase_symmetries"):
            db.find_best_orientation(vecs[0], top_n=5)


class TestMultiphaseEngineMatrix:
    """Phases ride the host-side index gather, so every top-k engine must
    report them identically."""

    @pytest.mark.parametrize("engine", ["device", "approx", "int8", "native"])
    def test_phase_reported_across_engines(self, two_phase_setup, tmp_path, engine):
        from latice_tpu.index import LatentVectorDatabaseConfig, TpuLatentVectorDatabase

        if engine == "native":
            from latice_tpu import native

            if not native.available():
                pytest.skip("native engine unavailable")

        _, _, _, angles, phases, vecs = two_phase_setup
        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(
                npz_path=str(tmp_path / f"{engine}.npz"),
                engine=engine,
                phase_symmetries=["432", "622"],
            )
        )
        db.add_vectors(vecs, angles, phases=phases)
        dense = db.find_best_orientations_dense(
            vecs[:12], top_n=5, orientation_threshold=3.0, min_required_matches=3
        )
        np.testing.assert_array_equal(dense["phase"], phases[:12], err_msg=engine)


class TestIndexerMultiphaseBuild:
    def test_build_multiphase_dictionary(self, two_phase_setup, tmp_path):
        """One (patterns, angles) source pair per phase; list position is the
        phase id; self-queries resolve to the right phase."""
        from latice_tpu.index import DiffractionPatternIndexer, IndexerConfig
        from latice_tpu.index import LatentVectorDatabaseConfig, TpuLatentVectorDatabase

        model, params, patterns, angles, phases, vecs = two_phase_setup
        sources = []
        for pid in (0, 1):
            sel = phases == pid
            ppath = tmp_path / f"p{pid}.npy"
            apath = tmp_path / f"a{pid}.txt"
            np.save(ppath, patterns[sel])
            n = int(sel.sum())
            apath.write_text(
                "eu\n%d\n" % n
                + "".join(f"{a[0]} {a[1]} {a[2]}\n" for a in angles[sel])
            )
            sources.append((ppath, apath))

        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(
                npz_path=str(tmp_path / "mp2.npz"),
                phase_symmetries=["432", "622"],
            )
        )
        indexer = DiffractionPatternIndexer(
            model, params, db=db, config=IndexerConfig(batch_size=16)
        )
        indexer.build_multiphase_dictionary(sources, progress=False)
        assert db.get_count() == len(patterns)
        np.testing.assert_array_equal(
            db._phases,
            np.concatenate(
                [np.zeros(int((phases == 0).sum()), np.int32),
                 np.ones(int((phases == 1).sum()), np.int32)]
            ),
        )

        res = indexer.index_pattern(
            patterns[np.argmax(phases == 1)], top_n=5, orientation_threshold=3.0
        )
        assert res.phase == 1
