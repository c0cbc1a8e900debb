"""Spherical-harmonic indexing (index.spherical): end-to-end orientation
recovery against rendered ground truth, noise/uint8 robustness, parabolic
sub-grid refinement, Friedel degree pruning, and input validation.

The reference has no dictionary-free indexing plane at all (every query
goes through its vector DBs, reference dp_indexer.py:51); accuracy is
therefore pinned against this repo's own rendering ground truth."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from latice_tpu.crystal.symmetry import (
    ROTATION_GROUPS,
    symmetry_reduced_misorientation,
)
from latice_tpu.index.spherical import (
    MultiPhaseSphericalIndexer,
    SphericalIndexer,
    SphericalIndexerConfig,
    master_sph_coefficients,
)
from latice_tpu.sim import (
    DetectorGeometry,
    hexagonal_reflectors,
    make_kinematical_master,
    render_from_master,
)


def _err_deg(q_true, q_est, group="432"):
    sym = jnp.asarray(np.asarray(ROTATION_GROUPS[group], np.float32))
    return np.degrees(
        np.asarray(
            symmetry_reduced_misorientation(
                jnp.asarray(q_true, jnp.float32),
                jnp.asarray(q_est, jnp.float32),
                sym,
            )
        )
    )


@pytest.fixture(scope="module")
def cubic_setup():
    rng = np.random.default_rng(0)
    master = make_kinematical_master(size=513)
    geom = DetectorGeometry(shape=(128, 128))
    q_true = np.roll(R.random(12, rng).as_quat(), 1, axis=1)
    patterns = render_from_master(master, q_true, geom)
    indexer = SphericalIndexer(
        master, geom, SphericalIndexerConfig(bandwidth=32, chunk=8)
    )
    return master, geom, q_true, patterns, indexer


class TestAmbiguity:
    """Secondary-SO(3)-peak pseudo-symmetry diagnostic
    (`SphericalIndexer.ambiguity` — the EMSphInx secondary-peak report,
    sharing `index.diagnostics.AmbiguityResult`'s vocabulary)."""

    def test_clean_patterns_have_clear_margins(self, cubic_setup):
        _, _, q_true, patterns, indexer = cubic_setup
        amb = indexer.ambiguity(patterns, n_cells=64)
        # Rendered patterns: rival basins exist in the top cells (the
        # volume covers all of SO(3)) beyond the own-basin covering
        # radius (default 2·180/L = 11.25 deg at L=32), with positive
        # score margins (cells are score-sorted, the winner is the
        # global argmax).
        assert amb.has_rival.mean() > 0.7
        assert (amb.angle_deg[amb.has_rival] > 11.25).all()
        assert (amb.score_gap[amb.has_rival] >= 0).all()
        assert amb.ambiguous(max_gap=1e-6).mean() < 0.5

    def test_noise_shrinks_the_margin(self, cubic_setup):
        # Pure-noise patterns have no true basin: the gap between the
        # "winner" and its best rival collapses relative to rendered
        # patterns — the diagnostic's whole point.
        _, geom, _, patterns, indexer = cubic_setup
        rng = np.random.default_rng(7)
        noise = rng.uniform(size=patterns.shape).astype(np.float32)
        amb_clean = indexer.ambiguity(patterns, n_cells=64)
        amb_noise = indexer.ambiguity(noise, n_cells=64)
        assert (
            np.nanmedian(amb_noise.score_gap)
            < 0.5 * np.nanmedian(amb_clean.score_gap)
        )

    def test_winner_matches_index_patterns(self, cubic_setup):
        # Cell 0 of the diagnostic is the same grid winner the indexing
        # path refines: its gap must be consistent with the returned
        # grid-mode score ordering (structural sanity, exercised via the
        # padded-tail path too: 12 patterns / chunk 8).
        _, _, _, patterns, indexer = cubic_setup
        amb = indexer.ambiguity(patterns[:3], n_cells=8)
        assert amb.angle_deg.shape == (3,)
        assert np.isfinite(amb.score_gap[amb.has_rival]).all()

    def test_n_cells_validation(self, cubic_setup):
        _, _, _, patterns, indexer = cubic_setup
        with pytest.raises(ValueError, match="n_cells"):
            indexer.ambiguity(patterns, n_cells=1)


class TestAccuracy:
    def test_recovers_orientations_subgrid(self, cubic_setup):
        # Bandwidth 32 = 5.6 deg grid; the parabolic peak interpolation
        # must land well below it (measured ~0.66 deg median).
        _, _, q_true, patterns, indexer = cubic_setup
        res = indexer.index_patterns(patterns)
        err = _err_deg(q_true, res.quaternions)
        assert np.median(err) < 1.2, err
        assert err.max() < 2.5, err

    def test_noise_robust(self, cubic_setup):
        # The harmonic projection is a global matched filter: heavy
        # additive noise must not move the medians materially.
        _, _, q_true, patterns, indexer = cubic_setup
        rng = np.random.default_rng(1)
        noisy = np.clip(
            patterns + rng.normal(0.0, 0.15, patterns.shape), 0.0, None
        ).astype(np.float32)
        err = _err_deg(q_true, indexer.index_patterns(noisy).quaternions)
        assert np.median(err) < 1.2, err
        assert err.max() < 3.0, err

    def test_newton_beats_parabolic(self, cubic_setup):
        """True refinement (VERDICT r4 #4): Newton on the CONTINUOUS
        band-limited correlation must land far below the 3-point
        parabolic interpolation of the grid peak.

        Measured (24 renders, L=32, 5.6° grid): parabolic 0.69° median →
        Newton 0.27°; at L=64 Newton reaches 0.10° median at noise 0.15
        — L=32+Newton ≈ L=64 parabolic at 4x less compute (ROADMAP)."""
        import dataclasses

        master, geom, q_true, patterns, indexer = cubic_setup
        par = SphericalIndexer(
            master, geom,
            dataclasses.replace(indexer.config, refine="parabolic"),
        )
        e_newton = _err_deg(q_true, indexer.index_patterns(patterns).quaternions)
        e_par = _err_deg(q_true, par.index_patterns(patterns).quaternions)
        assert np.median(e_newton) < 0.45, e_newton
        assert np.median(e_newton) < 0.6 * np.median(e_par), (
            e_newton, e_par,
        )

    def test_newton_never_below_grid_score(self, cubic_setup):
        """The Newton path tracks the best-seen point, so its scores can
        only match or exceed the raw grid peaks."""
        import dataclasses

        master, geom, _, patterns, indexer = cubic_setup
        grid = SphericalIndexer(
            master, geom,
            dataclasses.replace(indexer.config, refine=False),
        )
        s_newton = indexer.index_patterns(patterns[:6]).scores
        s_grid = grid.index_patterns(patterns[:6]).scores
        assert np.all(s_newton >= s_grid - 1e-6), (s_newton, s_grid)

    def test_uint8_matches_f32(self, cubic_setup):
        _, _, _, patterns, indexer = cubic_setup
        u8 = (np.clip(patterns, 0, 1) * 255).astype(np.uint8)
        qa = indexer.index_patterns(patterns).quaternions
        qb = indexer.index_patterns(u8).quaternions
        # Quantization shifts the sub-grid peak slightly, nothing more.
        assert np.max(_err_deg(qa, qb)) < 0.5

    def test_parabolic_refinement_helps(self, cubic_setup):
        master, geom, q_true, patterns, _ = cubic_setup
        raw = SphericalIndexer(
            master,
            geom,
            SphericalIndexerConfig(bandwidth=32, chunk=8, refine=False),
        )
        err_raw = _err_deg(
            q_true, raw.index_patterns(patterns).quaternions
        )
        # Raw grid solutions are bounded by the grid spacing...
        assert np.median(err_raw) < 5.7
        # ...and the default (refine=True) fixture beats them clearly.
        fixture_idx = SphericalIndexer(
            master, geom, SphericalIndexerConfig(bandwidth=32, chunk=8)
        )
        err_ref = _err_deg(
            q_true, fixture_idx.index_patterns(patterns).quaternions
        )
        assert np.median(err_ref) < 0.6 * np.median(err_raw)

    def test_scores_separate_signal_from_noise(self, cubic_setup):
        _, _, _, patterns, indexer = cubic_setup
        rng = np.random.default_rng(2)
        junk = rng.uniform(size=(4,) + patterns.shape[1:]).astype(
            np.float32
        )
        s_real = indexer.index_patterns(patterns[:4]).scores
        s_junk = indexer.index_patterns(junk).scores
        assert s_real.min() > 2.0 * s_junk.max()

    def test_chunk_padding_and_single_pattern(self, cubic_setup):
        # 12 patterns / chunk 8 pads the tail; a single 2-D pattern is
        # promoted to a batch of one. Both must match the full batch.
        _, _, _, patterns, indexer = cubic_setup
        full = indexer.index_patterns(patterns)
        one = indexer.index_patterns(patterns[3])
        np.testing.assert_allclose(
            one.quaternions[0], full.quaternions[3], atol=1e-5
        )
        assert len(full) == 12 and len(one) == 1
        assert full.eulers_deg.shape == (12, 3)


class TestHexagonal:
    def test_hcp_master_and_622_reduction(self):
        rng = np.random.default_rng(3)
        master = make_kinematical_master(
            size=513, reflectors=hexagonal_reflectors()
        )
        geom = DetectorGeometry(shape=(128, 128))
        q_true = np.roll(R.random(6, rng).as_quat(), 1, axis=1)
        pats = render_from_master(master, q_true, geom)
        idx = SphericalIndexer(
            master,
            geom,
            SphericalIndexerConfig(bandwidth=32, chunk=6, symmetry="622"),
        )
        err = _err_deg(
            q_true, idx.index_patterns(pats).quaternions, group="622"
        )
        assert np.median(err) < 1.2, err


class TestMultiPhase:
    """Dictionary-free phase discrimination: per-pattern winner = highest
    normalized correlation peak across the candidate masters (the
    multi-phase capability the DI/Hough planes already have; the
    reference is single-phase cubic end to end, constants.py:13-39)."""

    def test_two_phase_discrimination_and_accuracy(self):
        rng = np.random.default_rng(4)
        m_fcc = make_kinematical_master(size=257)
        m_hcp = make_kinematical_master(
            size=257, reflectors=hexagonal_reflectors()
        )
        geom = DetectorGeometry(shape=(128, 128))
        q_f = np.roll(R.random(4, rng).as_quat(), 1, axis=1)
        q_h = np.roll(R.random(4, rng).as_quat(), 1, axis=1)
        pats = np.concatenate(
            [
                render_from_master(m_fcc, q_f, geom),
                render_from_master(m_hcp, q_h, geom),
            ]
        )
        idx = MultiPhaseSphericalIndexer(
            [m_fcc, m_hcp],
            geom,
            SphericalIndexerConfig(bandwidth=24, chunk=4),
            symmetries=["432", "622"],
        )
        res = idx.index_patterns(pats)
        np.testing.assert_array_equal(res.phase, [0] * 4 + [1] * 4)
        assert res.phase_scores.shape == (8, 2)
        np.testing.assert_allclose(
            res.scores, res.phase_scores.max(axis=1), rtol=1e-6
        )
        err_f = _err_deg(q_f, res.quaternions[:4], group="432")
        err_h = _err_deg(q_h, res.quaternions[4:], group="622")
        assert np.median(err_f) < 2.0, err_f  # 7.5 deg grid at L=24
        assert np.median(err_h) < 2.0, err_h

    def test_single_phase_matches_spherical_indexer(self, cubic_setup):
        # K=1 is exactly the single-phase indexer plus a zero phase map —
        # the composition contract the CLI relies on.
        master, geom, _, patterns, indexer = cubic_setup
        multi = MultiPhaseSphericalIndexer(
            [master], geom, indexer.config
        )
        a = indexer.index_patterns(patterns[:4])
        b = multi.index_patterns(patterns[:4])
        np.testing.assert_array_equal(a.quaternions, b.quaternions)
        np.testing.assert_array_equal(a.scores, b.scores)
        np.testing.assert_array_equal(b.phase, 0)
        np.testing.assert_array_equal(b.phase_scores[:, 0], a.scores)

    def test_validation(self, cubic_setup):
        master, geom, _, _, indexer = cubic_setup
        with pytest.raises(ValueError, match="at least one"):
            MultiPhaseSphericalIndexer([], geom, indexer.config)
        with pytest.raises(ValueError, match="symmetries"):
            MultiPhaseSphericalIndexer(
                [master, master],
                geom,
                indexer.config,
                symmetries=["432"] * 3,
            )

    def test_shared_tables_mismatch_raises(self, cubic_setup):
        """tables= must match (bandwidth, binned shape, beta grid) — a
        stale table from another config is rejected, not silently used."""
        from latice_tpu.index.spherical import projection_tables

        master, geom, _, _, indexer = cubic_setup
        wrong = projection_tables(16, geom)
        with pytest.raises(ValueError, match="do not match"):
            SphericalIndexer(master, geom, indexer.config, tables=wrong)


class TestStructure:
    def test_friedel_prunes_odd_degrees(self, cubic_setup):
        # Kinematical masters are antipodally symmetric: only even l
        # carry energy, so the Wigner tables halve automatically.
        _, _, _, _, indexer = cubic_setup
        keep = indexer._l_keep
        assert np.all(keep % 2 == 0)
        assert 0 not in keep  # DC removed
        assert len(keep) <= indexer.config.bandwidth // 2

    def test_master_coefficients_normalized(self):
        master = make_kinematical_master(size=257)
        coef = master_sph_coefficients(master, 16)
        np.testing.assert_allclose(
            np.sqrt(np.sum(np.abs(coef) ** 2)), 1.0, rtol=1e-12
        )
        np.testing.assert_array_equal(coef[0], 0.0)

    def test_validation(self, cubic_setup):
        master, geom, _, patterns, indexer = cubic_setup
        with pytest.raises(ValueError, match="expected"):
            indexer.index_patterns(patterns[:, :64, :64])
        with pytest.raises(ValueError, match="does not divide"):
            SphericalIndexer(
                master,
                DetectorGeometry(shape=(126, 126)),
                SphericalIndexerConfig(bandwidth=8, detector_bin=4),
            )
        with pytest.raises(ValueError, match="bandwidth"):
            SphericalIndexerConfig(bandwidth=2)
        with pytest.raises(ValueError, match="point group"):
            SphericalIndexerConfig(symmetry="999")
