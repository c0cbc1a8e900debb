"""Hough-based orientation indexing (index.hough_indexing).

The oracle chain: `solve_wahba` against scipy rotations, the band-plane
geometry against an independently-derived forward projection, and the full
pipeline against `sim.simulate_patterns` renders at known orientations
(the renderer draws each band centered exactly on the plane trace, so
detection + solving must recover the input orientation to ~Radon-bin
accuracy).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.crystal.symmetry import ROTATION_GROUPS
from latice_tpu.data.hough import BandDetector
from latice_tpu.index.hough_indexing import (
    HoughIndexer,
    band_plane_normals,
    solve_wahba,
)
from latice_tpu.sim import DetectorGeometry, cubic_reflectors, simulate_patterns


def project_band(normal, geometry):
    """Independent forward model: detector-frame plane normal → Radon
    ``(theta_deg, rho_px)`` — the inverse of `band_plane_normals`."""
    h, w = geometry.shape
    n = np.asarray(normal, np.float64)
    if geometry.tilt:
        t = math.radians(geometry.tilt)
        rot = np.array(
            [
                [1.0, 0.0, 0.0],
                [0.0, math.cos(t), -math.sin(t)],
                [0.0, math.sin(t), math.cos(t)],
            ]
        )
        n = n @ rot  # undo the tilt (rot is orthogonal: inv = transpose)
    cx0 = 0.5 - geometry.pcx
    cy0 = h / (2.0 * w) - geometry.pcy
    hyp = math.hypot(n[0], n[1])
    theta = math.degrees(math.atan2(n[1] / hyp, n[0] / hyp))
    rho = -w * (n[0] * cx0 + n[1] * cy0 + n[2] * geometry.dd) / hyp
    if theta < 0:
        theta += 180.0
        rho = -rho
    return theta, rho


def cubic_misorientation_deg(q_est, q_true):
    """Min misorientation over the 24 cubic images, degrees (host oracle)."""
    sym = R.from_quat(np.roll(ROTATION_GROUPS["432"], -1, axis=1))
    r_est = R.from_quat(np.roll(np.atleast_2d(q_est), -1, axis=1))
    r_true = R.from_quat(np.roll(np.atleast_2d(q_true), -1, axis=1))
    out = []
    for e, t in zip(r_est, r_true):
        angs = [((e * s).inv() * t).magnitude() for s in sym]
        out.append(math.degrees(min(angs)))
    return np.array(out)


class TestSolveWahba:
    def test_exact_recovery(self):
        rng = np.random.default_rng(3)
        rots = R.random(6, random_state=1)
        c = rng.normal(size=(6, 10, 3))
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        n = np.einsum("bij,bkj->bki", rots.as_matrix(), c)
        b_mat = np.einsum("bki,bkj->bij", n, c)
        q = np.asarray(solve_wahba(np.asarray(b_mat, np.float32)))
        q_true = np.roll(rots.as_quat(), 1, axis=1)
        err = np.minimum(
            np.linalg.norm(q - q_true, axis=1),
            np.linalg.norm(q + q_true, axis=1),
        )
        assert err.max() < 1e-3

    def test_power_iteration_matches_eigh(self):
        """The seeded power path (the TPU production route — `eigh` is a
        ~50 ms iterative program on TPU, solve_wahba docstring) must agree
        with the exact eigendecomposition, including from seeds several
        degrees off and under noisy partial-match weights."""
        rng = np.random.default_rng(5)
        rots = R.random(64, random_state=6)
        c = rng.normal(size=(64, 8, 3))
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        n = np.einsum("bij,bkj->bki", rots.as_matrix(), c)
        n += rng.normal(scale=0.02, size=n.shape)  # measurement noise
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        w = rng.uniform(0.2, 1.0, size=(64, 8))
        w[:, 6:] = 0.0  # unmatched bands
        b_mat = np.einsum("bk,bki,bkj->bij", w, n, c).astype(np.float32)
        q_exact = np.asarray(solve_wahba(jnp.asarray(b_mat)))
        # Seed = truth perturbed by a ~5-degree random rotation (the vote
        # grid's covering radius).
        pert = R.from_rotvec(
            rng.normal(scale=np.radians(3.0), size=(64, 3))
        )
        seed = np.roll((rots * pert).as_quat(), 1, axis=1).astype(np.float32)
        q_pow = np.asarray(solve_wahba(jnp.asarray(b_mat), init=jnp.asarray(seed)))
        err = np.minimum(
            np.linalg.norm(q_pow - q_exact, axis=1),
            np.linalg.norm(q_pow + q_exact, axis=1),
        )
        assert err.max() < 5e-5

    def test_power_iteration_zero_matrix_keeps_seed_finite(self):
        """A fully-masked fit (K = 0) must return a finite unit quaternion
        (callers gate these rows via the ok-mask; the solver must not NaN)."""
        seed = np.asarray([[0.9, 0.1, 0.3, -0.2]], np.float32)
        seed /= np.linalg.norm(seed)
        q = np.asarray(
            solve_wahba(jnp.zeros((1, 3, 3)), init=jnp.asarray(seed))
        )
        assert np.all(np.isfinite(q))
        assert abs(np.linalg.norm(q[0]) - 1.0) < 1e-5

    def test_weighted_outlier_rejected(self):
        """Zero-weight rows must not influence the solution."""
        rng = np.random.default_rng(4)
        rot = R.random(1, random_state=2)
        c = rng.normal(size=(8, 3))
        c /= np.linalg.norm(c, axis=-1, keepdims=True)
        n = c @ rot.as_matrix()[0].T
        w = np.ones(8)
        n_bad = n.copy()
        n_bad[7] = -n_bad[7] + 0.5  # corrupt one observation...
        w_bad = w.copy()
        w_bad[7] = 0.0  # ...but weight it out
        b_mat = np.einsum("k,ki,kj->ij", w_bad, n_bad, c)[None]
        q = np.asarray(solve_wahba(np.asarray(b_mat, np.float32)))[0]
        q_true = np.roll(rot.as_quat(), 1, axis=1)[0]
        err = min(
            np.linalg.norm(q - q_true), np.linalg.norm(q + q_true)
        )
        assert err < 1e-3


class TestBandPlaneNormals:
    @pytest.mark.parametrize(
        "geometry",
        [
            DetectorGeometry(),
            DetectorGeometry(shape=(96, 128), pcx=0.45, pcy=0.55, dd=0.65),
            DetectorGeometry(pcx=0.4, pcy=0.6, dd=0.8, tilt=10.0),
        ],
    )
    def test_roundtrip(self, geometry):
        rng = np.random.default_rng(0)
        nrm = rng.normal(size=(64, 3))
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        # Skip near-degenerate normals (band line at infinity).
        nrm = nrm[np.hypot(nrm[:, 0], nrm[:, 1]) > 0.05]
        theta, rho = zip(*(project_band(n, geometry) for n in nrm))
        back = band_plane_normals(
            np.asarray(theta), np.asarray(rho), geometry
        )
        dots = np.abs(np.sum(back * nrm, axis=-1))
        assert dots.min() > 1.0 - 1e-10

    def test_shape_preserved(self):
        g = DetectorGeometry()
        out = band_plane_normals(
            np.zeros((4, 7)) + 30.0, np.zeros((4, 7)), g
        )
        assert out.shape == (4, 7, 3)
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), 1.0, atol=1e-12
        )

    def test_center_band_through_pattern_center(self):
        """A band through the pattern center (rho chosen so the plane
        contains the PC ray) has a normal orthogonal to the PC ray."""
        g = DetectorGeometry(pcx=0.5, pcy=0.5, dd=0.7)
        # The PC ray is +z after centering; a plane containing it has
        # n_z = 0: rho must equal -W(cx0 cosθ + cy0 sinθ) per the formula.
        h, w = g.shape
        cx0, cy0 = 0.5 - g.pcx, h / (2.0 * w) - g.pcy
        for theta in (0.0, 30.0, 111.0):
            t = math.radians(theta)
            rho = -w * (cx0 * math.cos(t) + cy0 * math.sin(t))
            n = band_plane_normals(
                np.array([theta]), np.array([rho]), g
            )[0]
            assert abs(n[2]) < 1e-12


@pytest.fixture(scope="module")
def e2e():
    """Render 14 known-orientation fcc patterns and index them back."""
    geometry = DetectorGeometry(shape=(64, 64), pcx=0.5, pcy=0.5, dd=0.7)
    reflectors = cubic_reflectors("fcc", a=3.52, kv=20.0)
    rng = np.random.default_rng(7)
    q_true = R.random(14, random_state=11)
    quats = np.roll(q_true.as_quat(), 1, axis=1)
    patterns = simulate_patterns(quats, geometry, reflectors, chunk=16)
    detector = BandDetector(
        height=64, width=64, n_theta=90, n_rho=64, k=8,
        band_width_px=5.0, batch_size=16,
    )
    indexer = HoughIndexer(
        reflectors,
        geometry,
        group="432",
        grid_resolution_deg=4.0,
        n_bands=8,
        tolerance_deg=4.0,
        batch_size=16,
        detector=detector,
    )
    return indexer, patterns, quats


class TestEndToEnd:
    def test_orientations_recovered(self, e2e):
        indexer, patterns, q_true = e2e
        res = indexer(patterns)
        assert res.success.all()
        err = cubic_misorientation_deg(res.quaternions, q_true)
        assert np.median(err) < 1.5
        assert err.max() < 4.0
        # fit must report the residual scale actually achieved.
        assert res.fit_deg.max() < 3.0
        assert (res.n_matched >= 5).all()

    def test_batch_padding_path(self, e2e):
        """B not divisible by batch_size: same answers as the full run."""
        indexer, patterns, q_true = e2e
        full = indexer(patterns)
        part = indexer(patterns[:5])
        np.testing.assert_allclose(
            part.quaternions, full.quaternions[:5], atol=1e-6
        )

    def test_eulers_match_quaternions(self, e2e):
        indexer, patterns, _ = e2e
        res = indexer(patterns[:3])
        back = np.roll(
            R.from_euler("zxz", res.eulers_deg, degrees=True).as_quat(),
            1,
            axis=1,
        )
        dot = np.abs(np.sum(back * res.quaternions, axis=1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-9)

    def test_garbage_pattern_fails_gracefully(self, e2e):
        indexer, patterns, _ = e2e
        rng = np.random.default_rng(0)
        noise = rng.random((2, 64, 64)).astype(np.float32)
        res = indexer(noise)
        # Pure noise: few bands match coherently — low matched counts or
        # high residuals, and finite outputs either way.
        assert np.isfinite(res.quaternions).all()
        assert np.isfinite(res.fit_deg).all()


class TestGridPadMasking:
    def test_pad_rows_do_not_crowd_out_real_candidates(self):
        """Chunk-pad rows (tiled copies of grid[0]) must be vote-masked.

        Crafted failure mode: decoy bands give grid[0] the highest raw
        vote while the true orientation sits in grid[1]'s basin. With
        top_p=2 and one live pad duplicate of grid[0], the duplicate
        would occupy the second candidate slot, exclude grid[1], and the
        post-refinement re-ranking could never recover the truth. The
        m_valid mask makes padding a no-op.
        """
        import jax.numpy as jnp

        from latice_tpu.index.hough_indexing import _index_bands, _rotate

        refl = np.array(
            [
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
                [1.0, 1.0, 0.0],
                [1.0, 0.0, 1.0],
            ]
        )
        refl /= np.linalg.norm(refl, axis=-1, keepdims=True)

        q0 = R.identity()
        q1 = R.from_rotvec(np.radians(30.0) * np.array([1, 1, 1]) / math.sqrt(3))
        q_true = q1 * R.from_rotvec(np.radians(1.0) * np.array([1, 0, 0]))

        def sf(r):  # scalar-first quaternion
            return np.roll(np.atleast_2d(r.as_quat()), 1, axis=1)

        # Grid: [q0, q1, pad(q0), pad(q0)] — m_valid=2, one chunk of 4.
        grid = np.concatenate([sf(q0), sf(q1), sf(q0), sf(q0)])
        grid_q = jnp.asarray(grid, jnp.float32)
        grid_normals = jnp.asarray(
            _rotate(grid_q, jnp.asarray(refl, jnp.float32))
        ).reshape(1, 4, -1, 3)

        # 5 true bands (weight 1) + 3 heavy decoys near q0 (weight 2),
        # each perturbed 2.5° about a DIFFERENT axis so no single rotation
        # fits all three: q0 out-votes q1 (~5.8 vs ~4.9 inside the wide
        # vote gate) but after refinement its residuals stay ~2°, so the
        # soft band-credit rank must pick q1's basin (5 precise bands) —
        # IF q1 made the candidate list.
        true_bands = refl @ q_true.as_matrix().T
        perturb_axes = np.eye(3)[[2, 0, 1]]  # z for x-band, x for y, y for z
        decoys = np.stack(
            [
                R.from_rotvec(np.radians(2.5) * ax).apply(n)
                for n, ax in zip(refl[:3], perturb_axes)
            ]
        )
        nrm = np.concatenate([true_bands, decoys])[None]  # (1, 8, 3)
        wts = np.array([[1.0] * 5 + [2.0] * 3])

        q, fit, nm, vote, score = _index_bands(
            jnp.asarray(nrm, jnp.float32),
            jnp.asarray(wts, jnp.float32),
            grid_q,
            grid_normals,
            jnp.asarray(refl, jnp.float32),
            jnp.ones(len(refl), jnp.float32),
            tol_rad=math.radians(3.0),
            vote_tol_rad=math.radians(6.0),
            refine_iters=2,
            top_p=2,
            m_valid=2,
            i_weight=0.5,
        )
        assert int(nm[0]) == 5
        q_est = np.asarray(q, np.float64)[0]
        dot = abs(float(np.dot(q_est, sf(q_true)[0])))
        err_deg = math.degrees(2.0 * math.acos(min(dot, 1.0)))
        assert err_deg < 0.5  # without the mask this lands ~30 deg off


class TestValidation:
    def test_min_intensity_needs_reflectors(self):
        refl = cubic_reflectors("fcc")
        with pytest.raises(ValueError, match="min_intensity"):
            HoughIndexer(refl, min_intensity=10.0)

    def test_detector_shape_mismatch(self):
        refl = cubic_reflectors("fcc")
        det = BandDetector(height=64, width=64, k=8, batch_size=4)
        with pytest.raises(ValueError, match="shape"):
            HoughIndexer(
                refl, DetectorGeometry(shape=(128, 128)), detector=det
            )

    def test_detector_too_few_bands(self):
        refl = cubic_reflectors("fcc")
        det = BandDetector(height=64, width=64, k=4, batch_size=4)
        with pytest.raises(ValueError, match="bands"):
            HoughIndexer(
                refl,
                DetectorGeometry(shape=(64, 64)),
                n_bands=8,
                detector=det,
            )


def misorientation_deg(q_est, q_true, group):
    """Min misorientation over the group's images, degrees (host oracle)."""
    sym = R.from_quat(np.roll(ROTATION_GROUPS[group], -1, axis=1))
    r_est = R.from_quat(np.roll(np.atleast_2d(q_est), -1, axis=1))
    r_true = R.from_quat(np.roll(np.atleast_2d(q_true), -1, axis=1))
    out = []
    for e, t in zip(r_est, r_true):
        angs = [((e * s).inv() * t).magnitude() for s in sym]
        out.append(math.degrees(min(angs)))
    return np.array(out)


@pytest.fixture(scope="module")
def two_phase():
    """fcc (Ni) + hcp (Ti) renders at known orientations on one detector:
    the vendor multi-phase scenario — same bands machinery, different
    reflector geometry, the winner decided per pixel."""
    from latice_tpu.sim import hexagonal_reflectors

    geometry = DetectorGeometry(shape=(64, 64), pcx=0.5, pcy=0.5, dd=0.7)
    fcc = cubic_reflectors("fcc", a=3.52, kv=20.0)
    hcp = hexagonal_reflectors(a=2.95, c=4.68, kv=20.0, max_hkl=3, min_d=1.0)
    q_fcc = np.roll(R.random(8, random_state=5).as_quat(), 1, axis=1)
    q_hcp = np.roll(R.random(8, random_state=6).as_quat(), 1, axis=1)
    p_fcc = simulate_patterns(q_fcc, geometry, fcc, chunk=16)
    p_hcp = simulate_patterns(q_hcp, geometry, hcp, chunk=16)
    patterns = np.concatenate([p_fcc, p_hcp])
    truth_phase = np.array([0] * 8 + [1] * 8)
    q_true = np.concatenate([q_fcc, q_hcp])
    detector = BandDetector(
        height=64, width=64, n_theta=90, n_rho=64, k=8,
        band_width_px=5.0, batch_size=16,
    )
    kwargs = dict(
        grid_resolution_deg=4.0, n_bands=8, tolerance_deg=4.0,
        batch_size=16, detector=detector,
    )
    return geometry, fcc, hcp, patterns, truth_phase, q_true, kwargs


class TestMultiPhase:
    def test_phase_discrimination_and_accuracy(self, two_phase):
        """Verdict item 3's Done criterion: an fcc-vs-hcp two-phase run
        assigns every render to its true phase and recovers orientations
        through the winner's own symmetry."""
        from latice_tpu.index.hough_indexing import MultiPhaseHoughIndexer

        geometry, fcc, hcp, patterns, truth_phase, q_true, kwargs = two_phase
        mpi = MultiPhaseHoughIndexer(
            [(fcc, "432"), (hcp, "622")], geometry, **kwargs
        )
        res = mpi(patterns)
        assert res.phase.shape == (16,)
        # Phase discrimination: renders are clean, every pixel must land.
        np.testing.assert_array_equal(res.phase, truth_phase)
        assert res.success.all()
        for pid, group in ((0, "432"), (1, "622")):
            m = truth_phase == pid
            err = misorientation_deg(
                res.quaternions[m], q_true[m], group
            )
            assert np.median(err) < 1.5, (pid, err)
            assert err.max() < 4.0, (pid, err)

    def test_winner_fields_match_per_phase(self, two_phase):
        """The selected fields must equal the winning phase's own result
        row-for-row (take_along_axis wiring)."""
        from latice_tpu.index.hough_indexing import MultiPhaseHoughIndexer

        geometry, fcc, hcp, patterns, truth_phase, _, kwargs = two_phase
        mpi = MultiPhaseHoughIndexer(
            [(fcc, "432"), (hcp, "622")], geometry, **kwargs
        )
        res = mpi(patterns[:6])
        assert len(res.per_phase) == 2
        for i, p in enumerate(res.phase):
            src = res.per_phase[p]
            np.testing.assert_array_equal(
                res.quaternions[i], src.quaternions[i]
            )
            assert res.fit_deg[i] == src.fit_deg[i]
            assert res.n_matched[i] == src.n_matched[i]
            assert res.vote_score[i] == src.vote_score[i]
            assert res.success[i] == src.success[i]

    def test_single_phase_degrades_to_plain_indexer(self, two_phase):
        """One phase in the list == the plain HoughIndexer, bit for bit;
        the shared detector runs the Radon scan once either way."""
        from latice_tpu.index.hough_indexing import MultiPhaseHoughIndexer

        geometry, fcc, _, patterns, _, _, kwargs = two_phase
        single = HoughIndexer(fcc, geometry, group="432", **kwargs)
        mpi = MultiPhaseHoughIndexer([(fcc, "432")], geometry, **kwargs)
        a = single(patterns[:5])
        b = mpi(patterns[:5])
        np.testing.assert_array_equal(a.quaternions, b.quaternions)
        np.testing.assert_array_equal(a.fit_deg, b.fit_deg)
        assert (b.phase == 0).all()

    def test_groups_property_and_validation(self, two_phase):
        from latice_tpu.index.hough_indexing import MultiPhaseHoughIndexer

        geometry, fcc, hcp, *_ , kwargs = two_phase
        mpi = MultiPhaseHoughIndexer(
            [(fcc, "432"), (hcp, "622")], geometry, **kwargs
        )
        assert mpi.groups == ["432", "622"]
        with pytest.raises(ValueError, match="at least one"):
            MultiPhaseHoughIndexer([], geometry, **kwargs)


class TestShardedHough:
    """mesh= grid sharding: the orientation grid splits over the 8-device
    virtual mesh; per-shard winners merge by band-credit rank — results
    must match the single-device indexer."""

    def test_mesh_matches_single_device(self, e2e):
        from latice_tpu.parallel import make_mesh

        indexer, patterns, q_true = e2e
        mesh_ix = HoughIndexer(
            cubic_reflectors("fcc", a=3.52, kv=20.0),
            indexer.geometry,
            group="432",
            grid_resolution_deg=4.0,
            n_bands=8,
            tolerance_deg=4.0,
            batch_size=16,
            detector=indexer.detector,
            mesh=make_mesh(8),
        )
        single = indexer(patterns)
        sharded = mesh_ix(patterns)
        # Superset contract: every shard refines its own top_p, so the
        # union of candidates CONTAINS the single-device list — the merged
        # winner's band-credit rank can only match or beat it (it may be a
        # same-basin candidate the single-device top_p missed). Slack
        # covers f32 program-order noise: the sharded program fuses
        # differently and arccos amplifies ~1e-7 dot differences near 1.
        assert (sharded.band_score >= single.band_score - 0.01).all()
        # Same basins in practice: quaternions agree to well under the
        # Radon-bin scale.
        dots = np.abs(np.sum(sharded.quaternions * single.quaternions, axis=1))
        assert dots.min() > math.cos(math.radians(1.0))  # < 2 deg apart
        assert sharded.success.all()
        err = cubic_misorientation_deg(sharded.quaternions, q_true)
        assert np.median(err) < 1.5
        assert err.max() < 4.0

    def test_mesh_pads_uneven_chunks(self):
        """A grid whose chunk count does not divide the mesh size pads
        with masked chunks; an all-pad shard can never win (argmax ties
        resolve to device 0 where the real grid[0] lives)."""
        from latice_tpu.parallel import make_mesh

        geometry = DetectorGeometry(shape=(64, 64), pcx=0.5, pcy=0.5, dd=0.7)
        reflectors = cubic_reflectors("fcc", a=3.52, kv=20.0)
        detector = BandDetector(
            height=64, width=64, n_theta=90, n_rho=64, k=8,
            band_width_px=5.0, batch_size=8,
        )
        # Coarse grid -> few chunks (certainly not divisible by 8 after
        # grid_chunk=64 chunking), so several shards are pure padding.
        kw = dict(
            group="432", grid_resolution_deg=8.0, n_bands=8,
            tolerance_deg=5.0, batch_size=8, detector=detector,
            grid_chunk=64,
        )
        single = HoughIndexer(reflectors, geometry, **kw)
        sharded = HoughIndexer(
            reflectors, geometry, mesh=make_mesh(8), **kw
        )
        assert single._grid_normals.shape[0] != sharded._grid_normals.shape[0]
        q_true = np.roll(R.random(6, random_state=2).as_quat(), 1, axis=1)
        pats = simulate_patterns(q_true, geometry, reflectors, chunk=8)
        a = single(pats)
        b = sharded(pats)
        # Both recover the truth despite several all-pad shards; the
        # merged winner carries finite (real-candidate) scores.
        assert (b.band_score >= a.band_score - 0.01).all()
        ea = cubic_misorientation_deg(a.quaternions, q_true)
        eb = cubic_misorientation_deg(b.quaternions, q_true)
        assert np.median(eb) <= np.median(ea) + 0.5
        assert eb.max() < 5.0
        assert np.isfinite(b.vote_score).all()
        assert np.isfinite(b.band_score).all()
