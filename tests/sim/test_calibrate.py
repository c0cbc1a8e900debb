"""Autodiff pattern-center calibration: recovery of a known PC offset,
and the scan-varying affine model PC(xy) = PC0 + G.xy."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.sim import (
    DetectorGeometry,
    ScanCalibration,
    calibrate_geometry,
    calibrate_scan_geometry,
    cubic_reflectors,
    pixel_directions,
    simulate_patterns,
)
from latice_tpu.sim.calibrate import _pixel_directions_jax


class TestJaxDirections:
    def test_matches_host_geometry(self):
        import jax.numpy as jnp

        g = DetectorGeometry(shape=(48, 48), pcx=0.43, pcy=0.58, dd=0.66,
                             tilt=7.0)
        host = pixel_directions(g).reshape(-1, 3)
        dev = np.asarray(
            _pixel_directions_jax(
                g.shape, jnp.float32(g.pcx), jnp.float32(g.pcy),
                jnp.float32(g.dd), jnp.float32(np.radians(g.tilt)),
            )
        )
        np.testing.assert_allclose(dev, host, atol=1e-6)


class TestCalibrate:
    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(0)
        refl = cubic_reflectors("fcc", max_hkl=2, min_d=1.0)
        true_geom = DetectorGeometry(shape=(64, 64), pcx=0.52, pcy=0.47,
                                     dd=0.68)
        truth = R.random(12, random_state=rng)
        tq = np.roll(truth.as_quat(), 1, axis=1).astype(np.float32)
        patterns = simulate_patterns(tq, true_geom, refl)
        return rng, refl, true_geom, truth, tq, patterns

    def test_recovers_pattern_center(self, setup):
        rng, refl, true_geom, truth, tq, patterns = setup
        nominal = DetectorGeometry(shape=(64, 64))  # (0.5, 0.5, 0.7)
        # Orientations perturbed like a dictionary init would be.
        axes = rng.normal(size=(len(tq), 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        init = np.roll(
            (R.from_rotvec(np.radians(1.0) * axes) * truth).as_quat(),
            1, axis=1,
        ).astype(np.float32)
        fitted, refined, ncc = calibrate_geometry(
            patterns, init, nominal, refl, steps=300, lr_pc=4e-3
        )
        # Start was (0.5, 0.5, 0.7): the fit removes ~90% of the PC error.
        # A few 1e-3 residual splits along the PC<->common-rotation
        # near-degeneracy (a constant PC shift looks almost like a shared
        # rotation; only gnomonic distortion separates them) — the fit
        # itself is at NCC ~0.999.
        assert abs(fitted.pcx - true_geom.pcx) < 6e-3
        assert abs(fitted.pcy - true_geom.pcy) < 6e-3
        assert abs(fitted.dd - true_geom.dd) < 5e-3
        assert ncc > 0.99
        err = np.degrees(
            (R.from_quat(np.roll(refined, -1, axis=1)).inv() * truth).magnitude()
        )
        assert np.median(err) < 1.0

    def test_known_crystal_pins_pc_tightly(self, setup):
        """The metrological path: known orientations (lr_orientation=0)
        remove the PC/rotation degeneracy and the PC recovers to ~1e-3."""
        _, refl, true_geom, truth, tq, patterns = setup
        nominal = DetectorGeometry(shape=(64, 64))
        fitted, refined, ncc = calibrate_geometry(
            patterns, tq, nominal, refl, steps=300, lr_pc=4e-3,
            lr_orientation=0.0,
        )
        assert abs(fitted.pcx - true_geom.pcx) < 2e-3
        assert abs(fitted.pcy - true_geom.pcy) < 2e-3
        assert abs(fitted.dd - true_geom.dd) < 3e-3
        np.testing.assert_allclose(refined, tq, atol=1e-6)  # pinned

    def test_exact_start_stays(self, setup):
        _, refl, true_geom, truth, tq, patterns = setup
        fitted, _, ncc = calibrate_geometry(
            patterns, tq, true_geom, refl, steps=40
        )
        assert abs(fitted.pcx - true_geom.pcx) < 2e-3
        assert abs(fitted.dd - true_geom.dd) < 3e-3
        assert ncc > 0.99

    def test_validation(self, setup):
        _, refl, true_geom, truth, tq, patterns = setup
        with pytest.raises(ValueError, match="patterns"):
            calibrate_geometry(patterns[:, :32, :32], tq, true_geom, refl)
        with pytest.raises(ValueError, match="init_quats"):
            calibrate_geometry(patterns, tq[:3], true_geom, refl)


class TestScanCalibrate:
    """Scan-varying PC: recover a known affine gradient PC(xy) = PC0 + G.xy.

    This is the fit that breaks the PC<->rotation near-degeneracy the
    shared-PC mode documents (calibrate.py module docstring): the affine
    constraint ties 9 shared parameters across the whole scan, so the joint
    mode converges to the TRUE geometry instead of creeping along the
    degenerate direction — tested below to ~1e-4 detector widths with
    unknown (perturbed) orientations, vs the shared fit's few-1e-3 cap.
    """

    # True affine model over a 4x3 scan, positions in microns: pcx drifts
    # -0.03 over 120 um of scan x, pcy +0.02 and dd +0.01 over 90 um of
    # scan y — magnitudes typical of a real raster under a fixed detector.
    PC0_TRUE = np.array([0.52, 0.47, 0.68])
    G_TRUE = np.array([
        [-0.03 / 120.0, 0.0],
        [0.0, 0.02 / 90.0],
        [0.0, 0.01 / 90.0],
    ])
    SPAN = np.array([120.0, 90.0])

    @pytest.fixture(scope="class")
    def setup(self):
        rng = np.random.default_rng(0)
        refl = cubic_reflectors("fcc", max_hkl=2, min_d=1.0)
        xs = np.linspace(0.0, 120.0, 4)
        ys = np.linspace(0.0, 90.0, 3)
        scan_xy = np.array([(x, y) for y in ys for x in xs])
        truth = R.random(len(scan_xy), random_state=rng)
        tq = np.roll(truth.as_quat(), 1, axis=1).astype(np.float32)
        pats = []
        for i, xy in enumerate(scan_xy):
            pc = self.PC0_TRUE + self.G_TRUE @ xy
            g = DetectorGeometry(shape=(64, 64), pcx=pc[0], pcy=pc[1],
                                 dd=pc[2])
            pats.append(simulate_patterns(tq[i:i + 1], g, refl)[0])
        return rng, refl, scan_xy, truth, tq, np.stack(pats)

    def test_pinned_orientations_recover_model(self, setup):
        """Metrological mode (known crystal, lr_orientation=0): PC0 and G
        recover to ~1e-7 of detector width in 300 steps."""
        _, refl, scan_xy, truth, tq, patterns = setup
        nominal = DetectorGeometry(shape=(64, 64))  # (0.5, 0.5, 0.7)
        fit, refined, ncc = calibrate_scan_geometry(
            patterns, tq, scan_xy, nominal, refl, steps=300,
            lr_orientation=0.0,
        )
        assert isinstance(fit, ScanCalibration)
        np.testing.assert_allclose(fit.pc0, self.PC0_TRUE, atol=1e-5)
        # Gradient error measured as PC drift across the full scan span.
        g_span_err = np.abs(fit.gradient - self.G_TRUE) * self.SPAN[None, :]
        assert g_span_err.max() < 1e-5
        assert ncc > 0.999
        np.testing.assert_allclose(refined, tq, atol=1e-6)  # pinned

    def test_joint_fit_breaks_degeneracy(self, setup):
        """The production mode: orientations only known to ~1 degree, fit
        jointly. The affine constraint recovers PC0 AND G to <1e-4 of
        detector width — an order beyond what the shared-PC joint fit can
        do (its test above stops at 6e-3) — and the orientations refine to
        ~0.01 degrees along the way."""
        rng, refl, scan_xy, truth, tq, patterns = setup
        nominal = DetectorGeometry(shape=(64, 64))
        axes = rng.normal(size=(len(tq), 3))
        axes /= np.linalg.norm(axes, axis=1, keepdims=True)
        init = np.roll(
            (R.from_rotvec(np.radians(1.0) * axes) * truth).as_quat(),
            1, axis=1,
        ).astype(np.float32)
        fit, refined, ncc = calibrate_scan_geometry(
            patterns, init, scan_xy, nominal, refl, steps=2500,
        )
        np.testing.assert_allclose(fit.pc0, self.PC0_TRUE, atol=1e-4)
        g_span_err = np.abs(fit.gradient - self.G_TRUE) * self.SPAN[None, :]
        assert g_span_err.max() < 1e-4
        assert ncc > 0.999
        err = np.degrees(
            (R.from_quat(np.roll(refined, -1, axis=1)).inv() * truth)
            .magnitude()
        )
        assert np.median(err) < 0.05

    def test_model_evaluation(self, setup):
        """ScanCalibration evaluates the affine model in caller units."""
        fit = ScanCalibration(
            pc0=self.PC0_TRUE, gradient=self.G_TRUE, shape=(64, 64),
            tilt=0.0,
        )
        xy = np.array([60.0, 45.0])
        np.testing.assert_allclose(
            fit.pc_at(xy), self.PC0_TRUE + self.G_TRUE @ xy
        )
        # Batched positions broadcast.
        grid = np.stack([np.array([0.0, 0.0]), xy, np.array([120.0, 90.0])])
        assert fit.pc_at(grid).shape == (3, 3)
        geom = fit.geometry_at(xy)
        assert isinstance(geom, DetectorGeometry)
        np.testing.assert_allclose(
            [geom.pcx, geom.pcy, geom.dd],
            self.PC0_TRUE + self.G_TRUE @ xy,
        )
        assert geom.shape == (64, 64)

    def test_constant_axis_is_conditioned(self, setup):
        """A line scan (one scan axis constant) must not blow up the
        normalization — the degenerate column just fits to ~zero."""
        _, refl, scan_xy, truth, tq, patterns = setup
        line = scan_xy.copy()
        line[:, 1] = 7.0  # constant y
        fit, _, ncc = calibrate_scan_geometry(
            patterns[:4], tq[:4], line[:4],
            DetectorGeometry(shape=(64, 64)), refl, steps=30,
        )
        assert np.isfinite(fit.pc0).all()
        assert np.isfinite(fit.gradient).all()

    def test_validation(self, setup):
        _, refl, scan_xy, truth, tq, patterns = setup
        geom = DetectorGeometry(shape=(64, 64))
        with pytest.raises(ValueError, match="scan_xy"):
            calibrate_scan_geometry(patterns, tq, scan_xy[:3], geom, refl)
        with pytest.raises(ValueError, match="init_quats"):
            calibrate_scan_geometry(patterns, tq[:3], scan_xy, geom, refl)
        with pytest.raises(ValueError, match="patterns"):
            calibrate_scan_geometry(
                patterns[:, :32, :32], tq, scan_xy, geom, refl
            )
