"""Autodiff pattern-center calibration: recovery of a known PC offset."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from latice_tpu.sim import (
    DetectorGeometry,
    calibrate_geometry,
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
