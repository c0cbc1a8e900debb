"""NLPAR neighborhood pattern averaging: noise model + boundary preservation.

Ground truth is the documented weighting math itself (the reference has no
denoising stage) checked on synthetic scans with known grain structure.
"""

import numpy as np
import pytest

from latice_tpu.data.nlpar import estimate_noise_sigma, nlpar_denoise


def make_scan(rng, rows=6, cols=8, hw=16, noise=0.05, boundary_col=None):
    """Synthetic scan: one or two 'grains' (shared base pattern) + noise."""
    base_a = rng.uniform(0.2, 0.8, size=(hw, hw)).astype(np.float32)
    base_b = rng.uniform(0.2, 0.8, size=(hw, hw)).astype(np.float32)
    truth = np.empty((rows, cols, hw, hw), np.float32)
    for j in range(cols):
        truth[:, j] = (
            base_b if boundary_col is not None and j >= boundary_col else base_a
        )
    noisy = truth + rng.normal(size=truth.shape).astype(np.float32) * noise
    return truth, noisy


class TestNoiseEstimate:
    def test_recovers_known_sigma(self):
        rng = np.random.default_rng(0)
        _, noisy = make_scan(rng, rows=8, cols=8, hw=24, noise=0.08)
        sigma = estimate_noise_sigma(noisy)
        assert sigma.shape == (8, 8)
        # min-over-neighbors is slightly low-biased; generous band.
        assert 0.05 < np.median(sigma) < 0.09

    def test_bad_shape(self):
        with pytest.raises(ValueError, match="R, C, H, W"):
            estimate_noise_sigma(np.zeros((4, 16, 16)))


class TestDenoise:
    def test_reduces_error_inside_grain(self):
        rng = np.random.default_rng(1)
        truth, noisy = make_scan(rng, noise=0.08)
        out = nlpar_denoise(noisy, search_radius=1, h=2.0)
        err_before = np.mean((noisy - truth) ** 2)
        err_after = np.mean((out - truth) ** 2)
        # 3x3 uniform averaging would cut MSE ~9x; demand at least 4x.
        assert err_after < err_before / 4.0

    def test_identical_patterns_average_uniformly(self):
        # All-same-orientation scan: every weight ~1, so the interior
        # output approaches the 3x3 window mean.
        rng = np.random.default_rng(2)
        _, noisy = make_scan(rng, rows=5, cols=5, noise=0.05)
        out = nlpar_denoise(noisy, h=3.0)
        win = noisy[1:4, 1:4].reshape(9, *noisy.shape[2:]).mean(axis=0)
        np.testing.assert_allclose(out[2, 2], win, atol=0.01)

    def test_grain_boundary_preserved(self):
        rng = np.random.default_rng(3)
        truth, noisy = make_scan(
            rng, rows=6, cols=8, noise=0.03, boundary_col=4
        )
        out = nlpar_denoise(noisy, search_radius=1, h=1.0)
        # Patterns adjacent to the boundary must stay on their own side:
        # closer to their own grain's truth than to the other grain's.
        for i in range(6):
            left, right = truth[i, 3], truth[i, 4]
            d_own = np.mean((out[i, 3] - left) ** 2)
            d_other = np.mean((out[i, 3] - right) ** 2)
            assert d_own * 10 < d_other

    def test_chunked_matches_oneshot(self):
        rng = np.random.default_rng(4)
        _, noisy = make_scan(rng, rows=7, cols=5, noise=0.06)
        full = nlpar_denoise(noisy, chunk_rows=7)
        chunked = nlpar_denoise(noisy, chunk_rows=2)
        np.testing.assert_allclose(chunked, full, atol=1e-6)

    def test_radius_2_runs(self):
        rng = np.random.default_rng(5)
        _, noisy = make_scan(rng, rows=5, cols=5, noise=0.06)
        out = nlpar_denoise(noisy, search_radius=2, h=2.0)
        assert out.shape == noisy.shape
        assert np.isfinite(out).all()

    def test_hot_pixels_repaired_before_averaging(self):
        """hot_pixel_threshold= repairs spikes BEFORE the weighted average;
        repairing after cannot work — the spike inflates the noise estimate
        and smears into every window pattern."""
        rng = np.random.default_rng(6)
        truth, noisy = make_scan(rng, rows=4, cols=4, noise=0.03)
        spiked = noisy.copy()
        spiked[1, 1, 5, 5] = 50.0
        out = nlpar_denoise(spiked, h=2.0, hot_pixel_threshold=6.0)
        # The spike is gone from its own pattern...
        assert abs(out[1, 1, 5, 5] - truth[1, 1, 5, 5]) < 0.2
        # ...and did not smear into the neighbors' averages.
        assert abs(out[1, 2, 5, 5] - truth[1, 2, 5, 5]) < 0.2
        # Without the repair, the spike contaminates the neighborhood.
        smeared = nlpar_denoise(spiked, h=2.0)
        assert smeared[1, 1, 5, 5] > 1.0

    def test_validation(self):
        x = np.zeros((3, 3, 8, 8), np.float32)
        with pytest.raises(ValueError, match="search_radius"):
            nlpar_denoise(x, search_radius=0)
        with pytest.raises(ValueError, match="h must"):
            nlpar_denoise(x, h=0.0)
        with pytest.raises(ValueError, match="R, C, H, W"):
            nlpar_denoise(np.zeros((3, 8, 8)))
