"""Hough/Radon band detection (data.hough): synthetic bands at known
(theta, rho) must be recovered; IQ must rank pattern sharpness."""

import numpy as np
import pytest

from latice_tpu.data.hough import (
    BandDetector,
    butterfly_kernel,
    radon_matrix,
)

H = W = 96


def draw_bands(bands, h=H, w=W, width=6.0, noise=0.0, seed=0):
    """Sum of Gaussian-profile bright bands at given (theta_deg, rho_px)."""
    rng = np.random.default_rng(seed)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rows, cols = np.mgrid[0:h, 0:w]
    x = cols - cx
    y = cy - rows
    img = np.zeros((h, w))
    for theta_deg, rho in bands:
        th = np.radians(theta_deg)
        d = x * np.cos(th) + y * np.sin(th) - rho
        img += np.exp(-(d**2) / (2.0 * (width / 2.0) ** 2))
    img += rng.normal(scale=noise, size=img.shape)
    return img.astype(np.float32)


@pytest.fixture(scope="module")
def detector():
    return BandDetector(
        height=H, width=W, n_theta=90, n_rho=96, k=6,
        band_width_px=6.0, batch_size=4,
    )


class TestRadonMatrix:
    def test_rows_average_to_one(self):
        a, mask = radon_matrix(H, W, 45, 48)
        line_sums = a @ np.ones(H * W)
        supported = line_sums > 0
        # A supported line bin averages the image: weights sum to 1.
        np.testing.assert_allclose(line_sums[supported], 1.0, atol=1e-4)
        assert supported.mean() > 0.5
        # Pixels outside the inscribed circle never contribute.
        outside = ~mask.ravel()
        assert np.abs(a[:, outside]).max() == 0.0

    def test_butterfly_zero_sum(self):
        k = butterfly_kernel(5)
        assert abs(k.sum()) < 1e-6
        assert k.max() > 0 > k.min()


class TestBandDetection:
    def test_single_band_recovered(self, detector):
        img = draw_bands([(40.0, 10.0)])
        det = detector(img[None])
        assert abs(det.theta_deg[0, 0] - 40.0) <= 2.0
        assert abs(det.rho_px[0, 0] - 10.0) <= 2.0
        assert det.strength[0, 0] > 0

    def test_three_bands_all_found(self, detector):
        truth = [(20.0, -15.0), (75.0, 5.0), (130.0, 22.0)]
        det = detector(draw_bands(truth, noise=0.02)[None])
        found = set()
        for t0, r0 in truth:
            for t, r in zip(det.theta_deg[0], det.rho_px[0]):
                if abs(t - t0) <= 3.0 and abs(r - r0) <= 3.0:
                    found.add((t0, r0))
        assert len(found) == 3
        assert det.band_count[0] >= 3

    @pytest.mark.parametrize("theta", [1.0, 179.0])
    def test_theta_wrap(self, detector, theta):
        """Bands near 0/180 must survive the wrapped NMS — (theta, rho) and
        (theta +- 180, -rho) name the same line."""
        det = detector(draw_bands([(theta, 12.0)])[None])
        t, r = det.theta_deg[0, 0], det.rho_px[0, 0]
        hit = any(
            abs(t - (theta + dt)) <= 2.0 and abs(r - sr * 12.0) <= 2.0
            for dt, sr in ((0.0, 1.0), (180.0, -1.0), (-180.0, -1.0))
        )
        assert hit, (t, r)

    def test_affine_intensity_invariance(self, detector):
        """Mean removal + contrast response: gain/offset change nothing but
        scale, so uint8 frames need no normalization."""
        img = draw_bands([(60.0, -8.0), (110.0, 14.0)])
        u8 = np.clip(img * 90 + 40, 0, 255).astype(np.uint8)
        det_f = detector((u8.astype(np.float32) / 255.0)[None])
        det_u = detector(u8[None])
        np.testing.assert_allclose(
            det_u.theta_deg[0, :3], det_f.theta_deg[0, :3], atol=2.0
        )
        np.testing.assert_allclose(
            det_u.rho_px[0, :3], det_f.rho_px[0, :3], atol=2.0
        )

    def test_iq_ranks_sharpness(self, detector):
        bands = [(30.0, 0.0), (100.0, -10.0), (150.0, 15.0)]
        clean = draw_bands(bands, seed=1)
        noisy = clean + np.random.default_rng(2).normal(
            scale=1.0, size=clean.shape
        ).astype(np.float32)
        flat = np.random.default_rng(3).normal(
            scale=0.3, size=clean.shape
        ).astype(np.float32)
        det = detector(np.stack([clean, noisy, flat]))
        iq = det.iq
        assert iq[0] > iq[1] > iq[2]

    def test_chunking_and_padding(self, detector):
        """batch_size=4 with 5 inputs: padded tail, one compiled shape."""
        imgs = np.stack(
            [draw_bands([(20.0 + 25 * i, 5.0 * i - 10)]) for i in range(5)]
        )
        det = detector(imgs)
        assert det.theta_deg.shape == (5, 6)
        for i in range(5):
            assert abs(det.theta_deg[i, 0] - (20.0 + 25 * i)) <= 2.0

    def test_shape_validation(self, detector):
        with pytest.raises(ValueError, match="expected"):
            detector(np.zeros((2, 64, 64)))
