"""Hough/Radon band detection and pattern-quality metrics.

The vendor-software standard plane (OIM/Esprit/AZtec all run a Radon
("Hough") transform to find Kikuchi bands and derive the Image Quality
map practitioners use to see grain boundaries, strain and surface damage).
The reference has none of this — its .ang-style IQ would have to come
from somewhere else entirely; here `index.py query` exports a
similarity-derived IQ while this module computes the real, detector-side
one.

TPU mapping: the Radon transform IS a matmul. The line-integral weights
are precomputed once into a dense ``(n_theta * n_rho, H*W)`` matrix (a
few hundred MB at 128² — bf16 on device), so a whole batch transforms as
one ``(B, H*W) @ (H*W, n_lines)`` MXU contraction; band enhancement is a
small butterfly convolution along rho, and peak picking is max-pool NMS +
``top_k`` — the entire path compiles into one XLA program per batch, no
per-pattern host loops (the classic CPU implementation is a quadruple
loop).

Conventions: pixel (row, col) maps to centered coordinates
``x = col - (W-1)/2`` (right), ``y = (H-1)/2 - row`` (up). A line is
``rho = x cos(theta) + y sin(theta)`` with theta in [0, 180) degrees —
theta is the band NORMAL's direction, rho the signed distance from the
pattern center in pixels. Only pixels inside the inscribed circle
contribute (every line bin sees a comparable support length).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "radon_matrix",
    "butterfly_kernel",
    "BandDetection",
    "BandDetector",
]


def radon_matrix(
    h: int,
    w: int,
    n_theta: int = 90,
    n_rho: int = 96,
) -> tuple[np.ndarray, np.ndarray]:
    """Precompute the dense Radon line-integral matrix.

    Each (theta, rho) row holds per-pixel weights that *average* the
    image along that line (linear interpolation between the two nearest
    rho bins, normalized by total support), so the sinogram of a
    constant image is constant — band peaks then measure real contrast,
    not line length.

    Returns:
        ``(A, mask)`` — ``A`` is ``(n_theta * n_rho, h * w)`` float32,
        ``mask`` the ``(h, w)`` bool inscribed-circle support.
    """
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    rows, cols = np.mgrid[0:h, 0:w]
    x = (cols - cx).astype(np.float64)
    y = (cy - rows).astype(np.float64)
    radius = min(h, w) / 2.0
    mask = (x**2 + y**2) <= radius**2
    pix = np.nonzero(mask.ravel())[0]
    xm, ym = x.ravel()[pix], y.ravel()[pix]

    thetas = np.pi * np.arange(n_theta) / n_theta
    a = np.zeros((n_theta, n_rho, h * w), np.float32)
    for t, th in enumerate(thetas):
        rho = xm * np.cos(th) + ym * np.sin(th)
        pos = (rho + radius) / (2.0 * radius) * (n_rho - 1)
        lo = np.clip(np.floor(pos).astype(np.int64), 0, n_rho - 2)
        frac = (pos - lo).astype(np.float32)
        np.add.at(a[t], (lo, pix), 1.0 - frac)
        np.add.at(a[t], (lo + 1, pix), frac)
    support = a.sum(axis=2, keepdims=True)  # (n_theta, n_rho, 1)
    # Mean along the line; starved bins (rho beyond the circle) stay 0.
    min_support = 0.05 * float(support.max())
    a = np.where(support > min_support, a / np.maximum(support, 1e-9), 0.0)
    return a.reshape(n_theta * n_rho, h * w).astype(np.float32), mask


def butterfly_kernel(width: int = 5) -> np.ndarray:
    """1-D band-enhancement kernel along rho (the "butterfly" filter).

    A bright Kikuchi band is a plateau of width ~band width flanked by
    the background: +1 over the plateau, -1 over equal-length flanks,
    zero-sum — so flat background cancels and a band of matching width
    scores its (mean band − mean flank) contrast.
    """
    if width < 1:
        raise ValueError(f"butterfly width must be >= 1, got {width}")
    width |= 1  # odd plateau -> odd total length, so "same" conv centers
    flank = max(width // 2, 1)
    k = np.concatenate(
        [
            -np.ones(flank) / (2 * flank),
            np.ones(width) / width,
            -np.ones(flank) / (2 * flank),
        ]
    )
    return k.astype(np.float32)


class BandDetection(NamedTuple):
    """Per-pattern detected bands + quality metrics (host numpy)."""

    theta_deg: np.ndarray  # (B, k) band-normal angle, [0, 180)
    rho_px: np.ndarray  # (B, k) signed center distance, pixels
    strength: np.ndarray  # (B, k) butterfly response, best-first
    iq: np.ndarray  # (B,) mean strength of the detected bands (OIM IQ role)
    band_count: np.ndarray  # (B,) peaks above half the strongest


class BandDetector:
    """Compiled Radon -> butterfly -> NMS -> top-k band finder.

    Args:
        height / width: detector frame shape.
        n_theta: angular bins over [0, 180) (2° default resolution).
        n_rho: radial bins over the inscribed-circle diameter.
        k: bands returned per pattern (strongest first).
        band_width_px: expected band width in PIXELS (sets the butterfly
            plateau; ~6-10 px for 128² detectors at typical kV).
        batch_size: static compile batch (inputs padded up to it).

    Call with ``(B, H, W[, 1])`` patterns (uint8 or float — NCC-style
    per-pattern mean removal makes gain/offset irrelevant); returns a
    `BandDetection`.
    """

    def __init__(
        self,
        height: int = 128,
        width: int = 128,
        n_theta: int = 90,
        n_rho: int = 96,
        k: int = 10,
        band_width_px: float = 8.0,
        batch_size: int = 256,
    ) -> None:
        self.n_theta, self.n_rho, self.k = n_theta, n_rho, k
        self.batch_size = batch_size
        self.shape = (height, width)
        a, mask = radon_matrix(height, width, n_theta, n_rho)
        radius = min(height, width) / 2.0
        self.rho_scale = 2.0 * radius / (n_rho - 1)
        # Band width in rho bins sets the butterfly plateau.
        width_bins = max(int(round(band_width_px / self.rho_scale)), 1)
        kern = butterfly_kernel(width_bins)
        # The Radon matrix and mask are runtime ARGUMENTS of the jitted
        # program, not closure captures: captured arrays bake into the
        # lowered program as constants (~300 MB here — big enough to blow
        # a remote-compile request limit, and re-serialized per compile).
        self._a_dev = jnp.asarray(a.T, jnp.bfloat16)  # (n_pix, n_lines)
        self._mask_dev = jnp.asarray(mask.ravel(), jnp.float32)
        kern_dev = jnp.asarray(kern)
        n_support = float(mask.sum())

        def _run(a_dev, mask_dev, x):
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = x.astype(jnp.float32)
            b = x.shape[0]
            v = x.reshape(b, -1) * mask_dev
            # Standardize per pattern over the support (zero mean, unit
            # std): band responses then measure contrast *relative to the
            # pattern's own intensity spread*, so added noise LOWERS IQ
            # (it raises the denominator) instead of feeding spurious
            # peaks — the OIM-IQ behavior practitioners expect.
            mean = v.sum(axis=1, keepdims=True) / n_support
            v = (v - mean) * mask_dev
            var = (v * v).sum(axis=1, keepdims=True) / n_support
            v = v / jnp.sqrt(var + 1e-12)
            sino = jnp.einsum(
                "bp,pl->bl", v.astype(jnp.bfloat16), a_dev,
                preferred_element_type=jnp.float32,
            ).reshape(b, self.n_theta, self.n_rho)
            # Butterfly along rho (theta is the feature-free axis).
            resp = jax.lax.conv_general_dilated(
                sino[..., None],
                kern_dev[None, :, None, None],
                window_strides=(1, 1),
                padding=((0, 0), (len(kern_dev) // 2,) * 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[..., 0]
            assert resp.shape[1:] == (self.n_theta, self.n_rho), resp.shape
            # The theta axis wraps with rho negated: pad one NMS halo so
            # peaks at theta ~ 0/180 suppress their wrapped twins.
            halo = jnp.flip(resp[:, -1:, :], axis=2)
            halo0 = jnp.flip(resp[:, :1, :], axis=2)
            padded = jnp.concatenate([halo, resp, halo0], axis=1)
            # Valid windows over the theta-haloed array realign with resp
            # (padded theta size n_theta+2, window 3 -> n_theta outputs).
            neigh = jax.lax.reduce_window(
                padded,
                -jnp.inf,
                jax.lax.max,
                window_dimensions=(1, 3, 3),
                window_strides=(1, 1, 1),
                padding=((0, 0), (0, 0), (1, 1)),
            )
            is_peak = resp >= neigh
            flat = jnp.where(is_peak, resp, -jnp.inf).reshape(b, -1)
            strength, idx = jax.lax.top_k(flat, self.k)
            t_idx = idx // self.n_rho
            r_idx = idx % self.n_rho
            theta = t_idx.astype(jnp.float32) * (180.0 / self.n_theta)
            rho = r_idx.astype(jnp.float32) * self.rho_scale - radius
            # IQ: mean response of the k detected bands (the OIM Hough-IQ
            # definition); band_count: peaks within 2x of the strongest.
            finite = jnp.isfinite(strength)
            s = jnp.where(finite, strength, 0.0)
            iq = s.sum(axis=1) / jnp.maximum(finite.sum(axis=1), 1)
            count = (
                (s >= 0.5 * s[:, :1]) & finite & (s > 0)
            ).sum(axis=1)
            return theta, rho, s, iq, count

        self._run = jax.jit(_run)

    def __call__(self, patterns: np.ndarray) -> BandDetection:
        x = np.asarray(patterns)
        if x.ndim == 4:
            x = x[..., 0]
        if x.shape[1:] != self.shape:
            raise ValueError(
                f"expected {self.shape} frames, got {x.shape[1:]}"
            )
        from latice_tpu.data.datamodule import padded_batches

        pending = [
            (n, self._run(self._a_dev, self._mask_dev, jnp.asarray(chunk)))
            for n, chunk in padded_batches(x, self.batch_size)
        ]
        outs = [tuple(np.asarray(r[:n]) for r in res) for n, res in pending]
        theta, rho, s, iq, count = (
            np.concatenate([o[i] for o in outs]) for i in range(5)
        )
        return BandDetection(
            theta_deg=theta.astype(np.float64),
            rho_px=rho.astype(np.float64),
            strength=s.astype(np.float64),
            iq=iq.astype(np.float64),
            band_count=count.astype(np.int64),
        )
