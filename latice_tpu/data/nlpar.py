"""NLPAR-style neighborhood pattern averaging for noisy EBSD scans.

Re-implements the non-local pattern averaging scheme of Brewick, Wright &
Rowenhorst (Ultramicroscopy 200, 2019) as batched XLA programs: each scan
point's pattern is replaced by a similarity-weighted average of the patterns
in its ``(2r+1) x (2r+1)`` spatial neighborhood, with weights derived from a
per-point noise estimate so that (a) identical-orientation neighbors average
with near-uniform weight — a ~(2r+1)^2-fold noise reduction inside grains —
while (b) across grain boundaries the pattern distance exceeds the noise
floor and the weight collapses to ~0, preserving the boundary. Low-dose /
high-speed acquisitions become indexable that would otherwise fail consensus.

The exact weighting used here (documented because implementations differ in
normalization details):

    d2[i,j]    = || p_i - p_j ||^2                    (sum over n pixels)
    sigma2[i]  = min_{j in N4(i)} d2[i,j] / (2 n)     (noise variance: for
                 same-orientation neighbors E[d2] = 2 n sigma^2)
    s2[i,j]    = (sigma2[i] + sigma2[j]) / 2
    lam[i,j]   = max(d2[i,j] - 2 n s2, 0) / (s2 * sqrt(8 n))
                 (z-score of d2 against its same-pattern expectation;
                 Var[d2] = 8 n sigma^4 for Gaussian noise)
    w[i,j]     = exp(-lam / h^2),  w[i,i] = 1

so ``h`` (the paper's smoothing parameter) is in units of noise standard
deviations: h = 1 keeps averaging aggressive only where patterns agree to
within ~1 sigma of the noise-induced distance.

TPU design: the scan streams through a jitted slab kernel in row chunks with
``r``-row halos — the full ``(R, C, n)`` float scan never needs to reside in
HBM — and every neighbor distance is an elementwise multiply-reduce between
statically-shifted views (no gathers, no dynamic shapes; XLA fuses the
reduction into the multiply). Out-of-scan neighbors are masked, not padded,
so border sigma estimates never see self-copies (which would drive the noise
estimate to zero).

The reference has no denoising stage at all; this is beyond-reference
capability (its data path is raw ``np.load`` → transform,
reference data_module.py:70-78).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["nlpar_denoise", "estimate_noise_sigma"]


def _offsets(radius: int) -> list[tuple[int, int]]:
    return [
        (di, dj)
        for di in range(-radius, radius + 1)
        for dj in range(-radius, radius + 1)
    ]


def _shift(xp: jax.Array, di: int, dj: int, r: int, rows: int, cols: int):
    """Static-slice view of the r-padded array aligned at offset (di, dj)."""
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(xp, r + di, r + di + rows, axis=0),
        r + dj,
        r + dj + cols,
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("n_pixels",))
def _sigma2_slab(xp, maskp, n_pixels):
    """Per-point noise variance over a 1-halo slab.

    xp: (rows+2, cols+2, n) patterns, edge rows/cols are don't-care;
    maskp: (rows+2, cols+2) validity. Returns (rows, cols) sigma^2.
    """
    rows, cols = xp.shape[0] - 2, xp.shape[1] - 2
    center = _shift(xp, 0, 0, 1, rows, cols)
    best = jnp.full((rows, cols), jnp.inf, jnp.float32)
    for di, dj in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        nb = _shift(xp, di, dj, 1, rows, cols)
        d2 = jnp.sum((center - nb) ** 2, axis=-1)
        valid = _shift(maskp[..., None], di, dj, 1, rows, cols)[..., 0] > 0
        best = jnp.minimum(best, jnp.where(valid, d2, jnp.inf))
    # An isolated point (no valid neighbor — a 1x1 scan) gets sigma^2 = 0:
    # its weights then only keep exact duplicates, i.e. itself.
    best = jnp.where(jnp.isfinite(best), best, 0.0)
    return best / (2.0 * n_pixels)


@functools.partial(jax.jit, static_argnames=("radius", "n_pixels"))
def _nlpar_slab(xp, s2p, maskp, h, *, radius, n_pixels):
    """Weighted-average one row slab.

    xp: (rows+2r, cols+2r, n) patterns; s2p/maskp: matching (rows+2r,
    cols+2r) sigma^2 / validity. Returns the (rows, cols, n) denoised slab.
    """
    r = radius
    rows, cols = xp.shape[0] - 2 * r, xp.shape[1] - 2 * r
    center = _shift(xp, 0, 0, r, rows, cols)
    s2_c = _shift(s2p[..., None], 0, 0, r, rows, cols)[..., 0]
    inv_var_norm = 1.0 / math.sqrt(8.0 * n_pixels)
    acc = jnp.zeros_like(center)
    wsum = jnp.zeros((rows, cols), jnp.float32)
    for di, dj in _offsets(r):
        if di == 0 and dj == 0:
            acc = acc + center
            wsum = wsum + 1.0  # w[i,i] = 1 by construction (d2 = 0)
            continue
        nb = _shift(xp, di, dj, r, rows, cols)
        d2 = jnp.sum((center - nb) ** 2, axis=-1)
        s2_n = _shift(s2p[..., None], di, dj, r, rows, cols)[..., 0]
        s2 = 0.5 * (s2_c + s2_n)
        lam = jnp.maximum(d2 - 2.0 * n_pixels * s2, 0.0) * (
            inv_var_norm / jnp.maximum(s2, 1e-30)
        )
        w = jnp.exp(-lam / (h * h))
        valid = _shift(maskp[..., None], di, dj, r, rows, cols)[..., 0] > 0
        w = jnp.where(valid, w, 0.0)
        acc = acc + w[..., None] * nb
        wsum = wsum + w
    return acc / wsum[..., None]


def estimate_noise_sigma(patterns: np.ndarray) -> np.ndarray:
    """Per-point noise standard deviation of a ``(R, C, H, W)`` scan.

    The NLPAR noise model: for two patterns of the same orientation
    differing only by i.i.d. noise, ``E[||p_i - p_j||^2] = 2 n sigma^2``;
    the minimum over the 4-connected neighbors is therefore a (slightly
    low-biased) estimate of ``2 n sigma^2`` wherever any neighbor shares the
    orientation. Useful on its own as an acquisition-quality map.
    """
    x = np.asarray(patterns, np.float32)
    if x.ndim != 4:
        raise ValueError(f"expected (R, C, H, W) scan, got {x.shape}")
    r_, c_, h_, w_ = x.shape
    n = h_ * w_
    flat = jnp.asarray(x.reshape(r_, c_, n))
    xp = jnp.pad(flat, ((1, 1), (1, 1), (0, 0)))
    maskp = jnp.pad(jnp.ones((r_, c_), jnp.float32), ((1, 1), (1, 1)))
    s2 = _sigma2_slab(xp, maskp, n)
    return np.sqrt(np.asarray(s2))


def nlpar_denoise(
    patterns: np.ndarray,
    search_radius: int = 1,
    h: float = 1.0,
    chunk_rows: int | None = None,
    hot_pixel_threshold: float | None = None,
) -> np.ndarray:
    """Denoise a ``(R, C, H, W)`` scan by neighborhood pattern averaging.

    Args:
        patterns: the scan, any float/integer dtype (computed in float32;
            the output keeps float32 — feed it to `IndexPipeline` directly
            or rescale as needed).
        search_radius: neighborhood half-width r (window ``(2r+1)^2``);
            r=1 (3x3) is the paper's default, r=2 for very low dose.
        h: smoothing strength in noise standard deviations. 1.0 is
            conservative (averages only statistically-identical patterns);
            2-3 trades orientation resolution for more noise reduction.
        chunk_rows: scan rows per jitted slab (default: sized so a slab is
            ~256 MB). The full float scan never materializes on device.
        hot_pixel_threshold: optionally run `preprocess.fix_hot_pixels` on
            each slab BEFORE averaging. Order matters: unrepaired hot
            pixels inflate every pattern distance (so the noise estimate
            reads high and cross-grain weights open up) and the averaging
            smears the spike into the whole window — repairing after NLPAR
            cannot undo that. Set this whenever the downstream preprocess
            recipe repairs hot pixels.

    Returns:
        The denoised ``(R, C, H, W)`` float32 scan.
    """
    x = np.asarray(patterns, np.float32)
    if x.ndim != 4:
        raise ValueError(f"expected (R, C, H, W) scan, got {x.shape}")
    if search_radius < 1:
        raise ValueError("search_radius must be >= 1")
    if h <= 0:
        raise ValueError("h must be positive")
    if hot_pixel_threshold is not None:
        from latice_tpu.data.preprocess import fix_hot_pixels

        fix = jax.jit(
            functools.partial(fix_hot_pixels, threshold=hot_pixel_threshold)
        )
        flat_rows = x.reshape(-1, *x.shape[2:])
        # Slab through the same ~256 MB budget as the main passes.
        step = max(1, int(256e6 / max(flat_rows[0].nbytes, 1)))
        fixed = [
            np.asarray(fix(jnp.asarray(flat_rows[i : i + step])))
            for i in range(0, len(flat_rows), step)
        ]
        x = np.concatenate(fixed).reshape(x.shape)
    r_, c_, h_, w_ = x.shape
    n = h_ * w_
    rad = search_radius
    flat = x.reshape(r_, c_, n)

    if chunk_rows is None:
        # ~256 MB slabs (f32), at least one row, plus halo rows on top.
        chunk_rows = max(1, int(256e6 / max(c_ * n * 4, 1)))
    chunk_rows = min(chunk_rows, r_)

    # Pass 1: the sigma field, streamed with 1-row halos.
    mask = np.ones((r_, c_), np.float32)
    maskp1 = np.pad(mask, 1)
    flatp1 = np.pad(flat, ((1, 1), (1, 1), (0, 0)))
    s2 = np.empty((r_, c_), np.float32)
    step = max(chunk_rows, 1)
    for row0 in range(0, r_, step):
        rows = min(step, r_ - row0)
        out_rows = np.asarray(
            _sigma2_slab(
                jnp.asarray(_slab(flatp1, row0, step + 2)),
                jnp.asarray(_slab(maskp1, row0, step + 2)),
                n,
            )
        )
        s2[row0 : row0 + rows] = out_rows[:rows]

    # Pass 2: the weighted average, streamed with r-row halos.
    flatp = np.pad(flat, ((rad, rad), (rad, rad), (0, 0)))
    s2p = np.pad(s2, rad)
    maskp = np.pad(mask, rad)
    out = np.empty_like(flat)
    height = step + 2 * rad
    for row0 in range(0, r_, step):
        rows = min(step, r_ - row0)
        out_rows = np.asarray(
            _nlpar_slab(
                jnp.asarray(_slab(flatp, row0, height)),
                jnp.asarray(_slab(s2p, row0, height)),
                jnp.asarray(_slab(maskp, row0, height)),
                jnp.float32(h),
                radius=rad,
                n_pixels=n,
            )
        )
        out[row0 : row0 + rows] = out_rows[:rows]
    return out.reshape(r_, c_, h_, w_)


def _slab(arr_padded: np.ndarray, row0: int, height: int) -> np.ndarray:
    """Slice rows [row0, row0 + height) out of an already halo-padded array,
    zero-padding the bottom when the scan tail is short — every slab then has
    the same static shape, so the kernel compiles exactly once."""
    slab = arr_padded[row0 : row0 + height]
    if len(slab) < height:
        pad = [(0, height - len(slab))] + [(0, 0)] * (arr_padded.ndim - 1)
        slab = np.pad(slab, pad)
    return slab
