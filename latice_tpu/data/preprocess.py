"""Device-side EBSD pattern preprocessing: background correction, hot-pixel
repair, contrast normalization — as jittable, batched XLA ops.

Raw detector patterns are dominated by the static detector response
(vignetting, phosphor scratches) and the smooth per-pattern diffusion
background; indexing them without correction degrades latent separation
badly. The reference has no preprocessing beyond the resize/scale transform
(reference data_module.py:17-33) and leaves background correction to
external tools; this module closes that gap the TPU way: every op is a pure
function over the whole ``(B, H, W, C)`` stack, composable into the
`IndexPipeline`'s single jitted program via ``IndexPipeline(preprocess=...)``
so correction runs on device, fused with the encode, keeping the uint8
host-link fast path intact.

Design notes (TPU-first):
* Gaussian blurs are separable band-matrix matmuls (``(W_pad, W)`` weight
  matrices built once at trace time), not generic convolutions — small-kernel
  1-channel convs lower poorly while these ride the MXU.
* The hot-pixel median uses 8 shifted views + an 8-element sort along a new
  minor axis — static shapes, no gathers.
* Histogram equalization is the exact rank/CDF transform computed with a
  sort-based ``searchsorted`` (O(P log P) sort per pattern), not a
  scatter-add histogram — scatters and per-pixel table gathers are the slow
  paths on TPU.

All ops accept ``(..., H, W)`` or ``(..., H, W, C)`` float arrays and are
safe under ``jax.jit`` / ``vmap`` / sharding.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PreprocessConfig",
    "bin_patterns",
    "equalize_histogram",
    "estimate_static_background",
    "fix_hot_pixels",
    "gaussian_blur",
    "make_preprocess_fn",
    "normalize_patterns",
    "parse_preprocess_spec",
    "remove_dynamic_background",
    "remove_static_background",
]

_EPS = 1e-8


def _with_channel(x: jax.Array) -> tuple[jax.Array, bool]:
    """Canonicalize to (..., H, W, C); report whether C was added.

    A trailing axis of size <= 4 is taken to be channels (1 for grayscale,
    3 for RGB); anything wider is a pattern axis — disambiguating
    ``(N, H, W)`` stacks from ``(H, W, C)`` images, since real patterns are
    never <= 4 px wide.
    """
    if x.ndim >= 3 and x.shape[-1] <= 4:
        return x, False
    return x[..., None], True


def _per_pattern(x: jax.Array, fn) -> jax.Array:
    """Apply a reduction over the (H, W, C) axes, keeping dims for broadcast."""
    return fn(x, axis=(-3, -2, -1), keepdims=True)


def _gaussian_kernel(sigma: float, truncate: float) -> np.ndarray:
    """1-D Gaussian taps with scipy.ndimage's radius convention
    (``int(truncate * sigma + 0.5)``), normalized to sum 1."""
    radius = max(1, int(truncate * float(sigma) + 0.5))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / float(sigma)) ** 2)
    return (k / k.sum()).astype(np.float32)


def _band_matrix(n: int, taps: np.ndarray) -> np.ndarray:
    """(n + 2r, n) matrix whose column j holds the taps centered at row j+r,
    so ``x_padded @ M`` is a VALID 1-D correlation along that axis."""
    r = (len(taps) - 1) // 2
    m = np.zeros((n + 2 * r, n), dtype=np.float32)
    for t in range(len(taps)):
        m[np.arange(n) + t, np.arange(n)] = taps[t]
    return m


def gaussian_blur(
    patterns: jax.Array, sigma: float, truncate: float = 4.0
) -> jax.Array:
    """Separable Gaussian blur over the (H, W) axes.

    Matches ``scipy.ndimage.gaussian_filter(..., mode="reflect")`` (scipy's
    "reflect" is numpy's "symmetric" edge handling) to float32 roundoff. The
    two 1-D passes are band-matrix matmuls so the blur runs on the MXU.
    """
    x, squeeze = _with_channel(patterns)
    h, w = x.shape[-3], x.shape[-2]
    kh = _gaussian_kernel(sigma, truncate)
    r = (len(kh) - 1) // 2
    pad = [(0, 0)] * (x.ndim - 3) + [(r, r), (r, r), (0, 0)]
    xp = jnp.pad(x.astype(jnp.float32), pad, mode="symmetric")
    mh = jnp.asarray(_band_matrix(h, kh))
    mw = jnp.asarray(_band_matrix(w, kh))
    # Blur along H: contract the padded H axis with the band matrix.
    # HIGHEST precision: the TPU MXU's default bf16 inputs cost ~1.5e-3
    # error vs scipy (measured on-chip); background estimates should be
    # exact and these matmuls are tiny/bandwidth-bound anyway.
    hi = jax.lax.Precision.HIGHEST
    y = jnp.einsum("...hwc,hg->...gwc", xp, mh, precision=hi)
    y = jnp.einsum("...hwc,wv->...hvc", y, mw, precision=hi)
    return y[..., 0] if squeeze else y


def remove_static_background(
    patterns: jax.Array,
    background: jax.Array | np.ndarray,
    mode: str = "divide",
) -> jax.Array:
    """Correct the fixed detector response (vignetting, phosphor defects).

    ``divide`` rescales by ``mean(bg) / bg`` so the output keeps the input's
    intensity scale; ``subtract`` removes ``bg - mean(bg)`` for the same
    reason. Follow with `normalize_patterns` to land back in [0, 1].

    Args:
        patterns: ``(..., H, W[, C])`` float stack.
        background: ``(H, W)`` or ``(H, W, C)`` static frame — typically the
            scan mean from `estimate_static_background`.
        mode: ``"divide"`` (multiplicative response, the usual detector
            model) or ``"subtract"`` (additive).
    """
    if mode not in ("divide", "subtract"):
        raise ValueError(f"mode must be 'divide' or 'subtract', got {mode!r}")
    x, squeeze = _with_channel(patterns)
    bg, _ = _with_channel(jnp.asarray(background, jnp.float32))
    mean = jnp.mean(bg)
    if mode == "divide":
        y = x * (mean / (bg + _EPS))
    else:
        y = x - (bg - mean)
    return y[..., 0] if squeeze else y


def remove_dynamic_background(
    patterns: jax.Array,
    sigma: float | None = None,
    mode: str = "divide",
    truncate: float = 4.0,
) -> jax.Array:
    """Flatten each pattern's smooth diffusion background.

    Estimates the per-pattern background as a heavy Gaussian blur of the
    pattern itself and removes it, leaving the Kikuchi band contrast. The
    default ``sigma = H / 8`` keeps bands (a few px wide) while tracking the
    slow intensity ramp.

    Args:
        patterns: ``(..., H, W[, C])`` float stack.
        sigma: blur width in px; defaults to ``H / 8``.
        mode: ``"divide"`` (ratio to background, scale-invariant band
            contrast) or ``"subtract"``.
    """
    if mode not in ("divide", "subtract"):
        raise ValueError(f"mode must be 'divide' or 'subtract', got {mode!r}")
    x, squeeze = _with_channel(patterns)
    if sigma is None:
        sigma = x.shape[-3] / 8.0
    bg = gaussian_blur(x, sigma, truncate=truncate)
    if mode == "divide":
        y = x / (bg + _EPS)
    else:
        y = x - bg
    return y[..., 0] if squeeze else y


def fix_hot_pixels(
    patterns: jax.Array, threshold: float = 5.0
) -> jax.Array:
    """Replace impulsive outlier pixels with their 8-neighbour median.

    A pixel is hot (or dead) when it deviates from its neighbourhood median
    by more than ``threshold`` times the pattern's robust noise scale
    (1.4826 x the median absolute deviation of the residual map). Edge pixels
    use edge-replicated neighbourhoods. Static shapes throughout: the median
    is an 8-element sort along a new minor axis, no gathers.
    """
    x, squeeze = _with_channel(patterns)
    x = x.astype(jnp.float32)
    xp = jnp.pad(
        x, [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)], mode="edge"
    )
    h, w = x.shape[-3], x.shape[-2]
    views = [
        xp[..., i : i + h, j : j + w, :]
        for i in range(3)
        for j in range(3)
        if not (i == 1 and j == 1)
    ]
    neigh = jnp.stack(views, axis=-1)  # (..., H, W, C, 8)
    s = jnp.sort(neigh, axis=-1)
    med = 0.5 * (s[..., 3] + s[..., 4])
    resid = x - med
    # Robust noise scale = 1.4826 * median(|resid|): median-filter residuals
    # are symmetric about ~0 on clean pixels, so centering the MAD on the
    # residual median would cost a second full-pattern sort for a
    # sub-roundoff change (measured: each sort is ~1/3 of this op's 38 ms
    # at b512 on v5e).
    mad = _per_pattern(jnp.abs(resid), jnp.median)
    scale = 1.4826 * mad + _EPS
    y = jnp.where(jnp.abs(resid) > threshold * scale, med, x)
    return y[..., 0] if squeeze else y


def normalize_patterns(
    patterns: jax.Array,
    method: str = "minmax",
    clip_sigma: float | None = None,
) -> jax.Array:
    """Per-pattern intensity normalization.

    Args:
        patterns: ``(..., H, W[, C])`` float stack.
        method: ``"minmax"`` rescales each pattern to [0, 1] (the VAE input
            contract); ``"zscore"`` standardizes to mean 0 / std 1 (NOT in
            [0, 1] — for custom pipelines).
        clip_sigma: optionally clip to ``median ± k·σ_robust`` first, with
            ``σ_robust = IQR / 1.349`` — a robust contrast stretch that stops
            one hot pixel from compressing the whole pattern's dynamic range
            (robust statistics on purpose: the outlier being clipped would
            inflate a plain mean/std bound past itself). Median and quartiles
            come from ONE sort per pattern; a MAD would need a second.
    """
    if method not in ("minmax", "zscore"):
        raise ValueError(f"method must be 'minmax' or 'zscore', got {method!r}")
    x, squeeze = _with_channel(patterns)
    x = x.astype(jnp.float32)
    if clip_sigma is not None:
        flat = x.reshape(x.shape[:-3] + (-1,))
        s = jnp.sort(flat, axis=-1)
        p = s.shape[-1]
        med = s[..., p // 2]
        sd = (s[..., (3 * p) // 4] - s[..., p // 4]) / 1.349 + _EPS
        shape = med.shape + (1, 1, 1)
        med, sd = med.reshape(shape), sd.reshape(shape)
        x = jnp.clip(x, med - clip_sigma * sd, med + clip_sigma * sd)
    if method == "zscore":
        mu = _per_pattern(x, jnp.mean)
        sd = jnp.sqrt(_per_pattern(x, jnp.var))
        y = (x - mu) / (sd + _EPS)
    else:
        lo = _per_pattern(x, jnp.min)
        hi = _per_pattern(x, jnp.max)
        y = (x - lo) / (hi - lo + _EPS)
    return y[..., 0] if squeeze else y


def equalize_histogram(patterns: jax.Array) -> jax.Array:
    """Exact per-pattern histogram equalization (rank/CDF transform).

    Maps each pixel to its empirical CDF value ``P(X <= x)`` within its own
    pattern, so equal intensities map equally (ties share a rank) and the
    output fills (0, 1] with an approximately uniform histogram.

    Implementation: rank transform with tie-sharing — one argsort, a
    reverse ``cummin`` that propagates each tie run's last index back over
    the run, and an inverse-permutation gather (wide rows, the TPU-safe
    gather shape). Equivalent to ``searchsorted(sort(x), x, 'right') / P``.
    This is the expensive optional stage (~200 ms at b512 on v5e — the
    per-pattern 16k-element sorts dominate and a searchsorted formulation
    measures the same); prefer ``clip_sigma`` + minmax (~9 ms) when a full
    histogram remap isn't required.
    """
    x, squeeze = _with_channel(patterns)
    x = x.astype(jnp.float32)
    shape = x.shape
    flat = x.reshape((-1, math.prod(shape[-3:])))
    p = flat.shape[-1]
    idx = jnp.arange(p, dtype=jnp.int32)

    def _eq(row):
        order = jnp.argsort(row)
        s = row[order]
        run_end = jnp.concatenate([s[1:] != s[:-1], jnp.ones((1,), bool)])
        # Last index of each tie run: reverse-cummin over boundary indices.
        cand = jnp.where(run_end, idx, p - 1)
        last = jax.lax.cummin(cand[::-1])[::-1]
        eq_sorted = (last + 1).astype(jnp.float32) / p
        inv = jnp.argsort(order)
        return eq_sorted[inv]

    y = jax.vmap(_eq)(flat).reshape(shape)
    return y[..., 0] if squeeze else y


def bin_patterns(patterns: jax.Array, factor: int) -> jax.Array:
    """Average-pool the (H, W) axes by ``factor`` (detector binning).

    H and W must divide by ``factor``. Binning raises SNR and cuts encode
    FLOPs 4x per 2x factor; the model's ``image_size`` must match the binned
    shape.
    """
    x, squeeze = _with_channel(patterns)
    h, w, c = x.shape[-3], x.shape[-2], x.shape[-1]
    if h % factor or w % factor:
        raise ValueError(f"pattern {h}x{w} not divisible by bin factor {factor}")
    lead = x.shape[:-3]
    y = x.reshape(lead + (h // factor, factor, w // factor, factor, c))
    y = y.astype(jnp.float32).mean(axis=(-4, -2))
    return y[..., 0] if squeeze else y


def estimate_static_background(chunks) -> np.ndarray:
    """Mean pattern over a scan — the static background estimate.

    Accepts a single ``(N, H, W[, C])`` stack or any iterable of such chunks
    (the HDF5 streaming case: `data.h5io.iter_pattern_batches`), accumulating
    a running sum on host so the full scan never materializes.
    """
    if isinstance(chunks, np.ndarray) or hasattr(chunks, "shape"):
        chunks = [chunks]
    total = None
    count = 0
    for chunk in chunks:
        arr = np.asarray(chunk, dtype=np.float64)
        if arr.ndim == 2:
            arr = arr[None]
        total = arr.sum(axis=0) if total is None else total + arr.sum(axis=0)
        count += len(arr)
    if not count:
        raise ValueError("no patterns to estimate a background from")
    return (total / count).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    """Declarative preprocessing recipe for `make_preprocess_fn`.

    Stages run in the fixed order: hot-pixel repair → static background →
    dynamic background → robust clip (``clip_sigma``) → histogram
    equalization → normalization → binning. Every stage is optional; the
    default config is the identity.

    Attributes:
        hot_pixel_threshold: enable `fix_hot_pixels` at this threshold.
        static_background: ``(H, W)`` frame for `remove_static_background`.
        static_mode: "divide" | "subtract".
        dynamic_sigma: enable `remove_dynamic_background`; ``"auto"`` picks
            H/8 at trace time.
        dynamic_mode: "divide" | "subtract".
        equalize: exact histogram equalization (implies [0, 1] output).
        normalize: "minmax" | "zscore" | None. Applied after the background
            stages; defaults to "minmax" whenever a background stage is
            enabled and neither `equalize` nor `clip_sigma` already maps the
            output to [0, 1], so the VAE's input contract survives the
            correction arithmetic.
        clip_sigma: robust contrast-stretch clip (+ minmax rescale), run as
            its own stage BEFORE equalization so outliers cannot skew the
            histogram remap.
        bin_factor: average-pool the output by this factor (model image_size
            must match).
    """

    hot_pixel_threshold: float | None = None
    static_background: np.ndarray | None = None
    static_mode: str = "divide"
    dynamic_sigma: float | str | None = None
    dynamic_mode: str = "divide"
    equalize: bool = False
    normalize: str | None = None
    clip_sigma: float | None = None
    bin_factor: int | None = None


def parse_preprocess_spec(spec: str) -> PreprocessConfig:
    """Parse the CLI's compact preprocessing spec into a `PreprocessConfig`.

    Grammar: comma-separated ``key[=value]`` entries, e.g.
    ``"hotpixels=5,static=bg.npy,dynamic=auto,clip=4,bin=2"``. Keys:

    - ``hotpixels=<threshold>`` — `fix_hot_pixels`
    - ``static=<frame.npy>`` — `remove_static_background` (the .npy loads
      here); ``static=auto`` defers to the caller, which must replace the
      placeholder with `estimate_static_background` of the scan (the query
      CLI does; contexts without the full scan upfront reject it)
    - ``static-mode=divide|subtract`` (default divide)
    - ``dynamic=auto|<sigma>`` — `remove_dynamic_background`
    - ``dynamic-mode=divide|subtract`` (default divide)
    - ``equalize`` — exact histogram equalization
    - ``normalize=minmax|zscore`` (auto-minmax after background stages)
    - ``clip=<sigma>`` — robust contrast-stretch clip
    - ``bin=<factor>`` — detector binning
    """
    kw: dict[str, object] = {}
    for raw in spec.split(","):
        entry = raw.strip()
        if not entry:
            continue
        key, _, val = entry.partition("=")
        key = key.strip().lower()
        val = val.strip()
        try:
            if key == "hotpixels":
                kw["hot_pixel_threshold"] = float(val)
            elif key == "static":
                kw["static_background"] = "auto" if val == "auto" else np.load(val)
            elif key == "static-mode":
                kw["static_mode"] = val
            elif key == "dynamic":
                kw["dynamic_sigma"] = "auto" if val == "auto" else float(val)
            elif key == "dynamic-mode":
                kw["dynamic_mode"] = val
            elif key == "equalize":
                kw["equalize"] = True
            elif key == "normalize":
                kw["normalize"] = val
            elif key == "clip":
                kw["clip_sigma"] = float(val)
            elif key == "bin":
                kw["bin_factor"] = int(val)
            else:
                raise ValueError(f"unknown preprocess key {key!r} in {spec!r}")
        except (TypeError, ValueError) as e:
            if "unknown preprocess key" in str(e):
                raise
            raise ValueError(
                f"bad value for preprocess key {key!r}: {val!r}"
            ) from e
    cfg = PreprocessConfig(**kw)
    _validate_config(cfg)  # catch bad modes at parse time
    return cfg


def _validate_config(cfg: PreprocessConfig) -> None:
    if cfg.static_mode not in ("divide", "subtract"):
        raise ValueError(f"bad static_mode {cfg.static_mode!r}")
    if cfg.dynamic_mode not in ("divide", "subtract"):
        raise ValueError(f"bad dynamic_mode {cfg.dynamic_mode!r}")
    if cfg.normalize not in (None, "minmax", "zscore"):
        raise ValueError(f"bad normalize {cfg.normalize!r}")


def make_preprocess_fn(
    config: PreprocessConfig,
) -> Callable[[jax.Array], jax.Array]:
    """Compose a `PreprocessConfig` into one jittable ``(B,H,W,C)→(B,H,W,C)``
    pure function, suitable for ``IndexPipeline(preprocess=...)`` (where it
    fuses into the encode program) or standalone ``jax.jit`` use."""
    cfg = config
    _validate_config(cfg)
    if isinstance(cfg.static_background, str):
        raise ValueError(
            "static_background='auto' is a placeholder: resolve it with "
            "data.estimate_static_background(scan) before compiling (the "
            "query CLI does this; serving has no scan to estimate from)"
        )
    static_bg = (
        None
        if cfg.static_background is None
        else np.asarray(cfg.static_background, np.float32)
    )
    normalize = cfg.normalize
    corrected = static_bg is not None or cfg.dynamic_sigma is not None
    already_unit = cfg.equalize or cfg.clip_sigma is not None
    if normalize is None and corrected and not already_unit:
        normalize = "minmax"

    def preprocess(x: jax.Array) -> jax.Array:
        if cfg.hot_pixel_threshold is not None:
            x = fix_hot_pixels(x, cfg.hot_pixel_threshold)
        if static_bg is not None:
            x = remove_static_background(x, static_bg, cfg.static_mode)
        if cfg.dynamic_sigma is not None:
            sigma = (
                x.shape[-3] / 8.0
                if isinstance(cfg.dynamic_sigma, str)
                else float(cfg.dynamic_sigma)
            )
            x = remove_dynamic_background(x, sigma, cfg.dynamic_mode)
        if cfg.clip_sigma is not None:
            # An independent stage (not folded into the final normalize):
            # it must run BEFORE equalization, and must run at all when
            # equalize/normalize are configured differently.
            x = normalize_patterns(x, "minmax", clip_sigma=cfg.clip_sigma)
        if cfg.equalize:
            x = equalize_histogram(x)
        if normalize is not None:
            x = normalize_patterns(x, normalize)
        if cfg.bin_factor is not None and cfg.bin_factor > 1:
            x = bin_patterns(x, cfg.bin_factor)
        return x

    return preprocess
