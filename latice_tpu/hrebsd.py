"""HR-EBSD: cross-correlation elastic strain + lattice rotation mapping.

High-angular-resolution EBSD (Wilkinson–Meaden–Dingley 2006) measures the
*relative* deformation between a reference pattern and each map pattern from
sub-pixel shifts of many small regions of interest (ROIs): an elastic strain
or small lattice rotation moves every Kikuchi feature by a predictable
screen shift, so ~20 ROI shifts over-determine the 8 observable components
of the displacement-gradient tensor to ~1e-4 strain sensitivity — the
capability behind CrossCourt / OIM Analysis' HR-EBSD module and kikuchipy's
strain work. The reference repo (`poyentung/ebsd-vae`) has no strain plane
at all (its scope ends at orientation indexing, latice/data_module.py);
this module extends the analysis plane the same way `crystal.gnd` does,
consuming the same detector geometry the simulation stack defines
(sim/geometry.py).

TPU-first design (no per-ROI host loops anywhere):

- ROI extraction is static slicing (centers are compile-time constants),
  stacked to one ``(B·R, S, S)`` panel batch.
- Shift measurement is batched 2-D FFT cross-correlation with an annular
  Fourier filter; the sub-pixel stage is the Guizar-Sicairos *matrix-DFT*
  upsampling — two small complex matmuls per ROI evaluated only around the
  coarse peak, so the MXU does the upsampling and no dense zoom-FFT image
  ever exists.
- The deformation solve is one batched 8x8 weighted normal-equation solve
  per pattern (the design matrix depends only on ROI geometry and is built
  once on the host).
- The traction-free closure rotates the crystal stiffness tensor per
  pattern with one einsum and solves for the unobservable hydrostatic
  gauge in closed form.

Geometry (detector frame of sim/geometry.py: x right, y up, z from sample
into detector, widths as units). A screen point sits at ``r = (x, y, D)``
with ``D = geometry.dd``. Under a small displacement-gradient tensor ``A``
(deformed direction ``r' ∝ (I + A) r``), the gnomonic re-projection onto
the plane ``z = D`` shifts the feature by, to first order,

    q = A r − ((A r)·ẑ / D) r ,            q_z ≡ 0,

which is invariant under ``A → A + λI`` — pattern shifts cannot see the
hydrostatic component. The solve therefore fixes the gauge ``a33 = 0`` and,
when elastic constants are supplied, restores ``λ`` from the traction-free
surface condition ``σ_nn = 0`` (n̂ = sample normal = the tilt-rotated ẑ).

Validity: the first-order solve alone covers strains to ~1e-2 and
rotations to ~1 degree (the classic HR-EBSD regime). Beyond that the
CrossCourt-style **iterative remapping pass** (Britton & Wilkinson 2012)
takes over: `hrebsd_map(remap_iterations=N)` re-projects each target
pattern through the recovered deformation gradient (`remap_patterns` — a
jitted per-pixel gnomonic warp, the inverse of the geometry model in
sim/geometry.py), re-correlates against the reference, and composes
``F_new = F_est (I + A_res)`` — so strain stays accurate to ~1e-4 under
lattice rotations of several degrees (pinned by test). Default is one
remap pass; `remap_iterations=0` restores the bare first-order solve.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.crystal.quaternion import quat_to_matrix
from latice_tpu.sim.geometry import DetectorGeometry

__all__ = [
    "HrebsdResult",
    "default_roi_centers",
    "hrebsd_map",
    "measure_roi_shifts",
    "remap_patterns",
    "roi_position_vectors",
    "solve_deformation",
    "von_mises_strain",
]


class HrebsdResult(NamedTuple):
    """Per-pattern HR-EBSD output (``B`` patterns, ``R`` ROIs).

    Attributes:
        a: ``(B, 3, 3)`` displacement-gradient tensor, detector frame.
            Gauge: traction-free when stiffness was supplied, else
            ``a[2, 2] = 0``.
        strain: ``(B, 3, 3)`` elastic strain ``sym(A)``.
        rotation: ``(B, 3)`` lattice-rotation vector (radians,
            right-handed about detector x/y/z) from ``skew(A)``.
        rotation_deg: ``(B,)`` rotation magnitude, degrees — values near
            or past ~1 deg leave the first-order validity range.
        stress: ``(B, 3, 3)`` stress (stiffness units, typically GPa) via
            Hooke's law, or None when no stiffness was supplied.
        shifts_px: ``(B, R, 2)`` measured ROI shifts, pixels, as
            ``(d_row, d_col)`` (row grows downward).
        quality: ``(B, R)`` normalized cross-correlation peak heights in
            [0, 1] — the per-ROI confidence used as solve weights.
        residual_px: ``(B,)`` RMS of (measured − modeled) ROI shifts in
            pixels — the fit's self-consistency diagnostic.
    """

    a: np.ndarray
    strain: np.ndarray
    rotation: np.ndarray
    rotation_deg: np.ndarray
    stress: np.ndarray | None
    shifts_px: np.ndarray
    quality: np.ndarray
    residual_px: np.ndarray


def default_roi_centers(
    geometry: DetectorGeometry,
    roi_size: int = 64,
    n_rings: int = 2,
    per_ring: Sequence[int] = (8, 12),
    margin: int = 2,
) -> np.ndarray:
    """Standard HR-EBSD ROI layout: one ROI on the pattern center plus
    concentric rings out to the detector edge.

    Wide ROI spread is what conditions the solve: shifts from a
    deformation scale with the ROI's position vector, so rings near the
    edge separate the ``a3*`` (projective) terms from the in-plane ones.

    Returns ``(R, 2)`` float64 ``(row, col)`` pixel centers, clipped so
    every ROI window stays ``margin`` px inside the detector.
    """
    h, w = geometry.shape
    half = roi_size / 2
    # Pattern-center pixel (invert the pixel_directions convention).
    pc_col = geometry.pcx * w - 0.5
    pc_row = h - geometry.pcy * w - 0.5
    lo_r, hi_r = half + margin, h - half - margin
    lo_c, hi_c = half + margin, w - half - margin
    if lo_r > hi_r or lo_c > hi_c:
        raise ValueError(
            f"roi_size {roi_size} does not fit a {h}x{w} detector"
        )
    centers = [(np.clip(pc_row, lo_r, hi_r), np.clip(pc_col, lo_c, hi_c))]
    max_radius = min(
        pc_row - lo_r, hi_r - pc_row, pc_col - lo_c, hi_c - pc_col,
        (min(h, w) - roi_size) / 2 - margin,
    )
    if max_radius <= 0:
        raise ValueError(
            f"no room for ROI rings: roi_size {roi_size} on {h}x{w}"
        )
    for ring in range(n_rings):
        radius = max_radius * (ring + 1) / n_rings
        n = per_ring[min(ring, len(per_ring) - 1)]
        # Stagger successive rings so ROIs interleave azimuthally.
        phase = math.pi / n * (ring % 2)
        for k in range(n):
            ang = 2 * math.pi * k / n + phase
            centers.append(
                (
                    np.clip(pc_row - radius * math.sin(ang), lo_r, hi_r),
                    np.clip(pc_col + radius * math.cos(ang), lo_c, hi_c),
                )
            )
    return np.asarray(centers, np.float64)


def roi_position_vectors(
    geometry: DetectorGeometry, centers: np.ndarray
) -> np.ndarray:
    """``(R, 3)`` unnormalized screen vectors ``(x, y, D)`` of ROI centers,
    detector-plane frame, width units (the ``r`` of the shift model)."""
    h, w = geometry.shape
    c = np.asarray(centers, np.float64)
    x = (c[:, 1] + 0.5) / w - geometry.pcx
    y = (h - (c[:, 0] + 0.5)) / w - geometry.pcy
    return np.stack([x, y, np.full(len(c), geometry.dd)], axis=-1)


def _hann2(s: int) -> np.ndarray:
    wr = 0.5 - 0.5 * np.cos(2 * np.pi * (np.arange(s) + 0.5) / s)
    return (wr[:, None] * wr[None, :]).astype(np.float32)


def _annular_mask(s: int, f_min: float, f_max: float | None) -> np.ndarray:
    """Fourier-domain band-pass (cycles per ROI window): kills DC +
    background gradients below ``f_min`` and, when ``f_max`` is set, the
    noise-dominated band above it."""
    f = np.fft.fftfreq(s) * s  # cycles per window
    rad = np.hypot(f[:, None], f[None, :])
    mask = rad >= f_min
    if f_max is not None:
        mask &= rad <= f_max
    return mask.astype(np.float32)


def _static_rois(patterns, centers_px: tuple, roi_size: int):
    """``(B, H, W) → (B, R, S, S)`` by static slices (centers are
    compile-time constants, so this lowers to R slice ops — no dynamic
    gathers, per the backend landmine notes)."""
    half = roi_size // 2
    return jnp.stack(
        [
            patterns[:, r0 - half : r0 - half + roi_size,
                     c0 - half : c0 - half + roi_size]
            for r0, c0 in centers_px
        ],
        axis=1,
    )


def _pixel_screen_vectors(geometry: DetectorGeometry) -> np.ndarray:
    """``(H·W, 3)`` unnormalized screen vectors ``(x, y, D)`` of every
    pixel center, detector-plane frame, width units — the full-detector
    analogue of `roi_position_vectors` (host, once per geometry)."""
    h, w = geometry.shape
    x = (np.arange(w, dtype=np.float64) + 0.5) / w - geometry.pcx
    y = (h - (np.arange(h, dtype=np.float64) + 0.5)) / w - geometry.pcy
    grid = np.stack(
        [
            np.broadcast_to(x[None, :], (h, w)),
            np.broadcast_to(y[:, None], (h, w)),
            np.full((h, w), geometry.dd),
        ],
        axis=-1,
    )
    return grid.reshape(-1, 3).astype(np.float32)


@jax.jit
def _remap_core(x, f, rvec, pc):
    """Warp patterns by per-pattern deformation gradients F = I + A.

    The remapped pattern evaluates the target at the screen position the
    deformation maps each pixel to — ``remap(proj(r)) = target(proj(F r))``
    — so it coincides with the REFERENCE when F matches the true
    deformation (module docstring model, taken beyond first order).
    Bilinear sampling with edge clamping; ``take_along_axis`` on the
    flattened image is one wide batched gather (the per-(pattern, pixel)
    work is local, so the batch axis shards over a mesh with no
    collectives).

    Args:
        x: ``(B, H, W)`` patterns (any real dtype; uint8 widens here).
        f: ``(B, 3, 3)`` deformation gradients, detector-plane frame.
        rvec: ``(H·W, 3)`` pixel screen vectors in the REFERENCE
            geometry (`_pixel_screen_vectors`) — output pixels live in
            the reference's frame.
        pc: ``(B, 3)`` the TARGET pattern's own ``(pcx, pcy, dd)`` used
            to project the deformed direction back to its pixel — with a
            scan-varying calibration this warp simultaneously undoes the
            deformation AND the PC shift between target and reference
            (broadcast the shared PC for a fixed geometry).

    Returns ``(B, H, W)`` float32 warped patterns.
    """
    b, h, w = x.shape
    x = x.astype(jnp.float32)
    s = jnp.einsum(
        "bij,pj->bpi", f, rvec, precision=jax.lax.Precision.HIGHEST
    )
    z = jnp.maximum(s[..., 2], jnp.float32(1e-6))
    u = s[..., 0] * (pc[:, 2, None] / z)
    v = s[..., 1] * (pc[:, 2, None] / z)
    col = jnp.clip((u + pc[:, 0, None]) * w - 0.5, 0.0, w - 1.0)
    row = jnp.clip(h - (v + pc[:, 1, None]) * w - 0.5, 0.0, h - 1.0)
    r0 = jnp.floor(row).astype(jnp.int32)
    c0 = jnp.floor(col).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, h - 1)
    c1 = jnp.minimum(c0 + 1, w - 1)
    fr = row - r0
    fc = col - c0
    flat = x.reshape(b, h * w)

    def tap(rr, cc):
        return jnp.take_along_axis(flat, rr * w + cc, axis=1)

    out = (
        tap(r0, c0) * (1 - fr) * (1 - fc)
        + tap(r0, c1) * (1 - fr) * fc
        + tap(r1, c0) * fr * (1 - fc)
        + tap(r1, c1) * fr * fc
    )
    return out.reshape(b, h, w)


def _as_pc_array(
    geometry: DetectorGeometry, n: int, pc: np.ndarray | None
) -> np.ndarray:
    """``(B, 3)`` float32 per-pattern ``(pcx, pcy, dd)`` — the geometry's
    fixed PC broadcast, or the caller's per-pattern field validated."""
    if pc is None:
        return np.broadcast_to(
            np.asarray(
                [geometry.pcx, geometry.pcy, geometry.dd], np.float32
            ),
            (n, 3),
        ).copy()
    out = np.asarray(pc, np.float32)
    if out.shape == (3,):
        return np.broadcast_to(out, (n, 3)).copy()
    if out.shape != (n, 3):
        raise ValueError(f"pc must be ({n}, 3) or (3,), got {out.shape}")
    return out


def remap_patterns(
    patterns: np.ndarray,
    deformation: np.ndarray,
    geometry: DetectorGeometry,
    chunk: int = 128,
    mesh=None,
    pc: np.ndarray | None = None,
) -> np.ndarray:
    """Re-project patterns through deformation gradients ``I + A``.

    The CrossCourt-style remapping step: a pattern deformed by ``A``
    remaps onto its reference when passed back through ``F = I + A``
    (exact for the projective model, not just to first order). Used by
    `hrebsd_map`'s iterative passes; exposed for standalone use.

    Args:
        patterns: ``(B, H, W)`` patterns (uint8 ships raw).
        deformation: ``(B, 3, 3)`` or ``(3, 3)`` displacement-gradient
            tensors ``A`` (any gauge — the warp is projective, so
            ``A → A + λI`` only rescales F and shifts nothing).
        geometry: the detector the patterns were captured on.
        chunk: patterns per device dispatch.
        mesh: optional `jax.sharding.Mesh` — batch shards, tables
            replicate (no collectives; matches single-device to
            roundoff).
        pc: optional ``(B, 3)`` per-pattern ``(pcx, pcy, dd)`` — each
            TARGET's own PC (scan-varying calibration); output pixels
            stay in ``geometry``'s (the reference's) frame, so the warp
            also undoes the PC shift.

    Returns ``(B, H, W)`` float32 warped patterns (host numpy).
    """
    x = np.asarray(patterns)
    if x.ndim != 3:
        raise ValueError(f"expected (B, H, W) patterns, got {x.shape}")
    a = np.asarray(deformation, np.float64)
    if a.shape == (3, 3):
        a = np.broadcast_to(a[None], (len(x), 3, 3))
    if a.shape != (len(x), 3, 3):
        raise ValueError(
            f"deformation must be ({len(x)}, 3, 3) or (3, 3), got {a.shape}"
        )
    f = (np.eye(3) + a).astype(np.float32)
    pc_arr = _as_pc_array(geometry, len(x), pc)
    base = jnp.asarray(_pixel_screen_vectors(geometry))
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        if chunk % n_dev:
            raise ValueError(
                f"chunk={chunk} must divide by the mesh's {n_dev} devices"
            )
        rep = NamedSharding(mesh, P())
        base = jax.device_put(base, rep)
        batch_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    b = len(x)
    out = np.empty(x.shape, np.float32)
    for start in range(0, b, chunk):
        xc = x[start : start + chunk]
        fc = f[start : start + chunk]
        pcc = pc_arr[start : start + chunk]
        n = len(xc)
        if n < chunk:
            pad = chunk - n
            xc = np.concatenate([xc, np.tile(xc[-1:], (pad, 1, 1))])
            fc = np.concatenate([fc, np.tile(fc[-1:], (pad, 1, 1))])
            pcc = np.concatenate([pcc, np.tile(pcc[-1:], (pad, 1))])
        if batch_sharding is None:
            xc_dev, fc_dev, pc_dev = (
                jnp.asarray(xc), jnp.asarray(fc), jnp.asarray(pcc)
            )
        else:
            xc_dev = jax.device_put(xc, batch_sharding)
            fc_dev = jax.device_put(fc, batch_sharding)
            pc_dev = jax.device_put(pcc, batch_sharding)
        out[start : start + n] = np.asarray(
            _remap_core(xc_dev, fc_dev, base, pc_dev)
        )[:n]
    return out


@functools.partial(
    jax.jit,
    static_argnames=("centers_px", "roi_size", "upsample", "window_px"),
)
def _xcorr_shifts(
    ref, x, hann, fmask, *, centers_px: tuple, roi_size: int,
    upsample: int, window_px: float,
):
    """Batched sub-pixel shift measurement — ONE program per chunk:
    ROI extraction, windowed band-passed FFT cross-correlation, and
    matrix-DFT sub-pixel localization.

    Args:
        ref: ``(H, W)`` reference pattern.
        x: ``(B, H, W)`` target patterns.
        hann / fmask: ``(S, S)`` window and Fourier band-pass.
        centers_px: static ``((row, col), ...)`` integer ROI centers.
        upsample: sub-pixel factor kappa (peak located to ~1/kappa px).
        window_px: half-width of the fine search window around the coarse
            peak, pixels.

    Returns ``(shifts (B, R, 2) f32 (d_row, d_col) px, quality (B, R))``.
    """
    b = x.shape[0]
    n_roi = len(centers_px)
    s = roi_size
    # uint8 detector frames ship raw and widen on device (4x less host
    # link traffic; XCF is affine-invariant so no /255 is needed).
    ref = ref.astype(jnp.float32)
    x = x.astype(jnp.float32)
    # The reference spectrum is batch-invariant: compute it on the (R,
    # S, S) ROI stack ONCE and let the cross-spectrum multiply broadcast
    # it. (Broadcasting BEFORE the FFT recomputed the identical
    # reference transform b times — ~1/3 of the program's FFT work at
    # b128, r5 trace pass.)
    ref_rois = _static_rois(ref[None], centers_px, s)[0]  # (R, S, S)
    tgt_rois = _static_rois(x, centers_px, s)  # (B, R, S, S)
    refz = ref_rois - ref_rois.mean(axis=(-2, -1), keepdims=True)
    tgtz = tgt_rois - tgt_rois.mean(axis=(-2, -1), keepdims=True)
    fr = jnp.fft.fft2(refz * hann) * fmask  # (R, S, S)
    ft = jnp.fft.fft2(tgtz * hann) * fmask  # (B, R, S, S)
    cross = ft * jnp.conj(fr)[None]  # corr(s) = sum_p ref(p)·tgt(p+s)
    corr = jnp.fft.ifft2(cross).real  # (B, R, S, S), index = shift mod S
    # Normalize to an NCC-style quality: peak / (||ref||·||tgt||) of the
    # filtered, windowed panels (Parseval on the masked spectra).
    norm = jnp.sqrt(
        (jnp.abs(fr) ** 2).sum(axis=(-2, -1))[None]
        * (jnp.abs(ft) ** 2).sum(axis=(-2, -1))
    ).reshape(b * n_roi) / (s * s)
    cross = cross.reshape(b * n_roi, s, s)
    corr = corr.reshape(b * n_roi, s, s)
    flat = corr.reshape(corr.shape[0], -1)
    coarse = jnp.argmax(flat, axis=-1)
    quality = jnp.take_along_axis(flat, coarse[:, None], axis=-1)[:, 0]
    quality = jnp.clip(quality / jnp.maximum(norm, 1e-12), 0.0, 1.0)
    row0 = (coarse // s).astype(jnp.float32)
    col0 = (coarse % s).astype(jnp.float32)
    # Unwrap circular indices to signed shifts.
    row0 = jnp.where(row0 > s / 2, row0 - s, row0)
    col0 = jnp.where(col0 > s / 2, col0 - s, col0)

    # Matrix-DFT upsampling (Guizar-Sicairos 2008): evaluate the inverse
    # DFT of the cross spectrum on a (U, U) fine grid centered at the
    # coarse peak — two small matmuls, never a zoomed image in HBM.
    u = 2 * int(round(window_px * upsample)) + 1
    k = jnp.fft.fftfreq(s) * s  # signed integer frequencies
    offs = (jnp.arange(u, dtype=jnp.float32) - (u - 1) / 2) / upsample
    sr = row0[:, None] + offs[None, :]  # (N, U)
    sc = col0[:, None] + offs[None, :]
    er = jnp.exp((2j * jnp.pi / s) * sr[..., None] * k[None, None, :])
    ec = jnp.exp((2j * jnp.pi / s) * sc[..., None] * k[None, None, :])
    # corr_up[a, b] = sum_{uv} cross[u, v] e^{2πi(ku·sr_a + kv·sc_b)/S}
    corr_up = jnp.einsum(
        "nau,nuv,nbv->nab", er, cross, ec,
        precision=jax.lax.Precision.HIGHEST,
    ).real
    fine = jnp.argmax(corr_up.reshape(corr_up.shape[0], -1), axis=-1)
    # Parabolic interpolation between fine-grid samples removes the
    # 1/upsample quantization floor (the projective a3* terms produce
    # shift signals of only ~0.1 px across the ROI ring — a 0.02 px
    # stair-step is a 10-20% distortion of exactly those components).
    ia = jnp.clip(fine // u, 1, u - 2)
    ib = jnp.clip(fine % u, 1, u - 2)
    rows_n = jnp.arange(corr_up.shape[0])

    def parab(cm, c0_, cp):
        denom = cm - 2.0 * c0_ + cp
        return jnp.where(
            jnp.abs(denom) > 1e-30, 0.5 * (cm - cp) / denom, 0.0
        )

    c_r = corr_up[rows_n[:, None], ia[:, None] + jnp.arange(-1, 2), ib[:, None]]
    c_c = corr_up[rows_n[:, None], ia[:, None], ib[:, None] + jnp.arange(-1, 2)]
    da = jnp.clip(parab(c_r[:, 0], c_r[:, 1], c_r[:, 2]), -0.5, 0.5)
    db = jnp.clip(parab(c_c[:, 0], c_c[:, 1], c_c[:, 2]), -0.5, 0.5)
    fr_off = (ia.astype(jnp.float32) + da - (u - 1) / 2) / upsample
    fc_off = (ib.astype(jnp.float32) + db - (u - 1) / 2) / upsample
    shifts = jnp.stack([row0 + fr_off, col0 + fc_off], axis=-1)
    return shifts.reshape(b, n_roi, 2), quality.reshape(b, n_roi)


def measure_roi_shifts(
    reference: np.ndarray,
    patterns: np.ndarray,
    centers: np.ndarray,
    roi_size: int = 64,
    upsample: int = 20,
    window_px: float = 1.0,
    f_min: float = 1.5,
    f_max: float | None = None,
    chunk: int = 128,
    mesh=None,
    deformation: np.ndarray | None = None,
    geometry: DetectorGeometry | None = None,
    pc: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Measure sub-pixel ROI shifts of every pattern against a reference.

    Args:
        reference: ``(H, W)`` reference pattern (same grain, low strain).
        patterns: ``(B, H, W)`` target patterns.
        centers: ``(R, 2)`` ROI ``(row, col)`` pixel centers
            (`default_roi_centers`).
        roi_size: ROI window edge, px (power of two keeps FFTs fast).
        upsample: sub-pixel factor — shifts resolve to ~1/upsample px.
        window_px: fine-search half-width around the coarse peak, px.
        f_min / f_max: annular Fourier band-pass, cycles per window
            (``f_min`` kills DC/background; ``f_max=None`` keeps all
            high frequencies).
        chunk: patterns per device dispatch.
        mesh: optional `jax.sharding.Mesh` — pattern chunks shard over
            the mesh's first axis (every stage is per-(pattern, ROI)
            local, so GSPMD inserts no collectives); reference/window
            tables replicate. ``chunk`` must divide by the device count.
            Mesh results match single-device to float roundoff
            (dryrun-asserted in `__graft_entry__.dryrun_multichip`).
        deformation: optional ``(B, 3, 3)`` displacement-gradient tensors
            — each pattern is first remapped through ``I + A`` on device
            (`remap_patterns` warp, chained into the same dispatch, no
            host round trip), so the returned shifts are the RESIDUAL
            after that deformation estimate. Requires ``geometry``.
        geometry: the `DetectorGeometry` (only needed with
            ``deformation``).
        pc: optional ``(B, 3)`` per-pattern ``(pcx, pcy, dd)`` for the
            remap warp (scan-varying calibration); default: the
            geometry's fixed PC.

    Returns:
        ``(shifts (B, R, 2) float64 (d_row, d_col) px, quality (B, R))``.
    """
    x = np.asarray(patterns)
    if x.dtype != np.uint8:  # uint8 ships raw; the device widens it
        x = x.astype(np.float32, copy=False)
    if x.ndim != 3:
        raise ValueError(f"expected (B, H, W) patterns, got {x.shape}")
    ref = np.asarray(reference)
    if ref.dtype != np.uint8:
        ref = ref.astype(np.float32, copy=False)
    if ref.shape != x.shape[1:]:
        raise ValueError(
            f"reference {ref.shape} does not match patterns {x.shape[1:]}"
        )
    centers = np.asarray(centers, np.float64)
    n_roi = len(centers)
    half = roi_size // 2
    rint = np.rint(centers).astype(int)
    if (
        rint.min(initial=roi_size) < half
        or (rint[:, 0] + roi_size - half > x.shape[1]).any()
        or (rint[:, 1] + roi_size - half > x.shape[2]).any()
    ):
        raise ValueError("an ROI window falls outside the detector")

    f_mats = None
    if deformation is not None:
        if geometry is None:
            raise ValueError("deformation remapping requires geometry")
        a = np.asarray(deformation, np.float64)
        if a.shape != (len(x), 3, 3):
            raise ValueError(
                f"deformation must be ({len(x)}, 3, 3), got {a.shape}"
            )
        f_mats = (np.eye(3) + a).astype(np.float32)
        pc_arr = _as_pc_array(geometry, len(x), pc)
        base = jnp.asarray(_pixel_screen_vectors(geometry))

    hann = jnp.asarray(_hann2(roi_size))
    fmask = jnp.asarray(_annular_mask(roi_size, f_min, f_max))
    ref_dev = jnp.asarray(ref)
    centers_px = tuple(map(tuple, rint.tolist()))

    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        if chunk % n_dev:
            raise ValueError(
                f"chunk={chunk} must divide by the mesh's {n_dev} devices"
            )
        rep = NamedSharding(mesh, P())
        hann = jax.device_put(hann, rep)
        fmask = jax.device_put(fmask, rep)
        ref_dev = jax.device_put(ref_dev, rep)
        if f_mats is not None:
            base = jax.device_put(base, rep)
        batch_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))

    b = len(x)
    out_s = np.empty((b, n_roi, 2), np.float64)
    out_q = np.empty((b, n_roi), np.float64)
    for start in range(0, b, chunk):
        xc = x[start : start + chunk]
        n = len(xc)
        if n < chunk:
            xc = np.concatenate([xc, np.tile(xc[-1:], (chunk - n, 1, 1))])
        xc_dev = (
            jnp.asarray(xc)
            if batch_sharding is None
            else jax.device_put(xc, batch_sharding)
        )
        if f_mats is not None:
            fc = f_mats[start : start + chunk]
            pcc = pc_arr[start : start + chunk]
            if len(fc) < chunk:
                pad = chunk - len(fc)
                fc = np.concatenate([fc, np.tile(fc[-1:], (pad, 1, 1))])
                pcc = np.concatenate([pcc, np.tile(pcc[-1:], (pad, 1))])
            if batch_sharding is None:
                fc_dev, pc_dev = jnp.asarray(fc), jnp.asarray(pcc)
            else:
                fc_dev = jax.device_put(fc, batch_sharding)
                pc_dev = jax.device_put(pcc, batch_sharding)
            # Chained device dispatch: the warped chunk never visits host.
            xc_dev = _remap_core(xc_dev, fc_dev, base, pc_dev)
        s_dev, q_dev = _xcorr_shifts(
            ref_dev, xc_dev, hann, fmask,
            centers_px=centers_px, roi_size=roi_size,
            upsample=upsample, window_px=window_px,
        )
        out_s[start : start + n] = np.asarray(s_dev)[:n]
        out_q[start : start + n] = np.asarray(q_dev)[:n]
    return out_s, out_q


def _design_matrix(r_vecs: np.ndarray, dd) -> np.ndarray:
    """``(..., R, 2, 8)`` shift model in the gauge ``a33 = 0``:
    unknowns ``p = (a11, a12, a13, a21, a22, a23, a31, a32)``,
    ``q_x = a11 x + a12 y + a13 D − (x/D)(a31 x + a32 y)`` and the y row
    alike — the first-order gnomonic re-projection (module docstring).
    ``dd`` broadcasts against ``r_vecs[..., 0]`` — a scalar for a fixed
    geometry, ``(B, 1)`` for a scan-varying calibration."""
    x, y = r_vecs[..., 0], r_vecs[..., 1]
    dd = np.broadcast_to(np.asarray(dd, np.float64), x.shape)
    m = np.zeros(x.shape + (2, 8))
    m[..., 0, 0] = x
    m[..., 0, 1] = y
    m[..., 0, 2] = dd
    m[..., 0, 6] = -x * x / dd
    m[..., 0, 7] = -x * y / dd
    m[..., 1, 3] = x
    m[..., 1, 4] = y
    m[..., 1, 5] = dd
    m[..., 1, 6] = -y * x / dd
    m[..., 1, 7] = -y * y / dd
    return m


@jax.jit
def _solve_core(m, q_obs, w):
    """Weighted batched normal equations: m (R,2,8), q_obs (B,R,2),
    w (B,R) → (p (B,8), rms residual (B,))."""
    mw = m.reshape(-1, 8)  # (2R, 8)
    qf = q_obs.reshape(q_obs.shape[0], -1)  # (B, 2R)
    wf = jnp.repeat(w, 2, axis=-1)  # (B, 2R)
    # (B, 8, 8) = Mᵀ W M ; ridge keeps degenerate (few live ROIs) solvable.
    ata = jnp.einsum(
        "ri,br,rj->bij", mw, wf, mw, precision=jax.lax.Precision.HIGHEST
    )
    ata += 1e-12 * jnp.eye(8)
    atb = jnp.einsum(
        "ri,br,br->bi", mw, wf, qf, precision=jax.lax.Precision.HIGHEST
    )
    p = jnp.linalg.solve(ata, atb[..., None])[..., 0]
    pred = jnp.einsum(
        "ri,bi->br", mw, p, precision=jax.lax.Precision.HIGHEST
    )
    wsum = jnp.maximum(wf.sum(axis=-1), 1e-12)
    rms = jnp.sqrt((wf * (pred - qf) ** 2).sum(axis=-1) / wsum)
    return p, rms


def solve_deformation(
    shifts_px: np.ndarray,
    quality: np.ndarray,
    geometry: DetectorGeometry,
    centers: np.ndarray,
    min_quality: float = 0.0,
    pc: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Least-squares displacement-gradient tensors from ROI shifts.

    Args:
        shifts_px: ``(B, R, 2)`` measured ``(d_row, d_col)`` pixel shifts.
        quality: ``(B, R)`` per-ROI weights (XCF peak heights).
        geometry / centers: the layout the shifts were measured on.
        min_quality: ROIs below this weight are dropped from the solve.
        pc: optional ``(B, 3)`` per-pattern ``(pcx, pcy, dd)`` — each
            TARGET's own pattern center, with ``geometry`` holding the
            REFERENCE's. The PC difference physically translates and
            dilates the pattern on screen (the beam moved under a fixed
            detector), adding the apparent shift
            ``q_pc = (δpcx + u·δdd/D, δpcy + v·δdd/D)`` at ROI plane
            position ``(u, v)``; it is subtracted from the data before
            the solve. Left uncorrected, a scan's PC gradient aliases
            directly into a phantom strain gradient — the dominant
            HR-EBSD systematic (pinned by test).

    Returns:
        ``(a (B, 3, 3) float64 in the a33 = 0 gauge, rms residual (B,)
        in width units)``.
    """
    s = np.asarray(shifts_px, np.float64)
    w = np.asarray(quality, np.float64)
    w = np.where(w >= min_quality, w, 0.0)
    # Pixel (row, col) shifts → detector-frame (x, y) in width units:
    # x follows columns, y is the NEGATED row direction (rows grow down).
    width = geometry.shape[1]
    q_xy = np.stack([s[..., 1], -s[..., 0]], axis=-1) / width
    r_vecs = roi_position_vectors(geometry, centers)
    if pc is not None:
        pc_arr = _as_pc_array(geometry, len(s), pc).astype(np.float64)
        delta = pc_arr - np.asarray(
            [geometry.pcx, geometry.pcy, geometry.dd], np.float64
        )
        u, v = r_vecs[:, 0], r_vecs[:, 1]
        scale = delta[:, 2, None] / geometry.dd  # δdd dilation per unit
        q_pc = np.stack(
            [
                delta[:, 0, None] + u[None, :] * scale,
                delta[:, 1, None] + v[None, :] * scale,
            ],
            axis=-1,
        )
        q_xy = q_xy - q_pc
    m = _design_matrix(r_vecs, geometry.dd)
    p, rms = _solve_core(
        jnp.asarray(m, jnp.float32),
        jnp.asarray(q_xy, jnp.float32),
        jnp.asarray(w, jnp.float32),
    )
    p = np.asarray(p, np.float64)
    a = np.zeros((len(p), 3, 3))
    a[:, 0, :] = p[:, 0:3]
    a[:, 1, :] = p[:, 3:6]
    a[:, 2, 0:2] = p[:, 6:8]
    return a, np.asarray(rms, np.float64)


def _stiffness_tensor(voigt: np.ndarray) -> np.ndarray:
    """(6, 6) Voigt stiffness → full (3, 3, 3, 3) tensor."""
    pairs = [(0, 0), (1, 1), (2, 2), (1, 2), (0, 2), (0, 1)]
    c = np.zeros((3, 3, 3, 3))
    for a_v, (i, j) in enumerate(pairs):
        for b_v, (k, l) in enumerate(pairs):
            v = voigt[a_v, b_v]
            for ii, jj in ((i, j), (j, i)):
                for kk, ll in ((k, l), (l, k)):
                    c[ii, jj, kk, ll] = v
    return c


@jax.jit
def _traction_free(a_gauge, c4_det, normal):
    """Restore the hydrostatic gauge: find λ with σ_nn(sym(A)+λI) = 0.

    a_gauge: (B, 3, 3); c4_det: (B, 3, 3, 3, 3) stiffness, detector frame;
    normal: (3,) unit sample normal. Returns (a (B,3,3), strain, stress).
    """
    eps0 = 0.5 * (a_gauge + jnp.swapaxes(a_gauge, -1, -2))
    sig0 = jnp.einsum(
        "bijkl,bkl->bij", c4_det, eps0,
        precision=jax.lax.Precision.HIGHEST,
    )
    eye = jnp.eye(3)
    sig_i = jnp.einsum("bijkk->bij", c4_det)  # σ(I) = C : I
    num = jnp.einsum("i,bij,j->b", normal, sig0, normal)
    den = jnp.einsum("i,bij,j->b", normal, sig_i, normal)
    lam = -num / jnp.where(jnp.abs(den) < 1e-12, 1.0, den)
    a = a_gauge + lam[:, None, None] * eye
    strain = eps0 + lam[:, None, None] * eye
    stress = sig0 + lam[:, None, None] * sig_i
    return a, strain, stress


def von_mises_strain(strain: np.ndarray) -> np.ndarray:
    """Equivalent (von Mises) strain of ``(..., 3, 3)`` tensors."""
    e = np.asarray(strain)
    dev = e - np.trace(e, axis1=-2, axis2=-1)[..., None, None] / 3 * np.eye(3)
    return np.sqrt(2.0 / 3.0 * np.einsum("...ij,...ij->...", dev, dev))


def hrebsd_map(
    patterns: np.ndarray,
    reference: np.ndarray,
    geometry: DetectorGeometry,
    centers: np.ndarray | None = None,
    roi_size: int = 64,
    upsample: int = 20,
    stiffness: np.ndarray | None = None,
    orientations: np.ndarray | None = None,
    f_min: float = 1.5,
    f_max: float | None = None,
    min_quality: float = 0.1,
    chunk: int = 128,
    mesh=None,
    remap_iterations: int = 1,
    calibration=None,
    scan_xy: np.ndarray | None = None,
    pc: np.ndarray | None = None,
) -> HrebsdResult:
    """Full HR-EBSD pipeline: ROI shifts → deformation → strain/rotation.

    Args:
        patterns: ``(B, H, W)`` patterns (one grain / reference's grain).
        reference: ``(H, W)`` reference pattern (strain is RELATIVE to it).
        geometry: detector geometry of the REFERENCE pattern — the
            pattern center must be accurate (PC error aliases into
            phantom strain; calibrate first with `sim.calibrate_geometry`
            / `calibrate_scan_geometry`). With ``calibration``, pass
            ``calibration.geometry_at(ref_scan_xy)``.
        centers: ``(R, 2)`` ROI centers; default `default_roi_centers`.
        roi_size / upsample / f_min / f_max: see `measure_roi_shifts`.
        stiffness: (6, 6) Voigt stiffness (crystal frame, e.g.
            `crystal.cubic_stiffness`) enabling the traction-free gauge
            and stress output; None leaves the ``a33 = 0`` gauge.
        orientations: ``(B, 4)`` or ``(4,)`` scalar-first crystal→detector
            quaternions (indexing output) rotating the stiffness per
            pattern; None uses the crystal frame as the detector frame.
        min_quality: drop ROIs whose XCF peak falls below this.
        chunk: patterns per device dispatch.
        mesh: optional `jax.sharding.Mesh` — shards the shift
            measurement (the FLOPs) over the pattern batch; see
            `measure_roi_shifts`.
        remap_iterations: iterative remapping passes after the first-order
            solve (Britton & Wilkinson 2012): remap each pattern through
            the current estimate ``F = I + A``, re-correlate, compose
            ``F ← F (I + A_res)``. A composition is accepted PER PATTERN
            only where it lowers that pattern's fit residual — large
            rotations (where the first-order solve silently biases) take
            the remap, while near-reference patterns keep the direct
            measurement, whose sub-pixel floor the remap's bilinear
            resampling would otherwise erode. One pass (the default)
            holds strain accuracy to ~1e-4 under lattice rotations of
            several degrees; ``0`` disables. ``shifts_px``/``quality``/
            ``residual_px`` report each pattern's accepted pass.
        calibration: optional `sim.ScanCalibration` — the affine
            scan-varying PC model ``PC(xy) = PC₀ + G·xy`` from
            `sim.calibrate_scan_geometry`. With ``scan_xy``, every
            pattern's design matrix (and remap warp) uses ITS OWN
            pattern center; a fixed nominal PC would alias the PC
            gradient directly into a phantom strain gradient across the
            map (the dominant HR-EBSD systematic — pinned by test).
        scan_xy: ``(B, 2)`` scan positions in the calibration's units
            (required with ``calibration``).
        pc: alternative to ``calibration``: an explicit ``(B, 3)``
            per-pattern ``(pcx, pcy, dd)`` field.
    """
    x = np.asarray(patterns)  # uint8 passes through to the device cast
    if calibration is not None:
        if pc is not None:
            raise ValueError("give either calibration or pc, not both")
        if scan_xy is None:
            raise ValueError("calibration requires scan_xy positions")
        s_xy = np.asarray(scan_xy, np.float64)
        if s_xy.shape != (len(x), 2):
            raise ValueError(
                f"scan_xy must be ({len(x)}, 2), got {s_xy.shape}"
            )
        pc = calibration.pc_at(s_xy)
    if pc is not None:
        pc = _as_pc_array(geometry, len(x), pc)
    if centers is None:
        centers = default_roi_centers(geometry, roi_size=roi_size)
    shifts, quality = measure_roi_shifts(
        reference, x, centers, roi_size=roi_size, upsample=upsample,
        f_min=f_min, f_max=f_max, chunk=chunk, mesh=mesh,
    )
    a_gauge, rms = solve_deformation(
        shifts, quality, geometry, centers, min_quality=min_quality,
        pc=pc,
    )
    eye = np.eye(3)
    f_est = eye + a_gauge
    for _ in range(remap_iterations):
        shifts2, quality2 = measure_roi_shifts(
            reference, x, centers, roi_size=roi_size, upsample=upsample,
            f_min=f_min, f_max=f_max, chunk=chunk, mesh=mesh,
            deformation=f_est - eye, geometry=geometry, pc=pc,
        )
        # No pc= here: the remap warp projected each target back through
        # its OWN PC into the reference frame, so the residual shifts
        # carry no PC component.
        a_res, rms2 = solve_deformation(
            shifts2, quality2, geometry, centers, min_quality=min_quality
        )
        # Measured-between-ref-and-remapped G = I + A_res composes on the
        # RIGHT: P_remap(proj(G r)) = P_ref(proj(r)) with
        # P_remap(p) = P_def(proj(F_est r_p)) gives F_true = F_est G.
        f_new = f_est @ (eye + a_res)
        # Per-pattern acceptance: the remap only wins where it lowers the
        # fit residual. Large rotations (decorrelated windows, first-order
        # model bias) improve; near-reference patterns would only pick up
        # the warp's bilinear-resampling noise, so they keep their pass.
        accept = rms2 < rms
        f_est = np.where(accept[:, None, None], f_new, f_est)
        shifts = np.where(accept[:, None, None], shifts2, shifts)
        quality = np.where(accept[:, None], quality2, quality)
        rms = np.where(accept, rms2, rms)
        # Back to the a33 = 0 gauge (the projective warp can't see the
        # hydrostatic direction, so composition drifts freely along it).
        a_gauge = f_est - eye
        a_gauge = a_gauge - a_gauge[:, 2, 2][:, None, None] * eye
        f_est = eye + a_gauge
        if not accept.any():
            break

    stress = None
    if stiffness is not None:
        c0 = _stiffness_tensor(np.asarray(stiffness, np.float64))
        b = len(a_gauge)
        if orientations is None:
            g = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
        else:
            qo = jnp.asarray(orientations, jnp.float32)
            if qo.ndim == 1:
                qo = jnp.broadcast_to(qo[None], (b, 4))
            g = quat_to_matrix(qo)  # crystal → detector
        c4 = jnp.einsum(
            "bia,bjc,bkd,ble,acde->bijkl",
            g, g, g, g, jnp.asarray(c0, jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        if geometry.tilt:
            t = math.radians(geometry.tilt)
            normal = jnp.asarray(
                [0.0, -math.sin(t), math.cos(t)], jnp.float32
            )
        else:
            normal = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
        a_dev, strain_dev, stress_dev = _traction_free(
            jnp.asarray(a_gauge, jnp.float32), c4, normal
        )
        a = np.asarray(a_dev, np.float64)
        strain = np.asarray(strain_dev, np.float64)
        stress = np.asarray(stress_dev, np.float64)
    else:
        a = a_gauge
        strain = 0.5 * (a + np.swapaxes(a, -1, -2))

    skew = 0.5 * (a - np.swapaxes(a, -1, -2))
    rotation = np.stack(
        [skew[:, 2, 1], skew[:, 0, 2], skew[:, 1, 0]], axis=-1
    )
    rot_deg = np.degrees(np.linalg.norm(rotation, axis=-1))
    width = geometry.shape[1]
    return HrebsdResult(
        a=a,
        strain=strain,
        rotation=rotation,
        rotation_deg=rot_deg,
        stress=stress,
        shifts_px=shifts,
        quality=quality,
        residual_px=rms * width,
    )
