"""Spherical-harmonic indexing: dictionary-free global orientation search.

The fourth indexing plane (alongside latent k-NN, pattern-NCC DI and
Hough band voting; the reference only has the DB-backed k-NN plane,
reference dp_indexer.py:51): instead of comparing against a rendered
dictionary, each experimental pattern is back-projected onto the sphere
through the detector geometry and cross-correlated against the master
pattern over ALL of SO(3) at once — the EMSphInx role, built first-party
on the `sim.sht` harmonic machinery.

The math (conventions pinned by tests/sim/test_sht.py): a pattern
``p(d) = M(Rᵀ d)`` samples the master M at crystal-frame directions,
where R is the crystal→detector orientation (`sim.master`'s rendering
contract, master.py:248-251). Writing the windowed back-projection
``f(n) = Σ_i w_i p_i δ(n − d_i)`` and expanding both sides in spherical
harmonics, the correlation

    X(R) = ∫ f(n) M(Rᵀ n) dn = Σ_{lmν} conj(f̂_lm) m̂_lν D^l_mν(R)

becomes, on a ZYZ Euler grid R = Rz(α)Ry(β)Rz(γ),

    X(α, β_k, γ) = Σ_{mν} W_mν(β_k) e^{−imα} e^{−iνγ},
    W_mν(β_k)    = Σ_l conj(f̂_lm) m̂_lν d^l_mν(β_k)

— per pattern: one projection matmul (pixels → f̂), one l-contraction
einsum against the precomputed ``m̂·d`` tables, and two DFT matmuls, all
MXU-shaped, batched over the pattern chunk in ONE jitted program with a
fused argmax + 3×3×3 peak-neighborhood extraction (the full X volume
never leaves the device). Sub-grid accuracy comes from host-side
parabolic interpolation of the peak; crystal symmetry (master-invariant
right cosets R·g) is folded by `crystal.reduce_to_fundamental_zone`.

Friedel-symmetric masters (every centrosymmetric phase, and the
antipodal extension `sim.master` documents) have zero odd-l
coefficients, so the l-contraction — the FLOPs- and memory-dominant
stage — automatically keeps only even degrees (the ``l_keep`` mask).

Two further structural reductions (r5 trace-roofline pass):

* **Hermitian half-plane**: the pattern and master are real, so
  ``W_{-m,-ν} = conj(W_{mν})`` and the correlation is exactly
  ``X = Re Σ_{m≥0} c_m Σ_ν W_mν e^{−i(mα+νγ)}`` with pair weights
  ``c_0 = 1, c_{m>0} = 2`` folded into the α-DFT tables — only the
  m ≥ 0 rows are ever computed, halving the l-contraction and α-DFT
  FLOPs and the ``W`` intermediates.
* **bf16-resident device tables** on TPU: XLA's default matmul
  precision already rounds every einsum operand to bf16 — but with f32
  residents it re-converted the ~0.5 GB of Wigner tables on EVERY
  dispatch (~1.3 ms of pure convert/copy at L=64, trace 2026-08-20).
  Storing the tables in bf16 feeds the MXU the same values without the
  per-call conversion. On CPU (tests) everything stays f32 — CPU
  matmuls are true f32, and the pinned accuracy numbers are unchanged.
  All contractions request ``preferred_element_type=float32``, so
  accumulation is f32 either way.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.crystal.sampling import reduce_to_fundamental_zone
from latice_tpu.crystal.symmetry import ROTATION_GROUPS
from latice_tpu.sim.geometry import DetectorGeometry, pixel_directions
from latice_tpu.sim.master import directions_to_lambert
from latice_tpu.sim.sht import (
    gauss_legendre_ring_grid,
    sph_coeffs_dense,
    sph_matrix_dense,
    wigner_d_table,
)

__all__ = [
    "MultiPhaseSphericalIndexer",
    "MultiPhaseSphericalResult",
    "SphericalIndexer",
    "SphericalIndexerConfig",
    "SphericalResult",
    "master_sph_coefficients",
    "projection_tables",
]

logger = logging.getLogger(__name__)


def _lookup_master(master: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Bilinear master lookup at unit directions (`sim.master` equal-area
    convention, antipodal for z < 0) — host-side, analysis-time only."""
    m = np.asarray(master, np.float64)
    n = m.shape[0]
    half = (n - 1) / 2.0
    xy = directions_to_lambert(dirs)
    col = np.clip(xy[..., 0] / np.sqrt(2.0) * half + half, 0.0, n - 1.0)
    row = np.clip(-xy[..., 1] / np.sqrt(2.0) * half + half, 0.0, n - 1.0)
    r0 = np.floor(row).astype(np.int64)
    c0 = np.floor(col).astype(np.int64)
    r1 = np.minimum(r0 + 1, n - 1)
    c1 = np.minimum(c0 + 1, n - 1)
    fr = row - r0
    fc = col - c0
    return (
        m[r0, c0] * (1 - fr) * (1 - fc)
        + m[r0, c1] * (1 - fr) * fc
        + m[r1, c0] * fr * (1 - fc)
        + m[r1, c1] * fr * fc
    )


def master_sph_coefficients(
    master: np.ndarray, bandwidth: int
) -> np.ndarray:
    """Dense (L, 2L−1) complex SH coefficients of a master image.

    Analyzed over the full sphere on a Gauss–Legendre quadrature grid
    (southern directions via the antipode, exactly `render_from_master`'s
    sampling rule), DC (l = 0) removed and unit-normalized so correlation
    peaks are a cosine-like score.
    """
    dirs, w = gauss_legendre_ring_grid(bandwidth)
    vals = _lookup_master(master, dirs)
    coef = sph_coeffs_dense(vals, dirs, w, bandwidth)
    coef[0, :] = 0.0  # remove DC: patterns are zero-meaned too
    norm = np.sqrt(np.sum(np.abs(coef) ** 2))
    if norm < 1e-12:
        raise ValueError("master has no harmonic content below bandwidth")
    return coef / norm


def _solid_angle_weights(geometry: DetectorGeometry) -> np.ndarray:
    """Per-pixel solid angles (H·W,) — the quadrature weights of the
    windowed back-projection. Tilt is a rigid rotation about the source,
    so the untilted gnomonic formula is exact."""
    h, w = geometry.shape
    col = (np.arange(w, dtype=np.float64) + 0.5) / w
    dist_bottom = (h - (np.arange(h, dtype=np.float64) + 0.5)) / w
    x = col[None, :] - geometry.pcx
    y = dist_bottom[:, None] - geometry.pcy
    r2 = x * x + y * y + geometry.dd**2
    omega = (geometry.dd / (w * w)) / r2**1.5
    return np.broadcast_to(omega, (h, w)).reshape(-1).copy()


@dataclasses.dataclass(frozen=True)
class SphericalIndexerConfig:
    """Knobs of the spherical cross-correlation.

    Attributes:
        bandwidth: harmonic band limit L. Angular resolution of the
            correlation grid is ~180°/L; 64 gives ~2.8° before the
            parabolic peak interpolation.
        beta_count / alpha_count: SO(3) grid sizes over β ∈ (0, π) and
            α, γ ∈ [0, 2π) (defaults 2L each — matched resolution).
        detector_bin: mean-pool factor applied to patterns on device
            before projection (the harmonic window can't resolve more
            pixels than ~L² anyway; binning cuts the projection matmul).
        chunk: patterns per device dispatch (bounds the (chunk, K, nA,
            nG) correlation volume — 64 at the defaults is ~540 MB f32;
            measured on v5e: 64 is +35% throughput over 32 and 128 only
            +9% more, r5 chunk probe).
        symmetry: proper rotation group for the fundamental-zone
            reduction (`crystal.ROTATION_GROUPS` key).
        refine: sub-grid peak treatment — ``"newton"`` (default, also
            ``True``): damped Newton on the CONTINUOUS band-limited
            correlation itself (exact Fourier in α/γ, interpolated
            Wigner rows in β — the EMSphInx-style refinement; ~3x the
            parabolic accuracy, and never worse than the grid);
            ``"parabolic"``: 3-point host-side interpolation of the grid
            peak; ``False``: raw grid solutions.
        newton_steps: Newton iterations of the ``"newton"`` mode.
    """

    bandwidth: int = 64
    beta_count: int | None = None
    alpha_count: int | None = None
    detector_bin: int = 2
    chunk: int = 64
    symmetry: str = "432"
    refine: bool | str = "newton"
    newton_steps: int = 8

    def __post_init__(self):
        if self.bandwidth < 4:
            raise ValueError(f"bandwidth must be >= 4, got {self.bandwidth}")
        if self.detector_bin < 1:
            raise ValueError("detector_bin must be >= 1")
        if self.chunk < 1:
            raise ValueError("chunk must be >= 1")
        if self.symmetry not in ROTATION_GROUPS:
            raise ValueError(
                f"unknown point group {self.symmetry!r}; choose from "
                f"{sorted(ROTATION_GROUPS)}"
            )
        if self.refine not in (True, False, "newton", "parabolic"):
            raise ValueError(
                f"refine must be True/False/'newton'/'parabolic', "
                f"got {self.refine!r}"
            )

    @property
    def refine_mode(self) -> str:
        """Canonical mode string: 'newton' | 'parabolic' | 'off'."""
        if self.refine in (True, "newton"):
            return "newton"
        return "parabolic" if self.refine == "parabolic" else "off"


@dataclasses.dataclass(frozen=True)
class SphericalResult:
    """Batch result: scalar-first crystal→detector quaternions (FZ
    representatives), zxz Euler degrees, and the correlation score
    (cosine-like; window-limited, comparable across patterns)."""

    quaternions: np.ndarray
    eulers_deg: np.ndarray
    scores: np.ndarray

    def __len__(self) -> int:
        return len(self.quaternions)


def _correlation_volume(pats, wvec, yr, yi, dmr, dmi, cc, cgs, bin_factor):
    """Shared pipeline: (b, H, W) patterns → the full SO(3) correlation
    volume ``xcorr (b, k, a, g)`` f32 plus the f32 ``W`` row pair (the
    Newton refinement's continuous representation). Traced inside both
    jitted entry points (`_correlate_chunk`, `_top_cells_chunk`)."""
    b = pats.shape[0]
    x = pats.astype(jnp.float32)
    if pats.dtype == jnp.uint8:
        x = x / 255.0
    if bin_factor > 1:
        hb = x.shape[1] // bin_factor
        wb = x.shape[2] // bin_factor
        x = x.reshape(b, hb, bin_factor, wb, bin_factor).mean(axis=(2, 4))
    x = x.reshape(b, -1)
    # Windowed zero-mean + solid-angle-weighted normalization: the
    # back-projected f has unit L2 mass, making X a cosine-like score.
    wsum = jnp.sum(wvec)
    mean = (x @ wvec) / wsum
    xc = x - mean[:, None]
    norm = jnp.sqrt(jnp.maximum((xc * xc) @ wvec, 1e-20))
    xcn = xc / norm[:, None]
    # The big contractions run in the tables' dtype (bf16 residents on
    # TPU — the values XLA's default matmul precision feeds the MXU
    # anyway — f32 on CPU) and accumulate f32 (module docstring).
    cdt = dmr.dtype
    f32 = jnp.float32
    # Projection: f̂ = Σ_i w_i f_i conj(Y(d_i)) — weights folded into Y.
    # m ≥ 0 columns only (Hermitian half-plane, module docstring).
    n_l, m_half = dmr.shape[1], dmr.shape[2]
    xcn_c = xcn.astype(cdt)
    fr = jnp.einsum(
        "bd,dx->bx", xcn_c, yr, preferred_element_type=f32
    ).reshape(b, n_l, m_half)
    fi = jnp.einsum(
        "bd,dx->bx", xcn_c, yi, preferred_element_type=f32
    ).reshape(b, n_l, m_half)
    # W_mν(β_k) = Σ_l conj(f̂)_lm (m̂·d)_lmν, real/imag explicitly;
    # the four l-contractions keep each Wigner table read exactly once.
    # The complex pair stacks along one axis ([wr; wi], 2L rows) so the
    # two DFT stages are ONE matmul each against block coefficient
    # tables (cc/cgs, built in `SphericalIndexer.__init__`) — no f32
    # (b,k,a,ν) partial ever materializes and the real/imaginary adds
    # ride the MXU epilogue (the split formulation spent ~1 ms/chunk on
    # f32 partial-sum traffic, r5 trace pass). Newton needs the f32 W
    # rows; the grid path casts straight to the contraction dtype.
    frc = fr.astype(cdt)
    fic = fi.astype(cdt)
    wr = jnp.einsum(
        "blm,klmv->bkmv", frc, dmr, preferred_element_type=f32
    ) + jnp.einsum("blm,klmv->bkmv", fic, dmi, preferred_element_type=f32)
    wi = jnp.einsum(
        "blm,klmv->bkmv", frc, dmi, preferred_element_type=f32
    ) - jnp.einsum("blm,klmv->bkmv", fic, dmr, preferred_element_type=f32)
    # Only Newton consumes the f32 W rows; in grid mode XLA fuses the
    # adds + cast into the concat and materializes bf16 only.
    wstack = jnp.concatenate([wr, wi], axis=2).astype(cdt)
    # α-DFT over the stacked complex pair: T2[..., t] = (Tr, Ti) with
    # the c_m pair weights folded into cc.
    t2 = jnp.einsum(
        "Mat,bkMv->bkavt", cc, wstack, preferred_element_type=f32
    ).astype(cdt)
    # γ-DFT, real part only: X = Re(T e^{−iνγ}) = Tr·cos + Ti·sin.
    xcorr = jnp.einsum(
        "bkavt,vtg->bkag", t2, cgs, preferred_element_type=f32
    )
    return xcorr, wr, wi


@functools.partial(jax.jit, static_argnames=("bin_factor", "n_cells"))
def _top_cells_chunk(pats, wvec, yr, yi, dmr, dmi, cc, cgs, bin_factor,
                     n_cells):
    """Top ``n_cells`` correlation cells per pattern — the raw material
    of the pseudo-symmetry diagnostic (`SphericalIndexer.ambiguity`):
    the γ axis reduces first (as in the argmax path), then one
    `lax.top_k` over the small (k·a) survivor table ranks basins.
    Returns ``(scores (b, P), k, a, g)`` sorted descending."""
    xcorr, _, _ = _correlation_volume(
        pats, wvec, yr, yi, dmr, dmi, cc, cgs, bin_factor
    )
    b = xcorr.shape[0]
    a_n = xcorr.shape[2]
    mg = jnp.max(xcorr, axis=3)
    ig = jnp.argmax(xcorr, axis=3)
    vals, idx = jax.lax.top_k(mg.reshape(b, -1), n_cells)  # (b, P)
    k = idx // a_n
    a = idx % a_n
    g = jnp.take_along_axis(ig.reshape(b, -1), idx, axis=1)
    return vals, k, a, g


@functools.partial(
    jax.jit, static_argnames=("bin_factor", "refine_mode", "newton_steps")
)
def _correlate_chunk(
    pats, wvec, yr, yi, dmr, dmi, cc, cgs, bin_factor,
    refine_mode="grid", newton_steps=8,
):
    """One chunk of patterns → correlation peak (+ refinement).

    pats: (b, H, W) f32/uint8. All tables are device residents passed by
    reference.

    refine_mode="grid": returns (peak, k, a, g, neighborhood(b,3,3,3))
    — the raw argmax and its 3³ surroundings for host-side parabolic
    interpolation.

    refine_mode="newton": TRUE refinement of the band-limited correlation
    itself (the EMSphInx approach, VERDICT r4 #4) — the grid only
    *locates* the basin; the maximized function is the continuous
    ``X(β, α, γ) = Σ_mν W_mν(β)·[cos, sin](mα + νγ)``, which is an EXACT
    finite Fourier series in (α, γ) and smooth in β (``W_mν(β)`` rows are
    Lagrange-interpolated over 5 grid β's around the peak — the rows are
    band-limited with 2x-oversampled sampling, so quartic interpolation
    sits far below the accuracy floor). ``newton_steps`` damped Newton
    iterations via autodiff (forward-over-reverse Hessian of the scalar
    X), batched with vmap; steps are clamped to one grid cell and the
    best-seen point is tracked, so the result can never be worse than
    the grid argmax. Returns (score, beta, alpha, gamma) in radians.
    """
    b = pats.shape[0]
    xcorr, wr, wi = _correlation_volume(
        pats, wvec, yr, yi, dmr, dmi, cc, cgs, bin_factor
    )
    if refine_mode == "newton" and dmr.dtype != jnp.float32:
        # Newton only uses the volume to LOCATE the basin (the refined
        # value comes from the f32 W rows), so the (b,k,a,g) write can
        # ride the tables' bf16: +6.5% measured with bit-identical basin
        # selection on the accuracy oracle (r5 probe). The parabolic
        # path keeps f32 — its sub-grid offsets difference near-equal
        # neighbors — and so does the ambiguity diagnostic (bf16 would
        # quantize the score gaps it reports).
        xcorr = xcorr.astype(dmr.dtype)
    k_n, a_n, g_n = xcorr.shape[1:]
    # Hierarchical argmax: reduce the γ axis first (XLA fuses the
    # max/argmax pair into the producing fusion), then argmax the small
    # (k_n·a_n) survivor table — the flat argmax forced a full-size
    # layout copy of the (b, k·a·g) volume (0.8 ms at L=64, trace
    # 2026-08-20).
    mg = jnp.max(xcorr, axis=3)  # (b, k, a)
    ig = jnp.argmax(xcorr, axis=3)
    flat2 = mg.reshape(b, -1)
    best2 = jnp.argmax(flat2, axis=1)
    peak = jnp.take_along_axis(flat2, best2[:, None], axis=1)[:, 0]
    k = best2 // a_n
    a = best2 % a_n
    g = jnp.take_along_axis(
        ig.reshape(b, -1), best2[:, None], axis=1
    )[:, 0]
    if refine_mode != "newton":
        offs = jnp.arange(-1, 2)
        kk = jnp.clip(k[:, None] + offs[None, :], 0, k_n - 1)
        aa = (a[:, None] + offs[None, :]) % a_n
        gg = (g[:, None] + offs[None, :]) % g_n
        nb = xcorr[
            jnp.arange(b)[:, None, None, None],
            kk[:, :, None, None],
            aa[:, None, :, None],
            gg[:, None, None, :],
        ]
        return peak, k, a, g, nb

    # --- Newton refinement of the continuous correlation ---
    d_beta = jnp.pi / k_n
    d_alpha = 2.0 * jnp.pi / a_n
    # β stencil: 5 DISTINCT rows centered near the peak (shift the
    # stencil at the ends instead of clipping rows — duplicate Lagrange
    # nodes would be singular). One-hot matmul selection, not
    # take_along_axis: the slice gather forced full f32 materialization
    # + layout copies of W (~3.9 ms at L=64, trace 2026-08-20), while
    # the einsum consumes W in its produced layout. HIGHEST keeps the
    # selection exact in f32 (it is a 0/1 matrix).
    center = jnp.clip(k, 2, k_n - 3)
    rows = center[:, None] + jnp.arange(-2, 3)[None, :]
    onehot = jax.nn.one_hot(rows, k_n, dtype=jnp.float32)  # (b, 5, k)
    wr5 = jnp.einsum(
        "bjk,bkmv->bjmv", onehot, wr, precision=jax.lax.Precision.HIGHEST
    )
    wi5 = jnp.einsum(
        "bjk,bkmv->bjmv", onehot, wi, precision=jax.lax.Precision.HIGHEST
    )
    # Hermitian half-plane: rows are m ∈ [0, L), columns ν full; the
    # pair weights c_m re-apply here (the table-folded copies only feed
    # the grid DFTs).
    m_half = dmr.shape[2]  # m >= 0 rows (the bandwidth L)
    ms_m = jnp.arange(0, m_half, dtype=jnp.float32)
    ms_v = jnp.arange(-(m_half - 1), m_half, dtype=jnp.float32)
    pair_w = jnp.where(ms_m == 0, 1.0, 2.0)[:, None]
    nodes = jnp.arange(-2.0, 3.0)

    def xval(p, w5r, w5i):
        t = p[0]
        lw = []
        for j in range(5):
            basis = 1.0
            for i in range(5):
                if i != j:
                    basis = basis * (t - nodes[i]) / (nodes[j] - nodes[i])
            lw.append(basis)
        lw = jnp.stack(lw)
        wr_t = jnp.einsum("j,jmv->mv", lw, w5r)
        wi_t = jnp.einsum("j,jmv->mv", lw, w5i)
        ang = ms_m[:, None] * p[1] + ms_v[None, :] * p[2]
        return jnp.sum(
            pair_w * (wr_t * jnp.cos(ang) + wi_t * jnp.sin(ang))
        )

    step_lim = jnp.asarray([1.0, d_alpha, d_alpha], jnp.float32)

    def refine_one(w5r, w5i, t0, a0, g0):
        p = jnp.stack([t0, a0, g0])

        def neg(q):
            return -xval(q, w5r, w5i)

        best_p, best_v = p, neg(p)
        for _ in range(newton_steps):
            grad = jax.grad(neg)(p)
            hess = jax.jacfwd(jax.grad(neg))(p)
            lam = 1e-3 * jnp.maximum(
                jnp.max(jnp.abs(jnp.diagonal(hess))), jnp.float32(1e-6)
            )
            d = jnp.linalg.solve(hess + lam * jnp.eye(3), grad)
            d = jnp.clip(d, -step_lim, step_lim)
            p = p - d
            p = p.at[0].set(jnp.clip(p[0], -2.0, 2.0))
            v = neg(p)
            take = v < best_v
            best_p = jnp.where(take, p, best_p)
            best_v = jnp.where(take, v, best_v)
        return best_p, -best_v

    t0 = (k - center).astype(jnp.float32)
    a0 = a.astype(jnp.float32) * d_alpha
    g0 = g.astype(jnp.float32) * d_alpha
    ps, vals = jax.vmap(refine_one)(wr5, wi5, t0, a0, g0)
    beta = (center.astype(jnp.float32) + 0.5 + ps[:, 0]) * d_beta
    return vals, beta, ps[:, 1], ps[:, 2]


def _parabolic_offset(xm: np.ndarray, x0: np.ndarray, xp: np.ndarray):
    """Sub-grid peak offset of a 3-point parabola, clamped to ±0.5."""
    denom = xm - 2.0 * x0 + xp
    safe = np.abs(denom) > 1e-12
    off = np.where(safe, 0.5 * (xm - xp) / np.where(safe, denom, 1.0), 0.0)
    return np.clip(off, -0.5, 0.5)


def projection_tables(
    bandwidth: int,
    geometry: DetectorGeometry,
    detector_bin: int = 1,
    beta_count: int | None = None,
) -> dict:
    """Phase-independent host tables for `SphericalIndexer` setup.

    The SH projection matrices (`sph_matrix_dense`) and the Wigner
    ``d`` table (`wigner_d_table`) depend only on (bandwidth, binned
    geometry, β grid) — not on the master — and dominate setup cost
    (~40 s at L=64). Compute them ONCE and pass via
    ``SphericalIndexer(..., tables=...)`` when building several indexers
    at the same bandwidth/geometry (`MultiPhaseSphericalIndexer` does
    this automatically; r4 advisor finding): K phases then pay one table
    build instead of K.

    Returns an opaque dict (full, un-sliced float64 arrays — each
    indexer applies its own master's kept-degree slice).
    """
    L = bandwidth
    h, w = geometry.shape
    if h % detector_bin or w % detector_bin:
        raise ValueError(
            f"detector_bin={detector_bin} does not divide "
            f"detector shape {geometry.shape}"
        )
    bin_geom = (
        geometry
        if detector_bin == 1
        else dataclasses.replace(
            geometry, shape=(h // detector_bin, w // detector_bin)
        )
    )
    dirs = pixel_directions(bin_geom).reshape(-1, 3).astype(np.float64)
    omega = _solid_angle_weights(bin_geom)
    yr, yi = sph_matrix_dense(L, dirs, omega)
    k_n = beta_count or 2 * L
    betas = (np.arange(k_n) + 0.5) * (np.pi / k_n)
    return dict(
        bandwidth=L,
        bin_shape=bin_geom.shape,
        omega=omega,
        yr=yr,
        yi=yi,
        betas=betas,
        d=wigner_d_table(L, betas),
    )


class SphericalIndexer:
    """Index patterns by spherical cross-correlation against a master.

    Args:
        master: ``(N, N)`` master image in `sim.master`'s equal-area
            convention (`dynamical_master_pattern`, `index.py master`,
            or an imported external master).
        geometry: detector description the patterns were captured with.
        config: `SphericalIndexerConfig`.

    Setup cost is one-time per (master, geometry): harmonic analysis of
    the master, the Wigner ``m̂·d`` tables, and the windowed projection
    matrices; ~100 MB–2 GB of device residency depending on bandwidth.

    Multi-chip: pass ``mesh=`` to data-parallelize over the pattern
    batch — tables replicate, each chunk shards over the mesh's first
    axis (every stage of the correlation is batch-parallel, so GSPMD
    inserts no collectives at all); ``config.chunk`` must divide by the
    device count. Mesh grid peaks match single-device bit-for-bit; the
    Newton-refined point agrees to ~1e-5 (8 iterated f32 steps expose
    GSPMD layout rounding) — dryrun-asserted in
    `__graft_entry__.dryrun_multichip`.
    """

    def __init__(
        self,
        master: np.ndarray,
        geometry: DetectorGeometry | None = None,
        config: SphericalIndexerConfig | None = None,
        mesh=None,
        tables: dict | None = None,
    ):
        self.geometry = geometry or DetectorGeometry()
        self.config = config or SphericalIndexerConfig()
        cfg = self.config
        L = cfg.bandwidth
        h, w = self.geometry.shape
        if h % cfg.detector_bin or w % cfg.detector_bin:
            raise ValueError(
                f"detector_bin={cfg.detector_bin} does not divide "
                f"detector shape {self.geometry.shape}"
            )
        if tables is None:
            tables = projection_tables(
                L, self.geometry, cfg.detector_bin, cfg.beta_count
            )
        elif (
            tables["bandwidth"] != L
            or tables["bin_shape"]
            != (h // cfg.detector_bin, w // cfg.detector_bin)
            or len(tables["betas"]) != (cfg.beta_count or 2 * L)
        ):
            raise ValueError(
                "precomputed tables do not match this indexer's "
                "(bandwidth, binned shape, beta grid)"
            )

        coef = master_sph_coefficients(master, L)
        # Friedel/sparse degrees: keep only l rows that carry master
        # energy — the dominant einsum and the Wigner tables shrink with
        # them (odd l vanish for every centrosymmetric master).
        l_norm = np.sqrt(np.sum(np.abs(coef) ** 2, axis=1))
        keep = np.flatnonzero(l_norm > 1e-6 * l_norm.max())
        self._l_keep = keep
        logger.info(
            f"spherical indexer: bandwidth {L}, {len(keep)}/{L} degrees "
            f"carry master energy"
        )

        omega = tables["omega"]
        n_dirs = len(omega)
        m_dim = 2 * L - 1
        # Hermitian half-plane (module docstring): only the m ≥ 0
        # projection columns and Wigner rows are kept; the α-DFT tables
        # fold the c_m pair weights.
        yr = (
            tables["yr"]
            .reshape(-1, L, m_dim)[:, keep, L - 1 :]
            .reshape(n_dirs, -1)
        )
        yi = (
            tables["yi"]
            .reshape(-1, L, m_dim)[:, keep, L - 1 :]
            .reshape(n_dirs, -1)
        )

        a_n = cfg.alpha_count or 2 * L
        self._betas = tables["betas"]
        self._alphas = np.arange(a_n) * (2.0 * np.pi / a_n)
        d_tab = tables["d"][:, keep][:, :, L - 1 :, :]  # m ≥ 0 rows, ν full
        mk = coef[keep]
        dmr = d_tab * mk.real[None, :, None, :]
        dmi = d_tab * mk.imag[None, :, None, :]
        # Block DFT coefficient tables for the stacked [W_r; W_i] pair
        # (`_correlate_chunk` docstring): cc (2L, a, 2) carries the α-DFT
        # of both T components with the c_m pair weights folded; cgs
        # (2L−1, 2, g) the γ-DFT (γ grid == α grid).
        ms_half = np.arange(0, L, dtype=np.float64)
        pair = np.where(ms_half == 0, 1.0, 2.0)[:, None]
        ang_a = ms_half[:, None] * self._alphas[None, :]
        cm = pair * np.cos(ang_a)
        sm = pair * np.sin(ang_a)
        cc = np.zeros((2 * L, a_n, 2))
        cc[:L, :, 0] = cm  # Tr ← cos · Wr
        cc[L:, :, 0] = sm  # Tr ← sin · Wi
        cc[:L, :, 1] = -sm  # Ti ← −sin · Wr
        cc[L:, :, 1] = cm  # Ti ← cos · Wi
        ms_full = np.arange(-(L - 1), L, dtype=np.float64)
        ang_g = ms_full[:, None] * self._alphas[None, :]
        cgs = np.stack([np.cos(ang_g), np.sin(ang_g)], axis=1)

        # bf16 residents on TPU — identical MXU inputs to XLA's default
        # matmul precision, without re-converting ~0.5 GB of tables per
        # dispatch; true-f32 on CPU (tests). See the module docstring.
        tdt = (
            jnp.float32
            if jax.default_backend() == "cpu"
            else jnp.bfloat16
        )
        self._dev = dict(
            wvec=jnp.asarray(omega, jnp.float32),
            yr=jnp.asarray(yr, tdt),
            yi=jnp.asarray(yi, tdt),
            dmr=jnp.asarray(dmr, tdt),
            dmi=jnp.asarray(dmi, tdt),
            cc=jnp.asarray(cc, tdt),
            cgs=jnp.asarray(cgs, tdt),
        )
        self._bin_shape = tables["bin_shape"]
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = mesh.devices.size
            if cfg.chunk % n_dev:
                raise ValueError(
                    f"chunk={cfg.chunk} must divide by the mesh's "
                    f"{n_dev} devices"
                )
            # Tables replicate; pattern chunks shard over the batch axis.
            rep = NamedSharding(mesh, P())
            self._dev = {
                k: jax.device_put(v, rep) for k, v in self._dev.items()
            }
            self._batch_sharding = NamedSharding(
                mesh, P(mesh.axis_names[0])
            )

    def index_patterns(self, patterns: np.ndarray) -> SphericalResult:
        """Solve orientations for a ``(B, H, W)`` pattern stack (f32 or
        uint8). Returns FZ-reduced quaternions, zxz Euler degrees and
        correlation scores."""
        from scipy.spatial.transform import Rotation as R

        p = np.asarray(patterns)
        if p.ndim == 2:
            p = p[None]
        if p.ndim != 3 or p.shape[1:] != self.geometry.shape:
            raise ValueError(
                f"expected (B, {self.geometry.shape[0]}, "
                f"{self.geometry.shape[1]}) patterns, got {p.shape}"
            )
        if p.dtype != np.uint8:
            p = p.astype(np.float32)
        cfg = self.config
        n = len(p)
        mode = cfg.refine_mode
        peaks = np.empty(n, np.float64)
        if mode == "newton":
            beta = np.empty(n, np.float64)
            alpha = np.empty(n, np.float64)
            gamma = np.empty(n, np.float64)
        else:
            ks = np.empty(n, np.int64)
            as_ = np.empty(n, np.int64)
            gs = np.empty(n, np.int64)
            nbs = np.empty((n, 3, 3, 3), np.float64)
        for start in range(0, n, cfg.chunk):
            pc = p[start : start + cfg.chunk]
            m = len(pc)
            if m < cfg.chunk:  # pad to the static compile shape
                pc = np.concatenate(
                    [pc, np.repeat(pc[-1:], cfg.chunk - m, axis=0)]
                )
            pc_dev = (
                jnp.asarray(pc)
                if self._batch_sharding is None
                else jax.device_put(pc, self._batch_sharding)
            )
            sl = slice(start, start + m)
            if mode == "newton":
                val, bb, aa, gg = _correlate_chunk(
                    pc_dev, bin_factor=cfg.detector_bin,
                    refine_mode="newton", newton_steps=cfg.newton_steps,
                    **self._dev,
                )
                peaks[sl] = np.asarray(val)[:m]
                beta[sl] = np.asarray(bb)[:m]
                alpha[sl] = np.asarray(aa)[:m]
                gamma[sl] = np.asarray(gg)[:m]
            else:
                peak, k, a, g, nb = _correlate_chunk(
                    pc_dev, bin_factor=cfg.detector_bin, **self._dev
                )
                peaks[sl] = np.asarray(peak)[:m]
                ks[sl] = np.asarray(k)[:m]
                as_[sl] = np.asarray(a)[:m]
                gs[sl] = np.asarray(g)[:m]
                nbs[sl] = np.asarray(nb)[:m]

        if mode != "newton":
            d_beta = np.pi / len(self._betas)
            d_alpha = 2.0 * np.pi / len(self._alphas)
            if mode == "parabolic":
                ok = _parabolic_offset(
                    nbs[:, 0, 1, 1], nbs[:, 1, 1, 1], nbs[:, 2, 1, 1]
                )
                oa = _parabolic_offset(
                    nbs[:, 1, 0, 1], nbs[:, 1, 1, 1], nbs[:, 1, 2, 1]
                )
                og = _parabolic_offset(
                    nbs[:, 1, 1, 0], nbs[:, 1, 1, 1], nbs[:, 1, 1, 2]
                )
            else:
                ok = oa = og = 0.0
            beta = (ks + 0.5 + ok) * d_beta
            alpha = (as_ + oa) * d_alpha
            gamma = (gs + og) * d_alpha
        rot = R.from_euler(
            "ZYZ", np.stack([alpha, beta, gamma], axis=1)
        )
        quats = np.roll(rot.as_quat(), 1, axis=1)  # scalar-first
        quats = reduce_to_fundamental_zone(quats, cfg.symmetry)
        eulers = R.from_quat(np.roll(quats, -1, axis=1)).as_euler(
            "zxz", degrees=True
        )
        return SphericalResult(
            quaternions=quats.astype(np.float32),
            eulers_deg=eulers.astype(np.float32),
            scores=peaks.astype(np.float32),
        )

    def ambiguity(
        self,
        patterns: np.ndarray,
        n_cells: int = 32,
        min_separation_deg: float | None = None,
    ):
        """Pseudo-symmetry diagnostic from the secondary SO(3) peaks.

        The correlation volume ranks EVERY orientation at once, so the
        best *rival* basin — the highest-scored cell whose
        symmetry-reduced disorientation from the winner exceeds
        ``min_separation_deg`` (grid neighbors of the same solution
        don't count) — is available for free, where the dictionary
        planes need `index.diagnostics.candidate_ambiguity` over their
        top-k lists. Pseudo-symmetric phases (hexagonal 30°-about-c,
        tetragonal c/a ≈ 1) show up as small ``score_gap``: flag those
        pixels, exactly the secondary-peak diagnostic EMSphInx reports.

        Args:
            patterns: ``(B, H, W)`` stack (f32 or uint8).
            n_cells: correlation cells ranked per pattern (the rival
                search depth; the top basin spans a few neighboring
                cells, so keep this comfortably above 2).
            min_separation_deg: disorientation below which a cell counts
                as the winner's own basin rather than a rival. Default:
                2× the SO(3) grid spacing (2·180°/L — the basin
                covering radius, the same 2x rule the hough vote uses),
                so adjacent/diagonal cells of the winner's own peak
                never masquerade as rivals.

        Returns:
            `index.diagnostics.AmbiguityResult` — the same vocabulary
            (``angle_deg``/``score_gap``/``has_rival`` + ``ambiguous()``)
            as the dictionary planes' diagnostic.
        """
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.index.diagnostics import AmbiguityResult

        if n_cells < 2:
            raise ValueError(f"n_cells must be >= 2, got {n_cells}")
        if min_separation_deg is None:
            min_separation_deg = 2.0 * 180.0 / self.config.bandwidth
        p = np.asarray(patterns)
        if p.ndim == 2:
            p = p[None]
        if p.ndim != 3 or p.shape[1:] != self.geometry.shape:
            raise ValueError(
                f"expected (B, {self.geometry.shape[0]}, "
                f"{self.geometry.shape[1]}) patterns, got {p.shape}"
            )
        if p.dtype != np.uint8:
            p = p.astype(np.float32)
        cfg = self.config
        n = len(p)
        vals = np.empty((n, n_cells), np.float64)
        ks = np.empty((n, n_cells), np.int64)
        as_ = np.empty((n, n_cells), np.int64)
        gs = np.empty((n, n_cells), np.int64)
        for start in range(0, n, cfg.chunk):
            pc = p[start : start + cfg.chunk]
            m = len(pc)
            if m < cfg.chunk:  # pad to the static compile shape
                pc = np.concatenate(
                    [pc, np.repeat(pc[-1:], cfg.chunk - m, axis=0)]
                )
            pc_dev = (
                jnp.asarray(pc)
                if self._batch_sharding is None
                else jax.device_put(pc, self._batch_sharding)
            )
            v, k, a, g = _top_cells_chunk(
                pc_dev, bin_factor=cfg.detector_bin, n_cells=n_cells,
                **self._dev,
            )
            sl = slice(start, start + m)
            vals[sl] = np.asarray(v)[:m]
            ks[sl] = np.asarray(k)[:m]
            as_[sl] = np.asarray(a)[:m]
            gs[sl] = np.asarray(g)[:m]

        # Host: grid cells → rotations → first genuinely different rival.
        d_beta = np.pi / len(self._betas)
        d_alpha = 2.0 * np.pi / len(self._alphas)
        beta = (ks + 0.5) * d_beta
        alpha = as_ * d_alpha
        gamma = gs * d_alpha
        eul = np.stack([alpha, beta, gamma], axis=-1).reshape(-1, 3)
        cells = R.from_euler("ZYZ", eul).as_quat().reshape(n, n_cells, 4)
        sym_q = np.roll(ROTATION_GROUPS[cfg.symmetry], -1, axis=1)  # xyzw
        # rel_i = top_i^{-1} ∘ cell_ij for every secondary cell, then the
        # symmetry-reduced disorientation via the unit-quaternion
        # identity cos(θ_g/2) = |⟨rel, g⟩| (the group is inversion-closed
        # so reducing rel∘g and reading the dot against g coincide).
        top = R.from_quat(np.repeat(cells[:, 0], n_cells - 1, axis=0))
        others = R.from_quat(cells[:, 1:].reshape(-1, 4))
        rel = (top.inv() * others).as_quat()
        cosh = np.abs(rel @ sym_q.T).max(axis=1)
        dis = 2.0 * np.degrees(
            np.arccos(np.clip(cosh, -1.0, 1.0))
        ).reshape(n, n_cells - 1)
        rival_mask = dis > min_separation_deg
        has = rival_mask.any(axis=1)
        first = np.argmax(rival_mask, axis=1)  # valid only where has
        rows = np.arange(n)
        angle = np.where(has, dis[rows, first], np.nan)
        gap = np.where(
            has, vals[:, 0] - vals[rows, first + 1], np.nan
        )
        return AmbiguityResult(
            angle_deg=angle, score_gap=gap, has_rival=has
        )


@dataclasses.dataclass(frozen=True)
class MultiPhaseSphericalResult:
    """Multi-phase batch result: the winning phase's solution per pattern
    plus the full per-phase score matrix (the phase-discrimination
    ambiguity diagnostic, analogous to `index.diagnostics`' margins)."""

    quaternions: np.ndarray  # (B, 4) scalar-first, winning phase's FZ
    eulers_deg: np.ndarray  # (B, 3) zxz degrees
    scores: np.ndarray  # (B,) winning correlation score
    phase: np.ndarray  # (B,) int64 index into the masters list
    phase_scores: np.ndarray  # (B, K) per-phase peak correlations

    def __len__(self) -> int:
        return len(self.quaternions)


class MultiPhaseSphericalIndexer:
    """Phase discrimination + orientation, dictionary-free.

    One `SphericalIndexer` per candidate phase's master pattern; each
    pattern is cross-correlated against every master over all of SO(3)
    and the per-pixel phase is the master with the highest peak. The
    peak scores are cross-master comparable because both sides of the
    correlation are unit-normalized (`master_sph_coefficients` divides
    by the total harmonic energy; `_correlate_chunk` normalizes the
    windowed back-projection), making X(R) a cosine — the same
    normalized-score argmax the pattern-NCC DI and multi-phase Hough
    planes use for phase picking. The reference is single-phase end to
    end (reference dp_indexer.py:51, constants.py:13-39 cubic only).

    Args:
        masters: sequence of ``(N, N)`` master images, one per phase
            (sizes may differ; each is analyzed independently).
        geometry: shared detector description.
        config: shared `SphericalIndexerConfig`; per-phase symmetry
            comes from ``symmetries`` (``config.symmetry`` is the
            fallback for every phase).
        symmetries: optional per-phase proper point-group names for the
            fundamental-zone reduction (e.g. ``["432", "622"]``).
        mesh: optional `jax.sharding.Mesh`, forwarded to every
            per-phase indexer (tables replicate, pattern chunks shard).

    The dominant setup cost (SH projection matrices + Wigner table,
    `projection_tables`) is phase-independent and paid ONCE; only the
    per-master harmonic analysis and kept-degree slicing repeat, so K
    phases set up in ~the time of one. Device residency still scales
    with K (the kept-degree sets differ per master, so the device tables
    and programs genuinely differ); the per-pattern cost is K
    single-phase correlations.
    """

    def __init__(
        self,
        masters,
        geometry: DetectorGeometry | None = None,
        config: SphericalIndexerConfig | None = None,
        symmetries=None,
        mesh=None,
    ):
        masters = list(masters)
        if not masters:
            raise ValueError("need at least one master pattern")
        cfg = config or SphericalIndexerConfig()
        if symmetries is None:
            symmetries = [cfg.symmetry] * len(masters)
        symmetries = list(symmetries)
        if len(symmetries) != len(masters):
            raise ValueError(
                f"{len(masters)} masters but {len(symmetries)} symmetries"
            )
        self.config = cfg
        self.symmetries = symmetries
        # One table build for all K phases (the dominant setup cost is
        # phase-independent — r4 advisor finding); each indexer applies
        # its own master's kept-degree slice. Freed after the loop.
        tables = projection_tables(
            cfg.bandwidth,
            geometry or DetectorGeometry(),
            cfg.detector_bin,
            cfg.beta_count,
        )
        self.indexers = [
            SphericalIndexer(
                m,
                geometry,
                dataclasses.replace(cfg, symmetry=s),
                mesh=mesh,
                tables=tables,
            )
            for m, s in zip(masters, symmetries)
        ]
        del tables

    def index_patterns(self, patterns: np.ndarray) -> MultiPhaseSphericalResult:
        """Solve phase + orientation for a ``(B, H, W)`` stack (f32 or
        uint8). Returns the winning phase's FZ quaternion/Euler solution
        per pattern and the full (B, K) score matrix."""
        results = [ix.index_patterns(patterns) for ix in self.indexers]
        phase_scores = np.stack([r.scores for r in results], axis=1)
        phase = phase_scores.argmax(axis=1)
        rows = np.arange(len(phase))
        quats = np.stack([r.quaternions for r in results], axis=1)
        eulers = np.stack([r.eulers_deg for r in results], axis=1)
        return MultiPhaseSphericalResult(
            quaternions=quats[rows, phase],
            eulers_deg=eulers[rows, phase],
            scores=phase_scores[rows, phase],
            phase=phase.astype(np.int64),
            phase_scores=phase_scores.astype(np.float32),
        )
