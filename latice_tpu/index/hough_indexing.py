"""Hough-based orientation indexing: detected bands → orientation.

The third indexing plane, completing the vendor triangle next to latent
indexing (`index.pipeline`) and pattern dictionary indexing
(`index.pattern_di`): OIM/Esprit/AZtec all index by finding Kikuchi bands
with a Radon ("Hough") transform and solving for the orientation that maps
crystal plane normals onto the measured band planes. The reference has no
band-based indexing at all (its only path is latent k-NN,
dp_indexer.py:188-214); this module provides the classic vendor algorithm
natively, with the combinatorics re-designed for the MXU:

1. `data.hough.BandDetector` finds the k strongest bands as Radon peaks
   ``(theta, rho)``.
2. `band_plane_normals` inverts the exact gnomonic detector model
   (`sim.geometry`): each detected band line, together with the beam
   source point, spans the Kikuchi *band plane*; its unit normal in the
   detector frame is closed-form (derivation in the function docstring).
3. Grid voting replaces CPU triplet voting: a fundamental-zone orientation
   grid (`crystal.sampling.sample_fundamental_zone`) is expanded once into
   rotated reflector normals ``(M, K, 3)``; scoring every pattern's
   measured normals against every candidate is then one chunked
   ``(B·Nb, 3) × (3, M·K)`` contraction + masked reductions — no
   data-dependent control flow, one XLA program. Interplanar-angle triplet
   lookup tables (the vendor approach) are a pruning trick for CPUs that
   cannot afford the full scan; the MXU can.
4. Davenport's q-method refines the winning candidate: each band is
   assigned its nearest rotated reflector (one-hot selection — no gathers),
   and the optimal rotation for the weighted assignment is the principal
   eigenvector of the 4×4 Davenport matrix (batched `eigh`), iterated a
   fixed 2 rounds. Accuracy lands well below the Radon bin resolution.

Outputs mirror the latent plane's result vocabulary (orientations as
scalar-first quaternions + zxz Euler degrees, per-pattern fit/confidence)
so downstream analysis (.ang export, grain maps) composes unchanged.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.data.hough import BandDetection, BandDetector
from latice_tpu.sim.geometry import DetectorGeometry

__all__ = [
    "HoughIndexResult",
    "HoughIndexer",
    "MultiPhaseHoughIndexer",
    "MultiPhaseHoughResult",
    "band_plane_normals",
    "solve_wahba",
]


def band_plane_normals(
    theta_deg: np.ndarray,
    rho_px: np.ndarray,
    geometry: DetectorGeometry,
) -> np.ndarray:
    """Unit normals of the Kikuchi band planes, detector frame.

    A detected Radon line (``theta``, ``rho``: `data.hough` conventions —
    pixel coordinates centered on the image, x right / y up) lies in the
    detector plane ``z = dd`` of the gnomonic model (`sim.geometry`: the
    beam source sits at the origin, pcx/pcy offset the pixel grid). The
    band's *plane* contains that line and the source, so its normal is the
    cross product of the line's foot point ``P0`` (3-D) with the line
    direction ``t = (-sin θ, cos θ, 0)``:

        n ∝ P0 × t = (−dd·cosθ, −dd·sinθ, ρ/W + cx0·cosθ + cy0·sinθ)

    with ``cx0 = 1/2 − pcx``, ``cy0 = H/(2W) − pcy`` the image-center
    offset from the pattern center in detector-width units and ``ρ/W`` the
    Radon distance rescaled from pixels. Detector tilt rotates the normal
    exactly as `sim.geometry.pixel_directions` rotates pixel directions.

    The sign of a plane normal is inherently ambiguous (a band is a plane,
    not a direction); consumers must compare via ``|dot|``.

    Args:
        theta_deg / rho_px: any matching shape (e.g. ``(B, k)``).
        geometry: the detector model the patterns were captured with.

    Returns:
        ``theta_deg.shape + (3,)`` float64 unit normals.
    """
    h, w = geometry.shape
    th = np.radians(np.asarray(theta_deg, np.float64))
    rho = np.asarray(rho_px, np.float64) / w
    cx0 = 0.5 - geometry.pcx
    cy0 = h / (2.0 * w) - geometry.pcy
    ct, st = np.cos(th), np.sin(th)
    n = np.stack(
        [
            -geometry.dd * ct,
            -geometry.dd * st,
            rho + cx0 * ct + cy0 * st,
        ],
        axis=-1,
    )
    if geometry.tilt:
        t = math.radians(geometry.tilt)
        rot = np.array(
            [
                [1.0, 0.0, 0.0],
                [0.0, math.cos(t), -math.sin(t)],
                [0.0, math.sin(t), math.cos(t)],
            ]
        )
        n = n @ rot.T
    return n / np.linalg.norm(n, axis=-1, keepdims=True)


def _rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors ``v (K, 3)`` by quaternions ``q (B, 4)`` (scalar-first)
    → ``(B, K, 3)``. Same expansion as the renderer's (sim/kinematical.py)."""
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(-1, 3, 3)
    return jnp.einsum("bij,kj->bki", r, v)


def solve_wahba(
    b_mat: jax.Array,
    init: jax.Array | None = None,
    iterations: int = 64,
) -> jax.Array:
    """Davenport q-method: optimal rotation from a cross-covariance stack.

    Given ``b_mat (..., 3, 3)`` = Σᵢ wᵢ·nᵢ·cᵢᵀ over paired unit vectors
    (``n`` observed in the detector frame, ``c`` in the crystal frame),
    returns the scalar-first unit quaternion of the proper rotation R
    (crystal → detector) maximizing Σ wᵢ·nᵢᵀ·R·cᵢ — the principal
    eigenvector of the 4×4 Davenport matrix (unlike SVD-based Kabsch
    there is no reflection branch to fix). The classic q-method solves
    the *passive* (attitude-matrix) convention, whose quaternion is the
    conjugate of the active scipy-style rotation used throughout this
    repo — the conjugation below converts; pinned by tests against scipy
    rotations.

    Args:
        init: optional ``(..., 4)`` scalar-first ACTIVE quaternion near
            the solution. When given, the principal eigenvector is found
            by shifted power iteration seeded at ``init``, applied as
            ``ceil(log2(iterations))`` repeated SQUARINGS of the
            normalized shifted matrix — ~6 fuseable 4×4 matmuls instead
            of an eigendecomposition. `jnp.linalg.eigh` on TPU is an
            iterative Jacobi program (while-loop + custom calls + sorts)
            that measured **51.5 ms of the hough solve's 62.7 ms** at
            b256×16 candidates (trace 2026-08-20); the squaring path
            solves the same batch in the fusion noise. The shift
            ``‖K‖_F + ε`` ≥ ρ(K) makes the iteration matrix PSD so the
            power limit is the MOST POSITIVE eigenvalue (not the largest
            magnitude); the measured worst-case spectral ratio ~0.85
            (noisy partial-match fits) still contracts to f32 precision
            at the default 64 effective steps. Without ``init`` the
            exact `eigh` path is used.
    """
    tr = jnp.trace(b_mat, axis1=-2, axis2=-1)
    z = jnp.stack(
        [
            b_mat[..., 1, 2] - b_mat[..., 2, 1],
            b_mat[..., 2, 0] - b_mat[..., 0, 2],
            b_mat[..., 0, 1] - b_mat[..., 1, 0],
        ],
        axis=-1,
    )
    s = b_mat + jnp.swapaxes(b_mat, -1, -2)
    eye = jnp.eye(3, dtype=b_mat.dtype)
    lower = s - tr[..., None, None] * eye
    top = jnp.concatenate([tr[..., None, None], z[..., None, :]], axis=-1)
    bottom = jnp.concatenate([z[..., :, None], lower], axis=-1)
    k4 = jnp.concatenate([top, bottom], axis=-2)
    conj = jnp.asarray([1.0, -1.0, -1.0, -1.0], b_mat.dtype)
    if init is None:
        _, vecs = jnp.linalg.eigh(k4)
        q = vecs[..., -1]  # largest eigenvalue
    else:
        # Active → passive seed (the eigenvector convention of K).
        v = init * conj
        # Frobenius norm bounds the spectral radius; ε keeps a zero K
        # (fully masked fit — callers gate those) at the seed instead of
        # 0/0.
        shift = jnp.sqrt(
            jnp.sum(k4 * k4, axis=(-2, -1), keepdims=True)
        ) + 1e-6
        m = k4 + shift * jnp.eye(4, dtype=b_mat.dtype)
        # Repeated squaring: m^(2^j), renormalized each squaring so the
        # amplified spectrum stays in f32 range. Unrolled on purpose
        # (a lax loop of tiny 4×4 matmuls becomes padded micro-kernels
        # on TPU; unrolled, XLA fuses the chain — same rationale as
        # crystal.quaternion.quat_mean).
        for _ in range(max(1, math.ceil(math.log2(max(iterations, 2))))):
            m = jnp.einsum("...ij,...jk->...ik", m, m)
            m = m / jnp.maximum(
                jnp.sqrt(jnp.sum(m * m, axis=(-2, -1), keepdims=True)),
                1e-30,
            )
        v = jnp.einsum("...ij,...j->...i", m, v)
        q = v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30
        )
    # Passive → active: conjugate. Canonical sign (scalar ≥ 0) on top:
    # the eigenvector sign is arbitrary.
    q = q * conj
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


class HoughIndexResult(NamedTuple):
    """Per-pattern Hough-indexing solution (host numpy)."""

    quaternions: np.ndarray  # (B, 4) scalar-first, fundamental zone
    eulers_deg: np.ndarray  # (B, 3) zxz Euler degrees
    fit_deg: np.ndarray  # (B,) weighted mean band residual, degrees
    n_matched: np.ndarray  # (B,) bands within tolerance of a reflector
    vote_score: np.ndarray  # (B,) winning grid candidate's vote
    success: np.ndarray  # (B,) bool, >= min_bands matched
    bands: BandDetection  # raw detection (theta/rho/strength/iq)
    band_score: np.ndarray | None = None  # (B,) soft band-credit rank of
    # the winner — the candidate-selection score (see _index_bands), also
    # the phase-discrimination score in `MultiPhaseHoughIndexer`


class HoughIndexer:
    """Band-based orientation indexing (the vendor Hough-indexing role).

    Zero training, zero dictionary patterns: only a reflector table and the
    detector geometry. Typical accuracy is set by the Radon bin resolution
    (~1° at the defaults) rather than the orientation grid — the q-method
    refinement solves continuously below the grid spacing.

    Args:
        reflectors: `sim.Reflectors` table (e.g. `sim.cubic_reflectors()`);
            entries below ``min_intensity`` are dropped for voting — the
            vendor practice of indexing on the strong low-index families.
        geometry: detector model the patterns were captured with.
        group: proper point group for the orientation grid / FZ reduction.
        grid_resolution_deg: mean spacing of the voting grid. 3° is ample:
            the vote only has to rank the right basin first; refinement
            does the rest.
        n_bands: bands detected and used per pattern. 8 suffices for
            cubic; pseudo-symmetric phases (hcp's 30°-about-c twin) keep
            a ~1% misindex tail at 8 bands on 64² patterns that vanishes
            at 10 (measured 1/96 → 0/96; vendors run 9-12 for hexagonal).
        tolerance_deg: band-to-reflector residual treated as a match.
        min_bands: matched-band count below which ``success`` is False.
        top_candidates: grid candidates refined per pattern; the winner is
            re-ranked by matched-band count + residual AFTER refinement —
            the wide vote gate (grid covering radius) cannot separate
            near-tied basins, so the list must be deep enough to contain
            the true one (refining a candidate costs ~nothing next to the
            vote scan).
        refine_iters: q-method assign/solve rounds (fixed, jit-friendly).
        batch_size: static compile batch (inputs padded up to it).
        detector: optional pre-built `BandDetector` (geometry shape must
            match); default builds one at the module defaults.
        grid_chunk: grid candidates scored per scan step — bounds the
            ``(B, n_bands, grid_chunk, K)`` vote tensor.
        intensity_weight: weight of the band-intensity factor in the soft
            band-credit ranking (0 disables the factor; see
            `_index_bands`). Geometric pseudo-symmetries (the hcp
            30°-about-c twin swaps {10-10}↔{11-20} with every interplanar
            angle preserved) leave residuals identical; matching strong
            measured bands to strong reflectors is what breaks them — the
            vendor band-intensity rule.
        mesh: optional `jax.sharding.Mesh` — the orientation grid (this
            plane's dictionary) shards over the mesh's first axis; each
            device votes + refines its block and the winners merge with
            one small all_gather by band-credit rank
            (`_make_sharded_solver`). Fine grids / large groups scale
            1/n per device like the k-NN's row-sharded dictionary.
    """

    def __init__(
        self,
        reflectors,
        geometry: DetectorGeometry | None = None,
        group: str = "432",
        grid_resolution_deg: float = 3.0,
        n_bands: int = 8,
        tolerance_deg: float = 3.0,
        min_bands: int = 4,
        min_intensity: float = 0.05,
        top_candidates: int = 16,
        refine_iters: int = 2,
        batch_size: int = 256,
        detector: BandDetector | None = None,
        grid_chunk: int = 256,
        intensity_weight: float = 0.5,
        mesh=None,
    ) -> None:
        from latice_tpu.crystal.sampling import sample_fundamental_zone

        self.geometry = geometry or DetectorGeometry()
        h, w = self.geometry.shape
        self.group = group
        self.n_bands = n_bands
        self.min_bands = min_bands
        self.batch_size = batch_size
        self.refine_iters = refine_iters
        self.tol_rad = math.radians(tolerance_deg)

        keep = reflectors.intensity >= min_intensity
        if keep.sum() < 3:
            raise ValueError(
                f"min_intensity={min_intensity} leaves "
                f"{int(keep.sum())} reflectors; indexing needs >= 3"
            )
        self._refl = np.ascontiguousarray(reflectors.normals[keep])
        kept_i = np.abs(np.asarray(reflectors.intensity, np.float64))[keep]
        self._refl_i = np.ascontiguousarray(
            (kept_i / kept_i.max()).astype(np.float32)
        )

        self.detector = detector or BandDetector(
            height=h, width=w, k=n_bands, batch_size=batch_size
        )
        if self.detector.shape != (h, w):
            raise ValueError(
                f"detector shape {self.detector.shape} != geometry {(h, w)}"
            )
        if self.detector.k < n_bands:
            raise ValueError(
                f"detector returns {self.detector.k} bands < n_bands={n_bands}"
            )

        grid = sample_fundamental_zone(group, grid_resolution_deg)
        m_valid = len(grid)
        pad = (-len(grid)) % grid_chunk
        if pad:
            grid = np.concatenate([grid, np.tile(grid[:1], (pad, 1))])
        m_chunks = len(grid) // grid_chunk
        if mesh is not None:
            # Pad the CHUNK count to the mesh size so every device holds an
            # equal grid block; pad chunks are tiled grid[0] rows, vote-
            # masked through the global m_valid addressing (row_offset).
            chunk_pad = (-m_chunks) % mesh.devices.size
            if chunk_pad:
                grid = np.concatenate(
                    [grid, np.tile(grid[:1], (chunk_pad * grid_chunk, 1))]
                )
                m_chunks += chunk_pad
        self._grid_q = jnp.asarray(grid, jnp.float32)  # (Mp, 4)
        refl_dev = jnp.asarray(self._refl)
        # Rotated reflector normals, chunked for the scoring scan. Built
        # once per indexer; ~M·K·3 floats (a few MB at 3°).
        rotated = jax.jit(_rotate)(self._grid_q, refl_dev)
        self._grid_normals = rotated.reshape(m_chunks, grid_chunk, -1, 3)
        self._refl_dev = refl_dev
        self._refl_i_dev = jnp.asarray(self._refl_i)
        solve_kw = dict(
            tol_rad=self.tol_rad,
            # Covering radius of the low-discrepancy grid is ~2x its
            # mean resolution (crystal.sampling docstring, test-pinned).
            vote_tol_rad=max(
                self.tol_rad, math.radians(2.0 * grid_resolution_deg)
            ),
            refine_iters=refine_iters,
            top_p=top_candidates,
            m_valid=m_valid,
            i_weight=intensity_weight,
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            # Grid blocks live sharded: each device holds m_chunks/n_dev
            # chunks of rotated normals + quaternions (the HoughIndexer
            # analog of the k-NN's row-sharded dictionary).
            self._grid_normals = jax.device_put(
                self._grid_normals, NamedSharding(mesh, P(axis))
            )
            self._grid_q = jax.device_put(
                self._grid_q.reshape(m_chunks, grid_chunk, 4),
                NamedSharding(mesh, P(axis)),
            )
            self._solve = _make_sharded_solver(
                mesh, grid_chunk=grid_chunk, **solve_kw
            )
        else:
            self._solve = jax.jit(
                functools.partial(_index_bands, **solve_kw)
            )
        self.mesh = mesh

    def index_bands(
        self, normals: np.ndarray, weights: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Solve orientations for pre-detected band normals.

        Args:
            normals: ``(B, n_bands, 3)`` unit band-plane normals, detector
                frame (sign-ambiguous is fine).
            weights: ``(B, n_bands)`` non-negative vote weights (band
                strengths; 0 disables a slot).

        Returns:
            ``(quats (B,4), fit_deg (B,), n_matched (B,), vote (B,),
            band_score (B,))`` — quats NOT yet reduced to the fundamental
            zone.
        """
        q, fit, nm, vote, score = self._solve(
            jnp.asarray(normals, jnp.float32),
            jnp.asarray(weights, jnp.float32),
            self._grid_q,
            self._grid_normals,
            self._refl_dev,
            self._refl_i_dev,
        )
        return (
            np.asarray(q, np.float64),
            np.degrees(np.asarray(fit, np.float64)),
            np.asarray(nm, np.int64),
            np.asarray(vote, np.float64),
            np.asarray(score, np.float64),
        )

    def detect_bands(
        self, patterns: np.ndarray
    ) -> tuple[BandDetection, np.ndarray, np.ndarray]:
        """Radon band detection + plane-normal inversion for a
        ``(B, H, W[, 1])`` pattern stack — the phase-independent half of
        indexing. Returns ``(detection, normals (B, n_bands, 3),
        weights (B, n_bands))``; `MultiPhaseHoughIndexer` runs this ONCE
        and feeds every phase's `index_detected` from it (the Radon scan
        is the expensive half and does not depend on the phase)."""
        det = self.detector(np.asarray(patterns))
        k = self.n_bands
        theta = det.theta_deg[:, :k]
        rho = det.rho_px[:, :k]
        strength = np.maximum(det.strength[:, :k], 0.0)
        normals = band_plane_normals(theta, rho, self.geometry)
        # Normalize weights per pattern so tolerance/vote scales are
        # pattern-contrast-free (NCC-style).
        wmax = strength.max(axis=1, keepdims=True)
        weights = strength / np.maximum(wmax, 1e-12)
        return det, normals, weights

    def __call__(self, patterns: np.ndarray) -> HoughIndexResult:
        """Detect bands and index a ``(B, H, W[, 1])`` pattern stack."""
        det, normals, weights = self.detect_bands(patterns)
        return self.index_detected(det, normals, weights)

    def index_detected(
        self,
        det: BandDetection,
        normals: np.ndarray,
        weights: np.ndarray,
    ) -> HoughIndexResult:
        """Index pre-detected bands (`detect_bands` output) against THIS
        phase's reflector grid — the phase-dependent half of `__call__`."""
        from scipy.spatial.transform import Rotation as R

        from latice_tpu.crystal.sampling import reduce_to_fundamental_zone

        quats = np.empty((len(normals), 4))
        fit = np.empty(len(normals))
        nm = np.empty(len(normals), np.int64)
        vote = np.empty(len(normals))
        score = np.empty(len(normals))
        bs = self.batch_size
        for start in range(0, len(normals), bs):
            n_chunk = normals[start : start + bs]
            w_chunk = weights[start : start + bs]
            n = len(n_chunk)
            if n < bs:
                padn = np.tile(n_chunk[-1:], (bs - n, 1, 1))
                padw = np.tile(w_chunk[-1:], (bs - n, 1))
                n_chunk = np.concatenate([n_chunk, padn])
                w_chunk = np.concatenate([w_chunk, padw])
            q, f, m, v, s = self.index_bands(n_chunk, w_chunk)
            quats[start : start + bs] = q[:n]
            fit[start : start + bs] = f[:n]
            nm[start : start + bs] = m[:n]
            vote[start : start + bs] = v[:n]
            score[start : start + bs] = s[:n]

        quats = reduce_to_fundamental_zone(quats, self.group)
        # Vendor-convention angles: phi1/phi2 in [0, 360) (scipy returns
        # (-180, 180]; .ang files are written/read without reinterpretation).
        eulers = np.mod(
            R.from_quat(np.roll(quats, -1, axis=1)).as_euler(
                "zxz", degrees=True
            ),
            360.0,
        )
        return HoughIndexResult(
            quaternions=quats,
            eulers_deg=eulers,
            fit_deg=fit,
            n_matched=nm,
            vote_score=vote,
            success=nm >= self.min_bands,
            bands=det,
            band_score=score,
        )


def _index_bands(nrm, wts, grid_q, grid_normals, refl, refl_i, *, tol_rad,
                 vote_tol_rad, refine_iters, top_p, m_valid, i_weight,
                 row_offset=0):
    """Jitted core: vote over the grid, then q-method refinement.

    Args:
        nrm: (B, Nb, 3) measured unit band normals (detector frame).
        wts: (B, Nb) vote weights.
        grid_q: (Mp, 4) grid quaternions (crystal→detector).
        grid_normals: (n_chunks, G, K, 3) rotated reflector normals.
        refl: (K, 3) crystal-frame reflector normals.
        refl_i: (K,) reflector intensities, max-normalized to [0, 1].
        row_offset: global index of this grid block's first row — 0 on a
            single device; under mesh sharding each shard passes its
            offset (`jax.lax.axis_index · rows_per_shard`) so the
            ``m_valid`` pad mask addresses GLOBAL grid positions.

    All arrays are runtime arguments (no closure captures — captured
    arrays bake into the lowered program as constants; the grid is MBs).
    """
    # The vote gate uses the WIDE tolerance (grid covering radius): the
    # nearest grid point to the true orientation can sit ~2x the grid
    # resolution away, so gating at the tight assignment tolerance would
    # zero the true basin's vote entirely (the observed failure mode).
    cos_tol = math.cos(vote_tol_rad)
    # Soft vote edge: ~1/4 of the tolerance window in cos-space keeps the
    # vote differentiable-ish but sharp enough to rank basins correctly.
    soft = (1.0 - cos_tol) * 0.25 + 1e-6

    def score_chunk(gc):
        # (B, Nb, G, K) dots — f32 HIGHEST: geometry-critical (bf16
        # quantization ~0.004 is the size of 1−cos(5°)).
        d = jnp.einsum(
            "bnc,gkc->bngk", nrm, gc, precision=jax.lax.Precision.HIGHEST
        )
        best = jnp.max(jnp.abs(d), axis=-1)  # (B, Nb, G)
        gate = jax.nn.sigmoid((best - cos_tol) / soft)
        return jnp.einsum("bng,bn->gb", gate, wts)

    # Unrolled on purpose (not `lax.map`): the while-loop machinery around
    # ~20 small score fusions measured 4.4 ms of pure overhead at b256
    # (trace 2026-08-20); unrolled, XLA pipelines the chunks back to back.
    scores = jnp.stack(
        [score_chunk(grid_normals[i]) for i in range(grid_normals.shape[0])]
    )  # (n_chunks, G, B)
    scores = scores.reshape(-1, nrm.shape[0]).T  # (B, M_local)
    # Chunk-padding rows are tiled copies of grid[0] with live vote
    # scores; left in, they can flood the top_k candidate list with
    # duplicates of one orientation and defeat the post-refinement
    # re-ranking — mask them out (global addressing via row_offset under
    # mesh sharding). top_k sorts descending, so if a -inf pad is ever
    # selected (tiny grids / all-pad shards) it refines from grid[0] to a
    # rank at best EQUAL to the real grid[0] candidate's, and the
    # first-index tie rule of argmax keeps the real entry (real rows sort
    # before -inf pads within a shard; device 0 holds the real grid[0]
    # across shards).
    scores = jnp.where(
        row_offset + jnp.arange(scores.shape[1]) < m_valid,
        scores,
        -jnp.inf,
    )
    b = nrm.shape[0]
    # The vote only has to put the right basin SOMEWHERE in the top few:
    # near-ties between pseudo-symmetric basins are broken after refinement
    # by matched-band count + residual, not by raw vote score.
    vote_p, idx_p = jax.lax.top_k(scores, top_p)  # (B, P)
    # One-hot row selection (gather-free: small-table row gathers are the
    # documented backend landmine).
    onehot = jax.nn.one_hot(idx_p, scores.shape[1], dtype=jnp.float32)
    q = jnp.einsum("bpm,mq->bpq", onehot, grid_q).reshape(b * top_p, 4)

    # Fold candidates into the batch axis: every candidate of every pattern
    # refines in one program.
    nrm_p = jnp.repeat(nrm, top_p, axis=0)  # (B*P, Nb, 3)
    wts_p = jnp.repeat(wts, top_p, axis=0)

    def residuals(q):
        """Band-to-nearest-reflector assignment at orientation q."""
        m_rot = _rotate(q, refl)  # (B*P, K, 3)
        d = jnp.einsum(
            "bnc,bkc->bnk", nrm_p, m_rot,
            precision=jax.lax.Precision.HIGHEST,
        )
        j = jnp.argmax(jnp.abs(d), axis=-1)  # (B*P, Nb)
        sel = jax.nn.one_hot(j, d.shape[-1], dtype=d.dtype)
        dotj = jnp.sum(d * sel, axis=-1)  # (B*P, Nb) signed
        ang = jnp.arccos(jnp.clip(jnp.abs(dotj), 0.0, 1.0))
        return sel, dotj, ang

    def refine_once(q, tol):
        sel, dotj, ang = residuals(q)
        # Matched crystal normal, sign-resolved toward the measurement.
        c = jnp.einsum("bnk,kc->bnc", sel, refl) * jnp.sign(dotj)[..., None]
        w = wts_p * (ang < tol)
        b_mat = jnp.einsum("bn,bnc,bnd->bcd", w, nrm_p, c)
        # The grid candidate (then the previous round's solve) seeds the
        # power iteration — it is within the vote tolerance of the
        # optimum, and the seeded path avoids TPU `eigh` (solve_wahba
        # docstring: 51.5 ms of the 62.7 ms solve at this batch shape).
        q_new = solve_wahba(b_mat, init=q)
        # A candidate with <2 usable bands has a degenerate Davenport
        # matrix; keep the previous orientation instead of solver noise.
        ok = (w > 0).sum(axis=-1) >= 2
        return jnp.where(ok[:, None], q_new, q)

    # First round accepts residuals up to the grid covering radius (the
    # unrefined candidate is up to that far off); later rounds tighten to
    # the reported tolerance. Unrolled (a 2-trip scan of small fused ops
    # only adds while-loop overhead on TPU).
    for it in range(refine_iters):
        q = refine_once(q, max(tol_rad, vote_tol_rad) if it == 0 else tol_rad)

    # Rank the refined candidates by SOFT band credit, not hard matched
    # count:
    #   rank = Σ_n w_n · [ (1 − ang_n/tol)₊ · (1 + i_weight·I_n) + β·m_n ]
    # where I_n is the intensity of the reflector band n was assigned to
    # (max-normalized per table), m_n = (ang_n < tol), and β = 0.5. Three
    # measured failure modes motivated each term (rendered Ti/Ni patterns,
    # margins checked numerically for β ∈ [0.25, 1]):
    # (a) a hard count lets a sloppy hcp 30°-twin that matches ALL bands
    #     at ~2.2° mean beat the true basin when two spurious detections
    #     push it to 6/8 matched at 0.7° — an integer gap no tie-break can
    #     bridge, while the closeness term scores precision;
    # (b) the 30°-about-c twin maps prism bands {10-10}↔{11-20} with every
    #     interplanar angle preserved — residuals cannot separate it, but
    #     it swaps strong and weak families, so the intensity factor (the
    #     vendor band-intensity rule) rewards the basin that assigns
    #     strong measured bands to strong reflectors;
    # (c) closeness credit ALONE lets 4 ultra-precise matches on strong
    #     reflectors edge out 6 decent ones (fcc, 52° error) — the
    #     β-weighted matched bonus restores the count signal softly
    #     (weak spurious bands contribute only their small weight).
    # n_matched/fit keep their hard definitions for reporting + `success`.
    sel, _, ang = residuals(q)
    matched = (ang < tol_rad) & (wts_p > 0)
    w = wts_p * matched
    wsum = jnp.maximum(w.sum(axis=-1), 1e-12)
    fit = (w * ang).sum(axis=-1) / wsum  # (B*P,)
    n_matched = matched.sum(axis=-1)
    i_assigned = jnp.einsum("bnk,k->bn", sel, refl_i)
    credit = (
        wts_p
        * jnp.maximum(0.0, 1.0 - ang / tol_rad)
        * (1.0 + i_weight * i_assigned)
    )
    rank = (credit + 0.5 * w).sum(axis=-1)
    rank = rank.reshape(b, top_p)
    best_p = jnp.argmax(rank, axis=-1)  # (B,)
    pick = jax.nn.one_hot(best_p, top_p, dtype=jnp.float32)  # (B, P)

    def take(x):
        return jnp.einsum("bp,bp...->b...", pick, x.reshape(b, top_p, *x.shape[1:]))

    return (
        take(q),
        take(fit),
        take(n_matched.astype(jnp.float32)).astype(jnp.int32),
        # where-select, not multiply: vote_p is -inf on masked pad
        # candidates and 0 · -inf = NaN.
        jnp.sum(jnp.where(pick > 0, vote_p, 0.0), axis=-1),
        jnp.sum(pick * rank, axis=-1),
    )


def _make_sharded_solver(mesh, *, grid_chunk, tol_rad, vote_tol_rad,
                         refine_iters, top_p, m_valid, i_weight):
    """Grid-sharded vote + refine over a device mesh.

    The orientation grid is the hough plane's dictionary: its chunks shard
    over the mesh's first axis (like the k-NN's row-sharded table,
    parallel/sharded_knn.py), each device votes + refines its own block's
    top candidates with ZERO communication, and the per-shard winners —
    already scored by the same soft band-credit rank used within a shard —
    merge with one small ``all_gather`` (O(devices · B) scalars over ICI,
    independent of grid size).

    Equivalence to single-device: every shard refines ITS top_p
    candidates, so the union is a superset of the global top_p list; the
    rank function is identical per candidate, hence the merged winner's
    rank is >= the single-device winner's (equal on every tested input —
    the winning basin's grid point leads its shard's list too).
    """
    from functools import partial as _partial

    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    @_partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def solve(nrm, wts, grid_q_blocks, grid_normals, refl, refl_i):
        rows_local = grid_q_blocks.shape[0] * grid_chunk
        offset = jax.lax.axis_index(axis) * rows_local
        q, fit, nm, vote, rank = _index_bands(
            nrm, wts, grid_q_blocks.reshape(-1, 4), grid_normals,
            refl, refl_i,
            tol_rad=tol_rad, vote_tol_rad=vote_tol_rad,
            refine_iters=refine_iters, top_p=top_p,
            m_valid=m_valid, i_weight=i_weight, row_offset=offset,
        )
        all_q = jax.lax.all_gather(q, axis)  # (n_dev, B, 4)
        all_fit = jax.lax.all_gather(fit, axis)  # (n_dev, B)
        all_nm = jax.lax.all_gather(nm.astype(jnp.float32), axis)
        all_vote = jax.lax.all_gather(vote, axis)
        all_rank = jax.lax.all_gather(rank, axis)
        # argmax ties resolve to the LOWEST device id — device 0 holds the
        # real grid[0] rows, so an all-pad shard's duplicate can never
        # displace the genuine candidate (see the pad-mask note in
        # _index_bands).
        best = jnp.argmax(all_rank, axis=0)  # (B,)
        pick = jax.nn.one_hot(best, n_dev, dtype=jnp.float32)  # (B, n_dev)

        def take(x):  # (n_dev, B, ...) -> (B, ...)
            # where-select, not einsum: an all-pad shard's vote is -inf
            # and 0 · -inf = NaN would poison the sum.
            sel = pick.T.reshape(pick.shape[::-1] + (1,) * (x.ndim - 2))
            return jnp.sum(jnp.where(sel > 0, x, 0.0), axis=0)

        return (
            take(all_q),
            take(all_fit),
            take(all_nm).astype(jnp.int32),
            take(all_vote),
            take(all_rank),
        )

    return solve


class MultiPhaseHoughResult(NamedTuple):
    """Per-pattern multi-phase Hough solution: the winning phase's fields
    (host numpy), plus the full per-phase results for diagnostics."""

    quaternions: np.ndarray  # (B, 4) winner's FZ quaternion (its group)
    eulers_deg: np.ndarray  # (B, 3) zxz Euler degrees
    fit_deg: np.ndarray  # (B,)
    n_matched: np.ndarray  # (B,)
    vote_score: np.ndarray  # (B,)
    band_score: np.ndarray  # (B,) winner's soft band credit (phase rank)
    phase: np.ndarray  # (B,) int winning phase id (list position)
    success: np.ndarray  # (B,) winner matched >= min_bands
    bands: BandDetection  # shared raw detection (phase-independent)
    per_phase: tuple  # tuple[HoughIndexResult, ...] full per-phase results


class MultiPhaseHoughIndexer:
    """Multi-phase band indexing: score every phase, keep per-pixel best.

    Vendor band indexing (OIM/AZtec) is multi-phase by definition — each
    candidate phase's reflector table is solved against the SAME detected
    bands and the phase whose solution explains them best wins the pixel.
    The expensive half (the Radon scan + plane-normal inversion) is
    phase-independent, so it runs ONCE through a shared `BandDetector`;
    only the grid vote + q-method refinement (cheap by comparison) repeat
    per phase.

    Phase discrimination uses the same rank the single-phase indexer uses
    to select its refined candidate: the soft band-credit score
    (``band_score`` — per-band strength × closeness × intensity-match,
    see `_index_bands`), so "which phase" and "which orientation" are
    decided by one consistent criterion. A phase with more allowed
    reflections has more chances to match a noise band — the standard
    vendor caveat; keep tables to the strong low-index families
    (``min_intensity``) for fair competition. Related-structure pairs
    share real geometry, not just noise: fcc vs hcp under the Burgers
    orientation relationship align {111}∥(0001) and ⟨110⟩∥⟨11-20⟩, so an
    hcp hypothesis can legitimately match most of an fcc pattern's bands
    at ~0 residual — the industry-known austenite/ε-martensite ambiguity.
    Band count and intensity break it most of the time; expect a small
    tail of genuinely ambiguous pixels (clean them like vendors do, via
    `crystal.maps.clean_orientation_map` grain dilation).

    Args:
        phases: sequence of ``(reflectors, group)`` pairs — phase id =
            list position (matches the latent/DI planes' convention and
            the .ang/.ctf 1-based phase column written downstream).
        geometry: shared detector model.
        **kwargs: forwarded to every per-phase `HoughIndexer`
            (grid_resolution_deg, n_bands, tolerance_deg, min_bands, ...).
    """

    def __init__(
        self,
        phases,
        geometry: DetectorGeometry | None = None,
        **kwargs,
    ) -> None:
        if len(phases) < 1:
            raise ValueError("need at least one (reflectors, group) phase")
        detector = kwargs.pop("detector", None)
        self.indexers: list[HoughIndexer] = []
        for reflectors, group in phases:
            ix = HoughIndexer(
                reflectors, geometry, group=group, detector=detector,
                **kwargs,
            )
            detector = ix.detector  # share the Radon program across phases
            self.indexers.append(ix)

    @property
    def groups(self) -> list[str]:
        return [ix.group for ix in self.indexers]

    def __call__(self, patterns: np.ndarray) -> MultiPhaseHoughResult:
        """Detect once, index every phase, pick the per-pattern winner."""
        det, normals, weights = self.indexers[0].detect_bands(patterns)
        per = tuple(
            ix.index_detected(det, normals, weights) for ix in self.indexers
        )
        # (P, B) rank — the same soft band-credit score that selected each
        # phase's winning candidate (_index_bands).
        rank = np.stack([r.band_score for r in per])
        phase = np.argmax(rank, axis=0)  # (B,)

        def take(field: str) -> np.ndarray:
            stacked = np.stack([getattr(r, field) for r in per])  # (P, B, ...)
            idx = phase.reshape((1, -1) + (1,) * (stacked.ndim - 2))
            return np.take_along_axis(stacked, idx, axis=0)[0]

        return MultiPhaseHoughResult(
            quaternions=take("quaternions"),
            eulers_deg=take("eulers_deg"),
            fit_deg=take("fit_deg"),
            n_matched=take("n_matched"),
            vote_score=take("vote_score"),
            band_score=take("band_score"),
            phase=phase,
            success=take("success"),
            bands=det,
            per_phase=per,
        )
