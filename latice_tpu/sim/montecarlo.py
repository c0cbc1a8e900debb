"""Monte-Carlo backscatter simulation: energy/depth weighting for masters.

EMsoft's dictionary pipeline runs two physics stages: `EMMCOpenCL`
simulates electron trajectories to get the joint (exit-energy, generation-
depth) distribution of backscattered electrons, and `EMEBSDmaster` folds
that distribution into energy-binned Bloch-wave masters. `sim.dynamical`
documents its exponential depth profile as the simplification of exactly
that first stage — this module removes the simplification first-party.
(The reference has no simulation stage at all; its data path starts at a
premade ``.npy`` stack, reference data_module.py:70-78.)

Physics model — the classic single-scattering continuous-slowing-down
Monte Carlo (Joy's "Monte Carlo Modeling for Electron Microscopy", the
same model family EMsoft's MC stage implements); every formula named:

* **Elastic scattering: screened Rutherford.** Total cross-section
  (cm²; E in keV)

      σ_el = 5.21e-21 · Z²/E² · 4π / (α (1 + α)) · ((E + 511)/(E + 1022))²

  with screening factor ``α = 3.4e-3 · Z^0.67 / E``. Polar scattering
  angles sample the screened-Rutherford distribution in closed form,
  ``cos θ = 1 − 2αR/(1 + α − R)``; azimuth is uniform. Step lengths are
  exponential with the elastic mean free path ``λ = A / (N_A ρ σ_el)``.
* **Energy loss: Joy–Luo modified Bethe.**

      dE/ds = −78500 · ρZ/(A·E) · ln(1.166 (E + 0.85 J)/J)   keV/cm,
      J = (9.76 Z + 58.5 Z^−0.19) · 1e-3                      keV,

  the low-energy-stable form (stays positive for E below J).
* **Compound targets** reduce to an effective single element: Z, A
  averaged by atomic abundance, density from the unit cell — the standard
  single-scattering-MC treatment for the small-Z-contrast cells EBSD
  meets; pass explicit ``z/a/density_g_cm3`` to override.
* **Geometry.** The sample fills z > 0 (z = depth); the beam enters at
  the origin tilted ``tilt_deg`` from the surface normal (EBSD: 70°).
  An electron whose step crosses z = 0 exits; it is *backscattered* if
  its energy is above ``e_min_kev``. Recorded per BSE: exit energy and
  the maximum depth reached (the generation depth the Bloch stage's
  absorption integral needs).

TPU design: the walker update is a fixed-iteration `lax.scan` over a
``(n_electrons,)`` batch of states — elementwise VPU math + counter-based
RNG, no host loops, one compile for any electron count (batched in
chunks). Exited walkers freeze in place (masked updates), so control flow
stays static. Histogramming happens on the host over the final states.

The output feeds `mc_weighted_master_pattern`: one Bloch master per exit-
energy bin (`sim.dynamical` at that energy) with the bin's *measured*
depth distribution replacing the exponential — the depth integral
``∫ p(z) e^{−2π q_j z} dz`` becomes a quadrature over histogram bins —
then summed with the bin's electron weight.
"""

from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.sim.dynamical import (
    ELEMENT_Z,
    CrystalStructure,
    channeling_intensities,
    dynamical_beams,
)
from latice_tpu.sim.master import lambert_to_directions

__all__ = [
    "ELEMENT_A",
    "MonteCarloBSE",
    "effective_medium",
    "mc_weighted_master_pattern",
    "simulate_bse_monte_carlo",
]

#: Standard atomic weights (g/mol) for the `ELEMENT_Z` element set.
ELEMENT_A = {
    "c": 12.011, "n": 14.007, "o": 15.999, "mg": 24.305, "al": 26.982,
    "si": 28.085, "p": 30.974, "s": 32.06, "ti": 47.867, "v": 50.942,
    "cr": 51.996, "mn": 54.938, "fe": 55.845, "co": 58.933, "ni": 58.693,
    "cu": 63.546, "zn": 65.38, "ga": 69.723, "ge": 72.63, "as": 74.922,
    "se": 78.971, "zr": 91.224, "nb": 92.906, "mo": 95.95, "ag": 107.868,
    "cd": 112.414, "in": 114.818, "sn": 118.71, "sb": 121.76,
    "te": 127.6, "ta": 180.948, "w": 183.84, "pt": 195.084,
    "au": 196.967, "pb": 207.2,
}

_AVOGADRO = 6.02214076e23


def effective_medium(
    structure: CrystalStructure,
) -> tuple[float, float, float]:
    """``(Z_eff, A_eff, density g/cm³)`` of a crystal structure.

    Z and A are atomic-abundance means (the single-element reduction the
    MC model uses); density comes from the unit cell: ρ = ΣA / (N_A·V).
    """
    zs, as_ = [], []
    for site in structure.sites:
        el = site.element
        z = site.z
        if isinstance(el, str):
            key = el.lower()
            if key not in ELEMENT_A:
                raise ValueError(
                    f"no atomic weight for element {el!r}; pass z/a/"
                    "density_g_cm3 to simulate_bse_monte_carlo directly"
                )
            a = ELEMENT_A[key]
        else:
            # Integer-Z site: approximate A ≈ 2Z + Z²/157 (light-element
            # fit); explicit overrides are the precise path.
            a = 2.0 * z + z * z / 157.0
        zs.append(float(z))
        as_.append(float(a))
    volume_cm3 = structure.volume * 1e-24  # Å³ → cm³
    density = sum(as_) / (_AVOGADRO * volume_cm3)
    return float(np.mean(zs)), float(np.mean(as_)), density


def _mean_ionization_kev(z: float) -> float:
    return (9.76 * z + 58.5 * z ** -0.19) * 1e-3


@dataclasses.dataclass(frozen=True)
class MonteCarloBSE:
    """Backscatter statistics from `simulate_bse_monte_carlo`.

    Attributes:
        energy_edges_kev: ``(nE + 1,)`` exit-energy bin edges.
        energy_weights: ``(nE,)`` fraction of BSE per energy bin
            (sums to 1 over bins; empty bins are 0).
        depth_centers_nm: ``(nZ,)`` generation-depth bin centers.
        depth_weights: ``(nE, nZ)`` depth distribution per energy bin,
            each row summing to 1 (uniform rows for empty bins).
        bse_yield: backscatter coefficient η (BSE / incident).
        exit_energy_kev / max_depth_nm: per-BSE raw samples (diagnostics
            and re-binning).
        e0_kev / tilt_deg: simulation conditions.
    """

    energy_edges_kev: np.ndarray
    energy_weights: np.ndarray
    depth_centers_nm: np.ndarray
    depth_weights: np.ndarray
    bse_yield: float
    exit_energy_kev: np.ndarray
    max_depth_nm: np.ndarray
    e0_kev: float
    tilt_deg: float

    @property
    def energy_centers_kev(self) -> np.ndarray:
        return 0.5 * (self.energy_edges_kev[1:] + self.energy_edges_kev[:-1])


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "n_steps", "z", "a", "density", "e_min_kev", "e0_kev",
        "tilt_rad",
    ),
)
def _walk_chunk(
    seed, *, n, n_steps, z, a, density, e_min_kev, e0_kev, tilt_rad
):
    """Trace one chunk of walkers for ``n_steps`` scattering events.

    State per walker: position z (depth, nm), direction (unit), energy
    (keV), alive flag, exit energy, max depth. Exited/stopped walkers
    freeze (masked updates) — static shapes, no data-dependent control
    flow. The whole walk — key derivation included — is ONE jitted
    program taking a traced seed, so the chunk loop dispatches no eager
    device ops (the axon-backend landmine).
    """
    key = jax.random.key(seed)
    e0 = jnp.full(n, e0_kev, jnp.float32)
    dir0 = jnp.broadcast_to(
        jnp.array(
            [math.sin(tilt_rad), 0.0, math.cos(tilt_rad)], jnp.float32
        ),
        (n, 3),
    )
    j_kev = (9.76 * z + 58.5 * z ** -0.19) * 1e-3
    rel = lambda e: ((e + 511.0) / (e + 1022.0)) ** 2  # noqa: E731
    n_dens = _AVOGADRO * density / a  # atoms / cm³

    def sigma_el(e):
        alpha = 3.4e-3 * z ** 0.67 / e
        return (
            5.21e-21 * (z / e) ** 2 * 4.0 * jnp.pi
            / (alpha * (1.0 + alpha)) * rel(e)
        )

    def step(carry, key_step):
        pos_z, d, e, alive, exit_e, max_z = carry
        ks = jax.random.split(key_step, 3)
        alpha = 3.4e-3 * z ** 0.67 / e
        lam_nm = 1e7 / (n_dens * sigma_el(e))  # cm → nm
        s_nm = -lam_nm * jnp.log(
            jnp.maximum(jax.random.uniform(ks[0], (n,)), 1e-12)
        )
        # Joy–Luo Bethe loss over the step (keV); forbid E going below
        # a floor so the log stays finite for frozen walkers.
        de_ds = (
            78500.0 * density * z / (a * e)
            * jnp.log(1.166 * (e + 0.85 * j_kev) / j_kev)
        )  # keV/cm
        e_new = jnp.maximum(e - de_ds * s_nm * 1e-7, 0.05)
        # Screened-Rutherford polar angle, uniform azimuth.
        r = jax.random.uniform(ks[1], (n,))
        cos_t = 1.0 - 2.0 * alpha * r / (1.0 + alpha - r)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t**2, 0.0))
        phi = jax.random.uniform(ks[2], (n,)) * (2.0 * jnp.pi)
        # Rotate the scattering deflection into each walker's frame.
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        perp = jnp.sqrt(jnp.maximum(1.0 - dz**2, 1e-12))
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        nx = (
            sin_t * (cphi * dx * dz - sphi * dy) / perp + dx * cos_t
        )
        ny = (
            sin_t * (cphi * dy * dz + sphi * dx) / perp + dy * cos_t
        )
        nz = -sin_t * cphi * perp + dz * cos_t
        # The frame rotation degenerates along ±z (perp → 0): there any
        # azimuth frame works, so use the lab frame directly.
        pole = perp < 1e-4
        nx = jnp.where(pole, sin_t * cphi, nx)
        ny = jnp.where(pole, sin_t * sphi, ny)
        nz = jnp.where(pole, cos_t * jnp.sign(dz), nz)
        d_new = jnp.stack([nx, ny, nz], axis=-1)
        d_new /= jnp.linalg.norm(d_new, axis=-1, keepdims=True)

        z_new = pos_z + d[:, 2] * s_nm  # move along the OLD direction
        exited = alive & (z_new < 0.0)
        stopped = alive & (e_new < e_min_kev) & ~exited
        live_next = alive & ~exited & ~stopped
        pos_z = jnp.where(alive, jnp.maximum(z_new, 0.0), pos_z)
        max_z = jnp.maximum(max_z, jnp.where(alive, z_new, max_z))
        exit_e = jnp.where(exited, e, exit_e)  # energy at surface crossing
        e = jnp.where(live_next, e_new, e)
        d = jnp.where(live_next[:, None], d_new, d)
        return (pos_z, d, e, live_next, exit_e, max_z), None

    pos0 = jnp.zeros(n)
    alive0 = jnp.ones(n, bool)
    exit0 = jnp.full(n, -1.0)
    carry = (pos0, dir0, e0, alive0, exit0, jnp.zeros(n))
    keys = jax.random.split(key, n_steps)
    (pos_z, d, e, alive, exit_e, max_z), _ = jax.lax.scan(step, carry, keys)
    return exit_e, max_z


def simulate_bse_monte_carlo(
    structure: CrystalStructure | None = None,
    kv: float = 20.0,
    tilt_deg: float = 70.0,
    n_electrons: int = 200_000,
    n_steps: int = 400,
    e_min_kev: float | None = None,
    energy_bins: int = 10,
    depth_bins: int = 40,
    max_depth_nm: float | None = None,
    seed: int = 0,
    chunk: int = 262_144,
    z: float | None = None,
    a: float | None = None,
    density_g_cm3: float | None = None,
    mesh=None,
) -> MonteCarloBSE:
    """Simulate backscattered-electron (energy, depth) statistics.

    Args:
        structure: crystal (→ effective Z/A/density); or pass ``z``/``a``/
            ``density_g_cm3`` explicitly (all three) and omit it.
        kv: beam energy E₀, keV.
        tilt_deg: sample tilt from normal incidence (EBSD convention 70°).
        n_electrons: incident electrons traced.
        n_steps: scattering events per electron (400 ≈ several times the
            20 keV range in transition metals; raise for light/low-kV).
        e_min_kev: BSE counting threshold (default E₀/10 — detector-less
            spectra conventionally cut the deep-inelastic tail).
        energy_bins / depth_bins: histogram resolution of the output.
        max_depth_nm: depth histogram extent (default: the 99th percentile
            of observed generation depths, rounded up).
        seed: RNG seed (deterministic for a fixed chunk size).
        chunk: walkers per device dispatch.
        z / a / density_g_cm3: explicit effective medium override.
        mesh: optional `jax.sharding.Mesh` — the mesh's N devices trace N
            walker chunks CONCURRENTLY (one vmapped walk over a sharded
            per-chunk seed vector). The per-chunk seed derivation is
            unchanged, so results are IDENTICAL to the sequential
            single-device run at the same ``seed``/``chunk`` (pinned by
            test and `dryrun_multichip`); walkers are embarrassingly
            parallel, so scaling is linear.

    Returns:
        `MonteCarloBSE`.
    """
    if structure is not None:
        z_eff, a_eff, rho = effective_medium(structure)
    else:
        if z is None or a is None or density_g_cm3 is None:
            raise ValueError(
                "pass a structure, or all three of z/a/density_g_cm3"
            )
        z_eff, a_eff, rho = float(z), float(a), float(density_g_cm3)
    if z is not None:
        z_eff = float(z)
    if a is not None:
        a_eff = float(a)
    if density_g_cm3 is not None:
        rho = float(density_g_cm3)
    if not 0.0 <= tilt_deg < 90.0:
        raise ValueError(f"tilt_deg must be in [0, 90), got {tilt_deg}")
    e_min = float(e_min_kev if e_min_kev is not None else kv / 10.0)

    t = math.radians(tilt_deg)

    def _sub_seed(idx: int) -> np.uint32:
        # Per-chunk derived seed — shared by the sequential and mesh
        # paths, which is what makes them bit-identical.
        return np.uint32((seed * 1_000_003 + idx) & 0xFFFFFFFF)

    walk_many = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))

        def _one(s):
            return _walk_chunk(
                s, n=chunk, n_steps=n_steps, z=z_eff, a=a_eff,
                density=rho, e_min_kev=e_min, e0_kev=float(kv),
                tilt_rad=t,
            )

        walk_many = jax.jit(
            jax.vmap(_one), in_shardings=sh, out_shardings=sh
        )

    exit_e = np.empty(0, np.float32)
    max_z = np.empty(0, np.float32)
    done = 0
    chunk_index = 0
    while done < n_electrons:
        if walk_many is not None:
            # One vmapped dispatch traces n_dev chunks, one per device.
            seeds = np.asarray(
                [_sub_seed(chunk_index + i) for i in range(n_dev)],
                np.uint32,
            )
            ee_all, mz_all = walk_many(seeds)
            ee_all = np.asarray(ee_all)
            mz_all = np.asarray(mz_all)
            for i in range(n_dev):
                m = min(chunk, n_electrons - done)
                if m <= 0:
                    break
                exit_e = np.concatenate([exit_e, ee_all[i][:m]])
                max_z = np.concatenate([max_z, mz_all[i][:m]])
                done += m
            chunk_index += n_dev
            continue
        m = min(chunk, n_electrons - done)
        # The walk pads to the static chunk shape and padded walkers are
        # sliced off below.
        ee, mz = _walk_chunk(
            _sub_seed(chunk_index), n=chunk, n_steps=n_steps, z=z_eff,
            a=a_eff, density=rho, e_min_kev=e_min, e0_kev=float(kv),
            tilt_rad=t,
        )
        exit_e = np.concatenate([exit_e, np.asarray(ee)[:m]])
        max_z = np.concatenate([max_z, np.asarray(mz)[:m]])
        done += m
        chunk_index += 1

    bse = exit_e >= e_min
    exit_e_b = exit_e[bse]
    max_z_b = max_z[bse]
    bse_yield = float(bse.mean())
    if len(exit_e_b) == 0:
        raise ValueError(
            "no backscattered electrons above e_min_kev — raise "
            "n_electrons/n_steps or lower e_min_kev"
        )

    e_edges = np.linspace(e_min, float(kv), energy_bins + 1)
    if max_depth_nm is None:
        max_depth_nm = float(
            np.ceil(np.percentile(max_z_b, 99.0) / 10.0) * 10.0
        ) or 10.0
    z_edges = np.linspace(0.0, max_depth_nm, depth_bins + 1)
    z_centers = 0.5 * (z_edges[1:] + z_edges[:-1])

    e_idx = np.clip(
        np.digitize(exit_e_b, e_edges) - 1, 0, energy_bins - 1
    )
    e_weights = np.bincount(e_idx, minlength=energy_bins).astype(np.float64)
    e_weights /= e_weights.sum()
    depth_w = np.full((energy_bins, depth_bins), 1.0 / depth_bins)
    for b in range(energy_bins):
        sel = max_z_b[e_idx == b]
        if len(sel):
            h, _ = np.histogram(np.clip(sel, 0, max_depth_nm), bins=z_edges)
            tot = h.sum()
            if tot:
                depth_w[b] = h / tot
    return MonteCarloBSE(
        energy_edges_kev=e_edges,
        energy_weights=e_weights,
        depth_centers_nm=z_centers,
        depth_weights=depth_w,
        bse_yield=bse_yield,
        exit_energy_kev=exit_e_b,
        max_depth_nm=max_z_b,
        e0_kev=float(kv),
        tilt_deg=float(tilt_deg),
    )


def mc_weighted_master_pattern(
    structure: CrystalStructure,
    mc: MonteCarloBSE,
    size: int = 201,
    n_beams: int = 64,
    absorption_ratio: float = 0.1,
    max_hkl: int = 5,
    min_d: float = 0.4,
    chunk: int = 2048,
    min_bin_weight: float = 0.02,
    normalize: bool = True,
    mesh=None,
) -> np.ndarray:
    """Energy- and depth-weighted dynamical master pattern.

    The EMsoft `EMEBSDmaster` integration: one Bloch-wave master per MC
    exit-energy bin — the N-beam problem re-solved at that energy (band
    widths scale with the wavelength) with the bin's MEASURED generation-
    depth distribution as the absorption quadrature — summed with the
    bin's electron weight. Bins lighter than ``min_bin_weight`` are
    folded into their nearest kept neighbor (their depth profiles barely
    differ; this bounds the eigh cost).

    Output matches `dynamical_master_pattern`'s equal-area convention.
    """
    if size < 3:
        raise ValueError(f"master size must be >= 3, got {size}")
    half = (size - 1) / 2.0
    ij = (np.arange(size, dtype=np.float64) - half) / half
    x, y = np.meshgrid(ij, -ij, indexing="xy")
    d = lambert_to_directions(np.stack([x, y], axis=-1) * np.sqrt(2.0))

    centers = mc.energy_centers_kev
    weights = mc.energy_weights.copy()
    kept = [b for b in range(len(weights)) if weights[b] >= min_bin_weight]
    if not kept:
        kept = [int(np.argmax(weights))]
    for b in range(len(weights)):
        if b not in kept and weights[b] > 0:
            near = kept[int(np.argmin([abs(b - kb) for kb in kept]))]
            weights[near] += weights[b]
            weights[b] = 0.0

    img = np.zeros(d.shape[:-1], np.float64)
    for b in kept:
        beams = dynamical_beams(
            structure, kv=float(centers[b]), n_beams=n_beams,
            max_hkl=max_hkl, min_d=min_d,
        )
        part = channeling_intensities(
            d, beams, absorption_ratio=absorption_ratio, chunk=chunk,
            depth_centers_nm=mc.depth_centers_nm,
            depth_weights=mc.depth_weights[b],
            mesh=mesh,
        )
        img += weights[b] * part.astype(np.float64)
    if normalize:
        lo, hi = float(img.min()), float(img.max())
        img = (img - lo) / max(hi - lo, 1e-12)
    return img.astype(np.float32)
