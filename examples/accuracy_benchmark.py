"""Accuracy benchmark: train the VAE, index noisy patterns, measure error.

End-to-end quality check of the whole product (BASELINE "orientation-match
quality gate"): renders orientation-dependent synthetic patterns, builds a
2-degree-grid dictionary of 4096 entries, and indexes noisy re-renders.

Measured on TPU v5e (bf16, 600 train steps in ~18s; with the
analytic-VJP norm default, round 2):
    random weights  : ~11-16% success, 19.1 deg median error
    trained (16-d)  : 100% success, 1.95 deg median error on-grid,
                      1.85 deg off-grid (1.82 with consensus_weight_power=256)
    trained --scaled: 100% success, 1.27 deg on-grid, 1.14 deg off-grid
                      (1.09 with consensus_weight_power=256)
(errors bounded by the 2-degree dictionary spacing, as expected).

With --dynamical (Bloch-wave master lookup renders, round 3; noise 0.15,
2-degree grid — dynamical profiles are sharper/harder than the toy bands):
    trained 16-d    : 99.8% success, 3.32 deg on-grid, 3.87 deg off-grid
    + refinement    : with master-FITTED bands (sim.master_fit, the `query
                      --refine` provenance on dynamical dictionaries, r4):
                      consensus-init 2.52 deg (the ~3.9 deg init often sits
                      outside the refiner's basin — measured: 4-deg inits
                      stall, 1-deg inits reach 0.07 deg), but top-10
                      candidate refinement + NCC re-ranking
                      (--refine-candidates) reaches **0.244 deg median**
                      (p90 3.0), overruling the encoder's top-1 for 93% of
                      queries — an order of magnitude below the grid.
    cross-model     : kinematical queries against the dynamical-trained
                      dictionary degrade to 12.8 deg median at 98% success —
                      intensity-model mismatch is a real error source;
                      train with augment/denoising (trainer=robust) when
                      the dictionary's physics won't match the detector's.

With --kinematical (physical Kikuchi bands via latice_tpu.sim, round 3):
    trained 16-d    : 100% success, 2.35 deg on-grid, 2.79 deg off-grid
    + sim.refine    : 1.13 deg off-grid median at noise 0.15 (autodiff
                      through the renderer; 0.15 deg at noise 0.05 — the
                      floor scales with noise, not with the grid spacing)
    --scaled 64-d   : 2.04 deg on-grid, 2.02 deg off-grid, 0.588 deg
                      refined (better inits from the larger latent)
    pattern DI      : 100% success, **0.335 deg off-grid median** (p90
                      0.56) with no encoder at all — NCC's top-10
                      similarities interpolate between grid points far
                      better than latent cosines, at D/16 = 1024x the
                      per-query compute (still 30k patterns/s on-chip).
                      The accuracy yardstick: latent indexing buys speed
                      and >HBM dictionaries, DI buys accuracy per entry.
                      NCC^4-weighted consensus (di --weight-power 4)
                      sharpens it to 0.237 deg (p90 0.40); large powers
                      regress (0.834 at P=256 — they collapse onto the
                      top candidate and lose the interpolation).

Run: PYTHONPATH=.:/root/.axon_site python examples/accuracy_benchmark.py
"""
import time
import numpy as np, jax, jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

_RENDER = "cosine"  # --kinematical / --dynamical: physical renderers
_DYN_MASTER = None


def _dynamical_master():
    """Bloch-wave fcc-Ni master (cached; ~5 s on-chip at 201², 59 beams)."""
    global _DYN_MASTER
    if _DYN_MASTER is None:
        from latice_tpu.sim import cubic_structure, dynamical_master_pattern

        t0 = time.time()
        _DYN_MASTER = dynamical_master_pattern(
            cubic_structure("fcc", "ni", 3.52), size=201, n_beams=64
        )
        print(f"dynamical master 201x201 computed in {time.time()-t0:.1f}s")
    return _DYN_MASTER


def render_patterns(angles_deg, noise=0.0, seed=0, freqs=(9.0, 14.0, 6.0),
                    mode=None):
    """Synthetic band patterns from orientations.

    Default: the fast cosine toy (``freqs`` sets band frequencies per
    crystal axis; distinct tuples emulate distinct phases). With
    ``--kinematical``, renders physical Kikuchi bands via `latice_tpu.sim`
    (fcc nickel at 20 kV) — same API, realistic band geometry. With
    ``--dynamical``, renders by lookup into a first-party Bloch-wave master
    (`sim.dynamical`) — dynamical band profiles on the same geometry.
    """
    rng = np.random.default_rng(seed)
    mode = mode or _RENDER
    if mode != "cosine":
        if freqs != (9.0, 14.0, 6.0):
            # The cosine toy emulates phases by frequency tuples; the
            # physical renderers are single-phase fcc Ni here.
            raise ValueError(
                f"--{mode} renders one fcc-Ni phase; per-phase freqs "
                "are a cosine-toy feature"
            )
        if mode == "dynamical":
            from latice_tpu.sim import render_from_master

            out = render_from_master(
                _dynamical_master(), np.asarray(angles_deg, np.float64),
                chunk=256,
            ).astype(np.float32)
        else:
            from latice_tpu.sim import simulate_patterns

            out = simulate_patterns(
                np.asarray(angles_deg, np.float64), chunk=256
            )
        if noise:
            out = out + rng.normal(size=out.shape).astype(np.float32) * noise
        return np.clip(out, 0, 1)
    mats = R.from_euler("zxz", angles_deg, degrees=True).as_matrix()
    h = w = 128
    yy, xx = np.meshgrid(np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij")
    base = np.stack([xx, yy, np.ones_like(xx) * 0.7], -1)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    out = np.zeros((len(mats), h, w), np.float32)
    for k, f in enumerate(freqs):
        dot = np.einsum("hwc,nc->nhw", base, mats[:, k, :])
        out += np.cos(f * np.pi * dot).astype(np.float32)
    out = (out - out.min()) / (out.max() - out.min())
    if noise:
        out = out + rng.normal(size=out.shape).astype(np.float32) * noise
    return np.clip(out, 0, 1)

def main(scaled: bool = False):
    # Fine grid: 16x16x16 over a 30-degree box -> 2-degree spacing (reference-like
    # dictionary density, cf. anglefile_sample's 1-degree grid).
    g = np.linspace(0, 30, 16)
    z1, x_, z2 = np.meshgrid(g, g + 40, g, indexing="ij")
    dict_angles = np.stack([z1.ravel(), x_.ravel(), z2.ravel()], -1)  # (4096, 3)
    print("rendering dictionary...", len(dict_angles))
    dict_patterns = render_patterns(dict_angles)

    from latice_tpu.models import VariationalAutoEncoderRawData
    from latice_tpu.train import VAELoss, create_train_state, make_train_step
    from latice_tpu.index import IndexPipeline

    # --scaled: the 64-d-latent 6-stage flagship (conf/lightning_module/
    # scaled.yaml) for an accuracy-vs-capacity comparison on the same data.
    if scaled:
        model = VariationalAutoEncoderRawData(
            inplanes=64, latent_dim=64, n_stages=6, bottleneck_hw=2,
            dtype=jnp.bfloat16,
        )
    else:
        model = VariationalAutoEncoderRawData(inplanes=32, latent_dim=16, dtype=jnp.bfloat16)
    params0 = model.init({"params": jax.random.key(0)}, jnp.zeros((1,128,128,1)), jax.random.key(1))["params"]
    N = len(dict_angles)

    def encode_dictionary(params):
        enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode")[0])
        xd = jnp.asarray(dict_patterns[..., None].astype(np.float32))
        lat = np.concatenate([np.asarray(enc(params, xd[i:i+512])) for i in range(0, N, 512)])
        return lat / np.linalg.norm(lat, axis=1, keepdims=True)

    def eval_pipe(pipe, q_angles, q, tag, res=None):
        if res is None:
            res = pipe(q.astype(np.float32))
        got = R.from_euler("zxz", np.where(res.success[:,None], res.best_orientation, 0), degrees=True)
        want = R.from_euler("zxz", q_angles, degrees=True)
        err = np.degrees((got.inv() * want).magnitude())
        err = np.where(res.success, err, np.nan)
        print(f"{tag}: success={res.success.mean():.1%} median_err={np.nanmedian(err):.3f} deg "
              f"p90={np.nanpercentile(err, 90):.2f}")
        return res

    def build_and_eval(params, tag):
        vecs = encode_dictionary(params)
        pipe = IndexPipeline(model, params, vecs, dict_angles, top_n=10,
                             orientation_threshold=5.0, min_required_matches=3, batch_size=512)
        q_angles = dict_angles[::8][:512]
        q = render_patterns(q_angles, noise=0.15, seed=9)[..., None]
        eval_pipe(pipe, q_angles, q, tag)

    print("== random weights ==")
    build_and_eval(params0, "random")

    print("== training (device-resident) ==")
    state = create_train_state(model, params0, learning_rate=3e-4)
    loss_fn = VAELoss(kl_lambda=5e-6)
    B = 256

    def step_with_take(state, xd, idx, rng):
        batch = jnp.take(xd, idx, axis=0)
        step_rng = jax.random.fold_in(rng, state.step)
        def loss_of(p):
            z, x_hat, mu, std = state.apply_fn({"params": p}, batch, step_rng)
            l = loss_fn(z, x_hat, mu, std, batch)
            return l["loss"], l
        (_, losses), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), losses["loss"]
    step = jax.jit(step_with_take, donate_argnums=(0,))

    xd = jnp.asarray(dict_patterns[..., None].astype(np.float32))
    key = jax.random.key(3)
    rng = np.random.default_rng(1)
    t0 = time.time()
    STEPS = 600
    for s in range(STEPS):
        idx = jnp.asarray(rng.integers(0, N, size=B))
        state, loss = step(state, xd, idx, key)
    print(f"{STEPS} steps in {time.time()-t0:.1f}s, final loss {float(loss):.5f}")
    print("== trained weights ==")
    build_and_eval(state.params, "trained")

    # Sub-grid refinement: off-grid queries (the realistic case — experimental
    # orientations never sit on dictionary grid points) indexed with and
    # without similarity-weighted consensus (IndexPipeline
    # consensus_weight_power). Uniform mean = reference parity.
    print("== off-grid refinement (similarity-weighted consensus) ==")
    vecs = encode_dictionary(state.params)
    rng2 = np.random.default_rng(11)
    q_angles = rng2.uniform([1, 41, 1], [29, 69, 29], size=(512, 3))
    q = render_patterns(q_angles, noise=0.15, seed=13)[..., None]
    last_res = None
    for power in (None, 16, 64, 256):
        pipe = IndexPipeline(model, state.params, vecs, dict_angles, top_n=10,
                             orientation_threshold=5.0, min_required_matches=3,
                             batch_size=512, consensus_weight_power=power)
        last_res = eval_pipe(pipe, q_angles, q, f"off-grid power={power}")

    # Pattern-space DI baseline (index.pattern_di): NCC of the same noisy
    # off-grid queries against the raw dictionary stack — no encoder. The
    # physics yardstick the latent engine is judged against.
    print("== pattern-space DI baseline (NCC, no encoder) ==")
    from latice_tpu.index import PatternDictionaryIndexer

    di = PatternDictionaryIndexer(
        dict_patterns, dict_angles, top_n=10,
        orientation_threshold=5.0, min_required_matches=3, batch_size=512,
    )
    eval_pipe(di, q_angles, q, "off-grid DI")

    if _RENDER != "cosine":
        # Dictionary-free plane: the same noisy off-grid queries solved by
        # spherical cross-correlation against the master (index.spherical)
        # — no encoder, no dictionary, no sampling grid. The master IS the
        # render source here, so this measures the plane's own accuracy
        # floor at this noise level.
        print("== spherical-harmonic indexing (dictionary-free) ==")
        from latice_tpu.crystal.symmetry import (
            symmetry_reduced_misorientation,
        )
        from latice_tpu.index import (
            SphericalIndexer,
            SphericalIndexerConfig,
        )

        if _RENDER == "dynamical":
            sph_master = _dynamical_master()
        else:
            from latice_tpu.sim import make_kinematical_master

            sph_master = make_kinematical_master(size=513)
        t0 = time.time()
        sph = SphericalIndexer(
            sph_master,
            config=SphericalIndexerConfig(bandwidth=64, chunk=32),
        )
        t_setup = time.time() - t0
        t0 = time.time()
        sres = sph.index_patterns(q[..., 0])
        dt = time.time() - t0
        want_q = np.roll(
            R.from_euler("zxz", q_angles, degrees=True).as_quat(), 1, axis=1
        )
        sph_err = np.degrees(np.asarray(symmetry_reduced_misorientation(
            jnp.asarray(want_q, jnp.float32),
            jnp.asarray(sres.quaternions, jnp.float32),
        )))
        print(
            f"spherical L=64: median_err={np.median(sph_err):.3f} deg "
            f"p90={np.percentile(sph_err, 90):.2f} "
            f"({len(q)/dt:.0f} patterns/s wall; setup {t_setup:.1f}s)"
        )

    if _RENDER == "dynamical":
        # Model-mismatch robustness: the encoder/dictionary saw dynamical
        # profiles; query with *kinematical* renders of the same
        # orientations (band geometry identical, intensity model different)
        # — the realistic gap between simulated dictionaries and detector
        # physics.
        print("== cross-model queries (kinematical renders, dynamical dictionary) ==")
        q_kin = render_patterns(
            q_angles, noise=0.15, seed=13, mode="kinematical"
        )[..., None]
        pipe = IndexPipeline(model, state.params, vecs, dict_angles, top_n=10,
                             orientation_threshold=5.0, min_required_matches=3,
                             batch_size=512)
        eval_pipe(pipe, q_angles, q_kin, "cross-model")

    if _RENDER != "cosine":
        # Autodiff refinement through the renderer: the dictionary-indexed
        # orientations initialize a gradient fit of the actual physics —
        # accuracy decouples from the grid spacing entirely. Under
        # --dynamical the forward model is the band profile FITTED to the
        # master (sim.master_fit — the refinement provenance `simulate
        # --master` persists for `query --refine`), so the refiner sees the
        # dictionary's own physics instead of the kinematical default.
        print("== off-grid autodiff refinement (sim.refine, 40 steps) ==")
        from latice_tpu.crystal import from_euler_zxz_deg
        from latice_tpu.sim import refine_orientations

        refine_refl = None
        if _RENDER == "dynamical":
            from latice_tpu.sim import (
                cubic_reflectors,
                fit_reflectors_to_master,
            )

            t0 = time.time()
            refine_refl, fit_ncc = fit_reflectors_to_master(
                _dynamical_master(),
                cubic_reflectors("fcc", a=3.52, kv=20.0, max_hkl=4,
                                 min_d=0.6),
            )
            print(
                f"fitted {len(refine_refl)} bands to the master "
                f"(NCC {fit_ncc:.3f}, {time.time()-t0:.1f}s)"
            )

        t0 = time.time()
        init_q = np.asarray(
            from_euler_zxz_deg(
                jnp.asarray(last_res.best_orientation, jnp.float32)
            )
        )
        refined_q, ncc = refine_orientations(
            q[..., 0], init_q, steps=40, chunk=256, reflectors=refine_refl
        )
        got = R.from_quat(np.roll(refined_q, -1, axis=1))
        want = R.from_euler("zxz", q_angles, degrees=True)
        err = np.degrees((got.inv() * want).magnitude())
        err = np.where(last_res.success, err, np.nan)
        print(
            f"refined (consensus init): median_err={np.nanmedian(err):.3f} "
            f"deg p90={np.nanpercentile(err, 90):.2f} "
            f"ncc={np.median(ncc):.3f} ({time.time()-t0:.1f}s)"
        )

        # The consensus mean averages grid neighbors ACROSS basins under
        # heavy noise, so its init can sit outside the refiner's attraction
        # basin (measured: 4-deg inits stall, 1-deg inits reach 0.07 deg).
        # The `query --refine-candidates` path fixes that structurally:
        # every top-k *grid point* is within the grid covering radius of
        # the truth whenever the right basin is in the list at all, and the
        # physics NCC re-ranks after refinement.
        from latice_tpu.sim import refine_candidates

        t0 = time.time()
        cand_q = np.asarray(
            from_euler_zxz_deg(
                jnp.asarray(
                    dict_angles[last_res.indices], jnp.float32
                ).reshape(-1, 3)
            )
        ).reshape(*last_res.indices.shape, 4)
        refined_q, ncc, best_k = refine_candidates(
            q[..., 0], cand_q, steps=40, chunk=256, reflectors=refine_refl
        )
        got = R.from_quat(np.roll(refined_q, -1, axis=1))
        err = np.degrees((got.inv() * want).magnitude())
        err = np.where(last_res.success, err, np.nan)
        print(
            f"refined (top-{cand_q.shape[1]} candidates, NCC re-ranked): "
            f"median_err={np.nanmedian(err):.3f} deg "
            f"p90={np.nanpercentile(err, 90):.2f} ncc={np.median(ncc):.3f} "
            f"overruled={np.mean(best_k != 0):.0%} ({time.time()-t0:.1f}s)"
        )


if __name__ == "__main__":
    import sys

    if "--dynamical" in sys.argv:
        _RENDER = "dynamical"
    elif "--kinematical" in sys.argv:
        _RENDER = "kinematical"
    main(scaled="--scaled" in sys.argv)
