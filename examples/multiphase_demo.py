"""Multi-phase indexing demo: two crystal phases, one dictionary, one scan.

BASELINE config 5's "multi-phase dictionary" end to end (beyond the
single-phase-cubic reference): two synthetic phases (distinct band-frequency
families standing in for distinct structures, cubic "432" and hexagonal
"622" point groups), a shared VAE, a phase-labeled dictionary, and a
Voronoi-grain scan where every pixel must be resolved to BOTH the right
phase and the right orientation.

Run: PYTHONPATH=.:/root/.axon_site python examples/multiphase_demo.py
     (add --cpu to force the CPU backend; add --out map.png for a phase map)
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=None, help="optional phase-map PNG")
    parser.add_argument("--side", type=int, default=32, help="scan side length")
    parser.add_argument("--steps", type=int, default=500, help="train steps")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from examples.accuracy_benchmark import render_patterns
    from examples.orientation_map_demo import make_grain_map
    from latice_tpu.index import IndexPipeline
    from latice_tpu.models import VariationalAutoEncoderRawData
    from latice_tpu.train import VAELoss, create_train_state, make_train_step

    PHASE_FREQS = [(9.0, 14.0, 6.0), (11.0, 7.0, 16.0)]
    PHASE_GROUPS = ["432", "622"]  # cubic, hexagonal
    rng = np.random.default_rng(0)

    # Per-phase dictionaries on the same orientation grid.
    g = np.linspace(0, 30, 12)
    z1, x_, z2 = np.meshgrid(g, g + 40, g, indexing="ij")
    grid_angles = np.stack([z1.ravel(), x_.ravel(), z2.ravel()], -1)
    print(f"rendering 2 x {len(grid_angles)}-entry phase dictionaries...")
    dict_patterns = np.concatenate(
        [render_patterns(grid_angles, freqs=f) for f in PHASE_FREQS]
    )
    dict_angles = np.concatenate([grid_angles, grid_angles])
    dict_phases = np.repeat([0, 1], len(grid_angles)).astype(np.int32)

    # Scan: Voronoi grains, each with a phase and an orientation.
    grain_id, grain_angles = make_grain_map(
        args.side, 20, [0, 40, 0], [30, 70, 30], seed=3
    )
    grain_phase = rng.integers(0, 2, size=len(grain_angles))
    scan_angles = grain_angles[grain_id.ravel()]
    scan_phases = grain_phase[grain_id.ravel()]
    print(f"rendering {len(scan_angles)}-pixel two-phase scan...")
    scan = np.concatenate(
        [
            render_patterns(
                scan_angles[i : i + 1], noise=0.1, seed=100 + i,
                freqs=PHASE_FREQS[scan_phases[i]],
            )
            for i in range(len(scan_angles))
        ]
    )

    # Train the shared VAE on the union dictionary.
    model = VariationalAutoEncoderRawData(inplanes=32, latent_dim=16, dtype=jnp.bfloat16)
    params0 = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 128, 128, 1)), jax.random.key(1)
    )["params"]
    state = create_train_state(model, params0, learning_rate=3e-4)
    step = make_train_step(VAELoss(kl_lambda=5e-6), donate=True)
    xd = jnp.asarray(dict_patterns[..., None].astype(np.float32))
    t0 = time.time()
    for s in range(args.steps):
        idx = jnp.asarray(rng.integers(0, len(dict_patterns), size=256))
        state, metrics = step(state, jnp.take(xd, idx, axis=0), jax.random.key(s))
    print(
        f"trained {args.steps} steps in {time.time()-t0:.1f}s, "
        f"loss {float(metrics['loss']):.4f}"
    )

    # Phase-labeled dictionary through the fused pipeline.
    enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode")[0])
    lat = np.concatenate(
        [np.asarray(enc(state.params, xd[i : i + 512])) for i in range(0, len(xd), 512)]
    )
    vecs = lat / np.linalg.norm(lat, axis=1, keepdims=True)
    pipe = IndexPipeline(
        model, state.params, vecs, dict_angles,
        top_n=10, orientation_threshold=5.0, min_required_matches=3,
        batch_size=512, dictionary_phases=dict_phases,
        phase_symmetries=PHASE_GROUPS,
    )
    t0 = time.time()
    res = pipe(scan[..., None].astype(np.float32))
    phase_acc = (res.phase == scan_phases).mean()
    err = np.abs(res.best_orientation - scan_angles)
    err = np.minimum(err, 360 - err).max(axis=1)
    print(
        f"indexed {len(scan)} pixels in {time.time()-t0:.1f}s: "
        f"success {res.success.mean():.1%}, phase accuracy {phase_acc:.1%}, "
        f"median orientation err {np.median(err[res.success]):.2f} deg"
    )

    # Multi-phase grain analysis of the indexed map: same-phase edges reduce
    # with that phase's point group, phase boundaries always segment.
    from latice_tpu.crystal import label_grains, misorientation_maps_multiphase

    side = int(np.sqrt(len(scan)))
    maps = misorientation_maps_multiphase(
        res.best_orientation.reshape(side, side, 3),
        np.asarray(res.phase).reshape(side, side),
        ["432", "622"],
    )
    labels, n_grains = label_grains(maps, threshold_deg=5.0)
    print(
        f"grain segmentation (per-phase symmetry): {n_grains} grains "
        f"(truth: {len(np.unique(grain_id))} Voronoi cells)"
    )

    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from latice_tpu.utils import get_color_key

        # IPF-z map colored with each pixel's own phase point group (the
        # cubic-only reference could not render the hexagonal phase).
        ipf = np.zeros((len(scan_angles), 3))
        for pid, grp in enumerate(PHASE_GROUPS):
            sel = res.phase == pid
            if sel.any():
                ipf[sel] = get_color_key(
                    res.best_orientation[sel], "ipf_z", group=grp
                ) / 255.0

        side = args.side
        fig, axs = plt.subplots(1, 3, figsize=(12, 4), dpi=120)
        for ax, img, title, kw in [
            (axs[0], scan_phases.reshape(side, side), "ground-truth phase",
             dict(cmap="coolwarm", vmin=0, vmax=1)),
            (axs[1], res.phase.reshape(side, side), "indexed phase",
             dict(cmap="coolwarm", vmin=0, vmax=1)),
            (axs[2], ipf.reshape(side, side, 3), "indexed IPF-z (per-phase key)",
             {}),
        ]:
            ax.imshow(img, **kw)
            ax.set_title(title)
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(args.out)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
