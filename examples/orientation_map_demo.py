"""Orientation-map demo: index a synthetic scan and render the IPF map.

The end product of EBSD indexing is an inverse-pole-figure-colored
orientation map of the scanned area. This demo builds a grain structure
(regions of constant orientation), renders its patterns, trains the VAE,
indexes the scan through the fused pipeline, and writes side-by-side IPF maps
of ground truth vs indexed result plus a success mask.

Run: PYTHONPATH=.:/root/.axon_site python examples/orientation_map_demo.py \
         --out /tmp/orientation_map.png
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def make_grain_map(side: int, n_grains: int, angle_lo, angle_hi, seed=0):
    """Voronoi grain structure: (side, side) map of grain ids + per-grain
    orientations."""
    rng = np.random.default_rng(seed)
    seeds = rng.uniform(0, side, size=(n_grains, 2))
    yy, xx = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    d2 = (yy[..., None] - seeds[:, 0]) ** 2 + (xx[..., None] - seeds[:, 1]) ** 2
    grain_id = np.argmin(d2, axis=-1)
    grain_angles = rng.uniform(angle_lo, angle_hi, size=(n_grains, 3))
    return grain_id, grain_angles


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="/tmp/orientation_map.png")
    parser.add_argument("--side", type=int, default=48, help="scan side length")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from examples.accuracy_benchmark import render_patterns
    from latice_tpu.crystal import (
        grain_boundary_mask,
        label_grains,
        misorientation_maps,
    )
    from latice_tpu.index import IndexPipeline
    from latice_tpu.models import VariationalAutoEncoderRawData
    from latice_tpu.train import VAELoss, create_train_state, make_train_step
    from latice_tpu.utils import get_color_key

    rng = np.random.default_rng(0)
    lo, hi = [0, 40, 0], [30, 70, 30]

    # Dictionary: 2-degree grid over the orientation box.
    g = np.linspace(0, 30, 16)
    z1, x_, z2 = np.meshgrid(g, g + 40, g, indexing="ij")
    dict_angles = np.stack([z1.ravel(), x_.ravel(), z2.ravel()], -1)
    print(f"rendering {len(dict_angles)}-entry dictionary...")
    dict_patterns = render_patterns(dict_angles)

    # Scan: Voronoi grains with orientations inside the box, noisy patterns.
    grain_id, grain_angles = make_grain_map(args.side, 25, lo, hi, seed=3)
    scan_angles = grain_angles[grain_id.ravel()]
    print(f"rendering {len(scan_angles)}-pixel scan...")
    scan = render_patterns(scan_angles, noise=0.15, seed=7)

    # Train briefly (device-resident batches).
    model = VariationalAutoEncoderRawData(inplanes=32, latent_dim=16, dtype=jnp.bfloat16)
    params0 = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 128, 128, 1)), jax.random.key(1)
    )["params"]
    state = create_train_state(model, params0, learning_rate=3e-4)
    loss_fn = VAELoss(kl_lambda=5e-6)

    def step_fn(state, xd, idx, rng_key):
        batch = jnp.take(xd, idx, axis=0)
        step_rng = jax.random.fold_in(rng_key, state.step)

        def loss_of(p):
            z, x_hat, mu, std = state.apply_fn({"params": p}, batch, step_rng)
            return loss_fn(z, x_hat, mu, std, batch)["loss"]

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        return state.apply_gradients(grads=grads), loss

    step = jax.jit(step_fn, donate_argnums=(0,))
    xd = jnp.asarray(dict_patterns[..., None].astype(np.float32))
    t0 = time.time()
    for s in range(600):
        idx = jnp.asarray(rng.integers(0, len(dict_angles), size=256))
        state, loss = step(state, xd, idx, jax.random.key(3))
    print(f"trained 600 steps in {time.time()-t0:.1f}s, loss {float(loss):.4f}")

    # Encode dictionary + index the scan.
    enc = jax.jit(lambda p, x: model.apply({"params": p}, x, method="encode")[0])
    lat = np.concatenate(
        [np.asarray(enc(state.params, xd[i : i + 512])) for i in range(0, len(xd), 512)]
    )
    vecs = lat / np.linalg.norm(lat, axis=1, keepdims=True)
    pipe = IndexPipeline(
        model, state.params, vecs, dict_angles,
        top_n=10, orientation_threshold=5.0, min_required_matches=3, batch_size=512,
    )
    t0 = time.time()
    res = pipe(scan[..., None].astype(np.float32))
    print(
        f"indexed {len(scan)} pixels in {time.time()-t0:.1f}s; "
        f"success {res.success.mean():.1%}"
    )

    # Render IPF-z maps.
    side = args.side
    truth_rgb = get_color_key(scan_angles, "ipf_z").reshape(side, side, 3) / 255.0
    got_angles = np.where(res.success[:, None], res.best_orientation, np.nan)
    got_rgb = np.where(
        res.success[:, None],
        get_color_key(res.best_orientation, "ipf_z"),
        0,
    ).reshape(side, side, 3) / 255.0

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # Grain analysis on the indexed map (crystal.maps): segment grains and
    # compare the recovered count against the Voronoi ground truth.
    euler_grid = res.best_orientation.reshape(side, side, 3)
    maps = misorientation_maps(euler_grid, group="432")
    labels, n_grains = label_grains(maps, threshold_deg=5.0)
    boundaries = grain_boundary_mask(maps, threshold_deg=5.0)
    truth_grains = len(np.unique(grain_id))
    print(f"grain segmentation: {n_grains} grains recovered (truth: {truth_grains})")

    # The full post-indexing analysis suite on the recovered map.
    from latice_tpu.crystal import (
        grain_statistics,
        make_odf,
        schmid_factors,
        texture_index,
    )

    stats = grain_statistics(euler_grid, labels, group="432")
    print(
        f"grain statistics: mean ECD {stats.equivalent_diameter_px.mean():.1f} px, "
        f"mean GOS {stats.gos_deg.mean():.3f} deg"
    )
    odf = make_odf(res.best_orientation[res.success], halfwidth_deg=15.0)
    print(f"texture index J = {texture_index(odf, n=4096):.2f} (1 = random)")
    sf = schmid_factors(euler_grid, (0.0, 0.0, 1.0), family="fcc")
    print(
        f"Schmid factors under [001] load: mean {sf.max_factor.mean():.3f}, "
        f"max {sf.max_factor.max():.3f}"
    )

    fig, axs = plt.subplots(1, 4, figsize=(16, 4), dpi=120)
    grain_rgb = plt.get_cmap("tab20")(labels % 20)[..., :3]
    grain_rgb[boundaries] = 0.0
    for ax, img, title in [
        (axs[0], truth_rgb, "ground truth (IPF-z)"),
        (axs[1], got_rgb, "indexed (IPF-z)"),
        (axs[2], grain_rgb, f"grains ({n_grains}, boundaries black)"),
        (axs[3], res.success.reshape(side, side), "success mask"),
    ]:
        kw = {"vmin": 0, "vmax": 1, "cmap": "gray"} if img.ndim == 2 else {}
        ax.imshow(img, interpolation="nearest", **kw)
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
