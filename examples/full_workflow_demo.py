"""Full-workflow demo: a synthetic polycrystal from first principles to a
finished analysis, using only this framework.

The loop every EBSD user runs, with zero external tools:

1. `crystal.sampling`   — fundamental-zone dictionary orientations
2. `sim.simulate`       — kinematical Kikuchi patterns for the dictionary
3. (synthetic scan)     — a Voronoi polycrystal rendered with the same
                          physics, degraded with shot noise + hot pixels
4. `data.nlpar`         — neighborhood denoising of the raw scan
5. `IndexPipeline`      — dictionary indexing (untrained encoder — see note)
6. `sim.refine`         — autodiff refinement with NCC re-ranking of the
                          top-k candidates (the physics overrules the
                          encoder's ranking where it was wrong)
7. `crystal.maps`       — grain labeling + boundary map vs the known truth
8. `data.export`        — a .ang file MTEX/OIM can open

Note: the encoder is untrained (random weights keep the demo minutes-fast
on CPU), so the scan noise is kept within its margin; a trained checkpoint
widens every gap (see examples/accuracy_benchmark.py --kinematical for
trained-model numbers).

Run:
    python examples/full_workflow_demo.py --cpu
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--grid", type=int, default=20, help="scan side length")
    ap.add_argument("--grains", type=int, default=6)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from latice_tpu.crystal import (
        from_euler_zxz_deg,
        label_grains,
        misorientation_maps,
        sample_fundamental_zone,
        symmetry_reduced_misorientation,
        to_euler_zxz_deg,
    )
    from latice_tpu.data import nlpar_denoise, write_ang
    from latice_tpu.index import IndexPipeline
    from latice_tpu.models import VariationalAutoEncoderRawData
    from latice_tpu.sim import (
        DetectorGeometry,
        cubic_reflectors,
        refine_candidates,
        simulate_patterns,
    )

    rng = np.random.default_rng(args.seed)

    # 1-2) Dictionary: FZ orientations -> kinematical patterns ------------
    quats = sample_fundamental_zone("432", resolution_deg=14.0)
    geometry = DetectorGeometry()
    reflectors = cubic_reflectors("fcc", max_hkl=2, min_d=1.0)
    dict_patterns = simulate_patterns(quats, geometry, reflectors)
    dict_eulers = np.asarray(to_euler_zxz_deg(quats.astype(np.float32)))
    print(f"dictionary: {len(quats)} FZ orientations at 14 deg, simulated")

    # 3) Synthetic polycrystal scan: Voronoi grains on the grid -----------
    g = args.grid
    seeds = rng.uniform(0, g, size=(args.grains, 2))
    yy, xx = np.mgrid[0:g, 0:g]
    d2 = (yy[..., None] - seeds[:, 0]) ** 2 + (xx[..., None] - seeds[:, 1]) ** 2
    grain_of = d2.argmin(-1)  # (g, g) grain id per pixel
    grain_orient = rng.choice(len(quats), size=args.grains, replace=False)
    pix_orient = grain_orient[grain_of]  # dictionary row per pixel
    scan = dict_patterns[pix_orient.ravel()].copy()
    scan += rng.normal(size=scan.shape).astype(np.float32) * 0.01
    scan = np.where(rng.random(scan.shape) < 1e-4, 6.0, scan).astype(np.float32)

    # 4) NLPAR (hot pixels repaired before averaging) ----------------------
    den = nlpar_denoise(
        scan.reshape(g, g, *scan.shape[1:]), h=2.0, hot_pixel_threshold=6.0
    ).reshape(len(scan), *scan.shape[1:])

    # 5) Dictionary indexing ----------------------------------------------
    model = VariationalAutoEncoderRawData(inplanes=4, latent_dim=16)
    params = model.init(
        {"params": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 1)),
        jax.random.key(2),
    )["params"]
    enc = jax.jit(lambda x: model.apply({"params": params}, x, method="encode")[0])
    lat = np.asarray(enc(jnp.asarray(dict_patterns[..., None])))
    vecs = lat / np.linalg.norm(lat, axis=1, keepdims=True)
    pipe = IndexPipeline(
        model, params, vecs, dict_eulers,
        top_n=5, orientation_threshold=3.0, min_required_matches=1,
        batch_size=g * g,
    )
    res = pipe(den)
    top1 = (res.indices[:, 0] == pix_orient.ravel()).mean()
    print(f"indexing: top-1 accuracy {top1:.1%} (untrained encoder)")

    # 6) Refinement with NCC re-ranking: refine every top-5 candidate and
    # keep the best physics fit — the renderer overrules the encoder's
    # ranking wherever the latent search picked the wrong grid point.
    cand_q = np.asarray(
        from_euler_zxz_deg(
            jnp.asarray(dict_eulers[res.indices], jnp.float32).reshape(-1, 3)
        )
    ).reshape(len(den), -1, 4)
    refined_q, ncc, best_k = refine_candidates(
        den, cand_q, geometry, reflectors, steps=25
    )
    truth_q = quats[pix_orient.ravel()].astype(np.float32)
    err = np.degrees(
        np.asarray(
            symmetry_reduced_misorientation(
                jnp.asarray(refined_q), jnp.asarray(truth_q)
            )
        )
    )
    reranked = (err < 2.0).mean()
    print(
        f"refined+reranked: {reranked:.1%} of pixels correct "
        f"(re-rank overruled the encoder on {(best_k > 0).mean():.1%}); "
        f"median error {np.median(err):.3f} deg, ncc median {np.median(ncc):.3f}"
    )

    # 7) Grain analysis vs the known Voronoi truth -------------------------
    euler_grid_map = np.asarray(
        to_euler_zxz_deg(jnp.asarray(refined_q))
    ).reshape(g, g, 3)
    maps = misorientation_maps(euler_grid_map, group="432")
    labels, n_found = label_grains(maps, threshold_deg=5.0)
    # Majority-label agreement with the truth partition.
    agree = 0
    for gid in range(args.grains):
        mask = grain_of == gid
        if mask.any():
            vals, counts = np.unique(labels[mask], return_counts=True)
            agree += counts.max()
    agree /= g * g
    print(
        f"grains: truth {args.grains}, found {n_found}; "
        f"majority-partition agreement {agree:.1%}"
    )

    # 8) Vendor export ------------------------------------------------------
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".ang", delete=False) as f:
        ang_path = f.name
    final = res._replace(
        best_orientation=np.asarray(
            to_euler_zxz_deg(jnp.asarray(refined_q))
        ).astype(np.float64)
    )
    write_ang(ang_path, final, grid=(g, g), step=0.5)
    with open(ang_path) as fh:
        n_rows = sum(1 for line in fh if not line.startswith("#"))
    print(f"export: {ang_path} ({n_rows} rows) — opens in MTEX/OIM")

    assert reranked > max(top1, 0.8), "re-ranked refinement should win"
    assert np.median(err) < 0.5, "refinement should be sub-grid"
    assert agree > 0.75, "grain partition should match the Voronoi truth"
    print("OK: full native workflow, dictionary to .ang")


if __name__ == "__main__":
    main()
