"""Raw-detector-data demo: degrade patterns the way real acquisitions do
(vignetting, additive diffusion background, hot pixels, shot noise), then
recover indexability with the on-device preprocessing stack + NLPAR.

Three configurations of the SAME product pipeline are compared:

1. *naive* — dictionary encoded from clean patterns, raw scan indexed with
   no correction (what a reference user gets feeding detector frames in);
2. *preprocess* — dictionary and queries both normalized to band contrast
   (`PreprocessConfig` fused into the pipeline: hot-pixel repair, static
   vignette division, dynamic background removal);
3. *preprocess + NLPAR* — queries additionally denoised over the scan grid
   (`nlpar_denoise`, hot pixels repaired before averaging).

Success alone is a weak metric here (any tight dictionary cluster can form
a consensus); the demo scores median orientation error and top-1 accuracy
against the known ground truth, and asserts each stage improves it.

Note the encoder is UNTRAINED (random weights — keeps the demo minutes-fast
on CPU): an untrained conv encoder is far more sensitive to residual noise
than a trained one, so the noise level here is calibrated to its margin. A
trained checkpoint widens every gap below.

Run:
    python examples/raw_data_demo.py --cpu
"""

from __future__ import annotations

import argparse

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise", type=float, default=0.015)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from latice_tpu.data import (
        PreprocessConfig,
        make_preprocess_fn,
        nlpar_denoise,
    )
    from latice_tpu.index import IndexPipeline
    from latice_tpu.models import VariationalAutoEncoderRawData

    rng = np.random.default_rng(args.seed)

    # --- dictionary: distinct clean patterns with known orientations -----
    n_dict = 24
    base = rng.uniform(0.2, 0.8, size=(n_dict, 128, 128)).astype(np.float32)
    dict_angles = rng.uniform([10, 30, 10], [170, 140, 170], size=(n_dict, 3))

    model = VariationalAutoEncoderRawData(inplanes=4, latent_dim=16)
    params = model.init(
        {"params": jax.random.key(1)},
        jnp.zeros((1, 128, 128, 1)),
        jax.random.key(2),
    )["params"]
    enc = jax.jit(
        lambda x: model.apply({"params": params}, x, method="encode")[0]
    )

    def normed(lat):
        lat = np.asarray(lat)
        return lat / np.linalg.norm(lat, axis=1, keepdims=True)

    # --- scan: a 4-row grid of dictionary patterns, detector-degraded ----
    rows = 4
    pick = np.tile(np.arange(n_dict), rows)
    truth_idx = pick
    clean = base[pick]
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float32) / 127.0
    vignette = (
        0.55 + 0.45 * np.exp(-((xx - 0.5) ** 2 + (yy - 0.5) ** 2) * 2)
    ).astype(np.float32)
    diffusion = (0.35 * (0.5 + 0.5 * xx)).astype(np.float32)
    raw = clean * vignette[None] + diffusion[None]
    raw += rng.normal(size=raw.shape).astype(np.float32) * args.noise
    raw = np.where(rng.random(raw.shape) < 2e-4, 8.0, raw).astype(np.float32)

    # Correction recipes. The dictionary must live in the SAME representation
    # corrected queries land in: band contrast (dynamic background removed).
    query_cfg = PreprocessConfig(
        hot_pixel_threshold=6.0,
        static_background=vignette,
        dynamic_sigma="auto",
    )
    dict_cfg = PreprocessConfig(dynamic_sigma="auto")
    dict_fn = jax.jit(make_preprocess_fn(dict_cfg))

    # min_required_matches=1: every dictionary orientation is distinct here,
    # so consensus clusters don't exist — scoring is top-1 accuracy + error.
    kw = dict(
        top_n=8, orientation_threshold=3.0, min_required_matches=1,
        batch_size=n_dict * rows,
    )
    naive_vecs = normed(enc(jnp.asarray(base[..., None])))
    naive = IndexPipeline(model, params, naive_vecs, dict_angles, **kw)
    band_vecs = normed(enc(dict_fn(jnp.asarray(base[..., None]))))
    corrected = IndexPipeline(
        model, params, band_vecs, dict_angles, preprocess=query_cfg, **kw
    )

    def run(name, pipe, queries):
        res = pipe(queries)
        top1 = (res.indices[:, 0] == truth_idx).mean()
        want = dict_angles[truth_idx]
        err = np.abs(res.best_orientation - want).max(axis=1)
        print(
            f"{name:24s} top-1 acc {top1:6.1%}   median |err| "
            f"{np.median(err):7.2f} deg"
        )
        return top1

    print(f"scan {rows}x{n_dict}, dictionary {n_dict} entries, "
          f"noise {args.noise}, untrained encoder")
    a = run("naive (no correction)", naive, raw)
    b = run("preprocess", corrected, raw)
    den = nlpar_denoise(
        raw.reshape(rows, n_dict, 128, 128), h=2.0, hot_pixel_threshold=6.0
    ).reshape(-1, 128, 128)
    c = run("preprocess + NLPAR", corrected, den)
    assert a < b < c, "each correction stage should improve top-1 accuracy"
    assert c > 0.7, "corrected + denoised scan should mostly index"
    print("OK: correction recovers the degraded scan")


if __name__ == "__main__":
    main()
