"""Shared helpers of the indexing CLI command modules."""

from __future__ import annotations

import logging
import time

import numpy as np

logger = logging.getLogger(__name__)


def _load_model(checkpoint: str | None, inplanes: int, latent_dim: int):
    import jax
    import jax.numpy as jnp

    from latice_tpu.models import VariationalAutoEncoderRawData
    from latice_tpu.train.checkpoint import load_params

    model = VariationalAutoEncoderRawData(
        inplanes=inplanes, latent_dim=latent_dim, dtype=jnp.bfloat16
    )
    init_params = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((1, 128, 128, 1)),
        jax.random.key(1),
    )["params"]
    if checkpoint:
        params = load_params(checkpoint, init_params)
        logger.info(f"Loaded checkpoint from {checkpoint}")
    else:
        params = init_params
        logger.warning("No checkpoint given; using random weights")
    return model, params



def _load_raw_pattern_stack(args) -> np.ndarray:
    """Load ``args.patterns`` (.npy stack, HDF5 scan, or EDAX .up1/.up2),
    autofilling ``args.scan_grid`` from UP headers when absent."""
    from latice_tpu.data import HDF5_EXTENSIONS, UP_EXTENSIONS

    low = args.patterns.lower()
    if low.endswith(HDF5_EXTENSIONS):
        from latice_tpu.data import find_pattern_dataset

        f, dset = find_pattern_dataset(
            args.patterns, getattr(args, "h5_dataset", None)
        )
        try:
            return dset[...]
        finally:
            f.close()
    if low.endswith(UP_EXTENSIONS):
        from latice_tpu.data import open_up_patterns

        header, pats = open_up_patterns(args.patterns)
        if not args.scan_grid and header.scan_grid:
            args.scan_grid = list(header.scan_grid)
        return np.asarray(pats[...])
    return np.load(args.patterns)




def _reflectors_from_meta(meta):
    """Rebuild the simulate-time reflector table from npz provenance —
    either explicit fitted bands (master-fit dictionaries, `simulate
    --master`) or the structure/lattice record (kinematical)."""
    from latice_tpu.sim import cubic_reflectors, hexagonal_reflectors

    if "fitted_bands" in meta:
        from latice_tpu.sim import Reflectors

        fb = meta["fitted_bands"]
        return Reflectors(
            normals=np.asarray(fb["normals"], np.float32),
            sin_theta=np.asarray(fb["sin_theta"], np.float32),
            intensity=np.asarray(fb["intensity"], np.float32),
        )
    if meta["structure"] == "hcp":
        c = meta.get("lattice_c") or 1.587 * meta["lattice"]
        return hexagonal_reflectors(
            a=meta["lattice"], c=c, kv=meta["kv"],
            max_hkl=meta["max_hkl"], min_d=meta["min_d"],
        )
    return cubic_reflectors(
        meta["structure"], a=meta["lattice"], kv=meta["kv"],
        max_hkl=meta["max_hkl"], min_d=meta["min_d"],
    )




def _refine_result(args, meta, patterns, result, steps, db):
    """Autodiff orientation refinement against the dictionary's own forward
    model (sim.refine): sub-grid accuracy from the dictionary-indexed
    initialization. With --refine-candidates K > 1, every top-K candidate
    is refined and the best NCC wins — the physics overrules the encoder's
    ranking wherever the latent search picked the wrong grid point."""
    import jax.numpy as jnp

    from latice_tpu.crystal import from_euler_zxz_deg, to_euler_zxz_deg
    from latice_tpu.sim import (
        DetectorGeometry,
        refine_candidates,
        refine_orientations,
    )

    geometry = DetectorGeometry(
        shape=(meta["size"], meta["size"]), pcx=meta["pc"][0],
        pcy=meta["pc"][1], dd=meta["pc"][2], tilt=meta.get("tilt", 0.0),
    )
    reflectors = _reflectors_from_meta(meta)
    x = np.asarray(patterns)
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    t0 = time.time()
    k = min(getattr(args, "refine_candidates", 1) or 1, result.indices.shape[1])
    summary = {"refine_steps": steps}
    if k > 1:
        cand = np.asarray(
            from_euler_zxz_deg(
                jnp.asarray(
                    db._orientations[result.indices[:, :k]], jnp.float32
                ).reshape(-1, 3)
            )
        ).reshape(len(x), k, 4)
        refined_q, ncc, best_k = refine_candidates(
            x, cand, geometry, reflectors, steps=steps
        )
        summary["refine_reranked_frac"] = round(float((best_k > 0).mean()), 4)
    else:
        init_q = np.asarray(
            from_euler_zxz_deg(
                jnp.asarray(result.best_orientation, jnp.float32)
            )
        )
        refined_q, ncc = refine_orientations(
            x, init_q, geometry, reflectors, steps=steps
        )
    refined = np.asarray(
        to_euler_zxz_deg(jnp.asarray(refined_q))
    ).astype(np.float64)
    logger.info(
        f"Refined {len(x)} orientations (top-{k}) in {time.time()-t0:.1f}s; "
        f"median NCC {np.median(ncc):.3f}"
    )
    summary["refine_ncc_median"] = round(float(np.median(ncc)), 4)
    return result._replace(best_orientation=refined), summary


