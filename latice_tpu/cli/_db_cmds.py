"""`index.py build/export/query` — the latent-dictionary plane."""

from __future__ import annotations

import json
import logging
import time

import numpy as np

logger = logging.getLogger(__name__)
from pathlib import Path

from latice_tpu.cli._common import _load_model, _refine_result


def cmd_build(args) -> None:
    from latice_tpu.index import (
        DiffractionPatternIndexer,
        IndexerConfig,
        LatentVectorDatabaseConfig,
        TpuLatentVectorDatabase,
    )

    if len(args.patterns) != len(args.angles):
        raise SystemExit("--patterns and --angles must be given the same number of times")
    groups = args.phase_groups.split(",") if args.phase_groups else None
    if groups and len(groups) < len(args.patterns):
        raise SystemExit(
            f"{len(args.patterns)} phases but only {len(groups)} --phase-groups"
        )
    # Phase labels are persisted whenever more than one phase is given OR an
    # explicit point group is named — a single-phase hexagonal dictionary
    # (--phase-groups 622) must not silently fall back to cubic at query time.
    multiphase = len(args.patterns) > 1 or groups is not None

    model, params = _load_model(args.checkpoint, args.inplanes, args.latent_dim)
    db = TpuLatentVectorDatabase(
        LatentVectorDatabaseConfig(
            npz_path=args.db,
            dimension=args.latent_dim,
            phase_symmetries=groups if multiphase else None,
        )
    )
    mesh = None
    if getattr(args, "devices", None) and args.devices > 1:
        import jax

        from latice_tpu.parallel import make_mesh

        if jax.local_device_count() >= args.devices:
            mesh = make_mesh(args.devices)
            logger.info(f"sharding build encode over {mesh.size} devices")
        else:
            logger.warning(
                f"--devices {args.devices} ignored: only "
                f"{jax.local_device_count()} attached"
            )

    indexer = DiffractionPatternIndexer(
        model,
        params,
        db=db,
        config=IndexerConfig(
            pattern_path=args.patterns[0],
            angles_path=args.angles[0],
            batch_size=args.batch_size,
            latent_dim=args.latent_dim,
        ),
        mesh=mesh,
    )
    t0 = time.time()
    if multiphase:
        # One (--patterns, --angles) pair per phase; list position = phase id.
        indexer.build_multiphase_dictionary(list(zip(args.patterns, args.angles)))
    else:
        indexer.build_dictionary()
    # Simulation provenance: always RESET from this build's inputs — a
    # rebuilt npz must not keep a previous build's forward model (stale
    # provenance would let --refine run against unrelated physics). Gated
    # on the pattern-file count, not the multiphase flag, so a single-phase
    # hcp build (--phase-groups 622) still carries its provenance.
    db.sim_meta = None
    if len(args.patterns) == 1:
        sidecar = Path(args.patterns[0] + ".simmeta.json")
        if sidecar.exists():
            db.sim_meta = json.loads(sidecar.read_text())
            logger.info("Persisting simulation provenance for query --refine")
    db.save()
    logger.info(
        f"Built dictionary of {db.get_count()} vectors"
        + (f" across {len(args.patterns)} phases" if len(args.patterns) > 1 else "")
        + f" in {time.time()-t0:.1f}s -> {args.db}"
    )




def cmd_export(args) -> None:
    from latice_tpu.index import DiffractionPatternIndexer, IndexerConfig

    model, params = _load_model(args.checkpoint, args.inplanes, args.latent_dim)
    indexer = DiffractionPatternIndexer(
        model,
        params,
        config=IndexerConfig(
            pattern_path=args.patterns,
            angles_path=args.angles,
            batch_size=args.batch_size,
            latent_dim=args.latent_dim,
        ),
    )
    latents, _ = indexer.export_latents(args.latents_out, args.angles_out)
    logger.info(f"Exported {len(latents)} latent vectors")




def cmd_query(args) -> None:
    from latice_tpu.index import IndexPipeline, LatentVectorDatabaseConfig, TpuLatentVectorDatabase
    from latice_tpu.index.pipeline import concat_dense_results
    from latice_tpu.data import HDF5_EXTENSIONS, UP_EXTENSIONS, prepare_patterns

    model, params = _load_model(args.checkpoint, args.inplanes, args.latent_dim)
    db = TpuLatentVectorDatabase(
        LatentVectorDatabaseConfig(npz_path=args.db, dimension=args.latent_dim)
    )
    if db.get_count() == 0:
        raise SystemExit(f"Database {args.db} is empty — run 'build' first")

    phase_kw = {}
    if db._has_phases:
        phase_kw = dict(
            dictionary_phases=db._phases,
            phase_symmetries=db.config.phase_symmetries,
        )
    mesh = None
    if getattr(args, "devices", None) and args.devices > 1:
        import jax

        from latice_tpu.parallel import make_mesh

        if jax.local_device_count() >= args.devices:
            mesh = make_mesh(args.devices)
            logger.info(f"sharding pipeline over {mesh.size} devices")
        else:
            logger.warning(
                f"--devices {args.devices} ignored: only "
                f"{jax.local_device_count()} attached"
            )
    preprocess = None
    if getattr(args, "preprocess", None):
        from latice_tpu.data import parse_preprocess_spec

        preprocess = parse_preprocess_spec(args.preprocess)
        if isinstance(preprocess.static_background, str):
            # static=auto: the detector response estimate is the scan mean
            # (streamed for HDF5 — the map never materializes on host).
            import dataclasses

            from latice_tpu.data import estimate_static_background

            def _model_units(s):
                # Match the scale/crop the fused preprocess will see: the
                # pipeline divides uint8 inputs by 255 BEFORE the recipe.
                s = prepare_patterns(s)
                if s.dtype == np.uint8:
                    s = s.astype(np.float32) / 255.0
                return s

            if args.patterns.lower().endswith(HDF5_EXTENSIONS):
                from latice_tpu.data import (
                    find_pattern_dataset,
                    iter_pattern_batches,
                )

                f, dset = find_pattern_dataset(args.patterns, args.h5_dataset)
                try:
                    bg = estimate_static_background(
                        _model_units(s)
                        for s in iter_pattern_batches(dset, args.h5_chunk)
                    )
                finally:
                    f.close()
            elif args.patterns.lower().endswith(UP_EXTENSIONS):
                from latice_tpu.data import iter_up_batches, open_up_patterns

                _, pats = open_up_patterns(args.patterns)
                bg = estimate_static_background(
                    _model_units(s)
                    for s in iter_up_batches(pats, args.h5_chunk)
                )
            else:
                bg = estimate_static_background(_model_units(np.load(args.patterns)))
            logger.info("static=auto: using the scan-mean background")
            preprocess = dataclasses.replace(
                preprocess, static_background=bg
            )
    pipe = IndexPipeline(
        model,
        params,
        db._vectors,
        db._orientations,
        top_n=args.top_n,
        orientation_threshold=args.threshold,
        min_required_matches=args.min_matches,
        consensus_weight_power=args.weight_power,
        batch_size=args.batch_size,
        mesh=mesh,
        engine=getattr(args, "engine", "exact"),
        preprocess=preprocess,
        **phase_kw,
    )
    hough_state: dict = {"det": None, "iq": [], "bands": []}

    def _hough(s):
        """Accumulate detector-side Hough IQ alongside the indexing stream
        (--hough-iq): runs per slab, so streamed scans get real IQ too."""
        if not getattr(args, "hough_iq", False):
            return s
        from latice_tpu.data import BandDetector

        if hough_state["det"] is None:
            hough_state["det"] = BandDetector(
                height=s.shape[1], width=s.shape[2],
                batch_size=min(args.batch_size, 256),
            )
        det = hough_state["det"](s)
        hough_state["iq"].append(det.iq)
        hough_state["bands"].append(det.band_count)
        return s

    def _nlpar(x):
        """Optional NLPAR neighborhood denoising over the scan grid."""
        if not getattr(args, "nlpar", None):
            return x
        if not args.scan_grid:
            raise SystemExit("--nlpar needs --scan-grid ROWS COLS")
        from latice_tpu.data import nlpar_denoise

        rows, cols = args.scan_grid
        if len(x) != rows * cols:
            raise SystemExit(
                f"--scan-grid {rows}x{cols} does not match {len(x)} patterns"
            )
        # NLPAR output is float32, so the pipeline's integer-dtype /255
        # branch will NOT fire downstream — normalize here to keep the
        # model-unit contract (uint8 loses its link fast path under NLPAR;
        # the averaging needs float math anyway).
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        x = np.asarray(x, np.float32)
        scan = x.reshape(rows, cols, *x.shape[1:])
        out = nlpar_denoise(
            scan,
            search_radius=args.nlpar_radius,
            h=args.nlpar,
            # Hot pixels must be repaired BEFORE averaging (they inflate the
            # noise estimate and smear into the window); reuse the fused
            # recipe's threshold when it has one.
            hot_pixel_threshold=(
                preprocess.hot_pixel_threshold if preprocess else None
            ),
        )
        return out.reshape(len(x), *x.shape[1:])

    refine_steps = getattr(args, "refine", None)
    if refine_steps and db.sim_meta is None:
        raise SystemExit(
            "--refine needs a dictionary with simulation provenance (built "
            "from 'index.py simulate' output); this npz has none"
        )

    t0 = time.time()
    if args.patterns.lower().endswith(HDF5_EXTENSIONS):
        # HDF5 scan (vendor acquisition container): stream slabs off disk so
        # arbitrarily large maps never materialize fully in host memory.
        from latice_tpu.data import find_pattern_dataset, iter_pattern_batches

        f, dset = find_pattern_dataset(args.patterns, args.h5_dataset)
        slabs = None
        raw_dtype = dset.dtype
        try:
            if getattr(args, "nlpar", None) or refine_steps:
                # NLPAR averages across scan rows and --refine re-reads the
                # patterns after indexing, so the map must materialize once.
                logger.info("materializing the HDF5 scan on host")
                x = _nlpar(_hough(prepare_patterns(dset[...])))
                result = pipe(x)
            else:
                # Background-thread prefetch: the next slab's disk read +
                # host prep overlaps the device compute this loop blocks on.
                from latice_tpu.data import prefetch_host

                slabs = prefetch_host(
                    prepare_patterns(slab)
                    for slab in iter_pattern_batches(dset, args.h5_chunk)
                )
                result = concat_dense_results(pipe(_hough(s)) for s in slabs)
                x = None
        finally:
            if slabs is not None:
                # Joins the prefetch thread so no reader is mid-dset access
                # when the file closes (h5py is not safe against that).
                slabs.close()
            f.close()
        n = len(result.success)
    elif args.patterns.lower().endswith(UP_EXTENSIONS):
        # EDAX UP1/UP2 raw scan: the pattern block is memory-mapped, so
        # slabs stream off disk like the HDF5 path (.up1 frames stay uint8
        # end to end — the device-side /255 fast path).
        from latice_tpu.data import iter_up_batches, open_up_patterns

        header, pats = open_up_patterns(args.patterns)
        raw_dtype = pats.dtype
        if not args.scan_grid and header.scan_grid:
            # Square-grid UP headers carry the scan geometry; use it so
            # NLPAR and .ang/.ctf export work without an explicit flag.
            args.scan_grid = list(header.scan_grid)
            logger.info(
                f"scan grid {header.scan_grid[0]}x{header.scan_grid[1]} "
                "from the UP header"
            )
        if getattr(args, "nlpar", None) or refine_steps:
            x = _nlpar(_hough(prepare_patterns(np.asarray(pats[...]))))
            result = pipe(x)
        else:
            from latice_tpu.data import prefetch_host

            slabs = prefetch_host(
                prepare_patterns(slab)
                for slab in iter_up_batches(pats, args.h5_chunk)
            )
            try:
                result = concat_dense_results(pipe(_hough(s)) for s in slabs)
            finally:
                slabs.close()
            x = None
        n = len(result.success)
    else:
        x = _nlpar(_hough(prepare_patterns(np.load(args.patterns))))
        result = pipe(x)
        n = len(x)
    dt = time.time() - t0
    logger.info(
        f"Indexed {n} patterns in {dt:.2f}s ({n/dt:,.0f}/s); "
        f"success rate {result.success.mean():.1%}"
    )
    summary = {
        "n_patterns": n,
        "success_rate": float(result.success.mean()),
        "seconds": dt,
        "out": args.out,
        # Result provenance: on TPU the uint8 and float input paths compile
        # to different XLA programs whose bf16 roundings can differ by
        # ~1e-2 in score and swap near-tied candidates (ROADMAP "uint8 vs
        # f32"; pinned on-chip by the opt-in tests/test_bench_gate.py
        # tripwire) — record which path produced this result. Slab-streamed
        # stores ride the uint8 device-side /255 fast path only for uint8
        # sources; every other dtype reaches the model as float32.
        "input_dtype": (
            str(x.dtype)
            if x is not None
            else ("uint8" if raw_dtype == np.uint8 else "float32")
        ),
    }
    # Persist the dictionary-indexed result BEFORE refinement: a refine
    # failure (shape mismatch, OOM) must not discard a potentially
    # hours-long indexing run. Refinement overwrites the file on success.
    np.save(args.out, result.best_orientation)
    if refine_steps:
        result, refine_summary = _refine_result(
            args, db.sim_meta, x, result, refine_steps, db
        )
        summary.update(refine_summary)
        np.save(args.out, result.best_orientation)
    if result.phase is not None:
        phase_out = args.out.replace(".npy", "") + "_phase.npy"
        np.save(phase_out, result.phase)
        summary["phase_out"] = phase_out
        summary["phase_counts"] = np.bincount(result.phase).tolist()
    grid = tuple(args.scan_grid) if args.scan_grid else None
    db_groups = (
        list(db.config.phase_symmetries)
        if db.config.phase_symmetries is not None
        else None
    )
    ang_kw: dict = {}
    ctf_kw: dict = {}
    if getattr(args, "hough_iq", False) and hough_state["iq"]:
        # Detector-side quality measured on the raw frames (pre-NLPAR):
        # the vendor .ang IQ / .ctf Bands semantics, not the similarity
        # stand-ins.
        hiq = np.concatenate(hough_state["iq"])
        hbands = np.concatenate(hough_state["bands"])
        iq_out = args.out.replace(".npy", "") + "_iq.npy"
        np.save(iq_out, hiq)
        summary["hough_iq_out"] = iq_out
        summary["mean_iq"] = round(float(hiq.mean()), 4)
        ang_kw = {"iq": hiq}
        ctf_kw = {"bands": hbands}
    if args.ang:
        from latice_tpu.data import write_ang

        write_ang(args.ang, result, grid=grid, step=args.step,
                  phase_groups=db_groups, **ang_kw)
        summary["ang_out"] = args.ang
    if args.ctf:
        from latice_tpu.data import write_ctf

        write_ctf(args.ctf, result, grid=grid, step=args.step,
                  phase_groups=db_groups, **ctf_kw)
        summary["ctf_out"] = args.ctf
    if args.ambiguity:
        # Pseudo-symmetry diagnostic: score margin to the best genuinely
        # different candidate (index.diagnostics).
        from latice_tpu.index import candidate_ambiguity

        amb = candidate_ambiguity(
            result,
            db._orientations,
            phase_groups=db_groups,
            dictionary_phases=db._phases if db_groups else None,
        )
        np.savez(
            args.ambiguity,
            angle_deg=amb.angle_deg,
            score_gap=amb.score_gap,
            has_rival=amb.has_rival,
        )
        flagged = amb.ambiguous(max_gap=args.ambiguity_gap)
        summary["ambiguity_out"] = args.ambiguity
        summary["ambiguous_frac"] = round(float(flagged.mean()), 4)
        logger.info(
            f"{flagged.sum()} / {len(flagged)} pixels ambiguous "
            f"(rival within {args.ambiguity_gap} cosine score)"
        )
    print(json.dumps(summary))




def register(sub, common) -> None:
    """Attach this module's subcommand parser(s)."""
    b = sub.add_parser("build", parents=[common], help="build dictionary DB")
    b.add_argument(
        "--patterns", required=True, action="append",
        help="dictionary .npy stack (repeat once per phase for multi-phase)",
    )
    b.add_argument(
        "--angles", required=True, action="append",
        help="angle file (repeat once per phase, paired with --patterns)",
    )
    b.add_argument(
        "--phase-groups", default=None,
        help="comma-separated point groups, one per phase (e.g. 432,622); "
        "persisted in the npz and applied automatically at query time",
    )
    b.add_argument(
        "--devices", type=int, default=None,
        help="shard the build encode over N devices (data-parallel mesh, "
        "params replicated; latents match the single-device build to float "
        "roundoff). Default: single device",
    )
    b.set_defaults(fn=cmd_build)


    e = sub.add_parser(
        "export", parents=[common], help="export dictionary latents to .npy"
    )
    e.add_argument("--patterns", required=True, help="dictionary .npy stack")
    e.add_argument("--angles", required=True, help="angle file")
    e.add_argument("--latents-out", default="latents.npy")
    e.add_argument("--angles-out", default="orientations.npy")
    e.set_defaults(fn=cmd_export)


    q = sub.add_parser("query", parents=[common], help="index patterns")
    q.add_argument(
        "--patterns", required=True,
        help=".npy stack, HDF5 scan (.h5/.h5oina/...), or EDAX raw pattern "
        "file (.up1/.up2) to index",
    )
    q.add_argument(
        "--h5-dataset", default=None,
        help="HDF5 dataset path of the pattern stack (default: auto-detect "
        "the largest (N, H, W) dataset)",
    )
    q.add_argument(
        "--h5-chunk", type=int, default=4096,
        help="patterns per streamed slab (HDF5 and UP inputs)",
    )
    q.add_argument("--out", default="orientations.npy")
    q.add_argument(
        "--ang", default=None, help="also write a TSL/OIM .ang result file"
    )
    q.add_argument(
        "--ctf", default=None, help="also write a Channel Text File (.ctf)"
    )
    q.add_argument(
        "--scan-grid", type=int, nargs=2, metavar=("ROWS", "COLS"), default=None,
        help="scan shape for .ang/.ctf x-y columns (default: one line)",
    )
    q.add_argument("--step", type=float, default=1.0, help="scan step (um)")
    q.add_argument("--top-n", type=int, default=20)
    q.add_argument("--threshold", type=float, default=3.0)
    q.add_argument("--min-matches", type=int, default=18)
    q.add_argument(
        "--weight-power", type=float, default=None, metavar="P",
        help="similarity^P-weighted consensus mean (sub-grid refinement; "
        "default: reference-parity uniform mean)",
    )
    q.add_argument(
        "--engine", default="exact", choices=("exact", "fused", "approx", "int8"),
        help="candidate-search engine (approx/int8 trade ~2-6%% recall@10 "
        "for speed/residency at very large dictionaries)",
    )
    q.add_argument(
        "--devices", type=int, default=None,
        help="run the pipeline data-parallel over N devices: batch-sharded "
        "encode + row-sharded dictionary search (default: single device)",
    )
    q.add_argument(
        "--refine", type=int, default=None, metavar="STEPS",
        help="autodiff orientation refinement against the dictionary's "
        "simulation model (needs a db built from 'simulate' output): "
        "N Adam steps through the differentiable renderer push accuracy "
        "below the dictionary grid spacing (try 40)",
    )
    q.add_argument(
        "--refine-candidates", type=int, default=1, metavar="K",
        help="with --refine: refine the top-K dictionary candidates and "
        "keep the best NCC per pattern (K refinement passes; recovers "
        "patterns the latent search mis-ranked)",
    )
    q.add_argument(
        "--ambiguity", default=None, metavar="OUT.npz",
        help="write the pseudo-symmetry diagnostic (per-pixel angle and "
        "score gap to the best genuinely different candidate; "
        "index.diagnostics) and report the ambiguous fraction",
    )
    q.add_argument(
        "--ambiguity-gap", type=float, default=0.02,
        help="cosine-score margin under which a rival counts as ambiguous "
        "(default: %(default)s)",
    )
    q.add_argument(
        "--hough-iq", action="store_true",
        help="compute the detector-side Hough Image Quality alongside "
        "indexing (streams with the scan): writes <out>_iq.npy and fills "
        "the .ang IQ / .ctf Bands columns with real values instead of "
        "similarity stand-ins",
    )
    q.add_argument(
        "--nlpar", type=float, default=None, metavar="H",
        help="NLPAR neighborhood denoising before indexing (needs "
        "--scan-grid); H is the smoothing strength in noise sigmas "
        "(1.0 conservative, 2-3 aggressive)",
    )
    q.add_argument(
        "--nlpar-radius", type=int, default=1,
        help="NLPAR search-window half-width (default 1 = 3x3)",
    )
    q.add_argument(
        "--preprocess", default=None, metavar="SPEC",
        help="on-device pattern correction fused into the pipeline, e.g. "
        "'hotpixels=5,static=bg.npy,dynamic=auto,bin=2' (keys: hotpixels, "
        "static, static-mode, dynamic, dynamic-mode, equalize, normalize, "
        "clip, bin — see data.parse_preprocess_spec)",
    )
    q.set_defaults(fn=cmd_query)

