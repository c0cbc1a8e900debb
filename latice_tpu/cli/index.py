"""Indexing CLI — dictionary build + batch pattern indexing.

The reference only shipped this flow as notebooks (notebook/index.ipynb,
index_faiss.ipynb — SURVEY §2 #16); here it is a first-class command:

    # build a dictionary database from simulated patterns + angles
    python index.py build --patterns dict.npy --angles angles.txt \
        --checkpoint checkpoints/best --db latent_index.npz

    # index unknown patterns against it
    python index.py query --patterns scan.npy --db latent_index.npz \
        --checkpoint checkpoints/best --out orientations.npy

    # multi-phase: one --patterns/--angles pair per phase + its point group;
    # query then also writes <out>_phase.npy
    python index.py build --patterns fcc.npy --angles fcc.txt \
        --patterns hcp.npy --angles hcp.txt --phase-groups 432,622 \
        --checkpoint checkpoints/best --db mp_index.npz
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.INFO)
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


def cmd_di(args) -> None:
    """Pattern-space dictionary indexing: NCC against the raw dictionary.

    The EMsoft-EMDI role (`index.pattern_di`): correlate experimental
    patterns directly against the simulated pattern stack — no trained
    encoder anywhere, so ``sample`` -> ``simulate`` -> ``di`` indexes with
    zero training. Brute force costs ~D/16 of the latent engine per query;
    ``--bin`` trades detector resolution for speed, and the latent
    pipeline (``build`` + ``query``) is the production-scale path this
    baselines.
    """
    from latice_tpu.data import (
        HDF5_EXTENSIONS,
        UP_EXTENSIONS,
        parse_angle_file,
        prepare_patterns,
    )
    from latice_tpu.index import PatternDictionaryIndexer

    if len(args.dict_patterns) != len(args.dict_angles):
        raise SystemExit(
            "--dict-patterns and --dict-angles must be given the same "
            "number of times"
        )
    groups = args.phase_groups.split(",") if args.phase_groups else None
    multiphase = len(args.dict_patterns) > 1 or groups is not None
    if multiphase and (not groups or len(groups) < len(args.dict_patterns)):
        raise SystemExit(
            f"{len(args.dict_patterns)} phases need --phase-groups with one "
            "group per phase"
        )
    stacks, angle_parts, phase_parts = [], [], []
    for pid, (pp, ap) in enumerate(zip(args.dict_patterns, args.dict_angles)):
        s = np.load(pp)
        a = parse_angle_file(str(ap))
        if len(s) != len(a):
            raise SystemExit(
                f"{pp} holds {len(s)} patterns but {ap} lists {len(a)} angles"
            )
        stacks.append(s)
        angle_parts.append(a)
        phase_parts.append(np.full(len(s), pid, np.int32))
    dict_stack = np.concatenate(stacks)
    dict_angles = np.concatenate(angle_parts)
    phase_kw = {}
    if multiphase:
        phase_kw = dict(
            dictionary_phases=np.concatenate(phase_parts),
            phase_symmetries=groups,
        )

    mesh = None
    if args.devices and args.devices > 1:
        import jax

        from latice_tpu.parallel import make_mesh

        if jax.local_device_count() >= args.devices:
            mesh = make_mesh(args.devices)
            logger.info(f"sharding DI over {mesh.size} devices")
        else:
            logger.warning(
                f"--devices {args.devices} ignored: only "
                f"{jax.local_device_count()} attached"
            )

    # The scan materializes on host: DI is a dictionary-bound workload and
    # `--preprocess static=auto` needs the scan mean anyway. (The latent
    # `query` path keeps the slab-streaming route for huge maps.)
    low = args.patterns.lower()
    if low.endswith(HDF5_EXTENSIONS):
        from latice_tpu.data import find_pattern_dataset

        f, dset = find_pattern_dataset(args.patterns, args.h5_dataset)
        try:
            raw = dset[...]
        finally:
            f.close()
    elif low.endswith(UP_EXTENSIONS):
        from latice_tpu.data import open_up_patterns

        header, pats = open_up_patterns(args.patterns)
        if not args.scan_grid and header.scan_grid:
            args.scan_grid = list(header.scan_grid)
        raw = np.asarray(pats[...])
    else:
        raw = np.load(args.patterns)
    x = prepare_patterns(raw)

    preprocess = None
    if args.preprocess:
        from latice_tpu.data import parse_preprocess_spec

        preprocess = parse_preprocess_spec(args.preprocess)
        if isinstance(preprocess.static_background, str):
            import dataclasses

            from latice_tpu.data import estimate_static_background

            scan = x.astype(np.float32) / 255.0 if x.dtype == np.uint8 else x
            preprocess = dataclasses.replace(
                preprocess,
                static_background=estimate_static_background(scan),
            )
            logger.info("static=auto: using the scan-mean background")

    t0 = time.time()
    if args.streamed:
        # Host-resident rows streamed through the chip in fixed chunks —
        # dictionaries beyond HBM (index.pattern_di.StreamedPatternDI).
        # Multi-phase + ambiguity compose exactly like the resident path.
        import jax.numpy as jnp

        from latice_tpu.index import (
            StreamedPatternDI,
            build_pattern_dictionary,
        )

        if mesh is not None:
            logger.warning(
                "--streamed ignores --devices: the streamed engine is the "
                "single-chip beyond-HBM path (shard via the resident "
                "engine instead)"
            )
        rows = build_pattern_dictionary(
            dict_stack,
            bin_factor=args.bin,
            as_numpy=True,
            dtype=jnp.bfloat16
            if args.search_dtype == "bfloat16"
            else jnp.float32,
        )
        di = StreamedPatternDI(
            rows,
            dict_angles,
            bin_factor=args.bin,
            top_n=args.top_n,
            orientation_threshold=args.threshold,
            min_required_matches=args.min_matches,
            consensus_weight_power=args.weight_power,
            batch_size=args.batch_size,
            preprocess=preprocess,
            **phase_kw,
        )
    else:
        di = PatternDictionaryIndexer(
            dict_stack,
            dict_angles,
            bin_factor=args.bin,
            engine=args.engine,
            search_dtype=args.search_dtype,
            preprocess=preprocess,
            top_n=args.top_n,
            orientation_threshold=args.threshold,
            min_required_matches=args.min_matches,
            consensus_weight_power=args.weight_power,
            batch_size=args.batch_size,
            mesh=mesh,
            **phase_kw,
        )
    t_build = time.time() - t0
    t0 = time.time()
    result = di(x)
    dt = time.time() - t0
    n = len(x)
    logger.info(
        f"DI-indexed {n} patterns against {len(dict_stack)} dictionary "
        f"entries in {dt:.2f}s ({n/max(dt, 1e-9):,.0f}/s)"
    )
    np.save(args.out, result.best_orientation)
    summary = {
        "n_patterns": n,
        "n_dictionary": len(dict_stack),
        "success_rate": float(result.success.mean()),
        "mean_top_ncc": round(float(result.scores[:, 0].mean()), 4),
        "build_seconds": round(t_build, 2),
        "seconds": round(dt, 2),
        "out": args.out,
    }
    if result.phase is not None:
        phase_out = args.out.replace(".npy", "") + "_phase.npy"
        np.save(phase_out, result.phase)
        summary["phase_out"] = phase_out
        summary["phase_counts"] = np.bincount(result.phase).tolist()
    grid = tuple(args.scan_grid) if args.scan_grid else None
    if args.ang:
        from latice_tpu.data import write_ang

        write_ang(args.ang, result, grid=grid, step=args.step,
                  phase_groups=groups)
        summary["ang_out"] = args.ang
    if args.ctf:
        from latice_tpu.data import write_ctf

        write_ctf(args.ctf, result, grid=grid, step=args.step,
                  phase_groups=groups)
        summary["ctf_out"] = args.ctf
    if args.ambiguity:
        # Pseudo-symmetry diagnostic (index.diagnostics) — works on the
        # streamed result too: it only needs the candidate lists.
        from latice_tpu.index import candidate_ambiguity

        amb = candidate_ambiguity(
            result,
            dict_angles,
            phase_groups=groups,
            dictionary_phases=(
                np.concatenate(phase_parts) if multiphase else None
            ),
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
            f"(rival within {args.ambiguity_gap} NCC score)"
        )
    print(json.dumps(summary))


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


def cmd_quality(args) -> None:
    """Hough/Radon pattern-quality maps (data.hough).

    The vendor-software standard: a Radon transform finds the Kikuchi
    bands and their mean peak response is the Image Quality practitioners
    map to see grain boundaries, strain and surface damage — computed
    here from the detector frames themselves (``query``'s .ang IQ column
    is similarity-derived; this is the real one). One MXU matmul per
    batch; no indexing required.
    """
    from latice_tpu.data import BandDetector, prepare_patterns

    raw = _load_raw_pattern_stack(args)
    x = prepare_patterns(raw)
    h, w = x.shape[1], x.shape[2]

    t0 = time.time()
    det = BandDetector(
        height=h, width=w, n_theta=args.n_theta, n_rho=args.n_rho,
        k=args.bands, band_width_px=args.band_width,
        batch_size=args.batch_size,
    )
    res = det(x)
    dt = time.time() - t0
    iq = res.iq
    count = res.band_count
    if args.scan_grid:
        rows, cols = args.scan_grid
        if rows * cols != len(iq):
            raise SystemExit(
                f"--scan-grid {rows}x{cols} does not hold {len(iq)} patterns"
            )
        iq = iq.reshape(rows, cols)
        count = count.reshape(rows, cols)
    prefix = args.out_prefix
    np.save(f"{prefix}_iq.npy", iq)
    np.savez(
        f"{prefix}_bands.npz",
        theta_deg=res.theta_deg,
        rho_px=res.rho_px,
        strength=res.strength,
        band_count=res.band_count,
    )
    summary = {
        "n_patterns": len(res.iq),
        "mean_iq": round(float(res.iq.mean()), 4),
        "min_iq": round(float(res.iq.min()), 4),
        "max_iq": round(float(res.iq.max()), 4),
        "mean_band_count": round(float(res.band_count.mean()), 2),
        "seconds": round(dt, 2),
        "outputs": [f"{prefix}_iq.npy", f"{prefix}_bands.npz"],
    }
    if args.iq_map:
        if not args.scan_grid:
            raise SystemExit("--iq-map needs --scan-grid ROWS COLS")
        from latice_tpu.utils._mpl import ensure_headless_backend

        ensure_headless_backend()
        import matplotlib.image as mpimg

        lo, hi = float(iq.min()), float(iq.max())
        mpimg.imsave(
            args.iq_map, (iq - lo) / max(hi - lo, 1e-9), cmap="gray"
        )
        summary["iq_map"] = args.iq_map
    print(json.dumps(summary))


def _parse_hough_phase(spec: str, args) -> tuple:
    """Parse one ``--phase`` spec → ``(name, reflectors, group, (a,b,c))``.

    Two formats:

    * ``[NAME=]STRUCT:a[:c]`` — presets: ``fcc``/``bcc``/``sc`` (point
      group 432) and ``hcp`` (622, c defaults to 1.587·a). kv/max-hkl/
      min-d come from the shared CLI flags.
    * ``[NAME=]cell.json`` — arbitrary cell via `sim.reflectors_from_cell`
      (exact non-cubic metric + structure-factor extinctions). Keys:
      ``group`` and ``a`` required; ``b``, ``c``, ``alpha``, ``beta``,
      ``gamma``, ``basis`` (fractional positions), ``kv``, ``max_hkl``,
      ``min_d``, ``name`` optional (defaults: cubic angles, b=c=a,
      single-atom basis, the shared CLI flags).
    """
    from latice_tpu.sim import (
        cubic_reflectors,
        hexagonal_reflectors,
        reflectors_from_cell,
    )

    name = None
    head, sep, tail = spec.partition("=")
    if sep and not head.endswith(".json"):
        name, spec = head, tail
    if spec.endswith(".json"):
        cell = json.loads(Path(spec).read_text())
        missing = {"group", "a"} - set(cell)
        if missing:
            raise SystemExit(
                f"--phase {spec}: cell JSON must define {sorted(missing)}"
            )
        a = float(cell["a"])
        b = float(cell.get("b", a))
        c = float(cell.get("c", a))
        refl = reflectors_from_cell(
            a=a, b=b, c=c,
            alpha=float(cell.get("alpha", 90.0)),
            beta=float(cell.get("beta", 90.0)),
            gamma=float(cell.get("gamma", 90.0)),
            basis=cell.get("basis", ((0.0, 0.0, 0.0),)),
            kv=float(cell.get("kv", args.kv)),
            max_hkl=int(cell.get("max_hkl", args.max_hkl)),
            min_d=float(cell.get("min_d", args.min_d)),
        )
        return (
            name or cell.get("name") or Path(spec).stem,
            refl, str(cell["group"]), (a, b, c),
        )
    parts = spec.split(":")
    struct = parts[0]
    a = float(parts[1]) if len(parts) > 1 else args.lattice
    if struct == "hcp":
        c = float(parts[2]) if len(parts) > 2 else (
            args.lattice_c or 1.587 * a
        )
        refl = hexagonal_reflectors(
            a=a, c=c, kv=args.kv, max_hkl=args.max_hkl, min_d=args.min_d
        )
        return (name or struct, refl, "622", (a, a, c))
    if struct not in ("fcc", "bcc", "sc"):
        raise SystemExit(
            f"--phase {spec!r}: structure must be fcc/bcc/sc/hcp or a "
            "cell .json path"
        )
    refl = cubic_reflectors(
        struct, a=a, kv=args.kv, max_hkl=args.max_hkl, min_d=args.min_d
    )
    return (name or struct, refl, "432", (a, a, a))


def cmd_hough(args) -> None:
    """Band-based (Hough) orientation indexing — the vendor OIM/AZtec
    algorithm, TPU-native (index.hough_indexing).

    Zero training and zero dictionary patterns: only reflector tables
    (from the structure/lattice flags, or repeatable ``--phase`` specs)
    and the detector geometry. Completes the indexing triangle next to
    ``query`` (latent k-NN) and ``di`` (pattern NCC): bands are found by
    the Radon matmul, orientations solved by MXU grid voting + Davenport
    q-method refinement. Multi-phase like the vendors: the Radon scan
    runs once, every phase solves against the same bands, per-pixel best
    wins (`index.MultiPhaseHoughIndexer`). Results export to .ang/.ctf
    like the other planes.
    """
    from latice_tpu.data import BandDetector, prepare_patterns
    from latice_tpu.index import HoughIndexer, MultiPhaseHoughIndexer
    from latice_tpu.index.pipeline import DenseIndexResult
    from latice_tpu.sim import DetectorGeometry

    # Parse phase specs BEFORE the (possibly long) pattern load so a bad
    # spec fails fast.
    if args.phase:
        phases = [_parse_hough_phase(s, args) for s in args.phase]
    else:
        # Single-phase shorthand via the simulate-style structure flags.
        spec = args.structure
        if args.structure == "hcp" and args.lattice_c:
            spec += f":{args.lattice}:{args.lattice_c}"
        else:
            spec += f":{args.lattice}"
        phases = [_parse_hough_phase(spec, args)]
    names = [p[0] for p in phases]
    groups = [p[2] for p in phases]
    lattices = [p[3] for p in phases]

    raw = _load_raw_pattern_stack(args)
    x = prepare_patterns(raw)
    h, w = x.shape[1], x.shape[2]

    geometry = DetectorGeometry(
        shape=(h, w), pcx=args.pc[0], pcy=args.pc[1], dd=args.pc[2],
        tilt=args.tilt,
    )
    detector = BandDetector(
        height=h, width=w, n_theta=args.n_theta, n_rho=args.n_rho,
        k=args.bands, band_width_px=args.band_width,
        batch_size=args.batch_size,
    )
    common = dict(
        grid_resolution_deg=args.grid_resolution, n_bands=args.bands,
        tolerance_deg=args.tolerance, min_bands=args.min_bands,
        batch_size=args.batch_size, detector=detector,
    )
    t0 = time.time()
    if len(phases) > 1:
        indexer = MultiPhaseHoughIndexer(
            [(p[1], p[2]) for p in phases], geometry, **common
        )
    else:
        indexer = HoughIndexer(
            phases[0][1], geometry, group=groups[0], **common
        )
    t_build = time.time() - t0
    t0 = time.time()
    res = indexer(x)
    dt = time.time() - t0
    n = len(res.success)
    phase_ids = res.phase if len(phases) > 1 else None
    logger.info(
        f"Hough-indexed {n} patterns in {dt:.2f}s ({n/max(dt, 1e-9):,.0f}/s)"
    )
    np.save(args.out, res.eulers_deg)
    detail = dict(
        quaternions=res.quaternions,
        eulers_deg=res.eulers_deg,
        fit_deg=res.fit_deg,
        n_matched=res.n_matched,
        vote_score=res.vote_score,
        band_score=res.band_score,
        success=res.success,
        iq=res.bands.iq,
    )
    if phase_ids is not None:
        detail["phase"] = phase_ids
    np.savez(args.out.replace(".npy", "") + "_detail.npz", **detail)
    summary = {
        "n_patterns": n,
        "success_rate": float(res.success.mean()),
        "mean_fit_deg": round(float(res.fit_deg[res.success].mean()), 3)
        if res.success.any()
        else None,
        "mean_bands_matched": round(float(res.n_matched.mean()), 2),
        "build_seconds": round(t_build, 2),
        "seconds": round(dt, 2),
        "out": args.out,
    }
    if phase_ids is not None:
        phase_out = args.out.replace(".npy", "") + "_phase.npy"
        np.save(phase_out, phase_ids)
        summary["phase_out"] = phase_out
        summary["phase_names"] = names
        summary["phase_counts"] = np.bincount(
            phase_ids, minlength=len(phases)
        ).tolist()
    if args.ang or args.ctf:
        # Adapt to the export plane's result vocabulary: confidence =
        # 1 - fit/tolerance (a [0, 1] residual score), real Hough IQ.
        conf = np.clip(1.0 - res.fit_deg / args.tolerance, 0.0, 1.0)
        dense = DenseIndexResult(
            mean_orientation=np.where(
                res.success[:, None], res.eulers_deg, np.nan
            ),
            best_orientation=res.eulers_deg,
            success=res.success,
            n_similar=res.n_matched,
            indices=np.zeros((n, 1), np.int64),
            scores=conf[:, None],
            phase=phase_ids,
        )
        grid = tuple(args.scan_grid) if args.scan_grid else None
        if args.ang:
            from latice_tpu.data import write_ang

            write_ang(args.ang, dense, grid=grid, step=args.step,
                      phase_names=names, phase_groups=groups,
                      phase_lattices=lattices, iq=res.bands.iq)
            summary["ang_out"] = args.ang
        if args.ctf:
            from latice_tpu.data import write_ctf

            write_ctf(args.ctf, dense, grid=grid, step=args.step,
                      phase_names=names, phase_groups=groups,
                      phase_lattices=lattices)
            summary["ctf_out"] = args.ctf
    print(json.dumps(summary))


def cmd_sphere(args) -> None:
    """Spherical-harmonic indexing — dictionary-free global SO(3) search
    (index.spherical, the EMSphInx role).

    Needs only a master pattern (``index.py master`` output or an
    imported external one) and the detector geometry: each pattern is
    back-projected onto the sphere and cross-correlated against the
    master over all orientations at once. No training, no dictionary
    rendering, no orientation sampling grid to choose.
    """
    from latice_tpu.index.spherical import (
        MultiPhaseSphericalIndexer,
        SphericalIndexerConfig,
    )
    from latice_tpu.index.pipeline import DenseIndexResult
    from latice_tpu.sim import DetectorGeometry

    masters = [np.load(p) for p in args.master]
    if args.master_layout == "square":
        from latice_tpu.sim import resample_square_lambert

        masters = [resample_square_lambert(m) for m in masters]
    n_phases = len(masters)

    def _per_phase(values, fallback, flag):
        if not values:
            return [fallback] * n_phases
        if len(values) == 1:
            return list(values) * n_phases
        if len(values) != n_phases:
            raise SystemExit(
                f"{flag} given {len(values)} times for {n_phases} "
                f"--master flags (give it once to share, or once per "
                f"master)"
            )
        return list(values)

    groups = _per_phase(args.group, "432", "--group")
    # Flag-count usage errors must surface BEFORE the (potentially
    # multi-minute) indexing run, not in the export block after it
    # (round-4 advisor finding).
    names = _per_phase(args.phase_name, None, "--phase-name")
    names = [
        nm if nm is not None else f"phase{i + 1}"
        for i, nm in enumerate(names)
    ]
    lat_a = _per_phase(args.lattice, 3.52, "--lattice")
    lat_c = _per_phase(args.lattice_c, None, "--lattice-c")
    if (
        args.lattice_c
        and len(args.lattice_c) == 1
        and n_phases > 1
        and len(set(groups)) > 1
    ):
        logger.warning(
            "a single --lattice-c is broadcast to all %d phases with "
            "differing point groups (%s) — the shared c lands in every "
            "phase's lattice header; give --lattice-c once per --master "
            "if the phases differ",
            n_phases, "/".join(groups),
        )
    lattices = [
        (a, a, c if c is not None else a)
        for a, c in zip(lat_a, lat_c)
    ]

    raw = _load_raw_pattern_stack(args)
    if raw.ndim == 4:  # (rows, cols, H, W) scans flatten to a stack
        if not args.scan_grid:
            args.scan_grid = list(raw.shape[:2])
        raw = raw.reshape(-1, *raw.shape[2:])
    h, w = raw.shape[1], raw.shape[2]
    geometry = DetectorGeometry(
        shape=(h, w), pcx=args.pc[0], pcy=args.pc[1], dd=args.pc[2],
        tilt=args.tilt,
    )
    cfg = SphericalIndexerConfig(
        bandwidth=args.bandwidth,
        beta_count=args.beta_count,
        alpha_count=args.alpha_count,
        detector_bin=args.bin,
        chunk=args.batch_size,
        symmetry=groups[0],
        refine=not args.no_refine,
    )
    t0 = time.time()
    indexer = MultiPhaseSphericalIndexer(
        masters, geometry, cfg, symmetries=groups
    )
    t_build = time.time() - t0
    t0 = time.time()
    res = indexer.index_patterns(raw)
    dt = time.time() - t0
    n = len(res)
    logger.info(
        f"sphere-indexed {n} patterns in {dt:.2f}s "
        f"({n/max(dt, 1e-9):,.0f}/s; setup {t_build:.1f}s)"
    )
    np.save(args.out, res.eulers_deg)
    np.savez(
        args.out.replace(".npy", "") + "_detail.npz",
        quaternions=res.quaternions,
        eulers_deg=res.eulers_deg,
        scores=res.scores,
        phase=res.phase,
        phase_scores=res.phase_scores,
    )
    summary = {
        "n_patterns": n,
        "n_phases": n_phases,
        "bandwidth": args.bandwidth,
        # Single-phase keeps the scalar JSON contract of the original
        # command; the list form is multi-phase only (r4 advisor).
        "kept_degrees": (
            len(indexer.indexers[0]._l_keep)
            if n_phases == 1
            else [len(ix._l_keep) for ix in indexer.indexers]
        ),
        "mean_score": round(float(res.scores.mean()), 4),
        "build_seconds": round(t_build, 2),
        "seconds": round(dt, 2),
        "out": args.out,
    }
    if n_phases > 1:
        summary["phase_counts"] = np.bincount(
            res.phase, minlength=n_phases
        ).tolist()
    if args.ang or args.ctf:
        success = np.ones(n, bool)
        dense = DenseIndexResult(
            mean_orientation=res.eulers_deg.astype(np.float64),
            best_orientation=res.eulers_deg.astype(np.float64),
            success=success,
            n_similar=np.ones(n, np.int64),
            indices=np.zeros((n, 1), np.int64),
            scores=res.scores[:, None].astype(np.float64),
            phase=res.phase,
        )
        grid = tuple(args.scan_grid) if args.scan_grid else None
        if args.ang:
            from latice_tpu.data import write_ang

            write_ang(args.ang, dense, grid=grid, step=args.step,
                      phase_names=names, phase_groups=groups,
                      phase_lattices=lattices)
            summary["ang_out"] = args.ang
        if args.ctf:
            from latice_tpu.data import write_ctf

            write_ctf(args.ctf, dense, grid=grid, step=args.step,
                      phase_names=names, phase_groups=groups,
                      phase_lattices=lattices)
            summary["ctf_out"] = args.ctf
    print(json.dumps(summary))


def _load_orientation_quats(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Load initial orientations for calibration → ``(quats, success)``.

    Accepts the outputs of any indexing pass: an ``(N, 3)`` zxz-Euler-degree
    or ``(N, 4)`` scalar-first-quaternion ``.npy``, or a vendor ``.ang`` /
    ``.ctf`` result (whose success mask filters unindexed pixels out of the
    fit).
    """
    import jax.numpy as jnp

    from latice_tpu.crystal import from_euler_zxz_deg

    low = path.lower()
    if low.endswith(".ang") or low.endswith(".ctf"):
        from latice_tpu.data import read_ang, read_ctf

        vm = read_ang(path) if low.endswith(".ang") else read_ctf(path)
        eulers, success = vm.eulers, vm.success
    else:
        arr = np.load(path)
        if arr.ndim != 2 or arr.shape[1] not in (3, 4):
            raise SystemExit(
                f"--orientations {path}: expected (N, 3) Euler degrees or "
                f"(N, 4) quaternions, got {arr.shape}"
            )
        if arr.shape[1] == 4:
            q = arr / np.linalg.norm(arr, axis=1, keepdims=True)
            return q.astype(np.float32), np.ones(len(arr), bool)
        eulers, success = arr, np.ones(len(arr), bool)
    q = np.asarray(from_euler_zxz_deg(jnp.asarray(eulers, jnp.float32)))
    return q.astype(np.float32), np.asarray(success, bool)


def _calibration_subset(n: int, grid, success: np.ndarray,
                        max_patterns: int) -> np.ndarray:
    """Pick <= max_patterns indexed pattern indices spread over the scan.

    With a (rows, cols) grid the subset is a coarse sub-grid (corners +
    interior — the gradient G is constrained by the spanned area, so
    spatial spread beats a tight cluster); without one it is an even
    stride through the stack.
    """
    if grid:
        rows, cols = grid
        k = max(2, int(np.ceil(np.sqrt(max_patterns))))
        r_idx = np.unique(np.linspace(0, rows - 1, k).round().astype(int))
        c_idx = np.unique(np.linspace(0, cols - 1, k).round().astype(int))
        idx = (r_idx[:, None] * cols + c_idx[None, :]).ravel()
        idx = idx[idx < n]
    else:
        idx = np.unique(
            np.linspace(0, n - 1, max_patterns).round().astype(int)
        )
    idx = idx[success[idx]]
    if len(idx) > max_patterns:
        idx = idx[
            np.unique(
                np.linspace(0, len(idx) - 1, max_patterns).round().astype(int)
            )
        ]
    if len(idx) < 3:
        raise SystemExit(
            "calibration needs >= 3 indexed patterns after subsetting "
            f"(got {len(idx)})"
        )
    return idx


def cmd_strain(args) -> None:
    """HR-EBSD cross-correlation strain/rotation mapping (latice_tpu.hrebsd).

    Measures the RELATIVE elastic strain and lattice rotation of every
    pattern against a reference pattern from the same grain — the
    Wilkinson HR-EBSD method (sub-pixel ROI shifts → displacement-gradient
    tensor), the vendor capability behind CrossCourt / OIM's HR-EBSD
    module. With ``--stiffness`` the traction-free surface condition
    closes the hydrostatic gauge and stress maps are emitted too.

    The reference must share the grain (cross-correlation needs the same
    zone axes on screen); run per grain, selecting ``--ref`` inside it.
    """
    from latice_tpu.crystal.elastic import CUBIC_STIFFNESS, cubic_stiffness
    from latice_tpu.hrebsd import hrebsd_map, von_mises_strain
    from latice_tpu.sim import DetectorGeometry

    raw = _load_raw_pattern_stack(args)
    if raw.ndim == 4:
        raw = raw.reshape(-1, *raw.shape[-2:])
    if raw.dtype != np.uint8:
        raw = raw.astype(np.float32, copy=False)
    if not 0 <= args.ref < len(raw):
        raise SystemExit(
            f"--ref {args.ref} out of range for {len(raw)} patterns"
        )
    geometry = DetectorGeometry(
        shape=raw.shape[1:], pcx=args.pc[0], pcy=args.pc[1],
        dd=args.pc[2], tilt=args.tilt,
    )

    stiffness = None
    if args.stiffness:
        parts = args.stiffness.split(",")
        if len(parts) == 3:
            stiffness = cubic_stiffness(*(float(p) for p in parts))
        elif args.stiffness in CUBIC_STIFFNESS:
            stiffness = cubic_stiffness(*CUBIC_STIFFNESS[args.stiffness])
        else:
            raise SystemExit(
                f"--stiffness {args.stiffness!r}: use C11,C12,C44 (GPa) or "
                f"one of {sorted(CUBIC_STIFFNESS)}"
            )
    orientations = None
    if args.euler:
        import jax.numpy as jnp

        from latice_tpu.crystal import from_euler_zxz_deg

        orientations = np.asarray(
            from_euler_zxz_deg(jnp.asarray([args.euler], jnp.float32))
        )[0]

    calibration = scan_xy = None
    if args.calibration:
        from latice_tpu.sim.calibrate import ScanCalibration

        if not args.scan_grid:
            raise SystemExit(
                "--calibration needs --scan-grid ROWS COLS (per-pattern "
                "scan positions evaluate the PC model)"
            )
        blob = np.load(args.calibration)
        for key in ("pc0", "gradient"):
            if key not in blob:
                raise SystemExit(
                    f"--calibration {args.calibration}: missing {key!r} "
                    "(expected the `index.py calibrate --scan-grid` npz)"
                )
        calibration = ScanCalibration(
            pc0=blob["pc0"], gradient=blob["gradient"],
            shape=raw.shape[1:], tilt=args.tilt,
        )
        rows, cols = args.scan_grid
        if rows * cols != len(raw):
            raise SystemExit(
                f"--scan-grid {rows}x{cols} does not hold {len(raw)} "
                "patterns"
            )
        rr, cc = np.divmod(np.arange(len(raw)), cols)
        # Same (x = col·step, y = row·step) convention `calibrate
        # --scan-grid` fit the model in.
        scan_xy = np.stack(
            [cc * args.calibration_step, rr * args.calibration_step],
            axis=1,
        )
        # The deformation model expands around the REFERENCE's geometry.
        geometry = calibration.geometry_at(scan_xy[args.ref])

    t0 = time.time()
    res = hrebsd_map(
        raw, raw[args.ref], geometry,
        roi_size=args.roi_size, upsample=args.upsample,
        stiffness=stiffness, orientations=orientations,
        f_min=args.f_min, f_max=args.f_max,
        min_quality=args.min_quality, chunk=args.batch_size,
        remap_iterations=args.remap,
        calibration=calibration, scan_xy=scan_xy,
    )
    dt = time.time() - t0

    vm = von_mises_strain(res.strain)
    out = {
        "a": res.a, "strain": res.strain, "rotation": res.rotation,
        "rotation_deg": res.rotation_deg, "von_mises": vm,
        "shifts_px": res.shifts_px, "quality": res.quality,
        "residual_px": res.residual_px,
        "pc": np.asarray(args.pc), "ref_index": args.ref,
    }
    if res.stress is not None:
        out["stress"] = res.stress
    np.savez(args.out, **out)
    summary = {
        "n_patterns": len(raw),
        "ref_index": args.ref,
        "median_von_mises": round(float(np.median(vm)), 8),
        "max_von_mises": round(float(vm.max()), 8),
        "median_rotation_deg": round(float(np.median(res.rotation_deg)), 5),
        "max_rotation_deg": round(float(res.rotation_deg.max()), 5),
        "mean_quality": round(float(res.quality.mean()), 4),
        "median_residual_px": round(float(np.median(res.residual_px)), 4),
        "first_order_valid": bool(res.rotation_deg.max() < 1.5),
        "remap_iterations": args.remap,
        "seconds": round(dt, 2),
        "output": args.out,
    }
    if args.map:
        if not args.scan_grid:
            raise SystemExit("--map needs --scan-grid ROWS COLS")
        rows, cols = args.scan_grid
        if rows * cols != len(vm):
            raise SystemExit(
                f"--scan-grid {rows}x{cols} does not hold {len(vm)} patterns"
            )
        from latice_tpu.utils._mpl import ensure_headless_backend

        ensure_headless_backend()
        import matplotlib.image as mpimg

        img = vm.reshape(rows, cols)
        lo, hi = float(img.min()), float(img.max())
        mpimg.imsave(
            args.map, (img - lo) / max(hi - lo, 1e-12), cmap="viridis"
        )
        summary["map"] = args.map
    print(json.dumps(summary))


def cmd_calibrate(args) -> None:
    """Autodiff detector-geometry calibration (sim.calibrate).

    Fits the pattern center by maximizing the NCC between differentiable
    band renders and measured patterns, jointly with per-pattern
    orientation corrections. Two geometry models:

    * shared PC (default): one (pcx, pcy, dd) for the whole dataset.
      Removes ~90% of a PC error; the PC<->rotation near-degeneracy caps
      the residual at a few 1e-3 detector widths unless --pin is given.
    * affine scan-varying PC (``--scan-grid ROWS COLS`` or ``--scan-xy``):
      PC(xy) = PC0 + G.xy — the production model (the beam rasters under
      a fixed detector, so the projection center shifts linearly with
      scan position). The affine constraint breaks the PC<->rotation
      degeneracy: PC0 AND the gradient recover to ~1e-4 detector widths
      even with orientations known only to ~1 degree
      (tests/sim/test_calibrate.py::TestScanCalibrate).

    Initial orientations come from any prior indexing pass — ``query`` /
    ``di`` / ``hough`` Euler ``.npy`` output or a vendor ``.ang``/``.ctf``
    (its success mask filters unindexed pixels). Pass ``--pin`` when they
    are certified (a known single crystal): pinning removes the degeneracy
    entirely and gives metrological PC accuracy in either model.
    """
    from latice_tpu.data import prepare_patterns
    from latice_tpu.sim import (
        DetectorGeometry,
        calibrate_geometry,
        calibrate_scan_geometry,
    )

    spec = args.structure
    if args.structure == "hcp" and args.lattice_c:
        spec += f":{args.lattice}:{args.lattice_c}"
    else:
        spec += f":{args.lattice}"
    _, refl, _group, _ = _parse_hough_phase(spec, args)

    raw = _load_raw_pattern_stack(args)
    quats, success = _load_orientation_quats(args.orientations)
    if len(quats) != len(raw):
        raise SystemExit(
            f"{len(raw)} patterns but {len(quats)} orientations"
        )
    # Keep the detector's NATIVE shape (no model-input resize — the
    # geometry being fitted lives in these pixels); NCC standardizes per
    # pattern so integer scaling is cosmetic.
    native = raw.shape[1:3] if raw.ndim == 4 else raw.shape[-2:]
    x = prepare_patterns(raw, image_size=native)
    if x.dtype == np.uint8:
        x = x.astype(np.float32) / 255.0
    h, w = x.shape[1], x.shape[2]
    nominal = DetectorGeometry(
        shape=(h, w), pcx=args.pc[0], pcy=args.pc[1], dd=args.pc[2],
        tilt=args.tilt,
    )

    scan_mode = bool(args.scan_grid) or args.scan_xy is not None
    grid = tuple(args.scan_grid) if args.scan_grid else None
    idx = _calibration_subset(len(x), grid, success, args.max_patterns)
    steps = args.steps if args.steps else (2500 if scan_mode else 300)
    lr_orientation = 0.0 if args.pin else args.lr_orientation

    t0 = time.time()
    if scan_mode:
        if args.scan_xy is not None:
            scan_xy = np.load(args.scan_xy)
            if scan_xy.shape != (len(x), 2):
                raise SystemExit(
                    f"--scan-xy must be ({len(x)}, 2), got {scan_xy.shape}"
                )
        else:
            rows, cols = grid
            if rows * cols != len(x):
                raise SystemExit(
                    f"--scan-grid {rows}x{cols} does not hold {len(x)} "
                    "patterns"
                )
            rr, cc = np.divmod(np.arange(len(x)), cols)
            scan_xy = np.stack([cc * args.step, rr * args.step], axis=1)
        fit, refined, ncc = calibrate_scan_geometry(
            x[idx], quats[idx], scan_xy[idx], nominal, refl,
            steps=steps, lr_pc=args.lr_pc, lr_orientation=lr_orientation,
        )
        model = dict(
            pc0=fit.pc0, gradient=fit.gradient, shape=np.asarray(fit.shape),
            tilt=fit.tilt,
        )
        summary = {
            "model": "affine",
            "pc0": [round(float(v), 6) for v in fit.pc0],
            "gradient": [
                [float(f"{v:.3e}") for v in row] for row in fit.gradient
            ],
            "pc_center": [
                round(float(v), 6)
                for v in fit.pc_at(scan_xy.mean(axis=0))
            ],
        }
    else:
        fitted, refined, ncc = calibrate_geometry(
            x[idx], quats[idx], nominal, refl,
            steps=steps, lr_pc=args.lr_pc, lr_orientation=lr_orientation,
        )
        model = dict(
            pc=np.array([fitted.pcx, fitted.pcy, fitted.dd]),
            shape=np.asarray(fitted.shape), tilt=fitted.tilt,
        )
        summary = {
            "model": "shared",
            "pc": [
                round(float(v), 6)
                for v in (fitted.pcx, fitted.pcy, fitted.dd)
            ],
        }
    dt = time.time() - t0
    np.savez(args.out, **model, refined_quats=refined, pattern_indices=idx)
    summary.update(
        n_used=int(len(idx)),
        steps=int(steps),
        pinned=bool(args.pin),
        mean_ncc=round(float(ncc), 5),
        seconds=round(dt, 2),
        out=args.out,
    )
    logger.info(
        f"Calibrated {summary['model']} PC model from {len(idx)} patterns "
        f"in {dt:.1f}s (NCC {ncc:.4f})"
    )
    print(json.dumps(summary))


def cmd_sample(args) -> None:
    """Generate a dictionary orientation grid over a fundamental zone.

    Writes a reference-format anglefile consumable by `build --angles`
    (the reference ships only a premade 625-row grid,
    data/anglefile_sample.txt, with no generator).
    """
    from scipy.spatial.transform import Rotation as R

    from latice_tpu.crystal import sample_fundamental_zone, write_anglefile

    quats = sample_fundamental_zone(args.group, args.resolution)
    # Host-side zxz conversion (scipy parity is what crystal.quaternion is
    # pinned to); a one-shot CLI should not pay a device compile.
    eulers = R.from_quat(np.roll(quats, -1, axis=1)).as_euler(
        "zxz", degrees=True
    )
    write_anglefile(args.out, eulers)
    print(
        json.dumps(
            {
                "n_orientations": len(eulers),
                "group": args.group,
                "resolution_deg": args.resolution,
                "out": args.out,
            }
        )
    )


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


def _fit_master_bands(args, master_img):
    """Fit the differentiable band model to a master image for refinement
    provenance (sim.master_fit). Candidate band geometry comes from the
    master's own ``.mastermeta.json`` phase record when present (the
    `index.py master` output), else from the CLI structure/lattice flags
    under ``--fit-bands``; returns ``(Reflectors, fit_ncc, source)`` or
    None when neither source applies. Candidates use the Bravais
    sublattice (fcc for zincblende, hcp for wurtzite): lattice-type
    extinctions are exact master zeros, basis effects are what the fit
    measures."""
    from latice_tpu.sim import (
        cubic_reflectors,
        fit_reflectors_to_master,
        hexagonal_reflectors,
    )

    mm = Path(args.master + ".mastermeta.json")
    if mm.exists():
        meta = json.loads(mm.read_text())
        structure = meta["structure"]
        a = meta["lattice"]
        kv = meta["kv"]
        c = meta.get("lattice_c")
        max_hkl = min(int(meta.get("max_hkl", 4)), 5)
        min_d = max(float(meta.get("min_d", 0.5)), 0.45)
        source = "mastermeta"
    elif getattr(args, "fit_bands", False):
        structure = args.structure
        a, kv, c = args.lattice, args.kv, args.lattice_c
        max_hkl, min_d = args.max_hkl, max(args.min_d, 0.45)
        source = "cli_args"
    else:
        return None
    if structure in ("hcp", "wurtzite"):
        c = c or (1.587 if structure == "hcp" else 1.626) * a
        cand = hexagonal_reflectors(
            a=a, c=c, kv=kv, max_hkl=max_hkl, min_d=min_d
        )
    elif structure == "zincblende":
        cand = cubic_reflectors(
            "fcc", a=a, kv=kv, max_hkl=max_hkl, min_d=min_d
        )
    else:
        cand = cubic_reflectors(
            structure, a=a, kv=kv, max_hkl=max_hkl, min_d=min_d
        )
    fitted, ncc = fit_reflectors_to_master(np.asarray(master_img), cand)
    logger.info(
        f"Fitted {len(fitted)} bands to master (source: {source}, "
        f"NCC {ncc:.3f}) — refinement provenance persisted"
    )
    return fitted, ncc, source


def cmd_simulate(args) -> None:
    """Render a kinematical dictionary pattern stack from an anglefile.

    With `sample` and `build`, closes the dictionary loop natively:
    sample orientations -> simulate patterns -> build -> query. The
    reference assumed externally-simulated stacks (data_module.py:70-78).
    """
    from latice_tpu.data import parse_angle_file
    from latice_tpu.sim import (
        DetectorGeometry,
        cubic_reflectors,
        hexagonal_reflectors,
        simulate_patterns,
    )

    eulers = parse_angle_file(args.angles)
    geometry = DetectorGeometry(
        shape=(args.size, args.size), pcx=args.pc[0], pcy=args.pc[1],
        dd=args.pc[2], tilt=args.tilt,
    )
    if args.master:
        # Lookup rendering from an external (e.g. dynamical) master image in
        # sim.master's documented equal-area convention. Refinement
        # provenance comes from fitting the differentiable band model to
        # the master (sim.master_fit) — automatically when the master's
        # own `.mastermeta.json` names the phase, or from the CLI
        # structure/lattice flags under --fit-bands.
        from latice_tpu.sim import render_from_master

        t0 = time.time()
        master_img = np.load(args.master)
        if args.master_layout == "square":
            # One-time import of square-Lambert (EMsoft-style) masters.
            from latice_tpu.sim import resample_square_lambert

            master_img = resample_square_lambert(master_img)
        patterns = render_from_master(master_img, eulers, geometry)
        if args.uint8:
            patterns = np.round(patterns * 255.0).astype(np.uint8)
        dt = time.time() - t0
        out_path = args.out if args.out.endswith(".npy") else args.out + ".npy"
        np.save(out_path, patterns)
        summary = {
            "n_patterns": len(patterns),
            "shape": list(patterns.shape[1:]),
            "master": args.master,
            "seconds": round(dt, 2),
            "out": args.out,
        }
        fit = _fit_master_bands(args, master_img)
        if fit is not None:
            fitted, fit_ncc, source = fit
            meta = {
                "kind": "master_fit",
                "master": args.master,
                "fit_source": source,
                "fit_ncc": round(fit_ncc, 4),
                "size": args.size,
                "pc": list(args.pc),
                "tilt": args.tilt,
                "fitted_bands": {
                    "normals": fitted.normals.tolist(),
                    "sin_theta": fitted.sin_theta.tolist(),
                    "intensity": fitted.intensity.tolist(),
                },
            }
            with open(out_path + ".simmeta.json", "w") as f:
                json.dump(meta, f)
            summary["fit_ncc"] = round(fit_ncc, 4)
            summary["n_fitted_bands"] = len(fitted)
            summary["refine_provenance"] = True
        print(json.dumps(summary))
        return
    if args.structure == "hcp":
        # Ideal-ish c/a when not given; pairs with point group "622".
        c = args.lattice_c if args.lattice_c else 1.587 * args.lattice
        reflectors = hexagonal_reflectors(
            a=args.lattice, c=c, kv=args.kv, max_hkl=args.max_hkl,
            min_d=args.min_d,
        )
    else:
        reflectors = cubic_reflectors(
            args.structure, a=args.lattice, kv=args.kv, max_hkl=args.max_hkl,
            min_d=args.min_d,
        )
    t0 = time.time()
    patterns = simulate_patterns(
        eulers, geometry, reflectors,
        dtype=np.uint8 if args.uint8 else np.float32,
    )
    dt = time.time() - t0
    # np.save appends .npy when missing; mirror that so the sidecar always
    # sits next to the actual pattern file.
    out_path = args.out if args.out.endswith(".npy") else args.out + ".npy"
    np.save(out_path, patterns)
    # Simulation provenance sidecar: `build` copies it into the npz so
    # `query --refine` can rebuild the exact forward model.
    meta = {
        "structure": args.structure,
        "lattice": args.lattice,
        "lattice_c": args.lattice_c,
        "kv": args.kv,
        "size": args.size,
        "pc": list(args.pc),
        "tilt": args.tilt,
        "max_hkl": args.max_hkl,
        "min_d": args.min_d,
    }
    with open(out_path + ".simmeta.json", "w") as f:
        json.dump(meta, f)
    print(
        json.dumps(
            {
                "n_patterns": len(patterns),
                "shape": list(patterns.shape[1:]),
                "n_reflectors": len(reflectors),
                "structure": args.structure,
                "seconds": round(dt, 2),
                "out": args.out,
            }
        )
    )


def cmd_master(args) -> None:
    """Compute a dynamical (Bloch-wave) master pattern natively.

    Output feeds `simulate --master` (sim.master's equal-area convention),
    so `sample` -> `master` -> `simulate --master` -> `build` -> `query`
    produces dynamical-profile dictionaries with no external simulation
    package (the role of EMsoft's EMEBSDmaster; see sim/dynamical.py for
    the model and its named approximations).
    """
    from latice_tpu.sim import (
        cubic_structure,
        dynamical_beams,
        dynamical_master_pattern,
        hexagonal_structure,
        wurtzite_structure,
        zincblende_structure,
    )

    def species(tok):
        tok = tok.strip()
        return int(tok) if tok.isdigit() else tok

    parts = [species(t) for t in args.element.split(",")]
    two_species = args.structure in ("zincblende", "wurtzite")
    if two_species and len(parts) != 2:
        raise SystemExit(
            f"--structure {args.structure} needs --element CATION,ANION "
            f"(e.g. 'ga,as'); got {args.element!r}"
        )
    if not two_species and len(parts) != 1:
        raise SystemExit(
            f"--structure {args.structure} takes a single --element; "
            f"got {args.element!r}"
        )
    if args.structure == "hcp":
        c = args.lattice_c if args.lattice_c else 1.587 * args.lattice
        structure = hexagonal_structure(
            parts[0], a=args.lattice, c=c, debye_waller=args.debye_waller
        )
    elif args.structure == "zincblende":
        structure = zincblende_structure(
            parts[0], parts[1], a=args.lattice,
            debye_waller=args.debye_waller,
        )
    elif args.structure == "wurtzite":
        c = args.lattice_c if args.lattice_c else 1.626 * args.lattice
        structure = wurtzite_structure(
            parts[0], parts[1], a=args.lattice, c=c, u=args.wurtzite_u,
            debye_waller=args.debye_waller,
        )
    else:
        structure = cubic_structure(
            args.structure, parts[0], a=args.lattice,
            debye_waller=args.debye_waller,
        )
    beams = dynamical_beams(
        structure, kv=args.kv, n_beams=args.beams, max_hkl=args.max_hkl,
        min_d=args.min_d,
    )
    mesh = None
    if getattr(args, "devices", None) and args.devices > 1:
        import jax

        from latice_tpu.parallel import make_mesh

        if jax.local_device_count() >= args.devices:
            mesh = make_mesh(args.devices)
            logger.info(
                f"sharding master generation over {mesh.size} devices"
            )
        else:
            logger.warning(
                f"--devices {args.devices} ignored: only "
                f"{jax.local_device_count()} attached"
            )
    mc_meta = {}
    t0 = time.time()
    if args.mc:
        from latice_tpu.sim import (
            mc_weighted_master_pattern,
            simulate_bse_monte_carlo,
        )

        mc = simulate_bse_monte_carlo(
            structure, kv=args.kv, tilt_deg=args.tilt,
            n_electrons=args.mc_electrons,
            energy_bins=args.mc_energy_bins,
            depth_bins=args.mc_depth_bins,
            mesh=mesh,
        )
        logger.info(
            f"MC: eta={mc.bse_yield:.3f}, depth p90 "
            f"{float(np.percentile(mc.max_depth_nm, 90)):.0f} nm"
        )
        img = mc_weighted_master_pattern(
            structure, mc, size=args.size, n_beams=args.beams,
            absorption_ratio=args.absorption, max_hkl=args.max_hkl,
            min_d=args.min_d, mesh=mesh,
        )
        mc_meta = {
            "mc": True,
            "mc_electrons": args.mc_electrons,
            "mc_tilt_deg": args.tilt,
            "mc_bse_yield": round(mc.bse_yield, 4),
            "mc_energy_weights": [
                round(float(w), 4) for w in mc.energy_weights
            ],
            "mc_energy_edges_kev": [
                round(float(e), 3) for e in mc.energy_edges_kev
            ],
        }
    else:
        img = dynamical_master_pattern(
            structure, kv=args.kv, size=args.size,
            depth_nm=args.depth_nm, absorption_ratio=args.absorption,
            beams=beams, mesh=mesh,
        )
    dt = time.time() - t0
    out_path = args.out if args.out.endswith(".npy") else args.out + ".npy"
    np.save(out_path, img)
    meta = {
        "kind": "dynamical_master",
        "structure": args.structure,
        "centrosymmetric": bool(beams.is_centrosymmetric),
        "element": args.element,
        "lattice": args.lattice,
        "lattice_c": args.lattice_c,
        "kv": args.kv,
        "size": args.size,
        "n_beams": len(beams),
        "depth_nm": args.depth_nm,
        "absorption_ratio": args.absorption,
        "max_hkl": args.max_hkl,
        "min_d": args.min_d,
        "convention": "sim.master equal-area north hemisphere",
        **mc_meta,
    }
    with open(out_path + ".mastermeta.json", "w") as f:
        json.dump(meta, f)
    summary = {
        "size": args.size,
        "n_beams": len(beams),
        "mean_inner_potential": round(beams.u0, 6),
        "seconds": round(dt, 2),
        "out": out_path,
    }
    if args.mc:
        summary["mc_bse_yield"] = mc_meta["mc_bse_yield"]
    print(json.dumps(summary))


def cmd_analyze(args) -> None:
    """Grain analysis of an indexed orientation map (crystal.maps)."""
    from latice_tpu.crystal import (
        grain_boundary_mask,
        kernel_average_misorientation,
        label_grains,
        misorientation_maps,
    )

    vendor_phase = None
    vendor_bad = None
    low = args.orientations.lower()
    if low.endswith((".ang", ".ctf")):
        # Vendor result files (TSL/OIM .ang, Channel .ctf) analyze directly
        # — the practitioner's existing maps need no npy conversion. Grid
        # and per-pixel phases come from the file itself.
        from latice_tpu.data import read_ang, read_ctf

        vmap = (read_ang if low.endswith(".ang") else read_ctf)(
            args.orientations
        )
        if args.grid is None:
            if vmap.grid is None:
                raise SystemExit(
                    f"{args.orientations} has no grid header — pass --grid"
                )
            args.grid = list(vmap.grid)
            logger.info(
                f"scan grid {vmap.grid[0]}x{vmap.grid[1]} from the file header"
            )
        orients = vmap.eulers
        vendor_bad = ~vmap.success
        # Unindexed pixels keep their vendor -1 phase id: the multiphase
        # segmentation isolates every edge touching one, so a contiguous
        # unindexed blob (vendor files write constant junk Eulers there)
        # can never fuse into a pseudo-grain.
        if vmap.phase.max() > 0 and args.phases is None:
            vendor_phase = vmap.phase
            # Downstream multi-phase branches key off args.phases; mark it
            # so they engage (the actual ids come from vendor_phase).
            args.phases = f"<phases embedded in {args.orientations}>"
    elif args.grid is None:
        raise SystemExit("--grid ROWS COLS is required for .npy maps")
    else:
        orients = np.load(args.orientations)
    rows, cols = args.grid
    if orients.ndim == 2:
        if rows * cols != len(orients):
            raise SystemExit(
                f"--grid {rows}x{cols} does not hold {len(orients)} points"
            )
        orients = orients.reshape(rows, cols, 3)
    multiphase = bool(args.phases) or vendor_phase is not None
    if multiphase:
        # Multi-phase map (query's <out>_phase.npy): per-phase symmetry,
        # phase boundaries always segment as grain boundaries.
        phases = (
            vendor_phase
            if vendor_phase is not None
            else np.load(args.phases)
        ).reshape(rows, cols)
        groups = (args.phase_groups or args.group).split(",")
        n_phases = int(phases.max()) + 1 if phases.size else 1
        if len(groups) < n_phases:
            raise SystemExit(
                f"{n_phases} phase ids in {args.phases} but only "
                f"{len(groups)} point groups — pass --phase-groups with one "
                "group per phase"
            )
    cleaned_summary = {}
    if args.clean is not None:
        # OIM-style cleanup before any analysis: fill unindexed pixels
        # (vendor success mask) and dissolve grains under --clean pixels.
        from latice_tpu.crystal import clean_orientation_map

        bad0 = (
            vendor_bad.reshape(rows, cols) if vendor_bad is not None else None
        )
        orients, filled, cleaned_ph = clean_orientation_map(
            orients,
            bad=bad0,
            min_grain_px=args.clean,
            group=args.group,
            threshold_deg=args.gb_threshold,
            phases=phases if multiphase else None,
            groups=groups if multiphase else None,
        )
        if multiphase:
            phases = cleaned_ph
        np.save(f"{args.out_prefix}_cleaned.npy", orients.reshape(-1, 3))
        cleaned_summary = {
            "cleaned_px": int(filled.sum()),
            "cleaned_out": f"{args.out_prefix}_cleaned.npy",
        }
        logger.info(f"cleanup replaced {filled.sum()} pixels")
    if multiphase:
        from latice_tpu.crystal import misorientation_maps_multiphase

        maps = misorientation_maps_multiphase(orients, phases, groups)
    elif (
        vendor_bad is not None
        and args.clean is None
        and vendor_bad.any()
    ):
        # Single-phase vendor file with unindexed pixels and no --clean:
        # isolate them through the negative-id convention (their constant
        # junk Eulers would otherwise fuse into pseudo-grains).
        from latice_tpu.crystal import misorientation_maps_multiphase

        ph0 = np.where(vendor_bad.reshape(rows, cols), -1, 0)
        maps = misorientation_maps_multiphase(orients, ph0, [args.group])
    else:
        maps = misorientation_maps(orients, group=args.group)
    labels, n_grains = label_grains(maps, threshold_deg=args.gb_threshold)
    kam = kernel_average_misorientation(maps, threshold_deg=args.gb_threshold)
    boundaries = grain_boundary_mask(maps, threshold_deg=args.gb_threshold)

    prefix = args.out_prefix
    np.save(f"{prefix}_grains.npy", labels)
    np.save(f"{prefix}_kam.npy", kam)
    np.save(f"{prefix}_boundaries.npy", boundaries)
    summary = {
        "n_grains": int(n_grains),
        "mean_grain_px": float(labels.size / max(n_grains, 1)),
        "boundary_fraction": float(boundaries.mean()),
        "mean_kam_deg": float(kam.mean()),
        "outputs": [f"{prefix}_{s}.npy" for s in ("grains", "kam", "boundaries")],
        **cleaned_summary,
    }
    if args.grain_stats:
        # Per-grain summary: sizes, ECD, symmetry-aware mean orientation,
        # GOS. On multi-phase maps each grain lies in one phase (phase
        # boundaries always segment), so stats run once per distinct point
        # group and rows are taken from the grain's own phase.
        from latice_tpu.crystal import grain_statistics

        flat_labels = labels.reshape(-1)
        flat_e = orients.reshape(-1, 3)
        _, seed_idx = np.unique(flat_labels, return_index=True)
        if args.phases:
            grain_phase = phases.reshape(-1)[seed_idx]
            grain_group = np.asarray(groups)[np.maximum(grain_phase, 0)]
        else:
            grain_phase = None
            grain_group = np.full(n_grains, args.group)
        sizes = np.zeros(n_grains, np.int64)
        ecd = np.zeros(n_grains, np.float32)
        mean_ori = np.zeros((n_grains, 3), np.float32)
        gos = np.zeros(n_grains, np.float32)
        # One grain_statistics pass per distinct point group, each over
        # only that group's grains (not the full map per group). Labels
        # compact to 0..k-1 monotonically, and the subset keeps every pixel
        # of a selected grain, so the seed-pixel (global first occurrence)
        # convention survives intact.
        for g in np.unique(grain_group):
            gsel = grain_group == g
            px = gsel[flat_labels]
            remap = np.cumsum(gsel) - 1
            s = grain_statistics(
                flat_e[px], remap[flat_labels[px]], group=str(g)
            )
            sizes[gsel] = s.sizes_px
            ecd[gsel] = s.equivalent_diameter_px
            mean_ori[gsel] = s.mean_orientation
            gos[gsel] = s.gos_deg
        stats_out = f"{prefix}_grain_stats.npz"
        payload = dict(
            sizes_px=sizes,
            equivalent_diameter_px=ecd,
            mean_orientation=mean_ori,
            gos_deg=gos,
        )
        if grain_phase is not None:
            payload["phase"] = grain_phase
        np.savez(stats_out, **payload)
        summary["grain_stats"] = stats_out
        summary["mean_ecd_px"] = float(ecd.mean())
        summary["median_ecd_px"] = float(np.median(ecd))
        summary["mean_gos_deg"] = float(gos.mean())
        summary["outputs"].append(stats_out)
    if args.parent:
        # Parent-phase reconstruction: child grain means -> OR inversion ->
        # agreement components (crystal.reconstruction). The per-pixel
        # parent orientations land as a (rows, cols, 3) Euler map so they
        # can be fed straight back into analyze (IPF map, texture, ...).
        if args.phases:
            raise SystemExit(
                "--parent reconstructs single-phase child maps; extract the "
                "child phase's pixels first"
            )
        from latice_tpu.crystal import (
            grain_adjacency,
            grain_statistics,
            reconstruct_parents,
        )

        gstats = grain_statistics(orients, labels, group=args.group)
        try:
            rec = reconstruct_parents(
                gstats.mean_orientation,
                grain_adjacency(labels),
                relationship=args.parent,
                parent_group=args.parent_group,
                child_group=args.group,
                tolerance_deg=args.parent_tolerance,
            )
        except ValueError as e:
            raise SystemExit(str(e))
        parent_px = rec.parent_labels[labels]
        np.save(f"{prefix}_parent_grains.npy", parent_px)
        np.save(
            f"{prefix}_parent_orientations.npy", rec.parent_orientation[parent_px]
        )
        np.save(f"{prefix}_variants.npy", rec.variant[labels])
        np.savez(
            f"{prefix}_parent_recon.npz",
            parent_labels=rec.parent_labels,
            parent_orientation=rec.parent_orientation,
            variant=rec.variant,
            fit_deg=rec.fit_deg,
        )
        summary["n_parents"] = rec.n_parents
        summary["mean_parent_fit_deg"] = round(float(rec.fit_deg.mean()), 3)
        summary["outputs"] += [
            f"{prefix}_parent_grains.npy",
            f"{prefix}_parent_orientations.npy",
            f"{prefix}_variants.npy",
            f"{prefix}_parent_recon.npz",
        ]
    if args.taylor:
        # Full-constraints Taylor factor map (Bishop-Hill maximum work).
        if args.phases:
            raise SystemExit(
                "--taylor evaluates one phase's slip systems; run it on "
                "single-phase maps (extract one phase's pixels first)"
            )
        from latice_tpu.crystal import taylor_factors

        try:
            tr = taylor_factors(
                orients, load_direction=tuple(args.load), family=args.slip_family
            )
        except ValueError as exc:
            raise SystemExit(str(exc))
        np.save(f"{prefix}_taylor.npy", tr.factor)
        summary["mean_taylor"] = round(float(tr.factor.mean()), 4)
        summary["max_taylor"] = round(float(tr.factor.max()), 4)
        summary["outputs"].append(f"{prefix}_taylor.npy")
    if args.youngs:
        # Elastic anisotropy: per-pixel directional Young's modulus under a
        # sample-frame load, plus the texture-free Hill reference.
        if args.phases:
            raise SystemExit(
                "--youngs maps one phase's stiffness; run it on single-phase "
                "maps (per-phase stiffness differs)"
            )
        from latice_tpu.crystal import (
            directional_youngs_modulus,
            polycrystal_moduli,
        )

        stiff = args.youngs
        if "," in stiff:
            try:
                stiff = tuple(float(v) for v in stiff.split(","))
            except ValueError:
                raise SystemExit(
                    f"--youngs: expected C11,C12,C44 in GPa, got {args.youngs!r}"
                )
        try:
            emap = directional_youngs_modulus(
                orients, load_direction=tuple(args.load), stiffness=stiff
            )
            pm = polycrystal_moduli(stiff)
        except ValueError as exc:
            raise SystemExit(str(exc))
        np.save(f"{prefix}_youngs.npy", emap)
        summary["mean_youngs_gpa"] = round(float(emap.mean()), 2)
        summary["min_youngs_gpa"] = round(float(emap.min()), 2)
        summary["max_youngs_gpa"] = round(float(emap.max()), 2)
        summary["youngs_hill_gpa"] = round(pm.youngs_hill, 2)
        summary["outputs"].append(f"{prefix}_youngs.npy")
    if args.gnd is not None:
        # GND density lower bound from the lattice-curvature field
        # (crystal.gnd, Pantleon's five measurable Nye entries).
        if args.phases:
            raise SystemExit(
                "--gnd runs on single-phase maps (curvature across phase "
                "boundaries is undefined); extract one phase first"
            )
        from latice_tpu.crystal import gnd_density

        try:
            gres = gnd_density(
                orients,
                step_um=args.step_um,
                burgers_nm=args.gnd,
                group=args.group,
                threshold_deg=args.gb_threshold,
            )
        except ValueError as e:
            raise SystemExit(str(e))
        np.save(f"{prefix}_gnd.npy", gres.density)
        np.save(f"{prefix}_nye.npy", gres.alpha)
        finite = np.isfinite(gres.density)
        # None (not NaN) when every pixel is masked — the JSON summary must
        # stay RFC-8259 parseable for strict clients.
        summary["mean_gnd_per_m2"] = (
            float(gres.density[finite].mean()) if finite.any() else None
        )
        summary["gnd_valid_fraction"] = round(float(gres.valid.mean()), 4)
        summary["outputs"] += [f"{prefix}_gnd.npy", f"{prefix}_nye.npy"]
    if args.csl:
        # CSL boundary character: Σ labels per edge + number fractions.
        if args.phases:
            raise SystemExit(
                "--csl classifies single-phase cubic maps; multi-phase CSL "
                "character is not defined across phase boundaries"
            )
        from latice_tpu.crystal import classify_csl_boundaries, csl_fractions

        sigmas = args.csl_sigmas.split(",") if args.csl_sigmas else None
        try:
            cmaps = classify_csl_boundaries(
                orients,
                group=args.group,
                sigmas=sigmas,
                boundary_threshold_deg=args.gb_threshold,
                brandon_base_deg=args.brandon,
            )
        except ValueError as e:
            raise SystemExit(str(e))
        np.save(f"{prefix}_csl_east.npy", cmaps.east)
        np.save(f"{prefix}_csl_south.npy", cmaps.south)
        fractions = csl_fractions(cmaps)
        summary["csl_sigmas"] = list(cmaps.sigmas)
        summary["csl_fractions"] = {
            k: round(v, 4) for k, v in fractions.items() if v > 0
        }
        summary["outputs"] += [f"{prefix}_csl_{d}.npy" for d in ("east", "south")]
    if args.mdf:
        # Misorientation-angle distribution: measured boundary edges vs the
        # Mackenzie baseline for random texture (baseline uses --group; on
        # multi-phase maps the measured angles are same-phase edges only).
        from latice_tpu.crystal import (
            boundary_disorientation_angles,
            random_disorientation_angles,
        )
        from latice_tpu.utils._mpl import ensure_headless_backend

        angles = boundary_disorientation_angles(
            maps, threshold_deg=args.gb_threshold
        )
        if len(angles) == 0:
            raise SystemExit(
                "--mdf: no grain-boundary edges above the threshold"
            )
        ensure_headless_backend()
        import matplotlib.pyplot as plt

        base = random_disorientation_angles(args.group, n=100_000)
        fig, ax = plt.subplots(figsize=(6, 4), dpi=120)
        bins = np.linspace(0.0, float(np.ceil(max(base.max(), angles.max()))), 41)
        ax.hist(
            angles, bins=bins, density=True, alpha=0.65,
            label=f"boundaries (n={len(angles)})",
        )
        ax.hist(
            base, bins=bins, density=True, histtype="step", lw=1.5,
            label="random (Mackenzie)",
        )
        ax.set_xlabel("disorientation (°)")
        ax.set_ylabel("density")
        ax.legend(frameon=False)
        fig.savefig(args.mdf, bbox_inches="tight")
        summary["mdf"] = args.mdf
        summary["mean_boundary_disorientation_deg"] = round(float(angles.mean()), 3)
    if args.schmid:
        # Micromechanics overlay: max Schmid factor + active system index.
        if args.phases:
            raise SystemExit(
                "--schmid evaluates one phase's slip systems; run it on "
                "single-phase maps (extract one phase's pixels first)"
            )
        from latice_tpu.crystal import schmid_factors

        try:
            sr = schmid_factors(
                orients, load_direction=tuple(args.schmid), family=args.slip_family
            )
        except ValueError as e:
            raise SystemExit(str(e))
        np.save(f"{prefix}_schmid.npy", sr.max_factor)
        np.save(f"{prefix}_schmid_system.npy", sr.system)
        summary["mean_schmid"] = round(float(sr.max_factor.mean()), 4)
        summary["max_schmid"] = round(float(sr.max_factor.max()), 4)
        summary["outputs"] += [
            f"{prefix}_schmid.npy", f"{prefix}_schmid_system.npy"
        ]
    if args.components:
        # Named-texture-component volume fractions (Cube/Goss/Brass/...).
        if args.phases:
            raise SystemExit(
                "--components matches one point group's named components; "
                "run it on single-phase maps (extract one phase's pixels "
                "first, or use --odf-sections with --odf-phase)"
            )
        from latice_tpu.crystal import texture_component_fractions

        comps = (
            None if args.components == "all" else args.components.split(",")
        )
        try:
            cr = texture_component_fractions(
                orients,
                components=comps,
                group=args.group,
                sample_symmetry=args.sample_symmetry,
                tolerance_deg=args.component_tolerance,
            )
        except ValueError as e:
            raise SystemExit(str(e))
        np.save(f"{prefix}_components.npy", cr.labels)
        summary["component_names"] = list(cr.names)
        summary["component_fractions"] = {
            k: round(v, 4) for k, v in cr.fractions.items()
        }
        summary["outputs"].append(f"{prefix}_components.npy")
    if args.odf_sections or args.texture_index:
        # Quantitative texture: kernel-density ODF over the map's pixels
        # (per-phase on multi-phase maps via --odf-phase).
        from latice_tpu.crystal import make_odf, odf_sections, texture_index

        flat = orients.reshape(-1, 3)
        odf_group = args.group
        if args.phases:
            sel = phases.reshape(-1) == args.odf_phase
            if not sel.any():
                raise SystemExit(
                    f"--odf-phase {args.odf_phase}: no pixels with that id"
                )
            flat = flat[sel]
            odf_group = groups[args.odf_phase]
        odf = make_odf(flat, group=odf_group, halfwidth_deg=args.odf_halfwidth)
        summary["texture_index"] = round(texture_index(odf), 4)
        if args.odf_sections:
            from latice_tpu.utils import plot_odf_sections

            phi2 = [float(v) for v in args.odf_phi2.split(",")]
            secs, p1_ax, p_ax = odf_sections(odf, phi2_deg=phi2)
            fig = plot_odf_sections(secs, p1_ax, p_ax, phi2)
            fig.savefig(args.odf_sections)
            summary["odf_sections"] = args.odf_sections
            summary["odf_max"] = round(float(secs.max()), 3)
    if args.pole_figure:
        from latice_tpu.utils import plot_pole_figure

        fig = plot_pole_figure(
            orients.reshape(-1, 3), pole=tuple(args.pole), group=args.group
        )
        fig.savefig(args.pole_figure)
        summary["pole_figure"] = args.pole_figure
    if args.ipf_map:
        # The standard EBSD figure: per-pixel IPF color with grain
        # boundaries overlaid in black. Colors honor each pixel's point
        # group (per-phase groups on multi-phase maps).
        import matplotlib.image as mpimg

        from latice_tpu.utils import get_color_key
        from latice_tpu.utils._mpl import ensure_headless_backend

        ensure_headless_backend()
        flat = orients.reshape(-1, 3)
        if args.phases:
            rgb = np.empty((len(flat), 3), np.float32)
            flat_phase = phases.reshape(-1)
            for pid, grp in enumerate(groups):
                sel = flat_phase == pid
                if sel.any():
                    rgb[sel] = get_color_key(flat[sel], args.ipf_mode, group=grp)
        else:
            rgb = get_color_key(flat, args.ipf_mode, group=args.group)
        rgb = rgb.reshape(rows, cols, 3).astype(np.float32) / 255.0
        rgb[np.asarray(boundaries, bool)] = 0.0
        mpimg.imsave(args.ipf_map, np.clip(rgb, 0, 1))
        summary["ipf_map"] = args.ipf_map
    print(json.dumps(summary))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--checkpoint", default=None, help="orbax params dir")
    common.add_argument("--db", default="latent_index.npz")
    common.add_argument("--inplanes", type=int, default=32)
    common.add_argument("--latent-dim", type=int, default=16)
    common.add_argument("--batch-size", type=int, default=256)

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

    d = sub.add_parser(
        "di",
        help="pattern-space dictionary indexing (NCC, no trained encoder)",
    )
    d.add_argument(
        "--dict-patterns", required=True, action="append",
        help="simulated dictionary .npy stack ('simulate' output; repeat "
        "once per phase for multi-phase)",
    )
    d.add_argument(
        "--dict-angles", required=True, action="append",
        help="angle file paired with --dict-patterns (repeat per phase)",
    )
    d.add_argument(
        "--phase-groups", default=None,
        help="comma-separated point groups, one per phase (e.g. 432,622)",
    )
    d.add_argument(
        "--patterns", required=True,
        help=".npy stack, HDF5 scan, or EDAX .up1/.up2 to index "
        "(materialized on host — DI is dictionary-bound)",
    )
    d.add_argument("--h5-dataset", default=None)
    d.add_argument("--out", default="orientations.npy")
    d.add_argument(
        "--bin", type=int, default=1,
        help="mean-pool factor applied to dictionary AND queries before "
        "correlating (the DI speed knob: compute and residency drop by "
        "bin^2; try 2 for 128px detectors)",
    )
    d.add_argument(
        "--engine", default="exact", choices=("exact", "approx", "int8"),
        help="per-batch NCC search engine (the fused kernel's VMEM tiles "
        "assume narrow features, so it is not offered here)",
    )
    d.add_argument(
        "--search-dtype", default="bfloat16",
        choices=("bfloat16", "float32"),
        help="dictionary storage/matmul dtype (bf16 halves residency and "
        "doubles MXU rate; NCC ranking tolerates the input rounding)",
    )
    d.add_argument("--batch-size", type=int, default=256)
    d.add_argument("--top-n", type=int, default=20)
    d.add_argument("--threshold", type=float, default=3.0)
    d.add_argument("--min-matches", type=int, default=18)
    d.add_argument(
        "--weight-power", type=float, default=None, metavar="P",
        help="NCC^P-weighted consensus mean — measured 0.335 -> 0.237 deg "
        "median off-grid at P=4 on the kinematical benchmark (large P "
        "over-concentrates on the top candidate and loses the "
        "interpolation; default: uniform mean)",
    )
    d.add_argument(
        "--devices", type=int, default=None,
        help="data-parallel mesh: batch-sharded features + row-sharded "
        "dictionary NCC (default: single device)",
    )
    d.add_argument(
        "--preprocess", default=None, metavar="SPEC",
        help="on-device correction for the QUERIES only (simulated "
        "dictionaries are already ideal), e.g. 'hotpixels=5,static=auto'; "
        "must preserve the frame shape — bin via --bin, not the recipe",
    )
    d.add_argument(
        "--ang", default=None, help="also write a TSL/OIM .ang result file"
    )
    d.add_argument(
        "--ctf", default=None, help="also write a Channel Text File (.ctf)"
    )
    d.add_argument(
        "--scan-grid", type=int, nargs=2, metavar=("ROWS", "COLS"),
        default=None,
    )
    d.add_argument("--step", type=float, default=1.0, help="scan step (um)")
    d.add_argument(
        "--streamed", action="store_true",
        help="stream the dictionary rows from host RAM through the chip "
        "in fixed chunks (beyond-HBM dictionaries; index.pattern_di."
        "StreamedPatternDI) — multi-phase and --ambiguity compose like "
        "the resident engine; --engine/--devices do not apply",
    )
    d.add_argument(
        "--ambiguity", default=None, metavar="OUT.npz",
        help="also write the pseudo-symmetry diagnostic (score margin to "
        "the best genuinely different candidate, index.diagnostics)",
    )
    d.add_argument(
        "--ambiguity-gap", type=float, default=0.02,
        help="NCC margin below which a pixel is counted ambiguous",
    )
    d.set_defaults(fn=cmd_di)

    qu = sub.add_parser(
        "quality",
        help="Hough/Radon band detection + Image Quality maps (no indexing)",
    )
    qu.add_argument(
        "--patterns", required=True,
        help=".npy stack, HDF5 scan, or EDAX .up1/.up2",
    )
    qu.add_argument("--h5-dataset", default=None)
    qu.add_argument("--out-prefix", default="quality")
    qu.add_argument(
        "--scan-grid", type=int, nargs=2, metavar=("ROWS", "COLS"),
        default=None, help="reshape IQ to the scan map (UP headers autofill)",
    )
    qu.add_argument(
        "--bands", type=int, default=10,
        help="bands detected per pattern (strongest first)",
    )
    qu.add_argument(
        "--band-width", type=float, default=8.0,
        help="expected Kikuchi band width in pixels (butterfly plateau)",
    )
    qu.add_argument("--n-theta", type=int, default=90)
    qu.add_argument("--n-rho", type=int, default=96)
    qu.add_argument("--batch-size", type=int, default=256)
    qu.add_argument(
        "--iq-map", default=None, metavar="OUT.png",
        help="also render the IQ map as a grayscale image (needs "
        "--scan-grid)",
    )
    qu.set_defaults(fn=cmd_quality)

    ho = sub.add_parser(
        "hough",
        help="band-based (Hough) orientation indexing — no training, no "
        "dictionary (the vendor OIM/AZtec algorithm)",
    )
    ho.add_argument(
        "--patterns", required=True,
        help=".npy stack, HDF5 scan, or EDAX .up1/.up2",
    )
    ho.add_argument("--h5-dataset", default=None)
    ho.add_argument("--out", default="hough_orientations.npy")
    ho.add_argument(
        "--structure", default="fcc", choices=("fcc", "bcc", "sc", "hcp"),
        help="lattice/structure (hcp votes in point group 622)",
    )
    ho.add_argument(
        "--phase", action="append", default=None, metavar="[NAME=]SPEC",
        help="repeatable phase spec for multi-phase indexing — "
        "'fcc:3.52', 'hcp:2.95:4.68', or a cell .json path "
        "({'group','a',...} via sim.reflectors_from_cell for arbitrary "
        "cells); overrides --structure/--lattice. The Radon scan runs "
        "once, every phase is scored against the same detected bands, "
        "the per-pixel best wins; phase ids (list positions) go to "
        "<out>_phase.npy and the .ang/.ctf phase column",
    )
    ho.add_argument(
        "--lattice", type=float, default=3.52,
        help="lattice parameter a, Angstrom (default: nickel)",
    )
    ho.add_argument(
        "--lattice-c", type=float, default=None,
        help="hcp c parameter, Angstrom (default: 1.587*a)",
    )
    ho.add_argument("--kv", type=float, default=20.0, help="beam kV")
    ho.add_argument(
        "--pc", type=float, nargs=3, default=(0.5, 0.5, 0.7),
        metavar=("PCX", "PCY", "DD"),
        help="pattern center + detector distance, detector-width units",
    )
    ho.add_argument(
        "--tilt", type=float, default=0.0,
        help="detector tilt about the horizontal axis, degrees",
    )
    ho.add_argument("--max-hkl", type=int, default=3)
    ho.add_argument(
        "--min-d", type=float, default=0.8,
        help="drop reflectors with d-spacing below this (Angstrom)",
    )
    ho.add_argument(
        "--grid-resolution", type=float, default=3.0,
        help="voting-grid mean spacing, degrees (refinement solves below it)",
    )
    ho.add_argument(
        "--bands", type=int, default=8,
        help="bands detected and used per pattern",
    )
    ho.add_argument(
        "--tolerance", type=float, default=3.0,
        help="band-to-reflector residual counted as a match, degrees",
    )
    ho.add_argument(
        "--min-bands", type=int, default=4,
        help="matched bands below which a pattern is marked unindexed",
    )
    ho.add_argument(
        "--band-width", type=float, default=8.0,
        help="expected Kikuchi band width in pixels (butterfly plateau)",
    )
    ho.add_argument("--n-theta", type=int, default=90)
    ho.add_argument("--n-rho", type=int, default=96)
    ho.add_argument("--batch-size", type=int, default=256)
    ho.add_argument(
        "--scan-grid", type=int, nargs=2, metavar=("ROWS", "COLS"),
        default=None, help="scan shape for .ang/.ctf x/y (UP autofills)",
    )
    ho.add_argument("--step", type=float, default=1.0, help="scan step, um")
    ho.add_argument("--ang", default=None, help="also write a TSL .ang file")
    ho.add_argument(
        "--ctf", default=None, help="also write a Channel .ctf file"
    )
    ho.set_defaults(fn=cmd_hough)

    sp = sub.add_parser(
        "sphere",
        help="spherical-harmonic indexing against a master pattern — "
        "dictionary-free global SO(3) search (the EMSphInx role)",
    )
    sp.add_argument(
        "--patterns", required=True,
        help=".npy stack, HDF5 scan, or EDAX .up1/.up2",
    )
    sp.add_argument("--h5-dataset", default=None)
    sp.add_argument(
        "--master", required=True, action="append",
        help="master image .npy (index.py master output, or an external "
        "master — see --master-layout); repeat the flag for multi-phase "
        "indexing (per-pattern phase = highest correlation peak)",
    )
    sp.add_argument(
        "--master-layout", choices=("circle", "square"), default="circle",
        help="'square' imports square-Lambert (EMsoft-style) masters "
        "(applies to every --master)",
    )
    sp.add_argument("--out", default="sphere_orientations.npy")
    sp.add_argument(
        "--bandwidth", type=int, default=64,
        help="harmonic band limit L (~180/L deg grid before the "
        "sub-grid peak interpolation; default: %(default)s)",
    )
    sp.add_argument(
        "--beta-count", type=int, default=None,
        help="SO(3) grid points over beta (default 2L)",
    )
    sp.add_argument(
        "--alpha-count", type=int, default=None,
        help="SO(3) grid points over alpha/gamma (default 2L)",
    )
    sp.add_argument(
        "--bin", type=int, default=2,
        help="detector mean-pool factor before projection",
    )
    sp.add_argument(
        "--group", default=None, action="append",
        help="proper point group for the fundamental-zone reduction "
        "(default 432); repeat per --master, or give once to share",
    )
    sp.add_argument(
        "--no-refine", action="store_true",
        help="disable the parabolic sub-grid peak interpolation",
    )
    sp.add_argument(
        "--pc", type=float, nargs=3, default=(0.5, 0.5, 0.7),
        metavar=("PCX", "PCY", "DD"),
        help="pattern center + detector distance, detector-width units",
    )
    sp.add_argument(
        "--tilt", type=float, default=0.0,
        help="detector tilt about the horizontal axis, degrees",
    )
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument(
        "--phase-name", default=None, action="append",
        help="phase name(s) written to .ang/.ctf headers — repeat per "
        "--master (default phase1, phase2, ...)",
    )
    sp.add_argument(
        "--lattice", type=float, default=None, action="append",
        help="lattice parameter a for .ang/.ctf headers, Angstrom — "
        "repeat per --master (default 3.52)",
    )
    sp.add_argument(
        "--lattice-c", type=float, default=None, action="append",
        help="c parameter for .ang/.ctf headers (default: a) — repeat "
        "per --master",
    )
    sp.add_argument(
        "--scan-grid", type=int, nargs=2, metavar=("ROWS", "COLS"),
        default=None, help="scan shape for .ang/.ctf x/y (UP autofills)",
    )
    sp.add_argument("--step", type=float, default=1.0, help="scan step, um")
    sp.add_argument("--ang", default=None, help="also write a TSL .ang file")
    sp.add_argument(
        "--ctf", default=None, help="also write a Channel .ctf file"
    )
    sp.set_defaults(fn=cmd_sphere)

    st = sub.add_parser(
        "strain",
        help="HR-EBSD cross-correlation strain + lattice-rotation mapping "
        "(relative to a reference pattern in the same grain)",
    )
    st.add_argument(
        "--patterns", required=True,
        help=".npy stack, HDF5 scan, or EDAX .up1/.up2",
    )
    st.add_argument("--h5-dataset", default=None)
    st.add_argument(
        "--ref", type=int, default=0,
        help="index of the reference pattern (strain is relative to it; "
        "pick a low-strain point inside the grain)",
    )
    st.add_argument("--out", default="strain.npz")
    st.add_argument(
        "--pc", type=float, nargs=3, default=(0.5, 0.5, 0.7),
        metavar=("PCX", "PCY", "DD"),
        help="pattern center + detector distance, detector-width units — "
        "PC errors alias into phantom strain; calibrate first",
    )
    st.add_argument(
        "--tilt", type=float, default=0.0,
        help="detector tilt, degrees (sets the traction-free surface "
        "normal)",
    )
    st.add_argument(
        "--roi-size", type=int, default=64,
        help="ROI window edge, px (21 ROIs: center + two rings)",
    )
    st.add_argument(
        "--upsample", type=int, default=20,
        help="sub-pixel factor kappa — shifts resolve to ~1/kappa px",
    )
    st.add_argument(
        "--stiffness", default=None, metavar="PHASE|C11,C12,C44",
        help="cubic elastic constants (GPa): a preset name (ni, cu, al, "
        "fe-alpha, fe-gamma, w) or three comma-separated values; enables "
        "the traction-free gauge closure and stress output",
    )
    st.add_argument(
        "--euler", type=float, nargs=3, default=None,
        metavar=("PHI1", "PHI", "PHI2"),
        help="grain orientation (zxz extrinsic, degrees) rotating the "
        "stiffness into the detector frame",
    )
    st.add_argument(
        "--f-min", type=float, default=1.5,
        help="Fourier high-pass, cycles per ROI (kills background)",
    )
    st.add_argument(
        "--f-max", type=float, default=None,
        help="Fourier low-pass, cycles per ROI (None keeps all)",
    )
    st.add_argument(
        "--min-quality", type=float, default=0.1,
        help="drop ROIs whose XCF peak quality falls below this",
    )
    st.add_argument(
        "--calibration", default=None, metavar="CAL.npz",
        help="scan-varying PC model from `index.py calibrate --scan-grid` "
        "(pc0 + gradient): every pattern's design matrix and remap warp "
        "then use its own pattern center, so a PC gradient across the "
        "scan cannot masquerade as a strain gradient; needs --scan-grid "
        "(and --calibration-step if the fit used a scan step)",
    )
    st.add_argument(
        "--calibration-step", type=float, default=1.0,
        help="scan step in the calibration's units (must match the "
        "--step used at `index.py calibrate`; default %(default)s)",
    )
    st.add_argument(
        "--remap", type=int, default=1, metavar="N",
        help="iterative remapping passes (CrossCourt-style): re-project "
        "each pattern through the recovered deformation and re-correlate "
        "— keeps strain accurate under rotations of several degrees; "
        "accepted per pattern only where the fit residual drops; 0 "
        "disables",
    )
    st.add_argument("--batch-size", type=int, default=128)
    st.add_argument(
        "--scan-grid", type=int, nargs=2, metavar=("ROWS", "COLS"),
        default=None, help="scan shape for --map (UP headers autofill)",
    )
    st.add_argument(
        "--map", default=None, metavar="OUT.png",
        help="render the von Mises equivalent-strain map (needs "
        "--scan-grid)",
    )
    st.set_defaults(fn=cmd_strain)

    cal = sub.add_parser(
        "calibrate",
        help="autodiff pattern-center calibration — shared PC, or the "
        "affine scan-varying model PC(xy) = PC0 + G.xy (--scan-grid)",
    )
    cal.add_argument(
        "--patterns", required=True,
        help=".npy stack, HDF5 scan, or EDAX .up1/.up2",
    )
    cal.add_argument("--h5-dataset", default=None)
    cal.add_argument(
        "--orientations", required=True,
        help="initial orientations from any indexing pass: (N, 3) Euler-"
        "degree or (N, 4) quaternion .npy, or a vendor .ang/.ctf result "
        "(its success mask filters unindexed pixels)",
    )
    cal.add_argument(
        "--out", default="calibration.npz",
        help="fitted model output (.npz: pc / pc0+gradient, shape, tilt, "
        "refined quats, pattern indices used)",
    )
    cal.add_argument(
        "--structure", default="fcc", choices=("fcc", "bcc", "sc", "hcp"),
    )
    cal.add_argument("--lattice", type=float, default=3.52)
    cal.add_argument("--lattice-c", type=float, default=None)
    cal.add_argument("--kv", type=float, default=20.0)
    cal.add_argument("--max-hkl", type=int, default=3)
    cal.add_argument("--min-d", type=float, default=0.8)
    cal.add_argument(
        "--pc", type=float, nargs=3, default=(0.5, 0.5, 0.7),
        metavar=("PCX", "PCY", "DD"),
        help="NOMINAL pattern center — the optimization starting point",
    )
    cal.add_argument("--tilt", type=float, default=0.0)
    cal.add_argument(
        "--scan-grid", type=int, nargs=2, metavar=("ROWS", "COLS"),
        default=None,
        help="fit the affine scan-varying PC model over this raster "
        "(positions from row-major order x --step); UP headers autofill",
    )
    cal.add_argument(
        "--step", type=float, default=1.0,
        help="scan step for --scan-grid positions, um (the gradient is "
        "reported per this unit)",
    )
    cal.add_argument(
        "--scan-xy", default=None,
        help="explicit (N, 2) scan-position .npy — affine model with "
        "arbitrary (non-raster) positions; overrides --scan-grid",
    )
    cal.add_argument(
        "--max-patterns", type=int, default=64,
        help="calibration subset size, spread across the scan (a coarse "
        "sub-grid under --scan-grid; an even stride otherwise)",
    )
    cal.add_argument(
        "--pin", action="store_true",
        help="hold the orientations fixed (known single crystal) — the "
        "metrological mode, removes the PC<->rotation degeneracy",
    )
    cal.add_argument(
        "--steps", type=int, default=None,
        help="Adam steps (default 300 shared / 2500 affine)",
    )
    cal.add_argument("--lr-pc", type=float, default=2e-3)
    cal.add_argument("--lr-orientation", type=float, default=2e-3)
    cal.set_defaults(fn=cmd_calibrate)

    a = sub.add_parser(
        "analyze", help="grain analysis of an indexed orientation map"
    )
    a.add_argument(
        "--orientations", required=True,
        help="(N, 3) or (R, C, 3) Euler .npy from 'query'",
    )
    a.add_argument(
        "--grid", type=int, nargs=2, metavar=("ROWS", "COLS"), default=None,
        help="scan shape (required for .npy maps; .ang/.ctf inputs carry "
        "it in their header)",
    )
    a.add_argument("--group", default="432", help="point group")
    a.add_argument(
        "--clean", type=int, nargs="?", const=0, default=None,
        metavar="MIN_GRAIN_PX",
        help="OIM-style cleanup before analysis: fill unindexed pixels "
        "(from the .ang/.ctf success mask) and dissolve grains smaller "
        "than MIN_GRAIN_PX into their largest neighbor (bare --clean "
        "fills unindexed only); writes <out-prefix>_cleaned.npy",
    )
    a.add_argument(
        "--phases", default=None,
        help="per-pixel phase-id .npy (query's <out>_phase.npy) for "
        "multi-phase maps",
    )
    a.add_argument(
        "--phase-groups", default=None,
        help="comma-separated point groups, one per phase id (with --phases)",
    )
    a.add_argument(
        "--gb-threshold", type=float, default=5.0,
        help="grain-boundary misorientation threshold (deg)",
    )
    a.add_argument("--out-prefix", default="analysis")
    a.add_argument(
        "--pole-figure", default=None, help="also render a pole-figure PNG"
    )
    a.add_argument(
        "--ipf-map", default=None,
        help="also render an IPF-colored orientation map PNG with grain "
        "boundaries overlaid",
    )
    a.add_argument(
        "--ipf-mode", default="ipf_z", choices=("ipf_x", "ipf_y", "ipf_z"),
        help="IPF reference direction for --ipf-map",
    )
    a.add_argument(
        "--pole", type=float, nargs=3, default=(1.0, 0.0, 0.0),
        metavar=("H", "K", "L"), help="pole for --pole-figure",
    )
    a.add_argument(
        "--mdf", default=None, metavar="PNG",
        help="render the boundary misorientation-angle distribution against "
        "the random (Mackenzie) baseline",
    )
    a.add_argument(
        "--schmid", type=float, nargs=3, default=None, metavar=("X", "Y", "Z"),
        help="compute per-pixel max Schmid factors for a uniaxial load along "
        "this sample-frame axis (writes <prefix>_schmid.npy + _schmid_system.npy)",
    )
    a.add_argument(
        "--slip-family", default="fcc", choices=("fcc", "bcc", "bcc112"),
        help="slip-system family for --schmid",
    )
    a.add_argument(
        "--components", default=None,
        help="texture-component volume fractions: comma-separated names "
        "(cube,goss,brass,copper,s,...) or 'all'",
    )
    a.add_argument(
        "--component-tolerance", type=float, default=15.0,
        help="assignment radius (deg) for --components",
    )
    a.add_argument(
        "--sample-symmetry", default="orthorhombic",
        choices=("triclinic", "monoclinic", "orthorhombic"),
        help="specimen symmetry for --components (rolled sheet = orthorhombic)",
    )
    a.add_argument(
        "--odf-sections", default=None, metavar="PNG",
        help="render constant-φ2 ODF sections (kernel-density ODF) to PNG "
        "and report the texture index",
    )
    a.add_argument(
        "--odf-phi2", default="0,45,65",
        help="comma-separated φ2 section angles (deg) for --odf-sections",
    )
    a.add_argument(
        "--odf-halfwidth", type=float, default=10.0,
        help="ODF kernel half-width (deg, de la Vallée Poussin)",
    )
    a.add_argument(
        "--odf-phase", type=int, default=0,
        help="phase id whose texture to analyze on multi-phase maps",
    )
    a.add_argument(
        "--texture-index", action="store_true",
        help="report the texture index J = ∫f² (1 = random) without "
        "rendering sections",
    )
    a.add_argument(
        "--grain-stats", action="store_true",
        help="also compute per-grain statistics (size, ECD, mean "
        "orientation, GOS) into <prefix>_grain_stats.npz",
    )
    a.add_argument(
        "--csl", action="store_true",
        help="classify grain-boundary edges by CSL type (Σ3 twins etc., "
        "Brandon criterion; cubic maps)",
    )
    a.add_argument(
        "--csl-sigmas", default=None,
        help="comma-separated Σ values to test (e.g. 3,9,27a); "
        "default: the full Σ3-Σ29 table",
    )
    a.add_argument(
        "--brandon", type=float, default=15.0,
        help="Brandon-criterion base angle (deg); tolerance per Σ is base/√Σ",
    )
    a.add_argument(
        "--taylor", action="store_true",
        help="full-constraints Taylor factor map (Bishop-Hill) under "
        "uniaxial tension along --load, slip systems from --slip-family",
    )
    a.add_argument(
        "--youngs", default=None, metavar="STIFFNESS",
        help="directional Young's modulus map (GPa): a material name "
        "(al, cu, ni, fe-alpha, fe-gamma, w) or C11,C12,C44 in GPa",
    )
    a.add_argument(
        "--load", type=float, nargs=3, default=(0.0, 0.0, 1.0),
        metavar=("X", "Y", "Z"),
        help="sample-frame load direction for --youngs (default: 0 0 1)",
    )
    a.add_argument(
        "--gnd", type=float, default=None, metavar="BURGERS_NM",
        help="compute the GND density lower bound (1/m²) with this Burgers "
        "vector length in nm (e.g. 0.248 for α-Fe, 0.286 for Al)",
    )
    a.add_argument(
        "--step-um", type=float, default=1.0,
        help="scan step in micrometres for curvature units "
        "(default: %(default)s)",
    )
    a.add_argument(
        "--parent", default=None, metavar="OR",
        help="reconstruct prior-phase parent grains through this orientation "
        "relationship (ks | nw | bain | pitsch); child phase is --group",
    )
    a.add_argument(
        "--parent-group", default="432",
        help="point group of the parent phase (default: %(default)s)",
    )
    a.add_argument(
        "--parent-tolerance", type=float, default=2.5,
        help="max disorientation (deg) for two child grains to agree on a "
        "parent candidate (default: %(default)s)",
    )
    a.set_defaults(fn=cmd_analyze)

    s = sub.add_parser(
        "sample", help="generate a dictionary orientation grid (anglefile)"
    )
    s.add_argument(
        "--group", default="432",
        help="proper point group of the phase (crystal.ROTATION_GROUPS key)",
    )
    s.add_argument(
        "--resolution", type=float, default=2.0,
        help="target mean nearest-neighbour misorientation between grid "
        "points, degrees (default: %(default)s)",
    )
    s.add_argument("--out", default="anglefile.txt")
    s.set_defaults(fn=cmd_sample)

    m = sub.add_parser(
        "simulate",
        help="render a kinematical dictionary stack from an anglefile",
    )
    m.add_argument("--angles", required=True, help="anglefile (see 'sample')")
    m.add_argument("--out", default="dict_patterns.npy")
    m.add_argument(
        "--structure", default="fcc", choices=("fcc", "bcc", "sc", "hcp"),
        help="lattice/structure (hcp uses point group 622 at query time)",
    )
    m.add_argument(
        "--lattice", type=float, default=3.52,
        help="lattice parameter a, Angstrom (default: nickel)",
    )
    m.add_argument(
        "--lattice-c", type=float, default=None,
        help="hcp c parameter, Angstrom (default: 1.587*a)",
    )
    m.add_argument("--kv", type=float, default=20.0, help="beam kV")
    m.add_argument("--size", type=int, default=128, help="detector px")
    m.add_argument(
        "--pc", type=float, nargs=3, default=(0.5, 0.5, 0.7),
        metavar=("PCX", "PCY", "DD"),
        help="pattern center + detector distance, detector-width units",
    )
    m.add_argument(
        "--tilt", type=float, default=0.0,
        help="detector tilt about the horizontal axis, degrees",
    )
    m.add_argument("--max-hkl", type=int, default=3)
    m.add_argument(
        "--min-d", type=float, default=0.8,
        help="drop reflectors with d-spacing below this (Angstrom)",
    )
    m.add_argument(
        "--uint8", action="store_true",
        help="write detector-native 8-bit patterns (4x smaller, and the "
        "index planes' uint8 fast-path format)",
    )
    m.add_argument(
        "--master", default=None, metavar="MASTER.npy",
        help="render by lookup into a hemisphere master image (e.g. a "
        "dynamical simulation resampled to sim.master's equal-area "
        "convention) instead of the kinematical band model; refinement "
        "provenance is band-fitted from <master>.mastermeta.json when "
        "present, or from the structure/lattice args under --fit-bands",
    )
    m.add_argument(
        "--master-layout", default="circle", choices=("circle", "square"),
        help="--master image layout: 'circle' (sim.master's native "
        "convention) or 'square' (square-Lambert, EMsoft-style — "
        "resampled on load)",
    )
    m.add_argument(
        "--fit-bands", action="store_true",
        help="with --master: fit the differentiable band model to the "
        "master using the structure/lattice flags and persist it as "
        "refinement provenance, so `query --refine` works on this "
        "dictionary (automatic when <master>.mastermeta.json exists)",
    )
    m.set_defaults(fn=cmd_simulate)

    dm = sub.add_parser(
        "master",
        help="compute a dynamical (Bloch-wave) master pattern natively",
    )
    dm.add_argument("--out", default="master.npy")
    dm.add_argument(
        "--structure", default="fcc",
        choices=("fcc", "bcc", "sc", "hcp", "zincblende", "wurtzite"),
        help="zincblende/wurtzite are non-centrosymmetric (complex-"
        "Hermitian Bloch path) and take --element CATION,ANION",
    )
    dm.add_argument(
        "--element", default="ni",
        help="element symbol or atomic number; for zincblende/wurtzite a "
        "'cation,anion' pair, e.g. 'ga,as' (default: %(default)s)",
    )
    dm.add_argument(
        "--lattice", type=float, default=3.52,
        help="lattice parameter a, Angstrom (default: nickel)",
    )
    dm.add_argument(
        "--lattice-c", type=float, default=None,
        help="hcp/wurtzite c parameter, Angstrom (default: 1.587*a hcp, "
        "1.626*a wurtzite)",
    )
    dm.add_argument(
        "--wurtzite-u", type=float, default=0.377,
        help="wurtzite internal anion parameter u (ideal 3/8)",
    )
    dm.add_argument("--kv", type=float, default=20.0, help="beam kV")
    dm.add_argument(
        "--size", type=int, default=201,
        help="master image edge, pixels (default: %(default)s)",
    )
    dm.add_argument(
        "--beams", type=int, default=64,
        help="Bloch beam budget (whole reflection families only; the "
        "realized count is reported)",
    )
    dm.add_argument(
        "--depth-nm", type=float, default=50.0,
        help="backscatter generation depth scale z0, nm",
    )
    dm.add_argument(
        "--absorption", type=float, default=0.1,
        help="imaginary/real potential ratio kappa (0.05-0.15 typical)",
    )
    dm.add_argument(
        "--debye-waller", type=float, default=0.35,
        help="isotropic Debye-Waller B, Angstrom^2",
    )
    dm.add_argument("--max-hkl", type=int, default=5)
    dm.add_argument(
        "--min-d", type=float, default=0.4,
        help="reflection sweep d-spacing floor, Angstrom",
    )
    dm.add_argument(
        "--mc", action="store_true",
        help="replace the exponential depth profile with a first-party "
        "Monte-Carlo backscatter simulation (sim.montecarlo, the "
        "EMMCOpenCL role): one Bloch master per exit-energy bin with the "
        "bin's measured generation-depth distribution, summed by "
        "electron weight. --depth-nm is then ignored.",
    )
    dm.add_argument(
        "--mc-electrons", type=int, default=200_000,
        help="with --mc: incident electrons traced (default: %(default)s)",
    )
    dm.add_argument(
        "--mc-energy-bins", type=int, default=8,
        help="with --mc: exit-energy bins (each kept bin costs one Bloch "
        "master solve; bins under 2%% weight fold into neighbors)",
    )
    dm.add_argument(
        "--mc-depth-bins", type=int, default=40,
        help="with --mc: generation-depth histogram bins",
    )
    dm.add_argument(
        "--tilt", type=float, default=70.0,
        help="with --mc: sample tilt from the beam, degrees (EBSD: 70)",
    )
    dm.add_argument(
        "--devices", type=int, default=0,
        help="shard master generation over this many devices (Bloch eigh "
        "direction chunks + MC walker chunks are embarrassingly "
        "parallel; results match single-device)",
    )
    dm.set_defaults(fn=cmd_master)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
