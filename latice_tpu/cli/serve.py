"""Serve the indexing plane over HTTP — the production deployment entry point.

Loads a checkpoint + dictionary once, compiles the fused pipeline at startup,
then serves scans until stopped. Clients POST raw ``.npy`` bytes:

    python serve.py --db latent_index.npz --checkpoint checkpoints/best &
    curl -s localhost:8800/healthz
    python - <<'PY'
    import io, urllib.request, numpy as np, json
    buf = io.BytesIO(); np.save(buf, np.load("scan.npy"))
    r = urllib.request.urlopen("http://localhost:8800/index", data=buf.getvalue())
    print(json.load(r)["orientations"][:3])
    PY

Multi-phase dictionaries (built with ``index.py build --phase-groups``) serve
per-pixel phase ids automatically. The reference has no serving story
(notebooks only — SURVEY §2 #16); this plane is latice_tpu-native.
"""

from __future__ import annotations

import argparse
import json
import logging

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--db", default=None,
        help="dictionary npz (index.py build); omit when serving "
        "pattern-DI via --di-dict",
    )
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument(
        "--di-dict", action="append", default=None,
        help="serve pattern-DI instead of the latent engine: simulated "
        "dictionary .npy stack, repeated once per phase (zero training — "
        "no --db/--checkpoint needed; /encode and /reload answer 400)",
    )
    p.add_argument(
        "--di-angles", action="append", default=None,
        help="angle file paired with --di-dict (repeat per phase)",
    )
    p.add_argument(
        "--di-bin", type=int, default=1,
        help="DI mean-pool factor (compute and residency drop bin^2-fold)",
    )
    p.add_argument(
        "--phase-groups", default=None,
        help="comma-separated point groups for multi-phase --di-dict",
    )
    p.add_argument(
        "--host", default="127.0.0.1",
        help="bind address. The plane has no authentication: anyone who can "
        "reach it can index patterns and (with --checkpoint-root) hot-swap "
        "checkpoints under that root, so only bind non-loopback interfaces "
        "on trusted networks (default: %(default)s)",
    )
    p.add_argument("--port", type=int, default=8800)
    p.add_argument(
        "--checkpoint-root", default=None,
        help="directory /reload targets must live under (default: the "
        "parent of --checkpoint; reloads of arbitrary paths are refused)",
    )
    p.add_argument(
        "--max-body-mb", type=int, default=1024,
        help="reject request bodies larger than this with 413 "
        "(default: %(default)s MiB)",
    )
    p.add_argument("--inplanes", type=int, default=32)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--top-n", type=int, default=20)
    p.add_argument("--threshold", type=float, default=3.0)
    p.add_argument("--min-matches", type=int, default=18)
    p.add_argument(
        "--engine", default="exact", choices=("exact", "fused", "approx", "int8"),
        help="candidate-search engine; approx/int8 trade ~2-6%% recall@10 "
        "for speed/residency at very large dictionaries, and compose with "
        "--shard-dictionary (per-shard engine + all_gather merge)",
    )
    p.add_argument(
        "--preprocess", default=None, metavar="SPEC",
        help="on-device pattern correction fused into /index and /encode, "
        "e.g. 'hotpixels=5,static=bg.npy,dynamic=auto' (see "
        "data.parse_preprocess_spec for the key grammar)",
    )
    p.add_argument(
        "--nlpar", type=float, default=None, metavar="H",
        help="treat 4-D (R, C, H, W) /index bodies as scans and NLPAR-"
        "denoise them before indexing; H is the smoothing strength in "
        "noise sigmas",
    )
    p.add_argument(
        "--nlpar-radius", type=int, default=1,
        help="NLPAR search-window half-width (default 1 = 3x3)",
    )
    p.add_argument(
        "--shard-dictionary", action="store_true",
        help="shard the dictionary over all attached devices (1-D mesh; "
        "per-shard top-k merged with a k-row all_gather over ICI)",
    )
    # --- zero-training planes (no checkpoint, no dictionary needed) ---
    p.add_argument(
        "--pc", type=float, nargs=3, default=(0.5, 0.5, 0.7),
        metavar=("PCX", "PCY", "DD"),
        help="detector geometry for the /hough, /sphere and /strain "
        "planes (pattern center + distance, width units)",
    )
    p.add_argument(
        "--tilt", type=float, default=0.0,
        help="detector tilt (degrees) for the zero-training planes",
    )
    p.add_argument(
        "--group", default="432",
        help="point group for /hough and /sphere FZ reduction",
    )
    p.add_argument(
        "--hough", action="store_true",
        help="enable POST /hough: band-based orientation indexing with "
        "cubic reflectors at --pc (zero training)",
    )
    p.add_argument(
        "--sphere-master", default=None, metavar="MASTER.npy",
        help="enable POST /sphere: spherical-harmonic indexing against "
        "this master pattern (index.py master output; zero training)",
    )
    p.add_argument(
        "--sphere-bandwidth", type=int, default=64,
        help="spherical-harmonic band limit L (default %(default)s)",
    )
    p.add_argument(
        "--strain-ref", default=None, metavar="REF.npy",
        help="enable POST /strain: HR-EBSD strain/rotation of every "
        "POSTed pattern against this reference pattern",
    )
    p.add_argument(
        "--strain-stiffness", default=None, metavar="PHASE|C11,C12,C44",
        help="cubic stiffness for the traction-free closure + stress "
        "output (preset name or GPa triplet)",
    )
    p.add_argument(
        "--strain-remap", type=int, default=1,
        help="HR-EBSD iterative remapping passes (0 disables)",
    )
    args = p.parse_args()

    from latice_tpu.cli.index import _load_model
    from latice_tpu.index import LatentVectorDatabaseConfig, TpuLatentVectorDatabase
    from latice_tpu.serve import IndexService, make_server

    di_dictionary = None
    if args.di_dict:
        import numpy as np

        from latice_tpu.data import parse_angle_file

        if args.db:
            raise SystemExit("--di-dict and --db are mutually exclusive")
        if not args.di_angles or len(args.di_angles) != len(args.di_dict):
            raise SystemExit(
                "--di-dict and --di-angles must be given the same number "
                "of times"
            )
        groups = args.phase_groups.split(",") if args.phase_groups else None
        multiphase = len(args.di_dict) > 1 or groups is not None
        if multiphase and (not groups or len(groups) < len(args.di_dict)):
            raise SystemExit(
                f"{len(args.di_dict)} DI phases need --phase-groups with "
                "one group per phase"
            )
        stacks, angle_parts, phase_parts = [], [], []
        for pid, (pp, ap) in enumerate(zip(args.di_dict, args.di_angles)):
            s = np.load(pp)
            a = parse_angle_file(str(ap))
            if len(s) != len(a):
                raise SystemExit(
                    f"{pp} holds {len(s)} patterns but {ap} lists "
                    f"{len(a)} angles"
                )
            stacks.append(s)
            angle_parts.append(a)
            phase_parts.append(np.full(len(s), pid, np.int32))
        di_dictionary = (
            np.concatenate(stacks),
            np.concatenate(angle_parts),
            np.concatenate(phase_parts) if multiphase else None,
            groups,
        )
        model = params = db = None
    elif not args.db:
        if not (args.hough or args.sphere_master or args.strain_ref):
            raise SystemExit(
                "pass --db (latent engine), --di-dict (pattern DI), or at "
                "least one zero-training plane (--hough / --sphere-master "
                "/ --strain-ref)"
            )
        model = params = db = None
    else:
        model, params = _load_model(
            args.checkpoint, args.inplanes, args.latent_dim
        )
        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(
                npz_path=args.db, dimension=args.latent_dim
            )
        )
        if db.get_count() == 0:
            raise SystemExit(f"dictionary {args.db} is empty — build it first")

    mesh = None
    if args.shard_dictionary:
        import jax

        from latice_tpu.parallel import make_mesh

        if jax.local_device_count() > 1:
            mesh = make_mesh()
            logger.info(f"sharding dictionary over {mesh.size} devices")
        else:
            logger.warning("--shard-dictionary ignored: one device attached")

    preprocess = None
    if args.preprocess:
        from latice_tpu.data import parse_preprocess_spec

        preprocess = parse_preprocess_spec(args.preprocess)
        if isinstance(preprocess.static_background, str):
            raise SystemExit(
                "--preprocess static=auto needs the full scan upfront; a "
                "server has none. Estimate the frame once (index.py query "
                "computes it, or data.estimate_static_background) and pass "
                "static=<frame.npy>."
            )

    def param_loader(checkpoint: str):
        _, new_params = _load_model(checkpoint, args.inplanes, args.latent_dim)
        return new_params

    # --- zero-training planes ---
    from latice_tpu.sim import DetectorGeometry

    plane_geom = DetectorGeometry(
        pcx=args.pc[0], pcy=args.pc[1], dd=args.pc[2], tilt=args.tilt,
    )
    hough_indexer = None
    if args.hough:
        from latice_tpu.index import HoughIndexer
        from latice_tpu.sim import cubic_reflectors

        hough_indexer = HoughIndexer(
            cubic_reflectors(), plane_geom, group=args.group,
        )
    sphere_indexer = None
    if args.sphere_master:
        import numpy as np

        from latice_tpu.index import SphericalIndexer, SphericalIndexerConfig

        sphere_indexer = SphericalIndexer(
            np.load(args.sphere_master),
            plane_geom,
            SphericalIndexerConfig(
                bandwidth=args.sphere_bandwidth, symmetry=args.group,
            ),
        )
    strain_config = None
    if args.strain_ref:
        import numpy as np

        ref = np.load(args.strain_ref)
        stiffness = None
        if args.strain_stiffness:
            from latice_tpu.crystal.elastic import (
                CUBIC_STIFFNESS,
                cubic_stiffness,
            )

            parts = args.strain_stiffness.split(",")
            if len(parts) == 3:
                stiffness = cubic_stiffness(*(float(v) for v in parts))
            elif args.strain_stiffness in CUBIC_STIFFNESS:
                stiffness = cubic_stiffness(
                    *CUBIC_STIFFNESS[args.strain_stiffness]
                )
            else:
                raise SystemExit(
                    f"--strain-stiffness {args.strain_stiffness!r}: use "
                    f"C11,C12,C44 (GPa) or one of {sorted(CUBIC_STIFFNESS)}"
                )
        import dataclasses

        strain_config = dict(
            reference=ref,
            geometry=dataclasses.replace(plane_geom, shape=ref.shape),
            stiffness=stiffness,
            remap_iterations=args.strain_remap,
        )

    checkpoint_root = args.checkpoint_root
    if checkpoint_root is None and args.checkpoint is not None:
        import os

        checkpoint_root = os.path.dirname(os.path.abspath(args.checkpoint))

    service = IndexService(
        model,
        params,
        db,
        top_n=args.top_n,
        orientation_threshold=args.threshold,
        min_required_matches=args.min_matches,
        batch_size=args.batch_size,
        mesh=mesh,
        param_loader=param_loader if db is not None else None,
        checkpoint_root=checkpoint_root,
        max_body_bytes=args.max_body_mb << 20,
        engine=args.engine,
        preprocess=preprocess,
        nlpar_h=args.nlpar,
        nlpar_radius=args.nlpar_radius,
        di_dictionary=di_dictionary,
        di_bin=args.di_bin,
        hough_indexer=hough_indexer,
        sphere_indexer=sphere_indexer,
        strain_config=strain_config,
    )
    warm_s = service.warmup()
    server = make_server(service, args.host, args.port)
    if di_dictionary is not None:
        mode, count = "pattern-di", len(di_dictionary[1])
    elif db is not None:
        mode, count = "latent", db.get_count()
    else:
        mode, count = "zero-training", 0
    print(
        json.dumps(
            {
                "status": "serving",
                "mode": mode,
                "addr": f"http://{args.host}:{server.server_address[1]}",
                "count": count,
                "planes": service.health()["planes"],
                "warmup_s": round(warm_s, 1),
            }
        ),
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
