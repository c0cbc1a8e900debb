"""Production indexing service: a persistent, warmed-up HTTP plane.

The reference ships indexing only as notebooks and library calls; production
deployments need a long-lived process that pays the XLA compile once and then
serves scans at device speed. This module provides that as a dependency-free
stdlib HTTP server around the fused `IndexPipeline`:

* the pipeline is **warmed at startup** (one padded dummy batch) so the first
  request never eats the multi-second compile;
* requests carry patterns as raw ``.npy`` bytes — uint8 stacks stay uint8 end
  to end (the device does /255), preserving the 4x-smaller host-link transfer
  of the pipeline's native-detector path;
* all requests funnel through one lock: a single accelerator executes one
  program at a time anyway, and the pipeline already batches/pads internally
  to its static compile shape;
* multi-phase dictionaries automatically add per-pixel phase ids to responses.

Endpoints:
  GET  /healthz  -> {"status": "ok", "count": N, "dimension": D, ...}
  POST /index    -> body: .npy of (N, H, W[, 1]) patterns
                    reply: {"orientations": ..., "success": ..., "n": ...}
  POST /encode   -> body: .npy patterns; reply: {"latents": ...}
  POST /reload   -> body: {"checkpoint": path}; hot-swaps the model (new
                    pipeline compiles outside the lock, then pointer-swap)
  POST /quality  -> body: .npy patterns; reply: Hough band counts + IQ
  POST /hough    -> body: .npy patterns; reply: band-based orientations
                    (zero training — needs only reflectors + geometry)
  POST /sphere   -> body: .npy patterns; reply: spherical-harmonic SO(3)
                    orientations (zero training — needs only a master)
  POST /strain   -> body: .npy patterns; reply: HR-EBSD strain/rotation
                    tensors vs the held reference pattern

The three zero-training planes are opt-in at construction
(``hough_indexer=`` / ``sphere_indexer=`` / ``strain_config=``); a server
may run them WITHOUT any checkpoint or dictionary at all (``/index`` then
answers 400) — the cheapest possible deployment, since nothing has to be
trained or built first.

Responses are strict RFC-8259 JSON: consensus failures surface as ``null``
rows in ``mean_orientations`` (never bare ``NaN`` tokens), and the encoder
replies are always finite. Requests larger than ``max_body_bytes`` are
rejected with 413 before the body is read.

See ``serve.py`` at the repo root for the CLI entry point.
"""

from __future__ import annotations

import io
import json
import logging
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["IndexService", "make_server"]


class IndexService:
    """Thread-safe indexing facade over a fused pipeline + encoder.

    Args:
        model / params: the Flax VAE and trained parameters.
        db: a loaded ``TpuLatentVectorDatabase`` (vectors + orientations +
            optional phases).
        top_n / orientation_threshold / min_required_matches: consensus knobs
            (reference defaults dp_indexer.py:47-48, faiss_db.py:262-264).
        batch_size: static compile batch; requests of any size are chunked
            and padded by the pipeline.
        image_size: expected pattern height/width after the default transform.
        mesh: optional `jax.sharding.Mesh` — the dictionary shards over its
            first axis (per-shard top-k + k-row all_gather merge over ICI),
            serving dictionaries larger than one chip's HBM.
        param_loader: optional ``checkpoint_path -> params`` callable enabling
            the ``POST /reload`` endpoint (checkpoint hot-swap: the new
            pipeline compiles *outside* the request lock, then swaps in
            atomically — in-flight requests finish on the old model and no
            request ever sees a cold compile).
        checkpoint_root: optional directory that ``/reload`` targets must
            resolve under. ``None`` (library default) means unrestricted —
            appropriate only when the server binds a trusted interface.
        max_body_bytes: request bodies above this are refused with 413
            before being read (default 1 GiB — a full 65k-pixel uint8 scan
            with 15x headroom).
        engine: candidate-search engine ("exact" | "fused" | "approx" | "int8");
            composes with ``mesh`` — see `IndexPipeline`.
        preprocess: optional on-device pattern correction (a jittable
            callable or a `data.PreprocessConfig`) fused into both the
            ``/index`` pipeline and the ``/encode`` program, so raw detector
            stacks can be POSTed directly — see `IndexPipeline`.
        nlpar_h: optional NLPAR smoothing strength — a 4-D ``(R, C, H, W)``
            body POSTed to ``/index`` is then treated as a scan and denoised
            by neighborhood pattern averaging (`data.nlpar`) before
            indexing (3-D bodies index unchanged). The first scan request
            of a given shape pays the slab-kernel compile.
        nlpar_radius: NLPAR search-window half-width (default 1 = 3x3).
        di_dictionary: optional ``(patterns, angles)`` or ``(patterns,
            angles, phases, groups)`` tuple switching the service to
            pattern-DI mode (`index.pattern_di`): ``/index`` correlates
            bodies directly against the raw dictionary stack — zero
            training, no checkpoint. Pass ``model=None, params=None,
            db=None``; ``/encode`` and ``/reload`` then answer 400 (there
            is no encoder to run or swap).
        di_bin: DI mean-pool factor (both sides; the DI speed knob).
        hough_indexer: optional `index.HoughIndexer` (or multi-phase
            variant) enabling ``POST /hough`` — band-based orientation
            indexing, zero training.
        sphere_indexer: optional `index.SphericalIndexer` (or
            `MultiPhaseSphericalIndexer`) enabling ``POST /sphere`` —
            dictionary-free SO(3) correlation indexing.
        strain_config: optional dict enabling ``POST /strain`` (HR-EBSD
            against a held reference): required keys ``reference``
            ((H, W) array) and ``geometry`` (`sim.DetectorGeometry`);
            any remaining keys pass through to `hrebsd_map`
            (``stiffness``, ``remap_iterations``, ``roi_size``, ...).
            ``chunk`` defaults to 128.

    With any of the three zero-training planes configured, ``model`` /
    ``db`` / ``di_dictionary`` may ALL be None — ``/index`` and
    ``/encode`` then answer 400.
    """

    def __init__(
        self,
        model: Any,
        params: Any,
        db: Any,
        top_n: int = 20,
        orientation_threshold: float = 3.0,
        min_required_matches: int = 18,
        batch_size: int = 256,
        image_size: tuple[int, int] = (128, 128),
        mesh: Any = None,
        param_loader: Any = None,
        checkpoint_root: str | None = None,
        max_body_bytes: int = 1 << 30,
        engine: str = "exact",
        preprocess: Any = None,
        nlpar_h: float | None = None,
        nlpar_radius: int = 1,
        di_dictionary: tuple | None = None,
        di_bin: int = 1,
        hough_indexer: Any = None,
        sphere_indexer: Any = None,
        strain_config: dict | None = None,
    ) -> None:
        import jax

        self._hough = hough_indexer
        self._sphere = sphere_indexer
        self._strain = None
        if strain_config is not None:
            sc = dict(strain_config)
            strain_ref = np.asarray(sc.pop("reference"))
            strain_geom = sc.pop("geometry")
            if strain_ref.shape != tuple(strain_geom.shape):
                raise ValueError(
                    f"strain reference {strain_ref.shape} does not match "
                    f"geometry {strain_geom.shape}"
                )
            sc.setdefault("chunk", 128)
            self._strain = (strain_ref, strain_geom, sc)
        zero_planes = (
            hough_indexer is not None
            or sphere_indexer is not None
            or self._strain is not None
        )
        if (
            di_dictionary is None
            and (model is None or db is None)
            and not zero_planes
        ):
            raise ValueError(
                "pass model/params/db, di_dictionary for pattern-DI mode, "
                "or at least one zero-training plane (hough_indexer / "
                "sphere_indexer / strain_config)"
            )

        # Captured before compiling the recipe: scan-mode NLPAR must repair
        # hot pixels BEFORE averaging (see data.nlpar.nlpar_denoise).
        self._nlpar_hot_threshold = getattr(
            preprocess, "hot_pixel_threshold", None
        )
        if preprocess is not None and not callable(preprocess):
            from latice_tpu.data.preprocess import make_preprocess_fn

            preprocess = make_preprocess_fn(preprocess)

        self.image_size = tuple(image_size)
        self._lock = threading.Lock()
        self._model = model
        self._params = params
        self._db = db
        self._di = di_dictionary
        self._di_bin = int(di_bin)
        phase_kw = {}
        if di_dictionary is not None and len(di_dictionary) == 4:
            di_phases, di_groups = di_dictionary[2], di_dictionary[3]
            if di_phases is not None:
                phase_kw = dict(
                    dictionary_phases=di_phases,
                    phase_symmetries=di_groups,
                )
        elif getattr(db, "_has_phases", False):
            phase_kw = dict(
                dictionary_phases=db._phases,
                phase_symmetries=db.config.phase_symmetries,
            )
        self.mesh = mesh
        self._pipeline_kw = dict(
            top_n=top_n,
            orientation_threshold=orientation_threshold,
            min_required_matches=min_required_matches,
            batch_size=batch_size,
            mesh=mesh,
            engine=engine,
            preprocess=preprocess,
            **phase_kw,
        )
        self._param_loader = param_loader
        self.nlpar_h = None if nlpar_h is None else float(nlpar_h)
        self.nlpar_radius = int(nlpar_radius)
        self.checkpoint_root = checkpoint_root
        self.max_body_bytes = int(max_body_bytes)
        self.model_version = 0
        self._quality_detector = None
        if db is None and di_dictionary is None:
            # Zero-training-planes-only service: nothing to search with,
            # so /index, /encode and /reload answer 400.
            self.pipeline = None
            self._encode = None
            self.started = time.time()
            self.requests = 0
            self.patterns_indexed = 0
            return
        self.pipeline = self._build_pipeline(params)
        if model is None:
            # Pattern-DI mode: no encoder exists; /encode and /reload
            # answer 400 through the ValueError path.
            self._encode = None
            self.started = time.time()
            self.requests = 0
            self.patterns_indexed = 0
            return

        def _encode_impl(p, x):
            import jax.numpy as jnp

            # dtype is static under jit: uint8 stacks scale on device
            # (ToTensor semantics), floats pass through — the host link
            # carries the 4x-smaller bytes either way.
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0
            else:
                x = x.astype(jnp.float32)
            if preprocess is not None:
                # Same correction the /index pipeline applies, so latents
                # from /encode match what /index searches with.
                x = preprocess(x)
            return model.apply({"params": p}, x, method="encode")[0]

        if mesh is not None:
            # /encode scales like /index: batch sharded over the data
            # axis, params replicated (chunks are padded to batch_size,
            # which IndexPipeline validates divides the mesh).
            from latice_tpu.parallel import data_parallel_sharding

            batch_sh, replicated = data_parallel_sharding(mesh)
            self._encode = jax.jit(
                _encode_impl, in_shardings=(replicated, batch_sh),
                out_shardings=batch_sh,
            )
        else:
            self._encode = jax.jit(_encode_impl)
        self.started = time.time()
        self.requests = 0
        self.patterns_indexed = 0

    def _build_pipeline(self, params):
        if self._di is not None:
            from latice_tpu.index import PatternDictionaryIndexer

            return PatternDictionaryIndexer(
                self._di[0],
                self._di[1],
                bin_factor=self._di_bin,
                **self._pipeline_kw,
            )
        from latice_tpu.index import IndexPipeline

        return IndexPipeline(
            self._model,
            params,
            self._db._vectors,
            self._db._orientations,
            **self._pipeline_kw,
        )

    def reload(self, checkpoint: str) -> dict:
        """Hot-swap the model from ``checkpoint`` without dropping requests.

        The replacement pipeline is built and warmed while the old one keeps
        serving; the swap itself is a pointer exchange under the lock.
        """
        if self._param_loader is None:
            raise ValueError("service was started without a param_loader")
        if self.checkpoint_root is not None:
            import os

            root = os.path.realpath(self.checkpoint_root)
            target = os.path.realpath(os.path.join(root, checkpoint))
            if os.path.commonpath([root, target]) != root:
                # Deliberately echo no filesystem detail beyond the request.
                raise ValueError(
                    f"checkpoint {checkpoint!r} is outside the configured "
                    "checkpoint root"
                )
            checkpoint = target
        t0 = time.time()
        params = self._param_loader(checkpoint)
        pipeline = self._build_pipeline(params)
        # Compile every served trace outside the lock; the encoder jit is
        # params-as-argument so its cached trace carries over.
        self._warm_pipeline(pipeline)
        with self._lock:
            self.pipeline = pipeline
            self._params = params
            self.model_version += 1
            version = self.model_version
        return {
            "status": "reloaded",
            "checkpoint": checkpoint,
            "model_version": version,
            "seconds": time.time() - t0,
        }

    def warmup(self) -> float:
        """Compile every served program with dummy batches; returns seconds.

        Both pipeline input traces are compiled — uint8 (device-side /255)
        and float32 — since jit treats them as distinct programs and either
        may arrive first. Enabled zero-training planes warm too, so their
        first request never eats a compile.
        """
        t0 = time.time()
        h, w = self.image_size
        with self._lock:
            if self.pipeline is not None:
                self._compile_all(self.pipeline)
            if self._hough is not None:
                self._hough(np.zeros((1, h, w), np.float32))
            if self._sphere is not None:
                self._sphere.index_patterns(np.zeros((1, h, w), np.float32))
            if self._strain is not None:
                ref, geom, kw = self._strain
                from latice_tpu.hrebsd import hrebsd_map

                hrebsd_map(ref[None], ref, geom, **kw)
        dt = time.time() - t0
        logger.info(f"warmup compiled served programs in {dt:.1f}s")
        return dt

    def _warm_pipeline(self, pipeline) -> None:
        """Compile both pipeline input traces — uint8 (device-side /255) and
        float32 — jit treats them as distinct programs and either may arrive
        first. Single home for the invariant: warmup() and reload() share it.
        """
        h, w = self.image_size
        pipeline(np.zeros((1, h, w), dtype=np.uint8))
        pipeline(np.zeros((1, h, w), dtype=np.float32))

    def _compile_all(self, pipeline) -> None:
        h, w = self.image_size
        self._warm_pipeline(pipeline)
        if self._encode is None:
            return
        for dtype in (np.float32, np.uint8):  # jit traces per input dtype
            np.asarray(
                self._encode(
                    self._params,
                    np.zeros((pipeline.batch_size, h, w, 1), dtype=dtype),
                )
            )

    def _prepare(self, patterns: np.ndarray) -> np.ndarray:
        """Shape/dtype normalization preserving the uint8 fast path."""
        from latice_tpu.data import prepare_patterns

        return prepare_patterns(patterns, self.image_size)

    def index(self, patterns: np.ndarray) -> dict:
        """Index a pattern stack; returns a JSON-ready dict.

        With ``nlpar_h`` configured, a 4-D ``(R, C, H, W)`` body is treated
        as a scan: NLPAR-denoised over the grid, then indexed row-major.
        """
        if self.pipeline is None:
            raise ValueError(
                "this server runs only zero-training planes (no "
                "dictionary/checkpoint loaded); POST /hough, /sphere or "
                "/strain"
            )
        scan_grid = None
        arr = np.asarray(patterns)
        if arr.ndim == 4 and arr.shape[-1] not in (1, 3):
            # 4-D = scan contract; diagnose misconfigurations explicitly
            # instead of letting prepare_patterns raise a shape error that
            # never mentions NLPAR.
            if self.nlpar_h is None:
                raise ValueError(
                    "4-D (R, C, H, W) scan bodies need the server to run "
                    "with --nlpar; POST a 3-D (N, H, W) stack instead"
                )
            if arr.shape[-2:] != self.image_size:
                raise ValueError(
                    f"scan patterns are {arr.shape[-2]}x{arr.shape[-1]} but "
                    f"this server indexes {self.image_size[0]}x"
                    f"{self.image_size[1]}"
                )
            from latice_tpu.data import nlpar_denoise

            scan_grid = arr.shape[:2]
            # NLPAR outputs float32, so the pipeline's integer /255 branch
            # will not fire — normalize integer scans to model units here
            # with the same per-dtype scale prepare_patterns uses (1/255
            # for uint8, 1/65535 for uint16 vendor detectors, ...).
            from latice_tpu.data.transforms import _int_scale

            src_dtype = arr.dtype
            arr = arr.astype(np.float32)
            if np.issubdtype(src_dtype, np.integer):
                arr *= _int_scale(src_dtype)
            arr = nlpar_denoise(
                arr,
                search_radius=self.nlpar_radius,
                h=self.nlpar_h,
                hot_pixel_threshold=self._nlpar_hot_threshold,
            ).reshape(-1, *self.image_size)
            patterns = arr
        x = self._prepare(patterns)
        t0 = time.time()
        with self._lock:
            res = self.pipeline(x)
            self.requests += 1
            self.patterns_indexed += len(x)
        # Strict JSON: consensus failures leave NaN rows in the mean;
        # serialize them as null (json.dumps would emit bare NaN tokens,
        # which RFC 8259 forbids and non-Python clients reject).
        mean = res.mean_orientation
        mean_rows = [
            row.tolist() if np.all(np.isfinite(row)) else [None] * len(row)
            for row in np.atleast_2d(mean)
        ]
        out = {
            "n": int(len(x)),
            "orientations": np.nan_to_num(res.best_orientation).tolist(),
            "mean_orientations": mean_rows,
            "success": res.success.tolist(),
            "n_similar": res.n_similar.tolist(),
            "seconds": time.time() - t0,
            # Result provenance: on TPU the uint8 and float input paths
            # compile to different XLA programs whose bf16 roundings can
            # differ by ~1e-2 in score and swap near-tied candidates
            # (ROADMAP "uint8 vs f32"; pinned on-chip by the opt-in gate
            # tests/test_bench_gate.py) — so every result records which
            # path produced it.
            "input_dtype": str(x.dtype),
        }
        if res.phase is not None:
            out["phase"] = res.phase.tolist()
        if scan_grid is not None:
            out["scan_grid"] = [int(scan_grid[0]), int(scan_grid[1])]
        return out

    def encode(self, patterns: np.ndarray) -> dict:
        """Encode patterns to mu latents; returns a JSON-ready dict.

        uint8 stacks stay uint8 across the host link — the jitted encoder
        does the /255 on device (ToTensor semantics), same as ``/index``.
        """
        if self._encode is None:
            raise ValueError(
                "this server runs pattern-DI (no encoder); POST /index"
            )
        x = self._prepare(patterns)
        if x.dtype != np.uint8:
            x = x.astype(np.float32)
        b = self.pipeline.batch_size
        pending = []
        with self._lock:
            # Two-phase dispatch (same pattern as IndexPipeline.__call__):
            # enqueue every chunk first so H2D transfers overlap compute,
            # then materialize.
            for s in range(0, len(x), b):
                chunk = x[s : s + b]
                pad = b - len(chunk)
                if pad:
                    chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
                pending.append(self._encode(self._params, chunk[..., None]))
            outs = [np.asarray(p) for p in pending]
            self.requests += 1
        lat = np.concatenate(outs)[: len(x)]
        return {"n": int(len(x)), "latents": lat.tolist()}

    def quality(self, patterns: np.ndarray) -> dict:
        """Hough band detection + Image Quality for a stack (data.hough)."""
        x = self._prepare(patterns)
        t0 = time.time()
        with self._lock:
            if self._quality_detector is None:
                from latice_tpu.data import BandDetector

                # Lazily built: quality costs a Radon-matrix precompute +
                # one compile, paid only if the endpoint is used.
                self._quality_detector = BandDetector(
                    height=self.image_size[0],
                    width=self.image_size[1],
                    batch_size=(
                        256
                        if self.pipeline is None
                        else min(self.pipeline.batch_size, 256)
                    ),
                )
            det = self._quality_detector(x)
            self.requests += 1
        return {
            "n": int(len(x)),
            "iq": det.iq.tolist(),
            "band_count": det.band_count.tolist(),
            "mean_iq": float(det.iq.mean()) if len(x) else None,
            "seconds": time.time() - t0,
        }

    def hough(self, patterns: np.ndarray) -> dict:
        """Band-based orientation indexing (`index.HoughIndexer`) — zero
        training: only reflectors + geometry, no checkpoint."""
        if self._hough is None:
            raise ValueError(
                "server started without a Hough indexer (serve.py --hough)"
            )
        x = self._prepare(patterns)
        t0 = time.time()
        with self._lock:
            res = self._hough(x)
            self.requests += 1
            self.patterns_indexed += len(x)
        out = {
            "n": int(len(x)),
            "orientations": res.eulers_deg.tolist(),
            "success": res.success.tolist(),
            "fit_deg": res.fit_deg.tolist(),
            "n_matched": res.n_matched.tolist(),
            "iq": res.bands.iq.tolist(),
            "seconds": time.time() - t0,
            "input_dtype": str(x.dtype),
        }
        if getattr(res, "phase", None) is not None:
            out["phase"] = res.phase.tolist()
        return out

    def sphere(self, patterns: np.ndarray, ambiguity: bool = False) -> dict:
        """Spherical-harmonic SO(3) indexing (`index.SphericalIndexer`) —
        dictionary-free: only a master pattern + geometry.

        ``ambiguity`` (POST /sphere?ambiguity=1) additionally runs the
        secondary-peak pseudo-symmetry diagnostic
        (`SphericalIndexer.ambiguity` — a second correlation pass) and
        adds ``ambiguity_angle_deg`` / ``ambiguity_gap`` /
        ``ambiguity_has_rival`` to the reply (NaNs serialize as null).
        Multi-phase servers diagnose against the first master (phase
        ambiguity is already in the scores)."""
        if self._sphere is None:
            raise ValueError(
                "server started without a spherical indexer "
                "(serve.py --sphere-master)"
            )
        x = self._prepare(patterns)
        t0 = time.time()
        with self._lock:
            res = self._sphere.index_patterns(x)
            amb = None
            if ambiguity:
                ix = getattr(self._sphere, "indexers", [self._sphere])[0]
                amb = ix.ambiguity(x)
            self.requests += 1
            self.patterns_indexed += len(x)
        out = {
            "n": int(len(x)),
            "orientations": res.eulers_deg.tolist(),
            "scores": res.scores.tolist(),
            "seconds": time.time() - t0,
            "input_dtype": str(x.dtype),
        }
        phase = getattr(res, "phase", None)
        if phase is not None:
            out["phase"] = phase.tolist()
        if amb is not None:
            nan_null = lambda a: [  # noqa: E731 — local JSON shim
                None if np.isnan(v) else float(v) for v in a
            ]
            out["ambiguity_angle_deg"] = nan_null(amb.angle_deg)
            out["ambiguity_gap"] = nan_null(amb.score_gap)
            out["ambiguity_has_rival"] = amb.has_rival.tolist()
        return out

    def strain(self, patterns: np.ndarray) -> dict:
        """HR-EBSD strain/rotation vs the held reference (`hrebsd_map`)."""
        if self._strain is None:
            raise ValueError(
                "server started without a strain reference "
                "(serve.py --strain-ref)"
            )
        from latice_tpu.hrebsd import hrebsd_map, von_mises_strain

        ref, geom, kw = self._strain
        # No _prepare here: XCF shifts need the RAW frame (center-crop
        # padding would plant false features), and hrebsd widens uint8 on
        # device itself.
        x = np.asarray(patterns)
        if x.ndim == 2:
            x = x[None]
        if x.ndim == 4 and x.shape[-1] == 1:
            x = x[..., 0]
        if x.ndim != 3 or x.shape[1:] != tuple(geom.shape):
            raise ValueError(
                f"strain patterns must be (N, {geom.shape[0]}, "
                f"{geom.shape[1]}) matching the reference; got "
                f"{np.asarray(patterns).shape}"
            )
        t0 = time.time()
        with self._lock:
            res = hrebsd_map(x, ref, geom, **kw)
            self.requests += 1
            self.patterns_indexed += len(x)
        out = {
            "n": int(len(x)),
            "strain": res.strain.tolist(),
            "rotation": res.rotation.tolist(),
            "rotation_deg": res.rotation_deg.tolist(),
            "von_mises": von_mises_strain(res.strain).tolist(),
            "residual_px": res.residual_px.tolist(),
            "mean_quality": float(res.quality.mean()) if len(x) else None,
            "seconds": time.time() - t0,
            "input_dtype": str(x.dtype),
        }
        if res.stress is not None:
            out["stress"] = res.stress.tolist()
        return out

    def health(self) -> dict:
        from latice_tpu.utils import get_platform

        if self._db is None and self._di is None:
            count, dimension, multiphase = 0, 0, False
            mode = "zero-training"
        elif self._db is None:
            count = int(len(self._di[1]))
            dimension = int(self.pipeline.pipeline._dict_dev.shape[1])
            multiphase = len(self._di) == 4 and self._di[2] is not None
            mode = "pattern-di"
        else:
            count = int(self._db.get_count())
            dimension = int(self._db.dimension)
            multiphase = bool(getattr(self._db, "_has_phases", False))
            mode = "latent"
        planes = [p for p in ("index",) if self.pipeline is not None]
        if self._hough is not None:
            planes.append("hough")
        if self._sphere is not None:
            planes.append("sphere")
        if self._strain is not None:
            planes.append("strain")
        return {
            "status": "ok",
            "mode": mode,
            "count": count,
            "dimension": dimension,
            "platform": get_platform(),
            "batch_size": (
                0 if self.pipeline is None else int(self.pipeline.batch_size)
            ),
            "multiphase": multiphase,
            "planes": planes,
            "mesh_devices": 0 if self.mesh is None else int(self.mesh.size),
            "model_version": self.model_version,
            "uptime_s": time.time() - self.started,
            "requests": self.requests,
            "patterns_indexed": self.patterns_indexed,
        }


class _Handler(BaseHTTPRequestHandler):
    service: IndexService  # set by make_server

    def _reply(self, code: int, payload: dict) -> None:
        # allow_nan=False is a regression tripwire: any NaN/Inf reaching a
        # response is a server bug, not something to leak as invalid JSON.
        body = json.dumps(payload, allow_nan=False).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # route through logging, not stderr
        logger.debug("%s " + fmt, self.address_string(), *args)

    def do_GET(self) -> None:
        if self.path == "/healthz":
            self._reply(200, self.service.health())
        else:
            self._reply(404, {"error": f"unknown path {self.path}"})

    def do_POST(self) -> None:
        try:
            length = int(self.headers.get("Content-Length", 0))
        except (TypeError, ValueError):
            self._reply(400, {"error": "bad Content-Length header"})
            return
        if length > self.service.max_body_bytes:
            # Drain (bounded, chunked — never materialized) so clients that
            # write the full body before reading see a clean 413 instead of
            # EPIPE; beyond the drain cap, close the connection instead.
            drain_cap = 64 << 20
            remaining = min(length, drain_cap)
            while remaining > 0:
                chunk = self.rfile.read(min(1 << 20, remaining))
                if not chunk:
                    break
                remaining -= len(chunk)
            if length > drain_cap:
                self.close_connection = True
            self._reply(
                413,
                {
                    "error": f"body of {length} bytes exceeds the "
                    f"{self.service.max_body_bytes}-byte limit"
                },
            )
            return
        if self.path == "/reload":
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
                self._reply(200, self.service.reload(body["checkpoint"]))
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._reply(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:
                logger.exception("reload failed")
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            return
        routes = {
            "/index": self.service.index,
            "/encode": self.service.encode,
            "/quality": self.service.quality,
            "/hough": self.service.hough,
            "/sphere": self.service.sphere,
            "/strain": self.service.strain,
        }
        path, _, query = self.path.partition("?")
        if path not in routes:
            self._reply(404, {"error": f"unknown path {self.path}"})
            return
        kwargs = {}
        if path == "/sphere" and query:
            from urllib.parse import parse_qs

            amb = parse_qs(query).get("ambiguity", ["0"])[-1].lower()
            kwargs["ambiguity"] = amb in ("1", "true", "yes")
        try:
            patterns = np.load(io.BytesIO(self.rfile.read(length)), allow_pickle=False)
        except Exception as e:  # malformed payloads must not kill the server
            self._reply(400, {"error": f"body must be .npy bytes: {e}"})
            return
        try:
            self._reply(200, routes[path](patterns, **kwargs))
        except ValueError as e:
            self._reply(400, {"error": str(e)})
        except Exception as e:
            logger.exception("request failed")
            self._reply(500, {"error": f"{type(e).__name__}: {e}"})


def make_server(
    service: IndexService, host: str = "127.0.0.1", port: int = 8800
) -> ThreadingHTTPServer:
    """Build the HTTP server (not yet serving — call ``serve_forever()``)."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)
