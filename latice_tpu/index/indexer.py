"""Diffraction-pattern indexer: encode patterns, build dictionaries, query.

API-parity rebuild of `DiffractionPatternIndexer` + `IndexerConfig`
(reference: latice/index/dp_indexer.py:26-297) on the JAX stack: the model is
a Flax module + params pytree, encoding runs as one jitted fixed-shape program
(partial batches are padded, not recompiled), and batch indexing feeds the
vectorized consensus engine instead of a per-vector Python loop.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import cached_property
from pathlib import Path
from typing import Any, Literal

import jax
import jax.numpy as jnp
import numpy as np
from numpy.typing import NDArray

from latice_tpu.data import DPDataModule, default_transform
from latice_tpu.index.db import (
    LatentVectorDatabaseBase,
    LatentVectorDatabaseConfig,
    TpuLatentVectorDatabase,
)
from latice_tpu.index.result import OrientationResult

logger = logging.getLogger(__name__)

__all__ = ["IndexerConfig", "DiffractionPatternIndexer"]


@dataclass
class IndexerConfig:
    """Configuration for the diffraction pattern indexer (dp_indexer.py:26-48).

    Attributes:
        pattern_path: Path to the dictionary pattern .npy stack.
        angles_path: Path to the dictionary orientation angle file.
        batch_size: Batch size for encoding patterns.
        device: "tpu" (or "cpu") — falls back to cpu when no TPU is attached,
            mirroring the reference's cuda→cpu fallback (dp_indexer.py:83-85).
        latent_dim: Dimension of the latent space.
        random_seed: Seed for the (explicit) PRNG stream.
        image_size: Input pattern size.
        top_n: Number of top matches to consider.
        orientation_threshold: Max misorientation angle (degrees) to consider.
    """

    pattern_path: Path | str | None = None
    angles_path: Path | str | None = None
    batch_size: int = 64
    device: Literal["tpu", "cpu"] = "tpu"
    latent_dim: int = 16
    random_seed: int = 42
    image_size: tuple[int, int] = (128, 128)
    top_n: int = 20
    orientation_threshold: float = 3.0


class DiffractionPatternIndexer:
    """Indexes diffraction patterns using a VAE encoder and a vector database.

    Handles the full pipeline: encoding patterns into latent space, storing
    latent vectors with orientations, and retrieving best-matching
    orientations for unknown patterns (dp_indexer.py:51-57).
    """

    def __init__(
        self,
        model: Any,
        params: Any,
        db: LatentVectorDatabaseBase | None = None,
        config: IndexerConfig | None = None,
        timer: Any | None = None,
        mesh: Any | None = None,
    ) -> None:
        """Args:
        model: Flax VAE module exposing an ``encode`` method returning
            (mu, logvar) — the trained-model analogue of dp_indexer.py:61.
        params: Trained parameter pytree for ``model``.
        db: Vector database (defaults to a TpuLatentVectorDatabase of
            ``config.latent_dim``).
        config: Indexer configuration.
        timer: Optional latice_tpu.utils.PhaseTimer — when given, encode and
            search phases are timed (the per-phase introspection SURVEY §5
            notes the reference lacked).
        mesh: Optional ``jax.sharding.Mesh`` — encode batches shard over its
            first axis (params replicated), scaling the dictionary build
            linearly over the devices (SURVEY §2 parallelism (b), build
            side; reference flow dp_indexer.py:92-111, 254-297). Batch rows
            are independent through the conv stack, so sharding only
            partitions work; latents match the single-device build to float
            roundoff (XLA may vectorize the smaller per-shard batch
            differently). ``config.batch_size`` must divide by the mesh
            size.
        """
        self.timer = timer
        self.config = config if config is not None else IndexerConfig()
        self.db = (
            db
            if db is not None
            else TpuLatentVectorDatabase(
                LatentVectorDatabaseConfig(dimension=self.config.latent_dim)
            )
        )
        self.model = model
        self.mesh = mesh

        requested = self.config.device
        platforms = {d.platform for d in jax.devices()}
        if requested == "tpu" and "tpu" not in platforms:
            logger.warning("TPU not available, falling back to CPU")
        logger.info(f"Using devices: {jax.devices()}")

        def _encode(params, x):
            return self.model.apply({"params": params}, x, method="encode")[0]

        if mesh is not None:
            if self.config.batch_size % mesh.devices.size:
                raise ValueError(
                    f"batch_size {self.config.batch_size} must divide by "
                    f"mesh size {mesh.devices.size}"
                )
            from latice_tpu.parallel import data_parallel_sharding

            batch_sh, replicated = data_parallel_sharding(mesh)
            # Params live replicated once; every encode dispatch ships only
            # its batch shard to each device.
            self.params = jax.device_put(params, replicated)
            self._encode_jit = jax.jit(
                _encode, in_shardings=(replicated, batch_sh),
                out_shardings=batch_sh,
            )
        else:
            self.params = params
            self._encode_jit = jax.jit(_encode)

    def _phase(self, name: str):
        import contextlib

        return self.timer.phase(name) if self.timer is not None else contextlib.nullcontext()

    # -- encoding ----------------------------------------------------------

    def _dispatch_encode(self, batch: np.ndarray) -> tuple[jax.Array, int]:
        """Enqueue one encode dispatch (padded to the static batch size so
        every call reuses one compiled program); returns the device future
        and the number of genuine rows."""
        bs = self.config.batch_size
        n = len(batch)
        if n < bs:
            batch = np.concatenate(
                [batch, np.zeros((bs - n,) + batch.shape[1:], batch.dtype)]
            )
        return self._encode_jit(self.params, batch), n

    def _encode_fixed(self, batch: np.ndarray) -> np.ndarray:
        """Encode a (b<=batch_size, H, W, 1) chunk synchronously."""
        mu, n = self._dispatch_encode(batch)
        return np.asarray(mu)[:n]

    def _to_nhwc(self, patterns: NDArray | Any) -> np.ndarray:
        """Normalize input to a (B, H, W, 1) float32 stack via the default
        transform (dp_indexer.py:124-131,150-172 shape fixups)."""
        x = np.asarray(patterns)
        if x.ndim == 2:  # single (H, W)
            x = default_transform(x, self.config.image_size)[None]
        elif x.ndim == 3:
            if x.shape[-1] == 1:  # single (H, W, 1)
                x = default_transform(x[..., 0], self.config.image_size)[None]
            else:  # batch (B, H, W)
                x = default_transform(x, self.config.image_size)
        elif x.ndim == 4:
            if x.shape[-1] != 1:
                raise ValueError(f"Expected NHWC with 1 channel, got {x.shape}")
            x = default_transform(x[..., 0], self.config.image_size)
        else:
            raise ValueError(f"Expected 2-4D pattern array, got {x.ndim}D")
        return x.astype(np.float32)

    def encode_pattern(self, pattern: NDArray | Any) -> np.ndarray:
        """Encode a single pattern to its latent mean (dp_indexer.py:113-137)."""
        x = self._to_nhwc(pattern)
        return self._encode_fixed(x).squeeze()

    def encode_patterns_batch(self, patterns: NDArray | Any) -> np.ndarray:
        """Encode many patterns, minibatched at config.batch_size
        (dp_indexer.py:139-186)."""
        x = self._to_nhwc(patterns)
        bs = self.config.batch_size
        outs = [self._encode_fixed(x[i : i + bs]) for i in range(0, len(x), bs)]
        return np.vstack(outs)

    # -- dictionary build --------------------------------------------------

    def build_dictionary(self, progress: bool = True) -> None:
        """Encode the dictionary dataset and add it to the DB
        (dp_indexer.py:92-111)."""
        logger.info(
            f"Generating latent vectors from patterns in {self.config.pattern_path}"
        )
        latent_vectors, orientations = self._extract_latent_vectors_with_angles(
            progress=progress
        )
        logger.info(f"Adding {len(latent_vectors)} vectors to database")
        self.db.add_vectors(latent_vectors, orientations)

    def build_multiphase_dictionary(
        self, phase_sources, progress: bool = True
    ) -> None:
        """Build a multi-phase dictionary from one source pair per phase.

        Beyond-reference capability (BASELINE config 5; the reference is
        single-phase cubic only). Each ``(pattern_path, angles_path)`` pair in
        ``phase_sources`` is encoded like `build_dictionary` and added with
        its list position as the phase id; pair the DB with a matching
        ``phase_symmetries`` config to give each phase its point group.
        """
        for phase_id, (pattern_path, angles_path) in enumerate(phase_sources):
            dm = self._make_datamodule(pattern_path, angles_path)
            latents, orientations = self._extract_latent_vectors_with_angles(
                progress=progress, dm=dm
            )
            logger.info(
                f"Adding {len(latents)} phase-{phase_id} vectors to database"
            )
            self.db.add_vectors(
                latents,
                orientations,
                phases=np.full(len(latents), phase_id, dtype=np.int32),
            )

    def _make_datamodule(self, pattern_path, angles_path) -> DPDataModule:
        if pattern_path is None or angles_path is None:
            raise ValueError("pattern_path and angles_path must be configured")
        dm = DPDataModule(
            path=pattern_path,
            rot_angles_path=angles_path,
            image_size=self.config.image_size,
            batch_size=self.config.batch_size,
        )
        dm.setup("test")
        return dm

    @cached_property
    def _datamodule(self) -> DPDataModule:
        """Dictionary data module in test mode (dp_indexer.py:234-252)."""
        return self._make_datamodule(
            self.config.pattern_path, self.config.angles_path
        )

    def _extract_latent_vectors_with_angles(
        self, progress: bool = True, dm: DPDataModule | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batch-encode the dictionary loader (dp_indexer.py:254-297).

        Dispatch is two-phase with a bounded in-flight window (the pattern
        pipeline.py / Trainer.test use): each batch's encode is enqueued
        before the previous result is pulled to the host, so H2D transfer,
        device compute, and D2H readback overlap instead of serializing —
        on tunneled rigs the build runs at link speed, not link+compute.
        The window bounds device-resident input buffers.
        """
        from collections import deque

        dm = dm if dm is not None else self._datamodule
        latent_vectors, orientations = [], []
        inflight: deque[tuple[jax.Array, int, np.ndarray]] = deque()
        window = 4

        iterator = dm.test_batches()
        total = dm.num_test_batches()
        bar = _maybe_progress(progress, total)
        with bar:
            task = bar.add_task("Processing patterns...", total=total)

            def _drain_one():
                mu, n, angles = inflight.popleft()
                latent_vectors.append(np.asarray(mu)[:n])
                orientations.append(angles)
                bar.update(task, advance=1)

            for data, angles in iterator:
                mu, n = self._dispatch_encode(data)
                inflight.append((mu, n, np.asarray(angles)))
                if len(inflight) > window:
                    _drain_one()
            while inflight:
                _drain_one()

        return np.concatenate(latent_vectors, 0), np.concatenate(orientations, 0)

    def export_latents(
        self,
        latent_output_path: Path | str | None = None,
        angles_output_path: Path | str | None = None,
        progress: bool = True,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Offline latent export: encode the dictionary and save/return arrays.

        Restores the capability of the reference's (broken, unimportable)
        legacy indexer generation — `generate_latent_vectors`
        (latice/index/latent_embedding.py:111-166) — but encodes the
        deterministic ``mu`` rather than a sampled ``z``, matching what the
        retrieval dictionary actually needs.
        """
        latents, orientations = self._extract_latent_vectors_with_angles(
            progress=progress
        )
        if latent_output_path is not None:
            np.save(Path(latent_output_path), latents)
            logger.info(f"Saved latent vectors to {latent_output_path}")
        if angles_output_path is not None:
            np.save(Path(angles_output_path), orientations)
            logger.info(f"Saved orientations to {angles_output_path}")
        return latents, orientations

    # -- querying ----------------------------------------------------------

    def index_pattern(
        self,
        pattern: NDArray | Any,
        top_n: int | None = None,
        orientation_threshold: float | None = None,
    ) -> OrientationResult:
        """Index one pattern; returns its best orientation
        (dp_indexer.py:188-214)."""
        top_n = top_n or self.config.top_n
        orientation_threshold = (
            orientation_threshold or self.config.orientation_threshold
        )
        with self._phase("encode"):
            latent_vector = self.encode_pattern(pattern)
        with self._phase("search"):
            return self.db.find_best_orientation(
                latent_vector, top_n=top_n, orientation_threshold=orientation_threshold
            )

    def index_patterns_batch(
        self, patterns: NDArray | Any, **kwargs
    ) -> list[OrientationResult]:
        """Index many patterns via the vectorized batch path
        (dp_indexer.py:216-232)."""
        kwargs.setdefault("top_n", self.config.top_n)
        kwargs.setdefault("orientation_threshold", self.config.orientation_threshold)
        with self._phase("encode"):
            latent_vectors = self.encode_patterns_batch(patterns)
        with self._phase("search"):
            return self.db.find_best_orientations_batch(
                latent_vectors, batch_size=self.config.batch_size, **kwargs
            )


class _NullProgress:
    """No-op progress bar."""

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def add_task(self, *a, **kw):
        return 0

    def update(self, *a, **kw):
        pass


def _maybe_progress(enabled: bool, total: int):
    if not enabled:
        return _NullProgress()
    try:
        from rich.progress import (
            BarColumn,
            Progress,
            SpinnerColumn,
            TextColumn,
            TimeElapsedColumn,
        )

        return Progress(
            SpinnerColumn(),
            TextColumn("[progress.description]{task.description}"),
            BarColumn(),
            TextColumn("[progress.percentage]{task.percentage:>3.0f}%"),
            TimeElapsedColumn(),
        )
    except ImportError:  # rich is optional
        return _NullProgress()
