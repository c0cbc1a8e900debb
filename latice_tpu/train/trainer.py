"""Training orchestration: the Lightning-Trainer equivalent, JAX-native.

Drives the compiled train/eval steps over epochs with the reference's
behavioral contract (SURVEY §3.1): seeded splits, per-step + epoch metrics
under the reference names, reconstruction-figure logging each validation
epoch (lightning_module.py:331-343), top-k checkpointing on Epoch_val_loss
(conf/trainer/default.yaml:9-15), and ReduceLROnPlateau on the validation
loss. Data parallelism over a device mesh is delegated to
latice_tpu.parallel (the `mesh` argument).
"""

from __future__ import annotations

import collections
import logging
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.data.datamodule import pad_batch
from latice_tpu.train.checkpoint import CheckpointManager
from latice_tpu.train.metrics import EpochAggregator
from latice_tpu.train.module import VAEModule
from latice_tpu.train.state import get_learning_rate, set_learning_rate
from latice_tpu.train.steps import make_eval_step, make_train_step

logger = logging.getLogger(__name__)

__all__ = ["Trainer"]


class Trainer:
    """Epoch-loop trainer for VAEModule over a DPDataModule.

    Args:
        max_epochs: Number of epochs (reference default 2,
            conf/trainer/default.yaml:3).
        precision: "16-mixed" (bf16 compute) or "32".
        logger: Object with log_metrics/log_image/finalize (see
            latice_tpu.utils.loggers); None disables logging.
        checkpoint_dir: Directory for top-k checkpoints; None disables.
        save_top_k / monitor: Checkpoint selection (reference: 5 on
            Epoch_val_loss).
        mesh: Optional jax.sharding.Mesh for data-parallel training; batches
            are sharded over its 'data' axis, parameters replicated
            (gradient psum happens inside the compiled step via sharding
            propagation).
        log_every_n_steps: Step-metric logging cadence.
        seed: PRNG seed for init + sampling streams.
        enable_progress_bar: Live per-epoch train/val bar (rich when
            available — the RichProgressBar analogue,
            reference conf/trainer/default.yaml:9).
        recon_figure: Log the original-vs-reconstruction grid each epoch.
        augment: Optional training-time perturbation — a jittable
            ``(key, batch) -> batch`` callable or a `data.AugmentConfig` —
            fused into the train step (see `data.augment`). Validation stays
            unaugmented, so ``Epoch_val_*`` remain comparable across runs.
        denoising: With ``augment``, train the denoising-VAE objective
            (reconstruct the clean batch from the augmented input).

    Every batch (including epoch tails) is padded to the datamodule's
    ``batch_size`` with masked rows, so each step function compiles exactly
    once and sharded batches always divide over the mesh. Epoch metrics
    weight each step by its real row count.
    """

    def __init__(
        self,
        max_epochs: int = 2,
        precision: str = "16-mixed",
        logger: Any | None = None,
        checkpoint_dir: str | Path | None = None,
        save_top_k: int = 5,
        monitor: str = "Epoch_val_loss",
        mesh: Any | None = None,
        log_every_n_steps: int = 50,
        seed: int = 42,
        enable_progress_bar: bool = True,
        recon_figure: bool = True,
        augment: Any | None = None,
        denoising: bool = False,
    ) -> None:
        if augment is not None and not callable(augment):
            from latice_tpu.data.augment import AugmentConfig, make_augment_fn

            if not isinstance(augment, AugmentConfig):
                raise TypeError(
                    "augment must be a callable or a data.AugmentConfig, "
                    f"got {type(augment).__name__}"
                )
            augment = make_augment_fn(augment)
        self.augment = augment
        self.denoising = denoising
        self.max_epochs = max_epochs
        self.precision = precision
        self.logger = logger
        self.mesh = mesh
        self.log_every_n_steps = log_every_n_steps
        self.seed = seed
        self.enable_progress_bar = enable_progress_bar
        self.recon_figure = recon_figure
        self.checkpoints = (
            CheckpointManager(checkpoint_dir, save_top_k=save_top_k, monitor=monitor)
            if checkpoint_dir
            else None
        )
        self.state = None
        self.history: list[dict[str, float]] = []
        self.start_epoch = 0
        self.latent: np.ndarray | None = None

    # ------------------------------------------------------------------

    def _shard_batch(self, batch: np.ndarray) -> jax.Array:
        x = jnp.asarray(batch)
        if self.mesh is not None:
            from latice_tpu.parallel import shard_batch

            x = shard_batch(x, self.mesh)
        return x

    def _batch_sharding(self):
        if self.mesh is None:
            return None
        from latice_tpu.parallel import data_parallel_sharding

        return data_parallel_sharding(self.mesh)[0]

    @staticmethod
    def _train_batches(datamodule: Any, epoch: int):
        """Epoch-seeded batches when the datamodule supports it (reproducible
        resume); otherwise its stateful default stream."""
        try:
            return datamodule.train_batches(epoch=epoch)
        except TypeError:
            return datamodule.train_batches()

    @staticmethod
    def _num_batches(datamodule: Any) -> int | None:
        try:
            return int(datamodule.num_train_batches())
        except (AttributeError, TypeError):
            return None

    def fit(self, module: VAEModule, datamodule: Any, resume: bool = False) -> Any:
        """Train; returns the final TrainState.

        With ``resume=True`` and an existing ``last`` checkpoint, training
        continues from the saved epoch with the full optimizer state — the
        Lightning ``ckpt_path="last"`` analogue.
        """
        module = module.with_precision(self.precision)
        rng = jax.random.key(self.seed)
        init_rng, train_rng, eval_rng = jax.random.split(rng, 3)

        datamodule.setup("fit")
        first_batch = next(iter(datamodule.train_batches()))[0]
        # Every batch is padded to one static compile shape (CLAUDE.md
        # convention): exactly one XLA program per step function, and padded
        # batches always divide over the mesh.
        batch_size = getattr(datamodule, "batch_size", None) or len(first_batch)
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            if batch_size % n_dev != 0:
                raise ValueError(
                    f"batch_size {batch_size} must divide by the mesh size "
                    f"{n_dev}: batches are padded to the static compile shape "
                    "and then sharded over the mesh's data axis"
                )
        sample = jnp.asarray(first_batch[:1])
        state = module.init_state(init_rng, sample)
        if resume and self.checkpoints is not None:
            try:
                state = self.checkpoints.load_last_state(state)
                self.start_epoch = int(self.checkpoints.last_epoch()) + 1
                logger.info(f"Resumed from epoch {self.start_epoch - 1}")
            except FileNotFoundError:
                logger.info("No checkpoint to resume from; starting fresh")
        if self.mesh is not None:
            from latice_tpu.parallel import replicate_state

            state = replicate_state(state, self.mesh)

        train_step = make_train_step(
            module.loss_fn, augment=self.augment, denoising=self.denoising
        )
        eval_step = make_eval_step(module.loss_fn, return_recon=self.recon_figure)
        # Exposed for compile-count assertions (pad-never-recompile tests).
        self._train_step, self._eval_step = train_step, eval_step
        # Tiny compiled key-derivation program: eager fold_in would trigger a
        # per-op remote compile on some backends (see axon landmines memory).
        fold_key = jax.jit(jax.random.fold_in)

        n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
        logger.info(
            f"Training {n_params/1e6:.2f}M params for {self.max_epochs} epochs "
            f"on {jax.devices()} (precision={self.precision})"
        )

        global_step = int(state.step)
        for epoch in range(self.start_epoch, self.max_epochs):
            epoch_start = time.time()
            train_agg = EpochAggregator("train_")
            from latice_tpu.data.prefetch import prefetch_to_device
            from latice_tpu.utils.progress import make_progress_bar

            bar = make_progress_bar(
                self.enable_progress_bar, epoch, self._num_batches(datamodule)
            )
            # Real-row counts ride a host-side queue alongside the prefetch
            # stream (appended at transfer time, consumed in order) so epoch
            # means weight tail batches by their true size without an extra
            # device readback.
            counts: collections.deque[int] = collections.deque()

            def host_batches():
                for b, _ in self._train_batches(datamodule, epoch):
                    x, m, n = pad_batch(np.asarray(b, np.float32), batch_size)
                    counts.append(n)
                    yield (x, m)

            batches = prefetch_to_device(
                host_batches(), sharding=self._batch_sharding()
            )
            for x, m in batches:
                state, metrics = train_step(state, x, train_rng, m)
                global_step += 1
                step_metrics = train_agg.update(
                    {k: float(v) for k, v in metrics.items()},
                    weight=counts.popleft(),
                )
                # "elbo" is the reference's progress-bar name for the
                # training loss (lightning_module.py:266).
                step_metrics["elbo"] = step_metrics["train_loss"]
                if global_step % self.log_every_n_steps == 0 and self.logger:
                    self.logger.log_metrics(step_metrics, global_step)
                bar.step(step_metrics)

            val_agg = EpochAggregator("val_")
            last_val = None
            bar.set_phase("val")
            for i, (batch, _) in enumerate(datamodule.val_batches()):
                x, m, n = pad_batch(np.asarray(batch, np.float32), batch_size)
                x_dev = self._shard_batch(x)
                m_dev = self._shard_batch(m)
                # Per-(epoch, batch) validation key: a constant key would make
                # val-loss noise perfectly correlated across epochs.
                key = fold_key(eval_rng, np.uint32(epoch * 100_003 + i))
                out = eval_step(state, x_dev, key, m_dev)
                metrics, x_hat = out if self.recon_figure else (out, None)
                step_metrics = val_agg.update(
                    {k: float(v) for k, v in metrics.items()}, weight=n
                )
                bar.step(step_metrics)
                if x_hat is not None and n >= 4:
                    last_val = (
                        np.asarray(x[:n]),
                        np.asarray(x_hat[:n], dtype=np.float32),
                    )
            bar.close()

            epoch_metrics = {**train_agg.epoch_metrics(), **val_agg.epoch_metrics()}
            epoch_metrics["learning_rate"] = get_learning_rate(state)
            epoch_metrics["epoch_time_s"] = time.time() - epoch_start
            self.history.append(epoch_metrics)
            if self.logger:
                self.logger.log_metrics(epoch_metrics, epoch)
            logger.info(
                f"epoch {epoch}: "
                + " ".join(f"{k}={v:.5g}" for k, v in epoch_metrics.items())
            )

            if self.recon_figure and last_val is not None and self.logger:
                self._log_reconstruction(last_val, epoch)

            if self.checkpoints is not None:
                self.checkpoints.save(
                    epoch, state.params, epoch_metrics, full_state=state
                )

            if module.scheduler is not None and "Epoch_val_loss" in epoch_metrics:
                current_lr = get_learning_rate(state)
                new_lr = module.scheduler.step(
                    epoch_metrics["Epoch_val_loss"], current_lr
                )
                if new_lr != current_lr:
                    logger.info(f"Reducing learning rate to {new_lr:.3g}")
                    state = set_learning_rate(state, new_lr)

        if self.logger:
            self.logger.finalize()
        self.state = state
        return state

    def test(
        self, module: VAEModule, datamodule: Any, state: Any | None = None
    ) -> np.ndarray:
        """Collect mu embeddings over the test split — the Lightning test
        plane (reference lightning_module.py:348-357: ``test_step`` returns
        the encoder means, ``test_epoch_end`` concatenates them into
        ``self.latent``).

        Uses the trained state from ``fit`` unless ``state`` is given.
        Batches are padded to the static compile shape (one XLA program);
        dispatch is two-phase so device transfers overlap compute.

        Returns:
            ``(N, latent_dim)`` float32 array, also stored on
            ``self.latent``.
        """
        state = state if state is not None else self.state
        if state is None:
            raise RuntimeError("No trained state: call fit() first or pass state=")
        module = module.with_precision(self.precision)
        model = module.model
        batch_size = getattr(datamodule, "batch_size", None) or 256

        @jax.jit
        def encode(params, x):
            mu, _ = model.apply({"params": params}, x, method="encode")
            return mu

        pending = []
        for batch, _ in datamodule.test_batches():
            x, _, n = pad_batch(np.asarray(batch, np.float32), batch_size)
            pending.append((n, encode(state.params, self._shard_batch(x))))
        outs = [np.asarray(mu[:n], np.float32) for n, mu in pending]
        self.latent = (
            np.concatenate(outs) if outs else np.zeros((0, 0), np.float32)
        )
        return self.latent

    def _log_reconstruction(self, last_val, epoch: int) -> None:
        """Render the 2xN original-vs-reconstruction grid
        (lightning_module.py:331-343 / utils.py:77-148)."""
        try:
            from latice_tpu.utils.viz import figure_to_array, plot_detection

            x, x_hat = last_val
            fig = plot_detection(x, x_hat)
            self.logger.log_image(
                "reconstruction/eval_check", figure_to_array(fig), epoch
            )
        except Exception as e:  # viz must never kill training
            logger.warning(f"Reconstruction figure logging failed: {e}")
