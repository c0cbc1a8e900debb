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

import logging
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

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
    ) -> None:
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

        train_step = make_train_step(module.loss_fn)
        eval_step = make_eval_step(module.loss_fn, return_recon=self.recon_figure)

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

            batches = prefetch_to_device(
                (b for b, _ in datamodule.train_batches()),
                sharding=self._batch_sharding(),
            )
            for batch in batches:
                state, metrics = train_step(state, batch, train_rng)
                global_step += 1
                if global_step % self.log_every_n_steps == 0:
                    step_metrics = train_agg.update(
                        {k: float(v) for k, v in metrics.items()}
                    )
                    # "elbo" is the reference's progress-bar name for the
                    # training loss (lightning_module.py:266).
                    step_metrics["elbo"] = step_metrics["train_loss"]
                    if self.logger:
                        self.logger.log_metrics(step_metrics, global_step)
                else:
                    train_agg.update({k: float(v) for k, v in metrics.items()})

            val_agg = EpochAggregator("val_")
            last_val = None
            for batch, _ in datamodule.val_batches():
                x = self._shard_batch(batch)
                out = eval_step(state, x, eval_rng)
                metrics, x_hat = out if self.recon_figure else (out, None)
                val_agg.update({k: float(v) for k, v in metrics.items()})
                if x_hat is not None and len(batch) >= 4:
                    last_val = (np.asarray(batch), np.asarray(x_hat, dtype=np.float32))

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
