"""VAE training module: the VAELightningModule equivalent.

Bundles model + loss + optimizer/scheduler factories behind the reference's
constructor shape (latice/lightning_module.py:159-198: ``model``,
``kl_lambda``, ``optimizer_partial``, ``lr_scheduler_partial``) — but holds no
mutable training state itself; state lives in an explicit TrainState pytree
the Trainer threads through jitted steps.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from latice_tpu.train.loss import VAELoss
from latice_tpu.train.schedule import ReduceLROnPlateau
from latice_tpu.train.state import TrainState, create_train_state, make_optimizer

__all__ = ["VAEModule", "default_optimizer_partial", "default_scheduler_partial"]


def default_optimizer_partial() -> optax.GradientTransformation:
    """Adam(lr=1e-4, amsgrad) — lightning_module.py:26-28."""
    return make_optimizer(learning_rate=1e-4, amsgrad=True)


def default_scheduler_partial() -> ReduceLROnPlateau:
    """ReduceLROnPlateau(factor=0.1, patience=10) — lightning_module.py:31-35."""
    return ReduceLROnPlateau(factor=0.1, patience=10)


class VAEModule:
    """Training bundle for a VAE model.

    Args:
        model: Flax VAE module (e.g. VariationalAutoEncoderRawData).
        kl_lambda: KL weight (reference default config: 5e-6).
        optimizer_partial: Zero-arg factory returning an optax transformation
            (or an optax transformation directly).
        lr_scheduler_partial: Zero-arg factory returning a ReduceLROnPlateau
            (or an instance, or None to disable — lightning_module.py:361-369).
    """

    def __init__(
        self,
        model: Any,
        kl_lambda: float = 0.1,
        optimizer_partial: Callable | optax.GradientTransformation | None = None,
        lr_scheduler_partial: Callable | ReduceLROnPlateau | None = default_scheduler_partial,
    ) -> None:
        self.model = model
        self.loss_fn = VAELoss(kl_lambda=kl_lambda)

        if optimizer_partial is None:
            optimizer_partial = default_optimizer_partial
        self.tx = (
            optimizer_partial()
            if callable(optimizer_partial)
            and not isinstance(optimizer_partial, optax.GradientTransformation)
            else optimizer_partial
        )

        if lr_scheduler_partial is None:
            self.scheduler = None
        elif isinstance(lr_scheduler_partial, ReduceLROnPlateau):
            self.scheduler = lr_scheduler_partial
        else:
            self.scheduler = lr_scheduler_partial()

    def with_precision(self, precision: str) -> "VAEModule":
        """Return a module whose model computes in the given precision.

        ``"16-mixed"`` / ``"bf16-mixed"`` select bfloat16 compute with float32
        params — the TPU analogue of the reference trainer's 16-mixed setting
        (conf/train.yaml:14).
        """
        if precision in ("16-mixed", "bf16-mixed", "bf16"):
            dtype = jnp.bfloat16
        elif precision in ("32", "32-true", "fp32", 32):
            dtype = jnp.float32
        else:
            raise ValueError(f"Unknown precision {precision!r}")
        if getattr(self.model, "dtype", None) == dtype:
            return self
        clone = VAEModule.__new__(VAEModule)
        clone.__dict__.update(self.__dict__)
        clone.model = self.model.clone(dtype=dtype)
        return clone

    def init_state(self, rng: jax.Array, sample_batch: jax.Array) -> TrainState:
        """Initialize parameters and optimizer state from a sample batch."""
        params_rng, sample_rng = jax.random.split(rng)
        params = self.model.init(
            {"params": params_rng}, sample_batch, sample_rng
        )["params"]
        return create_train_state(self.model, params, tx=self.tx)
