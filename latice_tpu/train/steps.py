"""Jitted train / eval steps.

The compiled core of what Lightning orchestrated interpretively in the
reference (latice/lightning_module.py:214-346): one fused XLA program per
step — forward, loss, backward, optimizer update — with donated state buffers
so parameter memory is reused in place on the TPU.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from latice_tpu.train.loss import VAELoss
from latice_tpu.train.state import TrainState

__all__ = ["make_train_step", "make_eval_step"]

Metrics = dict[str, jax.Array]


def make_train_step(
    loss_fn: VAELoss,
    donate: bool = True,
) -> Callable[[TrainState, jax.Array, jax.Array], tuple[TrainState, Metrics]]:
    """Build the jitted training step.

    The returned function maps ``(state, batch, rng) -> (state, metrics)``
    where ``batch`` is NHWC patterns. The per-step PRNG key is derived by
    folding the step counter into ``rng``, giving reproducible sampling
    without host-side key threading (the reference reseeds globally instead,
    lightning_module.py:200-207 — here randomness is explicit).

    Metric keys mirror the reference step logging
    (lightning_module.py:266-270): loss, kl_loss, recon_loss.
    """

    def train_step(
        state: TrainState, batch: jax.Array, rng: jax.Array
    ) -> tuple[TrainState, Metrics]:
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_of(params):
            z, x_hat, mu, std = state.apply_fn({"params": params}, batch, step_rng)
            losses = loss_fn(z, x_hat, mu, std, batch)
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        metrics = {
            "loss": losses["loss"],
            "kl_loss": losses["kl_loss"],
            "recon_loss": losses["recon_loss"],
        }
        return state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(
    loss_fn: VAELoss,
    return_recon: bool = False,
) -> Callable[..., Any]:
    """Build the jitted validation step.

    Maps ``(state, batch, rng) -> metrics`` (plus ``(x, x_hat)`` when
    ``return_recon`` — the reconstruction-figure hook input, mirroring
    lightning_module.py:241-246).
    """

    def eval_step(state: TrainState, batch: jax.Array, rng: jax.Array):
        z, x_hat, mu, std = state.apply_fn({"params": state.params}, batch, rng)
        losses = loss_fn(z, x_hat, mu, std, batch)
        metrics = {
            "loss": losses["loss"],
            "kl_loss": losses["kl_loss"],
            "recon_loss": losses["recon_loss"],
        }
        if return_recon:
            return metrics, x_hat
        return metrics

    return jax.jit(eval_step)
