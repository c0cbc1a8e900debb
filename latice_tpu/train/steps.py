"""Jitted train / eval steps.

The compiled core of what Lightning orchestrated interpretively in the
reference (latice/lightning_module.py:214-346): one fused XLA program per
step — forward, loss, backward, optimizer update — with donated state buffers
so parameter memory is reused in place on the TPU.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from latice_tpu.train.loss import VAELoss
from latice_tpu.train.state import TrainState

__all__ = ["make_train_step", "make_eval_step"]

Metrics = dict[str, jax.Array]


def make_train_step(
    loss_fn: VAELoss,
    donate: bool = True,
    skip_nonfinite_updates: bool = False,
    augment: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    denoising: bool = False,
) -> Callable[[TrainState, jax.Array, jax.Array], tuple[TrainState, Metrics]]:
    """Build the jitted training step.

    The returned function maps ``(state, batch, rng, mask=None) ->
    (state, metrics)`` where ``batch`` is NHWC patterns and ``mask`` is an
    optional ``(B,)`` 0/1 row-validity weight: partial batches are padded to
    the static compile shape upstream (one compiled program per run) and the
    pad rows contribute zero loss and zero gradient. The per-step PRNG key is
    derived by folding the step counter into ``rng``, giving reproducible
    sampling without host-side key threading (the reference reseeds globally
    instead, lightning_module.py:200-207 — here randomness is explicit).

    Metric keys mirror the reference step logging
    (lightning_module.py:266-270): loss, kl_loss, recon_loss.

    Args:
        skip_nonfinite_updates: When True, a step whose loss or gradients are
            non-finite leaves parameters and optimizer state untouched (the
            step counter still advances and metrics report the bad loss) —
            failure containment the reference had no analogue for
            (SURVEY §5: "failure detection: none").
        augment: optional jittable ``(key, batch) -> batch`` perturbation
            (see `data.augment.make_augment_fn`) fused into the step — the
            per-step key derives from the step counter, so augmented runs
            stay exactly reproducible. The reference trains unaugmented.
        denoising: with ``augment``, reconstruct the ORIGINAL batch from the
            augmented input (denoising-VAE objective — the encoder learns
            invariance to the perturbations raw scans carry). Default False
            reconstructs the augmented input (plain data augmentation).
    """

    def train_step(
        state: TrainState,
        batch: jax.Array,
        rng: jax.Array,
        mask: jax.Array | None = None,
    ) -> tuple[TrainState, Metrics]:
        step_rng = jax.random.fold_in(rng, state.step)
        if augment is not None:
            aug_rng, step_rng = jax.random.split(step_rng)
            model_in = augment(aug_rng, batch)
            target = batch if denoising else model_in
        else:
            model_in, target = batch, batch

        def loss_of(params):
            z, x_hat, mu, std = state.apply_fn({"params": params}, model_in, step_rng)
            losses = loss_fn(z, x_hat, mu, std, target, mask)
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        metrics = {
            "loss": losses["loss"],
            "kl_loss": losses["kl_loss"],
            "recon_loss": losses["recon_loss"],
        }
        if skip_nonfinite_updates:
            import jax.numpy as jnp

            grads_ok = jnp.all(
                jnp.asarray(
                    [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
                )
            )
            ok = jnp.isfinite(losses["loss"]) & grads_ok
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda n, o: jnp.where(ok, n, o), new, old
            )
            new_state = new_state.replace(
                params=keep(new_state.params, state.params),
                opt_state=keep(new_state.opt_state, state.opt_state),
            )
            metrics["skipped"] = (~ok).astype(jnp.float32)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(
    loss_fn: VAELoss,
    return_recon: bool = False,
) -> Callable[..., Any]:
    """Build the jitted validation step.

    Maps ``(state, batch, rng, mask=None) -> metrics`` (plus ``(x, x_hat)``
    when ``return_recon`` — the reconstruction-figure hook input, mirroring
    lightning_module.py:241-246). ``mask`` weights out rows padded to the
    static compile shape, as in `make_train_step`.
    """

    def eval_step(
        state: TrainState,
        batch: jax.Array,
        rng: jax.Array,
        mask: jax.Array | None = None,
    ):
        z, x_hat, mu, std = state.apply_fn({"params": state.params}, batch, rng)
        losses = loss_fn(z, x_hat, mu, std, batch, mask)
        metrics = {
            "loss": losses["loss"],
            "kl_loss": losses["kl_loss"],
            "recon_loss": losses["recon_loss"],
        }
        if return_recon:
            return metrics, x_hat
        return metrics

    return jax.jit(eval_step)
