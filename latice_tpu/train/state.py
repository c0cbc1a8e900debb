"""Train state and optimizer construction.

The TPU-native equivalent of the reference's optimizer/scheduler wiring
(latice/lightning_module.py:26-35, 359-369): Adam(lr=1e-4, amsgrad) with a
ReduceLROnPlateau schedule monitoring val loss. The learning rate is exposed
as a mutable hyperparameter (optax.inject_hyperparams) so the host-side
plateau scheduler can change it between jitted steps without recompiling.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

__all__ = ["TrainState", "make_optimizer", "create_train_state", "set_learning_rate", "get_learning_rate"]


class TrainState(train_state.TrainState):
    """Flax TrainState; params/opt-state pytree, step counter, apply_fn."""


def make_optimizer(
    learning_rate: float = 1e-4, amsgrad: bool = True
) -> optax.GradientTransformation:
    """Adam with optional AMSGrad, lr injected as a runtime hyperparameter.

    Defaults mirror `get_default_optimiser` (lightning_module.py:26-28):
    Adam(lr=1e-4, weight_decay=0, amsgrad=True).
    """
    inner = optax.amsgrad if amsgrad else optax.adam
    return optax.inject_hyperparams(inner)(learning_rate=learning_rate)


def create_train_state(
    model: Any,
    params: Any,
    learning_rate: float = 1e-4,
    amsgrad: bool = True,
    tx: optax.GradientTransformation | None = None,
) -> TrainState:
    """Build a TrainState for `model` with the default optimizer."""
    if tx is None:
        tx = make_optimizer(learning_rate, amsgrad)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    # Canonicalize the step counter to the array type a jitted step returns:
    # flax initializes it as a python int, whose trace signature differs from
    # the int32 device scalar coming out of apply_gradients — costing one
    # silent recompile of the whole train step (minutes on some backends).
    return state.replace(step=jnp.asarray(0, jnp.int32))


def _find_hyperparams(opt_state: Any) -> dict | None:
    """Locate the InjectHyperparamsState.hyperparams dict inside an opt state."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    if isinstance(opt_state, tuple):
        for sub in opt_state:
            found = _find_hyperparams(sub)
            if found is not None:
                return found
    return None


def get_learning_rate(state: TrainState) -> float:
    """Current learning rate as a python float."""
    hp = _find_hyperparams(state.opt_state)
    if hp is None:
        raise ValueError("Optimizer was not built with inject_hyperparams")
    return float(hp["learning_rate"])


def set_learning_rate(state: TrainState, learning_rate: float) -> TrainState:
    """Return a new state with the optimizer learning rate replaced."""
    hp = _find_hyperparams(state.opt_state)
    if hp is None:
        raise ValueError("Optimizer was not built with inject_hyperparams")

    old = hp["learning_rate"]
    new = jnp.asarray(learning_rate, dtype=jnp.asarray(old).dtype)

    def replace(leaf):
        return new if leaf is old else leaf

    new_opt_state = jax.tree_util.tree_map(replace, state.opt_state)
    return state.replace(opt_state=new_opt_state)
