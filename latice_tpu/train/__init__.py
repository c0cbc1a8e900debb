"""Training runtime: loss, jitted steps, optimizer state, schedules, metrics."""

from latice_tpu.train.loss import (
    VAELoss,
    binary_cross_entropy_with_logits,
    gaussian_likelihood,
    monte_carlo_kl,
)
from latice_tpu.train.metrics import EpochAggregator
from latice_tpu.train.schedule import ReduceLROnPlateau
from latice_tpu.train.state import (
    TrainState,
    create_train_state,
    get_learning_rate,
    make_optimizer,
    set_learning_rate,
)
from latice_tpu.train.steps import make_eval_step, make_train_step

__all__ = [
    "EpochAggregator",
    "ReduceLROnPlateau",
    "TrainState",
    "VAELoss",
    "binary_cross_entropy_with_logits",
    "create_train_state",
    "gaussian_likelihood",
    "get_learning_rate",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "monte_carlo_kl",
    "set_learning_rate",
]
