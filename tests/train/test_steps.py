"""Train-step smoke tests + scheduler parity vs torch's ReduceLROnPlateau."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.models import VariationalAutoEncoderRawData
from latice_tpu.train import (
    EpochAggregator,
    ReduceLROnPlateau,
    VAELoss,
    create_train_state,
    get_learning_rate,
    make_eval_step,
    make_train_step,
    set_learning_rate,
)


@pytest.fixture(scope="module")
def tiny_state():
    model = VariationalAutoEncoderRawData(inplanes=2, latent_dim=8)
    x = jnp.zeros((2, 128, 128, 1), jnp.float32)
    params = model.init({"params": jax.random.key(0)}, x, jax.random.key(1))["params"]
    return model, create_train_state(model, params, learning_rate=1e-3)


class TestTrainStep:
    def test_loss_decreases(self, tiny_state):
        _, state = tiny_state
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(4, 128, 128, 1)), jnp.float32
        )
        step = make_train_step(VAELoss(kl_lambda=5e-6), donate=False)
        rng = jax.random.key(42)
        _, first = step(state, x, rng)
        for _ in range(15):
            state, metrics = step(state, x, rng)
        assert float(metrics["loss"]) < float(first["loss"])

    def test_metrics_keys_match_reference(self, tiny_state):
        _, state = tiny_state
        x = jnp.zeros((2, 128, 128, 1), jnp.float32)
        step = make_train_step(VAELoss(), donate=False)
        _, metrics = step(state, x, jax.random.key(0))
        assert set(metrics) == {"loss", "kl_loss", "recon_loss"}

    def test_eval_step_returns_recon(self, tiny_state):
        _, state = tiny_state
        x = jnp.zeros((2, 128, 128, 1), jnp.float32)
        eval_step = make_eval_step(VAELoss(), return_recon=True)
        metrics, x_hat = eval_step(state, x, jax.random.key(0))
        assert x_hat.shape == x.shape
        assert set(metrics) == {"loss", "kl_loss", "recon_loss"}

    def test_deterministic_given_same_rng(self, tiny_state):
        _, state = tiny_state
        x = jnp.asarray(
            np.random.default_rng(1).uniform(size=(2, 128, 128, 1)), jnp.float32
        )
        step = make_train_step(VAELoss(), donate=False)
        _, m1 = step(state, x, jax.random.key(7))
        _, m2 = step(state, x, jax.random.key(7))
        assert float(m1["loss"]) == float(m2["loss"])


class TestLearningRateControl:
    def test_set_get_learning_rate(self, tiny_state):
        _, state = tiny_state
        assert get_learning_rate(state) == pytest.approx(1e-3)
        state2 = set_learning_rate(state, 5e-4)
        assert get_learning_rate(state2) == pytest.approx(5e-4)
        # original untouched
        assert get_learning_rate(state) == pytest.approx(1e-3)

    def test_lr_change_does_not_recompile(self, tiny_state):
        _, state = tiny_state
        x = jnp.zeros((2, 128, 128, 1), jnp.float32)
        step = make_train_step(VAELoss(), donate=False)
        step(state, x, jax.random.key(0))
        compiles_before = step._cache_size()
        state2 = set_learning_rate(state, 1e-5)
        step(state2, x, jax.random.key(0))
        assert step._cache_size() == compiles_before


class TestReduceLROnPlateau:
    def test_matches_torch_scheduler(self):
        torch = pytest.importorskip("torch")
        # Metric trace with improvement, stagnation, improvement again.
        rng = np.random.default_rng(3)
        metrics = list(
            np.concatenate(
                [
                    np.linspace(1.0, 0.5, 5),
                    0.5 + rng.uniform(0, 1e-6, size=15),
                    np.linspace(0.49, 0.3, 5),
                    0.3 + rng.uniform(0, 1e-6, size=15),
                ]
            )
        )
        param = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([param], lr=1e-4)
        torch_sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, factor=0.1, patience=10
        )
        ours = ReduceLROnPlateau(factor=0.1, patience=10)
        lr = 1e-4
        for m in metrics:
            torch_sched.step(m)
            lr = ours.step(m, lr)
            assert lr == pytest.approx(opt.param_groups[0]["lr"]), m

    def test_min_lr_floor(self):
        sched = ReduceLROnPlateau(factor=0.1, patience=0, min_lr=1e-6)
        lr = 1e-5
        for m in [1.0, 1.0, 1.0, 1.0]:
            lr = sched.step(m, lr)
        assert lr == pytest.approx(1e-6)


class TestEpochAggregator:
    def test_epoch_names_match_reference(self):
        agg = EpochAggregator("train_")
        agg.update({"loss": 1.0, "kl_loss": 0.5, "recon_loss": 0.5})
        agg.update({"loss": 3.0, "kl_loss": 1.5, "recon_loss": 1.5})
        out = agg.epoch_metrics()
        assert out == {
            "Epoch_train_loss": 2.0,
            "Epoch_train_kl_loss": 1.0,
            "Epoch_train_recon_loss": 1.0,
        }

    def test_nan_raises(self):
        agg = EpochAggregator("val_")
        with pytest.raises(FloatingPointError):
            agg.update({"loss": float("nan")})
