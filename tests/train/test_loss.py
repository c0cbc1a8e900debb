"""Loss parity vs the reference formulas executed in torch (ground truth)."""

import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.train import (
    VAELoss,
    binary_cross_entropy_with_logits,
    gaussian_likelihood,
    monte_carlo_kl,
)

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(0)


def _reference_losses(z, x_hat, mu, std, x, kl_lambda):
    """The reference VAELoss.compute_loss (lightning_module.py:79-156) in torch."""
    tz, tx_hat, tmu, tstd, tx = map(torch.from_numpy, (z, x_hat, mu, std, x))

    bce = torch.nn.BCEWithLogitsLoss(reduction="none")(tx_hat, tx)
    recon = bce.mean(dim=(1, 2, 3))

    p = torch.distributions.Normal(torch.zeros_like(tmu), torch.ones_like(tstd))
    q = torch.distributions.Normal(tmu, tstd)
    kl = (q.log_prob(tz) - p.log_prob(tz)).mean(-1) * kl_lambda

    elbo = kl + recon
    return {
        "loss": elbo.mean().numpy(),
        "kl_loss": kl.mean().numpy(),
        "recon_loss": recon.mean().numpy(),
        "elbo": elbo.numpy(),
    }


@pytest.fixture
def batch():
    b, h, w = 4, 16, 16
    x = RNG.uniform(size=(b, h, w, 1)).astype(np.float32)
    x_hat = RNG.normal(size=(b, h, w, 1)).astype(np.float32) * 3
    mu = RNG.normal(size=(b, 16)).astype(np.float32)
    std = np.exp(RNG.normal(size=(b, 16)).astype(np.float32) * 0.3)
    z = mu + std * RNG.normal(size=(b, 16)).astype(np.float32)
    return z, x_hat, mu, std, x


class TestVAELossParity:
    @pytest.mark.parametrize("kl_lambda", [5e-6, 0.1, 1.0])
    def test_compute_loss_matches_reference(self, batch, kl_lambda):
        z, x_hat, mu, std, x = batch
        want = _reference_losses(z, x_hat, mu, std, x, kl_lambda)
        got = VAELoss(kl_lambda=kl_lambda).compute_loss(
            *(jnp.asarray(a) for a in (z, x_hat, mu, std, x))
        )
        np.testing.assert_allclose(np.asarray(got["loss"]), want["loss"], rtol=2e-5)
        np.testing.assert_allclose(
            np.asarray(got["kl_loss"]), want["kl_loss"], rtol=2e-4, atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(got["recon_loss"]), want["recon_loss"], rtol=2e-5
        )
        np.testing.assert_allclose(np.asarray(got["elbo"]), want["elbo"], rtol=2e-4)

    def test_bce_extreme_logits_stable(self):
        x_hat = jnp.asarray([[[-80.0], [80.0]], [[0.0], [30.0]]])[None]
        x = jnp.asarray([[[0.0], [1.0]], [[0.5], [0.0]]])[None]
        out = binary_cross_entropy_with_logits(x_hat, x)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_gaussian_likelihood_matches_reference(self, batch):
        z, x_hat, mu, std, x = batch
        log_scale = np.float32(0.0)
        tdist = torch.distributions.Normal(
            torch.from_numpy(x_hat), torch.exp(torch.tensor(log_scale))
        )
        log_pxz = tdist.log_prob(torch.from_numpy(x))
        log_pxz = log_pxz + torch.log(
            torch.sqrt(torch.tensor(2 * np.pi)) * torch.exp(torch.tensor(log_scale))
        )
        want = log_pxz.mean(dim=(1, 2, 3)).numpy()
        got = gaussian_likelihood(jnp.asarray(x_hat), jnp.asarray(log_scale), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)

    def test_kl_zero_when_q_equals_p(self):
        """When mu=0, std=1 the MC-KL estimator is exactly 0 per sample."""
        mu = np.zeros((3, 16), np.float32)
        std = np.ones((3, 16), np.float32)
        z = RNG.normal(size=(3, 16)).astype(np.float32)
        out = monte_carlo_kl(jnp.asarray(z), jnp.asarray(mu), jnp.asarray(std))
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
