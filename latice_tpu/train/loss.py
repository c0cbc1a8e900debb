"""VAE loss functions — functional JAX port of the reference semantics.

Reproduces `VAELoss` (reference: latice/lightning_module.py:38-156) exactly:

* reconstruction = per-sample mean of element-wise BCE-with-logits
  (lightning_module.py:79-92);
* KL = single-sample Monte-Carlo estimate ``E[log q(z|x) - log p(z)]`` with a
  **mean** (not sum) over the latent dimension (lightning_module.py:94-120);
* total ELBO = ``kl * kl_lambda + recon`` per sample, reported as batch means
  under the reference's metric names (lightning_module.py:122-156).

The reference's Gaussian-likelihood alternative (lightning_module.py:53-77) is
kept for API parity although `compute_loss` does not use it — same as upstream.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

__all__ = [
    "binary_cross_entropy_with_logits",
    "monte_carlo_kl",
    "gaussian_likelihood",
    "VAELoss",
]

_LOG_2PI = math.log(2.0 * math.pi)


def binary_cross_entropy_with_logits(x_hat: jax.Array, x: jax.Array) -> jax.Array:
    """Per-sample BCE-with-logits, mean over all non-batch axes.

    Numerically stable form of ``BCEWithLogitsLoss(reduction="none")`` followed
    by ``.mean(dim=(1, 2, 3))`` (lightning_module.py:91-92):
    ``max(l, 0) - l*x + log1p(exp(-|l|))``.
    """
    l = x_hat.astype(jnp.float32)
    x = x.astype(jnp.float32)
    per_elem = jnp.maximum(l, 0.0) - l * x + jnp.log1p(jnp.exp(-jnp.abs(l)))
    reduce_axes = tuple(range(1, per_elem.ndim))
    return per_elem.mean(axis=reduce_axes)


def _normal_log_prob(value: jax.Array, mu: jax.Array, std: jax.Array) -> jax.Array:
    """log N(value; mu, std), elementwise (torch.distributions.Normal.log_prob)."""
    var = std * std
    return -((value - mu) ** 2) / (2.0 * var) - jnp.log(std) - 0.5 * _LOG_2PI


def monte_carlo_kl(z: jax.Array, mu: jax.Array, std: jax.Array) -> jax.Array:
    """Single-sample MC estimate of KL(q(z|x) || N(0, I)), per sample.

    ``(log q(z|x) - log p(z)).mean(-1)`` — note the mean (not sum) over the
    latent dimension, preserving the reference quirk (lightning_module.py:119).
    """
    log_qzx = _normal_log_prob(z, mu, std)
    log_pz = _normal_log_prob(z, jnp.zeros_like(mu), jnp.ones_like(std))
    return (log_qzx - log_pz).mean(axis=-1)


def gaussian_likelihood(
    x_hat: jax.Array, log_scale: jax.Array, x: jax.Array
) -> jax.Array:
    """Per-sample Gaussian log-likelihood with the reference's normalization.

    Mirrors lightning_module.py:53-77 including the added
    ``log(sqrt(2*pi) * scale)`` term that normalizes the max likelihood to 1.
    Unused by `compute_loss` (parity with upstream, which defines but never
    calls it from the training path).
    """
    scale = jnp.exp(log_scale)
    log_pxz = _normal_log_prob(x, x_hat, scale)
    log_pxz = log_pxz + jnp.log(jnp.sqrt(2.0 * jnp.pi) * scale)
    reduce_axes = tuple(range(1, log_pxz.ndim))
    return log_pxz.mean(axis=reduce_axes)


@dataclasses.dataclass(frozen=True)
class VAELoss:
    """ELBO loss with weighted MC-KL (reference default kl_lambda=5e-6,
    conf/lightning_module/default.yaml:3)."""

    kl_lambda: float = 0.1

    def compute_loss(
        self,
        z: jax.Array,
        x_hat: jax.Array,
        mu: jax.Array,
        std: jax.Array,
        x: jax.Array,
        mask: jax.Array | None = None,
    ) -> dict[str, jax.Array]:
        """All VAE losses, keyed exactly like lightning_module.py:151-156.

        ``mask`` is an optional ``(B,)`` 0/1 weight per sample: rows padded to
        the static compile shape carry weight 0, so the reported means (and
        the gradients through ``loss``) are exactly those of the unpadded
        batch. With ``mask=None`` the reference's plain batch means apply.
        """
        recon_loss = binary_cross_entropy_with_logits(x_hat, x)
        kl = monte_carlo_kl(z, mu, std) * self.kl_lambda
        elbo = kl + recon_loss
        if mask is None:
            mean = jnp.mean
        else:
            w = mask.astype(jnp.float32)
            denom = jnp.maximum(w.sum(), 1.0)
            mean = lambda v: (v * w).sum() / denom
        return {
            "loss": mean(elbo),
            "kl_loss": mean(kl),
            "recon_loss": mean(recon_loss),
            "elbo": elbo,
        }

    def __call__(self, z, x_hat, mu, std, x, mask=None) -> dict[str, jax.Array]:
        return self.compute_loss(z, x_hat, mu, std, x, mask)
