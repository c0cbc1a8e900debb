"""Fused InstanceNorm+LeakyReLU Pallas kernel: value + gradient parity.

Runs in Pallas interpreter mode on the CPU backend; the reference is the
plain-XLA composition used by default in the model blocks.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latice_tpu.ops import instance_norm_leaky_relu

RNG = np.random.default_rng(0)


def reference_impl(x, eps=1e-5, slope=0.02):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return jnp.where(y >= 0, y, slope * y).astype(x.dtype)


fused = functools.partial(instance_norm_leaky_relu, interpret=True)


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 8, 8, 32), (3, 4, 4, 128)])
def test_forward_parity(shape):
    x = jnp.asarray(RNG.normal(size=shape) * 3 + 1, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fused(x)), np.asarray(reference_impl(x)), atol=1e-5
    )


def test_gradient_parity():
    x = jnp.asarray(RNG.normal(size=(2, 8, 8, 16)), jnp.float32)

    def loss_fused(x):
        return jnp.sum(jnp.sin(fused(x)))

    def loss_ref(x):
        return jnp.sum(jnp.sin(reference_impl(x)))

    g_fused = jax.grad(loss_fused)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-4)


def test_gradient_through_negative_region():
    """LeakyReLU slope must appear in the backward for y<0 elements."""
    x = jnp.asarray(-np.abs(RNG.normal(size=(1, 8, 8, 8))) - 1, jnp.float32)
    g_fused = jax.grad(lambda x: jnp.sum(fused(x) * 2.0))(x)
    g_ref = jax.grad(lambda x: jnp.sum(reference_impl(x) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-4)


def test_bf16_input():
    x = jnp.asarray(RNG.normal(size=(2, 8, 8, 8)), jnp.bfloat16)
    out = fused(x)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(reference_impl(x), dtype=np.float32),
        atol=1e-2,
    )


def test_model_flag_uses_kernel(monkeypatch):
    """use_pallas=True model path produces the same numbers (interpret on CPU)."""
    from latice_tpu.models import ConvBlock

    x = jnp.asarray(RNG.normal(size=(2, 16, 16, 4)), jnp.float32)
    block_ref = ConvBlock(8, use_pallas=False)
    params = block_ref.init(jax.random.key(0), x)

    # interpret mode for the flag path via monkeypatched kernel entry
    import latice_tpu.models.vae as vae_mod
    import latice_tpu.ops as ops_mod

    monkeypatch.setattr(
        ops_mod, "instance_norm_leaky_relu", fused
    )
    block_pal = ConvBlock(8, use_pallas=True)
    out_ref = block_ref.apply(params, x)
    out_pal = block_pal.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref), atol=1e-5)
