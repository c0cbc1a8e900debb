"""Analytic-backward InstanceNorm + LeakyReLU in plain XLA.

The model applies InstanceNorm then LeakyReLU after every conv — 20 times per
forward (reference latice/model.py:93-107). Reverse-mode autodiff of the
mean/var/rsqrt composition produces a longer HBM-pass chain in the backward
program than the closed form

    y   = (x - mean) * rstd            (saved: y in compute dtype, rstd)
    g_y = g * lrelu'(y)
    dx  = rstd * (g_y - mean(g_y) - y * mean(g_y * y))

which needs two fused reductions and one elementwise pass. This is the same
math as the Pallas kernel in fused_norm.py, but expressed as ordinary XLA ops
so the compiler schedules/fuses it (the Pallas forward loses to XLA here; the
*backward shape* is what autodiff gets wrong). Forward semantics match the
unfused path — f32 statistics, biased variance, eps inside rsqrt — with the
statistics reductions laid out at full lane width (ops/lane_stats.py), which
reorders the f32 summation (values agree to roundoff; bitwise at bf16).

Measured (v5e, b256 128x128 flagship, bf16): full train step 43.6 -> 41.7 ms
(+4.6% steps/s), identical forward numerics, loss trajectory matching the
autodiff path to ~1e-5. The step's remaining cost is structural: the C=32/64
early-stage convs pad their channel dims onto the 128-lane MXU (25-50%
utilization), which neither remat (measured slower: 50-55 ms), a
comparison-mask maxpool backward (slower: select_and_scatter wins), nor the
Pallas packing kernel (round 1: 4x FLOP waste) beats at this width — see
ROADMAP.md "train-step roofline".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["instance_norm_leaky_relu_xla"]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def instance_norm_leaky_relu_xla(
    x: jax.Array, eps: float = 1e-5, negative_slope: float = 0.02
) -> jax.Array:
    """InstanceNorm(affine=False, torch defaults) + LeakyReLU over NHWC.

    Numerically equal to ``InstanceNorm()(x)`` then ``leaky_relu`` (the
    composition at latice_tpu.models.vae._norm_act); only the backward
    program differs (analytic, fewer HBM passes).
    """
    out, _ = _fwd(x, eps, negative_slope)
    return out


def _fwd(x, eps, negative_slope):
    from latice_tpu.ops.lane_stats import spatial_moments

    x32 = x.astype(jnp.float32)
    # One-pass statistics (see ops/lane_stats.py): jnp.var's two-pass form
    # cost a second full HBM read of every activation (~2.5 ms/encode at
    # b512); E[x] and E[x^2] together stay fused into the producer conv.
    mean, ex2 = spatial_moments(x32)
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = ((x32 - mean) * rstd).astype(x.dtype)
    out = jnp.where(y >= 0, y, negative_slope * y)
    # Residuals: y (compute dtype — half the bytes of an f32 save) + rstd.
    return out, (y, rstd)


def _bwd(eps, negative_slope, res, g):
    y, rstd = res
    y32 = y.astype(jnp.float32)
    g_y = jnp.where(y32 >= 0, 1.0, negative_slope) * g.astype(jnp.float32)
    mean_g = jnp.mean(g_y, axis=(1, 2), keepdims=True)
    mean_gy = jnp.mean(g_y * y32, axis=(1, 2), keepdims=True)
    dx = rstd * (g_y - mean_g - y32 * mean_gy)
    return (dx.astype(y.dtype),)


instance_norm_leaky_relu_xla.defvjp(_fwd, _bwd)
