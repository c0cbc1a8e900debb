"""Pallas TPU kernel: fused InstanceNorm + LeakyReLU.

The encoder/decoder inner loop applies InstanceNorm then LeakyReLU after
every conv (reference latice/model.py:93-107) — 19 times per forward. XLA
lowers each as a reduce pass plus an elementwise pass over HBM; this kernel
does statistics, normalization and activation in a single VMEM-resident pass
per batch tile, with a custom VJP (also one fused kernel) so the training
path can use it.

Layout strategy: the model's NHWC maps have C in {32..128}, and a C-lane
block pads to 128 lanes in VMEM (4x memory waste at C=32, which OOMs the
16MB VMEM budget). The kernel therefore views the array as ``(B, H, W*C)`` —
a free reshape — so the lane dimension is W*C (always a multiple of 128
here), and recovers per-channel statistics by reducing H on the big tensor
and then folding the small ``(W*C,)`` row to ``(W, C)``.

Opt-in via ``ConvBlock(..., use_pallas=True)`` or the
``LATICE_TPU_PALLAS_NORM=1`` environment variable; the plain-XLA
implementation stays the default and the numerical reference.

Status (v5e, 2026-08): XLA already runs this memory-bound op at ~70% of HBM
roofline (7.5ms vs this kernel's 17.8ms at (512,128,128,32) f32), so the
kernel is OFF by default — it exists as verified infrastructure for fusing
further epilogues (quantization, residuals) where XLA cannot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["instance_norm_leaky_relu"]


def _fold_matrix(wc: int, c: int) -> jax.Array:
    """(W*C, C) 0/1 matrix with M[i, i % C] = 1.

    Mosaic cannot reshape the lane dimension into 2-D vectors, so channel
    folding/broadcast runs as MXU matmuls with this selector instead:
    ``row @ M`` sums each channel's W lanes; ``stat @ M.T`` tiles per-channel
    stats back across the W*C lane row.
    """
    i = jax.lax.broadcasted_iota(jnp.int32, (wc, c), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (wc, c), 1)
    return ((i % c) == j).astype(jnp.float32)


def _per_channel_mean(big: jax.Array, fold: jax.Array, n: float) -> jax.Array:
    """Reduce a (bt, H, W*C) tensor to per-channel means (bt, C)."""
    row = jnp.sum(big, axis=1)  # (bt, W*C) — the only large reduction
    return jnp.dot(row, fold, preferred_element_type=jnp.float32) / n


def _tile_channels(stat: jax.Array, fold: jax.Array) -> jax.Array:
    """Broadcast (bt, C) per-channel stats to a (bt, 1, W*C) row."""
    return jnp.dot(stat, fold.T, preferred_element_type=jnp.float32)[:, None, :]


def _fwd_kernel(x_ref, out_ref, mean_ref, rstd_ref, *, eps, slope, w, c):
    """One (batch-tile, H, W*C) block: stats + normalize + LeakyReLU."""
    x = x_ref[...].astype(jnp.float32)  # (bt, H, W*C)
    n = x.shape[1] * w
    fold = _fold_matrix(x.shape[2], c)
    mean_c = _per_channel_mean(x, fold, n)  # (bt, C)
    ex2_c = _per_channel_mean(x * x, fold, n)
    var_c = jnp.maximum(ex2_c - mean_c * mean_c, 0.0)
    rstd_c = jax.lax.rsqrt(var_c + eps)
    mean = _tile_channels(mean_c, fold)  # (bt, 1, W*C)
    rstd = _tile_channels(rstd_c, fold)
    y = (x - mean) * rstd
    out_ref[...] = jnp.where(y >= 0, y, slope * y).astype(out_ref.dtype)
    # Stats padded to an 8-row block (TPU sublane minimum for small outputs).
    bt = x.shape[0]
    mean_ref[...] = jnp.broadcast_to(mean_c[:, None, :], (bt, 8, c)).astype(
        mean_ref.dtype
    )
    rstd_ref[...] = jnp.broadcast_to(rstd_c[:, None, :], (bt, 8, c)).astype(
        rstd_ref.dtype
    )


def _bwd_kernel(x_ref, mean_ref, rstd_ref, g_ref, dx_ref, *, slope, w, c):
    """Fused backward: LeakyReLU grad + instance-norm grad in one pass.

    With y = (x - mean) * rstd and o = lrelu(y):
        g_y = g * lrelu'(y)
        dx  = rstd * (g_y - mean(g_y) - y * mean(g_y * y))
    """
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    n = x.shape[1] * w
    fold = _fold_matrix(x.shape[2], c)
    mean = _tile_channels(mean_ref[:, 0, :].astype(jnp.float32), fold)
    rstd = _tile_channels(rstd_ref[:, 0, :].astype(jnp.float32), fold)
    y = (x - mean) * rstd
    g_y = jnp.where(y >= 0, g, slope * g)
    mean_g = _tile_channels(_per_channel_mean(g_y, fold, n), fold)
    mean_gy = _tile_channels(_per_channel_mean(g_y * y, fold, n), fold)
    dx_ref[...] = (rstd * (g_y - mean_g - y * mean_gy)).astype(dx_ref.dtype)


def _batch_tile(b: int, h: int, wc: int, n_bufs: int) -> int:
    """Batch tile sized to ~6MB of VMEM across n_bufs full f32 blocks
    (double-buffered by the pipeline)."""
    bytes_per_item = h * wc * 4 * n_bufs * 2
    tile = max(1, (6 * 1024 * 1024) // bytes_per_item)
    while b % tile:
        tile -= 1
    return tile


def _specs(b, h, wc, c, b_tile):
    grid = (b // b_tile,)
    full = pl.BlockSpec(
        (b_tile, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    stat = pl.BlockSpec(
        (b_tile, 8, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return grid, full, stat


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def instance_norm_leaky_relu(
    x: jax.Array,
    eps: float = 1e-5,
    negative_slope: float = 0.02,
    interpret: bool = False,
) -> jax.Array:
    """Fused InstanceNorm(affine=False) + LeakyReLU over NHWC tensors.

    Numerically equivalent to the composition used by the model blocks
    (latice_tpu.models.vae.InstanceNorm + nn.leaky_relu), torch-default
    semantics (eps=1e-5, biased variance, slope 0.02 — model.py:96-97).
    """
    out, _ = _fwd(x, eps, negative_slope, interpret)
    return out


def _fwd(x, eps, negative_slope, interpret):
    b, h, w, c = x.shape
    x2 = x.reshape(b, h, w * c)
    b_tile = _batch_tile(b, h, w * c, n_bufs=2)
    grid, full, stat = _specs(b, h, w * c, c, b_tile)
    out, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, slope=negative_slope, w=w, c=c),
        grid=grid,
        in_specs=[full],
        out_specs=(full, stat, stat),
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, c), jnp.float32),
        ),
        interpret=interpret,
    )(x2)
    return out.reshape(x.shape), (x2, mean, rstd)


def _fwd_rule(x, eps, negative_slope, interpret):
    return _fwd(x, eps, negative_slope, interpret)


def _bwd_rule(eps, negative_slope, interpret, res, g):
    x2, mean, rstd = res
    b, h, wc = x2.shape
    c = mean.shape[2]
    w = wc // c
    b_tile = _batch_tile(b, h, wc, n_bufs=3)
    grid, full, stat = _specs(b, h, wc, c, b_tile)
    g2 = g.reshape(b, h, wc).astype(x2.dtype)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, slope=negative_slope, w=w, c=c),
        grid=grid,
        in_specs=[full, stat, stat, full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        input_output_aliases={3: 0},  # reuse g's buffer for dx
        interpret=interpret,
    )(x2, mean, rstd, g2)
    return (dx.reshape(g.shape),)


instance_norm_leaky_relu.defvjp(_fwd_rule, _bwd_rule)
