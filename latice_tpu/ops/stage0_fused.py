"""Pallas TPU megakernel: the VAE encoder's stage 0, fused and VMEM-resident.

Stage 0 — Conv3x3(1->C) -> InstanceNorm -> LeakyReLU -> Conv3x3(C->C) ->
InstanceNorm -> LeakyReLU at full 128x128 resolution (reference
latice/model.py:110-112) — dominates encode time: XLA runs it at HBM roofline
because every op round-trips ~0.5GB of activations per 512-batch. This kernel
keeps one work unit's activations entirely in VMEM and touches HBM once on
the way in (the 1-channel input) and once on the way out.

Design (see also the layout notes in ops/fused_norm.py):
* **4-image lane packing**: four batch samples interleave along the lane
  (channel) axis, giving a lane width of 4*C = 128 — no VMEM lane padding,
  full MXU lanes.
* **convolutions as 9 shifted block-diagonal matmuls**: for each 3x3 tap,
  the spatially shifted activation (H, W, 4C) contracts with a (4C, 4C)
  block-diagonal weight (4 copies of the (C, C) tap matrix), so the per-image
  channel mixing runs on the MXU while images stay independent.
* **instance-norm statistics are lane-local**: with images and channels both
  on lanes, per-(image, channel) means are plain reductions over H
  (leading dim) and W (sublanes) — no cross-lane reshapes.
* f32 matmul accumulation; bf16 staged activations (the precision of the
  bf16-mixed XLA path it replaces).

The kernel emits the pre-pool (H, W, 4C) activations; the 2x2 max-pool runs
in XLA outside (one cheap pass). Forward-only.

Status (v5e, 2026-08, measured): numerically verified but ~13ms vs XLA's
7.3ms at b512. The HBM-traffic savings are real, but two structural costs
dominate: (1) block-diagonal lane packing wastes 4x MXU FLOPs (the (4C,4C)
weight mixes only C channels per image — 26% MXU utilization measured), and
(2) ~40us/grid-step overhead over 128 steps. With C=32 against 128-lane
hardware there is no packing that avoids both, so XLA's conv (65-70% of HBM
roofline) stays the production path. Round 2 generalized the kernel to
pack=2 (C=64, the scaled config) and pack=1 (C=128, zero block-diagonal
waste) and re-measured at b256: C=64 16.7ms vs XLA 7.4ms; C=128 27.8ms vs
XLA 15.2ms — the 9 shifted tap matmuls pipeline worse than XLA's native
conv even with full lane utilization, so the negative result holds at every
width. Kept as verified infrastructure and a worked negative result.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stage0_fused", "pack_weights", "fused_stage0_apply"]

# 3x3 tap offsets, (dy, dx), matching SAME padding of a stride-1 conv.
_OFFSETS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Zero-padded spatial shift of an (H, W, L) value.

    Equivalent to reading input pixel (h+dy, w+dx) for output pixel (h, w):
    the value moves by (-dy, -dx). H is the (untiled) leading dim; W shifts
    are sublane rolls with edge masking.
    """
    h, w, _ = x.shape
    out = x
    if dy:
        out = jnp.roll(out, -dy, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
        valid = (rows < h - dy) if dy > 0 else (rows >= -dy)
        out = jnp.where(valid, out, 0.0)
    if dx:
        out = jnp.roll(out, -dx, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
        valid = (cols < w - dx) if dx > 0 else (cols >= -dx)
        out = jnp.where(valid, out, 0.0)
    return out


def _instance_norm_lrelu(
    acc: jax.Array, eps: float, slope: float
) -> jax.Array:
    """Per-lane instance norm + LeakyReLU on an (H, W, L) f32 value."""
    n = acc.shape[0] * acc.shape[1]
    mean = jnp.sum(acc, axis=(0, 1), keepdims=True) / n
    ex2 = jnp.sum(acc * acc, axis=(0, 1), keepdims=True) / n
    var = jnp.maximum(ex2 - mean * mean, 0.0)
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    return jnp.where(y >= 0, y, slope * y)


def _kernel(
    x_ref,  # (1, H, W, P)    packed input images, f32
    w1_ref,  # (9, 8, P*C)     conv1 taps, block-diagonal (rows padded P->8)
    b1_ref,  # (8, P*C)        conv1 bias, lane-packed (row 0 live)
    w2_ref,  # (9, P*C, P*C)   conv2 taps, block-diagonal
    b2_ref,  # (8, P*C)
    out_ref,  # (1, H, W, P*C)  pre-pool stage-0 output, bf16
    *,
    eps: float,
    slope: float,
    pack: int,
):
    # bf16 operands keep the MXU on its native path (f32 operand matmuls
    # decompose and run several times slower on v5e); accumulation stays f32
    # via preferred_element_type.
    x = x_ref[0].astype(jnp.bfloat16)  # (H, W, P)
    h, w, _ = x.shape
    lanes = out_ref.shape[-1]

    # conv1: 9 shifted (HW, P) @ (P, P*C) matmuls, f32 accumulation.
    acc = jnp.zeros((h, w, lanes), jnp.float32)
    for k, (dy, dx) in enumerate(_OFFSETS):
        xs = _shift2d(x, dy, dx)
        acc = acc + jax.lax.dot_general(
            xs,
            w1_ref[k, :pack, :].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc + b1_ref[0, :].astype(jnp.float32)
    y1 = _instance_norm_lrelu(acc, eps, slope).astype(jnp.bfloat16)

    # conv2: 9 shifted (HW, P*C) @ (P*C, P*C) matmuls.
    acc2 = jnp.zeros((h, w, lanes), jnp.float32)
    for k, (dy, dx) in enumerate(_OFFSETS):
        ys = _shift2d(y1, dy, dx)
        acc2 = acc2 + jax.lax.dot_general(
            ys,
            w2_ref[k].astype(jnp.bfloat16),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc2 = acc2 + b2_ref[0, :].astype(jnp.float32)
    out_ref[0] = _instance_norm_lrelu(acc2, eps, slope).astype(out_ref.dtype)


def pack_weights(
    w1: np.ndarray, b1: np.ndarray, w2: np.ndarray, b2: np.ndarray, pack: int = 4
):
    """Pack HWIO conv kernels into the kernel's block-diagonal layout.

    Args:
        w1: (3, 3, 1, C) conv1 kernel; b1: (C,).
        w2: (3, 3, C, C) conv2 kernel; b2: (C,).
        pack: images per lane group.

    Returns:
        (w1bd (9, 8, pack*C), b1p (8, pack*C), w2bd (9, pack*C, pack*C),
        b2p (8, pack*C)) as float32 numpy arrays.
    """
    c = w1.shape[-1]
    lanes = pack * c
    w1bd = np.zeros((9, 8, lanes), np.float32)
    w2bd = np.zeros((9, lanes, lanes), np.float32)
    for k, (dy, dx) in enumerate(_OFFSETS):
        tap1 = np.asarray(w1[dy + 1, dx + 1, 0, :], np.float32)  # (C,)
        tap2 = np.asarray(w2[dy + 1, dx + 1], np.float32)  # (C, C)
        for i in range(pack):
            w1bd[k, i, i * c : (i + 1) * c] = tap1
            w2bd[k, i * c : (i + 1) * c, i * c : (i + 1) * c] = tap2
    b1p = np.zeros((8, lanes), np.float32)
    b2p = np.zeros((8, lanes), np.float32)
    b1p[0] = np.tile(np.asarray(b1, np.float32), pack)
    b2p[0] = np.tile(np.asarray(b2, np.float32), pack)
    return w1bd, b1p, w2bd, b2p


@functools.partial(
    jax.jit, static_argnames=("eps", "slope", "interpret", "pack")
)
def stage0_fused(
    x: jax.Array,
    w1bd: jax.Array,
    b1p: jax.Array,
    w2bd: jax.Array,
    b2p: jax.Array,
    eps: float = 1e-5,
    slope: float = 0.02,
    interpret: bool = False,
    pack: int = 4,
) -> jax.Array:
    """Fused stage-0 over a batch of single-channel images.

    Args:
        x: (B, H, W, 1) float32/bfloat16 patterns; B must divide by ``pack``.
        w1bd/b1p/w2bd/b2p: packed weights from `pack_weights` (same ``pack``).
        pack: images interleaved per lane group; pick 128 // C so the lane
            width P*C fills the hardware's 128 lanes (4 for C=32, 2 for C=64,
            1 for C=128 — where the block-diagonal MXU waste vanishes).

    Returns:
        (B, H/2, W/2, C) bfloat16 — stage-0 output after the 2x2 max-pool
        (pool applied in XLA on the kernel's pre-pool activations).
    """
    b, h, w, _ = x.shape
    lanes = w2bd.shape[-1]
    c = lanes // pack
    if b % pack:
        raise ValueError(f"batch {b} must divide by the lane pack of {pack}")
    groups = b // pack
    # (B, H, W, 1) -> (groups, H, W, pack): image index into lanes.
    xg = jnp.transpose(x.reshape(groups, pack, h, w), (0, 2, 3, 1))

    full_in = pl.BlockSpec(
        (1, h, w, pack), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    full_out = pl.BlockSpec(
        (1, h, w, lanes), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    y2 = pl.pallas_call(
        functools.partial(_kernel, eps=eps, slope=slope, pack=pack),
        grid=(groups,),
        in_specs=[
            full_in,
            const((9, 8, lanes)),
            const((8, lanes)),
            const((9, lanes, lanes)),
            const((8, lanes)),
        ],
        out_specs=full_out,
        out_shape=jax.ShapeDtypeStruct((groups, h, w, lanes), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(xg, w1bd, b1p, w2bd, b2p)

    # 2x2 max-pool in XLA, then unpack lanes back to the batch axis.
    y2 = y2.reshape(groups, h // 2, 2, w // 2, 2, lanes).max(axis=(2, 4))
    y2 = y2.reshape(groups, h // 2, w // 2, pack, c)
    return jnp.transpose(y2, (0, 3, 1, 2, 4)).reshape(b, h // 2, w // 2, c)


def fused_stage0_apply(
    params: dict, x: jax.Array, interpret: bool = False, pack: int = 4
) -> jax.Array:
    """Run fused stage 0 from a VAE encoder params subtree.

    ``params`` is ``model_params["encoder"]`` holding ``stage0_block0/conv``
    and ``stage0_block1/conv`` kernels/biases.
    """
    w1 = np.asarray(params["stage0_block0"]["conv"]["kernel"])
    b1 = np.asarray(params["stage0_block0"]["conv"]["bias"])
    w2 = np.asarray(params["stage0_block1"]["conv"]["kernel"])
    b2 = np.asarray(params["stage0_block1"]["conv"]["bias"])
    packed = [jnp.asarray(a) for a in pack_weights(w1, b1, w2, b2, pack=pack)]
    return stage0_fused(x, *packed, interpret=interpret, pack=pack)
