"""TPU-native convolutional Variational Autoencoder for EBSD patterns.

Ground-up Flax re-design of the reference architecture
(latice/model.py:83-150 `VariationalAutoEncoderRawData`):

* encoder: 5 stages of [2x (Conv3x3 -> InstanceNorm -> LeakyReLU(0.02)) ->
  MaxPool2], channels 1 -> P -> 2P -> 4P -> 4P -> 4P (P = inplanes),
  128x128 -> 4x4 spatial (model.py:109-125);
* latent heads: Dense(4P*16 -> latent_dim) for mu and logvar (model.py:127-129);
* decoder: Dense(latent -> 4P*16), then 5 stages of [nearest-upsample x2 ->
  2x (ConvTranspose3x3 -> InstanceNorm -> LeakyReLU)] with the final stage
  ending in a plain Conv to 1 channel and **no output sigmoid**
  (model.py:133-150 — the loss is BCE-with-logits);
* reparameterization z = mu + std * eps with an explicit PRNG key
  (model.py:25-38, made functional).

TPU-first choices (not translations):
* NHWC layout throughout — XLA's native conv layout on TPU;
* configurable compute dtype (bfloat16 for the MXU) with float32 params and
  float32 normalization statistics — the "16-mixed" analogue
  (reference conf/train.yaml:14);
* everything is a pure function of (params, inputs, rng): jit/pjit/vmap-safe.
"""

from __future__ import annotations

import os
from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "InstanceNorm",
    "ConvBlock",
    "ConvTransposeBlock",
    "Encoder",
    "Decoder",
    "VariationalAutoEncoderRawData",
    "VAEOutput",
]

Dtype = Any


class InstanceNorm(nn.Module):
    """Instance normalization over spatial axes, torch-default semantics.

    Matches ``torch.nn.InstanceNorm2d(C)`` defaults (affine=False,
    track_running_stats=False, eps=1e-5) used at latice/model.py:96,105:
    per-sample, per-channel normalization by biased variance over (H, W).
    Statistics are computed in float32 regardless of compute dtype.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from latice_tpu.ops.lane_stats import spatial_moments

        x32 = x.astype(jnp.float32)
        # One-pass E[x]/E[x^2] statistics (ops/lane_stats.py): both
        # reductions fuse into the producer, avoiding jnp.var's second
        # full read of the activation.
        mean, ex2 = spatial_moments(x32)
        var = jnp.maximum(ex2 - mean * mean, 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y.astype(self.dtype)


class ConvBlock(nn.Module):
    """Conv3x3(stride 1, SAME) -> InstanceNorm -> LeakyReLU(0.02).

    The encoder building block (latice/model.py:93-98). The conv+norm+act
    sequence is deliberately one module so an optional fused Pallas kernel can
    swap in behind the same interface.
    """

    features: int
    negative_slope: float = 0.02
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            self.features,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        return _norm_act(x, self.negative_slope, self.dtype, self.use_pallas)


def _norm_act(
    x: jax.Array, negative_slope: float, dtype, use_pallas: bool
) -> jax.Array:
    """InstanceNorm + LeakyReLU — analytic-VJP XLA form by default.

    The default path is ops.norm_vjp.instance_norm_leaky_relu_xla: identical
    forward numerics, closed-form backward (two reductions + one elementwise
    pass instead of autodiff's longer mean/var chain) — +4.6% train-step
    throughput at the flagship config. ``LATICE_TPU_NORM_VJP=0`` restores the
    plain autodiff composition; ``use_pallas`` selects the Pallas kernel.
    """
    if use_pallas or os.environ.get("LATICE_TPU_PALLAS_NORM") == "1":
        from latice_tpu.ops import instance_norm_leaky_relu

        return instance_norm_leaky_relu(x, 1e-5, negative_slope)
    if os.environ.get("LATICE_TPU_NORM_VJP") != "0":
        from latice_tpu.ops.norm_vjp import instance_norm_leaky_relu_xla

        return instance_norm_leaky_relu_xla(x, 1e-5, negative_slope)
    x = InstanceNorm(dtype=dtype)(x)
    return nn.leaky_relu(x, negative_slope)


class ConvTransposeBlock(nn.Module):
    """ConvTranspose3x3(stride 1, SAME) -> InstanceNorm -> LeakyReLU(0.02).

    The decoder building block (latice/model.py:100-107). At stride 1 a
    transposed conv is a conv with a flipped kernel, so spatial size is
    preserved exactly like torch ConvTranspose2d(3, 1, 1).
    """

    features: int
    negative_slope: float = 0.02
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    # Fold a preceding nearest-2x upsample into this block's conv as one
    # dilated convolution (same params; see _FusedUpsampleConvTranspose).
    pre_upsample: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.pre_upsample:
            x = _FusedUpsampleConvTranspose(
                self.features,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
        else:
            x = nn.ConvTranspose(
                self.features,
                kernel_size=(3, 3),
                strides=(1, 1),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="conv",
            )(x)
        return _norm_act(x, self.negative_slope, self.dtype, self.use_pallas)


def _upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x spatial upsample for NHWC tensors.

    Equivalent to torch ``nn.UpsamplingNearest2d(scale_factor=2)``
    (latice/model.py:134), expressed as pure repeats so XLA lowers it to a
    cheap broadcast-reshape with no gather.
    """
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class _FusedUpsampleConvTranspose(nn.Module):
    """Nearest-2x upsample + ConvTranspose3x3(stride 1) as ONE dilated conv.

    ``conv3x3(U_nearest(x)) == conv(Z(x), K3 (*) ones(2,2))`` where ``Z``
    is zero-insertion upsampling: nearest duplication is zero-insertion
    followed by a 2x2 ones correlation, so the two kernels compose into a
    single 4x4 kernel applied with ``lhs_dilation=(2, 2)`` — the
    materialized 4x-size intermediate (and its backward reduce) disappears
    and XLA's phase-decomposed dilated conv does 2.25x fewer multiplies.
    Parameter names/shapes are identical to the unfused
    ``nn.ConvTranspose(name="conv")`` (3x3 HWIO + bias), so checkpoints are
    interchangeable.
    """

    features: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_features, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )
        # flax ConvTranspose(stride 1, SAME) correlates with the kernel
        # as stored — no spatial flip (pinned against the unfused block by
        # tests/models/test_fused_upsample.py).
        # K4[e, f] = sum_{s,t in {0,1}} K[e-s, f-t]: the 3x3 kernel
        # correlated with the 2x2 ones window, in f32 before cast.
        kp = jnp.pad(
            kernel.astype(jnp.float32), ((0, 1), (0, 1), (0, 0), (0, 0))
        )
        k4 = (
            kp
            + jnp.roll(kp, 1, axis=0)
            + jnp.roll(kp, 1, axis=1)
            + jnp.roll(jnp.roll(kp, 1, axis=0), 1, axis=1)
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k4.astype(self.dtype),
            window_strides=(1, 1),
            padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class Encoder(nn.Module):
    """N-stage conv encoder (default 5: 128x128x1 -> 4x4x(4*inplanes),
    model.py:109-125). Channel plan P, 2P, then 4P for every further stage —
    extra stages (n_stages > 5) extend the 4P tail for deeper/scaled variants
    (BASELINE "deeper conv stack" config).

    ``remat`` trades recompute FLOPs for backward HBM traffic (the train-step
    bottleneck — it is bandwidth-bound, not MXU-bound): "stage" checkpoints
    each conv-conv-pool stage so the backward pass holds only stage inputs
    (4x fewer saved activation bytes), "block" checkpoints per conv block.
    Parameter names are unchanged by either mode.
    """

    inplanes: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    n_stages: int = 5
    remat: str = "none"  # "none" | "block" | "stage"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.inplanes
        widths = [p, 2 * p] + [4 * p] * (self.n_stages - 2)
        stage_channels = [(w, w) for w in widths]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_pallas=self.use_pallas)
        block_cls = nn.remat(ConvBlock) if self.remat == "block" else ConvBlock

        def stage(enc, x, i, c1, c2):
            x = block_cls(c1, name=f"stage{i}_block0", **kw)(x)
            x = block_cls(c2, name=f"stage{i}_block1", **kw)(x)
            return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))

        if self.remat == "stage":
            stage = nn.remat(stage, static_argnums=(2, 3, 4))
        for i, (c1, c2) in enumerate(stage_channels):
            x = stage(self, x, i, c1, c2)
        return x


class Decoder(nn.Module):
    """5-stage upsampling decoder: 4x4x(4*inplanes) -> 128x128x1, no sigmoid.

    Mirrors latice/model.py:133-150; the final layer is a plain Conv to one
    channel (model.py:148) and the sigmoid is intentionally absent
    (model.py:149) because the loss consumes logits.
    """

    inplanes: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    n_stages: int = 5
    remat: str = "none"  # "none" | "block" | "stage" (see Encoder)
    # Fold each nearest-2x upsample into the following conv as one dilated
    # conv (same params/checkpoints; values equal to f32 roundoff; measured
    # +14% train steps/s at the b256 flagship on v5e). Default ON;
    # LATICE_TPU_FUSED_UPSAMPLE=0 restores the materialized-upsample path.
    fuse_upsample: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.inplanes
        env = os.environ.get("LATICE_TPU_FUSED_UPSAMPLE")
        fuse = self.fuse_upsample if env is None else env == "1"
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype, use_pallas=self.use_pallas)
        block_cls = (
            nn.remat(ConvTransposeBlock)
            if self.remat == "block"
            else ConvTransposeBlock
        )
        # (out-channel plan per stage; last stage ends with the logit conv).
        # Mirrors the encoder widths in reverse; n_stages > 5 extends the
        # leading 4P stages.
        stages = [(4 * p, 4 * p)] * (self.n_stages - 3) + [
            (4 * p, 2 * p),
            (2 * p, p),
        ]

        def stage(dec, x, i, c1, c2):
            if fuse:
                x = block_cls(c1, name=f"stage{i}_block0", pre_upsample=True, **kw)(x)
            else:
                x = _upsample_nearest_2x(x)
                x = block_cls(c1, name=f"stage{i}_block0", **kw)(x)
            x = block_cls(c2, name=f"stage{i}_block1", **kw)(x)
            return x

        if self.remat == "stage":
            stage = nn.remat(stage, static_argnums=(2, 3, 4))
        for i, (c1, c2) in enumerate(stages):
            x = stage(self, x, i, c1, c2)
        if fuse:
            x = block_cls(
                p, name=f"stage{self.n_stages - 1}_block0",
                pre_upsample=True, **kw,
            )(x)
        else:
            x = _upsample_nearest_2x(x)
            x = block_cls(p, name=f"stage{self.n_stages - 1}_block0", **kw)(x)
        x = nn.Conv(
            1,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="logit_conv",
        )(x)
        return x


class VAEOutput(NamedTuple):
    """(z, x_hat, mu, std) — the reference forward contract (model.py:40-66).

    A NamedTuple so it is a native JAX pytree: jit/vmap/grad flow through it.
    """

    z: jax.Array
    x_hat: jax.Array
    mu: jax.Array
    std: jax.Array


class VariationalAutoEncoderRawData(nn.Module):
    """Convolutional VAE over raw EBSD patterns (NHWC).

    Public surface mirrors the reference class of the same name
    (latice/model.py:83): construction with ``(inplanes, latent_dim)`` and a
    forward returning ``(z, x_hat, mu, std)`` — but as a pure Flax module with
    explicit PRNG for the reparameterization sample.
    """

    inplanes: int = 32
    latent_dim: int = 16
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_pallas: bool = False
    n_stages: int = 5
    bottleneck_hw: int = 4  # spatial size after the encoder (image / 2^n_stages)
    remat: str = "none"  # backward rematerialization: "none" | "block" | "stage"

    def setup(self) -> None:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(
            self.inplanes, use_pallas=self.use_pallas, n_stages=self.n_stages,
            remat=self.remat, **kw
        )
        self.mu_head = nn.Dense(self.latent_dim, name="mu", **kw)
        self.logvar_head = nn.Dense(self.latent_dim, name="logvar", **kw)
        bottleneck = self.inplanes * 4 * self.bottleneck_hw * self.bottleneck_hw
        self.linear2 = nn.Dense(bottleneck, name="linear2", **kw)
        self.decoder = Decoder(
            self.inplanes, use_pallas=self.use_pallas, n_stages=self.n_stages,
            remat=self.remat, **kw
        )

    def encode(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Return (mu, logvar) in float32. x: (B, H, W, 1) NHWC."""
        h = self.encoder(x)
        flat = h.reshape((h.shape[0], -1))
        mu = self.mu_head(flat).astype(jnp.float32)
        logvar = self.logvar_head(flat).astype(jnp.float32)
        return mu, logvar

    def decode(self, z: jax.Array) -> jax.Array:
        """Reconstruction logits from latent codes. z: (B, latent_dim)."""
        h = self.linear2(z.astype(self.dtype))
        hw = self.bottleneck_hw
        h = h.reshape((h.shape[0], hw, hw, 4 * self.inplanes))
        return self.decoder(h)

    def reparameterize(
        self, rng: jax.Array, mu: jax.Array, logvar: jax.Array
    ) -> jax.Array:
        """z = mu + std * eps, the rsample of model.py:25-38 with explicit key."""
        std = jnp.exp(logvar / 2.0)
        eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
        return mu + std * eps

    def __call__(self, x: jax.Array, rng: jax.Array) -> VAEOutput:
        """Forward pass: returns (z, x_hat, mu, std) like model.py:40-66."""
        mu, logvar = self.encode(x)
        std = jnp.exp(logvar / 2.0)
        z = self.reparameterize(rng, mu, logvar)
        x_hat = self.decode(z)
        return VAEOutput(z, x_hat, mu, std)
