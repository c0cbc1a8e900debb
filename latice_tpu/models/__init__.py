"""Neural network models (Flax, NHWC, mixed-precision-ready)."""

from latice_tpu.models.vae import (
    ConvBlock,
    ConvTransposeBlock,
    Decoder,
    Encoder,
    InstanceNorm,
    VAEOutput,
    VariationalAutoEncoderRawData,
)

__all__ = [
    "ConvBlock",
    "ConvTransposeBlock",
    "Decoder",
    "Encoder",
    "InstanceNorm",
    "VAEOutput",
    "VariationalAutoEncoderRawData",
]
