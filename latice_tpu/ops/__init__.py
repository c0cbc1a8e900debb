"""Pallas TPU kernels: opt-in fused fast paths with XLA fallbacks."""

from latice_tpu.ops.fused_norm import instance_norm_leaky_relu
from latice_tpu.ops.topk_fused import cosine_topk_fused

__all__ = ["instance_norm_leaky_relu", "cosine_topk_fused"]
