"""One-pass InstanceNorm statistics that stay fused into the producer conv.

Profiling the fused encode on v5e (round 3; per-op numbers in ROADMAP
"Measured") showed the model is not conv-bound: XLA fuses the conv with the
*mean* reduction (one multi-output ``convert_reduce_fusion`` per layer), but
``jnp.var``'s ``E[(x - mean)^2]`` needs the mean first, so every
InstanceNorm paid a SECOND full HBM read of its activation — ~2.5 ms of the
12.3 ms b512 encode across the 10 encoder norms (reference
latice/model.py:93-107 applies IN after every conv).

The fix: compute ``E[x]`` and ``E[x^2]`` together in one pass and form
``var = E[x^2] - E[x]^2``. Both reductions share the producer, so XLA emits
one fusion per layer — conv + both stats — and the second read disappears.
Verified from the trace: the post-change program shows
``(f32[B,C], f32[B,C], bf16[...])`` triple-output conv fusions and no
standalone reduce passes.

A lane-packed variant (reshaping the contiguous activation to ``(B,
H*W*C/128, 128)`` rows so C<128 reductions use all VPU lanes) was measured
and REJECTED: the reshape between conv and reduce broke the producer
fusion, XLA materialized float32 activations (2x bytes), and encode
regressed 12.3 -> 19.6 ms. Keeping the native layout and riding the conv's
output stream beats optimizing the reduction in isolation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["spatial_moments"]


def spatial_moments(x32: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(sample, channel) spatial mean and E[x^2] of NHWC input, each
    shaped (B, 1, 1, C), computed in one pass over the data.

    Callers form ``var = max(E[x^2] - mean^2, 0)`` — the one-pass variance.
    Compared to ``jnp.var`` the summation avoids re-reading the activation;
    the algebraic form loses ~half a digit to cancellation only when
    ``|mean| >> std``, which post-conv activations don't exhibit (pinned by
    tests/ops/test_norm_vjp.py parity tolerances).
    """
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    ex2 = jnp.mean(x32 * x32, axis=(1, 2), keepdims=True)
    return mean, ex2
