"""Pattern preprocessing as vectorized array ops.

Replaces the reference's per-sample PIL transform pipeline
(latice/data_module.py:17-33: ToPILImage -> Grayscale -> CenterCrop ->
ToTensor) with whole-stack numpy/JAX ops: on TPU the right design is to
preprocess the entire pattern stack once (or fuse the transform into the
jitted encode), not to round-trip every image through PIL objects in loader
workers.

Semantics preserved:
* grayscale: inputs are single-channel already; a trailing RGB axis is reduced
  with the ITU-R 601 luma weights PIL uses for ``Grayscale()``;
* center crop to ``image_size`` (torchvision CenterCrop coordinates);
* dtype: unsigned-integer inputs are scaled by their dtype max — 1/255 for
  uint8 like ``ToTensor``, 1/65535 for uint16 vendor detectors; signed
  integers keep the legacy 1/255 (see ``_int_scale``); float inputs pass
  through unscaled, matching ToTensor's behavior on float (mode "F") images
  — the path reference data actually takes (data_module.py:132 casts to
  float64 before the transform).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "to_grayscale",
    "center_crop",
    "default_transform",
    "create_default_transform",
    "prepare_patterns",
]

_LUMA = np.asarray([0.299, 0.587, 0.114], dtype=np.float32)


def to_grayscale(patterns: np.ndarray) -> np.ndarray:
    """Reduce a trailing RGB channel axis if present; pass through otherwise."""
    if patterns.ndim >= 3 and patterns.shape[-1] == 3:
        return patterns.astype(np.float32) @ _LUMA
    return patterns


def center_crop(patterns: np.ndarray, image_size: tuple[int, int]) -> np.ndarray:
    """Center-crop the trailing (H, W) axes to ``image_size``.

    Uses torchvision CenterCrop's exact coordinates — ``int(round(margin/2))``
    with Python's round-half-to-even, so odd margins congruent to 3 mod 4
    (e.g. 131->128) shift the window up/left by one like torchvision does —
    and, like it, zero-pads when the target exceeds the input.
    """
    th, tw = int(image_size[0]), int(image_size[1])
    h, w = patterns.shape[-2], patterns.shape[-1]
    if th > h or tw > w:
        ph, pw = max(th - h, 0), max(tw - w, 0)
        pad = [(0, 0)] * (patterns.ndim - 2)
        pad += [(ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)]
        patterns = np.pad(patterns, pad)
        h, w = patterns.shape[-2], patterns.shape[-1]
    top = int(round((h - th) / 2.0))
    left = int(round((w - tw) / 2.0))
    top, left = max(top, 0), max(left, 0)
    return patterns[..., top : top + th, left : left + tw]


def default_transform(
    patterns: np.ndarray, image_size: tuple[int, int] = (128, 128)
) -> np.ndarray:
    """Full default pipeline over a pattern or stack: gray, crop, float32, scale.

    Accepts ``(H, W)``, ``(N, H, W)`` or ``(..., H, W, 3)`` arrays; returns
    float32 with a trailing channel axis of 1 (NHWC-ready).
    """
    x = np.asarray(patterns)
    scale = _int_scale(x.dtype)  # from the ORIGINAL dtype: to_grayscale
    x = to_grayscale(x)          # promotes integer RGB to float32 luma
    x = center_crop(x, image_size).astype(np.float32) * scale
    return x[..., None]


def _int_scale(dtype) -> np.float32:
    """[0, 1] normalization factor by dtype.

    Unsigned integers scale by their dtype max (1/255 for the reference's
    uint8 ToTensor case, 1/65535 for uint16 vendor detectors). Signed
    integers keep the legacy 1/255: plain-Python-int arrays (np.save of int
    lists -> int64) almost always hold 8-bit pattern data, and 1/2^63 would
    silently zero them. Floats pass through unscaled (ToTensor semantics).
    """
    if np.issubdtype(dtype, np.unsignedinteger):
        return np.float32(1.0 / np.iinfo(dtype).max)
    if np.issubdtype(dtype, np.integer):
        return np.float32(1.0 / 255.0)
    return np.float32(1.0)


def prepare_patterns(
    patterns: np.ndarray, image_size: tuple[int, int] = (128, 128)
) -> np.ndarray:
    """Normalize a query stack to ``(N, H, W)`` preserving the uint8 fast path.

    uint8 inputs stay uint8 (center-crop is a pure slice) so they ride the
    pipeline's device-side /255 path with 4x less host-link traffic; other
    integer dtypes (e.g. uint16 vendor detectors) normalize by their dtype
    max on host; floats pass through unscaled (ToTensor semantics). Accepts
    ``(H, W)``, ``(N, H, W)``, ``(N, H, W, 1)`` or RGB ``(N, H, W, 3)``.
    """
    x = np.asarray(patterns)
    if x.ndim == 2:
        x = x[None]
    if x.ndim == 4 and x.shape[-1] == 3:
        # Luma reduction promotes to float32; scale by the ORIGINAL integer
        # dtype's max first so e.g. uint8 RGB still lands in [0, 1].
        x = to_grayscale(x.astype(np.float32) * _int_scale(x.dtype))
    if x.ndim == 4 and x.shape[-1] == 1:
        x = x[..., 0]
    if x.ndim != 3:
        raise ValueError(f"expected (N, H, W[, 1|3]) patterns, got {x.shape}")
    if x.dtype == np.uint8:
        if x.shape[1:] != tuple(image_size):
            x = center_crop(x, image_size)  # pure slice: uint8 survives
        return x
    if np.issubdtype(x.dtype, np.integer):
        # Non-uint8 integers have no device-side fast path: normalize by the
        # dtype max here so the model sees [0, 1] regardless of bit depth.
        x = x.astype(np.float32) * _int_scale(x.dtype)
    if x.shape[1:] != tuple(image_size):
        x = default_transform(x, image_size)[..., 0]
    return np.ascontiguousarray(x, dtype=np.float32)


def create_default_transform(image_size: tuple[int, int]):
    """Factory matching the reference name (data_module.py:17-33)."""

    def transform(patterns: np.ndarray) -> np.ndarray:
        return default_transform(patterns, image_size)

    return transform
