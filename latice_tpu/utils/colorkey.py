"""IPF (inverse pole figure) color key generation — vectorized.

Rebuild of the reference's per-vector ColorKeyGenerator
(latice/utils/colorkey.py:21-130) as batch numpy ops: all 48 symmetry images
(24 rotations x inversion) of every zone axis are generated at once and the
first equivalent inside the standard cubic unit triangle
(eta in [0, 45deg], chi in [0, acos(1/sqrt(3))]) is selected in the same
iteration order the reference uses, so colors match exactly.
"""

from __future__ import annotations

from math import acos

import numpy as np
from numpy.typing import NDArray

from latice_tpu.crystal.symmetry import (
    K_180_OVER_PI,
    PI_OVER_180,
    SQRT3_INV,
    USE_INVERSION,
    apply_symmetry_to_axes,
)

__all__ = ["ColorKeyGenerator"]

_CHI_MAX_RAD = acos(SQRT3_INV)
_ETA_MAX_RAD = 45.0 * PI_OVER_180


class ColorKeyGenerator:
    """Maps crystallographic directions to IPF RGB colors (cubic system)."""

    @staticmethod
    def in_unit_triangle(eta: float = 0, chi: float = 0) -> bool:
        """True when (eta, chi) radians lie in the standard unit triangle
        (reference colorkey.py:30-42)."""
        return not (eta < 0 or eta > _ETA_MAX_RAD or chi < 0 or chi > _CHI_MAX_RAD)

    @staticmethod
    def drgb(a: int = 0, r: int | list[int] = 0, g: int = 0, b: int = 0) -> int:
        """Pack ARGB into a 32-bit int (reference colorkey.py:45-62)."""
        if isinstance(r, list) and len(r) == 3:
            g = int(round(r[1]))
            b = int(round(r[2]))
            r = int(round(r[0]))
        return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)

    def generate_ipf_color(self, zone_axis: NDArray | list[float]) -> list[int]:
        """IPF color of one direction as [r, g, b] in 0-255
        (reference colorkey.py:64-130)."""
        rgb = self.generate_ipf_colors(np.asarray(zone_axis, dtype=np.float64)[None])
        return [int(v) for v in rgb[0]]

    def generate_ipf_colors(self, zone_axes: NDArray) -> NDArray[np.int64]:
        """Vectorized IPF colors for ``(N, 3)`` directions -> ``(N, 3)`` uint8-range ints."""
        axes = np.asarray(zone_axes, dtype=np.float64)
        axes = axes / np.linalg.norm(axes, axis=-1, keepdims=True)

        # (N, 24, 3) rotational images, then append the inverted set -> (N, 48, 3)
        sym_axes = apply_symmetry_to_axes(axes)
        cands = np.concatenate([sym_axes, -sym_axes], axis=1)

        # Reference behavior: z<0 candidates are inverted in place when
        # USE_INVERSION, else skipped (colorkey.py:92-96).
        neg_z = cands[..., 2] < 0
        if USE_INVERSION:
            cands = np.where(neg_z[..., None], -cands, cands)
            usable = np.ones(cands.shape[:2], dtype=bool)
        else:
            usable = ~neg_z

        z = np.clip(cands[..., 2], -1.0, 1.0)
        chi = np.arccos(z)
        eta = np.arctan2(cands[..., 1], cands[..., 0])
        in_tri = (
            usable
            & (eta >= 0)
            & (eta <= _ETA_MAX_RAD)
            & (chi >= 0)
            & (chi <= _CHI_MAX_RAD)
        )

        # First in-triangle candidate in reference iteration order; fall back
        # to the last candidate when none qualify (reference keeps whatever
        # eta/chi the loop ended with, colorkey.py:105-108).
        any_found = in_tri.any(axis=1)
        first = np.where(any_found, in_tri.argmax(axis=1), cands.shape[1] - 1)
        rows = np.arange(len(axes))
        chi_sel = chi[rows, first]
        eta_sel = eta[rows, first]

        chi_max_deg = _CHI_MAX_RAD * K_180_OVER_PI
        eta_deg = eta_sel * K_180_OVER_PI
        chi_deg = chi_sel * K_180_OVER_PI

        r = 1.0 - chi_deg / chi_max_deg
        b = np.abs(eta_deg) / 45.0
        g = (1.0 - b) * (chi_deg / chi_max_deg)
        b = b * (chi_deg / chi_max_deg)

        rgb = np.sqrt(np.stack([r, g, b], axis=-1))  # gamma correction
        rgb = rgb / rgb.max(axis=-1, keepdims=True)
        return np.round(255 * rgb).astype(np.int64)
