"""Indexing diagnostics: pseudo-symmetry / candidate-ambiguity detection.

Dictionary indexing fails *quietly* when a material has near-degenerate
solutions — pseudo-symmetric variants (tetragonal c/a ≈ 1, hexagonal
c/a near ideal), overlapping phases, or simply two grains whose patterns
the encoder cannot separate. The classic symptom: the top-k candidate
list splits into two orientation clusters with near-tied scores, and the
winner flips pixel to pixel (speckle in the map).

`candidate_ambiguity` quantifies this per pixel from a `DenseIndexResult`:
the highest-scored *rival* candidate — one whose symmetry-reduced
disorientation from the top-1 exceeds ``min_separation_deg`` (so grid
neighbors of the same solution don't count), or one assigned to a
different phase — and the score gap to it. A small gap means the latent
search considered a genuinely different orientation almost as good:
flag it, re-rank with `query --refine-candidates` (physics breaks the
tie), or collect the flagged pixels for a denoising/augmented retrain.

The hot path is one jitted program per chunk: candidate quaternions,
disorientations against every phase's symmetry table (computed for all
tables and one-hot-combined — gathering rows of a small table per query
is the TPU landmine), masked first-rival selection. No reference
counterpart (the reference reports only the consensus result,
chroma_db.py:334-342).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from latice_tpu.crystal import (
    from_euler_zxz_deg,
    stack_symmetry_tables,
    symmetry_reduced_misorientation,
)

__all__ = ["AmbiguityResult", "candidate_ambiguity"]


class AmbiguityResult(NamedTuple):
    """Per-query ambiguity diagnostic.

    Attributes:
        angle_deg: disorientation (degrees, top-1's point group) to the
            best rival candidate; NaN when no rival is in the top-k.
        score_gap: cosine-score margin ``score[0] - score[rival]``; NaN
            when no rival. Small gap = ambiguous pixel.
        has_rival: whether any rival appeared in the top-k.
    """

    angle_deg: np.ndarray
    score_gap: np.ndarray
    has_rival: np.ndarray

    def ambiguous(self, max_gap: float = 0.02) -> np.ndarray:
        """Boolean mask: a rival exists within ``max_gap`` of the top score."""
        return self.has_rival & (np.nan_to_num(self.score_gap, nan=np.inf) <= max_gap)


@functools.partial(jax.jit, static_argnames=("min_sep_deg",))
def _rival_chunk(cand_e, scores, tables, top_phase, cand_phase, min_sep_deg):
    """(B, K) candidates → (angle_deg, gap, has) for one chunk."""
    b, k = scores.shape
    cand_q = from_euler_zxz_deg(cand_e.reshape(-1, 3)).reshape(b, k, 4)
    top_q = cand_q[:, 0, :]
    # Disorientation fields for EVERY phase table, then one-hot select by
    # the top-1 candidate's phase (P is tiny; per-query table gathers are
    # the slow path on TPU).
    dis_all = jax.vmap(
        lambda sym: symmetry_reduced_misorientation(
            top_q[:, None, :], cand_q, sym=sym
        )
    )(tables)  # (P, B, K) radians
    one_hot = jax.nn.one_hot(top_phase, tables.shape[0], dtype=dis_all.dtype)
    dis = jnp.rad2deg(jnp.einsum("pbk,bp->bk", dis_all, one_hot))
    rival = (dis > min_sep_deg) | (cand_phase != top_phase[:, None])
    rival = rival.at[:, 0].set(False)  # top-1 is never its own rival
    has = jnp.any(rival, axis=1)
    first = jnp.argmax(rival, axis=1)  # first True: highest-scored rival
    rows = jnp.arange(b)
    angle = jnp.where(has, dis[rows, first], jnp.nan)
    gap = jnp.where(has, scores[:, 0] - scores[rows, first], jnp.nan)
    return angle, gap, has


def candidate_ambiguity(
    result,
    dictionary_angles: np.ndarray,
    group: str = "432",
    phase_groups: list[str] | None = None,
    dictionary_phases: np.ndarray | None = None,
    min_separation_deg: float = 3.0,
    chunk: int = 8192,
) -> AmbiguityResult:
    """Pseudo-symmetry / ambiguity diagnostic over a `DenseIndexResult`.

    Args:
        result: `DenseIndexResult` (needs ``indices`` and ``scores``; uses
            ``phase`` when present).
        dictionary_angles: ``(N, 3)`` dictionary Euler angles (degrees) the
            result's indices point into (``db._orientations``).
        group: point group for single-phase dictionaries.
        phase_groups: per-phase point groups (multi-phase dictionaries).
        dictionary_phases: ``(N,)`` per-entry phase ids (multi-phase).
        min_separation_deg: disorientation below which two candidates count
            as the *same* solution (grid neighbors), not rivals.
        chunk: queries per device dispatch (bounds the (chunk, K, S)
            intermediate).

    Returns:
        `AmbiguityResult` of host arrays, one entry per query.
    """
    idx = np.asarray(result.indices)
    scores = np.asarray(result.scores, np.float32)
    b, k = idx.shape
    if k < 2:
        raise ValueError("ambiguity needs top_n >= 2 candidates")
    angles = np.asarray(dictionary_angles, np.float32)
    cand_e = angles[idx]  # (B, K, 3) host gather
    groups = list(phase_groups) if phase_groups else [group]
    tables = stack_symmetry_tables(groups)
    if dictionary_phases is not None:
        cand_ph = np.asarray(dictionary_phases, np.int32)[idx]
    else:
        cand_ph = np.zeros((b, k), np.int32)
    top_ph = cand_ph[:, 0]

    out_a = np.empty(b, np.float32)
    out_g = np.empty(b, np.float32)
    out_h = np.empty(b, bool)
    for start in range(0, b, chunk):
        ce = cand_e[start : start + chunk]
        sc = scores[start : start + chunk]
        cp = cand_ph[start : start + chunk]
        n = len(ce)
        if n < chunk:  # pad to the static compile shape
            pad = chunk - n
            ce = np.concatenate([ce, np.tile(ce[-1:], (pad, 1, 1))])
            sc = np.concatenate([sc, np.tile(sc[-1:], (pad, 1))])
            cp = np.concatenate([cp, np.tile(cp[-1:], (pad, 1))])
        a, g, h = _rival_chunk(
            jnp.asarray(ce), jnp.asarray(sc), tables,
            jnp.asarray(cp[:, 0]), jnp.asarray(cp),
            float(min_separation_deg),
        )
        out_a[start : start + n] = np.asarray(a)[:n]
        out_g[start : start + n] = np.asarray(g)[:n]
        out_h[start : start + n] = np.asarray(h)[:n]
    return AmbiguityResult(out_a, out_g, out_h)
