"""Vectorized, jit-compiled orientation consensus.

Reimplements the reference's iterate-until-enough-matches consensus loop
(faiss_db.py:258-372 / chroma_db.py:261-342) as a single fixed-shape XLA
program over a whole *batch* of queries at once — replacing the sequential
per-vector Python loop (faiss_db.py:395-434, chroma_db.py:377-410) that SURVEY
§3.3 flags as the prime vectorization target.

Algorithm (per query, all in parallel):
1. For each of the first ``max_iterations`` candidates as reference:
   misorientation of every candidate to that reference (faiss_db.py:304-308).
2. An iteration "succeeds" when >= ``min_required_matches`` candidates fall
   inside ``orientation_threshold`` (faiss_db.py:315). The chosen reference is
   the *first* succeeding iteration — data-dependent break replaced by a
   masked argmax over a static unroll.
3. For the chosen reference: snap every in-threshold candidate to its nearest
   cubic-symmetry equivalent (faiss_db.py:317-323), then take the chordal
   quaternion mean (faiss_db.py:326-330).

Unit quirk: the FAISS backend thresholds in **degrees** (faiss_db.py:308), the
chroma backend in **radians** (chroma_db.py:307-310, codified by the golden
test's `orientation_threshold=0.3  # Radians`). ``angle_unit`` selects which.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from latice_tpu.crystal import (
    cubic_symmetry_quats,
    from_euler_zxz_deg,
    misorientation_angle,
    nearest_symmetry_equivalent,
    quat_mean,
    to_euler_zxz_deg,
)

__all__ = ["ConsensusOutput", "consensus_orientations", "consensus_from_euler"]


class ConsensusOutput(NamedTuple):
    """Batch consensus results (all arrays have leading batch dim B).

    Attributes:
        mean_euler: ``(B, 3)`` consensus mean orientation, zxz degrees (valid
            only where ``success``).
        success: ``(B,)`` bool — consensus found within ``max_iterations``.
        similar_mask: ``(B, K)`` bool — candidates within threshold of the
            chosen reference (the last-tried reference when unsuccessful,
            matching faiss_db.py:311-313 which reports the final iteration's
            indices).
        chosen_iter: ``(B,)`` int32 — index of the succeeding reference
            candidate (0 when unsuccessful).
        misorientation_deg: ``(B, K)`` misorientation (degrees) of every
            candidate to the chosen reference.
    """

    mean_euler: jax.Array
    success: jax.Array
    similar_mask: jax.Array
    chosen_iter: jax.Array
    misorientation_deg: jax.Array
    # (B,) int32 phase of the chosen reference (multi-phase dictionaries
    # only; all-zeros for the single-phase path).
    phase: jax.Array | None = None


@partial(
    jax.jit,
    static_argnames=("min_required_matches", "max_iterations", "angle_unit"),
)
def consensus_orientations(
    cand_quats: jax.Array,
    orientation_threshold: float | jax.Array,
    min_required_matches: int = 18,
    max_iterations: int = 3,
    angle_unit: str = "deg",
    cand_phases: jax.Array | None = None,
    sym_tables: jax.Array | None = None,
    cand_weights: jax.Array | None = None,
) -> ConsensusOutput:
    """Run the consensus algorithm on candidate orientations.

    Args:
        cand_quats: ``(B, K, 4)`` scalar-first unit quaternions of the top-K
            candidates per query, best-first (search order).
        orientation_threshold: Misorientation threshold, in ``angle_unit``.
        min_required_matches: Minimum in-threshold candidates for success
            (faiss_db.py:263 default 18).
        max_iterations: How many leading candidates to try as reference
            (faiss_db.py:264 default 3). Clamped to K like faiss_db.py:302.
        angle_unit: "deg" (FAISS semantics) or "rad" (chroma semantics).
        cand_phases: Optional ``(B, K)`` int32 phase id per candidate
            (multi-phase dictionaries, BASELINE config 5). Candidates of a
            different phase than the trial reference never count as similar,
            and the symmetry snap uses the chosen reference's phase group.
        sym_tables: Optional ``(P, S, 4)`` stacked per-phase symmetry tables
            (`crystal.stack_symmetry_tables`). Defaults to cubic for every
            phase when ``cand_phases`` is given without tables.
        cand_weights: Optional ``(B, K)`` nonnegative per-candidate weights
            (e.g. powered cosine similarities). The consensus mean becomes a
            *weighted* quaternion mean over the in-threshold candidates —
            sub-grid orientation refinement beyond the reference's uniform
            mean (faiss_db.py:326-330). Success/threshold logic is unchanged.

    Returns:
        ConsensusOutput batch.
    """
    if angle_unit not in ("deg", "rad"):
        raise ValueError(f"angle_unit must be 'deg' or 'rad', got {angle_unit!r}")
    b, k, _ = cand_quats.shape
    iters = min(max_iterations, k)

    refs = cand_quats[:, :iters, :]  # (B, I, 4)
    # (B, I, K): misorientation of every candidate to every trial reference.
    mis_rad = misorientation_angle(refs[:, :, None, :], cand_quats[:, None, :, :])
    mis_cmp = jnp.rad2deg(mis_rad) if angle_unit == "deg" else mis_rad

    within = mis_cmp < orientation_threshold  # (B, I, K)
    if cand_phases is not None:
        ref_phases = cand_phases[:, :iters]  # (B, I)
        within = within & (ref_phases[:, :, None] == cand_phases[:, None, :])
    counts = within.sum(axis=-1)  # (B, I)
    ok = counts >= min_required_matches  # (B, I)

    success = jnp.any(ok, axis=-1)  # (B,)
    first_ok = jnp.argmax(ok, axis=-1).astype(jnp.int32)  # first True, else 0
    # Unsuccessful queries report the *last* iteration's mask, matching the
    # reference loop which leaves similar_indices from its final pass.
    chosen = jnp.where(success, first_ok, iters - 1)

    # One-hot selection over the (small) iteration axis — batched
    # take_along_axis gathers lower poorly on TPU.
    sel = jax.nn.one_hot(chosen, iters, dtype=cand_quats.dtype)  # (B, I)
    similar_mask = jnp.einsum("bi,bik->bk", sel, within.astype(sel.dtype)) > 0.5
    mis_chosen_rad = jnp.einsum("bi,bik->bk", sel, mis_rad)
    ref_chosen = jnp.einsum("bi,biq->bq", sel, refs)  # (B, 4)

    # Symmetry-snap every candidate to the chosen reference, then masked mean.
    phase = None
    if cand_phases is not None:
        # Phase of the chosen reference, selected with the same one-hot.
        phase = jnp.einsum(
            "bi,bi->b", sel, ref_phases.astype(sel.dtype)
        ).astype(jnp.int32)
        if sym_tables is None:
            sym = cubic_symmetry_quats(dtype=cand_quats.dtype)
        else:
            # Per-query table of the chosen phase, (B, 1, S, 4) so it
            # broadcasts against (B, K, 1, 4) candidates inside the snap.
            p = sym_tables.shape[0]
            ph_sel = jax.nn.one_hot(phase, p, dtype=cand_quats.dtype)
            sym = jnp.einsum(
                "bp,psq->bsq", ph_sel, sym_tables.astype(cand_quats.dtype)
            )[:, None]
    else:
        sym = cubic_symmetry_quats(dtype=cand_quats.dtype)
    sym_eq = nearest_symmetry_equivalent(
        ref_chosen[:, None, :], cand_quats, sym
    )  # (B, K, 4)
    mean_w = similar_mask.astype(cand_quats.dtype)
    if cand_weights is not None:
        w = mean_w * cand_weights.astype(cand_quats.dtype)
        # Renormalize by the per-row max of the MASKED weights so the largest
        # surviving weight is exactly 1 — tiny-but-nonzero rows (possible on
        # non-flush backends at extreme powers) would otherwise degrade
        # quat_mean's power iteration. Rows that underflowed to exactly zero
        # fall back to the uniform mask.
        wmax = jnp.max(w, axis=-1, keepdims=True)
        w_norm = w / jnp.where(wmax > 0, wmax, 1.0)
        mean_w = jnp.where(wmax > 0, w_norm, mean_w)
    mean_quat = quat_mean(sym_eq, mean_w)
    mean_euler = to_euler_zxz_deg(mean_quat)

    return ConsensusOutput(
        mean_euler=mean_euler,
        success=success,
        similar_mask=similar_mask,
        chosen_iter=jnp.where(success, first_ok, jnp.zeros_like(first_ok)),
        misorientation_deg=jnp.rad2deg(mis_chosen_rad),
        phase=phase,
    )


def consensus_from_euler(
    cand_euler_deg: jax.Array,
    orientation_threshold: float,
    min_required_matches: int = 18,
    max_iterations: int = 3,
    angle_unit: str = "deg",
) -> ConsensusOutput:
    """Convenience wrapper taking ``(B, K, 3)`` zxz Euler degrees."""
    return consensus_orientations(
        from_euler_zxz_deg(cand_euler_deg),
        orientation_threshold,
        min_required_matches=min_required_matches,
        max_iterations=max_iterations,
        angle_unit=angle_unit,
    )
