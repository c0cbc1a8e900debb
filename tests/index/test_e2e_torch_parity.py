"""Full-plane parity: torch encoder + reference consensus vs latice_tpu.

The north-star claim (BASELINE.json: orientations within 1e-4) is pinned
end to end here: patterns are encoded by the *reference architecture in
torch* and, through converted parameters, by the flax model; the torch
latents flow through a literal numpy/scipy reimplementation of the
reference consensus (faiss_db.py:258-372 incl. the symmetry-equivalent
mapping at :369-392), while the patterns flow through the compiled
IndexPipeline. Mean orientations must agree to 1e-4 degrees.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from scipy.spatial.transform import Rotation as R

import jax

from latice_tpu.crystal.symmetry import CUBIC_SYMMETRY
from latice_tpu.index import IndexPipeline
from latice_tpu.models import VariationalAutoEncoderRawData
from latice_tpu.models.torch_import import torch_state_dict_to_flax

QUAT_SYM = R.from_quat(np.asarray(CUBIC_SYMMETRY))

# Reuse the reference-architecture torch builder from the model parity tests.
_spec = importlib.util.spec_from_file_location(
    "_torch_ref_builder",
    Path(__file__).parents[1] / "models" / "test_torch_import.py",
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
build_reference_torch_model = _mod.build_reference_torch_model


def reference_find_best_orientation(
    query, latents, orientations, top_n, orientation_threshold,
    min_required_matches, max_iterations,
):
    """Literal numpy/scipy port of faiss_db.py:258-372 (exact cosine search +
    iterative consensus + left-applied cubic symmetry equivalents)."""
    d = latents / np.linalg.norm(latents, axis=1, keepdims=True)
    q = query / np.linalg.norm(query)
    scores = d @ q
    indices = np.argsort(-scores)[:top_n]

    cand = orientations[indices]
    rotations = R.from_euler("zxz", cand, degrees=True)
    success, mean_orientation = False, None
    for it in range(min(max_iterations, len(indices))):
        ref_rot = rotations[it]
        mis_deg = np.degrees((ref_rot.inv() * rotations).magnitude())
        similar = np.where(mis_deg < orientation_threshold)[0]
        if len(similar) >= min_required_matches:
            eulers = []
            for idx in similar:
                all_sym = QUAT_SYM * rotations[idx]
                closest = (ref_rot.inv() * all_sym).magnitude().argmin()
                eulers.append(all_sym[closest].as_euler("zxz", degrees=True))
            mean_orientation = (
                R.from_euler("zxz", np.array(eulers), degrees=True)
                .mean()
                .as_euler("zxz", degrees=True)
            )
            success = True
            break
    return success, mean_orientation, indices


@pytest.fixture(scope="module")
def plane():
    """Torch model, converted flax params, clustered dictionary + queries."""
    rng = np.random.default_rng(42)
    inplanes, latent = 8, 16
    tmodel = build_reference_torch_model(inplanes, latent)
    tmodel.eval()
    params = torch_state_dict_to_flax(tmodel.state_dict(), inplanes, latent)
    fmodel = VariationalAutoEncoderRawData(inplanes=inplanes, latent_dim=latent)

    # Dictionary: exactly top_n=20 near-duplicates of a base pattern — 18
    # whose orientations cluster within 0.5 deg of [30, 45, 60], plus 2
    # expressed through a cubic symmetry operator. The reference similarity
    # check uses RAW misorientation (faiss_db.py:306-313 — no symmetry
    # reduction), so the 2 symmetry-equivalent entries must be EXCLUDED from
    # the consensus even though they are the same physical orientation: a
    # quirk both sides must reproduce. 40 random-noise entries fill out the
    # dictionary; the cosine gap to the cluster makes the top-20 set
    # deterministic across the torch/flax encoders.
    base_pat = rng.uniform(size=(128, 128)).astype(np.float32)
    cluster_pats = base_pat + rng.normal(size=(20, 128, 128)).astype(np.float32) * 0.005
    cluster_orients = np.array([30.0, 45.0, 60.0]) + rng.uniform(
        -0.5, 0.5, size=(20, 3)
    )
    sym_op = QUAT_SYM[7]
    for i in range(2):
        rot = R.from_euler("zxz", cluster_orients[i], degrees=True)
        cluster_orients[i] = (sym_op * rot).as_euler("zxz", degrees=True)
    noise_pats = rng.uniform(size=(40, 128, 128)).astype(np.float32)
    noise_orients = rng.uniform([0, 20, 0], [340, 160, 340], size=(40, 3))

    patterns = np.concatenate([cluster_pats, noise_pats])[..., None]
    orientations = np.concatenate([cluster_orients, noise_orients])
    queries = (
        base_pat + rng.normal(size=(6, 128, 128)).astype(np.float32) * 0.01
    )[..., None]

    with torch.no_grad():
        def tencode(x):
            h = tmodel.encoder(torch.from_numpy(np.moveaxis(x, -1, 1)))
            return tmodel.mu(h.flatten(1, -1)).numpy()

        dict_latents_t = tencode(patterns)
        query_latents_t = tencode(queries)

    return {
        "fmodel": fmodel,
        "params": params,
        "patterns": patterns,
        "orientations": orientations,
        "queries": queries,
        "dict_latents_t": dict_latents_t,
        "query_latents_t": query_latents_t,
    }


KW = dict(top_n=20, orientation_threshold=3.0, min_required_matches=18,
          max_iterations=3)


class TestFullPlaneParity:
    def test_mean_orientation_within_north_star(self, plane):
        """flax encode + compiled consensus == torch encode + scipy reference
        consensus, to 1e-4 degrees on the mean orientation."""
        dict_n = plane["dict_latents_t"] / np.linalg.norm(
            plane["dict_latents_t"], axis=1, keepdims=True
        )
        pipeline = IndexPipeline(
            plane["fmodel"], plane["params"], dict_n, plane["orientations"],
            batch_size=8, **KW,
        )
        got = pipeline(plane["queries"])

        for b in range(len(plane["queries"])):
            success, mean, indices = reference_find_best_orientation(
                plane["query_latents_t"][b],
                plane["dict_latents_t"],
                plane["orientations"],
                **KW,
            )
            assert success, "reference consensus must succeed in this setup"
            assert bool(got.success[b])
            # Same candidate set (encoder parity strong enough for ranking).
            assert set(got.indices[b].tolist()) == set(indices.tolist())
            diff = (
                R.from_euler("zxz", got.mean_orientation[b], degrees=True).inv()
                * R.from_euler("zxz", mean, degrees=True)
            ).magnitude()
            assert np.degrees(diff) < 1e-4, (
                f"query {b}: {got.mean_orientation[b]} vs {mean}"
            )

    def test_torch_latents_through_db_match_reference(self, plane, tmp_path):
        """Same torch latents on both sides: TpuLatentVectorDatabase consensus
        must equal the scipy reference implementation (isolates the consensus
        path from encoder tolerance)."""
        from latice_tpu.index import (
            LatentVectorDatabaseConfig,
            TpuLatentVectorDatabase,
        )

        db = TpuLatentVectorDatabase(
            LatentVectorDatabaseConfig(npz_path=str(tmp_path / "t.npz"))
        )
        db.add_vectors(plane["dict_latents_t"], plane["orientations"])
        for b in range(3):
            res = db.find_best_orientation(plane["query_latents_t"][b], **KW)
            success, mean, _ = reference_find_best_orientation(
                plane["query_latents_t"][b],
                plane["dict_latents_t"],
                plane["orientations"],
                **KW,
            )
            assert res.success == success
            diff = (
                R.from_euler("zxz", res.mean_orientation, degrees=True).inv()
                * R.from_euler("zxz", mean, degrees=True)
            ).magnitude()
            assert np.degrees(diff) < 1e-4
