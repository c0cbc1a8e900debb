"""End-to-end demo: train a VAE, build a dictionary, index patterns.

Script form of the reference's demo notebooks (notebook/index.ipynb and
notebook/index_faiss.ipynb): load/train a model, build the latent dictionary,
then time single-pattern and batch indexing — here against both compatibility
backends and the fused production pipeline.

Run (synthetic data, small model — finishes in a few minutes on CPU):
    python examples/end_to_end_demo.py --workdir /tmp/latice_demo
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def make_synthetic_dictionary(workdir: Path, n_groups=50, per_group=5, seed=7):
    """Simulated 'dictionary': groups of near-identical patterns sharing an
    orientation cluster (stand-in for the reference's simulated EBSD bank)."""
    rng = np.random.default_rng(seed)
    patterns, angles = [], []
    for _ in range(n_groups):
        base = rng.uniform(size=(128, 128))
        base_angle = rng.uniform([0, 20, 0], [340, 140, 340])
        for _ in range(per_group):
            patterns.append(base + rng.normal(size=(128, 128)) * 0.01)
            angles.append(base_angle + rng.uniform(-0.4, 0.4, 3))
    patterns, angles = np.asarray(patterns), np.asarray(angles)
    np.save(workdir / "dict_patterns.npy", patterns)
    (workdir / "dict_angles.txt").write_text(
        "eu\n%d\n" % len(angles)
        + "".join(f"{a[0]} {a[1]} {a[2]}\n" for a in angles)
    )
    return patterns, angles


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", default="/tmp/latice_demo")
    parser.add_argument("--inplanes", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=1)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from latice_tpu.data import DPDataModule
    from latice_tpu.index import (
        DiffractionPatternIndexer,
        IndexerConfig,
        IndexPipeline,
    )
    from latice_tpu.index.faiss_db import (
        FaissLatentVectorDatabase,
        FaissLatentVectorDatabaseConfig,
    )
    from latice_tpu.models import VariationalAutoEncoderRawData
    from latice_tpu.train.module import VAEModule
    from latice_tpu.train.trainer import Trainer
    from latice_tpu.utils import PhaseTimer

    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    patterns, angles = make_synthetic_dictionary(workdir)
    timer = PhaseTimer()

    # 1. Train (the notebooks load vae-best.pt; we train briefly instead).
    print(f"== training ({args.epochs} epoch, inplanes={args.inplanes}) ==")
    dm = DPDataModule(
        workdir / "dict_patterns.npy", workdir / "dict_angles.txt", batch_size=25
    )
    module = VAEModule(
        VariationalAutoEncoderRawData(inplanes=args.inplanes, latent_dim=16),
        kl_lambda=5e-6,
    )
    trainer = Trainer(
        max_epochs=args.epochs,
        precision="32" if args.cpu else "16-mixed",
        checkpoint_dir=workdir / "checkpoints",
        logger=None,
        recon_figure=False,
    )
    with timer.phase("train"):
        state = trainer.fit(module, dm)
    print(f"   final loss: {trainer.history[-1]['Epoch_train_loss']:.5f}")

    # 2. Build the dictionary database (index.ipynb cells 5-7).
    print("== building dictionary ==")
    db = FaissLatentVectorDatabase(
        FaissLatentVectorDatabaseConfig(npz_path=str(workdir / "index.npz"))
    )
    indexer = DiffractionPatternIndexer(
        trainer_model := module.model,
        state.params,
        db=db,
        config=IndexerConfig(
            pattern_path=workdir / "dict_patterns.npy",
            angles_path=workdir / "dict_angles.txt",
            batch_size=25,
        ),
    )
    with timer.phase("build_dictionary"):
        indexer.build_dictionary(progress=False)
    print(f"   {db.get_count()} vectors")

    # 3. Single-pattern indexing with timing (index.ipynb cell 9).
    query = patterns[0]
    result = indexer.index_pattern(query, top_n=5)  # warm compile
    with timer.phase("index_single"):
        result = indexer.db.find_best_orientation(
            indexer.encode_pattern(query), top_n=5, orientation_threshold=3.0,
            min_required_matches=4,
        )
    print(f"   success={result.success} mean={np.round(result.mean_orientation, 2)}"
          f" truth={np.round(angles[0], 2)}")

    # 4. Batch indexing through the fused pipeline (index.ipynb cell 13 ++).
    print("== fused batch indexing ==")
    pipe = IndexPipeline(
        module.model, state.params, db._vectors, db._orientations,
        top_n=5, orientation_threshold=3.0, min_required_matches=4,
        batch_size=125,
    )
    pipe(patterns[:125])  # warm
    t0 = time.time()
    dense = pipe(patterns)
    dt = time.time() - t0
    print(f"   {len(patterns)} patterns in {dt*1e3:.0f} ms "
          f"({len(patterns)/dt:,.0f}/s), success {dense.success.mean():.0%}")

    print("== phase timing ==")
    for key, value in sorted(timer.report().items()):
        print(f"   {key}: {value:.4g}")


if __name__ == "__main__":
    main()
