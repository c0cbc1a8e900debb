"""Training CLI — the Hydra-style entry point.

Behavioral rebuild of the reference's train.py (train.py:59-113): composes the
``conf/`` tree, seeds, creates save/checkpoint directories, instantiates
trainer / data module / training module from ``_target_`` configs, and runs
the fit loop. Overrides use the same ``key=value`` syntax; ``--multirun``
expands comma-separated values into a sweep (README.md:54-67).

Usage:
    python train.py                                # defaults
    python train.py trainer.max_epochs=5 seed=1    # overrides
    python train.py -m lightning_module.optimizer_partial.learning_rate=1e-4,5e-4
"""

from __future__ import annotations

import argparse
import logging
import os
import random
from pathlib import Path

import numpy as np

from latice_tpu.config import expand_sweeps, load_config, maybe_instantiate

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def set_random_seeds(seed: int) -> None:
    """Seed the host RNGs (train.py:46-56 analogue; device randomness is
    keyed explicitly from the trainer seed)."""
    np.random.seed(seed)
    random.seed(seed)


def train(config: dict):
    """Train a model from a composed config (reference train.py:59-98)."""
    if config.get("seed") is not None:
        set_random_seeds(int(config["seed"]))

    trainer_cfg = dict(config["trainer"])
    logger_cfg = trainer_cfg.pop("logger", {}) or {}
    save_dir = Path(logger_cfg.get("save_dir", "lightning_logs"))
    try:
        os.makedirs(save_dir, exist_ok=True)
        (save_dir / "checkpoints").mkdir(parents=True, exist_ok=True)
    except (PermissionError, FileNotFoundError) as e:
        logger.error(f"Failed to create directories: {e}")
        raise

    from latice_tpu.data import DPDataModule
    from latice_tpu.train.module import VAEModule
    from latice_tpu.train.trainer import Trainer
    from latice_tpu.utils.loggers import make_default_logger

    # Accepted-for-parity keys that the JAX trainer does not take verbatim.
    trainer_cfg.pop("accelerator", None)
    devices = trainer_cfg.pop("devices", "auto")
    trainer_cfg.pop("callbacks", None)
    trainer_cfg.pop("_target_", None)
    # Nested _target_ values (e.g. trainer=robust's AugmentConfig) are built
    # recursively; the flat kwargs path above bypasses instantiate().
    if trainer_cfg.get("augment") is not None:
        trainer_cfg["augment"] = maybe_instantiate(trainer_cfg["augment"])

    # devices=N (N>1) -> data-parallel mesh over the first N chips.
    mesh = None
    if devices not in ("auto", None, 1, "1"):
        from latice_tpu.parallel import make_mesh

        mesh = make_mesh(int(devices))
        logger.info(f"Data-parallel training over mesh: {mesh}")
    exp_logger = make_default_logger(
        save_dir,
        tensorboard=bool(logger_cfg.get("tensorboard", True)),
        wandb=bool(logger_cfg.get("wandb", False)),
        project=str(logger_cfg.get("project", "VAE_Training")),
    )
    seed = int(config.get("seed") or 0)

    logger.info("Instantiating trainer <latice_tpu.train.trainer.Trainer>")
    trainer = Trainer(logger=exp_logger, seed=seed, mesh=mesh, **trainer_cfg)

    logger.info(f"Instantiating datamodule <{config['data_module']['_target_']}>")
    datamodule = maybe_instantiate(config["data_module"], DPDataModule)

    logger.info(
        f"Instantiating module <{config['lightning_module']['_target_']}>"
    )
    module = maybe_instantiate(config["lightning_module"], VAEModule)

    state = trainer.fit(module, datamodule)
    return trainer, state


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "-m", "--multirun", action="store_true", help="expand comma sweeps"
    )
    parser.add_argument("--config-path", default="conf")
    parser.add_argument("--config-name", default="train.yaml")
    parser.add_argument("overrides", nargs="*", help="key=value overrides")
    args = parser.parse_args()

    runs = expand_sweeps(args.overrides) if args.multirun else [args.overrides]
    for i, overrides in enumerate(runs):
        if len(runs) > 1:
            logger.info(f"=== multirun job {i}: {overrides} ===")
        config = load_config(args.config_path, args.config_name, overrides)
        try:
            train(config)
        except Exception as e:
            logger.exception(f"Training failed: {e}")
            raise


if __name__ == "__main__":
    main()
