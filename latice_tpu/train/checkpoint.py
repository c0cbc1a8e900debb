"""Checkpoint management: top-k on a monitored metric + always-keep-last.

The orbax-backed equivalent of the reference's ModelCheckpoint callback
(conf/trainer/default.yaml:9-15: save_top_k=5 on Epoch_val_loss, save_last)
plus torch.load-style consumption for inference (README.md:90-93). Layout:

    <directory>/epoch_<N>/   orbax PyTree checkpoint of the TrainState params
    <directory>/last/        copy of the most recent epoch
    <directory>/manifest.json   {epoch: metric} bookkeeping
"""

from __future__ import annotations

import json
import logging
import shutil
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

__all__ = ["CheckpointManager", "save_params", "load_params"]


def save_params(path: str | Path, params: Any) -> None:
    """Save a parameter pytree to an orbax checkpoint directory."""
    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params)


def load_params(path: str | Path, abstract_params: Any | None = None) -> Any:
    """Restore a parameter pytree (optionally against an abstract target)."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if abstract_params is not None:
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, abstract_params
            )
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


class CheckpointManager:
    """Keep the best ``save_top_k`` epochs by a monitored metric, plus last."""

    def __init__(
        self,
        directory: str | Path,
        save_top_k: int = 5,
        monitor: str = "Epoch_val_loss",
        mode: str = "min",
        save_last: bool = True,
    ) -> None:
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.save_top_k = save_top_k
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self._manifest: dict[str, float] = {}
        manifest_path = self.directory / "manifest.json"
        if manifest_path.exists():
            self._manifest = json.loads(manifest_path.read_text())

    def _epoch_dir(self, epoch: int) -> Path:
        return self.directory / f"epoch_{epoch}"

    def save(
        self,
        epoch: int,
        params: Any,
        metrics: dict[str, float],
        full_state: Any | None = None,
    ) -> None:
        """Persist this epoch's params; prune to the top-k by the monitor.

        When ``full_state`` (a TrainState) is given, its serializable parts
        (params, optimizer state, step) are also written to ``last_state`` so
        training can resume mid-run with optimizer moments intact — the
        Lightning-checkpoint analogue (SURVEY §5 checkpoint/resume).
        """
        metric = float(metrics.get(self.monitor, float("inf")))
        save_params(self._epoch_dir(epoch), params)
        self._manifest[str(epoch)] = metric
        self._last_epoch = epoch

        if self.save_last:
            last = self.directory / "last"
            if last.exists():
                shutil.rmtree(last)
            shutil.copytree(self._epoch_dir(epoch), last)
        if full_state is not None:
            save_params(
                self.directory / "last_state",
                {
                    "params": full_state.params,
                    "opt_state": full_state.opt_state,
                    "step": full_state.step,
                },
            )
            (self.directory / "last_epoch.json").write_text(json.dumps(epoch))

        # Prune beyond top-k (never the one just written — it's also "last").
        if self.save_top_k >= 0:
            sign = 1.0 if self.mode == "min" else -1.0
            ranked = sorted(self._manifest.items(), key=lambda kv: sign * kv[1])
            for key, _ in ranked[self.save_top_k :]:
                if int(key) == epoch:
                    continue
                victim = self._epoch_dir(int(key))
                if victim.exists():
                    shutil.rmtree(victim)
                del self._manifest[key]

        (self.directory / "manifest.json").write_text(json.dumps(self._manifest))

    def best_epoch(self) -> int | None:
        if not self._manifest:
            return None
        sign = 1.0 if self.mode == "min" else -1.0
        return int(min(self._manifest.items(), key=lambda kv: sign * kv[1])[0])

    def best_path(self) -> Path | None:
        epoch = self.best_epoch()
        return None if epoch is None else self._epoch_dir(epoch)

    def load_best(self, abstract_params: Any | None = None) -> Any:
        path = self.best_path()
        if path is None or not path.exists():
            raise FileNotFoundError(f"No checkpoints under {self.directory}")
        return load_params(path, abstract_params)

    def load_last(self, abstract_params: Any | None = None) -> Any:
        last = self.directory / "last"
        if not last.exists():
            raise FileNotFoundError(f"No 'last' checkpoint under {self.directory}")
        return load_params(last, abstract_params)

    def last_epoch(self) -> int:
        path = self.directory / "last_epoch.json"
        if not path.exists():
            raise FileNotFoundError(f"No resume metadata under {self.directory}")
        return int(json.loads(path.read_text()))

    def load_last_state(self, template_state: Any) -> Any:
        """Restore a full TrainState (params + optimizer moments + step).

        ``template_state`` provides the tree structure and the
        non-serializable members (apply_fn, tx).
        """
        path = self.directory / "last_state"
        if not path.exists():
            raise FileNotFoundError(f"No 'last_state' checkpoint under {self.directory}")
        restored = load_params(
            path,
            {
                "params": template_state.params,
                "opt_state": template_state.opt_state,
                "step": template_state.step,
            },
        )
        return template_state.replace(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
