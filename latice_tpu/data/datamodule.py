"""Data module: seeded splits and device-feeding batch iterators.

Replaces `DPDataModule` (reference: latice/data_module.py:136-261). Instead of
multi-process DataLoader workers with pinned-memory copies, the whole
(preprocessed) stack lives in host RAM as one contiguous array; batches are
cheap slices handed to the device, optionally sharded over a mesh by the
caller. Split semantics mirror the reference (val ratio, seeded shuffle,
``setup("test")`` aliasing the full dataset; data_module.py:188-211).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterator

import numpy as np

from latice_tpu.data.dataset import DPdataset

logger = logging.getLogger(__name__)

__all__ = ["DPDataModule", "batch_iterator", "pad_batch", "padded_batches"]


def padded_batches(x, batch_size: int):
    """Yield ``(n_real, padded_chunk)`` fixed-shape batches of ``x``.

    The repo's pad-never-recompile convention as one iterator: every chunk
    a jitted program sees has the same leading dimension; the caller trims
    results back to ``n_real``. Accepts host numpy or device jax arrays
    (device chunks pad on device — no host round trip).
    """
    for start in range(0, len(x), batch_size):
        chunk = x[start : start + batch_size]
        n = len(chunk)
        if n < batch_size:
            if isinstance(chunk, np.ndarray):
                pad = np.zeros(
                    (batch_size - n,) + chunk.shape[1:], chunk.dtype
                )
                chunk = np.concatenate([chunk, pad])
            else:
                import jax.numpy as jnp

                pads = ((0, batch_size - n),) + ((0, 0),) * (chunk.ndim - 1)
                chunk = jnp.pad(chunk, pads)
        yield n, chunk


def pad_batch(
    batch: np.ndarray, batch_size: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Pad a (possibly partial) batch to the static compile shape.

    Returns ``(padded, mask, n_real)`` where ``mask`` is a float32 ``(B,)``
    row-validity weight (1 for real rows, 0 for pad rows). Keeps the repo's
    pad-never-recompile convention on the training loop: every batch a jitted
    step sees has the same leading dimension, so the tail of an epoch costs
    zero extra XLA compiles (compiles are minutes on some backends).
    """
    n = len(batch)
    if n > batch_size:
        raise ValueError(f"Batch of {n} rows exceeds the static size {batch_size}")
    mask = np.zeros(batch_size, dtype=np.float32)
    mask[:n] = 1.0
    if n == batch_size:
        return batch, mask, n
    pad = np.zeros((batch_size - n,) + batch.shape[1:], batch.dtype)
    return np.concatenate([batch, pad]), mask, n


def batch_iterator(
    arrays: tuple[np.ndarray, ...],
    batch_size: int,
    shuffle: bool = False,
    rng: np.random.Generator | None = None,
    drop_last: bool = False,
) -> Iterator[tuple[np.ndarray, ...]]:
    """Yield aligned batches from host arrays.

    ``drop_last=False`` keeps the final partial batch (reference DataLoader
    default) — at most one extra XLA compile shape per epoch.
    """
    n = len(arrays[0])
    order = np.arange(n)
    if shuffle:
        (rng or np.random.default_rng()).shuffle(order)
    end = n - (n % batch_size) if drop_last else n
    for start in range(0, end, batch_size):
        idx = order[start : start + batch_size]
        yield tuple(a[idx] for a in arrays)


class DPDataModule:
    """Train/val/test splits over a DPdataset with reference-default knobs."""

    def __init__(
        self,
        path: str | Path,
        rot_angles_path: str | Path,
        image_size: tuple[int, int] = (128, 128),
        val_data_ratio: float = 0.1,
        batch_size: int = 32,
        seed: int = 42,
        transform=None,
        n_cpu: int = 0,  # accepted for config parity; loading is vectorized
    ) -> None:
        self.path = path
        self.rot_angles_path = rot_angles_path
        self.image_size = tuple(image_size)
        self.val_data_ratio = val_data_ratio
        self.batch_size = batch_size
        self.seed = seed

        self.dataset_full = DPdataset(path, rot_angles_path, self.image_size, transform)
        self._train_idx: np.ndarray | None = None
        self._val_idx: np.ndarray | None = None
        self.dataset_test: DPdataset | None = None
        self._epoch_rng = np.random.default_rng(seed)

    def setup(self, stage: str | None = None) -> None:
        """Prepare splits for 'fit' or alias the full set for 'test'."""
        if stage == "fit" or stage is None:
            n = len(self.dataset_full)
            val_size = int(n * self.val_data_ratio)
            train_size = n - val_size
            logger.info(
                f"Splitting dataset: {train_size} training, {val_size} validation samples"
            )
            perm = np.random.default_rng(self.seed).permutation(n)
            self._train_idx = np.sort(perm[:train_size])
            self._val_idx = np.sort(perm[train_size:])
        if stage == "test":
            self.dataset_test = self.dataset_full
            logger.info(
                f"Test dataset prepared with {len(self.dataset_test)} samples"
            )

    @property
    def train_size(self) -> int:
        return 0 if self._train_idx is None else len(self._train_idx)

    @property
    def val_size(self) -> int:
        return 0 if self._val_idx is None else len(self._val_idx)

    def _subset(self, idx: np.ndarray | None) -> tuple[np.ndarray, np.ndarray]:
        ds = self.dataset_full
        if idx is None:
            raise RuntimeError("setup('fit') must be called first")
        return ds.patterns[idx], ds.rot_angles[idx]

    def train_batches(
        self, epoch: int | None = None
    ) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        """Shuffled training batches; if val ratio is 0 the full set is used
        (data_module.py:219-223 semantics).

        With ``epoch`` given, the shuffle is seeded by ``(seed, epoch)`` —
        byte-reproducible per epoch regardless of how many epochs ran before,
        so a resumed run replays the exact batch order of an uninterrupted
        one. Without it, a stateful stream preserves the old behavior.
        """
        idx = self._train_idx
        if self.val_data_ratio <= 0.0 and self._val_idx is not None:
            idx = np.concatenate([self._train_idx, self._val_idx])
        rng = (
            np.random.default_rng((self.seed, epoch))
            if epoch is not None
            else self._epoch_rng
        )
        return batch_iterator(
            self._subset(idx), self.batch_size, shuffle=True, rng=rng
        )

    def val_batches(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        return batch_iterator(self._subset(self._val_idx), self.batch_size)

    def test_batches(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        if self.dataset_test is None:
            self.setup("test")
        ds = self.dataset_test
        return batch_iterator((ds.patterns, ds.rot_angles), self.batch_size)

    def num_train_batches(self) -> int:
        return -(-self.train_size // self.batch_size)

    def num_test_batches(self) -> int:
        return -(-len(self.dataset_full) // self.batch_size)
