"""Data pipeline: vectorized pattern loading, transforms, splits, batching."""

from latice_tpu.data.datamodule import DPDataModule, batch_iterator, pad_batch
from latice_tpu.data.dataset import DPdataset, parse_angle_file
from latice_tpu.data.prefetch import prefetch_to_device
from latice_tpu.data.transforms import (
    center_crop,
    create_default_transform,
    default_transform,
    to_grayscale,
)

__all__ = [
    "DPDataModule",
    "DPdataset",
    "batch_iterator",
    "center_crop",
    "pad_batch",
    "prefetch_to_device",
    "create_default_transform",
    "default_transform",
    "parse_angle_file",
    "to_grayscale",
]
