"""Data pipeline: vectorized pattern loading, transforms, splits, batching."""

from latice_tpu.data.datamodule import DPDataModule, batch_iterator, pad_batch
from latice_tpu.data.export import write_ang, write_ctf
from latice_tpu.data.h5io import (
    HDF5_EXTENSIONS,
    find_pattern_dataset,
    iter_pattern_batches,
    load_patterns,
)
from latice_tpu.data.dataset import DPdataset, parse_angle_file
from latice_tpu.data.prefetch import prefetch_to_device
from latice_tpu.data.transforms import (
    center_crop,
    prepare_patterns,
    create_default_transform,
    default_transform,
    to_grayscale,
)

__all__ = [
    "DPDataModule",
    "DPdataset",
    "batch_iterator",
    "center_crop",
    "prepare_patterns",
    "HDF5_EXTENSIONS",
    "write_ang",
    "write_ctf",
    "find_pattern_dataset",
    "iter_pattern_batches",
    "load_patterns",
    "pad_batch",
    "prefetch_to_device",
    "create_default_transform",
    "default_transform",
    "parse_angle_file",
    "to_grayscale",
]
