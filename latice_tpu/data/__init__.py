"""Data pipeline: vectorized pattern loading, transforms, splits, batching."""

from latice_tpu.data.datamodule import (
    DPDataModule,
    batch_iterator,
    pad_batch,
    padded_batches,
)
from latice_tpu.data.export import (
    VendorMap,
    read_ang,
    read_ctf,
    write_ang,
    write_ctf,
)
from latice_tpu.data.h5io import (
    HDF5_EXTENSIONS,
    find_pattern_dataset,
    iter_pattern_batches,
    load_patterns,
)
from latice_tpu.data.augment import AugmentConfig, make_augment_fn
from latice_tpu.data.dataset import DPdataset, parse_angle_file
from latice_tpu.data.hough import (
    BandDetection,
    BandDetector,
    butterfly_kernel,
    radon_matrix,
)
from latice_tpu.data.nlpar import estimate_noise_sigma, nlpar_denoise
from latice_tpu.data.streaming import StreamedDPDataModule
from latice_tpu.data.prefetch import prefetch_host, prefetch_to_device
from latice_tpu.data.preprocess import (
    PreprocessConfig,
    bin_patterns,
    equalize_histogram,
    estimate_static_background,
    fix_hot_pixels,
    gaussian_blur,
    make_preprocess_fn,
    normalize_patterns,
    parse_preprocess_spec,
    remove_dynamic_background,
    remove_static_background,
)
from latice_tpu.data.up import (
    UP_EXTENSIONS,
    UpHeader,
    iter_up_batches,
    load_up_patterns,
    open_up_patterns,
    read_up_header,
)
from latice_tpu.data.transforms import (
    center_crop,
    prepare_patterns,
    create_default_transform,
    default_transform,
    to_grayscale,
)

__all__ = [
    "AugmentConfig",
    "BandDetection",
    "BandDetector",
    "DPDataModule",
    "StreamedDPDataModule",
    "DPdataset",
    "PreprocessConfig",
    "butterfly_kernel",
    "radon_matrix",
    "batch_iterator",
    "padded_batches",
    "bin_patterns",
    "center_crop",
    "equalize_histogram",
    "estimate_noise_sigma",
    "estimate_static_background",
    "fix_hot_pixels",
    "gaussian_blur",
    "make_augment_fn",
    "make_preprocess_fn",
    "nlpar_denoise",
    "normalize_patterns",
    "parse_preprocess_spec",
    "prepare_patterns",
    "remove_dynamic_background",
    "remove_static_background",
    "HDF5_EXTENSIONS",
    "UP_EXTENSIONS",
    "UpHeader",
    "iter_up_batches",
    "load_up_patterns",
    "open_up_patterns",
    "read_up_header",
    "VendorMap",
    "read_ang",
    "read_ctf",
    "write_ang",
    "write_ctf",
    "find_pattern_dataset",
    "iter_pattern_batches",
    "load_patterns",
    "pad_batch",
    "prefetch_host",
    "prefetch_to_device",
    "create_default_transform",
    "default_transform",
    "parse_angle_file",
    "to_grayscale",
]
