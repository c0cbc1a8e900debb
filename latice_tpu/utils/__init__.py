"""Utilities: visualization, IPF color keys, loggers, profiling, seeding."""

from latice_tpu.utils.colorkey import ColorKeyGenerator
from latice_tpu.utils.loggers import (
    CSVLogger,
    MultiLogger,
    TensorBoardLogger,
    WandbLogger,
    make_default_logger,
)
from latice_tpu.utils.viz import (
    figure_to_array,
    get_color_key,
    log_fig,
    plot_detection,
    plot_latent,
)

__all__ = [
    "CSVLogger",
    "ColorKeyGenerator",
    "MultiLogger",
    "TensorBoardLogger",
    "WandbLogger",
    "figure_to_array",
    "get_color_key",
    "log_fig",
    "make_default_logger",
    "plot_detection",
    "plot_latent",
]
