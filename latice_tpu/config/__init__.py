"""Hydra-compatible configuration engine."""

from latice_tpu.config.engine import (
    apply_overrides,
    expand_sweeps,
    get_by_path,
    instantiate,
    load_config,
    maybe_instantiate,
    resolve_interpolations,
    set_by_path,
)

__all__ = [
    "apply_overrides",
    "expand_sweeps",
    "get_by_path",
    "instantiate",
    "load_config",
    "maybe_instantiate",
    "resolve_interpolations",
    "set_by_path",
]
