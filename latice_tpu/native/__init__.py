"""ctypes bindings for the first-party native runtime (native/latice_native.cpp).

Provides the host-side FAISS-equivalent: exact cosine top-k (the vector DB's
accelerator-free fallback engine) and a fast angle-file parser. The shared
library is built on demand with g++ and cached next to the sources; every
entry point degrades gracefully (returns None / raises ImportError) when no
toolchain is available, and pure-Python paths remain the default.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["available", "build", "cosine_topk_native", "parse_angle_file_native"]

_SRC_DIR = Path(__file__).resolve().parents[2] / "native"
_SRC = _SRC_DIR / "latice_native.cpp"
_LIB = _SRC_DIR / "liblatice_native.so"

_lib: ctypes.CDLL | None = None
_load_failed = False


def build(force: bool = False) -> Path:
    """Compile the shared library with g++ (cached by mtime)."""
    if _LIB.exists() and not force and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        str(_SRC),
        "-o",
        str(_LIB),
    ]
    logger.info(f"Building native library: {' '.join(cmd)}")
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load() -> ctypes.CDLL | None:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        build()
        lib = ctypes.CDLL(str(_LIB))
        lib.latice_native_abi_version.restype = ctypes.c_int32
        if lib.latice_native_abi_version() != 1:
            raise OSError("native ABI version mismatch")
        lib.latice_cosine_topk.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32,
        ]
        lib.latice_parse_angle_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        lib.latice_parse_angle_file.restype = ctypes.c_int64
        _lib = lib
    except Exception as e:  # no toolchain / bad platform: stay pure-Python
        logger.info(f"Native library unavailable ({e}); using Python paths")
        _load_failed = True
    return _lib


def available() -> bool:
    """True when the native library is (or can be) loaded."""
    return _load() is not None


def cosine_topk_native(
    queries: np.ndarray, dictionary: np.ndarray, k: int, n_threads: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Exact cosine top-k on the host CPU (normalizes internally).

    Same contract as latice_tpu.index.knn.cosine_topk: best-first
    ``(B, k)`` scores + indices.
    """
    lib = _load()
    if lib is None:
        raise ImportError("native library not available")
    q = np.ascontiguousarray(queries, dtype=np.float32)
    d = np.ascontiguousarray(dictionary, dtype=np.float32)
    if q.ndim != 2 or d.ndim != 2 or q.shape[1] != d.shape[1]:
        raise ValueError(f"bad shapes {q.shape} vs {d.shape}")
    k = min(k, len(d))
    scores = np.empty((len(q), k), dtype=np.float32)
    indices = np.empty((len(q), k), dtype=np.int64)
    lib.latice_cosine_topk(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(q),
        d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(d),
        q.shape[1],
        k,
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_threads,
    )
    return scores.astype(np.float64), indices


def parse_angle_file_native(path: str | Path, max_rows: int = 10_000_000) -> np.ndarray:
    """Parse an angle file with the native parser; (N, 3) float64."""
    lib = _load()
    if lib is None:
        raise ImportError("native library not available")
    out = np.empty((max_rows, 3), dtype=np.float64)
    n = lib.latice_parse_angle_file(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), max_rows
    )
    if n == -1:
        raise FileNotFoundError(path)
    if n < 0:
        raise ValueError(f"Failed to parse rotation angles file: {path}")
    return out[:n].copy()
