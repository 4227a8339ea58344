"""ctypes binding to the native I/O core (native/p4t_io.cpp).

Builds lazily with make/g++ on first use and degrades to a pure-numpy
fallback when no toolchain is available. The C++ path reads a batch of
small npy files on a persistent thread pool straight into one
preallocated numpy buffer — the input hot path of Titan-style datasets
(thousands of per-(date, param) files; reference hot loop #2).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
import warnings
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libp4tio.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists():
            try:
                subprocess.run(
                    ["make", "-C", str(_NATIVE_DIR)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (OSError, subprocess.SubprocessError) as e:
                warnings.warn(
                    f"native I/O core unavailable (build failed: {e}); "
                    f"falling back to numpy reads"
                )
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
            lib.p4t_read_npy_batch.restype = ctypes.c_int
            lib.p4t_read_npy_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            assert lib.p4t_version() == 1
            _lib = lib
        except (OSError, AssertionError) as e:
            warnings.warn(f"native I/O core failed to load: {e}")
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def read_npy_float32_batch(
    paths: Sequence[Path], item_shape: Tuple[int, ...]
) -> np.ndarray:
    """Read len(paths) float32 C-order npy files of identical shape into
    one (N, *item_shape) array — in parallel via the C++ core when built.
    """
    n = len(paths)
    per_item = int(np.prod(item_shape))
    out = np.empty((n,) + tuple(item_shape), dtype=np.float32)
    lib = _load()
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(
            *[str(p).encode() for p in paths]
        )
        rc = lib.p4t_read_npy_batch(
            c_paths,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            per_item,
        )
        if rc == 0:
            return out
        warnings.warn(
            f"native npy read failed for {paths[rc - 1]} — "
            f"falling back to numpy"
        )
    for i, p in enumerate(paths):
        out[i] = np.load(p)
    return out
