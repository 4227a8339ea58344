"""ctypes binding to the native I/O core (native/p4t_io.cpp).

Builds lazily with make/g++ on first use and degrades to a pure-numpy
fallback when no toolchain is available. The C++ path reads a batch of
small npy files on a persistent thread pool straight into one
preallocated numpy buffer — the input hot path of Titan-style datasets
(thousands of per-(date, param) files; reference hot loop #2).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import warnings
from pathlib import Path
from typing import Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libp4tio.so"
_ABI_VERSION = 3  # must match p4t_version() in native/p4t_io.cpp
_lock = threading.Lock()
_lib = None
_tried = False


def _build(force: bool = False) -> bool:
    cmd = ["make", "-C", str(_NATIVE_DIR)] + (["-B"] if force else [])
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        warnings.warn(
            f"native I/O core unavailable (build failed: {e}); "
            f"falling back to numpy reads"
        )
        return False


def _version_ok(lib: ctypes.CDLL) -> bool:
    """True iff the .so carries the current ABI. Checked BEFORE binding
    any versioned symbol so a stale build (gitignored .so surviving a
    git pull; missing symbols would raise AttributeError) always takes
    the rebuild path instead of crashing the first data read (ADVICE
    r3, medium)."""
    try:
        return int(lib.p4t_version()) == _ABI_VERSION
    except AttributeError:
        return False  # pre-versioning build


def _bind(path: Path) -> ctypes.CDLL:
    lib = ctypes.CDLL(str(path))
    if not _version_ok(lib):
        raise _StaleABI(path)
    lib.p4t_read_npy_batch_shaped.restype = ctypes.c_int
    lib.p4t_read_npy_batch_shaped.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
    ]
    return lib


class _StaleABI(Exception):
    pass


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() and not _build():
            return None
        try:
            try:
                lib = _bind(_LIB_PATH)
            except (_StaleABI, AttributeError):
                # stale build from an older binding — rebuild, then bind
                # via a unique temp copy: dlopen caches by path, so
                # re-CDLL'ing _LIB_PATH would hand back the stale image
                # already mapped by the failed bind above
                if not _build(force=True):
                    return None
                import shutil
                import tempfile

                tmp = tempfile.NamedTemporaryFile(
                    suffix=".so", delete=False
                )
                tmp.close()
                shutil.copy(_LIB_PATH, tmp.name)
                lib = _bind(Path(tmp.name))
                # dlopen holds the mapping; unlink so the copy doesn't
                # accumulate in /tmp across rebuild-triggering processes
                try:
                    os.unlink(tmp.name)
                except OSError:
                    pass
            _lib = lib
        except (OSError, AttributeError, _StaleABI) as e:
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
    Every file's declared shape is validated PER-DIM against item_shape
    (ADVICE r2: a later file with a different — even transposed — shape
    must never silently fill the batch buffer).
    """
    n = len(paths)
    per_item = int(np.prod(item_shape))
    out = np.empty((n,) + tuple(item_shape), dtype=np.float32)
    lib = _load()
    if lib is not None:
        c_paths = (ctypes.c_char_p * n)(
            *[str(p).encode() for p in paths]
        )
        ndim = len(item_shape)
        c_dims = (ctypes.c_int64 * ndim)(*item_shape)
        rc = lib.p4t_read_npy_batch_shaped(
            c_paths,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            per_item,
            c_dims,
            ndim,
        )
        if rc == 0:
            return out
        warnings.warn(
            f"native npy read failed for {paths[rc - 1]} — "
            f"falling back to numpy"
        )
    for i, p in enumerate(paths):
        arr = np.load(p)
        if arr.shape != tuple(item_shape):
            raise ValueError(
                f"npy batch shape mismatch: {p} has {arr.shape}, "
                f"expected {tuple(item_shape)}"
            )
        out[i] = arr
    return out
