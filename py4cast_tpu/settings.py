"""Environment-driven settings.

Mirrors the reference's machine-specific roots (reference:
py4cast/settings.py:1-6) with a py4cast_tpu-specific prefix and safe
defaults under the user's home so CI/tests never require env setup.
"""

import os
from pathlib import Path

DEFAULT_ROOT = Path(os.environ.get("PY4CAST_ROOTDIR", str(Path.home() / ".py4cast_tpu")))

ROOTDIR = Path(os.environ.get("PY4CAST_TPU_ROOTDIR", str(DEFAULT_ROOT)))
CACHE_DIR = Path(os.environ.get("PY4CAST_TPU_CACHE_DIR", str(ROOTDIR / "cache")))
TITAN_PATH = Path(os.environ.get("PY4CAST_TPU_TITAN_PATH", str(ROOTDIR / "titan")))
POESY_PATH = Path(os.environ.get("PY4CAST_TPU_POESY_PATH", str(ROOTDIR / "poesy")))
RAINFALL_PATH = Path(
    os.environ.get("PY4CAST_TPU_RAINFALL_PATH", str(ROOTDIR / "rainfall"))
)


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache so repeated runs skip
    the multi-minute Mosaic/XLA compiles of the big train-step programs
    (a first-class concern on TPU: a 512×640 conv training step compiles
    in minutes cold, milliseconds warm). Called by the Trainer and by
    bench.py; honors JAX_COMPILATION_CACHE_DIR when already set."""
    import jax

    target = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or str(CACHE_DIR / "xla_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs — cache is best-effort
        pass
