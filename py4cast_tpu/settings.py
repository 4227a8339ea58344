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


def _host_fingerprint() -> str:
    """Short hash of the host CPU's capabilities AND the session's
    platform config. XLA:CPU cache entries are AOT machine code for the
    COMPILING client's target-feature set — two hazards make a shared
    dir dangerous:

    - VM migration onto a host with different features risks SIGILL
      (observed on this fleet: amx/avx512 feature drift between rounds);
    - the CPU client of a pure-CPU session (``JAX_PLATFORMS=cpu``) and
      the CPU backend of an accelerator session compile with different
      XLA pseudo-features (``+prefer-no-scatter``/``+prefer-no-gather``)
      that are NOT part of the cache key, so each loads the other's
      entries with a machine-feature mismatch (cpu_aot_loader "could
      lead to SIGILL" error; observed as a cold-init HANG in round 5).

    Keying the cache dir by the live feature set + platform config +
    jax version makes such entries unreachable instead of dangerous."""
    import hashlib
    import platform

    import jax

    txt = platform.machine()
    txt += "|platforms=" + os.environ.get("JAX_PLATFORMS", "")
    txt += "|jax=" + jax.__version__
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    txt += line
                    break
    except OSError:
        pass
    return hashlib.sha256(txt.encode()).hexdigest()[:10]


def enable_compilation_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache so repeated runs skip
    the multi-minute Mosaic/XLA compiles of the big train-step programs
    (a first-class concern on TPU: a 512×640 conv training step compiles
    in minutes cold, milliseconds warm). Called by the Trainer and by
    bench.py; honors JAX_COMPILATION_CACHE_DIR when already set.

    The directory is suffixed with a host-CPU fingerprint so cache
    entries never outlive the machine generation they were AOT-compiled
    for (see :func:`_host_fingerprint`)."""
    import jax

    base = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or str(CACHE_DIR / "xla_cache")
    )
    target = str(Path(base) / f"host-{_host_fingerprint()}")
    try:
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the knobs — cache is best-effort
        pass
