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
