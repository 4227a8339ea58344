"""Small shared utilities (reference: py4cast/utils.py)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def merge_dicts(a: dict, b: dict) -> dict:
    """Recursively merge b into a copy of a (b wins on leaves).

    (reference: utils.py:92-101)
    """
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


#: maps trainer-style precision strings to jnp dtypes
#: (reference: utils.py:104-109, torch-amp precision map)
str_to_dtype: Dict[str, jnp.dtype] = {
    "bf16-mixed": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "16-mixed": jnp.bfloat16,  # fp16 has no TPU advantage; bf16 is native
    "32": jnp.float32,
    "32-true": jnp.float32,
    "64": jnp.float64,
    "64-true": jnp.float64,
}


def nan_to_num(arr, nan: float = 0.0):
    xp = np if isinstance(arr, np.ndarray) else jnp
    return xp.nan_to_num(arr, nan=nan)


def apply_env_platform():
    """Honor the JAX_PLATFORMS env var even when a sitecustomize pins
    jax.config.jax_platforms to a TPU plugin. Call before first backend use."""
    import os

    import jax

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        try:
            jax.config.update("jax_platforms", env)
        except Exception:  # backend already initialized — keep as-is
            pass
