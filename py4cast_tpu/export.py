"""Trained-model export: serialized StableHLO artifacts.

TPU-native analog of the reference's ONNX export path (reference:
mfai export_to_onnx / onnx_load_and_infer used by tests/test_models.py
and SURVEY.md §2.1 L0). ``jax.export`` serializes the jitted forward to
portable StableHLO bytes that reload and run on any JAX backend —
the deployment artifact for serving.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_forward(model, variables, input_shape: Tuple[int, ...],
                   dest: Path, batch_size: int = 1) -> Path:
    """Serialize model.apply(variables, x) for a fixed input shape."""
    from jax import export as jax_export

    def forward(x):
        return model.apply(variables, x)

    x_spec = jax.ShapeDtypeStruct(
        (batch_size,) + tuple(input_shape) + (model.num_input_features,),
        jnp.float32,
    )
    exported = jax_export.export(jax.jit(forward))(x_spec)
    data = exported.serialize()
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    dest.write_bytes(data)
    return dest


def load_and_infer(path: Path, x: np.ndarray):
    """Reload a serialized artifact and run it (the onnx_load_and_infer
    analog)."""
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return exported.call(jnp.asarray(x))
