"""Example model plugin: proves the plugin discovery path.

Any importable top-level module named ``py4cast_tpu_plugin_*`` is
scanned for ModelBase subclasses with ``register = True``
(reference analog: py4cast_plugin_example.py:19-57).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn

from py4cast_tpu.models.base import ModelBase, ModelType


@dataclass(frozen=True)
class IdentitySettings:
    scale: float = 1.0


class Identity(ModelBase):
    """Projects input features to output features with a single linear
    layer — the smallest possible model satisfying the contract."""

    settings: IdentitySettings = IdentitySettings()

    settings_kls = IdentitySettings
    model_type = ModelType.CONVOLUTIONAL
    register = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.Dense(self.num_output_features)(x) * self.settings.scale
