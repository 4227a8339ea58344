"""DeepLabV3 / DeepLabV3Plus with ResNet encoders.

TPU-native Flax implementations matching the reference settings surface
(reference configs: config/CLI/model/deeplabv3.yaml, deeplabv3plus.yaml —
encoder_name/encoder_depth/decoder_channels/upsampling/activation).
ASPP uses dilated convs which XLA fuses well on the MXU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from py4cast_tpu.models.base import (
    ModelBase,
    ModelType,
    crop_to,
    get_activation,
    pad_to_multiple,
)
from py4cast_tpu.models.unet import ResNetEncoder, _bilinear_resize, _gn


@dataclass(frozen=True)
class DeepLabSettings:
    encoder_name: str = "resnet18"
    encoder_depth: int = 5
    # False | True | npz path — see py4cast_tpu/models/pretrained.py
    encoder_weights: object = False
    encoder_norm: str = "group"
    decoder_channels: int = 256
    activation: Optional[str] = None
    upsampling: int = 8
    aux_params: Optional[dict] = None
    atrous_rates: Tuple[int, ...] = (12, 24, 36)

    def __post_init__(self):
        if self.aux_params is not None:
            # the reference accepts smp's auxiliary classification-head
            # config but never uses it (aux_params: null in every yaml);
            # a classification head has no meaning for field regression,
            # so reject loudly instead of silently ignoring it
            raise ValueError(
                "aux_params (an auxiliary classification head) is not "
                "supported: this framework predicts weather fields, not "
                "classes. Remove aux_params from the model settings."
            )


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling."""

    features: int
    rates: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        branches = [nn.Conv(self.features, (1, 1), use_bias=False)(x)]
        for r in self.rates:
            branches.append(
                nn.Conv(
                    self.features,
                    (3, 3),
                    kernel_dilation=(r, r),
                    padding="SAME",
                    use_bias=False,
                )(x)
            )
        # image-level pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.Conv(self.features, (1, 1), use_bias=False)(pooled)
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], x.shape[1], x.shape[2], self.features)
        )
        branches.append(pooled)
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.features, (1, 1), use_bias=False)(y)
        y = _gn(self.features)(y)
        return nn.relu(y)


class DeepLabV3(ModelBase):
    settings: DeepLabSettings = DeepLabSettings()

    settings_kls = DeepLabSettings
    model_type = ModelType.CONVOLUTIONAL
    register = True

    def load_pretrained(self, variables):
        from py4cast_tpu.models.pretrained import maybe_load_encoder

        return maybe_load_encoder(
            variables, self.settings, self.num_input_features
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = self.settings
        x, hw = pad_to_multiple(x, 2**s.encoder_depth)
        feats = ResNetEncoder(
            s.encoder_name, s.encoder_depth, norm=s.encoder_norm,
            name="encoder",
        )(x)
        y = ASPP(s.decoder_channels, s.atrous_rates)(feats[-1])
        y = nn.Conv(self.num_output_features, (1, 1))(y)
        y = _bilinear_resize(y, x.shape[1], x.shape[2])
        y = crop_to(y, hw)
        return get_activation(s.activation)(y)


class DeepLabV3Plus(ModelBase):
    """V3+ adds a low-level skip connection into the decoder."""

    settings: DeepLabSettings = DeepLabSettings()

    settings_kls = DeepLabSettings
    model_type = ModelType.CONVOLUTIONAL
    register = True

    def load_pretrained(self, variables):
        from py4cast_tpu.models.pretrained import maybe_load_encoder

        return maybe_load_encoder(
            variables, self.settings, self.num_input_features
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = self.settings
        x, hw = pad_to_multiple(x, 2**s.encoder_depth)
        feats = ResNetEncoder(
            s.encoder_name, s.encoder_depth, norm=s.encoder_norm,
            name="encoder",
        )(x)
        y = ASPP(s.decoder_channels, s.atrous_rates)(feats[-1])

        low = feats[1]  # stride-4 feature map
        low = nn.Conv(48, (1, 1), use_bias=False)(low)
        low = nn.relu(_gn(48)(low))
        y = _bilinear_resize(y, low.shape[1], low.shape[2])
        y = jnp.concatenate([y, low], axis=-1)
        y = nn.Conv(s.decoder_channels, (3, 3), padding="SAME", use_bias=False)(y)
        y = nn.relu(_gn(s.decoder_channels)(y))
        y = nn.Conv(self.num_output_features, (1, 1))(y)
        y = _bilinear_resize(y, x.shape[1], x.shape[2])
        y = crop_to(y, hw)
        return get_activation(s.activation)(y)
