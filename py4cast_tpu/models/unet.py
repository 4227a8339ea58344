"""UNet family: classic UNet, HalfUNet (with ghost modules), CustomUNet
(ResNet-encoder UNet).

TPU-native Flax implementations with the settings surface of the
reference zoo (reference configs: config/CLI/model/unet.yaml,
halfunet.yaml, customunet.yaml; architecture contract: SURVEY.md §2.2).
All convs are NHWC and normalization is GroupNorm (stateless on TPU,
batch-size independent — replaces the reference's BatchNorm).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from py4cast_tpu.ops.pool import max_pool_2x2
from py4cast_tpu.models.base import (
    ModelBase,
    ModelType,
    _gn,  # noqa: F401  (re-exported: deeplab/segformer import it from here)
    crop_to,
    get_activation,
    pad_to_multiple,
)


class ConvBlock(nn.Module):
    """(conv3x3 → GN → ReLU) × 2"""

    features: int
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(
                self.features,
                (3, 3),
                kernel_dilation=(self.dilation, self.dilation),
                padding="SAME",
                use_bias=self.use_bias,
            )(x)
            x = _gn(self.features)(x)
            x = nn.relu(x)
        return x


class GhostBlock(nn.Module):
    """Ghost module: a primary conv makes half the channels, a cheap
    depthwise conv derives the other half (GhostNet, Han et al. 2020).

    Used by HalfUNet when ``use_ghost`` (reference setting:
    config/CLI/model/halfunet.yaml:25).
    """

    features: int
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            half = self.features // 2
            primary = nn.Conv(
                half,
                (3, 3),
                kernel_dilation=(self.dilation, self.dilation),
                padding="SAME",
                use_bias=self.use_bias,
            )(x)
            primary = _gn(half)(primary)
            primary = nn.relu(primary)
            cheap = nn.Conv(
                self.features - half,
                (3, 3),
                feature_group_count=half,
                padding="SAME",
                use_bias=self.use_bias,
            )(primary)
            cheap = _gn(self.features - half)(cheap)
            cheap = nn.relu(cheap)
            x = jnp.concatenate([primary, cheap], axis=-1)
        return x


def _upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor spatial upsampling (NHWC)."""
    b, h, w, c = x.shape
    x = jnp.repeat(x, factor, axis=1)
    return jnp.repeat(x, factor, axis=2)


def _bilinear_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    import jax

    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


# --------------------------------------------------------------------------
#                                   UNet
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class UNetSettings:
    init_features: int = 64
    depth: int = 4
    autopad_enabled: bool = True


class UNet(ModelBase):
    """Classic 4-down/4-up UNet (reference settings: unet.yaml)."""

    settings: UNetSettings = UNetSettings()

    settings_kls = UNetSettings
    model_type = ModelType.CONVOLUTIONAL
    register = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = self.settings
        if s.autopad_enabled:
            x, hw = pad_to_multiple(x, 2**s.depth)
        skips = []
        f = s.init_features
        for level in range(s.depth):
            x = ConvBlock(f * 2**level)(x)
            skips.append(x)
            x = max_pool_2x2(x)  # scatter-free VJP (ops/pool.py)
        x = ConvBlock(f * 2**s.depth)(x)
        for level in reversed(range(s.depth)):
            x = nn.ConvTranspose(f * 2**level, (2, 2), strides=(2, 2))(x)
            x = jnp.concatenate([x, skips[level]], axis=-1)
            x = ConvBlock(f * 2**level)(x)
        x = nn.Conv(self.num_output_features, (1, 1))(x)
        if s.autopad_enabled:
            x = crop_to(x, hw)
        return x


# --------------------------------------------------------------------------
#                                 HalfUNet
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class HalfUNetSettings:
    num_filters: int = 64
    dilation: int = 1
    bias: bool = False
    use_ghost: bool = False
    last_activation: str = "Identity"
    absolute_pos_embed: bool = False
    autopad_enabled: bool = True
    depth: int = 4


class HalfUNet(ModelBase):
    """Half-UNet: shared-width encoder whose per-scale features are
    upsampled to full resolution and summed — no decoder convs
    (Lu et al. 2022; reference settings: halfunet.yaml).
    """

    settings: HalfUNetSettings = HalfUNetSettings()

    settings_kls = HalfUNetSettings
    model_type = ModelType.CONVOLUTIONAL
    register = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = self.settings
        block = GhostBlock if s.use_ghost else ConvBlock

        if s.absolute_pos_embed:
            h, w = x.shape[1], x.shape[2]
            pos = self.param(
                "pos_embed",
                nn.initializers.truncated_normal(0.02),
                (1, h, w, 1),
            )
            x = x + pos

        if s.autopad_enabled:
            x, hw = pad_to_multiple(x, 2 ** (s.depth - 1))

        summed = None
        for level in range(s.depth):
            if level > 0:
                x = max_pool_2x2(x)  # scatter-free VJP (ops/pool.py)
            x = block(s.num_filters, dilation=s.dilation, use_bias=s.bias)(x)
            up = _upsample(x, 2**level) if level > 0 else x
            summed = up if summed is None else summed + up

        y = block(s.num_filters, dilation=s.dilation, use_bias=s.bias)(summed)
        y = nn.Conv(self.num_output_features, (1, 1), use_bias=s.bias)(y)
        y = get_activation(s.last_activation)(y)
        if s.autopad_enabled:
            y = crop_to(y, hw)
        return y


# --------------------------------------------------------------------------
#                  CustomUNet (ResNet-encoder UNet)
# --------------------------------------------------------------------------
@dataclass(frozen=True)
class CustomUNetSettings:
    encoder_name: str = "resnet18"
    encoder_depth: int = 5
    # False: random init. True: load the default pretrained npz
    # (<ROOTDIR>/pretrained/<encoder_name>.npz). A string is an explicit
    # npz path. Produce the npz with bin/convert_torchvision_encoder.py
    # (ImageNet weights) or bin/pretrain_encoder.py (offline
    # self-supervised) — reference default: encoder_weights: imagenet
    # (config/CLI/model/customunet.yaml).
    encoder_weights: object = False
    # "group" (GroupNorm) or "affine" (frozen-BN: per-channel scale/bias,
    # eval-exact for converted torchvision encoders)
    encoder_norm: str = "group"
    autopad_enabled: bool = True
    decoder_channels: Tuple[int, ...] = (256, 128, 64, 32, 16)


class AffineNorm(nn.Module):
    """Per-channel scale + bias — a BatchNorm with folded running stats
    ('frozen BN'), matching torchvision encoders in eval mode exactly
    while staying batch-independent (TPU-friendly, no cross-batch state)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


def _enc_norm(kind: str, features: int, name: str):
    if kind == "affine":
        return AffineNorm(features, name=name)
    return _gn(features, name=name)


class ResNetBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        residual = x
        # symmetric (1,1) padding (not XLA SAME, which pads (0,1) at
        # stride 2) so converted torchvision weights are eval-exact
        y = nn.Conv(self.features, (3, 3), strides=self.strides,
                    padding=((1, 1), (1, 1)), name="conv1")(x)
        y = _enc_norm(self.norm, self.features, "norm1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(y)
        y = _enc_norm(self.norm, self.features, "norm2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=self.strides, name="proj"
            )(x)
            residual = _enc_norm(self.norm, self.features, "proj_norm")(residual)
        return nn.relu(y + residual)


_RESNET_STAGES = {
    # name: (blocks per stage, base width)
    "resnet18": ((2, 2, 2, 2), 64),
    "resnet34": ((3, 4, 6, 3), 64),
}


class ResNetEncoder(nn.Module):
    """ResNet-18/34-style encoder returning one feature map per depth
    level. Submodules carry stable names (stem_conv, stage{s}_block{b})
    so pretrained npz checkpoints map deterministically
    (py4cast_tpu/models/pretrained.py)."""

    encoder_name: str = "resnet18"
    depth: int = 5
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        if self.encoder_name not in _RESNET_STAGES:
            raise ValueError(
                f"Unknown encoder {self.encoder_name}; "
                f"available: {list(_RESNET_STAGES)}"
            )
        blocks, width = _RESNET_STAGES[self.encoder_name]
        feats = []
        # stem: /2 — torch-convention symmetric padding, so converted
        # torchvision checkpoints reproduce eval outputs exactly
        x = nn.Conv(width, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), name="stem_conv")(x)
        x = _enc_norm(self.norm, width, "stem_norm")(x)
        x = nn.relu(x)
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(blocks[: self.depth - 1]):
            f = width * 2**stage
            for b in range(n_blocks):
                strides = (2, 2) if (b == 0 and stage > 0) else (1, 1)
                x = ResNetBlock(
                    f, strides=strides, norm=self.norm,
                    name=f"stage{stage}_block{b}",
                )(x)
            feats.append(x)
        return feats


class CustomUNet(ModelBase):
    """UNet with a ResNet encoder (segmentation-models style;
    reference settings: customunet.yaml)."""

    settings: CustomUNetSettings = CustomUNetSettings()

    settings_kls = CustomUNetSettings
    model_type = ModelType.CONVOLUTIONAL
    register = True

    def load_pretrained(self, variables):
        """Inject pretrained encoder weights per settings.encoder_weights
        (called by the training layer after init)."""
        from py4cast_tpu.models.pretrained import maybe_load_encoder

        return maybe_load_encoder(
            variables, self.settings, self.num_input_features
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = self.settings
        if s.autopad_enabled:
            x, hw = pad_to_multiple(x, 2**s.encoder_depth)
        feats = ResNetEncoder(
            s.encoder_name, s.encoder_depth, norm=s.encoder_norm,
            name="encoder",
        )(x)
        y = feats[-1]
        dec = s.decoder_channels[: len(feats)]
        skips = feats[:-1][::-1]  # deepest-first
        for i, ch in enumerate(dec[: len(skips)]):
            y = _upsample(y, 2)
            skip = skips[i]
            if skip.shape[1] != y.shape[1] or skip.shape[2] != y.shape[2]:
                y = _bilinear_resize(y, skip.shape[1], skip.shape[2])
            y = jnp.concatenate([y, skip], axis=-1)
            y = ConvBlock(ch)(y)
        # final upsample back to input resolution (stem halved it)
        y = _upsample(y, 2)
        y = ConvBlock(dec[-1])(y)
        y = nn.Conv(self.num_output_features, (1, 1))(y)
        if s.autopad_enabled:
            y = crop_to(y, hw)
        return y
