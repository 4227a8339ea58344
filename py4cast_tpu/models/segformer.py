"""Segformer: hierarchical MiT encoder + all-MLP decoder.

TPU-native Flax implementation with the reference settings surface
(reference config: config/CLI/model/segformer.yaml — dims/heads/
ff_expansion/reduction_ratio/num_layers/decoder_dim/
num_downsampling_chans). Efficient self-attention uses spatial
reduction (SegFormer, Xie et al. 2021); attention runs as batched
matmuls on the MXU in bf16.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from py4cast_tpu.models.base import ModelBase, ModelType, crop_to, pad_to_multiple
from py4cast_tpu.models.unet import _bilinear_resize


@dataclass(frozen=True)
class SegformerSettings:
    dims: Tuple[int, ...] = (32, 64, 160, 256)
    heads: Tuple[int, ...] = (1, 2, 5, 8)
    ff_expansion: Tuple[int, ...] = (8, 8, 4, 4)
    reduction_ratio: Tuple[int, ...] = (8, 4, 2, 1)
    num_layers: int = 2
    decoder_dim: int = 256
    num_downsampling_chans: int = 32


class EfficientSelfAttention(nn.Module):
    """Attention with spatially-reduced K/V (the SegFormer trick)."""

    dim: int
    heads: int
    reduction: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = nn.Dense(self.dim, use_bias=False)(x).reshape(b, h * w, self.heads, -1)
        kv_in = x
        if self.reduction > 1:
            kv_in = nn.Conv(
                c, (self.reduction, self.reduction),
                strides=(self.reduction, self.reduction),
            )(x)
        kh, kw = kv_in.shape[1], kv_in.shape[2]
        k = nn.Dense(self.dim, use_bias=False)(kv_in).reshape(
            b, kh * kw, self.heads, -1
        )
        v = nn.Dense(self.dim, use_bias=False)(kv_in).reshape(
            b, kh * kw, self.heads, -1
        )
        # long-Q/short-KV attention: Pallas kernel on TPU (K/V resident in
        # VMEM, logits never hit HBM); XLA attention elsewhere
        from py4cast_tpu.ops.attention import dot_product_attention_short_kv

        out = dot_product_attention_short_kv(q, k, v)
        out = out.reshape(b, h, w, self.dim)
        return nn.Dense(self.dim)(out)


class MixFFN(nn.Module):
    """FFN with a 3×3 depthwise conv in the middle (positional mixing)."""

    dim: int
    expansion: int

    @nn.compact
    def __call__(self, x):
        hidden = self.dim * self.expansion
        x = nn.Dense(hidden)(x)
        x = nn.Conv(hidden, (3, 3), feature_group_count=hidden, padding="SAME")(x)
        x = nn.gelu(x)
        return nn.Dense(self.dim)(x)


class MiTStage(nn.Module):
    dim: int
    heads: int
    expansion: int
    reduction: int
    num_layers: int
    patch_stride: int

    @nn.compact
    def __call__(self, x):
        k = self.patch_stride + 1  # overlapping patch merging
        x = nn.Conv(self.dim, (k, k), strides=(self.patch_stride,) * 2,
                    padding="SAME")(x)
        for _ in range(self.num_layers):
            x = x + EfficientSelfAttention(self.dim, self.heads, self.reduction)(
                nn.LayerNorm()(x)
            )
            x = x + MixFFN(self.dim, self.expansion)(nn.LayerNorm()(x))
        return nn.LayerNorm()(x)


class Segformer(ModelBase):
    settings: SegformerSettings = SegformerSettings()

    settings_kls = SegformerSettings
    model_type = ModelType.VISION_TRANSFORMER
    register = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = self.settings
        n_stages = len(s.dims)
        total_stride = 4 * 2 ** (n_stages - 1)
        x0 = nn.Conv(s.num_downsampling_chans, (3, 3), padding="SAME")(x)
        x0, hw = pad_to_multiple(x0, total_stride)

        feats = []
        h = x0
        for i in range(n_stages):
            h = MiTStage(
                dim=s.dims[i],
                heads=s.heads[i],
                expansion=s.ff_expansion[i],
                reduction=s.reduction_ratio[i],
                num_layers=s.num_layers,
                patch_stride=4 if i == 0 else 2,
            )(h)
            feats.append(h)

        # all-MLP decoder: project every stage to decoder_dim at 1/4 res
        th, tw = feats[0].shape[1], feats[0].shape[2]
        fused = []
        for f in feats:
            f = nn.Dense(s.decoder_dim)(f)
            if f.shape[1] != th or f.shape[2] != tw:
                f = _bilinear_resize(f, th, tw)
            fused.append(f)
        y = jnp.concatenate(fused, axis=-1)
        y = nn.Conv(s.decoder_dim, (1, 1))(y)
        y = nn.gelu(y)
        y = nn.Conv(self.num_output_features, (1, 1))(y)
        y = _bilinear_resize(y, x0.shape[1], x0.shape[2])
        y = crop_to(y, hw)
        return y[:, : x.shape[1], : x.shape[2], :]
