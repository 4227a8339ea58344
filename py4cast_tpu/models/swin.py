"""SwinUNetR: Swin-transformer encoder + UNETR-style conv decoder.

TPU-native Flax implementation with the reference settings surface
(reference config: config/CLI/model/swinunetr.yaml — depths/num_heads/
feature_size/drop rates/normalize/downsample). Windowed attention is
laid out as batched (windows × tokens) matmuls for the MXU; the shifted-
window mask is a trace-time constant (static shapes), so XLA folds it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from py4cast_tpu.models.base import ModelBase, ModelType, crop_to, pad_to_multiple
from py4cast_tpu.models.unet import _gn


@dataclass(frozen=True)
class SwinUNetRSettings:
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    feature_size: int = 24
    norm_name: str = "instance"
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    dropout_path_rate: float = 0.0
    normalize: bool = True
    use_checkpoint: bool = False
    downsample: str = "merging"
    use_v2: bool = False
    window_size: int = 7


def _window_partition(x, ws: int):
    """(B, H, W, C) → (B*nH*nW, ws*ws, C)"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(-1, ws * ws, c)


def _window_reverse(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h, w, -1)


def _shift_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static attention mask for shifted windows: (nW, ws*ws, ws*ws),
    0 where tokens share a region, -inf otherwise."""
    img = np.zeros((1, h, w, 1), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    wins = img.reshape(1, h // ws, ws, w // ws, ws, 1)
    wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff == 0, 0.0, -1e9).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    ws: int

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nB, T, C) with T = ws*ws
        nb, t, c = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, use_bias=True)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(a):
            return a.reshape(nb, t, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = map(heads_first, (q, k, v))
        # relative position bias (Swin): one bias per (head, rel_h, rel_w)
        rpb = self.param(
            "rel_pos_bias",
            nn.initializers.truncated_normal(0.02),
            (self.heads, (2 * self.ws - 1) ** 2),
        )
        coords = np.stack(
            np.meshgrid(np.arange(self.ws), np.arange(self.ws), indexing="ij")
        ).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :] + self.ws - 1
        rel_idx = (rel[0] * (2 * self.ws - 1) + rel[1]).astype(np.int32)
        bias = rpb[:, rel_idx]  # (heads, T, T)

        attn = jnp.einsum(
            "bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(head_dim).astype(q.dtype)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(nb // nw, nw, self.heads, t, t) + mask[None, :, None]
            attn = attn.reshape(nb, self.heads, t, t)
        # softmax in f32 for stability, back to the compute dtype so the
        # value matmul and downstream layers stay bf16 under the policy
        attn = nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v).transpose(0, 2, 1, 3)
        return nn.Dense(self.dim)(out.reshape(nb, t, self.dim))


class SwinBlock(nn.Module):
    dim: int
    heads: int
    ws: int
    shift: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm()(x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(h, w, self.ws, self.shift))
        else:
            mask = None
        wins = _window_partition(y, self.ws)
        wins = WindowAttention(self.dim, self.heads, self.ws)(wins, mask)
        y = _window_reverse(wins, self.ws, h, w)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + y
        z = nn.LayerNorm()(x)
        z = nn.Dense(self.dim * 4)(z)
        z = nn.gelu(z)
        z = nn.Dense(self.dim)(z)
        return x + z


class SwinStage(nn.Module):
    dim: int
    depth: int
    heads: int
    ws: int

    @nn.compact
    def __call__(self, x):
        # pad to window multiple, run blocks, crop back
        x, hw = pad_to_multiple(x, self.ws)
        for i in range(self.depth):
            shift = 0 if i % 2 == 0 else self.ws // 2
            x = SwinBlock(self.dim, self.heads, self.ws, shift)(x)
        return crop_to(x, hw)


class PatchMerging(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x, _ = pad_to_multiple(x, 2)
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm()(x)
        return nn.Dense(self.out_dim, use_bias=False)(x)


class ConvBlockRes(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(x)
        y = nn.relu(_gn(self.features)(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(y)
        y = _gn(self.features)(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        return nn.relu(x + y)


class UpBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip):
        x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2))(x)
        if x.shape[1] != skip.shape[1] or x.shape[2] != skip.shape[2]:
            x = x[:, : skip.shape[1], : skip.shape[2], :]
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvBlockRes(self.features)(x)


class SwinUNetR(ModelBase):
    settings: SwinUNetRSettings = SwinUNetRSettings()

    settings_kls = SwinUNetRSettings
    model_type = ModelType.VISION_TRANSFORMER
    register = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = self.settings
        n_stages = len(s.depths)
        total = 2 ** (n_stages + 1)
        x_pad, hw = pad_to_multiple(x, total)
        f = s.feature_size

        # encoder 0: full-res conv features
        enc0 = ConvBlockRes(f)(x_pad)
        # patch embedding (stride 2)
        h = nn.Conv(f, (2, 2), strides=(2, 2))(x_pad)
        skips = [enc0]
        for i in range(n_stages):
            h = SwinStage(h.shape[-1], s.depths[i], s.num_heads[i], s.window_size)(h)
            skips.append(ConvBlockRes(f * 2**i)(h))
            if i < n_stages - 1:
                h = PatchMerging(f * 2 ** (i + 1))(h)

        y = ConvBlockRes(f * 2 ** (n_stages - 1))(skips[-1])
        for i in reversed(range(n_stages - 1)):
            y = UpBlock(f * 2**i)(y, skips[i + 1])
        y = UpBlock(f)(y, skips[0])
        y = nn.Conv(self.num_output_features, (1, 1))(y)
        return crop_to(y, hw)
