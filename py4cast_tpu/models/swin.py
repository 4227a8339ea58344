"""SwinUNetR: Swin-transformer encoder + UNETR-style conv decoder.

TPU-native Flax implementation with the reference settings surface
(reference config: config/CLI/model/swinunetr.yaml — depths/num_heads/
feature_size/drop rates/normalize/downsample), and the whole surface is
HONORED: drop_rate/attn_drop_rate feed nn.Dropout, dropout_path_rate
drives per-block stochastic depth on the timm linear schedule, use_v2
adds the per-stage residual conv block, and norm_name maps onto the
stateless TPU norms (instance = per-channel GroupNorm; batch rejected
at config time). Windowed attention is laid out as batched
(windows × tokens) matmuls for the MXU; the shifted-window mask is a
trace-time constant (static shapes), so XLA folds it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from py4cast_tpu.models.base import (
    DropPath,
    ModelBase,
    ModelType,
    crop_to,
    norm_layer,
    pad_to_multiple,
)


@dataclass(frozen=True)
class SwinUNetRSettings:
    #: fields that enable train-time dropout rngs when nonzero — the
    #: trainer derives its deterministic/rng plumbing from this tuple
    #: (training.py _dropout_active); an undeclared nonzero drop field
    #: is rejected at module build
    DROPOUT_FIELDS = ("drop_rate", "attn_drop_rate", "dropout_path_rate")

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

    def __post_init__(self):
        # fail at CONFIG time, not trace time (framework-wide policy)
        norm_layer(self.norm_name, 8)
        for f in ("drop_rate", "attn_drop_rate", "dropout_path_rate"):
            v = getattr(self, f)
            if not 0.0 <= v < 1.0:
                raise ValueError(f"{f} must be in [0, 1); got {v}")
        if self.downsample != "merging":
            raise ValueError(
                f"downsample {self.downsample!r} unsupported; only 'merging' "
                "(patch merging — the reference default) is implemented"
            )


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
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
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
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhts,bhsd->bhtd", attn, v).transpose(0, 2, 1, 3)
        out = nn.Dense(self.dim)(out.reshape(nb, t, self.dim))
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    ws: int
    shift: int
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm()(x)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(h, w, self.ws, self.shift))
        else:
            mask = None
        wins = _window_partition(y, self.ws)
        wins = WindowAttention(
            self.dim, self.heads, self.ws, self.attn_drop, self.drop
        )(wins, mask, deterministic=deterministic)
        y = _window_reverse(wins, self.ws, h, w)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + DropPath(self.drop_path)(y, deterministic)
        z = nn.LayerNorm()(x)
        z = nn.Dense(self.dim * 4)(z)
        z = nn.gelu(z)
        z = nn.Dropout(self.drop)(z, deterministic=deterministic)
        z = nn.Dense(self.dim)(z)
        z = nn.Dropout(self.drop)(z, deterministic=deterministic)
        return x + DropPath(self.drop_path)(z, deterministic)


class SwinStage(nn.Module):
    dim: int
    depth: int
    heads: int
    ws: int
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Tuple[float, ...] = ()  # per-block stochastic-depth rates

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # pad to window multiple, run blocks, crop back
        x, hw = pad_to_multiple(x, self.ws)
        for i in range(self.depth):
            shift = 0 if i % 2 == 0 else self.ws // 2
            dp = self.drop_path[i] if i < len(self.drop_path) else 0.0
            x = SwinBlock(
                self.dim, self.heads, self.ws, shift,
                self.drop, self.attn_drop, dp,
            )(x, deterministic=deterministic)
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
    norm_name: str = "instance"

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(x)
        y = nn.relu(norm_layer(self.norm_name, self.features)(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(y)
        y = norm_layer(self.norm_name, self.features)(y)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        return nn.relu(x + y)


class UpBlock(nn.Module):
    features: int
    norm_name: str = "instance"

    @nn.compact
    def __call__(self, x, skip):
        x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2))(x)
        if x.shape[1] != skip.shape[1] or x.shape[2] != skip.shape[2]:
            x = x[:, : skip.shape[1], : skip.shape[2], :]
        x = jnp.concatenate([x, skip], axis=-1)
        return ConvBlockRes(self.features, self.norm_name)(x)


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

        # stochastic-depth rates increase linearly over ALL transformer
        # blocks (standard swin/timm schedule)
        total_blocks = max(1, sum(s.depths))
        dpr = [
            s.dropout_path_rate * i / max(1, total_blocks - 1)
            for i in range(total_blocks)
        ]
        offsets = np.cumsum((0,) + tuple(s.depths))

        # encoder 0: full-res conv features
        enc0 = ConvBlockRes(f, s.norm_name)(x_pad)
        # patch embedding (stride 2) + embedding dropout
        h = nn.Conv(f, (2, 2), strides=(2, 2))(x_pad)
        h = nn.Dropout(s.drop_rate)(h, deterministic=deterministic)
        skips = [enc0]
        for i in range(n_stages):
            if s.use_v2:
                # swin v2 variant: a residual conv block refines each
                # stage's tokens before its transformer blocks
                h = ConvBlockRes(h.shape[-1], s.norm_name, name=f"v2_block{i}")(h)
            h = SwinStage(
                h.shape[-1], s.depths[i], s.num_heads[i], s.window_size,
                s.drop_rate, s.attn_drop_rate,
                tuple(dpr[offsets[i]:offsets[i + 1]]),
            )(h, deterministic=deterministic)
            # normalize: layer-norm each stage's hidden state before it
            # feeds the decoder skip (the reference swin encoder's
            # proj_out); the stage chain itself continues unnormalized
            skip_src = nn.LayerNorm()(h) if s.normalize else h
            skips.append(ConvBlockRes(f * 2**i, s.norm_name)(skip_src))
            if i < n_stages - 1:
                h = PatchMerging(f * 2 ** (i + 1))(h)

        y = ConvBlockRes(f * 2 ** (n_stages - 1), s.norm_name)(skips[-1])
        for i in reversed(range(n_stages - 1)):
            y = UpBlock(f * 2**i, s.norm_name)(y, skips[i + 1])
        y = UpBlock(f, s.norm_name)(y, skips[0])
        y = nn.Conv(self.num_output_features, (1, 1))(y)
        return crop_to(y, hw)
