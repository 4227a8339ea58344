"""UNETR++ with Efficient Paired Attention (EPA).

TPU-native Flax implementation with the reference settings surface
(reference config: config/CLI/model/unetrpp.yaml — hidden_size/
num_heads_encoder/num_heads_decoder/depths/proj sizes/linear_upsampling/
downsampling_rate/add_skip_connections). EPA (Shaker et al. 2023) pairs
a spatial-attention branch whose K/V are projected to a small fixed
token count (proj_size) with a channel-attention branch over C×C —
both are small dense matmuls that map straight onto the MXU, which is
why no flash-attention kernel is needed here (the reference needs one
on GPU: Dockerfile.ewc_flash_attn:31).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import numpy as np
import jax.numpy as jnp

from py4cast_tpu.models.base import (
    ModelBase,
    ModelType,
    crop_to,
    norm_layer,
    pad_to_multiple,
)
from py4cast_tpu.models.unet import _bilinear_resize


@dataclass(frozen=True)
class UNetRPPSettings:
    #: see SwinUNetRSettings.DROPOUT_FIELDS — trainer rng plumbing
    DROPOUT_FIELDS = ("dropout_rate",)

    hidden_size: int = 256
    num_heads_encoder: int = 16
    num_heads_decoder: int = 4
    pos_embed: str = "perceptron"
    norm_name: str = "instance"
    dropout_rate: float = 0.0
    depths: Tuple[int, ...] = (3, 3, 3, 3)
    conv_op: str = "Conv2d"
    linear_upsampling: bool = False
    downsampling_rate: int = 4
    decoder_proj_size: int = 64
    encoder_proj_sizes: Tuple[int, ...] = (64, 64, 64, 32)
    add_skip_connections: bool = True
    #: attention backend. "torch"/"xla" → plain XLA einsum attention
    #: (measured FASTER under current XLA — doc/performance.md round 4);
    #: "flash_attn"/"pallas" → the Pallas short-KV kernel (the TPU analog
    #: of the reference's flash-attn wheel, Dockerfile.ewc_flash_attn:31).
    attention_code: str = "xla"

    def __post_init__(self):
        norm_layer(self.norm_name, 8)  # config-time validation
        if not 0.0 <= self.dropout_rate < 1.0:
            raise ValueError(f"dropout_rate must be in [0, 1); got {self.dropout_rate}")
        if self.conv_op != "Conv2d":
            raise ValueError(
                f"conv_op {self.conv_op!r} unsupported: this build is 2-D "
                "NHWC (Conv2d) only, matching the framework's grid layout"
            )
        if self.attention_code not in ("torch", "xla", "flash_attn", "pallas"):
            raise ValueError(
                f"attention_code {self.attention_code!r} unknown; accepted: "
                "torch | xla (XLA attention), flash_attn | pallas "
                "(Pallas short-KV kernel)"
            )
        if self.pos_embed not in ("perceptron", "none"):
            raise ValueError(
                f"pos_embed {self.pos_embed!r} unknown; accepted: "
                "perceptron | none"
            )


class EPA(nn.Module):
    """Efficient Paired Attention: spatial branch (K/V projected to
    proj_size tokens) + channel branch (C×C), shared Q/K weights."""

    dim: int
    heads: int
    proj_size: int
    drop: float = 0.0
    pallas: bool = False  # attention_code: pallas | flash_attn

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (B, N, C)
        b, n, c = x.shape
        hd = self.dim // self.heads
        qkvv = nn.Dense(self.dim * 4, use_bias=False)(x)  # q, k shared; v_sp, v_ch
        q, k, v_sp, v_ch = jnp.split(qkvv, 4, axis=-1)

        def split_heads(a):  # (B, heads, N, hd)
            return a.reshape(b, n, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v_sp, v_ch = map(split_heads, (q, k, v_sp, v_ch))

        # ---- channel attention branch: (hd × hd) per head
        qn = q / (jnp.linalg.norm(q, axis=-2, keepdims=True) + 1e-6)
        kn = k / (jnp.linalg.norm(k, axis=-2, keepdims=True) + 1e-6)
        temp = self.param("temperature", nn.initializers.ones, (self.heads, 1, 1))
        attn_ch = jnp.einsum(
            "bhnd,bhne->bhde", qn, kn, preferred_element_type=jnp.float32
        ) * temp
        # softmax in f32 for stability, back to the compute dtype so the
        # value matmul (and everything downstream) stays bf16 under the
        # mixed-precision policy
        attn_ch = nn.softmax(attn_ch, axis=-1).astype(v_ch.dtype)
        out_ch = jnp.einsum("bhde,bhne->bhnd", attn_ch, v_ch)

        # ---- spatial attention branch: K/V projected to proj_size tokens
        p = min(self.proj_size, n)
        proj_k = self.param(
            "proj_k", nn.initializers.truncated_normal(0.02), (n, p)
        )
        proj_v = self.param(
            "proj_v", nn.initializers.truncated_normal(0.02), (n, p)
        )
        k_p = jnp.einsum("bhnd,np->bhpd", k, proj_k)
        v_p = jnp.einsum("bhnd,np->bhpd", v_sp, proj_v)
        from py4cast_tpu.ops.attention import (
            short_kv_attention,
            use_pallas_attention,
        )

        if use_pallas_attention(p, hd, requested=self.pallas):
            # N queries × p projected K/V tokens: the Pallas short-KV
            # kernel keeps K/V in VMEM and never materializes (N, p)
            # logits in HBM
            out_sp = short_kv_attention(
                q.reshape(b * self.heads, n, hd),
                k_p.reshape(b * self.heads, p, hd),
                v_p.reshape(b * self.heads, p, hd),
                float(1.0 / np.sqrt(hd)),
            ).reshape(b, self.heads, n, hd)
        else:
            attn_sp = jnp.einsum(
                "bhnd,bhpd->bhnp", q, k_p, preferred_element_type=jnp.float32
            ) / jnp.sqrt(hd).astype(q.dtype)
            attn_sp = nn.softmax(attn_sp, axis=-1).astype(v_p.dtype)
            out_sp = jnp.einsum("bhnp,bhpd->bhnd", attn_sp, v_p)

        def merge(a):
            return a.transpose(0, 2, 1, 3).reshape(b, n, self.dim)

        fused = nn.Dense(self.dim)(merge(out_sp)) + nn.Dense(self.dim)(merge(out_ch))
        return nn.Dropout(self.drop)(fused, deterministic=deterministic)


class EPABlock(nn.Module):
    dim: int
    heads: int
    proj_size: int
    drop: float = 0.0
    pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (B, H, W, C) — tokens are the spatial positions
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        t = t + EPA(self.dim, self.heads, self.proj_size, self.drop,
                    self.pallas)(nn.LayerNorm()(t), deterministic)
        y = t.reshape(b, h, w, c)
        # conv FFN (3x3 depthwise + pointwise), the UNETR++ conv stem
        z = nn.Conv(self.dim * 2, (3, 3), padding="SAME")(y)
        z = nn.gelu(z)
        z = nn.Dropout(self.drop)(z, deterministic=deterministic)
        z = nn.Conv(self.dim, (3, 3), padding="SAME")(z)
        return y + z


class _EPAScanStep(nn.Module):
    """One scanned EPA block: a stage's ``depths[i]`` repeats compile as
    ONE block body over stacked per-layer params (nn.scan) instead of
    statically unrolling — the compile-time lever for deep configs
    (depths (3,3,3,3) unrolled took >10 min to compile on TPU)."""

    dim: int
    heads: int
    proj_size: int
    drop: float = 0.0
    pallas: bool = False
    deterministic: bool = True  # static at stage construction (trace time)

    @nn.compact
    def __call__(self, carry, _):
        y = EPABlock(self.dim, self.heads, self.proj_size, self.drop,
                     self.pallas, name="block")(carry, self.deterministic)
        return y, None


def _epa_stage(h, depth: int, dim: int, heads: int, proj_size: int, name: str,
               drop: float = 0.0, pallas: bool = False,
               deterministic: bool = True):
    if depth <= 1:
        return EPABlock(dim, heads, proj_size, drop, pallas, name=name)(
            h, deterministic
        )
    # scan-over-remat: recompute the block interior in the backward
    # instead of stacking per-repeat residuals (see graph._scan_layers —
    # the residual save/prefetch path costs multiples of the block's own
    # compute on TPU)
    scan = nn.scan(
        nn.remat(_EPAScanStep, prevent_cse=False),
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        length=depth,
    )(dim=dim, heads=heads, proj_size=proj_size, drop=drop, pallas=pallas,
      deterministic=deterministic, name=name)
    h, _ = scan(h, None)
    return h


class UNetRPP(ModelBase):
    settings: UNetRPPSettings = UNetRPPSettings()

    settings_kls = UNetRPPSettings
    model_type = ModelType.VISION_TRANSFORMER
    register = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        s = self.settings
        n_stages = len(s.depths)
        dr = s.downsampling_rate
        total = dr * 2 ** (n_stages - 1)
        x_pad, hw = pad_to_multiple(x, total)
        dims = [s.hidden_size // 2**i for i in reversed(range(n_stages))]
        pallas = s.attention_code in ("pallas", "flash_attn")

        # full-res conv stem used as the outermost skip
        stem = nn.Conv(dims[0] // 2, (3, 3), padding="SAME")(x_pad)
        stem = nn.gelu(norm_layer(s.norm_name, dims[0] // 2)(stem))

        # encoder
        h = nn.Conv(dims[0], (dr, dr), strides=(dr, dr))(x_pad)  # patch embed
        if s.pos_embed == "perceptron":
            h = nn.Dense(dims[0])(h)
        h = nn.Dropout(s.dropout_rate)(h, deterministic=deterministic)
        skips = []
        for i in range(n_stages):
            h = _epa_stage(
                h, s.depths[i], dims[i], s.num_heads_encoder,
                s.encoder_proj_sizes[i], name=f"enc_stage{i}",
                drop=s.dropout_rate, pallas=pallas,
                deterministic=deterministic,
            )
            skips.append(h)
            if i < n_stages - 1:
                h = nn.Conv(dims[i + 1], (2, 2), strides=(2, 2))(h)

        # decoder
        y = skips[-1]
        for i in reversed(range(n_stages - 1)):
            if s.linear_upsampling:
                y = _bilinear_resize(y, skips[i].shape[1], skips[i].shape[2])
                y = nn.Conv(dims[i], (1, 1))(y)
            else:
                y = nn.ConvTranspose(dims[i], (2, 2), strides=(2, 2))(y)
            if s.add_skip_connections:
                y = y + skips[i]
            y = EPABlock(dims[i], s.num_heads_decoder, s.decoder_proj_size,
                         s.dropout_rate, pallas)(y, deterministic)

        # back to full resolution
        if s.linear_upsampling:
            y = _bilinear_resize(y, x_pad.shape[1], x_pad.shape[2])
            y = nn.Conv(dims[0] // 2, (1, 1))(y)
        else:
            y = nn.ConvTranspose(dims[0] // 2, (dr, dr), strides=(dr, dr))(y)
        y = jnp.concatenate([y, stem], axis=-1)
        y = nn.Conv(dims[0] // 2, (3, 3), padding="SAME")(y)
        y = nn.gelu(norm_layer(s.norm_name, dims[0] // 2)(y))
        y = nn.Conv(self.num_output_features, (1, 1))(y)
        return crop_to(y, hw)
