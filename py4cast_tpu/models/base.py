"""Model-layer contract: model types, settings machinery, base module.

TPU-native re-design of the reference model contract (reference:
mfai ModelABC surface used by py4cast/models.py:78-89 and
doc/add_features_contribute.md:19-60). Key differences, by design:

- Models are Flax linen modules; the constructor contract is the same
  four logical arguments ``(num_input_features, num_output_features,
  input_shape, settings)`` expressed as dataclass fields.
- Everything is **features-last (NHWC)** — the TPU-preferred layout —
  so the reference's ``features_second`` transposition logic
  (lightning.py:592-596) has no equivalent here.
- Normalization layers are GroupNorm/LayerNorm (stateless), never
  BatchNorm: no mutable batch statistics to thread through jit and no
  cross-device stat syncing.
- GNN models receive their precomputed static graph via a
  ``graph`` field (see ``models/graph``); the reference's
  ``rank_zero_setup`` is the host-side ``build_graph`` classmethod.
"""

from __future__ import annotations

import dataclasses
from enum import Enum
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ModelType(Enum):
    CONVOLUTIONAL = "convolutional"
    VISION_TRANSFORMER = "vision_transformer"
    GRAPH = "graph"


def settings_from_dict(settings_kls, d: Optional[dict]):
    """Instantiate a settings dataclass from a dict, rejecting unknown keys.

    (reference: py4cast/models.py:50-63)
    """
    d = d or {}
    known = {f.name for f in dataclasses.fields(settings_kls)}
    unknown = set(d) - known
    if unknown:
        raise ValueError(
            f"Unknown settings for {settings_kls.__name__}: {sorted(unknown)}; "
            f"accepted: {sorted(known)}"
        )
    coerced = {}
    for f in dataclasses.fields(settings_kls):
        if f.name in d:
            v = d[f.name]
            if isinstance(v, list):
                v = tuple(v)
            coerced[f.name] = v
    return settings_kls(**coerced)


class ModelBase(nn.Module):
    """Base class for all py4cast_tpu models.

    Subclasses set the class attributes below and implement ``__call__``
    taking a features-last array:
    - CONVOLUTIONAL / VISION_TRANSFORMER: (B, lat, lon, num_input_features)
    - GRAPH: (B, ngrid, num_input_features)
    and return the same layout with ``num_output_features`` channels.
    """

    num_input_features: int
    num_output_features: int
    input_shape: Tuple[int, ...]

    # ---- class attributes (the contract) ----
    settings_kls = None
    model_type: ModelType = ModelType.CONVOLUTIONAL
    supported_num_spatial_dims: Tuple[int, ...] = (2,)
    features_last: bool = True  # always; NHWC is the TPU-native layout
    register: bool = False

    @property
    def num_spatial_dims(self) -> int:
        return len(self.input_shape)

    @property
    def spatial_shardable(self) -> bool:
        """Whether the forward tolerates the grid's lat dim being sharded
        over the mesh 'spatial' axis (XLA inserts halo exchanges /
        collectives). True for the conv/attention grid models; GRAPH
        models override (lattice-form message passing shards, gather
        tables do not)."""
        return True


def pad_to_multiple(x: jnp.ndarray, multiple: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Zero-pad the two spatial dims of NHWC ``x`` up to a multiple.

    TPU-native analog of the reference's ``autopad`` wrapper (mfai
    AutoPadTo* used via ``autopad_enabled``): XLA requires static shapes,
    so padding amounts are computed at trace time from static dims.
    Returns the padded array and the original (H, W) for cropping back.
    """
    h, w = x.shape[1], x.shape[2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return x, (h, w)


def crop_to(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    return x[:, : hw[0], : hw[1], :]


def _gn(num_channels: int, name=None) -> nn.GroupNorm:
    """GroupNorm with up to 8 groups, degrading toward layer-norm-like
    when the channel count is not divisible (the zoo's default norm)."""
    groups = 8
    while groups > 1 and num_channels % groups != 0:
        groups //= 2
    return nn.GroupNorm(num_groups=groups, name=name)


def norm_layer(name: str, features: int) -> nn.Module:
    """Map the reference's ``norm_name`` setting onto a stateless norm.

    The reference zoo (mfai/monai blocks) accepts instance/batch/group/
    layer norms; on TPU only the stateless ones make sense (BatchNorm
    carries mutable batch statistics through jit and needs cross-device
    stat syncing — see the module docstring). InstanceNorm IS GroupNorm
    with one group per channel; LayerNorm-over-channels is GroupNorm
    with a single group.

    'instance' is affine-FREE (no learnable scale/bias), matching torch
    ``InstanceNorm2d``'s ``affine=False`` default that the reference zoo
    inherits via monai — carrying affine params here would add weights
    the reference doesn't have (and weight-decay them). Checkpoints from
    before this change have a different param tree for SwinUNetR/UNetRPP;
    ``checkpoint.CHECKPOINT_FORMAT_VERSION`` gates restores loudly.
    """
    if name in ("instance", "INSTANCE"):
        return nn.GroupNorm(num_groups=features, use_scale=False,
                            use_bias=False)
    if name in ("layer", "LAYER"):
        return nn.GroupNorm(num_groups=1)
    if name in ("group", "GROUP"):
        return _gn(features)
    if name in ("batch", "BATCH"):
        raise ValueError(
            "norm_name 'batch' is unsupported on TPU by design: BatchNorm "
            "carries mutable running statistics through jit and requires "
            "cross-device stat synchronization. Use 'instance', 'group' "
            "or 'layer' (the reference's own default here is 'instance')."
        )
    raise ValueError(
        f"Unknown norm_name {name!r}; accepted: instance | group | layer"
    )


class DropPath(nn.Module):
    """Stochastic depth: drop a residual branch per SAMPLE with
    probability ``rate`` during training, identity at eval (standard
    swin/timm semantics — survivors are rescaled by 1/keep so the
    expectation matches). Exactly nn.Dropout with the mask broadcast
    over every non-batch dim."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return nn.Dropout(
            self.rate, broadcast_dims=tuple(range(1, x.ndim))
        )(x, deterministic=deterministic)


ACTIVATIONS: dict = {
    "Identity": lambda x: x,
    "ReLU": nn.relu,
    "GELU": nn.gelu,
    "SiLU": nn.silu,
    "Tanh": jnp.tanh,
    "Sigmoid": nn.sigmoid,
    None: lambda x: x,
    "null": lambda x: x,
    "softmax": lambda x: nn.softmax(x, axis=-1),
}


def get_activation(name) -> Callable:
    if callable(name):
        return name
    if name not in ACTIVATIONS:
        raise ValueError(f"Unknown activation {name!r}; known: {list(ACTIVATIONS)}")
    return ACTIVATIONS[name]
