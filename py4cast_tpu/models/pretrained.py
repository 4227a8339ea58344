"""Pretrained ResNet-encoder checkpoints: npz format, loading, adaptation.

The reference's CustomUNet/DeepLab default to ImageNet-pretrained
encoders via segmentation-models-pytorch
(reference: config/CLI/model/customunet.yaml `encoder_weights`). This
environment has no network access, so pretrained weights arrive as an
npz produced by either:

- ``bin/convert_torchvision_encoder.py`` — converts a torchvision
  resnet18/34 state_dict the user supplies (ImageNet weights, BatchNorm
  running stats folded into affine norms), or
- ``bin/pretrain_encoder.py`` — self-supervised pretraining on synthetic
  multi-scale random fields, fully offline.

npz layout: flat keys ``<module path>/<param>`` matching the
ResNetEncoder naming (e.g. ``stage0_block1/conv2/kernel``), plus
``__meta__`` (json: encoder_name, norm kind, in_channels).
First-layer kernels are adapted to the model's input channel count by
cyclic tiling + 3/C rescale (the segmentation-models strategy).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Union

import numpy as np

from py4cast_tpu.settings import ROOTDIR


#: committed fallback artifacts (fp16, produced by
#: bin/pretrain_encoder.py on synthetic multi-scale fields) so
#: ``encoder_weights: true`` works out of the box with zero setup
_REPO_PRETRAINED = Path(__file__).resolve().parents[2] / "data" / "pretrained"


def default_weights_path(encoder_name: str) -> Path:
    """User-produced weights (ROOTDIR) win over the committed fallback."""
    user = ROOTDIR / "pretrained" / f"{encoder_name}.npz"
    if user.exists():
        return user
    bundled = _REPO_PRETRAINED / f"{encoder_name}.npz"
    return bundled if bundled.exists() else user


def adapt_in_channels(kernel: np.ndarray, in_channels: int) -> np.ndarray:
    """(H, W, C0, O) → (H, W, in_channels, O) by cyclic tiling, rescaled
    by C0/in_channels so activation magnitudes are preserved."""
    c0 = kernel.shape[2]
    if c0 == in_channels:
        return kernel
    reps = -(-in_channels // c0)
    tiled = np.tile(kernel, (1, 1, reps, 1))[:, :, :in_channels]
    return tiled * (c0 / float(in_channels))


def save_encoder_npz(path: Path, flat_params: dict, meta: dict) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in flat_params.items()}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)
    return path


def load_encoder_npz(path: Path):
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    return flat, meta


def maybe_load_encoder(variables, settings, num_input_features: int):
    """Merge pretrained encoder weights into freshly-initialized model
    variables, honoring settings.encoder_weights (False | True | path)."""
    spec = settings.encoder_weights
    if not spec:
        return variables
    path = (
        Path(spec) if isinstance(spec, str)
        else default_weights_path(settings.encoder_name)
    )
    if not path.exists():
        raise FileNotFoundError(
            f"encoder_weights requested but {path} does not exist. Produce "
            "it with bin/convert_torchvision_encoder.py (torchvision "
            "ImageNet checkpoint) or bin/pretrain_encoder.py (offline "
            "self-supervised)."
        )
    flat, meta = load_encoder_npz(path)
    if meta.get("norm") != settings.encoder_norm:
        raise ValueError(
            f"{path} carries {meta.get('norm')!r}-norm weights but the "
            f"model is configured with encoder_norm={settings.encoder_norm!r}"
        )
    if meta.get("encoder_name") != settings.encoder_name:
        raise ValueError(
            f"{path} is for {meta.get('encoder_name')!r}, model wants "
            f"{settings.encoder_name!r}"
        )

    from flax import traverse_util

    params = traverse_util.flatten_dict(variables["params"], sep="/")
    enc_prefix = "encoder/"
    loaded, missing = 0, []
    for key, value in flat.items():
        full = enc_prefix + key
        if full not in params:
            missing.append(key)
            continue
        if key == "stem_conv/kernel":
            value = adapt_in_channels(value, num_input_features)
        if params[full].shape != value.shape:
            raise ValueError(
                f"Shape mismatch for {full}: model {params[full].shape} "
                f"vs checkpoint {value.shape}"
            )
        params[full] = value.astype(params[full].dtype)
        loaded += 1
    if loaded == 0:
        raise ValueError(
            f"No parameter of {path} matched the encoder "
            f"(first missing: {missing[:3]})"
        )
    new_params = traverse_util.unflatten_dict(params, sep="/")
    return {**variables, "params": new_params}
