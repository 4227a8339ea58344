"""Loss functions over NamedArray predictions.

TPU-native re-design of the reference loss system (reference:
py4cast/losses.py). Losses are pure jit-safe callables: per-feature
weight vectors are precomputed on host at ``prepare()`` time from
``DatasetInfo`` (names are static), the interior mask rides along as an
array, and the mask-union correction matches the reference
(losses.py:156-167, 197-203) so RMSE parity holds.

Losses return per-(batch, timestep) values; ``CombinedLoss`` sums its
members with config weights (losses.py:263-307).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

#: elementwise losses by their torch-style config names
ELEMENTWISE: dict = {
    "MSELoss": lambda a, b: (a - b) ** 2,
    "L1Loss": lambda a, b: jnp.abs(a - b),
    "HuberLoss": lambda a, b: jnp.where(
        jnp.abs(a - b) < 1.0, 0.5 * (a - b) ** 2, jnp.abs(a - b) - 0.5
    ),
    "SmoothL1Loss": lambda a, b: jnp.where(
        jnp.abs(a - b) < 1.0, 0.5 * (a - b) ** 2, jnp.abs(a - b) - 0.5
    ),
}


def _spatial_axes(ndim: int) -> Tuple[int, ...]:
    """Spatial axes of a (B, T, *spatial, F) array."""
    return tuple(range(2, ndim - 1))


class Py4CastLoss:
    """Base: resolves the elementwise loss by name (reference: losses.py:25-31)."""

    #: shape of __call__'s return — "bt" for (B, T), "btf" for (B, T, F).
    #: CombinedLoss can only sum members with the SAME output shape.
    output_shape: str = "bt"

    def __init__(self, loss: str = "MSELoss", reduction: str = "none", **_):
        if loss not in ELEMENTWISE:
            raise NameError(f"Loss: {loss} is not defined; known: {list(ELEMENTWISE)}")
        self.loss_name = loss
        self.elementwise: Callable = ELEMENTWISE[loss]
        self.interior_mask: Optional[jnp.ndarray] = None
        self.num_interior: float = 0.0
        self.weights: Optional[jnp.ndarray] = None

    def prepare(self, interior_mask, dataset_info, feature_names: Sequence[str]):
        raise NotImplementedError

    def __call__(self, prediction, target, mask) -> jnp.ndarray:
        raise NotImplementedError

    def _union_denominator(self, mask) -> jnp.ndarray:
        """num_interior corrected by all-invalid spatial points
        (reference: losses.py:156-167)."""
        union = jnp.any(
            mask != 0, axis=(0, 1, mask.ndim - 1)
        )  # (*spatial,) any over batch/time/features
        return self.num_interior - jnp.sum(~union)


class WeightedLoss(Py4CastLoss):
    """Per-feature weighted loss, interior-masked spatial mean → (B, T).

    weight[f] = state_weight[f] / diff_std[f]^p, p = 2 for MSE else 1
    (reference: losses.py:103-169).
    """

    def prepare(self, interior_mask, dataset_info, feature_names: Sequence[str]):
        p = 2.0 if self.loss_name == "MSELoss" else 1.0
        w = np.asarray(
            [
                dataset_info.state_weights[n]
                / (dataset_info.diff_stats[n]["std"] ** p)
                for n in feature_names
            ],
            np.float32,
        )
        self.weights = jnp.asarray(w)
        self.interior_mask = jnp.asarray(
            np.asarray(interior_mask, np.float32)
        ).squeeze(-1)  # (*spatial,)
        self.num_interior = float(np.sum(np.asarray(interior_mask)))

    def __call__(self, prediction, target, mask, reduce_spatial_dim: bool = True,
                 interior_mask=None):
        pred, tgt = prediction.array, target.array
        elem = self.elementwise(pred * mask, tgt * mask)
        weighted = jnp.sum(elem * self.weights, axis=-1)  # (B, T, *spatial)
        if not reduce_spatial_dim:
            return weighted
        denom = self._union_denominator(mask)
        sp = tuple(range(2, weighted.ndim))
        # interior_mask threaded in by jitted callers ((*spatial, 1) —
        # passing it as an argument keeps it out of the compiled program;
        # the prepared copy serves host-side/plotter calls
        im = (
            interior_mask.squeeze(-1)
            if interior_mask is not None
            else self.interior_mask
        )
        return jnp.sum(weighted * im, axis=sp) / denom


class ScaledLoss(Py4CastLoss):
    """Per-feature std-rescaled loss → (B, T, F); sqrt for MSE (→RMSE)
    (reference: losses.py:172-210)."""

    output_shape = "btf"

    def prepare(self, interior_mask, dataset_info, feature_names: Sequence[str]):
        w = np.asarray(
            [dataset_info.stats[n]["std"] for n in feature_names], np.float32
        )
        self.weights = jnp.asarray(w)
        self.interior_mask = jnp.asarray(
            np.asarray(interior_mask, np.float32)
        )  # (*spatial, 1)
        self.num_interior = float(np.sum(np.asarray(interior_mask)))

    def __call__(self, prediction, target, mask, interior_mask=None):
        pred, tgt = prediction.array, target.array
        elem = self.elementwise(pred * mask, tgt * mask)  # (B, T, *sp, F)
        denom = self._union_denominator(mask)
        sp = _spatial_axes(elem.ndim)
        im = interior_mask if interior_mask is not None else self.interior_mask
        mean_loss = jnp.sum(elem * im, axis=sp) / denom  # (B,T,F)
        if self.loss_name == "MSELoss":
            mean_loss = jnp.sqrt(mean_loss)
        return mean_loss * self.weights


class PerceptualLossPy4Cast(Py4CastLoss):
    """Feature-space perceptual loss on min-max-normalized fields.

    The reference wraps mfai's pretrained-VGG16 PerceptualLoss
    (losses.py:213-260). Pretrained VGG weights cannot be downloaded
    here, so this ships its own TRAINED feature extractor: a small conv
    encoder trained as a denoising autoencoder on synthetic multi-scale
    random fields (bin/train_perceptual_features.py, weights in
    py4cast_tpu/data/perceptual_feats.npz). Applied channel-iteratively
    (each physical field through the single-channel encoder — the mfai
    multi-channel strategy). A fixed random conv pyramid remains as a
    fallback when the weights file is absent (``trained=False``).
    """

    def __init__(self, in_channels: int = 1, num_scales: int = 3,
                 trained: bool = True, **_):
        self.in_channels = in_channels  # accepted for config parity
        self.num_scales = num_scales
        self.trained = trained
        self._kernels = None
        self._biases = None

    def _load_trained(self) -> bool:
        from pathlib import Path

        path = Path(__file__).parent / "data" / "perceptual_feats.npz"
        if not path.exists():
            return False
        with np.load(path) as z:
            layers = sorted(
                int(k[1:]) for k in z.files if k.startswith("k")
            )
            self._kernels = [jnp.asarray(z[f"k{i}"]) for i in layers]
            self._biases = [jnp.asarray(z[f"b{i}"]) for i in layers]
        return True

    def prepare(self, interior_mask, dataset_info, feature_names: Sequence[str]):
        loaded = self.trained and self._load_trained()
        if not loaded:
            if self.trained:
                import warnings

                warnings.warn(
                    "perceptual_feats.npz not found — falling back to the "
                    "fixed random feature pyramid"
                )
            rng = np.random.default_rng(0)
            self._kernels = [
                jnp.asarray(
                    rng.standard_normal((3, 3, 1 if s == 0 else 32, 32))
                    .astype(np.float32)
                    / np.sqrt(9.0 * (1 if s == 0 else 32))
                )
                for s in range(self.num_scales)
            ]
            self._biases = [jnp.zeros(k.shape[-1]) for k in self._kernels]
        self._mins = jnp.asarray(
            [dataset_info.stats[n]["min"] for n in feature_names], jnp.float32
        )
        self._maxs = jnp.asarray(
            [dataset_info.stats[n]["max"] for n in feature_names], jnp.float32
        )
        self._means = jnp.asarray(
            [dataset_info.stats[n]["mean"] for n in feature_names], jnp.float32
        )
        self._stds = jnp.asarray(
            [dataset_info.stats[n]["std"] for n in feature_names], jnp.float32
        )

    def _normalize(self, x):
        raw = x * self._stds + self._means
        return jnp.clip(
            (raw - self._mins) / (self._maxs - self._mins + 1e-8), 0.0, 1.0
        )

    def _features(self, x):
        """x: (N, H, W, 1) → list of feature maps per scale."""
        import jax.lax as lax

        feats = []
        h = x
        for k, b in zip(self._kernels, self._biases):
            h = lax.conv_general_dilated(
                h, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            h = jnp.maximum(h + b, 0.0)
            feats.append(h)
            h = h[:, ::2, ::2, :]  # stride-2 downsample between scales
        return feats

    def __call__(self, prediction, target, mask, interior_mask=None):
        # perceptual features are computed on the full field; the
        # interior_mask kwarg is accepted for CombinedLoss symmetry
        pred = self._normalize(prediction.array) * mask
        tgt = self._normalize(target.array) * mask
        b, t = pred.shape[:2]
        # channel-iterative: every physical field through the 1-channel
        # encoder (fold features into the batch dim)
        spatial = pred.shape[2:-1]
        f = pred.shape[-1]
        pred_flat = jnp.moveaxis(
            pred.reshape((b * t,) + spatial + (f,)), -1, 1
        ).reshape((b * t * f,) + spatial + (1,))
        tgt_flat = jnp.moveaxis(
            tgt.reshape((b * t,) + spatial + (f,)), -1, 1
        ).reshape((b * t * f,) + spatial + (1,))
        loss = 0.0
        for fp, ft in zip(self._features(pred_flat), self._features(tgt_flat)):
            per_img = jnp.mean((fp - ft) ** 2, axis=tuple(range(1, fp.ndim)))
            loss = loss + per_img.reshape(b, t, f).mean(axis=-1)
        return loss


LOSS_CLASSES = {
    "WeightedLoss": WeightedLoss,
    "ScaledLoss": ScaledLoss,
    "PerceptualLossPy4Cast": PerceptualLossPy4Cast,
}


class CombinedLoss(Py4CastLoss):
    """Weighted sum of losses from a config list of
    {class, weight, params} dicts (reference: losses.py:263-307)."""

    def __init__(self, losses_config: List[dict]):
        self.losses = []
        for conf in losses_config:
            kls = LOSS_CLASSES[conf["class"]]
            weight = conf.get("weight", 1.0)
            kwargs = conf.get("params", {})
            self.losses.append((kls(**kwargs), weight))
        # members must agree on output shape — (B,T) + (B,T,F) would
        # broadcast-crash at train time (the reference has the same
        # latent flaw, losses.py:299-307); reject at config time instead
        shapes = {type(l).__name__: l.output_shape for l, _ in self.losses}
        if len(set(shapes.values())) > 1:
            raise ValueError(
                f"CombinedLoss members return incompatible shapes and "
                f"cannot be summed: {shapes} — combine only losses with "
                f"matching output shape ('bt': WeightedLoss/Perceptual, "
                f"'btf': ScaledLoss)"
            )

    def prepare(self, interior_mask, dataset_info, feature_names: Sequence[str]):
        for loss, _ in self.losses:
            loss.prepare(interior_mask, dataset_info, feature_names)

    def __call__(self, prediction, target, mask, **kwargs):
        total = None
        for loss, weight in self.losses:
            val = weight * loss(prediction, target, mask, **kwargs)
            total = val if total is None else total + val
        return total
