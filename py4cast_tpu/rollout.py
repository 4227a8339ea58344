"""Auto-regressive rollout engine — the compute heart of the framework.

TPU-native re-design of the reference's ``_common_step`` double Python
loop (reference: py4cast/lightning.py:495-785). The rollout is a single
``jax.lax.scan`` over prediction steps so XLA compiles ONE step body and
pipelines it; the carry is the sliding window of previous states, and
per-step ground truth (border forcing) and forcings ride the scan's
``xs``. Intermediary steps (``num_inter_steps``) are statically unrolled
inside the body. Everything name-dependent (feature indices, diff
stats) is resolved at trace time from static metadata.

Strategies (semantics match lightning.py:497-523):
- ``scaled_ar``:   border forcing ON, next = prev + y*diff_std + diff_mean
- ``diff_ar``:     no border forcing, next = prev + y, num_inter_steps == 1
- ``downscaling_only``: prev states unused; next = coarse_forcing + y
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TRAINING_STRATEGIES = ("scaled_ar", "diff_ar", "downscaling_only")


@dataclass(frozen=True)
class RolloutConfig:
    """Static rollout configuration — hashable, safe to close over in jit."""

    strategy: str = "diff_ar"
    num_inter_steps: int = 1
    num_input_steps: int = 2
    mask_on_nan: bool = False
    mask_ratio: float = 0.0
    # indices of forcing features matching each output feature, used by
    # downscaling_only to rebuild the state from the predicted residual
    # (reference: lightning.py:546-558)
    common_features_idx: Tuple[int, ...] = ()
    # pass a per-(step, inter-step) rng to model_apply — set by the
    # trainer when the model has active dropout/stochastic-depth rates
    model_rng: bool = False

    def __post_init__(self):
        if self.strategy not in TRAINING_STRATEGIES:
            raise ValueError(
                f"Unknown strategy {self.strategy!r}; one of {TRAINING_STRATEGIES}"
            )
        if self.strategy == "diff_ar" and self.num_inter_steps != 1:
            raise ValueError("Diff AR strategy requires exactly 1 intermediary step.")

    @property
    def force_border(self) -> bool:
        return self.strategy == "scaled_ar"

    @property
    def scale_y(self) -> bool:
        return self.strategy == "scaled_ar"

    @property
    def downscaling(self) -> bool:
        return self.strategy == "downscaling_only"


def common_features_index(
    output_feature_names: Sequence[str],
    forcing_feature_names: Sequence[str],
    strict: bool = False,
) -> Tuple[int, ...]:
    """Forcing index for each output feature, matched on the name suffix
    (level + level_type). (reference: lightning.py:546-558)

    With ``strict`` (set when the strategy actually consumes the index,
    i.e. downscaling_only), an output feature matching zero or multiple
    forcings raises instead of silently yielding a wrong-length tuple —
    the reference shares the fragility (lightning.py:546-558) but a
    misaligned index there adds the WRONG coarse field to the residual.
    """
    idx = []
    for out_name in output_feature_names:
        matches = [
            i
            for i, f_name in enumerate(forcing_feature_names)
            if out_name.split("_")[1:] == f_name.split("_")[1:]
        ]
        if strict and len(matches) != 1:
            raise ValueError(
                f"downscaling_only needs exactly ONE forcing feature whose "
                f"level/level_type suffix matches output feature "
                f"{out_name!r}; found {len(matches)}: "
                f"{[forcing_feature_names[i] for i in matches]}"
            )
        idx.extend(matches)
    return tuple(idx)


def mask_blocks(x: jnp.ndarray, rng: jax.Array, mask_ratio: float) -> jnp.ndarray:
    """Masked-autoencoder-style random block masking.

    Zeroes ``mask_ratio`` of the image in square-ish blocks (standard MAE
    semantics; the reference's loop-based variant is at
    lightning.py:769-785). jit-friendly: one uniform draw per block.
    """
    b, h, w, _ = x.shape
    bh = max(1, h // max(1, int(h**0.5)))
    bw = max(1, w // max(1, int(w**0.5)))
    gh, gw = -(-h // bh), -(-w // bw)
    keep = jax.random.uniform(rng, (b, gh, gw, 1)) >= mask_ratio
    keep = jnp.repeat(jnp.repeat(keep, bh, axis=1), bw, axis=2)[:, :h, :w, :]
    return x * keep


def _nan_union_mask(arrays) -> jnp.ndarray:
    """(B, *spatial, 1) True where every feature of every array is finite."""
    m = None
    for a in arrays:
        bad = jnp.any(jnp.isnan(a), axis=-1, keepdims=True)
        m = bad if m is None else (m | bad)
    return ~m


def build_x(
    prev_states: jnp.ndarray,
    statics_forcing_t: jnp.ndarray,
    cfg: RolloutConfig,
) -> jnp.ndarray:
    """Assemble the model input for one step (reference: lightning.py:711-767).

    prev_states: (B, n_in, *spatial, F); statics_forcing_t:
    (B, *spatial, S + Ff) — the grid statics pre-concatenated AHEAD of
    the step's forcing slice (feature order [statics, forcing] matches
    the reference's x layout). Returns (B, *spatial, F_in).

    The statics ride inside the forcing tensor because a standalone
    per-step broadcast of the (…, 4)-feature statics materializes a
    buffer padded 32x by the TPU's (8, 128) lane tiling (measured: a
    1.2 GB pure-padding blob at 512x640 batch 16), while appending 4
    features to a 21-feature forcing costs ZERO extra padded bytes —
    both tile to the same 128 lanes.
    """
    n_in = prev_states.shape[1]
    inputs = [prev_states[:, i] for i in range(n_in)]

    extra = []
    if cfg.mask_on_nan:
        valid = _nan_union_mask(inputs + [statics_forcing_t])
        inputs = [jnp.nan_to_num(i, nan=0.0) for i in inputs]
        statics_forcing_t = jnp.nan_to_num(statics_forcing_t, nan=0.0)
        extra.append(valid.astype(prev_states.dtype))

    parts = ([] if cfg.downscaling else inputs) + [statics_forcing_t] + extra
    return jnp.concatenate(parts, axis=-1)


def rollout(
    model_apply: Callable[..., jnp.ndarray],
    inputs: jnp.ndarray,
    forcing: jnp.ndarray,
    outputs: Optional[jnp.ndarray],
    statics: jnp.ndarray,
    border_mask: jnp.ndarray,
    step_diff_mean: jnp.ndarray,
    step_diff_std: jnp.ndarray,
    cfg: RolloutConfig,
    num_pred_steps: int,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Run the full AR rollout; returns predictions (B, T, *spatial, F).

    Args:
      model_apply: x (B, *spatial, F_in) → y (B, *spatial, F). For GRAPH
        models spatial is (ngrid,), else (lat, lon). With
        ``cfg.model_rng=True`` it is instead called as
        ``model_apply(x, rng)`` with a fresh per-(step, inter-step) key
        (train-time dropout / stochastic depth).
      inputs: (B, n_in, *spatial, F) initial window.
      forcing: (B, T, *spatial, Ff).
      outputs: (B, T, *spatial, F) ground truth, or None (inference mode:
        disables border forcing, reference lightning.py:517).
      statics: (*spatial, S) grid static features.
      border_mask: (*spatial, 1); interior = 1 - border.
      step_diff_mean/std: (F,) diff stats (scaled_ar only).
      num_pred_steps: static number of AR steps (== forcing.shape[1]).
    """
    inference = outputs is None
    force_border = cfg.force_border and not inference
    interior_mask = 1.0 - border_mask
    if rng is None:
        rng = jax.random.key(0)

    # batch args may arrive bf16 (AutoRegressiveModule.batch_arg_dtypes)
    # but the AR state accumulates in fp32: bf16's ~3 significant digits
    # would drift a multi-step rollout (parity north star is per-variable
    # RMSE vs the reference)
    carry_dtype = jnp.promote_types(inputs.dtype, jnp.float32)
    inputs = inputs.astype(carry_dtype)

    # statics ride INSIDE the forcing tensor (see build_x docstring):
    # one pre-scan concat instead of a per-step broadcast whose (…, 4)
    # lane-padded buffer costs 32x its logical size on TPU
    n_statics = statics.shape[-1]
    statics_bt = jnp.broadcast_to(
        statics[(None, None)], forcing.shape[:2] + statics.shape
    ).astype(forcing.dtype)
    forcing = jnp.concatenate([statics_bt, forcing], axis=-1)

    # scan xs: timestep-major slices
    forcing_tm = jnp.moveaxis(forcing, 1, 0)  # (T, B, *sp, S + Ff)
    if inference:
        border_tm = jnp.zeros((num_pred_steps,) + inputs.shape[:1] + inputs.shape[2:],
                              inputs.dtype)
    else:
        border_tm = jnp.moveaxis(outputs, 1, 0)  # (T, B, *sp, F)
    rngs = jax.random.split(rng, num_pred_steps)

    def step(prev_states, xs):
        forcing_t, border_state, step_rng = xs
        if cfg.mask_on_nan:
            border_state = jnp.nan_to_num(border_state, nan=0.0)

        new_state = None
        for k in range(cfg.num_inter_steps):
            x = build_x(prev_states, forcing_t, cfg)
            if cfg.mask_ratio != 0.0:
                x = mask_blocks(x, jax.random.fold_in(step_rng, k), cfg.mask_ratio)
            if cfg.model_rng:
                # dropout/stochastic depth draw fresh masks per
                # (AR step, inter-step); offset keeps the stream
                # disjoint from the mask_ratio folds above
                y = model_apply(x, jax.random.fold_in(step_rng, 1009 + k))
            else:
                y = model_apply(x)

            last_prev = prev_states[:, -1]
            if cfg.mask_on_nan:
                last_prev = jnp.nan_to_num(last_prev, nan=0.0)

            if cfg.scale_y:
                predicted = last_prev + y * step_diff_std + step_diff_mean
            elif cfg.downscaling:
                # +n_statics: forcing_t carries [statics, forcing]
                coarse = forcing_t[
                    ..., [n_statics + i for i in cfg.common_features_idx]
                ]
                if cfg.mask_on_nan:
                    coarse = jnp.nan_to_num(coarse, nan=0.0)
                predicted = coarse + y
            else:
                predicted = last_prev + y

            predicted = predicted.astype(prev_states.dtype)
            if force_border:
                new_state = border_mask * border_state + interior_mask * predicted
            else:
                new_state = predicted

            prev_states = jnp.concatenate(
                [prev_states[:, 1:], new_state[:, None]], axis=1
            )
        return prev_states, new_state

    _, preds_tm = jax.lax.scan(
        step, inputs, (forcing_tm, border_tm, rngs), length=num_pred_steps
    )
    return jnp.moveaxis(preds_tm, 0, 1)  # (B, T, *spatial, F)
