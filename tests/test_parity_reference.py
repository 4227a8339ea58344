"""Numerical parity against the torch reference's semantics.

The north star (BASELINE.md) is identical per-variable rollout RMSE, so
these tests restate the reference's loss math and scaled_ar rollout in
plain torch — written from the reference's documented semantics
(py4cast/losses.py:103-210, py4cast/lightning.py:495-676) — and assert
the JAX implementations agree to <=1e-5 on identical random inputs.
Every place a silent semantic drift could hide is pinned:

- the mask-union denominator correction (losses.py:156-167, 197-203),
- per-feature weight construction (state_weight / diff_std^p; std),
- sqrt-after-spatial-mean RMSE ordering (losses.py:205-206),
- diff-stat scaling + border forcing + inter-steps + window shift
  (lightning.py:565-658),
- the NaN input-mask channel union (lightning.py:731-758).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from py4cast_tpu.losses import ScaledLoss, WeightedLoss
from py4cast_tpu.named_tensor import NamedArray
from py4cast_tpu.rollout import RolloutConfig, rollout
from py4cast_tpu.testing import synthetic_dataset_info

B, T, H, W, F = 2, 3, 16, 16, 3
N_IN, FF = 2, 6
BORDER = 2


@pytest.fixture(scope="module")
def info():
    """DatasetInfo with NON-trivial stats so weights/scaling matter."""
    info = synthetic_dataset_info(
        grid_shape=(H, W), weather_features=F, forcing_features=FF,
        border_size=BORDER,
    )
    rng = np.random.default_rng(5)
    for i, n in enumerate(info.output_feature_names):
        info.stats.stats[n] = {
            "mean": float(rng.normal()),
            "std": float(rng.uniform(0.5, 2.0)),
            "min": -4.0,
            "max": 4.0,
        }
        info.diff_stats.stats[n] = {
            "mean": float(rng.normal() * 0.1),
            "std": float(rng.uniform(0.2, 1.5)),
        }
        info.state_weights[n] = float(rng.uniform(0.5, 3.0))
    return info


@pytest.fixture(scope="module")
def fields(info):
    rng = np.random.default_rng(11)
    pred = rng.standard_normal((B, T, H, W, F)).astype(np.float32)
    target = rng.standard_normal((B, T, H, W, F)).astype(np.float32)
    # mask with whole spatial columns invalid → exercises the union
    # denominator correction, and per-element holes elsewhere
    mask = (rng.uniform(size=pred.shape) > 0.1).astype(np.float32)
    mask[:, :, :, :3, :] = 0.0  # 3 all-invalid spatial columns
    return pred, target, mask


def _interior(info):
    border = np.asarray(
        info.statics.border_mask, np.float32
    )  # (H, W, 1)
    return 1.0 - border


def _named(arr, info):
    return NamedArray(
        jnp.asarray(arr),
        ("batch", "timestep", "lat", "lon", "features"),
        info.output_feature_names,
    )


# --------------------------------------------------------------------------
# torch restatements of the reference loss semantics
# --------------------------------------------------------------------------

def torch_weighted_loss(pred, target, mask, interior_hw, weights, kind):
    """reference losses.py:130-169 (WeightedLoss.forward)."""
    if kind == "mse":
        elem = torch.nn.MSELoss(reduction="none")(pred * mask, target * mask)
    else:
        elem = torch.nn.L1Loss(reduction="none")(pred * mask, target * mask)
    weighted = torch.sum(elem * weights, dim=-1)  # (B, T, H, W)
    union = torch.any(mask.bool(), dim=4)
    union = torch.any(torch.any(union, dim=0), dim=0)  # (H, W)
    num_interior = interior_hw.sum()
    denom = num_interior - (~union).sum()
    return torch.sum(weighted * interior_hw, dim=(2, 3)) / denom


def torch_scaled_loss(pred, target, mask, interior_hw1, stds, kind):
    """reference losses.py:186-210 (ScaledLoss.forward)."""
    if kind == "mse":
        elem = torch.nn.MSELoss(reduction="none")(pred * mask, target * mask)
    else:
        elem = torch.nn.L1Loss(reduction="none")(pred * mask, target * mask)
    union = torch.any(mask.bool(), dim=4)
    union = torch.any(torch.any(union, dim=0), dim=0)
    denom = interior_hw1.sum() - (~union).sum()
    mean_loss = torch.sum(elem * interior_hw1, dim=(2, 3)) / denom  # (B,T,F)
    if kind == "mse":
        mean_loss = torch.sqrt(mean_loss)
    return mean_loss * stds


@pytest.mark.parametrize("kind,loss_name", [("mse", "MSELoss"), ("l1", "L1Loss")])
def test_weighted_loss_matches_reference_semantics(info, fields, kind, loss_name):
    pred, target, mask = fields
    names = info.output_feature_names

    jl = WeightedLoss(loss_name)
    jl.prepare(_interior(info), info, names)
    got = np.asarray(jl(_named(pred, info), _named(target, info), jnp.asarray(mask)))

    p = 2.0 if kind == "mse" else 1.0
    weights = torch.tensor(
        [info.state_weights[n] / info.diff_stats[n]["std"] ** p for n in names]
    )
    want = torch_weighted_loss(
        torch.tensor(pred), torch.tensor(target), torch.tensor(mask),
        torch.tensor(_interior(info)).squeeze(-1), weights, kind,
    )
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kind,loss_name", [("mse", "MSELoss"), ("l1", "L1Loss")])
def test_scaled_loss_matches_reference_semantics(info, fields, kind, loss_name):
    pred, target, mask = fields
    names = info.output_feature_names

    jl = ScaledLoss(loss_name)
    jl.prepare(_interior(info), info, names)
    got = np.asarray(jl(_named(pred, info), _named(target, info), jnp.asarray(mask)))

    stds = torch.tensor([info.stats[n]["std"] for n in names])
    want = torch_scaled_loss(
        torch.tensor(pred), torch.tensor(target), torch.tensor(mask),
        torch.tensor(_interior(info)), stds, kind,
    )
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)


# --------------------------------------------------------------------------
# rollout parity: a shared deterministic "model" evaluated in both
# frameworks from the same numpy weights
# --------------------------------------------------------------------------

def _toy_weights(f_in, seed=3):
    rng = np.random.default_rng(seed)
    wt = (rng.standard_normal((f_in, F)) / np.sqrt(f_in)).astype(np.float32)
    return wt


def torch_scaled_ar(model, inputs, forcing, outputs, statics, border_mask,
                    diff_mean, diff_std, num_inter_steps, mask_on_nan=False):
    """reference lightning.py:565-658 (_common_step, scaled_ar branch)
    incl. _next_x input assembly (lightning.py:711-767)."""
    prev = inputs.clone()  # (B, n_in, H, W, F)
    interior = 1.0 - border_mask
    preds = []
    for i in range(outputs.shape[1]):
        border_state = outputs[:, i].clone()
        if mask_on_nan:
            border_state = torch.nan_to_num(border_state, nan=0.0)
        for _ in range(num_inter_steps):
            steps = [prev[:, j] for j in range(prev.shape[1])]
            forcing_t = forcing[:, i]
            extra = []
            if mask_on_nan:
                combined = torch.zeros(prev.shape[0], H, W, dtype=torch.bool)
                for s in steps:
                    for c in range(s.shape[-1]):
                        combined = combined | torch.isnan(s[..., c])
                for c in range(forcing_t.shape[-1]):
                    combined = combined | torch.isnan(forcing_t[..., c])
                extra = [(~combined).unsqueeze(-1).float()]
                steps = [torch.nan_to_num(s, nan=0.0) for s in steps]
                forcing_t = torch.nan_to_num(forcing_t, nan=0.0)
            x = torch.cat(
                steps
                + [statics.expand(prev.shape[0], H, W, -1), forcing_t]
                + extra,
                dim=-1,
            )
            y = model(x)
            last_prev = prev[:, -1].clone()
            if mask_on_nan:
                last_prev = torch.nan_to_num(last_prev, nan=0.0)
            predicted = last_prev + y * diff_std + diff_mean
            new_state = border_mask * border_state + interior * predicted
            prev = torch.cat([prev[:, 1:], new_state.unsqueeze(1)], dim=1)
        preds.append(new_state)
    return torch.stack(preds, dim=1)


def _rollout_inputs(info, mask_on_nan=False, seed=21):
    rng = np.random.default_rng(seed)
    inputs = rng.standard_normal((B, N_IN, H, W, F)).astype(np.float32)
    forcing = rng.standard_normal((B, T, H, W, FF)).astype(np.float32)
    outputs = rng.standard_normal((B, T, H, W, F)).astype(np.float32)
    if mask_on_nan:
        # NaN holes in inputs, forcing AND ground truth
        inputs[0, 0, 5:7, 5:7, 0] = np.nan
        forcing[1, :, 2:4, 2:4, 1] = np.nan
        outputs[0, 1, 8:9, 8:9, :] = np.nan
    statics = np.asarray(info.statics.grid_statics.array, np.float32)
    border = np.asarray(info.statics.border_mask, np.float32)  # (H, W, 1)
    diff_mean = np.asarray(
        [info.diff_stats[n]["mean"] for n in info.output_feature_names],
        np.float32,
    )
    diff_std = np.asarray(
        [info.diff_stats[n]["std"] for n in info.output_feature_names],
        np.float32,
    )
    return inputs, forcing, outputs, statics, border, diff_mean, diff_std


@pytest.mark.parametrize("num_inter_steps", [1, 2])
def test_scaled_ar_rollout_matches_reference_semantics(info, num_inter_steps):
    (inputs, forcing, outputs, statics, border,
     diff_mean, diff_std) = _rollout_inputs(info)
    f_in = N_IN * F + statics.shape[-1] + FF
    wt = _toy_weights(f_in)

    cfg = RolloutConfig(
        strategy="scaled_ar", num_inter_steps=num_inter_steps,
        num_input_steps=N_IN,
    )
    got = rollout(
        lambda x: jnp.tanh(x @ jnp.asarray(wt)),
        jnp.asarray(inputs), jnp.asarray(forcing), jnp.asarray(outputs),
        jnp.asarray(statics), jnp.asarray(border),
        jnp.asarray(diff_mean), jnp.asarray(diff_std), cfg, T,
    )

    want = torch_scaled_ar(
        lambda x: torch.tanh(x @ torch.tensor(wt)),
        torch.tensor(inputs), torch.tensor(forcing), torch.tensor(outputs),
        torch.tensor(statics), torch.tensor(border),
        torch.tensor(diff_mean), torch.tensor(diff_std), num_inter_steps,
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5
    )


def test_scaled_ar_rollout_with_nan_masking_matches(info):
    (inputs, forcing, outputs, statics, border,
     diff_mean, diff_std) = _rollout_inputs(info, mask_on_nan=True)
    f_in = N_IN * F + statics.shape[-1] + FF + 1  # +1 valid-mask channel
    wt = _toy_weights(f_in)

    cfg = RolloutConfig(
        strategy="scaled_ar", num_inter_steps=2, num_input_steps=N_IN,
        mask_on_nan=True,
    )
    got = rollout(
        lambda x: jnp.tanh(x @ jnp.asarray(wt)),
        jnp.asarray(inputs), jnp.asarray(forcing), jnp.asarray(outputs),
        jnp.asarray(statics), jnp.asarray(border),
        jnp.asarray(diff_mean), jnp.asarray(diff_std), cfg, T,
    )
    want = torch_scaled_ar(
        lambda x: torch.tanh(x @ torch.tensor(wt)),
        torch.tensor(inputs), torch.tensor(forcing), torch.tensor(outputs),
        torch.tensor(statics), torch.tensor(border),
        torch.tensor(diff_mean), torch.tensor(diff_std), 2, mask_on_nan=True,
    )
    got_np = np.asarray(got)
    assert np.isfinite(got_np).all()
    np.testing.assert_allclose(got_np, want.numpy(), rtol=1e-5, atol=1e-5)


def test_diff_ar_rollout_matches_reference_semantics(info):
    """diff_ar: no border forcing, next = prev + y (lightning.py:604-623)."""
    (inputs, forcing, outputs, statics, border,
     diff_mean, diff_std) = _rollout_inputs(info)
    f_in = N_IN * F + statics.shape[-1] + FF
    wt = _toy_weights(f_in)

    cfg = RolloutConfig(strategy="diff_ar", num_input_steps=N_IN)
    got = rollout(
        lambda x: jnp.tanh(x @ jnp.asarray(wt)),
        jnp.asarray(inputs), jnp.asarray(forcing), jnp.asarray(outputs),
        jnp.asarray(statics), jnp.asarray(border),
        jnp.asarray(diff_mean), jnp.asarray(diff_std), cfg, T,
    )

    # torch restatement: same loop, scale_y/force_border off
    prev = torch.tensor(inputs)
    preds = []
    for i in range(T):
        x = torch.cat(
            [prev[:, j] for j in range(N_IN)]
            + [torch.tensor(statics).expand(B, H, W, -1),
               torch.tensor(forcing)[:, i]],
            dim=-1,
        )
        y = torch.tanh(x @ torch.tensor(wt))
        new_state = prev[:, -1] + y
        prev = torch.cat([prev[:, 1:], new_state.unsqueeze(1)], dim=1)
        preds.append(new_state)
    want = torch.stack(preds, dim=1)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5
    )


def test_end_to_end_rmse_parity(info):
    """The full chain behind 'identical RMSE': scaled_ar rollout feeding
    ScaledLoss(MSE) → per-(batch, step, var) RMSE equal across stacks."""
    (inputs, forcing, outputs, statics, border,
     diff_mean, diff_std) = _rollout_inputs(info)
    f_in = N_IN * F + statics.shape[-1] + FF
    wt = _toy_weights(f_in)
    names = info.output_feature_names

    cfg = RolloutConfig(strategy="scaled_ar", num_inter_steps=2,
                        num_input_steps=N_IN)
    preds_jax = rollout(
        lambda x: jnp.tanh(x @ jnp.asarray(wt)),
        jnp.asarray(inputs), jnp.asarray(forcing), jnp.asarray(outputs),
        jnp.asarray(statics), jnp.asarray(border),
        jnp.asarray(diff_mean), jnp.asarray(diff_std), cfg, T,
    )
    jl = ScaledLoss("MSELoss")
    jl.prepare(_interior(info), info, names)
    ones = jnp.ones_like(jnp.asarray(outputs))
    rmse_jax = np.asarray(
        jl(_named(preds_jax, info), _named(outputs, info), ones)
    )

    preds_t = torch_scaled_ar(
        lambda x: torch.tanh(x @ torch.tensor(wt)),
        torch.tensor(inputs), torch.tensor(forcing), torch.tensor(outputs),
        torch.tensor(statics), torch.tensor(border),
        torch.tensor(diff_mean), torch.tensor(diff_std), 2,
    )
    rmse_t = torch_scaled_loss(
        preds_t, torch.tensor(outputs), torch.ones(B, T, H, W, F),
        torch.tensor(_interior(info)),
        torch.tensor([info.stats[n]["std"] for n in names]), "mse",
    )
    np.testing.assert_allclose(rmse_jax, rmse_t.numpy(), rtol=1e-5, atol=1e-5)


def test_downscaling_only_rollout_matches_reference_semantics(info):
    """downscaling_only: input is statics+forcing only, the prediction is
    coarse_forcing[common_idx] + y, no border forcing
    (reference lightning.py:546-558, 611-621)."""
    (inputs, forcing, outputs, statics, border,
     diff_mean, diff_std) = _rollout_inputs(info)
    f_in = statics.shape[-1] + FF
    wt = _toy_weights(f_in)
    idx = (0, 2, 4)  # one matching forcing per output feature

    cfg = RolloutConfig(
        strategy="downscaling_only", num_input_steps=N_IN,
        common_features_idx=idx,
    )
    got = rollout(
        lambda x: jnp.tanh(x @ jnp.asarray(wt)),
        jnp.asarray(inputs), jnp.asarray(forcing), jnp.asarray(outputs),
        jnp.asarray(statics), jnp.asarray(border),
        jnp.asarray(diff_mean), jnp.asarray(diff_std), cfg, T,
    )

    # torch restatement: no prev-state inputs, no border forcing
    preds = []
    for i in range(T):
        forcing_t = torch.tensor(forcing)[:, i]
        x = torch.cat(
            [torch.tensor(statics).expand(B, H, W, -1), forcing_t], dim=-1
        )
        y = torch.tanh(x @ torch.tensor(wt))
        coarse = forcing_t[..., list(idx)]
        preds.append(coarse + y)
    want = torch.stack(preds, dim=1)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-5
    )
