"""Metric numerics vs independent scipy/numpy implementations of the
reference formulas (reference: py4cast/metrics.py:251-352)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.fftpack import dct as scipy_dct

from py4cast_tpu.metrics import (
    MetricACC,
    MetricPSDK,
    MetricPSDVar,
    dct_2d,
    power_spectral_density,
)
from py4cast_tpu.testing import synthetic_dataset_info

B, T, H, W, F = 2, 2, 24, 24, 3


def _scipy_psd(x: np.ndarray) -> np.ndarray:
    """Independent numpy/scipy port of the reference PSD pipeline."""
    out = []
    for c in range(x.shape[1]):
        xc = x[:, c]
        fx = scipy_dct(
            scipy_dct(xc.transpose(0, 2, 1), norm="ortho").transpose(0, 2, 1),
            norm="ortho",
        )
        sig = ((1 / xc.shape[-1] ** 2) * fx**2).mean(axis=0)
        y, xx = np.indices(sig.shape)
        cx, cy = sig.shape[0] // 2, sig.shape[1] // 2
        r = np.sqrt((xx - cx) ** 2 + (y - cy) ** 2).astype(int)
        rmax = min(xx.max(), y.max(), r.max()) // 2
        rr = r.ravel()
        n = sig.size
        flat = sig.ravel()
        val = (
            flat[np.clip(2 * rr, 0, n - 1)]
            + 0.5 * flat[np.clip(2 * rr - 1, 0, n - 1)]
            + 0.5 * flat[np.clip(2 * rr + 1, 0, n - 1)]
        )
        tbin = np.bincount(rr[rr < rmax], val[rr < rmax])
        nr = np.bincount(rr[rr < rmax])
        out.append(tbin / nr)
    return np.stack(out)


def test_dct2d_matches_scipy():
    x = np.random.default_rng(0).standard_normal((4, H, W)).astype(np.float32)
    got = np.asarray(dct_2d(jnp.asarray(x)))
    expect = scipy_dct(
        scipy_dct(x.transpose(0, 2, 1), norm="ortho").transpose(0, 2, 1),
        norm="ortho",
    )
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_psd_matches_reference_pipeline():
    x = np.random.default_rng(1).standard_normal((B, F, H, W)).astype(np.float32)
    got = np.asarray(power_spectral_density(jnp.asarray(x)))
    expect = _scipy_psd(x)
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-5)


@pytest.fixture
def pred_target_mask():
    rng = np.random.default_rng(2)
    preds = jnp.asarray(rng.standard_normal((B, T, H, W, F)), jnp.float32)
    targets = jnp.asarray(rng.standard_normal((B, T, H, W, F)), jnp.float32)
    mask = jnp.ones_like(preds)
    return preds, targets, mask


def test_psdk_accumulates_and_renders(tmp_path, pred_target_mask):
    preds, targets, mask = pred_target_mask
    names = tuple(f"f{i}" for i in range(F))
    m = MetricPSDK(tmp_path, names, (H, W))
    state = m.init_state()
    state = m.update(state, preds, targets, mask)
    state = m.update(state, preds, targets, mask)
    assert float(state["step_count"]) == 2.0
    figs = m.compute(state)
    assert len(figs) == F
    assert (tmp_path / "val_mean_psd_k" / "f0_1.png").exists()


def test_psdvar_perfect_prediction_is_zero(pred_target_mask):
    preds, _, mask = pred_target_mask
    names = tuple(f"f{i}" for i in range(F))
    m = MetricPSDVar(names, (H, W))
    state = m.update(m.init_state(), preds, preds, mask)
    vals = m.compute(state)
    for v in vals.values():
        assert v == pytest.approx(0.0, abs=1e-5)


def test_acc_perfect_prediction_is_one(pred_target_mask):
    preds, _, mask = pred_target_mask
    info = synthetic_dataset_info(grid_shape=(H, W), weather_features=F)
    m = MetricACC(info, num_pred_steps=T)
    state = m.update(m.init_state(), preds, preds, mask)
    vals = m.compute(state)
    for v in vals.values():
        assert v == pytest.approx(1.0, abs=1e-4)


def test_acc_graph_layout(pred_target_mask):
    """(B, T, ngrid, F) layout must work too (GRAPH models)."""
    preds, targets, mask = pred_target_mask
    pg = preds.reshape(B, T, H * W, F)
    tg = targets.reshape(B, T, H * W, F)
    info = synthetic_dataset_info(grid_shape=(H, W), weather_features=F)
    m = MetricACC(info, num_pred_steps=T)
    state = m.update(m.init_state(), pg, tg, jnp.ones_like(pg))
    vals = m.compute(state)
    assert all(np.isfinite(v) for v in vals.values())
