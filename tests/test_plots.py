"""Direct tests of the plot/observer system (reference: py4cast/plots.py
— MapPlot family, StateErrorPlot score cards + JSON dumps,
SpatialErrorPlot accumulated maps). The e2e training tests exercise
these through the Trainer; here each plotter's artifacts are asserted
on disk."""

import json

import jax
import numpy as np
import pytest

from py4cast_tpu.plots import (
    PredictionEpochPlot,
    PredictionTimestepPlot,
    SpatialErrorPlot,
    StateErrorPlot,
)
from py4cast_tpu.testing import synthetic_batch, synthetic_dataset_info
from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings

INFO = synthetic_dataset_info(
    grid_shape=(24, 24), weather_features=2, forcing_features=6, border_size=2
)


@pytest.fixture(scope="module")
def eval_arrays():
    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh

    module = AutoRegressiveModule(
        TrainingSettings(
            model_name="HalfUNet",
            settings_init_args={"num_filters": 4, "depth": 2},
            num_warmup_steps=1,
        ),
        INFO,
        mesh=make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1]),
    )
    state = module.init_state(jax.random.key(0), 2)
    batch = synthetic_batch(INFO, batch_size=2, num_pred_steps=3)
    preds, _ = module.eval_step(state, batch, jax.random.key(1))
    pred_na, target_na, mask = module.named_eval_arrays(preds, batch)
    module.current_epoch = 0
    return module, batch, pred_na, target_na, mask


def test_state_error_plot_writes_scorecard_and_json(eval_arrays, tmp_path):
    module, batch, pred_na, target_na, mask = eval_arrays
    p = StateErrorPlot(
        {"rmse": module.make_scaled_loss("rmse")},
        prefix="Test", save_path=tmp_path,
    )
    p.update(module, batch, pred_na, target_na, mask)
    p.on_step_end(module, label="Test")

    assert (tmp_path / "score_cards" / "Test_rmse.png").exists()
    scores = json.loads((tmp_path / "Test_rmse_scores.json").read_text())
    # one entry per output feature, one value per prediction timestep
    assert set(scores) == set(pred_na.feature_names)
    for vals in scores.values():
        assert len(vals) == batch.num_pred_steps
        assert all(np.isfinite(v) for v in vals)


def test_prediction_timestep_plot_writes_figures_and_gif(eval_arrays, tmp_path):
    module, batch, pred_na, target_na, mask = eval_arrays
    p = PredictionTimestepPlot(
        num_samples_to_plot=1, num_features_to_plot=1,
        prefix="Test", save_path=tmp_path,
    )
    p.update(module, batch, pred_na, target_na, mask)
    figs = list((tmp_path / "timestep_evol_per_param").glob("*.png"))
    assert len(figs) == batch.num_pred_steps  # 1 feature x T steps
    gifs = list((tmp_path / "timestep_evol_per_param").glob("*.gif"))
    assert len(gifs) == 1  # multi-step -> animated

    # sample budget: a second batch must not plot more examples
    before = len(figs)
    p.update(module, batch, pred_na, target_na, mask)
    assert len(list((tmp_path / "timestep_evol_per_param").glob("*.png"))) == before


def test_prediction_epoch_plot_indexes_by_epoch(eval_arrays, tmp_path):
    module, batch, pred_na, target_na, mask = eval_arrays
    p = PredictionEpochPlot(
        num_samples_to_plot=1, num_features_to_plot=2,
        prefix="Test", save_path=tmp_path,
    )
    p.update(module, batch, pred_na, target_na, mask)
    figs = list((tmp_path / "epoch_evol_per_param").glob("*_0.png"))
    assert len(figs) == 2  # one per plotted feature, suffixed by epoch 0


def test_spatial_error_plot_accumulates_maps(eval_arrays, tmp_path):
    module, batch, pred_na, target_na, mask = eval_arrays
    p = SpatialErrorPlot(prefix="Test", save_path=tmp_path)
    p.update(module, batch, pred_na, target_na, mask)
    p.update(module, batch, pred_na, target_na, mask)  # accumulates
    p.on_step_end(module, label="Test")
    maps = list((tmp_path / "spatial_error_Test").glob("t*.png"))
    assert len(maps) == batch.num_pred_steps
    assert p.spatial_loss_maps == []  # cleared for the next epoch
