"""Pad-to-shardable lat (VERDICT r4 #4): grids whose lat size does not
divide the spatial mesh axis — the motivating case is the full-res
1S100 grid, 1791×2801 with 1791 = 3²·199 (reference
datasets/titan/metadata.yaml:64-74) — shard via all-border pad rows.

Pinned properties:
- padding is loss-neutral plumbing: the sharded padded run computes the
  SAME loss as an unsharded run with identical padding;
- pad rows never enter the interior count (denominators unchanged);
- every host-facing artifact (predict output, eval arrays) carries the
  ORIGINAL grid;
- a 1791-lat crop (the real grid's lat extent) shards 4-way end to end,
  conv AND lattice GNN.
"""

import jax
import numpy as np
import pytest

from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh
from py4cast_tpu.testing import (
    synthetic_batch,
    synthetic_dataset_info,
    synthetic_statics,
)
from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings


def _settings(model="HalfUNet", **init):
    init = init or {"num_filters": 8, "depth": 2}
    return TrainingSettings(
        model_name=model,
        settings_init_args=init,
        training_strategy="scaled_ar",
        num_input_steps=2,
        num_warmup_steps=2,
    )


def _info(lat=9, lon=12):
    return synthetic_dataset_info(
        grid_shape=(lat, lon), weather_features=3, forcing_features=6,
        border_size=2,
    )


def test_statics_pad_lat_semantics():
    st = synthetic_statics((9, 12), border_size=2)
    padded = st.pad_lat(3)
    assert padded.grid_shape == (12, 12)
    # pad rows are ALL border → interior count unchanged
    assert padded.interior_mask.sum() == st.interior_mask.sum()
    assert (padded.border_mask[9:] == 1.0).all()
    # coordinate channels extrapolate monotonically (graph builders)
    y = padded.grid_statics["y"][..., 0]
    dy = np.diff(y[:, 0])
    assert (np.sign(dy) == np.sign(dy[0])).all()
    # no-op pad returns self
    assert st.pad_lat(0) is st


@pytest.mark.parametrize("model,init", [
    ("HalfUNet", {"num_filters": 8, "depth": 2}),
    ("HiLAM", {"hidden_dims": 8, "mesh_levels": 2, "processor_layers": 1}),
])
def test_sharded_padded_loss_equals_unsharded_padded(model, init):
    """lat=9 cannot shard 2-way; pad-to-10 must make the 1×2 spatial
    mesh compute the SAME loss as a single device with the same pad."""
    info = _info()
    batch = synthetic_batch(info, batch_size=2, num_pred_steps=2)

    sharded = AutoRegressiveModule(
        _settings(model, **init), info,
        mesh=make_mesh(MeshConfig(data_parallel=1, spatial=2),
                       jax.devices()[:2]),
    )
    assert sharded._lat_pad == 1
    single = AutoRegressiveModule(
        _settings(model, **init), info,
        mesh=make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1]),
        lat_multiple=2,
    )
    assert single._lat_pad == 1

    s_state = sharded.init_state(jax.random.key(0), num_training_steps=4)
    u_state = single.init_state(jax.random.key(0), num_training_steps=4)
    _, s_loss = sharded.train_step(s_state, batch, jax.random.key(1))
    _, u_loss = single.train_step(u_state, batch, jax.random.key(1))
    np.testing.assert_allclose(float(s_loss), float(u_loss),
                               rtol=2e-5, atol=1e-6)


def test_predictions_come_back_unpadded():
    info = _info()
    module = AutoRegressiveModule(
        _settings(), info,
        mesh=make_mesh(MeshConfig(data_parallel=1, spatial=2),
                       jax.devices()[:2]),
    )
    state = module.init_state(jax.random.key(0), num_training_steps=4)
    batch = synthetic_batch(info, batch_size=2, num_pred_steps=2)
    preds = module.predict_step(state, batch, jax.random.key(1))
    assert preds.array.shape == (2, 2, 9, 12, 3)
    # eval arrays for plotters/metrics also carry the original grid
    preds_padded, _ = module.eval_step(state, batch, jax.random.key(1))
    named_pred, named_target, mask = module.named_eval_arrays(
        preds_padded, batch
    )
    assert named_pred.array.shape[2:] == (9, 12, 3)
    assert named_target.array.shape[2:] == (9, 12, 3)


def test_1791_lat_crop_shards_four_ways():
    """The real 1S100 lat extent (1791 rows) on a narrow lon crop: pads
    to 1792 and steps on a 2×4 mesh — conv and lattice GNN."""
    info = synthetic_dataset_info(
        grid_shape=(1791, 8), weather_features=2, forcing_features=5,
        border_size=2,
    )
    mesh = make_mesh(MeshConfig(data_parallel=2, spatial=4),
                     jax.devices()[:8])
    batch = synthetic_batch(info, batch_size=2, num_pred_steps=1)
    for model, init in [
        ("HalfUNet", {"num_filters": 4, "depth": 2}),
        ("HiLAM", {"hidden_dims": 4, "mesh_levels": 2,
                   "processor_layers": 1}),
    ]:
        module = AutoRegressiveModule(_settings(model, **init), info,
                                      mesh=mesh)
        assert module._lat_pad == 1
        state = module.init_state(jax.random.key(0), num_training_steps=2)
        _, loss = module.train_step(state, batch, jax.random.key(1))
        assert float(loss) == float(loss), f"{model} loss is NaN"
