"""Mesh/sharding tests on the virtual 8-device CPU mesh: pure data
parallel, data × spatial sharding (conv halo exchange via XLA), and
numerical equivalence between mesh layouts."""

import jax
import numpy as np
import pytest

from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh, shard_batch
from py4cast_tpu.testing import synthetic_batch, synthetic_dataset_info
from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings


def _settings(**kw):
    base = dict(
        model_name="HalfUNet",
        settings_init_args={"num_filters": 8, "depth": 2},
        training_strategy="scaled_ar",
        num_input_steps=2,
        num_warmup_steps=2,
    )
    base.update(kw)
    return TrainingSettings(**base)


INFO = synthetic_dataset_info(
    grid_shape=(32, 32), weather_features=3, forcing_features=6, border_size=2
)


def _run_loss(mesh, batch_size=8):
    module = AutoRegressiveModule(_settings(), INFO, mesh=mesh)
    state = module.init_state(jax.random.key(0), 4)
    batch = synthetic_batch(INFO, batch_size=batch_size, num_pred_steps=2)
    _, loss = module.train_step(state, batch, jax.random.key(1))
    return float(loss)


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data_parallel=4, spatial=2))
    assert mesh.shape["data"] == 4 and mesh.shape["spatial"] == 2
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(data_parallel=3, spatial=2))


def test_data_parallel_loss_matches_single_device():
    """The global batch loss must be identical (up to float tolerance)
    whether computed on 1 device or sharded over 8."""
    single = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    dp8 = make_mesh(MeshConfig(data_parallel=8))
    l1 = _run_loss(single)
    l8 = _run_loss(dp8)
    assert l1 == pytest.approx(l8, rel=1e-4)


def test_spatial_sharding_matches_unsharded():
    """dp4 × spatial2 must produce the same loss as unsharded — XLA's
    halo exchanges around the sharded lat dim must be exact."""
    single = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    dp4sp2 = make_mesh(MeshConfig(data_parallel=4, spatial=2))
    l1 = _run_loss(single, batch_size=8)
    l42 = _run_loss(dp4sp2, batch_size=8)
    assert l1 == pytest.approx(l42, rel=1e-4)


def _gnn_settings(**extra):
    args = {"hidden_dims": 8, "mesh_levels": 2, "processor_layers": 1}
    args.update(extra)
    return _settings(model_name="HiLAM", settings_init_args=args)


def test_graph_spatial_sharding_matches_unsharded():
    """Lattice-form GNNs shard the lat dim like convs: stencils become
    halo exchanges, separable aggregations psum over the sharded axis.
    The loss must match the unsharded run."""
    single = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    dp4sp2 = make_mesh(MeshConfig(data_parallel=4, spatial=2))

    def run(mesh):
        module = AutoRegressiveModule(_gnn_settings(), INFO, mesh=mesh)
        state = module.init_state(jax.random.key(0), 4)
        batch = synthetic_batch(INFO, batch_size=8, num_pred_steps=2)
        _, loss = module.train_step(state, batch, jax.random.key(1))
        return float(loss)

    assert run(single) == pytest.approx(run(dp4sp2), rel=1e-4)


@pytest.mark.parametrize(
    "model_name,args",
    [
        # window partition reshapes + shifted-window rolls under a
        # sharded lat dim (GSPMD lowers rolls to collective permutes)
        ("SwinUNetR", {"feature_size": 8, "depths": (1, 1),
                       "num_heads": (2, 2), "window_size": 4}),
        # (B, H, W, C) → (B, N, C) token flattening + EPA attention
        # under a sharded lat dim
        ("UNetRPP", {"hidden_size": 16, "depths": (1, 1),
                     "num_heads_encoder": 2, "num_heads_decoder": 2,
                     "encoder_proj_sizes": (16, 16),
                     "downsampling_rate": 2}),
    ],
)
def test_attention_spatial_sharding_matches_unsharded(model_name, args):
    """The ViT families must also survive lat sharding exactly — their
    window/token reshapes cross the sharded dim, which GSPMD handles
    with resharding collectives."""
    single = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    dp4sp2 = make_mesh(MeshConfig(data_parallel=4, spatial=2))

    def run(mesh):
        module = AutoRegressiveModule(
            _settings(model_name=model_name, settings_init_args=args),
            INFO, mesh=mesh,
        )
        state = module.init_state(jax.random.key(0), 4)
        batch = synthetic_batch(INFO, batch_size=8, num_pred_steps=2)
        _, loss = module.train_step(state, batch, jax.random.key(1))
        return float(loss)

    assert run(single) == pytest.approx(run(dp4sp2), rel=1e-4)


def test_graph_table_path_rejects_spatial_sharding():
    """The gather-table fallback cannot shard the grid — it must refuse
    loudly instead of silently serializing on all-to-alls."""
    mesh = make_mesh(MeshConfig(data_parallel=4, spatial=2))
    with pytest.raises(ValueError, match="spatial"):
        AutoRegressiveModule(
            _gnn_settings(use_lattice=False), INFO, mesh=mesh
        )


def test_indivisible_spatial_dim_pads_instead_of_rejecting():
    # round-5 behavior change: a lat dim that does not divide the
    # spatial mesh axis PADS (all-border rows) instead of erroring —
    # the 1791-lat full-res story (tests/test_lat_padding.py pins the
    # loss equivalence). A custom lat_multiple the mesh axis does not
    # divide still fails loudly.
    mesh = make_mesh(MeshConfig(data_parallel=2, spatial=4))
    info = synthetic_dataset_info(grid_shape=(30, 32), border_size=2)
    module = AutoRegressiveModule(_settings(), info, mesh=mesh)
    assert module._lat_pad == 2  # 30 -> 32
    with pytest.raises(ValueError, match="divisible"):
        AutoRegressiveModule(_settings(), info, mesh=mesh, lat_multiple=3)
