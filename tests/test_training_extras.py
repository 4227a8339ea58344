"""Training knobs: masked-autoencoder input masking, gradient
accumulation, bf16 policy, downscaling strategy end-to-end, feature
contract check, raw-param injection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh
from py4cast_tpu.rollout import mask_blocks
from py4cast_tpu.testing import synthetic_batch, synthetic_dataset_info
from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings

INFO = synthetic_dataset_info(
    grid_shape=(32, 32), weather_features=3, forcing_features=6, border_size=2
)
MESH = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])


def _module(**kw):
    base = dict(
        model_name="HalfUNet",
        settings_init_args={"num_filters": 8, "depth": 2},
        num_warmup_steps=2,
        num_input_steps=2,
    )
    base.update(kw)
    return AutoRegressiveModule(TrainingSettings(**base), INFO, mesh=MESH)


def test_mask_blocks_zeroes_requested_fraction():
    x = jnp.ones((4, 32, 32, 3))
    masked = mask_blocks(x, jax.random.key(0), 0.5)
    frac = float(jnp.mean(masked == 0.0))
    assert 0.3 < frac < 0.7  # block-quantized, so allow slack
    assert float(jnp.mean(mask_blocks(x, jax.random.key(0), 0.0) == 0.0)) == 0.0


def test_mask_ratio_changes_training(capsys):
    m0 = _module(mask_ratio=0.0)
    m1 = _module(mask_ratio=0.5)
    state0 = m0.init_state(jax.random.key(0), 4)
    state1 = m1.init_state(jax.random.key(0), 4)
    batch = synthetic_batch(INFO, batch_size=2, num_pred_steps=1)
    _, l0 = m0.train_step(state0, batch, jax.random.key(1))
    _, l1 = m1.train_step(state1, batch, jax.random.key(1))
    assert float(l0) != float(l1)  # masking must alter the input


def test_gradient_accumulation_steps_only_every_k():
    m = _module(accumulate_grad_batches=3)
    state = m.init_state(jax.random.key(0), 12)
    batch = synthetic_batch(INFO, batch_size=2, num_pred_steps=1)
    p0 = jax.tree.leaves(state.params)[0].copy()
    for i in range(2):  # two micro-steps: no param update yet
        state, _ = m.train_step(state, batch, jax.random.key(i))
    p2 = jax.tree.leaves(state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p2))
    # micro-steps 3..6: the 3rd applies the first optimizer update (lr is 0
    # at warmup step 0, so check after the SECOND applied update)
    for i in range(4):
        state, _ = m.train_step(state, batch, jax.random.key(9 + i))
    p6 = jax.tree.leaves(state.params)[0]
    assert not np.array_equal(np.asarray(p0), np.asarray(p6))


def test_lr_schedule_counts_optimizer_steps_not_micro_steps():
    """With accumulate_grad_batches=k the cosine must decay over
    num_training_steps/k optimizer steps (Lightning's
    estimated_stepping_batches semantics), not over micro-batches."""
    micro_steps = 120
    m_plain = _module(accumulate_grad_batches=1, num_warmup_steps=2)
    m_accum = _module(accumulate_grad_batches=4, num_warmup_steps=2)
    m_plain.make_optimizer(micro_steps)
    m_accum.make_optimizer(micro_steps)
    # the accumulating schedule reaches min_lr by optimizer step 30
    end_lr = float(m_accum._schedule(30))
    assert end_lr == pytest.approx(
        float(m_plain.settings.min_learning_rate), rel=1e-5
    )
    # while the plain schedule is still mid-decay at step 30
    assert float(m_plain._schedule(30)) > 10 * end_lr


def test_bf16_policy_trains_and_keeps_fp32_params():
    m = _module(precision="bf16")
    state = m.init_state(jax.random.key(0), 4)
    batch = synthetic_batch(INFO, batch_size=2, num_pred_steps=1)
    state, loss = m.train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(loss))
    # master params stay fp32
    assert all(
        p.dtype == jnp.float32
        for p in jax.tree.leaves(state.params)
        if jnp.issubdtype(p.dtype, jnp.floating)
    )


def test_downscaling_only_end_to_end():
    # forcing features must include matches for the output features
    info = synthetic_dataset_info(
        grid_shape=(32, 32), weather_features=2, forcing_features=7, border_size=2
    )
    # rename forcings so two of them match output names by suffix
    object.__setattr__  # noqa: B018 — dataclass not frozen; adjust directly
    info.forcing_feature_names = (
        "arp_var0_500_isobaricInhPa",
        "arp_var1_500_isobaricInhPa",
        "cos_hour", "sin_hour", "cos_doy", "sin_doy", "toa_radiation",
    )
    info.output_feature_names = (
        "aro_var0_500_isobaricInhPa",
        "aro_var1_500_isobaricInhPa",
    )
    info.stats.stats.update(
        {n: {"mean": 0.0, "std": 1.0, "min": -3.0, "max": 3.0}
         for n in info.output_feature_names + info.forcing_feature_names}
    )
    info.diff_stats.stats.update(
        {n: {"mean": 0.0, "std": 1.0} for n in info.output_feature_names}
    )
    info.state_weights = {n: 1.0 for n in info.output_feature_names}
    m = AutoRegressiveModule(
        TrainingSettings(
            model_name="HalfUNet",
            settings_init_args={"num_filters": 8, "depth": 2},
            training_strategy="downscaling_only",
            num_warmup_steps=2,
        ),
        info,
        mesh=MESH,
    )
    assert m.rollout_cfg.common_features_idx == (0, 1)
    state = m.init_state(jax.random.key(0), 4)
    batch = synthetic_batch(info, batch_size=2, num_pred_steps=2)
    state, loss = m.train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(loss))


def test_feature_contract_mismatch_raises():
    m = _module()
    state = m.init_state(jax.random.key(0), 2)
    other = synthetic_dataset_info(
        grid_shape=(32, 32), weather_features=3, forcing_features=6,
        border_size=2, name="other",
    )
    batch = synthetic_batch(other, batch_size=2, num_pred_steps=1)
    # rename the features to simulate a contract mismatch
    batch.outputs = batch.outputs.replace(batch.outputs.array)
    object.__setattr__(batch.outputs, "feature_names", ("bogus_a", "bogus_b", "bogus_c"))
    with pytest.raises(ValueError, match="contract"):
        m.predict_step(state, batch, jax.random.key(0))


def test_named_eval_arrays_fast_path_matches_host_path():
    """The on-device eval-arrays fast path (reuse of eval_step's
    device-resident targets, VERDICT r4 #9) must produce bit-identical
    pred/target/mask to the host re-upload path — including NaN
    masking."""
    m = _module(mask_on_nan=True, training_strategy="diff_ar")
    state = m.init_state(jax.random.key(0), 2)
    batch = synthetic_batch(INFO, batch_size=3, num_pred_steps=2)
    # inject NaNs so the mask is non-trivial
    arr = np.asarray(batch.outputs.array, np.float32).copy()
    arr[0, 0, 5:8, 5:8, 1] = np.nan
    object.__setattr__(batch.outputs, "array", arr)

    preds, _ = m.eval_step(state, batch, jax.random.key(1))
    assert m._eval_outputs_cache is not None
    assert m._eval_outputs_cache[0]() is batch
    p_fast, t_fast, mask_fast = m.named_eval_arrays(preds, batch)
    assert ("eval_arrays",) in m._jit_cache  # fast path engaged

    m._eval_outputs_cache = None  # force the host path
    p_host, t_host, mask_host = m.named_eval_arrays(preds, batch)

    np.testing.assert_array_equal(
        np.asarray(p_fast.array), np.asarray(p_host.array))
    np.testing.assert_array_equal(
        np.asarray(t_fast.array), np.asarray(t_host.array))
    np.testing.assert_array_equal(
        np.asarray(mask_fast), np.asarray(mask_host))
    # the injected NaNs are masked out and zero-filled
    assert float(np.asarray(mask_fast).min()) == 0.0
    assert np.isfinite(np.asarray(t_fast.array)).all()


def test_eval_outputs_cache_ignores_stale_batch():
    """A DIFFERENT batch object must not hit the cached targets."""
    m = _module()
    state = m.init_state(jax.random.key(0), 2)
    b1 = synthetic_batch(INFO, batch_size=2, num_pred_steps=1)
    b2 = synthetic_batch(INFO, batch_size=2, num_pred_steps=1, seed=7)
    preds, _ = m.eval_step(state, b1, jax.random.key(1))
    # asking for b2's arrays must fall back to b2's host data, not b1's
    _, t2, _ = m.named_eval_arrays(preds, b2)
    expect = np.asarray(b2.outputs.array, np.float32)
    np.testing.assert_array_equal(np.asarray(t2.array), expect)


def test_named_eval_arrays_fast_path_graph_model_with_lat_pad():
    """Fast path through the GNN branch: flattened (B, T, ngrid, F)
    device targets, padded-lat unpad inside the fused program."""
    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh

    info = synthetic_dataset_info(
        grid_shape=(9, 12), weather_features=2, forcing_features=5,
        border_size=2,
    )
    m = AutoRegressiveModule(
        TrainingSettings(
            model_name="HiLAM",
            settings_init_args={"hidden_dims": 4, "mesh_levels": 2,
                                "processor_layers": 1},
            num_warmup_steps=2,
            num_input_steps=2,
        ),
        info,
        mesh=make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1]),
        lat_multiple=2,  # 9 -> padded to 10: unpad slices ngrid back
    )
    assert m._lat_pad == 1
    state = m.init_state(jax.random.key(0), 2)
    batch = synthetic_batch(info, batch_size=2, num_pred_steps=2)

    preds, _ = m.eval_step(state, batch, jax.random.key(1))
    p_fast, t_fast, mask_fast = m.named_eval_arrays(preds, batch)
    assert m._eval_outputs_cache is None  # consumed

    p_host, t_host, mask_host = m.named_eval_arrays(preds, batch)  # host path
    assert p_fast.array.shape == (2, 2, 9 * 12, 2)  # original ngrid
    np.testing.assert_array_equal(
        np.asarray(p_fast.array), np.asarray(p_host.array))
    np.testing.assert_array_equal(
        np.asarray(t_fast.array), np.asarray(t_host.array))
    np.testing.assert_array_equal(
        np.asarray(mask_fast), np.asarray(mask_host))
