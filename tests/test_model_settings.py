"""The model settings surface is HONORED, not just accepted.

The reference zoo exposes dropout / stochastic-depth / norm / backend
knobs per model yaml (reference: config/CLI/model/swinunetr.yaml:22-31,
unetrpp.yaml:23-35, deeplabv3.yaml:19-26, graphlam.yaml:17-21); every
field our settings dataclasses accept must either change the model or
fail loudly at CONFIG time — a knob that silently does nothing is a
parity trap.
"""

import jax
import jax.numpy as jnp
import pytest

from py4cast_tpu.models import get_model_kls_and_settings
from py4cast_tpu.models.base import DropPath, norm_layer
from py4cast_tpu.models.deeplab import DeepLabSettings
from py4cast_tpu.models.graph import GraphModelSettings
from py4cast_tpu.models.swin import SwinUNetR, SwinUNetRSettings
from py4cast_tpu.models.unetrpp import UNetRPPSettings
from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh
from py4cast_tpu.testing import synthetic_batch, synthetic_dataset_info
from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings

INFO = synthetic_dataset_info(
    grid_shape=(32, 32), weather_features=3, forcing_features=6, border_size=2
)
MESH = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])


def _module(model_name, init_args, **kw):
    base = dict(
        model_name=model_name,
        settings_init_args=init_args,
        num_warmup_steps=2,
        num_input_steps=2,
    )
    base.update(kw)
    return AutoRegressiveModule(TrainingSettings(**base), INFO, mesh=MESH)


# --------------------------------------------------------- config-time errors
def test_norm_name_batch_rejected_at_config_time():
    with pytest.raises(ValueError, match="batch"):
        SwinUNetRSettings(norm_name="batch")
    with pytest.raises(ValueError, match="norm_name"):
        UNetRPPSettings(norm_name="spectral")


def test_unetrpp_conv_op_and_attention_code_validated():
    with pytest.raises(ValueError, match="conv_op"):
        UNetRPPSettings(conv_op="Conv3d")
    with pytest.raises(ValueError, match="attention_code"):
        UNetRPPSettings(attention_code="cuda")
    # the reference's own value and both backend spellings are accepted
    for code in ("torch", "xla", "flash_attn", "pallas"):
        UNetRPPSettings(attention_code=code)


def test_deeplab_aux_params_rejected():
    with pytest.raises(ValueError, match="aux_params"):
        DeepLabSettings(aux_params={"classes": 3})


def test_graph_offload_to_cpu_warns():
    with pytest.warns(UserWarning, match="offload_to_cpu"):
        GraphModelSettings(offload_to_cpu=True)


def test_drop_rate_range_validated():
    with pytest.raises(ValueError, match="drop_rate"):
        SwinUNetRSettings(drop_rate=1.5)
    with pytest.raises(ValueError, match="dropout_rate"):
        UNetRPPSettings(dropout_rate=-0.1)


# ------------------------------------------------------------- norm semantics
def test_norm_layer_instance_is_per_channel_groupnorm():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    inst = norm_layer("instance", 4)
    v = inst.init(jax.random.key(1), x)
    # affine-FREE, matching torch InstanceNorm2d affine=False (the
    # reference zoo's default via monai) — no scale/bias leaves at all
    assert not jax.tree_util.tree_leaves(v)
    y = inst.apply(v, x)
    # per-(sample, channel) statistics are normalized over space only
    m = jnp.mean(y, axis=(1, 2))
    s = jnp.std(y, axis=(1, 2))
    assert float(jnp.abs(m).max()) < 1e-4
    assert float(jnp.abs(s - 1.0).max()) < 1e-2


# --------------------------------------------------------------- drop path
def test_drop_path_train_vs_eval():
    x = jnp.ones((8, 4, 4, 2))
    dp = DropPath(rate=0.5)
    v = dp.init({"params": jax.random.key(0), "dropout": jax.random.key(1)},
                x, False)
    # eval: exact identity
    assert jnp.array_equal(dp.apply(v, x, True), x)
    # train: whole samples are dropped (all-zero) or rescaled by 1/keep
    y = dp.apply(v, x, False, rngs={"dropout": jax.random.key(2)})
    per_sample = y.reshape(8, -1)
    zeroed = jnp.all(per_sample == 0.0, axis=1)
    kept = jnp.all(jnp.abs(per_sample - 2.0) < 1e-6, axis=1)
    assert bool(jnp.all(zeroed | kept))
    assert 0 < int(zeroed.sum()) < 8  # both outcomes occur at rate 0.5


# ------------------------------------------------- use_v2 changes the model
def test_swin_use_v2_adds_stage_conv_blocks():
    def n_params(settings):
        m = SwinUNetR(num_input_features=4, num_output_features=3,
                      input_shape=(16, 16), settings=settings)
        v = m.init(jax.random.key(0), jnp.ones((1, 16, 16, 4)))
        return sum(a.size for a in jax.tree.leaves(v))

    base = dict(feature_size=8, depths=(1, 1), num_heads=(2, 2), window_size=4)
    assert n_params(SwinUNetRSettings(use_v2=True, **base)) > n_params(
        SwinUNetRSettings(use_v2=False, **base)
    )


def test_swin_normalize_adds_stage_layernorms():
    def n_params(settings):
        m = SwinUNetR(num_input_features=4, num_output_features=3,
                      input_shape=(16, 16), settings=settings)
        v = m.init(jax.random.key(0), jnp.ones((1, 16, 16, 4)))
        return sum(a.size for a in jax.tree.leaves(v))

    base = dict(feature_size=8, depths=(1, 1), num_heads=(2, 2), window_size=4)
    assert n_params(SwinUNetRSettings(normalize=True, **base)) > n_params(
        SwinUNetRSettings(normalize=False, **base)
    )


# ------------------------------------- dropout is live in the training loop
@pytest.mark.parametrize(
    "model_name,args",
    [
        ("SwinUNetR", {"feature_size": 8, "depths": (1, 1),
                       "num_heads": (2, 2), "window_size": 4,
                       "drop_rate": 0.3, "attn_drop_rate": 0.2,
                       "dropout_path_rate": 0.2}),
        ("UNetRPP", {"hidden_size": 32, "depths": (1, 1),
                     "num_heads_encoder": 4, "num_heads_decoder": 2,
                     "encoder_proj_sizes": (16, 16), "dropout_rate": 0.3}),
    ],
)
def test_dropout_fires_in_train_and_not_in_eval(model_name, args):
    m = _module(model_name, args)
    batch = synthetic_batch(INFO, batch_size=2, num_pred_steps=1)

    # training: different dropout rngs → different losses (train_step
    # DONATES its state, so draw an identical fresh state per call)
    _, l1 = m.train_step(m.init_state(jax.random.key(0), 4), batch,
                         jax.random.key(1))
    _, l2 = m.train_step(m.init_state(jax.random.key(0), 4), batch,
                         jax.random.key(2))
    assert jnp.isfinite(l1) and jnp.isfinite(l2)
    assert float(l1) != float(l2)

    # eval: deterministic — the rng must not matter
    state = m.init_state(jax.random.key(0), 4)
    _, s1 = m.eval_step(state, batch, jax.random.key(1))
    _, s2 = m.eval_step(state, batch, jax.random.key(2))
    assert jnp.array_equal(s1, s2)


def test_zero_rates_keep_training_rng_free():
    # with every rate at 0 the training rng must not affect the loss
    # (dropout plumbing must not perturb the rate-0 path)
    args = {"feature_size": 8, "depths": (1, 1), "num_heads": (2, 2),
            "window_size": 4}
    m = _module("SwinUNetR", args)
    batch = synthetic_batch(INFO, batch_size=2, num_pred_steps=1)
    _, l1 = m.train_step(m.init_state(jax.random.key(0), 4), batch,
                         jax.random.key(1))
    _, l2 = m.train_step(m.init_state(jax.random.key(0), 4), batch,
                         jax.random.key(2))
    assert float(l1) == float(l2)


def test_scanned_epa_stage_dropout_runs():
    # depths > 1 exercises the nn.scan path (split dropout rngs per layer)
    args = {"hidden_size": 32, "depths": (2, 2), "num_heads_encoder": 4,
            "num_heads_decoder": 2, "encoder_proj_sizes": (16, 16),
            "dropout_rate": 0.25}
    m = _module("UNetRPP", args)
    state = m.init_state(jax.random.key(0), 4)
    batch = synthetic_batch(INFO, batch_size=2, num_pred_steps=1)
    state, loss = m.train_step(state, batch, jax.random.key(1))
    assert jnp.isfinite(loss)


def test_requested_pallas_backend_warns_when_it_cannot_engage():
    # attention_code explicitly requested the kernel; on this CPU test
    # backend it cannot engage — a silent fallback would be the same
    # parity trap as an ignored setting, so it must say so
    from py4cast_tpu.ops.attention import use_pallas_attention

    with pytest.warns(UserWarning, match="cannot engage"):
        assert use_pallas_attention(64, 64, requested=True) is False


def test_registry_builds_with_reference_yaml_values():
    # the exact reference yaml settings (unetrpp.yaml) must construct
    kls, settings = get_model_kls_and_settings(
        "UNetRPP",
        {"pos_embed": "perceptron", "norm_name": "instance",
         "dropout_rate": 0.0, "conv_op": "Conv2d",
         "attention_code": "torch", "hidden_size": 64,
         "depths": [1, 1], "encoder_proj_sizes": [16, 16]},
    )
    assert settings.attention_code == "torch"
