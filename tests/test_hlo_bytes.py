"""Parity-audit the padded HBM-traffic model (ops/hlo_bytes.py) against
hand-derivable programs: the model must (a) reproduce matmul traffic
within modeling tolerance, (b) scale linearly with scan trip counts
(while bodies charged × trips), and (c) amortize scan-output stacking
(dynamic-update-slice charged once per loop, not per iteration)."""

import jax
import jax.numpy as jnp
import pytest

from py4cast_tpu.ops.hlo_bytes import (
    hbm_traffic_bytes,
    parse_hlo,
    shape_bytes,
)


def _traffic(fn, *args):
    hlo = jax.jit(fn).lower(*args).compile().as_text()
    return hbm_traffic_bytes(hlo), hlo


def test_matmul_traffic_close_to_hand_count():
    # 1024x1024 fp32: traffic ≈ A + B + C = 3 * 4 MiB (tile-aligned dims,
    # no padding). Allow fusion/copy slack but the model must be within
    # 2x of the hand count and never below it.
    n = 1024
    a = jnp.ones((n, n), jnp.float32)
    b = jnp.ones((n, n), jnp.float32)
    got, _ = _traffic(lambda x, y: x @ y, a, b)
    hand = 3 * n * n * 4
    assert hand <= got <= 2 * hand, (got, hand)


def test_scan_traffic_scales_with_trip_count():
    # carry matmul against a fixed weight: per-trip traffic is constant
    # (read carry + weight, write carry), so doubling trips ~doubles
    # the total minus the one-time entry overhead.
    w = jnp.ones((512, 512), jnp.float32)
    x = jnp.ones((8, 512), jnp.float32)

    def make(k):
        def f(x, w):
            def body(c, _):
                return jnp.tanh(c @ w), None
            y, _ = jax.lax.scan(body, x, None, length=k)
            return y
        return f

    t8, hlo8 = _traffic(make(8), x, w)
    t16, hlo16 = _traffic(make(16), x, w)
    ratio = t16 / t8
    assert 1.6 < ratio < 2.2, (t8, t16, ratio)
    # and the trip count really came from the condition constant
    assert "constant" in hlo8


def test_stacked_scan_outputs_amortized_not_per_iter():
    # scan stacking a (k, 1024, 1024) output via in-place DUS: the
    # stacked buffer must be charged ~once (4k MiB), NOT k times.
    k = 16
    w = jnp.ones((1024, 1024), jnp.float32)
    x = jnp.ones((1024, 1024), jnp.float32)

    def f(x, w):
        def body(c, _):
            c = jnp.tanh(c @ w)
            return c, c
        _, ys = jax.lax.scan(body, x, None, length=k)
        return ys

    got, _ = _traffic(f, x, w)
    slab = k * 1024 * 1024 * 4  # the stacked output, once
    per_iter = 3 * 1024 * 1024 * 4  # read c + w, write c
    hand = slab + k * per_iter
    # per-iteration charging of the slab would give >= k*slab = 4x hand;
    # 2.5x headroom covers XLA-CPU's extra materializations (separate
    # tanh fusion, zero-init broadcast of the stacked buffer)
    assert hand * 0.5 <= got <= hand * 2.5, (got, hand)


def test_shape_bytes_padding_model():
    # f32[4,21] with default minor-last layout: pads to (8, 128)
    assert shape_bytes("f32[4,21]") == 4 * 21 * 4
    assert shape_bytes("f32[4,21]{1,0}", padded=True) == 8 * 128 * 4
    # explicit layout putting dim0 minor: pad dim0 to 128, dim1 to 8
    assert shape_bytes("f32[4,21]{0,1}", padded=True) == 128 * 24 * 4
    # bf16 packs two rows per 32-bit sublane row: tile (16, 128)
    assert shape_bytes("bf16[4,128]{1,0:T(8,128)(2,1)}", padded=True) \
        == 16 * 128 * 2


def test_parse_finds_entry_and_while():
    w = jnp.ones((256, 256), jnp.float32)
    x = jnp.ones((8, 256), jnp.float32)

    def f(x, w):
        def body(c, _):
            return jnp.tanh(c @ w), None
        y, _ = jax.lax.scan(body, x, None, length=7)
        return y

    hlo = jax.jit(f).lower(x, w).compile().as_text()
    comps = parse_hlo(hlo)
    assert any(c.is_entry for c in comps.values())
    assert any(
        i.opcode == "while" for c in comps.values() for i in c.instrs
    )


def test_traffic_positive_on_train_step_program():
    # smoke: a real (tiny) model train-step program parses and yields a
    # sane positive figure larger than its parameter payload
    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh
    from py4cast_tpu.testing import (
        synthetic_dataset_info,
        synthetic_device_arrays,
    )
    from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings

    info = synthetic_dataset_info(grid_shape=(32, 32), weather_features=3,
                                  forcing_features=2)
    settings = TrainingSettings(
        model_name="HalfUNet", settings_init_args={"num_filters": 8},
        training_strategy="scaled_ar", num_input_steps=2,
    )
    mesh = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    module = AutoRegressiveModule(settings, info, mesh=mesh)
    state = module.init_state(jax.random.key(0), num_training_steps=10)
    inputs, forcing, outputs = synthetic_device_arrays(
        module, batch_size=1, num_pred_steps=1
    )
    buffers = module.step_buffers()

    def step(state, inputs, forcing, outputs, rng, buffers):
        grad_fn = jax.value_and_grad(module._batch_loss, has_aux=True)
        (loss, _), grads = grad_fn(
            state.params, inputs, forcing, outputs, 1, rng, buffers
        )
        return state.apply_gradients(grads=grads), loss

    hlo = (
        jax.jit(step)
        .lower(state, inputs, forcing, outputs, jax.random.key(1), buffers)
        .compile()
        .as_text()
    )
    got = hbm_traffic_bytes(hlo)
    n_param_bytes = sum(
        p.size * p.dtype.itemsize for p in jax.tree.leaves(state.params)
    )
    assert got > n_param_bytes
