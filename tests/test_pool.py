"""Scatter-free max_pool_2x2 vs nn.max_pool — values and gradients,
including odd spatial tails and exact-tie windows."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py4cast_tpu.ops.pool import max_pool_2x2


@pytest.mark.parametrize("shape", [(2, 8, 10, 5), (1, 7, 9, 3)])
def test_values_match_nn_max_pool(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    got = max_pool_2x2(x)
    want = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape", [(2, 8, 10, 5), (1, 7, 9, 3)])
def test_gradients_match_select_and_scatter(shape):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    def loss_ours(x):
        return jnp.sum(max_pool_2x2(x) ** 2)

    def loss_xla(x):
        return jnp.sum(nn.max_pool(x, (2, 2), strides=(2, 2)) ** 2)

    np.testing.assert_allclose(
        jax.grad(loss_ours)(x), jax.grad(loss_xla)(x), rtol=1e-6, atol=1e-6
    )


def test_tie_break_routes_to_first_row_major():
    """A constant window must send the whole cotangent to position
    (0, 0) — the select_and_scatter / torch convention."""
    x = jnp.ones((1, 2, 2, 1), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(max_pool_2x2(x) * 3.0))(x)
    np.testing.assert_array_equal(
        np.asarray(g)[0, :, :, 0], np.array([[3.0, 0.0], [0.0, 0.0]])
    )
    # and must agree with XLA's convention
    g_xla = jax.grad(
        lambda x: jnp.sum(nn.max_pool(x, (2, 2), strides=(2, 2)) * 3.0)
    )(x)
    np.testing.assert_array_equal(g, g_xla)
