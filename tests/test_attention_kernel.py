"""Pallas short-KV attention kernel: forward + custom-VJP gradients must
match the XLA reference within tolerance (interpret mode on CPU)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py4cast_tpu.ops.attention import (
    dot_product_attention_short_kv,
    short_kv_attention,
)

BH, LQ, LK, D = 3, 300, 64, 32  # LQ deliberately not a block multiple


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((BH, LQ, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((BH, LK, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((BH, LK, D)), jnp.float32)
    return q, k, v


def _ref(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)


def test_forward_matches_reference(qkv):
    q, k, v = qkv
    scale = 1.0 / (D**0.5)
    got = short_kv_attention(q, k, v, scale, 128, True)  # interpret mode
    expect = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-4, atol=2e-5)


def test_gradients_match_reference(qkv):
    q, k, v = qkv
    scale = 1.0 / (D**0.5)

    def loss_ours(q, k, v):
        return jnp.sum(short_kv_attention(q, k, v, scale, 128, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v, scale) ** 2)

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ours, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_bhld_wrapper_matches_flax(qkv):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, LQ, 4, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, LK, 4, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, LK, 4, D)), jnp.float32)
    got = dot_product_attention_short_kv(q, k, v, interpret=True)
    expect = nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=2e-4, atol=2e-5)
