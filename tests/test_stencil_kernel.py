"""Fused stencil-message Pallas kernel vs the XLA formula — forward and
full gradients (interpret mode, runs on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py4cast_tpu.ops.stencil_kernel import (
    LN_EPS,
    fused_stencil_message,
)

#: H=12 → band height 6, TWO row bands — exercises the cross-band
#: weight-gradient accumulation
B, H, W, HID, FIN = 2, 12, 12, 16, 16


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    e = arr(B, 8, H, W, FIN)
    vs = arr(B, 8, H, W, HID)
    pd = arr(B, H, W, HID)
    mask = jnp.asarray(
        (rng.uniform(size=(8, H, W, 1)) > 0.2).astype(np.float32)
    )
    we = arr(FIN, HID) * 0.3
    be = arr(HID) * 0.1
    wo = arr(HID, HID) * 0.3
    bo = arr(HID) * 0.1
    lns = arr(HID) * 0.2 + 1.0
    lnb = arr(HID) * 0.1
    return e, vs, pd, mask, we, be, wo, bo, lns, lnb


def reference(e, vs, pd, mask, we, be, wo, bo, lns, lnb):
    """The exact XLA formula from _StencilMessage's unfused branch."""
    pre = e @ we + be + vs + pd[:, None]
    z = jax.nn.silu(pre)
    t = z @ wo + bo
    mu = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
    e_new = (t - mu) * jax.lax.rsqrt(var + LN_EPS) * lns + lnb
    agg = (e_new * mask[None]).sum(axis=1)
    return e_new, agg


@pytest.mark.parametrize("mode", [1, 2])
def test_forward_matches_reference(inputs, mode):
    got_enew, got_agg = fused_stencil_message(*inputs, interpret=True,
                                              mode=mode)
    want_enew, want_agg = reference(*inputs)
    np.testing.assert_allclose(got_enew, want_enew, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_agg, want_agg, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", [1, 2])
def test_gradients_match_reference(inputs, mode):
    rng = np.random.default_rng(1)
    g_enew = jnp.asarray(
        rng.standard_normal((B, 8, H, W, HID)).astype(np.float32)
    )
    g_agg = jnp.asarray(rng.standard_normal((B, H, W, HID)).astype(np.float32))

    def loss_fused(*args):
        e_new, agg = fused_stencil_message(*args, interpret=True, mode=mode)
        return jnp.sum(e_new * g_enew) + jnp.sum(agg * g_agg)

    def loss_ref(*args):
        e_new, agg = reference(*args)
        return jnp.sum(e_new * g_enew) + jnp.sum(agg * g_agg)

    argnums = tuple(i for i in range(10) if i != 3)  # all but mask
    got = jax.grad(loss_fused, argnums=argnums)(*inputs)
    want = jax.grad(loss_ref, argnums=argnums)(*inputs)
    names = ("e", "vs", "pd", "we", "be", "wo", "bo", "lns", "lnb")
    for name, g, w in zip(names, got, want):
        np.testing.assert_allclose(
            g, w, rtol=2e-4, atol=2e-4, err_msg=f"grad {name}"
        )


@pytest.mark.parametrize("mode", [1, 2])
def test_module_fused_equals_xla_path(inputs, monkeypatch, mode):
    """_StencilMessage with the kernel forced ON equals the XLA branch,
    params and outputs (the param trees must be interchangeable)."""
    import flax.linen as nn  # noqa: F401

    from py4cast_tpu.models import graph as graph_mod
    from py4cast_tpu.ops import stencil_kernel

    v = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, H, W, HID)), jnp.float32
    )
    e = inputs[0]
    mask = inputs[3]

    msg = graph_mod._StencilMessage(HID, 1, "sum")

    monkeypatch.setattr(
        stencil_kernel, "use_fused_stencil", lambda hl: 0
    )
    params_xla = msg.init(jax.random.key(0), v, e, mask)
    out_xla = msg.apply(params_xla, v, e, mask)

    # force the fused path (interpret via default_device on CPU is not
    # available — patch the kernel to interpret mode)
    monkeypatch.setattr(
        stencil_kernel, "use_fused_stencil",
        lambda hl: mode if hl == 1 else 0,
    )
    real_fwd = stencil_kernel._fwd_call
    # arg 11 is `interpret` (after the 10 tensors/params and `mode`)
    monkeypatch.setattr(
        stencil_kernel, "_fwd_call",
        lambda *a: real_fwd(*a[:11], True, *a[12:]),
    )
    params_fused = msg.init(jax.random.key(0), v, e, mask)
    # identical param trees (path and values)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=0, atol=0),
        params_xla, params_fused,
    )
    out_fused = msg.apply(params_fused, v, e, mask)
    for a, b in zip(out_xla, out_fused):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


# ------------------------------------------------------------- residual
# residual=True folds the consumer's `e + e_new` into the kernel: first
# output becomes e + e_new (agg still aggregates raw e_new), backward
# adds the direct de path.


def _with_residual(ref_fn):
    def wrapped(*args):
        e_new, agg = ref_fn(*args)
        return args[0] + e_new, agg

    return wrapped


@pytest.mark.parametrize("mode", [1, 2])
def test_residual_forward_and_grads(inputs, mode):
    args = inputs
    fused = functools.partial(fused_stencil_message, interpret=True,
                              mode=mode, residual=True)
    ref = _with_residual(reference)

    got_eres, got_agg = fused(*args)
    want_eres, want_agg = ref(*args)
    np.testing.assert_allclose(got_eres, want_eres, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_agg, want_agg, rtol=1e-5, atol=1e-5)

    rng = np.random.default_rng(mode)
    g_eres = jnp.asarray(
        rng.standard_normal((B, 8, H, W, HID)).astype(np.float32)
    )
    g_agg = jnp.asarray(rng.standard_normal((B, H, W, HID)).astype(np.float32))

    def loss(fn):
        def inner(*a):
            e_res, agg = fn(*a)
            return jnp.sum(e_res * g_eres) + jnp.sum(agg * g_agg)

        return inner

    argnums = tuple(i for i in range(10) if i != 3)  # all but mask
    got = jax.grad(loss(fused), argnums=argnums)(*args)
    want = jax.grad(loss(ref), argnums=argnums)(*args)
    names = ("e", "vs", "pd", "we", "be", "wo", "bo", "lns", "lnb")
    for name, g, w in zip(names, got, want):
        np.testing.assert_allclose(
            g, w, rtol=2e-4, atol=2e-4, err_msg=f"grad {name} mode {mode}"
        )


def test_residual_requires_matching_width(inputs):
    e, vs, pd, mask, we, be, wo, bo, lns, lnb = inputs
    with pytest.raises(ValueError, match="residual fold"):
        fused_stencil_message(e[..., :8], vs, pd, mask, we[:8], be, wo, bo,
                              lns, lnb, interpret=True, residual=True)


def test_fused_gates_disable_under_spatial_sharding(monkeypatch):
    """A pallas_call is an opaque custom call to GSPMD — every fused
    kernel gate must yield the XLA path when the Trainer exports a
    spatial mesh axis > 1 (P4T_SPATIAL_SHARDS)."""
    from py4cast_tpu.ops import attention as attn_mod
    from py4cast_tpu.ops import hop_kernel
    from py4cast_tpu.ops import stencil_kernel

    monkeypatch.setattr(attn_mod, "_target_platform", lambda: "tpu")
    monkeypatch.setenv("P4T_FUSED_STENCIL", "2")
    monkeypatch.setenv("P4T_FUSED_HOP", "1")
    monkeypatch.setenv("P4T_FUSED_ATTENTION", "1")

    monkeypatch.setenv("P4T_SPATIAL_SHARDS", "1")
    assert stencil_kernel.use_fused_stencil(1) == 2
    assert hop_kernel.use_fused_hop(1) == 2
    assert attn_mod.use_pallas_attention(64, 128)

    monkeypatch.setenv("P4T_SPATIAL_SHARDS", "2")
    assert stencil_kernel.use_fused_stencil(1) == 0
    assert hop_kernel.use_fused_hop(1) == 0
    assert not attn_mod.use_pallas_attention(64, 128)


def test_spatial_shard_gate_is_explicit_module_state(monkeypatch):
    """ADVICE r3: the gate is explicit state set via set_spatial_shards
    (per-module, re-asserted before each trace); the env var is only a
    manual override."""
    from py4cast_tpu.ops import attention as attn_mod

    monkeypatch.delenv("P4T_SPATIAL_SHARDS", raising=False)
    monkeypatch.setattr(attn_mod, "_SPATIAL_SHARDS", 1)
    assert not attn_mod.spatially_sharded()
    attn_mod.set_spatial_shards(4)
    assert attn_mod.spatially_sharded()
    attn_mod.set_spatial_shards(1)  # a second trainer resets the gate
    assert not attn_mod.spatially_sharded()
    monkeypatch.setenv("P4T_SPATIAL_SHARDS", "2")  # env overrides
    assert attn_mod.spatially_sharded()
