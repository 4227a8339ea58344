"""Fused m2g corner-hop Pallas kernel vs the XLA formula — forward and
full gradients (interpret mode, runs on CPU), plus model-level param-tree
identity between the fused and unfused LatticeEncodeDecode paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py4cast_tpu.ops.hop_kernel import LN_EPS, fused_corner_hop

#: H=10 → band height 5, TWO row bands — exercises cross-band
#: weight-gradient accumulation
B, H, W, HID, FF = 2, 10, 12, 16, 3


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    psg = tuple(arr(B, H, W, HID) for _ in range(4))
    vd = arr(B, H, W, HID)
    feats = arr(4, H, W, FF)
    wf = arr(FF, HID) * 0.3
    bf = arr(HID) * 0.1
    wd = arr(HID, HID) * 0.3
    wo = arr(HID, HID) * 0.3
    bo = arr(HID) * 0.1
    lns = arr(HID) * 0.2 + 1.0
    lnb = arr(HID) * 0.1
    nd0a = arr(HID, HID) * 0.3
    nd0b = arr(HID, HID) * 0.3
    nb0 = arr(HID) * 0.1
    nd1 = arr(HID, HID) * 0.3
    nb1 = arr(HID) * 0.1
    nlns = arr(HID) * 0.2 + 1.0
    nlnb = arr(HID) * 0.1
    return (psg, vd, feats, wf, bf, wd, wo, bo, lns, lnb,
            nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb)


def _ln(t, s, b):
    mu = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
    return (t - mu) * jax.lax.rsqrt(var + LN_EPS) * s + b


def reference(psg, vd, feats, wf, bf, wd, wo, bo, lns, lnb,
              nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb, mean=False):
    """The exact XLA formula from LatticeEncodeDecode's corners branch."""
    pd = vd @ wd
    pf = feats @ wf + bf
    pre = pf[:, None] + jnp.stack(psg, axis=0) + pd[None]
    t = jax.nn.silu(pre) @ wo + bo
    agg = _ln(t, lns, lnb).sum(axis=0)
    if mean:
        agg = agg / 4.0
    u = jax.nn.silu(vd @ nd0a + agg @ nd0b + nb0)
    y = _ln(u @ nd1 + nb1, nlns, nlnb)
    return vd + y


@pytest.mark.parametrize("mode", [1, 2])
@pytest.mark.parametrize("mean", [False, True])
def test_forward_matches_reference(inputs, mean, mode):
    got = fused_corner_hop(*inputs, mean=mean, interpret=True, mode=mode)
    want = reference(*inputs, mean=mean)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", [1, 2])
@pytest.mark.parametrize("mean", [False, True])
def test_gradients_match_reference(inputs, mean, mode):
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.standard_normal((B, H, W, HID)).astype(np.float32))

    def loss_fused(*args):
        return jnp.sum(
            fused_corner_hop(*args, mean=mean, interpret=True, mode=mode) * g
        )

    def loss_ref(*args):
        return jnp.sum(reference(*args, mean=mean) * g)

    # every differentiable input except the static feats (slot 2)
    argnums = tuple(i for i in range(len(inputs)) if i != 2)
    got = jax.grad(loss_fused, argnums=argnums)(*inputs)
    want = jax.grad(loss_ref, argnums=argnums)(*inputs)
    names = ("psg", "vd", "wf", "bf", "wd", "wo", "bo", "lns", "lnb",
             "nd0a", "nd0b", "nb0", "nd1", "nb1", "nlns", "nlnb")
    for name, gf, gr in zip(names, got, want):
        np.testing.assert_allclose(
            gf, gr, rtol=2e-4, atol=2e-4, err_msg=f"grad mismatch: {name}"
        )


@pytest.mark.parametrize("mode", [1, 2])
def test_wide_grid_pad_path_is_exact(mode):
    """W > 256 triggers the zero-pad + column-tile path — forward and
    gradients must stay exact (pad contributions vanish)."""
    rng = np.random.default_rng(3)

    def arr(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    b, hh, w, hid = 1, 2, 300, 8
    args = (
        tuple(arr(b, hh, w, hid) for _ in range(4)),
        arr(b, hh, w, hid), arr(4, hh, w, FF),
        arr(FF, hid) * 0.3, arr(hid) * 0.1, arr(hid, hid) * 0.3,
        arr(hid, hid) * 0.3, arr(hid) * 0.1, arr(hid) * 0.2 + 1.0,
        arr(hid) * 0.1, arr(hid, hid) * 0.3, arr(hid, hid) * 0.3,
        arr(hid) * 0.1, arr(hid, hid) * 0.3, arr(hid) * 0.1,
        arr(hid) * 0.2 + 1.0, arr(hid) * 0.1,
    )
    got = fused_corner_hop(*args, mean=True, interpret=True, mode=mode)
    want = reference(*args, mean=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    g = jnp.asarray(rng.standard_normal((b, hh, w, hid)).astype(np.float32))
    argnums = (0, 1, 3, 10)
    got_g = jax.grad(
        lambda *a: jnp.sum(
            fused_corner_hop(*a, mean=True, interpret=True, mode=mode) * g
        ),
        argnums=argnums,
    )(*args)
    want_g = jax.grad(
        lambda *a: jnp.sum(reference(*a, mean=True) * g), argnums=argnums
    )(*args)
    for gf, gr in zip(got_g, want_g):
        np.testing.assert_allclose(gf, gr, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("mode", [1, 2])
def test_model_param_tree_and_forward_parity(mode):
    """The fused path must register the SAME param tree as the XLA path,
    and (in interpret mode via monkeypatched gate) produce the same
    output."""
    import py4cast_tpu.ops.hop_kernel as hk
    from py4cast_tpu.models.graph import LatticeEncodeDecode

    rng = np.random.default_rng(2)
    h = 8
    v_src = jnp.asarray(rng.standard_normal((1, 3, 4, h)).astype(np.float32))
    v_dst = jnp.asarray(rng.standard_normal((1, 6, 8, h)).astype(np.float32))
    r0 = np.array([0, 0, 1, 1, 2, 2])
    r1 = np.clip(r0 + 1, 0, 2)
    c0 = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    c1 = np.clip(c0 + 1, 0, 3)
    from py4cast_tpu.ops.lattice_ops import sel_matrix

    lat = {
        "feats": jnp.asarray(
            rng.standard_normal((4, 6, 8, 3)).astype(np.float32)
        ),
        "rows": jnp.asarray(np.stack([r0, r1]), jnp.int32),
        "cols": jnp.asarray(np.stack([c0, c1]), jnp.int32),
        "ar": jnp.asarray(np.stack([sel_matrix(r0, 3), sel_matrix(r1, 3)])),
        "ac": jnp.asarray(np.stack([sel_matrix(c0, 4), sel_matrix(c1, 4)])),
    }
    mod = LatticeEncodeDecode(h, kind="corners", aggr="sum")

    orig = hk.use_fused_hop
    try:
        hk.use_fused_hop = lambda hl: False
        params_xla = mod.init(jax.random.key(0), v_src, v_dst, lat)
        out_xla = mod.apply(params_xla, v_src, v_dst, lat)

        hk.use_fused_hop = lambda hl: mode
        orig_fused = hk._fused

        def interp_fused(mean, interpret, *args):
            return orig_fused(mean, True, *args)

        hk._fused = interp_fused
        params_fused = mod.init(jax.random.key(0), v_src, v_dst, lat)
        out_fused = mod.apply(params_fused, v_src, v_dst, lat)
    finally:
        hk.use_fused_hop = orig
        hk._fused = orig_fused

    flat_x = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(params_xla)
    }
    flat_f = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(params_fused)
    }
    assert set(flat_x) == set(flat_f)
    for path, vx in flat_x.items():
        np.testing.assert_allclose(
            flat_f[path], vx, err_msg=f"init value drift at {path}"
        )
    np.testing.assert_allclose(out_fused, out_xla, rtol=1e-5, atol=1e-5)
