"""NamedArray semantics tests (mirrors reference tests/test_datasets.py:15-111)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py4cast_tpu.named_tensor import NamedArray


def make_nt(shape=(2, 4, 4, 3), features=("u", "v", "t")):
    return NamedArray(
        np.arange(np.prod(shape), dtype=np.float32).reshape(shape),
        ("timestep", "lat", "lon", "features"),
        features,
    )


def test_basic_metadata():
    nt = make_nt()
    assert nt.dim_index("lat") == 1
    assert nt.dim_size("timestep") == 2
    assert nt.spatial_dim_idx == [1, 2]
    assert nt.num_spatial_dims == 2
    assert nt.feature_index("v") == 1


def test_feature_count_mismatch_raises():
    with pytest.raises(ValueError):
        NamedArray(
            np.zeros((2, 4, 4, 3)), ("timestep", "lat", "lon", "features"), ("u", "v")
        )


def test_rank_mismatch_raises():
    with pytest.raises(ValueError):
        NamedArray(np.zeros((2, 4)), ("a", "b", "c"), ())


def test_select_drops_dim():
    nt = make_nt()
    s = nt.select("timestep", 1)
    assert s.names == ("lat", "lon", "features")
    assert s.shape == (4, 4, 3)
    np.testing.assert_array_equal(s.array, nt.array[1])


def test_index_select_keeps_dim():
    nt = make_nt()
    s = nt.index_select("timestep", [1])
    assert s.shape == (1, 4, 4, 3)


def test_flatten_unflatten_roundtrip():
    nt = make_nt()
    flat = nt.flatten("ngrid", 1, 2)
    assert flat.names == ("timestep", "ngrid", "features")
    assert flat.shape == (2, 16, 3)
    back = flat.unflatten("ngrid", (4, 4), ("lat", "lon"))
    np.testing.assert_array_equal(back.array, nt.array)
    assert back.names == nt.names


def test_concat_features():
    a = make_nt(features=("u", "v", "t"))
    b = NamedArray(
        np.ones((2, 4, 4, 1), np.float32), a.names, ("q",)
    )
    c = NamedArray.concat([a, b])
    assert c.feature_names == ("u", "v", "t", "q")
    assert c.shape == (2, 4, 4, 4)
    # __or__ spelling
    d = a | b
    assert d.feature_names == c.feature_names


def test_concat_mismatched_names_raises():
    a = make_nt()
    b = NamedArray(np.ones((2, 4, 4, 1)), ("batch", "lat", "lon", "features"), ("q",))
    with pytest.raises(ValueError):
        NamedArray.concat([a, b])


def test_concat_duplicate_features_raises():
    a = make_nt()
    with pytest.raises(ValueError):
        NamedArray.concat([a, a])


def test_getitem_by_feature_name():
    nt = make_nt()
    v = nt["v"]
    assert v.shape == (2, 4, 4, 1)
    np.testing.assert_array_equal(v[..., 0], nt.array[..., 1])


def test_unsqueeze_squeeze():
    nt = make_nt()
    b = nt.unsqueeze("batch", 0)
    assert b.names == ("batch", "timestep", "lat", "lon", "features")
    back = b.squeeze("batch")
    assert back.names == nt.names
    with pytest.raises(ValueError):
        nt.unsqueeze("batch", 0).squeeze("timestep")  # size 2, not squeezable


def test_broadcast_like():
    target = make_nt()  # (timestep, lat, lon, features)
    cal = NamedArray(np.ones((2, 2), np.float32), ("timestep", "features"), ("a", "b"))
    out = cal.broadcast_like(target)
    assert out.names == ("timestep", "lat", "lon", "features")
    assert out.shape == (2, 4, 4, 2)


def test_pytree_roundtrip_and_jit():
    nt = make_nt()
    leaves, treedef = jax.tree_util.tree_flatten(nt)
    assert len(leaves) == 1
    nt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert nt2.names == nt.names
    assert nt2.feature_names == nt.feature_names

    @jax.jit
    def double(x: NamedArray) -> NamedArray:
        # names are static under jit
        assert x.names == ("timestep", "lat", "lon", "features")
        return x.replace(x.array * 2)

    out = double(nt)
    assert isinstance(out, NamedArray)
    np.testing.assert_allclose(np.asarray(out.array), nt.array * 2)


def test_jnp_backend():
    nt = NamedArray(
        jnp.zeros((2, 4, 4, 3)), ("timestep", "lat", "lon", "features"), ("u", "v", "t")
    )
    s = nt.select("timestep", 0)
    assert s.shape == (4, 4, 3)
    f = nt.flatten("ngrid", 1, 2)
    assert f.shape == (2, 16, 3)
