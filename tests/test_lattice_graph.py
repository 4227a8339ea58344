"""Lattice fast path ⇄ gather-table path equivalence for the GNNs.

The lattice path (ops/lattice_ops.py + the Lattice* modules in
models/graph.py) re-expresses every edge op as dense stencils/separable
matmuls. These tests pin the two invariants everything rests on:

1. identical param trees (same names, same shapes) — so checkpoints and
   the tiny-surrogate init interchange between paths,
2. identical forward outputs for shared params (up to fp tolerance).

Reference semantics being preserved: neural-lam message passing as used
by the reference's mfai GNNs (SURVEY.md §2.2).
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from py4cast_tpu.models.graph import (
    GraphLAM,
    GraphModelSettings,
    HiLAM,
    HiLAMParallel,
    build_graph_artifacts,
)
from py4cast_tpu.ops.lattice_ops import (
    DIRS8,
    sel_matrix,
    sep_aggregate,
    sep_take,
    shift2d,
    stencil_feats,
)

H, W = 24, 20


@pytest.fixture(scope="module")
def graph():
    mesh = np.stack(
        np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij")
    )
    s = GraphModelSettings(hidden_dims=16, processor_layers=2, mesh_levels=3)
    g = build_graph_artifacts(mesh, s)
    assert g.lattice and g.multi_lattice_ok
    return s, g


def _models(kls, s, g):
    kw = dict(
        num_input_features=5,
        num_output_features=3,
        input_shape=(H * W,),
        graph=g,
    )
    return (
        kls(settings=s, **kw),
        kls(settings=replace(s, use_lattice=False), **kw),
    )


@pytest.mark.parametrize("kls", [GraphLAM, HiLAM, HiLAMParallel])
def test_param_tree_identical(kls, graph):
    s, g = graph
    m_lat, m_tab = _models(kls, s, g)
    x = jnp.zeros((1, H * W, 5), jnp.float32)
    p_lat = m_lat.init(jax.random.key(0), x)
    p_tab = m_tab.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(p_lat) == jax.tree_util.tree_structure(
        p_tab
    )
    assert jax.tree.map(jnp.shape, p_lat) == jax.tree.map(jnp.shape, p_tab)


@pytest.mark.parametrize("kls", [GraphLAM, HiLAM, HiLAMParallel])
@pytest.mark.parametrize("aggr", ["sum", "mean"])
def test_forward_equivalent(kls, graph, aggr):
    s, g = graph
    s = replace(s, mesh_aggr=aggr)
    m_lat, m_tab = _models(kls, s, g)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, H * W, 5)), jnp.float32
    )
    params = m_tab.init(jax.random.key(0), x)
    y_tab = m_tab.apply(params, x)
    y_lat = m_lat.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_lat), np.asarray(y_tab), rtol=2e-4, atol=2e-4
    )


def test_shift2d_matches_neighbor_indexing():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((2, 5, 6, 3)), jnp.float32)
    for di, dj in DIRS8:
        out = np.asarray(shift2d(v, di, dj))
        ref = np.zeros_like(out)
        for a in range(5):
            for b in range(6):
                sa, sb = a - di, b - dj
                if 0 <= sa < 5 and 0 <= sb < 6:
                    ref[:, a, b] = np.asarray(v)[:, sa, sb]
        np.testing.assert_array_equal(out, ref)


def test_sep_take_and_aggregate():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 4)), jnp.float32)
    rows = np.array([0, 0, 1, 2, 2, 1], dtype=np.int32)
    cols = np.array([1, 0, 0, 2, 1, 1, 0, 2], dtype=np.int32)
    # take
    taken = np.asarray(sep_take(jnp.asarray(x[:, :3, :3]), rows, cols))
    ref = np.asarray(x)[:, :3, :3][:, rows][:, :, cols]
    np.testing.assert_array_equal(taken, ref)
    # matmul take form must match exactly (0/1 selection, no summation)
    a_r3, a_c3 = (
        jnp.asarray(sel_matrix(rows, 3)),
        jnp.asarray(sel_matrix(cols, 3)),
    )
    from py4cast_tpu.ops.lattice_ops import sep_take_mm

    taken_mm = np.asarray(sep_take_mm(jnp.asarray(x[:, :3, :3]), a_r3, a_c3))
    np.testing.assert_array_equal(taken_mm, ref)
    # aggregate: brute-force per-destination sum
    a_r, a_c = jnp.asarray(sel_matrix(rows, 3)), jnp.asarray(sel_matrix(cols, 3))
    agg = np.asarray(sep_aggregate(x, a_r, a_c))
    ref = np.zeros((2, 3, 3, 4), np.float32)
    for i, r in enumerate(rows):
        for j, c in enumerate(cols):
            ref[:, r, c] += np.asarray(x)[:, i, j]
    np.testing.assert_allclose(agg, ref, rtol=1e-5, atol=1e-5)


def test_stencil_feats_matches_edge_enumeration():
    """Lattice stencil features must equal _edge_feats over _neighbors8."""
    from py4cast_tpu.models.graph import _edge_feats, _neighbors8

    rng = np.random.default_rng(2)
    lh, lw = 5, 7
    pos = rng.standard_normal((lh, lw, 2))
    feats, mask, _ = stencil_feats(pos)
    src, dst = _neighbors8(lh, lw)
    ref = _edge_feats(pos.reshape(-1, 2)[src], pos.reshape(-1, 2)[dst])
    # _neighbors8 enumerates directions in DIRS8 order: walk the blocks
    k = 0
    for d, (di, dj) in enumerate(DIRS8):
        n_d = (lh - abs(di)) * (lw - abs(dj))
        block_dst = dst[k : k + n_d]
        block_feats = ref[k : k + n_d]
        a, b = np.unravel_index(block_dst, (lh, lw))
        np.testing.assert_allclose(
            feats[d, a, b], block_feats, rtol=1e-6, atol=1e-6
        )
        assert (mask[d, a, b] == 1.0).all()
        k += n_d
    assert mask.sum() == len(src)
