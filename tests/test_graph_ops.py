"""Scatter-free graph primitives: values and custom-VJP gradients must
match the jax.ops.segment_sum reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from py4cast_tpu.ops.graph_ops import build_table, edge_aggregate, gather_nodes

B, N, E, H = 2, 7, 19, 5
rng = np.random.default_rng(0)
DST = np.sort(rng.integers(0, N, E)).astype(np.int32)
SRC = rng.integers(0, N, E).astype(np.int32)
EDGE = jnp.asarray(rng.standard_normal((B, E, H)), jnp.float32)
V = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)


def test_build_table_inverts_index():
    table = build_table(DST, N)
    for n in range(N):
        got = sorted(j for j in table[n] if j < E)
        expect = sorted(np.nonzero(DST == n)[0].tolist())
        assert got == expect


def test_edge_aggregate_matches_segment_sum():
    table = jnp.asarray(build_table(DST, N))
    got = edge_aggregate(EDGE, table, jnp.asarray(DST))
    expect = jax.vmap(
        lambda e: jax.ops.segment_sum(e, jnp.asarray(DST), num_segments=N)
    )(EDGE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5)


def test_edge_aggregate_gradient_matches():
    table = jnp.asarray(build_table(DST, N))
    dst = jnp.asarray(DST)

    def f_ours(e):
        return jnp.sum(edge_aggregate(e, table, dst) ** 2)

    def f_ref(e):
        agg = jax.vmap(
            lambda ee: jax.ops.segment_sum(ee, dst, num_segments=N)
        )(e)
        return jnp.sum(agg**2)

    g_ours = jax.grad(f_ours)(EDGE)
    g_ref = jax.grad(f_ref)(EDGE)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref), rtol=1e-5)


def test_gather_nodes_gradient_matches():
    src = jnp.asarray(SRC)
    table = jnp.asarray(build_table(SRC, N))

    def f_ours(v):
        return jnp.sum(gather_nodes(v, src, table) ** 3)

    def f_ref(v):
        return jnp.sum(jnp.take(v, src, axis=1) ** 3)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_ours)(V)),
        np.asarray(jax.grad(f_ref)(V)),
        rtol=1e-5,
    )


def test_empty_destination_rows_are_zero():
    # node with no incoming edges must aggregate to exactly zero
    dst = np.asarray([0, 0, 2], np.int32)  # node 1 has no edges
    e = jnp.ones((1, 3, 4))
    table = jnp.asarray(build_table(dst, 3))
    agg = edge_aggregate(e, table, jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(agg[0, 1]), np.zeros(4))
    np.testing.assert_allclose(np.asarray(agg[0, 0]), 2 * np.ones(4))
