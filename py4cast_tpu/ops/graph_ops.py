"""Scatter-free message-passing primitives for TPU.

``jax.ops.segment_sum`` lowers to XLA scatter-add, which is slow to
compile and execute on TPU (Mosaic compiles a 4-IN HiLAM step in >400s;
the same program with these primitives is seconds). Because message
aggregation is a plain sum and our graphs have bounded degree by
construction (m2g: 4, down: 1, intra: ≤8, g2m/up: coarsening ratio),
both directions can be pure GATHERS:

- forward aggregate:  agg[n] = Σ_k e[table[n, k]]  (padded index table)
- backward aggregate: de[j] = dagg[dst[j]]          (gather, no scatter)
- forward gather:     vs[j] = v[src[j]]
- backward gather:    dv[n] = Σ_k dvs[src_table[n, k]] (padded table)

custom_vjp wires these pairs so XLA never sees a scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_table(idx: np.ndarray, n_rows: int) -> np.ndarray:
    """Padded inverse-index table: table[n] lists the positions j with
    idx[j] == n, padded with len(idx) (a virtual zero row)."""
    idx = np.asarray(idx)
    order = np.argsort(idx, kind="stable")
    sorted_idx = idx[order]
    counts = np.bincount(idx, minlength=n_rows)
    k_max = int(counts.max()) if len(idx) else 1
    table = np.full((n_rows, max(k_max, 1)), len(idx), dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # vectorized fill: position within each segment
    within = np.arange(len(idx)) - starts[sorted_idx]
    table[sorted_idx, within] = order
    return table


# --------------------------------------------------------- edge aggregation
@jax.custom_vjp
def edge_aggregate(e: jnp.ndarray, dst_table: jnp.ndarray,
                   dst_idx: jnp.ndarray) -> jnp.ndarray:
    """Σ over incoming edges per destination node.

    e: (B, E, h); dst_table: (Nd, K) indices into E (pad = E);
    dst_idx: (E,) destination of each edge (used by the backward pass).
    Returns (B, Nd, h).
    """
    e_pad = jnp.concatenate(
        [e, jnp.zeros(e.shape[:1] + (1,) + e.shape[2:], e.dtype)], axis=1
    )
    return jnp.take(e_pad, dst_table, axis=1).sum(axis=2)


def _agg_fwd(e, dst_table, dst_idx):
    return edge_aggregate(e, dst_table, dst_idx), (dst_idx,)


def _agg_bwd(res, g):
    (dst_idx,) = res
    # de[j] = dagg[dst[j]] — a gather
    de = jnp.take(g, dst_idx, axis=1)
    return de, None, None


edge_aggregate.defvjp(_agg_fwd, _agg_bwd)


# -------------------------------------------------------------- node gather
@jax.custom_vjp
def gather_nodes(v: jnp.ndarray, idx: jnp.ndarray,
                 table: jnp.ndarray) -> jnp.ndarray:
    """Per-edge gather of node states: vs[j] = v[idx[j]].

    v: (B, N, h); idx: (E,); table: (N, K) inverse table of idx
    (used by the backward pass). Returns (B, E, h).
    """
    return jnp.take(v, idx, axis=1)


def _gather_fwd(v, idx, table):
    return gather_nodes(v, idx, table), (table,)


def _gather_bwd(res, g):
    (table,) = res
    g_pad = jnp.concatenate(
        [g, jnp.zeros(g.shape[:1] + (1,) + g.shape[2:], g.dtype)], axis=1
    )
    dv = jnp.take(g_pad, table, axis=1).sum(axis=2)
    return dv, None, None


gather_nodes.defvjp(_gather_fwd, _gather_bwd)
