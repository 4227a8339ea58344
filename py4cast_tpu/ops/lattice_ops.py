"""Dense lattice primitives for graph message passing on TPU.

Every graph this framework builds (``models/graph.py::build_graph_artifacts``)
is a regular lattice coarsening, so all of its edge sets have separable
structure:

- intra-level 8-neighbor edges  → a 2-D STENCIL (shift + add),
- grid↔mesh nearest / surrounding-4 edges → row/col TAKES (tiny gathers
  along one axis) and SEPARABLE 0/1 SELECTION MATMULS for aggregation,
- multimesh levels → DILATED stencils on sub-lattices.

That removes every million-row gather/scatter from the GNN step: the
remaining index ops touch only ≤(grid side) index vectors, and the
aggregations ride the MXU as small dense matmuls. Both Mosaic compile
time and HBM traffic drop by an order of magnitude vs the table-based
path (``ops/graph_ops.py``), which remains as the general-graph
fallback. Semantics are identical (equivalence-tested in
``tests/test_lattice_graph.py``).

Reference behavior being re-expressed: neural-lam message passing as
used by the reference's mfai GNNs (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

#: fixed direction order for 8-neighbor stencils — MUST match the edge
#: enumeration order of ``models/graph.py::_neighbors8``
DIRS8: Tuple[Tuple[int, int], ...] = tuple(
    (di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1) if (di, dj) != (0, 0)
)


def shift2d(v: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    """Shift a (..., H, W, h) lattice so out[a, b] = v[a - di, b - dj],
    zero-filled outside — i.e. align each cell's (di, dj)-neighbor
    (the edge SOURCE) with the cell itself (the edge DESTINATION)."""
    H, W = v.shape[-3], v.shape[-2]
    pad = [(0, 0)] * v.ndim
    pad[-3] = (max(di, 0), max(-di, 0))
    pad[-2] = (max(dj, 0), max(-dj, 0))
    out = jnp.pad(v, pad)
    r0, c0 = max(-di, 0), max(-dj, 0)
    return out[..., r0 : r0 + H, c0 : c0 + W, :]


def sep_take(v: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """Separable lattice gather: out[i, j] = v[rows[i], cols[j]] on the
    (-3, -2) axes. rows/cols are small per-axis index vectors — the
    whole "gather" is two thin axis takes, never an (E,)-row gather."""
    return jnp.take(jnp.take(v, rows, axis=-3), cols, axis=-2)


def sep_take_mm(v: jnp.ndarray, a_rows: jnp.ndarray,
                a_cols: jnp.ndarray) -> jnp.ndarray:
    """``sep_take`` expressed as transposed 0/1 selection matmuls:
    out = a_rows^T · v · a_cols, with a_rows (ch, fh) the aggregation
    matrix of ``sel_matrix`` (a_rows[rows[i], i] = 1; a_cols likewise).
    Exact — each output cell selects exactly one source cell, no sums.

    Use this form in DIFFERENTIATED code: ``jnp.take``'s VJP is a
    scatter-add, which XLA serializes on TPU — the backward of the
    grid-sized g2m/m2g takes alone cost ~10x the whole forward pass
    (measured, 500x500 HiLAM). The matmul's linear transpose is
    ``sep_aggregate``'s matmul, so both directions ride the MXU."""
    x = jnp.einsum("Ri,...Rjh->...ijh", a_rows, v)
    return jnp.einsum("Cj,...iCh->...ijh", a_cols, x)


def sep_aggregate(x: jnp.ndarray, a_rows: jnp.ndarray,
                  a_cols: jnp.ndarray) -> jnp.ndarray:
    """Separable sum-aggregation (fine → coarse) via 0/1 selection
    matmuls: out[R, C] = Σ_{i: row_map[i]=R} Σ_{j: col_map[j]=C} x[i, j].

    x: (..., fh, fw, h); a_rows: (ch, fh); a_cols: (cw, fw). The two
    matmuls are tiny and land on the MXU — this is the scatter-free,
    lattice-native form of per-destination-node aggregation."""
    x = jnp.einsum("Ri,...ijh->...Rjh", a_rows, x)
    return jnp.einsum("Cj,...Rjh->...RCh", a_cols, x)


# ------------------------------------------------------------- build helpers
def sel_matrix(idx: np.ndarray, n_rows: int) -> np.ndarray:
    """0/1 selection matrix M (n_rows, len(idx)) with M[idx[i], i] = 1.
    ``M @ x`` sums x's rows into their mapped destinations (aggregation);
    for unique idx it is a pure scatter placement."""
    m = np.zeros((n_rows, len(idx)), dtype=np.float32)
    m[idx, np.arange(len(idx))] = 1.0
    return m


def stencil_feats(
    pos: np.ndarray, scale: float | None = None
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Static 8-direction edge features + existence mask for a lattice.

    pos: (lh, lw, 2) node positions. Returns (feats (8, lh, lw, 3),
    mask (8, lh, lw, 1), scale). feats[d, a, b] = [dx, dy, len] / scale
    of the edge from the (di, dj)-neighbor INTO cell (a, b) — matching
    ``_edge_feats(pos[src], pos[dst])`` with scale = max length over the
    edge set (pass ``scale`` to share normalization across sets, e.g.
    the multimesh union)."""
    lh, lw, _ = pos.shape
    feats = np.zeros((8, lh, lw, 3), dtype=np.float32)
    mask = np.zeros((8, lh, lw, 1), dtype=np.float32)
    for d, (di, dj) in enumerate(DIRS8):
        src_r = slice(max(-di, 0), lh - max(di, 0))
        src_c = slice(max(-dj, 0), lw - max(dj, 0))
        dst_r = slice(max(di, 0), lh - max(-di, 0))
        dst_c = slice(max(dj, 0), lw - max(-dj, 0))
        d_vec = pos[src_r, src_c] - pos[dst_r, dst_c]
        length = np.linalg.norm(d_vec, axis=-1, keepdims=True)
        feats[d, dst_r, dst_c, :2] = d_vec
        feats[d, dst_r, dst_c, 2:] = length
        mask[d, dst_r, dst_c] = 1.0
    if scale is None:
        scale = max(float(feats[..., 2].max()), 1e-12)
    feats /= scale
    feats *= mask  # keep non-edges exactly zero
    return feats, mask, scale


def pair_feats(
    pos_src: np.ndarray, pos_dst: np.ndarray, scale: float | None = None
) -> Tuple[np.ndarray, float]:
    """Edge features for a one-edge-per-cell bipartite lattice map
    (up/down/g2m/m2g corners): same formula as ``_edge_feats``, kept in
    lattice shape (..., 3)."""
    d = pos_src - pos_dst
    length = np.linalg.norm(d, axis=-1, keepdims=True)
    if scale is None:
        scale = max(float(length.max()), 1e-12)
    return np.concatenate([d / scale, length / scale], axis=-1).astype(
        np.float32
    ), scale
