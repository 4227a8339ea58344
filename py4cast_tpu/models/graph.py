"""Graph weather models: GraphLAM, HiLAM, HiLAMParallel.

TPU-native re-design of the neural-lam-style mesh GNNs the reference
pulls from mfai (reference settings: config/CLI/model/graphlam.yaml,
hilam.yaml, hilamparallel.yaml; contract: SURVEY.md §2.2 — GRAPH models
consume flattened (B, ngrid, features)).

Design for TPU:
- The multiscale mesh is built ONCE on host in numpy (``build_graph``,
  the analog of the reference's rank_zero_setup, lightning.py:141-144)
  with STATIC shapes: regular coarsenings of the grid, 8-neighbor
  intra-level edges, nearest-neighbor up/down/g2m/m2g bipartite edges.
- Message passing = gather (jnp.take) + ``jax.ops.segment_sum`` with a
  static segment count; edges are sorted by destination at build time
  so the scatter is near-sequential in memory.
- Batching via a leading batch dim on node states; edge ops vmap over it.
- Hierarchy sweeps (HiLAM) are statically unrolled over the (few) levels.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from py4cast_tpu.models.base import ModelBase, ModelType


@dataclass(frozen=True)
class GraphModelSettings:
    tmp_dir: str = "/tmp"  # accepted for config parity; graphs stay in RAM
    hidden_dims: int = 64
    hidden_layers: int = 1
    use_checkpointing: bool = False
    offload_to_cpu: bool = False  # accepted; remat covers the memory need
    mesh_aggr: str = "sum"
    processor_layers: int = 4
    mesh_levels: int = 3
    coarsen_factor: int = 4
    #: run message passing as dense lattice ops (stencils + separable
    #: selection matmuls, ops/lattice_ops.py) instead of gather tables —
    #: numerically equivalent on the lattice graphs this builder makes,
    #: ~10× faster to compile and step on TPU. Param trees are identical
    #: between the two paths (tested), so checkpoints interchange.
    use_lattice: bool = True

    def __post_init__(self):
        if self.offload_to_cpu:
            import warnings

            warnings.warn(
                "offload_to_cpu is a torch-CUDA memory lever the TPU "
                "build does not need: use use_checkpointing (remat) to "
                "cut activation residency. The flag is accepted for "
                "config parity but has no effect."
            )


class EdgeSet:
    """Static edge set: src/dst indices + static edge features."""

    def __init__(self, src: np.ndarray, dst: np.ndarray, feats: np.ndarray):
        order = np.argsort(dst, kind="stable")  # near-sequential scatter
        self.src = src[order].astype(np.int32)
        self.dst = dst[order].astype(np.int32)
        self.feats = feats[order].astype(np.float32)

    def __len__(self):
        return len(self.src)


class GraphArtifacts:
    """All static graph data. Hash/eq by identity so it can live as a
    linen module attribute without deep comparisons."""

    def __init__(
        self,
        n_grid: int,
        mesh_pos: List[np.ndarray],
        intra: List[EdgeSet],
        up: List[EdgeSet],
        down: List[EdgeSet],
        g2m: EdgeSet,
        m2g: EdgeSet,
        multi: Optional[EdgeSet] = None,
        grid_hw: Optional[Tuple[int, int]] = None,
        level_hw: Optional[List[Tuple[int, int]]] = None,
        lattice_np: Optional[dict] = None,
        multi_lattice_ok: bool = False,
    ):
        self.n_grid = n_grid
        self.mesh_pos = mesh_pos  # per-level (Nl, 2) normalized positions
        self.intra = intra  # per-level intra-mesh edges
        self.up = up  # level l -> l+1
        self.down = down  # level l+1 -> l
        self.g2m = g2m  # grid -> mesh level 0
        self.m2g = m2g  # mesh level 0 -> grid
        # GraphCast-style nested multimesh: all levels' edges expressed on
        # the level-0 node set (GraphLAM's processor graph)
        self.multi = multi
        self.level_sizes = [p.shape[0] for p in mesh_pos]
        offs = np.cumsum([0] + self.level_sizes)
        self.level_offsets = offs
        self.n_mesh = int(offs[-1])
        # --- lattice fast-path metadata (ops/lattice_ops.py): present iff
        # the graph was built as regular lattice coarsenings, in which
        # case every edge op has a dense stencil/separable form
        self.grid_hw = grid_hw
        self.level_hw = level_hw
        self.lattice_np = lattice_np
        self.lattice = lattice_np is not None
        # equivalence of the lattice multimesh requires the union edge
        # set to be dedup-free (only fails on degenerate tiny lattices)
        self.multi_lattice_ok = multi_lattice_ok

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _edge_feats(pos_src: np.ndarray, pos_dst: np.ndarray) -> np.ndarray:
    """Static per-edge features: displacement + length, max-normalized."""
    d = pos_src - pos_dst
    length = np.linalg.norm(d, axis=-1, keepdims=True)
    scale = max(length.max(), 1e-12)
    return np.concatenate([d / scale, length / scale], axis=-1)


def _grid_of(h: int, w: int) -> np.ndarray:
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack([ii.ravel(), jj.ravel()], axis=1)


def _neighbors8(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    """8-neighborhood edges on an h×w lattice (both directions)."""
    idx = np.arange(h * w).reshape(h, w)
    src, dst = [], []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            si = slice(max(0, -di), h - max(0, di))
            sj = slice(max(0, -dj), w - max(0, dj))
            ti = slice(max(0, di), h + min(0, di))
            tj = slice(max(0, dj), w + min(0, dj))
            src.append(idx[si, sj].ravel())
            dst.append(idx[ti, tj].ravel())
    return np.concatenate(src), np.concatenate(dst)


def _nearest_rc(
    fine_hw: Tuple[int, int], coarse_hw: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-axis nearest-coarse-index maps — the separable core of the
    nearest-node mapping on regular linspace lattices."""
    fh, fw = fine_hw
    ch, cw = coarse_hw
    ri = np.rint(np.arange(fh) * (ch - 1) / max(fh - 1, 1)).astype(int)
    ci = np.rint(np.arange(fw) * (cw - 1) / max(fw - 1, 1)).astype(int)
    return ri, ci


def _nearest_on_lattice(
    fine_hw: Tuple[int, int], coarse_hw: Tuple[int, int]
) -> np.ndarray:
    """Nearest coarse-lattice node per fine node, by index arithmetic —
    O(N) instead of an O(N·M) distance matrix (full Titan grids have
    ~330k nodes). Both lattices are regular linspace subsamplings."""
    ri, ci = _nearest_rc(fine_hw, coarse_hw)
    return (ri[:, None] * coarse_hw[1] + ci[None, :]).ravel()


def _corners_rc(
    fine_hw: Tuple[int, int], coarse_hw: Tuple[int, int]
) -> Tuple[Tuple[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]:
    """Per-axis floor/ceil coarse-index maps for the surrounding-4
    (bilinear-style) mapping."""
    fh, fw = fine_hw
    ch, cw = coarse_hw
    r = np.arange(fh) * (ch - 1) / max(fh - 1, 1)
    c = np.arange(fw) * (cw - 1) / max(fw - 1, 1)
    r0 = np.clip(np.floor(r).astype(int), 0, ch - 1)
    r1 = np.clip(r0 + 1, 0, ch - 1)
    c0 = np.clip(np.floor(c).astype(int), 0, cw - 1)
    c1 = np.clip(c0 + 1, 0, cw - 1)
    return (r0, r1), (c0, c1)


def _surrounding4_on_lattice(
    fine_hw: Tuple[int, int], coarse_hw: Tuple[int, int]
) -> np.ndarray:
    """The 4 surrounding coarse-lattice nodes per fine node: (Nf, 4)."""
    cw = coarse_hw[1]
    (r0, r1), (c0, c1) = _corners_rc(fine_hw, coarse_hw)
    out = np.stack(
        [
            (r0[:, None] * cw + c0[None, :]),
            (r0[:, None] * cw + c1[None, :]),
            (r1[:, None] * cw + c0[None, :]),
            (r1[:, None] * cw + c1[None, :]),
        ],
        axis=-1,
    )
    return out.reshape(-1, 4)


def build_graph_artifacts(
    meshgrid: np.ndarray, settings: GraphModelSettings
) -> GraphArtifacts:
    """Build the multiscale mesh from the grid coordinates.

    meshgrid: (2, H, W) coordinates (the Statics.meshgrid contract,
    reference: datasets/base.py:198-230).
    """
    _, h, w = meshgrid.shape
    pos = np.stack([meshgrid[0], meshgrid[1]], axis=-1).reshape(-1, 2)
    # normalize positions to [0, 1]
    pmin, pmax = pos.min(0), pos.max(0)
    pos = (pos - pmin) / np.where(pmax > pmin, pmax - pmin, 1.0)

    # ---- mesh levels: NESTED regular coarsenings. Level l is a stride-2
    # subsample of level l-1's lattice, so every coarse node coincides
    # with a level-0 node — which lets GraphLAM's multimesh express all
    # levels' edges on the single level-0 node set (GraphCast multi-mesh).
    f = settings.coarsen_factor
    lh0, lw0 = max(2, h // f), max(2, w // f)
    row_sel = [np.linspace(0, h - 1, lh0).astype(int)]  # grid-row indices
    col_sel = [np.linspace(0, w - 1, lw0).astype(int)]
    row_in0 = [np.arange(lh0)]  # position of each level's rows in level 0
    col_in0 = [np.arange(lw0)]
    for _ in range(1, settings.mesh_levels):
        r0 = row_in0[-1][::2] if len(row_in0[-1]) > 3 else row_in0[-1][[0, -1]]
        c0 = col_in0[-1][::2] if len(col_in0[-1]) > 3 else col_in0[-1][[0, -1]]
        row_in0.append(r0)
        col_in0.append(c0)
        row_sel.append(row_sel[0][r0])
        col_sel.append(col_sel[0][c0])

    mesh_pos: List[np.ndarray] = []
    level_hw: List[Tuple[int, int]] = []
    for ii, jj in zip(row_sel, col_sel):
        sel = (ii[:, None] * w + jj[None, :]).ravel()
        mesh_pos.append(pos[sel])
        level_hw.append((len(ii), len(jj)))

    # ---- intra-level 8-neighbor edges
    intra = []
    for (lh, lw), p in zip(level_hw, mesh_pos):
        src, dst = _neighbors8(lh, lw)
        intra.append(EdgeSet(src, dst, _edge_feats(p[src], p[dst])))

    # ---- up (l → l+1: each fine node sends to its nearest coarse node)
    #      and down (l+1 → l: reversed)
    up, down = [], []
    for level in range(settings.mesh_levels - 1):
        fine, coarse = mesh_pos[level], mesh_pos[level + 1]
        near_c = _nearest_on_lattice(level_hw[level], level_hw[level + 1])
        src_u = np.arange(len(fine))
        up.append(EdgeSet(src_u, near_c, _edge_feats(fine[src_u], coarse[near_c])))
        down.append(
            EdgeSet(near_c, src_u, _edge_feats(coarse[near_c], fine[src_u]))
        )

    # ---- grid ↔ mesh level 0
    m0 = mesh_pos[0]
    g2m_dst = _nearest_on_lattice((h, w), level_hw[0])
    g2m = EdgeSet(
        np.arange(len(pos)), g2m_dst, _edge_feats(pos, m0[g2m_dst])
    )
    m2g_src4 = _surrounding4_on_lattice((h, w), level_hw[0])
    src = m2g_src4.ravel()
    dst = np.repeat(np.arange(len(pos)), 4)
    m2g = EdgeSet(src, dst, _edge_feats(m0[src], pos[dst]))

    # ---- nested multimesh (GraphLAM): each level's 8-neighbor edges
    # mapped onto the LEVEL-0 node set via the nesting indices
    msrc, mdst = [], []
    lw0_ = level_hw[0][1]
    for level, (lh, lw) in enumerate(level_hw):
        s, t = _neighbors8(lh, lw)
        r0, c0 = row_in0[level], col_in0[level]
        to0 = (r0[:, None] * lw0_ + c0[None, :]).ravel()
        msrc.append(to0[s])
        mdst.append(to0[t])
    msrc = np.concatenate(msrc)
    mdst = np.concatenate(mdst)
    # dedupe edges shared between levels (level-l edges ⊄ level-(l+1)'s,
    # but endpoints can coincide at tiny sizes)
    key = msrc.astype(np.int64) * len(m0) + mdst
    uniq_keys, uniq = np.unique(key, return_index=True)
    multi_lattice_ok = len(uniq_keys) == len(key)
    msrc, mdst = msrc[uniq], mdst[uniq]
    multi = EdgeSet(msrc, mdst, _edge_feats(m0[msrc], m0[mdst]))

    lat = _build_lattice_meta(
        pos, (h, w), mesh_pos, level_hw, row_in0, col_in0, settings
    )
    return GraphArtifacts(
        len(pos), mesh_pos, intra, up, down, g2m, m2g, multi,
        grid_hw=(h, w), level_hw=level_hw, lattice_np=lat,
        multi_lattice_ok=multi_lattice_ok,
    )


def _build_lattice_meta(
    pos: np.ndarray,
    grid_hw: Tuple[int, int],
    mesh_pos: List[np.ndarray],
    level_hw: List[Tuple[int, int]],
    row_in0: List[np.ndarray],
    col_in0: List[np.ndarray],
    settings: GraphModelSettings,
) -> dict:
    """Dense lattice metadata for the scatter/gather-free message-passing
    path (ops/lattice_ops.py). Everything here is exactly the same edge
    data as the EdgeSet tables, re-expressed in separable lattice form:
    per-direction stencil features + masks (intra/multimesh), per-axis
    index maps + 0/1 selection matrices (g2m/m2g/up/down)."""
    from py4cast_tpu.ops.lattice_ops import (
        pair_feats, sel_matrix, stencil_feats,
    )

    h, w = grid_hw
    lat: dict = {}

    # --- intra-level 8-neighbor stencils
    for lev, ((lh, lw), p) in enumerate(zip(level_hw, mesh_pos)):
        feats, mask, _ = stencil_feats(p.reshape(lh, lw, 2))
        lat[f"lat_intra_{lev}_feats"] = feats
        lat[f"lat_intra_{lev}_mask"] = mask
        lat[f"lat_intra_{lev}_count"] = mask.sum(axis=0)

    # --- up (fine→coarse nearest) / down (reverse): separable maps
    for lev in range(settings.mesh_levels - 1):
        fhw, chw = level_hw[lev], level_hw[lev + 1]
        ri, ci = _nearest_rc(fhw, chw)
        fine = mesh_pos[lev].reshape(*fhw, 2)
        coarse = mesh_pos[lev + 1].reshape(*chw, 2)
        cg = coarse[ri][:, ci]  # coarse partner per fine cell
        up_f, scale = pair_feats(fine, cg)
        down_f, _ = pair_feats(cg, fine, scale)  # same lengths → same scale
        a_r, a_c = sel_matrix(ri, chw[0]), sel_matrix(ci, chw[1])
        count = (a_r.sum(1)[:, None] * a_c.sum(1)[None, :])[..., None]
        lat[f"lat_up_{lev}_feats"] = up_f
        lat[f"lat_up_{lev}_rows"] = ri.astype(np.int32)
        lat[f"lat_up_{lev}_cols"] = ci.astype(np.int32)
        lat[f"lat_up_{lev}_ar"] = a_r
        lat[f"lat_up_{lev}_ac"] = a_c
        lat[f"lat_up_{lev}_count"] = count.astype(np.float32)
        lat[f"lat_down_{lev}_feats"] = down_f
        lat[f"lat_down_{lev}_rows"] = ri.astype(np.int32)
        lat[f"lat_down_{lev}_cols"] = ci.astype(np.int32)
        # down takes coarse→fine along the same nearest map; the matmul
        # take form (sep_take_mm) reuses up's selection matrices
        lat[f"lat_down_{lev}_ar"] = a_r
        lat[f"lat_down_{lev}_ac"] = a_c

    # --- g2m: grid (fine) → mesh level 0 (coarse), nearest
    hw0 = level_hw[0]
    grid_lat = pos.reshape(h, w, 2)
    m0_lat = mesh_pos[0].reshape(*hw0, 2)
    ri, ci = _nearest_rc((h, w), hw0)
    g2m_f, _ = pair_feats(grid_lat, m0_lat[ri][:, ci])
    a_r, a_c = sel_matrix(ri, hw0[0]), sel_matrix(ci, hw0[1])
    lat["lat_g2m_feats"] = g2m_f
    lat["lat_g2m_rows"] = ri.astype(np.int32)
    lat["lat_g2m_cols"] = ci.astype(np.int32)
    lat["lat_g2m_ar"] = a_r
    lat["lat_g2m_ac"] = a_c
    lat["lat_g2m_count"] = (
        a_r.sum(1)[:, None] * a_c.sum(1)[None, :]
    )[..., None].astype(np.float32)

    # --- m2g: mesh level 0 → grid, surrounding-4 corners
    (r0, r1), (c0, c1) = _corners_rc((h, w), hw0)
    src_pos = np.stack(
        [m0_lat[rk][:, ck] for rk in (r0, r1) for ck in (c0, c1)]
    )  # (4, h, w, 2) in the table path's corner order r0c0,r0c1,r1c0,r1c1
    m2g_f, _ = pair_feats(src_pos, grid_lat[None])
    lat["lat_m2g_feats"] = m2g_f
    lat["lat_m2g_rows"] = np.stack([r0, r1]).astype(np.int32)
    lat["lat_m2g_cols"] = np.stack([c0, c1]).astype(np.int32)
    # per-corner selection matrices for the matmul take form
    lat["lat_m2g_ar"] = np.stack(
        [sel_matrix(r0, hw0[0]), sel_matrix(r1, hw0[0])]
    )
    lat["lat_m2g_ac"] = np.stack(
        [sel_matrix(c0, hw0[1]), sel_matrix(c1, hw0[1])]
    )

    # --- multimesh: per-level dilated stencils on level-0 sub-lattices,
    # sharing the union's feature normalization scale
    union_scale = 0.0
    for lev, ((lh, lw), p) in enumerate(zip(level_hw, mesh_pos)):
        _, _, s = stencil_feats(p.reshape(lh, lw, 2))
        union_scale = max(union_scale, s)
    count0 = np.zeros(hw0 + (1,), dtype=np.float32)
    for lev, ((lh, lw), p) in enumerate(zip(level_hw, mesh_pos)):
        feats, mask, _ = stencil_feats(p.reshape(lh, lw, 2), union_scale)
        lat[f"lat_multi_{lev}_feats"] = feats
        lat[f"lat_multi_{lev}_mask"] = mask
        rows, cols = row_in0[lev], col_in0[lev]
        lat[f"lat_multi_{lev}_rows"] = rows.astype(np.int32)
        lat[f"lat_multi_{lev}_cols"] = cols.astype(np.int32)
        s_r, s_c = sel_matrix(rows, hw0[0]), sel_matrix(cols, hw0[1])
        lat[f"lat_multi_{lev}_sr"] = s_r
        lat[f"lat_multi_{lev}_sc"] = s_c
        count0 += ((s_r @ mask.sum(axis=0)[..., 0]) @ s_c.T)[..., None]
    lat["lat_multi_count"] = count0
    return lat


class MLP(nn.Module):
    out_dim: int
    hidden_dim: int
    hidden_layers: int = 1
    layer_norm: bool = True

    @nn.compact
    def __call__(self, x):
        for _ in range(self.hidden_layers):
            x = nn.Dense(self.hidden_dim)(x)
            x = nn.silu(x)
        x = nn.Dense(self.out_dim)(x)
        if self.layer_norm:
            x = nn.LayerNorm()(x)
        return x


class EdgeMessage(nn.Module):
    """Edge-message half of an interaction network: e' = MLP([e, v_s, v_r])
    and its per-destination aggregate. All index ops are scatter-free
    gathers (py4cast_tpu.ops.graph_ops) — XLA-TPU compiles scatters
    pathologically slowly, gathers are fast both to compile and to run.

    HBM-traffic design (the GNN step is bandwidth-bound, ~67 GB/step
    measured on the 500×500 config before this layout):
    - The first dense of the edge MLP is DECOMPOSED over the concat:
      W[e ‖ v_s ‖ v_d] = W_e·e + W_s·v_s + W_d·v_d. Node states are
      projected at NODE granularity and the projections gathered per
      edge — for m2g (1M edges from 16k mesh nodes) that is a 64×
      smaller matmul operand, and the (E, 3h) concat never exists.
    - Regular edge sets (exactly K contiguous edges per destination,
      e.g. m2g K=4, down K=1) never gather v_dst at all: the projection
      broadcasts over K, and aggregation is a reshape-sum.

    ``edges`` is the dict slice of graph_arrays for one edge set:
    {src, dst, src_table, dst_table, dst_count}.
    """

    hidden_dim: int
    hidden_layers: int = 1
    aggr: str = "sum"

    @nn.compact
    def __call__(self, v_src, v_dst, e, edges: dict, regular_k=None):
        from py4cast_tpu.ops.graph_ops import edge_aggregate, gather_nodes

        h = self.hidden_dim
        # v_src: (B, Ns, h), v_dst: (B, Nd, h), e: (B, E, h)
        pe = nn.Dense(h, name="w_e")(e)
        ps = nn.Dense(h, use_bias=False, name="w_s")(v_src)
        pd = nn.Dense(h, use_bias=False, name="w_d")(v_dst)

        def tail(z):
            for i in range(self.hidden_layers - 1):
                z = nn.silu(nn.Dense(h, name=f"hidden_{i}")(z))
            z = nn.Dense(h, name="out")(z)
            return nn.LayerNorm(name="ln")(z)

        if regular_k:
            b, E, _ = pe.shape
            nd = E // regular_k
            pre = (
                pe.reshape(b, nd, regular_k, h)
                + gather_nodes(ps, edges["src"], edges["src_table"]).reshape(
                    b, nd, regular_k, h
                )
                + pd[:, :, None, :]
            )
            e_new4 = tail(nn.silu(pre))
            agg = e_new4.sum(axis=2)
            e_new = e_new4.reshape(b, E, h)
        else:
            pre = (
                pe
                + gather_nodes(ps, edges["src"], edges["src_table"])
                + gather_nodes(pd, edges["dst"], edges["dst_table"])
            )
            e_new = tail(nn.silu(pre))
            agg = edge_aggregate(e_new, edges["dst_table"], edges["dst"])
        if self.aggr == "mean":
            agg = agg / jnp.maximum(edges["dst_count"], 1.0)[None, :, None]
        return e_new, agg


class InteractionNetwork(nn.Module):
    """One GraphCast/neural-lam message-passing step over a static edge set.

    Sender and receiver node sets may differ (bipartite). Edge update:
    e' = MLP([e, v_s, v_r]); node update: v' = MLP([v, Σ_in e']) with
    residuals on both.
    """

    hidden_dim: int
    hidden_layers: int = 1
    aggr: str = "sum"
    update_edges: bool = True

    @nn.compact
    def __call__(self, v_src, v_dst, e, edges: dict, regular_k=None):
        e_new, agg = EdgeMessage(
            self.hidden_dim, self.hidden_layers, self.aggr, name="edge"
        )(v_src, v_dst, e, edges, regular_k)
        v_new = MLP(
            self.hidden_dim, self.hidden_dim, self.hidden_layers, name="node"
        )(jnp.concatenate([v_dst, agg], axis=-1))
        v_out = v_dst + v_new
        e_out = e + e_new if self.update_edges else e
        return v_out, e_out


class EncodeDecodeInteraction(nn.Module):
    """Lean interaction for the encode (g2m) / decode (m2g) hops, where
    edge states are never carried across layers: the static edge features
    (dx, dy, length) enter through ONE linear instead of a 2-layer embed
    chain, so per-edge work is silu(W_f·f + ps[src] + pd) → dense → LN →
    aggregate. On the big bipartite hops (m2g: 4·n_grid edges) this
    removes several (E, h) intermediates from HBM — the step is
    bandwidth-bound. Node update matches InteractionNetwork."""

    hidden_dim: int
    hidden_layers: int = 1
    aggr: str = "sum"

    @nn.compact
    def __call__(self, v_src, v_dst, feats, edges: dict, regular_k=None):
        from py4cast_tpu.ops.graph_ops import edge_aggregate, gather_nodes

        h = self.hidden_dim
        pf = nn.Dense(h, name="w_f")(feats)[None]  # (1, E, h) from static
        ps = nn.Dense(h, use_bias=False, name="w_s")(v_src)
        pd = nn.Dense(h, use_bias=False, name="w_d")(v_dst)

        def tail(z):
            z = nn.Dense(h, name="out")(nn.silu(z))
            return nn.LayerNorm(name="ln")(z)

        if regular_k:
            b, nd = pd.shape[:2]
            pre = (
                pf.reshape(1, nd, regular_k, h)
                + gather_nodes(ps, edges["src"], edges["src_table"]).reshape(
                    b, nd, regular_k, h
                )
                + pd[:, :, None, :]
            )
            agg = tail(pre).sum(axis=2)
        else:
            pre = (
                pf
                + gather_nodes(ps, edges["src"], edges["src_table"])
                + gather_nodes(pd, edges["dst"], edges["dst_table"])
            )
            agg = edge_aggregate(tail(pre), edges["dst_table"], edges["dst"])
        if self.aggr == "mean":
            agg = agg / jnp.maximum(edges["dst_count"], 1.0)[None, :, None]
        v_new = MLP(
            self.hidden_dim, self.hidden_dim, self.hidden_layers, name="node"
        )(jnp.concatenate([v_dst, agg], axis=-1))
        return v_dst + v_new


def _edge_dict(garr: dict, prefix: str) -> dict:
    return {
        k: garr[f"{prefix}_{k}"]
        for k in ("src", "dst", "src_table", "dst_table", "dst_count")
    }


def _lat_dict(garr: dict, prefix: str) -> dict:
    keys = ("feats", "mask", "count", "rows", "cols", "ar", "ac", "sr", "sc")
    return {
        k: garr[f"lat_{prefix}_{k}"]
        for k in keys
        if f"lat_{prefix}_{k}" in garr
    }


# =========================================================================
# Lattice fast path: the same message-passing math as EdgeMessage /
# InteractionNetwork / EncodeDecodeInteraction, re-expressed as dense
# lattice ops (ops/lattice_ops.py) — stencil shifts, separable takes,
# 0/1 selection matmuls. NO per-edge gathers or tables anywhere, so
# Mosaic compiles the step in seconds and every op tiles onto MXU/VPU.
# Param names are kept IDENTICAL to the table-path modules (w_e/w_s/w_d/
# hidden_i/out/ln under "edge", MLP under "node"), so the two paths
# share param trees and checkpoints (tests/test_lattice_graph.py).
# =========================================================================


class _DenseParams(nn.Module):
    """Registers nn.Dense-shaped params WITHOUT applying them — the fused
    Pallas stencil kernel consumes the raw weights. Path and initializers
    match nn.Dense exactly (``<name>/kernel``, ``<name>/bias``,
    lecun-normal/zeros), so the fused and XLA paths share param trees
    and checkpoints."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _LNParams(nn.Module):
    """nn.LayerNorm-shaped params (scale/bias) for the fused kernel."""

    @nn.compact
    def __call__(self, features: int):
        return (
            self.param("scale", nn.initializers.ones, (features,)),
            self.param("bias", nn.initializers.zeros, (features,)),
        )


class _NodeMLPParams(nn.Module):
    """MLP-shaped params (Dense_0 → Dense_1 → LayerNorm_0, the auto
    names flax gives ``MLP``'s submodules at hidden_layers=1) WITHOUT
    applying them — consumed raw by fused kernels. Param trees and
    checkpoints stay interchangeable with the XLA path."""

    hidden_dim: int

    @nn.compact
    def __call__(self, in_features: int):
        k0, b0 = _DenseParams(self.hidden_dim, name="Dense_0")(in_features)
        k1, b1 = _DenseParams(self.hidden_dim, name="Dense_1")(
            self.hidden_dim
        )
        s, b = _LNParams(name="LayerNorm_0")(self.hidden_dim)
        return k0, b0, k1, b1, s, b


class _StencilMessage(nn.Module):
    """EdgeMessage on an 8-neighbor lattice stencil. Edge states live as
    (B, 8, H, W, h) dense arrays in DIRS8 order; the per-edge source
    state arrives by a 2-pixel-pad shift instead of a gather."""

    hidden_dim: int
    hidden_layers: int = 1
    aggr: str = "sum"
    #: fold the edge-residual update in: return (e + e_new, agg) instead
    #: of (e_new, agg) — inside the Pallas kernel when fused (saves a
    #: read-read-write of the full edge state per layer), as a plain add
    #: on the XLA path. agg always aggregates raw e_new.
    residual: bool = False

    @nn.compact
    def __call__(self, v, e, mask, count=None):
        from py4cast_tpu.ops.lattice_ops import DIRS8, shift2d
        from py4cast_tpu.ops.stencil_kernel import (
            fused_stencil_message,
            use_fused_stencil,
        )

        h = self.hidden_dim
        ps = nn.Dense(h, use_bias=False, name="w_s")(v)
        pd = nn.Dense(h, use_bias=False, name="w_d")(v)
        fused_mode = use_fused_stencil(self.hidden_layers)
        if fused_mode:
            # fused Pallas stage: every (B, 8, H, W, h) intermediate
            # stays in VMEM (ops/stencil_kernel.py); param tree and
            # numerics match the XLA path below
            vs = jnp.stack([shift2d(ps, di, dj) for di, dj in DIRS8], axis=1)
            ke, be = _DenseParams(h, name="w_e")(e.shape[-1])
            ko, bo = _DenseParams(h, name="out")(h)
            lns, lnb = _LNParams(name="ln")(h)
            e_new, agg = fused_stencil_message(
                e, vs, pd, mask, ke, be, ko, bo, lns, lnb, mode=fused_mode,
                residual=self.residual,
            )
        else:
            vs = jnp.stack([shift2d(ps, di, dj) for di, dj in DIRS8], axis=1)
            pe = nn.Dense(h, name="w_e")(e)
            z = nn.silu(pe + vs + pd[:, None])
            for i in range(self.hidden_layers - 1):
                z = nn.silu(nn.Dense(h, name=f"hidden_{i}")(z))
            e_new = nn.LayerNorm(name="ln")(nn.Dense(h, name="out")(z))
            agg = (e_new * mask[None]).sum(axis=1)
            if self.residual:
                e_new = e + e_new
        if self.aggr == "mean":
            agg = agg / jnp.maximum(count[None], 1.0)
        return e_new, agg


class _NearestMessage(nn.Module):
    """EdgeMessage for one-edge-per-fine-cell bipartite maps (up_l, g2m
    direction): fine is the edge source, its nearest coarse cell the
    destination. Destination states arrive by separable take; the
    aggregation is two selection matmuls."""

    hidden_dim: int
    hidden_layers: int = 1
    aggr: str = "sum"

    @nn.compact
    def __call__(self, v_fine, v_coarse, e, lat: dict):
        from py4cast_tpu.ops.lattice_ops import sep_aggregate, sep_take_mm

        h = self.hidden_dim
        pe = nn.Dense(h, name="w_e")(e)
        ps = nn.Dense(h, use_bias=False, name="w_s")(v_fine)
        pd = nn.Dense(h, use_bias=False, name="w_d")(v_coarse)
        z = nn.silu(pe + ps + sep_take_mm(pd, lat["ar"], lat["ac"]))
        for i in range(self.hidden_layers - 1):
            z = nn.silu(nn.Dense(h, name=f"hidden_{i}")(z))
        e_new = nn.LayerNorm(name="ln")(nn.Dense(h, name="out")(z))
        agg = sep_aggregate(e_new, lat["ar"], lat["ac"])
        if self.aggr == "mean":
            agg = agg / jnp.maximum(lat["count"][None], 1.0)
        return e_new, agg


class _ReverseNearestMessage(nn.Module):
    """EdgeMessage for down_l (coarse → fine along the same nearest map,
    K=1): sources arrive by separable take, aggregation is identity."""

    hidden_dim: int
    hidden_layers: int = 1
    aggr: str = "sum"  # K=1 → mean == sum

    @nn.compact
    def __call__(self, v_coarse, v_fine, e, lat: dict):
        from py4cast_tpu.ops.lattice_ops import sep_take_mm

        h = self.hidden_dim
        pe = nn.Dense(h, name="w_e")(e)
        ps = nn.Dense(h, use_bias=False, name="w_s")(v_coarse)
        pd = nn.Dense(h, use_bias=False, name="w_d")(v_fine)
        z = nn.silu(pe + sep_take_mm(ps, lat["ar"], lat["ac"]) + pd)
        for i in range(self.hidden_layers - 1):
            z = nn.silu(nn.Dense(h, name=f"hidden_{i}")(z))
        e_new = nn.LayerNorm(name="ln")(nn.Dense(h, name="out")(z))
        return e_new, e_new


class LatticeInteractionNetwork(nn.Module):
    """InteractionNetwork on lattice-form edges — same residual node/edge
    updates and param tree ("edge" message + "node" MLP)."""

    hidden_dim: int
    hidden_layers: int = 1
    aggr: str = "sum"
    kind: str = "stencil"  # stencil | nearest | down
    update_edges: bool = True

    @nn.compact
    def __call__(self, v_src, v_dst, e, lat: dict):
        if self.kind == "stencil":
            # residual fold rides inside the fused kernel when active
            e_new, agg = _StencilMessage(
                self.hidden_dim, self.hidden_layers, self.aggr, name="edge",
                residual=self.update_edges,
            )(v_dst, e, lat["mask"], lat.get("count"))
            v_new = MLP(
                self.hidden_dim, self.hidden_dim, self.hidden_layers,
                name="node",
            )(jnp.concatenate([v_dst, agg], axis=-1))
            return v_dst + v_new, e_new if self.update_edges else e
        elif self.kind == "nearest":
            e_new, agg = _NearestMessage(
                self.hidden_dim, self.hidden_layers, self.aggr, name="edge"
            )(v_src, v_dst, e, lat)
        else:
            e_new, agg = _ReverseNearestMessage(
                self.hidden_dim, self.hidden_layers, self.aggr, name="edge"
            )(v_src, v_dst, e, lat)
        v_new = MLP(
            self.hidden_dim, self.hidden_dim, self.hidden_layers, name="node"
        )(jnp.concatenate([v_dst, agg], axis=-1))
        v_out = v_dst + v_new
        e_out = e + e_new if self.update_edges else e
        return v_out, e_out


class LatticeEncodeDecode(nn.Module):
    """EncodeDecodeInteraction on the lattice: 'nearest' is the g2m hop
    (grid → mesh0), 'corners' the m2g hop (mesh0 → grid through the 4
    surrounding coarse cells). Identical params (w_f/w_s/w_d/out/ln +
    node) and math to the table version."""

    hidden_dim: int
    hidden_layers: int = 1
    aggr: str = "sum"
    kind: str = "nearest"  # nearest (g2m) | corners (m2g)

    @nn.compact
    def __call__(self, v_src, v_dst, lat: dict):
        from py4cast_tpu.ops.hop_kernel import (
            fused_corner_hop,
            padded_width,
            use_fused_hop,
        )
        from py4cast_tpu.ops.lattice_ops import sep_aggregate, sep_take_mm

        h = self.hidden_dim
        ps = nn.Dense(h, use_bias=False, name="w_s")(v_src)
        hop_mode = use_fused_hop(self.hidden_layers)
        if self.kind == "corners" and hop_mode:
            # fused Pallas m2g: everything downstream of the corner
            # upsample runs in one VMEM pass (ops/hop_kernel.py); param
            # tree and numerics match the XLA path below
            kf, bf = _DenseParams(h, name="w_f")(lat["feats"].shape[-1])
            kd, _ = _DenseParams(h, use_bias=False, name="w_d")(
                v_dst.shape[-1]
            )
            ko, bo = _DenseParams(h, name="out")(h)
            lns, lnb = _LNParams(name="ln")(h)
            nd0, nb0, nd1, nb1, nlns, nlnb = _NodeMLPParams(
                h, name="node"
            )(2 * h)
            ar, ac = lat["ar"], lat["ac"]
            # zero-pad the column selection so each corner upsample is
            # born at the kernel's tile-aligned width — no grid-sized
            # pad ops in the step, and pad gradients vanish exactly
            wp = padded_width(v_dst.shape[-2])
            if ac.shape[-1] != wp:
                ac = jnp.pad(ac, ((0, 0), (0, 0), (0, wp - ac.shape[-1])))
            ps_g = tuple(
                sep_take_mm(ps, ar[k // 2], ac[k % 2]) for k in range(4)
            )
            return fused_corner_hop(
                ps_g, v_dst, lat["feats"], kf, bf, kd, ko, bo, lns, lnb,
                nd0[:h], nd0[h:], nb0, nd1, nb1, nlns, nlnb,
                mean=self.aggr == "mean", mode=hop_mode,
            )
        w_f = nn.Dense(h, name="w_f")
        pd = nn.Dense(h, use_bias=False, name="w_d")(v_dst)
        out_d = nn.Dense(h, name="out")
        ln = nn.LayerNorm(name="ln")

        def tail(z):
            return ln(out_d(nn.silu(z)))

        if self.kind == "nearest":
            pf = w_f(lat["feats"])[None]
            pre = pf + ps + sep_take_mm(pd, lat["ar"], lat["ac"])
            agg = sep_aggregate(tail(pre), lat["ar"], lat["ac"])
            if self.aggr == "mean":
                agg = agg / jnp.maximum(lat["count"][None], 1.0)
        else:
            pf = w_f(lat["feats"])  # (4, fh, fw, h)
            ar, ac = lat["ar"], lat["ac"]
            # pack the 4 corner hops into one leading dim: ONE dense+LN
            # pass over a (4, B, fh, fw, h) tensor instead of 4
            # sequential passes (4x-taller matmuls for the MXU)
            ps_g = jnp.stack(
                [sep_take_mm(ps, ar[k // 2], ac[k % 2]) for k in range(4)],
                axis=0,
            )
            agg = tail(pf[:, None] + ps_g + pd[None]).sum(axis=0)
            if self.aggr == "mean":
                agg = agg / 4.0
        v_new = MLP(
            self.hidden_dim, self.hidden_dim, self.hidden_layers, name="node"
        )(jnp.concatenate([v_dst, agg], axis=-1))
        return v_dst + v_new


class _FlatProcessorStep(nn.Module):
    """One scanned processor layer on the flat mesh graph. Scanning over
    stacked per-layer params compiles ONE layer body regardless of
    ``processor_layers`` — the big XLA compile-time lever."""

    hidden_dim: int
    hidden_layers: int
    aggr: str

    @nn.compact
    def __call__(self, carry, _):
        v, e, edges = carry
        v, e = InteractionNetwork(
            self.hidden_dim, self.hidden_layers, self.aggr, name="block"
        )(v, v, e, edges)
        return (v, e, edges), None


class _HiLAMSweepStep(nn.Module):
    """One scanned HiLAM processor layer: sweep up the hierarchy then back
    down, updating inter-level and intra-level edges at each stop."""

    hidden_dim: int
    hidden_layers: int
    aggr: str
    level_sizes: Tuple[int, ...]
    down_ks: Tuple = ()  # static regular-K per down edge set (or None)

    @nn.compact
    def __call__(self, carry, _):
        mesh_v, intra_e, up_e, down_e, garr = carry
        mesh_v, intra_e, up_e, down_e = (
            list(mesh_v), list(intra_e), list(up_e), list(down_e)
        )
        L = len(self.level_sizes)

        def inet(name):
            return InteractionNetwork(
                self.hidden_dim, self.hidden_layers, self.aggr, name=name
            )

        for l in range(L - 1):  # sweep up
            mesh_v[l + 1], up_e[l] = inet(f"up_{l}")(
                mesh_v[l], mesh_v[l + 1], up_e[l], _edge_dict(garr, f"up_{l}")
            )
            mesh_v[l + 1], intra_e[l + 1] = inet(f"intra_up_{l + 1}")(
                mesh_v[l + 1], mesh_v[l + 1], intra_e[l + 1],
                _edge_dict(garr, f"intra_{l + 1}"),
            )
        for l in reversed(range(L - 1)):  # sweep down
            mesh_v[l], down_e[l] = inet(f"down_{l}")(
                mesh_v[l + 1], mesh_v[l], down_e[l], _edge_dict(garr, f"down_{l}"),
                regular_k=self.down_ks[l] if l < len(self.down_ks) else None,
            )
            mesh_v[l], intra_e[l] = inet(f"intra_down_{l}")(
                mesh_v[l], mesh_v[l], intra_e[l], _edge_dict(garr, f"intra_{l}")
            )
        return (tuple(mesh_v), tuple(intra_e), tuple(up_e), tuple(down_e),
                garr), None


class _LatticeUnionBlock(nn.Module):
    """The multimesh union interaction ("block": one shared edge MLP +
    one node update) on lattice form: each mesh level is a dilated
    stencil on a level-0 sub-lattice; per-level aggregates are scattered
    back into the level-0 lattice with selection matmuls."""

    hidden_dim: int
    hidden_layers: int = 1
    aggr: str = "sum"

    @nn.compact
    def __call__(self, v0, e_levels, lat: dict):
        from py4cast_tpu.ops.lattice_ops import sep_aggregate, sep_take_mm

        msg = _StencilMessage(
            self.hidden_dim, self.hidden_layers, "sum", name="edge",
            residual=True,
        )
        agg_total = jnp.zeros_like(v0)
        new_e = []
        for lev, e in enumerate(e_levels):
            full = e.shape[2:4] == v0.shape[1:3]
            v_l = v0 if full else sep_take_mm(
                v0, lat[f"lat_multi_{lev}_sr"], lat[f"lat_multi_{lev}_sc"]
            )
            e_new, agg = msg(v_l, e, lat[f"lat_multi_{lev}_mask"])
            new_e.append(e_new)
            if not full:
                agg = sep_aggregate(
                    agg, lat[f"lat_multi_{lev}_sr"], lat[f"lat_multi_{lev}_sc"]
                )
            agg_total = agg_total + agg
        if self.aggr == "mean":
            agg_total = agg_total / jnp.maximum(lat["lat_multi_count"][None], 1.0)
        v_new = MLP(
            self.hidden_dim, self.hidden_dim, self.hidden_layers, name="node"
        )(jnp.concatenate([v0, agg_total], axis=-1))
        return v0 + v_new, tuple(new_e)


class _LatticeFlatStep(nn.Module):
    """One scanned multimesh processor layer on the lattice (GraphLAM)."""

    hidden_dim: int
    hidden_layers: int
    aggr: str

    @nn.compact
    def __call__(self, carry, _):
        v0, e_levels, lat = carry
        v0, e_levels = _LatticeUnionBlock(
            self.hidden_dim, self.hidden_layers, self.aggr, name="block"
        )(v0, e_levels, lat)
        return (v0, e_levels, lat), None


class _LatticeHiLAMSweepStep(nn.Module):
    """One scanned HiLAM processor layer on the lattice: sweep up, then
    down, exactly mirroring _HiLAMSweepStep's interaction order/names."""

    hidden_dim: int
    hidden_layers: int
    aggr: str
    num_levels: int

    @nn.compact
    def __call__(self, carry, _):
        mesh_v, intra_e, up_e, down_e, lat = carry
        mesh_v, intra_e, up_e, down_e = (
            list(mesh_v), list(intra_e), list(up_e), list(down_e)
        )
        L = self.num_levels

        def lin(kind, name):
            return LatticeInteractionNetwork(
                self.hidden_dim, self.hidden_layers, self.aggr,
                kind=kind, name=name,
            )

        for l in range(L - 1):  # sweep up
            mesh_v[l + 1], up_e[l] = lin("nearest", f"up_{l}")(
                mesh_v[l], mesh_v[l + 1], up_e[l], _lat_dict(lat, f"up_{l}")
            )
            mesh_v[l + 1], intra_e[l + 1] = lin("stencil", f"intra_up_{l + 1}")(
                mesh_v[l + 1], mesh_v[l + 1], intra_e[l + 1],
                _lat_dict(lat, f"intra_{l + 1}"),
            )
        for l in reversed(range(L - 1)):  # sweep down
            mesh_v[l], down_e[l] = lin("down", f"down_{l}")(
                mesh_v[l + 1], mesh_v[l], down_e[l],
                _lat_dict(lat, f"down_{l}"),
            )
            mesh_v[l], intra_e[l] = lin("stencil", f"intra_down_{l}")(
                mesh_v[l], mesh_v[l], intra_e[l], _lat_dict(lat, f"intra_{l}")
            )
        return (tuple(mesh_v), tuple(intra_e), tuple(up_e), tuple(down_e),
                lat), None


class _LatticeHiLAMParallelStep(nn.Module):
    """One scanned HiLAMParallel processor layer on the lattice: all edge
    sets message simultaneously, one node update per level — mirroring
    _HiLAMParallelStep's module names."""

    hidden_dim: int
    hidden_layers: int
    aggr: str
    num_levels: int

    @nn.compact
    def __call__(self, carry, _):
        mesh_v, intra_e, up_e, down_e, lat = carry
        L = self.num_levels
        aggs = [None] * L

        def accumulate(l, agg):
            aggs[l] = agg if aggs[l] is None else aggs[l] + agg

        new_intra, new_up, new_down = [], [], []
        for l in range(L):
            d = _lat_dict(lat, f"intra_{l}")
            e_new, agg = _StencilMessage(
                self.hidden_dim, self.hidden_layers, self.aggr,
                name=f"intra_{l}", residual=True,
            )(mesh_v[l], intra_e[l], d["mask"], d.get("count"))
            new_intra.append(e_new)
            accumulate(l, agg)
        for l in range(L - 1):
            e_new, agg = _NearestMessage(
                self.hidden_dim, self.hidden_layers, self.aggr,
                name=f"up_{l}",
            )(mesh_v[l], mesh_v[l + 1], up_e[l], _lat_dict(lat, f"up_{l}"))
            new_up.append(up_e[l] + e_new)
            accumulate(l + 1, agg)
            e_new, agg = _ReverseNearestMessage(
                self.hidden_dim, self.hidden_layers, self.aggr,
                name=f"down_{l}",
            )(mesh_v[l + 1], mesh_v[l], down_e[l], _lat_dict(lat, f"down_{l}"))
            new_down.append(down_e[l] + e_new)
            accumulate(l, agg)

        new_v = tuple(
            mesh_v[l]
            + MLP(self.hidden_dim, self.hidden_dim, self.hidden_layers,
                  name=f"node_{l}")(
                jnp.concatenate([mesh_v[l], aggs[l]], axis=-1)
            )
            for l in range(L)
        )
        return (new_v, tuple(new_intra), tuple(new_up), tuple(new_down),
                lat), None


def _scan_layers(step_kls, num_layers: int, name: str, **kwargs):
    """nn.scan over stacked per-layer params: one compiled body.

    The body is rematerialized (scan-over-remat): the backward pass
    recomputes each layer's interior from its carry instead of saving
    every intermediate. Device traces show the save path dominated the
    step — per-layer residual stacks plus the VMEM-prefetch copies XLA
    schedules for them cost ~6x the layer's own compute (HiLAM 500x500:
    14 ms of a 24 ms train step in the two processor whiles, against a
    2.3 ms total forward). Recomputing is ~1 extra forward (~1 ms).
    ``prevent_cse=False`` is safe (and required for efficiency) under
    scan, per jax.checkpoint docs."""
    return nn.scan(
        nn.remat(step_kls, prevent_cse=False),
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=num_layers,
    )(name=name, **kwargs)


class _GraphModelBase(ModelBase):
    """Shared embed → g2m → process → m2g → decode skeleton.

    Static graph arrays are NOT module state: ``graph_arrays`` builds a
    name→numpy dict once, the training layer device_puts it, and
    ``__call__`` receives it as an explicit argument — so XLA sees jit
    parameters, never million-element literal constants, and params can
    be initialized against a tiny surrogate graph (param shapes depend
    only on feature dims).
    """

    graph: Optional[GraphArtifacts] = None

    settings_kls = GraphModelSettings
    model_type = ModelType.GRAPH
    supported_num_spatial_dims = (1,)
    register = False

    @classmethod
    def build_graph(cls, settings, meshgrid) -> GraphArtifacts:
        return build_graph_artifacts(np.asarray(meshgrid), settings)

    @staticmethod
    def graph_arrays(g: GraphArtifacts) -> dict:
        """All static graph data as a flat name→numpy dict, including the
        padded inverse-index tables that make message passing scatter-free
        (py4cast_tpu.ops.graph_ops). Cached on the artifact."""
        if getattr(g, "_arrays_cache", None) is not None:
            return g._arrays_cache
        from py4cast_tpu.ops.graph_ops import build_table

        d = {}
        for l, p in enumerate(g.mesh_pos):
            d[f"mesh_pos_{l}"] = p

        regular: dict = {}

        def add(prefix, src, dst, feats, n_src, n_dst):
            d[f"{prefix}_src"] = src
            d[f"{prefix}_dst"] = dst
            d[f"{prefix}_feats"] = feats
            d[f"{prefix}_src_table"] = build_table(src, n_src)
            dst_table = build_table(dst, n_dst)
            d[f"{prefix}_dst_table"] = dst_table
            counts = np.bincount(dst, minlength=n_dst)
            d[f"{prefix}_dst_count"] = counts.astype(np.float32)
            # regular = exactly K contiguous edges per destination, in order
            k = int(counts[0]) if len(counts) else 0
            if (
                k > 0
                and (counts == k).all()
                and np.array_equal(
                    dst_table, np.arange(n_dst * k).reshape(n_dst, k)
                )
            ):
                regular[prefix] = k

        n0 = g.level_sizes[0]
        add("g2m", g.g2m.src, g.g2m.dst, g.g2m.feats, g.n_grid, n0)
        add("m2g", g.m2g.src, g.m2g.dst, g.m2g.feats, n0, g.n_grid)
        for l, es in enumerate(g.intra):
            n = g.level_sizes[l]
            add(f"intra_{l}", es.src, es.dst, es.feats, n, n)
        for l, es in enumerate(g.up):
            add(f"up_{l}", es.src, es.dst, es.feats,
                g.level_sizes[l], g.level_sizes[l + 1])
        for l, es in enumerate(g.down):
            add(f"down_{l}", es.src, es.dst, es.feats,
                g.level_sizes[l + 1], g.level_sizes[l])

        # nested multimesh over the level-0 node set (GraphLAM)
        n0 = g.level_sizes[0]
        add("multi", g.multi.src, g.multi.dst, g.multi.feats, n0, n0)
        if g.lattice:
            d.update(g.lattice_np)
        g._regular_k = regular
        g._arrays_cache = d
        return d

    def _reg_k(self, prefix: str):
        """Static regular-degree K for an edge set, or None."""
        self.graph_arrays(self.graph)  # ensure computed (cached)
        return getattr(self.graph, "_regular_k", {}).get(prefix)

    def _garr(self, graph_arrays, dtype=None):
        """Materialize graph arrays (from the explicit argument or
        self.graph) and cast float entries to the compute dtype — the
        GNN step is HBM-bound, so fp32 edge features/counts would double
        the traffic of every edge op under the bf16 policy."""
        if graph_arrays is None:
            graph_arrays = {
                k: jnp.asarray(v) for k, v in self.graph_arrays(self.graph).items()
            }
        if dtype is not None:
            graph_arrays = {
                k: v.astype(dtype) if jnp.issubdtype(v.dtype, jnp.floating) else v
                for k, v in graph_arrays.items()
            }
        return graph_arrays

    # ---- shared pieces (called inside subclasses' @nn.compact __call__)
    def _embed(self, x, garr, num_levels: Optional[int] = None):
        g = self.graph
        s = self.settings
        h = s.hidden_dims
        b = x.shape[0]
        if num_levels is None:
            num_levels = len(g.mesh_pos)
        grid_v = MLP(h, h, s.hidden_layers, name="grid_embed")(x)
        mesh_v = [
            jnp.broadcast_to(
                MLP(h, h, s.hidden_layers, name=f"mesh_embed_{l}")(
                    garr[f"mesh_pos_{l}"]
                )[None],
                (b, g.level_sizes[l], h),
            )
            for l in range(num_levels)
        ]
        return grid_v, mesh_v

    def _edge_emb(self, garr, key: str, b: int, name: str):
        s = self.settings
        e = MLP(s.hidden_dims, s.hidden_dims, s.hidden_layers, name=name)(
            garr[key]
        )
        return jnp.broadcast_to(e[None], (b,) + e.shape)

    def _g2m(self, garr, grid_v, mesh_v0):
        s = self.settings
        return EncodeDecodeInteraction(
            s.hidden_dims, s.hidden_layers, s.mesh_aggr, name="g2m"
        )(grid_v, mesh_v0, garr["g2m_feats"], _edge_dict(garr, "g2m"))

    def _m2g(self, garr, mesh_v0, grid_v):
        s = self.settings
        return EncodeDecodeInteraction(
            s.hidden_dims, s.hidden_layers, s.mesh_aggr, name="m2g"
        )(mesh_v0, grid_v, garr["m2g_feats"], _edge_dict(garr, "m2g"),
          regular_k=self._reg_k("m2g"))

    def _decode(self, grid_v):
        s = self.settings
        return MLP(
            self.num_output_features, s.hidden_dims, s.hidden_layers,
            layer_norm=False, name="decoder",
        )(grid_v)

    #: set True by models whose lattice path needs a dedup-free multimesh
    _lattice_need_multi = False

    @property
    def spatial_shardable(self) -> bool:
        """GNN spatial sharding rides the lattice path: stencils shard
        like convolutions (halo exchange on the lat dim), separable
        aggregations reduce over the sharded axis with an XLA psum, and
        the (small) mesh-level tensors stay replicated. The gather-table
        path cannot shard — million-row gathers across device boundaries
        would serialize on all-to-alls."""
        return self._lattice_on(need_multi=self._lattice_need_multi)

    # ---- lattice fast path (dense stencil/separable form of the above)
    def _lattice_on(self, need_multi: bool = False) -> bool:
        g = self.graph
        ok = (
            g is not None
            and getattr(g, "lattice", False)
            and getattr(self.settings, "use_lattice", True)
        )
        if need_multi:
            ok = ok and getattr(g, "multi_lattice_ok", False)
        return ok

    def _lattice_embed(self, x, garr, num_levels: Optional[int] = None):
        """grid/mesh embeds on lattice-shaped tensors — same param names
        and weights as _embed, outputs (B, H, W, h) lattices."""
        g, s = self.graph, self.settings
        h = s.hidden_dims
        b = x.shape[0]
        gh, gw = g.grid_hw
        if num_levels is None:
            num_levels = len(g.mesh_pos)
        x_lat = x.reshape(b, gh, gw, x.shape[-1])
        grid_v = MLP(h, h, s.hidden_layers, name="grid_embed")(x_lat)
        mesh_v = []
        for l in range(num_levels):
            lh, lw = g.level_hw[l]
            emb = MLP(h, h, s.hidden_layers, name=f"mesh_embed_{l}")(
                garr[f"mesh_pos_{l}"].reshape(lh, lw, 2)
            )
            mesh_v.append(jnp.broadcast_to(emb[None], (b, lh, lw, h)))
        return grid_v, mesh_v

    def _lattice_edge_emb(self, garr, key: str, b: int, name: str):
        s = self.settings
        e = MLP(s.hidden_dims, s.hidden_dims, s.hidden_layers, name=name)(
            garr[key]
        )
        return jnp.broadcast_to(e[None], (b,) + e.shape)

    @staticmethod
    def _hop_kls():
        """The encode/decode hop module, optionally rematerialized.

        P4T_REMAT_HOPS=1 wraps the hop in nn.remat: the hops sit OUTSIDE
        the (already remat'd) processor scan, and the HLO byte ranking
        shows their LayerNorm/silu residuals are the largest buffers of
        a GNN step (dozens of f32 grid-sized (4, B, H, W, h) saves for
        the m2g corners — bin/hlo_breakdown.py). Recomputing the hop
        tail in backward trades those saves for one extra read of the
        (bf16) node states. Param trees are unchanged (remat is
        transparent to naming)."""
        import os

        if os.environ.get("P4T_REMAT_HOPS") == "1":
            return nn.remat(LatticeEncodeDecode, prevent_cse=False)
        return LatticeEncodeDecode

    def _lattice_g2m(self, garr, grid_v, mesh_v0):
        s = self.settings
        return self._hop_kls()(
            s.hidden_dims, s.hidden_layers, s.mesh_aggr, kind="nearest",
            name="g2m",
        )(grid_v, mesh_v0, _lat_dict(garr, "g2m"))

    def _lattice_m2g(self, garr, mesh_v0, grid_v):
        s = self.settings
        return self._hop_kls()(
            s.hidden_dims, s.hidden_layers, s.mesh_aggr, kind="corners",
            name="m2g",
        )(mesh_v0, grid_v, _lat_dict(garr, "m2g"))

    def _lattice_decode(self, grid_v):
        """Decode and flatten back to the (B, n_grid, F) GRAPH contract."""
        b = grid_v.shape[0]
        out = self._decode(grid_v)
        return out.reshape(b, self.graph.n_grid, out.shape[-1])

    @staticmethod
    def _lat_subset(garr: dict) -> dict:
        """Only the lat_* arrays — the scan carry must not thread the
        (much larger) gather tables through the loop."""
        return {k: v for k, v in garr.items() if k.startswith("lat_")}

    def _multimesh_process(self, garr, grid_v, mesh_v0):
        """g2m → scanned multimesh processor → m2g (GraphLAM core): ONE
        node set (mesh level 0) carrying the union of all levels'
        edges — the GraphCast multi-mesh, nested by construction."""
        s = self.settings
        b = grid_v.shape[0]
        v0 = self._g2m(garr, grid_v, mesh_v0)
        e = MLP(s.hidden_dims, s.hidden_dims, s.hidden_layers,
                name="mesh_edge_embed")(garr["multi_feats"])
        e = jnp.broadcast_to(e[None], (b,) + e.shape)
        proc = _scan_layers(
            _FlatProcessorStep, s.processor_layers, "processor",
            hidden_dim=s.hidden_dims, hidden_layers=s.hidden_layers,
            aggr=s.mesh_aggr,
        )
        (v0, e, _), _ = proc((v0, e, _edge_dict(garr, "multi")), None)
        grid_out = self._m2g(garr, v0, grid_v)
        return self._decode(grid_out)


class GraphLAM(_GraphModelBase):
    """Multiscale GNN on a GraphCast-style nested multi-mesh: a single
    mesh node set (level 0) whose edge set is the union of 8-neighbor
    edges at every coarsening scale (neural-lam 'GraphLAM')."""

    settings: GraphModelSettings = GraphModelSettings()
    graph: Optional[GraphArtifacts] = None
    register = True
    _lattice_need_multi = True

    @nn.compact
    def __call__(self, x, graph_arrays=None, deterministic: bool = True):
        garr = self._garr(graph_arrays, dtype=x.dtype)
        if self._lattice_on(need_multi=self._lattice_need_multi):
            return self._lattice_forward(garr, x)
        grid_v, mesh_v = self._embed(x, garr, num_levels=1)
        return self._multimesh_process(garr, grid_v, mesh_v[0])

    def _lattice_forward(self, garr, x):
        g, s = self.graph, self.settings
        b = x.shape[0]
        grid_v, mesh_v = self._lattice_embed(x, garr, num_levels=1)
        v0 = self._lattice_g2m(garr, grid_v, mesh_v[0])
        edge_mlp = MLP(s.hidden_dims, s.hidden_dims, s.hidden_layers,
                       name="mesh_edge_embed")
        e_levels = tuple(
            jnp.broadcast_to(
                edge_mlp(garr[f"lat_multi_{l}_feats"])[None],
                (b,) + garr[f"lat_multi_{l}_feats"].shape[:-1]
                + (s.hidden_dims,),
            )
            for l in range(len(g.level_hw))
        )
        proc = _scan_layers(
            _LatticeFlatStep, s.processor_layers, "processor",
            hidden_dim=s.hidden_dims, hidden_layers=s.hidden_layers,
            aggr=s.mesh_aggr,
        )
        (v0, _, _), _ = proc((v0, e_levels, self._lat_subset(garr)), None)
        grid_out = self._lattice_m2g(garr, v0, grid_v)
        return self._lattice_decode(grid_out)


class HiLAM(_GraphModelBase):
    """Hierarchical GNN: per processor layer, sweep up the mesh hierarchy,
    process intra-level at each stop, sweep down (Oskarsson et al. 2023).
    Processor layers are scanned (stacked params, one compiled body)."""

    settings: GraphModelSettings = GraphModelSettings()
    graph: Optional[GraphArtifacts] = None
    register = True

    @nn.compact
    def __call__(self, x, graph_arrays=None, deterministic: bool = True):
        garr = self._garr(graph_arrays, dtype=x.dtype)
        g, s = self.graph, self.settings
        b = x.shape[0]
        if self._lattice_on(need_multi=self._lattice_need_multi):
            return self._lattice_forward(garr, x)
        grid_v, mesh_v = self._embed(x, garr)
        mesh_v[0] = self._g2m(garr, grid_v, mesh_v[0])

        L = len(g.mesh_pos)
        intra_e = tuple(
            self._edge_emb(garr, f"intra_{l}_feats", b, f"intra_edge_embed_{l}")
            for l in range(L)
        )
        up_e = tuple(
            self._edge_emb(garr, f"up_{l}_feats", b, f"up_edge_embed_{l}")
            for l in range(L - 1)
        )
        down_e = tuple(
            self._edge_emb(garr, f"down_{l}_feats", b, f"down_edge_embed_{l}")
            for l in range(L - 1)
        )

        proc = _scan_layers(
            _HiLAMSweepStep, s.processor_layers, "processor",
            hidden_dim=s.hidden_dims, hidden_layers=s.hidden_layers,
            aggr=s.mesh_aggr, level_sizes=tuple(g.level_sizes),
            down_ks=tuple(self._reg_k(f"down_{l}") for l in range(L - 1)),
        )
        (mesh_v_t, _, _, _, _), _ = proc(
            (tuple(mesh_v), intra_e, up_e, down_e, garr), None
        )
        grid_out = self._m2g(garr, mesh_v_t[0], grid_v)
        return self._decode(grid_out)

    def _lattice_forward(self, garr, x):
        g, s = self.graph, self.settings
        b = x.shape[0]
        grid_v, mesh_v = self._lattice_embed(x, garr)
        mesh_v[0] = self._lattice_g2m(garr, grid_v, mesh_v[0])

        L = len(g.mesh_pos)
        intra_e = tuple(
            self._lattice_edge_emb(
                garr, f"lat_intra_{l}_feats", b, f"intra_edge_embed_{l}"
            )
            for l in range(L)
        )
        up_e = tuple(
            self._lattice_edge_emb(
                garr, f"lat_up_{l}_feats", b, f"up_edge_embed_{l}"
            )
            for l in range(L - 1)
        )
        down_e = tuple(
            self._lattice_edge_emb(
                garr, f"lat_down_{l}_feats", b, f"down_edge_embed_{l}"
            )
            for l in range(L - 1)
        )
        proc = _scan_layers(
            _LatticeHiLAMSweepStep, s.processor_layers, "processor",
            hidden_dim=s.hidden_dims, hidden_layers=s.hidden_layers,
            aggr=s.mesh_aggr, num_levels=L,
        )
        (mesh_v_t, _, _, _, _), _ = proc(
            (tuple(mesh_v), intra_e, up_e, down_e, self._lat_subset(garr)),
            None,
        )
        grid_out = self._lattice_m2g(garr, mesh_v_t[0], grid_v)
        return self._lattice_decode(grid_out)


class _HiLAMParallelStep(nn.Module):
    """One scanned HiLAMParallel processor layer: ALL hierarchy edge sets
    (intra at every level, up, down) compute messages simultaneously from
    the current node states through SEPARATE interaction networks, then
    each level's nodes are updated ONCE with the sum of their incoming
    aggregates — no sequential sweep (contrast _HiLAMSweepStep)."""

    hidden_dim: int
    hidden_layers: int
    aggr: str
    level_sizes: Tuple[int, ...]
    down_ks: Tuple = ()

    @nn.compact
    def __call__(self, carry, _):
        mesh_v, intra_e, up_e, down_e, garr = carry
        L = len(self.level_sizes)

        def emsg(name):
            return EdgeMessage(
                self.hidden_dim, self.hidden_layers, self.aggr, name=name
            )

        aggs = [None] * L

        def accumulate(l, agg):
            aggs[l] = agg if aggs[l] is None else aggs[l] + agg

        new_intra, new_up, new_down = [], [], []
        for l in range(L):
            e_new, agg = emsg(f"intra_{l}")(
                mesh_v[l], mesh_v[l], intra_e[l], _edge_dict(garr, f"intra_{l}")
            )
            new_intra.append(intra_e[l] + e_new)
            accumulate(l, agg)
        for l in range(L - 1):
            e_new, agg = emsg(f"up_{l}")(
                mesh_v[l], mesh_v[l + 1], up_e[l], _edge_dict(garr, f"up_{l}")
            )
            new_up.append(up_e[l] + e_new)
            accumulate(l + 1, agg)
            e_new, agg = emsg(f"down_{l}")(
                mesh_v[l + 1], mesh_v[l], down_e[l],
                _edge_dict(garr, f"down_{l}"),
                regular_k=self.down_ks[l] if l < len(self.down_ks) else None,
            )
            new_down.append(down_e[l] + e_new)
            accumulate(l, agg)

        new_v = tuple(
            mesh_v[l]
            + MLP(self.hidden_dim, self.hidden_dim, self.hidden_layers,
                  name=f"node_{l}")(
                jnp.concatenate([mesh_v[l], aggs[l]], axis=-1)
            )
            for l in range(L)
        )
        return (new_v, tuple(new_intra), tuple(new_up), tuple(new_down),
                garr), None


class HiLAMParallel(_GraphModelBase):
    """HiLAM variant where each processor layer runs every hierarchy edge
    set (intra per level + up + down) in PARALLEL with separate
    interaction networks and a single node update per level — vs HiLAM's
    sequential up-then-down sweep (reference surface:
    config/CLI/model/hilamparallel.yaml, SURVEY §2.2)."""

    settings: GraphModelSettings = GraphModelSettings()
    graph: Optional[GraphArtifacts] = None
    register = True

    @nn.compact
    def __call__(self, x, graph_arrays=None, deterministic: bool = True):
        garr = self._garr(graph_arrays, dtype=x.dtype)
        g, s = self.graph, self.settings
        b = x.shape[0]
        if self._lattice_on(need_multi=self._lattice_need_multi):
            return self._lattice_forward(garr, x)
        grid_v, mesh_v = self._embed(x, garr)
        mesh_v[0] = self._g2m(garr, grid_v, mesh_v[0])

        L = len(g.mesh_pos)
        intra_e = tuple(
            self._edge_emb(garr, f"intra_{l}_feats", b, f"intra_edge_embed_{l}")
            for l in range(L)
        )
        up_e = tuple(
            self._edge_emb(garr, f"up_{l}_feats", b, f"up_edge_embed_{l}")
            for l in range(L - 1)
        )
        down_e = tuple(
            self._edge_emb(garr, f"down_{l}_feats", b, f"down_edge_embed_{l}")
            for l in range(L - 1)
        )

        proc = _scan_layers(
            _HiLAMParallelStep, s.processor_layers, "processor",
            hidden_dim=s.hidden_dims, hidden_layers=s.hidden_layers,
            aggr=s.mesh_aggr, level_sizes=tuple(g.level_sizes),
            down_ks=tuple(self._reg_k(f"down_{l}") for l in range(L - 1)),
        )
        (mesh_v_t, _, _, _, _), _ = proc(
            (tuple(mesh_v), intra_e, up_e, down_e, garr), None
        )
        grid_out = self._m2g(garr, mesh_v_t[0], grid_v)
        return self._decode(grid_out)

    def _lattice_forward(self, garr, x):
        g, s = self.graph, self.settings
        b = x.shape[0]
        grid_v, mesh_v = self._lattice_embed(x, garr)
        mesh_v[0] = self._lattice_g2m(garr, grid_v, mesh_v[0])

        L = len(g.mesh_pos)
        intra_e = tuple(
            self._lattice_edge_emb(
                garr, f"lat_intra_{l}_feats", b, f"intra_edge_embed_{l}"
            )
            for l in range(L)
        )
        up_e = tuple(
            self._lattice_edge_emb(
                garr, f"lat_up_{l}_feats", b, f"up_edge_embed_{l}"
            )
            for l in range(L - 1)
        )
        down_e = tuple(
            self._lattice_edge_emb(
                garr, f"lat_down_{l}_feats", b, f"down_edge_embed_{l}"
            )
            for l in range(L - 1)
        )
        proc = _scan_layers(
            _LatticeHiLAMParallelStep, s.processor_layers, "processor",
            hidden_dim=s.hidden_dims, hidden_layers=s.hidden_layers,
            aggr=s.mesh_aggr, num_levels=L,
        )
        (mesh_v_t, _, _, _, _), _ = proc(
            (tuple(mesh_v), intra_e, up_e, down_e, self._lat_subset(garr)),
            None,
        )
        grid_out = self._lattice_m2g(garr, mesh_v_t[0], grid_v)
        return self._lattice_decode(grid_out)
