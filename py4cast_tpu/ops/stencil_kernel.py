"""Fused Pallas kernel for the lattice stencil edge-message stage.

The 8-direction stencil message (``models/graph.py::_StencilMessage``)
is the HBM-traffic hot spot of the lattice GNNs: unfused, XLA
materializes three (B, 8, H, W, h) intermediates per processor layer
(projected edges, the silu pre-activation, and the LayerNorm input) and
re-reads the edge update for the masked aggregation. This kernel
computes, per VMEM tile,

    e_new = LN(silu(e @ We + be + vs + pd) @ Wout + bout)
    agg   = sum_k e_new[k] * mask[k]

with every intermediate held in VMEM — HBM sees only the true inputs
(e, vs, pd) and outputs (e_new, agg), cutting the stage's traffic
roughly in half. The backward pass is a second kernel (custom_vjp,
flash-attention style recompute): it re-derives the forward
intermediates per tile, emits de/dvs/dpd, and accumulates the weight
and LayerNorm gradients in fp32 across the sequential TPU grid.

Used by ``_StencilMessage`` when the edge MLP has no extra hidden layers
(the default and benchmarked configuration); exactness vs the unfused
path is pinned by tests/test_stencil_kernel.py (interpret mode on CPU).

Reference behavior being accelerated: neural-lam InteractionNet edge
update as used by the reference's mfai GNNs (SURVEY.md §2.2).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LN_EPS = 1e-6  # flax nn.LayerNorm default


def _pick_bh(h_rows: int) -> int:
    """Row-band height: the largest divisor ≤ 8 — the backward kernel
    holds ~6 direction-stacked (8, bh, W, h) fp32 blocks in VMEM at
    once, so keep bh modest (coarse lattice levels are 5^k-sized, hence
    the non-power-of-two candidates)."""
    for bh in (8, 6, 5, 4, 3, 2, 1):
        if h_rows % bh == 0:
            return bh
    return 1


# ------------------------------------------------------------------ forward
def _fwd_kernel(e_ref, vs_ref, pd_ref, mask_ref,
                we_ref, be_ref, wo_ref, bo_ref, lns_ref, lnb_ref,
                enew_ref, agg_ref, *, residual=False):
    f_in = e_ref.shape[-1]
    h = we_ref.shape[-1]
    pd = pd_ref[0].astype(jnp.float32)  # (bh, W, h)
    we = we_ref[...].astype(jnp.float32)
    wo = wo_ref[...].astype(jnp.float32)
    be = be_ref[...].astype(jnp.float32)
    bo = bo_ref[...].astype(jnp.float32)
    lns = lns_ref[...].astype(jnp.float32)
    lnb = lnb_ref[...].astype(jnp.float32)

    acc = jnp.zeros(pd.shape, jnp.float32)
    for k in range(8):
        e_k = e_ref[0, k].astype(jnp.float32)  # (bh, W, h)
        vs_k = vs_ref[0, k].astype(jnp.float32)
        pre = (
            jax.lax.dot_general(
                e_k.reshape(-1, f_in), we, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(e_k.shape[:-1] + (h,))
            + be
            + vs_k
            + pd
        )
        z = pre * jax.nn.sigmoid(pre)  # silu
        t = (
            jax.lax.dot_general(
                z.reshape(-1, h), wo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(z.shape)
            + bo
        )
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
        xhat = (t - mu) * jax.lax.rsqrt(var + LN_EPS)
        e_new = xhat * lns + lnb
        out_k = e_new + e_k if residual else e_new
        enew_ref[0, k] = out_k.astype(enew_ref.dtype)
        acc = acc + e_new * mask_ref[k].astype(jnp.float32)
    agg_ref[0] = acc.astype(agg_ref.dtype)


def _fwd_call(e, vs, pd, mask, we, be, wo, bo, lns, lnb, mode, interpret,
              residual=False):
    b, _, hr, w, f_in = e.shape
    h = we.shape[-1]
    bh = _pick_bh(hr)
    grid = (b, hr // bh)
    full = lambda *s: pl.BlockSpec(s, lambda i, j: tuple(0 for _ in s))  # noqa: E731
    row = lambda i, j: (i, 0, j, 0, 0)  # noqa: E731
    row3 = lambda i, j: (i, j, 0, 0)  # noqa: E731
    out_shapes = (
        jax.ShapeDtypeStruct((b, 8, hr, w, h), e.dtype),
        jax.ShapeDtypeStruct((b, hr, w, h), e.dtype),
    )
    if mode == 2:
        we2, be2, wo2, bo2, lns2, lnb2, msel, mbc = _pack_params(
            we, be, wo, bo, lns, lnb
        )
        return pl.pallas_call(
            functools.partial(_fwd_kernel_packed, residual=residual),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 8, bh, w, f_in), row),       # e
                pl.BlockSpec((1, 8, bh, w, h), row),          # vs
                pl.BlockSpec((1, bh, w, h), row3),            # pd
                pl.BlockSpec((8, bh, w, 1), lambda i, j: (0, j, 0, 0)),
                full(2 * f_in, 2 * h), full(2 * h),
                full(2 * h, 2 * h), full(2 * h),
                full(2 * h), full(2 * h),
                full(2 * h, 2), full(2, 2 * h),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, bh, w, h), row),          # e_new
                pl.BlockSpec((1, bh, w, h), row3),            # agg
            ],
            out_shape=out_shapes,
            interpret=interpret,
        )(e, vs, pd, mask, we2, be2, wo2, bo2, lns2, lnb2, msel, mbc)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, residual=residual),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, bh, w, f_in), row),       # e
            pl.BlockSpec((1, 8, bh, w, h), row),          # vs
            pl.BlockSpec((1, bh, w, h), row3),            # pd
            pl.BlockSpec((8, bh, w, 1), lambda i, j: (0, j, 0, 0)),  # mask
            full(f_in, h), full(h), full(h, h), full(h), full(h), full(h),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, bh, w, h), row),          # e_new
            pl.BlockSpec((1, bh, w, h), row3),            # agg
        ],
        out_shape=out_shapes,
        interpret=interpret,
    )(e, vs, pd, mask, we, be, wo, bo, lns, lnb)


# ------------------------------------------------- forward, lane-packed
# Mode 2: the mode-1 kernel ran SLOWER than XLA because h=64 channels
# fill only half of the 128 VMEM lanes (and half the MXU columns).
# This variant processes direction PAIRS (k, k+4) with their features
# concatenated to 2h lanes: elementwise chains run full-width, and the
# two per-direction (M,h)@(h,h) matmuls become ONE (M,2h)@(2h,2h)
# block-diagonal matmul — same MXU passes, twice the directions.
# Packing happens in VMEM only (lane concats/splits); HBM reads and
# writes keep the exact mode-1 layouts, so traffic is unchanged.
# LayerNorm statistics must not mix the two halves: per-half means ride
# through two tiny selector matmuls (msel: (2h,2) half-indicator/h,
# mbc: (2,2h) half-broadcast).


def _pack_params(we, be, wo, bo, lns, lnb):
    """Block-diagonal / duplicated parameter views for the packed kernel
    (tiny, built in the traced wrapper)."""
    f_in, h = we.shape
    zfh = jnp.zeros((f_in, h), we.dtype)
    zhh = jnp.zeros((h, h), wo.dtype)
    we2 = jnp.concatenate(
        [jnp.concatenate([we, zfh], 1), jnp.concatenate([zfh, we], 1)], 0
    )
    wo2 = jnp.concatenate(
        [jnp.concatenate([wo, zhh], 1), jnp.concatenate([zhh, wo], 1)], 0
    )
    dup = lambda v: jnp.concatenate([v, v], 0)  # noqa: E731
    hi = (jnp.arange(2 * h) >= h).astype(jnp.float32)
    msel = jnp.stack([1.0 - hi, hi], 1) / h  # (2h, 2) per-half mean
    mbc = jnp.stack([1.0 - hi, hi], 0)  # (2, 2h) half broadcast
    return we2, dup(be), wo2, dup(bo), dup(lns), dup(lnb), msel, mbc


def _fwd_kernel_packed(e_ref, vs_ref, pd_ref, mask_ref,
                       we2_ref, be2_ref, wo2_ref, bo2_ref,
                       lns2_ref, lnb2_ref, msel_ref, mbc_ref,
                       enew_ref, agg_ref, *, residual=False):
    f_in = e_ref.shape[-1]
    h = vs_ref.shape[-1]

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    pd = pd_ref[0].astype(jnp.float32)  # (bh, W, h)
    pd2 = jnp.concatenate([pd, pd], -1)
    we2 = we2_ref[...].astype(jnp.float32)
    wo2 = wo2_ref[...].astype(jnp.float32)
    be2 = be2_ref[...].astype(jnp.float32)
    bo2 = bo2_ref[...].astype(jnp.float32)
    lns2 = lns2_ref[...].astype(jnp.float32)
    lnb2 = lnb2_ref[...].astype(jnp.float32)
    msel = msel_ref[...]
    mbc = mbc_ref[...]

    def half_mean(x):  # (bh, W, 2h) -> per-half mean broadcast full-width
        flat = x.reshape(-1, 2 * h)
        return mm(mm(flat, msel), mbc).reshape(x.shape)

    acc2 = jnp.zeros(pd2.shape, jnp.float32)
    for kp in range(4):
        e2 = jnp.concatenate(
            [e_ref[0, kp], e_ref[0, kp + 4]], -1
        ).astype(jnp.float32)
        vs2 = jnp.concatenate(
            [vs_ref[0, kp], vs_ref[0, kp + 4]], -1
        ).astype(jnp.float32)
        pre = (
            mm(e2.reshape(-1, 2 * f_in), we2).reshape(e2.shape[:-1] + (2 * h,))
            + be2 + vs2 + pd2
        )
        z = pre * jax.nn.sigmoid(pre)
        t = mm(z.reshape(-1, 2 * h), wo2).reshape(z.shape) + bo2
        mu = half_mean(t)
        d = t - mu
        var = half_mean(d * d)
        e_new2 = d * jax.lax.rsqrt(var + LN_EPS) * lns2 + lnb2
        out2 = e_new2 + e2 if residual else e_new2
        enew_ref[0, kp] = out2[..., :h].astype(enew_ref.dtype)
        enew_ref[0, kp + 4] = out2[..., h:].astype(enew_ref.dtype)
        m2 = jnp.concatenate(
            [
                jnp.broadcast_to(mask_ref[kp], pd.shape[:-1] + (h,)),
                jnp.broadcast_to(mask_ref[kp + 4], pd.shape[:-1] + (h,)),
            ],
            -1,
        ).astype(jnp.float32)
        acc2 = acc2 + e_new2 * m2
    agg_ref[0] = (acc2[..., :h] + acc2[..., h:]).astype(agg_ref.dtype)


# ----------------------------------------------------------------- backward
def _bwd_kernel(e_ref, vs_ref, pd_ref, mask_ref,
                we_ref, wo_ref, bo_ref, lns_ref, be_ref,
                genew_ref, gagg_ref,
                de_ref, dvs_ref, dpd_ref,
                dwe_ref, dbe_ref, dwo_ref, dbo_ref, dlns_ref, dlnb_ref,
                *, residual=False):
    f_in = e_ref.shape[-1]
    h = we_ref.shape[-1]
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dwe_ref[...] = jnp.zeros_like(dwe_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)
        dlns_ref[...] = jnp.zeros_like(dlns_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)

    pd = pd_ref[0].astype(jnp.float32)
    we = we_ref[...].astype(jnp.float32)
    wo = wo_ref[...].astype(jnp.float32)
    be = be_ref[...].astype(jnp.float32)
    bo = bo_ref[...].astype(jnp.float32)
    lns = lns_ref[...].astype(jnp.float32)
    gagg = gagg_ref[0].astype(jnp.float32)

    dpd_acc = jnp.zeros(pd.shape, jnp.float32)
    dwe_acc = jnp.zeros((f_in, h), jnp.float32)
    dbe_acc = jnp.zeros((h,), jnp.float32)
    dwo_acc = jnp.zeros((h, h), jnp.float32)
    dbo_acc = jnp.zeros((h,), jnp.float32)
    dlns_acc = jnp.zeros((h,), jnp.float32)
    dlnb_acc = jnp.zeros((h,), jnp.float32)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    for k in range(8):
        e_k = e_ref[0, k].astype(jnp.float32)
        vs_k = vs_ref[0, k].astype(jnp.float32)
        # ---- recompute forward internals for this tile/direction
        pre = (
            mm(e_k.reshape(-1, f_in), we).reshape(e_k.shape[:-1] + (h,))
            + be + vs_k + pd
        )
        sig = jax.nn.sigmoid(pre)
        z = pre * sig
        t = mm(z.reshape(-1, h), wo).reshape(z.shape) + bo
        mu = jnp.mean(t, axis=-1, keepdims=True)
        var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + LN_EPS)
        xhat = (t - mu) * inv
        # ---- upstream gradient: residual edge grad + masked agg grad
        g = (
            genew_ref[0, k].astype(jnp.float32)
            + gagg * mask_ref[k].astype(jnp.float32)
        )
        # ---- LayerNorm backward
        dlns_acc = dlns_acc + jnp.sum(
            (g * xhat).reshape(-1, h), axis=0
        )
        dlnb_acc = dlnb_acc + jnp.sum(g.reshape(-1, h), axis=0)
        gx = g * lns
        dt = (
            gx
            - jnp.mean(gx, axis=-1, keepdims=True)
            - xhat * jnp.mean(gx * xhat, axis=-1, keepdims=True)
        ) * inv
        # ---- out dense backward
        dwo_acc = dwo_acc + mm(
            z.reshape(-1, h).T, dt.reshape(-1, h)
        )
        dbo_acc = dbo_acc + jnp.sum(dt.reshape(-1, h), axis=0)
        dz = mm(dt.reshape(-1, h), wo.T).reshape(dt.shape)
        # ---- silu backward
        dpre = dz * (sig * (1.0 + pre * (1.0 - sig)))
        # ---- edge dense backward + input grads
        dwe_acc = dwe_acc + mm(
            e_k.reshape(-1, f_in).T, dpre.reshape(-1, h)
        )
        dbe_acc = dbe_acc + jnp.sum(dpre.reshape(-1, h), axis=0)
        de_val = mm(
            dpre.reshape(-1, h), we.T
        ).reshape(dpre.shape[:-1] + (f_in,))
        if residual:  # direct path of out = e + e_new (f_in == h)
            de_val = de_val + genew_ref[0, k].astype(jnp.float32)
        de_ref[0, k] = de_val.astype(de_ref.dtype)
        dvs_ref[0, k] = dpre.astype(dvs_ref.dtype)
        dpd_acc = dpd_acc + dpre

    dpd_ref[0] = dpd_acc.astype(dpd_ref.dtype)
    dwe_ref[...] += dwe_acc
    dbe_ref[...] += dbe_acc
    dwo_ref[...] += dwo_acc
    dbo_ref[...] += dbo_acc
    dlns_ref[...] += dlns_acc
    dlnb_ref[...] += dlnb_acc


def _bwd_call(e, vs, pd, mask, we, be, wo, bo, lns, lnb, g_enew, g_agg,
              mode, interpret, residual=False):
    b, _, hr, w, f_in = e.shape
    h = we.shape[-1]
    bh = _pick_bh(hr)
    grid = (b, hr // bh)
    full = lambda *s: pl.BlockSpec(s, lambda i, j: tuple(0 for _ in s))  # noqa: E731
    row = lambda i, j: (i, 0, j, 0, 0)  # noqa: E731
    row3 = lambda i, j: (i, j, 0, 0)  # noqa: E731
    if mode == 2:
        we2, be2, wo2, bo2, lns2, lnb2, msel, mbc = _pack_params(
            we, be, wo, bo, lns, lnb
        )
        out_shapes = (
            jax.ShapeDtypeStruct(e.shape, e.dtype),           # de
            jax.ShapeDtypeStruct((b, 8, hr, w, h), e.dtype),  # dvs
            jax.ShapeDtypeStruct(pd.shape, pd.dtype),         # dpd
            jax.ShapeDtypeStruct((2 * f_in, 2 * h), jnp.float32),
            jax.ShapeDtypeStruct((2 * h,), jnp.float32),
            jax.ShapeDtypeStruct((2 * h, 2 * h), jnp.float32),
            jax.ShapeDtypeStruct((2 * h,), jnp.float32),
            jax.ShapeDtypeStruct((2 * h,), jnp.float32),
            jax.ShapeDtypeStruct((2 * h,), jnp.float32),
        )
        de, dvs, dpd, dwe2, dbe2, dwo2, dbo2, dlns2, dlnb2 = pl.pallas_call(
            functools.partial(_bwd_kernel_packed, residual=residual),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 8, bh, w, f_in), row),   # e
                pl.BlockSpec((1, 8, bh, w, h), row),      # vs
                pl.BlockSpec((1, bh, w, h), row3),        # pd
                pl.BlockSpec((8, bh, w, 1), lambda i, j: (0, j, 0, 0)),
                full(2 * f_in, 2 * h), full(2 * h, 2 * h), full(2 * h),
                full(2 * h), full(2 * h),
                full(2 * h, 2), full(2, 2 * h),
                pl.BlockSpec((1, 8, bh, w, h), row),      # g_enew
                pl.BlockSpec((1, bh, w, h), row3),        # g_agg
            ],
            out_specs=[
                pl.BlockSpec((1, 8, bh, w, f_in), row),
                pl.BlockSpec((1, 8, bh, w, h), row),
                pl.BlockSpec((1, bh, w, h), row3),
                full(2 * f_in, 2 * h), full(2 * h), full(2 * h, 2 * h),
                full(2 * h), full(2 * h), full(2 * h),
            ],
            out_shape=out_shapes,
            interpret=interpret,
        )(e, vs, pd, mask, we2, wo2, bo2, lns2, be2, msel, mbc,
          g_enew, g_agg)
        # fold the packed accumulators: diagonal blocks / halves
        return (
            de, dvs, dpd,
            dwe2[:f_in, :h] + dwe2[f_in:, h:],
            dbe2[:h] + dbe2[h:],
            dwo2[:h, :h] + dwo2[h:, h:],
            dbo2[:h] + dbo2[h:],
            dlns2[:h] + dlns2[h:],
            dlnb2[:h] + dlnb2[h:],
        )
    out_shapes = (
        jax.ShapeDtypeStruct(e.shape, e.dtype),           # de
        jax.ShapeDtypeStruct((b, 8, hr, w, h), e.dtype),  # dvs
        jax.ShapeDtypeStruct(pd.shape, pd.dtype),         # dpd
        jax.ShapeDtypeStruct((f_in, h), jnp.float32),     # dWe
        jax.ShapeDtypeStruct((h,), jnp.float32),          # dbe
        jax.ShapeDtypeStruct((h, h), jnp.float32),    # dWo
        jax.ShapeDtypeStruct((h,), jnp.float32),      # dbo
        jax.ShapeDtypeStruct((h,), jnp.float32),      # dlns
        jax.ShapeDtypeStruct((h,), jnp.float32),      # dlnb
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, residual=residual),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, bh, w, f_in), row),   # e
            pl.BlockSpec((1, 8, bh, w, h), row),      # vs
            pl.BlockSpec((1, bh, w, h), row3),        # pd
            pl.BlockSpec((8, bh, w, 1), lambda i, j: (0, j, 0, 0)),
            full(f_in, h), full(h, h), full(h), full(h), full(h),
            pl.BlockSpec((1, 8, bh, w, h), row),      # g_enew
            pl.BlockSpec((1, bh, w, h), row3),        # g_agg
        ],
        out_specs=[
            pl.BlockSpec((1, 8, bh, w, f_in), row),
            pl.BlockSpec((1, 8, bh, w, h), row),
            pl.BlockSpec((1, bh, w, h), row3),
            full(f_in, h), full(h), full(h, h), full(h), full(h), full(h),
        ],
        out_shape=out_shapes,
        interpret=interpret,
    )(e, vs, pd, mask, we, wo, bo, lns, be, g_enew, g_agg)


# ---------------------------------------------- backward, lane-packed
def _bwd_kernel_packed(e_ref, vs_ref, pd_ref, mask_ref,
                       we2_ref, wo2_ref, bo2_ref, lns2_ref, be2_ref,
                       msel_ref, mbc_ref,
                       genew_ref, gagg_ref,
                       de_ref, dvs_ref, dpd_ref,
                       dwe2_ref, dbe2_ref, dwo2_ref, dbo2_ref,
                       dlns2_ref, dlnb2_ref, *, residual=False):
    """Packed recompute backward. Weight/LN grads accumulate as RAW
    (2f,2h)/(2h,) packed buffers in fp32 across the sequential grid; the
    wrapper folds the two diagonal blocks / halves together (the
    off-diagonal cross blocks of dWe2/dWo2 are computed and discarded —
    free MXU lanes, no extra passes)."""
    f_in = e_ref.shape[-1]
    h = vs_ref.shape[-1]
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dwe2_ref[...] = jnp.zeros_like(dwe2_ref)
        dbe2_ref[...] = jnp.zeros_like(dbe2_ref)
        dwo2_ref[...] = jnp.zeros_like(dwo2_ref)
        dbo2_ref[...] = jnp.zeros_like(dbo2_ref)
        dlns2_ref[...] = jnp.zeros_like(dlns2_ref)
        dlnb2_ref[...] = jnp.zeros_like(dlnb2_ref)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    pd = pd_ref[0].astype(jnp.float32)
    pd2 = jnp.concatenate([pd, pd], -1)
    we2 = we2_ref[...].astype(jnp.float32)
    wo2 = wo2_ref[...].astype(jnp.float32)
    be2 = be2_ref[...].astype(jnp.float32)
    bo2 = bo2_ref[...].astype(jnp.float32)
    lns2 = lns2_ref[...].astype(jnp.float32)
    msel = msel_ref[...]
    mbc = mbc_ref[...]
    gagg = gagg_ref[0].astype(jnp.float32)
    gagg2 = jnp.concatenate([gagg, gagg], -1)

    def half_mean(x):
        flat = x.reshape(-1, 2 * h)
        return mm(mm(flat, msel), mbc).reshape(x.shape)

    dpd2_acc = jnp.zeros(pd2.shape, jnp.float32)
    dwe2_acc = jnp.zeros((2 * f_in, 2 * h), jnp.float32)
    dbe2_acc = jnp.zeros((2 * h,), jnp.float32)
    dwo2_acc = jnp.zeros((2 * h, 2 * h), jnp.float32)
    dbo2_acc = jnp.zeros((2 * h,), jnp.float32)
    dlns2_acc = jnp.zeros((2 * h,), jnp.float32)
    dlnb2_acc = jnp.zeros((2 * h,), jnp.float32)

    for kp in range(4):
        e2 = jnp.concatenate(
            [e_ref[0, kp], e_ref[0, kp + 4]], -1
        ).astype(jnp.float32)
        vs2 = jnp.concatenate(
            [vs_ref[0, kp], vs_ref[0, kp + 4]], -1
        ).astype(jnp.float32)
        # ---- recompute forward internals (packed)
        pre = (
            mm(e2.reshape(-1, 2 * f_in), we2).reshape(e2.shape[:-1] + (2 * h,))
            + be2 + vs2 + pd2
        )
        sig = jax.nn.sigmoid(pre)
        z = pre * sig
        t = mm(z.reshape(-1, 2 * h), wo2).reshape(z.shape) + bo2
        mu = half_mean(t)
        d = t - mu
        var = half_mean(d * d)
        inv = jax.lax.rsqrt(var + LN_EPS)
        xhat = d * inv
        # ---- upstream gradient: residual edge grad + masked agg grad
        m2 = jnp.concatenate(
            [
                jnp.broadcast_to(mask_ref[kp], pd.shape[:-1] + (h,)),
                jnp.broadcast_to(mask_ref[kp + 4], pd.shape[:-1] + (h,)),
            ],
            -1,
        ).astype(jnp.float32)
        g = (
            jnp.concatenate(
                [genew_ref[0, kp], genew_ref[0, kp + 4]], -1
            ).astype(jnp.float32)
            + gagg2 * m2
        )
        # ---- LayerNorm backward (per-half statistics)
        dlns2_acc = dlns2_acc + jnp.sum((g * xhat).reshape(-1, 2 * h), axis=0)
        dlnb2_acc = dlnb2_acc + jnp.sum(g.reshape(-1, 2 * h), axis=0)
        gx = g * lns2
        dt = (gx - half_mean(gx) - xhat * half_mean(gx * xhat)) * inv
        # ---- out dense backward
        dwo2_acc = dwo2_acc + mm(z.reshape(-1, 2 * h).T, dt.reshape(-1, 2 * h))
        dbo2_acc = dbo2_acc + jnp.sum(dt.reshape(-1, 2 * h), axis=0)
        dz = mm(dt.reshape(-1, 2 * h), wo2.T).reshape(dt.shape)
        # ---- silu backward
        dpre = dz * (sig * (1.0 + pre * (1.0 - sig)))
        # ---- edge dense backward + input grads
        dwe2_acc = dwe2_acc + mm(
            e2.reshape(-1, 2 * f_in).T, dpre.reshape(-1, 2 * h)
        )
        dbe2_acc = dbe2_acc + jnp.sum(dpre.reshape(-1, 2 * h), axis=0)
        de2 = mm(dpre.reshape(-1, 2 * h), we2.T).reshape(
            dpre.shape[:-1] + (2 * f_in,)
        )
        if residual:  # direct path of out = e + e_new (f_in == h)
            de2 = de2 + jnp.concatenate(
                [genew_ref[0, kp], genew_ref[0, kp + 4]], -1
            ).astype(jnp.float32)
        de_ref[0, kp] = de2[..., :f_in].astype(de_ref.dtype)
        de_ref[0, kp + 4] = de2[..., f_in:].astype(de_ref.dtype)
        dvs_ref[0, kp] = dpre[..., :h].astype(dvs_ref.dtype)
        dvs_ref[0, kp + 4] = dpre[..., h:].astype(dvs_ref.dtype)
        dpd2_acc = dpd2_acc + dpre

    dpd_ref[0] = (dpd2_acc[..., :h] + dpd2_acc[..., h:]).astype(dpd_ref.dtype)
    dwe2_ref[...] += dwe2_acc
    dbe2_ref[...] += dbe2_acc
    dwo2_ref[...] += dwo2_acc
    dbo2_ref[...] += dbo2_acc
    dlns2_ref[...] += dlns2_acc
    dlnb2_ref[...] += dlnb2_acc


# ------------------------------------------------------------- public op
@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused(interpret, mode, residual, e, vs, pd, mask, we, be, wo, bo,
           lns, lnb):
    return _fwd_call(e, vs, pd, mask, we, be, wo, bo, lns, lnb, mode,
                     interpret, residual)


def fused_stencil_message(e, vs, pd, mask, we, be, wo, bo, lns, lnb,
                          interpret: bool = False, mode: int = 1,
                          residual: bool = False):
    """(e_new, agg) of the stencil edge-message stage, fused in VMEM.

    e, vs: (B, 8, H, W, h) — projected-source-shifted features ride in
    as ``vs`` so the kernel needs no halo logic; pd: (B, H, W, h);
    mask: (8, H, W, 1). Dense/LN params as in _StencilMessage. The
    nondiff ``interpret``/``mode``/``residual`` flags ride FIRST through
    the inner custom_vjp (keyword nondiff args misalign the vjp's
    residual packing). mode 1 = per-direction tiles; mode 2 =
    lane-packed direction pairs (same HBM layout, 2h-wide VMEM
    arithmetic). residual=True folds the edge-residual update in: the
    first output becomes ``e + e_new`` (agg still aggregates raw
    e_new); requires edge features == hidden width.
    """
    if residual and e.shape[-1] != we.shape[-1]:
        raise ValueError(
            "residual fold requires edge features == hidden width, got "
            f"{e.shape[-1]} vs {we.shape[-1]}"
        )
    return _fused(bool(interpret), int(mode), bool(residual), e, vs, pd,
                  mask, we, be, wo, bo, lns, lnb)


def _vjp_fwd(interpret, mode, residual, e, vs, pd, mask, we, be, wo, bo,
             lns, lnb):
    out = _fwd_call(e, vs, pd, mask, we, be, wo, bo, lns, lnb, mode,
                    interpret, residual)
    return out, (e, vs, pd, mask, we, be, wo, bo, lns, lnb)


def _vjp_bwd(interpret, mode, residual, res, g):
    e, vs, pd, mask, we, be, wo, bo, lns, lnb = res
    g_enew, g_agg = g
    de, dvs, dpd, dwe, dbe, dwo, dbo, dlns, dlnb = _bwd_call(
        e, vs, pd, mask, we, be, wo, bo, lns, lnb, g_enew, g_agg, mode,
        interpret, residual
    )
    return (
        de, dvs, dpd, jnp.zeros_like(mask),
        dwe.astype(we.dtype), dbe.astype(be.dtype),
        dwo.astype(wo.dtype), dbo.astype(bo.dtype),
        dlns.astype(lns.dtype), dlnb.astype(lnb.dtype),
    )


_fused.defvjp(_vjp_fwd, _vjp_bwd)


def use_fused_stencil(hidden_layers: int) -> int:
    """Fused-kernel mode: 0 (off, XLA path), 1, or 2 — opt-in via
    P4T_FUSED_STENCIL=1|2.

    Both modes are numerically exact (tests/test_stencil_kernel.py) and
    cut HLO-estimated HBM bytes ~12-20%. Mode 2 packs direction pairs
    into 2h lanes (block-diagonal matmuls, full-width elementwise) to
    lift mode 1's half-lane VMEM ceiling at h=64. Same-session serial
    measurements on v5e (HiLAM 500x500, batch 1): XLA 36.7, mode 2
    36.3, mode 1 35.9 samples/s — the kernel is at parity, and the
    model sits at ~0.9 of the HBM roofline either way, so XLA's fusion
    keeps the default.

    A "mode 3" variant (directional shifts built in-kernel from halo
    bands, so the (B, 8, H, W, h) shifted-source tensor never touched
    HBM) was built and exactness-tested in round 3 but REMOVED in
    round 4: at production mesh sizes (HiLAM 500x500 -> level-0 lattice
    125x125) its Mosaic compile never terminated (>20 min vs ~50 s for
    modes 1/2, reproduced in rounds 3 and 4, compile-helper OOM/SIGKILL
    at larger sizes), so it could not produce a step time where it
    mattered — and the hop-kernel experiment (ops/hop_kernel.py)
    already measured that pallas_call DMA-scheduling barriers eat
    byte-level savings of this magnitude. History: commit fc3ff05 and
    earlier hold the full implementation."""
    import os

    from py4cast_tpu.ops.attention import _target_platform, spatially_sharded

    mode = os.environ.get("P4T_FUSED_STENCIL", "0")
    if mode not in ("0", "1", "2"):
        # mode 3 existed through round 3; a stale export must not
        # silently measure the plain-XLA path as "fused"
        import warnings

        warnings.warn(
            f"P4T_FUSED_STENCIL={mode} is not a valid mode (3 was "
            "removed; see doc/performance.md) — falling back to XLA."
        )
    if (
        hidden_layers != 1
        or mode not in ("1", "2")
        or _target_platform() != "tpu"
        or spatially_sharded()
    ):
        return 0
    return int(mode)
