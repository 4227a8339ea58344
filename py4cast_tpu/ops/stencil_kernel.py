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
    """Row-band height: the backward kernel holds ~6 direction-stacked
    (8, bh, W, h) blocks in VMEM at once, so keep bh modest."""
    for bh in (4, 2, 1):
        if h_rows % bh == 0:
            return bh
    return 1


# ------------------------------------------------------------------ forward
def _fwd_kernel(e_ref, vs_ref, pd_ref, mask_ref,
                we_ref, be_ref, wo_ref, bo_ref, lns_ref, lnb_ref,
                enew_ref, agg_ref):
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
        enew_ref[0, k] = e_new.astype(enew_ref.dtype)
        acc = acc + e_new * mask_ref[k].astype(jnp.float32)
    agg_ref[0] = acc.astype(agg_ref.dtype)


def _fwd_call(e, vs, pd, mask, we, be, wo, bo, lns, lnb, interpret):
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
    return pl.pallas_call(
        _fwd_kernel,
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


# ----------------------------------------------------------------- backward
def _bwd_kernel(e_ref, vs_ref, pd_ref, mask_ref,
                we_ref, wo_ref, bo_ref, lns_ref, be_ref,
                genew_ref, gagg_ref,
                de_ref, dvs_ref, dpd_ref,
                dwe_ref, dbe_ref, dwo_ref, dbo_ref, dlns_ref, dlnb_ref):
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
        de_ref[0, k] = mm(
            dpre.reshape(-1, h), we.T
        ).reshape(dpre.shape[:-1] + (f_in,)).astype(de_ref.dtype)
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
              interpret):
    b, _, hr, w, f_in = e.shape
    h = we.shape[-1]
    bh = _pick_bh(hr)
    grid = (b, hr // bh)
    full = lambda *s: pl.BlockSpec(s, lambda i, j: tuple(0 for _ in s))  # noqa: E731
    row = lambda i, j: (i, 0, j, 0, 0)  # noqa: E731
    row3 = lambda i, j: (i, j, 0, 0)  # noqa: E731
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
        _bwd_kernel,
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


# ------------------------------------------------------------- public op
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused(interpret, e, vs, pd, mask, we, be, wo, bo, lns, lnb):
    return _fwd_call(e, vs, pd, mask, we, be, wo, bo, lns, lnb, interpret)


def fused_stencil_message(e, vs, pd, mask, we, be, wo, bo, lns, lnb,
                          interpret: bool = False):
    """(e_new, agg) of the stencil edge-message stage, fused in VMEM.

    e, vs: (B, 8, H, W, h) — projected-source-shifted features ride in
    as ``vs`` so the kernel needs no halo logic; pd: (B, H, W, h);
    mask: (8, H, W, 1). Dense/LN params as in _StencilMessage. The
    nondiff ``interpret`` flag rides FIRST through the inner custom_vjp
    (keyword nondiff args misalign the vjp's residual packing).
    """
    return _fused(bool(interpret), e, vs, pd, mask, we, be, wo, bo, lns, lnb)


def _vjp_fwd(interpret, e, vs, pd, mask, we, be, wo, bo, lns, lnb):
    out = _fwd_call(e, vs, pd, mask, we, be, wo, bo, lns, lnb, interpret)
    return out, (e, vs, pd, mask, we, be, wo, bo, lns, lnb)


def _vjp_bwd(interpret, res, g):
    e, vs, pd, mask, we, be, wo, bo, lns, lnb = res
    g_enew, g_agg = g
    de, dvs, dpd, dwe, dbe, dwo, dbo, dlns, dlnb = _bwd_call(
        e, vs, pd, mask, we, be, wo, bo, lns, lnb, g_enew, g_agg, interpret
    )
    return (
        de, dvs, dpd, jnp.zeros_like(mask),
        dwe.astype(we.dtype), dbe.astype(be.dtype),
        dwo.astype(wo.dtype), dbo.astype(bo.dtype),
        dlns.astype(lns.dtype), dlnb.astype(lnb.dtype),
    )


_fused.defvjp(_vjp_fwd, _vjp_bwd)


def use_fused_stencil(hidden_layers: int) -> bool:
    """Opt-in (P4T_FUSED_STENCIL=1): the fused kernel is numerically
    exact (tests/test_stencil_kernel.py) and cuts HLO-estimated HBM
    bytes ~12-20%, but MEASURED slower than the XLA path on v5e at
    h=64 (HiLAM 29.4 vs 36.9 samples/s): the 64-wide channel dim fills
    only half of the 128 VMEM lanes, and the recompute-style backward
    adds FLOPs to an already bandwidth-tight stage. Until the kernel
    packs two directions per lane row (128-wide layout), XLA's fusion
    wins — so the default stays off."""
    import os

    from py4cast_tpu.ops.attention import _target_platform

    return (
        hidden_layers == 1
        and os.environ.get("P4T_FUSED_STENCIL") == "1"
        and _target_platform() == "tpu"
    )
