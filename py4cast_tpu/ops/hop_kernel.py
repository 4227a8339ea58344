"""Fused Pallas kernel for the lattice m2g (mesh→grid) corner hop.

Device traces (bin/trace_gnn.py, HiLAM 500x500) put the m2g hop at
~5 ms of a ~17 ms train step: XLA materializes the grid-sized silu
pre-activation, the LayerNorm input and its fp32 statistics for FOUR
corner copies of the grid — ~0.8 GB of HLO-level traffic for a stage
whose true inputs and outputs are ~0.2 GB. This kernel computes, per
(row-band × column-tile) block held in VMEM,

    pd      = v_dst @ Wd                      (destination projection)
    pre_k   = feats_k @ Wf + bf + psg_k + pd   (k = 4 corners)
    t_k     = LN(silu(pre_k) @ Wo + bo)
    agg     = Σ_k t_k            (/4 for mean aggregation)
    u       = silu(v_dst @ Nd0a + agg @ Nd0b + nb0)   (node MLP, concat
    y       = LN(u @ Nd1 + nb1)                        split into 2 mms)
    v_out   = v_dst + y

so HBM sees only the four psg_k (corner-upsampled source states, built
outside by ``sep_take_mm`` selection matmuls — pass them as FOUR arrays,
never stacked: the (4, B, H, W, h) concatenate alone cost 0.7 ms), the
destination states, the static corner feats, and v_out. The backward
pass is a second kernel (custom_vjp, flash-attention-style recompute):
one corner pass caches (pre, sig, xhat, inv) per corner in VMEM, the
node MLP is differentiated, then a second short pass emits dpsg_k and
accumulates all weight/LN gradients in fp32 across the sequential grid.

Mosaic limits that shaped the blocking (all measured on v5e):
- full-width blocks beyond W=256 crash the compiler → column tiles;
- non-full W blocks must be 8-divisible → W is zero-padded to a
  256-tileable width. Build psg_k PRE-PADDED by padding the column
  selection matrix (``padded_width``) — zero columns make every pad
  contribution to outputs and gradients exactly zero;
- bh=5 × bw=256 overflowed the 16 MB scoped-vmem stack → bh=4.

Exactness vs the unfused formula is pinned by tests/test_hop_kernel.py
(interpret mode on CPU, forward and every gradient).

Reference behavior being accelerated: neural-lam mesh→grid decode hop
as used by the reference's mfai GNNs (SURVEY.md §2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LN_EPS = 1e-6  # flax nn.LayerNorm default


def _pick_bh(h_rows: int) -> int:
    """Row-band height: a small divisor (grid heights are often
    multiples of 5). The backward holds ~25 (bh, bw, h) fp32 slabs in
    VMEM — bh=5 with bw=256 overflowed the 16 MB scoped-vmem stack."""
    for bh in (4, 5, 8, 6, 3, 2, 1):
        if h_rows % bh == 0:
            return bh
    return 1


def _pick_bw(w: int):
    """Column tiling: Mosaic rejects this kernel's full-width slabs
    beyond W=256 (measured: 256 compiles, 320+ crashes the compiler),
    and non-full W blocks must be 8-divisible. Returns (w_padded, bw)."""
    if w <= 256:
        return w, w
    for bw in range(256, 7, -1):
        if w % bw == 0 and bw % 8 == 0:
            return w, bw
    wp = -(-w // 256) * 256
    return wp, 256


def padded_width(w: int) -> int:
    """The W the kernel runs at. Build psg_k at this width directly (pad
    the column selection matrix with zero columns) so no 100 MB-scale
    pad/slice ops appear in the step."""
    return _pick_bw(w)[0]


def _pad_w(x, wp, axis=-2):
    if x.shape[axis] == wp:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, wp - x.shape[axis])
    return jnp.pad(x, pad)


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _ln_fwd(t, lns, lnb):
    mu = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xhat = (t - mu) * inv
    return xhat * lns + lnb, xhat, inv


def _ln_bwd(g, xhat, inv, lns):
    """d/dt of LN given upstream g; also returns (dlns, dlnb) sums."""
    gx = g * lns
    dt = (
        gx
        - jnp.mean(gx, axis=-1, keepdims=True)
        - xhat * jnp.mean(gx * xhat, axis=-1, keepdims=True)
    ) * inv
    h = g.shape[-1]
    dlns = jnp.sum((g * xhat).reshape(-1, h), axis=0)
    dlnb = jnp.sum(g.reshape(-1, h), axis=0)
    return dt, dlns, dlnb


# ------------------------------------------------------------------ forward
def _fwd_kernel(psg0_ref, psg1_ref, psg2_ref, psg3_ref, vd_ref, feats_ref,
                wf_ref, bf_ref, wd_ref, wo_ref, bo_ref, lns_ref, lnb_ref,
                nd0a_ref, nd0b_ref, nb0_ref, nd1_ref, nb1_ref,
                nlns_ref, nlnb_ref,
                vout_ref, *, mean):
    psg_refs = (psg0_ref, psg1_ref, psg2_ref, psg3_ref)
    ff = feats_ref.shape[-1]
    h = wd_ref.shape[-1]
    vd = vd_ref[0].astype(jnp.float32)  # (bh, bw, h)
    sh = vd.shape
    wf = wf_ref[...].astype(jnp.float32)
    bf = bf_ref[...].astype(jnp.float32)
    wo = wo_ref[...].astype(jnp.float32)
    bo = bo_ref[...].astype(jnp.float32)
    lns = lns_ref[...].astype(jnp.float32)
    lnb = lnb_ref[...].astype(jnp.float32)

    pd = _mm(vd.reshape(-1, h), wd_ref[...].astype(jnp.float32)).reshape(sh)
    agg = jnp.zeros(sh, jnp.float32)
    for k in range(4):
        fe = feats_ref[k].astype(jnp.float32)
        pf = _mm(fe.reshape(-1, ff), wf).reshape(sh) + bf
        pre = pf + psg_refs[k][0].astype(jnp.float32) + pd
        z = pre * jax.nn.sigmoid(pre)
        t = _mm(z.reshape(-1, h), wo).reshape(sh) + bo
        t_ln, _, _ = _ln_fwd(t, lns, lnb)
        agg = agg + t_ln
    if mean:
        agg = agg * 0.25

    u_pre = (
        _mm(vd.reshape(-1, h), nd0a_ref[...].astype(jnp.float32))
        + _mm(agg.reshape(-1, h), nd0b_ref[...].astype(jnp.float32))
        + nb0_ref[...].astype(jnp.float32)
    )
    u = u_pre * jax.nn.sigmoid(u_pre)
    y = _mm(u, nd1_ref[...].astype(jnp.float32)) + nb1_ref[...].astype(
        jnp.float32
    )
    y_ln, _, _ = _ln_fwd(
        y.reshape(sh),
        nlns_ref[...].astype(jnp.float32),
        nlnb_ref[...].astype(jnp.float32),
    )
    vout_ref[0] = (vd + y_ln).astype(vout_ref.dtype)


# ------------------------------------------------- forward, lane-packed
# Mode 2: the mode-1 kernel ran SLOWER than XLA because h=64 channels
# fill only half of the 128 VMEM lanes (and half the MXU columns) — the
# exact failure mode the stencil kernel's mode 2 fixed. This variant
# processes corner PAIRS (2k, 2k+1) with channels concatenated to 2h
# lanes: elementwise chains run full-width and the two per-corner
# (M,h)@(h,h) matmuls become ONE (M,2h)@(2h,2h) block-diagonal matmul.
# The node MLP's first layer also collapses to a single (M,2h)@(2h,h)
# matmul on the lane-concatenated [v_dst | agg]. Packing happens in
# VMEM only; HBM reads/writes keep the mode-1 layouts, so traffic is
# unchanged. LayerNorm statistics must not mix the two halves: per-half
# means ride through two tiny selector matmuls (msel/mbc).


def _pack_hop_params(wf, bf, wo, bo, lns, lnb):
    """Block-diagonal / duplicated parameter views for the packed kernel
    (tiny, built in the traced wrapper)."""
    ff, h = wf.shape
    zfh = jnp.zeros((ff, h), wf.dtype)
    zhh = jnp.zeros((h, h), wo.dtype)
    wf2 = jnp.concatenate(
        [jnp.concatenate([wf, zfh], 1), jnp.concatenate([zfh, wf], 1)], 0
    )
    wo2 = jnp.concatenate(
        [jnp.concatenate([wo, zhh], 1), jnp.concatenate([zhh, wo], 1)], 0
    )
    dup = lambda v: jnp.concatenate([v, v], 0)  # noqa: E731
    hi = (jnp.arange(2 * h) >= h).astype(jnp.float32)
    msel = jnp.stack([1.0 - hi, hi], 1) / h  # (2h, 2) per-half mean
    mbc = jnp.stack([1.0 - hi, hi], 0)  # (2, 2h) half broadcast
    return wf2, dup(bf), wo2, dup(bo), dup(lns), dup(lnb), msel, mbc


def _fwd_kernel_packed(psg0_ref, psg1_ref, psg2_ref, psg3_ref, vd_ref,
                       feats_ref,
                       wf2_ref, bf2_ref, wd_ref, wo2_ref, bo2_ref,
                       lns2_ref, lnb2_ref, msel_ref, mbc_ref,
                       nd0_ref, nb0_ref, nd1_ref, nb1_ref,
                       nlns_ref, nlnb_ref,
                       vout_ref, *, mean):
    psg_refs = (psg0_ref, psg1_ref, psg2_ref, psg3_ref)
    ff = feats_ref.shape[-1]
    h = wd_ref.shape[-1]
    vd = vd_ref[0].astype(jnp.float32)  # (bh, bw, h)
    sh = vd.shape
    wf2 = wf2_ref[...].astype(jnp.float32)
    bf2 = bf2_ref[...].astype(jnp.float32)
    wo2 = wo2_ref[...].astype(jnp.float32)
    bo2 = bo2_ref[...].astype(jnp.float32)
    lns2 = lns2_ref[...].astype(jnp.float32)
    lnb2 = lnb2_ref[...].astype(jnp.float32)
    msel = msel_ref[...]
    mbc = mbc_ref[...]

    def half_mean(x):  # (bh, bw, 2h) -> per-half mean broadcast full-width
        flat = x.reshape(-1, 2 * h)
        return _mm(_mm(flat, msel), mbc).reshape(x.shape)

    pd = _mm(vd.reshape(-1, h), wd_ref[...].astype(jnp.float32)).reshape(sh)
    pd2 = jnp.concatenate([pd, pd], -1)
    agg = jnp.zeros(sh, jnp.float32)
    for kp in range(2):
        fe2 = jnp.concatenate(
            [feats_ref[2 * kp], feats_ref[2 * kp + 1]], -1
        ).astype(jnp.float32)
        psg2 = jnp.concatenate(
            [psg_refs[2 * kp][0], psg_refs[2 * kp + 1][0]], -1
        ).astype(jnp.float32)
        pre = (
            _mm(fe2.reshape(-1, 2 * ff), wf2).reshape(sh[:-1] + (2 * h,))
            + bf2 + psg2 + pd2
        )
        z = pre * jax.nn.sigmoid(pre)
        t = _mm(z.reshape(-1, 2 * h), wo2).reshape(z.shape) + bo2
        mu = half_mean(t)
        d = t - mu
        var = half_mean(d * d)
        t_ln = d * jax.lax.rsqrt(var + LN_EPS) * lns2 + lnb2
        agg = agg + t_ln[..., :h] + t_ln[..., h:]
    if mean:
        agg = agg * 0.25

    ca2 = jnp.concatenate([vd, agg], -1)  # (bh, bw, 2h)
    u_pre = (
        _mm(ca2.reshape(-1, 2 * h), nd0_ref[...].astype(jnp.float32))
        + nb0_ref[...].astype(jnp.float32)
    )
    u = u_pre * jax.nn.sigmoid(u_pre)
    y = _mm(u, nd1_ref[...].astype(jnp.float32)) + nb1_ref[...].astype(
        jnp.float32
    )
    y_ln, _, _ = _ln_fwd(
        y.reshape(sh),
        nlns_ref[...].astype(jnp.float32),
        nlnb_ref[...].astype(jnp.float32),
    )
    vout_ref[0] = (vd + y_ln).astype(vout_ref.dtype)


# ----------------------------------------------------------------- backward
def _bwd_kernel(psg0_ref, psg1_ref, psg2_ref, psg3_ref, vd_ref, feats_ref,
                wf_ref, wd_ref, wo_ref, bo_ref, lns_ref, lnb_ref, bf_ref,
                nd0a_ref, nd0b_ref, nb0_ref, nd1_ref, nb1_ref,
                nlns_ref, nlnb_ref,
                g_ref,
                dpsg0_ref, dpsg1_ref, dpsg2_ref, dpsg3_ref, dvd_ref,
                dwf_ref, dbf_ref, dwd_ref, dwo_ref, dbo_ref,
                dlns_ref, dlnb_ref,
                dnd0a_ref, dnd0b_ref, dnb0_ref, dnd1_ref, dnb1_ref,
                dnlns_ref, dnlnb_ref, *, mean):
    psg_refs = (psg0_ref, psg1_ref, psg2_ref, psg3_ref)
    dpsg_refs = (dpsg0_ref, dpsg1_ref, dpsg2_ref, dpsg3_ref)
    ff = feats_ref.shape[-1]
    h = wd_ref.shape[-1]
    first = (
        (pl.program_id(0) == 0)
        & (pl.program_id(1) == 0)
        & (pl.program_id(2) == 0)
    )

    @pl.when(first)
    def _init():
        for r in (dwf_ref, dbf_ref, dwd_ref, dwo_ref, dbo_ref, dlns_ref,
                  dlnb_ref, dnd0a_ref, dnd0b_ref, dnb0_ref, dnd1_ref,
                  dnb1_ref, dnlns_ref, dnlnb_ref):
            r[...] = jnp.zeros_like(r)

    vd = vd_ref[0].astype(jnp.float32)
    sh = vd.shape
    g = g_ref[0].astype(jnp.float32)
    wf = wf_ref[...].astype(jnp.float32)
    bf = bf_ref[...].astype(jnp.float32)
    wd = wd_ref[...].astype(jnp.float32)
    wo = wo_ref[...].astype(jnp.float32)
    bo = bo_ref[...].astype(jnp.float32)
    lns = lns_ref[...].astype(jnp.float32)
    lnb = lnb_ref[...].astype(jnp.float32)
    nd0a = nd0a_ref[...].astype(jnp.float32)
    nd0b = nd0b_ref[...].astype(jnp.float32)
    nb0 = nb0_ref[...].astype(jnp.float32)
    nd1 = nd1_ref[...].astype(jnp.float32)
    nb1 = nb1_ref[...].astype(jnp.float32)
    nlns = nlns_ref[...].astype(jnp.float32)
    nlnb = nlnb_ref[...].astype(jnp.float32)

    # ---- single recompute pass, caching per-corner LN internals
    pd = _mm(vd.reshape(-1, h), wd).reshape(sh)
    agg = jnp.zeros(sh, jnp.float32)
    pre_c, sig_c, xhat_c, inv_c = [], [], [], []
    for k in range(4):
        fe = feats_ref[k].astype(jnp.float32)
        pf = _mm(fe.reshape(-1, ff), wf).reshape(sh) + bf
        pre = pf + psg_refs[k][0].astype(jnp.float32) + pd
        sig = jax.nn.sigmoid(pre)
        z = pre * sig
        t = _mm(z.reshape(-1, h), wo).reshape(sh) + bo
        t_ln, xhat, inv = _ln_fwd(t, lns, lnb)
        agg = agg + t_ln
        pre_c.append(pre)
        sig_c.append(sig)
        xhat_c.append(xhat)
        inv_c.append(inv)
    if mean:
        agg = agg * 0.25
    u_pre = (
        _mm(vd.reshape(-1, h), nd0a)
        + _mm(agg.reshape(-1, h), nd0b)
        + nb0
    )
    sig_u = jax.nn.sigmoid(u_pre)
    u = u_pre * sig_u
    y = _mm(u, nd1) + nb1
    _, xhat_n, inv_n = _ln_fwd(y.reshape(sh), nlns, nlnb)

    # ---- node backward
    dy, dnlns, dnlnb = _ln_bwd(g, xhat_n, inv_n, nlns)
    dnlns_ref[...] += dnlns
    dnlnb_ref[...] += dnlnb
    dy2 = dy.reshape(-1, h)
    dnd1_ref[...] += _mm(u.T, dy2)
    dnb1_ref[...] += jnp.sum(dy2, axis=0)
    du = _mm(dy2, nd1.T)
    dupre = du * (sig_u * (1.0 + u_pre * (1.0 - sig_u)))
    dnd0a_ref[...] += _mm(vd.reshape(-1, h).T, dupre)
    dnd0b_ref[...] += _mm(agg.reshape(-1, h).T, dupre)
    dnb0_ref[...] += jnp.sum(dupre, axis=0)
    dvd = g + _mm(dupre, nd0a.T).reshape(sh)  # residual + node path
    dagg = _mm(dupre, nd0b.T).reshape(sh)
    if mean:
        dagg = dagg * 0.25

    # ---- per-corner backward from the cached internals
    dpd = jnp.zeros(sh, jnp.float32)
    for k in range(4):
        pre, sig, xhat, inv = pre_c[k], sig_c[k], xhat_c[k], inv_c[k]
        dt, dlns, dlnb = _ln_bwd(dagg, xhat, inv, lns)
        dlns_ref[...] += dlns
        dlnb_ref[...] += dlnb
        dt2 = dt.reshape(-1, h)
        dwo_ref[...] += _mm((pre * sig).reshape(-1, h).T, dt2)
        dbo_ref[...] += jnp.sum(dt2, axis=0)
        dz = _mm(dt2, wo.T).reshape(sh)
        dpre = dz * (sig * (1.0 + pre * (1.0 - sig)))
        dpsg_refs[k][0] = dpre.astype(dpsg_refs[k].dtype)
        dpd = dpd + dpre
        dpre2 = dpre.reshape(-1, h)
        fe = feats_ref[k].astype(jnp.float32)
        dwf_ref[...] += _mm(fe.reshape(-1, ff).T, dpre2)
        dbf_ref[...] += jnp.sum(dpre2, axis=0)

    dvd = dvd + _mm(dpd.reshape(-1, h), wd.T).reshape(sh)
    dwd_ref[...] += _mm(vd.reshape(-1, h).T, dpd.reshape(-1, h))
    dvd_ref[0] = dvd.astype(dvd_ref.dtype)


# ---------------------------------------------- backward, lane-packed
def _bwd_kernel_packed(psg0_ref, psg1_ref, psg2_ref, psg3_ref, vd_ref,
                       feats_ref,
                       wf2_ref, wd_ref, wo2_ref, bo2_ref,
                       lns2_ref, lnb2_ref, bf2_ref, msel_ref, mbc_ref,
                       nd0_ref, nb0_ref, nd1_ref, nb1_ref,
                       nlns_ref, nlnb_ref,
                       g_ref,
                       dpsg0_ref, dpsg1_ref, dpsg2_ref, dpsg3_ref, dvd_ref,
                       dwf2_ref, dbf2_ref, dwd_ref, dwo2_ref, dbo2_ref,
                       dlns2_ref, dlnb2_ref,
                       dnd0_ref, dnb0_ref, dnd1_ref, dnb1_ref,
                       dnlns_ref, dnlnb_ref, *, mean):
    """Packed recompute backward. Weight/LN grads accumulate as RAW
    (2F,2h)/(2h,2h)/(2h,) packed buffers in fp32 across the sequential
    grid; the wrapper folds diagonal blocks / halves (the off-diagonal
    cross blocks of dWf2/dWo2 are computed and discarded — free MXU
    lanes, no extra passes)."""
    psg_refs = (psg0_ref, psg1_ref, psg2_ref, psg3_ref)
    dpsg_refs = (dpsg0_ref, dpsg1_ref, dpsg2_ref, dpsg3_ref)
    ff = feats_ref.shape[-1]
    h = wd_ref.shape[-1]
    first = (
        (pl.program_id(0) == 0)
        & (pl.program_id(1) == 0)
        & (pl.program_id(2) == 0)
    )

    @pl.when(first)
    def _init():
        for r in (dwf2_ref, dbf2_ref, dwd_ref, dwo2_ref, dbo2_ref,
                  dlns2_ref, dlnb2_ref, dnd0_ref, dnb0_ref, dnd1_ref,
                  dnb1_ref, dnlns_ref, dnlnb_ref):
            r[...] = jnp.zeros_like(r)

    vd = vd_ref[0].astype(jnp.float32)
    sh = vd.shape
    g = g_ref[0].astype(jnp.float32)
    wf2 = wf2_ref[...].astype(jnp.float32)
    bf2 = bf2_ref[...].astype(jnp.float32)
    wd = wd_ref[...].astype(jnp.float32)
    wo2 = wo2_ref[...].astype(jnp.float32)
    bo2 = bo2_ref[...].astype(jnp.float32)
    lns2 = lns2_ref[...].astype(jnp.float32)
    lnb2 = lnb2_ref[...].astype(jnp.float32)
    msel = msel_ref[...]
    mbc = mbc_ref[...]
    nd0 = nd0_ref[...].astype(jnp.float32)
    nb0 = nb0_ref[...].astype(jnp.float32)
    nd1 = nd1_ref[...].astype(jnp.float32)
    nb1 = nb1_ref[...].astype(jnp.float32)
    nlns = nlns_ref[...].astype(jnp.float32)
    nlnb = nlnb_ref[...].astype(jnp.float32)

    def half_mean(x):
        flat = x.reshape(-1, 2 * h)
        return _mm(_mm(flat, msel), mbc).reshape(x.shape)

    # ---- single recompute pass, caching per-pair LN internals
    pd = _mm(vd.reshape(-1, h), wd).reshape(sh)
    pd2 = jnp.concatenate([pd, pd], -1)
    agg = jnp.zeros(sh, jnp.float32)
    pre_c, sig_c, xhat_c, inv_c = [], [], [], []
    for kp in range(2):
        fe2 = jnp.concatenate(
            [feats_ref[2 * kp], feats_ref[2 * kp + 1]], -1
        ).astype(jnp.float32)
        psg2 = jnp.concatenate(
            [psg_refs[2 * kp][0], psg_refs[2 * kp + 1][0]], -1
        ).astype(jnp.float32)
        pre = (
            _mm(fe2.reshape(-1, 2 * ff), wf2).reshape(sh[:-1] + (2 * h,))
            + bf2 + psg2 + pd2
        )
        sig = jax.nn.sigmoid(pre)
        z = pre * sig
        t = _mm(z.reshape(-1, 2 * h), wo2).reshape(z.shape) + bo2
        mu = half_mean(t)
        d = t - mu
        var = half_mean(d * d)
        inv = jax.lax.rsqrt(var + LN_EPS)
        xhat = d * inv
        t_ln = xhat * lns2 + lnb2
        agg = agg + t_ln[..., :h] + t_ln[..., h:]
        pre_c.append(pre)
        sig_c.append(sig)
        xhat_c.append(xhat)
        inv_c.append(inv)
    if mean:
        agg = agg * 0.25
    ca2 = jnp.concatenate([vd, agg], -1)
    u_pre = _mm(ca2.reshape(-1, 2 * h), nd0) + nb0
    sig_u = jax.nn.sigmoid(u_pre)
    u = u_pre * sig_u
    y = _mm(u, nd1) + nb1
    _, xhat_n, inv_n = _ln_fwd(y.reshape(sh), nlns, nlnb)

    # ---- node backward
    dy, dnlns, dnlnb = _ln_bwd(g, xhat_n, inv_n, nlns)
    dnlns_ref[...] += dnlns
    dnlnb_ref[...] += dnlnb
    dy2 = dy.reshape(-1, h)
    dnd1_ref[...] += _mm(u.T, dy2)
    dnb1_ref[...] += jnp.sum(dy2, axis=0)
    du = _mm(dy2, nd1.T)
    dupre = du * (sig_u * (1.0 + u_pre * (1.0 - sig_u)))
    dnd0_ref[...] += _mm(ca2.reshape(-1, 2 * h).T, dupre)
    dnb0_ref[...] += jnp.sum(dupre, axis=0)
    dca2 = _mm(dupre, nd0.T).reshape(sh[:-1] + (2 * h,))
    dvd = g + dca2[..., :h]  # residual + node path
    dagg = dca2[..., h:]
    if mean:
        dagg = dagg * 0.25
    dagg2 = jnp.concatenate([dagg, dagg], -1)

    # ---- per-pair backward from the cached internals
    dpd2 = jnp.zeros(sh[:-1] + (2 * h,), jnp.float32)
    for kp in range(2):
        pre, sig, xhat, inv = pre_c[kp], sig_c[kp], xhat_c[kp], inv_c[kp]
        # LayerNorm backward with per-half statistics
        dlns2_ref[...] += jnp.sum(
            (dagg2 * xhat).reshape(-1, 2 * h), axis=0
        )
        dlnb2_ref[...] += jnp.sum(dagg2.reshape(-1, 2 * h), axis=0)
        gx = dagg2 * lns2
        dt = (gx - half_mean(gx) - xhat * half_mean(gx * xhat)) * inv
        dt2 = dt.reshape(-1, 2 * h)
        dwo2_ref[...] += _mm((pre * sig).reshape(-1, 2 * h).T, dt2)
        dbo2_ref[...] += jnp.sum(dt2, axis=0)
        dz = _mm(dt2, wo2.T).reshape(dt.shape)
        dpre = dz * (sig * (1.0 + pre * (1.0 - sig)))
        dpsg_refs[2 * kp][0] = dpre[..., :h].astype(dpsg_refs[0].dtype)
        dpsg_refs[2 * kp + 1][0] = dpre[..., h:].astype(dpsg_refs[0].dtype)
        dpd2 = dpd2 + dpre
        dpre2 = dpre.reshape(-1, 2 * h)
        fe2 = jnp.concatenate(
            [feats_ref[2 * kp], feats_ref[2 * kp + 1]], -1
        ).astype(jnp.float32)
        dwf2_ref[...] += _mm(fe2.reshape(-1, 2 * ff).T, dpre2)
        dbf2_ref[...] += jnp.sum(dpre2, axis=0)

    dpd = dpd2[..., :h] + dpd2[..., h:]
    dvd = dvd + _mm(dpd.reshape(-1, h), wd.T).reshape(sh)
    dwd_ref[...] += _mm(vd.reshape(-1, h).T, dpd.reshape(-1, h))
    dvd_ref[0] = dvd.astype(dvd_ref.dtype)


# ------------------------------------------------------------------- driver
def _specs(bh, bw, h, ff):
    full = lambda *s: pl.BlockSpec(  # noqa: E731
        s, lambda i, j, k: tuple(0 for _ in s)
    )
    band = pl.BlockSpec((1, bh, bw, h), lambda i, j, k: (i, j, k, 0))
    featb = pl.BlockSpec((4, bh, bw, ff), lambda i, j, k: (0, j, k, 0))
    return full, band, featb


def _fwd_call(psg, vd, feats, wf, bf, wd, wo, bo, lns, lnb,
              nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb, mean, interpret,
              mode=1):
    b, hr, w, h = vd.shape
    ff = feats.shape[-1]
    bh = _pick_bh(hr)
    wp, bw = _pick_bw(w)
    psg = tuple(_pad_w(p, wp) for p in psg)  # no-op when built pre-padded
    vd_p, feats_p = _pad_w(vd, wp), _pad_w(feats, wp)
    full, band, featb = _specs(bh, bw, h, ff)
    if mode == 2:
        wf2, bf2, wo2, bo2, lns2, lnb2, msel, mbc = _pack_hop_params(
            wf, bf, wo, bo, lns, lnb
        )
        nd0 = jnp.concatenate([nd0a, nd0b], 0)  # (2h, h)
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_packed, mean=mean),
            grid=(b, hr // bh, wp // bw),
            in_specs=[
                band, band, band, band, band, featb,
                full(2 * ff, 2 * h), full(2 * h), full(h, h),
                full(2 * h, 2 * h), full(2 * h), full(2 * h), full(2 * h),
                full(2 * h, 2), full(2, 2 * h),
                full(2 * h, h), full(h), full(h, h), full(h),
                full(h), full(h),
            ],
            out_specs=band,
            out_shape=jax.ShapeDtypeStruct((b, hr, wp, h), vd.dtype),
            interpret=interpret,
        )(*psg, vd_p, feats_p, wf2, bf2, wd, wo2, bo2, lns2, lnb2,
          msel, mbc, nd0, nb0, nd1, nb1, nlns, nlnb)
        return out[:, :, :w]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, mean=mean),
        grid=(b, hr // bh, wp // bw),
        in_specs=[
            band, band, band, band, band, featb,
            full(ff, h), full(h), full(h, h), full(h, h), full(h),
            full(h), full(h),
            full(h, h), full(h, h), full(h), full(h, h), full(h),
            full(h), full(h),
        ],
        out_specs=band,
        out_shape=jax.ShapeDtypeStruct((b, hr, wp, h), vd.dtype),
        interpret=interpret,
    )(*psg, vd_p, feats_p, wf, bf, wd, wo, bo, lns, lnb,
      nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb)
    return out[:, :, :w]


def _bwd_call(psg, vd, feats, wf, bf, wd, wo, bo, lns, lnb,
              nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb, g, mean, interpret,
              mode=1):
    b, hr, w, h = vd.shape
    ff = feats.shape[-1]
    bh = _pick_bh(hr)
    wp, bw = _pick_bw(w)
    # zero-padding is exact: g is zero in the pad, so every pad
    # contribution to input and weight gradients vanishes
    pw = psg[0].shape[-2]  # caller's psg width (wp when built pre-padded)
    psg = tuple(_pad_w(p, wp) for p in psg)
    vd_p, feats_p, g_p = _pad_w(vd, wp), _pad_w(feats, wp), _pad_w(g, wp)
    # the backward caches 12 extra per-corner slabs — at bw=256 it
    # overflows the 16 MB scoped-vmem stack (21.1 MB measured), so halve
    # the column tile
    if bw > 128 and bw % 2 == 0:
        bw //= 2
    full, band, featb = _specs(bh, bw, h, ff)
    f32 = jnp.float32
    if mode == 2:
        wf2, bf2, wo2, bo2, lns2, lnb2, msel, mbc = _pack_hop_params(
            wf, bf, wo, bo, lns, lnb
        )
        nd0 = jnp.concatenate([nd0a, nd0b], 0)
        pshape = jax.ShapeDtypeStruct((b, hr, wp, h), psg[0].dtype)
        out_shapes = (
            pshape, pshape, pshape, pshape,                  # dpsg_k
            jax.ShapeDtypeStruct((b, hr, wp, h), vd.dtype),  # dvd
            jax.ShapeDtypeStruct((2 * ff, 2 * h), f32),      # dwf2
            jax.ShapeDtypeStruct((2 * h,), f32),             # dbf2
            jax.ShapeDtypeStruct((h, h), f32),               # dwd
            jax.ShapeDtypeStruct((2 * h, 2 * h), f32),       # dwo2
            jax.ShapeDtypeStruct((2 * h,), f32),             # dbo2
            jax.ShapeDtypeStruct((2 * h,), f32),             # dlns2
            jax.ShapeDtypeStruct((2 * h,), f32),             # dlnb2
            jax.ShapeDtypeStruct((2 * h, h), f32),           # dnd0
            jax.ShapeDtypeStruct((h,), f32),                 # dnb0
            jax.ShapeDtypeStruct((h, h), f32),               # dnd1
            jax.ShapeDtypeStruct((h,), f32),                 # dnb1
            jax.ShapeDtypeStruct((h,), f32),                 # dnlns
            jax.ShapeDtypeStruct((h,), f32),                 # dnlnb
        )
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel_packed, mean=mean),
            grid=(b, hr // bh, wp // bw),
            in_specs=[
                band, band, band, band, band, featb,
                full(2 * ff, 2 * h), full(h, h), full(2 * h, 2 * h),
                full(2 * h), full(2 * h), full(2 * h), full(2 * h),
                full(2 * h, 2), full(2, 2 * h),
                full(2 * h, h), full(h), full(h, h), full(h),
                full(h), full(h),
                band,                                        # g
            ],
            out_specs=[
                band, band, band, band, band,
                full(2 * ff, 2 * h), full(2 * h), full(h, h),
                full(2 * h, 2 * h), full(2 * h), full(2 * h), full(2 * h),
                full(2 * h, h), full(h), full(h, h), full(h),
                full(h), full(h),
            ],
            out_shape=out_shapes,
            interpret=interpret,
        )(*psg, vd_p, feats_p, wf2, wd, wo2, bo2, lns2, lnb2, bf2,
          msel, mbc, nd0, nb0, nd1, nb1, nlns, nlnb, g_p)
        (dp0, dp1, dp2, dp3, dvd, dwf2, dbf2, dwd, dwo2, dbo2, dlns2,
         dlnb2, dnd0, dnb0, dnd1, dnb1, dnlns, dnlnb) = outs
        # fold the packed accumulators: diagonal blocks / halves
        return (
            dp0[:, :, :pw], dp1[:, :, :pw], dp2[:, :, :pw], dp3[:, :, :pw],
            dvd[:, :, :w],
            dwf2[:ff, :h] + dwf2[ff:, h:],
            dbf2[:h] + dbf2[h:],
            dwd,
            dwo2[:h, :h] + dwo2[h:, h:],
            dbo2[:h] + dbo2[h:],
            dlns2[:h] + dlns2[h:],
            dlnb2[:h] + dlnb2[h:],
            dnd0[:h], dnd0[h:], dnb0, dnd1, dnb1, dnlns, dnlnb,
        )
    pshape = jax.ShapeDtypeStruct((b, hr, wp, h), psg[0].dtype)
    out_shapes = (
        pshape, pshape, pshape, pshape,                # dpsg_k
        jax.ShapeDtypeStruct((b, hr, wp, h), vd.dtype),  # dvd
        jax.ShapeDtypeStruct((ff, h), f32),            # dwf
        jax.ShapeDtypeStruct((h,), f32),               # dbf
        jax.ShapeDtypeStruct((h, h), f32),             # dwd
        jax.ShapeDtypeStruct((h, h), f32),             # dwo
        jax.ShapeDtypeStruct((h,), f32),               # dbo
        jax.ShapeDtypeStruct((h,), f32),               # dlns
        jax.ShapeDtypeStruct((h,), f32),               # dlnb
        jax.ShapeDtypeStruct((h, h), f32),             # dnd0a
        jax.ShapeDtypeStruct((h, h), f32),             # dnd0b
        jax.ShapeDtypeStruct((h,), f32),               # dnb0
        jax.ShapeDtypeStruct((h, h), f32),             # dnd1
        jax.ShapeDtypeStruct((h,), f32),               # dnb1
        jax.ShapeDtypeStruct((h,), f32),               # dnlns
        jax.ShapeDtypeStruct((h,), f32),               # dnlnb
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, mean=mean),
        grid=(b, hr // bh, wp // bw),
        in_specs=[
            band, band, band, band, band, featb,
            full(ff, h), full(h, h), full(h, h), full(h), full(h),
            full(h), full(h),
            full(h, h), full(h, h), full(h), full(h, h), full(h),
            full(h), full(h),
            band,                                       # g
        ],
        out_specs=[
            band, band, band, band, band,
            full(ff, h), full(h), full(h, h), full(h, h), full(h),
            full(h), full(h),
            full(h, h), full(h, h), full(h), full(h, h), full(h),
            full(h), full(h),
        ],
        out_shape=out_shapes,
        interpret=interpret,
    )(*psg, vd_p, feats_p, wf, wd, wo, bo, lns, lnb, bf,
      nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb, g_p)
    # dpsg_k go back at the caller's psg width (pre-padded callers get
    # them unchanged); dvd at the true width
    dpsg = tuple(o[:, :, :pw] for o in outs[:4])
    return dpsg + (outs[4][:, :, :w],) + outs[5:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused(mean, interpret, mode, psg0, psg1, psg2, psg3, vd, feats,
           wf, bf, wd, wo, bo, lns, lnb,
           nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb):
    return _fwd_call((psg0, psg1, psg2, psg3), vd, feats,
                     wf, bf, wd, wo, bo, lns, lnb,
                     nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb, mean, interpret,
                     mode)


def _vjp_fwd(mean, interpret, mode, psg0, psg1, psg2, psg3, vd, feats,
             wf, bf, wd, wo, bo, lns, lnb,
             nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb):
    out = _fwd_call((psg0, psg1, psg2, psg3), vd, feats,
                    wf, bf, wd, wo, bo, lns, lnb,
                    nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb, mean, interpret,
                    mode)
    return out, (psg0, psg1, psg2, psg3, vd, feats, wf, bf, wd, wo, bo,
                 lns, lnb, nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb)


def _vjp_bwd(mean, interpret, mode, res, g):
    (psg0, psg1, psg2, psg3, vd, feats, wf, bf, wd, wo, bo, lns, lnb,
     nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb) = res
    (dpsg0, dpsg1, dpsg2, dpsg3, dvd, dwf, dbf, dwd, dwo, dbo, dlns, dlnb,
     dnd0a, dnd0b, dnb0, dnd1, dnb1, dnlns, dnlnb) = _bwd_call(
        (psg0, psg1, psg2, psg3), vd, feats, wf, bf, wd, wo, bo, lns, lnb,
        nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb, g, mean, interpret, mode
    )
    dfeats = jnp.zeros_like(feats)  # static graph data; DCE'd by jit
    cast = lambda dx, x: dx.astype(x.dtype)  # noqa: E731
    return (dpsg0, dpsg1, dpsg2, dpsg3, dvd, dfeats,
            cast(dwf, wf), cast(dbf, bf), cast(dwd, wd), cast(dwo, wo),
            cast(dbo, bo), cast(dlns, lns), cast(dlnb, lnb),
            cast(dnd0a, nd0a), cast(dnd0b, nd0b), cast(dnb0, nb0),
            cast(dnd1, nd1), cast(dnb1, nb1), cast(dnlns, nlns),
            cast(dnlnb, nlnb))


_fused.defvjp(_vjp_fwd, _vjp_bwd)


def fused_corner_hop(psg, vd, feats, wf, bf, wd, wo, bo, lns, lnb,
                     nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb,
                     mean: bool = False, interpret: bool = False,
                     mode: int = 1):
    """v_out for the m2g corner hop with everything downstream of the
    corner upsample fused into one VMEM pass (see module docstring).

    psg: sequence of FOUR (B, H, Wk, h) corner-upsampled source
    projections — build them at ``padded_width(W)`` (pad the column
    selection matrix) so no grid-sized pad ops appear; vd: (B, H, W, h)
    destination grid states; feats: (4, H, W, F) static corner
    features. nd0a/nd0b are the node MLP's first Dense kernel split at
    the concat boundary ([v_dst, agg] → rows [:h] and [h:]).
    mode 1 = per-corner tiles; mode 2 = lane-packed corner pairs
    (same HBM layout, 2h-wide VMEM compute)."""
    p0, p1, p2, p3 = psg
    return _fused(bool(mean), bool(interpret), int(mode),
                  p0, p1, p2, p3, vd, feats,
                  wf, bf, wd, wo, bo, lns, lnb,
                  nd0a, nd0b, nb0, nd1, nb1, nlns, nlnb)


def use_fused_hop(hidden_layers: int) -> int:
    """Returns the kernel mode to use for the m2g hop, 0 = XLA path.
    Opt-in via P4T_FUSED_HOP=1 (TPU, default edge-MLP depth only);
    P4T_FUSED_HOP_MODE picks the kernel variant (default 2).

    Measured on v5e (HiLAM 500x500 b1, after the scan-over-remat and
    sep_take_mm fixes): XLA path 50.3 samples/s, mode-1 kernel 44.1 —
    mode 1's HLO-level traffic is lower (14.7 → 12.1 GB/step) but its
    h=64 channels fill only half of the 128 VMEM lanes and the
    custom-call serializes against the DMA overlap XLA schedules. Mode 2
    lane-packs corner pairs to 2h=128 (the stencil mode-2 trick) so the
    elementwise chains and MXU passes run full-width — measured 44.7 vs
    49.6 XLA (same session, serial): bytes drop further (14.55 → 11.84
    GB/step) but the achieved bandwidth inside the custom call drops
    more (roofline frac 0.88 → 0.65). XLA's automatic DMA/compute
    overlap beats the hand kernel at this arithmetic intensity, so the
    default stays off."""
    import os

    from py4cast_tpu.ops.attention import _target_platform, spatially_sharded

    if hidden_layers != 1 or os.environ.get("P4T_FUSED_HOP", "0") != "1":
        return 0
    if _target_platform() != "tpu" or spatially_sharded():
        return 0
    return int(os.environ.get("P4T_FUSED_HOP_MODE", "2"))
