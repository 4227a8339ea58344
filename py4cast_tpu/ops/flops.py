"""Analytic matmul/conv FLOP counting by walking a jaxpr.

Why not ``compiled.cost_analysis()["flops"]``: XLA's cost analysis
counts a ``while``-loop body ONCE, not multiplied by its trip count.
Every deep model here runs its repeated blocks under ``lax.scan``
(UNetRPP ``_epa_stage`` depth-3 stages, the GNN processor sweeps), so
XLA under-reports their training-step FLOPs by roughly the scan depth —
round-3's "UNETR++ sits at 2% MFU" headline was partly this accounting
artifact.

This walker multiplies ``scan`` bodies by their static trip count and
recurses through pjit/remat/custom-vjp wrappers, counting only
``dot_general`` and ``conv_general_dilated`` (the MXU ops — elementwise
FLOPs are noise for MFU and XLA's own estimate also centers on these).
Rematerialized compute therefore counts every time it executes: the
result is *hardware* FLOPs (what the chip performs), not *model* FLOPs.

No reference counterpart (the reference never measures FLOPs); this
exists so ``bench.py`` MFU numbers are trustworthy.
"""

from __future__ import annotations

import math
from typing import Callable

import jax


def _dot_general_flops(eqn) -> float:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    batch = math.prod(lhs.shape[d] for d in lb)
    k = math.prod(lhs.shape[d] for d in lc)
    m = math.prod(
        lhs.shape[d] for d in range(lhs.ndim) if d not in set(lc) | set(lb)
    )
    n = math.prod(
        rhs.shape[d] for d in range(rhs.ndim) if d not in set(rc) | set(rb)
    )
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    rhs = eqn.invars[1].aval  # kernel
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    out_spatial = math.prod(out.shape[d] for d in dn.out_spec[2:])
    batch = out.shape[dn.out_spec[0]]
    out_ch = out.shape[dn.out_spec[1]]
    kernel_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    # the kernel's input-channel dim is already per-group
    in_ch_per_group = rhs.shape[dn.rhs_spec[1]]
    return 2.0 * batch * out_spatial * out_ch * kernel_spatial * in_ch_per_group


def jaxpr_flops(jaxpr) -> float:
    """Total matmul+conv FLOPs of a (Closed)Jaxpr, scan-aware."""
    if hasattr(jaxpr, "jaxpr"):  # ClosedJaxpr
        jaxpr = jaxpr.jaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * jaxpr_flops(eqn.params["jaxpr"])
        elif name == "while":
            # trip count is dynamic; count the body once (bench code paths
            # use lax.scan, which carries a static length, instead)
            total += jaxpr_flops(eqn.params["body_jaxpr"])
        elif name == "cond":
            total += max(
                (jaxpr_flops(b) for b in eqn.params["branches"]), default=0.0
            )
        elif name == "pallas_call":
            grid = eqn.params.get("grid_mapping")
            n_blocks = (
                math.prod(int(g) for g in grid.grid) if grid is not None else 1
            )
            total += n_blocks * jaxpr_flops(eqn.params["jaxpr"])
        else:
            # generic wrappers: pjit, remat/checkpoint, custom_{jvp,vjp},
            # closed_call, named scopes — recurse into any jaxpr param
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                inner = eqn.params.get(key)
                if inner is not None:
                    total += jaxpr_flops(inner)
                    break
    return total


def step_flops(fn: Callable, *args, **kwargs) -> float:
    """FLOPs of one call of ``fn(*args)`` — traced, never executed."""
    closed = jax.make_jaxpr(fn, **kwargs)(*args)
    return jaxpr_flops(closed)
