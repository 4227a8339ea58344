"""Scatter-free 2x2/stride-2 max pooling.

``nn.max_pool``'s VJP lowers to XLA ``select_and_scatter``, which TPU
executes painfully slowly — 2.2 ms of HalfUNet's 26 ms train step at
512x640 (device trace, bin/trace_gnn.py). For the non-overlapping 2x2
case the backward is just "route the cotangent to the first max of each
window", which this module computes with reshapes and elementwise masks
(~0.3 ms at the same size).

Tie-breaking matches select_and_scatter (and torch's MaxPool2d): the
cotangent goes to the FIRST maximal element in row-major window order.
Exactness (values + gradients, including ties) is pinned by
tests/test_pool.py.

Reference behavior: mfai UNet/HalfUNet MaxPool2d downsampling
(SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _window(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4, C) row-major window positions,
    cropping odd tails (VALID padding semantics)."""
    b, h, w, c = x.shape
    x = x[:, : h // 2 * 2, : w // 2 * 2]
    xw = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.moveaxis(xw, 2, 3).reshape(b, h // 2, w // 2, 4, c)


@jax.custom_vjp
def max_pool_2x2(x):
    """Max over non-overlapping 2x2 windows, stride 2, VALID padding."""
    return _window(x).max(axis=3)


def _fwd(x):
    return max_pool_2x2(x), x


def _bwd(x, g):
    b, h, w, c = x.shape
    xw = _window(x)  # (B, h2, w2, 4, C)
    m = xw.max(axis=3, keepdims=True)
    eq = (xw == m).astype(g.dtype)
    # first max in row-major window order gets the cotangent
    first = eq * (jnp.cumsum(eq, axis=3) == eq)
    dxw = first * g[:, :, :, None]
    dxw = jnp.moveaxis(
        dxw.reshape(b, h // 2, w // 2, 2, 2, c), 3, 2
    ).reshape(b, h // 2 * 2, w // 2 * 2, c)
    if dxw.shape[1] != h or dxw.shape[2] != w:  # odd tails got cropped
        dxw = jnp.pad(
            dxw, ((0, 0), (0, h - dxw.shape[1]), (0, w - dxw.shape[2]), (0, 0))
        )
    return (dxw,)


max_pool_2x2.defvjp(_fwd, _bwd)
