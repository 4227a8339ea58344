"""Pallas TPU attention kernel for long-query / short-KV attention.

The ViT models here (Segformer efficient attention, UNETR++ EPA spatial
branch) attend MANY query tokens (H·W after patching — up to ~20k on the
Titan grid) against FEW key/value tokens (spatially-reduced K/V,
reduction_ratio / proj_size). XLA's dot-product attention materializes
the (Lq, Lk) logits in HBM (hundreds of MB at stage 1); this kernel
tiles over Q blocks with the whole K/V resident in VMEM, so logits only
ever exist as one (BQ, Lk) block — exact softmax, no online rescaling
needed.

Backward is a second Pallas kernel: dQ is written per Q block; dK/dV are
accumulated across the sequential TPU grid into a constant-indexed
output block (initialized at the first Q block of each head).
Wired via jax.custom_vjp; used by Segformer when Lk fits VMEM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: K/V token budget that comfortably fits VMEM alongside blocks
MAX_KV_VMEM_TOKENS = 4096
DEFAULT_BLOCK_Q = 512


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (Lk, D)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, Lk)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p / denom, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (BQ, Lk)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, Lk)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # (BQ, Lk)
    dq_ref[0] = (scale * jnp.dot(ds, k, preferred_element_type=jnp.float32)
                 ).astype(dq_ref.dtype)

    dk_blk = scale * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Lk, D)
    dv_blk = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Lk, D)

    # accumulate over the sequential q-block grid; re-init per head (qi==0)
    @pl.when(qi == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += dk_blk.astype(dk_ref.dtype)
    dv_ref[0] += dv_blk.astype(dv_ref.dtype)


def _pad_q(q, block_q):
    lq = q.shape[1]
    pad = (-lq) % block_q
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    return q, lq


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def short_kv_attention(q, k, v, scale: float, block_q: int = DEFAULT_BLOCK_Q,
                       interpret: bool = False):
    """softmax(q·kᵀ·scale)·v for (BH, Lq, D) q and (BH, Lk, D) k/v."""
    return _forward(q, k, v, scale, block_q, interpret)


def _forward(q, k, v, scale, block_q, interpret):
    bh, lk, d = k.shape
    qp, lq = _pad_q(q, block_q)
    n_q = qp.shape[1] // block_q
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, k, v)
    return out[:, :lq]


def _fwd_rule(q, k, v, scale, block_q, interpret):
    return _forward(q, k, v, scale, block_q, interpret), (q, k, v)


def _bwd_rule(scale, block_q, interpret, res, g):
    q, k, v = res
    bh, lk, d = k.shape
    qp, lq = _pad_q(q, block_q)
    gp, _ = _pad_q(g, block_q)
    n_q = qp.shape[1] // block_q
    # dK/dV accumulate across up to n_q sequential grid steps — keep the
    # accumulator fp32 even for bf16 inputs and cast once at the end
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct(qp.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ),
        grid=(bh, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qp, k, v, gp)
    return dq[:, :lq], dk.astype(k.dtype), dv.astype(v.dtype)


short_kv_attention.defvjp(_fwd_rule, _bwd_rule)


def _target_platform() -> str:
    """Platform the traced computation will actually run on — honors a
    ``jax.default_device`` override (e.g. CPU-side param init while the
    priority backend is a TPU), which ``jax.default_backend()`` ignores."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return getattr(dev, "platform", jax.default_backend())
    return jax.default_backend()


# module-level gate state, set explicitly by each AutoRegressiveModule
# before it traces (ADVICE r3: the env var alone was process-global
# mutable state that a second trainer silently inherited). The env var
# remains as a manual OVERRIDE only.
_SPATIAL_SHARDS = 1


def set_spatial_shards(n: int) -> None:
    """Record the current trainer's spatial mesh extent. Called by
    AutoRegressiveModule at construction AND before every trace so
    interleaved modules with different meshes each trace with their
    own gate value."""
    global _SPATIAL_SHARDS
    _SPATIAL_SHARDS = int(n)


def spatially_sharded() -> bool:
    """True when the active module's mesh has spatial>1 (set via
    ``set_spatial_shards``; ``P4T_SPATIAL_SHARDS`` env overrides): the
    fused Pallas kernels are opaque custom calls to GSPMD, so
    lat-sharded runs must take the plain-XLA paths (their pad/shift
    formulas lower to halo exchanges automatically)."""
    import os

    env = os.environ.get("P4T_SPATIAL_SHARDS")
    if env:
        # the env var is a MANUAL override that wins over the module's
        # real mesh extent for the whole process — a leftover export
        # would silently force the wrong kernel path, so say so once
        # per distinct (override, actual-extent) mismatch
        key = (env, _SPATIAL_SHARDS)
        if key not in _ENV_OVERRIDE_WARNED and int(env) != _SPATIAL_SHARDS:
            _ENV_OVERRIDE_WARNED.add(key)
            import warnings

            warnings.warn(
                f"P4T_SPATIAL_SHARDS={env} overrides the active module's "
                f"mesh extent ({_SPATIAL_SHARDS}) for Pallas kernel "
                "gating; unset it unless this is intentional."
            )
        return int(env) > 1
    return _SPATIAL_SHARDS > 1


_ENV_OVERRIDE_WARNED: set = set()


def use_pallas_attention(
    lk: int, head_dim: int = 128, requested: bool = False
) -> bool:
    """Pallas path: OPT-IN via P4T_FUSED_ATTENTION=1 or a model setting
    (``requested=True`` — UNetRPP ``attention_code: pallas|flash_attn``,
    the TPU analog of the reference selecting its flash-attn wheel),
    default off. Always requires: TPU, K/V small enough to sit in VMEM,
    head dim wide enough to feed the MXU lanes, no spatial sharding.

    Off by default since round 4: the kernel now measures SLOWER than
    XLA's attention on every model that reaches it — full train step,
    batch 1, v5e, same-session A/B via the gate: Segformer 65.9 (on) vs
    88.9 (off) samples/s, UNETR++ hidden-1024 17.7 vs 22.7. The round-1
    measurement that motivated it (Segformer fwd+bwd −28% at batch 4)
    no longer reproduces — current XLA fuses the spatially-reduced-K/V
    attention into the surrounding matmuls and never materializes
    HBM-sized logits (kernel-off roofline fractions 1.14-1.28 = fusion
    removing round-trips). Earlier data point kept for the head-dim
    bound: UNETR++ EPA with head_dim 16 measured 23 vs 32 samples/s."""
    import os

    env_on = os.environ.get("P4T_FUSED_ATTENTION") == "1"
    on = (
        (requested or env_on)
        and _target_platform() == "tpu"
        and lk <= MAX_KV_VMEM_TOKENS
        and head_dim >= 32
        and not spatially_sharded()
    )
    if on and env_on and not requested:
        # the kernel engages ONLY because of the env var, against the
        # model's own attention_code (xla/torch) — the inverse of the
        # silent-fallback trap: say so once, so an A/B export left in
        # the environment can't silently flip a production model's
        # attention backend (ADVICE r4)
        key = ("env-forced", lk, head_dim)
        if key not in _ENV_OVERRIDE_WARNED:
            _ENV_OVERRIDE_WARNED.add(key)
            import warnings

            warnings.warn(
                "P4T_FUSED_ATTENTION=1 is overriding the model's "
                "attention_code (xla) and forcing the Pallas kernel; "
                "unset it unless this A/B override is intentional."
            )
    if requested and not on:
        # the model EXPLICITLY asked for the kernel (attention_code):
        # a silent fallback would be the same parity trap as an ignored
        # setting, so name the failing condition (once per shape)
        reason = (
            "platform is not TPU" if _target_platform() != "tpu"
            else f"K/V length {lk} > {MAX_KV_VMEM_TOKENS} (VMEM bound)"
            if lk > MAX_KV_VMEM_TOKENS
            else f"head_dim {head_dim} < 32 (MXU lane bound)"
            if head_dim < 32
            else "spatial sharding active (kernel is opaque to GSPMD)"
        )
        key = ("requested-miss", lk, head_dim, reason)
        if key not in _ENV_OVERRIDE_WARNED:
            _ENV_OVERRIDE_WARNED.add(key)
            import warnings

            warnings.warn(
                f"attention_code requested the Pallas kernel but it "
                f"cannot engage here ({reason}); falling back to XLA "
                "attention."
            )
    return on


def dot_product_attention_short_kv(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Drop-in for nn.dot_product_attention with (B, L, H, D) layout,
    dispatching to the Pallas kernel when profitable."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = 1.0 / (d**0.5)
    if not (use_pallas_attention(lk, d) or interpret):
        import flax.linen as nn

        return nn.dot_product_attention(q, k, v)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, lq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, lk, d)
    of = short_kv_attention(qf, kf, vf, scale, DEFAULT_BLOCK_Q, interpret)
    return of.reshape(b, h, lq, d).transpose(0, 2, 1, 3)
