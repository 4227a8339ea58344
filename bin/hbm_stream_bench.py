#!/usr/bin/env python
"""HBM stream calibration: what fraction of the chip's NOMINAL peak
bandwidth does a plain elementwise stream actually sustain?

Roofline fractions in bench.py divide by the datasheet peak (819 GB/s
on v5e). A chip never sustains its datasheet number on real access
patterns, so "model X sits at 0.45 of the roofline" is only
interpretable next to the fraction a PURE STREAM sustains — this
prints that calibration constant.

Three patterns, each timed as N iterations inside ONE lax.scan
dispatch (completion forced by a scalar transfer, as in bench.py):
  copy    y = x + 0            (2 streams: read + write)
  add     y = a + b            (3 streams)
  shift   y = roll(x, 1, axis) (2 streams, the lattice-GNN stencil
                                access pattern: strided halo copy)

Usage: python bin/hbm_stream_bench.py [MiB_per_array] [iters]
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import bench
    from py4cast_tpu.settings import enable_compilation_cache

    enable_compilation_cache()
    mib = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    peak = bench.peak_hbm()

    n = mib * (1 << 20) // 2  # bf16 elements
    rows = n // 1024
    x = jnp.ones((rows, 1024), jnp.bfloat16)
    b = jnp.full((rows, 1024), 2.0, jnp.bfloat16)
    nbytes = rows * 1024 * 2

    cases = {
        # carry-rotation keeps each iteration's output live as the next
        # input so XLA cannot collapse the loop body
        "copy": (lambda c, _: (c + jnp.bfloat16(1), None), (x,), 2),
        "add": (lambda c, _: ((c[0] + c[1], c[0]), None), (x, b), 3),
        "shift": (
            lambda c, _: (jnp.roll(c, 1, axis=0) + jnp.bfloat16(1), None),
            (x,),
            2,
        ),
    }
    # the lattice-GNN pattern at the REFERENCE width: shifting a
    # (..., 64)-minor tensor — 64 lanes fill half a (8, 128) tile, so
    # this measures how much the narrow feature dim itself costs
    x64 = jnp.ones((rows * 4, 4, 64), jnp.bfloat16)  # same bytes as x
    cases["shift64"] = (
        lambda c, _: (jnp.roll(c, 1, axis=1) + jnp.bfloat16(1), None),
        (x64,),
        2,
    )
    out = {"MiB_per_array": mib, "iters": iters, "peak_GBps": peak / 1e9}
    for name, (body, init, streams) in cases.items():
        init_c = init[0] if len(init) == 1 else init

        @jax.jit
        def run(c, body=body):
            c, _ = lax.scan(body, c, None, length=iters)
            leaf = c[0] if isinstance(c, tuple) else c
            return jnp.sum(jnp.abs(leaf[:1, :1]).astype(jnp.float32))

        float(run(init_c))  # compile + warm
        t0 = time.perf_counter()
        float(run(init_c))
        dt = time.perf_counter() - t0
        gbps = streams * nbytes * iters / dt / 1e9
        out[name] = {
            "GBps": round(gbps, 1),
            "frac_of_peak": round(gbps / (peak / 1e9), 3),
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
