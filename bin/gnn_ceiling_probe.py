#!/usr/bin/env python
"""GNN MFU-ceiling probe (VERDICT r4 #6): is HiLAM's ~6.5% MFU a
bandwidth bound or a latency/occupancy bound?

Protocol: time the full train step at hidden_dims 64 (the reference
config) and 128/256. Widening multiplies matmul FLOPs ~4x/16x and edge
bytes ~2x/4x per doubling; a bandwidth-bound step would slow ~2x per
doubling, a latency-bound step (fixed per-op overhead across the ~8
directional hops × levels × layers) slows much less — MFU rises.

Prints one JSON line per width with samples/s, MFU, and the modeled
HBM byte interval. Run on the chip: python bin/gnn_ceiling_probe.py
[model] [widths...]
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/p4t_xla_cache")


def main():
    import bench
    from py4cast_tpu.settings import enable_compilation_cache

    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "HiLAM"
    widths = [int(w) for w in sys.argv[2:]] or [64, 128, 256]
    for width in widths:
        grid, init_args = bench.CONFIGS[model]
        bench.CONFIGS[model] = (
            grid, {**init_args, "hidden_dims": width},
        )
        try:
            r = bench.bench_model(model, 1, 10, "bf16", "scan")
        finally:
            bench.CONFIGS[model] = (grid, init_args)
        bench._MODULE_CACHE.clear()
        r["hidden_dims"] = width
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
