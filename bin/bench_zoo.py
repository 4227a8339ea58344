#!/usr/bin/env python
"""Training throughput for the WHOLE model zoo on one chip.

bench.py measures the four headline models; this tool covers the rest
of the registry (reference zoo parity: SURVEY.md §2.2) at their default
config-yaml settings on the Titan-sized grids, so every architecture
has a recorded TPU training rate. Reuses bench.bench_model — same
scan-mode timing, MFU and roofline accounting.

Usage: python bin/bench_zoo.py [UNet Segformer ...]   (default: all)
Env: same knobs as bench.py (BENCH_BATCH, BENCH_STEPS, BENCH_GRID, ...).
Prints one JSON line per model.
"""

import json
import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/p4t_xla_cache")

import bench  # noqa: E402

#: default settings mirror the reference config yamls
#: (config/CLI/model/*.yaml); grids match bench.py's headline configs
ZOO = {
    "UNet": ((512, 640), {"init_features": 64}),
    "HalfUNet": ((512, 640), {"num_filters": 64, "use_ghost": True}),
    "CustomUNet": ((512, 640), {"encoder_name": "resnet18"}),
    "DeepLabV3": ((512, 640), {}),
    "DeepLabV3Plus": ((512, 640), {}),
    "Segformer": ((512, 640), {"num_layers": 2, "decoder_dim": 256}),
    "SwinUNetR": ((512, 640), {"feature_size": 24}),
    "HiLAMParallel": ((500, 500), {"hidden_dims": 64,
                                   "processor_layers": 4,
                                   "mesh_levels": 3}),
}


def main():
    from py4cast_tpu.settings import enable_compilation_cache

    enable_compilation_cache()
    bench.CONFIGS.update(ZOO)  # bench_model looks configs up there
    models = sys.argv[1:] or list(ZOO)
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    mode = os.environ.get("BENCH_MODE", "scan")
    for model in models:
        try:
            r = bench.bench_model(model, batch, steps, precision, mode)
        except Exception as e:  # isolate per-model failures
            traceback.print_exc(file=sys.stderr)
            r = {"metric": f"{model.lower()}_train_samples_per_sec_per_chip",
                 "value": 0.0, "unit": "samples/s",
                 "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
