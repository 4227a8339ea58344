"""Host-memory leak canary for the data pipeline.

JAX-native analog of the reference's torch-debugging scratch
(`py4cast/ideas/minimal_leak.py`, which demonstrated how repeated
CPU-tensor standardization leaked RSS in torch): iterate the dummy
dataset's loader — sample load + standardization + collate, the exact
code the leak class lives in — for several epochs and report the
process RSS trajectory. Bounded RSS after warm-up = no leak; monotonic
growth across epochs exits 1.

This pipeline standardizes in numpy (the reference's own conclusion:
"Using numpy seems to work fine") and holds batches in shared memory
without pickling, so the canary should stay flat.

Usage: python bin/host_memory_check.py [--epochs 6] [--batch-size 8]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/p4t_memcheck")


def rss_mb() -> float:
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--grow-mb", type=float, default=64.0,
                    help="max tolerated RSS growth after the warm-up epoch")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from py4cast_tpu.datasets import get_datasets

    train_ds, _, _ = get_datasets("dummy", 2, 1, 1)
    per_epoch = []
    for epoch in range(args.epochs):
        n = 0
        for batch in train_ds.loader(
            batch_size=args.batch_size, num_workers=2, shuffle=True
        ):
            # touch the standardized arrays so lazy work actually runs
            float(batch.inputs.array.mean())
            float(batch.outputs.array.mean())
            n += 1
        per_epoch.append(rss_mb())
        print(f"epoch {epoch}: {n} batches, RSS {per_epoch[-1]:.1f} MB",
              flush=True)

    growth = per_epoch[-1] - per_epoch[0]  # after the warm-up epoch
    print(f"RSS growth after warm-up: {growth:+.1f} MB "
          f"(tolerance {args.grow_mb} MB)")
    ok = growth <= args.grow_mb
    print("MEMCHECK", "OK" if ok else "LEAK")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
