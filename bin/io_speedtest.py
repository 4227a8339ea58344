"""Input-pipeline speedtest on a synthetic Titan-shaped npy tree.

Generates the exact file layout `prepare` produces for the reference's
default Titan training config (21 params × hourly dates, pre-cropped
512×640 float32 npy per (date, param) — reference:
config/CLI/dataset/titan.yaml:30-78, titan_cli.py:17-44), then measures:

1. raw per-file numpy read throughput (the python baseline),
2. the C++ thread-pool batch reader (py4cast_tpu/native),
3. the full DataLoader pipeline (Sample.load → forcings → collate) at
   several worker counts.

The pipeline number is what must exceed N_chips × device samples/s for
multi-chip training not to starve (doc/performance.md records results).

Usage: python bin/io_speedtest.py [--dates 48] [--workers 1 2 4 8]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dates", type=int, default=48)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--n-batches", type=int, default=8)
    parser.add_argument("--workers", type=int, nargs="+", default=[1, 2, 4, 8])
    parser.add_argument("--keep", action="store_true")
    args = parser.parse_args()

    root = Path(tempfile.mkdtemp(prefix="p4t_iospeed_"))
    os.environ["PY4CAST_TPU_ROOTDIR"] = str(root)
    os.environ["PY4CAST_TPU_TITAN_PATH"] = str(root / "titan")

    from py4cast_tpu.datasets import get_datasets
    from py4cast_tpu.datasets.titan import TitanAccessor
    from py4cast_tpu.native import native_available as has_native, read_npy_float32_batch

    conf = TitanAccessor.default_config()
    import datetime as dt

    start = dt.datetime(2020, 1, 1)
    n_days = max(1, args.dates // 24)
    end = start + dt.timedelta(days=n_days - 1, hours=23)
    args.dates = n_days * 24
    conf["periods"] = {
        split: {
            "start": int(start.strftime("%Y%m%d")),
            "end": int(end.strftime("%Y%m%d")),
            "obs_step": 3600,
        }
        for split in ("train", "valid", "test")
    }
    conf["settings"]["standardize"] = False  # no stats files needed

    train_ds, _, _ = get_datasets("titan", 2, 1, 1, dataset_conf=conf)

    # ---- generate the npy tree (pre-cropped subdomain shape)
    h = conf["grid"]["subdomain"][1] - conf["grid"]["subdomain"][0]
    w = conf["grid"]["subdomain"][3] - conf["grid"]["subdomain"][2]
    rng = np.random.default_rng(0)
    dates = [start + dt.timedelta(hours=i) for i in range(args.dates)]
    params = train_ds.params
    n_files = 0
    for date in dates:
        for p in params:
            path = TitanAccessor._date_filepath("titan", p, date, "npy")
            path.parent.mkdir(parents=True, exist_ok=True)
            np.save(path, rng.standard_normal((h, w)).astype(np.float32))
            n_files += 1
    file_mb = h * w * 4 / 1e6
    print(f"generated {n_files} files of {file_mb:.1f} MB each under {root}")

    results = {"n_params": len(params), "grid": [h, w], "native_built": has_native()}

    # ---- raw read: python loop vs native batch reader
    probe_paths = [
        TitanAccessor._date_filepath("titan", p, d, "npy")
        for d in dates[:24]
        for p in params
    ]
    t0 = time.perf_counter()
    for p_ in probe_paths:
        np.load(p_)
    dt_py = time.perf_counter() - t0
    results["raw_numpy_files_per_sec"] = round(len(probe_paths) / dt_py, 1)
    results["raw_numpy_MB_per_sec"] = round(len(probe_paths) * file_mb / dt_py, 1)
    print(f"raw numpy: {results['raw_numpy_MB_per_sec']} MB/s", flush=True)

    if has_native():
        t0 = time.perf_counter()
        read_npy_float32_batch(probe_paths, (h, w))
        dt_nat = time.perf_counter() - t0
        results["raw_native_files_per_sec"] = round(len(probe_paths) / dt_nat, 1)
        results["raw_native_MB_per_sec"] = round(
            len(probe_paths) * file_mb / dt_nat, 1
        )
        print(f"raw native: {results['raw_native_MB_per_sec']} MB/s", flush=True)

    # ---- full pipeline at several worker counts
    n_batches = min(args.n_batches, len(train_ds) // args.batch_size - 1)
    for workers in args.workers:
        loader = iter(
            train_ds.loader(
                batch_size=args.batch_size, num_workers=workers, prefetch=2
            )
        )
        next(loader)  # warm page cache / pools
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(loader)
        elapsed = time.perf_counter() - t0
        loader.close()
        results[f"pipeline_samples_per_sec_w{workers}"] = round(
            n_batches * args.batch_size / elapsed, 2
        )
        print(
            f"pipeline w{workers}: "
            f"{results[f'pipeline_samples_per_sec_w{workers}']} samples/s",
            flush=True,
        )

    print(json.dumps(results))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
