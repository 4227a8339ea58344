#!/usr/bin/env python
"""12-step autoregressive rollout inference latency.

BASELINE.md names "12-step rollout wall-clock" as a north-star metric;
the reference never records one (no inference benchmark exists in
/root/reference). This tool measures it for any bench model: the full
jitted predict step (lax.scan over the AR rollout, de-normalized
outputs) with everything device-resident threaded as arguments, timed
over several dispatches. Completion is forced by a scalar checksum
transfer so the (B, T, H, W, F) product never rides the tunnel.

Usage: python bin/bench_rollout.py [HalfUNet ...]
Env: ROLLOUT_STEPS (12), ROLLOUT_BATCH (1), ROLLOUT_PRECISION (bf16),
     ROLLOUT_REPEATS (5), BENCH_GRID ("HxW" debug override).
Prints one JSON line per model.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/p4t_xla_cache")

from bench import CONFIGS  # noqa: E402  (model grid/settings table)


def bench_rollout(model: str, batch_size: int, pred_steps: int,
                  precision: str, repeats: int) -> dict:
    import jax
    import jax.numpy as jnp

    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh
    from py4cast_tpu.testing import (
        synthetic_dataset_info,
        synthetic_device_arrays,
    )
    from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings

    grid, init_args = CONFIGS.get(model, ((512, 640), {}))
    if os.environ.get("BENCH_GRID"):
        h, w = (int(v) for v in os.environ["BENCH_GRID"].split("x"))
        grid = (h, w)
    info = synthetic_dataset_info(
        grid_shape=grid, weather_features=21, forcing_features=21
    )
    settings = TrainingSettings(
        model_name=model,
        settings_init_args=init_args,
        training_strategy="scaled_ar",
        num_input_steps=2,
        precision=precision,
        num_warmup_steps=10,
    )
    mesh = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    module = AutoRegressiveModule(settings, info, mesh=mesh)
    state = module.init_state(jax.random.key(0), num_training_steps=1000)
    inputs, forcing, _ = synthetic_device_arrays(
        module, batch_size=batch_size, num_pred_steps=pred_steps
    )
    buffers = module.step_buffers()
    rng = jax.random.key(1)

    def predict(params, inputs, forcing, rng, buffers):
        preds = module._rollout(
            params, inputs, forcing, None, pred_steps, rng, buffers
        )
        preds = preds * buffers["stats_std"] + buffers["stats_mean"]
        # scalar checksum: fetching it forces the rollout without
        # pulling the full product through the tunnel
        return preds, jnp.float32(jnp.sum(preds[..., 0]))

    t0 = time.perf_counter()
    run = (
        jax.jit(predict)
        .lower(state.params, inputs, forcing, rng, buffers)
        .compile()
    )
    compile_s = time.perf_counter() - t0
    _, check = run(state.params, inputs, forcing, rng, buffers)
    assert float(check) == float(check), "rollout produced NaN"
    t0 = time.perf_counter()
    for _ in range(repeats):
        _, check = run(state.params, inputs, forcing, rng, buffers)
        float(check)
    dt = time.perf_counter() - t0

    lat_ms = dt / repeats * 1000
    return {
        "metric": (
            f"{model.lower()}_{grid[0]}x{grid[1]}"
            f"_rollout{pred_steps}_latency_ms"
        ),
        "value": round(lat_ms, 1),
        "unit": "ms",
        "samples_per_sec": round(batch_size * repeats / dt, 2),
        "pred_steps": pred_steps,
        "batch_size": batch_size,
        "compile_seconds": round(compile_s, 1),
    }


def main():
    from py4cast_tpu.settings import enable_compilation_cache

    enable_compilation_cache()
    models = sys.argv[1:] or ["HalfUNet", "HiLAM"]
    pred_steps = int(os.environ.get("ROLLOUT_STEPS", "12"))
    batch = int(os.environ.get("ROLLOUT_BATCH", "1"))
    precision = os.environ.get("ROLLOUT_PRECISION", "bf16")
    repeats = int(os.environ.get("ROLLOUT_REPEATS", "5"))
    for model in models:
        print(
            json.dumps(bench_rollout(model, batch, pred_steps, precision,
                                     repeats)),
            flush=True,
        )


if __name__ == "__main__":
    main()
