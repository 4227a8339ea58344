#!/usr/bin/env python
"""Headline benchmark: HalfUNet auto-regressive training throughput on a
Titan-sized grid (512×640, 21 prognostic + 21 forcing features,
scaled_ar, batch 1) — the reference's default Titan training config
(reference: config/CLI/dataset/titan.yaml:30-78, BASELINE.md).

Baseline: the only recorded reference training speed is HiLAM at
1.53 it/s, batch 1, 1 AR step, 500×500 grid on one V100
(reference doc/num_steps.md:119-121). We report samples/sec of the full
jitted train step (forward + backward + optimizer) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")

BASELINE_SAMPLES_PER_SEC = 1.53  # doc/num_steps.md:119-121 (V100, batch 1)


def main():
    import jax

    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh
    from py4cast_tpu.testing import synthetic_batch, synthetic_dataset_info
    from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings

    batch_size = int(os.environ.get("BENCH_BATCH", "1"))
    model = os.environ.get("BENCH_MODEL", "HalfUNet")
    # per-model benchmark configs; HiLAM mirrors the reference's recorded
    # measurement (1 AR step, batch 1, 500×500 grid, doc/num_steps.md:119)
    configs = {
        "HalfUNet": ((512, 640), {"num_filters": 64}),
        "UNetRPP": ((512, 640), {"hidden_size": 256, "downsampling_rate": 4}),
        "HiLAM": ((500, 500), {"hidden_dims": 64, "processor_layers": 4,
                               "mesh_levels": 3}),
        "GraphLAM": ((500, 500), {"hidden_dims": 64, "processor_layers": 4,
                                  "mesh_levels": 3}),
    }
    grid, init_args = configs.get(model, ((512, 640), {}))
    info = synthetic_dataset_info(
        grid_shape=grid, weather_features=21, forcing_features=21
    )
    settings = TrainingSettings(
        model_name=model,
        settings_init_args=init_args,
        training_strategy="scaled_ar",
        num_input_steps=2,
        precision=os.environ.get("BENCH_PRECISION", "bf16"),
        num_warmup_steps=10,
    )
    mesh = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    module = AutoRegressiveModule(settings, info, mesh=mesh)
    state = module.init_state(jax.random.key(0), num_training_steps=1000)
    batch = synthetic_batch(info, batch_size=batch_size, num_pred_steps=1)

    rng = jax.random.key(1)
    # stage the batch on device once: the bench measures the train step
    # (fwd+bwd+optimizer), not host→device transfer of synthetic data
    inputs, forcing, outputs = module._batch_arrays(batch)
    step_fn = module._get_jitted("train", batch.num_pred_steps)

    graph = module._graph_buffers
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))

    if os.environ.get("BENCH_MODE", "scan") == "scan":
        # run all steps inside ONE jitted lax.scan: a single dispatch, so
        # host↔device dispatch latency (large through remote TPU tunnels)
        # does not pollute the device-rate measurement
        import jax.numpy as jnp

        def scan_steps(state, n):
            grad_fn = jax.value_and_grad(module._batch_loss, has_aux=True)

            def body(carry, _):
                (loss, _), grads = grad_fn(
                    carry.params, inputs, forcing, outputs,
                    batch.num_pred_steps, rng, graph,
                )
                return carry.apply_gradients(grads=grads), loss

            return jax.lax.scan(body, state, None, length=n)

        run = jax.jit(scan_steps, static_argnums=(1,))
        state, losses = run(state, n_steps)  # warmup compiles THIS length
        float(jnp.sum(losses))
        t0 = time.perf_counter()
        state, losses = run(state, n_steps)
        total = float(jnp.sum(losses))  # value transfer forces execution
        dt = time.perf_counter() - t0
        assert total == total
    else:
        # dispatch-per-step loop (includes host dispatch latency)
        for _ in range(3):
            state, loss = step_fn(state, inputs, forcing, outputs, rng, graph)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, loss = step_fn(state, inputs, forcing, outputs, rng, graph)
        float(loss)  # value transfer forces completion (block_until_ready
        # is unreliable through remote TPU tunnels)
        dt = time.perf_counter() - t0

    sps = n_steps * batch_size / dt
    print(
        json.dumps(
            {
                "metric": (
                    f"{model.lower()}_{grid[0]}x{grid[1]}"
                    f"_train_samples_per_sec_per_chip"
                ),
                "value": round(sps, 3),
                "unit": "samples/s",
                "vs_baseline": round(sps / BASELINE_SAMPLES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
