#!/usr/bin/env python
"""Segment-level timing study for the lattice GNN train step.

The bench (bench.py) reports whole-step throughput; this script answers
"where do the milliseconds go" without a TensorBoard UI: it times
scan-of-N programs for a matrix of configs and differentiates —
  * fwd+bwd+update vs fwd-only loss  -> backward/update share
  * processor_layers 0/2/4           -> per-processor-layer cost (the
    intercept is embed + g2m + m2g + decode, the grid-sized hops)
  * grid 500x500 vs 250x250          -> grid-sized vs mesh-sized split
Per-config XLA cost-analysis flops/bytes ride along so HBM-roofline
fractions can be computed per segment.

Usage: python bin/profile_gnn.py [HiLAM|GraphLAM]  (TPU; ~5 min warm)
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/p4t_xla_cache")

N_STEPS = int(os.environ.get("PROF_STEPS", "20"))


def build(model, grid, layers, levels=3):
    import jax

    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh
    from py4cast_tpu.testing import (
        synthetic_dataset_info,
        synthetic_device_arrays,
    )
    from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings

    info = synthetic_dataset_info(
        grid_shape=grid, weather_features=21, forcing_features=21
    )
    settings = TrainingSettings(
        model_name=model,
        settings_init_args={
            "hidden_dims": 64,
            "processor_layers": layers,
            "mesh_levels": levels,
        },
        training_strategy="scaled_ar",
        num_input_steps=2,
        precision="bf16",
        num_warmup_steps=10,
    )
    mesh = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    module = AutoRegressiveModule(settings, info, mesh=mesh)
    state = module.init_state(jax.random.key(0), num_training_steps=1000)
    inputs, forcing, outputs = synthetic_device_arrays(
        module, batch_size=1, num_pred_steps=1
    )
    return module, state, (inputs, forcing, outputs)


def timed(fn, args, label):
    """Compile a scan-of-N of fn and time the second run."""
    import jax
    import jax.numpy as jnp

    def scan_steps(*a):
        def body(carry, step_rng):
            out = fn(*a[:-1], step_rng, carry)
            return out, None

        carry, _ = jax.lax.scan(
            body, a[-1], jax.random.split(jax.random.key(1), N_STEPS)
        )
        return carry

    t0 = time.perf_counter()
    run = jax.jit(scan_steps).lower(*args).compile()
    compile_s = time.perf_counter() - t0
    ca = run.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    ca = ca or {}
    out = run(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # warm the data path
    # value transfer forces completion through the remote tunnel
    t0 = time.perf_counter()
    out = run(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    dt = time.perf_counter() - t0
    rec = {
        "label": label,
        "ms_per_step": round(dt / N_STEPS * 1e3, 2),
        "flops_G": round(float(ca.get("flops", 0.0)) / 1e9, 1),
        "bytes_GB": round(float(ca.get("bytes accessed", 0.0)) / 1e9, 3),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    import jax

    model = sys.argv[1] if len(sys.argv) > 1 else "HiLAM"
    print(f"# device: {jax.devices()[0].device_kind}", file=sys.stderr)

    for grid in ((500, 500), (250, 250)):
        for layers in (0, 2, 4):
            if layers == 0 and model == "HiLAM":
                continue  # HiLAM sweeps need >=1 layer
            try:
                module, state, batch = build(model, grid, max(layers, 1))
            except Exception as e:
                print(f"# build failed {grid} L{layers}: {e}", file=sys.stderr)
                continue
            inputs, forcing, outputs = batch
            buffers = module.step_buffers()

            import jax.numpy as jnp

            def train_step(inputs, forcing, outputs, buffers, rng, carry):
                state, _ = carry
                grad_fn = jax.value_and_grad(module._batch_loss, has_aux=True)
                (loss, _), grads = grad_fn(
                    state.params, inputs, forcing, outputs, 1, rng, buffers
                )
                return (state.apply_gradients(grads=grads), loss)

            def fwd_only(inputs, forcing, outputs, buffers, rng, carry):
                state, acc = carry
                loss, _ = module._batch_loss(
                    state.params, inputs, forcing, outputs, 1, rng, buffers
                )
                return (state, acc + loss)

            tag = f"{model}_{grid[0]}x{grid[1]}_L{layers}"
            carry0 = (state, jnp.float32(0))
            timed(
                train_step,
                (inputs, forcing, outputs, buffers, carry0),
                f"{tag}_trainstep",
            )
            timed(
                fwd_only,
                (inputs, forcing, outputs, buffers, carry0),
                f"{tag}_fwdloss",
            )


if __name__ == "__main__":
    main()
