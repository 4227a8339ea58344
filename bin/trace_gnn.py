#!/usr/bin/env python
"""Capture a device trace of the GNN train step and print an op-level
time breakdown (tensorboard-plugin-profile's op_profile, parsed here —
no TensorBoard UI needed).

Usage: python bin/trace_gnn.py [HiLAM] [500x500] [layers]
"""

import glob
import gzip
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/p4t_xla_cache")

TRACE_DIR = "/tmp/p4t_trace"


def main():
    import jax

    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh
    from py4cast_tpu.testing import (
        synthetic_dataset_info,
        synthetic_device_arrays,
    )
    from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings

    model = sys.argv[1] if len(sys.argv) > 1 else "HiLAM"
    grid = tuple(
        int(v)
        for v in (sys.argv[2] if len(sys.argv) > 2 else "500x500").split("x")
    )
    layers = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    info = synthetic_dataset_info(
        grid_shape=grid, weather_features=21, forcing_features=21
    )
    settings = TrainingSettings(
        model_name=model,
        settings_init_args={
            "hidden_dims": 64, "processor_layers": layers, "mesh_levels": 3,
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
    buffers = module.step_buffers()
    rng = jax.random.key(1)

    def train_step(state, inputs, forcing, outputs, rng, buffers):
        grad_fn = jax.value_and_grad(module._batch_loss, has_aux=True)
        (loss, _), grads = grad_fn(
            state.params, inputs, forcing, outputs, 1, rng, buffers
        )
        return state.apply_gradients(grads=grads), loss

    run = (
        jax.jit(train_step)
        .lower(state, inputs, forcing, outputs, rng, buffers)
        .compile()
    )
    # warm
    st, loss = run(state, inputs, forcing, outputs, rng, buffers)
    float(loss)
    print("# warmed; tracing...", file=sys.stderr, flush=True)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            st, loss = run(st, inputs, forcing, outputs, rng, buffers)
        float(loss)

    planes = sorted(
        glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True),
        key=os.path.getmtime,
    )
    if not planes:
        print("NO xplane captured", file=sys.stderr)
        return
    xplane = planes[-1]
    print(f"# xplane: {xplane} ({os.path.getsize(xplane) / 1e6:.1f} MB)",
          file=sys.stderr)

    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    for tool in ("op_profile", "framework_op_stats^", "trace_viewer"):
        try:
            data, _ = rtd.xspace_to_tool_data([xplane], tool, {})
        except Exception as e:
            print(f"# {tool}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        out = f"/tmp/p4t_{tool.strip('^')}.json"
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data)
            except Exception:
                pass
            Path(out).write_bytes(data)
        else:
            Path(out).write_text(data)
        print(f"# wrote {out}", file=sys.stderr)

    # summarize op_profile if we got it
    opp = Path("/tmp/p4t_op_profile.json")
    if opp.exists():
        d = json.loads(opp.read_text())

        def walk(node, depth=0, out=None):
            m = node.get("metrics", {})
            name = node.get("name", "?")
            t = m.get("time", 0) or m.get("timeFraction", 0)
            out.append((t, depth, name, m))
            for ch in node.get("children", [])[:40]:
                if depth < 3:
                    walk(ch, depth + 1, out)

        root = d.get("byProgram") or d.get("byCategory") or {}
        rows = []
        walk(root, 0, rows)
        for t, depth, name, m in rows[:80]:
            print("  " * depth + f"{name[:90]}  time={t}")


if __name__ == "__main__":
    main()
