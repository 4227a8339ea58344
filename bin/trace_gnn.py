#!/usr/bin/env python
"""Capture a device trace of a train step and print component-level and
op-level time breakdowns — no TensorBoard needed (the xplane protobuf is
parsed directly; tensorboard-plugin-profile's converters are broken with
the installed protobuf).

This is the tool that found the round-3 GNN wins: the per-layer residual
save/prefetch storm (-> scan-over-remat) and the m2g hop share.

Usage: python bin/trace_gnn.py [HiLAM] [500x500] [layers]
Env: TRACE_STEPS (default 5)
"""

import glob
import os
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/p4t_xla_cache")
# the plugin's generated protos predate protobuf 4; pure-python parsing works
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

TRACE_DIR = "/tmp/p4t_trace"


def component(op: str) -> str:
    bwd = "transpose(jvp())" in op
    lab = "other"
    for pat, l in (
        ("_lattice_m2g", "m2g"), ("_lattice_g2m", "g2m"),
        ("._m2g", "m2g"), ("._g2m", "g2m"),
        ("_lattice_embed", "embed"), ("_lattice_decode", "decode"),
        ("._embed", "embed"), ("._decode", "decode"),
        ("emb_", "edge_emb"), ("processor", "proc"), ("sweep", "proc"),
        ("encoder", "encoder"), ("decoder", "decoder"), ("bottleneck",
                                                         "bottleneck"),
        ("loss", "loss"), ("rollout", "rollout"), ("adam", "opt"),
    ):
        if pat in op:
            lab = l
            break
    return lab + ("/bwd" if bwd else "")


def summarize(xplane_path: str, n_steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    sp = xplane_pb2.XSpace()
    sp.ParseFromString(Path(xplane_path).read_bytes())
    for p in sp.planes:
        if "TPU" not in p.name:
            continue
        md, sm = p.event_metadata, p.stat_metadata
        for ln in p.lines:
            if ln.name != "XLA Ops":
                continue
            comp_t = defaultdict(float)
            op_t = defaultdict(float)
            for ev in ln.events:
                nm = md[ev.metadata_id].name
                if nm.startswith("%while"):  # envelope of inner events
                    continue
                tf_op = None
                for st in list(md[ev.metadata_id].stats) + list(ev.stats):
                    if sm[st.metadata_id].name == "tf_op":
                        tf_op = st.str_value or (
                            st.ref_value and sm[st.ref_value].name
                        )
                d = ev.duration_ps / 1e9 / n_steps
                comp_t[component(tf_op) if tf_op else "no-tfop"] += d
                key = (tf_op or nm)[-90:]
                op_t[key] += d
            total = sum(comp_t.values())
            print(f"\n== device time by component (ms/step; Σ={total:.2f}) ==")
            for c, t in sorted(comp_t.items(), key=lambda kv: -kv[1]):
                if t > 0.03:
                    print(f"{c:<14}{t:7.3f}")
            print("\n== top ops ==")
            for c, t in sorted(op_t.items(), key=lambda kv: -kv[1])[:25]:
                if t > 0.1:
                    print(f"{t:7.3f}  {c}")


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
    n_steps = int(os.environ.get("TRACE_STEPS", "5"))
    batch = int(os.environ.get("TRACE_BATCH", "1"))

    is_graph = model in ("HiLAM", "GraphLAM", "HiLAMParallel")
    init_args = (
        {"hidden_dims": 64, "processor_layers": layers, "mesh_levels": 3}
        if is_graph
        else {}
    )
    info = synthetic_dataset_info(
        grid_shape=grid, weather_features=21, forcing_features=21
    )
    settings = TrainingSettings(
        model_name=model,
        settings_init_args=init_args,
        training_strategy="scaled_ar",
        num_input_steps=2,
        precision="bf16",
        num_warmup_steps=10,
    )
    mesh = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    module = AutoRegressiveModule(settings, info, mesh=mesh)
    state = module.init_state(jax.random.key(0), num_training_steps=1000)
    inputs, forcing, outputs = synthetic_device_arrays(
        module, batch_size=batch, num_pred_steps=1
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
    st, loss = run(state, inputs, forcing, outputs, rng, buffers)
    float(loss)
    print("# warmed; tracing...", file=sys.stderr, flush=True)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(n_steps):
            st, loss = run(st, inputs, forcing, outputs, rng, buffers)
        float(loss)

    planes = sorted(
        glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True),
        key=os.path.getmtime,
    )
    if not planes:
        print("NO xplane captured", file=sys.stderr)
        return
    print(f"# xplane: {planes[-1]}", file=sys.stderr)
    summarize(planes[-1], n_steps)


if __name__ == "__main__":
    main()
