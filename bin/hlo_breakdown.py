#!/usr/bin/env python
"""Dump the optimized HLO of one GNN train step and rank instructions
by result bytes — the poor man's profiler for finding which backward
ops move the HBM gigabytes (no TensorBoard needed through the tunnel).

Usage: python bin/hlo_breakdown.py [HiLAM] [500x500] [layers]
Writes the full HLO to /tmp/hlo_<model>.txt and prints a byte-ranked
opcode/fusion summary.
"""

import os
import re
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # lowering only — no TPU needed

DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}
SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


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
        int(v) for v in (sys.argv[2] if len(sys.argv) > 2 else "500x500").split("x")
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

    def train_step(state, inputs, forcing, outputs, rng, buffers):
        grad_fn = jax.value_and_grad(module._batch_loss, has_aux=True)
        (loss, _), grads = grad_fn(
            state.params, inputs, forcing, outputs, 1, rng, buffers
        )
        return state.apply_gradients(grads=grads), loss

    rng = jax.random.key(1)
    compiled = (
        jax.jit(train_step)
        .lower(state, inputs, forcing, outputs, rng, buffers)
        .compile()
    )
    hlo = compiled.as_text()
    out_path = f"/tmp/hlo_{model.lower()}_{grid[0]}x{grid[1]}_L{layers}.txt"
    Path(out_path).write_text(hlo)
    print(f"# optimized HLO -> {out_path} ({len(hlo) / 1e6:.1f} MB)")

    # rank instructions by result bytes; group by opcode
    by_op = defaultdict(lambda: [0, 0])  # opcode -> [bytes, count]
    insts = []
    # which computations are while-loop bodies (scan) — their ops run
    # per-iteration but appear once; flag them
    inst_re = re.compile(
        r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\([^)]*\)|\S+)\s+([\w\-]+)\("
    )
    for line in hlo.splitlines():
        m = inst_re.match(line)
        if not m:
            continue
        name, shape_txt, opcode = m.groups()
        if opcode in ("parameter", "constant", "tuple", "get-tuple-element",
                      "bitcast"):
            continue
        b = shape_bytes(shape_txt)
        by_op[opcode][0] += b
        by_op[opcode][1] += 1
        if b > 8e6:
            insts.append((b, opcode, name, line.strip()[:160]))

    print("\n== result bytes by opcode ==")
    for op, (b, c) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:15]:
        print(f"{op:<22} {b / 1e9:8.3f} GB  ({c} ops)")

    print("\n== biggest instructions (>8 MB result) ==")
    for b, opcode, name, line in sorted(insts, reverse=True)[:40]:
        print(f"{b / 1e6:9.1f} MB  {line}")


if __name__ == "__main__":
    main()
