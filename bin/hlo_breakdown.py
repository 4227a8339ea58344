#!/usr/bin/env python
"""Dump the optimized HLO of one train step (any zoo model) and rank
instructions by result bytes — the poor man's profiler for finding which
backward ops move the HBM gigabytes (no TensorBoard needed through the
tunnel).

Usage: python bin/hlo_breakdown.py [model|dump.txt] [HxW] [gnn_layers]
- model: any bench.CONFIGS / bench.ZOO_CONFIGS name (settings come from
  there); default HiLAM. gnn_layers overrides processor_layers and only
  applies to the GNN models.
- dump.txt: an already-dumped HLO text file → offline re-rank only (no
  lowering), with both logical and lane-padded byte columns.
Writes the full HLO to /tmp/hlo_<model>.txt and prints a byte-ranked
opcode/fusion summary (logical + tile-padded bytes per row).
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
SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([\d,]+)(?::T\((\d+),(\d+)\))?[:})]?)?")


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def shape_bytes(text: str, padded: bool = False) -> int:
    """Sum result bytes of every shape in an HLO line.

    padded=True models the TPU memory tiling: the physically-minor dim
    (taken from the HLO layout permutation ``{2,3,1,0:T(8,128)...}``
    when present — XLA's layout assignment routinely picks a non-default
    minor dim to dodge small-dim padding) is padded to 128 lanes and the
    second-minor to a (32 // dtype_bytes)-row sublane tile. Logical
    bytes (default) match XLA's cost estimate; the padded figure is what
    actually occupies/streams HBM for that layout, so the ratio exposes
    tensors whose real traffic the logical estimate undercounts.
    """
    total = 0
    for dt, dims, perm, tsub, tlane in SHAPE_RE.findall(text):
        if dt not in DTYPE_BYTES:
            continue
        bpe = DTYPE_BYTES[dt]
        ds = [int(d) for d in dims.split(",") if d]
        if not padded or not ds:
            n = 1
            for d in ds:
                n *= d
            total += n * bpe
            continue
        # tile from the layout when printed (e.g. T(2,128)); default to
        # the packed-dtype tile (f32 (8,128), bf16 (16,128), s8 (32,128))
        lane = int(tlane) if tlane else 128
        sub = int(tsub) if tsub else 32 // min(bpe, 4)
        if tsub and bpe < 4:
            sub *= 4 // bpe  # T(8,128)(2,1) packs 2 bf16 rows per word row
        order = (
            [int(p) for p in perm.split(",")]
            if perm
            else list(range(len(ds) - 1, -1, -1))
        )
        pd = list(ds)
        if len(order) == len(ds) and sorted(order) == list(range(len(ds))):
            minor = order[0]
            pd[minor] = _ceil_to(pd[minor], lane)
            if len(order) >= 2:
                pd[order[1]] = _ceil_to(pd[order[1]], sub)
            else:
                pd[minor] = _ceil_to(pd[minor], lane * sub)
        n = 1
        for d in pd:
            n *= d
        total += n * bpe
    return total


def main():
    if len(sys.argv) > 1 and sys.argv[1].endswith(".txt"):
        # offline mode: re-rank an already-dumped HLO text (from a prior
        # run of this tool) without re-lowering — lowering a train step
        # takes minutes on this 1-core host
        analyze(Path(sys.argv[1]).read_text())
        return

    import jax

    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh
    from py4cast_tpu.testing import (
        synthetic_dataset_info,
        synthetic_device_arrays,
    )
    from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings

    model = sys.argv[1] if len(sys.argv) > 1 else "HiLAM"
    # model settings come from the bench config tables (the reference
    # yaml configs) so the breakdown attributes the SAME program the
    # bench times; GNNs keep the historical layers CLI override.
    import bench

    default_grid, init_args = bench.CONFIGS.get(
        model, bench.ZOO_CONFIGS.get(model, ((512, 640), {}))
    )
    init_args = dict(init_args)
    grid = (
        tuple(int(v) for v in sys.argv[2].split("x"))
        if len(sys.argv) > 2
        else tuple(default_grid)
    )
    if len(sys.argv) > 3 and "processor_layers" in init_args:
        init_args["processor_layers"] = int(sys.argv[3])

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
    out_path = f"/tmp/hlo_{model.lower()}_{grid[0]}x{grid[1]}.txt"
    Path(out_path).write_text(hlo)
    print(f"# optimized HLO -> {out_path} ({len(hlo) / 1e6:.1f} MB)")
    analyze(hlo)


def analyze(hlo: str):
    # rank instructions by result bytes; group by opcode
    by_op = defaultdict(lambda: [0, 0])  # opcode -> [bytes, count]
    by_pad = defaultdict(int)  # opcode -> lane-padded bytes
    insts = []
    # which computations are while-loop bodies (scan) — their ops run
    # per-iteration but appear once; flag them
    # the shape text may be a tuple whose layouts contain parens
    # (T(8,128)(2,1)), so match non-greedily up to the opcode: a
    # lowercase word directly followed by '(' — layout annotations are
    # never preceded by whitespace, so this never fires inside a shape
    inst_re = re.compile(
        r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*?)\s+([a-z][\w\-]*)\("
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
        bp = shape_bytes(shape_txt, padded=True)
        by_op[opcode][0] += b
        by_op[opcode][1] += 1
        by_pad[opcode] += bp
        if b > 8e6 or bp > 24e6:
            insts.append((bp, b, opcode, name, line.strip()[:160]))

    print("\n== result bytes by opcode (logical | lane-padded) ==")
    tot_b = sum(v[0] for v in by_op.values())
    tot_p = sum(by_pad.values())
    for op, (b, c) in sorted(by_op.items(), key=lambda kv: -by_pad[kv[0]])[:15]:
        print(f"{op:<22} {b / 1e9:8.3f} | {by_pad[op] / 1e9:8.3f} GB  ({c} ops)")
    print(f"{'TOTAL':<22} {tot_b / 1e9:8.3f} | {tot_p / 1e9:8.3f} GB "
          f"(padding x{tot_p / max(tot_b, 1):.2f})")

    print("\n== biggest instructions (by padded result bytes) ==")
    for bp, b, opcode, name, line in sorted(insts, reverse=True)[:40]:
        print(f"{b / 1e6:9.1f} | {bp / 1e6:9.1f} MB  {line}")


if __name__ == "__main__":
    main()
