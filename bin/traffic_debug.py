#!/usr/bin/env python
"""Attribute the padded HBM-traffic model (ops/hlo_bytes.py) for one
train-step program: per-computation totals with trip counts, and the
biggest single contributors — the triage tool for roofline fractions
that land above 1.0.

Usage: python bin/traffic_debug.py [model] [batch] [num_pred_steps]
Model settings come from bench.CONFIGS / bench.ZOO_CONFIGS.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/p4t_xla_cache")


def main():
    import jax

    import bench
    from py4cast_tpu.ops.hlo_bytes import (
        TrafficModel,
        _ATTR_REF,
        _trip_count,
        hbm_traffic_bytes,
        parse_hlo,
        shape_bytes,
    )
    from py4cast_tpu.settings import enable_compilation_cache
    from py4cast_tpu.testing import synthetic_device_arrays

    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "HiLAM"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_pred = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    grid, init_args = bench.CONFIGS.get(
        model, bench.ZOO_CONFIGS.get(model, ((512, 640), {}))
    )
    module, state = bench._get_module_state(
        model, grid, init_args, "bf16", False, 21, 21,
        lambda l: print(f"# {l}", file=sys.stderr),
    )
    inputs, forcing, outputs = synthetic_device_arrays(
        module, batch_size=batch, num_pred_steps=n_pred
    )
    buffers = module.step_buffers()
    rng = jax.random.key(1)

    def one_step(state, inputs, forcing, outputs, rng, buffers):
        grad_fn = jax.value_and_grad(module._batch_loss, has_aux=True)
        (loss, _), grads = grad_fn(
            state.params, inputs, forcing, outputs, n_pred, rng, buffers
        )
        return state.apply_gradients(grads=grads), loss

    run = (
        jax.jit(one_step)
        .lower(state, inputs, forcing, outputs, rng, buffers)
        .compile()
    )
    ca = run.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    hlo = run.as_text()
    dump = f"/tmp/hlo_{model.lower()}_b{batch}_p{n_pred}.txt"
    Path(dump).write_text(hlo)
    print(f"# HLO -> {dump} ({len(hlo) / 1e6:.1f} MB)")
    print(f"XLA bytes accessed: {float(ca.get('bytes accessed', 0)) / 1e9:.2f} GB")
    total = hbm_traffic_bytes(hlo)
    print(f"model padded+hbm:   {total / 1e9:.2f} GB")

    comps = parse_hlo(hlo)
    m = TrafficModel(comps)
    entry = next(c for c in comps.values() if c.is_entry)
    m.computation(entry.name)

    # per-computation totals with trips from their call sites
    trips = {}
    for comp in comps.values():
        for ins in comp.instrs:
            if ins.opcode == "while":
                cm = _ATTR_REF["condition"].search(ins.attrs)
                bm = _ATTR_REF["body"].search(ins.attrs)
                if cm and bm:
                    trips[bm.group(1)] = _trip_count(comps[cm.group(1)])
    print("\n== per-computation (per_iter | amortized | trips) ==")
    rows = []
    for name, t in m._memo.items():
        if t.once > 0:
            k = trips.get(name, 1)
            rows.append((t.per_iter * k + t.amortized, name, t, k))
    for total_c, name, t, k in sorted(rows, reverse=True)[:12]:
        print(f"{total_c / 1e9:9.2f} GB  {name[:60]:<62} "
              f"({t.per_iter / 1e9:.2f} | {t.amortized / 1e9:.2f} | x{k})")

    print("\n== biggest instructions in the hottest computation ==")
    hot = max(rows)[1] if rows else entry.name
    comp = comps[hot]
    defs = {i.name: i.shape_text for i in comp.instrs}
    insts = []
    for ins in comp.instrs:
        if ins.opcode in ("parameter", "constant", "tuple",
                          "get-tuple-element", "bitcast"):
            continue
        res = shape_bytes(ins.shape_text, padded=True, hbm_only=True)
        ops = sum(
            shape_bytes(defs.get(n, ""), padded=True, hbm_only=True)
            for n in ins.operands
        )
        insts.append((res + ops, res, ops, ins.opcode, ins.name[:55],
                      ins.shape_text[:80]))
    for tot, res, ops, opc, name, st in sorted(insts, reverse=True)[:20]:
        print(f"{tot / 1e6:9.1f} MB (r{res / 1e6:8.1f}+o{ops / 1e6:8.1f}) "
              f"{opc:<14} {name:<57} {st}")


if __name__ == "__main__":
    main()
