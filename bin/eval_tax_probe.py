#!/usr/bin/env python
"""Eval-path host-tax probe (VERDICT r4 #9): what does a validation
batch cost ON TOP of the jitted eval_step at the bench grid?

The reference pays a per-val-batch `.cpu()` tax in its plotters
(reference: py4cast/lightning.py:864-989 pulls predictions to host for
every registered plotter). Our Trainer feeds plotters/metrics through
``named_eval_arrays`` (training.py), which unpads on device but
rebuilds the target from the host batch. This probe measures each
component per batch at the 512x640x21 bench grid so "the tax is X% of
eval" is a number, not a guess.

Components timed per batch (median of --iters):
  eval_step   jitted rollout + per-step loss (device, blocked)
  arrays      named_eval_arrays: unpad + target upload + mask
  metrics     psd_k/psd_var/acc functional updates (device, blocked)
  plotters    StateErrorPlot/PredictionTimestep/Epoch .update (host)

Run on the chip:  python bin/eval_tax_probe.py [model] [batch] [T]
"""

import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/py4cast_tpu_bench")


def main():
    import jax

    import bench
    from py4cast_tpu.plots import (
        PredictionEpochPlot,
        PredictionTimestepPlot,
        StateErrorPlot,
    )
    from py4cast_tpu.settings import enable_compilation_cache
    from py4cast_tpu.testing import synthetic_batch

    enable_compilation_cache()
    model = sys.argv[1] if len(sys.argv) > 1 else "HalfUNet"
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    num_pred_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    iters = int(os.environ.get("EVAL_TAX_ITERS", "8"))

    grid, init_args = bench.CONFIGS.get(
        model, bench.ZOO_CONFIGS.get(model, ((512, 640), {}))
    )

    def phase(label):
        print(f"# {label}", file=sys.stderr, flush=True)

    module, state = bench._get_module_state(
        model, grid, init_args, "bf16", False, 21, 21, phase
    )
    batch = synthetic_batch(
        module.dataset_info, batch_size=batch_size,
        num_input_steps=module.settings.num_input_steps,
        num_pred_steps=num_pred_steps,
    )
    save_path = Path(tempfile.mkdtemp(prefix="eval_tax_"))
    metrics = module.make_metrics(save_path, num_pred_steps)
    metric_states = {k: m.init_state() for k, m in metrics.items()}
    plotters = [
        StateErrorPlot({"mae": module.make_scaled_loss("mae")},
                       prefix="Validation", save_path=save_path),
        PredictionTimestepPlot(num_samples_to_plot=1,
                               num_features_to_plot=4,
                               prefix="Validation", save_path=save_path),
        PredictionEpochPlot(num_samples_to_plot=1, num_features_to_plot=4,
                            prefix="Validation", save_path=save_path),
    ]
    module.current_epoch = 0

    rng = jax.random.key(0)

    def block(tree):
        # through a remote-TPU tunnel block_until_ready is unreliable
        # (see bench.py) — force completion with ONE scalar transfer
        # that depends on every device leaf (in-order execution makes
        # it a barrier; the reduce itself is sub-ms)
        import jax.numpy as jnp

        leaves = [x for x in jax.tree_util.tree_leaves(tree)
                  if isinstance(x, jax.Array) and x.size]
        # one THIN scalar read per leaf (an index, not a reshape) and a
        # single blocking transfer for the whole tree — the dispatches
        # are async, so the barrier costs ~one tunnel round-trip total
        if leaves:
            float(sum((x if x.ndim == 0 else x[(0,) * x.ndim])
                      .astype(jnp.float32)
                      for x in leaves))

    # ---- warmup (compiles eval_step + metric updates)
    preds, per_step = module.eval_step(state, batch, rng)
    block((preds, per_step))
    phase("warmup: eval_step compiled")
    pred_na, target_na, mask = module.named_eval_arrays(preds, batch)
    block((pred_na.array, target_na.array, mask))
    phase("warmup: arrays")
    for k, m in metrics.items():
        metric_states[k] = m.update(
            metric_states[k], pred_na.array, target_na.array, mask)
        block(metric_states[k])
        phase(f"warmup: metric {k} compiled")
    for p in plotters:
        p.update(module, batch, pred_na, target_na, mask)
        phase(f"warmup: plotter {type(p).__name__}")
    phase("warmup done (everything compiled)")

    times = {"eval_step": [], "arrays": [], "metrics": [], "plotters": []}
    for i in range(iters):
        rng, step_rng = jax.random.split(rng)
        t0 = time.perf_counter()
        preds, per_step = module.eval_step(state, batch, step_rng)
        block((preds, per_step))
        t1 = time.perf_counter()
        pred_na, target_na, mask = module.named_eval_arrays(preds, batch)
        block((pred_na.array, target_na.array, mask))
        t2 = time.perf_counter()
        for k, m in metrics.items():
            metric_states[k] = m.update(
                metric_states[k], pred_na.array, target_na.array, mask)
        block(metric_states)
        t3 = time.perf_counter()
        for p in plotters:
            p.update(module, batch, pred_na, target_na, mask)
        t4 = time.perf_counter()
        times["eval_step"].append(t1 - t0)
        times["arrays"].append(t2 - t1)
        times["metrics"].append(t3 - t2)
        times["plotters"].append(t4 - t3)

    med = {k: statistics.median(v) for k, v in times.items()}
    tax = med["arrays"] + med["metrics"] + med["plotters"]
    out = {
        "model": model,
        "grid": list(grid),
        "batch_size": batch_size,
        "num_pred_steps": num_pred_steps,
        "iters": iters,
        **{f"{k}_ms": round(v * 1e3, 2) for k, v in med.items()},
        "tax_ms": round(tax * 1e3, 2),
        "tax_vs_eval": round(tax / max(med["eval_step"], 1e-9), 3),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
