"""End-to-end RMSE parity artifact: identical training in JAX and torch.

The BASELINE.md north star is identical per-variable rollout RMSE. The
unit tests in tests/test_parity_reference.py pin every formula; this
script demonstrates the WHOLE chain: train a tiny HalfUNet on the dummy
dataset with this framework, then restate the IDENTICAL training loop in
plain torch — same initial weights (copied from the JAX init), same data
order, same scaled_ar rollout, same WeightedLoss(MSE), same AdamW +
warmup-cosine schedule (reference math anchors: losses.py:103-169,
lightning.py:442-467, 565-658) — and compare per-step train losses and
final per-variable test RMSE.

Writes <out>/parity_e2e.json and prints a summary; PARITY_E2E.md in the
repo root records a committed run.

Usage: python bin/parity_e2e.py [--steps 30] [--filters 8] [--out DIR]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/p4t_parity_e2e")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

from py4cast_tpu.datasets import get_datasets  # noqa: E402
from py4cast_tpu.losses import ScaledLoss  # noqa: E402
from py4cast_tpu.named_tensor import NamedArray  # noqa: E402
from py4cast_tpu.training import (  # noqa: E402
    AutoRegressiveModule,
    TrainingSettings,
)

GN_EPS = 1e-6  # flax nn.GroupNorm default; torch default is 1e-5


# --------------------------------------------------------------- torch side
class TorchParams:
    """Flax HalfUNet params re-expressed as torch leaf tensors.

    Layout mirrors the flax auto-naming for
    HalfUNet(use_ghost=False, bias=False, depth=4):
    ConvBlock_0..3 (encoder levels), ConvBlock_4 (post-sum block), each
    with Conv_0/GroupNorm_0/Conv_1/GroupNorm_1, then the 1x1 Conv_0.
    """

    def __init__(self, flax_params):
        p = flax_params["params"]
        self.leaves = []

        def t(arr, conv=False):
            a = np.asarray(arr)
            if conv:  # HWIO -> OIHW
                a = np.transpose(a, (3, 2, 0, 1))
            tt = torch.tensor(a, dtype=torch.float32, requires_grad=True)
            self.leaves.append(tt)
            return tt

        self.blocks = []
        for b in range(5):
            blk = p[f"ConvBlock_{b}"]
            self.blocks.append(
                [
                    (
                        t(blk[f"Conv_{i}"]["kernel"], conv=True),
                        t(blk[f"GroupNorm_{i}"]["scale"]),
                        t(blk[f"GroupNorm_{i}"]["bias"]),
                    )
                    for i in range(2)
                ]
            )
        self.head = t(p["Conv_0"]["kernel"], conv=True)


def torch_groups(c: int) -> int:
    g = 8
    while g > 1 and c % g != 0:
        g //= 2
    return g


def torch_halfunet(x_nhwc, tp: TorchParams, depth: int = 4):
    """Functional torch restatement of the flax HalfUNet forward
    (py4cast_tpu/models/unet.py:177-207), NCHW internally."""
    x = x_nhwc.permute(0, 3, 1, 2)

    def conv_block(h, block):
        for kernel, scale, bias in block:
            h = TF.conv2d(h, kernel, padding="same")
            h = TF.group_norm(h, torch_groups(kernel.shape[0]), scale, bias,
                              eps=GN_EPS)
            h = TF.relu(h)
        return h

    summed = None
    h = x
    for level in range(depth):
        if level > 0:
            h = TF.max_pool2d(h, 2)
        h = conv_block(h, tp.blocks[level])
        up = h
        for _ in range(level):
            up = up.repeat_interleave(2, dim=2).repeat_interleave(2, dim=3)
        summed = up if summed is None else summed + up
    y = conv_block(summed, tp.blocks[depth])
    y = TF.conv2d(y, tp.head)
    return y.permute(0, 2, 3, 1)


def torch_scaled_ar_step(tp, inputs, forcing, outputs, statics, border,
                         diff_mean, diff_std):
    """One scaled_ar prediction step (num_pred_steps=1, inter_steps=1) —
    reference lightning.py:565-658."""
    b = inputs.shape[0]
    interior = 1.0 - border
    x = torch.cat(
        [inputs[:, j] for j in range(inputs.shape[1])]
        + [statics.expand(b, -1, -1, -1), forcing[:, 0]],
        dim=-1,
    )
    y = torch_halfunet(x, tp)
    predicted = inputs[:, -1] + y * diff_std + diff_mean
    new_state = border * outputs[:, 0] + interior * predicted
    return new_state.unsqueeze(1)


def torch_weighted_mse(pred, target, interior_hw, weights):
    elem = (pred - target) ** 2
    weighted = torch.sum(elem * weights, dim=-1)
    denom = interior_hw.sum()
    return (torch.sum(weighted * interior_hw, dim=(2, 3)) / denom).mean()


# ----------------------------------------------------------------- driver
def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--filters", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--out", type=Path, default=Path("runs/parity_e2e"))
    args = ap.parse_args()

    torch.manual_seed(0)
    torch.set_num_threads(1)

    # three weather variables so "per-variable RMSE" is a real vector
    train_ds, _, test_ds = get_datasets(
        "dummy", 2, 1, 1,
        config_override={
            "params": {
                "dummy_parameter": {
                    "levels": [500, 850, 1000], "kind": "input_output"
                }
            }
        },
    )
    info = train_ds.dataset_info
    settings = TrainingSettings(
        model_name="HalfUNet",
        settings_init_args={"num_filters": args.filters, "depth": 4},
        training_strategy="scaled_ar",
        num_input_steps=2,
        learning_rate=1e-3,
        num_warmup_steps=5,
        precision="32",
    )
    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data_parallel=1), jax.local_devices()[:1])
    module = AutoRegressiveModule(settings, info, mesh=mesh)
    state = module.init_state(jax.random.key(0), num_training_steps=args.steps)

    # ---- stage identical batches once (same data order in both stacks)
    loader = train_ds.loader(
        batch_size=args.batch_size, num_workers=1, shuffle=False
    )
    batches = []
    it = iter(loader)
    while len(batches) < args.steps:
        try:
            batches.append(next(it))
        except StopIteration:
            it = iter(loader)
    batches = batches[: args.steps]

    # ---- snapshot the initial weights BEFORE training: train_step
    # donates the state, so the original buffers are invalidated
    init_params_host = jax.device_get(state.params)

    # ---- JAX training
    jax_losses = []
    st = state
    for batch in batches:
        st, loss = module.train_step(st, batch, jax.random.key(7))
        jax_losses.append(float(loss))

    # ---- torch restatement from the SAME initial weights
    tp = TorchParams(init_params_host)
    names = list(info.output_feature_names)
    weights_t = torch.tensor(
        [
            info.state_weights[n] / info.diff_stats[n]["std"] ** 2
            for n in names
        ],
        dtype=torch.float32,
    )
    statics_t = torch.tensor(
        np.asarray(info.statics.grid_statics.array, np.float32)
    )
    border_t = torch.tensor(np.asarray(info.statics.border_mask, np.float32))
    interior_hw = torch.tensor(
        np.asarray(info.statics.interior_mask, np.float32)
    ).squeeze(-1)
    diff_mean_t = torch.tensor(
        [info.diff_stats[n]["mean"] for n in names], dtype=torch.float32
    )
    diff_std_t = torch.tensor(
        [info.diff_stats[n]["std"] for n in names], dtype=torch.float32
    )

    # optax.adamw defaults: eps=1e-8, weight_decay=1e-4 — set explicitly
    # (torch AdamW defaults differ: weight_decay=1e-2)
    opt = torch.optim.AdamW(
        tp.leaves, lr=1.0, betas=settings.betas, eps=1e-8, weight_decay=1e-4
    )
    torch_losses = []
    for step, batch in enumerate(batches):
        inputs = torch.tensor(np.asarray(batch.inputs.array, np.float32))
        forcing = torch.tensor(np.asarray(batch.forcing.array, np.float32))
        outputs = torch.tensor(np.asarray(batch.outputs.array, np.float32))
        pred = torch_scaled_ar_step(
            tp, inputs, forcing, outputs, statics_t, border_t,
            diff_mean_t, diff_std_t,
        )
        loss = torch_weighted_mse(pred, outputs, interior_hw, weights_t)
        opt.zero_grad()
        loss.backward()
        # identical warmup-cosine LR trajectory, evaluated from the
        # module's own optax schedule
        lr = float(module._schedule(step))
        for g in opt.param_groups:
            g["lr"] = lr
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- per-variable test RMSE from the TRAINED weights, both stacks
    test_batch = next(iter(test_ds.loader(batch_size=8, num_workers=1)))
    preds_j, _ = module.eval_step(st, test_batch, jax.random.key(3))
    sl = ScaledLoss("MSELoss")
    sl.prepare(np.asarray(info.statics.interior_mask, np.float32), info, names)
    target_j = jnp.asarray(np.asarray(test_batch.outputs.array, np.float32))
    rmse_j = np.asarray(
        sl(
            NamedArray(preds_j, ("batch", "timestep", "lat", "lon", "features"), tuple(names)),
            NamedArray(target_j, ("batch", "timestep", "lat", "lon", "features"), tuple(names)),
            jnp.ones_like(target_j),
        )
    ).mean(axis=(0, 1))  # (F,) per-variable RMSE

    tp_trained = tp  # torch params were updated in place
    inputs = torch.tensor(np.asarray(test_batch.inputs.array, np.float32))
    forcing = torch.tensor(np.asarray(test_batch.forcing.array, np.float32))
    outputs = torch.tensor(np.asarray(test_batch.outputs.array, np.float32))
    with torch.no_grad():
        pred_t = torch_scaled_ar_step(
            tp_trained, inputs, forcing, outputs, statics_t, border_t,
            diff_mean_t, diff_std_t,
        )
        elem = (pred_t - outputs) ** 2
        denom = interior_hw.sum()
        mean_loss = torch.sum(
            elem * interior_hw.unsqueeze(-1), dim=(2, 3)
        ) / denom
        rmse_t = (
            torch.sqrt(mean_loss)
            * torch.tensor([info.stats[n]["std"] for n in names])
        ).mean(dim=(0, 1)).numpy()

    # ---- report
    jl = np.asarray(jax_losses)
    tl = np.asarray(torch_losses)
    rel = np.abs(jl - tl) / np.maximum(np.abs(tl), 1e-9)
    rmse_rel = np.abs(rmse_j - rmse_t) / np.maximum(np.abs(rmse_t), 1e-9)
    report = {
        "steps": args.steps,
        "filters": args.filters,
        "jax_losses": jl.tolist(),
        "torch_losses": tl.tolist(),
        "loss_rel_diff_max": float(rel.max()),
        "loss_rel_diff_final": float(rel[-1]),
        "rmse_per_variable_jax": {n: float(v) for n, v in zip(names, rmse_j)},
        "rmse_per_variable_torch": {n: float(v) for n, v in zip(names, rmse_t)},
        "rmse_rel_diff_max": float(rmse_rel.max()),
    }
    args.out.mkdir(parents=True, exist_ok=True)
    with open(args.out / "parity_e2e.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("losses")}, indent=1))
    ok = report["loss_rel_diff_max"] < 2e-2 and report["rmse_rel_diff_max"] < 5e-3
    print("PARITY", "OK" if ok else "DIVERGED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
