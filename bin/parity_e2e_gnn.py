"""End-to-end RMSE parity artifact for the LATTICE GNN redesign:
identical training in JAX and torch on a tiny GraphLAM.

bin/parity_e2e.py audits the conv chain; this script audits the most
semantically daring part of the build — the lattice-form message
passing (py4cast_tpu/models/graph.py) — end to end. The JAX side trains
GraphLAM through the framework on its DEFAULT lattice fast path
(use_lattice=True: stencil shifts + separable selection matmuls). The
torch side restates the SAME model in classic gather/scatter table form
(the reference's neural-lam idiom, reference mfai GNN contract:
SURVEY.md §2.2; rollout/loss math anchors: lightning.py:565-658,
losses.py:103-169) from the same initial weights, same data order, same
scaled_ar rollout, same WeightedLoss(MSE), same AdamW + warmup-cosine
schedule. Matching per-step losses and final per-variable RMSE therefore
certify lattice-path == table-path == independent-torch across a full
training trajectory, not just a single forward
(tests/test_lattice_graph.py).

Writes <out>/parity_e2e_gnn.json; PARITY_E2E.md records a committed run.

Usage: python bin/parity_e2e_gnn.py [--steps 30] [--hidden 16] [--out DIR]
"""

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", "/tmp/p4t_parity_e2e_gnn")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as TF  # noqa: E402

from py4cast_tpu.datasets import get_datasets  # noqa: E402
from py4cast_tpu.training import (  # noqa: E402
    AutoRegressiveModule,
    TrainingSettings,
)

LN_EPS = 1e-6  # flax nn.LayerNorm default; torch default is 1e-5


# --------------------------------------------------------------- torch side
class TorchTree:
    """The flax GraphLAM param tree as torch leaf tensors (same nesting)."""

    def __init__(self, flax_params):
        self.leaves = []

        def conv(node):
            if isinstance(node, dict):
                return {k: conv(v) for k, v in node.items()}
            t = torch.tensor(np.asarray(node), dtype=torch.float32,
                             requires_grad=True)
            self.leaves.append(t)
            return t

        self.p = conv(flax_params["params"])


def dense(x, p):
    y = x @ p["kernel"]
    return y + p["bias"] if "bias" in p else y


def layer_norm(x, p):
    return TF.layer_norm(x, (x.shape[-1],), p["scale"], p["bias"], eps=LN_EPS)


def mlp(x, p, ln=True):
    """models/graph.py::MLP at hidden_layers=1."""
    x = TF.silu(dense(x, p["Dense_0"]))
    x = dense(x, p["Dense_1"])
    return layer_norm(x, p["LayerNorm_0"]) if ln else x


def scatter_sum(e, dst, n_dst):
    b, _, h = e.shape
    return torch.zeros(b, n_dst, h, dtype=e.dtype).index_add(1, dst, e)


def edge_message(v_src, v_dst, e, src, dst, p, n_dst):
    """models/graph.py::EdgeMessage (hidden_layers=1, aggr=sum) in
    gather/scatter form: e' = LN(out(silu(W_e e + W_s v[src] + W_d v[dst]))),
    agg = scatter-sum by destination."""
    pre = (dense(e, p["w_e"]) + dense(v_src, p["w_s"])[:, src]
           + dense(v_dst, p["w_d"])[:, dst])
    e_new = layer_norm(dense(TF.silu(pre), p["out"]), p["ln"])
    return e_new, scatter_sum(e_new, dst, n_dst)


def interaction(v, e, src, dst, p):
    """models/graph.py::InteractionNetwork (mesh-intra form, v_src==v_dst)."""
    e_new, agg = edge_message(v, v, e, src, dst, p["edge"], v.shape[1])
    v_new = mlp(torch.cat([v, agg], dim=-1), p["node"])
    return v + v_new, e + e_new


def encode_decode(v_src, v_dst, feats, src, dst, p):
    """models/graph.py::EncodeDecodeInteraction (g2m / m2g hops)."""
    pre = (dense(feats, p["w_f"])[None] + dense(v_src, p["w_s"])[:, src]
           + dense(v_dst, p["w_d"])[:, dst])
    agg = scatter_sum(
        layer_norm(dense(TF.silu(pre), p["out"]), p["ln"]), dst, v_dst.shape[1]
    )
    return v_dst + mlp(torch.cat([v_dst, agg], dim=-1), p["node"])


def torch_graphlam(x, tp, tables, n_layers):
    """Functional torch restatement of the GraphLAM forward
    (models/graph.py:1370-1410): embed -> g2m -> scanned multimesh
    processor -> m2g -> decode, on the level-0 multimesh node set."""
    p = tp.p
    b = x.shape[0]
    grid_v = mlp(x, p["grid_embed"])
    mesh_v0 = mlp(tables["mesh_pos_0"], p["mesh_embed_0"])[None].expand(
        b, -1, -1
    )
    v0 = encode_decode(
        grid_v, mesh_v0, tables["g2m_feats"], tables["g2m_src"],
        tables["g2m_dst"], p["g2m"],
    )
    e = mlp(tables["multi_feats"], p["mesh_edge_embed"])[None].expand(
        b, -1, -1
    )
    for layer in range(n_layers):
        # the flax side scans over stacked per-layer params: slice layer l
        pl = jax.tree_util.tree_map(lambda t: t[layer], p["processor"]["block"])
        v0, e = interaction(v0, e, tables["multi_src"], tables["multi_dst"], pl)
    grid_out = encode_decode(
        v0, grid_v, tables["m2g_feats"], tables["m2g_src"], tables["m2g_dst"],
        p["m2g"],
    )
    return mlp(grid_out, p["decoder"], ln=False)


def torch_scaled_ar_step(tp, tables, n_layers, inputs, forcing, outputs,
                         statics, border, diff_mean, diff_std):
    """One scaled_ar step on flattened (B, ngrid, F) tensors
    (rollout.py semantics; reference lightning.py:565-658)."""
    b = inputs.shape[0]
    interior = 1.0 - border
    x = torch.cat(
        [inputs[:, j] for j in range(inputs.shape[1])]
        + [statics.expand(b, -1, -1), forcing[:, 0]],
        dim=-1,
    )
    y = torch_graphlam(x, tp, tables, n_layers)
    predicted = inputs[:, -1] + y * diff_std + diff_mean
    return (border * outputs[:, 0] + interior * predicted).unsqueeze(1)


def torch_weighted_mse(pred, target, interior_n, weights):
    elem = (pred - target) ** 2
    weighted = torch.sum(elem * weights, dim=-1)
    denom = interior_n.sum()
    return (torch.sum(weighted * interior_n, dim=2) / denom).mean()


# ----------------------------------------------------------------- driver
def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--out", type=Path, default=Path("runs/parity_e2e_gnn"))
    args = ap.parse_args()

    torch.manual_seed(0)
    torch.set_num_threads(1)

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
        model_name="GraphLAM",
        settings_init_args={
            "hidden_dims": args.hidden, "hidden_layers": 1,
            "processor_layers": args.layers, "mesh_levels": 2,
            "coarsen_factor": 4,
        },
        training_strategy="scaled_ar",
        num_input_steps=2,
        learning_rate=1e-3,
        num_warmup_steps=5,
        precision="32",
    )
    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data_parallel=1), jax.local_devices()[:1])
    module = AutoRegressiveModule(settings, info, mesh=mesh)
    assert module.model._lattice_on(need_multi=True), (
        "the JAX side must exercise the lattice fast path — that is the "
        "code under audit"
    )
    state = module.init_state(jax.random.key(0), num_training_steps=args.steps)

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

    # snapshot initial weights BEFORE training (train_step donates state)
    init_params_host = jax.device_get(state.params)

    # ---- JAX training on the lattice path
    jax_losses = []
    st = state
    for batch in batches:
        st, loss = module.train_step(st, batch, jax.random.key(7))
        jax_losses.append(float(loss))

    # ---- torch restatement in table form from the SAME initial weights
    g = module.model.graph
    garr = type(module.model).graph_arrays(g)
    tables = {}
    for key in ("mesh_pos_0", "g2m_feats", "multi_feats", "m2g_feats"):
        tables[key] = torch.tensor(np.asarray(garr[key], np.float32))
    for key in ("g2m_src", "g2m_dst", "multi_src", "multi_dst", "m2g_src",
                "m2g_dst"):
        tables[key] = torch.tensor(np.asarray(garr[key], np.int64))

    tp = TorchTree(init_params_host)
    names = list(info.output_feature_names)
    weights_t = torch.tensor(
        [info.state_weights[n] / info.diff_stats[n]["std"] ** 2 for n in names],
        dtype=torch.float32,
    )
    flat = info.statics.flatten_spatial()
    statics_t = torch.tensor(np.asarray(flat.grid_statics.array, np.float32))
    border_t = torch.tensor(np.asarray(flat.border_mask, np.float32))
    interior_n = torch.tensor(
        np.asarray(flat.interior_mask, np.float32)
    ).squeeze(-1)
    diff_mean_t = torch.tensor(
        [info.diff_stats[n]["mean"] for n in names], dtype=torch.float32
    )
    diff_std_t = torch.tensor(
        [info.diff_stats[n]["std"] for n in names], dtype=torch.float32
    )

    def flat_bt(arr):  # (B, T, lat, lon, F) -> (B, T, ngrid, F)
        a = np.asarray(arr, np.float32)
        return torch.tensor(a.reshape(a.shape[0], a.shape[1], -1, a.shape[-1]))

    opt = torch.optim.AdamW(
        tp.leaves, lr=1.0, betas=settings.betas, eps=1e-8, weight_decay=1e-4
    )
    torch_losses = []
    for step, batch in enumerate(batches):
        pred = torch_scaled_ar_step(
            tp, tables, args.layers, flat_bt(batch.inputs.array),
            flat_bt(batch.forcing.array), flat_bt(batch.outputs.array),
            statics_t, border_t, diff_mean_t, diff_std_t,
        )
        loss = torch_weighted_mse(
            pred, flat_bt(batch.outputs.array), interior_n, weights_t
        )
        opt.zero_grad()
        loss.backward()
        lr = float(module._schedule(step))
        for grp in opt.param_groups:
            grp["lr"] = lr
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- per-variable test RMSE from the TRAINED weights, both stacks
    test_batch = next(iter(test_ds.loader(batch_size=8, num_workers=1)))
    preds_j, _ = module.eval_step(st, test_batch, jax.random.key(3))
    target = np.asarray(test_batch.outputs.array, np.float32).reshape(
        *np.asarray(test_batch.outputs.array).shape[:2], -1,
        len(names),
    )
    int_np = np.asarray(flat.interior_mask, np.float32).squeeze(-1)
    stds = np.asarray([info.stats[n]["std"] for n in names], np.float32)

    def per_var_rmse(preds):
        mse = (np.asarray(preds, np.float32) - target) ** 2
        mean = (mse * int_np[None, None, :, None]).sum(axis=2) / int_np.sum()
        return (np.sqrt(mean) * stds).mean(axis=(0, 1))

    rmse_j = per_var_rmse(preds_j)
    with torch.no_grad():
        pred_t = torch_scaled_ar_step(
            tp, tables, args.layers, flat_bt(test_batch.inputs.array),
            flat_bt(test_batch.forcing.array), flat_bt(test_batch.outputs.array),
            statics_t, border_t, diff_mean_t, diff_std_t,
        )
    rmse_t = per_var_rmse(pred_t.numpy())

    jl, tl = np.asarray(jax_losses), np.asarray(torch_losses)
    rel = np.abs(jl - tl) / np.maximum(np.abs(tl), 1e-9)
    rmse_rel = np.abs(rmse_j - rmse_t) / np.maximum(np.abs(rmse_t), 1e-9)
    report = {
        "steps": args.steps,
        "hidden": args.hidden,
        "processor_layers": args.layers,
        "lattice_path": True,
        "jax_losses": jl.tolist(),
        "torch_losses": tl.tolist(),
        "loss_rel_diff_max": float(rel.max()),
        "loss_rel_diff_final": float(rel[-1]),
        "rmse_per_variable_jax": {n: float(v) for n, v in zip(names, rmse_j)},
        "rmse_per_variable_torch": {n: float(v) for n, v in zip(names, rmse_t)},
        "rmse_rel_diff_max": float(rmse_rel.max()),
    }
    args.out.mkdir(parents=True, exist_ok=True)
    with open(args.out / "parity_e2e_gnn.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("losses")}, indent=1))
    ok = (report["loss_rel_diff_max"] < 2e-2
          and report["rmse_rel_diff_max"] < 5e-3)
    print("PARITY", "OK" if ok else "DIVERGED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
