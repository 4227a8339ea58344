"""Worker process for the multi-host dry run.

Launched N times by ``__graft_entry__.dryrun_multihost`` (or
tests/test_multihost.py) to form a local ``jax.distributed`` cluster of
N CPU processes × D virtual devices each — validating the full
multi-host story without real multi-host hardware: per-process loader
partitioning, global-array assembly from process-local data, XLA
cross-process collectives, host-0-gated writes.

Usage: dryrun_multihost_worker.py <process_id> <num_processes>
       <devices_per_process> <coordinator_port> <out_dir>
"""

import os
import sys
from pathlib import Path

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
ndev = int(sys.argv[3])
port = sys.argv[4]
out_dir = Path(sys.argv[5])

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
    + f" --xla_force_host_platform_device_count={ndev}"
).strip()
os.environ.setdefault("PY4CAST_TPU_ROOTDIR", str(out_dir / "root"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=proc_id,
)
assert jax.process_count() == nproc
assert len(jax.devices()) == nproc * ndev, (
    f"global device count {len(jax.devices())} != {nproc}x{ndev}"
)

import numpy as np  # noqa: E402

from py4cast_tpu.datasets.loader import DataLoader  # noqa: E402
from py4cast_tpu.parallel.mesh import (  # noqa: E402
    MeshConfig,
    make_mesh,
    to_host,
)
from py4cast_tpu.testing import (  # noqa: E402
    synthetic_batch,
    synthetic_dataset_info,
)
from py4cast_tpu.training import (  # noqa: E402
    AutoRegressiveModule,
    TrainingSettings,
)

# data × spatial mesh spanning BOTH processes
spatial = 2 if (nproc * ndev) % 2 == 0 else 1
mesh = make_mesh(MeshConfig(data_parallel=nproc * ndev // spatial,
                            spatial=spatial))

info = synthetic_dataset_info(
    grid_shape=(32, 32), weather_features=3, forcing_features=6, border_size=2
)
settings = TrainingSettings(
    model_name="HalfUNet",
    settings_init_args={"num_filters": 8, "depth": 2},
    training_strategy="scaled_ar",
    num_input_steps=2,
    num_warmup_steps=2,
)
module = AutoRegressiveModule(settings, info, mesh=mesh)
state = module.init_state(jax.random.key(0), num_training_steps=4)

# per-process LOCAL batch rows (the loader-partitioning contract):
# global batch = 2 rows per data-parallel device group
global_batch = 2 * (nproc * ndev // spatial)
local_rows = global_batch // nproc
batch = synthetic_batch(info, batch_size=local_rows, num_pred_steps=2)

losses = []
for i in range(2):
    state, loss = module.train_step(state, batch, jax.random.key(1 + i))
    losses.append(float(loss))
_, per_step = module.eval_step(state, batch, jax.random.key(9))
rows = to_host(per_step)
assert rows.shape == (global_batch, 2), rows.shape
eval_mean = float(np.mean(rows))

for v in losses + [eval_mean]:
    assert v == v, "NaN loss in multihost dryrun"

# ---- plot/metric path under multi-host: named_eval_arrays is a
# collective (global pred/target on every host); figures, score cards
# and PSD metrics are written by process 0 only (reference rank-zero
# gating: plots.py:285,539,621)
from jax.experimental import multihost_utils  # noqa: E402

from py4cast_tpu.metrics import MetricPSDK  # noqa: E402
from py4cast_tpu.parallel.mesh import is_main_process  # noqa: E402
from py4cast_tpu.plots import (  # noqa: E402
    PredictionTimestepPlot,
    StateErrorPlot,
)

# per-process DISTINCT rows so global row order is observable
plot_batch = synthetic_batch(
    info, batch_size=local_rows, num_pred_steps=2, seed=100 + proc_id
)
preds_g, _ = module.eval_step(state, plot_batch, jax.random.key(11))
pred_na, target_na, mask = module.named_eval_arrays(preds_g, plot_batch)
assert pred_na.array.shape[0] == global_batch, pred_na.array.shape
assert target_na.array.shape[0] == global_batch, target_na.array.shape
# this process's local rows must sit at their global offset
local_t = np.asarray(plot_batch.outputs.array, np.float32)
sl = np.asarray(
    target_na.array[proc_id * local_rows : (proc_id + 1) * local_rows]
)
assert np.allclose(sl, local_t, atol=1e-6), "global target row order broken"
target_row_means = [
    float(v)
    for v in np.asarray(target_na.array, np.float64).mean(axis=(1, 2, 3, 4))
]

fig_dir = out_dir / "figs"
if is_main_process():
    module._plot_loggers = []
    module.current_epoch = 0
    plotters = [
        StateErrorPlot(
            {"mae": module.make_scaled_loss("mae")},
            prefix="Validation",
            save_path=fig_dir,
        ),
        PredictionTimestepPlot(
            num_samples_to_plot=1, num_features_to_plot=1,
            prefix="Validation", save_path=fig_dir,
        ),
    ]
    metric = MetricPSDK(
        fig_dir, list(module.output_feature_names),
        info.statics.grid_shape, pred_step=1,
    )
    mstate = metric.init_state()
    for p in plotters:
        p.update(module, plot_batch, pred_na, target_na, mask)
    mstate = metric.update(mstate, pred_na.array, target_na.array, mask)
    for p in plotters:
        p.on_step_end(module, label="Valid")
multihost_utils.sync_global_devices("p4t_multihost_plots_done")
figs_written = sorted(
    str(p.relative_to(fig_dir)) for p in fig_dir.rglob("*") if p.is_file()
)
assert figs_written, "no figures/scores written under multi-host"

# loader partitioning smoke inside the live cluster (defaults read
# jax.process_index/process_count)
from py4cast_tpu.datasets.base import Item  # noqa: E402
from py4cast_tpu.named_tensor import NamedArray  # noqa: E402


class _Range:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        import datetime as dt

        arr = np.full((1, 2, 2, 1), float(i), np.float32)
        return Item(
            inputs=None,
            forcing=None,
            outputs=NamedArray(
                arr, ("timestep", "lat", "lon", "features"), ("f",)
            ),
            validity_times=[dt.datetime(2020, 1, 1)],
        )


loader = DataLoader(_Range(), batch_size=4)
got = sorted(
    float(v)
    for b in loader
    for v in np.asarray(b.outputs.array)[:, 0, 0, 0, 0]
)
assert len(got) == 8 // nproc, got  # each process loads its slice only

# ---- uneven (padded) eval tail under multi-host: 11 deterministic
# samples at GLOBAL batch 8 → second batch carries 3 real + 5 padded
# rows; ItemBatch.num_valid masks the padding so every real sample is
# scored exactly once, with per-sample losses identical on every
# process AND across topologies (the orchestrator compares runs —
# reference behavior: torch val DataLoader drop_last=False,
# datasets/base.py:735-743)
import datetime as _dt  # noqa: E402

N_TAIL, TAIL_GLOBAL_BATCH = 11, 8


class _TailDS:
    def __len__(self):
        return N_TAIL

    def __getitem__(self, i):
        rng = np.random.default_rng(1000 + i)  # seeded by GLOBAL index
        h, w = info.statics.grid_shape
        names = ("timestep", "lat", "lon", "features")

        def na(t, f, feats):
            return NamedArray(
                rng.standard_normal((t, h, w, f)).astype(np.float32),
                names, feats,
            )

        return Item(
            inputs=na(2, info.weather_dim, info.output_feature_names),
            outputs=na(2, info.weather_dim, info.output_feature_names),
            forcing=na(2, info.forcing_dim, info.forcing_feature_names),
            validity_times=[_dt.datetime(2020, 1, 1, hh) for hh in (1, 2)],
        )


# fresh deterministic params: init_state(key(0)) is topology-independent
# (the TRAINED state above is not — its data partitioning differs by
# process count), so tail scores are comparable across runs
tail_state = module.init_state(jax.random.key(0), num_training_steps=4)
tail_losses = []
for b in DataLoader(_TailDS(), batch_size=TAIL_GLOBAL_BATCH, num_workers=1,
                    drop_last=False, pad_last=True):
    _, per_step = module.eval_step(tail_state, b, jax.random.key(21))
    rows = to_host(per_step)  # (global batch, T) on EVERY process
    nv = b.num_valid if b.num_valid is not None else TAIL_GLOBAL_BATCH
    tail_losses.extend(float(v) for v in np.asarray(rows)[:nv].mean(axis=1))
assert len(tail_losses) == N_TAIL, (
    f"padded tail mis-scored: {len(tail_losses)} != {N_TAIL}"
)

# ---- GRIB export under multi-host: host 0 encodes one predicted field
# through the in-repo GRIB2 codec; every process then decodes the same
# file and checks the values round-trip (host-0-only writes are asserted
# by the orchestrator over the whole out_dir)
from py4cast_tpu.io.grib2 import Grib2Field, read_grib2, write_grib2  # noqa: E402

grib_path = out_dir / "gribs" / "pred_mh.grib2"
h, w = info.statics.grid_shape
pred_field = np.asarray(pred_na.array, np.float32)[0, 0, :, :, 0]
if is_main_process():
    write_grib2(
        grib_path,
        [Grib2Field(
            values=pred_field,
            lat=np.linspace(40.0, 50.0, h),
            lon=np.linspace(0.0, 10.0, w),
            parameter_category=0, parameter_number=0,
            type_of_level=103, level=2.0,
            data_date=_dt.date(2020, 1, 1), forecast_hours=1,
        )],
    )
multihost_utils.sync_global_devices("p4t_multihost_grib_done")
decoded = read_grib2(grib_path)
assert len(decoded) == 1
# 16-bit simple packing: quantization error bounded by range / 2^16
span = float(pred_field.max() - pred_field.min()) or 1.0
assert np.allclose(decoded[0].values, pred_field, atol=span / 2**15), (
    "GRIB round-trip diverged under multi-host"
)

(out_dir / f"proc{proc_id}.json").write_text(
    __import__("json").dumps(
        {
            "process": proc_id,
            "is_main": is_main_process(),
            "train_losses": losses,
            "eval_mean": eval_mean,
            "local_loader_rows": got,
            "target_row_means": target_row_means,
            "figs_written": figs_written,
            "tail_losses": tail_losses,
            "grib_file": str(grib_path.relative_to(out_dir)),
        }
    )
)
print(f"MULTIHOST WORKER {proc_id} OK losses={losses} eval={eval_mean:.5f}")
