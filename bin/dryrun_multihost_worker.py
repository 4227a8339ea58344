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

(out_dir / f"proc{proc_id}.json").write_text(
    __import__("json").dumps(
        {
            "process": proc_id,
            "train_losses": losses,
            "eval_mean": eval_mean,
            "local_loader_rows": got,
        }
    )
)
print(f"MULTIHOST WORKER {proc_id} OK losses={losses} eval={eval_mean:.5f}")
