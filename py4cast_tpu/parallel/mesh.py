"""Device mesh and sharding helpers — the scale-out layer.

TPU-native replacement for the reference's Lightning-DDP data
parallelism (reference touchpoints: SURVEY.md §2.3). Design:

- one explicit ``jax.sharding.Mesh`` with axes ``('data', 'spatial')``;
  pure data parallelism uses shape (n_devices, 1). The spatial axis is
  reserved for sharding large grids (the 1791×2801 Titan 1S100 case) —
  XLA inserts halo exchanges for convolutions automatically.
- parameters are replicated; batches are sharded on the batch axis.
  Gradient all-reduce over ICI is inserted by XLA from the sharding
  annotations — no user-level collectives (no NCCL analog needed).
- multi-host: call ``jax.distributed.initialize`` before ``make_mesh``
  (see ``maybe_init_distributed``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


@dataclass(frozen=True)
class MeshConfig:
    """How to lay devices out. data_parallel × spatial must divide the
    device count; -1 on data_parallel means "all remaining devices"."""

    data_parallel: int = -1
    spatial: int = 1


def maybe_init_distributed():
    """Initialize multi-host JAX when launched under a multi-process
    runtime (the JAX analog of torch.distributed init inside Lightning;
    reference launch topologies: SLURM srun / multi-node sbatch,
    README.md:297-327). Triggers on an explicit coordinator address, a
    multi-task SLURM allocation, or TPU-pod worker metadata —
    ``jax.distributed.initialize()`` auto-derives the topology from the
    environment in each case."""
    # TPU_WORKER_HOSTNAMES only counts when it lists MULTIPLE workers:
    # single-chip hosts (e.g. tunneled TPUs) export it with one entry,
    # and initializing distributed there fails for want of a coordinator
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if (
        os.environ.get("JAX_COORDINATOR_ADDRESS")
        or int(os.environ.get("SLURM_NTASKS", "1") or 1) > 1
        or len([w for w in workers.split(",") if w.strip()]) > 1
    ):
        jax.distributed.initialize()


def make_mesh(config: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    spatial = max(1, config.spatial)
    dp = config.data_parallel if config.data_parallel > 0 else n // spatial
    if dp * spatial != n:
        raise ValueError(
            f"mesh {dp}x{spatial} does not match {n} devices; "
            f"set data_parallel/spatial to divide the device count"
        )
    dev_array = np.asarray(devices).reshape(dp, spatial)
    return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int, lat_axis: Optional[int] = None
                   ) -> NamedSharding:
    """Sharding for a (B, …) batch array: batch over 'data'; when the mesh
    has a spatial axis > 1, the lat dim is sharded over 'spatial' (XLA
    inserts halo exchanges for convolutions automatically — the TPU-native
    'context parallel' analog for large grids, SURVEY.md §2.3)."""
    spec: list = [DATA_AXIS] + [None] * (ndim - 1)
    if lat_axis is not None and mesh.shape[SPATIAL_AXIS] > 1:
        spec[lat_axis] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def statics_sharding(mesh: Mesh, ndim: int, lat_axis: int = 0) -> NamedSharding:
    """Sharding for per-grid static arrays (lat, lon, S)."""
    spec: list = [None] * ndim
    if mesh.shape[SPATIAL_AXIS] > 1:
        spec[lat_axis] = SPATIAL_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(array, sharding: NamedSharding):
    """Commit a host array to devices under ``sharding``, multi-host
    aware: on a single process this is ``jax.device_put``; across
    processes each host feeds only its ADDRESSABLE shards (device_put to
    a remote host's devices is impossible), producing one global
    jax.Array. Host arrays must be identical across processes for
    replicated/statics shardings (they are: statics and params are
    deterministically built on every host)."""
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    import numpy as _np

    arr = _np.asarray(array)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def shard_batch(mesh: Mesh, *arrays, lat_axis: Optional[int] = None):
    """Commit host batch arrays with batch (and optionally lat) sharding.

    Single-host: one H2D transfer each, split across devices.
    Multi-host: each process passes its LOCAL batch rows (the loader
    partitions the global batch by ``jax.process_index()``) and the
    global array is assembled with
    ``jax.make_array_from_process_local_data`` — the TPU-native
    replacement for the reference's per-rank DDP sampler
    (SURVEY.md §2.3)."""
    dp = mesh.shape[DATA_AXIS]
    sp = mesh.shape[SPATIAL_AXIS]
    pc = jax.process_count()
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        global_rows = a.shape[0] * pc
        if global_rows % dp:
            raise ValueError(
                f"Global batch size {global_rows} ({a.shape[0]} local rows "
                f"x {pc} processes) is not divisible by the data-parallel "
                f"mesh axis ({dp} devices); adjust batch_size or the mesh "
                f"(MeshConfig.data_parallel)."
            )
        la = lat_axis
        if la is not None and sp > 1 and a.shape[la] % sp:
            raise ValueError(
                f"Spatial dim {a.shape[la]} is not divisible by the spatial "
                f"mesh axis ({sp})."
            )
        sharding = batch_sharding(mesh, a.ndim, la)
        if pc == 1:
            out.append(jax.device_put(a, sharding))
        else:
            import numpy as _np

            out.append(
                jax.make_array_from_process_local_data(
                    sharding, _np.asarray(a), (global_rows,) + tuple(a.shape[1:])
                )
            )
    out = tuple(out)
    return out if len(out) > 1 else out[0]


def to_host(array) -> np.ndarray:
    """Bring a (possibly multi-host sharded) jax.Array to every host as
    numpy — np.asarray for fully-addressable arrays, cross-process
    allgather otherwise (the analog of the reference's sync_dist /
    torchmetrics cross-rank reductions)."""
    if getattr(array, "is_fully_addressable", True):
        return np.asarray(array)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(array, tiled=True))


def is_main_process() -> bool:
    """Host-0 gating for writes (ckpt/logs/figures) — the analog of the
    reference's rank-zero guards (lightning.py:141-144,
    plots.py:285,539,621)."""
    return jax.process_index() == 0
