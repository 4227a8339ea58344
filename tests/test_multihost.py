"""Multi-host validation on a local jax.distributed CPU cluster
(VERDICT r2 #3). Spawns real processes — the only way to exercise
cross-process global-array assembly, collectives and host-0 gating
without multi-host hardware (reference analog: multi-node DDP via
SLURM, README.md:297-327)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_dryrun_multihost_2x2():
    from __graft_entry__ import dryrun_multihost

    # 2 processes x 2 virtual CPU devices each: data x spatial mesh,
    # loader partitioning, identical losses on every process; the
    # orchestrator enforces its own subprocess timeout
    dryrun_multihost(n_processes=2, devices_per_process=2, timeout=420)
