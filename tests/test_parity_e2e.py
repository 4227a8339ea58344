"""Fast CI variant of the end-to-end JAX/torch training parity artifact
(bin/parity_e2e.py, committed run in PARITY_E2E.md): identical init,
data order, rollout, loss and optimizer — losses and per-variable RMSE
must track across stacks."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _run(tmp_path, script):
    return subprocess.run(
        [sys.executable, str(REPO / "bin" / script),
         "--steps", "5", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=540,
        env={"PY4CAST_TPU_ROOTDIR": str(tmp_path / "root"),
             "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
    )


def test_parity_e2e_five_steps(tmp_path):
    proc = _run(tmp_path, "parity_e2e.py")
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "PARITY OK" in proc.stdout
    assert (tmp_path / "parity_e2e.json").exists()


def test_parity_e2e_gnn_five_steps(tmp_path):
    """Lattice-GraphLAM (JAX, lattice fast path) vs gather/scatter torch
    restatement: identical 5-step training trajectory."""
    proc = _run(tmp_path, "parity_e2e_gnn.py")
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "PARITY OK" in proc.stdout
    assert (tmp_path / "parity_e2e_gnn.json").exists()
