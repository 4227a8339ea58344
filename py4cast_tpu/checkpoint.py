"""Checkpointing: orbax params/opt-state + a JSON manifest.

TPU-native replacement for Lightning's ModelCheckpoint + embedded
hyperparameters (reference: lightning.py:224-226, 338-354 and
trainer.yaml:38-44). The manifest makes a trained artifact
self-describing for inference-time contract checks: feature/dim names,
normalization stats, model name + settings, strategy knobs.
"""

from __future__ import annotations

import dataclasses
import json
import shutil
from pathlib import Path
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp

#: Param-tree semantics version, stamped into every manifest. Bump when
#: a model's param tree or param SEMANTICS change such that an old
#: checkpoint would restore without error but compute different outputs.
#: History:
#:   1 (implicit, manifests without the field) — rounds 1-4 early:
#:     SwinUNetR ConvBlockRes / UNetRPP stem used 8-group GroupNorm.
#:   2 — norm_name-mapped per-channel instance norm, affine-free
#:     (matches torch InstanceNorm2d affine=False): SwinUNetR/UNetRPP
#:     param trees changed; GroupNorm scale/bias leaves are gone.
CHECKPOINT_FORMAT_VERSION = 2

#: models whose param semantics changed at each version bump — only
#: their old checkpoints are actually incompatible
_FORMAT_AFFECTED_MODELS = {2: ("SwinUNetR", "UNetRPP")}


def check_format_version(manifest: dict) -> None:
    """Refuse to restore a checkpoint whose param semantics predate the
    current format — a shape-compatible restore would silently compute
    different outputs (ADVICE r4: the GroupNorm→instance-norm switch
    kept identical scale/bias shapes, so nothing failed at restore).
    """
    stored = int(manifest.get("checkpoint_format", 1))
    if stored >= CHECKPOINT_FORMAT_VERSION:
        return
    model = manifest.get("model_name", "")
    affected = [
        v for v in range(stored + 1, CHECKPOINT_FORMAT_VERSION + 1)
        if model in _FORMAT_AFFECTED_MODELS.get(v, ())
    ]
    if affected:
        raise ValueError(
            f"Checkpoint format {stored} predates version(s) {affected} "
            f"which changed {model}'s normalization param semantics "
            "(8-group GroupNorm → affine-free per-channel instance norm). "
            "Restoring would silently compute different outputs. "
            "Re-train, or knowingly inject raw params via "
            "inference.use_old_weights / load_raw_params."
        )


def _jsonable(x):
    if dataclasses.is_dataclass(x) and not isinstance(x, type):
        return {f.name: _jsonable(getattr(x, f.name)) for f in dataclasses.fields(x)}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (np.floating, np.integer)):
        return x.item()
    if isinstance(x, np.ndarray):
        return x.tolist()
    return x


class CheckpointManager:
    """Saves `last` and `best` (lowest val_mean_loss) checkpoints.

    Layout:  <dir>/last/ , <dir>/best/ (orbax trees) + manifest.json
    """

    def __init__(self, directory: Path, manifest: Optional[dict] = None):
        self.directory = Path(directory)
        self.directory.mkdir(parents=True, exist_ok=True)
        self.best_metric = float("inf")
        self._ckpt = ocp.StandardCheckpointer()
        if manifest is not None:
            self.write_manifest(manifest)

    def write_manifest(self, manifest: dict):
        with open(self.directory / "manifest.json", "w") as f:
            json.dump(_jsonable(manifest), f, indent=1, default=str)

    def read_manifest(self) -> dict:
        with open(self.directory / "manifest.json") as f:
            return json.load(f)

    def _save(self, name: str, tree: Any):
        """Crash-safe replace: write to a temp sibling, then swap via
        renames — a valid copy of the previous checkpoint stays on disk
        until the new one is fully written."""
        final = (self.directory / name).absolute()
        tmp = (self.directory / f".{name}.tmp").absolute()
        old = (self.directory / f".{name}.old").absolute()
        for stale in (tmp, old):
            if stale.exists():
                shutil.rmtree(stale)
        self._ckpt.save(tmp, tree)
        self._ckpt.wait_until_finished()
        if final.exists():
            final.rename(old)
        tmp.rename(final)
        if old.exists():
            shutil.rmtree(old)

    def save_last(self, tree: Any):
        self._save("last", tree)

    def maybe_save_best(self, tree: Any, metric: float) -> bool:
        if metric < self.best_metric:
            self.best_metric = metric
            self._save("best", tree)
            return True
        return False

    def restore(self, name: str, target: Any) -> Any:
        """Restore a checkpoint into the structure of ``target``."""
        path = (self.directory / name).absolute()
        if not path.exists():
            # allow passing a direct path to an orbax tree
            path = Path(name).absolute()
        return self._ckpt.restore(path, target=target)


def load_manifest(ckpt_path: Path) -> dict:
    """Find manifest.json next to (or above) an orbax checkpoint dir."""
    p = Path(ckpt_path)
    for cand in (p / "manifest.json", p.parent / "manifest.json"):
        if cand.exists():
            with open(cand) as f:
                return json.load(f)
    raise FileNotFoundError(f"No manifest.json next to {ckpt_path}")
