"""Plotters and figure helpers (observer pattern).

Host-side matplotlib rendering, fed by device arrays pulled back with a
single transfer per figure. Mirrors the reference's plot/observer system
(reference: py4cast/plots.py); expanded as the training loop grows.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


@dataclass
class DomainInfo:
    """Geographic domain info used by map plots (reference: plots.py:32-45)."""

    grid_limits: List[float]
    projection: object = None


def plot_sample_step(sample, item, step: int, save_path: Optional[Path] = None):
    """Plot every feature of one timestep of a sample's Item.

    (reference: datasets/base.py:529-588, simplified: no cartopy coastlines
    requirement, one row of panels per vertical level)
    """
    ntensor = item.inputs if step <= 0 else item.outputs
    if step <= 0:
        index = step + sample.settings.num_input_steps - 1
    else:
        index = step - 1

    feats = list(ntensor.feature_names)
    ncols = max(1, len(feats))
    fig, axs = plt.subplots(1, ncols, figsize=(5 * ncols, 4), squeeze=False)
    for j, fname in enumerate(feats):
        arr = np.asarray(ntensor[fname])[index, :, :, 0][::-1]
        vmin = vmax = None
        if sample.stats is not None and fname in sample.stats:
            vmin = sample.stats[fname].get("min")
            vmax = sample.stats[fname].get("max")
        img = axs[0, j].imshow(
            arr, vmin=vmin, vmax=vmax, extent=sample.grid.grid_limits
        )
        axs[0, j].set_title(fname)
        fig.colorbar(img, ax=axs[0, j], fraction=0.04, pad=0.04)
    plt.suptitle(
        f"Run: {sample.timestamps.datetime} - "
        f"Valid: {sample.timestamps.validity_times[step]}"
    )
    plt.tight_layout()
    if save_path is not None:
        plt.savefig(save_path)
        plt.close(fig)
    return fig


def sample_gif(sample, save_path: Path):
    """Animated GIF over all steps of a sample (reference: base.py:597-610)."""
    item = sample.load(no_standardize=True)
    n_in = sample.settings.num_input_steps
    n_pred = sample.settings.num_pred_steps
    frames = []
    for step in range(-n_in + 1, n_pred + 1):
        fig = plot_sample_step(sample, item, step)
        fig.canvas.draw()
        frame = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        frames.append(frame)
        plt.close(fig)
    save_frames_as_gif(frames, save_path, duration_ms=250)


def save_frames_as_gif(frames: List[np.ndarray], save_path: Path, duration_ms=250):
    """Write RGB frames as an animated GIF using matplotlib only."""
    from matplotlib import animation

    fig = plt.figure(
        figsize=(frames[0].shape[1] / 100, frames[0].shape[0] / 100), dpi=100
    )
    ax = fig.add_axes([0, 0, 1, 1])
    ax.axis("off")
    im = ax.imshow(frames[0])

    def update(i):
        im.set_data(frames[i])
        return (im,)

    anim = animation.FuncAnimation(
        fig, update, frames=len(frames), interval=duration_ms, blit=True
    )
    anim.save(str(save_path), writer=animation.PillowWriter(fps=1000 / duration_ms))
    plt.close(fig)
