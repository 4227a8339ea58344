#!/usr/bin/env python
"""Side-by-side animated comparison of several trained checkpoints on a
chosen case study: one GIF per feature with ground truth + each model.

Functional re-design of the reference tool (reference:
bin/gif_comparison.py — which is self-flagged stale at :304-306); this
version drives the current checkpoint/manifest format.

Usage:
    python bin/gif_comparison.py --ckpts runA/checkpoints/best \
        runB/checkpoints/best --dataset dummy --date 2023010500 \
        --num-pred-steps 6 --output-dir gifs/
"""

import argparse
import datetime as dt
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from py4cast_tpu.utils import apply_env_platform  # noqa: E402

apply_env_platform()

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def main(argv=None) -> int:
    import jax

    from py4cast_tpu.checkpoint import load_manifest
    from py4cast_tpu.datasets import get_datasets
    from py4cast_tpu.datasets.base import collate_fn
    from py4cast_tpu.plots import save_frames_as_gif
    from py4cast_tpu.training import AutoRegressiveModule, TrainingSettings

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpts", nargs="+", required=True)
    p.add_argument("--labels", nargs="+", default=None)
    p.add_argument("--dataset", default="dummy")
    p.add_argument("--date", default=None, help="case-study run time YYYYMMDDHH")
    p.add_argument("--num-pred-steps", type=int, default=4)
    p.add_argument("--output-dir", default="gif_comparison")
    args = p.parse_args(argv)

    labels = args.labels or [Path(c).parent.parent.name for c in args.ckpts]

    # module/settings come from each checkpoint's manifest — artifacts are
    # self-describing (reference contract: lightning.py:338-354)
    manifests = [load_manifest(Path(c)) for c in args.ckpts]
    num_input_steps = manifests[0]["training_settings"]["num_input_steps"]

    _, _, test_ds = get_datasets(
        args.dataset, num_input_steps, args.num_pred_steps, args.num_pred_steps
    )
    samples = test_ds.sample_list
    if args.date:
        t0 = dt.datetime.strptime(args.date, "%Y%m%d%H")
        samples = [s for s in samples if s.timestamps.datetime == t0] or samples
    sample = samples[0]
    batch = collate_fn([sample.load()])

    preds_per_model = []
    for ckpt, manifest in zip(args.ckpts, manifests):
        ts = manifest["training_settings"]
        settings = TrainingSettings(
            model_name=manifest["model_name"],
            settings_init_args={
                k: v for k, v in manifest["model_settings"].items()
            },
            training_strategy=ts["training_strategy"],
            num_inter_steps=ts["num_inter_steps"],
            num_input_steps=ts["num_input_steps"],
            mask_on_nan=ts.get("mask_on_nan", False),
        )
        from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh

        mesh = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
        module = AutoRegressiveModule(settings, test_ds.dataset_info, mesh=mesh)
        state = module.init_state(jax.random.key(0), 1)
        from py4cast_tpu.checkpoint import CheckpointManager

        state = CheckpointManager(Path(ckpt).parent).restore(ckpt, state)
        preds = module.predict_step(state, batch, jax.random.key(0))
        preds_per_model.append(np.asarray(preds.array)[0])  # (T, lat, lon, F)

    # ground truth, de-normalized
    info = test_ds.dataset_info
    std = info.stats.to_array("std", info.output_feature_names)
    mean = info.stats.to_array("mean", info.output_feature_names)
    truth = np.asarray(batch.outputs.array)[0] * std + mean

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ncols = 1 + len(preds_per_model)
    for f_i, fname in enumerate(info.output_feature_names):
        vmin = truth[..., f_i].min()
        vmax = truth[..., f_i].max()
        frames = []
        for t in range(truth.shape[0]):
            fig, axs = plt.subplots(1, ncols, figsize=(4 * ncols, 4))
            panels = [("AROME (truth)", truth[t, :, :, f_i])] + [
                (lbl, pr[t, :, :, f_i]) for lbl, pr in zip(labels, preds_per_model)
            ]
            for ax, (title, data) in zip(np.atleast_1d(axs), panels):
                ax.imshow(data[::-1], vmin=vmin, vmax=vmax)
                ax.set_title(f"{title} +{t + 1}")
                ax.axis("off")
            fig.suptitle(fname)
            fig.canvas.draw()
            frames.append(np.asarray(fig.canvas.buffer_rgba())[..., :3].copy())
            plt.close(fig)
        dest = out_dir / f"comparison_{fname}.gif"
        save_frames_as_gif(frames, dest)
        print(f"Saved {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
