"""Smoke tests for the run-comparison tools (reference:
bin/scores_comparison.py and bin/gif_comparison.py — the latter
self-flagged stale upstream; ours drives the current
checkpoint/manifest format end-to-end)."""

import json
import sys
from pathlib import Path

import pytest

# import the tools with bin/ on the path only transiently, so generic
# bin/ script names (main.py, ...) can't shadow later imports in the
# same pytest session
BIN = Path(__file__).resolve().parent.parent / "bin"
sys.path.insert(0, str(BIN))
try:
    import gif_comparison
    import scores_comparison
finally:
    sys.path.remove(str(BIN))


def test_scores_comparison_plots_multiple_runs(tmp_path):
    runs = []
    for name, vals in [("runA", (1.0, 0.9, 0.8)), ("runB", (1.2, 1.0, 0.7))]:
        d = tmp_path / name
        d.mkdir()
        scores = {
            "dummy_parameter_500": list(vals),
            "dummy_parameter_850": [v * 2 for v in vals],
        }
        (d / "Test_rmse_scores.json").write_text(json.dumps(scores))
        runs.append(str(d / "Test_rmse_scores.json"))

    out = tmp_path / "cmp.png"
    rc = scores_comparison.main(
        ["--runs", *runs, "--labels", "A", "B", "--output", str(out)]
    )
    assert rc == 0
    assert out.exists() and out.stat().st_size > 0


def test_scores_comparison_label_mismatch_errors(tmp_path):
    f = tmp_path / "Test_rmse_scores.json"
    f.write_text(json.dumps({"v": [1.0]}))
    with pytest.raises(SystemExit, match="labels"):
        scores_comparison.main(["--runs", str(f), "--labels", "A", "B"])


def test_gif_comparison_from_trained_checkpoints(tmp_path):
    """Train one tiny checkpoint on dummy, then render the side-by-side
    case-study GIFs from its manifest — the full tool path."""
    from py4cast_tpu.datasets import get_datasets
    from py4cast_tpu.training import (
        AutoRegressiveModule,
        Trainer,
        TrainerConfig,
        TrainingSettings,
    )

    train_ds, val_ds, _ = get_datasets("dummy", 2, 1, 2)
    module = AutoRegressiveModule(
        TrainingSettings(
            model_name="HalfUNet",
            settings_init_args={"num_filters": 4, "depth": 2},
            num_warmup_steps=2,
        ),
        train_ds.dataset_info,
    )
    tr = Trainer(TrainerConfig(
        max_epochs=1, batch_size=8, limit_train_batches=1,
        limit_val_batches=1, save_path=str(tmp_path / "run"),
        logging_enabled=False,
    ))
    tr.fit(module, train_ds, val_ds)
    ckpt = tmp_path / "run" / "checkpoints" / "last"
    assert ckpt.exists()

    out_dir = tmp_path / "gifs"
    rc = gif_comparison.main([
        "--ckpts", str(ckpt), "--labels", "tiny",
        "--num-pred-steps", "2", "--output-dir", str(out_dir),
    ])
    assert rc == 0
    gifs = list(out_dir.glob("comparison_*.gif"))
    assert gifs, "no comparison GIFs written"
    assert all(g.stat().st_size > 0 for g in gifs)
