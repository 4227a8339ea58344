"""Direct tests of the experiment-logger stack (reference analog:
Lightning's TensorBoard/CSV/MLFlow loggers, config/CLI/trainer.yaml)."""

import csv

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from py4cast_tpu.loggers import CSVLogger, TensorBoardLogger, default_loggers


def test_csv_logger_appends_and_resumes(tmp_path):
    lg = CSVLogger(tmp_path)
    lg.log_scalar("train/loss", 1.25, 1)
    lg.log_scalar("val_mean_loss", 0.5, 2)
    lg.close()
    # reopening appends without duplicating the header (resume case)
    lg2 = CSVLogger(tmp_path)
    lg2.log_scalar("train/loss", 1.0, 3)
    lg2.close()

    rows = list(csv.reader(open(tmp_path / "metrics.csv")))
    assert rows[0] == ["time", "step", "tag", "value"]
    assert [r[1:] for r in rows[1:]] == [
        ["1", "train/loss", "1.25"],
        ["2", "val_mean_loss", "0.5"],
        ["3", "train/loss", "1.0"],
    ]


def test_csv_logger_figures_sanitize_tags(tmp_path):
    lg = CSVLogger(tmp_path)
    fig, ax = plt.subplots()
    ax.plot([0, 1], [0, 1])
    lg.log_figure("score_cards/Test_rmse", fig, 4)
    plt.close(fig)
    lg.close()
    assert (tmp_path / "figures" / "score_cards_Test_rmse_4.png").exists()


def test_tensorboard_logger_writes_events(tmp_path):
    lg = TensorBoardLogger(tmp_path)
    lg.log_scalar("train/loss", 2.0, 1)
    fig, ax = plt.subplots()
    ax.plot([0, 1])
    lg.log_figure("maps/example", fig, 1)
    plt.close(fig)
    lg.close()
    assert list(tmp_path.glob("events.out.tfevents.*"))


def test_default_loggers_degrade_without_optional_deps(tmp_path, monkeypatch):
    # simulate an absent mlflow regardless of the environment (a None
    # sys.modules entry makes `import mlflow` raise ImportError):
    # requesting it must degrade silently to the always-available
    # loggers, never raise
    import sys

    monkeypatch.setitem(sys.modules, "mlflow", None)
    loggers = default_loggers(tmp_path, tensorboard=True, mlflow=True)
    kinds = {type(lg).__name__ for lg in loggers}
    assert "CSVLogger" in kinds
    assert "MLFlowLogger" not in kinds
    for lg in loggers:
        lg.close()
