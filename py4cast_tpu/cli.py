"""Command-line interface: ``fit`` / ``test`` / ``predict``.

TPU-native replacement for the reference's LightningCLI wiring
(reference: py4cast/cli.py, bin/main.py, README.md:377-418). Keeps the
same UX: several ``--config file.yaml`` flags composed in order
(trainer / dataset / model), plus dotted-path overrides
(``--model.learning_rate 1e-4`` or ``--data.batch_size=8``).

Cross-section links (reference: cli.py:22-57): ``data.num_input_steps``,
``data.num_pred_steps_*`` and ``data.batch_size`` flow into the training
settings and trainer automatically.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import yaml

from py4cast_tpu.datasets import get_datasets
from py4cast_tpu.loggers import default_loggers
from py4cast_tpu.training import (
    AutoRegressiveModule,
    Trainer,
    TrainerConfig,
    TrainingSettings,
)
from py4cast_tpu.utils import merge_dicts


@dataclasses.dataclass
class DataConfig:
    """The `data:` config section (reference: PlDataModule args,
    lightning.py:54-90)."""

    dataset_name: str = "dummy"
    dataset_conf: Optional[str] = None
    config_override: Optional[dict] = None
    num_input_steps: int = 2
    num_pred_steps_train: int = 1
    num_pred_steps_val_test: int = 1
    batch_size: int = 1
    num_workers: int = 2
    prefetch_factor: int = 2
    # inference options (reference: lightning.py:91-104)
    save_gifs: bool = False
    save_gribs: bool = False
    list_run_hour: Optional[List[int]] = None
    # raw-weight injection into the restored state — escape hatch for
    # stale checkpoints (reference: use_old_weights, lightning.py:1105-1116)
    use_old_weights: Optional[str] = None


class DataModule:
    """Builds the train/valid/test datasets once (reference: PlDataModule)."""

    def __init__(self, cfg: DataConfig):
        self.cfg = cfg
        self.train_ds, self.val_ds, self.test_ds = get_datasets(
            cfg.dataset_name,
            cfg.num_input_steps,
            cfg.num_pred_steps_train,
            cfg.num_pred_steps_val_test,
            dataset_conf=cfg.dataset_conf,
            config_override=cfg.config_override,
        )

    @property
    def train_dataset_info(self):
        return self.train_ds.dataset_info

    @property
    def infer_ds(self):
        return self.test_ds


def _coerce(value: str):
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


def _set_dotted(d: dict, dotted: str, value):
    keys = dotted.split(".")
    cur = d
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
    cur[keys[-1]] = value


def parse_cli(argv: List[str]) -> Tuple[str, dict]:
    """Parse `<subcommand> --config a.yaml [--config b.yaml ...] [--x.y v]`."""
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("usage: main.py {fit,test,predict} --config FILE [...] "
              "[--section.key value] [--ckpt_path PATH]")
        sys.exit(0)
    subcommand = argv[0]
    if subcommand not in ("fit", "test", "predict"):
        raise SystemExit(f"Unknown subcommand {subcommand!r}; use fit/test/predict")

    conf: dict = {}
    i = 1
    while i < len(argv):
        arg = argv[i]
        if not arg.startswith("--"):
            raise SystemExit(f"Unexpected argument {arg!r}")
        if "=" in arg:
            key, value = arg[2:].split("=", 1)
            i += 1
        else:
            key = arg[2:]
            if i + 1 >= len(argv):
                raise SystemExit(f"Missing value for --{key}")
            value = argv[i + 1]
            i += 2
        if key == "config":
            with open(value) as f:
                conf = merge_dicts(conf, yaml.safe_load(f) or {})
        else:
            _set_dotted(conf, key, _coerce(value))
    return subcommand, conf


def _filter_fields(kls, d: dict) -> dict:
    known = {f.name for f in dataclasses.fields(kls)}
    unknown = set(d) - known
    if unknown:
        raise SystemExit(
            f"Unknown {kls.__name__} keys: {sorted(unknown)}; "
            f"accepted: {sorted(known)}"
        )
    return d


def _load_ckpt_manifest(conf: dict) -> Optional[dict]:
    """The manifest.json written next to the run's checkpoints, resolved
    from trainer.ckpt_path / trainer.save_path (None when absent)."""
    from py4cast_tpu.checkpoint import load_manifest

    trainer_conf = conf.get("trainer", {})
    ckpt_path = str(trainer_conf.get("ckpt_path", "last"))
    base = Path(str(trainer_conf.get("save_path", "runs/default"))) / "checkpoints"
    cand = base / ckpt_path
    target = cand if cand.exists() else Path(ckpt_path)
    try:
        return load_manifest(target)
    except FileNotFoundError:
        return None


def build_all(conf: dict, manifest: Optional[dict] = None):
    """Build datamodule + module + trainer from the composed config.

    When ``manifest`` is given (test/predict), the MODEL is rebuilt from
    the checkpoint's stored training settings — not the current config —
    and the dataset is validated against the stored feature/stats
    contract (reference: names stored in the ckpt, lightning.py:338-354,
    checked at predict, :1123-1128). A train/predict config drift then
    fails loudly instead of silently mis-normalizing.
    """
    data_cfg = DataConfig(**_filter_fields(DataConfig, conf.get("data", {})))
    dm = DataModule(data_cfg)

    if manifest is not None:
        from py4cast_tpu.training import check_manifest_contract

        model_conf = dict(manifest["training_settings"])
        # inference-time knobs stay CLI-overridable; everything
        # structural (model, strategy, steps, …) comes from the ckpt
        for key in ("io_conf", "num_samples_to_plot"):
            if key in conf.get("model", {}):
                model_conf[key] = conf["model"][key]
        check_manifest_contract(manifest, dm.train_dataset_info)
    else:
        model_conf = dict(conf.get("model", {}))
        # linked arguments (reference: cli.py:22-57)
        model_conf.setdefault("num_input_steps", data_cfg.num_input_steps)
        model_conf.setdefault("num_pred_steps_train", data_cfg.num_pred_steps_train)
        model_conf.setdefault(
            "num_pred_steps_val_test", data_cfg.num_pred_steps_val_test
        )
    if "betas" in model_conf:
        model_conf["betas"] = tuple(model_conf["betas"])
    settings = TrainingSettings(**_filter_fields(TrainingSettings, model_conf))

    trainer_conf = dict(conf.get("trainer", {}))
    ckpt_path = trainer_conf.pop("ckpt_path", None)
    trainer_conf.setdefault("batch_size", data_cfg.batch_size)
    trainer_conf.setdefault("num_workers", data_cfg.num_workers)
    tcfg = TrainerConfig(**_filter_fields(TrainerConfig, trainer_conf))

    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(
        MeshConfig(data_parallel=tcfg.mesh_data_parallel, spatial=tcfg.mesh_spatial)
    )
    module = AutoRegressiveModule(settings, dm.train_dataset_info, mesh=mesh)
    trainer = Trainer(tcfg, loggers=default_loggers(Path(tcfg.save_path)))
    return dm, module, trainer, ckpt_path


def _restore_state(module: AutoRegressiveModule, trainer: Trainer, ckpt_path: str):
    from py4cast_tpu.checkpoint import CheckpointManager

    state = module.init_state(jax.random.key(0), num_training_steps=1)
    ckpt = CheckpointManager(Path(trainer.config.save_path) / "checkpoints")
    return ckpt.restore(ckpt_path, state)


def main(argv: Optional[List[str]] = None) -> int:
    subcommand, conf = parse_cli(argv if argv is not None else sys.argv[1:])
    manifest = None
    if subcommand in ("test", "predict"):
        manifest = _load_ckpt_manifest(conf)
        if manifest is None:
            print(
                "WARNING: no manifest.json next to the checkpoint — "
                "rebuilding the model from the CURRENT config without a "
                "train/predict contract check"
            )
    dm, module, trainer, ckpt_path = build_all(conf, manifest=manifest)

    if subcommand == "fit":
        trainer.fit(module, dm.train_ds, dm.val_ds, ckpt_path=ckpt_path)
    elif subcommand == "test":
        if not ckpt_path:
            raise SystemExit("test requires --trainer.ckpt_path")
        state = _restore_state(module, trainer, ckpt_path)
        scores = trainer.test(module, dm.test_ds, state)
        print(scores)
    elif subcommand == "predict":
        if not ckpt_path:
            raise SystemExit("predict requires --trainer.ckpt_path")
        state = _restore_state(module, trainer, ckpt_path)
        if dm.cfg.use_old_weights:
            state = module.load_raw_params(state, dm.cfg.use_old_weights)
            print(f"Injected raw params from {dm.cfg.use_old_weights}")
        infer_ds = dm.infer_ds
        if dm.cfg.list_run_hour:
            # keep only samples whose run hour is requested
            # (reference: lightning.py:1146-1152)
            hours = set(int(h) for h in dm.cfg.list_run_hour)
            try:
                infer_ds = infer_ds.filter_samples(
                    lambda s: s.timestamps.datetime.hour in hours
                )
            except ValueError:
                raise SystemExit(
                    f"No samples with run hour in {sorted(hours)}"
                )
        preds = trainer.predict(module, infer_ds, state)
        out_dir = Path(trainer.config.save_path) / "predictions"
        out_dir.mkdir(parents=True, exist_ok=True)
        import numpy as np

        for i, p in enumerate(preds):
            np.save(out_dir / f"batch_{i}.npy", np.asarray(p.array))
        print(f"Saved {len(preds)} prediction batches to {out_dir}")
        # product export (GIF/GRIB) wired via data.save_gifs / save_gribs
        if dm.cfg.save_gifs or dm.cfg.save_gribs:
            from py4cast_tpu.io.outputs import save_predictions

            save_predictions(
                preds,
                infer_ds,
                out_dir,
                save_gifs=dm.cfg.save_gifs,
                save_gribs=dm.cfg.save_gribs,
                io_conf=module.settings.io_conf,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
