"""Ensemble (member-dimension) training end-to-end on the Poesy-style
reforecast: members are extra sample-dim entries (reference:
datasets/base.py:676-722 builds sample_list as period × members;
poesy/__init__.py:92-111 indexes (lat, lon, leadtime, member)). This
drives fit → test → predict through the Trainer on a 2-member dataset
and checks every member is trained on, scored and exported."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_accessors import POESY_CONF, poesy_data  # noqa: F401,E501  (fixture)


def test_poesy_ensemble_training_e2e(poesy_data, tmp_path):  # noqa: F811
    from py4cast_tpu.datasets import get_datasets
    from py4cast_tpu.datasets.compute_stats import (
        compute_parameters_stats,
        compute_time_step_stats,
    )
    from py4cast_tpu.training import (
        AutoRegressiveModule,
        Trainer,
        TrainerConfig,
        TrainingSettings,
    )

    conf = {**POESY_CONF, "settings": {"standardize": False,
                                       "file_format": "npy"}}
    train_ds, val_ds, test_ds = get_datasets(
        "poesy", 2, 1, 1, dataset_conf=conf
    )
    members = {s.member for s in train_ds.sample_list}
    assert members == {0, 3}, members

    # stats over the raw (unstandardized) dataset, then flip
    # standardization on for training — the `prepare` flow
    compute_parameters_stats(train_ds).save(
        train_ds.cache_dir / "parameters_stats.json"
    )
    conf_std = {**conf, "settings": {"standardize": True,
                                     "file_format": "npy"}}
    train_ds, val_ds, test_ds = get_datasets(
        "poesy", 2, 1, 1, dataset_conf=conf_std
    )
    # second (standardized) pass for the time-difference stats
    compute_time_step_stats(train_ds)

    settings = TrainingSettings(
        model_name="HalfUNet",
        settings_init_args={"num_filters": 4, "depth": 2},
        training_strategy="scaled_ar",
        num_input_steps=2,
        num_warmup_steps=2,
    )
    import jax

    from py4cast_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data_parallel=1), jax.devices()[:1])
    module = AutoRegressiveModule(settings, train_ds.dataset_info, mesh=mesh)
    trainer = Trainer(
        TrainerConfig(
            max_epochs=1,
            batch_size=2,
            limit_train_batches=2,
            limit_val_batches=1,
            save_path=tmp_path / "run",
            logging_enabled=False,
            num_workers=0,
        )
    )
    state = trainer.fit(module, train_ds, val_ds)

    scores = trainer.test(module, test_ds, state)
    assert np.isfinite(scores["test_mean_loss"])

    preds = trainer.predict(module, test_ds, state)
    n_exported = sum(p.array.shape[0] for p in preds)
    # every member sample becomes a product (padded tails sliced off)
    assert n_exported == len(test_ds.sample_list), (
        n_exported, len(test_ds.sample_list)
    )
    assert {s.member for s in test_ds.sample_list} == {0, 3}
