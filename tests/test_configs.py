"""Every shipped model YAML must parse, validate against its settings
dataclass, and build a model instance."""

from pathlib import Path

import pytest
import yaml

from py4cast_tpu.models import ModelType, build_model_from_settings, get_model_kls_and_settings

CONFIGS = sorted(
    (Path(__file__).resolve().parent.parent / "config/CLI/model").glob("*.yaml")
)


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.stem)
def test_model_config_builds(path):
    with open(path) as f:
        conf = yaml.safe_load(f)["model"]
    kls, settings = get_model_kls_and_settings(
        conf["model_name"], conf.get("settings_init_args")
    )
    extra = {}
    if kls.model_type == ModelType.GRAPH:
        import numpy as np

        mesh = np.stack(
            np.meshgrid(np.linspace(0, 1, 16), np.linspace(0, 1, 16), indexing="ij")
        )
        extra["graph"] = kls.build_graph(settings, mesh)
        shape = (256,)
    else:
        shape = (16, 16)
    model = build_model_from_settings(
        conf["model_name"], 5, 3, settings, shape, **extra
    )
    assert model is not None
    # strategy/loss keys must be consumable by TrainingSettings
    from py4cast_tpu.training import TrainingSettings

    ts = TrainingSettings(
        model_name=conf["model_name"],
        settings_init_args=conf.get("settings_init_args"),
        losses=conf["losses"],
        training_strategy=conf["training_strategy"],
        num_inter_steps=conf["num_inter_steps"],
        learning_rate=conf["learning_rate"],
        min_learning_rate=conf["min_learning_rate"],
        num_warmup_steps=conf["num_warmup_steps"],
        betas=tuple(conf["betas"]),
        mask_ratio=conf["mask_ratio"],
    )
    assert ts.learning_rate == pytest.approx(1e-3)
