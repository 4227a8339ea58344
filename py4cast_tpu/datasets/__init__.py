"""Dataset registry and entry point.

TPU-native equivalent of the reference registry (reference:
py4cast/datasets/__init__.py:7-79): name-substring lookup with
loose-coupled imports so one broken accessor never kills the package.
"""

import traceback
import warnings
from pathlib import Path
from typing import Dict, Optional, Tuple

from py4cast_tpu.datasets.base import WeatherDataset

registry: Dict[str, type] = {}

try:
    from py4cast_tpu.datasets.dummy import DummyAccessor

    registry["dummy"] = DummyAccessor
except ImportError:
    warnings.warn(f"Could not import DummyAccessor:\n{traceback.format_exc(limit=1)}")

try:
    from py4cast_tpu.datasets.titan import TitanAccessor

    registry["titan"] = TitanAccessor
except ImportError:
    warnings.warn(f"Could not import TitanAccessor:\n{traceback.format_exc(limit=1)}")

try:
    from py4cast_tpu.datasets.poesy import PoesyAccessor

    registry["poesy"] = PoesyAccessor
except ImportError:
    warnings.warn(f"Could not import PoesyAccessor:\n{traceback.format_exc(limit=1)}")

try:
    from py4cast_tpu.datasets.rainfall import RainfallAccessor

    registry["rainfall"] = RainfallAccessor
except ImportError:
    warnings.warn(
        f"Could not import RainfallAccessor:\n{traceback.format_exc(limit=1)}"
    )


def get_accessor(name: str) -> type:
    """Look up an accessor class whose registered key is a substring of name."""
    for key, kls in registry.items():
        if key in name.lower():
            return kls
    raise ValueError(
        f"Dataset {name} not found in registry, available: {list(registry)}"
    )


def get_datasets(
    name: str,
    num_input_steps: int,
    num_pred_steps_train: int,
    num_pred_steps_val_test: int,
    dataset_conf: Optional[dict] = None,
    config_override: Optional[dict] = None,
) -> Tuple[WeatherDataset, WeatherDataset, WeatherDataset]:
    """Build the (train, valid, test) datasets for the named dataset."""
    accessor_kls = get_accessor(name)
    if dataset_conf is None:
        dataset_conf = accessor_kls.default_config()
    elif isinstance(dataset_conf, (str, Path)):
        return WeatherDataset.from_json(
            accessor_kls,
            Path(dataset_conf),
            num_input_steps,
            num_pred_steps_train,
            num_pred_steps_val_test,
            config_override,
        )
    if config_override is not None:
        # same override semantics as the json path (reference:
        # base.py:930-933 applies merge_dicts on every construction path)
        from py4cast_tpu.utils import merge_dicts

        dataset_conf = merge_dicts(dataset_conf, config_override)
    return WeatherDataset.from_dict(
        accessor_kls,
        name,
        dataset_conf,
        num_input_steps,
        num_pred_steps_train,
        num_pred_steps_val_test,
    )
