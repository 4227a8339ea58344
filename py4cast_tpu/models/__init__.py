"""Model registry and plugin discovery.

TPU-native equivalent of the reference registry (reference:
py4cast/models.py:19-89): a name → class dict over the built-in Flax
model zoo, extended by plugin discovery — any importable top-level
module named ``py4cast_tpu_plugin_*`` contributes its ``ModelBase``
subclasses with ``register = True``.
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import traceback
import warnings
from typing import Optional, Tuple, Type

from py4cast_tpu.models.base import (
    ModelBase,
    ModelType,
    settings_from_dict,
)

PLUGIN_PREFIX = "py4cast_tpu_plugin_"

registry: dict = {}


def _register_builtin(module_name: str, class_names: Tuple[str, ...]):
    try:
        mod = importlib.import_module(f"py4cast_tpu.models.{module_name}")
        for cn in class_names:
            kls = getattr(mod, cn)
            registry[cn] = kls
    except ImportError:
        warnings.warn(
            f"Could not import models from {module_name}:\n"
            f"{traceback.format_exc(limit=2)}"
        )


_register_builtin("unet", ("UNet", "CustomUNet", "HalfUNet"))
_register_builtin("deeplab", ("DeepLabV3", "DeepLabV3Plus"))
_register_builtin("segformer", ("Segformer",))
_register_builtin("swin", ("SwinUNetR",))
_register_builtin("unetrpp", ("UNetRPP",))
_register_builtin("graph", ("GraphLAM", "HiLAM", "HiLAMParallel"))


def _discover_plugins():
    """Register ModelBase subclasses from py4cast_tpu_plugin_* modules.

    (reference: py4cast/models.py:23-47)
    """
    for finder, name, ispkg in pkgutil.iter_modules():
        if not name.startswith(PLUGIN_PREFIX):
            continue
        try:
            mod = importlib.import_module(name)
        except ImportError:
            warnings.warn(
                f"Could not import plugin {name}:\n{traceback.format_exc(limit=2)}"
            )
            continue
        for _, kls in inspect.getmembers(mod, inspect.isclass):
            if (
                issubclass(kls, ModelBase)
                and kls is not ModelBase
                and getattr(kls, "register", False)
            ):
                if kls.__name__ in registry and registry[kls.__name__] is not kls:
                    raise ValueError(
                        f"Plugin model name collision: {kls.__name__} from {name} "
                        f"already registered"
                    )
                registry[kls.__name__] = kls


_discover_plugins()

all_nn_architectures = tuple(registry)


def get_model_kls_and_settings(
    model_name: str, settings_init_args: Optional[dict] = None
):
    """(reference: py4cast/models.py:50-63)"""
    lookup = {k.lower(): v for k, v in registry.items()}
    kls = lookup.get(model_name.lower())
    if kls is None:
        raise ValueError(
            f"Model {model_name} not found in registry; "
            f"available: {sorted(registry)}"
        )
    return kls, settings_from_dict(kls.settings_kls, settings_init_args)


def build_model_from_settings(
    model_name: str,
    num_input_features: int,
    num_output_features: int,
    settings,
    input_shape: Tuple[int, ...],
    **extra,
) -> ModelBase:
    """Instantiate a model (reference: py4cast/models.py:66-89)."""
    kls, _ = get_model_kls_and_settings(model_name)
    if len(input_shape) not in kls.supported_num_spatial_dims:
        raise ValueError(
            f"{model_name} supports spatial ranks {kls.supported_num_spatial_dims}, "
            f"got input_shape={input_shape}"
        )
    return kls(
        num_input_features=num_input_features,
        num_output_features=num_output_features,
        input_shape=tuple(input_shape),
        settings=settings,
        **extra,
    )


__all__ = [
    "ModelBase",
    "ModelType",
    "registry",
    "all_nn_architectures",
    "get_model_kls_and_settings",
    "build_model_from_settings",
    "settings_from_dict",
]
