"""Synthetic in-memory fixtures for benchmarks, dry runs and tests.

The analog of the reference's FakeStatics/FakeSumDataset test doubles
(reference: tests/test_models.py:28-60) — builds a full DatasetInfo
(grid statics, stats, diff stats) without touching disk.
"""

from __future__ import annotations

import datetime as dt
from typing import Tuple

import numpy as np

from py4cast_tpu.datasets.access import Stats
from py4cast_tpu.datasets.base import DatasetInfo, Item, ItemBatch, Statics, collate_fn
from py4cast_tpu.named_tensor import NamedArray


def synthetic_statics(grid_shape: Tuple[int, int], border_size: int = 10) -> Statics:
    h, w = grid_shape
    ys, xs = np.meshgrid(
        np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij"
    )
    border = np.zeros((h, w), np.float32)
    if border_size > 0:
        border[:border_size] = border[-border_size:] = 1.0
        border[:, :border_size] = border[:, -border_size:] = 1.0
    gp = np.zeros((h, w), np.float32)
    statics = np.stack([xs, ys, gp, border], axis=-1).astype(np.float32)
    return Statics(
        grid_statics=NamedArray(
            statics,
            ("lat", "lon", "features"),
            ("x", "y", "geopotential", "border_mask"),
        ),
        grid_shape=grid_shape,
    )


def synthetic_dataset_info(
    grid_shape: Tuple[int, int] = (64, 64),
    weather_features: int = 1,
    forcing_features: int = 5,
    border_size: int = 10,
    name: str = "synthetic",
) -> DatasetInfo:
    out_names = tuple(
        f"var{i}_500_isobaricInhPa" for i in range(weather_features)
    )
    forcing_names = tuple(
        [f"forcing{i}" for i in range(forcing_features - 5)]
        + ["cos_hour", "sin_hour", "cos_doy", "sin_doy", "toa_radiation"]
    )
    stats = Stats(
        stats={
            n: {"mean": 0.0, "std": 1.0, "min": -3.0, "max": 3.0}
            for n in out_names + forcing_names
        }
    )
    diff_stats = Stats(
        stats={n: {"mean": 0.0, "std": 1.0} for n in out_names + forcing_names}
    )
    return DatasetInfo(
        name=name,
        units={n: "-" for n in out_names},
        weather_dim=weather_features,
        forcing_dim=forcing_features,
        pred_step=dt.timedelta(hours=1),
        statics=synthetic_statics(grid_shape, border_size),
        stats=stats,
        diff_stats=diff_stats,
        state_weights={n: 1.0 for n in out_names},
        shortnames={
            "input": [],
            "input_output": list(out_names),
            "output": [],
        },
        output_feature_names=out_names,
        forcing_feature_names=forcing_names,
        units_by_feature={n: "-" for n in out_names},
    )


def synthetic_batch(
    info: DatasetInfo,
    batch_size: int = 1,
    num_input_steps: int = 2,
    num_pred_steps: int = 1,
    seed: int = 0,
) -> ItemBatch:
    rng = np.random.default_rng(seed)
    h, w = info.statics.grid_shape
    names = ("timestep", "lat", "lon", "features")
    items = []
    for b in range(batch_size):
        inputs = NamedArray(
            rng.standard_normal((num_input_steps, h, w, info.weather_dim)).astype(
                np.float32
            ),
            names,
            info.output_feature_names,
        )
        outputs = NamedArray(
            rng.standard_normal((num_pred_steps, h, w, info.weather_dim)).astype(
                np.float32
            ),
            names,
            info.output_feature_names,
        )
        forcing = NamedArray(
            rng.standard_normal((num_pred_steps, h, w, info.forcing_dim)).astype(
                np.float32
            ),
            names,
            info.forcing_feature_names,
        )
        t0 = dt.datetime(2023, 1, 1)
        items.append(
            Item(
                inputs=inputs,
                outputs=outputs,
                forcing=forcing,
                validity_times=[
                    t0 + dt.timedelta(hours=i) for i in range(num_pred_steps)
                ],
            )
        )
    return collate_fn(items)


def synthetic_device_arrays(module, batch_size: int = 1,
                            num_pred_steps: int = 1, seed: int = 0):
    """(inputs, forcing, outputs) generated DIRECTLY on device with the
    module's batch shardings — no host-side RNG, no host→device
    transfer. Benchmarks use this so a remote-TPU tunnel never uploads
    ~100 MB of random numbers just to time a train step."""
    import jax
    import jax.numpy as jnp

    from py4cast_tpu.parallel.mesh import batch_sharding

    info = module.dataset_info
    h, w = info.statics.grid_shape
    spatial = (h * w,) if module.is_graph else (h, w)
    shapes = (
        (batch_size, module.settings.num_input_steps) + spatial
        + (info.weather_dim,),
        (batch_size, num_pred_steps) + spatial + (info.forcing_dim,),
        (batch_size, num_pred_steps) + spatial + (info.weather_dim,),
    )
    la = module._batch_lat_axis

    dtypes = tuple(
        jnp.dtype(d) for d in module.batch_arg_dtypes()
    )

    def gen(key):
        ks = jax.random.split(key, len(shapes))
        return tuple(
            jax.random.normal(k, s, jnp.float32).astype(d)
            for k, s, d in zip(ks, shapes, dtypes)
        )

    shardings = tuple(
        batch_sharding(module.mesh, len(s), la) for s in shapes
    )
    return jax.jit(gen, out_shardings=shardings)(jax.random.key(seed))
