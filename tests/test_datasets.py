"""Dataset layer tests: items, collate, forcings, dummy end-to-end.

Mirrors the reference test strategy (reference: tests/test_datasets.py).
"""

import datetime as dt

import numpy as np
import pytest

from py4cast_tpu.datasets import get_datasets
from py4cast_tpu.datasets.base import Item, ItemBatch, collate_fn
from py4cast_tpu.datasets.forcing import (
    generate_toa_radiation_forcing,
    get_year_hour_forcing,
)
from py4cast_tpu.named_tensor import NamedArray


def make_item(n_in=2, n_pred=3, hw=8, f=2):
    names = ("timestep", "lat", "lon", "features")
    feats = tuple(f"feat{i}" for i in range(f))
    rng = np.random.default_rng(0)
    return Item(
        inputs=NamedArray(
            rng.normal(size=(n_in, hw, hw, f)).astype(np.float32), names, feats
        ),
        outputs=NamedArray(
            rng.normal(size=(n_pred, hw, hw, f)).astype(np.float32), names, feats
        ),
        forcing=NamedArray(
            rng.normal(size=(n_pred, hw, hw, 3)).astype(np.float32),
            names,
            ("fa", "fb", "fc"),
        ),
        validity_times=[dt.datetime(2023, 1, 1) + dt.timedelta(hours=h) for h in range(n_pred)],
    )


def test_item_invariants():
    item = make_item()
    assert item.inputs.names == item.outputs.names

    names = ("timestep", "lat", "lon", "features")
    bad_out = NamedArray(np.zeros((3, 8, 8, 1), np.float32), names, ("other",))
    with pytest.raises(ValueError):
        Item(
            inputs=item.inputs,
            outputs=bad_out,
            forcing=item.forcing,
            validity_times=item.validity_times,
        )


def test_collate_adds_batch_dim():
    items = [make_item() for _ in range(4)]
    batch = collate_fn(items)
    assert isinstance(batch, ItemBatch)
    assert batch.inputs.names == ("batch", "timestep", "lat", "lon", "features")
    assert batch.batch_size == 4
    assert batch.num_input_steps == 2
    assert batch.num_pred_steps == 3
    assert batch.outputs.array.dtype == np.float32


def test_year_hour_forcing_new_year_midnight():
    """At new-year midnight all four angles are at sin=0/cos=1 → [0.5, 1, 0.5, 1]."""
    date = dt.datetime(2023, 1, 1, 0)
    f = get_year_hour_forcing(date, [dt.timedelta(hours=0)])
    np.testing.assert_allclose(f[0], [0.5, 1.0, 0.5, 1.0], atol=1e-6)


def test_year_hour_forcing_range_and_shape():
    date = dt.datetime(2023, 6, 15, 9, 30)
    terms = [dt.timedelta(hours=h) for h in range(5)]
    f = get_year_hour_forcing(date, terms)
    assert f.shape == (5, 4)
    assert (f >= 0).all() and (f <= 1).all()


def test_solar_forcing_textbook_value():
    """Duffie & Beckman example 1.6.1: Madison (43.1N, 89.4W),
    Feb 13 at 9:30 local solar time → cos(sza) ≈ cos(66.5°).
    Local solar hour = UTC + lon/15 → UTC 9.5 - (-89.4)/15 = 15.46h.
    """
    lat = np.array([[43.1]])
    lon = np.array([[-89.4]])
    date = dt.datetime(2023, 2, 13, 15, 27, 36)  # 15.46 UTC
    toa = generate_toa_radiation_forcing(lat, lon, date, [dt.timedelta(0)])
    expected = 1366 * np.cos(np.radians(66.5))
    assert toa.shape == (1, 1, 1, 1)
    np.testing.assert_allclose(toa[0, 0, 0, 0], expected, rtol=0.02)


def test_solar_forcing_night_is_zero():
    lat = np.array([[45.0]])
    lon = np.array([[0.0]])
    date = dt.datetime(2023, 6, 15, 0, 0)  # midnight UTC at lon 0
    toa = generate_toa_radiation_forcing(lat, lon, date, [dt.timedelta(0)])
    assert toa[0, 0, 0, 0] == 0.0


def test_solar_forcing_shape():
    lat = np.zeros((8, 16))
    lon = np.zeros((8, 16))
    toa = generate_toa_radiation_forcing(
        lat, lon, dt.datetime(2023, 3, 1, 12), [dt.timedelta(hours=h) for h in range(3)]
    )
    assert toa.shape == (3, 8, 16, 1)


def test_dummy_dataset_end_to_end():
    train, valid, test = get_datasets("dummy", 2, 3, 3)
    assert len(train) > 0
    item = train[0]
    assert item.inputs.shape == (2, 64, 64, 1)
    assert item.outputs.shape == (3, 64, 64, 1)
    # forcing = 4 calendar + 1 solar (no `input` params in dummy)
    assert item.forcing.shape == (3, 64, 64, 5)
    assert item.forcing.feature_names == (
        "cos_hour",
        "sin_hour",
        "cos_doy",
        "sin_doy",
        "toa_radiation",
    )

    info = train.dataset_info
    assert info.weather_dim == 1
    assert info.forcing_dim == 5
    statics = info.statics
    assert statics.grid_statics.feature_names == (
        "x",
        "y",
        "geopotential",
        "border_mask",
    )
    assert statics.grid_shape == (64, 64)
    assert statics.border_mask.sum() > 0
    assert (statics.border_mask + statics.interior_mask == 1).all()


def test_filter_samples_by_run_hour():
    """`WeatherDataset.filter_samples` narrows the sample list without
    mutating the original — the supported API behind the CLI's
    ``list_run_hour`` option (reference: lightning.py:1146-1152)."""
    import pytest

    train, _, _ = get_datasets("dummy", 1, 1, 1)
    n_before = len(train)
    hours = {s.timestamps.datetime.hour for s in train.sample_list}
    assert len(hours) > 1  # dummy samples span several run hours
    keep = sorted(hours)[0]
    filtered = train.filter_samples(
        lambda s: s.timestamps.datetime.hour == keep
    )
    assert 0 < len(filtered) < n_before
    assert all(
        s.timestamps.datetime.hour == keep for s in filtered.sample_list
    )
    assert len(train) == n_before  # original untouched
    with pytest.raises(ValueError):
        train.filter_samples(lambda s: False)


def test_dummy_loader_batches():
    train, _, _ = get_datasets("dummy", 1, 1, 1)
    loader = train.loader(batch_size=4, num_workers=2, shuffle=True)
    batches = list(loader)
    assert len(batches) == len(train) // 4
    b = batches[0]
    assert b.inputs.shape == (4, 1, 64, 64, 1)
    assert b.outputs.shape == (4, 1, 64, 64, 1)
    assert b.forcing.shape == (4, 1, 64, 64, 5)


def test_statics_flatten():
    train, _, _ = get_datasets("dummy", 1, 1, 1)
    st = train.statics.flatten_spatial()
    assert st.grid_statics.names == ("ngrid", "features")
    assert st.grid_statics.shape == (64 * 64, 4)
    assert st.border_mask.shape == (64 * 64, 1)
