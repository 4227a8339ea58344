"""In-repo GRIB2 codec + template-based product writer.

The reference's GRIB path embeds the model subgrid into an operational
template via epygram (reference: io/outputs.py:116-220); here the same
workflow runs on the dependency-free codec (py4cast_tpu/io/grib2.py),
so the full path — template read → match_latlon → fill_tensor_with →
re-encode → read-back — is testable hermetically.
"""

import datetime as dt

import numpy as np
import pytest

from py4cast_tpu.io.grib2 import (
    Grib2Field,
    make_template,
    read_grib2,
    write_grib2,
)
from py4cast_tpu.io.outputs import (
    OutputSavingSettings,
    feature2fid,
    save_named_tensors_to_grib,
    template_fids_for_features,
)
from py4cast_tpu.named_tensor import NamedArray


def _field(values, lat, lon, **kw):
    return Grib2Field(values=values, lat=lat, lon=lon, **kw)


def test_codec_roundtrip_values_and_ids(tmp_path):
    rng = np.random.default_rng(0)
    lat = np.linspace(50.0, 40.0, 21)  # descending (north→south scan)
    lon = np.linspace(-6.0, 4.0, 21)  # crosses the 0 meridian
    values = rng.uniform(250.0, 310.0, (21, 21))
    f = _field(
        values, lat, lon, discipline=0, parameter_category=0,
        parameter_number=0, type_of_level=103, level=2,
        data_date=dt.date(2023, 3, 1), data_time=(6, 0), forecast_hours=12,
    )
    path = write_grib2(tmp_path / "t2m.grib", [f])
    (back,) = read_grib2(path)

    np.testing.assert_allclose(back.lat, lat, atol=1e-5)
    np.testing.assert_allclose(back.lon, lon, atol=1e-5)
    # 16-bit simple packing: quantum = range / 65535
    np.testing.assert_allclose(np.asarray(back.values), values, atol=2e-3)
    assert back.param_key() == f.param_key()
    assert back.data_date == f.data_date and back.data_time == (6, 0)
    assert back.forecast_hours == 12
    assert back.validity_time() == dt.datetime(2023, 3, 1, 18, 0)


def test_codec_bitmap_masks_roundtrip(tmp_path):
    lat = np.linspace(10.0, 0.0, 11)
    lon = np.linspace(0.0, 10.0, 11)
    values = np.ma.masked_invalid(np.full((11, 11), np.nan))
    values[3:6, 2:7] = 42.5
    f = _field(values, lat, lon)
    (back,) = read_grib2(write_grib2(tmp_path / "m.grib", [f]))
    assert back.values.count() == 15
    np.testing.assert_allclose(back.values[3:6, 2:7], 42.5, atol=1e-6)
    assert np.ma.is_masked(back.values[0, 0])


def test_codec_constant_field_and_pdt8(tmp_path):
    lat = np.linspace(5.0, 0.0, 6)
    lon = np.linspace(0.0, 5.0, 6)
    f = _field(
        np.full((6, 6), 7.25), lat, lon, parameter_category=1,
        parameter_number=8, pdt=8, stat_processing=1,
        length_of_time_range=3, forecast_hours=6,
        data_date=dt.date(2024, 1, 2), data_time=(0, 0),
    )
    (back,) = read_grib2(write_grib2(tmp_path / "c.grib", [f]))
    np.testing.assert_allclose(np.asarray(back.values), 7.25, atol=1e-6)
    assert back.pdt == 8
    assert back.length_of_time_range == 3
    assert back.stat_processing == 1


def test_codec_24bit_precision(tmp_path):
    rng = np.random.default_rng(1)
    values = rng.standard_normal((8, 8)) * 1e4
    f = _field(
        values, np.linspace(8, 0, 8), np.linspace(0, 8, 8), bits_per_value=24
    )
    (back,) = read_grib2(write_grib2(tmp_path / "p.grib", [f]))
    np.testing.assert_allclose(np.asarray(back.values), values, atol=5e-3)


class _FakeGrid:
    def __init__(self, lat_1d, lon_1d):
        self.lat = np.tile(lat_1d[:, None], (1, len(lon_1d)))
        self.lon = np.tile(lon_1d[None, :], (len(lat_1d), 1))


@pytest.fixture()
def template_setup(tmp_path):
    """A 40×40 template grid with the model grid as an inner 16×16 block."""
    tlat = np.linspace(55.0, 35.5, 40)  # 0.5° descending
    tlon = np.linspace(-10.0, 9.5, 40)
    glat = tlat[10:26]
    glon = tlon[8:24]
    features = ("aro_t2m_2_heightAboveGround", "aro_tp_0_surface")
    template = tmp_path / "template.grib"
    make_template(template, tlat, tlon, template_fids_for_features(features))
    settings = OutputSavingSettings(
        template_grib=str(template),
        directory=str(tmp_path / "out"),
        output_kwargs=("run",),
        sample_identifiers=("date", "leadtime"),
        path_to_runtime="{}/{}_+{}h.grib",
    )
    return settings, _FakeGrid(glat, glon), features, (tlat, tlon)


def test_template_based_grib_export(template_setup):
    settings, grid, features, (tlat, tlon) = template_setup
    rng = np.random.default_rng(3)
    t0 = dt.datetime(2023, 6, 1, 12)
    validity = [t0 + dt.timedelta(hours=h) for h in (1, 2)]
    pred = NamedArray(
        rng.uniform(260, 300, (2, 16, 16, 2)).astype(np.float32),
        ("timestep", "lat", "lon", "features"),
        features,
    )
    written = save_named_tensors_to_grib(
        pred, grid, validity, settings,
        sample_identifiers=("20230601T12",),
        base_datetime=t0, time_step_hours=1,
    )
    assert len(written) == 2  # one file per leadtime
    assert written[0].name == "20230601T12_+1h.grib"

    fields = read_grib2(written[0])
    assert len(fields) == 2  # both features written
    by_num = {f.parameter_number: f for f in fields}
    t2m = by_num[feature2fid(features[0])["parameterNumber"]]
    # full template grid, model block embedded, outside masked
    assert t2m.values.shape == (40, 40)
    assert t2m.values.count() == 16 * 16
    embedded = np.asarray(t2m.values[10:26, 8:24])
    np.testing.assert_allclose(
        embedded, np.asarray(pred.array)[0, :, :, 0], atol=2e-2
    )
    assert np.ma.is_masked(t2m.values[0, 0])
    assert t2m.forecast_hours == 1
    assert t2m.validity_time() == validity[0]
    # cumulative precip keeps its statistical (pdt 8) encoding
    tp = by_num[feature2fid(features[1])["parameterNumber"]]
    assert tp.pdt == 8 and tp.length_of_time_range == 1


def test_template_export_ascending_model_grid(template_setup):
    """Model rows stored south→north must be flipped into the
    north→south template scan."""
    settings, grid, features, _ = template_setup
    asc_grid = _FakeGrid(grid.lat[::-1, 0], grid.lon[0])
    rng = np.random.default_rng(4)
    data = rng.uniform(0, 1, (1, 16, 16, 2)).astype(np.float32)
    pred = NamedArray(
        data, ("timestep", "lat", "lon", "features"), features
    )
    t0 = dt.datetime(2023, 6, 1, 0)
    written = save_named_tensors_to_grib(
        pred, asc_grid, [t0 + dt.timedelta(hours=1)], settings,
        sample_identifiers=("x",), base_datetime=t0,
    )
    (fields) = read_grib2(written[0])
    t2m = [f for f in fields if f.parameter_number ==
           feature2fid(features[0])["parameterNumber"]][0]
    np.testing.assert_allclose(
        np.asarray(t2m.values[10:26, 8:24]), data[0, ::-1, :, 0], atol=2e-4
    )


def test_template_missing_warns_and_skips(tmp_path):
    settings = OutputSavingSettings(
        template_grib=str(tmp_path / "nope.grib"),
        directory=str(tmp_path),
        sample_identifiers=("date",),
        path_to_runtime="{}.grib",
    )
    pred = NamedArray(
        np.zeros((1, 4, 4, 1), np.float32),
        ("timestep", "lat", "lon", "features"),
        ("aro_t2m_2_heightAboveGround",),
    )
    grid = _FakeGrid(np.linspace(4, 1, 4), np.linspace(0, 3, 4))
    with pytest.warns(UserWarning, match="template_grib"):
        out = save_named_tensors_to_grib(
            pred, grid, [dt.datetime(2023, 1, 1, 1)], settings, ("d",)
        )
    assert out == []
