"""Real-dataset accessor tests on synthetic on-disk data (titan npy
layout, poesy memory-mapped ensemble arrays, rainfall npz), plus the
dataset CLI commands (reference analog: per-dataset CLIs and accessor
contracts, SURVEY.md §2.1)."""

import datetime as dt
import json
from pathlib import Path

import numpy as np
import pytest

from py4cast_tpu import settings as p4t_settings


# ----------------------------------------------------------------- titan
TITAN_CONF = {
    "periods": {
        "train": {"start": 20230101, "end": 20230101, "obs_step": 3600},
        "valid": {"start": 20230102, "end": 20230102, "obs_step": 3600},
        "test": {"start": 20230102, "end": 20230102, "obs_step": 3600},
    },
    "grid": {
        "name": "PAAROME_1S40",
        "border_size": 2,
        "subdomain": [100, 132, 240, 272],
    },
    "settings": {"standardize": True, "file_format": "npy"},
    "params": {
        "aro_t2m": {"levels": [2], "kind": "input_output"},
        "arp_t": {"levels": [500], "kind": "input"},
    },
}


@pytest.fixture(scope="module")
def titan_data():
    from py4cast_tpu.datasets.titan import FORMATSTR, TitanAccessor

    rng = np.random.default_rng(0)
    # npy layout: <root>/subdatasets/<name>_<grid>_<subdomain>/data/<date>/<param>.npy
    dates = [
        dt.datetime(2023, 1, 1) + dt.timedelta(hours=h) for h in range(0, 40)
    ] + [dt.datetime(2023, 1, 2) + dt.timedelta(hours=h) for h in range(0, 40)]
    base = (
        p4t_settings.TITAN_PATH
        / "subdatasets"
        / "titan_aro_arp_PAAROME_1S40_100-132-240-272"
        / "data"
    )
    for date in dates:
        d = base / date.strftime(FORMATSTR)
        d.mkdir(parents=True, exist_ok=True)
        np.save(d / "aro_t2m_2m.npy",
                rng.standard_normal((32, 32)).astype(np.float32) * 5 + 285)
        np.save(d / "arp_t_500hpa.npy",
                rng.standard_normal((32, 32)).astype(np.float32) * 5 + 260)
    return TitanAccessor


def test_titan_dataset_builds_and_loads(titan_data):
    from py4cast_tpu.datasets import get_datasets
    from py4cast_tpu.datasets.compute_stats import (
        compute_parameters_stats,
        compute_time_step_stats,
    )

    train_ds, _, _ = get_datasets(
        "titan_aro_arp", 2, 1, 1, dataset_conf=TITAN_CONF
    )
    # stats do not exist yet: compute them (prepare path)
    train_ds.settings.standardize = False
    compute_parameters_stats(train_ds)
    train_ds.__dict__.pop("sample_list", None)
    train_ds.settings.standardize = True
    compute_time_step_stats(train_ds)

    train_ds.__dict__.pop("sample_list", None)
    item = train_ds[0]
    assert item.inputs.array.shape == (2, 32, 32, 1)  # aro_t2m only
    assert item.outputs.feature_names == ("aro_t2m_2m",)
    # forcing = arp_t + 4 calendar + solar
    assert item.forcing.array.shape == (1, 32, 32, 6)
    assert item.forcing.feature_names[0] == "arp_t_500hpa"
    # standardized values should be O(1)
    assert abs(float(np.mean(item.inputs.array))) < 1.0

    info = train_ds.dataset_info
    assert info.weather_dim == 1 and info.forcing_dim == 6
    # level weighting (reference: titan/__init__.py:22-30)
    assert train_ds.params[1].state_weight == 1.5


def test_titan_weight_per_level(titan_data):
    assert titan_data.get_weight_per_level(500, "isobaricInhPa") == 1.5
    assert titan_data.get_weight_per_level(2, "heightAboveGround") == 2.0


def test_titan_fused_batch_read_matches_per_param(titan_data):
    """Sample.load's whole-sample fused native read must engage for the
    Titan npy layout and produce exactly the per-param path's item."""
    from py4cast_tpu.datasets import get_datasets

    train_ds, _, _ = get_datasets(
        "titan_aro_arp", 2, 1, 1, dataset_conf=TITAN_CONF
    )
    train_ds.settings.standardize = False
    sample = train_ds.sample_list[0]
    batched = sample._batched_param_arrays(standardize=False)
    assert batched is not None, "fused path must engage for npy Titan"
    for p in sample.params:
        name = sample.accessor.parameter_namer(p)
        ref = sample.get_param_array(
            p, sample._param_stamps(p), standardize=False
        )
        np.testing.assert_array_equal(batched[name], ref)


def test_titan_grid_geometry():
    from py4cast_tpu.datasets.titan import TitanAccessor

    cfg = TitanAccessor.load_grid_info("PAAROME_1S40")
    assert cfg.full_size == (717, 1121)
    assert cfg.latitude[0] > cfg.latitude[-1]  # north to south
    assert len(cfg.latitude) == 717 and len(cfg.longitude) == 1121


# ----------------------------------------------------------------- poesy
@pytest.fixture(scope="module")
def poesy_data():
    from py4cast_tpu.datasets.poesy import LATLON_FNAME, OROGRAPHY_FNAME

    rng = np.random.default_rng(1)
    root = p4t_settings.POESY_PATH
    root.mkdir(parents=True, exist_ok=True)
    n = 24
    np.save(root / OROGRAPHY_FNAME,
            rng.uniform(-10, 500, (n, n)).astype(np.float32))
    lons, lats = np.meshgrid(np.linspace(-5, 5, n), np.linspace(50, 40, n))
    np.save(root / LATLON_FNAME, np.stack([lons, lats]).astype(np.float32))
    for var in ("t2m", "u", "v"):
        for run in ("2021-06-01T00:00:00Z", "2021-06-01T12:00:00Z"):
            np.save(
                root / f"{run}_{var}_lt1-45_crop.npy",
                rng.standard_normal((n, n, 45, 16)).astype(np.float32),
            )
    return root


POESY_CONF = {
    "periods": {
        "train": {
            "start": 20210601, "end": 20210601,
            "refcst_daily_runs": [0, 43200],
            "refcst_leadtime_start_in_sec": 3600,
            "refcst_leadtime_end_in_sec": 43200,
            "refcst_leadtime_step_in_sec": 3600,
        },
        "valid": {
            "start": 20210601, "end": 20210601,
            "refcst_daily_runs": [0],
            "refcst_leadtime_start_in_sec": 3600,
            "refcst_leadtime_end_in_sec": 21600,
            "refcst_leadtime_step_in_sec": 3600,
        },
        "test": {
            "start": 20210601, "end": 20210601,
            "refcst_daily_runs": [0],
            "refcst_leadtime_start_in_sec": 3600,
            "refcst_leadtime_end_in_sec": 21600,
            "refcst_leadtime_step_in_sec": 3600,
        },
    },
    "grid": {"name": "EURW1S40", "border_size": 2},
    "settings": {"standardize": False, "file_format": "npy"},
    "members": [0, 3],
    "params": {
        "t2m": {"levels": [2], "kind": "input_output"},
        "u10": {"levels": [10], "kind": "input_output"},
    },
}


def test_poesy_dataset_members_and_leadtimes(poesy_data):
    from py4cast_tpu.datasets import get_datasets

    train_ds, _, _ = get_datasets("poesy", 1, 1, 1, dataset_conf=POESY_CONF)
    samples = train_ds.sample_list
    assert samples, "no poesy samples found"
    members = {s.member for s in samples}
    assert members == {0, 3}
    item = samples[0].load()
    assert item.inputs.array.shape == (1, 24, 24, 2)
    assert item.outputs.array.shape == (1, 24, 24, 2)
    # landsea mask derivable from orography
    assert train_ds.grid.landsea_mask.max() == 1.0


def test_poesy_leadtime_pruning(poesy_data):
    """Windows reaching past +45h must be pruned before existence checks
    (reference: poesy/__init__.py:126-159)."""
    from py4cast_tpu.datasets.poesy import PoesyAccessor

    ok = PoesyAccessor.optional_check_before_exists(
        dt.datetime(2021, 6, 1), 1, 1, dt.timedelta(hours=1),
        dt.timedelta(hours=10),
    )
    too_late = PoesyAccessor.optional_check_before_exists(
        dt.datetime(2021, 6, 1), 1, 1, dt.timedelta(hours=1),
        dt.timedelta(hours=45),
    )
    assert ok and not too_late


# --------------------------------------------------------------- rainfall
@pytest.fixture(scope="module")
def rainfall_data():
    rng = np.random.default_rng(2)
    root = p4t_settings.RAINFALL_PATH / "Hexagone" / "2023"
    root.mkdir(parents=True, exist_ok=True)
    t0 = dt.datetime(2023, 6, 1)
    for i in range(12):
        date = t0 + dt.timedelta(minutes=5 * i)
        arr = rng.integers(-10, 500, (64, 64)).astype(np.int32)
        np.savez_compressed(root / f"{date.strftime('%Y%m%d%H%M')}.npz", arr)
    return root


RAINFALL_CONF = {
    "periods": {
        "train": {"start": 20230601, "end": 20230601, "obs_step": 300},
        "valid": {"start": 20230601, "end": 20230601, "obs_step": 300},
        "test": {"start": 20230601, "end": 20230601, "obs_step": 300},
    },
    "grid": {"name": "rain", "border_size": 2, "subdomain": [0, 64, 0, 64]},
    "settings": {"standardize": False, "file_format": "npz"},
    "params": {"precip": {"levels": [0], "kind": "input_output"}},
}


def test_rainfall_loads_and_converts_units(rainfall_data):
    from py4cast_tpu.datasets import get_datasets

    train_ds, _, _ = get_datasets("rainfall", 1, 1, 1, dataset_conf=RAINFALL_CONF)
    samples = train_ds.sample_list
    assert samples
    item = samples[0].load()
    arr = np.asarray(item.outputs.array)
    assert arr.min() >= 0.0  # negatives (out of radar field) zeroed
    assert arr.max() <= 500 / 100 * 12  # unit conversion applied


# ------------------------------------------------------------ dataset CLI
def test_dataset_cli_describe_and_speedtest(capsys):
    from py4cast_tpu.datasets.dataset_cli import main

    main(["dummy", "describe"])
    out = capsys.readouterr().out
    assert "Summarizing" in out and "Example item" in out

    main(["dummy", "speedtest", "--batch-size", "2", "--n-iter", "2"])
    out = capsys.readouterr().out
    assert "samples/s" in out


def test_dataset_cli_prepare_computes_stats(tmp_path, capsys):
    from py4cast_tpu.datasets.dataset_cli import main

    conf = dict(TITAN_CONF)
    main([
        "titan_aro_arp", "prepare",
        "--dataset-conf", str(_write_json(tmp_path, conf)),
        "--num-input-steps", "2",
    ])
    out = capsys.readouterr().out
    assert "statistics saved" in out


def _write_json(tmp_path: Path, conf: dict) -> Path:
    p = tmp_path / "conf.json"
    with open(p, "w") as f:
        json.dump(conf, f)
    return p

def test_poesy_grib_export_e2e(poesy_data, tmp_path):
    """VERDICT r2 #9: export a Poesy-member prediction through the GRIB
    codec with member-aware paths (reference:
    config/IO/poesy_grib_settings.json, io/outputs.py:116-220)."""
    from py4cast_tpu.datasets import get_datasets
    from py4cast_tpu.io.grib2 import make_template, read_grib2
    from py4cast_tpu.io.outputs import (
        save_predictions,
        template_fids_for_features,
    )
    from py4cast_tpu.named_tensor import NamedArray

    _, _, test_ds = get_datasets("poesy", 1, 1, 1, dataset_conf=POESY_CONF)
    sample = test_ds.sample_list[-1]  # a non-zero member
    assert sample.member == 3

    grid = test_ds.grid
    lat = np.asarray(grid.lat)[:, 0]
    lon = np.asarray(grid.lon)[0, :]
    feats = [
        test_ds.accessor.parameter_namer(p)
        for p in test_ds.params
        if p.kind in ("output", "input_output")
    ]
    fids = template_fids_for_features(feats)
    assert fids, f"no GRIB ids for poesy features {feats}"
    template = tmp_path / "poesy_template.grib"
    make_template(template, lat, lon, fids)

    conf = json.loads(
        (Path(__file__).parent.parent / "config/IO/poesy_grib_settings.json")
        .read_text()
    )
    conf["template_grib"] = str(template)
    conf["directory"] = str(tmp_path / "gribs")
    io_conf = tmp_path / "io.json"
    io_conf.write_text(json.dumps(conf))

    item = sample.load(no_standardize=True)
    pred = NamedArray(
        np.asarray(item.outputs.array)[None],
        ("batch", "timestep", "lat", "lon", "features"),
        item.outputs.feature_names,
    )
    # patch the dataset's sample list so prediction 0 IS this member
    test_ds.__dict__["sample_list"] = [sample]
    save_predictions(
        [pred], test_ds, tmp_path / "out", save_gribs=True,
        io_conf=str(io_conf),
    )
    gribs = sorted((tmp_path / "gribs").rglob("*.grib"))
    assert gribs, "poesy GRIB export wrote nothing"
    # member-aware path layout: .../mb3/...
    assert any("/mb3/" in str(g) for g in gribs), gribs
    fields = read_grib2(gribs[0])
    assert fields, "exported poesy GRIB decodes to zero fields"
