"""Parity against the ACTUAL reference implementation, executed.

Unlike test_parity_reference.py (torch restatements written in-repo —
a restatement can repeat the author's own misreading), these tests
import and RUN the genuine py4cast code from /root/reference:

- ``py4cast.forcingutils`` imports cleanly with the installed CPU torch
  (reference: py4cast/forcingutils.py:61-132);
- ``py4cast.datasets.access``'s Grid geometry executes once its
  plotting-only imports (gif/cartopy/mfai/tueplots) are stubbed —
  the stubs replace libraries the geometry never touches
  (reference: py4cast/datasets/access.py:160-264).

Skipped wholesale when /root/reference is not present (CI elsewhere).
"""

import datetime as dt
import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    if "." in name:
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)
    return mod


@pytest.fixture(scope="module")
def reference():
    """Import the real reference modules, stubbing ONLY plotting/
    framework deps the exercised code paths never call (gif, cartopy,
    tueplots figure bundles, mfai's NamedTensor type, lightning).

    The stubs (and the reference's own modules) are REMOVED from
    sys.modules at teardown: a leaked cartopy stub would otherwise make
    this repo's plotters "successfully" import a garbage projection
    instead of taking their no-cartopy fallback path (observed as a
    matplotlib TypeError in test_training)."""
    saved = dict(sys.modules)
    sys.path.insert(0, str(REFERENCE))
    _stub("gif", frame=lambda f: f, save=lambda *a, **k: None)
    _stub("cartopy")
    _stub("cartopy.crs", PlateCarree=object, Stereographic=object)
    _stub("cartopy.feature", BORDERS=None, COASTLINE=None)
    _stub("mfai")
    _stub("mfai.pytorch")
    _stub("mfai.pytorch.namedtensor", NamedTensor=type("NT", (), {}))
    _stub("torchmetrics", Metric=type("Metric", (), {}))
    _stub("lightning")
    _stub("lightning.pytorch", LightningModule=object,
          LightningDataModule=object)
    rc = {"figure.figsize": (5.5, 3.4)}
    _stub(
        "tueplots",
        bundles=types.SimpleNamespace(neurips2023=lambda **k: dict(rc)),
        figsizes=types.SimpleNamespace(neurips2023=lambda **k: dict(rc)),
    )
    import py4cast.datasets.access as ref_access
    import py4cast.forcingutils as ref_forcing

    ns = types.SimpleNamespace(forcing=ref_forcing, access=ref_access)
    yield ns
    sys.path.remove(str(REFERENCE))
    for name in [n for n in sys.modules if n not in saved]:
        del sys.modules[name]
    for name, mod in saved.items():
        if sys.modules.get(name) is not mod:
            sys.modules[name] = mod


#: dates covering leap/non-leap years, year boundaries, sub-hour minutes
DATES = [
    dt.datetime(2020, 2, 29, 23, 30),  # leap day, half hour
    dt.datetime(2023, 1, 1, 0, 0),
    dt.datetime(2024, 12, 31, 18, 15),  # leap year end, term crosses year
    dt.datetime(1999, 7, 14, 6, 0),
]
TERMS = [dt.timedelta(hours=h) for h in (-2, -1, 0, 1, 3, 25)]


def test_calendar_helpers_match_reference_exactly(reference):
    from py4cast_tpu.datasets import forcing as ours

    for date in DATES:
        np.testing.assert_array_equal(
            ours.compute_day_of_years(date, TERMS),
            reference.forcing.compute_day_of_years(date, TERMS),
        )
        np.testing.assert_array_equal(
            ours.compute_hours_of_day(date, TERMS),
            reference.forcing.compute_hours_of_day(date, TERMS),
        )
        np.testing.assert_array_equal(
            ours.compute_seconds_from_start_of_year(date, TERMS),
            reference.forcing.compute_seconds_from_start_of_year(date, TERMS),
        )


def test_year_hour_forcing_matches_reference(reference):
    from py4cast_tpu.datasets import forcing as ours

    for date in DATES:
        ref = reference.forcing.get_year_hour_forcing(date, TERMS).numpy()
        got = ours.get_year_hour_forcing(date, TERMS)
        assert got.shape == ref.shape == (len(TERMS), 4)
        # ours evaluates sin/cos in float64 then casts; the reference
        # evaluates in float32 — agreement is to the f32 rounding of
        # the SAME value (measured max 4.2e-7 ≈ 3 ulp at 1.0), not
        # bitwise
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_toa_radiation_matches_reference(reference):
    import torch

    from py4cast_tpu.datasets import forcing as ours

    # Titan-like subgrid: latitudes descending 55→37, longitudes -12→16
    lats = np.linspace(55.0, 37.0, 24, dtype=np.float64)
    lons = np.linspace(-12.0, 16.0, 20, dtype=np.float64)
    lat2d = np.transpose(np.tile(lats, (len(lons), 1)))
    lon2d = np.tile(lons, (len(lats), 1))

    for date in DATES[:2]:
        ref = reference.forcing.generate_toa_radiation_forcing(
            torch.tensor(lat2d), torch.tensor(lon2d), date, TERMS
        ).numpy()
        got = ours.generate_toa_radiation_forcing(lat2d, lon2d, date, TERMS)
        assert got.shape == ref.shape == (len(TERMS), 24, 20, 1)
        # E0=1366 W/m² scale; f32-vs-f64 trig gives ~1e-4 W/m² slack
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-3)
        # physical sanity both agree on: nonneg, below solar constant
        assert got.min() >= 0.0 and got.max() <= 1366.0


def _grid_config_cls(reference):
    return reference.access.GridConfig


@pytest.mark.parametrize(
    "subdomain", [(0, 0, 0, 0), (100, 356, 200, 520), (1, 33, 2, 34)]
)
def test_grid_geometry_matches_reference(reference, subdomain):
    """Run the REFERENCE Grid class next to ours on the same config and
    pin every geometry product (lat/lon fields, border mask, limits,
    meshgrid) — the coordinate contract RMSE parity depends on."""
    from py4cast_tpu.datasets.access import Grid as OurGrid
    from py4cast_tpu.datasets.access import GridConfig as OurGridConfig

    full = (512, 640)
    lats = np.linspace(55.4, 37.5, full[0])
    lons = np.linspace(-12.0, 16.0, full[1])
    geop = np.random.default_rng(0).random(full)
    lsm = (geop > 0.5).astype(np.float32)

    ref_cfg = _grid_config_cls(reference)(full, lats, lons, geop, lsm)
    our_cfg = OurGridConfig(full, lats, lons, geop, lsm)

    ref_grid = reference.access.Grid(
        name="parity", load_grid_info_func=lambda name: ref_cfg,
        subdomain=subdomain,
    )
    our_grid = OurGrid(
        name="parity", load_grid_info_func=lambda name: our_cfg,
        subdomain=subdomain,
    )

    assert (our_grid.x, our_grid.y) == (ref_grid.x, ref_grid.y)
    assert our_grid.N_grid == ref_grid.N_grid
    np.testing.assert_array_equal(our_grid.lat, ref_grid.lat)
    np.testing.assert_array_equal(our_grid.lon, ref_grid.lon)
    np.testing.assert_array_equal(our_grid.geopotential, ref_grid.geopotential)
    np.testing.assert_array_equal(our_grid.landsea_mask, ref_grid.landsea_mask)
    np.testing.assert_array_equal(
        np.asarray(our_grid.border_mask, bool),
        np.asarray(ref_grid.border_mask, bool),
    )
    assert our_grid.grid_limits == ref_grid.grid_limits
    np.testing.assert_array_equal(our_grid.meshgrid, ref_grid.meshgrid)


def test_grid_border_mask_zero_and_negative(reference):
    """Edge semantics ported faithfully: border_size=0 → all-False mask;
    negative → ValueError (same contract as the reference)."""
    from py4cast_tpu.datasets.access import Grid as OurGrid
    from py4cast_tpu.datasets.access import GridConfig as OurGridConfig

    full = (32, 32)
    cfg_args = (
        full,
        np.linspace(50.0, 40.0, 32),
        np.linspace(0.0, 8.0, 32),
        np.zeros(full),
        None,
    )
    ref_grid = reference.access.Grid(
        name="parity",
        load_grid_info_func=lambda name: _grid_config_cls(reference)(*cfg_args),
        border_size=0,
    )
    our_grid = OurGrid(
        name="parity",
        load_grid_info_func=lambda name: OurGridConfig(*cfg_args),
        border_size=0,
    )
    np.testing.assert_array_equal(
        np.asarray(our_grid.border_mask, bool),
        np.asarray(ref_grid.border_mask, bool),
    )
    with pytest.raises(ValueError):
        _ = OurGrid(
            name="parity",
            load_grid_info_func=lambda name: OurGridConfig(*cfg_args),
            border_size=-1,
        ).border_mask
    with pytest.raises(ValueError):
        _ = reference.access.Grid(
            name="parity",
            load_grid_info_func=lambda name: _grid_config_cls(reference)(*cfg_args),
            border_size=-1,
        ).border_mask
