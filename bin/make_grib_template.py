"""Generate a template GRIB for a dataset's grid and output features.

The reference's GRIB export reads an operational Météo-France template
file (reference: io/outputs.py:135) that is not redistributable; this
utility builds an equivalent one from any registered dataset with the
in-repo codec — one constant field per exportable feature, on the model
grid optionally padded by a margin (emulating the larger operational
domain the prediction is embedded into).

Usage:
    python bin/make_grib_template.py --dataset dummy --output template.grib \
        --margin 8
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True, help="registered dataset name")
    parser.add_argument("--output", required=True, type=Path)
    parser.add_argument(
        "--margin", type=int, default=0,
        help="extra grid cells added on every side of the model grid",
    )
    parser.add_argument("--num-input-steps", type=int, default=2)
    parser.add_argument("--num-pred-steps", type=int, default=1)
    args = parser.parse_args()

    from py4cast_tpu.datasets import get_datasets
    from py4cast_tpu.io.grib2 import make_template
    from py4cast_tpu.io.outputs import template_fids_for_features

    train_ds, _, _ = get_datasets(
        args.dataset, args.num_input_steps, args.num_pred_steps,
        args.num_pred_steps,
    )
    grid = train_ds.grid
    lat = np.asarray(grid.lat)[:, 0]
    lon = np.asarray(grid.lon)[0, :]
    if args.margin:
        dlat = lat[1] - lat[0] if len(lat) > 1 else 1.0
        dlon = lon[1] - lon[0] if len(lon) > 1 else 1.0
        lat = np.concatenate([
            lat[0] - dlat * np.arange(args.margin, 0, -1),
            lat,
            lat[-1] + dlat * np.arange(1, args.margin + 1),
        ])
        lon = np.concatenate([
            lon[0] - dlon * np.arange(args.margin, 0, -1),
            lon,
            lon[-1] + dlon * np.arange(1, args.margin + 1),
        ])

    features = train_ds.dataset_info.output_feature_names
    fids = template_fids_for_features(features)
    make_template(args.output, lat, lon, fids)
    print(
        f"Wrote template with {len(fids)} fields on a "
        f"{len(lat)}x{len(lon)} grid to {args.output}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
