"""GeoJSON output/ingest edge roundtrip (M3/M4)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from rustac_ray.stages.geojson import (
    from_geojson_records,
    parse_datetime_series,
    to_geojson_records,
)


def test_roundtrip_via_geojson(fixtures_dir):
    t = pq.read_table(f"{fixtures_dir}/stac_items.parquet").slice(0, 20)
    records = to_geojson_records(t)
    assert records[0]["type"] == "Feature"
    assert records[0]["geometry"]["type"] == "Polygon"
    assert len(records[0]["bbox"]) == 4
    assert "eo:cloud_cover" in records[0]["properties"]
    assert records[0]["properties"]["datetime"].endswith("Z")

    back = from_geojson_records(records)
    assert back.num_rows == 20
    src = t.to_pandas()
    bdf = back.to_pandas()
    assert list(bdf["id"]) == list(src["id"])
    np.testing.assert_allclose(
        [b["xmin"] for b in bdf["bbox"]], [b["xmin"] for b in src["bbox"]]
    )
    pd.testing.assert_series_equal(
        bdf["datetime"].astype("datetime64[ms]"),
        src["datetime"].astype("datetime64[ms]"),
        check_names=False,
    )


def test_ingest_3d_bbox():
    """ADVICE r01: a 6-element bbox is [xmin,ymin,zmin,xmax,ymax,zmax]
    (bbox.rs:8-14) — xmax/ymax are positions 3/4, not the last two."""
    rec = {
        "type": "Feature",
        "id": "threed",
        "bbox": [-10.0, 20.0, 100.0, -5.0, 25.0, 200.0],
        "properties": {},
    }
    t = from_geojson_records([rec])
    b = t.to_pandas()["bbox"].iloc[0]
    assert b == {"xmin": -10.0, "ymin": 20.0, "xmax": -5.0, "ymax": 25.0}


def test_permissive_datetime_parse():
    s = pd.Series(
        [
            "2024-01-01T00:00:00Z",
            "2024-01-01T12:30:00+02:00",
            "2024-06-15T08:00:00.123",
            None,
        ]
    )
    out = parse_datetime_series(s)
    assert out.iloc[0] == pd.Timestamp("2024-01-01")
    assert out.iloc[1] == pd.Timestamp("2024-01-01T10:30:00")  # offset folded to UTC
    assert out.iloc[2] == pd.Timestamp("2024-06-15T08:00:00.123")
    assert pd.isna(out.iloc[3])
