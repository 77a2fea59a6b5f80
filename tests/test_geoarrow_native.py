"""Native geoarrow typed columns (geo/geoarrow_native) vs WKB standard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from rustac_ray.geo import wkb as W
from rustac_ray.geo.geoarrow_native import (
    geoarrow_field,
    geojson_to_native,
    native_to_geojson,
    native_to_wkb,
    quads_to_native,
    wkb_to_native,
)

GEOMS = {
    "point": {"type": "Point", "coordinates": [1.0, 2.0]},
    "multipoint": {"type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
    "linestring": {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0], [2.0, 0.0]]},
    "multilinestring": {
        "type": "MultiLineString",
        "coordinates": [[[0.0, 0.0], [1.0, 1.0]], [[5.0, 5.0], [6.0, 5.0]]],
    },
    "polygon": {
        "type": "Polygon",
        "coordinates": [
            [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]],
            [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 1.0]],  # hole
        ],
    },
    "multipolygon": {
        "type": "MultiPolygon",
        "coordinates": [
            [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
            [[[9.0, 9.0], [10.0, 9.0], [10.0, 10.0], [9.0, 9.0]]],
        ],
    },
}


@pytest.mark.parametrize("gt", sorted(GEOMS))
def test_geojson_native_roundtrip_with_nulls(gt):
    geoms = [GEOMS[gt], None, GEOMS[gt]]
    arr = geojson_to_native(geoms, gt)
    assert arr.null_count == 1
    back = native_to_geojson(arr, gt)
    assert back[1] is None and back[0] == GEOMS[gt] == back[2]


def test_singular_promotes_into_multi():
    arr = geojson_to_native([GEOMS["polygon"]], "multipolygon")
    back = native_to_geojson(arr, "multipolygon")
    assert back[0]["coordinates"] == [GEOMS["polygon"]["coordinates"]]
    with pytest.raises(ValueError, match="expected"):
        geojson_to_native([GEOMS["point"]], "polygon")


@pytest.mark.parametrize("gt", sorted(GEOMS))
def test_wkb_edges_roundtrip(gt):
    t = pa.table(
        {
            "id": pa.array(["a", "b"]),
            "geometry": pa.array(
                [W.encode_geometry(GEOMS[gt]), None], pa.binary()
            ),
        }
    )
    native = wkb_to_native(t, geom_type=gt)
    meta = native.schema.field("geometry").metadata
    assert meta[b"ARROW:extension:name"] == f"geoarrow.{gt}".encode()
    back = native_to_wkb(native)  # geom_type from the extension tag
    got = back["geometry"].to_pylist()
    assert got[1] is None
    assert W.decode_geometry(got[0]) == GEOMS[gt]


def test_quads_fast_path_matches_general():
    rng = np.random.default_rng(2)
    corners = rng.normal(size=(100, 8))
    fast = quads_to_native(corners)
    slow = geojson_to_native(
        [
            {
                "type": "Polygon",
                "coordinates": [
                    [list(c[0:2]), list(c[2:4]), list(c[4:6]), list(c[6:8]), list(c[0:2])]
                ],
            }
            for c in corners
        ],
        "polygon",
    )
    assert fast.equals(slow)


def test_field_tag():
    f = geoarrow_field("geom", "linestring")
    assert f.metadata[b"ARROW:extension:name"] == b"geoarrow.linestring"
    with pytest.raises(ValueError):
        geoarrow_field("geom", "curve")
