"""Douglas-Peucker simplification (stages/simplify)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from rustac_ray.geo import wkb as W
from rustac_ray.stages.simplify import (
    dp_simplify_ring,
    simplify_geometries,
    simplify_geometry,
)


def test_straight_line_collapses():
    c = np.column_stack([np.linspace(0, 10, 50), np.linspace(0, 5, 50)])
    idx = dp_simplify_ring(c, 0.01, closed=False)
    assert list(idx) == [0, 49]


def test_zigzag_above_tolerance_kept():
    x = np.arange(9.0)
    y = np.where(np.arange(9) % 2 == 0, 0.0, 1.0)
    c = np.column_stack([x, y])
    idx = dp_simplify_ring(c, 0.4, closed=False)
    assert len(idx) == 9  # every apex deviates ~0.5+ > 0.4
    idx2 = dp_simplify_ring(c, 2.0, closed=False)
    assert list(idx2) == [0, 8]


def test_tolerance_monotone():
    rng = np.random.default_rng(4)
    c = np.cumsum(rng.normal(size=(100, 2)), axis=0)
    kept = [len(dp_simplify_ring(c, t, closed=False)) for t in (0.01, 0.5, 2.0, 8.0)]
    assert kept == sorted(kept, reverse=True)


def test_polygon_ring_survives_and_collapses():
    square = {"type": "Polygon", "coordinates": [
        [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]}
    s = simplify_geometry(square, 0.5)
    assert s["coordinates"][0][0] == s["coordinates"][0][-1]
    assert len(s["coordinates"][0]) == 5  # corners all essential
    sliver = {"type": "Polygon", "coordinates": [
        [[0, 0], [10, 0.001], [20, 0], [10, -0.001], [0, 0]]]}
    assert simplify_geometry(sliver, 1.0) is None  # collapses


def test_hole_dropped_exterior_kept():
    g = {"type": "Polygon", "coordinates": [
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
        [[4, 5], [5, 5.001], [6, 5], [5, 4.999], [4, 5]],  # sliver hole
    ]}
    s = simplify_geometry(g, 0.5)
    assert len(s["coordinates"]) == 1  # hole gone, exterior intact


def test_dataset_stage_roundtrip(ray_session):
    g = {"type": "LineString",
         "coordinates": [[0.0, 0.0], [1.0, 0.01], [2.0, 0.0], [3.0, 2.0]]}
    t = pa.table(
        {"id": pa.array(["a", "n"]),
         "geometry": pa.array([W.encode_geometry(g), None], pa.binary())}
    )
    out = simplify_geometries(rd.from_arrow(t), tolerance=0.1).to_pandas()
    row = out.set_index("id").loc["a"]
    dec = W.decode_geometry(row["geometry"])
    assert row["pts_before"] == 4 and row["pts_after"] == 3
    assert dec["coordinates"][0] == [0.0, 0.0] and dec["coordinates"][-1] == [3.0, 2.0]
    assert out.set_index("id").loc["n", "pts_after"] == 0
