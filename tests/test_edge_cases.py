"""Empty-input and edge-case robustness for the core operators."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from rustac_ray import schema as sch
from rustac_ray.stages import spatial_join, tiling
from rustac_ray.query import QuerySpec, search


def test_join_with_empty_query_table(fixtures_dir):
    empty_queries = sch.QUERY_GEOMS_SCHEMA.empty_table()
    out = spatial_join.broadcast_spatial_join(
        rd.read_parquet(f"{fixtures_dir}/images.parquet",
                        columns=["image_id", "w", "h", "transform"]),
        empty_queries,
        concurrency=1,
    )
    assert out.count() == 0
    # note: Ray drops all-empty blocks, so to_pandas() of a 0-row result
    # has no columns; schema stability for the driver comes from the
    # _stable_pairs reindex in __ray_entry__


def test_join_with_disjoint_queries(fixtures_dir):
    from rustac_ray.geo.wkb import encode_geometry

    far = pa.table(
        {
            "query_id": pa.array(["far"], pa.string()),
            "geometry": pa.array(
                [encode_geometry({"type": "Polygon", "coordinates": [[[100, -80], [101, -80], [101, -79], [100, -79], [100, -80]]]})],
                pa.binary(),
            ),
            "kind": pa.array(["box"], pa.string()),
            "k": pa.array([None], pa.int32()),
        }
    )
    res = spatial_join.broadcast_spatial_join(
        rd.read_parquet(f"{fixtures_dir}/images.parquet",
                        columns=["image_id", "w", "h", "transform"]),
        far,
        concurrency=1,
    ).to_pandas()
    assert len(res) == 0


def test_search_empty_result_keeps_schema(fixtures_dir):
    ds = rd.read_parquet(f"{fixtures_dir}/stac_items.parquet")
    out = search(ds, QuerySpec(ids=["nope"]))
    df = out.to_pandas()
    assert len(df) == 0


def test_search_all_filters_conjunctive(fixtures_dir):
    """Conjunction of every predicate type at once (Search::matches)."""
    ds = rd.read_parquet(f"{fixtures_dir}/stac_items.parquet")
    spec = QuerySpec(
        collections=["sentinel-2a"],
        bbox=[-106.1, 40.5, -106.0, 40.6],
        datetime="../2024-12-02",
        filter='"sat:relative_orbit" = 98',
        sortby="id",
        limit=10,
    )
    df = search(ds, spec).to_pandas()
    assert 0 < len(df) <= 10
    assert (df["collection"] == "sentinel-2a").all()
    assert (df["sat:relative_orbit"] == 98).all()


def test_tiling_empty_input():
    empty = pa.table(
        {
            "image_id": pa.array([], pa.string()),
            "w": pa.array([], pa.int32()),
            "h": pa.array([], pa.int32()),
            "transform": pa.array([], pa.list_(pa.float64(), 6)),
        }
    )
    out = tiling.assign_tiles(rd.from_arrow(empty), z=8).to_pandas()
    assert len(out) == 0


def test_antimeridian_adjacent_bboxes():
    """Cells/tiles at the +/-180 boundary clip rather than wrap (documented
    behavior, matching the reference's no-antimeridian-handling TODO at
    crates/core/src/bbox.rs:42-50)."""
    from rustac_ray.geo import cells

    ri, cover = cells.cover_bbox_many(
        np.array([179.5]), np.array([0.0]), np.array([180.0]), np.array([1.0]), 6
    )
    xmin, _, xmax, _ = cells.cell_bounds(cover)
    assert (xmax <= 180.0 + 1e-9).all()
    assert len(cover) >= 1
