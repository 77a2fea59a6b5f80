"""Driver-contract smoke: entry() + queries()/oracle_sql() key coverage."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod


def test_entry_runs():
    res = entrymod.entry()
    import ray.data

    assert isinstance(res, ray.data.Dataset)
    df = res.to_pandas()
    assert len(df) >= 0
    assert list(df.columns) == ["image_id", "query_id"]


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    # the conformance-critical core is oracle-backed
    for key in [
        "search_default", "search_bbox", "search_point_intersects",
        "search_datetime_open_end", "search_filter_orbit", "collection_extents",
        "spatial_join_boxes", "tile_center_assignment", "knn_points",
        "lineitem_agg", "exact_dedup_docs", "embed_topk",
    ]:
        assert key in oracles, key


def test_one_query_end_to_end():
    out = entrymod.queries()["search_sort_limit"]("/root/testdata/sf0.001")
    df = out.to_pandas()
    assert len(df) == 42
    assert list(df.columns) == ["id", "datetime"]
