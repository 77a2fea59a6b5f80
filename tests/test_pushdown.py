"""Scan-level filter pushdown (cql2.to_arrow_filter + query.search_parquet
+ the clustered-store interop) — the parquet-stat half of the reference's
DuckDB pushdown (crates/duckdb/src/client.rs:224-316,386-394).

The load-bearing property is the conservative-prefilter CONTRACT: the
compiled expression never drops a row the full predicate keeps. Tested by
randomized differentials over null-heavy data plus exact-equivalence runs
of search_parquet vs plain search.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from rustac_ray.cql2 import Cql2Predicate, to_arrow_filter
from rustac_ray.query import QuerySpec, search, search_parquet, spec_arrow_prefilter

SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("collection", pa.string()),
        ("eo:cloud_cover", pa.float64()),
        ("sat:relative_orbit", pa.int64()),
    ]
)


def test_compiles_sargable_subset():
    f = to_arrow_filter("collection = 'a' AND \"eo:cloud_cover\" < 10", SCHEMA)
    assert f is not None
    # casei arm drops from the AND but the rest survives
    f2 = to_arrow_filter("id IS NOT NULL AND casei(collection) = 'a'", SCHEMA)
    assert f2 is not None and "is_valid" in str(f2)
    # spatial arm drops, scalar arm survives
    f3 = to_arrow_filter(
        "S_INTERSECTS(geometry, POINT(1 2)) AND collection = 'a'", SCHEMA
    )
    assert f3 is not None and "collection" in str(f3)


def test_refuses_unsafe_shapes():
    # NOT over a comparison keeps null rows in the engine — must not compile
    assert to_arrow_filter("NOT (collection = 'a')", SCHEMA) is None
    # OR with an uncompilable arm
    assert (
        to_arrow_filter("collection = 'a' OR casei(id) = 'x'", SCHEMA) is None
    )
    # arithmetic / arrays stay post-read; LIKE on a non-string column too
    assert to_arrow_filter('"eo:cloud_cover" + 1 < 10', SCHEMA) is None
    assert to_arrow_filter('"eo:cloud_cover" LIKE \'1%\'', SCHEMA) is None
    # dtype-mismatched literal with a schema → refuse rather than risk a
    # runtime cast error at scan time
    assert to_arrow_filter("collection = 5", SCHEMA) is None
    assert to_arrow_filter('"eo:cloud_cover" = \'low\'', SCHEMA) is None
    # unknown property with a schema → refuse (search() handles the
    # reference's empty-result short-circuit)
    assert to_arrow_filter("nope = 3", SCHEMA) is None


def _random_table(rng, n=400):
    def maybe_null(arr, frac):
        m = rng.random(n) < frac
        return [None if mm else v for mm, v in zip(m, arr)]

    return pa.table(
        {
            "id": pa.array([f"i{j:04d}" for j in range(n)]),
            "collection": pa.array(
                maybe_null(rng.choice(["a", "b", "c"], n).tolist(), 0.2)
            ),
            "eo:cloud_cover": pa.array(
                maybe_null(np.round(rng.uniform(0, 100, n), 2).tolist(), 0.3),
                pa.float64(),
            ),
            "sat:relative_orbit": pa.array(
                maybe_null(rng.integers(0, 120, n).tolist(), 0.25), pa.int64()
            ),
        }
    )


FILTERS = [
    "collection = 'a'",
    "collection <> 'a'",
    "\"eo:cloud_cover\" < 35.5",
    "\"eo:cloud_cover\" >= 35.5 AND collection IN ('a', 'b')",
    "\"sat:relative_orbit\" BETWEEN 10 AND 60",
    "collection = 'a' OR collection = 'b'",
    "collection IS NULL",
    "collection IS NOT NULL AND \"eo:cloud_cover\" <= 50",
    "10 > \"eo:cloud_cover\"",  # flipped literal-first comparison
    "\"sat:relative_orbit\" IN (5, 10, 15) OR \"eo:cloud_cover\" = 1.0",
    "id LIKE 'i00%'",
    "id LIKE 'i_0_1' AND collection = 'a'",
]


def test_prefilter_is_implied_randomized():
    rng = np.random.default_rng(19)
    t = _random_table(rng)
    for fx in FILTERS:
        expr = to_arrow_filter(fx, t.schema)
        assert expr is not None, fx
        engine = Cql2Predicate(fx).mask(t)
        scan = t.filter(expr)
        kept_ids = set(scan["id"].to_pylist())
        engine_ids = set(np.asarray(t["id"].to_pylist(), dtype=object)[engine])
        # CONTRACT: scan keeps a superset of the engine's matches
        assert engine_ids <= kept_ids, fx
        # and re-applying the engine mask over the scan gives exact equality
        re_ids = set(
            np.asarray(scan["id"].to_pylist(), dtype=object)[
                Cql2Predicate(fx).mask(scan)
            ]
        )
        assert re_ids == engine_ids, fx


def test_search_parquet_equivalence(ray_session, fixtures_dir):
    import ray.data as rd

    path = f"{fixtures_dir}/stac_items.parquet"
    specs = [
        QuerySpec(collections=["sentinel-2a"], filter='"eo:cloud_cover" < 20'),
        QuerySpec(datetime="2024/2025"),
        QuerySpec(datetime="../2024-11-20"),
        QuerySpec(bbox=[-110, 30, -100, 40], filter='"sat:relative_orbit" BETWEEN 10 AND 60'),
        QuerySpec(ids=["item-00003", "item-00007"]),
        QuerySpec(filter="NOT (collection = 'sentinel-2a')"),
        QuerySpec(datetime="2031-01-01/2031-02-01"),  # empty both paths
    ]
    for sp in specs:
        a = search_parquet(path, sp).to_pandas()
        b = search(rd.read_parquet(path), sp).to_pandas()
        assert len(a) == len(b)
        if len(a):
            pd.testing.assert_frame_equal(
                a.sort_values("id").reset_index(drop=True),
                b.sort_values("id").reset_index(drop=True),
            )


def test_row_group_pruning_effect(tmp_path):
    # sorted-by-collection file with small row groups: the pushdown must
    # let parquet stats skip non-matching groups entirely
    n = 10_000
    t = pa.table(
        {
            "id": [f"i{j}" for j in range(n)],
            "collection": ["a"] * (n // 2) + ["b"] * (n // 2),
            "eo:cloud_cover": np.linspace(0, 100, n),
        }
    )
    p = str(tmp_path / "x.parquet")
    pq.write_table(t, p, row_group_size=500)
    expr = to_arrow_filter("collection = 'b' AND \"eo:cloud_cover\" > 90", t.schema)
    dset = pads.dataset(p)
    frag = next(dset.get_fragments())
    kept = frag.subset(expr).row_groups
    assert 0 < len(kept) < frag.num_row_groups  # stats actually pruned
    assert dset.to_table(filter=expr).num_rows == (np.linspace(0, 100, n) > 90).sum()


def test_spec_prefilter_datetime_mixed_nulls(ray_session, tmp_path):
    import ray.data as rd

    # rows matching ONLY via the start/end range (null datetime) and ONLY
    # via datetime (null range) must both survive the pushdown
    t = pa.table(
        {
            "id": ["d-only", "range-only", "both-null", "miss"],
            "datetime": pa.array(
                [np.datetime64("2024-06-15", "ms"), None, None,
                 np.datetime64("2023-01-01", "ms")],
                pa.timestamp("ms"),
            ),
            "start_datetime": pa.array(
                [None, np.datetime64("2024-06-01", "ms"), None, None],
                pa.timestamp("ms"),
            ),
            "end_datetime": pa.array(
                [None, np.datetime64("2024-07-01", "ms"), None, None],
                pa.timestamp("ms"),
            ),
        }
    )
    p = str(tmp_path / "dt.parquet")
    pq.write_table(t, p)
    sp = QuerySpec(datetime="2024-06-10/2024-06-20")
    got = search_parquet(p, sp).to_pandas()
    base = search(rd.read_parquet(p), sp).to_pandas()
    assert sorted(got["id"]) == sorted(base["id"]) == ["d-only", "range-only"]


def test_search_clustered_with_cql2_pushdown(ray_session, tmp_path):
    import ray.data as rd

    from rustac_ray.sources.clustered import search_clustered, write_clustered
    from rustac_ray import synth

    fdir = synth.ensure_fixtures("/root/testdata/sf0.001")
    items = rd.read_parquet(f"{fdir}/stac_items.parquet")
    store = str(tmp_path / "store")
    write_clustered(items, store, bbox_col="bbox", rows_per_file=32)
    sp = QuerySpec(
        bbox=[-115, 25, -95, 45], filter='"eo:cloud_cover" < 40 AND collection IS NOT NULL'
    )
    got = search_clustered(store, sp).to_pandas()
    base = search(items, sp).to_pandas()
    assert sorted(got["id"]) == sorted(base["id"])
    assert len(got) > 0


# ---------------------------------------------------- property-based contract

from hypothesis import given, settings
from hypothesis import strategies as st

_num_col = st.sampled_from(['"eo:cloud_cover"', '"sat:relative_orbit"'])
_str_lit = st.sampled_from(["'a'", "'b'", "'zz'"])
_num_lit = st.integers(min_value=-5, max_value=120).map(str)


@st.composite
def _cql2_exprs(draw, depth=0):
    if depth >= 2:
        choice = draw(st.integers(0, 5))
    else:
        choice = draw(st.integers(0, 7))
    if choice == 0:
        return f"collection = {draw(_str_lit)}"
    if choice == 1:
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]))
        return f"{draw(_num_col)} {op} {draw(_num_lit)}"
    if choice == 2:
        lo = draw(st.integers(-5, 60))
        return f"{draw(_num_col)} BETWEEN {lo} AND {lo + draw(st.integers(0, 60))}"
    if choice == 3:
        return f"collection IN ({draw(_str_lit)}, {draw(_str_lit)})"
    if choice == 4:
        return draw(st.sampled_from(["collection IS NULL", "collection IS NOT NULL"]))
    if choice == 5:
        return f"{draw(_num_lit)} {draw(st.sampled_from(['<', '>=']))} {draw(_num_col)}"
    a = draw(_cql2_exprs(depth + 1))
    b = draw(_cql2_exprs(depth + 1))
    return f"({a}) {draw(st.sampled_from(['AND', 'OR']))} ({b})"


@settings(max_examples=60, deadline=None)
@given(fx=_cql2_exprs(), seed=st.integers(0, 2**31 - 1))
def test_pushdown_contract_property(fx, seed):
    """For ANY generated sargable filter over null-heavy data: the compiled
    scan expression keeps a superset of the engine's matches, and
    re-applying the engine mask over the scan survivors is exact."""
    rng = np.random.default_rng(seed)
    t = _random_table(rng, n=120)
    expr = to_arrow_filter(fx, t.schema)
    assert expr is not None, fx
    engine_ids = set(
        np.asarray(t["id"].to_pylist(), dtype=object)[Cql2Predicate(fx).mask(t)]
    )
    scan = t.filter(expr)
    assert engine_ids <= set(scan["id"].to_pylist()), fx
    re_ids = set(
        np.asarray(scan["id"].to_pylist(), dtype=object)[Cql2Predicate(fx).mask(scan)]
    )
    assert re_ids == engine_ids, fx
