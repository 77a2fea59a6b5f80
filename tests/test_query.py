"""Search semantics: the reference golden-count matrix
(/root/reference/crates/duckdb/src/client.rs:755-1035 reproduced at n=100
per FIXTURES.md T2) + datetime normalization unit cases
(reference search.rs:526-721) + CQL2 behavior."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rustac_ray.cql2 import Cql2Predicate, UnknownPropertyError, parse_cql2
from rustac_ray.query import (
    LegacyQueryError,
    QuerySpec,
    normalize_datetime,
    parse_fields,
    parse_sortby,
    search,
)


@pytest.fixture(scope="module")
def items(fixtures_dir):
    return rd.read_parquet(f"{fixtures_dir}/stac_items.parquet")


# ------------------------------------------------- golden count matrix -----

def test_golden_default(items):
    assert search(items, QuerySpec()).count() == 100


def test_golden_point_intersects(items):
    spec = QuerySpec(intersects={"type": "Point", "coordinates": [-106.0, 40.5]})
    assert search(items, spec).count() == 50


def test_golden_bbox(items):
    assert search(items, QuerySpec(bbox=[-106.1, 40.5, -106.0, 40.6])).count() == 50


def test_golden_datetime_open_ranges(items):
    assert search(items, QuerySpec(datetime="2024-12-02/..")).count() == 1
    assert search(items, QuerySpec(datetime="../2024-12-02")).count() == 99


def test_golden_filter_orbit(items):
    assert search(items, QuerySpec(filter='"sat:relative_orbit" = 98')).count() == 49


def test_golden_limit(items):
    assert search(items, QuerySpec(limit=42)).count() == 42


def test_golden_sortby(items):
    asc = search(items, QuerySpec(sortby="datetime", limit=1)).to_pandas()
    desc = search(items, QuerySpec(sortby="-datetime", limit=1)).to_pandas()
    assert asc["id"].iloc[0] == "item-00000"
    assert desc["id"].iloc[0] == "item-00099"  # the late-datetime block tail


def test_golden_fields(items):
    out = search(items, QuerySpec(fields="+id")).to_pandas()
    assert list(out.columns) == ["id"]
    assert len(out) == 100


# ------------------------------------------------------ predicate details --

def test_ids_empty_passes_all(items):
    assert search(items, QuerySpec(ids=[])).count() == 100
    assert search(items, QuerySpec(ids=["item-00042"])).count() == 1


def test_collections(items):
    assert search(items, QuerySpec(collections=["sentinel-2a"])).count() == 50
    assert search(items, QuerySpec(collections=["nope"])).count() == 0


def test_null_collection_fails_filter():
    t = pa.table(
        {
            "id": ["a", "b"],
            "collection": pa.array(["c1", None], pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    assert search(ds, QuerySpec(collections=["c1"])).count() == 1


def test_bbox_tests_geometry_not_bbox(fixtures_dir):
    """A rotated diamond whose bbox overlaps the query box but whose exact
    geometry doesn't must NOT match (reference items.rs:184-198)."""
    from rustac_ray.geo.wkb import encode_geometry

    diamond = encode_geometry(
        {"type": "Polygon",
         "coordinates": [[[5, 0], [8, 3], [5, 6], [2, 3], [5, 0]]]}
    )
    t = pa.table(
        {
            "id": ["diamond"],
            "geometry": pa.array([diamond], pa.binary()),
            "bbox": pa.array(
                [{"xmin": 2.0, "ymin": 0.0, "xmax": 8.0, "ymax": 6.0}],
                pa.struct([("xmin", pa.float64()), ("ymin", pa.float64()),
                           ("xmax", pa.float64()), ("ymax", pa.float64())]),
            ),
        }
    )
    ds = rd.from_arrow(t)
    # query box overlaps bbox corner but not the diamond
    assert search(ds, QuerySpec(bbox=[2.0, 0.0, 3.0, 1.0])).count() == 0
    # and one that truly overlaps
    assert search(ds, QuerySpec(bbox=[4.0, 2.0, 6.0, 4.0])).count() == 1


def test_datetime_inclusive_ends(items):
    df = items.to_pandas()
    first_dt = df["datetime"].min()
    spec = QuerySpec(datetime=f"../{first_dt.strftime('%Y-%m-%dT%H:%M:%S')}")
    assert search(items, spec).count() >= 1  # boundary item included


def test_range_items_coalesce(fixtures_dir):
    """Items with start/end straddling the query instant match even when
    their nominal datetime is outside (coalesce semantics,
    reference duckdb client.rs:361-385)."""
    t = pa.table(
        {
            "id": ["ranged"],
            "datetime": pa.array([np.datetime64("2024-06-15T00:00:00", "ms")]),
            "start_datetime": pa.array([np.datetime64("2024-06-01T00:00:00", "ms")]),
            "end_datetime": pa.array([np.datetime64("2024-06-30T00:00:00", "ms")]),
        }
    )
    ds = rd.from_arrow(t)
    assert search(ds, QuerySpec(datetime="2024-06-02")).count() == 1
    assert search(ds, QuerySpec(datetime="2024-07-01")).count() == 0


def test_legacy_query_errors(items):
    with pytest.raises(LegacyQueryError):
        search(items, QuerySpec(query={"eo:cloud_cover": {"lt": 10}}))


# ------------------------------------------------- datetime normalization --

@pytest.mark.parametrize(
    "expr,start,end",
    [
        ("2023", "2023-01-01T00:00:00.000", "2023-12-31T23:59:59.999"),
        ("2023-06", "2023-06-01T00:00:00.000", "2023-06-30T23:59:59.999"),
        ("2023-12", "2023-12-01T00:00:00.000", "2023-12-31T23:59:59.999"),
        ("2023-06-15", "2023-06-15T00:00:00.000", "2023-06-15T23:59:59.999"),
        ("2023-01-01T00:00:00Z/2023-02-01T00:00:00Z",
         "2023-01-01T00:00:00.000", "2023-02-01T00:00:00.000"),
        ("../2023-02-01T00:00:00Z", None, "2023-02-01T00:00:00.000"),
        ("2023-02-01T00:00:00Z/..", "2023-02-01T00:00:00.000", None),
        ("2022/2023", "2022-01-01T00:00:00.000", "2023-12-31T23:59:59.999"),
    ],
)
def test_normalize_datetime(expr, start, end):
    s, e = normalize_datetime(expr)
    assert s == (np.datetime64(start, "ms") if start else None)
    assert e == (np.datetime64(end, "ms") if end else None)


def test_normalize_datetime_rejects_inverted():
    with pytest.raises(ValueError):
        normalize_datetime("2024/2023")


# ----------------------------------------------------------------- cql2 ----

def test_cql2_unknown_property_short_circuits(items):
    out = search(items, QuerySpec(filter="no_such_column = 1"))
    assert out.count() == 0


def test_cql2_text_parse_shapes():
    ast = parse_cql2("a = 1 AND (b < 2 OR c >= 'x')")
    assert ast["op"] == "and"
    assert ast["args"][1]["op"] == "or"
    ast = parse_cql2("NOT a IS NULL")
    assert ast["op"] == "not"
    ast = parse_cql2("x IN (1, 2, 3)")
    assert ast["op"] == "in"


def test_cql2_eval_ops():
    t = pa.table({"a": [1, 2, 3, None], "s": ["x", "y", "xz", None]})
    assert Cql2Predicate("a = 2").mask(t).tolist() == [False, True, False, False]
    assert Cql2Predicate("a <> 2").mask(t).tolist() == [True, False, True, False]
    assert Cql2Predicate("a IS NULL").mask(t).tolist() == [False, False, False, True]
    assert Cql2Predicate("a IN (1, 3)").mask(t).tolist() == [True, False, True, False]
    assert Cql2Predicate("s LIKE 'x%'").mask(t).tolist() == [True, False, True, False]
    assert Cql2Predicate("NOT a = 2").mask(t).tolist() == [True, False, True, True]


def test_cql2_between_and_not(items):
    n = search(items, QuerySpec(filter='"eo:cloud_cover" BETWEEN 0 AND 100')).count()
    assert n == 100
    n2 = search(items, QuerySpec(filter="collection NOT IN ('sentinel-2b')")).count()
    assert n2 == 50
    nb = search(
        items, QuerySpec(filter='"eo:cloud_cover" NOT BETWEEN 0 AND 100')
    ).count()
    assert nb == 0


def test_cql2_temporal_ops(items):
    n = search(
        items,
        QuerySpec(filter="T_INTERSECTS(datetime, INTERVAL('2024-12-02','..'))"),
    ).count()
    assert n == 1  # matches the datetime open-range golden
    n2 = search(
        items,
        QuerySpec(filter="T_DURING(datetime, INTERVAL('2024-01-01','2024-11-30'))"),
    ).count()
    # range items (start-1d/end+1d) near the edges may fall out of DURING,
    # but the bulk of the Nov block is contained
    assert 80 <= n2 <= 99


def test_cql2_json_arithmetic():
    t = pa.table({"a": [1.0, 2.0, 3.0], "b": [2.0, 2.0, 2.0]})
    pred = Cql2Predicate(
        {"op": ">", "args": [{"op": "*", "args": [{"property": "a"}, {"property": "b"}]}, 4]}
    )
    assert pred.mask(t).tolist() == [False, False, True]


def test_cql2_s_intersects(items):
    n = search(
        items, QuerySpec(filter="S_INTERSECTS(geometry, POINT(-106.0 40.5))")
    ).count()
    assert n == 50
    n2 = search(
        items,
        QuerySpec(filter="S_INTERSECTS(geometry, BBOX(-106.1, 40.5, -106.0, 40.6))"),
    ).count()
    assert n2 == 50


def test_cql2_json_form(items):
    spec = QuerySpec(
        filter={"op": "and", "args": [
            {"op": "=", "args": [{"property": "collection"}, "sentinel-2a"]},
            {"op": "<", "args": [{"property": "eo:cloud_cover"}, 50]},
        ]}
    )
    n = search(items, spec).count()
    assert 0 < n < 50


# --------------------------------------------------------------- parsers ----

def test_parse_sortby():
    assert parse_sortby("-a,+b,c") == [("a", True), ("b", False), ("c", False)]


def test_parse_fields():
    assert parse_fields("+id,-geometry,datetime") == (["id", "datetime"], ["geometry"])


def test_cql2_casei():
    import pyarrow as pa

    t = pa.table({"collection": ["SENTINEL-2A", "sentinel-2a", "other"]})
    m = Cql2Predicate("CASEI(collection) = CASEI('Sentinel-2A')").mask(t)
    assert m.tolist() == [True, True, False]


def test_cql2_accenti():
    t = pa.table({"name": ["café", "cafe", "mañana", "other"]})
    m = Cql2Predicate("ACCENTI(name) = ACCENTI('cafè')").mask(t)
    # 'café'→'cafe', 'cafè'→'cafe': both accent variants match plain 'cafe'
    assert m.tolist() == [True, True, False, False]


def test_cql2_text_arithmetic_precedence():
    t = pa.table({"x": [1.0, 2.0, 3.0, 10.0], "y": [1.0, 1.0, 1.0, 1.0]})
    assert Cql2Predicate("x * 2 + 1 < 6").mask(t).tolist() == [True, True, False, False]
    assert Cql2Predicate("x + y * 0 = x").mask(t).tolist() == [True] * 4
    assert Cql2Predicate("x % 2 = 0").mask(t).tolist() == [False, True, False, True]
    assert Cql2Predicate("x ^ 2 = 9").mask(t).tolist() == [False, False, True, False]
    assert Cql2Predicate("x / 4 = 0.5").mask(t).tolist() == [False, True, False, False]
    assert Cql2Predicate("-x < -2.5").mask(t).tolist() == [False, False, True, True]


def test_cql2_array_ops():
    t = pa.table({"exts": [["a", "b"], ["a"], ["b", "c"], []]})
    assert Cql2Predicate("A_CONTAINS(exts, ('a'))").mask(t).tolist() == [
        True, True, False, False]
    assert Cql2Predicate("A_CONTAINEDBY(exts, ('a', 'b', 'c'))").mask(t).tolist() == [
        True, True, True, True]
    assert Cql2Predicate("A_OVERLAPS(exts, ('b', 'z'))").mask(t).tolist() == [
        True, False, True, False]
    assert Cql2Predicate("A_EQUALS(exts, ('b', 'a'))").mask(t).tolist() == [
        True, False, False, False]


def test_cql2_wkt_literals_parse():
    ast = parse_cql2(
        "S_INTERSECTS(geometry, MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)), ((2 2, 3 2, 3 3, 2 2))))"
    )
    assert ast["args"][1]["type"] == "MultiPolygon"
    assert len(ast["args"][1]["coordinates"]) == 2
    ast = parse_cql2("S_INTERSECTS(geometry, LINESTRING(-1 0, 1 0, 1 5))")
    assert ast["args"][1] == {
        "type": "LineString", "coordinates": [[-1, 0], [1, 0], [1, 5]]}
    ast = parse_cql2("S_INTERSECTS(geometry, MULTIPOINT((0 1), (2 3)))")
    assert ast["args"][1]["coordinates"] == [[0, 1], [2, 3]]


def test_cql2_linestring_intersects():
    from rustac_ray.geo.wkb import encode_geometry

    # stored unit squares at origin and at (10,10)
    def sq(x0, y0):
        return encode_geometry({"type": "Polygon", "coordinates": [[
            [x0, y0], [x0 + 1, y0], [x0 + 1, y0 + 1], [x0, y0 + 1], [x0, y0]]]})

    t = pa.table({"geometry": [sq(0, 0), sq(10, 10)]})
    m = Cql2Predicate(
        "S_INTERSECTS(geometry, LINESTRING(-1 0.5, 2 0.5))"
    ).mask(t)
    assert m.tolist() == [True, False]
    # a line fully inside the square (no edge crossing) still intersects
    m2 = Cql2Predicate(
        "S_INTERSECTS(geometry, LINESTRING(0.2 0.2, 0.8 0.8))"
    ).mask(t)
    assert m2.tolist() == [True, False]


def test_geometrycollection_wkb_roundtrip_and_intersects():
    from rustac_ray.geo.pip import PreparedGeometry
    from rustac_ray.geo.wkb import decode_geometry, encode_geometry

    gc = {"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [5.0, 5.0]},
        {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
    ]}
    rt = decode_geometry(encode_geometry(gc))
    assert rt == {"type": "GeometryCollection", "geometries": [
        {"type": "Point", "coordinates": [5.0, 5.0]},
        {"type": "Polygon", "coordinates": [[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0],
                                             [0.0, 1.0], [0.0, 0.0]]]}]}
    pg = PreparedGeometry(gc)
    quads = np.array([
        [[4.5, 4.5], [5.5, 4.5], [5.5, 5.5], [4.5, 5.5]],   # hits the point
        [[0.2, 0.2], [0.4, 0.2], [0.4, 0.4], [0.2, 0.4]],   # inside the polygon
        [[8.0, 0.0], [9.0, 0.0], [9.0, 1.0], [8.0, 1.0]],   # hits neither
    ])
    assert pg.intersects_quads(quads).tolist() == [True, True, False]


def test_search_page_item_collection_shape(items):
    """api::ItemCollection parity (item_collection.rs:37-99): features +
    numberMatched/numberReturned + next offset token across pages."""
    from rustac_ray.query import search_page

    p1 = search_page(items, QuerySpec(sortby="datetime", limit=40))
    assert p1["type"] == "FeatureCollection"
    assert p1["numberMatched"] == 100 and p1["numberReturned"] == 40
    assert p1["next"] == 40
    assert p1["features"][0]["type"] == "Feature"
    p2 = search_page(items, QuerySpec(sortby="datetime", limit=40, offset=p1["next"]))
    assert p2["numberReturned"] == 40 and p2["next"] == 80
    p3 = search_page(items, QuerySpec(sortby="datetime", limit=40, offset=p2["next"]))
    assert p3["numberReturned"] == 20 and "next" not in p3
    ids = [f["id"] for p in (p1, p2, p3) for f in p["features"]]
    assert len(set(ids)) == 100  # pages partition the result set


def test_cql2_negative_wkt_ordinates():
    """Regression (r2 review): 'x -y' space-separated ordinate pairs must
    parse as coordinates, not binary subtraction."""
    ast = parse_cql2(
        "S_INTERSECTS(geometry, POLYGON((-60 -10, -50 -10, -50 0, -60 0, -60 -10)))"
    )
    assert ast["args"][1]["coordinates"][0][0] == [-60, -10]
    ast = parse_cql2("S_INTERSECTS(geometry, POINT(-106.5 -40.25))")
    assert ast["args"][1]["coordinates"] == [-106.5, -40.25]
    ast = parse_cql2("S_INTERSECTS(geometry, LINESTRING(-1 -2, -3 -4))")
    assert ast["args"][1]["coordinates"] == [[-1, -2], [-3, -4]]


def test_cql2_array_op_null_row():
    """Regression: a null list value fails the predicate, never crashes."""
    t = pa.table({"exts": pa.array([["a"], None, ["b"]], pa.list_(pa.string()))})
    assert Cql2Predicate("A_CONTAINS(exts, ('a'))").mask(t).tolist() == [
        True, False, False]


def test_cql2_modulo_sql_sign():
    """Regression: '%' follows SQL dividend-sign semantics (np.fmod)."""
    t = pa.table({"x": [-5.0, 5.0, -4.0]})
    assert Cql2Predicate("x % 2 = 1").mask(t).tolist() == [False, True, False]
    assert Cql2Predicate("x % 2 = -1").mask(t).tolist() == [True, False, False]


def test_cql2_point_on_stored_linestring():
    """Regression: query POINT on a stored LineString segment interior
    intersects (DE-9IM inclusive)."""
    from rustac_ray.geo.wkb import encode_geometry

    ls = encode_geometry({"type": "LineString", "coordinates": [[-1, 0], [1, 0]]})
    t = pa.table({"geometry": [ls]})
    assert Cql2Predicate(
        "S_INTERSECTS(geometry, POINT(0 0))"
    ).mask(t).tolist() == [True]
    assert Cql2Predicate(
        "S_INTERSECTS(geometry, POINT(0 1))"
    ).mask(t).tolist() == [False]


def _rect_table():
    """Four stored rect footprints: unit square at origin, its right
    neighbor sharing the x=1 edge, a big container, a far-away one."""
    from rustac_ray.geo.wkb import encode_geometry

    def rect(x0, y0, x1, y1):
        return encode_geometry({
            "type": "Polygon",
            "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]],
        })

    return pa.table({
        "geometry": pa.array(
            [rect(0, 0, 1, 1), rect(1, 0, 2, 1), rect(-1, -1, 3, 2),
             rect(10, 10, 11, 11)],
            pa.binary(),
        )
    })


def test_cql2_spatial_relations_rects():
    t = _rect_table()

    def m(f):
        return Cql2Predicate(f).mask(t).tolist()

    # contains: strict-interior point / covered bbox with interior overlap
    assert m("S_CONTAINS(geometry, POINT(0.5 0.5))") == [True, False, True, False]
    # point ON the shared edge is NOT contained by either square
    assert m("S_CONTAINS(geometry, POINT(1 0.5))") == [False, False, True, False]
    assert m("S_CONTAINS(geometry, BBOX(0.25, 0.25, 0.75, 0.75))") == [
        True, False, True, False]
    assert m("S_WITHIN(geometry, BBOX(-0.5, -0.5, 1.5, 1.5))") == [
        True, False, False, False]
    assert m("S_EQUALS(geometry, BBOX(1.0, 0.0, 2.0, 1.0))") == [
        False, True, False, False]
    # touching along the shared edge: touches but never overlaps
    assert m("S_TOUCHES(geometry, BBOX(1.0, 0.0, 2.0, 1.0))") == [
        True, False, False, False]
    # the big rect CONTAINS the query bbox → containment, not overlaps
    assert m("S_OVERLAPS(geometry, BBOX(0.5, 0.5, 1.5, 1.5))") == [
        True, True, False, False]
    # containment (either direction) is not overlaps
    assert m("S_OVERLAPS(geometry, BBOX(-1.0, -1.0, 3.0, 2.0))") == [
        False, False, False, False]
    assert m("S_DISJOINT(geometry, BBOX(0.5, 0.5, 1.5, 1.5))") == [
        False, False, False, True]
    # crosses: line passes through interiors and exits; a line fully
    # inside (big rect) is NOT crossed; rect/rect crosses is always False
    assert m("S_CROSSES(geometry, LINESTRING(0.5 0.5, 1.5 0.5))") == [
        True, True, False, False]
    assert m("S_CROSSES(geometry, BBOX(0.5, 0.5, 1.5, 1.5))") == [
        False, False, False, False]
    # a line running along the shared edge touches both squares but
    # crosses neither (no interior passage)
    assert m("S_CROSSES(geometry, LINESTRING(1 -1, 1 3))") == [
        False, False, True, False]
    # contains(line): fully within closure AND through the interior
    assert m("S_CONTAINS(geometry, LINESTRING(0.2 0.2, 0.8 0.8))") == [
        True, False, True, False]
    # boundary-only line: within closure but never through the interior
    assert m("S_CONTAINS(geometry, LINESTRING(0 0, 1 0))") == [
        False, False, True, False]


def test_cql2_temporal_allen_relations():
    t = pa.table({
        "datetime": pa.array(
            np.array(["2024-01-10T00:00", "2024-01-15T00:00",
                      "2024-01-20T00:00"], dtype="datetime64[ms]")
        ),
        "start_datetime": pa.array(
            np.array(["2024-01-08T00:00", "NaT", "2024-01-12T00:00"],
                     dtype="datetime64[ms]")
        ),
        "end_datetime": pa.array(
            np.array(["2024-01-12T00:00", "NaT", "2024-01-25T00:00"],
                     dtype="datetime64[ms]")
        ),
    })
    # item intervals: A=[08,12], B=[15,15] (point), C=[12,25]

    def m(f):
        return Cql2Predicate(f).mask(t).tolist()

    IV = "INTERVAL('2024-01-12T00:00:00Z', '2024-01-15T00:00:00Z')"
    assert m(f"T_BEFORE(datetime, {IV})") == [False, False, False]
    assert m("T_BEFORE(datetime, INTERVAL('2024-01-13T00:00:00Z', '..'))") == [
        True, False, False]
    assert m(f"T_AFTER(datetime, {IV})") == [False, False, False]
    assert m("T_AFTER(datetime, INTERVAL('..', '2024-01-13T00:00:00Z'))") == [
        False, True, False]
    assert m(f"T_MEETS(datetime, {IV})") == [True, False, False]
    assert m(f"T_METBY(datetime, {IV})") == [False, True, False]
    assert m(f"T_OVERLAPS(datetime, {IV})") == [False, False, False]
    assert m("T_OVERLAPS(datetime, INTERVAL('2024-01-10T00:00:00Z', "
             "'2024-01-14T00:00:00Z'))") == [True, False, False]
    assert m("T_OVERLAPPEDBY(datetime, INTERVAL('2024-01-10T00:00:00Z', "
             "'2024-01-14T00:00:00Z'))") == [False, False, True]
    assert m("T_STARTS(datetime, INTERVAL('2024-01-12T00:00:00Z', "
             "'2024-01-30T00:00:00Z'))") == [False, False, True]
    assert m("T_STARTEDBY(datetime, INTERVAL('2024-01-12T00:00:00Z', "
             "'2024-01-20T00:00:00Z'))") == [False, False, True]
    assert m("T_FINISHES(datetime, INTERVAL('2024-01-01T00:00:00Z', "
             "'2024-01-12T00:00:00Z'))") == [True, False, False]
    assert m("T_FINISHEDBY(datetime, INTERVAL('2024-01-09T00:00:00Z', "
             "'2024-01-12T00:00:00Z'))") == [True, False, False]
    assert m("T_CONTAINS(datetime, INTERVAL('2024-01-13T00:00:00Z', "
             "'2024-01-14T00:00:00Z'))") == [False, False, True]
    assert m("T_EQUALS(datetime, INTERVAL('2024-01-08T00:00:00Z', "
             "'2024-01-12T00:00:00Z'))") == [True, False, False]
    assert m(f"T_DISJOINT(datetime, {IV})") == [False, False, False]
    assert m("T_DISJOINT(datetime, INTERVAL('2024-01-13T00:00:00Z', "
             "'2024-01-14T00:00:00Z'))") == [True, True, False]
    # equality against an open end is never true
    assert m("T_STARTS(datetime, INTERVAL('..', '2024-01-30T00:00:00Z'))") == [
        False, False, False]


def test_queryables_introspection(items):
    """Shape matches the reference's /queryables doc (server/api.rs:156-169:
    draft 2019-09 $schema, $id, object type, additionalProperties) but with
    properties actually derived from the schema; every property the CQL2
    evaluator accepts must be listed, and check_schema must agree."""
    from rustac_ray.query import queryables

    q = queryables(items)
    assert q["$schema"] == "https://json-schema.org/draft/2019-09/schema"
    assert q["$id"].endswith("/queryables")
    assert q["type"] == "object"
    assert q["additionalProperties"] is True
    props = q["properties"]
    assert props["geometry"] == {"$ref": "https://geojson.org/schema/Geometry.json"}
    assert props["datetime"] == {"type": "string", "format": "date-time"}
    assert props["eo:cloud_cover"]["type"] == "number"
    assert props["sat:relative_orbit"]["type"] == "integer"
    assert props["stac_extensions"]["type"] == "array"
    assert props["bbox"]["type"] == "object"
    assert set(props["bbox"]["properties"]) == {"xmin", "ymin", "xmax", "ymax"}
    # a filter over any advertised property passes schema validation;
    # a filter over an unadvertised one short-circuits (client.rs:391-393)
    pred = Cql2Predicate('"eo:cloud_cover" < 10')
    pred.check_schema(list(props))
    import pytest as _pytest

    from rustac_ray.cql2 import UnknownPropertyError

    with _pytest.raises(UnknownPropertyError):
        Cql2Predicate('"made:up" < 10').check_schema(list(props))
    # pyarrow Table input gives the same doc as the ray Dataset input
    tbl = pa.Table.from_pandas(items.limit(5).to_pandas(), preserve_index=False)
    tbl_doc = queryables(tbl)
    assert set(tbl_doc["properties"]) == set(props)


def test_search_many_equals_per_spec(items):
    """search_many: one shared scan must equal N independent search()
    runs, spec by spec; unknown properties short-circuit only their own
    spec; result-shaping members raise."""
    from rustac_ray.query import search_many

    specs = {
        "box": QuerySpec(bbox=[-106.1, 40.5, -106.0, 40.6]),
        "coll": QuerySpec(collections=["sentinel-2a"], datetime="2024-11"),
        "cloudy": QuerySpec(filter='"eo:cloud_cover" > 85'),
        "ghost": QuerySpec(filter='"no:such_prop" > 1'),  # short-circuits
    }
    got = search_many(items, specs).to_pandas()
    for sid, spec in specs.items():
        per = search(items, spec).select_columns(["id"]).to_pandas()
        want = set(per["id"]) if len(per) else set()
        have = set(got[got["spec_id"] == sid]["id"])
        assert have == want, sid
    assert (got["spec_id"] == "ghost").sum() == 0

    with pytest.raises(ValueError, match="result "):
        search_many(items, {"s": QuerySpec(limit=5)})
