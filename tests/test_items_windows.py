"""Item transforms (flatten/migrate/absolutize/validate), window aggregates,
translate pipeline, offset pagination."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from rustac_ray.stages import items, windows
from rustac_ray.query import QuerySpec, search


def test_flatten_unflatten_roundtrip():
    df = pd.DataFrame(
        {
            "id": ["a", "b"],
            "collection": ["c1", "c1"],
            "properties": [
                {"datetime": "2024-01-01T00:00:00Z", "eo:cloud_cover": 10.5},
                {"datetime": "2024-01-02T00:00:00Z", "eo:cloud_cover": 20.0},
            ],
        }
    )
    flat = items.flatten_items(df.copy())
    assert "eo:cloud_cover" in flat.columns and "properties" not in flat.columns
    back = items.unflatten_items(flat)
    assert back["properties"].iloc[0]["eo:cloud_cover"] == 10.5


def test_flatten_collision_errors():
    df = pd.DataFrame({"id": ["a"], "properties": [{"id": "evil"}]})
    with pytest.raises(ValueError):
        items.flatten_items(df.copy(), on_conflict="error")
    ok = items.flatten_items(df.copy(), on_conflict="drop")
    assert ok["id"].iloc[0] == "a"  # top-level id wins (item.rs:16-25 drop)


def test_migrate_band_merge_and_majority_lift():
    """Mirrors the reference migration fixture semantics (migrate.rs:155-185):
    pairwise eo:bands+raster:bands merge; values shared by a majority of
    bands lift to the asset."""
    assets = {
        "data": {
            "href": "x.tif",
            "eo:bands": [{"name": "B1", "common_name": "red"}, {"name": "B2"}],
            "raster:bands": [
                {"data_type": "uint16", "nodata": 0},
                {"data_type": "uint16", "nodata": 0},
            ],
        }
    }
    df = pd.DataFrame({"id": ["i1"], "stac_version": ["1.0.0"], "assets": [assets]})
    out = items.migrate_items(df)
    a = out["assets"].iloc[0]["data"]
    assert out["stac_version"].iloc[0] == "1.1.0"
    assert "eo:bands" not in a and "raster:bands" not in a
    # data_type + nodata shared by 2/2 bands → lifted to asset level
    assert a["data_type"] == "uint16" and a["nodata"] == 0
    assert a["bands"][0]["name"] == "B1" and a["bands"][0]["eo:common_name"] == "red"
    assert "data_type" not in a["bands"][0]


def test_migrate_most_common_lift_count_gt_1():
    """migrate.rs:169-185 lifts the MOST-COMMON value whenever its count > 1
    (not only strict majorities): 2 of 4 bands sharing a value lift it."""
    assets = {
        "data": {
            "eo:bands": [
                {"name": "r", "center_wavelength": 0.6},
                {"name": "g", "center_wavelength": 0.6},
                {"name": "b", "center_wavelength": 0.4},
                {"name": "nir", "center_wavelength": 0.8},
            ],
        }
    }
    df = pd.DataFrame({"id": ["i1"], "stac_version": ["1.0.0"], "assets": [assets]})
    a = items.migrate_items(df)["assets"].iloc[0]["data"]
    # 0.6 appears twice → lifted; only the two matching bands lose the key
    assert a["eo:center_wavelength"] == 0.6
    kept = [b.get("eo:center_wavelength") for b in a["bands"]]
    assert kept == [None, None, 0.4, 0.8]
    # eo band fields other than 'name' are prefixed (migrate.rs:126-133)
    assert all("name" in b for b in a["bands"])


def test_migrate_eo_description_prefixed():
    """Reference keeps only 'name' unprefixed for eo bands — 'description'
    becomes 'eo:description' (migrate.rs:126-133), while for raster bands
    nodata/data_type/statistics/unit stay unprefixed (migrate.rs:144-151)."""
    assets = {
        "d": {
            "eo:bands": [{"name": "B1", "description": "red band"}],
            "raster:bands": [{"unit": "m", "scale": 2.0}],
        }
    }
    df = pd.DataFrame({"id": ["i"], "stac_version": ["1.0.0"], "assets": [assets]})
    a = items.migrate_items(df)["assets"].iloc[0]["d"]
    band = a["bands"][0]
    assert band["eo:description"] == "red band"
    assert band["unit"] == "m"
    assert band["raster:scale"] == 2.0
    assert "description" not in band and "scale" not in band


def test_migrate_links_and_license():
    """Self-link absolute-path rewrite (migrate.rs:195-235) + license
    'proprietary'/'various' → 'other' (migrate.rs:237-244; its own test
    asserts collection.license == 'other', migrate.rs:255-272)."""
    df = pd.DataFrame(
        {
            "id": ["a", "b"],
            "stac_version": ["1.0.0", "1.1.0"],
            "license": ["proprietary", "various"],
            "links": [
                [{"rel": "self", "href": "/an/absolute/href"},
                 {"rel": "parent", "href": "/not/rewritten"}],
                [{"rel": "self", "href": "/untouched/already-1.1.0"}],
            ],
        }
    )
    out = items.migrate_items(df)
    assert out["links"].iloc[0][0]["href"] == "file:///an/absolute/href"
    assert out["links"].iloc[0][1]["href"] == "/not/rewritten"  # non-self kept
    assert out["license"].iloc[0] == "other"
    # rows already at the target version are untouched
    assert out["links"].iloc[1][0]["href"] == "/untouched/already-1.1.0"
    assert out["license"].iloc[1] == "various"
    assert out["stac_version"].tolist() == ["1.1.0", "1.1.0"]


def test_absolutize_links():
    df = pd.DataFrame(
        {
            "id": ["a"],
            "links": [[{"href": "./item.json", "rel": "self"}]],
            "assets": [{"thumb": {"href": "thumb.png"}}],
        }
    )
    out = items.absolutize_links(df, "https://example.com/catalog/")
    assert out["links"].iloc[0][0]["href"] == "https://example.com/catalog/item.json"
    assert out["assets"].iloc[0]["thumb"]["href"] == "https://example.com/catalog/thumb.png"


def test_validator(fixtures_dir):
    ds = rd.read_parquet(f"{fixtures_dir}/stac_items.parquet")
    out = ds.map_batches(items.ItemValidator, batch_format="pandas", concurrency=1).to_pandas()
    assert out["valid"].all()
    bad = pd.DataFrame(
        {
            "type": ["NotAFeature"],
            "id": [""],
            "bbox": [{"xmin": 5.0, "ymin": 0.0, "xmax": 1.0, "ymax": 1.0}],
            "geometry": [b"\x01\x99\x00\x00\x00"],
        }
    )
    v = items.ItemValidator()
    errs = v(bad)
    assert not errs["valid"].iloc[0]
    assert "type" in errs["errors"].iloc[0]
    assert "min > max" in errs["errors"].iloc[0]


def test_tumbling_matches_pandas(sf_dir):
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    out = windows.tumbling(ev, 600).to_pandas()
    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    df["window_start"] = df["ts"].dt.floor("600s")
    exp = (
        df.groupby(["window_start", "event_type"])["value"]
        .agg(["count", "sum"])
        .reset_index()
    )
    merged = out.merge(exp, on=["window_start", "event_type"])
    assert len(merged) == len(exp) == len(out)
    assert (merged["n_events"] == merged["count"]).all()
    np.testing.assert_allclose(merged["sum_value"], merged["sum"], rtol=1e-9)


def test_sliding_window_coverage(sf_dir):
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    out = windows.sliding(ev, 600, 200).to_pandas()
    n_events = pq.read_table(f"{sf_dir}/events.parquet").num_rows
    # each event appears in exactly size/step = 3 windows
    assert out["n_events"].sum() == 3 * n_events


def test_session_windows(sf_dir):
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    out = windows.session_windows(ev, gap_s=1800).to_pandas()
    df = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    assert out["n_events"].sum() == len(df)
    # session invariant: end - start never exceeds total span, gaps split
    one = df[df["user_id"] == df["user_id"].iloc[0]].sort_values("ts")
    gaps = one["ts"].diff().dt.total_seconds().fillna(0)
    expected_sessions = int((gaps > 1800).sum()) + 1
    got = len(out[out["user_id"] == df["user_id"].iloc[0]])
    assert got == expected_sessions


def test_offset_pagination(fixtures_dir):
    ds = rd.read_parquet(f"{fixtures_dir}/stac_items.parquet")
    page1 = search(ds, QuerySpec(sortby="datetime", limit=10)).to_pandas()
    page2 = search(ds, QuerySpec(sortby="datetime", limit=10, offset=10)).to_pandas()
    assert len(page2) == 10
    assert set(page1["id"]).isdisjoint(set(page2["id"]))
    both = pd.concat([page1, page2])
    full = search(ds, QuerySpec(sortby="datetime", limit=20)).to_pandas()
    assert list(both["id"]) == list(full["id"])


def test_translate_roundtrip(tmp_path, fixtures_dir):
    from rustac_ray.pipelines.translate import crawl_write, translate

    out = str(tmp_path / "translated")
    translate(f"{fixtures_dir}/stac_items.parquet", out, out_fmt="parquet")
    back = rd.read_parquet(out)
    assert back.count() == 100

    crawl_dir = str(tmp_path / "by_collection")
    crawl_write(rd.read_parquet(out), crawl_dir)
    import os

    subdirs = [d for d in os.listdir(crawl_dir) if d.startswith("collection=")]
    assert len(subdirs) == 2  # one partition per collection (K5)


def test_running_totals_matches_pandas():
    """Per-group prefix sums vs pandas cumsum on a skewed-key frame
    (one group = 90% of rows) forced across many blocks; values exact
    int64, every row emitted once."""
    import numpy as np
    import pandas as pd

    from rustac_ray.stages.windows import running_totals

    rng = np.random.RandomState(7)
    n = 5000
    g = np.where(rng.rand(n) < 0.9, "HOT", rng.choice(["a", "b", "c"], n))
    df = pd.DataFrame(
        {
            "g": g,
            "ts": rng.randint(0, 400, n).astype("datetime64[s]")
            .astype("datetime64[us]"),
            "rid": rng.permutation(n).astype(np.int64),
            "v": rng.randint(-50, 50, n).astype(np.int64),
        }
    )
    got = (
        running_totals(
            rd.from_pandas(df).repartition(16),
            group_col="g", ts_col="ts", id_col="rid", value_col="v",
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["g", "ts", "rid"], kind="mergesort").copy()
    exp["running"] = exp.groupby("g", sort=False)["v"].cumsum()
    exp = exp.sort_values("rid").reset_index(drop=True)
    assert len(got) == n
    assert got["g"].tolist() == exp["g"].tolist()
    assert got["running"].tolist() == exp["running"].tolist()


def test_analytic_window_matches_pandas_skewed():
    """ROW_NUMBER / DENSE_RANK / LAG vs pandas on a skewed frame (one
    group = 90% of rows) with HEAVY ts ties (ts drawn from only 25
    values so duplicate-ts runs routinely straddle block seams — the
    dense_rank shared-boundary correction and the LAG seam both fire)."""
    import numpy as np
    import pandas as pd

    from rustac_ray.stages.windows import analytic_window

    rng = np.random.RandomState(11)
    n = 4000
    g = np.where(rng.rand(n) < 0.9, "HOT", rng.choice(["a", "b"], n))
    df = pd.DataFrame(
        {
            "g": g,
            "ts": rng.randint(0, 25, n).astype("datetime64[s]")
            .astype("datetime64[us]"),
            "rid": rng.permutation(n).astype(np.int64),
            "v": rng.randint(-50, 50, n).astype(np.int64),
        }
    )
    got = (
        analytic_window(
            rd.from_pandas(df).repartition(16),
            group_col="g", ts_col="ts", id_col="rid", value_col="v",
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["g", "ts", "rid"], kind="mergesort").copy()
    exp["rn"] = exp.groupby("g", sort=False).cumcount() + 1
    # dense rank over ts within group
    exp["drk"] = (
        exp.groupby("g", sort=False)["ts"]
        .transform(lambda s: s.rank(method="dense").astype(np.int64))
    )
    exp["lag_v"] = exp.groupby("g", sort=False)["v"].shift(1)
    exp = exp.sort_values("rid").reset_index(drop=True)
    assert len(got) == n
    assert got["g"].tolist() == exp["g"].tolist()
    assert got["rn"].tolist() == exp["rn"].tolist()
    assert got["drk"].tolist() == exp["drk"].tolist()
    ge = got["lag_v"].astype("Float64").fillna(np.inf)
    ee = exp["lag_v"].astype("Float64").fillna(np.inf)
    assert ge.tolist() == ee.tolist()


def test_analytic_window_single_group_single_block():
    """Degenerate layouts: one group in one block, and an empty frame."""
    import numpy as np
    import pandas as pd

    from rustac_ray.stages.windows import analytic_window

    df = pd.DataFrame(
        {
            "g": ["x"] * 5,
            "ts": np.array([3, 1, 1, 2, 3], "datetime64[s]").astype("datetime64[us]"),
            "rid": np.arange(5, dtype=np.int64),
            "v": np.array([10, 20, 30, 40, 50], np.int64),
        }
    )
    got = (
        analytic_window(
            rd.from_pandas(df),
            group_col="g", ts_col="ts", id_col="rid", value_col="v",
        )
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    # order: (ts,rid) = (1,1),(1,2),(2,3),(3,0),(3,4)
    assert got["rn"].tolist() == [4, 1, 2, 3, 5]
    assert got["drk"].tolist() == [3, 1, 1, 2, 3]
    lag = got["lag_v"].astype("Float64")
    assert lag.isna().tolist() == [False, True, False, False, False]
    assert lag.fillna(-1).tolist() == [40.0, -1.0, 20.0, 30.0, 10.0]


def test_tumbling_distinct_matches_pandas(ray_session):
    """Exact windowed COUNT DISTINCT via the bucketed co-group vs a
    pandas nunique control, including users active in many windows."""
    import pandas as pd
    import ray.data as rd

    from rustac_ray.stages.windows import tumbling_distinct

    rng = np.random.default_rng(31)
    n = 5000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 120, n).astype(np.int64),
            "ts": pd.to_datetime("2024-03-01")
            + pd.to_timedelta(rng.integers(0, 6 * 3600, n), unit="s"),
        }
    )
    got = (
        tumbling_distinct(rd.from_pandas(df).repartition(7), 3600)
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    b = df.copy()
    b["w"] = (b["ts"].astype("int64") // 10**6 // 3_600_000) * 3_600_000
    want = (
        b.groupby("w")["user_id"].nunique().reset_index(name="n_distinct")
        .rename(columns={"w": "window_start"})
        .astype("int64")
        .sort_values("window_start").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
