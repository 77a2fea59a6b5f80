"""Incremental materialized views over the clustered store
(state/matview): create → mutate → refresh folds only the version
delta; result must equal a full recompute, byte-for-byte on int sums.

Analogue surface: the reference's collection-extent/summaries autogen is
a one-shot aggregate; this is its continuously-maintained form — the
lakehouse IVM layer a 100-TB mutable corpus needs so dashboards never
pay a full-store groupby after a delete/upsert.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.pipelines.flagship import read_images_metadata
from rustac_ray.sources.clustered import (
    delete_clustered,
    evolve_clustered,
    merge_clustered,
    store_version,
    vacuum_clustered,
    write_clustered,
)
from rustac_ray.stages.footprint import derive_footprints
from rustac_ray.state.matview import (
    create_matview,
    read_matview,
    refresh_matview,
)

SF = "/root/testdata/sf0.001"
COLS = ["image_id", "collection", "w", "h",
        "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
AOI = (-110.0, 35.0, -105.0, 40.0)


@pytest.fixture(scope="module")
def full_fp(fixtures_dir):
    df = (
        read_images_metadata(SF)
        .map_batches(derive_footprints, batch_format="pyarrow")
        .to_pandas()
    )
    return df[COLS]


@pytest.fixture()
def store(tmp_path, full_fp):
    out = str(tmp_path / "mv")
    write_clustered(
        rd.from_pandas(full_fp), out, footprints_derived=True, rows_per_file=32
    )
    return out


def _control(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby("collection", as_index=False).agg(
        n=("image_id", "size"), sum_w=("w", "sum"), mean_h=("h", "mean")
    )
    g["n"] = g["n"].astype("int64")
    g["sum_w"] = g["sum_w"].astype("int64")
    return g.sort_values("collection").reset_index(drop=True)


def _got(view_dir: str) -> pd.DataFrame:
    df = read_matview(view_dir)
    return df.sort_values("collection").reset_index(drop=True)


def test_create_matches_full_groupby(store, tmp_path, full_fp):
    view = str(tmp_path / "view")
    out = create_matview(
        store, view, group_by=["collection"], sums=["w"], means=["h"]
    )
    assert out["store_version"] == 0
    pd.testing.assert_frame_equal(_got(view), _control(full_fp))


def test_incremental_refresh_equals_recompute(store, tmp_path, full_fp):
    view = str(tmp_path / "view")
    create_matview(store, view, group_by=["collection"], sums=["w"], means=["h"])

    # mutate: AOI delete + merge of new rows in a fresh collection
    delete_clustered(store, bbox=AOI)
    extra = full_fp.head(50).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    extra["collection"] = "fresh"
    merge_clustered(store, rd.from_pandas(extra), footprints_derived=True)

    out = refresh_matview(store, view)
    assert out["mode"] == "incremental"
    assert out["to_version"] == store_version(store)

    # control: full recompute over the CURRENT logical state
    hit = (
        (full_fp["fp_xmin"] <= AOI[2]) & (full_fp["fp_xmax"] >= AOI[0])
        & (full_fp["fp_ymin"] <= AOI[3]) & (full_fp["fp_ymax"] >= AOI[1])
    )
    cur = pd.concat([full_fp[~hit], extra], ignore_index=True)
    pd.testing.assert_frame_equal(_got(view), _control(cur))

    # refresh with no new version is a no-op
    assert refresh_matview(store, view)["mode"] == "noop"


def test_group_emptied_by_delete_disappears(store, tmp_path, full_fp):
    view = str(tmp_path / "view")
    create_matview(store, view, group_by=["collection"], sums=["w"])
    victim = full_fp["collection"].iloc[0]
    ids = list(full_fp[full_fp["collection"] == victim]["image_id"])
    delete_clustered(store, ids=ids, id_col="image_id")
    refresh_matview(store, view)
    assert victim not in set(read_matview(view)["collection"])


def test_refresh_across_schema_rename(store, tmp_path, full_fp):
    view = str(tmp_path / "view")
    create_matview(store, view, group_by=["collection"], sums=["w"], means=["h"])
    evolve_clustered(store, rename={"collection": "source", "w": "width"})
    extra = full_fp.head(20).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    extra["collection"] = "fresh"
    extra = extra.rename(columns={"collection": "source", "w": "width"})
    merge_clustered(store, rd.from_pandas(extra), footprints_derived=True)

    out = refresh_matview(store, view)
    assert out["mode"] == "incremental"
    got = read_matview(view)
    # spec followed the rename by column id
    assert {"source", "n", "sum_width", "mean_h"} <= set(got.columns)
    cur = pd.concat(
        [full_fp, extra.rename(columns={"source": "collection", "width": "w"})],
        ignore_index=True,
    )
    ctrl = _control(cur).rename(
        columns={"collection": "source", "sum_w": "sum_width"}
    )
    pd.testing.assert_frame_equal(
        got.sort_values("source").reset_index(drop=True), ctrl
    )


def test_dropped_spec_column_raises(store, tmp_path, full_fp):
    view = str(tmp_path / "view")
    create_matview(store, view, group_by=["collection"], sums=["w"])
    evolve_clustered(store, drop=["w"])
    delete_clustered(store, ids=[full_fp["image_id"].iloc[0]], id_col="image_id")
    with pytest.raises(ValueError, match="dropped"):
        refresh_matview(store, view)


def test_vacuumed_base_falls_back_to_full(store, tmp_path, full_fp):
    view = str(tmp_path / "view")
    create_matview(store, view, group_by=["collection"], sums=["w"])
    delete_clustered(store, bbox=AOI)
    delete_clustered(store, ids=[full_fp["image_id"].iloc[1]], id_col="image_id")
    vacuum_clustered(store, keep_versions=1)  # drops version 0 = view base
    out = refresh_matview(store, view)
    assert out["mode"] == "full"
    hit = (
        (full_fp["fp_xmin"] <= AOI[2]) & (full_fp["fp_xmax"] >= AOI[0])
        & (full_fp["fp_ymin"] <= AOI[3]) & (full_fp["fp_ymax"] >= AOI[1])
    )
    cur = full_fp[~hit & (full_fp["image_id"] != full_fp["image_id"].iloc[1])]
    got = read_matview(view)[["collection", "n", "sum_w"]]
    ctrl = _control(cur)[["collection", "n", "sum_w"]]
    pd.testing.assert_frame_equal(
        got.sort_values("collection").reset_index(drop=True), ctrl
    )


def test_min_max_rejected(store, tmp_path):
    with pytest.raises(ValueError):
        create_matview(store, str(tmp_path / "v"), group_by=[])


def test_shuffle_combine_equals_driver(store, tmp_path, full_fp):
    """combine='shuffle' (distributed old+delta fold, for corpus-scale
    group cardinality) must equal the driver merge exactly."""
    v1 = str(tmp_path / "vd")
    v2 = str(tmp_path / "vs")
    create_matview(store, v1, group_by=["collection"], sums=["w"], means=["h"])
    create_matview(store, v2, group_by=["collection"], sums=["w"], means=["h"])

    delete_clustered(store, bbox=AOI)
    extra = full_fp.head(30).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    extra["collection"] = "fresh"
    merge_clustered(store, rd.from_pandas(extra), footprints_derived=True)

    a = refresh_matview(store, v1, combine="driver")
    b = refresh_matview(store, v2, combine="shuffle")
    assert a["mode"] == b["mode"] == "incremental"
    pd.testing.assert_frame_equal(
        read_matview(v1).sort_values("collection").reset_index(drop=True),
        read_matview(v2).sort_values("collection").reset_index(drop=True),
    )

    # auto switches on the recorded view size
    c = refresh_matview(store, v1, combine="auto", max_driver_groups=0)
    assert c["mode"] == "noop"  # nothing new — but the path must not err
    with pytest.raises(ValueError, match="combine"):
        refresh_matview(store, v1, combine="bogus")


# ---------------------------------------------------------------- nulls ---
# SQL AVG excludes nulls; the view maintains a per-mean-column non-null
# count (_mn_) so mean_h = _msum_h / _mn_h, not / _n (r4 ADVICE item:
# dividing by the group row count silently deflates means under nulls).


@pytest.fixture()
def nullfp(full_fp):
    df = full_fp.copy()
    h = df["h"].astype("float64").to_numpy()
    h[::5] = np.nan  # deterministic ~20% nulls
    df["h"] = h
    # one collection with h entirely null: AVG must come back null
    victim = sorted(df["collection"].unique())[0]
    df.loc[df["collection"] == victim, "h"] = np.nan
    return df


@pytest.fixture()
def nullstore(tmp_path, nullfp):
    out = str(tmp_path / "mvnull")
    write_clustered(
        rd.from_pandas(nullfp), out, footprints_derived=True, rows_per_file=32
    )
    return out


def test_mean_excludes_nulls(nullstore, tmp_path, nullfp):
    view = str(tmp_path / "view")
    create_matview(
        nullstore, view, group_by=["collection"], sums=["w"], means=["h"]
    )
    pd.testing.assert_frame_equal(_got(view), _control(nullfp))
    # the all-null collection's mean is NaN (SQL AVG over no non-nulls)
    victim = sorted(nullfp["collection"].unique())[0]
    got = _got(view)
    assert np.isnan(got.loc[got["collection"] == victim, "mean_h"]).all()


@pytest.mark.parametrize("combine", ["driver", "shuffle"])
def test_refresh_with_nulls_equals_recompute(
    nullstore, tmp_path, nullfp, combine
):
    view = str(tmp_path / "view")
    create_matview(
        nullstore, view, group_by=["collection"], sums=["w"], means=["h"]
    )
    delete_clustered(nullstore, bbox=AOI)
    extra = nullfp.head(40).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    extra["collection"] = "fresh"
    extra.loc[extra.index[::2], "h"] = np.nan  # nulls in the delta too
    merge_clustered(nullstore, rd.from_pandas(extra), footprints_derived=True)

    out = refresh_matview(nullstore, view, combine=combine)
    assert out["mode"] == "incremental"
    hit = (
        (nullfp["fp_xmin"] <= AOI[2]) & (nullfp["fp_xmax"] >= AOI[0])
        & (nullfp["fp_ymin"] <= AOI[3]) & (nullfp["fp_ymax"] >= AOI[1])
    )
    cur = pd.concat([nullfp[~hit], extra], ignore_index=True)
    pd.testing.assert_frame_equal(_got(view), _control(cur))


# ------------------------------------------------- min/max + view chains ---


def test_minmax_create_and_merge_refresh(store, tmp_path, full_fp):
    """mins/maxs materialize exactly; a merge delta REWRITES owning
    files (removal side nonempty), so the refresh takes the
    recompute-on-invalidation path and stays exact."""
    view = str(tmp_path / "vmm")
    create_matview(
        store, view, group_by=["collection"], sums=["w"],
        mins=["h"], maxs=["w"],
    )
    got0 = read_matview(view).set_index("collection")
    want0 = full_fp.groupby("collection").agg(
        mn=("h", "min"), mx=("w", "max")
    )
    for c, row in want0.iterrows():
        assert got0.loc[c, "min_h"] == row["mn"]
        assert got0.loc[c, "max_w"] == row["mx"]

    extra = full_fp.head(60).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    extra["collection"] = "fresh"
    merge_clustered(store, rd.from_pandas(extra), footprints_derived=True)
    out = refresh_matview(store, view)
    assert out["mode"] == "full"  # merge rewrote files -> invalidation
    got = read_matview(view).set_index("collection")
    cur = pd.concat([full_fp, extra], ignore_index=True)
    want = cur.groupby("collection").agg(
        n=("image_id", "size"), s=("w", "sum"),
        mn=("h", "min"), mx=("w", "max"),
    )
    for c, row in want.iterrows():
        assert got.loc[c, "n"] == row["n"]
        assert got.loc[c, "min_h"] == row["mn"]
        assert got.loc[c, "max_w"] == row["mx"]


def test_minmax_removal_falls_back_to_full(store, tmp_path, full_fp):
    """A delta that removes files (AOI delete) invalidates min/max —
    refresh recomputes and the extrema are exact afterward."""
    view = str(tmp_path / "vmm2")
    create_matview(store, view, group_by=["collection"], mins=["h"])
    delete_clustered(store, bbox=AOI)
    out = refresh_matview(store, view)
    assert out["mode"] == "full"
    hit = (
        (full_fp["fp_xmin"] <= AOI[2]) & (full_fp["fp_xmax"] >= AOI[0])
        & (full_fp["fp_ymin"] <= AOI[3]) & (full_fp["fp_ymax"] >= AOI[1])
    )
    cur = full_fp[~hit]
    got = read_matview(view).set_index("collection")
    want = cur.groupby("collection")["h"].min()
    for c, v in want.items():
        assert got.loc[c, "min_h"] == v


def test_view_chain_refresh(store, tmp_path, full_fp):
    """View-over-view: the child aggregates the parent's output table
    and refreshes from it after the parent republishes."""
    from rustac_ray.state.matview import (
        create_matview_over, refresh_matview_over,
    )

    parent = str(tmp_path / "parent")
    child = str(tmp_path / "child")
    # parent: per (collection, w) counts; child: per collection stats
    create_matview(store, parent, group_by=["collection", "w"], sums=["h"])
    create_matview_over(
        parent, child, group_by=["collection"],
        sums=["n"], maxs=["sum_h"],
    )
    pf = read_matview(parent)
    want = pf.groupby("collection").agg(
        n=("n", "size"), s=("n", "sum"), mx=("sum_h", "max")
    )
    got = read_matview(child).set_index("collection")
    for c, row in want.iterrows():
        assert got.loc[c, "n"] == row["n"]         # parent groups counted
        assert got.loc[c, "sum_n"] == row["s"]     # store rows summed
        assert got.loc[c, "max_sum_h"] == row["mx"]

    # child refresh is a noop until the parent republishes
    assert refresh_matview_over(child)["mode"] == "noop"
    delete_clustered(store, bbox=AOI)
    refresh_matview(store, parent)
    out = refresh_matview_over(child)
    assert out["mode"] == "recompute"
    pf2 = read_matview(parent)
    got2 = read_matview(child).set_index("collection")
    want2 = pf2.groupby("collection")["n"].sum()
    for c, v in want2.items():
        assert got2.loc[c, "sum_n"] == v
