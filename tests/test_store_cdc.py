"""Change-data-capture between clustered-store versions
(sources/clustered.changes_clustered).

Analogue surface: the reference has no mutable store, so no change feed;
this is the lakehouse CHANGE FEED (Delta CDF / Iceberg changelog shape)
over the Morton store's versioned manifests — at 100 TB an incremental
consumer (index refresh, downstream re-train) reads O(delta), never the
corpus. The manifest file-set diff bounds IO to files exclusive to one
version; shared (untouched) files are never opened.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.pipelines.flagship import read_images_metadata
from rustac_ray.sources.clustered import (
    changes_clustered,
    compact_clustered,
    delete_clustered,
    store_version,
    upsert_clustered,
    write_clustered,
)
from rustac_ray.stages.footprint import derive_footprints

SF = "/root/testdata/sf0.001"
COLS = ["image_id", "collection", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
AOI = (-100.0, 30.0, -90.0, 45.0)


@pytest.fixture(scope="module")
def base(fixtures_dir):
    return (
        read_images_metadata(SF)
        .map_batches(derive_footprints, batch_format="pyarrow")
        .to_pandas()[COLS]
    )


@pytest.fixture()
def store(tmp_path, base):
    out = str(tmp_path / "cdc")
    write_clustered(
        rd.from_pandas(base), out, footprints_derived=True, rows_per_file=32
    )
    return out


def _cdc(out, v_from, v_to=None) -> pd.DataFrame:
    df = changes_clustered(out, v_from, v_to).to_pandas()
    if df.empty:  # Ray's to_pandas drops columns on zero-row datasets
        return pd.DataFrame({"image_id": [], "change": []}, dtype=object)
    return df.sort_values("image_id").reset_index(drop=True)


def _aoi_mask(df: pd.DataFrame) -> pd.Series:
    return (
        (df.fp_xmin <= AOI[2])
        & (df.fp_xmax >= AOI[0])
        & (df.fp_ymin <= AOI[3])
        & (df.fp_ymax >= AOI[1])
    )


def test_cdc_classifies_all_three(store, base):
    delete_clustered(store, bbox=AOI)
    mod = base[base.collection == "naip"].copy()
    mod["collection"] = "upserted"
    new = base[base.collection == "sentinel-2a"].copy()
    new["image_id"] = "new-" + new["image_id"]
    upsert_clustered(
        store,
        rd.from_pandas(pd.concat([mod, new], ignore_index=True)),
        id_col="image_id",
        locate="footprint",
        footprints_derived=True,
    )

    got = _cdc(store, 0)
    hit = _aoi_mask(base)
    want = pd.concat(
        [
            pd.DataFrame(
                {
                    "image_id": base.image_id[hit & (base.collection != "naip")],
                    "change": "delete",
                }
            ),
            pd.DataFrame(
                {
                    "image_id": base.image_id[base.collection == "naip"],
                    "change": "update",
                }
            ),
            pd.DataFrame(
                {
                    "image_id": "new-"
                    + base.image_id[base.collection == "sentinel-2a"],
                    "change": "insert",
                }
            ),
        ],
        ignore_index=True,
    ).sort_values("image_id").reset_index(drop=True)
    assert len(want.query("change == 'delete'")) > 0
    assert len(want.query("change == 'insert'")) > 0
    pd.testing.assert_frame_equal(got, want)


def test_cdc_rewrite_only_is_empty(store):
    """compact rewrites files (new generation names, same rows) — a CDC
    consumer must see NO changes: rewritten-identical rows cancel by
    content hash."""
    v0 = store_version(store)
    compact_clustered(store, target_rows=128)
    assert store_version(store) > v0
    assert len(_cdc(store, v0)) == 0


def test_cdc_same_version_empty(store):
    assert len(_cdc(store, 0, 0)) == 0


def test_cdc_delete_only(store, base):
    delete_clustered(store, bbox=AOI)
    got = _cdc(store, 0)
    assert set(got.change) == {"delete"}
    assert set(got.image_id) == set(base.image_id[_aoi_mask(base)])


def test_cdc_intermediate_version_pair(store, base):
    """CDC between two non-initial versions: v1 = delete, v2 = upsert;
    v1→v2 sees the upsert only (updates vs v1 + the AOI-naip rows and
    the new- rows as inserts)."""
    delete_clustered(store, bbox=AOI)
    v1 = store_version(store)
    mod = base[base.collection == "naip"].copy()
    mod["collection"] = "upserted"
    upsert_clustered(
        store,
        rd.from_pandas(mod),
        id_col="image_id",
        locate="footprint",
        footprints_derived=True,
    )
    got = _cdc(store, v1)
    hit = _aoi_mask(base)
    naip = base.collection == "naip"
    assert set(got.image_id[got.change == "insert"]) == set(
        base.image_id[naip & hit]
    )
    assert set(got.image_id[got.change == "update"]) == set(
        base.image_id[naip & ~hit]
    )
    assert not (got.change == "delete").any()


def test_cdc_duplicate_id_raises(tmp_path):
    df = pd.DataFrame(
        {
            "image_id": ["a", "a", "b"],
            "fp_xmin": [0.0, 1.0, 2.0],
            "fp_ymin": [0.0, 1.0, 2.0],
            "fp_xmax": [0.5, 1.5, 2.5],
            "fp_ymax": [0.5, 1.5, 2.5],
        }
    )
    out = str(tmp_path / "dup")
    write_clustered(
        rd.from_pandas(df), out, footprints_derived=True, rows_per_file=4
    )
    delete_clustered(out, bbox=(1.9, 1.9, 3.0, 3.0))  # drop 'b' → delta exists
    with pytest.raises(Exception, match="unique"):
        changes_clustered(out, 0).materialize()


def test_apply_changes_replicates_store(ray_session, tmp_path, fixtures_dir):
    """CDC APPLY (r5): clone at v0, mutate the source (AOI delete +
    merge of new rows + upsert of changed rows), apply the v0→current
    feed onto the clone — replica content equals the source exactly."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from rustac_ray.pipelines.flagship import read_images_metadata
    from rustac_ray.sources.clustered import (
        apply_changes, clone_clustered, delete_clustered, merge_clustered,
        read_clustered, upsert_clustered, write_clustered,
    )
    from rustac_ray.stages.footprint import derive_footprints

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    base = read_images_metadata("/root/testdata/sf0.001").map_batches(
        derive_footprints, batch_format="pyarrow"
    )
    write_clustered(base, src, footprints_derived=True, rows_per_file=64)
    clone_clustered(src, dst)

    # mutate the source three ways
    delete_clustered(src, bbox=(-110.0, 35.0, -105.0, 40.0))
    df = base.to_pandas()
    extra = df.head(25).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    merge_clustered(src, rd.from_pandas(extra), footprints_derived=True)
    changed = df.iloc[30:40].copy()
    changed["w"] = changed["w"] + 1000
    upsert_clustered(
        src, rd.from_pandas(changed), id_col="image_id",
        footprints_derived=True,
    )

    out = apply_changes(src, dst, 0, id_col="image_id")
    assert out["upserts"] > 0 and out["deletes"] > 0

    cols = ["image_id", "collection", "w", "h"]
    a = read_clustered(src, columns=cols).to_pandas().sort_values(
        "image_id"
    ).reset_index(drop=True)
    b = read_clustered(dst, columns=cols).to_pandas().sort_values(
        "image_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # idempotent: an empty window (current -> current) applies nothing
    from rustac_ray.sources.clustered import store_version

    cur = store_version(src)
    again = apply_changes(src, dst, cur, id_col="image_id")
    assert again.get("noop") or (again["deletes"] == 0 and again["upserts"] == 0)


def test_diff_stores_classifies_drift(ray_session, tmp_path, fixtures_dir):
    """Cross-store diff: clone + planted mutations classify exactly;
    identical stores diff to empty."""
    import pandas as pd
    import ray.data as rd

    from rustac_ray.pipelines.flagship import read_images_metadata
    from rustac_ray.sources.clustered import (
        clone_clustered, delete_clustered, diff_stores, merge_clustered,
        write_clustered,
    )
    from rustac_ray.stages.footprint import derive_footprints

    a = str(tmp_path / "da")
    b = str(tmp_path / "db")
    base = read_images_metadata("/root/testdata/sf0.001").map_batches(
        derive_footprints, batch_format="pyarrow"
    )
    write_clustered(base, a, footprints_derived=True, rows_per_file=64)
    clone_clustered(a, b)
    assert diff_stores(a, b).count() == 0  # identical clones

    df = base.to_pandas()
    victims = set(df["image_id"].iloc[:7])
    delete_clustered(b, ids=list(victims), id_col="image_id")
    extra = df.iloc[10:15].copy()
    extra["image_id"] = "new-" + extra["image_id"]
    merge_clustered(b, rd.from_pandas(extra), footprints_derived=True)

    got = diff_stores(a, b).to_pandas()
    by = got.set_index("image_id")["change"]
    assert set(by[by == "delete"].index) == victims
    assert set(by[by == "insert"].index) == set(extra["image_id"])
    assert (by != "update").all()  # no content drift planted
