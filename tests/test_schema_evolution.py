"""Schema evolution over the Morton-clustered store (sources/evolution +
the clustered read/merge/compact/delete/CDC hooks).

Analogue surface: the reference rewrites every item to change its shape
(migrate.rs); this is the layout-level complement — Iceberg-style stable
column ids, so add/rename/drop are O(columns) metadata ops and READS
reconcile old files (rename by id, fill defaults, drop retired columns)
instead of a 100-TB rewrite.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.pipelines.flagship import read_images_metadata
from rustac_ray.sources import evolution
from rustac_ray.sources.clustered import (
    SpatialManifest,
    changes_clustered,
    compact_clustered,
    delete_clustered,
    evolve_clustered,
    merge_clustered,
    read_clustered,
    store_schema,
    store_version,
    vacuum_clustered,
    write_clustered,
)
from rustac_ray.stages.footprint import derive_footprints

SF = "/root/testdata/sf0.001"
COLS = ["image_id", "collection", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]


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
    out = str(tmp_path / "evo")
    write_clustered(
        rd.from_pandas(full_fp), out, footprints_derived=True, rows_per_file=32
    )
    return out


def test_rename_add_drop_roundtrip(store, full_fp):
    info = evolve_clustered(
        store,
        rename={"collection": "source"},
        add={"weight": 1.5, "note": (None, "string")},
    )
    assert info["schema_version"] == 1
    assert info["columns"] == ["image_id", "source", "weight", "note"]
    assert store_version(store) == 1  # evolve is a store version

    df = read_clustered(store).to_pandas()
    # renamed column carries the ORIGINAL values (mapped by id, no IO)
    orig = full_fp.sort_values("image_id").reset_index(drop=True)
    got = df.sort_values("image_id").reset_index(drop=True)
    assert (got["source"] == orig["collection"]).all()
    # added columns fill their recorded defaults in pre-add files
    assert (got["weight"] == 1.5).all()
    assert got["note"].isna().all()
    # internal layout columns survive (pruning stays schema-agnostic)
    assert {"fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax", "_zkey"} <= set(df)

    evolve_clustered(store, drop=["weight"])
    df2 = read_clustered(store, columns=["image_id", "source", "note"]).to_pandas()
    assert list(df2.columns) == ["image_id", "source", "note"]

    # dropped names are gone from narrow reads too
    with pytest.raises((KeyError, Exception)):
        read_clustered(store, columns=["weight"]).to_pandas()


def test_time_travel_sees_old_schema(store, full_fp):
    evolve_clustered(store, rename={"collection": "source"})
    # version 0 = pre-evolve: the ORIGINAL logical schema
    v0 = read_clustered(store, version=0).to_pandas()
    assert "collection" in v0.columns and "source" not in v0.columns
    v1 = read_clustered(store, version=1).to_pandas()
    assert "source" in v1.columns and "collection" not in v1.columns
    names0 = [c["name"] for c in store_schema(store, version=0)]
    assert "collection" in names0 and "fp_xmin" not in names0  # no internals


def test_merge_after_evolve_upgrades_touched_files(store, full_fp):
    evolve_clustered(store, add={"weight": 2.0}, rename={"collection": "source"})
    extra = full_fp.head(40).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    extra = extra.rename(columns={"collection": "source"})
    extra["weight"] = 9.0
    merge_clustered(store, rd.from_pandas(extra), footprints_derived=True)

    df = read_clustered(store).to_pandas()
    assert len(df) == len(full_fp) + 40
    new = df[df["image_id"].str.startswith("new-")]
    old = df[~df["image_id"].str.startswith("new-")]
    assert (new["weight"] == 9.0).all()
    assert (old["weight"] == 2.0).all()  # pre-add rows fill the default
    # touched files were opportunistically upgraded to the live schema
    recs = SpatialManifest(store).completed().values()
    assert any(int(r.get("schema_v", 0)) == 1 for r in recs)
    assert any(int(r.get("schema_v", 0)) == 0 for r in recs)  # untouched stay


def test_compact_rewrites_to_live_schema(store, full_fp):
    evolve_clustered(store, rename={"collection": "source"}, add={"q": 0.5})
    before = read_clustered(store).to_pandas()
    compact_clustered(store, target_rows=64)
    after = read_clustered(store).to_pandas()
    pd.testing.assert_frame_equal(
        before.sort_values("image_id").reset_index(drop=True)[sorted(before)],
        after.sort_values("image_id").reset_index(drop=True)[sorted(after)],
    )


def test_delete_by_renamed_id_column(store, full_fp):
    evolve_clustered(store, rename={"image_id": "img"})
    victims = list(full_fp["image_id"].head(10))
    out = delete_clustered(store, ids=victims, id_col="img")
    assert out["rows_deleted"] == 10
    left = read_clustered(store, columns=["img"]).to_pandas()
    assert set(victims).isdisjoint(set(left["img"]))


def test_drop_then_readd_never_resurrects(store, full_fp):
    evolve_clustered(store, drop=["collection"])
    evolve_clustered(store, add={"collection": "fresh"})
    df = read_clustered(store).to_pandas()
    # the re-added name is a NEW column id: old physical values stay dead
    assert (df["collection"] == "fresh").all()


def test_cdc_across_evolve_ignores_added_columns(store, full_fp):
    # v0 -> evolve (v1) -> delete (v2): CDC v0->v2 must report exactly the
    # deletions; the added column (a schema change) must NOT turn every
    # row into an update
    evolve_clustered(store, add={"weight": 1.0}, rename={"collection": "source"})
    victims = list(full_fp["image_id"].head(7))
    delete_clustered(store, ids=victims, id_col="image_id")
    ch = changes_clustered(store, 0, id_col="image_id").to_pandas()
    assert set(ch["change"]) <= {"delete"}
    assert set(ch[ch["change"] == "delete"]["image_id"]) == set(victims)


def test_evolve_validation(store):
    with pytest.raises(ValueError, match="internal"):
        evolve_clustered(store, rename={"fp_xmin": "x"})
    with pytest.raises(ValueError, match="no live column"):
        evolve_clustered(store, drop=["nope"])
    with pytest.raises(ValueError, match="already live"):
        evolve_clustered(store, add={"collection": "x"})
    with pytest.raises(ValueError, match="explicit"):
        evolve_clustered(store, add={"n": None})
    # rename -> drop composes (drop names are post-rename)
    evolve_clustered(store, rename={"collection": "c2"}, drop=["c2"])
    assert "c2" not in [c["name"] for c in store_schema(store)]


def test_vacuum_expires_schema_snapshots(store, full_fp):
    evolve_clustered(store, add={"w1": 1.0})
    evolve_clustered(store, add={"w2": 2.0})
    delete_clustered(store, ids=[full_fp["image_id"].iloc[0]], id_col="image_id")
    assert store_version(store) == 3
    vacuum_clustered(store, keep_versions=1)
    hdir = os.path.join(store, "_history")
    left = [n for n in os.listdir(hdir)] if os.path.isdir(hdir) else []
    assert not any(n.startswith("schema.v0") for n in left)
    # current version still reads with the full evolved schema
    df = read_clustered(store).to_pandas()
    assert {"w1", "w2"} <= set(df.columns)
    with pytest.raises(ValueError):
        read_clustered(store, version=0)


def test_column_pruned_read_on_evolved_store(store, full_fp):
    evolve_clustered(store, rename={"collection": "source"}, add={"w": 1.0})
    df = read_clustered(
        store, bbox=(-110.0, 35.0, -105.0, 40.0), columns=["image_id", "source", "w"]
    ).to_pandas()
    assert list(df.columns) == ["image_id", "source", "w"]
    # same rows as the identity store would return for the box
    ctrl = full_fp[
        (full_fp["fp_xmin"] <= -105.0)
        & (full_fp["fp_xmax"] >= -110.0)
        & (full_fp["fp_ymin"] <= 40.0)
        & (full_fp["fp_ymax"] >= 35.0)
    ]
    assert set(df["image_id"]) == set(ctrl["image_id"])


def test_upsert_after_evolve(store, full_fp):
    """UPSERT on an evolved store: the id column was renamed and a typed
    default added — replacement rows arrive in the LIVE schema, the
    delete leg probes by the file's physical id name, and the merge leg
    reconciles touched files before the concat."""
    from rustac_ray.sources.clustered import upsert_clustered

    evolve_clustered(
        store, rename={"image_id": "img"}, add={"weight": (1.0, "float64")}
    )
    repl = full_fp.head(25).copy().rename(columns={"image_id": "img"})
    repl["collection"] = "replaced"
    repl["weight"] = 5.0
    out = upsert_clustered(
        store, rd.from_pandas(repl), id_col="img", locate="footprint",
        footprints_derived=True,
    )
    assert out["rows_deleted"] == 25 and out["rows_upserted"] == 25

    df = read_clustered(store).to_pandas()
    assert len(df) == len(full_fp)
    hit = df[df["img"].isin(set(repl["img"]))]
    assert (hit["collection"] == "replaced").all()
    assert (hit["weight"] == 5.0).all()
    rest = df[~df["img"].isin(set(repl["img"]))]
    assert (rest["weight"] == 1.0).all()  # pre-add rows fill the default


def test_retype_widening(tmp_path, full_fp):
    """Type widening (Iceberg promotion rules): int32→int64 is a
    metadata op; old files cast up at read time; merged rows land wide;
    non-widening retypes raise."""
    imgs = (
        read_images_metadata(SF)
        .map_batches(derive_footprints, batch_format="pyarrow")
        .to_pandas()
    )[["image_id", "w", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]]
    assert imgs["w"].dtype == np.int32
    out = str(tmp_path / "rt")
    write_clustered(
        rd.from_pandas(imgs), out, footprints_derived=True, rows_per_file=64
    )
    with pytest.raises(ValueError, match="widening"):
        evolve_clustered(out, retype={"w": "float32"})  # not a promotion
    with pytest.raises(ValueError, match="widening"):
        evolve_clustered(out, retype={"image_id": "int64"})
    evolve_clustered(out, retype={"w": "int64"})

    df = read_clustered(out).to_pandas()
    assert df["w"].dtype == np.int64
    got_w = df.set_index("image_id")["w"].sort_index()
    want_w = imgs.set_index("image_id")["w"].sort_index()
    assert (got_w.to_numpy() == want_w.to_numpy()).all()

    # merged rows (already int64) concat cleanly with cast-up old files
    extra = imgs.head(10).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    extra["w"] = extra["w"].astype(np.int64)
    merge_clustered(out, rd.from_pandas(extra), footprints_derived=True)
    df2 = read_clustered(out).to_pandas()
    assert df2["w"].dtype == np.int64 and len(df2) == len(imgs) + 10


def test_caller_filter_on_mixed_schema_store(store, full_fp):
    """r4 ADVICE (medium): a ``filter=`` written in LIVE logical names
    must apply exactly to file groups written under OLDER physical
    schemas (pushdown would miss the renamed column there) — older
    groups filter post-reconcile instead."""
    import pyarrow.compute as pc

    evolve_clustered(store, rename={"collection": "source"})
    extra = full_fp.head(40).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    extra = extra.rename(columns={"collection": "source"})
    merge_clustered(store, rd.from_pandas(extra), footprints_derived=True)
    svs = {
        int(r.get("schema_v", 0))
        for r in SpatialManifest(store).completed().values()
    }
    assert svs == {0, 1}  # genuinely mixed-schema

    ctrl = pd.concat(
        [full_fp.rename(columns={"collection": "source"}), extra],
        ignore_index=True,
    )
    val = ctrl["source"].iloc[0]
    want = sorted(ctrl[ctrl["source"] == val]["image_id"])

    got = read_clustered(store, filter=pc.field("source") == val).to_pandas()
    assert sorted(got["image_id"]) == want

    # narrowed columns + live-name filter across the mixed groups
    got2 = read_clustered(
        store, columns=["image_id", "source"],
        filter=pc.field("source") == val,
    ).to_pandas()
    assert list(got2.columns) == ["image_id", "source"]
    assert sorted(got2["image_id"]) == want

    # filter column NOT in the projection
    got3 = read_clustered(
        store, columns=["image_id"], filter=pc.field("source") == val
    ).to_pandas()
    assert sorted(got3["image_id"]) == want


def test_search_clustered_mixed_schema_prefilter(tmp_path, fixtures_dir):
    """search_clustered's sargable prefilter compiles against the LIVE
    logical schema and stays exact on a store whose files span two
    physical schemas."""
    from rustac_ray import synth
    from rustac_ray.query import QuerySpec, search
    from rustac_ray.sources.clustered import search_clustered

    fdir = synth.ensure_fixtures(SF)
    items = rd.read_parquet(f"{fdir}/stac_items.parquet")
    store_dir = str(tmp_path / "mixed")
    write_clustered(items, store_dir, bbox_col="bbox", rows_per_file=16)
    evolve_clustered(store_dir, rename={"collection": "source"})

    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{fdir}/stac_items.parquet").slice(0, 12)
    ids = ["new-" + s for s in t["id"].to_pylist()]
    t = t.set_column(
        t.schema.get_field_index("id"), "id", pa.array(ids, pa.string())
    )
    t = t.rename_columns(
        ["source" if n == "collection" else n for n in t.column_names]
    )
    merge_clustered(store_dir, rd.from_arrow(t), bbox_col="bbox")
    svs = {
        int(r.get("schema_v", 0))
        for r in SpatialManifest(store_dir).completed().values()
    }
    assert svs == {0, 1}

    base = pq.read_table(
        f"{fdir}/stac_items.parquet", columns=["id", "collection"]
    ).to_pandas().rename(columns={"collection": "source"})
    extra_ctl = pd.DataFrame(
        {"id": ids, "source": t["source"].to_pylist()}
    )
    ctrl = pd.concat([base, extra_ctl], ignore_index=True)
    val = ctrl["source"].iloc[0]
    sp = QuerySpec(filter=f"source = '{val}'")
    got = search_clustered(store_dir, sp).to_pandas()
    want = sorted(ctrl[ctrl["source"] == val]["id"])
    assert sorted(got["id"]) == want and len(want) > 0
