"""Morton-clustered store: write, prune, read, resume (sources/clustered)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from rustac_ray.pipelines.flagship import read_images_metadata
from rustac_ray.sources.clustered import (
    SpatialManifest,
    morton_key,
    prune_plan,
    read_clustered,
    write_clustered,
)
from rustac_ray.stages.footprint import derive_footprints

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(tmp_path_factory, fixtures_dir):
    out = str(tmp_path_factory.mktemp("clustered") / "images")
    recs = write_clustered(read_images_metadata(SF), out, rows_per_file=32)
    return out, recs


@pytest.fixture(scope="module")
def full_fp(fixtures_dir):
    return (
        read_images_metadata(SF)
        .map_batches(derive_footprints, batch_format="pyarrow")
        .to_pandas()
    )


def _truth_ids(full, B):
    m = (
        (full.fp_xmin <= B[2])
        & (full.fp_xmax >= B[0])
        & (full.fp_ymin <= B[3])
        & (full.fp_ymax >= B[1])
    )
    return set(full.loc[m, "image_id"])


def test_morton_key_locality():
    # neighboring points share high bits; antipodal points do not
    k = morton_key(np.array([10.0, 10.001, -170.0]), np.array([45.0, 45.001, -45.0]))
    assert abs(k[0] - k[1]) < abs(k[0] - k[2])


def test_pruned_read_matches_full_scan(store, full_fp):
    out, recs = store
    assert sum(r["rows"] for r in recs) == len(full_fp)
    for B in [(-110.0, 35.0, -105.0, 40.0), (-70.0, 20.0, -60.0, 30.0)]:
        got = read_clustered(out, bbox=B, columns=["image_id"]).to_pandas()
        assert set(got["image_id"]) == _truth_ids(full_fp, B)


def test_prune_actually_skips_files(store):
    out, recs = store
    kept, total = prune_plan(out, (-110.0, 35.0, -105.0, 40.0))
    assert total == len(recs)
    # clustering makes per-file bboxes tight: a ~1/40-area query box must
    # prune well over half the files
    assert len(kept) < total / 2


def test_file_bboxes_are_tight(store, full_fp):
    _, recs = store
    gx = full_fp.fp_xmax.max() - full_fp.fp_xmin.min()
    gy = full_fp.fp_ymax.max() - full_fp.fp_ymin.min()
    areas = [(r["xmax"] - r["xmin"]) * (r["ymax"] - r["ymin"]) for r in recs]
    assert np.mean(areas) < 0.5 * gx * gy


def test_no_bbox_reads_everything(store, full_fp):
    out, _ = store
    assert read_clustered(out).count() == len(full_fp)


def test_empty_intersection(store):
    out, _ = store
    ds = read_clustered(out, bbox=(0.0, 0.0, 1.0, 1.0), columns=["image_id"])
    assert ds.count() == 0


def test_resume_skips_completed(store):
    out, recs = store
    mtimes = {
        f: os.path.getmtime(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    }
    recs2 = write_clustered(read_images_metadata(SF), out, rows_per_file=32)
    assert [r["partition_id"] for r in recs2] == [r["partition_id"] for r in recs]
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == m  # untouched


def test_antimeridian_query_splits(tmp_path):
    import ray.data as rd

    # footprints on both sides of the antimeridian + one far away
    t = pa.table(
        {
            "image_id": pa.array(["a", "b", "c", "d"]),
            "fp_xmin": pa.array([178.9, -179.9, 10.0, 179.5]),
            "fp_ymin": pa.array([10.0, 10.0, 10.0, -60.0]),
            "fp_xmax": pa.array([179.1, -179.7, 10.1, 179.7]),
            "fp_ymax": pa.array([10.2, 10.2, 10.2, -59.8]),
        }
    )
    out = str(tmp_path / "am")
    write_clustered(rd.from_arrow(t), out, footprints_derived=True)
    got = read_clustered(out, bbox=(170.0, 0.0, -170.0, 20.0), columns=["image_id"]).to_pandas()
    assert set(got["image_id"]) == {"a", "b"}


def test_manifest_roundtrip(store):
    out, recs = store
    assert len(SpatialManifest(out).completed()) == len(recs)
    # zkey ranges non-decreasing across sorted partitions (the drift guard)
    zs = [(r["zmin"], r["zmax"]) for r in recs if r["zmin"] is not None]
    assert all(b0 >= a0 for (a0, _), (b0, _) in zip(zs, zs[1:]))


def test_merge_clustered(tmp_path, full_fp):
    import ray.data as rd

    from rustac_ray.sources.clustered import merge_clustered

    base = full_fp.sample(frac=0.8, random_state=1)
    extra = full_fp.drop(base.index)
    out = str(tmp_path / "merge")
    cols = ["image_id", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
    write_clustered(rd.from_pandas(base[cols]), out, footprints_derived=True,
                    rows_per_file=64)
    before = {
        f: os.path.getmtime(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    }
    recs = merge_clustered(out, rd.from_pandas(extra[cols]), footprints_derived=True)
    assert sum(r["rows"] for r in recs) == len(full_fp)
    # merged store answers queries over the UNION
    B = (-110.0, 35.0, -105.0, 40.0)
    got = read_clustered(out, bbox=B, columns=["image_id"]).to_pandas()
    assert set(got["image_id"]) == _truth_ids(full_fp, B)
    # only files owning new rows were rewritten — versioned publishing
    # puts them under NEW generation names; every pre-merge file stays
    # on disk byte-untouched (retained for the archived version)
    after_names = {r["file"] for r in recs}
    new_files = sorted(after_names - set(before))
    assert 0 < len(new_files) <= len(before)
    for f, m in before.items():
        assert os.path.getmtime(os.path.join(out, f)) == m
    # files stay internally zkey-sorted after merge
    import pyarrow.parquet as pqt

    z = pqt.read_table(os.path.join(out, new_files[0]), columns=["_zkey"])["_zkey"].to_numpy()
    assert np.all(np.diff(z) >= 0)


def test_merge_requires_store(tmp_path):
    import ray.data as rd

    from rustac_ray.sources.clustered import merge_clustered

    with pytest.raises(FileNotFoundError):
        merge_clustered(
            str(tmp_path / "nope"),
            rd.from_arrow(pa.table({"image_id": pa.array(["x"])})),
        )


def test_compact_clustered(tmp_path, full_fp):
    import pyarrow.parquet as pqt
    import ray.data as rd

    from rustac_ray.sources.clustered import compact_clustered, merge_clustered

    cols = ["image_id", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
    out = str(tmp_path / "compact")
    # many tiny files: repartition the base into 20 blocks of ~40 rows
    base = rd.from_pandas(full_fp[cols])
    write_clustered(base, out, footprints_derived=True, rows_per_file=50)
    n0 = len(SpatialManifest(out).completed())
    assert n0 >= 10
    recs = compact_clustered(out, target_rows=250)
    # coalesced: fewer files, none tiny except possibly the tail
    assert len(recs) < n0
    assert sum(r["rows"] for r in recs) == len(full_fp)
    assert all(r["rows"] <= 2 * 250 for r in recs)
    # id sequence + zkey order invariant holds
    zs = [(r["zmin"], r["zmax"]) for r in recs]
    assert all(b0 >= a0 for (a0, _), (b0, _) in zip(zs, zs[1:]))
    # queries still exact after compaction
    B = (-110.0, 35.0, -105.0, 40.0)
    got = read_clustered(out, bbox=B, columns=["image_id"]).to_pandas()
    assert set(got["image_id"]) == _truth_ids(full_fp, B)
    # split path: merge everything into one region then re-compact
    recs2 = compact_clustered(out, target_rows=100)
    assert all(r["rows"] <= 200 for r in recs2)
    assert sum(r["rows"] for r in recs2) == len(full_fp)
    got = read_clustered(out, bbox=B, columns=["image_id"]).to_pandas()
    assert set(got["image_id"]) == _truth_ids(full_fp, B)
    # no stray hold/tmp files left behind
    assert not [f for f in os.listdir(out) if f.startswith((".hold.", ".compact."))]
    # per-file internal sort preserved
    f0 = os.path.join(out, recs2[0]["file"])
    z = pqt.read_table(f0, columns=["_zkey"])["_zkey"].to_numpy()
    assert np.all(np.diff(z) >= 0)


def test_search_clustered_pushdown(tmp_path, fixtures_dir):
    from rustac_ray.query import QuerySpec, search
    from rustac_ray.sources.clustered import prune_plan, search_clustered

    import ray.data as rd

    items = rd.read_parquet(f"{fixtures_dir}/stac_items.parquet")
    out = str(tmp_path / "items_store")
    write_clustered(items, out, bbox_col="bbox", rows_per_file=64)
    spec = QuerySpec(bbox=[-106.1, 40.5, -106.0, 40.6])
    got = search_clustered(out, spec).to_pandas()
    want = search(items, spec).to_pandas()
    assert sorted(got["id"]) == sorted(want["id"])
    assert set(got.columns) == set(want.columns)  # fp_*/_zkey dropped
    # intersects bounds drive the prune too
    spec2 = QuerySpec(
        intersects={"type": "Point", "coordinates": [-106.0, 40.5]}
    )
    got2 = search_clustered(out, spec2).to_pandas()
    want2 = search(items, spec2).to_pandas()
    assert sorted(got2["id"]) == sorted(want2["id"])
    # and no spatial term -> full scan, still correct
    spec3 = QuerySpec(ids=["item-00003"])
    assert search_clustered(out, spec3).count() == 1


def test_items_store_rejects_antimeridian_bbox(tmp_path):
    import ray.data as rd

    t = pa.table(
        {
            "id": pa.array(["x"]),
            "bbox": pa.array(
                [{"xmin": 179.0, "ymin": 0.0, "xmax": -179.0, "ymax": 1.0}]
            ),
        }
    )
    with pytest.raises(Exception, match="antimeridian"):
        write_clustered(rd.from_arrow(t), str(tmp_path / "am2"), bbox_col="bbox")


def test_mutation_lock(tmp_path, full_fp):
    import ray.data as rd

    from rustac_ray.sources.clustered import (
        StoreLockedError,
        _StoreLock,
        merge_clustered,
    )

    cols = ["image_id", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
    out = str(tmp_path / "locked")
    write_clustered(
        rd.from_pandas(full_fp[cols].head(500)), out, footprints_derived=True,
        rows_per_file=100,
    )
    extra = rd.from_pandas(full_fp[cols].tail(100))
    # a live lock blocks mutation...
    with _StoreLock(out):
        with pytest.raises(StoreLockedError):
            merge_clustered(out, extra, footprints_derived=True)
    # ...a stale lock (dead pid) is reclaimed
    with open(os.path.join(out, "_mutation.lock"), "w") as f:
        f.write("999999999")
    recs = merge_clustered(out, extra, footprints_derived=True)
    assert sum(r["rows"] for r in recs) == 600
    assert not os.path.exists(os.path.join(out, "_mutation.lock"))


def test_crash_resume_completes(tmp_path, full_fp):
    """Simulate a crash mid-write: manifest holds a prefix of the
    partitions and one written file has no record (rename happened,
    append didn't). Re-running completes the store exactly."""
    import json as _json

    import ray.data as rd

    cols = ["image_id", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
    out = str(tmp_path / "crash")
    recs = write_clustered(
        rd.from_pandas(full_fp[cols]), out,
        footprints_derived=True, rows_per_file=100,
    )
    assert len(recs) >= 6
    man_path = os.path.join(out, "_spatial_manifest.jsonl")
    with open(man_path) as f:
        lines = [l for l in f if l.strip()]
    # drop the last 3 records; delete 2 of those files, leave 1 orphan
    dropped = [_json.loads(l) for l in lines[-3:]]
    with open(man_path, "w") as f:
        f.writelines(lines[:-3])
    for r in dropped[:2]:
        os.remove(os.path.join(out, r["file"]))
    recs2 = write_clustered(
        rd.from_pandas(full_fp[cols]), out,
        footprints_derived=True, rows_per_file=100,
    )
    assert [r["partition_id"] for r in recs2] == [r["partition_id"] for r in recs]
    assert sum(r["rows"] for r in recs2) == len(full_fp)
    got = read_clustered(out, columns=["image_id"]).to_pandas()
    assert sorted(got["image_id"]) == sorted(full_fp["image_id"])


def test_full_lifecycle_write_compact_merge(tmp_path, full_fp):
    import ray.data as rd

    from rustac_ray.sources.clustered import compact_clustered, merge_clustered

    cols = ["image_id", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
    base = full_fp.sample(frac=0.7, random_state=3)
    extra = full_fp.drop(base.index)
    out = str(tmp_path / "cycle")
    write_clustered(rd.from_pandas(base[cols]), out, footprints_derived=True,
                    rows_per_file=40)
    compact_clustered(out, target_rows=120)  # resequences partition ids
    recs = merge_clustered(out, rd.from_pandas(extra[cols]),
                           footprints_derived=True)
    assert sum(r["rows"] for r in recs) == len(full_fp)
    B = (-110.0, 35.0, -105.0, 40.0)
    got = read_clustered(out, bbox=B, columns=["image_id"]).to_pandas()
    assert set(got["image_id"]) == _truth_ids(full_fp, B)


def test_search_clustered_3d_bbox(tmp_path, fixtures_dir):
    import ray.data as rd

    from rustac_ray.query import QuerySpec, search
    from rustac_ray.sources.clustered import search_clustered

    items = rd.read_parquet(f"{fixtures_dir}/stac_items.parquet")
    out = str(tmp_path / "store3d")
    write_clustered(items, out, bbox_col="bbox", rows_per_file=64)
    spec = QuerySpec(bbox=[-106.1, 40.5, 0.0, -106.0, 40.6, 100.0])
    got = search_clustered(out, spec).to_pandas()
    want = search(items, spec).to_pandas()
    assert sorted(got["id"]) == sorted(want["id"]) and len(got) > 0


def test_knn_clustered_matches_bruteforce(store, full_fp):
    from rustac_ray.sources.clustered import knn_clustered

    out, _ = store
    rng = np.random.default_rng(6)
    probes = {
        f"q{i}": (float(rng.uniform(-115, -65)), float(rng.uniform(25, 48)))
        for i in range(12)
    }
    got = knn_clustered(out, probes, k=3)
    cx = ((full_fp.fp_xmin + full_fp.fp_xmax) / 2).to_numpy()
    cy = ((full_fp.fp_ymin + full_fp.fp_ymax) / 2).to_numpy()
    ids = full_fp["image_id"].to_numpy(object)
    for qid, (x, y) in probes.items():
        d2 = (cx - x) ** 2 + (cy - y) ** 2
        order = np.lexsort((ids, d2))[:3]
        want = [ids[i] for i in order]
        g = got[got.query_id == qid].sort_values("dist")
        assert g["image_id"].tolist() == want, qid
    # tiny r0 forces many ring expansions; still exact
    got2 = knn_clustered(out, {"q0": probes["q0"]}, k=3, r0=1e-4, max_rounds=30)
    assert got2["image_id"].tolist() == got[got.query_id == "q0"].sort_values("dist")["image_id"].tolist()


def test_compact_relative_out_dir(tmp_path, full_fp, monkeypatch):
    """CLI-shaped invocation: a RELATIVE store path must compact cleanly
    (the r3 isabs() staging inference broke here, stranding the store)."""
    import ray.data as rd

    from rustac_ray.sources.clustered import compact_clustered

    cols = ["image_id", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
    monkeypatch.chdir(tmp_path)
    write_clustered(rd.from_pandas(full_fp[cols]), "relstore",
                    footprints_derived=True, rows_per_file=50)
    recs = compact_clustered("relstore", target_rows=250)
    assert sum(r["rows"] for r in recs) == len(full_fp)
    B = (-110.0, 35.0, -105.0, 40.0)
    got = read_clustered("relstore", bbox=B, columns=["image_id"]).to_pandas()
    assert set(got["image_id"]) == _truth_ids(full_fp, B)
    # read after a second compact (generation bump) still exact
    compact_clustered("relstore", target_rows=100)
    got = read_clustered("relstore", bbox=B, columns=["image_id"]).to_pandas()
    assert set(got["image_id"]) == _truth_ids(full_fp, B)


def test_merge_crash_before_publish_repaired_on_read(tmp_path, full_fp, monkeypatch):
    """Crash between staging and publish: journal + tmp files on disk,
    published files and manifest untouched. The next READ replays the
    journal and sees the merged union; no stale-stats mis-prune window."""
    import ray.data as rd

    import rustac_ray.sources.clustered as cl

    cols = ["image_id", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
    base = full_fp.sample(frac=0.8, random_state=7)
    extra = full_fp.drop(base.index)
    out = str(tmp_path / "crashmerge")
    write_clustered(rd.from_pandas(base[cols]), out, footprints_derived=True,
                    rows_per_file=64)
    # simulate dying right after the journal is durable
    monkeypatch.setattr(cl, "_apply_journal", lambda d: False)
    cl.merge_clustered(out, rd.from_pandas(extra[cols]), footprints_derived=True)
    monkeypatch.undo()
    assert os.path.exists(os.path.join(out, "_publish_journal.json"))
    # pre-repair: published files still the OLD consistent store
    B = (-110.0, 35.0, -105.0, 40.0)
    got = read_clustered(out, bbox=B, columns=["image_id"]).to_pandas()
    assert set(got["image_id"]) == _truth_ids(full_fp, B)  # read repaired it
    assert not os.path.exists(os.path.join(out, "_publish_journal.json"))
    total = read_clustered(out, columns=["image_id"]).count()
    assert total == len(full_fp)


def test_compact_crash_before_publish_repaired_on_next_mutation(
    tmp_path, full_fp, monkeypatch
):
    """Crash mid-compact (journal written, nothing published): the next
    mutation replays it at entry, then proceeds — applied twice is a no-op
    (idempotent steps: old-gen sources never reappear)."""
    import ray.data as rd

    import rustac_ray.sources.clustered as cl

    cols = ["image_id", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
    base = full_fp.sample(frac=0.7, random_state=9)
    extra = full_fp.drop(base.index)
    out = str(tmp_path / "crashcompact")
    write_clustered(rd.from_pandas(base[cols]), out, footprints_derived=True,
                    rows_per_file=40)
    monkeypatch.setattr(cl, "_apply_journal", lambda d: False)
    cl.compact_clustered(out, target_rows=120)
    monkeypatch.undo()
    jp = os.path.join(out, "_publish_journal.json")
    assert os.path.exists(jp)
    # replaying the journal twice must be a no-op the second time
    assert cl._apply_journal(out) is True
    assert not os.path.exists(jp)
    recs = cl.merge_clustered(out, rd.from_pandas(extra[cols]),
                              footprints_derived=True)
    assert sum(r["rows"] for r in recs) == len(full_fp)
    B = (-110.0, 35.0, -105.0, 40.0)
    got = read_clustered(out, bbox=B, columns=["image_id"]).to_pandas()
    assert set(got["image_id"]) == _truth_ids(full_fp, B)
    # no stray staged/tmp files remain anywhere in the lifecycle
    assert not [f for f in os.listdir(out)
                if f.startswith((".compact.", ".merge.", ".hold."))]


def test_count_clustered_matches_read(ray_session, tmp_path):
    """count_clustered = metadata-first COUNT: manifest rows for contained
    files + a stat-pruned local scan of boundary files only."""
    import numpy as np
    import ray.data as rd

    from rustac_ray import synth
    from rustac_ray.sources.clustered import (
        count_clustered,
        read_clustered,
        write_clustered,
    )

    fdir = synth.ensure_fixtures("/root/testdata/sf0.001")
    imgs = rd.read_parquet(
        f"{fdir}/images.parquet", columns=["image_id", "w", "h", "transform"]
    )
    store = str(tmp_path / "cstore")
    write_clustered(imgs, store, rows_per_file=64)

    # whole-store count: zero data IO
    total, nfull, npart = count_clustered(store, detail=True)
    assert total == imgs.count() and npart == 0

    rng = np.random.default_rng(23)
    any_full = False
    for _ in range(8):
        x0 = rng.uniform(-120, -70)
        y0 = rng.uniform(20, 45)
        box = (x0, y0, x0 + rng.uniform(2, 30), y0 + rng.uniform(2, 15))
        got, nf, npz = count_clustered(store, box, detail=True)
        want = read_clustered(store, bbox=box, columns=["image_id"]).count()
        assert got == want, box
        any_full = any_full or nf > 0
    # a store-envelope-sized box must hit the all-contained fast path
    got, nf, npz = count_clustered(store, (-180, -90, 180, 90), detail=True)
    assert got == total and npz == 0 and nf > 0


def test_temporal_manifest_pruning(ray_session, tmp_path):
    """Per-file tmin/tmax stats prune files by datetime; results identical
    to the unpruned read + search, including rows matching only via the
    start/end range (the conservative interval rule)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rustac_ray import synth
    from rustac_ray.query import QuerySpec, search
    from rustac_ray.sources.clustered import (
        prune_plan,
        read_clustered,
        search_clustered,
        write_clustered,
    )

    fdir = synth.ensure_fixtures("/root/testdata/sf0.001")
    items = rd.read_parquet(f"{fdir}/stac_items.parquet")
    store = str(tmp_path / "tstore")
    write_clustered(items, store, bbox_col="bbox", rows_per_file=16)

    # manifest carries temporal stats
    import json, os
    recs = [json.loads(l) for l in open(os.path.join(store, "_spatial_manifest.jsonl")) if l.strip()]
    assert all("tmin" in r and "tmax" in r for r in recs)

    # identical search results through the temporally-pruned path (the
    # fixture's time does NOT correlate with space, so spatially-clustered
    # files each span most of the time range — pruning here is legitimately
    # ~0; the prune-EFFECT case is the swath test below)
    win = "2024-11-01/2024-11-10"
    sp = QuerySpec(datetime=win)
    got = search_clustered(store, sp).to_pandas()
    base = search(items, sp).to_pandas()
    assert sorted(got["id"]) == sorted(base["id"]) and len(got) > 0

    # time-correlated-with-space corpus (a progressing orbit swath): Morton
    # files become time-local and a narrow window prunes most files
    import ray.data as _rd

    n = 2000
    lon = np.linspace(-119, -61, n)
    day = (np.arange(n) * 30 // n).astype(int)  # 30 days west→east
    swath = pa.table(
        {
            "id": [f"s{i}" for i in range(n)],
            "bbox": pa.array(
                [
                    {"xmin": float(x), "ymin": 30.0, "xmax": float(x) + 0.5, "ymax": 30.5}
                    for x in lon
                ],
                pa.struct([("xmin", pa.float64()), ("ymin", pa.float64()),
                           ("xmax", pa.float64()), ("ymax", pa.float64())]),
            ),
            "datetime": pa.array(
                [np.datetime64("2024-06-01", "ms") + np.timedelta64(int(d), "D") for d in day],
                pa.timestamp("ms"),
            ),
        }
    )
    sstore = str(tmp_path / "swath")
    write_clustered(_rd.from_arrow(swath), sstore, bbox_col="bbox", rows_per_file=128)
    kept, total = prune_plan(sstore, None, datetime="2024-06-03/2024-06-06")
    assert 0 < len(kept) < total // 2, (len(kept), total)
    got_n = read_clustered(sstore, datetime="2024-06-03/2024-06-06", columns=["id", "datetime"]).count()
    # file-level prune is conservative — rows still need the interval rule;
    # compare against the brute filter
    d = swath["datetime"].to_pandas()
    assert got_n >= ((d >= pd.Timestamp("2024-06-03")) & (d <= pd.Timestamp("2024-06-06"))).sum()

    # out-of-range window: everything prunes, empty (schema-correct) result
    kept2, _ = prune_plan(store, None, datetime="2030/2031")
    assert kept2 == []
    assert search_clustered(store, QuerySpec(datetime="2030/2031")).count() == 0

    # combined spatial+temporal prune keeps correctness
    sp3 = QuerySpec(bbox=[-115, 25, -95, 45], datetime="../2024-11-20")
    got3 = search_clustered(store, sp3).to_pandas()
    base3 = search(items, sp3).to_pandas()
    assert sorted(got3["id"]) == sorted(base3["id"])


def test_temporal_pruning_range_only_rows(ray_session, tmp_path):
    """A file whose only match is via (start_datetime, end_datetime) with
    null datetime must NOT be pruned (tmin/tmax fold range columns in)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rustac_ray.query import QuerySpec
    from rustac_ray.sources.clustered import prune_plan, search_clustered, write_clustered
    import ray.data as rd

    def ts(s):
        return np.datetime64(s, "ms")

    # 3 range-only rows (null datetime) in one spatial cluster; 12 old rows
    # far away (low zkeys first for the range cluster) — with zkey-ordered
    # equi-depth files, at least the top file is pure-far (tmax=2020) and
    # must prune; the range-only rows must survive via start/end stats
    n_far = 12
    ids = [f"range-only-{i}" for i in range(3)] + [f"far-{i}" for i in range(n_far)]
    boxes = [
        {"xmin": -100.0 + i, "ymin": 30.0, "xmax": -99.5 + i, "ymax": 30.5}
        for i in range(3)
    ] + [
        {"xmin": 10.0 + i * 0.7, "ymin": 10.0, "xmax": 10.5 + i * 0.7, "ymax": 10.5}
        for i in range(n_far)
    ]
    t = pa.table(
        {
            "id": ids,
            "bbox": pa.array(
                boxes,
                pa.struct([("xmin", pa.float64()), ("ymin", pa.float64()),
                           ("xmax", pa.float64()), ("ymax", pa.float64())]),
            ),
            "geometry": pa.array([None] * (3 + n_far), pa.binary()),
            "datetime": pa.array(
                [None] * 3 + [ts("2020-01-01")] * n_far, pa.timestamp("ms")
            ),
            "start_datetime": pa.array(
                [ts("2024-06-01")] * 3 + [None] * n_far, pa.timestamp("ms")
            ),
            "end_datetime": pa.array(
                [ts("2024-07-01")] * 3 + [None] * n_far, pa.timestamp("ms")
            ),
            "collection": ["c1"] * (3 + n_far),
        }
    )
    store = str(tmp_path / "rstore")
    write_clustered(rd.from_arrow(t), store, bbox_col="bbox", rows_per_file=5)
    kept, total = prune_plan(store, None, datetime="2024-06-10/2024-06-20")
    assert total >= 3 and len(kept) < total, (len(kept), total)
    got = search_clustered(store, QuerySpec(datetime="2024-06-10/2024-06-20")).to_pandas()
    assert sorted(got["id"]) == [f"range-only-{i}" for i in range(3)]


# ---------------------------------------------------------------- delete/upsert


def _store_df(out):
    """Full store contents + per-file manifest-vs-recomputed stat check."""
    import pandas as pd
    import pyarrow.parquet as _pq

    recs = sorted(
        SpatialManifest(out).completed().values(), key=lambda r: r["partition_id"]
    )
    frames = []
    for r in recs:
        t = _pq.read_table(os.path.join(out, r["file"]))
        assert t.num_rows == r["rows"]
        assert float(t["fp_xmin"].to_numpy().min()) == r["xmin"]
        assert float(t["fp_xmax"].to_numpy().max()) == r["xmax"]
        z = t["_zkey"].to_numpy()
        assert (int(z.min()), int(z.max())) == (r["zmin"], r["zmax"])
        frames.append(t.to_pandas())
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()


@pytest.fixture()
def mut_store(tmp_path, full_fp):
    """Fresh (function-scoped) store for mutation tests."""
    import ray.data as rd

    out = str(tmp_path / "mutable")
    write_clustered(
        rd.from_pandas(full_fp), out, footprints_derived=True, rows_per_file=32
    )
    return out


def test_delete_bbox_matches_flat_filter(mut_store, full_fp):
    from rustac_ray.sources.clustered import delete_clustered

    B = (-110.0, 35.0, -105.0, 40.0)
    victims = _truth_ids(full_fp, B)
    assert victims
    s = delete_clustered(mut_store, bbox=B)
    assert s["rows_deleted"] == len(victims)
    # pruned candidate set: files not intersecting B were never scanned
    assert s["files_scanned"] < s["files_total"]
    left = _store_df(mut_store)
    assert set(left["image_id"]) == set(full_fp["image_id"]) - victims
    # idempotent: same delete again is a no-op
    s2 = delete_clustered(mut_store, bbox=B)
    assert s2["rows_deleted"] == 0 and s2["files_rewritten"] == 0


def test_delete_by_ids_scan_path(mut_store, full_fp):
    from rustac_ray.sources.clustered import delete_clustered

    ids = sorted(full_fp["image_id"])[7:21]
    s = delete_clustered(mut_store, ids=ids, id_col="image_id")
    assert s["rows_deleted"] == len(ids)
    assert s["files_scanned"] == s["files_total"]  # no stats to prune on
    left = _store_df(mut_store)
    assert set(left["image_id"]) == set(full_fp["image_id"]) - set(ids)


def test_delete_datetime_interval(mut_store, full_fp):
    from rustac_ray.sources.clustered import delete_clustered

    lo = full_fp["datetime"].quantile(0.3)
    hi = full_fp["datetime"].quantile(0.6)
    victims = set(
        full_fp.loc[
            (full_fp["datetime"] >= lo) & (full_fp["datetime"] <= hi), "image_id"
        ]
    )
    s = delete_clustered(
        mut_store, datetime=(np.datetime64(lo, "ms"), np.datetime64(hi, "ms"))
    )
    assert s["rows_deleted"] == len(victims)
    left = _store_df(mut_store)
    assert set(left["image_id"]) == set(full_fp["image_id"]) - victims


def test_delete_refuses_unconditional(mut_store):
    from rustac_ray.sources.clustered import delete_clustered

    with pytest.raises(ValueError, match="unconditional"):
        delete_clustered(mut_store)


def test_delete_drops_emptied_files(mut_store, full_fp):
    from rustac_ray.sources.clustered import delete_clustered

    # world box empties every file → all dropped, store empty but valid
    s = delete_clustered(mut_store, bbox=(-180.0, -90.0, 180.0, 90.0))
    assert s["rows_deleted"] == len(full_fp)
    assert s["files_dropped"] == s["files_total"]
    assert _store_df(mut_store).empty
    # dropped files are RETAINED on disk for the archived pre-delete
    # version (time travel); vacuum with no history retention reclaims
    from rustac_ray.sources.clustered import vacuum_clustered

    assert [f for f in os.listdir(mut_store) if f.endswith(".parquet")]
    v = vacuum_clustered(mut_store, keep_versions=1)
    assert v["files_deleted"] > 0
    assert not [f for f in os.listdir(mut_store) if f.endswith(".parquet")]


def test_delete_predicate(mut_store, full_fp):
    from rustac_ray.sources.clustered import delete_clustered

    def pred(t):
        return np.asarray(
            [c == "landsat-c2" for c in t["collection"].to_pylist()], bool
        )

    victims = set(full_fp.loc[full_fp["collection"] == "landsat-c2", "image_id"])
    assert victims
    s = delete_clustered(mut_store, predicate=pred)
    assert s["rows_deleted"] == len(victims)
    left = _store_df(mut_store)
    assert set(left["image_id"]) == set(full_fp["image_id"]) - victims


def test_delete_crash_before_publish_repaired(tmp_path, full_fp, monkeypatch):
    import ray.data as rd

    import rustac_ray.sources.clustered as cl

    out = str(tmp_path / "crashdel")
    write_clustered(
        rd.from_pandas(full_fp), out, footprints_derived=True, rows_per_file=32
    )
    B = (-110.0, 35.0, -105.0, 40.0)
    monkeypatch.setattr(cl, "_apply_journal", lambda d: False)
    cl.delete_clustered(out, bbox=B)
    monkeypatch.undo()
    assert os.path.exists(os.path.join(out, "_publish_journal.json"))
    # next read repairs: sees the post-delete store
    got = read_clustered(out, columns=["image_id"]).to_pandas()
    assert set(got["image_id"]) == set(full_fp["image_id"]) - _truth_ids(full_fp, B)
    assert not os.path.exists(os.path.join(out, "_publish_journal.json"))


def test_upsert_footprint_replaces_in_place(mut_store, full_fp):
    import ray.data as rd

    from rustac_ray.sources.clustered import delete_clustered, upsert_clustered

    mod = full_fp.sample(n=20, random_state=3).copy()
    mod["collection"] = "REPLACED"
    s = upsert_clustered(
        mut_store,
        rd.from_pandas(mod),
        id_col="image_id",
        locate="footprint",
        footprints_derived=True,
    )
    assert s["rows_deleted"] == 20 and s["rows_upserted"] == 20
    # footprint mode scans only the zkey-owning files, never the store
    assert s["files_scanned"] < s["files_total"]
    left = _store_df(mut_store)
    assert len(left) == len(full_fp)  # replaced, not appended
    assert left["image_id"].is_unique
    assert set(left.loc[left["collection"] == "REPLACED", "image_id"]) == set(
        mod["image_id"]
    )
    # rerunning the same upsert converges to the same store
    upsert_clustered(
        mut_store, rd.from_pandas(mod), id_col="image_id",
        locate="footprint", footprints_derived=True,
    )
    again = _store_df(mut_store)
    assert len(again) == len(full_fp) and again["image_id"].is_unique
    delete_clustered(mut_store, ids=["no-such-id"], id_col="image_id")  # still valid


def test_upsert_scan_handles_moved_footprints(mut_store, full_fp):
    import ray.data as rd

    from rustac_ray.sources.clustered import upsert_clustered

    moved = full_fp.sample(n=10, random_state=5).copy()
    for c in ("fp_xmin", "fp_xmax"):
        moved[c] = np.clip(moved[c] + 40.0, -180.0, 180.0)
    s = upsert_clustered(
        mut_store,
        rd.from_pandas(moved),
        id_col="image_id",
        locate="scan",
        footprints_derived=True,
    )
    assert s["rows_deleted"] == 10
    left = _store_df(mut_store)
    assert len(left) == len(full_fp) and left["image_id"].is_unique
    got = left.set_index("image_id").loc[list(moved["image_id"]), "fp_xmin"]
    assert np.allclose(
        got.to_numpy(), moved.set_index("image_id")["fp_xmin"].reindex(got.index)
    )


def test_zone_map_column_pruning(tmp_path, ray_session):
    """write_clustered(stats_cols=...): per-file min/max zone maps prune
    files for non-spatial predicates; mutations keep them fresh; renames
    map by column id."""
    import pandas as pd
    import ray.data as rd

    import rustac_ray.sources.clustered as cl

    # value correlates with x, so the Z-order layout gives tight per-file
    # value ranges (the realistic case: acquisition properties correlate
    # with geography/time, which correlate with the clustering key)
    n = 2000
    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(-120, -70, n))
    y = rng.uniform(25, 48, n)
    df = pd.DataFrame(
        {
            "image_id": [f"i{i:05d}" for i in range(n)],
            "cloud": np.linspace(0.0, 100.0, n),
            "fp_xmin": x, "fp_ymin": y,
            "fp_xmax": x + 0.01, "fp_ymax": y + 0.01,
        }
    )
    store = str(tmp_path / "zm")
    cl.write_clustered(
        rd.from_pandas(df), store, footprints_derived=True,
        rows_per_file=128, stats_cols=["cloud"],
    )
    recs = list(cl.SpatialManifest(store).completed().values())
    assert all("cs0_cloud" in r and r["cs0_cloud"] is not None for r in recs)

    kept, total = cl.prune_plan(store, None, column_ranges={"cloud": (95.0, None)})
    assert 0 < len(kept) < total  # actual file-level selectivity

    got = cl.read_clustered(
        store, column_ranges={"cloud": (95.0, None)},
    ).to_pandas()
    want = df[df["cloud"] >= 95.0]
    # conservative prefilter may keep extra rows of kept files — apply
    # the exact predicate and compare
    got = got[got["cloud"] >= 95.0]
    assert set(got["image_id"]) == set(want["image_id"])

    # delete refreshes the zone map of rewritten files
    cl.delete_clustered(store, predicate=lambda t: t["cloud"].to_numpy() > 99.0)
    kept2, _ = cl.prune_plan(store, None, column_ranges={"cloud": (99.5, None)})
    assert kept2 == []

    # rename maps the range lookup by column id (old files' stats keys
    # keep the write-time physical name)
    cl.evolve_clustered(store, rename={"cloud": "cc"})
    kept3, total3 = cl.prune_plan(store, None, column_ranges={"cc": (90.0, None)})
    assert 0 < len(kept3) < total3
    got3 = cl.read_clustered(store, column_ranges={"cc": (90.0, None)}).to_pandas()
    assert (got3["cc"] >= 90.0).sum() == ((df["cloud"] >= 90.0) & (df["cloud"] <= 99.0)).sum()

    # merge after rename: rewritten files record stats under the LIVE name
    extra = df.head(5).copy().rename(columns={"cloud": "cc"})
    extra["image_id"] = "new-" + extra["image_id"]
    cl.merge_clustered(store, rd.from_pandas(extra), footprints_derived=True)
    recs4 = list(cl.SpatialManifest(store).completed().values())
    assert any(r.get("cs0_cc") is not None for r in recs4)


def test_search_clustered_uses_zone_maps(tmp_path, ray_session):
    """search_clustered derives zone-map file pruning from the CQL2
    filter automatically and returns identical rows to the full scan."""
    import pandas as pd
    import ray.data as rd

    import rustac_ray.sources.clustered as cl
    from rustac_ray.query import QuerySpec, search

    n = 1000
    rng = np.random.default_rng(9)
    x = np.sort(rng.uniform(-120, -70, n))
    df = pd.DataFrame(
        {
            "id": [f"i{i:05d}" for i in range(n)],
            "collection": "c1",
            "cloud": np.linspace(0.0, 100.0, n),
            "bbox": [
                {"xmin": float(a), "ymin": 30.0,
                 "xmax": float(a) + 0.01, "ymax": 30.01}
                for a in x
            ],
        }
    )
    store = str(tmp_path / "zs")
    cl.write_clustered(
        rd.from_pandas(df), store, bbox_col="bbox", rows_per_file=128,
        stats_cols=["cloud"],
    )
    spec = QuerySpec(filter="cloud >= 97")
    got = cl.search_clustered(store, spec).to_pandas()
    flat = df[df["cloud"] >= 97.0]
    assert set(got["id"]) == set(flat["id"])
    # the prune actually dropped files
    from rustac_ray.cql2 import to_column_ranges

    kept, total = cl.prune_plan(
        store, None, column_ranges=to_column_ranges(spec.filter)
    )
    assert 0 < len(kept) < total


def test_cluster_time_xyt_layout(tmp_path, ray_session):
    """cluster_time=True: 3-D (x,y,t) Morton layout — identical rows to
    the 2-D store on every query, but temporal file pruning becomes
    selective (time-near rows share files) and merges route by the
    recorded time range."""
    import pandas as pd
    import ray.data as rd

    import rustac_ray.sources.clustered as cl

    n = 4000
    rng = np.random.default_rng(11)
    x = rng.uniform(-120, -70, n)
    y = rng.uniform(25, 48, n)
    # a year of acquisitions, uniform in time, uncorrelated with space
    t = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.uniform(0, 365, n), unit="D"
    )
    df = pd.DataFrame(
        {
            "image_id": [f"i{i:05d}" for i in range(n)],
            "datetime": t.astype("datetime64[ms]"),
            "fp_xmin": x, "fp_ymin": y,
            "fp_xmax": x + 0.01, "fp_ymax": y + 0.01,
        }
    )
    s2d = str(tmp_path / "xy")
    s3d = str(tmp_path / "xyt")
    cl.write_clustered(
        rd.from_pandas(df), s2d, footprints_derived=True, rows_per_file=128
    )
    cl.write_clustered(
        rd.from_pandas(df), s3d, footprints_derived=True, rows_per_file=128,
        cluster_time=True,
    )

    # identical EXACT results for a spatio-temporal query on both
    # layouts (datetime= prunes files only — documented contract — so
    # the exact interval rule applies after the read, as search() does)
    Q = dict(bbox=(-110.0, 30.0, -95.0, 42.0), datetime="2024-03")

    def _exact(df_):
        m = (df_["datetime"] >= pd.Timestamp("2024-03-01")) & (
            df_["datetime"] <= pd.Timestamp("2024-03-31 23:59:59.999")
        )
        return set(df_[m]["image_id"])

    r2 = cl.read_clustered(s2d, **Q).to_pandas()
    r3 = cl.read_clustered(s3d, **Q).to_pandas()
    ids2, ids3 = _exact(r2), _exact(r3)
    assert ids2 == ids3 and len(ids3) > 0
    # the xyt read is a strict subset of the 2-D read pre-filter (files
    # pruned), never of the exact result
    assert len(r3) < len(r2)

    # temporal pruning: a one-month window keeps a small fraction of the
    # xyt store's files but nearly all of the 2-D store's
    kept2, total2 = cl.prune_plan(s2d, None, datetime="2024-03")
    kept3, total3 = cl.prune_plan(s3d, None, datetime="2024-03")
    assert len(kept2) == total2  # time uncorrelated with space: no prune
    assert len(kept3) < total3 * 0.5

    # merge routes through the recorded (t0, t1): post-merge reads exact
    extra = df.head(50).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    cl.merge_clustered(s3d, rd.from_pandas(extra), footprints_derived=True)
    got = _exact(cl.read_clustered(s3d, **Q).to_pandas())
    want_new = extra[
        (extra["fp_xmin"] <= Q["bbox"][2]) & (extra["fp_xmax"] >= Q["bbox"][0])
        & (extra["fp_ymin"] <= Q["bbox"][3]) & (extra["fp_ymax"] >= Q["bbox"][1])
        & (extra["datetime"] >= pd.Timestamp("2024-03-01"))
        & (extra["datetime"] <= pd.Timestamp("2024-03-31 23:59:59.999"))
    ]
    assert got == ids3 | set(want_new["image_id"])

    # knn certificate holds on the xyt layout too
    r = cl.knn_clustered(s3d, {"q": (-100.0, 35.0)}, 5)
    cx = (df["fp_xmin"] + df["fp_xmax"]) / 2
    cy = (df["fp_ymin"] + df["fp_ymax"]) / 2
    d2 = (cx + 100.0) ** 2 + (cy - 35.0) ** 2
    want = set(df.loc[d2.nsmallest(5).index, "image_id"])
    assert set(r["image_id"]) == want


def test_count_with_column_ranges(tmp_path, ray_session):
    """Metadata-first COUNT with zone maps: contained files count from
    the manifest (zero IO), straddling files scan, excluded files never
    open; nulls never match; evolve-added columns count by default."""
    import pandas as pd
    import ray.data as rd

    import rustac_ray.sources.clustered as cl

    n = 1200
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(-120, -70, n))
    cloud = np.linspace(0.0, 100.0, n)
    cloud_n = cloud.copy()
    # nulls only in the high-cloud tail, so mid-range files keep csn==0
    # and the metadata-only containment path is exercised
    null_idx = rng.choice(np.nonzero(cloud > 80.0)[0], 60, replace=False)
    df = pd.DataFrame(
        {
            "image_id": [f"i{i:05d}" for i in range(n)],
            "cloud": cloud_n,
            "fp_xmin": x, "fp_ymin": np.full(n, 30.0),
            "fp_xmax": x + 0.01, "fp_ymax": np.full(n, 30.01),
        }
    )
    df.loc[null_idx, "cloud"] = np.nan
    store = str(tmp_path / "cnt")
    cl.write_clustered(
        rd.from_pandas(df), store, footprints_derived=True,
        rows_per_file=128, stats_cols=["cloud"],
    )
    got, nfull, npart = cl.count_clustered(
        store, column_ranges={"cloud": (20.0, 60.0)}, detail=True
    )
    want = int(((df["cloud"] >= 20.0) & (df["cloud"] <= 60.0)).sum())
    assert got == want
    assert nfull >= 1 and npart >= 1  # both metadata and scan paths hit

    # bbox AND range compose
    got2 = cl.count_clustered(
        store, bbox=(-110.0, 29.0, -90.0, 31.0),
        column_ranges={"cloud": (20.0, 60.0)},
    )
    inb = (df["fp_xmin"] <= -90.0) & (df["fp_xmax"] >= -110.0)
    want2 = int((inb & (df["cloud"] >= 20.0) & (df["cloud"] <= 60.0)).sum())
    assert got2 == want2

    # evolve-added column counts by its recorded default
    cl.evolve_clustered(store, add={"grade": 3.0})
    assert cl.count_clustered(store, column_ranges={"grade": (1.0, 5.0)}) == n
    assert cl.count_clustered(store, column_ranges={"grade": (4.0, None)}) == 0


def test_stat_and_explain(tmp_path, ray_session):
    import pandas as pd
    import ray.data as rd

    import rustac_ray.sources.clustered as cl

    n = 800
    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(-120, -70, n))
    df = pd.DataFrame(
        {
            "image_id": [f"i{i:04d}" for i in range(n)],
            "cloud": np.linspace(5.0, 95.0, n),
            "fp_xmin": x, "fp_ymin": np.full(n, 40.0),
            "fp_xmax": x + 0.01, "fp_ymax": np.full(n, 40.01),
        }
    )
    df.loc[3, "cloud"] = np.nan
    store = str(tmp_path / "st")
    cl.write_clustered(
        rd.from_pandas(df), store, footprints_derived=True,
        rows_per_file=128, stats_cols=["cloud"],
    )
    s = cl.stat_clustered(store, "cloud")
    assert s["nulls"] == 1
    real = df["cloud"].dropna()
    assert s["min"] == real.min() and s["max"] == real.max()
    assert cl.stat_clustered(store, "cloud", "max") == real.max()
    with pytest.raises(ValueError, match="zone map"):
        cl.stat_clustered(store, "image_id")

    # cloud correlates with sorted x, so the ≥90 tail lives at high x —
    # use a bbox overlapping that region so the combined plan is nonempty
    ex = cl.explain_clustered(
        store, bbox=(-76.0, 39.0, -70.0, 41.0),
        column_ranges={"cloud": (90.0, None)},
    )
    assert ex["files_total"] > ex["kept_spatial"] > 0
    assert ex["kept_zonemap"] < ex["files_total"]
    assert ex["kept_combined"] <= min(ex["kept_spatial"], ex["kept_zonemap"])
    assert 0.0 < ex["selectivity"] < 1.0

    # rename keeps both working (id-mapped)
    cl.evolve_clustered(store, rename={"cloud": "cc"})
    assert cl.stat_clustered(store, "cc", "min") == real.min()


def test_cluster_attrs_zorder_selectivity(ray_session, tmp_path):
    """r4 VERDICT #5: generic attribute z-order — cluster by an
    arbitrary (string, numeric) pair; a conjunctive predicate keeps a
    file count tracking the PRODUCT of the per-attribute selectivities,
    and each single-attribute prune alone keeps more files."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rustac_ray.sources.clustered import (
        merge_clustered, prune_plan, read_clustered, write_clustered,
    )

    rng = np.random.default_rng(11)
    n = 4096
    df = pd.DataFrame(
        {
            "image_id": [f"i{k:05d}" for k in range(n)],
            "grp": rng.choice([f"g{j}" for j in range(8)], n),
            "v": rng.integers(0, 64, n).astype(np.int64),
            "fp_xmin": rng.uniform(-120, -70, n),
            "fp_ymin": rng.uniform(25, 48, n),
        }
    )
    df["fp_xmax"] = df["fp_xmin"] + 0.05
    df["fp_ymax"] = df["fp_ymin"] + 0.05
    store = str(tmp_path / "attrstore")
    write_clustered(
        rd.from_pandas(df), store, footprints_derived=True,
        rows_per_file=64, cluster_attrs=["grp", "v"],
    )
    ranges = {"grp": ("g2", "g2"), "v": (16, 31)}
    kept, total = prune_plan(store, None, column_ranges=ranges)
    ka, _ = prune_plan(store, None, column_ranges={"grp": ranges["grp"]})
    kb, _ = prune_plan(store, None, column_ranges={"v": ranges["v"]})
    assert total >= 48
    sel = (1 / 8) * (16 / 64)  # product of predicate selectivities
    frac = len(kept) / total
    # layout makes combined pruning multiplicative (allow quantization
    # slack) and strictly better than either single-attribute prune
    assert frac <= 4 * sel
    assert len(kept) < len(ka) and len(kept) < len(kb)

    # exactness through the pruned read + row filter
    got = read_clustered(store, column_ranges=ranges).to_pandas()
    got = got[(got["grp"] == "g2") & (got["v"] >= 16) & (got["v"] <= 31)]
    ctl = df[(df["grp"] == "g2") & (df["v"] >= 16) & (df["v"] <= 31)]
    assert sorted(got["image_id"]) == sorted(ctl["image_id"])

    # merges route by the recorded attribute axes (same dictionary /
    # bounds), and an unseen dictionary value still lands safely
    extra = df.head(40).copy()
    extra["image_id"] = "new-" + extra["image_id"]
    extra.loc[extra.index[:5], "grp"] = "g-new"
    merge_clustered(store, rd.from_pandas(extra), footprints_derived=True)
    assert read_clustered(store).count() == n + 40
    got2 = read_clustered(
        store, column_ranges={"grp": ("g-new", "g-new")}
    ).to_pandas()
    got2 = got2[got2["grp"] == "g-new"]
    assert len(got2) == 5
