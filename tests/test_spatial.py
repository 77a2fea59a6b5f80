"""Spatial pipelines vs brute-force numpy oracles (sf0.001 fixtures)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from rustac_ray.geo import affine, tiles
from rustac_ray.geo.pip import PreparedGeometry
from rustac_ray.stages import knn, spatial_join, tiling
from rustac_ray.stages.footprint import derive_footprints


@pytest.fixture(scope="module")
def corpus(fixtures_dir):
    imgs = pq.read_table(f"{fixtures_dir}/images.parquet")
    t = np.array(imgs["transform"].to_pylist())
    corners = affine.footprint_corners(imgs["w"].to_numpy(), imgs["h"].to_numpy(), t)
    ids = np.array(imgs["image_id"].to_pylist())
    return imgs, corners, ids


@pytest.fixture(scope="module")
def expected_pairs(fixtures_dir, corpus):
    _, corners, ids = corpus
    qt = pq.read_table(f"{fixtures_dir}/query_geoms.parquet")
    expected = set()
    for qid, g in zip(qt["query_id"].to_pylist(), qt["geometry"].to_pylist()):
        pg = PreparedGeometry(g)
        for i in np.nonzero(pg.intersects_quads(corners))[0]:
            expected.add((ids[i], qid))
    return expected


def _images_ds(fixtures_dir):
    return rd.read_parquet(f"{fixtures_dir}/images.parquet",
                           columns=["image_id", "w", "h", "transform"])


def test_broadcast_join_matches_bruteforce(fixtures_dir, expected_pairs):
    qt = pq.read_table(f"{fixtures_dir}/query_geoms.parquet")
    res = spatial_join.broadcast_spatial_join(
        _images_ds(fixtures_dir), qt, concurrency=2
    ).to_pandas()
    got = set(zip(res["image_id"], res["query_id"]))
    assert got == expected_pairs
    assert len(res) == len(got)  # no duplicate pairs


def test_partitioned_join_matches_bruteforce(fixtures_dir, expected_pairs):
    qds = rd.read_parquet(f"{fixtures_dir}/query_geoms.parquet")
    res = spatial_join.partitioned_spatial_join(
        _images_ds(fixtures_dir), qds
    ).to_pandas()
    got = set(zip(res["image_id"], res["query_id"]))
    assert got == expected_pairs
    assert len(res) == len(got)


def test_hash_join_matches_bruteforce(fixtures_dir, expected_pairs):
    qds = rd.read_parquet(f"{fixtures_dir}/query_geoms.parquet")
    res = spatial_join.hash_spatial_join(
        _images_ds(fixtures_dir), qds, num_partitions=4
    ).to_pandas()
    got = set(zip(res["image_id"], res["query_id"]))
    assert got == expected_pairs
    assert len(res) == len(got)


def test_tile_assignment_matches_bruteforce(fixtures_dir, corpus):
    _, corners, ids = corpus
    xmin, ymin, xmax, ymax = affine.corners_bbox(corners)
    ri, keys = tiles.cover_bbox_tiles(xmin, ymin, xmax, ymax, 8)
    expected = set(zip(ids[ri], keys.tolist()))
    asn = tiling.assign_tiles(_images_ds(fixtures_dir), z=8).to_pandas()
    got = set(zip(asn["image_id"], asn["tile_key"]))
    assert got == expected


def test_tile_refinement_bounds_group_size(fixtures_dir):
    ds = _images_ds(fixtures_dir)
    # sf0.001: ~50 hot-box rows land in one z=8 tile; threshold 30 → refined
    asn = tiling.assign_tiles(ds, z=8, refine_threshold=30, refine_levels=1)
    counts = tiling.tile_counts(asn).to_pandas()
    # every z=8 tile left unrefined holds <= threshold rows; hot ones moved to z=9
    z, _, _ = tiles.tile_unkey(counts["tile_key"].to_numpy())
    assert (z >= 8).all() and (z <= 9).all()
    assert (z == 9).any()  # the hot box actually triggered refinement
    base = counts[z == 8]
    assert base["n_scenes"].max() <= 30


def test_tile_refinement_no_duplicates_and_exact(fixtures_dir, corpus):
    """ADVICE r01 (high): a footprint overlapping N hot tiles must emit each
    refined child exactly once, under its own parent. Verify no duplicate
    (image_id, tile_key) rows and exact equality with a brute-force
    per-parent refinement."""
    _, corners, ids = corpus
    ds = _images_ds(fixtures_dir)
    asn = tiling.assign_tiles(ds, z=8, refine_threshold=30, refine_levels=1).to_pandas()
    assert not asn.duplicated(["image_id", "tile_key"]).any()

    # brute-force: base cover; rows in hot tiles → children of that hot tile
    xmin, ymin, xmax, ymax = affine.corners_bbox(corners)
    ri, keys = tiles.cover_bbox_tiles(xmin, ymin, xmax, ymax, 8)
    import collections

    counts = collections.Counter(keys.tolist())
    hot = {k for k, c in counts.items() if c > 30}
    expected = set()
    for r, k in zip(ri.tolist(), keys.tolist()):
        if k not in hot:
            expected.add((ids[r], k))
            continue
        sri, skeys = tiles.cover_bbox_tiles(
            xmin[r : r + 1], ymin[r : r + 1], xmax[r : r + 1], ymax[r : r + 1], 9
        )
        for sk in skeys.tolist():
            sz, sx, sy = tiles.tile_unkey(np.array([sk]))
            parent = int(tiles.tile_key(sz - 1, sx >> 1, sy >> 1)[0])
            if parent == k:
                expected.add((ids[r], sk))
    got = set(zip(asn["image_id"], asn["tile_key"]))
    assert got == expected


def test_knn_matches_bruteforce(fixtures_dir, corpus):
    _, corners, ids = corpus
    cx = (corners[:, :, 0].min(1) + corners[:, :, 0].max(1)) / 2
    cy = (corners[:, :, 1].min(1) + corners[:, :, 1].max(1)) / 2
    probes = {"p0": (-100.0, 35.0), "p1": (-110.0, 45.0), "p2": (-61.0, 21.0)}
    res = knn.knn_join(_images_ds(fixtures_dir), probes, k=7, concurrency=2).to_pandas()
    for qid, (px, py) in probes.items():
        d = np.hypot(cx - px, cy - py)
        expected = set(ids[np.argsort(d, kind="stable")[:7]])
        got = set(res[res["query_id"] == qid]["image_id"])
        assert got == expected, qid


def test_knn_haversine_matches_bruteforce(fixtures_dir, corpus):
    import math

    _, corners, ids = corpus
    cx = (corners[:, :, 0].min(1) + corners[:, :, 0].max(1)) / 2
    cy = (corners[:, :, 1].min(1) + corners[:, :, 1].max(1)) / 2
    probes = {"p0": (-100.0, 35.0), "p1": (-61.0, 21.0)}
    res = knn.knn_join(
        _images_ds(fixtures_dir), probes, k=7, concurrency=2, metric="haversine"
    ).to_pandas()
    R = 6371.0088
    for qid, (px, py) in probes.items():
        d = np.array(
            [
                2.0
                * R
                * math.asin(
                    math.sqrt(
                        math.sin(math.radians(y - py) / 2) ** 2
                        + math.cos(math.radians(py))
                        * math.cos(math.radians(y))
                        * math.sin(math.radians(x - px) / 2) ** 2
                    )
                )
                for x, y in zip(cx, cy)
            ]
        )
        expected = set(ids[np.argsort(d, kind="stable")[:7]])
        sub = res[res["query_id"] == qid].sort_values("dist")
        assert set(sub["image_id"]) == expected, qid
        # emitted dist is great-circle km of the selected winner
        want = np.sort(d)[:7]
        assert np.allclose(np.sort(sub["dist"].to_numpy()), want, rtol=1e-9)


def test_cell_knn_index_matches_bruteforce(corpus):
    _, corners, ids = corpus
    cx = (corners[:, :, 0].min(1) + corners[:, :, 0].max(1)) / 2
    cy = (corners[:, :, 1].min(1) + corners[:, :, 1].max(1)) / 2
    idx = knn.CellKNNIndex(ids, cx, cy, res=6)
    for px, py, k in [(-100.0, 35.0, 5), (-90.0, 25.0, 12), (-119.9, 49.9, 3)]:
        got_ids, got_d = idx.query(px, py, k)
        d = np.hypot(cx - px, cy - py)
        expected = ids[np.argsort(d, kind="stable")[:k]]
        assert list(got_ids) == list(expected)


def test_sharded_knn_index(fixtures_dir, corpus):
    _, corners, ids = corpus
    cx = (corners[:, :, 0].min(1) + corners[:, :, 0].max(1)) / 2
    cy = (corners[:, :, 1].min(1) + corners[:, :, 1].max(1)) / 2
    idx = knn.ShardedKNNIndex(_images_ds(fixtures_dir), num_shards=3)
    for px, py, k in [(-100.0, 35.0, 5), (-118.0, 48.0, 9)]:
        got_ids, got_d = idx.query(px, py, k)
        d = np.hypot(cx - px, cy - py)
        expected = ids[np.argsort(d, kind="stable")[:k]]
        assert list(got_ids) == list(expected)


def test_join_result_deterministic(fixtures_dir):
    qt = pq.read_table(f"{fixtures_dir}/query_geoms.parquet")
    a = spatial_join.broadcast_spatial_join(
        _images_ds(fixtures_dir), qt, concurrency=2
    ).to_pandas()
    b = spatial_join.broadcast_spatial_join(
        _images_ds(fixtures_dir), qt, concurrency=2, batch_size=1024
    ).to_pandas()
    key = lambda df: sorted(zip(df["image_id"], df["query_id"]))
    assert key(a) == key(b)


def test_partitioned_join_hot_cell_refinement(fixtures_dir, expected_pairs):
    """Refined (skew-split) join must produce the identical pair set."""
    qds = rd.read_parquet(f"{fixtures_dir}/query_geoms.parquet")
    res = spatial_join.partitioned_spatial_join(
        _images_ds(fixtures_dir), qds, refine_threshold=20
    ).to_pandas()
    got = set(zip(res["image_id"], res["query_id"]))
    assert got == expected_pairs
    assert len(res) == len(got)
    # and the hot pre-pass actually fires at this threshold (hot box ~5%)
    from rustac_ray.stages.footprint import derive_footprints

    ds = _images_ds(fixtures_dir).map_batches(derive_footprints, batch_format="pyarrow")
    hot = spatial_join.hot_cell_set(ds, spatial_join.DEFAULT_JOIN_RES, 20)
    assert len(hot) > 0


def test_write_tile_pyramid_zorder_and_resume(ray_session, tmp_path):
    """The pyramid writer emits Morton-sorted, spatially-coherent partition
    files with a lineage manifest, and a rerun skips completed partitions."""
    import json

    from rustac_ray.geo import tiles as t
    from rustac_ray.pipelines.flagship import write_tile_pyramid

    out = str(tmp_path / "pyramid")
    recs = write_tile_pyramid("/root/testdata/sf0.001", out, refine_threshold=None)
    assert recs and all("digest" in r for r in recs)
    files = sorted(p for p in os.listdir(out) if p.endswith(".parquet"))
    assert files
    # global Morton order across partition files
    prev_max = None
    total = 0
    for f in files:
        keys = pq.read_table(f"{out}/{f}")["tile_key"].to_numpy()
        assert (np.diff(keys) >= 0).all()
        if prev_max is not None and len(keys):
            assert keys[0] >= prev_max
        if len(keys):
            prev_max = keys[-1]
        total += len(keys)
    # spatial coherence: within one file, decoded x/y span a bounded range
    z, x, y = t.tile_unkey(pq.read_table(f"{out}/{files[0]}")["tile_key"].to_numpy())
    assert len(files) == 1 or (x.max() - x.min() <= 256 and y.max() - y.min() <= 256)
    # resume: manifest says all partitions done -> rerun writes nothing new
    recs2 = write_tile_pyramid("/root/testdata/sf0.001", out, refine_threshold=None)
    assert {r["partition_id"] for r in recs2} == {r["partition_id"] for r in recs}
    with open(f"{out}/_manifest.jsonl") as fh:
        lines = [json.loads(line) for line in fh if line.strip()]
    assert len(lines) == len(recs)  # no re-written partitions appended


def test_broadcast_join_counts_match_pairs(fixtures_dir):
    """emit='counts' equals the pairs output aggregated, zeros included."""
    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    from rustac_ray.pipelines.flagship import read_images_metadata
    from rustac_ray.stages.spatial_join import broadcast_spatial_join

    geoms = pq.read_table(f"{fixtures_dir}/query_geoms.parquet")
    boxes = geoms.filter(pc.equal(geoms["kind"], "box"))
    imgs = read_images_metadata("/root/testdata/sf0.001")
    pairs = broadcast_spatial_join(imgs, boxes, concurrency=2).to_pandas()
    counts = broadcast_spatial_join(
        imgs, boxes, concurrency=2, emit="counts"
    ).to_pandas()
    assert len(counts) == imgs.count()  # every image exactly once
    agg = pairs.groupby("image_id").size()
    merged = counts.set_index("image_id")["n_matches"]
    assert (merged.loc[agg.index] == agg).all()
    assert (merged.drop(agg.index) == 0).all()
    assert merged.sum() == len(pairs)


def test_dwithin_join_brute_force(fixtures_dir):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from rustac_ray.pipelines.flagship import read_images_metadata
    from rustac_ray.stages.spatial_join import within_distance_join
    from rustac_ray.stages.footprint import derive_footprints

    pts = pq.read_table(f"{fixtures_dir}/query_points.parquet")
    imgs = read_images_metadata("/root/testdata/sf0.001")
    got = within_distance_join(imgs, pts, d=0.7, concurrency=2).to_pandas()
    # brute force on the driver
    meta = imgs.map_batches(derive_footprints, batch_format="pyarrow").to_pandas()
    px, py = pts["x"].to_numpy(), pts["y"].to_numpy()
    exp = set()
    for q in range(len(pts)):
        dx = np.maximum(
            np.maximum(meta["fp_xmin"] - px[q], px[q] - meta["fp_xmax"]), 0.0
        )
        dy = np.maximum(
            np.maximum(meta["fp_ymin"] - py[q], py[q] - meta["fp_ymax"]), 0.0
        )
        hit = dx * dx + dy * dy <= 0.49
        for iid in meta.loc[hit, "image_id"]:
            exp.add((pts["query_id"][q].as_py(), iid))
    assert set(zip(got["query_id"], got["image_id"])) == exp
    assert (got["dist2"] <= 0.49).all()


def test_dwithin_geodesic_brute_force(fixtures_dir):
    """Haversine dwithin vs an unfiltered brute-force clamp+haversine on
    the driver — verifies the conservative lat/lon prefilter drops no
    true hits and the exact phase admits no false ones."""
    import numpy as np
    import pyarrow.parquet as pq

    from rustac_ray.pipelines.flagship import read_images_metadata
    from rustac_ray.stages.footprint import derive_footprints
    from rustac_ray.stages.spatial_join import within_distance_join

    R = 6371.0088
    d = 120.0  # km
    pts = pq.read_table(f"{fixtures_dir}/query_points.parquet")
    imgs = read_images_metadata("/root/testdata/sf0.001")
    got = within_distance_join(
        imgs, pts, d=d, concurrency=2, metric="haversine"
    ).to_pandas()
    assert list(got.columns) == ["query_id", "image_id"]
    meta = imgs.map_batches(derive_footprints, batch_format="pyarrow").to_pandas()
    px, py = pts["x"].to_numpy(), pts["y"].to_numpy()
    hmax = np.sin(d / (2 * R)) ** 2
    exp = set()
    for q in range(len(pts)):
        cx = np.minimum(np.maximum(px[q], meta["fp_xmin"]), meta["fp_xmax"])
        cy = np.minimum(np.maximum(py[q], meta["fp_ymin"]), meta["fp_ymax"])
        sdlat = np.sin((np.radians(cy) - np.radians(py[q])) * 0.5)
        sdlon = np.sin((np.radians(cx) - np.radians(px[q])) * 0.5)
        h = sdlat**2 + np.cos(np.radians(py[q])) * np.cos(np.radians(cy)) * sdlon**2
        for iid in meta.loc[(h <= hmax).to_numpy(), "image_id"]:
            exp.add((pts["query_id"][q].as_py(), iid))
    assert set(zip(got["query_id"], got["image_id"])) == exp
    assert len(exp) > 0


def test_dwithin_geodesic_high_latitude_prefilter():
    """At 80°N a 60 km radius spans ~3.1° of longitude — a naive planar
    prefilter of d/111 degrees would miss hits. The conservative band
    expansion must keep them; containment always hits at distance 0."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rustac_ray.stages.spatial_join import within_distance_join

    # rect at lat 80, lon [10, 11]; point due east at lon 13.5 — planar
    # 0.54° offset is ~60.4 km at the equator but only ~10.5 km here
    imgs = rd.from_arrow(
        pa.table(
            {
                "image_id": ["east", "contains"],
                "fp_xmin": [10.0, 13.0],
                "fp_ymin": [79.9, 79.9],
                "fp_xmax": [11.0, 14.0],
                "fp_ymax": [80.1, 80.1],
            }
        )
    )
    pts = pa.table({"query_id": ["p0"], "x": [13.5], "y": [80.0]})
    got = within_distance_join(
        imgs, pts, d=60.0, concurrency=1, metric="haversine",
        footprints_derived=True,
    ).to_pandas()
    assert set(got["image_id"]) == {"east", "contains"}


def test_knn_combine_paths_agree(fixtures_dir):
    import pandas as pd
    import pyarrow.parquet as pq

    from rustac_ray.pipelines.flagship import read_images_metadata
    from rustac_ray.stages.knn import knn_join

    pts = pq.read_table(f"{fixtures_dir}/query_points.parquet")
    probes = {
        q: (x, y)
        for q, x, y in zip(
            pts["query_id"].to_pylist(), pts["x"].to_pylist(), pts["y"].to_pylist()
        )
    }
    imgs = read_images_metadata("/root/testdata/sf0.001")
    a = knn_join(imgs, probes, k=5, concurrency=2).to_pandas()
    b = knn_join(imgs, probes, k=5, concurrency=2, combine="shuffle").to_pandas()
    key = ["query_id", "image_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_clip_area_join_matches_bruteforce(fixtures_dir, corpus):
    import pandas as pd
    import pyarrow.parquet as _pq

    from rustac_ray.geo import affine
    from rustac_ray.stages.spatial_join import clip_area_join

    _, corners, ids = corpus
    xmin, ymin, xmax, ymax = affine.corners_bbox(corners)
    boxes = _pq.read_table(f"{fixtures_dir}/query_boxes.parquet")
    res = (
        clip_area_join(_images_ds(fixtures_dir), boxes, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "image_id"])
        .reset_index(drop=True)
    )
    expected = []
    bd = boxes.to_pydict()
    for q in range(len(bd["query_id"])):
        w = np.minimum(bd["xmax"][q], xmax) - np.maximum(bd["xmin"][q], xmin)
        h = np.minimum(bd["ymax"][q], ymax) - np.maximum(bd["ymin"][q], ymin)
        hit = (w > 0) & (h > 0)
        for r in np.flatnonzero(hit):
            expected.append((bd["query_id"][q], ids[r], w[r] * h[r]))
    exp = (
        pd.DataFrame(expected, columns=["query_id", "image_id", "clip_area"])
        .sort_values(["query_id", "image_id"])
        .reset_index(drop=True)
    )
    assert len(res) > 0
    pd.testing.assert_frame_equal(res, exp)
    # clip is never larger than either operand's own area
    img_area = dict(zip(ids, (xmax - xmin) * (ymax - ymin)))
    assert all(
        a <= img_area[i] + 1e-12 for i, a in zip(res["image_id"], res["clip_area"])
    )


def test_coverage_area_union_properties(fixtures_dir):
    """Union ≤ sum of parts; equals the naive sweep oracle exactly; a
    planted fully-overlapping pair unions to a single box's area."""
    import pandas as pd

    from rustac_ray import synth
    from rustac_ray.oracles import _expected_coverage
    from rustac_ray.stages.aggregates import coverage_area

    got = (
        coverage_area(_images_ds_with_collection(fixtures_dir))
        .to_pandas()
        .sort_values("collection")
        .reset_index(drop=True)
    )
    exp = (
        _expected_coverage(str(fixtures_dir))
        .to_pandas()
        .sort_values("collection")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert (got["union_cells"] <= got["sum_box_cells"]).all()
    assert (got["union_cells"] > 0).all()


def _images_ds_with_collection(fixtures_dir):
    return rd.read_parquet(
        f"{fixtures_dir}/images.parquet",
        columns=["image_id", "w", "h", "transform", "collection"],
    )


def test_coverage_area_identical_boxes():
    """Two identical boxes: union == one box, sum == two boxes."""
    import pandas as pd
    import pyarrow as pa

    from rustac_ray.stages.aggregates import coverage_area

    t = [0.001, 0.0, 10.0, 0.0, -0.001, 20.0]
    df = pd.DataFrame(
        {
            "image_id": ["a", "b"],
            "w": np.array([100, 100], np.int32),
            "h": np.array([50, 50], np.int32),
            "transform": [t, t],
            "collection": ["c", "c"],
        }
    )
    out = coverage_area(rd.from_pandas(df)).to_pandas()
    assert out["union_cells"].iloc[0] * 2 == out["sum_box_cells"].iloc[0]
    # 100*0.001 deg wide × 50*0.001 deg tall = 100000 × 50000 µdeg cells
    assert out["union_cells"].iloc[0] == 100_000 * 50_000


def test_latest_scene_join_matches_bruteforce(fixtures_dir, corpus):
    import pandas as pd
    import pyarrow as pa

    from rustac_ray.geo import affine
    from rustac_ray.stages.spatial_join import latest_scene_join

    imgs, corners, ids = corpus
    xmin, ymin, xmax, ymax = affine.corners_bbox(corners)
    dt = imgs["datetime"].to_numpy().astype("datetime64[ms]").astype(np.int64)
    # probes = centers of every 293rd image, ts staggered by suffix
    suffix = np.array([int(s[4:]) for s in ids], np.int64)
    sel = suffix % 293 == 0
    qx = (xmin[sel] + xmax[sel]) * 0.5
    qy = (ymin[sel] + ymax[sel]) * 0.5
    base = np.datetime64("2024-01-01", "ms").astype(np.int64)
    ts = base + ((suffix[sel] // 293) % 9 + 1) * 37 * 86_400_000
    qids = ids[sel]
    probes = pa.table(
        {"query_id": pa.array(qids, pa.string()),
         "x": pa.array(qx), "y": pa.array(qy),
         "ts": pa.array(ts, pa.int64())}
    )
    got = (
        # concurrency=1 (not 2): three separate sessions hung HERE with
        # ReadParquet starved at 0% while _LatestScenePartial actors sat
        # idle — at the 4-CPU test session, this pool plus a prior
        # test's not-yet-reaped pool can hold every CPU, and the read
        # stage deadlocks. One actor leaves headroom regardless of
        # reaping timing.
        latest_scene_join(_images_ds_with_dt(fixtures_dir), probes, concurrency=1)
        .to_pandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    rows = []
    for q, x, y, t in zip(qids, qx, qy, ts):
        hit = (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax) & (dt <= t)
        if not hit.any():
            continue
        cand = sorted(zip(-dt[hit], ids[hit]))  # max dt, then min id
        rows.append((q, cand[0][1], np.int64(-cand[0][0])))
    exp = (
        pd.DataFrame(rows, columns=["query_id", "image_id", "scene_ms"])
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) > 0
    assert got["image_id"].tolist() == exp["image_id"].tolist()
    assert (
        got["scene_datetime"].to_numpy().astype("datetime64[ms]").astype(np.int64)
        == exp["scene_ms"].to_numpy()
    ).all()


def _images_ds_with_dt(fixtures_dir):
    return rd.read_parquet(
        f"{fixtures_dir}/images.parquet",
        columns=["image_id", "w", "h", "transform", "datetime"],
    )


def test_nearest_neighbor_join_matches_bruteforce(fixtures_dir, corpus):
    import pandas as pd

    from rustac_ray.stages.knn import nearest_neighbor_join

    _, corners, ids = corpus
    cx = (corners[:, :, 0].min(1) + corners[:, :, 0].max(1)) / 2
    cy = (corners[:, :, 1].min(1) + corners[:, :, 1].max(1)) / 2
    got = (
        nearest_neighbor_join(_images_ds(fixtures_dir), res=7, concurrency=2)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(ids)
    order = np.argsort(ids, kind="mergesort")
    sx, sy, sid = cx[order], cy[order], ids[order]
    exp_nn, exp_d2 = [], []
    for j in range(len(sid)):
        d2 = (sx - sx[j]) ** 2 + (sy - sy[j]) ** 2
        d2[j] = np.inf
        b = int(np.argmin(d2))  # first min on id-sorted order = min id tie
        exp_nn.append(sid[b])
        exp_d2.append(d2[b])
    exp = pd.DataFrame(
        {"image_id": sid, "nn_id": exp_nn, "dist2": exp_d2}
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_nearest_neighbor_join_sparse_fallback():
    """Three isolated points far apart: every row is unresolved in-cell
    and must be fixed by the exact fallback."""
    import pandas as pd
    import ray.data as rd

    from rustac_ray.stages.knn import nearest_neighbor_join

    t = lambda x0, y0: [0.001, 0.0, x0, 0.0, -0.001, y0]
    df = pd.DataFrame(
        {
            "image_id": ["a", "b", "c"],
            "w": np.array([10, 10, 10], "int32"),
            "h": np.array([10, 10, 10], "int32"),
            "transform": [t(-100.0, 40.0), t(-60.0, 10.0), t(60.0, -30.0)],
        }
    )
    out = (
        nearest_neighbor_join(rd.from_pandas(df), res=6, concurrency=1)
        .to_pandas()
        .set_index("image_id")
    )
    assert out.loc["a", "nn_id"] == "b"
    assert out.loc["b", "nn_id"] == "a"
    assert out.loc["c", "nn_id"] == "b"


def test_nearest_neighbor_hot_cell_matches_bruteforce():
    """A dense cluster far beyond the HOT threshold: the local-regrid
    path must agree with brute force exactly (incl. id tie-breaks)."""
    import pandas as pd

    from rustac_ray.stages.knn import nearest_neighbor_join

    rng = np.random.default_rng(3)
    n = 6000  # all in ONE res-6 cell -> hot path
    cx = rng.uniform(-100.2, -100.0, n)
    cy = rng.uniform(40.0, 40.2, n)
    resdeg = 0.0001
    df = pd.DataFrame(
        {
            "image_id": [f"h{i:05d}" for i in range(n)],
            "w": np.full(n, 2, "int32"),
            "h": np.full(n, 2, "int32"),
            "transform": [
                [resdeg, 0.0, cx[i] - resdeg, 0.0, -resdeg, cy[i] + resdeg]
                for i in range(n)
            ],
        }
    )
    got = (
        nearest_neighbor_join(rd.from_pandas(df), res=6, concurrency=2)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    # brute force on the true centers
    ids = df["image_id"].to_numpy()
    for probe in rng.choice(n, 40, replace=False):
        d2 = (cx - cx[probe]) ** 2 + (cy - cy[probe]) ** 2
        d2[probe] = np.inf
        b = int(np.argmin(d2))
        row = got.loc[got["image_id"] == ids[probe]].iloc[0]
        assert row["nn_id"] == ids[b], (probe, row["nn_id"], ids[b])
        assert abs(row["dist2"] - d2[b]) < 1e-15


def test_join_strategies_handle_empty_blocks(fixtures_dir, expected_pairs):
    """All three strategies must survive 0-row input blocks (the r02
    verdict found a NameError in hash_spatial_join's empty path). The
    repartition plants empty blocks; a single tiny query also leaves most
    hash partitions empty."""
    import pyarrow.parquet as _pq

    qt = _pq.read_table(f"{fixtures_dir}/query_geoms.parquet")
    imgs = _images_ds(fixtures_dir).repartition(40)  # > row groups -> empties
    qds = rd.read_parquet(f"{fixtures_dir}/query_geoms.parquet").repartition(16)

    got_b = spatial_join.broadcast_spatial_join(imgs, qt, concurrency=2).to_pandas()
    assert set(zip(got_b["image_id"], got_b["query_id"])) == expected_pairs

    got_p = spatial_join.partitioned_spatial_join(imgs, qds).to_pandas()
    assert set(zip(got_p["image_id"], got_p["query_id"])) == expected_pairs

    got_h = spatial_join.hash_spatial_join(imgs, qds, num_partitions=16).to_pandas()
    assert set(zip(got_h["image_id"], got_h["query_id"])) == expected_pairs

    # a lone far-away query: every hash partition's exact phase sees only
    # empty or non-matching batches and must emit the empty pair schema
    import pyarrow as pa

    from rustac_ray.geo.wkb import encode_geometry

    lone = pa.table(
        {
            "query_id": pa.array(["nowhere"], pa.string()),
            "geometry": pa.array(
                [encode_geometry({
                    "type": "Polygon",
                    "coordinates": [[(179.0, 89.0), (179.2, 89.0), (179.2, 89.2),
                                     (179.0, 89.2), (179.0, 89.0)]],
                })],
                pa.binary(),
            ),
        }
    )
    got_none = spatial_join.hash_spatial_join(
        imgs, rd.from_arrow(lone), num_partitions=8
    )
    # schema asserted at the Dataset level: Ray's to_pandas drops columns
    # for ANY 0-row dataset, so the pandas frame can't carry it
    assert got_none.schema().names == ["image_id", "query_id"]
    assert got_none.count() == 0


def test_resolve_tail_broadcast_matches_bruteforce(fixtures_dir, corpus):
    """The unresolved-tail resolver: exact NN per probe without gathering
    the corpus (only per-block partials reach the driver), id tie-breaks
    identical to the cell kernel."""
    from rustac_ray.stages.knn import _resolve_tail_broadcast

    _, corners, ids = corpus
    cx = (corners[:, :, 0].min(1) + corners[:, :, 0].max(1)) / 2
    cy = (corners[:, :, 1].min(1) + corners[:, :, 1].max(1)) / 2
    rng = np.random.default_rng(11)
    probes = rng.choice(len(ids), 25, replace=False)
    got = _resolve_tail_broadcast(
        _images_ds(fixtures_dir).repartition(8),
        ids[probes], cx[probes], cy[probes],
        chunk=10,  # force multi-chunk merging
    ).set_index("image_id")
    order = np.argsort(ids, kind="mergesort")
    sx, sy, sid = cx[order], cy[order], ids[order]
    for p in probes:
        d2 = (sx - cx[p]) ** 2 + (sy - cy[p]) ** 2
        d2[sid == ids[p]] = np.inf
        b = int(np.argmin(d2))
        assert got.loc[ids[p], "nn_id"] == sid[b]
        assert abs(got.loc[ids[p], "dist2"] - d2[b]) < 1e-15


def test_hex_density_smoothed_ring_kernel(fixtures_dir):
    """smoothed == own + Σ(6 neighbors); cells with no images never
    appear even when they receive halo; totals conserved per ring."""
    from rustac_ray.geo.hex import hex_ring1
    from rustac_ray.stages.tiling import hex_density_smoothed

    got = (
        hex_density_smoothed(_images_ds(fixtures_dir), size=0.5)
        .to_pandas()
        .set_index("hex_cell")
    )
    assert (got["n_images"] > 0).all()
    assert (got["smoothed"] == got["n_images"] + got["ring1_sum"]).all()
    counts = got["n_images"].to_dict()
    for cell, row in got.iterrows():
        ring = hex_ring1(np.array([cell], np.int64))[0]
        assert row["ring1_sum"] == sum(counts.get(int(c), 0) for c in ring)


def test_area_overlay_join_pairs_and_zonal(fixtures_dir, corpus):
    """area_overlay_join vs brute-force rect∩rect arithmetic — pairs are
    float-exact; zonal Σarea and area-weighted mean match to fp tolerance
    (partial-sum order differs by design)."""
    import pandas as pd

    from rustac_ray.stages.spatial_join import area_overlay_join

    imgs, corners, ids = corpus
    x0, y0 = corners[:, :, 0].min(1), corners[:, :, 1].min(1)
    x1, y1 = corners[:, :, 0].max(1), corners[:, :, 1].max(1)
    zones = pd.DataFrame(
        {
            "query_id": [10, 11],
            "xmin": [-112.0, -80.0],
            "ymin": [33.0, 25.0],
            "xmax": [-104.0, -70.0],
            "ymax": [41.0, 35.0],
        }
    )
    got = area_overlay_join(
        _images_ds(fixtures_dir), zones, concurrency=2
    ).to_pandas()

    expect = {}
    for zi, z in zones.iterrows():
        w = np.minimum(x1, z.xmax) - np.maximum(x0, z.xmin)
        h = np.minimum(y1, z.ymax) - np.maximum(y0, z.ymin)
        hit = (w > 0) & (h > 0)
        for i in np.nonzero(hit)[0]:
            expect[(ids[i], z.query_id)] = w[i] * h[i]
    gk = {(r.image_id, r.query_id): r.area for r in got.itertuples()}
    assert gk.keys() == expect.keys()
    for k in expect:
        assert gk[k] == expect[k]  # bit-identical per-pair floats

    # zonal aggregate with an area-weighted mean of image width
    zonal = area_overlay_join(
        _images_ds(fixtures_dir), zones, emit="zonal", value_col="w",
        concurrency=2,
    ).to_pandas().set_index("query_id")
    wvals = imgs["w"].to_numpy().astype(np.float64)
    for zi, z in zones.iterrows():
        w = np.minimum(x1, z.xmax) - np.maximum(x0, z.xmin)
        h = np.minimum(y1, z.ymax) - np.maximum(y0, z.ymin)
        hit = (w > 0) & (h > 0)
        a = (w * h)[hit]
        np.testing.assert_allclose(
            zonal.loc[z.query_id, "overlap_area"], a.sum(), rtol=1e-12
        )
        np.testing.assert_allclose(
            zonal.loc[z.query_id, "wmean_w"],
            (a * wvals[hit]).sum() / a.sum(), rtol=1e-12,
        )


def test_nearest_neighbor_auto_res_matches_explicit(fixtures_dir):
    """res=None auto-sizes the grid from the input count (r5: fixed res
    was quadratic in cell population at 10x data); results must be
    IDENTICAL to any explicit resolution — res only moves work between
    the cell kernel and the tail resolver, never the answer."""
    import pandas as pd

    from rustac_ray.stages.knn import _auto_res, nearest_neighbor_join

    ds = _images_ds(fixtures_dir)
    auto = (
        nearest_neighbor_join(ds, concurrency=2)
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    )
    explicit = (
        nearest_neighbor_join(_images_ds(fixtures_dir), res=7, concurrency=2)
        .to_pandas().sort_values("image_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(auto, explicit)
    # sizing math: +1 level per 4x rows, clamped
    class _C:
        def __init__(self, n): self._n = n
        def count(self): return self._n
    assert _auto_res(_C(1_000_000)) == 10
    assert _auto_res(_C(10_000_000)) == 12
    assert _auto_res(_C(160_000_000)) == 14  # clamp top
    assert _auto_res(_C(100)) == 6           # clamp bottom


def test_scene_dominance_dedup_matches_bruteforce(ray_session):
    """Scene dedup (r5): dominated = exists smaller-id item with
    IoU >= t and |dt| <= w — vs an O(n^2) pandas control, including
    planted exact-duplicate footprints and near-misses on both axes."""
    import pandas as pd

    from rustac_ray.stages.dedup import scene_dominance_dedup

    rng = np.random.default_rng(17)
    n = 400
    x0 = rng.uniform(-110, -100, n)
    y0 = rng.uniform(30, 40, n)
    w = rng.uniform(0.05, 0.2, n)
    df = pd.DataFrame(
        {
            "id": [f"s{k:04d}" for k in range(n)],
            "fp_xmin": x0, "fp_ymin": y0,
            "fp_xmax": x0 + w, "fp_ymax": y0 + w,
            "datetime": pd.to_datetime("2024-06-01")
            + pd.to_timedelta(rng.integers(0, 40 * 86400, n), unit="s"),
        }
    )
    # planted republished scenes: identical footprint, tiny time offset
    for k in range(0, 60, 3):
        df.loc[k + 1, ["fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]] = (
            df.loc[k, ["fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]].to_numpy()
        )
        df.loc[k + 1, "datetime"] = df.loc[k, "datetime"] + pd.Timedelta("30min")

    thr, wnd = 0.5, 3 * 86400.0
    got = (
        scene_dominance_dedup(
            rd.from_pandas(df).repartition(5),
            iou_threshold=thr, time_window_s=wnd,
        )
        .to_pandas().sort_values("id").reset_index(drop=True)
    )

    # brute force
    a = df.copy()
    ax0, ay0 = a["fp_xmin"].to_numpy(), a["fp_ymin"].to_numpy()
    ax1, ay1 = a["fp_xmax"].to_numpy(), a["fp_ymax"].to_numpy()
    tm = a["datetime"].astype("datetime64[ms]").astype("int64").to_numpy()
    ids = a["id"].to_numpy()
    area = (ax1 - ax0) * (ay1 - ay0)
    iw = np.minimum(ax1[:, None], ax1[None, :]) - np.maximum(ax0[:, None], ax0[None, :])
    ih = np.minimum(ay1[:, None], ay1[None, :]) - np.maximum(ay0[:, None], ay0[None, :])
    inter = np.maximum(iw, 0.0) * np.maximum(ih, 0.0)
    iou = inter / (area[:, None] + area[None, :] - inter)
    qual = (iou >= thr) & (np.abs(tm[:, None] - tm[None, :]) <= wnd * 1000) \
        & (ids[:, None] > ids[None, :])
    keep = ids[~qual.any(axis=1)]
    assert got["id"].tolist() == sorted(keep)
    assert len(got) < n  # the planted duplicates actually dropped
