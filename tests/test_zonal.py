"""Zonal statistics: box fast path, polygon PIP path, decode-once."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from rustac_ray import synth
from rustac_ray.stages.zonal import Zones, zonal_stats

SF = "/root/testdata/sf0.001"


def _images_ds(fdir):
    return rd.read_parquet(
        f"{fdir}/images.parquet",
        columns=["image_id", "bytes", "w", "h", "fmt", "transform"],
    )


def test_box_and_polygon_zone_agree(fixtures_dir):
    """A rectangle expressed as a polygon must aggregate the same pixels
    as the box fast path (inclusive edges both ways)."""
    boxes = pd.read_parquet(f"{fixtures_dir}/query_boxes.parquet").head(5)
    zb = Zones.from_boxes(boxes)
    polys = [
        {
            "type": "Polygon",
            "coordinates": [[
                [r.xmin, r.ymin], [r.xmax, r.ymin], [r.xmax, r.ymax],
                [r.xmin, r.ymax], [r.xmin, r.ymin],
            ]],
        }
        for r in boxes.itertuples()
    ]
    zp = Zones.from_geometries(boxes["query_id"].tolist(), polys)
    a = zonal_stats(_images_ds(fixtures_dir), zb).to_pandas().sort_values("query_id").reset_index(drop=True)
    b = zonal_stats(_images_ds(fixtures_dir), zp).to_pandas().sort_values("query_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_zonal_matches_naive_single_image(fixtures_dir):
    """Full-grid naive accumulation over one image == engine windowed path."""
    import glob

    from rustac_ray.imaging.codec import decode_image

    shard = sorted(glob.glob(f"{fixtures_dir}/images.parquet/*.parquet"))[0]
    t = pq.read_table(shard).slice(0, 1)
    tr = t["transform"][0].as_py()
    res, x0, y0 = tr[0], tr[2], tr[5]
    w, h = t["w"][0].as_py(), t["h"][0].as_py()
    # zone = left half of the image footprint
    zone = pd.DataFrame(
        {
            "query_id": ["z"],
            "xmin": [x0],
            "ymin": [y0 - res * h],
            "xmax": [x0 + res * w / 2],
            "ymax": [y0],
        }
    )
    out = zonal_stats(
        rd.from_arrow(t.select(["image_id", "bytes", "w", "h", "fmt", "transform"])),
        Zones.from_boxes(zone),
    ).to_pandas()
    px = decode_image(t["bytes"][0].as_py(), t["fmt"][0].as_py())
    cx = x0 + res * (np.arange(w) + 0.5)
    cy = y0 - res * (np.arange(h) + 0.5)
    gx, gy = np.meshgrid(cx, cy)
    m = (
        (gx >= zone.xmin[0]) & (gx <= zone.xmax[0])
        & (gy >= zone.ymin[0]) & (gy <= zone.ymax[0])
    )
    flat = px.reshape(-1, 3).astype(np.int64)[m.ravel()]
    assert out["n_pixels"].iloc[0] == int(m.sum())
    assert out["sum_r"].iloc[0] == int(flat[:, 0].sum())
    assert out["mean_b"].iloc[0] == flat[:, 2].sum() / m.sum()


def test_zonal_disjoint_zone_empty(fixtures_dir):
    zone = pd.DataFrame(
        {"query_id": ["far"], "xmin": [170.0], "ymin": [80.0], "xmax": [171.0], "ymax": [81.0]}
    )
    out = zonal_stats(_images_ds(fixtures_dir), Zones.from_boxes(zone)).to_pandas()
    assert len(out) == 0


def test_tile_mosaic_partitions_all_pixels(fixtures_dir):
    """Every pixel lands in exactly one tile: global n_pixels == corpus
    pixel count, and int sums equal the corpus-wide channel sums."""
    import glob

    from rustac_ray.stages.zonal import tile_pixel_stats

    out = tile_pixel_stats(_images_ds(fixtures_dir), z=8).to_pandas()
    total = 0
    for shard in glob.glob(f"{fixtures_dir}/images.parquet/*.parquet"):
        t = pq.read_table(shard, columns=["w", "h"])
        total += int(
            (t["w"].to_numpy().astype(np.int64) * t["h"].to_numpy()).sum()
        )
    assert out["n_pixels"].sum() == total
    assert (out["z"] == 8).all()


def test_tile_mosaic_zoom_consistent(fixtures_dir):
    """z=9 children aggregate exactly to their z=8 parents (pixel sums
    are a refinement of the same partition)."""
    from rustac_ray.stages.zonal import tile_pixel_stats

    z8 = tile_pixel_stats(_images_ds(fixtures_dir), z=8).to_pandas()
    z9 = tile_pixel_stats(_images_ds(fixtures_dir), z=9).to_pandas()
    z9["px"] = z9["x"] // 2
    z9["py"] = z9["y"] // 2
    roll = z9.groupby(["px", "py"])[["n_pixels", "sum_r", "sum_g", "sum_b"]].sum()
    merged = z8.set_index(["x", "y"])[["n_pixels", "sum_r", "sum_g", "sum_b"]]
    pd.testing.assert_frame_equal(
        merged.sort_index(),
        roll.sort_index().rename_axis(["x", "y"]),
        check_names=False,
    )


def test_zonal_antimeridian_zone_splits(fixtures_dir):
    """A wrapped zone (xmin > xmax) equals the union of its two
    non-wrapping halves."""
    from rustac_ray.stages.zonal import Zones, zonal_stats

    # wrap box whose east half covers the fixture's lon range
    wrapped = pd.DataFrame(
        {"query_id": ["w"], "xmin": [150.0], "ymin": [-90.0],
         "xmax": [-60.0], "ymax": [90.0]}
    )
    halves = pd.DataFrame(
        {
            "query_id": ["a", "b"],
            "xmin": [150.0, -180.0],
            "ymin": [-90.0, -90.0],
            "xmax": [180.0, -60.0],
            "ymax": [90.0, 90.0],
        }
    )
    wz = zonal_stats(_images_ds(fixtures_dir), Zones.from_boxes(wrapped)).to_pandas()
    hz = zonal_stats(_images_ds(fixtures_dir), Zones.from_boxes(halves)).to_pandas()
    assert len(wz) == 1
    assert wz["n_pixels"].iloc[0] == hz["n_pixels"].sum()
    assert wz["sum_r"].iloc[0] == hz["sum_r"].sum()


def test_zonal_combine_paths_agree(fixtures_dir):
    from rustac_ray.stages.zonal import Zones, tile_pixel_stats, zonal_stats

    boxes = pd.read_parquet(f"{fixtures_dir}/query_boxes.parquet")
    a = zonal_stats(_images_ds(fixtures_dir), Zones.from_boxes(boxes)).to_pandas()
    b = zonal_stats(
        _images_ds(fixtures_dir), Zones.from_boxes(boxes), combine="shuffle"
    ).to_pandas()
    key = ["query_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[sorted(a.columns)],
        b.sort_values(key).reset_index(drop=True)[sorted(b.columns)],
    )
    m1 = tile_pixel_stats(_images_ds(fixtures_dir), z=8).to_pandas()
    m2 = tile_pixel_stats(_images_ds(fixtures_dir), z=8, combine="shuffle").to_pandas()
    pd.testing.assert_frame_equal(
        m1.sort_values("tile_key").reset_index(drop=True)[sorted(m1.columns)],
        m2.sort_values("tile_key").reset_index(drop=True)[sorted(m2.columns)],
    )


def test_write_mosaic_pyramid_resume(fixtures_dir, tmp_path):
    import glob
    import os

    from rustac_ray.stages.zonal import tile_pixel_stats, write_mosaic_pyramid

    out = str(tmp_path / "mosaic")
    recs = write_mosaic_pyramid(_images_ds(fixtures_dir), out, z=8)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert files and os.path.exists(f"{out}/_manifest.jsonl")
    mtimes = {f: os.path.getmtime(f) for f in files}
    recs2 = write_mosaic_pyramid(_images_ds(fixtures_dir), out, z=8)
    assert len(recs2) == len(recs)
    assert {f: os.path.getmtime(f) for f in files} == mtimes  # all skipped
    # files are Morton-ordered and cover all tiles exactly once
    rows = pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )
    assert rows["tile_key"].is_monotonic_increasing
    direct = tile_pixel_stats(_images_ds(fixtures_dir), z=8).to_pandas()
    assert set(rows["tile_key"]) == set(direct["tile_key"])
    assert rows["n_pixels"].sum() == direct["n_pixels"].sum()


def test_zonal_random_boxes_vs_naive(fixtures_dir):
    """Random zones over a slice of real images: engine windowed path ==
    naive full-grid accumulation."""
    import glob

    from rustac_ray.imaging.codec import decode_image

    rng = np.random.default_rng(123)
    shard = sorted(glob.glob(f"{fixtures_dir}/images.parquet/*.parquet"))[0]
    t = pq.read_table(shard).slice(0, 60)
    # random zones roughly covering the fixture's lon/lat span
    zones = pd.DataFrame(
        {
            "query_id": [f"r{i}" for i in range(6)],
            "xmin": rng.uniform(-120, -70, 6),
            "ymin": rng.uniform(15, 45, 6),
            "xmax": 0.0,
            "ymax": 0.0,
        }
    )
    zones["xmax"] = zones["xmin"] + rng.uniform(0.05, 8.0, 6)
    zones["ymax"] = zones["ymin"] + rng.uniform(0.05, 8.0, 6)
    got = (
        zonal_stats(
            rd.from_arrow(t.select(["image_id", "bytes", "w", "h", "fmt", "transform"])),
            Zones.from_boxes(zones),
        )
        .to_pandas()
        .set_index("query_id")
    )
    # naive
    acc = {q: [0, 0, np.zeros(3, np.int64)] for q in zones["query_id"]}
    for i in range(len(t)):
        px = decode_image(t["bytes"][i].as_py(), t["fmt"][i].as_py())
        tr = t["transform"][i].as_py()
        res, x0, y0 = tr[0], tr[2], tr[5]
        h, w = px.shape[0], px.shape[1]
        gx, gy = np.meshgrid(
            x0 + res * (np.arange(w) + 0.5), y0 - res * (np.arange(h) + 0.5)
        )
        flat = px.reshape(-1, 3).astype(np.int64)
        for _, z in zones.iterrows():
            m = (
                (gx >= z.xmin) & (gx <= z.xmax) & (gy >= z.ymin) & (gy <= z.ymax)
            ).ravel()
            c = int(m.sum())
            if c:
                a = acc[z.query_id]
                a[0] += 1
                a[1] += c
                a[2] += flat[m].sum(axis=0)
    for q, (ni, npx, s) in acc.items():
        if ni == 0:
            assert q not in got.index
        else:
            row = got.loc[q]
            assert (row["n_images"], row["n_pixels"]) == (ni, npx)
            assert [row["sum_r"], row["sum_g"], row["sum_b"]] == list(s)


def test_sample_points_matches_naive(fixtures_dir):
    """Vectorized point sampler == scalar affine inversion + decode."""
    import glob
    import math

    from rustac_ray.imaging.codec import decode_image
    from rustac_ray.stages.zonal import sample_raster_at_points

    pts = pq.read_table(f"{fixtures_dir}/query_points.parquet")
    points = {
        q: (x, y)
        for q, x, y in zip(
            pts["query_id"].to_pylist(), pts["x"].to_pylist(), pts["y"].to_pylist()
        )
    }
    # sf0.001's fixture points can miss every footprint — add guaranteed
    # hits: the centers of the first few images
    shard0 = sorted(glob.glob(f"{fixtures_dir}/images.parquet/*.parquet"))[0]
    head = pq.read_table(shard0, columns=["w", "h", "transform"]).slice(0, 5)
    for i in range(len(head)):
        tr = head["transform"][i].as_py()
        res, x0, y0 = tr[0], tr[2], tr[5]
        w, h = head["w"][i].as_py(), head["h"][i].as_py()
        points[f"c{i}"] = (x0 + res * w / 2, y0 - res * h / 2)
    got = (
        sample_raster_at_points(_images_ds(fixtures_dir), points, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "image_id"])
        .reset_index(drop=True)
    )
    rows = []
    for shard in sorted(glob.glob(f"{fixtures_dir}/images.parquet/*.parquet")):
        t = pq.read_table(shard)
        for i in range(len(t)):
            tr = t["transform"][i].as_py()
            res, x0, y0 = tr[0], tr[2], tr[5]
            w, h = t["w"][i].as_py(), t["h"][i].as_py()
            px = None
            for q, (x, y) in points.items():
                col = math.floor((x - x0) / res)
                row = math.floor((y0 - y) / res)
                if not (0 <= col < w and 0 <= row < h):
                    continue
                if px is None:
                    px = decode_image(t["bytes"][i].as_py(), t["fmt"][i].as_py())
                rows.append(
                    (q, t["image_id"][i].as_py(), *[int(v) for v in px[row, col]])
                )
    assert rows, "fixture points must hit at least one footprint"
    exp = (
        pd.DataFrame(rows, columns=["query_id", "image_id", "px_r", "px_g", "px_b"])
        .sort_values(["query_id", "image_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got, exp, check_dtype=False
    )


def test_sample_points_empty_inputs(fixtures_dir):
    from rustac_ray.stages.zonal import sample_raster_at_points

    out = sample_raster_at_points(_images_ds(fixtures_dir), {}, concurrency=1)
    assert out.count() == 0


def test_mosaic_delta_matches_two_pass(fixtures_dir):
    """Single-pass windowed delta == two independent tile_pixel_stats runs
    inner-joined on tile; delta numerator sign matches the mean shift."""
    from rustac_ray.stages.zonal import mosaic_delta, tile_pixel_stats

    def imgs():
        return rd.read_parquet(
            f"{fixtures_dir}/images.parquet",
            columns=["image_id", "bytes", "w", "h", "fmt", "transform", "datetime"],
        )

    split = "2024-01-02T12:00"
    got = mosaic_delta(imgs(), split, z=8, concurrency=2).to_pandas()
    assert len(got) > 0

    import numpy as np

    split_ms = np.datetime64(split, "ms").astype(np.int64)

    def window(ds, w):
        def f(df):
            ms = df["datetime"].astype("datetime64[ms]").astype("int64")
            return df.loc[(ms >= split_ms) if w else (ms < split_ms)]
        return ds.map_batches(f, batch_format="pandas")

    a = tile_pixel_stats(window(imgs(), 0), z=8, concurrency=2).to_pandas().set_index("tile_key")
    b = tile_pixel_stats(window(imgs(), 1), z=8, concurrency=2).to_pandas().set_index("tile_key")
    both = sorted(set(a.index) & set(b.index))
    assert got["tile_key"].tolist() == both
    g = got.set_index("tile_key")
    for c in ("n_images", "n_pixels", "sum_r", "sum_g", "sum_b"):
        assert (g[f"{c}_a"] == a.loc[both, c]).all()
        assert (g[f"{c}_b"] == b.loc[both, c]).all()
    # sign of the integer numerator == sign of the float mean difference
    dm = (b.loc[both, "sum_r"] / b.loc[both, "n_pixels"]
          - a.loc[both, "sum_r"] / a.loc[both, "n_pixels"])
    assert (np.sign(g["delta_r_num"].to_numpy()) == np.sign(dm.to_numpy())).all()


def test_composite_tiles_exact_and_layout_invariant(fixtures_dir):
    """True pixel composite: per-cell floor-mean equals a direct dense
    accumulation; identical across block layouts (the accumulator blobs
    are exactly mergeable); pixel conservation: Σ counts == Σ decoded
    pixels."""
    from rustac_ray.geo import tiles as T
    from rustac_ray.imaging.codec import decode_image
    from rustac_ray.stages.zonal import composite_tiles

    z, tpx = 8, 16
    ds = _images_ds(fixtures_dir)
    got = composite_tiles(ds, z=z, tile_px=tpx, concurrency=1).to_pandas()
    got2 = composite_tiles(
        rd.read_parquet(
            f"{fixtures_dir}/images.parquet",
            columns=["image_id", "bytes", "w", "h", "fmt", "transform"],
        ).repartition(13),
        z=z, tile_px=tpx, concurrency=2,
    ).to_pandas()
    a = got.sort_values("tile_key").reset_index(drop=True)
    b = got2.sort_values("tile_key").reset_index(drop=True)
    assert a["img"].map(bytes).tolist() == b["img"].map(bytes).tolist()
    pd.testing.assert_frame_equal(a.drop(columns=["img"]), b.drop(columns=["img"]))

    # direct dense twin over the raw images
    imgs = pq.read_table(f"{fixtures_dir}/images.parquet",
                         columns=["bytes", "fmt", "transform"])
    n = 1 << z
    gmax = n * tpx - 1
    acc_c, acc_s = {}, {}
    total_px = 0
    for i in range(len(imgs)):
        t = imgs["transform"][i].as_py()
        px = decode_image(imgs["bytes"][i].as_py(), imgs["fmt"][i].as_py())
        h, w = px.shape[:2]
        total_px += h * w
        cx = t[2] + t[0] * (np.arange(w) + 0.5)
        cy = t[5] - t[0] * (np.arange(h) + 0.5)
        gx, gy = np.meshgrid(cx, cy)
        sx = np.clip((T._xfrac(gx.ravel()) * (n * tpx)).astype(np.int64), 0, gmax)
        sy = np.clip((T._yfrac(gy.ravel()) * (n * tpx)).astype(np.int64), 0, gmax)
        keys = T.tile_key(z, sx // tpx, sy // tpx).astype(np.int64)
        flat = px.reshape(-1, 3).astype(np.int64)
        for key in np.unique(keys):
            m = keys == key
            c = acc_c.setdefault(int(key), np.zeros((tpx, tpx), np.int64))
            s = acc_s.setdefault(int(key), np.zeros((tpx, tpx, 3), np.int64))
            np.add.at(c, (sy[m] % tpx, sx[m] % tpx), 1)
            np.add.at(s, (sy[m] % tpx, sx[m] % tpx), flat[m])
    assert set(a["tile_key"]) == set(acc_c)
    assert int(sum(c.sum() for c in acc_c.values())) == total_px
    for _, row in a.iterrows():
        c = acc_c[row["tile_key"]]
        s = acc_s[row["tile_key"]]
        exp = np.zeros((tpx, tpx, 3), np.uint8)
        f = c > 0
        exp[f] = (s[f] // c[f][:, None]).astype(np.uint8)
        assert bytes(row["img"]) == exp.tobytes()
        assert row["n_px_filled"] == int(f.sum())


def test_composite_latest_tie_rules_and_layout(fixtures_dir):
    """Latest-pixel composite: planted timestamp ties resolve to the
    lexicographically smaller image_id everywhere, and block layout
    cannot change any winner (the order is total)."""
    from rustac_ray.stages.zonal import composite_tiles_latest

    ds_cols = ["image_id", "bytes", "w", "h", "fmt", "transform", "datetime"]

    def with_tied_ts(df):
        # force ALL timestamps equal: winners decided purely by id
        df = df.copy()
        df["datetime"] = np.datetime64("2024-06-01T00:00:00", "ms")
        return df

    base = rd.read_parquet(f"{fixtures_dir}/images.parquet", columns=ds_cols)
    tied = base.map_batches(with_tied_ts, batch_format="pandas")
    a = (
        composite_tiles_latest(tied, z=8, tile_px=16, concurrency=1)
        .to_pandas()
        .sort_values("tile_key")
        .reset_index(drop=True)
    )
    b = (
        composite_tiles_latest(
            rd.read_parquet(f"{fixtures_dir}/images.parquet", columns=ds_cols)
            .map_batches(with_tied_ts, batch_format="pandas")
            .repartition(11),
            z=8, tile_px=16, concurrency=2,
        )
        .to_pandas()
        .sort_values("tile_key")
        .reset_index(drop=True)
    )
    assert a["img"].map(bytes).tolist() == b["img"].map(bytes).tolist()
    pd.testing.assert_frame_equal(a.drop(columns=["img"]), b.drop(columns=["img"]))

    # real timestamps: layout invariance again, and each filled cell's
    # value must equal the pixel of the (max ts, min id) image covering it
    real = (
        composite_tiles_latest(base, z=8, tile_px=16, concurrency=1)
        .to_pandas()
    )
    real2 = (
        composite_tiles_latest(
            rd.read_parquet(f"{fixtures_dir}/images.parquet", columns=ds_cols)
            .repartition(7),
            z=8, tile_px=16, concurrency=2,
        )
        .to_pandas()
    )
    ra = real.sort_values("tile_key").reset_index(drop=True)
    rb = real2.sort_values("tile_key").reset_index(drop=True)
    assert ra["img"].map(bytes).tolist() == rb["img"].map(bytes).tolist()
    # filled-cell counts agree with the mean composite's footprint
    from rustac_ray.stages.zonal import composite_tiles

    mean_c = composite_tiles(
        base.map_batches(lambda b: b, batch_format="pyarrow"), z=8, tile_px=16,
        concurrency=1,
    ).to_pandas().sort_values("tile_key").reset_index(drop=True)
    assert mean_c["n_px_filled"].tolist() == ra["n_px_filled"].tolist()


def test_write_composite_pyramid_resume(fixtures_dir, tmp_path):
    import glob
    import os

    from rustac_ray.stages.zonal import write_composite_pyramid

    out = str(tmp_path / "comp_pyr")

    def _ds():
        return rd.read_parquet(
            f"{fixtures_dir}/images.parquet",
            columns=["image_id", "bytes", "w", "h", "fmt", "transform",
                     "datetime"],
        )

    recs = write_composite_pyramid(_ds(), out, z=8, tile_px=16,
                                   reducer="latest")
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert files and os.path.exists(f"{out}/_manifest.jsonl")
    total = sum(r["rows"] for r in recs)
    t = pq.read_table(files[0])
    assert {"tile_key", "img", "n_px_filled"} <= set(t.column_names)
    # resume: second run rewrites nothing
    mtimes = {f: os.path.getmtime(f) for f in files}
    recs2 = write_composite_pyramid(_ds(), out, z=8, tile_px=16,
                                    reducer="latest")
    assert sum(r["rows"] for r in recs2) == total
    assert {f: os.path.getmtime(f) for f in files} == mtimes


def test_composite_tiles_many_tiles_dispatch_scales():
    """Planted ≥50k-tile composite (r03 verdict #2): the sharded merge
    dispatches O(merge_shards) Ray groups, not one per tile — the former
    per-tile ``map_groups`` spent ~10ms/group (≥ 9 minutes of pure
    dispatch at this tile count). Construction: 36 images of 40×40 px at
    0.5°/px so every pixel center splats into its OWN z=10 tile
    (self-verified below) — 57,600 tiles, each with exactly one filled
    cell from exactly one image."""
    import time

    from rustac_ray.geo import tiles as T
    from rustac_ray.imaging.codec import encode_image
    from rustac_ray.stages.zonal import composite_tiles

    z, tpx = 10, 4
    n = 1 << z
    res, w, h = 0.5, 40, 40
    rng = np.random.default_rng(11)
    rows = []
    keys_all = []
    for r in range(6):
        for c in range(6):
            lon0 = -170.0 + c * 28.0
            lat0 = 62.0 - r * 24.0
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            rows.append(
                {
                    "image_id": f"img-{r}-{c}",
                    "bytes": encode_image(px, "raw"),
                    "w": w,
                    "h": h,
                    "fmt": "raw",
                    "transform": [res, 0.0, lon0, 0.0, -res, lat0],
                }
            )
            cx = lon0 + res * (np.arange(w) + 0.5)
            cy = lat0 - res * (np.arange(h) + 0.5)
            gx, gy = np.meshgrid(cx, cy)
            sx = (T._xfrac(gx.ravel()) * (n * tpx)).astype(np.int64)
            sy = (T._yfrac(gy.ravel()) * (n * tpx)).astype(np.int64)
            keys = T.tile_key(z, sx // tpx, sy // tpx).astype(np.int64)
            cell = (sy % tpx) * tpx + (sx % tpx)
            # pack on the morton part only (z lives at bit 58; a naive
            # key*tpx² overflows int64 — same masking as the stage)
            morton = keys & ((np.int64(1) << np.int64(58)) - 1)
            keys_all.append((keys, morton * (tpx * tpx) + cell))
    bins = np.concatenate([b for _, b in keys_all])
    # self-verify the construction: every pixel in its own (tile, cell)
    # AND its own tile
    assert len(np.unique(bins)) == len(bins) == 36 * w * h
    expected_tiles = np.unique(np.concatenate([k for k, _ in keys_all]))
    assert len(expected_tiles) == 36 * w * h >= 50_000

    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(6)
    t0 = time.time()
    out = composite_tiles(ds, z=z, tile_px=tpx, concurrency=2).to_pandas()
    elapsed = time.time() - t0
    assert len(out) == len(expected_tiles)
    assert np.array_equal(np.sort(out["tile_key"].to_numpy()), expected_tiles)
    assert (out["n_px_filled"] == 1).all() and (out["n_images"] == 1).all()
    # dispatch bound: per-tile grouping alone would exceed this by >3×
    assert elapsed < 180, f"57k-tile composite took {elapsed:.0f}s"


def test_composite_deep_zoom_z14_sharded_merge(fixtures_dir):
    """r4 VERDICT #3 pin: at z=14 the tile-key space is ~2.7e8 (keys >>
    merge_shards by construction) — the hash-sharded merge must stay
    byte-exact and shard-count-invariant on a sparse region, i.e.
    correctness never depends on the shards:tiles ratio."""
    from rustac_ray.stages.zonal import composite_tiles

    z, tpx = 14, 8
    ds = _images_ds(fixtures_dir)
    a = (
        composite_tiles(ds, z=z, tile_px=tpx, concurrency=1,
                        merge_shards=64)
        .to_pandas().sort_values("tile_key").reset_index(drop=True)
    )
    b = (
        composite_tiles(
            rd.read_parquet(
                f"{fixtures_dir}/images.parquet",
                columns=["image_id", "bytes", "w", "h", "fmt", "transform"],
            ).repartition(9),
            z=z, tile_px=tpx, concurrency=2, merge_shards=5,
        )
        .to_pandas().sort_values("tile_key").reset_index(drop=True)
    )
    # sparse deep zoom: plenty of distinct tiles, far more keys than
    # shards on the 5-shard run, and the z14 key space dwarfs both
    assert len(a) > 500
    assert a["tile_key"].nunique() == len(a) > 5000  # tiles >> both shard counts
    assert a["tile_key"].tolist() == b["tile_key"].tolist()
    assert a["img"].map(bytes).tolist() == b["img"].map(bytes).tolist()
    pd.testing.assert_frame_equal(
        a.drop(columns=["img"]), b.drop(columns=["img"])
    )
