"""Planted-skew tests for the two-level seam-merge rollups (r02 verdict
#2): scene_gaps / rolling_window_counts / coverage_area / session_windows
must stay exact when ONE key holds 99% of the rows, with the input split
into many small blocks so batch seams (and tie-splitting seams) are hit.
None of these may put a whole key's rows in a single task anymore — the
correctness mechanism under test is the seam merge itself.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _skewed_scenes(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    coll = np.where(rng.random(n) < 0.99, "hot", "cold").astype(object)
    # dense timestamps with many exact ties (ties straddle seams)
    ts_ms = rng.integers(0, 200_000, n) * 1000
    df = pd.DataFrame(
        {
            "collection": coll,
            "datetime": ts_ms.astype("datetime64[ms]"),
            "image_id": np.array([f"img-{i:06d}" for i in range(n)], object),
        }
    )
    return df


def test_scene_gaps_planted_skew():
    from rustac_ray.stages.aggregates import scene_gaps

    df = _skewed_scenes()
    got = (
        scene_gaps(rd.from_pandas(df).repartition(37))
        .to_pandas()
        .sort_values("collection")
        .reset_index(drop=True)
    )
    exp_rows = []
    for g, sub in df.groupby("collection", sort=True):
        t = np.sort(sub["datetime"].to_numpy().astype("datetime64[ms]").astype(np.int64))
        d = np.diff(t)
        exp_rows.append((g, len(sub), int(d.max()) if len(d) else 0,
                         int(d.min()) if len(d) else 0))
    exp = pd.DataFrame(exp_rows, columns=["collection", "n_scenes",
                                          "max_gap_ms", "min_gap_ms"])
    pd.testing.assert_frame_equal(
        got, exp.astype({"n_scenes": "int64", "max_gap_ms": "int64",
                         "min_gap_ms": "int64"})
    )


@pytest.mark.parametrize("window_ms", [5_000, 1_000_000_000])
def test_rolling_window_counts_planted_skew(window_ms):
    """window >> span (second param) forces EVERY row unresolved — the
    driver seam correction must reproduce the exact whole-group counts."""
    from rustac_ray.stages.aggregates import rolling_window_counts

    df = _skewed_scenes(n=2500, seed=11)
    got = (
        rolling_window_counts(
            rd.from_pandas(df).repartition(23), window_ms=window_ms
        )
        .to_pandas()
        .set_index("image_id")
    )
    assert len(got) == len(df)
    for g, sub in df.groupby("collection"):
        t = sub["datetime"].to_numpy().astype("datetime64[ms]").astype(np.int64)
        st = np.sort(t)
        exp = np.searchsorted(st, t, "right") - np.searchsorted(
            st, t - window_ms, "left"
        )
        got_n = got.loc[sub["image_id"].to_numpy(), "n_in_window"].to_numpy()
        assert np.array_equal(got_n, exp), (g, window_ms)


def test_rolling_window_counts_tie_seams():
    """All rows share 3 timestamps across 29 blocks: every seam splits a
    tie, every row is a RANGE-frame peer of its timestamp twins."""
    from rustac_ray.stages.aggregates import rolling_window_counts

    n = 900
    ts = np.repeat(np.array([10_000, 20_000, 30_000], np.int64), n // 3)
    df = pd.DataFrame(
        {
            "collection": np.full(n, "only", object),
            "datetime": ts.astype("datetime64[ms]"),
            "image_id": np.array([f"r{i:04d}" for i in range(n)], object),
        }
    )
    got = (
        rolling_window_counts(rd.from_pandas(df).repartition(29), window_ms=10_000)
        .to_pandas()
        .set_index("image_id")["n_in_window"]
    )
    st = np.sort(ts)
    exp = np.searchsorted(st, ts, "right") - np.searchsorted(st, ts - 10_000, "left")
    assert np.array_equal(got.loc[df["image_id"]].to_numpy(), exp)


def test_session_windows_planted_skew():
    from rustac_ray.stages.windows import session_windows

    rng = np.random.default_rng(3)
    n = 3000
    users = np.where(rng.random(n) < 0.99, 7, rng.integers(100, 110, n)).astype(
        np.int64
    )
    ts = np.sort(rng.integers(0, 5_000, n)) * 1_000_000  # µs, gaps around 1s
    # shuffle row order: the op owns the sort
    perm = rng.permutation(n)
    df = pd.DataFrame({"user_id": users[perm],
                       "ts": ts[perm].astype("datetime64[us]")})
    got = (
        session_windows(rd.from_pandas(df).repartition(31), gap_s=2)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    exp_rows = []
    for u, sub in df.groupby("user_id", sort=True):
        t = np.sort(sub["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        starts = np.concatenate([[0], np.flatnonzero(np.diff(t) > 2_000_000) + 1])
        ends = np.concatenate([starts[1:], [len(t)]])
        for s, e in zip(starts, ends):
            exp_rows.append((u, t[s], t[e - 1], e - s))
    exp = pd.DataFrame(exp_rows, columns=["user_id", "session_start",
                                          "session_end", "n_events"])
    exp["session_start"] = exp["session_start"].astype("datetime64[us]")
    exp["session_end"] = exp["session_end"].astype("datetime64[us]")
    exp = exp.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, exp.astype({"user_id": "int64", "n_events": "int64"})
    )


def test_coverage_area_planted_skew_strips():
    """99%-hot collection spread across many x-strips; clipped strip
    unions must add back to the exact global union."""
    from rustac_ray.stages.aggregates import coverage_area

    rng = np.random.default_rng(5)
    n = 1500
    coll = np.where(rng.random(n) < 0.99, "hot", "cold").astype(object)
    # boxes WIDER than one strip (strip_deg passed below is 0.5) so the
    # clipping path replicates most boxes into several strips
    x0 = rng.uniform(-10, 10, n)
    y0 = rng.uniform(-5, 5, n)
    res = rng.uniform(5e-3, 2e-2, n)
    w = rng.integers(20, 90, n)
    h = rng.integers(10, 50, n)
    df = pd.DataFrame(
        {
            "collection": coll,
            "image_id": [f"c{i}" for i in range(n)],
            "w": w.astype("int32"),
            "h": h.astype("int32"),
            "transform": [[res[i], 0.0, x0[i], 0.0, -res[i], y0[i]]
                          for i in range(n)],
        }
    )
    # affine with -res y-scale: footprint = [x0, y0-h*res, x0+w*res, y0]
    fxmin, fymin = x0, y0 - h * res
    fxmax, fymax = x0 + w * res, y0
    q = 1e-3
    got = (
        coverage_area(rd.from_pandas(df).repartition(19), quantum=q,
                      strip_deg=0.5)
        .to_pandas()
        .set_index("collection")
    )
    fdf = pd.DataFrame({"collection": coll, "fp_xmin": fxmin, "fp_ymin": fymin,
                        "fp_xmax": fxmax, "fp_ymax": fymax})
    for g, sub in fdf.groupby("collection"):
        gx0 = np.floor(sub["fp_xmin"].to_numpy() / q).astype(np.int64)
        gy0 = np.floor(sub["fp_ymin"].to_numpy() / q).astype(np.int64)
        gx1 = np.floor(sub["fp_xmax"].to_numpy() / q).astype(np.int64)
        gy1 = np.floor(sub["fp_ymax"].to_numpy() / q).astype(np.int64)
        keep = (gx1 > gx0) & (gy1 > gy0)
        exp_sum = int(((gx1 - gx0) * (gy1 - gy0))[keep].sum())
        # brute-force union on a dense grid (bounded extents make it cheap)
        ox, oy = gx0[keep].min(), gy0[keep].min()
        grid = np.zeros((int(gy1[keep].max() - oy), int(gx1[keep].max() - ox)),
                        bool)
        for a, b, c, d in zip(gx0[keep], gy0[keep], gx1[keep], gy1[keep]):
            grid[b - oy:d - oy, a - ox:c - ox] = True
        assert int(got.loc[g, "n_images"]) == len(sub)
        assert int(got.loc[g, "sum_box_cells"]) == exp_sum
        assert int(got.loc[g, "union_cells"]) == int(grid.sum())


def test_rolling_bucket_strategy_matches_seam():
    """strategy='bucket' (fully distributed, for windows wide enough to
    flood the seam path's driver merge) must agree with the seam path
    exactly, ties included."""
    from rustac_ray.stages.aggregates import rolling_window_counts

    df = _skewed_scenes(n=1800, seed=23)
    ds = rd.from_pandas(df).repartition(17)
    for W in (5_000, 40_000):
        a = (
            rolling_window_counts(ds, window_ms=W, strategy="seam")
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        b = (
            rolling_window_counts(ds, window_ms=W, strategy="bucket")
            .to_pandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b.reindex(columns=a.columns))
