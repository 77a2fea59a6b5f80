"""Extent / count aggregations (SURVEY.md A1-A3).

Collection extents reproduce ``Collection::from_id_and_items`` semantics
(reference crates/core/src/collection.rs:270-276,348-375 — bbox union over
item bboxes + temporal min(start)/max(end) with coalesce(start_datetime,
datetime), the same coalesce the DuckDB collections() query uses,
crates/duckdb/src/client.rs:123-181).

Scale shape: a per-batch partial fold inside map_batches emits ONE row per
collection per batch (the combiner), then a tiny ``groupby(collection)``
over partials finishes — the shuffle moves O(collections × batches) rows,
never the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["collection_extents", "coverage_area", "scene_gaps", "rolling_window_counts", "daily_counts_filled", "global_extent", "grouped_topk", "collection_summaries", "summaries_dict"]

_PARTIAL_COLS = ["collection", "xmin", "ymin", "xmax", "ymax", "start", "end", "n_items"]

# strip id reserved for coverage_area's per-batch count-marker rows; real
# strip indices are bounded by ±(max |lon| / strip_deg), far from this
_COUNT_STRIP = -(2**62)


def _partial_extents(batch: pa.Table) -> pa.Table:
    bbox = batch["bbox"]
    if isinstance(bbox, pa.ChunkedArray):
        bbox = bbox.combine_chunks()
    xmin = bbox.field(0).to_numpy(zero_copy_only=False)
    ymin = bbox.field(1).to_numpy(zero_copy_only=False)
    xmax = bbox.field(2).to_numpy(zero_copy_only=False)
    ymax = bbox.field(3).to_numpy(zero_copy_only=False)
    dt = batch["datetime"].to_numpy(zero_copy_only=False)
    names = batch.column_names
    sdt = (
        batch["start_datetime"].to_numpy(zero_copy_only=False)
        if "start_datetime" in names
        else np.full(len(batch), np.datetime64("NaT", "ms"))
    )
    edt = (
        batch["end_datetime"].to_numpy(zero_copy_only=False)
        if "end_datetime" in names
        else np.full(len(batch), np.datetime64("NaT", "ms"))
    )
    start = np.where(np.isnat(sdt), dt, sdt)
    end = np.where(np.isnat(edt), dt, edt)
    coll = np.asarray(batch["collection"].to_pylist(), dtype=object)

    df = pd.DataFrame(
        {
            "collection": coll,
            "xmin": xmin,
            "ymin": ymin,
            "xmax": xmax,
            "ymax": ymax,
            "start": start,
            "end": end,
        }
    )
    g = df.groupby("collection", sort=False).agg(
        xmin=("xmin", "min"),
        ymin=("ymin", "min"),
        xmax=("xmax", "max"),
        ymax=("ymax", "max"),
        start=("start", "min"),
        end=("end", "max"),
        n_items=("xmin", "size"),
    ).reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


def collection_extents(ds) -> "pd.DataFrame":
    """→ per-collection (xmin, ymin, xmax, ymax, start, end, n_items)."""
    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(_partial_extents, batch_format="pyarrow")
    out = partials.groupby("collection").aggregate(
        Min("xmin", alias_name="xmin"),
        Min("ymin", alias_name="ymin"),
        Max("xmax", alias_name="xmax"),
        Max("ymax", alias_name="ymax"),
        Min("start", alias_name="start"),
        Max("end", alias_name="end"),
        Sum("n_items", alias_name="n_items"),
    )
    return out


def grouped_topk(
    ds,
    key: str,
    order_by: str,
    n: int,
    *,
    descending: bool = True,
    tie_cols: list[str] | None = None,
):
    """Per-key top-n (the grouped analogue of ``query.sorted_topn``).

    Scale shape: each block is pruned to its LOCAL per-key top-n with one
    vectorized pandas sort + ``groupby(key).head(n)`` (C kernels, no
    Python per row), so the ``groupby(key)`` shuffle that finishes moves
    at most n × keys × blocks rows — never the data. Deterministic under
    ties via ``tie_cols`` (ascending tail keys), matching a SQL
    ``row_number() OVER (PARTITION BY key ORDER BY order_by [DESC],
    tie_cols) <= n``.
    """
    ties = list(tie_cols or [])
    by = [order_by] + ties
    asc = [not descending] + [True] * len(ties)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=asc, kind="mergesort").groupby(
            key, sort=False
        ).head(n)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(by, ascending=asc, kind="mergesort").head(n)

    pruned = ds.map_batches(prune, batch_format="pandas")
    return pruned.groupby(key).map_groups(final, batch_format="pandas")


def global_extent(ds) -> dict:
    """Whole-dataset bbox union + temporal interval (Collection autogen,
    reference collection.rs:230-245). Small driver-side result."""
    df = collection_extents(ds).to_pandas()
    return {
        "xmin": float(df["xmin"].min()),
        "ymin": float(df["ymin"].min()),
        "xmax": float(df["xmax"].max()),
        "ymax": float(df["ymax"].max()),
        "start": df["start"].min(),
        "end": df["end"].max(),
        "n_items": int(df["n_items"].sum()),
    }


def coverage_area(ds, *, group_col: str = "collection", quantum: float = 1e-6,
                  strip_deg: float = 5.0):
    """Per-group dissolve: exact union area of footprint boxes, in integer
    ``quantum``-degree cells (µdeg² by default).

    The GIS ``ST_Union → ST_Area`` rollup for axis-aligned footprints.
    Coordinates are snapped with ``floor(x / quantum)`` — floor is
    bit-deterministic for any float (unlike half-even rounding near .5),
    so engine and oracle agree exactly — and every output is an int64
    (union cells, sum of individual box cells, image count): order-
    independent exact, no float summation anywhere.

    Scale shape — two levels, no whole-group task (r02 verdict: a single
    ``map_groups`` per collection is the skewed-key straggler): boxes are
    CLIPPED to disjoint x-strips of ``strip_deg`` degrees inside the
    per-batch partial, the exact union runs per (group, strip) — strips
    are disjoint in x, so per-strip unions ADD — and a tiny driver merge
    sums the O(groups × strips) strip rows. A 99%-of-rows collection is
    split into ~360/strip_deg independent tasks; shrink ``strip_deg`` to
    split hotter. The per-strip union is the 2-D difference-array +
    cumsum over the coordinate-compressed grid — O(n log n + cells), not
    O(n²) — and ships 4 int64s per clipped box, never pixels.
    """
    import ray.data as rd

    from .footprint import derive_footprints

    q = float(quantum)
    strip_cells = max(1, int(round(strip_deg / q)))

    def partial(batch: pa.Table) -> pa.Table:
        batch = derive_footprints(batch)
        grp = np.asarray(batch[group_col].to_pylist(), dtype=object)
        x0 = np.floor(batch["fp_xmin"].to_numpy() / q).astype(np.int64)
        y0 = np.floor(batch["fp_ymin"].to_numpy() / q).astype(np.int64)
        x1 = np.floor(batch["fp_xmax"].to_numpy() / q).astype(np.int64)
        y1 = np.floor(batch["fp_ymax"].to_numpy() / q).astype(np.int64)
        # degenerate (zero-cell) boxes contribute nothing to either sum,
        # but DO count toward n_images (strip == -1 marker rows)
        keep = np.flatnonzero((x1 > x0) & (y1 > y0))
        s0 = x0[keep] // strip_cells
        s1 = (x1[keep] - 1) // strip_cells
        spans = (s1 - s0 + 1).astype(np.int64)
        rep = np.repeat(keep, spans)
        cum = np.concatenate([[0], np.cumsum(spans)[:-1]])
        strip = s0[np.repeat(np.arange(len(keep)), spans)] + (
            np.arange(int(spans.sum())) - np.repeat(cum, spans)
        )
        cg, cn = np.unique(grp, return_counts=True)
        return pa.table(
            {
                group_col: pa.array(
                    np.concatenate([grp[rep], cg]), pa.string()
                ),
                "strip": pa.array(
                    np.concatenate([strip, np.full(len(cg), _COUNT_STRIP, np.int64)]),
                    pa.int64(),
                ),
                "x0": pa.array(
                    np.concatenate(
                        [np.maximum(x0[rep], strip * strip_cells), cn.astype(np.int64)]
                    ),
                    pa.int64(),
                ),
                "y0": pa.array(
                    np.concatenate([y0[rep], np.zeros(len(cg), np.int64)]), pa.int64()
                ),
                "x1": pa.array(
                    np.concatenate(
                        [np.minimum(x1[rep], (strip + 1) * strip_cells),
                         np.zeros(len(cg), np.int64)]
                    ),
                    pa.int64(),
                ),
                "y1": pa.array(
                    np.concatenate([y1[rep], np.zeros(len(cg), np.int64)]), pa.int64()
                ),
            }
        )

    boxes = ds.map_batches(partial, batch_format="pyarrow")

    def strip_union(g: pd.DataFrame) -> pd.DataFrame:
        gv = g[group_col].iloc[0]
        if int(g["strip"].iloc[0]) == _COUNT_STRIP:
            # count-marker group: x0 carries the per-batch row count
            return pd.DataFrame(
                {
                    group_col: [gv],
                    "n_images": np.array([g["x0"].sum()], np.int64),
                    "union_cells": np.array([0], np.int64),
                    "sum_box_cells": np.array([0], np.int64),
                }
            )
        x0 = g["x0"].to_numpy()
        y0 = g["y0"].to_numpy()
        x1 = g["x1"].to_numpy()
        y1 = g["y1"].to_numpy()
        sum_cells = int(((x1 - x0) * (y1 - y0)).sum())
        xs = np.unique(np.concatenate([x0, x1]))
        ys = np.unique(np.concatenate([y0, y1]))
        union = 0
        if len(xs) > 1 and len(ys) > 1:
            # 2-D difference array over the compressed grid, then cumsum →
            # coverage counts; union = Σ cell areas with count > 0
            d = np.zeros((len(ys), len(xs)), np.int32)
            xi0 = np.searchsorted(xs, x0)
            xi1 = np.searchsorted(xs, x1)
            yi0 = np.searchsorted(ys, y0)
            yi1 = np.searchsorted(ys, y1)
            np.add.at(d, (yi0, xi0), 1)
            np.add.at(d, (yi0, xi1), -1)
            np.add.at(d, (yi1, xi0), -1)
            np.add.at(d, (yi1, xi1), 1)
            cov = d.cumsum(axis=0).cumsum(axis=1)[:-1, :-1] > 0
            cell_area = np.multiply.outer(np.diff(ys), np.diff(xs))
            union = int(cell_area[cov].sum())
        return pd.DataFrame(
            {
                group_col: [gv],
                "n_images": np.array([0], np.int64),
                "union_cells": np.array([union], np.int64),
                "sum_box_cells": np.array([sum_cells], np.int64),
            }
        )

    strips = boxes.groupby([group_col, "strip"]).map_groups(
        strip_union, batch_format="pandas"
    )
    merged = (
        pd.concat(
            [b.to_pandas() for b in strips.iter_batches(batch_format="pyarrow")
             if len(b)],
            ignore_index=True,
        )
        .groupby(group_col, sort=True)[["n_images", "union_cells", "sum_box_cells"]]
        .sum()
        .reset_index()
    )
    return rd.from_arrow(
        pa.table(
            {
                group_col: pa.array(merged[group_col].to_numpy(object), pa.string()),
                "n_images": pa.array(merged["n_images"].to_numpy(np.int64), pa.int64()),
                "union_cells": pa.array(
                    merged["union_cells"].to_numpy(np.int64), pa.int64()
                ),
                "sum_box_cells": pa.array(
                    merged["sum_box_cells"].to_numpy(np.int64), pa.int64()
                ),
            }
        )
    )


def scene_gaps(ds, *, group_col: str = "collection", ts_col: str = "datetime",
               id_col: str = "image_id"):
    """Per-group temporal gap analysis: the LAG-window rollup (max/min gap
    between consecutive scene timestamps) — revisit cadence per
    collection, the standard acquisition-QA query.

    Two-level seam merge, NOT a per-key ``map_groups`` (r02 verdict: one
    task holding a whole collection is the skewed-key straggler at 100×):
    sort by (group, ts) range-partitions the pairs, each map task folds
    the contiguous runs it sees into ONE mergeable partial per
    (batch, group) — (n, first, last, max_gap, min_gap) — and the driver
    merges only the O(batches × groups-per-batch) seam rows, where the
    seam gap is ``next.first − prev.last``. A 99%-of-rows group spreads
    across every range partition. All gaps are int64 epoch-ms (exact);
    gaps are diffs of the ts-sorted sequence, so the id tie-break in the
    SQL twin's ORDER BY (ts, id) cannot change them.
    """
    import ray.data as rd

    from .seam import check_sorted_batch, contiguous_run_bounds, preserve_order_execution

    def to_pairs(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy().astype("datetime64[ms]").astype(np.int64)
        return pa.table({"g": batch[group_col], "t": pa.array(ts, pa.int64())})

    _EMPTY = pa.schema(
        [("g", pa.string()), ("n", pa.int64()), ("first", pa.int64()),
         ("last", pa.int64()), ("maxg", pa.int64()), ("ming", pa.int64())]
    ).empty_table()

    def partial(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return _EMPTY
        g = np.asarray(batch["g"].to_pylist(), dtype=object)
        t = batch["t"].to_numpy()
        if not check_sorted_batch(g, t):
            raise RuntimeError("scene_gaps: batch not contiguous-sorted "
                               "(preserve_order violated)")
        bounds = contiguous_run_bounds(g)
        rows = {k: [] for k in ("g", "n", "first", "last", "maxg", "ming")}
        for s0, e0 in zip(bounds[:-1], bounds[1:]):
            tt = t[s0:e0]
            d = np.diff(tt)
            rows["g"].append(g[s0])
            rows["n"].append(e0 - s0)
            rows["first"].append(tt[0])
            rows["last"].append(tt[-1])
            rows["maxg"].append(int(d.max()) if len(d) else -1)
            rows["ming"].append(int(d.min()) if len(d) else -1)
        return pa.table(
            {
                "g": pa.array(rows["g"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "first": pa.array(rows["first"], pa.int64()),
                "last": pa.array(rows["last"], pa.int64()),
                "maxg": pa.array(rows["maxg"], pa.int64()),
                "ming": pa.array(rows["ming"], pa.int64()),
            }
        )

    pairs = ds.map_batches(to_pairs, batch_format="pyarrow")
    stream = pairs.sort(["g", "t"]).map_batches(partial, batch_format="pyarrow")
    with preserve_order_execution():
        parts = [
            b.to_pandas()
            for b in stream.iter_batches(batch_format="pyarrow")
            if len(b)
        ]
    out = {group_col: [], "n_scenes": [], "max_gap_ms": [], "min_gap_ms": []}
    if parts:
        df = pd.concat(parts, ignore_index=True).sort_values(
            ["g", "first", "last"], kind="mergesort"
        )
        for gv, sub in df.groupby("g", sort=True):
            first = sub["first"].to_numpy()
            last = sub["last"].to_numpy()
            if np.any(first[1:] < last[:-1]):
                raise RuntimeError("scene_gaps: overlapping partial ranges "
                                   "(contiguity violated)")
            gaps = np.concatenate(
                [sub.loc[sub["maxg"] >= 0, "maxg"].to_numpy(),
                 first[1:] - last[:-1]]
            )
            mins = np.concatenate(
                [sub.loc[sub["ming"] >= 0, "ming"].to_numpy(),
                 first[1:] - last[:-1]]
            )
            out[group_col].append(gv)
            out["n_scenes"].append(int(sub["n"].sum()))
            out["max_gap_ms"].append(int(gaps.max()) if len(gaps) else 0)
            out["min_gap_ms"].append(int(mins.min()) if len(mins) else 0)
    return rd.from_arrow(
        pa.table(
            {
                group_col: pa.array(out[group_col], pa.string()),
                "n_scenes": pa.array(out["n_scenes"], pa.int64()),
                "max_gap_ms": pa.array(out["max_gap_ms"], pa.int64()),
                "min_gap_ms": pa.array(out["min_gap_ms"], pa.int64()),
            }
        )
    )


def rolling_window_counts(ds, *, group_col: str = "collection",
                          ts_col: str = "datetime", id_col: str = "image_id",
                          window_ms: int = 7 * 86_400_000,
                          strategy: str = "seam"):
    """→ (id, group, n_in_window): per row, how many of its group's rows
    fall in the trailing ``window_ms`` (inclusive, RANGE-frame semantics:
    timestamp peers count regardless of tie order) — the rolling
    acquisition-rate feature, the LAG family's windowed sibling.

    ``strategy="seam"`` (default) is below; ``strategy="bucket"`` is the
    fully-distributed alternative for WIDE windows (window ≳ the time
    span of a sorted block): rows replicate into their own W-bucket as
    members and the next bucket as context, then a
    ``groupby(group, bucket)`` task computes exact counts — no driver
    involvement, group sizes bounded by bucket density, exactly the
    shape to pick when the seam path's context volume
    (O(batches × window density)) would flood the driver.

    Two-level seam design, NOT a per-key ``map_groups`` (r02 verdict #2):
    sort by (group, ts) range-partitions the triples; each contiguous
    batch resolves every row whose window lies inside its own group run
    with two vectorized searchsorted calls and streams it out directly.
    Only the seam rows reach the driver:

    - UNRESOLVED (kind 1): rows of the run touching the batch START whose
      window reaches before it (earlier batches may hold same-group rows
      in range), plus rows tied with the batch's LAST timestamp (a later
      batch may continue the tie — RANGE frames count all peers).
    - CONTEXT (kind 2): the batch's published seam neighborhoods — last-
      run rows within ``window_ms`` of the batch end (any later row's
      window can only reach that far back) and first-run rows tied with
      the batch's first timestamp (peers for earlier ties).

    The driver merge adds, per unresolved row, the in-range context rows
    from OTHER batches (its own batch is fully counted in its partial;
    ``bk`` = first id in the batch identifies it). Context volume is
    O(batches × window density), independent of key skew.
    """
    import ray.data as rd

    from .seam import check_sorted_batch, contiguous_run_bounds, preserve_order_execution

    if strategy == "bucket":
        W = int(window_ms)

        def explode(batch: pa.Table) -> pa.Table:
            ts = batch[ts_col].to_numpy().astype("datetime64[ms]").astype(np.int64)
            g = np.asarray(batch[group_col].to_pylist(), dtype=object)
            ids = np.asarray(batch[id_col].to_pylist(), dtype=object)
            b = ts // W
            return pa.table(
                {
                    group_col: pa.array(np.concatenate([g, g]), pa.string()),
                    "bucket": pa.array(np.concatenate([b, b + 1]), pa.int64()),
                    "t": pa.array(np.concatenate([ts, ts]), pa.int64()),
                    id_col: pa.array(np.concatenate([ids, ids]), pa.string()),
                    "member": pa.array(
                        np.concatenate([np.ones(len(g), bool),
                                        np.zeros(len(g), bool)])
                    ),
                }
            )

        def count_bucket(gdf: pd.DataFrame) -> pd.DataFrame:
            t_all = np.sort(gdf["t"].to_numpy())
            mem = gdf.loc[gdf["member"]]
            tm = mem["t"].to_numpy()
            # a member's window [t-W, t] spans exactly its own and the
            # previous bucket — both present in this group by replication
            n = np.searchsorted(t_all, tm, "right") - np.searchsorted(
                t_all, tm - W, "left"
            )
            return pd.DataFrame(
                {
                    id_col: mem[id_col].to_numpy(),
                    group_col: mem[group_col].to_numpy(),
                    "n_in_window": n.astype(np.int64),
                }
            )

        return (
            ds.map_batches(explode, batch_format="pyarrow")
            .groupby([group_col, "bucket"])
            .map_groups(count_bucket, batch_format="pandas")
        )
    if strategy != "seam":
        raise ValueError(f"unknown strategy {strategy!r}")

    out_schema = pa.schema(
        [(id_col, pa.string()), (group_col, pa.string()), ("n", pa.int64()),
         ("kind", pa.int8()), ("t", pa.int64()), ("bk", pa.string())]
    )

    def batch_proc(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return out_schema.empty_table()
        g = np.asarray(batch["g"].to_pylist(), dtype=object)
        t = batch["t"].to_numpy()
        ids = np.asarray(batch["i"].to_pylist(), dtype=object)
        if not check_sorted_batch(g, t):
            raise RuntimeError("rolling_window_counts: batch not "
                               "contiguous-sorted (preserve_order violated)")
        bk = str(ids[0])
        bounds = contiguous_run_bounds(g)
        partial = np.zeros(n, np.int64)
        unresolved = np.zeros(n, bool)
        context = np.zeros(n, bool)
        for s0, e0 in zip(bounds[:-1], bounds[1:]):
            tt = t[s0:e0]
            hi = np.searchsorted(tt, tt, side="right")
            lo = np.searchsorted(tt, tt - window_ms, side="left")
            partial[s0:e0] = hi - lo
            if s0 == 0:
                # run touches batch start: windows reaching before it are
                # incomplete; tied-with-first rows are peers for earlier ties
                unresolved[s0:e0] |= (tt - window_ms) <= tt[0]
                context[s0:e0] |= tt == tt[0]
            if e0 == n:
                # run touches batch end: publish the trailing window as
                # context; rows tied with the last ts may gain later peers
                unresolved[s0:e0] |= tt == t[n - 1]
                context[s0:e0] |= tt >= t[n - 1] - window_ms
        kind = np.zeros(n, np.int8)
        kind[unresolved] = 1
        parts = {
            id_col: [ids], group_col: [g], "n": [partial],
            "kind": [kind], "t": [t], "bk": [np.full(n, bk, object)],
        }
        ci = np.flatnonzero(context)
        if len(ci):
            parts[id_col].append(ids[ci])
            parts[group_col].append(g[ci])
            parts["n"].append(np.zeros(len(ci), np.int64))
            parts["kind"].append(np.full(len(ci), 2, np.int8))
            parts["t"].append(t[ci])
            parts["bk"].append(np.full(len(ci), bk, object))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(parts[id_col]), pa.string()),
                group_col: pa.array(np.concatenate(parts[group_col]), pa.string()),
                "n": pa.array(np.concatenate(parts["n"]), pa.int64()),
                "kind": pa.array(np.concatenate(parts["kind"]), pa.int8()),
                "t": pa.array(np.concatenate(parts["t"]), pa.int64()),
                "bk": pa.array(np.concatenate(parts["bk"]), pa.string()),
            }
        )

    def to_triples(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy().astype("datetime64[ms]").astype(np.int64)
        return pa.table(
            {"g": batch[group_col], "t": pa.array(ts, pa.int64()),
             "i": batch[id_col]}
        )

    triples = ds.map_batches(to_triples, batch_format="pyarrow")
    stream = triples.sort(["g", "t"]).map_batches(batch_proc, batch_format="pyarrow")
    # materialize ONCE (≈ input-sized): two consumers follow — the
    # distributed resolved stream and the tiny driver-side seam gather
    with preserve_order_execution():
        mat = stream.materialize()

    def resolved_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = b.filter(pc.equal(b["kind"], 0))
        return pa.table(
            {
                id_col: sel[id_col],
                group_col: sel[group_col],
                "n_in_window": sel["n"],
            }
        )

    resolved_ds = mat.map_batches(resolved_only, batch_format="pyarrow")

    def seam_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.not_equal(b["kind"], 0))

    seam_parts = [
        b.to_pandas()
        for b in mat.map_batches(seam_only, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if len(b)
    ]
    if not seam_parts:
        return resolved_ds
    seam = pd.concat(seam_parts, ignore_index=True)
    need = seam.loc[seam["kind"] == 1]
    if len(need) == 0:
        return resolved_ds
    # pool: every published neighborhood row, deduped by id (a row can be
    # head- and tail-context of the same tiny batch)
    pool = seam.loc[seam["kind"] == 2, [id_col, group_col, "t", "bk"]]
    pool = pool.drop_duplicates(id_col)
    fixed = {id_col: [], group_col: [], "n_in_window": []}
    for gv, sub in need.groupby(group_col, sort=False):
        p = pool.loc[pool[group_col] == gv]
        pt = np.sort(p["t"].to_numpy())
        rt = sub["t"].to_numpy()
        add = np.searchsorted(pt, rt, "right") - np.searchsorted(
            pt, rt - window_ms, "left"
        )
        # subtract own-batch context rows (already in the partial count)
        for bkv, bs in sub.groupby("bk", sort=False):
            own = np.sort(p.loc[p["bk"] == bkv, "t"].to_numpy())
            if len(own):
                bt = bs["t"].to_numpy()
                sel = sub["bk"].to_numpy() == bkv
                add[sel] -= np.searchsorted(own, bt, "right") - np.searchsorted(
                    own, bt - window_ms, "left"
                )
        fixed[id_col].append(sub[id_col].to_numpy(object))
        fixed[group_col].append(np.full(len(sub), gv, object))
        fixed["n_in_window"].append(sub["n"].to_numpy(np.int64) + add)
    tail = pa.table(
        {
            id_col: pa.array(np.concatenate(fixed[id_col]), pa.string()),
            group_col: pa.array(np.concatenate(fixed[group_col]), pa.string()),
            "n_in_window": pa.array(
                np.concatenate(fixed["n_in_window"]).astype(np.int64), pa.int64()
            ),
        }
    )
    return resolved_ds.union(rd.from_arrow(tail))


def daily_counts_filled(ds, *, group_col: str = "collection",
                        ts_col: str = "datetime"):
    """→ (group, day, n_scenes): scenes per day per group with ZERO-FILLED
    gaps between each group's first and last day — the resample/gap-fill
    step every acquisition-cadence dashboard needs (a bare groupby hides
    the empty days, which are the signal).

    Per-batch partial: int64 epoch-day counts (combiner state ≤ groups ×
    days); driver merge + one np.arange fill per group. Day is emitted as
    a ms timestamp (== SQL date_trunc('day', ...)).
    """
    def partial(batch: pa.Table) -> pa.Table:
        dt = batch[ts_col].to_numpy().astype("datetime64[ms]").astype(np.int64)
        day = dt // 86_400_000
        grp = np.asarray(batch[group_col].to_pylist(), dtype=object)
        df = pd.DataFrame({"g": grp, "d": day})
        c = df.groupby(["g", "d"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "g": pa.array(c["g"].to_numpy(), pa.string()),
                "d": pa.array(c["d"].to_numpy(), pa.int64()),
                "n": pa.array(c["n"].to_numpy(), pa.int64()),
            }
        )

    import ray.data as rd

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if len(b)
    ]
    out = {group_col: [], "day": [], "n_scenes": []}
    if parts:
        merged = (
            pd.concat(parts, ignore_index=True)
            .groupby(["g", "d"], sort=True)["n"]
            .sum()
            .reset_index()
        )
        for g, sub in merged.groupby("g", sort=True):
            days = np.arange(sub["d"].min(), sub["d"].max() + 1)
            n = np.zeros(len(days), np.int64)
            n[sub["d"].to_numpy() - days[0]] = sub["n"].to_numpy()
            out[group_col].extend([g] * len(days))
            out["day"].extend((days * 86_400_000).tolist())
            out["n_scenes"].extend(n.tolist())
    return rd.from_arrow(
        pa.table(
            {
                group_col: pa.array(out[group_col], pa.string()),
                "day": pa.array(out["day"], pa.int64()).cast(pa.timestamp("ms")),
                "n_scenes": pa.array(out["n_scenes"], pa.int64()),
            }
        )
    )


def collection_summaries(
    ds,
    *,
    ranges: tuple[str, ...] = (),
    sets: tuple[str, ...] = (),
    group_col: str = "collection",
    max_distinct: int = 25,
    on_overflow: str = "drop",
):
    """→ long table (collection, property, kind, minimum, maximum, value):
    the STAC ``Collection.summaries`` map derived from the items.

    The reference declares the field — ``summaries: Option<Map<String,
    Value>>``, "either a set of values or a range of values"
    (crates/core/src/collection.rs:100-103) — but never derives it; this
    stage is the autogen, the per-property companion of the extent autogen
    (collection.rs:270-276 / ``collection_extents``).

    Scale shape (combiner-first, like ``collection_extents``): each block
    folds to per-(collection, property) partial min/max rows and per-block
    DISTINCT value rows, so the ``groupby`` shuffles carry partials
    bounded by collections × properties × distinct values — never items.
    ``kind='range'`` rows carry (minimum, maximum); ``kind='set'`` rows
    carry one stringified ``value`` each (ints/strings only — float
    formatting is locale-fragile). Sets exceeding ``max_distinct`` are
    dropped (``on_overflow='drop'``, the STAC "keep summaries small"
    guidance) or raise (``'error'``). Nulls never summarize.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    if not ranges and not sets:
        raise ValueError("need at least one property in ranges= or sets=")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for p in ranges:
            v = pd.to_numeric(df[p], errors="coerce")
            g = (
                pd.DataFrame({group_col: df[group_col], "_v": v})
                .dropna()
                .groupby(group_col, sort=False)["_v"]
                .agg(["min", "max"])
                .reset_index()
            )
            outs.append(
                pd.DataFrame(
                    {
                        group_col: g[group_col],
                        "property": p,
                        "minimum": g["min"].astype(np.float64),
                        "maximum": g["max"].astype(np.float64),
                    }
                )
            )
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(
                {group_col: [], "property": [], "minimum": [], "maximum": []}
            )
        )

    _POISON = "\x00__overflow__"

    def partial_sets(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for p in sets:
            sub = df[[group_col, p]].dropna().drop_duplicates()
            vals = sub[p]
            # ints must stringify without a float suffix even when pandas
            # promoted a nullable int column to float — but only when the
            # values really are integral: blindly casting truncated
            # genuinely fractional sets (0.5 and 0.9 both became "0"),
            # silently merging distinct values
            if vals.dtype.kind == "f":
                vn = vals.to_numpy()
                if not np.all(vn == np.floor(vn)):
                    raise ValueError(
                        f"collection_summaries: set property {p!r} has "
                        "non-integral float values — set summaries are "
                        "defined for integer/string properties (use a "
                        "range summary for continuous values)"
                    )
                vals = vals.astype(np.int64)
            part = pd.DataFrame(
                {
                    group_col: sub[group_col].to_numpy(),
                    "property": p,
                    "value": vals.astype(str).to_numpy(),
                }
            )
            # scale guard: a (group, property) whose distinct count
            # already exceeds max_distinct INSIDE one block can never
            # survive globally (block distinct ≤ global distinct), so
            # emit a single poison marker instead of shuffling an
            # unbounded value set — the partial stream stays bounded by
            # groups × properties × max_distinct per block
            sizes = part.groupby(group_col, sort=False)["value"].transform("size")
            over = sizes > max_distinct
            if over.any():
                poisoned = part.loc[over, [group_col]].drop_duplicates()
                part = pd.concat(
                    [
                        part.loc[~over],
                        pd.DataFrame(
                            {
                                group_col: poisoned[group_col].to_numpy(),
                                "property": p,
                                "value": _POISON,
                            }
                        ),
                    ],
                    ignore_index=True,
                )
            outs.append(part)
        return (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame({group_col: [], "property": [], "value": []})
        )

    frames = []
    if ranges:
        rr = (
            ds.map_batches(partial, batch_format="pandas")
            .groupby([group_col, "property"])
            .aggregate(
                Min("minimum", alias_name="minimum"),
                Max("maximum", alias_name="maximum"),
            )
            .to_pandas()
        )
        rr["kind"] = "range"
        rr["value"] = pd.array([None] * len(rr), dtype="string")
        frames.append(rr)
    if sets:
        ss = (
            ds.map_batches(partial_sets, batch_format="pandas")
            .groupby([group_col, "property", "value"])
            .aggregate(Count())
            .to_pandas()[[group_col, "property", "value"]]
        )
        n = ss.groupby([group_col, "property"])["value"].transform("size")
        poisoned = ss.groupby([group_col, "property"])["value"].transform(
            lambda v: (v == _POISON).any()
        )
        bad = (n > max_distinct) | poisoned
        over = ss.loc[bad, [group_col, "property"]].drop_duplicates()
        if len(over):
            if on_overflow == "error":
                raise ValueError(
                    f"summaries over max_distinct={max_distinct}: "
                    f"{over.to_records(index=False).tolist()}"
                )
            ss = ss.loc[~bad]
        ss["kind"] = "set"
        ss["minimum"] = np.nan
        ss["maximum"] = np.nan
        frames.append(ss)
    cols = [group_col, "property", "kind", "minimum", "maximum", "value"]
    out = pd.concat(frames, ignore_index=True)[cols]
    out["value"] = out["value"].astype(object).where(out["value"].notna(), None)
    return rd.from_arrow(
        pa.table(
            {
                group_col: pa.array(out[group_col], pa.string()),
                "property": pa.array(out["property"], pa.string()),
                "kind": pa.array(out["kind"], pa.string()),
                "minimum": pa.array(out["minimum"], pa.float64()),
                "maximum": pa.array(out["maximum"], pa.float64()),
                "value": pa.array(out["value"].tolist(), pa.string()),
            }
        )
    )


def summaries_dict(df: "pd.DataFrame", *, group_col: str = "collection") -> dict:
    """Pivot the long summaries table into the STAC JSON shape:
    {collection: {property: {"minimum": x, "maximum": y} | [v, ...]}}."""
    out: dict = {}
    for (coll, prop), g in df.groupby([group_col, "property"], sort=True):
        d = out.setdefault(coll, {})
        if g["kind"].iloc[0] == "range":
            d[prop] = {
                "minimum": float(g["minimum"].iloc[0]),
                "maximum": float(g["maximum"].iloc[0]),
            }
        else:
            d[prop] = sorted(g["value"].tolist())
    return out


def rollup_counts(
    ds,
    group_cols: "list[str]",
    *,
    agg_col: "str | None" = None,
):
    """ROLLUP over ``group_cols`` (the warehouse GROUPING SETS
    hierarchy): one result row per prefix level — (a, b, …), (a, …),
    …, () — with ``n`` row counts and, when ``agg_col`` is given,
    ``sum_{agg_col}``. Absent levels carry NULL group keys plus a
    ``grouping`` bitmask (DuckDB/Spark convention: bit i set ⇔ column i
    is aggregated away, so the twin is GROUP BY ROLLUP + GROUPING()).

    Scale shape: ONE pass of per-batch partials — each batch emits every
    level's partial counts at once (levels+1 tiny pandas groupbys over
    an in-memory batch) — then a single groupby over (level keys) folds
    them. The exchange carries the union of the level cardinalities,
    never the corpus; no per-level rescans of the input.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    k = len(group_cols)
    if k == 0:
        raise ValueError("rollup_counts: need >= 1 group column")

    def _sentinel_for(s: "pd.Series"):
        # validated dtype -> in-band fill value; the null-marker bitmask
        # below keeps genuine sentinel values and filled nulls in
        # DISTINCT groups, so collision is impossible
        if s.dtype == object or pd.api.types.is_string_dtype(s):
            return ""
        if pd.api.types.is_bool_dtype(s):
            return False
        if pd.api.types.is_datetime64_any_dtype(s):
            return pd.Timestamp(0, tz=getattr(s.dtype, "tz", None))
        if pd.api.types.is_numeric_dtype(s):
            return 0
        raise TypeError(
            f"rollup_counts: unsupported group-column dtype {s.dtype} "
            f"for {s.name!r} (string/bool/datetime/numeric supported)"
        )

    def partial(b: pa.Table) -> "pd.DataFrame":
        df = b.select(
            group_cols + ([agg_col] if agg_col else [])
        ).to_pandas()
        # GENUINE nulls in group columns never reach Ray's sort-based
        # groupby (it cannot order null-vs-value keys): pre-fill them
        # with the level sentinel and carry a null-marker bitmask that
        # joins the group key (bit i set <=> group_cols[i] was null) —
        # SQL's NULL-is-one-group semantics, restored in finish()
        sentinels = {c: _sentinel_for(df[c]) for c in group_cols}
        nullmask = np.zeros(len(df), np.int64)
        for i, c in enumerate(group_cols):
            isna = df[c].isna().to_numpy()
            if isna.any():
                nullmask |= np.where(isna, np.int64(1 << i), np.int64(0))
                df[c] = df[c].fillna(sentinels[c])
        df["_nm_all"] = nullmask
        outs = []
        for lvl in range(k, -1, -1):  # k = finest, 0 = grand total
            keep = group_cols[:lvl]
            g = df.copy()
            # null bits of rolled-away columns leave the key
            g["_nm"] = g["_nm_all"] & np.int64((1 << lvl) - 1)
            g["_one"] = np.int64(1)
            agg = {"_n": ("_one", "sum")}
            if agg_col:
                agg[f"sum_{agg_col}"] = (agg_col, "sum")
            if keep:
                p = g.groupby(keep + ["_nm"], as_index=False).agg(**agg)
            else:
                p = pd.DataFrame({"_n": [len(g)]})
                p["_nm"] = np.int64(0)
                if agg_col:
                    p[f"sum_{agg_col}"] = g[agg_col].sum()
            for c in group_cols[lvl:]:
                # sentinel (not None): Ray's sort-based groupby cannot
                # order null-vs-value keys; the grouping mask is part of
                # the group key, so sentinels can never collide with
                # genuine values of a DIFFERENT level
                p[c] = sentinels[c]
            # bitmask: bit i set <=> group_cols[i] aggregated away
            p["grouping"] = np.int64(sum(1 << i for i in range(lvl, k)))
            outs.append(p)
        out = pd.concat(outs, ignore_index=True)
        return out[group_cols + ["grouping", "_nm", "_n"]
                   + ([f"sum_{agg_col}"] if agg_col else [])]

    aggs = [Sum("_n", alias_name="n")]
    if agg_col:
        aggs.append(Sum(f"sum_{agg_col}", alias_name=f"sum_{agg_col}"))
    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_cols + ["grouping", "_nm"])
        .aggregate(*aggs)
    )

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = b["grouping"].cast(pa.int64())
        nm = b["_nm"].cast(pa.int64())
        cols = {}
        for i, c in enumerate(group_cols):
            bit = pa.scalar(1 << i, pa.int64())
            zero = pa.scalar(0, pa.int64())
            rolled = pc.not_equal(pc.bit_wise_and(mask, bit), zero)
            was_null = pc.not_equal(pc.bit_wise_and(nm, bit), zero)
            cols[c] = pc.if_else(
                pc.or_(rolled, was_null), pa.scalar(None, b[c].type), b[c]
            )
        cols["grouping"] = mask
        cols["n"] = b["n"].cast(pa.int64())
        if agg_col:
            cols[f"sum_{agg_col}"] = b[f"sum_{agg_col}"]
        return pa.table(cols)

    return folded.map_batches(finish, batch_format="pyarrow")
