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

__all__ = ["collection_extents", "coverage_area", "scene_gaps", "rolling_window_counts", "daily_counts_filled", "global_extent", "grouped_topk"]

_PARTIAL_COLS = ["collection", "xmin", "ymin", "xmax", "ymax", "start", "end", "n_items"]


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


def coverage_area(ds, *, group_col: str = "collection", quantum: float = 1e-6):
    """Per-group dissolve: exact union area of footprint boxes, in integer
    ``quantum``-degree cells (µdeg² by default).

    The GIS ``ST_Union → ST_Area`` rollup for axis-aligned footprints.
    Coordinates are snapped with ``floor(x / quantum)`` — floor is
    bit-deterministic for any float (unlike half-even rounding near .5),
    so engine and oracle agree exactly — and every output is an int64
    (union cells, sum of individual box cells, image count): order-
    independent exact, no float summation anywhere.

    Scale shape: the per-batch partial ships 4 int64s per image (the
    quantized box), never pixels or payloads; the union itself runs per
    group in ``map_groups`` as a 2-D difference-array + cumsum over the
    coordinate-compressed grid — O(n log n + cells), not O(n²). The
    shuffle therefore moves metadata only; group cardinality is the
    collection count. (At petabyte image counts, pre-union per spatial
    tile before the per-collection pass — same operator, two levels.)
    """
    import ray.data as rd

    from .footprint import derive_footprints

    q = float(quantum)

    def partial(batch: pa.Table) -> pa.Table:
        batch = derive_footprints(batch)
        return pa.table(
            {
                group_col: batch[group_col],
                "x0": pa.array(np.floor(batch["fp_xmin"].to_numpy() / q).astype(np.int64)),
                "y0": pa.array(np.floor(batch["fp_ymin"].to_numpy() / q).astype(np.int64)),
                "x1": pa.array(np.floor(batch["fp_xmax"].to_numpy() / q).astype(np.int64)),
                "y1": pa.array(np.floor(batch["fp_ymax"].to_numpy() / q).astype(np.int64)),
            }
        )

    boxes = ds.map_batches(partial, batch_format="pyarrow")

    def union_area(g: pd.DataFrame) -> pd.DataFrame:
        x0 = g["x0"].to_numpy()
        y0 = g["y0"].to_numpy()
        x1 = g["x1"].to_numpy()
        y1 = g["y1"].to_numpy()
        # degenerate (zero-cell) boxes contribute nothing to either sum
        keep = (x1 > x0) & (y1 > y0)
        box_cells = (x1 - x0) * (y1 - y0)
        sum_cells = int(box_cells[keep].sum())
        xs = np.unique(np.concatenate([x0[keep], x1[keep]]))
        ys = np.unique(np.concatenate([y0[keep], y1[keep]]))
        union = 0
        if len(xs) > 1 and len(ys) > 1:
            # 2-D difference array over the compressed grid, then cumsum →
            # coverage counts; union = Σ cell areas with count > 0
            d = np.zeros((len(ys), len(xs)), np.int32)
            xi0 = np.searchsorted(xs, x0[keep])
            xi1 = np.searchsorted(xs, x1[keep])
            yi0 = np.searchsorted(ys, y0[keep])
            yi1 = np.searchsorted(ys, y1[keep])
            np.add.at(d, (yi0, xi0), 1)
            np.add.at(d, (yi0, xi1), -1)
            np.add.at(d, (yi1, xi0), -1)
            np.add.at(d, (yi1, xi1), 1)
            cov = d.cumsum(axis=0).cumsum(axis=1)[:-1, :-1] > 0
            cell_area = np.multiply.outer(np.diff(ys), np.diff(xs))
            union = int(cell_area[cov].sum())
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "n_images": np.array([len(g)], np.int64),
                "union_cells": np.array([union], np.int64),
                "sum_box_cells": np.array([sum_cells], np.int64),
            }
        )

    return boxes.groupby(group_col).map_groups(union_area, batch_format="pandas")


def scene_gaps(ds, *, group_col: str = "collection", ts_col: str = "datetime",
               id_col: str = "image_id"):
    """Per-group temporal gap analysis: the LAG-window rollup (max/min gap
    between consecutive scene timestamps, tie-ordered by id) — revisit
    cadence per collection, the standard acquisition-QA query.

    Shuffle ships only (group, ts, id) triples; the in-group sort runs on
    int64 epoch-ms inside ``map_groups``. All outputs are int64 (exact).
    At billion-scene groups, pre-sort partials per batch and merge gap
    candidates instead (gaps can only occur at batch seams after a
    range partition by ts — same two-level trick as coverage_area).
    """
    import ray.data as rd  # noqa: F401  (documented alternative path)

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy().astype("datetime64[ms]").astype(np.int64)
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, ts))
        d = np.diff(ts[order])
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "n_scenes": np.array([len(g)], np.int64),
                "max_gap_ms": np.array([d.max() if len(d) else 0], np.int64),
                "min_gap_ms": np.array([d.min() if len(d) else 0], np.int64),
            }
        )

    cols = ds.map_batches(
        lambda b: b.select([group_col, ts_col, id_col]),
        batch_format="pyarrow",
    )
    return cols.groupby(group_col).map_groups(gaps, batch_format="pandas")


def rolling_window_counts(ds, *, group_col: str = "collection",
                          ts_col: str = "datetime", id_col: str = "image_id",
                          window_ms: int = 7 * 86_400_000):
    """→ (id, group, n_in_window): per row, how many of its group's rows
    fall in the trailing ``window_ms`` (inclusive, RANGE-frame semantics:
    timestamp peers count regardless of tie order) — the rolling
    acquisition-rate feature, the LAG family's windowed sibling.

    Per-group work is two vectorized searchsorted calls on the sorted
    int64 timestamps; the shuffle ships only (group, ts, id) triples.
    """
    def roll(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy().astype("datetime64[ms]").astype(np.int64)
        order = np.argsort(ts, kind="mergesort")
        st = ts[order]
        hi_i = np.searchsorted(st, ts, side="right")
        lo_i = np.searchsorted(st, ts - window_ms, side="left")
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                group_col: g[group_col].to_numpy(),
                "n_in_window": (hi_i - lo_i).astype("int64"),
            }
        )

    cols = ds.map_batches(
        lambda b: b.select([group_col, ts_col, id_col]), batch_format="pyarrow"
    )
    return cols.groupby(group_col).map_groups(roll, batch_format="pandas")


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
