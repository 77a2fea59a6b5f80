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

__all__ = ["collection_extents", "global_extent", "grouped_topk"]

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
