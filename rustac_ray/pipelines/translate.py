"""Translate / crawl pipelines (SURVEY.md §3.1, K5).

``translate``: read (format-inferred) → optional migrate → write — the Ray
re-expression of `rustac translate IN OUT --migrate` (cli/src/lib.rs:382-413):
the streamable path is the Dataset pipeline itself; the frozen-schema rule
(geoarrow/mod.rs:115-126) becomes the unified Arrow schema of the read.

``crawl_write``: group items by collection and write one partition per
collection (cli/src/lib.rs:571-609 writes one file per collection) via
``write_parquet(partition_cols=["collection"])`` — resumable layout: each
collection directory is an independent unit of completion.
"""

from __future__ import annotations

from ..sources import io as rio
from ..stages.items import migrate_items

__all__ = ["translate", "crawl_write"]


def translate(
    in_path: str,
    out_path: str,
    *,
    in_fmt: str | None = None,
    out_fmt: str | None = None,
    migrate: bool = False,
    to_version: str = "1.1.0",
):
    ds = rio.read_items(in_path, fmt=in_fmt)
    if migrate:
        ds = ds.map_batches(
            lambda b: migrate_items(b, to_version), batch_format="pandas"
        )
    rio.write_items(ds, out_path, fmt=out_fmt)
    return out_path


def crawl_write(ds, out_dir: str):
    """Partition items by collection on disk (one dir per collection)."""
    ds.write_parquet(
        out_dir,
        partition_cols=["collection"],
        compression=rio.COMPRESSION,
        row_group_size=rio.ROW_GROUP_SIZE,
    )
    return out_dir
