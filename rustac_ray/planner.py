"""Source/Sink protocols + QuerySpec → Dataset planner hook (SURVEY.md §2.10).

The reference exposes a ``Backend`` trait (server/src/backend/mod.rs:20) and
four client traits; the Ray-native analogue is two small protocols plus a
pluggable planner: a Source yields a Dataset for a table name, a Sink
consumes one, and ``Planner.plan`` compiles a QuerySpec against a Source —
users swap Sources (parquet dir, ndjson dir, in-memory) without touching
query code.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from .query import QuerySpec, search

__all__ = ["Source", "Sink", "ParquetSource", "ParquetSink", "Planner"]


@runtime_checkable
class Source(Protocol):
    def dataset(self, table: str): ...  # → ray.data.Dataset


@runtime_checkable
class Sink(Protocol):
    def write(self, ds, table: str) -> None: ...


class ParquetSource:
    """Directory-of-parquet Source: ``<root>/<table>.parquet`` or
    ``<root>/<table>/`` (partitioned)."""

    def __init__(self, root: str, columns: dict[str, list[str]] | None = None):
        self.root = root
        self.columns = columns or {}

    def dataset(self, table: str):
        import os

        import ray.data as rd

        base = os.path.join(self.root, table)
        path = base + ".parquet" if os.path.exists(base + ".parquet") else base
        kwargs = {}
        if table in self.columns:
            kwargs["columns"] = self.columns[table]
        return rd.read_parquet(path, **kwargs)


class ParquetSink:
    def __init__(self, root: str, partition_cols: list[str] | None = None):
        self.root = root
        self.partition_cols = partition_cols

    def write(self, ds, table: str) -> None:
        import os

        kwargs = {"compression": "zstd", "row_group_size": 150_000}
        if self.partition_cols:
            kwargs["partition_cols"] = self.partition_cols
        ds.write_parquet(os.path.join(self.root, table), **kwargs)


class Planner:
    """QuerySpec → Dataset against a Source; the single entry point a
    reference user would swap their `rustac search` calls for."""

    def __init__(self, source: Source, items_table: str = "stac_items"):
        self.source = source
        self.items_table = items_table

    def plan(self, spec: QuerySpec):
        return search(self.source.dataset(self.items_table), spec)
