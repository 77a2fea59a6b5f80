"""Extension registry (SURVEY.md §2.10).

The reference's ``Extensions`` trait (crates/extensions/src/lib.rs:85-203)
reads/writes prefix-namespaced field groups (``proj:*``, ``eo:*``,
``raster:*``) on items. The columnar analogue: an extension is a NAMESPACE
of columns plus an optional enrichment transform; the registry applies
transforms as ``map_batches`` stages and offers vectorized get/set/remove
of whole namespaces (the reference's add/remove semantics,
extensions/lib.rs:160-203).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

__all__ = ["Extension", "ExtensionRegistry", "PROJECTION", "EO"]


class Extension:
    def __init__(self, prefix: str, transform: Callable[[pa.Table], pa.Table] | None = None):
        self.prefix = prefix
        self.transform = transform

    def columns(self, schema_names) -> list[str]:
        return [c for c in schema_names if c.startswith(self.prefix + ":")]


class ExtensionRegistry:
    def __init__(self):
        self._by_prefix: dict[str, Extension] = {}

    def register(self, ext: Extension) -> "ExtensionRegistry":
        self._by_prefix[ext.prefix] = ext
        return self

    def get(self, prefix: str) -> Extension | None:
        return self._by_prefix.get(prefix)

    def has_extension(self, table_or_names, prefix: str) -> bool:
        names = (
            table_or_names.column_names
            if hasattr(table_or_names, "column_names")
            else list(table_or_names)
        )
        return any(c.startswith(prefix + ":") for c in names)

    def remove_namespace(self, batch: pa.Table, prefix: str) -> pa.Table:
        """Drop all ``prefix:*`` columns (reference remove, lib.rs:171-187)."""
        keep = [c for c in batch.column_names if not c.startswith(prefix + ":")]
        return batch.select(keep)

    def apply(self, ds, prefixes: list[str] | None = None):
        """Run registered enrichment transforms as map_batches stages."""
        for prefix, ext in self._by_prefix.items():
            if prefixes is not None and prefix not in prefixes:
                continue
            if ext.transform is not None:
                ds = ds.map_batches(ext.transform, batch_format="pyarrow")
        return ds


def _project_footprints(batch: pa.Table) -> pa.Table:
    """Projection-extension enrichment: derive footprint columns from
    (w, h, transform) — the proj:shape/proj:transform semantics
    (crates/extensions/src/projection.rs:36-43)."""
    from .stages.footprint import derive_footprints

    return derive_footprints(batch)


PROJECTION = Extension("proj", _project_footprints)
EO = Extension("eo")  # namespace-only (eo:cloud_cover etc. carried flat)
