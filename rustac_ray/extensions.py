"""Extension registry + typed extension accessors (SURVEY.md §2.10).

The reference's ``Extensions`` trait (crates/extensions/src/lib.rs:85-203)
reads/writes prefix-namespaced field groups (``proj:*``, ``eo:*``,
``raster:*``) on items. The columnar analogue: an extension is a NAMESPACE
of columns plus an optional enrichment transform; the registry applies
transforms as ``map_batches`` stages and offers vectorized get/set/remove
of whole namespaces (the reference's add/remove semantics,
extensions/lib.rs:160-203).

Typed accessors mirror the reference's concrete extension structs —
Projection (crates/extensions/src/projection.rs:10-44), Raster
(raster.rs:19-82 Band fields), ElectroOptical (electro_optical.rs:14-66),
Authentication (authentication.rs:13-24) — as Arrow field groups:

- ``has_extension(batch, PROJECTION_EXT)`` → per-row bool from the
  ``stac_extensions`` URI list (lib.rs:116-130: matches on
  ``identifier_prefix()``, i.e. version-insensitive).
- ``get_extension(batch, EO_EXT)`` → the namespace hydrated as a typed
  sub-table (prefix stripped, cast to the extension's declared dtypes) —
  the columnar ``item.extension::<E>()`` (lib.rs:132-146).
- ``set_extension(batch, E, {field: array|scalar})`` → replaces the
  namespace and appends ``E.identifier`` to every row's
  ``stac_extensions`` (lib.rs:160-183: push + dedup + replace fields).
- ``remove_extension(batch, E)`` → drops the namespace columns AND
  filters matching URIs out of ``stac_extensions`` (lib.rs:185-203).

All four are pure ``pa.Table -> value`` kernels usable directly inside
``map_batches(batch_format="pyarrow")``; list surgery is offset-vectorized
(no per-row Python in the URI filter/append paths).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "Extension",
    "ExtensionRegistry",
    "PROJECTION",
    "EO",
    "TypedExtension",
    "PROJECTION_EXT",
    "RASTER_EXT",
    "EO_EXT",
    "AUTH_EXT",
    "has_extension",
    "get_extension",
    "set_extension",
    "remove_extension",
    "add_extension",
]


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


# ---------------------------------------------------------------------------
# Typed extensions (reference crates/extensions/src/{projection,raster,
# electro_optical,authentication}.rs). Each is a declared Arrow field group;
# the accessors below are the columnar analogue of the Extensions trait.
# ---------------------------------------------------------------------------

_EXT_LIST_COL = "stac_extensions"


class TypedExtension:
    """A typed field group: schema URI + prefix + per-field Arrow dtypes.

    ``identifier_prefix`` mirrors lib.rs:68-83 — everything up to (and
    including) the path segment after the stac-extensions.github.io host,
    so matching is version-insensitive.
    """

    _HOST = "https://stac-extensions.github.io/"

    def __init__(self, identifier: str, prefix: str, fields: Mapping[str, pa.DataType]):
        if not identifier.startswith(self._HOST):
            raise ValueError("all identifiers live under stac-extensions.github.io (lib.rs:60)")
        self.identifier = identifier
        self.prefix = prefix
        self.fields = dict(fields)

    @property
    def identifier_prefix(self) -> str:
        rest = self.identifier[len(self._HOST):]
        seg = rest.split("/", 1)[0]
        return self._HOST + seg + "/"

    def column(self, field: str) -> str:
        return f"{self.prefix}:{field}"

    def namespace_columns(self, names) -> list[str]:
        pre = self.prefix + ":"
        return [c for c in names if c.startswith(pre)]


_CENTROID_T = pa.struct([pa.field("lat", pa.float64()), pa.field("lon", pa.float64())])

# projection.rs:10-44 (v2.0.0 uses `code`; projjson carried as a JSON string
# column — the columnar stand-in for serde_json::Map).
PROJECTION_EXT = TypedExtension(
    "https://stac-extensions.github.io/projection/v2.0.0/schema.json",
    "proj",
    {
        "code": pa.string(),
        "wkt2": pa.string(),
        "projjson": pa.string(),
        "geometry": pa.binary(),  # WKB (engine-wide geometry carrier)
        "bbox": pa.list_(pa.float64()),
        "centroid": _CENTROID_T,
        "shape": pa.list_(pa.int64()),
        "transform": pa.list_(pa.float64()),
    },
)

_RASTER_STATS_T = pa.struct(
    [
        pa.field("minimum", pa.float64()),
        pa.field("maximum", pa.float64()),
        pa.field("mean", pa.float64()),
        pa.field("stddev", pa.float64()),
        pa.field("valid_percent", pa.float64()),
    ]
)
_RASTER_HIST_T = pa.struct(
    [
        pa.field("count", pa.int64()),
        pa.field("min", pa.float64()),
        pa.field("max", pa.float64()),
        pa.field("buckets", pa.list_(pa.int64())),
    ]
)
_RASTER_BAND_T = pa.struct(
    [
        pa.field("nodata", pa.float64()),
        pa.field("sampling", pa.string()),  # "area" | "point" (raster.rs:90-99)
        pa.field("data_type", pa.string()),
        pa.field("bits_per_sample", pa.int64()),
        pa.field("spatial_resolution", pa.float64()),
        pa.field("statistics", _RASTER_STATS_T),
        pa.field("unit", pa.string()),
        pa.field("scale", pa.float64()),
        pa.field("offset", pa.float64()),
        pa.field("histogram", _RASTER_HIST_T),
    ]
)

# raster.rs:19-82 — bands: Vec<Band>.
RASTER_EXT = TypedExtension(
    "https://stac-extensions.github.io/raster/v1.1.0/schema.json",
    "raster",
    {"bands": pa.list_(_RASTER_BAND_T)},
)

_EO_BAND_T = pa.struct(
    [
        pa.field("name", pa.string()),
        pa.field("common_name", pa.string()),
        pa.field("description", pa.string()),
        pa.field("center_wavelength", pa.float64()),
        pa.field("full_width_half_max", pa.float64()),
        pa.field("solar_illumination", pa.float64()),
    ]
)

# electro_optical.rs:14-66.
EO_EXT = TypedExtension(
    "https://stac-extensions.github.io/eo/v1.1.0/schema.json",
    "eo",
    {
        "bands": pa.list_(_EO_BAND_T),
        "cloud_cover": pa.float64(),
        "snow_cover": pa.float64(),
    },
)

# authentication.rs:13-24 — schemes is an IndexMap<String, Scheme> of openly
# extensible OpenAPI security objects; columnar carrier is a JSON string
# (the same trade the stac-geoparquet spec makes for free-form objects).
AUTH_EXT = TypedExtension(
    "https://stac-extensions.github.io/authentication/v1.1.0/schema.json",
    "auth",
    {"schemes": pa.string(), "refs": pa.list_(pa.string())},
)


def _uri_list(batch: pa.Table) -> pa.ChunkedArray | pa.Array:
    if _EXT_LIST_COL not in batch.column_names:
        raise KeyError(f"batch has no {_EXT_LIST_COL!r} column")
    col = batch.column(_EXT_LIST_COL)
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def has_extension(batch: pa.Table, ext: TypedExtension) -> pa.BooleanArray:
    """Per-row: does ``stac_extensions`` contain a URI under
    ``ext.identifier_prefix``? (lib.rs:116-130)."""
    col = _uri_list(batch)
    flat = pc.list_flatten(col)
    hit = pc.starts_with(flat, ext.identifier_prefix)
    parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    out = np.zeros(len(batch), dtype=bool)
    hits = hit.to_numpy(zero_copy_only=False)
    if hits.dtype == object:  # nulls present
        hits = np.asarray([bool(h) for h in hits])
    np.logical_or.at(out, parent, hits)
    return pa.array(out)


def get_extension(batch: pa.Table, ext: TypedExtension, strict: bool = True) -> pa.Table:
    """Hydrate the extension's namespace as a typed sub-table (prefix
    stripped, cast to the declared dtypes) — ``item.extension::<E>()``
    (lib.rs:132-146). Unknown ``prefix:*`` columns pass through untyped;
    with ``strict`` a declared column that can't cast raises (the serde
    deserialization error analogue)."""
    pre = ext.prefix + ":"
    cols, names = [], []
    for c in batch.column_names:
        if not c.startswith(pre):
            continue
        bare = c[len(pre):]
        arr = batch.column(c)
        want = ext.fields.get(bare)
        if want is not None and arr.type != want:
            try:
                arr = arr.cast(want)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                if strict:
                    raise
        cols.append(arr)
        names.append(bare)
    return pa.table(dict(zip(names, cols))) if names else pa.table({})


def _append_uri(batch: pa.Table, uri: str) -> pa.Table:
    """Append ``uri`` to every row's list iff not already present
    (lib.rs:160-162 push + dedup, made idempotent). Offset-vectorized."""
    col = _uri_list(batch)
    flat = pc.list_flatten(col)
    present_flat = pc.equal(flat, uri)
    parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    n = len(batch)
    present = np.zeros(n, dtype=bool)
    pf = present_flat.to_numpy(zero_copy_only=False)
    if pf.dtype == object:
        pf = np.asarray([bool(x) for x in pf])
    np.logical_or.at(present, parent, pf)

    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    lengths = np.where(np.isnan(lengths.astype(float)), 0, lengths).astype(np.int64)
    new_lengths = lengths + (~present).astype(np.int64)
    new_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(new_lengths, out=new_offsets[1:])

    old_vals = flat.to_pylist()
    # scatter old values then fill the appended slot per row lacking the uri
    new_vals: list[str | None] = [None] * int(new_offsets[-1])
    old_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=old_offsets[1:])
    for i in range(n):
        s, e = old_offsets[i], old_offsets[i + 1]
        ns = new_offsets[i]
        new_vals[ns : ns + (e - s)] = old_vals[s:e]
        if not present[i]:
            new_vals[new_offsets[i + 1] - 1] = uri
    arr = pa.ListArray.from_arrays(pa.array(new_offsets), pa.array(new_vals, pa.string()))
    idx = batch.column_names.index(_EXT_LIST_COL)
    return batch.set_column(idx, _EXT_LIST_COL, arr)


def add_extension(batch: pa.Table, ext: TypedExtension) -> pa.Table:
    """Add the identifier to every row (lib.rs:148-163 ``add_extension``)."""
    return _append_uri(batch, ext.identifier)


def set_extension(batch: pa.Table, ext: TypedExtension, values: Mapping[str, object]) -> pa.Table:
    """Replace the extension's namespace with ``values`` and register the
    identifier on every row (lib.rs:165-183: push id + dedup, remove old
    ``prefix:*`` fields, set new ones). ``values`` maps bare field names to
    arrays (len == batch) or Python scalars (broadcast)."""
    unknown = set(values) - set(ext.fields)
    if unknown:
        raise KeyError(f"unknown {ext.prefix} fields: {sorted(unknown)}")
    pre = ext.prefix + ":"
    keep = [c for c in batch.column_names if not c.startswith(pre)]
    out = batch.select(keep)
    n = len(batch)
    for bare, val in values.items():
        want = ext.fields[bare]
        # lists/ndarrays/arrow arrays are per-row data (len == batch);
        # anything else is a scalar broadcast to every row. To broadcast a
        # list-typed value, pass [value] * len(batch).
        if isinstance(val, (pa.Array, pa.ChunkedArray)):
            arr = val.cast(want) if val.type != want else val
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
        elif isinstance(val, (list, np.ndarray)):
            arr = pa.array(val, want)
        else:
            arr = pa.array([val] * n, want)
        if len(arr) != n:
            raise ValueError(f"{pre}{bare}: length {len(arr)} != batch {n}")
        out = out.append_column(pre + bare, arr)
    return _append_uri(out, ext.identifier)


def remove_extension(batch: pa.Table, ext: TypedExtension) -> pa.Table:
    """Drop the namespace AND strip matching URIs from ``stac_extensions``
    (lib.rs:185-203: remove fields + retain non-matching identifiers)."""
    pre = ext.prefix + ":"
    out = batch.select([c for c in batch.column_names if not c.startswith(pre)])
    col = _uri_list(out)
    flat = pc.list_flatten(col)
    drop = pc.starts_with(flat, ext.identifier_prefix)
    keep_mask = pc.invert(drop)
    kept_flat = pc.filter(flat, keep_mask)
    parent = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
    km = keep_mask.to_numpy(zero_copy_only=False)
    if km.dtype == object:
        km = np.asarray([bool(x) for x in km])
    n = len(out)
    kept_per_row = np.bincount(parent[km], minlength=n) if len(parent) else np.zeros(n, np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_per_row, out=offsets[1:])
    arr = pa.ListArray.from_arrays(pa.array(offsets), kept_flat.combine_chunks() if isinstance(kept_flat, pa.ChunkedArray) else kept_flat)
    idx = out.column_names.index(_EXT_LIST_COL)
    return out.set_column(idx, _EXT_LIST_COL, arr)
