"""Native geoarrow typed geometry columns (the reference's other wire
format, closing SURVEY §1.4's "WKB by design" caveat).

The reference materializes geometry either as WKB binary or as NATIVE
geoarrow arrays — nested Arrow lists over an (x, y) coordinate struct /
fixed-size list, one layout per geometry type (decode:
crates/core/src/geoarrow/json.rs:466-499; layouts:
crates/core/src/geoarrow/mod.rs). This module provides the same duality
for this engine's Datasets:

- layouts: ``point`` = fixed_size_list<double, 2>; ``linestring`` /
  ``multipoint`` = list<point>; ``polygon`` / ``multilinestring`` =
  list<list<point>>; ``multipolygon`` = list<list<list<point>>> —
  tagged with ``ARROW:extension:name = geoarrow.<type>`` field metadata.
- edges: :func:`wkb_to_native` / :func:`native_to_wkb` map_batches
  stages convert a column in place; :func:`quads_to_native` is the
  vectorized fast path from the engine's footprint corner arrays (the
  one geometry construction on the hot path — pure buffer assembly, no
  per-row Python).

The engine's internal standard stays WKB + flat ``fp_*`` floats (hot
paths never touch nested geometry); native columns are an INTERCHANGE
edge so geoarrow-native consumers (geoarrow-rs/py, lonboard, GeoPandas
via geoarrow) can mount outputs zero-copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import wkb as _wkb

__all__ = [
    "NATIVE_TYPES",
    "native_type",
    "geoarrow_field",
    "geojson_to_native",
    "native_to_geojson",
    "quads_to_native",
    "wkb_to_native",
    "native_to_wkb",
]

_POINT = pa.list_(pa.float64(), 2)

NATIVE_TYPES = {
    "point": _POINT,
    "multipoint": pa.list_(_POINT),
    "linestring": pa.list_(_POINT),
    "multilinestring": pa.list_(pa.list_(_POINT)),
    "polygon": pa.list_(pa.list_(_POINT)),
    "multipolygon": pa.list_(pa.list_(pa.list_(_POINT))),
}

_GEOJSON_NAME = {
    "point": "Point",
    "multipoint": "MultiPoint",
    "linestring": "LineString",
    "multilinestring": "MultiLineString",
    "polygon": "Polygon",
    "multipolygon": "MultiPolygon",
}
_FROM_GEOJSON = {v: k for k, v in _GEOJSON_NAME.items()}


def native_type(geom_type: str) -> pa.DataType:
    try:
        return NATIVE_TYPES[geom_type.lower()]
    except KeyError:
        raise ValueError(
            f"unsupported geoarrow type {geom_type!r} "
            f"(one of {sorted(NATIVE_TYPES)})"
        ) from None


def geoarrow_field(name: str, geom_type: str) -> pa.Field:
    """Arrow field carrying the geoarrow extension tag."""
    return pa.field(
        name,
        native_type(geom_type),
        metadata={"ARROW:extension:name": f"geoarrow.{geom_type.lower()}"},
    )


def geojson_to_native(geoms, geom_type: str) -> pa.Array:
    """GeoJSON dicts (or None) → native geoarrow array. Mixed input
    types raise; a Multi* column accepts its singular type promoted
    (Polygon rows in a multipolygon column become 1-element multis),
    mirroring the reference encoder's promotion."""
    gt = geom_type.lower()
    singular = {"multipoint": "Point", "multilinestring": "LineString",
                "multipolygon": "Polygon"}.get(gt)
    want = _GEOJSON_NAME[gt]
    rows = []
    for g in geoms:
        if g is None:
            rows.append(None)
            continue
        t = g.get("type")
        c = g.get("coordinates")
        if t == want:
            rows.append(c)
        elif singular is not None and t == singular:
            rows.append([c])  # promote singular → 1-element multi
        else:
            raise ValueError(f"expected {want} (or {singular}), got {t!r}")
    return pa.array(rows, type=native_type(gt))


def native_to_geojson(arr, geom_type: str) -> list:
    """Native geoarrow array → list of GeoJSON dicts (None for nulls) —
    the same mapping as the reference's json.rs:466-499 decode."""
    name = _GEOJSON_NAME[geom_type.lower()]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = []
    for v in arr.to_pylist():
        out.append(None if v is None else {"type": name, "coordinates": v})
    return out


def quads_to_native(corners: np.ndarray) -> pa.Array:
    """Vectorized footprint-quad → native polygon array: ``corners`` is
    the engine's (n, 8) corner layout (x0 y0 x1 y1 x2 y2 x3 y3, CCW).
    Pure buffer assembly — flat coords + closing vertex, constant-stride
    offsets — no per-row Python. The hot-edge companion of
    ``wkb.encode_quads``."""
    c = np.asarray(corners, np.float64)
    n = len(c)
    ring = np.empty((n, 5, 2), np.float64)
    ring[:, :4, :] = c.reshape(n, 4, 2)
    ring[:, 4, :] = ring[:, 0, :]  # close the ring
    points = pa.FixedSizeListArray.from_arrays(
        pa.array(ring.reshape(-1), pa.float64()), 2
    )
    ring_offsets = pa.array(np.arange(0, 5 * n + 1, 5, dtype=np.int32))
    rings = pa.ListArray.from_arrays(ring_offsets, points)
    poly_offsets = pa.array(np.arange(0, n + 1, 1, dtype=np.int32))
    return pa.ListArray.from_arrays(poly_offsets, rings).cast(
        native_type("polygon")
    )


def wkb_to_native(batch: pa.Table, *, col: str = "geometry",
                  geom_type: str = "polygon") -> pa.Table:
    """map_batches edge: replace a WKB binary column with its native
    geoarrow layout (extension-tagged field)."""
    wkbs = batch[col].to_pylist()
    geoms = [None if b is None else _wkb.decode_geometry(b) for b in wkbs]
    arr = geojson_to_native(geoms, geom_type)
    i = batch.column_names.index(col)
    return batch.remove_column(i).add_column(
        i, geoarrow_field(col, geom_type), arr
    )


def native_to_wkb(batch: pa.Table, *, col: str = "geometry",
                  geom_type: str | None = None) -> pa.Table:
    """map_batches edge: native geoarrow column → WKB binary (the
    engine's internal standard). ``geom_type`` defaults to the field's
    extension tag."""
    if geom_type is None:
        meta = batch.schema.field(col).metadata or {}
        tag = (meta.get(b"ARROW:extension:name") or b"").decode()
        if not tag.startswith("geoarrow."):
            raise ValueError(
                f"column {col!r} has no geoarrow extension tag; pass geom_type="
            )
        geom_type = tag.split(".", 1)[1]
    geoms = native_to_geojson(batch[col], geom_type)
    out = pa.array(
        [None if g is None else _wkb.encode_geometry(g) for g in geoms],
        pa.binary(),
    )
    i = batch.column_names.index(col)
    return batch.remove_column(i).add_column(i, pa.field(col, pa.binary()), out)
