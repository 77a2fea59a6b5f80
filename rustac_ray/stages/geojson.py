"""GeoJSON edges (SURVEY.md M3/M4): nested STAC-JSON records ↔ flat Arrow.

The reference decodes Arrow batches to GeoJSON rows only at the output
boundary (crates/core/src/geoarrow/json.rs:98-568) and encodes item JSON
into Arrow at ingest (geoarrow/mod.rs:85-240). Same here: the engine's
tables are born flat with WKB geometry; these two map_batches bodies are
the ONLY places geometry leaves/enters WKB.

- ``to_geojson_records``: flat batch → list-of-dicts STAC items: geometry
  WKB → GeoJSON dict, bbox struct → [xmin,ymin,xmax,ymax] array
  (geoarrow/json.rs:28-39), non-top-level columns → properties,
  timestamps → RFC3339 strings (json.rs:570-603).
- ``from_geojson_records``: the inverse ingest: item dicts → flat Arrow
  with WKB geometry + bbox struct + ms-UTC timestamps (M3's column
  surgery; datetime parse per the permissive parser, datetime.rs:44-60).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.wkb import decode_geometry, encode_geometry
from .items import TOP_LEVEL_KEYS

__all__ = ["to_geojson_records", "from_geojson_records", "parse_datetime_series"]

_DT_COLS = (
    "datetime", "start_datetime", "end_datetime", "created", "updated",
    "published", "expires", "unpublished",
)  # the 8 designated datetime columns (geoarrow/mod.rs:20-29)


def _rfc3339(ts) -> str | None:
    if ts is None or pd.isna(ts):
        return None
    return pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"


def _plain(v):
    """Deep-convert pandas/numpy containers to plain JSON-shaped Python
    (np.ndarray → list, np scalars → Python scalars) — parquet list/struct
    columns come back as numpy arrays nested inside dicts, which JSON-Schema
    validation and json serialization both reject."""
    if isinstance(v, np.ndarray):
        return [_plain(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    if isinstance(v, np.generic):
        return v.item()
    return v


def to_geojson_records(batch: pa.Table) -> list[dict]:
    """Flat Arrow batch → GeoJSON-shaped item dicts (output edge only)."""
    df = batch.to_pandas()
    records = []
    for _, row in df.iterrows():
        item: dict = {"type": "Feature"}
        props: dict = {}
        for col, val in row.items():
            if isinstance(val, float) and pd.isna(val):
                continue
            if col == "geometry" and isinstance(val, (bytes, bytearray)):
                item["geometry"] = decode_geometry(bytes(val))
            elif col == "bbox":
                if isinstance(val, dict):
                    item["bbox"] = [val["xmin"], val["ymin"], val["xmax"], val["ymax"]]
                else:
                    item["bbox"] = list(val)
            elif col in _DT_COLS:
                # absent timestamp (NaT) → omit the key entirely; emitting
                # start/end_datetime: null is a schema violation. A null
                # datetime proper is kept (legal with a start/end range).
                s = _rfc3339(val)
                if s is not None or col == "datetime":
                    props[col] = s
            elif col in TOP_LEVEL_KEYS:
                item[col] = _plain(val)
            else:
                props[col] = _plain(val)
        item["properties"] = props
        records.append(item)
    return records


def parse_datetime_series(s: pd.Series) -> pd.Series:
    """Permissive string→timestamp parse (reference datetime.rs:44-60):
    RFC3339 (with Z / offsets) else naive %Y-%m-%dT%H:%M:%S[.f], → UTC-naive ms."""
    out = pd.to_datetime(s, utc=True, format="mixed", errors="coerce")
    return out.dt.tz_localize(None).astype("datetime64[ms]")


def from_geojson_records(records: list[dict]) -> pa.Table:
    """GeoJSON-shaped item dicts → flat Arrow (ingest edge)."""
    rows = []
    for item in records:
        row: dict = {}
        for k, v in item.items():
            if k == "properties":
                continue
            if k == "geometry" and isinstance(v, dict):
                row["geometry"] = encode_geometry(v)
            elif k == "bbox" and isinstance(v, (list, tuple)):
                # 6-element bbox = [xmin,ymin,zmin,xmax,ymax,zmax]
                # (bbox.rs:8-14 untagged [f64;4] | [f64;6]); index by length
                if len(v) == 6:
                    xmax, ymax = float(v[3]), float(v[4])
                else:
                    xmax, ymax = float(v[2]), float(v[3])
                row["bbox"] = {
                    "xmin": float(v[0]), "ymin": float(v[1]),
                    "xmax": xmax, "ymax": ymax,
                }
            else:
                row[k] = v
        for k, v in (item.get("properties") or {}).items():
            if k not in TOP_LEVEL_KEYS:
                row[k] = v
        rows.append(row)
    df = pd.DataFrame(rows)
    for col in df.columns:
        if col in _DT_COLS:
            df[col] = parse_datetime_series(df[col])
    return pa.Table.from_pandas(df, preserve_index=False)
