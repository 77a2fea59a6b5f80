"""Arrow schemas for the engine's tables.

The image table is exactly the BASELINE.json ``input_hint`` shape
(image_id, bytes, w, h, fmt, caption, phash) plus the geospatial metadata
the north rule derives footprints from — an affine ``transform`` per the
STAC Projection extension (reference: crates/extensions/src/projection.rs:36-43)
and ``datetime``/``collection`` per the FlatItem shape
(crates/core/src/item.rs:131-177).

The stac_items table mirrors the verified flat stac-geoparquet schema of the
reference golden corpus (crates/duckdb/data/100-sentinel-2-items.parquet):
WKB geometry + bbox struct (crates/core/src/geoarrow/mod.rs:405-431) +
timestamp[ms, UTC]-style datetimes. We keep timestamps timezone-naive in
Arrow (DuckDB compares naive) — values are UTC by convention.
"""

from __future__ import annotations

import pyarrow as pa

BBOX_STRUCT = pa.struct(
    [
        pa.field("xmin", pa.float64()),
        pa.field("ymin", pa.float64()),
        pa.field("xmax", pa.float64()),
        pa.field("ymax", pa.float64()),
    ]
)

IMAGES_SCHEMA = pa.schema(
    [
        pa.field("image_id", pa.string()),
        pa.field("bytes", pa.binary()),
        pa.field("w", pa.int32()),
        pa.field("h", pa.int32()),
        pa.field("fmt", pa.string()),
        pa.field("caption", pa.string()),
        pa.field("phash", pa.int64()),
        pa.field("transform", pa.list_(pa.float64(), 6)),
        pa.field("datetime", pa.timestamp("ms")),
        pa.field("collection", pa.string()),
    ]
)

LINK_STRUCT = pa.struct(
    [
        pa.field("href", pa.string()),
        pa.field("rel", pa.string()),
        pa.field("type", pa.string()),
    ]
)

ASSET_STRUCT = pa.struct(
    [
        pa.field(
            "data",
            pa.struct(
                [
                    pa.field("href", pa.string()),
                    pa.field("type", pa.string()),
                    pa.field("roles", pa.list_(pa.string())),
                ]
            ),
        )
    ]
)

STAC_ITEMS_SCHEMA = pa.schema(
    [
        pa.field("type", pa.string()),
        pa.field("stac_version", pa.string()),
        pa.field("stac_extensions", pa.list_(pa.string())),
        pa.field("id", pa.string()),
        pa.field("geometry", pa.binary()),
        pa.field("bbox", BBOX_STRUCT),
        pa.field("datetime", pa.timestamp("ms")),
        pa.field("start_datetime", pa.timestamp("ms")),
        pa.field("end_datetime", pa.timestamp("ms")),
        pa.field("collection", pa.string()),
        pa.field("eo:cloud_cover", pa.float64()),
        pa.field("sat:relative_orbit", pa.int64()),
        pa.field("links", pa.list_(LINK_STRUCT)),
        pa.field("assets", ASSET_STRUCT),
    ]
)

QUERY_GEOMS_SCHEMA = pa.schema(
    [
        pa.field("query_id", pa.string()),
        pa.field("geometry", pa.binary()),  # WKB
        pa.field("kind", pa.string()),  # point | box | concave
        pa.field("k", pa.int32()),  # for kNN probes; null otherwise
    ]
)

QUERY_BOXES_SCHEMA = pa.schema(
    [
        pa.field("query_id", pa.string()),
        pa.field("xmin", pa.float64()),
        pa.field("ymin", pa.float64()),
        pa.field("xmax", pa.float64()),
        pa.field("ymax", pa.float64()),
    ]
)
