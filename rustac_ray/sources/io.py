"""Sources / sinks (SURVEY.md §2.1): format inference, JSON / NDJSON /
(stac-geo)parquet read & write.

Mirrors the reference's format surface — ``Format::from_path`` extension
inference (crates/io/src/format.rs:101-119), streaming NDJSON one item per
line (crates/core/src/ndjson.rs:61-76), stac-geoparquet writes with
row-group ≤ 150k rows + zstd and ``geo`` / bbox-covering footer metadata
(crates/core/src/geoparquet.rs:24-29,397-435) — on Ray Data primitives:
``read_parquet`` / ``read_json`` / ``write_parquet``. Object-store URIs
(s3:// etc.) pass straight through to pyarrow.fs, covering the reference's
object_store layer (crates/io/src/store.rs:15-62).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = [
    "infer_format",
    "parse_href_opts",
    "parse_opt_args",
    "read_items",
    "read_image_table",
    "write_items",
    "write_stac_geoparquet",
    "read_stac_geoparquet_table",
    "dictionary_encode_columns",
    "ROW_GROUP_SIZE",
]

# reference defaults: geoparquet.rs:24-29
ROW_GROUP_SIZE = 150_000
COMPRESSION = "zstd"


def infer_format(href: str) -> str:
    """Extension-based inference (reference format.rs:101-119):
    *.parquet/geoparquet → parquet; *.ndjson/jsonl → ndjson; *.json → json."""
    base = href.lower().split("?")[0]
    if base.endswith((".parquet", ".geoparquet")):
        return "parquet"
    if base.endswith((".lance",)) or base.rstrip("/").endswith(".lance"):
        return "lance"
    if base.endswith((".ndjson", ".jsonl")):
        return "ndjson"
    if base.endswith((".json", ".geojson")):
        return "json"
    raise ValueError(f"cannot infer format from {href!r}")


def read_image_table(path: str, **kwargs):
    """Read the image+caption table (the north rule's input shape:
    image_id, bytes, w, h, fmt, caption, phash [+ transform, datetime,
    collection]) as a streaming Dataset.

    The north rule names Lance as the table format; this container has no
    Lance wheel, so ``*.lance`` paths dispatch to ``ray.data.read_lance``
    behind an import gate (works unchanged where ``pylance`` is installed)
    and the deterministic parquet carrier is the tested path — both yield
    the same Arrow schema downstream.
    """
    import ray.data as rd

    if infer_format(path) == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "Lance input requires the 'pylance' package, which is not "
                "available in this container; use the parquet carrier "
                "(identical schema) or install pylance"
            ) from e
        return rd.read_lance(path, **kwargs)
    return rd.read_parquet(path, **kwargs)


# --------------------------------------------------------- object stores ----

# env prefix per scheme, mirroring the reference's per-scheme builders from
# env + --opt k=v (crates/io/src/store.rs:15-62): AWS_* for s3://,
# GOOGLE_* for gs://, AZURE_* for az:// — explicit opts override env.
_SCHEME_ENV_PREFIX = {"s3": "AWS_", "gs": "GOOGLE_", "az": "AZURE_", "abfs": "AZURE_"}


def parse_href_opts(
    href: str, opts: dict[str, str] | None = None
) -> tuple["object | None", str]:
    """(filesystem, path) for an href, building a configured pyarrow.fs
    store per scheme (reference ``parse_href_opts``, store.rs:15-62).

    Local paths and unrecognized schemes return (None, href) — Ray Data
    then applies its own default resolution. Options accepted (explicit
    ``opts`` beat environment):

    - s3: region / endpoint_override / access_key_id / secret_access_key /
      session_token / allow_http ("true" → scheme override)
    - gs / az: passed through to the pyarrow.fs constructor by name.
    """
    opts = dict(opts or {})
    scheme = href.split("://", 1)[0].lower() if "://" in href else ""
    if scheme in ("", "file", "local"):
        return None, href.split("://", 1)[-1]
    path = href.split("://", 1)[1]
    import pyarrow.fs as pafs

    if scheme == "s3":
        kw: dict = {}
        env = os.environ
        kw["region"] = opts.get("region") or env.get("AWS_REGION") or env.get(
            "AWS_DEFAULT_REGION"
        )
        kw["endpoint_override"] = opts.get("endpoint_override") or env.get(
            "AWS_ENDPOINT_URL"
        )
        kw["access_key"] = opts.get("access_key_id") or env.get("AWS_ACCESS_KEY_ID")
        kw["secret_key"] = opts.get("secret_access_key") or env.get(
            "AWS_SECRET_ACCESS_KEY"
        )
        kw["session_token"] = opts.get("session_token") or env.get("AWS_SESSION_TOKEN")
        if (opts.get("allow_http") or env.get("AWS_ALLOW_HTTP", "")).lower() == "true":
            kw["scheme"] = "http"
        return pafs.S3FileSystem(**{k: v for k, v in kw.items() if v}), path
    if scheme == "gs":
        return pafs.GcsFileSystem(**opts), path
    if scheme in ("az", "abfs"):
        # pyarrow builds AzureFileSystem from account_name/account_key opts
        return pafs.AzureFileSystem(**opts), path
    return None, href  # http(s) etc.: let the reader resolve


def parse_opt_args(pairs: list[str]) -> dict[str, str]:
    """['k=v', ...] → dict (the CLI ``--opt k=v`` passthrough,
    cli/src/lib.rs:60-64)."""
    out = {}
    for p in pairs or []:
        if "=" not in p:
            raise ValueError(f"--opt expects k=v, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def read_items(path: str, fmt: str | None = None, opts: dict | None = None, **kwargs):
    """→ ray.data.Dataset of flat item rows. ``opts`` configures the
    object store for s3://, gs://, az:// hrefs (per-scheme env + overrides,
    reference store.rs:15-62)."""
    import ray.data as rd

    fmt = fmt or infer_format(path)
    fs, p = parse_href_opts(path, opts)
    if fs is not None:
        kwargs.setdefault("filesystem", fs)
        path = p
    if fmt == "parquet":
        return rd.read_parquet(path, **kwargs)
    if fmt in ("ndjson", "json"):
        return rd.read_json(path, **kwargs)
    raise ValueError(fmt)


def write_items(ds, path: str, fmt: str | None = None, **kwargs):
    fmt = fmt or infer_format(os.path.join(path, "x.parquet") if "." not in os.path.basename(path) else path)
    if fmt == "parquet":
        return ds.write_parquet(
            path, compression=COMPRESSION, row_group_size=ROW_GROUP_SIZE, **kwargs
        )
    if fmt == "ndjson":
        return ds.write_json(path, **kwargs)
    raise ValueError(fmt)


def dictionary_encode_columns(batch: pa.Table, columns: list[str]) -> pa.Table:
    """Dictionary-encode low-cardinality string columns (the reference
    dict-encodes type/stac_version/collection, geoarrow/mod.rs:31-32,205-226).
    Shrinks blocks through shuffles; parquet writes them as dictionary pages."""
    import pyarrow.compute as pc

    out = batch
    for col in columns:
        if col in out.column_names:
            i = out.schema.get_field_index(col)
            c = out[col]
            if isinstance(c, pa.ChunkedArray):
                c = c.combine_chunks()
            if not pa.types.is_dictionary(c.type):
                out = out.set_column(i, col, pc.dictionary_encode(c))
    return out


def _bbox_covering_metadata(bbox_column: str = "bbox") -> dict:
    """The stac-geoparquet 'covering' declaration (geoparquet.rs:411-435)."""
    return {
        "bbox": {
            "xmin": [bbox_column, "xmin"],
            "ymin": [bbox_column, "ymin"],
            "xmax": [bbox_column, "xmax"],
            "ymax": [bbox_column, "ymax"],
        }
    }


def write_stac_geoparquet(
    table: pa.Table, path: str, geometry_column: str = "geometry"
) -> None:
    """Driver-side geoparquet writer with `geo` + covering footer metadata
    (the final footer pass of SURVEY.md K3). For distributed writes use
    write_items(...) then this only on the (small) consolidated outputs."""
    geo_meta = {
        "version": "1.1.0",
        "primary_column": geometry_column,
        "columns": {
            geometry_column: {
                "encoding": "WKB",
                "geometry_types": ["Polygon"],
                "covering": _bbox_covering_metadata(),
            }
        },
    }
    meta = dict(table.schema.metadata or {})
    meta[b"geo"] = json.dumps(geo_meta).encode()
    # reference also writes the 'stac-geoparquet' footer key
    # (geoparquet.rs:32-35,537) so outputs round-trip with its reader;
    # collections map is keyed by the distinct collection ids present
    collections: dict[str, dict] = {}
    if "collection" in table.column_names:
        import pyarrow.compute as pc

        for c in pc.unique(table["collection"]).to_pylist():
            if c is not None:
                collections[c] = {}
    meta[b"stac-geoparquet"] = json.dumps(
        {"version": "1.0.0", "collections": collections}
    ).encode()
    pq.write_table(
        table.replace_schema_metadata(meta),
        path,
        compression=COMPRESSION,
        row_group_size=ROW_GROUP_SIZE,
    )


def read_stac_geoparquet_table(path: str) -> tuple[pa.Table, dict | None]:
    """Read + parse the `geo` footer metadata (if present)."""
    t = pq.read_table(path)
    meta = t.schema.metadata or {}
    geo = json.loads(meta[b"geo"].decode()) if b"geo" in meta else None
    return t, geo
