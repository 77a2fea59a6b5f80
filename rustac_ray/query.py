"""Search query IR and its compilation to a Ray Data pipeline.

:class:`QuerySpec` mirrors the reference's ``api::Search``
(crates/core/src/api/search.rs:12-30): ids, collections, bbox, intersects,
datetime, filter (CQL2), fields, sortby, limit. ``search()`` compiles it
into read → vectorized map_batches predicates → [sort] → limit, with exact
reference semantics:

- conjunctive matching (search.rs:160-165): every set predicate must pass;
- empty id/collection lists pass everything; an item without a collection
  FAILS a non-empty collections filter (search.rs:185-193);
- bbox intersects the item GEOMETRY, not the item bbox
  (crates/core/src/api/items.rs:184-198 → item.rs:457-468) — compiled as a
  two-phase bbox-struct prefilter + exact test, the same covering-prefilter
  idea as the geoparquet bbox metadata (geoparquet.rs:411-435);
- datetime interval: item interval = [start_datetime or datetime,
  end_datetime or datetime], INCLUSIVE both ends, open ends via ``..``
  (item.rs:510-554; duckdb client.rs:361-385 citing stac-spec#1280);
- datetime strings expand like the reference normalizer
  (search.rs:259-439): "2023" → the whole year, "2023-06" → the month,
  single instant, "a/b", "../b", "a/..";
- CQL2 filter referencing an unknown property → EMPTY result
  (duckdb client.rs:391-393,433-455);
- legacy ``query`` always errors (items.rs:240-247);
- sortby "-field" = desc, "+field"/bare = asc (api/sort.rs:10-83);
- fields "+a,-b" include/exclude → column projection (api/fields.rs:17-57).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .cql2 import Cql2Predicate, UnknownPropertyError
from .geo.pip import PreparedGeometry
from .geo.wkb import decode_bboxes

__all__ = ["QuerySpec", "normalize_datetime", "search", "LegacyQueryError", "parse_sortby", "parse_fields", "sorted_topn", "search_page", "queryables", "search_parquet", "spec_arrow_prefilter"]


class LegacyQueryError(ValueError):
    """The legacy ``query`` extension is intentionally unimplemented
    (reference: crates/core/src/api/items.rs:240-247 always errors)."""


@dataclass
class QuerySpec:
    ids: list[str] | None = None
    collections: list[str] | None = None
    bbox: list[float] | None = None  # [xmin, ymin, xmax, ymax]
    intersects: dict | None = None  # GeoJSON geometry
    datetime: str | None = None
    filter: str | dict | None = None  # CQL2 text or json
    fields: str | None = None  # "+a,-b"
    sortby: str | None = None  # "-field,+other"
    limit: int | None = None
    offset: int | None = None  # page offset (duckdb client.rs:309-316)
    query: dict | None = None  # legacy; always errors if set
    extra: dict = field(default_factory=dict)


# ----------------------------------------------------- datetime normalizer --

_YEAR = re.compile(r"^\d{4}$")
_MONTH = re.compile(r"^\d{4}-\d{2}$")
_DAY = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _parse_instant(s: str, end: bool = False) -> np.datetime64:
    """Permissive instant parse + partial-date expansion (reference
    search.rs:259-439 + datetime.rs:44-60). ``end`` picks the interval end
    of a partial date (last ms of the year/month/day)."""
    s = s.strip()
    if _YEAR.match(s):
        if end:
            return np.datetime64(f"{int(s)+1}-01-01T00:00:00.000", "ms") - np.timedelta64(1, "ms")
        return np.datetime64(f"{s}-01-01T00:00:00.000", "ms")
    if _MONTH.match(s):
        if end:
            y, m = int(s[:4]), int(s[5:7])
            y2, m2 = (y + 1, 1) if m == 12 else (y, m + 1)
            return np.datetime64(f"{y2:04d}-{m2:02d}-01T00:00:00.000", "ms") - np.timedelta64(1, "ms")
        return np.datetime64(f"{s}-01T00:00:00.000", "ms")
    if _DAY.match(s):
        if end:
            return np.datetime64(f"{s}T23:59:59.999", "ms")
        return np.datetime64(f"{s}T00:00:00.000", "ms")
    s = s.rstrip("Zz")
    # strip numeric UTC offsets like +00:00 (values are UTC by convention)
    m = re.match(r"^(.*?)([+-]\d{2}:\d{2})$", s)
    if m and "T" in m.group(1):
        s = m.group(1)
    return np.datetime64(s, "ms")


def normalize_datetime(expr: str) -> tuple[np.datetime64 | None, np.datetime64 | None]:
    """'a/b' | '../b' | 'a/..' | instant | partial-date → (start, end), either None for open.

    Raises ValueError when start > end (reference search.rs:306-357)."""
    if "/" in expr:
        a, b = expr.split("/", 1)
        start = None if a in ("..", "") else _parse_instant(a)
        end = None if b in ("..", "") else _parse_instant(b, end=True)
    else:
        start = _parse_instant(expr)
        end = _parse_instant(expr, end=True)
    if start is not None and end is not None and start > end:
        raise ValueError(f"datetime start after end: {expr}")
    return start, end


# ----------------------------------------------------------- sort / fields --


def parse_sortby(sortby: str) -> list[tuple[str, bool]]:
    """'-a,+b,c' → [(a, desc=True), (b, False), (c, False)]."""
    out = []
    for part in sortby.split(","):
        part = part.strip()
        if not part:
            continue
        if part[0] == "-":
            out.append((part[1:], True))
        elif part[0] == "+":
            out.append((part[1:], False))
        else:
            out.append((part, False))
    return out


def parse_fields(fields: str) -> tuple[list[str], list[str]]:
    """'+a,-b,c' → (include=[a,c], exclude=[b])."""
    inc, exc = [], []
    for part in fields.split(","):
        part = part.strip()
        if not part:
            continue
        if part[0] == "-":
            exc.append(part[1:])
        else:
            inc.append(part.lstrip("+"))
    return inc, exc


# ------------------------------------------------------------------ search --


def _bbox_struct_arrays(batch: pa.Table):
    col = batch["bbox"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return tuple(col.field(i).to_numpy(zero_copy_only=False) for i in range(4))


def _item_geoms_intersect(batch: pa.Table, pg: PreparedGeometry, prefilter: np.ndarray) -> np.ndarray:
    """Exact geometry∩geometry on prefilter survivors; null geometry → False
    (reference search.rs:236-251).

    Fast path: when every surviving geometry is a single-ring quad polygon
    (the stac-geoparquet common case — scene footprints), decode all WKBs
    in one vectorized pass and run one prepared quad test."""
    out = np.zeros(len(batch), dtype=bool)
    idx = np.nonzero(prefilter)[0]
    if len(idx) == 0:
        return out
    geoms = batch["geometry"].take(pa.array(idx)).to_pylist()
    from .geo.wkb import _QUAD_HEADER, _QUAD_WKB_LEN, decode_quads

    if all(
        g is not None and len(g) == _QUAD_WKB_LEN and bytes(g[:13]) == _QUAD_HEADER
        for g in geoms
    ):
        corners = decode_quads([bytes(g) for g in geoms])
        out[idx] = pg.intersects_quads(corners)
        return out

    from .cql2 import _geom_intersects

    for j, g in zip(idx, geoms):
        if g is not None:
            out[j] = _geom_intersects(pg, g)
    return out


def _compile_mask(spec: QuerySpec, cql: Cql2Predicate | None):
    """Build the conjunctive vectorized batch predicate (reference
    Search::matches, search.rs:160-165)."""
    pg_bbox = None
    if spec.bbox is not None:
        x0, y0, x1, y1 = spec.bbox[:4] if len(spec.bbox) == 4 else (
            spec.bbox[0], spec.bbox[1], spec.bbox[3], spec.bbox[4]
        )
        if x0 > x1:
            # antimeridian-crossing bbox (legal per STAC; bbox.rs:42-50 TODO
            # in the reference): split into the two non-wrapping halves
            pg_bbox = PreparedGeometry(
                {"type": "MultiPolygon",
                 "coordinates": [
                     [[[x0, y0], [180.0, y0], [180.0, y1], [x0, y1], [x0, y0]]],
                     [[[-180.0, y0], [x1, y0], [x1, y1], [-180.0, y1], [-180.0, y0]]],
                 ]}
            )
        else:
            pg_bbox = PreparedGeometry(
                {"type": "Polygon",
                 "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]}
            )
    pg_int = PreparedGeometry(spec.intersects) if spec.intersects is not None else None
    dt_range = normalize_datetime(spec.datetime) if spec.datetime else None

    def mask_fn(batch: pa.Table) -> np.ndarray:
        n = len(batch)
        mask = np.ones(n, dtype=bool)
        if spec.ids:  # empty/None list = pass-all (search.rs:211-213)
            mask &= pc.is_in(batch["id"], value_set=pa.array(spec.ids)).to_numpy(
                zero_copy_only=False
            )
        if spec.collections:  # null collection fails (search.rs:185-193)
            m = pc.is_in(batch["collection"], value_set=pa.array(spec.collections))
            mask &= pc.fill_null(m, False).to_numpy(zero_copy_only=False)
        for pg in (pg_bbox, pg_int):
            if pg is None or not mask.any():
                continue
            bx0, by0, bx1, by1 = _bbox_struct_arrays(batch)
            pre = mask & np.nan_to_num(
                (bx0 <= pg.xmax) & (bx1 >= pg.xmin) & (by0 <= pg.ymax) & (by1 >= pg.ymin),
                nan=False,
            )
            mask &= _item_geoms_intersect(batch, pg, pre)
        if dt_range is not None and mask.any():
            start, end = dt_range
            dt = batch["datetime"].to_numpy(zero_copy_only=False)
            sdt = batch["start_datetime"].to_numpy(zero_copy_only=False) if "start_datetime" in batch.column_names else np.full(n, np.datetime64("NaT"))
            edt = batch["end_datetime"].to_numpy(zero_copy_only=False) if "end_datetime" in batch.column_names else np.full(n, np.datetime64("NaT"))
            item_start = np.where(np.isnat(sdt), dt, sdt)
            item_end = np.where(np.isnat(edt), dt, edt)
            ok = ~np.isnat(item_start) | ~np.isnat(item_end)
            if start is not None:  # inclusive both ends (client.rs:361-385)
                ok &= item_end >= start
            if end is not None:
                ok &= item_start <= end
            mask &= ok
        if cql is not None and mask.any():
            mask &= cql.mask(batch)
        return mask

    return mask_fn


def search(ds: "ray.data.Dataset", spec: QuerySpec) -> "ray.data.Dataset":
    """Compile + run a QuerySpec over a flat stac-items Dataset."""
    if spec.query is not None:
        raise LegacyQueryError(
            "the legacy 'query' extension is not supported (use filter/CQL2)"
        )
    cql = Cql2Predicate(spec.filter) if spec.filter is not None else None
    if cql is not None:
        try:
            cql.check_schema(ds.schema().names)
        except UnknownPropertyError:
            # reference short-circuit: whole query → empty result
            empty = pa.Table.from_pylist([], schema=pa.schema(
                [pa.field(n, t) for n, t in zip(ds.schema().names, ds.schema().types)]
            ))
            ds = ray.data.from_arrow(empty)
            return _postprocess(ds, spec)

    mask_fn = _compile_mask(spec, cql)

    def apply(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(mask_fn(batch)))

    out = ds.map_batches(apply, batch_format="pyarrow")
    return _postprocess(out, spec)


def spec_arrow_prefilter(spec: QuerySpec, schema: "pa.Schema") -> "object | None":
    """Compile the QuerySpec's SARGABLE constraints to ONE pyarrow dataset
    expression for ``read_parquet(filter=...)`` — the scan half of the
    reference's DuckDB pushdown (client.rs:224-316 builds WHERE clauses for
    ids/collections/datetime/filter; here parquet row-group stats prune).

    Conservative-prefilter contract (see cql2.to_arrow_filter): never drops
    a row ``search()`` would keep, so the caller re-runs the full predicate
    chain over the survivors unchanged.

    - ids / collections → ``isin``
    - bbox → closed-interval overlap on the ``bbox`` struct stat fields
      (implied: the struct IS the stored geometry's bbox)
    - datetime → the item-interval rule (start_datetime|datetime,
      end_datetime|datetime — query.py:16) with coalesce expanded through
      ``is_null`` so mixed-null rows are never over-pruned
    - filter → ``cql2.to_arrow_filter`` (sargable subset)
    """
    import pyarrow.compute as pc

    from .cql2 import to_arrow_filter

    names = set(schema.names)
    parts = []
    if spec.ids and "id" in names:
        parts.append(pc.field("id").isin(list(spec.ids)))
    if spec.collections and "collection" in names:
        parts.append(pc.field("collection").isin(list(spec.collections)))
    if spec.bbox is not None and "bbox" in names:
        b = list(spec.bbox)
        if len(b) == 6:
            b = [b[0], b[1], b[3], b[4]]
        xmin, ymin, xmax, ymax = b
        if xmin <= xmax:  # antimeridian split handled by the exact phase
            parts.append(
                (pc.field("bbox", "xmin") <= xmax)
                & (pc.field("bbox", "xmax") >= xmin)
                & (pc.field("bbox", "ymin") <= ymax)
                & (pc.field("bbox", "ymax") >= ymin)
            )
    if spec.datetime is not None and "datetime" in names:
        qs, qe = normalize_datetime(spec.datetime)
        d = pc.field("datetime")
        has_range = "start_datetime" in names and "end_datetime" in names
        if has_range:
            s, e = pc.field("start_datetime"), pc.field("end_datetime")
            if qe is not None:
                lo = (s <= qe.item()) | (s.is_null() & (d <= qe.item()))
                parts.append(lo)
            if qs is not None:
                hi = (e >= qs.item()) | (e.is_null() & (d >= qs.item()))
                parts.append(hi)
        else:
            if qe is not None:
                parts.append(d <= qe.item())
            if qs is not None:
                parts.append(d >= qs.item())
    if spec.filter is not None:
        expr = to_arrow_filter(spec.filter, schema)
        if expr is not None:
            parts.append(expr)
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out & p
    return out


def search_parquet(path: str, spec: QuerySpec, **read_kwargs) -> "ray.data.Dataset":
    """``read_parquet`` + ``search`` with the spec's sargable constraints
    PUSHED INTO THE SCAN: only row groups whose parquet min/max stats can
    satisfy ids/collections/bbox/datetime/sargable-CQL2 are read; the full
    predicate chain then runs over the survivors with identical semantics
    to a full scan (the prefilter is implied, so re-application is a no-op
    on correctness and the win is pure IO/decode pruning)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    first = path
    if os.path.isdir(path):
        names = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        if names:
            first = os.path.join(path, names[0])
    schema = pq.read_schema(first)
    expr = spec_arrow_prefilter(spec, schema)
    if expr is not None:
        read_kwargs.setdefault("filter", expr)
    return search(rd.read_parquet(path, **read_kwargs), spec)


def sorted_topn(ds: "ray.data.Dataset", keys: list[tuple[str, bool]], n: int):
    """Distributed top-n under a sort order WITHOUT a full-sort shuffle:
    each input block is pruned to its local top-n (vectorized Arrow
    sort_by + slice — the partial-top-k combiner pattern, same shape as
    knn), then the tiny surviving set (≤ n × num_blocks rows) is merged
    and finally sorted once. A paged search over 100 TB thus moves at most
    n rows per block instead of shuffling the whole table."""
    sort_keys = [(k, "descending" if d else "ascending") for k, d in keys]

    def prune(b: pa.Table) -> pa.Table:
        if len(b) <= n:
            return b
        return b.sort_by(sort_keys).slice(0, n)

    def final(b: pa.Table) -> pa.Table:
        return b.sort_by(sort_keys).slice(0, n)

    pruned = ds.map_batches(prune, batch_format="pyarrow", batch_size=None)
    return pruned.repartition(1).map_batches(final, batch_format="pyarrow")


def search_page(ds: "ray.data.Dataset", spec: QuerySpec) -> dict:
    """One search result PAGE in the reference's ``api::ItemCollection``
    shape (crates/core/src/api/item_collection.rs:37-99): GeoJSON-shaped
    ``features`` plus ``numberMatched`` (total matches, computed by a
    separate count pass like the reference's ``item_count``,
    api/client.rs:293-310), ``numberReturned``, and the ``next`` offset
    token when more pages exist (memory.rs:58-87 skip tokens)."""
    from .stages.geojson import to_geojson_records

    import dataclasses

    unpaged = dataclasses.replace(spec, limit=None, offset=None, sortby=None)
    matched = search(ds, unpaged).count()
    page_ds = search(ds, spec)
    tbl = pa.concat_tables(
        list(page_ds.iter_batches(batch_format="pyarrow", batch_size=None))
        or [pa.table({})]
    )
    features = to_geojson_records(tbl) if tbl.num_columns else []
    returned = len(features)
    offset = spec.offset or 0
    out = {
        "type": "FeatureCollection",
        "features": features,
        "numberMatched": matched,
        "numberReturned": returned,
    }
    if spec.limit is not None and offset + returned < matched:
        out["next"] = offset + returned  # offset token for the next page
    return out


def _postprocess(ds: "ray.data.Dataset", spec: QuerySpec) -> "ray.data.Dataset":
    keys = parse_sortby(spec.sortby) if spec.sortby else None
    if keys and spec.limit is not None:
        # sort+limit[+offset] = partial top-k, never a full-sort shuffle
        ds = sorted_topn(ds, keys, (spec.offset or 0) + spec.limit)
        if spec.offset:
            off = spec.offset

            def drop_head(b: pa.Table) -> pa.Table:
                return b.slice(off)

            ds = ds.map_batches(drop_head, batch_format="pyarrow", batch_size=None)
        ds = ds.limit(spec.limit)
        if spec.fields:
            inc, exc = parse_fields(spec.fields)
            if inc:
                return ds.select_columns(inc)
            if exc:
                return ds.select_columns([c for c in ds.schema().names if c not in exc])
        return ds
    if keys:
        ds = ds.sort([k for k, _ in keys], descending=[d for _, d in keys])
    if spec.offset:
        # offset pagination (reference duckdb client.rs:309-316 / memory.rs
        # skip tokens): meaningful only on sorted output; pages are small,
        # so take offset+limit and drop the head driver-side
        import pyarrow as pa
        from ray.data import DataContext

        n = spec.offset + (spec.limit or 0)
        ctx = DataContext.get_current()
        prev = ctx.execution_options.preserve_order
        ctx.execution_options.preserve_order = True
        try:
            head = ds.limit(n) if spec.limit is not None else ds
            tbl = pa.concat_tables(
                list(head.iter_batches(batch_format="pyarrow", batch_size=None))
            )
        finally:
            ctx.execution_options.preserve_order = prev
        ds = ray.data.from_arrow(tbl.slice(spec.offset))
        if spec.limit is not None:
            ds = ds.limit(spec.limit)
        if spec.fields:
            inc, exc = parse_fields(spec.fields)
            if inc:
                return ds.select_columns(inc)
            if exc:
                return ds.select_columns([c for c in ds.schema().names if c not in exc])
        return ds
    if spec.limit is not None:
        ds = ds.limit(spec.limit)
    if spec.fields:
        inc, exc = parse_fields(spec.fields)
        if inc:
            ds = ds.select_columns(inc)
        elif exc:
            keep = [c for c in ds.schema().names if c not in exc]
            ds = ds.select_columns(keep)
    return ds


def _queryable_schema(field: "pa.Field") -> dict:
    """Arrow field → JSON-Schema fragment for the queryables doc."""
    t = field.type
    if field.name == "geometry" or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return {"$ref": "https://geojson.org/schema/Geometry.json"}
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return {"type": "string", "format": "date-time"}
    if pa.types.is_boolean(t):
        return {"type": "boolean"}
    if pa.types.is_integer(t):
        return {"type": "integer"}
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return {"type": "number"}
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return {"type": "array", "items": _queryable_schema(pa.field("item", t.value_type))}
    if pa.types.is_struct(t):
        return {
            "type": "object",
            "properties": {
                t.field(i).name: _queryable_schema(t.field(i)) for i in range(t.num_fields)
            },
        }
    return {"type": "string"}


def queryables(ds_or_schema, *, base_url: str = "https://stac-api.example.com",
               title: str = "Queryables") -> dict:
    """JSON-Schema queryables document (STAC API filter extension).

    The reference server punts with an empty ``properties`` map
    (crates/server/src/api.rs:156-169 + routes.rs:148-161, served as
    application/schema+json); this analogue derives ``properties`` from
    the actual table schema, so a CQL2 client can discover exactly which
    properties :class:`~rustac_ray.cql2.Cql2Predicate` will accept —
    anything absent raises the same unknown-property short-circuit the
    reference's DuckDB path has (client.rs:391-393).

    Accepts a ``ray.data.Dataset``, a ``pyarrow.Schema``, or a
    ``pyarrow.Table``. Driver-side metadata only — never touches rows.
    """
    schema = ds_or_schema
    if isinstance(schema, pa.Table):
        schema = schema.schema
    elif not isinstance(schema, pa.Schema) and hasattr(schema, "schema"):
        schema = schema.schema()  # ray Dataset
        schema = getattr(schema, "base_schema", schema)
    props = {f.name: _queryable_schema(f) for f in schema}
    return {
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "$id": f"{base_url}/queryables",
        "type": "object",
        "title": title,
        "description": "Queryable names for the STAC API Item Search filter.",
        "properties": props,
        "additionalProperties": True,
    }


def search_many(
    ds: "ray.data.Dataset", specs: "dict[str, QuerySpec]"
) -> "ray.data.Dataset":
    """Evaluate MANY QuerySpecs in ONE shared corpus pass: each input
    row is read once and emitted once per matching spec, tagged
    ``spec_id`` — the scan-amortization primitive for dashboard /
    monitoring workloads that run dozens of standing searches over the
    same 100-TB table (N searches = N full scans → 1 scan + N vectorized
    masks per batch, which are the cheap part).

    Per-spec semantics are identical to :func:`search` for the
    scan-phase members (ids / collections / bbox / intersects / datetime
    / filter), including the unknown-property short-circuit (that spec
    matches nothing). Result-shaping members (sortby / limit / offset /
    fields) are per-spec TAILS that would force per-spec postprocessing —
    they raise here; run :func:`search` for those, or shape downstream.
    """
    import ray

    names = ds.schema().names
    compiled: list[tuple[str, object]] = []
    for sid, spec in specs.items():
        if spec.query is not None:
            raise LegacyQueryError(
                "the legacy 'query' extension is not supported (use filter/CQL2)"
            )
        for member in ("sortby", "limit", "offset", "fields"):
            if getattr(spec, member, None) not in (None, [], ()):
                raise ValueError(
                    f"search_many: spec {sid!r} sets {member!r} — result "
                    "shaping is per-spec; use search() or shape downstream"
                )
        cql = Cql2Predicate(spec.filter) if spec.filter is not None else None
        if cql is not None:
            try:
                cql.check_schema(names)
            except UnknownPropertyError:
                compiled.append((sid, None))  # reference short-circuit
                continue
        compiled.append((sid, _compile_mask(spec, cql)))

    def apply(batch: pa.Table) -> pa.Table:
        outs = []
        for sid, fn in compiled:
            if fn is None:
                continue
            sel = batch.filter(pa.array(fn(batch)))
            if len(sel):
                outs.append(
                    sel.append_column(
                        "spec_id", pa.array([sid] * len(sel), pa.string())
                    )
                )
        if outs:
            return pa.concat_tables(outs)
        empty = batch.schema.empty_table()
        return empty.append_column("spec_id", pa.array([], pa.string()))

    return ds.map_batches(apply, batch_format="pyarrow")
