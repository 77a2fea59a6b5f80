"""Schema evolution for the clustered store (Iceberg-lite).

The 100-TB problem: a corpus rewritten to add/rename/drop a column costs
a full-store rewrite — at 100 TB that's days of IO for a metadata-sized
change. The lakehouse answer (Iceberg spec §4 "Schemas and Projection",
Delta Lake's column-mapping mode) is STABLE COLUMN IDS: the store tracks
each column by an id that never changes, evolution edits only a tiny
descriptor, and READS reconcile old files to the current logical schema
(rename = id lookup, add = fill default, drop = projection) — zero data
IO at evolve time, O(columns) work per batch at read time.

Descriptor (``_schema.json`` in the store directory)::

    {"v": 2, "next_id": 6,
     "columns": [{"id": 1, "name": "image_id"},
                 {"id": 5, "name": "weight", "type": "float64",
                  "default": 1.0}],
     "history": {"0": [[1, "image_id"], [2, "lang"]],
                 "1": [[1, "image_id"]],
                 "2": [[1, "image_id"], [5, "weight"]]}}

- ``columns``: the LIVE logical schema, in order. Entries added by an
  evolve carry the fill ``type``/``default`` for files that predate them.
- ``history[k]``: ``[id, physical_name]`` pairs live at schema version
  ``k`` — the projection map for any file stamped ``schema_v = k``
  (manifest records carry the stamp; absent = 0, the creation schema).
- Name REUSE is safe: dropping ``score`` and later adding a new
  ``score`` mints a fresh id, so old files' physical ``score`` column is
  never resurrected into the new one (the classic evolution footgun).

Internal layout columns (``fp_*`` stats, ``_zkey``) are never tracked and
never evolvable — every file of every schema version has them, which is
what keeps pruning/filter pushdown schema-agnostic.

Time travel: the clustered store archives this descriptor next to each
archived manifest (``_history/schema.v{N}.json``), so
``read_clustered(version=N)`` sees both the files AND the logical schema
as of version N.

Reference anchor: the reference migrates STAC versions by rewriting
every item (migrate.rs); this module is the layout-level complement —
schema changes without touching rows.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

SCHEMA_NAME = "_schema.json"
INTERNAL_COLS = (
    "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax", "fp_corners", "_zkey"
)

# fill types supported for added columns (descriptor "type" strings)
_TYPES = {
    "int64": pa.int64(),
    "int32": pa.int32(),
    "float64": pa.float64(),
    "float32": pa.float32(),
    "string": pa.string(),
    "large_string": pa.large_string(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "timestamp[ms]": pa.timestamp("ms"),
}

_PY_TYPE = {bool: "bool", int: "int64", float: "float64", str: "string",
            bytes: "binary"}

# safe type promotions (Iceberg's widening rules): value-preserving only
_WIDEN = {("int32", "int64"), ("float32", "float64"),
          ("string", "large_string")}


def schema_file_path(out_dir: str, version: "int | None" = None,
                     history_dir: str = "_history") -> str:
    if version is None:
        return os.path.join(out_dir, SCHEMA_NAME)
    return os.path.join(out_dir, history_dir, f"schema.v{version:06d}.json")


def load_schema(out_dir: str, version: "int | None" = None,
                history_dir: str = "_history") -> "dict | None":
    """The schema descriptor live at store version ``version`` (None =
    current). Returns None for a store with no descriptor — identity
    mapping (physical == logical), the pre-evolution contract."""
    path = schema_file_path(out_dir, version, history_dir)
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        if version is None:
            return None
        # store version predates the first evolve (no archived snapshot):
        # its logical schema is the creation schema — schema version 0 of
        # the live descriptor, if one exists by now
        live = load_schema(out_dir, None, history_dir)
        if live is None:
            return None
        return desc_at_schema_v(live, 0)


def desc_at_schema_v(desc: dict, k: int) -> dict:
    """Synthesize the descriptor as of schema version ``k`` from a newer
    one: live columns = history[k]; fill metadata survives by id."""
    by_id = {c["id"]: c for c in desc["columns"]}
    cols = []
    for cid, name in desc["history"][str(k)]:
        entry = dict(by_id.get(cid, {"id": cid}))
        entry["id"], entry["name"] = cid, name
        cols.append(entry)
    return {"v": k, "next_id": desc["next_id"], "columns": cols,
            "history": {s: p for s, p in desc["history"].items()
                        if int(s) <= k}}


def write_schema_atomic(out_dir: str, desc: dict) -> None:
    path = os.path.join(out_dir, SCHEMA_NAME)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(desc, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def init_desc(physical_schema: pa.Schema) -> dict:
    """Schema version 0: track every non-internal physical column, ids
    assigned in column order."""
    cols, pairs, nid = [], [], 1
    for name in physical_schema.names:
        if name in INTERNAL_COLS:
            continue
        cols.append({"id": nid, "name": name})
        pairs.append([nid, name])
        nid += 1
    return {"v": 0, "next_id": nid, "columns": cols, "history": {"0": pairs}}


def apply_evolution(desc: dict, *, add=None, drop=None, rename=None,
                    retype=None, current_types=None) -> dict:
    """Pure function: descriptor + (rename → retype → drop → add, in that
    order; retype/drop names are post-rename) → new descriptor at schema
    version v+1. ``retype`` widens a column's type (Iceberg's safe
    promotions only: int32→int64, float32→float64, string→large_string);
    ``current_types`` supplies the pre-evolve type string for columns the
    descriptor hasn't recorded one for (introspected from a data file by
    the caller). Raises on: touching internal columns, renaming/dropping/
    retyping a column that isn't live, rename collisions, adding a name
    that's already live, non-widening retypes, or an added default whose
    type can't be inferred/expressed."""
    live = {c["name"]: c for c in desc["columns"]}
    cols = [dict(c) for c in desc["columns"]]

    def _check_user(name):
        if name in INTERNAL_COLS:
            raise ValueError(f"evolve: {name!r} is an internal layout "
                             "column and cannot evolve")

    for old, new in (rename or {}).items():
        _check_user(old), _check_user(new)
        if old not in live:
            raise ValueError(f"evolve rename: no live column {old!r}")
    for name in (drop or ()):
        _check_user(name)  # existence checked post-rename below
    # rename
    ren = dict(rename or {})
    for c in cols:
        if c["name"] in ren:
            c["name"] = ren[c["name"]]
    # retype (post-rename names): widening promotions only
    for name, tname in (retype or {}).items():
        _check_user(name)
        entry = next((c for c in cols if c["name"] == name), None)
        if entry is None:
            raise ValueError(f"evolve retype: no live column {name!r}")
        if tname not in _TYPES:
            raise ValueError(f"evolve retype {name!r}: unsupported type "
                             f"{tname!r} (one of {sorted(_TYPES)})")
        cur = entry.get("type") or (current_types or {}).get(name)
        if cur is None:
            raise ValueError(
                f"evolve retype {name!r}: current type unknown — pass "
                "current_types (the caller introspects a data file)")
        if cur != tname and (cur, tname) not in _WIDEN:
            raise ValueError(
                f"evolve retype {name!r}: {cur} → {tname} is not a safe "
                f"widening (allowed: {sorted(_WIDEN)})")
        entry["type"] = tname
    # drop (names refer to PRE-rename schema only if not renamed; contract:
    # drop names are post-rename — i.e. ops compose as documented)
    dropset = set(drop or ())
    missing = dropset - {c["name"] for c in cols}
    if missing:
        raise ValueError(f"evolve drop: no live column {sorted(missing)}")
    cols = [c for c in cols if c["name"] not in dropset]
    # add
    nid = desc["next_id"]
    for name, spec in (add or {}).items():
        _check_user(name)
        if any(c["name"] == name for c in cols):
            raise ValueError(f"evolve add: column {name!r} is already live")
        if isinstance(spec, tuple):
            default, tname = spec
        else:
            default, tname = spec, None
        if tname is None:
            if default is None:
                raise ValueError(
                    f"evolve add {name!r}: a None default needs an explicit "
                    f"type — pass (None, 'float64'-style type string)")
            tname = _PY_TYPE.get(type(default))
            if tname is None:
                raise ValueError(
                    f"evolve add {name!r}: cannot infer type from default "
                    f"{type(default).__name__}; pass (default, type)")
        if tname not in _TYPES:
            raise ValueError(f"evolve add {name!r}: unsupported type "
                             f"{tname!r} (one of {sorted(_TYPES)})")
        cols.append({"id": nid, "name": name, "type": tname,
                     "default": default})
        nid += 1
    if not cols:
        raise ValueError("evolve: refusing to drop every column")
    seen = set()
    for c in cols:
        if c["name"] in seen:
            raise ValueError(f"evolve: two live columns named {c['name']!r} "
                             "after rename/add")
        seen.add(c["name"])
    v = desc["v"] + 1
    hist = dict(desc["history"])
    hist[str(v)] = [[c["id"], c["name"]] for c in cols]
    return {"v": v, "next_id": nid, "columns": cols, "history": hist}


def live_names(desc: dict) -> list[str]:
    return [c["name"] for c in desc["columns"]]


def names_at(desc: dict, schema_v: int) -> dict:
    """{column id: physical name} at schema version ``schema_v``."""
    key = str(int(schema_v))
    if key not in desc["history"]:
        raise ValueError(f"schema version {schema_v} not in descriptor "
                         f"history {sorted(desc['history'])}")
    return {cid: name for cid, name in desc["history"][key]}


def fill_array(entry: dict, n: int) -> pa.Array:
    """Constant default column for a file that predates an added column."""
    ty = _TYPES[entry.get("type", "float64")]
    default = entry.get("default")
    if default is None:
        return pa.nulls(n, ty)
    return pc.fill_null(pa.nulls(n, ty), pa.scalar(default, ty))


def physical_read_columns(desc: dict, schema_v: int,
                          logical: "list[str] | None") -> "list[str] | None":
    """Physical column names to scan in a file stamped ``schema_v`` so the
    requested ``logical`` columns can be reconciled (added-later columns
    have no physical name — they fill at reconcile time). ``None`` in →
    None out (scan everything)."""
    if logical is None:
        return None
    phys_at = names_at(desc, schema_v)
    by_name = {c["name"]: c for c in desc["columns"]}
    out = []
    for name in logical:
        if name in INTERNAL_COLS:
            out.append(name)
            continue
        c = by_name.get(name)
        if c is None:
            raise KeyError(f"no live column {name!r} (live: "
                           f"{live_names(desc)})")
        p = phys_at.get(c["id"])
        if p is not None:
            out.append(p)
    return out


def reconcile_table(t: pa.Table, desc: dict, schema_v: int,
                    columns: "list[str] | None" = None) -> pa.Table:
    """Project a physical table written at ``schema_v`` to the live
    logical schema: rename by id, fill added columns with their recorded
    default, drop retired columns. ``columns`` narrows + orders the
    output (logical names; internal layout names allowed); None = all
    live columns followed by the internal layout columns present."""
    phys_at = names_at(desc, schema_v)
    have = set(t.column_names)
    n = t.num_rows
    by_name = {c["name"]: c for c in desc["columns"]}
    if columns is None:
        columns = live_names(desc) + [c for c in INTERNAL_COLS if c in have]
    names, arrays = [], []
    for name in columns:
        if name in INTERNAL_COLS:
            names.append(name)
            arrays.append(t[name])
            continue
        c = by_name.get(name)
        if c is None:
            raise KeyError(f"no live column {name!r} (live: "
                           f"{live_names(desc)})")
        p = phys_at.get(c["id"])
        if p is not None and p in have:
            arr = t[p]
            want = _TYPES.get(c.get("type", "")) if "type" in c else None
            if want is not None and arr.type != want:
                arr = arr.cast(want)  # recorded widening (retype)
            names.append(name)
            arrays.append(arr)
        else:
            names.append(name)
            arrays.append(fill_array(c, n))
    return pa.table(arrays, names=names)


def common_ids(desc_a: "dict | None", desc_b: "dict | None") -> "set | None":
    """Ids live in BOTH descriptors (None descriptor = identity store —
    returns None meaning 'match by name')."""
    if desc_a is None or desc_b is None:
        return None
    return ({c["id"] for c in desc_a["columns"]}
            & {c["id"] for c in desc_b["columns"]})
