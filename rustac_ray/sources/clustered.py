"""Spatially-clustered parquet store: Morton-ordered write, bbox-pruned read.

The 100-TB read problem: a bbox query over an unclustered corpus must open
every file (random footprints mean every file's bbox spans the world, so
min/max stats prune nothing). The classic fix — pay ONE range shuffle at
write time to sort rows by the Morton (Z-order) key of their footprint
center — makes spatially-near rows share files, so each file's bbox becomes
tight and a driver-side manifest scan prunes almost all of them before the
read plan is even built.

This is the cluster-layout generalization of the reference's
stac-geoparquet "covering" footer (crates/core/src/geoparquet.rs:411-435
records per-row bbox columns precisely so engines can prune row groups on
min/max stats; crates/duckdb/src/client.rs builds WHERE clauses against
those columns). Here the same idea operates at THREE levels:

- file level: per-file bbox in a sidecar ``_spatial_manifest.jsonl``,
  pruned on the driver (no file open, no task launch for pruned files);
- row-group level: the written files carry plain ``fp_xmin/..`` float
  columns, so the pushed-down pyarrow filter expression prunes row groups
  from parquet min/max stats inside each kept file;
- row level: the same expression drops non-matching rows during the scan,
  so downstream stages see only candidates (exact tests still run on the
  survivors — box-intersection at file/row level is a prefilter).

Scale notes: the write-time ``sort`` is an all-to-all, but it runs ONCE per
ingest and is exactly the shuffle the streaming executor's range
partitioner is built for; every subsequent query amortizes it. The manifest
is one tiny JSON line per file (a 100-TB corpus at 1 GB/file is ~10^5
lines — driver-trivial). Writes are atomic (tmp + rename) and resumable:
finished partitions are skipped by manifest id + input digest, the same
contract as ``state/manifest.py``.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..geo.tiles import _part1by1
from ..stages.footprint import derive_footprints
from . import evolution

__all__ = [
    "apply_changes",
    "diff_stores",
    "evolve_clustered",
    "stat_clustered",
    "explain_clustered",
    "store_schema",
    "clone_clustered",
    "maintain_clustered",
    "morton_key",
    "write_clustered",
    "read_clustered",
    "merge_clustered",
    "compact_clustered",
    "delete_clustered",
    "upsert_clustered",
    "search_clustered",
    "knn_clustered",
    "prune_plan",
    "count_clustered",
    "store_version",
    "store_versions",
    "vacuum_clustered",
    "changes_clustered",
    "StoreLockedError",
    "SpatialManifest",
]

_MANIFEST_NAME = "_spatial_manifest.jsonl"
_JOURNAL_NAME = "_publish_journal.json"
_HISTORY_DIR = "_history"
_CURVER_NAME = "_current_version"
_GEN_RE = re.compile(r"^part-g(\d+)-\d+\.parquet$")


def _history_versions(out_dir: str) -> list[int]:
    """Sorted archived manifest versions present under ``_history/``."""
    hdir = os.path.join(out_dir, _HISTORY_DIR)
    if not os.path.isdir(hdir):
        return []
    vs = []
    for name in os.listdir(hdir):
        m = re.match(r"^manifest\.v(\d+)\.jsonl$", name)
        if m:
            vs.append(int(m.group(1)))
    return sorted(vs)


def store_version(out_dir: str) -> int:
    """Current manifest version: 0 for a freshly written store, +1 per
    published mutation (merge/compact/delete; upsert = 2). Persisted in
    a ``_current_version`` marker (so the counter survives a vacuum that
    drops ALL archived history); archive filenames are the fallback for
    stores written before the marker existed."""
    out_dir = os.path.abspath(out_dir)
    marker = 0
    try:
        with open(os.path.join(out_dir, _CURVER_NAME)) as f:
            marker = int(f.read().strip() or 0)
    except (FileNotFoundError, ValueError):
        pass
    vs = _history_versions(out_dir)
    return max(marker, (vs[-1] + 1) if vs else 0)


def _bump_version_marker(out_dir: str, new_version: int) -> None:
    path = os.path.join(out_dir, _CURVER_NAME)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(str(new_version))
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _read_marker(out_dir: str) -> int:
    try:
        with open(os.path.join(out_dir, _CURVER_NAME)) as f:
            return int(f.read().strip() or 0)
    except (FileNotFoundError, ValueError):
        return 0


def _snapshot_schema(out_dir: str, v: int) -> None:
    """Archive the live schema descriptor as the schema of version ``v``
    (idempotent) — time-travel reads then see version N's files AND its
    logical schema. Durable copy (tmp + fsync + rename)."""
    src = os.path.join(out_dir, evolution.SCHEMA_NAME)
    if not os.path.exists(src):
        return
    dst = evolution.schema_file_path(out_dir, v, _HISTORY_DIR)
    if os.path.exists(dst):
        return
    with open(src, "rb") as f:
        data = f.read()
    tmp = dst + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, dst)


def _archive_current(out_dir: str) -> None:
    """Snapshot the CURRENT manifest into ``_history/manifest.v{N}.jsonl``
    (and the schema descriptor into ``_history/schema.v{N}.json``) before
    a publish replaces it — the time-travel retention record.
    Durable (tmp + fsync + rename) BEFORE the publish journal is written,
    so a crash anywhere in the publish can never lose the old version.
    Idempotent: a crash between archive and marker-bump leaves the newest
    archive byte-identical to the live manifest WITH a stale marker; the
    retry detects that pair and reuses the version number instead of
    minting a hole. (Byte-equality alone isn't enough: a schema evolve
    legitimately publishes an UNCHANGED manifest as a new version.)"""
    cur = os.path.join(out_dir, _MANIFEST_NAME)
    if not os.path.exists(cur):
        return
    hdir = os.path.join(out_dir, _HISTORY_DIR)
    os.makedirs(hdir, exist_ok=True)
    vs = _history_versions(out_dir)
    with open(cur, "rb") as f:
        cur_bytes = f.read()
    if vs:
        # crashed-retry detection: the newest archive matching the live
        # state byte-for-byte (manifest AND schema — an evolve archives an
        # UNCHANGED manifest with a CHANGED schema, which must still mint
        # a fresh version) means a prior publish archived and died; reuse
        # that version instead of minting a hole.
        def _same(a_path, b_path):
            try:
                with open(b_path, "rb") as f:
                    b = f.read()
            except FileNotFoundError:
                b = None
            try:
                with open(a_path, "rb") as f:
                    a = f.read()
            except FileNotFoundError:
                a = None
            return a == b
        last = os.path.join(hdir, f"manifest.v{vs[-1]:06d}.jsonl")
        try:
            with open(last, "rb") as f:
                if f.read() == cur_bytes and _same(
                    os.path.join(out_dir, evolution.SCHEMA_NAME),
                    evolution.schema_file_path(out_dir, vs[-1], _HISTORY_DIR),
                ):
                    _snapshot_schema(out_dir, vs[-1])
                    _bump_version_marker(out_dir, vs[-1] + 1)
                    return
        except FileNotFoundError:
            pass
    v = store_version(out_dir)  # marker-aware (survives dropped history)
    # schema first: a crash between the two snapshots must leave the
    # version UNLISTED (only manifest archives define versions), so the
    # retry re-mints the same number instead of a content-duplicate hole
    _snapshot_schema(out_dir, v)
    dst = os.path.join(hdir, f"manifest.v{v:06d}.jsonl")
    tmp = dst + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(cur_bytes)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, dst)
    _bump_version_marker(out_dir, v + 1)


def _next_gen(out_dir: str, recs: list[dict]) -> int:
    """Next free generation number for rewritten file names. Scans BOTH
    the live manifest and the directory (history-retained files of older
    versions stay on disk until vacuum), so a new publish can never
    collide with a name any retained snapshot still references."""
    gen = 1
    names = [r["file"] for r in recs]
    try:
        names += os.listdir(out_dir)
    except FileNotFoundError:
        pass
    for name in names:
        m = _GEN_RE.match(name)
        if m:
            gen = max(gen, int(m.group(1)) + 1)
    return gen


def _write_journal(out_dir: str, steps: list, records: list[dict]) -> None:
    """Durably record a publish plan BEFORE mutating any published file.

    ``steps`` is an ordered list of ``["rename", src, dst]`` /
    ``["link", src, dst]`` / ``["delete", name]`` (store-relative names);
    ``records`` is the complete post-publish manifest. Written atomically
    (tmp + fsync + rename), so the store is always in one of two
    recoverable states: no journal (consistent) or journal present
    (replay it to finish). The outgoing manifest is archived to
    ``_history/`` first — every publish is a new VERSION and the old one
    stays readable (``read_clustered(version=N)``) until vacuumed."""
    _archive_current(out_dir)
    path = os.path.join(out_dir, _JOURNAL_NAME)
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"steps": steps, "records": records}, f, default=str)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _apply_journal(out_dir: str) -> bool:
    """Idempotently replay a publish journal: execute each step (skipping
    ones already done — rename with missing src, delete of missing file),
    atomically rewrite the manifest from the journaled records, remove the
    journal. Safe to call concurrently (steps tolerate losing a race) and
    repeatedly. Returns True if a journal was found and applied."""
    jpath = os.path.join(out_dir, _JOURNAL_NAME)
    if not os.path.exists(jpath):
        return False
    with open(jpath) as f:
        plan = json.load(f)
    for step in plan["steps"]:
        if step[0] == "rename":
            src = os.path.join(out_dir, step[1])
            dst = os.path.join(out_dir, step[2])
            try:
                if os.path.exists(src):
                    os.rename(src, dst)
            except FileNotFoundError:
                pass  # concurrent repairer won the rename
        elif step[0] == "link":
            # hard-link a kept file into its new name: the OLD name stays
            # valid for retained history versions, the bytes are shared
            # (no copy IO), and vacuum reclaims whichever name drops out
            # of retention. Idempotent: dst present → already done.
            src = os.path.join(out_dir, step[1])
            dst = os.path.join(out_dir, step[2])
            try:
                if not os.path.exists(dst) and os.path.exists(src):
                    os.link(src, dst)
            except FileExistsError:
                pass  # concurrent repairer won the link
        elif step[0] == "delete":
            try:
                os.remove(os.path.join(out_dir, step[1]))
            except FileNotFoundError:
                pass
    man_tmp = os.path.join(out_dir, _MANIFEST_NAME + f".tmp.{os.getpid()}")
    with open(man_tmp, "w") as f:
        for r in plan["records"]:
            f.write(json.dumps(r, default=str) + "\n")
    os.rename(man_tmp, os.path.join(out_dir, _MANIFEST_NAME))
    try:
        os.remove(jpath)
    except FileNotFoundError:
        pass
    return True


def _repair_if_crashed(out_dir: str) -> bool:
    """Finish an interrupted merge/compact publish, but only when no LIVE
    mutator holds the lock (a journal next to a live lock is a publish in
    flight — leave it to its owner; reads stay consistent with the
    pre-publish manifest because every staged file is under a tmp name)."""
    if not os.path.exists(os.path.join(out_dir, _JOURNAL_NAME)):
        return False
    lock = os.path.join(out_dir, "_mutation.lock")
    if os.path.exists(lock):
        try:
            with open(lock) as f:
                pid = int(f.read().strip() or 0)
            if pid > 0:
                os.kill(pid, 0)
                return False  # live mutator owns the journal
        except ProcessLookupError:
            pass  # dead owner — repair below
        except (OSError, ValueError):
            return False
    return _apply_journal(out_dir)


def morton_key(cx: np.ndarray, cy: np.ndarray, *, bits: int = 16) -> np.ndarray:
    """Z-order key of lon/lat points: ``bits``-bit quantized axes,
    bit-interleaved (x even, y odd). int64, globally order-comparable."""
    n = np.int64(1) << bits
    ix = np.clip(((np.asarray(cx, np.float64) + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(((np.asarray(cy, np.float64) + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    return (_part1by1(ix) | (_part1by1(iy) << np.uint64(1))).view(np.int64)


def _part1by2(v: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of v to every third bit position (u64)."""
    v = np.asarray(v, dtype=np.uint64) & np.uint64((1 << 21) - 1)
    v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
    return v


def morton_key_xyt(
    cx: np.ndarray,
    cy: np.ndarray,
    tms: np.ndarray,
    t_range: "tuple[int, int]",
    *,
    bits: int = 10,
) -> np.ndarray:
    """3-D Z-order key over (lon, lat, time): each axis quantized to
    ``bits`` bits (≤ 21) and bit-interleaved (x, y, t round-robin).
    ``tms`` is epoch-ms (NaT/None → bucket 0, sorting nulls first);
    ``t_range`` is the global (t0, t1) recorded at store creation so
    every later merge quantizes time identically. The spatio-temporal
    layout for satellite archives: a (bbox AND datetime) query's file
    count tracks the product of both selectivities instead of the
    spatial one alone."""
    if bits > 21:
        raise ValueError("morton_key_xyt: bits must be <= 21")
    n = np.int64(1) << bits
    ix = np.clip(((np.asarray(cx, np.float64) + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    iy = np.clip(((np.asarray(cy, np.float64) + 90.0) / 180.0 * n).astype(np.int64), 0, n - 1)
    t0, t1 = (int(t_range[0]), int(t_range[1]))
    span = max(t1 - t0, 1)
    tf = np.asarray(tms, np.float64)
    it = np.clip(
        np.where(np.isfinite(tf), (tf - t0) / span * n, 0.0).astype(np.int64),
        0, n - 1,
    )
    key = (
        _part1by2(ix)
        | (_part1by2(iy) << np.uint64(1))
        | (_part1by2(it) << np.uint64(2))
    )
    return key.view(np.int64)


def _attrs_spec_of(ds, cols: "list[str]", max_attr_dict: int) -> list:
    """Record each clustering attribute's axis: numeric/timestamp →
    global (lo, hi) from one aggregate pass; string → the sorted
    distinct-value dictionary (capped — a high-cardinality string is
    the wrong clustering key; hash it to an int column instead)."""
    import pyarrow as pa_
    from ray.data.aggregate import Max, Min

    names = ds.schema().names
    missing = [c for c in cols if c not in names]
    if missing:
        raise KeyError(f"cluster_attrs: no column(s) {missing}")
    # arrow types via a 1-row probe (ds.schema() may be a pandas block
    # schema with numpy dtypes on from_pandas inputs)
    probe = next(
        iter(ds.select_columns(list(cols)).limit(1).iter_batches(
            batch_format="pyarrow"
        ))
    )
    spec = []
    num_cols = []
    for c in cols:
        t = probe.schema.field(c).type
        if pa_.types.is_string(t) or pa_.types.is_large_string(t):
            vals = sorted(
                v for v in ds.select_columns([c]).unique(c) if v is not None
            )
            if len(vals) > max_attr_dict:
                raise ValueError(
                    f"cluster_attrs: {c!r} has {len(vals)} distinct values "
                    f"(max {max_attr_dict}) — cluster on a bounded-"
                    "cardinality attribute or a hash of this one"
                )
            spec.append({"col": c, "kind": "dict", "values": vals})
        elif pa_.types.is_timestamp(t):
            spec.append({"col": c, "kind": "time"})
            num_cols.append(c)
        elif pa_.types.is_integer(t) or pa_.types.is_floating(t):
            spec.append({"col": c, "kind": "num"})
            num_cols.append(c)
        else:
            raise ValueError(
                f"cluster_attrs: {c!r} has type {t} — numeric, timestamp "
                "and string attributes are supported"
            )
    if num_cols:
        def to_num(b: pa.Table) -> pa.Table:
            out = {}
            for c in num_cols:
                arr = b[c]
                if pa.types.is_timestamp(arr.type):
                    arr = arr.cast(pa.timestamp("ms")).cast(pa.int64())
                out[c] = arr.cast(pa.float64())
            return pa.table(out)

        aggs = []
        for c in num_cols:
            aggs.append(Min(c, alias_name=f"lo_{c}"))
            aggs.append(Max(c, alias_name=f"hi_{c}"))
        r = ds.select_columns(num_cols).map_batches(
            to_num, batch_format="pyarrow"
        ).aggregate(*aggs)
        for sp in spec:
            c = sp["col"]
            if sp["kind"] in ("num", "time"):
                lo, hi = r[f"lo_{c}"], r[f"hi_{c}"]
                if lo is None:
                    raise ValueError(
                        f"cluster_attrs: {c!r} is all-null — nothing to "
                        "cluster on"
                    )
                sp["lo"], sp["hi"] = float(lo), float(hi)
    return spec


def zorder_attrs_key(codes: "list[np.ndarray]", bits: int) -> np.ndarray:
    """Generic N-axis Z-order: bit-interleave the per-axis quantized
    codes (round-robin, axis 0 in the lowest bit). Vectorized per BIT
    (<= 21 x naxes cheap numpy passes), so any attribute pair/triple
    clusters the same way (x, y) and (x, y, t) do."""
    nax = len(codes)
    if nax * bits > 63:
        raise ValueError("zorder_attrs_key: naxes * bits must be <= 63")
    key = np.zeros(len(codes[0]), np.uint64)
    one = np.uint64(1)
    for b in range(bits):
        for a, c in enumerate(codes):
            key |= (
                (c.astype(np.uint64) >> np.uint64(b)) & one
            ) << np.uint64(b * nax + a)
    return key.view(np.int64)


def _attr_codes(batch: pa.Table, spec: dict, bits: int) -> np.ndarray:
    """Quantize one attribute column to ``bits``-bit codes per the
    recorded axis spec (store-creation global bounds / dictionary, so
    every later merge routes identically). Nulls → bucket 0; dictionary
    values unseen at store creation clamp to the top bucket (routing
    stays deterministic; zone maps keep reads exact)."""
    import pandas as pd

    n = np.int64(1) << bits
    c = spec["col"]
    if c not in batch.column_names:
        return np.zeros(len(batch), np.int64)
    kind = spec["kind"]
    if kind == "dict":
        ranks = pd.Index(spec["values"]).get_indexer(
            batch[c].to_numpy(zero_copy_only=False)
        )
        nv = max(len(spec["values"]), 1)
        code = np.where(ranks < 0, nv, ranks).astype(np.float64) / nv * n
        return np.clip(code.astype(np.int64), 0, n - 1)
    if kind == "time":
        v = (
            batch[c].cast(pa.timestamp("ms")).cast(pa.int64())
            .to_numpy(zero_copy_only=False).astype(np.float64)
        )
    else:
        v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
    lo, hi = float(spec["lo"]), float(spec["hi"])
    span = max(hi - lo, 1e-300)
    code = np.where(np.isfinite(v), (v - lo) / span * n, 0.0)
    return np.clip(code.astype(np.int64), 0, n - 1)


class SpatialManifest:
    """Sidecar of per-file spatial stats (bbox + zkey range + lineage).

    ``version=N`` opens an archived snapshot (``_history/manifest.v{N}``)
    for time-travel reads; ``None`` (and N == current) is the live
    manifest. Mutations always operate on the live manifest."""

    def __init__(self, out_dir: str, version: int | None = None):
        self.out_dir = out_dir
        self.version = version
        os.makedirs(out_dir, exist_ok=True)
        cur = store_version(out_dir)
        if version is None or version == cur:
            self.path = os.path.join(out_dir, _MANIFEST_NAME)
        else:
            self.path = os.path.join(
                out_dir, _HISTORY_DIR, f"manifest.v{version:06d}.jsonl"
            )
            if not os.path.exists(self.path):
                avail = _history_versions(out_dir) + [cur]
                raise ValueError(
                    f"{out_dir}: store version {version} is not readable "
                    f"(vacuumed or never existed); available: {avail}"
                )

    def completed(self) -> dict[int, dict]:
        done: dict[int, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        done[rec["partition_id"]] = rec
        return done

    def append(self, record: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")


def _zkey_stage(
    batch: pa.Table,
    *,
    derive: bool,
    bits: int,
    bbox_col: str | None = None,
    t_range: "tuple[int, int] | None" = None,
    tbits: int = 10,
    time_col: str = "datetime",
    attrs_spec: "list[dict] | None" = None,
    attr_bits: int = 10,
) -> pa.Table:
    if bbox_col is not None:
        # stac-items shape: bbox is a struct<xmin,ymin,xmax,ymax> — lift
        # the fields to the flat fp_* stat columns the store prunes on
        bb = batch[bbox_col]
        if isinstance(bb, pa.ChunkedArray):
            bb = bb.combine_chunks()
        xmin = bb.field("xmin").to_numpy(zero_copy_only=False)
        ymin = bb.field("ymin").to_numpy(zero_copy_only=False)
        xmax = bb.field("xmax").to_numpy(zero_copy_only=False)
        ymax = bb.field("ymax").to_numpy(zero_copy_only=False)
        if np.any(xmin > xmax):
            # antimeridian-crossing item bboxes (STAC-legal) would need a
            # two-row split to prune correctly; refuse rather than build
            # a store that silently misses them
            raise ValueError(
                "write_clustered(bbox_col=...): antimeridian-crossing item "
                "bbox (xmin > xmax) not supported in the clustered layout"
            )
        for name, arr in (
            ("fp_xmin", xmin), ("fp_ymin", ymin),
            ("fp_xmax", xmax), ("fp_ymax", ymax),
        ):
            batch = batch.append_column(name, pa.array(arr, pa.float64()))
    elif derive:
        batch = derive_footprints(batch)
    if attrs_spec is not None:
        # generic attribute clustering: the layout key interleaves the
        # recorded attribute axes; fp_* stay derived above (manifest
        # spatial stats + bbox pruning remain correct on any layout)
        codes = [_attr_codes(batch, sp, attr_bits) for sp in attrs_spec]
        key = zorder_attrs_key(codes, attr_bits)
        return batch.append_column("_zkey", pa.array(key, pa.int64()))
    cx = (batch["fp_xmin"].to_numpy() + batch["fp_xmax"].to_numpy()) * 0.5
    cy = (batch["fp_ymin"].to_numpy() + batch["fp_ymax"].to_numpy()) * 0.5
    if t_range is not None:
        # spatio-temporal clustering: time is a third interleaved axis,
        # quantized against the store-creation (t0, t1) so every later
        # merge routes identically
        if time_col in batch.column_names:
            tms = (
                batch[time_col]
                .cast(pa.timestamp("ms"))
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
            )
        else:
            tms = np.full(len(batch), np.nan)
        key = morton_key_xyt(cx, cy, tms, t_range, bits=tbits)
        return batch.append_column("_zkey", pa.array(key, pa.int64()))
    return batch.append_column("_zkey", pa.array(morton_key(cx, cy, bits=bits), pa.int64()))


def write_clustered(
    ds,
    out_dir: str,
    *,
    bits: int = 16,
    footprints_derived: bool = False,
    bbox_col: str | None = None,
    resume: bool = True,
    rows_per_file: int = 16384,
    stats_cols: "list[str] | None" = None,
    cluster_time: bool = False,
    tbits: int = 10,
    time_col: str = "datetime",
    cluster_attrs: "list[str] | None" = None,
    attr_bits: int = 10,
    max_attr_dict: int = 4096,
) -> list[dict]:
    """Write ``ds`` as a Morton-clustered parquet directory + sidecar
    spatial manifest; returns the manifest records (old + new).

    ``stats_cols`` records a per-file ZONE MAP (min/max) for the named
    numeric/string columns in the manifest — the generalization of the
    spatial/temporal stats: ``read_clustered(column_ranges=...)`` then
    prunes files for non-spatial predicates before any file open.
    Mutations (merge/compact/delete) keep the stats fresh for rewritten
    files; the column set is part of the store's identity
    (``_store_meta.json``).

    ``cluster_time=True`` switches the layout key to a 3-D Morton
    interleave over (lon, lat, ``time_col``) — the spatio-temporal
    clustering satellite archives want: per-file tmin/tmax become TIGHT
    (time-near rows share files), so a (bbox AND datetime) query's kept
    file count tracks the product of both selectivities. The global
    time range is computed once here and recorded in the store params;
    merges quantize against it (out-of-range later ingest clamps to the
    edge buckets — re-cluster to a fresh store when the archive outgrows
    its era). All reads stay correct regardless of layout (pruning and
    the kNN certificate use the per-file bbox/tmin/tmax stats, not key
    semantics) — xyt trades some spatial tightness for temporal
    tightness.

    Accepts either the image-table shape (footprints derived from
    w/h/transform, or already-present ``fp_*`` columns with
    ``footprints_derived=True``) or the stac-items shape
    (``bbox_col="bbox"`` lifts the bbox struct to the ``fp_*`` stat
    columns).

    ``cluster_attrs=[colA, colB, ...]`` (r4 VERDICT #5) generalizes the
    layout beyond space/time: the key becomes a Z-order interleave of
    the named attribute axes (numeric/timestamp quantized against
    store-creation global bounds; strings ranked against a recorded
    dictionary, capped at ``max_attr_dict`` distinct values). Paired
    with zone maps (``cluster_attrs`` auto-join ``stats_cols``), a
    conjunctive predicate over the clustered attributes keeps a file
    count tracking the PRODUCT of the per-attribute selectivities —
    the same promotion of covering stats to layout the bbox store does
    for space. Spatial fp_* stats stay derived and correct (bbox reads
    prune as usual, just less tightly). Mutually exclusive with
    ``cluster_time``.

    Partitioning is DETERMINISTIC, not sort-sampled: file boundaries are
    the exact equi-depth quantiles of the zkey multiset (rank-based —
    identical input ⇒ identical boundaries regardless of block layout),
    computed by the histogram-bisection pass over a column-pruned zkey
    stream; rows route to their boundary interval and ONE
    ``groupby(_file)`` shuffle co-locates each file's rows. This is what
    makes resume SAFE: a re-run reproduces the exact same (pid → row
    set) mapping, so completed partitions verify against their recorded
    (rows, zmin, zmax) and skip the write IO (a mismatch means the input
    changed — that raises instead of silently mixing runs). Ray's
    ``sort`` was rejected here precisely because its sampled range
    boundaries differ run to run, which would turn crash-resume into
    silent row loss. Manifest records stream to disk as file tasks
    finish, so a crash keeps everything already published.
    """
    import math

    import ray

    from ..stages.sketch import exact_quantiles

    out_dir = os.path.abspath(out_dir)
    kw = {"derive": not footprints_derived, "bits": bits, "bbox_col": bbox_col}

    man = SpatialManifest(out_dir)

    with _StoreLock(out_dir):
        _apply_journal(out_dir)  # finish a crashed merge/compact publish
        done = man.completed() if resume else {}
        # files written now carry the CURRENT schema version (0 for a
        # fresh store; an appended-to store may have evolved)
        _desc = evolution.load_schema(out_dir)
        cur_schema_v = 0 if _desc is None else int(_desc["v"])
        # partitioning parameters are part of the store's identity: a
        # resume with different bits/rows_per_file would compute different
        # boundaries and mis-skip — verify against the recorded descriptor
        meta_path = os.path.join(out_dir, "_store_meta.json")
        params = {"bits": bits, "rows_per_file": rows_per_file, "version": 1}
        if cluster_attrs:
            if cluster_time:
                raise ValueError(
                    "write_clustered: cluster_attrs and cluster_time are "
                    "mutually exclusive (attrs can include the time column)"
                )
            # clustered attributes always get zone maps — the layout is
            # only useful through the range prune they feed
            stats_cols = sorted(set(stats_cols or ()) | set(cluster_attrs))
        if stats_cols:
            params["stats_cols"] = sorted(stats_cols)
        if cluster_attrs:
            prev_t = None
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    prev_t = json.load(f)
            if prev_t and prev_t.get("cluster") == "attrs":
                spec = prev_t["attrs"]  # resume: recorded axis identity
            else:
                spec = _attrs_spec_of(ds, cluster_attrs, max_attr_dict)
            params.update(
                {"cluster": "attrs", "attrs": spec, "attr_bits": attr_bits}
            )
            kw.update({"attrs_spec": spec, "attr_bits": attr_bits})
        if cluster_time:
            # resume reuses the RECORDED time range (boundary identity);
            # a fresh write computes it in one column-pruned pass
            prev_t = None
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    prev_t = json.load(f)
            if prev_t and prev_t.get("cluster") == "xyt":
                t0, t1 = int(prev_t["t0"]), int(prev_t["t1"])
            else:
                from ray.data.aggregate import Max, Min

                def _ms(b: pa.Table) -> pa.Table:
                    v = (
                        b[time_col].cast(pa.timestamp("ms")).cast(pa.int64())
                    )
                    return pa.table({"_t": v})

                tr = (
                    ds.select_columns([time_col])
                    .map_batches(_ms, batch_format="pyarrow")
                    .aggregate(Min("_t"), Max("_t"))
                )
                if tr["min(_t)"] is None:
                    raise ValueError(
                        f"cluster_time: {time_col!r} is all-null — nothing "
                        "to cluster time on"
                    )
                t0, t1 = int(tr["min(_t)"]), int(tr["max(_t)"])
            params.update(
                {"cluster": "xyt", "t0": t0, "t1": t1, "tbits": tbits,
                 "time_col": time_col}
            )
            kw.update({"t_range": (t0, t1), "tbits": tbits, "time_col": time_col})
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                prev_params = json.load(f)
            if prev_params != params:
                raise ValueError(
                    f"{out_dir}: store written with {prev_params}, "
                    f"got {params} — pass the same parameters or delete the dir"
                )
        else:
            tmp_meta = meta_path + f".tmp.{os.getpid()}"
            with open(tmp_meta, "w") as f:
                json.dump(params, f, sort_keys=True)
            os.rename(tmp_meta, meta_path)
        keyed = ds.map_batches(_zkey_stage, batch_format="pyarrow", fn_kwargs=kw)
        # boundary pass over a column-pruned stream (the bisection reads
        # the input several times; never ship payload bytes through it)
        names = ds.schema().names
        if bbox_col is not None:
            need = [bbox_col]
        elif footprints_derived:
            need = [c for c in ("fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax") if c in names]
        else:
            need = [c for c in ("w", "h", "transform") if c in names]
        if cluster_time and time_col in names and time_col not in need:
            need.append(time_col)
        if cluster_attrs:
            need.extend(
                c for c in cluster_attrs if c in names and c not in need
            )
        zonly = ds.select_columns(need).map_batches(
            _zkey_stage, batch_format="pyarrow", fn_kwargs=kw
        ).select_columns(["_zkey"])
        n = zonly.count()
        if n == 0:
            return [done[k] for k in sorted(done)]
        n_files = max(1, math.ceil(n / rows_per_file))
        if n_files > 1:
            qs = [i / n_files for i in range(1, n_files)]
            qdf = exact_quantiles(zonly, "_zkey", qs)
            boundaries = np.unique(qdf["value"].to_numpy().astype(np.int64))
        else:
            boundaries = np.zeros(0, np.int64)
        b_ref = ray.put(boundaries)

        def route(batch: pa.Table) -> pa.Table:
            b = ray.get(b_ref) if isinstance(b_ref, ray.ObjectRef) else b_ref
            z = batch["_zkey"].to_numpy()
            slot = np.searchsorted(b, z, side="right").astype(np.int64)
            return batch.append_column("_file", pa.array(slot, pa.int64()))

        prev_ref = ray.put(
            {
                int(pid): (rec["rows"], rec["zmin"], rec["zmax"])
                for pid, rec in done.items()
            }
        )

        def write_group(t: pa.Table) -> pa.Table:
            pid = int(t["_file"][0].as_py())
            order = np.argsort(t["_zkey"].to_numpy(), kind="stable")
            t = t.take(pa.array(order)).drop_columns(["_file"])
            z = t["_zkey"].to_numpy()
            rec = {
                "partition_id": pid,
                "file": f"part-{pid:05d}.parquet",
                "rows": t.num_rows,
                "xmin": float(np.min(t["fp_xmin"].to_numpy())),
                "ymin": float(np.min(t["fp_ymin"].to_numpy())),
                "xmax": float(np.max(t["fp_xmax"].to_numpy())),
                "ymax": float(np.max(t["fp_ymax"].to_numpy())),
                "zmin": int(z.min()),
                "zmax": int(z.max()),
                "schema_v": cur_schema_v,
                **_temporal_stats(t),
                **_col_stats(t, stats_cols),
            }
            prev = (
                ray.get(prev_ref) if isinstance(prev_ref, ray.ObjectRef) else prev_ref
            ).get(pid)
            if prev is not None:
                if prev != (rec["rows"], rec["zmin"], rec["zmax"]):
                    raise RuntimeError(
                        f"{out_dir} partition {pid}: recorded (rows, zmin, zmax) "
                        f"{prev} != recomputed "
                        f"({rec['rows']}, {rec['zmin']}, {rec['zmax']}) — input "
                        "changed since the interrupted run; delete the "
                        "directory to rewrite"
                    )
                rec["skipped"] = True
                return pa.Table.from_pylist([rec])
            final = os.path.join(out_dir, rec["file"])
            tmp = final + f".tmp.{os.getpid()}"
            pq.write_table(t, tmp, compression="zstd", row_group_size=16384)
            os.rename(tmp, final)
            rec["skipped"] = False
            return pa.Table.from_pylist([rec])

        records = (
            keyed.map_batches(route, batch_format="pyarrow")
            .groupby("_file")
            .map_groups(write_group, batch_format="pyarrow")
        )
        # stream manifest appends as file tasks finish — a crash keeps
        # every record already published
        for b in records.iter_batches(batch_format="pandas"):
            for rec in b.to_dict("records"):
                if not rec.pop("skipped", False):
                    rec = {
                        k: _norm_stat(k, v)
                        for k, v in rec.items()
                    }
                    man.append(rec)
                    done[rec["partition_id"]] = rec
    return [done[k] for k in sorted(done)]


class StoreLockedError(RuntimeError):
    pass


class _StoreLock:
    """O_EXCL lockfile guarding store MUTATIONS (merge/compact) — two
    concurrent mutators would interleave file rewrites and manifest
    publishes. Readers never take the lock (reads are consistent: files
    publish atomically and the manifest is replaced atomically). A lock
    left by a dead local pid is reclaimed; a live one raises
    :class:`StoreLockedError` immediately (no blocking — the caller
    decides whether to retry)."""

    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, "_mutation.lock")

    def __enter__(self):
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                pass
            try:
                with open(self.path) as f:
                    pid = int(f.read().strip() or 0)
            except (OSError, ValueError):
                pid = 0
            alive = False
            if pid > 0:
                try:
                    os.kill(pid, 0)
                    alive = True
                except ProcessLookupError:
                    alive = False
                except PermissionError:
                    alive = True  # exists but owned elsewhere — treat as live
            if alive:
                raise StoreLockedError(
                    f"store mutation in progress (pid {pid}): {self.path}"
                ) from None
            # Reclaim by RENAMING the stale lock to a unique name first:
            # two racers both see the dead pid, but only one rename wins
            # (the loser's source is gone), so only one reclaims — the
            # unlink-then-recreate scheme let the loser unlink the
            # winner's fresh lock and admit two mutators.
            stale = self.path + f".stale.{os.getpid()}"
            try:
                os.rename(self.path, stale)
            except FileNotFoundError:
                continue  # lost the race; loop and re-contend O_EXCL
            try:
                os.unlink(stale)
            except FileNotFoundError:
                pass
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        return self

    def __exit__(self, *exc):
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass
        return False


def _query_boxes(bbox: tuple[float, float, float, float]):
    """Split an antimeridian-crossing query bbox (xmin > xmax, STAC-legal)
    into its two in-range halves; plain boxes pass through."""
    xmin, ymin, xmax, ymax = bbox
    if xmin > xmax:
        return [(xmin, ymin, 180.0, ymax), (-180.0, ymin, xmax, ymax)]
    return [(xmin, ymin, xmax, ymax)]


def _norm_stat(k, v):
    """Normalize a manifest stat crossing a pandas/arrow boundary: int
    fields back to Python int, NaN (pandas' null for optional tmin/tmax)
    back to None."""
    if isinstance(v, float) and v != v:  # NaN
        return None
    if (
        k in (
            "partition_id", "rows", "zmin", "zmax", "tmin", "tmax", "schema_v"
        )
        or k.startswith("csn_")
    ) and v is not None:
        return int(v)
    return v


def _store_stats_cols(out_dir: str) -> list[str]:
    """Columns the store records per-file zone maps for (from the store
    param descriptor; [] for stores written without the feature)."""
    try:
        with open(os.path.join(out_dir, "_store_meta.json")) as f:
            return list(json.load(f).get("stats_cols", ()))
    except FileNotFoundError:
        return []


def _layout_kwargs(out_dir: str) -> dict:
    """The _zkey_stage kwargs implied by the store's recorded layout:
    {} for 2-D Morton stores; t_range/tbits/time_col for xyt stores so
    merges/upserts quantize time exactly like the original write."""
    try:
        with open(os.path.join(out_dir, "_store_meta.json")) as f:
            p = json.load(f)
    except FileNotFoundError:
        return {}
    if p.get("cluster") == "attrs":
        return {
            "attrs_spec": p["attrs"],
            "attr_bits": int(p.get("attr_bits", 10)),
        }
    if p.get("cluster") != "xyt":
        return {}
    return {
        "t_range": (int(p["t0"]), int(p["t1"])),
        "tbits": int(p.get("tbits", 10)),
        "time_col": p.get("time_col", "datetime"),
    }


def _live_stats_cols(out_dir: str, desc: "dict | None") -> list[str]:
    """The zone-map column set in CURRENT logical names (the param
    descriptor records creation-schema names; renames map by id, drops
    fall out)."""
    cols = _store_stats_cols(out_dir)
    if desc is None or not cols:
        return cols
    inv = {name: cid for cid, name in evolution.names_at(desc, 0).items()}
    cur = {c["id"]: c["name"] for c in desc["columns"]}
    return [cur[inv[c]] for c in cols if c in inv and inv[c] in cur]


def _col_stats(t: pa.Table, cols) -> dict:
    """Per-file zone map for user columns: flat ``cs0_{col}`` (min) /
    ``cs1_{col}`` (max) manifest keys — the generalization of the
    fp_*/tmin/tmax stats to arbitrary numeric/string columns, so
    non-spatial predicates can prune FILES before any open (parquet
    row-group stats still prune inside kept files). All-null columns
    record nothing (conservative keep at prune time)."""
    import pyarrow.compute as pc

    out: dict = {}
    for c in cols or ():
        mn = mx = nulls = None  # keys always present → uniform records
        if c in t.column_names and t.num_rows:
            arr = t[c]
            if not (
                pa.types.is_integer(arr.type)
                or pa.types.is_floating(arr.type)
                or pa.types.is_string(arr.type)
                or pa.types.is_large_string(arr.type)
            ):
                raise ValueError(
                    f"stats_cols: {c!r} has type {arr.type} — zone maps "
                    "support numeric and string columns"
                )
            nulls = int(arr.null_count)
            if arr.null_count < len(arr):
                mn = pc.min(arr).as_py()
                mx = pc.max(arr).as_py()
        out[f"cs0_{c}"] = mn
        out[f"cs1_{c}"] = mx
        out[f"csn_{c}"] = nulls
    return out


def _range_prune_keep(rec: dict, col_ranges, phys_of) -> bool:
    """Conservative file test for ``column_ranges``: drop only when the
    recorded zone map PROVES no row can match; files without stats (or
    with an unmapped column) are kept."""
    if not col_ranges:
        return True
    for col, (lo, hi) in col_ranges.items():
        p = phys_of(rec, col)
        mn = rec.get(f"cs0_{p}") if p is not None else None
        mx = rec.get(f"cs1_{p}") if p is not None else None
        if mn is None or mx is None:
            continue  # no stats — keep
        if lo is not None and mx < lo:
            return False
        if hi is not None and mn > hi:
            return False
    return True


_TEMPORAL_COLS = ("datetime", "start_datetime", "end_datetime")


def _temporal_stats(t: pa.Table) -> dict:
    """Per-file temporal stats (epoch-ms ints) for manifest pruning:
    ``tmin`` = min over present (start_datetime, datetime) mins, ``tmax``
    = max over present (end_datetime, datetime) maxs. With the STAC
    item-interval rule (istart = start_datetime|datetime, iend =
    end_datetime|datetime) these bound every row's interval, so a file
    with tmin > query_end or tmax < query_start provably has no match —
    null-interval rows never match a bounded query (fill_null(False)
    comparisons), so they can't be over-pruned. {} when the table has no
    temporal columns (older stores prune spatially only)."""
    import pyarrow.compute as pc

    names = set(t.column_names)
    if not (names & set(_TEMPORAL_COLS)):
        return {}

    def _ms(col, agg):
        if col not in names:
            return None
        c = t[col]
        if c.null_count == len(c):
            return None
        v = pc.min(c) if agg == "min" else pc.max(c)
        v = v.cast(pa.timestamp("ms")).value
        return int(v) if v is not None else None

    lows = [v for v in (_ms("start_datetime", "min"), _ms("datetime", "min")) if v is not None]
    highs = [v for v in (_ms("end_datetime", "max"), _ms("datetime", "max")) if v is not None]
    return {
        "tmin": min(lows) if lows else None,
        "tmax": max(highs) if highs else None,
    }


def _temporal_prune_keep(rec: dict, trange) -> bool:
    """Keep this file for query interval ``trange=(qs_ms|None, qe_ms|None)``?
    Conservative: missing stats → keep."""
    if trange is None:
        return True
    qs, qe = trange
    tmin, tmax = rec.get("tmin"), rec.get("tmax")
    if qe is not None and tmin is not None and tmin > qe:
        return False
    if qs is not None and tmax is not None and tmax < qs:
        return False
    return True


def _parse_trange(datetime) -> "tuple[int | None, int | None] | None":
    """STAC datetime string or (lo, hi) pair → (epoch_ms|None, epoch_ms|None)."""
    if datetime is None:
        return None
    if isinstance(datetime, str):
        from ..query import normalize_datetime

        qs, qe = normalize_datetime(datetime)
    else:
        qs, qe = datetime
    to_ms = lambda v: None if v is None else int(np.datetime64(v, "ms").astype("int64"))  # noqa: E731
    return (to_ms(qs), to_ms(qe))


def prune_plan(
    out_dir: str,
    bbox: tuple[float, float, float, float] | None,
    datetime=None,
    *,
    version: int | None = None,
    column_ranges: "dict[str, tuple] | None" = None,
) -> tuple[list[str], int]:
    """(kept file paths, total files) for a query bbox and/or datetime
    interval (STAC string or (start, end) pair) and/or ``column_ranges``
    (``{col: (lo, hi)}``, either bound None = open; closed intervals) —
    the driver-side pruning decision, exposed separately so
    callers/metrics/tests can see the selectivity without running the
    read. Temporal pruning uses the per-file tmin/tmax manifest stats
    (see ``_temporal_stats``); column-range pruning uses the zone maps
    recorded by ``write_clustered(stats_cols=...)`` (column names map
    through schema evolution by id); files written before any of these
    stats existed are conservatively kept."""
    out_dir = os.path.abspath(out_dir)
    _repair_if_crashed(out_dir)  # replay an orphaned publish journal
    recs = sorted(
        SpatialManifest(out_dir, version=version).completed().values(),
        key=lambda r: r["partition_id"],
    )
    total = len(recs)
    trange = _parse_trange(datetime)
    if bbox is None and trange is None and not column_ranges:
        return [os.path.join(out_dir, r["file"]) for r in recs], total
    phys_of = lambda rec, col: col  # noqa: E731 — identity store default
    if column_ranges:
        sv = None if version is None or version == store_version(out_dir) else version
        desc = evolution.load_schema(out_dir, sv)
        if desc is not None:
            live = {c["name"]: c for c in desc["columns"]}

            def phys_of(rec, col):  # noqa: F811
                c = live.get(col)
                if c is None:
                    return None  # unknown logical column — keep files
                return evolution.names_at(
                    desc, int(rec.get("schema_v", 0))
                ).get(c["id"])

    kept = []
    boxes = _query_boxes(tuple(bbox)) if bbox is not None else None
    for r in recs:
        if r["rows"] == 0:
            continue
        if not _temporal_prune_keep(r, trange):
            continue
        if not _range_prune_keep(r, column_ranges, phys_of):
            continue
        if boxes is None:
            kept.append(os.path.join(out_dir, r["file"]))
            continue
        if r["xmin"] is None:
            continue
        for qx0, qy0, qx1, qy1 in boxes:
            if r["xmin"] <= qx1 and r["xmax"] >= qx0 and r["ymin"] <= qy1 and r["ymax"] >= qy0:
                kept.append(os.path.join(out_dir, r["file"]))
                break
    return kept, total


def count_clustered(
    out_dir: str,
    bbox: tuple[float, float, float, float] | None = None,
    *,
    column_ranges: "dict[str, tuple] | None" = None,
    detail: bool = False,
    version: int | None = None,
):
    """COUNT(*) over a bbox and/or column ranges without reading matching
    files: the metadata-first aggregate (the lakehouse COUNT pushdown).

    - no predicate → sum of manifest row counts, zero data IO.
    - A file whose manifest envelope is CONTAINED in the query box
      contributes its full manifest count with zero IO — containment is
      sufficient because every row's footprint stats lie inside the
      envelope: fp_xmin ≤ env.xmax ≤ qx1 and fp_xmax ≥ env.xmin ≥ qx0
      (same for y), which is exactly the row-match test.
    - ``column_ranges={col: (lo, hi)}`` (closed intervals, nulls never
      match) uses the zone maps + null counts recorded by
      ``write_clustered(stats_cols=...)``: a file whose [min, max] lies
      inside the range with zero nulls is fully counted from metadata;
      a file whose [min, max] misses the range (or is all-null) is
      excluded; only straddling files scan. A column added by a schema
      evolve after a file was written counts by its recorded DEFAULT
      (the reconciled logical value of every row in that file).
    - Only boundary/straddling files are scanned, and only the stat +
      predicate columns, via a local pyarrow ``count_rows`` with the row
      filter — parquet row groups prune on stats first. At any store
      size the scanned set is the query PERIMETER, not its area.

    ``detail=True`` returns (count, n_full_files, n_partial_files).
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    out_dir = os.path.abspath(out_dir)
    _repair_if_crashed(out_dir)
    recs = sorted(
        SpatialManifest(out_dir, version=version).completed().values(),
        key=lambda r: r["partition_id"],
    )
    if bbox is None and not column_ranges:
        total = sum(r["rows"] for r in recs)
        return (total, len(recs), 0) if detail else total
    desc = None
    live = {}
    if column_ranges:
        sv = None if version is None or version == store_version(out_dir) else version
        desc = evolution.load_schema(out_dir, sv)
        if desc is not None:
            live = {c["name"]: c for c in desc["columns"]}

    boxes = _query_boxes(tuple(bbox)) if bbox is not None else None
    full, partial = [], []
    # partial files carry their per-file physical predicate columns
    partial_exprs: list = []
    for r in recs:
        if r["rows"] == 0:
            continue
        # --- spatial classification -------------------------------------
        if boxes is None:
            sp = "contained"
        elif r["xmin"] is None:
            continue
        else:
            sp = "none"
            for qx0, qy0, qx1, qy1 in boxes:
                if r["xmin"] <= qx1 and r["xmax"] >= qx0 and r["ymin"] <= qy1 and r["ymax"] >= qy0:
                    sp = "overlap"
                    if qx0 <= r["xmin"] and r["xmax"] <= qx1 and qy0 <= r["ymin"] and r["ymax"] <= qy1:
                        sp = "contained"
                        break
            if sp == "none":
                continue
        # --- per-column range classification ----------------------------
        excluded = False
        col_partial_fields: list = []  # (physical name, lo, hi)
        for col, (lo, hi) in (column_ranges or {}).items():
            p = col
            if desc is not None:
                c = live.get(col)
                if c is None:
                    raise KeyError(f"count: no live column {col!r}")
                p = evolution.names_at(
                    desc, int(r.get("schema_v", 0))
                ).get(c["id"])
                if p is None:
                    # column added after this file: every row's logical
                    # value is the recorded default
                    d = c.get("default")
                    ok = (
                        d is not None
                        and (lo is None or d >= lo)
                        and (hi is None or d <= hi)
                    )
                    if not ok:
                        excluded = True
                        break
                    continue  # default inside range: column fully matches
            mn, mx = r.get(f"cs0_{p}"), r.get(f"cs1_{p}")
            nulls = r.get(f"csn_{p}")
            if mn is None or mx is None:
                if nulls is not None and int(nulls) >= int(r["rows"]):
                    excluded = True  # all-null: no row matches
                    break
                col_partial_fields.append((p, lo, hi))  # no stats: scan
                continue
            if (lo is not None and mx < lo) or (hi is not None and mn > hi):
                excluded = True
                break
            inside = (lo is None or mn >= lo) and (hi is None or mx <= hi)
            if inside and (nulls is not None and int(nulls) == 0):
                continue  # column fully matches from metadata
            col_partial_fields.append((p, lo, hi))
        if excluded:
            continue
        if sp == "contained" and not col_partial_fields:
            full.append(r)
        else:
            partial.append(r)
            parts = []
            if boxes is not None:
                bparts = []
                for qx0, qy0, qx1, qy1 in boxes:
                    bparts.append(
                        (pc.field("fp_xmin") <= pc.scalar(qx1))
                        & (pc.field("fp_xmax") >= pc.scalar(qx0))
                        & (pc.field("fp_ymin") <= pc.scalar(qy1))
                        & (pc.field("fp_ymax") >= pc.scalar(qy0))
                    )
                be = bparts[0]
                for b_ in bparts[1:]:
                    be = be | b_
                parts.append(be)
            for p, lo, hi in col_partial_fields:
                if lo is not None:
                    parts.append(pc.field(p) >= pc.scalar(lo))
                if hi is not None:
                    parts.append(pc.field(p) <= pc.scalar(hi))
                if lo is None and hi is None:
                    parts.append(pc.field(p).is_valid())
            expr = parts[0] if parts else None
            for p_ in parts[1:]:
                expr = expr & p_
            partial_exprs.append(expr)

    count = sum(r["rows"] for r in full)
    for r, expr in zip(partial, partial_exprs):
        dset = pads.dataset(os.path.join(out_dir, r["file"]))
        count += (
            dset.count_rows(filter=expr) if expr is not None else dset.count_rows()
        )
    return (count, len(full), len(partial)) if detail else count


def stat_clustered(out_dir: str, col: str, agg: str = "minmax",
                   *, version: "int | None" = None):
    """Exact global MIN/MAX (and null count) of a zone-mapped column
    from the manifest alone — zero data IO (global min = min of per-file
    mins; exact, not an estimate). ``agg``: "min" | "max" | "nulls" |
    "minmax" (→ dict). Raises if the column has no recorded zone map
    (the store wasn't written with it in ``stats_cols``)."""
    out_dir = os.path.abspath(out_dir)
    _repair_if_crashed(out_dir)
    recs = [
        r
        for r in SpatialManifest(out_dir, version=version).completed().values()
        if r["rows"] > 0
    ]
    if not recs:
        raise FileNotFoundError(f"no clustered store at {out_dir}")
    sv = None if version is None or version == store_version(out_dir) else version
    desc = evolution.load_schema(out_dir, sv)

    def phys(r):
        if desc is None:
            return col
        live = {c["name"]: c for c in desc["columns"]}
        c = live.get(col)
        if c is None:
            raise KeyError(f"stat: no live column {col!r}")
        return evolution.names_at(desc, int(r.get("schema_v", 0))).get(c["id"])

    mins, maxs, nulls = [], [], 0
    for r in recs:
        p = phys(r)
        if p is None or f"cs0_{p}" not in r:
            raise ValueError(
                f"stat_clustered: no zone map for {col!r} in "
                f"{r['file']} — write the store with stats_cols=[{col!r}]"
            )
        if r[f"cs0_{p}"] is not None:
            mins.append(r[f"cs0_{p}"])
            maxs.append(r[f"cs1_{p}"])
        nv = r.get(f"csn_{p}")
        nulls += int(nv) if nv is not None else 0
    out = {
        "min": min(mins) if mins else None,
        "max": max(maxs) if maxs else None,
        "nulls": nulls,
    }
    if agg == "minmax":
        return out
    if agg in out:
        return out[agg]
    raise ValueError(f"stat_clustered: unknown agg {agg!r}")


def explain_clustered(
    out_dir: str,
    *,
    bbox: "tuple[float, float, float, float] | None" = None,
    datetime=None,
    column_ranges: "dict[str, tuple] | None" = None,
    version: "int | None" = None,
) -> dict:
    """EXPLAIN for the store's file-prune decision: how many files each
    pruning level (spatial envelope / temporal tmin-tmax / column zone
    maps) would keep on its own, and the final combined plan — the
    operational introspection a scheduler uses to judge layout health
    before running the read. Manifest-only, zero data IO."""
    out_dir = os.path.abspath(out_dir)
    total = len(
        SpatialManifest(out_dir, version=version).completed()
    )
    out = {"files_total": total}
    if bbox is not None:
        out["kept_spatial"] = len(
            prune_plan(out_dir, bbox, version=version)[0]
        )
    if datetime is not None:
        out["kept_temporal"] = len(
            prune_plan(out_dir, None, datetime=datetime, version=version)[0]
        )
    if column_ranges:
        out["kept_zonemap"] = len(
            prune_plan(
                out_dir, None, column_ranges=column_ranges, version=version
            )[0]
        )
    kept, _ = prune_plan(
        out_dir, bbox, datetime=datetime, version=version,
        column_ranges=column_ranges,
    )
    out["kept_combined"] = len(kept)
    out["selectivity"] = round(len(kept) / total, 4) if total else 0.0
    return out


def read_clustered(
    out_dir: str,
    *,
    bbox: tuple[float, float, float, float] | None = None,
    datetime=None,
    columns: list[str] | None = None,
    version: int | None = None,
    column_ranges: "dict[str, tuple] | None" = None,
    **read_kwargs,
):
    """Bbox- and datetime-pruned streaming read of a clustered store.

    ``column_ranges={col: (lo, hi)}`` additionally prunes FILES via the
    zone maps recorded by ``write_clustered(stats_cols=...)`` — a
    conservative prefilter (kept files may still contain non-matching
    rows); pair with ``filter=`` for row-level exactness.

    ``version=N`` time-travels: the read plans against the archived
    manifest snapshot N (0 = the initial write; each published mutation
    is +1) — retained data files of that version are still on disk until
    ``vacuum_clustered`` reclaims them, so the read is exactly the store
    as of that version.

    File level: only manifest-intersecting files enter the read plan
    (spatial envelope + tmin/tmax temporal stats).
    Row-group + row level: the same box test is pushed down as a pyarrow
    filter expression on the ``fp_*`` stat columns (parquet min/max stats
    skip whole row groups; surviving rows are exact box matches, closed
    intervals on both sides — identical semantics to the manifest test).
    ``datetime`` (STAC string or (start, end)) prunes FILES only — the
    exact row-level interval rule stays with ``search()`` / a caller
    ``filter=`` (read_clustered composes with both).
    Returns an empty Dataset (schema-correct) when nothing intersects.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    out_dir = os.path.abspath(out_dir)
    paths, _total = prune_plan(
        out_dir, bbox, datetime=datetime, version=version,
        column_ranges=column_ranges,
    )
    sv = None if version is None or version == store_version(out_dir) else version
    desc = evolution.load_schema(out_dir, sv)
    if not paths:
        recs = sorted(
            SpatialManifest(out_dir, version=version).completed().values(),
            key=lambda r: r["partition_id"],
        )
        if not recs:
            raise FileNotFoundError(f"no clustered store at {out_dir}")
        schema = pq.read_schema(os.path.join(out_dir, recs[0]["file"]))
        empty = schema.empty_table()
        if desc is not None:
            empty = evolution.reconcile_table(
                empty, desc, recs[0].get("schema_v", 0), columns
            )
        elif columns:
            empty = empty.select(columns)
        return rd.from_arrow(empty)
    user_expr = read_kwargs.pop("filter", None)  # caller prefilter, LIVE names
    bbox_expr = None
    if bbox is not None:
        parts = []
        for qx0, qy0, qx1, qy1 in _query_boxes(tuple(bbox)):
            parts.append(
                (pc.field("fp_xmin") <= pc.scalar(qx1))
                & (pc.field("fp_xmax") >= pc.scalar(qx0))
                & (pc.field("fp_ymin") <= pc.scalar(qy1))
                & (pc.field("fp_ymax") >= pc.scalar(qy0))
            )
        bbox_expr = parts[0]
        for p in parts[1:]:
            bbox_expr = bbox_expr | p
    expr = user_expr
    if bbox_expr is not None:
        expr = bbox_expr if expr is None else (expr & bbox_expr)
    if desc is None:
        # identity store (never evolved): one scan, physical == logical.
        # The filter needs the fp_* columns during the scan; re-project
        # after if the caller asked for a narrower set.
        scan_columns = columns
        if columns is not None and expr is not None:
            need = ["fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
            scan_columns = list(dict.fromkeys(list(columns) + need))
        ds = rd.read_parquet(paths, columns=scan_columns, filter=expr, **read_kwargs)
        if columns is not None and scan_columns != columns:
            ds = ds.select_columns(columns)
        return ds
    # evolved store: files group by the schema version they were written
    # under; each group scans its PHYSICAL column names and a per-batch
    # reconcile projects to the live logical schema (rename by column id,
    # fill added defaults, drop retired columns). The fp_* filter columns
    # are internal and identical across every schema version, so the bbox
    # pushdown is schema-agnostic — but a CALLER filter is written in
    # LIVE logical names, which only exist physically in files written at
    # the live schema version: pushing it into an older group's scan
    # would fail (renamed column) or silently misfilter. Older groups
    # therefore scan with the bbox filter only and apply the caller
    # filter AFTER reconcile (pyarrow Table.filter takes the same
    # Expression) over the full logical schema, re-projecting afterward
    # — exact semantics, at the cost of row-group pushdown on just the
    # old-schema tail (COMPACT/maintain rewrites restore it).
    file_sv = {
        r["file"]: int(r.get("schema_v", 0))
        for r in SpatialManifest(out_dir, version=version).completed().values()
    }
    groups: dict[int, list[str]] = {}
    for p in paths:
        groups.setdefault(file_sv.get(os.path.basename(p), 0), []).append(p)
    live_v = int(desc["v"])
    pieces = []
    for sv in sorted(groups):
        if sv == live_v or user_expr is None:
            # physical == logical (or nothing caller-side): full pushdown
            scan_columns = evolution.physical_read_columns(desc, sv, columns)
            if scan_columns is not None and expr is not None:
                need = ["fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
                scan_columns = list(dict.fromkeys(scan_columns + need))
            part = rd.read_parquet(
                groups[sv], columns=scan_columns, filter=expr, **read_kwargs
            ).map_batches(
                evolution.reconcile_table,
                batch_format="pyarrow",
                fn_kwargs={"desc": desc, "schema_v": sv, "columns": columns},
            )
        else:
            _ue, _cols = user_expr, columns

            def _reconcile_filter(t, *, desc, schema_v, __ue=_ue,
                                  __cols=_cols):
                t = evolution.reconcile_table(t, desc, schema_v)
                t = t.filter(__ue)
                if __cols is not None:
                    keep = [c for c in __cols if c in t.column_names]
                    t = t.select(keep)
                return t

            part = rd.read_parquet(
                groups[sv], filter=bbox_expr, **read_kwargs
            ).map_batches(
                _reconcile_filter,
                batch_format="pyarrow",
                fn_kwargs={"desc": desc, "schema_v": sv},
            )
        pieces.append(part)
    ds = pieces[0]
    for p in pieces[1:]:
        ds = ds.union(p)
    return ds


def merge_clustered(
    out_dir: str,
    new_ds,
    *,
    footprints_derived: bool = False,
    bits: int = 16,
    bbox_col: str | None = None,
) -> list[dict]:
    """Incremental ingest into an existing clustered store (the lakehouse
    MERGE): each new row routes to the file owning its zkey range, and
    ONLY touched files are rewritten (read old + merge + re-sort + atomic
    rename) — untouched files and their manifest records stay byte-
    identical. Returns the updated manifest records.

    Ownership: manifest files sorted by zmin; file i owns keys in
    [zmin_i, zmin_{i+1}), the first file also owns everything below. The
    routing boundaries are a tiny broadcast array, so the only exchange
    is the ``groupby`` of NEW rows by target file — incremental cost is
    O(new rows + touched files), independent of store size. Periodic
    re-clustering (``write_clustered`` to a fresh dir) is the compaction
    path once merged files grow past the target size.
    """
    import pandas as pd
    import ray

    out_dir = os.path.abspath(out_dir)
    man = SpatialManifest(out_dir)
    recs = sorted(man.completed().values(), key=lambda r: r["partition_id"])
    if not recs:
        raise FileNotFoundError(f"no clustered store at {out_dir}")
    with _StoreLock(out_dir):
        if _apply_journal(out_dir):  # finish a crashed publish first
            recs = sorted(man.completed().values(), key=lambda r: r["partition_id"])
        own = sorted(
            (r for r in recs if r["zmin"] is not None), key=lambda r: r["zmin"]
        )
        if not own:
            raise ValueError(f"{out_dir}: store has no non-empty files to merge into")
        bounds = np.asarray([r["zmin"] for r in own], np.int64)  # sorted
        pids = np.asarray([r["partition_id"] for r in own], np.int64)
        bounds_ref = ray.put((bounds, pids))
        # evolved store: old file bytes reconcile to the live logical
        # schema before the merge concat (new_ds arrives in live names),
        # and the rewritten file is stamped with the current schema_v —
        # merges opportunistically upgrade touched files
        desc = evolution.load_schema(out_dir)
        cur_sv = 0 if desc is None else int(desc["v"])
        scols = _live_stats_cols(out_dir, desc)

        zkw = _layout_kwargs(out_dir)

        def route(batch: pa.Table) -> pa.Table:
            b = _zkey_stage(
                batch, derive=not footprints_derived, bits=bits,
                bbox_col=bbox_col, **zkw,
            )
            bnds, ps = ray.get(bounds_ref) if isinstance(bounds_ref, ray.ObjectRef) else bounds_ref
            z = b["_zkey"].to_numpy()
            slot = np.maximum(np.searchsorted(bnds, z, side="right") - 1, 0)
            return b.append_column("_target", pa.array(ps[slot], pa.int64()))

        by_rec = {r["partition_id"]: r for r in recs}

        def rewrite(g: pa.Table) -> pa.Table:
            # Stage the merged file under a tmp name — published files are
            # NEVER touched until the journaled publish below, so a crash
            # anywhere in here leaves the store exactly as it was (the r3
            # in-place rename left manifest bbox/zkey stats stale for
            # already-rewritten files, silently mis-pruning reads).
            # Arrow end-to-end: nested columns (list/struct item payloads)
            # never round-trip through pandas, which mangled them.
            pid = int(g["_target"][0].as_py())
            fname = by_rec[pid]["file"]  # actual name (may be gen-numbered)
            old = pq.read_table(os.path.join(out_dir, fname))
            if desc is not None:
                old = evolution.reconcile_table(
                    old, desc, int(by_rec[pid].get("schema_v", 0))
                )
            add = g.drop_columns(["_target"]).select(
                old.column_names
            ).cast(old.schema)
            merged = pa.concat_tables([old, add])
            order = np.argsort(merged["_zkey"].to_numpy(), kind="stable")
            merged = merged.take(pa.array(order))
            tmp_name = f".merge.{os.getpid()}.{fname}"
            pq.write_table(
                merged, os.path.join(out_dir, tmp_name),
                compression="zstd", row_group_size=16384,
            )
            z = merged["_zkey"].to_numpy()
            ts = _temporal_stats(merged)
            return pa.table(
                {
                    "partition_id": [pid],
                    "file": [fname],
                    "staged": [tmp_name],
                    "rows": [merged.num_rows],
                    "xmin": [float(np.min(merged["fp_xmin"].to_numpy()))],
                    "ymin": [float(np.min(merged["fp_ymin"].to_numpy()))],
                    "xmax": [float(np.max(merged["fp_xmax"].to_numpy()))],
                    "ymax": [float(np.max(merged["fp_ymax"].to_numpy()))],
                    "zmin": [int(z.min())],
                    "zmax": [int(z.max())],
                    "schema_v": [cur_sv],
                    **{k: [v] for k, v in ts.items()},
                    **{k: [v] for k, v in _col_stats(merged, scols).items()},
                }
            )

        updated = (
            new_ds.map_batches(route, batch_format="pyarrow")
            .groupby("_target")
            .map_groups(rewrite, batch_format="pyarrow")
            .to_pandas()
        )
        # rewritten files publish under NEW generation names (never onto
        # the old name): the pre-merge version's files stay intact on
        # disk, referenced by the archived manifest, until vacuum
        gen = _next_gen(out_dir, recs)
        steps = []
        for rec in updated.to_dict("records"):
            staged = rec.pop("staged")
            pid = int(rec["partition_id"])
            rec["file"] = f"part-g{gen:03d}-{pid:05d}.parquet"
            steps.append(["rename", staged, rec["file"]])
            by_rec[pid] = {
                k: _norm_stat(k, v)
                for k, v in rec.items()
            }
        # journaled publish: the journal (renames + full new manifest) is
        # durable before any published file moves, so a crash at any point
        # is repaired by replay at the next mutation/read
        _write_journal(out_dir, steps, [by_rec[k] for k in sorted(by_rec)])
        _apply_journal(out_dir)
        return [by_rec[k] for k in sorted(by_rec)]


def compact_clustered(
    out_dir: str,
    *,
    target_rows: int = 16384,
    min_fill: float = 0.5,
    max_fill: float = 2.0,
) -> list[dict]:
    """Compaction pass for a clustered store: coalesce runs of adjacent
    under-filled files (< ``min_fill``·target) and split oversized ones
    (> ``max_fill``·target) into ~target_rows chunks; everything else is
    only RENAMED into the new id sequence (metadata op, no IO on the
    bytes). Completes the write → merge → compact lakehouse cycle:
    repeated ``merge_clustered`` calls grow hot files and leave sparse
    ones; compaction restores uniform file sizes so prune selectivity
    and per-task read costs stay predictable.

    Adjacent files are zkey-contiguous by construction (the original
    write was one global sort; merges only insert keys INSIDE a file's
    ownership range), so coalescing a run preserves global order — the
    rewrite re-sorts the concatenation anyway as a cheap invariant.
    Partition ids are reassigned 0..n-1 in zkey order.

    Crash safety: output files carry a GENERATION number
    (``part-g{gen:03d}-{pid:05d}.parquet``, gen = 1 + highest existing)
    so every journaled step's source namespace (old gen + unique tmp
    names) is disjoint from its destination namespace (new gen) — a
    replayed step can always tell "already done" (source gone) from "to
    do", making the journal idempotent under crash-at-any-point +
    repair. The journal (full rename/delete plan + complete new
    manifest) is durable before any published file moves.
    """
    import ray

    out_dir = os.path.abspath(out_dir)
    man = SpatialManifest(out_dir)
    recs = sorted(man.completed().values(), key=lambda r: r["partition_id"])
    if not recs:
        raise FileNotFoundError(f"no clustered store at {out_dir}")
    with _StoreLock(out_dir):
        if _apply_journal(out_dir):  # finish a crashed publish first
            recs = sorted(man.completed().values(), key=lambda r: r["partition_id"])
        gen = _next_gen(out_dir, recs)
        # evolved store: inputs of mixed schema versions reconcile to the
        # live logical schema before the concat; rewritten chunks carry
        # the current schema_v (kept files keep theirs)
        desc = evolution.load_schema(out_dir)
        cur_sv = 0 if desc is None else int(desc["v"])
        sv_of = {r["file"]: int(r.get("schema_v", 0)) for r in recs}
        scols = _live_stats_cols(out_dir, desc)

        # group planning on the tiny manifest: greedy run-coalesce + splits
        groups: list[dict] = []  # {"files": [...], "rows": n, "action": ...}
        run: list[dict] = []
        run_rows = 0

        def flush_run():
            nonlocal run, run_rows
            if run:
                groups.append(
                    {
                        "files": [r["file"] for r in run],
                        "action": "rewrite" if len(run) > 1 else "keep",
                    }
                )
                run, run_rows = [], 0

        for r in recs:
            if r["rows"] > max_fill * target_rows:
                flush_run()
                groups.append({"files": [r["file"]], "action": "split"})
                continue
            if r["rows"] < min_fill * target_rows:
                if run_rows + r["rows"] > target_rows and run:
                    flush_run()
                run.append(r)
                run_rows += r["rows"]
                if run_rows >= min_fill * target_rows:
                    flush_run()
            else:
                flush_run()
                groups.append({"files": [r["file"]], "action": "keep"})
        flush_run()

        @ray.remote
        def rework(files: list[str], action: str) -> list[dict]:
            tables = [pq.read_table(os.path.join(out_dir, f)) for f in files]
            if desc is not None:
                tables = [
                    evolution.reconcile_table(t, desc, sv_of.get(f, 0))
                    for t, f in zip(tables, files)
                ]
            merged = pa.concat_tables(tables)
            order = np.argsort(merged["_zkey"].to_numpy(), kind="stable")
            merged = merged.take(pa.array(order))
            chunks = []
            if action == "split":
                n_parts = max(2, int(np.ceil(merged.num_rows / target_rows)))
                step = int(np.ceil(merged.num_rows / n_parts))
                for s in range(0, merged.num_rows, step):
                    chunks.append(merged.slice(s, step))
            else:
                chunks = [merged]
            out = []
            for i, c in enumerate(chunks):
                # store-relative tmp name — staged entries are tagged by
                # the journal step kind, never inferred from the path
                # shape (the r3 isabs() inference broke for relative
                # out_dir CLI invocations, stranding the store mid-publish)
                tmp = f".compact.{os.getpid()}.{files[0]}.{i}"
                pq.write_table(
                    c, os.path.join(out_dir, tmp),
                    compression="zstd", row_group_size=16384,
                )
                z = c["_zkey"].to_numpy()
                out.append(
                    {
                        "tmp": tmp,
                        "schema_v": cur_sv,
                        **_col_stats(c, scols),
                        "rows": c.num_rows,
                        "xmin": float(np.min(c["fp_xmin"].to_numpy())),
                        "ymin": float(np.min(c["fp_ymin"].to_numpy())),
                        "xmax": float(np.max(c["fp_xmax"].to_numpy())),
                        "ymax": float(np.max(c["fp_ymax"].to_numpy())),
                        "zmin": int(z.min()),
                        "zmax": int(z.max()),
                        **_temporal_stats(c),
                    }
                )
            return out

        by_file = {r["file"]: r for r in recs}
        futures = []
        for g in groups:
            if g["action"] in ("rewrite", "split"):
                g["fut"] = rework.remote(g["files"], g["action"])
                futures.append(g["fut"])

        # assemble the new sequence in zkey order; every step's src (old
        # gen name or unique tmp) is disjoint from every dst (new gen
        # name), so the journaled plan replays idempotently
        new_recs: list[dict] = []
        steps: list[list[str]] = []
        pid = 0
        for g in groups:
            if g["action"] == "keep":
                r = dict(by_file[g["files"][0]])
                old = r["file"]
                r["partition_id"] = pid
                r["file"] = f"part-g{gen:03d}-{pid:05d}.parquet"
                # hard-link (not rename): the old name stays valid for
                # the archived pre-compact version; bytes are shared
                steps.append(["link", old, r["file"]])
                new_recs.append(r)
                pid += 1
            else:
                for piece in ray.get(g["fut"]):
                    rec = {
                        "partition_id": pid,
                        "file": f"part-g{gen:03d}-{pid:05d}.parquet",
                        **{k: v for k, v in piece.items() if k != "tmp"},
                    }
                    steps.append(["rename", piece["tmp"], rec["file"]])
                    new_recs.append(rec)
                    pid += 1
                # consumed inputs are NOT deleted: the pre-compact
                # version still references them; vacuum reclaims them
                # once that version drops out of retention
        _write_journal(out_dir, steps, new_recs)
        _apply_journal(out_dir)
        return new_recs


def delete_clustered(
    out_dir: str,
    *,
    bbox: "tuple[float, float, float, float] | None" = None,
    datetime=None,
    ids=None,
    id_col: str = "id",
    predicate=None,
    _candidate_pids: "set[int] | None" = None,
) -> dict:
    """Delete rows from a clustered store (the lakehouse DELETE): rows
    matching ALL provided conditions are removed, touched files are
    rewritten (or dropped when emptied), untouched files stay
    byte-identical, and the change publishes through the same durable
    journal as merge/compact (crash at any point leaves either the old
    or the new store, never a mix).

    Conditions (ANDed; at least one required):

    - ``bbox`` — rows whose footprint stats intersect the box (closed
      intervals, the exact test ``read_clustered`` pushes down; an
      antimeridian-crossing box splits into its two halves). Candidate
      files come from the manifest prune, so the delete is
      O(intersecting files) regardless of store size.
    - ``datetime`` — STAC datetime string or (start, end) pair; rows
      match by the item-interval rule (istart = start_datetime|datetime,
      iend = end_datetime|datetime, inclusive ends; null interval never
      matches — query.py:16). File candidates prune on tmin/tmax.
    - ``ids`` — iterable of ``id_col`` values. With no bbox/datetime the
      candidate set is EVERY file, but each task reads only the id
      column first and touches the payload bytes only on a hit — the
      scan cost is one string column, not the store. (Per-file id
      indexes were considered and rejected: a useful bloom is ~KBs/file,
      which breaks the tiny-manifest contract; delete-by-AOI/date — the
      geospatial reprocessing pattern — is the fully-pruned path.)
    - ``predicate`` — callable ``(pa.Table) -> np.ndarray[bool]`` of
      rows to delete, for conditions the stat columns can't express.
      Candidate set is every file unless bbox/datetime also given.

    Returns ``{"rows_deleted", "files_rewritten", "files_dropped",
    "files_scanned", "files_total"}``.
    """
    import ray

    if bbox is None and datetime is None and ids is None and predicate is None:
        raise ValueError(
            "delete_clustered: refusing an unconditional delete — pass "
            "bbox/datetime/ids/predicate (to truncate, delete the directory)"
        )
    out_dir = os.path.abspath(out_dir)
    man = SpatialManifest(out_dir)
    with _StoreLock(out_dir):
        _apply_journal(out_dir)  # finish a crashed publish first
        recs = sorted(man.completed().values(), key=lambda r: r["partition_id"])
        if not recs:
            raise FileNotFoundError(f"no clustered store at {out_dir}")
        trange = _parse_trange(datetime)
        if bbox is not None or trange is not None:
            kept_paths, _ = prune_plan(out_dir, bbox, datetime=datetime)
            cand_files = {os.path.basename(p) for p in kept_paths}
            cands = [r for r in recs if r["file"] in cand_files]
        else:
            cands = [r for r in recs if r["rows"] > 0]
        if _candidate_pids is not None:
            cands = [r for r in cands if r["partition_id"] in _candidate_pids]

        ids_ref = ray.put(None if ids is None else pa.array(list(ids)))
        boxes = _query_boxes(tuple(bbox)) if bbox is not None else None
        # evolved store: conditions (ids/predicate/datetime columns) are
        # expressed in the LIVE schema — old files reconcile before the
        # masks run, and their rewrites carry the current schema_v
        desc = evolution.load_schema(out_dir)
        cur_sv = 0 if desc is None else int(desc["v"])
        scols = _live_stats_cols(out_dir, desc)

        @ray.remote
        def _rework(rec: dict) -> dict:
            import pyarrow.compute as pc

            path = os.path.join(out_dir, rec["file"])
            file_sv = int(rec.get("schema_v", 0))
            idv = ray.get(ids_ref) if isinstance(ids_ref, ray.ObjectRef) else ids_ref
            if idv is not None and bbox is None and trange is None and predicate is None:
                # id-only delete: probe the id column before paying for
                # the payload bytes (most files have no victim rows);
                # probe by the file's PHYSICAL name for the id column
                probe_col = id_col
                if desc is not None:
                    live = {c["name"]: c for c in desc["columns"]}
                    if id_col not in live:
                        raise KeyError(f"delete: no live column {id_col!r}")
                    probe_col = evolution.names_at(desc, file_sv).get(
                        live[id_col]["id"]
                    )
                    if probe_col is None:
                        # id column added after this file was written —
                        # its reconciled values are the fill default,
                        # which is not a row identity; nothing matches
                        return {"action": "noop", "file": rec["file"], "deleted": 0}
                probe = pq.read_table(path, columns=[probe_col])
                if not pc.any(
                    pc.is_in(probe[probe_col], value_set=idv)
                ).as_py():
                    return {"action": "noop", "file": rec["file"], "deleted": 0}
            t = pq.read_table(path)
            if desc is not None:
                t = evolution.reconcile_table(t, desc, file_sv)
            n = t.num_rows
            dmask = np.ones(n, bool)
            if boxes is not None:
                x0 = t["fp_xmin"].to_numpy()
                y0 = t["fp_ymin"].to_numpy()
                x1 = t["fp_xmax"].to_numpy()
                y1 = t["fp_ymax"].to_numpy()
                hit = np.zeros(n, bool)
                for qx0, qy0, qx1, qy1 in boxes:
                    hit |= (x0 <= qx1) & (x1 >= qx0) & (y0 <= qy1) & (y1 >= qy0)
                dmask &= hit
            if trange is not None:
                qs, qe = trange
                names = set(t.column_names)
                nat = np.full(n, np.datetime64("NaT", "ms"))
                as_np = lambda c: (  # noqa: E731
                    t[c].cast(pa.timestamp("ms")).to_numpy(zero_copy_only=False)
                    if c in names else nat
                )
                dt = as_np("datetime")
                istart = np.where(np.isnat(sdt := as_np("start_datetime")), dt, sdt)
                iend = np.where(np.isnat(edt := as_np("end_datetime")), dt, edt)
                # identical NaT semantics to search() (query.py:241-248):
                # datetime64-space comparisons, NaT → False
                ok = ~np.isnat(istart) | ~np.isnat(iend)
                if qs is not None:
                    ok &= iend >= np.datetime64(qs, "ms")
                if qe is not None:
                    ok &= istart <= np.datetime64(qe, "ms")
                dmask &= ok
            if idv is not None:
                dmask &= pc.is_in(t[id_col], value_set=idv).to_numpy(
                    zero_copy_only=False
                )
            if predicate is not None:
                dmask &= np.asarray(predicate(t), bool)
            ndel = int(dmask.sum())
            if ndel == 0:
                return {"action": "noop", "file": rec["file"], "deleted": 0}
            keep = t.filter(pa.array(~dmask))
            if keep.num_rows == 0:
                return {"action": "drop", "file": rec["file"], "deleted": ndel}
            tmp = f".delete.{os.getpid()}.{rec['file']}"
            pq.write_table(
                keep, os.path.join(out_dir, tmp),
                compression="zstd", row_group_size=16384,
            )
            z = keep["_zkey"].to_numpy()
            return {
                "action": "rewrite",
                "file": rec["file"],
                "deleted": ndel,
                "tmp": tmp,
                "stats": {
                    "partition_id": rec["partition_id"],
                    "file": rec["file"],
                    "schema_v": cur_sv if desc is not None else file_sv,
                    **_col_stats(keep, scols),
                    "rows": keep.num_rows,
                    "xmin": float(np.min(keep["fp_xmin"].to_numpy())),
                    "ymin": float(np.min(keep["fp_ymin"].to_numpy())),
                    "xmax": float(np.max(keep["fp_xmax"].to_numpy())),
                    "ymax": float(np.max(keep["fp_ymax"].to_numpy())),
                    "zmin": int(z.min()),
                    "zmax": int(z.max()),
                    **_temporal_stats(keep),
                },
            }

        results = ray.get([_rework.remote(r) for r in cands])
        by_rec = {r["partition_id"]: r for r in recs}
        by_file = {r["file"]: r for r in recs}
        gen = _next_gen(out_dir, recs)
        steps: list[list[str]] = []
        deleted = rewrote = dropped = 0
        for res in results:
            deleted += res["deleted"]
            pid = by_file[res["file"]]["partition_id"]
            if res["action"] == "rewrite":
                # publish under a NEW generation name — the pre-delete
                # version's file stays intact for time travel
                stats = dict(res["stats"])
                stats["file"] = f"part-g{gen:03d}-{int(pid):05d}.parquet"
                steps.append(["rename", res["tmp"], stats["file"]])
                by_rec[pid] = stats
                rewrote += 1
            elif res["action"] == "drop":
                # retired, not deleted: drops out of the new manifest,
                # bytes reclaimed by vacuum once out of retention
                del by_rec[pid]
                dropped += 1
        if rewrote or dropped:
            _write_journal(out_dir, steps, [by_rec[k] for k in sorted(by_rec)])
            _apply_journal(out_dir)
        return {
            "rows_deleted": deleted,
            "files_rewritten": rewrote,
            "files_dropped": dropped,
            "files_scanned": len(cands),
            "files_total": len(recs),
        }


def store_versions(out_dir: str) -> list[dict]:
    """Readable snapshot listing (the time-travel catalog): one row per
    retained version with its file and row counts, newest (= current)
    last. Driver-trivial — manifests are one JSON line per file."""
    out_dir = os.path.abspath(out_dir)
    _repair_if_crashed(out_dir)
    out = []
    cur = store_version(out_dir)
    for v in _history_versions(out_dir) + [cur]:
        recs = SpatialManifest(out_dir, version=v).completed().values()
        out.append(
            {
                "version": v,
                "files": len(recs),
                "rows": sum(r["rows"] for r in recs),
                "current": v == cur,
            }
        )
    return out


def clone_clustered(
    src_dir: str, dst_dir: str, *, version: "int | None" = None
) -> dict:
    """Zero-copy snapshot clone (the lakehouse BRANCH): hard-link the
    chosen version's data files into ``dst_dir`` and write a fresh
    manifest + schema for them. O(files) metadata work, zero data IO —
    bytes are shared until either side's mutations replace them (both
    stores only ever write NEW generation names, never in place, so
    shared inodes are safe; each side's vacuum removes only its own
    names and the kernel frees bytes when the last link drops).

    The clone starts its own history at version 0 (= the cloned
    snapshot); the source is untouched. The experiment-branch pattern: a
    curation run mutates the clone freely, diffable back against the
    source with ``changes_clustered`` semantics per store.
    """
    src_dir = os.path.abspath(src_dir)
    dst_dir = os.path.abspath(dst_dir)
    _repair_if_crashed(src_dir)
    man = SpatialManifest(src_dir, version=version)
    recs = sorted(man.completed().values(), key=lambda r: r["partition_id"])
    if not recs:
        raise FileNotFoundError(f"no clustered store at {src_dir}")
    if os.path.exists(os.path.join(dst_dir, _MANIFEST_NAME)):
        raise FileExistsError(f"{dst_dir}: already a clustered store")
    os.makedirs(dst_dir, exist_ok=True)
    for r in recs:
        if r["rows"] > 0:
            dst = os.path.join(dst_dir, r["file"])
            if not os.path.exists(dst):
                os.link(os.path.join(src_dir, r["file"]), dst)
    # store identity params travel with the clone (merge/resume checks)
    meta_src = os.path.join(src_dir, "_store_meta.json")
    if os.path.exists(meta_src):
        shutil.copyfile(meta_src, os.path.join(dst_dir, "_store_meta.json"))
    sv = None if version is None or version == store_version(src_dir) else version
    desc = evolution.load_schema(src_dir, sv)
    if desc is not None:
        evolution.write_schema_atomic(dst_dir, desc)
    dman = SpatialManifest(dst_dir)
    for r in recs:
        dman.append(dict(r))
    return {
        "files": len(recs),
        "rows": sum(r["rows"] for r in recs),
        "from_version": store_version(src_dir) if version is None else version,
    }


def maintain_clustered(
    out_dir: str,
    *,
    target_rows: int = 16384,
    min_fill: float = 0.5,
    max_fill: float = 2.0,
    rework_threshold: float = 0.2,
    keep_versions: "int | None" = None,
    ttl_before=None,
    dry_run: bool = False,
) -> dict:
    """Policy-driven table maintenance (the lakehouse OPTIMIZE loop):
    inspect the manifest — O(files), no data IO — and run compaction
    when more than ``rework_threshold`` of files are under/over-filled
    (or any file exceeds ``max_fill``·target), then vacuum when a
    retention window is given. ``dry_run=True`` reports the decision
    without mutating. This is the call a scheduler loops after ingest
    batches so prune selectivity and per-task read costs stay flat as
    merges accumulate.

    ``ttl_before`` (r5): row-retention policy — rows whose item
    interval ENDS strictly before the cutoff (timestamp / ISO string)
    are deleted first, through the same journaled DELETE as any other
    mutation. Candidate files prune on tmin/tmax, so an append-mostly
    archive expires its oldest files without touching the hot tail; the
    compaction decision then sees the post-expiry manifest.
    """
    out_dir = os.path.abspath(out_dir)
    _repair_if_crashed(out_dir)
    man = SpatialManifest(out_dir)
    recs = sorted(man.completed().values(), key=lambda r: r["partition_id"])
    if not recs:
        raise FileNotFoundError(f"no clustered store at {out_dir}")
    plan: dict = {}
    if ttl_before is not None:
        import pandas as pd

        cutoff = pd.Timestamp(ttl_before)
        cut64 = np.datetime64(cutoff.to_datetime64(), "us")

        def _expired(t: pa.Table) -> np.ndarray:
            # item-interval end = end_datetime | datetime (query.py rule);
            # null interval never expires (conservative keep)
            end = None
            if "end_datetime" in t.column_names:
                end = t["end_datetime"].cast(pa.timestamp("us")).to_numpy(
                    zero_copy_only=False
                )
            if "datetime" in t.column_names:
                dt = t["datetime"].cast(pa.timestamp("us")).to_numpy(
                    zero_copy_only=False
                )
                end = dt if end is None else np.where(
                    np.isnat(end), dt, end
                )
            if end is None:
                return np.zeros(t.num_rows, bool)
            with np.errstate(invalid="ignore"):
                return (~np.isnat(end)) & (end < cut64)

        if dry_run:
            # manifest-only estimate: files whose tmax ends before cutoff
            tcut = cutoff.isoformat()
            plan["ttl_files_fully_expired"] = sum(
                1 for r in recs
                if r.get("tmax") is not None and str(r["tmax"]) < tcut
            )
        else:
            plan["ttl_result"] = delete_clustered(
                out_dir, datetime=(None, ttl_before), predicate=_expired
            )
            recs = sorted(
                man.completed().values(), key=lambda r: r["partition_id"]
            )
    small = sum(1 for r in recs if r["rows"] < min_fill * target_rows)
    big = sum(1 for r in recs if r["rows"] > max_fill * target_rows)
    frac = (small + big) / max(len(recs), 1)
    plan.update({
        "files": len(recs),
        "underfilled": small,
        "oversized": big,
        "rework_fraction": round(frac, 3),
        "compact": bool(big or frac > rework_threshold),
        "vacuum": keep_versions is not None,
    })
    if dry_run:
        return {**plan, "dry_run": True}
    if plan["compact"]:
        out = compact_clustered(
            out_dir, target_rows=target_rows,
            min_fill=min_fill, max_fill=max_fill,
        )
        plan["files_after_compact"] = len(out)
    if keep_versions is not None:
        plan["vacuum_result"] = vacuum_clustered(
            out_dir, keep_versions=keep_versions
        )
    return plan


def evolve_clustered(
    out_dir: str,
    *,
    add: "dict | None" = None,
    drop: "list[str] | None" = None,
    rename: "dict[str, str] | None" = None,
    retype: "dict[str, str] | None" = None,
) -> dict:
    """Evolve the store's logical schema WITHOUT rewriting any data file
    (the lakehouse ALTER TABLE; Iceberg-style stable column ids — see
    ``evolution.py``). Ops compose rename → drop → add:

    - ``rename={"old": "new"}`` — metadata-only; old files' physical
      column maps to the new name at read time by column id.
    - ``drop=["col"]`` — the column disappears from reads of every file
      (old files keep the bytes until their file is next rewritten).
    - ``add={"col": default}`` or ``{"col": (default, "type")}`` — reads
      of files that predate the add fill the recorded default (typed;
      ``(None, "float64")`` adds a nullable column). Re-adding a dropped
      NAME mints a fresh column id — old values are never resurrected.
    - ``retype={"col": "int64"}`` — widen a column's type (safe
      promotions only: int32→int64, float32→float64,
      string→large_string); reads cast narrower files up, new writes
      land wide.

    Publishes a new STORE version (the manifest is unchanged but
    archived, so ``read_clustered(version=N)`` pairs version-N files
    with version-N's schema). Cost: O(columns) — no data IO, no shuffle;
    the reconcile work happens per batch at read time, which is what
    makes this viable at 100 TB.

    Returns ``{"schema_version", "store_version", "columns"}``.
    """
    out_dir = os.path.abspath(out_dir)
    man = SpatialManifest(out_dir)
    with _StoreLock(out_dir):
        _apply_journal(out_dir)
        recs = sorted(man.completed().values(), key=lambda r: r["partition_id"])
        desc = evolution.load_schema(out_dir)
        if desc is None:
            nonempty = [r for r in recs if r["rows"] > 0]
            if not nonempty:
                raise FileNotFoundError(
                    f"no clustered store at {out_dir} (evolve needs an "
                    "existing physical schema to track)"
                )
            phys = pq.read_schema(os.path.join(out_dir, nonempty[0]["file"]))
            desc = evolution.init_desc(phys)
        current_types = None
        if retype:
            # pre-evolve types for columns the descriptor hasn't recorded:
            # introspect one data file, mapped through its schema version
            nonempty = [r for r in recs if r["rows"] > 0]
            if nonempty:
                phys = pq.read_schema(
                    os.path.join(out_dir, nonempty[0]["file"])
                )
                at = evolution.names_at(
                    desc, int(nonempty[0].get("schema_v", 0))
                )
                ren = dict(rename or {})
                current_types = {}
                for c in desc["columns"]:
                    p = at.get(c["id"])
                    if p is not None and p in phys.names:
                        current_types[ren.get(c["name"], c["name"])] = str(
                            phys.field(p).type
                        )
        new_desc = evolution.apply_evolution(
            desc, add=add, drop=drop, rename=rename, retype=retype,
            current_types=current_types,
        )
        # archive (manifest + pre-evolve schema) under the outgoing
        # version, THEN swap the live descriptor (atomic rename). A crash
        # between the two mints a content-identical version — harmless.
        _archive_current(out_dir)
        evolution.write_schema_atomic(out_dir, new_desc)
        return {
            "schema_version": new_desc["v"],
            "store_version": store_version(out_dir),
            "columns": evolution.live_names(new_desc),
        }


def store_schema(out_dir: str, version: "int | None" = None) -> list[dict]:
    """The store's logical schema (at ``version``, default current): one
    ``{"id", "name"}`` dict per live column (added columns also carry
    ``type``/``default``). Falls back to the physical parquet schema for
    a store that never evolved."""
    out_dir = os.path.abspath(out_dir)
    sv = None if version is None or version == store_version(out_dir) else version
    desc = evolution.load_schema(out_dir, sv)
    if desc is not None:
        return [dict(c) for c in desc["columns"]]
    recs = sorted(
        SpatialManifest(out_dir, version=version).completed().values(),
        key=lambda r: r["partition_id"],
    )
    nonempty = [r for r in recs if r["rows"] > 0]
    if not nonempty:
        raise FileNotFoundError(f"no clustered store at {out_dir}")
    phys = pq.read_schema(os.path.join(out_dir, nonempty[0]["file"]))
    return [dict(c) for c in evolution.init_desc(phys)["columns"]]


_HASH_PRIME = np.uint64(0x9E3779B97F4A7C15)  # 64-bit golden-ratio mix


def _col_elem_hash(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Vectorized uint64 hash of one FLAT column (one value per row)."""
    import pandas as pd

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    t = arr.type
    if pa.types.is_floating(t):
        # bit pattern, not value: distinguishes -0.0/0.0 is unwanted —
        # canonicalize -0.0 and NaN first, then view as uint64
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.where(v == 0.0, 0.0, v)  # -0.0 → 0.0
        v = np.where(np.isnan(v), np.float64("nan"), v)  # one NaN pattern
        h = v.view(np.uint64).copy()
    elif pa.types.is_integer(t) or pa.types.is_boolean(t):
        v = arr.to_numpy(zero_copy_only=False)
        if v.dtype.kind == "f":  # nulls promoted to NaN; masked below
            v = np.nan_to_num(v)
        h = v.astype(np.int64).view(np.uint64)
    elif pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
        h = (
            arr.cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
    else:  # strings / binary / anything pandas can hash scalar-wise
        h = pd.util.hash_pandas_object(
            arr.to_pandas(), index=False
        ).to_numpy(np.uint64)
    if arr.null_count:
        mask = arr.is_null().to_numpy(zero_copy_only=False)
        h = np.where(mask, np.uint64(0xA5A5A5A5A5A5A5A5), h)
    # avalanche so per-column folds don't cancel
    h = (h ^ (h >> np.uint64(33))) * _HASH_PRIME
    return h ^ (h >> np.uint64(29))


def _row_content_hash(b: pa.Table, skip: tuple[str, ...] = ()) -> np.ndarray:
    """Order-independent-schema, order-DEPENDENT-value uint64 row hash
    over every column (canonical name order), vectorized; list columns
    (fixed or variable) fold element hashes with position weights."""
    h = np.zeros(len(b), np.uint64)
    for name in sorted(b.column_names):
        if name in skip:
            continue
        col = b[name].combine_chunks() if b.num_rows else b[name]
        arr = col if isinstance(col, pa.Array) else col.combine_chunks()
        t = arr.type
        if (
            pa.types.is_fixed_size_list(t)
            or pa.types.is_list(t)
            or pa.types.is_large_list(t)
        ):
            vals = _col_elem_hash(arr.flatten())
            if pa.types.is_fixed_size_list(t):
                k = t.list_size
                per = vals.reshape(len(b), k) if len(b) else vals.reshape(0, k)
                ch = np.zeros(len(b), np.uint64)
                for j in range(k):
                    ch = ch * _HASH_PRIME + per[:, j]
            else:
                off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
                off = off - off[0]  # sliced arrays carry parent offsets
                pos = np.arange(len(vals), dtype=np.int64) - np.repeat(
                    off[:-1], np.diff(off)
                )
                weighted = vals * np.power(
                    _HASH_PRIME, pos.astype(np.uint64), dtype=np.uint64
                )
                ch = np.add.reduceat(
                    np.concatenate([weighted, np.zeros(1, np.uint64)]),
                    np.minimum(off[:-1], len(vals)),
                    dtype=np.uint64,
                ) if len(b) else np.zeros(0, np.uint64)
                ch[np.diff(off) == 0] = np.uint64(0)
                ch += np.diff(off).astype(np.uint64) * np.uint64(0x1000193)
            if arr.null_count:
                mask = arr.is_null().to_numpy(zero_copy_only=False)
                ch = np.where(mask, np.uint64(0xA5A5A5A5A5A5A5A5), ch)
        else:
            ch = _col_elem_hash(arr)
        h = h * _HASH_PRIME + ch
    return h


def _delta_files(
    out_dir: str, v_from: int, v_to: int
) -> "tuple[list[str], list[str]]":
    """Files exclusive to one of two store versions — the IO bound for
    every CDC consumer (a row in a shared file cannot have changed).
    Compact hard-links untouched files under new generation names, so a
    name-diff alone would rescan them: identical inodes are identical
    content and the pairs are dropped (O(files) stat calls, zero data
    IO)."""
    recs_from = SpatialManifest(out_dir, version=v_from).completed().values()
    recs_to = SpatialManifest(out_dir, version=v_to).completed().values()
    files_from = {r["file"] for r in recs_from if r["rows"] > 0}
    files_to = {r["file"] for r in recs_to if r["rows"] > 0}
    only_from = sorted(files_from - files_to)
    only_to = sorted(files_to - files_from)

    def _ino(f: str):
        try:
            st = os.stat(os.path.join(out_dir, f))
            return (st.st_dev, st.st_ino)
        except OSError:
            return None

    ino_to = {}
    for f in only_to:
        k = _ino(f)
        if k is not None:
            ino_to.setdefault(k, set()).add(f)
    shared_from, shared_to = set(), set()
    for f in only_from:
        k = _ino(f)
        for g in ino_to.get(k, ()):  # k=None never in ino_to
            shared_from.add(f)
            shared_to.add(g)
    return (
        [f for f in only_from if f not in shared_from],
        [f for f in only_to if f not in shared_to],
    )


def _read_version_files(
    out_dir: str,
    files: "list[str]",
    version: int,
    desc: "dict | None",
    columns: "list[str] | None" = None,
):
    """Dataset over store-relative ``files`` belonging to store version
    ``version``, reconciled to ``desc``'s logical schema (None = identity
    read). Files group by the schema version they were written under, so
    every output batch has identical column names/order — the shared read
    primitive for CDC and incremental-view refresh."""
    import ray.data as rd

    if desc is None:
        ds = rd.read_parquet([os.path.join(out_dir, f) for f in files])
        if columns is not None:
            ds = ds.select_columns(columns)
        return ds
    sv_of = {
        r["file"]: int(r.get("schema_v", 0))
        for r in SpatialManifest(out_dir, version=version).completed().values()
    }
    groups: dict[int, list[str]] = {}
    for f in files:
        groups.setdefault(sv_of.get(f, 0), []).append(f)
    pieces = []
    for sv in sorted(groups):
        scan = evolution.physical_read_columns(desc, sv, columns)
        pieces.append(
            rd.read_parquet(
                [os.path.join(out_dir, f) for f in groups[sv]], columns=scan
            ).map_batches(
                evolution.reconcile_table,
                batch_format="pyarrow",
                fn_kwargs={"desc": desc, "schema_v": sv, "columns": columns},
            )
        )
    ds = pieces[0]
    for p in pieces[1:]:
        ds = ds.union(p)
    return ds


def changes_clustered(
    out_dir: str,
    v_from: int,
    v_to: int | None = None,
    *,
    id_col: str = "image_id",
):
    """Change-data-capture between two store versions (the lakehouse
    CHANGE FEED): → Dataset of ``(id_col, change)`` with ``change`` ∈
    {'insert', 'update', 'delete'} describing how ``v_to`` (default:
    current) differs from ``v_from``. Requires ``id_col`` unique per
    version (the same contract as upsert).

    Scale shape: data files are immutable and uniquely named, so the
    manifest diff bounds IO to the DELTA — only files exclusive to one
    side are read (a row in a shared file cannot have changed; see
    ``_delta_files``). Each side's exclusive files stream through a
    vectorized per-row content hash (canonical column order; both sides
    share the store schema, so dtype-stable), then ONE ``groupby(id)``
    over delta rows folds (side-tagged presence, side-tagged hash)
    partials and a map pass classifies: to-only → insert, from-only →
    delete, both-with-different-hash → update; unchanged rows (rewritten
    into a new file by a merge/compact that didn't touch them) cancel
    out and are dropped. Nothing store-sized is read or shuffled.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    out_dir = os.path.abspath(out_dir)
    _repair_if_crashed(out_dir)
    cur = store_version(out_dir)
    if v_to is None:
        v_to = cur
    only_from, only_to = _delta_files(out_dir, v_from, v_to)

    empty = pa.table(
        {id_col: pa.array([], pa.string()), "change": pa.array([], pa.string())}
    )
    if not only_from and not only_to:
        return rd.from_arrow(empty)

    # schema-aware CDC: both sides reconcile to v_to's LOGICAL schema (by
    # column id, so a renamed id_col still keys correctly), and the row
    # hash covers only columns live in BOTH versions — a column added or
    # dropped between the versions is a schema change, not a row change.
    desc_to = evolution.load_schema(out_dir, None if v_to == cur else v_to)
    desc_from = evolution.load_schema(out_dir, None if v_from == cur else v_from)
    skip: tuple = ()
    if desc_to is not None:
        common = evolution.common_ids(desc_from, desc_to)
        if common is not None:
            skip = tuple(
                c["name"] for c in desc_to["columns"] if c["id"] not in common
            )
        if id_col not in evolution.live_names(desc_to):
            raise KeyError(
                f"changes_clustered: id_col {id_col!r} is not live at "
                f"version {v_to} (live: {evolution.live_names(desc_to)})"
            )

    def tagged(side: int):
        def fn(b: pa.Table) -> pa.Table:
            h = _row_content_hash(b, skip=skip).astype(np.int64)
            return pa.table(
                {
                    id_col: b[id_col],
                    "_n_from": pa.array(
                        np.full(len(b), 1 - side, np.int64), pa.int64()
                    ),
                    "_n_to": pa.array(np.full(len(b), side, np.int64), pa.int64()),
                    "_h_from": pa.array(h * (1 - side), pa.int64()),
                    "_h_to": pa.array(h * side, pa.int64()),
                }
            )

        return fn

    sides = []
    if only_from:
        sides.append(
            _read_version_files(out_dir, only_from, v_from, desc_to)
            .map_batches(tagged(0), batch_format="pyarrow")
        )
    if only_to:
        sides.append(
            _read_version_files(out_dir, only_to, v_to, desc_to)
            .map_batches(tagged(1), batch_format="pyarrow")
        )
    both = sides[0] if len(sides) == 1 else sides[0].union(sides[1])
    agg = both.groupby(id_col).aggregate(
        Sum("_n_from", alias_name="nf"), Sum("_n_to", alias_name="nt"),
        Sum("_h_from", alias_name="hf"), Sum("_h_to", alias_name="ht"),
    )

    def classify(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return empty
        nf = b["nf"].to_numpy(zero_copy_only=False)
        nt = b["nt"].to_numpy(zero_copy_only=False)
        if (nf > 1).any() or (nt > 1).any():
            raise ValueError(
                f"changes_clustered: duplicate {id_col} within one version "
                "— CDC requires a unique key (same contract as upsert)"
            )
        hf = b["hf"].to_numpy(zero_copy_only=False)
        ht = b["ht"].to_numpy(zero_copy_only=False)
        label = np.where(
            nf == 0, "insert", np.where(nt == 0, "delete", "update")
        )
        keep = (nf == 0) | (nt == 0) | (hf != ht)
        t = pa.table(
            {id_col: b[id_col], "change": pa.array(label, pa.string())}
        )
        return t.filter(pa.array(keep))

    return agg.map_batches(classify, batch_format="pyarrow")


def vacuum_clustered(out_dir: str, *, keep_versions: int = 1) -> dict:
    """Reclaim storage from versions outside the retention window (the
    lakehouse VACUUM): keeps the current version plus the
    ``keep_versions - 1`` most recent archived snapshots readable,
    deletes every data file referenced by NO retained manifest, drops
    the expired archive manifests, and sweeps orphaned staging temps
    from crashed publishes. Runs under the store mutation lock; cost is
    O(retained manifest lines + directory listing) — never reads data
    bytes. Returns ``{"files_deleted", "bytes_freed",
    "versions_dropped", "tmp_swept"}``."""
    if keep_versions < 1:
        raise ValueError("vacuum_clustered: keep_versions must be >= 1")
    out_dir = os.path.abspath(out_dir)
    with _StoreLock(out_dir):
        _apply_journal(out_dir)  # finish a crashed publish first
        if not os.path.exists(os.path.join(out_dir, _MANIFEST_NAME)):
            raise FileNotFoundError(f"no clustered store at {out_dir}")
        cur_recs = SpatialManifest(out_dir).completed().values()
        vs = _history_versions(out_dir)
        keep_hist = vs[max(0, len(vs) - (keep_versions - 1)):]
        referenced = {r["file"] for r in cur_recs}
        for v in keep_hist:
            for r in SpatialManifest(out_dir, version=v).completed().values():
                referenced.add(r["file"])
        files_deleted = bytes_freed = tmp_swept = 0
        for name in os.listdir(out_dir):
            path = os.path.join(out_dir, name)
            if not os.path.isfile(path):
                continue
            is_data = name.endswith(".parquet") and name.startswith("part-")
            # orphaned staging temps: no journal exists (applied above,
            # under the lock), so any leftover stage is crash debris
            is_tmp = name.startswith((".merge.", ".compact.", ".delete."))
            if is_data and name not in referenced:
                st = os.stat(path)
                # hard-linked names share bytes: removing one of several
                # links frees nothing until the last name goes
                bytes_freed += st.st_size if st.st_nlink == 1 else 0
                os.remove(path)
                files_deleted += 1
            elif is_tmp:
                os.remove(path)
                tmp_swept += 1
        dropped = [v for v in vs if v not in keep_hist]
        for v in dropped:
            os.remove(
                os.path.join(out_dir, _HISTORY_DIR, f"manifest.v{v:06d}.jsonl")
            )
            try:  # the version's schema snapshot expires with it
                os.remove(evolution.schema_file_path(out_dir, v, _HISTORY_DIR))
            except FileNotFoundError:
                pass
        return {
            "files_deleted": files_deleted,
            "bytes_freed": bytes_freed,
            "versions_dropped": len(dropped),
            "tmp_swept": tmp_swept,
        }


def upsert_clustered(
    out_dir: str,
    new_ds,
    *,
    id_col: str = "id",
    locate: str = "footprint",
    footprints_derived: bool = False,
    bits: int = 16,
    bbox_col: str | None = None,
    max_ids: int = 5_000_000,
) -> dict:
    """Replace-by-id into a clustered store (the lakehouse UPSERT):
    delete every existing row whose ``id_col`` appears in ``new_ds``,
    then ``merge_clustered`` the new rows into their zkey-owning files.

    ``locate`` bounds the delete's candidate set:

    - ``"footprint"`` (default) — CONTRACT: a replaced row's footprint
      center is unchanged (metadata refresh, new asset bytes, quality
      re-score — the common re-ingest). Old rows then live exactly in
      the file owning their zkey (write routed by exact boundaries;
      merge preserves ownership; compact preserves contiguity), so the
      delete touches only the files the merge is about to rewrite
      anyway — O(new rows + touched files). A moved footprint under
      this mode silently leaves the stale row behind: use ``"scan"``.
    - ``"scan"`` — no location assumption; the delete probes every
      file's id column (one-column scan, payload read only on hit).

    The new ids (and zkeys under ``"footprint"``) materialize on the
    driver — upsert batches are incremental by nature; above ``max_ids``
    this raises (shard ``new_ds`` and loop, each shard is independently
    atomic). The operation is TWO journaled mutations (delete-publish,
    merge-publish): a crash between them loses no old data beyond the
    requested replacement and a re-run converges (the delete finds
    nothing, the merge's publish is atomic).

    Returns the delete summary + ``{"rows_upserted": n}``.
    """
    out_dir = os.path.abspath(out_dir)
    if locate not in ("footprint", "scan"):
        raise ValueError(f"unknown locate mode {locate!r}")
    man = SpatialManifest(out_dir)
    recs = sorted(man.completed().values(), key=lambda r: r["partition_id"])
    if not recs:
        raise FileNotFoundError(f"no clustered store at {out_dir}")

    n_new = new_ds.count()
    if n_new > max_ids:
        raise ValueError(
            f"upsert_clustered: {n_new} new rows > max_ids={max_ids} — "
            "shard new_ds and upsert per shard (each shard is atomic)"
        )
    cand_pids: "set[int] | None" = None
    if locate == "footprint":
        names = new_ds.schema().names
        zkw = _layout_kwargs(out_dir)
        need = [id_col] + (
            [bbox_col]
            if bbox_col is not None
            else [
                c
                for c in ("fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax", "w", "h", "transform")
                if c in names
            ]
        )
        tc = zkw.get("time_col")
        if tc and tc in names and tc not in need:
            need.append(tc)
        keyed = (
            new_ds.select_columns(need)
            .map_batches(
                _zkey_stage, batch_format="pyarrow",
                fn_kwargs={
                    "derive": not footprints_derived,
                    "bits": bits,
                    "bbox_col": bbox_col,
                    **zkw,
                },
            )
            .select_columns([id_col, "_zkey"])
            .to_pandas()
        )
        ids = keyed[id_col].tolist()
        own = sorted((r for r in recs if r["zmin"] is not None), key=lambda r: r["zmin"])
        bounds = np.asarray([r["zmin"] for r in own], np.int64)
        pids = np.asarray([r["partition_id"] for r in own], np.int64)
        slot = np.maximum(
            np.searchsorted(bounds, keyed["_zkey"].to_numpy(), side="right") - 1, 0
        )
        cand_pids = set(int(p) for p in np.unique(pids[slot]))
    else:
        ids = [
            r[id_col]
            for b in new_ds.select_columns([id_col]).iter_batches(batch_format="pandas")
            for r in b.to_dict("records")
        ]

    summary = delete_clustered(
        out_dir, ids=ids, id_col=id_col, _candidate_pids=cand_pids
    )
    merge_clustered(
        out_dir, new_ds,
        footprints_derived=footprints_derived, bits=bits, bbox_col=bbox_col,
    )
    summary["rows_upserted"] = n_new
    return summary


def _geojson_bounds(geom: dict) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax) of any GeoJSON geometry's coordinates."""
    xs: list[float] = []
    ys: list[float] = []

    def walk(c):
        if isinstance(c, (list, tuple)):
            if c and isinstance(c[0], (int, float)):
                xs.append(float(c[0]))
                ys.append(float(c[1]))
            else:
                for e in c:
                    walk(e)

    if geom.get("type") == "GeometryCollection":
        for g in geom.get("geometries", []):
            walk(g.get("coordinates", []))
    else:
        walk(geom.get("coordinates", []))
    if not xs:
        raise ValueError("empty geometry")
    return min(xs), min(ys), max(xs), max(ys)


def search_clustered(store_dir: str, spec, **read_kwargs):
    """Layout-aware item search: the QuerySpec's spatial constraint
    (bbox, or the bounds of ``intersects``) prunes the clustered store
    BEFORE the scan — files that can't intersect never enter the read
    plan, row groups prune on parquet stats, and then the ordinary
    ``query.search`` predicate chain (datetime / CQL2 / fields / sort)
    runs over the survivors with identical semantics to a full scan.
    This is the reference's DuckDB pushdown story (SURVEY S7) re-expressed
    as layout + manifest: selectivity comes from how the data is laid
    out, not from a SQL engine underneath.
    """
    from ..query import search as _search

    bbox = None
    if getattr(spec, "bbox", None) is not None:
        b = list(spec.bbox)
        if len(b) == 6:  # [xmin, ymin, zmin, xmax, ymax, zmax]
            bbox = (b[0], b[1], b[3], b[4])
        else:
            bbox = (b[0], b[1], b[2], b[3])
    elif getattr(spec, "intersects", None) is not None:
        bbox = _geojson_bounds(spec.intersects)
    if "filter" not in read_kwargs:
        # sargable attribute pushdown (ids/collections/datetime/CQL2 subset)
        # rides the same scan the spatial prune drives — see
        # query.spec_arrow_prefilter for the implied-prefilter contract
        from ..query import spec_arrow_prefilter

        recs = sorted(
            SpatialManifest(store_dir).completed().values(),
            key=lambda r: r["partition_id"],
        )
        if recs:
            schema = pq.read_schema(os.path.join(store_dir, recs[0]["file"]))
            desc = evolution.load_schema(os.path.abspath(store_dir))
            if desc is not None:
                # compile against the LIVE logical schema, not rec[0]'s
                # physical one — on a mixed-schema store the physical
                # names differ per file group; read_clustered translates
                # a live-name filter per group (pushdown on live-schema
                # files, post-reconcile filter on older ones)
                schema = evolution.reconcile_table(
                    schema.empty_table(), desc,
                    int(recs[0].get("schema_v", 0)),
                ).schema
            expr = spec_arrow_prefilter(spec, schema)
            if expr is not None:
                read_kwargs["filter"] = expr
    if "column_ranges" not in read_kwargs and getattr(spec, "filter", None) is not None:
        # zone-map FILE prune: value bounds implied by the CQL2 filter
        # drop files whose recorded min/max admits no match (stores
        # written without stats_cols conservatively keep everything)
        from ..cql2 import to_column_ranges

        ranges = to_column_ranges(spec.filter)
        if ranges:
            read_kwargs["column_ranges"] = ranges
    ds = read_clustered(
        store_dir, bbox=bbox, datetime=getattr(spec, "datetime", None), **read_kwargs
    )
    drop = [
        c
        for c in ("fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax", "_zkey")
        if c in (ds.schema().names if ds.schema() else [])
    ]
    if drop:
        ds = ds.drop_columns(drop)
    return _search(ds, spec)


def knn_clustered(
    store_dir: str,
    probes: dict[str, tuple[float, float]],
    k: int,
    *,
    r0: float = 0.25,
    max_rounds: int = 12,
    max_candidates: int = 2_000_000,
):
    """→ pandas (query_id, image_id, dist): EXACT k nearest footprint
    centers per probe, reading only the files an expanding bbox ring
    intersects — the layout-accelerated interactive kNN (few probes,
    huge corpus; the full-scan streaming variant is ``stages.knn.
    knn_join``).

    Exactness certificate: any center within Euclidean distance d of the
    probe lies in the [±d] Chebyshev box, and a footprint box always
    contains its center — so once a ring of radius r yields ≥ k
    candidates with kth distance ≤ r, no unseen file can hold a closer
    one. Rings double until the certificate holds (or the ring covers
    the world). Per-probe work is bounded by the final ring's candidate
    count (guarded by ``max_candidates``), NOT corpus size — at 100 TB a
    probe touches a handful of files.

    Ties break by (dist², image_id) — the same selector as the
    ``knn_points`` SQL twin.
    """
    import pandas as pd

    out_rows = []
    for qid, (x, y) in probes.items():
        r = float(r0)
        for _ in range(max_rounds):
            df = read_clustered(
                store_dir,
                bbox=(x - r, y - r, x + r, y + r),
                columns=["image_id", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"],
            ).to_pandas()
            if len(df) > max_candidates:
                raise ValueError(
                    f"knn_clustered: ring r={r} holds {len(df)} candidates "
                    f"(> {max_candidates}); corpus too dense for the "
                    "interactive path — use stages.knn.knn_join"
                )
            world = r >= 360.0
            if len(df) >= k or world:
                cx = (df["fp_xmin"].to_numpy() + df["fp_xmax"].to_numpy()) * 0.5
                cy = (df["fp_ymin"].to_numpy() + df["fp_ymax"].to_numpy()) * 0.5
                d2 = (cx - x) ** 2 + (cy - y) ** 2
                order = np.lexsort((df["image_id"].to_numpy(object), d2))
                top = order[: min(k, len(order))]
                kth = float(np.sqrt(d2[top[-1]])) if len(top) else np.inf
                if world or (len(top) >= k and kth <= r):
                    for i in top:
                        out_rows.append(
                            (qid, df["image_id"].iloc[i], float(np.sqrt(d2[i])))
                        )
                    break
            r *= 2.0
        else:
            raise RuntimeError(
                f"knn_clustered: probe {qid} unresolved after {max_rounds} rings"
            )
    return pd.DataFrame(out_rows, columns=["query_id", "image_id", "dist"])


def apply_changes(
    src_dir: str,
    dst_dir: str,
    v_from: int,
    v_to: "int | None" = None,
    *,
    id_col: str = "image_id",
    footprints_derived: bool = True,
) -> dict:
    """CDC APPLY — replicate a store mutation window onto a replica
    (the lakehouse downstream-sync): read the ``changes_clustered``
    feed for ``v_from → v_to``, fetch the changed rows' CURRENT content
    from the source (one id-filtered scan — the same one-column-probe
    cost contract as delete-by-ids), DELETE the deleted ids on the
    replica and UPSERT the inserted/updated rows. After applying, a
    replica cloned at ``v_from`` holds exactly the source's ``v_to``
    rows. Cost is O(delta rows + touched replica files) — nothing
    store-sized moves.

    The change feed is delta-bounded but materialized on the driver as
    (id, change) pairs — the same residency class as the delete-by-ids
    id list (max_ids guard there); for bigger windows, apply in
    version-sized steps.
    """
    import pyarrow.compute as pc

    src_dir = os.path.abspath(src_dir)
    dst_dir = os.path.abspath(dst_dir)
    ch = changes_clustered(src_dir, v_from, v_to, id_col=id_col).to_pandas()
    if len(ch) == 0:
        return {"deletes": 0, "upserts": 0, "noop": True}
    del_ids = ch.loc[ch["change"] == "delete", id_col].tolist()
    up_ids = ch.loc[ch["change"].isin(["insert", "update"]), id_col].tolist()
    out: dict = {"deletes": len(del_ids), "upserts": len(up_ids)}
    if up_ids:
        rows = read_clustered(
            src_dir, version=v_to,
            filter=pc.field(id_col).isin(up_ids),
        )
        names = rows.schema().names
        if "_zkey" in names:  # replica derives its own layout key
            rows = rows.drop_columns(["_zkey"])
        upsert_clustered(
            dst_dir, rows, id_col=id_col,
            footprints_derived=footprints_derived,
        )
    if del_ids:
        delete_clustered(dst_dir, ids=del_ids, id_col=id_col)
    return out


def diff_stores(
    a_dir: str,
    b_dir: str,
    *,
    id_col: str = "image_id",
    columns: "list[str] | None" = None,
    n_buckets: "int | None" = None,
):
    """Content DIFF of two clustered stores (replica drift audit,
    migration verification): → Dataset (id_col, change) with change ∈
    {'insert', 'update', 'delete'} describing how B differs from A
    (insert = in B only, delete = in A only, update = both present but
    any compared column differs; unchanged rows emit nothing).

    ``columns`` bounds the comparison (default: the stores' common
    LOGICAL columns minus internal layout columns). Unlike
    ``changes_clustered`` (same store, manifest-bounded delta), a
    cross-store diff must read both corpora once — the shape is the
    funnel family's bucketed co-group: both sides project to
    (id, compared columns), ids hash into a bounded bucket count
    (auto-sized from the larger side), and each bucket does ONE indexed
    pandas compare. Requires ``id_col`` unique per store.
    """
    import pandas as pd
    import ray.data as rd  # noqa: F401

    from ..stages.funnel import _auto_buckets, _bucket_of

    a_dir = os.path.abspath(a_dir)
    b_dir = os.path.abspath(b_dir)
    dsa = read_clustered(a_dir)
    dsb = read_clustered(b_dir)
    if columns is None:
        internal = {"_zkey", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax",
                    "fp_corners"}
        # default comparison set: common PRIMITIVE columns (numeric /
        # string / bool / temporal) — nested and binary payloads need an
        # explicit caller choice (compare a digest column instead)
        schema_a = dsa.schema().base_schema
        prim = set()
        for f in schema_a:
            t = f.type
            if (pa.types.is_integer(t) or pa.types.is_floating(t)
                    or pa.types.is_string(t) or pa.types.is_large_string(t)
                    or pa.types.is_boolean(t) or pa.types.is_temporal(t)):
                prim.add(f.name)
        columns = [
            c for c in dsa.schema().names
            if c in set(dsb.schema().names) and c not in internal
            and c != id_col and c in prim
        ]
    need = [id_col] + list(columns)
    n_buckets = _auto_buckets(dsa if dsa.count() >= dsb.count() else dsb,
                              n_buckets)

    def tag(side: int):
        def fn(b: pa.Table) -> pd.DataFrame:
            df = b.select(need).to_pandas()
            df["_b"] = _bucket_of(df[id_col].to_numpy(), n_buckets)
            df["_side"] = np.int8(side)
            return df

        return fn

    both = dsa.map_batches(tag(0), batch_format="pyarrow").union(
        dsb.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["_side"] == 0].set_index(id_col)
        b = g[g["_side"] == 1].set_index(id_col)
        ins = b.index.difference(a.index)
        dele = a.index.difference(b.index)
        shared = a.index.intersection(b.index)
        upd = []
        if len(shared):
            av = a.loc[shared, list(columns)]
            bv = b.loc[shared, list(columns)]
            # NaN-safe inequality per cell
            neq = ~((av.values == bv.values)
                    | (pd.isna(av.values) & pd.isna(bv.values)))
            upd = shared[neq.any(axis=1)]
        return pd.DataFrame(
            {
                id_col: list(ins) + list(upd) + list(dele),
                "change": ["insert"] * len(ins) + ["update"] * len(upd)
                + ["delete"] * len(dele),
            }
        )

    return both.groupby("_b").map_groups(per_bucket, batch_format="pandas")
