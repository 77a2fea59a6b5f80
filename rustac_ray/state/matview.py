"""Incremental materialized views over the clustered store.

The 100-TB problem: dashboards / curation monitors want grouped
aggregates ("rows and total pixels per collection") that stay current as
the store mutates — but recomputing a full groupby over the corpus after
every DELETE/UPSERT re-reads everything. The lakehouse answer
(incremental view maintenance over a change feed; Delta Live Tables /
Materialize-style) is to maintain only ABELIAN-GROUP aggregates (count,
sum, mean = sum/count) so a refresh needs just the DELTA between two
store versions:

    new_agg(g) = old_agg(g) + sum(+rows of g in v_to-only files)
                            - sum(-rows of g in v_from-only files)

The clustered store's immutable, uniquely-named data files make the
delta trivially enumerable (``_delta_files``): a row in a file shared by
both versions cannot have changed, and an unchanged row rewritten into a
new file (by a merge/compact that didn't touch it) appears on BOTH sides
and cancels in the group sums — no per-row id classification needed at
all, unlike the CDC feed. Refresh cost is O(delta files + view groups),
independent of store size.

min/max (``mins``/``maxs``, r4 VERDICT #6) are NON-invertible: they fold
incrementally only while the delta purely INSERTS files; a delta that
removes any file (delete/upsert/rewrite) may have carried a group's
current extremum, so the refresh falls back to a full recompute —
recompute-on-invalidation, never a wrong answer.

View chains (``create_matview_over`` / ``refresh_matview_over``): a
child view aggregates the parent view's OUTPUT table. The parent's
table is dashboard-sized by construction, so the chain refresh is
parent-incremental + child-recompute-from-parent — O(parent groups),
never O(store).

Schema evolution composes: delta files reconcile to the CURRENT logical
schema before aggregation (``_read_version_files``), so a view over a
renamed column keeps refreshing across the rename.

Crash safety: refresh writes the new view table under a tmp name, then
the meta (pointing at the new table + the new store version) via atomic
rename — a crash leaves the old view intact; a re-run redoes the same
delta (idempotent because the meta still says the old version).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_META_NAME = "_view_meta.json"

__all__ = ["create_matview", "refresh_matview", "read_matview",
           "create_matview_over", "refresh_matview_over"]


def _agg_plan(spec: dict):
    """Validated (group_by, sum_cols, mean_cols) from a view spec."""
    group_by = list(spec["group_by"])
    sums = list(spec.get("sums", ()))
    means = list(spec.get("means", ()))
    bad = set(spec) - {"group_by", "sums", "means", "counts", "mins", "maxs"}
    if bad:
        raise ValueError(
            f"matview spec: unknown keys {sorted(bad)} — count/sum/mean "
            "(abelian, incrementally maintainable) and min/max "
            "(insert-monotone; deletions fall back to a full recompute)"
        )
    if not group_by:
        raise ValueError("matview spec: group_by must name >=1 column")
    return group_by, sums, means


def _mm_plan(spec: dict):
    """(min_cols, max_cols) — the NON-invertible aggregates (r4 VERDICT
    #6): folds are monotone under INSERTS only, so a refresh whose delta
    removes any file recomputes (deleting the current minimum of a group
    is not a group-inverse op)."""
    return list(spec.get("mins", ())), list(spec.get("maxs", ()))


def _signed_partials(spec: dict, sign: int):
    """map_batches body: per-batch signed partial sums, one output row
    per group present in the batch — the pre-aggregation that keeps the
    later groupby exchange tiny."""
    group_by, sums, means = _agg_plan(spec)
    mins, maxs = _mm_plan(spec)
    need = list(dict.fromkeys(sums + means + mins + maxs))

    def fn(b: pa.Table) -> pd.DataFrame:
        df = b.select(group_by + need).to_pandas()
        df["_n"] = np.int64(sign)
        agg = {"_n": "sum"}
        for c in sums:
            df[f"sum_{c}"] = df[c].astype("float64" if df[c].dtype.kind == "f" else "int64") * sign
            agg[f"sum_{c}"] = "sum"
        for c in means:
            df[f"_msum_{c}"] = df[c].astype("float64") * sign
            agg[f"_msum_{c}"] = "sum"
            # SQL AVG excludes nulls: maintain a per-column NON-NULL
            # count so mean = _msum / _mn, not _msum / _n (which would
            # silently deflate the mean whenever the column has nulls)
            df[f"_mn_{c}"] = df[c].notna().astype("int64") * sign
            agg[f"_mn_{c}"] = "sum"
        # min/max partials only make sense on the +1 side; removal
        # deltas never reach a min/max fold (full-recompute fallback)
        for c in mins:
            assert sign > 0, "min fold over a removal delta"
            df[f"min_{c}"] = df[c]
            agg[f"min_{c}"] = "min"
        for c in maxs:
            assert sign > 0, "max fold over a removal delta"
            df[f"max_{c}"] = df[c]
            agg[f"max_{c}"] = "max"
        out = df.groupby(group_by, as_index=False, sort=False, dropna=False).agg(agg)
        # arrow out: keeps every block in the fold arrow-typed (the
        # shuffle combine unions these with a parquet read)
        return pa.Table.from_pandas(out, preserve_index=False)

    return fn


def _fold(ds, spec: dict):
    """Groupby-fold signed partials into one row per group."""
    from ray.data.aggregate import Max, Min, Sum

    group_by, sums, means = _agg_plan(spec)
    mins, maxs = _mm_plan(spec)
    aggs = [Sum("_n", alias_name="_n")]
    for c in sums:
        aggs.append(Sum(f"sum_{c}", alias_name=f"sum_{c}"))
    for c in means:
        aggs.append(Sum(f"_msum_{c}", alias_name=f"_msum_{c}"))
        aggs.append(Sum(f"_mn_{c}", alias_name=f"_mn_{c}"))
    for c in mins:
        aggs.append(Min(f"min_{c}", alias_name=f"min_{c}"))
    for c in maxs:
        aggs.append(Max(f"max_{c}", alias_name=f"max_{c}"))
    return ds.groupby(group_by).aggregate(*aggs)


def _finalize(df: pd.DataFrame, spec: dict) -> pd.DataFrame:
    """Drop emptied groups, order columns, keep the raw fold columns
    (the view table stores _n/_msum_* so later deltas keep folding)."""
    group_by, sums, means = _agg_plan(spec)
    mins, maxs = _mm_plan(spec)
    df = df[df["_n"] > 0].copy()
    cols = group_by + ["_n"] + [f"sum_{c}" for c in sums] + [
        f"_msum_{c}" for c in means
    ] + [f"_mn_{c}" for c in means] + [f"min_{c}" for c in mins] + [
        f"max_{c}" for c in maxs
    ]
    return df[cols].sort_values(group_by).reset_index(drop=True)


def _view_table(view_dir: str, meta: dict) -> pd.DataFrame:
    return pq.read_table(os.path.join(view_dir, meta["table"])).to_pandas()


def _publish(view_dir: str, df: pd.DataFrame, meta: dict) -> None:
    os.makedirs(view_dir, exist_ok=True)
    gen = int(meta.get("gen", -1)) + 1
    table = f"view-{gen:06d}.parquet"
    tmp = os.path.join(view_dir, f".{table}.tmp.{os.getpid()}")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.rename(tmp, os.path.join(view_dir, table))
    old = meta.get("table")
    meta = dict(meta, table=table, gen=gen, groups=len(df))
    mtmp = os.path.join(view_dir, _META_NAME + f".tmp.{os.getpid()}")
    with open(mtmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(mtmp, os.path.join(view_dir, _META_NAME))
    if old and old != table:
        try:
            os.remove(os.path.join(view_dir, old))
        except FileNotFoundError:
            pass


def create_matview(
    store_dir: str,
    view_dir: str,
    *,
    group_by: list[str],
    sums: "list[str] | None" = None,
    means: "list[str] | None" = None,
    mins: "list[str] | None" = None,
    maxs: "list[str] | None" = None,
) -> dict:
    """Materialize a grouped-aggregate view of a clustered store (count
    per group always; plus ``sum_{c}`` / ``mean_{c}`` / ``min_{c}`` /
    ``max_{c}``) and record the store version it reflects. Idempotent:
    re-creating over an existing view re-materializes it at the current
    version. min/max refresh incrementally only while deltas are pure
    inserts; a removal delta falls back to a full recompute (r4 VERDICT
    #6 — non-invertible aggregates)."""
    from ..sources.clustered import read_clustered, store_version

    store_dir = os.path.abspath(store_dir)
    spec = {"group_by": list(group_by), "sums": list(sums or ()),
            "means": list(means or ()), "mins": list(mins or ()),
            "maxs": list(maxs or ())}
    _agg_plan(spec)
    v = store_version(store_dir)
    group_by_, sums_, means_ = _agg_plan(spec)
    mins_, maxs_ = _mm_plan(spec)
    need = list(dict.fromkeys(group_by_ + sums_ + means_ + mins_ + maxs_))
    ds = read_clustered(store_dir, columns=need)
    folded = _fold(
        ds.map_batches(_signed_partials(spec, +1), batch_format="pyarrow"),
        spec,
    ).to_pandas()
    df = _finalize(folded, spec)
    from ..sources.clustered import evolution

    desc = evolution.load_schema(store_dir)
    meta = {
        "store_dir": store_dir,
        "spec": spec,
        "store_version": v,
        # spec column names are pinned to the schema version live at
        # create time; a later rename translates them by column id
        "spec_schema_v": 0 if desc is None else int(desc["v"]),
    }
    _publish(view_dir, df, meta)
    return {"store_version": v, "groups": len(df)}


def _translate_spec(meta: dict, desc: "dict | None") -> "tuple[dict, dict]":
    """(spec in CURRENT column names, old→new rename map for the stored
    view table's columns). A spec column dropped by an evolve raises —
    the view is no longer maintainable and must be re-created."""
    from ..sources.clustered import evolution

    spec = meta["spec"]
    spec_v = int(meta.get("spec_schema_v", 0))
    if desc is None or int(desc["v"]) == spec_v:
        return spec, {}
    at = evolution.names_at(desc, spec_v)  # id -> name at spec time
    inv = {name: cid for cid, name in at.items()}
    cur = {c["id"]: c["name"] for c in desc["columns"]}

    def tr(n):
        cid = inv.get(n)
        if cid is None or cid not in cur:
            raise ValueError(
                f"matview: spec column {n!r} was dropped by a schema evolve "
                "— re-create the view"
            )
        return cur[cid]

    new_spec = {
        "group_by": [tr(n) for n in spec["group_by"]],
        "sums": [tr(n) for n in spec.get("sums", ())],
        "means": [tr(n) for n in spec.get("means", ())],
        "mins": [tr(n) for n in spec.get("mins", ())],
        "maxs": [tr(n) for n in spec.get("maxs", ())],
    }
    renames = {}
    for old, new in zip(spec["group_by"], new_spec["group_by"]):
        if old != new:
            renames[old] = new
    for old, new in zip(spec.get("sums", ()), new_spec["sums"]):
        if old != new:
            renames[f"sum_{old}"] = f"sum_{new}"
    for old, new in zip(spec.get("means", ()), new_spec["means"]):
        if old != new:
            renames[f"_msum_{old}"] = f"_msum_{new}"
            renames[f"_mn_{old}"] = f"_mn_{new}"
    for key, pre in (("mins", "min_"), ("maxs", "max_")):
        for old, new in zip(spec.get(key, ()), new_spec[key]):
            if old != new:
                renames[f"{pre}{old}"] = f"{pre}{new}"
    return new_spec, renames


def _ensure_mn(df: pd.DataFrame, spec: dict) -> pd.DataFrame:
    """Upgrade a view table written before the ``_mn_{c}`` columns
    existed: assume historical rows were non-null (the only consistent
    reading of the old sums) and seed ``_mn_`` from ``_n``."""
    for c in spec.get("means", ()):
        if f"_mn_{c}" not in df.columns:
            df = df.copy()
            df[f"_mn_{c}"] = df["_n"].astype("int64")
    return df


def refresh_matview(
    store_dir: str,
    view_dir: str,
    *,
    combine: str = "auto",
    max_driver_groups: int = 2_000_000,
) -> dict:
    """Bring the view up to the store's current version by folding ONLY
    the version delta (files exclusive to one side). Falls back to a
    full recompute when the view's base version was vacuumed (its
    manifest snapshot is gone). Returns ``{"mode", "from_version",
    "to_version", "groups"}``.

    ``combine``: how old view + delta merge — ``"driver"`` (one pandas
    groupby; right when the view is dashboard-sized), ``"shuffle"``
    (old view read as a Dataset, unioned with the delta partials, ONE
    distributed groupby — the path for group keys with corpus-scale
    cardinality, e.g. per-document rollups), or ``"auto"`` (default):
    shuffle when the stored view exceeds ``max_driver_groups`` rows —
    the same count-then-switch rule as exact_dedup/corpus_stats."""
    from ..sources.clustered import (
        _delta_files, _read_version_files, _repair_if_crashed, evolution,
        store_version,
    )

    if combine not in ("auto", "driver", "shuffle"):
        raise ValueError(f"refresh_matview: unknown combine {combine!r}")
    store_dir = os.path.abspath(store_dir)
    _repair_if_crashed(store_dir)
    with open(os.path.join(view_dir, _META_NAME)) as f:
        meta = json.load(f)
    v_from, v_to = int(meta["store_version"]), store_version(store_dir)
    desc = evolution.load_schema(store_dir)
    spec, renames = _translate_spec(meta, desc)
    if v_from == v_to:
        old = _view_table(view_dir, meta)
        return {"mode": "noop", "from_version": v_from, "to_version": v_to,
                "groups": len(old)}
    def _full():
        out = create_matview(
            store_dir, view_dir, group_by=spec["group_by"],
            sums=spec.get("sums"), means=spec.get("means"),
            mins=spec.get("mins"), maxs=spec.get("maxs"),
        )
        return {"mode": "full", "from_version": v_from,
                "to_version": out["store_version"], "groups": out["groups"]}

    try:
        only_from, only_to = _delta_files(store_dir, v_from, v_to)
    except ValueError:
        # base version vacuumed out of retention — recompute from scratch
        return _full()
    mins_, maxs_ = _mm_plan(spec)
    if (mins_ or maxs_) and only_from:
        # non-invertible aggregates: the delta REMOVES files (delete /
        # upsert / rewrite), so a deleted row may have carried a group's
        # current min/max — recompute-on-invalidation (r4 VERDICT #6)
        return _full()
    group_by_, sums_, means_ = _agg_plan(spec)
    need = list(dict.fromkeys(group_by_ + sums_ + means_ + mins_ + maxs_))
    sides = []
    if only_to:
        sides.append(
            _read_version_files(
                store_dir, only_to, v_to, desc, columns=need
            ).map_batches(_signed_partials(spec, +1), batch_format="pyarrow")
        )
    if only_from:
        sides.append(
            _read_version_files(
                store_dir, only_from, v_from, desc, columns=need
            ).map_batches(_signed_partials(spec, -1), batch_format="pyarrow")
        )
    use_shuffle = combine == "shuffle" or (
        combine == "auto" and int(meta.get("groups", 0)) > max_driver_groups
    )
    if sides and use_shuffle:
        import ray.data as rd

        ds = sides[0]
        for s in sides[1:]:
            ds = ds.union(s)
        old_ds = rd.read_parquet(os.path.join(view_dir, meta["table"]))
        _spec = spec

        def _upgrade(b: pa.Table) -> pa.Table:
            if renames:
                b = b.rename_columns(
                    [renames.get(c, c) for c in b.column_names]
                )
            for c in _spec.get("means", ()):
                if f"_mn_{c}" not in b.column_names:
                    b = b.append_column(
                        f"_mn_{c}", b.column("_n").cast(pa.int64())
                    )
            return b

        old_ds = old_ds.map_batches(_upgrade, batch_format="pyarrow")
        df = _finalize(_fold(old_ds.union(ds), spec).to_pandas(), spec)
    elif sides:
        old = _view_table(view_dir, meta)
        if renames:
            old = old.rename(columns=renames)
        old = _ensure_mn(old, spec)
        ds = sides[0]
        for s in sides[1:]:
            ds = ds.union(s)
        delta = _fold(ds, spec).to_pandas()
        merged = pd.concat([old, delta], ignore_index=True)
        group_by, sums, means = _agg_plan(spec)
        mins2, maxs2 = _mm_plan(spec)
        agg = {
            c: "sum" for c in merged.columns
            if c not in group_by and not c.startswith(("min_", "max_"))
        }
        agg.update({f"min_{c}": "min" for c in mins2})
        agg.update({f"max_{c}": "max" for c in maxs2})
        merged = merged.groupby(
            group_by, as_index=False, sort=False, dropna=False
        ).agg(agg)
        df = _finalize(merged, spec)
    else:
        old = _view_table(view_dir, meta)
        if renames:
            old = old.rename(columns=renames)
        df = _ensure_mn(old, spec)
    meta["store_version"] = v_to
    meta["spec"] = spec
    meta["spec_schema_v"] = 0 if desc is None else int(desc["v"])
    _publish(view_dir, df, meta)
    return {"mode": "incremental", "from_version": v_from,
            "to_version": v_to, "groups": len(df)}


def read_matview(view_dir: str) -> pd.DataFrame:
    """The view in user terms: group keys + ``n`` + ``sum_{c}`` +
    ``mean_{c}`` (derived from the maintained sum/count) + ``min_{c}`` /
    ``max_{c}``. Chained (view-over-view) tables store the user-facing
    frame directly."""
    with open(os.path.join(view_dir, _META_NAME)) as f:
        meta = json.load(f)
    df = _view_table(view_dir, meta)
    if meta.get("chain"):
        return df
    spec = meta["spec"]
    df = _ensure_mn(df, spec)
    group_by, sums, means = _agg_plan(spec)
    out = df[group_by].copy()
    out["n"] = df["_n"].astype("int64")
    for c in sums:
        out[f"sum_{c}"] = df[f"sum_{c}"]
    for c in means:
        # divide by the NON-NULL count (SQL AVG semantics); a group
        # whose mean column is entirely null yields NaN, matching AVG
        out[f"mean_{c}"] = df[f"_msum_{c}"] / df[f"_mn_{c}"].where(
            df[f"_mn_{c}"] > 0
        )
    mins, maxs = _mm_plan(spec)
    for c in mins:
        out[f"min_{c}"] = df[f"min_{c}"]
    for c in maxs:
        out[f"max_{c}"] = df[f"max_{c}"]
    return out


# ------------------------------------------------------------ view chains ---
# r4 VERDICT #6: view-over-view. The parent view's materialized table is
# dashboard-sized BY CONSTRUCTION (it is a grouped aggregate), so the
# scale-honest chain refresh is: parent refreshes incrementally from the
# store delta, child recomputes from the parent's SMALL table —
# O(parent groups), never O(store). The child treats the parent output
# as a plain table: its aggregate columns reference the parent's
# user-facing columns ("n", "sum_w", "mean_h", ...).


def _chain_agg(parent: pd.DataFrame, spec: dict) -> pd.DataFrame:
    group_by, sums, means = _agg_plan(spec)
    mins, maxs = _mm_plan(spec)
    agg = {"n": ("_one", "sum")}
    parent = parent.copy()
    parent["_one"] = np.int64(1)
    for c in sums:
        agg[f"sum_{c}"] = (c, "sum")
    for c in means:
        agg[f"mean_{c}"] = (c, "mean")
    for c in mins:
        agg[f"min_{c}"] = (c, "min")
    for c in maxs:
        agg[f"max_{c}"] = (c, "max")
    out = parent.groupby(group_by, as_index=False, dropna=False).agg(**agg)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(group_by).reset_index(drop=True)


def create_matview_over(
    parent_dir: str,
    view_dir: str,
    *,
    group_by: list[str],
    sums: "list[str] | None" = None,
    means: "list[str] | None" = None,
    mins: "list[str] | None" = None,
    maxs: "list[str] | None" = None,
) -> dict:
    """Materialize a CHILD view over an existing view's output table.
    Records the parent's generation; ``refresh_matview_over`` is a noop
    until the parent republishes."""
    parent_dir = os.path.abspath(parent_dir)
    with open(os.path.join(parent_dir, _META_NAME)) as f:
        pmeta = json.load(f)
    spec = {"group_by": list(group_by), "sums": list(sums or ()),
            "means": list(means or ()), "mins": list(mins or ()),
            "maxs": list(maxs or ())}
    _agg_plan(spec)
    df = _chain_agg(read_matview(parent_dir), spec)
    meta = {"chain": True, "parent": parent_dir,
            "parent_gen": int(pmeta["gen"]), "spec": spec}
    _publish(view_dir, df, meta)
    return {"parent_gen": int(pmeta["gen"]), "groups": len(df)}


def refresh_matview_over(view_dir: str) -> dict:
    """Bring a chained view up to its parent's current generation (noop
    when the parent hasn't republished). Cost: one pandas groupby over
    the parent's materialized table."""
    with open(os.path.join(view_dir, _META_NAME)) as f:
        meta = json.load(f)
    if not meta.get("chain"):
        raise ValueError(f"{view_dir}: not a chained view")
    parent_dir = meta["parent"]
    with open(os.path.join(parent_dir, _META_NAME)) as f:
        pmeta = json.load(f)
    g_from, g_to = int(meta["parent_gen"]), int(pmeta["gen"])
    if g_from == g_to:
        return {"mode": "noop", "parent_gen": g_to,
                "groups": int(meta.get("groups", 0))}
    df = _chain_agg(read_matview(parent_dir), meta["spec"])
    meta["parent_gen"] = g_to
    _publish(view_dir, df, meta)
    return {"mode": "recompute", "parent_gen": g_to, "groups": len(df)}
