"""Funnel analysis over an event stream: ordered multi-step conversion.

The product-analytics staple ("view → click → purchase"): for each step
k, the users who performed step k AFTER their step-(k-1) time. At 100 TB
of events the wrong shape is a per-user ``map_groups`` (one Ray group
dispatch per user — the repo's measured ~10ms/group makes 10^8 users
hours of dispatch); the shape here is the repo's bucketed co-group:
events and the previous level's per-user thresholds both hash-bucket by
user into a BOUNDED number of buckets (every user fully inside one
bucket), and each bucket does ONE vectorized pandas merge + threshold
filter + per-user min. Ray groups = buckets (64 by default), never
users; per-level tables shrink monotonically (funnel property).

(A native ``Dataset.join`` was the first implementation; Ray 2.49's
hash-shuffle join dies with "no match for key field ... right side"
whenever a join partition comes up empty — guaranteed when
num_partitions exceeds the distinct-key count — so the co-group keeps
the operator independent of that failure mode and needs no per-level
materialization barrier.)

Reference anchor: no funnel in the reference (it has no event
analytics); this extends the task-mandated windows/sessionization family
(SURVEY §2.9) with the ordered-sequence aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["funnel_counts", "funnel_users", "funnel_counts_sessionized",
           "retention_cohorts"]

_KNUTH = np.uint64(2654435761)


def _bucket_of(users: np.ndarray, n_buckets: int) -> np.ndarray:
    users = np.asarray(users)
    if users.dtype.kind in "iu":
        u = users.astype(np.uint64, copy=False)
    else:
        # string / datetime / float ids: vectorized process-stable hash
        # (pandas' siphash with its fixed default key — NOT Python's
        # per-process-salted hash()), so every actor agrees on buckets
        u = pd.util.hash_array(users, categorize=False).astype(np.uint64)
    return ((u * _KNUTH) % np.uint64(1 << 32) % np.uint64(n_buckets)).astype(
        np.int64
    )


# target rows per co-group bucket when auto-sizing: one bucket's merge
# frame (events + thresholds for ~this many rows) stays well inside a
# worker heap; at 100x event volume the bucket COUNT grows, not the
# bucket SIZE
_TARGET_ROWS_PER_BUCKET = 500_000
_MIN_BUCKETS = 64


def _auto_buckets(events_ds, n_buckets: "int | None") -> int:
    """Derive the co-group bucket count from the input size (the
    exact_dedup ``combine="auto"`` count-then-size pattern) unless the
    caller pinned one. ``count()`` is metadata-only on a parquet-backed
    Dataset — the usual funnel input."""
    if n_buckets is not None:
        return int(n_buckets)
    n = events_ds.count() or 0
    return max(_MIN_BUCKETS, -(-int(n) // _TARGET_ROWS_PER_BUCKET))


def _first_level(ds, step, user_col, ts_col, type_col):
    """Per-user min ts of ``step`` events — partial mins per batch, one
    tiny groupby(user).Min fold."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def partial(b: pa.Table) -> pd.DataFrame:
        b = b.filter(pc.equal(b[type_col], step))
        df = b.select([user_col, ts_col]).to_pandas()
        return df.groupby(user_col, as_index=False)[ts_col].min()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(user_col)
        .aggregate(Min(ts_col, alias_name="_prev_ts"))
    )


def _next_level(ds, prev, step, user_col, ts_col, type_col, n_buckets,
                within=None):
    """Per-user min ts of ``step`` events strictly after the user's
    prev-level time (and within ``within`` of it, when given): bucketed
    co-group (side-tagged union, one pandas merge + filter + min per
    bucket)."""
    import pyarrow.compute as pc

    def tag_events(b: pa.Table) -> pd.DataFrame:
        # ALL step events ship (no batch-local pre-min: a batch's min may
        # fall below the user's threshold while a later event clears it);
        # shuffle volume is the step's event count — the funnel input
        df = b.filter(pc.equal(b[type_col], step)).select(
            [user_col, ts_col]
        ).to_pandas()
        df["_b"] = _bucket_of(df[user_col].to_numpy(), n_buckets)
        df["_side"] = np.int8(0)
        df = df.rename(columns={ts_col: "_t"})
        return df

    def tag_prev(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().rename(columns={"_prev_ts": "_t"})
        df["_b"] = _bucket_of(df[user_col].to_numpy(), n_buckets)
        df["_side"] = np.int8(1)
        return df[[user_col, "_t", "_b", "_side"]]

    both = ds.map_batches(tag_events, batch_format="pyarrow").union(
        prev.map_batches(tag_prev, batch_format="pyarrow")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ev = g[g["_side"] == 0]
        th = g[g["_side"] == 1][[user_col, "_t"]].rename(
            columns={"_t": "_thr"}
        )
        if not len(ev) or not len(th):
            return pd.DataFrame({user_col: [], "_prev_ts": []}).astype(
                {user_col: g[user_col].dtype, "_prev_ts": g["_t"].dtype}
            )
        m = ev.merge(th, on=user_col, how="inner")
        m = m[m["_t"] > m["_thr"]]
        if within is not None:
            m = m[m["_t"] <= m["_thr"] + within]
        out = m.groupby(user_col, as_index=False)["_t"].min()
        return out.rename(columns={"_t": "_prev_ts"})

    return both.groupby("_b").map_groups(per_bucket, batch_format="pandas")


def funnel_users(
    events_ds,
    steps: "list[str]",
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_buckets: "int | None" = None,
    within=None,
):
    """Per-step Datasets of (user, first-qualifying ts): element k holds
    every user who completed steps[0..k] in strict ts order. ``within``
    (pandas-compatible timedelta / numeric delta) bounds each step to at
    most that long after the previous one — the windowed-conversion
    convention."""
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    n_buckets = _auto_buckets(events_ds, n_buckets)
    outs = []
    prev = _first_level(events_ds, steps[0], user_col, ts_col, type_col)
    outs.append(prev)
    for s in steps[1:]:
        prev = _next_level(
            events_ds, prev, s, user_col, ts_col, type_col, n_buckets,
            within=within,
        )
        outs.append(prev)
    return outs


def funnel_counts(
    events_ds,
    steps: "list[str]",
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_buckets: "int | None" = None,
    within=None,
) -> pd.DataFrame:
    """→ (step, n_users, conversion): users completing each funnel
    prefix in strict order, conversion relative to the first step. The
    O(steps)-row result is the only thing that reaches the driver."""
    levels = funnel_users(
        events_ds, steps,
        user_col=user_col, ts_col=ts_col, type_col=type_col,
        n_buckets=n_buckets, within=within,
    )
    ns = [lvl.count() for lvl in levels]
    base = max(ns[0], 1)
    return pd.DataFrame(
        {
            "step": steps,
            "n_users": np.asarray(ns, np.int64),
            "conversion": [round(n / base, 9) for n in ns],
        }
    )


def retention_cohorts(
    events_ds,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: "int | None" = None,
):
    """Cohort retention: users grouped by FIRST-activity week, counted
    once per (cohort, week-offset) they were active in — the standard
    retention triangle. → Dataset (cohort_week, week_offset, n_users).

    Weeks are integer epoch-week indices (epoch_ms // 86400000 // 7),
    pure integer arithmetic on both the engine and the SQL twin. Same
    scale shape as the funnel: per-user first-activity via groupby.Min,
    then ONE bucketed co-group (users hash into a bounded bucket count)
    where each bucket computes its users' distinct (cohort, offset)
    pairs vectorized — per-bucket distinct is globally correct because a
    user lives in exactly one bucket — followed by an O(cohorts×weeks)
    count fold."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    n_buckets = _auto_buckets(events_ds, n_buckets)

    def _weeks(b: pa.Table) -> pd.DataFrame:
        # truncating cast (sub-ms precision would make the safe cast
        # raise); positive epochs truncate toward zero == floor, matching
        # the SQL twin's epoch_ms
        ms = (
            pc.cast(b[ts_col], pa.timestamp("ms"), safe=False)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        df = pd.DataFrame({user_col: b[user_col].to_numpy(zero_copy_only=False)})
        df["_wk"] = (ms // 86_400_000) // 7
        return df

    wk = events_ds.map_batches(_weeks, batch_format="pyarrow")
    first = wk.groupby(user_col).aggregate(Min("_wk", alias_name="_cohort"))

    def tag_act(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()  # batch-local dedup shrinks the shuffle
        df["_b"] = _bucket_of(df[user_col].to_numpy(), n_buckets)
        df["_side"] = np.int8(0)
        df = df.rename(columns={"_wk": "_v"})
        return df

    def tag_first(b: pa.Table) -> pd.DataFrame:
        df = b.to_pandas().rename(columns={"_cohort": "_v"})
        df["_b"] = _bucket_of(df[user_col].to_numpy(), n_buckets)
        df["_side"] = np.int8(1)
        return df[[user_col, "_v", "_b", "_side"]]

    both = wk.map_batches(tag_act, batch_format="pandas").union(
        first.map_batches(tag_first, batch_format="pyarrow")
    )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        act = g[g["_side"] == 0][[user_col, "_v"]].rename(columns={"_v": "_wk"})
        fst = g[g["_side"] == 1][[user_col, "_v"]].rename(
            columns={"_v": "_cohort"}
        )
        if not len(act) or not len(fst):
            return pd.DataFrame(
                {"cohort_week": pd.array([], dtype="int64"),
                 "week_offset": pd.array([], dtype="int64"),
                 "_n": pd.array([], dtype="int64")}
            )
        m = act.drop_duplicates().merge(fst, on=user_col, how="inner")
        m["week_offset"] = m["_wk"] - m["_cohort"]
        d = m[[user_col, "_cohort", "week_offset"]].drop_duplicates()
        out = (
            d.groupby(["_cohort", "week_offset"], as_index=False)[user_col]
            .size()
            .rename(columns={"_cohort": "cohort_week", "size": "_n"})
        )
        out["_n"] = out["_n"].astype("int64")
        return out

    counts = both.groupby("_b").map_groups(per_bucket, batch_format="pandas")
    folded = counts.groupby(["cohort_week", "week_offset"]).aggregate(
        Sum("_n", alias_name="n_users")
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": b["cohort_week"].cast(pa.int64()),
                "week_offset": b["week_offset"].cast(pa.int64()),
                "n_users": b["n_users"].cast(pa.int64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


def funnel_counts_sessionized(
    events_ds,
    steps: "list[str]",
    gap,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    n_buckets: "int | None" = None,
) -> pd.DataFrame:
    """SESSIONIZED funnel: the ordered step chain must complete within a
    single session — a user's events split at inactivity gaps > ``gap``
    (pandas-compatible timedelta / numeric delta), and each (user,
    session) converts independently. → (step, n_sessions, conversion).

    Scale shape: ONE bucketed co-group (all of a user's funnel-relevant
    events land in one bucket — users hash to buckets, so sessionization
    and the per-session min-chain are bucket-local and vectorized); only
    O(buckets × steps) count rows ever leave the buckets. Unlike the
    global funnel, no per-level threshold re-shuffles happen at all."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs >= 2 steps")
    n_buckets = _auto_buckets(events_ds, n_buckets)
    k = len(steps)

    def tag(b: pa.Table) -> pd.DataFrame:
        b = b.filter(pc.is_in(b[type_col], pa.array(steps)))
        df = b.select([user_col, ts_col, type_col]).to_pandas()
        df["_b"] = _bucket_of(df[user_col].to_numpy(), n_buckets)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"_lvl": pd.array([], dtype="int64"),
             "_n": pd.array([], dtype="int64")}
        )
        if not len(g):
            return empty
        g = g.sort_values([user_col, ts_col], kind="stable")
        ts = g[ts_col]
        new_user = (g[user_col] != g[user_col].shift()).to_numpy()
        broke = ((ts - ts.shift()) > gap).to_numpy()
        g = g.assign(_sid=np.cumsum(new_user | broke))
        counts = []
        cur = g[g[type_col] == steps[0]].groupby("_sid")[ts_col].min()
        counts.append(len(cur))
        for s in steps[1:]:
            ev = g[g[type_col] == s]
            m = ev.merge(
                cur.rename("_thr"), left_on="_sid", right_index=True
            )
            m = m[m[ts_col] > m["_thr"]]
            cur = m.groupby("_sid")[ts_col].min()
            counts.append(len(cur))
        return pd.DataFrame(
            {"_lvl": np.arange(k, dtype=np.int64),
             "_n": np.asarray(counts, np.int64)}
        )

    raw = (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("_lvl")
        .aggregate(Sum("_n", alias_name="n"))
        .to_pandas()
    )
    # no matching events at all: the empty aggregate loses its schema
    folded = (
        raw.set_index("_lvl")["n"] if "_lvl" in raw.columns else pd.Series(
            [], dtype="int64"
        )
    )
    ns = [int(folded.get(i, 0)) for i in range(k)]
    base = max(ns[0], 1)
    return pd.DataFrame(
        {
            "step": steps,
            "n_sessions": np.asarray(ns, np.int64),
            "conversion": [round(n / base, 9) for n in ns],
        }
    )
