"""Window aggregates over the events log (streaming-shaped workloads).

Ray Data is a streaming-BATCH engine (no watermarks — the reference has
none either, SURVEY.md §2.9): the events table is treated as an ordered,
partitioned log. Windows are expressed as key columns + grouped aggregation:

- ``tumbling``: window = floor(ts / size) — a pure column, so the only
  shuffle is the grouped aggregate over per-batch partials.
- ``sliding``: each event replicates into the ceil(size/step) windows that
  contain it (flat_map-style explode inside map_batches), then tumbling
  machinery applies.
- ``session_windows``: per-user sessionization (gap-split) via
  ``groupby(user).map_groups`` over ts-sorted groups — the ordering
  assumption is per-group sort inside the group function, not global order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "tumbling", "sliding", "session_windows", "running_totals",
    "tumbling_distinct",
    "analytic_window",
]


def _window_partials(batch: pa.Table, ts_col, size_us, key_col, value_col, offsets):
    ts = batch[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
    keys = np.asarray(batch[key_col].to_pylist(), dtype=object)
    vals = batch[value_col].to_numpy()
    frames = []
    for off in offsets:
        w = ((ts - off) // size_us) * size_us + off
        frames.append(pd.DataFrame({"window_start": w, key_col: keys, "v": vals}))
    df = pd.concat(frames, ignore_index=True)
    g = (
        df.groupby(["window_start", key_col], sort=False)["v"]
        .agg(["count", "sum"])
        .reset_index()
    )
    g.columns = ["window_start", key_col, "n", "total"]
    return pa.Table.from_pandas(g, preserve_index=False)


def _finish(partials, key_col):
    from ray.data.aggregate import Sum

    out = partials.groupby(["window_start", key_col]).aggregate(
        Sum("n", alias_name="n_events"), Sum("total", alias_name="sum_value")
    )

    def to_ts(batch: pa.Table) -> pa.Table:
        ws = batch["window_start"].to_numpy().astype("datetime64[us]")
        return batch.set_column(
            batch.schema.get_field_index("window_start"),
            "window_start",
            pa.array(ws).cast(pa.timestamp("us")),
        )

    return out.map_batches(to_ts, batch_format="pyarrow")


def tumbling(events_ds, size_s: int, *, ts_col="ts", key_col="event_type", value_col="value"):
    """→ (window_start, key, n_events, sum_value); combiner-first."""
    size_us = size_s * 1_000_000
    partials = events_ds.map_batches(
        lambda b: _window_partials(b, ts_col, size_us, key_col, value_col, [0]),
        batch_format="pyarrow",
    )
    return _finish(partials, key_col)


def sliding(events_ds, size_s: int, step_s: int, *, ts_col="ts", key_col="event_type", value_col="value"):
    """Sliding windows of ``size_s`` every ``step_s``: each event lands in
    size/step windows (offsets 0, -step, -2·step, … shifted starts)."""
    assert size_s % step_s == 0, "size must be a multiple of step"
    size_us = size_s * 1_000_000
    step_us = step_s * 1_000_000
    # a window starting at w covers [w, w+size); events replicate per offset
    offsets = [(-k * step_us) % size_us for k in range(size_s // step_s)]
    partials = events_ds.map_batches(
        lambda b: _window_partials(b, ts_col, size_us, key_col, value_col, offsets),
        batch_format="pyarrow",
    )
    return _finish(partials, key_col)


def session_windows(events_ds, gap_s: int, *, ts_col="ts", user_col="user_id"):
    """Per-user sessions split at inactivity gaps > gap_s.

    → (user_id, session_start, session_end, n_events).

    Two-level seam design, NOT a per-user ``map_groups`` (r02 verdict #2:
    millions of users × ~10 ms fixed Ray-group cost = hours of pure
    overhead, and a hot user is a single-task straggler): sort by
    (user, ts) range-partitions the events; each contiguous batch
    sessionizes its user runs with one vectorized pass and streams every
    INTERIOR session out as final — an outside event can never fall
    between two in-batch events of the same user. Only the two sessions
    touching each batch edge (first session of the first run, last
    session of the last run) go to the driver, which sweep-merges the
    O(batches) seam chain (adjacent sessions of one user merge when the
    seam gap ≤ gap_s; merging never changes the far endpoints, so no
    cascade past the chain).
    """
    import ray.data as rd

    from .seam import check_sorted_batch, contiguous_run_bounds, preserve_order_execution

    gap_us = gap_s * 1_000_000

    def _users_np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            return np.asarray(col.to_pylist(), dtype=object)
        return col.to_numpy(zero_copy_only=False)

    def batch_proc(batch: pa.Table) -> pa.Table:
        n = len(batch)
        u_type = batch.schema.field(user_col).type
        if n == 0:
            return pa.schema(
                [(user_col, u_type), ("s", pa.int64()), ("e", pa.int64()),
                 ("n_events", pa.int64()), ("seam", pa.int8())]
            ).empty_table()
        u = _users_np(batch[user_col])
        t = batch[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        if not check_sorted_batch(u, t):
            raise RuntimeError("session_windows: batch not contiguous-sorted "
                               "(preserve_order violated)")
        bounds = contiguous_run_bounds(u)
        out_u, out_s, out_e, out_n, out_seam = [], [], [], [], []
        for s0, e0 in zip(bounds[:-1], bounds[1:]):
            tt = t[s0:e0]
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(tt) > gap_us) + 1]
            )
            ends = np.concatenate([starts[1:], [len(tt)]])
            k = len(starts)
            seam = np.zeros(k, np.int8)
            if s0 == 0:
                seam[0] = 1  # may merge backward into the previous batch
            if e0 == n:
                seam[-1] = 1  # may merge forward into the next batch
            out_u.append(np.repeat(u[s0], k) if not isinstance(u[s0], str)
                         else np.full(k, u[s0], object))
            out_s.append(tt[starts])
            out_e.append(tt[ends - 1])
            out_n.append((ends - starts).astype(np.int64))
            out_seam.append(seam)
        return pa.table(
            {
                user_col: pa.array(np.concatenate(out_u), type=u_type),
                "s": pa.array(np.concatenate(out_s), pa.int64()),
                "e": pa.array(np.concatenate(out_e), pa.int64()),
                "n_events": pa.array(np.concatenate(out_n), pa.int64()),
                "seam": pa.array(np.concatenate(out_seam), pa.int8()),
            }
        )

    cols = events_ds.map_batches(
        lambda b: b.select([user_col, ts_col]), batch_format="pyarrow"
    )
    stream = cols.sort([user_col, ts_col]).map_batches(
        batch_proc, batch_format="pyarrow"
    )
    with preserve_order_execution():
        mat = stream.materialize()

    def final_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        sel = b.filter(pc.equal(b["seam"], 0))
        return pa.table(
            {
                user_col: sel[user_col],
                "session_start": sel["s"].to_numpy().astype("datetime64[us]"),
                "session_end": sel["e"].to_numpy().astype("datetime64[us]"),
                "n_events": sel["n_events"],
            }
        )

    final_ds = mat.map_batches(final_only, batch_format="pyarrow")

    def seam_only(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(b["seam"], 1))

    parts = [
        b.to_pandas()
        for b in mat.map_batches(seam_only, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if len(b)
    ]
    if not parts:
        return final_ds
    chain = pd.concat(parts, ignore_index=True).sort_values(
        [user_col, "s", "e"], kind="mergesort"
    )
    uu = chain[user_col].to_numpy()
    ss = chain["s"].to_numpy()
    ee = chain["e"].to_numpy()
    nn = chain["n_events"].to_numpy()
    mu, ms, me, mn = [], [], [], []
    for i in range(len(chain)):
        if mu and mu[-1] == uu[i] and ss[i] - me[-1] <= gap_us:
            me[-1] = max(me[-1], int(ee[i]))
            mn[-1] += int(nn[i])
        else:
            mu.append(uu[i])
            ms.append(int(ss[i]))
            me.append(int(ee[i]))
            mn.append(int(nn[i]))
    tail = pa.table(
        {
            user_col: pa.array(pd.Series(mu, dtype=chain[user_col].dtype)),
            "session_start": pa.array(
                np.asarray(ms, np.int64).astype("datetime64[us]")
            ),
            "session_end": pa.array(
                np.asarray(me, np.int64).astype("datetime64[us]")
            ),
            "n_events": pa.array(np.asarray(mn, np.int64), pa.int64()),
        }
    )
    return final_ds.union(rd.from_arrow(tail))


def _order_key_int(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Order column → int64 (epoch-us for timestamps/dates, as-is for
    ints) so driver-side block ordering compares exactly."""
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "M":
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


def running_totals(ds, *, group_col: str, ts_col: str, id_col: str,
                   value_col: str):
    """Per-group running totals — the cumulative-window analogue of
    ``SUM(v) OVER (PARTITION BY g ORDER BY ts, id ROWS UNBOUNDED
    PRECEDING)`` — emitted for EVERY row, without ever collecting a
    group. ``id_col`` must be a unique int64 tie-break (total order) and
    ``value_col`` integral (exact int64 arithmetic). → (id, g, running).

    Scale shape (the prefix-sum problem is the canonical "windows need
    global order" trap — a naive per-group ``map_groups`` collects whole
    groups, and a skewed group is one task):

    1. sort by (g, ts, id) and MATERIALIZE — block layout is now fixed,
       so two passes with ``batch_size=None`` (batch == block) see
       byte-identical blocks; no reliance on task bundling or
       ``preserve_order``.
    2. pass 1 emits one (block-first-key, g, subtotal) row per group run
       per block — O(blocks × groups-per-block), tiny.
    3. the driver orders blocks by their first (g, ts, id) key (unique:
       id is unique) and computes each block's per-group starting offset
       — a prefix sum over block subtotals, never over rows.
    4. pass 2 re-reads the SAME materialized blocks, does a local
       vectorized per-group cumsum, and adds the block's broadcast
       offset. Rows never shuffle after the one sort.
    """
    import ray as _ray

    sel = ds.select_columns([group_col, ts_col, id_col, value_col])
    mat = sel.sort([group_col, ts_col, id_col]).materialize()

    _SUB = pa.schema(
        [("bk_g", pa.string()), ("bk_t", pa.int64()), ("bk_i", pa.int64()),
         ("g", pa.string()), ("sub", pa.int64())]
    )

    def subtotal(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _SUB.empty_table()
        g = np.asarray(b[group_col].to_pylist(), dtype=object)
        t = _order_key_int(b[ts_col])
        i = b[id_col].to_numpy().astype(np.int64)
        v = b[value_col].to_numpy().astype(np.int64)
        change = np.flatnonzero(g[1:] != g[:-1]) + 1
        bounds = np.concatenate([[0], change, [len(g)]])
        gs = [str(g[s]) for s in bounds[:-1]]
        subs = np.add.reduceat(v, bounds[:-1])
        n = len(gs)
        return pa.table(
            {
                "bk_g": pa.array([str(g[0])] * n, pa.string()),
                "bk_t": pa.array(np.full(n, t[0]), pa.int64()),
                "bk_i": pa.array(np.full(n, i[0]), pa.int64()),
                "g": pa.array(gs, pa.string()),
                "sub": pa.array(subs.astype(np.int64), pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in mat.map_batches(
            subtotal, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    offsets: dict[tuple, dict[str, int]] = {}
    if parts:
        allp = pd.concat(parts, ignore_index=True)
        blocks = (
            allp[["bk_g", "bk_t", "bk_i"]]
            .drop_duplicates()
            .sort_values(["bk_g", "bk_t", "bk_i"])
        )
        keys = list(blocks.itertuples(index=False, name=None))
        if len(keys) != allp[["bk_g", "bk_t", "bk_i"]].drop_duplicates().shape[0]:
            raise RuntimeError("running_totals: duplicate block keys")
        by_block = {
            k: sub for k, sub in allp.groupby(["bk_g", "bk_t", "bk_i"], sort=False)
        }
        cum: dict[str, int] = {}
        for k in keys:
            sub = by_block[k]
            offsets[k] = {gv: cum.get(gv, 0) for gv in sub["g"]}
            for gv, sv in zip(sub["g"], sub["sub"]):
                cum[gv] = cum.get(gv, 0) + int(sv)
    off_ref = _ray.put(offsets)

    class _Apply:
        def __init__(self):
            self.offsets = _ray.get(off_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if len(b) == 0:
                return pa.schema(
                    [(id_col, pa.int64()), (group_col, pa.string()),
                     ("running", pa.int64())]
                ).empty_table()
            g = pd.Series(np.asarray(b[group_col].to_pylist(), dtype=object))
            t = _order_key_int(b[ts_col])
            i = b[id_col].to_numpy().astype(np.int64)
            v = pd.Series(b[value_col].to_numpy().astype(np.int64))
            local = v.groupby(g, sort=False).cumsum().to_numpy()
            off = self.offsets.get((str(g.iloc[0]), int(t[0]), int(i[0])))
            if off is None:
                raise RuntimeError("running_totals: unknown block key "
                                   "(materialized layout changed)")
            base = g.map(lambda gv: off.get(str(gv), 0)).to_numpy(np.int64)
            return pa.table(
                {
                    id_col: pa.array(i, pa.int64()),
                    group_col: b[group_col],
                    "running": pa.array(local + base, pa.int64()),
                }
            )

    return mat.map_batches(
        _Apply, batch_format="pyarrow", batch_size=None, concurrency=2
    )


def analytic_window(ds, *, group_col: str, ts_col: str, id_col: str,
                    value_col: str, ntile: "int | None" = None):
    """Per-group analytic window functions in one distributed pass:
    ``ROW_NUMBER()``, ``DENSE_RANK()`` (over ``ts_col``) and ``LAG(v)``,
    each ``OVER (PARTITION BY g ORDER BY ts, id)`` — emitted for every
    row without ever collecting a group. ``id_col`` must be a unique
    int64 tie-break (total order) and ``value_col`` integral (exact
    int64; LAG of the first row per group is null).
    → (id, g, rn, drk, lag_v[, nt]). ``ntile=k`` adds ``NTILE(k)``
    (``nt``) — computed from rn + the O(groups) total table the offset
    pass already accumulates (first ``n % k`` tiles get the extra row,
    the SQL convention), so it costs no extra pass.

    Same scale shape as ``running_totals`` (windows.py:238): ONE sort by
    (g, ts, id) materialized, then two block-local passes stitched by a
    driver-side per-block offset table that is O(blocks ×
    groups-per-block) — rows never shuffle after the sort, and a skewed
    group costs nothing extra (its rows stay spread over many blocks).
    The only cross-block state per (block, group) is three scalars:
    rows-before (row_number offset), distinct-ts-before with a
    shared-boundary-ts correction (dense_rank offset), and the previous
    block's last value (the LAG seam).
    """
    import ray as _ray

    sel = ds.select_columns([group_col, ts_col, id_col, value_col])
    mat = sel.sort([group_col, ts_col, id_col]).materialize()

    _SUB = pa.schema(
        [("bk_g", pa.string()), ("bk_t", pa.int64()), ("bk_i", pa.int64()),
         ("g", pa.string()), ("cnt", pa.int64()), ("ndist", pa.int64()),
         ("first_t", pa.int64()), ("last_t", pa.int64()),
         ("last_v", pa.int64())]
    )

    def per_block(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return _SUB.empty_table()
        g = np.asarray(b[group_col].to_pylist(), dtype=object)
        t = _order_key_int(b[ts_col])
        i = b[id_col].to_numpy().astype(np.int64)
        v = b[value_col].to_numpy().astype(np.int64)
        change = np.flatnonzero(g[1:] != g[:-1]) + 1
        bounds = np.concatenate([[0], change, [len(g)]])
        rows = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            ts_run = t[s:e]
            rows.append(
                (str(g[s]), int(e - s),
                 int(1 + np.count_nonzero(np.diff(ts_run))),
                 int(ts_run[0]), int(ts_run[-1]), int(v[e - 1]))
            )
        n = len(rows)
        return pa.table(
            {
                "bk_g": pa.array([str(g[0])] * n, pa.string()),
                "bk_t": pa.array(np.full(n, t[0]), pa.int64()),
                "bk_i": pa.array(np.full(n, i[0]), pa.int64()),
                "g": pa.array([r[0] for r in rows], pa.string()),
                "cnt": pa.array([r[1] for r in rows], pa.int64()),
                "ndist": pa.array([r[2] for r in rows], pa.int64()),
                "first_t": pa.array([r[3] for r in rows], pa.int64()),
                "last_t": pa.array([r[4] for r in rows], pa.int64()),
                "last_v": pa.array([r[5] for r in rows], pa.int64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in mat.map_batches(
            per_block, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    # per (block, group): (rows_before, dense_offset, lag_seam_value|None)
    offsets: dict[tuple, dict[str, tuple]] = {}
    if parts:
        allp = pd.concat(parts, ignore_index=True)
        blocks = (
            allp[["bk_g", "bk_t", "bk_i"]]
            .drop_duplicates()
            .sort_values(["bk_g", "bk_t", "bk_i"])
        )
        keys = list(blocks.itertuples(index=False, name=None))
        by_block = {
            k: sub for k, sub in allp.groupby(["bk_g", "bk_t", "bk_i"], sort=False)
        }
        cum_cnt: dict[str, int] = {}
        cum_dist: dict[str, int] = {}
        last_t_seen: dict[str, int] = {}
        last_v_seen: dict[str, int] = {}
        for k in keys:
            sub = by_block[k]
            blk: dict[str, tuple] = {}
            for gv, cnt, ndist, ft, lt, lv in zip(
                sub["g"], sub["cnt"], sub["ndist"],
                sub["first_t"], sub["last_t"], sub["last_v"],
            ):
                rows_before = cum_cnt.get(gv, 0)
                dist_before = cum_dist.get(gv, 0)
                shared = (
                    gv in last_t_seen and last_t_seen[gv] == int(ft)
                )
                # shared boundary ts: this block's first distinct ts was
                # already counted by an earlier block
                dense_off = dist_before - (1 if shared else 0)
                blk[gv] = (rows_before, dense_off, last_v_seen.get(gv))
                cum_cnt[gv] = rows_before + int(cnt)
                cum_dist[gv] = dense_off + int(ndist)
                last_t_seen[gv] = int(lt)
                last_v_seen[gv] = int(lv)
            offsets[k] = blk
    off_ref = _ray.put(offsets)
    totals_ref = _ray.put(dict(cum_cnt) if parts else {})

    _out_fields = [
        (id_col, pa.int64()), (group_col, pa.string()),
        ("rn", pa.int64()), ("drk", pa.int64()), ("lag_v", pa.int64()),
    ]
    if ntile is not None:
        _out_fields.append(("nt", pa.int64()))
    _OUT = pa.schema(_out_fields)

    class _Apply:
        def __init__(self):
            self.offsets = _ray.get(off_ref)
            self.totals = _ray.get(totals_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if len(b) == 0:
                return _OUT.empty_table()
            g = np.asarray(b[group_col].to_pylist(), dtype=object)
            t = _order_key_int(b[ts_col])
            i = b[id_col].to_numpy().astype(np.int64)
            v = b[value_col].to_numpy().astype(np.int64)
            off = self.offsets.get((str(g[0]), int(t[0]), int(i[0])))
            if off is None:
                raise RuntimeError("analytic_window: unknown block key "
                                   "(materialized layout changed)")
            n = len(g)
            rn = np.empty(n, np.int64)
            nt = np.empty(n, np.int64)
            drk = np.empty(n, np.int64)
            lag = np.empty(n, np.float64)  # NaN = null
            change = np.flatnonzero(g[1:] != g[:-1]) + 1
            bounds = np.concatenate([[0], change, [n]])
            for s, e in zip(bounds[:-1], bounds[1:]):
                gv = str(g[s])
                rows_before, dense_off, seam_v = off[gv]
                rn[s:e] = rows_before + np.arange(1, e - s + 1)
                ts_run = t[s:e]
                local_dense = np.concatenate(
                    [[1], np.cumsum(np.diff(ts_run) != 0) + 1]
                )
                drk[s:e] = dense_off + local_dense
                lag[s:e] = np.concatenate(
                    [[np.nan if seam_v is None else float(seam_v)],
                     v[s:e - 1].astype(np.float64)]
                )
                if ntile is not None:
                    ntot = int(self.totals[gv])
                    k_ = int(ntile)
                    big = ntot % k_
                    size_big = ntot // k_ + 1
                    small = max(ntot // k_, 1)
                    r0 = rn[s:e] - 1
                    cutoff = big * size_big
                    nt[s:e] = np.where(
                        r0 < cutoff,
                        r0 // size_big,
                        big + (r0 - cutoff) // small,
                    ) + 1
            isnull = np.isnan(lag)
            cols = {
                id_col: pa.array(i, pa.int64()),
                group_col: b[group_col],
                "rn": pa.array(rn, pa.int64()),
                "drk": pa.array(drk, pa.int64()),
                "lag_v": pa.array(
                    np.where(isnull, 0, lag).astype(np.int64),
                    pa.int64(),
                    mask=isnull,
                ),
            }
            if ntile is not None:
                cols["nt"] = pa.array(nt, pa.int64())
            return pa.table(cols)

    return mat.map_batches(
        _Apply, batch_format="pyarrow", batch_size=None, concurrency=2
    )


def tumbling_distinct(
    events_ds,
    size_s: int,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    n_buckets: "int | None" = None,
):
    """EXACT distinct users per tumbling window → (window_start,
    n_distinct), window_start = epoch-ms floor to the window size
    (integer arithmetic, matching a SQL epoch_ms // size twin).

    Scale shape (the funnel family's bucketed co-group): per-batch
    LOCAL dedup of (window, user) pairs shrinks the shuffle to the
    distinct mass, users hash into a bounded bucket count
    (auto-sized from input count), each bucket counts ITS users'
    distinct (window, user) pairs vectorized — exact globally because a
    user lives in one bucket — then an O(windows) count fold. No
    corpus-sized distinct state anywhere (the approximate companion is
    sketch.approx_distinct/HLL)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .funnel import _auto_buckets, _bucket_of

    n_buckets = _auto_buckets(events_ds, n_buckets)
    size_ms = np.int64(int(size_s) * 1000)

    def tag(b: pa.Table) -> pd.DataFrame:
        ms = (
            pc.cast(b[ts_col], pa.timestamp("ms"), safe=False)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        df = pd.DataFrame(
            {
                "_w": (ms // size_ms) * size_ms,
                user_col: b[user_col].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        df["_b"] = _bucket_of(df[user_col].to_numpy(), n_buckets)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["_w", user_col]].drop_duplicates()
        out = d.groupby("_w", as_index=False).size().rename(
            columns={"size": "_n"}
        )
        out["_n"] = out["_n"].astype("int64")
        return out[["_w", "_n"]]

    folded = (
        events_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_b")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("_w")
        .aggregate(Sum("_n", alias_name="n_distinct"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": b["_w"].cast(pa.int64()),
                "n_distinct": b["n_distinct"].cast(pa.int64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")
