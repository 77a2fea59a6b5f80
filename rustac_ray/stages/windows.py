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

__all__ = ["tumbling", "sliding", "session_windows"]


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

    → (user_id, session_start, session_end, n_events). Ordering: each
    group sorts its own events by ts (no global sort needed).
    """
    gap_us = gap_s * 1_000_000

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_session = np.concatenate([[True], np.diff(ts) > gap_us])
        sid = np.cumsum(new_session)
        out = (
            pd.DataFrame({"sid": sid, "ts": ts})
            .groupby("sid")["ts"]
            .agg(["min", "max", "count"])
            .reset_index(drop=True)
        )
        return pd.DataFrame(
            {
                user_col: g[user_col].iloc[0],
                "session_start": out["min"].astype("datetime64[us]"),
                "session_end": out["max"].astype("datetime64[us]"),
                "n_events": out["count"].astype(np.int64),
            }
        )

    return events_ds.groupby(user_col).map_groups(sessionize, batch_format="pandas")
