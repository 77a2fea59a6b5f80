"""As-of and interval (range) joins — Ray-Data-native, two strategies each.

The reference's join surface is spatial (rustac's intersects/bbox search);
a training-data pipeline over the same tables also needs the 1-D ordered
joins (task brief: "as-of join, range join" as custom operators Ray Data
lacks). Both are built from the same two shapes as the spatial join
(stages/spatial_join.py):

- **broadcast**: the small side is prepared ONCE (sorted frame / interval
  segment index), shipped via one ``ray.put``, and every ``map_batches``
  task streams probe batches against it with a vectorized kernel
  (``pd.merge_asof`` / CSR segment gather). Zero shuffle; the probe side
  never materializes. This is the 100-TB path whenever the build side
  fits in a worker heap (reference tables, bands, calendars …).
- **partitioned**: both sides large → hash-bucket both sides on the key
  (asof) or domain-chunk on the value (interval), union the tagged
  sides, and run ONE vectorized per-bucket kernel inside
  ``groupby(bucket).map_groups``. The only shuffle is the bucket
  groupby; buckets are sized by ``num_partitions``, and the interval
  side replicates only into the chunks it overlaps (the 1-D analogue of
  the cell-replication in partitioned_spatial_join).

Determinism under ties: an as-of probe with several build rows at the
identical (key, ts) must pick one deterministically regardless of block
arrival order — callers pass ``tie_break`` (a column name); the build
side keeps the max-``tie_break`` row per (key, ts), matching a DuckDB
``ASOF JOIN`` over an ``arg_max`` canonicalized build table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

__all__ = ["asof_join", "interval_join", "IntervalIndex"]

_SIDE = "__aj_side"
_BUCKET = "__aj_bucket"


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def _canonicalize_build(df: pd.DataFrame, by, on, tie_break) -> pd.DataFrame:
    """Sorted build frame, one row per (by, on): the max-tie_break row."""
    cols = [by, on] if by else [on]
    if tie_break is not None:
        df = df.sort_values(cols + [tie_break], kind="mergesort")
    else:
        df = df.sort_values(cols, kind="mergesort")
    df = df.drop_duplicates(subset=cols, keep="last")
    # merge_asof requires global sort on `on` (the `by` grouping is handled
    # internally); mergesort keeps the canonical tie order stable.
    return df.sort_values(on, kind="mergesort").reset_index(drop=True)


def _merge_asof_kernel(
    left: pd.DataFrame, build: pd.DataFrame, *, on, by, direction, allow_exact
) -> pd.DataFrame:
    """One vectorized pandas C-kernel call; restores nothing (output order
    is the left frame's ts order — callers sort/aggregate downstream)."""
    left = left.sort_values(on, kind="mergesort")
    kwargs = dict(on=on, direction=direction, allow_exact_matches=allow_exact)
    if by:
        kwargs["by"] = by
    return pd.merge_asof(left, build, **kwargs)


def asof_join(
    left_ds,
    right_ds,
    *,
    on: str,
    by: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tie_break: str | None = None,
    strategy: str = "broadcast",
    num_partitions: int = 16,
    suffix: str = "_r",
    concurrency=(1, 16),
):
    """For each left row, attach the matching right row's ``right_cols``.

    backward: latest right with right.on <= left.on (the DuckDB
    ``ASOF LEFT JOIN … ON l.k = r.k AND l.ts >= r.ts`` semantics);
    forward / nearest follow pandas ``merge_asof``. Unmatched left rows
    keep NaN/NaT in the attached columns (left join).

    ``strategy="broadcast"``: right side must fit in memory (it is
    collected once and shipped via ``ray.put``). ``"partitioned"``:
    both sides hash-bucketed on ``by`` — requires ``by``.
    """
    if right_cols is None:
        right_cols = [c for c in right_ds.schema().names if c not in (on, by)]
    keep = ([by] if by else []) + [on] + list(right_cols)
    if tie_break is not None and tie_break not in keep:
        keep.append(tie_break)

    # Disambiguate right columns that collide with left names (pandas
    # would suffix unpredictably otherwise).
    left_names = set(left_ds.schema().names)
    ren = {c: (c + suffix if c in left_names else c) for c in right_cols}

    def _prep_build(df: pd.DataFrame) -> pd.DataFrame:
        df = _canonicalize_build(df, by, on, tie_break)
        if tie_break is not None and tie_break not in right_cols:
            df = df.drop(columns=[tie_break])
        return df.rename(columns=ren)

    if strategy == "broadcast":
        bpdf = right_ds.select_columns(keep).to_pandas()
        if bpdf.empty and not set(keep) <= set(bpdf.columns):
            # an empty Dataset loses its schema entirely; rebuild typed
            # columns (join keys must match the left dtypes for merge_asof)
            lsch = left_ds.schema()
            lt = dict(zip(lsch.names, lsch.types))
            bpdf = pd.DataFrame(
                {
                    c: pd.Series(
                        dtype=lt[c].to_pandas_dtype() if c in lt else "float64"
                    )
                    for c in keep
                }
            )
        build = _prep_build(bpdf)
        build_ref = ray.put(build)

        class AsofProbe:
            def __init__(self):
                self.build = ray.get(build_ref)

            def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
                return _merge_asof_kernel(
                    batch,
                    self.build,
                    on=on,
                    by=by,
                    direction=direction,
                    allow_exact=allow_exact_matches,
                )

        return left_ds.map_batches(
            AsofProbe, batch_format="pandas", concurrency=concurrency
        )

    if strategy != "partitioned":
        raise ValueError(f"unknown strategy {strategy!r}")
    if by is None:
        raise ValueError("partitioned asof_join requires a `by` key")

    # Unified Arrow schema for the tagged union (same padding pattern as
    # partitioned_spatial_join): left fields first, then right-only
    # fields, then bucket/side tags. Null-padding demotes pandas int
    # dtypes to float inside the grouped frame, so each side restores
    # its own dtypes after the split below.
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    left_names_l = list(lschema.names)
    fields = [pa.field(n, ltypes[n]) for n in left_names_l]
    fields += [pa.field(n, rtypes[n]) for n in keep if n not in ltypes]
    fields += [pa.field(_BUCKET, pa.int64()), pa.field(_SIDE, pa.int8())]
    unified = pa.schema(fields)

    def _tag(side: int, cols_keep):
        def tag(batch: pa.Table) -> pa.Table:
            batch = batch.select(list(cols_keep))
            n = len(batch)
            kh = pd.util.hash_array(batch[by].to_numpy(zero_copy_only=False))
            bucket = (kh % np.uint64(num_partitions)).astype(np.int64)
            cols = []
            for f in unified:
                if f.name == _BUCKET:
                    cols.append(pa.array(bucket, pa.int64()))
                elif f.name == _SIDE:
                    cols.append(pa.array(np.full(n, side, np.int8)))
                elif f.name in batch.column_names:
                    c = batch[f.name]
                    cols.append(
                        c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
                    )
                else:
                    cols.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(cols, schema=unified)

        return tag

    lt = left_ds.map_batches(_tag(0, left_names_l), batch_format="pyarrow")
    rt = right_ds.select_columns(keep).map_batches(
        _tag(1, keep), batch_format="pyarrow"
    )
    both = lt.union(rt)

    def _restore(df: pd.DataFrame, types: dict) -> pd.DataFrame:
        for c in df.columns:
            t = types.get(c)
            if t is not None and pa.types.is_integer(t) and df[c].dtype.kind == "f":
                df[c] = df[c].astype(t.to_pandas_dtype())
        return df

    out_columns = left_names_l + [ren[c] for c in right_cols]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g[_SIDE] == 0, left_names_l].copy()
        rgc = g.loc[g[_SIDE] == 1, keep].copy()
        if not len(lg):
            return pd.DataFrame({c: pd.Series(dtype="float64") for c in out_columns})
        lg = _restore(lg, ltypes)
        if not len(rgc):
            out = lg
            for c in right_cols:
                out[ren[c]] = np.nan
            return out
        build = _prep_build(_restore(rgc, rtypes))
        return _merge_asof_kernel(
            lg,
            build,
            on=on,
            by=by,
            direction=direction,
            allow_exact=allow_exact_matches,
        )

    return both.groupby(_BUCKET).map_groups(join_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# interval (range) join
# ---------------------------------------------------------------------------


class IntervalIndex:
    """Elementary-segment index over a set of closed intervals [lo, hi].

    Build: split the number line at every distinct endpoint into
    alternating point segments {c} and open segments (c, c') — 2K+1
    segments for K distinct endpoints — and precompute the active
    interval ids per segment as a CSR (offsets + ids). Build cost
    O(K·M) vectorized, done ONCE and broadcast.

    Probe: ``lookup(values)`` maps each value to its segment with one
    ``searchsorted``, then emits all (row, interval) pairs with a
    vectorized multi-range gather — no per-row Python, exact closed-
    interval semantics (v == lo and v == hi both match).
    """

    def __init__(self, lo: np.ndarray, hi: np.ndarray, ids: np.ndarray):
        lo = np.asarray(lo, dtype=np.float64)
        hi = np.asarray(hi, dtype=np.float64)
        self.interval_ids = np.asarray(ids)
        if np.any(hi < lo):
            raise ValueError("interval hi < lo")
        coords = np.unique(np.concatenate([lo, hi]))
        self.coords = coords
        K = len(coords)
        # segment s: even s=2j → open segment between coords[j-1] and
        # coords[j] (s=0 is (-inf, coords[0])); odd s=2j+1 → the point
        # segment {coords[j]}. Representative probe values per segment:
        reps = np.empty(2 * K + 1, dtype=np.float64)
        reps[1::2] = coords  # point segments
        if K:
            reps[0] = coords[0] - 1.0
            reps[2 * K] = coords[-1] + 1.0
            if K > 1:
                reps[2:-1:2] = (coords[:-1] + coords[1:]) / 2.0
        # active mask per (segment, interval): O(S·M) once at build.
        if not K:
            reps = np.zeros(1, dtype=np.float64)
        m = (lo[None, :] <= reps[:, None]) & (reps[:, None] <= hi[None, :])
        counts = m.sum(axis=1)
        self.offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        self.csr_ids = np.nonzero(m)[1].astype(np.int64)

    def segment_of(self, v: np.ndarray) -> np.ndarray:
        if not len(self.coords):
            return np.zeros(len(v), dtype=np.int64)
        j = np.searchsorted(self.coords, v, side="left")
        jc = np.minimum(j, len(self.coords) - 1)
        is_point = (j < len(self.coords)) & (self.coords[jc] == v)
        return 2 * j + is_point.astype(np.int64)

    def lookup(self, v: np.ndarray):
        """→ (row_idx, interval_pos): all matching pairs, vectorized."""
        v = np.asarray(v, dtype=np.float64)
        seg = self.segment_of(v)
        starts = self.offsets[seg]
        cnts = self.offsets[seg + 1] - starts
        total = int(cnts.sum())
        row_idx = np.repeat(np.arange(len(v)), cnts)
        if total == 0:
            return row_idx, np.empty(0, dtype=np.int64)
        cum = np.concatenate([[0], np.cumsum(cnts[:-1])])
        pos = np.arange(total) - np.repeat(cum, cnts)
        return row_idx, self.csr_ids[np.repeat(starts, cnts) + pos]


def _interval_frame(intervals, lo_col, hi_col, id_col) -> pd.DataFrame:
    if isinstance(intervals, pd.DataFrame):
        return intervals
    if isinstance(intervals, (list, tuple)):
        df = pd.DataFrame(intervals, columns=[id_col, lo_col, hi_col])
        if df.empty:  # keep typed columns so the output schema is stable
            df = df.astype({id_col: "int64", lo_col: "float64", hi_col: "float64"})
        return df
    return intervals.to_pandas()  # a Dataset


def interval_join(
    probe_ds,
    intervals,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    id_col: str = "band_id",
    out_cols: list[str] | None = None,
    strategy: str = "broadcast",
    num_partitions: int = 16,
    equi_depth: bool = False,
    concurrency=(1, 16),
):
    """Inner-join probe rows to every interval with lo <= value <= hi.

    Output: probe ``out_cols`` (default: all probe columns) + ``id_col``.
    ``intervals`` may be a small pandas frame / list of (id, lo, hi)
    tuples (broadcast) or a Dataset (collected when broadcast; domain-
    chunked when partitioned).

    ``equi_depth=True`` (partitioned only): chunk edges are picked from a
    one-pass streaming histogram of the PROBE values so each chunk holds
    ~equal probe mass — the explicit skew handling for value
    distributions where uniform-width chunks would send most of the
    probe side to one reducer (zipf timestamps, price clusters, …).
    """
    idf = _interval_frame(intervals, lo_col, hi_col, id_col)
    if out_cols is None:
        out_cols = list(probe_ds.schema().names)

    if not len(idf):  # no intervals → empty result with a stable schema
        id_type = pa.Array.from_pandas(idf[id_col]).type

        def none(batch: pa.Table) -> pa.Table:
            return batch.select(out_cols).slice(0, 0).append_column(
                id_col, pa.array([], id_type)
            )

        return probe_ds.map_batches(none, batch_format="pyarrow")

    if strategy == "broadcast":
        index = IntervalIndex(
            idf[lo_col].to_numpy(), idf[hi_col].to_numpy(), idf[id_col].to_numpy()
        )
        idx_ref = ray.put(index)

        class IntervalProbe:
            def __init__(self):
                self.index = ray.get(idx_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                v = batch[value_col].to_numpy(zero_copy_only=False)
                rows, ipos = self.index.lookup(v)
                out = batch.select(out_cols).take(rows)
                return out.append_column(
                    id_col, pa.array(self.index.interval_ids[ipos])
                )

        return probe_ds.map_batches(
            IntervalProbe, batch_format="pyarrow", concurrency=concurrency
        )

    if strategy != "partitioned":
        raise ValueError(f"unknown strategy {strategy!r}")

    # Domain-chunk the value axis; replicate each interval into every
    # chunk it overlaps (1-D analogue of cell replication in the
    # partitioned spatial join). Chunk edges from the interval span
    # (uniform width), or from an equi-depth histogram of the probe.
    lo = idf[lo_col].to_numpy(dtype=np.float64)
    hi = idf[hi_col].to_numpy(dtype=np.float64)
    span_lo, span_hi = float(lo.min()), float(hi.max())

    if equi_depth:
        # one streaming pass: fine histogram of in-span probe values →
        # cut points at every 1/num_partitions of the cumulative mass
        fine = 64 * num_partitions
        fine_edges = np.linspace(span_lo, span_hi, fine + 1)

        def hcount(batch: pa.Table) -> pa.Table:
            v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            cnt, _ = np.histogram(v[(v >= span_lo) & (v <= span_hi)], bins=fine_edges)
            return pa.table({"h": pa.array([cnt.astype(np.int64).tobytes()], pa.binary())})

        tot = np.zeros(fine, dtype=np.int64)
        for b in probe_ds.map_batches(
            hcount, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow"):
            for hb in b["h"].to_pylist():
                tot += np.frombuffer(hb, dtype=np.int64)
        cum = np.cumsum(tot)
        cuts = [
            float(fine_edges[int(np.searchsorted(cum, cum[-1] * k / num_partitions))])
            for k in range(1, num_partitions)
        ]
        inner = np.unique(np.asarray(cuts, dtype=np.float64))
        edges = np.concatenate([[span_lo], inner, [span_hi]])
    else:
        edges = np.linspace(span_lo, span_hi, num_partitions + 1)
    n_chunks = len(edges) - 1

    def chunk_of(v: np.ndarray) -> np.ndarray:
        c = np.searchsorted(edges, v, side="right") - 1
        return np.clip(c, 0, n_chunks - 1).astype(np.int64)

    # interval side: replicate per overlapped chunk (driver-side: the
    # interval table is rows × chunks and tiny relative to the probe).
    c0 = chunk_of(lo)
    c1 = chunk_of(hi)
    reps = (c1 - c0 + 1).astype(np.int64)
    iidx = np.repeat(np.arange(len(idf)), reps)
    chunks = np.concatenate([np.arange(a, b + 1) for a, b in zip(c0, c1)])
    rep_df = idf.iloc[iidx].reset_index(drop=True)
    rep_df[_BUCKET] = chunks
    rep_df[_SIDE] = np.int8(1)

    def tag_probe(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[list(out_cols)].copy()
        v = batch[value_col].to_numpy(dtype=np.float64)
        batch[_BUCKET] = chunk_of(v)
        # rows outside the interval span can never match; drop them at
        # the map stage so they never enter the shuffle.
        inside = (v >= span_lo) & (v <= span_hi)
        batch[_SIDE] = np.int8(0)
        return batch[inside]

    import ray.data as rd

    pt = probe_ds.map_batches(tag_probe, batch_format="pandas")
    it = rd.from_pandas(rep_df)
    both = pt.union(it)

    def join_chunk(g: pd.DataFrame) -> pd.DataFrame:
        pg = g[g[_SIDE] == 0]
        ig = g[g[_SIDE] == 1]
        if not len(pg) or not len(ig):
            return pd.DataFrame()
        index = IntervalIndex(
            ig[lo_col].to_numpy(), ig[hi_col].to_numpy(), ig[id_col].to_numpy()
        )
        rows, ipos = index.lookup(pg[value_col].to_numpy(dtype=np.float64))
        out = pg.iloc[rows][list(out_cols)].reset_index(drop=True)
        out[id_col] = index.interval_ids[ipos]
        return out

    return both.groupby(_BUCKET).map_groups(join_chunk, batch_format="pandas")
