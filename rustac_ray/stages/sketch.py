"""Mergeable sketches + distributed order statistics.

Two operators a 100-TB pipeline needs that Ray Data's built-in aggregates
don't give:

- ``approx_distinct``: per-group HyperLogLog. Each batch folds its rows
  into ONE 2^p-byte register row per group (the combiner); the shuffle
  then moves O(groups × blocks) sketch rows — never values — and merge is
  an elementwise ``np.maximum``. Standard HLL (Flajolet et al. 2007)
  with a 64-bit splitmix64 value hash, so no large-range correction is
  needed; the small-range linear-counting correction applies as usual.

- ``exact_quantiles``: EXACT order statistics (DuckDB ``quantile_disc``
  semantics: 0-based rank ceil(q·n)−1) without any sort shuffle. A
  histogram-bisection loop: each pass streams the dataset once through a
  vectorized ``np.histogram`` map_batches fold (tiny per-block partial:
  B int64 counts), narrows each target rank to one bin, and recurses
  until the candidate range holds ≤ ``max_collect`` values — those are
  then collected and the rank read off with ``np.partition``. Total work:
  O(passes) streaming scans, driver state O(bins); converges in ~2-3
  passes for any real distribution (each pass shrinks the range ~B×).

Both are pure functions of the input (no RNG), hence oracle-checkable.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "approx_distinct",
    "exact_quantiles",
    "approx_quantiles",
    "grouped_approx_quantiles",
    "MPQuantileSketch",
    "histogram",
    "profile_columns",
    "splitmix64",
    "hll_estimate",
    "token_heavy_hitters",
]


# ------------------------------------------------------------------- hll --


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: int64/uint64 → well-mixed uint64."""
    z = x.astype(np.uint64, copy=False) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(registers: np.ndarray) -> float:
    """Bias-corrected HLL estimate from one uint8 register array."""
    m = len(registers)
    est = _alpha(m) * m * m / np.sum(np.exp2(-registers.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            return m * math.log(m / zeros)
    return float(est)


def _hll_rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho): bucket = top p bits; rho = 1 + leading zeros of the
    remaining 64−p bits. Vectorized via the float64 exponent (exact for
    integers < 2^53, i.e. any p ≥ 12)."""
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - p)) - 1)
    # bit_length(rest) via frexp exponent; rest == 0 → full rho
    bl = np.frexp(rest.astype(np.float64))[1]  # 0 for rest==0
    rho = ((64 - p) - bl + 1).astype(np.uint8)
    return bucket, rho


def approx_distinct(ds, group_col: str, value_col: str, *, p: int = 12):
    """→ one row per group: (group_col, approx_distinct: int64).

    Values must be integers (use a stable row id / fingerprint column for
    strings — e.g. ``text.Fingerprint``). Relative error ≈ 1.04/√(2^p)
    (~1.6% at the default p=12, 4 KiB per group sketch).
    """
    if not 12 <= p <= 18:
        raise ValueError("p must be in [12, 18]")
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        groups = batch[group_col].to_numpy(zero_copy_only=False)
        h = splitmix64(vals)
        bucket, rho = _hll_rho(h, p)
        uniq, inv = np.unique(groups, return_inverse=True)
        regs = np.zeros((len(uniq), m), dtype=np.uint8)
        np.maximum.at(regs, (inv, bucket), rho)
        return pa.table(
            {
                group_col: pa.array(uniq),
                "_hll": pa.array([r.tobytes() for r in regs], pa.binary()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.frombuffer(b"".join(g["_hll"]), dtype=np.uint8).reshape(
            len(g), m
        )
        merged = regs.max(axis=0)
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "approx_distinct": np.int64(round(hll_estimate(merged))),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(group_col).map_groups(merge, batch_format="pandas")


# ------------------------------------------------- exact order statistics --


def _disc_ranks(n: int, qs: list[float]) -> list[int]:
    """DuckDB/ANSI percentile_disc rank rule: 0-based ceil(q·n)−1."""
    return [min(max(math.ceil(q * n) - 1, 0), n - 1) for q in qs]


def exact_quantiles(
    ds,
    col: str,
    qs: list[float],
    *,
    bins: int = 4096,
    max_collect: int = 200_000,
    max_passes: int = 8,
):
    """→ pandas DataFrame (q, value): exact ``quantile_disc`` per q.

    Driver-coordinated histogram bisection (see module docstring). The
    dataset is streamed once per pass; no sort, no shuffle, no
    materialization beyond B-counter partials and one final ≤max_collect
    value gather.
    """
    from ray.data.aggregate import Count, Max, Min

    stats = ds.aggregate(Count(), Min(col), Max(col))
    n = int(stats["count()"])
    lo, hi = float(stats[f"min({col})"]), float(stats[f"max({col})"])
    if n == 0:
        return pd.DataFrame({"q": qs, "value": np.nan})
    ranks = _disc_ranks(n, qs)
    if lo == hi:  # constant column — every quantile is that value
        return pd.DataFrame({"q": qs, "value": [lo] * len(qs)})

    # state per target rank: (range_lo, range_hi, global_rank)
    # ranges may coincide for nearby qs — deduped each pass.
    targets = [(lo, hi, r) for r in ranks]

    def hist_pass(ranges: list[tuple[float, float]]):
        """One streaming scan: per-block histograms for every range."""
        edges = [np.linspace(a, b, bins + 1) for a, b in ranges]

        def partial(batch: pa.Table) -> pa.Table:
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            rows = []
            for i, (a, b) in enumerate(ranges):
                inr = v[(v >= a) & (v <= b)]
                cnt, _ = np.histogram(inr, bins=edges[i])
                below = int(np.count_nonzero(v < a))
                rows.append((i, below, cnt.astype(np.int64)))
            return pa.table(
                {
                    "ri": pa.array([r[0] for r in rows], pa.int64()),
                    "below": pa.array([r[1] for r in rows], pa.int64()),
                    "cnt": pa.array(
                        [r[2].tobytes() for r in rows], pa.binary()
                    ),
                }
            )

        agg = {}
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ):
            ris = b["ri"].to_pylist()
            belows = b["below"].to_pylist()
            cnts = b["cnt"].to_pylist()
            for ri, below, cb in zip(ris, belows, cnts):
                c = np.frombuffer(cb, dtype=np.int64)
                if ri in agg:
                    agg[ri] = (agg[ri][0] + below, agg[ri][1] + c)
                else:
                    agg[ri] = (below, c.copy())
        return agg, edges

    for _ in range(max_passes if n > max_collect else 0):
        # dedupe identical ranges to scan each only once
        uniq_ranges = sorted({(a, b) for a, b, _ in targets})
        agg, edges = hist_pass(uniq_ranges)
        range_idx = {r: i for i, r in enumerate(uniq_ranges)}
        total_in_ranges = sum(int(agg[i][1].sum()) for i in agg)
        if total_in_ranges <= max_collect:
            break
        new_targets = []
        shrunk = False
        for a, b, r in targets:
            ri = range_idx[(a, b)]
            below, cnt = agg[ri]
            # rank within this range (global rank r minus rows below it)
            rr = r - below
            cum = np.cumsum(cnt)
            j = int(np.searchsorted(cum, rr + 1))
            j = min(j, bins - 1)
            na, nb = edges[ri][j], edges[ri][j + 1]
            prev = int(cum[j - 1]) if j else 0
            if nb <= na or (nb - na) < 1e-308:
                new_targets.append((a, b, r))
                continue
            shrunk = True
            # global rows below the new range = below + rows in bins < j;
            # bin edges are half-open except the last, but v==na rows in
            # earlier bins are impossible (they'd land in bin j-1 only if
            # < na) — np.histogram puts v==na into bin j.
            new_targets.append((na, nb, r))
        if not shrunk:
            break
        targets = new_targets

    # final: ONE scan collects every value inside the surviving ranges
    # (plus, per range, the exact count of rows strictly below it — the
    # same per-block fold, so no extra pass per quantile).
    uniq_ranges = sorted({(a, b) for a, b, _ in targets})
    range_idx = {r: i for i, r in enumerate(uniq_ranges)}

    def gather(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = np.zeros(len(v), dtype=bool)
        belows = []
        for a, b in uniq_ranges:
            keep |= (v >= a) & (v <= b)
            belows.append(int(np.count_nonzero(v < a)))
        kept = v[keep]
        return pa.table(
            {
                "vals": pa.array([kept.tobytes()], pa.binary()),
                "below": pa.array(
                    [np.asarray(belows, np.int64).tobytes()], pa.binary()
                ),
            }
        )

    chunks, below_tot = [], np.zeros(len(uniq_ranges), dtype=np.int64)
    for b in ds.map_batches(
        gather, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow"):
        for vb, bb in zip(b["vals"].to_pylist(), b["below"].to_pylist()):
            chunks.append(np.frombuffer(vb, dtype=np.float64))
            below_tot += np.frombuffer(bb, dtype=np.int64)
    vals = np.concatenate(chunks) if chunks else np.empty(0)

    out = []
    for a, b, r in targets:
        below = int(below_tot[range_idx[(a, b)]])
        inr = vals[(vals >= a) & (vals <= b)]
        rr = r - below
        out.append(float(np.partition(inr, rr)[rr]))
    return pd.DataFrame({"q": qs, "value": out})


# --------------------------------------------------------- heavy hitters --


def token_heavy_hitters(
    ds,
    col: str = "text",
    k: int = 10,
    *,
    mg_capacity: int | None = None,
    combine: str = "driver",
    concurrency: int | None = None,
):
    """Exact global top-k most frequent whitespace tokens of a text column.

    Combiner-first: each batch tokenizes (``str.split`` + ``explode``,
    C kernels) and pre-aggregates to its LOCAL (token, count) pairs, so
    the ``groupby(token)`` shuffle moves at most vocab × blocks tiny rows
    — never the corpus. The grouped sums are then pruned per block to a
    local top-k and merged once (the partial-top-k combiner), exactly the
    SQL ``GROUP BY token ORDER BY cnt DESC, token LIMIT k``.

    ``mg_capacity``: the unbounded-vocab scale path. Each batch keeps only
    a Misra-Gries summary of ``mg_capacity`` candidates (counts decremented
    by the (capacity+1)-th value — the vectorized MG batch summary).
    Merged MG counts underestimate true counts by at most
    total_tokens / mg_capacity, so the candidate set provably contains
    every token whose true count exceeds that bound; a second EXACT
    recount pass restricted to the candidates (broadcast ``isin``) makes
    the final top-k exact whenever the k-th count clears the MG bound —
    asserted against the exact path in tests. Use it when the vocabulary
    itself is too large to shuffle (e.g. URL or hash tokens at 100 TB).
    """
    import ray.data as rd

    from ray.data.aggregate import Sum

    from rustac_ray.query import sorted_topn

    def _batch_counts(batch: pa.Table) -> tuple[pa.Array, pa.Array]:
        # Arrow tokenizer + value_counts (C kernels, ~10x pandas explode);
        # drop the empty tokens Arrow emits at leading/trailing whitespace
        flat = pc.list_flatten(pc.utf8_split_whitespace(batch[col]))
        vc = pc.value_counts(flat.combine_chunks())
        tok, cnt = vc.field("values"), pc.cast(vc.field("counts"), pa.int64())
        nonempty = pc.greater(pc.utf8_length(tok), 0)
        return tok.filter(nonempty), cnt.filter(nonempty)

    def partial_counts(batch: pa.Table) -> pa.Table:
        tok, cnt = _batch_counts(batch)
        out = pa.table({"token": tok, "cnt": cnt})
        if mg_capacity is not None and len(out) > mg_capacity:
            # Misra-Gries decrement: subtract the (c+1)-th largest count,
            # drop non-positive — the classic summary, one vectorized op
            out = out.sort_by([("cnt", "descending"), ("token", "ascending")])
            dec = out["cnt"][mg_capacity].as_py()
            kept = out.slice(0, mg_capacity)
            new_cnt = pc.subtract(kept["cnt"], dec)
            pos = pc.greater(new_cnt, 0)
            out = pa.table(
                {"token": kept["token"].filter(pos), "cnt": new_cnt.filter(pos)}
            )
        return out

    def _merge_partials(partials_ds, top: int):
        """Merge per-block (token, cnt) partials: distributed compaction
        rounds (stages/fold.py — each task groupby-sums its shard of the
        stream, repeated while rows shrink) bound the DRIVER's concat to
        ~max(fanin, distinct vocab) rows instead of vocab × blocks (r03
        verdict #8), then one pandas groupby finishes exactly. For token
        spaces that exceed driver memory even compacted (URLs/hashes),
        use ``combine="shuffle"`` or ``mg_capacity``."""
        from .fold import tree_fold

        def compact_block(t: pa.Table) -> pa.Table:
            g = (
                t.to_pandas()
                .groupby("token", sort=False)["cnt"]
                .sum()
                .reset_index()
            )
            return pa.table(
                {"token": pa.array(g["token"].to_numpy(object), pa.string()),
                 "cnt": pa.array(g["cnt"].to_numpy(np.int64), pa.int64())}
            )

        folded = tree_fold(
            partials_ds.map_batches(
                lambda b: b.select(["token", "cnt"]), batch_format="pyarrow"
            ),
            compact_block,
            fanin=200_000,
        )
        parts = [
            b
            for b in folded.iter_batches(batch_format="pyarrow")
            if len(b)
        ]
        if not parts:
            return rd.from_arrow(
                pa.table({"token": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
            )
        df = pa.concat_tables(parts).to_pandas()
        merged = df.groupby("token", sort=False)["cnt"].sum().reset_index()
        merged = merged.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(top)
        merged["cnt"] = merged["cnt"].astype("int64")
        return rd.from_pandas(merged.reset_index(drop=True))

    partials = ds.map_batches(partial_counts, batch_format="pyarrow")

    if mg_capacity is None:
        if combine == "shuffle":  # giant-vocab path: distributed merge
            grouped = partials.groupby("token").aggregate(
                Sum("cnt", alias_name="cnt")
            )
            return sorted_topn(grouped, [("cnt", True), ("token", False)], k)
        return _merge_partials(partials, k)

    # unbounded-vocab path: MG candidates -> exact recount restricted to them
    cand = set(_merge_partials(partials, max(4 * k, 64)).to_pandas()["token"])

    cand_arr = pa.array(sorted(cand), pa.string())

    def recount(batch: pa.Table) -> pa.Table:
        tok, cnt = _batch_counts(batch)
        m = pc.is_in(tok, value_set=cand_arr)
        return pa.table({"token": tok.filter(m), "cnt": cnt.filter(m)})

    return _merge_partials(ds.map_batches(recount, batch_format="pyarrow"), k)


def profile_columns(ds, cols: list[str]):
    """→ (column, n_rows, n_null, min_d, max_d): one-pass numeric column
    profile — the schema-validation / data-quality summary every ingest
    pipeline runs before training.

    Classic combiner shape: each batch emits one 5-tuple row per column
    (state size = len(cols), independent of data), the driver folds them
    with min/max/sum — no shuffle, one scan for all columns together
    (vs one query per column). min/max are cast to float64 so the output
    schema is column-uniform; counts are exact int64.

    NULL semantics match the SQL twin exactly: ``n_null`` counts ONLY
    true Arrow nulls (``count(*) - count(x)``), never NaN values in a
    float column; NaN/±inf are merely excluded from min/max (r02 advice).
    """
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        out = {"column": [], "n_rows": [], "n_null": [], "min_d": [], "max_d": []}
        for c in cols:
            arr = batch[c]
            vals = arr.to_numpy(zero_copy_only=False).astype(np.float64)
            if arr.null_count:
                vals = np.where(
                    arr.is_valid().to_numpy(zero_copy_only=False), vals, np.nan
                )
            ok = vals[np.isfinite(vals)]
            out["column"].append(c)
            out["n_rows"].append(len(arr))
            out["n_null"].append(int(arr.null_count))
            out["min_d"].append(float(ok.min()) if len(ok) else np.nan)
            out["max_d"].append(float(ok.max()) if len(ok) else np.nan)
        return pa.table(
            {
                "column": pa.array(out["column"], pa.string()),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
                "n_null": pa.array(out["n_null"], pa.int64()),
                "min_d": pa.array(out["min_d"], pa.float64()),
                "max_d": pa.array(out["max_d"], pa.float64()),
            }
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if len(b)
    ]
    if not parts:
        return rd.from_arrow(
            pa.table(
                {
                    "column": pa.array([], pa.string()),
                    "n_rows": pa.array([], pa.int64()),
                    "n_null": pa.array([], pa.int64()),
                    "min_d": pa.array([], pa.float64()),
                    "max_d": pa.array([], pa.float64()),
                }
            )
        )
    df = pd.concat(parts, ignore_index=True)
    g = df.groupby("column", sort=True)
    merged = pd.DataFrame(
        {
            "column": sorted(cols),
            "n_rows": g["n_rows"].sum().reindex(sorted(cols)).to_numpy().astype("int64"),
            "n_null": g["n_null"].sum().reindex(sorted(cols)).to_numpy().astype("int64"),
            "min_d": g["min_d"].min().reindex(sorted(cols)).to_numpy(),
            "max_d": g["max_d"].max().reindex(sorted(cols)).to_numpy(),
        }
    )
    return rd.from_pandas(merged)


def histogram(ds, col: str, lo: float, hi: float, nbins: int):
    """→ (bin, n): fixed-width histogram of a numeric column — one
    bincount per batch (constant combiner state: ≤ nbins rows), driver
    fold. Values outside [lo, hi) clamp into the edge bins, exactly the
    ``least(greatest(floor((x-lo)/width),0),nbins-1)`` a SQL twin writes,
    so engine and oracle share every IEEE operation. Non-finite values
    (NULL→NaN, NaN, ±inf from a float column) are DROPPED before binning
    — a SQL twin's ``WHERE isfinite(x)`` — instead of crashing bincount
    with a cast-from-NaN bin (r02 advice).
    """
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    width = (hi - lo) / nbins

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v)]
        b = np.minimum(
            np.maximum(np.floor((v - lo) / width), 0.0), float(nbins - 1)
        ).astype(np.int64)
        cnt = np.bincount(b, minlength=nbins)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"bin": pa.array(nz, pa.int64()), "n": pa.array(cnt[nz], pa.int64())}
        )

    parts = [
        b.to_pandas()
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        if len(b)
    ]
    if not parts:
        return rd.from_arrow(
            pa.table({"bin": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
        )
    merged = (
        pd.concat(parts, ignore_index=True).groupby("bin", sort=True)["n"].sum()
    )
    return rd.from_pandas(
        pd.DataFrame({"bin": merged.index.to_numpy().astype("int64"),
                      "n": merged.to_numpy().astype("int64")})
    )


# ------------------------------------------------- mergeable quantiles --


class MPQuantileSketch:
    """Deterministic mergeable quantile summary (Munro-Paterson 1980 /
    MRL-style compactors): per-level sorted buffers of capacity ``cap``;
    a full level sorts and keeps every other element (fixed even offset —
    fully deterministic, no RNG), promoting survivors to the next level
    with doubled weight.

    One sketch holds ≤ cap × levels values where levels ≈ log2(n / cap),
    so a per-block partial is a few KB regardless of block size, and
    merging is concatenate-then-compact — the classic one-streaming-pass
    alternative to :func:`exact_quantiles`' driver-coordinated multi-pass
    bisection (use this when the input can only be read once, e.g. a
    transform stream that is not re-runnable; use exact_quantiles when
    re-scanning is cheap and exactness matters).

    Deterministic-compaction rank-error bound: each compaction at level i
    perturbs any rank by ≤ 2^i, and level i compacts ≤ n / (cap · 2^i)
    times, so total error ≤ levels · n / cap — estimates carry a
    worst-case rank error of ``levels / cap`` as a fraction of n (the
    pytest asserts it). Merge order shifts WHICH elements survive but
    never the bound.
    """

    def __init__(self, cap: int = 1024):
        if cap < 2 or cap % 2:
            raise ValueError("cap must be even and >= 2")
        self.cap = cap
        self.levels: list[np.ndarray] = [np.zeros(0, np.float64)]
        self.n = 0

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.cap:
                buf = np.sort(self.levels[i], kind="stable")
                # keep the even offset: floor-biased, deterministic
                promoted = buf[0::2]
                self.levels[i] = np.zeros(0, np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.zeros(0, np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    def add(self, values: np.ndarray) -> "MPQuantileSketch":
        v = np.asarray(values, np.float64)
        v = v[np.isfinite(v)]
        if len(v) == 0:
            return self
        self.n += len(v)
        # feed in cap-sized slices so level 0 never balloons
        for s in range(0, len(v), self.cap):
            self.levels[0] = np.concatenate([self.levels[0], v[s : s + self.cap]])
            self._compact()
        return self

    def merge(self, other: "MPQuantileSketch") -> "MPQuantileSketch":
        if other.cap != self.cap:
            raise ValueError("cap mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, np.float64))
        for i, buf in enumerate(other.levels):
            if len(buf):
                self.levels[i] = np.concatenate([self.levels[i], buf])
        self.n += other.n
        self._compact()
        return self

    def error_bound(self) -> float:
        """Worst-case rank error as a fraction of n."""
        return len(self.levels) / self.cap

    def quantiles(self, qs: list[float]) -> np.ndarray:
        vals = np.concatenate([b for b in self.levels if len(b)] or [np.zeros(0)])
        if len(vals) == 0:
            return np.full(len(qs), np.nan)
        w = np.concatenate(
            [
                np.full(len(b), 1 << i, np.int64)
                for i, b in enumerate(self.levels)
                if len(b)
            ]
        )
        order = np.argsort(vals, kind="stable")
        vals, w = vals[order], w[order]
        cum = np.cumsum(w)
        total = cum[-1]
        out = np.empty(len(qs))
        for j, q in enumerate(qs):
            target = q * (total - 1)
            out[j] = vals[np.searchsorted(cum, target, side="right")]
        return out

    # --- serialization (one row per sketch, for map_batches partials) ---

    def to_blob(self) -> bytes:
        import io

        bio = io.BytesIO()
        np.savez(
            bio,
            n=np.int64(self.n),
            cap=np.int64(self.cap),
            **{f"l{i}": b for i, b in enumerate(self.levels)},
        )
        return bio.getvalue()

    @classmethod
    def from_blob(cls, blob: bytes) -> "MPQuantileSketch":
        import io

        z = np.load(io.BytesIO(blob))
        sk = cls(cap=int(z["cap"]))
        sk.n = int(z["n"])
        nlev = sum(1 for k in z.files if k.startswith("l"))
        sk.levels = [z[f"l{i}"].astype(np.float64) for i in range(nlev)]
        return sk


def approx_quantiles(ds, col: str, qs: list[float], *, cap: int = 1024):
    """→ pandas DataFrame (q, value, error_bound): one-pass mergeable
    approximate quantiles.

    Scale shape: each block folds to ONE serialized sketch row (a few KB,
    block-size-independent); the driver merges the partial stream —
    O(blocks × sketch size), no shuffle, no second pass, no value gather.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        sk = MPQuantileSketch(cap=cap)
        sk.add(batch[col].to_numpy())
        return pd.DataFrame({"blob": [sk.to_blob()]})

    merged = MPQuantileSketch(cap=cap)
    for b in ds.select_columns([col]).map_batches(
        partial, batch_format="pandas"
    ).iter_batches(batch_format="pandas"):
        for blob in b["blob"]:
            merged.merge(MPQuantileSketch.from_blob(blob))
    vals = merged.quantiles(qs)
    return pd.DataFrame(
        {"q": qs, "value": vals, "error_bound": merged.error_bound()}
    )


def grouped_approx_quantiles(
    ds,
    key: str,
    col: str,
    qs: list[float],
    *,
    cap: int = 512,
    combine: str = "auto",
    max_driver_keys: int = 100_000,
):
    """→ pandas DataFrame (key, q, value, error_bound): per-key one-pass
    mergeable quantiles (per-collection latency percentiles and friends).

    Scale shape: the partial is one serialized sketch per (block, key) —
    KB-sized, value-count-independent — so the combine stream is bounded
    by keys × blocks sketch rows, never the data. combine="driver"
    merges that stream on the driver (the repo's measured driver-merge
    rule for small keyed partials); combine="shuffle" runs ONE
    ``groupby(key).map_groups`` whose groups are just the per-block
    blobs (tiny by construction, no skewed-key hazard). "auto" stays on
    the driver path under an explicit ``max_driver_keys`` guard that
    names the shuffle swap instead of silently ballooning.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks, blobs = [], []
        for k, g in df.groupby(key, sort=False):
            ks.append(k)
            blobs.append(MPQuantileSketch(cap=cap).add(g[col].to_numpy()).to_blob())
        return pd.DataFrame({key: ks, "blob": blobs})

    parts = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pandas"
    )

    def finish(merged: dict) -> pd.DataFrame:
        rows = []
        for k in sorted(merged):
            sk = merged[k]
            for q, v in zip(qs, sk.quantiles(qs)):
                rows.append((k, q, v, sk.error_bound()))
        return pd.DataFrame(rows, columns=[key, "q", "value", "error_bound"])

    if combine == "auto":
        combine = "driver"  # the max_driver_keys guard below enforces the cap

    if combine == "shuffle":

        def merge_group(g: pd.DataFrame) -> pd.DataFrame:
            sk = MPQuantileSketch(cap=cap)
            for blob in g["blob"]:
                sk.merge(MPQuantileSketch.from_blob(blob))
            return finish({g[key].iloc[0]: sk})

        out = parts.groupby(key).map_groups(merge_group, batch_format="pandas")
        return out.to_pandas().sort_values([key, "q"], ignore_index=True)

    merged: dict = {}
    for b in parts.iter_batches(batch_format="pandas"):
        for k, blob in zip(b[key], b["blob"]):
            sk = merged.get(k)
            other = MPQuantileSketch.from_blob(blob)
            if sk is None:
                merged[k] = other
            else:
                sk.merge(other)
        if len(merged) > max_driver_keys:
            raise ValueError(
                f"grouped_approx_quantiles: >{max_driver_keys} distinct keys "
                "on the driver path; use combine='shuffle'"
            )
    return finish(merged)
