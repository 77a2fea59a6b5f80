"""Deterministic sampling operators for training-data pipelines.

All sampling here is HASH-based, not RNG-based: whether a row is kept is
a pure function of its key — so a sample is (a) reproducible across runs
and cluster sizes, (b) consistent across tables (joining two tables each
hash-sampled on the same key keeps matching rows), and (c) resumable
(re-running a failed partition re-selects the same rows). This is the
property training-data pipelines actually need; ``ds.random_sample``
gives none of it.

The hash is the Knuth multiplicative congruential step on the key
(mod 2^32) — deliberately simple enough to express in ANSI SQL, so every
sampler here has an exact DuckDB oracle twin:

    keep(key)  ⇔  (key * 2654435761 + salt) % 4294967296  <  rate * 2^32

Keys must be NON-NEGATIVE integers (row ids): numpy uint64 wrap-around
and SQL signed ``%`` disagree on negative values.

Scale shape: one embarrassingly-parallel ``map_batches`` filter — no
shuffle, no driver state, vectorized uint64 numpy throughout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "hash_sample",
    "stratified_sample",
    "grouped_sample_n",
    "weighted_sample_n",
    "KNUTH",
    "MOD32",
    "hash_bucket",
]

KNUTH = 2654435761  # Knuth's multiplicative constant (2^32 / phi)
MOD32 = 1 << 32


def hash_bucket(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """uint64 → uint64 in [0, 2^32): the sampling hash, vectorized."""
    k = keys.astype(np.uint64, copy=False)
    return (k * np.uint64(KNUTH) + np.uint64(salt)) % np.uint64(MOD32)


def _threshold(rate: float) -> np.uint64:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return np.uint64(int(rate * MOD32))


def hash_sample(ds, key_col: str, rate: float, *, salt: int = 0):
    """Keep each row iff hash(key) falls under ``rate`` of the hash space.

    Deterministic, shuffle-free, and consistent across any datasets
    sampled on the same key (the basis for multi-table sampling).
    """
    thr = _threshold(rate)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(hash_bucket(keys, salt) < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds,
    key_col: str,
    stratum_col: str,
    rates: dict,
    *,
    default_rate: float = 0.0,
    salt: int = 0,
):
    """Per-stratum hash sampling: stratum → keep rate (e.g. downsample
    dominant languages, keep all of rare ones). Unlisted strata get
    ``default_rate``. Same determinism/consistency guarantees as
    ``hash_sample``; still one shuffle-free vectorized filter — the
    stratum→threshold map is a tiny dict shipped in the closure.
    """
    thr_map = {s: _threshold(r) for s, r in rates.items()}
    default_thr = _threshold(default_rate)

    def keep(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        strata = batch[stratum_col].to_numpy(zero_copy_only=False)
        # vectorized dict lookup: factorize strata once per batch, map the
        # few uniques through the dict, gather per row
        uniq, inv = np.unique(strata, return_inverse=True)
        thr_u = np.array(
            [thr_map.get(s, default_thr) for s in uniq], dtype=np.uint64
        )
        return batch.filter(pa.array(hash_bucket(keys, salt) < thr_u[inv]))

    return ds.map_batches(keep, batch_format="pyarrow")


def grouped_sample_n(ds, stratum_col: str, key_col: str, n: int, *, salt: int = 0):
    """Exactly-n-per-stratum deterministic sample (n or all rows if the
    stratum is smaller): rows ranked by the sampling hash of their key
    within each stratum, n smallest kept — i.e. a uniform random sample
    under a fixed, reproducible permutation. Built on ``grouped_topk``,
    so each block is pruned to its local per-stratum n before the one
    groupby shuffle. SQL twin: ``row_number() OVER (PARTITION BY stratum
    ORDER BY (key*KNUTH+salt)%2^32, key) <= n``.
    """
    from .aggregates import grouped_topk

    def add_h(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "__h", pa.array(hash_bucket(keys, salt).astype(np.int64))
        )

    withh = ds.map_batches(add_h, batch_format="pyarrow")
    out = grouped_topk(
        withh, stratum_col, "__h", n, descending=False, tie_cols=[key_col]
    )
    return out.map_batches(
        lambda df: df.drop(columns="__h"), batch_format="pandas"
    )


def weighted_sample_n(ds, key_col: str, weight_col: str, n: int, *, salt: int = 0):
    """Deterministic weighted sampling WITHOUT replacement (top-n of the
    Efraimidis-Spirakis keys): each row draws u = (hash(key)+1) / 2^32 in
    (0, 1] from the same Knuth hash as ``hash_sample`` and is ranked by
    u^(1/w); the n largest ranks are exactly a weight-proportional sample
    without replacement (Efraimidis & Spirakis 2006, "Weighted random
    sampling with a reservoir"). Hash-based u keeps every guarantee of the
    other samplers — reproducible, cluster-size-independent, resumable —
    and gives an exact SQL twin:

        pow(((key*2654435761 + salt) % 2^32 + 1.0) / 2^32, 1.0 / w)
        ORDER BY .. DESC, key LIMIT n

    Rows with w <= 0 (or null) are never sampled. Scale shape: one
    shuffle-free vectorized key stage + the partial-top-k combiner
    (``sorted_topn``) — at most n rows per block reach the final merge.
    """
    from rustac_ray.query import sorted_topn

    def add_key(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (hash_bucket(keys, salt).astype(np.float64) + 1.0) / float(MOD32)
        with np.errstate(invalid="ignore", divide="ignore"):
            rank = np.power(u, 1.0 / w)
        ok = np.isfinite(rank) & (w > 0)
        batch = batch.filter(pa.array(ok))
        return batch.append_column("__wkey", pa.array(rank[ok], pa.float64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    out = sorted_topn(keyed, [("__wkey", True), (key_col, False)], n)
    return out.map_batches(
        lambda b: b.drop_columns(["__wkey"]), batch_format="pyarrow"
    )


def sample_sql(key_col: str, rate: float, salt: int = 0) -> str:
    """The DuckDB/ANSI predicate equivalent to ``hash_sample`` — used by
    oracle twins and handy for pushing the same sample into a SQL engine."""
    thr = int(rate * MOD32)
    return f"(({key_col} * {KNUTH} + {salt}) % {MOD32}) < {thr}"


def dataset_split(ds, key_col: str, fractions, *, salt: int = 0,
                  split_col: str = "split"):
    """Deterministic train/val/test (or any n-way) split by hash range.

    ``fractions`` is an ordered list of (name, fraction) — the hash space
    [0, 2^32) is cut at integer thresholds cum_i = int(cumfrac_i * 2^32),
    the last split absorbing the remainder, so membership is a pure
    function of (key, salt): stable across runs, block layouts and
    cluster sizes, and consistent with :func:`hash_sample` (a row's
    split never changes when more data arrives). Shuffle-free: one
    vectorized hash + searchsorted per batch.

    SQL twin: ``CASE WHEN (key*KNUTH+salt)%2^32 < t1 THEN n1 WHEN ... END``.
    """
    names = [n for n, _ in fractions]
    fr = np.array([f for _, f in fractions], dtype=np.float64)
    if (fr < 0).any() or abs(fr.sum() - 1.0) > 1e-9:
        raise ValueError(f"fractions must be >=0 and sum to 1, got {fr}")
    cuts = np.array(
        [int(c * MOD32) for c in np.cumsum(fr)[:-1]], dtype=np.uint64
    )
    name_arr = pa.array(names, pa.string())

    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(cuts, hash_bucket(keys, salt), side="right")
        return batch.append_column(
            split_col, name_arr.take(pa.array(idx, pa.int64()))
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def split_sql(key_col: str, fractions, *, salt: int = 0) -> str:
    """The SQL CASE expression twin of :func:`dataset_split`."""
    fr = np.cumsum([f for _, f in fractions])
    arms = []
    for (name, _), c in zip(fractions[:-1], fr[:-1]):
        thr = int(c * MOD32)
        arms.append(
            f"WHEN (({key_col} * {KNUTH} + {salt}) % {MOD32}) < {thr} "
            f"THEN '{name}'"
        )
    return ("CASE " + " ".join(arms) +
            f" ELSE '{fractions[-1][0]}' END")


def source_mix_sample(ds, group_col: str, key_col: str,
                      weights: dict, total_target: int, *, salt: int = 0):
    """Domain rebalancing (DoReMi-style mixture reweighting, made
    deterministic): sample each group toward a target mixture.

    Given integer ``weights`` w_g and ``total_target`` T, each group's
    expected kept count is target_g = T*w_g // Σw; its hash threshold is
    min(2^32, target_g * 2^32 // n_g) — ALL integer arithmetic, so the
    SQL twin is IEEE-identical by construction. Groups whose target
    exceeds their population keep everything (no upsampling).

    Scale shape: pass 1 is a tiny ``groupby(group).count()`` (#domains
    rows — domains are few by definition of a mixture); thresholds are a
    broadcast dict; pass 2 is the shuffle-free hash filter. Kept counts
    are binomial around target_g (hash sampling), exactly like the SQL
    twin row-for-row.
    """
    counts = {
        r[group_col]: r["count()"]
        for r in ds.groupby(group_col).count().take_all()
    }
    wsum = sum(int(weights.get(g, 0)) for g in counts)
    if wsum <= 0:
        raise ValueError("no positive weights for any present group")
    thr = {}
    for g, n in counts.items():
        target = total_target * int(weights.get(g, 0)) // wsum
        thr[g] = np.uint64(min(MOD32, target * MOD32 // max(n, 1)))

    def keep(batch: pa.Table) -> pa.Table:
        groups = batch[group_col].to_numpy(zero_copy_only=False)
        t = np.zeros(len(groups), dtype=np.uint64)
        for g, tv in thr.items():  # vectorized per DOMAIN (few), not per row
            t[groups == g] = tv
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(hash_bucket(keys, salt) < t))

    return ds.map_batches(keep, batch_format="pyarrow")


def temperature_mix_sample(ds, group_col: str, key_col: str,
                           alpha: float, total_target: int, *, salt: int = 0):
    """Temperature-based mixture sampling (the multilingual-pretraining
    standard, p_g ∝ n_g^α — Conneau & Lample's α-smoothing): group
    targets are target_g = floor(T · n_g^α / Σ_h n_h^α), so α=1
    preserves the natural mix, α→0 approaches uniform over groups, and
    rare groups are upsampled RELATIVE to their share (never above
    their population — no row duplication, same contract as
    ``source_mix_sample``).

    Same scale shape: one tiny groupby(count) pass (#groups rows), a
    broadcast threshold dict, then the shuffle-free deterministic hash
    filter. pow/division happen in IEEE double exactly like the SQL
    twin; everything after the floor is integer arithmetic.
    """
    import math

    counts = {
        r[group_col]: r["count()"]
        for r in ds.groupby(group_col).count().take_all()
    }
    if not counts:
        raise ValueError("temperature_mix_sample: empty input")
    if alpha < 0:
        raise ValueError("temperature_mix_sample: alpha must be >= 0")
    z = sum(float(n) ** alpha for n in counts.values())
    thr = {}
    for g, n in counts.items():
        target = int(math.floor(total_target * (float(n) ** alpha) / z))
        thr[g] = np.uint64(min(MOD32, target * MOD32 // max(int(n), 1)))

    def keep(batch: pa.Table) -> pa.Table:
        groups = batch[group_col].to_numpy(zero_copy_only=False)
        t = np.zeros(len(groups), dtype=np.uint64)
        for g, tv in thr.items():  # vectorized per GROUP (few), not per row
            t[groups == g] = tv
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(hash_bucket(keys, salt) < t))

    return ds.map_batches(keep, batch_format="pyarrow")
