"""Bloom-prefiltered distributed equi-joins (semi / anti) for large×large
key joins.

The 100-TB problem: a semi-join ("keep left rows whose key appears on the
right") via a hash-shuffle join moves EVERY left row through the exchange,
even though most are about to be dropped. The classic fix is a Bloom
prefilter: build a fixed-size mergeable Bloom filter over the right keys
(a small all-reduce of ``m_bits/8`` bytes per partition — never a shuffle
of keys), broadcast it once (``ray.put``, fetched per actor), and drop
bloom-negative left rows BEFORE the exchange. Bloom negatives are
definite non-members, so:

- **semi**: only bloom-positive survivors (true matches + the ~0.1-1% of
  false positives) enter the exact verify stage;
- **anti**: bloom-negative rows are definite keeps and stream straight
  through with NO shuffle at all; only bloom-positives need the exact
  check.

Exact verification (Bloom false positives must not leak):

- ``verify="broadcast"`` (right side ≤ ``broadcast_max_keys``): the exact
  distinct key array goes out once via ``ray.put``; membership is a
  vectorized ``np.isin`` per batch — zero shuffles end to end.
- ``verify="join"``: a native hash-partition ``left_semi`` / ``left_anti``
  join of the SURVIVORS against the right keys — the exchange now carries
  only the prefiltered stream (for a 1%-selective semi-join that is a
  ~100× shuffle-volume reduction over joining the raw left side).
- ``verify="auto"`` picks by ``right.count()`` (an O(metadata) operation
  on parquet inputs).

The analogous reference-side machinery is DuckDB's own perfect/bloom join
filters under the pushdown search (SURVEY.md S7); here the filter is an
explicit, composable Ray stage usable against any Dataset pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .decontam import BloomFilter

__all__ = ["build_key_bloom", "bloom_semi_join"]


_NA_HASH = np.uint64(0x9E3779B97F4A7C15)


def _key_hashes(s: pd.Series) -> np.ndarray:
    """Deterministic uint64 hashes of a key column, canonicalized so
    EQUAL KEYS HASH EQUALLY ACROSS SIDES regardless of storage dtype.

    ``pd.util.hash_pandas_object`` is dtype-sensitive: int32 vs int64
    negatives and float-promoted ints vs ints hash differently, so
    mismatched left/right key dtypes (e.g. pandas promoting a nullable
    int to float) would turn TRUE MEMBERS into bloom negatives — dropped
    (semi) or kept as definite non-members (anti) before the exact
    verify ever runs. Canonical rules:

    - bools / integers of any width sign-extend to int64;
    - float values that are exact integers (|v| < 2^53) hash as their
      int64 value (per-element, so a mixed float column still matches an
      int column on its integral keys);
    - other floats hash as float64;
    - nulls hash as a fixed sentinel (a null key never equals anything
      in join semantics; the exact verify stage decides those rows);
    - categoricals hash by value (not by code/category order).
    """
    dt = s.dtype
    if isinstance(dt, pd.CategoricalDtype):
        s = s.astype(object)
        dt = s.dtype
    if pd.api.types.is_bool_dtype(dt) or pd.api.types.is_integer_dtype(dt):
        na = s.isna().to_numpy()
        fill = False if pd.api.types.is_bool_dtype(dt) else 0
        vals = s.fillna(fill).astype("int64")
        h = pd.util.hash_pandas_object(vals, index=False).to_numpy().astype(np.uint64)
        if na.any():
            h[na] = _NA_HASH
        return h
    if pd.api.types.is_float_dtype(dt):
        vn = s.to_numpy(dtype=np.float64, na_value=np.nan)
        na = np.isnan(vn)
        h = (
            pd.util.hash_pandas_object(pd.Series(vn), index=False)
            .to_numpy()
            .astype(np.uint64)
        )
        with np.errstate(invalid="ignore"):
            intlike = np.isfinite(vn) & (np.abs(vn) < 2.0**53) & (vn == np.floor(vn))
        if intlike.any():
            h[intlike] = (
                pd.util.hash_pandas_object(
                    pd.Series(vn[intlike].astype(np.int64)), index=False
                )
                .to_numpy()
                .astype(np.uint64)
            )
        if na.any():
            h[na] = _NA_HASH
        return h
    return pd.util.hash_pandas_object(s, index=False).to_numpy().astype(np.uint64)


def build_key_bloom(ds, col: str, *, m_bits: int = 1 << 24, k: int = 7) -> BloomFilter:
    """Distributed Bloom over a key column: per-block partial filters,
    OR-merged on the driver (fixed ``m_bits/8`` bytes per block — the
    merge cost is partitions × filter size, independent of row count)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(m_bits, k)
        bf.add(_key_hashes(batch[col]))
        return pd.DataFrame({"bits": [bf.bits.tobytes()]})

    out = BloomFilter(m_bits, k)
    for b in ds.select_columns([col]).map_batches(
        partial, batch_format="pandas"
    ).iter_batches(batch_format="pandas"):
        for blob in b["bits"]:
            out.bits |= np.frombuffer(blob, np.uint64)
    return out


class _BloomProbe:
    """Actor-pool stage: fetch the broadcast filter once per actor, then
    vectorized k-probe membership per batch; keeps hits or misses."""

    def __init__(self, bloom_ref, col: str, keep_hits: bool):
        import ray

        self.bloom = (
            ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        )
        self.col = col
        self.keep_hits = keep_hits

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hit = self.bloom.contains(_key_hashes(batch[self.col]))
        return batch.loc[hit if self.keep_hits else ~hit]


class _ExactMember:
    """Broadcast exact-membership verify: sorted distinct key array out
    once via ``ray.put``; vectorized ``np.isin`` per batch."""

    def __init__(self, keys_ref, col: str, keep_members: bool):
        import ray

        self.keys = (
            ray.get(keys_ref) if isinstance(keys_ref, ray.ObjectRef) else keys_ref
        )
        self.col = col
        self.keep_members = keep_members

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(batch[self.col].to_numpy(), self.keys)
        return batch.loc[m if self.keep_members else ~m]


def bloom_semi_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "semi",
    m_bits: int = 1 << 24,
    k: int = 7,
    num_partitions: int = 32,
    verify: str = "auto",
    broadcast_max_keys: int = 2_000_000,
    concurrency: int | tuple[int, int] = 2,
):
    """→ left rows whose ``on`` key is (semi) / is not (anti) present in
    ``right[right_on]``. Exact semantics — the Bloom stage only prunes.

    Scale notes: the anti path consumes the left pipeline twice (once for
    definite keeps, once for the to-verify stream); on parquet inputs
    that is two pruned scans, still far cheaper than shuffling the whole
    left side. Bloom sizing: ~``1.44 · n · log2(1/p)`` bits for target
    false-positive rate p — at the default 2^24 bits / k=7, p≈0.8% for
    1M right keys; false positives only cost verify work, never wrong
    rows.
    """
    import ray

    if how not in ("semi", "anti"):
        raise ValueError(f"how must be 'semi' or 'anti', got {how!r}")
    rcol = right_on or on
    right_keys = right.select_columns([rcol])

    bloom_ref = ray.put(build_key_bloom(right_keys, rcol, m_bits=m_bits, k=k))

    def probe(keep_hits: bool):
        return left.map_batches(
            _BloomProbe,
            fn_constructor_args=(bloom_ref, on, keep_hits),
            batch_format="pandas",
            concurrency=concurrency,
        )

    if verify == "auto":
        verify = "broadcast" if right_keys.count() <= broadcast_max_keys else "join"

    positives = probe(keep_hits=True)
    if verify == "broadcast":
        uniq = np.unique(
            np.concatenate(
                [
                    b[rcol].to_numpy()
                    for b in right_keys.iter_batches(batch_format="pandas")
                    if len(b)
                ]
                or [np.zeros(0)]
            )
        )
        keys_ref = ray.put(uniq)
        checked = positives.map_batches(
            _ExactMember,
            fn_constructor_args=(keys_ref, on, how == "semi"),
            batch_format="pandas",
            concurrency=concurrency,
        )
    elif verify == "join":
        checked = positives.join(
            right_keys,
            join_type="left_semi" if how == "semi" else "left_anti",
            num_partitions=num_partitions,
            on=(on,),
            right_on=(rcol,),
        )
    else:
        raise ValueError(f"verify must be auto|broadcast|join, got {verify!r}")

    if how == "semi":
        return checked
    # anti: bloom-negatives are definite keeps (no shuffle, no verify)
    return probe(keep_hits=False).union(checked)
