"""Benchmark decontamination: drop/flag training docs whose word n-grams
overlap a held-out evaluation set.

The canonical large-scale-training-data hygiene op (e.g. GPT-3 App. C /
PaLM-style 13-gram decontamination): the *test* side is tiny (benchmarks),
the *train* side is the 100 TB corpus — so the test n-gram set is built
once, broadcast via one ``ray.put``, and every train batch does a
vectorized membership probe against it. No shuffle touches the corpus.

Two membership structures:

- **exact**: sorted ``uint64`` array of test n-gram hashes +
  ``np.searchsorted`` probes. Exact (modulo 64-bit hash collisions,
  ~2e-11 at 1e5 distinct n-grams) — this path is the DuckDB-oracle query.
- **bloom**: :class:`BloomFilter` — fixed-size bit array independent of
  test-set cardinality, for when the eval suite has billions of n-grams.
  One-sided error: every truly-contaminated doc is still flagged (no
  false negatives); FPR is set by sizing. The scale default.

Vectorization: tokenize with pandas ``str.split`` + ``explode`` (C
kernels), build n-gram strings with shifted vectorized concat, hash with
pandas' siphash (stable across machines) finalized by splitmix64 — no
Python loop over rows or tokens anywhere.

Reference analogue: rustac has no decontamination op (this is a
task-mandated training-data extension); the broadcast-small-side shape
mirrors stages/spatial_join.py's probe-index broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rustac_ray.stages.sketch import splitmix64

__all__ = [
    "BloomFilter",
    "ngram_hashes",
    "ngram_hash_set",
    "build_bloom",
    "decontaminate",
]


def _ngram_frame(text: pd.Series, n: int) -> pd.DataFrame:
    """(row_pos, hash) for every word n-gram of every row, vectorized.

    row_pos is the 0-based position within this batch. n-grams are the
    space-joined runs of ``n`` consecutive whitespace-split tokens —
    exactly ``w[i] || ' ' || ... || w[i+n-1]`` in the SQL oracle.
    """
    toks = text.astype(str).str.split()
    ex = toks.explode()
    ex = ex[ex.notna()]
    if len(ex) == 0:
        return pd.DataFrame({"row": np.array([], np.int64), "h": np.array([], np.uint64)})
    # map batch index labels -> 0..B-1 positions
    pos_of = pd.Series(np.arange(len(text), dtype=np.int64), index=text.index)
    row = pos_of[ex.index].to_numpy()
    words = ex.reset_index(drop=True).astype(str)
    gram = words.copy()
    for j in range(1, n):
        gram = gram + " " + words.shift(-j)
    same_row = np.ones(len(row), dtype=bool)
    for j in range(1, n):
        nxt = np.roll(row, -j)
        nxt[-j:] = -1
        same_row &= nxt == row
    gram = gram[same_row]
    h = splitmix64(
        pd.util.hash_pandas_object(gram, index=False).to_numpy().view(np.uint64)
    )
    return pd.DataFrame({"row": row[same_row], "h": h}).drop_duplicates()


def ngram_hashes(text: pd.Series, n: int = 3) -> pd.DataFrame:
    """Public wrapper: distinct (row, h) word-n-gram hashes per row."""
    return _ngram_frame(text, n)


def ngram_hash_set(ds, col: str = "text", n: int = 3) -> np.ndarray:
    """Distinct n-gram hashes of the (small) test side, as a sorted uint64
    array ready for ``np.searchsorted``.

    The per-batch distinct step bounds what leaves each task; the final
    union happens driver-side because the test side is by definition the
    small side (benchmarks, not the corpus). For a giant eval suite use
    :func:`build_bloom` instead.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        f = _ngram_frame(batch[col], n)
        return pd.DataFrame({"h": np.unique(f["h"].to_numpy())})

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    if not parts:
        return np.array([], np.uint64)
    return np.unique(np.array([r["h"] for r in parts], dtype=np.uint64))


class BloomFilter:
    """Fixed-size Bloom filter over uint64 hashes; vectorized probes.

    ``k`` probe positions are derived from one input hash by splitmix64
    re-finalization with distinct seeds (standard double-hashing variant).
    Mergeable by OR — per-partition filters union into the global one, so
    a distributed build is a small all-reduce of ``m_bits/8`` bytes per
    partition, never a shuffle of the n-grams themselves.
    """

    def __init__(self, m_bits: int = 1 << 23, k: int = 7, bits: np.ndarray | None = None):
        if m_bits % 64:
            raise ValueError("m_bits must be a multiple of 64")
        self.m_bits = m_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(m_bits // 64, np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64, copy=False)
        pos = np.empty((self.k, len(h)), np.uint64)
        for i in range(self.k):
            pos[i] = splitmix64(h + np.uint64(0x9E3779B9 * (i + 1)))
        return pos % np.uint64(self.m_bits)

    def add(self, h: np.ndarray) -> None:
        pos = self._positions(h).ravel()
        np.bitwise_or.at(self.bits, pos >> np.uint64(6), np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, h: np.ndarray) -> np.ndarray:
        """Vectorized membership: True where ALL k bits are set."""
        if len(h) == 0:
            return np.zeros(0, bool)
        pos = self._positions(h)
        hit = np.ones(pos.shape[1], bool)
        for i in range(self.k):
            p = pos[i]
            hit &= (self.bits[p >> np.uint64(6)] >> (p & np.uint64(63))) & np.uint64(1) != 0
        return hit

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if other.m_bits != self.m_bits or other.k != self.k:
            raise ValueError("bloom shape mismatch")
        return BloomFilter(self.m_bits, self.k, self.bits | other.bits)


def build_bloom(ds, col: str = "text", n: int = 3, *, m_bits: int = 1 << 23, k: int = 7) -> BloomFilter:
    """Distributed Bloom build: per-batch partial filters OR-merged.

    Each task emits its ``m_bits/8``-byte partial; the driver ORs them
    (at real scale: a tree-reduce of fixed-size byte strings — cost is
    partitions × filter size, independent of corpus size).
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        bf = BloomFilter(m_bits, k)
        bf.add(_ngram_frame(batch[col], n)["h"].to_numpy())
        return pd.DataFrame({"bits": [bf.bits.tobytes()]})

    out = BloomFilter(m_bits, k)
    for row in ds.map_batches(partial, batch_format="pandas").take_all():
        out.bits |= np.frombuffer(row["bits"], np.uint64)
    return out


class _Decontaminator:
    """Actor-pool stage: fetch the broadcast membership structure ONCE per
    actor (``__init__``), then vectorized per-batch probes."""

    def __init__(self, member_ref, n: int, threshold: float, col: str, id_col: str):
        import ray

        # map_batches passes the raw ObjectRef through; resolve it once here
        member = ray.get(member_ref) if isinstance(member_ref, ray.ObjectRef) else member_ref
        if isinstance(member, BloomFilter):
            self._probe = member.contains
        else:  # sorted uint64 array
            arr = member

            def _probe(h: np.ndarray) -> np.ndarray:
                idx = np.searchsorted(arr, h)
                idx[idx == len(arr)] = max(len(arr) - 1, 0)
                return (arr[idx] == h) if len(arr) else np.zeros(len(h), bool)

            self._probe = _probe
        self.n, self.threshold, self.col, self.id_col = n, threshold, col, id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        f = _ngram_frame(batch[self.col], self.n)
        total = np.zeros(len(batch), np.int64)
        matched = np.zeros(len(batch), np.int64)
        if len(f):
            hit = self._probe(f["h"].to_numpy())
            np.add.at(total, f["row"].to_numpy(), 1)
            np.add.at(matched, f["row"].to_numpy(), hit.astype(np.int64))
        frac = matched / np.maximum(total, 1)
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "n_ngrams": total,
                "n_matched": matched,
                "contam_frac": frac,
                "contaminated": frac >= self.threshold,
            }
        )


def decontaminate(
    train_ds,
    test_side,
    *,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    concurrency: int = 2,
):
    """Score every train doc's distinct-n-gram overlap with the test side.

    ``test_side`` is either a Dataset (exact hash-set is built from it) or
    a prebuilt :class:`BloomFilter` / sorted uint64 array. Returns columns
    (id_col, n_ngrams, n_matched, contam_frac, contaminated); filter on
    ``contaminated`` to drop. Docs with fewer than ``n`` tokens have zero
    n-grams and are never flagged.
    """
    import ray

    if isinstance(test_side, (BloomFilter, np.ndarray)):
        member = test_side
    else:
        member = ngram_hash_set(test_side, col=col, n=n)
    ref = ray.put(member)
    return train_ds.map_batches(
        _Decontaminator,
        fn_constructor_args=(ref, n, threshold, col, id_col),
        batch_format="pandas",
        concurrency=concurrency,
    )
