"""Sequence packing: group documents into fixed token-budget training
sequences (the "pack short docs together" step before LLM pretraining).

Scale shape: packing is inherently order-dependent, so a global greedy
pack would serialize the whole corpus. Instead the corpus is split into
``num_buckets`` deterministic hash buckets (same Knuth hash as
``stages.sampling``) and each bucket packs INDEPENDENTLY — the only
shuffle is the bucket groupby, buckets pack in parallel, and the result
is a pure function of (ids, token counts, budget, num_buckets): stable
across runs, block layouts and cluster sizes. Within a bucket, docs pack
in ascending-id order with next-fit greedy (sequences close when the
next doc would overflow; docs longer than the budget are clipped to a
sequence of their own, flagged).

The per-bucket scan costs O(#sequences) numpy ``searchsorted`` calls on
a cumulative-sum array — per sequence, not per document.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sampling import hash_bucket

__all__ = ["pack_sequences"]

_BUCKET = "__pack_bucket"


def _pack_bucket_arrays(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Next-fit greedy over an ordered token-count array → seq index."""
    n = len(tokens)
    t = np.minimum(tokens, budget)
    cum = np.cumsum(t, dtype=np.int64)
    seq = np.empty(n, dtype=np.int64)
    start, s = 0, 0
    base = np.int64(0)
    while start < n:
        j = int(np.searchsorted(cum, base + budget, side="right"))
        j = max(j, start + 1)  # every sequence takes at least one doc
        seq[start:j] = s
        base = cum[j - 1]
        start = j
        s += 1
    return seq


def pack_sequences(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    budget: int = 512,
    num_buckets: int = 64,
):
    """→ per-doc assignment rows: (id_col, n_tokens, bucket, seq, clipped).

    A training sequence is identified by (bucket, seq); ``clipped`` marks
    docs whose own token count exceeds the budget (they occupy a
    sequence alone and would be truncated downstream). Token counts are
    whitespace tokens from ``text_col`` unless a precomputed
    ``token_col`` is given. Ids must be non-negative integers (the
    bucket hash contract, see stages/sampling.py).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")

    def count_and_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        if token_col is not None:
            toks = batch[token_col].to_numpy().astype(np.int64)
        else:
            toks = (
                batch[text_col]
                .astype(str)
                .str.split()
                .str.len()
                .fillna(0)
                .to_numpy()
                .astype(np.int64)
            )
        ids = batch[id_col].to_numpy()
        return pd.DataFrame(
            {
                id_col: ids,
                "n_tokens": toks,
                _BUCKET: (
                    hash_bucket(ids) % np.uint64(num_buckets)
                ).astype(np.int64),
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = g["n_tokens"].to_numpy()
        seq = _pack_bucket_arrays(toks, budget)
        return pd.DataFrame(
            {
                id_col: g[id_col],
                "n_tokens": g["n_tokens"],
                "bucket": g[_BUCKET],
                "seq": seq,
                "clipped": toks > budget,
            }
        )

    counted = ds.map_batches(count_and_bucket, batch_format="pandas")
    return counted.groupby(_BUCKET).map_groups(pack, batch_format="pandas")
