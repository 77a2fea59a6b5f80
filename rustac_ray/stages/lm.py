"""Perplexity filtering: CCNet-style language-model quality scoring.

A char-bigram language model (256×256 byte transitions, add-one
smoothing) stands in for the KenLM n-gram model of the CCNet pipeline:
train on a trusted slice, score every document, filter the high-
perplexity tail. The two halves map onto Ray the same way as BPE
(tokenize.py):

- **train_char_lm** counts byte bigrams with a distributed combiner
  (each task emits a 256×256 int64 count grid — constant size — merged
  by summation on the driver) and converts to a quantized cost table.
- **PerplexityScorer** is a stateless ``map_batches`` stage: the cost
  table ships once via ``ray.put``; each batch concatenates its docs'
  bytes into ONE array, gathers per-pair costs with a single fancy-index,
  and segments per-doc sums with ``np.add.reduceat`` — no per-row Python.

Determinism: costs are integer **micro-nats** (round(-logp × 1e6) as
int64), so per-doc totals are order-independent exact integer sums — an
oracle reproduces them bit-for-bit regardless of summation order (the
same trick as zonal's integer pixel sums). The filter predicate
``nll_sum × 1 ≤ cutoff_micro × n_pairs`` is pure integer arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["train_char_lm", "bigram_cost_table", "PerplexityScorer"]


def train_char_lm(ds, *, text_col: str = "text", sample_mod: int | None = None,
                  batch_size: int = 4096):
    """Distributed byte-bigram counting → (256, 256) int64 count grid.

    Each task's partial is a constant-size grid (the ideal combiner:
    state size independent of data size); the driver merge is a sum of
    a handful of grids.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if sample_mod is not None:
            batch = batch[batch["doc_id"] % sample_mod == 0]
        grid = np.zeros((256, 256), np.int64)
        for t in batch[text_col].astype(str):
            b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
            if len(b) >= 2:
                np.add.at(grid, (b[:-1], b[1:]), 1)
        return pd.DataFrame({"grid": [grid.tobytes()]})

    # one 512-KiB grid per BATCH; distributed fan-in rounds (fold.py) sum
    # them down to ≤32 grids before the driver touches anything, so the
    # driver merge is constant-size at any block count (r03 verdict #8)
    import pyarrow as pa

    from .fold import tree_fold

    def sum_block(t: "pa.Table") -> "pa.Table":
        acc = np.zeros(256 * 256, np.int64)
        for raw in t["grid"]:
            acc += np.frombuffer(raw.as_py(), np.int64)
        return pa.table({"grid": pa.array([acc.tobytes()], pa.binary())})

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    total = np.zeros((256, 256), np.int64)
    for row in tree_fold(partials, sum_block).take_all():
        total += np.frombuffer(row["grid"], np.int64).reshape(256, 256)
    return total


def bigram_cost_table(counts: np.ndarray) -> np.ndarray:
    """Add-one-smoothed bigram NLL quantized to int64 micro-nats:
    cost[a, b] = round(-ln((c[a,b]+1)/(rowsum[a]+256)) * 1e6)."""
    counts = np.asarray(counts, np.int64)
    row = counts.sum(axis=1, keepdims=True)
    logp = np.log((counts + 1).astype(np.float64)) - np.log(
        (row + 256).astype(np.float64)
    )
    return np.round(-logp * 1e6).astype(np.int64)


class PerplexityScorer:
    """Actor-pool scoring stage → (doc_id, n_pairs, nll_micro [, kept]).

    ``cutoff_micro``: keep docs whose mean cost ≤ cutoff (micro-nats per
    bigram), evaluated as the exact integer cross-product comparison.
    ``mode="score"`` emits every doc with its score; ``mode="filter"``
    emits only survivors (the CCNet shape).
    """

    def __init__(self, cost_ref, cutoff_micro: int | None = None,
                 mode: str = "score"):
        import ray

        self.cost = (
            ray.get(cost_ref) if isinstance(cost_ref, ray.ObjectRef) else cost_ref
        )
        if self.cost.dtype != np.int64 or self.cost.shape != (256, 256):
            raise ValueError("cost table must be (256,256) int64 micro-nats")
        if mode not in ("score", "filter"):
            raise ValueError(f"unknown mode {mode!r}")
        if mode == "filter" and cutoff_micro is None:
            raise ValueError("mode='filter' requires cutoff_micro")
        self.cutoff = cutoff_micro
        self.mode = mode

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].astype(str).tolist()
        bufs = [t.encode("utf-8", "ignore") for t in texts]
        lens = np.array([len(b) for b in bufs], np.int64)
        big = (
            np.frombuffer(b"".join(bufs), dtype=np.uint8)
            if lens.sum()
            else np.zeros(0, np.uint8)
        )
        offs = np.concatenate([[0], np.cumsum(lens)])
        # all adjacent pairs at once; each doc's pair range
        # [offs[i], offs[i+1]-1) naturally excludes the cross-doc seams
        if len(big) >= 2:
            costs = self.cost[big[:-1], big[1:]]
            cum = np.concatenate([[0], np.cumsum(costs)])
            starts = offs[:-1]
            ends = np.maximum(offs[1:] - 1, offs[:-1])
            nll = cum[ends] - cum[starts]
            n_pairs = np.maximum(lens - 1, 0)
        else:
            nll = np.zeros(len(batch), np.int64)
            n_pairs = np.maximum(lens - 1, 0)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_pairs": n_pairs.astype("int64"),
                "nll_micro": nll.astype("int64"),
            }
        )
        if self.mode == "filter":
            keep = out["nll_micro"] <= int(self.cutoff) * out["n_pairs"]
            out = out[keep].reset_index(drop=True)
        return out
