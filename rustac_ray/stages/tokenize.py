"""Byte-pair-encoding tokenizer: driver-trained merges, distributed encode.

The standard Sennrich-style word-level BPE split into the two halves a
Ray pipeline wants:

- **train_bpe** runs on the DRIVER over a word-frequency table (words ×
  counts — the tiny, Zipf-bounded summary of the corpus, not the corpus).
  The word counts themselves come from a distributed combiner pass
  (``word_frequencies``): each ``map_batches`` task emits its local
  (word, count) partials and the driver merges them — the same
  keys×blocks driver-merge rule as heavy hitters (BENCH/BASELINE.md).
  Training is deterministic: most-frequent pair wins, ties break on the
  lexicographically smallest pair.
- **BPEEncoder** is the actor-pool encode stage: the merge ranks ship
  once via ``ray.put``; each actor keeps a word → token-count cache so
  the greedy merge loop runs ONCE per distinct word per actor (Zipf text
  makes the cache hit rate ≈ the token-to-type ratio — the standard
  trick that keeps BPE encode vectorizable in spirit: per-batch work is
  bounded by NEW types, not tokens).

Scale shape: merges are O(vocab) small and broadcast; encode is
embarrassingly parallel; the only exchange is the tiny word-count
partial stream at train time. At 100 TB you train on a hash-sampled
slice (pass ``sample_mod``) and encode the full corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["word_frequencies", "train_bpe", "BPEEncoder", "END_OF_WORD"]

END_OF_WORD = "</w>"


def word_frequencies(ds, *, text_col: str = "text", id_col: str = "doc_id",
                     sample_mod: int | None = None):
    """Distributed word-frequency table → driver dict {word: count}.

    Each task emits its local value_counts (keys × blocks partials,
    bounded by the Zipf vocabulary, not the corpus); the driver merge is
    one pandas groupby over the streamed partials. ``sample_mod=m``
    trains on the deterministic doc_id % m == 0 slice.
    """
    import pyarrow as pa

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if sample_mod is not None:
            batch = batch[batch[id_col] % sample_mod == 0]
        words = batch[text_col].astype(str).str.split().explode().dropna()
        if not len(words):
            return pd.DataFrame({"word": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype="int64")})
        vc = words.value_counts()
        return pd.DataFrame({"word": vc.index, "cnt": vc.to_numpy().astype("int64")})

    partials = ds.map_batches(partial, batch_format="pandas")
    parts = [
        b.to_pandas()
        for b in partials.iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    if not parts:
        return {}
    merged = pd.concat(parts, ignore_index=True).groupby("word")["cnt"].sum()
    return {str(w): int(c) for w, c in merged.items()}


def train_bpe(word_freqs: dict, num_merges: int) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word-frequency dict.

    Deterministic: each round merges the (count-max, then lexicographically
    smallest) adjacent symbol pair. Pair counting is a vectorized pandas
    groupby over the exploded (symbol, next-symbol) table of DISTINCT
    words weighted by frequency — O(types), never O(tokens). Stops early
    when no pair occurs more than once.
    """
    # symbol sequences per distinct word (end-of-word marker keeps
    # suffix/prefix merges distinct, per the original algorithm)
    words = list(word_freqs)
    seqs = [list(w) + [END_OF_WORD] for w in words]
    freqs = np.array([word_freqs[w] for w in words], dtype=np.int64)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        lefts, rights, widx = [], [], []
        for i, s in enumerate(seqs):
            if len(s) < 2:
                continue
            lefts.extend(s[:-1])
            rights.extend(s[1:])
            widx.append(np.full(len(s) - 1, i, dtype=np.int64))
        if not lefts:
            break
        df = pd.DataFrame(
            {
                "l": lefts,
                "r": rights,
                "c": freqs[np.concatenate(widx)],
            }
        )
        agg = df.groupby(["l", "r"], sort=True)["c"].sum()
        best_count = agg.max()
        if best_count < 2:
            break
        # sort=True above → the index is lexicographic; idxmax returns the
        # FIRST max, i.e. the lexicographically smallest tied pair
        best = agg.idxmax()
        merges.append((str(best[0]), str(best[1])))
        tok = best[0] + best[1]
        for s in seqs:
            j = 0
            while j < len(s) - 1:
                if s[j] == best[0] and s[j + 1] == best[1]:
                    s[j : j + 2] = [tok]
                else:
                    j += 1
    return merges


def _encode_word(word: str, ranks: dict) -> list[str]:
    """Greedy BPE apply: repeatedly merge the lowest-rank pair present."""
    sym = list(word) + [END_OF_WORD]
    while len(sym) > 1:
        best_rank, best_j = None, -1
        for j in range(len(sym) - 1):
            r = ranks.get((sym[j], sym[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        pair = (sym[best_j], sym[best_j + 1])
        tok = pair[0] + pair[1]
        # merge ALL occurrences of the chosen pair this round
        out, j = [], 0
        while j < len(sym):
            if j < len(sym) - 1 and sym[j] == pair[0] and sym[j + 1] == pair[1]:
                out.append(tok)
                j += 2
            else:
                out.append(sym[j])
                j += 1
        sym = out
    return sym


class BPEEncoder:
    """Actor-pool encode stage → per-doc token stats.

    ``__init__`` fetches the broadcast merges once and builds the rank
    dict; ``__call__`` encodes only the batch's NEW distinct words (per-
    actor cache), then joins counts back with vectorized pandas maps.

    Emits doc_id, n_bpe_tokens, and the first/last token strings (cheap
    order-sensitive witnesses of the actual tokenization).
    """

    def __init__(self, merges_ref, text_col: str = "text", id_col: str = "doc_id"):
        import ray

        merges = (
            ray.get(merges_ref)
            if isinstance(merges_ref, ray.ObjectRef)
            else merges_ref
        )
        self.ranks = {(l, r): i for i, (l, r) in enumerate(merges)}
        self.text_col = text_col
        self.id_col = id_col
        self.cache: dict[str, tuple[int, str, str]] = {}

    def _word_stats(self, word: str) -> tuple[int, str, str]:
        hit = self.cache.get(word)
        if hit is None:
            toks = _encode_word(word, self.ranks)
            hit = (len(toks), toks[0], toks[-1])
            self.cache[word] = hit
        return hit

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].astype(str).str.split()
        ex = toks.explode().dropna()
        pos_of = pd.Series(np.arange(len(batch), dtype=np.int64), index=batch.index)
        n = np.zeros(len(batch), np.int64)
        first = np.full(len(batch), "", dtype=object)
        last = np.full(len(batch), "", dtype=object)
        if len(ex):
            rows = pos_of[ex.index].to_numpy()
            words = ex.to_numpy()
            # encode each DISTINCT word once (per-actor cache persists
            # across batches — Zipf text makes repeats ~free)
            uniq = pd.unique(words)
            stats = {w: self._word_stats(str(w)) for w in uniq}
            counts = np.array([stats[w][0] for w in words], dtype=np.int64)
            n = np.bincount(rows, weights=counts, minlength=len(batch)).astype(
                np.int64
            )
            # first/last word per doc → its first/last subtoken
            first_idx = np.full(len(batch), -1, np.int64)
            seen = np.zeros(len(batch), bool)
            for j, r in enumerate(rows):
                if not seen[r]:
                    first_idx[r] = j
                    seen[r] = True
            last_idx = np.full(len(batch), -1, np.int64)
            for j, r in enumerate(rows):
                last_idx[r] = j
            for d in range(len(batch)):
                if first_idx[d] >= 0:
                    first[d] = stats[words[first_idx[d]]][1]
                    last[d] = stats[words[last_idx[d]]][2]
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "n_bpe_tokens": n,
                "first_token": first.astype(str),
                "last_token": last.astype(str),
            }
        )
