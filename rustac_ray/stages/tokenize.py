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
                     sample_mod: int | None = None, batch_size: int = 4096):
    """Distributed word-frequency table → driver dict {word: count}.

    Each task emits its local value_counts (keys × blocks partials,
    bounded by the Zipf vocabulary, not the corpus); the driver merge is
    one pandas groupby over the streamed partials. ``sample_mod=m``
    trains on the deterministic doc_id % m == 0 slice.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    _empty = pa.table(
        {"word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        if sample_mod is not None:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(ids % sample_mod == 0))
        if len(batch) == 0:
            return _empty
        # pandas .str.split() == Python str.split() (UNICODE whitespace):
        # the exact tokenization BPEEncoder uses at encode time. (An Arrow
        # RE2 \s+ split is ASCII-only — no \v/NBSP — so merges would be
        # learned on words the encoder never produces; r02 advice.)
        toks = (
            batch[text_col].to_pandas().astype(str).str.split().explode().dropna()
        )
        if len(toks) == 0:
            return _empty
        vc = toks.value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.to_numpy(object), pa.string()),
                "cnt": pa.array(vc.to_numpy(np.int64), pa.int64()),
            }
        )

    # explicit batch_size: tiny default batches make thousands of partials
    # (each ≤ vocab rows) — bigger batches amortize the split and shrink
    # the driver-merge stream ~20×
    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
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
    smallest) adjacent symbol pair; stops early when no pair occurs more
    than once. Pair counts are maintained INCREMENTALLY — a merge touches
    only the words that contain the chosen pair (tracked by an occurrence
    index), so a round costs O(affected words + live pairs), never a full
    O(types) recount. Operates on DISTINCT words weighted by frequency —
    O(types) state, never O(tokens).
    """
    from collections import defaultdict

    # symbol sequences per distinct word (end-of-word marker keeps
    # suffix/prefix merges distinct, per the original algorithm)
    words = list(word_freqs)
    seqs = [list(w) + [END_OF_WORD] for w in words]
    freqs = [int(word_freqs[w]) for w in words]
    pc: dict = defaultdict(int)   # pair → weighted count
    occ: dict = defaultdict(set)  # pair → word indices that (may) contain it
    for i, s in enumerate(seqs):
        f = freqs[i]
        for j in range(len(s) - 1):
            p = (s[j], s[j + 1])
            pc[p] += f
            occ[p].add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < 2:
            break
        merges.append(best)
        tok = best[0] + best[1]
        # only words holding the pair change; occ may hold stale entries
        # (word no longer contains the pair) — for those the remove/re-add
        # below is a net no-op, so correctness is unaffected
        for i in list(occ.get(best, ())):
            s, f = seqs[i], freqs[i]
            for j in range(len(s) - 1):
                p = (s[j], s[j + 1])
                pc[p] -= f
                if pc[p] <= 0:
                    pc.pop(p, None)
            out, j = [], 0
            while j < len(s):
                if j < len(s) - 1 and s[j] == best[0] and s[j + 1] == best[1]:
                    out.append(tok)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[i] = out
            for j in range(len(out) - 1):
                p = (out[j], out[j + 1])
                pc[p] += f
                occ[p].add(i)
        occ.pop(best, None)
        pc.pop(best, None)
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
            # encode each DISTINCT word once (per-actor cache persists
            # across batches — Zipf text makes repeats ~free); everything
            # per-TOKEN below is numpy indexing on the factorized codes
            codes, uniques = pd.factorize(ex, sort=False)
            stats = [self._word_stats(str(w)) for w in uniques]
            cnt_t = np.array([s[0] for s in stats], np.int64)
            first_t = np.array([s[1] for s in stats], object)
            last_t = np.array([s[2] for s in stats], object)
            n = np.bincount(rows, weights=cnt_t[codes], minlength=len(batch)).astype(
                np.int64
            )
            # rows is non-decreasing (explode preserves doc order), so the
            # first/last token position per doc comes from np.unique
            uniq_rows, first_pos = np.unique(rows, return_index=True)
            last_pos = len(rows) - 1 - np.unique(rows[::-1], return_index=True)[1]
            first[uniq_rows] = first_t[codes[first_pos]]
            last[uniq_rows] = last_t[codes[last_pos]]
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "n_bpe_tokens": n,
                "first_token": first.astype(str),
                "last_token": last.astype(str),
            }
        )
