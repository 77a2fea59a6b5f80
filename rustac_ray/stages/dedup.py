"""Deduplication operators over the documents / images tables.

Scale-first formulations (no driver-side row loops):

- exact dedup: vectorized content hash in map_batches →
  ``groupby(hash).map_groups(first)`` — the only shuffle is over the key.
- MinHash + LSH near-dup: per-batch shingle→minhash (numpy), explode to
  band rows co-grouped by PARTITION key (~64 groups, each verifying all
  its buckets in one vectorized pass — per-bucket map_groups calls were
  the hot cost), estimated-jaccard verify, hash-aggregate pair dedup.
- SimHash: 64-bit simhash from token hashes (vectorized per-batch
  vocabulary hashing); near-dups via hamming-LSH banding.
- phash/simhash near-dup: band the 64 bits into n_bands near-equal bands
  (n_bands > max_hamming ⇒ pigeonhole-exact recall); band WIDTH trades
  bucket depth against band count. Same partition-co-grouped verify.
- near_dup_filter: pairs → connected components → drop non-canonical
  members with one broadcast membership filter (corpus never shuffles).

The reference itself has only trivial dedup (extensions dedup,
crates/extensions/src/lib.rs:160-162); these are the training-data-pipeline
extensions the north rule requires.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .safejoin import safe_join

__all__ = [
    "exact_dedup",
    "incremental_dedup",
    "dup_ngram_spans",
    "remove_dup_spans",
    "near_dup_filter",
    "simhash_near_dup",
    "connected_components",
    "MinHasher",
    "minhash_lsh_candidates",
    "multimodal_near_dup",
    "scene_dominance_dedup",
    "ngram_jaccard_near_dup",
    "SimHasher",
    "phash_near_dup",
    "ngram_jaccard",
    "paragraph_dedup",
]

_MERSENNE = (1 << 61) - 1
# multiplicative inverse of the shingle base mod 2^64 (257 is odd), used
# by the prefix-product rolling hash in MinHasher.signatures
_INV257 = np.uint64(pow(257, -1, 2**64))


def _all_pair_indices(length: int) -> tuple[np.ndarray, np.ndarray]:
    """All (i, j), i<j, for one bucket WITHOUT the L×L mask that
    np.triu_indices allocates (O(L²) memory blowup on 1000+-row buckets —
    the actual bottleneck of large LSH verifies, not the hamming math)."""
    idx = np.arange(length, dtype=np.int64)
    counts = length - 1 - idx
    ia = np.repeat(idx, counts)
    total = int(counts.sum())
    offsets = np.concatenate([[0], np.cumsum(counts[:-1])])
    ib = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts) + ia + 1
    return ia, ib


def _hash_text_column(batch: pd.DataFrame, col: str) -> pd.Series:
    """Stable vectorized 64-bit content hash — a grouping key only (the
    dedup groupby shuffles this key, never the text). pandas' siphash with
    the default fixed hash_key is deterministic across runs and machines."""
    return pd.Series(
        pd.util.hash_pandas_object(batch[col].astype(str), index=False).to_numpy()
        .view(np.int64),
        index=batch.index,
    )


def exact_dedup(ds, col: str = "text", id_col: str = "doc_id", *,
                combine: str = "auto", driver_max_candidates: int = 2_000_000,
                num_partitions: int = 32):
    """Keep the first row (lowest id) per exact content value.

    hash-partition + per-group min (SURVEY.md §2.7), content never
    shuffled: the winner pass projects to (hash, id) ONLY and pre-mins
    each block (combiner — dup-heavy corpora collapse before the
    exchange). The candidate stream is materialized once (16 bytes/row)
    and counted, then (r02 verdict #6 — the driver merge is unbounded on
    a mostly-unique corpus, where #candidates ≈ corpus size):

    - ``≤ driver_max_candidates`` (or ``combine="driver"``): the
      candidates are merged on the driver (measured 8-10× faster than
      Ray's grouped Min at 200k docs) and survivors recovered with a
      broadcast sorted-id semi-join.
    - otherwise (or ``combine="shuffle"``): fully distributed —
      ``groupby(hash).aggregate(Min(id))`` then a native hash join of the
      winner ids back onto the corpus; nothing corpus-sized ever reaches
      the driver.
    """
    import ray.data as rd  # noqa: F401

    def winners(batch: pd.DataFrame) -> pd.DataFrame:
        h = _hash_text_column(batch, col)
        out = pd.DataFrame({"_content_hash": h, id_col: batch[id_col].to_numpy()})
        # per-block combiner: one candidate row per distinct content
        return out.groupby("_content_hash", sort=False, as_index=False).min()

    cand = ds.map_batches(winners, batch_format="pandas").materialize()
    use_driver = combine == "driver" or (
        combine == "auto" and cand.count() <= driver_max_candidates
    )

    if not use_driver:
        from ray.data.aggregate import Min

        win = cand.groupby("_content_hash").aggregate(
            Min(id_col, alias_name=id_col)
        )
        win_ids = win.map_batches(
            lambda b: b.select([id_col]), batch_format="pyarrow"
        )
        return safe_join(
            ds, win_ids, join_type="inner", num_partitions=num_partitions,
            on=(id_col,),
        )

    parts = [
        b.to_pandas()
        for b in cand.iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    if parts:
        merged = (
            pd.concat(parts, ignore_index=True)
            .groupby("_content_hash", sort=False, as_index=False)
            .min()
        )
        ids = np.sort(merged[id_col].to_numpy())
    else:
        ids = np.array([], np.int64)

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        k = batch[id_col].to_numpy()
        idx = np.searchsorted(ids, k)
        idx[idx == len(ids)] = max(len(ids) - 1, 0)
        m = (ids[idx] == k) if len(ids) else np.zeros(len(k), bool)
        return batch.loc[m]

    return ds.map_batches(keep, batch_format="pandas")


def dup_ngram_spans(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    *,
    min_count: int = 2,
    combine: str = "driver",
):
    """SUBSTRING-level dedup stats (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", token-n-gram variant):
    an n-gram occurrence is *duplicated* when the same token sequence
    appears ≥ ``min_count`` times anywhere in the corpus (within- or
    cross-document). Per document, reports how many token positions are
    covered by at least one duplicated n-gram — the span a substring
    dedup pass would mask/remove.

    Two-pass broadcast shape: pass 1 folds global occurrence counts of
    every n-gram hash (per-batch Arrow tokenize + rolling-hash
    ``ngram_occurrences`` + value_counts; partials merge on the driver —
    bounded by DISTINCT n-grams; ``combine="shuffle"`` keeps the
    distributed groupby for corpora whose n-gram space exceeds driver
    memory). Pass 2 broadcasts the sorted duplicated-hash array via
    ``ray.put`` and each block computes its own interval-union coverage
    with numpy (sorted starts → min(gap to next start, n) per start).

    N-gram identity is by 64-bit sequence hash: equal sequences always
    collide, unequal ones collide with ~(#ngrams²)/2⁶⁵ probability —
    negligible below ~10⁸ distinct n-grams per corpus partition.

    Returns (id_col, n_tokens, n_dup_tokens, dup_frac) per document.
    """
    import ray

    from rustac_ray.stages.decontam import ngram_occurrences

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        _, _, h = ngram_occurrences(batch[col], n)
        # int64 view for transport: uint64 columns above int64-max break
        # Arrow block concat in multi-block shuffles (cf. _hash_text_column)
        uniq, cnt = np.unique(h.view(np.int64), return_counts=True)
        return pd.DataFrame({"h": uniq, "cnt": cnt.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pandas")
    if combine == "shuffle":
        from ray.data.aggregate import Sum

        grouped = partials.groupby("h").aggregate(Sum("cnt", alias_name="cnt"))
        dup_parts = [
            b["h"].to_numpy(zero_copy_only=False)
            for b in grouped.filter(
                expr=f"cnt >= {int(min_count)}"
            ).iter_batches(batch_format="pyarrow")
            if len(b)
        ]
        dup = np.sort(np.concatenate(dup_parts)) if dup_parts else np.array([], np.int64)
    else:
        parts = [
            b.to_pandas()
            for b in partials.iter_batches(batch_format="pyarrow")
            if len(b)
        ]
        if parts:
            merged = (
                pd.concat(parts, ignore_index=True)
                .groupby("h", sort=False, as_index=False)["cnt"]
                .sum()
            )
            dup = np.sort(
                merged.loc[merged["cnt"] >= min_count, "h"].to_numpy()
            ).astype(np.int64)
        else:
            dup = np.array([], np.int64)
    dup_ref = ray.put(dup)

    def coverage(batch: pd.DataFrame) -> pd.DataFrame:
        dset = ray.get(dup_ref)
        row, pos, h = ngram_occurrences(batch[col], n)
        h = h.view(np.int64)  # transport convention (see partial)
        ids = batch[id_col].to_numpy()
        # per-row token counts (rows with no tokens stay 0)
        from rustac_ray.stages.decontam import _token_hash_rows

        trow, _ = _token_hash_rows(batch[col])
        dl = np.bincount(trow, minlength=len(batch)).astype(np.int64)
        if len(h) and len(dset):
            idx = np.searchsorted(dset, h)
            idx[idx == len(dset)] = len(dset) - 1
            is_dup = dset[idx] == h
        else:
            is_dup = np.zeros(len(h), bool)
        prow, ppos = row[is_dup], pos[is_dup]
        # interval union of [start, start+n) per row: starts are sorted
        # (document order), so each start contributes min(next-start gap, n)
        if len(prow):
            gap = np.full(len(prow), n, np.int64)
            same = prow[:-1] == prow[1:]
            gap[:-1][same] = np.minimum(ppos[1:][same] - ppos[:-1][same], n)
            cov = np.bincount(prow, weights=gap, minlength=len(batch)).astype(np.int64)
        else:
            cov = np.zeros(len(batch), np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                "n_tokens": dl,
                "n_dup_tokens": cov,
                "dup_frac": cov.astype(np.float64) / np.maximum(dl, 1),
            }
        )

    return ds.map_batches(coverage, batch_format="pandas")


def remove_dup_spans(
    ds,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    *,
    min_count: int = 2,
    mode: str = "all",
    combine: str = "auto",
    driver_max_partial_rows: int = 4_000_000,
):
    """SUBSTRING-level dedup as a corpus TRANSFORM (the rewrite half of
    Lee et al. 2022 — ``dup_ngram_spans`` measures the duplicated spans,
    this op removes them): every token covered by a word-n-gram whose
    global occurrence count ≥ ``min_count`` is dropped, and the survivors
    are rejoined with single spaces (C4-style whitespace normalization —
    the synthetic corpus and the SQL twin are single-space already, so
    the join is lossless there).

    ``mode="all"`` removes EVERY duplicated occurrence (the masking
    variant). ``mode="keep_first"`` preserves the canonical copy: for
    each duplicated n-gram, its globally-first occurrence (minimal
    ``(id, token_start)``, native id ordering) stays; only the other
    occurrences' spans are dropped. A token survives iff no NON-canonical
    duplicated occurrence covers it.

    Same two-pass broadcast shape as ``dup_ngram_spans``: pass 1 folds
    per-hash (count, min-occurrence) partials. The partial stream is
    materialized once (16-24 bytes/row) and counted (the exact_dedup
    ``combine="auto"`` rule): under ``driver_max_partial_rows`` the
    merge happens on the driver (cython-only sum; keep_first recovers
    canonical occurrences by one vectorized sort + drop_duplicates —
    a per-group object ``min`` was measured 50µs/group, 60s at 1.2M
    groups); above it, a distributed ``groupby(h)`` aggregates and
    ONLY the ≥min_count survivors (true dup n-grams, the broadcast
    table pass 2 needs anyway) return to the driver. Pass 2 broadcasts
    the dup table via ``ray.put``; each block rewrites its own rows
    fully vectorized (Arrow tokenizer → flat covered mask →
    ``pc.binary_join`` rebuild — no per-row Python strings).

    Returns (id_col, text, n_tokens, n_removed_tokens) per document.
    """
    import ray

    from rustac_ray.stages.decontam import _token_rows, ngram_occurrences

    if mode not in ("all", "keep_first"):
        raise ValueError(f"mode must be 'all' or 'keep_first', got {mode!r}")
    if combine not in ("auto", "driver", "shuffle"):
        raise ValueError(
            f"combine must be 'auto', 'driver' or 'shuffle', got {combine!r}"
        )

    def _occ_key(ids: np.ndarray, pos: np.ndarray) -> np.ndarray:
        """Composite sort key encoding (id, pos) so that lexicographic
        string order == (native id order, pos order). Int ids zero-pad to
        20 digits (int64 max is 19); string ids must not contain NUL."""
        if np.issubdtype(ids.dtype, np.integer):
            if (ids < 0).any():
                raise ValueError("remove_dup_spans: negative integer ids unsupported")
            id_part = np.char.zfill(ids.astype("U20"), 20)
        else:
            id_part = ids.astype("U")
        return np.char.add(
            np.char.add(id_part, "\x00"),
            np.char.zfill(pos.astype("U12"), 12),
        )

    keep_first = mode == "keep_first"

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        row, pos, h = ngram_occurrences(batch[col], n)
        if len(h) == 0:
            out = pd.DataFrame(
                {"h": np.array([], np.int64), "cnt": np.array([], np.int64)}
            )
            if keep_first:
                out["k"] = np.array([], "U1")
            return out
        # int64 VIEW for transport: a uint64 column above int64-max breaks
        # Arrow block concat in the shuffle/iter paths (same convention as
        # _hash_text_column); ordering differs but is consistent both sides
        df = pd.DataFrame({"h": h.view(np.int64)})
        if keep_first:
            ids = batch[id_col].to_numpy()[row]
            df["k"] = _occ_key(ids, pos)
            # size via cython; first occurrence via ONE sort +
            # drop_duplicates (a per-group object min is python-level)
            cnt = df.groupby("h", sort=False).size()
            firsts = df.sort_values(["h", "k"]).drop_duplicates("h")
            out = firsts.assign(cnt=cnt.loc[firsts["h"]].to_numpy().astype(np.int64))
            return out[["h", "cnt", "k"]]
        out = df.groupby("h", sort=False).size().reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    partials = ds.map_batches(partial, batch_format="pandas").materialize()
    use_driver = combine == "driver" or (
        combine == "auto" and partials.count() <= driver_max_partial_rows
    )
    empty_cols = {"h": np.array([], np.int64), "k": np.array([], "U1")}
    if not use_driver:
        # Distributed combine WITHOUT a per-key Ray aggregate: 10M+
        # distinct n-gram keys make groupby(h).aggregate() pathological
        # (measured: >7min at 11.8M keys where this path takes seconds),
        # so shuffle on h % P (P Ray groups total, the minhash bucket
        # pattern) and let each bucket merge its own keys in pandas —
        # only the ≥min_count survivors (the broadcast dup table pass 2
        # needs anyway) ever leave the buckets.
        P = 64

        def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
            batch["_b"] = (batch["h"].to_numpy().view(np.uint64) % P).astype(np.int64)
            return batch

        def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
            cnt = g.groupby("h", sort=False)["cnt"].sum()
            out = cnt[cnt >= min_count].reset_index()
            if keep_first:
                firsts = (
                    g.sort_values(["h", "k"]).drop_duplicates("h").set_index("h")["k"]
                )
                out["k"] = firsts.loc[out["h"]].to_numpy()
            return out.drop(columns=["cnt"])

        surv = (
            partials.map_batches(add_bucket, batch_format="pandas")
            .groupby("_b")
            .map_groups(bucket_merge, batch_format="pandas")
        )
        parts = [
            b.to_pandas() for b in surv.iter_batches(batch_format="pyarrow") if len(b)
        ]
        merged = (
            pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame(empty_cols)
        )
    else:
        parts = [
            b.to_pandas() for b in partials.iter_batches(batch_format="pyarrow") if len(b)
        ]
        if parts:
            allp = pd.concat(parts, ignore_index=True)
            cnt = allp.groupby("h", sort=False)["cnt"].sum()
            agg = cnt[cnt >= min_count].reset_index()
            if keep_first:
                firsts = (
                    allp.sort_values(["h", "k"])
                    .drop_duplicates("h")
                    .set_index("h")["k"]
                )
                agg["k"] = firsts.loc[agg["h"]].to_numpy()
            merged = agg
        else:
            merged = pd.DataFrame(empty_cols)

    merged = merged.sort_values("h")
    dup_h = merged["h"].to_numpy().astype(np.int64)
    canon_k = merged["k"].to_numpy().astype("U") if keep_first else None
    dup_ref = ray.put((dup_h, canon_k))

    def rewrite(batch: pd.DataFrame) -> pa.Table:
        dset, canon = ray.get(dup_ref)
        trow, flat = _token_rows(batch[col])
        nb = len(batch)
        ntok = np.bincount(trow, minlength=nb).astype(np.int64)
        prow, ppos, h = ngram_occurrences(batch[col], n)
        h = h.view(np.int64)  # transport convention (see partial)
        cover = np.zeros(len(flat), bool)
        if len(h) and len(dset):
            idx = np.searchsorted(dset, h)
            idx[idx == len(dset)] = len(dset) - 1
            is_dup = dset[idx] == h
            if mode == "keep_first" and is_dup.any():
                ids = batch[id_col].to_numpy()[prow]
                occ_k = _occ_key(ids, ppos)
                is_dup &= occ_k != canon[idx]
            srow, spos = prow[is_dup], ppos[is_dup]
            if len(srow):
                # absolute flat index of each dup n-gram start: first
                # token of the row (trow is sorted) + in-row position
                first = np.searchsorted(trow, srow, side="left")
                starts = first + spos
                for j in range(n):
                    cover[starts + j] = True
        kept = ~cover
        kept_row = trow[kept]
        kept_flat = flat.filter(pa.array(kept)) if not kept.all() else flat
        import pyarrow.compute as pc

        counts = np.bincount(kept_row, minlength=nb).astype(np.int64)
        offsets = np.zeros(nb + 1, np.int64)
        np.cumsum(counts, out=offsets[1:])
        vals = (
            kept_flat.combine_chunks()
            if isinstance(kept_flat, pa.ChunkedArray)
            else kept_flat
        )
        lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), vals)
        joined = pc.binary_join(lists, " ")
        return pa.table(
            {
                id_col: pa.Array.from_pandas(batch[id_col]),
                col: joined,
                "n_tokens": pa.array(ntok),
                "n_removed_tokens": pa.array(ntok - counts),
            }
        )

    return ds.map_batches(rewrite, batch_format="pandas")


class MinHasher:
    """Per-batch shingle → minhash signature (k permutations via the classic
    (a*x + b) mod p universal hash family, seeded deterministically)."""

    def __init__(self, num_perm: int = 64, shingle: int = 4, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.shingle = shingle

    def shingle_hashes(self, text: str) -> np.ndarray:
        data = np.frombuffer(text.lower().encode("utf-8", "ignore"), dtype=np.uint8)
        k = self.shingle
        if len(data) < k:
            data = np.pad(data, (0, k - len(data)))
        # rolling k-byte windows → one 64-bit value each (vectorized)
        windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
        weights = np.uint64(257) ** np.arange(k, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return np.unique(windows @ weights)

    def signature(self, text: str) -> np.ndarray:
        """Scalar reference path (oracles/tests); the batch path below is
        the vectorized equivalent and must stay bit-identical to this."""
        sh = self.shingle_hashes(text)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1)

    def signatures(self, texts) -> np.ndarray:
        """(D, num_perm) signatures for a whole batch with ONE numpy pass
        (r02 verdict #7: the per-doc ``signature()`` loop was the last
        Python dispatch on the 100-TB text path). All texts' bytes are
        concatenated (short docs zero-padded to the shingle width, same
        as ``shingle_hashes``), every k-byte window is hashed at once,
        windows crossing document boundaries are masked out, the batch's
        UNIQUE shingle hashes go through the (a·x+b) mod p family once,
        and per-doc minima come from chunked ``np.minimum.reduceat``
        (chunks bound the (num_perm × windows) gather)."""
        k = self.shingle
        D = len(texts)
        if D == 0:
            return np.zeros((0, self.num_perm), np.uint64)
        bufs = []
        for t in texts:
            b = t.lower().encode("utf-8", "ignore")
            bufs.append(b if len(b) >= k else b.ljust(k, b"\0"))
        lens = np.fromiter((len(b) for b in bufs), np.int64, D)
        data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        counts = lens - k + 1  # windows per doc (≥ 1 after padding)
        if counts.mean() >= 96:
            # LONG docs: the per-doc path is cache-resident (each doc's
            # unique-shingle × num_perm mod array stays in L2) and measured
            # 3× faster than any batch-global variant; the batch path
            # below wins only when Python dispatch dominates (many tiny
            # docs — the 100-TB web-text shape). Both are bit-identical.
            return np.stack([self.signature(t) for t in texts])
        offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
        # valid window starts: offsets[d] .. offsets[d] + counts[d] - 1
        total = int(counts.sum())
        bounds = np.concatenate([[0], np.cumsum(counts)])
        starts = (
            np.arange(total, dtype=np.int64)
            - np.repeat(bounds[:-1], counts)
            + np.repeat(offsets, counts)
        )
        # all window hashes in O(bytes) u64 ops via prefix products:
        # h_i = Σ_j data[i+j]·257^j = (S[i+k] − S[i])·257^{-i}, everything
        # mod 2^64 (257 is odd ⇒ invertible) — BIT-IDENTICAL to the
        # windows @ weights matmul, without the (W, k) gather/astype
        N = len(data)
        with np.errstate(over="ignore"):
            pw = np.full(N, np.uint64(257))
            pw[0] = np.uint64(1)
            pw = np.cumprod(pw, dtype=np.uint64)
            S = np.empty(N + 1, np.uint64)
            S[0] = np.uint64(0)
            np.cumsum(data.astype(np.uint64) * pw, dtype=np.uint64, out=S[1:])
            ipw = np.full(N, _INV257)
            ipw[0] = np.uint64(1)
            ipw = np.cumprod(ipw, dtype=np.uint64)
            h = ((S[k:] - S[:-k]) * ipw[: N - k + 1])[starts]
            hu, inv = np.unique(h, return_inverse=True)
            # dedupe (doc, shingle) PAIRS — Zipfy text repeats shingles
            # within a doc, and duplicates cost num_perm multiplies each;
            # one u64 key sort replaces the old per-doc np.unique
            rowidx = np.repeat(np.arange(D, dtype=np.uint64), counts)
            pairs = np.unique((rowidx << np.uint64(32)) | inv.astype(np.uint64))
            rows = (pairs >> np.uint64(32)).astype(np.int64)
            cols = (pairs & np.uint64(0xFFFFFFFF)).astype(np.int64)
            pb = np.searchsorted(rows, np.arange(D + 1, dtype=np.int64))
            # ONE 1-D gather of the deduped hashes; the permuted values are
            # then computed CONTIGUOUSLY per chunk (a 2-D fancy-gather of a
            # (num_perm, U) matrix measured 3× slower than the mods it
            # saved — cache misses beat arithmetic)
            hseg = hu[cols]
        sig = np.empty((self.num_perm, D), np.uint64)
        max_w = max(1, 4_000_000 // self.num_perm)
        d0 = 0
        while d0 < D:
            d1 = d0 + 1
            while d1 < D and pb[d1 + 1] - pb[d0] <= max_w:
                d1 += 1
            with np.errstate(over="ignore"):
                seg = (
                    self.a[:, None] * hseg[None, pb[d0]:pb[d1]] + self.b[:, None]
                ) % np.uint64(_MERSENNE)
            sig[:, d0:d1] = np.minimum.reduceat(
                seg, (pb[d0:d1] - pb[d0]).astype(np.int64), axis=1
            )
            d0 = d1
        return np.ascontiguousarray(sig.T)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures([str(t) for t in batch["text"]])
        # bytes, not an object column of arrays: pandas->Arrow converts
        # bytes to native binary, while ndarray elements get PICKLED per
        # row by every shuffle that touches the block (measured: the LSH
        # groupby sort went 23.6s -> sub-second at 80k band rows)
        batch["_minhash"] = [s.tobytes() for s in sigs]
        return batch


def minhash_lsh_candidates(
    ds,
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle: int = 4,
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.8,
    concurrency: int | tuple[int, int] = 4,
    max_bucket: int = 4096,
):
    """documents → near-duplicate pairs (id_a < id_b, est_jaccard).

    shingle→minhash per batch (actor pool) → explode to band rows →
    groupby(band_id, band_hash) → pairs within each bucket verified by
    minhash-estimated Jaccard. Pairs may appear in several bands — they are
    deduped by the final groupby over (id_a, id_b).

    Skew guard: a degenerate band bucket larger than ``max_bucket`` is
    skipped rather than verified O(bucket²) (same reasoning as
    phash_near_dup) — bounds the worst reducer group at scale.
    """
    rows_per_band = num_perm // bands

    hasher_args = dict(num_perm=num_perm, shingle=shingle)
    num_partitions = 64  # co-location granularity for the bucket shuffle

    def explode_bands(batch: pd.DataFrame) -> pd.DataFrame:
        raw = batch["_minhash"].tolist()
        sigs = np.frombuffer(b"".join(raw), dtype=np.uint64).reshape(len(batch), -1)
        n = len(batch)
        banded = sigs.reshape(n, bands, rows_per_band)
        # hash each band to one value
        with np.errstate(over="ignore"):
            w = np.uint64(1099511628211) ** np.arange(rows_per_band, dtype=np.uint64)
            bh = (banded * w[None, None, :]).sum(axis=2)
        bh_flat = bh.T.reshape(-1).astype(np.int64)
        band_ids = np.repeat(np.arange(bands), n)
        return pd.DataFrame(
            {
                # co-group by partition, NOT per bucket: tens of thousands
                # of tiny map_groups calls were the hot cost; ~64 partition
                # groups each process all their buckets vectorized
                "pkey": (bh_flat.view(np.uint64) ^ band_ids.view(np.uint64))
                % np.uint64(num_partitions),
                "band_id": band_ids,
                "band_hash": bh_flat,
                id_col: np.tile(batch[id_col].to_numpy(), bands),
                "_minhash": raw * bands,
            }
        )

    def pairs_in_partition(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype=group[id_col].dtype),
                "id_b": pd.Series(dtype=group[id_col].dtype),
                "est_jaccard": pd.Series(dtype=float),
            }
        )
        if len(group) < 2:
            return empty
        g = group.sort_values(["band_id", "band_hash", id_col], kind="mergesort")
        b = g["band_id"].to_numpy()
        hsh = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        # run boundaries over the sorted (band_id, band_hash) keys
        new_run = np.empty(len(g), dtype=bool)
        new_run[0] = True
        new_run[1:] = (b[1:] != b[:-1]) | (hsh[1:] != hsh[:-1])
        starts = np.nonzero(new_run)[0]
        ends = np.append(starts[1:], len(g))
        ia_parts, ib_parts, band_parts = [], [], []
        for s, e in zip(starts, ends):  # only non-trivial buckets do work
            length = e - s
            if length < 2 or length > max_bucket:
                continue
            iu, ju = _all_pair_indices(length)
            ia_parts.append(s + iu)
            ib_parts.append(s + ju)
            band_parts.append(np.full(len(iu), b[s], dtype=np.int64))
        if not ia_parts:
            return empty
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        band_of = np.concatenate(band_parts)
        sigs = np.frombuffer(b"".join(g["_minhash"].tolist()), dtype=np.uint64).reshape(len(g), -1)
        est = (sigs[ia] == sigs[ib]).mean(axis=1)  # one vectorized verify
        hit = est >= jaccard_threshold
        if not hit.any():
            return empty
        ia, ib, band_of, est = ia[hit], ib[hit], band_of[hit], est[hit]
        # canonical-band dedup (ZERO shuffle — the same trick as the spatial
        # join's canonical cell): a pair colliding in several bands is kept
        # only in the FIRST band whose hashes agree; that band's bucket is
        # guaranteed to contain and emit it. (If the canonical bucket was
        # skew-capped, the pair is dropped — the cap's documented loss.)
        with np.errstate(over="ignore"):
            w = np.uint64(1099511628211) ** np.arange(rows_per_band, dtype=np.uint64)
            bh_a = (sigs[ia].reshape(-1, bands, rows_per_band) * w).sum(axis=2)
            bh_b = (sigs[ib].reshape(-1, bands, rows_per_band) * w).sum(axis=2)
        first_eq = (bh_a == bh_b).argmax(axis=1)  # first band with equal hash
        keep = first_eq == band_of
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "est_jaccard": est[keep],
            }
        )

    sigged = ds.map_batches(
        MinHasher, fn_constructor_kwargs=hasher_args, batch_format="pandas",
        concurrency=concurrency,
    )
    banded = sigged.map_batches(explode_bands, batch_format="pandas")
    return banded.groupby("pkey").map_groups(
        pairs_in_partition, batch_format="pandas"
    )


class SimHasher:
    """64-bit simhash from token hashes (majority vote per bit).

    Vectorized per batch: each distinct token across the batch is hashed
    ONCE (blake2b over the batch vocabulary — typically 10-100× smaller
    than the token stream), its ±1 bit-sign row looked up for every
    (doc, token) occurrence, and the per-doc majority computed as one
    ``np.add.at`` segment sum. Semantics identical to the per-doc scalar
    definition (unique tokens of lowercase ``\\w+``; bit set iff vote > 0),
    which is what tools/oracles.py re-implements naively as the test
    oracle."""

    def __init__(self, seed: int = 42):
        import re

        self.token_re = re.compile(r"\w+")
        self.seed = seed

    def simhash(self, text: str) -> np.int64:
        """Scalar reference definition (the batched __call__ must agree)."""
        import hashlib

        toks = set(self.token_re.findall(text.lower()))
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for t in toks:
            h = np.uint64(
                int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
            )
            acc += np.where(((h >> shifts) & np.uint64(1)) == 1, 1, -1)
        weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
        v = int(((acc > 0).astype(np.uint64) * weights).sum())
        return np.int64(v - (1 << 64)) if v >= (1 << 63) else np.int64(v)

    def _vocab_signs(self, vocab: list[str]) -> np.ndarray:
        """(V, 64) matrix of ±1 bit votes, one row per token."""
        import hashlib

        h = np.empty(len(vocab), dtype=np.uint64)
        for i, t in enumerate(vocab):
            h[i] = int.from_bytes(
                hashlib.blake2b(t.encode(), digest_size=8).digest(), "big"
            )
        shifts = np.arange(64, dtype=np.uint64)
        bits = (h[:, None] >> shifts[None, :]) & np.uint64(1)
        return np.where(bits == 1, 1, -1).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        doc_tokens = [
            sorted(set(self.token_re.findall(str(t).lower())))
            for t in batch["text"]
        ]
        vocab = sorted({t for toks in doc_tokens for t in toks})
        index = {t: i for i, t in enumerate(vocab)}
        signs = self._vocab_signs(vocab)  # (V, 64)
        n = len(batch)
        acc = np.zeros((n, 64), dtype=np.int64)
        doc_ids = np.concatenate(
            [np.full(len(toks), d, dtype=np.int64) for d, toks in enumerate(doc_tokens)]
        ) if doc_tokens else np.empty(0, np.int64)
        tok_ids = np.fromiter(
            (index[t] for toks in doc_tokens for t in toks),
            dtype=np.int64,
            count=int(doc_ids.shape[0]),
        )
        np.add.at(acc, doc_ids, signs[tok_ids])
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
        sim = ((acc > 0).astype(np.uint64) * weights[None, :]).sum(axis=1)
        batch["simhash"] = sim.view(np.int64)
        return batch


def ngram_jaccard(a: str, b: str, n: int = 4) -> float:
    """Exact character n-gram Jaccard (verification oracle for near-dup)."""
    sa = {a[i : i + n] for i in range(max(1, len(a) - n + 1))}
    sb = {b[i : i + n] for i in range(max(1, len(b) - n + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def ngram_jaccard_near_dup(
    docs_ds,
    *,
    n: int = 4,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    est_margin: float = 0.2,
    concurrency: int | tuple[int, int] = 4,
    max_bucket: int = 4096,
):
    """documents → near-dup pairs by EXACT n-gram Jaccard (id_a < id_b).

    Scale shape: MinHash-LSH banding proposes candidates with HIGH recall
    (16 bands × 4 rows: S-curve threshold ≈ 0.5, so a true-0.8 pair is
    missed with probability (1-0.8⁴)¹⁶ ≈ 2·10⁻⁴), and the
    signature-estimate gate at ``threshold - est_margin`` does the
    pruning: bucket pairs alone would admit 1.27M of sf0.1's 12.5M
    possible pairs (ordinary text shares many 4-byte shingles), the gate
    keeps 262. Both the banding and the gate are part of the operator's
    definition (replicated verbatim by the oracle).

    The texts the verify needs are gathered with ONE streaming ``is_in``
    filter pass over the corpus (vectorized, zero shuffle — the
    candidate-id set is broadcast once via ``ray.put``); their shingle
    sets are computed ONCE per document and broadcast to the verify
    stage, which computes true shingle-set Jaccard per candidate pair —
    verify work and memory scale with CANDIDATES, never corpus². The
    shingle universe is the one the MinHash signatures sample (lowercased
    utf-8 byte n-grams → u64 rolling hash; MinHasher.shingle_hashes).

    Documented assumption (same as near_dup_filter / connected
    components): the candidate pair list and the shingle sets it
    references are a small fraction of the corpus — they pass through the
    driver and a broadcast. Degenerate corpora where LSH buckets capture
    most of the data violate it; ``max_bucket`` bounds that failure mode.
    """
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    cand = minhash_lsh_candidates(
        docs_ds,
        num_perm=num_perm,
        bands=bands,
        shingle=n,
        id_col=id_col,
        jaccard_threshold=max(0.0, threshold - est_margin),
        concurrency=concurrency,
        max_bucket=max_bucket,
    ).drop_columns(["est_jaccard"])
    parts = []
    for r in cand.to_arrow_refs():
        t = ray.get(r)
        if not isinstance(t, pa.Table):  # map_groups emits pandas blocks
            t = pa.Table.from_pandas(t, preserve_index=False)
        # hash-aggregate outputs can include EMPTY blocks with empty
        # schemas (NOTES.md) — drop them before concat
        if t.num_rows and {"id_a", "id_b"} <= set(t.column_names):
            parts.append(t.select(["id_a", "id_b"]))
    if not parts:
        probe = docs_ds.limit(1).to_pandas()
        id_type = pa.array(probe[id_col]).type if len(probe) else pa.int64()
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], id_type),
                    "id_b": pa.array([], id_type),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    cand_tbl = pa.concat_tables(parts, promote_options="default")
    need = pc.unique(
        pa.chunked_array(
            [cand_tbl["id_a"].combine_chunks(), cand_tbl["id_b"].combine_chunks()]
        )
    )
    need_ref = ray.put(need)

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch[id_col], value_set=ray.get(need_ref)))

    texts_tbl = pa.concat_tables(
        [
            ray.get(r)
            for r in docs_ds.select_columns([id_col, "text"])
            .map_batches(pick, batch_format="pyarrow")
            .to_arrow_refs()
        ],
        promote_options="default",
    )
    hasher = MinHasher(num_perm=1, shingle=n)
    # shingle ONCE per needed doc (a doc in k candidate pairs would
    # otherwise be re-shingled k times in the verify)
    shingles_ref = ray.put(
        {
            i: hasher.shingle_hashes(str(t))  # sorted unique u64 shingles
            for i, t in zip(texts_tbl[id_col].to_pylist(), texts_tbl["text"].to_pylist())
        }
    )

    def verify(batch: pa.Table) -> pa.Table:
        sh_of = ray.get(shingles_ref)
        ida = batch["id_a"].to_pylist()
        idb = batch["id_b"].to_pylist()
        jac = np.empty(len(ida), dtype=np.float64)
        for i, (a, b) in enumerate(zip(ida, idb)):
            sa, sb = sh_of[a], sh_of[b]
            inter = np.intersect1d(sa, sb, assume_unique=True).shape[0]
            union = sa.shape[0] + sb.shape[0] - inter
            jac[i] = inter / union if union else 1.0
        keep = jac >= threshold
        return pa.table(
            {
                "id_a": batch["id_a"].filter(pa.array(keep)),
                "id_b": batch["id_b"].filter(pa.array(keep)),
                "jaccard": pa.array(jac[keep], pa.float64()),
            }
        )

    return rd.from_arrow(cand_tbl).map_batches(verify, batch_format="pyarrow")


def _group_min_pairs(node_vals, lbl_vals):
    """Per-node lexicographic min of labels, vectorized for ANY id dtype:
    sorted-factorize both columns to integer codes (code order == value
    order), then one argsort + ``np.minimum.reduceat``. pandas'
    ``groupby()["lbl"].min()`` on object strings falls back to per-group
    Python min — measured 8.8s on 200k rows vs ~40ms for this path."""
    allv = np.concatenate([np.asarray(node_vals), np.asarray(lbl_vals)])
    codes, uniq = pd.factorize(allv, sort=True)
    n = len(node_vals)
    nc, lc = codes[:n], codes[n:]
    order = np.argsort(nc, kind="stable")
    snc, slc = nc[order], lc[order]
    starts = np.flatnonzero(np.r_[True, snc[1:] != snc[:-1]])
    mins = np.minimum.reduceat(slc, starts) if len(slc) else slc[:0]
    uniq = np.asarray(uniq)
    return uniq[snc[starts]], uniq[mins]


def _shard_of(vals: np.ndarray, nshards: int) -> np.ndarray:
    """Owner shard per id — stable siphash of the value, NOT of the
    position. One CC run sees one id dtype end-to-end (both edge columns
    are cast to the common arrow type), so the dtype-sensitivity of
    pandas hashing cannot split a key across shards."""
    return (pd.util.hash_array(np.asarray(vals)) % np.uint64(nshards)).astype(
        np.int64
    )


class _LabelShard:
    """One hash-shard of the distributed label table: ``node → lbl`` for
    the nodes this shard owns, folded monotonically (labels only ever
    decrease). Plain class wrapped with ``ray.remote`` at use — a shared
    MUTABLE index is the one shape the Dataset API can't express, so this
    is a deliberate raw-actor drop-down (task brief: "raw Ray tasks /
    actors only where the Dataset API genuinely can't express the
    semantics (e.g. a shared mutable index)")."""

    def __init__(self, id_type_schema: "pa.Schema"):
        self._schema = id_type_schema  # (node, lbl) arrow schema
        self._idx = pd.Index([])       # owned nodes (unique)
        self._lbl: np.ndarray | None = None

    def update_min(self, nodes: np.ndarray, cand: np.ndarray) -> int:
        """Fold (node, candidate-label) partials: existing nodes take
        ``min(lbl, cand)``; unseen nodes insert as ``min(node, cand)``
        (preserving the invariant lbl(x) ≤ x). Returns #changed —
        the convergence signal. Actor calls serialize, so concurrent
        edge-block folds interleave safely (min is commutative)."""
        changed = 0
        if self._lbl is None:
            self._lbl = np.empty(0, dtype=np.asarray(nodes).dtype)
        pos = self._idx.get_indexer(nodes)
        hit = pos >= 0
        if hit.any():
            p = pos[hit]
            c = cand[hit]
            upd = c < self._lbl[p]
            if upd.any():
                self._lbl[p[upd]] = c[upd]
                changed += int(upd.sum())
        miss = ~hit
        if miss.any():
            self._idx = self._idx.append(pd.Index(nodes[miss]))
            self._lbl = np.concatenate(
                [self._lbl, np.minimum(nodes[miss], cand[miss])]
            )
            changed += int(miss.sum())
        return changed

    def lookup(self, keys: np.ndarray) -> np.ndarray:
        """Current label per key; unknown keys resolve to THEMSELVES
        (identity is a sound upper bound under lbl(x) ≤ x), which makes
        the very first propagation round double as initialization."""
        if self._lbl is None or len(self._idx) == 0:
            return np.asarray(keys).copy()
        pos = self._idx.get_indexer(keys)
        out = self._lbl[np.clip(pos, 0, None)]
        missing = pos < 0
        if missing.any():
            out = out.copy()
            out[missing] = np.asarray(keys)[missing]
        return out

    def distinct_labels(self) -> np.ndarray:
        if self._lbl is None:
            return np.empty(0, dtype=object)
        return np.unique(self._lbl)

    def remap(self, vals: np.ndarray, resolved: np.ndarray) -> int:
        """Pointer-jump step: rewrite lbl ← resolved[lbl] where that
        decreases it (``vals``/``resolved`` = this shard's distinct labels
        and their CURRENT labels at the owning shards). Returns #changed."""
        if self._lbl is None or len(vals) == 0:
            return 0
        pos = pd.Index(vals).get_indexer(self._lbl)
        new = resolved[np.clip(pos, 0, None)]
        upd = (pos >= 0) & (new < self._lbl)
        if upd.any():
            self._lbl[upd] = new[upd]
        return int(upd.sum())

    def snapshot(self) -> "pa.Table":
        if self._lbl is None:
            return self._schema.empty_table()
        return pa.table(
            {"node": pa.array(self._idx.to_numpy()),
             "lbl": pa.array(self._lbl)}
        ).cast(self._schema)

    def stats(self) -> dict:
        """Shard residency: owned rows + measured bytes (index deep +
        label array) — the number the 10^8-label shard-count math needs
        (tools/stress_cc.py records bytes/label from this)."""
        if self._lbl is None:
            return {"rows": 0, "bytes": 0}
        return {
            "rows": int(len(self._idx)),
            "bytes": int(self._idx.memory_usage(deep=True))
            + int(self._lbl.nbytes),
        }


def _cc_sharded(edges, lbl_schema, max_rounds: int, shards: int,
                stats_out: "dict | None" = None):
    """Distributed min-label propagation with a HASH-SHARDED label table
    (r03 verdict #1): the label state lives in ``shards`` Ray actors keyed
    by ``hash(node) % shards`` — no corpus-proportional driver or
    broadcast structure anywhere. Each round is ONE streaming map over the
    (materialized) edge set: every block looks up lbl(nbr) at the owning
    shards, pre-mins per node locally (the same ``_group_min_pairs``
    combiner as the broadcast path), and folds the partials into the
    owning shards; between rounds the driver coordinates cross-shard
    pointer jumping over the shards' DISTINCT label values only (messages
    are O(distinct labels), never O(nodes)). Converged when a full edge
    pass plus a jump pass change nothing — labels decrease monotonically,
    so a zero-change round is a true fixpoint.

    Driver residency: O(1) per round (changed counters). The final
    snapshot is re-owned one shard at a time (peak = one shard's table),
    so ``shards`` is the knob that bounds both actor heap and the
    transient driver peak — at 10⁹ labels, 64 shards ≈ 16M rows each."""
    import ray
    import ray.data as rd

    Shard = ray.remote(num_cpus=0)(_LabelShard)
    handles = [Shard.remote(lbl_schema) for _ in range(shards)]
    nsh = shards

    def propagate(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        nbr = batch["nbr"].to_numpy(zero_copy_only=False)
        if len(node) == 0:
            return pa.table({"changed": pa.array([0], pa.int64())})
        own = _shard_of(nbr, nsh)
        lbl_nbr = np.empty(len(nbr), dtype=nbr.dtype)
        futs = []
        for k in range(nsh):
            m = own == k
            if m.any():
                futs.append((m, handles[k].lookup.remote(nbr[m])))
        for m, f in futs:
            lbl_nbr[m] = ray.get(f)
        nodes, mins = _group_min_pairs(node, lbl_nbr)
        o2 = _shard_of(nodes, nsh)
        upd = []
        for k in range(nsh):
            m = o2 == k
            if m.any():
                upd.append(handles[k].update_min.remote(nodes[m], mins[m]))
        changed = int(sum(ray.get(upd)))
        return pa.table({"changed": pa.array([changed], pa.int64())})

    def jump_round() -> int:
        uniqs = ray.get([h.distinct_labels.remote() for h in handles])
        remaps = []
        for h, uq in zip(handles, uniqs):
            if len(uq) == 0:
                remaps.append(None)
                continue
            own = _shard_of(uq, nsh)
            res = np.empty(len(uq), dtype=uq.dtype)
            futs = [
                (own == k, handles[k].lookup.remote(uq[own == k]))
                for k in range(nsh)
                if (own == k).any()
            ]
            for m, f in futs:
                res[m] = ray.get(f)
            remaps.append(h.remap.remote(uq, res))
        return int(sum(ray.get(r) for r in remaps if r is not None))

    for rnd in range(max_rounds):
        moved = int(
            edges.map_batches(propagate, batch_format="pyarrow").sum("changed")
            or 0
        )
        # collapse label chains before the next edge pass — and AFTER the
        # last one, so the snapshot is root-resolved
        jumped = jump_round()
        while jumped:
            jumped = jump_round()
        if moved == 0:
            break
    else:
        raise ValueError(
            f"connected_components(sharded) did not converge in {max_rounds}"
            " rounds; raise max_rounds (wrong labels are never returned"
            " silently)"
        )

    # re-own snapshots one shard at a time: actor-owned refs die with the
    # actor, and bulk ray.get would recreate the driver table we removed
    if stats_out is not None:
        stats_out["shards"] = ray.get([h.stats.remote() for h in handles])
    refs = []
    for h in handles:
        refs.append(ray.put(ray.get(h.snapshot.remote())))
    del handles
    return rd.from_arrow_refs(refs).map_batches(
        lambda b: b.rename_columns(["node", "component"]),
        batch_format="pyarrow",
    )


def connected_components(
    pairs_ds, id_cols=("id_a", "id_b"), max_rounds: int = 40,
    max_label_rows: int = 50_000_000, combine: str = "auto", shards: int = 8,
    stats_out: "dict | None" = None,
):
    """Cluster near-dup pairs into components via iterative min-label
    propagation — each round is one groupby (label = min over neighbors),
    converging in O(diameter) rounds; no driver-side union-find, so it
    scales to candidate graphs that don't fit one machine.

    Input: Dataset of (id_a, id_b) edges. Output: (node, component) where
    component = min node id in the component.

    Two label-table strategies, selected by ``combine``:

    - ``"broadcast"`` (the fast small-graph path): the label table —
      distinct nodes appearing in candidate PAIRS, a small fraction of
      the corpus — is re-pinned on the driver each round and broadcast
      (``ray.put`` once, read per task); each round streams ONE
      distributed map over the edge set — no shuffle join, no distributed
      groupby. Guarded by ``max_label_rows`` (raises when exceeded).
    - ``"sharded"`` (the 100-TB path, r03 verdict #1): the label table is
      hash-partitioned across ``shards`` Ray actors; see
      :func:`_cc_sharded`. No corpus-proportional driver/broadcast
      structure — the guard becomes a strategy switch, not a stop sign.
    - ``"auto"`` (default): collect initial per-block label partials with
      incremental compaction; the moment the compacted table exceeds
      ``max_label_rows``, abandon the driver table and run sharded.
    """
    import pyarrow as pa

    a, b = id_cols

    def to_edges(batch: pa.Table) -> pa.Table:
        # undirected: emit both directions
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [batch[a].combine_chunks() if isinstance(batch[a], pa.ChunkedArray) else batch[a],
                     batch[b].combine_chunks() if isinstance(batch[b], pa.ChunkedArray) else batch[b]]
                ),
                "nbr": pa.concat_arrays(
                    [batch[b].combine_chunks() if isinstance(batch[b], pa.ChunkedArray) else batch[b],
                     batch[a].combine_chunks() if isinstance(batch[a], pa.ChunkedArray) else batch[a]]
                ),
            }
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow").materialize()
    id_type = edges.schema().base_schema.field("node").type
    lbl_schema = pa.schema([("node", id_type), ("lbl", id_type)])

    def _norm(batch: pa.Table, schema: pa.Schema, rename=None) -> pa.Table:
        # hash aggregates emit EMPTY blocks with an empty schema; every
        # stage re-normalizes so the next join sees one stable schema
        if batch.num_rows == 0 or batch.num_columns == 0:
            return schema.empty_table()
        if rename:
            batch = batch.rename_columns(
                [rename.get(c, c) for c in batch.column_names]
            )
        return batch.select(schema.names).cast(schema)

    import ray.data as rd

    # label(node) = min(node, min over nbrs); the label table is
    # driver-small by the documented assumption, so compute it as
    # per-block pandas partials + ONE driver merge instead of a Ray
    # sort-shuffle groupby (which cost 20s on 200k string keys — pure
    # fixed overhead at this table size)
    def initial_partial(batch: pa.Table) -> pa.Table:
        nodes, mins = _group_min_pairs(
            batch["node"].to_numpy(zero_copy_only=False),
            batch["nbr"].to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {"node": pa.array(nodes), "lbl": pa.array(mins)}
        ).cast(lbl_schema)

    if combine == "sharded":
        return _cc_sharded(edges, lbl_schema, max_rounds, shards,
                           stats_out=stats_out)
    if combine not in ("auto", "broadcast"):
        raise ValueError(f"unknown combine={combine!r}")

    # bounded init collection: compact (group-min) whenever the raw
    # buffered rows exceed the cap, so the driver never holds more than
    # ~2× max_label_rows even on a graph that ultimately goes sharded
    pending, raw, spilled = [], 0, False
    for b in edges.map_batches(
        initial_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        b = _norm(b, lbl_schema)
        if not b.num_rows:
            continue
        pending.append(b)
        raw += b.num_rows
        if raw > max_label_rows:
            t = pa.concat_tables(pending)
            n_c, m_c = _group_min_pairs(
                t["node"].to_numpy(zero_copy_only=False),
                t["lbl"].to_numpy(zero_copy_only=False),
            )
            t = pa.table(
                {"node": pa.array(n_c), "lbl": pa.array(m_c)}
            ).cast(lbl_schema)
            pending, raw = [t], t.num_rows
            if t.num_rows > max_label_rows:
                spilled = True
                break
    if spilled:
        if combine == "auto":
            return _cc_sharded(edges, lbl_schema, max_rounds, shards,
                           stats_out=stats_out)
        raise ValueError(
            f"label table exceeds max_label_rows={max_label_rows}; "
            "use combine='sharded' (or 'auto') to cluster without a "
            "driver-resident label table"
        )
    init = pa.concat_tables(pending or [lbl_schema.empty_table()])
    nodes0, mins0 = _group_min_pairs(
        init["node"].to_numpy(zero_copy_only=False),
        init["lbl"].to_numpy(zero_copy_only=False),
    )
    labels_tbl = pa.table(
        {"node": pa.array(nodes0), "lbl": pa.array(np.minimum(nodes0, mins0))}
    ).cast(lbl_schema)

    def _canon_sorted(t: pa.Table) -> pa.Table:
        return t.sort_by([("node", "ascending")])

    def _compress(t: pa.Table) -> pa.Table:
        """Driver-side pointer jumping: lbl ← lbl(lbl) to fixpoint.

        Every hop can only DECREASE the label in value order (invariant
        lbl(x) ≤ x), so following each label chain to its root is always
        sound. On the monotone label trees real dup graphs produce (the
        sf0.01 phash fixture has a 4073-node component) this collapses
        thousands of neighbor rounds into a handful; an adversarial
        flat-tree-with-far-min topology still needs O(n) rounds, which
        the max_rounds guard converts to an explicit error instead of
        silently wrong labels. Pure vectorized gathers over the
        (driver-small, per the documented assumption) label table."""
        if t.num_rows == 0:
            return t
        node = t["node"].to_pandas()
        lbl = t["lbl"].to_pandas()
        allv = pd.concat([node, lbl], ignore_index=True)
        codes, uniq = pd.factorize(allv)
        n = len(node)
        ncode, lcode = codes[:n], codes[n:]
        parent = np.arange(len(uniq), dtype=np.int64)
        parent[ncode] = lcode
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        new_lbl = uniq.take(parent[ncode])
        return pa.table(
            {"node": t["node"],
             "lbl": pa.array(new_lbl).cast(t.schema.field("lbl").type)}
        )

    import ray

    labels_tbl = _compress(labels_tbl)
    prev = _canon_sorted(labels_tbl)
    for _ in range(max_rounds):
        # Propagation round WITHOUT a shuffle join: the label table is
        # driver-small (guarded above), so broadcast it once via ray.put
        # and let every edge block gather lbl(nbr) with C-hash lookups,
        # pre-minning per node locally. The only distributed work is one
        # streaming map over the edges; the driver merges per-block
        # (node, lbl) partials — bounded by min(#edges, #nodes × #blocks),
        # the same driver-residency assumption the table itself obeys.
        # (The previous edges.join(labels) round was 10-20× slower: a
        # full hash-shuffle of the edge set per round, measured 58s vs
        # 3s for 100k planted pairs at 1M rows.)
        node_idx = pd.Index(labels_tbl["node"].to_pandas())
        lbl_vals = labels_tbl["lbl"].to_pandas().to_numpy()
        ref = ray.put((node_idx, lbl_vals))

        def propagate(batch: pa.Table) -> pa.Table:
            idx, lv = ray.get(ref)
            nbr = batch["nbr"].to_pandas()
            cand = lv[idx.get_indexer(nbr)]
            nodes, mins = _group_min_pairs(
                batch["node"].to_numpy(zero_copy_only=False), cand
            )
            return pa.table(
                {"node": pa.array(nodes), "lbl": pa.array(mins)}
            ).cast(lbl_schema)

        parts = [
            _norm(b, lbl_schema)
            for b in edges.map_batches(
                propagate, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow", batch_size=None)
            if b.num_rows
        ]
        merged = pa.concat_tables(
            [labels_tbl, *parts] or [lbl_schema.empty_table()]
        )
        nodes1, mins1 = _group_min_pairs(
            merged["node"].to_numpy(zero_copy_only=False),
            merged["lbl"].to_numpy(zero_copy_only=False),
        )
        labels_tbl = _compress(
            pa.table(
                {"node": pa.array(nodes1), "lbl": pa.array(mins1)}
            ).cast(lbl_schema)
        )
        # vectorized convergence check: sorted tables equal ⇔ fixpoint
        cur = _canon_sorted(labels_tbl)
        if cur.num_rows == prev.num_rows and cur.equals(prev):
            break
        prev = cur
    else:
        raise ValueError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "raise max_rounds (wrong labels are never returned silently)"
        )

    return rd.from_arrow(labels_tbl.rename_columns(["node", "component"]))


def near_dup_filter(docs_ds, pairs_ds, id_col: str = "doc_id"):
    """End-to-end near-dup removal: candidate pairs → connected components
    → drop every non-canonical member (keep component = min id), filtering
    the corpus with one broadcast membership test.

    The drop set is the non-canonical candidate nodes — a small fraction of
    the corpus — shipped once via ray.put and read per task; the corpus
    itself streams through a vectorized map_batches filter (no shuffle)."""
    import pyarrow.compute as pc
    import ray

    labels = connected_components(pairs_ds, id_cols=("id_a", "id_b"))
    lbl = labels.to_arrow_refs()
    tbl = pa.concat_tables([ray.get(r) for r in lbl])
    drop = tbl.filter(
        pc.invert(pc.equal(tbl["node"], tbl["component"]))
    )["node"]
    drop_ref = ray.put(drop.combine_chunks() if isinstance(drop, pa.ChunkedArray) else drop)

    def keep(batch: pa.Table) -> pa.Table:
        d = ray.get(drop_ref)
        mask = pc.invert(pc.is_in(batch[id_col], value_set=d))
        return batch.filter(mask)

    return docs_ds.map_batches(keep, batch_format="pyarrow")


def simhash_near_dup(
    ds, max_hamming: int = 6, id_col: str = "doc_id", concurrency: int | tuple = 4,
):
    """Document near-dup via simhash hamming-LSH (same banding machinery as
    phash_near_dup, over the 64-bit simhash column computed per batch)."""
    sigged = ds.map_batches(SimHasher, batch_format="pandas", concurrency=concurrency)
    return phash_near_dup(
        sigged, max_hamming=max_hamming, id_col=id_col, hash_col="simhash",
        n_bands=max_hamming + 2,
    )


def _band_layout(n_bands: int) -> list[tuple[int, int]]:
    """Split 64 bits into ``n_bands`` near-equal (shift, width) bands."""
    base, extra = divmod(64, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    out, shift = [], 0
    for w in widths:
        out.append((shift, w))
        shift += w
    return out


def phash_near_dup(
    ds, max_hamming: int = 4, id_col: str = "image_id", max_bucket: int = 4096,
    hash_col: str = "phash", n_bands: int = 6,
):
    """Image near-dup via phash hamming-LSH: band the 64 bits into
    ``n_bands`` near-equal bands. Pigeonhole: any pair within hamming ≤
    n_bands-1 shares at least one identical band, so with the default 6
    bands the candidate set provably contains every true pair for
    max_hamming ≤ 5 — the output is EXACT, which is what lets the driver
    compare it against a brute-force SQL oracle. Band WIDTH is the
    recall/cost dial: wider bands (fewer, e.g. 6×~11 bits) keep buckets
    ~2^11 deep per band value instead of 2^8, an ~8× candidate-pair
    reduction at 100k+ rows.

    Skew guard: a band bucket larger than ``max_bucket`` (a degenerate
    band value — e.g. the all-zeros band of flat images) is SKIPPED rather
    than verified O(n²); such images still pair up via their other bands
    unless all are degenerate. This bounds the worst group cost at scale,
    the same reasoning as hot-cell refinement (SURVEY.md §4)."""
    from ..imaging.phash import hamming64

    assert n_bands > max_hamming, "recall guarantee needs n_bands > max_hamming"
    layout = _band_layout(n_bands)
    num_partitions = 64

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        ph = batch[hash_col].to_numpy().astype(np.int64).view(np.uint64)
        out = []
        for band, (shift, width) in enumerate(layout):
            band_mask = np.uint64((1 << width) - 1)
            bh = ((ph >> np.uint64(shift)) & band_mask).astype(np.int64)
            out.append(
                pd.DataFrame(
                    {
                        # partition co-grouping, not per-bucket grouping —
                        # see minhash_lsh_candidates
                        "pkey": (
                            bh.view(np.uint64) * np.uint64(1099511628211)
                            ^ np.uint64(band)
                        )
                        % np.uint64(num_partitions),
                        "band_id": band,
                        "band_hash": bh,
                        id_col: batch[id_col].to_numpy(),
                        "phash": batch[hash_col].to_numpy(),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    def pairs_in_partition(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype=object),
                "id_b": pd.Series(dtype=object),
                "hamming": pd.Series(dtype=np.int64),
            }
        )
        if len(group) < 2:
            return empty
        g = group.sort_values(["band_id", "band_hash", id_col], kind="mergesort")
        b = g["band_id"].to_numpy()
        hsh = g["band_hash"].to_numpy()
        ids = g[id_col].to_numpy()
        ph = g["phash"].to_numpy().astype(np.int64)
        new_run = np.empty(len(g), dtype=bool)
        new_run[0] = True
        new_run[1:] = (b[1:] != b[:-1]) | (hsh[1:] != hsh[:-1])
        starts = np.nonzero(new_run)[0]
        ends = np.append(starts[1:], len(g))
        ia_parts, ib_parts, band_parts = [], [], []
        for s, e in zip(starts, ends):  # only non-trivial buckets do work
            length = e - s
            if length < 2 or length > max_bucket:
                continue
            iu, ju = _all_pair_indices(length)
            ia_parts.append(s + iu)
            ib_parts.append(s + ju)
            band_parts.append(np.full(len(iu), b[s], dtype=np.int64))
        if not ia_parts:
            return empty
        ia = np.concatenate(ia_parts)
        ib = np.concatenate(ib_parts)
        band_of = np.concatenate(band_parts)
        d = hamming64(ph[ia], ph[ib])  # one vectorized verify pass
        hit = d <= max_hamming
        if not hit.any():
            return empty
        ia, ib, band_of, d = ia[hit], ib[hit], band_of[hit], d[hit]
        # canonical-band dedup (ZERO shuffle): keep a pair only in the first
        # band where both hashes' band values agree — that band's bucket is
        # guaranteed to contain and emit it, so exactly one copy survives.
        # (A cross-pair hash-aggregate dedup here took minutes at 6M pairs.)
        pa_ = ph[ia].view(np.uint64)
        pb_ = ph[ib].view(np.uint64)
        eq = np.empty((len(ia), len(layout)), dtype=bool)
        for j, (shift, width) in enumerate(layout):
            mask = np.uint64((1 << width) - 1)
            eq[:, j] = ((pa_ >> np.uint64(shift)) & mask) == (
                (pb_ >> np.uint64(shift)) & mask
            )
        keep = eq.argmax(axis=1) == band_of
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "hamming": d[keep].astype(np.int64),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("pkey")
        .map_groups(pairs_in_partition, batch_format="pandas")
    )


def incremental_dedup(new_ds, prior_ds, col: str = "text", id_col: str = "doc_id"):
    """Filter NEW rows whose content already exists in a PRIOR corpus —
    the incremental-ingestion dedup (today's crawl vs everything shipped).

    The prior side is reduced to its distinct 64-bit content hashes by a
    per-block combiner (unique within block, then one driver merge of the
    8-byte keys — bounded by distinct contents, not corpus size) and
    broadcast once via ``ray.put``; the new side streams through one
    vectorized ``isin`` filter. No shuffle on either side. Beyond
    driver-memory hash sets, swap the broadcast for a Bloom filter
    (stages/decontam.BloomFilter — same mergeable pattern) at the cost of
    a bounded false-drop rate.
    """
    import ray as _ray

    def prior_hashes(batch: pd.DataFrame) -> pd.DataFrame:
        h = _hash_text_column(batch, col)
        return pd.DataFrame({"_content_hash": pd.unique(h)})

    parts = [
        b.to_pandas()
        for b in prior_ds.map_batches(prior_hashes, batch_format="pandas")
        .iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    seen = (
        np.sort(pd.concat(parts, ignore_index=True)["_content_hash"].unique())
        if parts
        else np.array([], np.int64)
    )
    seen_ref = _ray.put(seen)

    def fresh(batch: pd.DataFrame) -> pd.DataFrame:
        table = _ray.get(seen_ref)
        h = _hash_text_column(batch, col).to_numpy()
        idx = np.searchsorted(table, h)
        idx = np.minimum(idx, max(len(table) - 1, 0))
        dup = (len(table) > 0) & (table[idx] == h) if len(table) else np.zeros(len(batch), bool)
        return batch.loc[~dup]

    return new_ds.map_batches(fresh, batch_format="pandas")


def paragraph_dedup(ds, col: str = "text", id_col: str = "doc_id", *,
                    sep: str = "\n\n", combine: str = "auto",
                    driver_max_candidates: int = 2_000_000,
                    num_partitions: int = 32):
    """Cross-corpus PARAGRAPH-level exact dedup (the FineWeb/C4 hygiene
    pass): split each document on ``sep``; a paragraph survives only at
    its winner instance — lexicographically minimal (id, position) over
    every occurrence corpus-wide (so repeated boilerplate keeps exactly
    one copy, in the lowest-id document, at its first position there) —
    and documents reassemble from their surviving paragraphs in original
    order. → (id, text, n_paras, n_kept); documents left empty are
    dropped.

    Scale shape: pass 1 ships only (paragraph-hash, packed winner key)
    pairs pre-minimized per block; the winner table follows
    ``exact_dedup``'s combine="auto" rule. Pass 2 (apply) has two modes:

    - broadcast (candidates ≤ ``driver_max_candidates``): the sorted
      (hash, winner) arrays go out once via ``ray.put``; each block
      re-splits its documents locally and masks — paragraphs never move.
    - native join (above the threshold, or ``combine="shuffle"``): the
      winner table alone already names every surviving position (a
      winner key ``_w`` decodes to (doc, idx)), so NO corpus explode or
      content shuffle is needed. Winner keys sort by (doc, idx) and
      contiguous doc runs pack into one (doc, idx-list) row each —
      batch-edge runs are seam rows, merged on the driver (O(batches),
      same two-level trick as scene_gaps) — then ONE native hash join
      on ``id_col`` ships each document's text to its kept-position
      list and reassembly stays per-row. The only corpus-sized exchange
      is that single equi-join; the winner table never materializes on
      the driver or in any one task.
    """
    import pyarrow.compute as pc
    import ray as _ray
    import ray.data as rd  # noqa: F401

    _PACK = 1 << 20  # positions per document (guarded below)

    def _explode(batch: pd.DataFrame):
        paras = batch[col].astype(str).str.split(sep, regex=False)
        ex = paras.explode()
        idx = ex.groupby(level=0).cumcount().to_numpy()
        if len(idx) and idx.max() >= _PACK:
            raise ValueError("paragraph_dedup: >2^20 paragraphs in one doc")
        ids = batch[id_col].loc[ex.index].to_numpy()
        h = pd.util.hash_pandas_object(
            ex.astype(str), index=False
        ).to_numpy().view(np.int64)
        return h, ids.astype(np.int64) * _PACK + idx

    def winners(batch: pd.DataFrame) -> pd.DataFrame:
        h, pack = _explode(batch)
        out = pd.DataFrame({"_h": h, "_w": pack})
        return out.groupby("_h", sort=False, as_index=False).min()

    cand = ds.map_batches(winners, batch_format="pandas").materialize()
    use_driver = combine == "driver" or (
        combine == "auto" and cand.count() <= driver_max_candidates
    )

    if not use_driver:
        from ray.data.aggregate import Min

        from .seam import contiguous_run_bounds, preserve_order_execution

        win = cand.groupby("_h").aggregate(Min("_w", alias_name="_w"))

        _PSCHEMA = pa.schema(
            [(id_col, pa.int64()), ("_kidx", pa.binary()), ("_kind", pa.int8())]
        )

        def pack_runs(batch: pa.Table) -> pa.Table:
            n = len(batch)
            if n == 0:
                return _PSCHEMA.empty_table()
            w = batch["_w"].to_numpy()
            if np.any(np.diff(w) < 0):
                raise RuntimeError(
                    "paragraph_dedup: winner batch not sorted "
                    "(preserve_order violated)"
                )
            doc = w // _PACK
            idx = (w % _PACK).astype(np.int32)
            bounds = contiguous_run_bounds(doc)
            nruns = len(bounds) - 1
            docs, blobs, kinds = [], [], []
            for r, (s0, e0) in enumerate(zip(bounds[:-1], bounds[1:])):
                docs.append(int(doc[s0]))
                blobs.append(idx[s0:e0].tobytes())
                kinds.append(1 if (r == 0 or r == nruns - 1) else 0)
            return pa.table(
                {
                    id_col: pa.array(docs, pa.int64()),
                    "_kidx": pa.array(blobs, pa.binary()),
                    "_kind": pa.array(kinds, pa.int8()),
                }
            )

        graph = (
            win.map_batches(
                lambda b: b.select(["_w"]), batch_format="pyarrow"
            )
            .sort("_w")
            .map_batches(pack_runs, batch_format="pyarrow")
        )
        with preserve_order_execution():
            packed = graph.materialize()

        def _side(kind_val):
            return packed.map_batches(
                lambda b, k=kind_val: b.filter(
                    pc.equal(b["_kind"], k)
                ).drop_columns(["_kind"]),
                batch_format="pyarrow",
            )

        interior = _side(0)
        seam_parts = [
            b.to_pandas()
            for b in _side(1).iter_batches(batch_format="pyarrow")
            if len(b)
        ]
        kept = interior
        if seam_parts:
            sdf = pd.concat(seam_parts, ignore_index=True)
            rows_doc, rows_blob = [], []
            for dv, sub in sdf.groupby(id_col, sort=False):
                arr = np.sort(
                    np.frombuffer(b"".join(sub["_kidx"].tolist()), np.int32)
                )
                rows_doc.append(int(dv))
                rows_blob.append(arr.tobytes())
            seam_ds = rd.from_arrow(
                pa.table(
                    {
                        id_col: pa.array(rows_doc, pa.int64()),
                        "_kidx": pa.array(rows_blob, pa.binary()),
                    }
                )
            )
            kept = interior.union(seam_ds)

        joined = safe_join(
            ds, kept, join_type="inner", num_partitions=num_partitions,
            on=(id_col,),
        )

        def apply_join(batch: pd.DataFrame) -> pd.DataFrame:
            if len(batch) == 0:
                return pd.DataFrame(
                    {id_col: pd.Series([], dtype=np.int64),
                     col: pd.Series([], dtype=object),
                     "n_paras": pd.Series([], dtype=np.int64),
                     "n_kept": pd.Series([], dtype=np.int64)}
                )
            batch = batch.reset_index(drop=True)
            paras = batch[col].astype(str).str.split(sep, regex=False)
            ex = paras.explode()
            eidx = ex.groupby(level=0).cumcount().to_numpy()
            ekey = ex.index.to_numpy().astype(np.int64) * _PACK + eidx
            blobs = batch["_kidx"].tolist()
            counts = np.fromiter(
                (len(b) // 4 for b in blobs), dtype=np.int64, count=len(blobs)
            )
            kidx = np.frombuffer(b"".join(blobs), np.int32).astype(np.int64)
            krow = np.repeat(np.arange(len(batch), dtype=np.int64), counts)
            kkey = krow * _PACK + kidx  # sorted: row asc, idx asc per row
            pos = np.searchsorted(kkey, ekey)
            pos[pos == len(kkey)] = max(len(kkey) - 1, 0)
            winm = kkey[pos] == ekey if len(kkey) else np.zeros(len(ekey), bool)
            keep = pd.Series(winm, index=ex.index)
            kept_text = ex[keep.to_numpy()].groupby(level=0).agg(sep.join)
            n_paras = ex.groupby(level=0).size()
            n_kept = keep.groupby(level=0).sum()
            out = pd.DataFrame(
                {
                    id_col: batch[id_col],
                    col: kept_text.reindex(batch.index),
                    "n_paras": n_paras.reindex(batch.index)
                    .fillna(0).astype(np.int64),
                    "n_kept": n_kept.reindex(batch.index)
                    .fillna(0).astype(np.int64),
                }
            )
            return out.loc[out["n_kept"] > 0]

        return joined.map_batches(apply_join, batch_format="pandas")

    parts = [
        b.to_pandas() for b in cand.iter_batches(batch_format="pyarrow")
        if len(b)
    ]
    merged = (
        pd.concat(parts, ignore_index=True)
        .groupby("_h", sort=False, as_index=False)
        .min()
        if parts else pd.DataFrame({"_h": [], "_w": []})
    )
    order = np.argsort(merged["_h"].to_numpy())
    hs = merged["_h"].to_numpy()[order]
    ws = merged["_w"].to_numpy()[order]
    table_ref = _ray.put((hs, ws))

    class _Keep:
        def __init__(self):
            self.hs, self.ws = _ray.get(table_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            paras = batch[col].astype(str).str.split(sep, regex=False)
            ex = paras.explode()
            idx = ex.groupby(level=0).cumcount().to_numpy()
            ids = batch[id_col].loc[ex.index].to_numpy()
            h = pd.util.hash_pandas_object(
                ex.astype(str), index=False
            ).to_numpy().view(np.int64)
            pos = np.searchsorted(self.hs, h)
            pos[pos == len(self.hs)] = max(len(self.hs) - 1, 0)
            win = (
                (self.hs[pos] == h)
                & (self.ws[pos] == ids.astype(np.int64) * _PACK + idx)
                if len(self.hs) else np.zeros(len(h), bool)
            )
            keep = pd.Series(win, index=ex.index)
            kept_text = (
                ex[keep.to_numpy()].groupby(level=0).agg(sep.join)
            )
            n_paras = ex.groupby(level=0).size()
            n_kept = keep.groupby(level=0).sum()
            out = pd.DataFrame(
                {
                    id_col: batch[id_col],
                    col: kept_text.reindex(batch.index),
                    "n_paras": n_paras.reindex(batch.index).fillna(0).astype(np.int64),
                    "n_kept": n_kept.reindex(batch.index).fillna(0).astype(np.int64),
                }
            )
            return out.loc[out["n_kept"] > 0]

    return ds.map_batches(_Keep, batch_format="pandas", concurrency=2)


def multimodal_near_dup(
    ds,
    *,
    max_phash_hamming: int = 4,
    max_caption_hamming: int = 12,
    id_col: str = "image_id",
    phash_col: str = "phash",
    caption_col: str = "caption",
    max_bucket: int = 4096,
):
    """→ (id_a, id_b, phash_hamming, caption_hamming): JOINT multimodal
    near-dup pairs — images that look alike (phash hamming ≤ t_img) AND
    read alike (caption simhash hamming ≤ t_txt). The standard web-scale
    image-dedup refinement: pixel-only matching merges distinct scenes
    that share flat looks; requiring caption agreement keeps those apart.

    Scale shape: the pixel side drives candidate generation
    (``phash_near_dup`` band-LSH, provably exact for the phash bound);
    caption simhashes are computed in ONE streaming SimHasher pass and
    only the rows named by candidate pairs are fetched back (a single
    ``is_in`` filter pass — bounded by pair count, the same candidate
    economics as the n-gram Jaccard verifier). No all-pairs anywhere.
    """
    import pyarrow.compute as _pc
    import ray as _ray
    import ray.data as _rd  # noqa: F401

    pairs = phash_near_dup(
        ds, max_hamming=max_phash_hamming, id_col=id_col,
        hash_col=phash_col, max_bucket=max_bucket,
    ).to_pandas()
    if len(pairs) == 0:
        return _rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.string()),
                    "id_b": pa.array([], pa.string()),
                    "phash_hamming": pa.array([], pa.int64()),
                    "caption_hamming": pa.array([], pa.int64()),
                }
            )
        )
    need = np.unique(np.concatenate([pairs["id_a"].to_numpy(object),
                                     pairs["id_b"].to_numpy(object)]))
    need_ref = _ray.put(set(need.tolist()))

    def sim_for_candidates(df: pd.DataFrame) -> pd.DataFrame:
        wanted = _ray.get(need_ref) if not isinstance(need_ref, set) else need_ref
        sub = df.loc[df[id_col].isin(wanted)]
        if len(sub) == 0:
            return pd.DataFrame({"doc_id": [], "text": []}).assign(simhash=[])
        return SimHasher()(
            pd.DataFrame({"doc_id": sub[id_col].to_numpy(),
                          "text": sub[caption_col].to_numpy()})
        )

    parts = [
        b
        for b in ds.map_batches(sim_for_candidates, batch_format="pandas")
        .iter_batches(batch_format="pandas")
        if len(b)
    ]
    sim = {}
    for b in parts:
        sim.update(zip(b["doc_id"], b["simhash"]))
    sa = pairs["id_a"].map(sim).to_numpy(np.int64).view(np.uint64)
    sb = pairs["id_b"].map(sim).to_numpy(np.int64).view(np.uint64)
    ch = np.bitwise_count(sa ^ sb).astype(np.int64) if hasattr(np, "bitwise_count") else np.asarray(
        [bin(int(x)).count("1") for x in (sa ^ sb)], np.int64
    )
    keep = ch <= max_caption_hamming
    out = pairs.loc[keep].reset_index(drop=True)
    return _rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array(out["id_a"].to_numpy(object), pa.string()),
                "id_b": pa.array(out["id_b"].to_numpy(object), pa.string()),
                "phash_hamming": pa.array(
                    out["hamming"].to_numpy(np.int64), pa.int64()
                ),
                "caption_hamming": pa.array(ch[keep], pa.int64()),
            }
        )
    )


def scene_dominance_dedup(
    items_ds,
    *,
    iou_threshold: float = 0.5,
    time_window_s: float = 86_400.0,
    id_col: str = "id",
    ts_col: str = "datetime",
    res: "int | None" = None,
    max_pair_elems: int = 8_000_000,
):
    """GEOSPATIAL scene dedup (re-published / re-processed scene
    suppression): an item is DOMINATED — and dropped — iff some
    smaller-id item overlaps it with rect-IoU >= ``iou_threshold`` AND
    |Δt| <= ``time_window_s``. The dominance rule (NOT EXISTS a smaller
    qualifying neighbor) is deliberately non-transitive — unlike
    CC-chaining it cannot collapse a swath of adjacent distinct scenes —
    and is exactly SQL-expressible, so the oracle is a plain self-join.

    Scale shape: the nearest_neighbor_join cell co-group — every item
    ghosts into its 3×3 cell ring, one ``groupby(cell)`` co-locates each
    HOME item with every candidate that can overlap it (grid level is
    derived from the corpus' max footprint extent, so any overlapping
    pair is always ±1 cell apart), and each item's verdict is decided
    entirely inside its home group: no global dedup, no second pass.
    Per-group work is one chunked (H, A) IoU matrix bounded by
    ``max_pair_elems``. → Dataset of surviving rows (id, ts).

    Float discipline: IoU evaluates min/max/sub/mul/div in the same
    expression order as the SQL twin — IEEE-identical, so the >=
    threshold decisions are bit-exact against DuckDB.
    """
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Max

    # grid level: cell dimension >= max footprint extent ⇒ overlapping
    # pairs are always within the 3x3 ring (centers differ by
    # < (w_a + w_b)/2 <= max extent <= cell dim)
    if res is None:
        ext = items_ds.map_batches(
            lambda b: pa.table(
                {
                    "_e": pa.array(
                        np.maximum(
                            b["fp_xmax"].to_numpy() - b["fp_xmin"].to_numpy(),
                            b["fp_ymax"].to_numpy() - b["fp_ymin"].to_numpy(),
                        ),
                        pa.float64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).aggregate(Max("_e"))["max(_e)"]
        ext = max(float(ext or 0.0), 1e-9)
        res = int(np.clip(np.floor(np.log2(180.0 / ext)), 3, 14))
    n_cells = 1 << res
    dlon = 360.0 / n_cells
    dlat = 180.0 / n_cells
    wnd_ms = np.int64(round(float(time_window_s) * 1000.0))

    def explode(b: pa.Table) -> pa.Table:
        x0 = b["fp_xmin"].to_numpy()
        y0 = b["fp_ymin"].to_numpy()
        x1 = b["fp_xmax"].to_numpy()
        y1 = b["fp_ymax"].to_numpy()
        cx = (x0 + x1) * 0.5
        cy = (y0 + y1) * 0.5
        tms = (
            b[ts_col].cast(pa.timestamp("ms")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ids = np.asarray(b[id_col].to_pylist(), dtype=object)
        gx = np.clip(((cx + 180.0) / dlon).astype(np.int64), 0, n_cells - 1)
        gy = np.clip(((cy + 90.0) / dlat).astype(np.int64), 0, n_cells - 1)
        parts = {k: [] for k in
                 ("cell", id_col, "x0", "y0", "x1", "y1", "tms", "home")}
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ex, ey = gx + dx, gy + dy
                ok = (ex >= 0) & (ex < n_cells) & (ey >= 0) & (ey < n_cells)
                parts["cell"].append(ey[ok] * n_cells + ex[ok])
                parts[id_col].append(ids[ok])
                parts["x0"].append(x0[ok])
                parts["y0"].append(y0[ok])
                parts["x1"].append(x1[ok])
                parts["y1"].append(y1[ok])
                parts["tms"].append(tms[ok])
                parts["home"].append(
                    np.full(int(ok.sum()), dx == 0 and dy == 0)
                )
        return pa.table(
            {
                "cell": pa.array(np.concatenate(parts["cell"]), pa.int64()),
                id_col: pa.array(
                    np.concatenate(parts[id_col]), pa.string()
                ),
                "x0": pa.array(np.concatenate(parts["x0"]), pa.float64()),
                "y0": pa.array(np.concatenate(parts["y0"]), pa.float64()),
                "x1": pa.array(np.concatenate(parts["x1"]), pa.float64()),
                "y1": pa.array(np.concatenate(parts["y1"]), pa.float64()),
                "tms": pa.array(np.concatenate(parts["tms"]), pa.int64()),
                "home": pa.array(np.concatenate(parts["home"]), pa.bool_()),
            }
        )

    thr = float(iou_threshold)

    def per_cell(g: pd.DataFrame) -> pd.DataFrame:
        hm = g["home"].to_numpy()
        hidx = np.flatnonzero(hm)
        if len(hidx) == 0:
            return pd.DataFrame(
                {id_col: pd.array([], dtype="string"),
                 "tms": pd.array([], dtype="int64")}
            )
        ids = g[id_col].to_numpy()
        x0 = g["x0"].to_numpy(); y0 = g["y0"].to_numpy()
        x1 = g["x1"].to_numpy(); y1 = g["y1"].to_numpy()
        tm = g["tms"].to_numpy()
        area = (x1 - x0) * (y1 - y0)
        A = len(g)
        dominated = np.zeros(len(hidx), bool)
        step = max(1, max_pair_elems // max(A, 1))
        for s in range(0, len(hidx), step):
            e = min(s + step, len(hidx))
            h = hidx[s:e]
            iw = np.minimum(x1[h][:, None], x1[None, :]) - np.maximum(
                x0[h][:, None], x0[None, :]
            )
            ih = np.minimum(y1[h][:, None], y1[None, :]) - np.maximum(
                y0[h][:, None], y0[None, :]
            )
            inter = np.maximum(iw, 0.0) * np.maximum(ih, 0.0)
            iou = inter / (area[h][:, None] + area[None, :] - inter)
            qual = (
                (iou >= thr)
                & (np.abs(tm[h][:, None] - tm[None, :]) <= wnd_ms)
                & (ids[h][:, None] > ids[None, :])  # smaller id dominates
            )
            dominated[s:e] = qual.any(axis=1)
        keep = hidx[~dominated]
        return pd.DataFrame({id_col: ids[keep], "tms": tm[keep]})

    return (
        items_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(per_cell, batch_format="pandas")
    )
