"""Corpus-relevance operators: TF-IDF term extraction and BM25 retrieval.

Both are TWO-PASS BROADCAST pipelines over a text column of a document
table — the canonical shape for corpus-statistics operators at 100 TB:

  pass 1 (stats): per-batch Arrow tokenization (``utf8_split_whitespace``
  + ``list_parent_indices``, all C kernels) folds each block to its local
  (token, document-frequency) partials plus one meta row carrying the
  block's doc/token counts. The partial stream is vocabulary-bounded —
  independent of corpus size — so it merges with one driver-side pandas
  groupby (NOTES lesson 12); ``combine="shuffle"`` keeps the distributed
  groupby for token spaces beyond driver memory (URLs, hashes).

  pass 2 (score): the merged stats are broadcast once via ``ray.put``
  (sorted vocab + idf arrays) and every block scores itself with numpy
  gathers — no shuffle, no per-row Python. The only wide step is the
  final partial-top-k merge (``sorted_topn``) for BM25's global top-k.

Tokenization matches the engine-wide convention (whitespace split, empty
tokens dropped) so both operators have exact DuckDB oracle twins via
``string_split(text, ' ')``. Float scores are IEEE-reproducible: both
sides compute the same double expression shape (see oracle_sql()).

No reference counterpart (rustac is a spatial/STAC engine); these cover
the text-analysis axis of the training-data-pipeline mandate alongside
stages/text.py and stages/sketch.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["corpus_stats", "tfidf_top_terms", "bm25_topk"]


def _tokenize(batch: pa.Table, col: str):
    """(flat_tokens: pa.Array, parent_row: np.int64[]) with empties dropped."""
    toks = pc.utf8_split_whitespace(batch[col])
    flat = pc.list_flatten(toks).combine_chunks()
    parent = pc.list_parent_indices(toks).to_numpy().astype(np.int64, copy=False)
    nonempty = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
    if not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
    return flat, parent


_META = ""  # empty string can never be a token (empties are dropped)


def corpus_stats(
    ds,
    col: str = "text",
    *,
    tokens=None,
    combine: str = "auto",
    max_partial_rows: int = 5_000_000,
):
    """Fold (document frequency per token, n_docs, total_tokens) over a
    text column. Returns ``(df: pd.DataFrame[token, df], n_docs: int,
    n_tokens: int)``. ``tokens``: restrict the df fold to this token list
    (the BM25 case — the partial stream then carries ≤ len(tokens) + 1
    rows per block no matter the vocabulary).

    ``combine="auto"`` (default, the exact_dedup rule applied to the last
    assumption-bounded driver merge — r03 verdict #5): materialize the
    per-block partial stream once (it lives in the object store, not the
    driver), count its rows (metadata-only), and take the driver concat
    only when the raw stream is under ``max_partial_rows``; above it —
    URL/hash-like token spaces where "vocabulary-bounded" stops meaning
    "small" — the distinct-token reduction runs as a distributed
    ``groupby(token)`` instead, with no recompute on the switch."""
    token_filter = None if tokens is None else pa.array(sorted(set(tokens)))

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent = _tokenize(batch, col)
        n_tok = len(flat)
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False)
        # distinct (doc, token) pairs -> per-token doc counts (the df partial)
        v = len(d.dictionary)
        pair = parent * max(v, 1) + codes
        uniq_codes = np.unique(pair).astype(np.int64) % max(v, 1) if n_tok else codes[:0]
        dfc = np.bincount(uniq_codes, minlength=v).astype(np.int64)
        tok_arr, df_arr = d.dictionary, dfc
        if token_filter is not None:
            m = pc.is_in(tok_arr, value_set=token_filter).to_numpy(zero_copy_only=False)
            tok_arr, df_arr = tok_arr.filter(pa.array(m)), df_arr[m]
        return pa.table(
            {
                "token": pa.concat_arrays(
                    [tok_arr.cast(pa.string()), pa.array([_META], pa.string())]
                ),
                "df": pa.array(np.concatenate([df_arr, [0]]), pa.int64()),
                "n_docs": pa.array([0] * len(tok_arr) + [batch.num_rows], pa.int64()),
                "n_tokens": pa.array([0] * len(tok_arr) + [n_tok], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    if combine == "auto":
        partials = partials.materialize()
        combine = (
            "shuffle" if partials.count() > max_partial_rows else "driver"
        )
    if combine == "shuffle":
        from ray.data.aggregate import Sum

        merged = (
            partials.groupby("token")
            .aggregate(
                Sum("df", alias_name="df"),
                Sum("n_docs", alias_name="n_docs"),
                Sum("n_tokens", alias_name="n_tokens"),
            )
            .to_pandas()
        )
    else:
        parts = [
            b.to_pandas()
            for b in partials.iter_batches(batch_format="pyarrow")
            if len(b)
        ]
        merged = (
            pd.concat(parts, ignore_index=True)
            .groupby("token", sort=False)[["df", "n_docs", "n_tokens"]]
            .sum()
            .reset_index()
        )
    meta = merged[merged["token"] == _META]
    n_docs = int(meta["n_docs"].sum())
    n_tokens = int(meta["n_tokens"].sum())
    df = merged.loc[merged["token"] != _META, ["token", "df"]].reset_index(drop=True)
    df["df"] = df["df"].astype("int64")
    return df, n_docs, n_tokens


def tfidf_top_terms(
    ds, col: str = "text", id_col: str = "doc_id", m: int = 3, *, combine: str = "auto"
):
    """Per-document top-``m`` TF-IDF terms: score = tf * ln(N / df), ties
    broken by token ascending. Returns (id_col, token, tf, score) rows.

    SQL twin: ``tf * ln(CAST(n AS DOUBLE) / df)`` + ``row_number() OVER
    (PARTITION BY doc ORDER BY score DESC, token) <= m`` (same double
    expression shape, bit-identical scores).
    """
    import ray

    df_tbl, n_docs, _ = corpus_stats(ds, col, combine=combine)
    vocab = np.sort(df_tbl["token"].to_numpy())
    order = np.argsort(df_tbl["token"].to_numpy())
    idf = np.log(np.float64(n_docs) / df_tbl["df"].to_numpy()[order].astype(np.float64))
    ref = ray.put((vocab, idf))

    def score(batch: pa.Table) -> pd.DataFrame:
        gvocab, gidf = ray.get(ref)
        flat, parent = _tokenize(batch, col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return pd.DataFrame(
                {id_col: ids[:0], "token": np.array([], str),
                 "tf": np.array([], np.int64), "score": np.array([], np.float64)}
            )
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(d.dictionary)
        key = parent * v + codes
        uk, tf = np.unique(key, return_counts=True)
        p, c = uk // v, uk % v
        bvocab = d.dictionary.to_numpy(zero_copy_only=False)
        pos = np.searchsorted(gvocab, bvocab)
        ok = (pos < len(gvocab)) & (gvocab[np.minimum(pos, len(gvocab) - 1)] == bvocab)
        bidf = np.where(ok, gidf[np.minimum(pos, len(gvocab) - 1)], np.nan)
        sc = tf.astype(np.float64) * bidf[c]
        out = pd.DataFrame(
            {id_col: ids[p], "token": bvocab[c], "tf": tf.astype(np.int64), "score": sc}
        ).dropna(subset=["score"])
        out = out.sort_values(
            [id_col, "score", "token"], ascending=[True, False, True], kind="mergesort"
        )
        return out.groupby(id_col, sort=False).head(m).reset_index(drop=True)

    return ds.map_batches(score, batch_format="pyarrow")


def bm25_topk(
    ds,
    query_tokens: list[str],
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    *,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Global top-``k`` documents by BM25 score against a fixed token
    query (Robertson/Sparck Jones idf: ln(1 + (N - df + .5)/(df + .5))).
    Stats pass folds only the query tokens' dfs; the score pass is one
    shuffle-free vectorized map; the top-k is the partial-top-k combiner.
    Term contributions accumulate in ``query_tokens`` order so the double
    sum is reproducible (and matches the SQL twin's left-assoc ``+``).
    Returns (id_col, score) rows with score > 0.
    """
    from rustac_ray.query import sorted_topn

    df_tbl, n_docs, n_tokens = corpus_stats(ds, col, tokens=query_tokens)
    dfs = dict(zip(df_tbl["token"], df_tbl["df"]))
    avgdl = np.float64(n_tokens) / np.float64(n_docs)
    idfs = [
        float(
            np.log(
                1.0
                + (np.float64(n_docs) - np.float64(dfs.get(t, 0)) + 0.5)
                / (np.float64(dfs.get(t, 0)) + 0.5)
            )
        )
        for t in query_tokens
    ]

    def score(batch: pa.Table) -> pa.Table:
        flat, parent = _tokenize(batch, col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        dl = np.bincount(parent, minlength=len(ids)).astype(np.float64)
        denom_base = k1 * ((1.0 - b) + (b * dl) / avgdl)
        total = np.zeros(len(ids), np.float64)
        for t, idf_t in zip(query_tokens, idfs):
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf = np.bincount(parent[m], minlength=len(ids)).astype(np.float64)
            total = total + idf_t * (tf * (k1 + 1.0)) / (tf + denom_base)
        keep = total > 0.0
        return pa.table(
            {id_col: pa.array(ids[keep]), "score": pa.array(total[keep], pa.float64())}
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    return sorted_topn(scored, [("score", True), (id_col, False)], k)


def vocab_overlap(ds, group_col: str = "source", col: str = "text",
                  *, n_buckets: int = 64):
    """Cross-corpus vocabulary overlap: distinct-word Jaccard counts for
    every pair of groups (sources/domains) → (source_a, source_b,
    n_common, n_a, n_b) with a < b; Jaccard = n_common/(n_a+n_b-n_common).

    The corpus-similarity primitive for mixture design ("how much does
    crawl X repeat crawl Y?"). Integer counts only — no floats cross the
    engine/oracle boundary.

    Scale shape: stage 1 folds each block to its DISTINCT (word, group)
    pairs (dictionary-encode + unique, all C kernels) bucketed by a word
    hash; the only shuffle is the ``groupby(bucket)`` of those deduped
    pairs (vocabulary-bounded, not corpus-bounded). Stage 2 handles one
    bucket per task: pivot the bucket's word×group incidence matrix M
    (bool) and take Mᵀ M — one g×g integer matmul replaces all per-word
    pair loops; g = #groups is small by definition of a mixture. Stage 3
    sums the ≤ n_buckets g×g partials (tiny). Words never co-locate by
    group, so a skewed group costs nothing; bucket sizes are uniform by
    hash construction.
    """
    def pairs(batch: pa.Table) -> pa.Table:
        flat, parent = _tokenize(batch, col)
        groups = batch[group_col].to_numpy(zero_copy_only=False)
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gd, gnames = pd.factorize(groups)
        v = max(len(d.dictionary), 1)
        # distinct (group, word) within the block
        key = gd[parent] * v + codes
        uniq = np.unique(key)
        w_idx = (uniq % v).astype(np.int64)
        g_idx = (uniq // v).astype(np.int64)
        words = d.dictionary.take(pa.array(w_idx)).cast(pa.string())
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        # vocabulary-hash (pandas siphash, stable across machines) — the
        # same vectorized trick as decontam._token_hash_rows
        wh = (
            pd.util.hash_pandas_object(words.to_pandas(), index=False)
            .to_numpy()
            .view(np.uint64)
        )
        return pa.table(
            {
                "bucket": pa.array((wh % np.uint64(n_buckets)).astype(np.int64)),
                "word": words,
                "grp": pa.array(np.asarray(gnames)[g_idx], pa.string()),
            }
        )

    def fold(bucket_df: pd.DataFrame) -> pd.DataFrame:
        if bucket_df.empty:
            return pd.DataFrame({
                "source_a": pd.Series(dtype=str),
                "source_b": pd.Series(dtype=str),
                "n_common": pd.Series(dtype=np.int64),
            })
        dd = bucket_df[["word", "grp"]].drop_duplicates()
        gcat, gnames = pd.factorize(dd["grp"], sort=True)
        wcat = pd.factorize(dd["word"])[0]
        g = len(gnames)
        m = np.zeros((wcat.max() + 1, g), dtype=np.int64)
        m[wcat, gcat] = 1
        cc = m.T @ m  # g×g: co-occurrence counts incl. diagonal (n_g)
        ia, ib = np.nonzero(cc)
        keep = ia <= ib  # keep diagonal (per-group distinct partials) + upper
        return pd.DataFrame(
            {
                "source_a": np.asarray(gnames)[ia[keep]],
                "source_b": np.asarray(gnames)[ib[keep]],
                "n_common": cc[ia[keep], ib[keep]],
            }
        )

    from ray.data.aggregate import Sum

    merged = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("n_common", alias_name="n_common"))
        .to_pandas()
    )
    diag = merged[merged["source_a"] == merged["source_b"]]
    nd = dict(zip(diag["source_a"], diag["n_common"]))
    out = merged[merged["source_a"] != merged["source_b"]].copy()
    out["n_a"] = out["source_a"].map(nd).astype(np.int64)
    out["n_b"] = out["source_b"].map(nd).astype(np.int64)
    out["n_common"] = out["n_common"].astype(np.int64)
    return out.reset_index(drop=True)


def hybrid_topk(
    docs_ds,
    emb_ds,
    query_tokens: list[str],
    query_vec,
    *,
    k: int = 10,
    k_cand: int = 50,
    rrf_k: int = 60,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
):
    """Hybrid lexical+semantic retrieval with Reciprocal Rank Fusion
    (Cormack/Clarke/Buettcher RRF, the standard zero-tuning fusion):
    fused(d) = Σ_lists 1/(rrf_k + rank_list(d)) over a BM25 shortlist of
    the text corpus and an exact-cosine shortlist of the embedding
    corpus (aligned by id). Only RANKS cross lists, so the two scorers'
    incomparable scales never mix — which is why RRF beats score
    interpolation without calibration.

    Scale shape: both shortlists are global top-``k_cand`` results of
    already-streaming operators (BM25 = df-fold + vectorized score +
    partial-top-k, rustac_ray/stages/relevance.py:190; cosine =
    broadcast-query matmul + partial-top-k, stages/embed.py:91). The
    fusion itself touches 2·k_cand rows — driver-bounded by the REQUEST,
    not the corpus, like every top-k tail in the repo.

    Returns a pandas DataFrame (doc_id_col, rrf), rrf descending, id
    ascending on ties.
    """
    import pandas as pd

    from .embed import brute_force_topk

    lex = bm25_topk(
        docs_ds, query_tokens, col=text_col, id_col=doc_id_col, k=k_cand
    ).to_pandas()
    sem = brute_force_topk(
        emb_ds, {"q": np.asarray(query_vec)}, k_cand,
        id_col=vec_id_col, vec_col=vec_col,
    ).to_pandas()

    # deterministic ranks: score desc, id asc (ties)
    lex = lex.sort_values(
        ["score", doc_id_col], ascending=[False, True]
    ).reset_index(drop=True)
    sem = sem.sort_values(
        ["cosine", vec_id_col], ascending=[False, True]
    ).reset_index(drop=True)

    fused: dict = {}
    for ids in (lex[doc_id_col].tolist(), sem[vec_id_col].tolist()):
        for r, i in enumerate(ids, start=1):
            fused[i] = fused.get(i, 0.0) + 1.0 / (rrf_k + r)
    out = pd.DataFrame(
        {doc_id_col: list(fused), "rrf": list(fused.values())}
    ).sort_values(["rrf", doc_id_col], ascending=[False, True])
    return out.head(k).reset_index(drop=True)
