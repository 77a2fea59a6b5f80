"""Persisted inverted text index — the text-retrieval analogue of the
ANN index artifacts (state/annindex.py): build once with one distributed
pass, then answer BM25 queries by reading ONLY the posting partitions
that own the query's tokens.

Layout under ``index_dir``:

- ``postings/part-{p:04d}.parquet`` — (token, doc_id, tf, dl) rows,
  hash-partitioned by token (``siphash(token) % partitions``) and SORTED
  by token inside each file, so a query's token filter prunes row groups
  via parquet min/max stats on top of the partition prune.
- ``_meta.json`` — n_docs, n_tokens, partitions (the BM25 globals).

df(token) needs no separate table: it IS the token's posting-list
length. dl is denormalized into the postings so scoring never joins a
doc-length table.

Scale shape: the build is one ``map_batches`` (vectorized per-batch
(doc, token, tf) via a pandas groupby) + one ``groupby(part)`` shuffle
whose volume is the DISTINCT (doc, token) pairs — bounded by corpus
token mass, never quadratic. The query path reads only
``len(query_tokens)`` partitions' filtered rows; a posting list is
df-bounded (stopword-heavy queries read big lists — the same caveat as
every inverted index; prune stopwords upstream).

Float discipline: scoring reproduces ``relevance.bm25_topk``'s exact
expression order (idf list in query-token order, left-assoc
accumulation), so index answers are BIT-IDENTICAL to the on-the-fly
operator and hash-match its SQL twin.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["build_text_index", "bm25_query_index", "merge_text_index"]

_META = "_meta.json"


def _part_of(tokens, partitions: int) -> np.ndarray:
    return (
        pd.util.hash_array(np.asarray(tokens, dtype=object),
                           categorize=False)
        % np.uint64(partitions)
    ).astype(np.int64)


def build_text_index(
    ds,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    partitions: int = 16,
) -> dict:
    """One distributed pass → persisted index; returns
    ``{"n_docs", "n_tokens", "partitions", "posting_rows"}``.
    Idempotent per directory (tmp + rename publish; re-running
    overwrites atomically)."""
    from ..stages.relevance import _tokenize

    index_dir = os.path.abspath(index_dir)
    pdir = os.path.join(index_dir, "postings")
    os.makedirs(pdir, exist_ok=True)

    def postings(b: pa.Table) -> pd.DataFrame:
        flat, parent = _tokenize(b, text_col)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        dl = np.bincount(parent, minlength=len(ids)).astype(np.int64)
        df = pd.DataFrame(
            {"_p": parent, "token": flat.to_pandas().to_numpy()}
        )
        tf = df.groupby(["_p", "token"], sort=False).size().reset_index(
            name="tf"
        )
        out = pd.DataFrame(
            {
                "part": _part_of(tf["token"].to_numpy(), partitions),
                "token": tf["token"].to_numpy(),
                id_col: ids[tf["_p"].to_numpy()],
                "tf": tf["tf"].to_numpy().astype(np.int64),
                "dl": dl[tf["_p"].to_numpy()],
            }
        )
        return out

    # materialized once: consumed by BOTH the partition writer (side
    # effects must run exactly once) and the n_tokens fold
    rows = ds.map_batches(postings, batch_format="pyarrow").materialize()

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["part"].iloc[0])
        g = g.sort_values(["token", id_col], kind="mergesort")
        t = pa.Table.from_pandas(
            g[["token", id_col, "tf", "dl"]], preserve_index=False
        )
        fname = os.path.join(pdir, f"part-{p:04d}.parquet")
        tmp = fname + f".tmp.{os.getpid()}"
        pq.write_table(t, tmp, compression="zstd", row_group_size=65536)
        os.replace(tmp, fname)
        return pd.DataFrame({"part": [p], "rows": [len(g)]})

    stats = rows.groupby("part").map_groups(
        write_part, batch_format="pandas"
    ).to_pandas()

    n_docs = ds.count()
    # total token mass = Σ tf (each (doc, token) posting carries its tf)
    from ray.data.aggregate import Sum

    n_tokens = rows.aggregate(Sum("tf"))["sum(tf)"] or 0
    meta = {
        "n_docs": int(n_docs),
        "n_tokens": int(n_tokens),
        "partitions": int(partitions),
        "id_col": id_col,
    }
    tmp = os.path.join(index_dir, _META + f".tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _META))
    return {**meta, "posting_rows": int(stats["rows"].sum())}


def bm25_query_index(
    index_dir: str,
    query_tokens: "list[str]",
    k: int = 20,
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """→ pandas (id_col, score): top-``k`` BM25 against the persisted
    index, reading only the partitions owning the query tokens (with a
    token row filter — row groups prune on the sorted token column).
    Bit-identical to ``relevance.bm25_topk`` on the same corpus."""
    import pyarrow.compute as pc_
    import pyarrow.dataset as pads

    index_dir = os.path.abspath(index_dir)
    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    id_col = meta.get("id_col", "doc_id")
    P = int(meta["partitions"])
    n_docs = np.float64(meta["n_docs"])
    avgdl = np.float64(meta["n_tokens"]) / n_docs

    parts = sorted(set(int(p) for p in _part_of(query_tokens, P)))
    tables = []
    flt = pads.field("token").isin(list(query_tokens))
    for p in parts:
        fname = os.path.join(index_dir, "postings", f"part-{p:04d}.parquet")
        if os.path.exists(fname):
            tables.append(
                pads.dataset(fname).to_table(filter=flt)
            )
    if not tables:
        return pd.DataFrame({id_col: pd.array([], dtype="int64"),
                             "score": pd.array([], dtype="float64")})
    post = pa.concat_tables(tables)
    tok = post["token"].to_numpy(zero_copy_only=False)
    ids = post[id_col].to_numpy(zero_copy_only=False)
    tfs = post["tf"].to_numpy()
    dls = post["dl"].to_numpy()

    # candidate docs = union of the posting lists; per-doc dl aligned
    docs, inv = np.unique(ids, return_inverse=True)
    dl_of = np.zeros(len(docs), np.float64)
    dl_of[inv] = dls  # every posting of a doc carries the same dl
    denom_base = k1 * ((1.0 - b) + (b * dl_of) / avgdl)
    total = np.zeros(len(docs), np.float64)
    for t in query_tokens:  # accumulate in query order (bit-repro)
        m = tok == t
        df_t = np.float64(int(m.sum()))
        idf_t = float(np.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)))
        tf = np.zeros(len(docs), np.float64)
        tf[inv[m]] = tfs[m]
        total = total + idf_t * (tf * (k1 + 1.0)) / (tf + denom_base)
    keep = total > 0.0
    out = pd.DataFrame({id_col: docs[keep], "score": total[keep]})
    out = out.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    return out.reset_index(drop=True)


def merge_text_index(
    new_ds,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Incremental ingest: fold NEW documents' postings into the
    existing partition files (read owning partition + concat + resort +
    atomic rewrite) and bump the BM25 globals. Cost is
    O(new postings + touched partitions' existing rows) — every
    partition is typically touched (a document's tokens hash across the
    whole partition space), so partitions are the rewrite parallelism
    unit, exactly like the clustered store's owning files. New doc ids
    must be disjoint from the indexed ones (same contract as
    incremental_dedup's ingest side); queries after a merge are
    bit-identical to a from-scratch build over the union corpus."""
    from ..stages.relevance import _tokenize

    index_dir = os.path.abspath(index_dir)
    with open(os.path.join(index_dir, _META)) as f:
        meta = json.load(f)
    P = int(meta["partitions"])
    pdir = os.path.join(index_dir, "postings")

    def postings(b: pa.Table) -> pd.DataFrame:
        flat, parent = _tokenize(b, text_col)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        dl = np.bincount(parent, minlength=len(ids)).astype(np.int64)
        df = pd.DataFrame(
            {"_p": parent, "token": flat.to_pandas().to_numpy()}
        )
        tf = df.groupby(["_p", "token"], sort=False).size().reset_index(
            name="tf"
        )
        return pd.DataFrame(
            {
                "part": _part_of(tf["token"].to_numpy(), P),
                "token": tf["token"].to_numpy(),
                id_col: ids[tf["_p"].to_numpy()],
                "tf": tf["tf"].to_numpy().astype(np.int64),
                "dl": dl[tf["_p"].to_numpy()],
            }
        )

    rows = new_ds.map_batches(postings, batch_format="pyarrow").materialize()

    def fold_part(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["part"].iloc[0])
        fname = os.path.join(pdir, f"part-{p:04d}.parquet")
        add = g[["token", id_col, "tf", "dl"]]
        if os.path.exists(fname):
            old = pq.read_table(fname).to_pandas()
            add = pd.concat([old, add], ignore_index=True)
        add = add.sort_values(["token", id_col], kind="mergesort")
        t = pa.Table.from_pandas(add, preserve_index=False)
        tmp = fname + f".tmp.{os.getpid()}"
        pq.write_table(t, tmp, compression="zstd", row_group_size=65536)
        os.replace(tmp, fname)
        return pd.DataFrame({"part": [p], "rows": [len(add)]})

    stats = rows.groupby("part").map_groups(
        fold_part, batch_format="pandas"
    ).to_pandas()

    from ray.data.aggregate import Sum

    n_new_tokens = rows.aggregate(Sum("tf"))["sum(tf)"] or 0
    meta["n_docs"] = int(meta["n_docs"]) + int(new_ds.count())
    meta["n_tokens"] = int(meta["n_tokens"]) + int(n_new_tokens)
    tmp = os.path.join(index_dir, _META + f".tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _META))
    return {**meta, "posting_rows_touched": int(stats["rows"].sum())}
