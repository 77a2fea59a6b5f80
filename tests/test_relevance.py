"""TF-IDF / BM25 relevance operators vs brute-force scalar math."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd

from rustac_ray.stages.relevance import bm25_topk, corpus_stats, tfidf_top_terms

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "cat dog cat fish",
            "dog dog bird",
            "cat bird bird bird",
            "whale",
        ],
    }
)


def _brute_stats():
    toks = {r.doc_id: r.text.split() for r in DOCS.itertuples()}
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    n_tokens = sum(len(ts) for ts in toks.values())
    return toks, df, len(toks), n_tokens


def test_corpus_stats_matches_brute_force():
    toks, df, n_docs, n_tokens = _brute_stats()
    for combine in ("driver", "shuffle"):
        got_df, got_n, got_t = corpus_stats(
            rd.from_pandas(DOCS), combine=combine
        )
        assert got_n == n_docs and got_t == n_tokens
        assert dict(zip(got_df["token"], got_df["df"])) == df


def test_corpus_stats_token_restriction():
    got_df, n_docs, n_tokens = corpus_stats(
        rd.from_pandas(DOCS), tokens=["cat", "whale", "absent"]
    )
    assert dict(zip(got_df["token"], got_df["df"])) == {"cat": 2, "whale": 1}
    assert n_docs == 4 and n_tokens == 12


def test_tfidf_top_terms_brute_force():
    toks, df, n, _ = _brute_stats()
    got = tfidf_top_terms(rd.from_pandas(DOCS), m=2).to_pandas()
    # brute-force per-doc scores
    for doc_id, ts in toks.items():
        scores = {}
        for t in set(ts):
            scores[t] = ts.count(t) * math.log(n / df[t])
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        sub = got[got["doc_id"] == doc_id].sort_values(
            ["score", "token"], ascending=[False, True]
        )
        assert list(sub["token"]) == [t for t, _ in want]
        np.testing.assert_allclose(
            sub["score"].to_numpy(), [s for _, s in want], rtol=0, atol=0
        )
        assert (sub["tf"].to_numpy() == [ts.count(t) for t, _ in want]).all()


def test_bm25_brute_force_and_ranking():
    toks, df, n, n_tokens = _brute_stats()
    q = ["cat", "bird"]
    got = bm25_topk(rd.from_pandas(DOCS), q, k=10).to_pandas()
    avgdl = n_tokens / n
    k1, b = 1.2, 0.75

    def brute(doc_id):
        ts = toks[doc_id]
        s = 0.0
        for t in q:
            tf = ts.count(t)
            idf = math.log(1.0 + (n - df.get(t, 0) + 0.5) / (df.get(t, 0) + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * len(ts)) / avgdl))
        return s

    want = {d: brute(d) for d in toks if brute(d) > 0}
    assert set(got["doc_id"]) == set(want)
    for r in got.itertuples():
        np.testing.assert_allclose(r.score, want[r.doc_id], rtol=0, atol=0)
    # doc 4 has no query token: excluded; ranking is descending
    assert 4 not in set(got["doc_id"])
    assert (np.diff(got["score"].to_numpy()) <= 0).all()


def test_bm25_topk_truncates():
    got = bm25_topk(rd.from_pandas(DOCS), ["cat", "bird"], k=1).to_pandas()
    assert len(got) == 1
    # doc 3 (bird bird bird + cat) dominates
    assert got["doc_id"].iloc[0] == 3


def test_vocab_overlap_brute_force():
    from rustac_ray.stages.relevance import vocab_overlap

    df = pd.DataFrame(
        {
            "source": ["a", "a", "b", "b", "c"],
            "text": [
                "cat dog  fish",       # double space -> empty token dropped
                "dog bird",
                "cat cat whale",
                "bird",
                "zebra",               # no overlap with anyone
            ],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = vocab_overlap(ds, n_buckets=4).sort_values(
        ["source_a", "source_b"]
    ).reset_index(drop=True)
    # brute force distinct-word sets
    sets = {
        g: set(" ".join(df[df.source == g].text).split())
        for g in ["a", "b", "c"]
    }
    expect = []
    for a in ["a", "b", "c"]:
        for b in ["a", "b", "c"]:
            if a < b and sets[a] & sets[b]:
                expect.append((a, b, len(sets[a] & sets[b]),
                               len(sets[a]), len(sets[b])))
    got = list(out.itertuples(index=False, name=None))
    assert got == expect
    # zebra (source c) overlaps nothing -> absent from pair rows
    assert not ((out.source_a == "c") | (out.source_b == "c")).any()


def test_corpus_stats_auto_switches_on_unbounded_vocab():
    """URL-like token spaces (every token distinct) defeat the
    "vocabulary-bounded" driver-merge assumption: combine='auto' must
    take the shuffle path past max_partial_rows and produce the same
    stats (r03 verdict #5)."""
    docs = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(40)],
            "text": [
                " ".join(f"http://host/{i}/{j}" for j in range(25))
                for i in range(40)
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(8)
    want_df, want_n, want_t = corpus_stats(ds, combine="driver")
    # 1000 distinct tokens >> cap of 64: auto must COMPLETE via shuffle
    got_df, got_n, got_t = corpus_stats(
        ds, combine="auto", max_partial_rows=64
    )
    assert (got_n, got_t) == (want_n, want_t) == (40, 1000)
    a = want_df.sort_values("token").reset_index(drop=True)
    b = got_df.sort_values("token").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # small vocab stays on the driver merge (same results either way)
    small = rd.from_pandas(
        pd.DataFrame({"doc_id": ["a", "b"], "text": ["x y", "y z"]})
    )
    d1, n1, t1 = corpus_stats(small, combine="auto")
    d2, n2, t2 = corpus_stats(small, combine="shuffle")
    pd.testing.assert_frame_equal(
        d1.sort_values("token").reset_index(drop=True),
        d2.sort_values("token").reset_index(drop=True),
    )
    assert (n1, t1) == (n2, t2) == (2, 4)


def test_hybrid_topk_rrf_fusion():
    """RRF fusion vs hand-computed ranks: lexical list from BM25 over
    DOCS, semantic list from a 2-d embedding corpus aligned by id."""
    from rustac_ray.stages.relevance import hybrid_topk

    emb = pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4],
            # cosine vs query [1, 0]: id2 > id1 > id3 > id4
            "embedding": [
                [0.8, 0.6], [1.0, 0.05], [0.2, 0.9], [-1.0, 0.1],
            ],
        }
    )
    got = hybrid_topk(
        rd.from_pandas(DOCS), rd.from_pandas(emb),
        ["cat", "bird"], np.array([1.0, 0.0]), k=4, k_cand=4,
    )
    # lexical ranks (bm25 over cat/bird): doc3 (cat + 3×bird) first;
    # semantic ranks: 2,1,3,4 — fused by hand:
    lex = bm25_topk(rd.from_pandas(DOCS), ["cat", "bird"], k=4).to_pandas()
    lex = lex.sort_values(["score", "doc_id"], ascending=[False, True])
    sem_order = [2, 1, 3, 4]
    fused = {}
    for r, i in enumerate(lex["doc_id"], start=1):
        fused[i] = fused.get(i, 0.0) + 1.0 / (60 + r)
    for r, i in enumerate(sem_order, start=1):
        fused[i] = fused.get(i, 0.0) + 1.0 / (60 + r)
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    assert list(got["doc_id"]) == [i for i, _ in want]
    np.testing.assert_allclose(got["rrf"], [v for _, v in want], rtol=0, atol=0)
    # a doc present in BOTH lists outranks single-list docs of equal rank
    assert got["rrf"].iloc[0] == max(got["rrf"])


def test_text_index_bm25_bit_identical(ray_session, tmp_path):
    """Persisted inverted index (state/textindex): query answers are
    BIT-IDENTICAL to relevance.bm25_topk on the same corpus, for
    in-corpus, mixed, and absent-token queries; only the token-owning
    partitions are read."""
    import os

    import ray.data as rd

    from rustac_ray.stages.relevance import bm25_topk
    from rustac_ray.state.textindex import bm25_query_index, build_text_index

    docs = lambda: rd.read_parquet(  # noqa: E731
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    idx = str(tmp_path / "tix")
    meta = build_text_index(docs(), idx, partitions=8)
    assert meta["n_docs"] == 500 and meta["posting_rows"] > 0
    assert len(os.listdir(os.path.join(idx, "postings"))) <= 8

    for q in (["join", "vector", "stream", "big"],
              ["the", "zzzneverseen"], ["data"]):
        a = bm25_query_index(idx, q, k=15)
        bdf = bm25_topk(docs(), q, k=15).to_pandas()
        assert a["doc_id"].tolist() == bdf["doc_id"].tolist(), q
        assert (a["score"].to_numpy() == bdf["score"].to_numpy()).all(), q

    # all-absent query: empty result, no crash
    assert len(bm25_query_index(idx, ["zzznotoken"], k=5)) == 0


def test_text_index_incremental_merge(ray_session, tmp_path):
    """Index lifecycle: build over half the corpus, merge the rest —
    queries bit-identical to a from-scratch build over the union."""
    import ray.data as rd

    from rustac_ray.state.textindex import (
        bm25_query_index, build_text_index, merge_text_index,
    )

    full = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    first = full.filter(lambda r: r["doc_id"] < 250)
    rest = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).filter(lambda r: r["doc_id"] >= 250)

    inc = str(tmp_path / "inc")
    build_text_index(first, inc, partitions=8)
    out = merge_text_index(rest, inc)
    assert out["n_docs"] == 500

    ref = str(tmp_path / "ref")
    build_text_index(
        rd.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        ),
        ref, partitions=8,
    )
    for q in (["join", "vector", "stream", "big"], ["data"]):
        a = bm25_query_index(inc, q, k=15)
        bdf = bm25_query_index(ref, q, k=15)
        assert a["doc_id"].tolist() == bdf["doc_id"].tolist()
        assert (a["score"].to_numpy() == bdf["score"].to_numpy()).all()
