"""Randomized differential tests for the scale-op family (grouped top-k,
hash sampling, quantiles, as-of join, interval join) vs DuckDB on random
frames — the same armor test_properties.py gives the SEARCH surface."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from rustac_ray.stages.aggregates import grouped_topk
from rustac_ray.stages.sampling import hash_sample, sample_sql
from rustac_ray.stages.sketch import exact_quantiles
from rustac_ray.stages.temporal_join import asof_join, interval_join


def _frame(seed: int, n: int = 800) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n),
            "k": rng.integers(0, 6, n),
            # coarse grid → plenty of exact duplicates to stress ties
            "v": (rng.integers(0, 80, n) * 0.5).astype(np.float64),
        }
    )


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 10_000), st.integers(1, 12), st.booleans())
def test_grouped_topk_differential(ray_session, seed, n, desc):
    df = _frame(seed)
    got = (
        grouped_topk(
            rd.from_pandas(df).repartition(5), "k", "v", n,
            descending=desc, tie_cols=["id"],
        )
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    d = "DESC" if desc else "ASC"
    exp = (
        duckdb.sql(
            f"SELECT id, k, v FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY k ORDER BY v {d}, id) rn FROM df) "
            f"WHERE rn <= {n} ORDER BY k, id"
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["id", "k", "v"]], exp)


@settings(max_examples=10, deadline=None)
@given(
    st.integers(0, 10_000),
    st.floats(0.0, 1.0, allow_nan=False),
    st.integers(0, 99),
)
def test_hash_sample_differential(ray_session, seed, rate, salt):
    df = _frame(seed, 400)
    got = sorted(
        hash_sample(rd.from_pandas(df), "id", rate, salt=salt)
        .to_pandas()
        .get("id", pd.Series(dtype="int64"))
        .tolist()
    )
    exp = [
        r[0]
        for r in duckdb.sql(
            f"SELECT id FROM df WHERE {sample_sql('id', rate, salt)} ORDER BY id"
        ).fetchall()
    ]
    assert got == exp


@settings(max_examples=8, deadline=None)
@given(
    st.integers(0, 10_000),
    st.lists(st.floats(0.0, 1.0, allow_nan=False), min_size=1, max_size=4),
)
def test_exact_quantiles_differential(ray_session, seed, qs):
    df = _frame(seed)
    got = exact_quantiles(
        rd.from_pandas(df), "v", qs, max_collect=50, bins=16
    )
    for q, val in zip(got["q"], got["value"]):
        exp = duckdb.sql(f"SELECT quantile_disc(v, {q}) FROM df").fetchone()[0]
        assert val == float(exp), (q, val, exp)


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 10_000), st.sampled_from(["broadcast", "partitioned"]))
def test_asof_join_differential(ray_session, seed, strategy):
    rng = np.random.default_rng(seed)
    nl, nr = 300, 120
    ldf = pd.DataFrame(
        {
            "lid": np.arange(nl),
            "k": rng.integers(0, 5, nl),
            "ts": rng.integers(0, 500, nl).astype("int64"),
        }
    )
    rdf = pd.DataFrame(
        {
            "rid": np.arange(nr),
            "k": rng.integers(0, 5, nr),
            "ts": (rng.integers(0, 50, nr) * 10).astype("int64"),
        }
    )
    j = asof_join(
        rd.from_pandas(ldf),
        rd.from_pandas(rdf),
        on="ts",
        by="k",
        right_cols=["rid"],
        tie_break="rid",
        strategy=strategy,
        num_partitions=3,
    ).to_pandas()
    got = (
        j[["lid", "rid"]]
        .fillna(-1)
        .astype("int64")
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        "WITH p AS (SELECT k, ts, max(rid) AS rid FROM rdf GROUP BY 1, 2) "
        "SELECT l.lid, CAST(coalesce(p.rid, -1) AS BIGINT) AS rid "
        "FROM ldf l ASOF LEFT JOIN p ON l.k = p.k AND l.ts >= p.ts "
        "ORDER BY l.lid"
    ).df()
    assert got["rid"].tolist() == exp["rid"].tolist()


@settings(max_examples=8, deadline=None)
@given(st.integers(0, 10_000), st.sampled_from(["broadcast", "partitioned"]))
def test_interval_join_differential(ray_session, seed, strategy):
    rng = np.random.default_rng(seed)
    probe = pd.DataFrame(
        {"pid": np.arange(300), "v": rng.uniform(-10, 110, 300).round(2)}
    )
    k = int(rng.integers(1, 10))
    lo = rng.uniform(0, 90, k).round(2)
    hi = (lo + rng.uniform(0, 40, k)).round(2)
    bands = [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(lo, hi))]
    out = interval_join(
        rd.from_pandas(probe), bands, value_col="v",
        strategy=strategy, num_partitions=4,
    ).to_pandas()
    got = sorted(zip(out["pid"].astype(int), out["band_id"].astype(int)))
    vals = " UNION ALL ".join(
        f"SELECT {b} AS band_id, {a} AS lo, {c} AS hi" for b, a, c in bands
    )
    exp = sorted(
        (r[0], r[1])
        for r in duckdb.sql(
            f"SELECT pid, band_id FROM probe JOIN ({vals}) b "
            "ON v BETWEEN lo AND hi"
        ).fetchall()
    )
    assert got == exp


@given(
    seed=st.integers(0, 10_000),
    n=st.integers(2, 4),
    threshold=st.sampled_from([0.1, 0.3, 0.5, 0.8]),
)
@settings(max_examples=12, deadline=None)
def test_decontaminate_differential_vs_duckdb(seed, n, threshold):
    """Random single-space corpora, random ngram width + threshold:
    engine == the SQL twin (constant-series ngram explosion)."""
    import duckdb

    from rustac_ray.stages.decontam import decontaminate

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(12)]
    n_docs = 30
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 15)))
        for _ in range(n_docs)
    ]
    df = pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts})
    test_df = df[df.doc_id % 5 == 0]
    train_df = df[df.doc_id % 5 != 0]
    got = (
        decontaminate(
            rd.from_pandas(train_df), rd.from_pandas(test_df), n=n, threshold=threshold
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(
        f"""
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        s AS (SELECT unnest(generate_series(1, 64)) AS i),
        tri AS (SELECT doc_id, list_aggregate(w[i:i+{n}-1], 'string_agg', ' ') AS g
                FROM tok, s WHERE s.i <= len(tok.w) - {n} + 1),
        test_g AS (SELECT DISTINCT g FROM tri WHERE doc_id % 5 = 0),
        ov AS (SELECT t.doc_id, count(*) AS n_ngrams,
               sum(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS n_matched
               FROM (SELECT DISTINCT doc_id, g FROM tri WHERE doc_id % 5 <> 0) t
               LEFT JOIN test_g tg USING (g) GROUP BY t.doc_id)
        SELECT d.doc_id, CAST(coalesce(ov.n_ngrams, 0) AS BIGINT) AS n_ngrams,
               CAST(coalesce(ov.n_matched, 0) AS BIGINT) AS n_matched
        FROM documents d LEFT JOIN ov USING (doc_id) WHERE d.doc_id % 5 <> 0
        ORDER BY doc_id
        """
    ).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_ngrams"].tolist() == exp["n_ngrams"].astype(int).tolist()
    assert got["n_matched"].tolist() == exp["n_matched"].astype(int).tolist()
    assert (
        got["contaminated"]
        == (got["n_matched"] / got["n_ngrams"].clip(lower=1) >= threshold)
    ).all()


@given(seed=st.integers(0, 10_000), k=st.integers(1, 8), mg=st.booleans())
@settings(max_examples=10, deadline=None)
def test_heavy_hitters_differential_vs_duckdb(seed, k, mg):
    import duckdb

    from rustac_ray.stages.sketch import token_heavy_hitters

    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(9)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 20))) for _ in range(40)
    ]
    df = pd.DataFrame({"doc_id": np.arange(40), "text": texts})
    got = token_heavy_hitters(
        rd.from_pandas(df), k=k, mg_capacity=16 if mg else None
    ).to_pandas()
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(
        "SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM "
        "(SELECT unnest(string_split(text, ' ')) AS token FROM documents) "
        f"GROUP BY token ORDER BY cnt DESC, token LIMIT {k}"
    ).df()
    assert got["token"].tolist() == exp["token"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].astype(int).tolist()


@given(seed=st.integers(0, 10_000), rps=st.integers(1, 17), salt=st.integers(0, 3))
@settings(max_examples=10, deadline=None)
def test_shuffle_positions_differential_vs_duckdb(seed, rps, salt):
    import duckdb

    from rustac_ray.stages.shuffle import shuffle_positions

    rng = np.random.default_rng(seed)
    ids = np.unique(rng.integers(0, 10_000, 60)).astype(np.int64)
    df = pd.DataFrame({"doc_id": ids})
    got = shuffle_positions(
        rd.from_pandas(df), "doc_id", salt=salt, rows_per_shard=rps
    ).sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    exp = con.execute(
        f"SELECT doc_id, (rn - 1) // {rps} AS shard, (rn - 1) % {rps} AS pos "
        "FROM (SELECT doc_id, row_number() OVER (ORDER BY "
        f"((doc_id + {salt}) * 2654435761) % 4294967296, doc_id) AS rn "
        "FROM documents) ORDER BY doc_id"
    ).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["shard"].tolist() == exp["shard"].astype(int).tolist()
    assert got["pos_in_shard"].tolist() == exp["pos"].astype(int).tolist()
