"""Decontamination, heavy hitters, redaction, repetition stats."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from rustac_ray.stages.decontam import (
    BloomFilter,
    build_bloom,
    decontaminate,
    ngram_hash_set,
    ngram_hashes,
)
from rustac_ray.stages.sketch import token_heavy_hitters
from rustac_ray.stages.text import Redactor, repetition_stats

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------ decontam --


def _toy_tables():
    test = pd.DataFrame(
        {"doc_id": [100, 101], "text": ["alpha beta gamma delta", "x y z w"]}
    )
    train = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon",  # 2/3 trigrams in test set
                "alpha beta gamma unrelated words here",  # 1/4
                "totally different content entirely okay",  # 0
                "too short",  # no trigrams at all
            ],
        }
    )
    return train, test


def test_decontaminate_planted_overlap():
    train, test = _toy_tables()
    out = (
        decontaminate(rd.from_pandas(train), rd.from_pandas(test), n=3, threshold=0.5)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_ngrams"].tolist() == [3, 4, 3, 0]
    assert out["n_matched"].tolist() == [2, 1, 0, 0]
    assert out["contaminated"].tolist() == [True, False, False, False]


def test_ngram_hashes_distinct_per_row():
    s = pd.Series(["a b c a b c a b c"])  # repeated trigrams dedup to 3
    f = ngram_hashes(s, 3)
    assert len(f) == 3
    assert set(f["row"]) == {0}


def test_bloom_no_false_negatives_and_bounded_fpr():
    rng = np.random.default_rng(7)
    member = rng.integers(0, 2**63, 5000, dtype=np.uint64)
    other = rng.integers(0, 2**63, 20000, dtype=np.uint64)
    bf = BloomFilter(m_bits=1 << 17, k=7)
    bf.add(member)
    assert bf.contains(member).all()  # one-sided error
    fpr = bf.contains(other).mean()
    assert fpr < 0.02  # m/n≈26 bits/elem, k=7 → theoretical ~1e-4


def test_bloom_merge_equals_bulk_add():
    rng = np.random.default_rng(3)
    a, b = (rng.integers(0, 2**63, 1000, dtype=np.uint64) for _ in range(2))
    one = BloomFilter(m_bits=1 << 14, k=5)
    one.add(np.concatenate([a, b]))
    fa, fb = BloomFilter(1 << 14, 5), BloomFilter(1 << 14, 5)
    fa.add(a)
    fb.add(b)
    assert (fa.merge(fb).bits == one.bits).all()


def test_decontaminate_bloom_superset_of_exact():
    docs = rd.read_parquet(f"{SF}/documents.parquet")

    def split(df, flag):
        return df.loc[(df["doc_id"] % 10 == 0) == flag]

    test = docs.map_batches(lambda df: split(df, True), batch_format="pandas")
    train = docs.map_batches(lambda df: split(df, False), batch_format="pandas")
    exact_set = ngram_hash_set(test, n=3)
    bloom = build_bloom(test, n=3, m_bits=1 << 20, k=7)
    ex = decontaminate(train, exact_set, n=3, threshold=0.2).to_pandas()
    bl = decontaminate(train, bloom, n=3, threshold=0.2).to_pandas()
    ex_ids = set(ex.loc[ex["contaminated"], "doc_id"])
    bl_ids = set(bl.loc[bl["contaminated"], "doc_id"])
    assert ex_ids <= bl_ids  # bloom can only over-flag
    m = ex.merge(bl, on="doc_id", suffixes=("_e", "_b"))
    assert (m["n_matched_b"] >= m["n_matched_e"]).all()


# -------------------------------------------------------- heavy hitters --


def test_heavy_hitters_exact_matches_pandas():
    docs = rd.read_parquet(f"{SF}/documents.parquet")
    got = token_heavy_hitters(docs, k=5).to_pandas()
    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    vc = pdf["text"].str.split().explode().value_counts()
    exp = (
        vc.rename_axis("token")
        .reset_index(name="cnt")
        .sort_values(["cnt", "token"], ascending=[False, True])
        .head(5)
        .reset_index(drop=True)
    )
    assert got["token"].tolist() == exp["token"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()


def test_heavy_hitters_mg_path_matches_exact():
    docs = rd.read_parquet(f"{SF}/documents.parquet")
    exact = token_heavy_hitters(docs, k=8).to_pandas()
    mg = token_heavy_hitters(docs, k=8, mg_capacity=16).to_pandas()
    pd.testing.assert_frame_equal(exact, mg)


# ------------------------------------------------------------ redaction --


def test_redactor_defaults_plant():
    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "mail me at a.b@example.com or call 555-123-4567",
                "server at 10.0.0.1 is fine",
            ],
        }
    )
    out = Redactor()(df.copy())
    assert out["text"].tolist() == [
        "mail me at [EMAIL] or call [PHONE]",
        "server at [IP] is fine",
    ]
    assert out["n_redactions"].tolist() == [2, 1]


def test_redactor_word_pattern():
    df = pd.DataFrame({"doc_id": [0], "text": ["key of the value keychain key"]})
    out = Redactor([(r"\b(key|value)\b", "[T]")])(df.copy())
    assert out["text"].iloc[0] == "[T] of the [T] keychain [T]"
    assert out["n_redactions"].iloc[0] == 3


# ----------------------------------------------------------- repetition --


def test_repetition_stats_planted():
    df = pd.DataFrame({"doc_id": [7, 8], "text": ["a a a b", "x y z"]})
    out = repetition_stats(df).sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "n_tokens"] == 4
    assert out.loc[0, "n_distinct"] == 2
    assert out.loc[0, "top_count"] == 3
    assert out.loc[0, "top_token_frac"] == 0.75
    assert out.loc[1, "distinct_ratio"] == 1.0


def test_repetition_stats_empty_text():
    df = pd.DataFrame({"doc_id": [1], "text": [""]})
    out = repetition_stats(df)
    assert out["n_tokens"].iloc[0] == 0
    assert out["top_token_frac"].iloc[0] == 0.0


# ---------------------------------------------- layout independence --


def test_ngram_hashes_batch_layout_independent():
    """The ngram hash of a token sequence must not depend on which batch
    (and thus which batch-local dictionary) produced it."""
    docs = pd.read_parquet(f"{SF}/documents.parquet").head(40)
    whole = ngram_hashes(docs["text"], 3)
    whole_sets = {
        r: frozenset(whole.loc[whole["row"] == r, "h"]) for r in range(len(docs))
    }
    for lo, hi in [(0, 7), (7, 23), (23, 40)]:
        part = ngram_hashes(docs["text"].iloc[lo:hi].reset_index(drop=True), 3)
        for local_r in range(hi - lo):
            got = frozenset(part.loc[part["row"] == local_r, "h"])
            assert got == whole_sets[lo + local_r]


def test_heavy_hitters_block_layout_independent():
    """Same result at 1 block and at 13 blocks."""
    import ray.data as rd

    ds1 = rd.read_parquet(f"{SF}/documents.parquet", override_num_blocks=1)
    ds13 = rd.read_parquet(f"{SF}/documents.parquet", override_num_blocks=13)
    a = token_heavy_hitters(ds1, k=7).to_pandas()
    b = token_heavy_hitters(ds13, k=7).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_heavy_hitters_combine_paths_agree():
    docs = rd.read_parquet(f"{SF}/documents.parquet")
    a = token_heavy_hitters(docs, k=6).to_pandas()
    b = token_heavy_hitters(docs, k=6, combine="shuffle").to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_exact_dedup_string_ids_planted():
    df = pd.DataFrame(
        {
            "image_id": ["img-9", "img-2", "img-5", "img-1"],
            "caption": ["dup", "dup", "uniq", "dup"],
        }
    )
    from rustac_ray.stages.dedup import exact_dedup

    out = exact_dedup(rd.from_pandas(df), col="caption", id_col="image_id").to_pandas()
    assert sorted(out["image_id"]) == ["img-1", "img-5"]  # min string id wins


def test_langid_vectorized_equals_scalar_reference():
    import re

    from rustac_ray.stages.text import LangId, _STOPWORDS

    li = LangId()

    def scalar(text):
        toks = li.token_re.findall(text.lower())[:200]
        if not toks:
            return "und"
        best, best_n = "und", 0
        for lang, table in li.tables.items():
            n = sum(t in table for t in toks)
            if n > best_n:
                best, best_n = lang, n
        return best

    rng = np.random.default_rng(11)
    vocab = sum((list(v) for v in _STOPWORDS.values()), []) + ["zz", "été"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 260))))
        for _ in range(200)
    ] + ["", "  ", "42 !!"]
    out = li(pd.DataFrame({"text": texts}))
    assert out["lang_pred"].tolist() == [scalar(t) for t in texts]


# ----------------------------------------------------------------- bpe --


def test_bpe_train_classic_example():
    """Sennrich's toy corpus: merges pick the most frequent pair, ties
    break lexicographically, and greedy apply matches training segments."""
    from rustac_ray.stages.tokenize import _encode_word, train_bpe

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe(freqs, num_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    # the classic trace: ('e','s') count 9 first, then ('es','t') 9, ...
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    # training-set words must encode to the sequences training converged to
    enc = _encode_word("newest", ranks)
    assert "".join(enc).replace("</w>", "") == "newest"
    assert len(enc) <= 4


def test_bpe_encoder_matches_naive_on_docs():
    """Distributed encode == the oracle's replay-in-order scalar twin."""
    import pyarrow.parquet as pq

    import ray

    from rustac_ray.oracles import _expected_bpe
    from rustac_ray.stages.tokenize import BPEEncoder, train_bpe, word_frequencies

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    merges = train_bpe(word_frequencies(docs), num_merges=50)
    got = (
        docs.map_batches(
            BPEEncoder,
            fn_constructor_args=(ray.put(merges),),
            batch_format="pandas",
            concurrency=2,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        _expected_bpe(
            pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]),
            num_merges=50,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_bpe_word_frequencies_sample_mod():
    from rustac_ray.stages.tokenize import word_frequencies

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [0, 1, 2, 3], "text": ["a a", "b", "a c", "b b"]})
    )
    assert word_frequencies(docs) == {"a": 3, "b": 3, "c": 1}
    # doc_id % 2 == 0 slice only
    assert word_frequencies(docs, sample_mod=2) == {"a": 3, "c": 1}


# ------------------------------------------------------------ char LM --


def test_lm_scorer_matches_naive():
    """Vectorized reduceat scoring == scalar char-by-char oracle twin."""
    import pyarrow.parquet as pq

    import ray

    from rustac_ray.oracles import _expected_lm_scores
    from rustac_ray.stages.lm import PerplexityScorer, bigram_cost_table, train_char_lm

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    cost = bigram_cost_table(train_char_lm(docs))
    got = (
        docs.map_batches(
            PerplexityScorer,
            fn_constructor_args=(ray.put(cost),),
            batch_format="pandas",
            concurrency=2,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        _expected_lm_scores(
            pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_lm_filter_mode_planted():
    """A gibberish doc scores above the in-domain cutoff and is dropped."""
    import ray

    from rustac_ray.stages.lm import PerplexityScorer, bigram_cost_table, train_char_lm

    train = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": list(range(8)),
                "text": ["the quick brown fox jumps over the lazy dog"] * 8,
            }
        )
    )
    cost = bigram_cost_table(train_char_lm(train))
    probe = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [0, 1],
                "text": ["the quick brown fox", "zqxj vwkp qqzz xjxj"],
            }
        )
    )
    ref = ray.put(cost)
    scores = probe.map_batches(
        PerplexityScorer, fn_constructor_args=(ref,), batch_format="pandas",
        concurrency=1,
    ).to_pandas().set_index("doc_id")
    mean0 = scores.loc[0, "nll_micro"] / scores.loc[0, "n_pairs"]
    mean1 = scores.loc[1, "nll_micro"] / scores.loc[1, "n_pairs"]
    assert mean1 > mean0 * 1.5
    cutoff = int((mean0 + mean1) / 2)
    kept = probe.map_batches(
        PerplexityScorer,
        fn_constructor_args=(ref, cutoff, "filter"),
        batch_format="pandas",
        concurrency=1,
    ).to_pandas()
    assert kept["doc_id"].tolist() == [0]


def test_lm_empty_and_single_char_docs():
    import ray

    from rustac_ray.stages.lm import PerplexityScorer, bigram_cost_table, train_char_lm

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": ["", "a", "ab"]})
    )
    cost = bigram_cost_table(train_char_lm(docs))
    out = docs.map_batches(
        PerplexityScorer, fn_constructor_args=(ray.put(cost),), batch_format="pandas",
        concurrency=1,
    ).to_pandas().sort_values("doc_id")
    assert out["n_pairs"].tolist() == [0, 0, 1]
    assert out["nll_micro"].tolist()[:2] == [0, 0]
    assert out["nll_micro"].tolist()[2] > 0


# -------------------------------------------------------- normalization --


def test_normalize_text_nfc_and_whitespace():
    import unicodedata

    import ray

    from rustac_ray.stages.text import NormalizeText

    dirty = "  café   du\tmonde \n"  # NFD é + messy whitespace
    clean = "already clean"
    df = pd.DataFrame({"doc_id": [0, 1], "text": [dirty, clean]})
    out = (
        rd.from_pandas(df)
        .map_batches(NormalizeText, batch_format="pandas", concurrency=1)
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "text"] == "café du monde"
    assert out.loc[0, "text"] == unicodedata.normalize("NFC", out.loc[0, "text"])
    assert bool(out.loc[0, "changed"]) is True
    assert out.loc[1, "text"] == clean and bool(out.loc[1, "changed"]) is False


def test_daily_counts_filled_zero_fills():
    import numpy as np

    from rustac_ray.stages.aggregates import daily_counts_filled

    df = pd.DataFrame(
        {
            "collection": ["c"] * 3 + ["d"],
            "datetime": pd.to_datetime(
                ["2024-01-01", "2024-01-01", "2024-01-04", "2024-02-01"]
            ),
            "image_id": ["a", "b", "e", "f"],
        }
    )
    out = daily_counts_filled(rd.from_pandas(df)).to_pandas()
    c = out[out["collection"] == "c"].sort_values("day")
    assert len(c) == 4  # jan 1..4 inclusive, gaps zero-filled
    assert c["n_scenes"].tolist() == [2, 0, 0, 1]
    d = out[out["collection"] == "d"]
    assert len(d) == 1 and d["n_scenes"].iloc[0] == 1


def test_exact_dedup_auto_switches_to_distributed():
    """A mostly-unique corpus above the candidate cap must take the
    distributed groupby(hash).Min + native-join path (r02 verdict #6) and
    agree exactly with the driver-merge path."""
    from rustac_ray.stages.dedup import exact_dedup

    rng = np.random.default_rng(17)
    n = 600
    texts = [f"unique doc {i}" for i in range(n)]
    # plant a few dups with higher ids
    for i in rng.choice(n, 25, replace=False):
        texts[i] = f"unique doc {i % 7}"
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    ds = rd.from_pandas(df).repartition(9)
    got_dist = (
        exact_dedup(ds, combine="auto", driver_max_candidates=10,
                    num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got_driver = (
        exact_dedup(ds, combine="driver")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got_dist.columns.tolist() == got_driver.columns.tolist()
    pd.testing.assert_frame_equal(got_dist, got_driver)
    exp_ids = df.groupby("text")["doc_id"].min().sort_values().to_numpy()
    assert np.array_equal(got_dist["doc_id"].to_numpy(), exp_ids)


def test_word_frequencies_unicode_whitespace_matches_encoder():
    """Train-time and encode-time tokenization must be the SAME function:
    NBSP / vertical-tab / ideographic space split exactly like
    str.split() on both sides (r02 advice: the old Arrow RE2 \\s+ was
    ASCII-only, so the vocab diverged from encode-time words)."""
    from rustac_ray.stages.tokenize import word_frequencies

    texts = ["a b c", "d\x0be　f", "g  h"]
    df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64), "text": texts})
    wf = word_frequencies(rd.from_pandas(df))
    expected = {}
    for t in texts:
        for w in t.split():
            expected[w] = expected.get(w, 0) + 1
    assert wf == expected


def test_minhash_signatures_batch_bit_identical():
    """The vectorized batch signature path (rolling prefix-product hash +
    deduped (doc, shingle) pairs, r02 verdict #7) must be BIT-identical
    to the scalar reference on every doc shape: empty, shorter than the
    shingle, unicode, tiny, long — and across the adaptive long/short
    dispatch boundary."""
    from rustac_ray.stages.dedup import MinHasher

    rng = np.random.default_rng(9)
    words = [f"w{i}" for i in range(80)]
    short = [" ".join(rng.choice(words, int(rng.integers(0, 20)))) for _ in range(400)]
    long_ = [" ".join(rng.choice(words, 300)) for _ in range(30)]
    edge = ["", "a", "ab", "abc", "abcd", "é", "ÜNÏ  codé\t\n", "aaaa" * 50]
    mh = MinHasher(num_perm=32, shingle=4)
    for ts in (short + edge, long_ + edge, short[:10] + long_ + edge):
        got = mh.signatures(ts)
        ref = np.stack([mh.signature(t) for t in ts])
        assert got.dtype == np.uint64 and np.array_equal(got, ref)


def test_paragraph_dedup_winner_rule():
    """Boilerplate keeps exactly one copy at (min id, first position);
    within-doc repeats collapse; empty docs drop; reassembly preserves
    original paragraph order."""
    from rustac_ray.stages.dedup import paragraph_dedup

    sep = "\n\n"
    df = pd.DataFrame(
        {
            "doc_id": np.array([3, 1, 2, 9], np.int64),
            "text": [
                sep.join(["boiler", "unique-c", "boiler"]),   # id 3
                sep.join(["boiler", "unique-a"]),             # id 1: wins boiler
                sep.join(["unique-b", "boiler"]),             # id 2
                "boiler",                                      # id 9: all dup → dropped
            ],
        }
    )
    out = (
        paragraph_dedup(rd.from_pandas(df).repartition(4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out.loc[0, "text"] == sep.join(["boiler", "unique-a"])
    assert out.loc[1, "text"] == "unique-b"
    assert out.loc[2, "text"] == "unique-c"
    assert out["n_paras"].tolist() == [2, 2, 3]
    assert out["n_kept"].tolist() == [2, 1, 1]

    # distributed winner path agrees exactly
    out2 = (
        paragraph_dedup(rd.from_pandas(df).repartition(4), combine="auto",
                        driver_max_candidates=1, num_partitions=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
