"""remove_dup_spans — the corpus-rewrite half of substring dedup
(Lee et al. 2022). Brute-force differential tests for both modes and both
combine paths, plus planted-structure assertions."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.stages import dedup


def _brute_remove(texts, ids, n, min_count=2, mode="all"):
    from collections import Counter

    toks = [t.split() for t in texts]
    grams = []
    for d, ts in zip(ids, toks):
        for i in range(len(ts) - n + 1):
            grams.append((tuple(ts[i : i + n]), d, i))
    cnt = Counter(g for g, _, _ in grams)
    dup = {g for g, c in cnt.items() if c >= min_count}
    canon = {}
    if mode == "keep_first":
        for g, d, i in grams:
            if g in dup and (g not in canon or (d, i) < canon[g]):
                canon[g] = (d, i)
    out = []
    for d, ts in zip(ids, toks):
        covered = set()
        for i in range(len(ts) - n + 1):
            g = tuple(ts[i : i + n])
            if g in dup and not (mode == "keep_first" and canon.get(g) == (d, i)):
                covered.update(range(i, i + n))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out.append((d, " ".join(kept), len(ts), len(covered)))
    return out


def _run(df, **kw):
    return (
        dedup.remove_dup_spans(rd.from_pandas(df), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


TEXTS = [
    "a b c d e f g",            # 'a b c' dup'd with doc 1
    "x y a b c z w q",
    "p p p p r s t u v",        # within-doc overlap: 'p p p' at 0 and 1
    "unique words only here today",
    "",                          # empty doc
    "a b c d e f g",            # full-doc duplicate of doc 0
]


@pytest.mark.parametrize("combine", ["driver", "shuffle"])
@pytest.mark.parametrize("mode", ["all", "keep_first"])
def test_remove_dup_spans_brute_force(ray_session, combine, mode):
    ids = list(range(len(TEXTS)))
    df = pd.DataFrame({"doc_id": ids, "text": TEXTS})
    got = _run(df, n=3, mode=mode, combine=combine)
    want = _brute_remove(TEXTS, ids, n=3, mode=mode)
    assert list(got["doc_id"]) == [w[0] for w in want]
    assert list(got["text"]) == [w[1] for w in want]
    assert list(got["n_tokens"]) == [w[2] for w in want]
    assert list(got["n_removed_tokens"]) == [w[3] for w in want]


def test_keep_first_preserves_canonical_copy(ray_session):
    ids = list(range(len(TEXTS)))
    df = pd.DataFrame({"doc_id": ids, "text": TEXTS})
    allm = _run(df, n=3, mode="all")
    kf = _run(df, n=3, mode="keep_first")
    # mode=all wipes both copies of doc 0's content; keep_first keeps doc 0
    # (the globally-first occurrence) intact and wipes only doc 5
    assert allm.loc[0, "text"] == "" and allm.loc[5, "text"] == ""
    assert kf.loc[0, "text"] == "a b c d e f g"
    assert kf.loc[5, "text"] == ""
    # keep_first never removes more than mode=all
    assert (kf["n_removed_tokens"] <= allm["n_removed_tokens"]).all()


def test_string_ids_and_min_count(ray_session):
    texts = ["q w e r t y", "q w e r t y", "q w e r t y"]
    ids = ["doc-b", "doc-a", "doc-c"]
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    got = (
        dedup.remove_dup_spans(rd.from_pandas(df), n=4, mode="keep_first")
        .to_pandas()
        .set_index("doc_id")
    )
    # canonical = lexicographically smallest id ('doc-a'), not input order
    assert got.loc["doc-a", "text"] == "q w e r t y"
    assert got.loc["doc-b", "text"] == "" and got.loc["doc-c", "text"] == ""
    # min_count above the multiplicity → nothing removed
    got3 = _run(pd.DataFrame({"doc_id": [1, 2], "text": ["a b c d e", "a b c d e"]}),
                n=3, min_count=3)
    assert list(got3["n_removed_tokens"]) == [0, 0]
    assert list(got3["text"]) == ["a b c d e", "a b c d e"]


def test_random_differential_both_modes(ray_session):
    rng = np.random.default_rng(11)
    vocab = list("abcdefgh")
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 30)).tolist()) for _ in range(80)
    ]
    ids = list(range(len(texts)))
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    for mode in ("all", "keep_first"):
        got = _run(df, n=4, mode=mode)
        want = _brute_remove(texts, ids, n=4, mode=mode)
        assert list(got["text"]) == [w[1] for w in want], mode
        assert list(got["n_removed_tokens"]) == [w[3] for w in want], mode


def test_multiblock_shuffle_combine_uint64_hashes(ray_session):
    # regression: uint64 hash columns above int64-max broke Arrow block
    # concat in the multi-block shuffle path (hashes now travel as int64
    # views, same convention as exact_dedup's _hash_text_column)
    rng = np.random.default_rng(5)
    vocab = list("abcdefghijklmnop")
    texts = [" ".join(rng.choice(vocab, 40).tolist()) for _ in range(400)]
    ids = list(range(len(texts)))
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    got = (
        dedup.remove_dup_spans(
            rd.from_pandas(df).repartition(8), n=3, mode="keep_first",
            combine="shuffle",
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _brute_remove(texts, ids, n=3, mode="keep_first")
    assert list(got["text"]) == [w[1] for w in want]
    # same fix covers dup_ngram_spans' shuffle path
    cov = (
        dedup.dup_ngram_spans(
            rd.from_pandas(df).repartition(8), n=3, combine="shuffle"
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(cov["n_dup_tokens"]) == [w[3] for w in _brute_remove(texts, ids, n=3)]


def test_multiblock_layout_invariance(ray_session):
    # canonical choice must not depend on block layout
    rng = np.random.default_rng(3)
    vocab = list("abcde")
    texts = [
        " ".join(rng.choice(vocab, rng.integers(5, 25)).tolist()) for _ in range(60)
    ]
    df = pd.DataFrame({"doc_id": range(60), "text": texts})
    one = (
        dedup.remove_dup_spans(rd.from_pandas(df), n=3, mode="keep_first")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    many = (
        dedup.remove_dup_spans(
            rd.from_pandas(df).repartition(13), n=3, mode="keep_first"
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)


def test_auto_switches_to_distributed_combine(ray_session):
    # combine="auto" past driver_max_partial_rows must take the bucketed
    # distributed merge and still match the scalar truth exactly
    rng = np.random.default_rng(11)
    vocab = list("abcdefghijklmnop")
    texts = [" ".join(rng.choice(vocab, 40).tolist()) for _ in range(300)]
    ids = list(range(len(texts)))
    df = pd.DataFrame({"doc_id": ids, "text": texts})
    for mode in ("all", "keep_first"):
        got = (
            dedup.remove_dup_spans(
                rd.from_pandas(df).repartition(8), n=3, mode=mode,
                combine="auto", driver_max_partial_rows=10,  # force the switch
            )
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        want = _brute_remove(texts, ids, n=3, mode=mode)
        assert list(got["text"]) == [w[1] for w in want], mode
