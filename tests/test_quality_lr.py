"""Distributed GD quality filter (stages/quality_lr): bit-exact weights
at any parallelism via int64 fixed-point gradient aggregation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.stages.quality_lr import (
    featurize,
    score_quality_lr,
    train_quality_lr,
)


@pytest.fixture(scope="module")
def docs(ray_session):
    rng = np.random.default_rng(17)
    rows = []
    for i in range(600):
        if i % 2:
            words = ["the", "cat", "sat", "on", "a", "mat", "and", "it", "was", "fine"]
            t = " ".join(rng.choice(words, 30))  # prose-ish: stopword-rich
        else:
            t = "".join(rng.choice(list("abc!?.,;:XYZ123"), 120))  # junk
        rows.append((f"d{i:04d}", t))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_weights_identical_at_any_parallelism(docs):
    ws = []
    for nblocks in (1, 4, 13):
        ds = rd.from_pandas(docs).repartition(nblocks)
        ws.append(train_quality_lr(ds, epochs=10))
    np.testing.assert_array_equal(ws[0], ws[1])
    np.testing.assert_array_equal(ws[0], ws[2])


def test_model_learns_the_heuristic(docs):
    ds = rd.from_pandas(docs)
    w = train_quality_lr(ds, epochs=40)
    scored = score_quality_lr(ds, w).to_pandas()
    x = featurize(docs["text"])
    label = (x[:, 3] > 0.06) & (x[:, 2] < 0.05)
    agree = (scored.set_index("doc_id")["kept"].to_numpy() == label).mean()
    assert agree > 0.9  # linear model distills the linearly-ish heuristic


def test_empty_and_null_text(ray_session):
    df = pd.DataFrame({"doc_id": ["a", "b"], "text": ["", None]})
    x = featurize(df["text"])
    assert x.shape == (2, 6) and np.isfinite(x).all()
    with pytest.raises(ValueError):
        train_quality_lr(rd.from_pandas(df.iloc[0:0]))


def test_threshold_sweep_bruteforce(ray_session):
    from rustac_ray.stages.quality_lr import threshold_sweep

    rng = np.random.default_rng(4)
    n = 5000
    df = pd.DataFrame(
        {"score": rng.uniform(0, 1, n).round(4),
         "label": rng.integers(0, 2, n).astype(np.int64)}
    )
    thr = [0.2, 0.5, 0.8]
    got = threshold_sweep(
        rd.from_pandas(df).repartition(6), "score", "label", thr
    )
    for i, t in enumerate(thr):
        pred = df["score"] >= t
        pos = df["label"] == 1
        assert got["tp"].iloc[i] == int((pred & pos).sum())
        assert got["fp"].iloc[i] == int((pred & ~pos).sum())
        assert got["fn"].iloc[i] == int((~pred & pos).sum())
        assert got["tn"].iloc[i] == int((~pred & ~pos).sum())
        assert got[["tp", "fp", "fn", "tn"]].iloc[i].sum() == n
    # monotone: raising the threshold never increases TP
    assert got["tp"].is_monotonic_decreasing
    with pytest.raises(ValueError):
        threshold_sweep(rd.from_pandas(df), "score", "label", [])
