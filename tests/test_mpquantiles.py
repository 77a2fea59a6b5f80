"""Mergeable one-pass quantile sketch (stages/sketch.MPQuantileSketch)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.stages.sketch import MPQuantileSketch, approx_quantiles

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_error(data: np.ndarray, q: float, est: float) -> float:
    """|true rank of est - q·n| / n."""
    n = len(data)
    lo = np.searchsorted(np.sort(data), est, side="left")
    hi = np.searchsorted(np.sort(data), est, side="right")
    target = q * (n - 1)
    # a value occupies the rank interval [lo, hi); error is the distance
    # from the target rank to that interval
    return max(0.0, lo - target, target - (hi - 1)) / n


@pytest.mark.parametrize(
    "data",
    [
        np.random.default_rng(1).normal(size=60_000),
        np.arange(50_000, dtype=float),          # sorted (adversarial)
        np.repeat([1.0, 2.0, 5.0], 20_000),       # heavy duplicates
    ],
    ids=["normal", "sorted", "dupes"],
)
def test_rank_error_within_bound(data):
    sk = MPQuantileSketch(cap=512)
    for s in range(0, len(data), 7919):  # uneven chunks
        sk.add(data[s : s + 7919])
    ests = sk.quantiles(QS)
    bound = sk.error_bound()
    for q, est in zip(QS, ests):
        assert _rank_error(data, q, est) <= bound, (q, est, bound)


def test_exact_when_cap_exceeds_n():
    data = np.random.default_rng(3).normal(size=500)
    sk = MPQuantileSketch(cap=1024).add(data)
    srt = np.sort(data)
    for q, est in zip(QS, sk.quantiles(QS)):
        assert est == srt[int(round(q * 499))] or _rank_error(data, q, est) <= 1 / 500


def test_merge_matches_bound_any_order():
    rng = np.random.default_rng(9)
    parts = [rng.normal(size=10_000) for _ in range(8)]
    data = np.concatenate(parts)
    for order in ([0, 1, 2, 3, 4, 5, 6, 7], [7, 3, 5, 1, 6, 0, 2, 4]):
        merged = MPQuantileSketch(cap=256)
        for i in order:
            merged.merge(MPQuantileSketch(cap=256).add(parts[i]))
        assert merged.n == len(data)
        for q, est in zip(QS, merged.quantiles(QS)):
            assert _rank_error(data, q, est) <= merged.error_bound()


def test_nan_and_empty():
    sk = MPQuantileSketch(cap=64)
    sk.add(np.array([np.nan, np.inf, 1.0, 2.0]))
    assert sk.n == 2
    assert np.isnan(MPQuantileSketch(cap=64).quantiles([0.5])[0])
    with pytest.raises(ValueError):
        MPQuantileSketch(cap=7)


def test_blob_roundtrip():
    sk = MPQuantileSketch(cap=128).add(np.arange(5000, dtype=float))
    rt = MPQuantileSketch.from_blob(sk.to_blob())
    assert rt.n == sk.n
    np.testing.assert_array_equal(rt.quantiles(QS), sk.quantiles(QS))


def test_dataset_approx_quantiles(ray_session):
    rng = np.random.default_rng(21)
    data = rng.exponential(size=40_000)
    ds = rd.from_pandas(pd.DataFrame({"v": data})).repartition(8)
    out = approx_quantiles(ds, "v", QS, cap=512)
    for q, est, eb in zip(out["q"], out["value"], out["error_bound"]):
        assert _rank_error(data, q, est) <= eb


def test_grouped_approx_quantiles(ray_session):
    from rustac_ray.stages.sketch import grouped_approx_quantiles

    rng = np.random.default_rng(31)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c"], 12_000),
            "v": np.concatenate(
                [rng.normal(0, 1, 12_000), rng.normal(50, 5, 12_000),
                 rng.exponential(2, 12_000)]
            ),
        }
    )
    ds = rd.from_pandas(df).repartition(6)
    for combine in ("driver", "shuffle"):
        out = grouped_approx_quantiles(
            ds, "g", "v", QS, cap=512, combine=combine
        )
        assert len(out) == 3 * len(QS)
        for g in ["a", "b", "c"]:
            sub = df.loc[df.g == g, "v"].to_numpy()
            rows = out[out.g == g]
            for q, est, eb in zip(rows["q"], rows["value"], rows["error_bound"]):
                assert _rank_error(sub, q, est) <= eb, (combine, g, q)


def test_grouped_driver_key_cap(ray_session):
    from rustac_ray.stages.sketch import grouped_approx_quantiles

    df = pd.DataFrame({"g": [f"k{i}" for i in range(50)], "v": np.arange(50.0)})
    with pytest.raises(ValueError, match="shuffle"):
        grouped_approx_quantiles(
            rd.from_pandas(df), "g", "v", [0.5], max_driver_keys=10
        )
