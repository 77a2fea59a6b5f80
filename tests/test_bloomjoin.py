"""Bloom-prefiltered semi/anti joins vs pandas truth (stages/bloomjoin)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.stages.bloomjoin import bloom_semi_join, build_key_bloom


@pytest.fixture(scope="module")
def tables(ray_session):
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": rng.integers(0, 500, 1200), "v": np.arange(1200)}
    )
    right = pd.DataFrame({"rk": rng.integers(250, 750, 800)})
    return left, right


def _truth_semi(left, right):
    return set(left.loc[left.k.isin(set(right.rk)), "v"])


def _truth_anti(left, right):
    return set(left.loc[~left.k.isin(set(right.rk)), "v"])


@pytest.mark.parametrize("verify", ["broadcast", "join"])
def test_semi_matches_truth(tables, verify):
    left, right = tables
    got = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="rk", how="semi", verify=verify, num_partitions=4,
    ).to_pandas()
    assert set(got["v"]) == _truth_semi(left, right)


@pytest.mark.parametrize("verify", ["broadcast", "join"])
def test_anti_matches_truth(tables, verify):
    left, right = tables
    got = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="rk", how="anti", verify=verify, num_partitions=4,
    ).to_pandas()
    assert set(got["v"]) == _truth_anti(left, right)


def test_false_positives_are_verified_away(tables):
    # a deliberately tiny bloom saturates (almost everything is a
    # bloom-positive); the exact verify stage must still be exact
    left, right = tables
    for how, truth in (("semi", _truth_semi), ("anti", _truth_anti)):
        got = bloom_semi_join(
            rd.from_pandas(left), rd.from_pandas(right),
            on="k", right_on="rk", how=how, m_bits=64, k=2,
            verify="broadcast",
        ).to_pandas()
        assert set(got["v"]) == truth(left, right)


def test_bloom_has_no_false_negatives(tables):
    left, right = tables
    bf = build_key_bloom(rd.from_pandas(right), "rk")
    hits = bf.contains(
        pd.util.hash_pandas_object(left["k"], index=False).to_numpy().astype(np.uint64)
    )
    member = left.k.isin(set(right.rk)).to_numpy()
    assert np.all(hits[member])  # every true member is bloom-positive


def test_string_keys(ray_session):
    left = pd.DataFrame({"k": [f"id-{i}" for i in range(100)]})
    right = pd.DataFrame({"k": [f"id-{i}" for i in range(50, 150)]})
    got = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", how="semi",
        verify="broadcast",
    ).to_pandas()
    assert set(got["k"]) == {f"id-{i}" for i in range(50, 100)}


def test_mismatched_key_dtypes_hash_equal():
    """int32/int64/float-promoted/nullable-Int key storages of the SAME
    values must produce identical hashes — a dtype mismatch between sides
    turned true members into bloom negatives (silently wrong joins)."""
    import pandas as pd

    from rustac_ray.stages.bloomjoin import _key_hashes

    vals = [-5, -1, 0, 3, 1 << 40]
    base = _key_hashes(pd.Series(vals, dtype="int64"))
    small = [v for v in vals if abs(v) < 2**31]
    small_want = _key_hashes(pd.Series(small, dtype="int64"))
    for dt in ("int32", "float64", "Int64", "Int32"):
        use_small = dt in ("int32", "Int32")
        series = pd.Series(small if use_small else vals, dtype=dt)
        got = _key_hashes(series)
        assert np.array_equal(got, small_want if use_small else base), dt
    # mixed float column: integral values match the int side per-element
    mixed = _key_hashes(pd.Series([3.0, 2.5, -1.0]))
    assert mixed[0] == base[3] and mixed[2] == base[1]
    # nullable NA hashes deterministically and not as a real key
    na = _key_hashes(pd.Series([3, None], dtype="Int64"))
    assert na[0] == base[3] and na[1] not in set(base.tolist())


def test_semi_join_across_promoted_dtypes(ray_session):
    """End-to-end: right keys stored float (pandas nullable-int promotion),
    left int64 — semi/anti must still be exact."""
    import pandas as pd

    rng = np.random.default_rng(11)
    left = pd.DataFrame({"k": rng.integers(-1000, 1000, 400).astype("int64")})
    members = left["k"].sample(n=60, random_state=2).unique()
    right = pd.DataFrame({"rk": members.astype("float64")})
    got = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", right_on="rk",
        how="semi", verify="broadcast",
    ).to_pandas()
    want = left[left["k"].isin(members)]
    assert sorted(got["k"]) == sorted(want["k"])
    got_a = bloom_semi_join(
        rd.from_pandas(left), rd.from_pandas(right), on="k", right_on="rk",
        how="anti", verify="broadcast",
    ).to_pandas()
    want_a = left[~left["k"].isin(members)]
    assert sorted(got_a["k"]) == sorted(want_a["k"])
