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
