"""Collection.summaries autogen (stages/aggregates.collection_summaries)."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.stages.aggregates import collection_summaries, summaries_dict


@pytest.fixture(scope="module")
def items(ray_session):
    return pd.DataFrame(
        {
            "collection": ["a"] * 4 + ["b"] * 3,
            "cloud": [10.0, 50.0, None, 30.0, 5.0, 80.0, 20.0],
            "orbit": [98, 98, 143, 143, 7, 7, None],
        }
    )


def test_ranges_and_sets(items):
    out = collection_summaries(
        rd.from_pandas(items), ranges=("cloud",), sets=("orbit",)
    ).to_pandas()
    d = summaries_dict(out)
    assert d["a"]["cloud"] == {"minimum": 10.0, "maximum": 50.0}
    assert d["b"]["cloud"] == {"minimum": 5.0, "maximum": 80.0}
    assert d["a"]["orbit"] == ["143", "98"]  # lexicographic (stringified)
    assert d["b"]["orbit"] == ["7"]  # null never summarizes


def test_overflow_drop_and_error(items):
    wide = pd.DataFrame(
        {"collection": ["a"] * 30, "tag": [f"t{i}" for i in range(30)]}
    )
    out = collection_summaries(
        rd.from_pandas(wide), sets=("tag",), max_distinct=25
    ).to_pandas()
    assert len(out) == 0  # the 30-value set was dropped
    with pytest.raises(ValueError, match="max_distinct"):
        collection_summaries(
            rd.from_pandas(wide), sets=("tag",), max_distinct=25,
            on_overflow="error",
        )


def test_needs_a_property(items):
    with pytest.raises(ValueError):
        collection_summaries(rd.from_pandas(items))


def test_block_level_overflow_poison(ray_session):
    # one block holds 30 distinct values for a single (group, property):
    # the partial must emit a poison marker, never the unbounded set,
    # and the final result drops (or errors on) that property
    import ray.data as rd

    wide = pd.DataFrame(
        {"collection": ["a"] * 30 + ["b"] * 3, "tag": [f"t{i}" for i in range(30)] + ["x", "y", "x"]}
    )
    ds = rd.from_pandas(wide)  # single block → block distinct == global
    out = collection_summaries(ds, sets=("tag",), max_distinct=25).to_pandas()
    d = summaries_dict(out)
    assert "a" not in d  # overflowed, dropped
    assert d["b"]["tag"] == ["x", "y"]  # small set survives
    with pytest.raises(ValueError, match="max_distinct"):
        collection_summaries(ds, sets=("tag",), max_distinct=25, on_overflow="error")


def test_set_summary_rejects_fractional_floats(ray_session):
    """A float set column that is NOT promoted-ints must raise, not merge
    distinct fractional values into one truncated entry."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from rustac_ray.stages.aggregates import collection_summaries

    df = pd.DataFrame({"collection": ["c1"] * 4, "score": [0.5, 0.9, 0.5, 0.1]})
    with pytest.raises(Exception, match="non-integral"):
        collection_summaries(
            rd.from_pandas(df), sets=["score"], ranges=[]
        ).to_pandas()
