"""Central fence for Ray 2.49's Dataset.join empty-partition crash
(stages/safejoin): adversarial low-cardinality inputs that crash a raw
``.join(num_partitions=32)`` must pass through the wrapped callsites
(exact_dedup / paragraph_dedup shuffle paths)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray
import ray.data as rd

from rustac_ray.stages.dedup import exact_dedup, paragraph_dedup
from rustac_ray.stages.safejoin import safe_join


def _low_card_docs(n=400):
    # only TWO distinct texts -> the winner-id set has 2 rows; a raw
    # num_partitions=32 hash join is then guaranteed empty partitions
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["alpha beta", "gamma delta"] * (n // 2),
        }
    )


def test_fence_is_binding_on_ray249(ray_session):
    """Version-gated pin: while on Ray 2.49 the clamp must bind for the
    adversarial shape (2 winner keys, num_partitions=32 -> 1 partition).
    The raw-join failure mode on a small session is a resource-starvation
    HANG (aggregator pool sized from num_partitions, safejoin.py
    docstring), so the raw crash can't be cheaply asserted; on a Ray
    bump this test flags the fence for re-evaluation by failing the
    version check below."""
    assert ray.__version__.startswith("2.49"), (
        f"Ray bumped to {ray.__version__}: re-test raw Dataset.join "
        "(empty-partition ArrowInvalid + aggregator starvation hang) and "
        "retire or re-gate stages/safejoin.py"
    )
    from rustac_ray.stages.safejoin import _MIN_KEYS_PER_PARTITION

    assert max(1, min(32, 2 // _MIN_KEYS_PER_PARTITION)) == 1


def test_safe_join_low_cardinality(ray_session):
    left = rd.from_pandas(
        pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": 1.0})
    )
    right = rd.from_pandas(pd.DataFrame({"k": np.array([3, 7], np.int64)}))
    got = safe_join(
        left, right, join_type="inner", num_partitions=32, on=("k",)
    ).to_pandas()
    assert sorted(got["k"]) == [3, 7]


def test_safe_join_empty_right(ray_session):
    left = rd.from_pandas(
        pd.DataFrame({"k": np.arange(10, dtype=np.int64), "v": 1.0})
    )
    right = rd.from_pandas(
        pd.DataFrame({"k": np.array([], np.int64)})
    )
    got = safe_join(left, right, join_type="inner", num_partitions=8,
                    on=("k",))
    assert got.count() == 0
    assert set(got.schema().names) == {"k", "v"}


def test_exact_dedup_shuffle_low_cardinality(ray_session):
    df = _low_card_docs()
    got = exact_dedup(
        rd.from_pandas(df).repartition(6), combine="shuffle"
    ).to_pandas()
    # winners are the lowest doc_id per distinct text
    assert sorted(got["doc_id"]) == [0, 1]


def test_paragraph_dedup_shuffle_low_cardinality(ray_session):
    # every doc is the same two paragraphs -> kept set is tiny (only the
    # winner doc keeps anything); raw join would hit empty partitions
    n = 60
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["para one\n\npara two"] * n,
        }
    )
    got = (
        paragraph_dedup(rd.from_pandas(df).repartition(5), combine="shuffle")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert got["doc_id"].tolist() == [0]
    assert got["text"].iloc[0] == "para one\n\npara two"
