"""Sequence packing (stages/packing) vs scalar greedy oracle."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.stages.packing import _pack_bucket_arrays, pack_sequences


def test_pack_bucket_next_fit():
    seq = _pack_bucket_arrays(np.array([100, 100, 100, 50, 260, 10]), 256)
    # 100+100 fits, +100 overflows → [0,0,1,1,2,3]: 260 clipped to own seq,
    # 10 starts fresh after the full one
    assert seq.tolist() == [0, 0, 1, 1, 2, 3]


def test_pack_bucket_zero_and_exact():
    # exact fill closes the seq only when the NEXT doc overflows; zero-token
    # docs ride along in whatever sequence is open
    seq = _pack_bucket_arrays(np.array([256, 0, 1]), 256)
    assert seq.tolist() == [0, 0, 1]


def test_pack_sequences_invariants():
    rng = np.random.default_rng(5)
    n = 2000
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "text": [" ".join(["w"] * k) for k in rng.integers(1, 400, n)],
        }
    )
    out = pack_sequences(
        rd.from_pandas(docs), budget=512, num_buckets=8
    ).to_pandas()
    assert len(out) == n
    # every non-clipped sequence fits its budget
    grp = out[~out["clipped"]].groupby(["bucket", "seq"])["n_tokens"].sum()
    assert (grp <= 512).all()
    # clipped == token count over budget
    toks = docs.set_index("doc_id")["text"].str.split().str.len()
    clipped = out.set_index("doc_id")["clipped"].reindex(toks.index)
    assert (clipped == (toks > 512)).all()
    # determinism across block layouts: repartitioned input → same packing
    out2 = pack_sequences(
        rd.from_pandas(docs).repartition(7), budget=512, num_buckets=8
    ).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_pack_sequences_matches_scalar_oracle():
    import pyarrow as pa

    from rustac_ray.oracles import _expected_packing

    rng = np.random.default_rng(13)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(300),
            "text": [" ".join(["x"] * k) for k in rng.integers(0, 300, 300)],
        }
    )
    got = (
        pack_sequences(rd.from_pandas(docs), budget=256, num_buckets=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = (
        _expected_packing(pa.Table.from_pandas(docs), budget=256, num_buckets=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ["n_tokens", "bucket", "seq", "clipped"]:
        assert (got[c].astype(exp[c].dtype) == exp[c]).all(), c
