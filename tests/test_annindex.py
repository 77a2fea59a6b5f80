"""ANN index persistence roundtrip (state/annindex)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.state.annindex import load_ann_index, save_ann_index


def test_roundtrip_bit_identical(tmp_path):
    rng = np.random.default_rng(3)
    cent = rng.normal(size=(16, 32))
    cb = rng.normal(size=(4, 8, 8))
    d = str(tmp_path / "idx")
    save_ann_index(d, centroids=cent, codebooks=cb, residual=True)
    got = load_ann_index(d)
    assert got["kind"] == "ivfpq" and got["residual"] is True
    np.testing.assert_array_equal(got["centroids"], cent)
    np.testing.assert_array_equal(got["codebooks"], cb)


def test_partial_kinds_and_guards(tmp_path):
    cent = np.zeros((4, 8))
    d = str(tmp_path / "ivf_only")
    save_ann_index(d, centroids=cent)
    assert load_ann_index(d)["kind"] == "ivf"
    assert load_ann_index(d)["codebooks"] is None
    with pytest.raises(ValueError):
        save_ann_index(str(tmp_path / "x"))
    with pytest.raises(FileNotFoundError):
        load_ann_index(str(tmp_path / "nope"))


def test_loaded_index_queries_identically(tmp_path, ray_session):
    from rustac_ray.stages.embed import ivfpq_topk, train_ivf_centroids, train_pq

    rng = np.random.default_rng(11)
    n, dim = 2000, 16
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "vec_id": pa.array([f"v{i:05d}" for i in range(n)]),
            "embedding": pa.array(
                list(rng.normal(size=(n, dim))), pa.list_(pa.float64())
            ),
        }
    )
    path = str(tmp_path / "emb.parquet")
    pq.write_table(t, path)
    ds = rd.read_parquet(path)
    cent = train_ivf_centroids(ds, n_centroids=8)
    cb = train_pq(ds, m=4, k=8)
    d = str(tmp_path / "idx")
    save_ann_index(d, centroids=cent, codebooks=cb)
    loaded = load_ann_index(d)
    qs = {"q0": rng.normal(size=dim), "q1": rng.normal(size=dim)}
    a = ivfpq_topk(ds, qs, cent, cb, 5).to_pandas()
    b = ivfpq_topk(ds, qs, loaded["centroids"], loaded["codebooks"], 5).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(list(a.columns)).reset_index(drop=True),
        b.sort_values(list(b.columns)).reset_index(drop=True),
    )
