"""grouped_topk / hash sampling / HLL / exact quantiles vs brute force."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rustac_ray.stages.aggregates import grouped_topk
from rustac_ray.stages.sampling import (
    KNUTH,
    MOD32,
    hash_bucket,
    hash_sample,
    sample_sql,
    stratified_sample,
)
from rustac_ray.stages.sketch import (
    approx_distinct,
    exact_quantiles,
    hll_estimate,
    splitmix64,
)


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(3)
    n = 5000
    return pd.DataFrame(
        {
            "id": np.arange(n),
            "k": rng.choice(["a", "b", "c", "d"], n),
            "v": rng.normal(100, 15, n).round(4),
            "u": rng.integers(0, 800, n),
        }
    )


def test_grouped_topk_matches_window_sql(frame):
    got = (
        grouped_topk(rd.from_pandas(frame), "k", "v", 7, tie_cols=["id"])
        .to_pandas()
        .sort_values(["k", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            "SELECT id, k, v, u FROM (SELECT *, row_number() OVER "
            "(PARTITION BY k ORDER BY v DESC, id) rn FROM frame) "
            "WHERE rn <= 7 ORDER BY k, v DESC, id"
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["id", "k", "v", "u"]], exp)


def test_grouped_topk_ascending(frame):
    got = grouped_topk(
        rd.from_pandas(frame), "k", "v", 3, descending=False, tie_cols=["id"]
    ).to_pandas()
    for k, g in frame.groupby("k"):
        mine = got[got["k"] == k].sort_values("v")
        exp = g.sort_values(["v", "id"]).head(3)
        assert list(mine["id"]) == list(exp["id"])


def test_hash_sample_matches_sql_twin(frame):
    got = hash_sample(rd.from_pandas(frame), "id", 0.2, salt=5).to_pandas()
    exp = duckdb.sql(
        f"SELECT * FROM frame WHERE {sample_sql('id', 0.2, 5)} ORDER BY id"
    ).df()
    got = got.sort_values("id").reset_index(drop=True)
    assert list(got["id"]) == list(exp["id"])
    # rate is approximately honored
    assert 0.15 < len(got) / len(frame) < 0.25


def test_hash_sample_consistent_across_tables(frame):
    # the same keys survive when sampling a different table on the same key
    other = frame[["id"]].assign(extra=1.0)
    a = set(hash_sample(rd.from_pandas(frame), "id", 0.3).to_pandas()["id"])
    b = set(hash_sample(rd.from_pandas(other), "id", 0.3).to_pandas()["id"])
    assert a == b


def test_stratified_sample_rates(frame):
    rates = {"a": 1.0, "b": 0.5, "c": 0.0}
    got = stratified_sample(
        rd.from_pandas(frame), "id", "k", rates, default_rate=0.1
    ).to_pandas()
    by_k = got.groupby("k").size()
    n_by_k = frame.groupby("k").size()
    assert by_k.get("a", 0) == n_by_k["a"]  # keep all
    assert "c" not in by_k.index  # drop all
    assert 0.4 < by_k["b"] / n_by_k["b"] < 0.6
    assert 0.05 < by_k.get("d", 0) / n_by_k["d"] < 0.16  # default rate
    # per-row membership is exactly the hash rule
    thr_b = np.uint64(int(0.5 * MOD32))
    kept_b = set(got.loc[got["k"] == "b", "id"])
    ids_b = frame.loc[frame["k"] == "b", "id"].to_numpy()
    exp_b = set(ids_b[hash_bucket(ids_b) < thr_b])
    assert kept_b == exp_b


def test_weighted_sample_matches_brute_force(frame):
    from rustac_ray.stages.sampling import weighted_sample_n

    df = frame.assign(w=frame["u"] + 1)
    got = weighted_sample_n(rd.from_pandas(df), "id", "w", 100, salt=11).to_pandas()
    u = (hash_bucket(df["id"].to_numpy(), 11).astype(np.float64) + 1.0) / MOD32
    rank = np.power(u, 1.0 / df["w"].to_numpy().astype(np.float64))
    want = df.assign(rank=rank).sort_values(
        ["rank", "id"], ascending=[False, True]
    ).head(100)
    assert sorted(got["id"]) == sorted(want["id"])
    assert list(got.columns) == list(df.columns)


def test_weighted_sample_skips_nonpositive_weights():
    from rustac_ray.stages.sampling import weighted_sample_n

    df = pd.DataFrame({"id": np.arange(20), "w": [0] * 10 + [5] * 10})
    got = weighted_sample_n(rd.from_pandas(df), "id", "w", 15).to_pandas()
    assert len(got) == 10 and (got["id"] >= 10).all()


def test_weighted_sample_is_weight_proportional():
    """Heavy rows must be sampled far more often: with weights 1 vs 100
    and a 10% sample, the heavy stratum should dominate the selection."""
    from rustac_ray.stages.sampling import weighted_sample_n

    n = 2000
    df = pd.DataFrame({"id": np.arange(n), "w": [1] * (n // 2) + [100] * (n // 2)})
    got = weighted_sample_n(rd.from_pandas(df), "id", "w", 200, salt=5).to_pandas()
    heavy = (got["id"] >= n // 2).sum()
    assert heavy > 150  # expectation ~198 under true WRS; light tail is tiny


def test_hll_single_register_accuracy():
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 1 << 62, 200_000)
    h = splitmix64(vals)
    p = 12
    m = 1 << p
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - p)) - 1)
    bl = np.frexp(rest.astype(np.float64))[1]
    rho = ((64 - p) - bl + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, bucket, rho)
    est = hll_estimate(regs)
    true = len(np.unique(vals))
    assert abs(est - true) / true < 0.05  # 1.04/sqrt(4096) ≈ 1.6%


def test_approx_distinct_grouped(frame):
    got = (
        approx_distinct(rd.from_pandas(frame), "k", "u")
        .to_pandas()
        .set_index("k")["approx_distinct"]
    )
    true = frame.groupby("k")["u"].nunique()
    for k in true.index:
        assert abs(got[k] - true[k]) / true[k] < 0.1
    # determinism: identical second run
    again = (
        approx_distinct(rd.from_pandas(frame), "k", "u")
        .to_pandas()
        .set_index("k")["approx_distinct"]
    )
    assert (got.sort_index() == again.sort_index()).all()


def test_approx_distinct_exact_on_small_groups():
    # linear-counting regime: tiny cardinalities are EXACT at p=12
    df = pd.DataFrame({"g": ["x"] * 50 + ["y"] * 30, "v": list(range(50)) + list(range(10)) * 3})
    got = approx_distinct(rd.from_pandas(df), "g", "v").to_pandas().set_index("g")
    assert got.loc["x", "approx_distinct"] == 50
    assert got.loc["y", "approx_distinct"] == 10


@pytest.mark.parametrize("qs", [[0.5], [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]])
def test_exact_quantiles_match_duckdb(frame, qs):
    got = exact_quantiles(rd.from_pandas(frame), "v", qs, max_collect=500)
    for q, val in zip(got["q"], got["value"]):
        exp = duckdb.sql(f"SELECT quantile_disc(v, {q}) FROM frame").fetchone()[0]
        assert val == pytest.approx(float(exp), abs=0), (q, val, exp)


def test_exact_quantiles_duplicate_heavy():
    # 90% of the mass is a single value — bisection can't split it, the
    # dup guard + final gather must still return the exact element
    df = pd.DataFrame({"v": np.r_[np.full(9000, 7.25), np.linspace(0, 100, 1000)]})
    got = exact_quantiles(rd.from_pandas(df), "v", [0.5, 0.95], max_collect=100)
    exp5 = duckdb.sql("SELECT quantile_disc(v, 0.5) FROM df").fetchone()[0]
    exp95 = duckdb.sql("SELECT quantile_disc(v, 0.95) FROM df").fetchone()[0]
    assert got["value"].tolist() == [float(exp5), float(exp95)]


def test_exact_quantiles_constant_column():
    df = pd.DataFrame({"v": np.full(100, 3.5)})
    got = exact_quantiles(rd.from_pandas(df), "v", [0.1, 0.9])
    assert got["value"].tolist() == [3.5, 3.5]


def test_grouped_sample_n_matches_window_sql(frame):
    from rustac_ray.stages.sampling import grouped_sample_n

    got = (
        grouped_sample_n(rd.from_pandas(frame).repartition(6), "k", "id", 9)
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            f"SELECT id, k, v, u FROM (SELECT *, row_number() OVER "
            f"(PARTITION BY k ORDER BY (id * {KNUTH}) % {MOD32}, id) rn "
            f"FROM frame) WHERE rn <= 9 ORDER BY k, id"
        )
        .df()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["id", "k", "v", "u"]], exp)
    assert (got.groupby("k").size() == 9).all()


def test_approx_distinct_layout_independent(frame):
    a = (
        approx_distinct(rd.from_pandas(frame), "k", "u")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    b = (
        approx_distinct(rd.from_pandas(frame).repartition(11), "k", "u")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_profile_columns_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rustac_ray.stages.sketch import profile_columns

    df = pd.DataFrame(
        {
            "a": [1.0, 2.0, np.nan, -5.0],
            "b": [10, 20, 30, 40],
        }
    )
    out = profile_columns(rd.from_pandas(df), ["a", "b"]).to_pandas()
    out = out.set_index("column")
    assert out.loc["a", "n_rows"] == 4 and out.loc["a", "n_null"] == 1
    assert out.loc["a", "min_d"] == -5.0 and out.loc["a", "max_d"] == 2.0
    assert out.loc["b", "n_null"] == 0
    assert out.loc["b", "min_d"] == 10.0 and out.loc["b", "max_d"] == 40.0


def test_histogram_matches_numpy():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rustac_ray.stages.sketch import histogram

    rng = np.random.default_rng(5)
    v = np.concatenate([rng.uniform(-10, 110, 5000), [-50.0, 200.0]])
    out = histogram(rd.from_pandas(pd.DataFrame({"x": v})), "x", 0.0, 100.0, 10)
    got = dict(zip(*[c.tolist() for c in out.to_pandas().to_numpy().T]))
    b = np.minimum(np.maximum(np.floor(v / 10.0), 0), 9).astype(int)
    exp = {int(k): int(c) for k, c in zip(*np.unique(b, return_counts=True))}
    assert got == exp
    assert sum(got.values()) == len(v)


def test_rolling_window_counts_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rustac_ray.stages.aggregates import rolling_window_counts

    rng = np.random.default_rng(9)
    n = 400
    df = pd.DataFrame(
        {
            "image_id": [f"i{i:04d}" for i in range(n)],
            "collection": rng.choice(["a", "b"], n),
            "datetime": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 40 * 86400, n), unit="s"),
        }
    )
    W = 7 * 86_400_000
    got = (
        rolling_window_counts(rd.from_pandas(df), window_ms=W)
        .to_pandas()
        .set_index("image_id")["n_in_window"]
    )
    ts_all = df.set_index("image_id")
    for iid in df["image_id"].sample(50, random_state=1):
        row = ts_all.loc[iid]
        g = df[df["collection"] == row["collection"]]
        t = row["datetime"].value // 10**6
        gts = g["datetime"].astype("datetime64[ms]").astype("int64")
        exp = int(((gts >= t - W) & (gts <= t)).sum())
        assert got[iid] == exp, iid


def test_histogram_and_profile_nan_handling():
    """NaN / ±inf / NULL inputs: histogram drops non-finite values instead
    of crashing bincount; profile_columns counts ONLY true nulls as
    n_null (SQL count(*) - count(x)) and excludes NaN from min/max."""
    import pyarrow as pa

    from rustac_ray.stages.sketch import histogram, profile_columns

    t = pa.table({
        "x": pa.array([1.0, np.nan, 2.0, None, np.inf, -np.inf, 3.0],
                      pa.float64()),
    })
    ds = rd.from_arrow(t)
    h = histogram(ds, "x", 0.0, 4.0, 4).to_pandas().set_index("bin")["n"]
    assert h.to_dict() == {1: 1, 2: 1, 3: 1}
    p = profile_columns(ds, ["x"]).to_pandas().iloc[0]
    assert int(p["n_rows"]) == 7
    assert int(p["n_null"]) == 1  # the true NULL only, not the NaN
    assert p["min_d"] == 1.0 and p["max_d"] == 3.0


def test_dataset_split_partition_properties(ray_session):
    from rustac_ray.stages.sampling import dataset_split, hash_bucket

    n = 5000
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(7)
    out = dataset_split(
        ds, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)], salt=11
    ).to_pandas()
    # total partition: every row exactly once, no split missing
    assert len(out) == n and out["doc_id"].nunique() == n
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # membership is a pure function of (key, salt): recompute directly
    h = hash_bucket(df["doc_id"].to_numpy(), 11)
    expect = np.where(h < int(0.8 * 2**32), "train",
                      np.where(h < int(0.9 * 2**32), "val", "test"))
    got = out.sort_values("doc_id")["split"].to_numpy()
    assert (got == expect).all()
    with pytest.raises(ValueError):
        dataset_split(ds, "doc_id", [("a", 0.5), ("b", 0.4)])


def test_source_mix_sample_targets_and_edge_groups(ray_session):
    from rustac_ray.stages.sampling import source_mix_sample

    # big: 4000 rows, small: 30 rows, zero-weight: 100 rows
    df = pd.DataFrame({
        "doc_id": np.arange(4130, dtype=np.int64),
        "source": ["big"] * 4000 + ["small"] * 30 + ["banned"] * 100,
    })
    ds = rd.from_pandas(df).repartition(5)
    out = source_mix_sample(
        ds, "source", "doc_id", {"big": 1, "small": 1, "banned": 0},
        total_target=400, salt=3,
    ).to_pandas()
    got = out["source"].value_counts()
    # target per weighted group = 400*1//2 = 200; big is binomial(4000, .05)
    assert abs(got.get("big", 0) - 200) < 60
    # small's target (200) exceeds its population -> keeps everything
    assert got.get("small", 0) == 30
    # zero-weight group fully dropped
    assert got.get("banned", 0) == 0


def test_temperature_mix_sample_alpha_behavior(ray_session):
    from rustac_ray.stages.sampling import temperature_mix_sample

    df = pd.DataFrame({
        "doc_id": np.arange(4100, dtype=np.int64),
        "lang": ["en"] * 4000 + ["rare"] * 100,
    })
    ds = rd.from_pandas(df).repartition(5)

    # α=1: natural mix — targets proportional to population
    nat = temperature_mix_sample(ds, "lang", "doc_id", 1.0, 410).to_pandas()
    c1 = nat["lang"].value_counts()
    # en target 400, rare target 10 (binomial noise on en)
    assert abs(c1.get("en", 0) - 400) < 80
    assert 2 <= c1.get("rare", 0) <= 25

    # α=0: uniform over groups — each target 205; rare keeps ALL 100
    uni = temperature_mix_sample(ds, "lang", "doc_id", 0.0, 410).to_pandas()
    c0 = uni["lang"].value_counts()
    assert c0.get("rare", 0) == 100  # target > population -> keep all
    assert abs(c0.get("en", 0) - 205) < 70

    # α=0.5 sits between: rare's SHARE rises vs natural
    mid = temperature_mix_sample(ds, "lang", "doc_id", 0.5, 410).to_pandas()
    cm = mid["lang"].value_counts()
    share_nat = c1.get("rare", 0) / max(len(nat), 1)
    share_mid = cm.get("rare", 0) / max(len(mid), 1)
    assert share_mid > share_nat

    with pytest.raises(ValueError):
        temperature_mix_sample(ds, "lang", "doc_id", -1.0, 10)
