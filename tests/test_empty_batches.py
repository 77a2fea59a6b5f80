"""Zero-row batches through every round-3 stage — Ray is free to produce
them (r02 verdict #1 was exactly this class of bug in the hash join)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rustac_ray.sources.clustered import _zkey_stage
from rustac_ray.stages.align import CaptionAlignment
from rustac_ray.stages.audio import AudioStats
from rustac_ray.stages.bloomjoin import _BloomProbe, _ExactMember
from rustac_ray.stages.decontam import BloomFilter
from rustac_ray.stages.sketch import MPQuantileSketch


def test_bloom_probe_empty():
    bf = BloomFilter(1 << 10, 3)
    empty = pd.DataFrame({"k": pd.Series([], dtype=np.int64)})
    assert len(_BloomProbe(bf, "k", True)(empty)) == 0
    assert len(_BloomProbe(bf, "k", False)(empty)) == 0
    assert len(_ExactMember(np.zeros(0, np.int64), "k", True)(empty)) == 0


def test_zkey_stage_empty():
    t = pa.table(
        {
            "image_id": pa.array([], pa.string()),
            "fp_xmin": pa.array([], pa.float64()),
            "fp_ymin": pa.array([], pa.float64()),
            "fp_xmax": pa.array([], pa.float64()),
            "fp_ymax": pa.array([], pa.float64()),
        }
    )
    out = _zkey_stage(t, derive=False, bits=16)
    assert out.num_rows == 0 and "_zkey" in out.column_names
    # items-shape empty
    t2 = pa.table(
        {
            "id": pa.array([], pa.string()),
            "bbox": pa.array(
                [], pa.struct(
                    [("xmin", pa.float64()), ("ymin", pa.float64()),
                     ("xmax", pa.float64()), ("ymax", pa.float64())]
                )
            ),
        }
    )
    assert _zkey_stage(t2, derive=False, bits=16, bbox_col="bbox").num_rows == 0


def test_alignment_and_audio_empty():
    a = pa.table(
        {
            "image_id": pa.array([], pa.string()),
            "bytes": pa.array([], pa.binary()),
            "fmt": pa.array([], pa.string()),
            "caption": pa.array([], pa.string()),
        }
    )
    assert CaptionAlignment(0.1)(a).num_rows == 0
    b = pa.table(
        {
            "audio_id": pa.array([], pa.string()),
            "bytes": pa.array([], pa.binary()),
        }
    )
    assert AudioStats()(b).num_rows == 0


def test_sketch_empty_merge():
    a = MPQuantileSketch(cap=64)
    b = MPQuantileSketch(cap=64).add(np.arange(100.0))
    a.merge(b)
    assert a.n == 100


def test_sessionized_funnel_no_matching_events(ray_session):
    """No events of any funnel step: every level counts zero and the
    per-bucket empty frames union cleanly."""
    import pandas as pd
    import ray.data as rd

    from rustac_ray.stages.funnel import funnel_counts_sessionized

    df = pd.DataFrame(
        {
            "user_id": [1, 2, 3],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03"]),
            "event_type": ["other", "other", "other"],
        }
    )
    got = funnel_counts_sessionized(
        rd.from_pandas(df), ["signup", "view"], pd.Timedelta(hours=1)
    )
    assert got["n_sessions"].tolist() == [0, 0]


def test_matview_chain_empty_parent_group(ray_session, tmp_path):
    """A chain over a parent whose table lost groups still recomputes
    (empty parent -> empty child, no crash)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rustac_ray.sources.clustered import delete_clustered, write_clustered
    from rustac_ray.state.matview import (
        create_matview, create_matview_over, read_matview,
        refresh_matview, refresh_matview_over,
    )

    rng = np.random.default_rng(3)
    n = 200
    df = pd.DataFrame(
        {
            "image_id": [f"i{k}" for k in range(n)],
            "grp": rng.choice(["a", "b"], n),
            "v": rng.integers(0, 9, n).astype(np.int64),
            "fp_xmin": rng.uniform(-110, -100, n),
            "fp_ymin": rng.uniform(30, 40, n),
        }
    )
    df["fp_xmax"] = df["fp_xmin"] + 0.01
    df["fp_ymax"] = df["fp_ymin"] + 0.01
    store = str(tmp_path / "s")
    write_clustered(rd.from_pandas(df), store, footprints_derived=True,
                    rows_per_file=64)
    parent = str(tmp_path / "p")
    child = str(tmp_path / "c")
    create_matview(store, parent, group_by=["grp"], sums=["v"])
    create_matview_over(parent, child, group_by=["grp"], sums=["n"])
    # delete EVERYTHING in one bbox half -> some groups may empty
    delete_clustered(store, bbox=(-110.5, 29.0, -99.0, 41.0))
    refresh_matview(store, parent)
    out = refresh_matview_over(child)
    assert out["mode"] == "recompute"
    assert len(read_matview(child)) == len(read_matview(parent).groupby("grp"))


def test_ttl_expires_everything_leaves_empty_store(ray_session, tmp_path):
    """TTL cutoff past every row: all files drop; maintain reports the
    empty manifest instead of crashing."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rustac_ray.sources.clustered import (
        maintain_clustered, write_clustered,
    )

    n = 100
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "image_id": [f"i{k}" for k in range(n)],
            "datetime": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**5, n), unit="s"),
            "fp_xmin": rng.uniform(-110, -100, n),
            "fp_ymin": rng.uniform(30, 40, n),
        }
    )
    df["fp_xmax"] = df["fp_xmin"] + 0.01
    df["fp_ymax"] = df["fp_ymin"] + 0.01
    store = str(tmp_path / "t")
    write_clustered(rd.from_pandas(df), store, footprints_derived=True,
                    rows_per_file=32)
    out = maintain_clustered(store, ttl_before="2030-01-01")
    assert out["ttl_result"]["rows_deleted"] == n
