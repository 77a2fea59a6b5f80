"""Operational-loop stress test for the clustered store: many small
merges interleaved with evolve / delete / maintain(compact+vacuum) /
matview refresh, final state checked row-for-row against a pandas
control. This is the shape a scheduler drives in production — each
individual op is tested elsewhere; THIS asserts the composition holds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

import rustac_ray.sources.clustered as cl
from rustac_ray.state.matview import (
    create_matview, read_matview, refresh_matview,
)


def _mk(n, seed, tag):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-120, -70, n)
    y = rng.uniform(25, 48, n)
    return pd.DataFrame(
        {
            "image_id": [f"{tag}-{i:05d}" for i in range(n)],
            "collection": rng.choice(["a", "b", "c"], n),
            "val": rng.integers(0, 100, n).astype(np.int64),
            "fp_xmin": x,
            "fp_ymin": y,
            "fp_xmax": x + 0.05,
            "fp_ymax": y + 0.05,
        }
    )


def test_ingest_loop_composition(tmp_path, ray_session):
    store = str(tmp_path / "loop")
    base = _mk(600, 0, "base")
    cl.write_clustered(
        rd.from_pandas(base), store, footprints_derived=True, rows_per_file=64
    )
    control = base.copy()

    view = str(tmp_path / "view")
    create_matview(store, view, group_by=["collection"], sums=["val"])

    # 6 small ingest batches, maintain every other batch
    renamed = False
    for i in range(1, 7):
        batch = _mk(90, i, f"b{i}")
        if renamed:  # post-evolve ingest arrives in LIVE names
            batch = batch.rename(columns={"val": "score"})
        cl.merge_clustered(store, rd.from_pandas(batch), footprints_derived=True)
        control = pd.concat([control, batch], ignore_index=True)
        if i == 3:
            # rename mid-stream: later batches still merge (live names)
            cl.evolve_clustered(store, rename={"val": "score"})
            control = control.rename(columns={"val": "score"})
            renamed = True
        if i % 2 == 0:
            cl.maintain_clustered(store, target_rows=256, keep_versions=2)

    # an AOI delete in the middle of it all
    AOI = (-100.0, 30.0, -90.0, 40.0)
    cl.delete_clustered(store, bbox=AOI)
    hit = (
        (control["fp_xmin"] <= AOI[2]) & (control["fp_xmax"] >= AOI[0])
        & (control["fp_ymin"] <= AOI[3]) & (control["fp_ymax"] >= AOI[1])
    )
    control = control[~hit]

    cl.maintain_clustered(store, target_rows=256, keep_versions=1)

    got = cl.read_clustered(store).to_pandas()
    vcol = "score"
    g = got.sort_values("image_id").reset_index(drop=True)
    c = control.sort_values("image_id").reset_index(drop=True)
    assert list(g["image_id"]) == list(c["image_id"])
    assert (g[vcol].to_numpy() == c[vcol].to_numpy()).all()
    assert (g["collection"].to_numpy() == c["collection"].to_numpy()).all()

    # view refresh across merges+rename+deletes+compacts == recompute
    out = refresh_matview(store, view)
    assert out["mode"] in ("incremental", "full")
    mv = read_matview(view).sort_values("collection").reset_index(drop=True)
    ctrl = (
        control.groupby("collection", as_index=False)
        .agg(n=("image_id", "size"), sum_score=("score", "sum"))
        .sort_values("collection")
        .reset_index(drop=True)
    )
    assert list(mv["collection"]) == list(ctrl["collection"])
    assert (mv["n"].to_numpy() == ctrl["n"].to_numpy()).all()
    assert (mv["sum_score"].to_numpy() == ctrl["sum_score"].to_numpy()).all()

    # vacuumed history: current version still reads; very old versions gone
    with pytest.raises(ValueError):
        cl.read_clustered(store, version=0)


def test_maintain_ttl_expires_old_rows(ray_session, tmp_path, fixtures_dir):
    """r5 TTL policy: maintain(ttl_before=...) deletes rows whose item
    interval ends before the cutoff, pruning candidate files on
    tmin/tmax, then applies the normal compaction decision."""
    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data as rd

    from rustac_ray.sources.clustered import (
        maintain_clustered, read_clustered, write_clustered,
    )
    from rustac_ray.stages.footprint import derive_footprints

    t = pq.read_table(f"{fixtures_dir}/images.parquet")
    store = str(tmp_path / "ttl")
    write_clustered(
        rd.from_arrow(t).map_batches(derive_footprints, batch_format="pyarrow"),
        store, footprints_derived=True, rows_per_file=128,
    )
    dts = t["datetime"].cast("timestamp[us]").to_pandas()
    cutoff = dts.quantile(0.3)
    n_old = int((dts < cutoff).sum())
    assert 0 < n_old < len(dts)

    plan = maintain_clustered(store, ttl_before=cutoff, dry_run=True)
    assert plan["dry_run"] and "ttl_files_fully_expired" in plan

    out = maintain_clustered(store, ttl_before=cutoff)
    assert out["ttl_result"]["rows_deleted"] == n_old
    left = read_clustered(store, columns=["image_id", "datetime"]).to_pandas()
    assert len(left) == len(dts) - n_old
    assert (pd.to_datetime(left["datetime"]) >= cutoff).all()

    # idempotent: nothing left to expire
    again = maintain_clustered(store, ttl_before=cutoff)
    assert again["ttl_result"]["rows_deleted"] == 0
