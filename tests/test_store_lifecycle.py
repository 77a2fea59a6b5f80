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
