"""Distributed tree-fold of per-block partials (stages/fold.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from rustac_ray.stages.decontam import BloomFilter, build_bloom
from rustac_ray.stages.fold import tree_fold


def test_tree_fold_ten_thousand_blobs_driver_bounded():
    """10⁴ blob partials fold to ≤ fanin rows before any driver touch —
    the structural sublinearity guarantee (r03 verdict #8) — and the
    folded OR equals the serial OR."""
    rng = np.random.default_rng(5)
    nbits = 1024
    blobs = []
    for i in range(10_000):
        bits = np.zeros(nbits // 64, np.uint64)
        for pos in rng.integers(0, nbits, 3):
            bits[pos >> 6] |= np.uint64(1) << np.uint64(pos & 63)
        blobs.append(bits.tobytes())

    def or_block(t: pa.Table) -> pa.Table:
        acc = np.zeros(nbits // 64, np.uint64)
        for raw in t["bits"]:
            acc |= np.frombuffer(raw.as_py(), np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    ds = rd.from_pandas(pd.DataFrame({"bits": blobs})).repartition(64)
    folded = tree_fold(ds, or_block, fanin=32)
    rows = folded.take_all()
    assert len(rows) <= 32  # driver merge size bounded by fanin, not 10⁴
    got = np.zeros(nbits // 64, np.uint64)
    for r in rows:
        got |= np.frombuffer(r["bits"], np.uint64)
    want = np.zeros(nbits // 64, np.uint64)
    for b in blobs:
        want |= np.frombuffer(b, np.uint64)
    assert np.array_equal(got, want)


def test_tree_fold_compaction_floor_terminates():
    """A combiner that cannot shrink below one row per distinct key must
    terminate at its floor instead of spinning."""
    def compact(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby("k", sort=False)["v"].sum().reset_index()
        return pa.table({"k": pa.array(g["k"], pa.string()),
                         "v": pa.array(g["v"], pa.int64())})

    df = pd.DataFrame(
        {"k": [f"key-{i}" for i in range(500)] * 4,
         "v": np.arange(2000, dtype=np.int64)}
    )
    folded = tree_fold(rd.from_pandas(df).repartition(16), compact, fanin=8)
    out = folded.to_pandas().groupby("k")["v"].sum()
    want = df.groupby("k")["v"].sum()
    pd.testing.assert_series_equal(out.sort_index(), want.sort_index())


def test_build_bloom_tree_merge_equals_serial():
    docs = pd.DataFrame(
        {"text": [f"alpha beta {i} gamma delta epsilon" for i in range(300)]}
    )
    ds = rd.from_pandas(docs).repartition(24)
    bf = build_bloom(ds, m_bits=1 << 12, k=3, fanin=4)
    # serial twin: one filter over the whole corpus
    from rustac_ray.stages.decontam import _ngram_frame

    serial = BloomFilter(1 << 12, 3)
    serial.add(_ngram_frame(docs["text"], 3)["h"].to_numpy())
    assert np.array_equal(bf.bits, serial.bits)
