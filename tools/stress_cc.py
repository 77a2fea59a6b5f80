"""Sharded connected-components stress (r4 VERDICT #4): run the
hash-sharded label path at >= 10^7 labels — the largest scale this
container fits comfortably — and record per-shard residency so the
10^8-10^9 shard-count math in dedup.py rests on MEASURED bytes/label.

Graph shape mirrors real LSH near-dup output: millions of tiny
components (pairs/triples) — the label-table size driver — plus one
deep chain (pointer-jump convergence) and one hot star (skew). The
component oracle is closed-form, so correctness is asserted exactly on
a deterministic sample.

Usage: python tools/stress_cc.py [n_labels] [shards]   (default 10_000_000 8)
Prints one JSON line; paste the result into NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def main():
    n_labels = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    from rustac_ray.stages.dedup import connected_components

    # pair components: nodes 2i -- 2i+1 (component = 2i), consuming most
    # of the label budget; a 10k-node chain at the top of the id space;
    # a 10k-edge star (hub = chain end) for skew
    n_pairs = (n_labels - 20_000) // 2
    chain0 = 2 * n_pairs
    chain = np.arange(chain0, chain0 + 10_000, dtype=np.int64)
    hub0 = chain0 + 10_000
    t0 = time.time()
    edges = pd.DataFrame(
        {
            "id_a": np.concatenate(
                [np.arange(n_pairs, dtype=np.int64) * 2, chain[:-1],
                 np.full(10_000, chain[-1], np.int64)]
            ),
            "id_b": np.concatenate(
                [np.arange(n_pairs, dtype=np.int64) * 2 + 1, chain[1:],
                 hub0 + np.arange(10_000, dtype=np.int64)]
            ),
        }
    )
    ds = rd.from_pandas(edges).repartition(64)
    stats: dict = {}
    t1 = time.time()
    out = connected_components(
        ds, combine="sharded", shards=shards, stats_out=stats
    ).materialize()
    t2 = time.time()
    n_out = out.count()

    # exact oracle on a deterministic sample + the planted structures
    sample = out.limit(200_000).to_pandas()
    pairs_part = sample[sample["node"] < chain0]
    assert (pairs_part["component"] == (pairs_part["node"] // 2) * 2).all()
    full = out.filter(lambda r: r["node"] >= chain0).to_pandas()
    assert (full["component"] == chain0).all()  # chain + star collapse
    assert n_out == n_labels

    srows = [s["rows"] for s in stats["shards"]]
    sbytes = [s["bytes"] for s in stats["shards"]]
    rec = {
        "n_labels": n_labels,
        "shards": shards,
        "rows_out": int(n_out),
        "build_sec": round(t1 - t0, 2),
        "cc_sec": round(t2 - t1, 2),
        "shard_rows_min": int(min(srows)),
        "shard_rows_max": int(max(srows)),
        "shard_mib_max": round(max(sbytes) / 2**20, 1),
        "bytes_per_label": round(sum(sbytes) / max(sum(srows), 1), 1),
    }
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()
