"""Perf probes for this (noisy, oversubscribed) sandbox — re-measure before
trusting any round-N perf conclusion (see NOTES.md).

    python tools/perf_probe.py mp        # multiprocessing scaling curve of the join kernel (no Ray)
    python tools/perf_probe.py actors    # ray actor-pool curve of the same kernel
    python tools/perf_probe.py kernel    # serial kernel time at two batch sizes
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work(args):
    lo, hi = args
    import pyarrow.parquet as pqt

    from rustac_ray import synth
    from rustac_ray.stages.spatial_join import PreparedQueries, _BroadcastJoiner

    t = pqt.read_table(synth.ensure_bench_meta(1_000_000)).slice(lo, hi - lo)
    q, _ = synth.build_query_tables(2000, seed=7)
    j = _BroadcastJoiner.__new__(_BroadcastJoiner)
    j.pq = PreparedQueries(q)
    j.derive = True
    j._prepared = {}
    j.emit = "pairs"
    import pyarrow as pa

    j._qid_arr = pa.array(j.pq.query_ids, type=pa.string())
    t0 = time.time()
    tot = 0
    for i in range(0, t.num_rows, 31250):
        tot += len(j(t.slice(i, 31250)))
    return round(time.time() - t0, 2)


def probe_mp():
    import multiprocessing as mp

    from rustac_ray import synth

    synth.ensure_bench_meta(1_000_000)
    N = 1_000_000
    base = None
    for procs in (1, 2, 4, 8, 16):
        bounds = [(i * N // procs, (i + 1) * N // procs) for i in range(procs)]
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_work, bounds)
        t = time.time() - t0
        base = base or t
        print(f"{procs} procs: {t:.2f}s  speedup {base / t:.2f}x")


def probe_actors():
    import os

    os.environ.setdefault("RAY_worker_niceness", "0")
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from rustac_ray import synth
    from rustac_ray.stages.spatial_join import broadcast_spatial_join

    p = synth.ensure_bench_meta(1_000_000)
    q, _ = synth.build_query_tables(2000, seed=7)
    rd.read_parquet(p, override_num_blocks=128).count()
    for conc in (1, 2, 4, 8, 16, 24):
        t0 = time.time()
        broadcast_spatial_join(
            rd.read_parquet(p, override_num_blocks=128), q, concurrency=conc
        ).count()
        print(f"{conc} actors: {time.time() - t0:.2f}s")
    ray.shutdown()


def probe_kernel():
    for bs in (780, 8192, 31250):
        t = _work((0, 125_000)) if bs == 31250 else None
        # reuse _work batching for the 31250 case; measure others inline
        if t is None:
            import pyarrow.parquet as pqt

            from rustac_ray import synth
            from rustac_ray.stages.spatial_join import PreparedQueries, _BroadcastJoiner
            import pyarrow as pa

            tbl = pqt.read_table(synth.ensure_bench_meta(1_000_000)).slice(0, 125_000)
            q, _ = synth.build_query_tables(2000, seed=7)
            j = _BroadcastJoiner.__new__(_BroadcastJoiner)
            j.pq = PreparedQueries(q)
            j.derive = True
            j._prepared = {}
            j._qid_arr = pa.array(j.pq.query_ids, type=pa.string())
            t0 = time.time()
            for i in range(0, tbl.num_rows, bs):
                j(tbl.slice(i, bs))
            t = round(time.time() - t0, 2)
        print(f"batch {bs}: {t}s / 125k rows")


if __name__ == "__main__":
    {"mp": probe_mp, "actors": probe_actors, "kernel": probe_kernel}[
        sys.argv[1] if len(sys.argv) > 1 else "kernel"
    ]()
