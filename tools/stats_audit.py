"""Per-stage ds.stats() audit of the most expensive pipelines.

Writes BENCH/STATS_AUDIT.md: for each headline pipeline, the Ray Data
operator breakdown (task counts, block counts, wall per operator) so a
reviewer can see where time goes and that no stage materializes or
starves. Run during a quiet host window:

    python tools/stats_audit.py
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def _trim(stats: str, max_lines: int = 40) -> str:
    keep = []
    for line in stats.splitlines():
        s = line.strip()
        if re.match(r"Operator \d|Suboperator \d|\* Remote wall time|\* Output rows per task|executed in", s):
            keep.append(s[:150])
    return "\n".join(keep[:max_lines])


def main() -> None:
    os.environ.setdefault("RAY_worker_niceness", "0")
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pandas as pd
    import ray.data as rd

    from rustac_ray import synth
    from rustac_ray.stages.dedup import exact_dedup, minhash_lsh_candidates
    from rustac_ray.stages.multimodal import DEFAULT_IMAGE_BATCH, DecodeStats
    from rustac_ray.stages.sketch import token_heavy_hitters
    from rustac_ray.stages.zonal import Zones, tile_pixel_stats, zonal_stats

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fdir = synth.ensure_fixtures(sf_dir)
    docs_path = synth.ensure_bench_docs(200_000)
    sections: list[tuple[str, str, float]] = []

    def audit(name: str, make):
        t0 = time.perf_counter()
        ds = make().materialize()
        wall = time.perf_counter() - t0
        sections.append((name, _trim(ds.stats()), wall))

    img_cols = ["image_id", "bytes", "w", "h", "fmt", "transform"]

    audit(
        "decode_stats (100k payload images)",
        lambda: rd.read_parquet(f"{fdir}/images.parquet").map_batches(
            DecodeStats,
            batch_format="pyarrow",
            batch_size=DEFAULT_IMAGE_BATCH,
            concurrency=8,
        ),
    )
    audit(
        "zonal_stats (100k images × 20 zones)",
        lambda: zonal_stats(
            rd.read_parquet(f"{fdir}/images.parquet", columns=img_cols),
            Zones.from_boxes(pd.read_parquet(f"{fdir}/query_boxes.parquet")),
            concurrency=8,
        ),
    )
    audit(
        "tile_mosaic z=8 (100k images)",
        lambda: tile_pixel_stats(
            rd.read_parquet(f"{fdir}/images.parquet", columns=img_cols),
            z=8,
            concurrency=8,
        ),
    )
    audit(
        "heavy_hitters (200k docs)",
        lambda: token_heavy_hitters(
            rd.read_parquet(docs_path, override_num_blocks=64), k=20
        ),
    )
    audit(
        "exact_dedup (200k docs)",
        lambda: exact_dedup(
            rd.read_parquet(docs_path, override_num_blocks=64)
        ),
    )
    audit(
        "minhash_near_dup (5k docs)",
        lambda: minhash_lsh_candidates(
            rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
            jaccard_threshold=0.7,
            concurrency=8,
        ),
    )

    out = ["# STATS AUDIT — per-operator breakdowns (ds.stats())", ""]
    out.append(
        f"Host: num_cpus={os.environ.get('RAY_GRAFT_CPUS', '16')}, "
        f"loadavg at start={os.getloadavg()[0]:.2f}. Wall times include "
        "materialize(); shapes (task counts, rows/task, stage balance) are "
        "the signal — absolute times swing with the shared-VM load."
    )
    out.append("")
    for name, stats, wall in sections:
        out.append(f"## {name} — {wall:.2f}s")
        out.append("")
        out.append("```")
        out.append(stats)
        out.append("```")
        out.append("")
    with open("/root/repo/BENCH/STATS_AUDIT.md", "w") as f:
        f.write("\n".join(out))
    print("wrote BENCH/STATS_AUDIT.md")
    ray.shutdown()


if __name__ == "__main__":
    main()
