"""The flagship north-rule pipeline: spatial-join + tile-assignment.

read images (column-pruned: the join never loads ``bytes``)
  → map_batches(derive_footprints)          [stateless, zero-copy Arrow]
  → broadcast_spatial_join                  [actor pool, probe side via ray.put]
  ∥ assign_tiles (+ hot-tile refinement)    [stateless + tiny count pre-pass]
  → counts / partitioned parquet out

This is the pipeline bench.py times and the driver smoke-checks.
"""

from __future__ import annotations

import pyarrow.parquet as pq

from .. import synth
from ..stages import spatial_join, tiling
from ..stages.footprint import derive_footprints

__all__ = [
    "read_images_metadata",
    "run_spatial_join",
    "run_tile_assignment",
    "flagship",
    "run_checkpointed",
]

# the join/tiling path needs only geometry metadata — pruning `bytes` and
# `caption` at the read keeps 95+% of the table's byte weight off the wire
METADATA_READ_COLUMNS = ["image_id", "w", "h", "transform", "datetime", "collection"]


def default_read_blocks() -> int:
    """Read-task fan-out: ~4 per CPU. A single-file read left at Ray's
    default becomes ONE read task, and the streaming executor then feeds
    the downstream stage serially — measured 3x slowdown at 32 CPUs."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, cpus * 4)


def read_images_metadata(sf_dir: str, *, override_num_blocks: int | None = None):
    import ray.data as rd

    fdir = synth.ensure_fixtures(sf_dir)
    return rd.read_parquet(
        f"{fdir}/images.parquet",
        columns=METADATA_READ_COLUMNS,
        override_num_blocks=override_num_blocks or default_read_blocks(),
    )


def run_spatial_join(sf_dir: str, *, concurrency: int | tuple[int, int] = 8, batch_size: int = 8192):
    fdir = synth.ensure_fixtures(sf_dir)
    images = read_images_metadata(sf_dir)
    queries = pq.read_table(f"{fdir}/query_geoms.parquet")
    return spatial_join.broadcast_spatial_join(
        images, queries, concurrency=concurrency, batch_size=batch_size
    )


def run_tile_assignment(sf_dir: str, *, z: int = 8, refine_threshold: int | None = 2000):
    images = read_images_metadata(sf_dir)
    return tiling.assign_tiles(images, z=z, refine_threshold=refine_threshold)


def flagship(sf_dir: str, *, concurrency: int | tuple[int, int] = 8, batch_size: int = 8192):
    """One fused pass: footprints → (join pairs, tile assignments).

    Footprints are derived once; the join and the tiling consume the same
    derived Dataset (Ray Data re-executes lazily per consumer, so for the
    timed bench we fuse: derive → join, then derive → tiles; both linear).
    Returns (join_ds, tiles_ds).
    """
    fdir = synth.ensure_fixtures(sf_dir)
    images = read_images_metadata(sf_dir)
    with_fp = images.map_batches(
        derive_footprints, batch_format="pyarrow", batch_size=batch_size
    )
    queries = pq.read_table(f"{fdir}/query_geoms.parquet")
    join_ds = spatial_join.broadcast_spatial_join(
        with_fp,
        queries,
        concurrency=concurrency,
        batch_size=batch_size,
        footprints_derived=True,
    )
    tiles_ds = tiling.assign_tiles(
        with_fp, z=8, refine_threshold=None, footprints_derived=True
    )
    return join_ds, tiles_ds


def run_checkpointed(
    sf_dir: str,
    out_dir: str,
    *,
    concurrency: int | tuple[int, int] = 8,
    resume: bool = True,
) -> list[dict]:
    """Flagship join with resumable partitioned output + lineage manifest
    (north rule: 'resumable from checkpoint with per-partition lineage +
    metrics'). Completed partitions recorded in ``_manifest.jsonl`` are
    skipped on rerun; returns the manifest records.
    """
    from ..state.manifest import write_partitioned

    join_ds = run_spatial_join(sf_dir, concurrency=concurrency)
    return write_partitioned(
        join_ds, out_dir, resume=resume, digest_cols=["image_id", "query_id"]
    )


def write_tile_pyramid(
    sf_dir: str,
    out_dir: str,
    *,
    z: int = 8,
    refine_threshold: int | None = 2000,
    resume: bool = True,
) -> list[dict]:
    """Materialize the Z-order tile pyramid: assignments sorted by the
    Morton tile key (one range-partition shuffle — the point of the
    operator), written as resumable partitioned parquet with lineage.

    Because the key is Z-order (geo/tiles.py), the sort's range partitions
    are spatially coherent: each output file covers a contiguous Morton
    range ≈ a compact region of the map, so a tile server or downstream
    range scan touches few files per viewport. With plain (z|y|x) packing
    the same sort would stripe the map into full-width rows instead.
    """
    from ..state.manifest import write_partitioned
    from ..stages.tiling import assign_tiles

    asn = assign_tiles(
        read_images_metadata(sf_dir), z=z, refine_threshold=refine_threshold
    ).sort("tile_key")
    return write_partitioned(
        asn, out_dir, resume=resume, digest_cols=["image_id", "tile_key"]
    )
