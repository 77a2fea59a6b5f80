"""Raster↔vector tile assignment into a web-mercator Z-order pyramid
(SURVEY.md J5) with hot-tile skew refinement (SURVEY.md §4).

Stage 1 (stateless map_batches): each footprint bbox expands to the (z,x,y)
tiles it overlaps — one vectorized numpy pass per batch, no Python rows.

Skew handling: before the wide ``groupby(tile)`` step, a cheap pre-pass
computes per-tile partial counts inside map_batches (one row per tile per
batch — tiny), aggregates them (small shuffle), and broadcasts the set of
hot tiles (count > threshold). Rows landing on a hot tile are re-encoded at
``z + refine`` — the direct analogue of H3 resolution refinement for dense
scenes — so no single reducer group explodes at the tile groupby.

Output: (image_id, tile_z, tile_x, tile_y) assignment rows, or the grouped
per-tile manifest via ``tile_counts``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geo import tiles
from .footprint import derive_footprints

__all__ = ["assign_tiles", "tile_counts", "hot_tile_set", "hex_density_smoothed", "DEFAULT_ZOOM"]

DEFAULT_ZOOM = 8


def _explode_tiles(batch: pa.Table, z: int) -> pa.Table:
    row_idx, keys = tiles.cover_bbox_tiles(
        batch["fp_xmin"].to_numpy(),
        batch["fp_ymin"].to_numpy(),
        batch["fp_xmax"].to_numpy(),
        batch["fp_ymax"].to_numpy(),
        z,
    )
    take = pa.array(row_idx)
    out = {
        "tile_key": pa.array(keys, pa.int64()),
        "image_id": batch["image_id"].take(take),
    }
    for c in ("fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"):
        out[c] = batch[c].take(take)
    return pa.table(out)


def _partial_tile_counts(batch: pa.Table, z: int) -> pa.Table:
    """Per-batch combiner: one (tile_key, n) row per distinct tile."""
    row_idx, keys = tiles.cover_bbox_tiles(
        batch["fp_xmin"].to_numpy(),
        batch["fp_ymin"].to_numpy(),
        batch["fp_xmax"].to_numpy(),
        batch["fp_ymax"].to_numpy(),
        z,
    )
    uniq, cnt = np.unique(keys, return_counts=True)
    return pa.table({"tile_key": pa.array(uniq, pa.int64()), "n": pa.array(cnt, pa.int64())})


def hot_tile_set(
    images_with_fp: "ray.data.Dataset", z: int, threshold: int
) -> set[int]:
    """Pre-pass: tiles whose row count exceeds ``threshold``.

    Partial counts are combined inside map_batches first, so the groupby
    shuffles at most (#tiles × #batches) tiny rows, never the data.
    """
    from ray.data.aggregate import Sum

    partials = images_with_fp.map_batches(
        lambda b: _partial_tile_counts(b, z), batch_format="pyarrow"
    )
    agg = partials.groupby("tile_key").aggregate(Sum("n", alias_name="n_total"))

    def over(b: pa.Table) -> pa.Table:  # vectorized threshold, no row lambda
        import pyarrow.compute as pc

        return b.filter(pc.greater(b["n_total"], threshold))

    hot = agg.map_batches(over, batch_format="pyarrow")
    return {int(r["tile_key"]) for r in hot.take_all()}


def assign_tiles(
    images_ds: "ray.data.Dataset",
    *,
    z: int = DEFAULT_ZOOM,
    refine_threshold: int | None = None,
    refine_levels: int = 1,
    batch_size: int = 8192,
    footprints_derived: bool = False,
) -> "ray.data.Dataset":
    """Footprints → exploded tile assignment rows (with optional refinement).

    With ``refine_threshold`` set, tiles holding more rows than the
    threshold are re-encoded ``refine_levels`` zooms deeper (children tiles
    actually overlapped by each footprint), bounding the max group size of
    any downstream groupby(tile).
    """
    ds = images_ds
    if not footprints_derived:
        ds = ds.map_batches(derive_footprints, batch_format="pyarrow", batch_size=batch_size)

    hot: set[int] = set()
    if refine_threshold is not None:
        hot = hot_tile_set(ds, z, refine_threshold)
    hot_ref = ray.put(np.fromiter(hot, dtype=np.int64) if hot else np.empty(0, np.int64))

    def explode(batch: pa.Table) -> pa.Table:
        t = _explode_tiles(batch, z)
        hot_arr = ray.get(hot_ref)
        if len(hot_arr) == 0:
            res = t
        else:
            keys = t["tile_key"].to_numpy()
            is_hot = np.isin(keys, hot_arr)
            cold = t.filter(pa.array(~is_hot))
            hot_rows = t.filter(pa.array(is_hot))
            if len(hot_rows) == 0:
                res = cold
            else:
                # re-cover each hot entry at z+refine and keep ONLY the
                # children of that entry's OWN originating tile — a footprint
                # overlapping N hot tiles must emit each refined child once,
                # under its one parent (mirrors _refine_cover in
                # spatial_join.py; cf. ADVICE r01)
                r_idx, r_keys = tiles.cover_bbox_tiles(
                    hot_rows["fp_xmin"].to_numpy(),
                    hot_rows["fp_ymin"].to_numpy(),
                    hot_rows["fp_xmax"].to_numpy(),
                    hot_rows["fp_ymax"].to_numpy(),
                    z + refine_levels,
                )
                rz, rx, ry = tiles.tile_unkey(r_keys)
                parent = tiles.tile_key(
                    rz - refine_levels, rx >> refine_levels, ry >> refine_levels
                )
                own = parent == hot_rows["tile_key"].to_numpy()[r_idx]
                take = pa.array(r_idx[own])
                refined = pa.table(
                    {
                        "tile_key": pa.array(r_keys[own], pa.int64()),
                        "image_id": hot_rows["image_id"].take(take),
                        "fp_xmin": hot_rows["fp_xmin"].take(take),
                        "fp_ymin": hot_rows["fp_ymin"].take(take),
                        "fp_xmax": hot_rows["fp_xmax"].take(take),
                        "fp_ymax": hot_rows["fp_ymax"].take(take),
                    }
                )
                res = pa.concat_tables([cold, refined])
        tz, tx, ty = tiles.tile_unkey(res["tile_key"].to_numpy())
        return pa.table(
            {
                "image_id": res["image_id"],
                "tile_z": pa.array(tz, pa.int64()),
                "tile_x": pa.array(tx, pa.int64()),
                "tile_y": pa.array(ty, pa.int64()),
                "tile_key": res["tile_key"],
            }
        )

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=batch_size)


def tile_counts(assignments: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-tile scene counts: partial combine per batch, then a small groupby."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(batch["tile_key"].to_numpy(), return_counts=True)
        return pa.table(
            {"tile_key": pa.array(uniq, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    return (
        assignments.map_batches(partial, batch_format="pyarrow")
        .groupby("tile_key")
        .aggregate(Sum("n", alias_name="n_scenes"))
    )


def hex_density_smoothed(ds, *, size: float = 0.5, footprints_derived: bool = False):
    """Ring-1-smoothed hexagonal density: → (hex_cell, n_images,
    ring1_sum, smoothed) where ``ring1_sum`` is the total count of the 6
    edge neighbors and ``smoothed = n_images + ring1_sum`` — the standard
    hex-kernel density surface (spatial-noise suppression before
    hot-spot thresholding), all int64-exact.

    Scale shape: per-batch combiner counts → each count row REPLICATES to
    its 6 neighbor ids as halo contributions (7 tiny int rows per
    occupied cell, independent of image count) → one grouped Sum → filter
    to occupied cells. Only occupied cells and their halos ever exist; no
    dense grid, no driver merge.
    """
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Sum

    from ..geo.hex import hex_encode, hex_ring1
    from .footprint import derive_footprints

    def partial(batch: pa.Table) -> pa.Table:
        if not footprints_derived:
            batch = derive_footprints(batch)
        cx = (batch["fp_xmin"].to_numpy() + batch["fp_xmax"].to_numpy()) * 0.5
        cy = (batch["fp_ymin"].to_numpy() + batch["fp_ymax"].to_numpy()) * 0.5
        cell = hex_encode(cx, cy, size)
        uniq, cnt = np.unique(cell, return_counts=True)
        ring = hex_ring1(uniq)  # (U, 6)
        cells = np.concatenate([uniq, ring.ravel()])
        own = np.concatenate([cnt.astype(np.int64), np.zeros(ring.size, np.int64)])
        halo = np.concatenate(
            [np.zeros(len(uniq), np.int64), np.repeat(cnt.astype(np.int64), 6)]
        )
        return pa.table(
            {
                "hex_cell": pa.array(cells, pa.int64()),
                "own": pa.array(own, pa.int64()),
                "halo": pa.array(halo, pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hex_cell")
        .aggregate(Sum("own", alias_name="n_images"),
                   Sum("halo", alias_name="ring1_sum"))
    )

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.greater(b["n_images"], 0))
        return b.append_column(
            "smoothed",
            pa.array(b["n_images"].to_numpy() + b["ring1_sum"].to_numpy(), pa.int64()),
        )

    return merged.map_batches(finish, batch_format="pyarrow")
