"""Two-phase spatial join: cell/bbox prefilter → exact intersects.

The north-rule centerpiece (SURVEY.md J2): join image footprints against a
set of query geometries, reproducing the reference's intersects/bbox search
semantics (crates/core/src/api/search.rs:236-251 — geometry∩geometry,
missing geometry → no match; crates/core/src/item.rs:457-468) generalized
from one broadcast geometry to a full probe table.

Two physical strategies, chosen by probe-side size:

1. ``broadcast_spatial_join`` (default; probe side ≲ tens of thousands):
   the query side is prepared ONCE on the driver — prepared-geometry edge
   arrays + a cell→query-ids inverted index — shipped via ``ray.put``, and
   every task reads it from the object store (never re-shipped per batch).
   A stateful actor pool (``map_batches(Cls, concurrency=N)``) holds the
   deserialized index; per batch it intersects only queries whose cover
   cells overlap the batch's cells. No shuffle at all: wall-time scales
   linearly with the image side, which is what 100 TB needs.

2. ``partitioned_spatial_join`` (both sides large): both sides explode to
   cover cells at a fixed resolution, co-shuffle with ``groupby(cell)``, and
   join within each cell. A pair found in several cells is emitted only in
   its canonical cell (the cell containing the lower-left corner of the two
   bboxes' intersection) so no distinct-shuffle is needed afterwards.

Output schema (both): (image_id: string, query_id: string).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..geo import cells
from ..geo.pip import PreparedGeometry
from ..geo.wkb import decode_bboxes
from .footprint import derive_footprints

__all__ = [
    "PreparedQueries",
    "broadcast_spatial_join",
    "partitioned_spatial_join",
    "DEFAULT_JOIN_RES",
]

DEFAULT_JOIN_RES = 7  # ~2.8 deg lon cells; footprints are << one cell


class PreparedQueries:
    """Driver-side preparation of the probe table (built once, broadcast).

    Holds prepared geometries, their bboxes, and a cell→query-index inverted
    map at ``res``. Pickles fine (numpy + lists), so a single ``ray.put``
    makes it available to every task via the object store.
    """

    def __init__(self, query_table: pa.Table, res: int = DEFAULT_JOIN_RES):
        self.res = res
        self.query_ids = query_table["query_id"].to_pylist()
        wkbs = query_table["geometry"].to_pylist()
        self.prepared = [PreparedGeometry(b) for b in wkbs]
        self.bboxes = decode_bboxes(wkbs)  # (Q,4)
        row_idx, cover = cells.cover_bbox_many(
            self.bboxes[:, 0], self.bboxes[:, 1], self.bboxes[:, 2], self.bboxes[:, 3], res
        )
        self.cell_to_queries: dict[int, np.ndarray] = {}
        order = np.argsort(cover, kind="stable")
        cov_sorted, rows_sorted = cover[order], row_idx[order]
        bounds = np.nonzero(np.diff(cov_sorted))[0] + 1
        for chunk_cells, chunk_rows in zip(
            np.split(cov_sorted, bounds), np.split(rows_sorted, bounds)
        ):
            if len(chunk_cells):
                self.cell_to_queries[int(chunk_cells[0])] = chunk_rows


class _BroadcastJoiner:
    """Actor-pool stage: exact intersects against the broadcast probe index.

    ``__init__`` runs once per actor (fetches the prepared index from the
    object store); ``__call__`` runs per Arrow batch and is fully
    vectorized: one bbox-overlap mask + one exact quad test per *candidate*
    query, where candidates come from the cell inverted index.
    """

    def __init__(self, prepared_ref):
        self.pq: PreparedQueries = ray.get(prepared_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pq_ = self.pq
        xmin = batch["fp_xmin"].to_numpy()
        ymin = batch["fp_ymin"].to_numpy()
        xmax = batch["fp_xmax"].to_numpy()
        ymax = batch["fp_ymax"].to_numpy()
        corners = (
            batch["fp_corners"].combine_chunks().flatten().to_numpy().reshape(-1, 4, 2)
            if isinstance(batch["fp_corners"], pa.ChunkedArray)
            else batch["fp_corners"].flatten().to_numpy().reshape(-1, 4, 2)
        )
        # candidate queries = union over cells covered by this batch's extent
        row_idx, cover = cells.cover_bbox_many(
            np.array([xmin.min()]) if len(xmin) else np.empty(0),
            np.array([ymin.min()]) if len(xmin) else np.empty(0),
            np.array([xmax.max()]) if len(xmin) else np.empty(0),
            np.array([ymax.max()]) if len(xmin) else np.empty(0),
            pq_.res,
        )
        cand: set[int] = set()
        for c in cover.tolist():
            qs = pq_.cell_to_queries.get(c)
            if qs is not None:
                cand.update(qs.tolist())
        img_out, q_out = [], []
        ids = batch["image_id"]
        for qi in sorted(cand):
            qb = pq_.bboxes[qi]
            mask = (xmin <= qb[2]) & (xmax >= qb[0]) & (ymin <= qb[3]) & (ymax >= qb[1])
            if not mask.any():
                continue
            sel = np.nonzero(mask)[0]
            hit = pq_.prepared[qi].intersects_quads(corners[sel])
            matched = sel[hit]
            if len(matched):
                img_out.append(ids.take(pa.array(matched)))
                q_out.append(pa.array([pq_.query_ids[qi]] * len(matched), pa.string()))
        if not img_out:
            return pa.table(
                {"image_id": pa.array([], pa.string()), "query_id": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "image_id": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in img_out]),
                "query_id": pa.concat_arrays(q_out),
            }
        )


def broadcast_spatial_join(
    images_ds: "ray.data.Dataset",
    query_table: pa.Table,
    *,
    res: int = DEFAULT_JOIN_RES,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 8192,
    footprints_derived: bool = False,
) -> "ray.data.Dataset":
    """images × queries → (image_id, query_id), broadcast strategy."""
    prepared_ref = ray.put(PreparedQueries(query_table, res))
    ds = images_ds
    if not footprints_derived:
        ds = ds.map_batches(derive_footprints, batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_args=(prepared_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ------------------------------------------------------- partitioned path ---


def _explode_images(batch: pa.Table, res: int) -> pa.Table:
    """flat_map row→(cell,row) for the image side (metadata only)."""
    row_idx, cover = cells.cover_bbox_many(
        batch["fp_xmin"].to_numpy(),
        batch["fp_ymin"].to_numpy(),
        batch["fp_xmax"].to_numpy(),
        batch["fp_ymax"].to_numpy(),
        res,
    )
    take = pa.array(row_idx)
    return pa.table(
        {
            "cell": pa.array(cover, pa.int64()),
            "image_id": batch["image_id"].take(take),
            "fp_xmin": batch["fp_xmin"].take(take),
            "fp_ymin": batch["fp_ymin"].take(take),
            "fp_xmax": batch["fp_xmax"].take(take),
            "fp_ymax": batch["fp_ymax"].take(take),
            "fp_corners": batch["fp_corners"].take(take),
        }
    )


def partitioned_spatial_join(
    images_ds: "ray.data.Dataset",
    queries_ds: "ray.data.Dataset",
    *,
    res: int = DEFAULT_JOIN_RES,
    batch_size: int = 8192,
    footprints_derived: bool = False,
) -> "ray.data.Dataset":
    """Large×large co-shuffled cell join (groupby-cell, canonical-cell dedup).

    The query side is a Dataset with (query_id, geometry WKB). Both sides
    explode to cover cells at ``res``; a union + groupby(cell) co-locates
    them; each group joins locally with exact tests. Pairs are emitted only
    from the canonical cell of the pair (cell containing the lower-left
    corner of the bbox intersection) — a shuffle-free dedup.
    """
    import pandas as pd

    ds = images_ds
    if not footprints_derived:
        ds = ds.map_batches(derive_footprints, batch_format="pyarrow", batch_size=batch_size)
    img_cells = ds.map_batches(
        lambda b: _explode_images(b, res), batch_format="pyarrow", batch_size=batch_size
    )

    def explode_queries(batch: pa.Table) -> pa.Table:
        wkbs = batch["geometry"].to_pylist()
        bb = decode_bboxes(wkbs)
        row_idx, cover = cells.cover_bbox_many(bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3], res)
        take = pa.array(row_idx)
        return pa.table(
            {
                "cell": pa.array(cover, pa.int64()),
                "query_id": batch["query_id"].take(take),
                "geometry": batch["geometry"].take(take),
                "q_xmin": pa.array(bb[row_idx, 0], pa.float64()),
                "q_ymin": pa.array(bb[row_idx, 1], pa.float64()),
                "q_xmax": pa.array(bb[row_idx, 2], pa.float64()),
                "q_ymax": pa.array(bb[row_idx, 3], pa.float64()),
            }
        )

    q_cells = queries_ds.map_batches(explode_queries, batch_format="pyarrow")

    # union with side tags, padded to one shared schema (null-filled)
    unified = pa.schema(
        [
            ("cell", pa.int64()),
            ("side", pa.string()),
            ("image_id", pa.string()),
            ("fp_xmin", pa.float64()),
            ("fp_ymin", pa.float64()),
            ("fp_xmax", pa.float64()),
            ("fp_ymax", pa.float64()),
            ("fp_corners", pa.list_(pa.float64(), 8)),
            ("query_id", pa.string()),
            ("geometry", pa.binary()),
            ("q_xmin", pa.float64()),
            ("q_ymin", pa.float64()),
            ("q_xmax", pa.float64()),
            ("q_ymax", pa.float64()),
        ]
    )

    def pad(side: str):
        def fn(b: pa.Table) -> pa.Table:
            n = len(b)
            cols = []
            for f in unified:
                if f.name == "side":
                    cols.append(pa.array([side] * n, pa.string()))
                elif f.name in b.column_names:
                    c = b[f.name]
                    cols.append(c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c)
                else:
                    cols.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(cols, schema=unified)

        return fn

    both = img_cells.map_batches(pad("i"), batch_format="pyarrow").union(
        q_cells.map_batches(pad("q"), batch_format="pyarrow")
    )

    def join_cell(group: pd.DataFrame) -> pd.DataFrame:
        imgs = group[group["side"] == "i"]
        qrys = group[group["side"] == "q"]
        empty = pd.DataFrame(
            {"image_id": pd.Series(dtype=object), "query_id": pd.Series(dtype=object)}
        )
        if imgs.empty or qrys.empty:
            return empty
        cell = int(group["cell"].iloc[0])
        corners = np.stack(imgs["fp_corners"].to_numpy()).reshape(-1, 4, 2)
        ixmin = imgs["fp_xmin"].to_numpy()
        iymin = imgs["fp_ymin"].to_numpy()
        ixmax = imgs["fp_xmax"].to_numpy()
        iymax = imgs["fp_ymax"].to_numpy()
        out_i, out_q = [], []
        for _, q in qrys.iterrows():
            mask = (
                (ixmin <= q["q_xmax"]) & (ixmax >= q["q_xmin"])
                & (iymin <= q["q_ymax"]) & (iymax >= q["q_ymin"])
            )
            if not mask.any():
                continue
            # canonical-cell dedup: lower-left corner of bbox∩bbox must be here
            ll_x = np.maximum(ixmin, q["q_xmin"])
            ll_y = np.maximum(iymin, q["q_ymin"])
            canon = cells.cell_encode(ll_x, ll_y, cells.cell_res(np.int64(cell)))
            mask &= canon == cell
            if not mask.any():
                continue
            sel = np.nonzero(mask)[0]
            pg = PreparedGeometry(bytes(q["geometry"]))
            hit = pg.intersects_quads(corners[sel])
            for ix in sel[hit]:
                out_i.append(imgs["image_id"].iloc[ix])
                out_q.append(q["query_id"])
        if not out_i:
            return empty
        return pd.DataFrame({"image_id": out_i, "query_id": out_q})

    return both.groupby("cell").map_groups(join_cell, batch_format="pandas")
