"""Footprint derivation stage: (w, h, transform) → corners, bbox, cells, WKB.

The first hop of every spatial pipeline (SURVEY.md §7 step 2): a stateless
``map_batches(batch_format="pyarrow")`` transform that pushes each image's
pixel corners through its affine geotransform (Projection-extension
semantics, reference crates/extensions/src/projection.rs:36-43) and attaches

- ``fp_corners``  fixed_size_list<double,8> — the 4 (x,y) footprint corners,
- ``fp_xmin/ymin/xmax/ymax`` — bounding rect (the cheap prefilter column,
  same role as the stac-geoparquet bbox covering,
  reference crates/core/src/geoparquet.rs:411-435),
- optionally ``geometry`` — WKB polygon (only materialized at output edges;
  the hot path stays on raw float columns),
- optionally ``cell`` — grid cell of the footprint center at a resolution.

Zero-copy in, vectorized numpy, Arrow out. Never touches ``bytes``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import affine, cells, wkb

__all__ = ["derive_footprints", "add_center_cell", "METADATA_COLUMNS"]

# the metadata-only projection used by shuffle paths: everything except the
# large binary payload (SURVEY.md §7: never carry `bytes` through shuffles)
METADATA_COLUMNS = [
    "image_id", "w", "h", "fmt", "caption", "phash", "transform",
    "datetime", "collection",
]


def _transform_matrix(batch: pa.Table) -> np.ndarray:
    col = batch["transform"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.FixedSizeListArray, pa.ListArray, pa.LargeListArray)):
        return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, 6)
    # Ray tensor-extension array (appears after a pandas round-trip) or
    # any other representation: to_numpy gives (N,6) or object-of-arrays
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype == object:
        arr = np.stack([np.asarray(a, dtype=np.float64) for a in arr])
    return np.asarray(arr, dtype=np.float64).reshape(-1, 6)


def derive_footprints(batch: pa.Table, with_wkb: bool = False) -> pa.Table:
    """map_batches body: append footprint corner/bbox columns."""
    w = batch["w"].to_numpy()
    h = batch["h"].to_numpy()
    t = _transform_matrix(batch)
    corners = affine.footprint_corners(w, h, t)  # (N,4,2)
    xmin, ymin, xmax, ymax = affine.corners_bbox(corners)
    n = len(batch)
    out = batch.append_column(
        "fp_corners",
        pa.FixedSizeListArray.from_arrays(
            pa.array(corners.reshape(-1), type=pa.float64()), 8
        ),
    )
    for name, arr in (("fp_xmin", xmin), ("fp_ymin", ymin), ("fp_xmax", xmax), ("fp_ymax", ymax)):
        out = out.append_column(name, pa.array(arr, pa.float64()))
    if with_wkb:
        out = out.append_column("geometry", pa.array(wkb.encode_quads(corners), pa.binary()))
    assert len(out) == n
    return out


def add_center_cell(batch: pa.Table, res: int) -> pa.Table:
    """Append the grid cell of the footprint center at resolution ``res``."""
    cx = (batch["fp_xmin"].to_numpy() + batch["fp_xmax"].to_numpy()) * 0.5
    cy = (batch["fp_ymin"].to_numpy() + batch["fp_ymax"].to_numpy()) * 0.5
    return batch.append_column("cell", pa.array(cells.cell_encode(cx, cy, res), pa.int64()))
