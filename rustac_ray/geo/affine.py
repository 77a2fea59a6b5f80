"""Footprint derivation from raster shape + affine geotransform.

Semantics follow the STAC Projection extension (reference:
crates/extensions/src/projection.rs:36-43 — ``shape`` (h, w) +
``transform`` 6-element affine) and the bbox-from-geometry rule
(crates/core/src/item.rs:425-437): the footprint polygon of an image is the
quadrilateral obtained by pushing the four pixel-space corners
(0,0), (w,0), (w,h), (0,h) through the affine transform

    x = a*col + b*row + x0
    y = d*col + e*row + y0

with transform = [a, b, x0, d, e, y0] (GDAL/rasterio row-major order).
Everything is vectorized numpy over whole Arrow batches.
"""

from __future__ import annotations

import numpy as np

__all__ = ["footprint_corners", "corners_bbox"]


def footprint_corners(w: np.ndarray, h: np.ndarray, transform: np.ndarray) -> np.ndarray:
    """Vectorized footprint quads.

    Args:
        w, h: int arrays of shape (N,) — raster width/height in pixels.
        transform: float array of shape (N, 6) — [a, b, x0, d, e, y0] per row.

    Returns:
        (N, 4, 2) float64 array of corner coordinates in CCW-ish pixel
        corner order: (0,0), (w,0), (w,h), (0,h).
    """
    w = np.asarray(w, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    t = np.asarray(transform, dtype=np.float64).reshape(-1, 6)
    a, b, x0, d, e, y0 = (t[:, i] for i in range(6))
    zeros = np.zeros_like(w)
    # pixel corners (col, row): (0,0) (w,0) (w,h) (0,h)
    cols = np.stack([zeros, w, w, zeros], axis=1)  # (N,4)
    rows = np.stack([zeros, zeros, h, h], axis=1)
    xs = a[:, None] * cols + b[:, None] * rows + x0[:, None]
    ys = d[:, None] * cols + e[:, None] * rows + y0[:, None]
    return np.stack([xs, ys], axis=2)  # (N,4,2)


def corners_bbox(corners: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Bounding rect of (N, K, 2) corner arrays → (xmin, ymin, xmax, ymax)."""
    xs = corners[..., 0]
    ys = corners[..., 1]
    return xs.min(axis=1), ys.min(axis=1), xs.max(axis=1), ys.max(axis=1)
