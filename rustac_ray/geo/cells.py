"""Hierarchical discrete global grid ("cells") — the engine's H3/S2 substitute.

No h3/s2 library ships in this environment, so the engine uses a
quadtree-style equirectangular grid (the same role H3 cells play in the
north rule: a coarse, hierarchical spatial prefilter key). At resolution
``r`` the lon/lat plane [-180,180] x [-90,90] is split into 2^r x 2^r cells.
A cell id packs (resolution, y, x) into one int64:

    id = (r << 58) | (y << 29) | x        with r <= 28, x,y < 2^29

Properties used by the join / kNN / skew machinery:
- parent/child moves are bit shifts (``cell_parent``, ``cell_children``);
- neighbor rings are x/y arithmetic (``cell_ring``) for kNN expansion;
- a bbox cover at a target resolution is a vectorized cartesian expansion
  (``cover_bbox_many``), the analogue of polygon-to-cell covering;
- hot cells are refined by re-encoding members at resolution r+Δ
  (SURVEY.md §4 hot-cell refinement) — pure integer ops.

All functions are numpy-vectorized over arrays of geometries/cells.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "MAX_RES",
    "cell_encode",
    "cell_decode",
    "cell_res",
    "cell_xy",
    "cell_parent",
    "cell_children",
    "cell_ring",
    "cell_bounds",
    "cell_size_deg",
    "cover_bbox_many",
    "res_for_extent",
]

MAX_RES = 28
_RES_SHIFT = 58
_Y_SHIFT = 29
_XY_MASK = (1 << 29) - 1

_LON_SPAN = 360.0
_LAT_SPAN = 180.0


def cell_size_deg(res: int) -> tuple[float, float]:
    """(dlon, dlat) of one cell at resolution ``res``."""
    n = 1 << res
    return _LON_SPAN / n, _LAT_SPAN / n


def cell_encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized point → cell id at resolution ``res``."""
    n = 1 << res
    x = np.clip(((np.asarray(lon) + 180.0) / _LON_SPAN * n).astype(np.int64), 0, n - 1)
    y = np.clip(((np.asarray(lat) + 90.0) / _LAT_SPAN * n).astype(np.int64), 0, n - 1)
    return (np.int64(res) << _RES_SHIFT) | (y << _Y_SHIFT) | x


def cell_res(cell: np.ndarray) -> np.ndarray:
    return np.asarray(cell, dtype=np.int64) >> _RES_SHIFT


def cell_xy(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    c = np.asarray(cell, dtype=np.int64)
    return c & _XY_MASK, (c >> _Y_SHIFT) & _XY_MASK


def cell_decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id → (res, x, y)."""
    x, y = cell_xy(cell)
    return cell_res(cell), x, y


def cell_parent(cell: np.ndarray, up: int = 1) -> np.ndarray:
    r, x, y = cell_decode(cell)
    nr = r - up
    return (nr.astype(np.int64) << _RES_SHIFT) | ((y >> up) << _Y_SHIFT) | (x >> up)


def cell_children(cell: int) -> np.ndarray:
    """The 4 children of one cell (scalar helper)."""
    r, x, y = cell_decode(np.asarray([cell]))
    r, x, y = int(r[0]) + 1, int(x[0]) << 1, int(y[0]) << 1
    kids = [(r << _RES_SHIFT) | ((y + dy) << _Y_SHIFT) | (x + dx) for dy in (0, 1) for dx in (0, 1)]
    return np.asarray(kids, dtype=np.int64)


def cell_ring(cell: int, k: int) -> np.ndarray:
    """Cells at Chebyshev distance exactly ``k`` from ``cell`` (k=0 → itself).

    Used by kNN ring expansion (SURVEY.md J4). Clips at the grid edge;
    longitude does not wrap (consistent with cover_bbox_many).
    """
    r, x, y = cell_decode(np.asarray([cell]))
    r, x, y = int(r[0]), int(x[0]), int(y[0])
    n = 1 << r
    if k == 0:
        return np.asarray([cell], dtype=np.int64)
    xs, ys = [], []
    for dx in range(-k, k + 1):
        for dy in (-k, k):
            xs.append(x + dx)
            ys.append(y + dy)
    for dy in range(-k + 1, k):
        for dx in (-k, k):
            xs.append(x + dx)
            ys.append(y + dy)
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    ok = (xs >= 0) & (xs < n) & (ys >= 0) & (ys < n)
    return (np.int64(r) << _RES_SHIFT) | (ys[ok] << _Y_SHIFT) | xs[ok]


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized cell → (xmin, ymin, xmax, ymax) in lon/lat degrees."""
    r, x, y = cell_decode(cell)
    n = (np.int64(1) << r).astype(np.float64)
    dlon = _LON_SPAN / n
    dlat = _LAT_SPAN / n
    xmin = -180.0 + x * dlon
    ymin = -90.0 + y * dlat
    return xmin, ymin, xmin + dlon, ymin + dlat


def res_for_extent(width_deg: float, height_deg: float, max_cells: int = 8) -> int:
    """Finest resolution at which a bbox of this size covers <= max_cells cells."""
    span = max(max(width_deg, 1e-9) / _LON_SPAN, max(height_deg, 1e-9) / _LAT_SPAN)
    per_axis = max(int(np.sqrt(max_cells)), 1)
    res = int(np.floor(np.log2(per_axis / span))) if span < per_axis else 0
    return int(np.clip(res, 0, MAX_RES))


def cover_bbox_many(
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
    res: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bbox → covering cells at a fixed resolution.

    Returns ``(row_idx, cells)``: parallel arrays where ``cells[i]`` covers
    the bbox of input row ``row_idx[i]`` (a row expands to one entry per
    covered cell). This is the flat_map row→(cell,row) step of the
    cell-prefilter join (SURVEY.md J2) done as one numpy pass.

    Antimeridian: a bbox with ``xmin > xmax`` (legal per the STAC spec,
    bbox.rs:42-50 TODO notes the reference skips this) wraps across ±180°
    and covers the two spans [xmin,180] ∪ [-180,xmax] — handled here by a
    modulo x walk, still one vectorized pass.
    """
    n = 1 << res
    xmin = np.asarray(xmin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    x0 = np.clip((((xmin) + 180.0) / _LON_SPAN * n).astype(np.int64), 0, n - 1)
    x1 = np.clip((((xmax) + 180.0) / _LON_SPAN * n).astype(np.int64), 0, n - 1)
    y0 = np.clip(((np.asarray(ymin) + 90.0) / _LAT_SPAN * n).astype(np.int64), 0, n - 1)
    y1 = np.clip(((np.asarray(ymax) + 90.0) / _LAT_SPAN * n).astype(np.int64), 0, n - 1)
    wrap = xmin > xmax
    nx = np.where(wrap, np.minimum(n - x0 + x1 + 1, n), x1 - x0 + 1)
    ny = y1 - y0 + 1
    counts = nx * ny
    if len(counts) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # within-row flat offset 0..counts[i]-1, vectorized
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    flat = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    nx_r = np.repeat(nx, counts)
    dx = flat % nx_r
    dy = flat // nx_r
    cx = (np.repeat(x0, counts) + dx) % n  # modulo wraps x past the antimeridian
    cy = np.repeat(y0, counts) + dy
    cells = (np.int64(res) << _RES_SHIFT) | (cy << _Y_SHIFT) | cx
    return row_idx, cells
