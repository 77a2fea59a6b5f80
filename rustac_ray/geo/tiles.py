"""Web-mercator XYZ tile math (mercantile-equivalent, pure numpy).

Standard slippy-map tiling: zoom ``z`` splits the mercator square into
2^z x 2^z tiles; x grows east from lon=-180, y grows SOUTH from lat≈85.05.
Used by the raster↔vector tile-assignment operator (SURVEY.md J5): each
image footprint bbox expands to the (z,x,y) tiles it overlaps, then a
groupby(tile_key) shuffle groups scenes per tile.

Tile keys are Z-ORDER (Morton): key = (z << 58) | interleave(x, y) with
x at even bit positions. Within a zoom level, spatially adjacent tiles
are adjacent in key space, so range-partitioned sorts/writes over
tile_key cluster the pyramid spatially (the north rule's "Z-order
web-mercator tile pyramid") — a property plain (z|y|x) packing lacks.
Hash-partitioned groupbys are indifferent to the packing, so all
grouping semantics are unchanged.
"""

from __future__ import annotations

import numpy as np

__all__ = ["lonlat_to_tile", "tile_bounds", "cover_bbox_tiles", "tile_key", "tile_unkey"]

_MAX_LAT = 85.05112877980659


def _part1by1(v: np.ndarray) -> np.ndarray:
    """Spread the low 29 bits of v to the even bit positions (u64)."""
    v = np.asarray(v, dtype=np.uint64) & np.uint64((1 << 29) - 1)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def _compact1by1(v: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: gather the even bit positions into 29 bits."""
    v = np.asarray(v, dtype=np.uint64) & np.uint64(0x5555555555555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v >> np.uint64(16))) & np.uint64((1 << 29) - 1)
    return v


def tile_key(z, x, y) -> np.ndarray:
    morton = _part1by1(x) | (_part1by1(y) << np.uint64(1))
    return ((np.asarray(z, dtype=np.uint64) << np.uint64(58)) | morton).view(np.int64)


def tile_unkey(key: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    k = np.asarray(key, dtype=np.int64).view(np.uint64)
    z = (k >> np.uint64(58)).view(np.int64)
    x = _compact1by1(k).view(np.int64)
    y = _compact1by1(k >> np.uint64(1)).view(np.int64)
    return z, x, y


def _xfrac(lon):
    return (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0


def _yfrac(lat):
    lat = np.clip(np.asarray(lat, dtype=np.float64), -_MAX_LAT, _MAX_LAT)
    rad = np.radians(lat)
    return (1.0 - np.log(np.tan(rad) + 1.0 / np.cos(rad)) / np.pi) / 2.0


def lonlat_to_tile(lon, lat, z: int) -> tuple[np.ndarray, np.ndarray]:
    n = 1 << z
    x = np.clip((_xfrac(lon) * n).astype(np.int64), 0, n - 1)
    y = np.clip((_yfrac(lat) * n).astype(np.int64), 0, n - 1)
    return x, y


def tile_bounds(z, x, y) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(west, south, east, north) lon/lat bounds of tiles."""
    n = (np.int64(1) << np.asarray(z, dtype=np.int64)).astype(np.float64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    west = x / n * 360.0 - 180.0
    east = (x + 1) / n * 360.0 - 180.0

    def lat_of(yf):
        return np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * yf))))

    north = lat_of(y / n)
    south = lat_of((y + 1) / n)
    return west, south, east, north


def cover_bbox_tiles(
    xmin, ymin, xmax, ymax, z: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bbox → overlapping (z,x,y) tile keys.

    Returns (row_idx, keys) parallel arrays like cells.cover_bbox_many.
    An antimeridian-crossing bbox (xmin > xmax) covers the wrapped x span
    via a modulo walk, same as cells.cover_bbox_many.
    """
    n = 1 << z
    xmin = np.asarray(xmin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    x0 = np.clip((_xfrac(xmin) * n).astype(np.int64), 0, n - 1)
    x1 = np.clip((_xfrac(xmax) * n).astype(np.int64), 0, n - 1)
    # mercator y is flipped: ymax (north) → smaller tile y
    y0 = np.clip((_yfrac(ymax) * n).astype(np.int64), 0, n - 1)
    y1 = np.clip((_yfrac(ymin) * n).astype(np.int64), 0, n - 1)
    wrap = xmin > xmax
    nx = np.where(wrap, np.minimum(n - x0 + x1 + 1, n), x1 - x0 + 1)
    ny = y1 - y0 + 1
    counts = nx * ny
    if len(counts) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    flat = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    nx_r = np.repeat(nx, counts)
    tx = (np.repeat(x0, counts) + flat % nx_r) % n
    ty = np.repeat(y0, counts) + flat // nx_r
    return row_idx, tile_key(z, tx, ty)
