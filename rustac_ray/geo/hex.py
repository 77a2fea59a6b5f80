"""Hexagonal grid encoding — the H3-style hex complement to cells.py.

cells.py gives the engine its hierarchical SQUARE grid; this module adds
a pointy-top hexagonal grid (axial coordinates + cube rounding — the
standard construction, e.g. Red Blob Games' hex geometry notes), because
hex bins are the H3 shape the north rule names: equidistant neighbors
(all 6 share an edge, no corner-only adjacency) make hex binning the
better density / aggregation key.

A hex cell id packs the axial (q, r) pair into one int64:

    id = (q + OFF) << 32 | (r + OFF)      with OFF = 2^31 >> 1

All functions are numpy-vectorized; the scalar twin used by the oracle
fixtures re-implements the same formulas with ``math`` scalars (identical
IEEE multiply/divide/round, so ids agree bit-for-bit).
"""

from __future__ import annotations

import numpy as np

__all__ = ["hex_encode", "hex_decode", "hex_center", "hex_ring1", "SQRT3"]

SQRT3 = np.sqrt(3.0)
_OFF = 1 << 30


def _axial_frac(x, y, size: float):
    """lon/lat → fractional axial (q, r) for pointy-top hexes of
    circumradius ``size`` degrees."""
    q = (SQRT3 / 3.0 * x - (1.0 / 3.0) * y) / size
    r = ((2.0 / 3.0) * y) / size
    return q, r


def _cube_round(qf, rf):
    """Round fractional axial coords to the containing hex (cube rounding)."""
    xf = qf
    zf = rf
    yf = -xf - zf
    rx = np.round(xf)
    ry = np.round(yf)
    rz = np.round(zf)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & (dz > dy)
    rx = np.where(fix_x, -ry - rz, rx)
    rz = np.where(fix_z, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def hex_encode(x, y, size: float) -> np.ndarray:
    """Vectorized lon/lat → packed hex cell id."""
    qf, rf = _axial_frac(np.asarray(x, np.float64), np.asarray(y, np.float64), size)
    q, r = _cube_round(qf, rf)
    return ((q + _OFF) << 32) | (r + _OFF)


def hex_decode(ids) -> tuple[np.ndarray, np.ndarray]:
    """Packed id → axial (q, r)."""
    ids = np.asarray(ids, np.int64)
    return (ids >> 32) - _OFF, (ids & 0xFFFFFFFF) - _OFF


def hex_center(ids, size: float) -> tuple[np.ndarray, np.ndarray]:
    """Axial cell → lon/lat of its center."""
    q, r = hex_decode(ids)
    x = size * (SQRT3 * q + SQRT3 / 2.0 * r)
    y = size * (1.5 * r)
    return x, y


_RING1 = np.array([(1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1)], np.int64)


def hex_ring1(ids) -> np.ndarray:
    """(N, 6) packed ids of each cell's 6 edge neighbors."""
    q, r = hex_decode(ids)
    nq = q[:, None] + _RING1[None, :, 0]
    nr = r[:, None] + _RING1[None, :, 1]
    return ((nq + _OFF) << 32) | (nr + _OFF)
