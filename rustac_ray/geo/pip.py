"""Exact geometry predicates, numpy-vectorized: point-in-polygon and
quad-vs-polygon intersects.

This is the engine's GEOS substitute (no shapely in the environment). A
:class:`PreparedGeometry` precomputes edge arrays once (the analogue of
shapely prepared geometries held in the reference-inspired PIP actor pool,
see SURVEY.md J2) so per-batch work is pure broadcasting:

- ``contains_points``: crossing-number (even-odd) test of N points against
  all rings at once, O(N*E) numpy ops.
- ``intersects_quads``: exact quad-footprint vs polygon test =
  bbox reject -> any quad corner inside polygon | any polygon vertex inside
  quad | any edge-pair properly crossing.

Boundary semantics: points exactly on a polygon edge count as inside
(matches the inclusive intersects used by the reference's search — DE-9IM
"intersects" is true for touching geometries).
"""

from __future__ import annotations

import numpy as np

from .wkb import decode_geometry

__all__ = ["PreparedGeometry", "quads_contain_points"]

_EPS = 1e-12


def _rings_of(geom: dict) -> list[np.ndarray]:
    t = geom["type"]
    if t == "Polygon":
        return [np.asarray(r, dtype=np.float64) for r in geom["coordinates"]]
    if t == "MultiPolygon":
        return [
            np.asarray(r, dtype=np.float64)
            for poly in geom["coordinates"]
            for r in poly
        ]
    raise ValueError(f"not an areal geometry: {t}")


class PreparedGeometry:
    """A query geometry with precomputed edge arrays for vectorized tests.

    Point queries degrade gracefully: ``contains_points`` is exact-equality
    (within eps) and ``intersects_quads`` tests the point against each quad.
    """

    __slots__ = (
        "kind", "point", "ax", "ay", "bx", "by", "outer_mask",
        "xmin", "ymin", "xmax", "ymax", "verts", "subs",
    )

    def __init__(self, geom: dict | bytes):
        if isinstance(geom, (bytes, bytearray, memoryview)):
            geom = decode_geometry(bytes(geom))
        t = geom["type"]
        self.subs = None
        if t == "Point":
            self.kind = "point"
            self.point = np.asarray(geom["coordinates"], dtype=np.float64)
            self.xmin = self.xmax = float(self.point[0])
            self.ymin = self.ymax = float(self.point[1])
            self.verts = self.point.reshape(1, 2)
            self.ax = self.ay = self.bx = self.by = np.empty(0)
            return
        if t in ("MultiPoint", "GeometryCollection"):
            # delegate: prepared sub-geometries, OR-combined per test
            parts = (
                [{"type": "Point", "coordinates": c} for c in geom["coordinates"]]
                if t == "MultiPoint"
                else geom["geometries"]
            )
            self.kind = "collection"
            self.point = None
            self.subs = [PreparedGeometry(g) for g in parts]
            self.xmin = min(s.xmin for s in self.subs)
            self.ymin = min(s.ymin for s in self.subs)
            self.xmax = max(s.xmax for s in self.subs)
            self.ymax = max(s.ymax for s in self.subs)
            self.verts = np.concatenate([s.verts for s in self.subs])
            self.ax = self.ay = self.bx = self.by = np.empty(0)
            return
        if t in ("LineString", "MultiLineString"):
            # linear: OPEN edge chains (no ring closing), no interior
            self.kind = "line"
            self.point = None
            lines = (
                [geom["coordinates"]] if t == "LineString" else geom["coordinates"]
            )
            a_parts, b_parts = [], []
            for line in lines:
                r = np.asarray(line, dtype=np.float64)
                a_parts.append(r[:-1])
                b_parts.append(r[1:])
            a = np.concatenate(a_parts)
            b = np.concatenate(b_parts)
            self.ax, self.ay = np.ascontiguousarray(a[:, 0]), np.ascontiguousarray(a[:, 1])
            self.bx, self.by = np.ascontiguousarray(b[:, 0]), np.ascontiguousarray(b[:, 1])
            self.verts = np.concatenate(
                [np.asarray(line, dtype=np.float64) for line in lines]
            )
            self.xmin = float(self.verts[:, 0].min())
            self.ymin = float(self.verts[:, 1].min())
            self.xmax = float(self.verts[:, 0].max())
            self.ymax = float(self.verts[:, 1].max())
            return
        self.kind = "area"
        self.point = None
        rings = _rings_of(geom)
        a_parts, b_parts = [], []
        for ring in rings:
            if len(ring) >= 2 and np.allclose(ring[0], ring[-1]):
                ring = ring[:-1]
            a_parts.append(ring)
            b_parts.append(np.roll(ring, -1, axis=0))
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        self.ax, self.ay = np.ascontiguousarray(a[:, 0]), np.ascontiguousarray(a[:, 1])
        self.bx, self.by = np.ascontiguousarray(b[:, 0]), np.ascontiguousarray(b[:, 1])
        self.verts = a
        self.xmin = float(a[:, 0].min())
        self.ymin = float(a[:, 1].min())
        self.xmax = float(a[:, 0].max())
        self.ymax = float(a[:, 1].max())

    # ------------------------------------------------------------- points --

    def contains_points(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Even-odd point-in-polygon over all rings; edge-touch counts as in."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if self.kind == "point":
            return (np.abs(px - self.point[0]) < _EPS) & (np.abs(py - self.point[1]) < _EPS)
        if self.kind == "collection":
            out = np.zeros(px.shape, dtype=bool)
            for s in self.subs:
                out |= s.contains_points(px, py)
            return out
        inside = np.zeros(px.shape, dtype=bool)
        bbox_ok = (px >= self.xmin) & (px <= self.xmax) & (py >= self.ymin) & (py <= self.ymax)
        if not bbox_ok.any():
            return inside
        idx = np.nonzero(bbox_ok)[0]
        x = px[idx][:, None]  # (M,1)
        y = py[idx][:, None]
        ax, ay, bx, by = self.ax[None, :], self.ay[None, :], self.bx[None, :], self.by[None, :]
        # crossing-number: edge straddles the horizontal line through y
        straddle = (ay > y) != (by > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ax + (y - ay) * (bx - ax) / (by - ay)
        crosses = straddle & (x < xint)
        # a line has no interior: only boundary hits count
        inner = (
            crosses.sum(axis=1) % 2 == 1
            if self.kind == "area"
            else np.zeros(len(idx), dtype=bool)
        )
        # boundary: point on an edge segment counts as inside
        cross = (bx - ax) * (y - ay) - (by - ay) * (x - ax)
        on_line = np.abs(cross) < 1e-9
        within_seg = (
            (x >= np.minimum(ax, bx) - _EPS) & (x <= np.maximum(ax, bx) + _EPS)
            & (y >= np.minimum(ay, by) - _EPS) & (y <= np.maximum(ay, by) + _EPS)
        )
        on_boundary = (on_line & within_seg).any(axis=1)
        inside[idx] = inner | on_boundary
        return inside

    # -------------------------------------------------------------- quads --

    def intersects_quads(self, corners: np.ndarray) -> np.ndarray:
        """Exact intersects of (N,4,2) quads against this geometry."""
        corners = np.asarray(corners, dtype=np.float64)
        n = corners.shape[0]
        if n == 0:
            return np.zeros(0, dtype=bool)
        qxmin = corners[:, :, 0].min(axis=1)
        qxmax = corners[:, :, 0].max(axis=1)
        qymin = corners[:, :, 1].min(axis=1)
        qymax = corners[:, :, 1].max(axis=1)
        cand = (
            (qxmin <= self.xmax + _EPS) & (qxmax >= self.xmin - _EPS)
            & (qymin <= self.ymax + _EPS) & (qymax >= self.ymin - _EPS)
        )
        out = np.zeros(n, dtype=bool)
        if not cand.any():
            return out
        idx = np.nonzero(cand)[0]
        sub = corners[idx]  # (M,4,2)
        if self.kind == "point":
            out[idx] = quads_contain_points(
                sub, np.full(len(idx), self.point[0]), np.full(len(idx), self.point[1])
            )
            return out
        if self.kind == "collection":
            hit = np.zeros(len(idx), dtype=bool)
            for s in self.subs:
                hit |= s.intersects_quads(sub)
            out[idx] = hit
            return out
        m = len(idx)
        hit = np.zeros(m, dtype=bool)
        # (a) any quad corner inside polygon
        flat = sub.reshape(-1, 2)
        corner_in = self.contains_points(flat[:, 0], flat[:, 1]).reshape(m, 4)
        hit |= corner_in.any(axis=1)
        # (b) any polygon vertex inside quad
        todo = ~hit
        if todo.any():
            vin = _points_in_quads_any(sub[todo], self.verts)
            hit[np.nonzero(todo)[0]] |= vin
        # (c) any edge pair crossing
        todo = ~hit
        if todo.any():
            ecross = _quad_edges_cross(sub[todo], self.ax, self.ay, self.bx, self.by)
            hit[np.nonzero(todo)[0]] |= ecross
        out[idx] = hit
        return out


    def intersects_polygon(self, rings: list[np.ndarray]) -> bool:
        """Exact intersects against one arbitrary polygon (list of rings).

        vertex-in either way | any proper edge crossing. Used by the CQL2
        S_INTERSECTS evaluator for non-quad stored geometries.
        """
        outer = np.asarray(rings[0], dtype=np.float64)
        if len(outer) >= 2 and np.allclose(outer[0], outer[-1]):
            outer = outer[:-1]
        if self.kind == "collection":
            return any(s.intersects_polygon(rings) for s in self.subs)
        if self.kind == "point":
            other = PreparedGeometry({"type": "Polygon", "coordinates": [r.tolist() if isinstance(r, np.ndarray) else r for r in rings]})
            return bool(other.contains_points(self.point[:1], self.point[1:2])[0])
        if self.contains_points(outer[:, 0], outer[:, 1]).any():
            return True
        other = PreparedGeometry({"type": "Polygon", "coordinates": [np.asarray(r).tolist() for r in rings]})
        if other.contains_points(self.verts[:, 0], self.verts[:, 1]).any():
            return True
        # proper edge crossings: all candidate edges × all prepared edges
        a = outer
        b = np.roll(outer, -1, axis=0)
        cross = _seg_cross(
            a[:, 0][:, None], a[:, 1][:, None], b[:, 0][:, None], b[:, 1][:, None],
            self.ax[None, :], self.ay[None, :], self.bx[None, :], self.by[None, :],
        )
        return bool(cross.any())


def pairwise_quad_poly_intersects(
    corners: np.ndarray,
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
    vx: np.ndarray,
    vy: np.ndarray,
    chunk: int = 8192,
) -> np.ndarray:
    """Fully-vectorized PAIRWISE exact intersects: quad i vs polygon i.

    Args: corners (P,4,2); polygon edges ax/ay→bx/by and vertices vx/vy as
    NaN-padded (P,E) / (P,V) matrices (each row = one polygon's edges,
    padded with NaN — NaN comparisons evaluate False so pads contribute
    nothing to crossing counts or containment votes).

    One call replaces P tiny ``PreparedGeometry.intersects_quads`` calls —
    the per-call numpy overhead was the hot cost in the join's exact phase.
    ``chunk`` keeps the (chunk,4,E) temporaries L3-resident: measured 2.8x
    aggregate throughput over 64k chunks when 8 workers run concurrently
    (DRAM-bandwidth-bound otherwise).
    """
    P = corners.shape[0]
    out = np.empty(P, dtype=bool)
    for s in range(0, P, chunk):
        e = min(s + chunk, P)
        out[s:e] = _pairwise_chunk(
            corners[s:e], ax[s:e], ay[s:e], bx[s:e], by[s:e], vx[s:e], vy[s:e]
        )
    return out


def _pairwise_chunk(corners, ax, ay, bx, by, vx, vy) -> np.ndarray:
    # Phases run cheapest-first and SHORT-CIRCUIT: on real join workloads
    # phase (a) alone decides ~70% of candidate pairs (measured on the 1M-row
    # bench: 69,579/97,731), so (b)/(c) — (c) is 4 orient passes, the most
    # memory-traffic-heavy — only touch the undecided minority. Identical
    # boolean result to evaluating all three unconditionally.
    out = _corners_in_poly(corners, ax, ay, bx, by)  # (a)
    todo = np.nonzero(~out)[0]
    if todo.size:
        vi = _verts_in_quad(corners[todo], vx[todo], vy[todo])  # (b)
        out[todo[vi]] = True
        rest = todo[~vi]
        if rest.size:
            out[rest] = _quad_poly_ecross(  # (c)
                corners[rest], ax[rest], ay[rest], bx[rest], by[rest]
            )
    return out


def _corners_in_poly(corners, ax, ay, bx, by) -> np.ndarray:
    """(a) any quad corner inside its polygon (even-odd over padded edges)."""
    qx = corners[:, :, 0][:, :, None]  # (P,4,1)
    qy = corners[:, :, 1][:, :, None]
    Ax, Ay = ax[:, None, :], ay[:, None, :]  # (P,1,E)
    Bx, By = bx[:, None, :], by[:, None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        straddle = (Ay > qy) != (By > qy)
        xint = Ax + (qy - Ay) * (Bx - Ax) / (By - Ay)
        crosses = straddle & (qx < xint)
        inner = crosses.sum(axis=2) % 2 == 1  # (P,4)
        cross_val = (Bx - Ax) * (qy - Ay) - (By - Ay) * (qx - Ax)
        on_line = np.abs(cross_val) < 1e-9
        within = (
            (qx >= np.minimum(Ax, Bx) - _EPS) & (qx <= np.maximum(Ax, Bx) + _EPS)
            & (qy >= np.minimum(Ay, By) - _EPS) & (qy <= np.maximum(Ay, By) + _EPS)
        )
        return (inner | (on_line & within).any(axis=2)).any(axis=1)  # (P,)


def _verts_in_quad(corners, vx, vy) -> np.ndarray:
    """(b) any polygon vertex inside its quad (sign consistency, NaN-safe)."""
    a = corners  # (P,4,2)
    b = np.roll(corners, -1, axis=1)
    px = vx[:, :, None]  # (P,V,1)
    py = vy[:, :, None]
    cr = (b[:, None, :, 0] - a[:, None, :, 0]) * (py - a[:, None, :, 1]) - (
        b[:, None, :, 1] - a[:, None, :, 1]
    ) * (px - a[:, None, :, 0])  # (P,V,4)
    return (
        ((cr >= -1e-9).all(axis=2) | (cr <= 1e-9).all(axis=2))
        & ~np.isnan(px[:, :, 0])
    ).any(axis=1)


def _quad_poly_ecross(corners, ax, ay, bx, by) -> np.ndarray:
    """(c) any proper edge crossing: quad edges (4) × polygon edges (E)."""
    a = corners
    b = np.roll(corners, -1, axis=1)
    P1x = a[:, :, 0][:, :, None]  # (P,4,1)
    P1y = a[:, :, 1][:, :, None]
    P2x = b[:, :, 0][:, :, None]
    P2y = b[:, :, 1][:, :, None]
    Ax, Ay = ax[:, None, :], ay[:, None, :]  # (P,1,E)
    Bx, By = bx[:, None, :], by[:, None, :]
    with np.errstate(invalid="ignore"):
        return _seg_cross(P1x, P1y, P2x, P2y, Ax, Ay, Bx, By).any(axis=(1, 2))


def quads_contain_points(corners: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Per-row test: does quad i contain point i? (N,4,2) x (N,) -> (N,) bool.

    Works for arbitrary (convex, CCW or CW) quads via sign-consistency of
    cross products; boundary counts as inside.
    """
    a = corners  # (N,4,2)
    b = np.roll(corners, -1, axis=1)
    cross = (b[:, :, 0] - a[:, :, 0]) * (py[:, None] - a[:, :, 1]) - (
        b[:, :, 1] - a[:, :, 1]
    ) * (px[:, None] - a[:, :, 0])
    return (cross >= -1e-9).all(axis=1) | (cross <= 1e-9).all(axis=1)


def _points_in_quads_any(quads: np.ndarray, verts: np.ndarray) -> np.ndarray:
    """For each quad (M,4,2): is ANY of the K verts inside it? -> (M,) bool."""
    a = quads[:, None, :, :]  # (M,1,4,2)
    b = np.roll(quads, -1, axis=1)[:, None, :, :]
    px = verts[None, :, None, 0]  # (1,K,1)
    py = verts[None, :, None, 1]
    cross = (b[..., 0] - a[..., 0]) * (py - a[..., 1]) - (b[..., 1] - a[..., 1]) * (
        px - a[..., 0]
    )  # (M,K,4)
    inside = (cross >= -1e-9).all(axis=2) | (cross <= 1e-9).all(axis=2)
    return inside.any(axis=1)


def _seg_cross(p1x, p1y, p2x, p2y, q1x, q1y, q2x, q2y) -> np.ndarray:
    """Proper/improper segment intersection test, broadcastable."""

    def orient(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    d1 = orient(q1x, q1y, q2x, q2y, p1x, p1y)
    d2 = orient(q1x, q1y, q2x, q2y, p2x, p2y)
    d3 = orient(p1x, p1y, p2x, p2y, q1x, q1y)
    d4 = orient(p1x, p1y, p2x, p2y, q2x, q2y)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0)) & (d1 != 0) & (d2 != 0) & (
        d3 != 0
    ) & (d4 != 0)
    # collinear-touch cases are already covered by the vertex-containment
    # tests (boundary counts as inside), so proper crossing suffices here.
    return proper


def _quad_edges_cross(quads: np.ndarray, ax, ay, bx, by) -> np.ndarray:
    """Any of the 4 quad edges crosses any polygon edge. (M,4,2) -> (M,)."""
    p1 = quads  # (M,4,2)
    p2 = np.roll(quads, -1, axis=1)
    P1x = p1[:, :, 0][:, :, None]  # (M,4,1)
    P1y = p1[:, :, 1][:, :, None]
    P2x = p2[:, :, 0][:, :, None]
    P2y = p2[:, :, 1][:, :, None]
    Q1x, Q1y = ax[None, None, :], ay[None, None, :]  # (1,1,E)
    Q2x, Q2y = bx[None, None, :], by[None, None, :]
    cross = _seg_cross(P1x, P1y, P2x, P2y, Q1x, Q1y, Q2x, Q2y)  # (M,4,E)
    return cross.any(axis=(1, 2))
