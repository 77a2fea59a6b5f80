"""Geometry simplification (Douglas-Peucker) over WKB columns.

The generalization stage for low-zoom tiling / footprint thinning: keep
the vertices whose perpendicular deviation from the kept chain exceeds
``tolerance`` (degrees). Classic iterative DP with an explicit stack;
the point-segment distance test is the cross-product form

    cross² ≥ tol² · |seg|²   (strict >, ties drop the vertex)

evaluated with one fixed float expression — deterministic and exactly
reproducible by the scalar oracle twin. Degenerate segments (zero
length) fall back to squared point distance.

Semantics (matching the common ST_SimplifyPreserveTopology-lite
behavior for well-behaved inputs; NOT a topology checker):

- LineString: endpoints always kept; output ≥ 2 points.
- Polygon: each ring simplified separately over its open vertex list
  anchored at vertex 0; rings that collapse below 4 points (closed)
  are dropped; a polygon whose EXTERIOR collapses yields a null row.
- Point / MultiPoint pass through unchanged.

Stateless vectorized ``map_batches`` stage over the engine-standard WKB
column; rows stream, no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import wkb as _wkb

__all__ = ["dp_simplify_ring", "simplify_geometry", "simplify_geometries"]


def dp_simplify_ring(coords: np.ndarray, tol: float, *, closed: bool) -> np.ndarray:
    """Douglas-Peucker over an (n, 2) coordinate array; returns the kept
    row indices (sorted). ``closed`` rings are treated as the open chain
    [0..n-2] anchored at vertex 0 (the duplicate closing vertex is the
    caller's concern)."""
    pts = np.asarray(coords, np.float64)
    if closed:
        pts = pts[:-1]
    n = len(pts)
    if n <= 2:
        return np.arange(n)
    t2 = tol * tol

    def chain(p: np.ndarray) -> np.ndarray:
        """Kept indices of an open chain (endpoints always kept)."""
        m = len(p)
        keep = np.zeros(m, bool)
        keep[0] = keep[m - 1] = True
        stack = [(0, m - 1)]
        while stack:
            a, b = stack.pop()
            if b - a < 2:
                continue
            ax, ay = p[a]
            bx, by = p[b]
            dx, dy = bx - ax, by - ay
            seg2 = dx * dx + dy * dy
            mid = p[a + 1 : b]
            if seg2 == 0.0:
                score = (mid[:, 0] - ax) ** 2 + (mid[:, 1] - ay) ** 2
                bound = t2
            else:
                cross = dx * (mid[:, 1] - ay) - dy * (mid[:, 0] - ax)
                score = cross * cross
                bound = t2 * seg2
            j = int(np.argmax(score))
            if score[j] > bound:
                keep[a + 1 + j] = True
                stack.append((a, a + 1 + j))
                stack.append((a + 1 + j, b))
        return np.flatnonzero(keep)

    if not closed:
        return chain(pts)
    # ring: anchor at vertex 0 and the farthest vertex, simplify the two
    # WRAPPED chains 0→far and far→(n-1)→0 — no vertex is kept merely
    # for being last in the storage order
    d = (pts[:, 0] - pts[0, 0]) ** 2 + (pts[:, 1] - pts[0, 1]) ** 2
    far = int(np.argmax(d))
    if far == 0:
        return np.array([0])  # all vertices coincide
    ka = chain(pts[: far + 1])  # indices 0..far
    wrapped = np.vstack([pts[far:], pts[:1]])  # far..n-1, then 0
    kb = chain(wrapped)
    kb_mapped = [far + j for j in kb if far + j < n]  # drop the wrap copy of 0
    keep = sorted(set(ka.tolist()) | set(kb_mapped))
    return np.asarray(keep, np.int64)


def simplify_geometry(geom: dict, tol: float) -> dict | None:
    """Simplify one GeoJSON geometry; None when it collapses."""
    t = geom.get("type")
    if t in ("Point", "MultiPoint"):
        return geom
    if t == "LineString":
        c = np.asarray(geom["coordinates"], np.float64)
        idx = dp_simplify_ring(c, tol, closed=False)
        return {"type": "LineString", "coordinates": c[idx].tolist()}
    if t in ("Polygon", "MultiPolygon"):
        polys = geom["coordinates"] if t == "MultiPolygon" else [geom["coordinates"]]
        out_polys = []
        for rings in polys:
            out_rings = []
            for ri, ring in enumerate(rings):
                c = np.asarray(ring, np.float64)
                idx = dp_simplify_ring(c, tol, closed=True)
                if len(idx) < 3:
                    if ri == 0:
                        out_rings = None  # exterior collapsed
                        break
                    continue  # drop collapsed hole
                kept = c[idx]
                closed_ring = np.vstack([kept, kept[:1]])
                out_rings.append(closed_ring.tolist())
            if out_rings:
                out_polys.append(out_rings)
        if not out_polys:
            return None
        if t == "Polygon":
            return {"type": "Polygon", "coordinates": out_polys[0]}
        return {"type": "MultiPolygon", "coordinates": out_polys}
    raise ValueError(f"unsupported geometry type {t!r}")


def simplify_geometries(
    ds, *, col: str = "geometry", tolerance: float, stats: bool = True
):
    """map_batches stage: WKB in → simplified WKB out (+ per-row
    ``pts_before`` / ``pts_after`` counts when ``stats`` — the hashable
    check columns). Collapsed geometries become null WKB."""

    def _npts(g: dict | None) -> int:
        if g is None:
            return 0
        c = g.get("coordinates", [])
        t = g["type"]
        if t == "Point":
            return 1
        if t in ("LineString", "MultiPoint"):
            return len(c)
        if t == "Polygon":
            return sum(len(r) for r in c)
        if t == "MultiPolygon":
            return sum(len(r) for p in c for r in p)
        return 0

    def run(batch: pa.Table) -> pa.Table:
        out_wkb: list[bytes | None] = []
        before: list[int] = []
        after: list[int] = []
        for b in batch[col].to_pylist():
            if b is None:
                out_wkb.append(None)
                before.append(0)
                after.append(0)
                continue
            g = _wkb.decode_geometry(b)
            s = simplify_geometry(g, tolerance)
            before.append(_npts(g))
            after.append(_npts(s))
            out_wkb.append(None if s is None else _wkb.encode_geometry(s))
        i = batch.column_names.index(col)
        out = batch.remove_column(i).add_column(
            i, pa.field(col, pa.binary()), pa.array(out_wkb, pa.binary())
        )
        if stats:
            out = out.append_column("pts_before", pa.array(before, pa.int64()))
            out = out.append_column("pts_after", pa.array(after, pa.int64()))
        return out

    return ds.map_batches(run, batch_format="pyarrow")
