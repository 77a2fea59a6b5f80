"""Minimal WKB (well-known binary) codec, numpy-vectorized where hot.

Covers the geometry types the engine actually moves: Point, Polygon (with
holes), MultiPolygon, LineString. Layout is the OGC WKB standard
(little-endian, geometry-type uint32, coordinate doubles); this mirrors what
the reference stores in stac-geoparquet geometry columns
(crates/core/src/geoarrow/mod.rs:320-371 encodes geometry to WKB) without
using any geometry library.

Hot path: ``encode_quads`` / ``decode_quads`` handle the (N,4,2) footprint
quadrilaterals of the image table as one vectorized numpy pass — no per-row
Python. The generic ``encode_geometry`` / ``decode_geometry`` handle the
small query side (tens-to-hundreds of geoms) driver-side.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "WKB_POINT",
    "WKB_LINESTRING",
    "WKB_POLYGON",
    "WKB_MULTIPOLYGON",
    "encode_quads",
    "decode_quads",
    "encode_geometry",
    "decode_geometry",
    "decode_bboxes",
]

WKB_POINT = 1
WKB_LINESTRING = 2
WKB_POLYGON = 3
WKB_MULTIPOINT = 4
WKB_MULTILINESTRING = 5
WKB_MULTIPOLYGON = 6
WKB_GEOMETRYCOLLECTION = 7

# one polygon, one ring, 5 points (closed quad):
# byte_order(1) + type(4) + nrings(4) + npoints(4) + 5*16 coord bytes = 93
_QUAD_WKB_LEN = 1 + 4 + 4 + 4 + 5 * 16
_QUAD_HEADER = struct.pack("<BIII", 1, WKB_POLYGON, 1, 5)


def encode_quads(corners: np.ndarray) -> np.ndarray:
    """(N,4,2) float64 corner quads → object array of N WKB polygon bytes.

    Fully vectorized: builds one (N, 93) uint8 matrix then splits. The ring
    is closed by repeating the first corner.
    """
    corners = np.ascontiguousarray(corners, dtype=np.float64)
    n = corners.shape[0]
    out = np.empty((n, _QUAD_WKB_LEN), dtype=np.uint8)
    out[:, :13] = np.frombuffer(_QUAD_HEADER, dtype=np.uint8)
    ring = np.concatenate([corners, corners[:, :1, :]], axis=1)  # (N,5,2) closed
    out[:, 13:] = ring.reshape(n, -1).view(np.uint8).reshape(n, 80)
    # split into per-row bytes objects (needed for a pa.binary() column)
    flat = out.tobytes()
    return np.frombuffer(
        b"", dtype=np.uint8
    ) if n == 0 else np.array(
        [flat[i * _QUAD_WKB_LEN : (i + 1) * _QUAD_WKB_LEN] for i in range(n)], dtype=object
    )


def decode_quads(wkbs) -> np.ndarray:
    """Inverse of :func:`encode_quads` for uniform 93-byte quad polygons.

    Accepts any iterable of bytes (e.g. a pyarrow BinaryArray via
    ``.to_numpy(zero_copy_only=False)``). Vectorized reassembly.
    """
    buf = b"".join(wkbs)
    n = len(buf) // _QUAD_WKB_LEN
    mat = np.frombuffer(buf, dtype=np.uint8).reshape(n, _QUAD_WKB_LEN)
    ring = mat[:, 13:].copy().view(np.float64).reshape(n, 5, 2)
    return ring[:, :4, :]


def decode_bboxes(wkbs) -> np.ndarray:
    """Bounding boxes (N,4) [xmin,ymin,xmax,ymax] of arbitrary WKB geoms."""
    out = np.empty((len(wkbs), 4), dtype=np.float64)
    for i, b in enumerate(wkbs):
        coords = _all_coords(decode_geometry(bytes(b)))
        out[i, 0] = coords[:, 0].min()
        out[i, 1] = coords[:, 1].min()
        out[i, 2] = coords[:, 0].max()
        out[i, 3] = coords[:, 1].max()
    return out


# ---------------------------------------------------------------- generic ---


def encode_geometry(geom: dict) -> bytes:
    """GeoJSON-style dict {type, coordinates} → WKB bytes (2D, LE)."""
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        return struct.pack("<BIdd", 1, WKB_POINT, c[0], c[1])
    if t == "LineString":
        arr = np.asarray(c, dtype=np.float64)
        return struct.pack("<BII", 1, WKB_LINESTRING, len(arr)) + arr.tobytes()
    if t == "Polygon":
        parts = [struct.pack("<BII", 1, WKB_POLYGON, len(c))]
        for ring in c:
            arr = np.asarray(ring, dtype=np.float64)
            parts.append(struct.pack("<I", len(arr)) + arr.tobytes())
        return b"".join(parts)
    if t == "MultiPolygon":
        parts = [struct.pack("<BII", 1, WKB_MULTIPOLYGON, len(c))]
        for poly in c:
            parts.append(encode_geometry({"type": "Polygon", "coordinates": poly}))
        return b"".join(parts)
    if t == "MultiPoint":
        parts = [struct.pack("<BII", 1, WKB_MULTIPOINT, len(c))]
        for p in c:
            parts.append(encode_geometry({"type": "Point", "coordinates": p}))
        return b"".join(parts)
    if t == "MultiLineString":
        parts = [struct.pack("<BII", 1, WKB_MULTILINESTRING, len(c))]
        for ls in c:
            parts.append(encode_geometry({"type": "LineString", "coordinates": ls}))
        return b"".join(parts)
    if t == "GeometryCollection":
        subs = geom["geometries"]
        parts = [struct.pack("<BII", 1, WKB_GEOMETRYCOLLECTION, len(subs))]
        for sub in subs:
            parts.append(encode_geometry(sub))
        return b"".join(parts)
    raise ValueError(f"unsupported geometry type for WKB encode: {t}")


def decode_geometry(wkb: bytes) -> dict:
    """WKB bytes → GeoJSON-style dict. Supports Point/LineString/Polygon/MultiPolygon."""
    geom, _ = _decode_at(wkb, 0)
    return geom


def _decode_at(buf: bytes, off: int) -> tuple[dict, int]:
    byte_order = buf[off]
    endian = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(endian + "I", buf, off + 1)
    gtype &= 0xFF  # strip any SRID/Z flags (we only emit plain 2D)
    off += 5
    if gtype == WKB_POINT:
        x, y = struct.unpack_from(endian + "dd", buf, off)
        return {"type": "Point", "coordinates": [x, y]}, off + 16
    if gtype == WKB_LINESTRING:
        (n,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype=np.dtype(endian + "f8"), count=2 * n, offset=off)
        return {"type": "LineString", "coordinates": arr.reshape(n, 2).tolist()}, off + 16 * n
    if gtype == WKB_POLYGON:
        (nrings,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(endian + "I", buf, off)
            off += 4
            arr = np.frombuffer(buf, dtype=np.dtype(endian + "f8"), count=2 * n, offset=off)
            rings.append(arr.reshape(n, 2).tolist())
            off += 16 * n
        return {"type": "Polygon", "coordinates": rings}, off
    if gtype in (WKB_MULTIPOINT, WKB_MULTILINESTRING):
        (nparts,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        parts = []
        for _ in range(nparts):
            g, off = _decode_at(buf, off)
            parts.append(g["coordinates"])
        name = "MultiPoint" if gtype == WKB_MULTIPOINT else "MultiLineString"
        return {"type": name, "coordinates": parts}, off
    if gtype == WKB_MULTIPOLYGON:
        (npolys,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        polys = []
        for _ in range(npolys):
            poly, off = _decode_at(buf, off)
            polys.append(poly["coordinates"])
        return {"type": "MultiPolygon", "coordinates": polys}, off
    if gtype == WKB_GEOMETRYCOLLECTION:
        (nsubs,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        subs = []
        for _ in range(nsubs):
            g, off = _decode_at(buf, off)
            subs.append(g)
        return {"type": "GeometryCollection", "geometries": subs}, off
    raise ValueError(f"unsupported WKB geometry type: {gtype}")


def _all_coords(geom: dict) -> np.ndarray:
    t = geom["type"]
    c = geom.get("coordinates")
    if t == "Point":
        return np.asarray([c], dtype=np.float64)
    if t == "LineString":
        return np.asarray(c, dtype=np.float64)
    if t == "Polygon":
        return np.concatenate([np.asarray(r, dtype=np.float64) for r in c])
    if t == "MultiPolygon":
        return np.concatenate(
            [np.asarray(r, dtype=np.float64) for poly in c for r in poly]
        )
    if t == "MultiPoint":
        return np.asarray(c, dtype=np.float64)
    if t == "MultiLineString":
        return np.concatenate([np.asarray(ls, dtype=np.float64) for ls in c])
    if t == "GeometryCollection":
        return np.concatenate([_all_coords(g) for g in geom["geometries"]])
    raise ValueError(t)
