"""Trajectory/track measures over LINE-stored geometries (orbits,
swath centerlines, AIS-style tracks) — the metric companion to the
line-stored S_* relate (geo/relate.py, r5).

``track_lengths``: per-item geodesic length of a LineString /
MultiLineString WKB column. All segments of a batch vectorize into flat
arrays (parent-indexed), one haversine pass, one bincount fold back to
rows — no per-row Python beyond the WKB decode (which is the schema's
storage format, same cost every geometry op pays).

Float discipline: the haversine is the knn kernel's exact expression
(radians PER COORDINATE then subtract — r02 advice: ``radians(a-b)``
differs by ulps), and the output quantizes to integer METERS so the SQL
twin's libm-vs-numpy trig ulps can never flip a hashed value.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["track_lengths"]

_EARTH_RADIUS_KM = 6371.0088


def track_lengths(
    ds,
    *,
    geometry_col: str = "geometry",
    id_col: str = "item_id",
):
    """→ Dataset (id_col, n_segments, length_m:int64): great-circle
    length per linear geometry (sum over segments)."""
    from ..geo.wkb import decode_geometry

    def per_batch(b: pa.Table) -> pd.DataFrame:
        ids = b[id_col].to_pylist()
        a_lon, a_lat, b_lon, b_lat, parent = [], [], [], [], []
        nseg = np.zeros(len(ids), np.int64)
        for i, w in enumerate(b[geometry_col].to_pylist()):
            if w is None:
                continue
            g = decode_geometry(bytes(w))
            lines = (
                [g["coordinates"]]
                if g["type"] == "LineString"
                else g["coordinates"]
                if g["type"] == "MultiLineString"
                else None
            )
            if lines is None:
                raise ValueError(
                    f"track_lengths: {g['type']} is not a linear geometry"
                )
            for line in lines:
                r = np.asarray(line, np.float64)[:, :2]
                if len(r) < 2:
                    continue
                a_lon.append(r[:-1, 0]); a_lat.append(r[:-1, 1])
                b_lon.append(r[1:, 0]); b_lat.append(r[1:, 1])
                parent.append(np.full(len(r) - 1, i, np.int64))
                nseg[i] += len(r) - 1
        if not parent:
            return pd.DataFrame(
                {id_col: pd.array(ids, dtype="string"),
                 "n_segments": nseg, "length_m": np.zeros(len(ids), np.int64)}
            )
        lo1 = np.radians(np.concatenate(a_lon))
        la1 = np.radians(np.concatenate(a_lat))
        lo2 = np.radians(np.concatenate(b_lon))
        la2 = np.radians(np.concatenate(b_lat))
        par = np.concatenate(parent)
        sdlat = np.sin((la2 - la1) * 0.5)
        sdlon = np.sin((lo2 - lo1) * 0.5)
        h = sdlat * sdlat + (np.cos(la1) * np.cos(la2)) * (sdlon * sdlon)
        km = 2.0 * _EARTH_RADIUS_KM * np.arcsin(np.sqrt(np.minimum(h, 1.0)))
        total = np.bincount(par, weights=km, minlength=len(ids))
        return pd.DataFrame(
            {
                id_col: pd.array(ids, dtype="string"),
                "n_segments": nseg,
                "length_m": np.round(total * 1000.0).astype(np.int64),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow")
