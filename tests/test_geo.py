"""Unit tests for the pure-math geometry core (no Ray needed)."""

import numpy as np
import pytest

from rustac_ray.geo import affine, cells, pip, tiles, wkb


def test_footprint_corners_axis_aligned():
    c = affine.footprint_corners(
        np.array([10]), np.array([20]), np.array([[0.1, 0, -100.0, 0, -0.05, 40.0]])
    )
    assert c.shape == (1, 4, 2)
    # corners: (0,0)->(-100,40), (w,0)->(-99,40), (w,h)->(-99,39), (0,h)->(-100,39)
    np.testing.assert_allclose(
        c[0], [[-100, 40], [-99, 40], [-99, 39], [-100, 39]]
    )
    xmin, ymin, xmax, ymax = affine.corners_bbox(c)
    np.testing.assert_allclose([xmin[0], ymin[0], xmax[0], ymax[0]], [-100, 39, -99, 40])


def test_footprint_rotated():
    # 90-degree rotation: x = -row + x0, y = col + y0
    c = affine.footprint_corners(
        np.array([4]), np.array([2]), np.array([[0, -1.0, 0.0, 1.0, 0, 0.0]])
    )
    np.testing.assert_allclose(c[0], [[0, 0], [0, 4], [-2, 4], [-2, 0]])


def test_wkb_quad_roundtrip():
    corners = np.array([[[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]]])
    enc = wkb.encode_quads(corners)
    assert len(enc[0]) == 93
    dec = wkb.decode_quads(enc)
    np.testing.assert_allclose(dec, corners)
    gj = wkb.decode_geometry(enc[0])
    assert gj["type"] == "Polygon"
    assert len(gj["coordinates"][0]) == 5  # closed ring


def test_wkb_generic_roundtrip():
    for geom in [
        {"type": "Point", "coordinates": [1.5, -2.5]},
        {"type": "Polygon", "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]},
        {
            "type": "MultiPolygon",
            "coordinates": [
                [[[0, 0], [1, 0], [1, 1], [0, 0]]],
                [[[5, 5], [6, 5], [6, 6], [5, 5]]],
            ],
        },
    ]:
        back = wkb.decode_geometry(wkb.encode_geometry(geom))
        assert back["type"] == geom["type"]
        np.testing.assert_allclose(
            wkb._all_coords(back), wkb._all_coords(geom)
        )


def test_pip_contains_and_boundary():
    pg = pip.PreparedGeometry(
        {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}
    )
    px = np.array([5.0, 15.0, 0.0, 10.0, -0.001])
    py = np.array([5.0, 5.0, 0.0, 10.0, 5.0])
    np.testing.assert_array_equal(
        pg.contains_points(px, py), [True, False, True, True, False]
    )


def test_pip_concave():
    # arrow-head: notch at top center
    pg = pip.PreparedGeometry(
        {
            "type": "Polygon",
            "coordinates": [[[0, 0], [4, 0], [4, 4], [2, 1], [0, 4], [0, 0]]],
        }
    )
    assert pg.contains_points(np.array([2.0]), np.array([0.5]))[0]
    assert not pg.contains_points(np.array([2.0]), np.array([3.0]))[0]  # in the notch
    assert pg.contains_points(np.array([0.5]), np.array([2.0]))[0]


def test_intersects_quads_cases():
    pg = pip.PreparedGeometry(
        {"type": "Polygon", "coordinates": [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]]}
    )
    quads = np.array(
        [
            [[1, 1], [2, 1], [2, 2], [1, 2]],          # inside
            [[20, 20], [21, 20], [21, 21], [20, 21]],  # far away
            [[-5, -5], [15, -5], [15, 15], [-5, 15]],  # contains the polygon
            [[-1, 4], [1, 4], [1, 6], [-1, 6]],        # straddles an edge
            [[9, 9], [11, 9], [11, 11], [9, 11]],      # corner overlap
        ],
        dtype=float,
    )
    np.testing.assert_array_equal(
        pg.intersects_quads(quads), [True, False, True, True, True]
    )


def test_intersects_rotated_quad_vs_bbox_subtlety():
    # a diamond (rotated quad) whose bbox overlaps the polygon but whose
    # actual shape does not — the exact test must reject it (P3 semantics:
    # geometry, not bbox — reference crates/core/src/api/items.rs:184-198)
    pg = pip.PreparedGeometry(
        {"type": "Polygon", "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]]}
    )
    diamond = np.array([[[5, 0], [8, 3], [5, 6], [2, 3]]], dtype=float)
    # bbox of diamond is [2,0,8,6] → overlaps polygon bbox, but shape doesn't
    assert not pg.intersects_quads(diamond)[0]


def test_point_query_geometry():
    pg = pip.PreparedGeometry({"type": "Point", "coordinates": [5.0, 5.0]})
    quads = np.array(
        [[[0, 0], [10, 0], [10, 10], [0, 10]], [[20, 20], [30, 20], [30, 30], [20, 30]]],
        dtype=float,
    )
    np.testing.assert_array_equal(pg.intersects_quads(quads), [True, False])


def test_cells_roundtrip_and_hierarchy():
    lon = np.array([-100.0, 0.0, 179.9, -179.9])
    lat = np.array([35.0, 0.0, 89.9, -89.9])
    for res in (0, 5, 12, 20):
        cid = cells.cell_encode(lon, lat, res)
        r, x, y = cells.cell_decode(cid)
        assert (r == res).all()
        xmin, ymin, xmax, ymax = cells.cell_bounds(cid)
        assert ((lon >= xmin) & (lon <= xmax)).all()
        assert ((lat >= ymin) & (lat <= ymax)).all()
    c12 = cells.cell_encode(lon, lat, 12)
    c10 = cells.cell_encode(lon, lat, 10)
    np.testing.assert_array_equal(cells.cell_parent(c12, 2), c10)
    kids = cells.cell_children(int(c10[0]))
    assert len(kids) == 4
    assert (cells.cell_parent(kids) == c10[0]).all()


def test_cell_ring_counts():
    c = int(cells.cell_encode(np.array([-100.0]), np.array([35.0]), 8)[0])
    assert len(cells.cell_ring(c, 0)) == 1
    assert len(cells.cell_ring(c, 1)) == 8
    assert len(cells.cell_ring(c, 3)) == 24


def test_cover_bbox_many():
    ri, cc = cells.cover_bbox_many(
        np.array([-100.4, 0.0]),
        np.array([34.9, 0.0]),
        np.array([-99.9, 0.1]),
        np.array([35.3, 0.1]),
        10,
    )
    # every covering cell's bounds must overlap its bbox
    xmin, ymin, xmax, ymax = cells.cell_bounds(cc)
    boxes = np.array([[-100.4, 34.9, -99.9, 35.3], [0.0, 0.0, 0.1, 0.1]])
    for k in range(len(cc)):
        b = boxes[ri[k]]
        assert xmin[k] <= b[2] and xmax[k] >= b[0]
        assert ymin[k] <= b[3] and ymax[k] >= b[1]
    # and the union of cells must contain the bbox corners
    assert len(np.unique(ri)) == 2


def test_cover_bbox_antimeridian():
    """ADVICE r01: xmin > xmax (legal STAC bbox) wraps across ±180° —
    covered cells are the union of [xmin,180] and [-180,xmax] spans."""
    ri, cc = cells.cover_bbox_many(
        np.array([170.0]), np.array([10.0]), np.array([-170.0]), np.array([12.0]), 6
    )
    assert len(cc) > 0 and (ri == 0).all()
    xmin, ymin, xmax, ymax = cells.cell_bounds(cc)
    # every covered cell lies in one of the two half-spans
    assert (((xmax > 169.9) & (xmin < 180.0)) | ((xmin < -169.9) & (xmax > -180.1))).all()
    # both sides of the antimeridian are present
    assert (xmin >= 160).any() and (xmax <= -160).any()
    # equivalent two-bbox cover must be identical
    ri2, c2 = cells.cover_bbox_many(
        np.array([170.0, -180.0]), np.array([10.0, 10.0]),
        np.array([180.0, -170.0]), np.array([12.0, 12.0]), 6,
    )
    assert set(cc.tolist()) == set(c2.tolist())

    # tile cover wraps identically
    ti, tk = tiles.cover_bbox_tiles(
        np.array([179.0]), np.array([10.0]), np.array([-179.0]), np.array([11.0]), 6
    )
    _, tx, _ = tiles.tile_unkey(tk)
    assert (tx == 63).any() and (tx == 0).any() and len(tk) > 0


def test_tiles_known_values():
    # classic slippy-map check: (0,0) at z=1 → tile (1,1)... actually (1.0)
    x, y = tiles.lonlat_to_tile(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1) or (x[0], y[0]) == (1, 0)  # boundary: y frac exactly 0.5
    x, y = tiles.lonlat_to_tile(np.array([-180.0]), np.array([85.0]), 2)
    assert (x[0], y[0]) == (0, 0)
    w, s, e, n = tiles.tile_bounds(0, 0, 0)
    np.testing.assert_allclose([w, e], [-180, 180])
    assert n > 85 and s < -85


def test_tile_cover_and_key_roundtrip():
    ri, keys = tiles.cover_bbox_tiles(
        np.array([-100.3]), np.array([34.9]), np.array([-99.9]), np.array([35.2]), 10
    )
    z, x, y = tiles.tile_unkey(keys)
    assert (z == 10).all()
    w, s, e, n = tiles.tile_bounds(z, x, y)
    assert (w <= -99.9).all() and (e >= -100.3).any()
    np.testing.assert_array_equal(tiles.tile_key(z, x, y), keys)


def test_res_for_extent():
    r = cells.res_for_extent(0.1, 0.1)
    dlon, _ = cells.cell_size_deg(r)
    assert dlon >= 0.1  # bbox fits within ~a few cells
    assert cells.res_for_extent(400, 400) == 0


# ------------------------------------------------------------------ hex --


def test_hex_roundtrip_center():
    """Every cell's own center encodes back to the same cell."""
    from rustac_ray.geo import hex as hx

    rng = np.random.default_rng(7)
    x = rng.uniform(-179, 179, 500)
    y = rng.uniform(-89, 89, 500)
    ids = hx.hex_encode(x, y, 0.5)
    cx, cy = hx.hex_center(ids, 0.5)
    assert (hx.hex_encode(cx, cy, 0.5) == ids).all()


def test_hex_nearest_center_property():
    """A point belongs to the hex whose center is nearest (Voronoi
    property of cube rounding), checked against the cell and its ring."""
    from rustac_ray.geo import hex as hx

    rng = np.random.default_rng(11)
    x = rng.uniform(-10, 10, 300)
    y = rng.uniform(-10, 10, 300)
    ids = hx.hex_encode(x, y, 0.5)
    own_x, own_y = hx.hex_center(ids, 0.5)
    d_own = np.hypot(x - own_x, y - own_y)
    ring = hx.hex_ring1(ids)
    for j in range(6):
        nx, ny = hx.hex_center(ring[:, j], 0.5)
        d_n = np.hypot(x - nx, y - ny)
        assert (d_own <= d_n + 1e-9).all()


def test_hex_ring_is_symmetric():
    from rustac_ray.geo import hex as hx

    ids = hx.hex_encode(np.array([3.0]), np.array([4.0]), 0.5)
    ring = hx.hex_ring1(ids)[0]
    assert len(set(ring.tolist())) == 6
    # each neighbor's ring contains the original cell
    back = hx.hex_ring1(ring)
    assert ((back == ids[0]).sum(axis=1) == 1).all()


def test_hex_matches_scalar_twin():
    """Vectorized kernels == the oracle's math-module scalar twin."""
    import math

    from rustac_ray.geo import hex as hx

    rng = np.random.default_rng(13)
    xs = rng.uniform(-180, 180, 200)
    ys = rng.uniform(-90, 90, 200)
    got = hx.hex_encode(xs, ys, 0.5)
    sqrt3 = math.sqrt(3.0)
    off = 1 << 30
    for x, y, g in zip(xs, ys, got):
        qf = (sqrt3 / 3.0 * x - (1.0 / 3.0) * y) / 0.5
        rf = ((2.0 / 3.0) * y) / 0.5
        xf, zf = qf, rf
        yf = -xf - zf
        rx, ry, rz = round(xf), round(yf), round(zf)
        dx, dy, dz = abs(rx - xf), abs(ry - yf), abs(rz - zf)
        if dx > dy and dx > dz:
            rx = -ry - rz
        elif dz > dy:
            rz = -rx - ry
        assert ((int(rx) + off) << 32) | (int(rz) + off) == g


def test_track_lengths_multisegment(ray_session):
    """Geodesic track length over diagonal + multi-part lines vs a
    scalar haversine control; null geometry and 1-point parts safe."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rustac_ray.geo.wkb import encode_geometry
    from rustac_ray.stages.tracks import track_lengths

    R = 6371.0088

    def hav_km(p, q):
        lo1, la1 = np.radians(p)
        lo2, la2 = np.radians(q)
        h = np.sin((la2 - la1) / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(
            (lo2 - lo1) / 2
        ) ** 2
        return 2 * R * np.arcsin(np.sqrt(h))

    g1 = {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 0]]}
    g2 = {
        "type": "MultiLineString",
        "coordinates": [[[10, 10], [10, 11]], [[20, 20], [21, 20]]],
    }
    tbl = pd.DataFrame(
        {
            "item_id": ["a", "b", "c"],
            "geometry": [
                encode_geometry(g1), encode_geometry(g2), None
            ],
        }
    )
    got = (
        track_lengths(rd.from_pandas(tbl))
        .to_pandas().set_index("item_id")
    )
    w1 = hav_km((0, 0), (1, 1)) + hav_km((1, 1), (2, 0))
    w2 = hav_km((10, 10), (10, 11)) + hav_km((20, 20), (21, 20))
    assert got.loc["a", "length_m"] == round(w1 * 1000)
    assert got.loc["b", "length_m"] == round(w2 * 1000)
    assert got.loc["a", "n_segments"] == 2
    assert got.loc["b", "n_segments"] == 2
    assert got.loc["c", "length_m"] == 0 and got.loc["c", "n_segments"] == 0
