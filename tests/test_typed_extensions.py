"""Typed extension accessors (reference crates/extensions/src/lib.rs:85-203
Extensions trait + concrete structs in projection.rs / raster.rs /
electro_optical.rs / authentication.rs).

Tests mirror the reference's doctest roundtrips: set → has → get → remove,
version-insensitive identifier matching, and idempotent identifier append.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rustac_ray.extensions import (
    AUTH_EXT,
    EO_EXT,
    PROJECTION_EXT,
    RASTER_EXT,
    TypedExtension,
    add_extension,
    get_extension,
    has_extension,
    remove_extension,
    set_extension,
)


def _items(n=4):
    return pa.table(
        {
            "id": pa.array([f"item-{i}" for i in range(n)]),
            "stac_extensions": pa.array([[] for _ in range(n)], pa.list_(pa.string())),
            "datetime": pa.array([1000 * i for i in range(n)], pa.timestamp("ms")),
        }
    )


def test_identifier_prefix_matches_reference_doctest():
    # lib.rs:68-83: Raster::identifier_prefix() ==
    # "https://stac-extensions.github.io/raster/"
    assert RASTER_EXT.identifier_prefix == "https://stac-extensions.github.io/raster/"
    assert (
        PROJECTION_EXT.identifier_prefix
        == "https://stac-extensions.github.io/projection/"
    )


def test_set_has_get_roundtrip_projection():
    # lib.rs doctest: set_extension(Projection { code: "EPSG:4326" }) then
    # has_extension::<Projection>() is true and extension() returns the code.
    t = _items(3)
    assert not has_extension(t, PROJECTION_EXT).to_pylist().count(True)
    t2 = set_extension(
        t,
        PROJECTION_EXT,
        {
            "code": "EPSG:32614",
            "shape": [[512, 512]] * 3,
            "transform": [[10.0, 0.0, 399960.0, 0.0, -10.0, 4100040.0]] * 3,
            "centroid": [{"lat": 34.595302, "lon": -101.344483}] * 3,
        },
    )
    assert has_extension(t2, PROJECTION_EXT).to_pylist() == [True] * 3
    proj = get_extension(t2, PROJECTION_EXT)
    assert proj.column("code").to_pylist() == ["EPSG:32614"] * 3
    assert proj.column("shape").to_pylist()[0] == [512, 512]
    assert proj.column("centroid").to_pylist()[1] == {
        "lat": 34.595302,
        "lon": -101.344483,
    }
    # declared dtypes enforced
    assert proj.schema.field("transform").type == pa.list_(pa.float64())


def test_remove_extension_clears_fields_and_identifiers():
    # lib.rs test remove_extension: a v2.0.0 projection URI + proj:code field;
    # remove drops both (identifier matching is version-insensitive).
    t = _items(2)
    t = set_extension(t, PROJECTION_EXT, {"code": "EPSG:4326"})
    # plant an OLD version URI too — remove must strip both versions
    old = "https://stac-extensions.github.io/projection/v1.1.0/schema.json"
    t = t.set_column(
        t.column_names.index("stac_extensions"),
        "stac_extensions",
        pa.array(
            [[old, PROJECTION_EXT.identifier], [PROJECTION_EXT.identifier]],
            pa.list_(pa.string()),
        ),
    )
    out = remove_extension(t, PROJECTION_EXT)
    assert "proj:code" not in out.column_names
    assert out.column("stac_extensions").to_pylist() == [[], []]
    assert has_extension(out, PROJECTION_EXT).to_pylist() == [False, False]


def test_remove_preserves_other_extensions():
    t = _items(2)
    t = set_extension(t, EO_EXT, {"cloud_cover": 12.5})
    t = set_extension(t, PROJECTION_EXT, {"code": "EPSG:4326"})
    out = remove_extension(t, PROJECTION_EXT)
    assert "eo:cloud_cover" in out.column_names
    assert has_extension(out, EO_EXT).to_pylist() == [True, True]
    assert out.column("stac_extensions").to_pylist() == [[EO_EXT.identifier]] * 2


def test_set_is_idempotent_on_identifier():
    # lib.rs:160-162 push + dedup — setting twice leaves ONE identifier
    t = _items(2)
    t = set_extension(t, EO_EXT, {"cloud_cover": 1.0})
    t = set_extension(t, EO_EXT, {"cloud_cover": 2.0, "snow_cover": 0.5})
    assert t.column("stac_extensions").to_pylist() == [[EO_EXT.identifier]] * 2
    eo = get_extension(t, EO_EXT)
    assert eo.column("cloud_cover").to_pylist() == [2.0, 2.0]
    assert eo.column("snow_cover").to_pylist() == [0.5, 0.5]


def test_set_replaces_whole_namespace():
    # lib.rs:179 remove_fields_with_prefix before set: fields not in the new
    # value disappear
    t = _items(2)
    t = set_extension(t, EO_EXT, {"cloud_cover": 1.0, "snow_cover": 9.0})
    t = set_extension(t, EO_EXT, {"cloud_cover": 2.0})
    assert "eo:snow_cover" not in t.column_names


def test_raster_bands_typed_roundtrip():
    # raster.rs:19-82: bands is a list of Band structs
    t = _items(2)
    band = {
        "nodata": 0.0,
        "sampling": "area",
        "data_type": "uint16",
        "bits_per_sample": 12,
        "spatial_resolution": 10.0,
        "statistics": {
            "minimum": 1.0,
            "maximum": 255.0,
            "mean": 100.0,
            "stddev": 3.1,
            "valid_percent": 99.8,
        },
        "unit": "reflectance",
        "scale": 0.0001,
        "offset": -0.1,
        "histogram": {"count": 3, "min": 0.0, "max": 255.0, "buckets": [10, 20, 30]},
    }
    t = set_extension(t, RASTER_EXT, {"bands": [[band], [band, band]]})
    assert has_extension(t, RASTER_EXT).to_pylist() == [True, True]
    bands = get_extension(t, RASTER_EXT).column("bands").to_pylist()
    assert len(bands[0]) == 1 and len(bands[1]) == 2
    assert bands[0][0]["sampling"] == "area"
    assert bands[0][0]["histogram"]["buckets"] == [10, 20, 30]
    assert bands[1][1]["statistics"]["valid_percent"] == 99.8


def test_eo_bands_common_names():
    t = _items(1)
    t = set_extension(
        t,
        EO_EXT,
        {
            "bands": [
                [
                    {"name": "B04", "common_name": "red", "center_wavelength": 0.665},
                    {"name": "B08", "common_name": "nir", "center_wavelength": 0.842},
                ]
            ],
            "cloud_cover": 3.5,
        },
    )
    eo = get_extension(t, EO_EXT)
    assert [b["common_name"] for b in eo.column("bands").to_pylist()[0]] == ["red", "nir"]


def test_auth_schemes_json_carrier():
    # authentication.rs:13-24 — schemes map carried as a JSON string column
    import json

    t = _items(2)
    schemes = json.dumps(
        {"oauth": {"type": "oauth2", "flows": {"authorizationCode": {"scopes": {}}}}}
    )
    t = set_extension(t, AUTH_EXT, {"schemes": schemes, "refs": [["oauth"], ["oauth"]]})
    assert has_extension(t, AUTH_EXT).to_pylist() == [True, True]
    auth = get_extension(t, AUTH_EXT)
    assert json.loads(auth.column("schemes").to_pylist()[0])["oauth"]["type"] == "oauth2"
    assert auth.column("refs").to_pylist() == [["oauth"], ["oauth"]]


def test_add_extension_identifier_only():
    # lib.rs:148-163 add_extension: registers the identifier without fields
    t = _items(3)
    t = add_extension(t, RASTER_EXT)
    t = add_extension(t, RASTER_EXT)  # idempotent
    assert t.column("stac_extensions").to_pylist() == [[RASTER_EXT.identifier]] * 3
    assert has_extension(t, RASTER_EXT).to_pylist() == [True] * 3


def test_has_extension_version_insensitive_and_mixed_rows():
    t = _items(3)
    uris = [
        ["https://stac-extensions.github.io/eo/v1.0.0/schema.json"],  # old version
        [],
        ["https://stac-extensions.github.io/sat/v1.0.0/schema.json"],
    ]
    t = t.set_column(
        t.column_names.index("stac_extensions"),
        "stac_extensions",
        pa.array(uris, pa.list_(pa.string())),
    )
    assert has_extension(t, EO_EXT).to_pylist() == [True, False, False]


def test_get_extension_casts_and_strict_raises():
    t = _items(2)
    t = t.append_column("eo:cloud_cover", pa.array([1, 2], pa.int64()))
    t = add_extension(t, EO_EXT)
    eo = get_extension(t, EO_EXT)
    assert eo.schema.field("cloud_cover").type == pa.float64()  # int promoted
    bad = _items(1).append_column("eo:cloud_cover", pa.array(["oops"]))
    with pytest.raises(pa.ArrowInvalid):
        get_extension(bad, EO_EXT)
    lax = get_extension(bad, EO_EXT, strict=False)
    assert lax.column("cloud_cover").to_pylist() == ["oops"]


def test_set_unknown_field_raises():
    with pytest.raises(KeyError):
        set_extension(_items(1), EO_EXT, {"not_a_field": 1})


def test_fixture_items_eo_typed_get(fixtures_dir):
    # the synthetic stac_items corpus declares eo on every row (synth.py:283)
    t = pq.read_table(f"{fixtures_dir}/stac_items.parquet")
    hits = has_extension(t, EO_EXT)
    assert all(hits.to_pylist())
    eo = get_extension(t, EO_EXT)
    cc = eo.column("cloud_cover").to_pylist()
    assert len(cc) == len(t) and all(v is None or 0 <= v <= 100 for v in cc)
    # and removal strips the eo URI everywhere while keeping sat's
    out = remove_extension(t, EO_EXT)
    assert "eo:cloud_cover" not in out.column_names
    rem = [u for row in out.column("stac_extensions").to_pylist() for u in row]
    assert all(not u.startswith("https://stac-extensions.github.io/eo/") for u in rem)
    assert any(u.startswith("https://stac-extensions.github.io/sat/") for u in rem)


def test_map_batches_usable(ray_session, fixtures_dir):
    # the accessors are pure Table kernels — run one inside map_batches
    import ray.data as rd

    ds = rd.read_parquet(f"{fixtures_dir}/stac_items.parquet")

    def strip_eo(batch: pa.Table) -> pa.Table:
        return remove_extension(batch, EO_EXT)

    out = ds.map_batches(strip_eo, batch_format="pyarrow")
    tbl = out.limit(5).to_pandas()
    assert "eo:cloud_cover" not in tbl.columns
