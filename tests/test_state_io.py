"""Manifest/resume, sources/sinks, format inference."""

import json
import os

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from rustac_ray.sources import io as rio
from rustac_ray.state import manifest as mf


def test_infer_format():
    assert rio.infer_format("a/b.parquet") == "parquet"
    assert rio.infer_format("a/b.geoparquet") == "parquet"
    assert rio.infer_format("x.ndjson") == "ndjson"
    assert rio.infer_format("x.jsonl") == "ndjson"
    assert rio.infer_format("x.json") == "json"
    with pytest.raises(ValueError):
        rio.infer_format("x.csv")


def test_ndjson_roundtrip(tmp_path, fixtures_dir):
    ds = rd.read_parquet(
        f"{fixtures_dir}/stac_items.parquet",
        columns=["id", "collection", "eo:cloud_cover"],
    )
    out = str(tmp_path / "items_ndjson")
    ds.write_json(out)
    back = rio.read_items(out, fmt="ndjson")  # directory of .json part files
    assert back.count() == 100
    assert set(back.to_pandas()["id"]) == set(ds.to_pandas()["id"])


def test_stac_geoparquet_metadata_roundtrip(tmp_path, fixtures_dir):
    t = pq.read_table(f"{fixtures_dir}/stac_items.parquet")
    path = str(tmp_path / "items_geo.parquet")
    rio.write_stac_geoparquet(t, path)
    back, geo = rio.read_stac_geoparquet_table(path)
    assert back.num_rows == t.num_rows
    assert geo["primary_column"] == "geometry"
    assert geo["columns"]["geometry"]["covering"]["bbox"]["xmin"] == ["bbox", "xmin"]
    assert back.select(["id"]).equals(t.select(["id"]))


def test_write_partitioned_and_resume(tmp_path, fixtures_dir):
    out = str(tmp_path / "parts")
    ds = rd.read_parquet(f"{fixtures_dir}/images.parquet",
                         columns=["image_id", "w", "h"]).repartition(4)
    recs = mf.write_partitioned(ds, out)
    assert len(recs) == 4
    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert files == [f"part-{i:05d}.parquet" for i in range(4)]
    total = sum(r["rows"] for r in recs)
    assert total == 1000

    # simulate a partial failure: delete manifest lines 2.. and their files,
    # keep 0-1 → resume must rewrite only the missing partitions
    man_path = os.path.join(out, "_manifest.jsonl")
    with open(man_path) as f:
        lines = [json.loads(line) for line in f if line.strip()]
    keep = [r for r in lines if r["partition_id"] < 2]
    with open(man_path, "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    for i in (2, 3):
        os.remove(os.path.join(out, f"part-{i:05d}.parquet"))

    recs2 = mf.write_partitioned(ds, out)
    assert [r["partition_id"] for r in recs2] == [0, 1, 2, 3]
    # identical manifest content (same digests) as the first full run
    d1 = {r["partition_id"]: r["digest"] for r in recs}
    d2 = {r["partition_id"]: r["digest"] for r in recs2}
    assert d1 == d2
    back = rd.read_parquet(out).count()
    assert back == 1000


def test_content_digest_order_insensitive():
    import pyarrow as pa

    t1 = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    t2 = pa.table({"a": [3, 1, 2], "b": ["z", "x", "y"]})
    assert mf.content_digest(t1) == mf.content_digest(t2)
    t3 = pa.table({"a": [1, 2, 4], "b": ["x", "y", "z"]})
    assert mf.content_digest(t1) != mf.content_digest(t3)


def test_parse_opt_args_and_href():
    from rustac_ray.sources.io import parse_href_opts, parse_opt_args

    assert parse_opt_args(["a=1", "b=x=y"]) == {"a": "1", "b": "x=y"}
    import pytest

    with pytest.raises(ValueError):
        parse_opt_args(["novalue"])
    # local paths pass through with no filesystem override
    fs, p = parse_href_opts("/tmp/x.parquet")
    assert fs is None and p == "/tmp/x.parquet"
    fs, p = parse_href_opts("file:///tmp/x.parquet")
    assert fs is None and p == "/tmp/x.parquet"
    # s3 hrefs build a configured S3 filesystem from opts (no network I/O
    # happens at construction)
    fs, p = parse_href_opts(
        "s3://bucket/key.parquet",
        {"region": "eu-central-1", "access_key_id": "k", "secret_access_key": "s"},
    )
    assert p == "bucket/key.parquet"
    assert type(fs).__name__ == "S3FileSystem"
    assert fs.region == "eu-central-1"


def test_content_digest_nested_columns_and_order_insensitive():
    """Regression (r2 review): digesting tables with list/struct columns
    must work (STAC items carry links/assets/stac_extensions)."""
    import pyarrow as pa

    from rustac_ray.state.manifest import content_digest

    t = pa.table(
        {
            "id": ["a", "b"],
            "tags": [["x", "y"], ["z"]],
            "bbox": [{"xmin": 1.0, "xmax": 2.0}, {"xmin": 3.0, "xmax": 4.0}],
        }
    )
    d1 = content_digest(t)
    assert len(d1) == 16
    # row order must not matter
    rev = t.take(pa.array([1, 0]))
    assert content_digest(rev) == d1
    # content changes change the digest
    t2 = t.set_column(0, "id", pa.array(["a", "c"]))
    assert content_digest(t2) != d1


def test_read_image_table_lance_gate_and_parquet_path(fixtures_dir, ray_session):
    from rustac_ray.sources.io import infer_format, read_image_table

    assert infer_format("table.lance") == "lance"
    with pytest.raises(NotImplementedError):  # no pylance in this container
        read_image_table("/tmp/whatever.lance")
    ds = read_image_table(f"{fixtures_dir}/images.parquet")
    assert ds.count() > 0
