import pyarrow as pa
import pytest
import ray.data as rd

from rustac_ray.extensions import EO, PROJECTION, ExtensionRegistry
from rustac_ray.planner import ParquetSink, ParquetSource, Planner, Sink, Source
from rustac_ray.query import QuerySpec


def test_extension_registry_namespace_ops(fixtures_dir):
    reg = ExtensionRegistry().register(PROJECTION).register(EO)
    import pyarrow.parquet as pq

    t = pq.read_table(f"{fixtures_dir}/stac_items.parquet")
    assert reg.has_extension(t, "eo")
    assert not reg.has_extension(t, "proj")
    stripped = reg.remove_namespace(t, "eo")
    assert "eo:cloud_cover" not in stripped.column_names
    assert "sat:relative_orbit" in stripped.column_names


def test_projection_extension_transform(fixtures_dir):
    reg = ExtensionRegistry().register(PROJECTION)
    ds = rd.read_parquet(
        f"{fixtures_dir}/images.parquet",
        columns=["image_id", "w", "h", "transform"],
    )
    out = reg.apply(ds).to_pandas()
    assert {"fp_xmin", "fp_ymax", "fp_corners"} <= set(out.columns)


def test_planner_with_parquet_source(fixtures_dir, tmp_path):
    src = ParquetSource(fixtures_dir)
    assert isinstance(src, Source)
    planner = Planner(src)
    out = planner.plan(QuerySpec(collections=["sentinel-2a"], limit=5))
    df = out.to_pandas()
    assert len(df) == 5
    assert (df["collection"] == "sentinel-2a").all()

    sink = ParquetSink(str(tmp_path))
    assert isinstance(sink, Sink)
    sink.write(planner.plan(QuerySpec(limit=10)), "page1")
    assert rd.read_parquet(str(tmp_path / "page1")).count() == 10
