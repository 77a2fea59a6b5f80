"""rustac_ray — a Ray-Data-native spatial data-processing engine.

From-scratch re-expression of the query and data-processing capabilities of
stac-utils/rustac (reference at /root/reference, studied read-only) as
``ray.data.Dataset`` pipelines: item search (ids / collections / bbox /
intersects / datetime / CQL2), stac-geoparquet read/write, collection-extent
aggregation, plus the north-rule extensions — cell-indexed spatial join,
kNN item search, raster<->vector web-mercator tile assignment, exact and
near dedup, text analysis and embedding similarity search — all built on
``map_batches`` over zero-copy Arrow batches with actor pools for stateful
stages.

Nothing here calls ``ray.init()``: sessions are owned by the driver,
``bench.py`` and the pytest fixture.
"""

__version__ = "0.1.0"
