"""Full JSON-Schema validation (SURVEY.md §2 validation; reference
crates/validate/src/validator.rs).

Mirrors the reference's design: a prebuilt validator cache — every
(type, version) core schema compiled ONCE per actor from the vendored
spec schemas (validator.rs:271-313 ``prebuild_validators`` /
``prebuild_resources``), with all shared fragments (basics/datetime/
instrument/licensing/provider/bands/common + GeoJSON Feature/Geometry)
pre-registered by their canonical ``$id`` so no network retrieval ever
happens (this container is offline; the reference falls back to HTTP for
unknown schemas, validator.rs:225-240 — out of scope here).

Engine-facing surface:

- :class:`SchemaValidator` — the actor-pool ``map_batches`` stage over a
  FLAT items table: converts each batch row back to its nested STAC JSON
  shape (the geojson output edge) and validates against the core schema
  for its ``type`` + ``stac_version``. Emits (id, valid, n_errors,
  errors). Cheap structural pre-checks stay vectorized; the JSON-Schema
  walk is per-row by nature (jsonschema evaluates one instance).
- :func:`validate_value` — scalar helper for nested STAC dicts
  (items/catalogs/collections), the twin of the reference's
  ``Validator::validate`` entry point.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

import pandas as pd

_SCHEMA_DIR = os.path.join(os.path.dirname(__file__), "schemas")

# (type, version) → core schema file, as in validator.rs:295-311
_CORE_SCHEMAS = {
    ("Feature", "1.0.0"): "v1.0.0/item.json",
    ("Catalog", "1.0.0"): "v1.0.0/catalog.json",
    ("Collection", "1.0.0"): "v1.0.0/collection.json",
    ("Feature", "1.1.0"): "v1.1.0/item.json",
    ("Catalog", "1.1.0"): "v1.1.0/catalog.json",
    ("Collection", "1.1.0"): "v1.1.0/collection.json",
}

_SUPPORTED_VERSIONS = ("1.0.0", "1.1.0")


def _load(rel: str) -> dict:
    with open(os.path.join(_SCHEMA_DIR, rel)) as f:
        return json.load(f)


def _canonical_uri(sub: str, name: str) -> str:
    """Canonical retrieval URI from the directory layout (the reference's
    build_uri, validator.rs:259-268). Derived rather than read from $id:
    the published v1.1.0 common.json carries a typo'd $id ("commonjson")
    that would otherwise break relative-ref resolution."""
    if sub == "geojson":
        return f"https://geojson.org/schema/{name}"
    spec = "item-spec"
    if name == "catalog.json":
        spec = "catalog-spec"
    elif name == "collection.json":
        spec = "collection-spec"
    return f"https://schemas.stacspec.org/{sub}/{spec}/json-schema/{name}"


@lru_cache(maxsize=1)
def _registry():
    """All vendored resources keyed by canonical URI (prebuild_resources)."""
    from referencing import Registry, Resource

    resources = []
    for sub in ("v1.0.0", "v1.1.0", "geojson"):
        d = os.path.join(_SCHEMA_DIR, sub)
        for name in sorted(os.listdir(d)):
            if not name.endswith(".json"):
                continue
            schema = _load(os.path.join(sub, name))
            resources.append((_canonical_uri(sub, name), Resource.from_contents(schema)))
    return Registry().with_resources(resources)


@lru_cache(maxsize=8)
def _validator(type_: str, version: str):
    """Compiled validator for one core schema (the prebuilt cache entry)."""
    import jsonschema

    rel = _CORE_SCHEMAS.get((type_, version))
    if rel is None:
        return None
    schema = _load(rel)
    cls = jsonschema.validators.validator_for(schema)
    return cls(schema, registry=_registry())


def validate_value(value: dict) -> list[str]:
    """Validate one nested STAC JSON value against its core schema;
    returns error messages ([] = valid). Unknown/unsupported type or
    version is itself an error (the reference would try HTTP retrieval;
    offline we report it)."""
    type_ = value.get("type")
    version = value.get("stac_version")
    if type_ not in ("Feature", "Catalog", "Collection"):
        return [f"unknown STAC type: {type_!r}"]
    if version not in _SUPPORTED_VERSIONS:
        return [f"unsupported stac_version: {version!r}"]
    v = _validator(type_, version)
    errs = []
    for e in v.iter_errors(value):
        path = "/".join(str(p) for p in e.absolute_path)
        errs.append(f"{path or '<root>'}: {e.message}"[:300])
    return sorted(errs)


class SchemaValidator:
    """Actor-pool stage: full JSON-Schema validation of a flat items batch.

    ``__init__`` warms the compiled-validator cache once per actor
    (validator.rs:37-50 prebuilt-cache design); ``__call__`` rebuilds each
    row's nested item dict (geojson output edge) and validates it.
    """

    def __init__(self, versions: tuple = _SUPPORTED_VERSIONS):
        for ver in versions:
            for t in ("Feature", "Catalog", "Collection"):
                _validator(t, ver)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        from .stages.geojson import to_geojson_records

        records = to_geojson_records(pa.Table.from_pandas(batch, preserve_index=False))
        errors = [validate_value(r) for r in records]
        return pd.DataFrame(
            {
                "id": batch.get("id", pd.Series([None] * len(batch))).to_numpy(),
                "valid": [not e for e in errors],
                "n_errors": [len(e) for e in errors],
                "errors": ["; ".join(e) for e in errors],
            }
        )
