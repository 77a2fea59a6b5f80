"""Spec-conformance corpus: ingest + validate the reference's
spec-examples (the reference validates all of them,
crates/validate/tests/examples.rs:6-18 — our analogue: the GeoJSON ingest
edge + structural validator accept every item example)."""

import glob
import json
import os

import pytest

from rustac_ray.stages.geojson import from_geojson_records, to_geojson_records
from rustac_ray.stages.items import ItemValidator

SPEC_DIR = "/root/reference/spec-examples/v1.0.0"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SPEC_DIR), reason="spec-examples not present"
)


def _item_examples():
    out = []
    for path in sorted(glob.glob(f"{SPEC_DIR}/**/*.json", recursive=True)):
        with open(path) as f:
            doc = json.load(f)
        if isinstance(doc, dict) and doc.get("type") == "Feature":
            out.append((os.path.basename(path), doc))
    return out


def test_spec_item_examples_ingest_and_validate():
    examples = _item_examples()
    assert len(examples) >= 5  # simple/core/extended/collectionless/proj...
    records = [doc for _, doc in examples]
    table = from_geojson_records(records)
    assert table.num_rows == len(records)
    # every example passes structural validation (reference validates all)
    v = ItemValidator()
    res = v(table.to_pandas())
    assert res["valid"].all(), res[~res["valid"]]["errors"].tolist()


def test_spec_examples_full_json_schema():
    """Every v1.0.0 + v1.1.0 spec-example validates against its vendored
    core schema (mirror of reference validate/tests/examples.rs:6-18)."""
    from rustac_ray.validate import validate_value

    n = 0
    for base in (SPEC_DIR, SPEC_DIR.replace("v1.0.0", "v1.1.0")):
        for path in sorted(glob.glob(f"{base}/**/*.json", recursive=True)):
            with open(path) as f:
                doc = json.load(f)
            if not isinstance(doc, dict) or doc.get("type") not in (
                "Feature", "Catalog", "Collection",
            ):
                continue
            errs = validate_value(doc)
            assert errs == [], (path, errs)
            n += 1
    assert n >= 15


def test_json_schema_catches_planted_violations():
    from rustac_ray.validate import validate_value

    with open(f"{SPEC_DIR}/simple-item.json") as f:
        base = json.load(f)
    cases = [
        ("missing id", lambda d: d.pop("id")),
        ("null datetime without range",
         lambda d: d["properties"].__setitem__("datetime", None)),
        ("bad bbox arity", lambda d: d.__setitem__("bbox", [1.0, 2.0])),
        ("collection without collection link",
         lambda d: (
             d.__setitem__(
                 "links",
                 [l for l in d.get("links", []) if l.get("rel") != "collection"],
             ),
             d.__setitem__("collection", "c1"),
         )),
        ("non-string license",
         lambda d: d["properties"].__setitem__("license", 42)),
    ]
    for name, mutate in cases:
        doc = json.loads(json.dumps(base))
        mutate(doc)
        assert validate_value(doc) != [], name
    # full validator flags what the structural subset cannot
    doc = json.loads(json.dumps(base))
    doc["properties"]["datetime"] = "not-a-date"
    assert any("datetime" in e for e in validate_value(doc))


def test_schema_validator_stage_over_fixture(sf_dir):
    """The actor-pool stage agrees with the construction-known verdicts of
    the planted-violation fixture."""
    import ray.data as rd

    from rustac_ray.oracles import ensure_derived_fixtures
    from rustac_ray.validate import SchemaValidator

    fdir = ensure_derived_fixtures(sf_dir)
    ds = rd.read_parquet(f"{fdir}/stac_items_validate.parquet")
    expected = ds.to_pandas()[["id", "expected_valid"]]
    out = (
        ds.drop_columns(["expected_valid"])
        .map_batches(SchemaValidator, batch_format="pandas", concurrency=2)
        .to_pandas()
    )
    m = out.merge(expected, on="id")
    assert (m["valid"] == m["expected_valid"]).all()
    assert (~m["valid"]).sum() > 0  # the fixture does plant invalids


def test_spec_item_roundtrip_preserves_keys():
    examples = _item_examples()
    records = [doc for _, doc in examples]
    table = from_geojson_records(records)
    back = to_geojson_records(table)
    for src, rt in zip(records, back):
        assert rt["id"] == src["id"]
        assert rt["geometry"]["type"] == src["geometry"]["type"]
        # every original property key survives the columnar roundtrip
        for k in src.get("properties", {}):
            assert k in rt["properties"], k
