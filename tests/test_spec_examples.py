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
