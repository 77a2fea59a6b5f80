"""CLI integration (reference pattern: assert_cmd end-to-end invocations,
crates/cli/tests/test_cli.rs) — run in-process against the session Ray."""

import json

import pytest

from rustac_ray.__main__ import main


def test_cli_search_count(fixtures_dir, capsys):
    main(["search", f"{fixtures_dir}/stac_items.parquet",
          "--bbox=-106.1,40.5,-106.0,40.6", "--count"])
    assert capsys.readouterr().out.strip() == "50"


def test_cli_search_filter_sort(fixtures_dir, capsys):
    main(["search", f"{fixtures_dir}/stac_items.parquet",
          "--filter", '"sat:relative_orbit" = 98',
          "--sortby=-datetime", "--limit", "1", "--fields", "+id"])
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[0])["id"] == "item-00048"  # latest orbit-98 item


def test_cli_validate_ok(fixtures_dir, capsys):
    with pytest.raises(SystemExit) as e:
        main(["validate", f"{fixtures_dir}/stac_items.parquet"])
    assert e.value.code == 0
    assert "100/100 valid" in capsys.readouterr().out


def test_cli_translate(fixtures_dir, tmp_path, capsys):
    out = str(tmp_path / "out_parquet")
    main(["translate", f"{fixtures_dir}/stac_items.parquet", out])
    import ray.data as rd

    assert rd.read_parquet(out).count() == 100


def test_cli_tiles_pyramid(fixtures_dir, tmp_path, capsys):
    out = str(tmp_path / "pyr")
    main(["tiles", f"{fixtures_dir}/images.parquet", "-z", "6", "--pyramid", out])
    assert "partitions ->" in capsys.readouterr().out
    import os

    import numpy as np
    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert files and os.path.exists(f"{out}/_manifest.jsonl")
    keys = pq.read_table(f"{out}/{files[0]}")["tile_key"].to_numpy()
    assert (np.diff(keys) >= 0).all()


def test_cli_sample_and_pack(sf_dir, tmp_path, capsys):
    docs = f"{sf_dir}/documents.parquet"
    main(["sample", docs, "--key", "doc_id", "--rate", "0.3"])
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(line) for line in out if line.startswith("{")]
    assert rows and all("doc_id" in r for r in rows)

    main(["sample", docs, "--key", "doc_id", "--per-group", "2",
          "--group", "lang"])
    out2 = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    langs = {}
    for r in out2:
        langs[r["lang"]] = langs.get(r["lang"], 0) + 1
    assert all(v <= 2 for v in langs.values())

    dest = str(tmp_path / "packed")
    main(["pack", docs, "--budget", "128", "--buckets", "4", "-o", dest])
    import ray.data as rd

    packed = rd.read_parquet(dest).to_pandas()
    assert {"doc_id", "n_tokens", "bucket", "seq", "clipped"} <= set(packed.columns)


def test_cli_job_resumable(sf_dir, tmp_path, capsys):
    out = str(tmp_path / "jobrun")
    main(["job", sf_dir, "-o", out, "--concurrency", "2", "-z", "6"])
    m1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m1["join_rows"] > 0 and m1["tile_rows"] > 0
    # rerun: every partition already in the manifests → same totals
    main(["job", sf_dir, "-o", out, "--concurrency", "2", "-z", "6"])
    m2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert (m2["join_rows"], m2["tile_rows"]) == (m1["join_rows"], m1["tile_rows"])


def test_cli_hitters(sf_dir, capsys):
    main(["hitters", f"{sf_dir}/documents.parquet", "--k", "3"])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 3
    assert rows[0]["cnt"] >= rows[1]["cnt"] >= rows[2]["cnt"]


def test_cli_decontam_drop(sf_dir, tmp_path, capsys):
    import pandas as pd

    test_path = str(tmp_path / "test.parquet")
    pd.read_parquet(f"{sf_dir}/documents.parquet").head(10).to_parquet(test_path)
    main(["decontam", f"{sf_dir}/documents.parquet", "--test", test_path,
          "--n", "3", "--threshold", "0.99", "--drop"])
    out = capsys.readouterr()
    survivors = {json.loads(l)["doc_id"]
                 for l in out.out.strip().splitlines() if l.startswith("{")}
    # the 10 test docs trivially overlap themselves 100% and are dropped
    assert survivors.isdisjoint(set(range(10)))


def test_cli_zonal(fixtures_dir, capsys):
    main(["zonal", f"{fixtures_dir}/images.parquet",
          "--zones", f"{fixtures_dir}/query_boxes.parquet"])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(r["n_pixels"] > 0 for r in rows)


def test_cli_shards(sf_dir, tmp_path, capsys):
    out = str(tmp_path / "shards")
    main(["shards", f"{sf_dir}/documents.parquet", out,
          "--rows-per-shard", "100"])
    assert "shards ->" in capsys.readouterr().out
    import glob
    files = glob.glob(f"{out}/part-*.parquet")
    assert files


def test_cli_join_counts_and_dwithin(fixtures_dir, capsys):
    main(["join", f"{fixtures_dir}/images.parquet",
          f"{fixtures_dir}/query_geoms.parquet", "--emit", "counts",
          "--concurrency", "2"])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert rows and all("n_matches" in r for r in rows)
    main(["join", f"{fixtures_dir}/images.parquet",
          f"{fixtures_dir}/query_points.parquet", "--dwithin", "0.5",
          "--concurrency", "2"])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert rows and all("dist2" in r for r in rows)


def test_cli_tokenize(sf_dir, capsys):
    main(["tokenize", f"{sf_dir}/documents.parquet", "--merges", "30"])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert rows and all("n_bpe_tokens" in r for r in rows)
    assert all(r["n_bpe_tokens"] > 0 for r in rows if r.get("first_token"))


def test_cli_lmfilter(sf_dir, capsys):
    main(["lmfilter", f"{sf_dir}/documents.parquet"])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert rows and all("nll_micro" in r for r in rows)
    # filter mode: every emitted row satisfies the integer predicate,
    # and the unfiltered sample contains at least one violator
    main(["lmfilter", f"{sf_dir}/documents.parquet", "--cutoff", "1750000"])
    kept = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert kept and all(r["nll_micro"] <= 1750000 * r["n_pairs"] for r in kept)
    assert any(r["nll_micro"] > 1750000 * r["n_pairs"] for r in rows)


def test_cli_coverage(fixtures_dir, capsys):
    main(["coverage", f"{fixtures_dir}/images.parquet"])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert rows and all(r["union_cells"] <= r["sum_box_cells"] for r in rows)


def test_cli_cluster_roundtrip(fixtures_dir, tmp_path, capsys):
    store = str(tmp_path / "clustore")
    main(["cluster", "write", store,
          "--input", f"{fixtures_dir}/images.parquet"])
    wrote = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert wrote["rows"] == 1000
    main(["cluster", "read", store, "--bbox=-110,35,-105,40", "--plan-only"])
    plan = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < plan["kept_files"] <= plan["total_files"]
    main(["cluster", "info", store])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 1000 and info["bbox"] is not None
    main(["cluster", "knn", store, "--point=-106.0,40.5", "--k", "3"])
    knn_out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(knn_out) == 3 and all(r["query_id"] == "q" for r in knn_out)
    main(["cluster", "compact", store, "--target-rows", "500"])
    comp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert comp["rows"] == 1000
    main(["cluster", "read", store, "--bbox=-110,35,-105,40",
          "--columns=image_id"])
    out = capsys.readouterr().out.strip().splitlines()
    assert all("image_id" in line for line in out if line.startswith("{"))


def test_cli_cluster_evolve_schema_changes(fixtures_dir, tmp_path, capsys):
    import json

    store = str(tmp_path / "clistore")
    main(["cluster", "write", store, "--input",
          f"{fixtures_dir}/images.parquet"])
    capsys.readouterr()
    main(["cluster", "evolve", store, "--rename", "collection=source",
          "--add", "weight=1.5", "--add", "note=:string",
          "--retype", "w=int64"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["schema_version"] == 1
    assert "source" in out["columns"] and "weight" in out["columns"]

    main(["cluster", "schema", store])
    cols = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    by = {c["name"]: c for c in cols}
    assert by["w"]["type"] == "int64"
    assert by["weight"]["default"] == 1.5

    # version-0 schema shows the pre-evolve names
    main(["cluster", "schema", store, "--version", "0"])
    cols0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "collection" in {c["name"] for c in cols0}

    # CDC: evolve is metadata-only -> empty change feed
    main(["cluster", "changes", store, "--from-version", "0"])
    assert capsys.readouterr().out.strip() == ""


def test_cli_cluster_clone_maintain_explain(fixtures_dir, tmp_path, capsys):
    import json

    store = str(tmp_path / "ops")
    main(["cluster", "write", store, "--input",
          f"{fixtures_dir}/images.parquet"])
    capsys.readouterr()
    clone = str(tmp_path / "ops2")
    main(["cluster", "clone", store, "--dest", clone])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0

    main(["cluster", "maintain", clone, "--plan-only"])
    plan = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert plan["dry_run"] and "rework_fraction" in plan

    main(["cluster", "explain", store, "--bbox=-120,25,-70,48"])
    ex = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ex["kept_combined"] <= ex["files_total"]

    # r4 ADVICE: explain exposes the full EXPLAIN surface — datetime and
    # zone-map column ranges, not just bbox
    main(["cluster", "explain", store, "--bbox=-120,25,-70,48",
          "--datetime", "2024-11-01/2024-11-10", "--range", "w=512:2048"])
    ex2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"kept_spatial", "kept_temporal", "kept_zonemap",
            "kept_combined"} <= set(ex2)

    # stat without --stat-col is an argparse-grade error, not a KeyError
    with pytest.raises(SystemExit, match="stat-col"):
        main(["cluster", "stat", store])


def test_cli_cluster_attrs_and_view_chain(fixtures_dir, tmp_path, capsys):
    store = str(tmp_path / "attrcli")
    main(["cluster", "write", store, "--input",
          f"{fixtures_dir}/images.parquet",
          "--cluster-attrs", "collection,w"])
    capsys.readouterr()
    main(["cluster", "explain", store, "--range", 'w=24:32',
          "--range", 'collection="naip":"naip"'])
    ex = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ex["kept_zonemap"] <= ex["files_total"]

    parent = str(tmp_path / "pv")
    child = str(tmp_path / "cv")
    main(["cluster", "view-create", store, "--dest", parent,
          "--group-by", "collection,w", "--sums", "h",
          "--mins", "h", "--maxs", "h"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["groups"] > 0
    main(["cluster", "view-chain", parent, "--dest", child,
          "--group-by", "collection", "--sums", "n"])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["groups"] > 0
    main(["cluster", "view-chain-refresh", store, "--dest", child])
    out3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out3["mode"] == "noop"


def test_cli_textindex(sf_dir, tmp_path, capsys):
    idx = str(tmp_path / "tix")
    main(["textindex", "build", idx,
          "--input", f"{sf_dir}/documents.parquet", "--partitions", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 500
    main(["textindex", "query", idx, "--query", "join,vector", "--k", "5"])
    rows = [json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 5 and rows[0]["score"] >= rows[-1]["score"]


def test_cli_apply_changes(fixtures_dir, tmp_path, capsys):
    src = str(tmp_path / "cdc_src")
    dst = str(tmp_path / "cdc_dst")
    main(["cluster", "write", src,
          "--input", f"{fixtures_dir}/images.parquet"])
    capsys.readouterr()
    main(["cluster", "clone", src, "--dest", dst])
    capsys.readouterr()
    main(["cluster", "delete", src, "--bbox=-110,35,-105,40"])
    capsys.readouterr()
    main(["cluster", "apply-changes", src, "--dest", dst,
          "--from-version", "0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["deletes"] > 0
    main(["cluster", "info", src])
    a = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    main(["cluster", "info", dst])
    b = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert a["rows"] == b["rows"]
