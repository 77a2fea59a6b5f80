"""CLI entry points — the Ray-native analogue of the reference CLI
(crates/cli/src/lib.rs: translate / search / crawl / validate; `serve` has
no analogue — there is no server in scope, SURVEY.md §3.3).

    python -m rustac_ray search ITEMS.parquet --bbox -106.1,40.5,-106.0,40.6 --limit 10 [-o OUT]
    python -m rustac_ray translate IN OUT [--migrate]
    python -m rustac_ray crawl ITEMS.parquet OUT_DIR
    python -m rustac_ray validate ITEMS.parquet
    python -m rustac_ray join IMAGES.parquet QUERIES.parquet [-o OUT]
    python -m rustac_ray tiles IMAGES.parquet [-z 8] [-o OUT]
    python -m rustac_ray job SF_DIR -o OUT_DIR      # ray job submit payload
    python -m rustac_ray sample T.parquet --key doc_id --rate 0.1 [-o OUT]
    python -m rustac_ray pack DOCS.parquet --budget 512 [-o OUT]
    python -m rustac_ray decontam TRAIN.parquet --test EVAL.parquet [--bloom --drop]
    python -m rustac_ray hitters DOCS.parquet --k 20 [--mg-capacity 4096]
    python -m rustac_ray zonal IMAGES.parquet --zones BOXES.parquet
    python -m rustac_ray shards DOCS.parquet OUT_DIR --rows-per-shard 10000
    python -m rustac_ray tokenize DOCS.parquet --merges 200 [-o OUT]
    python -m rustac_ray lmfilter DOCS.parquet [--cutoff 1750000] [-o OUT]
    python -m rustac_ray coverage IMAGES.parquet --group collection [-o OUT]
    python -m rustac_ray wds IMAGES.parquet OUT_DIR   # WebDataset tar shards

Owns its Ray session (guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import sys


_OWNS_SESSION = False


def _ensure_ray():
    global _OWNS_SESSION
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
        _OWNS_SESSION = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _emit(ds, out: str | None, limit_stdout: int = 20):
    if out:
        from .sources.io import write_items

        write_items(ds, out)
        print(f"wrote {out}")
    else:
        df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
        for rec in df.head(limit_stdout).to_dict("records"):
            print(json.dumps(rec, default=str))
        if len(df) > limit_stdout:
            print(f"... ({len(df)} rows total)", file=sys.stderr)


def cmd_search(args):
    _ensure_ray()
    from .query import QuerySpec, search
    from .sources.io import read_items

    spec = QuerySpec(
        ids=args.ids.split(",") if args.ids else None,
        collections=args.collections.split(",") if args.collections else None,
        bbox=[float(x) for x in args.bbox.split(",")] if args.bbox else None,
        intersects=json.loads(args.intersects) if args.intersects else None,
        datetime=args.datetime,
        filter=args.filter,
        fields=args.fields,
        sortby=args.sortby,
        limit=args.limit,
        offset=args.offset,
    )
    from .sources.io import parse_opt_args

    ds = search(read_items(args.input, opts=parse_opt_args(args.opt)), spec)
    if args.count:
        print(ds.count())
    else:
        _emit(ds.drop_columns([c for c in ("geometry",) if c in ds.schema().names]), args.output)


def cmd_translate(args):
    _ensure_ray()
    from .pipelines.translate import translate

    translate(args.input, args.output, migrate=args.migrate)
    print(f"wrote {args.output}")


def cmd_crawl(args):
    _ensure_ray()
    from .pipelines.translate import crawl_write
    from .sources.io import read_items

    crawl_write(read_items(args.input), args.output)
    print(f"wrote {args.output} (partitioned by collection)")


def cmd_validate(args):
    _ensure_ray()
    from .sources.io import read_items
    from .stages.items import ItemValidator
    from .validate import SchemaValidator

    # --structural = cheap shape checks only; default = full JSON-Schema
    cls = ItemValidator if getattr(args, "structural", False) else SchemaValidator
    out = read_items(args.input).map_batches(
        cls, batch_format="pandas", concurrency=2
    ).to_pandas()
    bad = out[~out["valid"]]
    print(f"{len(out) - len(bad)}/{len(out)} valid")
    for _, row in bad.head(20).iterrows():
        print(f"INVALID {row['id']}: {row['errors']}")
    sys.exit(1 if len(bad) else 0)


def cmd_join(args):
    _ensure_ray()
    import pyarrow.parquet as pq

    from .sources.io import read_items
    from .stages.spatial_join import broadcast_spatial_join, within_distance_join

    queries = pq.read_table(args.queries)
    if args.dwithin is not None:
        ds = within_distance_join(
            read_items(args.input), queries, args.dwithin,
            concurrency=args.concurrency,
        )
    else:
        ds = broadcast_spatial_join(
            read_items(args.input), queries,
            concurrency=args.concurrency, emit=args.emit,
        )
    _emit(ds, args.output)


def cmd_tiles(args):
    _ensure_ray()
    from .sources.io import read_items
    from .stages.tiling import assign_tiles
    from .state.manifest import write_partitioned

    ds = assign_tiles(
        read_items(args.input), z=args.zoom,
        refine_threshold=args.refine_threshold,
    )
    if args.pyramid:
        # Morton-sorted resumable pyramid layout (see flagship.write_tile_pyramid)
        recs = write_partitioned(
            ds.sort("tile_key"), args.pyramid,
            digest_cols=["image_id", "tile_key"],
        )
        print(f"pyramid: {len(recs)} partitions -> {args.pyramid}")
        return
    _emit(ds.drop_columns(["tile_key"]), args.output)


def cmd_job(args):
    """The `ray job submit` payload (north rule): the full flagship
    workload — checkpointed spatial join + Z-order tile pyramid — against
    whatever cluster RAY_ADDRESS points at, emitting one metrics JSON
    line. Rerunning after a failure skips completed partitions via the
    lineage manifests:

        ray job submit --working-dir . -- \\
            python -m rustac_ray job SF_DIR -o /out/run1
    """
    _ensure_ray()
    import time

    from .pipelines.flagship import run_checkpointed, write_tile_pyramid

    t0 = time.perf_counter()
    join_recs = run_checkpointed(
        args.input, f"{args.output}/join",
        concurrency=args.concurrency, resume=not args.no_resume,
    )
    t_join = time.perf_counter() - t0
    t0 = time.perf_counter()
    tile_recs = write_tile_pyramid(
        args.input, f"{args.output}/tiles",
        z=args.zoom, resume=not args.no_resume,
    )
    t_tiles = time.perf_counter() - t0
    print(json.dumps({
        "join_partitions": len(join_recs),
        "join_rows": sum(r["rows"] for r in join_recs),
        "join_sec": round(t_join, 3),
        "tile_partitions": len(tile_recs),
        "tile_rows": sum(r["rows"] for r in tile_recs),
        "tiles_sec": round(t_tiles, 3),
        "output": args.output,
    }))


def cmd_textindex(args):
    _ensure_ray()
    import ray.data as rd

    from .state.textindex import (
        bm25_query_index, build_text_index, merge_text_index,
    )

    if args.action == "build":
        out = build_text_index(
            rd.read_parquet(args.input), args.index,
            partitions=args.partitions,
        )
        print(json.dumps(out))
    elif args.action == "merge":
        out = merge_text_index(rd.read_parquet(args.input), args.index)
        print(json.dumps(out))
    else:  # query
        df = bm25_query_index(
            args.index, args.query.split(","), k=args.k
        )
        for rec in df.to_dict("records"):
            print(json.dumps(rec))


def cmd_sample(args):
    _ensure_ray()
    import ray.data as rd

    from .stages.sampling import grouped_sample_n, hash_sample, stratified_sample

    ds = rd.read_parquet(args.input)
    if args.per_group:
        if not args.group:
            raise SystemExit("--per-group requires --group")
        out = grouped_sample_n(
            ds, args.group, args.key, args.per_group, salt=args.salt
        )
    elif args.rates:
        rates = {
            k: float(v)
            for k, v in (kv.split("=", 1) for kv in args.rates.split(","))
        }
        out = stratified_sample(
            ds, args.key, args.group, rates,
            default_rate=args.rate, salt=args.salt,
        )
    else:
        out = hash_sample(ds, args.key, args.rate, salt=args.salt)
    _emit(out, args.output)


def cmd_pack(args):
    _ensure_ray()
    import ray.data as rd

    from .stages.packing import pack_sequences

    out = pack_sequences(
        rd.read_parquet(args.input),
        id_col=args.id,
        text_col=args.text,
        budget=args.budget,
        num_buckets=args.buckets,
    )
    _emit(out, args.output)


def cmd_decontam(args):
    _ensure_ray()
    import ray.data as rd

    from .stages.decontam import build_bloom, decontaminate, ngram_hash_set

    train = rd.read_parquet(args.input)
    test = rd.read_parquet(args.test)
    member = (
        build_bloom(test, col=args.text, n=args.n, m_bits=args.bloom_bits)
        if args.bloom
        else ngram_hash_set(test, col=args.text, n=args.n)
    )
    out = decontaminate(
        train, member, col=args.text, id_col=args.id,
        n=args.n, threshold=args.threshold,
    )
    if args.drop:
        out = out.map_batches(
            lambda df: df.loc[~df["contaminated"], [args.id]],
            batch_format="pandas",
        )
    _emit(out, args.output)


def cmd_hitters(args):
    _ensure_ray()
    import ray.data as rd

    from .stages.sketch import token_heavy_hitters

    out = token_heavy_hitters(
        rd.read_parquet(args.input), col=args.text, k=args.k,
        mg_capacity=args.mg_capacity,
    )
    _emit(out, args.output)


def cmd_zonal(args):
    _ensure_ray()
    import pandas as pd
    import ray.data as rd

    from .stages.zonal import Zones, zonal_stats

    zones = Zones.from_boxes(pd.read_parquet(args.zones))
    ds = rd.read_parquet(
        args.input,
        columns=["image_id", "bytes", "w", "h", "fmt", "transform"],
    )
    _emit(zonal_stats(ds, zones, strict=not args.lenient), args.output)


def cmd_shards(args):
    _ensure_ray()
    import ray.data as rd

    from .stages.shuffle import write_training_shards

    recs = write_training_shards(
        rd.read_parquet(args.input),
        args.output,
        args.key,
        salt=args.salt,
        rows_per_shard=args.rows_per_shard,
        resume=not args.no_resume,
    )
    print(f"{len(recs)} shards -> {args.output}")


def cmd_wds(args):
    _ensure_ray()
    import ray.data as rd

    from .stages.export import write_webdataset_shards

    cols = ["image_id", "bytes", "caption", "w", "h", "fmt", "phash"]
    recs = write_webdataset_shards(
        rd.read_parquet(args.input, columns=cols), args.output,
        resume=not args.no_resume,
    )
    print(f"{len(recs)} tar shards -> {args.output}")


def cmd_tokenize(args):
    _ensure_ray()
    import ray
    import ray.data as rd

    from .stages.tokenize import BPEEncoder, train_bpe, word_frequencies

    def load():
        return rd.read_parquet(args.input, columns=[args.id, args.text])

    merges = train_bpe(
        word_frequencies(load(), text_col=args.text, sample_mod=args.sample_mod),
        num_merges=args.merges,
    )
    out = load().map_batches(
        BPEEncoder,
        fn_constructor_args=(ray.put(merges),),
        batch_format="pandas",
        concurrency=2,  # < session CPUs, or the actor pool starves the read
    )
    _emit(out, args.output)


def cmd_lmfilter(args):
    _ensure_ray()
    import ray
    import ray.data as rd

    from .stages.lm import PerplexityScorer, bigram_cost_table, train_char_lm

    def load():
        return rd.read_parquet(args.input, columns=[args.id, args.text])

    cost = bigram_cost_table(
        train_char_lm(load(), text_col=args.text, sample_mod=args.sample_mod)
    )
    mode = "filter" if args.cutoff is not None else "score"
    out = load().map_batches(
        PerplexityScorer,
        fn_constructor_args=(ray.put(cost), args.cutoff, mode),
        batch_format="pandas",
        concurrency=2,  # < session CPUs, or the actor pool starves the read
    )
    _emit(out, args.output)


def cmd_coverage(args):
    _ensure_ray()
    import ray.data as rd

    from .stages.aggregates import coverage_area

    ds = rd.read_parquet(
        args.input, columns=["image_id", "w", "h", "transform", args.group]
    )
    _emit(coverage_area(ds, group_col=args.group, quantum=args.quantum), args.output)


def cmd_cluster(args):
    _ensure_ray()
    import ray.data as rd

    from .sources.clustered import (
        merge_clustered,
        prune_plan,
        read_clustered,
        write_clustered,
    )

    if args.action == "write":
        wkw = {}
        if args.cluster_attrs:
            wkw["cluster_attrs"] = args.cluster_attrs.split(",")
        if args.stats_cols:
            wkw["stats_cols"] = args.stats_cols.split(",")
        recs = write_clustered(rd.read_parquet(args.input), args.store, **wkw)
        print(json.dumps({"files": len(recs), "rows": sum(r["rows"] for r in recs)}))
    elif args.action == "compact":
        from .sources.clustered import compact_clustered

        recs = compact_clustered(args.store, target_rows=args.target_rows)
        print(json.dumps({"files": len(recs), "rows": sum(r["rows"] for r in recs)}))
    elif args.action == "merge":
        recs = merge_clustered(args.store, rd.read_parquet(args.input))
        print(json.dumps({"files": len(recs), "rows": sum(r["rows"] for r in recs)}))
    elif args.action == "info":
        from .sources.clustered import SpatialManifest

        recs = sorted(
            SpatialManifest(args.store).completed().values(),
            key=lambda r: r["partition_id"],
        )
        live = [r for r in recs if r.get("xmin") is not None]
        print(
            json.dumps(
                {
                    "files": len(recs),
                    "rows": sum(r["rows"] for r in recs),
                    "bbox": [
                        min(r["xmin"] for r in live),
                        min(r["ymin"] for r in live),
                        max(r["xmax"] for r in live),
                        max(r["ymax"] for r in live),
                    ]
                    if live
                    else None,
                    "rows_per_file_p50": sorted(r["rows"] for r in recs)[len(recs) // 2]
                    if recs
                    else 0,
                }
            )
        )
    elif args.action == "knn":
        from .sources.clustered import knn_clustered

        x, y = (float(v) for v in args.point.split(","))
        df = knn_clustered(args.store, {"q": (x, y)}, args.k)
        for rec in df.to_dict("records"):
            print(json.dumps(rec))
    elif args.action == "versions":
        from .sources.clustered import store_versions

        for rec in store_versions(args.store):
            print(json.dumps(rec))
    elif args.action == "vacuum":
        from .sources.clustered import vacuum_clustered

        print(json.dumps(vacuum_clustered(args.store, keep_versions=args.keep or 1)))
    elif args.action == "schema":
        from .sources.clustered import store_schema

        print(json.dumps(store_schema(args.store, version=args.version)))
    elif args.action == "evolve":
        from .sources.clustered import evolve_clustered

        rename = dict(kv.split("=", 1) for kv in (args.rename or []))
        retype = dict(kv.split("=", 1) for kv in (args.retype or []))
        add = {}
        for kv in args.add or []:
            name, spec = kv.split("=", 1)
            if ":" in spec:  # value:type (value may be empty = null)
                val, t = spec.rsplit(":", 1)
                add[name] = (json.loads(val) if val else None, t)
            else:
                add[name] = json.loads(spec)
        print(
            json.dumps(
                evolve_clustered(
                    args.store,
                    add=add or None,
                    drop=args.drop or None,
                    rename=rename or None,
                    retype=retype or None,
                )
            )
        )
    elif args.action == "changes":
        from .sources.clustered import changes_clustered

        ds = changes_clustered(
            args.store, args.from_version, args.version, id_col=args.id_col
        )
        for rec in ds.to_pandas().to_dict("records"):
            print(json.dumps(rec))
    elif args.action == "delete":
        from .sources.clustered import delete_clustered

        bbox = (
            tuple(float(x) for x in args.bbox.split(",")) if args.bbox else None
        )
        ids = args.ids.split(",") if args.ids else None
        if bbox is None and ids is None and not args.datetime:
            raise SystemExit(
                "cluster delete: need --bbox, --ids and/or --datetime"
            )
        print(json.dumps(delete_clustered(
            args.store, bbox=bbox, ids=ids, datetime=args.datetime,
            id_col=args.id_col,
        )))
    elif args.action == "apply-changes":
        from .sources.clustered import apply_changes

        print(json.dumps(apply_changes(
            args.store, args.dest, args.from_version, args.version,
            id_col=args.id_col,
        )))
    elif args.action == "clone":
        from .sources.clustered import clone_clustered

        print(json.dumps(
            clone_clustered(args.store, args.dest, version=args.version)
        ))
    elif args.action == "maintain":
        from .sources.clustered import maintain_clustered

        print(json.dumps(maintain_clustered(
            args.store, target_rows=args.target_rows,
            keep_versions=args.keep,
            ttl_before=args.ttl_before,
            dry_run=args.plan_only,
        ), default=str))
    elif args.action == "stat":
        from .sources.clustered import stat_clustered

        if not args.stat_col:
            raise SystemExit(
                "cluster stat: --stat-col is required (the zone-map column "
                "to aggregate)"
            )
        print(json.dumps(stat_clustered(
            args.store, args.stat_col, version=args.version
        )))
    elif args.action == "explain":
        from .sources.clustered import explain_clustered

        bbox = (
            tuple(float(x) for x in args.bbox.split(",")) if args.bbox else None
        )
        ranges = {}
        for kv in args.range or []:
            col, span = kv.split("=", 1)
            lo, hi = span.split(":", 1)
            ranges[col] = (json.loads(lo), json.loads(hi))
        print(json.dumps(explain_clustered(
            args.store, bbox=bbox, datetime=args.datetime,
            column_ranges=ranges or None, version=args.version,
        )))
    elif args.action == "view-create":
        from .state.matview import create_matview

        print(json.dumps(create_matview(
            args.store, args.dest,
            group_by=args.group_by.split(","),
            sums=args.sums.split(",") if args.sums else None,
            means=args.means.split(",") if args.means else None,
            mins=args.mins.split(",") if args.mins else None,
            maxs=args.maxs.split(",") if args.maxs else None,
        )))
    elif args.action == "view-chain":
        from .state.matview import create_matview_over

        # store arg doubles as the PARENT view directory here
        print(json.dumps(create_matview_over(
            args.store, args.dest,
            group_by=args.group_by.split(","),
            sums=args.sums.split(",") if args.sums else None,
            means=args.means.split(",") if args.means else None,
            mins=args.mins.split(",") if args.mins else None,
            maxs=args.maxs.split(",") if args.maxs else None,
        )))
    elif args.action == "view-chain-refresh":
        from .state.matview import refresh_matview_over

        print(json.dumps(refresh_matview_over(args.dest)))
    elif args.action == "view-refresh":
        from .state.matview import refresh_matview

        print(json.dumps(refresh_matview(args.store, args.dest)))
    elif args.action == "view-read":
        from .state.matview import read_matview

        for rec in read_matview(args.dest).to_dict("records"):
            print(json.dumps(rec, default=str))
    else:  # read
        bbox = (
            tuple(float(x) for x in args.bbox.split(",")) if args.bbox else None
        )
        version = args.version
        if args.plan_only:
            kept, total = prune_plan(args.store, bbox, version=version)
            print(json.dumps({"kept_files": len(kept), "total_files": total}))
            return
        cols = args.columns.split(",") if args.columns else None
        _emit(
            read_clustered(args.store, bbox=bbox, columns=cols, version=version),
            args.output,
        )


def main(argv=None):
    p = argparse.ArgumentParser(prog="rustac_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    cl = sub.add_parser(
        "cluster",
        help="Morton-clustered store: write / merge / bbox-pruned read",
    )
    cl.add_argument(
        "action",
        choices=[
            "write", "merge", "read", "compact", "delete", "info", "knn",
            "versions", "vacuum", "schema", "evolve", "changes",
            "clone", "maintain", "stat", "explain",
            "view-create", "view-refresh", "view-read", "view-chain",
            "view-chain-refresh", "apply-changes",
        ],
    )
    cl.add_argument("--dest", help="clone/view-*: destination directory")
    cl.add_argument("--group-by", dest="group_by",
                    help="view-create: comma-separated group keys")
    cl.add_argument("--sums", help="view-create: columns to sum")
    cl.add_argument("--means", help="view-create: columns to average")
    cl.add_argument("--mins", help="view-create/chain: columns to min")
    cl.add_argument("--maxs", help="view-create/chain: columns to max")
    cl.add_argument("--cluster-attrs", dest="cluster_attrs",
                    help="write: comma-separated attribute z-order axes")
    cl.add_argument("--stats-cols", dest="stats_cols",
                    help="write: comma-separated zone-map columns")
    cl.add_argument("--ttl-before", dest="ttl_before",
                    help="maintain: expire rows ending before this "
                         "timestamp (ISO)")
    cl.add_argument("--stat-col", dest="stat_col",
                    help="stat: zone-mapped column name")
    cl.add_argument("--datetime",
                    help="explain/delete: STAC datetime / interval")
    cl.add_argument("--ids", help="delete: comma-separated ids")
    cl.add_argument(
        "--range", action="append", metavar="COL=LO:HI",
        help="explain: zone-map column range, JSON endpoints "
             '(e.g. --range \'w=512:2048\', repeatable)',
    )
    cl.add_argument("--point", help="x,y probe for knn")
    cl.add_argument(
        "--rename", action="append",
        help="evolve: old=new (repeatable)",
    )
    cl.add_argument(
        "--add", action="append",
        help='evolve: name=JSONdefault or name=JSONdefault:type '
             '(e.g. weight=1.5, note=:string)',
    )
    cl.add_argument("--drop", action="append", help="evolve: column to drop")
    cl.add_argument(
        "--retype", action="append",
        help="evolve: name=widertype (int32->int64 etc.)",
    )
    cl.add_argument(
        "--from-version", type=int, default=0, dest="from_version",
        help="changes: CDC base version (to-version via --version)",
    )
    cl.add_argument(
        "--id-col", default="image_id", dest="id_col",
        help="changes: unique row key column",
    )
    cl.add_argument(
        "--version", type=int, default=None,
        help="time-travel: read an archived store version",
    )
    cl.add_argument(
        "--keep", type=int, default=None,
        help="vacuum/maintain: versions to retain (vacuum default 1; "
             "maintain skips the vacuum when omitted)",
    )
    cl.add_argument("--k", type=int, default=5)
    cl.add_argument("store", help="clustered store directory")
    cl.add_argument("--target-rows", type=int, default=16384,
                    help="compaction target rows per file")
    cl.add_argument("--input", help="input parquet (write/merge)")
    cl.add_argument("--bbox", help="xmin,ymin,xmax,ymax (read)")
    cl.add_argument("--columns", help="comma-separated projection (read)")
    cl.add_argument("--plan-only", action="store_true",
                    help="print the file-prune decision without reading")
    cl.add_argument("--output", "-o", default=None)
    cl.set_defaults(fn=cmd_cluster)

    s = sub.add_parser("search", help="item search over a flat items table")
    s.add_argument("input")
    s.add_argument("--ids")
    s.add_argument("--collections")
    s.add_argument("--bbox")
    s.add_argument("--intersects", help="GeoJSON geometry string")
    s.add_argument("--datetime")
    s.add_argument("--filter", help="CQL2 text or json")
    s.add_argument("--fields")
    s.add_argument("--sortby")
    s.add_argument("--limit", type=int)
    s.add_argument("--offset", type=int)
    s.add_argument("--count", action="store_true")
    s.add_argument("--opt", action="append", default=[], metavar="K=V",
                   help="object-store option (repeatable), e.g. --opt region=us-west-2")
    s.add_argument("-o", "--output")
    s.set_defaults(fn=cmd_search)

    t = sub.add_parser("translate", help="format conversion (+ optional migrate)")
    t.add_argument("input")
    t.add_argument("output")
    t.add_argument("--migrate", action="store_true")
    t.set_defaults(fn=cmd_translate)

    c = sub.add_parser("crawl", help="partition items by collection on disk")
    c.add_argument("input")
    c.add_argument("output")
    c.set_defaults(fn=cmd_crawl)

    v = sub.add_parser("validate", help="JSON-Schema validation (STAC core schemas)")
    v.add_argument("input")
    v.add_argument("--structural", action="store_true",
                   help="cheap structural checks only (no JSON-Schema)")
    v.set_defaults(fn=cmd_validate)

    j = sub.add_parser("join", help="spatial join images x query geometries")
    j.add_argument("input")
    j.add_argument("queries")
    j.add_argument("--concurrency", type=int, default=4)
    j.add_argument("--emit", choices=["pairs", "counts"], default="pairs",
                   help="counts = LEFT-join per-image match counts")
    j.add_argument("--dwithin", type=float, default=None,
                   help="within-distance join against (query_id, x, y) points")
    j.add_argument("-o", "--output")
    j.set_defaults(fn=cmd_join)

    ti = sub.add_parser("tiles", help="web-mercator tile assignment")
    ti.add_argument("input")
    ti.add_argument("-z", "--zoom", type=int, default=8)
    ti.add_argument("--refine-threshold", type=int, default=None)
    ti.add_argument("-o", "--output")
    ti.add_argument("--pyramid", help="write a Morton-sorted resumable tile pyramid here")
    ti.set_defaults(fn=cmd_tiles)

    jb = sub.add_parser(
        "job", help="full flagship workload (ray job submit payload)"
    )
    jb.add_argument("input", help="sf dir / table dir")
    jb.add_argument("-o", "--output", required=True)
    jb.add_argument("--concurrency", type=int, default=8)
    jb.add_argument("-z", "--zoom", type=int, default=8)
    jb.add_argument("--no-resume", action="store_true")
    jb.set_defaults(fn=cmd_job)

    sa = sub.add_parser(
        "sample", help="deterministic hash / stratified / n-per-group sampling"
    )
    sa.add_argument("input")
    sa.add_argument("--key", required=True, help="non-negative int key column")
    sa.add_argument("--rate", type=float, default=0.1,
                    help="keep rate (also the default-stratum rate with --rates)")
    sa.add_argument("--salt", type=int, default=0)
    sa.add_argument("--group", help="stratum column (--rates / --per-group)")
    sa.add_argument("--rates", help="per-stratum rates, e.g. en=0.25,de=0.5")
    sa.add_argument("--per-group", type=int, help="exactly-n-per-group sample")
    sa.add_argument("-o", "--output")
    sa.set_defaults(fn=cmd_sample)

    pk = sub.add_parser("pack", help="pack docs into token-budget sequences")
    pk.add_argument("input")
    pk.add_argument("--budget", type=int, default=512)
    pk.add_argument("--id", default="doc_id")
    pk.add_argument("--text", default="text")
    pk.add_argument("--buckets", type=int, default=64)
    pk.add_argument("-o", "--output")
    pk.set_defaults(fn=cmd_pack)

    dc = sub.add_parser(
        "decontam", help="drop/flag train docs overlapping a test-set's ngrams"
    )
    dc.add_argument("input", help="train-side parquet")
    dc.add_argument("--test", required=True, help="test/benchmark-side parquet")
    dc.add_argument("--n", type=int, default=5, help="ngram width")
    dc.add_argument("--threshold", type=float, default=0.5)
    dc.add_argument("--id", default="doc_id")
    dc.add_argument("--text", default="text")
    dc.add_argument("--bloom", action="store_true",
                    help="Bloom membership (fixed memory; giant test sets)")
    dc.add_argument("--bloom-bits", type=int, default=1 << 23)
    dc.add_argument("--drop", action="store_true",
                    help="emit only surviving doc ids instead of scores")
    dc.add_argument("-o", "--output")
    dc.set_defaults(fn=cmd_decontam)

    hh = sub.add_parser("hitters", help="exact global top-k frequent tokens")
    hh.add_argument("input")
    hh.add_argument("--k", type=int, default=20)
    hh.add_argument("--text", default="text")
    hh.add_argument("--mg-capacity", type=int, default=None,
                    help="Misra-Gries candidate cap (unbounded-vocab path)")
    hh.add_argument("-o", "--output")
    hh.set_defaults(fn=cmd_hitters)

    ti = sub.add_parser(
        "textindex",
        help="persisted inverted index: build / merge / BM25 query",
    )
    ti.add_argument("action", choices=["build", "merge", "query"])
    ti.add_argument("index", help="index directory")
    ti.add_argument("--input", help="build/merge: documents parquet")
    ti.add_argument("--query", help="query: comma-separated tokens")
    ti.add_argument("--k", type=int, default=20)
    ti.add_argument("--partitions", type=int, default=16)
    ti.set_defaults(fn=cmd_textindex)

    zn = sub.add_parser("zonal", help="per-zone decoded-pixel statistics")
    zn.add_argument("input", help="image payload parquet (input_hint schema)")
    zn.add_argument("--zones", required=True,
                    help="parquet of (query_id, xmin, ymin, xmax, ymax)")
    zn.add_argument("--lenient", action="store_true",
                    help="skip undecodable payloads instead of failing")
    zn.add_argument("-o", "--output")
    zn.set_defaults(fn=cmd_zonal)

    sh = sub.add_parser(
        "shards",
        help="deterministic-shuffle + resumable training-shard writes",
    )
    sh.add_argument("input")
    sh.add_argument("output")
    sh.add_argument("--key", default="doc_id", help="non-negative int key column")
    sh.add_argument("--salt", type=int, default=0, help="epoch salt")
    sh.add_argument("--rows-per-shard", type=int, default=10_000)
    sh.add_argument("--no-resume", action="store_true")
    sh.set_defaults(fn=cmd_shards)

    wd = sub.add_parser(
        "wds", help="export image+caption rows as WebDataset tar shards"
    )
    wd.add_argument("input", help="image payload parquet (input_hint schema)")
    wd.add_argument("output")
    wd.add_argument("--no-resume", action="store_true")
    wd.set_defaults(fn=cmd_wds)

    tk = sub.add_parser("tokenize", help="BPE-train on the corpus, encode every doc")
    tk.add_argument("input")
    tk.add_argument("--merges", type=int, default=200)
    tk.add_argument("--sample-mod", type=int, default=None,
                    help="train on the doc_id %% m == 0 slice only")
    tk.add_argument("--id", default="doc_id")
    tk.add_argument("--text", default="text")
    tk.add_argument("-o", "--output")
    tk.set_defaults(fn=cmd_tokenize)

    lf = sub.add_parser("lmfilter", help="char-bigram LM perplexity score/filter")
    lf.add_argument("input")
    lf.add_argument("--cutoff", type=int, default=None,
                    help="keep docs with mean cost <= cutoff micro-nats/bigram")
    lf.add_argument("--sample-mod", type=int, default=None)
    lf.add_argument("--id", default="doc_id")
    lf.add_argument("--text", default="text")
    lf.add_argument("-o", "--output")
    lf.set_defaults(fn=cmd_lmfilter)

    cv = sub.add_parser("coverage", help="per-group footprint union area (dissolve)")
    cv.add_argument("input", help="image metadata parquet")
    cv.add_argument("--group", default="collection")
    cv.add_argument("--quantum", type=float, default=1e-6)
    cv.add_argument("-o", "--output")
    cv.set_defaults(fn=cmd_coverage)

    args = p.parse_args(argv)
    args.fn(args)
    if _OWNS_SESSION:  # don't tear down a session someone else owns (tests)
        import ray

        ray.shutdown()


if __name__ == "__main__":
    main()
