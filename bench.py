"""Benchmark harness: headline spatial-join + tile-assignment pipeline.

Runs the flagship pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1
→ 100k-image fixture tier) under ray.init(num_cpus=$RAY_GRAFT_CPUS,
default 32) and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "rows": ..., "rows_per_sec": ...}

``--scaling``: runs the headline pipeline twice in fresh subprocesses at
num_cpus=8 and num_cpus=32 on the same input and reports both throughputs +
scaling efficiency (the sandbox substitute for the N vs 4N node clusters of
the north rule; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    # Ray's default worker niceness (15) lets the OS deprioritize compute
    # workers against the driver/raylet; neutralize it for benchmarking
    os.environ.setdefault("RAY_worker_niceness", "0")
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from rustac_ray import synth
    from rustac_ray.pipelines import flagship
    from rustac_ray.stages.spatial_join import broadcast_spatial_join

    fdir = synth.ensure_fixtures(sf_dir)  # untimed: fixture gen + page cache warm
    # the headline join runs over a metadata bench table big enough that
    # per-task compute dwarfs the ~10ms/task scheduling floor
    bench_rows = int(os.environ.get("GRAFT_BENCH_ROWS", "1000000"))
    bench_path = synth.ensure_bench_meta(bench_rows)
    n_images = synth.tier_for(sf_dir)["images"]
    n_blocks = num_cpus * 4

    # leave CPUs for read tasks; a pool equal to num_cpus starves the read
    # stage (deadlocks outright at num_cpus=2). 0.5 measured best at 32
    # CPUs (interleaved sweep: 16 actors 2.5-2.9s vs 24 actors 2.8-3.5s)
    pool_fraction = float(os.environ.get("GRAFT_POOL_FRACTION", "0.5"))
    joiner_actors = max(1, int(num_cpus * pool_fraction))

    def bench_meta_ds():
        return rd.read_parquet(bench_path, override_num_blocks=n_blocks)

    # probe side scales like the north-rule many-query join
    bench_queries, _ = synth.build_query_tables(2000, seed=7)

    # warm read (untimed) so we measure compute+shuffle, not first disk read
    bench_meta_ds().count()
    flagship.read_images_metadata(sf_dir).count()

    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    join_ds = broadcast_spatial_join(
        bench_meta_ds(), bench_queries, concurrency=joiner_actors
    )
    n_pairs = join_ds.count()
    timings["spatial_join"] = time.perf_counter() - t0

    from rustac_ray.stages.tiling import assign_tiles, tile_counts

    t0 = time.perf_counter()
    n_tiles = assign_tiles(bench_meta_ds(), z=8, refine_threshold=None).count()
    timings["tile_assignment"] = time.perf_counter() - t0

    headline_only = os.environ.get("GRAFT_BENCH_HEADLINE") == "1"

    # Robustness for driver-invoked runs: the op suite keeps growing, and
    # a slow host window must never cost the whole JSON line. After each
    # section, if the wall budget is exhausted the remaining optional
    # sections are skipped (recorded in the JSON as "skipped").
    bench_budget = float(os.environ.get("GRAFT_BENCH_BUDGET", "900"))
    bench_t0 = time.perf_counter()
    skipped: list[str] = []

    class _BudgetExceeded(Exception):
        pass

    def _ck(next_section: str) -> None:
        if time.perf_counter() - bench_t0 > bench_budget:
            skipped.append(next_section)
            raise _BudgetExceeded

    if not headline_only:
        try:
            t0 = time.perf_counter()
            tile_counts(assign_tiles(bench_meta_ds(), z=8, refine_threshold=20_000)).count()
            timings["tile_counts_refined"] = time.perf_counter() - t0
            _ck("knn")

            t0 = time.perf_counter()
            from rustac_ray.stages.knn import knn_join
            from rustac_ray.synth import build_query_points

            pts = build_query_points(bench_queries)
            probes = {
                q: (x, y)
                for q, x, y in zip(
                    pts["query_id"].to_pylist(), pts["x"].to_pylist(), pts["y"].to_pylist()
                )
            }
            knn_join(bench_meta_ds(), probes, k=10, concurrency=joiner_actors).count()
            timings["knn"] = time.perf_counter() - t0
            _ck("spatial_join_sf_tier")

            # correctness-tier pipeline (payload-carrying fixture table)
            t0 = time.perf_counter()
            flagship.run_spatial_join(sf_dir, concurrency=max(2, num_cpus // 2)).count()
            timings["spatial_join_sf_tier"] = time.perf_counter() - t0
            _ck("decode_stats")

            # multimodal decode throughput over the payload-carrying table
            # (small batches: rows are KBs of binary each — memory-aware sizing)
            from rustac_ray.stages.multimodal import DEFAULT_IMAGE_BATCH, DecodeStats

            t0 = time.perf_counter()
            n_decoded = (
                rd.read_parquet(f"{fdir}/images.parquet", override_num_blocks=n_blocks)
                .map_batches(
                    DecodeStats,
                    batch_format="pyarrow",
                    batch_size=DEFAULT_IMAGE_BATCH,
                    concurrency=max(2, num_cpus - 1),
                )
                .count()
            )
            timings["decode_stats"] = time.perf_counter() - t0
            _ck("minhash_near_dup")
            result_extra = {"decoded_rows": n_decoded}

            # training-data ops over the sf documents/embeddings tables
            import numpy as np
            import pyarrow.parquet as pq_

            from rustac_ray.stages.dedup import minhash_lsh_candidates
            from rustac_ray.stages.embed import brute_force_topk

            t0 = time.perf_counter()
            docs = rd.read_parquet(
                f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
            )
            n_pairs_md = minhash_lsh_candidates(
                docs, jaccard_threshold=0.7, concurrency=max(2, num_cpus // 2)
            ).count()
            timings["minhash_near_dup"] = time.perf_counter() - t0
            _ck("ngram_jaccard_near_dup")
            result_extra["minhash_pairs"] = n_pairs_md

            from rustac_ray.stages.dedup import ngram_jaccard_near_dup

            t0 = time.perf_counter()
            n_pairs_ng = ngram_jaccard_near_dup(
                rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
                concurrency=max(2, num_cpus // 2),
            ).count()
            timings["ngram_jaccard_near_dup"] = time.perf_counter() - t0
            _ck("grouped_topk")
            result_extra["ngram_pairs"] = n_pairs_ng

            # scale-op family over the 1M-row bench table: grouped top-k,
            # HLL distinct, exact quantiles, as-of join (right side built by
            # deterministic hash sampling of the same table)
            import pyarrow as pa_
            import pyarrow.compute as pc_

            from rustac_ray.stages.aggregates import grouped_topk
            from rustac_ray.stages.sampling import hash_sample
            from rustac_ray.stages.sketch import approx_distinct, exact_quantiles
            from rustac_ray.stages.temporal_join import asof_join

            def with_ts_int(b):
                return b.append_column(
                    "ts_int", pc_.cast(b["datetime"], pa_.int64())
                ).drop_columns(["transform"])

            def meta_ts():
                return bench_meta_ds().map_batches(with_ts_int, batch_format="pyarrow")

            t0 = time.perf_counter()
            grouped_topk(
                meta_ts(), "collection", "ts_int", 100, tie_cols=["image_id"]
            ).count()
            timings["grouped_topk"] = time.perf_counter() - t0
            _ck("approx_distinct")

            t0 = time.perf_counter()
            approx_distinct(meta_ts(), "collection", "ts_int").count()
            timings["approx_distinct"] = time.perf_counter() - t0
            _ck("exact_quantiles")

            t0 = time.perf_counter()
            exact_quantiles(meta_ts(), "ts_int", [0.1, 0.5, 0.9, 0.99])
            timings["exact_quantiles"] = time.perf_counter() - t0
            _ck("asof_join_1m")

            t0 = time.perf_counter()
            cal = hash_sample(meta_ts(), "ts_int", 0.01).map_batches(
                lambda b: b.select(["collection", "ts_int", "image_id"]),
                batch_format="pyarrow",
            )
            asof_join(
                meta_ts(),
                cal,
                on="ts_int",
                by="collection",
                right_cols=["image_id"],
                tie_break="image_id",
                strategy="broadcast",
            ).count()
            timings["asof_join_1m"] = time.perf_counter() - t0
            _ck("embed_topk_64q")

            t0 = time.perf_counter()
            emb = pq_.read_table(f"{sf_dir}/embeddings.parquet")
            queries_e = {
                str(emb["vec_id"][i].as_py()): np.asarray(
                    emb["embedding"][i].as_py(), dtype=np.float32
                )
                for i in range(min(64, len(emb)))
            }
            brute_force_topk(
                rd.read_parquet(f"{sf_dir}/embeddings.parquet"),
                queries_e, k=10, concurrency=max(2, num_cpus // 2),
            ).count()
            timings["embed_topk_64q"] = time.perf_counter() - t0
            _ck("zonal_stats")

            # zonal statistics: decode + windowed pixel aggregation over the
            # 100k-image payload fixture against the 20 query boxes
            import pandas as pd_

            from rustac_ray.stages.zonal import Zones, zonal_stats

            t0 = time.perf_counter()
            zboxes = pd_.read_parquet(f"{fdir}/query_boxes.parquet")
            n_zonal = zonal_stats(
                rd.read_parquet(
                    f"{fdir}/images.parquet",
                    columns=["image_id", "bytes", "w", "h", "fmt", "transform"],
                ),
                Zones.from_boxes(zboxes),
                concurrency=max(2, num_cpus // 2),
            ).count()
            timings["zonal_stats"] = time.perf_counter() - t0
            _ck("tile_mosaic")
            result_extra["zonal_zones"] = n_zonal

            t0 = time.perf_counter()
            from rustac_ray.stages.zonal import tile_pixel_stats

            n_mosaic = tile_pixel_stats(
                rd.read_parquet(
                    f"{fdir}/images.parquet",
                    columns=["image_id", "bytes", "w", "h", "fmt", "transform"],
                ),
                z=8,
                concurrency=max(2, num_cpus // 2),
            ).count()
            timings["tile_mosaic"] = time.perf_counter() - t0
            _ck("composite_tiles")
            result_extra["mosaic_tiles"] = n_mosaic

            # TRUE pixel composite: rendered rasters via payload groupby
            t0 = time.perf_counter()
            from rustac_ray.stages.zonal import composite_tiles

            n_comp = composite_tiles(
                rd.read_parquet(
                    f"{fdir}/images.parquet",
                    columns=["image_id", "bytes", "w", "h", "fmt", "transform"],
                ),
                z=8,
                tile_px=32,
                concurrency=max(2, num_cpus // 2),
            ).count()
            timings["composite_tiles"] = time.perf_counter() - t0
            _ck("heavy_hitters_200k")
            result_extra["composited_tiles"] = n_comp

            # text-hygiene ops over a 200k-doc (~13M-token) bench corpus
            from rustac_ray.stages.decontam import decontaminate, ngram_hash_set
            from rustac_ray.stages.sketch import token_heavy_hitters

            doc_rows = int(os.environ.get("GRAFT_BENCH_DOC_ROWS", "200000"))
            docs_path = synth.ensure_bench_docs(doc_rows)

            def bench_docs():
                return rd.read_parquet(docs_path, override_num_blocks=n_blocks)

            t0 = time.perf_counter()
            token_heavy_hitters(bench_docs(), k=20).count()
            timings["heavy_hitters_200k"] = time.perf_counter() - t0
            _ck("decontam_200k")

            t0 = time.perf_counter()
            test_side = bench_docs().map_batches(
                lambda df: df.loc[df["doc_id"] % 100 == 0], batch_format="pandas"
            )
            train_side = bench_docs().map_batches(
                lambda df: df.loc[df["doc_id"] % 100 != 0], batch_format="pandas"
            )
            hashes = ngram_hash_set(test_side, n=5)
            n_contam = (
                decontaminate(
                    train_side, hashes, n=5, threshold=0.5,
                    concurrency=max(2, num_cpus // 2),
                )
                .map_batches(
                    lambda df: df.loc[df["contaminated"], ["doc_id"]],
                    batch_format="pandas",
                )
                .count()
            )
            timings["decontam_200k"] = time.perf_counter() - t0
            _ck("curated_shards_200k")
            result_extra["contaminated_docs"] = n_contam

            # standalone exact dedup at 200k docs (r02 verdict #4: the
            # combine="auto" candidate count stays under the driver
            # threshold here; the distributed path has its own pytest)
            from rustac_ray.stages.dedup import exact_dedup
            from rustac_ray.stages.shuffle import shuffle_positions

            t0 = time.perf_counter()
            exact_dedup(bench_docs(), col="text", id_col="doc_id").count()
            timings["exact_dedup_200k"] = time.perf_counter() - t0
            _ck("remove_dup_spans_200k")

            # substring-span dedup rewrite (Lee et al. shape): global
            # 5-gram count fold -> broadcast dup set -> vectorized
            # covered-mask rewrite (pc.binary_join reassembly)
            from rustac_ray.stages.dedup import remove_dup_spans

            t0 = time.perf_counter()
            rds_out = remove_dup_spans(bench_docs(), n=5, mode="all")
            n_rewritten = rds_out.map_batches(
                lambda b: b.select(["n_removed_tokens"]), batch_format="pyarrow"
            ).sum("n_removed_tokens")
            timings["remove_dup_spans_200k"] = time.perf_counter() - t0
            result_extra["dup_span_tokens_removed"] = int(n_rewritten or 0)
            _ck("curated_shards_200k")

            # end-to-end curation: dedup -> decontaminate -> shard order
            t0 = time.perf_counter()
            deduped = exact_dedup(bench_docs(), col="text", id_col="doc_id")
            train2 = deduped.map_batches(
                lambda df: df.loc[df["doc_id"] % 100 != 0], batch_format="pandas"
            )
            clean = decontaminate(
                train2, hashes, n=5, threshold=0.5,
                concurrency=max(2, num_cpus // 2),
            ).map_batches(
                lambda df: df.loc[~df["contaminated"], ["doc_id"]],
                batch_format="pandas",
            )
            n_curated = len(shuffle_positions(clean, "doc_id", rows_per_shard=10_000))
            timings["curated_shards_200k"] = time.perf_counter() - t0
            result_extra["curated_docs"] = n_curated
            _ck("bpe_encode_200k")

            # tokenizer + LM scoring over the same 200k-doc corpus
            from rustac_ray.stages.tokenize import (
                BPEEncoder,
                train_bpe,
                word_frequencies,
            )

            t0 = time.perf_counter()
            merges = train_bpe(word_frequencies(bench_docs()), num_merges=200)
            bench_docs().map_batches(
                BPEEncoder,
                fn_constructor_args=(ray.put(merges),),
                batch_format="pandas",
                concurrency=max(2, num_cpus // 2),
            ).count()
            timings["bpe_encode_200k"] = time.perf_counter() - t0
            _ck("lm_score_200k")

            from rustac_ray.stages.lm import (
                PerplexityScorer,
                bigram_cost_table,
                train_char_lm,
            )

            t0 = time.perf_counter()
            cost = bigram_cost_table(train_char_lm(bench_docs()))
            bench_docs().map_batches(
                PerplexityScorer,
                fn_constructor_args=(ray.put(cost),),
                batch_format="pandas",
                concurrency=max(2, num_cpus // 2),
            ).count()
            timings["lm_score_200k"] = time.perf_counter() - t0
            _ck("nearest_scene_1m")

            # self-join kNN over the full 1M-row metadata table
            from rustac_ray.stages.knn import nearest_neighbor_join

            t0 = time.perf_counter()
            # res=None -> auto (+1 level per 4x rows; r5 fix — fixed
            # res=10 was quadratic-in-cell-population at 10M rows:
            # 137s vs 16s at the auto-chosen res=12)
            nearest_neighbor_join(
                bench_meta_ds(), res=None, concurrency=max(2, num_cpus // 3)
            ).count()
            timings["nearest_scene_1m"] = time.perf_counter() - t0
            _ck("image_curation_1m")

            # image-curation E2E over a 1M-row phash table: band-LSH
            # near-dup pairs -> connected components -> keep-min-id ->
            # aspect buckets -> hash split (pixels never exist here —
            # the same metadata-only economics as the real pipeline)
            from rustac_ray.stages.dedup import near_dup_filter, phash_near_dup
            from rustac_ray.stages.multimodal import aspect_buckets
            from rustac_ray.stages.sampling import dataset_split

            phash_path = synth.ensure_bench_phash(bench_rows)

            def bench_phash_ds():
                return rd.read_parquet(
                    phash_path, override_num_blocks=n_blocks
                )

            t0 = time.perf_counter()
            pairs = phash_near_dup(
                bench_phash_ds(), max_hamming=2, n_bands=3
            )
            canon = near_dup_filter(
                bench_phash_ds(), pairs, id_col="image_id"
            )
            import pyarrow as _pa
            import pyarrow.compute as _pc

            keyed = aspect_buckets(canon).map_batches(
                lambda b: b.append_column(
                    "img_key",
                    _pc.cast(
                        _pc.utf8_slice_codeunits(b["image_id"], 4, 32),
                        _pa.int64(),
                    ),
                ),
                batch_format="pyarrow",
            )
            n_canon = dataset_split(
                keyed, "img_key",
                [("train", 0.9), ("val", 0.05), ("test", 0.05)], salt=13,
            ).count()
            timings["image_curation_1m"] = time.perf_counter() - t0
            result_extra["curated_images"] = n_canon
            _ck("semantic_dedup_200k")

            # SemDeDup over 200k 32-dim embeddings, 64 clusters: broadcast
            # assignment matmul + ONE groupby(cluster) + per-cluster
            # blocked O(n_c^2) dominance (n_c ~ 3k here)
            from rustac_ray.stages.embed import semantic_dedup

            emb_rows = int(os.environ.get("GRAFT_BENCH_EMB_ROWS", "200000"))
            emb_dir = synth.ensure_bench_embeddings(emb_rows)
            cent_tbl = pq_.read_table(f"{emb_dir}/centroids.parquet")
            import numpy as _np

            centroids = _np.stack(
                cent_tbl["centroid"].to_numpy(zero_copy_only=False)
            )
            emb_ds = rd.read_parquet(
                [f"{emb_dir}/part-{i:03d}.parquet" for i in range(
                    len([f for f in os.listdir(emb_dir)
                         if f.startswith("part-")]))],
                override_num_blocks=n_blocks,
            )
            t0 = time.perf_counter()
            n_sem = semantic_dedup(
                emb_ds, centroids, cosine_threshold=0.99,
                concurrency=max(2, num_cpus // 2),
            ).count()
            timings["semantic_dedup_200k"] = time.perf_counter() - t0
            result_extra["semantic_kept"] = n_sem
            _ck("clustered_store_1m")

            # Morton-clustered store: ONE write-time Z-order sort, then a
            # bbox query reads only manifest-intersecting files (vs the
            # full-scan filter over all blocks)
            import shutil as _sh

            from rustac_ray.sources.clustered import (
                prune_plan,
                read_clustered,
                write_clustered,
            )
            from rustac_ray.stages.footprint import derive_footprints as _dfp

            cl_dir = "/tmp/rustac_bench_clustered"
            _sh.rmtree(cl_dir, ignore_errors=True)
            t0 = time.perf_counter()
            write_clustered(bench_meta_ds(), cl_dir)
            timings["clustered_write_1m"] = time.perf_counter() - t0
            _B = (-110.0, 35.0, -105.0, 40.0)
            t0 = time.perf_counter()
            n_pruned = read_clustered(cl_dir, bbox=_B, columns=["image_id"]).count()
            timings["clustered_bbox_read"] = time.perf_counter() - t0

            def _boxfilter(b):
                b = _dfp(b)
                m = _pc.and_(
                    _pc.and_(
                        _pc.less_equal(b["fp_xmin"], _B[2]),
                        _pc.greater_equal(b["fp_xmax"], _B[0]),
                    ),
                    _pc.and_(
                        _pc.less_equal(b["fp_ymin"], _B[3]),
                        _pc.greater_equal(b["fp_ymax"], _B[1]),
                    ),
                )
                return b.filter(m).select(["image_id"])

            t0 = time.perf_counter()
            n_full = bench_meta_ds().map_batches(
                _boxfilter, batch_format="pyarrow"
            ).count()
            timings["clustered_fullscan_control"] = time.perf_counter() - t0
            kept, total_files = prune_plan(cl_dir, _B)
            result_extra["clustered_files_kept"] = f"{len(kept)}/{total_files}"
            assert n_pruned == n_full
            _ck("headline_clustered")

            # Layout-accelerated headline (VERDICT r3 #7): the SAME regional
            # join+tiles workload on BOTH paths — probes restricted to an AOI
            # (the realistic query-driven pattern) so the store's file/row-
            # group pruning engages. The flat path must scan all 1M rows; the
            # clustered path reads only manifest-intersecting files, with
            # footprints already materialized. Results asserted identical.
            #
            # Measured full-domain control (r4 notes): with UNSELECTIVE
            # probes the Z-ordered layout is ~30% SLOWER for the broadcast
            # join than the randomly-ordered flat table — Z-order
            # concentrates hot-region candidate pairs into few tasks, while
            # random order is perfect load balance. The store's win is
            # pruning, so the honest headline_clustered is the selective
            # workload, with both paths answering it.
            from rustac_ray.geo.wkb import decode_bboxes as _dbb
            from rustac_ray.stages.footprint import (
                derive_footprints as _dfp2,  # noqa: F811 (alias reuse)
            )

            _AOI = (-115.0, 25.0, -95.0, 40.0)  # 300/1800 deg^2, incl. hot box
            _qb = _dbb(bench_queries["geometry"].to_pylist())
            _in_aoi = (
                (_qb[:, 0] >= _AOI[0]) & (_qb[:, 1] >= _AOI[1])
                & (_qb[:, 2] <= _AOI[2]) & (_qb[:, 3] <= _AOI[3])
            )
            aoi_queries = bench_queries.filter(_pa.array(_in_aoi))
            result_extra["aoi_probes"] = len(aoi_queries)

            def _aoi_filter(b):
                b = _dfp2(b)
                m = _pc.and_(
                    _pc.and_(
                        _pc.less_equal(b["fp_xmin"], _AOI[2]),
                        _pc.greater_equal(b["fp_xmax"], _AOI[0]),
                    ),
                    _pc.and_(
                        _pc.less_equal(b["fp_ymin"], _AOI[3]),
                        _pc.greater_equal(b["fp_ymax"], _AOI[1]),
                    ),
                )
                return b.filter(m)

            # flat path: full scan for both stages
            t0 = time.perf_counter()
            n_pairs_aoi = broadcast_spatial_join(
                bench_meta_ds(), aoi_queries, concurrency=joiner_actors
            ).count()
            fj = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_tiles_aoi = assign_tiles(
                bench_meta_ds().map_batches(_aoi_filter, batch_format="pyarrow"),
                z=8,
                refine_threshold=None,
                footprints_derived=True,
            ).count()
            ft = time.perf_counter() - t0
            timings["headline_flat_aoi"] = fj + ft

            # clustered path: manifest-pruned read, materialized footprints
            _JC = ["image_id", "fp_corners", "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax"]
            t0 = time.perf_counter()
            n_pairs_cl = broadcast_spatial_join(
                read_clustered(cl_dir, bbox=_AOI, columns=_JC),
                aoi_queries,
                concurrency=joiner_actors,
                footprints_derived=True,
                batch_size=1024,  # split z-contiguous hot files across tasks
            ).count()
            cj = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_tiles_cl = assign_tiles(
                read_clustered(cl_dir, bbox=_AOI, columns=_JC[:1] + _JC[2:]),
                z=8,
                refine_threshold=None,
                footprints_derived=True,
            ).count()
            ct = time.perf_counter() - t0
            timings["headline_clustered"] = cj + ct
            assert n_pairs_cl == n_pairs_aoi, (n_pairs_cl, n_pairs_aoi)
            assert n_tiles_cl == n_tiles_aoi, (n_tiles_cl, n_tiles_aoi)
            result_extra["headline_clustered_speedup"] = round(
                timings["headline_flat_aoi"] / timings["headline_clustered"], 2
            )
            _ck("store_lifecycle")

            # Lakehouse mutation lifecycle on the SAME 1M-row store (runs
            # after the read sections so it doesn't perturb them):
            # metadata-only schema evolve, matview create (full groupby),
            # AOI delete, 50k-row merge, then an INCREMENTAL view refresh
            # that folds only the delta files — the refresh/create ratio
            # is the number that matters at 100 TB.
            import pyarrow as _pa
            import pyarrow.compute as _pc2

            from rustac_ray.sources.clustered import (
                delete_clustered, evolve_clustered, merge_clustered,
            )
            from rustac_ray.state.matview import (
                create_matview, refresh_matview,
            )

            t0 = time.perf_counter()
            evolve_clustered(
                cl_dir, rename={"collection": "source"}, add={"weight": 1.0}
            )
            timings["store_evolve_metadata"] = time.perf_counter() - t0

            mv_dir = cl_dir + "_view"
            _sh.rmtree(mv_dir, ignore_errors=True)
            t0 = time.perf_counter()
            create_matview(cl_dir, mv_dir, group_by=["source"], sums=["w"])
            timings["matview_create_1m"] = time.perf_counter() - t0

            t0 = time.perf_counter()
            delete_clustered(cl_dir, bbox=(-100.0, 30.0, -95.0, 35.0))
            timings["store_delete_aoi_1m"] = time.perf_counter() - t0

            # regional ingest (the realistic merge shape): new rows land
            # in ONE AOI, so they route to the few files owning that key
            # range and the CDC delta stays O(touched files). A measured
            # control with UNIFORMLY RANDOM new rows instead touched all
            # 62 files and made refresh 2.4x SLOWER than create — Z-order
            # ownership is what keeps incremental maintenance incremental.
            _M = (-100.0, 28.0, -96.0, 33.0)

            def _as_new(b):
                b = _dfp(b)
                m = _pc2.and_(
                    _pc2.and_(
                        _pc2.less_equal(b["fp_xmin"], _M[2]),
                        _pc2.greater_equal(b["fp_xmax"], _M[0]),
                    ),
                    _pc2.and_(
                        _pc2.less_equal(b["fp_ymin"], _M[3]),
                        _pc2.greater_equal(b["fp_ymax"], _M[1]),
                    ),
                )
                b = b.filter(m)
                return _pa.table({
                    "image_id": _pc2.binary_join_element_wise(
                        "new-", b["image_id"], ""
                    ),
                    "w": b["w"], "h": b["h"], "transform": b["transform"],
                    "datetime": b["datetime"],
                    "source": b["collection"],
                    "weight": _pa.array([2.0] * len(b), _pa.float64()),
                    **{c: b[c] for c in (
                        "fp_xmin", "fp_ymin", "fp_xmax", "fp_ymax",
                        "fp_corners",
                    )},
                })

            new_rows = bench_meta_ds().map_batches(
                _as_new, batch_format="pyarrow"
            )
            t0 = time.perf_counter()
            n_merged = sum(
                r["rows"]
                for r in merge_clustered(
                    cl_dir, new_rows, footprints_derived=True
                )
            )
            timings["store_merge_regional"] = time.perf_counter() - t0
            result_extra["store_rows_after_merge"] = n_merged

            t0 = time.perf_counter()
            out_mv = refresh_matview(cl_dir, mv_dir)
            timings["matview_refresh_delta"] = time.perf_counter() - t0
            assert out_mv["mode"] == "incremental", out_mv
            result_extra["matview_refresh_vs_create"] = round(
                timings["matview_refresh_delta"] / timings["matview_create_1m"], 2
            )
            _ck("bloom_semi_join")

            # Bloom-prefiltered semi join: orders with a high-quantity
            # lineitem (native left_semi verify of the survivors only)
            from rustac_ray.stages.bloomjoin import bloom_semi_join

            orders_b = rd.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_totalprice"],
            )
            li_b = rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_quantity"],
            ).map_batches(
                lambda b: b.filter(_pc.greater(b["l_quantity"], 45)),
                batch_format="pyarrow",
            )
            t0 = time.perf_counter()
            n_semi = bloom_semi_join(
                orders_b, li_b, on="o_orderkey", right_on="l_orderkey",
                how="semi", verify="join", num_partitions=num_cpus // 2,
                concurrency=max(2, num_cpus // 4),
            ).count()
            timings["bloom_semi_join"] = time.perf_counter() - t0
            result_extra["bloom_semi_rows"] = n_semi
            _ck("approx_quantiles")

            # one-pass mergeable quantile sketch vs the multi-pass exact
            # bisection, same column
            from rustac_ray.stages.sketch import approx_quantiles, exact_quantiles

            def li_price():
                return rd.read_parquet(
                    f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
                )

            _QS = [0.01, 0.25, 0.5, 0.75, 0.99]
            t0 = time.perf_counter()
            approx_quantiles(li_price(), "l_extendedprice", _QS, cap=2048)
            timings["approx_quantiles_1pass"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            exact_quantiles(li_price(), "l_extendedprice", _QS)
            timings["exact_quantiles_multipass"] = time.perf_counter() - t0
            _ck("quality_lr_train_200k")

            # distributed-GD trained quality filter: 6 one-pass epochs
            # over the 200k-doc corpus + a scoring pass
            from rustac_ray.stages.quality_lr import (
                score_quality_lr,
                train_quality_lr,
            )

            docs_path = synth.ensure_bench_docs(200_000)
            docs_b = rd.read_parquet(
                docs_path, columns=["doc_id", "text"],
                override_num_blocks=n_blocks,
            )
            t0 = time.perf_counter()
            w_lr = train_quality_lr(docs_b, epochs=6)

            # agreement with the weak label (the synthetic token corpus
            # is all label-0 prose-free text, so kept-count alone would
            # read as a bug; agreement shows the model DID fit it)
            from rustac_ray.stages.quality_lr import default_label, featurize

            def agree_partial(d):
                import pandas as _pd

                x = featurize(d["text"])
                y = default_label(x)
                ww = w_lr
                z = x[:, 0] * ww[0]
                for j in range(1, len(ww)):
                    z = z + x[:, j] * ww[j]
                return _pd.DataFrame(
                    [{"agree": int(((z >= 0.0) == (y > 0.5)).sum()),
                      "n": len(d)}]
                )

            agg = rd.read_parquet(
                docs_path, columns=["text"], override_num_blocks=n_blocks
            ).map_batches(agree_partial, batch_format="pandas").to_pandas()
            timings["quality_lr_train_200k"] = time.perf_counter() - t0
            result_extra["lr_label_agreement"] = round(
                float(agg["agree"].sum() / max(int(agg["n"].sum()), 1)), 4
            )

        except _BudgetExceeded:
            pass

    headline = timings["spatial_join"] + timings["tile_assignment"]
    result_extra = locals().get("result_extra", {})
    result = {
        "metric": (
            "spatial-join + tile-assignment wall time "
            f"({bench_rows:,}-row metadata bench table)"
        ),
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "rows": bench_rows,
        "join_pairs": n_pairs,
        "tile_rows": n_tiles,
        "rows_per_sec": round(2 * bench_rows / headline, 1),
        **({"skipped": skipped} if skipped else {}),
        **result_extra,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh ray.init processes at N and 4N CPUs.

    This sandbox's CPU availability fluctuates ±2-3x run to run (shared
    VM), so the two levels are run INTERLEAVED for `reps` rounds and the
    per-level minimum (least-throttled observation) is reported.
    """
    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", str(lo_cpus * 4)))
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "2"))

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_HEADLINE="1")
        env.setdefault("GRAFT_BENCH_ROWS", "4000000")
        # pool = cpus/2 so the worker-count ratio equals the CPU ratio
        env.setdefault("GRAFT_POOL_FRACTION", "0.5")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_times, hi_times = [], []
    for _ in range(reps):
        lo_times.append(run(lo_cpus)["value"])
        hi_times.append(run(hi_cpus)["value"])
    t_lo, t_hi = min(lo_times), min(hi_times)
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    return {
        "metric": f"scaling efficiency {lo_cpus}→{hi_cpus} CPUs "
        "(sandbox substitute for N→4N nodes)",
        f"sec_{lo_cpus}": t_lo,
        f"sec_{hi_cpus}": t_hi,
        f"all_sec_{lo_cpus}": lo_times,
        f"all_sec_{hi_cpus}": hi_times,
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
