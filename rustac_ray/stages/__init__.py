"""Stage registry: the public operator surface, one import away.

Lazy re-exports (PEP 562) so ``from rustac_ray.stages import zonal_stats``
works without importing every stage module (and its numpy kernels) up
front — stages stay import-light for Ray worker startup.
"""

from __future__ import annotations

_EXPORTS = {
    "aggregates": ["global_extent", "collection_extents", "coverage_area", "scene_gaps", "rolling_window_counts", "daily_counts_filled", "grouped_topk"],
    "decontam": ["BloomFilter", "decontaminate", "ngram_hash_set", "build_bloom"],
    "dedup": [
        "exact_dedup", "incremental_dedup", "dup_ngram_spans", "minhash_lsh_candidates",
        "simhash_near_dup", "ngram_jaccard_near_dup", "phash_near_dup",
        "connected_components", "near_dup_filter",
    ],
    "export": ["write_webdataset_shards", "read_webdataset_shard"],
    "embed": [
        "brute_force_topk", "hard_negative_topk", "lsh_topk", "ivf_topk",
        "train_ivf_centroids", "train_pq", "pq_encode", "pq_topk", "assign_clusters", "embedding_near_dup",
    ],
    "lm": ["train_char_lm", "bigram_cost_table", "PerplexityScorer"],
    "footprint": ["derive_footprints"],
    "knn": ["knn_join", "nearest_neighbor_join", "CellKNNIndex", "ShardedKNNIndex"],
    "multimodal": ["DecodeStats", "Thumbnail", "VerifyPayload", "RandomCrop", "FrameSample"],
    "packing": ["pack_sequences"],
    "relevance": ["corpus_stats", "tfidf_top_terms", "bm25_topk"],
    "sampling": ["hash_sample", "stratified_sample", "grouped_sample_n", "weighted_sample_n"],
    "shuffle": ["deterministic_shuffle", "shuffle_positions", "write_training_shards", "iter_training_batches"],
    "sketch": ["approx_distinct", "exact_quantiles", "histogram", "profile_columns", "token_heavy_hitters"],
    "spatial_join": [
        "broadcast_spatial_join", "partitioned_spatial_join", "hash_spatial_join",
        "within_distance_join", "clip_area_join",
    ],
    "tokenize": ["word_frequencies", "train_bpe", "BPEEncoder"],
    "temporal_join": ["asof_join", "interval_join"],
    "text": ["TextStats", "LangId", "Fingerprint", "Redactor", "NormalizeText", "repetition_stats"],
    "tiling": ["assign_tiles", "tile_counts", "hot_tile_set"],
    "windows": ["tumbling", "sliding", "session_windows"],
    "zonal": ["zonal_stats", "sample_raster_at_points", "tile_pixel_stats", "write_mosaic_pyramid", "Zones"],
}

_ORIGIN = {name: mod for mod, names in _EXPORTS.items() for name in names}
__all__ = sorted(_ORIGIN)


def __getattr__(name: str):
    mod = _ORIGIN.get(name)
    if mod is None:
        raise AttributeError(f"module 'rustac_ray.stages' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(f"rustac_ray.stages.{mod}"), name)
