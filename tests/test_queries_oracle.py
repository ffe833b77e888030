"""Mirror of the driver's correctness gate: run every queries() entry
at sf0.001 and compare against its oracle_sql() DuckDB result —
row count, column names, and exact values (order-insensitive)."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def entrymod(ray_session):
    import importlib
    import __ray_entry__
    importlib.reload(__ray_entry__)
    return __ray_entry__


def _to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


SQL_CHECKED = [
    "q01_pricing_summary", "q03_top_orders", "q_join_resolve",
    "q_first_match_classify", "q_window_tumbling", "q_topk_users",
    "q_supplier_by_region",
    "q_cell_encode", "q_tile_histogram", "q_pip_rect", "q_pip_partitioned", "q_knn",
    "q_snap_dedup", "q_dedup_exact", "q_token_stats",
    "q_punct_by_source", "q_ann_topk", "q_session_windows", "q_asof_join",
    # round 2: sketch/LSH family under the SQL oracle (md5-parity
    # hashes + exact-verified similarity) and the SQL-derivable
    # conversion/postprocess pipelines
    "q_window_sliding", "q_topk_per_group", "q_quantiles_by_user",
    "q_customers_without_orders",
    "q_langid_counts", "q_simhash_docs", "q_minhash_pairs",
    "q_ngram_jaccard_pairs", "q_fingerprints", "q_embed_near_dup",
    "q_ivf_topk", "q_convert_pipeline", "q_postprocess_pipeline",
    "q_corpus_filter",
    # round 3: the image/audio/video family under the SQL oracle via
    # engine-independent fixture side tables (entities + clip
    # metadata; DP mirrored by a recursive CTE), and the mandated
    # Lance format end-to-end (vendored write->pruned read->agg)
    "q_convert_images", "q_postprocess_ways",
    "q_audio_features", "q_video_frames", "q_lance_scan",
    "q_ivf_partitioned_topk",
    # round 3 additions: sketch + sampling + non-equi range join +
    # sequence packing
    "q_split_stats", "q_distinct_hll", "q_distinct_hll_grouped",
    "q_range_join_alerts", "q_token_pack", "q_phash_near_dup",
    "q_distance_join", "q_quantile_sketch",
    # round 3 (3rd session): geometry-length analytics + BM25 search
    "q_way_length", "q_bm25_topk", "q_kmeans_clusters",
    "q_stratified_sample", "q_pq_codes", "q_pq_adc_topk",
    # round 3 (4th session): repetition-quality gate + heavy hitters
    "q_repetition_filter", "q_heavy_hitters", "q_semantic_dedup",
    "q_mixture_sample", "q_decontaminate", "q_lm_score", "q_event_deltas",
    "q_dsir_weights", "q_grouped_mode", "q_clip_score",
    "q_incremental_dedup", "q_cooccurrence_pmi", "q_quality_cut",
    "q_window_distinct_users", "q_embed_outliers",
    # round 3 (5th session): full-outer reconciliation join + the
    # distributed prefix scan
    "q_orders_events_daily", "q_running_total", "q_rollup_docs",
    "q_ntile_events", "q_pagerank", "q_bfs_hops", "q_exact_median",
    "q_interval_overlap", "q_skyline", "q_corr_events", "q_pps_sample",
    "q_set_intersect", "q_set_except", "q_keyed_window_join",
    "q_cube_docs", "q_entropy_by_user", "q_funnel",
    "q_retention", "q_time_weighted", "q_rolling_sum", "q_props_stats",
    # round 3 (6th session): pivot + row-level sessionization +
    # transition matrix
    "q_pivot_events", "q_session_ids", "q_activity_islands",
    "q_transition_counts",
    "q05_local_supplier", "q10_returned_items",
    "q15_top_supplier", "q18_large_volume",
    # round 3 (7th session): classic word count, ingestion column
    # profiling, keyed snapshot reconciliation diff
    "q_word_count", "q_profile_docs", "q_snapshot_diff",
    "q_fuzzy_names", "q_triangle_count",
    "q_rolling_anomaly", "q_kl_drift",
    "q_melt_lineitem", "q_event_sequences", "q_interval_coverage",
    "q_tfidf_terms",
    "q_tile_extent", "q_haversine_knn",
    "q_share_of_value", "q_chi_square",
    "q_minmax_scale", "q_grouped_mad",
    "q_percent_rank", "q_dedup_keep_best",
    "q_ewma", "q_ohlc", "q_union_by_name",
    # round 3 (8th session): TPC-H plan-shape completions — Q13 left
    # outer histogram, Q17 per-key avg join-back, Q22 global-scalar
    # broadcast + date-scoped anti-join
    "q13_cust_distribution", "q17_small_qty_revenue",
    "q22_idle_rich_customers", "q_dup_ngram_ratio", "q_way_area",
    "q_bbox_join", "q_image_stats", "q_chunk_dedup", "q_gap_fill",
    "q_ring_centroid", "q16_part_supplier_counts", "q_trimmed_mean",
    "q_embed_centroid", "q12_priority_lines", "q_cdc_merge",
    "q_weighted_median", "q_video_scenes", "q_new_users_daily",
    "q_focal_density", "q_impute_values", "q_fill_forward",
    # round 3 (9th session): Q4 EXISTS semi-join, partitioned-sink
    # round trip
    "q04_order_priority", "q_partitioned_write",
    "q06_forecast_revenue", "q14_promo_revenue", "q19_discounted_revenue",
    "q07_volume_shipping", "q08_market_share", "q09_product_profit",
    "q02_min_cost_supplier", "q11_important_stock",
    "q20_dominant_suppliers", "q21_sole_blocking_supplier",
    "q_clip_tiles", "q_chunk_passages", "q_geohash_encode",
    "q_geojson_roundtrip", "q_resample_segments", "q_thumbnails",
    "q_knn_join", "q_clip_ways",
    # round 3 (11th session): BPE pair statistics + tokenizer OOV
    # coverage
    "q_bpe_pairs", "q_vocab_coverage", "q_pruned_scan",
    # round 3 (12th session): PII redaction, global rank, JSONL hop
    "q_pii_redact", "q_global_rank", "q_jsonl_roundtrip",
    # round 3 (13th session): iterative BPE tokenizer training
    "q_bpe_train",
    # round 3 (14th session): distributed grid DBSCAN, per-user
    # trajectory path length, conditional bigram LM scoring
    "q_dbscan", "q_trajectory_length", "q_bigram_lm",
    "q_image_sharpness", "q_rrf_fusion", "q_value_trend", "q_scd2",
    "q_mmr_select", "q_gram_matrix", "q_winsorized", "q_snap_to_roads",
    "q_hard_negatives", "q_bpe_encode", "q_csv_roundtrip",
    "q_orc_roundtrip", "q_radius_gyration", "q_benford",
    "q_gini", "q_cusum", "q_link_prediction", "q_morans_i",
    # round 4: the subquadratic LSH embedding near-dup path under the
    # SQL oracle (planted recall-1.0 corpus), and the no-broadcast
    # bigram-LM dual under its own gate
    "q_embed_near_dup_lsh", "q_bigram_lm_distributed",
    # round 4: header-only image metadata scan (fmt/w/h/detail
    # re-derived from container headers, no decode) and event-time
    # watermark accounting (distributed prefix-MAX over arrival order)
    "q_image_meta_scan", "q_watermark_late",
    # round 5: lossy-JPEG decode stats under the decode-round-trip
    # contract (ground truth = same decoder run locally on the driver)
    "q_image_stats_lossy",
    # round 5: the remaining no-broadcast scale duals under their own
    # oracle gates (the round-4 rule, completed for the LM family)
    "q_lm_score_distributed", "q_dsir_distributed",
    # round 5: one-pass multi-resolution tile-pyramid rollup + the
    # k-core graph-curation peel (unrolled MATERIALIZED-CTE oracle)
    "q_cell_pyramid", "q_kcore",
    # round 5: half-life-decayed per-key totals (integer halving) and
    # market-basket pair support
    "q_decayed_counts", "q_basket_pairs",
    # round 5: multinomial Naive Bayes source classifier (broadcast
    # model + the sparse-delta no-broadcast scale dual)
    "q_nb_classify", "q_nb_classify_distributed",
    # round 5: per-node local clustering coefficient (wedge plan with
    # center attribution; exact integer cc_ppm)
    "q_clustering_coeff",
    # round 5: per-tile image mosaic (real decode + phash-derived
    # tile rollup; both halves pinned by independent side tables)
    "q_tile_mosaic",
    # round 5: A/B Welch two-sample t over md5-hash-split variants
    "q_ab_test",
    # round 5: per-key linear-interpolation time-grid resample
    "q_interp_resample",
    # round 5: bounded-round weighted shortest paths (Bellman-Ford,
    # unrolled min-aggregate SQL chain)
    "q_sssp",
    # round 5: exact interpolated PERCENTILE_CONT via two exact_kth
    # selections
    "q_quantile_cont",
    # round 5: vendored Avro container sink/source round trip
    "q_avro_roundtrip",
    # round 5: degree assortativity (symmetrized endpoint-degree
    # Pearson r, exact int64 moments)
    "q_assortativity",
    # round 5: per-source lexical diversity (integer TTR/hapax)
    "q_lexical_diversity",
    # round 5: areal interpolation (area-weighted zone transfer,
    # integer overlap arithmetic)
    "q_areal_interp",
    # round 5: DAU + trailing-window WAU (set-distinct explode)
    "q_rolling_active",
    # round 5: mutual information (quantized micro-nat cell terms)
    "q_mutual_info",
    # round 5: weighted PageRank (per-edge (r*w)//W integer flow)
    "q_pagerank_weighted",
    # round 5: pairwise source-vocabulary Jaccard (exact set algebra)
    "q_vocab_overlap",
    # round 5: way-segment orientation histogram (comparison-only
    # sector classification, no atan2)
    "q_way_bearings",
]


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(name, duck, entrymod):
    ray_df = _normalize(_to_df(entrymod.queries()[name](SF)))
    sql_df = _normalize(duck.sql(entrymod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (ray_df.columns, sql_df.columns)
    assert len(ray_df) == len(sql_df), (len(ray_df), len(sql_df))
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=True)


ROWS_ONLY: list = []  # round 3: every query is SQL-oracled


def test_entry_smoke(entrymod):
    ds = entrymod.entry()
    df = _to_df(ds)
    assert len(df) > 0
    assert "tile_id" in df.columns and "h3_cell" in df.columns


def test_oracle_queries_coverage(entrymod):
    """Every oracle key has a queries() entry (driver requirement)."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q
    assert set(SQL_CHECKED) == o
