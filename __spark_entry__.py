"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the LLM-pipeline extensions for the DuckDB oracle
correctness gate. The registry itself lives in
``kinesis_s3_spark.operators.registry`` — operator modules register via
the @query decorator at import time.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Importing these modules populates the registry; queries() then
# re-orders entries by _GATE_FIRST below, so import order no longer
# determines driver-gate coverage.
from kinesis_s3_spark.operators.registry import ORACLES, QUERIES  # noqa: E402

_OPTIONAL_MODULES = (
    "kinesis_s3_spark.operators.dedup",
    "kinesis_s3_spark.operators.ann",
    "kinesis_s3_spark.operators.etl",
    "kinesis_s3_spark.operators.enriched",
    "kinesis_s3_spark.operators.text",
    "kinesis_s3_spark.operators.curation",
    "kinesis_s3_spark.operators.embeddings",
    "kinesis_s3_spark.operators.multimodal",
    "kinesis_s3_spark.operators.chunking",
    "kinesis_s3_spark.operators.tpch_extra",
    "kinesis_s3_spark.operators.tpch_correlated",
    "kinesis_s3_spark.operators.bpe",
    "kinesis_s3_spark.operators.search",
    "kinesis_s3_spark.operators.semdedup",
    "kinesis_s3_spark.operators.dsir",
    "kinesis_s3_spark.operators.quality_lr",
    "kinesis_s3_spark.operators.layout",
    "kinesis_s3_spark.operators.sampling",
    "kinesis_s3_spark.operators.graph",
    "kinesis_s3_spark.operators.sketches",
    "kinesis_s3_spark.operators.misc",
    "kinesis_s3_spark.operators.urls",
    "kinesis_s3_spark.operators.approx",
    "kinesis_s3_spark.operators.events",
    "kinesis_s3_spark.operators.scalar",
    "kinesis_s3_spark.operators.relational",
)
for _m in _OPTIONAL_MODULES:
    try:
        __import__(_m)
    except ImportError:
        pass

# The driver's correctness gate historically checks the FIRST ~50
# registry entries, so gate slots are scarce. Rotation policy (VERDICT
# r5 task #5): oldest-green-first. Band 0 holds queries added or
# semantically changed THIS round (never driver-gated = infinitely
# stale); after that, every registry query ordered by the round of its
# most recent green driver-gate row (ascending, name-tiebreak),
# computed from CORRECTNESS_r01..r10.json (regenerated each round).
# The r11 artifact therefore refreshes band 0 (the probe-scaled kNN
# family + the MMR determinism fixes) plus the stalest round-5 band —
# the round-4 residue was fully re-gated in r10 (VERDICT r10 next #5);
# subsequent rounds keep rotating by regenerating this list from the
# artifacts.
_GATE_FIRST = [
    # -- (0) semantically changed in round 11, must re-gate:
    #    log-scaled probe count changes the kNN join's neighbor
    #    sets and everything fed by them; MMR constant/ordering
    #    fixes change its pick sequence --
    "ann_knn_join_ivf",
    "ann_recall_knn_join",
    "ann_knn_classify",
    "graph_label_propagation",
    "graph_link_prediction",
    "ann_mmr_diversify",
    "join_market_basket",  # NEW r11, never gated
    # -- last driver-gated in round 5 --
    "curation_ccnet_buckets",
    "curation_quality_lr",
    "curation_quality_lr_scores",
    "curation_weighted_sample",
    "dedup_fuzzy_names",
    "dedup_minhash_containment",
    "dedup_recall_minhash",
    "dedup_semantic",
    "dedup_semantic_k32",
    "dedup_semantic_recall",
    "dedup_span_exact",
    "emb_pca_project",
    "emb_power_iteration",
    "etl_indexed_gzip_splits",
    "etl_scd2_merge",
    "etl_zorder_skipping",
    "events_ar1_autocorr",
    "events_asof_tolerance",
    "events_cusum_alarm",
    "events_drift_chi2",
    "events_drift_psi",
    "events_mad_outliers",
    "events_session_window",
    "graph_pagerank",
    "graph_triangles",
    "mm_audio_decode_file",
    "mm_binary_files_meta",
    "mm_image_decode_file",
    "mm_image_resize_real",
    "mm_video_frame_sample",
    "search_hybrid_rrf",
    "sketch_ams_f2",
    "sketch_bloom_contamination",
    "sketch_heavy_hitters",
    "sketch_kmv_distinct",
    "sketch_kmv_union",
    "text_bm25_search",
    "text_bpe_fertility",
    "text_bpe_train_k64",
    "text_inverted_index",
    # -- last driver-gated in round 6 --
    "agg_bitmap_distinct",
    "agg_conditional_pivot",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_having",
    "agg_percentiles",
    "agg_rollup",
    "agg_skew_salted",
    "agg_stats_suite",
    "ann_matryoshka_recall",
    "ann_mips_topk",
    "etl_bad_row_envelope",
    "etl_base_filename",
    "etl_batch_meta",
    "etl_buffer_flush",
    "etl_compaction_bins",
    "etl_dynamic_path",
    "etl_incremental_agg_merge",
    "etl_raw_roundtrip",
    "etl_row_type_partition",
    "events_asof_join",
    "events_asof_nearest",
    "events_hourly_active",
    "events_markov_stationary",
    "events_pit_features",
    "events_recursive_sessions",
    "events_sessionize",
    "events_sliding_window",
    "events_streak_runs",
    "events_tumbling_window",
    "fn_array_suite",
    "fn_conditional_suite",
    "fn_date_suite",
    "fn_json_suite",
    "fn_lambda_suite",
    "fn_math_suite",
    "fn_try_suite",
    "join_interval_overlap",
    "join_lateral_topn",
    "mm_audio_fingerprint",
    "mm_image_dhash_dedup",
    "sketch_hll_estimate",
    "sketch_hll_registers",
    "sketch_hll_sliding",
    "sketch_kmv_intersection",
    "text_gopher_rules",
    # -- last driver-gated in round 7 --
    "ann_hard_negatives",
    "ann_mips_ivf_topk",
    "ann_recall_mips_ivf",
    "curation_decontaminate",
    "curation_dedup_pipeline",
    "curation_dedup_survivorship",
    "curation_epoch_shuffle_write",
    "curation_quality_lr_calibration",
    "curation_split_leakage",
    "dedup_cluster_resolve",
    "emb_prototype_prune",
    "events_funnel_conversion_time",
    "events_peak_detection",
    "events_resample_ffill",
    "events_rollup_cascade",
    "events_seasonal_decompose",
    "fn_string_suite",
    "join_anti",
    "join_argmin_supplier",
    "join_broadcast_dims",
    "join_outer_counts",
    "join_range_bands",
    "join_self_correlation",
    "join_semi",
    "mm_video_shot_boundary",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "reshape_pivot",
    "setop_except",
    "setop_intersect",
    "setop_union_distinct",
    "sort_multi_key",
    "sort_topk_global",
    "subquery_in",
    "subquery_scalar_agg",
    "text_learnability",
    "text_ngram_novelty",
    "window_lag_lead",
    "window_ntile_moving",
    "window_running_total",
    # -- last driver-gated in round 8 --
    "agg_argminmax",
    "agg_listagg",
    "agg_mode_per_user",
    "agg_regression",
    "ann_ivf_topk",
    "ann_lsh_bucketed",
    "ann_recall_ivf",
    "ann_recall_lsh",
    "approx_error_bounds",
    "curation_hash_split",
    "curation_length_histogram",
    "curation_mixture_temperature",
    "curation_pack_sequences",
    "curation_pipeline_funnel",
    "curation_source_report",
    "curation_stratified_sample",
    "curation_token_budget_sample",
    "curation_url_dedup",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "dedup_recall_embedding_lsh",
    "dedup_semantic_hier",
    "emb_kmeans",
    "emb_label_centroids",
    "emb_normalize_quantize",
    "events_ewma",
    "events_funnel_steps",
    "events_retention_cohorts",
    "events_transition_matrix",
    "events_zscore_anomaly",
    "fn_bitwise_suite",
    "fn_struct_suite",
    "join_skew_salted",
    "q11_important_parts",
    "q13_order_distribution",
    "q16_supplier_part_counts",
    "q20_part_promotion",
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "text_phrase_search",
    "window_topk_per_group",
    # -- last driver-gated in round 9 --
    "ann_bruteforce_topk",
    "ann_ivf_kmeans_topk",
    "ann_multi_query_topk",
    "ann_recall_ivf_kmeans",
    "curation_dsir_weights",
    "curation_epoch_shuffle",
    "curation_quality_lr_auc",
    "dedup_contamination",
    "dedup_embedding_lsh_strict",
    "dedup_exact",
    "dedup_exact_normalized",
    "dedup_minhash_lsh",
    "dedup_ngram_coverage",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_source_overlap",
    "diag_key_skew",
    "emb_kcenter_batched",
    "emb_kcenter_coreset",
    "etl_snapshot_diff",
    "events_ab_test",
    "events_attribution",
    "events_cohort_ltv",
    "events_dau_mau_stickiness",
    "events_drift_ks",
    "events_ohlc_bars",
    "events_seasonal_naive_mape",
    "events_session_paths",
    "q8_market_share",
    "q9_product_profit",
    "sketch_countmin_estimate",
    "sketch_quantile_histogram",
    "text_bigram_surprisal",
    "text_gopher_repetition",
    "text_pii_mask",
    "text_rake_keywords",
    "text_tfidf_simjoin",
    "text_tfidf_topk",
    "text_unigram_surprisal",
    "text_vocabulary",
    "text_zipf_fit",
    "window_first_last_nth",
    "window_rank_dense",
    # -- last driver-gated in round 10 --
    "agg_weighted_median",
    "ann_pq_topk",
    "ann_recall_pq",
    "approx_distinct_users",
    "approx_percentile_price",
    "emb_drift_mmd",
    "emb_outlier_report",
    "etl_bad_row_archive",
    "etl_bad_row_roundtrip",
    "etl_buffer_flush_bytes",
    "etl_cdc_merge",
    "etl_enriched_parse",
    "events_rfm_segments",
    "fn_map_suite",
    "fn_regex_suite",
    "fn_url_suite",
    "mm_audio_decode_real",
    "mm_binary_meta",
    "mm_frame_offsets",
    "mm_image_decode_real",
    "mm_image_decode_stub",
    "q10_returned_items",
    "q12_priority_shipping",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive_join",
    "q22_global_balance",
    "q4_order_priority",
    "reshape_unpivot",
    "setop_intersect_all",
    "sketch_countmin",
    "text_bpe_tokenize",
    "text_bpe_train",
    "text_chunking",
    "text_fingerprint",
    "text_langid",
    "text_ngram_top",
    "text_quality",
    "text_token_bpe_regex",
    "text_token_stats",
    "window_distribution",
    "window_range_frame",
]



def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _GATE_FIRST if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
_SHIPPED: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make ``kinesis_s3_spark`` importable on Python workers no matter
    what cwd the driver process runs from.

    Module-level Pandas UDFs (ann.py, multimodal/codecs.py) are
    cloudpickled BY REFERENCE, so the worker re-imports the package;
    workers only inherit the repo on sys.path when the driver happens
    to run from /root/repo. The cluster-correct fix is the same thing
    spark-submit --py-files does: ship a zip of the package once per
    SparkContext via addPyFile (workers prepend it to sys.path at task
    launch). Idempotent and cheap (~100 kB zip, built once)."""
    sc = spark.sparkContext
    if id(sc) in _SHIPPED:
        return
    import tempfile
    import zipfile

    zpath = os.path.join(tempfile.gettempdir(), "kinesis_s3_spark_pyfiles.zip")
    pkg = os.path.join(_REPO_DIR, "kinesis_s3_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, _REPO_DIR))
    sc.addPyFile(zpath)
    _SHIPPED.add(id(sc))


def _shipped(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return wrapper


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    _ship_package(spark)
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: _shipped(v) for k, v in _ordered(QUERIES).items()}


def oracle_sql() -> dict[str, str]:
    return _ordered(ORACLES)
