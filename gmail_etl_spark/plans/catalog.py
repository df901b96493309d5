"""Central query catalog: every operator from SURVEY.md §2 as a named,
oracle-checked query.

Each entry pairs a PySpark DataFrame builder with (where SQL-expressible)
an equivalent DuckDB SQL oracle over the same parquet tables.  The
driver's correctness gate and the local pytest oracle suite both consume
this registry; ``__spark_entry__.py`` re-exports it.

Hash-match discipline (the driver compares sorted-by-name columns and
value hashes):

* every computed column is aliased identically in Spark and SQL;
* double aggregations over money columns go through exact
  ``DECIMAL(18,2)`` sums then cast back to double, so the result is
  independent of accumulation order on both engines;
* result sets are made deterministic (stable ORDER BY with full
  tie-breaks wherever a LIMIT exists).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Columns stored as parquet TIMESTAMP(NANOS).  How Spark surfaces them
#: depends on version: older releases expose epoch-nanosecond longs
#: (under ``legacy.parquet.nanosAsLong``), current releases truncate to
#: microseconds and expose TIMESTAMP_NTZ.  ``normalize_nano_ts`` keys on
#: the dtype actually seen so both forms land on the same session-UTC
#: TIMESTAMP, matching DuckDB's µs cast of the same column.
_NANO_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def normalize_nano_ts(df: DataFrame, col: str) -> DataFrame:
    """Normalize a parquet TIMESTAMP(NANOS) column to TIMESTAMP (LTZ).

    Long epoch-nanos → floor to µs (identical to the NTZ read's own
    truncation); TIMESTAMP_NTZ → reinterpret wall time in the session
    zone (UTC for every catalog query), i.e. the same instants."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        # floor division, not `div` (which truncates toward zero): for
        # pre-epoch (negative) nanos the NTZ read path floors, and the
        # two read paths must land on the same microsecond.  pmod is
        # non-negative, so subtracting it yields the floor multiple —
        # all-integer arithmetic (no double round-trip at 1e18).
        return df.withColumn(
            col,
            F.timestamp_micros(
                F.expr(f"(`{col}` - pmod(`{col}`, 1000)) div 1000")
            ),
        )
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan; Catalyst prunes columns + pushes filters."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLUMNS.get(name, ()):
        df = normalize_nano_ts(df, col)
    return df


@dataclass
class CatalogQuery:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    #: DuckDB SQL producing the identical result, or None → rows-only check
    oracle: str | None
    #: SURVEY §2 rows this query exercises (e.g. "P3,F1")
    survey: str = ""
    #: include in bench.py's headline set
    headline: bool = False
    tags: tuple[str, ...] = field(default_factory=tuple)
    #: REQUIRED when ``oracle is None``: why no exact SQL oracle exists
    #: and which local gate covers the query instead.  Surfaced through
    #: ``__spark_entry__.rows_only_reasons()`` so a driver ``no_oracle``
    #: row is self-explaining without COVERAGE.md in hand.
    rows_only_reason: str | None = None


CATALOG: dict[str, CatalogQuery] = {}


#: Semantic configs every catalog query depends on.  All are
#: runtime-settable, so they are applied defensively to whatever session
#: the caller provides (the driver harness builds its own SparkSession
#: without gmail_etl_spark.session's config): LAST_WIN reproduces the
#: reference's last-wins header loop (P2), UTC pins epoch casts and
#: date formatting, nanosAsLong makes events.parquet readable.
_SEMANTIC_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_semantic_conf(spark: SparkSession) -> None:
    for k, v in _SEMANTIC_CONF.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)


def query(
    name: str,
    oracle: str | None,
    survey: str = "",
    headline: bool = False,
    tags: tuple[str, ...] = (),
    rows_only_reason: str | None = None,
):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_semantic_conf(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        CATALOG[name] = CatalogQuery(
            name=name,
            builder=wrapped,
            oracle=oracle,
            survey=survey,
            headline=headline,
            tags=tags,
            rows_only_reason=rows_only_reason,
        )
        return fn

    return deco


def rows_only_reason_map() -> dict[str, str]:
    """name -> rationale for every catalog query without a SQL oracle."""
    _ensure_loaded()
    return {
        name: cq.rows_only_reason
        for name, cq in CATALOG.items()
        if cq.oracle is None and cq.rows_only_reason
    }


#: Deliberate sweep order for the driver's correctness harness, which
#: verifies queries in ``queries()`` iteration order under a ~50-query
#: budget.  Policy: never-driver-tested entries first, then the rows the
#: driver has not re-checked for the longest time — so evidence coverage
#: grows every round and stale rows rotate back into the budget.
#: Round-12 order (every oracled query driver-green at least once):
#: stalest-first rotation — rows last verified in round 6 lead, then
#: rounds 7-11 (the r11 sample re-greened the r5 backlog with zero
#: overlap vs r10).  The 6 rows-only queries (oracle=None) go LAST: a
#: driver visit can only ever record ``err: no_oracle`` for them (their
#: evidence is the local tolerance/recall gates), so spending any of
#: the ~50-row budget on them is pure waste — r6 burned 2 samples on
#: q83/q84 this way.  Generated from CORRECTNESS_r{01..11}.json by
#: tools/gen_sweep_priority.py.
_SWEEP_PRIORITY: tuple[str, ...] = (
    # -- (7) last verified round 6 (3) --
    "q230_best_stump_threshold", "q231_sorted_group_concat",
    "q245_levenshtein_linkage",
    # -- (8) last verified round 7 (50) --
    "q103_grouping_sets", "q108_small_qty_revenue",
    "q109_dormant_customers", "q20_string_kernels", "q21_regex_sanitize",
    "q22_base64_roundtrip", "q23_date_kernels", "q24_json_extract",
    "q25_header_pivot", "q27_array_hof", "q28_regexp_extract",
    "q31_token_stats", "q32_token_freq", "q33_quality_score",
    "q34_fingerprint", "q35_langid_features", "q36_token_count_bpe",
    "q37_rolling_hash", "q38_levenshtein", "q93_tfidf_top_terms",
    "q55_quality_filter_rules", "q69_approx_top_tokens",
    "q71_chunk_documents", "q98_repetition_score",
    "q103_winnow_fingerprint", "q102_token_edit_pairs",
    "q105_unigram_lm_nll", "q112_tfidf_cosine_pairs", "q40_dedup_exact",
    "q41_dedup_canonical_rows", "q42_ledger_anti_join",
    "q43_jaccard_pairs", "q47_near_dup_clusters", "q48_near_dedup",
    "q74_source_overlap", "q104_winnow_near_dup_pairs",
    "q113_incremental_near_dup", "q50_knn_exact", "q51_knn_ivf",
    "q53_knn_vectorized", "q46_embedding_near_dup", "q52_label_centroids",
    "q60_tumbling_window", "q61_sliding_window", "q62_session_window",
    "q63_first_event_per_key", "q67_event_funnel", "q73_value_outliers",
    "q111_event_transitions", "q255_stream_stream_join",
    # -- (9) last verified round 8 (50) --
    "q120_volume_shipping", "q121_market_share", "q122_supplier_profit",
    "q123_part_supplier_counts", "q124_custdist",
    "q126_priority_linestatus", "q127_disjunctive_revenue",
    "q128_dominant_suppliers", "q129_waiting_suppliers",
    "q130_min_cost_supplier", "q131_important_parts",
    "q158_zorder_layout", "q179_join_key_skew_audit",
    "q87_grouped_agg_udaf", "q88_grouped_map_sequence", "q30_lang_stats",
    "q39_langid_classify", "q101_encode_tokens", "q116_pii_redact",
    "q117_url_domains", "q118_boilerplate_lines",
    "q125_quality_classifier", "q153_source_token_entropy",
    "q133_repeated_ngram_spans", "q139_remove_dup_spans", "q156_pagerank",
    "q157_jaccard_prefix_join", "q119_int8_quantize",
    "q135_jl_projection", "q256_persisted_ivf_topk",
    "q68_winsorized_stats", "q79_arrow_histogram", "q114_mad_outliers",
    "q138_salted_skew_join", "q147_two_phase_agg", "q70_gmail_stage1",
    "q26_multimodal_features", "q29_frame_sample", "q106_media_resize",
    "q115_audio_features", "q142_image_dhash",
    "q143_image_near_dup_pairs", "q144_audio_fingerprint",
    "q94_hash_split", "q95_per_class_cap", "q97_contamination",
    "q107_source_mixing_weights", "q64_asof_join", "q65_range_join",
    "q66_time_rollup",
    # -- (10) last verified round 9 (50) --
    "q84_approx_percentile", "q185_ansi_sql_parity",
    "q257_string_key_global_rank", "q140_profile_columns",
    "q134_bpe_merge_candidates", "q137_domain_quality_rollup",
    "q145_feature_hashing", "q160_langid_confusion",
    "q161_normalize_text", "q164_token_pmi", "q173_chat_template_render",
    "q178_heavy_hitter_shingles", "q184_bigram_lm_nll",
    "q186_udtf_chunk_spans", "q188_jaro_winkler_linkage",
    "q193_rule_ablation", "q44_minhash_lsh", "q45_simhash",
    "q154_dup_graph_triangles", "q163_dedup_keep_best",
    "q168_cluster_size_histogram", "q174_corpus_diff",
    "q175_novelty_curve", "q177_theta_source_overlap", "q181_kcore_peel",
    "q259_streaming_near_dup_index", "q54_hyperplane_lsh",
    "q75_kmeans_cells", "q110_semantic_dedup", "q150_matryoshka_truncate",
    "q162_embedding_outliers", "q192_hard_negatives",
    "q155_event_trigrams", "q165_late_data_audit",
    "q166_recency_decay_scores", "q167_ab_proportion_test",
    "q169_hll_sketch_rollup", "q170_daily_value_deltas",
    "q171_slo_percentile_bands", "q176_kll_quantile_rollup",
    "q180_incremental_agg_merge", "q182_gap_fill_locf",
    "q183_cms_probe_counts", "q187_daily_value_drift",
    "q189_session_association_rules", "q191_hll_cube_users",
    "q149_multimodal_assembly", "q72_pack_sequences",
    "q141_shard_assignment", "q258_composed_curation",
    # -- (11) last verified round 10 (50) --
    "q194_bm25_scores", "q195_rrf_hybrid", "q247_threshold_sensitivity",
    "q196_retrieval_ndcg", "q148_curation_funnel",
    "q151_curriculum_deciles", "q152_token_budget_selection",
    "q159_weighted_sample", "q172_erasure_impact",
    "q197_funnel_conversion", "q198_cohort_retention",
    "q199_scd2_state_history", "q200_merge_upsert",
    "q215_recursive_reachability", "q219_session_funnel",
    "q226_spatial_bucket_join", "q227_time_to_convert",
    "q234_activity_heatmap", "q235_negative_edge_samples",
    "q236_calibration_bins", "q237_point_in_time_lookup",
    "q238_activity_islands", "q241_validation_quarantine",
    "q242_bounded_conversion", "q251_rfm_segmentation",
    "q252_burstiness_audit", "q201_acf_daily_counts",
    "q202_cusum_changepoint", "q203_moment_shape_stats",
    "q204_k_anonymity_audit", "q205_distribution_drift",
    "q206_gini_concentration", "q207_benford_audit",
    "q208_ewma_smoothing", "q212_ks_drift_test", "q213_mann_whitney_u",
    "q214_churn_hazard", "q220_pareto_frontier",
    "q221_daily_anomaly_flags", "q222_sampled_sum_estimate",
    "q223_exact_order_statistics", "q224_walk_forward_forecast",
    "q225_bollinger_breakouts", "q232_weighted_median",
    "q233_dedup_savings", "q239_cuped_adjustment",
    "q240_quantile_treatment_effect", "q243_power_analysis",
    "q244_simpson_check", "q246_median_confidence_interval",
    # -- (12) last verified round 11 (50) --
    "q01_pricing_summary", "q02_top_orders", "q03_region_revenue",
    "q04_priority_semi_join", "q05_customers_without_orders",
    "q06_order_size_histogram", "q07_top_orders_per_customer",
    "q08_running_customer_spend", "q09_top_lineitems",
    "q10_distinct_flags", "q11_intersect_custkeys", "q12_except_custkeys",
    "q13_rollup_flags", "q14_conditional_agg", "q15_segment_stats",
    "q16_extract_batch", "q17_cube_status_priority", "q18_pivot_status",
    "q19_quantity_percentiles", "q80_window_lag_lead",
    "q81_window_range_frame", "q82_window_distribution",
    "q85_scalar_subquery", "q86_correlated_subquery",
    "q89_full_outer_join", "q90_cross_join_grid", "q91_min_by_max_by",
    "q56_shipping_priority", "q57_forecast_revenue", "q58_returned_items",
    "q76_large_orders", "q78_window_navigation",
    "q77_promo_revenue_share", "q92_cohort_retention", "q99_top_supplier",
    "q100_monthly_revenue_dense", "q104_nation_revenue_share",
    "q248_wilson_error_rates", "q249_source_concentration",
    "q250_sequential_monitoring", "q253_dow_adjusted_anomalies",
    "q254_peak_concurrency", "q209_quantile_normalize",
    "q210_nb_token_likelihoods", "q211_chi2_feature_selection",
    "q216_window_distribution_suite", "q217_unpivot_round_trip",
    "q218_roc_auc", "q228_activity_bitmask_streaks",
    "q229_capped_running_balance",
    # -- (last) rows-only by design (6) — a driver visit yields only err:no_oracle; never spend budget here --
    "q83_approx_count_distinct", "q146_compression_ratio",
    "q132_pq_adc_topk", "q136_ivf_pq_topk", "q190_pca_project",
    "q96_stratified_sample",
)


def _sweep_order() -> list[str]:
    listed = [n for n in _SWEEP_PRIORITY if n in CATALOG]
    rest = [n for n in CATALOG if n not in _SWEEP_PRIORITY]
    return listed + rest


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: CATALOG[name].builder for name in _sweep_order()}


def oracle_map() -> dict[str, str]:
    _ensure_loaded()
    return {
        name: CATALOG[name].oracle
        for name in _sweep_order()
        if CATALOG[name].oracle is not None
    }


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers catalog entries."""
    global _LOADED
    if _LOADED:
        return
    # Imported for registration side effects.
    from gmail_etl_spark.plans import relational, scalar_queries, text_queries  # noqa: F401
    from gmail_etl_spark.plans import dedup_queries, similarity_queries, event_queries  # noqa: F401
    from gmail_etl_spark.plans import gmail_queries, multimodal_queries  # noqa: F401
    from gmail_etl_spark.plans import sampling_queries, temporal_queries  # noqa: F401
    from gmail_etl_spark.plans import warehouse_queries  # noqa: F401
    from gmail_etl_spark.plans import stats_queries  # noqa: F401
    from gmail_etl_spark.plans import feature_queries  # noqa: F401

    _LOADED = True
