"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the arcon_spark package (arcon_spark/plans/registry
collects them from operators/, functions/, streaming/); this module is
a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file by path from another cwd; make the
# arcon_spark package resolvable regardless
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing
    summary (scan-heavy aggregate, whole-stage codegen end to end)."""
    from arcon_spark.operators.relational import tpch_q1

    return tpch_q1(spark, "/root/testdata/sf0.001")


# iteration-order priority for the driver's correctness sample: the
# high-value window / streaming / dedup / connector queries lead, so a
# prefix sample of queries() exercises the paths that matter most;
# everything else follows in registration order. Names not in the
# registry are ignored (robust to renames).
_SAMPLE_FIRST = [
    # --- round 6 sample: the 2 new queries lead, then 48 rows the
    # driver has NEVER checked in rounds 1-5 (list = registry order
    # minus the 240 in CORRECTNESS_r01-r05) — 50/50 first-time rows.
    # r6 new: protobuf oneof (tagged-union) roundtrip + the IVF
    # branch-and-bound bitext miner (lossless prune, shared oracle)
    "source_protobuf_oneof_roundtrip",
    "bitext_margin_mining_ivf",
    "text_mojibake_repair",
    # multimodal suite (from-spec codecs behind Arrow-batched plumbing)
    "multimodal_meta",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_audio_energy",
    "multimodal_image_histogram",
    "multimodal_scene_cuts",
    "multimodal_audio_vad",
    "multimodal_jpeg_roundtrip",
    # python-datasource pair
    "pyds_collection_agg",
    "stream_pyds_collection",
    # streaming remainder (tapes; slower rows, deliberately mixed in
    # now so latent shape issues surface with rounds left to fix)
    "stream_sliding_window_agg",
    "stream_static_enrich",
    "stream_distinct_pairs",
    "stream_stream_left_outer_join",
    "stream_stream_left_semi_join",
    "stream_session_window_dynamic_gap",
    "stream_dedup_within_watermark",
    "stream_running_counts_update_mode",
    # batch analytics / SQL-shape remainder, registry order
    "transition_matrix_events",
    "rfm_customer_segments",
    "hll_distinct_users",
    "sql_recursive_reach",
    "variant_json_extract",
    "quantile_histogram_sketch",
    "reservoir_sample_per_type",
    "range_frame_trailing_sum",
    "sql_pipe_syntax",
    "session_top_paths",
    "sample_estimate_audit",
    "scalar_subquery_above_avg",
    "min_per_group_joinback",
    "salted_hot_key_agg",
    "time_rollup_hierarchy",
    "salted_skew_join",
    "funnel_conversion",
    "retention_cohorts",
    "cep_purchase_error_pattern",
    "rolling_median_value",
    "sax_symbolize_hourly",
    "debounce_events",
    "market_basket_lift",
    "cohort_ltv_weekly",
    "decayed_topk_parts",
    "gini_best_split_totalprice",
    "target_encode_nation",
    "ab_test_purchase_value",
    "theil_sen_hourly_trend",
    "benford_first_digit_audit",
    # --- 50-prefix boundary; tail = ALL 59 queries that will still be
    # never-driver-checked after r6 (registry order), so the r7 rotation
    # is mechanical: move the next 50 of these above the boundary.
    "hhi_revenue_concentration",
    "pandas_udaf_trimmed_mean",
    "exact_median_selection",
    "distribution_drift_chi2",
    "diff_in_diff_events",
    "ts_similarity_topk",
    "stl_decompose_hourly",
    "stl_residual_anomalies",
    "revenue_bridge_analysis",
    "gap_fill_forward_hourly",
    "pareto_frontier_orders",
    "mode_event_type_per_user",
    "pattern_view_view_purchase",
    "ewma_user_value",
    "seasonal_hourly_baseline",
    "acf_hourly_value",
    "ols_trend_hourly_value",
    "wow_growth_event_revenue",
    "tpch_q16ish",
    "tpch_q20ish",
    "pii_redact_stats",
    "gopher_quality_flags",
    "decontam_ngram_overlap",
    "mad_outlier_events",
    "domain_mixture_weights",
    "bloom_split_probe",
    "k_anonymity_audit",
    "bloom_split_membership",
    "stratified_split",
    "text_repetition_ratio",
    "weighted_sample_docs",
    "corpus_shuffle_rank",
    "vocab_top_bigrams",
    "lang_id_confusion",
    "sample_k_per_source",
    "text_cdc_chunks",
    "text_bigram_assoc_score",
    "text_sentiment_lexicon",
    "user_activity_similarity",
    "embedding_centroid_drift",
    "stream_ohlc_hourly",
    "stream_mad_anomaly",
    "stream_appender_topk_window",
    "stream_funnel_conversion",
    "stream_rolling_median",
    "stream_kmv_distinct",
    "stream_debounce",
    "stream_stream_full_outer_join",
    "stream_stream_right_outer_join",
    "stream_cdc_upsert",
    "stream_temporal_dim_join",
    "stream_quantile_histogram",
    "stream_gap_fill_locf",
    "stream_scd2_history",
    "stream_bitmap_distinct",
    "stream_windowed_distinct",
    "stream_table_checksum",
    "stream_distribution_drift",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    beyond-reference dedup/similarity/text/multimodal suites), with the
    high-value queries first in iteration order (driver samples a
    prefix)."""
    from arcon_spark.plans.registry import queries as _queries

    qmap = _queries()
    ordered = {n: qmap[n] for n in _SAMPLE_FIRST if n in qmap}
    ordered.update(qmap)
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query; keys
    absent here (vs queries()) are approximate/engine-specific ops the
    driver checks rows-only."""
    from arcon_spark.plans.registry import oracle_sql as _oracle_sql

    return _oracle_sql()
