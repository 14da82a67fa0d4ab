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
    # --- round 10 sample. Tier bookkeeping recomputed from the nine
    # CORRECTNESS_r0*.json files this round (ADVICE r9 #2): per-query
    # LATEST driver-green round gives tiers r2:12, r3:48, r4:48,
    # r5:47, r6:48, r7:48, r8:50, r9:50 (total 351). Three blocks:
    # (1) the ENTIRE r2-stale tier — exactly 12 rows (11 stream +
    #     tumbling_window_agg), queued post-boundary in r9
    #     (VERDICT r9 next-round #1). After this block the stalest
    #     certification tier is r3 and the rotation has lapped the
    #     registry;
    "tumbling_window_agg",
    "stream_absence_alert",
    "stream_count_window",
    "stream_cumulate_window_agg",
    "stream_cumulative_distinct",
    "stream_ewma_user_value",
    "stream_last5_sum_tws",
    "stream_late_data_side_output",
    "stream_session_window_agg",
    "stream_stateful_first_value",
    "stream_tumbling_window_agg",
    "stream_type_counts_tws",
    # (2) the 12 queries CHANGED by the r10 optimization round (every
    #     one re-verified at sf0.001 + sf0.01 in-round; the driver
    #     sample re-certifies them at sf0.01 — OPTIMIZATION_r10.md),
    #     plus dedup_embedding_cosine as the round's data-dependent
    #     tile-kernel insurance row (standing VERDICT r7 #4 rule);
    "ts_similarity_topk_sax",
    "ts_similarity_topk",
    "multimodal_jpeg_roundtrip",
    "source_protobuf_roundtrip",
    "source_protobuf_oneof_roundtrip",
    "source_avro_roundtrip",
    "stream_incremental_dedup",
    "kmeans_embeddings",
    "semdedup_embeddings",
    "profile_orders_columns",
    "dedup_cc_star_contraction",
    "stream_first_seen_tws",
    "dedup_embedding_cosine",
    # (3) re-certification backfill from the r3-stale tier (48 rows:
    #     33 non-TPC-H + 15 tpch_*). The 25 below are the head of that
    #     tier (source_avro/protobuf moved up into block 2); the
    #     remaining 9 non-TPC-H rows + all 15 tpch_* rows queue
    #     post-boundary to lead the r11 sample.
    #     12 + 13 + 25 = 50 = the driver's sample size.
    "ann_ivf_pq_topk",
    "ann_pq_adc_topk",
    "arrow_ipc_roundtrip",
    "boilerplate_passages",
    "bpe_apply_merges",
    "bpe_pair_merge_stats",
    "cms_token_counts",
    "cusum_changepoint_hourly",
    "dedup_substring_spans",
    "graph_bfs_distances",
    "graph_kcore",
    "graph_shortest_path_weighted",
    "graph_triangle_count",
    "heavy_hitters_shard_union",
    "histogram_event_values",
    "interval_coverage_users",
    "mmr_diversified_topk",
    "multimodal_image_ahash_groups",
    "ohlc_hourly_value",
    "pagerank_trade_network",
    "ppr_from_seed",
    "pq_encode_embeddings",
    "stream_interval_coverage",
    "stream_kafka_log_roundtrip",
    "stream_time_weighted_avg",
    # --- 50-prefix boundary; tail = the 9 remaining r3-stale
    # non-TPC-H rows then the 15 r3-stale tpch_* rows, queued to lead
    # the r11 sample.
    "survival_risk_table",
    "text_keywords_rake",
    "text_search_and_rank",
    "text_trigram_simpson",
    "time_weighted_avg_user",
    "tokenizer_fertility",
    "tpch_q6",
    "tpch_q9ish",
    "tpch_q18ish",
    "tpch_q2ish",
    "tpch_q4ish",
    "tpch_q7ish",
    "tpch_q8ish",
    "tpch_q10ish",
    "tpch_q12ish",
    "tpch_q14ish",
    "tpch_q15ish",
    "tpch_q17ish",
    "tpch_q19ish",
    "tpch_q21ish",
    "tpch_q22ish",
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
