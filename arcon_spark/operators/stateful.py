"""Custom stateful operators (reference Operator trait + state indexes).

The reference's core abstraction is a per-key stateful operator
(arcon/src/stream/operator/mod.rs:21-54: handle_element/handle_timeout
with typed OperatorState) backed by the five arcon_state primitives
(Value/Map/Vec/Reducer/Aggregator — SURVEY.md §1.7). The streaming
re-expression (applyInPandasWithState + state-wrapper classes + timers)
lives in arcon_spark.streaming.stateful; this module registers the
*batch-queryable* forms so the driver's DuckDB oracle can verify the
semantics.

The acceptance semantics are ported from the reference's keyby
integration test (arcon/src/test/keyby_integration.rs:68-91): enrich
every event with the first-seen value for its key — a ValueState
get-or-insert per element.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcon_spark.io import load_table
from arcon_spark.plans.compat import EVENTS_NORM
from arcon_spark.plans.registry import register


@register(
    "stateful_first_value",
    oracle=f"""
        SELECT user_id, event_id, value,
           first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_val
    FROM {EVENTS_NORM}
    """,
    tags=("stateful", "value_state", "survey2.2"),
)
def stateful_first_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map::stateful + ValueState get-or-insert (reference
    keyby_integration.rs:68-91). Batch form: first_value window function
    over the per-key event-time order. Deterministic: (ts, event_id) is a
    total order per key."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        F.first("value").over(w).alias("first_val"),
    )


@register(
    "stateful_distinct_firsts",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id,
             CAST(MIN(CAST(lpad(CAST(epoch_us(ts) AS VARCHAR), 16, '0')
                  || lpad(CAST(event_id AS VARCHAR), 12, '0')
                  || lpad(CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR), 10, '0')
                  AS HUGEINT)) % 10000000000 AS DOUBLE) / 100.0 AS first_val
      FROM {EVENTS_NORM} GROUP BY user_id
    )
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
           CAST(COUNT(DISTINCT first_val) AS BIGINT) AS n_distinct_firsts
    FROM firsts
    """,
    tags=("stateful", "survey2.3"),
)
def stateful_distinct_firsts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keyby_integration acceptance assertion (reference
    keyby_integration.rs:118-156): after stateful enrichment the number
    of distinct first-values equals the number of keys — proving state
    was correctly key-partitioned. The deterministic 'first' comes from
    MIN over the 38-digit decimal micros‖event_id‖cents packing (see
    ohlc_hourly_value: min_by's var-width buffer would demote the agg
    to SortAggregate; the fixed-width decimal keeps it HashAggregate),
    decoded back to the value from the low digits — no window sort."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    packed = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 16, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
        F.lpad(cents.cast("string"), 10, "0"),
    ).cast("decimal(38,0)")
    ten10 = F.lit(10_000_000_000).cast("decimal(38,0)")
    firsts = ev.groupBy("user_id").agg(
        ((F.min(packed) % ten10).cast("double") / F.lit(100.0)).alias("first_val")
    )
    return firsts.agg(
        F.countDistinct("user_id").alias("n_keys"),
        F.countDistinct("first_val").alias("n_distinct_firsts"),
    )


@register(
    "vec_state_collect",
    oracle="""
    SELECT user_id,
           list_sort(list(event_type)) AS event_types,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT user_id, event_type FROM events WHERE value > 50.0) t
    GROUP BY user_id
    """,
    tags=("stateful", "vec_state", "survey1.7"),
)
def vec_state_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VecState / AppenderIndex (reference arcon/src/index/appender/):
    per-key append-then-consume. Batch form: collect_list + sort for a
    deterministic order (the reference's appender preserves arrival
    order; a distributed engine must impose an explicit one)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 50.0)
    return ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list("event_type")).alias("event_types"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "map_state_topvalue",
    oracle=f"""
    SELECT user_id, event_type, max_value
    FROM (
      SELECT user_id, event_type, MAX(value) AS max_value,
             row_number() OVER (PARTITION BY user_id ORDER BY MAX(value) DESC, event_type) AS rn
      FROM {EVENTS_NORM} GROUP BY user_id, event_type) t
    WHERE rn = 1
    """,
    tags=("stateful", "map_state", "survey1.7"),
)
def map_state_topvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapState (reference arcon_state MapState / HashTable index):
    per-key map of sub-key → running max, then argmax over the map.
    Deterministic tiebreak on event_type."""
    per = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.max("value").alias("max_value"))
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("max_value"), F.asc("event_type"))
    return (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
