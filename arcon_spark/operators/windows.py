"""Event-time windows — batch-queryable forms with DuckDB oracles.

The reference's WindowAssigner (arcon/src/stream/operator/window/
assigner.rs:61-229) supports per-key tumbling and sliding event-time
windows with a late-arrival grace; its three window indexes map to
aggregation styles (SURVEY.md §2.4):

- IncrementalWindow (incremental.rs)  → built-in aggs (sum/count/...)
- AppenderWindow    (appender.rs)     → collect_list / holistic aggs
- ArrowWindow       (arrow.rs)        → applyInPandas per window group

Here the same window semantics are expressed as batch queries over the
`events` table (so the driver can oracle-check them); the *streaming*
forms (withWatermark + F.window, late-data drop) live in
arcon_spark.streaming and are exercised by tests/test_streaming.py
replaying the reference's assigner.rs scenario tapes.

Window-start arithmetic: Spark's F.window and DuckDB's time_bucket both
align tumbling windows to the 1970-01-01 epoch, so starts agree exactly.

Scale: groupBy(window, key) is a single hash shuffle on (window, key);
partial aggregation runs map-side. Sliding windows fan each row into
length/slide groups *after* the scan (explode of a small generated
array), which is the standard Spark plan and shuffles k× rows — for
k > ~8 prefer tumbling pre-aggregation then window merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcon_spark.io import load_table, pin_groups
from arcon_spark.plans.compat import EVENTS_NORM, msum, sql_msum
from arcon_spark.plans.registry import register


@register(
    "tumbling_window_agg",
    oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_msum('value', 2)} AS sum_value
    FROM {EVENTS_NORM} GROUP BY 1, 2
    """,
    tags=("window", "tumbling", "survey2.4"),
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window (reference assigner.rs Assigner::
    Tumbling) + IncrementalWindow-style built-in aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").start.alias("win_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), msum(F.col("value"), 2).alias("sum_value"))
    )


@register(
    "sliding_window_agg",
    oracle=f"""
        SELECT time_bucket(INTERVAL '15 minutes', ts) - (o.j * INTERVAL '15 minutes') AS win_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_msum('value', 2)} AS sum_value
    FROM {EVENTS_NORM}, UNNEST([0, 1]) AS o(j)
    GROUP BY 1
    """,
    tags=("window", "sliding", "survey2.4"),
)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window, length 30 min / slide 15 min (reference
    assigner.rs Assigner::Sliding, which asserts length % slide == 0 —
    F.window enforces nothing, but we keep the contract). Each event
    belongs to exactly 2 windows; the oracle reproduces the fan-out with
    a 2-element UNNEST."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes", "15 minutes").start.alias("win_start"))
        .agg(F.count(F.lit(1)).alias("n"), msum(F.col("value"), 2).alias("sum_value"))
    )


@register(
    "cumulate_window_agg",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           time_bucket(INTERVAL '1 hour', ts) + o.j * INTERVAL '15 minutes' AS win_end,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_msum('value', 2)} AS sum_value
    FROM {EVENTS_NORM}, UNNEST([1, 2, 3, 4]) AS o(j)
    WHERE ts < time_bucket(INTERVAL '1 hour', ts) + o.j * INTERVAL '15 minutes'
    GROUP BY 1, 2
    """,
    tags=("window", "cumulate", "survey2.4"),
)
def cumulate_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATE windows (Flink's third windowing TVF, absent from both
    Spark and the reference's Assigner::{Tumbling,Sliding},
    assigner.rs:61-229): within each 1-hour period, growing windows
    [H, H+15m), [H, H+30m), [H, H+45m), [H, H+60m) — early partial
    results of the eventual tumbling total, the standard "dashboard
    counts that fill in over the hour" shape.

    Implementation: each event fans out ONLY to the windows that
    contain it — j = floor(offset/15min)+1 .. 4 via sequence+explode,
    so fan-out is exact (≤4, average 2.5) with no post-filter, and the
    aggregate is one hash agg on (win_start, win_end). The oracle does
    the naive fan-out-then-filter; both collapse to the same groups.
    At 100 TB the pre-aggregation fan-out is the cost — it stays
    proportional to events × avg windows, all map-side before the one
    exchange."""
    ev = load_table(spark, sf_dir, "events").select("ts", "value")
    with_h = ev.select(
        "ts",
        "value",
        F.date_trunc("hour", F.col("ts")).alias("win_start"),
    ).withColumn(
        "j",
        F.explode(
            F.expr(
                "sequence(cast((unix_micros(ts) - unix_micros(win_start)) div 900000000 + 1 as int), 4)"
            )
        ),
    )
    return (
        with_h.withColumn(
            "win_end", F.expr("win_start + make_interval(0, 0, 0, 0, 0, 15 * j, 0)")
        )
        .groupBy("win_start", "win_end")
        .agg(F.count(F.lit(1)).alias("n"), msum(F.col("value"), 2).alias("sum_value"))
    )


@register(
    "session_window_agg",
    oracle=f"""
    WITH     flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       < INTERVAL '30 minutes'
                  THEN 0 ELSE 1 END AS new_session
      FROM {EVENTS_NORM}
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_msum('value', 2)} AS sum_value
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("window", "session", "survey2.4"),
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30-min gap — *absent* in the reference
    (assigner.rs supports only tumbling/sliding; SURVEY §2.4 'Not
    implemented'), native in Spark as session_window(). The oracle
    reproduces gap-merge semantics with lag + cumulative session ids.
    Spark merges events with gap < 30 min (half-open [start, start+gap)),
    hence the strict '<' in the oracle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), msum(F.col("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n",
            "sum_value",
        )
    )


@register(
    "appender_window_median",
    oracle=f"""
        SELECT time_bucket(INTERVAL '6 hours', ts) AS win_start,
           event_type,
           round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS median_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM {EVENTS_NORM} GROUP BY 1, 2
    """,
    tags=("window", "appender", "survey2.4"),
)
def appender_window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AppenderWindow (reference arcon/src/index/window/appender.rs):
    buffer the raw window contents, apply a holistic materializer over
    the buffer — here a median, which cannot be folded incrementally.
    Spark: exact percentile agg (internally buffers per group, the same
    thing the reference's VecState does, but spillable)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.window("ts", "6 hours").start.alias("win_start"), "event_type"
    ).agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("median_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "arrow_window_zscore",
    oracle=f"""
    WITH     stats AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS win_start, event_id, value,
             CAST(COUNT(*) OVER (PARTITION BY time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT))
                  OVER (PARTITION BY time_bucket(INTERVAL '1 day', ts)) AS DOUBLE) / 100.0 AS s
      FROM {EVENTS_NORM}
    )
    SELECT win_start, event_id, round(value - s / n, 4) AS centered
    FROM stats
    """,
    tags=("window", "arrow", "survey2.4"),
)
def arrow_window_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrowWindow (reference arcon/src/index/window/arrow.rs): hand the
    whole window to a columnar UDF. Idiomatic Spark = applyInPandas per
    window group; HERE expressed with window functions instead (same
    result, JVM-only, no Python) — centering each event on its window
    mean. The applyInPandas form is exercised in tests/test_stateful.py;
    at scale the built-in-function form wins and is what we register."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 day").start.alias("win_start")
    from pyspark.sql import Window as W

    byw = W.partitionBy("win_start")
    base = ev.select(win, "event_id", "value")
    return base.select(
        "win_start",
        "event_id",
        F.round(
            F.col("value")
            - (F.sum(F.round(F.col("value") * 100).cast("long")).over(byw).cast("double") / 100.0)
            / F.count(F.lit(1)).over(byw).cast("double"),
            4,
        ).alias("centered"),
    )


@register(
    "arrow_window_zscore_pandas",
    oracle=f"""
    WITH stats AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS win_start, event_id, value,
             CAST(COUNT(*) OVER (PARTITION BY time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT))
                  OVER (PARTITION BY time_bucket(INTERVAL '1 day', ts)) AS DOUBLE) / 100.0 AS s
      FROM {EVENTS_NORM}
    )
    SELECT win_start, event_id, round(value - s / n, 4) AS centered
    FROM stats
    """,
    tags=("window", "arrow", "pandas", "survey2.4"),
)
def arrow_window_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrowWindow via the literal mechanism the reference uses
    (arcon/src/index/window/arrow.rs: hand the whole window's record
    batches to a UDF): groupBy(window) → applyInPandas, the window's
    rows arriving as one pandas DataFrame. Arithmetic mirrors the JVM
    form (arrow_window_zscore) exactly — integer-cents mean, one
    rounded subtraction — so the same oracle verifies both paths.
    Scale note: the JVM window-function form avoids the Python hop and
    is the default; this path exists for window logic that genuinely
    needs numpy/pandas."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.window("ts", "1 day").start.alias("win_start"), "event_id", "value"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        cents = np.trunc(v * 100.0 + np.copysign(0.5, v * 100.0)).astype(np.int64)
        mean = (float(cents.sum()) / 100.0) / float(len(v))
        centered = v - mean
        # round-half-up at 4 decimals, matching Spark/DuckDB round()
        scaled = centered * 10000.0
        out = pdf[["win_start", "event_id"]].copy()
        out["centered"] = np.trunc(scaled + np.copysign(0.5, scaled)) / 10000.0
        return out

    return pin_groups(base, "win_start").groupBy("win_start").applyInPandas(
        center, "win_start timestamp, event_id long, centered double"
    )


@register(
    "arrow_window_zscore_arrow",
    oracle=f"""
    WITH stats AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS win_start, event_id, value,
             CAST(COUNT(*) OVER (PARTITION BY time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT))
                  OVER (PARTITION BY time_bucket(INTERVAL '1 day', ts)) AS DOUBLE) / 100.0 AS s
      FROM {EVENTS_NORM}
    )
    SELECT win_start, event_id, round(value - s / n, 4) AS centered
    FROM stats
    """,
    tags=("window", "arrow", "survey2.4"),
)
def arrow_window_zscore_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrowWindow via applyInArrow — the closest mechanical match to
    the reference's design (arcon/src/index/window/arrow.rs hands the
    window's Arrow RecordBatches straight to the UDF): each window
    group arrives as a pyarrow.Table, no pandas materialization at all.
    Same integer-cents arithmetic as the JVM and pandas forms, so all
    three share one oracle. Prefer this over applyInPandas when the
    window logic is array-math-only: it skips the pandas Block
    construction on both sides of the hop."""
    import numpy as np
    import pyarrow as pa

    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.window("ts", "1 day").start.alias("win_start"), "event_id", "value"
    )

    def center(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.trunc(v * 100.0 + np.copysign(0.5, v * 100.0)).astype(np.int64)
        mean = (float(cents.sum()) / 100.0) / float(len(v))
        scaled = (v - mean) * 10000.0
        centered = np.trunc(scaled + np.copysign(0.5, scaled)) / 10000.0
        return pa.table(
            {
                "win_start": tbl.column("win_start"),
                "event_id": tbl.column("event_id"),
                "centered": pa.array(centered, type=pa.float64()),
            }
        )

    # applyInArrow has the same per-group-call cost profile as
    # applyInPandas, so it gets the same AQE-coalescing pin (the AST
    # contract in tests/test_plans.py covers both methods).
    return pin_groups(base, "win_start").groupBy("win_start").applyInArrow(
        center, "win_start timestamp, event_id long, centered double"
    )


@register(
    "count_window_agg",
    oracle=f"""
    WITH numbered AS (
      SELECT user_id, event_id, ts, value,
             (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 5
               AS win_idx
      FROM {EVENTS_NORM}
    )
    SELECT user_id, CAST(win_idx AS BIGINT) AS win_idx,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_msum('value', 2)} AS sum_value
    FROM numbered GROUP BY user_id, win_idx
    """,
    tags=("window", "count_window", "survey2.4"),
)
def count_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count windows (every 5 elements per key) — listed as NOT
    implemented in the reference (SURVEY §2.4); Spark expresses them as
    row_number() div N over the keyed event order + a hash aggregate.
    The ordering column pair (ts, event_id) is total per key, so window
    membership is deterministic. One shuffle on user_id serves both the
    numbering window and the aggregate."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    numbered = ev.withColumn(
        "win_idx", ((F.row_number().over(w) - 1) / 5).cast("long")
    )
    return numbered.groupBy("user_id", "win_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        msum(F.col("value"), 2).alias("sum_value"),
    )


@register(
    "session_window_dynamic_gap",
    oracle=f"""
    WITH gapped AS (
      SELECT user_id, ts, event_id, value,
             ts + CASE WHEN event_type = 'click' THEN INTERVAL '10 minutes'
                       ELSE INTERVAL '30 minutes' END AS ival_end
      FROM {EVENTS_NORM}
    ), flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts < MAX(ival_end) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id
                                                ROWS BETWEEN UNBOUNDED PRECEDING
                                                         AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS new_session
      FROM gapped
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_msum('value', 2)} AS sum_value
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("window", "session", "dynamic_gap", "survey2.4"),
)
def session_window_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a PER-EVENT gap (clicks time out after
    10 min, everything else 30) — Spark's dynamic-gap session_window,
    beyond both the reference (no sessions at all) and fixed-gap SQL
    sessionization. Merge rule: an event joins the open session iff its
    ts precedes the session's running max interval end max(tsᵢ+gapᵢ);
    the oracle reproduces exactly that with a running-max window (the
    global running max is safe: once a session closes, every later
    event's own interval end dominates the closed session's)."""
    ev = load_table(spark, sf_dir, "events")
    # string durations, not INTERVAL literals: session_window's dynamic
    # gap needs CalendarIntervalType and parses duration strings itself
    gap = F.when(F.col("event_type") == "click", F.lit("10 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), msum(F.col("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# sliding-window EXACT distinct via bitmap merge — the composition of the
# bitmap partial aggregate (analytics.bitmap_distinct_users) with a window
# frame, solving the classically "impossible" windowed COUNT(DISTINCT)
# ---------------------------------------------------------------------------


@register(
    "windowed_distinct_users_bitmap",
    oracle=f"""
    WITH hours AS (
      SELECT DISTINCT date_trunc('hour', ts) AS hour FROM {EVENTS_NORM}
    )
    SELECT h.hour, CAST(COUNT(DISTINCT events.user_id) AS BIGINT) AS distinct_users_3h
    FROM hours h
    JOIN {EVENTS_NORM} ON date_trunc('hour', events.ts)
        BETWEEN h.hour - INTERVAL 2 HOUR AND h.hour
    GROUP BY h.hour
    """,
    tags=("window", "distinct", "sketch", "survey2.4"),
)
def windowed_distinct_users_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-3-hour distinct users per hour — the windowed
    COUNT(DISTINCT) SQL engines refuse (it is neither partial-
    aggregable nor frame-incremental as a plain count) — made cheap by
    keeping the window merge in BITMAP space: per (hour, bucket =
    user_id div 63) bitmaps from one hash aggregate, then
    `bit_or` over a RANGE frame of 2 trailing hours per bucket
    partition (OR is associative AND idempotent, so overlapping
    windows merge without double-counting), then Σ bit_count per
    hour.

    The window merge is FORWARD REPLICATION, not a window frame: each
    (hour, bucket) bitmap is exploded to the 3 target hours it covers
    and re-aggregated with bit_or. A RANGE-frame formulation silently
    DROPS contributions at hours where a bucket emitted no new rows —
    there is no anchor row to receive the trailing OR (found by the
    oracle hash-mismatch: 696/720 hours undercounted); replication
    has no such alignment hazard, and it also deletes the window sort
    entirely.

    Cost at 100 TB: the event scan collapses to |hours×buckets| longs
    BEFORE any merge machinery runs; the w× replication applies to
    that collapsed summary, not the events — the naive plan (the
    oracle's hours⨯events interval join) replays every EVENT once per
    overlapping window. ClickHouse's groupBitmapMerge rollups are
    this exact shape; swap 63-bit longs for roaring bitmaps when ids
    are sparse."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 3600000000").alias("hidx"),
        "user_id",
    )
    bm = ev.groupBy(
        "hidx", F.expr("user_id div 63").alias("bucket")
    ).agg(
        F.expr("bit_or(shiftleft(1L, cast(pmod(user_id, 63) as int)))").alias("bitmap")
    )
    hours = bm.select("hidx").distinct().withColumnRenamed("hidx", "target")
    contrib = bm.select(
        F.explode(F.expr("sequence(hidx, hidx + 2)")).alias("target"),
        "bucket",
        "bitmap",
    )
    merged = (
        contrib.join(F.broadcast(hours), "target")  # emit only observed hours
        .groupBy("target", "bucket")
        .agg(F.expr("bit_or(bitmap)").alias("bitmap"))
    )
    return (
        merged.groupBy("target")
        .agg(F.sum(F.expr("bit_count(bitmap)")).cast("long").alias("distinct_users_3h"))
        .select(
            F.expr("timestamp_micros(target * 3600000000)").alias("hour"),
            "distinct_users_3h",
        )
    )


@register(
    "cumulative_distinct_users",
    oracle=f"""
    WITH hours AS (
      SELECT DISTINCT date_trunc('hour', ts) AS hour FROM {EVENTS_NORM}
    ),
    firsts AS (
      SELECT user_id, MIN(date_trunc('hour', ts)) AS first_hour
      FROM {EVENTS_NORM} GROUP BY user_id
    ),
    new_per_hour AS (
      SELECT first_hour AS hour, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY first_hour
    )
    SELECT h.hour, COALESCE(n.new_users, 0) AS new_users,
           CAST(SUM(COALESCE(n.new_users, 0))
                OVER (ORDER BY h.hour ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS users_to_date
    FROM hours h LEFT JOIN new_per_hour n ON n.hour = h.hour
    """,
    tags=("window", "distinct", "cumulative", "survey2.4"),
)
def cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per hour (the users-to-date curve) —
    the EXPANDING-window COUNT(DISTINCT) — via the identity
    *cumulative distinct ≡ running sum of first occurrences*: one
    MIN(hour) per user (hash agg, map-side partials), one count per
    first-hour, one running sum over the tiny hour frame. The naive
    plan re-deduplicates an ever-growing prefix per output hour
    (O(h·n) work, exactly what the oracle's formulation would be if
    written directly); first-occurrence reduction does ONE pass over
    the data and all window machinery runs on |hours| rows.

    This is the third distinct-counting shape: bitmap OR merges
    arbitrary window frames (windowed_distinct_users_bitmap), KMV
    estimates unbounded sets in O(k), and first-seen reduction is
    EXACT for the expanding frame specifically — the cheapest of the
    three when the frame never closes. Left-join keeps zero-new-user
    hours on the curve."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"), "user_id"
    )
    hours = ev.select("hour").distinct()
    firsts = ev.groupBy("user_id").agg(F.min("hour").alias("hour"))
    new_per_hour = firsts.groupBy("hour").agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return (
        hours.join(new_per_hour, "hour", "left")
        .select("hour", F.coalesce("new_users", F.lit(0)).alias("new_users"))
        .withColumn("users_to_date", F.sum("new_users").over(w).cast("long"))
    )
