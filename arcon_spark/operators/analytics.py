"""Event-sequence analytics: funnels, cohort retention, interval
coverage, and CEP-style pattern matching.

None of these exist in the reference (SURVEY.md §2.9 — no joins, no
sorts, no window functions); they are the event-stream "query
capabilities" a state-first streaming engine is used for, expressed
here as single-window-pass or co-partitioned-join DataFrame plans:

- **Funnel** — stage chaining as window passes over ONE user_id
  partitioning (running-min signup carries the global first-signup;
  later stages are full-partition mins of carried conditionals) —
  one events scan, 2 exchanges vs the naive join-back's 10.
- **Cohort retention** — two aggregations sharing the user_id
  exchange; weeks are integer epoch arithmetic, so every count is
  exact.
- **Interval coverage** — the classic sweep-line union of per-user
  time intervals as ONE window pass (running max end → island ids →
  per-island span), all in µs longs; no self-join, no explode.
- **CEP pattern** — "A then B within t, with no C between" via
  carried last-A / last-C columns in one window pass — the same plan
  shape as the as-of join (operators/temporal.py), which is what CEP
  NFAs compile to for bounded lookback patterns.

All four are one-or-two-exchange plans whose shuffles key on user_id:
at 1000 executors they scale with the user-key hash partitioning and
AQE handles per-user skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcon_spark.io import load_table, pin_groups, tile_grid_side
from arcon_spark.plans.compat import EVENTS_NORM
from arcon_spark.plans.registry import register

_US_PER_WEEK = 7 * 86_400_000_000
_COVER_MIN = 5  # interval half-width, minutes
_CEP_MIN = 60  # A→B pattern bound, minutes


@register(
    "funnel_conversion",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts
      FROM {EVENTS_NORM} GROUP BY user_id
    ),
    v AS (
      SELECT events.user_id, s.signup_ts,
             min(CASE WHEN events.event_type = 'view'
                       AND events.ts > s.signup_ts THEN events.ts END) AS view_ts
      FROM {EVENTS_NORM}
      JOIN s ON events.user_id = s.user_id
      WHERE s.signup_ts IS NOT NULL
      GROUP BY events.user_id, s.signup_ts
    ),
    p AS (
      SELECT events.user_id, v.signup_ts, v.view_ts,
             min(CASE WHEN events.event_type = 'purchase'
                       AND events.ts > v.view_ts THEN events.ts END) AS purchase_ts
      FROM {EVENTS_NORM}
      JOIN v ON events.user_id = v.user_id
      GROUP BY events.user_id, v.signup_ts, v.view_ts
    )
    SELECT user_id, signup_ts, view_ts, purchase_ts,
           CASE WHEN purchase_ts IS NOT NULL THEN 3
                WHEN view_ts IS NOT NULL THEN 2 ELSE 1 END AS stage
    FROM p
    """,
    tags=("analytics", "funnel", "sequence"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → view → purchase per user: each stage
    timestamp is the first qualifying event STRICTLY AFTER the prior
    stage.

    ONE exchange on user_id (verified: `.explain` shows a single
    Exchange; the naive three-aggregation + join-back formulation —
    which the oracle still uses — scans events three times and plans
    10 exchanges). Stage chaining rides window functions over the one
    sorted partition: the running min of signup timestamps equals the
    global first-signup on every row at-or-after it, so "first view
    after first signup" is a full-partition min of a carried
    conditional, and each later stage is another window pass over the
    SAME partitioning (no new exchange, sort reused). The final
    per-user reduction aggregates on the partitioning key, so it is
    exchange-free too."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("user_id")

    with_s = ev.withColumn(
        "s_run",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w_run),
    )
    with_v = with_s.withColumn(
        "view_ts",
        F.min(
            F.when(
                (F.col("event_type") == "view") & (F.col("ts") > F.col("s_run")),
                F.col("ts"),
            )
        ).over(w_all),
    )
    with_p = with_v.withColumn(
        "purchase_ts",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("view_ts")),
                F.col("ts"),
            )
        ).over(w_all),
    )
    per_user = (
        with_p.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
                "signup_ts"
            ),
            F.min("view_ts").alias("view_ts"),
            F.min("purchase_ts").alias("purchase_ts"),
        )
        .filter(F.col("signup_ts").isNotNull())
    )
    return per_user.select(
        "user_id",
        "signup_ts",
        "view_ts",
        "purchase_ts",
        F.when(F.col("purchase_ts").isNotNull(), 3)
        .when(F.col("view_ts").isNotNull(), 2)
        .otherwise(1)
        .alias("stage"),
    )


@register(
    "retention_cohorts",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, min(epoch_us(ts) // {_US_PER_WEEK}) AS cohort_week
      FROM {EVENTS_NORM} GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT events.user_id, f.cohort_week,
             epoch_us(events.ts) // {_US_PER_WEEK} - f.cohort_week AS week_offset
      FROM {EVENTS_NORM}
      JOIN firsts f ON events.user_id = f.user_id
    )
    SELECT cohort_week, week_offset, count(*) AS n_users
    FROM activity GROUP BY cohort_week, week_offset
    """,
    tags=("analytics", "retention", "cohort"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-seen
    week, counted once per (cohort, week offset) they were active in.
    Integer epoch-week arithmetic → exact counts. The first-seen
    aggregate and the join-back share the user_id exchange."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"unix_micros(ts) div {_US_PER_WEEK}").alias("week")
    )
    firsts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "interval_coverage_users",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s_us,
             epoch_us(ts) + {_COVER_MIN * 60_000_000} AS e_us
      FROM {EVENTS_NORM}
    ),
    marked AS (
      SELECT user_id, s_us, e_us,
             CASE WHEN s_us <= max(e_us) OVER (
                    PARTITION BY user_id ORDER BY s_us, e_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 0 ELSE 1 END AS is_new
      FROM iv
    ),
    islands AS (
      SELECT user_id, s_us, e_us,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY s_us, e_us
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ),
    spans AS (
      SELECT user_id, island,
             max(e_us) - min(s_us) AS span_us
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id, count(*) AS n_islands,
           CAST(sum(span_us) AS BIGINT) AS covered_us
    FROM spans GROUP BY user_id
    """,
    tags=("analytics", "temporal", "sweep"),
)
def interval_coverage_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union length of per-user activity intervals [ts, ts+5min): the
    sweep-line as one window pass — running max of interval ends marks
    island starts, a running sum numbers the islands, then
    max(end)-min(start) per island. All µs longs (exact); one exchange
    on user_id shared by both window functions and the final agg."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.lit(_COVER_MIN * 60_000_000)).alias("e_us"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s_us", "e_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = ev.withColumn(
        "is_new",
        F.when(F.col("s_us") <= F.max("e_us").over(w_prev), 0).otherwise(1),
    )
    islands = marked.withColumn("island", F.sum("is_new").over(w_run))
    spans = islands.groupBy("user_id", "island").agg(
        (F.max("e_us") - F.min("s_us")).alias("span_us")
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"), F.sum("span_us").alias("covered_us")
    )


@register(
    "cep_purchase_error_pattern",
    oracle=f"""
    WITH carried AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_ts,
             last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_signup_ts
      FROM {EVENTS_NORM}
    )
    SELECT user_id, event_id AS error_id, ts AS error_ts, last_purchase_ts,
           epoch_us(ts) - epoch_us(last_purchase_ts) AS gap_us
    FROM carried
    WHERE event_type = 'error'
      AND last_purchase_ts IS NOT NULL
      AND epoch_us(ts) - epoch_us(last_purchase_ts) <= {_CEP_MIN * 60_000_000}
      AND (last_signup_ts IS NULL OR last_signup_ts < last_purchase_ts)
    """,
    tags=("analytics", "cep", "sequence"),
)
def cep_purchase_error_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP pattern: purchase FOLLOWED BY error within 60 minutes with
    NO signup in between — matched in one ordered window pass by
    carrying last-purchase / last-signup timestamps onto every event
    (bounded-lookback NFA state as carried columns; same plan shape
    as the as-of join). One exchange on user_id."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(
            F.when(F.col("event_type") == "purchase", F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_purchase_ts"),
        F.last(
            F.when(F.col("event_type") == "signup", F.col("ts")), ignorenulls=True
        )
        .over(w)
        .alias("last_signup_ts"),
    )
    gap = F.unix_micros("ts") - F.unix_micros("last_purchase_ts")
    return carried.filter(
        (F.col("event_type") == "error")
        & F.col("last_purchase_ts").isNotNull()
        & (gap <= F.lit(_CEP_MIN * 60_000_000))
        & (
            F.col("last_signup_ts").isNull()
            | (F.col("last_signup_ts") < F.col("last_purchase_ts"))
        )
    ).select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
        "last_purchase_ts",
        gap.alias("gap_us"),
    )


@register(
    "cusum_changepoint_hourly",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
             SUM(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM {EVENTS_NORM} GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type, count(*) AS n_hours, SUM(cents) AS total
      FROM hourly GROUP BY 1
    ),
    cum AS (
      SELECT h.event_type, h.hour, s.n_hours,
             s.n_hours * SUM(h.cents) OVER (
               PARTITION BY h.event_type ORDER BY h.hour
               ROWS UNBOUNDED PRECEDING)
             - row_number() OVER (PARTITION BY h.event_type ORDER BY h.hour)
               * s.total AS d
      FROM hourly h JOIN stats s USING (event_type)
    ),
    scored AS (
      SELECT event_type, hour, n_hours, CAST(abs(d) AS BIGINT) AS score,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY abs(d) DESC, hour) AS rk
      FROM cum
    )
    SELECT event_type, hour AS change_hour, n_hours, score
    FROM scored WHERE rk = 1
    """,
    tags=("analytics", "timeseries", "changepoint"),
)
def cusum_changepoint_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint estimate per event_type: the hour maximizing
    |cumulative deviation from the series mean| of hourly value sums.
    The mean is rational, so the statistic is multiplied through by
    n_hours — D_t = n·Σ_{i≤t} x_i − t·Σx — keeping EVERYTHING in
    exact integer cents (no float drift, oracle hash-matches).

    Scale shape: hourly pre-aggregation shrinks the series to
    O(groups × hours), then everything runs on that reduced frame in
    ONE event_type exchange: series totals come from full-partition
    window aggregates over the same partitioning as the cusum windows
    (not a stats join — the join-back formulation, which the oracle
    keeps, planned 10 exchanges; this plans 3: the hourly hash agg,
    the re-key to event_type, and AQE reads). Per-task longs
    stay far below 2^63 (cents·rows·hours bounded by the hourly
    reduction)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "hour")
        .agg(F.sum("cents").alias("cents"))
    )
    w_all = Window.partitionBy("event_type")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_rn = Window.partitionBy("event_type").orderBy("hour")
    cum = hourly.select(
        "event_type",
        "hour",
        F.count(F.lit(1)).over(w_all).alias("n_hours"),
        (
            F.count(F.lit(1)).over(w_all) * F.sum("cents").over(w_run)
            - F.row_number().over(w_rn).cast("long") * F.sum("cents").over(w_all)
        ).alias("d"),
    )
    scored = cum.select(
        "event_type",
        "hour",
        "n_hours",
        F.abs("d").alias("score"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy(F.abs("d").desc(), "hour"))
        .alias("rk"),
    )
    return scored.filter(F.col("rk") == 1).select(
        "event_type", F.col("hour").alias("change_hour"), "n_hours", "score"
    )


@register(
    "rolling_median_value",
    oracle=f"""
    SELECT user_id, event_id,
           quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS med10
    FROM {EVENTS_NORM}
    """,
    tags=("analytics", "timeseries", "holistic-window"),
)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median over the trailing 10 events per user — a
    HOLISTIC aggregate as a window function (the reference's
    AppenderWindow materializer shape: buffer, then a full-buffer
    computation per emission, index/window/appender.rs:10-91, here
    per-row instead of per-window-fire).

    Both engines linear-interpolate the 0.5 quantile (mean of the two
    middle values on even counts) — one IEEE add + multiply, so values
    hash-match exactly. One exchange on user_id; the 10-row frame
    bounds per-row work and memory regardless of partition size, so
    the plan is identical at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.expr("percentile(value, 0.5)")
        .over(w)
        .alias("med10"),
    )


_SAX_SEG_HOURS = 6  # PAA segment width


@register(
    "sax_symbolize_hourly",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
             epoch_us(ts) // {3600 * 1_000_000} AS hr,
             SUM(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM {EVENTS_NORM} GROUP BY 1, 2
    ),
    seg AS (
      SELECT event_type, hr // {_SAX_SEG_HOURS} AS seg_id,
             CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS paa
      FROM hourly GROUP BY 1, 2
    ),
    br AS (
      SELECT event_type, seg_id, paa,
             quantile_cont(paa, 0.25) OVER w AS q1,
             quantile_cont(paa, 0.50) OVER w AS q2,
             quantile_cont(paa, 0.75) OVER w AS q3
      FROM seg
      WINDOW w AS (PARTITION BY event_type
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, seg_id, paa,
           CASE WHEN paa < q1 THEN 'a' WHEN paa < q2 THEN 'b'
                WHEN paa < q3 THEN 'c' ELSE 'd' END AS symbol
    FROM br
    """,
    tags=("analytics", "timeseries", "sax"),
)
def sax_symbolize_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) of each event_type's
    hourly series: PAA means over 6-hour segments, discretized to a
    4-letter alphabet at the series' own quartile breakpoints — the
    standard index/sketch representation for time-series motif and
    similarity search.

    Determinism: segment means are exact-integer-cents sums divided
    once; quartiles interpolate as (lo+hi)*0.5 in both engines (see
    stream_rolling_median); symbol assignment is strict-< against
    those doubles. Plan: two integer pre-aggregations shrink the data
    to O(types × segments) before the per-type quantile window — the
    only full-partition pass runs on the reduced frame."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"unix_micros(ts) div {3600 * 1_000_000}").alias("hr"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "hr")
        .agg(F.sum("cents").alias("cents"))
    )
    seg = (
        hourly.groupBy(
            "event_type", F.expr(f"hr div {_SAX_SEG_HOURS}").alias("seg_id")
        )
        .agg(
            (F.sum("cents").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "paa"
            )
        )
    )
    w = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    br = seg.select(
        "event_type",
        "seg_id",
        "paa",
        F.expr("percentile(paa, 0.25)").over(w).alias("q1"),
        F.expr("percentile(paa, 0.50)").over(w).alias("q2"),
        F.expr("percentile(paa, 0.75)").over(w).alias("q3"),
    )
    return br.select(
        "event_type",
        "seg_id",
        "paa",
        F.when(F.col("paa") < F.col("q1"), "a")
        .when(F.col("paa") < F.col("q2"), "b")
        .when(F.col("paa") < F.col("q3"), "c")
        .otherwise("d")
        .alias("symbol"),
    )


# Brown's double exponential smoothing, bounded-frame integer form.
# S1 weights over lags 0..7: 2^(7-k) (sum 255); S2 = the same kernel
# applied to S1, which over a FULL 15-lag frame composes to exact
# convolved integer weights conv_m = (8-|m-7|)·2^(14-m) (sum 255²).
_BROWN_D = 8
_BROWN_W1 = [2 ** (_BROWN_D - 1 - k) for k in range(_BROWN_D)]
_BROWN_SUM1 = sum(_BROWN_W1)  # 255
_BROWN_CONV = [
    (_BROWN_D - abs(m - (_BROWN_D - 1))) * 2 ** (2 * _BROWN_D - 2 - m)
    for m in range(2 * _BROWN_D - 1)
]
_BROWN_SUM2 = sum(_BROWN_CONV)  # 255²


def _brown_terms(lag_fmt: str) -> tuple[str, str]:
    """(s1_num, s2_num) expressions over 15 lag columns; both are
    exact integer dot products (cents × constant weights)."""
    s1 = " + ".join(
        f"{lag_fmt.format(k=k)} * {w}" for k, w in enumerate(_BROWN_W1)
    )
    s2 = " + ".join(
        f"{lag_fmt.format(k=m)} * {c}" for m, c in enumerate(_BROWN_CONV)
    )
    return s1, s2


@register(
    "brown_trend_forecast",
    oracle=(lambda terms: f"""
    WITH t AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS c0,
             {", ".join(
                 f"lag(CAST(round(value * 100) AS BIGINT), {k}) OVER w AS c{k}"
                 for k in range(1, 2 * _BROWN_D - 1)
             )}
      FROM {EVENTS_NORM}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(({terms[0]}) AS DOUBLE) / {_BROWN_SUM1}.0 / 100.0 AS s1,
           CAST(({terms[1]}) AS DOUBLE) / {_BROWN_SUM2}.0 / 100.0 AS s2,
           (2.0 * (CAST(({terms[0]}) AS DOUBLE) / {_BROWN_SUM1}.0 / 100.0))
             - CAST(({terms[1]}) AS DOUBLE) / {_BROWN_SUM2}.0 / 100.0 AS level,
           (CAST(({terms[0]}) AS DOUBLE) / {_BROWN_SUM1}.0 / 100.0)
             - CAST(({terms[1]}) AS DOUBLE) / {_BROWN_SUM2}.0 / 100.0 AS trend,
           (3.0 * (CAST(({terms[0]}) AS DOUBLE) / {_BROWN_SUM1}.0 / 100.0))
             - (2.0 * (CAST(({terms[1]}) AS DOUBLE) / {_BROWN_SUM2}.0 / 100.0))
             AS forecast
    FROM t WHERE c{2 * _BROWN_D - 2} IS NOT NULL
    """)(_brown_terms("c{k}")),
    tags=("analytics", "timeseries", "forecast"),
)
def brown_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double-exponential smoothing (level + trend) with EXACT
    arithmetic: over a full 15-lag frame the second smoothing pass
    composes into fixed convolved integer weights, so S1, S2 and the
    derived quantities are ratios of exact integer dot products —
    bit-identical cross-engine, where a recursive float EWMA-of-EWMA
    never is (extends the ewma_user_value design,
    operators/maintenance.py). The weights are the alpha = 1/2 EWMA
    truncated at 8 lags, so alpha/(1-alpha) = 1 and Brown's
    decomposition is level a_t = 2*S1 - S2, trend b_t = S1 - S2, and
    the one-step forecast a_t + b_t = 3*S1 - 2*S2 (through round 5
    the `forecast` column carried only the LEVEL 2*S1 - S2 — a
    semantics mislabel both engines shared, the class of bug parity
    cannot catch; pinned now by the planted-line test in
    tests/test_analytics.py). Rows without full history are excluded
    (the head-truncated variant has data-dependent weight sums on S2
    that no longer compose exactly).

    Scale: one window pass on user_id; 15 lags, O(1) per row, O(depth)
    state per key if streamed."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100).cast("long")
    t = ev.select(
        "user_id",
        "event_id",
        cents.alias("c0"),
        *[F.lag(cents, k).over(w).alias(f"c{k}") for k in range(1, 2 * _BROWN_D - 1)],
    )
    s1_num, s2_num = _brown_terms("c{k}")
    s1 = F.expr(s1_num).cast("double") / F.lit(float(_BROWN_SUM1)) / F.lit(100.0)
    s2 = F.expr(s2_num).cast("double") / F.lit(float(_BROWN_SUM2)) / F.lit(100.0)
    return t.filter(F.col(f"c{2 * _BROWN_D - 2}").isNotNull()).select(
        "user_id",
        "event_id",
        s1.alias("s1"),
        s2.alias("s2"),
        (F.lit(2.0) * s1 - s2).alias("level"),
        (s1 - s2).alias("trend"),
        (F.lit(3.0) * s1 - F.lit(2.0) * s2).alias("forecast"),
    )


_DEBOUNCE_MIN = 5


@register(
    "debounce_events",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id))
                  <= {_DEBOUNCE_MIN * 60_000_000}
                  THEN 0 ELSE 1 END AS is_burst_start
      FROM {EVENTS_NORM}
    ),
    b AS (
      SELECT user_id, event_id, ts, event_type,
             sum(is_burst_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS burst
      FROM g
    ),
    r AS (
      SELECT user_id, event_id, ts, event_type, burst,
             row_number() OVER (PARTITION BY user_id, burst
                                ORDER BY ts, event_id) AS rn,
             CAST(count(*) OVER (PARTITION BY user_id, burst) AS BIGINT)
               AS n_suppressed
      FROM b
    )
    SELECT user_id, event_id, ts, event_type, n_suppressed - 1 AS n_suppressed
    FROM r WHERE rn = 1
    """,
    tags=("analytics", "debounce", "sequence"),
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce / rate-limit per user: keep only the FIRST event of
    each activity burst (events within {gap} minutes of the previous
    one belong to the same burst), reporting how many were
    suppressed. The dedup-by-time-proximity operator every
    alerting/notification pipeline needs; a lag-gap island pass —
    the sessionize plan shape with a keep-first materializer. One
    exchange on user_id; all three window functions and the island
    arithmetic share its sort."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    g = ev.withColumn(
        "is_burst_start",
        F.when(gap_us <= F.lit(_DEBOUNCE_MIN * 60_000_000), 0).otherwise(1),
    )
    b = g.withColumn(
        "burst",
        F.sum("is_burst_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    wb = Window.partitionBy("user_id", "burst")
    r = b.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.row_number().over(wb.orderBy("ts", "event_id")).alias("rn"),
        (F.count(F.lit(1)).over(wb) - F.lit(1)).cast("long").alias("n_suppressed"),
    )
    return r.filter(F.col("rn") == 1).drop("rn")


@register(
    "snapshot_diff_user_stats",
    oracle=f"""
    WITH a AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM {EVENTS_NORM} WHERE ts < TIMESTAMP '2024-01-16'
      GROUP BY user_id
    ),
    b AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM {EVENTS_NORM}
      GROUP BY user_id
    )
    SELECT COALESCE(a.user_id, b.user_id) AS user_id,
           a.n AS n_old, b.n AS n_new,
           CASE WHEN a.user_id IS NULL THEN 'added'
                WHEN b.user_id IS NULL THEN 'removed'
                WHEN a.n <> b.n THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
    """,
    tags=("analytics", "diff", "snapshot"),
)
def snapshot_diff_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the audit query the TSS snapshot catalog
    (streaming/snapshot.py time travel) exists to answer: compare a
    per-user aggregate at two epochs (here: mid-month vs final) and
    classify every key added / removed / changed / unchanged. One
    full-outer join on the aggregation key; both sides reduce before
    joining, so the join input is keys, not events. At 100 TB this
    runs between two epoch directories of the snapshot catalog with
    the identical plan."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    a = (
        ev.filter(F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_old"))
    )
    b = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_new"))
    j = a.alias("a").join(b.alias("b"), F.col("a.user_id") == F.col("b.user_id"), "full_outer")
    return j.select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        "n_old",
        "n_new",
        F.when(F.col("a.user_id").isNull(), "added")
        .when(F.col("b.user_id").isNull(), "removed")
        .when(F.col("n_old") != F.col("n_new"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )


_BASKET_MIN_CO = 2  # minimum co-occurrence support


@register(
    "market_basket_lift",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
    ),
    n_orders AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n FROM items),
    supp AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY part),
    co AS (
      SELECT a.part AS part_a, b.part AS part_b,
             CAST(COUNT(*) AS BIGINT) AS n_co
      FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
      GROUP BY 1, 2
    )
    SELECT c.part_a, c.part_b, c.n_co, sa.c AS n_a, sb.c AS n_b,
           CAST(c.n_co AS DOUBLE) * (SELECT n FROM n_orders)
             / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)) AS lift
    FROM co c
    JOIN supp sa ON sa.part = c.part_a
    JOIN supp sb ON sb.part = c.part_b
    WHERE c.n_co >= {_BASKET_MIN_CO}
    """,
    tags=("analytics", "association", "basket"),
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: part pairs co-ordered in the same
    order with support ≥ {m}, scored by lift = N·P(a,b)/(P(a)·P(b)) —
    the recommendation/affinity operator. Integer supports; lift is
    one float expression with fixed evaluation order.

    Scale shape: the pair join is keyed on the order (bounded fan-out:
    ~4-7 items per order → ≤ items²/2 pairs per basket, NOT corpus-
    quadratic); supports broadcast onto the pair frame; the global
    order count is a 1-row scalar broadcast. Skewed mega-baskets are
    the LSH_BUCKET_CAP situation — cap items per basket before the
    self-join if they occur."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part"))
        .distinct()
        # feeds the order count, both self-join sides, and the support
        # table — checkpoint so the distinct runs once, not per branch
        .localCheckpoint(eager=True)
    )
    n_orders = items.select("okey").distinct().count()
    supp = items.groupBy("part").agg(F.count(F.lit(1)).alias("c"))
    a = items.alias("a")
    b = items.alias("b")
    co = (
        a.join(b, (F.col("a.okey") == F.col("b.okey")) & (F.col("a.part") < F.col("b.part")))
        .groupBy(F.col("a.part").alias("part_a"), F.col("b.part").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= _BASKET_MIN_CO)
    )
    sa = supp.select(F.col("part").alias("part_a"), F.col("c").alias("n_a"))
    sb = supp.select(F.col("part").alias("part_b"), F.col("c").alias("n_b"))
    return (
        co.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .select(
            "part_a",
            "part_b",
            "n_co",
            "n_a",
            "n_b",
            (
                F.col("n_co").cast("double") * F.lit(float(n_orders))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Table profiling — the data-quality "describe" primitive
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("o_orderdate", "CAST(o_orderdate AS VARCHAR)"),
]


@register(
    "profile_orders_columns",
    oracle=f"""
    WITH u AS (
      {" UNION ALL ".join(f"SELECT '{c}' AS col_name, {e} AS val FROM orders" for c, e in _PROFILE_COLS)}
    ),
    g AS (SELECT col_name, val, COUNT(*) AS cnt FROM u GROUP BY 1, 2),
    top AS (
      SELECT col_name, val AS top_val, CAST(cnt AS BIGINT) AS top_count FROM (
        SELECT col_name, val, cnt,
               row_number() OVER (PARTITION BY col_name ORDER BY cnt DESC, val) AS rn
        FROM g WHERE val IS NOT NULL
      ) WHERE rn = 1
    )
    SELECT g.col_name,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN val IS NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(CASE WHEN val IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct,
           MIN(val) AS min_val, MAX(val) AS max_val,
           MAX(t.top_val) AS top_val, MAX(t.top_count) AS top_count
    FROM g JOIN top t ON t.col_name = g.col_name
    GROUP BY g.col_name
    """,
    tags=("analytics", "profiling", "quality", "reporting"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling in ONE scan: every column unpivots to
    (col_name, val) rows via stack() — a zero-shuffle codegen
    projection — then a single (col_name, val) hash aggregate yields
    per-column null counts and EXACT distinct counts; min/max and the
    modal value come from WindowGroupLimit row picks over the same
    distinct-value frame (string MIN/MAX inside a hash agg would
    demote it to SortAggregate). This is df.summary()/dbt-style profiling but exact and
    engine-portable (doubles are profiled as integer-cent strings;
    raw double→string formatting diverges between engines).

    Scale: the unpivot multiplies rows ×k but each output row carries
    ONE short string; the first aggregate is map-side partial so the
    exchange is Σ per-column distinct values, not k×rows. Hot columns
    with huge cardinality (ids) dominate — swap their exact distinct
    for approx_count_distinct / the KMV sketch when profiling 100 TB,
    same frame shape. The distinct-value frame is checkpointed once;
    per-column totals are a plain hash aggregate (counts only in the
    buffer — nothing demotes to SortAggregate) and min/max/mode are
    WindowGroupLimit row picks: the rn = 1 filter pushes a
    per-map-partition top-1 BELOW each exchange, so no shuffle carries
    more than k rows per task and no task ever sorts more than its
    local slice (the r10 rewrite — the previous full-frame window form
    repartitioned to k = #columns partitions and sorted the largest
    column's whole distinct-value frame three times on one task, a
    planned straggler at scale)."""
    orders = load_table(spark, sf_dir, "orders")
    stack_args = ", ".join(
        f"'{c}', {e.replace('VARCHAR', 'string')}" for c, e in _PROFILE_COLS
    )
    u = orders.select(
        F.expr(f"stack({len(_PROFILE_COLS)}, {stack_args}) as (col_name, val)")
    )
    g = u.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint(eager=True)

    # r10 (guide §2.5): the previous form computed min/max/mode as
    # full-frame window aggregates over ONE repartition on col_name —
    # k = 5 partitions, so the id column's 150k distinct values sorted
    # three times on a single task (a planned straggler). Now the
    # per-column totals are a plain hash aggregate (map-side partial,
    # no strings in the aggregate buffer, so nothing demotes to
    # SortAggregate) and min/max/mode are WindowGroupLimit row picks:
    # the rn = 1 filter pushes a per-map-partition top-1 below each
    # exchange, so every shuffle carries ≤ k rows per task instead of
    # the whole distinct-value frame, and no task ever sorts more than
    # its local slice. The distinct-value frame is checkpointed once
    # and feeds all four passes.
    stats = g.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), F.col("cnt")).otherwise(0)).alias(
            "n_nulls"
        ),
        F.count(F.when(F.col("val").isNotNull(), 1)).alias("n_distinct"),
    )

    def pick(order_cols, out_cols):
        w = Window.partitionBy("col_name").orderBy(*order_cols)
        return (
            g.filter(F.col("val").isNotNull())
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("col_name", *out_cols)
        )

    mins = pick([F.asc("val")], [F.col("val").alias("min_val")])
    maxs = pick([F.desc("val")], [F.col("val").alias("max_val")])
    mode = pick(
        [F.desc("cnt"), F.asc("val")],
        [F.col("val").alias("top_val"), F.col("cnt").alias("top_count")],
    )
    return (
        stats.join(F.broadcast(mins), "col_name", "left")
        .join(F.broadcast(maxs), "col_name", "left")
        .join(F.broadcast(mode), "col_name", "left")
        .select(
            "col_name",
            "n_rows",
            "n_nulls",
            "n_distinct",
            "min_val",
            "max_val",
            "top_val",
            "top_count",
        )
    )


# ---------------------------------------------------------------------------
# Cohort lifetime value (LTV curves)
# ---------------------------------------------------------------------------


@register(
    "cohort_ltv_weekly",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, min(epoch_us(ts) // {_US_PER_WEEK}) AS cohort_week
      FROM {EVENTS_NORM} WHERE event_type = 'purchase' GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_users
      FROM firsts GROUP BY cohort_week
    ),
    rev AS (
      SELECT f.cohort_week,
             epoch_us(events.ts) // {_US_PER_WEEK} - f.cohort_week AS age_weeks,
             SUM(CAST(round(events.value * 100) AS HUGEINT)) AS cents
      FROM {EVENTS_NORM}
      JOIN firsts f ON events.user_id = f.user_id
      WHERE events.event_type = 'purchase'
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_week, age_weeks,
             SUM(cents) OVER (PARTITION BY cohort_week ORDER BY age_weeks
                              ROWS UNBOUNDED PRECEDING) AS cum_cents
      FROM rev
    )
    SELECT c.cohort_week, CAST(c.age_weeks AS BIGINT) AS age_weeks,
           s.cohort_users,
           CAST(c.cum_cents AS DOUBLE) / 100.0 AS cum_revenue,
           CAST(c.cum_cents AS DOUBLE) / 100.0
             / CAST(s.cohort_users AS DOUBLE) AS ltv_per_user
    FROM cum c JOIN sizes s ON s.cohort_week = c.cohort_week
    """,
    tags=("analytics", "cohort", "ltv", "timeseries"),
)
def cohort_ltv_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: users cohorted by first-purchase week, then
    cumulative purchase revenue per cohort-age — the
    lifetime-value-by-age matrix growth teams read next to the
    retention triangle (retention_cohorts, same week arithmetic).
    Revenue accumulates as exact integer cents (order-independent
    sums); the cumulative pass is a window over the already-aggregated
    (cohort × age) frame — thousands of rows at any corpus size — and
    the two divisions at the end are the only float ops.

    Plan: one purchases scan feeds both the first-week aggregate and
    the revenue join-back on the SAME user_id exchange; the
    (cohort, age) aggregate is map-side partial; cohort sizes broadcast
    back. No shuffle ever carries more than the reduced frames."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_US_PER_WEEK}").alias("week"),
        F.expr("cast(round(value * 100) as long)").alias("cents"),
    )
    firsts = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    rev = (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("age_weeks")
        )
        .agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("cents"))
    )
    wc = Window.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = rev.withColumn("cum_cents", F.sum("cents").over(wc))
    return cum.join(F.broadcast(sizes), "cohort_week").select(
        "cohort_week",
        F.col("age_weeks").cast("long").alias("age_weeks"),
        "cohort_users",
        (F.col("cum_cents").cast("double") / 100.0).alias("cum_revenue"),
        (
            F.col("cum_cents").cast("double")
            / 100.0
            / F.col("cohort_users").cast("double")
        ).alias("ltv_per_user"),
    )


# ---------------------------------------------------------------------------
# Time-decayed popularity (exponential decay with exact integer weights)
# ---------------------------------------------------------------------------

_DECAY_TOP = 10


@register(
    "decayed_topk_parts",
    oracle=f"""
    WITH days AS (
      SELECT l_partkey,
             CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) // 86400 AS day
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ),
    span AS (SELECT MIN(day) AS d0 FROM days),
    scored AS (
      SELECT l_partkey,
             SUM(CAST(CAST(1 AS BIGINT)
                      << CAST((day - (SELECT d0 FROM span)) // 91 AS BIGINT)
                      AS HUGEINT)) AS decayed,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM days GROUP BY 1
    )
    SELECT l_partkey AS p_partkey, n_orders,
           CAST(decayed AS VARCHAR) AS decayed_weight,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (ORDER BY decayed DESC, l_partkey) AS rn
      FROM scored
    ) WHERE rn <= {_DECAY_TOP}
    """,
    tags=("analytics", "topk", "timeseries", "decay"),
)
def decayed_topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity ranking under EXPONENTIAL TIME DECAY — the trending
    items primitive: each order contributes weight 2^(quarter since
    corpus start), so a recent order outweighs any number of orders ≥1
    half-life older (equivalently: everything decays by ½ per quarter
    from NOW). The twist that makes it distributed-exact: weights are
    integer powers of two summed exactly (the 7-year order history
    spans 28 quarters → 2^28 max; decimal(38) headroom to 2^126 —
    shard longer horizons by epoch and rescale), so ranking is
    deterministic where float
    exp-decay accumulation would be order-dependent. The score is
    REPORTED as the exact integer too (log2 of it differs between
    engines in the last ulp — libm, not IEEE-specified); consumers
    wanting a float take log2 downstream.

    Plan: one join + one hash aggregate (map-side partial sums), then
    TakeOrdered {_DECAY_TOP}. The corpus-start scalar is a 1-row
    aggregate reused via a window-free broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    days = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_partkey",
        F.expr("cast(unix_seconds(cast(o_orderdate as timestamp)) as bigint) div 86400").alias(
            "day"
        ),
    )
    d0 = days.agg(F.min("day").alias("d0")).first().d0
    scored = (
        days.select(
            "l_partkey",
            F.expr(
                f"cast(shiftleft(cast(1 as bigint), "
                f"cast((day - {d0}) div 91 as int)) as decimal(38,0))"
            ).alias("w"),
        )
        .groupBy("l_partkey")
        .agg(
            F.sum("w").alias("decayed"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    w = Window.orderBy(F.desc("decayed"), F.asc("l_partkey"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _DECAY_TOP)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "n_orders",
            F.col("decayed").cast("string").alias("decayed_weight"),
            "rn",
        )
    )


# ---------------------------------------------------------------------------
# Data-quality expectations (dbt-test / Great-Expectations-style checks)
# ---------------------------------------------------------------------------


@register(
    "dq_expectations_orders",
    oracle="""
    SELECT 'orderkey_not_null' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orderkey_unique',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'totalprice_positive',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'status_accepted_values',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 END)
                AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'custkey_referential',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 END)
                AS BIGINT)
    FROM lineitem
    """,
    tags=("analytics", "quality", "validation", "pipeline"),
)
def dq_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (the dbt-test /
    Great-Expectations layer) evaluated as ONE Spark job: not-null,
    uniqueness, range, accepted-values, cross-table referential
    integrity, and a numeric range invariant — each rule one
    row of (n_checked, n_violations). Every check is a conditional
    count (exact, engine-portable); uniqueness is COUNT(*) −
    COUNT(DISTINCT); referential integrity is an anti-join expressed
    as a null-count over a left join with the (small) dimension
    broadcast.

    Plan: ALL five orders rules evaluate in ONE pass — a single scan
    through the (broadcast) referential left join into one
    conditional aggregate, pivoted to rule rows by an in-row explode;
    the lineitem rule is a second single-row aggregate. Two scans,
    two single-row exchanges, one broadcast for the whole audit — no
    rule ever materializes violating ROWS (pair each failing rule
    with a follow-up query for examples, as split_contamination_check
    does). At 100 TB this is the post-load audit gate run before a
    partition is published, and one pass vs six is the difference."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def viol(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    joined = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
    wide = joined.agg(
        F.count(F.lit(1)).alias("n"),
        viol(F.col("o_orderkey").isNull()).alias("v_null"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).cast("long").alias("v_uniq"),
        viol(F.col("o_totalprice") <= 0).alias("v_price"),
        viol(~F.col("o_orderstatus").isin("F", "O", "P")).alias("v_status"),
        viol(F.col("c_custkey").isNull()).alias("v_ref"),
    )

    def as_rule(name: str, v: str) -> F.Column:
        return F.struct(
            F.lit(name).alias("rule"),
            F.col("n").alias("n_checked"),
            F.col(v).alias("n_violations"),
        )

    orules = wide.select(
        F.explode(
            F.array(
                as_rule("orderkey_not_null", "v_null"),
                as_rule("orderkey_unique", "v_uniq"),
                as_rule("totalprice_positive", "v_price"),
                as_rule("status_accepted_values", "v_status"),
                as_rule("custkey_referential", "v_ref"),
            )
        ).alias("r")
    ).select("r.rule", "r.n_checked", "r.n_violations")
    li_rule = li.agg(
        F.lit("lineitem_discount_range").alias("rule"),
        F.count(F.lit(1)).alias("n_checked"),
        viol((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).alias(
            "n_violations"
        ),
    ).select("rule", "n_checked", "n_violations")
    return orules.unionByName(li_rule)


# ---------------------------------------------------------------------------
# Decision-tree split finding (histogram method)
# ---------------------------------------------------------------------------

_GINI_BINS = 64
_GINI_BIN_CENTS = 937_500  # 64 bins over ~$600k of o_totalprice


@register(
    "gini_best_split_totalprice",
    oracle=f"""
    WITH h AS (
      SELECT LEAST({_GINI_BINS - 1},
                   CAST(round(o_totalprice * 100) AS BIGINT) // {_GINI_BIN_CENTS})
               AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
                  AS BIGINT) AS pos
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT bin, n, pos,
             SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS nl,
             SUM(pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS posl,
             SUM(n) OVER () AS nt, SUM(pos) OVER () AS post
      FROM h
    ),
    g AS (
      SELECT bin, nl, nt - nl AS nr,
             (CAST(nl AS DOUBLE) * (1.0
                - (CAST(posl AS DOUBLE) / CAST(nl AS DOUBLE))
                  * (CAST(posl AS DOUBLE) / CAST(nl AS DOUBLE))
                - (CAST(nl - posl AS DOUBLE) / CAST(nl AS DOUBLE))
                  * (CAST(nl - posl AS DOUBLE) / CAST(nl AS DOUBLE)))
              + CAST(nt - nl AS DOUBLE) * (1.0
                - (CAST(post - posl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
                  * (CAST(post - posl AS DOUBLE) / CAST(nt - nl AS DOUBLE))
                - (CAST((nt - nl) - (post - posl) AS DOUBLE) / CAST(nt - nl AS DOUBLE))
                  * (CAST((nt - nl) - (post - posl) AS DOUBLE) / CAST(nt - nl AS DOUBLE))))
             / CAST(nt AS DOUBLE) AS gini
      FROM c WHERE nl < nt
    )
    SELECT CAST(bin AS BIGINT) AS split_bin,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right, gini
    FROM (SELECT *, row_number() OVER (ORDER BY gini, bin) AS rn FROM g)
    WHERE rn = 1
    """,
    tags=("analytics", "ml", "tree", "statistics"),
)
def gini_best_split_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-tree node split finding by the HISTOGRAM method — the
    distributed primitive inside XGBoost/LightGBM: bin the feature
    (o_totalprice, 64 equal-width bins), build one (n, positives)
    histogram in a single map-side-partial aggregate, then evaluate
    weighted Gini impurity for every candidate threshold from the
    cumulative histogram and take the argmin. The full-data pass is
    the histogram build only — 64 rows of two longs per partition
    shuffle; split evaluation runs on the 64-row frame. Label:
    o_orderpriority = '1-URGENT'.

    Cross-engine determinism: all counts exact integers; the Gini
    expression is the IDENTICAL fixed double tree in both engines
    (each op correctly rounded ⇒ identical values ⇒ identical
    argmin), ties broken on bin. Growing a full tree = recurse on the
    two partitions with the same query shape."""
    orders = load_table(spark, sf_dir, "orders")
    h = (
        orders.select(
            F.least(
                F.lit(_GINI_BINS - 1),
                F.expr(
                    f"cast(round(o_totalprice * 100) as bigint) div {_GINI_BIN_CENTS}"
                ),
            ).alias("bin"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("p"),
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("p").cast("long").alias("pos"))
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    c = h.select(
        "bin",
        F.sum("n").over(wcum).alias("nl"),
        F.sum("pos").over(wcum).alias("posl"),
        F.sum("n").over(wall).alias("nt"),
        F.sum("pos").over(wall).alias("post"),
    ).filter(F.col("nl") < F.col("nt"))
    d = lambda c_: c_.cast("double")  # noqa: E731
    nl, posl = F.col("nl"), F.col("posl")
    nr = F.col("nt") - nl
    posr = F.col("post") - posl
    gini = (
        d(nl)
        * (
            F.lit(1.0)
            - (d(posl) / d(nl)) * (d(posl) / d(nl))
            - (d(nl - posl) / d(nl)) * (d(nl - posl) / d(nl))
        )
        + d(nr)
        * (
            F.lit(1.0)
            - (d(posr) / d(nr)) * (d(posr) / d(nr))
            - (d(nr - posr) / d(nr)) * (d(nr - posr) / d(nr))
        )
    ) / d(F.col("nt"))
    g = c.select("bin", "nl", nr.alias("nr"), gini.alias("gini"))
    wbest = Window.orderBy("gini", "bin")
    return (
        g.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .select(
            F.col("bin").cast("long").alias("split_bin"),
            F.col("nl").cast("long").alias("n_left"),
            F.col("nr").cast("long").alias("n_right"),
            "gini",
        )
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding (categorical feature engineering)
# ---------------------------------------------------------------------------


@register(
    "target_encode_nation",
    oracle="""
    WITH lab AS (
      SELECT c.c_nationkey, o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    g AS (
      SELECT c_nationkey,
             SUM(CAST(cents AS HUGEINT)) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lab GROUP BY 1
    )
    SELECT l.o_orderkey,
           l.c_nationkey AS nationkey,
           CASE WHEN g.n > 1
                THEN CAST(g.s - l.cents AS DOUBLE) / CAST(g.n - 1 AS DOUBLE) / 100.0
           END AS loo_mean_price
    FROM lab l JOIN g ON g.c_nationkey = l.c_nationkey
    """,
    tags=("analytics", "ml", "encoding", "aggregate"),
)
def target_encode_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the categorical-feature
    primitive for gradient-boosted models: each order's nation is
    encoded as the mean target (order value) of OTHER orders from the
    same nation, (Σ − x)/(n − 1), which kills the self-leakage a plain
    group mean injects. Exact integer sums make the encoding
    deterministic; the single division per row is the only float op.

    Plan: one hash aggregate to per-nation (Σ, n) — 25 rows —
    broadcast back over the fact scan; the encode itself is a codegen
    projection. At 100 TB this is one map-side-partial pass plus a
    broadcast join: the standard one-scan target-encoding job, with
    smoothing/priors added in the same projection if needed."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    lab = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey",
        "c_nationkey",
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
    )
    g = lab.groupBy("c_nationkey").agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return lab.join(F.broadcast(g), "c_nationkey").select(
        "o_orderkey",
        F.col("c_nationkey").alias("nationkey"),
        F.when(
            F.col("n") > 1,
            (F.col("s") - F.col("cents")).cast("double")
            / (F.col("n") - 1).cast("double")
            / 100.0,
        ).alias("loo_mean_price"),
    )


# ---------------------------------------------------------------------------
# Survival analysis: churn risk table
# ---------------------------------------------------------------------------


@register(
    "survival_risk_table",
    oracle=f"""
    WITH lifespans AS (
      SELECT user_id,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 86400000000 AS life_days
      FROM {EVENTS_NORM} GROUP BY user_id
    ),
    ev AS (
      SELECT life_days AS t, CAST(COUNT(*) AS BIGINT) AS d
      FROM lifespans GROUP BY 1
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lifespans)
    SELECT t, d,
           CAST((SELECT n FROM total)
             - COALESCE(SUM(d) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS n_risk,
           CAST(d AS DOUBLE)
             / CAST((SELECT n FROM total)
                    - COALESCE(SUM(d) OVER (ORDER BY t
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS DOUBLE) AS hazard
    FROM ev
    """,
    tags=("analytics", "survival", "timeseries", "statistics"),
)
def survival_risk_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival-analysis risk table over user lifetimes (days between
    first and last observed event): for each distinct lifetime t, the
    number of churn events d, the at-risk population n_risk (users
    whose lifetime reached t), and the hazard d/n_risk — the
    Kaplan-Meier ingredient table (the survival curve itself is the
    running product Π(1−hazard), left to the consumer because
    cumulative float products are order-sensitive; every column HERE
    is exact integers plus one division). Plan: one user aggregate,
    one tiny lifetime histogram, one cumulative window over it."""
    ev = load_table(spark, sf_dir, "events")
    lifespans = ev.groupBy("user_id").agg(
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("life_days")
    )
    evt = lifespans.groupBy(F.col("life_days").alias("t")).agg(
        F.count(F.lit(1)).alias("d")
    )
    n_total = lifespans.count()
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = F.lit(n_total) - F.coalesce(F.sum("d").over(w), F.lit(0))
    return evt.select(
        "t",
        "d",
        risk.alias("n_risk"),
        (F.col("d").cast("double") / risk.cast("double")).alias("hazard"),
    )


# ---------------------------------------------------------------------------
# A/B experiment analysis (two-sample z from exact moments)
# ---------------------------------------------------------------------------


@register(
    "ab_test_purchase_value",
    oracle=f"""
    WITH assigned AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM {EVENTS_NORM} WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT arm,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(cents AS HUGEINT)) AS DOUBLE) AS s,
             CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE) AS ss
      FROM assigned GROUP BY arm
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 'control' THEN n END) AS nc,
        MAX(CASE WHEN arm = 'control' THEN s END) AS sc,
        MAX(CASE WHEN arm = 'control' THEN ss END) AS ssc,
        MAX(CASE WHEN arm = 'treatment' THEN n END) AS nt,
        MAX(CASE WHEN arm = 'treatment' THEN s END) AS st,
        MAX(CASE WHEN arm = 'treatment' THEN ss END) AS sst
      FROM m
    )
    SELECT CAST(nc AS BIGINT) AS n_control, CAST(nt AS BIGINT) AS n_treatment,
           sc / nc / 100.0 AS mean_control,
           st / nt / 100.0 AS mean_treatment,
           (st / nt - sc / nc) / 100.0 AS lift,
           (st / nt - sc / nc)
             / sqrt((ssc / nc - (sc / nc) * (sc / nc)) / nc
                    + (sst / nt - (st / nt) * (st / nt)) / nt) AS z_score
    FROM wide
    """,
    tags=("analytics", "statistics", "experimentation"),
)
def ab_test_purchase_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-split into control/treatment
    arms (even/odd id — production uses the md5 split rule of
    stratified_split), compared on mean purchase value with a
    two-sample z statistic computed from EXACT integer moments — the
    same mergeable (n, Σ, Σx²) shape as corr/OLS, so the whole
    readout is one map-side-partial aggregate + a 2-row pivot, and
    the z expression is a fixed IEEE double tree (bit-identical
    cross-engine, unlike built-in stddev's running accumulation).
    Consumers compare |z| to their critical value; the moments are
    emitted via the means so sequential/peeking corrections can be
    applied downstream."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    assigned = ev.select(
        F.when(F.col("user_id") % 2 == 0, "control").otherwise("treatment").alias("arm"),
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
    )
    dec = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    m = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.col("cents")).alias("s"),
        dec(F.col("cents") * F.col("cents")).alias("ss"),
    )
    wide = m.agg(
        F.max(F.when(F.col("arm") == "control", F.col("n"))).alias("nc"),
        F.max(F.when(F.col("arm") == "control", F.col("s"))).alias("sc"),
        F.max(F.when(F.col("arm") == "control", F.col("ss"))).alias("ssc"),
        F.max(F.when(F.col("arm") == "treatment", F.col("n"))).alias("nt"),
        F.max(F.when(F.col("arm") == "treatment", F.col("s"))).alias("st"),
        F.max(F.when(F.col("arm") == "treatment", F.col("ss"))).alias("sst"),
    )
    nc, sc, ssc = F.col("nc"), F.col("sc"), F.col("ssc")
    nt, st, sst = F.col("nt"), F.col("st"), F.col("sst")
    diff = st / nt - sc / nc
    return wide.select(
        nc.cast("long").alias("n_control"),
        nt.cast("long").alias("n_treatment"),
        (sc / nc / F.lit(100.0)).alias("mean_control"),
        (st / nt / F.lit(100.0)).alias("mean_treatment"),
        (diff / F.lit(100.0)).alias("lift"),
        (
            diff
            / F.sqrt(
                (ssc / nc - (sc / nc) * (sc / nc)) / nc
                + (sst / nt - (st / nt) * (st / nt)) / nt
            )
        ).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend, Benford audit, HHI concentration
# ---------------------------------------------------------------------------

# Median over a ranked CTE `ranked(v, rn, n)`: pick the middle row (odd
# n) or the two middle rows (even n) and use the (lo+hi)*0.5 sum form —
# NOT lo + (hi-lo)*0.5, which differs in the last ulp (see verify
# skill). SUM over ≤2 doubles is commutative → order-independent.
_SQL_MEDIAN_FROM_RANKED = (
    "SELECT CASE WHEN MAX(n) % 2 = 1 THEN SUM(v) ELSE SUM(v) * 0.5 END AS med"
    " FROM ranked WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2"
)


@register(
    "theil_sen_hourly_trend",
    oracle=f"""
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS x,
             CAST(SUM(CAST(round(value * 100) AS HUGEINT)) AS DOUBLE) / 100.0 AS y
      FROM {EVENTS_NORM} GROUP BY 1
    ),
    slopes AS (
      SELECT (b.y - a.y) / CAST(b.x - a.x AS DOUBLE) AS v
      FROM hourly a JOIN hourly b ON b.x > a.x
    ),
    ranked AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n
      FROM slopes
    ),
    med AS ({_SQL_MEDIAN_FROM_RANKED}),
    resid AS (
      SELECT hourly.y - med.med * CAST(hourly.x AS DOUBLE) AS v FROM hourly, med
    ),
    rranked AS (
      SELECT v, row_number() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n
      FROM resid
    ),
    imed AS (SELECT CASE WHEN MAX(n) % 2 = 1 THEN SUM(v) ELSE SUM(v) * 0.5 END AS med
             FROM rranked WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM hourly) AS n_points,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM slopes) AS n_pairs,
           med.med AS slope_per_hour,
           imed.med AS intercept
    FROM med, imed
    """,
    tags=("timeseries", "robust", "analytics"),
)
def theil_sen_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend over the hourly revenue series: the
    median of all pairwise slopes (y_j−y_i)/(x_j−x_i), plus the median
    intercept — the outlier-resistant alternative to the closed-form
    OLS in ols_trend_hourly_value. Hourly sums use the exact
    fixed-point pattern; each slope is one double subtraction +
    division (deterministic); both medians use the (lo+hi)·0.5 rule on
    row_number-ranked values, so the result is bit-identical to the
    oracle's replay.

    Scale shape: the raw scan collapses to one row per HOUR before
    anything quadratic happens — the pairwise self-join is O(h²) on
    h = series length (720 rows/month), never on event rows. The
    global rank of h²/2 slopes is a single-partition sort of a small
    derived table (~260k rows for a month of hours); at longer
    horizons switch the median to the mergeable histogram sketch
    (quantile_histogram_sketch) — documented tradeoff, same API."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            (F.unix_timestamp(F.date_trunc("hour", F.col("ts"))) / F.lit(3600))
            .cast("long")
            .alias("x")
        )
        .agg(
            (F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).cast("double") / F.lit(100.0)).alias("y")
        )
    )
    hourly = hourly.localCheckpoint(eager=True)  # tiny per-hour frame, feeds slopes a/b + residuals + count
    a, b = hourly.alias("a"), hourly.alias("b")
    slopes = a.join(b, F.col("b.x") > F.col("a.x")).select(
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.x") - F.col("a.x")).cast("double")).alias("v")
    )

    def _median(df: DataFrame) -> DataFrame:
        w = Window.orderBy("v")
        ranked = df.select(
            "v",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
        )
        mid = ranked.filter(
            (F.col("rn") == F.expr("(n + 1) div 2")) | (F.col("rn") == F.expr("(n + 2) div 2"))
        )
        return mid.agg(
            F.when(F.max("n") % 2 == 1, F.sum("v")).otherwise(F.sum("v") * 0.5).alias("med")
        )

    slope = _median(slopes)
    n_points = hourly.count()
    n_pairs = n_points * (n_points - 1) // 2
    resid = hourly.crossJoin(F.broadcast(slope)).select(
        (F.col("y") - F.col("med") * F.col("x").cast("double")).alias("v")
    )
    intercept = _median(resid).withColumnRenamed("med", "intercept")
    return (
        slope.withColumnRenamed("med", "slope_per_hour")
        .crossJoin(intercept)
        .select(
            F.lit(n_points).cast("long").alias("n_points"),
            F.lit(n_pairs).cast("long").alias("n_pairs"),
            "slope_per_hour",
            "intercept",
        )
    )


# log10(1 + 1/d) rounded to 10 decimals, hardcoded identically in both
# engines so no log() is evaluated at query time.
_BENFORD = {
    1: 0.3010299957, 2: 0.1760912591, 3: 0.1249387366, 4: 0.0969100130,
    5: 0.0791812460, 6: 0.0669467896, 7: 0.0579919470, 8: 0.0511525224,
    9: 0.0457574906,
}


@register(
    "benford_first_digit_audit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    counts AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
    ),
    expected AS (
      SELECT * FROM (VALUES
        {", ".join(f"({d}, CAST('{p}' AS DOUBLE))" for d, p in _BENFORD.items())}
      ) AS t(digit, expected_frac)
    )
    SELECT e.digit, coalesce(c.n, 0) AS n,
           CAST(coalesce(c.n, 0) AS DOUBLE)
             / (SELECT CAST(SUM(n) AS DOUBLE) FROM counts) AS observed_frac,
           e.expected_frac,
           CAST(coalesce(c.n, 0) AS DOUBLE)
             / (SELECT CAST(SUM(n) AS DOUBLE) FROM counts) - e.expected_frac
             AS deviation
    FROM expected e LEFT JOIN counts c ON e.digit = c.digit
    """,
    tags=("quality", "audit", "analytics"),
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of order totals — a
    fraud/synthetic-data smell test. The digit is extracted from the
    STRING form of the exact cents integer (no log10 at query time;
    the expected frequencies are shared hardcoded constants), so
    counts are exact and the two divisions are deterministic.

    Scale shape: map-side digit projection + a 9-group aggregate —
    bytes shuffled are O(9 × partitions) regardless of table size."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = orders.select(
        F.substring(F.round(F.col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
        .cast("long")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = counts.agg(F.sum("n").cast("double").alias("tot"))
    expected = counts.sparkSession.createDataFrame(
        [(d, p) for d, p in _BENFORD.items()], "digit long, expected_frac double"
    )
    return (
        expected.join(counts, "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
            (F.coalesce("n", F.lit(0).cast("long")).cast("double") / F.col("tot")).alias("observed_frac"),
            "expected_frac",
            (
                F.coalesce("n", F.lit(0).cast("long")).cast("double") / F.col("tot")
                - F.col("expected_frac")
            ).alias("deviation"),
        )
    )


@register(
    "hhi_revenue_concentration",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation, l.l_suppkey AS suppkey,
             SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS HUGEINT))
               AS rev_units
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ),
    agg AS (
      SELECT nation,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             SUM(rev_units * rev_units) AS sumsq,
             SUM(rev_units) AS tot
      FROM rev GROUP BY nation
    )
    SELECT nation, n_suppliers,
           CAST(sumsq AS DOUBLE) / (CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE)) AS hhi,
           1.0 / CAST(n_suppliers AS DOUBLE) AS hhi_floor
    FROM agg
    """,
    tags=("analytics", "concentration"),
)
def hhi_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman revenue-concentration index per supplier
    nation: Σ share², computed as Σ units² / (Σ units)² over exact
    fixed-point revenue units — one double division at the end, so no
    per-share float sums to drift. hhi_floor = 1/n is the perfectly
    competitive bound for reference.

    Scale shape: lineitem joins the two small dims as broadcasts, one
    shuffle keyed (nation, suppkey) with map-side partials, then a
    tiny per-nation reduce. units² stays in decimal(38,0)/HUGEINT —
    a long would overflow at 100 TB revenue scales."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)
                .cast("decimal(38,0)")
            ).alias("rev_units")
        )
    )
    agg = rev.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.sum(F.col("rev_units") * F.col("rev_units")).alias("sumsq"),
        F.sum("rev_units").alias("tot"),
    )
    return agg.select(
        "nation",
        "n_suppliers",
        (F.col("sumsq").cast("double") / (F.col("tot").cast("double") * F.col("tot").cast("double"))).alias("hhi"),
        (F.lit(1.0) / F.col("n_suppliers").cast("double")).alias("hhi_floor"),
    )


# ---------------------------------------------------------------------------
# exact distinct counting via integer bitmaps (ClickHouse groupBitmap /
# Druid bitmap-index pattern; reference has only HashTable state —
# arcon/arcon_state/src/index/hash_table — never a distinct operator)
# ---------------------------------------------------------------------------

_BMP_BITS = 63  # stay off the sign bit: 1<<63 differs under two's-complement ops


@register(
    "bitmap_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
           CAST(COUNT(DISTINCT (user_id - ((user_id % 63 + 63) % 63)) // 63)
                AS BIGINT) AS n_buckets
    FROM events
    GROUP BY event_type
    """,
    tags=("analytics", "sketch", "distinct", "survey2.6"),
)
def bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct users per event_type computed through integer
    bitmaps, the OLAP engine technique (ClickHouse groupBitmap,
    Druid/Pinot bitmap indexes): bit = pmod(user_id, 63) (floor-mod),
    bucket = (user_id - bit) div 63 — exact floor division, so the
    (bucket, bit) map is injective for NEGATIVE ids too (a truncating
    `div` paired with pmod would collide -5 with 58); per-(type,
    bucket) `bit_or(1 << bit)` collapses up to 63 users into ONE
    long, then distinct = Σ bit_count(bitmap).

    Why this survives 100 TB where COUNT(DISTINCT) struggles: the
    bit_or partial aggregate is mergeable and map-side combinable, so
    each task emits at most |types|×|local buckets| longs instead of
    the full distinct user set — a dense-id population shrinks the
    exchange ~63× vs the expand-deduplicate plan, and the final merge
    is pure OR (associative, no rehash). The oracle computes the same
    numbers with plain COUNT(DISTINCT): the hash-match proves the
    bitmap path is exact, not approximate (contrast kmv/hll variants).
    Every op (shiftleft, bit_or, bit_count) is JVM codegen — no UDF."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    bm = ev.groupBy(
        "event_type",
        F.expr(f"(user_id - pmod(user_id, {_BMP_BITS})) div {_BMP_BITS}").alias("bucket"),
    ).agg(
        F.expr(
            f"bit_or(shiftleft(1L, cast(pmod(user_id, {_BMP_BITS}) as int)))"
        ).alias("bitmap")
    )
    return bm.groupBy("event_type").agg(
        F.sum(F.expr("bit_count(bitmap)")).cast("long").alias("distinct_users"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
    )


@register(
    "pandas_udaf_trimmed_mean",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY event_type ORDER BY round(value * 100)) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS BIGINT) / 100.0 AS trimmed_mean,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM c
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type
    """,
    tags=("analytics", "udaf", "pandas", "survey2.6"),
)
def pandas_udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10 % trimmed mean of event value per type via a GROUPED_AGG
    pandas UDF — the custom-aggregator API surface (reference's
    Aggregator state: create/add/merge/result,
    arcon/arcon_state/src/index/aggregator) for HOLISTIC aggregates
    that built-in declarative aggs can't express.

    Trimming needs the sorted group (drop ⌊n/10⌋ from each end), so
    it is not partial-aggregable; the Arrow-batched GROUPED_AGG UDF is
    the right tool: one hash exchange on event_type, each group lands
    in a single Python worker as one numpy array, vectorized sort +
    slice + int64 sum. Exactness: values go to integer cents before
    summing (order-independent), the only float op is the final
    division — hash-matches the oracle's window-rank formulation.
    Ties inside the trim boundary are harmless: equal cents are
    interchangeable, the kept MULTISET is deterministic. At 100 TB
    group count (6 types) is tiny — pair with a salted two-level
    scheme only when a single group outgrows one worker's memory."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: `from __future__ import annotations`
    # turns the hints into strings pandas_udf cannot resolve here
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def trimmed_mean(cents):
        s = cents.sort_values().to_numpy()
        t = len(s) // 10
        kept = s[t : len(s) - t]
        return float(kept.sum()) / len(kept) / 100.0

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def trimmed_n(cents):
        n = len(cents)
        return n - 2 * (n // 10)

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return ev.groupBy("event_type").agg(
        trimmed_mean("cents").alias("trimmed_mean"),
        trimmed_n("cents").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# exact global quantile by two-phase selection (histogram descent) —
# the O(bins)-memory exact alternative to sorting 100 TB or buffering
# appender windows
# ---------------------------------------------------------------------------

_SEL_BIN = 400  # cents per coarse bin (matches quantile_histogram_sketch)


@register(
    "exact_median_selection",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ),
    ranked AS (
      SELECT event_type, cents,
             row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM c
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN cents ELSE 0 END)
                + SUM(CASE WHEN rn = n // 2 + 1 THEN cents ELSE 0 END) AS DOUBLE)
             / 2.0 / 100.0 AS median_value,
           CAST(MAX(n) AS BIGINT) AS n
    FROM ranked GROUP BY event_type
    """,
    tags=("analytics", "quantile", "selection", "survey2.6"),
)
def exact_median_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT median per event_type by two-phase selection instead of
    sort-or-buffer: phase 1 aggregates a coarse 400-cent histogram
    (O(bins) state, map-side combinable); phase 2 rescans ONLY the
    rows of the bin(s) containing ranks ⌈n/2⌉ and ⌊n/2⌋+1, sorts that
    sliver, and picks the two order statistics ((lo+hi)*0.5, the
    cross-engine-pinned midpoint form). The full data is never
    globally sorted and never buffered per group — the selection
    plan an exact-quantile job at 100 TB must use (two scans, each
    whole-stage codegen; the second scan's bin predicate could push
    down to a min/max-indexed layout and skip most files outright).

    Contrast: appender_window_median buffers whole groups (reference's
    AppenderWindow, arcon/src/stream/operator/window/appender.rs);
    quantile_histogram_sketch trades exactness for one pass. This op
    completes the triangle — exact AND bounded-memory, at the price of
    a second (pruned) scan. The oracle computes the same medians the
    classic way (global window rank)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    hist = (
        ev.groupBy("event_type", F.expr(f"cents div {_SEL_BIN}").alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type").orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        (F.sum("cnt").over(wcum) - F.col("cnt")).alias("below"),
        F.sum("cnt").over(wcum).alias("through"),
        F.sum("cnt").over(wall).alias("n"),
    )
    # target ranks (1-based): lo = (n+1) div 2, hi = n div 2 + 1
    lo_rank = F.expr("(n + 1) div 2")
    hi_rank = F.expr("n div 2 + 1")
    hit = cum.filter(
        ((lo_rank > F.col("below")) & (lo_rank <= F.col("through")))
        | ((hi_rank > F.col("below")) & (hi_rank <= F.col("through")))
    ).select("event_type", "bin", "below", "n")
    # phase 2: rescan only rows in the hit bins (tiny broadcast join),
    # rank within the sliver locally, offset by `below`
    evb = ev.select(
        F.col("event_type").alias("et"), "cents",
        F.expr(f"cents div {_SEL_BIN}").alias("cbin"),
    )
    sliver = evb.join(
        F.broadcast(hit),
        (evb.et == hit.event_type) & (evb.cbin == hit.bin),
    ).select(F.col("et").alias("event_type"), "cents", "below", "n")
    # rows from two adjacent hit bins can coexist (empty bins between
    # them hold no rows, so ranks stay contiguous); global rank =
    # local rank over the union sliver + min(below) of the lowest bin
    base = sliver.groupBy("event_type").agg(F.min("below").alias("base"))
    ranked = (
        sliver.join(F.broadcast(base), "event_type")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("event_type").orderBy("cents"))
            + F.col("base"),
        )
    )
    picked = ranked.filter(
        (F.col("rn") == lo_rank) | (F.col("rn") == hi_rank)
    )
    return picked.groupBy("event_type").agg(
        (
            (
                F.sum(F.when(F.col("rn") == lo_rank, F.col("cents")).otherwise(0))
                + F.sum(F.when(F.col("rn") == hi_rank, F.col("cents")).otherwise(0))
            ).cast("double")
            / 2.0
            / 100.0
        ).alias("median_value"),
        F.max("n").cast("long").alias("n"),
    )


# ---------------------------------------------------------------------------
# distribution drift monitoring — integer-exact chi-squared between epochs
# ---------------------------------------------------------------------------

_DRIFT_BIN = 800  # cents per bin (~16 bins over the value range)
_DRIFT_SCALE = 1_000_000


@register(
    "distribution_drift_chi2",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, event_id % 2 AS epoch,
             LEAST(15, CAST(round(value * 100) AS BIGINT) // {_DRIFT_BIN}) AS bin
      FROM events
    ),
    bins AS (
      SELECT event_type, bin,
             SUM(CASE WHEN epoch = 0 THEN 1 ELSE 0 END) AS o0,
             SUM(CASE WHEN epoch = 1 THEN 1 ELSE 0 END) AS o1
      FROM tagged GROUP BY event_type, bin
    ),
    tot AS (
      SELECT event_type, SUM(o0) AS n0, SUM(o1) AS n1
      FROM bins GROUP BY event_type
    )
    SELECT b.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM((b.o1 * t.n0 - b.o0 * t.n1) * (b.o1 * t.n0 - b.o0 * t.n1)
                    * {_DRIFT_SCALE}
                    // ((b.o0 + b.o1) * t.n0 * t.n1)) AS BIGINT) AS drift_units
    FROM bins b JOIN tot t ON t.event_type = b.event_type
    GROUP BY b.event_type
    """,
    tags=("analytics", "drift", "quality", "monitoring"),
)
def distribution_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: a two-sample chi-squared statistic
    between two epochs of the value distribution (epoch = event_id
    parity standing in for yesterday/today), per event_type, computed
    ENTIRELY in integer arithmetic: with per-bin counts o0/o1 and
    totals n0/n1, each bin contributes
    (o1·n0 − o0·n1)²·10⁶ div ((o0+o1)·n0·n1) — the standard two-sample
    χ² term scaled to fixed-point, floor-divided so every engine and
    every summation order produces the identical long. (A float χ²'s
    per-bin divisions would be order-sensitive across 1000 executors.)

    Scale shape: one scan → (type, bin) hash agg (map-side partials;
    ≤16 bins × types rows cross the wire) → broadcast totals join →
    per-type reduce. This is the drift tripwire a training-data
    pipeline runs between ingestion batches — pair with
    dq_expectations_orders for schema-level checks and alert when
    drift_units jumps. Python-free, whole-stage codegen throughout."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("event_id") % 2).alias("epoch"),
        F.least(
            F.lit(15), F.expr(f"cast(round(value * 100) as bigint) div {_DRIFT_BIN}")
        ).alias("bin"),
    )
    bins = ev.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("epoch") == 0, 1).otherwise(0)).alias("o0"),
        F.sum(F.when(F.col("epoch") == 1, 1).otherwise(0)).alias("o1"),
    )
    tot = bins.groupBy("event_type").agg(
        F.sum("o0").alias("n0"), F.sum("o1").alias("n1")
    )
    j = bins.join(F.broadcast(tot), "event_type")
    num = (F.col("o1") * F.col("n0") - F.col("o0") * F.col("n1"))
    term = F.expr(
        f"((o1 * n0 - o0 * n1) * (o1 * n0 - o0 * n1) * {_DRIFT_SCALE})"
        f" div ((o0 + o1) * n0 * n1)"
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(term).cast("long").alias("drift_units"),
    )


@register(
    "sequence_gap_report",
    oracle="""
    WITH k AS (SELECT o_orderkey AS id FROM orders WHERE o_orderkey % 7 <> 0),
    ordered AS (
      SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM k
    )
    SELECT id + 1 AS gap_start, nxt - 1 AS gap_end,
           CAST(nxt - id - 1 AS BIGINT) AS missing
    FROM ordered
    WHERE nxt IS NOT NULL AND nxt - id > 1
    """,
    tags=("maintenance", "quality", "sequence"),
)
def sequence_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-continuity audit: every gap in the o_orderkey key space
    as (gap_start, gap_end, missing) — the completeness check for
    ingest pipelines fed by monotonically-keyed upstreams (Kafka
    offsets, CDC LSNs, invoice numbers), where a gap means data loss
    or an unfinished backfill. (The audited feed drops every 7th key
    to simulate loss — the synthetic key space is otherwise gapless,
    which would make the report trivially empty.)

    Plan: ids only (column-pruned scan) → SHARDED lead(1), not a global
    window. Ids are range-sharded by `id div 2^14` (shard order ≡ id
    order), lead() runs inside each shard's hash partition, and the
    one missing successor per shard (its max row) is stitched from a
    per-shard (min, max) aggregate — a #shards-row frame whose global
    lead(min) is broadcast back. The only total order in the plan is
    over that bounded aggregate, never over the id column itself, so
    there is no single-partition collapse at any corpus size. Gap
    lists are exact integers, trivially oracle-matched."""
    shard_w = 1 << 14
    k = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 7 != 0)
        .select(F.col("o_orderkey").alias("id"))
        .withColumn("shard", F.expr(f"id div {shard_w}"))
    )
    wl = Window.partitionBy("shard").orderBy("id")
    local = k.withColumn("nxt_local", F.lead("id").over(wl))
    # boundary stitch: one (min, max) row per non-empty shard; the tiny
    # global lead skips empty shards for free
    bounds = k.groupBy("shard").agg(F.min("id").alias("mn"))
    stitch = bounds.select(
        "shard", F.lead("mn").over(Window.orderBy("shard")).alias("next_mn")
    )
    return (
        local.join(F.broadcast(stitch), "shard", "left")
        .withColumn("nxt", F.coalesce("nxt_local", "next_mn"))
        .filter(F.col("nxt").isNotNull() & (F.col("nxt") - F.col("id") > 1))
        .select(
            (F.col("id") + 1).alias("gap_start"),
            (F.col("nxt") - 1).alias("gap_end"),
            (F.col("nxt") - F.col("id") - 1).cast("long").alias("missing"),
        )
    )


@register(
    "diff_in_diff_events",
    oracle=f"""
    WITH cells AS (
      SELECT event_type,
             user_id % 2 AS treated,
             CASE WHEN epoch_us(ts) >= (SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2
                              FROM (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events))
                  THEN 1 ELSE 0 END AS post,
             SUM(CAST(round(value * 100) AS HUGEINT)) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM {EVENTS_NORM}
      GROUP BY 1, 2, 3
    ),
    means AS (
      SELECT event_type, treated, post,
             CAST(cents AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS m
      FROM cells
    )
    SELECT event_type,
           MAX(CASE WHEN treated = 1 AND post = 1 THEN m END) AS t_post,
           MAX(CASE WHEN treated = 1 AND post = 0 THEN m END) AS t_pre,
           MAX(CASE WHEN treated = 0 AND post = 1 THEN m END) AS c_post,
           MAX(CASE WHEN treated = 0 AND post = 0 THEN m END) AS c_pre,
           (MAX(CASE WHEN treated = 1 AND post = 1 THEN m END)
            - MAX(CASE WHEN treated = 1 AND post = 0 THEN m END))
           - (MAX(CASE WHEN treated = 0 AND post = 1 THEN m END)
              - MAX(CASE WHEN treated = 0 AND post = 0 THEN m END)) AS did
    FROM means GROUP BY event_type
    """,
    tags=("analytics", "statistics", "experimentation", "causal"),
)
def diff_in_diff_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator per event_type: treatment =
    user_id parity, intervention point = the time-range midpoint, and
    DiD = (T̄post − T̄pre) − (C̄post − C̄pre) — the panel-data causal
    baseline one step past ab_test_purchase_value's single contrast
    (DiD nets out both group-level and period-level confounds).

    Exactness discipline: the four cell means come from integer-cent
    sums (order-invariant); each mean is one double division; the DiD
    is the same ±-tree in both engines, so even the float columns
    hash-match. Plan: midpoint = one broadcast 1-row aggregate; cells
    = ONE scan + one (type,treated,post) hash agg (≤ 4·|types| rows
    cross the wire); the pivot is a tiny conditional-MAX reduce. At
    100 TB, this is a single-pass job — per-user panel regressions
    with covariates would instead go through the target-encoding /
    OLS machinery already registered."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id", "ts", "value")
    bounds = ev.agg(
        F.min("ts").alias("tmin"), F.max("ts").alias("tmax")
    ).select(
        F.expr("timestamp_micros((unix_micros(tmin) + unix_micros(tmax)) div 2)").alias("mid")
    )
    cells = (
        ev.join(F.broadcast(bounds))
        .groupBy(
            "event_type",
            (F.col("user_id") % 2).alias("treated"),
            F.when(F.col("ts") >= F.col("mid"), 1).otherwise(0).alias("post"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    m = (F.col("cents").cast("double") / 100.0 / F.col("n").cast("double"))
    means = cells.select("event_type", "treated", "post", m.alias("m"))

    def cell(t: int, p: int):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col("m"))
        )

    return means.groupBy("event_type").agg(
        cell(1, 1).alias("t_post"),
        cell(1, 0).alias("t_pre"),
        cell(0, 1).alias("c_post"),
        cell(0, 0).alias("c_pre"),
        ((cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0))).alias("did"),
    )


@register(
    "bitmap_audience_overlap",
    oracle="""
    WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
    p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT
      CAST((SELECT COUNT(*) FROM v JOIN p USING (user_id)) AS BIGINT) AS n_both,
      CAST((SELECT COUNT(*) FROM v) + (SELECT COUNT(*) FROM p)
           - (SELECT COUNT(*) FROM v JOIN p USING (user_id)) AS BIGINT) AS n_either,
      CAST((SELECT COUNT(*) FROM v WHERE user_id NOT IN (SELECT user_id FROM p))
           AS BIGINT) AS n_view_only,
      CAST((SELECT COUNT(*) FROM p WHERE user_id NOT IN (SELECT user_id FROM v))
           AS BIGINT) AS n_purchase_only
    """,
    tags=("analytics", "distinct", "sketch", "audience"),
)
def bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience set algebra — |view ∩ purchase|, union, and both
    differences over user sets — computed entirely in bitmap space:
    each audience collapses to (bucket → 63-bit bitmap) in one hash
    aggregate, the two bucket maps FULL-OUTER join on bucket (null →
    0), and every set operation is one bitwise op on aligned longs
    (AND, OR, AND-NOT) summed through bit_count.

    This is the exact-arithmetic twin of kmv_theta_intersection
    (which estimates the same intersection from two k-min sketches):
    bitmaps win whenever id density makes |audience|/63 longs cheaper
    than shipping distinct ids — the audience-segmentation engines
    (ClickHouse bitmapAnd/Or/AndnotCardinality, Druid) live on this
    plan. Exchange cost: 2×|buckets| rows regardless of audience
    size; set ops never touch raw ids again. The oracle computes the
    same four cardinalities relationally (joins + NOT IN)."""
    ev = load_table(spark, sf_dir, "events")

    def audience(event_type: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .groupBy(F.expr("(user_id - pmod(user_id, 63)) div 63").alias("bucket"))
            .agg(
                F.expr("bit_or(shiftleft(1L, cast(pmod(user_id, 63) as int)))").alias("bm")
            )
        )

    v = audience("view").withColumnRenamed("bm", "bm_v")
    p = audience("purchase").withColumnRenamed("bm", "bm_p")
    j = (
        v.join(p, "bucket", "full_outer")
        .select(
            F.coalesce("bm_v", F.lit(0)).alias("a"),
            F.coalesce("bm_p", F.lit(0)).alias("b"),
        )
    )
    return j.agg(
        F.sum(F.expr("bit_count(a & b)")).cast("long").alias("n_both"),
        F.sum(F.expr("bit_count(a | b)")).cast("long").alias("n_either"),
        F.sum(F.expr("bit_count(a & ~b)")).cast("long").alias("n_view_only"),
        F.sum(F.expr("bit_count(~a & b)")).cast("long").alias("n_purchase_only"),
    )


# ---------------------------------------------------------------------------
# time-series similarity search (cf. PAPERS.md: EDBT'19 streaming
# series similarity / ICDE'21 REPOSE top-k search — the
# normalize → norm-decompose → candidate-join → exact-verify shape)
# ---------------------------------------------------------------------------

_TSS_SCALE = 1_000_000  # per-mille-of-total fixed point for profiles
_TSS_K = 10

# shared oracle prefix: volume-normalized integer hour-of-day profile
# (the exact kernel and its SAX-blocked production variant must verify
# candidates against the IDENTICAL profile definition)
_TSS_PROF_SQL = f"""
    cents AS (
      SELECT user_id, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             SUM(CAST(round(value * 100) AS HUGEINT)) AS c
      FROM {{EVENTS}}
      GROUP BY 1, 2
    ),
    totals AS (SELECT user_id, SUM(c) AS tot FROM cents GROUP BY user_id),
    prof AS (
      SELECT c.user_id, c.hod,
             CAST(c.c * {_TSS_SCALE} // t.tot AS BIGINT) AS p
      FROM cents c JOIN totals t ON t.user_id = c.user_id
    )"""


def _tss_prof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer per-mille hour-of-day profile (user_id, hod, p) — the
    shared input of ts_similarity_topk and ts_similarity_topk_sax.
    Checkpointed: every consumer fans out from it (norms, both dot-join
    branches, the SAX word build), and the agg must run once."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.hour("ts").cast("long").alias("hod"),
        F.round(F.col("value") * 100).cast("decimal(38,0)").alias("c"),
    )
    cents = ev.groupBy("user_id", "hod").agg(F.sum("c").alias("c"))
    totals = cents.groupBy("user_id").agg(F.sum("c").alias("tot"))
    return (
        cents.join(F.broadcast(totals), "user_id")
        .select(
            "user_id", "hod",
            F.expr(f"cast(c * {_TSS_SCALE} div tot as bigint)").alias("p"),
        )
        .localCheckpoint(eager=True)
    )


def _tss_tile_topk(prof: DataFrame, n_users: int, words: DataFrame | None = None) -> DataFrame:
    """Block-tile exact top-{_TSS_K} kernel over dense 24-slot
    profiles (the house grid of dedup_embedding_cosine): one shuffle
    of (B+1)·users vectors, all dots as one int64 matmul per tile, and
    each tile emits only its own top-{_TSS_K} by (dist2, user_a,
    user_b) — a lossless prune for the global top-{_TSS_K}, which then
    sorts B(B+1)/2·{_TSS_K} candidate rows, not users². Profiles come
    from the shared dense-array builder (_tss_vecs): the 24-bit
    hod-presence mask enforces the oracle's shared-hod candidate
    contract (its dots CTE inner-joins on hod; p = c·SCALE div tot
    legitimately floors to 0, so p != 0 is NOT a valid shared-hod
    test).

    With `words` given (the SAX sign words), each tile ALSO restricts
    to the EXACT `_sax_candidates` pair set: the {_SAX_BANDS} band
    keys pack into int64s (positional radix over the symbol bytes) and
    band agreement is {_SAX_BANDS} vectorized equality outer-compares —
    so the SAX query's dense-corpus router branch returns the
    IDENTICAL result set at tile-matmul speed instead of a banded
    self-join + distinct + per-candidate zip_with (measured sf1
    twin-dense corpus: 255 s banded-verify vs 30 s exact tile,
    MEASURE.md r9; the candidate membership test inside the tile costs
    {_SAX_BANDS} n·m integer compares against an n·m 24-wide matmul)."""
    import numpy as np
    import pandas as pd

    vecs = _tss_vecs(prof)
    if words is not None:
        vecs = vecs.join(words, "user_id")
    _B = tile_grid_side(n_users)
    payload = ["user_id", "vec", "mask", "n2"] + (
        [] if words is None else ["word"]
    )
    blk = vecs.withColumn("blk", F.pmod(F.col("user_id"), F.lit(_B)).cast("int"))
    a_side = blk.select(
        F.col("blk").alias("pi"),
        F.explode(F.sequence(F.col("blk"), F.lit(_B - 1))).alias("pj"),
        F.lit("a").alias("side"),
        *payload,
    )
    b_side = blk.select(
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("pi"),
        F.col("blk").alias("pj"),
        F.lit("b").alias("side"),
        *payload,
    )
    grid = a_side.unionByName(b_side)
    use_words = words is not None

    def tile(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_a": [], "user_b": [], "dist2": []}).astype(
            {"user_a": "int64", "user_b": "int64", "dist2": "int64"}
        )
        pi, pj = int(key[0]), int(key[1])
        am = pdf["side"].to_numpy() == "a"
        ap, bp = pdf[am], pdf[~am]
        if ap.empty or bp.empty:
            return empty
        A = np.vstack(ap["vec"].to_numpy()).astype(np.int64)
        Bm = np.vstack(bp["vec"].to_numpy()).astype(np.int64)
        aid = ap["user_id"].to_numpy(dtype=np.int64)
        bid = bp["user_id"].to_numpy(dtype=np.int64)
        d2 = (
            ap["n2"].to_numpy(dtype=np.int64)[:, None]
            + bp["n2"].to_numpy(dtype=np.int64)[None, :]
            - 2 * (A @ Bm.T)
        )
        # diagonal tiles hold block pi on both sides: a<b dedupes;
        # off-diagonal sides are disjoint id sets, every pairing unique
        keep = (
            aid[:, None] < bid[None, :]
            if pi == pj
            else np.ones_like(d2, dtype=bool)
        )
        pa = ap["mask"].to_numpy(dtype=np.int64)
        pb = bp["mask"].to_numpy(dtype=np.int64)
        keep &= (pa[:, None] & pb[None, :]) > 0
        if use_words:
            radix = (256 ** np.arange(_SAX_BAND_W - 1, -1, -1)).astype(np.int64)
            wa = (
                np.frombuffer("".join(ap["word"]).encode("ascii"), dtype=np.uint8)
                .reshape(-1, _SAX_BANDS, _SAX_BAND_W)
                .astype(np.int64)
                @ radix
            )
            wb = (
                np.frombuffer("".join(bp["word"]).encode("ascii"), dtype=np.uint8)
                .reshape(-1, _SAX_BANDS, _SAX_BAND_W)
                .astype(np.int64)
                @ radix
            )
            agree = np.zeros_like(keep)
            for s in range(_SAX_BANDS):
                agree |= wa[:, s][:, None] == wb[:, s][None, :]
            keep &= agree
        ai, bi = np.nonzero(keep)
        out = pd.DataFrame(
            {
                "user_a": np.minimum(aid[ai], bid[bi]),
                "user_b": np.maximum(aid[ai], bid[bi]),
                "dist2": d2[ai, bi],
            }
        )
        return out.sort_values(["dist2", "user_a", "user_b"]).head(_TSS_K)

    cand = pin_groups(grid, "pi", "pj").groupBy("pi", "pj").applyInPandas(
        tile, "user_a long, user_b long, dist2 long"
    )
    return cand.orderBy("dist2", "user_a", "user_b").limit(_TSS_K)


@register(
    "ts_similarity_topk",
    oracle=f"""
    WITH {_TSS_PROF_SQL},
    norms AS (SELECT user_id, SUM(p * p) AS n2 FROM prof GROUP BY user_id),
    dots AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b, SUM(a.p * b.p) AS dot
      FROM prof a JOIN prof b ON a.hod = b.hod AND a.user_id < b.user_id
      GROUP BY 1, 2
    )
    SELECT user_a, user_b,
           CAST(na.n2 + nb.n2 - 2 * d.dot AS BIGINT) AS dist2
    FROM dots d
    JOIN norms na ON na.user_id = d.user_a
    JOIN norms nb ON nb.user_id = d.user_b
    QUALIFY row_number() OVER (ORDER BY na.n2 + nb.n2 - 2 * d.dot,
                               user_a, user_b) <= {_TSS_K}
    """.format(EVENTS=EVENTS_NORM),
    tags=("timeseries", "similarity", "topk", "retrieval"),
)
def ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search: the 10 most similar pairs of
    users by hour-of-day activity SHAPE. Each user's series is
    volume-normalized to an integer per-mille profile (cents_h·10⁶
    div total — shape, not size), and squared Euclidean distance
    decomposes as ‖a‖² + ‖b‖² − 2a·b: norms are per-user aggregates,
    dots come from ONE equi-join on the hour key — absent hours are
    implicit zeros that contribute nothing to the dot, so no
    densification (the same norm-decomposition that powers the
    embedding cosine dedup).

    The EDBT'19/REPOSE shape at 100 TB: the all-pairs dot join is the
    scale hazard (users² candidates); prune it by blocking on the SAX
    word of the profile (sax_symbolize_hourly is the registered
    symbolizer) and verifying only same-word candidates — this query
    IS the exact-verify stage of that pipeline. Distances stay int64
    end to end; ties totalized by (dist2, user_a, user_b)."""
    prof = _tss_prof(spark, sf_dir)
    # The hod equi-join caps at 24 distinct keys and shuffles
    # users²·24 pair rows into the pair aggregation (27M at sf0.1,
    # 19 s): each user's profile instead densifies to a 24-slot vector
    # (JVM-side, _tss_vecs — r10 moved the densify out of the pandas
    # tile) and the pair space runs as the shared block-tile kernel
    # (_tss_tile_topk). Grid side from the user count: one small job
    # on the checkpointed profile, so tile-pair memory stays bounded
    # at any corpus scale.
    return _tss_tile_topk(
        prof, prof.select("user_id").distinct().count()
    )


_SAX_W_SEG = 1  # profile-word PAA segment width (24 hourly segments)
_SAX_W_N = 24 // _SAX_W_SEG
_SAX_BANDS = 6  # LSH-style banding of the word: 6 bands x 4 symbols
_SAX_BAND_W = _SAX_W_N // _SAX_BANDS


def _sax_word_sql() -> str:
    """DuckDB word CTEs mirroring the Spark build below (kept adjacent
    so the two stay in lockstep)."""
    cols = " || ".join(
        f"chr(97 + COALESCE(MAX(CASE WHEN seg = {i} THEN code END), 0))"
        for i in range(_SAX_W_N)
    )
    return f"""
    seg AS (
      SELECT user_id, hod // {_SAX_W_SEG} AS seg, SUM(p) AS s
      FROM prof GROUP BY 1, 2
    ),
    sym AS (
      SELECT user_id, seg,
             CASE WHEN s * {_SAX_W_N} < {_TSS_SCALE} THEN 0 ELSE 1 END AS code
      FROM seg
    ),
    words AS (SELECT user_id, {cols} AS word FROM sym GROUP BY user_id),
    probes AS (
      SELECT user_id,
             u.slot AS slot,
             substr(word, u.slot * {_SAX_BAND_W} + 1, {_SAX_BAND_W}) AS probe
      FROM words, unnest(generate_series(0, {_SAX_BANDS - 1})) AS u(slot)
    )"""


def _tss_vecs(prof: DataFrame) -> DataFrame:
    """(user_id, vec, mask, n2): each profile densified once to a
    24-slot long array, a 24-bit hod-presence mask (p legitimately
    floors to 0, so p != 0 is NOT a valid shared-hod test — the exact
    kernel's tile learned this the hard way), and the squared norm.
    The verify stages of the SAX and radius variants both consume it:
    one row per user, dist2 per candidate is a single JVM
    zip_with/aggregate instead of a pair x hod join explosion."""
    return prof.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("hod", "p"))).alias("m"),
        F.sum(F.expr("shiftleft(1L, cast(hod as int))")).alias("mask"),
        F.sum(F.col("p") * F.col("p")).alias("n2"),
    ).select(
        "user_id",
        F.expr("transform(sequence(0, 23), h -> coalesce(m[h], 0L))").alias(
            "vec"
        ),
        "mask",
        "n2",
    )


def _sax_words(prof: DataFrame) -> DataFrame:
    """(user_id, word): the hourly sign word of a per-mille profile.
    Integer symbol codes, max-when pivoted per segment slot: codes
    stay INTEGER inside the hash aggregate (MAX(string) would demote
    it to SortAggregate — house plan guard), decoded to chars only in
    the final projection."""
    seg = prof.groupBy(
        "user_id", F.expr(f"hod div {_SAX_W_SEG}").alias("seg")
    ).agg(F.sum("p").alias("s"))
    code = F.when(F.col("s") * _SAX_W_N < F.lit(_TSS_SCALE), 0).otherwise(1)
    slots = [
        F.max(F.when(F.col("seg") == i, code)).alias(f"c{i}")
        for i in range(_SAX_W_N)
    ]
    return seg.groupBy("user_id").agg(*slots).select(
        "user_id",
        F.concat(
            *[
                F.expr(f"char(97 + coalesce(c{i}, 0))")
                for i in range(_SAX_W_N)
            ]
        ).alias("word"),
    )


def _sax_probes(words: DataFrame) -> DataFrame:
    """(user_id, slot, probe): each user's {_SAX_BANDS} band substrings
    of the sign word — the LSH band keys. Factored out of
    _sax_candidates so the router's candidate-count aggregate
    (_sax_router_stats) measures the REAL blocking keys."""
    return words.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(_SAX_BANDS - 1))).alias("slot"),
        "word",
    ).select(
        "user_id",
        "slot",
        F.expr(f"substr(word, slot * {_SAX_BAND_W} + 1, {_SAX_BAND_W})").alias(
            "probe"
        ),
    )


def _sax_router_stats(words: DataFrame) -> tuple[int, int]:
    """(n_users, upper_pairs) in ONE aggregate job over the band
    probes: upper_pairs = Σ_buckets C(n, 2) over every (slot, probe)
    bucket — an upper bound on the DISTINCT banded candidate count (a
    pair agreeing on several bands is counted once per band, so the
    bound overestimates by at most {_SAX_BANDS}×), and n_users rides
    the same job as the slot-0 bucket-size sum. Both drive the verify
    plan choice in ts_similarity_topk_sax; the n_users value also
    sizes the tile grid, so the dense branch adds no extra count job.
    Takes the CHECKPOINTED words frame (r11): the router and the chosen
    verify branch used to each rebuild the word aggregate pipeline —
    sharing one materialized build measured 2.07 → 1.81 s min at sf0.1,
    and the duplicate O(n) aggregate it removes grows with the
    corpus."""
    row = (
        _sax_probes(words)
        .groupBy("slot", "probe")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.expr("n * (n - 1) div 2")).alias("ub"),
            F.sum(F.when(F.col("slot") == 0, F.col("n")).otherwise(0)).alias(
                "nu"
            ),
        )
        .collect()[0]
    )
    return int(row["nu"] or 0), int(row["ub"] or 0)


#: verify-plan router threshold: the banded path costs ~120× more per
#: CANDIDATE than the tile matmul costs per PAIR (measured sf1:
#: 254.8 s zip_with-verify over 7.7M candidates vs 30 s tile kernel
#: over 112M pairs — MEASURE.md r9), so the tile wins once candidate
#: density exceeds ~1/120 of all pairs. Routed at 1/64 — conservative
#: 2× above break-even; _sax_router_stats' ≤6× overestimate can at
#: worst route a 1/384-density corpus to the tile, still within ~2×
#: of the banded plan there, while production-sparse corpora
#: (density ≪ 1%) keep the shuffle-light banded plan.
_TSS_DENSE_ROUTE = 64


def _sax_candidates(words: DataFrame) -> DataFrame:
    """(user_a, user_b) banded candidate pairs: users whose sign words
    agree on at least one of the {_SAX_BANDS} bands. Takes the words
    frame (checkpointed by the registered query so the build runs
    once). Shared by the registered query and the pigeonhole contract
    test (tests/test_analytics.py), so the test exercises the REAL
    blocking stage, not a re-derivation."""
    probes = _sax_probes(words)
    # DISTINCT is load-bearing: a pair agreeing on several bands
    # collides on each of them, and a duplicated candidate row would
    # multiply its prof rows through the dot join (dot counted once
    # per duplicate)
    return (
        probes.alias("a")
        .join(
            probes.alias("b"),
            (F.col("a.slot") == F.col("b.slot"))
            & (F.col("a.probe") == F.col("b.probe"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
        )
        .distinct()
    )


@register(
    "ts_similarity_topk_sax",
    oracle=f"""
    WITH {_TSS_PROF_SQL},
    {_sax_word_sql()},
    cand AS (
      SELECT DISTINCT a.user_id AS user_a, b.user_id AS user_b
      FROM probes a JOIN probes b
        ON a.slot = b.slot AND a.probe = b.probe
       AND a.user_id < b.user_id
    ),
    norms AS (SELECT user_id, SUM(p * p) AS n2 FROM prof GROUP BY user_id),
    dots AS (
      SELECT c.user_a, c.user_b, SUM(pa.p * pb.p) AS dot
      FROM cand c
      JOIN prof pa ON pa.user_id = c.user_a
      JOIN prof pb ON pb.user_id = c.user_b AND pb.hod = pa.hod
      GROUP BY 1, 2
    )
    SELECT user_a, user_b,
           CAST(na.n2 + nb.n2 - 2 * d.dot AS BIGINT) AS dist2
    FROM dots d
    JOIN norms na ON na.user_id = d.user_a
    JOIN norms nb ON nb.user_id = d.user_b
    QUALIFY row_number() OVER (ORDER BY na.n2 + nb.n2 - 2 * d.dot,
                               user_a, user_b) <= {_TSS_K}
    """.format(EVENTS=EVENTS_NORM),
    tags=("timeseries", "similarity", "topk", "retrieval", "sax"),
)
def ts_similarity_topk_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-blocked production variant of ts_similarity_topk: the
    symbolize → block → exact-verify pipeline run end to end as ONE
    query (VERDICT r8 #6 — previously the prune existed only as a
    docstring pointer to sax_symbolize_hourly).

    Blocking word: each user's per-mille profile is PAA-compressed to
    _SAX_W_N = 24 one-hour segment sums (_SAX_W_SEG = 1; the PAA stage
    is an identity pass-through at this width, kept so the segment
    width is a single tunable) and each segment discretized to the
    SIGN of its deviation from the user's OWN uniform share (s·24 vs
    total — classic SAX z-normalizes per-series; the integer analog
    needs NO global statistics, and absent segments read 'below').
    The sign word is the load-bearing design choice: a coarse
    value-bucket word degenerates on near-uniform profiles (measured
    at sf0.1: 73% of users shared one 4-segment tercile word, making
    "blocking" all-pairs), while deviation SIGNS split every position
    ~evenly by construction. The word is then BANDED exactly like the
    MinHash LSH pipeline (dedup_minhash_lsh_pairs): 6 bands of 4
    symbols, candidates = pairs agreeing on at least ONE full band.
    That carries a data-independent guarantee a wildcard probe cannot
    give at this radius: any pair with word-Hamming ≤ 5 shares a
    clean band (pigeonhole) and is always a candidate; pairs further
    apart survive with band-collision probability, the standard LSH
    taper. Each distinct candidate is verified EXACTLY — same integer
    norm-decomposition, same shared-hod contract (the dot inner
    join), same (dist2, user_a, user_b) total order — as the exact
    kernel.

    Scale shape (why this is the production structure): the word
    build is embarrassingly parallel per user (no window, no global
    quantile — symbols are integer compares against the user's own
    total), blocking is one equi-join on 6 band keys per user, and
    the verify join touches only banded pairs instead of scheduling
    the exact kernel's all-pairs tile matmul. Every operator is
    JVM-side whole-stage codegen (zero pandas). Bands/width are the
    LSH recall-vs-prune taper, swept on this corpus at sf0.1 (4-char
    bands): 4 bands → 80k candidates (7% of all pairs), recall 0.4;
    6 bands → 395k (35%), recall 0.9, k-th-distance ratio 1.006;
    8 bands → recall 1.0, no prune. 6 bands is registered. When the
    corpus's near-pair density is itself quadratic (the sf1 curve
    synthesizer plants ~45 profile twins per base user), candidate
    count ~ n²/buckets and a dense tile matmul over the SAME candidate
    set is the faster verify plan (measured sf1: 30 s tile vs 255 s
    banded join). r10 (VERDICT r9 #2): the query now ROUTES between
    the two verify plans itself — one cheap aggregate over the band
    buckets (_sax_router_stats: Σ C(bucket, 2), the quantity that
    decides the plan) picks the banded zip_with join when candidates
    are sparse (production corpora) and the band-filtered tile kernel
    (_tss_tile_topk with words — the membership test runs INSIDE the
    tile, so the candidate SET and therefore the result is identical)
    when density exceeds 1/{_TSS_DENSE_ROUTE} of all pairs; both
    branches are oracle-checked and their equality is pinned by
    tests/test_analytics.py. Quality is
    audited in tests/test_analytics.py on BOTH standard ANN metrics —
    top-10 set recall AND the k-th-distance ratio — because this
    synthetic corpus plants no near-dup user profiles (hour-of-day
    activity is i.i.d. noise around uniform, so the exact top-10 is a
    continuum of near-ties; the sign words of exact-top-10 pairs sit
    at Hamming 1-9). The pigeonhole guarantee (Hamming ≤ 5 ⇒
    candidate) is property-tested there too, cf. PAPERS.md
    EDBT'19/REPOSE."""
    prof = _tss_prof(spark, sf_dir)
    # ONE word build for router + verify branch (both consume it; the
    # house multi-consumer rule — r11, probe 2.07 → 1.81 s at sf0.1)
    words = _sax_words(prof).localCheckpoint(eager=True)
    n_users, upper = _sax_router_stats(words)
    if upper * _TSS_DENSE_ROUTE >= n_users * max(0, n_users - 1) // 2:
        # candidate-dense corpus: same candidate set, verified inside
        # the tile kernel (band agreement = 6 vectorized equality
        # compares per tile) — identical result, tile-matmul speed
        return _tss_tile_topk(prof, n_users, words=words)
    return _sax_banded_verify(prof, words)


def _sax_banded_verify(prof: DataFrame, words: DataFrame) -> DataFrame:
    """The sparse-corpus verify branch of ts_similarity_topk_sax: ONE
    row per banded candidate, not a pair x hod explosion. Each user's
    profile densifies to a 24-slot long array plus a 24-bit
    hod-presence mask (p = c*SCALE div tot legitimately floors to 0,
    so p != 0 is NOT a valid shared-hod test — same contract as the
    exact kernel's tile). dist2 is one JVM zip_with/aggregate over the
    two arrays; the mask intersect enforces the oracle's shared-hod
    candidate contract (its dots CTE is an inner join on hod). The
    first registered form verified through a (pair x shared-hod) equi
    join — at sf1's twin-dense corpus that exploded ~7.7M candidates
    x ~24 rows and read 500 s; this form carries the same candidates
    as single rows (r9 curve re-measure)."""
    cand = _sax_candidates(words)
    vecs = _tss_vecs(prof)
    va = vecs.select(
        F.col("user_id").alias("user_a"),
        F.col("vec").alias("vec_a"),
        F.col("mask").alias("mask_a"),
    )
    vb = vecs.select(
        F.col("user_id").alias("user_b"),
        F.col("vec").alias("vec_b"),
        F.col("mask").alias("mask_b"),
    )
    out = (
        cand.join(va, "user_a")
        .join(vb, "user_b")
        .filter((F.col("mask_a").bitwiseAND(F.col("mask_b"))) != 0)
        .select(
            "user_a",
            "user_b",
            F.expr(
                "aggregate(zip_with(vec_a, vec_b, (x, y) -> (x - y) * (x - y)),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("dist2"),
        )
    )
    return out.orderBy("dist2", "user_a", "user_b").limit(_TSS_K)


_TSS_RADIUS = 25_000_000_000  # sits between the closest-pair scale
# (~1e10 at sf0.1) and the no-shared-hod floor (~8e10), so the join is
# non-degenerate at every test SF without sweeping in the bulk
_TSS_RADIUS_BAND = 158117  # isqrt(_TSS_RADIUS) + 4 — see docstring
_TSS_RADIUS_SALT = 32  # band-join salt fan (reducer parallelism per band)


@register(
    "ts_similarity_radius_join",
    oracle=f"""
    WITH {_TSS_PROF_SQL},
    norms AS (SELECT user_id, SUM(p * p) AS n2 FROM prof GROUP BY user_id),
    dots AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b, SUM(a.p * b.p) AS dot
      FROM prof a JOIN prof b ON a.hod = b.hod AND a.user_id < b.user_id
      GROUP BY 1, 2
    )
    SELECT user_a, user_b,
           CAST(na.n2 + nb.n2 - 2 * d.dot AS BIGINT) AS dist2
    FROM dots d
    JOIN norms na ON na.user_id = d.user_a
    JOIN norms nb ON nb.user_id = d.user_b
    WHERE na.n2 + nb.n2 - 2 * d.dot <= {_TSS_RADIUS}
    """.format(EVENTS=EVENTS_NORM),
    tags=("timeseries", "similarity", "join", "radius"),
)
def ts_similarity_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 radius similarity self-join over user activity profiles: ALL
    pairs with dist2 <= 25e9 — the production primitive behind
    near-dup sweeps and similarity joins at 100 TB (a fixed radius,
    not a global top-k, is what dedup pipelines actually run).

    LOSSLESS norm-band pruning, unlike the SAX variant's lossy
    blocking: by the reverse triangle inequality,
    dist2(a,b) <= R  =>  |sqrt(n2_a) - sqrt(n2_b)| <= sqrt(R), so with
    s = floor(sqrt(n2)) and band = s div D for D = isqrt(R) + 4
    (+2 for the two floors, +2 slack for float sqrt rounding — sqrt
    itself is IEEE-correctly-rounded, the slack is pure paranoia),
    every qualifying pair sits in the same or an adjacent band. One
    side emits (band-1, band, band+1), the join key is the other
    side's band — each candidate pair matches EXACTLY once (the
    other side's band is a single value appearing once in the emitted
    set), so no distinct is needed. The band is physical only: the
    result set is decided by the exact integer dist2 <= R predicate,
    and the oracle is the plain all-pairs SQL with a WHERE — no
    approximation anywhere.

    Verify: one row per candidate via the shared dense-array builder
    (_tss_vecs) — dist2 is a single zip_with/aggregate, the
    hod-presence mask intersect keeps the oracle's shared-hod
    candidate contract (its dots CTE inner-joins on hod; at this R the
    predicate alone would exclude no-overlap pairs, whose dist2 floors
    near 8e10, but the contract stays explicit). Prune effectiveness
    is data-dependent and documented: on THIS corpus profiles cluster
    near the uniform norm so most users share a band (the audit in
    tests/test_analytics.py pins losslessness, not speedup); on real
    varied-volume data the norm spread is wide and the band join
    touches only a sliver. At 100 TB the same shape bucket-partitions
    by band."""
    prof = _tss_prof(spark, sf_dir)
    vecs = _tss_vecs(prof)
    D = _TSS_RADIUS_BAND
    banded = vecs.withColumn(
        "band",
        F.expr(f"cast(floor(sqrt(cast(n2 as double))) as bigint) div {D}"),
    )
    # SALTED band join: when the corpus's norms cluster (this data),
    # one band holds most users and an unsalted equi join runs its
    # whole pair space on ONE reducer (measured 11.5 s at sf0.1, a
    # single hot task). The b-side key gains pmod(user_b, S); the
    # a-side replicates each probe across the S salts — each pair
    # still matches exactly once, but the pair space fans across
    # S reducers per band. S is a parallelism constant (not
    # data-sized): it splits a key, not a memory-bound tile.
    S = _TSS_RADIUS_SALT
    a_side = banded.select(
        F.col("user_id").alias("user_a"),
        F.col("vec").alias("vec_a"),
        F.col("mask").alias("mask_a"),
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("k"),
    ).select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(S - 1))).alias("salt")
    )
    b_side = banded.select(
        F.col("user_id").alias("user_b"),
        F.col("vec").alias("vec_b"),
        F.col("mask").alias("mask_b"),
        F.col("band").alias("k"),
        F.pmod(F.col("user_id"), F.lit(S)).cast("int").alias("salt"),
    )
    # explicit-width repartition on the join key: the band rows are
    # KILOBYTES, so AQE coalesces the join's shuffle to ~1 partition
    # by byte size and the pair space runs serially anyway (measured:
    # salting alone left 10.8 s of single-task stages). A
    # user-specified width is exempt from AQE coalescing and the join
    # reuses the partitioning — same rule as io.pin_groups, applied
    # to a join instead of a pandas group stage.
    width = spark.sparkContext.defaultParallelism
    pairs = a_side.repartition(width, "k", "salt").join(
        b_side.repartition(width, "k", "salt"), ["k", "salt"]
    ).filter(F.col("user_a") < F.col("user_b"))
    return (
        pairs.filter((F.col("mask_a").bitwiseAND(F.col("mask_b"))) != 0)
        .select(
            "user_a",
            "user_b",
            F.expr(
                "aggregate(zip_with(vec_a, vec_b, (x, y) -> (x - y) * (x - y)),"
                " 0L, (acc, v) -> acc + v)"
            ).alias("dist2"),
        )
        .filter(F.col("dist2") <= F.lit(_TSS_RADIUS))
    )


# ---------------------------------------------------------------------------
# seasonal-trend decomposition (STL-shaped, integer fixed-point)
# ---------------------------------------------------------------------------

_STL_W = 12  # centered trend half-window: 25 hours total


@register(
    "stl_decompose_hourly",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             SUM(CAST(round(value * 100) AS HUGEINT)) AS cents
      FROM {{EVENTS}} GROUP BY 1, 2
    ),
    trend AS (
      SELECT hour, hod, cents,
             SUM(cents) OVER w AS tsum,
             CAST(COUNT(*) OVER w AS BIGINT) AS tn
      FROM hourly
      WINDOW w AS (ORDER BY hour ROWS BETWEEN {_STL_W} PRECEDING
                   AND {_STL_W} FOLLOWING)
    ),
    detrended AS (
      SELECT hour, hod, cents,
             CAST(tsum * 100 // tn AS BIGINT) AS trend_units,
             cents * 100 - CAST(tsum * 100 // tn AS BIGINT) AS det_units
      FROM trend
    ),
    seasonal AS (
      SELECT hod, CAST(SUM(det_units) // COUNT(*) AS BIGINT) AS seasonal_units
      FROM detrended GROUP BY hod
    )
    SELECT d.hour, CAST(d.cents * 100 AS BIGINT) AS value_units,
           d.trend_units, s.seasonal_units,
           CAST(d.cents * 100 - d.trend_units - s.seasonal_units AS BIGINT)
             AS resid_units
    FROM detrended d JOIN seasonal s ON s.hod = d.hod
    """.format(EVENTS=EVENTS_NORM),
    tags=("timeseries", "seasonal", "decomposition"),
)
def stl_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-shaped decomposition of the hourly revenue series into
    trend + seasonal + residual, entirely in integer fixed-point
    (units = cents·100): trend is a centered 25-hour moving average
    (integer floor division — identical in any engine), seasonal is
    the hour-of-day mean of the detrended series, residual is the
    exact remainder. The LOESS passes of full STL refine exactly
    these two estimates; the decomposition CONTRACT
    (value ≡ trend + seasonal + residual, enforced here to the unit)
    is what anomaly detection downstream consumes — pair resid_units
    with mad_outlier_events for deseasonalized alerting.

    Plan: one hash agg to hours (8760/year rows per series — tiny),
    one ordered window over the series, one 24-row seasonal agg
    broadcast back. At 100 TB the aggregate-to-series step does all
    the data reduction; decomposing a million series in parallel just
    adds the series key to every PARTITION BY/GROUP BY."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).alias("cents"))
    )
    w = Window.orderBy("hour").rowsBetween(-_STL_W, _STL_W)
    trend = hourly.select(
        "hour",
        "hod",
        "cents",
        F.sum("cents").over(w).alias("tsum"),
        F.count(F.lit(1)).over(w).alias("tn"),
    )
    det = trend.select(
        "hour",
        "hod",
        "cents",
        F.expr("cast(tsum * 100 div tn as bigint)").alias("trend_units"),
        F.expr("cast(cents * 100 as bigint) - cast(tsum * 100 div tn as bigint)").alias("det_units"),
    ).persist()  # feeds the seasonal agg AND the final projection
    seasonal = det.groupBy("hod").agg(
        F.expr("cast(sum(det_units) div count(1) as bigint)").alias("seasonal_units")
    )
    return det.join(F.broadcast(seasonal), "hod").select(
        "hour",
        F.expr("cast(cents * 100 as bigint)").alias("value_units"),
        "trend_units",
        "seasonal_units",
        F.expr(
            "cast(cents * 100 as bigint) - trend_units - seasonal_units"
        ).cast("long").alias("resid_units"),
    )


@register(
    "stl_residual_anomalies",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hour,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             SUM(CAST(round(value * 100) AS HUGEINT)) AS cents
      FROM {{EVENTS}} GROUP BY 1, 2
    ),
    trend AS (
      SELECT hour, hod, cents,
             SUM(cents) OVER w AS tsum,
             CAST(COUNT(*) OVER w AS BIGINT) AS tn
      FROM hourly
      WINDOW w AS (ORDER BY hour ROWS BETWEEN {_STL_W} PRECEDING
                   AND {_STL_W} FOLLOWING)
    ),
    detrended AS (
      SELECT hour, hod, cents,
             cents * 100 - CAST(tsum * 100 // tn AS BIGINT) AS det_units
      FROM trend
    ),
    seasonal AS (
      SELECT hod, CAST(SUM(det_units) // COUNT(*) AS BIGINT) AS s_units
      FROM detrended GROUP BY hod
    ),
    resid AS (
      SELECT d.hour, d.det_units - s.s_units AS r FROM detrended d
      JOIN seasonal s ON s.hod = d.hod
    ),
    med AS (
      SELECT CAST(quantile_disc(r, 0.5) AS BIGINT) AS m FROM resid
    ),
    mad AS (
      SELECT CAST(quantile_disc(abs(r - med.m), 0.5) AS BIGINT) AS mad, med.m
      FROM resid, med GROUP BY med.m
    )
    SELECT r.hour, CAST(r.r AS BIGINT) AS resid_units,
           CAST(abs(r.r - mad.m) AS BIGINT) AS abs_dev_units
    FROM resid r, mad
    WHERE abs(r.r - mad.m) > 4 * mad.mad
    """.format(EVENTS=EVENTS_NORM),
    tags=("timeseries", "anomaly", "seasonal", "pipeline"),
)
def stl_residual_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deseasonalized anomaly detection — the composition the STL
    docstring promises: hours whose decomposition residual deviates
    from the residual median by > 4×MAD (≈ 2.7σ under normality via the
    0.6745 consistency factor — the conventional robust alert line). Running the robust gate on
    RESIDUALS instead of raw values is what stops every daily peak
    from alerting (the seasonal term absorbs it) while a genuinely
    anomalous quiet-hour spike still fires.

    Exactness: residuals are integer units end to end;
    median/MAD use the DISCRETE quantile (an actual data point —
    quantile_disc / percentile_approx-free exact selection via sort)
    so both engines pick the identical element; the 4×MAD gate is
    pure integer comparison. Plan adds two tiny total-order medians
    (720-row frame) and a broadcast threshold to the STL plan — the
    detection pass is one filter."""
    hourly = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).alias("cents"))
    )
    w = Window.orderBy("hour").rowsBetween(-_STL_W, _STL_W)
    det = hourly.select(
        "hour",
        "hod",
        F.expr("cast(cents * 100 as bigint)").alias("v_units"),
        F.expr(
            f"cast(cents * 100 as bigint) - cast(sum(cents) over (order by hour rows between {_STL_W} preceding and {_STL_W} following) * 100"
            f" div count(1) over (order by hour rows between {_STL_W} preceding and {_STL_W} following) as bigint)"
        ).alias("det_units"),
    ).localCheckpoint(eager=True)  # hours-count rows; feeds seasonal AND resid
    seasonal = det.groupBy("hod").agg(
        F.expr("cast(sum(det_units) div count(1) as bigint)").alias("s_units")
    )
    resid = det.join(F.broadcast(seasonal), "hod").select(
        "hour", (F.col("det_units") - F.col("s_units")).alias("r")
    ).localCheckpoint(eager=True)  # feeds the median AND the deviation pass
    med = resid.agg(
        F.expr("cast(percentile_disc(0.5) within group (order by r) as bigint)").alias("m")
    )
    dev = resid.join(F.broadcast(med)).select(
        "hour", "r", F.abs(F.col("r") - F.col("m")).alias("ad")
    ).localCheckpoint(eager=True)  # feeds the MAD AND the final gate
    mad = dev.agg(
        F.expr("cast(percentile_disc(0.5) within group (order by ad) as bigint)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad))
        .filter(F.col("ad") > 4 * F.col("mad"))
        .select(
            "hour",
            F.col("r").cast("long").alias("resid_units"),
            F.col("ad").cast("long").alias("abs_dev_units"),
        )
    )


# ---------------------------------------------------------------------------
# revenue bridge (price-volume-mix decomposition between two periods)
# ---------------------------------------------------------------------------

_PVM_SCALE = 1_000_000


@register(
    "revenue_bridge_analysis",
    oracle=f"""
    WITH halves AS (
      SELECT c_mktsegment AS segment,
             CASE WHEN o_orderdate < (SELECT MIN(o_orderdate)
                                      + to_days(CAST((CAST(MAX(o_orderdate) AS DATE)
                                          - CAST(MIN(o_orderdate) AS DATE)) // 2 AS INTEGER))
                                      FROM orders)
                  THEN 1 ELSE 2 END AS period,
             CAST(round(o_totalprice * 100) AS HUGEINT) AS cents
      FROM orders JOIN customer ON c_custkey = o_custkey
    ),
    agg AS (
      SELECT segment,
             SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS n2,
             SUM(CASE WHEN period = 1 THEN cents ELSE 0 END) AS c1,
             SUM(CASE WHEN period = 2 THEN cents ELSE 0 END) AS c2
      FROM halves GROUP BY segment
    )
    SELECT segment,
           CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           CAST(c1 AS BIGINT) AS c1_cents, CAST(c2 AS BIGINT) AS c2_cents,
           CAST(c2 - c1 AS BIGINT) AS delta_cents,
           CAST((n2 - n1) * (c1 * {_PVM_SCALE} // n1) // {_PVM_SCALE} AS BIGINT)
             AS volume_effect_cents,
           CAST(n1 * (c2 * {_PVM_SCALE} // n2 - c1 * {_PVM_SCALE} // n1)
                // {_PVM_SCALE} AS BIGINT) AS rate_effect_cents
    FROM agg WHERE n1 > 0 AND n2 > 0
    """,
    tags=("analytics", "reporting", "bridge", "pvm"),
)
def revenue_bridge_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue bridge (price-volume-mix): per market segment, the
    half-over-half revenue change decomposed into a VOLUME effect
    (order-count change at the old average ticket) and a RATE effect
    (old volume at the new-vs-old average ticket) — the FP&A
    waterfall that answers "did we sell more, or sell bigger?".
    Averages are integer fixed-point (cents·10⁶ div n) and each
    effect is one more integer multiply + floor-divide, so both
    engines emit identical longs; the cross term (Δn·Δavg) is the
    arithmetic remainder delta − volume − rate, reconstructable by
    the consumer, so no rounding ambiguity hides in the bridge.

    Plan: broadcast 1-row date midpoint, one fact scan → one
    (segment, period) conditional aggregate (the halves never
    shuffle separately), effects are a projection. Same shape at any
    number of periods — add a period column and a lag window."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("decimal(38,0)").alias("cents"),
    )
    mid = orders.agg(
        F.expr(
            "date_add(min(o_orderdate), cast((datediff(max(o_orderdate), min(o_orderdate)) div 2) as int))"
        ).alias("mid")
    )
    halves = orders.join(F.broadcast(mid)).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.when(F.col("o_orderdate") < F.col("mid"), 1).otherwise(2).alias("period"),
        "cents",
    )
    agg = halves.groupBy("segment").agg(
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("period") == 2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("period") == 1, F.col("cents")).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("period") == 2, F.col("cents")).otherwise(0)).alias("c2"),
    )
    return agg.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        "segment",
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.col("c1").cast("long").alias("c1_cents"),
        F.col("c2").cast("long").alias("c2_cents"),
        (F.col("c2") - F.col("c1")).cast("long").alias("delta_cents"),
        F.expr(
            f"cast((n2 - n1) * (c1 * {_PVM_SCALE} div n1) div {_PVM_SCALE} as bigint)"
        ).alias("volume_effect_cents"),
        F.expr(
            f"cast(n1 * (c2 * {_PVM_SCALE} div n2 - c1 * {_PVM_SCALE} div n1)"
            f" div {_PVM_SCALE} as bigint)"
        ).alias("rate_effect_cents"),
    )


_ATTR_LOOKBACK_US = 24 * 3600 * 1_000_000  # 24h attribution window
_ATTR_CHANNELS = ("signup", "click", "view")


@register(
    "attribution_revenue_channels",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM {EVENTS_NORM}
    ),
    p AS MATERIALIZED (
      SELECT user_id, ts AS pts, event_id AS pid, cents
      FROM ev WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT user_id, ts AS tts, event_id AS tid, event_type AS channel
      FROM ev WHERE event_type IN ('signup', 'click', 'view')
    ),
    touched AS MATERIALIZED (
      SELECT p.user_id, p.pid, p.cents, t.channel, t.tts, t.tid,
             row_number() OVER (PARTITION BY p.user_id, p.pid
                                ORDER BY t.tts DESC, t.tid DESC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY p.user_id, p.pid) AS BIGINT) AS n
      FROM p JOIN t
        ON t.user_id = p.user_id
       AND (t.tts < p.pts OR (t.tts = p.pts AND t.tid < p.pid))
       AND epoch_us(p.pts) - epoch_us(t.tts) <= {_ATTR_LOOKBACK_US}
    ),
    attributed AS (
      SELECT channel,
             CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_last,
             CASE WHEN rn = 1 THEN cents * 1000000 ELSE 0 END AS last_mu,
             CASE WHEN rn = 1
                  THEN cents * 1000000 - (n - 1) * ((cents * 1000000) // n)
                  ELSE (cents * 1000000) // n END AS linear_mu
      FROM touched
      UNION ALL
      SELECT 'direct' AS channel, 1 AS is_last,
             cents * 1000000 AS last_mu, cents * 1000000 AS linear_mu
      FROM p WHERE NOT EXISTS (
        SELECT 1 FROM touched x
        WHERE x.user_id = p.user_id AND x.pid = p.pid
      )
    )
    SELECT channel,
           CAST(SUM(is_last) AS BIGINT) AS conversions_last,
           CAST(SUM(last_mu) AS BIGINT) AS revenue_last_mu,
           CAST(SUM(linear_mu) AS BIGINT) AS revenue_linear_mu
    FROM attributed GROUP BY channel
    """,
    tags=("analytics", "attribution", "marketing"),
)
def attribution_revenue_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch revenue attribution — the marketing-analytics
    staple: each purchase's cents credited to the touch events
    (signup/click/view) in its 24 h lookback, under BOTH standard
    models at once. Last-touch gives the full amount to the most
    recent touch; linear splits it equally in exact micro-cents with
    the truncation remainder assigned to the most recent touch, so
    per-channel linear totals sum EXACTLY to the purchase total (no
    float leakage between channels). Purchases with no in-window touch
    credit 'direct'. Both models stay pure BIGINT.

    Plan: both sides hash-shuffle once on user_id; the per-purchase
    touch join is a bounded range join (a user's touches in 24 h), and
    the two window functions reuse the join's partitioning. At 100 TB
    the fan-out is |purchases| x touches-per-day — the same bounded
    shape as range_join_close_events, never corpus-quadratic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"), "cents"
    )
    t = ev.filter(F.col("event_type").isin(*_ATTR_CHANNELS)).select(
        "user_id", F.col("ts").alias("tts"), F.col("event_id").alias("tid"),
        F.col("event_type").alias("channel"),
    )
    touched = (
        p.join(
            t,
            (p.user_id == t.user_id)
            & (
                (t.tts < p.pts)
                | ((t.tts == p.pts) & (t.tid < p.pid))
            )
            & (
                F.unix_micros(p.pts) - F.unix_micros(t.tts)
                <= F.lit(_ATTR_LOOKBACK_US)
            ),
        )
        .drop(t.user_id)
        .select("user_id", "pid", "cents", "channel", "tts", "tid")
    )
    w = Window.partitionBy("user_id", "pid").orderBy(F.desc("tts"), F.desc("tid"))
    wn = Window.partitionBy("user_id", "pid")
    touched = touched.select(
        "user_id", "pid", "cents", "channel",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n"),
    ).localCheckpoint(eager=True)  # feeds the per-touch credit AND the direct anti-join
    credit = touched.select(
        "channel",
        F.when(F.col("rn") == 1, 1).otherwise(0).alias("is_last"),
        F.when(F.col("rn") == 1, F.col("cents") * 1_000_000)
        .otherwise(0)
        .alias("last_mu"),
        F.when(
            F.col("rn") == 1,
            F.col("cents") * 1_000_000
            - (F.col("n") - 1) * F.expr("(cents * 1000000) div n"),
        )
        .otherwise(F.expr("(cents * 1000000) div n"))
        .alias("linear_mu"),
    )
    direct = (
        p.join(
            touched.select("user_id", "pid").distinct(),
            ["user_id", "pid"],
            "left_anti",
        )
        .select(
            F.lit("direct").alias("channel"),
            F.lit(1).alias("is_last"),
            (F.col("cents") * 1_000_000).alias("last_mu"),
            (F.col("cents") * 1_000_000).alias("linear_mu"),
        )
    )
    return (
        credit.unionByName(direct)
        .groupBy("channel")
        .agg(
            F.sum("is_last").cast("long").alias("conversions_last"),
            F.sum("last_mu").cast("long").alias("revenue_last_mu"),
            F.sum("linear_mu").cast("long").alias("revenue_linear_mu"),
        )
    )


_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 1, 10  # alpha = 0.1 -> 90% coverage


@register(
    "conformal_calibration_events",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, event_id, value, event_id % 2 AS split
      FROM {{EVENTS_NORM}}
    ),
    med AS (
      SELECT event_type, median(value) AS med
      FROM ev WHERE split = 0 GROUP BY event_type
    ),
    scored AS (
      SELECT e.event_type, e.event_id, e.split,
             abs(e.value - m.med) AS score
      FROM ev e JOIN med m ON m.event_type = e.event_type
    ),
    cal AS (
      SELECT event_type, score,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY score, event_id) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_cal
      FROM scored WHERE split = 0
    ),
    qhat AS (
      SELECT event_type, n_cal, score AS qhat
      FROM cal
      WHERE rn = LEAST(((n_cal + 1) * ({_CONF_ALPHA_DEN} - {_CONF_ALPHA_NUM})
                        + {_CONF_ALPHA_DEN} - 1) // {_CONF_ALPHA_DEN}, n_cal)
    )
    SELECT s.event_type, q.n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           round(q.qhat, 6) AS qhat,
           round(CAST(SUM(CASE WHEN s.score <= q.qhat THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS coverage
    FROM scored s JOIN qhat q ON q.event_type = s.event_type
    WHERE s.split = 1
    GROUP BY s.event_type, q.n_cal, q.qhat
    """.format(EVENTS_NORM=EVENTS_NORM),
    tags=("analytics", "conformal", "calibration", "mlops"),
)
def conformal_calibration_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal calibration — the distribution-free prediction-
    interval machinery (Vovk; Angelopoulos & Bates survey): per
    event_type, the calibration half (event_id parity) fits a trivial
    predictor (its median) and takes the ceil((n+1)(1-alpha))-th
    smallest nonconformity score |value - median| as qhat; the
    guarantee is that a fresh exchangeable point lands within qhat
    with probability >= 1-alpha. The test half then AUDITS the
    guarantee empirically (coverage column ~ 0.9 at alpha = 0.1).
    Determinism: the order statistic is an exact row_number selection
    with an event_id tiebreak; median and the |.-.| scores are single
    IEEE ops on both engines; k = ceil is integer arithmetic.

    Plan: one (type) median agg on the cal half, one broadcast back,
    one ranked window on the small per-type cal frame, one test-side
    aggregate — two shuffles of O(rows), windows on O(rows/type)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value", (F.col("event_id") % 2).alias("split")
    )
    med = (
        ev.filter(F.col("split") == 0)
        .groupBy("event_type")
        .agg(F.median("value").alias("med"))
    )
    scored = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "event_id", "split",
        F.abs(F.col("value") - F.col("med")).alias("score"),
    )
    wr = Window.partitionBy("event_type").orderBy("score", "event_id")
    wn = Window.partitionBy("event_type")
    k = (
        f"LEAST(((n_cal + 1) * ({_CONF_ALPHA_DEN} - {_CONF_ALPHA_NUM})"
        f" + {_CONF_ALPHA_DEN} - 1) div {_CONF_ALPHA_DEN}, n_cal)"
    )
    qhat = (
        scored.filter(F.col("split") == 0)
        .select(
            "event_type", "score",
            F.row_number().over(wr).alias("rn"),
            F.count(F.lit(1)).over(wn).cast("long").alias("n_cal"),
        )
        .filter(F.expr(f"rn = {k}"))
        .select("event_type", "n_cal", F.col("score").alias("qhat"))
    )
    return (
        scored.filter(F.col("split") == 1)
        .join(F.broadcast(qhat), "event_type")
        .groupBy("event_type", "n_cal", F.round("qhat", 6).alias("qhat"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(
                F.sum(F.when(F.col("score") <= F.col("qhat"), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("coverage"),
        )
        .select("event_type", "n_cal", "n_test", "qhat", "coverage")
    )


# z_{0.975} and z_{0.80}: hardcoded like the Benford table so no
# inverse-normal evaluates at query time; the sum/square below is the
# same two-IEEE-op literal tree in both engines.
_Z_ALPHA = "1.9599639845"
_Z_BETA = "0.8416212336"
_POWER_K = f"(({_Z_ALPHA} + {_Z_BETA}) * ({_Z_ALPHA} + {_Z_BETA}))"
_MDE_PCT = 5  # minimum detectable effect = 5% of the metric mean


@register(
    "ab_power_analysis",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(CAST(round(value * 100) AS HUGEINT)) AS DOUBLE) AS s,
             CAST(SUM(CAST(round(value * 100) AS HUGEINT)
                      * CAST(round(value * 100) AS HUGEINT)) AS DOUBLE) AS ss
      FROM {{EVENTS_NORM}} GROUP BY event_type
    )
    SELECT event_type, n_obs,
           round(s / n_obs / 100.0, 6) AS mean_value,
           round((ss / n_obs - (s / n_obs) * (s / n_obs)) / 10000.0, 6)
             AS variance,
           round({_MDE_PCT} / 100.0 * s / n_obs / 100.0, 6) AS mde,
           CAST(ceiling(
             2.0 * {_POWER_K} * (ss / n_obs - (s / n_obs) * (s / n_obs))
             / (({_MDE_PCT} / 100.0 * s / n_obs) * ({_MDE_PCT} / 100.0 * s / n_obs))
           ) AS BIGINT) AS required_n_per_arm,
           n_obs / 2 >= CAST(ceiling(
             2.0 * {_POWER_K} * (ss / n_obs - (s / n_obs) * (s / n_obs))
             / (({_MDE_PCT} / 100.0 * s / n_obs) * ({_MDE_PCT} / 100.0 * s / n_obs))
           ) AS BIGINT) AS powered
    FROM m WHERE s > 0
    """.format(EVENTS_NORM=EVENTS_NORM),
    tags=("analytics", "statistics", "experimentation", "power"),
)
def ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test power analysis from exact historical moments — the
    pre-experiment sizing step that belongs NEXT TO the z-test
    (ab_test_purchase_value) and DiD: per metric (event_type), the
    per-arm sample size needed to detect a 5% lift of the
    mean at alpha = 0.05 two-sided with 80% power,
    n = 2 (z_a + z_b)^2 sigma^2 / delta^2. Variance comes from exact
    integer-cent moment sums (the ab_test pattern), the z constants
    are hardcoded literals (no inverse-normal at query time), and the
    whole sizing expression is one fixed IEEE tree — so even the
    ceiling'd integer matches the oracle bit-for-bit. `powered` says
    whether the observed volume (split in half) already suffices.

    Plan: one map-side-partial moment aggregate; the sizing math runs
    on |event_types| rows. At 100 TB this is a single-scan job."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    dec = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    cents = F.round(F.col("value") * 100).cast("long")
    # square in decimal(38,0) — BIGINT*BIGINT overflows past ~3.04e9
    # cents while the DuckDB oracle squares in HUGEINT; widening first
    # keeps both engines in exact arithmetic for any long cents value
    cents_wide = cents.cast("decimal(38,0)")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        dec(cents).alias("s"),
        F.sum(cents_wide * cents_wide).cast("double").alias("ss"),
    )
    req = (
        f"CAST(ceiling(2.0 * {_POWER_K} * (ss / n_obs - (s / n_obs) * (s / n_obs))"
        f" / (({_MDE_PCT} / 100.0 * s / n_obs) * ({_MDE_PCT} / 100.0 * s / n_obs)))"
        f" AS BIGINT)"
    )
    return m.filter(F.col("s") > 0).select(
        "event_type",
        "n_obs",
        F.expr("round(s / n_obs / 100.0, 6)").alias("mean_value"),
        F.expr("round((ss / n_obs - (s / n_obs) * (s / n_obs)) / 10000.0, 6)").alias(
            "variance"
        ),
        F.expr(f"round({_MDE_PCT} / 100.0 * s / n_obs / 100.0, 6)").alias("mde"),
        F.expr(req).alias("required_n_per_arm"),
        F.expr(f"n_obs div 2 >= {req}").alias("powered"),
    )
