"""Temporal join operators: as-of join and range join.

Neither exists in the reference (SURVEY.md §2.9 — no joins at all) nor
natively in Spark; both are required "query capabilities" for a
time-series/stream engine and are implemented here as compositions of
built-in operators chosen for 100 TB behavior:

- **As-of join** — union the two sides with a tag, one window pass per
  key ordered by (ts, tag, id), `last(..., ignorenulls)` carries the
  most recent left-side attribute onto each right-side row. ONE shuffle
  on the key, no per-group Python (contrast pandas merge_asof via
  applyInPandas, which ships every group through Arrow). Skewed keys
  are handled by AQE the same as any window shuffle.

- **Range join** — equi-join on a coarse time bucket (+/- one bucket)
  then filter the exact range predicate. Turns an O(n²) theta-join
  into a co-partitioned hash join whose fan-out is bounded by bucket
  occupancy. The bucket width equals the range bound so each row joins
  at most 2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcon_spark.io import load_table
from arcon_spark.plans.compat import EVENTS_NORM, sql_msum
from arcon_spark.plans.registry import register


@register(
    "asof_join_purchase_view",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS tag
      FROM {EVENTS_NORM}
      WHERE event_type IN ('view', 'purchase')
    ),
    carried AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN tag = 0 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_view_id,
             last_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_view_ts
      FROM tagged
    )
    SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
           last_view_id,
           epoch_us(ts) - epoch_us(last_view_ts) AS gap_us
    FROM carried
    WHERE event_type = 'purchase' AND last_view_id IS NOT NULL
    """,
    tags=("join", "asof", "temporal"),
)
def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: for every purchase, the most recent view (ts at or
    before the purchase; view sorts before purchase on ties) by the
    same user. Single window pass — the scalable as-of plan."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "user_id",
            "event_id",
            "ts",
            "event_type",
            F.when(F.col("event_type") == "view", 0).otherwise(1).alias("tag"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    view_id = F.when(F.col("tag") == 0, F.col("event_id"))
    view_ts = F.when(F.col("tag") == 0, F.col("ts"))
    carried = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(view_id, ignorenulls=True).over(w).alias("last_view_id"),
        F.last(view_ts, ignorenulls=True).over(w).alias("last_view_ts"),
    )
    return (
        carried.filter(
            (F.col("event_type") == "purchase") & F.col("last_view_id").isNotNull()
        )
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            "last_view_id",
            (F.unix_micros("ts") - F.unix_micros("last_view_ts")).alias("gap_us"),
        )
    )


_RANGE_MIN = 5  # minutes


@register(
    "range_join_close_events",
    oracle=f"""
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM {EVENTS_NORM.replace(') events', ') a')}
    JOIN {EVENTS_NORM.replace(') events', ') b')}
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL '{_RANGE_MIN} minutes'
    """,
    tags=("join", "range", "temporal"),
)
def range_join_close_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE JOIN: ordered pairs of events by the same user at most 5
    minutes apart. Implementation is the bucketized form: equi-join on
    (user_id, 5-min bucket) with b in {bucket, bucket+1}, then the
    exact predicate — a hash join at any scale, never a cartesian
    theta-join (the oracle states the pure theta form; results are
    identical)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    bucket = F.expr(f"unix_micros(ts) div {_RANGE_MIN * 60 * 1_000_000}")
    a = ev.withColumn("bkt", bucket).alias("a")
    b = (
        ev.withColumn("bkt", bucket)
        .withColumn("bkt", F.explode(F.array(F.col("bkt"), F.col("bkt") - 1)))
        .alias("b")
    )
    joined = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.bkt") == F.col("b.bkt"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (
            F.unix_micros(F.col("b.ts"))
            <= F.unix_micros(F.col("a.ts")) + F.lit(_RANGE_MIN * 60 * 1_000_000)
        ),
    )
    return joined.select(
        F.col("a.event_id").alias("id_a"),
        F.col("b.event_id").alias("id_b"),
        F.col("a.user_id").alias("user_id"),
        (F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))).alias("gap_us"),
    )


@register(
    "tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 10000) AS HUGEINT)) AS DOUBLE) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24.0
    """,
    tags=("tpch", "filter", "aggregate"),
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: the pure pushdown benchmark — all
    four predicates reach the parquet scan (PushedFilters), the agg is
    a single global sum with map-side partials."""
    from arcon_spark.plans.compat import msum

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            msum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "scalar_subquery_above_avg",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS DOUBLE)
             / 100.0 / CAST(COUNT(*) AS DOUBLE)
      FROM orders)
    GROUP BY o_orderstatus
    """,
    tags=("subquery",),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price. The
    average goes through the exact-cents path (plans.compat.mavg) so
    the comparison threshold is bit-identical in both engines — a
    float avg would shift the boundary by an ulp and could flip rows."""
    from arcon_spark.plans.compat import mavg

    orders = load_table(spark, sf_dir, "orders")
    avg_price = orders.agg(mavg(F.col("o_totalprice"), 2).alias("a"))
    return (
        orders.join(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("a"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


@register(
    "tpch_q10ish",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {sql_msum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: lost-revenue customers.
    nation broadcast; customer⋈orders co-shuffles on custkey;
    orders⋈lineitem on orderkey. Deterministic top-20 with custkey
    tiebreak."""
    from arcon_spark.plans.compat import msum

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(msum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )
    return rev.orderBy(F.desc("revenue"), F.asc("c_custkey")).limit(20)


@register(
    "tpch_q14ish",
    oracle="""
    SELECT round(
             100.0 * CAST(SUM(CAST(round(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END * 10000) AS HUGEINT)) AS DOUBLE)
             / CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS HUGEINT)) AS DOUBLE),
           4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
    tags=("tpch", "join", "conditional_agg"),
)
def tpch_q14ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: conditional aggregation over a
    broadcast dimension join; exact-integer units under the ratio so
    the single division is the only float op."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    units = lambda c: F.sum(F.round(c * 10000).cast("decimal(38,0)")).cast("double")  # noqa: E731
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(100.0 * units(promo) / units(disc), 4).alias("promo_revenue_pct")
        )
    )


@register(
    "min_per_group_joinback",
    oracle="""
    WITH cheapest AS (
      SELECT p_type, MIN(p_retailprice) AS min_price
      FROM part GROUP BY p_type
    )
    SELECT p.p_type, p.p_partkey, p.p_name, p.p_retailprice
    FROM part p JOIN cheapest c
      ON p.p_type = c.p_type AND p.p_retailprice = c.min_price
    """,
    tags=("tpch", "subquery", "join"),
)
def min_per_group_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: argmin via aggregate + join-back (all rows
    achieving the per-group minimum, ties included — deterministic
    without a tiebreak because the full tie set is returned)."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_type", "p_retailprice"
    ).alias("p")
    cheapest = (
        load_table(spark, sf_dir, "part")
        .groupBy(F.col("p_type").alias("ct"))
        .agg(F.min("p_retailprice").alias("min_price"))
        .alias("c")
    )
    return (
        part.join(
            F.broadcast(cheapest),
            (F.col("p.p_type") == F.col("c.ct"))
            & (F.col("p.p_retailprice") == F.col("c.min_price")),
        )
        .select("p.p_type", "p.p_partkey", "p.p_name", "p.p_retailprice")
    )


@register(
    "salted_hot_key_agg",
    oracle=f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, {'CAST(SUM(CAST(round(value * 100) AS HUGEINT)) AS DOUBLE) / 100.0'} AS total
    FROM events GROUP BY event_type
    """,
    tags=("skew", "aggregate", "scale_pattern"),
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern: two-stage salted aggregation. Stage 1
    groups by (key, salt=hash%16) — hot keys fan out across 16
    reducers; stage 2 merges the partials. Result is identical to the
    direct groupBy (exact integer units are associative), verified by
    the plain-SQL oracle. At 100 TB this is the standard defense when
    one key holds >1 partition's worth of rows and AQE's skew handling
    can't split an aggregation."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    salted = ev.withColumn("salt", F.pmod(F.xxhash64("value"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).alias("punits"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        (F.sum("punits").cast("double") / 100.0).alias("total"),
    )


@register(
    "tpch_q7ish",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {sql_msum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                  JOIN orders   ON o_orderkey = l_orderkey
                  JOIN customer ON c_custkey = o_custkey
                  JOIN nation sn ON sn.n_nationkey = s_nationkey
                  JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE sn.n_name <> cn.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
    tags=("tpch", "join"),
)
def tpch_q7ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: cross-nation trade flows by year.
    Two broadcast nation lookups + broadcast supplier; the only wide
    exchanges are lineitem⋈orders (orderkey) and ⋈customer (custkey)."""
    from arcon_spark.plans.compat import msum

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = nation.alias("sn")
    cn = nation.alias("cn")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .filter(F.col("sn.n_name") != F.col("cn.n_name"))
        .groupBy(
            F.col("sn.n_name").alias("supp_nation"),
            F.col("cn.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(msum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


@register(
    "time_rollup_hierarchy",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_msum('value', 2)} AS sum_value
    FROM {EVENTS_NORM}
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    """,
    tags=("rollup", "timeseries", "survey2.6"),
)
def time_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-hierarchy rollup: one pass producing the
    hourly, daily, and grand-total continuous aggregates (ROLLUP(day,
    hour) = {{(day,hour),(day),()}}). Catalyst plans this as a single
    Expand + hash aggregate — each input row fans into the 3 grouping
    levels map-side, so the multi-granularity materialization costs one
    shuffle, not one job per granularity. This is the standard pattern
    for maintaining time-series rollup tables at ingest scale."""
    from arcon_spark.plans.compat import sql_msum as _sql_msum

    load_table(spark, sf_dir, "events").createOrReplaceTempView("arcon_tr_events")
    return spark.sql(
        f"""
        SELECT date_trunc('DAY', ts) AS day,
               date_trunc('HOUR', ts) AS hour,
               COUNT(*) AS n,
               {_sql_msum('value', 2).replace('HUGEINT', 'DECIMAL(38,0)')} AS sum_value
        FROM arcon_tr_events
        GROUP BY ROLLUP (date_trunc('DAY', ts), date_trunc('HOUR', ts))
        """
    )


@register(
    "asof_join_forward",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS tag
      FROM {EVENTS_NORM}
      WHERE event_type IN ('view', 'purchase')
    ),
    carried AS (
      SELECT user_id, event_id, ts, event_type,
             first_value(CASE WHEN tag = 1 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_purchase_id,
             first_value(CASE WHEN tag = 1 THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_purchase_ts
      FROM tagged
    )
    SELECT user_id, event_id AS view_id, ts AS view_ts,
           next_purchase_id,
           epoch_us(next_purchase_ts) - epoch_us(ts) AS wait_us
    FROM carried
    WHERE event_type = 'view' AND next_purchase_id IS NOT NULL
    """,
    tags=("join", "asof", "temporal"),
)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every view, the NEXT purchase at or
    after it (time-to-conversion). The mirror of
    asof_join_purchase_view — same union-tag single-window design, but
    `first(..., ignorenulls)` over a CURRENT ROW → UNBOUNDED FOLLOWING
    frame carries the nearest later purchase backwards. Views sort
    before purchases at equal ts (tag 0 < 1) so a same-instant
    purchase counts as 'at or after'. Still ONE shuffle on user_id, no
    per-group Python, skew handled by AQE like any window exchange."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tag = F.when(F.col("event_type") == "view", 0).otherwise(1)
    tagged = ev.select("user_id", "event_id", "ts", "event_type", tag.alias("tag"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    purch_id = F.when(F.col("tag") == 1, F.col("event_id"))
    purch_ts = F.when(F.col("tag") == 1, F.unix_micros(F.col("ts")))
    carried = tagged.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.first(purch_id, ignorenulls=True).over(w).alias("next_purchase_id"),
        F.first(purch_ts, ignorenulls=True).over(w).alias("next_purchase_us"),
    )
    return (
        carried.filter(
            (F.col("event_type") == "view") & F.col("next_purchase_id").isNotNull()
        )
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            "next_purchase_id",
            (F.col("next_purchase_us") - F.unix_micros(F.col("ts"))).alias("wait_us"),
        )
    )


_SALT_N = 8


@register(
    "salted_skew_join",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS HUGEINT)) AS DOUBLE) / 100.0
             AS total_value
    FROM events JOIN customer ON c_custkey = user_id
    GROUP BY c_mktsegment
    """,
    tags=("join", "skew", "salting", "scale_pattern"),
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern #2: the SALTED SHUFFLE JOIN (the join-
    side companion to salted_hot_key_agg). The fact side adds a
    deterministic salt in [0, 8); the dimension side replicates each
    row 8× via explode(sequence(...)); the join key becomes
    (user_id, salt), so a hot user's rows spread over 8 reducers
    instead of hammering one. The shuffle_hash hint forces the
    repartition join this pattern exists for (with broadcast the skew
    problem wouldn't arise — that escape hatch is broadcast_dim_join).

    Result is provably salt-invariant: every fact row meets exactly
    one replica of its dimension row (the one with s = its salt), so
    the plain-join oracle hash-matches. At 100 TB: salt only the keys
    AQE's skew split can't fix (a single key above the split size),
    and size the salt fan-out to the observed hot-key multiplicity."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    fact = ev.withColumn("salt", F.pmod(F.xxhash64("user_id", "value"), F.lit(_SALT_N)))
    dim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("s", F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1))))
        .hint("shuffle_hash")
    )
    return (
        fact.join(
            dim,
            (fact.user_id == dim.c_custkey) & (fact.salt == dim.s.cast("long")),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 100).cast("decimal(38,0)")).cast("double")
                / 100.0
            ).alias("total_value"),
        )
    )


_NEAREST_TOL_US = 2 * 3600 * 1_000_000  # nearest-asof tolerance: 2h


@register(
    "asof_join_nearest",
    oracle=f"""
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS tag
      FROM {EVENTS_NORM}
      WHERE event_type IN ('view', 'purchase')
    ),
    carried AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN tag = 1 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_id,
             last_value(CASE WHEN tag = 1 THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_us,
             first_value(CASE WHEN tag = 1 THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_id,
             first_value(CASE WHEN tag = 1 THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_us
      FROM tagged
    ),
    views AS (
      SELECT user_id, event_id AS view_id, ts AS view_ts,
             CASE WHEN prev_us IS NOT NULL
                       AND epoch_us(ts) - prev_us <= {_NEAREST_TOL_US}
                  THEN prev_id END AS bid,
             CASE WHEN prev_us IS NOT NULL THEN epoch_us(ts) - prev_us END AS bd,
             CASE WHEN next_us IS NOT NULL
                       AND next_us - epoch_us(ts) <= {_NEAREST_TOL_US}
                  THEN next_id END AS fid,
             CASE WHEN next_us IS NOT NULL THEN next_us - epoch_us(ts) END AS fd
      FROM carried WHERE event_type = 'view'
    )
    SELECT user_id, view_id, view_ts,
           CASE WHEN bid IS NOT NULL AND (fid IS NULL OR bd <= fd)
                THEN bid ELSE fid END AS nearest_purchase_id,
           CASE WHEN bid IS NOT NULL AND (fid IS NULL OR bd <= fd)
                THEN -bd ELSE fd END AS delta_us
    FROM views WHERE bid IS NOT NULL OR fid IS NOT NULL
    """,
    tags=("join", "asof", "temporal"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: for every view, the closest purchase by the
    same user in EITHER direction within a 2 h tolerance (ties →
    the earlier/backward purchase). Completes the as-of family:
    backward (asof_join_purchase_view), forward (asof_join_forward),
    nearest — the three `merge_asof` directions, each as a declarative
    plan.

    Both direction carries ride ONE window partitioning (user_id,
    ordered ts): the backward candidate is a last_value IGNORE NULLS
    over the preceding frame, the forward one a first_value over the
    following frame — Spark plans a single Exchange + single Sort and
    fuses all four carries into ONE WindowExec (verified:
    executedPlan has exactly 1 Exchange, 1 Sort, 1 Window). No join against a purchases table
    at all, so there is nothing to broadcast or skew-split; the only
    scale knob is the user_id hash exchange AQE already balances.
    delta_us is SIGNED (negative = purchase before view) — exact
    integer µs arithmetic end to end."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    )
    tag = F.when(F.col("event_type") == "view", 0).otherwise(1)
    tagged = ev.select("user_id", "event_id", "ts", "event_type", tag.alias("tag"))
    order = [F.col("ts"), F.col("tag"), F.col("event_id")]
    w_back = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pid = F.when(F.col("tag") == 1, F.col("event_id"))
    pus = F.when(F.col("tag") == 1, F.unix_micros(F.col("ts")))
    carried = tagged.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(pid, ignorenulls=True).over(w_back).alias("prev_id"),
        F.last(pus, ignorenulls=True).over(w_back).alias("prev_us"),
        F.first(pid, ignorenulls=True).over(w_fwd).alias("next_id"),
        F.first(pus, ignorenulls=True).over(w_fwd).alias("next_us"),
    )
    us = F.unix_micros(F.col("ts"))
    views = carried.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
        F.when(
            F.col("prev_us").isNotNull()
            & (us - F.col("prev_us") <= _NEAREST_TOL_US),
            F.col("prev_id"),
        ).alias("bid"),
        F.when(F.col("prev_us").isNotNull(), us - F.col("prev_us")).alias("bd"),
        F.when(
            F.col("next_us").isNotNull()
            & (F.col("next_us") - us <= _NEAREST_TOL_US),
            F.col("next_id"),
        ).alias("fid"),
        F.when(F.col("next_us").isNotNull(), F.col("next_us") - us).alias("fd"),
    )
    back_wins = F.col("bid").isNotNull() & (
        F.col("fid").isNull() | (F.col("bd") <= F.col("fd"))
    )
    return views.filter(F.col("bid").isNotNull() | F.col("fid").isNotNull()).select(
        "user_id",
        "view_id",
        "view_ts",
        F.when(back_wins, F.col("bid")).otherwise(F.col("fid")).alias(
            "nearest_purchase_id"
        ),
        F.when(back_wins, -F.col("bd")).otherwise(F.col("fd")).alias("delta_us"),
    )


@register(
    "fifo_pairing_events",
    oracle=f"""
    WITH v AS (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM {EVENTS_NORM} WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id, ts,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM {EVENTS_NORM} WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
           epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
    FROM p JOIN v ON v.user_id = p.user_id AND v.rn = p.rn
    """,
    tags=("temporal", "sequence", "matching", "fifo"),
)
def fifo_pairing_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO queue matching: each user's k-th purchase is paired with
    their k-th view — first-in-first-out consumption of a demand
    queue, the allocation rule behind FIFO inventory/cost accounting,
    capacity token matching, and message ack pairing. A per-key queue
    that looks inherently imperative reduces to ROW_NUMBER EQUALITY:
    rank views and purchases independently within each user (total
    order: ts, then event_id) and equi-join on (user_id, rank).

    Plan: two window passes + the join all hash-partition on user_id
    — one logical exchange the planner reuses across all three, no
    per-key Python, no iteration. lag_us may be negative (a purchase
    can precede its rank-matched view when the queue runs empty) —
    that's faithful FIFO ledger semantics, not a bug; unmatched tail
    ranks (more views than purchases) drop out of the inner join
    exactly as an open queue remains unconsumed. At 100 TB this is
    skew-bounded by the hottest user like every keyed window here
    (AQE skew split applies)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def ranked(et: str, id_alias: str):
        return (
            ev.filter(F.col("event_type") == et)
            .select("user_id", "event_id", "ts")
            .withColumn("rn", F.row_number().over(w))
            .select(
                "user_id",
                F.col("event_id").alias(id_alias),
                F.unix_micros("ts").alias(f"{id_alias}_us"),
                "rn",
            )
        )

    v = ranked("view", "view_id")
    p = ranked("purchase", "purchase_id")
    return p.join(v, ["user_id", "rn"]).select(
        "user_id",
        "purchase_id",
        "view_id",
        (F.col("purchase_id_us") - F.col("view_id_us")).alias("lag_us"),
    )


@register(
    "bitemporal_asof",
    oracle=f"""
    WITH mid AS (
      SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS t
      FROM (SELECT CAST(ts AS TIMESTAMP) AS ts FROM events)
    ),
    versions AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS valid_us,
             epoch_us(ts) + CASE WHEN event_id % 5 = 0
                                 THEN 3600000000 ELSE 0 END AS recorded_us
      FROM {EVENTS_NORM}
    ),
    known_then AS (
      SELECT user_id, event_type FROM (
        SELECT v.user_id, v.event_type,
               row_number() OVER (PARTITION BY v.user_id
                                  ORDER BY v.valid_us DESC, v.event_id DESC) AS rn
        FROM versions v, mid
        WHERE v.valid_us <= mid.t AND v.recorded_us <= mid.t
      ) WHERE rn = 1
    ),
    known_now AS (
      SELECT user_id, event_type FROM (
        SELECT v.user_id, v.event_type,
               row_number() OVER (PARTITION BY v.user_id
                                  ORDER BY v.valid_us DESC, v.event_id DESC) AS rn
        FROM versions v, mid
        WHERE v.valid_us <= mid.t
      ) WHERE rn = 1
    )
    SELECT n.user_id,
           t.event_type AS believed_type,
           n.event_type AS current_type,
           t.event_type IS DISTINCT FROM n.event_type AS corrected
    FROM known_now n LEFT JOIN known_then t ON t.user_id = n.user_id
    """,
    tags=("temporal", "bitemporal", "asof", "scd2"),
)
def bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL as-of: each user's state at VALID time T under two
    KNOWLEDGE horizons — 'as we believed at T' (only versions
    recorded by T; every 5th event arrives an hour late, simulating
    out-of-band corrections) versus 'as we know now' (all versions).
    Rows where the two disagree are exactly the retroactive
    corrections — the audit question ('what did the system believe
    when it made that decision?') that one-axis SCD2
    (scd2_user_type_history) cannot answer, and the reason financial
    / ML-feature stores carry both axes.

    Plan: ONE versions scan feeds both knowledge horizons; each
    horizon is a filtered WindowGroupLimit argmax on the same user_id
    partitioning (exchange reused), joined user-to-user at the end.
    The knowledge filter is a plain predicate — pushed into the scan,
    no extra join against a transaction-time table. All comparisons
    in integer µs; the argmax order (valid_us, event_id) is total."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type", "ts")
    mid = ev.agg(
        F.expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").alias("t")
    )
    versions = ev.join(F.broadcast(mid)).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("valid_us"),
        (
            F.unix_micros("ts")
            + F.when(F.col("event_id") % 5 == 0, F.lit(3_600_000_000)).otherwise(F.lit(0))
        ).alias("recorded_us"),
        "t",
    ).persist()  # one scan, two knowledge horizons
    w = Window.partitionBy("user_id").orderBy(
        F.desc("valid_us"), F.desc("event_id")
    )

    def horizon(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias(alias))
        )

    then = horizon(
        versions.filter(
            (F.col("valid_us") <= F.col("t")) & (F.col("recorded_us") <= F.col("t"))
        ),
        "believed_type",
    )
    now = horizon(versions.filter(F.col("valid_us") <= F.col("t")), "current_type")
    return now.join(then, "user_id", "left").select(
        "user_id",
        "believed_type",
        "current_type",
        (~F.col("believed_type").eqNullSafe(F.col("current_type"))).alias("corrected"),
    )
