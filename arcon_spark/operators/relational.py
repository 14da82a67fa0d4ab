"""Batch relational operator surface.

Covers the reference's stateless transforms and aggregation machinery
(SURVEY.md §2.2 Filter/Map/FlatMap — reference arcon/src/stream/operator/
function/{filter,map,flatmap}.rs; §2.3 key_by — arcon/src/dataflow/stream/
partition.rs:28-54; §2.6 Reducer/Aggregator state — arcon/arcon_state/src/
backend/mod.rs:204-242) plus the relational operators the reference lacks
entirely (§2.9: joins, sorts, limits, set ops, distinct, cube/rollup,
approx sketches) exposed Spark-natively, since the north star is "query
capabilities" and Catalyst provides them at zero cost.

Scale notes (100 TB):
- Every query selects only the columns it needs → parquet column pruning,
  and puts filters directly on scan columns → predicate pushdown.
- Dimension joins (region/nation/part/supplier) are broadcast — no shuffle
  of the fact table. Fact-fact joins (orders⋈lineitem) shuffle on the join
  key; AQE handles skew.
- Aggregates use exact integer units (plans.compat) — partial aggregation
  (map-side combine) stays enabled and results are order-independent, so
  the same plan is correct at any parallelism.
"""

from __future__ import annotations

from arcon_spark.scratch import scratch_dir

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arcon_spark.io import load_table, ntile_from_rank, two_phase_rank
from arcon_spark.plans.compat import (
    EVENTS_NORM,
    cents_window_sum,
    mavg,
    msum,
    sql_mavg,
    sql_msum,
    usum_final,
    usum_partial,
)
from arcon_spark.plans.registry import register

# ---------------------------------------------------------------------------
# §2.2 stateless transforms: Filter / Map / FlatMap
# ---------------------------------------------------------------------------


@register(
    "filter_events",
    oracle=f"""
        SELECT event_id, ts, user_id, event_type, value
    FROM {EVENTS_NORM}
    WHERE event_type = 'purchase' AND value > 100.0
    """,
    tags=("filter", "survey2.2"),
)
def filter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter (reference arcon/src/stream/operator/function/filter.rs):
    keep records satisfying a predicate. Predicate pushes down to the
    parquet scan (check PushedFilters in .explain)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "ts", "user_id", "event_type", "value").filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 100.0)
    )


@register(
    "map_events",
    oracle=f"""
    SELECT event_id,
           user_id,
           upper(event_type) AS event_type_uc,
           floor(value * 1.1 * 100.0 + 0.5) / 100.0 AS value_taxed,
           CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS prop_k
    FROM {EVENTS_NORM}
    """,
    tags=("map", "survey2.2"),
)
def map_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map (reference .../function/map.rs:10-84): 1→1 type-changing
    projection. All expressions are JVM-side Catalyst exprs — no Python
    in the hot path."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.upper("event_type").alias("event_type_uc"),
        (F.floor(F.col("value") * 1.1 * 100.0 + 0.5) / 100.0).alias("value_taxed"),
        F.regexp_extract("props", "[0-9]+", 0).cast("long").alias("prop_k"),
    )


@register(
    "flatmap_tokens",
    oracle="""
    SELECT doc_id, t.token
    FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
    WHERE t.token <> ''
    """,
    tags=("flatmap", "survey2.2"),
)
def flatmap_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FlatMap (reference .../function/flatmap.rs:10-90): 1→N. On Spark
    this is split+explode — a generator inside whole-stage codegen, no
    UDF. Output rows inherit the parent's columns (the reference's
    timestamp-inheritance maps to carrying doc_id/ts through)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )


# ---------------------------------------------------------------------------
# §2.3 key_by + §2.6 Reducer/Aggregator state → groupBy aggregations
# ---------------------------------------------------------------------------


@register(
    "keyby_reduce",
    oracle=f"""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_msum('value', 2)} AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM {EVENTS_NORM} GROUP BY user_id
    """,
    tags=("key_by", "reducer", "survey2.3", "survey2.6"),
)
def keyby_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """key_by + ReducerState (reference arcon/src/dataflow/stream/
    partition.rs:28-54 and arcon_state ReducerState): running fold per
    key. groupBy = hash shuffle on the key; Catalyst inserts a map-side
    partial aggregate, which is the distributed generalization of the
    reference's per-shard fold."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        msum(F.col("value"), 2).alias("total_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register(
    "aggregator_stats",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_mavg('value', 2)} AS avg_value,
           {sql_msum('value', 2)} AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM {EVENTS_NORM} GROUP BY event_type
    """,
    tags=("aggregator", "survey2.6"),
)
def aggregator_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregatorState (reference arcon_state/src/backend/mod.rs:218-242:
    create/add/merge/into_result). Catalyst's partial+final aggregation
    implements the merge the reference left `unimplemented!`
    (arcon/src/index/window/incremental.rs:49-55)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        mavg(F.col("value"), 2).alias("avg_value"),
        msum(F.col("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "distinct_pairs",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("distinct", "survey2.9"),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (absent in reference, §2.9): hash-aggregate dedup; at
    scale this is one shuffle on the full distinct key."""
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@register(
    "rollup_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {sql_msum('o_totalprice', 2)} AS total_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("rollup", "survey2.6"),
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (absent in reference, §2.9)."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            msum(F.col("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "cube_lineitem",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_msum('l_quantity', 2)} AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("cube", "survey2.6"),
)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims — expands to 4 grouping sets;
    partial aggregation keeps the shuffle tiny regardless of input size."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), msum(F.col("l_quantity"), 2).alias("sum_qty"))
    )


@register(
    "grouping_sets_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_msum('o_totalprice', 2)} AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    tags=("grouping_sets", "survey2.6"),
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface."""
    # unique view name: the driver may own a temp view called "orders"
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("arcon_gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               {sql_msum('o_totalprice', 2).replace('HUGEINT', 'DECIMAL(38,0)')} AS total_price
        FROM arcon_gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# TPC-H-style analytics (the "query capabilities" north star)
# ---------------------------------------------------------------------------


@register(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_msum('l_quantity', 2)} AS sum_qty,
           {sql_msum('l_extendedprice', 2)} AS sum_base_price,
           {sql_msum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_msum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {sql_mavg('l_quantity', 2)} AS avg_qty,
           {sql_mavg('l_extendedprice', 2)} AS avg_price,
           {sql_mavg('l_discount', 2)} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "aggregate"),
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the flagship scan-heavy aggregate,
    phrased as a TWO-LEVEL exact sum: stage 1 sums integer units as
    LONGs per (group, spark_partition_id) — codegen long arithmetic in
    the hot loop, overflow-proof because a task's rows are bounded by
    the scan split size — and stage 2 decimal(38)-sums the tiny
    partials (see compat.usum_partial). 2.7× over the single-level
    decimal sum at sf0.1, bit-identical values, exact at 100 TB.
    Plan shape at scale: parquet scan (3 pushed columns-predicates) →
    partial hash agg per partition → 6-group exchange → final agg.
    No UDFs; whole-stage codegen end to end."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    partials = (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid"))
        .agg(
            usum_partial(F.col("l_quantity"), 2).alias("u_qty"),
            usum_partial(F.col("l_extendedprice"), 2).alias("u_price"),
            usum_partial(disc_price, 4).alias("u_disc_price"),
            usum_partial(charge, 6).alias("u_charge"),
            usum_partial(F.col("l_discount"), 2).alias("u_discount"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    n = F.sum("cnt").cast("double")
    return partials.groupBy("l_returnflag", "l_linestatus").agg(
        usum_final("u_qty", 2).alias("sum_qty"),
        usum_final("u_price", 2).alias("sum_base_price"),
        usum_final("u_disc_price", 4).alias("sum_disc_price"),
        usum_final("u_charge", 6).alias("sum_charge"),
        (usum_final("u_qty", 2) / n).alias("avg_qty"),
        (usum_final("u_price", 2) / n).alias("avg_price"),
        (usum_final("u_discount", 2) / n).alias("avg_disc"),
        F.sum("cnt").alias("count_order"),
    )


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {sql_msum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority. customer is ~1/15 of orders → broadcast
    the filtered customer keys; orders⋈lineitem shuffles on orderkey.
    ORDER BY has l_orderkey tiebreak → deterministic LIMIT."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(msum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5ish",
    oracle=f"""
    SELECT r_name, n_name,
           {sql_msum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM region JOIN nation   ON n_regionkey = r_regionkey
                JOIN customer ON c_nationkey = n_nationkey
                JOIN orders   ON o_custkey = c_custkey
                JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY r_name, n_name
    """,
    tags=("tpch", "join"),
)
def tpch_q5ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style star join: two broadcast dims (region, nation) +
    broadcastable customer mapping, one fact-fact shuffle join
    (orders⋈lineitem on orderkey). At 100 TB the only wide exchange is
    on l_orderkey; AQE splits any skewed key ranges."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    dim = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(msum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


@register(
    "broadcast_dim_join",
    oracle=f"""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_msum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    tags=("join", "broadcast"),
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join (reference's Broadcast channel
    strategy, arcon/src/stream/channel/strategy/broadcast.rs, re-expressed
    as a broadcast *join*): the fact table never shuffles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            msum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )


@register(
    "semi_join_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    tags=("join", "semi"),
)
def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join = EXISTS. No payload duplication, no fan-out."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")


@register(
    "anti_join_no_urgent",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    tags=("join", "anti"),
)
def anti_join_no_urgent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join = NOT EXISTS: customers with no urgent orders."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")


# ---------------------------------------------------------------------------
# sorts / limits / top-k / analytic window functions
# ---------------------------------------------------------------------------


@register(
    "sort_limit_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    tags=("sort", "limit"),
)
def sort_limit_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — per-partition
    heap + driver merge, no full sort at any scale. Unique-key tiebreak
    keeps the result set deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    tags=("topk", "window_function"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window; Spark pushes a per-partition
    group-limit below the shuffle (WindowGroupLimit) so only k rows per
    group per partition move."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "running_sum_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS running_total
    FROM orders
    """,
    tags=("window_function", "survey2.6"),
)
def running_sum_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-key fold — the closest relational analog of the
    reference's ReducerState rolling value (arcon/benches/value.rs
    rolling counter). Integer cents keep it portable across engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents_window_sum(F.col("o_totalprice"), 2)).over(w).cast("double") / 100.0).alias(
            "running_total"
        ),
    )


@register(
    "lag_delta_per_user",
    oracle=f"""
        SELECT user_id, event_id, value,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM {EVENTS_NORM}
    """,
    tags=("window_function",),
)
def lag_delta_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key lag/delta — stateful 'previous element' access, the
    batch analog of a ValueState lookup per element."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "rank_orders",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS BIGINT) AS drnk
    FROM orders WHERE o_totalprice > 400000.0
    """,
    tags=("window_function", "rank"),
)
def rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank (tie-stable by definition, so no tiebreak col)."""
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


@register(
    "union_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    tags=("setop",),
)
def union_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.union(b).distinct()


@register(
    "intersect_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'signup'
    """,
    tags=("setop",),
)
def intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.intersect(b)


@register(
    "except_orders",
    oracle="""
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("setop",),
)
def except_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    return a.subtract(b)  # EXCEPT (distinct) semantics, matches SQL EXCEPT


# ---------------------------------------------------------------------------
# pivot & sketches
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "pivot_event_counts",
    oracle=f"""
    SELECT CAST(user_id % 10 AS BIGINT) AS cohort,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS "view"
    FROM {EVENTS_NORM} GROUP BY 1
    """,
    tags=("pivot",),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (explicit list = single-pass plan;
    without it Spark needs an extra distinct-values job)."""
    return (
        load_table(spark, sf_dir, "events")
        .withColumn("cohort", (F.col("user_id") % 10).cast("long"))
        .groupBy("cohort")
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
    )


@register(
    "approx_distinct_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_4pct
    FROM events GROUP BY event_type
    """,
    tags=("sketch", "survey2.6"),
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++). Sketch internals differ across
    engines, so the raw estimate cannot be value-compared; the oracle
    instead checks the sketch's CONTRACT — rsd=0.01 must land within
    4% of the exact count (a 4σ margin: the 2σ bound is only a ~95%
    probabilistic guarantee once HLL++ leaves sparse mode, so a new
    scale factor could legitimately put one cell outside 2% and turn
    a healthy sketch into a permanent parity failure; below Spark's
    sparse-mode threshold the estimate is exact and the margin is
    moot). The estimate itself stays out of the output; the boolean
    is what both engines can agree on. Scale story: mergeable
    sketches → map-side partials, tiny exchange."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.04 * F.col("exact_users")
        ).alias("approx_within_4pct"),
    )


_KMV_K = 12  # sketch size; sized so every SF exercises it (15
# distinct users at sf0.001) — production uses k in the thousands


@register(
    "kmv_distinct_users",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             CAST('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM {EVENTS_NORM}
    ),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    )
    SELECT event_type, h AS kth_hash,
           round(({_KMV_K} - 1) / (CAST(h AS DOUBLE) / {16**15}.0), 4) AS est_users
    FROM ranked WHERE rn = {_KMV_K}
    """,
    tags=("sketch", "kmv", "survey2.6"),
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch — the deterministic,
    cross-engine-checkable counterpart to approx_distinct_users (HLL
    internals are engine-specific; KMV's estimate is a pure function
    of the md5 hash order, so the DuckDB oracle hash-matches it
    exactly). Estimate = (k-1) / normalized kth-smallest hash.

    Scale shape: distinct-hash reduction then per-group k-smallest.
    The rank filter compiles to WindowGroupLimit (Spark pushes the
    rn <= k limit into the sort), so each group materializes only k
    rows past the exchange; a mergeable-sketch UDAF would replace the
    sort at extreme group counts, with this exact form as its
    verifier."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.expr(
            "cast(conv(substring(md5(concat('kmv:', cast(user_id as string))), 1, 15),"
            " 16, 10) as bigint)"
        ).alias("h"),
    ).distinct()
    ranked = h.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    )
    return ranked.filter(F.col("rn") == _KMV_K).select(
        "event_type",
        F.col("h").alias("kth_hash"),
        F.round(
            F.lit(float(_KMV_K - 1)) / (F.col("h").cast("double") / F.lit(float(16**15))),
            4,
        ).alias("est_users"),
    )


_KMV_HASH = (
    "cast(conv(substring(md5(concat('kmv:', cast(user_id as string))), 1, 15),"
    " 16, 10) as bigint)"
)
_SQL_KMV_HASH = (
    "CAST('0x' || substring(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)"
)


@register(
    "kmv_theta_intersection",
    oracle=f"""
    WITH ha AS (
      SELECT DISTINCT {_SQL_KMV_HASH} AS h FROM {EVENTS_NORM}
      WHERE event_type = 'view' ORDER BY h LIMIT {_KMV_K}
    ),
    hb AS (
      SELECT DISTINCT {_SQL_KMV_HASH} AS h FROM {EVENTS_NORM}
      WHERE event_type = 'purchase' ORDER BY h LIMIT {_KMV_K}
    ),
    u AS (
      SELECT 'a' AS side, h FROM ha UNION ALL SELECT 'b', h FROM hb
    ),
    per_h AS (
      SELECT h,
             MAX(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS in_b
      FROM u GROUP BY h
    ),
    th AS (
      SELECT LEAST(MAX(CASE WHEN in_a = 1 THEN h END),
                   MAX(CASE WHEN in_b = 1 THEN h END)) AS theta
      FROM per_h
    )
    SELECT (SELECT theta FROM th) AS theta,
           CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1
                          AND h < (SELECT theta FROM th) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_common_sample,
           round(SUM(CASE WHEN in_a = 1 AND in_b = 1
                           AND h < (SELECT theta FROM th) THEN 1 ELSE 0 END)
                 / ((SELECT theta FROM th) / {float(16**15)!r}), 4) AS est_common
    FROM per_h
    """,
    tags=("sketch", "kmv", "setop", "survey2.6"),
)
def kmv_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style set-INTERSECTION estimate from two KMV
    sketches: |view-users ∩ purchase-users| without ever joining the
    raw sets. θ = min(kth-min hash of A, kth-min hash of B); every
    common hash below θ is provably in both k-min sketches, so the
    sample count divided by the sampled fraction θ/2^60 estimates the
    true overlap. Like kmv_distinct_users, the estimate is a pure
    function of md5 order → deterministic, oracle-hash-identical
    (unlike engine-internal HLL/theta implementations).

    Plan shape: each side is a distinct-hash reduction followed by a
    global TakeOrdered(k) — only k longs per side survive to the
    driver-side-free final stage; the theta/sample combination runs as
    one unpartitioned window + aggregate over ≤ 2k rows. At 100 TB the
    two TakeOrdered(k) are map-side partial top-k merges (k longs per
    partition shuffled), and sketches for many segments would be built
    in ONE pass with a k-min UDAF, this exact form as its verifier."""
    ev = load_table(spark, sf_dir, "events")

    def kside(et: str, side: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == et)
            .select(F.expr(_KMV_HASH).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(_KMV_K)
            .select(F.lit(side).alias("side"), "h")
        )

    per_h = (
        kside("view", "a")
        .union(kside("purchase", "b"))
        .groupBy("h")
        .agg(
            F.max(F.when(F.col("side") == "a", 1).otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("side") == "b", 1).otherwise(0)).alias("in_b"),
        )
    )
    w = Window.partitionBy()
    theta = F.least(
        F.max(F.when(F.col("in_a") == 1, F.col("h"))).over(w),
        F.max(F.when(F.col("in_b") == 1, F.col("h"))).over(w),
    )
    common = F.when(
        (F.col("in_a") == 1) & (F.col("in_b") == 1) & (F.col("h") < F.col("theta")), 1
    ).otherwise(0)
    return (
        per_h.withColumn("theta", theta)
        .groupBy("theta")
        .agg(
            F.sum(common).alias("n_common_sample"),
            F.round(
                F.sum(common) / (F.col("theta").cast("double") / F.lit(float(16**15))),
                4,
            ).alias("est_common"),
        )
        .select("theta", "n_common_sample", "est_common")
    )


@register(
    "percentiles_value",
    oracle=f"""
    SELECT event_type,
           round(CAST(quantile_cont(value, 0.5) AS DOUBLE), 4) AS p50,
           round(CAST(quantile_cont(value, 0.9) AS DOUBLE), 4) AS p90
    FROM {EVENTS_NORM} GROUP BY event_type
    """,
    tags=("percentile", "survey2.6"),
)
def percentiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (sort-based; at 100 TB prefer approx_percentile —
    provided alongside as approx_distinct_users is for counts). Rounded
    to 4 decimals: both engines linear-interpolate, rounding absorbs the
    formula's last-ulp difference."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
    )


# ---------------------------------------------------------------------------
# scalar function library (reference §2.8 — arcon users write Rust
# closures for ALL of this; exposing Spark's built-in function library
# is the Spark-native answer, §2.9 design decision)
# ---------------------------------------------------------------------------


@register(
    "scalar_functions_text",
    oracle="""
    SELECT doc_id,
           upper(substr(text, 1, 12)) AS head_uc,
           CAST(length(text) AS BIGINT) AS n_chars_m,
           replace(substr(text, 1, 30), ' ', '_') AS underscored,
           reverse(substr(text, 1, 10)) AS head_rev,
           lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded_id,
           CAST(strpos(text, 'data') AS BIGINT) AS data_pos,
           CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_cp
    FROM documents
    """,
    tags=("functions", "string", "survey2.8"),
)
def scalar_functions_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface: substr/upper/length/replace/reverse/
    lpad/instr/ascii in one codegen'd projection."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head_uc"),
        F.length("text").cast("long").alias("n_chars_m"),
        F.replace(F.substring("text", 1, 30), F.lit(" "), F.lit("_")).alias("underscored"),
        F.reverse(F.substring("text", 1, 10)).alias("head_rev"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.instr("text", "data").cast("long").alias("data_pos"),
        F.ascii(F.substring("text", 1, 1)).cast("long").alias("first_cp"),
    )


@register(
    "scalar_functions_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS y,
           CAST(month(o_orderdate) AS BIGINT) AS m,
           CAST(quarter(o_orderdate) AS BIGINT) AS q,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
    FROM orders WHERE o_orderkey % 37 = 0
    """,
    tags=("functions", "date", "survey2.8"),
)
def scalar_functions_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface (the reference has NO date/time types
    at all — time is a raw u64, SURVEY §1.3)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


@register(
    "having_big_spenders",
    oracle=f"""
    SELECT user_id, {sql_msum('value', 2)} AS total
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY user_id
    HAVING {sql_msum('value', 2)} > 500.0
    """,
    tags=("having", "survey2.6"),
)
def having_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy("user_id")
        .agg(msum(F.col("value"), 2).alias("total"))
        .filter(F.col("total") > 500.0)
    )


@register(
    "exists_slow_orders",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL '90 days')
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "exists"),
)
def exists_slow_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join on the
    correlation key with the extra predicate in the join condition."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "ntile_percent_rank",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pr
    FROM orders
    WHERE o_orderkey % 11 = 0
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window_function", "rank"),
)
def ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank analytic functions (unique total order →
    deterministic; percent_rank's (rank-1)/(n-1) division is the same
    double op in both engines)."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 11 == 0)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.percent_rank().over(w).alias("pr"),
        )
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS prop_missing
    FROM events WHERE event_id % 7 = 0
    """,
    tags=("functions", "json", "survey2.8"),
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON path extraction over the events
    props column (the reference's JsonSchema source decode, SURVEY
    §2.1, generalized to per-field access)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        F.get_json_object("props", "$.missing").cast("long").alias("prop_missing"),
    )


@register(
    "deterministic_sample",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 2) < '14'
    """,
    tags=("sample", "survey2.9"),
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~8% sample via content hashing — unlike
    df.sample(seed) this survives repartitioning, engine changes, and
    incremental reprocessing (the property a 100 TB pipeline needs for
    stable held-out splits)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) < "14"
    ).select("event_id", "user_id", "event_type")


@register(
    "union_all_sources",
    oracle=f"""
    SELECT src, CAST(COUNT(*) AS BIGINT) AS n, {sql_msum('value', 2)} AS total
    FROM (
      SELECT 'hot' AS src, value FROM events WHERE value > 300.0
      UNION ALL
      SELECT 'err' AS src, value FROM events WHERE event_type = 'error'
    ) u GROUP BY src
    """,
    tags=("setop", "union_all", "survey2.9"),
)
def union_all_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL stream merge — structurally impossible in the
    reference (each operator has exactly one upstream, dfg.rs:61-114);
    first-class here."""
    ev = load_table(spark, sf_dir, "events")
    hot = ev.filter(F.col("value") > 300.0).select(F.lit("hot").alias("src"), "value")
    err = ev.filter(F.col("event_type") == "error").select(
        F.lit("err").alias("src"), "value"
    )
    return (
        hot.unionAll(err)
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n"), msum(F.col("value"), 2).alias("total"))
    )


@register(
    "tpch_q13ish",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
    tags=("tpch", "join", "outer"),
)
def tpch_q13ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer distribution: LEFT OUTER join (customers with
    zero qualifying orders count as c_count=0 — COUNT of a null key
    skips nulls identically in both engines) then a distribution over
    the counts. Two shuffles: custkey, then c_count (tiny)."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "full_outer_user_activity",
    oracle="""
    SELECT coalesce(p.user_id, v.user_id) AS user_id,
           p.user_id IS NOT NULL AS has_purchase,
           v.user_id IS NOT NULL AS has_view
    FROM (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 250.0) p
    FULL OUTER JOIN
         (SELECT DISTINCT user_id FROM events WHERE event_type = 'view' AND value > 250.0) v
      ON p.user_id = v.user_id
    """,
    tags=("join", "outer"),
)
def full_outer_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: presence matrix of two behavior cohorts,
    null-completion on both sides."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 250.0)
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .alias("p")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id")
        .distinct()
        .alias("v")
    )
    return p.join(v, F.col("p.user_id") == F.col("v.user_id"), "full_outer").select(
        F.coalesce(F.col("p.user_id"), F.col("v.user_id")).alias("user_id"),
        F.col("p.user_id").isNotNull().alias("has_purchase"),
        F.col("v.user_id").isNotNull().alias("has_view"),
    )


@register(
    "profile_events",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE value IS NULL) AS BIGINT) AS value_nulls,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS user_card,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS type_card,
           MIN(ts) AS ts_min, MAX(ts) AS ts_max,
           MIN(value) AS value_min, MAX(value) AS value_max,
           {sql_mavg('value', 2)} AS value_mean
    FROM {EVENTS_NORM}
    """,
    tags=("profile", "quality"),
)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling: row/null counts, key cardinalities, value and
    time ranges in ONE scan — the pre-flight every large-scale pipeline
    runs before training-data jobs. All aggregates are partial-friendly
    (one exchange of one row per partition)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("value_nulls"),
        F.countDistinct("user_id").alias("user_card"),
        F.countDistinct("event_type").alias("type_card"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        mavg(F.col("value"), 2).alias("value_mean"),
    )


# ---------------------------------------------------------------------------
# sessionization (batch), window frames, histograms
# ---------------------------------------------------------------------------


@register(
    "sessionize_events",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM {EVENTS_NORM}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("sessionization", "window_function"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap > 10 min starts a new session
    (lag → flag → running-sum session id → per-session aggregate).
    The batch analog of the streaming Session window (session_window_agg)
    and the classic two-window-pass sessionize used on event logs.
    Scale: both window passes and the final aggregate share ONE hash
    partitioning on user_id — a single shuffle; timestamps compared in
    integer microseconds so Spark and the oracle agree exactly."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    lag_us = F.unix_micros(F.lag("ts").over(w))
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(lag_us.isNull() | ((us - lag_us) > 600_000_000), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        (F.max(us) - F.min(us)).cast("long").alias("duration_us"),
    )


@register(
    "moving_avg_value_per_user",
    oracle=f"""
    SELECT user_id, event_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100.0
             / COUNT(*) OVER w AS moving_avg
    FROM {EVENTS_NORM}
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    tags=("window_function", "frame"),
)
def moving_avg_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over an explicit ROWS frame (3 preceding + current)
    — the bounded-frame analog of an IncrementalWindow fold. Sum runs in
    integer cents (cents_window_sum) because frame aggregation orders
    differ between engines; the divide-out is a deterministic double op."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    return ev.select(
        "user_id",
        "event_id",
        (
            F.sum(cents_window_sum(F.col("value"))).over(w).cast("double")
            / F.lit(100.0)
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


@register(
    "histogram_event_values",
    oracle=f"""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           CAST(CAST(floor(value / 50.0) AS BIGINT) * 50.0 AS DOUBLE) AS lo,
           CAST((CAST(floor(value / 50.0) AS BIGINT) + 1) * 50.0 AS DOUBLE) AS hi,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM {EVENTS_NORM}
    GROUP BY 1, 2, 3
    """,
    tags=("histogram", "aggregation"),
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (width 50) of event values — one map-side
    combinable hash aggregate; the profiling primitive behind data-skew
    and quality dashboards. floor(x/width) is IEEE-deterministic, so the
    bucketing matches the oracle bit-for-bit."""
    bucket = F.floor(F.col("value") / F.lit(50.0)).cast("long")
    return (
        load_table(spark, sf_dir, "events")
        .select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "bucket",
            (F.col("bucket") * F.lit(50.0)).alias("lo"),
            ((F.col("bucket") + F.lit(1)) * F.lit(50.0)).alias("hi"),
            "cnt",
        )
    )


@register(
    "histogram_equidepth_value",
    oracle=f"""
    WITH t AS (
      SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS bucket
      FROM {EVENTS_NORM}
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt,
           MIN(value) AS lo, MAX(value) AS hi
    FROM t GROUP BY 1
    """,
    tags=("histogram", "aggregation", "quantile"),
)
def histogram_equidepth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram: every bucket holds the same row
    count and reports its value range — the complement of the
    equi-width histogram for skewed columns, and the statistic behind
    range-partition boundary choice. ntile over (value, event_id) is a
    total order, so buckets are deterministic; lo/hi are raw MIN/MAX
    (no float arithmetic) so the oracle matches bit-for-bit.

    Scale shape (r7): NTILE over the raw event table is event-scale —
    through r6 it ran as a single-partition window. Now the global
    rank comes from io.two_phase_rank (repartitionByRange(value) —
    Spark's range partitioner IS an equi-depth sampler — plus
    per-partition rank and broadcast offsets) and NTILE(10) is
    recovered arithmetically from (rank, total) by io.ntile_from_rank;
    the only global window left is the #partitions-row offset
    table."""
    ev = load_table(spark, sf_dir, "events").select("value", "event_id")
    n_rows = ev.count()  # scalar: the decile split needs the total
    ranked = two_phase_rank(
        ev, [F.col("value").asc(), F.col("event_id").asc()], rank_name="__rn"
    )
    t = ranked.withColumn("__n", F.lit(n_rows)).select(
        "value", ntile_from_rank("__rn", "__n", 10).alias("bucket")
    )
    return t.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


@register(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val FROM (
      SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
      FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    )
    """,
    tags=("unpivot", "reshape"),
)
def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: four metric columns → (metric, val) rows via
    `stack` — the inverse of pivot_event_counts. ONE scan of the fact
    table producing 4 rows per input row inside whole-stage codegen;
    the oracle's equivalent UNION ALL spells out the same result with
    four scans (DuckDB lacks stack), which is exactly why melt matters
    at 100 TB: 1× read instead of k×."""
    return load_table(
        spark, sf_dir, "lineitem"
    ).selectExpr(
        "l_orderkey",
        "l_linenumber",
        """stack(4,
            'quantity', l_quantity,
            'extendedprice', l_extendedprice,
            'discount', l_discount,
            'tax', l_tax) AS (metric, val)""",
    )


# one SQL text, two engines: runs verbatim on Spark AND DuckDB
_PORTABLE_SQL = """
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(round(s_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
HAVING SUM(CAST(round(s_acctbal * 100) AS BIGINT)) <> 0
"""


@register(
    "sql_portable_text",
    oracle=_PORTABLE_SQL,
    tags=("sql", "survey2.9"),
)
def sql_portable_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: register the tables as views and execute ONE
    ANSI SQL string — the literal same text the DuckDB oracle runs
    (exact-integer money arithmetic keeps even the float column
    bit-identical). The reference has no SQL surface at all (SURVEY
    §2.9); on Spark the entire relational catalog is available through
    spark.sql against the same session catalog the DataFrame queries
    use."""
    from arcon_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_PORTABLE_SQL)


@register(
    "funnel_view_click_purchase",
    oracle=f"""
    WITH steps AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM {EVENTS_NORM} GROUP BY user_id
    )
    SELECT CAST(COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS BIGINT)
             AS n_view,
           CAST(COUNT(CASE WHEN t_view < t_click THEN 1 END) AS BIGINT)
             AS n_view_click,
           CAST(COUNT(CASE WHEN t_view < t_click AND t_click < t_purchase
                           THEN 1 END) AS BIGINT) AS n_view_click_purchase
    FROM steps
    """,
    tags=("funnel", "analytics"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: users progressing view → click → purchase in
    event-time order (first-occurrence ordering, the standard funnel
    approximation). One conditional-MIN hash aggregate per user, then a
    1-row rollup — two shuffles total, the second over |users| rows;
    NULL-safe strict inequalities make the step ordering deterministic."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    steps = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    return steps.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).cast("long").alias("n_view"),
        F.count(F.when(F.col("t_view") < F.col("t_click"), 1))
        .cast("long")
        .alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        )
        .cast("long")
        .alias("n_view_click_purchase"),
    )


@register(
    "retention_weekly_cohorts",
    oracle=f"""
    WITH weekly AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      FROM {EVENTS_NORM}
    ),
    cohort AS (
      SELECT user_id, MIN(week) AS first_week FROM weekly GROUP BY user_id
    )
    SELECT CAST(c.first_week AS BIGINT) AS first_week,
           CAST(w.week - c.first_week AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM weekly w JOIN cohort c ON w.user_id = c.user_id
    GROUP BY 1, 2
    """,
    tags=("retention", "cohort", "analytics"),
)
def retention_weekly_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-active week, counted in
    each later week they return — the triangle behind every retention
    curve. Weeks are integer epoch-microsecond buckets (no calendar
    arithmetic to disagree on). The distinct → cohort-min → join-back
    chain shares one hash partitioning on user_id; the final aggregate
    shuffles only (first_week, offset) pairs."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    weekly = ev.select(
        "user_id", (F.unix_micros("ts") / F.lit(604_800_000_000)).cast("long").alias("week")
    ).distinct()
    cohort = weekly.groupBy("user_id").agg(F.min("week").alias("first_week"))
    return (
        weekly.join(cohort, "user_id")
        .groupBy(
            F.col("first_week").cast("long").alias("first_week"),
            (F.col("week") - F.col("first_week")).cast("long").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )


@register(
    "priority_region_grid",
    oracle="""
    WITH pr AS (SELECT DISTINCT o_orderpriority FROM orders),
         st AS (SELECT DISTINCT o_orderstatus FROM orders),
         cnt AS (
           SELECT o_orderpriority, o_orderstatus,
                  CAST(COUNT(*) AS BIGINT) AS n
           FROM orders GROUP BY o_orderpriority, o_orderstatus
         )
    SELECT g.o_orderpriority, g.o_orderstatus,
           COALESCE(cnt.n, 0) AS n
    FROM (SELECT * FROM pr CROSS JOIN st) g
    LEFT JOIN cnt USING (o_orderpriority, o_orderstatus)
    """,
    tags=("cross_join", "grid", "reporting", "survey2.9"),
)
def priority_region_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense reporting grid: CROSS JOIN of the two dimension domains
    LEFT-joined with the fact counts so empty cells report 0 instead of
    vanishing — the zero-preserving pivot every dashboard needs, and the
    registry's cross-join coverage (completing the join-type matrix:
    inner/left/full/semi/anti/cross). Both domains are distinct-agg
    outputs of the same scan (a handful of rows), so the cross product
    and the joinback are broadcast-sized at any fact scale."""
    orders = load_table(spark, sf_dir, "orders")
    pr = orders.select("o_orderpriority").distinct()
    st = orders.select("o_orderstatus").distinct()
    cnt = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        pr.crossJoin(st)
        .join(cnt, ["o_orderpriority", "o_orderstatus"], "left")
        .select(
            "o_orderpriority",
            "o_orderstatus",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
        )
    )


@register(
    "source_csv_json_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_csv,
           CAST(COUNT(*) AS BIGINT) AS n_json
    FROM events GROUP BY event_type
    """,
    tags=("sources", "csv", "json", "survey2.1"),
)
def source_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV and JSON source readers proven against the parquet truth:
    events round-trip through both text formats (explicit schema, no
    inference — inference is a full extra scan at 100 TB) and each
    format's per-type counts must match the parquet-derived oracle.
    Covers SURVEY §2.1 LocalFileSource's csv/json decode surface on the
    batch path (the streaming path is test_local_file_source_text_stream)."""
    import tempfile

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    root = scratch_dir("arcon_srcfmt_")
    ev.write.option("header", True).csv(root + "/csv")
    ev.write.json(root + "/json")
    schema = "event_id long, user_id long, event_type string"
    csv = spark.read.schema(schema).option("header", True).csv(root + "/csv")
    js = spark.read.schema(schema).json(root + "/json")
    return (
        csv.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_csv"))
        .join(
            js.groupBy("event_type").agg(
                F.count(F.lit(1)).cast("long").alias("n_json")
            ),
            "event_type",
        )
    )


@register(
    "corr_quantity_price_by_flag",
    oracle="""
    WITH u AS (
      SELECT l_returnflag,
             CAST(round(l_quantity * 100) AS BIGINT) AS qx,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS qy
      FROM lineitem
    ),
    m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(qx AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(qy AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(qx * qx AS HUGEINT)) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(qy * qy AS HUGEINT)) AS DOUBLE) AS syy,
             CAST(SUM(CAST(qx * qy AS HUGEINT)) AS DOUBLE) AS sxy
      FROM u GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           sx, sy, sxx, syy, sxy,
           (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr
    FROM m
    """,
    tags=("aggregate", "statistics", "correlation"),
)
def corr_quantity_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from EXACT integer moments: per-row cents
    units (IEEE-deterministic round), five exact integer sums per
    group, then one fixed double expression tree — every double op
    (cast, *, -, /, sqrt) is correctly rounded by IEEE-754, so the
    final corr is bit-identical across engines, which built-in corr()
    (running double accumulation, order-dependent) can never be.

    Moments are the mergeable form: the five sums are map-side
    combinable, so the shuffle carries 5 numbers per (group,
    partition). At 100 TB the decimal(38) sums hold to 38 digits
    (qx*qy ≤ 5e10/row → ~1e27 at 1e16 rows, still exact); the raw
    moments are also emitted so downstream can merge groups without
    rescanning."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qx"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("qy"),
    )
    dec = lambda c: F.sum(c.cast("decimal(38,0)")).cast("double")  # noqa: E731
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec(F.col("qx")).alias("sx"),
        dec(F.col("qy")).alias("sy"),
        dec(F.col("qx") * F.col("qx")).alias("sxx"),
        dec(F.col("qy") * F.col("qy")).alias("syy"),
        dec(F.col("qx") * F.col("qy")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        (
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("corr"),
    )


@register(
    "transition_matrix_events",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM {EVENTS_NORM}
    ),
    pairs AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
    FROM pairs
    """,
    tags=("analytics", "markov", "window_function"),
)
def transition_matrix_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral transition matrix (first-order Markov): per user,
    each event's predecessor type via lag over (ts, event_id), then
    (prev → next) counts and row-normalized transition probabilities.
    The probability is ONE double division of two exact integers —
    deterministic cross-engine. Plan: one shuffle on user_id for the
    lag window, one hash agg on the (prev, next) pair (map-side
    combinable), and the normalizing SUM() OVER is a window over the
    tiny |types|² result — at 100 TB the only data-sized costs are the
    two exchanges, both on well-distributed keys."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("event_type", F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    norm = W.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(norm).cast("double")).alias("p"),
    )


@register(
    "rfm_customer_segments",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             CAST(date_diff('day', max(o_orderdate), TIMESTAMP '1998-12-01')
                  AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             {sql_msum('o_totalprice', 2)} AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT custkey, recency_days, frequency, monetary,
             ntile(5) OVER (ORDER BY recency_days ASC, custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency DESC, custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary DESC, custkey) AS m_score
      FROM rfm
    )
    SELECT custkey, recency_days, frequency, monetary,
           CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
                WHEN r_score <= 2 THEN 'recent'
                WHEN f_score <= 2 THEN 'loyal'
                WHEN r_score >= 4 AND f_score >= 4 THEN 'at_risk'
                ELSE 'regular' END AS segment
    FROM scored
    """,
    tags=("analytics", "rfm", "segmentation"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation:
    per-customer aggregates quintile-scored with ntile and mapped to
    segments — the standard CRM/marketing analytics operator. Monetary
    goes through exact integer cents (plans/compat); every ntile
    ordering carries the custkey tiebreak so quintile assignment is a
    total order (cross-engine identical).

    Scale shape (r7): the customer dimension is NOT bounded (billions
    of customers at 100 TB), so the three quintile scores no longer
    run as single-partition ntile windows — each is io.two_phase_rank
    (range exchange + per-partition rank + broadcast offsets) chained
    over the same frame, with NTILE(5) recovered arithmetically from
    (global rank, total count) by io.ntile_from_rank; the only global
    windows left are the three #partitions-row offset tables. One
    aggregation exchange on custkey feeds the chain."""
    orders = load_table(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.datediff(
            F.lit("1998-12-01").cast("timestamp"), F.max("o_orderdate")
        ).cast("long").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        msum(F.col("o_totalprice"), 2).alias("monetary"),
    # feeds the count AND the rank chain (house multi-consumer rule)
    ).localCheckpoint(eager=True)
    n_cust = rfm.count()  # scalar: the quintile split needs the total
    s = two_phase_rank(
        rfm, [F.col("recency_days").asc(), F.col("custkey").asc()], rank_name="__rr"
    )
    s = two_phase_rank(
        s, [F.col("frequency").desc(), F.col("custkey").asc()], rank_name="__rf"
    )
    s = two_phase_rank(
        s, [F.col("monetary").desc(), F.col("custkey").asc()], rank_name="__rm"
    )
    scored = s.withColumn("__n", F.lit(n_cust)).select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        ntile_from_rank("__rr", "__n", 5).alias("r_score"),
        ntile_from_rank("__rf", "__n", 5).alias("f_score"),
        ntile_from_rank("__rm", "__n", 5).alias("m_score"),
    )
    return scored.select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "at_risk")
        .otherwise("regular")
        .alias("segment"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog with deterministic registers — the value-checkable HLL


_HLL_P = 6  # 2^6 = 64 registers; stderr ~ 1.04/sqrt(64) = 13%
_HLL_M = 1 << _HLL_P
_HLL_ALPHA = 0.709  # exact constant for m=64 (Flajolet et al. 2007)
_HLL_SCALE_EXP = 62  # registers summed as 2^(62 - M) integer units
_HLL_SCALE = 1 << _HLL_SCALE_EXP


@register(
    "hll_distinct_users",
    oracle=f"""
    WITH h AS (
      SELECT event_type,
             CAST('0x' || substring(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15)
                  AS BIGINT) AS h
      FROM {EVENTS_NORM}
    ),
    regs AS (
      SELECT event_type, h % {_HLL_M} AS bucket,
             MAX(CASE WHEN h >> {_HLL_P} = 0 THEN 55
                      ELSE 55 - length(bin(h >> {_HLL_P})) END) AS m
      FROM h GROUP BY event_type, h % {_HLL_M}
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS present,
             SUM(CAST((CAST(1 AS BIGINT) << ({_HLL_SCALE_EXP} - m)) AS HUGEINT))
               AS s_present
      FROM regs GROUP BY event_type
    )
    SELECT s.event_type,
           CAST({_HLL_M} - present AS BIGINT) AS v_zero,
           round({_HLL_ALPHA} * {_HLL_M * _HLL_M}.0 * {_HLL_SCALE}.0
                 / CAST(s_present + CAST({_HLL_M} - present AS HUGEINT)
                        * CAST({_HLL_SCALE} AS HUGEINT) AS DOUBLE), 3)
             AS est_users,
           e.exact_users
    FROM s JOIN (SELECT event_type,
                        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
                 FROM {EVENTS_NORM} GROUP BY event_type) e
      ON s.event_type = e.event_type
    """,
    tags=("sketch", "hll", "survey2.6"),
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count per event_type with DETERMINISTIC,
    cross-engine-checkable register values — the open-box companion to
    approx_distinct_users (whose HLL++ sketch bytes are engine-private,
    so the driver can only rows-check it). Same md5-keyed hash family
    as kmv_distinct_users.

    Register math is exact integer end-to-end: rho comes from the bin()
    string length (identical in Spark and DuckDB — neither pads), each
    register contributes 2^(62-M) integer units to the harmonic sum, the
    64 - |present| zero registers contribute 2^62 each, and the only
    float ops are the final constant-folded alpha*m^2*2^62 numerator and
    one correctly-rounded division. No linear-counting branch: ln() is
    libm-dependent, so the raw estimator plus the v_zero column (what
    the correction would key on) keeps the result portable.

    Scale shape: identical to a production HLL — one map-side-combinable
    max() aggregate to 64 rows per group, then an O(groups) reduction.
    The registers themselves are the mergeable sketch: union = MAX per
    bucket across shards, exactly what the first groupBy computes."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.expr(
            "cast(conv(substring(md5(concat('hll:', cast(user_id as string))), 1, 15),"
            " 16, 10) as bigint)"
        ).alias("h"),
    )
    w = F.shiftright(F.col("h"), _HLL_P)
    rho = F.when(w == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(w)))
    regs = (
        h.select("event_type", (F.col("h") % _HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"))
    )
    s = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(
            F.expr(f"cast(shiftleft(1L, {_HLL_SCALE_EXP} - m) as decimal(38,0))")
        ).alias("s_present"),
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("exact_users"))
    s_scaled = F.col("s_present") + (F.lit(_HLL_M) - F.col("present")).cast(
        "decimal(38,0)"
    ) * F.lit(_HLL_SCALE).cast("decimal(38,0)")
    return (
        s.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            (F.lit(_HLL_M) - F.col("present")).cast("long").alias("v_zero"),
            F.round(
                F.lit(_HLL_ALPHA)
                * F.lit(float(_HLL_M * _HLL_M))
                * F.lit(float(_HLL_SCALE))
                / s_scaled.cast("double"),
                3,
            ).alias("est_users"),
            "exact_users",
        )
    )


# ---------------------------------------------------------------------------
# Recursive CTE (Spark 4 WITH RECURSIVE) — portable text, both engines
# ---------------------------------------------------------------------------

_RECURSIVE_SQL = """
WITH RECURSIVE edges AS (
  SELECT n_nationkey AS src, (n_nationkey * 2) % 25 AS dst FROM nation
  UNION ALL
  SELECT n_nationkey, (n_nationkey * 2 + 1) % 25 FROM nation
),
reach(node, dist) AS (
  SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
  UNION ALL
  SELECT CAST(e.dst AS BIGINT), r.dist + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.dist < 5
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_paths
FROM reach GROUP BY node
"""


@register(
    "sql_recursive_reach",
    oracle=_RECURSIVE_SQL,
    tags=("sql", "iterative", "graph", "survey2.9"),
)
def sql_recursive_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE — Spark 4's native recursive CTE, run as ONE SQL
    text verbatim on both engines (like sql_portable_text): 5-hop
    reachability with path counts over a deterministic out-degree-2
    doubling graph on the nation keys. Complements the driver-loop
    iteration pattern (graph_bfs_distances, pagerank_trade_network):
    the loop lives in the ENGINE — Catalyst plans the fixpoint, one
    UnionLoop node instead of N unrolled joins, and the same text is
    the oracle. Spark's recursion currently supports UNION ALL bodies
    only (no semi-naive UNION dedup), so the recursion must bound
    depth/fan-out explicitly — exactly how this query's `dist < 5`
    guard works; dedup happens in the outer GROUP BY. At scale prefer
    the driver loop for wide graphs (checkpointable, AQE-replanned per
    round); the recursive form wins for deep sparse recursions
    (hierarchies, BOM explosions) where per-round job submission
    dominates."""
    from arcon_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


# ---------------------------------------------------------------------------
# VARIANT (Spark 4 semi-structured type)
# ---------------------------------------------------------------------------


@register(
    "variant_json_extract",
    oracle=f"""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           CAST(json_extract(props, '$.missing') AS BIGINT) AS prop_missing
    FROM {EVENTS_NORM}
    """,
    tags=("json", "variant", "survey2.8"),
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    parse_json once into the binary variant encoding, then typed
    variant_get path extraction — the modern engine-native path for
    ragged JSON (columnar-shredded, no per-access re-parse), vs the
    older get_json_object string re-scan (scalar_functions_json).
    Missing paths yield NULL, matching the JSON oracle. At 100 TB the
    parse happens once per row in the scan projection and every
    downstream access is a binary offset lookup; with Parquet variant
    shredding the reads prune to the accessed paths."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("prop_k"),
        (F.expr("variant_get(parse_json(props), '$.k', 'long')") % 10).alias("k_bucket"),
        F.expr("variant_get(parse_json(props), '$.missing', 'long')").alias(
            "prop_missing"
        ),
    )


# ---------------------------------------------------------------------------
# Mergeable histogram quantile sketch
# ---------------------------------------------------------------------------

_HQ_BINS = 128
_HQ_CENTS_PER_BIN = 400  # domain [0, 512.00) dollars → 128 bins of 4.00


@register(
    "quantile_histogram_sketch",
    oracle=f"""
    WITH hist AS (
      SELECT event_type,
             LEAST({_HQ_BINS - 1},
                   CAST(round(value * 100) AS BIGINT) // {_HQ_CENTS_PER_BIN}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM {EVENTS_NORM} GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, bin, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS total
      FROM hist
    ),
    probes AS (
      SELECT c.*, q.q, q.q * CAST(total AS DOUBLE) AS target
      FROM cum c, UNNEST([CAST('0.5e0' AS DOUBLE), CAST('0.9e0' AS DOUBLE)]) AS q(q)
    )
    SELECT event_type, q,
           (CAST(bin * {_HQ_CENTS_PER_BIN} AS DOUBLE)
            + (target - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE)
              * {_HQ_CENTS_PER_BIN}) / 100.0 AS est_value
    FROM probes
    WHERE CAST(cum - cnt AS DOUBLE) < target AND target <= CAST(cum AS DOUBLE)
    """,
    tags=("sketch", "quantile", "percentile", "survey2.6"),
)
def quantile_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile estimation: a fixed 128-bin equi-width
    histogram per event_type (counts are plain sums — map-side
    partial, unionable across shards/epochs, the property
    percentile()'s full sort and approx_percentile's engine-internal
    KLL both lack cross-engine), then p50/p90 by linear interpolation
    inside the crossing bin. All counts exact integers; the
    interpolation is a fixed double expression → deterministic,
    hash-identical to the oracle. Accuracy is bounded by bin width
    (±4.00 here); percentiles_value keeps the exact sorted answer as
    its verifier.

    At 100 TB this is the quantile plan: one histogram aggregate
    (128 longs per group per partition shuffle), quantiles read off
    the tiny cumulative frame; streaming twin = same counts in
    update mode."""
    ev = load_table(spark, sf_dir, "events")
    hist = (
        ev.select(
            "event_type",
            F.least(
                F.lit(_HQ_BINS - 1),
                F.expr(f"cast(round(value * 100) as bigint) div {_HQ_CENTS_PER_BIN}"),
            ).alias("bin"),
        )
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bin",
        "cnt",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(wall).alias("total"),
    )
    probes = cum.select(
        "*", F.explode(F.array(F.lit(0.5), F.lit(0.9))).alias("q")
    ).withColumn("target", F.col("q") * F.col("total").cast("double"))
    prev = (F.col("cum") - F.col("cnt")).cast("double")
    return probes.filter(
        (prev < F.col("target")) & (F.col("target") <= F.col("cum").cast("double"))
    ).select(
        "event_type",
        "q",
        (
            (
                (F.col("bin") * _HQ_CENTS_PER_BIN).cast("double")
                + (F.col("target") - prev)
                / F.col("cnt").cast("double")
                * _HQ_CENTS_PER_BIN
            )
            / 100.0
        ).alias("est_value"),
    )


# ---------------------------------------------------------------------------
# Deterministic per-group reservoir sample
# ---------------------------------------------------------------------------

_RESERVOIR_K = 20


@register(
    "reservoir_sample_per_type",
    oracle=f"""
    SELECT event_type, event_id, user_id
    FROM (
      SELECT event_type, event_id, user_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5('rs:' || CAST(event_id AS VARCHAR)), event_id) AS rn
      FROM events
    ) WHERE rn <= {_RESERVOIR_K}
    """,
    tags=("sample", "sampling", "per_group"),
)
def reservoir_sample_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-group sample, reservoir semantics without the
    RNG: exactly {_RESERVOIR_K} rows per event_type, chosen by md5
    rank over the unique id — uniform over the group (md5 order is
    independent of everything else about the row), reproducible across
    runs/engines/partitionings, and mergeable (the k smallest hashes
    of a union = merge of per-shard k-smallest — the same property the
    KMV sketch exploits, so shards can sample independently and
    combine losslessly at 100 TB). The rank filter compiles to
    WindowGroupLimit: each group materializes only k rows past the
    exchange. This is the per-GROUP companion of deterministic_sample
    (corpus-wide Bernoulli by hash threshold)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.concat(F.lit("rs:"), F.col("event_id").cast("string"))), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RESERVOIR_K)
        .select("event_type", "event_id", "user_id")
    )


# ---------------------------------------------------------------------------
# RANGE window frame (value-based, event-time trailing aggregate)
# ---------------------------------------------------------------------------


@register(
    "range_frame_trailing_sum",
    oracle=f"""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(round(value * 100) AS HUGEINT)) OVER (
                  PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_cents,
           CAST(COUNT(*) OVER (
                  PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_n
    FROM {EVENTS_NORM}
    """,
    tags=("window_function", "frame", "range", "timeseries"),
)
def range_frame_trailing_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame — the VALUE-based frame type (vs the ROWS
    frames used by moving_avg/EWMA): each event's trailing sum/count
    over the preceding HOUR of event time, however many rows that is —
    irregular-series rolling metrics need exactly this (a ROWS frame
    would mix lookback horizons). Spark expresses interval ranges as
    rangeBetween over unix_micros; DuckDB writes RANGE BETWEEN
    INTERVAL — same frame semantics, and ties on the ORDER value are
    both included by RANGE's peer rule in both engines, so exact
    integer cents hash-match. One exchange on user_id, sort reused by
    both window functions."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.expr("cast(round(value * 100) as long)"))
        .over(w)
        .cast("long")
        .alias("trailing_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_n"),
    )


@register(
    "sql_pipe_syntax",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS HUGEINT)) AS DOUBLE) / 100.0
             AS revenue
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    tags=("sql", "pipe_syntax", "survey2.9"),
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4's `|>` operators, from the SQL:202x /
    GoogleSQL pipe-query proposal): the same open-orders revenue
    rollup written as a linear FROM → WHERE → AGGREGATE pipeline.
    Pipe stages lower to the identical Catalyst plan as the classic
    formulation (filter pushdown, partial aggregation all intact) —
    this registers the parsing surface, not a new execution path; the
    oracle is the classic-SQL spelling of the same query, proving the
    two front ends agree to the last cent."""
    from arcon_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(round(o_totalprice * 100) AS DECIMAL(38,0))) AS DOUBLE)
               / 100.0 AS revenue
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, revenue
        """
    )


@register(
    "session_top_paths",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM {EVENTS_NORM}
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sess GROUP BY user_id, session_id
    ),
    counts AS (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
      FROM paths GROUP BY path
    )
    SELECT path, n_sessions FROM counts
    QUALIFY row_number() OVER (ORDER BY n_sessions DESC, path) <= 20
    """,
    tags=("sessionization", "sequence", "topk", "analytics"),
)
def session_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: the 20 most common session journeys,
    where a journey is the '>'-joined event_type sequence of one
    session (same 10-min-gap sessionization as sessionize_events).
    This is the product-analytics "top paths" report (Amplitude/
    Mixpanel Pathfinder) — and the input representation for sequence
    mining (PrefixSpan's sequence database IS this frame pre-GROUP).

    Plan: the session passes reuse sessionize's single user_id
    partitioning; the path string is an order-pinned array_join over
    collect_list sorted by (ts, event_id) — a deterministic total
    order within each session, so both engines build the identical
    string. The path→count aggregate hash-exchanges path strings
    (bounded by session length × type-name size; at 100 TB hash the
    path to a 64-bit key for the exchange and join names back for the
    top-20 only). Top-k is TakeOrdered, tie-broken by path."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    lag_us = F.unix_micros(F.lag("ts").over(w))
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    flagged = ev.withColumn(
        "new_sess",
        F.when(lag_us.isNull() | ((us - lag_us) > 600_000_000), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.expr("transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)"),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    return counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(20)


@register(
    "golden_record_customers",
    oracle="""
    WITH keyed AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g') AS match_key
      FROM customer
    ),
    seg_votes AS (
      SELECT match_key, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS votes
      FROM keyed GROUP BY match_key, c_mktsegment
    ),
    seg_pick AS (
      SELECT match_key, c_mktsegment FROM (
        SELECT match_key, c_mktsegment,
               row_number() OVER (PARTITION BY match_key
                                  ORDER BY votes DESC, c_mktsegment) AS rn
        FROM seg_votes) WHERE rn = 1
    )
    SELECT k.match_key,
           MIN(k.c_custkey) AS golden_id,
           CAST(COUNT(*) AS BIGINT) AS n_sources,
           MAX(k.c_name) AS name,
           CAST(MAX(CAST(round(k.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS acctbal,
           MAX(s.c_mktsegment) AS mktsegment
    FROM keyed k JOIN seg_pick s ON s.match_key = k.match_key
    GROUP BY k.match_key
    """,
    tags=("entity_resolution", "dedup", "survivorship", "mdm"),
)
def golden_record_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record construction (MDM survivorship): customer rows
    sharing a normalized match key collapse to ONE record with
    field-level survivorship rules — smallest key as the stable
    golden id, lexicographically-greatest name (proxy for
    most-complete), highest balance, and MAJORITY-VOTE market segment
    (ties → alphabetical). This is the step AFTER matching
    (fuzzy_match_customers finds the pairs; the normalized key here
    is the transitive-closure shortcut for equality-class matches —
    swap in dedup_connected_clusters labels for fuzzy classes).

    Plan: the vote needs its own (key, segment) aggregate +
    WindowGroupLimit argmax; every other rule folds into ONE hash
    aggregate on the match key — survivorship is deliberately
    expressed as commutative aggregates (MIN/MAX/majority) precisely
    so the merge is order-independent and distributable; rules like
    'most recent' become max_by(ts) in the same shape. Money goes
    through integer cents so the float column hash-matches."""
    keyed = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment",
        F.regexp_replace(F.lower("c_name"), "[^a-z0-9]", "").alias("match_key"),
    )
    votes = keyed.groupBy("match_key", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("votes")
    )
    wv = Window.partitionBy("match_key").orderBy(F.desc("votes"), F.asc("c_mktsegment"))
    pick = (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("match_key", F.col("c_mktsegment").alias("seg_pick"))
    )
    # string survivorship via WindowGroupLimit row picks, NOT MAX(string):
    # string extrema inside a hash aggregate demote the whole aggregate to
    # SortAggregate (MEASURE.md session-5; banned registry-wide)
    wn = Window.partitionBy("match_key").orderBy(F.desc("c_name"), F.asc("c_custkey"))
    name_pick = (
        keyed.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select("match_key", F.col("c_name").alias("name"))
    )
    base = keyed.groupBy("match_key").agg(
        F.min("c_custkey").alias("golden_id"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        (F.max(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double") / 100.0).alias("acctbal"),
    )
    return (
        base.join(name_pick, "match_key")
        .join(pick, "match_key")
        .select(
            "match_key", "golden_id", "n_sources", "name", "acctbal",
            F.col("seg_pick").alias("mktsegment"),
        )
    )


_AQP_MOD = 10  # 1-in-10 deterministic hash sample


@register(
    "sample_estimate_audit",
    oracle=f"""
    WITH s AS (
      SELECT event_type, value FROM events
      WHERE CAST('0x' || substring(md5('aqp:' || CAST(event_id AS VARCHAR)), 1, 6)
                 AS BIGINT) % {_AQP_MOD} = 0
    ),
    est AS (
      SELECT event_type,
             CAST(COUNT(*) * {_AQP_MOD} AS BIGINT) AS est_rows,
             CAST(SUM(CAST(round(value * 100) AS HUGEINT)) * {_AQP_MOD} AS BIGINT)
               AS est_cents
      FROM s GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(round(value * 100) AS HUGEINT)) AS BIGINT) AS cents
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, x.n_rows, e.est_rows,
           CAST(e.est_rows - x.n_rows AS BIGINT) AS row_err,
           x.cents, e.est_cents,
           CAST(e.est_cents - x.cents AS BIGINT) AS cents_err
    FROM est e JOIN exact x ON x.event_type = e.event_type
    """,
    tags=("sampling", "aqp", "audit", "scale_pattern"),
)
def sample_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing (AQP) with its error receipt: a
    deterministic 1-in-10 hash sample (md5 of event_id — reproducible
    across engines AND across runs, unlike TABLESAMPLE's RNG)
    estimates per-type row counts and revenue by inverse-probability
    scaling; the audit joins the exact aggregates alongside and emits
    the signed errors. At 100 TB the sample-side scan is the only
    full-data pass you pay interactively — BlinkDB/Quickr-style
    dashboards run on exactly this plan shape, and the honest
    error column is what makes the speedup defensible. Hash-sampling
    beats row-position sampling because it composes: the SAME rows
    are sampled on every replica, so sampled JOINs stay consistent
    (join both sides' samples on the same hashed key universe)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    cents = F.round(F.col("value") * 100).cast("decimal(38,0)")
    sample = ev.filter(
        F.expr(
            f"cast(conv(substring(md5(concat('aqp:', cast(event_id as string))), 1, 6), 16, 10) as bigint) % {_AQP_MOD} = 0"
        )
    )
    est = sample.groupBy("event_type").agg(
        (F.count(F.lit(1)) * _AQP_MOD).cast("long").alias("est_rows"),
        (F.sum(cents) * _AQP_MOD).cast("long").alias("est_cents"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(cents).cast("long").alias("cents"),
    )
    return est.join(exact, "event_type").select(
        "event_type",
        "n_rows",
        "est_rows",
        (F.col("est_rows") - F.col("n_rows")).cast("long").alias("row_err"),
        "cents",
        "est_cents",
        (F.col("est_cents") - F.col("cents")).cast("long").alias("cents_err"),
    )
