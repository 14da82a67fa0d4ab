"""Remaining TPC-H query shapes (q4/q8/q9/q11/q12/q15..q22), adapted to
the driver's synthetic star schema.

The reference (cda-group/arcon) has no relational layer at all — no
joins, subqueries, or sorts (SURVEY.md §2.9, verified against
arcon/src/dataflow/dfg.rs:61-114 which only builds linear chains) — so
this module is part of the Spark-native "absences filled" surface: the
full TPC-H shape catalog expressed as Catalyst plans.

Schema adaptations (the synthetic tables have no partsupp, no
l_shipmode/l_commitdate/l_receiptdate, no p_container/p_mfgr): each
query keeps the canonical plan SHAPE (the join graph, subquery
structure, and aggregation pattern that matter for planning) and swaps
the missing column for an available proxy; the docstring of each query
names the substitution.

Scale notes (100 TB):
- Dimension sides (part 1/30 of lineitem, supplier 1/600, nation,
  per-group aggregates of dimensions) are broadcast explicitly.
- Fact-fact joins (orders⋈lineitem) shuffle on the join key only after
  pushed-down date/flag filters cut the scan.
- EXISTS / NOT EXISTS become left_semi / left_anti joins — Spark
  plans both without materializing the probe side.
- All money aggregates use exact integer units (plans.compat) so
  map-side partial aggregation stays on and results are identical at
  any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcon_spark.io import load_table
from arcon_spark.plans.compat import mavg, msum, sql_mavg, sql_msum
from arcon_spark.plans.registry import register


def _ts(s: str) -> F.Column:
    return F.lit(f"{s} 00:00:00").cast("timestamp")


# ---------------------------------------------------------------------------
# Q4 — order priority checking (EXISTS → left_semi)
# ---------------------------------------------------------------------------


@register(
    "tpch_q4ish",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
    tags=("tpch", "semi_join", "exists"),
)
def tpch_q4ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking. Adaptation: the late-delivery
    predicate l_commitdate < l_receiptdate (columns absent) becomes
    l_shipdate > o_orderdate. EXISTS → left_semi join with a
    cross-table condition; the quarter filter is pushed to the orders
    scan so the semi join probes only ~1/20 of orders."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ts("1997-07-01"))
            & (F.col("o_orderdate") < _ts("1997-10-01"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (conditional agg over a 5-way join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q8ish",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(
             CAST(SUM(CAST(round(CASE WHEN sn.n_name = 'NATION_2'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0 END * 10000) AS HUGEINT)) AS DOUBLE)
             / CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS HUGEINT)) AS DOUBLE),
           6) AS mkt_share
    FROM lineitem
      JOIN orders   ON o_orderkey  = l_orderkey
      JOIN customer ON c_custkey   = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey
      JOIN supplier ON s_suppkey   = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE r_name = 'ASIA'
    GROUP BY 1
    """,
    tags=("tpch", "join", "conditional_agg"),
)
def tpch_q8ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_2's share of supplier
    revenue to ASIA-region customers, by order year. Adaptation: no
    p_type filter (part column domain differs); the 7-table join graph
    and share-ratio aggregation are the canonical shape. All dimension
    hops (customer-nation-region, supplier-nation) broadcast; the only
    wide exchange is lineitem⋈orders then ⋈customer."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.alias("cn")
    sn = nation.alias("sn")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    units = lambda c: F.sum(F.round(c * 10000).cast("decimal(38,0)")).cast("double")  # noqa: E731
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(region), F.col("cn.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                units(F.when(F.col("sn.n_name") == "NATION_2", vol).otherwise(F.lit(0.0)))
                / units(vol),
                6,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit (expression agg over join, grouped by nation/year)
# ---------------------------------------------------------------------------


@register(
    "tpch_q9ish",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           {sql_msum('l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity', 4)}
             AS sum_profit
    FROM lineitem
      JOIN part     ON p_partkey  = l_partkey
      JOIN supplier ON s_suppkey  = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY 1, 2
    """,
    tags=("tpch", "join", "aggregate"),
)
def tpch_q9ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit by supplier nation and year.
    Adaptation: no partsupp → supply cost proxied as
    0.1 * p_retailprice per unit (same expression both engines, so the
    row-level doubles are bit-identical before the exact-integer sum).
    part/supplier/nation broadcast; lineitem⋈orders is the one
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(msum(amount, 4).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock (scalar-subquery threshold over grouped value)
# ---------------------------------------------------------------------------


@register(
    "tpch_q11ish",
    oracle=f"""
    WITH shipped AS (
      SELECT l_partkey, l_quantity * p_retailprice AS v
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN part     ON p_partkey = l_partkey
      WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM supplier)
    )
    SELECT l_partkey AS p_partkey, {sql_msum('v', 2)} AS part_value
    FROM shipped
    GROUP BY l_partkey
    HAVING {sql_msum('v', 2)} >
           (SELECT {sql_msum('v', 2)} * 0.001 FROM shipped)
    """,
    tags=("tpch", "subquery", "aggregate"),
)
def tpch_q11ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock: parts whose shipped value (for one
    nation's suppliers) exceeds 0.1% of that nation's total. Adaptation:
    no partsupp → value measured from lineitem flow (qty × retailprice).
    The scalar subquery is a 1-row global aggregate broadcast against
    the per-part aggregate — both sides reuse ONE shuffled base frame
    (cached logical subtree), so the fact table is read and filtered
    once. Threshold and part values are the identical exact-integer
    expression in both engines, making the > comparison deterministic.
    The nation is picked data-dependently (min s_nationkey among
    suppliers — a second scalar subquery, Q11's flavor; numeric MIN so
    the pick stays a hash aggregate, not a MIN(string) SortAggregate)
    so the result is non-degenerate at every scale factor: a constant
    nation is empty at sf0.001's 10-supplier population and a 0-row
    result is a trivially-passing value hash."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    picked = supp.agg(F.min("s_nationkey").alias("nk"))
    supp_pick = (
        supp.join(F.broadcast(picked), supp.s_nationkey == F.col("nk"))
        .select("s_suppkey")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    shipped = (
        li.join(F.broadcast(supp_pick), li.l_suppkey == supp_pick.s_suppkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_partkey", (F.col("l_quantity") * F.col("p_retailprice")).alias("v"))
    )
    per_part = shipped.groupBy("l_partkey").agg(msum(F.col("v"), 2).alias("part_value"))
    total = shipped.agg((msum(F.col("v"), 2) * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping modes / priority classes (conditional counts)
# ---------------------------------------------------------------------------


@register(
    "tpch_q12ish",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
    tags=("tpch", "join", "conditional_agg"),
)
def tpch_q12ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-priority split. Adaptation: the l_shipmode
    group column (absent) becomes l_linestatus; the priority CASE
    split is canonical. Year filter pushes to the lineitem scan; the
    join shuffles both sides on orderkey."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .select("l_orderkey", "l_linestatus")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (aggregate view + scalar-max subquery)
# ---------------------------------------------------------------------------


@register(
    "tpch_q15ish",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_msum('l_extendedprice * (1 - l_discount)', 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-10-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    tags=("tpch", "subquery", "aggregate"),
)
def tpch_q15ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: quarterly revenue view, then the
    supplier(s) achieving the maximum (full tie set → deterministic
    without a tiebreak). The revenue frame is built once and reused
    for both the max and the final join; supplier is broadcast."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-10-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        msum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count per part attribute group (distinct agg + exclusions)
# ---------------------------------------------------------------------------


@register(
    "tpch_q16ish",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p_brand, p_type, p_size
    """,
    tags=("tpch", "distinct", "aggregate"),
)
def tpch_q16ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship. Adaptation: no partsupp →
    the (part, supplier) pairs come from lineitem shipments; the
    exclusion predicates and COUNT(DISTINCT) over a 3-column group are
    the canonical shape. Catalyst plans distinct-agg as a two-phase
    expand+agg — scales without a driver-side distinct."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg subquery)
# ---------------------------------------------------------------------------


@register(
    "tpch_q17ish",
    oracle=f"""
    WITH pavg AS (
      SELECT l_partkey AS a_partkey,
             {sql_mavg('l_quantity', 2)} AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round({sql_msum('l_extendedprice', 2)} / 7.0, 4) AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN pavg ON a_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.2 * avg_qty
    """,
    tags=("tpch", "subquery", "aggregate"),
)
def tpch_q17ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue. The correlated
    per-part average subquery is decorrelated into a grouped aggregate
    joined back on partkey (exactly what Catalyst/DuckDB do to the
    original). Adaptation: no p_container filter. The per-part average
    is exact-integer (sum units / count) so the 0.2× threshold
    comparison is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pavg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        mavg(F.col("l_quantity"), 2).alias("avg_qty")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(pavg), li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(F.round(msum(F.col("l_extendedprice"), 2) / F.lit(7.0), 4).alias("avg_yearly"))
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over join + top-N)
# ---------------------------------------------------------------------------


@register(
    "tpch_q18ish",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           {sql_msum('l_quantity', 2)} AS sum_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING {sql_msum('l_quantity', 2)} > 250.0
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "join", "having", "topk"),
)
def tpch_q18ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers: orders whose total quantity
    exceeds 250 (threshold scaled to the synthetic data's ~p99). The
    quantity HAVING is evaluated on the lineitem-only aggregate FIRST,
    then joined to orders/customer — at 100 TB this prunes to a tiny
    key set before any wide join. Deterministic top-100 via orderkey
    tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(msum(F.col("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250.0)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive predicate join (OR-of-ANDs pushed into one join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q19ish",
    oracle=f"""
    SELECT {sql_msum('l_extendedprice * (1 - l_discount)', 4)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
    tags=("tpch", "join", "disjunction"),
)
def tpch_q19ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue under disjunctive brand/size/
    quantity terms. Catalyst extracts the common p_partkey equi-key so
    this stays a single (broadcast) hash join with the OR evaluated as
    a post-join filter, and infers per-side bounds from the
    disjunction for scan pruning."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#23") & s.between(10, 30) & q.between(10, 35))
        | ((b == "Brand#34") & s.between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(msum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 — excess-stock suppliers (nested IN-subqueries → semi-join chain)
# ---------------------------------------------------------------------------


@register(
    "tpch_q20ish",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING CAST(SUM(CAST(round(l_quantity * 100) AS HUGEINT)) AS DOUBLE) / 100.0 > 300.0
    )
    """,
    tags=("tpch", "semi_join", "subquery"),
)
def tpch_q20ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 excess-stock suppliers: suppliers who shipped more
    than 300 units of 'small*' parts in 1997. Adaptation: no partsupp
    availqty → the threshold is a fixed quantity over the year's flow.
    The IN-subquery is a grouped HAVING aggregate used as a left_semi
    probe — supplier never shuffles."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(msum(F.col("l_quantity"), 2).alias("qty"))
        .filter(F.col("qty") > 300.0)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (argmax-within-group + exists)
# ---------------------------------------------------------------------------


@register(
    "tpch_q21ish",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             MAX(l_shipdate) AS last_ship,
             COUNT(DISTINCT l_suppkey) AS n_supps
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM lineitem l
      JOIN per_order po ON po.l_orderkey = l.l_orderkey
                       AND l.l_shipdate = po.last_ship
      JOIN orders    ON o_orderkey = l.l_orderkey AND o_orderstatus = 'F'
      JOIN supplier  ON s_suppkey = l.l_suppkey
    WHERE po.n_supps > 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("tpch", "join", "argmax", "topk"),
)
def tpch_q21ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting. Adaptation: no
    commit/receipt dates → "the waiter" is the supplier(s) whose
    lineitem has the order's latest ship date, restricted to
    multi-supplier 'F' orders (the canonical EXISTS other-supplier /
    latest-delivery structure, expressed as an argmax join-back).
    per_order reuses the same orderkey partitioning as the join that
    consumes it — one shuffle serves both."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    per_order = li.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.max("l_shipdate").alias("last_ship"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(
            per_order,
            (li.l_orderkey == F.col("po_orderkey"))
            & (li.l_shipdate == F.col("last_ship"))
            & (F.col("n_supps") > 1),
        )
        .join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar avg subquery + NOT EXISTS)
# ---------------------------------------------------------------------------


@register(
    "tpch_q22ish",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           {sql_msum('c_acctbal', 2)} AS totacctbal
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    WHERE c_acctbal > (SELECT {sql_mavg('c_acctbal', 2)}
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n_name
    """,
    tags=("tpch", "anti_join", "subquery"),
)
def tpch_q22ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity: well-funded customers with
    no recent orders, by nation. Adaptations: cntrycode (phone prefix)
    → nation name; "no orders at all" → "no orders since 2000" (every
    synthetic customer has some order). Scalar avg broadcast; NOT
    EXISTS → left_anti against the date-filtered orders scan."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(mavg(F.col("c_acctbal"), 2).alias("threshold"))
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01"))
        .select("o_custkey")
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            msum(F.col("c_acctbal"), 2).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated min subquery + join-back)
# ---------------------------------------------------------------------------


@register(
    "tpch_q2ish",
    oracle="""
    WITH eur_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    parts AS (
      SELECT p_partkey FROM part WHERE p_type = 'STANDARD' AND p_size < 15
    ),
    cost AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
      FROM lineitem JOIN parts ON l_partkey = p_partkey
                    JOIN eur_supp ON l_suppkey = s_suppkey
      GROUP BY l_partkey, l_suppkey
    )
    SELECT c.l_partkey AS p_partkey, s.s_name, s.s_acctbal, s.n_name, c.cost
    FROM cost c
    JOIN (SELECT l_partkey, MIN(cost) AS min_cost
          FROM cost GROUP BY l_partkey) m
      ON c.l_partkey = m.l_partkey AND c.cost = m.min_cost
    JOIN eur_supp s ON c.l_suppkey = s.s_suppkey
    """,
    tags=("tpch", "join", "correlated_subquery"),
)
def tpch_q2ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier. Adaptation: no partsupp table →
    supply cost for (part, supplier) = MIN observed unit price
    (l_extendedprice / l_quantity) over their lineitems; region slice
    EUROPE, part slice STANDARD & size < 15. The Q2 shape survives: a
    per-part correlated MIN subquery answered by aggregating the SAME
    derived cost frame twice and joining back on (part, cost), keeping
    every tied supplier like the real Q2.

    Scale: part and supplier slices broadcast into the fact scan
    (filters reach the parquet scan before the only wide shuffle, on
    (l_partkey, l_suppkey)); the per-part min re-shuffles only the
    aggregated frame (|parts|·|suppliers-per-part| rows, not lineitems).
    MIN of an IEEE division is order-independent, so the double equality
    join-back is deterministic in both engines."""
    region = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    eur_supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = (
        li.join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .join(F.broadcast(eur_supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    min_cost = cost.groupBy(F.col("l_partkey").alias("mp")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        cost.join(
            min_cost,
            (cost.l_partkey == F.col("mp")) & (cost.cost == F.col("min_cost")),
        )
        .join(F.broadcast(eur_supp), cost.l_suppkey == eur_supp.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            "s_acctbal",
            "n_name",
            "cost",
        )
    )
