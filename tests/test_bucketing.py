"""Bucketed co-located joins — the zero-shuffle repeated-join pattern.

At 100 TB, re-shuffling the fact table for every join against the same
key is the dominant cost. Writing both sides bucketed by the join key
(`bucketBy(n, key).sortBy(key)`) persists the partitioning: every later
equi-join on that key is exchange-free (SortMergeJoin over pre-sorted
buckets). The reference's analog is its fixed 65535-range key sharding
(arcon/src/data/partition.rs:5-37) — Spark's bucketing is the durable,
storage-level version of the same idea.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arcon_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).format("parquet").mode("overwrite").saveAsTable("b_orders")
    load_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).format("parquet").mode("overwrite").saveAsTable("b_lineitem")
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    li = spark.table("b_lineitem")
    orders = spark.table("b_orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n"))
    # test SFs are small enough to broadcast — disable that to exercise
    # the big-big join path bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the JOIN itself must be exchange-free: bucket layout co-locates both
    # sides, so the only exchange allowed is the one for the later groupBy
    assert "SortMergeJoin" in plan, plan[:2000]
    join_part = plan.split("SortMergeJoin")[-1]
    assert "Exchange hashpartitioning" not in join_part, join_part[:2000]
    # and it must produce the same result as the shuffled join
    n_bucketed = joined.agg(F.sum("n")).collect()[0][0]
    n_plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert n_bucketed == n_plain


def test_bucketed_scan_prunes_to_one_bucket(spark, bucketed_tables):
    # autoBucketedScan drops bucket layout when the planner sees no join
    # to exploit; turn it off to surface bucket PRUNING — a key-equality
    # filter must read 1 of 8 buckets, not the whole table
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        plan = (
            spark.table("b_lineitem")
            .filter(F.col("l_orderkey") == 1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", prev
        )
    assert "SelectedBucketsCount: 1 out of 8" in plan, plan[:2000]
