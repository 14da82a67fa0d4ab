"""Semantics tests for the integrity / exact-distinct / blocking wave:
bitmap distinct counting, merkle checksum comparison, sorted-neighborhood
blocking, shard-union heavy hitters, and the GROUPED_AGG pandas UDAF.

The driver's oracle gate proves value parity with DuckDB; these tests
pin the PROPERTIES that make each operator correct by construction
(bitmap exactness vs a real distinct, checksum zero-false-positive on
identical replicas, SNM ⊆ exact-Jaccard ground truth, candidate-union
recall audit, trimmed-mean bounds).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arcon_spark.io import load_table


def test_bitmap_distinct_is_exact(spark, sf_dir):
    from arcon_spark.operators.analytics import bitmap_distinct_users

    got = {
        r["event_type"]: r["distinct_users"]
        for r in bitmap_distinct_users(spark, sf_dir).collect()
    }
    truth = {
        r["event_type"]: r["d"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert got == truth


def test_checksum_compare_clean_replica_has_no_findings(spark, sf_dir):
    """A vs A must report ZERO differing buckets — the operator's
    false-positive rate on identical replicas is structurally 0."""
    from arcon_spark.operators.maintenance import _CK_SPARK

    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ]
    a = load_table(spark, sf_dir, "orders").select(*cols)
    s1 = a.groupBy((F.col("o_orderkey") % 256).alias("bucket")).agg(
        F.count(F.lit(1)).alias("c"), F.expr(f"bit_xor({_CK_SPARK})").alias("x")
    )
    s2 = a.orderBy(F.rand(7)).groupBy((F.col("o_orderkey") % 256).alias("bucket")).agg(
        F.count(F.lit(1)).alias("c"), F.expr(f"bit_xor({_CK_SPARK})").alias("x")
    )
    j = s1.alias("l").join(s2.alias("r"), "bucket").filter(
        (F.col("l.c") != F.col("r.c")) | (F.col("l.x") != F.col("r.x"))
    )
    assert j.count() == 0  # row order never affects the checksum


def test_checksum_compare_localizes_injected_faults(spark, sf_dir):
    """Every reported bucket must actually contain a faulted key
    (mutated %997 or deleted %1009), and every faulted key's bucket
    must be reported — detection is exact at bucket granularity."""
    from arcon_spark.operators.maintenance import table_checksum_compare

    reported = {r["bucket"] for r in table_checksum_compare(spark, sf_dir).collect()}
    keys = [
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders").select("o_orderkey").collect()
    ]
    expected = {k % 256 for k in keys if k % 997 == 0 or k % 1009 == 0}
    assert reported == expected


def test_sorted_neighborhood_pairs_are_true_near_dups(spark, sf_dir):
    """SNM output ⊆ the exact-Jaccard ground truth (same 0.6 gate):
    blocking may lose recall, never precision."""
    from arcon_spark.functions.dedup import (
        dedup_ngram_jaccard,
        dedup_sorted_neighborhood,
    )

    snm = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_sorted_neighborhood(spark, sf_dir).collect()
    }
    truth = {
        (r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    assert snm <= truth
    assert snm  # the synthetic corpus has prefix-adjacent near-dups


def test_heavy_hitters_audit_structure(spark, sf_dir):
    from arcon_spark.functions.dedup import spread  # noqa: F401  (import check)
    from arcon_spark.functions.text import heavy_hitters_shard_union

    rows = heavy_hitters_shard_union(spark, sf_dir).collect()
    assert len(rows) == 10
    by_rank = sorted(rows, key=lambda r: r["rank"])
    # exact counts: the est path re-sums the same shard partials, so a
    # hit row must agree with truth exactly
    for r in by_rank:
        if r["hit"]:
            assert r["cnt"] == r["true_cnt"] and r["token"] == r["true_token"]
    # natural-language skew: the union should recover the whole top-10
    assert all(r["hit"] for r in by_rank)


def test_trimmed_mean_within_minmax_and_trims(spark, sf_dir):
    from arcon_spark.operators.analytics import pandas_udaf_trimmed_mean

    res = {r["event_type"]: r for r in pandas_udaf_trimmed_mean(spark, sf_dir).collect()}
    stats = {
        r["event_type"]: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for et, r in res.items():
        s = stats[et]
        assert s["lo"] <= r["trimmed_mean"] <= s["hi"]
        assert r["n_kept"] == s["n"] - 2 * (s["n"] // 10)


def test_asof_nearest_matches_bruteforce(spark, sf_dir):
    """Window-pass nearest-asof ≡ brute-force nearest over all
    (view, purchase) pairs within tolerance, ties to the earlier."""
    from arcon_spark.operators.temporal import _NEAREST_TOL_US, asof_join_nearest

    got = {
        r["view_id"]: (r["nearest_purchase_id"], r["delta_us"])
        for r in asof_join_nearest(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select("user_id", "event_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    purchases: dict[int, list] = {}
    for r in ev:
        if r["event_type"] == "purchase":
            purchases.setdefault(r["user_id"], []).append(r)
    expect = {}
    for r in ev:
        if r["event_type"] != "view":
            continue
        best = None
        for p in purchases.get(r["user_id"], []):
            d = p["us"] - r["us"]
            if abs(d) > _NEAREST_TOL_US:
                continue
            # tie-break: smaller |d|, then backward (d<0), then earlier id
            key = (abs(d), d >= 0, p["event_id"] if d < 0 else -p["event_id"])
            if best is None or key < best[0]:
                best = (key, p["event_id"], d)
        if best:
            expect[r["event_id"]] = (best[1], best[2])
    assert set(got) == set(expect)
    for vid, (pid, d) in got.items():
        assert abs(d) <= _NEAREST_TOL_US
        assert abs(d) == abs(expect[vid][1])  # distance agrees even on id ties


def test_kcore_is_fixpoint_and_subgraph_degrees_hold(spark, sf_dir):
    """After the fixed peeling rounds: every surviving node has
    degree >= k WITHIN the surviving set (i.e. one more round would
    remove nothing — the unique k-core fixpoint was reached)."""
    from arcon_spark.functions.graph import _KCORE_K, graph_kcore

    core = graph_kcore(spark, sf_dir).collect()
    nodes = {r["node"] for r in core}
    for r in core:
        assert r["core_degree"] >= _KCORE_K
    # rebuild the undirected neighbor sets among core nodes only and
    # re-check degrees — peeling converged iff this holds for all
    from arcon_spark.io import load_table as lt

    li = lt(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey")
    sup = lt(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = lt(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = lt(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    flows = (
        li.join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .select(F.col("s_nationkey").alias("a"), F.col("c_nationkey").alias("b"))
        .distinct()
        .collect()
    )
    adj: dict[int, set] = {}
    for e in flows:
        a, b = min(e["a"], e["b"]), max(e["a"], e["b"])
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for n in nodes:
        assert len(adj[n] & nodes) >= _KCORE_K


def test_observation_metrics_ride_the_action(spark, sf_dir):
    """df.observe collects aggregate metrics during the write action —
    no second scan; values must equal a direct aggregation."""
    from arcon_spark.streaming.measure import observed_metrics

    ev = load_table(spark, sf_dir, "events")
    inst, obs = observed_metrics(
        ev, "ev_audit",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        F.count(F.when(F.col("user_id").isNull(), 1)).alias("null_users"),
    )
    inst.write.format("noop").mode("overwrite").save()
    got = obs.get
    direct = ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
    ).collect()[0]
    assert got["n_rows"] == direct["n"]
    assert got["cents"] == direct["c"]
    assert got["null_users"] == 0


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """A dim-filtered join against a partition-keyed fact table must
    plan a dynamicpruning subquery on the fact scan — the runtime
    analogue of static partition pruning, and the reason 100 TB star
    joins only read the partitions the dim filter selects."""
    fact_dir = str(tmp_path / "fact_parted")
    ev = load_table(spark, sf_dir, "events")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("purchase", 1), ("error", 2)], "event_type string, prio int"
    )
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        joined = fact.join(dim.filter(F.col("prio") == 1), "event_type").groupBy(
            "event_type"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        # and the result is correct under pruning
        rows = joined.collect()
        truth = ev.filter(F.col("event_type") == "purchase").count()
        assert rows[0]["count"] == truth
    finally:
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)


def test_fifo_pairing_is_a_bijection_on_ranks(spark, sf_dir):
    """FIFO matching: no view or purchase is consumed twice, and the
    match count per user is min(#views, #purchases)."""
    from arcon_spark.operators.temporal import fifo_pairing_events

    rows = fifo_pairing_events(spark, sf_dir).collect()
    assert len({r["purchase_id"] for r in rows}) == len(rows)
    assert len({r["view_id"] for r in rows}) == len(rows)
    per_user: dict[int, int] = {}
    for r in rows:
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
    counts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("p"),
        )
        .collect()
    )
    for c in counts:
        expect = min(c["v"], c["p"])
        assert per_user.get(c["user_id"], 0) == expect


def test_modularity_partitions_nodes_and_bounds_q(spark, sf_dir):
    """Modularity sanity: communities partition the backbone nodes,
    degree masses sum to 2m, and Q = Σ q_units / 1e9 lies in
    [-0.5, 1] (the mathematical range of Newman modularity)."""
    from arcon_spark.functions.graph import graph_modularity

    rows = graph_modularity(spark, sf_dir).collect()
    assert rows  # backbone is non-empty at every SF
    total_deg = sum(r["degree_sum"] for r in rows)
    assert total_deg % 2 == 0
    q = sum(r["q_units"] for r in rows) / 1e9
    assert -0.5 <= q <= 1.0
    assert len({r["community"] for r in rows}) == len(rows)  # one row per community
    assert all(r["n_nodes"] >= 1 for r in rows)
    # every edge endpoint is labeled: internal edges can never exceed
    # the community's complete-graph capacity
    for r in rows:
        assert r["internal_edges"] <= r["n_nodes"] * (r["n_nodes"] - 1) // 2


def test_bitemporal_corrections_trace_to_late_versions(spark, sf_dir):
    """Every `corrected` user's winning as-of-now version must be one
    that was RECORDED after the knowledge horizon (the %5 late
    versions) — corrections never appear without a late record."""
    from arcon_spark.operators.temporal import bitemporal_asof

    rows = {r["user_id"]: r for r in bitemporal_asof(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    tmin = min(r["us"] for r in ev)
    tmax = max(r["us"] for r in ev)
    t = (tmin + tmax) // 2
    by_user: dict[int, list] = {}
    for r in ev:
        if r["us"] <= t:
            by_user.setdefault(r["user_id"], []).append(r)
    for uid, versions in by_user.items():
        now_win = max(versions, key=lambda r: (r["us"], r["event_id"]))
        row = rows[uid]
        assert row["current_type"] == now_win["event_type"]
        if row["corrected"]:
            rec = now_win["us"] + (3_600_000_000 if now_win["event_id"] % 5 == 0 else 0)
            assert rec > t  # the winner was not yet known at T


def test_ppr_seed_dominates_and_nonnegative(spark, sf_dir):
    from arcon_spark.functions.graph import _PPR_SEED, _TELEPORT, ppr_from_seed

    rows = {r["nationkey"]: r["ppr_units"] for r in ppr_from_seed(spark, sf_dir).collect()}
    assert all(v > 0 for v in rows.values())
    # the seed receives the full teleport mass every round on top of
    # walk-back mass — it must carry at least that floor
    assert rows[_PPR_SEED] >= _TELEPORT
