"""Stateful Operator tests — port of the reference's keyby integration
test (arcon/src/test/keyby_integration.rs:32-156) plus timer semantics
(stream/node/timer.rs) over applyInPandasWithState.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from arcon_spark.streaming import Operator, apply_operator, apply_operator_batch
from tests.streaming_util import run_tape, write_segments

SCHEMA = "key long, value long, ts timestamp"


def _ts(sec: float):
    import datetime

    return datetime.datetime(1970, 1, 1) + datetime.timedelta(seconds=sec)


class FirstValueEnricher(Operator):
    """keyby_integration.rs:68-91: stateful Map adding the first-seen
    value per key (ValueState get-or-insert)."""

    def handle_element(self, key, pdf, ctx):
        first = ctx.value("first")
        pdf = pdf.sort_values(["ts", "value"], kind="mergesort")
        if first.get() is None:
            first.put(int(pdf["value"].iloc[0]))
        out = pdf[["key", "value"]].copy()
        out["first_val"] = first.get()
        return out


class SessionCloser(Operator):
    """Timer semantics: on each element (re)schedule a close timer at
    ts + 10s; when it fires, emit the per-key count accumulated in a
    ReducerState — the reference's window-trigger-via-timer pattern
    (assigner.rs:110-137)."""

    def handle_element(self, key, pdf, ctx):
        n = ctx.reduce("n", lambda a, b: a + b, len(pdf))
        last_ms = int(pdf["ts"].max().timestamp() * 1000)
        ctx.value("last").put(last_ms)
        ctx.schedule_at(last_ms + 10_000, payload=None)
        return None

    def handle_timeout(self, key, time_ms, payload, ctx):
        last = ctx.value("last").get()
        if last is not None and time_ms == last + 10_000:
            return [{"key": key[0], "n": ctx.reduced("n", 0), "closed_at": time_ms}]
        return None  # superseded timer (a newer element re-armed)


def test_first_value_state_persists_across_batches(spark):
    """State written in batch 1 must be visible in batch 2 — the
    keyby_integration correctness property."""
    segments = [
        [(1, 100, _ts(1)), (2, 200, _ts(1))],
        [(1, 111, _ts(20)), (2, 222, _ts(20))],
    ]

    def transform(df):
        return apply_operator(
            df,
            ["key"],
            FirstValueEnricher(),
            "key long, value long, first_val long",
            ts_col="ts",
        )

    out = run_tape(spark, SCHEMA, segments, transform)
    rows = {(r.key, r.value): r.first_val for r in out.collect()}
    assert rows[(1, 100)] == 100 and rows[(1, 111)] == 100
    assert rows[(2, 200)] == 200 and rows[(2, 222)] == 200


def test_event_time_timer_fires_on_watermark(spark):
    """Timer scheduled at last_ts + 10s fires once the watermark passes
    it (reference: timers fire when min-watermark advances,
    node/mod.rs:379-395)."""
    segments = [
        [(1, 1, _ts(1)), (1, 2, _ts(3))],
        [(7, 0, _ts(60))],  # advances watermark past 13s → timer fires
        [(7, 0, _ts(120))],  # one more batch so the timeout batch flushes
    ]

    def transform(df):
        return apply_operator(
            df,
            ["key"],
            SessionCloser(),
            "key long, n long, closed_at long",
            ts_col="ts",
        )

    out = run_tape(spark, SCHEMA, segments, transform)
    rows = [r for r in out.collect() if r.key == 1]
    assert len(rows) == 1, rows
    assert rows[0].n == 2
    assert rows[0].closed_at == 3_000 + 10_000


def test_batch_harness_matches_window_oracle(spark, sf_dir):
    """apply_operator_batch: same Operator logic over a batch DataFrame
    (per-key ordered delivery + end-of-input timer drain)."""
    from arcon_spark.io import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("key"), F.col("value"), F.col("ts"))
        .withColumn("value", (F.col("value") * 100).cast("long"))
    )
    out = apply_operator_batch(
        ev,
        ["key"],
        FirstValueEnricher(),
        "key long, value long, first_val long",
        order_cols=["ts", "value"],
    )
    got = out.groupBy("key").agg(F.countDistinct("first_val").alias("d")).collect()
    assert all(r.d == 1 for r in got)  # one first value per key
    assert len(got) > 0


def test_state_primitives_roundtrip():
    """Unit semantics of the five state wrappers (reference
    arcon_state test_common conformance, SURVEY §5 item 4)."""
    from arcon_spark.streaming.stateful import OperatorContext

    store: dict = {}
    ctx = OperatorContext(store, (1,))
    v = ctx.value("x")
    assert v.get() is None
    v.put(5)
    assert v.get() == 5
    assert v.rmw(lambda a: a + 1) == 6
    assert v.take() == 6 and v.get() is None

    m = ctx.map("m")
    m.put("a", 1)
    assert m.get("a") == 1 and len(m) == 1
    assert m.remove("a") == 1 and len(m) == 0

    a = ctx.vec("v")
    a.append(1)
    a.append(2)
    assert len(a) == 2 and a.consume() == [1, 2] and len(a) == 0

    assert ctx.reduce("r", lambda x, y: x + y, 3) == 3
    assert ctx.reduce("r", lambda x, y: x + y, 4) == 7

    assert ctx.aggregate("g", lambda acc, x: acc + [x], 1, list) == [1]
    assert ctx.aggregate("g", lambda acc, x: acc + [x], 2, list) == [1, 2]


def test_operator_state_survives_checkpoint_restart(spark):
    """§2.7 exactly-once for the CUSTOM-OPERATOR path: per-key state
    (a running count in ValueState) must be restored from the state
    store on restart — a second tape segment processed by a NEW query
    over the same checkpoint continues counting where the first run
    stopped, never from zero."""
    import os
    import shutil
    import tempfile
    import time

    import pandas as pd

    from arcon_spark.streaming.stateful import Operator, apply_operator
    from arcon_spark.streaming.tape import write_segments

    class RunningCount(Operator):
        def handle_element(self, key, pdf, ctx):
            cnt = ctx.value("cnt").rmw(lambda c: (c or 0) + len(pdf))
            return [{"k": int(key[0]), "cnt": int(cnt)}]

    seg1 = spark.range(20).selectExpr("cast(id % 4 as long) as k")  # 5 per key
    seg2 = spark.range(12).selectExpr("cast(id % 4 as long) as k")  # +3 per key
    root = write_segments([seg1])
    ckpt = tempfile.mkdtemp(prefix="arcon_oprec_ckpt_")
    sink = tempfile.mkdtemp(prefix="arcon_oprec_sink_") + "/out"

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    def run_once():
        src = spark.readStream.schema("k long").parquet(root)
        out = apply_operator(src, ["k"], RunningCount(), "k long, cnt long", ts_col=None)
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    try:
        run_once()
        first = spark.read.parquet(sink).toPandas()
        assert sorted(first["cnt"]) == [5, 5, 5, 5], first

        # seg2 arrives while the query is down
        tmp = root + "_tmp"
        seg2.coalesce(1).write.parquet(tmp)
        f = [
            os.path.join(dp, n)
            for dp, _, ns in os.walk(tmp)
            for n in ns
            if n.endswith(".parquet")
        ][0]
        dst = os.path.join(root, "later.parquet")
        shutil.copyfile(f, dst)
        now = time.time() + 60
        os.utime(dst, (now, now))
        shutil.rmtree(tmp)

        run_once()
        both = spark.read.parquet(sink).toPandas()
        per_key = both.groupby("k")["cnt"].max()
        assert sorted(per_key) == [8, 8, 8, 8], both.sort_values(["k", "cnt"])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_keyby_integration_scale(spark):
    """The reference's integration-scale correctness run
    (keyby_integration.rs:32-156: 99,946 events, 256 keys, FirstValue
    stateful map, asserting distinct first values == NUM_KEYS) at the
    same event and key counts, through the batch Operator harness.
    Every output row of a key must carry that key's first-seen value,
    and all 256 keys must hold independent state."""
    n, n_keys = 99_946, 256
    df = spark.range(n).selectExpr(
        f"id % {n_keys} as key",
        "id as value",
        "timestamp_micros(cast(id as bigint)) as ts",
    )
    out = apply_operator_batch(
        df,
        ["key"],
        FirstValueEnricher(),
        "key long, value long, first_val long",
        order_cols=["ts", "value"],
    )
    agg = out.groupBy("key").agg(
        F.countDistinct("first_val").alias("nfv"),
        F.min("first_val").alias("fv"),
        F.min("value").alias("mv"),
        F.count(F.lit(1)).alias("cnt"),
    )
    rows = agg.collect()
    assert len(rows) == n_keys
    # one state cell per key, holding the key's first value
    assert all(r.nfv == 1 and r.fv == r.mv for r in rows)
    assert sum(r.cnt for r in rows) == n
    assert out.select("first_val").distinct().count() == n_keys


def test_cogroup_bucketed_merge_matches_join(spark, sf_dir):
    """cogroup_activity_order_merge buckets its cogroup key to amortize
    per-key Python calls (r11); the vectorized per-user merge inside
    each bucket must reproduce the plain JVM join formulation exactly —
    users with no orders, single-event spans, exact cents included."""
    from arcon_spark.io import load_table
    from arcon_spark.operators.stateful import cogroup_activity_order_merge

    got = {
        r.user_id: r
        for r in cogroup_activity_order_merge(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ev"),
            F.max("ts").alias("last_ev"),
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "cents"
            ),
        )
    )
    ref = ev.join(o, "user_id", "left").collect()
    assert len(ref) == len(got) > 0
    for r in ref:
        g = got[r.user_id]
        assert g.n_events == r.n_events
        assert g.n_orders == (r.n_orders or 0)
        assert g.order_revenue == float(r.cents or 0) / 100.0
        td = r.last_ev - r.first_ev  # exact integer µs via timedelta fields
        span_us = (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds
        assert g.active_span_us == span_us
