"""Registry entries that run REAL streaming queries (not batch
re-expressions): the driver's oracle checks the streaming engine's
output against the same SQL it uses for the batch form — proving the
window semantics are identical across both execution modes.

Flush protocol: append-mode windowed aggregation only emits a window
once the watermark passes its end, and the watermark applied to batch
N is derived from batches < N. So the tape is:

    [events] [sentinel₁] [sentinel₂]

sentinel₁ (far-future event) advances the max event time; sentinel₂
forces one more batch so that watermark takes effect and every real
window flushes. Sentinel windows themselves never emit (watermark
never passes them) and are filtered from the result anyway.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arcon_spark.io import load_table
from arcon_spark.plans.compat import EVENTS_NORM, msum, sql_msum
from arcon_spark.plans.registry import register
from arcon_spark.streaming.tape import write_segments

_SENTINEL = "__sentinel__"


def _streamed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    far = ev.agg(F.max("ts").alias("m")).select(
        (F.col("m") + F.expr("INTERVAL 30 DAYS")).alias("ts"),
        F.lit(_SENTINEL).alias("event_type"),
        F.lit(0.0).alias("value"),
    )
    far2 = far.select(
        (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts"), "event_type", "value"
    )
    root = write_segments([ev, far, far2])
    return (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )


@register(
    "stream_tumbling_window_agg",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_msum('value', 2)} AS sum_value
    FROM {EVENTS_NORM} GROUP BY 1, 2
    """,
    tags=("streaming", "window", "survey2.4"),
)
def stream_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling_window_agg query executed by the STREAMING engine:
    file-source tape → withWatermark → windowed agg → memory sink; the
    flushed append-mode output must hash-match the batch oracle exactly
    (reference WindowAssigner semantics, assigner.rs:61-229)."""
    src = _streamed_events(spark, sf_dir)
    agg = (
        src.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), msum(F.col("value"), 2).alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "sum_value"
        )
    )
    name = f"stream_tumble_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name).filter(F.col("event_type") != _SENTINEL)


@register(
    "stream_stateful_first_value",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, min_by(value, printf('%030d', epoch_us(ts)) || printf('%020d', event_id)) AS first_val
      FROM {EVENTS_NORM} GROUP BY user_id
    )
    SELECT user_id, first_val FROM firsts
    """,
    tags=("streaming", "stateful", "survey2.2"),
)
def stream_stateful_first_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keyby_integration stateful enrichment run by the STREAMING
    engine via applyInPandasWithState (reference keyby_integration.rs:
    68-91): per-key ValueState survives across micro-batches; the
    first-seen value per key (in event-time order) must match the batch
    oracle. The tape splits events into two batches to force state
    persistence across an epoch boundary."""
    from arcon_spark.streaming.stateful import Operator, apply_operator

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    # two real segments → state must survive the batch boundary
    first_half = ev.filter(F.col("event_id") % 2 == 0)
    second_half = ev.filter(F.col("event_id") % 2 == 1)

    class FirstValEmitting(Operator):
        """ValueState keeping the (ts, event_id)-min value per key;
        a flush-marker element (event_id < 0, final segment) emits it —
        the reference's drain-on-final-watermark protocol without
        needing event-time timers."""

        def handle_element(self, key, pdf, ctx):
            st = ctx.value("first")
            marker = pdf["event_id"] < 0
            data = pdf[~marker].sort_values(["ts", "event_id"], kind="mergesort")
            if len(data):
                row = data.iloc[0]
                cand = (
                    float(row["value"]),
                    (int(row["ts"].timestamp() * 1_000_000), int(row["event_id"])),
                )
                cur = st.get()
                if cur is None or cand[1] < tuple(cur[1]):
                    st.put(cand)
            if marker.any():
                cur = st.get()
                if cur is not None and not ctx.value("emitted").get(False):
                    ctx.value("emitted").put(True)
                    return [{"user_id": int(key[0]), "first_val": cur[0]}]
            return None

    flush = (
        ev.groupBy("user_id")
        .agg(F.max("ts").alias("ts"))
        .select(
            "user_id",
            F.lit(-1).cast("long").alias("event_id"),
            (F.col("ts") + F.expr("INTERVAL 40 DAYS")).alias("ts"),
            F.lit(0.0).alias("value"),
        )
    )
    root = write_segments([first_half, second_half, flush])
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )
    out = apply_operator(
        src,
        ["user_id"],
        FirstValEmitting(),
        "user_id long, first_val double",
        ts_col=None,  # no timers needed; flush marker drives emission
    )
    name = f"stream_first_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)
