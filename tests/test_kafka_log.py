"""Kafka-contract offset-log connector tests: parallel batch read,
checkpointed offset replay across restart (reference
kafka.rs:130-137,171-175), and exactly-once sink idempotence."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from arcon_spark.sources.kafka_log import (
    KafkaLogProducer,
    append_stream_to_kafka_log,
    end_offset,
    read_range,
    register_kafka_log_source,
    topic_partitions,
)


def _fill(topic_dir: str, n: int, parts: int = 3, start: int = 0) -> None:
    p = KafkaLogProducer(topic_dir, parts)
    for i in range(start, start + n):
        p.send(i % parts, f"k{i}".encode(), f"v{i}".encode(), ts_us=i * 1000)


def test_log_primitives_offset_seek():
    topic = tempfile.mkdtemp(prefix="klog_")
    _fill(topic, 30, parts=3)
    assert topic_partitions(topic) == [0, 1, 2]
    assert end_offset(topic, 0) == 10
    recs = list(read_range(topic, 1, 4, 7))
    assert [r[3] for r in recs] == [4, 5, 6]  # dense offsets
    # partition 1 holds ids 1, 4, 7, ... -> offset 4 is id 13
    assert recs[0][0] == b"k13" and recs[0][1] == b"v13"


def test_batch_read_parallel_partitions(spark):
    topic = tempfile.mkdtemp(prefix="klog_")
    _fill(topic, 60, parts=3)
    register_kafka_log_source(spark)
    df = spark.read.format("arcon_kafka_log").option("topic", topic).load()
    assert df.count() == 60
    assert df.rdd.getNumPartitions() == 3  # one task per log partition
    got = df.select("partition", "offset", "key", "value").collect()
    assert len({(r.partition, r.offset) for r in got}) == 60
    row = next(r for r in got if bytes(r.key) == b"k13")
    assert bytes(row.value) == b"v13" and row.partition == 1


def test_stream_restart_resumes_from_checkpointed_offsets(spark):
    """The kafka.rs:171-175 contract: run 1 drains the topic and
    checkpoints offsets; new records arrive; run 2 with the SAME
    checkpoint delivers exactly the new records — nothing re-delivered,
    nothing lost."""
    topic = tempfile.mkdtemp(prefix="klog_")
    out = tempfile.mkdtemp(prefix="klog_out_") + "/rows"
    ck = tempfile.mkdtemp(prefix="klog_ck_")
    register_kafka_log_source(spark)

    def run_once():
        q = (
            spark.readStream.format("arcon_kafka_log")
            .option("topic", topic)
            .load()
            .select("partition", "offset", "key")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _fill(topic, 40, parts=2)
    run_once()
    first = spark.read.parquet(out).count()
    assert first == 40

    _fill(topic, 15, parts=2, start=40)
    run_once()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 55  # 40 + 15, no re-delivery of the first 40
    # every (partition, offset) delivered exactly once
    assert len({(r.partition, r.offset) for r in rows}) == 55
    keys = {bytes(r.key).decode() for r in rows}
    assert keys == {f"k{i}" for i in range(55)}


def test_sink_commit_markers_make_redelivery_idempotent(spark):
    topic = tempfile.mkdtemp(prefix="klog_sink_")
    df = spark.createDataFrame(
        [(b"a", b"1", 10, 0), (b"b", b"2", 20, 1)],
        "key binary, value binary, ts_us long, partition int",
    )
    append_stream_to_kafka_log(df, batch_id=7, topic_dir=topic, num_partitions=2)
    append_stream_to_kafka_log(df, batch_id=7, topic_dir=topic, num_partitions=2)  # retry
    assert end_offset(topic, 0) == 1 and end_offset(topic, 1) == 1
    assert len(glob.glob(os.path.join(topic, "_commits", "*.json"))) == 1
    # a NEW batch id does append
    append_stream_to_kafka_log(df, batch_id=8, topic_dir=topic, num_partitions=2)
    assert end_offset(topic, 0) == 2 and end_offset(topic, 1) == 2


def test_admission_control_caps_batches(spark):
    """maxRecordsPerTrigger paces a processing-time stream: the first
    planning cycle is deliberately uncapped (Spark may ask for the
    latest offset before initialOffset, and a restart must never stall
    behind its checkpoint), every later micro-batch is capped at
    cap × partitions, and the union is exactly the log."""
    import time

    topic = tempfile.mkdtemp(prefix="klog_cap_")
    _fill(topic, 10, parts=2)
    register_kafka_log_source(spark)
    batches: list[tuple[int, int]] = []

    def sink(bdf, bid):
        batches.append((bid, bdf.count()))

    q = (
        spark.readStream.format("arcon_kafka_log")
        .option("topic", topic)
        .option("maxRecordsPerTrigger", 10)
        .load()
        .writeStream.foreachBatch(sink)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while sum(n for _, n in batches) < 10 and time.time() < deadline:
            time.sleep(0.5)
        # steady state reached; now append 60 more records — these must
        # arrive paced at <= 10/partition x 2 partitions per batch
        _fill(topic, 60, parts=2, start=10)
        deadline = time.time() + 60
        while sum(n for _, n in batches) < 70 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    total = sum(n for _, n in batches)
    assert total == 70
    paced = [n for _, n in batches[1:] if n]  # after the uncapped first batch
    assert len(paced) >= 3  # 60 records at <=20/batch
    assert max(paced) <= 20


def test_full_pipeline_source_tws_sink_restart(spark):
    """CAPSTONE: the reference's end-to-end shape — KafkaSource →
    custom stateful Operator → exactly-once sink (kafka.rs source
    offsets + arcon_state typed backend + epoch-committed sink) — as
    offset-log source → NATIVE transformWithStateInPandas running sum
    (vendored-protobuf state protocol, RocksDB) → parquet sink, with a
    mid-stream RESTART: run 2 resumes from the checkpointed offsets
    AND the checkpointed typed state, and the sink stays exactly-once."""
    import pandas as pd
    import pytest
    from pyspark.sql.streaming import StatefulProcessor

    from arcon_spark.streaming.tws import ROCKSDB_PROVIDER, TWS_AVAILABLE

    if not TWS_AVAILABLE:
        pytest.skip("protobuf bootstrap failed")

    topic = tempfile.mkdtemp(prefix="klog_pipe_")
    out = tempfile.mkdtemp(prefix="klog_pipe_out_") + "/totals"
    ck = tempfile.mkdtemp(prefix="klog_pipe_ck_")
    register_kafka_log_source(spark)

    def fill(n: int, start: int = 0) -> None:
        p = KafkaLogProducer(topic, 2)
        for i in range(start, start + n):
            p.send(i % 2, f"u{i % 3}".encode(), str(i).encode(), ts_us=i * 1000)

    class RunningSum(StatefulProcessor):
        def init(self, handle) -> None:
            self.total = handle.getValueState("total", "t long")

        def handleInputRows(self, key, rows, timerValues):
            t = self.total.get()[0] if self.total.exists() else 0
            n = 0
            for pdf in rows:
                t += int(pdf["v"].sum())
                n += len(pdf)
            if n:
                self.total.update((t,))
                yield pd.DataFrame({"k": [key[0]], "total": [int(t)]})

        def close(self) -> None:
            pass

    def run_once() -> None:
        src = (
            spark.readStream.format("arcon_kafka_log")
            .option("topic", topic)
            .load()
            .select(
                F.expr("cast(cast(key as string) as string)").alias("k"),
                F.expr("cast(cast(value as string) as long)").alias("v"),
            )
        )
        q = (
            src.groupBy("k")
            .transformWithStateInPandas(RunningSum(), "k string, total long", "Append", "None")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    prov = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(prov, None)
    spark.conf.set(prov, ROCKSDB_PROVIDER)
    try:
        fill(21)  # values 0..20
        run_once()
        totals1 = {r.k: r.total for r in spark.read.parquet(out).collect()}
        expect1 = {f"u{u}": sum(i for i in range(21) if i % 3 == u) for u in range(3)}
        assert totals1 == expect1

        fill(9, start=21)  # values 21..29 arrive while the query is down
        run_once()
        rows = spark.read.parquet(out).collect()
        # exactly-once: 3 rows from each run, no re-delivery
        assert len(rows) == 6
        latest = {}
        for r in rows:
            latest[r.k] = max(latest.get(r.k, 0), r.total)
        expect2 = {f"u{u}": sum(i for i in range(30) if i % 3 == u) for u in range(3)}
        # run-2 totals CONTINUED from run-1 state (not restarted from 0)
        assert latest == expect2
    finally:
        if prev is not None:
            spark.conf.set(prov, prev)
        else:
            spark.conf.unset(prov)


def test_sink_crash_mid_append_rolls_back(spark):
    """WAL semantics: a crash AFTER partial appends but BEFORE the
    commit marker must not duplicate on redelivery — the begin marker
    records pre-append offsets and the redelivery truncates back to
    them first."""
    from arcon_spark.sources.kafka_log import append_stream_to_kafka_log

    topic = tempfile.mkdtemp(prefix="klog_wal_")
    _fill(topic, 4, parts=2)  # offsets 0,1 per partition

    df = spark.createDataFrame(
        [(f"k{i}".encode(), f"v{i}".encode(), i * 1000, i % 2) for i in range(6)],
        "key binary, value binary, ts_us long, partition int",
    )
    # simulate the crash: write the begin marker + partial appends by
    # hand (what a real crash leaves behind), no commit marker
    import json as _json

    commits = os.path.join(topic, "_commits")
    os.makedirs(commits, exist_ok=True)
    pre = {p: end_offset(topic, p) for p in range(2)}
    with open(os.path.join(commits, "7.begin"), "w") as fh:
        _json.dump({"batch_id": 7, "end_offsets": pre}, fh)
    partial = KafkaLogProducer(topic, 2)
    partial.send(0, b"k0", b"v0", 0)
    partial.send(0, b"k2", b"v2", 2000)  # 2 of 6 rows landed, then "crash"

    # redelivery of the SAME batch id must first roll back the partials
    append_stream_to_kafka_log(df, 7, topic, num_partitions=2)

    assert end_offset(topic, 0) == pre[0] + 3  # exactly the 3 even rows
    assert end_offset(topic, 1) == pre[1] + 3
    got = [bytes(k) for k, v, t, o in read_range(topic, 0, pre[0], end_offset(topic, 0))]
    assert got == [b"k0", b"k2", b"k4"]
    # a second redelivery (commit now exists) is a no-op
    append_stream_to_kafka_log(df, 7, topic, num_partitions=2)
    assert end_offset(topic, 0) == pre[0] + 3


def test_producer_repairs_orphan_log_tail():
    """Crash between the .log append and the .idx append leaves orphan
    bytes; the next producer truncates them so offsets never shift."""
    topic = tempfile.mkdtemp(prefix="klog_orphan_")
    _fill(topic, 3, parts=1)
    base = os.path.join(topic, "p-0000")
    with open(base + ".log", "ab") as lf:
        lf.write(b"\x99" * 23)  # orphan garbage, no idx entry
    p = KafkaLogProducer(topic, 1)  # repair-on-open
    off = p.send(0, b"k3", b"v3", 3000)
    assert off == 3
    got = [(bytes(k), bytes(v)) for k, v, t, o in read_range(topic, 0, 0, 4)]
    assert got == [(b"k0", b"v0"), (b"k1", b"v1"), (b"k2", b"v2"), (b"k3", b"v3")]


def test_source_timestamp_is_utc_epoch(spark):
    """ts column must be the exact epoch instant regardless of host
    zone (tz-aware conversion, not naive-local reinterpretation)."""
    topic = tempfile.mkdtemp(prefix="klog_ts_")
    p = KafkaLogProducer(topic, 1)
    p.send(0, b"k", b"v", 1_700_000_000_123_456)
    register_kafka_log_source(spark)
    row = (
        spark.read.format("arcon_kafka_log").option("topic", topic).load().collect()[0]
    )
    # UTC session: internal micros == produced micros exactly
    import calendar

    micros = calendar.timegm(row.timestamp.timetuple()) * 1_000_000 + row.timestamp.microsecond
    assert micros == 1_700_000_000_123_456
