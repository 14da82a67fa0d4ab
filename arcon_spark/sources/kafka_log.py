"""Kafka-contract offset-log connector (source + exactly-once sink).

The reference's only real external connector is Kafka
(`/root/reference/arcon/src/stream/source/kafka.rs:29-189`): a consumer
whose per-partition offsets live in OPERATOR STATE (`kafka.rs:130-137`)
so that on restart the source resumes from the last epoch's offsets
(`kafka.rs:171-175` — replay = exactly-once ingest), and a stale
`KafkaSink`. This container has no spark-sql-kafka jar, no broker, and
no network, so the real `format("kafka")` path cannot execute (the
option surface for it lives in arcon_spark.streaming.stream
from_kafka/to_kafka). What CAN be proven end to end is the part of the
connector that the reference actually implements on top of librdkafka:
the OFFSET CONTRACT. This module implements that contract on a local
log:

- a *topic* is a directory of per-partition append-only logs with
  Kafka's record model (key bytes, value bytes, timestamp) and dense
  per-partition offsets; a sidecar index gives O(1) offset seeks;
- `format("arcon_kafka_log")` batch reads partitions in parallel and
  stream-reads through the FULL DataSourceStreamReader API — offsets
  `{partition: next}` are persisted in the query checkpoint by Spark,
  `partitions(start, end)` plans one input split per log partition,
  and `read()` runs on EXECUTORS (not the driver), so the layout
  scales exactly like the real Kafka source: parallelism = partition
  count;
- restart-replay: a restarted query resumes from the checkpointed
  offsets and re-reads any uncommitted range deterministically — the
  kafka.rs:171-175 behavior, proven by tests/test_kafka_log.py;
- `append_stream_to_kafka_log` is an idempotent foreachBatch sink:
  per-batch commit markers make re-delivered micro-batches no-ops, so
  sink output is exactly-once under retries (the upgrade the
  reference's stale KafkaSink never got).

Swapping to a real cluster: replace the format string with "kafka" and
the topic dir with bootstrap servers — the query shape, offset
checkpointing, and sink idempotence pattern carry over unchanged.
Record schema matches Spark's Kafka source: (key binary, value binary,
topic string, partition int, offset long, timestamp timestamp).
"""

from __future__ import annotations

from arcon_spark.scratch import scratch_dir

import glob
import json
import os
import struct

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long,"
    " timestamp timestamp"
)

_HDR = struct.Struct("<IIq")  # key_len, value_len, ts_us
_IDX = struct.Struct("<q")  # file position of each record


# ---------------------------------------------------------------------------
# log primitives (producer side)
# ---------------------------------------------------------------------------


class KafkaLogProducer:
    """Single-writer appender for one topic directory.

    Crash-safety: the .log record and its .idx entry are two writes; a
    crash between them leaves orphan bytes at the log tail that no
    index entry references. The first send() to a partition repairs it
    by truncating the log to the index's last recorded end, so an
    orphan can never sit BETWEEN indexed positions and shift later
    records (the index is the source of truth, exactly like a Kafka
    segment's offset index). Repair is lazy and per-partition because
    each partition has exactly ONE writer — eagerly sweeping the whole
    topic would race with concurrent writers of other partitions
    (executor-side production assigns one task per log)."""

    def __init__(self, topic_dir: str, num_partitions: int = 4) -> None:
        self.topic_dir = topic_dir
        self.num_partitions = num_partitions
        self._repaired: set[int] = set()
        os.makedirs(topic_dir, exist_ok=True)

    def send(self, partition: int, key: bytes, value: bytes, ts_us: int = 0) -> int:
        """Append one record; returns its offset within the partition."""
        if partition not in self._repaired:
            _repair_partition(self.topic_dir, partition)
            self._repaired.add(partition)
        base = os.path.join(self.topic_dir, f"p-{partition:04d}")
        rec = _HDR.pack(len(key), len(value), ts_us) + key + value
        with open(base + ".log", "ab") as lf:
            pos = lf.tell()
            lf.write(rec)
        with open(base + ".idx", "ab") as xf:
            offset = xf.tell() // _IDX.size
            xf.write(_IDX.pack(pos))
        return offset


def _indexed_log_end(topic_dir: str, partition: int) -> int:
    """Byte position just past the last INDEXED record (0 if empty)."""
    base = os.path.join(topic_dir, f"p-{partition:04d}")
    n = end_offset(topic_dir, partition)
    if n == 0:
        return 0
    with open(base + ".idx", "rb") as xf:
        xf.seek((n - 1) * _IDX.size)
        (pos,) = _IDX.unpack(xf.read(_IDX.size))
    with open(base + ".log", "rb") as lf:
        lf.seek(pos)
        klen, vlen, _ = _HDR.unpack(lf.read(_HDR.size))
    return pos + _HDR.size + klen + vlen


def _repair_partition(topic_dir: str, partition: int) -> None:
    """Truncate un-indexed orphan bytes from the log tail (crash between
    the record append and the index append)."""
    base = os.path.join(topic_dir, f"p-{partition:04d}")
    if not os.path.exists(base + ".log"):
        return
    want = _indexed_log_end(topic_dir, partition)
    if os.path.getsize(base + ".log") > want:
        with open(base + ".log", "r+b") as lf:
            lf.truncate(want)


def topic_partitions(topic_dir: str) -> list[int]:
    return sorted(
        int(os.path.basename(p)[2:-4])
        for p in glob.glob(os.path.join(topic_dir, "p-*.idx"))
    )


def end_offset(topic_dir: str, partition: int) -> int:
    path = os.path.join(topic_dir, f"p-{partition:04d}.idx")
    return os.path.getsize(path) // _IDX.size if os.path.exists(path) else 0


def read_range(topic_dir: str, partition: int, start: int, end: int):
    """Yield (key, value, ts_us, offset) for [start, end) — O(1) seek
    via the index, then one sequential read."""
    if end <= start:
        return
    base = os.path.join(topic_dir, f"p-{partition:04d}")
    with open(base + ".idx", "rb") as xf:
        xf.seek(start * _IDX.size)
        (pos,) = _IDX.unpack(xf.read(_IDX.size))
    with open(base + ".log", "rb") as lf:
        lf.seek(pos)
        for off in range(start, end):
            hdr = lf.read(_HDR.size)
            klen, vlen, ts_us = _HDR.unpack(hdr)
            key = lf.read(klen)
            value = lf.read(vlen)
            yield key, value, ts_us, off


def _to_row(topic: str, partition: int, rec):
    import datetime

    key, value, ts_us, off = rec
    # tz-AWARE UTC: a naive datetime would be reinterpreted through the
    # host/session zone by TimestampType.toInternal, shifting every
    # record's timestamp on non-UTC hosts
    ts = datetime.datetime(
        1970, 1, 1, tzinfo=datetime.timezone.utc
    ) + datetime.timedelta(microseconds=ts_us)  # exact int µs arithmetic
    return (key, value, topic, partition, off, ts)


# ---------------------------------------------------------------------------
# Spark DataSource (batch + streaming)
# ---------------------------------------------------------------------------


class _PartRange(InputPartition):
    def __init__(self, partition: int, start: int, end: int) -> None:
        self.partition = partition
        self.start = start
        self.end = end


class _KafkaLogBatchReader(DataSourceReader):
    def __init__(self, topic_dir: str) -> None:
        self.topic_dir = topic_dir

    def partitions(self):
        return [
            _PartRange(p, 0, end_offset(self.topic_dir, p))
            for p in topic_partitions(self.topic_dir)
        ]

    def read(self, part: _PartRange):
        topic = os.path.basename(self.topic_dir.rstrip("/"))
        for rec in read_range(self.topic_dir, part.partition, part.start, part.end):
            yield _to_row(topic, part.partition, rec)

class _KafkaLogStreamReader(DataSourceStreamReader):
    """Offset map {partition: next_offset} — the exact state the
    reference persists per partition (kafka.rs:130-137). Spark writes
    it to the checkpoint offset log; `partitions(start, end)` plans one
    split per log partition and `read` executes on executors."""

    def __init__(self, topic_dir: str, starting: str, max_per_trigger: int) -> None:
        self.topic_dir = topic_dir
        self.starting = starting
        self.max_per_trigger = max_per_trigger

    def _snapshot(self, latest: bool) -> dict:
        return {
            str(p): (end_offset(self.topic_dir, p) if latest else 0)
            for p in topic_partitions(self.topic_dir)
        }

    def initialOffset(self) -> dict:
        # called only on a FRESH start (no checkpoint); seeds the
        # admission-control base so even the first batch is capped
        first = self._snapshot(latest=self.starting == "latest")
        self._base = dict(first)
        return first

    def latestOffset(self) -> dict:
        cur = self._snapshot(latest=True)
        if self.max_per_trigger <= 0:
            return cur
        # admission control: cap records per partition per micro-batch
        # (the maxOffsetsPerTrigger knob of the real Kafka source). The
        # cap base is the END of the previously PLANNED batch — updated
        # in partitions(), NOT here, because Spark's planner may call
        # latestOffset several times per cycle (and even before
        # initialOffset) and the answer must be idempotent within one
        # cycle. With no base yet — first cycle of a fresh start or a
        # checkpoint restart — the batch is uncapped, so progress can
        # never stall behind the checkpointed offsets; pacing applies
        # from the second cycle on.
        base = getattr(self, "_base", None)
        if base is None:
            return cur
        return {
            p: min(cur.get(p, 0), base.get(p, 0) + self.max_per_trigger)
            for p in cur
        }

    def partitions(self, start: dict, end: dict):
        self._base = dict(end)  # the next batch paces from this batch's end
        return [
            _PartRange(int(p), start.get(p, 0), end[p])
            for p in end
            if end[p] > start.get(p, 0)
        ] or [_PartRange(-1, 0, 0)]

    def read(self, part: _PartRange):
        if part.partition < 0:
            return
        topic = os.path.basename(self.topic_dir.rstrip("/"))
        for rec in read_range(self.topic_dir, part.partition, part.start, part.end):
            yield _to_row(topic, part.partition, rec)

    def commit(self, end: dict) -> None:
        self._last_committed = end


class KafkaLogDataSource(DataSource):
    """options: topic (dir path, required), startingOffsets
    (earliest|latest, default earliest), maxRecordsPerTrigger
    (per-partition cap, 0 = unbounded)."""

    @classmethod
    def name(cls) -> str:
        return "arcon_kafka_log"

    def schema(self) -> str:
        return KAFKA_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _KafkaLogBatchReader(self.options["topic"])

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _KafkaLogStreamReader(
            self.options["topic"],
            self.options.get("startingoffsets", "earliest"),
            int(self.options.get("maxrecordspertrigger", 0)),
        )


def register_kafka_log_source(spark) -> None:
    spark.dataSource.register(KafkaLogDataSource)


# ---------------------------------------------------------------------------
# exactly-once sink (foreachBatch + commit markers)
# ---------------------------------------------------------------------------


def append_stream_to_kafka_log(
    batch_df, batch_id: int, topic_dir: str, num_partitions: int = 4
) -> None:
    """foreachBatch body: append (key, value, ts) rows to the topic,
    idempotently — WAL-style begin/commit markers per batch_id make
    redelivery (failure/restart replay) a no-op AND make a crash
    mid-append recoverable: the begin marker records each partition's
    pre-append end offset, so a redelivered batch whose commit never
    landed first TRUNCATES the logs back to those offsets (undoing the
    partial append) before re-appending. The log therefore sees each
    record exactly once under arbitrary crash points.

    Appends are EXECUTOR-side: the batch is hash-repartitioned on the
    log partition id so each per-partition log is written by exactly
    one task (single-writer per log, parallel across logs — the Kafka
    producer sharding model, same as _produce_events_topic). Only the
    tiny begin/commit marker protocol runs on the driver. A real Kafka
    sink maps this 1:1 onto the broker's transactional producer
    (begin/commit become broker-side transaction markers)."""
    commits = os.path.join(topic_dir, "_commits")
    os.makedirs(commits, exist_ok=True)
    marker = os.path.join(commits, f"{batch_id}.json")
    begin = os.path.join(commits, f"{batch_id}.begin")
    if os.path.exists(marker):
        # already delivered — exactly-once under retry. A crash in the
        # window between commit and begin-removal leaves a stale begin;
        # the commit marker wins, so finish the cleanup here.
        if os.path.exists(begin):
            os.remove(begin)
        return
    if os.path.exists(begin):
        # crashed mid-append on a previous delivery: roll back to the
        # recorded pre-append offsets before re-appending
        with open(begin) as fh:
            pre = {int(k): int(v) for k, v in json.load(fh)["end_offsets"].items()}
        for part, off in pre.items():
            _truncate_partition(topic_dir, part, off)
    else:
        pre = {
            p: end_offset(topic_dir, p)
            for p in range(num_partitions)
        }
        tmp = begin + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batch_id, "end_offsets": pre}, fh)
        os.replace(tmp, begin)
    def _append(batches):
        import pandas as pd

        producer = KafkaLogProducer(topic_dir, num_partitions)
        n = 0
        touched: set[int] = set()
        for pdf in batches:
            for part, key, value, ts_us in zip(
                pdf["partition"], pdf["key"], pdf["value"], pdf["ts_us"]
            ):
                part = int(part)
                if part not in touched:
                    # task-retry idempotence: this task is the sole
                    # writer of this log partition, so rolling it back
                    # to the begin-marker offset discards any partial
                    # append from a failed earlier attempt of THIS task
                    _truncate_partition(topic_dir, part, pre[part])
                    touched.add(part)
                producer.send(part, bytes(key), bytes(value), int(ts_us))
                n += 1
        yield pd.DataFrame({"n": [n]})

    n = sum(
        r["n"]
        for r in (
            batch_df.select("key", "value", "ts_us", "partition")
            .repartition(num_partitions, "partition")
            .mapInPandas(_append, "n long")
            .collect()
        )
    )
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"batch_id": batch_id, "n": n}, fh)
    os.replace(tmp, marker)  # atomic commit point
    # begin-present must stay strictly equivalent to "append in flight":
    # a stale begin surviving past its commit would, on a later
    # redelivery after the commit marker is pruned, roll the logs back
    # to its old offsets and destroy subsequent batches' records.
    os.remove(begin)


def _truncate_partition(topic_dir: str, partition: int, offset: int) -> None:
    """Roll a partition log back to `offset` records (WAL undo)."""
    base = os.path.join(topic_dir, f"p-{partition:04d}")
    if not os.path.exists(base + ".idx"):
        return
    cur = end_offset(topic_dir, partition)
    if cur <= offset:
        return
    if offset == 0:
        log_end = 0
    else:
        with open(base + ".idx", "rb") as xf:
            xf.seek((offset - 1) * _IDX.size)
            (pos,) = _IDX.unpack(xf.read(_IDX.size))
        with open(base + ".log", "rb") as lf:
            lf.seek(pos)
            klen, vlen, _ = _HDR.unpack(lf.read(_HDR.size))
        log_end = pos + _HDR.size + klen + vlen
    with open(base + ".idx", "r+b") as xf:
        xf.truncate(offset * _IDX.size)
    with open(base + ".log", "r+b") as lf:
        lf.truncate(log_end)


# ---------------------------------------------------------------------------
# registry query: events -> protobuf-valued kafka-log topic -> offset-
# tracked stream read -> decode -> aggregate, vs an oracle on the raw
# table. This is the reference's KafkaSource+ProtoSchema composition
# (kafka.rs:29-189 consuming proto-encoded payloads via schema.rs)
# executed end to end.
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from arcon_spark.plans.registry import register  # noqa: E402

_KN_PARTS = 4


def _produce_events_topic(spark: SparkSession, sf_dir: str) -> str:
    """Executor-side production: events rows are protobuf-encoded and
    appended to the topic's per-partition logs. The frame is hash-
    repartitioned on the log partition id first, so each log partition
    is written by exactly ONE task (single-writer per log, parallel
    across logs — the Kafka producer sharding model)."""
    import tempfile

    from arcon_spark.io import load_table
    from arcon_spark.proto import encode_message, message_from_spark_schema

    topic_dir = scratch_dir("arcon_kafka_log_")
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            F.expr("unix_micros(ts)").alias("ts_us"),
        )
        .withColumn("part", F.pmod("user_id", F.lit(_KN_PARTS)).cast("int"))
    )
    msg = message_from_spark_schema(
        "Event", ev.drop("part").schema
    )

    def produce(batches):
        import pandas as pd

        producer = KafkaLogProducer(topic_dir, _KN_PARTS)
        n = 0
        for pdf in batches:
            # deterministic per-partition order: offsets follow event_id
            pdf = pdf.sort_values("event_id")
            for row in pdf.itertuples(index=False):
                rec = {
                    "event_id": int(row.event_id),
                    "user_id": int(row.user_id),
                    "event_type": row.event_type,
                    "value": float(row.value),
                    "ts_us": int(row.ts_us),
                }
                producer.send(
                    int(row.part),
                    str(row.user_id).encode(),
                    encode_message(msg, rec),
                    int(row.ts_us),
                )
                n += 1
        yield pd.DataFrame({"n": [n]})

    ev.repartition(_KN_PARTS, "part").mapInPandas(produce, "n long").collect()
    return topic_dir


@register(
    "stream_kafka_log_roundtrip",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(user_id) AS BIGINT) AS sum_user,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
           CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total_rows
    FROM events
    GROUP BY event_type
    """,
    tags=("streaming", "kafka", "source", "offsets", "survey2.1"),
)
def stream_kafka_log_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-contract ingest end to end: 10k events are protobuf-
    encoded into a 4-partition offset log (executor-side producers),
    then STREAM-read back through format("arcon_kafka_log") with
    maxRecordsPerTrigger admission control — multiple micro-batches,
    offsets checkpointed by Spark exactly as the reference persists
    consumer offsets in state (kafka.rs:130-137) — decoded by the
    wire-format parser and aggregated per type. The oracle aggregates
    the raw parquet: a hash-match proves produce → log → offset-paced
    consume → proto-decode loses nothing and duplicates nothing."""
    import tempfile

    from arcon_spark.proto import message_from_spark_schema, proto_decode

    register_kafka_log_source(spark)
    topic_dir = _produce_events_topic(spark, sf_dir)
    out_dir = scratch_dir("arcon_kafka_out_") + "/rows"
    ck = scratch_dir("arcon_kafka_ck_")

    stream = (
        spark.readStream.format("arcon_kafka_log")
        .option("topic", topic_dir)
        .option("startingOffsets", "earliest")
        .option("maxRecordsPerTrigger", 1000)
        .load()
        .select("value")
    )

    def sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    raw = spark.read.parquet(out_dir)
    schema_src = (
        "event_id long, user_id long, event_type string, value double, ts_us long"
    )
    from pyspark.sql.types import _parse_datatype_string

    msg = message_from_spark_schema("Event", _parse_datatype_string(schema_src))
    dec = proto_decode(raw, msg, "value", schema_src)
    from pyspark.sql.window import Window

    agg = dec.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("user_id").cast("long").alias("sum_user"),
        F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("cents"),
    )
    # global cardinality as part of the VALUE: any record loss in the
    # source path flips every row's hash, even when the per-group
    # aggregate happens to keep rows_match true (round-3 lesson)
    return agg.withColumn(
        "total_rows", F.sum("n").over(Window.partitionBy())
    )
