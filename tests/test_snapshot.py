"""SnapshotCatalog (TSS) + MeasureListener tests."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arcon_spark.streaming import MeasureListener, SnapshotCatalog
from tests.streaming_util import write_segments

SCHEMA = "key long, value long, ts timestamp"


def _ts(sec: float):
    import datetime

    return datetime.datetime(1970, 1, 1) + datetime.timedelta(seconds=sec)


def test_snapshot_catalog_epochs_and_time_travel(spark):
    """Each micro-batch commits an epoch snapshot; snapshots are
    readable per epoch and via latest() — the reference's
    SnapshotManager catalog (manager/snapshot.rs:50-57) + the TSS
    query promise."""
    segments = [
        [(1, 10, _ts(1)), (2, 20, _ts(2))],
        [(1, 30, _ts(3))],
    ]
    root = write_segments(spark, SCHEMA, segments)
    src = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(root)

    cat = SnapshotCatalog(spark, tempfile.mkdtemp(prefix="arcon_snap_"))
    q = (
        src.writeStream.foreachBatch(cat.writer("raw_events"))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="arcon_ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    eps = cat.epochs("raw_events")
    assert eps == [0, 1], eps
    assert cat.read("raw_events", 0).count() == 2
    assert cat.read("raw_events", 1).count() == 1
    # time-travel query over a committed snapshot
    top = cat.latest("raw_events").agg(F.max("value").alias("m")).collect()[0].m
    assert top == 30


def test_measure_listener_counts_rows(spark):
    """MeasureSink equivalent (operator/sink/measure.rs): listener
    records per-batch input rows and rates."""
    segments = [[(i, i, _ts(i)) for i in range(100)]]
    root = write_segments(spark, SCHEMA, segments)
    listener = MeasureListener()
    spark.streams.addListener(listener)
    try:
        src = spark.readStream.schema(SCHEMA).parquet(root)
        q = src.writeStream.format("noop").trigger(availableNow=True).start()
        q.processAllAvailable()
        q.stop()
        # listener delivery is async; give it a moment
        import time

        for _ in range(50):
            if listener.total_rows >= 100:
                break
            time.sleep(0.1)
        assert listener.total_rows >= 100
    finally:
        spark.streams.removeListener(listener)
