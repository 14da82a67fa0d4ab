"""Tape driver for streaming-semantics tests.

Replicates the reference's DebugNode test idiom (SURVEY.md §5 item 6,
FIXTURES.md F6): inject an explicit sequence of (element, watermark)
actions, observe exactly which windows/records are emitted.

Spark mechanics: one parquet file per tape segment; readStream with
maxFilesPerTrigger=1 processes them as separate micro-batches in
mtime order. The watermark visible to batch N is max(event time) of
batches < N minus the delay — so "inject watermark at T" is encoded
as a segment whose max ts is T + delay (the reference's explicit
Watermark(T) message does the same to the assigner's view).
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_segments(spark: SparkSession, schema: str, segments: list[list[tuple]]) -> str:
    """Write each segment as one parquet file with strictly increasing
    mtime so FileStreamSource picks them up in order."""
    from arcon_spark.io import local_df

    root = tempfile.mkdtemp(prefix="arcon_tape_")
    for i, rows in enumerate(segments):
        df = local_df(spark, rows, schema)
        part = os.path.join(root, f"seg_{i:03d}")
        df.coalesce(1).write.parquet(part)
        files = []
        for dirpath, _, names in os.walk(part):
            files += [os.path.join(dirpath, n) for n in names if n.endswith(".parquet")]
        (f,) = files
        final = os.path.join(root, f"{i:03d}.parquet")
        os.rename(f, final)
        os.utime(final, (time.time() + i, time.time() + i))
        import shutil

        shutil.rmtree(part)
    return root


def run_tape(
    spark: SparkSession,
    schema: str,
    segments: list[list[tuple]],
    transform,
    name: str | None = None,
) -> DataFrame:
    """readStream over the tape (one batch per segment) → transform →
    memory sink; returns the accumulated output table."""
    root = write_segments(spark, schema, segments)
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(root)
    )
    out = transform(src)
    qname = name or f"tape_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(qname)
