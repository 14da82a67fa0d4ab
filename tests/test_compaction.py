"""Small-file compaction (io.compact_files): the OPTIMIZE/rewrite
maintenance job for streaming-sink output directories."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from arcon_spark.io import compact_files


def _parquet_files(path):
    return [
        os.path.join(dp, n)
        for dp, _, ns in os.walk(path)
        for n in ns
        if n.endswith(".parquet")
    ]


def test_compact_files_reduces_count_and_preserves_data(spark):
    d = os.path.join(tempfile.mkdtemp(), "t")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    )
    df.repartition(64).write.parquet(d)
    assert len(_parquet_files(d)) == 64

    before = spark.read.parquet(d).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).first()
    n_out = compact_files(spark, d, target_file_bytes=10 * 1024 * 1024)
    assert n_out == 1
    assert len(_parquet_files(d)) == 1
    after = spark.read.parquet(d).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    ).first()
    assert (before.n, before.s) == (after.n, after.s) == (10_000, sum(i * 3 for i in range(10_000)))


def test_compact_files_splits_to_target_size(spark):
    d = os.path.join(tempfile.mkdtemp(), "t")
    spark.range(50_000).select(
        F.col("id"), F.expr("repeat(uuid(), 4)").alias("pad")
    ).repartition(32).write.parquet(d)
    total = sum(os.path.getsize(p) for p in _parquet_files(d))
    n_out = compact_files(spark, d, target_file_bytes=total // 3)
    assert n_out in (3, 4)
    assert len(_parquet_files(d)) == n_out


def test_sorted_layout_compresses_better(spark, sf_dir, tmp_path):
    """Storage-layout economics: writing events sorted by
    (user_id, ts) must produce a SMALLER parquet footprint than a
    hash-scrambled layout — delta encoding on the sorted sort key +
    dictionary runs on correlated columns do the work. This is the
    measurable 'why' behind every sortWithinPartitions/z-order recipe
    in SCALE.md: at 100 TB, layout is a storage-cost and scan-speed
    lever before it is anything else."""
    import os

    from pyspark.sql import functions as F

    from arcon_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    sorted_dir = str(tmp_path / "sorted")
    scrambled_dir = str(tmp_path / "scrambled")
    ev.repartition(1).sortWithinPartitions("user_id", "ts").write.parquet(sorted_dir)
    ev.repartition(1).sortWithinPartitions(
        F.xxhash64("event_id")  # decorrelate every column
    ).write.parquet(scrambled_dir)

    def total_bytes(d: str) -> int:
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    sorted_sz, scrambled_sz = total_bytes(sorted_dir), total_bytes(scrambled_dir)
    assert sorted_sz < scrambled_sz, (sorted_sz, scrambled_sz)
